package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Conditional integration gate for the two wired-only sources (S5/S6
  * Kafka, S9 JDBC): the code paths are complete, but this container
  * ships no connector jar, no broker, and no database. Rather than
  * leaving the live paths permanently untested, each spec here
  * detects its runtime dependency and enables itself when the
  * dependency appears:
  *
  *  - drop `spark-sql-kafka-0-10` (+ its kafka-clients deps) into the
  *    jars dir and set `GRAFT_KAFKA_BROKERS=host:port` → the Kafka
  *    round-trip runs for real;
  *  - drop a JDBC driver jar and set `GRAFT_JDBC_URL` (plus optional
  *    `GRAFT_JDBC_USER`/`GRAFT_JDBC_PASSWORD`) → the database
  *    round-trip runs for real against that endpoint.
  *
  * S9 additionally has an EMBEDDED live path (round 11): this
  * container bundles Derby in the Spark jars dir, so the JDBC
  * overwrite/replace/read-back round-trip runs for real, in-process,
  * with no env and no external endpoint — S9 is no longer wired-only.
  * S5/S6 cannot get the same treatment here: no Kafka broker or
  * connector jar exists in the image or the offline dependency cache,
  * and the container has no network egress to fetch one, so the
  * MemoryStream e2e (StreamPipelineSpec) remains the Kafka evidence
  * and the live spec stays gated on a jar+env appearing.
  *
  * When a dependency is absent the spec CANCELS (ScalaTest `assume`) —
  * visible in the report as canceled, never failed, so `sbt test`
  * stays green in this sandbox. The detection tests themselves always
  * run, pinning that the gate reflects the classpath truthfully.
  */
class IntegrationGateSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val brokers = sys.env.get("GRAFT_KAFKA_BROKERS")
  private val jdbcUrl = sys.env.get("GRAFT_JDBC_URL")
  // One in-memory database per JVM; tables get unique names. Derby
  // auto-registers via the JDBC service loader when its jar is present.
  private val EmbeddedDerbyUrl = "jdbc:derby:memory:graft_it;create=true"

  test("gate status: one line per gated spec naming what would enable it") {
    // Self-documenting wired-only status (VERDICT r8 #6): every round's
    // test log states exactly which jar/env each gated integration
    // spec is waiting for, so "wired" is auditable without reading
    // code. Emitted via info() (test report) AND println (driver
    // stdout log).
    val kafkaStatus =
      if (!KafkaIO.connectorAvailable)
        "GATED — missing jar: spark-sql-kafka-0-10 (KafkaSourceProvider not on classpath)"
      else if (brokers.isEmpty)
        "GATED — missing env: GRAFT_KAFKA_BROKERS=host:port"
      else "ENABLED — connector jar + broker env present"
    val jdbcStatus = jdbcUrl match {
      case None => "GATED — missing env: GRAFT_JDBC_URL (plus a driver jar accepting it)"
      case Some(u) if !Sinks.jdbcDriverAvailable(u) =>
        s"GATED — missing jar: no registered JDBC driver accepts $u"
      case Some(_) => "ENABLED — driver jar + url env present"
    }
    val embeddedStatus =
      if (Sinks.jdbcDriverAvailable(EmbeddedDerbyUrl))
        "ENABLED — embedded Derby driver on classpath"
      else "GATED — missing jar: no embedded Derby driver on classpath"
    Seq(s"[gate] S5/S6 kafka live round-trip: $kafkaStatus",
        s"[gate] S9 jdbc external round-trip: $jdbcStatus",
        s"[gate] S9 jdbc embedded round-trip: $embeddedStatus").foreach { line =>
      info(line); println(line)
    }
    succeed
  }

  test("kafka gate agrees with the classpath") {
    // In this container the connector is known-absent; if someone adds
    // the jar, the gate must flip to true (and the live test below
    // starts running) — either state is internally consistent.
    val direct =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    KafkaIO.connectorAvailable shouldBe direct
  }

  test("jdbc gate rejects a URL no registered driver accepts") {
    Sinks.jdbcDriverAvailable("jdbc:graft-no-such-driver://x") shouldBe false
  }

  test("S5/S6 live: batch publish then batch subscribe round-trips through a real broker") {
    assume(KafkaIO.connectorAvailable,
      "spark-sql-kafka connector not on classpath — add the jar to enable")
    assume(brokers.isDefined, "GRAFT_KAFKA_BROKERS not set — export to enable")
    import spark.implicits._
    val topic = s"graft_it_${System.nanoTime()}"
    val out = Seq(("blk_1", 1L), ("blk_2", 2L)).toDF("block_id", "v")
    KafkaIO.publish(out, brokers.get, topic)
    val back = spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers.get)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value").cast("string").as("value"))
    val parsed = back.select(
      get_json_object(col("value"), "$.block_id").as("block_id"),
      get_json_object(col("value"), "$.v").cast("long").as("v"))
    parsed.collect().map(r => r.getString(0) -> r.getLong(1)).toSet shouldBe
      Set("blk_1" -> 1L, "blk_2" -> 2L)
  }

  test("S9 live (embedded Derby): overwrite, replace, read-back with no external endpoint") {
    assume(Sinks.jdbcDriverAvailable(EmbeddedDerbyUrl),
      "no embedded Derby driver on classpath — add derby.jar to enable")
    import spark.implicits._
    val props = new java.util.Properties()
    val table = s"graft_it_${System.nanoTime()}"
    val out = Seq(("blk_1", 0.5), ("blk_2", 0.9)).toDF("block_id", "score")
    Sinks.writeJdbc(out, EmbeddedDerbyUrl, table, props)
    val back = spark.read.jdbc(EmbeddedDerbyUrl, table, props)
    back.collect().map(r => r.getString(0) -> r.getDouble(1)).toSet shouldBe
      Set("blk_1" -> 0.5, "blk_2" -> 0.9)
    // if_exists='replace' semantics (load_data_to_sql.py:6-17): a
    // second overwrite REPLACES the table — only the new rows remain.
    val out2 = Seq(("blk_3", 1.5)).toDF("block_id", "score")
    Sinks.writeJdbc(out2, EmbeddedDerbyUrl, table, props)
    spark.read.jdbc(EmbeddedDerbyUrl, table, props)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSet shouldBe
      Set("blk_3" -> 1.5)
  }

  test("S9 live: jdbc overwrite then read-back round-trips through a real database") {
    assume(jdbcUrl.isDefined, "GRAFT_JDBC_URL not set — export to enable")
    assume(Sinks.jdbcDriverAvailable(jdbcUrl.get),
      s"no JDBC driver on classpath accepts ${jdbcUrl.get} — add the jar to enable")
    import spark.implicits._
    val props = new java.util.Properties()
    sys.env.get("GRAFT_JDBC_USER").foreach(props.setProperty("user", _))
    sys.env.get("GRAFT_JDBC_PASSWORD").foreach(props.setProperty("password", _))
    val table = s"graft_it_${System.nanoTime()}"
    val out = Seq(("blk_1", 0.5), ("blk_2", 0.9)).toDF("block_id", "score")
    Sinks.writeJdbc(out, jdbcUrl.get, table, props)
    val back = spark.read.jdbc(jdbcUrl.get, table, props)
    back.collect().map(r => r.getString(0) -> r.getDouble(1)).toSet shouldBe
      Set("blk_1" -> 0.5, "blk_2" -> 0.9)
  }
}
