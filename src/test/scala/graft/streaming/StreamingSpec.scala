package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.log.Templates
import graft.ml.Scorer

/** Speed-layer spec: JSON codec, micro-batch enrich (reusing the batch
  * parse/template/feature code), keyed-upsert idempotence, the full
  * MemoryStream → foreachBatch → serving-store e2e, watermarked
  * 1-minute metrics, and stateful sessionization across batches.
  */
class StreamingSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val templates = Seq(
    Templates.Template("E1", "Receiving block[*]src:[*]dest:[*]"),
    Templates.Template("E2", "BLOCK* NameSystem[*]allocateBlock:[*]"),
    Templates.Template("E3", "Served block[*]to[*]"),
    Templates.Template("E4", "deleted block[*]"))

  // sigmoid(2·E1 − E3 − 2): blk_100 (E1=2,E2=1) → 0.881 ⇒ 1 at 0.83;
  // blk_-200 (E1=1,E3=1) → 0.269 ⇒ 0.
  private val scorer = Scorer.LinearScorer(Seq(2.0, 0.0, -1.0, 0.0), -2.0)

  private def msg(blockId: String, start: String, end: String,
      lines: Seq[String]): (String, String, String, Long, String, Long) = {
    val durSec = (java.sql.Timestamp.valueOf(end).getTime -
      java.sql.Timestamp.valueOf(start).getTime) / 1000
    (blockId, start, end, durSec, lines.mkString("\n"), lines.length.toLong)
  }

  private def messagesDf(ms: Seq[(String, String, String, Long, String, Long)]) = {
    import spark.implicits._
    ms.toDF("block_id", "start_ts_s", "end_ts_s", "duration_sec", "log_full", "num_lines")
      .select(col("block_id"),
        col("start_ts_s").cast("timestamp").as("start_ts"),
        col("end_ts_s").cast("timestamp").as("end_ts"),
        col("duration_sec"), col("log_full"), col("num_lines"))
  }

  private val m100 = msg("blk_100", "2008-11-09 20:35:18", "2008-11-09 20:36:18", Seq(
    "081109 203518 143 INFO dfs.DataNode$DataXceiver: Receiving block blk_100 src: /10.0.0.1:50010 dest: /10.0.0.2:50010",
    "081109 203530 144 INFO dfs.FSNamesystem: BLOCK* NameSystem.allocateBlock: /user/job1/file.jar. blk_100",
    "081109 203618 143 INFO dfs.DataNode$DataXceiver: Receiving block blk_100 src: /10.0.0.3:50010 dest: /10.0.0.2:50010"))
  private val m200 = msg("blk_-200", "2008-11-09 21:00:00", "2008-11-09 22:00:00", Seq(
    "081109 210000 201 WARN dfs.DataNode$DataXceiver: Receiving block blk_-200 src: /10.0.0.9:50010 dest: /10.0.0.2:50010",
    "081109 220000 202 INFO dfs.DataNode$BlockSender: Served block blk_-200 to /10.0.0.4"))
  // Updated view of blk_-200 (one more line) — the upsert overwrite case.
  private val m200v2 = msg("blk_-200", "2008-11-09 21:00:00", "2008-11-09 22:01:00", Seq(
    "081109 210000 201 WARN dfs.DataNode$DataXceiver: Receiving block blk_-200 src: /10.0.0.9:50010 dest: /10.0.0.2:50010",
    "081109 220000 202 INFO dfs.DataNode$BlockSender: Served block blk_-200 to /10.0.0.4",
    "081109 220100 203 INFO dfs.DataNode$BlockSender: Served block blk_-200 to /10.0.0.5"))
  // No template ever matches frobnication → all-zero features fallback.
  private val m300 = msg("blk_300", "2008-11-10 00:00:01", "2008-11-10 00:00:01", Seq(
    "081110 000001 300 ERROR dfs.DataNode: Unexpected frobnication of blk_300"))

  test("from_json parse inverts to_json and drops malformed values") {
    import spark.implicits._
    val json = StreamMessages.toJson(messagesDf(Seq(m100, m200)))
      .as[String].collect().toSeq
    val parsed = StreamMessages.parse((json :+ "{not json" :+ """{"other":1}""").toDF("value"))
    parsed.count() shouldBe 2
    val r = parsed.filter(col("block_id") === "blk_100").head()
    r.getAs[java.sql.Timestamp]("start_ts").toString shouldBe "2008-11-09 20:35:18.0"
    r.getAs[Long]("num_lines") shouldBe 3
    r.getAs[String]("log_full") should include("allocateBlock")
  }

  test("enrich rebuilds features from log text and scores them") {
    val out = StreamTransform.enrich(messagesDf(Seq(m100, m200, m300)), templates, scorer)
    out.count() shouldBe 3
    val rows = out.collect().map(r => r.getAs[String]("block_id") -> r).toMap
    rows("blk_100").getAs[Seq[Int]]("features") shouldBe Seq(2, 1, 0, 0)
    rows("blk_100").getAs[Int]("prediction") shouldBe 1
    rows("blk_-200").getAs[Seq[Int]]("features") shouldBe Seq(1, 0, 1, 0)
    rows("blk_-200").getAs[Int]("prediction") shouldBe 0
    rows("blk_300").getAs[Seq[Int]]("features") shouldBe Seq(0, 0, 0, 0)
    rows("blk_300").getAs[Long]("ts_ms") shouldBe
      java.sql.Timestamp.valueOf("2008-11-10 00:00:01").getTime
  }

  test("enrichLocal ≡ enrich row-identically on block-local messages (r18 #5)") {
    // The production invariant: every line of a message names the
    // message's own block, so the map-only per-message form and the
    // batch-formulated global regroup must agree COLUMN FOR COLUMN —
    // including the dedupe, the zero-feature fallback (m300) and the
    // scored verdicts. This is the pin that lets the stream pipeline
    // serve enrichLocal while q62's batch path keeps the global form.
    val ms = messagesDf(Seq(m100, m200, m200v2, m300))
    val global = StreamTransform.enrich(ms, templates, scorer)
    val local = StreamTransform.enrichLocal(ms, templates, scorer)
    local.columns.toSeq shouldBe global.columns.toSeq
    val key = (r: org.apache.spark.sql.Row) => r.getAs[String]("block_id")
    val g = global.collect().map(r => key(r) -> r.toSeq).toMap
    val l = local.collect().map(r => key(r) -> r.toSeq).toMap
    l shouldBe g
  }

  test("enrichLocal keeps a message's verdict a function of its own payload") {
    // The documented semantic boundary: a line naming ANOTHER block
    // contributes nothing to this message under the per-message form
    // (the reference consumer's one-message-at-a-time behavior).
    val foreign = msg("blk_100", "2008-11-09 20:35:18", "2008-11-09 20:36:18", Seq(
      "081109 203518 143 INFO dfs.DataNode$DataXceiver: Receiving block blk_100 src: /10.0.0.1:50010 dest: /10.0.0.2:50010",
      "081109 203530 144 INFO dfs.DataNode$BlockSender: Served block blk_999 to /10.0.0.4"))
    val out = StreamTransform.enrichLocal(messagesDf(Seq(foreign)), templates, scorer)
    out.head().getAs[Seq[Int]]("features") shouldBe Seq(1, 0, 0, 0)
  }

  test("enrich dedupes to the newest message per block before counting") {
    val out = StreamTransform.enrich(messagesDf(Seq(m200, m200v2)), templates, scorer)
    out.count() shouldBe 1
    val r = out.head()
    r.getAs[Long]("num_lines") shouldBe 3
    // Counts come from v2's lines only — not doubled by the stale copy.
    r.getAs[Seq[Int]]("features") shouldBe Seq(1, 0, 2, 0)
  }

  test("serving store upsert is keyed, versioned and replay-idempotent") {
    val store = Files.createTempDirectory("graft-store").toString
    val b0 = StreamTransform.enrich(messagesDf(Seq(m100, m200)), templates, scorer)
    ServingStore.upsert(b0, store, "block_id", 0L) shouldBe true
    val b1 = StreamTransform.enrich(messagesDf(Seq(m200v2, m300)), templates, scorer)
    ServingStore.upsert(b1, store, "block_id", 1L) shouldBe true

    val snap = ServingStore.read(spark, store)
    snap.count() shouldBe 3
    snap.filter(col("block_id") === "blk_-200").head()
      .getAs[Long]("num_lines") shouldBe 3 // v2 won

    // Replayed batch (same id) is a no-op: same pointer, same content.
    val before = ServingStore.pointer(store)
    ServingStore.upsert(b1, store, "block_id", 1L) shouldBe false
    ServingStore.pointer(store) shouldBe before
    ServingStore.read(spark, store).count() shouldBe 3

    // Keyed delete rewrites minus the key set.
    ServingStore.delete(spark, store, "block_id", Seq("blk_300"), 2L) shouldBe true
    ServingStore.read(spark, store).count() shouldBe 2
  }

  test("serving store compaction shrinks file count, keeps data and high-water") {
    val store = Files.createTempDirectory("graft-store").toString
    val b0 = StreamTransform.enrich(messagesDf(Seq(m100, m200)), templates, scorer)
      .repartition(4)
    // Force a many-small-files snapshot: since r20 the upsert write is
    // scale-adaptively coalesced (one file per targetFileBytes), so the
    // fragmented fixture needs a 1-byte target for its first write.
    spark.conf.set(ServingStore.TargetFileBytesConf, "1")
    try ServingStore.upsert(b0, store, "block_id", 0L) shouldBe true
    finally spark.conf.unset(ServingStore.TargetFileBytesConf)
    val rowsBefore = ServingStore.read(spark, store).collect().map(_.toSeq).toSet
    def dataFiles(v: Long) = Files.list(java.nio.file.Paths.get(store, s"v=$v"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).count()
    val (v0, hw0) = ServingStore.pointer(store)
    assert(dataFiles(v0) > 1, "fixture must start fragmented")

    ServingStore.compact(spark, store, targetFiles = 1) shouldBe true
    val (v1, hw1) = ServingStore.pointer(store)
    v1 shouldBe v0 + 1
    hw1 shouldBe hw0 // compaction must not advance the replay guard
    dataFiles(v1) shouldBe 1
    ServingStore.read(spark, store).collect().map(_.toSeq).toSet shouldBe rowsBefore
    // Replay of an already-applied batch is still a no-op after compaction.
    ServingStore.upsert(b0, store, "block_id", 0L) shouldBe false
    // Compacting an empty store is a no-op.
    val empty = Files.createTempDirectory("graft-store-empty").toString
    ServingStore.compact(spark, empty) shouldBe false
  }

  test("upsert snapshots are scale-adaptively sized: a small store writes one file") {
    // r20 (r19 verdict #3): a micro-batch snapshot no longer inherits
    // the session's shuffle parallelism — its file count follows its
    // BYTES (default 128 MB/file), so a tiny store is exactly one file
    // per version regardless of the batch frame's partitioning.
    val store = Files.createTempDirectory("graft-store-sized").toString
    val b0 = StreamTransform.enrich(messagesDf(Seq(m100, m200)), templates, scorer)
      .repartition(4)
    ServingStore.upsert(b0, store, "block_id", 0L) shouldBe true
    def dataFiles(v: Long) = Files.list(java.nio.file.Paths.get(store, s"v=$v"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).count()
    val (v0, _) = ServingStore.pointer(store)
    dataFiles(v0) shouldBe 1
    val rows0 = ServingStore.read(spark, store).collect().map(_.toSeq).toSet
    // The merged (anti-join + union) path sizes the same way and the
    // coalesce changes layout only, never content.
    val b1 = StreamTransform.enrich(messagesDf(Seq(m200v2, m300)), templates, scorer)
      .repartition(4)
    ServingStore.upsert(b1, store, "block_id", 1L) shouldBe true
    val (v1, _) = ServingStore.pointer(store)
    dataFiles(v1) shouldBe 1
    ServingStore.read(spark, store).count() shouldBe 3
    // Last write won for the re-keyed block; the untouched key survived.
    val byKey = ServingStore.read(spark, store).collect()
      .map(r => r.getAs[String]("block_id")).toSet
    byKey shouldBe Set("blk_100", "blk_-200", "blk_300")
    rows0 should not be empty
  }

  test("e2e: MemoryStream -> from_json -> enrich -> foreachBatch upsert") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = Files.createTempDirectory("graft-store-e2e").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val input = MemoryStream[String]
    val query = StreamPipeline.run(
      input.toDF().select(col("value")), templates, scorer, store, checkpoint)
    try {
      input.addData(StreamMessages.toJson(messagesDf(Seq(m100, m200))).as[String].collect(): _*)
      query.processAllAvailable()
      ServingStore.read(spark, store).count() shouldBe 2

      input.addData(StreamMessages.toJson(messagesDf(Seq(m200v2, m300))).as[String].collect(): _*)
      query.processAllAvailable()
      val snap = ServingStore.read(spark, store).collect()
        .map(r => r.getAs[String]("block_id") -> r).toMap
      snap should have size 3
      snap("blk_-200").getAs[Long]("num_lines") shouldBe 3
      snap("blk_100").getAs[Int]("prediction") shouldBe 1
      snap("blk_300").getAs[Seq[Int]]("features") shouldBe Seq(0, 0, 0, 0)
    } finally query.stop()
  }

  test("e2e: file source micro-batches drive the same pipeline") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val store = Files.createTempDirectory("graft-store-file").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt-file").toString
    // A production-shaped source: newline-delimited JSON files landing
    // in a directory (what Kafka would feed; no broker in this
    // container). Same value-column contract, same pipeline.
    def land(name: String, ms: Seq[(String, String, String, Long, String, Long)]): Unit = {
      val lines = StreamMessages.toJson(messagesDf(ms)).as[String].collect()
      val tmp = Files.createTempFile("batch", ".json")
      Files.writeString(tmp, lines.mkString("\n"))
      Files.move(tmp, java.nio.file.Paths.get(inDir, name))
    }
    land("b0.json", Seq(m100, m200))
    val raw = spark.readStream.text(inDir).withColumnRenamed("value", "value")
    val query = StreamPipeline.run(raw, templates, scorer, store, checkpoint)
    try {
      query.processAllAvailable()
      ServingStore.read(spark, store).count() shouldBe 2
      land("b1.json", Seq(m200v2, m300))
      query.processAllAvailable()
      val snap = ServingStore.read(spark, store)
      snap.count() shouldBe 3
      snap.filter(col("block_id") === "blk_-200").head()
        .getAs[Long]("num_lines") shouldBe 3
    } finally query.stop()
  }

  test("serving queries answer over the streamed store (lambda loop)") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-store-serve").toString
    val b = StreamTransform.enrich(
      messagesDf(Seq(m100, m200, m300)), templates, scorer)
    ServingStore.upsert(b, store, "block_id", 0L) shouldBe true
    val serving = ServingStore.read(spark, store)

    // Q1/W4: latest N by ts_ms.
    val latest = serving.orderBy(col("ts_ms").desc, col("block_id"))
      .limit(2).select("block_id").as[String].collect()
    latest shouldBe Array("blk_300", "blk_-200")
    // Q5/P7: prediction threshold facet.
    serving.filter(col("prediction") === 1)
      .select("block_id").as[String].collect() shouldBe Array("blk_100")
    // Q6/A10: single-scan stats.
    val stats = serving.agg(
      count(lit(1)).as("n"),
      sum(col("prediction")).as("n_anomalous"),
      min(col("ts_ms")).as("oldest")).head()
    stats.getAs[Long]("n") shouldBe 3
    stats.getAs[Long]("n_anomalous") shouldBe 1
    // Q7: keyed delete, then the store answers without the key.
    ServingStore.delete(spark, store, "block_id", Seq("blk_100"), 1L) shouldBe true
    ServingStore.read(spark, store)
      .filter(col("prediction") === 1).count() shouldBe 0
  }

  test("ST2: in-flight readers survive a concurrent upsert and a concurrent compact") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-store-conc").toString
    val b0 = Seq(("blk_1", 0L), ("blk_2", 0L)).toDF("block_id", "v")
    ServingStore.upsert(b0, store, "block_id", 0L) shouldBe true

    // Reader pins version 1, THEN an upsert commits version 2. The
    // commit reaps only versions older than the superseded one, so
    // the pinned reader's files are still on disk: its collect must
    // return the OLD snapshot, not the new one and not an error.
    val pinned = ServingStore.read(spark, store)
    val b1 = Seq(("blk_2", 1L), ("blk_3", 1L)).toDF("block_id", "v")
    ServingStore.upsert(b1, store, "block_id", 1L) shouldBe true
    pinned.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("blk_1" -> 0L, "blk_2" -> 0L)

    // Same for read-during-compact: pin version 2, compact to 3
    // (which reaps version 1), pinned reader still answers version 2.
    val pinned2 = ServingStore.read(spark, store)
    ServingStore.compact(spark, store, targetFiles = 1) shouldBe true
    pinned2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("blk_1" -> 0L, "blk_2" -> 1L, "blk_3" -> 1L)
  }

  test("ST2: interleaved reads during a live writer only ever see complete snapshots") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val store = Files.createTempDirectory("graft-store-race").toString
    // Writer invariant per batch i: updates key 'a' to v=i and adds
    // key x_i, so EVERY committed snapshot satisfies
    // count == 2 + v(a). A torn read (half-applied batch, reaped
    // version, torn pointer) breaks it.
    val base = Seq(("a", 0L), ("b", 0L)).toDF("block_id", "v")
    ServingStore.upsert(base, store, "block_id", 0L) shouldBe true
    val nBatches = 5
    val writer = Future {
      (1 to nBatches).foreach { i =>
        val b = Seq(("a", i.toLong), (s"x_$i", i.toLong)).toDF("block_id", "v")
        ServingStore.upsert(b, store, "block_id", i.toLong)
      }
    }
    var checks = 0
    while (!writer.isCompleted) {
      val snap = ServingStore.read(spark, store)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      snap.size shouldBe (2 + snap("a"))
      (1L to snap("a")).foreach(i => snap(s"x_$i") shouldBe i)
      checks += 1
    }
    Await.result(writer, 2.minutes)
    checks should be > 0
    // Final state: all batches applied.
    val fin = ServingStore.read(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fin("a") shouldBe nBatches.toLong
    fin.size shouldBe 2 + nBatches
  }

  test("watermarked 1-minute metrics match the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      ("2024-01-01 00:00:05", "view", 10.0),
      ("2024-01-01 00:00:40", "error", 30.0),
      ("2024-01-01 00:00:59", "view", 20.0),
      ("2024-01-01 00:01:10", "error", 50.0),
      ("2024-01-01 00:01:30", "error", 70.0))
    def typed(df: org.apache.spark.sql.DataFrame) = df.select(
      col("_1").cast("timestamp").as("ts"), col("_2").as("event_type"), col("_3").as("value"))

    val input = MemoryStream[(String, String, Double)]
    val streamed = StreamPipeline.metrics1m(
      typed(input.toDF()), "ts", col("event_type") === "error", col("value"))
    val query = streamed.writeStream.format("memory")
      .queryName("m1m").outputMode("update").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("m1m")
        .orderBy("minute_start_ms").collect()
      val want = StreamPipeline.metrics1m(
        typed(rows.toDF()), "ts", col("event_type") === "error", col("value"))
        .orderBy("minute_start_ms").collect()
      got.map(_.toSeq) shouldBe want.map(_.toSeq)
      want.map(r => (r.getAs[Long]("cnt_1m"), r.getAs[Long]("err_1m"))).toSeq shouldBe
        Seq((3L, 1L), (2L, 2L))
    } finally query.stop()
  }

  test("stateful sessionize also runs on a batch Dataset (no watermark node)") {
    import spark.implicits._
    val lines = Seq(("blk_a", 1000L), ("blk_a", 5000L), ("blk_b", 2000L))
      .toDF("block_id", "ts_ms")
      .as[StatefulSessionize.LineEvent]
    val got = StatefulSessionize.sessions(lines).collect()
      .map(s => s.block_id -> ((s.start_ms, s.end_ms, s.num_lines))).toMap
    got shouldBe Map(
      "blk_a" -> ((1000L, 5000L, 2L)),
      "blk_b" -> ((2000L, 2000L, 1L)))
  }

  test("stateful sessionization converges across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StatefulSessionize._
    val input = MemoryStream[LineEvent]
    val query = sessions(input.toDS()).writeStream.format("memory")
      .queryName("sess").outputMode("update").start()
    try {
      input.addData(LineEvent("blk_A", 10_000L), LineEvent("blk_A", 70_000L),
        LineEvent("blk_B", 5_000L))
      query.processAllAvailable()
      // 40 s of disorder — inside the allowed lateness, must NOT drop.
      input.addData(LineEvent("blk_A", 40_000L), LineEvent("blk_A", 130_000L))
      query.processAllAvailable()
      // Last update per key reflects ALL lines seen so far.
      val last = spark.table("sess").groupBy("block_id")
        .agg(max(struct(col("num_lines"), col("start_ms"), col("end_ms"),
          col("duration_sec"))).as("s"))
        .select("block_id", "s.*").collect()
        .map(r => r.getAs[String]("block_id") -> r).toMap
      last("blk_A").getAs[Long]("num_lines") shouldBe 4
      last("blk_A").getAs[Long]("start_ms") shouldBe 10_000L
      last("blk_A").getAs[Long]("end_ms") shouldBe 130_000L
      last("blk_A").getAs[Long]("duration_sec") shouldBe 120L
      last("blk_B").getAs[Long]("num_lines") shouldBe 1
    } finally query.stop()
  }

  test("idle sessions time out on the watermark and leave state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StatefulSessionize._
    val input = MemoryStream[LineEvent]
    // TTL 1 min, lateness 0: watermark = max event time seen.
    val query = sessions(input.toDS(), idleTtlMs = 60_000L, lateness = "0 seconds")
      .writeStream.format("memory")
      .queryName("sess_ttl").outputMode("update").start()
    try {
      input.addData(LineEvent("blk_A", 10_000L), LineEvent("blk_A", 30_000L))
      query.processAllAvailable()
      // An unrelated key far in the future pushes the watermark past
      // blk_A's end (30 s) + TTL (60 s) → blk_A must emit its final
      // snapshot on the timeout path and be evicted.
      input.addData(LineEvent("blk_Z", 500_000L))
      query.processAllAvailable()
      input.addData(LineEvent("blk_Z", 510_000L)) // extra batch so the timeout fires
      query.processAllAvailable()
      val a = spark.table("sess_ttl").filter(col("block_id") === "blk_A").collect()
      a.map(_.getAs[Long]("num_lines")).max shouldBe 2
      // A post-eviction line for blk_A starts a FRESH session (state
      // gone): its snapshot counts 1 line, not 3.
      input.addData(LineEvent("blk_A", 520_000L))
      query.processAllAvailable()
      val fresh = spark.table("sess_ttl")
        .filter(col("block_id") === "blk_A" && col("start_ms") === 520_000L)
        .collect()
      fresh should have size 1
      fresh.head.getAs[Long]("num_lines") shouldBe 1
    } finally query.stop()
  }
}
