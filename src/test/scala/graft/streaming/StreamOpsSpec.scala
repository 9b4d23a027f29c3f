package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Specs for the declarative streaming operators: watermarked
  * streaming dedup (at-least-once → effectively-once) and
  * session_window gap sessions, including batch/stream parity.
  */
class StreamOpsSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def typed(df: org.apache.spark.sql.DataFrame) = df.select(
    col("_1").as("msg_id"), col("_2").cast("timestamp").as("ts"), col("_3").as("payload"))

  test("streaming dedup drops within-watermark re-deliveries") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    val deduped = StreamOps.dedup(
      typed(input.toDF()), Seq("msg_id"), "ts", watermark = "10 minutes")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      // m1 delivered 3x (once in a later batch), m2 once.
      input.addData(
        ("m1", "2024-01-01 00:00:00", "a"),
        ("m1", "2024-01-01 00:00:01", "a-dup"),
        ("m2", "2024-01-01 00:00:02", "b"))
      query.processAllAvailable()
      input.addData(("m1", "2024-01-01 00:00:03", "a-redelivery"))
      query.processAllAvailable()
      val got = spark.table("dedup_out")
      got.count() shouldBe 2L
      got.select("payload").orderBy("payload").collect().map(_.getString(0)).toSeq shouldBe
        Seq("a", "b")
    } finally query.stop()
  }

  test("batch fallback of dedup keeps one row per key") {
    import spark.implicits._
    val batch = typed(Seq(
      ("m1", "2024-01-01 00:00:00", "a"),
      ("m1", "2024-01-01 00:00:01", "a-dup"),
      ("m2", "2024-01-01 00:00:02", "b")).toDF())
    StreamOps.dedup(batch, Seq("msg_id"), "ts").count() shouldBe 2L
  }

  test("stream-stream interval join matches within the bound, batch agrees") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val impRows = Seq(("ad1", "2024-01-01 00:00:00"), ("ad2", "2024-01-01 00:05:00"))
    val clickRows = Seq(
      ("ad1", "2024-01-01 00:00:30"),  // within 1 min of ad1 -> match
      ("ad1", "2024-01-01 00:03:00"),  // > 1 min after ad1 -> no match
      ("ad2", "2024-01-01 00:04:00"))  // BEFORE the ad2 impression -> no match
    def imps(df: org.apache.spark.sql.DataFrame) = df.select(
      col("_1").as("ad_id"), col("_2").cast("timestamp").as("imp_ts"))
    def clicks(df: org.apache.spark.sql.DataFrame) = df.select(
      col("_1").as("c_ad_id"), col("_2").cast("timestamp").as("click_ts"))

    val want = StreamOps.intervalJoin(
        imps(impRows.toDF()), clicks(clickRows.toDF()),
        "ad_id", "c_ad_id", "imp_ts", "click_ts", within = "1 minute")
      .select("ad_id", "click_ts").collect().map(_.toSeq)
    assert(want.map(_.head) === Seq("ad1"))

    val impStream = MemoryStream[(String, String)]
    val clickStream = MemoryStream[(String, String)]
    val query = StreamOps.intervalJoin(
        imps(impStream.toDF()), clicks(clickStream.toDF()),
        "ad_id", "c_ad_id", "imp_ts", "click_ts", within = "1 minute")
      .select("ad_id", "click_ts")
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      impStream.addData(impRows: _*)
      clickStream.addData(clickRows: _*)
      query.processAllAvailable()
      val got = spark.table("ssjoin_out").collect().map(_.toSeq)
      assert(got.toSet === want.toSet)
    } finally query.stop()
  }

  test("stateful ops run on the RocksDB state store (the at-scale backend)") {
    // HDFS-backed in-memory state dies at 100 TB key cardinality;
    // RocksDB spills state to local disk with incremental checkpoints.
    // Same query code — the backend is pure configuration.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    spark.conf.set(key, rocks)
    try {
      val input = MemoryStream[(String, String, String)]
      val query = StreamOps.dedup(
          typed(input.toDF()), Seq("msg_id"), "ts", watermark = "10 minutes")
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").start()
      try {
        input.addData(
          ("m1", "2024-01-01 00:00:00", "a"),
          ("m1", "2024-01-01 00:00:01", "dup"),
          ("m2", "2024-01-01 00:00:02", "b"))
        query.processAllAvailable()
        assert(spark.table("rocks_out").count() === 2L)
        // The state operator really is on RocksDB, not the default.
        val progress = query.lastProgress.stateOperators
        assert(progress.nonEmpty)
        assert(query.lastProgress.json.contains("rocksdb"),
          s"expected rocksdb metrics in progress:\n${query.lastProgress.json}")
      } finally query.stop()
    } finally spark.conf.unset(key)
  }

  test("streaming query restart from checkpoint neither loses nor duplicates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val store = java.nio.file.Files.createTempDirectory("graft-restart-store").toString
    val input = MemoryStream[(String, String, String)]
    def start() = typed(input.toDF())
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        ServingStore.upsert(batch, store, "msg_id", batchId); ()
      }.start()

    val q1 = start()
    try {
      input.addData(("m1", "2024-01-01 00:00:00", "a"))
      q1.processAllAvailable()
    } finally q1.stop()
    // Restart against the same checkpoint; feed one more batch.
    val q2 = start()
    try {
      input.addData(("m2", "2024-01-01 00:00:01", "b"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = ServingStore.read(spark, store)
    assert(rows.count() === 2L)
    assert(rows.select("msg_id").orderBy("msg_id").collect().map(_.getString(0)).toSeq
      === Seq("m1", "m2"))
  }

  test("session_window splits on the gap, batch and stream agree") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user u1: burst at 00:00:00-00:00:20, then (gap > 30s) burst at
    // 00:01:00; user u2: one event. Expect sessions (u1,3), (u1,1), (u2,1).
    val rows = Seq(
      ("u1", "2024-01-01 00:00:00"),
      ("u1", "2024-01-01 00:00:10"),
      ("u1", "2024-01-01 00:00:20"),
      ("u1", "2024-01-01 00:01:00"),
      ("u2", "2024-01-01 00:00:05"))
    def asDf(df: org.apache.spark.sql.DataFrame) = df.select(
      col("_1").as("user_id"), col("_2").cast("timestamp").as("ts"))

    val batchGot = StreamOps.gapSessions(asDf(rows.toDF()), "user_id", "ts", "30 seconds")
      .orderBy("user_id", "session_start_ms").collect()
    batchGot.map(r => (r.getString(0), r.getAs[Long]("n_events"))).toSeq shouldBe
      Seq(("u1", 3L), ("u1", 1L), ("u2", 1L))
    // First u1 session closes 30s after its last event.
    batchGot(0).getAs[Long]("session_end_ms") -
      batchGot(0).getAs[Long]("session_start_ms") shouldBe 50000L

    val input = MemoryStream[(String, String)]
    val query = StreamOps.gapSessions(asDf(input.toDF()), "user_id", "ts", "30 seconds",
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      // Advance the watermark far past every session end to flush them.
      input.addData(("u3", "2024-01-01 01:00:00"))
      query.processAllAvailable()
      val streamGot = spark.table("sessions_out")
        .filter(col("user_id") =!= "u3")
        .orderBy("user_id", "session_start_ms").collect()
      streamGot.map(_.toSeq) shouldBe batchGot.map(_.toSeq)
    } finally query.stop()
  }

  test("stream-side bloom decontamination drops leakage at ingestion, stateless") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfd = "/root/testdata/sf0.001"
    // Eval slice + bloom exactly as q94 builds them.
    val docs = graft.core.Tables.documents(spark, sfd)
    val evalGrams = docs.filter(col("source") === "src0")
      .select(explode(call_function("graft_ngrams",
        split(col("text"), " "), lit(5))).as("g"))
      .distinct()
    val bits = graft.functions.Bloom.buildLong(evalGrams, "g", evalGrams.count(), 1e-6)
    // Ground truth: train docs sharing any 5-gram with the eval slice.
    val evalSet = evalGrams.collect().map(_.getLong(0)).toSet
    val train = docs.filter(col("source") =!= "src0")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[Long] = {
      val w = t.split(" ", -1)
      w.sliding(5).filter(_.length == 5).map { g =>
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(g.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15), 16)
      }.toSet
    }
    val contaminated = train.filter { case (_, t) => (grams(t) & evalSet).nonEmpty }
      .map(_._1).toSet
    assert(contaminated.nonEmpty, "fixture must contain leakage")

    // Batch parity first (same expression tree).
    val batchKept = StreamOps.decontaminate(
        docs.filter(col("source") =!= "src0"), "text", bits)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((batchKept & contaminated).isEmpty, "no false negatives (batch)")

    // Stream: the identical filter over a MemoryStream.
    val input = MemoryStream[(Long, String)]
    val kept = StreamOps.decontaminate(
      input.toDF().select(col("_1").as("doc_id"), col("_2").as("text")),
      "text", bits)
    val query = kept.writeStream.format("memory")
      .queryName("decontam_out").outputMode("append").start()
    try {
      input.addData(train.toSeq: _*)
      query.processAllAvailable()
      val streamKept = spark.table("decontam_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // Stream equals batch row-for-row, leakage never lands, and
      // over-drop is bounded by the bloom fpp (zero expected here).
      assert(streamKept == batchKept)
      assert((streamKept & contaminated).isEmpty, "no false negatives (stream)")
      assert(train.length - batchKept.size - contaminated.size <= 1,
        "fp over-drop beyond the fpp bound")
      // Stateless: the plan carries no stateful operator.
      assert(!query.lastProgress.toString.contains("stateOperators\" : [ {"))
    } finally query.stop()
  }

  test("streaming incremental dedup flags index band-bucket hits, stateless, stream ≡ batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfd = "/root/testdata/sf0.001"
    // Index = the stored warehouse bands minus the incoming source —
    // exactly q113's premise (src19 plays today's crawl). The bloom is
    // built over the FULL stored index; the incoming docs' own bands
    // are in it too, which can only ADD flags — the ground truth below
    // therefore uses the full-index band sets as well.
    val bloom = graft.queries.Dedup.bandHashBloom(spark, sfd)
    val incoming = graft.core.Tables.documents(spark, sfd)
      .filter(col("source") === "src19")
      .select("doc_id", "text")

    // Ground truth: the doc's two band hashes against the stored
    // band-hash set (exact, no bloom).
    val idxHashes = graft.queries.Warehouse.stored(spark, sfd, "bands")
      .select(conv(substring(col("band_hash"), 1, 15), 16, 10)
        .cast("long").as("h"))
      .collect().map(_.getLong(0)).toSet
    val truth = incoming
      .select(col("doc_id"),
        graft.queries.Dedup.bandHashes60(col("text")).as("bh"))
      .collect()
      .filter(r => r.getSeq[Long](1).exists(idxHashes.contains))
      .map(_.getLong(0)).toSet
    assert(truth.nonEmpty, "fixture must contain index hits")

    // Batch parity.
    val batchFlagged = StreamOps.flagIndexDuplicates(incoming, "text", bloom)
      .filter(col("dup_candidate")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert((truth -- batchFlagged).isEmpty, "no false negatives (batch)")

    // Stream: identical expression over a MemoryStream.
    val input = MemoryStream[(Long, String)]
    val flagged = StreamOps.flagIndexDuplicates(
      input.toDF().select(col("_1").as("doc_id"), col("_2").as("text")),
      "text", bloom)
    val query = flagged.writeStream.format("memory")
      .queryName("dup_probe_out").outputMode("append").start()
    try {
      val rows = incoming.collect().map(r => (r.getLong(0), r.getString(1)))
      input.addData(rows.toSeq: _*)
      query.processAllAvailable()
      val streamFlagged = spark.table("dup_probe_out")
        .filter(col("dup_candidate")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamFlagged == batchFlagged, "stream ≡ batch")
      assert((truth -- streamFlagged).isEmpty, "no false negatives (stream)")
      // fpp-bounded over-flag (1e-6 × 2 probes/doc ⇒ 0 expected).
      assert((streamFlagged -- truth).size <= 1, "over-flag beyond fpp bound")
      // Stateless: no state-store operator in the progress.
      assert(!query.lastProgress.toString.contains("stateOperators\" : [ {"))
    } finally query.stop()
  }

  test("flagIndexDuplicates keeps null-text rows unflagged (md5('') band collision)") {
    import spark.implicits._
    // ADVICE r13: bandHashes60 over null text does NOT null-propagate —
    // the all-null signature falls through concat_ws to md5("") and
    // yields two REAL band hashes. Build the bloom over an index that
    // CONTAINS a null-text doc's bands, so an unguarded probe would
    // flag every null incoming doc; the explicit when(isNull) gate
    // must keep it unflagged.
    val nullBands = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(explode(graft.queries.Dedup.bandHashes60(col("text"))).as("h"))
    val bits = graft.functions.Bloom.buildLong(nullBands, "h", 2L, 1e-6)
    val rows = Seq((1L, "a b c"), (2L, null)).toDF("doc_id", "text")
    val flagged = StreamOps.flagIndexDuplicates(rows, "text", bits)
      .filter(col("dup_candidate")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!flagged.contains(2L), "null-text doc must stay unflagged")
  }

  test("decontaminate keeps null-text rows (no silent over-drop)") {
    import spark.implicits._
    // A null document has no n-grams, so it cannot be contaminated —
    // ADVICE r12: exists() over a null gram array yields null and a
    // bare !null filter dropped the row. A tiny real bloom (one gram)
    // exercises the same expression tree as production.
    val g = Seq(Tuple1(42L)).toDF("g")
    val bits = graft.functions.Bloom.buildLong(g, "g", 1L, 1e-6)
    val rows = Seq((1L, "a b c"), (2L, null), (3L, "")).toDF("doc_id", "text")
    val kept = StreamOps.decontaminate(rows, "text", bits)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("the stream quality gate scores exactly like the batch q181 model") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(120).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // Batch parity reference: the same expression over a plain frame.
    val batch = StreamOps.qualityGate(
        docs.toSeq.toDF("doc_id", "text"), "text")
      .select("doc_id", "quality_logit_micro", "quality_pass")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    // Plain-Scala rescoring against the loaded artifact (the
    // QualityModelSpec law at the stream boundary).
    val (bias, ws) = graft.queries.PipelineOps.QualityLr
    val P = 2147483647L
    batch.foreach { case (id, lm, pass) =>
      val text = docs.find(_._1 == id).get._2
      val hs = text.split(" ", -1).distinct.map { tok =>
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(tok.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15), 16) % P
      }.distinct
      val expect = bias + hs.map(h => ws((h % ws.length).toInt)).sum
      assert(lm == expect, s"doc $id logit")
      assert(pass == (expect > 0L), s"doc $id flag")
    }
    // Stream: identical rows through a MemoryStream.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val gated = StreamOps.qualityGate(
      input.toDF().select(col("_1").as("doc_id"), col("_2").as("text")),
      "text")
    val query = gated.writeStream.format("memory")
      .queryName("quality_gate_out").outputMode("append").start()
    try {
      input.addData(docs.toSeq: _*)
      query.processAllAvailable()
      val streamed = spark.table("quality_gate_out")
        .select("doc_id", "quality_logit_micro", "quality_pass")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
      assert(streamed == batch, "stream rows != batch rows")
    } finally query.stop()
  }
}
