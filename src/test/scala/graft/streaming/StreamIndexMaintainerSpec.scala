package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.queries.Warehouse

/** The speed layer maintaining the warehouse (round 14): a REAL
  * Structured Streaming query whose foreachBatch sink merges each
  * micro-batch into the standing index, plus the exactly-once replay
  * guard the pointer's high-water mark provides. */
class StreamIndexMaintainerSpec extends AnyFunSuite with Matchers
    with SparkFixture {

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
    a.count() shouldBe b.count()
  }

  // 20-token docs, 3 planted exact-duplicate pairs spanning the
  // standing/streamed boundary so the merge must actually join new
  // docs into standing clusters.
  private def docsOf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val base = if (i % 7 == 3) 3L else i // dup groups share doc 3's text
      (i, s"src${i % 3}", (1 to 20).map(t => s"w${base}_$t").mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  private def embOf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, Array.tabulate(8)(d => ((i % 5) + d + 1) * 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
  }

  test("a MemoryStream-driven maintainer converges to the full rebuild") {
    import spark.implicits._
    val standingDocs = docsOf(0L until 40L)
    val allEmb = embOf(0L until 12L)
    // Vectors 0..9 standing; 10 and 11 arrive with stream batches 0/1.
    val standingEmb = allEmb.filter(col("vec_id") < 10L)
    val wh = java.nio.file.Files
      .createTempDirectory("graft-stream-wh").toString
    val whFull = java.nio.file.Files
      .createTempDirectory("graft-stream-whfull").toString
    Warehouse.buildOf(spark, standingDocs, standingEmb, wh) shouldBe 1L
    Warehouse.lastMergedBatch(wh) shouldBe -1L

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docsStream = input.toDF().toDF("doc_id", "source", "text")
    val q = StreamIndexMaintainer.run(spark, wh, docsStream,
      (_, id) => Some(allEmb.filter(col("vec_id") === 10L + id)),
      java.nio.file.Files.createTempDirectory("graft-stream-ck").toString)
    try {
      val b0 = docsOf(40L until 50L).as[(Long, String, String)].collect()
      val b1 = docsOf(50L until 60L).as[(Long, String, String)].collect()
      input.addData(b0.toSeq)
      q.processAllAvailable()
      val vAfterFirst = Warehouse.version(wh)
      vAfterFirst should be > 1L
      input.addData(b1.toSeq)
      q.processAllAvailable()
      Warehouse.version(wh) should be > vAfterFirst
    } finally q.stop()

    // Drained stream ≡ one from-scratch build of everything.
    Warehouse.buildOf(spark, docsOf(0L until 60L), allEmb, whFull)
    Warehouse.TableNames.foreach { t =>
      withClue(s"table $t after streamed maintenance:") {
        sameRows(Warehouse.read(spark, wh, t),
          Warehouse.read(spark, whFull, t))
      }
    }
    Warehouse.lastMergedBatch(wh) should be >= 1L
  }

  test("a re-delivered batch is a no-op and compact carries the mark") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-stream-replay").toString
    Warehouse.buildOf(spark, docsOf(0L until 30L), embOf(0L until 10L), wh)
    val sink = StreamIndexMaintainer.sink(spark, wh,
      (_, _) => Some(embOf(Seq.empty))) _
    sink(docsOf(30L until 40L), 0L)
    val v = Warehouse.version(wh)
    Warehouse.lastMergedBatch(wh) shouldBe 0L
    // Crash-recovery re-delivery of the same batch: nothing applied.
    sink(docsOf(30L until 40L), 0L)
    Warehouse.version(wh) shouldBe v
    // A non-stream writer between merges must not reopen the replay
    // window: compact carries the high-water mark forward.
    Warehouse.compact(spark, wh)
    Warehouse.lastMergedBatch(wh) shouldBe 0L
    sink(docsOf(30L until 40L), 0L)
    Warehouse.version(wh) shouldBe v + 1 // the compact's version only
    // The next real batch applies.
    sink(docsOf(40L until 45L), 1L)
    Warehouse.version(wh) shouldBe v + 2
    Warehouse.lastMergedBatch(wh) shouldBe 1L
  }

  test("the retrieval store is stream-maintained with the same exactly-once mark") {
    import spark.implicits._
    import graft.queries.RetrievalIndex
    val wh = java.nio.file.Files
      .createTempDirectory("graft-stream-retr").toString
    val whFull = java.nio.file.Files
      .createTempDirectory("graft-stream-retrfull").toString
    RetrievalIndex.buildOf(spark, docsOf(0L until 40L), wh) shouldBe 1L

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamIndexMaintainer.runRetrieval(spark, wh,
      input.toDF().toDF("doc_id", "source", "text"),
      java.nio.file.Files.createTempDirectory("graft-stream-retrck").toString)
    try {
      input.addData(docsOf(40L until 50L).as[(Long, String, String)].collect().toSeq)
      q.processAllAvailable()
      input.addData(docsOf(50L until 60L).as[(Long, String, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // Drained stream ≡ one from-scratch build of everything.
    RetrievalIndex.buildOf(spark, docsOf(0L until 60L), whFull)
    sameRows(
      Warehouse.read(spark, wh, "postings")
        .select("term", "doc_id", "tf", "dl", "term_bucket"),
      Warehouse.read(spark, whFull, "postings")
        .select("term", "doc_id", "tf", "dl", "term_bucket"))
    Warehouse.read(spark, wh, "corpus_stats").collect()(0).toSeq shouldBe
      Warehouse.read(spark, whFull, "corpus_stats").collect()(0).toSeq
    Warehouse.lastMergedBatch(wh) should be >= 1L

    // Replay guard through the REAL sink body: the SAME stream
    // re-delivering the final batch is a no-op...
    val v = Warehouse.version(wh)
    val recordedId = Warehouse.streamIdOf(wh)
    recordedId shouldBe defined // runRetrieval recorded its query id
    StreamIndexMaintainer.retrievalSink(spark, wh,
      () => recordedId)(docsOf(50L until 60L), 1L)
    Warehouse.version(wh) shouldBe v
    // ...while an UNIDENTIFIED delivery to the identified mark
    // refuses loudly (ADVICE r15) instead of silently dropping.
    intercept[IllegalStateException] {
      StreamIndexMaintainer.retrievalSink(spark, wh)(docsOf(50L until 60L), 1L)
    }
    // A compaction between merges carries the mark forward.
    RetrievalIndex.compact(spark, wh)
    Warehouse.lastMergedBatch(wh) should be >= 1L
  }

  test("the replay mark is keyed to the recording stream's identity") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-stream-ident").toString
    Warehouse.buildOf(spark, docsOf(0L until 30L), embOf(0L until 10L), wh)
    val idA = Some("query-id-A")
    val sinkA = StreamIndexMaintainer.sink(spark, wh,
      (_, _) => Some(embOf(Seq.empty)), () => idA) _
    sinkA(docsOf(30L until 40L), 0L)
    sinkA(docsOf(40L until 45L), 1L)
    Warehouse.lastMergedBatch(wh) shouldBe 1L
    Warehouse.streamIdOf(wh) shouldBe idA
    // Same stream re-delivers: certified replay, no-op.
    val v = Warehouse.version(wh)
    sinkA(docsOf(40L until 45L), 1L)
    Warehouse.version(wh) shouldBe v
    // A non-stream writer carries mark AND identity forward.
    Warehouse.compact(spark, wh)
    Warehouse.streamIdOf(wh) shouldBe idA
    Warehouse.lastMergedBatch(wh) shouldBe 1L
    // A DIFFERENT stream (recreated checkpoint: ids restart at 0, or a
    // second maintainer) must refuse LOUDLY — batch 0 <= mark 1, but
    // silently dropping it would lose data (ADVICE r14).
    val sinkB = StreamIndexMaintainer.sink(spark, wh,
      (_, _) => Some(embOf(Seq.empty)), () => Some("query-id-B")) _
    val ex = intercept[IllegalStateException] {
      sinkB(docsOf(45L until 50L), 0L)
    }
    ex.getMessage should include("recorded by stream")
    Warehouse.version(wh) should be > 0L // store intact, nothing committed
    // ...and a foreign HIGH batch id refuses too (merging it could
    // double-apply what stream A already merged).
    intercept[IllegalStateException] { sinkB(docsOf(45L until 50L), 7L) }
    // An UNIDENTIFIED delivery (recreated checkpoint with missing
    // metadata, or a direct sink call mixed into a stream-maintained
    // store) refuses too (ADVICE r15): its restarted-at-0 batch ids
    // would otherwise silently drop as replays — the last open path
    // of the r14 data-loss hole.
    val sinkNone = StreamIndexMaintainer.sink(spark, wh,
      (_, _) => Some(embOf(Seq.empty))) _
    val exNone = intercept[IllegalStateException] {
      sinkNone(docsOf(45L until 50L), 0L)
    }
    exNone.getMessage should include("UNIDENTIFIED")
    // The original stream continues normally after the refusals.
    sinkA(docsOf(45L until 50L), 2L)
    Warehouse.lastMergedBatch(wh) shouldBe 2L
  }

  test("the run() wiring records the checkpoint's real query id") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft-stream-ckid").toString
    graft.queries.RetrievalIndex.buildOf(spark, docsOf(0L until 20L), wh)
    val ck = java.nio.file.Files
      .createTempDirectory("graft-stream-ckid-ck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamIndexMaintainer.runRetrieval(spark, wh,
      input.toDF().toDF("doc_id", "source", "text"), ck)
    try {
      input.addData(docsOf(20L until 30L).as[(Long, String, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // The recorded identity is the checkpoint metadata's query id —
    // the identity that survives restarts and changes on recreation.
    StreamIndexMaintainer.checkpointQueryId(ck) shouldBe defined
    Warehouse.streamIdOf(wh) shouldBe StreamIndexMaintainer.checkpointQueryId(ck)
    Warehouse.streamIdOf(wh) shouldBe Some(q.id.toString)
  }
}
