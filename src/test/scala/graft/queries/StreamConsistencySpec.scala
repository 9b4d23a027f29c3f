package graft.queries

import org.apache.spark.sql.DataFrame

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.streaming.StreamIndexMaintainer

/** Cross-store stream consistency (q159, r15 verdict #7): the oracle
  * pins the green path; this spec drives what it can't — every
  * divergence refusal, and the crash-between-commits window healing
  * through the real redelivery protocol.
  */
class StreamConsistencySpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def docsOf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, "src", s"pair stream doc d$i")).toDF(
      "doc_id", "source", "text")

  private def embOf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, Seq.fill(4)((i % 7).toFloat / 7f), "x"))
      .toDF("vec_id", "embedding", "label")

  /** A fresh standing warehouse+retrieval pair over docs 0–29 /
    * vectors 0–9. */
  private def freshPair(): (String, String) = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-pairspec-wh").toString
    val retr = java.nio.file.Files
      .createTempDirectory("graft-pairspec-retr").toString
    Warehouse.buildOf(spark, docsOf(0L until 30L), embOf(0L until 10L), wh)
    RetrievalIndex.buildOf(spark, docsOf(0L until 30L), retr)
    (wh, retr)
  }

  private def dual(wh: String, retr: String, id: String = "stream-A") =
    StreamIndexMaintainer.dualSink(spark, wh, retr,
      (_, _) => Some(embOf(Seq.empty)), () => Some(id)) _

  test("a crash between the pair's commits refuses, then heals on redelivery") {
    val (wh, retr) = freshPair()
    val sink = dual(wh, retr)
    sink(docsOf(30L until 40L), 0L)
    assert(StreamConsistency.audit(spark, wh, retr).count() == 2L)
    // Crash window: batch 1 reaches the warehouse, the process dies
    // before the retrieval commit — exactly dualSink's non-atomic gap.
    StreamIndexMaintainer.sink(spark, wh,
      (_, _) => Some(embOf(Seq.empty)), () => Some("stream-A"))(
      docsOf(40L until 45L), 1L)
    val ex = intercept[IllegalStateException] {
      StreamConsistency.audit(spark, wh, retr)
    }
    assert(ex.getMessage.contains("cross-store divergence"))
    assert(ex.getMessage.contains("batch 1"))
    // Restart: the checkpoint re-delivers batch 1 to BOTH stores —
    // the warehouse no-ops it (certified replay), retrieval applies.
    sink(docsOf(40L until 45L), 1L)
    val rows = StreamConsistency.audit(spark, wh, retr).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 1L))
    assert(rows.forall(_.getBoolean(3)))
  }

  test("identity divergence between the stores refuses") {
    val (wh, retr) = freshPair()
    // Same batch sequence, two different maintainers — a recreated
    // checkpoint on one side, or two pipelines pointed at one pair.
    StreamIndexMaintainer.sink(spark, wh,
      (_, _) => Some(embOf(Seq.empty)), () => Some("stream-A"))(
      docsOf(30L until 35L), 0L)
    StreamIndexMaintainer.retrievalSink(spark, retr,
      () => Some("stream-B"))(docsOf(30L until 35L), 0L)
    val ex = intercept[IllegalStateException] {
      StreamConsistency.audit(spark, wh, retr)
    }
    assert(ex.getMessage.contains("different streams"))
  }

  test("identified-vs-unidentified refuses; both-unidentified equal marks passes") {
    val (wh, retr) = freshPair()
    StreamIndexMaintainer.sink(spark, wh,
      (_, _) => Some(embOf(Seq.empty)), () => Some("stream-A"))(
      docsOf(30L until 35L), 0L)
    StreamIndexMaintainer.retrievalSink(spark, retr)(docsOf(30L until 35L), 0L)
    intercept[IllegalStateException] {
      StreamConsistency.audit(spark, wh, retr)
    }
    // Both unidentified (direct sink pipelines): mark equality decides.
    val (wh2, retr2) = freshPair()
    StreamIndexMaintainer.sink(spark, wh2,
      (_, _) => Some(embOf(Seq.empty)))(docsOf(30L until 35L), 0L)
    StreamIndexMaintainer.retrievalSink(spark, retr2)(docsOf(30L until 35L), 0L)
    val rows = StreamConsistency.audit(spark, wh2, retr2).collect()
    assert(rows.forall(r => !r.getBoolean(2) && r.getBoolean(3)))
  }

  test("never-streamed stores are not certifiable") {
    val (wh, retr) = freshPair()
    intercept[IllegalArgumentException] {
      StreamConsistency.audit(spark, wh, retr)
    }
  }
}
