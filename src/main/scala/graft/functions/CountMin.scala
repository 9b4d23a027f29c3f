package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min frequency sketches as MERGEABLE state — the second
  * member of the engine's sketch family (HLL distinct counts are
  * q63). The 100 TB contract is the same: sketches built
  * independently per slice (per partition / per day / per source) of
  * a partitioned store union into the global sketch WITHOUT
  * rescanning the slices, because count-min counters add exactly —
  * `union(cm(A), cm(B)) == cm(A ∪ B)` bit-for-bit when the sketches
  * share (depth, width, seed). Builds ride Spark's own
  * `count_min_sketch(col, eps, conf, seed)` aggregate (codegen'd,
  * map-side combined); only the union and the point lookup are graft
  * kernels, because Spark exposes neither in SQL.
  */
object CountMin {

  private def read(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(b))

  private def write(sk: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    sk.writeTo(bos)
    bos.toByteArray
  }

  /** Union aggregator over serialized sketches (empty bytes = zero).
    * The buffer stays serialized — merges deserialize, add counters,
    * reserialize. That is O(sketch) per merged ROW, which is the
    * wrong trade for millions of inputs but exactly right here: the
    * inputs are per-SLICE sketches (one per source/partition — tens,
    * not millions), while keeping the buffer a plain byte array gives
    * Spark a kryo-free, schema-stable aggregation buffer. */
  private val unionAgg: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      override def zero: Array[Byte] = Array.emptyByteArray
      private def merge2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          val sk = read(a)
          // Name the contract on violation: a bare
          // IncompatibleMergeException would surface as an opaque
          // executor-side stack with no hint WHICH inputs disagreed
          // on what.
          try sk.mergeInPlace(read(b))
          catch {
            case e: org.apache.spark.util.sketch.IncompatibleMergeException =>
              throw new IllegalArgumentException(
                "CountMin.union requires every input sketch to share " +
                  "(depth, width, seed) — build all slices with the same " +
                  "count_min_sketch(col, eps, confidence, seed) parameters",
                e)
          }
          write(sk)
        }
      override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
        merge2(buf, in)
      override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
        merge2(b1, b2)
      override def finish(r: Array[Byte]): Array[Byte] = r
      override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `union(sketchCol)` — aggregate serialized count-min sketches
    * into their exact counter-sum. All inputs must share
    * (eps, confidence, seed). */
  def union(c: Column): Column =
    org.apache.spark.sql.functions.udaf(unionAgg).apply(c)
}

/** `graft_cm_estimate(sketch, item)`: point frequency lookup in a
  * serialized count-min sketch — min over the depth hash rows, the
  * standard estimate, with the two guarantees q79 certifies:
  * never BELOW the true count, and above it by at most eps·N with
  * the sketch's confidence. Items are hashed from their UTF-8
  * bytes, matching how Spark's `count_min_sketch` aggregate inserts
  * string columns, so build and lookup agree byte-for-byte.
  *
  * Deserializes the sketch PER ROW, so this is for certification /
  * reporting frames (a top-k of heavy hitters crossed with the 1-row
  * sketch), not for scoring a corpus — there, join the exact counts
  * instead. Evaluated via a bound reference call (same pattern as
  * TokenHashes): one virtual call per row is irrelevant at top-k
  * cardinality. */
case class CmEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary sketch, string item), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cm_estimate"

  def estimate(sketch: Array[Byte], item: UTF8String): Any =
    // Zero-length blob = the union aggregator's zero (no input rows);
    // NULL estimate rather than a deserialization crash.
    if (sketch.isEmpty) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(sketch))
      .estimateCount(item.getBytes)

  override def nullSafeEval(sk: Any, item: Any): Any =
    estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmEstimateExpr", this, classOf[CmEstimate].getName)
    nullSafeCodeGen(ctx, ev, (sk, item) => {
      val res = ctx.freshName("cmRes")
      s"""
      |Object $res = $ref.estimate($sk, $item);
      |if ($res == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((Long) $res).longValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}
