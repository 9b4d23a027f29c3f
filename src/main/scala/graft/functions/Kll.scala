package graft.functions

import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}

/** KLL quantile sketches as mergeable state — the third member of the
  * engine's sketch family, completing the trinity a 100 TB telemetry
  * rollup needs: DISTINCT counts (HLL q63 / theta q80), FREQUENCIES
  * (count-min q79), and now QUANTILES. Exact percentiles (q51) need a
  * full sort or a per-group collect of the column; KLL sketches built
  * per slice are a few KB each, union losslessly with respect to their
  * rank-error contract, and answer any quantile after the fact — the
  * only way percentile dashboards stay O(slices) instead of O(rows)
  * on a partitioned store.
  *
  * Spark exposes no KLL functions, so all three pieces are graft
  * kernels over the DataSketches library Spark itself bundles:
  * per-partition build (mapPartitions — the canonical sketch
  * integration: one sketch object per partition, no per-row
  * serialization), byte-level union aggregator (same shape as
  * `CountMin.union`), and a point quantile-lookup expression. */
object Kll {

  /** Sketch accuracy parameter: k=200 ⇒ ±~1.65% normalized rank
    * error at 99% confidence, ~3 KB serialized. */
  val K = 200

  /** The sketch's own two-sided normalized rank-error bound (single
    * quantile, not PMF) — what q81 certifies estimates against. */
  def rankError: Double = KllSketch.getNormalizedRankError(K, false)

  private def read(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  /** One serialized sketch per partition of `values`. Builds update a
    * heap sketch in place per partition and emit a single ~3 KB blob —
    * O(rows) updates, O(partitions) output rows, zero shuffle. */
  def partitionSketches(values: Dataset[java.lang.Double]): Dataset[Array[Byte]] =
    values.mapPartitions { it =>
      val sk = KllDoublesSketch.newHeapInstance(K)
      it.foreach(v => if (v != null) sk.update(v.doubleValue()))
      Iterator.single(sk.toByteArray)
    }(Encoders.BINARY)

  private val unionAgg: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      override def zero: Array[Byte] = Array.emptyByteArray
      private def merge2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          val sk = read(a)
          sk.merge(read(b))
          sk.toByteArray
        }
      override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
        merge2(buf, in)
      override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
        merge2(b1, b2)
      override def finish(r: Array[Byte]): Array[Byte] = r
      override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `union(sketchCol)` — aggregate serialized KLL sketches into one.
    * O(sketch) per merged row; inputs are per-PARTITION sketches
    * (hundreds, not millions), same trade as `CountMin.union`. */
  def union(c: Column): Column =
    org.apache.spark.sql.functions.udaf(unionAgg).apply(c)
}

/** `graft_kll_quantile(sketch, rank)`: the value at normalized rank
  * `rank` (a double literal in (0,1), INCLUSIVE search — the value's
  * rank counts items <= it, matching a `value <= est` certification
  * filter). NULL for an empty sketch. Per-row deserialization, so for
  * 1-row reporting frames like the other sketch lookups. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right) match {
      case (BinaryType, Literal(r: Double, DoubleType)) if r > 0 && r < 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary sketch, double literal rank in (0,1)), " +
          s"got ${l.simpleString} / $r")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"

  def quantile(sketch: Array[Byte], rank: Double): Any = {
    // A zero-length blob is the union aggregator's zero (no input
    // rows at all) — an empty SKETCH serializes to >= 8 bytes, so
    // both cases mean "no data": NULL, not a heapify crash.
    if (sketch.isEmpty) return null
    val sk = KllDoublesSketch.heapify(Memory.wrap(sketch))
    if (sk.isEmpty) null
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }

  override def nullSafeEval(sk: Any, rank: Any): Any =
    quantile(sk.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllQuantileExpr", this, classOf[KllQuantile].getName)
    nullSafeCodeGen(ctx, ev, (sk, rank) => {
      val res = ctx.freshName("kllRes")
      s"""
      |Object $res = $ref.quantile($sk, $rank);
      |if ($res == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((Double) $res).doubleValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
