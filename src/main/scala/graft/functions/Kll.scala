package graft.functions

import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
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
    * O(rows) updates, O(partitions) output rows, zero shuffle. NULLs
    * are skipped here; NaNs are ignored by the DataSketches library
    * itself — so a sketch's n counts non-null, non-NaN values, and
    * rank certifications must use the same denominator (q81/q82/q83
    * do). */
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

/** `graft_kll_agg(value)` — build a KLL doubles sketch as a GROUPED
  * aggregate (q82, sketch-columned serving metrics). This is the
  * integration `hll_sketch_agg`/`theta_sketch_agg` use for Spark's
  * own sketches: a `TypedImperativeAggregate` keeps the LIVE sketch
  * object as its buffer — per-row `update` touches the heap sketch
  * directly, and serialization happens only at partial/final shuffle
  * boundaries (or state-store commits on a stream). That makes
  * grouped builds O(rows) updates + O(groups × partitions) blob
  * merges, where the byte-buffer `Aggregator` shape (`Kll.union` —
  * correct for merging pre-built blobs) would deserialize per ROW if
  * used as a builder. `Kll.partitionSketches` remains for the
  * ungrouped whole-column build, where mapPartitions avoids even the
  * grouping machinery.
  *
  * Output/state bytes are the same serialized form `Kll.union` and
  * `graft_kll_quantile` consume, so grouped builds, partition builds,
  * and stored sketch columns all compose. */
case class KllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a double column (cast numerics explicitly), " +
        s"got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(Kll.K)

  /** NULLs are skipped, matching `Kll.partitionSketches`; NaNs pass
    * through but the DataSketches library ignores them — sketch n
    * counts non-null, non-NaN values only (the q81/q82/q83
    * denominator contract). */
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
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
