package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as an engine kernel — the scale path for
  * set-membership checks against a SMALL reference set (benchmark
  * eval grams in q94's decontamination, blocklists, seen-ID replay
  * guards): build the filter once over the reference side with
  * Spark's distributed `DataFrameStatFunctions.bloomFilter`
  * (a treeAggregate — no collect of the set itself), then probe it
  * map-side from every corpus row with zero shuffle and zero join.
  * The exact gram join (q66) stays the correctness form; the bloom
  * form trades a bounded, one-sided error for removing the join
  * entirely: NO false negatives ever (a contained element always
  * probes true), false positives at the configured fpp.
  *
  * The library bit layout (`org.apache.spark.util.sketch`, Murmur3
  * with fixed seed) is deterministic in the inserted values and
  * (n, fpp) sizing, so probe results are rerun-stable — q94 certifies
  * the one-sided-error contract as oracle booleans rather than
  * hashing raw probe outputs.
  */
object Bloom {

  /** Serialized filter over a LongType column, built distributed.
    * `expectedItems` sizes the bit array; passing the true distinct
    * count keeps the realized fpp at or below the requested one. */
  def buildLong(df: DataFrame, colName: String,
                expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(colName, math.max(expectedItems, 64L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

/** `graft_bloom_contains(bits, v)` — probe a serialized
  * `org.apache.spark.util.sketch.BloomFilter` for a long value.
  *
  * `bits` must be FOLDABLE (a literal produced by `Bloom.buildLong`):
  * the filter is deserialized ONCE per expression instance into a
  * transient lazy field and referenced from generated code via
  * `addReferenceObj`, so the per-row work is just the Murmur3 probe —
  * no per-row deserialization, no UDF dispatch. At cluster scale the
  * literal travels with the serialized plan (KBs–MBs once per task
  * set); a driver-side `broadcast` of the bytes feeding this same
  * expression is the >100 MB variant, not needed at the benchmark-set
  * sizes this kernel exists for. */
case class BloomContains(bits: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = bits
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bits.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable binary first argument (the serialized filter)")
    else if (bits.dataType != BinaryType || value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, bigint), got " +
          s"${bits.dataType.simpleString} / ${value.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_contains"

  /** Deserialized once per expression instance (per task after plan
    * ship), never per row. NULL bits ⇒ null filter ⇒ identically-NULL
    * probe via the null-propagating paths below. */
  @transient private lazy val filter: BloomFilter = {
    val b = bits.eval(null).asInstanceOf[Array[Byte]]
    if (b == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(b))
  }

  override def nullSafeEval(bs: Any, v: Any): Any =
    if (filter == null) null
    else filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (filter == null) {
      // bits is a NULL literal: the probe is identically NULL.
      nullSafeCodeGen(ctx, ev, (_, _) => s"${ev.isNull} = true;")
    } else {
      val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
      // The bits child is a foldable literal — its "evaluation" in the
      // generated code is a constant object reference, so the per-row
      // cost is exactly one Murmur3 probe.
      nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContainLong($v);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(bits = newLeft, value = newRight)
}
