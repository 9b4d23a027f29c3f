package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the hot per-row loops of the dedup /
  * similarity operators (SURVEY.md §7.3's "custom Expression beats
  * UDF" tier). Each is BIT-IDENTICAL to the higher-order-function
  * form it replaces (the HOF forms remain the executable spec in
  * `HashExprsSpec`), so every oracle stays green — the win is purely
  * mechanical:
  *  - one tight Java loop per row instead of a chain of lambda
  *    invocations with per-element boxing/closure dispatch;
  *  - md5 digested ONCE per token straight to a 60-bit long — no
  *    32-char hex string allocation, no `conv` string parse;
  *  - no intermediate arrays materialized between fold stages.
  *
  * Portability contract (what the DuckDB oracle reproduces):
  * `hash60(s)` == `conv(substring(md5(s), 1, 15), 16, 10)::long`
  * == DuckDB `('0x' || substr(md5(s), 1, 15))::BIGINT` — the first 15
  * hex digits of the md5 digest, i.e. big-endian bytes 0–7 shifted
  * right one nibble.
  */
object PortableHash {

  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits (15 hex digits) of md5 over the UTF-8 bytes. */
  def hash60(s: UTF8String): Long = {
    val d = localMd5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** The same contract as a declarative Column over a salted key —
    * THE single source of the formula every deterministic-sampling
    * query reproduces in its DuckDB oracle as
    * `('0x' || substr(md5('<salt>' || key::VARCHAR), 1, 15))::BIGINT`.
    * Any change here must change every oracle in lockstep. */
  def keyedHash60(key: org.apache.spark.sql.Column, salt: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")
  }
}

/** `graft_dot(a, b)`: sequential left-to-right dot product of two
  * double arrays — bit-identical to
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` (same element order,
  * same IEEE additions). NULL on length mismatch or a NULL element,
  * mirroring the zip_with null-padding contract. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.asInstanceOf[DataType] match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val i = ctx.freshName("dotI")
      val acc = ctx.freshName("dotAcc")
      s"""
      |int $n = $a.numElements();
      |if ($n != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  double $acc = 0.0;
      |  for (int $i = 0; $i < $n; $i++) {
      |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
      |    $acc += $a.getDouble($i) * $b.getDouble($i);
      |  }
      |  ${ev.value} = $acc;
      |}
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `graft_blockhash(payload)`: a 63-bit PERCEPTUAL block hash of an
  * opaque binary payload — the media-grain analogue of MinHash (r14
  * verdict #4): split the payload into 64 equal byte blocks (block i
  * covers [⌊i·n/64⌋, ⌊(i+1)·n/64⌋)), sum each block's unsigned bytes,
  * and set bit i (0 ≤ i < 63) iff sum(block i) > sum(block i+1) — the
  * dHash adjacent-comparison discipline over blocks instead of pixels.
  * Content perturbations move a few block sums → a few bits flip →
  * near-duplicate payloads land at small Hamming distance, which the
  * band-bucketed candidate join exploits exactly like SimHash (q31).
  * 63 bits keep the hash non-negative in a BIGINT, so both engines'
  * shift/mask band arithmetic agree without sign games. A real media
  * deployment swaps byte-block sums for decoded-pixel blocks
  * (`multimodal.Media.decodeStub` is the documented decode seam); the
  * bucketing, banding and purge chain downstream are unchanged.
  * Empty payload → 0; NULL payload → NULL. */
case class BlockHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_blockhash"

  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val sums = new Array[Long](64)
    var b = 0
    while (b < 64) {
      val from = (b.toLong * n / 64).toInt
      val to = ((b + 1).toLong * n / 64).toInt
      var s = 0L
      var i = from
      while (i < to) { s += (bytes(i) & 0xff); i += 1 }
      sums(b) = s
      b += 1
    }
    var h = 0L
    var i = 0
    while (i < 63) {
      if (sums(i) > sums(i + 1)) h |= 1L << i
      i += 1
    }
    h
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blockHashExpr", this, classOf[BlockHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlockHash =
    copy(child = newChild)
}

/** `graft_cell_argmax(v, centroids)`: the IVF cell assignment —
  * argmax over k centroids of the zero-norm-guarded cosine, ties to
  * the LARGER centroid id — as ONE plan node regardless of k (r14
  * verdict #2: the literal form inlines k `typedLit` vectors and k
  * cosine expression trees per row, a megabyte-scale plan at the
  * documented production k ≈ √n; this kernel carries the centroids as
  * a single foldable array literal, parsed once per executor).
  *
  * BIT-IDENTICAL to `Similarity.assignCellsWith`'s literal argmax
  * (`array_max(array(struct(cos, c_id)…))`) on WELL-FORMED input —
  * non-null elements, row dim equal to every centroid's dim: the row
  * norm is the same sequential Σx² fold `graft_dot(v, v)` runs, each
  * cosine divides the same sequential dot by nv·cnorm with the
  * caller-supplied (driver-folded) cnorm, a zero denominator yields
  * the −2.0 sentinel, and comparisons use java.lang.Double.compare —
  * so −0.0 < 0.0 ties resolve exactly like the struct max.
  * `centroids` must be a foldable `array<struct<c_id bigint, cnorm
  * double, cv array<double>>>` sorted by c_id ASCENDING (ties then
  * resolve to the later = larger id).
  *
  * On MALFORMED input the two forms DELIBERATELY diverge (ADVICE
  * r15): a NULL/null-element row vector or a length mismatch with any
  * centroid returns SQL NULL here (the graft_dot contract — a broken
  * vector has no honest cell), while the literal form's struct max
  * still resolves a cell through the c_id tie-break over NULL
  * cosines. NULL-on-malformed is the contract callers should want —
  * a corrupt embedding surfaces as an unassigned row instead of
  * silently landing in the largest-id cell — and CellArgmaxSpec pins
  * both behaviors so the divergence stays a decision, not a drift. */
case class CellArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(StructType(fs), _))
        if fs.length == 3 && fs(0).dataType == LongType &&
          fs(1).dataType == DoubleType &&
          fs(2).dataType.isInstanceOf[ArrayType] &&
          fs(2).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable centroid literal")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<double>, array<struct<bigint, double, " +
        s"array<double>>>), got ${l.simpleString} / ${r.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cell_argmax"

  /** The k literal vectors never appear in plan strings — a 1,000-
    * centroid payload would otherwise dump k·dim doubles into every
    * explain output and plan hash. */
  override def toString: String = s"graft_cell_argmax($left, <centroids>)"
  override def sql: String = s"graft_cell_argmax(${left.sql}, <centroids>)"

  @transient private lazy val cents: (Array[Long], Array[Double], Array[Array[Double]]) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val k = arr.numElements()
    val ids = new Array[Long](k)
    val norms = new Array[Double](k)
    val vecs = new Array[Array[Double]](k)
    var j = 0
    while (j < k) {
      val row = arr.getStruct(j, 3)
      ids(j) = row.getLong(0)
      norms(j) = row.getDouble(1)
      vecs(j) = row.getArray(2).toDoubleArray()
      require(j == 0 || ids(j) > ids(j - 1),
        s"$prettyName centroids must be sorted by c_id ascending")
      j += 1
    }
    (ids, norms, vecs)
  }

  /** Boxed Long so codegen's `ev.isNull` contract can surface a
    * broken input (null element / length mismatch) as SQL NULL. */
  def compute(v: ArrayData): java.lang.Long = {
    val (ids, norms, vecs) = cents
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      s += x * x
      i += 1
    }
    val nv = math.sqrt(s)
    var bestCos = Double.NegativeInfinity
    var bestId = Long.MinValue
    var j = 0
    while (j < ids.length) {
      val cv = vecs(j)
      if (cv.length != n) return null
      val denom = nv * norms(j)
      var cos = -2.0
      if (denom != 0.0) {
        var d = 0.0
        var i2 = 0
        while (i2 < n) { d += v.getDouble(i2) * cv(i2); i2 += 1 }
        cos = d / denom
      }
      // Ascending ids: >= 0 resolves equal cosines to the later
      // (larger) id — the struct-max tie rule. Double.compare keeps
      // the -0.0 < 0.0 total order the struct comparator uses.
      if (java.lang.Double.compare(cos, bestCos) >= 0) {
        bestCos = cos
        bestId = ids(j)
      }
      j += 1
    }
    if (ids.isEmpty) null else java.lang.Long.valueOf(bestId)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellArgmaxExpr", this, classOf[CellArgmax].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val boxed = ctx.freshName("cellBoxed")
      s"""
      |java.lang.Long $boxed = $ref.compute($a);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.longValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellArgmax =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash(v, planes)`: random-hyperplane bucket of a double
  * array — plane j's hyperplane component at index i is
  * (-1)^bit_j(i); bucket bit j is set iff the signed sum is >= 0.
  * Bit-identical to the single-pass struct-accumulator `aggregate`
  * fold it replaces (per-plane additions run in the same element
  * order). NULL on a NULL element. */
case class SimHashBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 16, s"planes must be in [1,16], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val sums = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      var j = 0
      while (j < planes) {
        if (((i >> j) & 1) == 0) sums(j) += x else sums(j) -= x
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < planes) {
      if (sums(j) >= 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("shN")
      val i = ctx.freshName("shI")
      val x = ctx.freshName("shX")
      val s = (0 until planes).map(j => ctx.freshName(s"shS$j"))
      val perPlane = (0 until planes).map { j =>
        s"${s(j)} += ((($i >> $j) & 1) == 0) ? $x : -$x;"
      }.mkString("\n")
      val bucket = (0 until planes).map { j =>
        s"if (${s(j)} >= 0) ${ev.value} += ${1L << j}L;"
      }.mkString("\n")
      s"""
      |int $n = $a.numElements();
      |${s.map(v => s"double $v = 0.0;").mkString("\n")}
      |${ev.value} = 0L;
      |for (int $i = 0; $i < $n; $i++) {
      |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
      |  double $x = $a.getDouble($i);
      |$perPlane
      |}
      |if (!${ev.isNull}) {
      |$bucket
      |}
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBucket =
    copy(child = newChild)
}

/** `graft_token_hashes(tokens, p)`: per-token portable 60-bit md5 hash,
  * reduced mod `p` when p > 0 — bit-identical to
  * `transform(tokens, t => conv(substring(md5(t),1,15),16,10)::long % p)`.
  * NULL tokens map to NULL elements (md5(NULL) is NULL). */
case class TokenHashes(child: Expression, p: Long)
    extends UnaryExpression {

  require(p >= 0, s"p must be >= 0, got $p")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_hashes"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = PortableHash.hash60(arr.getUTF8String(i))
        out(i) = if (p > 0) h % p else h
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenHashesExpr", this, classOf[TokenHashes].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** `graft_inter_size(a, b)`: |A ∩ B| — the number of DISTINCT common
  * elements of two long arrays, equal to `size(array_intersect(a, b))`
  * for ANY null-free inputs (ADVICE r14: the kernel is registered as a
  * public SQL function, so it must be exact for arbitrary arrays, not
  * just the distinct sets the dedup call sites pass — the build side
  * dedupes in its hash table and each matched slot counts once). It is
  * the Jaccard numerator of every dedup confirmation (q26/q113/q120).
  * Why native: `array_intersect` MATERIALIZES the intersection array
  * (per-row allocation of up to min(|A|,|B|) elements plus its
  * internal set) only for `size` to throw it away; at the increment's
  * 479k-candidate sf0.1 fixture that allocation is the hot path. This
  * kernel probes an open-addressed long table (smaller side builds,
  * larger side probes, no boxing, one count) — same count, none of
  * the garbage. NULL if either array contains a null element (the
  * set contract is broken; let the caller's null semantics surface
  * rather than guessing array_intersect's null-dedup rule). */
case class InterSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.asInstanceOf[DataType] match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_inter_size"

  private def scramble(v: Long): Int = {
    val x = v * 0x9E3779B97F4A7C15L
    (x ^ (x >>> 32)).toInt
  }

  /** Boxed Long so codegen's `ev.isNull` contract can surface a
    * broken-set (null element) input as SQL NULL. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val (s, bg) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val sn = s.numElements()
    val bn = bg.numElements()
    if (sn == 0) return java.lang.Long.valueOf(0L)
    var cap = 4
    while (cap < sn * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var i = 0
    while (i < sn) {
      if (s.isNullAt(i)) return null
      val v = s.getLong(i)
      var h = scramble(v) & mask
      while (used(h) && table(h) != v) h = (h + 1) & mask
      if (!used(h)) { used(h) = true; table(h) = v }
      i += 1
    }
    // A matched slot counts ONCE: duplicate probe-side elements must
    // not inflate the count past |distinct(A) ∩ distinct(B)| (the
    // build side already dedupes via the `!used` insert guard).
    val counted = new Array[Boolean](cap)
    var cnt = 0L
    var j = 0
    while (j < bn) {
      if (bg.isNullAt(j)) return null
      val v = bg.getLong(j)
      var h = scramble(v) & mask
      while (used(h) && table(h) != v) h = (h + 1) & mask
      if (used(h) && !counted(h)) { counted(h) = true; cnt += 1 }
      j += 1
    }
    java.lang.Long.valueOf(cnt)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("interSizeExpr", this, classOf[InterSize].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("interBoxed")
      s"""
      |java.lang.Long $boxed = $ref.compute($a, $b);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.longValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterSize =
    copy(left = newLeft, right = newRight)
}

/** `graft_fingerprint(tokens, p)`: order-sensitive rolling polynomial
  * fingerprint — fold((acc * 31 + h) % p) over per-token portable
  * hashes (h = hash60 % p), seeded with the first token's hash.
  * Bit-identical to the `aggregate(slice(hs,2,n-1), hs[1], …)` fold
  * (q39's original form). NULL for an empty array or a NULL token
  * (NULL is sticky through the fold). */
case class Fingerprint(child: Expression, p: Long)
    extends UnaryExpression {

  // Upper bound keeps the fold overflow-free: acc < p and h < p give
  // acc*31 + h < 32p, which must fit a signed long (a wrapped-negative
  // acc would trip the -1 NULL sentinel and diverge from the HOF
  // reference).
  require(p > 1 && p <= Long.MaxValue / 32,
    s"p must be in (1, ${Long.MaxValue / 32}], got $p")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  /** Returns -1 for NULL (the fold's range is [0, p) so -1 is free). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0 || arr.isNullAt(0)) return -1L
    var acc = PortableHash.hash60(arr.getUTF8String(0)) % p
    var i = 1
    while (i < n) {
      if (arr.isNullAt(i)) return -1L
      acc = (acc * 31 + PortableHash.hash60(arr.getUTF8String(i)) % p) % p
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val r = compute(input.asInstanceOf[ArrayData])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fingerprintExpr", this, classOf[Fingerprint].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = $ref.compute($a);
      |${ev.isNull} = ${ev.value} < 0L;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

/** `graft_extract_long(str, key)`: the long following the FIRST
  * occurrence of literal `key` that is immediately followed by an
  * ASCII digit — exactly `try_cast(regexp_extract(str, quote(key) +
  * "(\\d+)", 1) AS BIGINT)` (HashExprsSpec certifies the identity,
  * including later-occurrence fallthrough and overflow-to-NULL), as a
  * single literal scan instead of a regex engine pass. NULL when no
  * digit-followed occurrence exists or the digit run overflows a
  * signed long (the matched digits would fail the cast). */
case class ExtractLongAfter(child: Expression, key: String)
    extends UnaryExpression {

  require(key.nonEmpty, "key must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_extract_long"

  def compute(input: UTF8String): java.lang.Long = {
    val s = input.toString
    var from = 0
    while (true) {
      val idx = s.indexOf(key, from)
      if (idx < 0) return null
      var p = idx + key.length
      if (p < s.length && s.charAt(p) >= '0' && s.charAt(p) <= '9') {
        // First digit-followed occurrence: this IS the regex match;
        // parse its full digit run, overflow => NULL (cast failure).
        var acc = 0L
        while (p < s.length && s.charAt(p) >= '0' && s.charAt(p) <= '9') {
          val d = s.charAt(p) - '0'
          if (acc > (Long.MaxValue - d) / 10) return null
          acc = acc * 10 + d
          p += 1
        }
        return java.lang.Long.valueOf(acc)
      }
      // Literal without a following digit: the regex engine would keep
      // searching, so we do too.
      from = idx + 1
    }
    null // unreachable
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extractLongExpr", this, classOf[ExtractLongAfter].getName)
    val boxed = ctx.freshName("extracted")
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long $boxed = $ref.compute($c);
      |${ev.isNull} = $boxed == null;
      |if (!${ev.isNull}) ${ev.value} = $boxed.longValue();
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractLongAfter =
    copy(child = newChild)
}

/** `graft_tri_grams(words)`: distinct hashed word 3-grams — for each
  * window i, hash60 of the concat_ws(" ") of the three words, distinct
  * preserving first occurrence. Bit-identical to q26's
  * `array_distinct(transform(sequence(1, n-2), i => hash(concat_ws(
  * " ", w[i], w[i+1], w[i+2]))))` with the size-< 3 guard folded in
  * (empty array, matching the `when`'s otherwise branch). concat_ws
  * skips NULL words, which the byte-level join mirrors. */
case class HashedTriGrams(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tri_grams"

  private val space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n - 2) {
      // concat_ws(" ", w, w, w): NULL args are skipped, not joined.
      val parts = Seq(i, i + 1, i + 2)
        .filterNot(arr.isNullAt)
        .map(arr.getUTF8String)
      val gram = UTF8String.concatWs(space, parts: _*)
      seen.add(PortableHash.hash60(gram))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("triGramsExpr", this, classOf[HashedTriGrams].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedTriGrams =
    copy(child = newChild)
}

/** `graft_ngrams(words, n)`: distinct hashed word n-grams — the
  * generalization of `graft_tri_grams` the curation operators need
  * (q64 uses n=3, q66 decontamination n=5). Same contract: for each
  * window i, hash60 of `concat_ws(" ", w[i..i+n-1])` (NULL words
  * skipped, not joined), distinct preserving first occurrence, empty
  * array when fewer than n words. Exists because the declarative form
  * — `transform(sequence(...), i -> hash(concat_ws(..., element_at(w,
  * i), ...)))` — re-evaluates `w`'s defining expression per ELEMENT
  * (lambdas block subexpression elimination), turning an upstream
  * `split(text)` into O(words²) work per document; the kernel
  * evaluates its child once. */
case class NGramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ngrams"

  private val space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    // Fetch each word once and slide a reused n-slot buffer over the
    // prefetch — no Range/Seq/varargs allocation per window.
    // `concatWs` skips null inputs, matching the previous explicit
    // null filter bit-for-bit.
    val words = new Array[UTF8String](len)
    var k = 0
    while (k < len) {
      words(k) = if (arr.isNullAt(k)) null else arr.getUTF8String(k)
      k += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      System.arraycopy(words, i, buf, 0, n)
      seen.add(PortableHash.hash60(UTF8String.concatWs(space, buf: _*)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nGramsExpr", this, classOf[NGramHashes].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
}

/** `graft_try_long(s)`: exception-free `try_cast(s AS BIGINT)`.
  *
  * Spark's ANSI-mode TRY cast parses via `UTF8String.toLongExact`,
  * which is literally `toLong(wrapper, allowDecimal = false)` plus a
  * **thrown `NumberFormatException`** on failure (spark-unsafe
  * 4.1.2 bytecode, verified). On a corpus where most rows are NOT
  * numeric — the whole point of a best-effort re-type pass — that is
  * one constructed Java exception per row, and it dominates the scan:
  * measured at sf0.1 on `events.props` (all-JSON, zero parses),
  * `try_cast(props AS BIGINT)` alone costs 0.92 s vs 0.15 s for the
  * scan itself. At 100 TB that is the difference between a re-type
  * pass and a re-type outage.
  *
  * This kernel calls the public non-throwing `toLong(LongWrapper)`
  * (`allowDecimal = true`) and post-rejects strings containing `'.'`:
  *  - on '.'-free strings the two modes run the identical parse, so
  *    values and accept/reject agree bit-for-bit with `try_cast`;
  *  - any string containing '.' is NULL under `try_cast` (decimal
  *    mode off ⇒ '.' is an invalid char), and we return NULL.
  * Hence exact `try_cast(s AS BIGINT)` semantics with zero exception
  * construction on any input. Parity is property-tested against the
  * built-in `try_cast` in `HashPropertiesSpec` (adversarial +
  * randomized corpora: signs, whitespace, overflow boundaries,
  * decimals, exponents, JSON blobs).
  */
case class TryLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_try_long"

  def compute(input: UTF8String): java.lang.Long = {
    val w = new UTF8String.LongWrapper
    if (input.toLong(w) && !input.contains(TryLong.dot)) {
      java.lang.Long.valueOf(w.value)
    } else null
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tryLongExpr", this, classOf[TryLong].getName)
    val boxed = ctx.freshName("parsed")
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long $boxed = $ref.compute($c);
      |${ev.isNull} = $boxed == null;
      |if (!${ev.isNull}) ${ev.value} = $boxed.longValue();
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TryLong =
    copy(child = newChild)
}

object TryLong {
  private val dot = UTF8String.fromString(".")
}

/** `graft_subwords(text, vocab_csv)`: total greedy longest-match
  * subword count of a space-tokenized document over a pinned literal
  * vocabulary (q104's BPE-inference stand-in) — one linear scan of
  * the string with O(1) hash-set piece lookups, replacing the HOF
  * loop that materialized a step-counter array per word and compared
  * against the vocab as a literal `isin` chain.
  *
  * Semantics (BIT-IDENTICAL to the HOF form, which remains the
  * executable spec in RecallSubwordSpec): words are maximal runs of
  * non-space chars; at each in-word position match the longest vocab
  * piece (4 → 3 → 2 chars), else consume 1 unknown char; each match
  * or unknown counts one token. Window equality can never cross a
  * space because pieces are space-free (enforced at construction), so
  * scanning the whole text while skipping spaces reproduces per-word
  * greedy matching exactly. Case mapping stays OUTSIDE the kernel
  * (callers pass `lower(text)`) so Spark's own collation semantics
  * apply.
  *
  * `vocab_csv` is a plan-time string literal (comma-joined pieces,
  * lengths 2–4) — same parameter discipline as `graft_extract_long`'s
  * key. */
case class SubwordCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "vocab must be non-empty")
  require(vocab.forall(v => v.length >= 2 && v.length <= 4),
    "vocab pieces must be 2-4 chars")
  require(vocab.forall(!_.contains(' ')),
    "vocab pieces must be space-free (word-boundary equivalence)")
  require(vocab.forall(_.forall(c => !Character.isSurrogate(c))),
    "vocab pieces must be BMP-only (unit-window/code-point-window equivalence)")

  @transient private lazy val byLen: Array[java.util.HashSet[String]] = {
    val a = Array.fill(5)(new java.util.HashSet[String]())
    vocab.foreach(v => a(v.length).add(v))
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_subwords"

  def compute(input: UTF8String): Long = {
    val s = input.toString
    val n = s.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        // Piece windows are compared by UTF-16 units, which agrees
        // with the code-point HOF/oracle semantics because pieces are
        // BMP-only (enforced at construction): a window whose units
        // aren't all BMP can't equal a piece either way. The UNKNOWN
        // step however must consume one CODE POINT — charAt-stepping
        // would count a surrogate pair as two unknown tokens where
        // Spark's substr/length (code-point based) count one.
        var step = 0
        if (i + 4 <= n && byLen(4).contains(s.substring(i, i + 4))) step = 4
        else if (i + 3 <= n && byLen(3).contains(s.substring(i, i + 3))) step = 3
        else if (i + 2 <= n && byLen(2).contains(s.substring(i, i + 2))) step = 2
        else step = Character.charCount(s.codePointAt(i))
        cnt += 1
        i += step
      }
    }
    cnt
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordExpr", this, classOf[SubwordCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

/** Shared int8 quantization arithmetic of the stored dense index's
  * code column (`cells_q8`, r15 verdict #2): max-abs scaling,
  * qᵢ = round(xᵢ·127/scale) ∈ [−127, 127] — the q101 rule — rounded
  * HALF AWAY FROM ZERO (C `round`, DuckDB `round`, and Spark's
  * `round()` on doubles agree; see the q101 portability note). The
  * scale itself is NOT stored: cosine is scale-invariant (the q103
  * argument), so ranking needs only the integer codes, and exact
  * re-scoring reads the full-precision vector anyway. Exposed as
  * static methods so the driver-side request path packs query vectors
  * with the EXACT arithmetic the build kernel ran. */
object I8Quant {

  private def roundHalfAway(x: Double): Double =
    if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)

  /** Pack a double vector into its int8 code bytes (zero vector →
    * all-zero code). */
  def pack(v: Array[Double]): Array[Byte] = {
    var scale = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i))
      if (a > scale) scale = a
      i += 1
    }
    val out = new Array[Byte](v.length)
    if (scale != 0.0) {
      i = 0
      while (i < v.length) {
        out(i) = roundHalfAway(v(i) * 127.0 / scale).toByte
        i += 1
      }
    }
    out
  }

  /** Exact integer dot of two signed-byte codes (|Σ| ≤ dim·127² —
    * never near Long overflow at any real dim). */
  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }
}

/** `graft_i8_pack(v)`: the int8 code column of the quantized dense
  * index — [[I8Quant.pack]] as one codegen'd plan node (map-only,
  * 8 bytes of input per output byte). NULL for a NULL vector or a
  * vector with NULL elements (a corrupt embedding has no honest
  * code — the graft_cell_argmax discipline). */
case class I8Pack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_i8_pack"

  def compute(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val d = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      d(i) = v.getDouble(i)
      i += 1
    }
    I8Quant.pack(d)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("i8PackExpr", this, classOf[I8Pack].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("i8code")
      s"""
      |byte[] $out = $ref.compute($a);
      |if ($out == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $out; }
      |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): I8Pack =
    copy(child = newChild)
}

/** `graft_i8_dot(a, b)`: exact integer dot product of two int8 code
  * blobs ([[I8Quant.dot]]) — the quantized prefilter's scoring
  * kernel. NULL on a length mismatch (codes from different index
  * generations must not silently score). */
case class I8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, binary), got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_i8_dot"

  def compute(a: Array[Byte], b: Array[Byte]): java.lang.Long =
    if (a.length != b.length) null
    else java.lang.Long.valueOf(I8Quant.dot(a, b))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("i8DotExpr", this, classOf[I8Dot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("i8dot")
      s"""
      |java.lang.Long $boxed = $ref.compute($a, $b);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.longValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): I8Dot = copy(left = newLeft, right = newRight)
}

/** Product-quantization statics — the driver-side arithmetic of the
  * PQ dense-index tier (`pq_books` / `cells_pq`), exposed so the
  * request path builds its ADC lookup tables with the EXACT fold the
  * certificates pin (the [[I8Quant]] discipline: one arithmetic, both
  * sides of the serve).
  *
  * Layout contract (shared by every consumer): a codebook with `m`
  * subspaces of `ksub` entries flattens to index `sub * ksub + c`;
  * a code blob stores one unsigned byte per subspace, `code(j)` the
  * chosen entry of subspace `j`; an ADC table flattens the same way,
  * `lut(j * ksub + c)` = dot(book(j)(c), querySubvector(j)). */
object PqOps {

  /** Per-request ADC lookup table: `books` flattened `sub*ksub + c`,
    * each entry a `dsub`-dim codebook vector; `q` the full query
    * vector (`m * dsub` doubles). Every dot is the sequential
    * left-to-right fold (index ascending) — the portability contract
    * with DuckDB's `list_inner_product`. */
  def lut(books: Array[Array[Double]], ksub: Int,
      q: Array[Double]): Array[Double] = {
    val m = books.length / ksub
    val dsub = q.length / m
    val out = new Array[Double](books.length)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val bv = books(j * ksub + c)
        var s = 0.0
        var i = 0
        while (i < dsub) { s += bv(i) * q(j * dsub + i); i += 1 }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    out
  }

  /** Asymmetric-distance dot: Σ_j lut(j*ksub + code(j)), j ascending
    * (the deterministic addition order the oracle mirrors with an
    * explicit left-to-right sum). Null when the table does not tile
    * the code (`lut.length % code.length != 0`) or a code byte
    * indexes past it — codes and tables from different index
    * generations must not silently score (the [[I8Dot]] contract). */
  def adc(code: Array[Byte], lutArr: Array[Double]): java.lang.Double = {
    if (code.length == 0 || lutArr.length % code.length != 0) return null
    val ksub = lutArr.length / code.length
    var s = 0.0
    var j = 0
    while (j < code.length) {
      val c = code(j) & 0xff
      if (c >= ksub) return null
      s += lutArr(j * ksub + c)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Pack per-subspace entry indices into the one-byte-per-subspace
    * code blob; null on an index outside [0, 255] (not an honest
    * unsigned byte). */
  def pack(codes: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](codes.length)
    var i = 0
    while (i < codes.length) {
      val c = codes(i)
      if (c < 0 || c > 255) return null
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** Unpack a code blob back to entry indices (unsigned). */
  def codes(b: Array[Byte]): Array[Int] = {
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i) & 0xff; i += 1 }
    out
  }
}

/** `graft_pq_pack(codes)`: per-subspace entry indices → the PQ code
  * blob (one unsigned byte per subspace) — the storage step of the
  * `cells_pq` tier. NULL for a NULL array, NULL elements, or an index
  * outside [0, 255] (a malformed assignment has no honest code). */
case class PqPack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<int> or array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_pack"

  private lazy val fromLong = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  def compute(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val c = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (fromLong) v.getLong(i) else v.getInt(i).toLong
      if (x < 0L || x > 255L) return null
      c(i) = x.toInt
      i += 1
    }
    PqOps.pack(c)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqPackExpr", this, classOf[PqPack].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("pqcode")
      s"""
      |byte[] $out = $ref.compute($a);
      |if ($out == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $out; }
      |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqPack =
    copy(child = newChild)
}

/** `graft_pq_codes(code)`: the PQ code blob unpacked to its unsigned
  * per-subspace entry indices — the audit-side inverse of
  * [[PqPack]] (certificates group members per (sub, entry)). */
case class PqCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_codes"

  def compute(b: Array[Byte]): ArrayData =
    new GenericArrayData(PqOps.codes(b))

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodesExpr", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** `graft_pq_adc(code, lut)`: the PQ prefilter's scoring kernel —
  * [[PqOps.adc]] as one codegen'd plan node: m table lookups and m
  * adds per candidate instead of a dim-wide multiply-accumulate (the
  * bandwidth story of the PQ tier: the scan reads m code bytes per
  * vector, not the vector). NULL when the table does not tile the
  * code or a code byte indexes past it. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, array<double>), got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  /** Reads ONLY the m addressed table entries straight off the
    * ArrayData (no per-row copy of the whole table — the kernel's
    * point is m loads per candidate); a NULL at an ADDRESSED position
    * surfaces as NULL. Same j-ascending addition order as
    * [[PqOps.adc]] (PqTierSpec pins agreement). */
  def compute(code: Array[Byte], lut: ArrayData): java.lang.Double = {
    val n = lut.numElements()
    if (code.length == 0 || n % code.length != 0) return null
    val ksub = n / code.length
    var s = 0.0
    var j = 0
    while (j < code.length) {
      val c = code(j) & 0xff
      if (c >= ksub) return null
      val idx = j * ksub + c
      if (lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcExpr", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("pqadc")
      s"""
      |java.lang.Double $boxed = $ref.compute($a, $b);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.doubleValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}
