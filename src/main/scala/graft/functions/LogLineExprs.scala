package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass extractors for the raw-log line's hot fields
  * (r20 optimization round, guide §1.2 step 2 / §4.1 "per-task work"):
  * the q61 production pipeline at the 1.6 GiB tier spends 145 of its
  * 183 task-seconds in the parse projection, and its physical plan
  * evaluates the unanchored `(blk_[\-0-9]+)` regex TWICE per line —
  * once in the pushed-down `withBlock` filter and again in the
  * projection (filter pushdown through a projection substitutes the
  * expression; the guide's §4.4 duplication, regex edition).
  *
  * These expressions replace the java.util.regex machinery with exact
  * byte-level scans (the three patterns are ASCII-only, so byte
  * comparison is UTF-8-safe: multibyte continuation bytes never equal
  * ASCII values):
  *
  *  - `graft_log_ts_raw(line)`  ≡ `regexp_extract(line, '^(\d{6}\s+\d{6})', 1)`
  *  - `graft_log_block_id(line)` ≡ `regexp_extract(line, '(blk_[\-0-9]+)', 1)`
  *  - `graft_log_rest(line)`    ≡ `regexp_replace(line, '^\d{6}\s+\d{6}\s+', '')`
  *
  * Exactness contract (pinned by LogLineKernelSpec property tests
  * against the regexp forms, both codegen and interpreted paths):
  * `\d`/`\s` are Java's ASCII classes ([0-9], [ \t\n\x0B\f\r] — no
  * UNICODE flag in regexp_extract), `find()` scans start positions
  * left-to-right, greedy runs never backtrack here because the digit
  * and whitespace classes are disjoint, regexp_extract returns ''
  * (not NULL) on non-match, and the anchored replace can fire at most
  * once. The ORACLE side is untouched: DuckDB keeps re-deriving the
  * same fields with its own regexes, so q61/q62/q189 hash equality
  * certifies the kernels end to end.
  */
final class LogLineScan extends Serializable {

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  // Java regex \s without UNICODE_CHARACTER_CLASS = [ \t\n\x0B\f\r].
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09 && b <= 0x0D)
  @inline private def isBody(b: Byte): Boolean =
    b == '-'.toByte || isDigit(b)

  /** Byte length of the anchored `^\d{6}\s+\d{6}` prefix (= the group
    * 1 span of tsRe), or -1 when it does not match. No backtracking
    * cases exist: digits and whitespace are disjoint classes. */
  private def tsPrefixEnd(b: Array[Byte]): Int = {
    val n = b.length
    if (n < 13) return -1
    var i = 0
    while (i < 6) { if (!isDigit(b(i))) return -1; i += 1 }
    var j = 6
    while (j < n && isWs(b(j))) j += 1
    if (j == 6 || n - j < 6) return -1
    var k = 0
    while (k < 6) { if (!isDigit(b(j + k))) return -1; k += 1 }
    j + 6
  }

  /** ≡ regexp_extract(line, "^(\d{6}\s+\d{6})", 1): the matched
    * prefix, or "" when the anchored pattern fails. */
  def tsRaw(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val e = tsPrefixEnd(b)
    if (e < 0) UTF8String.EMPTY_UTF8 else UTF8String.fromBytes(b, 0, e)
  }

  /** ≡ regexp_replace(line, "^\d{6}\s+\d{6}\s+", ""): the line with
    * the timestamp prefix AND its trailing whitespace run stripped;
    * unchanged when the pattern (including the trailing `\s+`) does
    * not match. Anchored, so at most one replacement. */
  def restAfterTs(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val e = tsPrefixEnd(b)
    if (e < 0) return s
    var j = e
    while (j < b.length && isWs(b(j))) j += 1
    if (j == e) s else UTF8String.fromBytes(b, j, b.length - j)
  }

  /** ≡ regexp_extract(line, "(blk_[\-0-9]+)", 1): the FIRST (leftmost
    * start, then greedy) occurrence of `blk_` followed by one or more
    * of [-0-9], or "" when none. Mirrors Matcher.find(): a `blk_` not
    * followed by a body byte is skipped and the scan resumes at the
    * next position. */
  def blockId(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    while (i + 4 < n) {
      if (b(i) == 'b' && b(i + 1) == 'l' && b(i + 2) == 'k' &&
          b(i + 3) == '_' && isBody(b(i + 4))) {
        var k = i + 5
        while (k < n && isBody(b(k))) k += 1
        return UTF8String.fromBytes(b, i, k - i)
      }
      i += 1
    }
    UTF8String.EMPTY_UTF8
  }
}

object LogLineScan {
  val Instance = new LogLineScan
}

sealed abstract class LogLineExtract extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string line column, got ${child.dataType}")
  override def dataType: DataType = StringType

  /** The LogLineScan method this expression delegates to — one name,
    * shared verbatim by the interpreted and codegen paths. */
  protected def method: String

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    method match {
      case "tsRaw"       => LogLineScan.Instance.tsRaw(s)
      case "restAfterTs" => LogLineScan.Instance.restAfterTs(s)
      case "blockId"     => LogLineScan.Instance.blockId(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scan = ctx.addReferenceObj("logLineScan", LogLineScan.Instance,
      classOf[LogLineScan].getName)
    defineCodeGen(ctx, ev, c => s"$scan.$method($c)")
  }
}

case class LogTsRaw(child: Expression) extends LogLineExtract {
  override protected def method: String = "tsRaw"
  override def prettyName: String = "graft_log_ts_raw"
  override protected def withNewChildInternal(newChild: Expression): LogTsRaw =
    copy(child = newChild)
}

case class LogRestAfterTs(child: Expression) extends LogLineExtract {
  override protected def method: String = "restAfterTs"
  override def prettyName: String = "graft_log_rest"
  override protected def withNewChildInternal(newChild: Expression): LogRestAfterTs =
    copy(child = newChild)
}

case class LogBlockId(child: Expression) extends LogLineExtract {
  override protected def method: String = "blockId"
  override def prettyName: String = "graft_log_block_id"
  override protected def withNewChildInternal(newChild: Expression): LogBlockId =
    copy(child = newChild)
}
