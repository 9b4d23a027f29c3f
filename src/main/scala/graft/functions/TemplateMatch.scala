package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native template-match expression (SURVEY.md §7.3's optional perf
  * upgrade over the chained-`when(rlike)` CASE): first template (in
  * given order) whose regex finds a match wins; NULL when none match.
  *
  * Why an `Expression` beats the CASE chain at the 29-template
  * dimension (reference `prepare_data_batch.ipynb:291-299`):
  *  - patterns compile ONCE per executor (transient lazy + codegen
  *    reference objects), not once per generated rlike branch;
  *  - the row's UTF8String is converted to a java String ONCE and all
  *    patterns run over it in a tight loop — the CASE chain re-invokes
  *    the regex machinery per branch with its own conversion;
  *  - one expression node keeps the plan tiny (no 29-branch CaseWhen
  *    for the optimizer to re-traverse), and `doGenCode` keeps the
  *    whole match inside whole-stage codegen.
  *
  * r20 fast path: `Templates.toRegex`'s unanchored form is the atomic
  * first-occurrence chain `\Qs1\E(?>.*?\Qs2\E)…` — semantically the
  * ordered-substring scan "find s1's first occurrence, then s2's
  * first occurrence after it, …" (the atomic groups commit to first
  * occurrences, and if the first-occurrence chain fails at segment k,
  * any later start fails at ≤ k, so `find()` agrees with the greedy
  * chain). [[TemplateMatcher]] therefore decomposes each regex into
  * its literal segments at construction and matches via sequential
  * `String.indexOf` — ~an order of magnitude cheaper than the regex
  * engine on the q62 production path (29 patterns × 11 M messages).
  * EXACTNESS GUARD: `.` does not cross line terminators, so the
  * indexOf path (which would) only runs on terminator-free inputs —
  * any input containing \n \r U+0085 U+2028 U+2029, and any regex
  * that fails to decompose, falls back to the compiled Pattern.
  * TemplateMatchNativeSpec pins native ≡ CASE-chain on fixtures,
  * multi-line and adversarial inputs.
  */
final class TemplateMatcher(ids: Seq[String], regexes: Seq[String])
    extends Serializable {

  @transient private lazy val compiled: Array[Pattern] =
    regexes.map(Pattern.compile(_)).toArray
  @transient private lazy val utf8Ids: Array[UTF8String] =
    ids.map(UTF8String.fromString).toArray
  /** Per pattern: the ordered literal segments when the regex is a
    * pure `toRegex` chain, else null (Pattern fallback). */
  @transient private lazy val chains: Array[Array[String]] =
    regexes.map(r => TemplateMatcher.decompose(r).orNull).toArray

  private def orderedContains(s: String, lits: Array[String]): Boolean = {
    var pos = 0
    var i = 0
    while (i < lits.length) {
      val at = s.indexOf(lits(i), pos)
      if (at < 0) return false
      pos = at + lits(i).length
      i += 1
    }
    true
  }

  /** True when `.` could behave differently from plain containment:
    * the Java regex dot (UNIX_LINES off) excludes \n \r U+0085
    * U+2028 U+2029. */
  private def hasLineTerminator(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
        c == '\u2029') return true
      i += 1
    }
    false
  }

  /** First matching template's id, or null. Called from both the
    * interpreted and the codegen path — one implementation. */
  def firstMatch(s: String): UTF8String = {
    val fast = !hasLineTerminator(s)
    var i = 0
    while (i < compiled.length) {
      val hit =
        if (fast && chains(i) != null) orderedContains(s, chains(i))
        else compiled(i).matcher(s).find()
      if (hit) return utf8Ids(i)
      i += 1
    }
    null
  }
}

object TemplateMatcher {

  /** Decompose a `Templates.toRegex(_, anchored = false)` output into
    * its ordered literal segments. Accepted token grammar (exactly
    * what that builder emits): `\Q<lit>\E`, `(?>.*?\Q<lit>\E)`, and
    * `.*`, concatenated; `<lit>` never contains `\E` (no template
    * does — quoting would have split it). Returns None on anything
    * else, which routes the pattern to the compiled-regex fallback. */
  private[graft] def decompose(re: String): Option[Array[String]] = {
    val out = Seq.newBuilder[String]
    var i = 0
    def literalFrom(start: Int): Option[Int] = {
      val end = re.indexOf("\\E", start)
      if (end < 0) None
      else { out += re.substring(start, end); Some(end + 2) }
    }
    while (i < re.length) {
      if (re.startsWith("\\Q", i)) {
        literalFrom(i + 2) match {
          case Some(next) => i = next
          case None => return None
        }
      } else if (re.startsWith("(?>.*?\\Q", i)) {
        literalFrom(i + 8) match {
          case Some(next) if re.startsWith(")", next) => i = next + 1
          case _ => return None
        }
      } else if (re.startsWith(".*", i)) {
        i += 2
      } else return None
    }
    Some(out.result().filter(_.nonEmpty).toArray)
  }
}

case class TemplateMatch(child: Expression, ids: Seq[String], regexes: Seq[String])
    extends UnaryExpression {

  require(ids.length == regexes.length, "ids and regexes must align")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string message column, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_template_match"

  @transient private lazy val matcher = new TemplateMatcher(ids, regexes)

  override def nullSafeEval(input: Any): Any =
    matcher.firstMatch(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("templateMatcher", matcher,
      classOf[TemplateMatcher].getName)
    // Fresh names per instance: fixed identifiers collide (Janino
    // duplicate-local error → silent interpreted fallback) when two
    // TemplateMatch nodes land in one codegen'd method scope.
    val hit = ctx.freshName("tmplHit")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.unsafe.types.UTF8String $hit =
      |  $m.firstMatch($c.toString());
      |${ev.isNull} = ($hit == null);
      |if (!${ev.isNull}) { ${ev.value} = $hit; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TemplateMatch =
    copy(child = newChild)
}
