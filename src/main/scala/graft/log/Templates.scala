package graft.log

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-template matching (SURVEY.md §2.7 F2/F3, §7.4.1; reference
  * `prepare_data_batch.ipynb:282-299`, `transform.py:34-47`,
  * `ML_predict.py:57-63`).
  *
  * A template is a literal message with `[*]` wildcards, e.g.
  * `[*]Receiving block[*]src:[*]dest:[*]`. The reference has three
  * mutually inconsistent matching semantics (batch: unanchored
  * last-match-wins; stream: anchored non-greedy; ML: unanchored
  * first-match-wins). Our canonical semantic is **first match in
  * template-file order, unanchored** — deterministic and the one the
  * deployed scorer uses; `MatchMode` exposes the other two for
  * bit-parity experiments.
  *
  * The match is a driver-side compiled chain of `when(rlike)` branches —
  * one big CASE expression evaluated per row inside whole-stage codegen.
  * The ~29-template dimension never touches the cluster as data: it is
  * inlined into the plan (the same "manual broadcast" the reference
  * does by `collect()`ing the template table). At 100 TB this stage is
  * embarrassingly parallel with zero shuffle.
  */
object Templates {

  final case class Template(id: String, pattern: String)

  sealed trait MatchMode
  object MatchMode {
    /** Canonical: first matching template (file order) wins. */
    case object FirstMatch extends MatchMode
    /** Reference batch layer: last matching template wins. */
    case object LastMatch extends MatchMode
    /** Reference stream layer: anchored `^...$`, last match wins. */
    case object AnchoredLast extends MatchMode
  }

  /** Compile `[*]`-wildcard template text to a Java regex: quote every
    * literal segment, wildcards between.
    *
    * Unanchored form: NOT `seg1.*seg2.*seg3` — on the JVM's
    * backtracking engine, k greedy `.*`s with literal tails go
    * O(n^k) on near-matching input (measured: the 29-template
    * dimension at 12 s for 9k lines, i.e. ~50 µs/find). An unanchored
    * existence test of "segments in order" is satisfiable iff the
    * greedy first-occurrence chain succeeds (exchange argument:
    * earlier occurrences never hurt later segments), so each gap
    * compiles to an ATOMIC lazy group `(?>.*?segK)` — find the first
    * next occurrence, never backtrack into the gap — which is exactly
    * that linear chain. Same match set, worst-case quadratic instead
    * of exponential. DuckDB's RE2 twin (`RawLog.toRegexRe2`) keeps
    * plain `.*`: RE2 is non-backtracking, where the forms are
    * equivalent AND linear.
    *
    * Anchored form (stream-layer parity mode only) keeps plain `.*`:
    * with a `$` anchor the LAST segment occurrence matters, and the
    * atomic first-occurrence chain would wrongly commit. */
  def toRegex(template: String, anchored: Boolean = false): String = {
    val segs = template.split("\\[\\*\\]", -1)
      .map(seg => if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
    if (anchored) "^" + segs.mkString(".*") + "$"
    else segs.reduceLeft { (acc, seg) =>
      if (seg.isEmpty) acc + ".*"
      else if (acc.isEmpty) seg
      else s"$acc(?>.*?$seg)"
    }
  }

  /** Load an `EventId,EventTemplate` CSV as the template dimension. */
  def load(spark: SparkSession, path: String): Seq[Template] =
    spark.read.option("header", "true").csv(path)
      .collect()
      .map(r => Template(r.getString(0), r.getString(1)))
      .toSeq

  /** The EventId column: a single CASE expression over all templates.
    * NULL when no template matches (filtered downstream, SURVEY P3).
    *
    * Built as ONE flat CaseWhen (`when(c1, v1).when(c2, v2)…`), never a
    * nested `coalesce(coalesce(…))` fold: nesting makes the expression
    * tree O(n²) nodes, and at the real 29-template dimension Catalyst's
    * subexpression-elimination pass goes quadratic-on-quadratic over it
    * (observed: planning never finishes). The flat form is one node
    * with n branches, short-circuits at the first hit, and codegens to
    * a simple if/else-if ladder. */
  def eventIdColumn(templates: Seq[Template], message: Column,
      mode: MatchMode = MatchMode.FirstMatch): Column = {
    val anchored = mode == MatchMode.AnchoredLast
    // A first-true-wins CASE over the reversed list IS last-match-wins,
    // so both orders share one code path.
    val ordered = mode match {
      case MatchMode.FirstMatch => templates
      case _                    => templates.reverse
    }
    // Empty dimension (e.g. a header-only template CSV): nothing can
    // match, so the column is NULL — same contract as the no-hit case.
    if (ordered.isEmpty) return lit(null).cast("string")
    val first = ordered.head
    ordered.tail.foldLeft(
      when(message.rlike(toRegex(first.pattern, anchored)), lit(first.id))) {
      (acc, t) => acc.when(message.rlike(toRegex(t.pattern, anchored)), lit(t.id))
    }
  }

  /** The EventId column via the NATIVE codegen'd expression
    * (`graft.functions.TemplateMatch`, registered by
    * `graft.GraftExtensions`): patterns compile once per executor and
    * every row runs one tight first-match loop instead of a 29-branch
    * CASE. Same semantics as `eventIdColumn(FirstMatch)`; requires a
    * session built `withExtensions(new GraftExtensions)`. */
  def eventIdColumnNative(templates: Seq[Template], message: Column): Column =
    call_function("graft_template_match",
      message +: templates.flatMap(t =>
        Seq(lit(t.id), lit(toRegex(t.pattern)))): _*)

  /** Tag a parsed-events frame with `event_id`. */
  def tag(parsed: DataFrame, templates: Seq[Template],
      mode: MatchMode = MatchMode.FirstMatch): DataFrame =
    parsed.withColumn("event_id", eventIdColumn(templates, col("message"), mode))

  /** `tag` through the native kernel — the PRODUCTION form (r11):
    * identical FirstMatch semantics (parity pinned by
    * TemplateMatchNativeSpec on all 29 templates), but patterns
    * compile once per executor and each row runs one short-circuiting
    * loop instead of a 29-branch rlike CASE. Measured at the 1.6 GiB
    * raw-log scale this nearly halves q62 end-to-end (11.2 → 5.8 s
    * warm — the giant CASE ladder was the feature pipeline's real
    * bottleneck, not the aggregation). Requires a session built
    * `withExtensions(new GraftExtensions)` (every entry point). */
  def tagNative(parsed: DataFrame, templates: Seq[Template]): DataFrame =
    parsed.withColumn("event_id", eventIdColumnNative(templates, col("message")))

  /** Drop rows no template matched (reference `prepare_data_batch.ipynb:350`). */
  def matchedOnly(tagged: DataFrame): DataFrame =
    tagged.filter(col("event_id").isNotNull)
}
