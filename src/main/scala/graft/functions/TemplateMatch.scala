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
  */
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

  @transient private lazy val compiled: Array[Pattern] =
    regexes.map(Pattern.compile(_)).toArray
  @transient private lazy val utf8Ids: Array[UTF8String] =
    ids.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var i = 0
    while (i < compiled.length) {
      if (compiled(i).matcher(s).find()) return utf8Ids(i)
      i += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("templatePatterns", compiled,
      "java.util.regex.Pattern[]")
    val outs = ctx.addReferenceObj("templateIds", utf8Ids,
      "org.apache.spark.unsafe.types.UTF8String[]")
    // Fresh names per instance: fixed identifiers collide (Janino
    // duplicate-local error → silent interpreted fallback) when two
    // TemplateMatch nodes land in one codegen'd method scope.
    val input = ctx.freshName("tmplInput")
    val idx = ctx.freshName("tmplIdx")
    nullSafeCodeGen(ctx, ev, c => s"""
      |String $input = $c.toString();
      |${ev.isNull} = true;
      |for (int $idx = 0; $idx < $pats.length; $idx++) {
      |  if ($pats[$idx].matcher($input).find()) {
      |    ${ev.isNull} = false;
      |    ${ev.value} = $outs[$idx];
      |    break;
      |  }
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TemplateMatch =
    copy(child = newChild)
}
