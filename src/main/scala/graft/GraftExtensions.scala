package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TemplateMatch

/** Engine extensions, registered the idiomatic Spark way:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  *
  * Registers `graft_template_match(message, id1, regex1, id2, regex2,
  * …)` — the native first-match template tagger
  * (`graft.functions.TemplateMatch`). Template ids/regexes must be
  * string literals (they are a dimension inlined into the plan, the
  * same manual broadcast the reference does by collecting its
  * template table).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_template_match"),
      new ExpressionInfo(classOf[TemplateMatch].getName, "graft_template_match"),
      (args: Seq[Expression]) => {
        require(args.length >= 3 && args.length % 2 == 1,
          "usage: graft_template_match(message, id1, regex1, ...)")
        def str(e: Expression): String = e match {
          case Literal(v: UTF8String, _: StringType) => v.toString
          case other =>
            throw new IllegalArgumentException(
              s"template ids/regexes must be string literals, got $other")
        }
        val pairs = args.tail.map(str).grouped(2).toSeq
        TemplateMatch(args.head, pairs.map(_.head), pairs.map(_.last))
      }))
}
