package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.DotProduct

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)`
  *
  * and rewrite it to the native codegen'd `DotProduct(a, b)` kernel.
  * Users (and our own executable-spec forms) write the idiomatic HOF
  * pipeline; the engine runs the tight loop — the same contract as
  * Catalyst's own expression optimizations, applied through the
  * public `injectOptimizerRule` extension point.
  *
  * The rewrite is exact, not approximate: the kernel folds the same
  * element order with the same IEEE additions, and reproduces the
  * HOF null semantics (length mismatch or null element ⇒ NULL, empty
  * arrays ⇒ 0.0) — certified by HashExprsSpec, which compares the
  * two forms with this rule DISABLED via its kill switch
  * (`spark.sql.graft.rewriteDotProduct=false`), so the reference
  * form stays a genuine reference.
  *
  * Double arithmetic never overflows to an error, so the rewrite is
  * valid under both ANSI and legacy eval modes of the matched
  * Multiply/Add.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  val ConfKey = "spark.sql.graft.rewriteDotProduct"

  private def isVars(bin: BinaryArithmetic,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (bin.left.semanticEquals(a) && bin.right.semanticEquals(b)) ||
      (bin.left.semanticEquals(b) && bin.right.semanticEquals(a))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "true") != "true") return plan
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if isVars(mul, x, y) && isVars(add, acc, el) && fin.semanticEquals(fv) &&
          mul.dataType == DoubleType =>
        DotProduct(a, b)
    }
  }
}
