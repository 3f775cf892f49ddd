package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProductExpression

/** Optimizer rule: rewrite the declarative dot-product spelling
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  *
  * into the codegen'd `DotProductExpression(a, b)` — users keep writing
  * the composable higher-order form; the engine runs the tight primitive
  * loop (~4× faster; higher-order functions are interpreted per element).
  *
  * The substitution is unconditional because DotProductExpression
  * reproduces the fold's semantics exactly (left-to-right order, null
  * array/element → null, unequal lengths → null — see its Scaladoc).
  * Lambda-variable identity is checked by exprId so only genuine `x*y` /
  * `acc+v` bodies (in either argument order) match; any other fold shape
  * is left untouched.
  *
  * Injected via GraftExtensions (`injectOptimizerRule`) — SURVEY §4.3's
  * "custom Rule" tier, used where it actually pays: kernel selection.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVars(bodyA: Expression, bodyB: Expression,
      args: Seq[NamedLambdaVariable]): Boolean = (bodyA, bodyB) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      Set(x.exprId, y.exprId) == args.map(_.exprId).toSet && x.exprId != y.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), zargs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(ax, ay, _), aargs, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(farg: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          sameVars(mx, my, zargs.collect { case v: NamedLambdaVariable => v }) &&
          sameVars(ax, ay, aargs.collect { case v: NamedLambdaVariable => v }) &&
          fin.exprId == farg.exprId =>
        DotProductExpression(a, b)
    }
}
