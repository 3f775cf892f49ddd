package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string as a native codegen'd
  * Expression: one tokenize pass + one sliding window per row.
  *
  * Why not column algebra: the composable spelling
  * (`transform(sequence(...), i => concat_ws(" ", element_at(tokens, i)...))`)
  * re-evaluates the whole tokenizer subtree per element position —
  * higher-order functions are interpreted and Catalyst's projection
  * collapse inlines the token array everywhere it appears, making
  * shingling O(len²) per document. This expression is O(len), and on the
  * sf0.1 dedup bench cuts shingle-based queries ~4-10×.
  *
  * Semantics are identical to the SQL oracle spelling
  * (`list_distinct(list_transform(...))` over the lowercase-alnum token
  * split): same token rule as TextFunctions.tokens, space-joined n-grams,
  * first-occurrence-distinct.
  */
case class ShinglesExpression(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires STRING input and n >= 1, got ${child.dataType}, n=$n")

  override def nullSafeEval(input: Any): Any =
    ShinglesExpression.compute(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShinglesExpression.compute($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpression =
    copy(child = newChild)
}

object ShinglesExpression {
  /** Called from generated code — static-reachable, single pass; token
    * rule is the shared TextFunctions.tokenize (Locale.ROOT). */
  def compute(text: String, n: Int): ArrayData = {
    val toks = TextFunctions.tokenize(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = mutable.LinkedHashSet.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen += sb.toString
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s =>
      UTF8String.fromString(s): Any).toArray)
  }
}

object Shingles {
  /** Register in the session function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be a literal, got $other")
        }
        ShinglesExpression(exprs.head, n)
      }, "built-in")

  /** Column builder; requires `register(spark)` once per session. */
  def shingles(text: Column, n: Int): Column =
    call_function("graft_shingles", text, org.apache.spark.sql.functions.lit(n))
}
