package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton (Z-order) curve key as a native codegen `Expression`: the two
  * integral inputs' low `bits` bits are interleaved (x in the even output
  * bits, y in the odd), so sorting by the result clusters rows that are
  * close in BOTH dimensions. This is the lakehouse data-layout primitive:
  * a table written in z-value order gets parquet row-group min/max zone
  * maps that are narrow in every interleaved column at once, so filters on
  * EITHER column skip most files — where a single-column sort only ever
  * skips on its leading column. At 100 TB the difference is reading one
  * row group vs scanning the table for the second dimension's predicates.
  *
  * Entirely beyond the reference (its layout control is the sha256 key
  * partitioner, `default/partition.py:4-12` — hash, i.e. anti-locality).
  * Deterministic pure bit arithmetic, so the DuckDB oracle recomputes the
  * identical key with shift/mask SQL and `q_zorder` is hash-compared.
  *
  * Negative inputs are masked to the low `bits` bits (documented two's-
  * complement wrap, same on both engines for non-negative keys — the only
  * kind the layout queries feed it).
  */
case class ZOrderExpression(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"graft_zorder bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires integral inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Number].longValue,
      y.asInstanceOf[Number].longValue, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave((long)($a), (long)($b), $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into one long. Called from generated code — must stay a
    * static-reachable pure function. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val xs = x & mask
    val ys = y & mask
    var out = 0L
    var b = 0
    while (b < bits) {
      out |= ((xs >>> b) & 1L) << (2 * b)
      out |= ((ys >>> b) & 1L) << (2 * b + 1)
      b += 1
    }
    out
  }

  /** Column API: z-order key of two integral columns. */
  def zorder(x: Column, y: Column, bits: Int): Column =
    call_function("graft_zorder", x, y, lit(bits))

  /** The matching DuckDB spelling: an unrolled shift/mask sum computing
    * the identical interleave, for oracle SQL generation. */
  def duckdbSql(x: String, y: String, bits: Int): String = {
    val terms = (0 until bits).flatMap { b =>
      Seq(s"((($x >> $b) & 1) << ${2 * b})", s"((($y >> $b) & 1) << ${2 * b + 1})")
    }
    "CAST(" + terms.mkString(" | ") + " AS BIGINT)"
  }
}
