package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProductExpression

class RewriteRuleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def hasDotExpr(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProductExpression]))

  // parquet-backed (a LocalRelation would be constant-folded wholesale,
  // leaving no expression to inspect in the optimized plan)
  private lazy val pairs = {
    val p = java.nio.file.Files.createTempDirectory("graft_rw").toString
    Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.0), Seq(2.0, 2.0)),
    ).toDF("a", "b").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
      .select($"a".cast("array<double>").as("a"), $"b".cast("array<double>").as("b"))
  }

  private def declarativeDot = aggregate(
    zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("declarative dot product is rewritten to the codegen expression") {
    val df = pairs.select(declarativeDot.as("d"))
    assert(hasDotExpr(df), df.queryExecution.optimizedPlan.treeString)
    // and the values are the plain dot products
    assert(df.as[Double].collect().toSet === Set(32.0, -1.0))
  }

  test("rewrite preserves null-array and unequal-length semantics") {
    val mixed = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))), // ok → 11
      (None, Some(Seq(1.0))),                     // null side → null
      (Some(Seq(1.0, 2.0)), Some(Seq(5.0))),      // unequal → null (zip_with pads)
    ).toDF("a", "b")
    val out = mixed.select(declarativeDot.as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(11.0), None, None))
  }

  test("non-dot folds are left untouched") {
    // subtraction merge is NOT a dot product
    val df = pairs.select(aggregate(
      zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc - x).as("d"))
    assert(!hasDotExpr(df))
    // max-combine is not either
    val df2 = pairs.select(aggregate(
      zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => greatest(acc, x)).as("d"))
    assert(!hasDotExpr(df2))
  }
}
