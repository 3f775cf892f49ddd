package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistributedRank

/** The two-pass distributed rank kernel must agree bit-for-bit with the
  * window functions it replaces — row_number, running sum, group count,
  * group total, and the ntile bucket rule — on data that exercises ties,
  * descending orders, groups of uneven size, and group counts that don't
  * divide the bucket count.
  */
class DistributedRankSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 3 groups of very different sizes, duplicate values (tiebreak on id),
  // values interleaved so range partitions split groups mid-stream.
  private lazy val fixture = {
    val rows = (1 to 97).map { i =>
      val g = if (i % 7 == 0) "c" else if (i % 2 == 0) "b" else "a"
      (g, (i * 37) % 10, i.toLong) // value collides often
    }
    rows.toDF("g", "v", "id")
  }

  test("global rank + running sum match a global window") {
    val byOrder = Window.orderBy($"v".asc, $"id".asc)
    val expected = fixture
      .withColumn("rk", row_number().over(byOrder).cast("long"))
      .withColumn("cum", sum($"id").over(byOrder.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"id", $"rk", $"cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = DistributedRank.withRowNumber(
      fixture, Nil, Seq($"v".asc, $"id".asc), "rk",
      sumCol = Some("id"), cumCol = Some("cum"),
      nGroupCol = Some("n"), sumGroupCol = Some("tot"))
    val gotSet = got.select($"id", $"rk", $"cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSet === expected)
    val totals = got.select($"n", $"tot").distinct().collect()
    assert(totals.length === 1)
    assert(totals(0).getLong(0) === 97L)
    assert(totals(0).getLong(1) === (1 to 97).map(_.toLong).sum)
  }

  test("per-group rank with descending order matches a partitioned window") {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val expected = fixture
      .withColumn("rk", row_number().over(w).cast("long"))
      .select($"id", $"rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DistributedRank.withRowNumber(
        fixture, Seq("g"), Seq($"v".desc, $"id".asc), "rk")
      .select($"id", $"rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("ntileFromRank reproduces ntile for ragged group sizes") {
    for (k <- Seq(3, 4, 10)) {
      val w = Window.partitionBy($"g").orderBy($"v".asc, $"id".asc)
      val expected = fixture
        .withColumn("b", ntile(k).over(w).cast("long"))
        .select($"id", $"b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = DistributedRank.withRowNumber(
          fixture, Seq("g"), Seq($"v".asc, $"id".asc), "rk",
          nGroupCol = Some("n"))
        .withColumn("b", DistributedRank.ntileFromRank("rk", "n", k))
        .select($"id", $"b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"ntile($k) mismatch")
    }
  }

  test("ntileFromRank handles groups smaller than k (one row per bucket)") {
    val tiny = Seq(("x", 1L), ("x", 2L), ("y", 5L)).toDF("g", "id")
    val got = DistributedRank.withRowNumber(
        tiny, Seq("g"), Seq($"id".asc), "rk", nGroupCol = Some("n"))
      .withColumn("b", DistributedRank.ntileFromRank("rk", "n", 4))
      .select($"g", $"id", $"b")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("x", 1L, 1L), ("x", 2L, 2L), ("y", 5L, 1L)))
  }

  test("kernel equals windows on random tables (8 trials: sizes, groups, ties)") {
    val r = new scala.util.Random(20260813)
    for (trial <- 1 to 8) {
      val n = 1 + r.nextInt(200)
      val nGroups = 1 + r.nextInt(5)
      val valRange = 1 + r.nextInt(12) // small range → heavy ties
      val rows = (1 to n).map { i =>
        (s"g${r.nextInt(nGroups)}", r.nextInt(valRange), i.toLong,
          r.nextInt(1000).toLong)
      }
      val df = rows.toDF("g", "v", "id", "x")
      val desc = r.nextBoolean()
      val order = if (desc) Seq($"v".desc, $"id".asc) else Seq($"v".asc, $"id".asc)
      val w = Window.partitionBy($"g")
        .orderBy(order: _*)
      val expected = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum($"x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select($"id", $"rk", $"cum")
        .collect().map(t => (t.getLong(0), t.getLong(1), t.getLong(2))).toSet
      val got = DistributedRank.withRowNumber(
          df, Seq("g"), order, "rk",
          sumCol = Some("x"), cumCol = Some("cum"))
        .select($"id", $"rk", $"cum")
        .collect().map(t => (t.getLong(0), t.getLong(1), t.getLong(2))).toSet
      assert(got === expected,
        s"trial $trial (n=$n groups=$nGroups desc=$desc) diverged")
    }
  }

  test("a single-value tie run spreads across partitions (skew safety)") {
    // Every row has the SAME order value — the worst-case skew. Because
    // the range key includes the unique tiebreak, the partitioner may
    // cut inside the tie run, so no partition holds the whole corpus;
    // ranks must still be the global 1..n.
    val df = (1 to 4000).map(i => ("g", 1, i.toLong)).toDF("g", "v", "id")
    val ranked = DistributedRank.withRowNumber(
      df, Seq("g"), Seq($"v".asc, $"id".asc), "rk")
    val byPart = ranked
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy($"pid").count().collect().map(_.getLong(1))
    assert(byPart.length >= 2, s"tie run collapsed to one partition: ${byPart.toList}")
    assert(byPart.max <= 3000, s"skewed partition: ${byPart.toList}")
    val ranks = ranked.select($"rk").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 4000L))
  }

  test("execution-order-sensitive queries are run-to-run deterministic") {
    // Two full evaluations must produce identical row sets — catches
    // tie-order leakage in the kernel, double-summation order drift, and
    // any nondeterminism in codebook training before the oracle would.
    for (q <- Seq("q_gini", "q_rfm", "q_ann_pq", "q_mixture")) {
      val fn = SparkEntry.queries(q)
      val a = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(a === b, s"$q diverged between runs")
    }
  }

  test("rank output is one plan with no Window node") {
    val got = DistributedRank.withRowNumber(
      fixture, Seq("g"), Seq($"v".asc, $"id".asc), "rk")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }
}
