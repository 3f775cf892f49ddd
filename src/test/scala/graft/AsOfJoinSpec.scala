package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"), (2L, 7L, "t3"),
  ).toDF("k", "ts", "trade")

  private val quotes = Seq(
    (1L, 8L, 100.0), (1L, 15L, 110.0), (1L, 20L, 120.0), (2L, 9L, 50.0),
  ).toDF("k", "qts", "px")

  test("asof picks the latest right row at or before each left ts") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "ts", "qts", Seq("px"))
      .select($"trade", $"px").as[(String, Double)].collect().toMap
    // t0 (ts=5): no quote <= 5 → dropped (inner); t3 (ts=7): quote at 9 is after → dropped
    assert(out === Map("t1" -> 100.0, "t2" -> 120.0))
  }

  test("outer asof keeps unmatched left rows with null payload") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "ts", "qts", Seq("px"),
      inner = false)
    assert(out.count() === 4)
    val unmatched = out.filter($"px".isNull)
      .select($"trade").as[String].collect().toSet
    assert(unmatched === Set("t0", "t3"))
  }

  test("asof plan shuffles once on the key") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "ts", "qts", Seq("px"))
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, "union sides shuffle to the same key partitioning")
  }

  test("registered asof query: every purchase matches a click at or before it") {
    val out = graft.queries.EventQueries.qAsofJoin(spark, sf)
    assert(out.count() > 0)
    assert(out.filter($"click_value".isNull).count() === 0)
  }
}
