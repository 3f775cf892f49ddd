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

  test("null payload fields ride along instead of exposing stale older rows") {
    // latest quote has px=null: the match must BE that row (px=null),
    // not skip back to the older non-null quote — SQL ASOF semantics
    val q = Seq((1L, 8L, Some(100.0)), (1L, 15L, Option.empty[Double]))
      .toDF("k", "qts", "px")
    val tr = Seq((1L, 20L, "t")).toDF("k", "ts", "trade")
    val inner = AsOfJoin.asof(tr, q, Seq("k"), "ts", "qts", Seq("px"))
    // inner keeps the row: a right row WAS matched (its field is null)
    assert(inner.count() === 1)
    assert(inner.head().isNullAt(inner.head().fieldIndex("px")))
  }

  test("reserved internal names are rejected, including _hit") {
    // _hit is the internal match-flag column; a left frame carrying it
    // would silently collide with the filter/drop step
    val tr = Seq((1L, 20L, true)).toDF("k", "ts", "_hit")
    val err = intercept[IllegalArgumentException] {
      AsOfJoin.asof(tr, quotes, Seq("k"), "ts", "qts", Seq("px"))
    }
    assert(err.getMessage.contains("_hit"))
    // the right side is guarded too
    val q = Seq((1L, 8L, 100.0, false)).toDF("k", "qts", "px", "_hit")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(trades, q, Seq("k"), "ts", "qts", Seq("px"))
    }
  }

  test("asof plan shuffles once on the key") {
    val out = AsOfJoin.asof(trades, quotes, Seq("k"), "ts", "qts", Seq("px"))
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, "union sides shuffle to the same key partitioning")
  }

  test("range join finds exactly the in-window pairs") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val l = Seq((1L, ts(0), "l0"), (1L, ts(1000), "l1"), (2L, ts(0), "l2"))
      .toDF("k", "lts", "ln")
    val r = Seq((1L, ts(100), "r0"), (1L, ts(950), "r1"), (1L, ts(2000), "r2"),
      (2L, ts(901), "r3"))
      .toDF("k", "rts", "rn")
    val out = graft.operators.RangeJoin.timeRangeJoin(
      l, r, Seq("k"), "lts", "rts", lowerSec = 0, upperSec = 900)
      .select($"ln", $"rn").as[(String, String)].collect().toSet
    // l0 (t0): r0 at +100 in window, r1 at +950 out; l1 (t1000): r2 at
    // +1000 out... r2 is at +1000 from l1 → out; r1 at -50 → out
    // l2 (t0, k=2): r3 at +901 → out (strictly beyond upper)
    assert(out === Set(("l0", "r0")))
    // boundary: exactly upperSec is included
    val edge = graft.operators.RangeJoin.timeRangeJoin(
      Seq((1L, ts(0), "x")).toDF("k", "lts", "ln"),
      Seq((1L, ts(900), "y")).toDF("k", "rts", "rn"),
      Seq("k"), "lts", "rts", 0, 900)
    assert(edge.count() === 1)
  }

  test("registered asof query: every purchase matches a click at or before it") {
    val out = graft.queries.EventQueries.qAsofJoin(spark, sf)
    assert(out.count() > 0)
    assert(out.filter($"click_value".isNull).count() === 0)
  }

  private def directed(dir: String, tol: Option[Long]) =
    AsOfJoin.asofDirected(trades, quotes, Seq("k"), "ts", "qts", Seq("px"),
      direction = dir, toleranceSec = tol)
      .select($"trade", $"px").as[(String, Double)].collect().toMap

  test("forward asof picks the earliest right row at or after each left ts") {
    // t0 (ts=5) → quote at 8; t1 (ts=10) → 15; t2 (ts=20) → 20 (tie
    // matches); t3 (ts=7, k=2) → 9
    assert(directed("forward", None) ===
      Map("t0" -> 100.0, "t1" -> 110.0, "t2" -> 120.0, "t3" -> 50.0))
  }

  test("nearest asof takes the closer side; exact |Δ| ties go backward") {
    // t0 (5): only forward (8, Δ3) → 100; t1 (10): backward 8 (Δ2) beats
    // forward 15 (Δ5) → 100; t2 (20): exact hit → 120; t3 (7): fwd 9 → 50
    assert(directed("nearest", None) ===
      Map("t0" -> 100.0, "t1" -> 100.0, "t2" -> 120.0, "t3" -> 50.0))
    // equidistant: left at 10 between quotes at 8 and 12 → backward wins
    val l = Seq((9L, 10L, "m")).toDF("k", "ts", "trade")
    val r = Seq((9L, 8L, 1.0), (9L, 12L, 2.0)).toDF("k", "qts", "px")
    val out = AsOfJoin.asofDirected(l, r, Seq("k"), "ts", "qts", Seq("px"),
      "nearest", None).select($"px").as[Double].head()
    assert(out === 1.0)
  }

  test("tolerance voids matches beyond the bound in every direction") {
    // seconds-scale timestamps: ts column here is epoch-seconds longs
    // cast via the micros math — use wide gaps (ts in SECONDS of long)
    assert(directed("backward", Some(0L)) === Map("t2" -> 120.0))
    // nearest with tolerance 0 keeps only exact-timestamp hits too
    assert(directed("nearest", Some(0L)) === Map("t2" -> 120.0))
  }
}
