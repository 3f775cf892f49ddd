package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Relational, SketchQueries, TextQueries}
import graft.functions.TextFunctions.tokens

/** Sketch-operator guarantees: CMS never underestimates, Bloom pruning
  * never changes join results, and the new text operators keep their
  * defining invariants (quota bounds, top-k shape, lossless mask counts).
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("CMS heavy-hitter estimates are >= the exact counts (never under)") {
    val exact = graft.Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val est = SketchQueries.qHeavyHitters(spark, sf)
    assert(est.count() > 0, "sf0.001 corpus must yield at least one heavy hitter")
    val under = est.join(exact, Seq("tok")).filter(col("est") < col("cnt")).count()
    assert(under === 0, "count-min sketch must never underestimate")
    // every truly-heavy key is reported (one-sided error only)
    val missed = exact.filter(col("cnt") >= 400)
      .join(est, Seq("tok"), "left_anti").count()
    assert(missed === 0, "CMS one-sided error must not drop true heavy hitters")
  }

  test("bloom-pruned semi-join equals the unpruned semi-join") {
    val pruned = SketchQueries.qBloomPrune(spark, sf)
    val plain = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linestatus"))
      .join(graft.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), Relational.dsum(col("l_quantity")).as("total_qty"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
      "bloom pruning must be invisible in the result")
  }

  test("stratified sample honors per-language quota") {
    val sampled = TextQueries.qSampleStratified(spark, sf)
    val per = sampled.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
    assert(per.nonEmpty)
    assert(per.forall(_.getLong(1) <= 20), "quota exceeded in some stratum")
    // quota binds exactly when the stratum is large enough
    val sizes = graft.Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("total")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    per.foreach { r =>
      assert(r.getLong(1) === math.min(20L, sizes(r.getString(0))))
    }
  }

  test("tf-idf returns at most k terms per doc, ranked without score ties broken wrong") {
    val top = TextQueries.qTfIdf(spark, sf)
    val per = top.groupBy(col("doc_id")).agg(count(lit(1)).as("n"),
      max(col("rnk")).as("maxr")).collect()
    assert(per.forall(r => r.getLong(1) <= 5 && r.getInt(2) <= 5))
    // rank 1 really is the max score within each doc
    val bad = top.as("a").join(top.as("b"), Seq("doc_id"))
      .filter(col("a.rnk") < col("b.rnk") && col("a.score_r") < col("b.score_r"))
      .count()
    assert(bad === 0, "rank order must follow score order")
  }

  test("redaction counts hits and masks them losslessly") {
    val r = TextQueries.qRedact(spark, sf)
    assert(r.filter(col("n_hits") > 0).count() > 0,
      "the registered pattern must actually fire on the corpus")
    // masked length = original length + hits * (mask_len - match_len) is
    // not checkable without per-match lengths, but a doc with zero hits
    // must hash to its own text
    val zero = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("orig_md5"))
      .join(r.filter(col("n_hits") === 0), Seq("doc_id"))
    assert(zero.filter(col("orig_md5") =!= col("clean_md5")).count() === 0)
  }

  test("merged group HLL equals the direct global sketch and tracks exact counts") {
    import graft.functions.Sketches
    val rows = queries.SketchQueries.qHllGroups(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("est_distinct"))
      .toMap
    // the merged '*' sketch must equal sketching the global stream
    // directly — lossless union is the point of the merge property
    val direct = graft.Tables.events(spark, sf)
      .select(Sketches.hllRegister(col("user_id").cast("string")),
        Sketches.hllRank(col("user_id").cast("string")))
      .groupBy(col("hll_idx"))
      .agg(org.apache.spark.sql.functions.max(col("hll_rho")).as("mx"))
      .agg(org.apache.spark.sql.functions.sum(call_function("shiftleft",
        org.apache.spark.sql.functions.lit(1L),
        org.apache.spark.sql.functions.lit(Sketches.RestBits + 1) - col("mx")))
        .as("s_present"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_present"))
      .select(Sketches.hllFinish(col("s_present"), col("n_present")): _*)
      .select(Sketches.hllEstimate(col("s_scaled"), col("zero_registers")))
      .head().getDouble(0)
    assert(rows("*") === direct)
    // per-group estimates stay within HLL error of the exact counts
    val exact = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(rows(t) / n - 1.0) <= 0.3, s"type $t est ${rows(t)} vs $n")
    }
  }

  test("CMS join-size estimate is one-sided (never under) and usefully tight") {
    val r = queries.SketchQueries.qJoinSizeEst(spark, sf).collect().head
    val est = r.getAs[Long]("est_join_size")
    val exact = r.getAs[Long]("exact_join_size")
    assert(est >= exact) // the CMS guarantee: collisions only ADD
    assert(est <= exact * 3, s"estimate $est too loose vs $exact") // width sized for ~tightness
  }

  test("HLL set algebra: union/intersection estimates track the exact sets") {
    val r = queries.SketchQueries.qHllIntersect(spark, sf).collect().head
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_partkey")).collect()
      .map(x => (x.getDouble(0), x.getLong(1)))
    val a = li.filter(_._1 <= 2.0).map(_._2).toSet
    val b = li.filter(_._1 > 48.0).map(_._2).toSet
    assert((a & b).nonEmpty && (a -- b).nonEmpty && (b -- a).nonEmpty)
    // per-set and union sketches carry the standard ~1.04/sqrt(128) ≈ 9%
    // error; allow 3 sigma
    assert(math.abs(r.getAs[Double]("est_a") / a.size - 1.0) <= 0.3)
    assert(math.abs(r.getAs[Double]("est_b") / b.size - 1.0) <= 0.3)
    assert(math.abs(r.getAs[Double]("est_union") / (a ++ b).size - 1.0) <= 0.3)
    // inclusion–exclusion compounds all three errors: bound the absolute
    // miss by 30% of the UNION size (the scale the errors live on)
    val exactI = (a & b).size
    assert(math.abs(r.getAs[Double]("est_intersect") - exactI) <=
      0.3 * (a ++ b).size, s"est_i ${r.getAs[Double]("est_intersect")} vs $exactI")
  }

  test("histogram-sketch quantiles are monotone and within one bin of exact") {
    val est = queries.SketchQueries.qQuantileSketch(spark, sf).collect()
      .map(r => r.getAs[Int]("p") -> r.getAs[Double]("est_value")).toMap
    assert(est.keySet === Set(50, 90, 99))
    assert(est(50) <= est(90) && est(90) <= est(99))
    // exact quantiles + the bin width bound the estimate error
    val vals = graft.Tables.events(spark, sf)
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    val binWidth = (vals.last - vals.head) / 64.0 + 0.01
    Seq(50, 90, 99).foreach { p =>
      val exact = vals(math.min(vals.length - 1,
        math.ceil(p / 100.0 * vals.length).toInt - 1))
      assert(math.abs(est(p) - exact) <= binWidth + 1e-9,
        s"p$p est ${est(p)} vs exact $exact (bin $binWidth)")
    }
  }
  test("rolling HLL day-state merge tracks the exact 7-day rolling distinct") {
    val est = graft.queries.SketchQueries.qHllRolling(spark, sf).collect()
      .map(r => r.getAs[Long]("x") -> r.getAs[Double]("est_rolling_users")).toMap
    // exact 7-day rolling distinct users, driver-side
    val byDay = Tables.events(spark, sf)
      .selectExpr("datediff(to_date(ts), date '2024-01-01') AS x", "user_id")
      .collect().groupBy(_.getInt(0))
      .map { case (x, rs) => x.toLong -> rs.map(_.getLong(1)).toSet }
    est.foreach { case (x, e) =>
      val exact = (x - 6 to x).flatMap(d => byDay.getOrElse(d, Set.empty))
        .toSet.size
      assert(exact > 0, s"day $x has no exact users?")
      assert(math.abs(e - exact) / exact.toDouble <= 0.35,
        s"day $x: estimate $e vs exact $exact drifts >35%")
    }
    // every data day is reported
    assert(est.keySet === byDay.keySet.map(_.toLong))
  }
}
