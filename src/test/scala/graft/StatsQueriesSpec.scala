package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Driver-side recomputation checks for the round-7 statistics family:
  * every query result is rebuilt from the raw sf0.001 parquet with plain
  * Scala collections and compared row-for-row. (The DuckDB oracle proves
  * cross-engine parity; these prove the SEMANTICS are the advertised
  * formulas, independent of any SQL spelling.) */
class StatsQueriesSpec extends AnyFunSuite {
  import TestSpark._

  private val day0 = java.time.LocalDate.parse("2024-01-01")

  /** (event_type, day-index, value) triples straight from parquet. */
  private lazy val rawEvents: Seq[(String, Int, BigDecimal)] =
    Tables.events(spark, sf)
      .selectExpr("event_type",
        "datediff(to_date(ts), date '2024-01-01') AS x",
        "CAST(value AS DECIMAL(18,6)) AS v", "user_id", "ts")
      .collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getDecimal(2): BigDecimal))

  private lazy val daily: Map[(String, Int), BigDecimal] =
    rawEvents.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap

  private def medianInterp(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("theil-sen slope == driver-side median of pairwise slopes") {
    val got = queries.EventQueries.qTheilSen(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val types = daily.keys.map(_._1).toSet
    for (t <- types) {
      val pts = daily.collect { case ((`t`, x), y) => (x, y.toDouble) }.toSeq
      val slopes = for {
        (x1, y1) <- pts; (x2, y2) <- pts if x2 > x1
      } yield (y2 - y1) / (x2 - x1)
      val (nPairs, slope) = got(t)
      assert(nPairs === slopes.size.toLong, s"pair count for $t")
      assert(math.abs(slope - round6(medianInterp(slopes))) < 1e-9,
        s"median slope for $t")
    }
  }

  test("kendall tau == driver-side concordance count") {
    val got = queries.EventQueries.qKendall(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val counts = rawEvents.groupBy(t => (t._1, t._2)).view
      .mapValues(_.size).toMap
    for (t <- got.keys) {
      val pts = daily.keys.filter(_._1 == t).map(_._2).toSeq.sorted
        .map(x => (x, counts((t, x)), daily((t, x))))
      val sgns = for {
        (x1, c1, y1) <- pts; (x2, c2, y2) <- pts if x2 > x1
      } yield math.signum((c2 - c1).toDouble) * math.signum((y2 - y1).toDouble)
      val conc = sgns.count(_ > 0)
      val disc = sgns.count(_ < 0)
      val (gc, gd, gn, tau) = got(t)
      assert((gc, gd, gn) === ((conc.toLong, disc.toLong, sgns.size.toLong)),
        s"concordance counts for $t")
      assert(math.abs(tau - round6((conc - disc).toDouble / sgns.size)) < 1e-9,
        s"tau for $t")
    }
  }

  test("difference-in-differences == driver-side 2x2 cell means") {
    val cut = java.time.LocalDate.parse("2024-01-16")
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id % 2 = 1 AS treat",
        "to_date(ts) >= date '2024-01-16' AS post",
        "CAST(value AS DECIMAL(18,6)) AS v")
      .collect().toSeq
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
        r.getDecimal(3): BigDecimal))
    val got = queries.EventQueries.qDid(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(7)).toMap
    for (t <- got.keys) {
      def mean(treat: Boolean, post: Boolean): Double = {
        val vs = rows.collect {
          case (`t`, tr, po, v) if tr == treat && po == post => v
        }
        vs.sum.toDouble / vs.size
      }
      val did = (mean(true, true) - mean(true, false)) -
        (mean(false, true) - mean(false, false))
      assert(math.abs(got(t) - round6(did)) < 1e-6, s"did for $t")
    }
  }

  test("HHI == driver-side squared-share sum in whole dollars") {
    val rev = Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * " +
          "(100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) AS cp")
      .collect().toSeq.map(r => (r.getLong(0), BigInt(r.getLong(1))))
      .groupBy(_._1).view.mapValues(cps => (cps.map(_._2).sum / 1000000L).toLong)
      .toMap
    def lng(r: Row, i: Int): Long = r.get(i).asInstanceOf[Number].longValue
    val nat = Tables.supplier(spark, sf)
      .selectExpr("s_suppkey", "s_nationkey").collect()
      .map(r => lng(r, 0) -> lng(r, 1)).toMap
    val got = queries.Relational.qHhi(spark, sf).collect()
      .map(r => lng(r, 0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val byNation = rev.toSeq.groupBy { case (sk, _) => nat(sk) }
    for ((n, suppliers) <- byNation) {
      val ds = suppliers.map(_._2)
      if (ds.sum > 0) {
        val hhi = 10000.0 * ds.map(d => d.toDouble * d.toDouble).sum /
          (ds.sum.toDouble * ds.sum.toDouble)
        val (cnt, gh) = got(n)
        assert(cnt === ds.size.toLong, s"supplier count for nation $n")
        assert(math.abs(gh - round6(hhi)) < 1e-6, s"hhi for nation $n")
      }
    }
  }

  test("tree rollup == driver-side ancestor expansion") {
    val parts = Tables.part(spark, sf)
      .selectExpr("p_partkey",
        "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expanded = parts.flatMap { case (p, c) =>
      (0 to 7).map(k => p / math.pow(10, k).toLong).distinct.map(a => (a, c))
    }
    val expect = expanded.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val got = queries.Relational.qTreeRollup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
  }

  test("item-CF == driver-side cosine top-3") {
    val op = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val occ = op.groupBy(_._2).view.mapValues(_.size).toMap
    val cooc = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.size if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).toSeq
    val sym = cooc ++ cooc.map { case ((a, b), c) => ((b, a), c) }
    val expect = sym.groupBy(_._1._1).flatMap { case (src, xs) =>
      xs.map { case ((_, dst), c) =>
        (src, dst, c / math.sqrt((occ(src).toLong * occ(dst)).toDouble))
      }.sortBy { case (_, dst, sim) => (-sim, dst) }
        .take(3).zipWithIndex
        .map { case ((s2, d2, sim), i) => (s2, d2) -> ((round6(sim), i + 1)) }
    }
    val got = queries.GraphQueries.qItemCf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3)))).toMap
    assert(got.keySet === expect.keySet)
    for ((k, (sim, rn)) <- expect) {
      assert(math.abs(got(k)._1 - sim) < 1e-9 && got(k)._2 == rn, s"pair $k")
    }
  }

  test("rolling slope == driver-side trailing-7-day OLS") {
    // cents derived with the QUERY's own cast chain (double → DECIMAL(18,2))
    // — re-rounding the (18,6) capture would double-round boundary values
    val cents = Tables.events(spark, sf)
      .selectExpr("event_type",
        "datediff(to_date(ts), date '2024-01-01') AS x",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val got = queries.EventQueries.qRollingSlope(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    for (((t, x), _) <- cents) {
      val win = (x - 6 to x).flatMap(d => cents.get((t, d)).map(y => (d, y)))
      val n = win.size
      val sx = win.map(_._1.toLong).sum
      val sy = win.map(_._2).sum
      val sxy = win.map { case (d, y) => d * y }.sum
      val sx2 = win.map(d => d._1.toLong * d._1).sum
      val vx = n * sx2 - sx * sx
      if (n > 1 && vx > 0) {
        val slope = (n * sxy - sx * sy).toDouble / vx.toDouble
        val (gn, gs) = got((t, x))
        assert(gn === n.toLong, s"window size at ($t,$x)")
        assert(math.abs(gs - round6(slope)) < 1e-9, s"slope at ($t,$x)")
      } else assert(!got.contains((t, x)), s"degenerate window kept at ($t,$x)")
    }
  }
  test("equi-depth histogram: balanced contiguous buckets covering all rows") {
    val rows = graft.queries.Relational.qEquidepth(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo_cents"),
        r.getAs[Long]("hi_cents"), r.getAs[Long]("n")))
      .sortBy(_._1)
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_._1).toSeq === (0L until 8L))
    assert(rows.map(_._4).sum === total, "buckets must partition all rows")
    // equal depth: every bucket within 1 of n/8
    rows.foreach { case (b, _, _, n) =>
      assert(math.abs(n - total / 8.0) <= 1.0, s"bucket $b depth $n vs ${total / 8.0}")
    }
    // contiguous, non-overlapping value coverage in rank order
    rows.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    rows.foreach { case (_, lo, hi, _) => assert(lo <= hi) }
  }
  test("decomposition components reconstruct the daily series additively") {
    val rows = graft.queries.EventQueries.qDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("c") / 100.0
      val rebuilt = r.getAs[Double]("trend_r") +
        r.getAs[Double]("seasonal_r") + r.getAs[Double]("resid_r")
      assert(math.abs(rebuilt - c) < 1e-4,
        s"day ${r.getAs[Long]("x")}: $rebuilt != $c")
    }
    // seasonal means cancel: weighted by ndow they sum to ~0 per cycle
    val byDow = rows.groupBy(r => r.getAs[Long]("x") % 7)
    assert(byDow.size >= 6, "expected near-full weekday coverage")
  }
  test("gate AUC == driver-side rank-sum over (quality, doc_id) pairs") {
    val rows = graft.queries.TextQueries.qGateAuc(spark, sf).collect()
    assert(rows.length === 5, "one row per threshold")
    // driver recompute: collect scores + labels, rank by (quality, id)
    val scored = graft.queries.TextQueries.qQualityScore(spark, sf)
      .selectExpr("doc_id", "quality").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val langs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ranked = scored.sortBy { case (id, q) => (q, id) }.zipWithIndex
      .map { case ((id, q), i) => (id, q, i + 1L, langs(id) == "en") }
    val nPos = ranked.count(_._4).toLong
    val nNeg = ranked.size - nPos
    val u = ranked.filter(_._4).map(_._3).sum - nPos * (nPos + 1) / 2
    val auc = u.toDouble / (nPos.toDouble * nNeg)
    rows.foreach { r =>
      assert(r.getAs[Long]("u_stat") === u)
      assert(math.abs(r.getAs[Double]("auc_r") - auc) < 1e-6)
      val thr = r.getAs[Double]("thr")
      val tp = ranked.count(x => x._4 && x._2 >= thr).toLong
      val fp = ranked.count(x => !x._4 && x._2 >= thr).toLong
      assert(r.getAs[Long]("tp") === tp, s"tp@$thr")
      assert(r.getAs[Long]("fp") === fp, s"fp@$thr")
      assert(r.getAs[Long]("fn") === nPos - tp)
      assert(r.getAs[Long]("tn") === nNeg - fp)
      val rec = BigDecimal(tp.toDouble / nPos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("recall_r") === rec)
    }
    // structural properties: AUC in (0,1); recall is monotone
    // non-increasing and precision's denominator shrinks as the
    // threshold rises. (The fixture's text is vocabulary-identical
    // across lang labels, so the SIGNAL is near-chance by construction —
    // the spec pins the metric, not the synthetic corpus.)
    val auc0 = rows.head.getAs[Double]("auc_r")
    assert(auc0 > 0.0 && auc0 < 1.0)
    val byThr = rows.sortBy(_.getAs[Double]("thr"))
    byThr.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("recall_r") >= b.getAs[Double]("recall_r"))
        assert(a.getAs[Long]("tp") + a.getAs[Long]("fp") >=
          b.getAs[Long]("tp") + b.getAs[Long]("fp"))
      case _ =>
    }
  }
}
