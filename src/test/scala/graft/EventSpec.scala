package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventQueries

class EventSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("sessionize splits on gaps > 30 min and aggregates per session") {
    // one user: 3 events 10 min apart, a 2 h gap, then 2 more events
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      (0L, t(0), 7L, "click", 1.0, "{}"),
      (1L, t(10), 7L, "click", 2.0, "{}"),
      (2L, t(20), 7L, "click", 3.0, "{}"),
      (3L, t(140), 7L, "click", 4.0, "{}"),
      (4L, t(150), 7L, "click", 5.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.createOrReplaceTempView("___ev")
    // run the same plan shape over the fixture by swapping the source
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val running = byUser.rowsBetween(Long.MinValue, 0)
    val sessions = ev
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull || $"ts".cast("long") - $"prev_ts".cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum($"new_session").over(running))
      .groupBy($"user_id", $"session_no")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .orderBy($"session_no")
      .collect()
    assert(sessions.length === 2)
    assert(sessions(0).getAs[Long]("n") === 3)
    assert(sessions(0).getAs[Double]("v") === 6.0)
    assert(sessions(1).getAs[Long]("n") === 2)
    assert(sessions(1).getAs[Double]("v") === 9.0)
  }

  test("funnel flags are monotone (purchase implies click implies signup)") {
    val rows = EventQueries.qFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val signup = r.getAs[Boolean]("did_signup")
      val click = r.getAs[Boolean]("did_click_after")
      val purchase = r.getAs[Boolean]("did_purchase_after")
      assert(!click || signup)
      assert(!purchase || click)
    }
  }

  test("tumbling hourly buckets land on hour boundaries and cover all events") {
    val out = EventQueries.qTumblingHourly(spark, sf)
    val total = out.agg(sum($"n_events")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
    out.select($"bucket").collect().foreach { r =>
      val ts = r.getTimestamp(0).getTime
      assert(ts % 3600000L === 0L, s"bucket $ts not on hour boundary")
    }
  }

  test("sliding windows: every event appears in exactly 4 hopping windows") {
    val out = EventQueries.qSlidingWindow(spark, sf)
    val total = out.agg(sum($"n")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count() * 4)
  }

  test("observe() attaches pipeline metrics without a second pass") {
    // the A20 progress/metrics analog: per-stage counters ride along the
    // job instead of a separate DynamoDB write path
    val observed = Tables.events(spark, sf)
      .observe("ev_metrics",
        count(lit(1)).as("rows_seen"),
        sum($"value").as("value_seen"))
      .filter($"event_type" === "purchase")
    // collect() drives THIS QueryExecution (count() would build its own,
    // and the metrics would attach to that one instead)
    val n = observed.collect().length
    val row = observed.queryExecution.observedMetrics("ev_metrics")
    assert(row.getAs[Long]("rows_seen") === Tables.events(spark, sf).count())
    assert(n < row.getAs[Long]("rows_seen"))
  }

  test("activity windows: seq_no is dense per user and avg_prev3 bounded") {
    val out = EventQueries.qUserActivityWindows(spark, sf)
    val perUser = out.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max($"seq_no").as("mx"))
      .collect()
    perUser.foreach(r => assert(r.getAs[Long]("n") === r.getAs[Int]("mx").toLong))
    // first event per user has no preceding frame → null avg
    assert(out.filter($"seq_no" === 1 && $"avg_prev3".isNotNull).count() === 0)
  }

  test("gap-fill densifies each user from their first day and carries forward") {
    val ev = Tables.events(spark, sf)
    val allDays = ev.select(date_trunc("day", $"ts").as("day"))
      .distinct().collect().map(_.getAs[Timestamp]("day")).sorted(
        Ordering.by((t: Timestamp) => t.getTime))
    val firstDay = ev.groupBy($"user_id")
      .agg(date_trunc("day", min($"ts")).as("fd")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Timestamp]("fd")).toMap
    val rows = EventQueries.qGapFill(spark, sf).collect()
    // grid = per user, every corpus day from their first active day on
    val wantCells = firstDay.valuesIterator
      .map(fd => allDays.count(_.getTime >= fd.getTime).toLong).sum
    assert(rows.length.toLong === wantCells)
    // from the first day on, the carry is always defined
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("filled_value"))))
    // ground truth: per-user daily decimal sums, carried forward in order
    val daily = ev
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("day")) -> r.getAs[Double]("v"))
      .toMap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      var carried: Option[Double] = None
      rs.sortBy(_.getAs[Timestamp]("day").getTime).foreach { r =>
        daily.get((uid, r.getAs[Timestamp]("day"))).foreach(v => carried = Some(v))
        val got = Option(r.getAs[java.lang.Double]("filled_value")).map(_.doubleValue)
        assert(got === carried, s"user $uid day ${r.getAs[Timestamp]("day")}")
      }
    }
  }

  test("mode picks the highest bucket count with smallest-bucket tiebreak") {
    val got = EventQueries.qMode(spark, sf).collect()
    val counts = Tables.events(spark, sf)
      .groupBy($"event_type", floor($"value" / 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(got.length === counts.size)
    got.foreach { r =>
      val rs = counts(r.getAs[String]("event_type"))
      val best = rs.map(_.getAs[Long]("cnt")).max
      assert(r.getAs[Long]("mode_count") === best)
      val tied = rs.filter(_.getAs[Long]("cnt") == best).map(_.getAs[Long]("bucket"))
      assert(r.getAs[Long]("mode_bucket") === tied.min)
    }
  }

  test("rolling RANGE frame sums only days within the 3-day span") {
    val rows = EventQueries.qRollingRange(spark, sf).collect()
    assert(rows.nonEmpty)
    // ground truth per user from the daily cent totals
    val daily = Tables.events(spark, sf)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg((sum($"value".cast("decimal(18,2)")) * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("day").getTime) ->
        r.getAs[Long]("cents")).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val dayMs = r.getAs[Timestamp]("day").getTime
      val want = (0 to 2).flatMap(k => daily.get((u, dayMs - k * 86400000L))).sum
      assert(r.getAs[Double]("rolling_3d") === want / 100.0,
        s"user $u day ${r.getAs[Timestamp]("day")}")
    }
  }

  test("twap lies within the value range and differs from the plain mean") {
    val rows = EventQueries.qTwap(spark, sf).collect()
    assert(rows.nonEmpty)
    val bounds = Tables.events(spark, sf).groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi")).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("event_type"))
      val t = r.getAs[Double]("twap_r")
      assert(t >= lo - 1e-6 && t <= hi + 1e-6)
    }
  }

  test("deciles partition each type into 10 near-equal buckets covering all events") {
    val rows = EventQueries.qDeciles(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("decile")).toSet === (1L to 10L).toSet, t)
      val sizes = rs.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1, s"$t bucket sizes: ${sizes.toList}")
      // decile value ranges are non-overlapping and ordered
      val ordered = rs.sortBy(_.getAs[Long]("decile"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9, t)
        case _ =>
      }
    }
  }

  test("MAD outliers are exactly the events beyond 8 robust deviations") {
    val got = EventQueries.qMadOutliers(spark, sf).collect()
      .map(_.getAs[Long]("event_id")).toSet
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2)
      else {
        val (a, b) = (s(n / 2 - 1), s(n / 2))
        a + 0.5 * (b - a) // quantile_cont/percentile interpolation shape
      }
    }
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value").collect()
    val want = ev.groupBy(_.getAs[String]("event_type")).toSeq.flatMap { case (_, rs) =>
      val vals = rs.map(_.getAs[Double]("value")).toSeq
      val med = r6(median(vals))
      val mad = r6(median(vals.map(v => math.abs(v - med))))
      rs.filter(r => math.abs(r.getAs[Double]("value") - med) > 8 * mad)
        .map(_.getAs[Long]("event_id"))
    }.toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("cohort matrix covers every event and offset-0 holds each cohort's full size") {
    val rows = EventQueries.qCohort(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("week_offset") >= 0L))
    // the matrix partitions the event set
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total === Tables.events(spark, sf).count())
    // ground truth: per user first day -> cohort sizes
    val firstDay = Tables.events(spark, sf)
      .groupBy($"user_id").agg(min(to_date($"ts")).as("d")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[java.sql.Date]("d"))
    val cohortSize = firstDay.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // at offset 0 every user of the cohort is present (they were active
    // on their own first day by construction)
    rows.filter(_.getAs[Long]("week_offset") === 0L).foreach { r =>
      assert(r.getAs[Long]("n_users") ===
        cohortSize(r.getAs[java.sql.Date]("cohort_day")))
    }
  }

  test("streaks recover the islands a driver-side scan finds") {
    val got = EventQueries.qStreaks(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("longest_streak"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("n_active_days")))).toMap
    assert(got.nonEmpty)
    // ground truth: per user, sorted distinct epoch days → island lengths
    val days = Tables.events(spark, sf)
      .select($"user_id", datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
        .cast("long").as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = days.groupBy(_._1).map { case (u, rs) =>
      val ds = rs.map(_._2).sorted
      val lens = ds.foldLeft(List.empty[Long]) {
        case (h :: t, d0) if ds.contains(d0 - 1) => (h + 1) :: t
        case (acc, _) => 1L :: acc
      }
      u -> ((lens.max, lens.length.toLong, ds.length.toLong))
    }
    assert(got === want)
  }

  test("Gini matches a driver-side Lorenz computation exactly") {
    val r = EventQueries.qGini(spark, sf).collect().head
    val cents = Tables.events(spark, sf)
      .select($"user_id", $"value").collect()
      .map(x => (x.getLong(0), math.rint(x.getDouble(1) * 100).toLong))
      .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).sum) }.toSeq
    val asc = cents.sortBy(x => (x._2, x._1)).map(_._2)
    val n = asc.length.toLong
    val tot = asc.sum
    val weighted = asc.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val gini = 2.0 * weighted / (n * tot) - (n + 1.0) / n
    assert(r.getAs[Long]("n_users") === n)
    assert(r.getAs[Long]("total_cents") === tot)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-6)
    assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
    // n_users_80pct: fewest top users whose revenue reaches 80% of total
    val cum = asc.scanLeft(0L)(_ + _).tail
    val below20 = cum.count(_.toDouble < tot * 0.2)
    assert(r.getAs[Long]("n_users_80pct") === n - below20)
  }

  test("new vs returning partitions every daily active exactly") {
    val rows = EventQueries.qNewVsReturning(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ===
        r.getAs[Long]("n_new") + r.getAs[Long]("n_returning"))
    }
    // new users across all days == total distinct users
    val totalUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum === totalUsers)
  }

  test("session paths are ranked, bounded at 8 steps, and built from real types") {
    val rows = EventQueries.qSessionPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val types = Tables.events(spark, sf)
      .select($"event_type").distinct().as[String].collect().toSet
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (na, nb) = (a.getAs[Long]("n_sessions"), b.getAs[Long]("n_sessions"))
        assert(na > nb || (na == nb &&
          a.getAs[String]("path") < b.getAs[String]("path")))
      case _ =>
    }
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.nonEmpty && steps.length <= 8)
      steps.foreach(t => assert(types.contains(t)))
    }
  }

  test("audience overlap counts match driver-side user sets") {
    val got = EventQueries.qUserOverlap(spark, sf).collect()
    assert(got.nonEmpty)
    val tu = Tables.events(spark, sf)
      .select($"event_type", $"user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(ta < tb)
      val (sa, sb) = (byType(ta), byType(tb))
      assert(r.getAs[Long]("n_both") === (sa & sb).size.toLong)
      assert(r.getAs[Long]("n_a") === sa.size.toLong)
      assert(r.getAs[Long]("n_b") === sb.size.toLong)
      assert(math.abs(r.getAs[Double]("jaccard") -
        (sa & sb).size.toDouble / (sa ++ sb).size) < 1e-6)
    }
  }

  test("heap top-k per group equals the window spelling") {
    val got = EventQueries.qTopkHeapGroups(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("rnk"),
        r.getAs[Long]("event_id"))).toSet
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"event_id", $"value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case (r, i) => (t, i + 1L, r._2) }
    }.toSet
    assert(got === want)
  }

  test("RFM quartiles are balanced and the code composes the three digits") {
    val rows = EventQueries.qRfm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rq, fq, mq) = (r.getAs[Long]("r_q"), r.getAs[Long]("f_q"), r.getAs[Long]("m_q"))
      assert(rq >= 1 && rq <= 4 && fq >= 1 && fq <= 4 && mq >= 1 && mq <= 4)
      assert(r.getAs[Long]("rfm_code") === rq * 100 + fq * 10 + mq)
    }
    // ntile balance: quartile sizes differ by at most 1
    Seq("r_q", "f_q", "m_q").foreach { c =>
      val sizes = rows.groupBy(_.getAs[Long](c)).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"unbalanced $c")
    }
  }

  test("Benford digits cover all observations; shares sum to 1") {
    val rows = graft.queries.Relational.qBenford(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    assert(math.abs(rows.map(_.getAs[Double]("observed")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val d = r.getAs[String]("digit").toInt
      assert(d >= 1 && d <= 9)
      assert(math.abs(r.getAs[Double]("benford") -
        math.log10(1.0 + 1.0 / d)) < 1e-5)
    }
  }

  test("rank-sum U matches a driver-side computation from tie-broken ranks") {
    val got = graft.queries.Relational.qRankSum(spark, sf).collect()
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"user_id", $"value", $"event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val ranked = rows.filter(_._1 == t).sortBy(r => (r._3, r._4)).zipWithIndex
      val r0 = ranked.filter { case ((_, u, _, _), _) =>
        graft.functions.Md5Bits.hash60(s"ab:$u") % 2 == 0
      }.map(_._2.toLong + 1L).sum
      val n0 = g.getAs[Long]("n0"); val n1 = g.getAs[Long]("n1")
      assert(g.getAs[Long]("u0") === r0 - n0 * (n0 + 1) / 2)
      val z = (g.getAs[Long]("u0").toDouble - n0 * n1 / 2.0) /
        math.sqrt(n0.toDouble * n1 * (n0 + n1 + 1) / 12.0)
      assert(math.abs(g.getAs[Double]("z") - z) < 1e-5)
    }
  }

  test("snapshot diff partitions all keys and agrees with the CDC merge") {
    val got = graft.queries.Relational.qSnapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("change_type") -> r.getAs[Long]("n")).toMap
    val base = Tables.customer(spark, sf).count()
    val applied = graft.queries.Relational.qCdcDelete(spark, sf).count()
    // every base key is removed/changed/unchanged; every applied key is
    // added/changed/unchanged
    assert(got.getOrElse("removed", 0L) + got.getOrElse("changed", 0L) +
      got.getOrElse("unchanged", 0L) === base)
    assert(got.getOrElse("added", 0L) + got.getOrElse("changed", 0L) +
      got.getOrElse("unchanged", 0L) === applied)
    assert(got.getOrElse("changed", 0L) > 0L && got.getOrElse("removed", 0L) > 0L)
  }

  test("activity bitmap round-trips the day set and counts it") {
    val got = EventQueries.qActivityBitmap(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("day_mask"), r.getAs[Long]("active_days")))).toMap
    val days = Tables.events(spark, sf)
      .select($"user_id", datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
        .cast("long")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val d0 = days.map(_._2).min
    days.groupBy(_._1).foreach { case (u, rs) =>
      val want = rs.map(_._2 - d0).toSet
      val (mask, n) = got(u)
      assert(n === want.size.toLong)
      assert((0 to 63).filter(i => (mask & (1L << i)) != 0).map(_.toLong).toSet
        === want)
    }
  }

  test("skyline equals the brute-force non-dominated set") {
    val got = graft.queries.Relational.qSkyline(spark, sf).collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val rows = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice",
        unix_micros($"o_orderdate".cast("timestamp"))).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = rows.filter { b =>
      !rows.exists(a => a._2 > b._2 && a._3 > b._3)
    }.map(_._1).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < rows.length / 10) // frontier is small
  }

  test("running distinct: every fact lands once, curve ends at total users") {
    val rows = EventQueries.qRunningDistinct(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    assert(rows.nonEmpty)
    // new_users sums to the cumulative tail, and the curve is monotone
    assert(rows.map(_.getAs[Long]("new_users")).sum ===
      rows.last.getAs[Long]("cum_users"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("cum_users") ===
          a.getAs[Long]("cum_users") + b.getAs[Long]("new_users"))
      case _ =>
    }
    val totalUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(rows.last.getAs[Long]("cum_users") === totalUsers)
  }

  test("SCD2 fact join attributes every line item to exactly one version") {
    val got = graft.queries.Relational.qScd2Join(spark, sf).collect()
    assert(got.nonEmpty)
    // conservation: version attribution never drops or duplicates facts
    val totalItems = Tables.lineitem(spark, sf).count()
    assert(got.map(_.getAs[Long]("n_items")).sum === totalItems)
  }

  test("table checksum is partition-order-invariant and detects a single edit") {
    val a = graft.queries.Relational.qTableChecksum(spark, sf).collect().head
    // recompute over a differently-partitioned copy of the same rows
    val reshuffled = Tables.orders(spark, sf).repartition(13)
    reshuffled.createOrReplaceTempView("orders_reshuffled")
    val rowStr = concat_ws("|",
      $"o_orderkey", $"o_custkey", $"o_orderstatus",
      $"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)),
      datediff($"o_orderdate", lit("1970-01-01").cast("date")).cast("long"),
      $"o_orderpriority")
    val b = reshuffled
      .select(graft.functions.Md5Bits.hash60(rowStr).as("h"))
      .agg(expr("bit_xor(h)").as("checksum"), count(lit(1)).as("n_rows"))
      .collect().head
    assert(a.getAs[Long]("checksum") === b.getAs[Long]("checksum"))
    assert(a.getAs[Long]("n_rows") === b.getAs[Long]("n_rows"))
    // one flipped attribute changes the fingerprint
    val edited = Tables.orders(spark, sf)
      .withColumn("o_custkey",
        when($"o_orderkey" === 1L, $"o_custkey" + 1).otherwise($"o_custkey"))
      .select(graft.functions.Md5Bits.hash60(rowStr).as("h"))
      .agg(expr("bit_xor(h)").as("checksum")).collect().head
    assert(edited.getAs[Long]("checksum") !== a.getAs[Long]("checksum"))
  }

  test("attribution conserves every purchase's revenue exactly") {
    val got = EventQueries.qAttribution(spark, sf).collect()
    assert(got.nonEmpty)
    // total attributed == total revenue of purchases that HAVE >=1 touch
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"user_id", unix_micros($"ts"), $"event_id", $"value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val clicks = ev.filter(_._1 == "click")
    val touched = ev.filter(_._1 == "purchase").filter { case (_, u, ts, _, _) =>
      clicks.exists(c => c._2 == u && c._3 <= ts && c._3 >= ts - 3600000000L)
    }
    val wantMicros = touched.map(p => math.rint(p._5 * 100).toLong * 10000L).sum
    val gotMicros = got.map(r =>
      math.rint(r.getAs[Double]("attributed") * 1000000.0).toLong).sum
    assert(gotMicros === wantMicros) // penny allocation leaks nothing
  }

  test("CDC apply with tombstones matches a driver-side merge") {
    val got = graft.queries.Relational.qCdcDelete(spark, sf).collect()
      .map(r => r.getAs[Long]("custkey") -> r.getAs[Double]("bal")).toMap
    val base = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val feed = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_totalprice", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        graft.functions.Md5Bits.hash60(s"cdc:${r.getLong(2)}") % 10 == 0))
    val want = scala.collection.mutable.Map.empty[Long, Double] ++= base
    feed.groupBy(_._1).foreach { case (k, chgs) =>
      val (_, bal, _, isDel) = chgs.maxBy(_._3)
      if (isDel) want.remove(k) else want(k) = bal
    }
    assert(got === want.toMap)
    // the feed genuinely exercises all three verbs
    assert(feed.exists(_._4) && feed.exists(!_._4))
    assert(got.size < base.size + feed.map(_._1).distinct.size)
  }

  test("Welch t matches a driver-side recomputation from raw values") {
    val got = EventQueries.qAbTest(spark, sf).collect()
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"user_id", $"value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val (a0, a1) = rows.filter(_._1 == t).partition { case (_, u, _) =>
        graft.functions.Md5Bits.hash60(s"ab:$u") % 2 == 0
      }
      def cents(xs: Array[(String, Long, Double)]) =
        xs.map(x => math.rint(x._3 * 100).toLong)
      val (c0, c1) = (cents(a0), cents(a1))
      def meanVar(c: Array[Long]) = {
        val n = c.length.toDouble
        val m = c.sum / 100.0 / n
        val q = c.map(x => x * x).sum / 10000.0
        (n, m, (n * q - (c.sum / 100.0) * (c.sum / 100.0)) / (n * (n - 1)))
      }
      val (n0, m0, v0) = meanVar(c0); val (n1, m1, v1) = meanVar(c1)
      assert(g.getAs[Long]("n0") === c0.length.toLong)
      assert(g.getAs[Long]("n1") === c1.length.toLong)
      assert(math.abs(g.getAs[Double]("mean0") - m0) < 1e-5)
      assert(math.abs(g.getAs[Double]("welch_t") -
        (m1 - m0) / math.sqrt(v0 / n0 + v1 / n1)) < 1e-5)
    }
  }

  test("dyadic EWMA equals the driver-side weighted tail and bounds hold") {
    val got = EventQueries.qEwma(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma10")))).toMap
    assert(got.nonEmpty)
    val byUser = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3)).map(r => math.rint(r._4 * 100).toLong)
      val tail = ordered.takeRight(10).reverse // newest first
      val wsum = tail.zipWithIndex.map { case (c, k) => c * (1L << (9 - k)) }.sum
      val norm = (1024L - (1L << (10 - tail.length))) * 100L
      val (n, e) = got(u)
      assert(n === ordered.length.toLong)
      assert(math.abs(e - wsum.toDouble / norm) < 1e-6)
      assert(e >= tail.map(_ / 100.0).min - 1e-9 && e <= tail.map(_ / 100.0).max + 1e-9)
    }
  }

  test("concurrency peaks match a driver-side global sweep sliced per day") {
    val got = EventQueries.qConcurrency(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("peak")).toMap
    assert(got.nonEmpty)
    // brute force: one GLOBAL sweep (micros precision), track the running
    // count, record the max seen within each calendar day — including the
    // carry across midnight that the distributed plan reconstructs per day
    val sess = EventQueries.qSessionize(spark, sf)
      .select($"user_id", $"session_no",
        unix_micros($"session_start").as("st"), unix_micros($"session_end").as("en"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val events = sess.flatMap { case (st, en) => Seq((st, 1), (en, -1)) }
      .sortBy { case (t, dl) => (t, dl) } // ends (−1) release before starts at a tie
    var cur = 0L
    val peakByDay = scala.collection.mutable.Map.empty[String, Long]
    def dayOf(us: Long): String =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
        .atZone(java.time.ZoneId.systemDefault()).toLocalDate.toString
    // seed each day's peak with the concurrency carried into it
    val boundaries = events.map(e => dayOf(e._1)).distinct
    events.foreach { case (t, dl) =>
      val day = dayOf(t)
      if (!peakByDay.contains(day)) peakByDay(day) = cur // carry at day entry
      cur += dl
      peakByDay(day) = math.max(peakByDay(day), cur)
    }
    assert(boundaries.forall(d => got(d) === peakByDay(d)))
  }

  test("transition probabilities sum to 1 within each from_type") {
    val rows = EventQueries.qTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val pSum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-4) // rounding each p to 6dp
      assert(rs.map(_.getAs[String]("to_type")).distinct.length === rs.length)
    }
  }

  test("seasonal deviation is revenue minus that day-of-week's mean") {
    val rows = EventQueries.qSeasonalDow(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("dow")).foreach { case (_, rs) =>
      val mean = rs.map(_.getAs[Double]("rev")).sum / rs.length
      rs.foreach { r =>
        assert(math.abs(r.getAs[Double]("baseline") - mean) < 1e-3)
        assert(math.abs(r.getAs[Double]("deviation") -
          (r.getAs[Double]("rev") - r.getAs[Double]("baseline"))) < 1e-6)
      }
    }
  }

  test("value ranks: pr spans [0,1], cd ends at 1, both monotone in value") {
    val rows = EventQueries.qValueRanks(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Double]("value"), r.getAs[Long]("event_id")))
      assert(sorted.head.getAs[Double]("pr") === 0.0)
      assert(math.abs(sorted.last.getAs[Double]("pr") - 1.0) < 1e-6)
      assert(math.abs(sorted.last.getAs[Double]("cd") - 1.0) < 1e-9)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("pr") <= b.getAs[Double]("pr"))
          assert(a.getAs[Double]("cd") <= b.getAs[Double]("cd"))
        case _ =>
      }
    }
  }

  test("z-score outliers are exactly the events beyond 3 sigma of their type") {
    val got = EventQueries.qOutliers(spark, sf).collect()
    assert(got.nonEmpty) // the fixture's heavy-tailed values guarantee hits
    got.foreach(r => assert(math.abs(r.getAs[Double]("z_r")) > 3.0 - 1e-6))
    // ground truth per type from exact driver-side moments over cents
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value").collect()
    val want = ev.groupBy(_.getAs[String]("event_type")).toSeq.flatMap { case (_, rs) =>
      val cents = rs.map(r => math.rint(r.getAs[Double]("value") * 100).toLong)
      val n = cents.length.toDouble
      val mean = cents.sum / 100.0 / n
      val variance = cents.map(c => c * c).sum / 10000.0 / n - mean * mean
      rs.filter { r =>
        math.abs((r.getAs[Double]("value") - mean) / math.sqrt(variance)) > 3.0
      }.map(_.getAs[Long]("event_id"))
    }.toSet
    assert(got.map(_.getAs[Long]("event_id")).toSet === want)
  }
}
