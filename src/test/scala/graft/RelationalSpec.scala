package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Tuning.withClusterDefaults(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() === 1)
  }

  test("every registered query runs non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("every query with an oracle has matching entry") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach { k =>
      assert(qs.contains(k), s"oracle $k has no query")
    }
  }

  test("q3 top-1 is a single deterministic row") {
    val rows = queries.Relational.q3JoinTop1(spark, sf).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Double]("total_rev") > 0.0)
  }

  test("q_topk is sorted descending") {
    val prices = queries.Relational.qTopK(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("wordcount total tokens equals flat token count") {
    import org.apache.spark.sql.functions._
    val wc = queries.Relational.qWordCount(spark, sf)
    val totalFromGroups = wc.agg(sum("cnt")).head().getLong(0)
    val flat = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(totalFromGroups === flat)
  }

  test("union merge row count = sum of branch counts") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O").count()
    val e = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(queries.Relational.qUnionMerge(spark, sf).count() === o + e)
  }

  test("upsert merge applies each change exactly once, drops nothing") {
    import org.apache.spark.sql.functions._
    // Post-merge row universe == base keys (changes only overwrite), and
    // the total price delta == 100 per changed key, exactly.
    val base = Tables.orders(spark, sf)
    val nKeys = base.select(col("o_orderkey")).distinct().count()
    val nChanged = base.filter(col("o_orderkey") % 10 === 0).count()
    val merged = queries.Relational.qUpsertMerge(spark, sf)
    assert(merged.agg(sum("n_orders")).head().getLong(0) === nKeys)
    val mergedTotal = merged.agg(sum("total_price")).head().getDouble(0)
    val baseTotal = base
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(mergedTotal - (baseTotal + 100.0 * nChanged)) < 1e-6)
  }

  test("z-value interleave is a bijection on 16-bit pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deinterleave(zValue(x, y)) == (x, y) for a deterministic sample —
    // the property file-level min/max pruning on either dimension needs.
    val xs = (0 until 64).map(i => (i * 1021L % 65536, i * 2039L % 65536))
    val df = xs.toDF("x", "y")
      .withColumn("z", queries.Relational.zValue(col("x"), col("y")))
    val back = df.select(col("x"), col("y"),
      (0 until 16).map(i => shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)) * lit(1L << i))
        .reduce(_ + _).as("x2"),
      (0 until 16).map(i => shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)) * lit(1L << i))
        .reduce(_ + _).as("y2"))
    assert(back.filter(col("x") =!= col("x2") || col("y") =!= col("y2")).count() === 0)
  }

  test("grouping sets emit every lattice combination with correct flags") {
    import org.apache.spark.sql.functions._
    val rows = queries.Relational.qGroupingSets(spark, sf)
    // the grand-total row: both flags set, count = full table
    val grand = rows.filter(col("g_status") === 1 && col("g_prio") === 1).collect()
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n") === Tables.orders(spark, sf).count())
    // per-set totals all equal the table count
    Seq((0, 0), (0, 1), (1, 0)).foreach { case (gs, gp) =>
      val total = rows.filter(col("g_status") === gs && col("g_prio") === gp)
        .agg(sum(col("n"))).collect()(0).getLong(0)
      assert(total === grand(0).getAs[Long]("n"), s"set ($gs,$gp)")
    }
  }

  test("exact-moment corr is in [-1,1] and covar matches Spark's builtin closely") {
    import org.apache.spark.sql.functions._
    val rows = queries.Relational.qCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("corr_r")) <= 1.0 + 1e-9)
    }
    // cross-check one group against the streaming builtin (float noise only)
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("c")).toMap
    rows.foreach { r =>
      val mine = r.getAs[Double]("corr_r")
      assert(math.abs(mine - builtin(r.getAs[String]("l_returnflag"))) < 1e-6)
    }
  }

  test("string-agg rosters are sorted, complete, and deterministic") {
    val rows = queries.Relational.qStringAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[String]("nations").split(",").toSeq
      assert(parts.length.toLong === r.getAs[Long]("n_nations"))
      assert(parts === parts.sorted)
    }
  }

  test("full-outer reconciliation keeps days seen by either side only") {
    import org.apache.spark.sql.functions._
    val rows = queries.Relational.qFullOuter(spark, sf)
    val orderDays = Tables.orders(spark, sf)
      .select(date_trunc("day", col("o_orderdate")).as("day")).distinct().count()
    val eventDays = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).as("day")).distinct().count()
    val bothDays = rows.count()
    // |A ∪ B| bounds; the fixture ranges are disjoint so the union is a sum
    assert(bothDays >= math.max(orderDays, eventDays))
    assert(bothDays <= orderDays + eventDays)
    // order-only days carry null event counts and vice versa
    assert(rows.filter(col("n_events").isNull).count() > 0)
    assert(rows.filter(col("n_orders").isNull).count() > 0)
    assert(rows.filter(col("n_orders").isNull && col("n_events").isNull).count() === 0)
  }

  test("unpivot melts the per-type stats into metric rows, values preserved") {
    import org.apache.spark.sql.functions._
    val long = queries.Relational.qUnpivot(spark, sf)
    val types = Tables.events(spark, sf).select(col("event_type")).distinct().count()
    assert(long.count() === types * 4)
    // melting then re-pivoting restores the wide n_events values
    val back = long.filter(col("metric") === "n_events")
      .select(col("event_type"), col("metric_value"))
    val wide = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("metric_value"))
    assert(back.exceptAll(wide).count() === 0)
  }

  test("dq report has a row per check and the fixture is clean") {
    val rows = queries.Relational.qDqReport(spark, sf).collect()
    assert(rows.map(_.getAs[String]("check_name")).toSet ===
      Set("orphan_lineitems", "duplicate_order_keys",
        "nonpositive_quantity", "bad_order_status"))
    rows.foreach(r => assert(r.getAs[Long]("n_violations") === 0L))
  }

  test("scd2 intervals chain per customer with exactly one current version") {
    import org.apache.spark.sql.functions._
    val rows = queries.Relational.qScd2(spark, sf)
      .orderBy(col("o_custkey"), col("version")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (ck, vs) =>
      // versions are 1..n with no holes
      assert(vs.map(_.getAs[Long]("version")).toSeq === (1L to vs.length).toSeq, s"cust $ck")
      // exactly one open (current) interval, and it is the last version
      val current = vs.filter(_.getAs[Boolean]("is_current"))
      assert(current.length === 1 && current.head.getAs[Long]("version") === vs.length.toLong)
      // closed intervals chain: valid_to == next version's valid_from
      vs.sliding(2).foreach {
        case Array(a, b) =>
          // generic compare: parquet NTZ timestamps surface as LocalDateTime
          assert(a.getAs[Any]("valid_to") === b.getAs[Any]("valid_from"),
            s"cust $ck gap")
        case _ =>
      }
    }
  }

  test("time-travel snapshots census exactly the customers whose history has begun") {
    import org.apache.spark.sql.functions._
    val rows = queries.Relational.qTimeTravel(spark, sf).collect()
    assert(rows.nonEmpty)
    val perSnap = rows.groupBy(_.getAs[java.sql.Date]("snap_date").toString)
      .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
    (1996 to 2001).foreach { y =>
      val snap = s"$y-01-01"
      // exactly one version is current per customer at any instant, so the
      // snapshot total equals the customers with any version by then
      val want = Tables.orders(spark, sf)
        .filter(col("o_orderdate") <= lit(snap).cast("timestamp"))
        .select(countDistinct(col("o_custkey"))).head().getLong(0)
      assert(perSnap.getOrElse(snap, 0L) === want, s"snapshot $snap")
    }
  }

  test("exact-moment regression matches Spark's builtin regr_slope closely") {
    import org.apache.spark.sql.functions._
    val rows = queries.Relational.qRegression(spark, sf).collect()
    assert(rows.nonEmpty)
    val builtin = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(expr("regr_slope(o_totalprice, datediff(o_orderdate, date'1992-01-01'))").as("b"),
        expr("regr_intercept(o_totalprice, datediff(o_orderdate, date'1992-01-01'))").as("a"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("b"), r.getAs[Double]("a"))).toMap
    rows.foreach { r =>
      val (b, a) = builtin(r.getAs[String]("o_orderpriority"))
      assert(math.abs(r.getAs[Double]("slope_r") - b) < 1e-4)
      assert(math.abs(r.getAs[Double]("intercept_r") - a) < 1e-2)
      val r2 = r.getAs[Double]("r2_r")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    }
  }

  test("incremental MV refresh merges base+delta states to the full recompute") {
    import org.apache.spark.sql.functions._
    val got = queries.Relational.qMvRefresh(spark, sf)
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spent"))
    // exact equality — decimal partial states merge losslessly
    assert(got.exceptAll(full).count() === 0)
    assert(full.exceptAll(got).count() === 0)
    assert(got.count() > 0)
  }
}
