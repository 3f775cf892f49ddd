package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder
import graft.queries.LakehouseQueries

class LakehouseSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ── Z-order expression ─────────────────────────────────────────────────

  test("interleave matches a naive per-bit reference on sampled inputs") {
    def naive(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }
    for (x <- Seq(0L, 1L, 2L, 3L, 511L, 512L, 1023L, 77L);
         y <- Seq(0L, 1L, 3L, 64L, 1000L, 1023L))
      assert(ZOrder.interleave(x, y, 10) === naive(x, y, 10), s"($x,$y)")
    // known fixed points: unit steps in x/y move z by 1/2; all-ones fills
    assert(ZOrder.interleave(0, 0, 10) === 0L)
    assert(ZOrder.interleave(1, 0, 10) === 1L)
    assert(ZOrder.interleave(0, 1, 10) === 2L)
    assert(ZOrder.interleave(1023, 1023, 10) === (1L << 20) - 1)
    // out-of-range inputs wrap to the low bits
    assert(ZOrder.interleave(1024, 0, 10) === 0L)
  }

  test("graft_zorder is SQL-callable, codegen'd, and null-safe") {
    val out = spark.sql("SELECT graft_zorder(5, 3, 10) AS z").head().getLong(0)
    assert(out === ZOrder.interleave(5, 3, 10))
    assert(spark.sql("SELECT graft_zorder(CAST(NULL AS INT), 3, 10) AS z")
      .head().isNullAt(0))
    // non-literal bits must raise the descriptive litInt error
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zorder(1, 2, l_linenumber) FROM " +
        s"parquet.`$sf/lineitem.parquet` LIMIT 1").collect()
    }
    assert(e.getMessage.contains("graft_zorder"))
  }

  test("z-curve buckets are locality cells: every span <= 1/8 of the domain") {
    val df = LakehouseQueries.qZorder(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("x_span") <= 127,
        s"bucket ${r.getAs[Long]("bucket")} x_span ${r.getAs[Long]("x_span")}")
      assert(r.getAs[Long]("y_span") <= 127,
        s"bucket ${r.getAs[Long]("bucket")} y_span ${r.getAs[Long]("y_span")}")
    }
    // coverage: the buckets partition all lineitem rows
    assert(rows.map(_.getAs[Long]("n_rows")).sum ===
      Tables.lineitem(spark, sf).count())
  }

  test("z-ordered layout bounds BOTH dims per file; key-sorted only one") {
    // full 128×128 grid scaled onto the 1024 domain — a single-column
    // sort's files each span the entire second dimension, while z-range
    // files are curve octants whose min/max box is bounded in BOTH dims
    // (the parquet zone-map property that skips files on either filter)
    val keys = spark.range(1L << 14).select(
      (($"id" / 128).cast("long") * 8).as("x"),
      (pmod($"id", lit(128)) * 8).cast("long").as("y"))
    val files = 8
    def perFileSpans(df: org.apache.spark.sql.DataFrame, dir: String): Seq[(Long, Long)] = {
      df.write.mode("overwrite").parquet(dir)
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(max($"x") - min($"x"), max($"y") - min($"y")).head()
          (r.getLong(0), r.getLong(1))
        }
    }
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // z layout: files aligned to curve octants (top 3 z bits), the
    // deterministic form of what repartitionByRange(z) approximates
    val zDir = s"$base/z"
    keys.withColumn("z", ZOrder.zorder($"x", $"y", 10))
      .withColumn("octant", shiftright($"z", 17))
      .sortWithinPartitions($"octant", $"z")
      .write.partitionBy("octant").mode("overwrite").parquet(zDir)
    val zSpans = new java.io.File(zDir).listFiles()
      .filter(_.getName.startsWith("octant=")).toSeq.map { dir =>
        val r = spark.read.parquet(dir.getAbsolutePath)
          .agg(max($"x") - min($"x"), max($"y") - min($"y")).head()
        (r.getLong(0), r.getLong(1))
      }
    val xSpans = perFileSpans(
      keys.repartitionByRange(files, $"x").sortWithinPartitions($"x"),
      s"$base/x")
    assert(zSpans.size === files && xSpans.size === files)
    // every z octant's min/max box is bounded in BOTH dims: the top 3
    // bits pin y's half+quarter and x's half → x_span ≤ 512, y_span ≤ 256
    zSpans.foreach { case (a, b) =>
      assert(a <= 512 && b <= 256, s"z octant span ($a,$b) too wide")
    }
    // a y = const filter reads the files whose y zone map contains it:
    // expected file fraction = avg (y_span+1)/domain. Single-key layout
    // never skips (~1.0); z-order reads a strict minority.
    def yFrac(s: Seq[(Long, Long)]): Double =
      s.map { case (_, b) => (b + 1.0) / 1024.0 }.sum / s.size
    val (zY, xY) = (yFrac(zSpans), yFrac(xSpans))
    assert(xY > 0.9, s"x-sorted files must span ~all of y, got $xY")
    assert(zY < 0.5 * xY, s"z-order y-fraction $zY must undercut $xY by >2x")
  }

  test("writeZOrdered round-trips the data with the original schema") {
    val keys = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("graft_zw").toString
    graft.sources.Sources.writeZOrdered(keys, dir, "l_partkey", "l_suppkey",
      files = 4)
    val back = spark.read.parquet(dir)
    assert(back.schema.fieldNames.toSeq ===
      Seq("l_partkey", "l_suppkey", "l_quantity"), "the z key must not leak")
    assert(back.count() === keys.count())
    assert(back.except(keys).isEmpty && keys.except(back).isEmpty)
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 4)
  }

  // ── MERGE / upsert ─────────────────────────────────────────────────────

  test("merge partitions keys into update/keep/insert with exact balances") {
    val out = LakehouseQueries.qMergeUpsert(spark, sf).cache()
    val customers = Tables.customer(spark, sf)
      .select($"c_custkey").as[Long].collect().toSet
    val byAction = out.groupBy($"action").agg(count(lit(1))).as[(String, Long)]
      .collect().toMap
    assert(byAction.keySet.subsetOf(Set("update", "keep", "insert")))
    assert(byAction.getOrElse("insert", 0L) > 0, "remapped keys must insert")
    assert(byAction.getOrElse("update", 0L) > 0)
    // inserts are exactly the remapped (absent) source keys
    out.filter($"action" === "insert").select($"custkey").as[Long].collect()
      .foreach(k => assert(!customers.contains(k), s"insert key $k exists"))
    // keep + update == full target census
    assert(byAction.getOrElse("keep", 0L) + byAction.getOrElse("update", 0L)
      === customers.size.toLong)
    // one updated key: balance == old + delta, recomputed independently
    val row = out.filter($"action" === "update").orderBy($"custkey").head()
    val k = row.getAs[Long]("custkey")
    val old = Tables.customer(spark, sf).filter($"c_custkey" === k)
      .select(expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .as[Long].head()
    val delta = Tables.orders(spark, sf)
      .filter($"o_custkey" === k && pmod($"o_custkey", lit(3)) =!= 1)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .as[Long].collect().sum
    assert(row.getAs[Long]("new_bal_cents") === old + delta)
    out.unpersist()
  }

  // ── Incremental aggregate maintenance ──────────────────────────────────

  test("partial-merge totals equal the direct single-pass aggregate") {
    val merged = LakehouseQueries.qIncrAgg(spark, sf)
      .select($"event_type", $"total_cents", $"n_events", $"max_cents")
    val direct = Tables.events(spark, sf)
      .select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy($"event_type")
      .agg(sum($"cents").as("total_cents"), count(lit(1)).as("n_events"),
        max($"cents").as("max_cents"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty,
      "merged partials must be lossless")
    // day-partial granularity is real: more partials than types
    val parts = LakehouseQueries.qIncrAgg(spark, sf)
      .agg(sum($"n_day_partials")).head().getLong(0)
    val types = direct.count()
    assert(parts > types, s"expected >$types day-level partials, got $parts")
  }

  // ── Referential integrity ──────────────────────────────────────────────

  test("FK audit counters match driver-side set arithmetic") {
    val r = LakehouseQueries.qRefIntegrity(spark, sf).head()
    val li = Tables.lineitem(spark, sf).select($"l_orderkey").as[Long].collect()
    val ok = Tables.orders(spark, sf).select($"o_orderkey").as[Long].collect().toSet
    val oc = Tables.orders(spark, sf).select($"o_custkey").as[Long].collect()
    val ck = Tables.customer(spark, sf).select($"c_custkey").as[Long].collect().toSet
    val cn = Tables.customer(spark, sf).select($"c_nationkey").as[Int].collect()
    val nk = Tables.nation(spark, sf).select($"n_nationkey").as[Int].collect().toSet
    assert(r.getAs[Long]("orphan_lineitems") === li.count(!ok.contains(_)).toLong)
    assert(r.getAs[Long]("orphan_orders") === oc.count(!ck.contains(_)).toLong)
    assert(r.getAs[Long]("orphan_customers") === cn.count(!nk.contains(_)).toLong)
    val liSet = li.toSet
    assert(r.getAs[Long]("childless_orders") === ok.count(!liSet.contains(_)).toLong)
  }

  // ── SCD2 history build ─────────────────────────────────────────────────

  test("attribute history versions tile each user's timeline contiguously") {
    val rows = LakehouseQueries.qAttrHistory(spark, sf).collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version_no"))
      // contiguous version numbers from 1
      assert(sorted.map(_.getAs[Long]("version_no")).toSeq ===
        (1L to sorted.length).toSeq, s"user $u")
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_.getAs[Boolean]("is_current")) === 1, s"user $u")
      assert(sorted.last.getAs[Boolean]("is_current"), s"user $u")
      // each version's valid_to equals the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ===
            b.getAs[java.sql.Timestamp]("valid_from"), s"gap for user $u")
          // and consecutive versions really changed the attribute
          assert(a.getAs[String]("event_type") !== b.getAs[String]("event_type"),
            s"non-change version for user $u")
        case _ =>
      }
    }
    // history is change-sized: strictly fewer rows than events
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.values.map(_.length).sum < nEvents)
  }

  // ── Compaction planner ─────────────────────────────────────────────────

  test("compaction bins partition the manifest in order with full coverage") {
    val bins = LakehouseQueries.qCompactionPlan(spark, sf).collect()
      .sortBy(_.getAs[Long]("bin"))
    val manifest = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("month", $"l_shipdate"), $"l_returnflag", $"l_linestatus")
      .count().collect()
    assert(bins.map(_.getAs[Long]("n_files")).sum === manifest.length.toLong,
      "every manifest file lands in exactly one bin")
    assert(bins.map(_.getAs[Long]("bin_bytes")).sum ===
      manifest.map(_.getAs[Long]("count") * 100L).sum)
    // bins are dense 0..max and order-preserving in partition order
    assert(bins.map(_.getAs[Long]("bin")).toSeq ===
      (0L until bins.length).toSeq)
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(!a.getAs[java.sql.Timestamp]("last_month")
          .after(b.getAs[java.sql.Timestamp]("first_month")),
          "bins must not interleave partition order")
      case _ =>
    }
  }

  // ── Incremental join-view maintenance ──────────────────────────────────

  test("delta join algebra equals the direct full join, corner included") {
    val got = LakehouseQueries.qIncrJoin(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = orders.flatMap { o =>
      cust.get(o.getLong(1)).map { nat =>
        (nat, o.getLong(2),
          if (o.getLong(0) % 10 == 0 || o.getLong(1) % 20 == 0) 1L else 0L)
      }
    }.groupBy(_._1).view.mapValues(v =>
      (v.length.toLong, v.map(_._2).sum, v.map(_._3).sum)).toMap
    assert(got === direct,
      "three-way delta decomposition must cover every row exactly once")
    // and deltas actually contributed
    assert(got.values.map(_._3).sum > 0)
  }

  // ── Skew diagnostics ───────────────────────────────────────────────────

  test("skew metrics equal a driver-side recompute of the key histogram") {
    val r = LakehouseQueries.qSkewMetrics(spark, sf).head()
    val counts = Tables.lineitem(spark, sf).groupBy($"l_partkey").count()
      .as[(Long, Long)].collect()
    val nRows = counts.map(_._2).sum
    assert(r.getAs[Long]("n_keys") === counts.length.toLong)
    assert(r.getAs[Long]("n_rows") === nRows)
    assert(r.getAs[Long]("max_cnt") === counts.map(_._2).max)
    val top10 = counts.sortBy(c => (-c._2, c._1)).take(10).map(_._2).sum
    assert(r.getAs[Double]("top10_share_r") ===
      BigDecimal(top10.toDouble / nRows)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // straggler factors are ≥ 1 by construction
    assert(r.getAs[Double]("key_skew_factor_r") >= 1.0)
    assert(r.getAs[Double]("bucket_skew_factor_r") >= 1.0)
  }

  // ── Zone-map pruning ───────────────────────────────────────────────────

  test("zone pruning is sound: skipped fragments contain zero matching rows") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_shipdate", $"l_returnflag", $"l_linestatus",
        $"l_quantity", $"l_extendedprice").collect()
    def frag(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp](0).toLocalDateTime.getYear,
        r.getAs[java.sql.Timestamp](0).toLocalDateTime.getMonthValue,
        r.getString(1), r.getString(2))
    val byFrag = li.groupBy(frag)
    val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
      "qty_gt_45" -> (r => r.getDouble(3) > 45.0),
      "qty_le_5" -> (r => r.getDouble(3) <= 5.0),
      "price_lt_2000" -> (r => r.getDouble(4) < 2000.0),
      "price_ge_100000" -> (r => r.getDouble(4) >= 100000.0),
      "qty_20_to_25" -> (r => r.getDouble(3) >= 20.0 && r.getDouble(3) <= 25.0))
    val got = LakehouseQueries.qZonePruning(spark, sf).collect()
      .map(r => r.getAs[String]("predicate") -> r).toMap
    assert(got.keySet === preds.keySet)
    preds.foreach { case (name, hit) =>
      val r = got(name)
      assert(r.getAs[Long]("n_files") === byFrag.size.toLong)
      // soundness: a fragment may be counted skipped ONLY if no row in it
      // satisfies the predicate — rows_skipped rows produce zero hits
      val skippableRows = byFrag.values.filter(_.forall(!hit(_)))
      assert(r.getAs[Long]("files_skipped") <= skippableRows.size.toLong,
        s"$name claimed more skips than truly empty fragments")
      // min/max screening is EXACT for one-sided predicates (if the
      // extremum passes, the row holding it is a hit) but only sound
      // for the interval predicate (a wide [min,max] can straddle
      // [20,25] with no row inside)
      if (name != "qty_20_to_25") {
        assert(r.getAs[Long]("files_skipped") === skippableRows.size.toLong,
          s"$name under-skipped vs the exact min/max screen")
        assert(r.getAs[Long]("rows_skipped") ===
          skippableRows.map(_.length.toLong).sum, name)
      }
    }
  }
}
