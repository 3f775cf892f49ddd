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

  test("salt spreads a heavy-hitter key across buckets") {
    // 10k rows of ONE key — the pathological reducer-pinning shape
    val left = spark.range(10000).select(lit(42L).as("k"), $"id")
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(8)))
    val buckets = salted.groupBy($"_salt").count().as[(Int, Long)].collect()
    assert(buckets.length === 8, s"expected 8 salt buckets, got $buckets")
    // no bucket should carry more than ~2x its fair share
    assert(buckets.map(_._2).max < 2500)
  }

  test("approx distinct is within 5% of exact per group") {
    val approx = graft.queries.Relational.qApproxDistinct(spark, sf)
      .as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n <= 0.05,
        s"group $k: approx ${approx(k)} vs exact $n")
    }
  }
}
