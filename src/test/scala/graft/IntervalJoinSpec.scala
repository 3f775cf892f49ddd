package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("overlap join equals the naive inequality join, each pair once") {
    // intervals engineered to span multiple buckets and share boundaries
    val left = Seq(
      (1L, 100L, ts(0), ts(90)),    // 3 buckets at 30-min grid
      (1L, 101L, ts(120), ts(125)),
      (2L, 102L, ts(0), ts(10)),
      (3L, 103L, ts(5), ts(65))
    ).toDF("k", "lid", "ls", "le")
    val right = Seq(
      (1L, 200L, ts(80), ts(130)),  // overlaps BOTH 100 (at 80-90) and 101
      (1L, 201L, ts(91), ts(95)),   // overlaps neither (100 ends at 90... boundary below)
      (1L, 202L, ts(90), ts(92)),   // touches 100 exactly at ts=90 → inclusive
      (2L, 203L, ts(10), ts(20)),   // touches 102 at ts=10
      (3L, 204L, ts(200), ts(300)), // no overlap
      (4L, 205L, ts(0), ts(100))    // key with no left rows
    ).toDF("k", "rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(left, right, Seq("k"),
        "ls", "le", "rs", "re", bucketSec = 1800)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val naive = left.join(right, Seq("k"))
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got === got.distinct, "exactly-once emission violated")
    assert(got === Seq((100L, 200L), (100L, 202L), (101L, 200L),
      (102L, 203L)))
  }

  test("randomized: bucketed result always equals the naive join") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300) { i =>
      val s = rnd.nextInt(10000).toLong
      (rnd.nextInt(5).toLong, i.toLong, new Timestamp(s * 1000),
        new Timestamp((s + rnd.nextInt(900)) * 1000))
    }.toDF("k", "lid", "ls", "le")
    val right = Seq.tabulate(300) { i =>
      val s = rnd.nextInt(10000).toLong
      (rnd.nextInt(5).toLong, i.toLong, new Timestamp(s * 1000),
        new Timestamp((s + rnd.nextInt(900)) * 1000))
    }.toDF("k", "rid", "rs", "re")
    for (bucketSec <- Seq(60L, 450L, 3600L)) {
      val got = IntervalJoin.overlapJoin(left, right, Seq("k"),
          "ls", "le", "rs", "re", bucketSec)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val naive = left.join(right, Seq("k"))
        .filter($"ls" <= $"re" && $"rs" <= $"le")
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === naive, s"mismatch at bucketSec=$bucketSec")
      assert(got.size === got.distinct.size,
        s"duplicates at bucketSec=$bucketSec")
    }
  }

  test("plan: equi-join on (keys, bucket), never cartesian or nested loop") {
    val p = SparkEntry.queries("q_interval_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"non-keyed join:\n$p")
    assert(p.contains("_bucket"), s"grid bucketing missing from plan:\n$p")
  }
}
