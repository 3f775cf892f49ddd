package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GramSumAgg

/** GramSumAgg == an independent driver-side BigInt reference, on the
  * fast path, the per-slot overflow spill, and the out-of-range
  * BigInteger row path — across multiple partitions so partial reduce
  * AND merge both run. */
class GramSumSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def reference(rows: Seq[Array[Long]], d: Int): Map[Int, BigInt] = {
    val acc = scala.collection.mutable.Map.empty[Int, BigInt].withDefaultValue(BigInt(0))
    rows.foreach { q =>
      for (i <- 0 until d; j <- i until d)
        acc(i * d + j) += BigInt(q(i)) * BigInt(q(j))
      for (i <- 0 until d) acc(d * d + i) += BigInt(q(i))
      acc(d * d + d) += 1
    }
    acc.toMap.filter(_._2 != 0)
  }

  private def run(rows: Seq[Array[Long]], d: Int): Map[Int, BigInt] =
    spark.createDataset(rows).repartition(4)
      .select(GramSumAgg(d).toColumn)
      .head()
      .iterator.zipWithIndex
      .map { case (b, p) => p -> BigInt(new BigInteger(b)) }
      .filter(_._2 != 0).toMap

  test("matches BigInt reference on quantized-embedding-scale data") {
    val rnd = new scala.util.Random(42)
    val d = 8
    val rows = Seq.fill(500)(Array.fill(d)(rnd.nextLong() % 1000000L))
    assert(run(rows, d) == reference(rows, d))
  }

  test("per-slot fast-lane spill stays exact (values at the Long edge)") {
    val d = 3
    val big = 3037000499L // floor(sqrt(Long.MaxValue)): one product fits,
    // the second add of ~9.2e18 overflows the lane and must spill
    val rows = Seq.fill(7)(Array(big, -big, big))
    val got = run(rows, d)
    assert(got == reference(rows, d))
    // sanity: the pair sums really did exceed a Long
    assert(got(0).abs > BigInt(Long.MaxValue))
  }

  test("out-of-range magnitudes take the exact BigInteger row path") {
    val d = 2
    val rows = Seq(
      Array(4000000000L, -4000000000L), // |x| > sqrt(Long.MaxValue)
      Array(7L, 11L),
      Array(-4000000000L, 4000000000L))
    assert(run(rows, d) == reference(rows, d))
  }

  test("count and linear slots land in the shared layout") {
    val d = 2
    val rows = Seq(Array(2L, 3L), Array(5L, 7L))
    val got = run(rows, d)
    assert(got(d * d + d) == BigInt(2))      // count
    assert(got(d * d + 0) == BigInt(7))      // Σ q0
    assert(got(d * d + 1) == BigInt(10))     // Σ q1
    assert(got(0) == BigInt(29))             // Σ q0²  (4 + 25)
    assert(got(1) == BigInt(41))             // Σ q0·q1 (6 + 35)
    assert(!got.contains(d * 1 + 0))         // lower triangle stays empty
  }
}
