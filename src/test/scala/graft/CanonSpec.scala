package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract of graft.queries.Canon — THE hash-stable
  * quantization for emitted doubles (r16 float-canon audit):
  * half always rounds toward +inf, results are plain IEEE on any
  * engine, and -0.0 can never be emitted (the '-0' vs '0' %.10g
  * divergence class). */
class CanonSpec extends AnyFunSuite {
  import TestSpark._

  private def q6(xs: Double*): Seq[Double] = {
    import spark.implicits._
    xs.toDF("x").select(graft.queries.Canon.qround(col("x"), 6))
      .collect().map(_.getDouble(0)).toSeq
  }

  test("qround: exact .5 boundaries round toward +inf on both signs") {
    // 3.9140625e0 * 1e6 = 3914062.5 exactly (dyadic) — the q_tfidf cell
    assert(q6(3.9140625) == Seq(3.914063))
    // negative exact half: toward +inf (NOT HALF_UP away-from-zero)
    assert(q6(-3.9140625) == Seq(-3.914062))
  }

  test("qround: never emits -0.0") {
    val got = q6(-1e-9, 0.0, -0.0, 1e-9)
    assert(got == Seq(0.0, 0.0, 0.0, 0.0))
    // the actual divergence class: the BITS must be +0.0, not -0.0
    got.foreach(v =>
      assert(java.lang.Double.doubleToRawLongBits(v) == 0L,
        s"qround emitted -0.0 for input mapping to $v"))
  }

  test("qlong: fixed-point quantization matches the oracle floor spelling") {
    import spark.implicits._
    val got = Seq(12.345, 12.3450049, -2.5, 0.0049, -0.0049).toDF("x")
      .select(graft.queries.Canon.qlong(col("x"), 100.0))
      .collect().map(_.getLong(0)).toSeq
    // floor(x*100 + 0.5): 1235 (round up at .5), 1235, -250 -> floor(-249.5)
    // = -250, 0, floor(0.01)=0 (tiny negative -> 0, never -0/-1)
    assert(got == Seq(1235L, 1235L, -250L, 0L, 0L))
  }
}
