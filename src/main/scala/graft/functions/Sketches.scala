package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable HyperLogLog in pure column algebra (Flajolet et al. 2007) —
  * the engine-agnostic twin of Spark's builtin `approx_count_distinct`
  * (HLL++ over xxhash64, which no other engine can replay). Every piece
  * here is deterministic and exactly reproducible in DuckDB SQL:
  *
  *  - value hash: the shared md5-derived [[Md5Bits.hash60]];
  *  - register index: top [[B]] bits; rank: leading zeros of the low
  *    [[RestBits]] bits + 1, derived from `length(bin(rest))` — an
  *    integer path, no floating log;
  *  - the harmonic-mean denominator Σ 2^(−M_j) is kept as the INTEGER
  *    Σ 2^(RestBits+1−M_j) (exact, order-independent — a double sum of
  *    powers of two would round differently under different partition
  *    orders), divided out in one double op at the end.
  *
  * The small-range linear-counting branch uses `ln` (one libm call on a
  * 1/128-resolution argument); the final estimate is rounded to 4
  * decimals so a last-ulp libm disagreement cannot flip the hash
  * compare. Error ~1.04/√m ≈ 9% at m=128 (spec-asserted vs exact).
  */
object Sketches {

  val B = 7
  val M: Int = 1 << B // 128 registers
  val RestBits: Int = 60 - B // 53
  /** 2^(RestBits+1): the integer scale for Σ 2^(−M_j); an EMPTY register
    * (M_j = 0) contributes exactly this. */
  val Scale: Long = 1L << (RestBits + 1)
  /** α_m for m >= 128 (Flajolet et al., Fig. 3). */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** Per-value (register, rank) columns from any input column. */
  def hllRegister(value: Column): Column =
    shiftrightunsigned(Md5Bits.hash60(value), RestBits).as("hll_idx")

  def hllRank(value: Column): Column = {
    val rest = Md5Bits.hash60(value).bitwiseAND(lit((1L << RestBits) - 1))
    // leading zeros of a RestBits-wide field + 1 == RestBits+1 - bitlen
    when(rest === 0, lit(RestBits + 1))
      .otherwise(lit(RestBits + 1) - length(bin(rest))).as("hll_rho")
  }

  /** Final estimate columns over a (hll_idx → mx = max rank) frame that
    * has been reduced to one row of (s_present, n_present):
    * returns (s_scaled, zero_registers, est_distinct). */
  def hllFinish(sPresent: Column, nPresent: Column): Seq[Column] = {
    val sScaled = (sPresent + (lit(M.toLong) - nPresent) * lit(Scale)).as("s_scaled")
    val zeros = (lit(M.toLong) - nPresent).as("zero_registers")
    Seq(sScaled, zeros)
  }

  /** The estimate from the integer-scaled denominator + zero-register
    * count — mirrored verbatim by [[sqlHllEstimate]]. */
  def hllEstimate(sScaled: Column, zeros: Column): Column = {
    val raw = lit(Alpha) * M * M * lit(Scale.toDouble) / sScaled.cast("double")
    round(
      when(raw <= 2.5 * M && zeros > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double")))
        .otherwise(raw), 4)
  }

  /** DuckDB spelling of the whole pipeline, over a one-column relation
    * `(v)` given by `valuesSql`. Output: (s_scaled, zero_registers,
    * est_distinct) — one row. */
  def sqlHll(valuesSql: String): String = {
    val h = Md5Bits.sqlHash60("v")
    s"WITH hv AS (SELECT $h AS h FROM ($valuesSql) vals), " +
      s"reg AS (SELECT h >> $RestBits AS idx, " +
      s"CASE WHEN (h & ${(1L << RestBits) - 1}) = 0 THEN ${RestBits + 1} " +
      s"ELSE ${RestBits + 1} - length(bin(h & ${(1L << RestBits) - 1})) END AS rho " +
      "FROM hv), " +
      "mx AS (SELECT idx, max(rho) AS mx FROM reg GROUP BY idx), " +
      s"agg AS (SELECT CAST(sum(CAST(1 AS BIGINT) << ($RestBits + 1 - mx)) AS BIGINT) " +
      "AS s_present, count(*) AS n_present FROM mx), " +
      s"fin AS (SELECT s_present + ($M - n_present) * $Scale AS s_scaled, " +
      s"$M - n_present AS zero_registers FROM agg) " +
      "SELECT s_scaled, zero_registers, " +
      s"round(CASE WHEN CAST($Alpha AS DOUBLE) * $M * $M * CAST($Scale AS DOUBLE) / s_scaled <= ${2.5 * M} " +
      "AND zero_registers > 0 " +
      s"THEN CAST($M AS DOUBLE) * ln(CAST($M AS DOUBLE) / zero_registers) " +
      s"ELSE CAST($Alpha AS DOUBLE) * $M * $M * CAST($Scale AS DOUBLE) / s_scaled END, 4) " +
      "AS est_distinct FROM fin"
  }
}
