package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** THE hash-stable quantization spellings for emitted doubles.
  *
  * `round(x, n)` is NOT cross-engine stable: when x·10ⁿ lands within ulps
  * of a representable .5 boundary, Spark's decimal-expansion HALF_UP and
  * DuckDB's vectorized product round legally disagree (hit at sf1 in r12,
  * sf3 in r15, and measured systematically by tools/round_audit.py in
  * r16 — dyadic inputs like float embeddings, byte means, and
  * integer-ratio scores sit exactly ON those boundaries); round() can
  * also emit -0.0 for tiny negatives ('-0' vs '0' under the driver's
  * %.10g canon). The floor spelling is plain IEEE arithmetic, identical
  * on any engine that evaluates it, and never produces -0.0.
  *
  * New code quantizing a double for emission (or for integer fixed-point
  * state) MUST use these, with the oracle SQL spelling the literal
  * `floor(x * 10^n + 0.5) / 10^n` / `CAST(floor(x * s + 0.5) AS BIGINT)`
  * mirror. Note the semantics: half always rounds toward +inf (true
  * HALF_UP only for non-negative x) — fine, because both engines then
  * agree by construction, which is the property the hash gate needs.
  */
object Canon {

  /** floor(x·10ⁿ + 0.5)/10ⁿ — quantize to n decimal places. */
  def qround(c: Column, n: Int): Column = {
    val s = math.pow(10, n)
    floor(c * s + 0.5) / s
  }

  /** floor(x·scale + 0.5) as BIGINT — fixed-point integer quantization
    * (micro-units, cents). `scale` multiplies as one literal, so spell
    * any pre-scaling inside `c` exactly as the oracle does (IEEE
    * multiplication is not associative). */
  def qlong(c: Column, scale: Double): Column =
    floor(c * scale + 0.5).cast("long")
}
