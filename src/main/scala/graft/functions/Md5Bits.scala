package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col => _, _}

/** Engine-agnostic 60-bit hash derived from MD5 — the ONE hash definition
  * shared by every approximate operator (MinHash, SimHash, winnowing,
  * SRP-LSH hyperplanes) so each of them is reproducible bit-for-bit in the
  * DuckDB oracle:
  *
  *   hash60(s) = first 15 hex chars of md5(s), parsed base-16.
  *
  * 15 hex chars = 60 bits — always non-negative in an int64 on both
  * engines (16 chars could set the sign bit, and DuckDB's BIGINT cast
  * would overflow where Spark's would wrap). Three equivalent spellings,
  * kept adjacent so they cannot drift:
  *
  *  - [[hash60(c* Column)]]: Spark column algebra (codegen'd builtins).
  *  - [[hash60(s* String)]]: JVM static for custom codegen Expressions
  *    (SimHash, Winnow) and plan-time constants (SRP planes).
  *  - [[sqlHash60]]: the DuckDB spelling for oracle SQL.
  *
  * Replaces the xxhash64/FNV derivations (Spark-specific, no DuckDB
  * equivalent) that previously forced the approximate family down to
  * rows-only correctness checks.
  */
object Md5Bits {

  /** Spark column spelling: conv(hex-prefix, 16, 10) → BIGINT. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** JVM spelling — MUST equal hash60(lit(s)) for every string (spec'd).
    * First 8 md5 bytes big-endian >>> 4 == first 15 hex chars base-16. */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    hash60Prefix(d)
  }

  /** The same 60-bit extraction from an md5 digest's first 8 bytes. */
  def hash60Prefix(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** DuckDB spelling over a SQL expression string. */
  def sqlHash60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"
}
