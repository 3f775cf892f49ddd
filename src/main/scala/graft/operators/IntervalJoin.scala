package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: all (left, right) pairs sharing the equi-keys
  * whose time intervals `[lStart, lEnd]` and `[rStart, rEnd]` OVERLAP
  * (inclusive endpoints) — "which incident windows intersect which user
  * sessions". The interval×interval sibling of [[RangeJoin]] (which joins
  * POINTS into windows); absent from the reference, and Spark's naive
  * spelling (equi-key + two inequalities) buffers a per-key cross product
  * inside sort-merge join — the plan that dies on a hot key.
  *
  * Scalable form (the standard grid trick): time is cut into buckets of
  * width `bucketSec`; every interval is replicated to each bucket it
  * touches, the join becomes a plain equi-join on (keys, bucket), and the
  * exact overlap predicate filters the candidates. A pair that overlaps
  * may meet in SEVERAL buckets, so the join would duplicate it —
  * the exactly-once rule keeps a pair only in the bucket containing
  * `max(lStart, rStart)` (the overlap's first instant, which lies in
  * exactly one bucket). No distinct/dedup shuffle is ever needed.
  *
  * Cost model at 100 TB: shuffle volume is Σ(interval length / bucketSec
  * + 1) per side — pick `bucketSec` near the TYPICAL interval length so
  * most rows replicate to ≤2 buckets. Degenerate long intervals fan out
  * proportionally (bounded, known upfront), never quadratically.
  * All bucket math is exact integer microseconds — no float boundaries.
  */
object IntervalJoin {

  /** @param keys   equi-join key columns present on both sides
    * @param lStart,lEnd left interval bound columns (timestamp)
    * @param rStart,rEnd right interval bound columns (timestamp)
    * @param bucketSec grid width, seconds */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    require(!(left.columns ++ right.columns).contains("_bucket"),
      "input columns may not use the reserved name _bucket")
    val w = bucketSec * 1000000L
    def buckets(start: String, end: String) =
      explode(sequence(floor(unix_micros(col(start)) / w),
        floor(unix_micros(col(end)) / w))).as("_bucket")
    val l = left.select(col("*"), buckets(lStart, lEnd))
    val r = right.select(col("*"), buckets(rStart, rEnd))
    l.join(r, keys :+ "_bucket")
      // exact overlap on the raw bounds
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // exactly-once: keep the bucket holding the overlap's first instant
      .filter(col("_bucket") ===
        floor(greatest(unix_micros(col(lStart)), unix_micros(col(rStart))) / w))
      .drop("_bucket")
  }
}
