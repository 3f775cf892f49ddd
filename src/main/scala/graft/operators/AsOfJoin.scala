package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the LATEST right row whose
  * timestamp is <= the left row's timestamp, within the same key — the
  * time-series "most recent quote for this trade" operator. Absent from
  * the reference (and from Spark's built-in join types; SURVEY.md §2B
  * lists it as a gap).
  *
  * Implementation is the scalable union+window form, NOT a range join:
  * both sides are unioned, shuffled ONCE on the key, sorted by (ts, side)
  * within partitions, and a running `last(payload, ignoreNulls)` carries
  * the most recent right payload forward onto each left row. Cost is one
  * shuffle + one sort — O(n log n) per key group, no candidate-pair
  * blowup, no skew amplification beyond the key's own row count; this is
  * the plan shape that survives 100 TB (a broadcast-range-join would
  * explode; an equi-join can't express the predicate at all).
  *
  * Tie rule: right rows AT the same timestamp as a left row do match
  * (<=). Multiple right rows on the same (key, ts) must be pre-aggregated
  * by the caller (e.g. max_by) if determinism is required — the demo
  * query does exactly that.
  */
object AsOfJoin {

  /** @param left      left (probe) frame
    * @param right     right (reference) frame
    * @param keys      equi-join key columns present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to attach (null when no match)
    * @param inner     true → drop left rows with no preceding right row
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "payload must name at least one right column")
    require(!leftCols.exists(payload.contains),
      s"payload columns $payload collide with left columns")
    val reserved = Seq("_ts", "_side", "_pay", "_hit")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      s"input columns may not use reserved names $reserved")

    // The whole payload rides in ONE struct that is non-null for every
    // right row (even when all its fields are null): the running
    // last(_pay, ignoreNulls) then picks the TRUE latest right row —
    // per-column carries would skip null fields (returning stale values)
    // and could stitch fields from different right rows.
    val leftOnly = leftCols.filterNot(c => keys.contains(c) || c == leftTs)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")) ++
        leftOnly.map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(p,
            right.schema(p).dataType)))).as("_pay"): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")) ++
        leftOnly.map(n => lit(null).as(n)) :+
        struct(payload.map(col): _*).as("_pay"): _*)

    // sort right rows before left rows at equal ts so <= matches
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = matched.select((keys.map(col) :+ col("_ts").as(leftTs)) ++
      leftOnly.map(col) ++
      payload.map(p => col(s"_pay.$p").as(p)) :+ col("_pay").isNotNull.as("_hit"): _*)
    // match detection = presence of a right row, independent of whether
    // its payload FIELDS are null (mirrors SQL ASOF inner semantics)
    val res = if (inner) out.filter(col("_hit")) else out
    res.drop("_hit")
  }
}
