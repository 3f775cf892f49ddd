package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach ONE right row chosen by
  * temporal proximity within the same key — the time-series "most recent
  * quote for this trade" operator. Absent from the reference (and from
  * Spark's built-in join types; SURVEY.md §2B lists it as a gap).
  *
  * Directions (pandas merge_asof surface):
  *  - `backward` (default): latest right with right.ts <= left.ts;
  *  - `forward`:  earliest right with right.ts >= left.ts;
  *  - `nearest`:  whichever of the two is closer in |Δts|, ties to the
  *    backward match (the deterministic convention both engines can
  *    replay).
  * An optional `toleranceSec` voids any match farther than the bound —
  * with `inner=true` such left rows drop, otherwise their payload nulls.
  *
  * Implementation is the scalable union+window form, NOT a range join:
  * both sides are unioned, shuffled ONCE on the key, sorted within
  * partitions, and a running `last(_pay, ignoreNulls)` carries the
  * nearest right payload onto each left row (ascending sort for
  * backward, descending for forward; `nearest` runs both carries over
  * the SAME exchange — Spark reuses the shuffle, only the sort doubles).
  * Cost is one shuffle + sort(s) — no candidate-pair blowup, no skew
  * amplification beyond the key's own row count; this is the plan shape
  * that survives 100 TB (a broadcast-range-join would explode; an
  * equi-join can't express the predicate at all).
  *
  * Tie rule: right rows AT the left row's exact timestamp match in both
  * directions. Multiple right rows on the same (key, ts) must be
  * pre-aggregated by the caller (e.g. max_by) if determinism is
  * required — the demo queries do exactly that.
  */
object AsOfJoin {

  /** Backward as-of (the classic), kept as the stable entry point. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      inner: Boolean = true): DataFrame =
    asofDirected(left, right, keys, leftTs, rightTs, payload,
      direction = "backward", toleranceSec = None, inner = inner)

  /** @param direction    "backward" | "forward" | "nearest"
    * @param toleranceSec max |right.ts - left.ts| in seconds (inclusive);
    *                     None = unbounded */
  def asofDirected(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      direction: String, toleranceSec: Option[Long],
      inner: Boolean = true): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown direction '$direction'")
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "payload must name at least one right column")
    require(!leftCols.exists(payload.contains),
      s"payload columns $payload collide with left columns")
    val reserved = Seq("_ts", "_side", "_pay", "_hit", "_pb", "_pf", "_sel")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      s"input columns may not use reserved names $reserved")

    // The whole payload rides in ONE struct that is non-null for every
    // right row (even when all its fields are null): the running
    // last(_pay, ignoreNulls) then picks the TRUE nearest right row —
    // per-column carries would skip null fields (returning stale values)
    // and could stitch fields from different right rows. The matched
    // timestamp rides along as `_mts` for the tolerance/nearest math.
    // time axis: TIMESTAMP columns measure in microseconds; integer
    // columns are taken as SECONDS (toleranceSec stays seconds either way)
    val tsType = left.schema(leftTs).dataType
    require(right.schema(rightTs).dataType == tsType,
      s"left/right ts types differ: $tsType vs ${right.schema(rightTs).dataType}")
    def toUs(c: Column): Column = tsType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long") * 1000000L
    }
    val leftOnly = leftCols.filterNot(c => keys.contains(c) || c == leftTs)
    val payType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_mts",
        org.apache.spark.sql.types.LongType) +:
        payload.map(p => org.apache.spark.sql.types.StructField(p,
          right.schema(p).dataType)))
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")) ++
        leftOnly.map(col) :+
        lit(null).cast(payType).as("_pay"): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")) ++
        leftOnly.map(n => lit(null).as(n)) :+
        struct(toUs(col(rightTs)).as("_mts") +:
          payload.map(col): _*).as("_pay"): _*)
    val union = l.unionByName(r)

    // sort right rows before left rows at equal ts so ties match
    def carry(asc: Boolean): Column = {
      val o = if (asc) col("_ts").asc else col("_ts").desc
      last(col("_pay"), ignoreNulls = true).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(o, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    val tsUs = toUs(col("_ts"))
    def within(p: Column): Column = toleranceSec match {
      case Some(t) =>
        when(abs(tsUs - p.getField("_mts")) <= t * 1000000L, p)
      case None => p
    }
    val selected = direction match {
      case "backward" => union.withColumn("_sel", within(carry(asc = true)))
      case "forward"  => union.withColumn("_sel", within(carry(asc = false)))
      case "nearest" =>
        val u = union
          .withColumn("_pb", within(carry(asc = true)))
          .withColumn("_pf", within(carry(asc = false)))
        // closer wins; exact tie (including both at distance 0) → backward
        val db = tsUs - col("_pb").getField("_mts")
        val df = col("_pf").getField("_mts") - tsUs
        u.withColumn("_sel",
          when(col("_pb").isNull, col("_pf"))
            .when(col("_pf").isNull, col("_pb"))
            .when(df < db, col("_pf"))
            .otherwise(col("_pb")))
          .drop("_pb", "_pf")
    }
    val matched = selected.filter(col("_side") === 1)
    val out = matched.select((keys.map(col) :+ col("_ts").as(leftTs)) ++
      leftOnly.map(col) ++
      payload.map(p => col(s"_sel.$p").as(p)) :+
      col("_sel").isNotNull.as("_hit"): _*)
    // match detection = presence of a right row, independent of whether
    // its payload FIELDS are null (mirrors SQL ASOF inner semantics)
    val res = if (inner) out.filter(col("_hit")) else out
    res.drop("_hit")
  }
}
