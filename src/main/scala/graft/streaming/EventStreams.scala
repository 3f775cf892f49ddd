package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events stream — net-new relative to the
  * reference, whose only "streaming" is cron-scheduled batch re-runs
  * (`web_ui/app.py:417-500`, SURVEY.md §2B). Spark-first design: every
  * transform here is written against an unbounded DataFrame and works
  * identically on a bounded one — the specs prove streaming == batch on
  * the same data.
  *
  * Scale notes: watermarks bound state (late events beyond the watermark
  * are dropped, state for closed windows is freed); session windows use
  * Spark's native session_window state merging; the custom-state path
  * (flatMapGroupsWithState) keys state by user_id so it shards across
  * executors with the shuffle.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  case class UserTotals(user_id: Long, n_events: Long, value_cents: Long)

  /** Unbounded file-source read of an events directory (the production
    * entry point: new parquet files appear, Spark incrementally processes
    * them). Schema must be declared — streaming reads cannot infer — so
    * the ts storage form is probed with a footer-only batch read and the
    * declared schema matches it, mirroring Tables.events: TIMESTAMP(NANOS)
    * files surface ts as BIGINT (under `nanosAsLong`) and are converted
    * to microsecond timestamps; TIMESTAMP(MICROS) files read directly.
    * A directory with no files yet (the normal state when a stream is
    * wired up before its producer) cannot be probed — the stream still
    * constructs, declaring the TIMESTAMP(MICROS) form, which is what
    * every current producer writes; a nanos backfill landing later would
    * need the stream restarted after files exist. */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val nanosTs =
      try spark.read.parquet(dir).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    val reader = spark.readStream
    // source rate limit: bounds each micro-batch to k files, the knob a
    // live deployment (and StreamBench) uses to shape batch sizes
    maxFilesPerTrigger.foreach(k => reader.option("maxFilesPerTrigger", k))
    val df = reader
      .schema(if (nanosTs)
        "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING"
      else
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
    if (nanosTs) df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Hourly tumbling counts/revenue per event type — the streaming form
    * of EventQueries.qTumblingHourly. The watermark lets Spark emit and
    * then free each window once no event older than (max ts − watermark)
    * can arrive. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // decimal sum: exact and order-independent, so streaming results
        // are bit-identical to the batch plan regardless of micro-batch
        // boundaries or partition order
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** CHAINED stateful aggregation — two time-window aggregates in ONE
    * streaming query (hourly rollup feeding a daily rollup via
    * `window(window_col, ...)`), the multi-stateful-operator capability
    * Structured Streaming gained in 3.4: the daily aggregate consumes
    * hourly FINALS as the hourly windows close under the watermark, so
    * per-day state is 24 partial rows, not the day's events. Decimal
    * sums keep both stages exact and order-independent. Append mode —
    * a day emits once the watermark passes its end, by which point every
    * hour inside it has closed. */
  def hourlyThenDaily(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w1"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("dsum"))
      .groupBy(window(col("w1"), "1 day").as("w2"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("dsum")).cast("double").as("sum_value"))
      .select(col("w2.start").as("day_start"), col("n_events"), col("sum_value"))

  /** Native session windows: a session spans events < gap apart and ends
    * gap after the last one. Works on batch frames too (the oracle-checked
    * q_session_window query runs exactly this plan in batch mode). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: Option[String] = Some("2 hours")): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // decimal sum → exact and order-independent (oracle parity)
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("session_value"))
  }

  /** Custom keyed state: running per-user totals, emitted on every update
    * — the streaming analog of a stateful reducer, which the reference
    * cannot express at all (its reducers see one key's batch once).
    * flatMapGroupsWithState keeps one small UserRunning per user, sharded
    * by the group-by shuffle. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          val next = UserRunning(userId, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Exact-arithmetic variant of [[runningUserTotals]]: values become
    * integer CENTS BEFORE the stateful operator, via Spark's own
    * double→decimal(18,2) cast — the same conversion every `dsum`-based
    * batch query uses, so engine-side rounding has exactly one
    * definition (a JVM-side BigDecimal re-rounding could disagree with
    * it on 3+-decimal inputs). State totals are then order-independent
    * long sums and the final per-user state equals the batch decimal
    * sum — which is what lets the custom-state operator sit under the
    * DuckDB oracle gate (`q_stream_running`). */
  def runningUserCents(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[(Long, Long)],
            state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0L))
          var n = prev.n_events
          var c = prev.value_cents
          batch.foreach { kv => n += 1; c += kv._2 }
          val next = UserTotals(userId, n, c)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** One emitted version row of the streaming attribute history; closed
    * versions carry their valid_to, the open one re-emits null until a
    * later change (or never). */
  case class AttrVersion(user_id: Long, event_type: String,
      valid_from: Timestamp, valid_to: Option[Timestamp], version_no: Long)

  /** Keyed state for [[attrHistory]] — public: the state encoder's
    * generated code constructs/reads it reflectively. */
  case class AttrState(cur_type: String, valid_from: Timestamp,
      version: Long, last_ts: Timestamp, last_id: Long)

  /** Streaming SCD2 / attribute-change history — the live twin of the
    * batch `q_attr_history`: per-user keyed state tracks the CURRENT
    * attribute version (type, valid_from, version counter); each
    * micro-batch's events for a user are ordered by (ts, event_id)
    * in-group and folded — a value change CLOSES the open version
    * (emitting it with its valid_to) and opens the next; unchanged
    * values only advance the order cursor. State is one tiny record per
    * user, sharded by the group shuffle; emissions are change-sized.
    * Events at or before the cursor (cross-batch stragglers) are
    * dropped — the documented late-data rule (a production variant
    * buffers within the watermark before folding; the fixture feed is
    * ts-ordered across batches, so the rule never fires there). The
    * open version re-emits each touching batch, so consumers keep, per
    * (user, version), the closed row when one exists — exactly what
    * StreamQueries' assembly does before the batch oracle compare. */
  def attrHistory(events: Dataset[Event]): Dataset[AttrVersion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrVersion](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[AttrState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[AttrVersion]
          sorted.foreach { e =>
            if (st == null)
              st = AttrState(e.event_type, e.ts, 1L, e.ts, e.event_id)
            else if (e.ts.getTime < st.last_ts.getTime ||
              (e.ts.getTime == st.last_ts.getTime && e.event_id <= st.last_id)) {
              // late arrival behind the cursor: drop (documented rule)
            } else if (e.event_type != st.cur_type) {
              out += AttrVersion(uid, st.cur_type, st.valid_from,
                Some(e.ts), st.version)
              st = AttrState(e.event_type, e.ts, st.version + 1L,
                e.ts, e.event_id)
            } else st = st.copy(last_ts = e.ts, last_id = e.event_id)
          }
          if (st != null) {
            state.update(st)
            out += AttrVersion(uid, st.cur_type, st.valid_from, None, st.version)
          }
          out.iterator
      }
  }

  /** One row of a per-window top-k leaderboard snapshot; `w_total` (the
    * window's total event count, strictly increasing) marks which
    * snapshot is newest, so a last-write-wins consumer can keep the
    * final one without ordering guarantees from the sink. */
  case class WindowTopK(bucket: Timestamp, event_type: String, n: Long,
      w_total: Long)

  /** Streaming per-window top-k: for every (hour bucket), the k most
    * frequent event types — the live "trending now" leaderboard. Spark
    * has no streaming ranking window, so the rank is custom keyed state:
    * `flatMapGroupsWithState` per bucket holds the type→count map
    * (bounded: |event types| entries per window, NOT per event) and
    * re-emits the top-k snapshot whenever the window's counts change.
    * Deterministic tie-break (count desc, type asc) keeps the cut
    * boundary stable across engines and micro-batch layouts. At 100 TB
    * the state is windows×types rows — negligible against the stream —
    * and a production run adds a state TIMEOUT at the watermark horizon
    * to retire closed windows. */
  def hourlyTopK(events: DataFrame, k: Int,
      watermark: String = "40 days"): Dataset[WindowTopK] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .as[(Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], WindowTopK](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Timestamp, batch: Iterator[(Timestamp, String)],
            state: GroupState[Map[String, Long]]) =>
          val counts = batch.foldLeft(state.getOption.getOrElse(
            Map.empty[String, Long])) { (m, r) =>
            m.updated(r._2, m.getOrElse(r._2, 0L) + 1L)
          }
          state.update(counts)
          val total = counts.valuesIterator.sum
          counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
            .map { case (t, n) => WindowTopK(bucket, t, n, total) }
            .iterator
      }
  }

  /** Stream-static enrichment: join the unbounded stream against a
    * bounded dimension (re-read per micro-batch, so slowly-changing
    * dimensions pick up updates without restarting the query). The
    * static side is broadcast by the planner — no streaming state. */
  def enrich(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(dim, col(eventKey) === col(dimKey), "left")

  /** Streaming exact dedup: drop events whose key was already seen,
    * keeping state only within the watermark horizon — the unbounded
    * stream counterpart of `q_dedup_exact` (an unwatermarked distinct
    * would accumulate state forever). Duplicates arriving later than the
    * watermark are the residual risk; batch dedup downstream catches
    * them (the standard lambda-architecture split). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream requires at least one key column")
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Stream-stream join: purchases matched to clicks by the same user
    * within `withinMinutes` BEFORE the purchase. Both sides carry
    * watermarks and the join condition bounds the time skew, so Spark can
    * expire buffered state — the unbounded-state trap of naive
    * stream-stream joins is structurally avoided. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 60, watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoin(clicks, purchases, withinMinutes, watermark, "inner")

  /** The single interval-join core all five verbs share: same watermarks,
    * same key + time-bound condition, only the join type varies — so the
    * verb set cannot drift apart condition-by-condition. */
  private def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int, watermark: String, joinType: String): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $withinMinutes MINUTES"),
      joinType)
  }

  /** LEFT OUTER stream-stream join: same interval condition as
    * [[clickToPurchase]], but unmatched clicks ALSO emit (null purchase
    * columns) — once the watermark passes the click's join window
    * [click_ts, click_ts + within], proving no matching purchase can
    * still arrive. This is the null-emission contract batch left joins
    * get for free and streaming must earn from the watermark; state for
    * a click is dropped at the same moment its null is emitted, so
    * outer-join state is bounded by the watermark delay + window, not
    * the stream length. */
  def clickToPurchaseLeft(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 60, watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoin(clicks, purchases, withinMinutes, watermark, "left_outer")

  /** FULL OUTER stream-stream join: completes the interval-join verb set
    * ([[clickToPurchase]] inner, [[clickToPurchaseLeft]] left). Both null
    * sides are watermark-gated: an unmatched click emits once the
    * watermark passes the end of its join window (click_ts + within — no
    * later purchase can match), an unmatched purchase once the watermark
    * passes purchase_ts itself (its window's latest admissible click time
    * — any click arriving later than that is below the condition's upper
    * bound). State drops at the same moments, so full-outer state is
    * bounded by watermark delay + window on both sides. */
  def clickToPurchaseFull(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 60, watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoin(clicks, purchases, withinMinutes, watermark, "full_outer")

  /** RIGHT OUTER stream-stream join — the last interval-join verb
    * (inner / left / full are above). Every purchase emits: matched
    * rows immediately, unmatched purchases with null click columns once
    * the watermark passes purchase_ts (the latest click time the
    * interval condition admits — any later click is out of window).
    * State bounds mirror the left join's, sides swapped. */
  def clickToPurchaseRight(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 60, watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoin(clicks, purchases, withinMinutes, watermark, "right_outer")

  /** LEFT SEMI stream-stream join — the existence-check verb: a click
    * emits (left columns only, exactly once) as soon as SOME purchase in
    * its window has arrived; unmatched clicks never emit and their state
    * drops once the watermark passes the window end. The streaming form
    * of `WHERE EXISTS` — conversion-flagging without duplicating a click
    * per matching purchase the way the inner join does. */
  def clickToPurchaseSemi(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 60, watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoin(clicks, purchases, withinMinutes, watermark, "left_semi")

  /** Start writing a streaming frame to parquet with checkpointing — the
    * durable-sink shape (exactly-once via checkpoint + file sink log).
    * Returns the running StreamingQuery (await/stop is the caller's). */
  def writeParquetSink(df: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
}
