package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, UserRunning}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private val fixture = Seq(
    Event(0L, t(0), 1L, "click", 1.0, "{}"),
    Event(1L, t(10), 1L, "view", 2.0, "{}"),
    Event(2L, t(65), 1L, "click", 3.0, "{}"),
    Event(3L, t(5), 2L, "click", 4.0, "{}"),
    Event(4L, t(200), 2L, "purchase", 5.0, "{}"),
  )

  test("streaming hourly counts equal the batch plan on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly")
      .select($"bucket", $"event_type", $"n_events", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = fixture.toDF()
      .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows close after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionWindows(mem.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      // push the watermark far past every session end
      mem.addData(Event(99L, t(100000), 9L, "click", 0.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("sessions")
      .select($"user_id", $"n_events", $"session_value")
      .as[(Long, Long, Double)].collect().toSet
    // user 1: session {e0,e1} then {e2}; user 2: {e3} then {e4}
    assert(out === Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0), (2L, 1L, 5.0)))
  }

  test("flatMapGroupsWithState keeps running totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      mem.addData(fixture.take(2): _*) // user 1: 2 events
      q.processAllAvailable()
      mem.addData(fixture.drop(2): _*) // +1 for user 1, 2 for user 2
      q.processAllAvailable()
    } finally q.stop()

    // the LAST update per user carries the final running state
    val finals = spark.table("running").as[UserRunning].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
    assert(finals(1L).n_events === 3 && math.abs(finals(1L).total_value - 6.0) < 1e-9)
    assert(finals(2L).n_events === 2 && math.abs(finals(2L).total_value - 9.0) < 1e-9)
  }

  test("stream-static enrichment joins each micro-batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("dim_user", "tier")
    val mem = MemoryStream[Event]
    val q = EventStreams.enrich(mem.toDF(), dim, "user_id", "dim_user")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(fixture.take(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    val tiers = spark.table("enriched")
      .select($"event_id", $"tier").as[(Long, String)].collect().toMap
    assert(tiers(0L) === "gold")
    assert(tiers(3L) === "basic")
  }

  test("stream-static enrichment backfill equals the batch left-join aggregate") {
    val got = queries.StreamQueries.qStreamEnrich(spark, sf)
    val want = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment"),
        $"user_id" === $"c_custkey", "left")
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        queries.Relational.dsum($"value").as("sum_value"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    assert(got.count() > 0)
  }

  test("foreachBatch upsert applies latest-per-key across separate applies") {
    implicit val sqlCtx = spark.sqlContext
    val table = "kv_upsert_spec"
    val s1 = MemoryStream[Event]
    s1.addData(fixture.take(4): _*)
    queries.StreamQueries.applyLatestPerUser(spark, s1.toDF(), table)
    val s2 = MemoryStream[Event]
    s2.addData(Event(9L, t(300), 1L, "refund", 9.5, "{}"),
      Event(10L, t(1), 3L, "click", 0.5, "{}"))
    queries.StreamQueries.applyLatestPerUser(spark, s2.toDF(), table)
    val got = spark.read.format("graft-kv").option("table", table).load()
      .select($"user_id", $"last_event_id", $"last_value")
      .as[(Long, Long, Double)].collect().toSet
    // user 1 overwritten by the second apply; user 2 survives; user 3 new
    assert(got === Set((1L, 9L, 9.5), (2L, 3L, 4.0), (3L, 10L, 0.5)))
  }

  test("parquet sink starts, checkpoints, and lands rows durably") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink")
    val mem = MemoryStream[Event]
    val q = EventStreams.writeParquetSink(
      mem.toDF(), s"$dir/data", s"$dir/ckpt")
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() === fixture.length)
  }

  test("streaming dedup emits each key once within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1L, t(0), 1L, "click", 1.0, "{}"),
        Event(1L, t(1), 1L, "click", 1.0, "{}"), // same key, same batch
        Event(2L, t(2), 1L, "view", 2.0, "{}"))
      q.processAllAvailable()
      mem.addData(Event(1L, t(3), 1L, "click", 1.0, "{}")) // dup, later batch
      q.processAllAvailable()
      mem.addData(Event(3L, t(4), 2L, "click", 3.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream")
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      mem.addData(Event(0L, t(30), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // advance watermark far past the first hour...
      mem.addData(Event(1L, t(600), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // ...then send an event INTO the long-closed first window
      mem.addData(Event(2L, t(31), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // and close everything out
      mem.addData(Event(3L, t(5000), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val firstWindow = spark.table("late_test")
      .filter($"bucket" === new Timestamp((1700000000000L / 3600000L) * 3600000L))
      .select($"n_events").as[Long].collect()
    // the late event (id 2) must NOT be counted: closed window stays at 1
    assert(firstWindow.toSeq === Seq(1L))
  }

  test("stream-stream join matches the batch join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStreams.clickToPurchase(
      clicks.toDF(), purchases.toDF(), withinMinutes = 60)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(0L, t(0), 1L, "click", 0.0, "{}"),
        Event(1L, t(30), 1L, "click", 0.0, "{}"),
        Event(2L, t(0), 2L, "click", 0.0, "{}"))
      purchases.addData(
        Event(10L, t(45), 1L, "purchase", 9.0, "{}"),   // joins clicks 0,1
        Event(11L, t(200), 2L, "purchase", 5.0, "{}"))  // click 2 too old
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ss_join")
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    // click at t0 is 45 min before the purchase (within 60); t30 is 15 min
    assert(got === Set((0L, 10L), (1L, 10L)))
  }

  test("left-outer stream join emits nulls only for watermark-closed clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStreams.clickToPurchaseLeft(
      clicks.toDF(), purchases.toDF(), withinMinutes = 60, watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ss_left_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(0L, t(0), 1L, "click", 0.0, "{}"),   // matched
        Event(1L, t(10), 2L, "click", 0.0, "{}"),  // never matched → null emit
        Event(2L, t(290), 3L, "click", 0.0, "{}")) // unmatched but still OPEN
      purchases.addData(
        Event(10L, t(45), 1L, "purchase", 9.0, "{}"),
        Event(11L, t(300), 9L, "purchase", 5.0, "{}")) // advances watermark
      q.processAllAvailable()
      // after round 1 the watermark sits at min(maxClick t290, maxPurchase
      // t300) − 1min ≈ t289: past click 1's window end (t70) → its null
      // row emits; click 2's window (ends t350) is still open → withheld
      def snapshot() = spark.table("ss_left_join")
        .select($"click_id", $"purchase_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val round1 = snapshot()
      assert(round1.contains((0L, 10L)))  // the real match
      assert(round1.contains((1L, -1L)))  // closed unmatched click → null row
      assert(!round1.exists(_._1 == 2L))  // open click withheld
      // round 2 pushes the watermark past click 2's window → now it emits
      clicks.addData(Event(3L, t(400), 8L, "click", 0.0, "{}"))
      purchases.addData(Event(12L, t(400), 9L, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      assert(snapshot().contains((2L, -1L)))
    } finally q.stop()
  }

  test("full-outer stream join emits both watermark-gated null sides") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStreams.clickToPurchaseFull(
      clicks.toDF(), purchases.toDF(), withinMinutes = 60, watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ss_full_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(0L, t(0), 1L, "click", 0.0, "{}"),   // matched
        Event(1L, t(10), 2L, "click", 0.0, "{}"),  // unmatched, closed → null
        Event(2L, t(290), 3L, "click", 0.0, "{}")) // unmatched, still open
      purchases.addData(
        Event(10L, t(45), 1L, "purchase", 9.0, "{}"),  // matched
        Event(11L, t(100), 4L, "purchase", 5.0, "{}"), // unmatched, closed → null
        Event(12L, t(300), 9L, "purchase", 5.0, "{}")) // advances watermark; open
      q.processAllAvailable()
      // watermark ≈ min(t290, t300) − 1min = t289: click 1's window ended
      // t70 → null; purchase 11's latest admissible click time is t100 →
      // null; click 2 (window ends t350) and purchase 12 (t300 ≥ wm) open
      def snapshot() = spark.table("ss_full_join")
        .select($"click_id", $"purchase_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val round1 = snapshot()
      assert(round1.contains((0L, 10L)))   // the real match
      assert(round1.contains((1L, -1L)))   // closed unmatched click
      assert(round1.contains((-1L, 11L)))  // closed unmatched purchase
      assert(!round1.exists(p => p._1 == 2L || p._2 == 12L)) // open rows withheld
      // advancing the watermark past both open windows flushes them
      clicks.addData(Event(3L, t(500), 8L, "click", 0.0, "{}"))
      purchases.addData(Event(13L, t(500), 9L, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      val round2 = snapshot()
      assert(round2.contains((2L, -1L)))
      assert(round2.contains((-1L, 12L)))
    } finally q.stop()
  }

  test("right-outer stream join emits nulls only for watermark-closed purchases") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStreams.clickToPurchaseRight(
      clicks.toDF(), purchases.toDF(), withinMinutes = 60, watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ss_right_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(0L, t(0), 1L, "click", 0.0, "{}"),   // matched
        Event(1L, t(10), 2L, "click", 0.0, "{}"),  // unmatched click: NEVER emits
        Event(2L, t(290), 3L, "click", 0.0, "{}")) // advances click watermark
      purchases.addData(
        Event(10L, t(45), 1L, "purchase", 9.0, "{}"),  // matched
        Event(11L, t(100), 4L, "purchase", 5.0, "{}"), // unmatched, closed → null
        Event(12L, t(290), 9L, "purchase", 5.0, "{}")) // unmatched, still open
      // watermark ≈ min(t290, t290) − 1min = t289: purchase 11 (latest
      // admissible click t100) closes → null; purchase 12 (t290) stays open
      q.processAllAvailable()
      def snapshot() = spark.table("ss_right_join")
        .select($"click_id", $"purchase_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val round1 = snapshot()
      assert(round1.contains((0L, 10L)))  // the real match
      assert(round1.contains((-1L, 11L))) // closed unmatched purchase
      // right join: unmatched CLICKS never appear, open purchases withheld
      assert(!round1.exists(p => p._1 == 1L || p._1 == 2L))
      assert(!round1.exists(_._2 == 12L))
      clicks.addData(Event(3L, t(500), 8L, "click", 0.0, "{}"))
      purchases.addData(Event(13L, t(500), 9L, "purchase", 1.0, "{}"))
      q.processAllAvailable()
      val round2 = snapshot()
      assert(round2.contains((-1L, 12L))) // flushed once its window closed
      assert(!round2.exists(p => p._1 == 1L || p._1 == 2L)) // clicks still silent
    } finally q.stop()
  }

  test("chained hourly->daily aggregation equals the batch rollup for closed days") {
    val got = graft.queries.StreamQueries.qStreamChain(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    val wm = Tables.events(spark, sf)
      .agg(max(col("ts"))).collect().head.getTimestamp(0).getTime - 60000L
    val want = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day_start"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .filter(unix_millis(col("day_start")) + 86400000L <= wm)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("checkpointed backfill resumes exactly-once: no replay, no loss") {
    // the operational contract of every AvailableNow backfill in the
    // suite: a second run against the SAME checkpoint must process only
    // files that arrived since the first run — committed offsets are
    // honored, nothing replays, nothing drops
    val srcDir = java.nio.file.Files.createTempDirectory("graft_resume_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_resume_ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("graft_resume_out")
    def land(from: Long, until: Long): Unit =
      spark.range(from, until).selectExpr("id AS event_id")
        .coalesce(1).write.mode("append").parquet(srcDir.toString)
    def runOnce(): Unit = {
      val st = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("event_id BIGINT"))
        .parquet(srcDir.toString)
      val q = st.writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land(0L, 100L)
    runOnce()
    land(100L, 150L) // late-arriving files between runs
    runOnce()
    val ids = spark.read.parquet(outDir.toString)
      .select($"event_id").as[Long].collect()
    assert(ids.length === 150)           // no replay duplicates
    assert(ids.toSet === (0L until 150L).toSet) // no loss
  }

  test("batch session_window query matches hand-rolled sessionization counts") {
    val sw = graft.queries.EventQueries.qSessionWindow(spark, sf)
    val manual = graft.queries.EventQueries.qSessionize(spark, sf)
    assert(sw.count() === manual.count())
    assert(sw.agg(sum($"n_events")).head().getLong(0) ===
      Tables.events(spark, sf).count())
  }

  test("streaming hourly top-k state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hourlyTopK(in.toDF(), k = 2).toDF()
      .writeStream.format("memory").queryName("stream_topk_spec")
      .outputMode("update").start()
    try {
      // hour 0: 3 views, 2 clicks, 1 error — split across TWO batches so
      // the second batch must rank on merged state, not batch-local counts
      in.addData(Event(0L, t(1), 1L, "view", 0, "{}"),
        Event(1L, t(2), 1L, "click", 0, "{}"),
        Event(2L, t(3), 2L, "view", 0, "{}"))
      q.processAllAvailable()
      in.addData(Event(3L, t(4), 1L, "view", 0, "{}"),
        Event(4L, t(5), 2L, "click", 0, "{}"),
        Event(5L, t(6), 2L, "error", 0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("stream_topk_spec")
        .select($"event_type", $"n", $"w_total")
        .as[(String, Long, Long)].collect()
      // final snapshot = rows at the max marker (6 events total)
      val fin = rows.filter(_._3 == 6L).map(r => r._1 -> r._2).toSeq.sorted
      assert(fin === Seq("click" -> 2L, "view" -> 3L))
      // the first batch's snapshot was also emitted (marker 3)
      assert(rows.exists(_._3 == 3L))
    } finally q.stop()
  }

  test("readEventStream constructs on a not-yet-populated directory") {
    // production wiring order: the stream is declared BEFORE its producer
    // writes the first file — the schema probe must fall back to the
    // micros default instead of throwing at construction
    val empty = java.nio.file.Files.createTempDirectory("graft_empty_stream")
    val df = EventStreams.readEventStream(spark, empty.toString)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("left-semi stream join emits each converted click exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStreams.clickToPurchaseSemi(
      clicks.toDF(), purchases.toDF(), withinMinutes = 60)
    val q = joined.writeStream.format("memory").queryName("ss_semi")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(0L, t(0), 1L, "click", 0.0, "{}"),
        Event(1L, t(30), 1L, "click", 0.0, "{}"),
        Event(2L, t(0), 2L, "click", 0.0, "{}"))
      purchases.addData(
        Event(10L, t(45), 1L, "purchase", 9.0, "{}"),  // converts clicks 0,1
        Event(11L, t(50), 1L, "purchase", 3.0, "{}"),  // same clicks — no dups
        Event(12L, t(200), 2L, "purchase", 5.0, "{}")) // click 2 too old
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ss_semi").select($"click_id").as[Long].collect()
    // one row per converted click despite TWO matching purchases each,
    // and only the left side's columns exist at all
    assert(rows.sorted.toSeq === Seq(0L, 1L))
    assert(!spark.table("ss_semi").columns.contains("purchase_id"))

    // registered backfill equals the batch EXISTS on the same data
    val streamed = graft.queries.StreamQueries.qStreamSemiJoin(spark, sf)
      .as[(Long, Long)].collect().toSet
    val c = Tables.events(spark, sf).filter($"event_type" === "click")
    val p = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val batch = c.join(p, $"user_id" === $"p_user" &&
        $"ts" <= $"p_ts" && $"ts" >= $"p_ts" - expr("INTERVAL 60 MINUTES"),
        "left_semi")
      .select($"event_id", $"user_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
  test("streaming attribute history versions match the batch SCD2 builder") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.attrHistory(mem.toDS())
      .toDF()
      .writeStream.format("memory").queryName("attr_hist")
      .outputMode("update").start()
    try {
      // batch 1: user 1 changes click→view (two versions), user 2 one
      // version; DELIBERATELY out of ts order within the batch — the
      // in-group sort must restore event-time order
      mem.addData(
        Event(2L, t(20), 1L, "view", 0.0, "{}"),
        Event(0L, t(0), 1L, "click", 0.0, "{}"),
        Event(1L, t(10), 1L, "click", 0.0, "{}"),
        Event(3L, t(5), 2L, "click", 0.0, "{}"))
      q.processAllAvailable()
      // batch 2: user 1 changes again ACROSS the batch boundary (state
      // must close version 2); user 2 unchanged value → no new version
      mem.addData(
        Event(4L, t(30), 1L, "purchase", 0.0, "{}"),
        Event(5L, t(40), 2L, "click", 0.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    // assemble exactly like qStreamScd: per (user, version) keep the
    // closed row when one exists
    val rows = spark.table("attr_hist")
      .groupBy($"user_id", $"version_no")
      .agg(max(struct($"valid_to".isNotNull.as("closed"), $"valid_to",
        $"event_type", $"valid_from")).as("m"))
      .select($"user_id", $"version_no", $"m.event_type", $"m.valid_from",
        $"m.valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    assert(rows === Map(
      (1L, 1L) -> (("click", t(0), t(20))),
      (1L, 2L) -> (("view", t(20), t(30))),
      (1L, 3L) -> (("purchase", t(30), null)),
      (2L, 1L) -> (("click", t(5), null))))
  }

  test("RocksDB state store: attrHistory results and metering match the default store") {
    // all other streaming rows run on the default (HDFS-backed in-memory)
    // state store; the 100 TB deployment answer for large state is the
    // RocksDB provider. Run the heaviest stateful query under BOTH
    // providers and assert byte-identical results + StreamMetrics parity,
    // with query-progress evidence that RocksDB was actually engaged.
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      Seq(Event(2L, t(20), 1L, "view", 0.0, "{}"),
        Event(0L, t(0), 1L, "click", 0.0, "{}"),
        Event(1L, t(10), 1L, "click", 0.0, "{}"),
        Event(3L, t(5), 2L, "click", 0.0, "{}")),
      Seq(Event(4L, t(30), 1L, "purchase", 0.0, "{}"),
        Event(5L, t(40), 2L, "click", 0.0, "{}")))
    def runOnce(qname: String): (Map[(Long, Long), (String, Timestamp, Timestamp)],
        graft.streaming.StreamMetrics.QueryStats, Set[String]) = {
      val meter = graft.streaming.StreamMetrics.attach(spark)
      val mem = MemoryStream[Event]
      val q = EventStreams.attrHistory(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(qname)
        .outputMode("update").start()
      val stateMetricKeys =
        try {
          feed.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          q.recentProgress.flatMap(p => p.stateOperators.flatMap(
            _.customMetrics.keySet().toArray.map(_.toString))).toSet
        } finally q.stop()
      val deadline = System.currentTimeMillis() + 30000
      while (!meter.statsFor(qname).exists(_.terminated) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      spark.streams.removeListener(meter)
      val rows = spark.table(qname)
        .groupBy($"user_id", $"version_no")
        .agg(max(struct($"valid_to".isNotNull.as("closed"), $"valid_to",
          $"event_type", $"valid_from")).as("m"))
        .select($"user_id", $"version_no", $"m.event_type", $"m.valid_from",
          $"m.valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
      (rows, meter.statsFor(qname).get, stateMetricKeys)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    val (baseRows, baseStats, _) = runOnce("scd_store_default")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (rocksRows, rocksStats, rocksMetrics) =
      try runOnce("scd_store_rocksdb")
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    assert(rocksMetrics.exists(_.toLowerCase.contains("rocksdb")),
      s"RocksDB provider not engaged — state metrics: $rocksMetrics")
    assert(rocksRows === baseRows,
      "attrHistory results must be provider-independent")
    assert(rocksRows.nonEmpty && rocksRows((1L, 3L))._1 === "purchase")
    assert(rocksStats.inputRows === baseStats.inputRows)
    assert(rocksStats.maxBatchRows === baseStats.maxBatchRows)
    assert(rocksStats.terminated && baseStats.terminated)
    // state-size context (round 13): the LOGICAL state row count is
    // provider-independent (one entry per user key), while the byte
    // footprint is provider-specific — both must be recorded so a
    // throughput figure carries the state it was measured against
    assert(rocksStats.stateRows === baseStats.stateRows)
    assert(rocksStats.stateRows > 0L, "state row count must be metered")
    assert(rocksStats.stateBytes > 0L && baseStats.stateBytes > 0L,
      "state byte footprint must be metered")
    // peak-vs-latest (round 14): the peak can only be >= the final
    // footprint, and must be populated whenever any state was metered —
    // the recorded context for queries whose state shrinks near the end
    // (watermark eviction) is the PEAK the rate actually ran against
    assert(rocksStats.peakStateRows >= rocksStats.stateRows &&
      rocksStats.peakStateRows > 0L, "peak state rows must be metered")
    assert(rocksStats.peakStateBytes >= rocksStats.stateBytes &&
      baseStats.peakStateBytes >= baseStats.stateBytes)
  }

  test("RocksDB changelog checkpointing: dual-mode parity + changelog files committed") {
    // the large-state deployment increasingly defaults to RocksDB with
    // CHANGELOG checkpointing (per-batch delta files instead of full
    // snapshot uploads — the commit path stops scaling with state size).
    // Run attrHistory under RocksDB in both checkpoint modes and assert
    // byte-identical results + StreamMetrics parity, with filesystem
    // evidence that changelog mode actually committed *.changelog deltas.
    //
    // Mode-selection guidance (measured, see Tuning's scaladoc): the two
    // modes are at parity up to tens-of-MB state
    // (BENCH_STREAM_SF3_r15.json) and diverge at GB-scale buffered state
    // where changelog wins +30% rows/s / -20% p95
    // (BENCH_STREAM_WIDE_r16.json) — prefer changelog above ~100 MB of
    // state per partition. This spec pins only CORRECTNESS parity: the
    // results must be byte-identical in both modes.
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      Seq(Event(2L, t(20), 1L, "view", 0.0, "{}"),
        Event(0L, t(0), 1L, "click", 0.0, "{}"),
        Event(1L, t(10), 1L, "click", 0.0, "{}"),
        Event(3L, t(5), 2L, "click", 0.0, "{}")),
      Seq(Event(4L, t(30), 1L, "purchase", 0.0, "{}"),
        Event(5L, t(40), 2L, "click", 0.0, "{}")))
    def checkpointFiles(ckpt: java.nio.file.Path): Seq[String] = {
      val s = java.nio.file.Files.walk(ckpt)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator.asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(_.getFileName.toString).toSeq
      } finally s.close()
    }
    def runOnce(qname: String, changelog: Boolean)
        : (Map[(Long, Long), (String, Timestamp, Timestamp)],
           graft.streaming.StreamMetrics.QueryStats, Seq[String]) = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$qname")
      val clKey = "spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled"
      spark.conf.set(clKey, changelog.toString)
      val meter = graft.streaming.StreamMetrics.attach(spark)
      val mem = MemoryStream[Event]
      val q = EventStreams.attrHistory(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("update").start()
      try feed.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally { q.stop(); spark.conf.unset(clKey) }
      val deadline = System.currentTimeMillis() + 30000
      while (!meter.statsFor(qname).exists(_.terminated) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      spark.streams.removeListener(meter)
      val rows = spark.table(qname)
        .groupBy($"user_id", $"version_no")
        .agg(max(struct($"valid_to".isNotNull.as("closed"), $"valid_to",
          $"event_type", $"valid_from")).as("m"))
        .select($"user_id", $"version_no", $"m.event_type", $"m.valid_from",
          $"m.valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getString(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
      (rows, meter.statsFor(qname).get, checkpointFiles(ckpt))
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ((snapRows, snapStats, snapFiles), (clRows, clStats, clFiles)) =
      try (runOnce("scd_ckpt_snapshot", changelog = false),
           runOnce("scd_ckpt_changelog", changelog = true))
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    // mode engagement: changelog mode commits per-batch *.changelog
    // deltas; snapshot mode never writes any
    assert(clFiles.exists(_.endsWith(".changelog")),
      s"changelog mode committed no .changelog files: $clFiles")
    assert(!snapFiles.exists(_.endsWith(".changelog")),
      s"snapshot mode unexpectedly wrote .changelog files: $snapFiles")
    // results and metering are checkpoint-mode-independent
    assert(clRows === snapRows,
      "attrHistory results must be checkpoint-mode-independent")
    assert(clRows.nonEmpty && clRows((1L, 3L))._1 === "purchase")
    assert(clStats.inputRows === snapStats.inputRows)
    assert(clStats.maxBatchRows === snapStats.maxBatchRows)
    assert(clStats.stateRows === snapStats.stateRows)
    assert(clStats.stateRows > 0L && clStats.stateBytes > 0L)
    assert(clStats.peakStateRows >= clStats.stateRows &&
      snapStats.peakStateRows >= snapStats.stateRows)
    assert(clStats.terminated && snapStats.terminated)
  }

  test("live ProcessingTime trigger: results match AvailableNow and get metered") {
    // every other streaming row verifies via backfill
    // (processAllAvailable); this drives a genuinely LIVE query — a
    // ProcessingTime trigger polling while data arrives in real time —
    // and asserts (a) the live result equals the batch plan and (b)
    // StreamMetrics meters the live query. Bounded by a deadline, not
    // sleep-synchronized: the test waits on observed sink rows.
    implicit val sqlCtx = spark.sqlContext
    val meter = graft.streaming.StreamMetrics.attach(spark)
    val mem = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("live_hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        "200 milliseconds"))
      .start()
    try {
      def sinkRows: Long = spark.table("live_hourly").count()
      def waitFor(cond: => Boolean, what: String): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!cond && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(cond, s"timed out waiting for $what")
      }
      // feed in two real-time installments while the trigger polls
      mem.addData(fixture.take(3): _*)
      waitFor(sinkRows >= 2, "first installment to land")
      mem.addData(fixture.drop(3): _*)
      val expected = fixture.toDF()
        .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      waitFor(sinkRows >= expected.size, "second installment to land")
      val streamed = spark.table("live_hourly")
        .select($"bucket", $"event_type", $"n_events", $"sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === expected,
        "live-trigger result must equal the batch plan over the same data")
      q.stop()
      // the meter saw the live query: all rows, ≥2 data batches, and the
      // terminate event resolved through its name
      def st = meter.statsFor("live_hourly")
      waitFor(st.exists(s => s.inputRows >= fixture.size && s.terminated),
        s"meter to catch up: $st")
      assert(st.get.nBatches >= 2, s"live trigger must fire per arrival: $st")
    } finally {
      if (q.isActive) q.stop()
      spark.streams.removeListener(meter)
    }
  }

  test("StreamMetrics listener meters batches, rows, and watermark progress") {
    implicit val sqlCtx = spark.sqlContext
    val meter = graft.streaming.StreamMetrics.attach(spark)
    try {
      val mem = MemoryStream[Event]
      mem.addData(fixture: _*)
      val q = EventStreams.hourlyCounts(mem.toDF())
        .writeStream.format("memory").queryName("metered").outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        mem.addData(Event(9L, t(300), 3L, "click", 6.0, "{}"))
        q.processAllAvailable()
      } finally q.stop()
      // listener events are async — wait for the meter to catch up
      // (including the terminate event fired by q.stop() above)
      val deadline = System.currentTimeMillis() + 20000
      def ready = meter.statsFor("metered")
        .exists(s => s.inputRows >= fixture.size + 1 && s.terminated)
      while (!ready && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val st = meter.statsFor("metered").get
      assert(st.inputRows === fixture.size + 1L,
        s"all input rows metered: $st")
      assert(st.nBatches >= 2, s"two data batches must be observed: $st")
      assert(st.maxBatchRows === fixture.size.toLong, s"first batch size: $st")
      assert(st.lastWatermark.nonEmpty, s"watermark must progress: $st")
      assert(st.terminated, s"named query's terminate event must resolve " +
        s"through the id recorded at start: $st")
      // throughput series: one duration sample per DATA batch, and the
      // derived rate/latency stats are internally consistent
      assert(st.batchMs.length >= 2 && st.batchMs.length <= st.nBatches,
        s"data batches must record trigger durations: $st")
      assert(st.rowsPerSec >= 0.0)
      assert(st.p95BatchMs >= st.batchMs.min && st.p95BatchMs <= st.batchMs.max)
    } finally spark.streams.removeListener(meter)
  }

  test("QueryStats throughput math: rows/sec and nearest-rank p95") {
    import graft.streaming.StreamMetrics.QueryStats
    val st = QueryStats(nBatches = 5, inputRows = 3000,
      batchMs = Vector(100L, 200L, 300L, 400L, 500L), dataMsTotal = 1500L)
    assert(math.abs(st.rowsPerSec - 3000 / 1.5) < 1e-9)
    assert(st.p95BatchMs === 500L) // ceil(0.95·5)=5 → 5th of 5
    assert(QueryStats().rowsPerSec === 0.0 && QueryStats().p95BatchMs === 0L)
    val twenty = QueryStats(inputRows = 20,
      batchMs = Vector.tabulate(20)(i => (i + 1) * 10L))
    assert(twenty.p95BatchMs === 190L) // ceil(0.95·20)=19 → 19th of 20
    // past the sample cap the rate must use the UNCAPPED duration sum:
    // 1000 rows over 10 s of data batches is 100 rows/s even if only
    // 2 s of samples were retained for p95
    val capped = QueryStats(inputRows = 1000,
      batchMs = Vector(1000L, 1000L), dataMsTotal = 10000L)
    assert(math.abs(capped.rowsPerSec - 100.0) < 1e-9)
  }
}
