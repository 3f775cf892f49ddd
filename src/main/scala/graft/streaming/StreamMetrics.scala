package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-side progress metering — the A20 observability analog for
  * Structured Streaming (the batch side rides `df.observe` +
  * [[graft.CostAccounting]]): a `StreamingQueryListener` folding each
  * micro-batch's progress event into per-query counters (batches, input
  * rows, processed-rows/sec observations, watermark high-water mark).
  * The listener pattern is the production shape — progress events arrive
  * on the driver regardless of cluster size, one tiny record per
  * micro-batch, so the meter's cost is independent of data volume.
  *
  * Reference analog: the web UI's per-stage progress polling
  * (`src/python/serverless_mr/web_ui/app.py` job-progress endpoints) —
  * re-expressed as Spark's native listener contract instead of a
  * polling store.
  */
final class StreamMetrics extends StreamingQueryListener {

  import StreamMetrics.QueryStats

  private val stats = TrieMap.empty[String, QueryStats]
  // Termination events carry only the query id, but stats are keyed by
  // name when one exists — record id→key at start so terminate can
  // resolve named queries too.
  private val idToKey = TrieMap.empty[String, String]

  /** Per-query accumulated counters, keyed by query name (falling back
    * to the id for unnamed queries). */
  def snapshot: Map[String, QueryStats] = stats.toMap

  def statsFor(name: String): Option[QueryStats] = stats.get(name)

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = {
    val key = Option(e.name).getOrElse(e.id.toString)
    idToKey.update(e.id.toString, key)
    stats.putIfAbsent(key, QueryStats())
  }

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val key = Option(p.name).getOrElse(p.id.toString)
    val prev = stats.getOrElse(key, QueryStats())
    val watermark = Option(p.eventTime)
      .flatMap(m => Option(m.get("watermark"))).getOrElse(prev.lastWatermark)
    // per-batch trigger wall time for DATA batches (rows > 0) — the
    // series behind throughput (Σrows/Σsecs) and p95 batch latency;
    // capped so a long-lived listener can never grow unboundedly
    val dur = Option(p.durationMs).flatMap(m => Option(m.get("triggerExecution")))
      .map(_.longValue).getOrElse(0L)
    val isData = p.numInputRows > 0
    val durs =
      if (isData && prev.batchMs.length < StreamMetrics.MaxBatchSamples)
        prev.batchMs :+ dur
      else prev.batchMs
    // latest state-store footprint across the batch's stateful operators
    // (rows + provider-reported memory) — the context that says whether a
    // rows/s figure was measured against a trivial or a grown state
    val ops = Option(p.stateOperators).getOrElse(Array.empty)
    val (stRows, stBytes) =
      if (ops.isEmpty) (prev.stateRows, prev.stateBytes)
      else (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
    stats.update(key, QueryStats(
      nBatches = prev.nBatches + 1,
      inputRows = prev.inputRows + p.numInputRows,
      maxBatchRows = math.max(prev.maxBatchRows, p.numInputRows),
      lastWatermark = watermark,
      terminated = prev.terminated,
      batchMs = durs,
      // running sum over ALL data batches, independent of the capped
      // sample vector — rowsPerSec divides cumulative rows by THIS, so
      // throughput stays honest after MaxBatchSamples is hit (the vector
      // only bounds p95's memory, not the rate's denominator)
      dataMsTotal = prev.dataMsTotal + (if (isData) dur else 0L),
      stateRows = stRows,
      stateBytes = stBytes,
      // peak alongside latest: state can SHRINK near the end (watermark
      // eviction), and the latest-only figure would understate the
      // largest state the measured rate actually ran against
      peakStateRows = math.max(prev.peakStateRows, stRows),
      peakStateBytes = math.max(prev.peakStateBytes, stBytes)))
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    // terminate events carry only ids — resolve through the id→key map
    // recorded at start (falls back to the raw id for queries whose start
    // event this listener never saw).
    val key = idToKey.getOrElse(e.id.toString, e.id.toString)
    stats.get(key).foreach(s => stats.update(key, s.copy(terminated = true)))
  }
}

object StreamMetrics {

  /** Per-listener cap on retained per-batch duration samples. */
  val MaxBatchSamples = 8192

  final case class QueryStats(
      nBatches: Long = 0L,
      inputRows: Long = 0L,
      maxBatchRows: Long = 0L,
      lastWatermark: String = "",
      terminated: Boolean = false,
      batchMs: Vector[Long] = Vector.empty,
      dataMsTotal: Long = 0L,
      stateRows: Long = 0L,
      stateBytes: Long = 0L,
      peakStateRows: Long = 0L,
      peakStateBytes: Long = 0L) {

    /** Steady-state throughput over the data batches: Σ rows / Σ trigger
      * seconds (batches that saw no input are excluded on both sides).
      * The denominator is the UNCAPPED running sum — not the sample
      * vector, which stops at MaxBatchSamples and would inflate the
      * rate without bound on long-lived queries. */
    def rowsPerSec: Double = {
      val secs = dataMsTotal / 1000.0
      if (secs <= 0) 0.0 else inputRows / secs
    }

    /** p95 trigger latency (ms) over the data batches — nearest-rank. */
    def p95BatchMs: Long =
      if (batchMs.isEmpty) 0L
      else {
        val sorted = batchMs.sorted
        sorted(math.min(sorted.length - 1,
          math.ceil(0.95 * sorted.length).toInt - 1))
      }
  }

  /** Attach a fresh meter to the session; caller removes it when done
    * (`spark.streams.removeListener`). */
  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics
    spark.streams.addListener(m)
    m
  }
}
