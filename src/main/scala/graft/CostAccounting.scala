package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.sources.kv.KvStore

/** SURVEY §2A A21 analog — per-run dollar-cost accounting.
  *
  * The reference prices a finished job from three meters (reference
  * `driver/driver.py:620-701`): Lambda compute seconds × provisioned
  * memory (rate `driver.py:676`), intermediate-store object ops + storage
  * (S3 PUT/GET/GB-h, `driver.py:669-675`), and DynamoDB request units
  * (`driver/serverless_driver_setup.py` provisioning; $1.25/M writes,
  * $0.25/M reads). This is the Spark-native mapping of the same meters:
  *
  *  - compute: task `executorRunTime` × per-slot memory → GB-s, at the
  *    reference's Lambda rate. Spark tasks ARE the Lambda-invocation
  *    analog (one slot ≈ one provisioned function).
  *  - intermediate store: each map task's shuffle file ≈ one PUT, each
  *    fetched shuffle block ≈ one GET, shuffle bytes ≈ stored GB (the
  *    reference walks its shuffling bucket and counts one GET + one PUT
  *    per object, `driver.py:652-656`).
  *  - KV: `graft-kv` connector rows written/read ≈ DynamoDB write/read
  *    request units (`output_handler_dynamodb.py:62-112` does one
  *    PutItem per pair).
  *
  * The meters are real Spark metrics; the RATES are the reference's
  * published constants, so reports are comparable with its cost model —
  * this is an estimator for capacity planning, not a bill.
  */
final class CostAccounting extends SparkListener {
  private[graft] val runTimeMs = new LongAdder
  private[graft] val inputBytes = new LongAdder
  private[graft] val shuffleWriteBytes = new LongAdder
  private[graft] val putOps = new LongAdder // one per task that wrote a shuffle file
  private[graft] val getOps = new LongAdder // one per fetched shuffle block
  private[graft] val tasks = new LongAdder

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      tasks.add(1)
      runTimeMs.add(m.executorRunTime)
      inputBytes.add(m.inputMetrics.bytesRead)
      if (m.shuffleWriteMetrics.bytesWritten > 0) {
        shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
        putOps.add(1)
      }
      getOps.add(m.shuffleReadMetrics.totalBlocksFetched)
    }
  }
}

object CostAccounting {

  // Reference rate card (same constants, cited file:line above).
  val LambdaUsdPerGbSec = 0.00001667 // driver.py:676 (per 1024 MB-second)
  val S3PutUsdPerOp     = 0.005 / 1000 // driver.py:673
  val S3GetUsdPerOp     = 0.004 / 10000 // driver.py:675
  val S3UsdPerGbHour    = 0.0000521574022522109 // driver.py:671
  val KvWriteUsdPerOp   = 1.25 / 1e6
  val KvReadUsdPerOp    = 0.25 / 1e6

  /** One run's metered usage + its priced components.
    *
    * `drained` is false when the async listener bus had NOT gone quiet
    * within the wait window — the counters may then under-count the run.
    * measure() also assumes a quiescent context: concurrent Spark jobs in
    * the same session (or overlapping measure() calls, which share the
    * process-global KvStore meters) are attributed to this report. */
  final case class CostReport(
      tasks: Long, computeGbSec: Double, inputBytes: Long,
      shuffleBytes: Long, putOps: Long, getOps: Long,
      kvWrites: Long, kvReads: Long, drained: Boolean = true) {
    def computeUsd: Double = computeGbSec * LambdaUsdPerGbSec
    /** Reference charges intermediate storage for one hour
      * (`driver.py:671` multiplies the rate by 1). */
    def storageUsd: Double =
      S3UsdPerGbHour * (shuffleBytes.toDouble / (1L << 30))
    def requestUsd: Double =
      putOps * S3PutUsdPerOp + getOps * S3GetUsdPerOp
    def kvUsd: Double =
      kvWrites * KvWriteUsdPerOp + kvReads * KvReadUsdPerOp
    def totalUsd: Double = computeUsd + storageUsd + requestUsd + kvUsd
  }

  /** Run `body`, return (result, priced report). Listener delivery is
    * async — the report is read only after the queue visibly drains
    * (task count stable across two polls). */
  def measure[A](spark: SparkSession, memoryGbPerSlot: Double = 2.0)(
      body: => A): (A, CostReport) = {
    val acct = new CostAccounting
    val sc = spark.sparkContext
    val kvW0 = KvStore.writeOps
    val kvR0 = KvStore.readOps
    sc.addSparkListener(acct)
    try {
      val a = body
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 50) { // <= 5 s
        Thread.sleep(100)
        val cur = acct.tasks.sum
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        waited += 1
      }
      val report = CostReport(
        tasks = acct.tasks.sum,
        computeGbSec = acct.runTimeMs.sum / 1000.0 * memoryGbPerSlot,
        inputBytes = acct.inputBytes.sum,
        shuffleBytes = acct.shuffleWriteBytes.sum,
        putOps = acct.putOps.sum,
        getOps = acct.getOps.sum,
        kvWrites = KvStore.writeOps - kvW0,
        kvReads = KvStore.readOps - kvR0,
        drained = stable >= 2)
      (a, report)
    } finally sc.removeSparkListener(acct)
  }
}
