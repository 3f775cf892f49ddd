package graft

// Dev-only probe (PlanDump's streaming sibling, not in any query path):
// per-batch duration breakdown of one streaming backfill, to attribute
// the fixed per-query seconds — queryPlanning / addBatch / walCommit per
// micro-batch from the listener, including the watermark-advance no-data
// batch. Usage: runMain graft.StreamProbe [query_name]
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.withClusterDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] started ${e.name} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${Option(p.stateOperators).map(_.length)}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] terminated at ${System.nanoTime() / 1000000}")
    })
    val name = if (args.nonEmpty) args(0) else "q_stream_full_join"
    // warm JIT on entry
    SparkEntry.entry(spark).count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[probe] run $i $name rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
