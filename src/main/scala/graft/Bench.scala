package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // n>=3 runs per query, report the per-query MIN: the minimum is the
    // least-contended observation and the only number comparable across
    // rounds in a shared sandbox (round-2 showed 4-39x swings on
    // byte-identical code from external contention).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Tuning.withClusterDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first measured query doesn't absorb JVM
    // startup; standard steady-state measurement practice.
    SparkEntry.entry(spark).count()
    // deterministic name order → per-query timings comparable across
    // rounds (map iteration order varies per build)
    // optional comma-separated name filter for targeted profiling runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      }
      val good = times.filter(_ >= 0)
      // failures report -1, never a fake small duration
      val best = if (good.isEmpty) -1.0 else good.min
      val worst = if (good.isEmpty) -1.0 else good.max
      (name, best, worst)
    }
    def jmap(kv: Seq[(String, Double)]) =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r._1 -> r._2))
    val spread = jmap(results.map(r => r._1 -> (if (r._2 < 0) -1.0 else r._3 - r._2)))
    // total excludes failed queries (a -1 sentinel must never shrink the
    // total); they are visible as -1 in "queries" and counted in "failed".
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    // Contention diagnostics (max-min per query) go to STDERR: round-3's
    // artifact captured only the tail of one long stdout line, keeping the
    // noise map and losing the signal. stdout stays ONE JSON line (the
    // driver contract), ordered so a tail-truncated capture still ends
    // with per-query mins and the total (repeated as the LAST key).
    System.err.println(s"""{"metric":"spread","runs":$runs,"spread":$spread}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"failed":$failed,"sf":"$sfDir","queries":$qs,"total_sec":$total}""")
    spark.stop()
  }
}
