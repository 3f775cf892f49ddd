package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.execution.ExplainMode

/** Debug hook used by [[IterCheckpoint]]: when the session conf names a
  * file, every iterCheckpoint()/keyedForReuse() appends the formatted plan
  * it is about to materialize — the only way to see the PER-ROUND plans of
  * the iterative family (the returned frame shows just the final stage).
  * Zero overhead when unset. `graft.PlanDump` (dev tool) sets the conf;
  * this object itself is a production dependency of IterCheckpoint.
  */
object IterRoundExplain {
  val ConfKey = "graft.iter.explainTo"
  // one counter per target file, so a multi-query dump run numbers each
  // query's rounds from #1 instead of continuing the previous query's
  private val ctrs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]

  def maybeDump(df: org.apache.spark.sql.DataFrame): Unit = {
    val path = df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty)
    path.foreach { p =>
      val n = ctrs
        .computeIfAbsent(p, _ => new java.util.concurrent.atomic.AtomicInteger)
        .incrementAndGet()
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(p),
        (s"===== iterCheckpoint #$n =====\n" + txt).getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }
}
