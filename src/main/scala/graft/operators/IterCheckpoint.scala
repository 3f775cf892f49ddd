package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-round materialization for the iterative family (PageRank, connected
  * components, BFS/SSSP, k-core, k-truss, label propagation, k-means).
  *
  * Default: eager `localCheckpoint` — blocks live on executor local disk/
  * memory, which is the fastest way to truncate a growing iterative
  * lineage, but those blocks DIE WITH THE EXECUTOR. On a real cluster a
  * lost executor mid-iteration would need the whole computation restarted.
  *
  * Opt-in durability: set `graft.iter.checkpointDir` (session conf) to a
  * reliable path (HDFS/S3) and every round checkpoints there via Spark's
  * reliable `checkpoint()` instead — executor loss then recovers from the
  * checkpoint files, at the cost of a write per round. Unset (the local
  * test default) the behavior and plans are byte-identical to before the
  * option existed (IterCheckpointSpec pins both).
  */
object IterCheckpoint {
  /** Session-conf key; value = reliable checkpoint directory. */
  val ConfKey = "graft.iter.checkpointDir"

  /** Eagerly materialize `df` and truncate its lineage — locally by
    * default, reliably when [[ConfKey]] is set. */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Postfix spelling so call sites read like the `localCheckpoint` they
    * replace: `frame.iterCheckpoint()`. */
  implicit class IterCheckpointOps(private val df: DataFrame) extends AnyVal {
    def iterCheckpoint(): DataFrame = IterCheckpoint(df)
  }
}
