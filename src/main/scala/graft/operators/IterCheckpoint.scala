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
    graft.IterRoundExplain.maybeDump(df)
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Prepare a LOOP-INVARIANT frame for per-round joins on `keys`:
    * materialize it once, then hand back a copy hash-partitioned by
    * `keys` at a SIZE-DERIVED width, for the caller to persist. Cached
    * that way, every round's join reuses the layout and only the
    * per-round (label/frontier) side ever shuffles — the invariant-sized
    * exchange or rebroadcast the naive plan pays per round is gone
    * (guide §2.4). */
  def keyedForReuse(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    // Materialize first: AQE coalesces the frame to its advisory
    // partition size, and that MEASURED count — not the static
    // spark.sql.shuffle.partitions — becomes the keyed width. A handful
    // of partitions on a toy graph (a pinned-width spelling measured
    // q_bfs +23% / q_closeness +37% at sf0.1 purely from dozens of
    // per-round stages fanning out to near-empty tasks), bytes /
    // advisoryPartitionSizeInBytes at 100 TB. The explicit width also
    // keeps AQE from re-coalescing the cache build, so the cached layout
    // is an exact HashPartitioning(keys, n) the planner lines every
    // round's join up against. Persist (at the call site), never
    // localCheckpoint, for the keyed copy: the checkpoint rebuild
    // reports UnknownPartitioning under AQE (measured on 4.1.2 — every
    // consumer would re-exchange), while InMemoryTableScan preserves the
    // cached plan's partitioning exactly.
    val ck = IterCheckpoint(df)
    val n = math.max(1, ck.rdd.getNumPartitions)
    ck.repartition(n, keys: _*)
  }

  /** Postfix spelling so call sites read like the `localCheckpoint` they
    * replace: `frame.iterCheckpoint()`. */
  implicit class IterCheckpointOps(private val df: DataFrame) extends AnyVal {
    def iterCheckpoint(): DataFrame = IterCheckpoint(df)
    def keyedForReuse(keys: org.apache.spark.sql.Column*): DataFrame =
      IterCheckpoint.keyedForReuse(df, keys: _*)
  }
}
