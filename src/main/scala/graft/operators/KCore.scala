package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IterCheckpoint.IterCheckpointOps

/** K-core decomposition by iterative peeling — the density filter used on
  * similarity/co-occurrence graphs before community detection or dedup
  * clustering (a companion to [[ConnectedComponents]]; entirely beyond
  * the reference's in-link-count PageRank,
  * `performance_functions/simplified_page_rank.py`).
  *
  * Algorithm (Batagelj–Zaveršnik peel, synchronous rounds): repeatedly
  * delete every node whose current degree is below k until none remains;
  * the surviving subgraph is the k-core. Each round is one degree
  * aggregation plus two semi-join-shaped filters, all shuffling on the
  * node key; `localCheckpoint` truncates the growing plan and an
  * `Observation` metric rides the checkpoint job to detect the fixed
  * point without a separate count action. Rounds needed is the peel
  * depth (max core-shell chain), which is tiny on real graphs; the cap
  * is a safety net, and extra rounds past convergence are no-ops.
  *
  * At 100 TB: per-round state is the (shrinking) edge list itself; the
  * keep-set is one BIGINT column of surviving nodes, broadcast by AQE
  * while it fits and a shuffled semi join beyond that — no driver-side
  * materialization at any size.
  */
object KCore {

  /** @param edges two-column (src, dst) undirected pair frame
    * @return symmetric surviving edges (a, b) — both directions present;
    *         per-node core degree is `count(*) GROUP BY a`. */
  def coreEdges(edges: DataFrame, k: Int, maxIterations: Int = 20): DataFrame = {
    val e = edges.toDF("src", "dst")
    var sym = e.union(e.select(col("dst"), col("src")))
      .toDF("a", "b").iterCheckpoint()
    // -1 sentinel: convergence is judged from the per-round Observation
    // alone (first round never matches), so no upfront count() pass
    var prevCount = -1L
    var converged = false
    var iter = 0
    // One peel as a pure plan transform; THREE peels ride each checkpoint
    // job (one step deeper than the BFS/SSSP double-step — peeling has no
    // frontier join that grows with batched steps, so the probe cadence
    // can stretch further and trim a third of the per-round job overhead).
    // The surviving-edge count is MONOTONE non-increasing, so an
    // unchanged count three peels apart pins the peels between as well —
    // the fixed-point test stays sound.
    def peel(g: DataFrame): DataFrame = {
      val keep = g.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("a"))
      g.join(keep, Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
    }
    while (!converged && iter < maxIterations) {
      val steps = math.min(3, maxIterations - iter)
      val stepped = (1 to steps).foldLeft(sym)((g, _) => peel(g))
      val obs = new org.apache.spark.sql.Observation(
        s"kcore_${iter}_${System.nanoTime()}")
      val next = stepped
        .observe(obs, count(lit(1)).as("m"))
        .iterCheckpoint()
      val curCount = obs.get("m").asInstanceOf[Long]
      converged = curCount == prevCount || curCount == 0L
      prevCount = curCount
      sym = next
      iter += steps
    }
    sym
  }
}
