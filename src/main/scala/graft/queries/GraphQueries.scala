package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics beyond the reference's simplified PageRank
  * (`simplified_page_rank.py` counts in-links only — SURVEY.md §2B): exact
  * triangle counting over a co-purchase graph derived from `lineitem`
  * (parts are nodes; an edge connects two parts bought in the same order).
  *
  * The Spark plan is the edge-iterator algorithm with DEGREE ORIENTATION
  * (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11): every undirected edge is directed from its
  * lower-(degree, id) endpoint to its higher one, out-neighborhoods are
  * collected into per-node arrays, and each edge (u,v) contributes
  * |adj(u) ∩ adj(v)| — counted inside whole-stage codegen via
  * `array_intersect`, so no wedge set is ever materialized (the naive
  * wedge join would shuffle ~50M rows at sf0.1 alone). Orientation bounds
  * every out-neighborhood at O(sqrt(m)) regardless of skew, which caps
  * both the array payloads and the per-edge intersection work — the
  * "last reducer" hub problem is structurally gone. The adjacency side is
  * |V| rows; AQE broadcasts it while it fits and falls back to a
  * sort-merge join at billion-node scale — no hint pins the wrong choice.
  * The DuckDB oracle runs the naive canonical-ordered triple join — same
  * count, affordable at verification scale only.
  */
object GraphQueries {

  /** Canonical undirected co-purchase edges (src < dst, deduplicated).
    * One shuffle on the order key builds pairs; `distinct` reuses the
    * pair-key shuffle. */
  private def coEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
  }

  /** Exact triangle count over canonical undirected edges (src < dst,
    * no duplicates). Returns a single row `n_triangles`. */
  def triangleCount(e: DataFrame): DataFrame = {
    // Undirected degree per node; |V| rows — broadcast back onto edges.
    val deg = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(broadcast(deg.select(col("node").as("src"), col("deg").as("sdeg"))), Seq("src"))
      .join(broadcast(deg.select(col("node").as("dst"), col("deg").as("ddeg"))), Seq("dst"))
    // Orient by the total order (deg, id): u -> v iff (deg_u, u) < (deg_v, v).
    val fwd = col("sdeg") < col("ddeg") ||
      (col("sdeg") === col("ddeg") && col("src") < col("dst"))
    val o = withDeg.select(
      when(fwd, col("src")).otherwise(col("dst")).as("u"),
      when(fwd, col("dst")).otherwise(col("src")).as("v"))
    // Out-neighborhoods under the orientation: ≤ O(sqrt(m)) values each,
    // so the arrays stay small no matter how skewed the raw degrees are.
    val adj = o.groupBy(col("u")).agg(collect_list(col("v")).as("nbrs"))
    // A triangle a ≺ b ≺ c is counted exactly once: at edge (a,b), as the
    // common out-neighbor c ∈ adj(a) ∩ adj(b).
    o.join(adj.withColumnRenamed("nbrs", "nu"), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .agg(coalesce(sum(size(array_intersect(col("nu"), col("nv")))), lit(0L))
        .as("n_triangles"))
  }

  def qTriangles(s: SparkSession, d: String): DataFrame =
    triangleCount(coEdges(s, d))

  val qTrianglesSql: String =
    "WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst " +
      "FROM lineitem a JOIN lineitem b " +
      "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey) " +
      "SELECT count(*) AS n_triangles FROM e e1 " +
      "JOIN e e2 ON e2.src = e1.dst " +
      "JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_triangles" -> qTriangles _,
  )

  val oracles: Map[String, String] = Map(
    "q_triangles" -> qTrianglesSql,
  )
}
