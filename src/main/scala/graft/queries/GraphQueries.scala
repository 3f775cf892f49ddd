package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics beyond the reference's simplified PageRank
  * (`simplified_page_rank.py` counts in-links only — SURVEY.md §2B): exact
  * triangle counting over a co-purchase graph derived from `lineitem`
  * (parts are nodes; an edge connects two parts bought in the same order).
  *
  * The Spark plan uses DEGREE ORIENTATION — every undirected edge is
  * directed from its lower-(degree, id) endpoint to its higher one, so
  * each triangle is generated exactly once and, crucially, the wedge
  * fan-out per node is bounded by O(sqrt(m)) regardless of skew (a
  * celebrity node with degree 10^6 contributes wedges only through its
  * out-edges, which orientation caps). This is what makes the plan hold
  * at 100 TB where the naive edge^3 join explodes on hubs. The DuckDB
  * oracle runs the naive canonical-ordered triple join — same count,
  * affordable at verification scale only.
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
    // Wedges through the middle node, closed by a third oriented edge.
    // The orientation's total order makes u ≺ v ≺ w, so each triangle
    // materializes exactly once.
    val wedges = o.as("e1").join(o.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    wedges.join(o.as("e3"), col("x") === col("e3.u") && col("z") === col("e3.v"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
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
