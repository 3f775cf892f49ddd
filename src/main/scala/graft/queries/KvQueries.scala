package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.kv.KvStore

/** Queries routed through the `graft-kv` DataSource V2 connector
  * (SURVEY.md §2A A14) — proving the KV read path end-to-end: the planner
  * pushes projection into the provider and the scan parallelizes over key
  * segments, exactly how the reference reads its DynamoDB input table
  * (`data_sources/input_handler_dynamodb.py:135-213`).
  */
object KvQueries {

  /** Load the `nation` dim into the KV store once. 25 rows — the
    * dim-table regime the reference actually keeps in DynamoDB; the
    * driver-side collect is the one-time fixture load, not a query-path
    * collect. */
  private def ensureNation(s: SparkSession, d: String): Unit = synchronized {
    if (!KvStore.exists("kv_nation")) {
      val df = Tables.nation(s, d)
      KvStore.register("kv_nation", "n_nationkey", df.schema)
      KvStore.put("kv_nation", df.collect().map(_.toSeq).toSeq)
    }
  }

  /** Grouped rollup read THROUGH the connector with a 2-column projection
    * (the provider materializes only those attributes — PlanSpec/
    * KvSourceSpec assert the pushdown). */
  def qKvScan(s: SparkSession, d: String): DataFrame = {
    ensureNation(s, d)
    s.read.format("graft-kv").option("table", "kv_nation").load()
      .select(col("n_regionkey"), col("n_name"))
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_name"))
  }

  // oracle reads the same rows from the nation parquet directly
  val qKvScanSql: String =
    "SELECT n_regionkey, count(*) AS n_nations, max(n_name) AS max_name " +
      "FROM nation GROUP BY 1"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kv_scan" -> qKvScan _,
  )

  val oracles: Map[String, String] = Map(
    "q_kv_scan" -> qKvScanSql,
  )
}
