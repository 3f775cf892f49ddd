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

  /** Write path end-to-end: aggregate supplier per nation, WRITE the
    * result through the DSv2 sink (`mode("overwrite")` → truncate +
    * last-write-wins puts at commit — the reference's output-to-DynamoDB
    * shape, `output_handler_dynamodb.py:62-112`), then READ it back
    * through the connector. The oracle recomputes the aggregate from
    * parquet, so a bug anywhere in writer buffering, commit, store
    * round-tripping, or the read path breaks the hash. */
  def qKvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.supplier(s, d)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(col("s_suppkey")).cast("bigint").as("sum_suppkey"))
    KvStore.register("kv_supp_agg", "s_nationkey", agg.schema) // idempotent
    agg.write.format("graft-kv").option("table", "kv_supp_agg")
      .mode("overwrite").save()
    s.read.format("graft-kv").option("table", "kv_supp_agg").load()
  }

  val qKvRoundtripSql: String =
    "SELECT s_nationkey, count(*) AS n_supp, " +
      "CAST(sum(s_suppkey) AS BIGINT) AS sum_suppkey FROM supplier GROUP BY 1"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kv_scan"      -> qKvScan _,
    "q_kv_roundtrip" -> qKvRoundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "q_kv_scan"      -> qKvScanSql,
    "q_kv_roundtrip" -> qKvRoundtripSql,
  )
}
