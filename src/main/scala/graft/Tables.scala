package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated parquet tables under a scale-factor
  * directory (see TESTDATA.md). Parquet scans get Catalyst column pruning and
  * predicate pushdown for free — the Spark-native equivalent of the
  * reference's projected KV reads (reference:
  * `src/python/serverless_mr/data_sources/input_handler_dynamodb.py:173-179`).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the loader
  * keeps the access path a plain `spark.read.parquet` so the scan layer
  * (split packing, row-group skipping, pruning) is entirely Spark's.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads via `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * Verify/Bench/tests). Convert nanos → microsecond timestamp here so
    * every consumer sees a real TimestampType column — the same µs
    * truncation DuckDB applies when it reads nanos parquet. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
