package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources and sinks (SURVEY.md §2A operators A8, A13-A16) re-expressed as
  * thin, explicit wrappers over `DataFrameReader`/`DataFrameWriter`:
  *
  *  - CSV with a DECLARED schema — the reference hand-splits CSV lines in
  *    user map functions (`user_functions/functions.py:24-27`) and its Hive
  *    DDLs carry the real schema (`hive/Query1.q:1-9`); here the schema is
  *    declared once and the parser is vectorized + codegen'd.
  *  - whole-file text — the reference's S3 input handler reads one object
  *    as one string (`data_sources/input_handler_s3.py:66-70`); `wholetext`
  *    reproduces that shape when per-file semantics genuinely matter.
  *  - JSON lines in/out — the reference's S3 sink writes a JSON array per
  *    reducer (`data_sources/output_handler_s3.py:41-53`); JSON-lines is
  *    the splittable, scale-safe spelling of the same sink.
  *  - per-pipeline reader options (A8 `.config`) — an options map merged
  *    onto the reader, mirroring `driver/driver.py:240-251`.
  *  - partitioned parquet — the layout the 100 TB design actually wants
  *    (partition pruning on date/kind columns), absent in the reference.
  *  - foreachPartition KV sink (A16 DynamoDB analog): one connection per
  *    partition, batched puts — demonstrated against a pluggable writer.
  */
object Sources {

  /** A13/CSV: schema-declared CSV read; options merged A8-style.
    * Default mode PERMISSIVE with a `_corrupt_record` column when the
    * schema declares one — at 100 TB a single malformed row must not
    * kill the job (the reference simply crashes the mapper Lambda);
    * pass mode=FAILFAST to get strict semantics instead. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.schema(schema)
      .options(Map("header" -> "false", "mode" -> "PERMISSIVE") ++ options)
      .csv(path)

  /** A13/whole-object: one (path, contents) row per file. */
  def readWholeText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .withColumn("path",
        org.apache.spark.sql.functions.input_file_name())
      .select($"path", $"value".as("contents"))
  }

  /** JSON-lines read with declared schema (never infer at scale — schema
    * inference is a full extra pass over the data). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.schema(schema).options(options).json(path)

  /** A15: JSON-lines sink. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** CSV sink with header. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** The 100 TB layout: parquet partitioned by low-cardinality columns so
    * readers prune whole directories before listing a single row group. */
  def writeParquetPartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], codec: String = "zstd"): Unit =
    df.write.mode("overwrite")
      .option("compression", codec) // zstd: ~30% smaller than snappy at
                                    // comparable scan speed — the 100 TB
                                    // storage-bill default
      .partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table write: pre-shuffles rows into `numBuckets` by hash of
    * the bucket columns and records the layout in the catalog — two
    * tables bucketed the same way then JOIN WITHOUT A SHUFFLE (the
    * co-located-join layout a 100 TB star schema wants for its repeated
    * fact⋈fact joins; bucketing pays the shuffle once at write time).
    * SortMergeJoin reads both sides' buckets directly; SourcesSpec
    * asserts the join plan has no Exchange. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    val s = df.sparkSession
    // a previous JVM may have left the managed-table LOCATION behind
    // while this session's in-memory catalog has no entry — overwrite
    // then refuses (LOCATION_ALREADY_EXISTS); drop both first
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Z-ordered parquet layout: rows are range-partitioned and sorted by
    * the Morton interleave of two integral columns, so every output
    * file's parquet min/max zone maps are narrow in BOTH columns at once
    * — filters on either key skip most files, where a single-column sort
    * only ever skips on its leading column. `files` bounds the write
    * parallelism/file count; the z key is computed by the codegen
    * [[graft.functions.ZOrder]] expression and dropped before writing so
    * the stored schema is unchanged. The layout job a 100 TB curated
    * table runs after compaction.
    *
    * Keys MUST fit in `bits` bits: `ZOrder.interleave` masks to the low
    * `bits`, so a value ≥ 2^bits would silently wrap — rows far apart in
    * key space would collide in z-space and the both-dimension zone-map
    * locality would quietly degrade. Rather than trust the caller, the
    * key range is validated via an `observe` metric riding the write job
    * itself (no extra scan — the pre-scan alternative would double the
    * I/O at 100 TB) and an out-of-range key throws as soon as the job
    * lands, naming the offending range. Pre-bucket wide keys first
    * (e.g. `pmod(col, 1 << bits)` as qZorder does) to opt into wrapping
    * explicitly. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.{col, greatest, least, lit, max, min}
    val obs = new org.apache.spark.sql.Observation()
    val z = graft.functions.ZOrder.zorder(
      org.apache.spark.sql.functions.col(xCol),
      org.apache.spark.sql.functions.col(yCol), bits)
    df.observe(obs,
        max(greatest(col(xCol).cast("long"), col(yCol).cast("long"))).as("mx"),
        least(min(col(xCol).cast("long")), min(col(yCol).cast("long"))).as("mn"))
      .withColumn("__z", z)
      .repartitionByRange(files, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    val row = obs.get
    val mx = Option(row("mx")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val mn = Option(row("mn")).map(_.asInstanceOf[Long]).getOrElse(0L)
    require(mn >= 0L && mx < (1L << bits),
      s"writeZOrdered(bits=$bits): keys must be in [0, ${1L << bits}) but " +
        s"observed [$mn, $mx] — z-values would wrap and zone-map locality " +
        s"silently degrade; pre-bucket the keys (e.g. pmod(col, 1 << bits)) " +
        "or raise bits")
  }

  /** Per-partition KV writer: `put` per row, `close` once at partition
    * end (flush the tail batch, release the connection). */
  trait KvWriter {
    def put(key: String, value: String): Unit
    def close(): Unit
  }

  /** A16 analog: per-partition batched KV writes. `openWriter` runs once
    * per partition ON THE EXECUTOR (one client/connection per task, like
    * one DynamoDB client per Lambda in the reference,
    * `output_handler_dynamodb.py:100-112`); rows stream through without
    * materializing the partition, and `close()` is ALWAYS called — a
    * batching writer flushes its tail there (a put-only contract would
    * silently lose the last partial batch) and failures still release
    * the connection. */
  def foreachPartitionKvSink(df: DataFrame)(
      openWriter: Int => KvWriter,
      keyOf: Row => String, valueOf: Row => String): Unit =
    df.rdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val w = openWriter(pid)
      try rows.foreach(r => w.put(keyOf(r), valueOf(r)))
      finally w.close()
    }
}
