package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  private lazy val sample = Tables.customer(spark, sf)
    .select($"c_custkey", $"c_name", $"c_acctbal")
    .orderBy($"c_custkey").limit(50)

  test("csv round-trip preserves schema and rows") {
    val path = s"$tmp/csv"
    Sources.writeCsv(sample, path)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val back = Sources.readCsv(spark, path, schema,
      options = Map("header" -> "true"))
    assert(back.schema === schema)
    assert(back.orderBy($"c_custkey").collect().toSeq ===
      sample.collect().toSeq)
  }

  test("json-lines round-trip preserves rows") {
    val path = s"$tmp/json"
    Sources.writeJsonLines(sample, path)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val back = Sources.readJsonLines(spark, path, schema)
    assert(back.orderBy($"c_custkey").collect().toSeq ===
      sample.collect().toSeq)
  }

  test("whole-text read yields one row per file with full contents") {
    val dir = Files.createTempDirectory("graft_wholetext")
    Files.writeString(dir.resolve("a.txt"), "line1\nline2\n")
    Files.writeString(dir.resolve("b.txt"), "single")
    val df = Sources.readWholeText(spark, dir.toString)
    val rows = df.collect().map(r =>
      (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(rows.size === 2)
    assert(rows("a.txt") === "line1\nline2\n")
    assert(rows("b.txt") === "single")
  }

  test("partitioned parquet prunes partitions on read") {
    val path = s"$tmp/part"
    val ev = Tables.events(spark, sf)
      .withColumn("day", to_date($"ts"))
    Sources.writeParquetPartitioned(ev, path, Seq("event_type"))
    val back = spark.read.parquet(path).filter($"event_type" === "purchase")
    assert(back.count() ===
      Tables.events(spark, sf).filter($"event_type" === "purchase").count())
    // pruning: only the purchase directory is scanned
    val scan = back.queryExecution.executedPlan.toString
    assert(!scan.contains("event_type%3Dclick") && !scan.contains("event_type=click"))
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // the 100 TB star-join discipline: when the selective filter sits on
    // the DIMENSION, the fact's partition pruning can only happen at
    // RUNTIME (Catalyst inserts a dynamicpruning subquery reusing the
    // broadcast) — without DPP every fact partition would be scanned
    val path = s"$tmp/dpp_fact"
    Tables.events(spark, sf)
      .withColumn("etype", $"event_type")
      .write.mode("overwrite").partitionBy("etype").parquet(path)
    val fact = spark.read.parquet(path)
    // the dim must be a SCAN (not a LocalRelation) for Catalyst's
    // selective-predicate detection to consider its filter
    val dimPath = s"$tmp/dpp_dim"
    Seq(("purchase", "rev"), ("click", "eng"), ("error", "ops"))
      .toDF("etype", "team").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter($"team" === "rev") // the selective predicate lives on the dim
    val joined = fact.join(dim, Seq("etype"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning in fact scan:\n$p")
    assert(joined.count() ===
      Tables.events(spark, sf).filter($"event_type" === "purchase").count())
  }

  test("malformed csv rows surface in _corrupt_record instead of failing") {
    val dir = Files.createTempDirectory("graft_badcsv")
    Files.writeString(dir.resolve("d.csv"),
      "1,alice,10.5\nBADROW-not-enough-fields\n3,carol,7.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("bal", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = Sources.readCsv(spark, dir.toString, schema).cache()
    assert(df.count() === 3)
    assert(df.filter($"_corrupt_record".isNotNull).count() === 1)
    assert(df.filter($"_corrupt_record".isNull)
      .select($"id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    df.unpersist()
    // FAILFAST: the same file must throw
    val strict = Sources.readCsv(spark, dir.toString,
      StructType(schema.dropRight(1)), Map("mode" -> "FAILFAST"))
    intercept[Exception](strict.collect())
  }

  test("same-bucketed tables join without a shuffle") {
    Sources.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
      "b_lineitem", Seq("l_orderkey"), 8)
    Sources.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey"),
      "b_orders", Seq("o_orderkey"), 8)
    // force the sort-merge path: at test scale Catalyst prefers a
    // broadcast join, which bypasses (and hides) the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("graft functions are SQL-callable via session extensions") {
    // TestSpark's builder wires GraftExtensions → no explicit register
    assert(spark.sql("SELECT graft_fib(10L) AS f").head().getLong(0) === 55L)
    assert(spark.sql("SELECT graft_dot(array(1d,2d), array(3d,4d)) AS d")
      .head().getDouble(0) === 11.0)
    assert(spark.sql("SELECT size(graft_shingles('a b c d', 3)) AS n")
      .head().getInt(0) === 2)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    assert(spark.sql(
      "SELECT count(DISTINCT graft_simhash(text)) FROM docs_v")
      .head().getLong(0) > 0)
  }

  test("graft_shingles rejects NULL / fractional / non-literal n descriptively") {
    for (bad <- Seq("NULL", "1.5", "'x'")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_shingles('a b c', $bad)").collect()
      }
      // the IllegalArgumentException may arrive wrapped by the parser
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("graft_shingles n must be"),
        s"expected the descriptive literal error for n=$bad, got: $msgs")
    }
  }

  test("stratified sampleBy is seeded-deterministic with near-target fractions") {
    val fractions = Map("en" -> 0.5, "de" -> 0.1, "fr" -> 0.1, "es" -> 0.1, "zh" -> 0.1)
    val docs = Tables.documents(spark, sf)
    val s1 = docs.stat.sampleBy("lang", fractions, seed = 42L)
    val s2 = docs.stat.sampleBy("lang", fractions, seed = 42L)
    assert(s1.select($"doc_id").as[Long].collect().sorted.toSeq ===
      s2.select($"doc_id").as[Long].collect().sorted.toSeq)
    val enTotal = docs.filter($"lang" === "en").count().toDouble
    val enSampled = s1.filter($"lang" === "en").count().toDouble
    assert(math.abs(enSampled / enTotal - 0.5) < 0.15,
      s"en fraction ${enSampled / enTotal}")
  }

  test("foreachPartition kv sink sees every row exactly once") {
    val path = s"$tmp/kv"
    Files.createDirectories(java.nio.file.Paths.get(path))
    Sources.foreachPartitionKvSink(sample.repartition(4)) (
      pid => new Sources.KvWriter {
        // buffered writer: only correct because close() flushes the tail
        private val out = new java.io.PrintWriter(s"$path/part-$pid.txt")
        override def put(k: String, v: String): Unit = out.println(s"$k=$v")
        override def close(): Unit = out.close()
      },
      keyOf = _.getLong(0).toString,
      valueOf = _.getDouble(2).toString)
    val written = new java.io.File(path).listFiles()
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(written.length === 50)
    assert(written.map(_.split('=').head.toLong).sorted ===
      sample.select($"c_custkey").as[Long].collect().sorted.toSeq)
  }

  test("compaction reduces file count without changing content") {
    val row = graft.queries.KvQueries.qCompact(spark, sf).collect().head
    assert(row.getAs[Long]("n_files_small") === 64L)
    assert(row.getAs[Long]("n_files_packed") === 4L)
    assert(row.getAs[Long]("n_rows") === Tables.lineitem(spark, sf).count())
    // idempotent: a second compaction pass reports the identical checksum
    val again = graft.queries.KvQueries.qCompact(spark, sf).collect().head
    assert(again.getAs[Long]("checksum") === row.getAs[Long]("checksum"))
  }
}
