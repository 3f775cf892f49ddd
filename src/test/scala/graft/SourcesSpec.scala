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

  test("foreachPartition kv sink sees every row exactly once") {
    val path = s"$tmp/kv"
    Files.createDirectories(java.nio.file.Paths.get(path))
    Sources.foreachPartitionKvSink(sample.repartition(4)) (
      pid => {
        val w = new java.io.PrintWriter(s"$path/part-$pid.txt")
        sys.addShutdownHook(w.close())
        (k, v) => { w.println(s"$k=$v"); w.flush() }
      },
      keyOf = _.getLong(0).toString,
      valueOf = _.getDouble(2).toString)
    val written = new java.io.File(path).listFiles()
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(written.length === 50)
    assert(written.map(_.split('=').head.toLong).sorted ===
      sample.select($"c_custkey").as[Long].collect().sorted.toSeq)
  }
}
