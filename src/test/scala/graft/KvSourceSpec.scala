package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kv.KvStore

class KvSourceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("bal", DoubleType)))

  private def fixture(table: String): Unit = {
    KvStore.register(table, "id", schema)
    KvStore.truncate(table)
    KvStore.put(table, (1L to 20L).map(i => Seq[Any](i, s"name_$i", i * 1.5)))
  }

  private def read(table: String) =
    spark.read.format("graft-kv").option("table", table).load()

  test("kv read returns every registered row with the registered schema") {
    fixture("t_read")
    val df = read("t_read")
    assert(df.schema === schema)
    assert(df.count() === 20)
    assert(df.select($"id").as[Long].collect().sorted.toSeq === (1L to 20L))
  }

  test("scan splits the key space into multiple partitions, rows seen once") {
    fixture("t_part")
    val df = read("t_part")
    assert(df.rdd.getNumPartitions === 4)
    // segments form a partition of the key space: union = all, no dupes
    assert(df.select($"id").as[Long].collect().sorted.toSeq === (1L to 20L))
  }

  test("ungrouped count/min/max push completely into the provider") {
    fixture("t_agg")
    val df = read("t_agg").agg(
      count(lit(1)).as("n"), min($"id").as("min_id"),
      max($"bal").as("max_bal"), count($"name").as("n_names"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("aggPushed=[count(*),min(id),max(bal),count(name)]"),
      s"aggregation not pushed:\n$plan")
    val r = df.collect().head
    assert(r.getLong(0) === 20L)
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(2) === 30.0)
    assert(r.getLong(3) === 20L)
  }

  test("grouped or unsupported aggregates fall back to the normal scan") {
    fixture("t_agg_fb")
    val grouped = read("t_agg_fb").groupBy($"name").agg(count(lit(1)))
    assert(!grouped.queryExecution.executedPlan.toString.contains("aggPushed"))
    assert(grouped.count() === 20)
    val summed = read("t_agg_fb").agg(sum($"bal").as("s"))
    assert(!summed.queryExecution.executedPlan.toString.contains("aggPushed"))
    assert(math.abs(summed.collect().head.getDouble(0) - (1 to 20).map(_ * 1.5).sum) < 1e-9)
  }

  test("projection pushdown reaches the provider (pruned attrs in the scan)") {
    fixture("t_prune")
    val df = read("t_prune").select($"name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pruned=[name]"), s"expected pruned scan:\n$plan")
    assert(!plan.contains("pruned=[id,name,bal]"))
    assert(df.as[String].collect().toSet === (1 to 20).map(i => s"name_$i").toSet)
  }

  test("key equality becomes a point lookup consumed at the source") {
    fixture("t_key")
    val df = read("t_key").filter($"id" === 7L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("keyLookup=7"), s"expected point lookup:\n$plan")
    // fully consumed: one partition, one row, correct values
    assert(df.rdd.getNumPartitions === 1)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((7L, "name_7")))
    // a NON-key filter stays a post-scan filter and still evaluates right
    val scan = read("t_key").filter($"bal" > 25.0)
    assert(scan.queryExecution.executedPlan.toString.contains("keyLookup=none"))
    assert(scan.count() === (1L to 20L).count(_ * 1.5 > 25.0))
  }

  test("dsv2 write: append puts are last-write-wins per key; overwrite truncates") {
    KvStore.register("t_write", "id", schema)
    KvStore.truncate("t_write")
    val a = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "bal")
    a.write.format("graft-kv").option("table", "t_write").mode("append").save()
    assert(read("t_write").count() === 2)
    // same key again → overwritten, not duplicated (PutItem semantics)
    val b = Seq((2L, "b2", 2.5), (3L, "c", 3.0)).toDF("id", "name", "bal")
    b.write.format("graft-kv").option("table", "t_write").mode("append").save()
    val rows = read("t_write").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(rows === Map(1L -> ("a", 1.0), 2L -> ("b2", 2.5), 3L -> ("c", 3.0)))
    // overwrite replaces the table contents
    a.write.format("graft-kv").option("table", "t_write").mode("overwrite").save()
    assert(read("t_write").select($"id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L))
  }

  test("change feed streams puts in order and resumes from its offset exactly-once") {
    KvStore.register("t_feed", "id", schema)
    KvStore.truncate("t_feed") // fresh put log
    val ckpt = java.nio.file.Files.createTempDirectory("graft_feed_ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("graft_feed_out")
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-kv").option("table", "t_feed").load()
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "bal")
      .write.format("graft-kv").option("table", "t_feed").mode("append").save()
    runOnce()
    // an UPDATE to an existing key is a new feed entry (streams semantics),
    // plus a brand-new key — the resumed query must see exactly these two
    Seq((2L, "b2", 2.5), (3L, "c", 3.0)).toDF("id", "name", "bal")
      .write.format("graft-kv").option("table", "t_feed").mode("append").save()
    runOnce()
    val feed = spark.read.parquet(outDir.toString).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
    assert(feed.length === 4) // 2 + 2, no replay
    assert(feed.toSet === Set((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c")))
    // the batch scan sees last-write-wins state, the feed keeps history
    val state = spark.read.format("graft-kv").option("table", "t_feed").load()
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(state === Set((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("reported statistics make a small KV dim broadcast in non-key joins") {
    KvStore.register("t_stats", "id", schema)
    KvStore.truncate("t_stats")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "bal")
      .write.format("graft-kv").option("table", "t_stats").mode("append").save()
    val kv = spark.read.format("graft-kv").option("table", "t_stats").load()
    val fact = Tables.supplier(spark, sf)
    // non-key condition → scan route; with honest v2 statistics the tiny
    // store broadcasts instead of defaulting to a pessimistic-size SMJ
    val j = fact.join(kv, fact("s_name") === kv("name"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"2-row store did not broadcast — statistics not reported:\n$plan")
  }

  test("limit pushdown reaches the scan and bounds what partitions emit") {
    KvStore.register("t_lim", "id", schema)
    KvStore.truncate("t_lim")
    (1L to 50L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "bal")
      .write.format("graft-kv").option("table", "t_lim").mode("append").save()
    val df = spark.read.format("graft-kv").option("table", "t_lim").load().limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=3"), s"limit not pushed to the scan:\n$plan")
    assert(df.collect().length === 3)
  }

  test("key-equality join against the store plans as point lookups, no scan") {
    KvStore.register("t_lkp", "id", schema)
    KvStore.truncate("t_lkp")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0))
      .toDF("id", "name", "bal")
      .write.format("graft-kv").option("table", "t_lkp").mode("append").save()
    val probe = Seq((2L, "x"), (3L, "y"), (9L, "z")).toDF("k", "tag")
    val kv = spark.read.format("graft-kv").option("table", "t_lkp").load()
    val joined = probe.join(kv, probe("k") === kv("id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("KvLookupJoin"), s"strategy did not fire:\n$plan")
    assert(!plan.contains("BatchScan"), s"store still scanned:\n$plan")
    val got = joined.select($"k", $"tag", $"name", $"bal")
      .as[(Long, String, String, Double)].collect().toSet
    // inner semantics: 9 has no item and drops; matched rows carry the item
    assert(got === Set((2L, "x", "b", 2.0), (3L, "y", "c", 3.0)))
    // a non-key join must DECLINE to the built-in planner (scan route)
    val byName = probe.join(kv, probe("tag") === kv("name"))
    val p2 = byName.queryExecution.executedPlan.toString
    assert(!p2.contains("KvLookupJoin"), s"strategy overreached:\n$p2")
    assert(byName.count() === 0L)
  }

  test("lookup join declines when the scan already consumed a pushed key filter") {
    KvStore.register("t_lkp2", "id", schema)
    KvStore.truncate("t_lkp2")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "bal")
      .write.format("graft-kv").option("table", "t_lkp2").mode("append").save()
    val probe = Seq((2L, "x"), (3L, "y")).toDF("k", "tag")
    val kv = spark.read.format("graft-kv").option("table", "t_lkp2").load()
    // The kv-side filter is fully consumed by KvScanBuilder.pushFilters
    // (no residual Filter node) — the strategy must NOT replace that scan
    // with whole-table point lookups, or the pushed predicate is dropped.
    // Correctness here must not depend on constraint propagation
    // mirroring the predicate onto the probe side.
    val joined = probe.join(kv.filter($"id" === 2L), probe("k") === kv("id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("KvLookupJoin"),
      s"strategy fired on a scan with a pushed key lookup:\n$plan")
    val got = joined.select($"k", $"tag", $"name")
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((2L, "x", "b")))
  }

  test("lookup join skips null probe keys instead of stringifying them") {
    KvStore.register("t_lkp3", "id", schema)
    KvStore.truncate("t_lkp3")
    Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("id", "name", "bal")
      .write.format("graft-kv").option("table", "t_lkp3").mode("append").save()
    val probe = Seq[(java.lang.Long, String)]((1L, "x"), (null, "n"), (2L, "y"))
      .toDF("k", "tag")
    val kv = spark.read.format("graft-kv").option("table", "t_lkp3").load()
    val joined = probe.join(kv, probe("k") === kv("id"))
    val got = joined.select($"k", $"tag", $"name")
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "x", "a"), (2L, "y", "b")))
  }

  test("registered q_kv_scan groups the nation dim read through the connector") {
    val out = graft.queries.KvQueries.qKvScan(spark, sf)
      .orderBy($"n_regionkey").collect()
    val direct = Tables.nation(spark, sf)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n_nations"), max($"n_name").as("max_name"))
      .orderBy($"n_regionkey").collect()
    assert(out.toSeq === direct.toSeq)
  }
}
