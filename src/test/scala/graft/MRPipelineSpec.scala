package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mr.{MRPipeline, Partitioners}

class MRPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def pairs(xs: (String, Int)*) =
    MRPipeline.fromPairs(spark, spark.sparkContext.parallelize(xs, 4))

  test("map is flatMap-shaped: 0..n outputs per input") {
    val out = pairs("a" -> 1, "b" -> 2)
      .map { (k, v) => (1 to v).map(i => (k, i)) }
      .collectPairs().sorted
    assert(out.toSeq === Seq("a" -> 1, "b" -> 1, "b" -> 2))
  }

  test("reduce groups all values per key, keys sorted within partition") {
    val p = pairs("b" -> 1, "a" -> 2, "b" -> 3, "c" -> 4, "a" -> 5)
      .reduce((k: String, vs: Seq[Int]) => Iterator.single((k, vs.sum)), 2)
    // per-partition key order must be ascending (reference reduce_handler.py:122)
    val perPart = p.rdd.mapPartitions(it => Iterator.single(it.map(_._1).toList))
      .collect()
    perPart.foreach(ks => assert(ks === ks.sorted))
    assert(p.collectPairs().sorted.toSeq === Seq("a" -> 7, "b" -> 4, "c" -> 4))
  }

  test("values arrive in arrival order (stable grouping)") {
    val out = MRPipeline.fromPairs(spark,
        spark.sparkContext.parallelize(Seq("k" -> 1, "k" -> 2, "k" -> 3), 1))
      .reduce((k: String, vs: Seq[Int]) => Iterator.single((k, vs.mkString(","))), 1)
      .collectPairs()
    assert(out.toSeq === Seq("k" -> "1,2,3"))
  }

  test("combineReduce matches plain reduce for algebraic aggregates") {
    val input = (1 to 1000).map(i => (s"k${i % 7}", i))
    val sum = (k: String, vs: Seq[Int]) => Iterator.single((k, vs.sum))
    val plain = pairs(input: _*).reduce(sum, 4).collectPairs().sorted.toSeq
    val comb = pairs(input: _*).combineReduce(sum, sum, 4).collectPairs().sorted.toSeq
    assert(plain === comb)
  }

  test("bounded combine buffer: chunked flushes preserve algebraic results") {
    // cardinality ≈ rows (the OOM-shaped input) + a tiny flush threshold:
    // the combiner runs many times per partition and once per partial run
    // of a key; the reduce re-group must still see exact totals
    val input = (1 to 5000).map(i => (s"k${i % 2000}", i))
    val sum = (k: String, vs: Seq[Int]) => Iterator.single((k, vs.sum))
    val plain = pairs(input: _*).reduce(sum, 4).collectPairs().sorted.toSeq
    spark.conf.set("graft.mr.combine.maxBuffered", "64")
    try {
      val chunked = pairs(input: _*).combineReduce(sum, sum, 4)
        .collectPairs().sorted.toSeq
      assert(chunked === plain)
    } finally spark.conf.unset("graft.mr.combine.maxBuffered")
  }

  test("custom shuffle function controls exact partition placement") {
    val p = pairs("a" -> 1, "bb" -> 2, "ccc" -> 3, "dddd" -> 4)
      .shuffle((k: String, n: Int) => k.length % n)
      .reduce((k: String, vs: Seq[Int]) => Iterator.single((k, vs.sum)), 3)
    val placed = p.rdd.mapPartitionsWithIndex { (i, it) =>
      it.map { case (k, _) => (k, i) }
    }.collect().toMap
    assert(placed === Map("a" -> 1, "bb" -> 2, "ccc" -> 0, "dddd" -> 1))
  }

  test("sha256Mod matches the reference default partitioner bit-exactly") {
    // golden values computed with hashlib: int(sha256(key),16) % n
    assert(Partitioners.sha256Mod("hello", 10) === 0)
    assert(Partitioners.sha256Mod("0.0.0.0", 7) === 4)
    assert(Partitioners.sha256Mod("Customer#000000042", 32) === 23)
  }

  test("unitRange matches reference range_partition.py") {
    assert(Partitioners.unitRange(0.0, 4) === 0)
    assert(Partitioners.unitRange(0.26, 4) === 1)
    assert(Partitioners.unitRange(0.999, 4) === 3)
    assert(Partitioners.unitRange(1.0, 4) === 3) // clamped, not out-of-range
  }

  test("merge is UNION ALL of pipeline outputs") {
    val a = pairs("x" -> 1)
    val b = pairs("x" -> 2, "y" -> 3)
    assert(a.merge(b).collectPairs().sorted.toSeq ===
      Seq("x" -> 1, "x" -> 2, "y" -> 3))
  }

  test("fromConfig reads parquet.kv / text / wholetext sources") {
    val kv = graft.mr.MRPipeline.fromConfig(spark, Map(
      "input.format" -> "parquet.kv",
      "input.path" -> s"$sf/nation.parquet")).collectPairs()
    assert(kv.length === 25)
    assert(kv.forall { case (k, v) => k.toLong >= 0 && v.nonEmpty })

    val dir = java.nio.file.Files.createTempDirectory("graft_mrconf")
    java.nio.file.Files.writeString(dir.resolve("f.txt"), "alpha\nbeta\n")
    val lines = graft.mr.MRPipeline.fromConfig(spark, Map(
      "input.format" -> "text", "input.path" -> dir.toString)).collectPairs()
    assert(lines.map(_._2).sorted.toSeq === Seq("alpha", "beta"))
    val whole = graft.mr.MRPipeline.fromConfig(spark, Map(
      "input.format" -> "wholetext", "input.path" -> dir.toString)).collectPairs()
    assert(whole.length === 1 && whole.head._2 === "alpha\nbeta\n")
  }

  test("fromConfig kv reads through the graft-kv DSv2 connector") {
    import org.apache.spark.sql.types._
    val table = "kv_mrconf"
    if (!graft.sources.kv.KvStore.exists(table)) {
      graft.sources.kv.KvStore.register(table, "k",
        StructType(Seq(StructField("k", StringType), StructField("v", StringType))))
      graft.sources.kv.KvStore.put(table,
        Seq(Seq("a", "1"), Seq("b", "2"), Seq("c", "3")))
    }
    val pairs = graft.mr.MRPipeline.fromConfig(spark, Map(
      "input.format" -> "kv", "input.table" -> table)).collectPairs()
    assert(pairs.sorted.toSeq === Seq(("a", "1"), ("b", "2"), ("c", "3")))
    // key column always arrives as the pair key, regardless of position
    assert(pairs.forall { case (k, _) => Seq("a", "b", "c").contains(k) })
  }

  test("fromConfig kv serializes wide items whole (full-item JSON value)") {
    import org.apache.spark.sql.types._
    val table = "kv_mrconf_wide"
    if (!graft.sources.kv.KvStore.exists(table)) {
      graft.sources.kv.KvStore.register(table, "k",
        StructType(Seq(StructField("k", StringType),
          StructField("a", StringType), StructField("b", LongType))))
      graft.sources.kv.KvStore.put(table, Seq(Seq("x", "hello", 7L)))
    }
    val pairs = graft.mr.MRPipeline.fromConfig(spark, Map(
      "input.format" -> "kv", "input.table" -> table)).collectPairs()
    assert(pairs.length === 1)
    val (k, v) = pairs.head
    assert(k === "x")
    // no attribute silently dropped: the value is the full item as JSON
    // (reference streams the whole projected item per key,
    // input_handler_dynamodb.py:168-213)
    assert(v.contains("\"a\":\"hello\"") && v.contains("\"b\":7"), v)
  }

  test("MR word count equals DataFrame word count") {
    val mr = queries.MRQueries.qMrWordCount(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val df = queries.Relational.qWordCount(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(mr.sameElements(df))
  }
}
