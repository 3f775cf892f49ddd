package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.datagen.DataGen
import graft.datagen.DataGen.Sizes

/** The datagen is trusted for scale-curve measurement only if its output
  * is a drop-in for the driver fixtures: same schemas, same row-count
  * rules, same distribution invariants the query suite leans on. (The
  * strongest evidence is external: the full oracle suite verifies green
  * against a generated sf0.01 — these specs pin the contract pieces so a
  * regression fails fast and locally.) */
class DataGenSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sz001 = Sizes(0.001)

  test("every generated table matches the driver fixture's schema") {
    // names + types; nullability is a storage artifact (in-memory
    // expressions are non-null, parquet always reads back nullable —
    // the WRITTEN files were DESCRIBE-identical to the driver's in the
    // dual-engine validation)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    val gen = DataGen.tables(spark, sz001)
    for (name <- Tables.names if name != "events") {
      val want = shape(Tables.load(spark, sf, name).schema)
      assert(shape(gen(name).schema) === want, s"schema drift in $name")
    }
    // events: the driver file's physical ts type has varied across data
    // regenerations (nanos vs micros) — compare through the normalizing
    // loader, which is what every query sees
    val wantEvents = shape(Tables.events(spark, sf).schema)
    assert(shape(gen("events").schema) === wantEvents, "schema drift in events")
  }

  test("row counts follow the driver's scale rules at the probed SFs") {
    // driver-verified counts: sf0.001 and sf0.01 fixtures
    assert(sz001.lineitem === 6000L && sz001.orders === 1500L &&
      sz001.customer === 150L && sz001.part === 200L &&
      sz001.supplier === 10L && sz001.events === 1000L &&
      sz001.documents === 500L && sz001.embeddings === 500L)
    val s01 = Sizes(0.01)
    assert(s01.lineitem === 60000L && s01.documents === 500L &&
      s01.embeddings === 500L && s01.events === 10000L)
    val s1 = Sizes(1.0)
    assert(s1.lineitem === 6000000L && s1.documents === 50000L &&
      s1.embeddings === 20000L && s1.users === 15000L)
  }

  test("lineitem values stay inside the fixture ranges") {
    val r = DataGen.lineitem(spark, sz001).agg(
      min($"l_quantity"), max($"l_quantity"),
      min($"l_discount"), max($"l_discount"),
      min($"l_tax"), max($"l_tax"),
      countDistinct($"l_returnflag"), countDistinct($"l_linestatus"))
      .head()
    assert(r.getDouble(0) >= 1.0 && r.getDouble(1) <= 50.0)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 0.10 + 1e-12)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(5) <= 0.08 + 1e-12)
    assert(r.getLong(6) === 3L && r.getLong(7) === 2L)
  }

  test("events: ts is monotone in event_id over the fixed 30-day span") {
    val e = DataGen.events(spark, sz001)
    val bad = e.select($"event_id", $"ts")
      .withColumn("prev", lag($"ts", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy($"event_id")))
      .filter($"prev" > $"ts").count()
    assert(bad === 0L, "slot-jitter construction must keep ts monotone")
    val span = e.agg(min($"ts").cast("date").cast("string"),
      max($"ts").cast("date").cast("string")).head()
    assert(span.getString(0).startsWith("2024-01-"))
    assert(span.getString(1).startsWith("2024-01-"))
  }

  test("embeddings are unit-normalized 64-dim vectors") {
    val nrm = DataGen.embeddings(spark, sz001)
      .select(sqrt(aggregate(transform($"embedding", x => x.cast("double")),
        lit(0.0), (a, x) => a + x * x)).as("n"), size($"embedding").as("d"))
      .agg(min($"n"), max($"n"), min($"d"), max($"d")).head()
    assert(math.abs(nrm.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(nrm.getDouble(1) - 1.0) < 1e-5)
    assert(nrm.getInt(2) === 64 && nrm.getInt(3) === 64)
  }

  test("document text is open-vocabulary: Zipf head, Heaps growth, lang-keyed function words") {
    import graft.functions.TextFunctions
    val docs01 = DataGen.documents(spark, Sizes(0.01)).cache()
    val words01 = docs01.select(explode(TextFunctions.tokens($"text")).as("w"))
    // Heaps growth: the distinct-word count must GROW with the corpus
    // (the closed 31-word vocabulary this generator replaced could not)
    val v01 = words01.agg(countDistinct($"w")).as[Long].head()
    val v10 = DataGen.documents(spark, Sizes(0.1))
      .select(explode(TextFunctions.tokens($"text")).as("w"))
      .agg(countDistinct($"w")).as[Long].head()
    assert(v01 > 1000L, s"sf0.01 vocab should be open (>1000 words), got $v01")
    assert(v10 > 2L * v01, s"vocab must grow with the corpus: $v01 -> $v10")
    // Zipf head: the single most frequent token dominates (rank-1 mass
    // ~ 1/ln V of all tokens); top token must be an en head word since
    // en is the most common lang
    val top = words01.groupBy($"w").count()
      .orderBy($"count".desc).limit(1).as[(String, Long)].head()
    assert(top._1 === "the", s"Zipf rank 1 should be 'the', got $top")
    // lang-keyed heads: en markers appear in nearly all en docs and no
    // non-en docs (the language-ID operators need this signal)
    val hits = docs01.select($"lang",
      (TextFunctions.markerHits(TextFunctions.tokens($"text"),
        TextFunctions.enMarkers) > 0).as("hit"))
      .groupBy($"lang").agg(avg($"hit".cast("double")).as("r"))
      .as[(String, Double)].collect().toMap
    assert(hits("en") > 0.9, s"en docs must hit en markers: $hits")
    assert(Seq("de", "fr", "es", "zh").forall(l => hits.getOrElse(l, 0.0) === 0.0),
      s"non-en docs must not hit en markers: $hits")
    // zh heads whose suffix is a valid base36 numeral ("xia"/"xiao"/
    // "xiang") used to alias open-tail ranks under the bare-"x" encoding,
    // leaking zh markers into non-zh docs; the x0 tail prefix makes heads
    // and tails disjoint — pin it from the zh side too
    val zhAliasRisk = Seq("xia", "xiao", "xiang")
    val zhHits = docs01.select($"lang",
      (TextFunctions.markerHits(TextFunctions.tokens($"text"),
        zhAliasRisk) > 0).as("hit"))
      .groupBy($"lang").agg(avg($"hit".cast("double")).as("r"))
      .as[(String, Double)].collect().toMap
    assert(zhHits("zh") > 0.5, s"zh docs should hit zh head words: $zhHits")
    assert(Seq("en", "de", "fr", "es").forall(l => zhHits.getOrElse(l, 0.0) === 0.0),
      s"non-zh docs must never emit zh head words: $zhHits")
    docs01.unpersist()
  }

  test("open vocabulary keeps shingle document frequencies sublinear") {
    // the property the closed vocab destroyed: Σ df² over each doc's
    // rarest (prefix) shingles is the candidate floor of every exact
    // inverted-index join. With Zipf/Heaps text, the MEDIAN 3-gram
    // shingle df must stay O(1) as the corpus grows 10x.
    import graft.functions.TextFunctions
    def medianDf(sz: Sizes): Double = {
      val df = DataGen.documents(spark, sz)
        .select($"doc_id", explode(array_distinct(
          TextFunctions.shingles($"text", 3))).as("sh"))
        .groupBy($"sh").count()
      df.stat.approxQuantile("count", Array(0.5), 0.001).head
    }
    val m01 = medianDf(Sizes(0.01))
    val m10 = medianDf(Sizes(0.1))
    assert(m01 <= 2.0, s"median shingle df at sf0.01 should be ~1, got $m01")
    assert(m10 <= 2.0 * m01 + 1.0,
      s"median shingle df must not scale with the corpus: $m01 -> $m10")
  }

  test("generate rejects unknown table names in the only-filter") {
    val e = intercept[IllegalArgumentException] {
      DataGen.generate(spark, 0.001,
        java.nio.file.Files.createTempDirectory("graft_dg_bad").toString,
        only = Set("documnets"))
    }
    assert(e.getMessage.contains("documnets"))
    assert(e.getMessage.contains("documents")) // the valid-names hint
  }

  test("documents plant exact duplicates at the fixture rate (~1/625)") {
    // at 5000 docs the driver fixture shows 8 duplicate texts; the
    // hash-planted rule lands in the same regime
    val docs = DataGen.documents(spark, Sizes(0.1))
    val (n, distinct) = docs.agg(count(lit(1)), countDistinct($"text"))
      .as[(Long, Long)].head()
    val dups = n - distinct
    assert(dups >= 2 && dups <= 20, s"expected a handful of planted dups, got $dups")
    // and n_chars is the true text length everywhere
    assert(docs.filter(length($"text") =!= $"n_chars").count() === 0L)
  }
}
