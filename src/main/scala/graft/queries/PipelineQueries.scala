package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.ConnectedComponents

/** The composed training-data pipeline — the end-to-end shape every
  * individual operator exists to serve: language filter → quality gate →
  * exact dedup → near-dup clustering → canonical survivors → corpus
  * stats. Each stage is one of the already-verified building blocks;
  * this module wires them in the order a 100 TB curation run would.
  *
  * Scale shape: filters and scoring are narrow (scan-fused); exact dedup
  * shuffles 16-byte digests once; LSH + connected components touch only
  * near-dup candidate ids; the final stats are one aggregation.
  */
object PipelineQueries {

  private val QualityFloor = 0.5

  /** Stages 1-3 (deterministic, oracle-checkable): English, quality gate,
    * exact-dedup survivors (min doc_id per identical text). */
  def cleanExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val t = tokens(col("text"))
    // quality gate = the SHARED TextFunctions.qualityScore — the same
    // definition q_quality_score reports, so gate and score cannot drift
    val scored = docs.select(
      col("doc_id"), col("text"), col("lang"),
      size(t).cast("bigint").as("n_tokens"),
      qualityScore(t, col("n_chars")).as("quality"))
      .filter(col("lang") === "en" && col("quality") >= QualityFloor)
    val survivors = scored.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    scored.join(survivors, Seq("doc_id"), "left_semi")
  }

  /** Stage 4 (approximate, spec-checked): near-dup clusters via
    * MinHash-LSH pairs + connected components; keep min doc per cluster. */
  def cleanNearDup(s: SparkSession, d: String): DataFrame = {
    val cleaned = cleanExact(s, d)
    val pairs = DedupQueries.lshPairs(
      cleaned.select(col("doc_id"), col("text")),
      numHashes = 32, bands = 8, threshold = 0.8)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    ConnectedComponents.keepSurvivors(cleaned, "doc_id", pairs)
  }

  // ── Registered queries ─────────────────────────────────────────────────

  def qPipelineExact(s: SparkSession, d: String): DataFrame =
    cleanExact(s, d).select(col("doc_id"), col("n_tokens"),
      round(col("quality"), 6).as("quality_r"))

  val qPipelineExactSql: String =
    "WITH scored AS (SELECT doc_id, text, lang, len(t) AS n_tokens, " +
      s"$sqlQuality AS quality " +
      s"FROM (SELECT doc_id, text, lang, n_chars, $sqlTokens AS t FROM documents) a), " +
      s"gated AS (SELECT * FROM scored WHERE lang = 'en' AND quality >= $QualityFloor), " +
      "surv AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)) " +
      "SELECT doc_id, n_tokens, round(quality, 6) AS quality_r FROM gated " +
      "WHERE doc_id IN (SELECT doc_id FROM surv)"

  /** Full pipeline incl. LSH clustering (xxhash-based → rows-only driver
    * check; cluster correctness is PipelineSpec's job). */
  def qPipelineFull(s: SparkSession, d: String): DataFrame =
    cleanNearDup(s, d)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("quality")), 6).as("avg_quality"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_exact" -> qPipelineExact _,
    "q_pipeline_full"  -> qPipelineFull _,
  )

  val oracles: Map[String, String] = Map(
    "q_pipeline_exact" -> qPipelineExactSql,
  )
}
