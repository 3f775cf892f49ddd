package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.mr.MRPipeline

/** Queries expressed through the `graft.mr` fluent API (the reference's
  * own programming model, SURVEY.md §2A) rather than DataFrame ops —
  * proving the parity layer produces oracle-identical results.
  */
object MRQueries {

  /** Word count exactly as the reference writes it: flatMap-shaped map
    * emitting (token, 1), combiner summing map-side, reduce summing —
    * reference `word_count/map.py:4-13` + `word_count/reduce.py:2-12`,
    * run here over the `documents` table. */
  def qMrWordCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id".cast("string"), $"text").as[(String, String)]
    val sum = (k: String, vs: Seq[Long]) => Iterator.single((k, vs.sum))
    MRPipeline.fromDataset(docs)
      .map { (_, text) =>
        text.toLowerCase.split("[^a-z0-9]+").iterator
          .filter(_.nonEmpty).map(w => (w, 1L))
      }
      .reduceWithCombine(sum, numReducers = 8)
      .toDS.toDF("word", "cnt")
  }

  // Same oracle as the DataFrame word count — both must agree with DuckDB.
  val qMrWordCountSql: String = Relational.qWordCountSql

  /** AMPLab Q2 through the MR API: map emits (key-prefix, acctbal),
    * reduce sums — reference `performance_functions/query_2.py:20-38`.
    * Cents-as-long arithmetic keeps the sum exact and order-independent
    * (the MR layer has no Catalyst decimal types). */
  def qMrSubstrAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d)
      .select($"c_name", $"c_acctbal").as[(String, Double)]
    val sum = (k: String, vs: Seq[Long]) => Iterator.single((k, vs.sum))
    MRPipeline.fromDataset(cust)
      .map { (name, bal) =>
        Iterator.single((name.substring(14, 16), math.round(bal * 100)))
      }
      .reduceWithCombine(sum, numReducers = 8)
      .map { (k, cents) => Iterator.single((k, cents / 100.0)) }
      .toDS.toDF("key_prefix", "sum_bal")
  }

  val qMrSubstrAggSql: String =
    "SELECT substr(c_name, 15, 2) AS key_prefix, " +
      "CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_bal " +
      "FROM customer GROUP BY substr(c_name, 15, 2)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mr_wordcount"  -> qMrWordCount _,
    "q_mr_substr_agg" -> qMrSubstrAgg _,
  )

  val oracles: Map[String, String] = Map(
    "q_mr_wordcount"  -> qMrWordCountSql,
    "q_mr_substr_agg" -> qMrSubstrAggSql,
  )
}
