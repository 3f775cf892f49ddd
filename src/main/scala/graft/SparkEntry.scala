package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's (name → plan) map plus the matching
  * DuckDB oracle SQL. The driver runs `queries` via Verify at sf0.01 and
  * compares each result against `oracleSql` executed by DuckDB on the same
  * parquet tables (column names must match — every computed column is
  * aliased identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * AMPLab Q3 shape: filter → join → aggregate → top-1
    * (reference: hive/Query3.q:24-31). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinTop1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ MRQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      MediaQueries.queries ++ PipelineQueries.queries ++ KvQueries.queries ++
      StreamQueries.queries ++ SketchQueries.queries ++
      GraphQueries.queries ++ TpchQueries.queries ++ TpchBulkQueries.queries ++
      LakehouseQueries.queries

  /** `oracleSql` with the fixture-dependent registrations respelled for
    * the given data directory: SemDeDup's k auto-scales with the corpus
    * (semK), so its replay SQL must be generated at the same k. Equal to
    * `oracleSql` at every tier whose vector count keeps semK at its
    * demo value (all gate tiers through sf3). Verify writes THIS map. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    oracleSql ++ SimilarityQueries.fixtureOracles(spark, sfDir)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ MRQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      MediaQueries.oracles ++ PipelineQueries.oracles ++ KvQueries.oracles ++
      StreamQueries.oracles ++ SketchQueries.oracles ++
      GraphQueries.oracles ++ TpchQueries.oracles ++ TpchBulkQueries.oracles ++
      LakehouseQueries.oracles
}
