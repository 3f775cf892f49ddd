package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ZOrder

/** Lakehouse table-maintenance operators: multi-dimensional data layout
  * (Z-order clustering), batch MERGE/upsert, incremental aggregate
  * maintenance, and referential-integrity auditing. All beyond the
  * reference (whose only layout control is the sha256 hash partitioner,
  * `default/partition.py:4-12`), and all core to operating a 100 TB
  * curated table: layout decides how much a filter reads, MERGE is how a
  * snapshot absorbs a day of changes without rewriting history, partial
  * aggregates are how yesterday's totals absorb today's partition without
  * rescanning the year, and the FK audit is the gate that catches a bad
  * ingest before it poisons downstream joins.
  */
object LakehouseQueries {

  // ── Z-order layout ─────────────────────────────────────────────────────

  /** Morton-curve clustering report: lineitem keys are mapped onto a
    * 1024×1024 grid, z-ordered with the codegen [[ZOrder]] expression, and
    * rolled up into the 64 top-level curve buckets (top 3 bits of each
    * dimension). Each bucket's min/max span in BOTH dimensions is ≤ 1/8 of
    * the domain — the zone-map property that makes z-ordered parquet skip
    * row groups on either column's predicate. Sorting by `z` IS the
    * physical layout step at scale (`repartitionByRange(z).sortWithin…`);
    * the report is the audit a layout job emits to prove locality. */
  def qZorder(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(s, d).select(
      pmod(col("l_partkey"), lit(1024)).as("x"),
      pmod(col("l_suppkey"), lit(1024)).as("y"))
    keys
      .withColumn("z", ZOrder.zorder(col("x"), col("y"), 10))
      .withColumn("bucket", shiftright(col("z"), 14))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
      .select(col("bucket"), col("n_rows"),
        col("x_lo"), col("x_hi"), col("y_lo"), col("y_hi"),
        (col("x_hi") - col("x_lo")).as("x_span"),
        (col("y_hi") - col("y_lo")).as("y_span"))
  }

  val qZorderSql: String = {
    val z = ZOrder.duckdbSql("x", "y", 10)
    "WITH k AS (SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem), " +
      s"zb AS (SELECT x, y, $z AS z FROM k) " +
      "SELECT z >> 14 AS bucket, count(*) AS n_rows, " +
      "min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi, " +
      "max(x) - min(x) AS x_span, max(y) - min(y) AS y_span " +
      "FROM zb GROUP BY 1"
  }

  // ── Batch MERGE / upsert ───────────────────────────────────────────────

  /** MERGE INTO semantics over the customer dimension: the change set is
    * the per-customer order-revenue delta (exact integer cents), with a
    * deterministic slice of keys remapped to +1,000,000 to exercise the
    * NOT-MATCHED insert path. One full-outer join on the business key —
    * WHEN MATCHED → update (balance += delta), WHEN NOT MATCHED BY SOURCE
    * → keep, WHEN NOT MATCHED BY TARGET → insert. At 100 TB both sides
    * hash-shuffle on the key once; nothing is collected, and the change
    * set (key-aggregated) is orders of magnitude smaller than the fact
    * stream that produced it. */
  def qMergeUpsert(s: SparkSession, d: String): DataFrame = {
    val target = Tables.customer(s, d).select(col("c_custkey").as("custkey"),
      expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_cents"))
    val source = Tables.orders(s, d)
      .select(
        when(pmod(col("o_custkey"), lit(3)) === 1, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("delta"))
      .groupBy(col("custkey")).agg(sum(col("delta")).as("delta_cents"))
    target.join(source, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        when(col("bal_cents").isNotNull && col("delta_cents").isNotNull, "update")
          .when(col("bal_cents").isNotNull, "keep")
          .otherwise("insert").as("action"),
        (coalesce(col("bal_cents"), lit(0L)) +
          coalesce(col("delta_cents"), lit(0L))).as("new_bal_cents"))
  }

  val qMergeUpsertSql: String =
    "WITH t AS (SELECT c_custkey AS custkey, " +
      "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents FROM customer), " +
      "src AS (SELECT CASE WHEN o_custkey % 3 = 1 THEN o_custkey + 1000000 " +
      "ELSE o_custkey END AS custkey, " +
      "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) " +
      "AS delta_cents FROM orders GROUP BY 1) " +
      "SELECT custkey, CASE WHEN bal_cents IS NOT NULL AND delta_cents IS NOT NULL " +
      "THEN 'update' WHEN bal_cents IS NOT NULL THEN 'keep' ELSE 'insert' END AS action, " +
      "coalesce(bal_cents, 0) + coalesce(delta_cents, 0) AS new_bal_cents " +
      "FROM t FULL OUTER JOIN src USING (custkey)"

  // ── Incremental aggregate maintenance ──────────────────────────────────

  /** Mergeable partial-aggregate maintenance: per-(day, type) partials —
    * the granularity a daily job would persist — merged into per-type
    * totals. Hash-equality with the direct single-pass oracle proves the
    * partial state is lossless (sum-of-sums, count-of-counts, max-of-
    * maxes), which is the contract that lets a 100 TB pipeline absorb a
    * new day by scanning ONE day partition and re-merging |days|×|types|
    * tiny partial rows instead of the year of raw events. */
  def qIncrAgg(s: SparkSession, d: String): DataFrame = {
    val partials = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("cents")).as("p_sum"), count(lit(1)).as("p_n"),
        max(col("cents")).as("p_max"))
    partials.groupBy(col("event_type"))
      .agg(sum(col("p_sum")).as("total_cents"), sum(col("p_n")).as("n_events"),
        max(col("p_max")).as("max_cents"),
        count(lit(1)).as("n_day_partials"))
  }

  val qIncrAggSql: String =
    "WITH p AS (SELECT CAST(ts AS DATE) AS day, event_type, " +
      "CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS p_sum, " +
      "count(*) AS p_n, " +
      "max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS p_max " +
      "FROM events GROUP BY 1, 2) " +
      "SELECT event_type, CAST(sum(p_sum) AS BIGINT) AS total_cents, " +
      "CAST(sum(p_n) AS BIGINT) AS n_events, max(p_max) AS max_cents, " +
      "count(*) AS n_day_partials FROM p GROUP BY 1"

  // ── Referential-integrity audit ────────────────────────────────────────

  /** FK audit across the star schema's spine: orphan facts (lineitem
    * without its order), orphan orders (no customer), orphan customers
    * (no nation), and childless orders (no lineitem) — the ingest gate
    * that runs before downstream joins silently drop rows. Anti-joins
    * shuffle each table once on its key (the dimension sides broadcast);
    * output is one row of counters. */
  def qRefIntegrity(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val orphanLi = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v")).select(col("v").as("orphan_lineitems"))
    val orphanO = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v")).select(col("v").as("orphan_orders"))
    val orphanC = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left_anti")
      .agg(count(lit(1)).as("v")).select(col("v").as("orphan_customers"))
    val childless = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v")).select(col("v").as("childless_orders"))
    orphanLi.crossJoin(orphanO).crossJoin(orphanC).crossJoin(childless)
  }

  val qRefIntegritySql: String =
    "SELECT " +
      "(SELECT count(*) FROM lineitem l WHERE NOT EXISTS " +
      "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems, " +
      "(SELECT count(*) FROM orders o WHERE NOT EXISTS " +
      "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphan_orders, " +
      "(SELECT count(*) FROM customer c WHERE NOT EXISTS " +
      "(SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS orphan_customers, " +
      "(SELECT count(*) FROM orders o WHERE NOT EXISTS " +
      "(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS childless_orders"

  // ── Registration ───────────────────────────────────────────────────────

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder"        -> qZorder _,
    "q_merge_upsert"  -> qMergeUpsert _,
    "q_incr_agg"      -> qIncrAgg _,
    "q_ref_integrity" -> qRefIntegrity _,
  )

  val oracles: Map[String, String] = Map(
    "q_zorder"        -> qZorderSql,
    "q_merge_upsert"  -> qMergeUpsertSql,
    "q_incr_agg"      -> qIncrAggSql,
    "q_ref_integrity" -> qRefIntegritySql,
  )
}
