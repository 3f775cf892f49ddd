package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Physical-plan assertions — the properties that decide whether a plan
  * survives a 100 TB scale-up: filters reaching the parquet scan, column
  * pruning, dimension broadcasts, map-side partial aggregation, top-k
  * without a global sort. A correctness-green query that regresses one of
  * these fails here, not in production.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q1 filter and projection reach the parquet scan") {
    val p = formatted("q1_filter_project")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("GreaterThan(l_quantity"), s"quantity filter not pushed:\n$p")
    // only the three selected columns are read
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>")
      || p.contains("l_orderkey") && !p.contains("l_shipdate"),
      s"scan reads too many columns:\n$p")
  }

  test("projection-only query prunes the scan schema to two columns") {
    val p = formatted("q_project_prune")
    assert(!p.contains("c_name"), s"unpruned column c_name in scan:\n$p")
    assert(!p.contains("c_address"), s"unpruned column c_address in scan:\n$p")
  }

  test("dimension joins broadcast the small side") {
    assert(plan("q2b_join_agg").contains("BroadcastHashJoin"))
    val star = plan("q_star_join")
    assert("BroadcastHashJoin".r.findAllIn(star).size === 2,
      s"expected both dims broadcast:\n$star")
  }

  test("top-1/top-k use TakeOrderedAndProject, not a global sort") {
    assert(plan("q3_join_top1").contains("TakeOrderedAndProject"))
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
    assert(!plan("q_topk").contains("rangepartitioning"),
      "top-k must not range-shuffle the whole table")
  }

  test("grouped aggregation is partial -> final (map-side combine)") {
    val p = plan("q_agg_stats")
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("global sort range-partitions (TeraSort shape)") {
    assert(plan("q_sort_global").contains("rangepartitioning"))
  }

  test("date filter pushes into the orders scan") {
    val p = formatted("q_date_filter")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"date filter not pushed:\n$p")
  }

  test("banded dedup/ANN queries pair via equi-joins, never cartesian") {
    // the entire point of banding: candidate generation must be a keyed
    // join on band buckets, not an all-pairs product (q_cos_neardup is
    // the one deliberate, size-guarded exception)
    for (q <- Seq("q_minhash_lsh", "q_simhash_pairs", "q_winnow_overlap",
        "q_ann_lsh", "q_jaccard_partenum", "q_containment")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q joined without keys:\n$p")
    }
  }

  test("span-dedup apply selects owners via partial aggregation, no Window") {
    // first-occurrence ownership must be min(struct(doc_id,pos)) — a
    // partial→final HashAggregate with map-side combine — never a
    // row_number window over Window.partitionBy(sh): a boilerplate span
    // recurring 10⁷ times on a real crawl is a single hot-key sort task
    // under the window spelling
    val p = plan("q_dedup_spans_apply")
    assert(!p.contains("Window"), s"owner stage went through a window:\n$p")
    assert(p.contains("partial_min"), s"owner min not partially aggregated:\n$p")
  }

  test("kmeans assign is one projection: no Exchange of any kind") {
    import spark.implicits._
    val vecs = (0L until 100L).map(i => (i, Seq.fill(8)(i.toDouble % 7)))
      .toDF("id", "v")
    val cents = graft.operators.KMeans.fit(vecs, k = 4, iterations = 1)
    val p = graft.operators.KMeans.assign(vecs, cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assign must not shuffle:\n$p")
    assert(!p.contains("Window"), s"assign must not window:\n$p")
  }

  test("sketch probes ride broadcast joins, never data-sized shuffles") {
    // CMS: the d×w cell table is broadcast to the candidate probe — the
    // sketch side must never hash-exchange with the data side
    val hh = plan("q_heavy_hitters")
    assert(hh.contains("BroadcastHashJoin"), s"cells not broadcast:\n$hh")
    // tf-idf: per-term df and the 1-row corpus count are broadcast
    val tf = plan("q_tfidf")
    assert("BroadcastExchange".r.findAllIn(tf).size >= 2,
      s"df/count sides not broadcast:\n$tf")
  }

  test("bloom prune filters the fact scan before the semi-join") {
    val p = plan("q_bloom_prune")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"exact semi-join must broadcast the dim side:\n$p")
    // the UDF membership probe sits under the join (scan-side), so the
    // filter appears before the semi-join in the plan tree
    assert(p.indexOf("UDF") > p.indexOf("LeftSemi"),
      s"bloom probe must be below (after in text) the semi-join:\n$p")
  }

  test("knn corpus scan stays un-shuffled before the top-k aggregation") {
    // the only exchanges allowed: broadcast of queries + the final
    // per-qid aggregation; the corpus itself must not repartition
    val p = plan("q_knn_heap")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"corpus shuffled more than once:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$p")
  }

  test("outlier stats broadcast back onto the scan; the corpus never shuffles") {
    val p = plan("q_outliers")
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast:\n$p")
    // the only hash exchange allowed is the tiny per-type stats aggregate
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"event corpus shuffled for the stats join:\n$p")
  }

  test("gap-fill broadcasts the day dimension into the grid") {
    val p = plan("q_gap_fill")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"day grid not built via broadcast:\n$p")
  }

  test("triangle counting broadcasts degrees; wedge joins are equi-joins") {
    val p = plan("q_triangles")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"triangle plan must never go cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"degree join not broadcast:\n$p")
  }

  test("inverted index builds both window functions over one term shuffle") {
    val p = plan("q_inverted_index")
    // tf aggregation on (term, doc) + ONE term repartition for both
    // windows — a second term exchange would mean the windows split
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"extra exchange in index build:\n$p")
    assert("Window".r.findAllIn(p).size >= 1, s"no window operator:\n$p")
  }

  test("MV refresh merges states with partial aggregation on both phases") {
    val p = plan("q_mv_refresh")
    assert(p.contains("partial_"), s"no map-side combine in state build:\n$p")
  }

  test("partitioned layout: the type filter prunes at the directory level") {
    val p = formatted("q_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      s"filter did not become a partition filter:\n$p")
  }

  test("itemsets: supports broadcast, top-k is TakeOrdered, never cartesian on data") {
    val p = plan("q_itemsets")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"item supports not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k fell back to a global sort:\n$p")
  }

  test("string-agg joins the dimension via broadcast") {
    assert(plan("q_string_agg").contains("BroadcastHashJoin"))
  }

  test("rolling RANGE window reuses the daily aggregate's user partitioning") {
    val p = plan("q_rolling_range")
    // one exchange for the (user, day) aggregate, at most one more for
    // the user-keyed window — a third would mean the frame re-shuffles
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"extra exchange in rolling window:\n$p")
  }

  test("MAD outlier stats broadcast; the corpus itself never hash-shuffles") {
    val p = plan("q_mad_outliers")
    // every stats join is a broadcast: med onto the output path, med+mad
    // inside the MAD branch — the event rows reach the filter un-shuffled
    val bcast = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bcast >= 2, s"median/MAD not broadcast:\n$p")
    // the medians come from the rank kernel now (no percentile()
    // buffering); its tiny (group, percent) frames may hash-exchange,
    // but NO hash exchange may sit above the parquet corpus scan —
    // check each exchange's indentation-scoped subtree for a FileScan
    val lines = p.linesIterator.toVector
    def indent(l: String) = l.takeWhile(c => !c.isLetter).length
    lines.zipWithIndex.filter(_._1.contains("Exchange hashpartitioning"))
      .foreach { case (l, i) =>
        val in = indent(l)
        val subtree = lines.drop(i + 1).takeWhile(s => indent(s) > in)
        assert(!subtree.exists(_.contains("FileScan")),
          s"corpus scan shuffled under exchange at line $i:\n$p")
      }
  }

  test("SCD2 build is one window over the business key: single exchange") {
    val p = plan("q_scd2")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"version numbering and close-out must share one shuffle:\n$p")
    assert(p.contains("Window"), p)
  }

  test("fuzzy match pairs via the block equi-join, never cartesian") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct"), s"all-pairs comparison leaked in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"non-equi join on names:\n$p")
  }

  test("regression moments ride one partial-agg shuffle") {
    val p = plan("q_regression")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"five-moment aggregate should shuffle once:\n$p")
  }

  test("A/B test is one conditional-aggregation pass: single scan, single shuffle") {
    val p = plan("q_ab_test")
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"both arms must read from ONE scan (no per-arm passes):\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"moments for both arms should ride one shuffle:\n$p")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
  }

  test("vocab coverage: top-k via TakeOrdered, the lone global window is post-limit") {
    val p = plan("q_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 should be TakeOrdered, not a global sort of the vocabulary:\n$p")
    // the corpus total joins in as a broadcast, not a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus total should broadcast:\n$p")
  }

  test("transitions output aggregates over the user-window shuffle only") {
    val p = plan("q_transitions")
    // one exchange for the per-user window, one for the (from,to) rollup,
    // and one REPARTITIONING OF THE |types|²-ROW OUTPUT for the
    // probability window — the only exchanges touching fact-sized data
    // are the first two
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"expected window + rollup + output-sized exchanges only:\n$p")
    assert(p.contains("partial_"), s"bigram rollup lost map-side combine:\n$p")
  }

  test("EWMA: all lags, the count, and the is-last probe share ONE window sort") {
    val p = plan("q_ewma")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"lags + row_number + lead must share the user partitioning:\n$p")
    assert("Sort ".r.findAllIn(p).size <= 1 || p.contains("Window"),
      s"expected a single user-ordered window:\n$p")
  }

  test("KV lookup join plans as point lookups: no store scan, no build exchange") {
    val p = plan("q_kv_lookup_join")
    assert(p.contains("KvLookupJoin"), s"lookup strategy did not fire:\n$p")
    assert(!p.contains("BatchScan graft-kv"), s"store still scanned:\n$p")
  }

  test("CDC delete: base and feed merge through one per-key window exchange") {
    val p = plan("q_cdc_delete")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"the MERGE shape is one shuffle on the key:\n$p")
  }

  test("drawdown: fact shuffles once into the rollup; window sees the series") {
    val p = plan("q_drawdown")
    // one hash exchange (the daily rollup) + the single-partition window
    // over the bounded calendar series
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"daily rollup must be the only hash shuffle:\n$p")
    assert(p.contains("partial_"), s"rollup lost map-side combine:\n$p")
  }

  test("chi-square and psi broadcast their marginals onto the cell table") {
    val chi = plan("q_chi_square")
    assert("BroadcastExchange".r.findAllIn(chi).size >= 2,
      s"row/col totals must broadcast:\n$chi")
    val psi = plan("q_psi")
    assert(psi.contains("BroadcastExchange"),
      s"period totals must broadcast:\n$psi")
    assert(psi.contains("partial_"), s"bucket counts lost map-side combine:\n$psi")
  }

  test("TPC-H Q5: date filter pushed to the orders scan, dims broadcast") {
    val p = plan("q_tpch_q5")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate"), s"date filter not pushed:\n$p")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"nation/region (and small dims at this sf) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("per-group sample: the capped rank group-limits before the exchange") {
    // row_number <= k over a low-cardinality partition is only scale-safe
    // because the limit lets Spark plan a per-partition top-k heap
    // (WindowGroupLimit Partial) ahead of the shuffle — the exchange then
    // carries <= k * |groups| * partitions rows, never the corpus
    val p = plan("q_sample_group")
    assert("WindowGroupLimit .*Partial".r.findAllIn(p).nonEmpty,
      s"sample rank not partial-group-limited before the exchange:\n$p")
  }

  test("TPC-H Q3: both date filters pushed, customers broadcast, top-10 TakeOrdered") {
    val p = plan("q_tpch_q3")
    assert(p.contains("GreaterThan(l_shipdate"), s"shipdate filter not pushed:\n$p")
    assert(p.contains("LessThan(o_orderdate"), s"orderdate filter not pushed:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"segment-filtered customers must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must avoid a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("TPC-H Q6: every predicate reaches the scan; one partial-agg scalar") {
    // formatted mode: the compact plan toString elides long PushedFilters
    val p = formatted("q_tpch_q6")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_shipdate") && p.contains("LessThan(l_quantity,24"),
      s"scan predicates not pushed:\n$p")
    assert(p.contains("partial_sum"), s"revenue lost map-side combine:\n$p")
    // the scan must read only the four columns the query touches
    assert(!p.contains("l_partkey") && !p.contains("l_returnflag"),
      s"column pruning lost:\n$p")
  }

  test("boilerplate: per-source argmax partial-aggregates, no window anywhere") {
    val p = plan("q_boilerplate")
    assert(p.contains("partial_max") || p.contains("partial_finalmerge_max") ||
      "partial_.*max".r.findAllIn(p).nonEmpty,
      s"argmax-struct lost map-side combine:\n$p")
    assert(!p.contains("Window"), s"the argmax must not plan as a window:\n$p")
  }

  test("dup-spans: no pairwise stage — joins keyed on span text and doc id only") {
    val p = plan("q_dup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"dup-span counting must never pair documents:\n$p")
  }

  test("semdedup: centroid argmin is literal (no exchange before the cluster join)") {
    val p = formatted("q_semdedup")
    // KMeans.assign embeds the k centroids as literal score columns: the
    // assignment itself must add NO Exchange — the only shuffles are the
    // cluster-keyed dominance join and the verdict join-back
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
    assert(p.contains("graft_dot") || p.contains("least"),
      s"literal-centroid argmin missing from the plan:\n$p")
  }

  test("TPC-H Q18: partial-agg HAVING drives the join; top-100 is TakeOrdered") {
    val p = plan("q_tpch_q18")
    assert(p.contains("partial_sum"), s"quantity rollup lost map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must avoid a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("rank-statistics queries carry no Window at all (two-pass kernel)") {
    // q_gini/q_rfm ranked the per-user table through ONE task and
    // q_rank_sum/q_deciles/q_value_ranks ranked the fact table through
    // ~|event_type| tasks before the DistributedRank rewrite. The kernel
    // replaces every one of those windows with a range shuffle + local
    // rank + driver offsets, so the executed plans must contain no
    // Window node (and therefore no single-partition window Exchange).
    for (q <- Seq("q_gini", "q_rfm", "q_rank_sum", "q_deciles", "q_value_ranks",
        "q_percentile_disc", "q_gate_auc")) {
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q regressed to a window-based rank:\n$p")
    }
  }

  test("PQ ANN: codes join LUTs via broadcast hash, top-k is group-limited") {
    val p = plan("q_ann_pq")
    // the corpus codes stream through 4 broadcast LUT probes — a sort-
    // merge join would mean the corpus shuffled on a code column
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for a LUT join:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected 4 broadcast LUT probes + refine joins:\n$p")
    // both rank stages (ADC shortlist, exact refine) must group-limit
    // BEFORE the qid exchange so the shuffle carries ≤ queries×C rows
    assert("WindowGroupLimit .*Partial".r.findAllIn(p).nonEmpty,
      s"top-k not partial-group-limited before the exchange:\n$p")
  }

  test("jaro-winkler pairs: blocked join, no cartesian, codegen kernel") {
    val p = plan("q_jaro_winkler")
    assert(!p.contains("CartesianProduct"),
      s"blocking must prevent an all-pairs product:\n$p")
    assert(p.toLowerCase.contains("jarowinklerexpression"),
      s"custom kernel not in plan:\n$p")
  }

  test("decontamination: inverted-index probe, never a doc-pair product") {
    val p = plan("q_decontaminate")
    assert(!p.contains("CartesianProduct"), s"doc-pair product leaked:\n$p")
    // the train side is deduplicated before the probe join
    assert(p.contains("HashAggregate"), s"distinct train shingles missing:\n$p")
  }

  test("autocorr: lag table broadcasts; series joins stay off the fact table") {
    val p = plan("q_autocorr")
    assert(p.contains("BroadcastExchange"), s"lags must broadcast:\n$p")
    assert(p.contains("partial_"), s"daily rollup lost map-side combine:\n$p")
  }

  test("rolling distinct: explode runs on the deduplicated daily table") {
    val p = plan("q_rolling_distinct")
    // Generate (explode) must sit above the distinct aggregation of
    // (user, day) — never against the raw fact scan
    val gen = p.indexOf("Generate explode")
    assert(gen >= 0, s"expected an explode:\n$p")
    assert(p.substring(gen).contains("HashAggregate"),
      s"explode must consume the aggregated daily-active table:\n$p")
  }

  test("TPC-H bulk: dims broadcast, facts hash-join, nothing cartesian") {
    for (q <- Seq("q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
        "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q16",
        "q_tpch_q19")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q joined a dimension without broadcasting it:\n$p")
      assert(p.contains("partial_"),
        s"$q's aggregation lost map-side combine:\n$p")
    }
  }

  test("TPC-H Q10/Q13: rollup before the dimension join; top-k TakeOrdered") {
    val q10 = plan("q_tpch_q10")
    assert(q10.contains("TakeOrderedAndProject"),
      s"Q10's top-20 must not global-sort:\n$q10")
    // the customer dimension must join the per-custkey ROLLUP, not the fact:
    // the aggregate appears below the customer join in the plan tree
    val q13 = plan("q_tpch_q13")
    assert(q13.contains("LeftOuter") || q13.contains("left_outer"),
      s"Q13 must LEFT join so 0-order customers survive:\n$q13")
  }

  test("TPC-H Q11/Q15: global scalar rides ONE broadcast single-row join") {
    for (q <- Seq("q_tpch_q11", "q_tpch_q15")) {
      val p = plan(q)
      // the single-row stats side joins via BroadcastNestedLoopJoin (a
      // 1-row cross join) — bounded by construction; the per-key rollup
      // itself must still partial-aggregate
      assert(p.contains("partial_"), s"$q rollup lost map-side combine:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q's scalar must broadcast, not cartesian:\n$p")
    }
  }

  test("correlated subqueries decorrelate: no cartesian, no per-row re-run") {
    // Catalyst must rewrite every correlated form into keyed joins —
    // an InMemory/per-row subquery loop or a cartesian would be the
    // plan that dies at 100 TB. (The only Subquery nodes allowed are
    // q22's two UNCORRELATED scalars, which run once and broadcast.)
    for (q <- Seq("q_tpch_q2", "q_tpch_q4", "q_tpch_q17", "q_tpch_q20",
        "q_tpch_q21", "q_tpch_q22")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q joined without keys:\n$p")
    }
  }

  test("EXISTS/NOT EXISTS plan as semi/anti hash joins") {
    assert(plan("q_tpch_q4").contains("LeftSemi"),
      "Q4's correlated EXISTS must become a left-semi join")
    val q21 = plan("q_tpch_q21")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      s"Q21 must carry both a semi (EXISTS) and an anti (NOT EXISTS) join:\n$q21")
    assert(plan("q_tpch_q22").contains("LeftAnti"),
      "Q22's NOT EXISTS must become a left-anti join")
  }

  test("correlated scalar aggs compute once: aggregate-then-join shape") {
    // Q17's per-part count/sum and Q20's per-part 1997 volume must appear
    // as partial→final hash aggregates keyed on l_partkey joined back into
    // the outer plan — never re-executed per outer row.
    for (q <- Seq("q_tpch_q17", "q_tpch_q20")) {
      val p = plan(q)
      assert(p.contains("partial_sum"),
        s"$q's correlated agg lost map-side combine:\n$p")
      assert("HashAggregate\\(keys=\\[l_partkey".r.findAllIn(p).nonEmpty,
        s"$q's correlated agg is not a keyed aggregate-then-join:\n$p")
    }
  }

  test("item-CF: top-3 group-limits before the exchange, nothing cartesian") {
    val p = plan("q_item_cf")
    // each shuffle partition must forward ≤3 candidate rows per item —
    // without the partial WindowGroupLimit the full similarity list
    // shuffles to the rank window
    assert("WindowGroupLimit .*Partial".r.findAllIn(p).nonEmpty,
      s"top-3 not partial-group-limited before the exchange:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("HHI: supplier dim broadcasts; revenue rollup keeps map-side combine") {
    val p = plan("q_hhi")
    assert(p.contains("BroadcastHashJoin"),
      s"supplier dim must broadcast onto the per-supplier rollup:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 400-row dim join must not shuffle the rollup:\n$p")
    assert(p.contains("partial_sum"), s"revenue rollup lost combine:\n$p")
  }

  test("tree rollup: closed-form ancestor explode — no join anywhere") {
    val p = plan("q_tree_rollup")
    assert(!p.contains("Join"), s"hierarchy rollup must not join:\n$p")
    assert(p.contains("Generate"), s"ancestor explode missing:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"subtree aggregation lost map-side combine:\n$p")
  }

  test("rolling slope: windows run on the day-grain frame after a partial agg") {
    val p = plan("q_rolling_slope")
    assert(p.contains("Window"), s"range-frame window missing:\n$p")
    // the fact table must collapse to day grain (partial-agg shuffle)
    // BEFORE any window — a window over raw events would sort the fact
    assert(p.contains("partial_sum"), s"day-grain rollup lost combine:\n$p")
    val winIdx = p.indexOf("Window")
    val aggIdx = p.lastIndexOf("partial_sum")
    assert(winIdx < aggIdx,
      s"window must consume the aggregated frame, not the raw fact:\n$p")
  }

  test("CF hit-rate: every join keyed, nothing cartesian") {
    val p = plan("q_cf_hitrate")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
    // the one BroadcastNestedLoopJoin allowed is the single-row n_test
    // attach; candidate scoring must stay a keyed join
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"candidate scoring degraded to an unkeyed join:\n$p")
  }

  test("edge novelty: first-month is an aggregate, not a window") {
    val p = plan("q_edge_novelty")
    assert(!p.contains("Window"),
      s"first-appearance must be a min aggregate, not a window:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"rollups lost map-side combine:\n$p")
  }

  test("SCC edge derivation: sorted-array adjacency, no window") {
    // the purchase-path edges come from ONE per-order struct-array
    // aggregation — a lead() window would re-shuffle the fact table.
    // Pinned through q_reciprocity, which shares purchasePathEdges and
    // is lazy (q_scc itself executes its fixpoints on plan construction).
    val pr = plan("q_reciprocity")
    assert(!pr.contains("Window"),
      s"purchase-path edges regressed to a window:\n$pr")
  }

  test("KS test: the window consumes the aggregated cents grid") {
    val p = plan("q_ks_test")
    assert(p.contains("Window"), s"cumulative sums missing:\n$p")
    val winIdx = p.indexOf("Window")
    val aggIdx = p.lastIndexOf("partial_sum")
    assert(aggIdx > winIdx,
      s"window must sit above the per-cent aggregation, not the raw fact:\n$p")
  }

  test("quantile normalization ranks through the kernel: no Window node") {
    // both rank levels (per-type AND pooled-global) must ride the
    // DistributedRank kernel — a window spelling would funnel the fact
    // table through one global partition for the pooled rank
    val p = plan("q_quantile_norm")
    assert(!p.contains("Window"),
      s"quantile norm regressed to a window-based rank:\n$p")
  }

  test("mutual information: marginals broadcast, nothing sort-merges") {
    val p = plan("q_mutual_info")
    assert(!p.contains("SortMergeJoin"),
      s"the 35-cell table must never shuffle for its marginals:\n$p")
  }

  test("z-order report: codegen'd key, one partial-first aggregation, 2-col scan") {
    val p = plan("q_zorder")
    assert(p.contains("partial_"), s"bucket rollup must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
    val f = formatted("q_zorder")
    assert(f.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"),
      s"scan must read only the two key columns:\n$f")
  }

  test("merge upsert: keyed full-outer join, change set pre-aggregated") {
    val p = plan("q_merge_upsert")
    assert(p.contains("FullOuter"), s"expected a full-outer merge join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"merge must stay a keyed join:\n$p")
    // the orders fact aggregates to per-key deltas BEFORE joining the
    // target (partial_sum under the join, not a raw fact join)
    assert(p.contains("partial_sum"), s"change set not pre-aggregated:\n$p")
  }

  test("seq patterns: the pair join consumes per-(user,type) aggregates") {
    val p = plan("q_seq_patterns")
    // event-level rows must reduce to first/last spans before any join —
    // partial min/max under the join keeps the pair stage off the fact
    assert(p.contains("partial_min") && p.contains("partial_max"),
      s"span reduction must be map-side combined:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
  }

  test("incremental aggregate: two-level rollup, both map-side combined") {
    val p = plan("q_incr_agg")
    assert("partial_sum".r.findAllIn(p).size >= 2,
      s"both the day partials and the merge must combine map-side:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("FK audit: anti joins throughout, nation side broadcast") {
    val p = plan("q_ref_integrity")
    assert("LeftAnti".r.findAllIn(p).size >= 4,
      s"all four audits must plan as anti joins:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the nation anti join should broadcast the 5-row dim:\n$p")
  }

  test("equi-depth histogram ranks through the kernel: no Window node") {
    val p = plan("q_equidepth")
    assert(!p.contains("Window"),
      s"equi-depth bucketing must not funnel through a global window:\n$p")
    assert(p.contains("partial_"), s"bucket rollup must map-side combine:\n$p")
  }

  test("quantile-sketch audit: exact side rides the kernel, no data Window") {
    // the only Window allowed is over the 64-bin histogram CDF — the
    // exact-rank side must come from DistributedRank, so no Window may
    // consume an events-scale input (pin: exactly one Window, fed by an
    // aggregate)
    val p = plan("q_qsketch_error")
    assert("Window".r.findAllIn(p).size <= 1,
      s"expected at most the 64-bin CDF window:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
  test("decomposition windows run on the day-grain frame after partial agg") {
    val p = plan("q_decompose")
    // the |days|-row frame feeds two branches (seasonal rollup + output),
    // so the RANGE window appears once per branch — both over the tiny
    // day-grain input, never over event rows
    assert("Window".r.findAllIn(p).size === 2,
      s"expected the 7-day RANGE window in both day-grain branches:\n$p")
    assert(p.contains("partial_sum"),
      s"daily rollup must map-side combine before the window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 7-row seasonal table must broadcast:\n$p")
  }
  test("link prediction: wedge pairs via equi-joins, top-k TakeOrdered") {
    val p = plan("q_link_predict")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"wedge/anti stages must stay keyed:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 fell back to a global sort:\n$p")
  }

  test("media pipeline stays narrow until the per-doc rollup") {
    // audio decode + frame energy: exactly one hash exchange (the
    // media_id aggregation); payload bytes never shuffle
    val p = plan("q_media_energy")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"payloads must not shuffle before the rollup:\n$p")
    // scene detection: the lag window is keyed by media_id, no global sort
    val sc = plan("q_media_scenes")
    assert(!sc.contains("rangepartitioning") || sc.contains("media_id"),
      s"scene window must partition by media_id:\n$sc")
  }
  test("conversion lag: as-of machinery stays keyed; ranks ride the kernel") {
    val p = plan("q_conversion_lag")
    assert(!p.contains("CartesianProduct"),
      s"as-of attribution must never go cartesian:\n$p")
    // the percentile side must come from DistributedRank, not a Window
    // over the lag rows (the census/broadcast single-row joins are fine)
    assert(!p.contains("Window"),
      s"lag percentiles regressed to a window:\n$p")
  }

  test("source overlap: token pair stage consumes the distinct reduction") {
    val p = plan("q_source_overlap")
    assert(p.contains("partial_"), s"vocab reduction must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay keyed:\n$p")
  }

  test("lakehouse maintenance plans: keyed joins, bounded windows") {
    // incremental join view: three keyed joins, never a nested loop, and
    // the delta sides keep their pushed key-slice filters at the scan
    val ij = plan("q_incr_join")
    assert(!ij.contains("CartesianProduct") &&
      !ij.contains("BroadcastNestedLoopJoin"),
      s"delta algebra must stay equi-keyed:\n$ij")
    assert(ij.contains("PushedFilters") || ij.contains("partial_"),
      s"delta slices should reach the scan / rollup should combine:\n$ij")
    // skew report: one keyed count shuffle + TakeOrdered top-10 — a
    // global sort of the key histogram would defeat the point
    val sk = plan("q_skew_metrics")
    assert(sk.contains("TakeOrderedAndProject"),
      s"top-10 keys must be TakeOrdered, not a global sort:\n$sk")
    // compaction planner + attr history: windows exist but only keyed or
    // manifest-grain — both must come AFTER a partial aggregate so the
    // window input is rollup-sized (manifest) or change-sized
    val cp = plan("q_compaction_plan")
    assert(cp.contains("partial_"),
      s"manifest rollup must map-side combine before the packing window:\n$cp")
    val ah = plan("q_attr_history")
    assert(ah.contains("user_id"),
      s"history windows must key on user_id:\n$ah")
  }
  test("round-10 mining plans: broadcast stats, TakeOrdered tops, no cartesian") {
    // embedding outliers: 64-row stats broadcast onto the scan; the
    // corpus reaches the driver only as the 20-row TakeOrdered result
    val eo = plan("q_embed_outliers")
    assert(eo.contains("BroadcastHashJoin") || eo.contains("BroadcastNestedLoop") ||
      eo.contains("broadcast"), s"stats must broadcast:\n$eo")
    assert(eo.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n$eo")
    // A-ES sample: pure scan + TakeOrdered — no Exchange at all before it
    val es = plan("q_sample_es")
    assert(es.contains("TakeOrderedAndProject"),
      s"A-ES top-k must be TakeOrdered:\n$es")
    // TextRank keywords: final top-20 is TakeOrdered, never a vocab sort
    val tr = plan("q_textrank")
    assert(tr.contains("TakeOrderedAndProject"),
      s"keyword top-k must be TakeOrdered:\n$tr")
    // c-TF-IDF: the per-cluster stats join broadcasts (bounded frames);
    // no cartesian anywhere
    val tt = plan("q_topic_terms")
    assert(!tt.contains("CartesianProduct"),
      s"topic scoring must not go cartesian:\n$tt")
    // grid DBSCAN: adjacency is an equi-join on shifted integer keys
    val db = plan("q_dbscan_grid")
    assert(!db.contains("CartesianProduct") && !db.contains("BroadcastNestedLoop"),
      s"cell adjacency must stay an equi-join:\n$db")
  }
}
