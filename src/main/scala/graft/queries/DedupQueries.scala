package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Md5Bits, Shingles, SimHash, Winnow}

/** Deduplication suite over the `documents` table — the LLM-training-data
  * operators the reference lacks entirely (SURVEY.md §7.0 step 5), each
  * designed for the 100 TB shape first:
  *
  *  - exact:        hash-groupBy, one shuffle of 16-byte digests.
  *  - n-gram Jaccard: exact pairwise similarity via shingle inverted
  *    index; correct but inherently candidate-quadratic — kept as the
  *    small-scale ORACLE for the approximate paths.
  *  - MinHash-LSH:  the scale path. k minhashes per doc (one scan), banded
  *    into buckets; only same-bucket docs pair up, so shuffle volume is
  *    O(docs × bands), not O(pairs). Candidates are verified with exact
  *    Jaccard on signatures.
  *  - SimHash:      64-bit fingerprint (custom codegen Expression), near-dup
  *    = small Hamming distance; zero-shuffle fingerprinting.
  */
object DedupQueries {

  // ── Exact dedup: md5-groupBy ───────────────────────────────────────────
  // At 100 TB: shuffles only (digest, doc_id) pairs, never text. Duplicate
  // groups keep the smallest doc_id (deterministic survivor).
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val qDedupExactSql: String =
    "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies " +
      "FROM documents GROUP BY md5(text)"

  // ── Exact n-gram Jaccard near-dup pairs ────────────────────────────────
  // Inverted index on distinct 3-gram shingles; pairs sharing a shingle
  // are counted once per shared shingle; |A∩B| / (|A|+|B|-|A∩B|) >= 0.8.
  // Integer counts + one double division → bit-identical to the oracle.
  // graft_shingles emits first-occurrence-distinct shingles in ONE codegen
  // pass (the column-algebra spelling re-tokenizes per position — O(len²)).
  private def shingleIndex(s: SparkSession, d: String): DataFrame = {
    Shingles.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"), explode(Shingles.shingles(col("text"), 3)).as("sh"))
  }

  /** EXACT threshold Jaccard via prefix filtering (Bayardo/Ma/Srikant
    * "Scaling Up All Pairs Similarity Search", WWW 2007; Chaudhuri et al.
    * SSJoin): for J >= t, two docs MUST share at least one shingle among
    * each one's p = n - ceil(t·n) + 1 rarest shingles (canonical order =
    * ascending document frequency). So the quadratic self-join runs only
    * over those short prefixes, a size-ratio filter (min >= t·max) prunes
    * incompatible pairs, and only surviving candidates get their true
    * intersection counted. Same exact result set as the naive
    * all-shingles join (spec-asserted), at a fraction of the pair volume
    * — this is what keeps EXACT verification affordable after LSH at
    * scale. */
  def qNgramJaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccardPrefix(shingleIndex(s, d), threshold = 0.8)

  def ngramJaccardPrefix(sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOTE (r17): an eager-materialization variant (checkpointing sh /
    // ranked / docSets, which appear in several subtrees) measured a
    // clear REGRESSION at sf0.1 (1.6 -> 2.3 s): the repeated subtrees
    // are identical, AQE's runtime exchange reuse already covers them,
    // and the checkpoints only pay extra materialization. Kept lazy.
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // rank each doc's shingles rarest-first in the global canonical order
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    // exact-decimal ceil(t*n): double rounding of threshold*n could land
    // one ulp above an integer product and overshoot the ceiling,
    // shrinking the prefix below the provable minimum for some thresholds
    val tDec = new java.math.BigDecimal(threshold.toString)
    val ranked = sh.join(df, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .withColumn("p", (col("n") - ceil(lit(tDec) * col("n")) + 1).cast("int"))
    val prefix = ranked.filter(col("rk") <= col("p"))
      .select(col("doc_id"), col("sh"), col("n"), col("rk"))
    // required overlap α = ceil(t·(na+nb)/(1+t)) in EXACT integer
    // arithmetic: t = num/10^s (decimal) → α = ceil(num·(na+nb)/(10^s+num))
    // = (num·(na+nb) + D − 1) div D. Doubles could round the boundary.
    val tNum = tDec.unscaledValue.longValueExact
    val tDen = java.math.BigDecimal.ONE.movePointRight(tDec.scale)
      .longValueExact + tNum
    def alpha(na: String, nb: String): Column =
      expr(s"($tNum * ($na + $nb) + ${tDen - 1}) div $tDen")
    // candidates: prefix-overlap + size-ratio compatibility + PPJoin's
    // positional filter (Xiao/Wang/Lin/Yu, WWW 2008): for the FIRST
    // shared shingle (canonical df-order) at ranks (i, j), every other
    // shared shingle ranks after both, so overlap ≤ 1 + min(na−i, nb−j);
    // pairs whose match positions cannot reach α are pruned LOSSLESSLY
    // before the distinct — on closed-vocabulary corpora (where nothing
    // is rare and the plain prefix join floods) this is the filter that
    // keeps the candidate stage output-bound.
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      // decimal threshold here too: double t*max can round one ulp above
      // an exact integer product and prune a true boundary pair
      .filter(least(col("a.n"), col("b.n")) >= lit(tDec) * greatest(col("a.n"), col("b.n")))
      .filter(lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")) >=
        alpha("a.n", "b.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    // exact verification: true intersection count for candidates only —
    // against per-doc shingle ARRAYS, so each candidate pair costs one
    // O(na+nb) array_intersect instead of fanning back through the
    // inverted index. Closed-vocabulary corpora (like the synthetic
    // fixture) make even prefix shingles non-rare: at sf1 the index
    // fan-out was ~350M intermediate rows for 6.5M candidates, while the
    // array spelling is two doc_id hash joins of the candidate table. At
    // 100 TB the doc-array table is just the corpus re-keyed — linear,
    // hash-partitioned, never collected.
    val docSets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sh"))).as("ss"))
    val inter = cands
      .join(docSets.select(col("doc_id").as("doc_a"), col("ss").as("sa")), Seq("doc_a"))
      .join(docSets.select(col("doc_id").as("doc_b"), col("ss").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("shared"))
    inter
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ── PartEnum exact Jaccard (closed-vocabulary-proof candidates) ────────
  // The prefix filter's candidate volume is Σ df² over prefix shingles —
  // provably minimal for any inverted-INDEX join, but on a CLOSED
  // vocabulary (every shingle's df grows with the corpus) that floor is
  // itself quadratic: the sf3 fixture measured q_ngram_jaccard at 51 s
  // for a 25-pair answer. PartEnum (Arasu/Ganti/Kaushik, "Efficient
  // Exact Set-Similarity Joins", VLDB 2006) keys candidates on PART
  // SUBSETS instead of single shingles: J ≥ t bounds the symmetric
  // difference by floor((1−t)/t·n_small), so hashing the shingle UNIVERSE
  // into p > maxdiff parts forces some part where the two docs' subsets
  // are IDENTICAL — equal md5 of the sorted part content. Collisions now
  // require agreeing on a whole ~4-shingle slice, not one popular
  // shingle, so candidate volume is output-bound regardless of df.
  // Size handling: integer geometric bands T_{k+1} = ceil(T_k/t); a
  // J ≥ t pair's sizes are within 1/t, hence same or adjacent bands —
  // each doc emits its part grid for its own band (anchor role) and the
  // band below (partner role), and the (n, doc_id)-smaller side anchors,
  // so each pair is generated exactly once at band(n_small). Every part
  // index 0..p−1 emits a row (empty parts hash the empty string —
  // dropping them would lose pairs whose difference-free part is empty
  // on both sides). Verification is the shared array_intersect plan.
  // Same output, row-for-row, as q_ngram_jaccard (spec-asserted); the
  // oracle replays the same naive join over the same sample.
  //
  // REGIME GATE (measured, round 12): at this fixture's operating point
  // (~53-shingle docs, t = 0.8 → diff budget ≈ 13) PartEnum's part
  // subsets degenerate to ~3.5 shingles and its candidate volume grows
  // SUPERLINEARLY — 26.9 s at sf1 → 102.6 s at sf3 (3.8× for 3× data),
  // vs the result-identical prefix join's 2.05×. PartEnum's winning
  // regime is |set| ≫ diff budget (parts stay multi-element and
  // selective); outside it the engine is kept registered as the measured
  // alternative but runs on a deterministic md5 doc sample above the
  // oracle-gate corpus sizes (the q_cos_neardup treatment): the
  // PartEnumSample smallest md5(doc_id) docs via TakeOrderedAndProject
  // — never a global sort — with the oracle replaying the identical
  // rule. At the gate SFs (≤ 5 000 docs) the limit does not bind, so
  // gate results are byte-identical to the unsampled spelling.
  private val PartEnumSample = 10000

  def qJaccardPartEnum(s: SparkSession, d: String): DataFrame = {
    import graft.operators.IterCheckpoint.IterCheckpointOps
    Shingles.register(s)
    val smp = Tables.documents(s, d)
      .select(Md5Bits.hash60(col("doc_id")).as("h"), col("doc_id"), col("text"))
      .orderBy(col("h"), col("doc_id")).limit(PartEnumSample)
    // materialized once: the shingle explode is referenced by the size
    // pass, the part-content join, and the final verification arrays —
    // without this each consumer re-runs the document scan + TakeOrdered
    // + explode (guide §1.2 step 1 / §5)
    val sh = smp.select(col("doc_id"),
      explode(Shingles.shingles(col("text"), 3)).as("sh"))
      .iterCheckpoint()
    jaccardPartEnum(sh, num = 4, den = 5) // t = 4/5
  }

  private[graft] def jaccardPartEnum(sh: DataFrame, num: Int, den: Int): DataFrame = {
    // integer size bands [T_k, T_{k+1}) with T_{k+1} = ceil(T_k·den/num);
    // p_k = floor((den−num)·(T_{k+1}−1)/num) + 1 > any pair's symmetric
    // difference when the smaller doc sits in band k
    val thresholds = Iterator.iterate(1L)(t => (t * den + num - 1) / num)
      .takeWhile(_ < (1L << 40)).toSeq
    // p = maxdiff + 1 (the minimal pigeonhole count). MEASURED trade-off
    // on the synthetic fixture (53-shingle docs, t = 0.8 → maxdiff ≈ 13):
    // minimal p gives ~3.5-shingle parts whose empty-part rows (both-empty
    // parts must still key-match — see emptyRows below) collide
    // info-free at 29.5 s sf1 / 94 s sf3; p = 2·maxdiff+1 (which lets the
    // empty channel be restricted to docs occupying ≤ maxdiff parts —
    // essentially none) shrinks parts to ~1.7 shingles, whose SINGLETON
    // subset hashes degenerate to per-shingle keys and re-inherit the
    // df² flood: 39.5 s sf1 / 114 s sf3. Net: at this |set|/maxdiff
    // operating point the prefix+positional join (q_ngram_jaccard,
    // 10.5 s sf1) wins; PartEnum's regime is |set| ≫ diff budget, where
    // parts stay multi-element and selective. Kept registered as the
    // measured alternative exact engine.
    // p computed in BigInt — (den−num)·(hi−1) overflows Long for the top
    // band (hi = Long.MaxValue) whenever den−num > 1. Bands whose exact p
    // would exceed 2²⁰ parts are marked INVALID (−1) instead of silently
    // truncated: a truncated p < maxdiff breaks the pigeonhole guarantee
    // and would drop true pairs, contradicting the exactness contract.
    // At t = 4/5 the cap binds only for docs with > ~4.2 M shingles —
    // the operating-size bound of this engine; the runtime check below
    // fails loudly if such a doc ever appears (use the prefix join then).
    val PCap = 1L << 20
    val bands = thresholds.zipWithIndex.map { case (lo, k) =>
      val hi = if (k + 1 < thresholds.size) thresholds(k + 1) else Long.MaxValue
      val pBig = BigInt(den - num) * BigInt(hi - 1) / num + 1
      val p = if (pBig > PCap) -1L else pBig.toLong
      (k, lo, hi, p)
    }
    // band assignment as a pure expression (no range join): band(n) =
    // #thresholds <= n − 1, a codegen'd indicator sum over the ~120-entry
    // threshold ladder; p looked up from an array literal
    val bandCol = thresholds.map(t =>
      when(col("n") >= t, 1).otherwise(0)).reduce(_ + _) - lit(1)
    val pArr = array(bands.map(b => lit(b._4)): _*)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // raise_error is threaded INTO the p column (not a droppable side
    // column) so the optimizer cannot prune the completeness check
    val withBand = sizes
      .withColumn("band", bandCol)
      .withColumn("p", {
        val p0 = element_at(pArr, col("band").cast("int") + 1)
        when(p0 > 0, p0).otherwise(raise_error(concat(
          lit(s"PartEnum: doc with "), col("n"),
          lit(s" shingles needs > $PCap parts at t=$num/$den; " +
            "exactness cap exceeded — use the prefix join engine"))).cast("long"))
      })
    // role rows: anchor grid at own band; partner grid also at band−1
    val roles = withBand
      .select(col("doc_id"), col("n"), col("band").as("kb"), col("p"))
      .unionByName(withBand.filter(col("band") > 0)
        .select(col("doc_id"), col("n"), (col("band") - 1).as("kb"),
          element_at(pArr, col("band").cast("int")).as("p")))
      .distinct()
    // part-content hashes: md5 of the sorted shingles landing in each part
    val content = roles.join(sh, Seq("doc_id"))
      .select(col("doc_id"), col("n"), col("kb"), col("p"),
        pmod(Md5Bits.hash60(col("sh")), col("p")).as("part"), col("sh"))
      .groupBy(col("doc_id"), col("n"), col("kb"), col("p"), col("part"))
      .agg(md5(concat_ws("|", sort_array(collect_list(col("sh"))))).as("ph"))
    // full grid: EVERY part index emits (empty parts hash "") — with the
    // minimal p, the single guaranteed diff-free part may be empty in
    // both docs, so dropping empty rows would lose pairs
    val grid = roles
      .select(col("doc_id"), col("n"), col("kb"),
        explode(expr("sequence(0, CAST(p - 1 AS INT))")).as("part"))
      .join(content.select(col("doc_id"), col("kb"), col("part"), col("ph")),
        Seq("doc_id", "kb", "part"), "left")
      .select(col("doc_id"), col("n"), col("kb"), col("part"),
        coalesce(col("ph"), lit(md5Empty)).as("ph"))
    // anchors are grids at the doc's OWN band
    val anchorKeys = withBand.select(col("doc_id").as("a_id"), col("band"))
    val anchors = anchorKeys.alias("ak")
      .join(grid.alias("g"),
        col("ak.a_id") === col("g.doc_id") && col("ak.band") === col("g.kb"))
      .select(col("g.doc_id").as("id_a"), col("g.n").as("na"),
        col("g.kb").as("kb"), col("g.part").as("part"), col("g.ph").as("ph"))
    val partner = grid.alias("g2").select(
      col("g2.doc_id").as("id_b"), col("g2.n").as("nb"),
      col("g2.kb").as("kb"), col("g2.part").as("part"), col("g2.ph").as("ph"))
    val cands = anchors.alias("an")
      .join(partner.alias("pr"),
        col("an.kb") === col("pr.kb") && col("an.part") === col("pr.part") &&
          col("an.ph") === col("pr.ph"))
      // (n, doc_id)-lexicographic anchor + exact-integer size ratio
      .filter((col("na") < col("nb") ||
        (col("na") === col("nb") && col("id_a") < col("id_b"))) &&
        lit(num) * col("nb") <= lit(den) * col("na"))
      .select(col("id_a"), col("id_b"), col("na"), col("nb"))
      .distinct()
    val docSets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sh"))).as("ss"))
    cands
      .join(docSets.select(col("doc_id").as("id_a"), col("ss").as("sa")), Seq("id_a"))
      .join(docSets.select(col("doc_id").as("id_b"), col("ss").as("sb")), Seq("id_b"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("na"), col("nb"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("shared"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= num.toDouble / den)
  }

  private val md5Empty =
    java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString

  // ── Asymmetric containment (subset-duplicate detection) ────────────────
  // The near-dup case symmetric Jaccard structurally misses: a short doc
  // fully quoted inside a much longer one scores J = |A|/|B| ≈ 0 but
  // containment |A∩B|/|A| ≈ 1 — the quote/boilerplate/excerpt duplicates
  // a curation pipeline must still catch (this is why dedup surveys track
  // containment separately from resemblance, Broder 1997). Same exact-
  // verification architecture as qNgramJaccard, with the ONE-SIDED prefix
  // bound: containment ≥ t of A in B forces a shared shingle inside A's
  // p = n − ceil(t·n) + 1 rarest shingles, and only n_b ≥ ceil(t·n_a)
  // survives (shared ≤ n_b) — both filters LOSSLESS, so the result set
  // equals the naive ordered-pair join (spec-asserted) and the oracle
  // replays the naive spelling. The candidate side joins A-prefixes to
  // the full inverted index (no size-ratio symmetric filter exists for
  // containment — rarity of prefix shingles is what bounds the volume).
  private val ContainT = 0.9

  def qContainment(s: SparkSession, d: String): DataFrame =
    containmentPrefix(shingleIndex(s, d), threshold = ContainT)

  def containmentPrefix(sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same note as ngramJaccardPrefix: the eager-materialization variant
    // measured a clear regression (1.6 -> 3.0 s at sf0.1) — kept lazy
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    val tDec = new java.math.BigDecimal(threshold.toString)
    val ranked = sh.join(df, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .withColumn("p", (col("n") - ceil(lit(tDec) * col("n")) + 1).cast("int"))
    val prefix = ranked.filter(col("rk") <= col("p"))
      .select(col("doc_id"), col("sh"), col("n"), col("rk"))
    // the full inverted index, but carrying each shingle's rank in the
    // SAME global canonical order — what the positional filter needs
    val indexed = ranked
      .select(col("doc_id").as("doc_b"), col("sh"),
        col("n").as("nb"), col("rk").as("rkb"))
    // positional filter (PPJoin, one-sided): the FIRST shared shingle at
    // ranks (i in A, j in B) bounds overlap ≤ 1 + min(na−i, nb−j), and
    // containment ≥ t needs overlap ≥ ceil(t·na) — prunes pairs whose
    // match positions cannot carry the bound, LOSSLESSLY (the
    // prefix==naive equivalence spec covers it). Without it the
    // prefix × full-index join floods on closed-vocabulary corpora
    // (85 s at sf1; the b-side match can sit anywhere in B, so no
    // size-ratio filter exists for containment — position is the only
    // lever).
    val cands = prefix.join(indexed, Seq("sh"))
      .filter(col("doc_id") =!= col("doc_b") &&
        col("nb") >= ceil(lit(tDec) * col("n")) &&
        lit(1) + least(col("n") - col("rk"), col("nb") - col("rkb")) >=
          ceil(lit(tDec) * col("n")))
      .select(col("doc_id").as("doc_a"), col("doc_b"), col("n").as("na"))
      .distinct()
    // same array-based exact verification as ngramJaccardPrefix (see the
    // rationale there): one array_intersect per candidate, no second
    // inverted-index fan-out
    val docSets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sh"))).as("ss"))
    val inter = cands
      .join(docSets.select(col("doc_id").as("doc_a"), col("ss").as("sa")), Seq("doc_a"))
      .join(docSets.select(col("doc_id").as("doc_b"), col("ss").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("shared"))
    inter
      .filter(col("shared").cast("double") / col("na") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        round(col("shared").cast("double") / col("na"), 6)
          .as("containment_r"))
  }

  /** Naive ordered-pair spelling — the reference for the equivalence
    * spec and the shape the oracle replays. */
  private[graft] def containmentNaive(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared.join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .filter(col("shared").cast("double") / col("sa.n") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        round(col("shared").cast("double") / col("sa.n"), 6)
          .as("containment_r"))
  }

  lazy val qContainmentSql: String =
    s"WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents), " +
      s"sh AS (SELECT doc_id, unnest($sqlShingles) AS sh FROM toks), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "count(*) AS shared FROM sh a JOIN sh b " +
      "ON a.sh = b.sh AND a.doc_id <> b.doc_id GROUP BY 1, 2) " +
      "SELECT doc_a, doc_b, shared, " +
      "round(CAST(shared AS DOUBLE) / sa.n, 6) AS containment_r " +
      "FROM shared JOIN sizes sa ON doc_a = sa.doc_id " +
      s"WHERE CAST(shared AS DOUBLE) / sa.n >= $ContainT"

  /** The naive all-shingles spelling, kept as the reference
    * implementation for the prefix-filter equivalence spec. */
  private[graft] def ngramJaccardNaive(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") /
          (col("sa.n") + col("sb.n") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  private val sqlToks = // single shared oracle tokenizer spelling
    graft.functions.TextFunctions.sqlTokens
  private val sqlShingles =
    s"list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)), " +
      "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"

  val qNgramJaccardSql: String =
    s"WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents), " +
      s"sh AS (SELECT doc_id, unnest($sqlShingles) AS sh FROM toks), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared " +
      "FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT doc_a, doc_b, shared, " +
      "CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard " +
      "FROM shared JOIN sizes sa ON doc_a = sa.doc_id " +
      "JOIN sizes sb ON doc_b = sb.doc_id " +
      "WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8"

  /** The same naive-join oracle over q_jaccard_partenum's deterministic
    * md5 doc sample — replays the engine's regime gate exactly; at the
    * gate SFs (≤ 5 000 docs) the LIMIT never binds and this is
    * qNgramJaccardSql verbatim. */
  val qJaccardPartEnumSql: String =
    s"WITH pesmp AS (SELECT doc_id, text FROM documents ORDER BY " +
      Md5Bits.sqlHash60("CAST(doc_id AS VARCHAR)") +
      s", doc_id LIMIT $PartEnumSample), " +
      qNgramJaccardSql.stripPrefix("WITH ").replace("FROM documents)", "FROM pesmp)")

  // ── MinHash-LSH near-dup candidates (the 100 TB path) ──────────────────
  // numHashes minhashes per doc from ONE md5 per shingle: x = hash60(sh)
  // mod p, then a Carter–Wegman universal family mh_i = (a_i·x + b_i)
  // mod p with p prime < 2^31 and per-seed constants derived from i by
  // the same closed formula on both engines. One digest per shingle (32
  // md5s per shingle was the whole q_minhash_lsh bench cost), every
  // product < 2^61 (ANSI-overflow-safe on Spark, BIGINT-safe on DuckDB),
  // and proper cross-seed independence — a single globally-minimal
  // md5 value cannot dominate every seed's min the way a shared-prefix
  // family would. Signatures band into rows; docs sharing any band become
  // candidates; candidates verified by signature Jaccard (estimate of
  // true Jaccard). Fully reproduced by qMinhashLshSql; recall vs exact
  // Jaccard stays spec-tested.
  private[graft] val MinhashP = 1073741789L // largest prime < 2^30

  /** Per-seed min over a pre-reduced hash column `x` (= hash60 mod p). */
  def minhashSignature(x: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      val a = (i * 2654435761L) % (MinhashP - 1) + 1 // in [1, p-1], never 0
      val b = (i * 97531L) % MinhashP
      min((lit(a) * x + lit(b)) % MinhashP).as(s"mh_$i")
    }

  // 4 rows per band (not 2): the band-collision probability for a pair at
  // Jaccard J is J^4, so weakly-similar pairs (J≈0.3, common in the
  // small-vocabulary fixture corpus) almost never collide — candidate
  // volume drops ~10× while recall at J≥0.8 stays 1-(1-0.8⁴)⁸ ≈ 0.985.
  def qMinhashLsh(s: SparkSession, d: String): DataFrame =
    lshPairs(Tables.documents(s, d), numHashes = 32, bands = 8, threshold = 0.8)

  /** LSH candidate pairs with signature-estimated Jaccard >= threshold.
    * Reusable over any (doc_id, text) frame. */
  def lshPairs(docs: DataFrame, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    Shingles.register(docs.sparkSession)
    val sh = docs
      .select(col("doc_id"), explode(Shingles.shingles(col("text"), 3)).as("sh"))
      // ONE md5 per shingle, reduced into the prime field before the agg
      .select(col("doc_id"), (Md5Bits.hash60(col("sh")) % MinhashP).as("x"))
    val sigCols = minhashSignature(col("x"), numHashes)
    val sig = sh.groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    // band key = the band's slice of the signature itself (exact bucket
    // semantics — no bucket-hash collisions, and the oracle can reproduce
    // the join by comparing slices; rowsPerBand longs per key is still a
    // constant-size shuffle key)
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("bucket"))
      }: _*)).as("bk"))
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    // verify: fraction of agreeing minhashes estimates Jaccard
    cands
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
          x => x)).cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  // ── SimHash fingerprints + Hamming near-dup pairs ──────────────────────
  // Fingerprinting is one codegen'd scan (no shuffle). Pairing at scale is
  // Manku et al.'s block-combination bucketing (WWW 2007): split the
  // 60-bit fingerprint into 6 blocks of 10 bits; Hamming distance <= 3
  // flips at most 3 blocks, so at least 3 stay intact and some triple of
  // blocks matches exactly — bucket keys are the C(6,3)=20 block TRIPLES
  // (30-bit key space). Still a complete pigeonhole generator, but the
  // spurious-collision volume is 20·N²/2³⁰ instead of the 4·N²/2¹⁵ a
  // single-block key costs: the sf1 bench showed the 15-bit variant going
  // quadratic (0.75 s → 30 s for 10× docs) exactly as that formula
  // predicts, while triples keep the candidate stage output-bound.
  def qSimhashPairs(s: SparkSession, d: String): DataFrame = {
    SimHash.register(s)
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), SimHash.simhash(col("text")).as("fp"))
    def block(b: Int) =
      shiftrightunsigned(col("fp"), b * SimHash.BlockBits)
        .bitwiseAND(lit(SimHash.BlockMask))
    val blocks = fp.select(col("doc_id"), col("fp"),
      explode(array(SimHash.BlockCombos.zipWithIndex.map { case (combo, i) =>
        struct(lit(i).as("combo"),
          combo.foldLeft(lit(0L))((acc, b) =>
            shiftleft(acc, SimHash.BlockBits).bitwiseOR(block(b))).as("key"))
      }: _*)).as("bk"))
    blocks.as("x")
      .join(blocks.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("bigint").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
  }

  // ── Winnowing fingerprint overlap (LOCAL near-dup / containment) ───────
  // md5-derived winnowing fingerprints (one codegen pass per doc, only
  // 8-byte hashes shuffle); pairs sharing >= 50% of the SMALLER doc's
  // fingerprints — catches a copied passage inside an otherwise-different
  // document, which whole-doc signals (SimHash, MinHash) miss.
  // Oracle: fingerprints(doc) = DISTINCT windowed min of the k-gram
  // hashes (value sets don't depend on the tie-break — see Winnow's
  // scaladoc), so DuckDB recomputes them with one windowed `min`; the
  // winnowing guarantee itself stays spec-tested.
  // k=12 normalized chars (~2 words), w=8: short grams collide across
  // unrelated docs in a small vocabulary and quadratically flood the
  // self-join — 12-char grams keep matches meaningful (guarantee: any
  // shared run of >= 19 normalized chars still yields a shared print).
  // Candidate generation follows the prefix-filter architecture the
  // Jaccard/containment ops use, adapted to the min-denominator
  // threshold: overlap >= ceil(n_small/2) forces a shared print among
  // the SMALLER doc's p = n_small - ceil(n_small/2) + 1 rarest prints
  // (global df-order), so the anchor side joins only those prints to the
  // full index, PPJoin's positional bound 1 + min(na-i, nb-j) >= alpha
  // prunes position-incompatible matches losslessly, and the true shared
  // count comes from one array_intersect per surviving pair. The naive
  // print self-join measured 163 s at sf1 (closed-vocabulary fixture:
  // print df grows with the corpus, so matched rows grow quadratically);
  // this plan is output-bound. Anchor = (n, doc_id)-lexicographic
  // smaller side, so each unordered pair generates from exactly one
  // anchor and the emitted (doc_a < doc_b by id) rows match the naive
  // spelling row-for-row (spec-asserted).
  def qWinnowOverlap(s: SparkSession, d: String): DataFrame = {
    Winnow.register(s)
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), explode(Winnow.winnow(col("text"), 12, 8)).as("h"))
    winnowOverlapPrefix(fp, num = 1, den = 2)
  }

  /** Exact threshold overlap (shared >= ceil(num·min(na,nb)/den)) over a
    * (doc_id, h) fingerprint table — prefix + positional candidates from
    * the smaller side, array_intersect verification. */
  private[graft] def winnowOverlapPrefix(fp: DataFrame, num: Int, den: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val sizes = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val ranked = fp.join(df, "h")
      .withColumn("rk", row_number().over(byRarity))
      .join(sizes, "doc_id")
    // alpha(ns) = ceil(num·ns/den) in exact integer arithmetic
    def alphaOf(n: String) = s"(($num * $n + ${den - 1}) div $den)"
    val prefix = ranked
      .filter(expr(s"rk <= n - ${alphaOf("n")} + 1"))
      .select(col("doc_id").as("id_s"), col("h"),
        col("n").as("ns"), col("rk").as("rks"))
    val indexed = ranked.select(col("doc_id").as("id_l"), col("h"),
      col("n").as("nl"), col("rk").as("rkl"))
    val cands = prefix.join(indexed, Seq("h"))
      // anchor strictly (n, doc_id)-smaller: one generator per pair
      .filter(col("ns") < col("nl") ||
        (col("ns") === col("nl") && col("id_s") < col("id_l")))
      // positional: the first shared print bounds the total overlap
      .filter(lit(1) + least(col("ns") - col("rks"), col("nl") - col("rkl")) >=
        expr(alphaOf("ns")))
      .select(col("id_s"), col("id_l"), col("ns"))
      .distinct()
    val docSets = fp.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("h"))).as("hs"))
    cands
      .join(docSets.select(col("doc_id").as("id_s"), col("hs").as("ha")), Seq("id_s"))
      .join(docSets.select(col("doc_id").as("id_l"), col("hs").as("hb")), Seq("id_l"))
      .select(
        least(col("id_s"), col("id_l")).as("doc_a"),
        greatest(col("id_s"), col("id_l")).as("doc_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("shared"),
        col("ns"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") / col("ns")).as("overlap"))
      .filter(col("overlap") >= num.toDouble / den)
  }

  // ── DuckDB oracles for the approximate family ──────────────────────────
  // Every hash bit above derives from md5 (Md5Bits), so DuckDB recomputes
  // the minhash signatures / simhash fingerprints / winnow prints
  // bit-for-bit and the "approximate" queries become fully hash-checked:
  // approximate refers to what they estimate (Jaccard, Hamming
  // neighborhoods), not to any engine-specific randomness.

  private def sqlHash60(e: String) = Md5Bits.sqlHash60(e)

  // Candidate generation replays the ENGINE's banded equi-join (hash join
  // on the 4-slice band keys + distinct), the exact treatment
  // qMinhashErrorSql got in r13 — same pair set by construction (∃band
  // with equal slices ⟺ some band-key join row exists). The old
  // `sig a JOIN sig b ON a.doc_id < b.doc_id WHERE EXISTS(range(0,8)...)`
  // spelling was O(n²) list comparisons and infeasible in DuckDB at sf3
  // (killed at 40 CPU-min); this one is output-bound like the engine.
  val qMinhashLshSql: String =
    s"WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents), " +
      s"sh AS (SELECT doc_id, unnest($sqlShingles) AS sh FROM toks), " +
      s"hx AS (SELECT doc_id, ${sqlHash60("sh")} % $MinhashP AS x FROM sh), " +
      "mh AS (SELECT doc_id, i, " +
      s"min((((i * 2654435761) % ${MinhashP - 1} + 1) * x + (i * 97531) % $MinhashP) % $MinhashP) AS mh " +
      "FROM hx, range(0, 32) r(i) GROUP BY 1, 2), " +
      "sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY 1), " +
      "bk AS (SELECT doc_id, sig, bb, sig[bb*4+1 : bb*4+4] AS bucket " +
      "FROM sig, range(0, 8) t(bb)), " +
      "cand0 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
      "FROM bk a JOIN bk b ON a.bb = b.bb AND a.bucket = b.bucket " +
      "AND a.doc_id < b.doc_id), " +
      "cand AS (SELECT doc_a, doc_b, " +
      "CAST(len(list_filter(range(1, 33), j -> a.sig[j] = b.sig[j])) AS DOUBLE) / 32 AS est_jaccard " +
      "FROM cand0 JOIN sig a ON a.doc_id = doc_a " +
      "JOIN sig b ON b.doc_id = doc_b) " +
      "SELECT doc_a, doc_b, est_jaccard FROM cand WHERE est_jaccard >= 0.8"

  // ── Dedup report: near-dup cluster census over the LSH pair graph ──────
  // The number a dedup run actually reports before anyone deletes data:
  // connected components over the MinHash-LSH candidate pairs (the same
  // oracle-proven pair generator as q_minhash_lsh), rolled up into a
  // cluster-size histogram — "how many duplicate groups of size 2, 3, …
  // does this corpus contain". The CC fixpoint runs on the PAIR graph
  // (orders of magnitude below the corpus; docs with no near-dup never
  // enter it), 20 min-label rounds with early exit, mirrored by the
  // oracle's unrolled CTEs (converged labels are a fixed point, so
  // surplus oracle rounds are no-ops).
  private val DedupCcRounds = 20

  def qDedupReport(s: SparkSession, d: String): DataFrame = {
    val pairs = lshPairs(Tables.documents(s, d),
        numHashes = 32, bands = 8, threshold = 0.8)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    graft.operators.ConnectedComponents
      .components(pairs, maxIterations = DedupCcRounds)
      .groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
  }

  val qDedupReportSql: String = {
    def iter(prev: String): String =
      s"SELECT l.node, least(l.comp, coalesce(m.mn, l.comp)) AS comp FROM $prev l " +
        s"LEFT JOIN (SELECT s2.a AS node, min(x.comp) AS mn FROM dsym s2 " +
        s"JOIN $prev x ON s2.b = x.node GROUP BY 1) m USING (node)"
    val rounds = (1 to DedupCcRounds)
      .map(i => s"dl$i AS MATERIALIZED (${iter(s"dl${i - 1}")})").mkString(", ")
    // qMinhashLshSql's own CTE chain, re-used verbatim as a subquery
    s"WITH pr AS MATERIALIZED (SELECT doc_a, doc_b FROM ($qMinhashLshSql) z), " +
      "dsym AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pr " +
      "UNION SELECT doc_b, doc_a FROM pr), " +
      "dl0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS comp FROM dsym), " +
      rounds + " " +
      "SELECT cluster_size, count(*) AS n_clusters FROM " +
      s"(SELECT comp, count(*) AS cluster_size FROM dl$DedupCcRounds GROUP BY 1) g " +
      "GROUP BY 1"
  }

  val qSimhashPairsSql: String = {
    val bits = SimHash.Bits
    s"WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents WHERE text IS NOT NULL), " +
      "tok AS (SELECT doc_id, unnest(t) AS w FROM toks), " +
      s"th AS (SELECT doc_id, ${sqlHash60("w")} AS h FROM tok), " +
      "bits AS (SELECT doc_id, b, " +
      "sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS c " +
      s"FROM th, range(0, $bits) r(b) GROUP BY 1, 2), " +
      "fph AS (SELECT doc_id, CAST(sum(CASE WHEN c > 0 " +
      "THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS fp " +
      "FROM bits GROUP BY 1), " +
      // token-less docs still fingerprint (all counts 0 → fp 0) on the
      // engine side — LEFT JOIN + coalesce mirrors that
      "fp AS (SELECT d.doc_id, coalesce(f.fp, 0) AS fp " +
      "FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d " +
      "LEFT JOIN fph f ON d.doc_id = f.doc_id) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming " +
      "FROM fp a JOIN fp b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.fp, b.fp)) <= 3"
  }

  val qWinnowOverlapSql: String =
    "WITH norm AS (SELECT doc_id, " +
      "regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s " +
      "FROM documents WHERE text IS NOT NULL), " +
      "grams AS (SELECT doc_id, " +
      "unnest(generate_series(1, greatest(len(s) - 11, 0))) AS i, s FROM norm), " +
      s"gh AS (SELECT doc_id, i, ${sqlHash60("substr(s, i, 12)")} AS h FROM grams), " +
      "wm AS (SELECT doc_id, i, min(h) OVER (PARTITION BY doc_id ORDER BY i " +
      "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mh FROM gh), " +
      "fp AS (SELECT DISTINCT doc_id, mh AS h FROM wm WHERE i >= 8), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY 1), " +
      "shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared " +
      "FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT doc_a, doc_b, shared, " +
      "CAST(shared AS DOUBLE) / least(sa.n, sb.n) AS overlap " +
      "FROM shared JOIN sizes sa ON doc_a = sa.doc_id " +
      "JOIN sizes sb ON doc_b = sb.doc_id " +
      "WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5"

  // ── Portable HLL distinct-shingle estimate ─────────────────────────────
  // The engine-agnostic twin of q_approx_distinct (Spark's HLL++ over
  // xxhash64 — unreplayable elsewhere): functions.Sketches builds the
  // same sketch from md5 bits with an integer-exact harmonic denominator,
  // so even the cardinality-sketch family is DuckDB-hash-checked. One
  // scan, 128 registers, ~9% error (spec-asserted vs exact distinct).
  def qHllDistinct(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Sketches
    Shingles.register(s)
    Tables.documents(s, d)
      .select(explode(Shingles.shingles(col("text"), 3)).as("v"))
      .select(Sketches.hllRegister(col("v")), Sketches.hllRank(col("v")))
      .groupBy(col("hll_idx")).agg(max(col("hll_rho")).as("mx"))
      // call_function: the shiftleft Column helper takes a literal Int
      // shift; the SQL function accepts a per-row shift expression
      .agg(sum(call_function("shiftleft", lit(1L),
        lit(Sketches.RestBits + 1) - col("mx"))).as("s_present"),
        count(lit(1)).as("n_present"))
      .select(Sketches.hllFinish(col("s_present"), col("n_present")): _*)
      .select(col("s_scaled"), col("zero_registers"),
        Sketches.hllEstimate(col("s_scaled"), col("zero_registers"))
          .as("est_distinct"))
  }

  val qHllDistinctSql: String =
    graft.functions.Sketches.sqlHll(
      s"SELECT unnest($sqlShingles) AS v " +
        s"FROM (SELECT $sqlToks AS t FROM documents) tt")

  // ── HLL estimator accuracy audit ───────────────────────────────────────
  // Closes the sketch-audit family (MinHash → q_minhash_error, CMS →
  // q_cms_error): the portable 128-register HLL's cardinality estimate
  // against the EXACT distinct-shingle count, with the signed relative
  // error — the number that sizes the register count before anyone
  // trusts the sketch on a 100 TB dedup run. The shingle stream is
  // materialized once and feeds both the sketch fold and the exact
  // count; both sides are one aggregation each.
  def qHllError(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Sketches
    Shingles.register(s)
    val vals = Tables.documents(s, d)
      .select(explode(Shingles.shingles(col("text"), 3)).as("v"))
      .localCheckpoint(true)
    val est = vals
      .select(Sketches.hllRegister(col("v")), Sketches.hllRank(col("v")))
      .groupBy(col("hll_idx")).agg(max(col("hll_rho")).as("mx"))
      .agg(sum(call_function("shiftleft", lit(1L),
        lit(Sketches.RestBits + 1) - col("mx"))).as("s_present"),
        count(lit(1)).as("n_present"))
      .select(Sketches.hllFinish(col("s_present"), col("n_present")): _*)
      .select(Sketches.hllEstimate(col("s_scaled"), col("zero_registers"))
        .as("est_distinct"))
    val exact = vals.agg(countDistinct(col("v")).as("exact_distinct"))
    est.crossJoin(exact)
      .select(col("exact_distinct"), col("est_distinct"),
        round((col("est_distinct") - col("exact_distinct")) /
          col("exact_distinct"), 6).as("rel_err"))
  }

  val qHllErrorSql: String = {
    val src = s"SELECT unnest($sqlShingles) AS v " +
      s"FROM (SELECT $sqlToks AS t FROM documents) tt"
    s"WITH est AS (SELECT est_distinct FROM (${graft.functions.Sketches.sqlHll(src)}) e), " +
      s"ex AS (SELECT CAST(count(DISTINCT v) AS BIGINT) AS exact_distinct FROM ($src) vv) " +
      "SELECT exact_distinct, est_distinct, " +
      "round((est_distinct - exact_distinct) / exact_distinct, 6) AS rel_err " +
      "FROM est CROSS JOIN ex"
  }

  // ── Blocked fuzzy matching (record linkage) ────────────────────────────
  // Approximate string matching between records that exact dedup misses:
  // candidate pairs come from cheap deterministic BLOCKING keys, and only
  // within-block pairs pay the edit-distance comparison — the standard
  // record-linkage shape (Fellegi–Sunter). MULTI-PASS blocking (first
  // token AND last token — a pair is a candidate if it agrees on either)
  // because single-key blocking provably loses recall here: "red ring" /
  // "red rod" differ in the last token yet are 3 edits apart; the
  // DedupSpec proves the two passes reach full all-pairs recall on this
  // fixture rather than assuming it. Scale: comparisons run over the
  // DEDUPLICATED name dictionary (names << rows; the groupBy carries each
  // name's support), and the pair explosion is per-block bounded — never
  // all-pairs over the corpus. Spark's levenshtein(threshold) variant
  // short-circuits the DP at MaxEdit, so cost per pair is O(len·k) not
  // O(len²). Both engines implement plain Levenshtein — the distance is
  // engine-portable, giving the fuzzy family an exact oracle.
  private val MaxEdit = 3

  def qFuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
    val blocks = names.select(col("name"), col("n_parts"),
      explode(array(
        element_at(split(col("name"), " "), 1),
        element_at(split(col("name"), " "), -1))).as("block"))
    val a = blocks.select(col("block"), col("name").as("name_a"),
      col("n_parts").as("n_a"))
    val b = blocks.select(col("block"), col("name").as("name_b"),
      col("n_parts").as("n_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev",
        levenshtein(col("name_a"), col("name_b"), MaxEdit).cast("long"))
      // the threshold variant returns -1 above MaxEdit — keep 0..MaxEdit
      .filter(col("lev").between(0, MaxEdit))
      // a pair found by both passes must count once
      .select(col("name_a"), col("name_b"), col("lev"),
        col("n_a"), col("n_b"))
      .distinct()
  }

  val qFuzzyMatchSql: String =
    "WITH names AS (SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY 1), " +
      "blocks AS (SELECT name, n_parts, unnest([" +
      "(str_split(name, ' '))[1], (str_split(name, ' '))[-1]]) AS block FROM names) " +
      "SELECT DISTINCT a.name AS name_a, b.name AS name_b, " +
      "CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev, " +
      "a.n_parts AS n_a, b.n_parts AS n_b " +
      "FROM blocks a JOIN blocks b ON a.block = b.block AND a.name < b.name " +
      s"WHERE levenshtein(a.name, b.name) <= $MaxEdit"

  // ── Train/eval decontamination (n-gram collision audit) ────────────────
  // The contamination check run before any evaluation: which eval-split
  // documents share an 8-gram with ANY training document (the standard
  // n-gram-collision decontamination method). The corpus splits by a
  // salted md5 of doc_id (engine-portable, reproducible); the train side
  // collapses to its DISTINCT shingle set — at 100 TB only 8-byte-ish
  // shingle strings shuffle, never documents, and the eval⋈train join is
  // an inverted-index probe, not a doc×doc product. Output: each
  // contaminated eval doc with its collision count and contamination
  // fraction (integer counts, one rounded division).
  def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    Shingles.register(s)
    val side = Md5Bits.hash60(concat(lit("dc:"), col("doc_id").cast("string"))) % 2
    val sh = Tables.documents(s, d)
      .withColumn("side", side)
      .select(col("doc_id"), col("side"),
        explode(Shingles.shingles(col("text"), 8)).as("sh"))
    val trainSh = sh.filter(col("side") === 0).select(col("sh")).distinct()
    val evalSh = sh.filter(col("side") === 1)
    val sizes = evalSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = evalSh.join(trainSh, Seq("sh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_collisions"))
    sizes.join(hits, Seq("doc_id"))
      .select(col("doc_id"), col("n_shingles"), col("n_collisions"),
        round(col("n_collisions").cast("double") /
          col("n_shingles").cast("double"), 6).as("contam_r"))
  }

  private val sqlShingles8 =
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 7, 0)), " +
      "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || " +
      "t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))"

  val qDecontaminateSql: String = {
    val side = Md5Bits.sqlHash60("'dc:' || CAST(doc_id AS VARCHAR)") + " % 2"
    s"WITH toks AS (SELECT doc_id, $side AS side, " +
      s"${graft.functions.TextFunctions.sqlTokens} AS t FROM documents), " +
      s"sh AS (SELECT doc_id, side, unnest($sqlShingles8) AS sh FROM toks), " +
      "train AS (SELECT DISTINCT sh FROM sh WHERE side = 0), " +
      "ev AS (SELECT doc_id, sh FROM sh WHERE side = 1), " +
      "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM ev GROUP BY 1), " +
      "hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_collisions " +
      "FROM ev JOIN train USING (sh) GROUP BY 1) " +
      "SELECT doc_id, n_shingles, n_collisions, " +
      "round(CAST(n_collisions AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS contam_r " +
      "FROM sizes JOIN hits USING (doc_id)"
  }

  // ── Incremental dedup (new batch vs historical corpus) ─────────────────
  // The steady-state production shape: dedup an INCOMING batch against
  // the already-ingested corpus without rescanning it pairwise — accept
  // an incoming doc iff its content digest is unseen historically AND it
  // is the smallest-id holder of that digest within the batch. Both
  // checks shuffle 16-byte digests only; the historical side would be a
  // bucketed digest table at scale, making the anti-join co-located.
  def qDedupIncremental(s: SparkSession, d: String): DataFrame = {
    val side = Md5Bits.hash60(concat(lit("inc:"), col("doc_id").cast("string"))) % 2
    val docs = Tables.documents(s, d)
      .withColumn("side", side)
      .select(col("doc_id"), col("side"), md5(col("text")).as("digest"))
    val hist = docs.filter(col("side") === 0).select(col("digest")).distinct()
    val incoming = docs.filter(col("side") === 1)
    incoming.join(hist, Seq("digest"), "left_anti")
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("accept_id"), count(lit(1)).as("n_batch_copies"))
  }

  val qDedupIncrementalSql: String = {
    val side = Md5Bits.sqlHash60("'inc:' || CAST(doc_id AS VARCHAR)") + " % 2"
    s"WITH docs AS (SELECT doc_id, $side AS side, md5(text) AS digest FROM documents), " +
      "hist AS (SELECT DISTINCT digest FROM docs WHERE side = 0) " +
      "SELECT digest, min(doc_id) AS accept_id, count(*) AS n_batch_copies " +
      "FROM docs WHERE side = 1 AND digest NOT IN (SELECT digest FROM hist) " +
      "GROUP BY 1"
  }

  // ── Jaro–Winkler fuzzy pairs (transposition-tolerant linkage) ──────────
  // The same multi-pass blocking as qFuzzyMatch, scored with the codegen
  // JaroWinklerExpression instead of edit distance: JW credits shared
  // prefixes and tolerates transpositions — the standard choice for
  // name-shaped keys (Winkler 1990), and a metric Spark lacks natively.
  // DuckDB's jaro_winkler_similarity (same parameterization: 0.7 boost
  // threshold, 0.1 prefix scale, prefix ≤ 4) is the independent oracle of
  // the custom Expression. The threshold filter runs on the 6-dp ROUNDED
  // score on BOTH engines so a borderline pair cannot diverge on ulps.
  // Scale: identical to qFuzzyMatch — blocked candidate pairs over the
  // deduplicated name dictionary, never the fact table.
  private val JwThreshold = 0.85

  def qJaroWinkler(s: SparkSession, d: String): DataFrame = {
    graft.functions.JaroWinkler.register(s)
    val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
    val blocks = names.select(col("name"),
      explode(array(
        element_at(split(col("name"), " "), 1),
        element_at(split(col("name"), " "), -1))).as("block"))
    val a = blocks.select(col("block"), col("name").as("name_a"))
    val b = blocks.select(col("block"), col("name").as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        round(graft.functions.JaroWinkler.jw(col("name_a"), col("name_b")), 6)
          .as("jw_r"))
      .filter(col("jw_r") >= JwThreshold)
      .distinct()
  }

  val qJaroWinklerSql: String =
    "WITH names AS (SELECT DISTINCT p_name AS name FROM part), " +
      "blocks AS (SELECT name, unnest([" +
      "(str_split(name, ' '))[1], (str_split(name, ' '))[-1]]) AS block FROM names) " +
      "SELECT DISTINCT a.name AS name_a, b.name AS name_b, " +
      "round(jaro_winkler_similarity(a.name, b.name), 6) AS jw_r " +
      "FROM blocks a JOIN blocks b ON a.block = b.block AND a.name < b.name " +
      s"WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= $JwThreshold"

  // ── Entity resolution: fuzzy clusters → golden records ─────────────────
  // The full record-linkage pipeline the fuzzy matcher feeds: candidate
  // pairs (multi-pass blocked levenshtein, qFuzzyMatch) become edges of a
  // similarity graph, connected components merge transitively-linked
  // name variants into entities, and each entity emits one GOLDEN RECORD
  // — survivor = the variant with the highest support (ties broken
  // lexicographically), plus the member count and pooled support the
  // merge accumulates. Scale: everything downstream of the blocked
  // compare operates on the deduplicated name dictionary (names << rows);
  // the cluster aggregation shuffles once on the component label. The
  // oracle replays the same min-label propagation unrolled as DuckDB
  // CTEs (extra rounds past convergence are no-ops on both engines).
  private val ErRounds = 16

  def qEntityResolution(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("nid"))
      // feeds both edge-endpoint joins and the final cluster rollup
      .transform(graft.operators.IterCheckpoint(_))
    val ids = names.select(col("name"), col("nid"))
    val edges = qFuzzyMatch(s, d)
      .join(ids.select(col("name").as("name_a"), col("nid").as("src")), Seq("name_a"))
      .join(ids.select(col("name").as("name_b"), col("nid").as("dst")), Seq("name_b"))
      .select(col("src"), col("dst"))
    val labels = graft.operators.ConnectedComponents
      .components(edges, maxIterations = ErRounds)
    // unmatched names are their own singleton entity
    val withComp = names
      .join(labels.withColumnRenamed("node", "nid"), Seq("nid"), "left")
      .withColumn("cluster", coalesce(col("comp"), col("nid")))
    val byCluster = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
    withComp
      .withColumn("rk", row_number().over(
        byCluster.orderBy(col("n_parts").desc, col("name").asc)))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .withColumn("total_parts", sum(col("n_parts")).over(byCluster))
      .filter(col("rk") === 1)
      .select(col("cluster"), col("name").as("survivor"),
        col("n_members"), col("total_parts"))
  }

  val qEntityResolutionSql: String = {
    def iter(prev: String): String =
      s"SELECT l.node, least(l.comp, coalesce(m.mn, l.comp)) AS comp FROM $prev l " +
        s"LEFT JOIN (SELECT s.a AS node, min(x.comp) AS mn FROM sym s " +
        s"JOIN $prev x ON s.b = x.node GROUP BY 1) m USING (node)"
    val rounds = (1 to ErRounds)
      .map(i => s"l$i AS MATERIALIZED (${iter(s"l${i - 1}")})").mkString(", ")
    "WITH names AS (SELECT p_name AS name, count(*) AS n_parts, " +
      "min(p_partkey) AS nid FROM part GROUP BY 1), " +
      "blocks AS (SELECT name, nid, unnest([" +
      "(str_split(name, ' '))[1], (str_split(name, ' '))[-1]]) AS block FROM names), " +
      "pairs AS (SELECT DISTINCT a.nid AS src, b.nid AS dst " +
      "FROM blocks a JOIN blocks b ON a.block = b.block AND a.name < b.name " +
      s"WHERE levenshtein(a.name, b.name) <= $MaxEdit), " +
      "sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM pairs " +
      "UNION SELECT dst, src FROM pairs), " +
      "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS comp FROM sym), " +
      rounds + ", " +
      s"labeled AS (SELECT n.name, n.n_parts, coalesce(l.comp, n.nid) AS cluster " +
      s"FROM names n LEFT JOIN l$ErRounds l ON n.nid = l.node), " +
      "ranked AS (SELECT *, row_number() OVER " +
      "(PARTITION BY cluster ORDER BY n_parts DESC, name) AS rk, " +
      "CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members, " +
      "CAST(sum(n_parts) OVER (PARTITION BY cluster) AS BIGINT) AS total_parts " +
      "FROM labeled) " +
      "SELECT cluster, name AS survivor, n_members, total_parts " +
      "FROM ranked WHERE rk = 1"
  }

  // ── Duplicated-span fraction (exact-substring dedup signal) ────────────
  // Lee et al., "Deduplicating Training Data Makes Language Models
  // Better" (ACL 2022): the per-document fraction of token positions
  // whose SpanW-token span also occurs at any other position in the
  // corpus (another doc, or elsewhere in the same doc). The reference has
  // no notion of this; it is the signal a 100 TB curation run thresholds
  // on before dropping boilerplate-heavy pages. Exactly two shuffles,
  // both on high-cardinality keys (span text, then doc_id) — no pairwise
  // stage anywhere, so the span-count table stays distributed however
  // large the corpus grows.
  private val SpanW = 5

  def qDupSpans(s: SparkSession, d: String): DataFrame =
    dupSpans(Tables.documents(s, d))

  /** The same plan over any (doc_id, text) frame — spec entry point. */
  def dupSpans(docs: DataFrame): DataFrame = {
    // codegen positional shingles: the column-algebra spelling re-runs
    // the tokenizer per span position (O(len²)/doc, interpreted HOFs)
    Shingles.register(docs.sparkSession)
    val spans = docs.select(col("doc_id"),
      explode(Shingles.shinglesAll(col("text"), SpanW)).as("sh"))
    val global = spans.groupBy(col("sh")).agg(count(lit(1)).as("g"))
    val perDoc = spans.join(global, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("g") > 1, 1L).otherwise(0L)).as("dup_spans"))
    // left join back so span-less (shorter than SpanW tokens) docs keep a
    // row — a curation gate must emit a verdict for every document
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) > 0,
          round(col("dup_spans").cast("double") / col("n_spans"), 6))
          .as("dup_frac"))
  }

  val qDupSpansSql: String = {
    val cat = (0 until SpanW)
      .map(j => if (j == 0) "t[i]" else s"t[i+$j]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents), " +
      "sp AS (SELECT doc_id, unnest(list_transform(" +
      s"generate_series(1, greatest(len(t) - ${SpanW - 1}, 0)), " +
      s"i -> $cat)) AS sh FROM toks), " +
      "g AS (SELECT sh, count(*) AS g FROM sp GROUP BY 1), " +
      "pd AS (SELECT doc_id, count(*) AS n_spans, " +
      "CAST(sum(CASE WHEN g.g > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans " +
      "FROM sp JOIN g USING (sh) GROUP BY 1) " +
      "SELECT d.doc_id, coalesce(pd.n_spans, 0) AS n_spans, " +
      "coalesce(pd.dup_spans, 0) AS dup_spans, " +
      "CASE WHEN coalesce(pd.n_spans, 0) > 0 THEN " +
      "round(CAST(pd.dup_spans AS DOUBLE) / pd.n_spans, 6) END AS dup_frac " +
      "FROM documents d LEFT JOIN pd USING (doc_id)"
  }

  // ── Exact-substring dedup as an ACTION (emit the deduplicated corpus) ──
  // q_dup_spans MEASURES Lee et al.'s duplicated-span fraction; this is
  // the operator that APPLIES it: every recurring SpanW-token span keeps
  // exactly its FIRST occurrence (min doc_id, then min position — the
  // deterministic owner rule the whole dedup family uses) and later
  // occurrences are trimmed by dropping every token position they cover.
  // The emitted text is the kept tokens rejoined — the tokenizer's
  // canonical form, which is what a training pipeline feeds downstream
  // anyway and the only form both engines can reproduce byte-for-byte.
  // Planted exact-duplicate docs collapse to empty text (their owner is
  // the earlier copy at every span position); docs with no recurring
  // spans are conserved verbatim (spec-pinned). Scale shape: one window
  // over the span-text key, one distinct on (doc_id, token-pos), one
  // rebuild aggregation keyed by doc_id — no pairwise stage anywhere,
  // same discipline as qDupSpans.
  def qDedupSpansApply(s: SparkSession, d: String): DataFrame =
    dedupSpansApply(Tables.documents(s, d))

  /** The same plan over any (doc_id, text) frame — spec entry point. */
  def dedupSpansApply(docs: DataFrame): DataFrame = {
    Shingles.register(docs.sparkSession)
    val spans = docs.select(col("doc_id"),
      posexplode(Shingles.shinglesAll(col("text"), SpanW)).as(Seq("p0", "sh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("sh"))
    // first occurrence owns the span; every later occurrence is a drop.
    // Owner selection is min(struct(doc_id, pos)) per span key — a
    // PARTIAL-AGGREGATABLE HashAggregate (map-side combine), NOT a
    // row_number window: a boilerplate span recurring 10⁷ times on a
    // real crawl would make Window.partitionBy(sh) a single hot-key
    // sort task, while min() combines locally before the shuffle.
    // Result-identical (spec-pinned): struct ordering is lexicographic
    // (doc_id, pos), exactly the old ORDER BY.
    val owners = spans.groupBy(col("sh"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("own"))
      .select(col("sh"), col("own.doc_id").as("doc_id"), col("own.pos").as("pos"))
    val drops = spans.join(owners, Seq("sh", "doc_id", "pos"), "left_anti")
    val droppedPos = drops.select(col("doc_id"),
      explode(sequence(col("pos"), col("pos") + (SpanW - 1))).as("tp"))
      .distinct()
    val toks = docs.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.tokens(col("text")))
        .as(Seq("t0", "tok")))
      .select(col("doc_id"), (col("t0") + 1).as("tp"), col("tok"))
    val kept = toks.join(droppedPos, Seq("doc_id", "tp"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        // order-deterministic rebuild: sort the (tp, tok) structs, join
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          x => x.getField("tok")), " ").as("kept_text"))
    docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  val qDedupSpansApplySql: String = {
    val cat = (0 until SpanW)
      .map(j => if (j == 0) "t[i]" else s"t[i+$j]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents), " +
      "tok AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS tp, " +
      "unnest(t) AS tok FROM toks), " +
      "sp AS (SELECT doc_id, " +
      s"unnest(generate_series(1, greatest(len(t) - ${SpanW - 1}, 0))) AS pos, " +
      s"unnest(list_transform(generate_series(1, greatest(len(t) - ${SpanW - 1}, 0)), " +
      s"i -> $cat)) AS sh FROM toks), " +
      "dr AS (SELECT doc_id, pos FROM (SELECT doc_id, pos, " +
      "row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn " +
      "FROM sp) WHERE rn > 1), " +
      "dp AS (SELECT DISTINCT doc_id, tp FROM (SELECT doc_id, " +
      s"unnest(generate_series(pos, pos + ${SpanW - 1})) AS tp FROM dr)), " +
      "kept AS (SELECT t.doc_id, count(*) AS n_kept, " +
      "string_agg(t.tok, ' ' ORDER BY t.tp) AS kept_text FROM tok t " +
      "WHERE NOT EXISTS (SELECT 1 FROM dp " +
      "WHERE dp.doc_id = t.doc_id AND dp.tp = t.tp) GROUP BY 1) " +
      "SELECT d.doc_id, len(d.t) AS n_tok, " +
      "coalesce(k.n_kept, 0) AS n_kept, " +
      "coalesce(k.kept_text, '') AS kept_text " +
      "FROM toks d LEFT JOIN kept k USING (doc_id)"
  }

  // ── Canonical (near-exact) dedup ───────────────────────────────────────
  // The stage between exact dedup and MinHash: normalize away the
  // differences that never matter (case, punctuation, whitespace runs)
  // and group by the canonical md5 — catches the reformatted-copy
  // duplicates exact byte-hashing misses at zero candidate-generation
  // cost. Survivor = min doc_id per canonical group, the same
  // deterministic rule the exact and fuzzy stages use; only 16-byte
  // digests shuffle.
  def qDedupCanonical(s: SparkSession, d: String): DataFrame = {
    val canon = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    Tables.documents(s, d)
      .select(col("doc_id"), md5(canon).as("canon_md5"))
      .groupBy(col("canon_md5"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_members"))
  }

  val qDedupCanonicalSql: String =
    "SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS canon_md5, " +
      "min(doc_id) AS survivor_id, count(*) AS n_members " +
      "FROM documents GROUP BY 1"

  // ── MinHash estimator accuracy audit ───────────────────────────────────
  // How far off is the 32-hash signature estimate from TRUE Jaccard on
  // the pairs LSH actually surfaces? The question every banding
  // configuration decision rests on. Candidates come from the proven
  // lshPairs machinery with NO similarity floor (every banded collision);
  // exact Jaccard is counted only for those candidates (the same
  // candidates-only exact verification the PPJoin path uses). The
  // over/under/equal split compares the two rationals by integer
  // cross-multiplication — sign(agree·u − 32·i) — so no float comparison
  // decides a count; error magnitudes micro-quantize before the sum.
  def qMinhashError(s: SparkSession, d: String): DataFrame = {
    val cands = lshPairs(Tables.documents(s, d),
      numHashes = 32, bands = 8, threshold = 0.0)
    val sh = shingleIndex(s, d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cands.select(col("doc_a"), col("doc_b"))
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")),
        Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    val stats = cands
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .select(col("est_jaccard"),
        coalesce(col("i"), lit(0L)).as("i"),
        (col("na") + col("nb") - coalesce(col("i"), lit(0L))).as("u"),
        round(col("est_jaccard") * 32, 0).cast("long").as("agree"))
      .withColumn("err_u",
        round(abs(col("est_jaccard") -
          col("i").cast("double") / col("u").cast("double")) * 1e6, 0)
          .cast("long"))
    stats.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("agree") * col("u") > lit(32L) * col("i"), 1L)
        .otherwise(0L)).as("n_over"),
      sum(when(col("agree") * col("u") < lit(32L) * col("i"), 1L)
        .otherwise(0L)).as("n_under"),
      sum(when(col("agree") * col("u") === lit(32L) * col("i"), 1L)
        .otherwise(0L)).as("n_equal"),
      sum(col("err_u")).as("sum_err"), max(col("err_u")).as("max_err"))
      .select(col("n_pairs"), col("n_over"), col("n_under"), col("n_equal"),
        round(col("sum_err").cast("double") /
          (col("n_pairs").cast("double") * 1e6), 6).as("mean_abs_err"),
        round(col("max_err").cast("double") / 1e6, 6).as("max_abs_err"))
  }

  val qMinhashErrorSql: String =
    s"WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents), " +
      s"shd AS (SELECT doc_id, unnest($sqlShingles) AS sh FROM toks), " +
      s"hx AS (SELECT doc_id, ${Md5Bits.sqlHash60("sh")} % $MinhashP AS x FROM shd), " +
      "mh AS (SELECT doc_id, i, " +
      s"min((((i * 2654435761) % ${MinhashP - 1} + 1) * x + (i * 97531) % $MinhashP) % $MinhashP) AS mh " +
      "FROM hx, range(0, 32) r(i) GROUP BY 1, 2), " +
      "sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY 1), " +
      // candidate generation replays the ENGINE's banded equi-join (hash
      // join on the 4-slice band keys + distinct), not an all-pairs
      // filter: the old `sig a JOIN sig b ON a.doc_id < b.doc_id WHERE
      // EXISTS(...)` spelling is O(n²) list comparisons and spilled
      // > 78 GB of DuckDB temp at sf1 — same pair set by construction
      // (∃band with equal slices ⟺ some band-key join row exists).
      "bk AS (SELECT doc_id, sig, bb, sig[bb*4+1 : bb*4+4] AS bucket " +
      "FROM sig, range(0, 8) t(bb)), " +
      "cand0 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
      "FROM bk a JOIN bk b ON a.bb = b.bb AND a.bucket = b.bucket " +
      "AND a.doc_id < b.doc_id), " +
      "cand AS (SELECT doc_a, doc_b, " +
      "CAST(len(list_filter(range(1, 33), j -> a.sig[j] = b.sig[j])) AS BIGINT) AS agree " +
      "FROM cand0 JOIN sig a ON a.doc_id = doc_a " +
      "JOIN sig b ON b.doc_id = doc_b), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1), " +
      "inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c " +
      "JOIN shd sa ON sa.doc_id = c.doc_a " +
      "JOIN shd sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh GROUP BY 1, 2), " +
      "stats AS (SELECT agree, coalesce(i, 0) AS i, " +
      "za.n + zb.n - coalesce(i, 0) AS u, " +
      "CAST(round(abs(CAST(agree AS DOUBLE) / 32 - " +
      "CAST(coalesce(i, 0) AS DOUBLE) / (za.n + zb.n - coalesce(i, 0))) * 1e6, 0) AS BIGINT) AS err_u " +
      "FROM cand LEFT JOIN inter USING (doc_a, doc_b) " +
      "JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b) " +
      "SELECT count(*) AS n_pairs, " +
      "CAST(sum(CASE WHEN agree * u > 32 * i THEN 1 ELSE 0 END) AS BIGINT) AS n_over, " +
      "CAST(sum(CASE WHEN agree * u < 32 * i THEN 1 ELSE 0 END) AS BIGINT) AS n_under, " +
      "CAST(sum(CASE WHEN agree * u = 32 * i THEN 1 ELSE 0 END) AS BIGINT) AS n_equal, " +
      "round(CAST(sum(err_u) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e6), 6) AS mean_abs_err, " +
      "round(CAST(max(err_u) AS DOUBLE) / 1e6, 6) AS max_abs_err " +
      "FROM stats"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_containment"   -> qContainment _,
    "q_minhash_error" -> qMinhashError _,
    "q_hll_error"     -> qHllError _,
    "q_dedup_canonical" -> qDedupCanonical _,
    "q_dup_spans"     -> qDupSpans _,
    "q_dedup_spans_apply" -> qDedupSpansApply _,
    "q_entity_resolution" -> qEntityResolution _,
    "q_fuzzy_match"   -> qFuzzyMatch _,
    "q_jaro_winkler"  -> qJaroWinkler _,
    "q_decontaminate" -> qDecontaminate _,
    "q_dedup_incremental" -> qDedupIncremental _,
    "q_winnow_overlap" -> qWinnowOverlap _,
    "q_dedup_exact"   -> qDedupExact _,
    "q_ngram_jaccard" -> qNgramJaccard _,
    "q_jaccard_partenum" -> qJaccardPartEnum _,
    "q_minhash_lsh"   -> qMinhashLsh _,
    "q_dedup_report"  -> qDedupReport _,
    "q_simhash_pairs" -> qSimhashPairs _,
    "q_hll_distinct"  -> qHllDistinct _,
  )

  val oracles: Map[String, String] = Map(
    "q_containment"   -> qContainmentSql,
    "q_minhash_error" -> qMinhashErrorSql,
    "q_hll_error"     -> qHllErrorSql,
    "q_dedup_canonical" -> qDedupCanonicalSql,
    "q_dup_spans"      -> qDupSpansSql,
    "q_dedup_spans_apply" -> qDedupSpansApplySql,
    "q_entity_resolution" -> qEntityResolutionSql,
    "q_fuzzy_match"    -> qFuzzyMatchSql,
    "q_jaro_winkler"   -> qJaroWinklerSql,
    "q_decontaminate"  -> qDecontaminateSql,
    "q_dedup_incremental" -> qDedupIncrementalSql,
    "q_dedup_exact"    -> qDedupExactSql,
    "q_ngram_jaccard"  -> qNgramJaccardSql,
    // PartEnum is result-identical to the prefix-filtered join BY
    // CONSTRUCTION (lossless candidate generation, same verification),
    // so the naive-join oracle replays it over the same deterministic
    // md5 doc sample (non-binding at the gate SFs)
    "q_jaccard_partenum" -> qJaccardPartEnumSql,
    "q_minhash_lsh"    -> qMinhashLshSql,
    "q_dedup_report"   -> qDedupReportSql,
    "q_simhash_pairs"  -> qSimhashPairsSql,
    "q_winnow_overlap" -> qWinnowOverlapSql,
    "q_hll_distinct"   -> qHllDistinctSql,
  )
}
