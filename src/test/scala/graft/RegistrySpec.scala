package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Guards the query registry against the silent `++`-shadowing landmine:
  * SparkEntry merges the per-family maps with `++`, so a query name
  * registered by TWO families silently drops the earlier one (this bit
  * q_scd2 and q_zorder in rounds 8–9). These invariants make any future
  * duplicate an immediate test failure instead of dead code.
  */
class RegistrySpec extends AnyFunSuite {

  private val queryFamilies: Seq[(String, Map[String, _])] = Seq(
    "Relational" -> Relational.queries,
    "MRQueries" -> MRQueries.queries,
    "TextQueries" -> TextQueries.queries,
    "DedupQueries" -> DedupQueries.queries,
    "SimilarityQueries" -> SimilarityQueries.queries,
    "EventQueries" -> EventQueries.queries,
    "MediaQueries" -> MediaQueries.queries,
    "PipelineQueries" -> PipelineQueries.queries,
    "KvQueries" -> KvQueries.queries,
    "StreamQueries" -> StreamQueries.queries,
    "SketchQueries" -> SketchQueries.queries,
    "GraphQueries" -> GraphQueries.queries,
    "TpchQueries" -> TpchQueries.queries,
    "TpchBulkQueries" -> TpchBulkQueries.queries,
    "LakehouseQueries" -> LakehouseQueries.queries)

  private val oracleFamilies: Seq[(String, Map[String, _])] = Seq(
    "Relational" -> Relational.oracles,
    "MRQueries" -> MRQueries.oracles,
    "TextQueries" -> TextQueries.oracles,
    "DedupQueries" -> DedupQueries.oracles,
    "SimilarityQueries" -> SimilarityQueries.oracles,
    "EventQueries" -> EventQueries.oracles,
    "MediaQueries" -> MediaQueries.oracles,
    "PipelineQueries" -> PipelineQueries.oracles,
    "KvQueries" -> KvQueries.oracles,
    "StreamQueries" -> StreamQueries.oracles,
    "SketchQueries" -> SketchQueries.oracles,
    "GraphQueries" -> GraphQueries.oracles,
    "TpchQueries" -> TpchQueries.oracles,
    "TpchBulkQueries" -> TpchBulkQueries.oracles,
    "LakehouseQueries" -> LakehouseQueries.oracles)

  /** Queries DECLARED oracle-free (driver records a rows-only check).
    * Keep this list tiny and intentional — EMPTY since round 15, when
    * q_approx_distinct gained its audit-shaped oracle. */
  private val declaredRowsOnly = Set.empty[String]

  private def duplicates(fams: Seq[(String, Map[String, _])]): Map[String, Seq[String]] =
    fams.iterator
      .flatMap { case (fam, m) => m.keysIterator.map(k => (k, fam)) }
      .toSeq.groupBy(_._1).collect {
        case (k, owners) if owners.size > 1 => (k, owners.map(_._2))
      }

  test("no query name is registered by two families (queries map)") {
    val dups = duplicates(queryFamilies)
    assert(dups.isEmpty, s"shadowed query registrations: $dups")
    assert(SparkEntry.queries.size === queryFamilies.map(_._2.size).sum)
  }

  test("no query name is registered by two families (oracle map)") {
    val dups = duplicates(oracleFamilies)
    assert(dups.isEmpty, s"shadowed oracle registrations: $dups")
    assert(SparkEntry.oracleSql.size === oracleFamilies.map(_._2.size).sum)
  }

  test("queries without an oracle are exactly the declared rows-only set") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === declaredRowsOnly,
      s"undeclared oracle-free queries: ${missing -- declaredRowsOnly}; " +
        s"stale declarations: ${declaredRowsOnly -- missing}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("the spec's family list is the full SparkEntry merge chain") {
    // if a new family is added to SparkEntry but not here, the size
    // equality above would pass vacuously — pin the union instead
    val unionKeys = queryFamilies.iterator.flatMap(_._2.keysIterator).toSet
    assert(unionKeys === SparkEntry.queries.keySet)
    val unionOracle = oracleFamilies.iterator.flatMap(_._2.keysIterator).toSet
    assert(unionOracle === SparkEntry.oracleSql.keySet)
  }
}
