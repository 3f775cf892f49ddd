package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A21 cost-accounting analog: the meters must reflect what actually ran
  * (shuffle ops only when a shuffle happened, KV units only through the
  * connector) and price with the reference's rate card. */
class CostSpec extends AnyFunSuite {
  import TestSpark._

  test("shuffling query meters compute + put/get ops; total is priced") {
    val (_, r) = CostAccounting.measure(spark) {
      Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).count()
    }
    assert(r.tasks > 0)
    assert(r.computeGbSec > 0)
    assert(r.putOps > 0, s"groupBy must meter shuffle puts: $r")
    assert(r.getOps > 0, s"groupBy must meter shuffle gets: $r")
    assert(r.shuffleBytes > 0)
    assert(r.computeUsd > 0 && r.totalUsd >= r.computeUsd)
    // rate-card identity, not just positivity
    assert(math.abs(r.computeUsd -
      r.computeGbSec * CostAccounting.LambdaUsdPerGbSec) < 1e-12)
  }

  test("narrow scan meters no shuffle ops; kv round-trip meters kv units") {
    // collect (not count — count's partial->final agg IS a shuffle)
    val (_, narrow) = CostAccounting.measure(spark) {
      Tables.nation(spark, sf).filter(col("n_regionkey") === 0)
        .select(col("n_name")).collect()
    }
    assert(narrow.putOps === 0 && narrow.getOps === 0,
      s"narrow plan must not meter shuffle ops: $narrow")

    val (n, kv) = CostAccounting.measure(spark) {
      queries.KvQueries.qKvRoundtrip(spark, sf).count()
    }
    assert(n > 0)
    assert(kv.kvWrites >= n, s"DSv2 write puts not metered: $kv")
    assert(kv.kvReads >= n, s"connector reads not metered: $kv")
    assert(kv.kvUsd > 0 && kv.totalUsd >= kv.kvUsd)
  }
}
