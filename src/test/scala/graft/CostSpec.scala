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
    // quiescent context: the listener bus must have visibly drained, and
    // the report must say so (drained=false marks an under-count risk)
    assert(r.drained, s"listener bus never went quiet: $r")
  }

  test("kv units scale with item size (4KB reads / 1KB writes)") {
    import org.apache.spark.sql.types._
    val table = "kv_sized"
    if (!graft.sources.kv.KvStore.exists(table)) {
      graft.sources.kv.KvStore.register(table, "k",
        StructType(Seq(StructField("k", StringType), StructField("v", StringType))))
    }
    val w0 = graft.sources.kv.KvStore.writeOps
    // one ~5KB item: ceil(5120/1024) = 5 write units, ceil(5120/4096) = 2 read units
    graft.sources.kv.KvStore.put(table, Seq(Seq("big", "x" * 5117)))
    val wUnits = graft.sources.kv.KvStore.writeOps - w0
    assert(wUnits === 5L, s"5KB item must bill 5 write units, got $wUnits")
    val r0 = graft.sources.kv.KvStore.readOps
    val n = spark.read.format("graft-kv").option("table", table).load()
      .filter(col("k") === "big").count()
    assert(n === 1)
    val rUnits = graft.sources.kv.KvStore.readOps - r0
    assert(rUnits === 2L, s"5KB item must bill 2 read units, got $rUnits")
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

  test("lookup-join point reads are metered like any other store read") {
    val (rows, rep) = CostAccounting.measure(spark) {
      queries.KvQueries.qKvLookupJoin(spark, sf).collect().length
    }
    assert(rows > 0)
    // one read unit minimum per matched probe row (suppliers all match)
    val probeRows = Tables.supplier(spark, sf).count()
    assert(rep.kvReads >= probeRows,
      s"expected >= $probeRows metered point reads: $rep")
  }
}
