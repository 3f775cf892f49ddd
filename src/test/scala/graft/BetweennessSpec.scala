package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side replay of qBetweenness's exact rules — synchronous
  * level-BFS σ counts, then micro-quantized integer dependency
  * accumulation — on hand-checkable graphs. The quantization rule
  * (δq(v) = Σ_w floorDiv(σv·(10⁶+δq(w)), σw)) is replayed verbatim, so
  * the spec pins the distributed implementation, and the path/star
  * cases additionally pin it against the textbook closed forms. */
class BetweennessSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Micro = 1000000L

  /** Reference sampled-Brandes with the same integer quantization. */
  private def ref(edges: Seq[(Long, Long)], nSeeds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val nodes = adj.keys.toSeq.sorted
    val seeds = nodes.take(nSeeds)
    val acc = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for (s <- seeds) {
      // forward: levels + sigma
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      var d = 0
      while (frontier.nonEmpty) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        for (u <- frontier; v <- adj(u) if !dist.contains(v))
          next(v) = next.getOrElse(v, 0L) + sigma(u)
        d += 1
        next.foreach { case (v, sg) => dist(v) = d; sigma(v) = sg }
        frontier = next.keys.toSeq
      }
      // backward: quantized dependency
      val dq = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      val maxD = if (dist.isEmpty) 0 else dist.values.max
      for (lev <- maxD to 1 by -1;
           v <- dist.collect { case (n, dd) if dd == lev - 1 => n };
           w <- adj(v) if dist.get(w).contains(lev))
        dq(v) += Math.floorDiv(sigma(v) * (Micro + dq(w)), sigma(w))
      dist.keys.filter(_ != s).foreach(v => acc(v) += dq(v))
    }
    acc.toMap
  }

  private def run(edges: Seq[(Long, Long)], nSeeds: Int): Map[Long, Long] = {
    // drive the DISTRIBUTED operator over the hand-built edge set, and
    // cross-check it against the driver-side reference in the same call —
    // so the closed-form tests pin the real betweennessOnEdges plan, not
    // the reference against itself
    val got = graft.queries.GraphQueries
      .betweennessOnEdges(edges.toDF("src", "dst"), nSeeds)
      .select($"node", $"betw_q").as[(Long, Long)].collect().toMap
    assert(got === ref(edges, nSeeds), "distributed vs driver reference")
    got
  }

  test("path graph: the middle node brokers everything") {
    // 0-1-2: from seeds {0,1,2}, node 1 lies on the single 0↔2 geodesic
    val b = run(Seq((0L, 1L), (1L, 2L)), 3)
    // from seed 0: δ(1) = σ1/σ2·(1+0) = 1.0 → 1e6; seed 2 symmetric;
    // seed 1 contributes nothing; endpoints broker nothing
    assert(b(1L) === 2L * Micro)
    assert(b.getOrElse(0L, 0L) < b(1L) && b.getOrElse(2L, 0L) < b(1L))
  }

  test("star graph: the hub accumulates (n−1)(n−2) endpoint pairs") {
    // hub 0, leaves 1..4; all seeds
    val edges = (1L to 4L).map(l => (0L, l))
    val b = run(edges, 5)
    // from each leaf seed: δ(hub) = Σ over 3 other leaves of 1·(1+0) = 3
    assert(b(0L) === 4L * 3L * Micro)
    (1L to 4L).foreach(l => assert(b.getOrElse(l, 0L) === 0L, s"leaf $l"))
  }

  test("effective diameter equals a driver-side BFS distance histogram") {
    val r = graft.queries.GraphQueries.qEffDiameter(spark, sf).head()
    // rebuild the supported graph + multi-source BFS driver-side
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val pairs = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }
    val supported = pairs.groupBy(identity).iterator.collect {
      case (p, occ) if occ.size >= 2 => p
    }.toSeq
    val adj = (supported ++ supported.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = adj.keys.toSeq.sorted.take(4)
    val dists = seeds.flatMap { s =>
      val dist = scala.collection.mutable.Map(s -> 0L)
      var frontier = Seq(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj(_)).distinct.filterNot(dist.contains)
        val d = dist(frontier.head) + 1
        next.foreach(dist(_) = d)
        frontier = next
      }
      dist.values.filter(_ > 0)
    }
    assert(r.getAs[Long]("n_pairs") === dists.size.toLong)
    assert(r.getAs[Long]("max_dist") === dists.max)
    val sorted = dists.sorted
    val eff = sorted((dists.size * 9 + 9) / 10 - 1) // smallest d covering ≥90%
    assert(r.getAs[Long]("eff_diameter_90") === eff)
    assert(r.getAs[Long]("eff_diameter_90") <= r.getAs[Long]("max_dist"))
  }

  test("fixture run matches the driver reference on the co-purchase graph") {
    val got = graft.queries.GraphQueries.qBetweenness(spark, sf)
      .select($"node", $"betw_q").as[(Long, Long)].collect().toMap
    // rebuild the same supported co-purchase graph driver-side
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val pairs = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }
    // .iterator: Map.collect over pair-valued results would rebuild a
    // MAP keyed by src and silently drop parallel edges
    val supported = pairs.groupBy(identity).iterator.collect {
      case (p, occ) if occ.size >= 2 => p
    }.toSeq
    val all = ref(supported, 4)
    val top = all.toSeq.sortBy { case (n, v) => (-v, n) }.take(20).toMap
    assert(got === top)
  }
}
