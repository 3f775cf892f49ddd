package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

class SsspPathSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("hand graph: exact distances and unique min-pred paths") {
    //    1 --1-- 2 --1-- 3
    //    1 --3-- 3        (worse than 1->2->3 = 2)
    //    1 --1-- 4 --1-- 5 ; 1 --2-- 5 (tie at dist 2 → pred tie-break:
    //                        min(4, 1) = 1, so 5's path is the DIRECT edge)
    //    6 isolated from 1's component (7--1--6)
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 3L),
      (1L, 4L, 1L), (4L, 5L, 1L), (1L, 5L, 2L),
      (7L, 6L, 1L)
    ).toDF("src", "dst", "w")
    val got = GraphQueries.ssspPaths(edges, source = 1L, maxRounds = 10)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((0L, "1")),
      2L -> ((1L, "1->2")),
      3L -> ((2L, "1->2->3")),
      4L -> ((1L, "1->4")),
      5L -> ((2L, "1->5")),
    ))
  }

  test("registered query: every path is consistent with its distance") {
    val rows = SparkEntry.queries("q_sssp_path")(spark, sf)
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // paths all start at one source and end at their node
    val sources = rows.map(_._3.split("->").head).distinct
    assert(sources.length === 1)
    rows.foreach { case (node, dist, path) =>
      val hops = path.split("->").map(_.toLong)
      assert(hops.last === node, s"path $path does not end at $node")
      assert(hops.length === hops.distinct.length, s"cycle in path $path")
      assert(dist >= hops.length - 1,
        s"dist $dist below hop count for $path (weights are >= 1)")
    }
    // dist agrees with q_sssp on every node
    val dists = SparkEntry.queries("q_sssp")(spark, sf)
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (node, dist, _) =>
      assert(dists(node) === dist, s"path dist disagrees with SSSP at $node")
    }
  }
}
