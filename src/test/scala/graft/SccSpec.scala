package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StronglyConnectedComponents

class SccSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Plain-Scala Tarjan as the reference implementation — shared with
    * the sf1 fixture audit (TarjanRef / SccAudit). */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TarjanRef.tarjan(edges)

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    StronglyConnectedComponents.components(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("scc settles cycles, chains, and nested structure") {
    // {1,2,3} cycle → DAG edge → {5,6} cycle; 7 isolated tail; 8→8 ignored
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 5L), (5L, 6L), (6L, 5L),
      (6L, 7L), (8L, 8L), (8L, 7L))
    assert(run(edges) === tarjan(edges))
  }

  test("scc on a pure DAG settles every node as a singleton in one pass") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val got = run(edges)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("scc matches Tarjan on a random 120-node digraph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.distinct
    assert(run(edges) === tarjan(edges))
  }

  test("two-cycle chain needs multiple outer rounds and still settles") {
    // a↔b chains: (0,1)↔, →(2,3)↔, →(4,5)↔ — forward-min floods one
    // color over everything, so only one SCC settles per outer round
    val edges = Seq(
      (0L, 1L), (1L, 0L), (1L, 2L),
      (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 5L), (5L, 4L))
    assert(run(edges) === tarjan(edges))
  }
}
