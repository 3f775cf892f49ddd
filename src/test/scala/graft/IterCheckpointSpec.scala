package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ConnectedComponents, IterCheckpoint}

/** The reliable-checkpoint opt-in (`graft.iter.checkpointDir`): unset, the
  * iterative family materializes via localCheckpoint exactly as before the
  * option existed; set, rounds checkpoint to the reliable directory (and
  * so survive executor loss on a real cluster), with identical results.
  */
class IterCheckpointSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val edges = Seq(
    (1L, 2L), (2L, 3L), (4L, 5L), (6L, 6L), (7L, 8L), (8L, 9L), (9L, 7L))
    .toDF("src", "dst")

  private def componentsMap(): Map[Long, Long] =
    ConnectedComponents.components(edges, maxIterations = 10)
      .as[(Long, Long)].collect().toMap

  test("unset: localCheckpoint path — no reliable checkpoint files written") {
    assert(spark.conf.getOption(IterCheckpoint.ConfKey).forall(_.isEmpty))
    val df = IterCheckpoint(edges)
    // localCheckpoint plans as a scan of the cached RDD
    assert(df.queryExecution.executedPlan.toString.contains("ExistingRDD") ||
      df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    assert(df.count() === 7)
  }

  test("set: rounds checkpoint reliably, results identical to the local path") {
    val expected = componentsMap()
    assert(expected(3L) === 1L && expected(5L) === 4L && expected(9L) === 7L)
    val dir = java.nio.file.Files.createTempDirectory("graft_iter_ckpt")
    spark.conf.set(IterCheckpoint.ConfKey, dir.toString)
    try {
      val reliable = componentsMap()
      assert(reliable === expected)
      // reliable checkpoint files actually landed under the directory
      def filesUnder(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally s.close()
      }
      assert(filesUnder(dir) > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(IterCheckpoint.ConfKey)
  }
}
