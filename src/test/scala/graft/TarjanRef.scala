package graft

/** Plain-Scala Tarjan SCC — the reference implementation behind SccSpec
  * and the sf1 fixture audit (SccAudit). Iterative DFS with an explicit
  * work stack; mutable maps so the replay stays feasible at fixture
  * scale (the sf1 purchase-path graph), where an immutable-Map spelling
  * spends its time in structural copying.
  *
  * Returns node → component id, component id = min node id in the SCC —
  * the same labeling contract as the engine operator.
  */
object TarjanRef {
  def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
    }
    val nodes = (edges.iterator.map(_._1) ++ edges.iterator.map(_._2))
      .toArray.distinct
    val index = mutable.HashMap.empty[Long, Int]
    val low = mutable.HashMap.empty[Long, Int]
    val onStack = mutable.HashSet.empty[Long]
    var stack = List.empty[Long]
    var counter = 0
    val result = mutable.HashMap.empty[Long, Long]
    val emptyChildren = mutable.ArrayBuffer.empty[Long]
    def strongConnect(v0: Long): Unit = {
      // iterative DFS with explicit work stack (node, next-child index)
      var work = List((v0, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.head
        if (pi == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stack ::= v; onStack += v
        }
        val children = adj.getOrElse(v, emptyChildren)
        var recursed = false
        var i = pi
        while (i < children.size && !recursed) {
          val w = children(i)
          if (!index.contains(w)) {
            work = (w, 0) :: (v, i + 1) :: work.tail
            recursed = true
          } else {
            if (onStack(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!recursed) {
          if (low(v) == index(v)) {
            var comp = List.empty[Long]
            var done = false
            while (!done) {
              val w = stack.head; stack = stack.tail; onStack -= w
              comp ::= w
              if (w == v) done = true
            }
            val id = comp.min
            comp.foreach(n => result(n) = id)
          }
          work = work.tail
          work.headOption.foreach { case (p, _) =>
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongConnect(v))
    result.toMap
  }
}

/** Dev-run sf1 audit for the one query whose DuckDB oracle is infeasible
  * at scale (recursive transitive closure): runs the ENGINE's q_scc on a
  * fixture dir and compares node-for-node against the in-JVM Tarjan over
  * the same collected edge list — the SccSpec replay lifted to the sf1
  * fixture. Usage: sbt "Test/runMain graft.SccAudit <sfDir>".
  */
object SccAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Tuning.withClusterDefaults(
      org.apache.spark.sql.SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val got = SparkEntry.queries("q_scc")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tEngine = (System.nanoTime() - t0) / 1e9
    // AUDIT-ONLY single-JVM step: the edge list is collected to the
    // driver for the in-JVM Tarjan. Bounded at fixture scale (sf1:
    // 92k edges) — fail loudly, not OOM, if the fixture ever outgrows it.
    val edgesDf = graft.queries.GraphQueries.purchasePathEdges(spark, d)
    val nEdges = edgesDf.count()
    require(nEdges <= 10000000L,
      s"SccAudit collects the edge list to the driver ($nEdges edges): " +
        "past 10M edges, audit a sampled subgraph instead")
    val edges = edgesDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val t1 = System.nanoTime()
    val want = TarjanRef.tarjan(edges)
    val tRef = (System.nanoTime() - t1) / 1e9
    val eq = got == want
    val nComps = want.values.toSet.size
    println(f"""{"audit":"q_scc","sf":"$d","edges":${edges.size},""" +
      f""""nodes":${want.size},"components":$nComps,"match":$eq,""" +
      f""""engine_sec":$tEngine%.1f,"tarjan_sec":$tRef%.1f}""")
    spark.stop()
    if (!eq) sys.exit(1)
  }
}
