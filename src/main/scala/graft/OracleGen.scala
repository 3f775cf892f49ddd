package graft

/** Dev-only: print a parameterized oracle spelling to stdout.
  *
  * The registered `SparkEntry.oracleSql` map is static, so oracles whose
  * shape depends on a data-driven parameter register their gate-tier
  * instance (exact wherever the parameter formula yields the demo value).
  * Past that bound the matching instance is regenerated here and swapped
  * into the sweep's `oracle_sql.json` before `tools/check_one.py` runs.
  *
  * Usage: OracleGen <name> <k>
  *   semdedup <k>       — SemDeDup replay at k clusters (semK(n) at the
  *                        target tier; e.g. k=32 for sf10's 200k vectors)
  *   semdedup_keep <k>  — keep-farthest variant at k clusters
  */
object OracleGen {
  def main(args: Array[String]): Unit = args match {
    case Array("semdedup", k) =>
      println(queries.SimilarityQueries.qSemdedupSqlFor(k.toInt))
    case Array("semdedup_keep", k) =>
      println(queries.SimilarityQueries.qSemdedupKeepSqlFor(k.toInt))
    case _ =>
      System.err.println("usage: OracleGen <semdedup|semdedup_keep> <k>")
      sys.exit(2)
  }
}
