package graft

/** Fingerprint-keyed local directories for fit-once / serve-forever
  * artifacts (the persisted IVF-PQ ANN index, Louvain level-1 labels).
  *
  * The key is an md5 over the source parquet's (path, size, mtime) file
  * list, so a REGENERATED fixture refits instead of serving stale
  * artifacts, while repeated queries over the same fixture share one
  * training run — the FAISS fit-once discipline applied to every
  * expensive deterministic fit in the engine. On a cluster the same
  * pattern keys the index by the source table's snapshot/version id and
  * persists to shared storage; the tmpdir spelling is the local-mode
  * stand-in.
  */
object ArtifactCache {

  /** Directory for artifacts derived from `fixtureDir/table.parquet`,
    * named `graft_<tag>_<fingerprint><suffix>` under the JVM tmpdir. */
  def dir(fixtureDir: String, table: String, tag: String,
      suffix: String = ""): java.nio.file.Path = {
    val src = java.nio.file.Paths.get(fixtureDir, s"$table.parquet")
    val files: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(src)) {
        val s = java.nio.file.Files.list(src)
        try { import scala.jdk.CollectionConverters._; s.iterator.asScala.toSeq }
        finally s.close()
      } else Seq(src)
    val fp = files.sortBy(_.toString).map { f =>
      s"$f:${java.nio.file.Files.size(f)}:" +
        java.nio.file.Files.getLastModifiedTime(f).toMillis
    }.mkString("|")
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(fp.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_${tag}_$h$suffix")
  }

  /** True iff the parquet dataset at `dir(/part)` finished writing. */
  def ready(dir: java.nio.file.Path, part: String = ""): Boolean = {
    val base = if (part.isEmpty) dir else dir.resolve(part)
    java.nio.file.Files.exists(base.resolve("_SUCCESS"))
  }
}
