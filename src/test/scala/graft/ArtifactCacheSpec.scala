package graft

import org.scalatest.funsuite.AnyFunSuite

/** Atomic-publish discipline for fingerprint-keyed artifacts: a reader
  * must never observe a half-written directory (fits go to a tmp sibling
  * and rename into place), concurrent fitters must race safely (one
  * winner, losers cleaned up), and every executed fit is metered so a
  * bench window can report cold_fits honestly. */
class ArtifactCacheSpec extends AnyFunSuite {

  private def freshDir(tag: String): java.nio.file.Path =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_spec_${tag}_${java.util.UUID.randomUUID}")

  private def writeArtifact(dir: java.nio.file.Path, marker: String): Unit = {
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("payload"), marker)
    java.nio.file.Files.writeString(dir.resolve("_SUCCESS"), "")
  }

  private def tmpSiblings(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(dir.getParent)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator.asScala.filter(_.getFileName.toString
        .startsWith(dir.getFileName.toString + ".tmp.")).toSeq
    } finally s.close()
  }

  test("publish renames a complete tmp into place and meters one cold fit") {
    val dir = freshDir("atomic")
    val before = ArtifactCache.coldFits
    ArtifactCache.publish(dir) { tmp =>
      // the destination must not exist while the fit is in flight — a
      // reader polling ready() during the fit sees nothing half-written
      assert(!java.nio.file.Files.exists(dir),
        "fit ran against the destination dir, not a tmp sibling")
      writeArtifact(tmp, "fit-1")
    }
    assert(ArtifactCache.ready(dir))
    assert(java.nio.file.Files.readString(dir.resolve("payload")) == "fit-1")
    assert(ArtifactCache.coldFits == before + 1)
    assert(tmpSiblings(dir).isEmpty, "tmp sibling leaked after publish")
  }

  test("publish replaces a torn pre-atomic dir (exists but never ready)") {
    val dir = freshDir("torn")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("payload"), "torn")
    assert(!ArtifactCache.ready(dir)) // no _SUCCESS: a crashed writer
    ArtifactCache.publish(dir)(writeArtifact(_, "refit"))
    assert(ArtifactCache.ready(dir))
    assert(java.nio.file.Files.readString(dir.resolve("payload")) == "refit")
  }

  test("fingerprint tracks the source parquet: same bytes+mtime reuse, any change refits") {
    val fixture = java.nio.file.Files.createTempDirectory("graft_spec_fixture")
    val src = fixture.resolve("tbl.parquet")
    java.nio.file.Files.writeString(src, "payload-v1")
    java.nio.file.Files.setLastModifiedTime(src,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L))
    val d1 = ArtifactCache.dir(fixture.toString, "tbl", "spec")
    val d2 = ArtifactCache.dir(fixture.toString, "tbl", "spec")
    assert(d1 == d2, "identical source must key the identical artifact dir")
    // an mtime bump alone (regenerated fixture, same bytes) must refit —
    // the staleness guarantee the scaladoc promises
    java.nio.file.Files.setLastModifiedTime(src,
      java.nio.file.attribute.FileTime.fromMillis(1700000001000L))
    val d3 = ArtifactCache.dir(fixture.toString, "tbl", "spec")
    assert(d3 != d1, "mtime change must change the fingerprint")
    // a size change must refit too
    java.nio.file.Files.writeString(src, "payload-v2-longer")
    java.nio.file.Files.setLastModifiedTime(src,
      java.nio.file.attribute.FileTime.fromMillis(1700000001000L))
    val d4 = ArtifactCache.dir(fixture.toString, "tbl", "spec")
    assert(d4 != d3 && d4 != d1, "size change must change the fingerprint")
    // distinct tags/suffixes never collide on the same source
    assert(ArtifactCache.dir(fixture.toString, "tbl", "other") != d4)
    assert(ArtifactCache.dir(fixture.toString, "tbl", "spec", "_x") != d4)
  }

  test("publish never replaces an already-ready artifact (losers serve the winner)") {
    val dir = freshDir("noreplace")
    ArtifactCache.publish(dir)(writeArtifact(_, "winner"))
    assert(ArtifactCache.ready(dir))
    // a late fitter (e.g. one that raced past the caller's ready() check)
    // must drop its fit and leave the published artifact untouched
    ArtifactCache.publish(dir)(writeArtifact(_, "late-loser"))
    assert(java.nio.file.Files.readString(dir.resolve("payload")) == "winner")
    assert(tmpSiblings(dir).isEmpty, "the late loser leaked its tmp dir")
  }

  test("concurrent fitters race safely: one winner, losers drop their tmp, " +
      "and a reader that saw ready() never loses the artifact") {
    val dir = freshDir("race")
    val fitters = 4
    val gate = new java.util.concurrent.CyclicBarrier(fitters)
    val before = ArtifactCache.coldFits
    // the no-torn-reads contract: once ready(dir) returns true, the
    // artifact is never deleted or replaced — a reader polling through
    // the whole race must never hit a missing/partial payload afterwards
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerFailure = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      var sawMarker: String = null
      while (!stop.get && readerFailure.get == null) {
        if (ArtifactCache.ready(dir)) {
          try {
            val m = java.nio.file.Files.readString(dir.resolve("payload"))
            if (sawMarker == null) sawMarker = m
            else if (m != sawMarker)
              readerFailure.set(s"artifact changed under a reader: $sawMarker -> $m")
          } catch {
            case e: java.io.IOException =>
              readerFailure.set(s"ready() artifact vanished mid-read: $e")
          }
        }
      }
    })
    reader.start()
    val threads = (1 to fitters).map { i =>
      val t = new Thread(() =>
        ArtifactCache.publish(dir) { tmp =>
          gate.await() // all fits in flight simultaneously
          writeArtifact(tmp, s"fit-$i")
        })
      t.start(); t
    }
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive))
    stop.set(true)
    reader.join(60000)
    assert(readerFailure.get == null, String.valueOf(readerFailure.get))
    // exactly one complete artifact won the rename; never a torn mix
    assert(ArtifactCache.ready(dir))
    val marker = java.nio.file.Files.readString(dir.resolve("payload"))
    assert((1 to fitters).map(i => s"fit-$i").contains(marker))
    // every fit that ran is metered, even the losers
    assert(ArtifactCache.coldFits == before + fitters)
    assert(tmpSiblings(dir).isEmpty, "a losing fitter leaked its tmp dir")
  }

  test("concurrent fitters over a TORN pre-existing dir: the clear→move " +
      "sequence is serialized, no loser ever deletes a ready artifact") {
    // The r16 TOCTOU: fitter A sees ready()=false and starts clearing the
    // torn dir while fitter B renames its complete artifact into place —
    // A then deleted a READY artifact. publish() now serializes
    // check→clear→move per target path, so across many rounds a reader
    // that passed ready() must never see the payload vanish or change.
    val rounds = 20
    for (r <- 1 to rounds) {
      val dir = freshDir(s"torn_race_$r")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("payload"), "torn")
      assert(!ArtifactCache.ready(dir))
      val fitters = 4
      val gate = new java.util.concurrent.CyclicBarrier(fitters)
      val failure =
        new java.util.concurrent.atomic.AtomicReference[String](null)
      val threads = (1 to fitters).map { i =>
        val t = new Thread(() => {
          ArtifactCache.publish(dir) { tmp =>
            gate.await()
            writeArtifact(tmp, s"fit-$i")
          }
          // publish() has returned: the artifact MUST be ready and stay
          // readable — this thread doubles as the post-ready reader
          try {
            if (!ArtifactCache.ready(dir))
              failure.set(s"round $r: dir not ready after publish returned")
            else {
              val m = java.nio.file.Files.readString(dir.resolve("payload"))
              if (!m.startsWith("fit-"))
                failure.set(s"round $r: torn payload survived: $m")
            }
          } catch {
            case e: java.io.IOException =>
              failure.set(s"round $r: ready artifact vanished mid-read: $e")
          }
        })
        t.start(); t
      }
      threads.foreach(_.join(60000))
      assert(threads.forall(!_.isAlive))
      assert(failure.get == null, String.valueOf(failure.get))
      assert(ArtifactCache.ready(dir))
      assert(tmpSiblings(dir).isEmpty, "a losing fitter leaked its tmp dir")
      // the move-aside never leaks a .torn. sibling either
      val s = java.nio.file.Files.list(dir.getParent)
      val torn = try {
        import scala.jdk.CollectionConverters._
        s.iterator.asScala.filter(_.getFileName.toString
          .startsWith(dir.getFileName.toString + ".torn.")).toSeq
      } finally s.close()
      assert(torn.isEmpty, s"move-aside leaked: $torn")
    }
  }
}
