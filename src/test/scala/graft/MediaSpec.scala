package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MediaQueries
import graft.queries.MediaQueries.{MediaFeatures, MediaMeta, MediaRow}

class MediaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("media table carries binary payload + typed metadata struct") {
    val df = MediaQueries.mediaTable(spark, sf)
    val schema = df.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val row = df.filter($"media_id" === 0).head()
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(Set("image", "audio", "video").contains(meta.getAs[String]("kind")))
    assert(meta.getAs[Int]("width") === 320)
  }

  test("stub decoder is deterministic and matches a direct computation") {
    val payload = "hello world".getBytes("UTF-8")
    val out = MediaQueries.decodeFeatures(Iterator.single(
      MediaRow(7L, payload, MediaMeta("image", 320, 180, 16000)))).toSeq
    assert(out.length === 1)
    val f = out.head
    assert(f.n_bytes === payload.length.toLong)
    assert(f.max_byte === payload.map(_ & 0xff).max)
    assert(math.abs(f.mean_byte -
      payload.map(_ & 0xff).sum.toDouble / payload.length) < 1e-12)
    // rerun → identical checksum
    assert(MediaQueries.decodeFeatures(Iterator.single(
      MediaRow(7L, payload, MediaMeta("image", 320, 180, 16000))))
      .next().checksum === f.checksum)
  }

  test("featurize covers every media row with no shuffle stage") {
    val feats = MediaQueries.featurize(spark, sf)
    assert(feats.count() === Tables.documents(spark, sf).count())
    // narrow plan: no Exchange operator
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("frame sampling slices correct frame bytes") {
    val media = MediaQueries.mediaTable(spark, sf)
    val frames = MediaQueries.sampleFrames(media, frameBytes = 16, stride = 4)
    val one = frames.filter($"frame_no" === 0).head()
    val frame = one.getAs[Array[Byte]]("frame")
    assert(frame.length === 16)
    // frame 0 == first 16 payload bytes of that media row
    val mid = one.getLong(0)
    val payload = media.filter($"media_id" === mid).head()
      .getAs[Array[Byte]]("payload")
    assert(frame.toSeq === payload.take(16).toSeq)
    // every video row yields ceil(len/64) frames
    val expected = media.filter($"meta.kind" === "video")
      .select(ceil(length($"payload").cast("double") / 64).cast("long"))
      .as[Long].collect().sum
    assert(frames.count() === expected)
  }
}
