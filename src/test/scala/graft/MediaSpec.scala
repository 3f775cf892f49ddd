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

  private def pngBytes(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real decode path: a generated 2x2 PNG decodes with exact luma") {
    // black, white, pure red, pure blue
    val png = pngBytes(Array(
      Array(0x000000, 0xffffff),
      Array(0xff0000, 0x0000ff)))
    assert(MediaQueries.sniffImageFormat(png) === Some("png"))
    val out = MediaQueries.decodeImages(Iterator.single(
      MediaRow(1L, png, MediaMeta("image", 999, 999, 0)))).next()
    assert(out.real_decode, "PNG must take the javax.imageio path")
    assert(out.format === "png")
    assert(out.width === 2 && out.height === 2,
      "dimensions must come from the decoder, not the metadata")
    // BT.601 luma: (0 + 255 + 0.299*255 + 0.114*255) / 4
    val expected = (0.0 + 255.0 + 0.299 * 255 + 0.114 * 255) / 4
    assert(math.abs(out.mean_luma - expected) < 1e-9)
  }

  test("non-image payloads fall back to the stub with metadata dimensions") {
    val text = "just some text".getBytes("UTF-8")
    val out = MediaQueries.decodeImages(Iterator.single(
      MediaRow(2L, text, MediaMeta("audio", 320, 180, 16000)))).next()
    assert(!out.real_decode)
    assert(out.format === "stub:audio")
    assert(out.width === 320 && out.height === 180)
    assert(math.abs(out.mean_luma -
      text.map(_ & 0xff).sum.toDouble / text.length) < 1e-12)
    // corrupt bytes that SNIFF as png but fail to decode also fall back
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    val bad = MediaQueries.decodeImages(Iterator.single(
      MediaRow(3L, fakePng, MediaMeta("image", 64, 64, 0)))).next()
    assert(!bad.real_decode && bad.width === 64)
  }

  test("decodeImageTable runs narrow over a mixed real/stub dataset") {
    val png = pngBytes(Array(Array(0x808080)))
    val rows = Seq(
      MediaRow(10L, png, MediaMeta("image", 1, 1, 0)),
      MediaRow(11L, "plain".getBytes("UTF-8"), MediaMeta("video", 8, 8, 0)))
    val ds = MediaQueries.decodeImageTable(rows.toDS())
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
    val got = ds.collect().map(r => r.media_id -> r).toMap
    assert(got(10L).real_decode && got(10L).width === 1)
    assert(!got(11L).real_decode && got(11L).format === "stub:video")
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
