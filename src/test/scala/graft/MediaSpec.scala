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

  private def pcm16le(samples: Seq[Int]): Array[Byte] =
    samples.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray

  test("WAV encode → decode round-trips exact PCM16 statistics") {
    val samples = Seq(0, 1, -1, 32767, -32768, 12345, -54)
    val wav = MediaQueries.encodeWavPcm16(pcm16le(samples), 8000)
    val out = MediaQueries.decodeWav(Iterator.single(
      MediaRow(5L, wav, MediaMeta("audio", 0, 0, 99)))).next()
    assert(out.real_decode && out.format === "wav")
    assert(out.sample_rate === 8000, "rate must come from the header, not metadata")
    assert(out.channels === 1 && out.bits === 16)
    assert(out.n_samples === samples.length.toLong)
    assert(out.sum_sq === samples.map(v => v.toLong * v).sum)
    assert(out.max_abs === samples.map(math.abs).max)
  }

  test("encoded WAV is readable by javax.sound AudioSystem, and vice versa") {
    val samples = Seq(100, -200, 300, -400)
    // our encoder → JDK reader
    val ours = MediaQueries.encodeWavPcm16(pcm16le(samples), 16000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(ours))
    assert(ais.getFormat.getSampleRate === 16000f)
    assert(ais.getFormat.getChannels === 1)
    assert(ais.getFormat.getSampleSizeInBits === 16)
    assert(ais.getFrameLength === samples.length.toLong)
    // JDK writer → our decoder
    val fmt = new javax.sound.sampled.AudioFormat(22050f, 16, 1, true, false)
    val data = pcm16le(samples)
    val src = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(src,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = MediaQueries.decodeWav(Iterator.single(
      MediaRow(6L, bos.toByteArray, MediaMeta("audio", 0, 0, 0)))).next()
    assert(out.real_decode && out.sample_rate === 22050)
    assert(out.n_samples === samples.length.toLong)
    assert(out.sum_sq === samples.map(v => v.toLong * v).sum)
  }

  test("non-WAV and non-PCM payloads fall back to the LE-int16 stub") {
    val text = "abcd".getBytes("UTF-8")
    val out = MediaQueries.decodeWav(Iterator.single(
      MediaRow(7L, text, MediaMeta("audio", 0, 0, 16000)))).next()
    assert(!out.real_decode && out.format === "stub:audio")
    assert(out.sample_rate === 16000, "stub keeps the metadata rate")
    val s0 = ('a' | ('b' << 8)); val s1 = ('c' | ('d' << 8))
    assert(out.n_samples === 2L)
    assert(out.sum_sq === s0.toLong * s0 + s1.toLong * s1)
    // RIFF magic but a non-PCM format code also falls back, not crashes
    val wav = MediaQueries.encodeWavPcm16(pcm16le(Seq(9, 9)), 8000)
    wav(20) = 3 // IEEE float format code
    val bad = MediaQueries.decodeWav(Iterator.single(
      MediaRow(8L, wav, MediaMeta("video", 0, 0, 44100)))).next()
    assert(!bad.real_decode && bad.format === "stub:video")
  }

  test("q_media_audio takes the real path for every row and stays narrow") {
    val df = MediaQueries.qMediaAudio(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"audio decode must not shuffle:\n$plan")
    val audioDocs = Tables.documents(spark, sf).filter($"doc_id" % 3 === 1)
    assert(df.count() === audioDocs.count())
    // one row vs a driver-side recomputation over the raw text bytes
    val doc = audioDocs.filter(length($"text") >= 2).head()
    val bytes = doc.getAs[String]("text").getBytes("UTF-8")
    val n = bytes.length / 2
    val vals = (0 until n).map(i => (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8))
    val row = df.filter($"media_id" === doc.getAs[Long]("doc_id")).head()
    assert(row.getAs[Long]("n_samples") === n.toLong)
    assert(row.getAs[Long]("sum_sq") === vals.map(v => v.toLong * v).sum)
    assert(row.getAs[Int]("max_abs") === vals.max)
    assert(row.getAs[Int]("sample_rate") === 16000)
  }

  test("real resize: nearest-neighbor resample of a generated PNG is exact") {
    // 4x2 image of solid quadrant colors → aspect-fit into a 2-box:
    // (4,2) → (2,1); nearest-neighbor picks source pixel floor(i*src/dst)
    val px = Array(
      Array(0xff0000, 0xff0000, 0x00ff00, 0x00ff00),
      Array(0x0000ff, 0x0000ff, 0xffffff, 0xffffff))
    val png = pngBytes(px)
    val out = MediaQueries.resizeImages(Iterator.single(
      MediaRow(20L, png, MediaMeta("image", 999, 999, 0))), 2).next()
    assert(out.real_resize)
    assert(out.width === 2 && out.height === 1)
    // the resized payload is itself a valid PNG with the mapped pixels
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(back.getWidth === 2 && back.getHeight === 1)
    assert((back.getRGB(0, 0) & 0xffffff) === 0xff0000) // src (0,0)
    assert((back.getRGB(1, 0) & 0xffffff) === 0x00ff00) // src (2,0)
    // portrait orientation fits the long side too
    val tall = pngBytes(Array(Array(0x123456), Array(0x654321),
      Array(0xabcdef), Array(0xfedcba)))
    val t = MediaQueries.resizeImages(Iterator.single(
      MediaRow(21L, tall, MediaMeta("image", 0, 0, 0))), 2).next()
    assert(t.width === 1 && t.height === 2 && t.real_resize)
    // non-image payloads pass through with PLANNED aspect-fit dims
    val stub = MediaQueries.resizeImages(Iterator.single(
      MediaRow(22L, "words".getBytes, MediaMeta("image", 320, 180, 0))), 64).next()
    assert(!stub.real_resize)
    assert(stub.width === 64 && stub.height === 36) // 180*64/320
    assert(stub.payload.toSeq === "words".getBytes.toSeq)
  }

  test("frame energy cuts exact 50-sample frames with a short tail") {
    // 120 samples → frames of 50, 50, 20
    val samples = (1 to 120).map(i => if (i <= 50) 10 else if (i <= 100) -3 else 7)
    val wav = MediaQueries.encodeWavPcm16(pcm16le(samples), 16000)
    val frames = MediaQueries.wavFrameEnergy(Iterator.single(
      MediaRow(9L, wav, MediaMeta("audio", 0, 0, 0))), 50).toSeq
    assert(frames.map(f => (f.frame_no, f.n_samples, f.sum_sq)) === Seq(
      (0L, 50, 50L * 100), (1L, 50, 50L * 9), (2L, 20, 20L * 49)))
    // non-WAV payloads emit no frames (the decode gate)
    assert(MediaQueries.wavFrameEnergy(Iterator.single(
      MediaRow(10L, "notwav".getBytes, MediaMeta("audio", 0, 0, 0))), 50).isEmpty)
  }

  private def animatedGif(frames: Seq[Int]): Array[Byte] = {
    // 8x8 solid-color frames written through the JRE's GIF sequence
    // writer — a genuine multi-frame GIF89a payload
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    frames.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  test("real video arm: animated GIF frames decode and the planted cut is found") {
    // dark, dark, bright — exactly one luma jump between frames 2 and 3
    val gif = animatedGif(Seq(0x141414, 0x141414, 0xe6e6e6))
    assert(MediaQueries.sniffImageFormat(gif) === Some("gif"))
    val out = MediaQueries.detectScenes(Iterator.single(
      MediaRow(1L, gif, MediaMeta("video", 8, 8, 0)))).next()
    assert(out.real_decode, "GIF must take the javax.imageio sequence path")
    assert(out.n_frames === 3L, s"all three frames must decode: $out")
    assert(out.n_cuts === 1L, s"exactly the planted cut: $out")
    // no cut anywhere in a constant animation
    val flat = MediaQueries.detectScenes(Iterator.single(
      MediaRow(2L, animatedGif(Seq(0x808080, 0x808080, 0x808080)),
        MediaMeta("video", 8, 8, 0)))).next()
    assert(flat.real_decode && flat.n_frames === 3L && flat.n_cuts === 0L)
  }

  test("scene stub arm reproduces the byte-slice sampling rule exactly") {
    // 130 bytes → 3 frames at step 64; frames 0 and 1 share their first
    // 16 bytes, frame 2 differs
    val bytes = (Array.fill(16)('a'.toByte) ++ Array.fill(48)('x'.toByte) ++
      Array.fill(16)('a'.toByte) ++ Array.fill(48)('x'.toByte) ++
      Array.fill(2)('z'.toByte))
    val out = MediaQueries.detectScenes(Iterator.single(
      MediaRow(3L, bytes, MediaMeta("video", 0, 0, 0)))).next()
    assert(!out.real_decode)
    assert(out.n_frames === 3L)
    assert(out.n_cuts === 1L, s"frames 0,1 equal; frame 2 differs: $out")
    // corrupt bytes that sniff as GIF fall back to the stub
    val fakeGif = "GIF8junk".getBytes("UTF-8")
    val bad = MediaQueries.detectScenes(Iterator.single(
      MediaRow(4L, fakeGif, MediaMeta("video", 0, 0, 0)))).next()
    assert(!bad.real_decode)
  }

  test("q_media_scenes stays narrow (no shuffle) and all-stub on fixtures") {
    val df = MediaQueries.qMediaScenes(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scene detection is per-payload local — no shuffle allowed:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.getAs[Boolean]("real_decode")),
      "ASCII fixtures must all take the stub arm")
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

  test("Goertzel bands pick out generated pure tones at their bin frequency") {
    import graft.queries.MediaQueries
    import graft.queries.MediaQueries.{MediaMeta, MediaRow}
    // a pure sine at bin k of the 50-sample frame must put (nearly) all
    // its Goertzel energy into band k — for each k in the band set
    def toneRow(id: Long, k: Int, nSamples: Int): MediaRow = {
      val bytes = new Array[Byte](2 * nSamples)
      for (i <- 0 until nSamples) {
        val v = math.round(
          10000.0 * math.sin(2.0 * math.Pi * k * i / 50.0)).toInt
        val u = if (v < 0) v + 65536 else v
        bytes(2 * i) = (u & 0xff).toByte
        bytes(2 * i + 1) = ((u >> 8) & 0xff).toByte
      }
      MediaRow(id, bytes, MediaMeta("audio", 0, 0, 16000))
    }
    for (k <- Seq(1, 2, 4, 8)) {
      val frames = MediaQueries.goertzelFrames(
        Iterator(toneRow(k.toLong, k, 200)), 50, MediaQueries.GoertzelBands)
        .toSeq
      assert(frames.size === 4 * 4, "4 full frames x 4 bands")
      val perBand = frames.groupBy(_.band_k).view.mapValues(_.map(_.p).sum)
      val own = perBand(k)
      (Seq(1, 2, 4, 8).toSet - k).foreach { other =>
        assert(own > 20L * perBand(other),
          s"tone at bin $k: band $k energy $own should dominate " +
            s"band $other (${perBand(other)})")
      }
    }
    // frame layout: tail frame is short, empty payload emits nothing
    val tail = MediaQueries.goertzelFrames(
      Iterator(toneRow(9L, 4, 60)), 50, MediaQueries.GoertzelBands).toSeq
    assert(tail.map(_.frame_no).distinct.sorted === Seq(0L, 1L))
    assert(MediaQueries.goertzelFrames(
      Iterator(MediaRow(10L, Array.emptyByteArray,
        MediaMeta("audio", 0, 0, 16000))), 50,
      MediaQueries.GoertzelBands).isEmpty)
  }
}
