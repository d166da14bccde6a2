package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** Multimodal plumbing (schema, batch shape, frame sampling) plus the
  * real zero-dependency codecs: ImageIO (PNG/JPEG), javax.sound (WAV),
  * and the in-repo RIFF/AVI container (MJPEG + uncompressed DIB). The
  * deterministic FakeDecoder appears only as a fixture pixel source. */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.asMediaTable(
    spark.read.parquet(s"$sfDir/documents.parquet"),
    idCol = "doc_id", payloadCol = "text", mediaType = "image",
    meta = Map("width" -> "16", "height" -> "8", "channels" -> "1")).cache()

  test("asMediaTable produces the opaque-binary + typed-meta layout") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("content") == "binary")
    assert(f("meta") == "map")
    assert(media.count() == 500)
  }

  test("decodeAndFeaturize: explicit schema, meta-driven dims, fixed-dim features") {
    val out = Multimodal.decodeAndFeaturize(media, Multimodal.FakeDecoder,
      featureDim = 16, batchSize = 32)
    assert(out.schema.fieldNames.toSeq ==
      Seq("asset_id", "width", "height", "channels", "features", "synthetic_decode"))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getInt(1) == 16 && r.getInt(2) == 8))
    assert(rows.forall(_.getSeq[Float](4).length == 16))
  }

  test("synthetic_decode honesty flag: true on the video stand-in path, false " +
      "on every real decoder — stand-in features can never pass as real") {
    assert(Multimodal.decodeAndFeaturize(media.limit(5), Multimodal.FakeDecoder)
      .collect().forall(_.getBoolean(5)),
      "FakeDecoder output must be flagged synthetic")
    val png = Multimodal.reencodeAsPng(media.limit(5))
    assert(!Multimodal.decodeAndFeaturize(png, Multimodal.ImageIoDecoder)
      .collect().exists(_.getBoolean(5)),
      "real image decode must NOT be flagged synthetic")
  }

  test("decode is deterministic (same bytes → same features)") {
    val a = Multimodal.decodeAndFeaturize(media, Multimodal.FakeDecoder)
      .orderBy("asset_id").collect().map(_.getSeq[Float](4))
    val b = Multimodal.decodeAndFeaturize(media, Multimodal.FakeDecoder)
      .orderBy("asset_id").collect().map(_.getSeq[Float](4))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("decoded features feed the similarity ops unchanged") {
    val feats = Multimodal.decodeAndFeaturize(media, Multimodal.FakeDecoder)
      .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
    val top = graft.llm.Similarity.bruteForceTopK(
      feats.filter(col("vec_id") < 2), feats, k = 3)
    assert(top.count() == 6)
  }

  test("resize: nearest-neighbor downscale preserves channel count") {
    val d = Multimodal.FakeDecoder.decode("hello-bytes".getBytes, Map("width" -> "8", "height" -> "8"))
    val r = Multimodal.resize(d, 4, 2)
    assert(r.width == 4 && r.height == 2 && r.channels == d.channels)
    assert(r.data.length == 8)
    // corner pixel maps to source corner
    assert(r.data(0) == d.data(0))
  }

  test("sampleFrames explodes every Nth frame from metadata") {
    val video = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(3),
      "doc_id", "text", "video", Map("n_frames" -> "10"))
    val frames = Multimodal.sampleFrames(video, everyN = 3)
    // frames 0,3,6,9 per asset
    assert(frames.count() == 12)
    val idx = frames.filter(col("asset_id") === 0).select("frame_idx")
      .collect().map(_.getInt(0)).sorted
    assert(idx.sameElements(Array(0, 3, 6, 9)))
  }

  test("null content assets are skipped, not NPE'd") {
    import org.apache.spark.sql.functions.when
    val withNull = media.withColumn("content",
      when(col("asset_id") === 0, lit(null).cast("binary")).otherwise(col("content")))
    val out = Multimodal.decodeAndFeaturize(withNull, Multimodal.FakeDecoder)
    assert(out.count() == media.count() - 1)
    assert(out.filter(col("asset_id") === 0).count() == 0)
  }

  test("zero or missing n_frames yields no frame rows (no phantom frame 0)") {
    val video = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(2),
      "doc_id", "text", "video", Map("n_frames" -> "0"))
    assert(Multimodal.sampleFrames(video, everyN = 2).count() == 0)
    val noMeta = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(2),
      "doc_id", "text", "video", Map.empty)
    assert(Multimodal.sampleFrames(noMeta, everyN = 2).count() == 0)
  }

  test("meanPool buckets cover the buffer") {
    val pooled = Multimodal.meanPool(Array.tabulate(100)(_.toFloat), 4)
    assert(pooled.length == 4)
    // bucket means are increasing for an increasing ramp
    assert(pooled.zip(pooled.tail).forall { case (a, b) => a < b })
  }

  // ------------------------------------------------ real codec (ImageIO)

  test("ImageIoDecoder decodes a genuine PNG with known pixels, exactly") {
    // 2x2 RGB fixture: red, green, blue, mid-gray — encoded as real PNG
    // bytes, decoded by the real codec, asserted value-exact
    val px = Array[Float](
      1f, 0f, 0f,  0f, 1f, 0f,
      0f, 0f, 1f,  128 / 255.0f, 128 / 255.0f, 128 / 255.0f)
    val png = Multimodal.encodePng(Multimodal.Decoded(2, 2, 3, px))
    // a real PNG: magic bytes present
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val d = Multimodal.ImageIoDecoder.decode(png, Map.empty)
    assert(d.width == 2 && d.height == 2 && d.channels == 3)
    assert(d.data.sameElements(px))
  }

  test("PNG round trip is bit-exact for 1-, 3- and 4-channel buffers") {
    for (c <- Seq(1, 3, 4)) {
      val src = Multimodal.FakeDecoder.decode(s"asset-$c".getBytes,
        Map("width" -> "7", "height" -> "5", "channels" -> c.toString))
      val back = Multimodal.ImageIoDecoder.decode(Multimodal.encodePng(src), Map.empty)
      assert(back.width == 7 && back.height == 5 && back.channels == c, s"channels=$c")
      // FakeDecoder pixels are n/255 — already on the 8-bit grid, so
      // quantize(encode) + decode must reproduce them exactly
      assert(back.data.sameElements(src.data), s"channels=$c: pixel mismatch")
    }
  }

  test("ImageIoDecoder rejects non-image bytes instead of returning garbage") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("this is not an image".getBytes, Map.empty)
    }
  }

  test("WavDecoder decodes a genuine WAV fixture bit-exactly (mono + stereo)") {
    // deterministic sine-ish samples quantized to the n/32768 grid so
    // the 16-bit PCM round trip is exact
    def grid(n: Int, ch: Int): Array[Float] =
      Array.tabulate(n * ch)(i =>
        math.round(math.sin(i * 0.37 + ch) * 30000).toInt / 32768.0f)
    for (ch <- Seq(1, 2)) {
      val src = Multimodal.Decoded(240, 1, ch, grid(240, ch))
      val wav = Multimodal.encodeWav(src, sampleRate = 8000f)
      // a real WAV: RIFF....WAVE header
      assert(wav.take(4).sameElements("RIFF".getBytes))
      assert(wav.slice(8, 12).sameElements("WAVE".getBytes))
      val back = Multimodal.WavDecoder.decode(wav, Map.empty)
      assert(back.width == 240 && back.height == 1 && back.channels == ch, s"ch=$ch")
      assert(back.data.sameElements(src.data), s"ch=$ch: sample mismatch")
    }
  }

  test("WavDecoder converts non-16-bit encodings through the JDK conversion path") {
    // hand-build an 8-bit UNSIGNED PCM WAV (direct path) and a 32-bit
    // float WAV via AudioSystem (conversion path)
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = 64
    val bytes8 = Array.tabulate(n)(i => ((i * 3 + 17) % 256).toByte)
    val fmt8 = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes8), fmt8, n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val d8 = Multimodal.WavDecoder.decode(baos.toByteArray, Map.empty)
    assert(d8.width == n && d8.channels == 1)
    val want8 = bytes8.map(b => ((b & 0xff) - 128) / 128.0f)
    assert(d8.data.sameElements(want8))
  }

  test("WavDecoder rejects non-audio bytes instead of returning garbage") {
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      Multimodal.WavDecoder.decode("this is not audio".getBytes, Map.empty)
    }
  }

  test("decoded audio feeds decodeAndFeaturize through the shared plumbing") {
    import spark.implicits._
    // media table whose payloads are REAL WAV bytes
    val rows = (0L until 8L).map { id =>
      val samples = Array.tabulate(120)(i =>
        math.round(math.sin(i * 0.11 + id) * 28000).toInt / 32768.0f)
      (id, Multimodal.encodeWav(Multimodal.Decoded(120, 1, 1, samples)))
    }
    val df = rows.toDF("asset_id", "content")
      .withColumn("meta", org.apache.spark.sql.functions.map())
    val out = Multimodal.decodeAndFeaturize(df, Multimodal.WavDecoder,
      featureDim = 8, batchSize = 4).collect()
    assert(out.length == 8)
    assert(out.forall(r => r.getInt(1) == 120 && r.getInt(2) == 1 && r.getInt(3) == 1))
    // mean-pooled features are bounded by the sample range
    assert(out.forall(_.getSeq[Float](4).forall(f => f >= -1f && f <= 1f)))
  }

  // ------------------------------------------------ real codec (RIFF/AVI)

  private def gridFrames(n: Int, w: Int, h: Int): Seq[Multimodal.Decoded] =
    (0 until n).map { f =>
      Multimodal.FakeDecoder.decode(s"clip-frame-$f".getBytes,
        Map("width" -> w.toString, "height" -> h.toString, "channels" -> "3"))
    }

  test("AVI DIB round trip is bit-exact per frame (real RIFF container)") {
    val frames = gridFrames(3, 16, 8)
    val avi = Multimodal.encodeAvi(frames, fps = 10, mjpeg = false)
    // a real AVI: RIFF....AVI  header
    assert(avi.take(4).sameElements("RIFF".getBytes))
    assert(avi.slice(8, 12).sameElements("AVI ".getBytes))
    val parsed = Multimodal.Avi.parse(avi)
    assert(parsed.nFrames == 3 && parsed.width == 16 && parsed.height == 8)
    assert(parsed.compression == 0, "DIB clips advertise biCompression=0")
    for (i <- 0 until 3) {
      val back = Multimodal.AviDecoder.decode(avi, Map("frame_idx" -> i.toString))
      assert(back.width == 16 && back.height == 8 && back.channels == 3, s"frame $i")
      // FakeDecoder pixels are n/255 — already on the 8-bit grid, so
      // the uncompressed round trip must reproduce them exactly
      assert(back.data.sameElements(frames(i).data), s"frame $i: pixel mismatch")
    }
  }

  test("AVI MJPEG frames decode through the real JDK JPEG codec within lossy tolerance") {
    // smooth horizontal ramps (JPEG's representative case — hash noise
    // is its adversarial worst case and belongs to the DIB path)
    val frames = (0 until 2).map { f =>
      val w = 16; val h = 8
      val px = Array.tabulate(w * h * 3) { i =>
        val x = (i / 3) % w
        math.min(1f, x / (w - 1).toFloat + 0.1f * f)
      }
      Multimodal.Decoded(w, h, 3, px)
    }
    val avi = Multimodal.encodeAvi(frames, fps = 10, mjpeg = true)
    val parsed = Multimodal.Avi.parse(avi)
    assert(parsed.nFrames == 2)
    // MJPG fourcc little-endian in biCompression
    assert(parsed.compression == ('M' | ('J' << 8) | ('P' << 16) | ('G' << 24)))
    // each frame payload is a genuine JPEG (SOI marker FF D8)
    assert(parsed.frames.forall(f => (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8))
    val d = Multimodal.AviDecoder.decode(avi, Map("frame_idx" -> "0"))
    assert(d.width == 16 && d.height == 8 && d.channels == 3)
    val mad = d.data.zip(frames(0).data).map { case (a, b) => math.abs(a - b) }.sum / d.data.length
    assert(mad < 0.05, s"JPEG mean abs deviation too high: $mad")
  }

  test("AVI parser handles odd-size chunk padding and defaults to frame 0") {
    // raw odd-length payloads exercise the word-alignment rule directly
    val payloads = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8))
    val avi = Multimodal.Avi.build(4, 2, 10, mjpeg = false, payloads)
    val parsed = Multimodal.Avi.parse(avi)
    assert(parsed.nFrames == 2)
    assert(parsed.frames(0).sameElements(payloads(0)))
    assert(parsed.frames(1).sameElements(payloads(1)))
    // default frame selection: meta without frame_idx decodes frame 0
    val frames = gridFrames(2, 4, 4)
    val clip = Multimodal.encodeAvi(frames, mjpeg = false)
    val d = Multimodal.AviDecoder.decode(clip, Map.empty)
    assert(d.data.sameElements(frames(0).data))
  }

  test("AVI parser on a foreign multi-stream file: an audio stream's strf is " +
      "not misread as a video header, and only the video stream's frames load") {
    // hand-mux an audio-first AVI: strl(auds + 40-byte junk strf),
    // strl(vids + real BITMAPINFOHEADER), movi('00wb' junk, '01db' frame)
    val frame = gridFrames(1, 4, 2).head
    val dib = Multimodal.Avi.encodeDib(frame)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def chunk(id: String)(body: => Unit): Unit = {
      cc(id)
      val sizeAt = out.size(); u32(0)
      val start = out.size(); body
      val size = out.size() - start
      if ((size & 1) == 1) out.write(0)
      val b = out.toByteArray
      (0 until 4).foreach(i => b(sizeAt + i) = ((size >> (8 * i)) & 0xff).toByte)
      out.reset(); out.write(b, 0, b.length)
    }
    cc("RIFF"); val riffSizeAt = out.size(); u32(0); cc("AVI ")
    chunk("LIST") { cc("hdrl")
      chunk("avih") { u32(100000); u32(0); u32(0); u32(0x10); u32(1); u32(0)
        u32(2); u32(dib.length); u32(4); u32(2); (0 until 4).foreach(_ => u32(0)) }
      chunk("LIST") { cc("strl")
        chunk("strh") { cc("auds"); u32(0); u32(0); u16(0); u16(0); u32(0)
          u32(1); u32(8000); u32(0); u32(8000); u32(0); u32(0xffffffffL); u32(1)
          u16(0); u16(0); u16(0); u16(0) }
        // 40 bytes of WAVEFORMATEX-ish junk: read as a BITMAPINFOHEADER
        // it would claim width=9999 — the old-parser failure mode
        chunk("strf") { u32(40); u32(9999); u32(7777); u16(1); u16(16)
          u32(0x12345678L); u32(0); u32(0); u32(0); u32(0); u32(0) }
      }
      chunk("LIST") { cc("strl")
        chunk("strh") { cc("vids"); u32(0); u32(0); u16(0); u16(0); u32(0)
          u32(1); u32(10); u32(0); u32(1); u32(dib.length); u32(0xffffffffL); u32(0)
          u16(0); u16(0); u16(4); u16(2) }
        chunk("strf") { u32(40); u32(4); u32(2); u16(1); u16(24)
          u32(0); u32(dib.length.toLong); u32(0); u32(0); u32(0); u32(0) }
      }
    }
    chunk("LIST") { cc("movi")
      chunk("00wb") { out.write(Array[Byte](1, 2, 3, 4), 0, 4) } // audio data
      chunk("01db") { out.write(dib, 0, dib.length) }            // the video frame
    }
    val bytes = out.toByteArray
    (0 until 4).foreach(i => bytes(riffSizeAt + i) = (((bytes.length - 8) >> (8 * i)) & 0xff).toByte)
    val parsed = Multimodal.Avi.parse(bytes)
    assert(parsed.width == 4 && parsed.height == 2,
      s"audio strf misread as video header: ${parsed.width}x${parsed.height}")
    assert(parsed.nFrames == 1 && parsed.chunkIds == Vector("01db"))
    val d = Multimodal.AviDecoder.decode(bytes, Map.empty)
    assert(d.data.sameElements(frame.data), "video frame must decode bit-exact")
  }

  test("probeAvi reports container-level n_frames/width/height without decoding") {
    val avi = Multimodal.encodeAvi(gridFrames(4, 6, 3), mjpeg = false)
    assert(Multimodal.probeAvi(avi) ==
      Map("n_frames" -> "4", "width" -> "6", "height" -> "3"))
  }

  test("AviDecoder rejects out-of-range frames and non-AVI bytes") {
    val avi = Multimodal.encodeAvi(gridFrames(2, 4, 4), mjpeg = false)
    intercept[IllegalArgumentException] {
      Multimodal.AviDecoder.decode(avi, Map("frame_idx" -> "2"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.AviDecoder.decode("this is not a video".getBytes, Map.empty)
    }
  }

  test("reencodeAsAvi + sampleFrames + AviDecoder: real end-to-end video path, " +
      "synthetic_decode false on every row") {
    val avi = Multimodal.reencodeAsAvi(media.limit(5), nFrames = 3)
    // probe merged real container metadata into the meta map
    val metas = avi.select(col("meta")).collect()
      .map(_.getMap[String, String](0))
    assert(metas.forall(m => m("n_frames") == "3" && m("width") == "16" && m("height") == "8"))
    val frames = Multimodal.frameIdxIntoMeta(Multimodal.sampleFrames(avi, everyN = 1))
    assert(frames.count() == 15)
    val out = Multimodal.decodeAndFeaturize(frames, Multimodal.AviDecoder,
      featureDim = 8, batchSize = 4).collect()
    assert(out.length == 15)
    assert(out.forall(r => r.getInt(1) == 16 && r.getInt(2) == 8 && r.getInt(3) == 3))
    assert(!out.exists(_.getBoolean(5)), "real video decode must NOT be flagged synthetic")
    // frames differ within an asset (per-frame seeds) → featurized rows differ
    val perAsset = out.groupBy(_.getLong(0)).values
    assert(perAsset.forall(_.map(_.getSeq[Float](4)).distinct.length == 3))
  }

  test("reencodeAsPng + ImageIoDecoder: real end-to-end codec path on the media table") {
    val png = Multimodal.reencodeAsPng(media.limit(20))
    val out = Multimodal.decodeAndFeaturize(png, Multimodal.ImageIoDecoder,
      featureDim = 16, batchSize = 8)
    val rows = out.collect()
    assert(rows.length == 20)
    // dims come from the PNG header now, not the meta map
    assert(rows.forall(r => r.getInt(1) == 16 && r.getInt(2) == 8 && r.getInt(3) == 1))
    // and the features equal the stub-codec features (n/255-grid round trip)
    val fake = Multimodal.decodeAndFeaturize(media.limit(20), Multimodal.FakeDecoder,
      featureDim = 16, batchSize = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](4)).toMap
    assert(rows.forall(r => r.getSeq[Float](4) == fake(r.getLong(0))))
  }

  test("dHash64: codec-invariant on smooth plates, distinct across seeds, " +
      "scale-tolerant (PerfProbe 10 calibration)") {
    import graft.llm.Multimodal._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // toGray: BT.601 luma on a hand pixel
    val px = Decoded(1, 1, 3, Array(1.0f, 0.5f, 0.25f))
    assert(math.abs(toGray(px).data(0) - (0.299f + 0.587f * 0.5f + 0.114f * 0.25f)) < 1e-6)
    val seeds = 0L until 40L
    for (seed <- seeds) {
      val img = smoothImage(seed)
      val hOrig = dHash64(img)
      val hPng = dHash64(ImageIoDecoder.decode(encodePng(img), Map.empty))
      val hJpg = dHash64(ImageIoDecoder.decode(Avi.encodeJpegFrame(img), Map.empty))
      // 8-bit quantization can flip near-tie gradients; JPEG adds its
      // lossy wobble — both stay inside the q129 radius of 3
      assert(ham(hOrig, hPng) <= 2, s"seed $seed png drift")
      assert(ham(hPng, hJpg) <= 3, s"seed $seed cross-codec drift")
      // a 2x render of the same plate downsamples to NEARLY the same
      // 9x8 — soft tolerance (dHash is rescale-TOLERANT, not
      // invariant: NN sampling phase shifts flip a few near-ties)
      assert(ham(dHash64(smoothImage(seed, 64, 64)), hOrig) <= 10, s"seed $seed scale drift")
    }
    // distinct plates stay apart (probe: cross-seed min 4 over 150 seeds)
    val hs = seeds.map(s0 => dHash64(smoothImage(s0)))
    val cross = for (a <- hs.indices; b <- hs.indices if a < b) yield ham(hs(a), hs(b))
    assert(cross.min > 3, s"cross-seed hashes inside the near-dup radius: min=${cross.min}")
  }

  test("pHash64: affine-invariant, blur+requantization twins inside radius 7 " +
      "where dHash's envelope closes (MediaEnvelopeProbe calibration)") {
    import graft.llm.Multimodal._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val seeds = 0L until 40L
    for (seed <- seeds) {
      val img = texturedImage(seed)
      // textured plates render in [0,1] and are deterministic per seed
      assert(img.data.forall(v => v >= 0.0f && v <= 1.0f))
      assert(texturedImage(seed).data.sameElements(img.data))
      val h = pHash64(img)
      // exact invariance laws: brightness shift + positive contrast
      // scale preserve every AC sign relation (values kept clip-free)
      val affine = Decoded(32, 32, 3, img.data.map(v => 0.1f + 0.8f * v))
      assert(pHash64(affine) == h, s"seed $seed affine drift")
      // PNG render round-trip: 8-bit quantization wobble only
      val hPng = pHash64(ImageIoDecoder.decode(encodePng(img), Map.empty))
      assert(ham(h, hPng) <= 2, s"seed $seed png drift")
      // the tier's reason to exist: the blur+JPEG-q30 twin stays inside
      // the q144 radius
      val degraded = ImageIoDecoder.decode(
        jpegBytesAtQuality(boxBlur3(img), 0.3f), Map.empty)
      assert(ham(hPng, pHash64(degraded)) <= 7,
        s"seed $seed degraded twin outside the pHash radius")
    }
    // cross-seed distinctness in pHash's operating regime (probe: min 13
    // over 500 seeds)
    val hs = seeds.map(s0 => pHash64(texturedImage(s0)))
    val cross = for (a <- hs.indices; b <- hs.indices if a < b) yield ham(hs(a), hs(b))
    assert(cross.min > 7, s"cross-seed pHashes inside the radius: min=${cross.min}")
    // dHash on the SAME degradations cannot hold its radius-3 envelope
    // (probe: twin max 10 = stranger min 10 at 500 seeds)
    val dTwin = seeds.map { s0 =>
      val img = texturedImage(s0)
      ham(dHash64(ImageIoDecoder.decode(encodePng(img), Map.empty)),
        dHash64(ImageIoDecoder.decode(
          jpegBytesAtQuality(boxBlur3(img), 0.3f), Map.empty)))
    }
    assert(dTwin.max > 3,
      "expected at least one blur twin outside the dHash radius-3 envelope")
    // and the measured NEGATIVE result that keeps the tier honest: on
    // the single-sinusoid plate family the AC sign pattern collapses —
    // cross-seed pHash strangers land inside any usable radius, so the
    // DCT tier is corpus-dependent (calibrate mode is the arbiter)
    val smoothHs = (0L until 150L).map(s0 => pHash64(smoothImage(s0)))
    val smoothCross = (for (a <- smoothHs.indices; b <- smoothHs.indices if a < b)
      yield ham(smoothHs(a), smoothHs(b))).min
    assert(smoothCross <= 3,
      s"smooth plates were expected pHash-degenerate, got cross min $smoothCross")
  }

  test("pHash256: affine-invariant, blur+requantization twins inside radius 15 " +
      "with strangers past 90 on the wide-spectrum family; the 8x8-spectrum " +
      "plates are the recorded negative (MediaEnvelopeProbe calibration)") {
    import graft.llm.Multimodal._
    def ham(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val seeds = 0L until 40L
    for (seed <- seeds) {
      val img = texturedImageWide(seed)
      assert(img.data.forall(v => v >= 0.0f && v <= 1.0f))
      assert(texturedImageWide(seed).data.sameElements(img.data))
      val h = pHash256(img)
      assert(h.length == 4)
      // exact invariance laws (pHash64's, inherited): brightness shift
      // + positive contrast scale preserve every AC sign relation
      val affine = Decoded(64, 64, 3, img.data.map(v => 0.1f + 0.8f * v))
      assert(ham(pHash256(affine), h) == 0, s"seed $seed affine drift")
      // PNG render round-trip: 8-bit quantization wobble only
      val hPng = pHash256(ImageIoDecoder.decode(encodePng(img), Map.empty))
      assert(ham(h, hPng) <= 4, s"seed $seed png drift")
      // the blur+JPEG-q30 twin stays inside the wide tier's radius
      // (probe: twin max 10 at 150 seeds)
      val degraded = ImageIoDecoder.decode(
        jpegBytesAtQuality(boxBlur3(img), 0.3f), Map.empty)
      assert(ham(hPng, pHash256(degraded)) <= 15,
        s"seed $seed degraded twin outside the wide radius")
    }
    // cross-seed distinctness: 255 independent sign bits (probe:
    // stranger min 98 at 150 seeds — far past the radius-15 gate)
    val hs = seeds.map(s0 => pHash256(texturedImageWide(s0)))
    val cross = for (a <- hs.indices; b <- hs.indices if a < b) yield ham(hs(a), hs(b))
    assert(cross.min > 60, s"cross-seed wide hashes too close: min=${cross.min}")
    // the recorded NEGATIVE that keeps the kernel honest: the 8x8-
    // spectrum textured plates leave the upper 3/4 of the 16x16 block
    // empty, so those signs are requantization noise and twins blow
    // past any usable radius — the wide tier is corpus-dependent,
    // exactly as pHash64 is degenerate on single-sinusoid plates
    val narrowTwin = (0L until 40L).map { s0 =>
      val img = texturedImage(s0)
      ham(pHash256(ImageIoDecoder.decode(encodePng(img), Map.empty)),
        pHash256(ImageIoDecoder.decode(jpegBytesAtQuality(img, 0.3f), Map.empty)))
    }
    assert(narrowTwin.max > 15,
      "expected 8x8-spectrum twins outside the wide radius (the measured negative)")
  }

  test("imageNearDupsDctWide: degraded twins pair through the WIDE banded " +
      "engine at radius 15 / 16 bands / probe 0 — the geometry the 64-bit " +
      "engine structurally cannot run (16 bands of 4 bits would saturate)") {
    import graft.llm.Multimodal
    import org.apache.spark.sql.functions.{col, struct, map => smap, lit}
    val n = 12
    val rows = (0 until n).map { i =>
      val img = Multimodal.texturedImageWide(i.toLong)
      val bytes =
        if (i < 4) Multimodal.jpegBytesAtQuality(Multimodal.boxBlur3(img), 0.3f)
        else Multimodal.encodePng(img)
      (i.toLong, bytes)
    } ++ (0 until 4).map { i => // clean twins of the 4 degraded assets
      (100L + i, Multimodal.encodePng(Multimodal.texturedImageWide(i.toLong)))
    }
    val df = spark.createDataFrame(rows).toDF("asset_id", "content")
      .withColumn("meta", smap())
    val pairs = Multimodal.imageNearDupsDctWide(df, Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0 until 4).map(i => (i.toLong, 100L + i)).toSet,
      s"wide pairs: $pairs")
    // the state frame is 4 words per asset — 32 B/signature
    val sigs = Multimodal.dctHashesWide(df, Multimodal.ImageIoDecoder)
    assert(sigs.head().getSeq[Long](1).length == 4)
  }

  test("imageNearDups: cross-codec twins pair through the banded engine, " +
      "nothing else does at radius 3") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 30), "doc_id", "text", "image", Map.empty)
    val png = Multimodal.reencodeAsSmoothImage(base, jpeg = false)
    val twins = Multimodal.reencodeAsSmoothImage(
      base.filter(col("asset_id") % 3 === 0), jpeg = true)
      .withColumn("asset_id", col("asset_id") + 100000)
    val pairs = Multimodal.imageNearDups(
      png.unionByName(twins), Multimodal.ImageIoDecoder, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = pairs.filter(p => p._2 - p._1 == 100000)
    assert(planted.length == 10, s"want all 10 cross-codec twins: ${pairs.toSeq}")
    assert(planted.forall(_._3 <= 3))
    assert(pairs.length == planted.length,
      s"no non-planted pair may sit inside radius 3: ${pairs.toSeq}")
  }

  test("audioHash64: volume/quantization-invariant, distinct across seeds " +
      "(PerfProbe 11 calibration)") {
    import graft.llm.Multimodal._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (seed <- 0L until 40L) {
      val d = smoothAudio(seed)
      val h = audioHash64(d)
      // real 16-bit WAV render + javax.sound decode: exact
      assert(audioHash64(WavDecoder.decode(encodeWav(d), Map.empty)) == h,
        s"seed $seed wav round-trip drift")
      // volume scaling: energies scale by c^2, difference signs don't
      assert(audioHash64(Decoded(d.width, 1, 1, d.data.map(_ * 0.3f))) == h,
        s"seed $seed volume drift")
    }
    val hs = (0L until 40L).map(s0 => audioHash64(smoothAudio(s0)))
    val cross = for (a <- hs.indices; b <- hs.indices if a < b) yield ham(hs(a), hs(b))
    assert(cross.min > 3, s"cross-seed fingerprints inside the radius: min=${cross.min}")
    // stereo mono-mix: duplicating the channel changes nothing
    val m = smoothAudio(7L)
    val stereo = Decoded(m.width, 1, 2, m.data.flatMap(v => Seq(v, v)))
    assert(audioHash64(stereo) == audioHash64(m))
    intercept[IllegalArgumentException](audioHash64(Decoded(4, 1, 1, new Array[Float](4))))
  }

  test("audioHash64 sample-rate relativity: the same recording rendered at " +
      "double and half the rate fingerprints within the near-dup radius — " +
      "the 9×8 grid is duration-relative, so resampled re-encodes pair") {
    import graft.llm.Multimodal._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (seed <- 0L until 25L) {
      val base = audioHash64(smoothAudio(seed, 4096))
      // denser/sparser samplings of the SAME continuous recording
      val double = audioHash64(smoothAudio(seed, 8192))
      val half = audioHash64(smoothAudio(seed, 2048))
      assert(ham(base, double) <= 3,
        s"seed $seed: 2x resample drifted ${ham(base, double)} bits")
      assert(ham(base, half) <= 3,
        s"seed $seed: 0.5x resample drifted ${ham(base, half)} bits")
    }
  }

  test("audioNearDups: half-volume twins pair through the banded engine, " +
      "nothing else does at radius 3") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 30), "doc_id", "text", "audio", Map.empty)
    val full = Multimodal.reencodeAsSmoothAudio(base)
    val twins = Multimodal.reencodeAsSmoothAudio(
      base.filter(col("asset_id") % 3 === 0), volume = 0.5f)
      .withColumn("asset_id", col("asset_id") + 100000)
    val pairs = Multimodal.audioNearDups(
      full.unionByName(twins), Multimodal.WavDecoder, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = pairs.filter(p => p._2 - p._1 == 100000)
    assert(planted.length == 10, s"want all 10 half-volume twins: ${pairs.toSeq}")
    assert(pairs.length == planted.length,
      s"no non-planted pair may sit inside radius 3: ${pairs.toSeq}")
  }

  test("videoNearDups: cross-codec clip twins pair on ALL aligned frames, " +
      "nothing else at radius 3; misaligned twins do not pair") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 24), "doc_id", "text", "video", Map.empty)
    val dib = Multimodal.reencodeAsSmoothAvi(base, nFrames = 3, mjpeg = false)
    val twins = Multimodal.reencodeAsSmoothAvi(
      base.filter(col("asset_id") % 3 === 0), nFrames = 3, mjpeg = true)
      .withColumn("asset_id", col("asset_id") + 100000)
    val pairs = Multimodal.videoNearDups(
      dib.unionByName(twins), minFrames = 3, maxHamming = 5, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val planted = pairs.filter(p => p._2 - p._1 == 100000)
    assert(planted.length == 8, s"want all 8 cross-codec clip twins: ${pairs.toSeq}")
    assert(planted.forall(_._3 == 3L), "all three aligned frames must match")
    assert(pairs.length == planted.length,
      s"no non-planted clip pair may sit inside the radius: ${pairs.toSeq}")
    // frame ALIGNMENT is part of the contract: a clip whose frames are
    // someone else's frames SHIFTED by one index shares pictures but
    // never meets them at the same frame_idx -> no pair
    val shifted = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") === 0), "doc_id", "text", "video", Map.empty)
      .mapPartitions { it =>
        it.map { row =>
          val frames = (1 to 3).map(f => Multimodal.smoothImage(0L * 1000003L + f))
          org.apache.spark.sql.Row.fromSeq(row.toSeq.updated(2, Multimodal.encodeAvi(frames))
            .updated(0, 777777L))
        }
      }(org.apache.spark.sql.Encoders.row(base.schema))
      .withColumn("meta", org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("n_frames"),
        org.apache.spark.sql.functions.lit("3")))
    val withShift = Multimodal.videoNearDups(
      dib.filter(col("asset_id") === 0).unionByName(shifted),
      minFrames = 1, maxHamming = 5, bands = 8)
      .collect()
    assert(withShift.isEmpty,
      s"shifted frames must not pair at any aligned index: ${withShift.toSeq}")
  }

  test("media near-dup plans stay banded: no cartesian / nested-loop join " +
      "in image, audio, or video pairing") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 6), "doc_id", "text", "image", Map.empty)
    val plans = Seq(
      "image" -> Multimodal.imageNearDups(
        Multimodal.reencodeAsSmoothImage(base, jpeg = false),
        Multimodal.ImageIoDecoder),
      "audio" -> Multimodal.audioNearDups(
        Multimodal.reencodeAsSmoothAudio(base), Multimodal.WavDecoder),
      "video" -> Multimodal.videoNearDups(
        Multimodal.reencodeAsSmoothAvi(base, nFrames = 2, mjpeg = false)),
      "audio-shifted" -> Multimodal.audioNearDupsShifted(
        Multimodal.reencodeAsSmoothAudio(base), Multimodal.WavDecoder),
      "video-shifted" -> Multimodal.videoNearDupsShifted(
        Multimodal.reencodeAsSmoothAvi(base, nFrames = 2, mjpeg = false)),
      "image-crop" -> Multimodal.centerCropNearDups(
        Multimodal.reencodeAsSmoothImage(base, jpeg = false),
        Multimodal.ImageIoDecoder))
    for ((name, df) <- plans) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
        s"$name near-dup degenerated to all-pairs:\n$plan")
    }
  }

  test("audioWindowHashes: window alignment arithmetic — a hop-multiple trim " +
      "shifts window indices exactly; short clips emit one whole-clip hash; " +
      "margins: misaligned same-recording windows stay outside the radius") {
    import graft.llm.Multimodal._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // driver-side replica of the window slicing on raw buffers
    def winHashes(d: Decoded, wf: Int, hop: Int): Seq[Long] =
      if (d.width <= wf) Seq(audioHash64(d))
      else (0 to (d.width - wf) / hop).map { w =>
        audioHash64(Decoded(wf, 1, 1,
          java.util.Arrays.copyOfRange(d.data, w * hop, w * hop + wf)))
      }
    for (seed <- 0L until 25L) {
      val full = smoothAudio(seed, 4096)
      val fullW = winHashes(full, 2048, 512)
      assert(fullW.length == 5, "4096 frames, 2048 window, 512 hop -> 5 windows")
      // trim = 2 hops: trimmed window w IS full window w+2, bit-exact
      val trimmed = Decoded(3072, 1, 1, full.data.drop(1024))
      val trimW = winHashes(trimmed, 2048, 512)
      assert(trimW.length == 3)
      assert(trimW == fullW.drop(2),
        s"seed $seed: hop-multiple trims must shift window indices exactly")
      // misaligned windows of the SAME recording stay outside radius 3 —
      // offset-consistent grouping sees clean deltas, not self-noise
      for (i <- fullW.indices; j <- fullW.indices if i != j)
        assert(ham(fullW(i), fullW(j)) > 3,
          s"seed $seed windows $i/$j inside the radius")
    }
    // short clip: one whole-clip window
    assert(winHashes(smoothAudio(3L, 1500), 2048, 512).length == 1)
    // the DataFrame surface agrees with the replica (real WAV round trip)
    import org.apache.spark.sql.functions.col
    val base = graft.llm.Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 4),
      "doc_id", "text", "audio", Map.empty)
    val got = audioWindowHashes(reencodeAsSmoothAudio(base), WavDecoder)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (seed <- 0L until 4L; (h, w) <- winHashes(smoothAudio(seed, 4096), 2048, 512).zipWithIndex)
      assert(got((seed, w)) == h, s"seed $seed window $w drift through the WAV path")
  }

  test("seqSigNearDups: groups candidate pairs by consistent index delta, " +
      "enforces minMatches PER delta, never pairs an asset with itself") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // hand-built sub-signatures: asset 1 = asset 0 shifted by +2 (3
    // overlapping identical sigs); asset 2 shares ONE sig with asset 0
    // at one delta and one at another (scattered — no consistent offset)
    val sig = (i: Long) => i * 0x9E3779B97F4A7C15L | 1L
    val rows = Seq(
      (0L, 0, sig(10)), (0L, 1, sig(11)), (0L, 2, sig(12)), (0L, 3, sig(13)), (0L, 4, sig(14)),
      (1L, 0, sig(12)), (1L, 1, sig(13)), (1L, 2, sig(14)),
      (2L, 0, sig(10)), (2L, 3, sig(12)), (2L, 4, sig(99)))
      .toDF("id", "seq_idx", "sig")
    val out = graft.llm.Dedup.seqSigNearDups(rows, minMatches = 2, maxHamming = 0,
      bands = 4, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    assert(out == Seq((0L, 1L, 2, 3L)),
      s"only the consistent-offset pair survives (asset 2's scattered " +
        s"single matches never reach minMatches at one delta): $out")
    // radius honored: flip one low bit of asset 1's sigs -> still pairs
    // at maxHamming 1, not at 0
    val wobble = rows.withColumn("sig",
      org.apache.spark.sql.functions.when(col("id") === 1L,
        col("sig").bitwiseXOR(org.apache.spark.sql.functions.lit(1L)))
        .otherwise(col("sig")))
    assert(graft.llm.Dedup.seqSigNearDups(wobble, 2, 0, 4, 100).count() == 0)
    val w1 = graft.llm.Dedup.seqSigNearDups(wobble, 2, 1, 4, 100).collect()
    assert(w1.length == 1 && w1.head.getLong(3) == 3L)
  }

  test("verifyImagePairs: pixels confirm what signatures nominate — twins " +
      "score near zero, strangers near the corpus contrast; the rotation " +
      "and crop hypotheses verify their tiers' pairs and reject mismatches") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.llm.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaTable(docs.filter(col("doc_id") < 20),
      "doc_id", "text", "image", Map.empty)
    val png = Multimodal.reencodeAsSmoothImage(media, jpeg = false)
    val jpg = Multimodal.reencodeAsSmoothImage(media, jpeg = true)
      .withColumn("asset_id", col("asset_id") + 100)
    val rot = Multimodal.reencodeAsSmoothImageRotated(media, k = 1)
      .withColumn("asset_id", col("asset_id") + 200)
    val crop = Multimodal.reencodeAsSmoothImageCrop(media)
      .withColumn("asset_id", col("asset_id") + 300)
    // the rotation fixture renders the ANISOTROPIC family — its
    // unrotated originals live at +400 (the +0 plates are the plain
    // family and are NOT the same pictures)
    val asym = Multimodal.reencodeAsSmoothImageRotated(media, k = 0)
      .withColumn("asset_id", col("asset_id") + 400)
    val all = png.unionByName(jpg).unionByName(rot).unionByName(crop)
      .unionByName(asym)
    def pairsOf(delta: Long) = (0L until 20L).map(i => (i, i + delta))
      .toDF("id1", "id2")
    // scalar: JPEG twins confirm (tiny MAD), mismatched ids reject
    val twins = Multimodal.verifyImagePairs(pairsOf(100), all,
      Multimodal.ImageIoDecoder, maxMeanDiff = 0.05)
    assert(twins.count() == 20, "every JPEG re-encode confirms at MAD <= 0.05")
    assert(twins.columns.toSeq == Seq("id1", "id2", "mean_diff"))
    val wrong = (0L until 20L).map(i => (i, (i + 1) % 20 + 100)).toDF("id1", "id2")
    assert(Multimodal.verifyImagePairs(wrong, all,
      Multimodal.ImageIoDecoder, maxMeanDiff = 0.05).count() == 0,
      "stranger pairs must NOT confirm")
    // rotation pairs need the orientation-invariant hypothesis: the
    // plain verifier rejects them (a quarter-turn IS a big pixel diff),
    // the invariant one confirms every pair
    val rotPairs = (0L until 20L).map(i => (i + 400, i + 200)).toDF("id1", "id2")
    assert(Multimodal.verifyImagePairs(rotPairs, all,
      Multimodal.ImageIoDecoder, maxMeanDiff = 0.05).count() < 20)
    assert(Multimodal.verifyImagePairs(rotPairs, all,
      Multimodal.ImageIoDecoder, maxMeanDiff = 0.05,
      orientationInvariant = true).count() == 20)
    // crop pairs verify under the crop hypothesis (id1 = original);
    // the plain verifier rejects (full frame vs crop differ)
    assert(Multimodal.verifyImagePairs(pairsOf(300), all,
      Multimodal.ImageIoDecoder, maxMeanDiff = 0.05,
      cropHypothesis = true).count() == 20)
    assert(Multimodal.verifyImagePairs(pairsOf(300), all,
      Multimodal.ImageIoDecoder, maxMeanDiff = 0.05).count() < 20)
    // one hypothesis per call
    intercept[IllegalArgumentException](Multimodal.verifyImagePairs(
      pairsOf(100), all, Multimodal.ImageIoDecoder,
      orientationInvariant = true, cropHypothesis = true))
  }

  test("verifyAudioPairs: spectral evidence confirms re-renders (volume " +
      "cancels in the normalized grid), rejects unrelated recordings") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.llm.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaTable(docs.filter(col("doc_id") < 20),
      "doc_id", "text", "audio", Map.empty)
    val full = Multimodal.reencodeAsSmoothAudio(media)
    val half = Multimodal.reencodeAsSmoothAudio(media, volume = 0.5f)
      .withColumn("asset_id", col("asset_id") + 100)
    val all = full.unionByName(half)
    val twins = (0L until 20L).map(i => (i, i + 100)).toDF("id1", "id2")
    val confirmed = Multimodal.verifyAudioPairs(twins, all, Multimodal.WavDecoder)
    assert(confirmed.count() == 20,
      "every half-volume re-render confirms — volume cancels in the grid")
    assert(confirmed.columns.toSeq == Seq("id1", "id2", "mean_diff"))
    val strangers = (0L until 20L).map(i => (i, (i + 1) % 20 + 100)).toDF("id1", "id2")
    assert(Multimodal.verifyAudioPairs(strangers, all, Multimodal.WavDecoder)
      .count() == 0, "unrelated recordings must not confirm")
  }

  test("verifyVideoPairs: aligned-frame pixel evidence confirms cross-codec " +
      "clip twins, rejects strangers AND temporally shifted clips (which is " +
      "why shift-tolerant pairs stay signature-gated)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.llm.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaTable(docs.filter(col("doc_id") < 12),
      "doc_id", "text", "video", Map.empty)
    val dib = Multimodal.reencodeAsSmoothAvi(media, nFrames = 4, mjpeg = false)
    val mjpeg = Multimodal.reencodeAsSmoothAvi(media, nFrames = 4, mjpeg = true)
      .withColumn("asset_id", col("asset_id") + 100)
    val shifted = Multimodal.reencodeAsSmoothAvi(media, nFrames = 4, mjpeg = true,
      frameOffset = 2).withColumn("asset_id", col("asset_id") + 200)
    val all = dib.unionByName(mjpeg).unionByName(shifted)
    val twins = (0L until 12L).map(i => (i, i + 100)).toDF("id1", "id2")
    val confirmed = Multimodal.verifyVideoPairs(twins, all,
      firstKFrames = 4, minFrames = 4, maxMeanDiff = 0.05)
    assert(confirmed.count() == 12,
      "every cross-codec twin confirms on ALL aligned frames")
    assert(confirmed.collect().forall(_.getAs[Int]("n_frames_confirmed") == 4))
    val strangers = (0L until 12L).map(i => (i, (i + 1) % 12 + 100)).toDF("id1", "id2")
    assert(Multimodal.verifyVideoPairs(strangers, all,
      firstKFrames = 4, minFrames = 1, maxMeanDiff = 0.05).count() == 0)
    // a 2-frame temporal shift breaks frame ALIGNMENT: the aligned
    // verifier rejects — the documented reason shift-tolerant pairs
    // stay signature-gated
    val shiftPairs = (0L until 12L).map(i => (i, i + 200)).toDF("id1", "id2")
    assert(Multimodal.verifyVideoPairs(shiftPairs, all,
      firstKFrames = 4, minFrames = 1, maxMeanDiff = 0.05).count() == 0)
  }

  test("dihedral: the eight transforms are the full D4 orbit — rotations " +
      "compose to identity, reflections are involutions, orbit members are " +
      "pixel-distinct on an asymmetric frame, quantization commutes") {
    import graft.llm.Multimodal
    import graft.llm.Multimodal._
    val d = smoothImageAsym(11L)
    // rot90 four times = identity (pixel-exact)
    val r4 = (1 to 4).foldLeft(d)((acc, _) => Multimodal.dihedral(acc, 1))
    assert(r4.data.toSeq == d.data.toSeq && r4.width == d.width)
    // each k in 0..7 is reachable and distinct on an asymmetric frame
    val orbit = (0 until 8).map(k => Multimodal.dihedral(d, k).data.toSeq)
    assert(orbit.distinct.length == 8, "the asym plate has no accidental symmetry")
    // reflections (k >= 4) are involutions: applying the same composite
    // twice returns the original
    for (k <- 4 until 8) {
      val once = Multimodal.dihedral(d, k)
      assert(Multimodal.dihedral(once, k).data.toSeq == d.data.toSeq, s"k=$k not involutive")
    }
    // quantization commutes with the permutation: hashing the decoded
    // PNG of a rotated plate equals hashing the rotation of the decoded
    // PNG — the zero-drift guarantee the q137 gate relies on
    for (k <- 0 until 8) {
      val a = dHash64(ImageIoDecoder.decode(
        encodePng(Multimodal.dihedral(d, k)), Map.empty))
      val b = dHash64(Multimodal.dihedral(
        ImageIoDecoder.decode(encodePng(d), Map.empty), k))
      assert(a == b, s"orientation $k drift through the codec")
    }
  }

  test("rotationNearDups margins (the q137 calibration): one-way stranger " +
      "collisions exist even on the anisotropic corpus, two-way ones don't — " +
      "minWitnesses=2 (both directions) is the load-bearing gate; the plain " +
      "isotropic plate family is rotation-ALIASED and unusable here") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the measured fact that forced the anisotropic fixture: the plain
    // smoothImage family is closed under rotation — some seed's
    // quarter-turn genuinely approximates another seed's plate
    val iso = (0 until 150).map { s =>
      val d = Multimodal.ImageIoDecoder.decode(
        Multimodal.encodePng(Multimodal.smoothImage(s)), Map.empty)
      (0 until 8).map(k => Multimodal.dHash64(Multimodal.dihedral(d, k)))
    }
    val isoBothWays = (for {
      i <- iso.indices; j <- iso.indices if i < j
      if iso(i).exists(h => ham(h, iso(j)(0)) <= 3) &&
        iso(j).exists(h => ham(h, iso(i)(0)) <= 3)
    } yield 1).size
    assert(isoBothWays > 0,
      "the isotropic family must demonstrate the aliasing the fixture exists to avoid")
    // the anisotropic corpus through the REAL engine: minWitnesses=1
    // exposes one-way collisions (they are real), minWitnesses=2 keeps
    // only the planted rotations
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaTable(docs.filter(col("doc_id") < 150),
      "doc_id", "text", "image", Map.empty)
    val all = Multimodal.reencodeAsSmoothImageRotated(media, k = 0)
      .unionByName(Multimodal.reencodeAsSmoothImageRotated(
        media.filter(col("asset_id") % 6 === 0), k = 1)
        .withColumn("asset_id", col("asset_id") + 100000))
    val oneWay = Multimodal.rotationNearDups(all, Multimodal.ImageIoDecoder,
      minWitnesses = 1, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val strangers = oneWay.filterNot(p => p._2 - p._1 == 100000)
    assert(strangers.forall(_._3 < 2),
      s"no stranger pair may reach both directions: ${strangers.toSeq}")
    val planted = oneWay.filter(p => p._2 - p._1 == 100000)
    assert(planted.length == 25 && planted.forall(_._3 == 2),
      s"every rotation twin carries both directional witnesses: ${planted.length}")
  }

  test("rotationNearDups dct kernel (round-14 envelope): blur+JPEG-q0.3 " +
      "rotated arrivals pair two-witness at the probed radius-7 geometry " +
      "where the default dHash tier provably misses them; no strangers") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.llm.Multimodal
    import spark.implicits._
    def png(s: Long) = Multimodal.encodePng(Multimodal.texturedImage(s))
    // the composite the MediaEnvelopeProbe measured: rotate 90°, 3x3
    // box blur, JPEG at quality 0.3 — outside dHash's radius-3 margin
    // on half these seeds (max 7), inside pHash's radius 7 (max 4 here)
    def rotDegraded(s: Long) = {
      val d = Multimodal.ImageIoDecoder.decode(png(s), Map.empty)
      Multimodal.jpegBytesAtQuality(
        Multimodal.boxBlur3(Multimodal.dihedral(d, 1)), 0.3f)
    }
    val media = ((0L until 20L).map(s => s -> png(s)) ++
      (0L until 20L).map(s => (s + 100000L) -> rotDegraded(s)))
      .toDF("asset_id", "content")
      .withColumn("meta", lit(null).cast("map<string,string>"))
    val dct = Multimodal.rotationNearDups(media, Multimodal.ImageIoDecoder,
      minWitnesses = 2, maxHamming = 7, bands = 4, kernel = "dct", probe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dct.map(p => (p._1, p._2)).toSet ==
      (0L until 20L).map(s => (s, s + 100000L)).toSet,
      s"dct dihedral tier must pair exactly the 20 planted rotated twins: " +
        s"${dct.toSeq.sorted}")
    assert(dct.forall(_._3 == 2), "every planted pair carries both witnesses")
    // the dHash tier at its default radius misses the measured-hard
    // seeds (0 -> distance 6, 19 -> 7; deterministic codecs)
    val dhash = Multimodal.rotationNearDups(media, Multimodal.ImageIoDecoder,
      minWitnesses = 2, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!dhash.contains((0L, 100000L)) && !dhash.contains((19L, 100019L)),
      s"the dHash kernel at radius 3 must miss the blur+JPEG composites " +
        s"the dct knob exists for: $dhash")
    assert(dhash.size < 20, s"dhash must find strictly fewer: ${dhash.size}")
    // the incremental form agrees: the degraded arrivals vs the stored
    // canonical dihedral state, same probed geometry
    val corpusState = Multimodal.dihedralHashes(
      media.filter(col("asset_id") < 100000L), Multimodal.ImageIoDecoder,
      kernel = "dct")
    val batchState = Multimodal.dihedralHashes(
      media.filter(col("asset_id") >= 100000L), Multimodal.ImageIoDecoder,
      kernel = "dct")
    val hits = Multimodal.rotationNearDupsAgainst(batchState, corpusState,
      minWitnesses = 2, maxHamming = 7, bands = 4, probe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == (0L until 20L).map(s => (s + 100000L, s)).toSet,
      s"incremental dct dihedral tier must match the self-join: $hits")
  }

  test("centerCropNearDupsAgainst: both crop directions surface with their " +
      "tags — a batch crop of stored content AND a stored crop of batch " +
      "content; strangers in neither") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def fulls(ids: Seq[Int], shift: Long) = Multimodal.tileHashes(
      Multimodal.reencodeAsSmoothImage(
        Multimodal.asMediaTable(docs.filter(col("doc_id").isin(ids.map(Integer.valueOf): _*)),
          "doc_id", "text", "image", Map.empty)
          .withColumn("asset_id", col("asset_id") + shift)
          .withColumn("seed", col("asset_id") - shift + 0L), // seed = doc id
        jpeg = false, seedCol = "seed").drop("seed"),
      Multimodal.ImageIoDecoder)
    def cropsOf(ids: Seq[Int], shift: Long) = Multimodal.tileHashes(
      Multimodal.reencodeAsSmoothImageCrop(
        Multimodal.asMediaTable(docs.filter(col("doc_id").isin(ids.map(Integer.valueOf): _*)),
          "doc_id", "text", "image", Map.empty)
          .withColumn("seed", col("asset_id") + 0L)
          .withColumn("asset_id", col("asset_id") + shift), seedCol = "seed")
        .drop("seed"),
      Multimodal.ImageIoDecoder)
    // corpus: full plates 0..5 AND a stored CROP of plate 20 (id 920)
    val corpus = fulls(0 to 5, 0).unionByName(cropsOf(Seq(20), 900))
    // batch: a crop of stored plate 3 (id 103), the FULL plate 20
    // (id 20 — the stored asset 920 is a crop of it), a stranger (id 7)
    val batch = cropsOf(Seq(3), 100).unionByName(fulls(Seq(20, 7), 0))
    val hits = Multimodal.centerCropNearDupsAgainst(batch, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(hits.toSet == Set(
      (103L, 3L, "batch_is_crop", 5L),
      (20L, 920L, "corpus_is_crop", 5L)),
      s"both directions, all five witnesses, nothing else: ${hits.toSeq}")
  }

  test("centerCropNearDups margins (the q135 calibration): a true center " +
      "crop witnesses all 5 slots at Hamming 0; strangers reach at most 3 " +
      "slots at radius 3 — minSlots=4 separates with margin both ways") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 60), "doc_id", "text", "image", Map.empty)
    val png = Multimodal.reencodeAsSmoothImage(base, jpeg = false)
    val crops = Multimodal.reencodeAsSmoothImageCrop(
      base.filter(col("asset_id") % 3 === 0))
      .withColumn("asset_id", col("asset_id") + 100000)
    // minSlots=1 exposes the full collision distribution
    val all = Multimodal.centerCropNearDups(png.unionByName(crops),
      Multimodal.ImageIoDecoder, minSlots = 1, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val planted = all.filter(p => p._2 - p._1 == 100000)
    assert(planted.length == 20 && planted.forall(p => p._3 == 5 && p._4 == 0),
      s"every true crop must witness 5/5 slots exactly: ${planted.toSeq}")
    val strangers = all.filterNot(p => p._2 - p._1 == 100000)
    assert(strangers.forall(_._3 <= 3),
      s"the stranger ceiling the minSlots=4 gate rests on: " +
        s"${strangers.filter(_._3 > 3).toSeq}")
    // strangers DO collide on single tiles (including exactly) — the
    // measured fact that makes tile-blind matching unsafe by design
    assert(strangers.nonEmpty,
      "the margins probe expects real single-slot collisions on this corpus")
  }
}
