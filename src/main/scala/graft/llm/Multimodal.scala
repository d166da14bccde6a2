package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (north-star extension, SURVEY.md §7.6).
  *
  * Media is carried as an opaque `binary` column plus a typed
  * `map<string,string>` metadata column — the layout that scales: bytes
  * stay columnar in parquet, pruning/predicates work on the metadata,
  * and decode happens executor-side in bounded batches.
  *
  * Codecs — all three modalities now decode REAL bytes, zero external
  * dependencies: images through the JDK codecs
  * ([[Multimodal.ImageIoDecoder]]: PNG/JPEG/GIF/BMP), audio through
  * the JDK sampled-sound stack ([[Multimodal.WavDecoder]]:
  * WAV/AIFF/AU), and video through an in-repo RIFF/AVI container
  * parser ([[Multimodal.AviDecoder]]: MJPEG `00dc` frames via
  * `javax.imageio`, uncompressed 24-bit DIB `00db` frames
  * arithmetically). The deterministic [[Multimodal.FakeDecoder]]
  * remains only as a seed-pixel GENERATOR for fixture synthesis (this
  * container ships no media testdata); no query path reports its
  * output as decoded content anymore.
  *
  * At scale: decode is a pure per-partition map (no shuffle); batch size
  * bounds executor memory (`batchSize × avg_asset_size`); frame
  * sampling multiplies rows BEFORE decode so each frame decodes
  * independently and partitions stay balanced via the usual
  * `maxPartitionBytes` splitting of the binary scan.
  */
object Multimodal {

  /** Decoded media: dimensions + a flat float feature buffer (pixels,
    * PCM samples, or frame features depending on modality). */
  final case class Decoded(width: Int, height: Int, channels: Int, data: Array[Float])

  /** The pluggable codec boundary. Implementations must be
    * serializable (shipped to executors once per task). */
  trait MediaDecoder extends Serializable {
    def decode(content: Array[Byte], meta: Map[String, String]): Decoded

    /** True when the "decoded" values are a stand-in rather than the
      * asset's real content. [[decodeAndFeaturize]] emits this as the
      * `synthetic_decode` column on EVERY output row, so a downstream
      * data card can never silently launder stand-in features as real
      * ones — the honesty guard for the video path. */
    def synthetic: Boolean = false
  }

  /** Deterministic pseudo-pixel generator: "decodes" bytes into a small
    * frame whose values are a hash-seeded function of the content.
    * Since round 10 every modality has a real codec
    * ([[ImageIoDecoder]]/[[WavDecoder]]/[[AviDecoder]]); this object
    * survives purely as the fixture SOURCE — it seeds the pixels that
    * the re-encode helpers turn into genuine PNG/WAV/AVI bytes in an
    * environment with no media testdata. Anything decoded through it
    * still carries `synthetic_decode = true`. */
  object FakeDecoder extends MediaDecoder {
    override def synthetic: Boolean = true
    def decode(content: Array[Byte], meta: Map[String, String]): Decoded = {
      val w = meta.get("width").map(_.toInt).getOrElse(8)
      val h = meta.get("height").map(_.toInt).getOrElse(8)
      val c = meta.get("channels").map(_.toInt).getOrElse(1)
      var seed = content.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
      val data = new Array[Float](w * h * c)
      var i = 0
      while (i < data.length) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        data(i) = ((seed >>> 40) & 0xff) / 255.0f
        i += 1
      }
      Decoded(w, h, c, data)
    }
  }

  /** REAL image decode on the JDK's built-in codecs (`javax.imageio`:
    * PNG/JPEG/GIF/BMP — zero external dependencies). Dimensions come
    * from the image header, not metadata. Channel layout: grayscale → 1
    * channel read from raw raster samples (getRGB would gamma-convert
    * gray→sRGB and break exactness), RGB → 3, with alpha → 4; all
    * normalized to [0,1]. Audio goes through [[WavDecoder]], video
    * through [[AviDecoder]] (whose MJPEG frames land back here). */
  object ImageIoDecoder extends MediaDecoder {
    def decode(content: Array[Byte], meta: Map[String, String]): Decoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      require(img != null, "ImageIO could not decode asset bytes (unsupported or corrupt format)")
      val w = img.getWidth
      val h = img.getHeight
      val cm = img.getColorModel
      val gray = cm.getNumColorComponents == 1 && !cm.hasAlpha
      val c = if (gray) 1 else if (cm.hasAlpha) 4 else 3
      val data = new Array[Float](w * h * c)
      if (gray) {
        val raster = img.getRaster
        val maxVal = (1 << raster.getSampleModel.getSampleSize(0)) - 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            data(y * w + x) = raster.getSample(x, y, 0).toFloat / maxVal
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val argb = img.getRGB(x, y)
            val base = (y * w + x) * c
            data(base) = ((argb >> 16) & 0xff) / 255.0f
            data(base + 1) = ((argb >> 8) & 0xff) / 255.0f
            data(base + 2) = (argb & 0xff) / 255.0f
            if (c == 4) data(base + 3) = ((argb >>> 24) & 0xff) / 255.0f
            x += 1
          }
          y += 1
        }
      }
      Decoded(w, h, c, data)
    }
  }

  /** REAL audio decode on the JDK's built-in codecs
    * (`javax.sound.sampled`: WAV/AIFF/AU — zero external dependencies,
    * the same argument that made [[ImageIoDecoder]] replace the fake
    * image path). Buffer convention for audio: `width` = frame count,
    * `height` = 1, `channels` = channel count, `data` = interleaved
    * per-frame samples normalized to [-1, 1].
    *
    * 16-bit signed and 8-bit unsigned PCM decode directly; any other
    * encoding (float, 24/32-bit, a-law/µ-law) goes through the JDK's
    * standard conversion to 16-bit signed PCM first. Normalization is
    * s/32768 (16-bit) and (b−128)/128 (8-bit), so [[encodeWav]] output
    * round-trips bit-exactly for data already on the n/32768 grid. */
  object WavDecoder extends MediaDecoder {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    def decode(content: Array[Byte], meta: Map[String, String]): Decoded = {
      val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      val fmt = raw.getFormat
      val direct = (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16) ||
        (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED &&
          fmt.getSampleSizeInBits == 8)
      val in =
        if (direct) raw
        else AudioSystem.getAudioInputStream(new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, fmt.getSampleRate, 16,
          fmt.getChannels, 2 * fmt.getChannels, fmt.getSampleRate, false), raw)
      val f = in.getFormat
      val bytes = in.readAllBytes()
      in.close()
      val ch = f.getChannels
      val bits = f.getSampleSizeInBits
      val bytesPerSample = bits / 8
      val nSamples = bytes.length / bytesPerSample
      val data = new Array[Float](nSamples)
      var i = 0
      if (bits == 8) {
        while (i < nSamples) {
          data(i) = ((bytes(i) & 0xff) - 128) / 128.0f
          i += 1
        }
      } else {
        val be = f.isBigEndian
        while (i < nSamples) {
          val b0 = bytes(2 * i) & 0xff
          val b1 = bytes(2 * i + 1) & 0xff
          val s = (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
          data(i) = s / 32768.0f
          i += 1
        }
      }
      Decoded(nSamples / ch, 1, ch, data)
    }
  }

  /** REAL video decode on a zero-dependency RIFF/AVI container parser
    * (the round-9 plan for the last synthetic modality): frames are
    * extracted from the `movi` LIST and decoded per-frame —
    * `00dc`-style compressed chunks (MJPEG = one JPEG per frame) go
    * through `javax.imageio` exactly like [[ImageIoDecoder]];
    * `00db`-style uncompressed chunks are 24-bit bottom-up BGR DIBs
    * decoded arithmetically (bit-exact, the round-trip fixture format).
    *
    * Frame selection: `meta("frame_idx")` picks the frame (default 0) —
    * pairs with [[sampleFrames]]' row explosion + [[frameIdxIntoMeta]],
    * so each sampled frame decodes independently executor-side and the
    * clip bytes are never re-shuffled. `synthetic` is FALSE: these are
    * the asset's real pixels. */
  object AviDecoder extends MediaDecoder {
    def decode(content: Array[Byte], meta: Map[String, String]): Decoded = {
      val avi = Avi.parse(content)
      val idx = meta.get("frame_idx").map(_.toInt).getOrElse(0)
      require(idx >= 0 && idx < avi.frames.length,
        s"frame_idx $idx out of range [0, ${avi.frames.length})")
      avi.decodeFrame(idx)
    }
  }

  /** RIFF/AVI container support — parse + build, both pure JVM.
    * Layout per the public AVI RIFF form (MSDN "AVI RIFF File
    * Reference"): `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
    * strf)) LIST('movi' 00dc|00db …) idx1)`. The parser is a plain
    * chunk walk (handles odd-size padding, skips unknown chunks) so
    * foreign-muxed MJPEG files decode too, not just our own writer's. */
  private[graft] object Avi {
    final case class Parsed(
        width: Int, height: Int, bitCount: Int, compression: Int,
        microSecPerFrame: Int, chunkIds: Vector[String],
        frames: Vector[Array[Byte]]) {
      def nFrames: Int = frames.length
      /** Decode one frame: compressed (`…dc`) via ImageIO, uncompressed
        * (`…db`) as a 24-bit bottom-up BGR DIB. */
      def decodeFrame(i: Int): Decoded =
        if (chunkIds(i).endsWith("dc"))
          ImageIoDecoder.decode(frames(i), Map.empty)
        else
          decodeDib(frames(i), width, height, bitCount)
    }

    private def u16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], p: Int): String =
      new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def parse(bytes: Array[Byte]): Parsed = {
      require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
        fourcc(bytes, 8) == "AVI ", "not a RIFF/AVI file")
      var width = 0; var height = 0; var bitCount = 24; var compression = 0
      var uspf = 0
      var haveVids = false        // first 'vids' strf wins
      var curStreamType = ""      // fccType of the last strh seen
      var vidsStreamId = "00"     // zero-based stream number of that vids stream
      var streamIdx = -1
      val ids = Vector.newBuilder[String]
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(bytes, p)
          val size = math.min(u32(bytes, p + 4), (end - p - 8).toLong).toInt
          val body = p + 8
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(bytes, body)
            walk(body + 4, body + size, inMovi || listType == "movi")
          } else if (id == "avih" && size >= 40) {
            uspf = u32(bytes, body).toInt
            if (width == 0) { width = u32(bytes, body + 32).toInt; height = u32(bytes, body + 36).toInt }
          } else if (id == "strh" && size >= 4) {
            // remember the stream type so only a VIDEO stream's strf is
            // read as a BITMAPINFOHEADER — an audio stream's strf is a
            // WAVEFORMATEX and would corrupt the dimensions (foreign
            // multi-stream files; our own writer emits video only)
            curStreamType = fourcc(bytes, body)
            streamIdx += 1
          } else if (id == "strf" && size >= 40 &&
              curStreamType == "vids" && !haveVids) {
            haveVids = true
            vidsStreamId = f"$streamIdx%02d"
            width = u32(bytes, body + 4).toInt
            height = math.abs(u32(bytes, body + 8).toInt)
            bitCount = u16(bytes, body + 14)
            compression = u32(bytes, body + 16).toInt
          } else if (inMovi && size >= 0 &&
              (id.endsWith("dc") || id.endsWith("db")) &&
              // frame chunks are '<NN>dc'/'<NN>db' where NN is the
              // stream number: take only the video stream's (audio data
              // rides '<NN>wb' and never matches, but a SECOND video
              // stream's frames must not interleave into this one)
              (!haveVids || id.startsWith(vidsStreamId))) {
            ids += id
            frames += java.util.Arrays.copyOfRange(bytes, body, body + size)
          }
          p = body + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, bytes.length, inMovi = false)
      Parsed(width, height, bitCount, compression, uspf, ids.result(), frames.result())
    }

    /** 24-bit bottom-up BGR DIB with 4-byte-aligned rows → RGB floats. */
    def decodeDib(b: Array[Byte], w: Int, h: Int, bitCount: Int): Decoded = {
      require(bitCount == 24, s"only 24-bit DIB frames supported, got $bitCount")
      val stride = ((w * 3 + 3) / 4) * 4
      require(b.length >= stride * h, s"DIB frame too short: ${b.length} < ${stride * h}")
      val data = new Array[Float](w * h * 3)
      var y = 0
      while (y < h) {
        val src = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          val base = (y * w + x) * 3
          data(base)     = (b(src + x * 3 + 2) & 0xff) / 255.0f // R
          data(base + 1) = (b(src + x * 3 + 1) & 0xff) / 255.0f // G
          data(base + 2) = (b(src + x * 3) & 0xff) / 255.0f     // B
          x += 1
        }
        y += 1
      }
      Decoded(w, h, 3, data)
    }

    /** Inverse of [[decodeDib]] — bit-exact for data on the n/255 grid. */
    def encodeDib(d: Decoded): Array[Byte] = {
      require(d.channels == 3, s"DIB frames are 3-channel, got ${d.channels}")
      def q(f: Float): Byte = math.max(0, math.min(255, math.round(f * 255.0f))).toByte
      val stride = ((d.width * 3 + 3) / 4) * 4
      val out = new Array[Byte](stride * d.height)
      var y = 0
      while (y < d.height) {
        val dst = (d.height - 1 - y) * stride
        var x = 0
        while (x < d.width) {
          val base = (y * d.width + x) * 3
          out(dst + x * 3)     = q(d.data(base + 2)) // B
          out(dst + x * 3 + 1) = q(d.data(base + 1)) // G
          out(dst + x * 3 + 2) = q(d.data(base))     // R
          x += 1
        }
        y += 1
      }
      out
    }

    /** One JPEG per frame (the MJPEG convention) via the JDK encoder. */
    def encodeJpegFrame(d: Decoded): Array[Byte] = {
      import java.awt.image.BufferedImage
      require(d.channels == 3, s"MJPEG frames are 3-channel, got ${d.channels}")
      def q(f: Float): Int = math.max(0, math.min(255, math.round(f * 255.0f)))
      val im = new BufferedImage(d.width, d.height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          val base = (y * d.width + x) * 3
          im.setRGB(x, y, (q(d.data(base)) << 16) |
            (q(d.data(base + 1)) << 8) | q(d.data(base + 2)))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", baos)
      baos.toByteArray
    }

    private final class LeOut {
      val bs = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { bs.write(v & 0xff); bs.write((v >> 8) & 0xff) }
      def u32(v: Long): Unit = {
        bs.write((v & 0xff).toInt); bs.write(((v >> 8) & 0xff).toInt)
        bs.write(((v >> 16) & 0xff).toInt); bs.write(((v >> 24) & 0xff).toInt)
      }
      def cc(s: String): Unit =
        bs.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 4)
      def raw(b: Array[Byte]): Unit = bs.write(b, 0, b.length)
      def toBytes: Array[Byte] = bs.toByteArray
    }

    /** Build a standard-layout AVI around pre-encoded frame payloads.
      * `mjpeg=true` → `00dc` chunks + `MJPG` fourcc; false → `00db`
      * uncompressed DIB. Includes a correct `idx1` so stricter players
      * (and our own parser's foreign-file path) both accept it. */
    def build(w: Int, h: Int, fps: Int, mjpeg: Boolean,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      val chunkId = if (mjpeg) "00dc" else "00db"
      val maxSize = if (frames.isEmpty) 0 else frames.map(_.length).max
      val stride = ((w * 3 + 3) / 4) * 4

      val strf = new LeOut // BITMAPINFOHEADER
      strf.u32(40); strf.u32(w); strf.u32(h); strf.u16(1); strf.u16(24)
      if (mjpeg) strf.cc("MJPG") else strf.u32(0)
      strf.u32(stride.toLong * h); strf.u32(0); strf.u32(0); strf.u32(0); strf.u32(0)

      val strh = new LeOut
      strh.cc("vids"); if (mjpeg) strh.cc("MJPG") else strh.u32(0)
      strh.u32(0); strh.u16(0); strh.u16(0); strh.u32(0)
      strh.u32(1); strh.u32(fps) // scale / rate
      strh.u32(0); strh.u32(frames.length); strh.u32(maxSize)
      strh.u32(0xffffffffL); strh.u32(0)
      strh.u16(0); strh.u16(0); strh.u16(w); strh.u16(h)

      val avih = new LeOut
      avih.u32(if (fps > 0) 1000000L / fps else 0)
      avih.u32(0); avih.u32(0); avih.u32(0x10) // AVIF_HASINDEX
      avih.u32(frames.length); avih.u32(0); avih.u32(1); avih.u32(maxSize)
      avih.u32(w); avih.u32(h)
      avih.u32(0); avih.u32(0); avih.u32(0); avih.u32(0)

      val strl = new LeOut
      strl.cc("strl")
      strl.cc("strh"); strl.u32(56); strl.raw(strh.toBytes)
      strl.cc("strf"); strl.u32(40); strl.raw(strf.toBytes)
      val hdrl = new LeOut
      hdrl.cc("hdrl")
      hdrl.cc("avih"); hdrl.u32(56); hdrl.raw(avih.toBytes)
      val strlB = strl.toBytes
      hdrl.cc("LIST"); hdrl.u32(strlB.length); hdrl.raw(strlB)

      val movi = new LeOut
      movi.cc("movi")
      val offsets = frames.map { f =>
        // idx1 offsets are measured from the 'movi' fourcc, which is
        // byte 0 of this buffer
        val off = movi.bs.size()
        movi.cc(chunkId); movi.u32(f.length); movi.raw(f)
        if ((f.length & 1) == 1) movi.bs.write(0)
        off
      }
      val idx1 = new LeOut
      frames.zip(offsets).foreach { case (f, off) =>
        idx1.cc(chunkId); idx1.u32(0x10); idx1.u32(off); idx1.u32(f.length)
      }

      val hdrlB = hdrl.toBytes
      val moviB = movi.toBytes
      val idx1B = idx1.toBytes
      val out = new LeOut
      out.cc("RIFF")
      out.u32(4 + (8 + hdrlB.length) + (8 + moviB.length) + (8 + idx1B.length))
      out.cc("AVI ")
      out.cc("LIST"); out.u32(hdrlB.length); out.raw(hdrlB)
      out.cc("LIST"); out.u32(moviB.length); out.raw(moviB)
      out.cc("idx1"); out.u32(idx1B.length); out.raw(idx1B)
      out.toBytes
    }
  }

  /** Encode a clip (a sequence of same-shaped 3-channel frames) as a
    * real AVI: `mjpeg=true` → MJPEG (`00dc` JPEG frames, the wild
    * format, lossy); false → uncompressed 24-bit DIB (`00db`,
    * bit-exact round trip for data on the n/255 grid — the fixture
    * format). The inverse of [[AviDecoder]]. */
  def encodeAvi(frames: Seq[Decoded], fps: Int = 10, mjpeg: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "encodeAvi needs at least one frame")
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h && f.channels == 3),
      "all frames must be same-shaped and 3-channel")
    val payloads =
      if (mjpeg) frames.map(Avi.encodeJpegFrame)
      else frames.map(Avi.encodeDib)
    Avi.build(w, h, fps, mjpeg, payloads)
  }

  /** Container-level probe (no frame decode): the metadata a video
    * table needs for [[sampleFrames]]' declarative row explosion. */
  def probeAvi(content: Array[Byte]): Map[String, String] = {
    val p = Avi.parse(content)
    Map("n_frames" -> p.nFrames.toString,
      "width" -> p.width.toString, "height" -> p.height.toString)
  }

  /** Fold the [[sampleFrames]] `frame_idx` column into the metadata map
    * so [[AviDecoder]] (whose contract is content+meta only) decodes
    * that frame. Declarative — stays in codegen. */
  def frameIdxIntoMeta(
      df: DataFrame,
      metaCol: String = "meta",
      frameIdxCol: String = "frame_idx"): DataFrame =
    df.withColumn(metaCol, map_concat(col(metaCol),
      map(lit("frame_idx"), col(frameIdxCol).cast("string"))))

  /** Replace each asset's payload with a real multi-frame AVI derived
    * from it (deterministic [[FakeDecoder]] pixels per frame, frame
    * seeds varied by index → [[encodeAvi]]) and merge the probed
    * `n_frames`/`width`/`height` into metadata — the video twin of
    * [[reencodeAsPng]]/[[reencodeAsWav]]: turns any media table into
    * one that exercises the REAL container+codec path end-to-end in an
    * environment with no video testdata. Same mapPartitions shape as
    * decode — no shuffle. */
  def reencodeAsAvi(
      df: DataFrame,
      nFrames: Int,
      mjpeg: Boolean = false,
      contentCol: String = "content",
      metaCol: String = "meta"): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val mIdx = df.columns.indexOf(metaCol)
    df.mapPartitions { it =>
      it.map { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        if (content == null) row
        else {
          val meta = Option(row.getMap[String, String](mIdx))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          val base = meta ++ Map("channels" -> "3")
          val frames = (0 until nFrames).map { f =>
            // vary the per-frame seed through the content so frames differ
            FakeDecoder.decode(content :+ f.toByte, base)
          }
          val avi = encodeAvi(frames, mjpeg = mjpeg)
          val newMeta = meta ++ probeAvi(avi)
          Row.fromSeq(row.toSeq
            .updated(cIdx, avi)
            .updated(mIdx, newMeta))
        }
      }
    }(Encoders.row(schema))
  }

  /** Encode a decoded audio buffer ([[WavDecoder]] conventions:
    * interleaved [-1, 1] floats) as real 16-bit PCM WAV bytes — the
    * audio inverse, for fixture generation and in-query re-encoding.
    * Bit-exact round trip for samples on the n/32768 grid. */
  def encodeWav(d: Decoded, sampleRate: Float = 16000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    require(d.height == 1, s"audio buffers are 1-high (frames × channels), got height ${d.height}")
    val pcm = new Array[Byte](d.data.length * 2)
    var i = 0
    while (i < d.data.length) {
      val s = math.max(-32768, math.min(32767, math.round(d.data(i) * 32768.0f)))
      pcm(2 * i) = (s & 0xff).toByte         // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate, 16,
      d.channels, 2 * d.channels, sampleRate, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, d.width.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Encode a decoded buffer as real PNG bytes (lossless; values
    * quantized to 8 bits). The inverse of [[ImageIoDecoder]] for 1/3/4
    * channels — fixture generation and in-query re-encoding both use it,
    * and the round trip is bit-exact for data already on the n/255
    * grid. */
  def encodePng(d: Decoded): Array[Byte] = {
    import java.awt.image.BufferedImage
    require(Set(1, 3, 4).contains(d.channels),
      s"encodePng supports 1/3/4 channels, got ${d.channels}")
    def q(f: Float): Int = math.max(0, math.min(255, math.round(f * 255.0f)))
    val img = d.channels match {
      case 1 =>
        val im = new BufferedImage(d.width, d.height, BufferedImage.TYPE_BYTE_GRAY)
        val raster = im.getRaster
        var y = 0
        while (y < d.height) {
          var x = 0
          while (x < d.width) {
            raster.setSample(x, y, 0, q(d.data(y * d.width + x)))
            x += 1
          }
          y += 1
        }
        im
      case n =>
        val t = if (n == 4) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB
        val im = new BufferedImage(d.width, d.height, t)
        var y = 0
        while (y < d.height) {
          var x = 0
          while (x < d.width) {
            val base = (y * d.width + x) * n
            val a = if (n == 4) q(d.data(base + 3)) else 0xff
            im.setRGB(x, y, (a << 24) | (q(d.data(base)) << 16) |
              (q(d.data(base + 1)) << 8) | q(d.data(base + 2)))
            x += 1
          }
          y += 1
        }
        im
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Replace each asset's payload with real PNG bytes derived from it
    * (deterministic [[FakeDecoder]] pixels → [[encodePng]]). Test/demo
    * plumbing: turns any media table into one that exercises the REAL
    * codec path end-to-end in an environment with no image testdata.
    * Same mapPartitions shape as decode — no shuffle. */
  def reencodeAsPng(
      df: DataFrame,
      contentCol: String = "content",
      metaCol: String = "meta"): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val mIdx = df.columns.indexOf(metaCol)
    df.mapPartitions { it =>
      it.map { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        if (content == null) row
        else {
          val meta = Option(row.getMap[String, String](mIdx))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          Row.fromSeq(row.toSeq.updated(cIdx, encodePng(FakeDecoder.decode(content, meta))))
        }
      }
    }(Encoders.row(schema))
  }

  /** Replace each asset's payload with real 16-bit PCM WAV bytes
    * derived from it (deterministic [[FakeDecoder]] values → mono PCM →
    * [[encodeWav]]) — the audio twin of [[reencodeAsPng]]: turns any
    * media table into one that exercises the REAL audio codec
    * end-to-end in an environment with no audio testdata. Same
    * mapPartitions shape as decode — no shuffle. */
  def reencodeAsWav(
      df: DataFrame,
      contentCol: String = "content",
      metaCol: String = "meta"): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val mIdx = df.columns.indexOf(metaCol)
    df.mapPartitions { it =>
      it.map { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        if (content == null) row
        else {
          val meta = Option(row.getMap[String, String](mIdx))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          val d = FakeDecoder.decode(content, meta)
          // fake values are [0,1) frames×1×channels — reinterpret as a
          // mono sample stream (any [-1,1] payload is valid PCM)
          val audio = Decoded(d.data.length, 1, 1, d.data)
          Row.fromSeq(row.toSeq.updated(cIdx, encodeWav(audio)))
        }
      }
    }(Encoders.row(schema))
  }

  /** Output schema of `decodeAndFeaturize` — explicit, never inferred.
    * `synthetic_decode` is the honesty flag: true iff the decoder is a
    * stand-in ([[FakeDecoder]] — fixture-only since all three
    * modalities gained real codecs), so stand-in features can never
    * silently pass as real ones downstream. */
  def decodedSchema(idCol: String, idType: DataType): StructType = StructType(Seq(
    StructField(idCol, idType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("synthetic_decode", BooleanType, nullable = false)))

  /** Batched executor-side decode + mean-pool featurization: the
    * multimodal analog of the batched scorer (same mapPartitions shape,
    * reference `core.py:107`). `featureDim` mean-pools the decoded
    * buffer into a fixed-length embedding so downstream similarity ops
    * (graft.llm.Similarity) apply unchanged. */
  def decodeAndFeaturize(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      featureDim: Int = 16,
      batchSize: Int = 64): DataFrame = {
    val idType = df.schema(idCol).dataType
    val schema = decodedSchema(idCol, idType)
    val (idIdx, cIdx, mIdx) =
      (df.columns.indexOf(idCol), df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) None // null assets are skipped, not decoded
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            val d = decoder.decode(content, meta)
            Some(Row(row.get(idIdx), d.width, d.height, d.channels,
              meanPool(d.data, featureDim).toSeq, decoder.synthetic))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Mean-pool an arbitrary-length buffer into `dim` buckets. */
  private[graft] def meanPool(data: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (data.isEmpty) return out
    val counts = new Array[Int](dim)
    var i = 0
    while (i < data.length) {
      val b = (i.toLong * dim / data.length).toInt
      out(b) += data(i); counts(b) += 1
      i += 1
    }
    var b = 0
    while (b < dim) { if (counts(b) > 0) out(b) /= counts(b); b += 1 }
    out
  }

  /** Grayscale plane of a decoded image: ITU-R BT.601 luma
    * (0.299 R + 0.587 G + 0.114 B) for 3/4-channel buffers, the raw
    * plane for 1-channel — the standard perceptual-hash preprocessing
    * step. */
  private[graft] def toGray(d: Decoded): Decoded = {
    if (d.channels == 1) return d
    require(d.channels >= 3, s"toGray needs 1/3/4 channels, got ${d.channels}")
    val out = new Array[Float](d.width * d.height)
    var p = 0
    while (p < out.length) {
      val base = p * d.channels
      out(p) = 0.299f * d.data(base) + 0.587f * d.data(base + 1) +
        0.114f * d.data(base + 2)
      p += 1
    }
    Decoded(d.width, d.height, 1, out)
  }

  /** 64-bit DIFFERENCE HASH (dHash — the published perceptual-hash
    * family's gradient variant): grayscale → nearest-neighbor resize to
    * 9×8 → each bit = "left pixel brighter than its right neighbor",
    * row-major MSB-first. Two renderings of the same picture (PNG vs
    * JPEG vs DIB, or a rescale) land within a few Hamming bits;
    * unrelated pictures differ in ~32. Published limitation: NOT robust
    * to crops, rotations, or mirrors. Deterministic — same pixels, same
    * hash, any decoder. */
  def dHash64(d: Decoded): Long = {
    val g = resize(toGray(d), 9, 8).data
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        h = (h << 1) | (if (g(y * 9 + x) > g(y * 9 + x + 1)) 1L else 0L)
        x += 1
      }
      y += 1
    }
    h
  }

  /** 32-point DCT-II basis, precomputed once: `DctCos(u)(x) =
    * cos((2x+1)uπ/64)`. */
  private val DctCos: Array[Array[Double]] = Array.tabulate(32, 32) {
    (u, x) => math.cos((2 * x + 1) * u * math.Pi / 64.0)
  }

  /** 64-bit DCT PERCEPTUAL HASH (pHash — the published DCT variant of
    * the perceptual-hash family): grayscale → resize to 32×32 → 2-D
    * DCT-II → the top-left 8×8 low-frequency block → each bit =
    * "coefficient above the mean of the block's 63 AC coefficients"
    * (the DC term is excluded from the mean, so its own bit is
    * constant 1), row-major MSB-first.
    *
    * Envelope vs [[dHash64]] ([[graft.tools.MediaEnvelopeProbe]], 500
    * seeds, quoted in DESIGN): on the photo-like [[texturedImage]]
    * family, blur+JPEG-q30 twins read dHash up to 10 bits with
    * strangers at 10 — NO dHash radius separates — while pHash holds
    * twins ≤ 8 (mean 0.7) against strangers ≥ 13: low-frequency DCT
    * signs are what JPEG itself preserves, while dHash's 8×9 pixel
    * gradients wash out. The tier is CORPUS-DEPENDENT, not strictly
    * wider: on the single-sinusoid [[smoothImage]]/[[smoothImageAsym]]
    * plates every seed concentrates on one frequency bin, the AC sign
    * pattern collapses, and cross-seed pHash collides at 0 bits (the
    * probe's measured negative result) — MediaDedup's calibrate mode
    * is the per-corpus arbiter. Exact invariance laws
    * (property-tested): brightness shift and positive contrast scaling
    * leave every AC sign relation unchanged → hash-identical (modulo
    * pixel clipping). Like dHash: NOT robust to crops/rotations
    * (compose with the tile and dihedral tiers, which share the
    * banded engine). */
  def pHash64(d: Decoded): Long = {
    val g = resize(toGray(d), 32, 32).data
    // row DCT then column DCT (separable); only the first 8 output
    // frequencies of each pass are consumed downstream, but the row
    // pass feeds all 32 columns, so compute rows fully
    val rows = new Array[Double](32 * 32)
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 32) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += g(y * 32 + x) * DctCos(u)(x); x += 1 }
        rows(y * 32 + u) = s
        u += 1
      }
      y += 1
    }
    val block = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += rows(yy * 32 + u) * DctCos(v)(yy); yy += 1 }
        block(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    var mean = 0.0
    var i = 1
    while (i < 64) { mean += block(i); i += 1 }
    mean /= 63.0
    var h = 0L
    i = 0
    while (i < 64) { h = (h << 1) | (if (block(i) > mean) 1L else 0L); i += 1 }
    h
  }

  /** 64-point DCT-II basis for the wide kernel: `DctCos64(u)(x) =
    * cos((2x+1)uπ/128)`. */
  private val DctCos64: Array[Array[Double]] = Array.tabulate(64, 64) {
    (u, x) => math.cos((2 * x + 1) * u * math.Pi / 128.0)
  }

  /** 256-bit DCT PERCEPTUAL HASH — [[pHash64]]'s natural wide
    * extension (the round-14 verdict's prescribed remedy for corpora
    * past ~10^8 assets): grayscale → 64×64 → 2-D DCT-II → the
    * top-left 16×16 low-frequency block (256 coefficients, DC
    * excluded from the 255-AC mean), packed row-major MSB-first into
    * 4 longs (word w carries coefficients 64w…64w+63). The FREQUENCY
    * RATIO is pHash64's, not just the block size: 16 of 64
    * frequencies = the same bottom quarter-band as 8 of 32, i.e. ≤7.5
    * cycles/image — under 1 cycle per JPEG 8×8 block at this
    * resolution, which is the band JPEG itself preserves. (A 16×16
    * block read from the 32×32 DCT was MEASURED and rejected —
    * MediaEnvelopeProbe: its upper half-band signs are
    * re-quantization noise, twin distances blow past 100 bits.)
    * Quadrupled sign evidence is what lets the wide banded engine
    * carve SIXTEEN 16-bit bands — radius 15 at probe 0 / 31 at probe
    * 1 with bucket keys the hot-bucket guard still discriminates at
    * 10^9 assets (PerfProbe 20 measures any legal 64-bit geometry
    * saturating on the same corpus). Shares [[pHash64]]'s exact
    * invariance laws (brightness shift, positive contrast scale —
    * property-tested) and its published limitation (not crop/rotation
    * robust). Like every kernel here it is CORPUS-DEPENDENT: on
    * spectrum-poor plates (everything above ~4 cycles empty) the
    * upper block is noise and the 64-bit kernel is the honest choice
    * — the envelope probe records that negative; calibrate mode is
    * the per-corpus arbiter. */
  def pHash256(d: Decoded): Array[Long] = {
    val g = resize(toGray(d), 64, 64).data
    val rows = new Array[Double](64 * 64)
    var y = 0
    while (y < 64) {
      var u = 0
      while (u < 64) {
        var s = 0.0
        var x = 0
        while (x < 64) { s += g(y * 64 + x) * DctCos64(u)(x); x += 1 }
        rows(y * 64 + u) = s
        u += 1
      }
      y += 1
    }
    val block = new Array[Double](256)
    var v = 0
    while (v < 16) {
      var u = 0
      while (u < 16) {
        var s = 0.0
        var yy = 0
        while (yy < 64) { s += rows(yy * 64 + u) * DctCos64(v)(yy); yy += 1 }
        block(v * 16 + u) = s
        u += 1
      }
      v += 1
    }
    var mean = 0.0
    var i = 1
    while (i < 256) { mean += block(i); i += 1 }
    mean /= 255.0
    val sig = new Array[Long](4)
    i = 0
    while (i < 256) {
      sig(i >> 6) = (sig(i >> 6) << 1) | (if (block(i) > mean) 1L else 0L)
      i += 1
    }
    sig
  }

  /** 3×3 box blur with edge clamping — the degradation kernel of the
    * pHash fixture family (and the round-13 envelope probe). */
  private[graft] def boxBlur3(d: Decoded): Decoded = {
    val out = new Array[Float](d.data.length)
    val (w, h, c) = (d.width, d.height, d.channels)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var ch = 0
        while (ch < c) {
          var sum = 0.0f; var n = 0
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              val yy = y + dy; val xx = x + dx
              if (yy >= 0 && yy < h && xx >= 0 && xx < w) {
                sum += d.data((yy * w + xx) * c + ch); n += 1
              }
              dx += 1
            }
            dy += 1
          }
          out((y * w + x) * c + ch) = sum / n
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    Decoded(w, h, c, out)
  }

  /** JPEG bytes at an EXPLICIT quality — the fixture/probe encoder for
    * re-quantization twins harsher than the JDK default (~0.75). */
  private[graft] def jpegBytesAtQuality(d: Decoded, quality: Float): Array[Byte] = {
    import java.awt.image.BufferedImage
    def q(f: Float): Int = math.max(0, math.min(255, math.round(f * 255.0f)))
    val gray = d.channels == 1
    val im = new BufferedImage(d.width, d.height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        val base = (y * d.width + x) * d.channels
        val (r, gg, b) =
          if (gray) (q(d.data(base)), q(d.data(base)), q(d.data(base)))
          else (q(d.data(base)), q(d.data(base + 1)), q(d.data(base + 2)))
        im.setRGB(x, y, (r << 16) | (gg << 8) | b)
        x += 1
      }
      y += 1
    }
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(im, null, null), p)
    w.dispose(); ios.close()
    baos.toByteArray
  }

  /** Deterministic TEXTURED test image for a seed: the 8×8
    * low-frequency DCT block is drawn seed-random — independent sign
    * and magnitude per AC coefficient, decaying `1/(1+u+v)` like a
    * natural spectrum — then synthesized onto `w×h` via the inverse
    * DCT and min-max normalized to [0,1]. The [[smoothImage]] family
    * (one sinusoid) is JPEG's representative case but DEGENERATE for a
    * DCT hash: every seed concentrates on ONE low-frequency bin, so
    * the 63-AC-sign pattern barely varies by seed (the round-13
    * envelope probe measured cross-seed [[pHash64]] collisions at 0
    * bits on both plate families). This family gives each seed an
    * essentially independent 63-bit AC sign vector — the photo-like
    * regime a DCT perceptual hash actually operates in. Normalization
    * is a positive affine map, which [[pHash64]] is invariant to by
    * construction, so the planted signs survive rendering. Grayscale
    * written to all three channels. */
  def texturedImage(seed: Long, w: Int = 32, h: Int = 32): Decoded = {
    // splitmix64 stream: one draw per AC coefficient so sequential
    // seeds give decorrelated sign vectors, not neighbors
    var z = seed
    def next(): Long = {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val amp = new Array[Double](64)
    var i = 1
    while (i < 64) {
      val u = i % 8; val v = i / 8
      val r = next()
      val sign = if ((r & 1L) == 0L) -1.0 else 1.0
      // magnitude bounded away from zero (0.55..1.0) so no planted
      // sign sits within rendering-quantization noise of the flip point
      val mag = 0.55 + 0.45 * (((r >>> 1) & 1023L).toDouble / 1023.0)
      amp(i) = sign * mag / (1.0 + u + v)
      i += 1
    }
    val cx = Array.tabulate(8, w)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * w)))
    val cy = Array.tabulate(8, h)((v, y) =>
      math.cos((2 * y + 1) * v * math.Pi / (2.0 * h)))
    val raw = new Array[Double](w * h)
    var mn = Double.MaxValue; var mx = Double.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val a = amp(v * 8 + u)
            if (a != 0.0) s += a * cx(u)(x) * cy(v)(y)
            u += 1
          }
          v += 1
        }
        raw(y * w + x) = s
        if (s < mn) mn = s
        if (s > mx) mx = s
        x += 1
      }
      y += 1
    }
    val span = if (mx > mn) mx - mn else 1.0
    val data = new Array[Float](w * h * 3)
    var p = 0
    while (p < w * h) {
      val fv = ((raw(p) - mn) / span).toFloat
      data(p * 3) = fv; data(p * 3 + 1) = fv; data(p * 3 + 2) = fv
      p += 1
    }
    Decoded(w, h, 3, data)
  }

  /** [[texturedImage]]'s WIDE-SPECTRUM sibling — the [[pHash256]]
    * fixture family: a seed-random 16×16 low-frequency block (255
    * independent AC signs, decay 1/(1+u+v), same splitmix draw-per-
    * coefficient stream and min-max rendering) synthesized onto
    * `w×h` (default 64×64). The 8×8-spectrum [[texturedImage]] plates
    * are DEGENERATE for the wide kernel — everything above 3.5
    * cycles/image is empty, so the upper three quarters of the 16×16
    * sign block is rendering noise (the envelope probe records that
    * negative) — exactly as the single-sinusoid plates are degenerate
    * for [[pHash64]]. This family populates the full quarter-band the
    * wide kernel reads, the photo-like regime it operates in. */
  def texturedImageWide(seed: Long, w: Int = 64, h: Int = 64): Decoded = {
    var z = seed
    def next(): Long = {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val amp = new Array[Double](256)
    var i = 1
    while (i < 256) {
      val u = i % 16; val v = i / 16
      val r = next()
      val sign = if ((r & 1L) == 0L) -1.0 else 1.0
      val mag = 0.55 + 0.45 * (((r >>> 1) & 1023L).toDouble / 1023.0)
      amp(i) = sign * mag / (1.0 + u + v)
      i += 1
    }
    val cx = Array.tabulate(16, w)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * w)))
    val cy = Array.tabulate(16, h)((v, y) =>
      math.cos((2 * y + 1) * v * math.Pi / (2.0 * h)))
    val raw = new Array[Double](w * h)
    var mn = Double.MaxValue; var mx = Double.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0.0
        var v = 0
        while (v < 16) {
          var u = 0
          while (u < 16) {
            val a = amp(v * 16 + u)
            if (a != 0.0) s += a * cx(u)(x) * cy(v)(y)
            u += 1
          }
          v += 1
        }
        raw(y * w + x) = s
        if (s < mn) mn = s
        if (s > mx) mx = s
        x += 1
      }
      y += 1
    }
    val span = if (mx > mn) mx - mn else 1.0
    val data = new Array[Float](w * h * 3)
    var p = 0
    while (p < w * h) {
      val fv = ((raw(p) - mn) / span).toFloat
      data(p * 3) = fv; data(p * 3 + 1) = fv; data(p * 3 + 2) = fv
      p += 1
    }
    Decoded(w, h, 3, data)
  }

  /** Replace each asset's payload with a real PNG rendering of the
    * deterministic TEXTURED plate keyed by `seedCol` — the base corpus
    * of the DCT-tier fixture family (same mapPartitions shape as
    * [[reencodeAsSmoothImage]], no shuffle). */
  def reencodeAsTexturedImage(
      df: DataFrame,
      seedCol: String = "asset_id",
      contentCol: String = "content",
      w: Int = 32,
      h: Int = 32): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = encodePng(texturedImage(row.getLong(sIdx), w, h))
        Row.fromSeq(row.toSeq.updated(cIdx, bytes))
      }
    }(Encoders.row(schema))
  }

  /** Replace each asset's payload with a DEGRADED rendering of its
    * seed's textured plate: 3×3 box blur, then JPEG at `quality` — the
    * blur+re-quantization twin OUTSIDE [[dHash64]]'s envelope that the
    * DCT tier exists for (q144's fixture). */
  def reencodeAsTexturedImageDegraded(
      df: DataFrame,
      quality: Float = 0.3f,
      seedCol: String = "asset_id",
      contentCol: String = "content",
      w: Int = 32,
      h: Int = 32): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = jpegBytesAtQuality(
          boxBlur3(texturedImage(row.getLong(sIdx), w, h)), quality)
        Row.fromSeq(row.toSeq.updated(cIdx, bytes))
      }
    }(Encoders.row(schema))
  }

  /** [[reencodeAsTexturedImage]] on the WIDE-SPECTRUM plate family
    * ([[texturedImageWide]], 64×64 / 16×16 planted block) — the
    * pHash256 tier's fixture corpus (q147). */
  def reencodeAsTexturedImageWide(
      df: DataFrame,
      seedCol: String = "asset_id",
      contentCol: String = "content"): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = encodePng(texturedImageWide(row.getLong(sIdx)))
        Row.fromSeq(row.toSeq.updated(cIdx, bytes))
      }
    }(Encoders.row(schema))
  }

  /** [[reencodeAsTexturedImageDegraded]] on the wide-spectrum family:
    * blur + JPEG at `quality` of the seed's [[texturedImageWide]]
    * plate — the degraded twin inside pHash256's measured radius-15
    * envelope (probe: twin max 10, stranger min 98 at 150 seeds). */
  def reencodeAsTexturedImageWideDegraded(
      df: DataFrame,
      quality: Float = 0.3f,
      seedCol: String = "asset_id",
      contentCol: String = "content"): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = jpegBytesAtQuality(
          boxBlur3(texturedImageWide(row.getLong(sIdx))), quality)
        Row.fromSeq(row.toSeq.updated(cIdx, bytes))
      }
    }(Encoders.row(schema))
  }

  /** Per-asset perceptual hashes `(id, sig)` — the image analog of
    * [[graft.llm.Dedup.simHashSignatures]], and like them the per-run
    * STATE an incremental pipeline persists. Same batched mapPartitions
    * decode shape as [[decodeAndFeaturize]]; null assets are skipped. */
  def perceptualHashes(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame =
    scalarImageHashes(df, decoder, idCol, contentCol, metaCol, batchSize)(dHash64)

  /** Per-asset DCT hashes `(id, sig)` — [[perceptualHashes]] with
    * [[pHash64]] as the kernel: the blur/re-quantization-robust scalar
    * state frame (NOT comparable to dHash state — the MediaDedup
    * fingerprint line keeps the lineages apart). */
  def dctHashes(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame =
    scalarImageHashes(df, decoder, idCol, contentCol, metaCol, batchSize)(pHash64)

  /** WIDE (256-bit) DCT signature frame `(id, sig: array<long>)` — the
    * [[pHash256]] state the wide banded engine
    * ([[graft.llm.Dedup.wideSigNearDups]]) consumes: one decode pass,
    * 32 B/signature, same mapPartitions shape as [[dctHashes]]. */
  def dctHashesWide(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame = {
    val idType = df.schema(idCol).dataType
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
    val (idIdx, cIdx, mIdx) =
      (df.columns.indexOf(idCol), df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
    // fanned out (r15, measured 0.72x on q147): the 64x64 decode +
    // 32x32 DCT per row is the heavy pass
    val in0 = graft.operators.Ops.fanOutForCompute(df)
    in0.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) None
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            Some(Row(row.get(idIdx), pHash256(decoder.decode(content, meta)).toSeq))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Image near-dup pairs under the WIDE DCT hash —
    * [[imageNearDupsDct]] on [[pHash256]] signatures through
    * [[graft.llm.Dedup.wideSigNearDups]]: sixteen 16-bit bands cover
    * radius 15 at probe 0 (vs the 64-bit tier's radius-7-at-probe-1
    * ceiling), and the guard keeps discriminating at corpus sizes
    * where ANY legal 64-bit geometry saturates (PerfProbe 20). */
  def imageNearDupsDctWide(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      maxHamming: Int = 15,
      bands: Int = 16,
      maxBucketSize: Int = 10000,
      probe: Int = 0): DataFrame =
    graft.llm.Dedup.wideSigNearDups(
      dctHashesWide(df, decoder, idCol, contentCol, metaCol),
      maxHamming, bands, maxBucketSize, probe, sigBits = 256)

  private def scalarImageHashes(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String,
      contentCol: String,
      metaCol: String,
      batchSize: Int)(hash: Decoded => Long): DataFrame = {
    val idType = df.schema(idCol).dataType
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val (idIdx, cIdx, mIdx) =
      (df.columns.indexOf(idCol), df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) None
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            Some(Row(row.get(idIdx), hash(decoder.decode(content, meta))))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Image near-dup pairs under the DCT hash — [[imageNearDups]] with
    * [[pHash64]]: the heavy-blur / re-quantization tier (q144), same
    * banded engine, never all-pairs. Defaults carry the envelope
    * probe's margins (twins ≤ 8, strangers ≥ 13 on the textured
    * family): radius 7 over 4 bands of 16 bits with a Hamming-≤1
    * MULTI-PROBE per band key (pigeonhole: 7 differing bits over 4
    * bands leave some band with ≤ 1, which the probe reaches). The
    * probed geometry replaced round-13's 8-band form, whose 8-bit
    * bucket keys (256 possible buckets per band) saturated the
    * hot-bucket guard beyond ~2.5 M images and silently lost all
    * recall (PerfProbe 19 measures both). Bucket keys here stay
    * 65,536-valued — the guard discriminates at corpus scale — at a
    * ×17 candidate multiplier; when a corpus's degradations allow a
    * radius ≤ 3 (JPEG-only twins measure ≤ 4), the unprobed radius-3
    * geometry is cheaper — let calibrate mode prove the envelope. */
  def imageNearDupsDct(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      maxHamming: Int = 7,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      probe: Int = 1): DataFrame =
    graft.llm.Dedup.sigNearDups(
      dctHashes(df, decoder, idCol, contentCol, metaCol),
      maxHamming, bands, maxBucketSize, probe)

  /** Image NEAR-DUPLICATE pairs within `maxHamming` dHash bits — the
    * multimodal entry into the shared banded near-dup engine
    * ([[graft.llm.Dedup.sigNearDups]]): decode → dHash (one
    * mapPartitions pass, no shuffle) → banded self-join (never
    * all-pairs, hot-bucket-guarded). Catches re-encodes (PNG ↔ JPEG ↔
    * DIB), recompressions, and rescales of the same picture; crops and
    * rotations are outside dHash's published envelope. Returns
    * `(id1, id2, hamming)`. */
  def imageNearDups(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000): DataFrame =
    graft.llm.Dedup.sigNearDups(
      perceptualHashes(df, decoder, idCol, contentCol, metaCol),
      maxHamming, bands, maxBucketSize)

  /** Crop a rectangular pixel region out of a decoded frame. */
  private[graft] def cropRegion(d: Decoded, x0: Int, y0: Int, w: Int, h: Int): Decoded = {
    require(x0 >= 0 && y0 >= 0 && x0 + w <= d.width && y0 + h <= d.height,
      s"crop ($x0,$y0,$w,$h) outside ${d.width}x${d.height}")
    val out = new Array[Float](w * h * d.channels)
    var y = 0
    while (y < h) {
      System.arraycopy(d.data, ((y0 + y) * d.width + x0) * d.channels,
        out, y * w * d.channels, w * d.channels)
      y += 1
    }
    Decoded(w, h, d.channels, out)
  }

  /** The ten tile regions of a w×h frame: 0 = full, 1–4 = quadrants
    * (TL/TR/BL/BR), 5 = the center half (the middle 50% per axis),
    * 6–9 = the QUADRANTS OF the center half. Fixed geometry is part of
    * the signature contract — tile hashes only compare within one
    * region table. Tiles 5–9 are the "as-original" witnesses of the
    * center-crop hypothesis; tiles 0–4 the "as-crop" side (a center
    * crop's full frame and quadrants are pixel-for-pixel the
    * original's tiles 5 and 6–9). */
  private[graft] def tileRegions(w: Int, h: Int): Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, w, h),
    (0, 0, w / 2, h / 2),
    (w / 2, 0, w - w / 2, h / 2),
    (0, h / 2, w / 2, h - h / 2),
    (w / 2, h / 2, w - w / 2, h - h / 2),
    (w / 4, h / 4, w / 2, h / 2),
    (w / 4, h / 4, w / 4, h / 4),
    (w / 2, h / 4, w / 4, h / 4),
    (w / 4, h / 2, w / 4, h / 4),
    (w / 2, h / 2, w / 4, h / 4))

  /** Per-(image, tile) dHashes `(id, tile_idx, sig)` over the
    * [[tileRegions]] layout — the CROP-tolerant image tier's state
    * frame: one decode pass, ten fixed-region hashes per asset, still
    * 8 B/signature. Tile hashes are NOT comparable tile-blind (small
    * smooth regions collide across unrelated images — the margins
    * probe in MultimodalSpec measures it); [[centerCropNearDups]]
    * compares them slot-ALIGNED under the crop hypothesis only. */
  def tileHashes(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame = {
    val idType = df.schema(idCol).dataType
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("tile_idx", IntegerType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val (idIdx, cIdx, mIdx) =
      (df.columns.indexOf(idCol), df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) Seq.empty[Row]
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            val d = decoder.decode(content, meta)
            tileRegions(d.width, d.height).zipWithIndex.map {
              case ((x0, y0, w, h), t) =>
                Row(row.get(idIdx), t, dHash64(cropRegion(d, x0, y0, w, h)))
            }
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** CENTER-CROP near-dup — the crop-hypothesis SLOT-ALIGNED banded
    * join: asset B is a center crop of asset A when B's full frame and
    * quadrants (tiles 0–4) match A's center-half and ITS quadrants
    * (tiles 5–9) slot for slot. A true crop witnesses ALL FIVE slots
    * (at Hamming 0 on re-rendered crops — the geometry is exact), while
    * unrelated images collide on AT MOST THREE even at radius 3 (small
    * smooth patches are low-entropy, so single- and even triple-slot
    * collisions between strangers are real — measured in the
    * MultimodalSpec margins probe; this is why tile-BLIND matching is
    * deliberately not offered). `minSlots = 4` therefore separates
    * with a slot of margin on both sides: one witness may be lost to
    * rescale/quantization drift, and strangers stay a slot below the
    * gate. Returns `(orig_id, crop_id, n_slots_matched, max_hamming)`;
    * envelope: 50%-per-axis center crops (the remove-borders/watermark
    * case) — quadrant or arbitrary-offset crops land one witness at
    * most and stay below the gate. */
  def centerCropNearDups(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      minSlots: Int = 4,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000): DataFrame =
    centerCropNearDupsFromSigs(tileHashes(df, decoder, idCol, contentCol, metaCol),
      minSlots, maxHamming, bands, maxBucketSize)

  /** [[centerCropNearDups]] over an existing TILE state frame
    * `(id, tile_idx, sig)` — the one-decode-pass CLI shape (tiles are
    * also what the incremental tier persists). */
  def centerCropNearDupsFromSigs(
      tiles: DataFrame,
      minSlots: Int = 4,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming < bands ($maxHamming >= $bands misses pairs)")
    def slotted(t: DataFrame, base: Int) = graft.llm.Dedup.dropHotBuckets(
      graft.llm.Dedup.bandSignatures(
        t.select(struct(col("id").as("aid"),
          (col("tile_idx") - base).as("slot")).as("id"), col("sig")), bands),
      maxBucketSize)
    val orig = slotted(tiles.filter(col("tile_idx") >= 5), 5)
      .select(col("band"), col("bits"), col("id.aid").as("orig_id"),
        col("id.slot").as("slot"), col("sig").as("sig1"))
    val crop = slotted(tiles.filter(col("tile_idx") <= 4), 0)
      .select(col("band"), col("bits"), col("id.aid").as("crop_id"),
        col("id.slot").as("slot"), col("sig").as("sig2"))
    orig.join(crop, Seq("band", "bits", "slot"))
      .filter(col("orig_id") =!= col("crop_id"))
      .select(col("orig_id"), col("crop_id"), col("slot"),
        graft.llm.Dedup.hamming(col("sig1"), col("sig2")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .groupBy(col("orig_id"), col("crop_id"))
      .agg(count(lit(1)).as("n_slots_matched"), max(col("hamming")).as("max_hamming"))
      .filter(col("n_slots_matched") >= minSlots)
  }

  /** Batch-vs-corpus form of [[centerCropNearDups]] over persisted TILE
    * state `(id, tile_idx, sig)` — the incremental crop tier: a batch
    * asset hits when it is a center crop of stored content
    * (`direction = "batch_is_crop"`) OR stored content is a crop of it
    * (`"corpus_is_crop"` — the original arriving after its crop). Two
    * slot-aligned banded joins, unioned with the direction tag;
    * `corpusHotBuckets` is the persisted (band, bits) hot-key table
    * (counted over ALL tiles — conservative for either slot subset).
    * Returns `(batch_id, corpus_id, direction, n_slots_matched,
    * max_hamming)`. */
  def centerCropNearDupsAgainst(
      batchTiles: DataFrame,
      corpusTiles: DataFrame,
      minSlots: Int = 4,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming < bands ($maxHamming >= $bands misses pairs)")
    def slotted(t: DataFrame, base: Int, hot: Option[DataFrame]) =
      graft.llm.Dedup.dropHotBuckets(
        graft.llm.Dedup.bandSignatures(
          t.select(struct(col("id").as("aid"),
            (col("tile_idx") - base).as("slot")).as("id"), col("sig")), bands),
        maxBucketSize, hot)
    def side(t: DataFrame, base: Int, idName: String, sigName: String,
        hot: Option[DataFrame]) =
      slotted(t.filter(if (base == 5) col("tile_idx") >= 5 else col("tile_idx") <= 4),
          base, hot)
        .select(col("band"), col("bits"), col("id.aid").as(idName),
          col("id.slot").as("slot"), col("sig").as(sigName))
    def direction(inner: DataFrame, outer: DataFrame, tag: String) =
      inner.join(outer, Seq("band", "bits", "slot"))
        .select(col("batch_id"), col("corpus_id"), col("slot"),
          graft.llm.Dedup.hamming(col("__bsig"), col("__csig")).as("hamming"))
        .filter(col("hamming") <= maxHamming)
        .distinct()
        .groupBy(col("batch_id"), col("corpus_id"))
        .agg(count(lit(1)).as("n_slots_matched"), max(col("hamming")).as("max_hamming"))
        .filter(col("n_slots_matched") >= minSlots)
        .withColumn("direction", lit(tag))
    // batch is the crop: batch tiles 0-4 vs corpus tiles 5-9
    val a = direction(
      side(corpusTiles, 5, "corpus_id", "__csig", corpusHotBuckets),
      side(batchTiles, 0, "batch_id", "__bsig", None), "batch_is_crop")
    // corpus is the crop: batch tiles 5-9 vs corpus tiles 0-4
    val b = direction(
      side(corpusTiles, 0, "corpus_id", "__csig", corpusHotBuckets),
      side(batchTiles, 5, "batch_id", "__bsig", None), "corpus_is_crop")
    a.unionByName(b)
      .select(col("batch_id"), col("corpus_id"), col("direction"),
        col("n_slots_matched"), col("max_hamming"))
  }

  /** 64-bit AUDIO fingerprint (the Haitsma–Kalman/Philips robust-hash
    * bit derivation, reimplemented from the published description over
    * a compact 9×8 energy grid): mono-mix → 9 equal time windows → 8
    * Goertzel band energies per window (bins k=1..8 relative to the
    * window, so the grid is sample-rate/duration RELATIVE) → each bit
    * is the SIGN of the band-energy change between consecutive windows
    * (8 bands × 8 transitions, row-major MSB-first). Invariances by
    * construction: volume scaling (all energies scale by c², sign of
    * differences unchanged), re-quantization (16-bit PCM wobble is far
    * below band-energy contrasts), container re-encode. NOT robust to
    * trims/offsets (published limitation of the un-windowed form).
    * Buffer convention: [[WavDecoder]]'s (width = frame count,
    * interleaved [-1,1] channels). */
  def audioHash64(d: Decoded): Long = {
    val e = bandEnergies(d)
    val T = e.length
    val F = e(0).length
    var h = 0L
    var t = 0
    while (t < T - 1) {
      var f = 0
      while (f < F) {
        h = (h << 1) | (if (e(t + 1)(f) > e(t)(f)) 1L else 0L)
        f += 1
      }
      t += 1
    }
    h
  }

  /** The 9×8 Goertzel band-energy grid [[audioHash64]] derives its bits
    * from — also the verification EVIDENCE ([[verifyAudioPairs]]):
    * mono-mix → 9 equal time windows → 8 band energies each (bins
    * k = 1..8 relative to the window, so the grid is sample-rate/
    * duration RELATIVE). */
  private[graft] def bandEnergies(d: Decoded): Array[Array[Double]] = {
    val n = d.width
    require(n >= 18, s"audioHash64 needs >= 18 frames, got $n")
    val mono = new Array[Double](n)
    var i = 0
    while (i < n) {
      var c = 0
      var acc = 0.0
      while (c < d.channels) { acc += d.data(i * d.channels + c); c += 1 }
      mono(i) = acc / d.channels
      i += 1
    }
    val T = 9
    val F = 8
    val e = Array.ofDim[Double](T, F)
    var t = 0
    while (t < T) {
      val lo = t * n / T
      val hi = (t + 1) * n / T
      val len = hi - lo
      var f = 0
      while (f < F) {
        // Goertzel magnitude at bin k = f+1 over the window
        val w = 2.0 * math.Pi * (f + 1) / len
        val coeff = 2.0 * math.cos(w)
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var j = lo
        while (j < hi) {
          s0 = mono(j) + coeff * s1 - s2
          s2 = s1; s1 = s0
          j += 1
        }
        e(t)(f) = s1 * s1 + s2 * s2 - coeff * s1 * s2
        f += 1
      }
      t += 1
    }
    e
  }

  /** Energy-NORMALIZED band grid: the 72 cells divided by their sum —
    * volume scaling cancels (all energies scale by c²), so it compares
    * recordings, not loudness. All-silent input → all-zero grid. */
  private def audioEvidenceGrid(d: Decoded): Array[Double] = {
    val e = bandEnergies(d)
    val flat = e.flatten
    val total = flat.sum
    if (total <= 0) flat else flat.map(_ / total)
  }

  /** Verify AUDIO near-dup candidate pairs against spectral evidence —
    * the audio form of [[verifyImagePairs]]: each candidate decodes
    * both payloads to the energy-NORMALIZED 9×8 band grid (volume
    * cancels by construction) and scores mean absolute difference.
    * Same-recording re-renders land at ~0 (the grid is also
    * sample-rate relative), unrelated recordings near the corpus's
    * spectral spread — MultimodalSpec pins both margins. Scalar-tier
    * pairs only (windowed/offset pairs would need window-aligned
    * evidence). Returns the pairs + `mean_diff`, filtered. */
  def verifyAudioPairs(
      pairs: DataFrame, // (id1, id2, ...)
      media: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      maxMeanDiff: Double = 0.002): DataFrame = {
    val payload = media.select(col(idCol), col(contentCol).as("__vc"),
      col(metaCol).as("__vm"))
    val joined = pairs
      .join(payload.withColumnRenamed(idCol, "__vid1")
        .withColumnRenamed("__vc", "__vc1").withColumnRenamed("__vm", "__vm1"),
        col("id1") === col("__vid1"))
      .join(payload.withColumnRenamed(idCol, "__vid2")
        .withColumnRenamed("__vc", "__vc2").withColumnRenamed("__vm", "__vm2"),
        col("id2") === col("__vid2"))
      .drop("__vid1", "__vid2")
    val outSchema = StructType(pairs.schema.fields :+
      StructField("mean_diff", DoubleType, nullable = false))
    val nPairCols = pairs.columns.length
    val (c1, m1, c2, m2) = (nPairCols, nPairCols + 1, nPairCols + 2, nPairCols + 3)
    joined.mapPartitions { it =>
      it.map { row =>
        def meta(i: Int) = Option(row.getMap[String, String](i))
          .map(_.toMap).getOrElse(Map.empty[String, String])
        val g1 = audioEvidenceGrid(decoder.decode(row.getAs[Array[Byte]](c1), meta(m1)))
        val g2 = audioEvidenceGrid(decoder.decode(row.getAs[Array[Byte]](c2), meta(m2)))
        var s = 0.0; var i = 0
        while (i < g1.length) { s += math.abs(g1(i) - g2(i)); i += 1 }
        Row.fromSeq(row.toSeq.take(nPairCols) :+ s / g1.length)
      }
    }(Encoders.row(outSchema))
      .filter(col("mean_diff") <= maxMeanDiff)
  }

  /** Per-asset audio fingerprints `(id, sig)` — the audio analog of
    * [[perceptualHashes]], same batched decode shape, same persistable
    * state-frame contract. */
  def audioHashes(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame = {
    val idType = df.schema(idCol).dataType
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val (idIdx, cIdx, mIdx) =
      (df.columns.indexOf(idCol), df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) None
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            Some(Row(row.get(idIdx), audioHash64(decoder.decode(content, meta))))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Audio NEAR-DUPLICATE pairs within `maxHamming` fingerprint bits —
    * decode → [[audioHash64]] (one mapPartitions pass) → the shared
    * banded engine ([[graft.llm.Dedup.sigNearDups]]). Catches volume
    * changes, re-quantizations, and container re-encodes of the same
    * recording; trims/offsets are outside the envelope. */
  def audioNearDups(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000): DataFrame =
    graft.llm.Dedup.sigNearDups(
      audioHashes(df, decoder, idCol, contentCol, metaCol),
      maxHamming, bands, maxBucketSize)

  /** Per-(clip, window) sub-fingerprints `(id, window_idx, sig)` — the
    * WINDOWED form of [[audioHash64]] (the Haitsma–Kalman sub-
    * fingerprint recipe: many overlapping windows per clip, matched by
    * consistent offset). Window `w` covers frames
    * `[w·hop, w·hop + windowFrames)`; clips shorter than one window
    * emit a single whole-clip hash. A trim of `m·hop` frames makes the
    * trimmed clip's window `w` SAMPLE-IDENTICAL to the original's
    * `w + m` (hash distance 0); arbitrary trims misalign by at most
    * `hop/2` frames, which small hops keep inside the Hamming radius.
    * Same batched mapPartitions decode shape as [[audioHashes]]. */
  def audioWindowHashes(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      windowFrames: Int = 2048,
      hop: Int = 512,
      batchSize: Int = 64): DataFrame = {
    require(windowFrames >= 18, s"audioHash64 needs >= 18 frames per window, got $windowFrames")
    require(hop > 0 && hop <= windowFrames,
      s"hop must be in (0, windowFrames], got $hop (windows must tile or overlap)")
    val idType = df.schema(idCol).dataType
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("window_idx", IntegerType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val (idIdx, cIdx, mIdx) =
      (df.columns.indexOf(idCol), df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) Seq.empty[Row]
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            val d = decoder.decode(content, meta)
            val n = d.width
            if (n <= windowFrames) Seq(Row(row.get(idIdx), 0, audioHash64(d)))
            else (0 to (n - windowFrames) / hop).map { w =>
              val lo = w * hop
              val slice = java.util.Arrays.copyOfRange(
                d.data, lo * d.channels, (lo + windowFrames) * d.channels)
              Row(row.get(idIdx), w,
                audioHash64(Decoded(windowFrames, 1, d.channels, slice)))
            }
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** TRIM/OFFSET-robust audio near-dup — windowed sub-fingerprints
    * through the offset-consistent engine
    * ([[graft.llm.Dedup.seqSigNearDups]]): a trimmed copy matches many
    * windows of its original at ONE index delta; strangers don't.
    * Returns `(id1, id2, delta, n_matched, max_hamming)` with
    * `n_matched >= minWindows`. Closes the un-windowed
    * [[audioNearDups]] form's published trim limitation. */
  def audioNearDupsShifted(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      minWindows: Int = 2,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      windowFrames: Int = 2048,
      hop: Int = 512): DataFrame =
    graft.llm.Dedup.seqSigNearDups(
      audioWindowHashes(df, decoder, idCol, contentCol, metaCol, windowFrames, hop)
        .withColumnRenamed("window_idx", "seq_idx"),
      minWindows, maxHamming, bands, maxBucketSize)

  /** Deterministic smooth test RECORDING for a seed: three sinusoid
    * components whose carrier bins and slow amplitude-modulation
    * rates/phases derive from the split-mixed seed — band energies
    * then OSCILLATE across the 9 analysis windows in a seed-specific
    * pattern, so fingerprints differ across seeds while any volume
    * scale / 16-bit render of the same seed fingerprints identically.
    * Mono, [-1,1], `nFrames` samples. */
  def smoothAudio(seed: Long, nFrames: Int = 4096): Decoded = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val data = new Array[Float](nFrames)
    var comp = 0
    while (comp < 3) {
      val bits = (z >>> (comp * 20)) & 0xFFFFFL
      // carrier: 1..8 cycles per ninth-window (the Goertzel bins)
      val carrier = 1 + (bits & 7L)
      // LFO: 0.5..4.5 cycles over the whole clip, seed phase
      val lfoRate = 0.5 + ((bits >> 3) & 255L) / 64.0
      val lfoPh = ((bits >> 11) & 255L) / 255.0
      var i = 0
      while (i < nFrames) {
        val x = i.toDouble / nFrames
        val env = 0.5 + 0.5 * math.sin(2 * math.Pi * (lfoRate * x + lfoPh))
        data(i) = (data(i) + env * math.sin(2 * math.Pi * carrier * 9 * x) / 3.0).toFloat
        i += 1
      }
      comp += 1
    }
    Decoded(nFrames, 1, 1, data)
  }

  /** Per-(clip, frame) perceptual hashes `(id, frame_idx, sig)`: the
    * declarative frame explosion ([[sampleFrames]] on the probed
    * `n_frames` + [[frameIdxIntoMeta]]) followed by one batched
    * decode+dHash pass — the video analog of [[perceptualHashes]]. */
  def videoFrameHashes(
      df: DataFrame,
      everyN: Int = 1,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame = {
    val frames = frameIdxIntoMeta(sampleFrames(df, everyN))
    val idType = df.schema(idCol).dataType
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val (idIdx, cIdx, mIdx, fIdx) =
      (frames.columns.indexOf(idCol), frames.columns.indexOf(contentCol),
        frames.columns.indexOf(metaCol), frames.columns.indexOf("frame_idx"))
    frames.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) None
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            Some(Row(row.get(idIdx), row.getInt(fIdx),
              dHash64(AviDecoder.decode(content, meta))))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Video NEAR-DUPLICATE pairs: clips pair when at least `minFrames`
    * ALIGNED frames (same `frame_idx` — the re-encode/recompress case;
    * temporal shifts are outside the envelope, like crops for dHash)
    * land within `maxHamming` bits. The per-frame join is the same
    * banded shape as every other near-dup tier, with `frame_idx`
    * joining the band key so frames only ever meet their own index —
    * never all-pairs, hot-bucket-guarded. Returns
    * `(id1, id2, n_frames_matched, max_hamming)`. */
  def videoNearDups(
      df: DataFrame,
      everyN: Int = 1,
      minFrames: Int = 2,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000): DataFrame =
    videoNearDupsFromSigs(videoFrameHashes(df, everyN, idCol, contentCol, metaCol),
      minFrames, maxHamming, bands, maxBucketSize)

  /** [[videoNearDups]] over an already-computed `(id, frame_idx, sig)`
    * frame — the sig-level core the incremental tier reuses (persisted
    * frame-hash state never re-decodes the corpus). */
  def videoNearDupsFromSigs(
      frameSigs: DataFrame,
      minFrames: Int = 2,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      probe: Int = 0): DataFrame = {
    graft.llm.Dedup.requireProbeComplete(maxHamming, bands, probe)
    val sigs = frameSigs
      .select(struct(col("id").as("vid"), col("frame_idx").as("f")).as("id"),
        col("sig"))
    val banded0 = graft.llm.Dedup.bandSignatures(sigs, bands)
    val (probed, banded) =
      graft.llm.Dedup.selfJoinSides(banded0, bands, maxBucketSize, probe)
    val l = probed
      .select(col("band"), col("bits"),
        col("id.vid").as("id1"), col("id.f").as("f"), col("sig").as("sig1"))
    val r = banded.select(col("band"), col("bits"),
      col("id.vid").as("id2"), col("id.f").as("f"), col("sig").as("sig2"))
    l.join(r, Seq("band", "bits", "f"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("f"),
        graft.llm.Dedup.hamming(col("sig1"), col("sig2")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_frames_matched"),
        max(col("hamming")).as("max_hamming"))
      .filter(col("n_frames_matched") >= minFrames)
  }

  /** Batch-vs-corpus VIDEO near-dup over `(id, frame_idx, sig)` frames
    * — the frame-aligned incremental tier: a batch clip pairs with a
    * stored corpus clip when ≥ `minFrames` SAME-INDEX frames land
    * within `maxHamming` bits. Returns
    * `(batch_id, corpus_id, n_frames_matched, max_hamming)`. */
  def videoNearDupsAgainst(
      batchFrameSigs: DataFrame,
      corpusFrameSigs: DataFrame,
      minFrames: Int = 2,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None,
      probe: Int = 0): DataFrame = {
    graft.llm.Dedup.requireProbeComplete(maxHamming, bands, probe)
    def keyed(df: DataFrame) =
      df.select(struct(col("id").as("vid"), col("frame_idx").as("f")).as("id"),
        col("sig"))
    val b = graft.llm.Dedup.probedSide(
        graft.llm.Dedup.bandSignatures(keyed(batchFrameSigs), bands), bands,
        maxBucketSize, probe,
        targetHot = corpusHotBuckets.filter(_ => probe == 1))
      .select(col("band"), col("bits"),
        col("id.vid").as("batch_id"), col("id.f").as("f"), col("sig").as("sig1"))
    val c = graft.llm.Dedup.dropHotBuckets(
        graft.llm.Dedup.bandSignatures(keyed(corpusFrameSigs), bands),
        maxBucketSize, corpusHotBuckets)
      .select(col("band"), col("bits"),
        col("id.vid").as("corpus_id"), col("id.f").as("f"), col("sig").as("sig2"))
    b.join(c, Seq("band", "bits", "f"))
      .select(col("batch_id"), col("corpus_id"), col("f"),
        graft.llm.Dedup.hamming(col("sig1"), col("sig2")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_frames_matched"),
        max(col("hamming")).as("max_hamming"))
      .filter(col("n_frames_matched") >= minFrames)
  }

  /** TEMPORALLY-SHIFTED video near-dup: per-frame dHashes through the
    * offset-consistent engine ([[graft.llm.Dedup.seqSigNearDups]]) —
    * a re-encode that prepends/drops frames still pairs, because its
    * overlapping frames match the original's at ONE consistent
    * frame-index delta (the frame-ALIGNED [[videoNearDups]] requires
    * delta 0 and misses it). Returns
    * `(id1, id2, delta, n_matched, max_hamming)`. */
  def videoNearDupsShifted(
      df: DataFrame,
      everyN: Int = 1,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      minFrames: Int = 2,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      probe: Int = 0): DataFrame =
    graft.llm.Dedup.seqSigNearDups(
      videoFrameHashes(df, everyN, idCol, contentCol, metaCol)
        .withColumnRenamed("frame_idx", "seq_idx"),
      minFrames, maxHamming, bands, maxBucketSize, probe)

  /** Replace each asset's payload with a REAL AVI (DIB or MJPEG) of
    * `nFrames` deterministic smooth plates keyed by `seedCol` — the
    * video twin fixture: render the same seed once as lossless DIB and
    * once as MJPEG under different ids and the pair is two genuine
    * codecs' renderings of the same clip. Smooth plates because noise
    * is JPEG's adversarial worst case ([[reencodeAsAvi]] keeps the
    * noise fixtures for the bit-exact DIB path). */
  def reencodeAsSmoothAvi(
      df: DataFrame,
      nFrames: Int,
      mjpeg: Boolean,
      seedCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      w: Int = 32,
      h: Int = 32,
      frameOffset: Int = 0): DataFrame = {
    // frameOffset renders the SAME seed's plate sequence starting f
    // frames in — the temporally-shifted twin fixture: (offset 0,
    // offset m) clips of one seed overlap on nFrames − m genuine
    // frames, at a consistent frame-index delta of m
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val mIdx = df.columns.indexOf(metaCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val seed = row.getLong(sIdx)
        val frames = (0 until nFrames)
          .map(f => smoothImage(seed * 1000003L + f + frameOffset, w, h))
        val avi = encodeAvi(frames, mjpeg = mjpeg)
        val meta = Option(row.getMap[String, String](mIdx))
          .map(_.toMap).getOrElse(Map.empty[String, String])
        Row.fromSeq(row.toSeq
          .updated(cIdx, avi)
          .updated(mIdx, meta ++ probeAvi(avi)))
      }
    }(Encoders.row(schema))
  }

  /** Replace each asset's payload with a REAL 16-bit PCM WAV rendering
    * of the deterministic smooth recording keyed by `seedCol` —
    * `volume` scales the samples first, so a (full, half-volume) pair
    * of the SAME seed under different ids is two renderings of the
    * same recording (the audio twin fixture). */
  def reencodeAsSmoothAudio(
      df: DataFrame,
      volume: Float = 1.0f,
      seedCol: String = "asset_id",
      contentCol: String = "content",
      nFrames: Int = 4096,
      trimFrames: Int = 0): DataFrame = {
    // trimFrames drops the recording's FIRST samples — the trimmed-twin
    // fixture: a (full, trimmed) pair of one seed is the same recording
    // minus its head, sample-identical past the cut
    require(trimFrames >= 0 && trimFrames < nFrames,
      s"trimFrames must be in [0, nFrames), got $trimFrames")
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val d0 = smoothAudio(row.getLong(sIdx), nFrames)
        val d = if (trimFrames == 0) d0
          else Decoded(nFrames - trimFrames, 1, 1, d0.data.drop(trimFrames))
        val scaled = if (volume == 1.0f) d
          else Decoded(d.width, 1, 1, d.data.map(_ * volume))
        Row.fromSeq(row.toSeq.updated(cIdx, encodeWav(scaled)))
      }
    }(Encoders.row(schema))
  }

  /** Deterministic SMOOTH test image for a seed: a sinusoidal plate
    * whose frequencies and phase derive from the seed. Smooth content
    * is JPEG's representative case (FakeDecoder noise is its
    * adversarial worst case), so a JPEG re-encode of the same seed
    * stays perceptually identical — the fixture a cross-codec
    * near-dup test needs — while different seeds give clearly
    * different plates. Grayscale written to all three channels, so
    * luma == the plate exactly. */
  def smoothImage(seed: Long, w: Int = 32, h: Int = 32): Decoded = {
    // splitmix64 finalizer: sequential ids must give decorrelated
    // plates, not neighbors in (fx, fy, phase) space
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val fx = 0.5 + (z & 63L) / 16.0
    val fy = 0.5 + ((z >> 6) & 63L) / 16.0
    val ph = ((z >> 12) & 255L) / 255.0
    val data = new Array[Float](w * h * 3)
    var p = 0
    while (p < w * h) {
      val x = (p % w).toDouble / w
      val y = (p / w).toDouble / h
      val v = (0.5 + 0.5 * math.sin(2 * math.Pi * (fx * x + fy * y + ph))).toFloat
      data(p * 3) = v; data(p * 3 + 1) = v; data(p * 3 + 2) = v
      p += 1
    }
    Decoded(w, h, 3, data)
  }

  /** Replace each asset's payload with a REAL PNG (or JPEG) rendering
    * of the deterministic smooth image keyed by `seedCol` (a long
    * column, default the asset id) — the cross-codec twin fixture:
    * render the same seed once as PNG and once as JPEG under different
    * ids and the pair is two genuine codecs' renderings of the same
    * picture. Same mapPartitions shape as decode — no shuffle. */
  def reencodeAsSmoothImage(
      df: DataFrame,
      jpeg: Boolean,
      seedCol: String = "asset_id",
      contentCol: String = "content",
      w: Int = 32,
      h: Int = 32): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val img = smoothImage(row.getLong(sIdx), w, h)
        val bytes = if (jpeg) Avi.encodeJpegFrame(img) else encodePng(img)
        Row.fromSeq(row.toSeq.updated(cIdx, bytes))
      }
    }(Encoders.row(schema))
  }

  /** Replace each asset's payload with a PNG of the CENTER-HALF crop of
    * the deterministic smooth plate keyed by `seedCol` — the crop-twin
    * fixture: a (full, center-crop) pair of one seed is a genuine crop
    * relationship, and the cropped pixels equal the full plate's tile-5
    * region exactly (same [[tileRegions]] geometry), so the crop tier
    * must pair them while plain full-frame dHash does not. */
  def reencodeAsSmoothImageCrop(
      df: DataFrame,
      seedCol: String = "asset_id",
      contentCol: String = "content",
      w: Int = 32,
      h: Int = 32): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val img = smoothImage(row.getLong(sIdx), w, h)
        val crop = cropRegion(img, w / 4, h / 4, w / 2, h / 2)
        Row.fromSeq(row.toSeq.updated(cIdx, encodePng(crop)))
      }
    }(Encoders.row(schema))
  }

  /** Replace each asset's payload with real JPEG bytes derived from it
    * (deterministic [[FakeDecoder]] pixels → the JDK JPEG encoder) —
    * the lossy twin of [[reencodeAsPng]], so a (PNG, JPEG) pair of the
    * SAME picture exists to exercise cross-codec near-dup detection
    * end-to-end. Same mapPartitions shape as decode — no shuffle. */
  def reencodeAsJpeg(
      df: DataFrame,
      contentCol: String = "content",
      metaCol: String = "meta"): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val mIdx = df.columns.indexOf(metaCol)
    df.mapPartitions { it =>
      it.map { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        if (content == null) row
        else {
          val meta = Option(row.getMap[String, String](mIdx))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          Row.fromSeq(row.toSeq.updated(cIdx,
            Avi.encodeJpegFrame(FakeDecoder.decode(content, meta))))
        }
      }
    }(Encoders.row(schema))
  }

  /** Nearest-neighbor resize on a decoded buffer — pure arithmetic,
    * works identically on fake or real pixels. */
  def resize(d: Decoded, newW: Int, newH: Int): Decoded = {
    val out = new Array[Float](newW * newH * d.channels)
    var y = 0
    while (y < newH) {
      val sy = y * d.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * d.width / newW
        var ch = 0
        while (ch < d.channels) {
          out((y * newW + x) * d.channels + ch) =
            d.data((sy * d.width + sx) * d.channels + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    Decoded(newW, newH, d.channels, out)
  }

  /** Video frame sampling as row explosion BEFORE decode: one output row
    * per sampled frame index, driven by the `n_frames` metadata entry.
    * Declarative (`sequence` + `explode`) so the planner parallelizes
    * frames across tasks; the binary column is carried by reference. */
  def sampleFrames(
      df: DataFrame,
      everyN: Int,
      metaCol: String = "meta"): DataFrame = {
    val n = element_at(col(metaCol), "n_frames").cast("int")
    // zero/missing n_frames → no rows (explode skips null), not a
    // phantom frame 0
    df.withColumn("frame_idx",
      explode(when(n >= 1, sequence(lit(0), n - 1, lit(everyN)))))
  }

  /** One transform of the dihedral group D4 applied to a decoded frame:
    * `k & 3` quarter-turns clockwise, after a horizontal mirror when
    * `k & 4` is set — the eight orientations a re-posted image can
    * arrive in. Pure pixel permutation (exact, any channel count);
    * quarter-turns swap width and height. */
  private[graft] def dihedral(d: Decoded, k: Int): Decoded = {
    require(k >= 0 && k < 8, s"dihedral k must be in [0, 8), got $k")
    val m = if ((k & 4) == 0) d else {
      val out = new Array[Float](d.data.length)
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          System.arraycopy(d.data, (y * d.width + x) * d.channels,
            out, (y * d.width + (d.width - 1 - x)) * d.channels, d.channels)
          x += 1
        }
        y += 1
      }
      Decoded(d.width, d.height, d.channels, out)
    }
    var cur = m
    var r = k & 3
    while (r > 0) {
      // clockwise quarter turn: out(x', y') = in(x' -> y, y' -> W-1-x)…
      // concretely out has width = in.height, and out(y, x) takes
      // in(in.height - 1 - x, y) — the standard rotate-right
      val out = new Array[Float](cur.data.length)
      val (w, h) = (cur.height, cur.width) // rotated dims
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val sy = cur.height - 1 - x
          val sx = y
          System.arraycopy(cur.data, (sy * cur.width + sx) * cur.channels,
            out, (y * w + x) * cur.channels, cur.channels)
          x += 1
        }
        y += 1
      }
      cur = Decoded(w, h, cur.channels, out)
      r -= 1
    }
    cur
  }

  /** Per-(image, orientation) dHashes `(id, orient, sig)` over all
    * eight [[dihedral]] transforms — the ROTATION/MIRROR-tolerant
    * image tier's state frame (one decode, eight pure pixel
    * permutations + hashes; 64 B/asset). Because the transforms
    * compose pixel-exactly, orientation i of A matching orientation j
    * of B equals orientation i∘j⁻¹ of A matching B UNTRANSFORMED — so
    * near-dup matching only ever compares ALL orientations of one side
    * against orientation 0 of the other (8 combos per pair, not 64):
    * see [[rotationNearDups]]. */
  /** `kernel = "dct"` hashes each orientation with [[pHash64]] instead
    * of [[dHash64]] — the blur/re-quantization-robust DIHEDRAL lineage
    * (MediaEnvelopeProbe, round 14, textured family: a blur+JPEG-q0.3
    * rotated arrival sits at pHash twin max 7 vs stranger min 16 —
    * cleanly inside the dct tier's radius-7 envelope — where dHash's
    * margin thins to twin max 7-8 vs stranger min 11-12). NOT
    * comparable to dHash dihedral state; the MediaDedup fingerprint
    * line keeps the lineages apart. */
  def dihedralHashes(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64,
      kernel: String = "dhash"): DataFrame = {
    require(Set("dhash", "dct")(kernel),
      s"dihedralHashes kernel must be dhash | dct, got '$kernel'")
    val useDct = kernel == "dct"
    val idType = df.schema(idCol).dataType
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("orient", IntegerType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val (idIdx, cIdx, mIdx) =
      (df.columns.indexOf(idCol), df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { row =>
          val content = row.getAs[Array[Byte]](cIdx)
          if (content == null) Seq.empty[Row]
          else {
            val meta = Option(row.getMap[String, String](mIdx))
              .map(_.toMap).getOrElse(Map.empty[String, String])
            val d = decoder.decode(content, meta)
            (0 until 8).map { k =>
              val o = dihedral(d, k)
              Row(row.get(idIdx), k, if (useDct) pHash64(o) else dHash64(o))
            }
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** ROTATION/MIRROR-tolerant image near-dup: assets pair when
    * orientations of one land within `maxHamming` of the other's
    * canonical (orientation-0) hash IN BOTH DIRECTIONS — catches
    * 90/180/270° rotations and mirrors, which plain dHash misses by
    * construction. Banded join of the full orientation table against
    * the orientation-0 slice (8 combos per candidate pair per
    * direction — the group-composition argument in [[dihedralHashes]]).
    *
    * WHY two witnesses: a true pair `B = g(A)` ALWAYS yields the
    * forward witness (A's orientation g vs B canonical — pixel-equal)
    * AND the independent reverse witness (B's orientation g⁻¹ vs A
    * canonical), while an accidental hash collision between unrelated
    * images is one-directional (the reverse comparison is a fresh
    * ~random event). On smooth-plate corpora single cross-image
    * orientation collisions at distance 0 are REAL (the plate family
    * is rotation-aliased — measured in the MultimodalSpec margins
    * probe), so `minWitnesses = 2` is the default gate, the same
    * corroboration argument as the crop tier's slots and the video
    * tier's frames. Returns `(id1, id2, n_witnesses, orient,
    * min_hamming)` with `orient` the best witness's relative
    * orientation (deterministic tie-break). */
  def rotationNearDups(
      df: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      minWitnesses: Int = 2,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      kernel: String = "dhash",
      probe: Int = 0): DataFrame =
    rotationNearDupsFromSigs(
      dihedralHashes(df, decoder, idCol, contentCol, metaCol, kernel = kernel),
      minWitnesses, maxHamming, bands, maxBucketSize, probe)

  /** [[rotationNearDups]] over an existing `(id, orient, sig)` state
    * frame. `probe` = the multi-probe depth ([[graft.llm.Dedup
    * .sigNearDups]]) — the dct kernel's radius-7 envelope runs on 4
    * bands of 16 bits at depth 1, same geometry/guard contract as the
    * scalar dct tier. The all-orientations side probes; the canonical
    * slice stays exact. */
  def rotationNearDupsFromSigs(
      sigs: DataFrame,
      minWitnesses: Int = 2,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      probe: Int = 0): DataFrame = {
    graft.llm.Dedup.requireProbeComplete(maxHamming, bands, probe)
    require(minWitnesses >= 1 && minWitnesses <= 2,
      s"witnesses are DIRECTIONS (at most 2); got minWitnesses = $minWitnesses")
    val keyed = sigs.select(
      struct(col("id").as("aid"), col("orient").as("o")).as("id"), col("sig"))
    val banded = graft.llm.Dedup.bandSignatures(keyed, bands)
    val (probed, exact) =
      graft.llm.Dedup.selfJoinSides(banded, bands, maxBucketSize, probe)
    val all = probed
      .select(col("band"), col("bits"), col("id.aid").as("ida"),
        col("id.o").as("orient"), col("sig").as("siga"))
    val canonical = exact
      .filter(col("id.o") === 0)
      .select(col("band"), col("bits"), col("id.aid").as("idb"),
        col("sig").as("sigb"))
    all.join(canonical, Seq("band", "bits"))
      .filter(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb"), col("orient"),
        graft.llm.Dedup.hamming(col("siga"), col("sigb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // band multiplicity only — directions stay distinct rows
      .select(
        least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"),
        // direction tag: the forward and reverse witnesses of one pair
        // must count separately even when orient+hamming coincide
        when(col("ida") < col("idb"), lit(0)).otherwise(lit(1)).as("__dir"),
        col("orient"), col("hamming"))
      .groupBy(col("id1"), col("id2"))
      // a WITNESS is a DIRECTION with at least one orientation inside
      // the radius — two collisions in the same direction are NOT
      // independent corroboration (one image's several orientations can
      // drift near the same stranger hash together), so the count is
      // capped at 2 by construction and minWitnesses = 2 means "both
      // directions agree"
      .agg(countDistinct(col("__dir")).as("n_witnesses"),
        // deterministic best witness: smallest hamming, ties to the
        // smallest orientation
        min(struct(col("hamming"), col("orient"))).as("__best"))
      .filter(col("n_witnesses") >= minWitnesses)
      .select(col("id1"), col("id2"), col("n_witnesses"),
        col("__best.orient").as("orient"),
        col("__best.hamming").as("min_hamming"))
  }

  /** Deterministic ANISOTROPIC test image: the smooth plate PLUS a
    * seed-keyed pure-horizontal sinusoid. The plain [[smoothImage]]
    * family is CLOSED under rotation — one seed's quarter-turn can
    * genuinely approximate another seed's plate (rotation-aliasing:
    * measured ~7 both-direction stranger pairs per 150 seeds), which
    * real photo corpora do not exhibit. The pure-x component leaves the
    * family under rotation (it becomes pure-y), so rotated orientations
    * of one seed never resemble another seed's canonical: the
    * rotation-tier fixture (0 both-direction stranger pairs over 150
    * seeds, twins exact — the margins probe pins it). */
  def smoothImageAsym(seed: Long, w: Int = 32, h: Int = 32): Decoded = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val fx = 0.5 + (z & 63L) / 16.0
    val fy = 0.5 + ((z >> 6) & 63L) / 16.0
    val ph = ((z >> 12) & 255L) / 255.0
    val gx = 5.0 + ((z >> 20) & 31L) / 8.0
    val phx = ((z >> 25) & 255L) / 255.0
    val data = new Array[Float](w * h * 3)
    var p = 0
    while (p < w * h) {
      val x = (p % w).toDouble / w
      val y = (p / w).toDouble / h
      val v = (0.5 + 0.25 * math.sin(2 * math.Pi * (fx * x + fy * y + ph)) +
        0.25 * math.sin(2 * math.Pi * (gx * x + phx))).toFloat
      data(p * 3) = v; data(p * 3 + 1) = v; data(p * 3 + 2) = v
      p += 1
    }
    Decoded(w, h, 3, data)
  }

  /** Batch-vs-corpus form of [[rotationNearDups]] over persisted
    * dihedral state `(id, orient, sig)` — the incremental rotation
    * tier. Same two-directional witness rule: the batch asset's
    * orientations must hit the stored canonical AND the stored
    * orientations must hit the batch canonical. Returns
    * `(batch_id, corpus_id, n_witnesses, orient, min_hamming)`. */
  def rotationNearDupsAgainst(
      batchSigs: DataFrame,
      corpusSigs: DataFrame,
      minWitnesses: Int = 2,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None,
      probe: Int = 0): DataFrame = {
    graft.llm.Dedup.requireProbeComplete(maxHamming, bands, probe)
    require(minWitnesses >= 1 && minWitnesses <= 2,
      s"witnesses are DIRECTIONS (at most 2); got minWitnesses = $minWitnesses")
    def keyed(t: DataFrame) =
      t.select(struct(col("id").as("aid"), col("orient").as("o")).as("id"),
        col("sig"))
    // per direction: the all-orientations side probes, the canonical
    // slice stays exact (the sigNearDupsAgainst contract — persisted
    // corpusHotBuckets ride unchanged, probe depth is matching-time)
    // the all-orientations side probes (home-drop falls out of the one
    // hot aggregate); probe rows into the OTHER side's hot keys are
    // pruned only when a PERSISTED hot table makes it free (the
    // probedSide targetHot contract)
    def allSide(t: DataFrame, hot: Option[DataFrame],
        targetHot: Option[DataFrame]) =
      graft.llm.Dedup.probedSide(
        graft.llm.Dedup.bandSignatures(keyed(t), bands), bands,
        maxBucketSize, probe, hot, targetHot.filter(_ => probe == 1))
    def canonSide(t: DataFrame, hot: Option[DataFrame]) =
      graft.llm.Dedup.dropHotBuckets(
        graft.llm.Dedup.bandSignatures(keyed(t), bands), maxBucketSize, hot)
    val bAll = allSide(batchSigs, None, corpusHotBuckets)
    val bCanon = canonSide(batchSigs, None)
    val cAll = allSide(corpusSigs, corpusHotBuckets, None)
    val cCanon = canonSide(corpusSigs, corpusHotBuckets)
    def dir(all: DataFrame, canon: DataFrame, allIs: String, tag: Int) = {
      val l = all.select(col("band"), col("bits"),
        col("id.aid").as(if (allIs == "batch") "batch_id" else "corpus_id"),
        col("id.o").as("orient"), col("sig").as("__asig"))
      val r = canon.filter(col("id.o") === 0).select(col("band"), col("bits"),
        col("id.aid").as(if (allIs == "batch") "corpus_id" else "batch_id"),
        col("sig").as("__csig"))
      l.join(r, Seq("band", "bits"))
        .select(col("batch_id"), col("corpus_id"), col("orient"),
          graft.llm.Dedup.hamming(col("__asig"), col("__csig")).as("hamming"))
        .filter(col("hamming") <= maxHamming)
        .distinct()
        .withColumn("__dir", lit(tag))
    }
    dir(bAll, cCanon, "batch", 0).unionByName(dir(cAll, bCanon, "corpus", 1))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(countDistinct(col("__dir")).as("n_witnesses"),
        min(struct(col("hamming"), col("orient"))).as("__best"))
      .filter(col("n_witnesses") >= minWitnesses)
      .select(col("batch_id"), col("corpus_id"), col("n_witnesses"),
        col("__best.orient").as("orient"),
        col("__best.hamming").as("min_hamming"))
  }

  /** Replace each asset's payload with a PNG of the `k`-th [[dihedral]]
    * transform of the deterministic ANISOTROPIC plate keyed by
    * `seedCol` — the rotation-twin fixture (`k = 0` renders the
    * originals). Anisotropic by necessity: see [[smoothImageAsym]]. */
  def reencodeAsSmoothImageRotated(
      df: DataFrame,
      k: Int,
      seedCol: String = "asset_id",
      contentCol: String = "content",
      w: Int = 32,
      h: Int = 32): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val sIdx = df.columns.indexOf(seedCol)
    df.mapPartitions { it =>
      it.map { row =>
        val img = dihedral(smoothImageAsym(row.getLong(sIdx), w, h), k)
        Row.fromSeq(row.toSeq.updated(cIdx, encodePng(img)))
      }
    }(Encoders.row(schema))
  }

  /** Verify image near-dup candidate PAIRS against decoded PIXEL
    * evidence — the media analog of the text tier's Jaccard
    * `verifyPairs`: signatures nominate, pixels confirm. Each
    * `(id1, id2)` candidate joins its two payloads, both decode to the
    * same 9×8 grayscale grid dHash reads, and the score is the mean
    * absolute luma difference in [0, 1] — re-encodes land near 0,
    * unrelated images near the corpus's mean contrast (the
    * MultimodalSpec margins pin both). With `orientationInvariant` the
    * score is the MINIMUM over the candidate's eight dihedral
    * orientations (verifies rotation-tier pairs); crops verify against
    * the original's center region when `cropHypothesis` is set.
    *
    * Join-shaped: pairs × media twice (payloads travel by id), ONE
    * decode per side per pair — run it AFTER a banded signature tier
    * has cut candidates to a small set, never on a raw corpus.
    * Returns the pairs with a `mean_diff` column, filtered to
    * `<= maxMeanDiff`. */
  def verifyImagePairs(
      pairs: DataFrame, // (id1, id2, ...)
      media: DataFrame,
      decoder: MediaDecoder,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      maxMeanDiff: Double = 0.1,
      orientationInvariant: Boolean = false,
      cropHypothesis: Boolean = false): DataFrame = {
    require(!(orientationInvariant && cropHypothesis),
      "verify one hypothesis per call: orientationInvariant XOR cropHypothesis")
    val payload = media.select(col(idCol), col(contentCol).as("__vc"),
      col(metaCol).as("__vm"))
    val joined = pairs
      .join(payload.withColumnRenamed(idCol, "__vid1")
        .withColumnRenamed("__vc", "__vc1").withColumnRenamed("__vm", "__vm1"),
        col("id1") === col("__vid1"))
      .join(payload.withColumnRenamed(idCol, "__vid2")
        .withColumnRenamed("__vc", "__vc2").withColumnRenamed("__vm", "__vm2"),
        col("id2") === col("__vid2"))
      .drop("__vid1", "__vid2")
    val outSchema = StructType(pairs.schema.fields :+
      StructField("mean_diff", DoubleType, nullable = false))
    val nPairCols = pairs.columns.length
    val (c1, m1, c2, m2) = (nPairCols, nPairCols + 1, nPairCols + 2, nPairCols + 3)
    joined.mapPartitions { it =>
      it.map { row =>
        def meta(i: Int) = Option(row.getMap[String, String](i))
          .map(_.toMap).getOrElse(Map.empty[String, String])
        val d1 = decoder.decode(row.getAs[Array[Byte]](c1), meta(m1))
        val d2 = decoder.decode(row.getAs[Array[Byte]](c2), meta(m2))
        val g2v = verifyGrid(d2)
        val score =
          if (orientationInvariant)
            (0 until 8).map(k => gridMad(verifyGrid(dihedral(d1, k)), g2v)).min
          else if (cropHypothesis)
            // id1 is the ORIGINAL, id2 the crop: the crop's pixels
            // should equal the original's center-half region
            gridMad(verifyGrid(cropRegion(d1, d1.width / 4, d1.height / 4,
              d1.width / 2, d1.height / 2)), g2v)
          else gridMad(verifyGrid(d1), g2v)
        Row.fromSeq(row.toSeq.take(nPairCols) :+ score)
      }
    }(Encoders.row(outSchema))
      .filter(col("mean_diff") <= maxMeanDiff)
  }

  /** Verify VIDEO near-dup candidate pairs (the frame-ALIGNED tier)
    * against pixel evidence — the clip form of [[verifyImagePairs]]:
    * both clips' first `firstKFrames` decode, each ALIGNED frame pair
    * scores its 9×8 luma grid MAD, and the pair confirms when at least
    * `minFrames` aligned frames agree within `maxMeanDiff` — the same
    * agreement shape the signature tier nominates with
    * ([[videoNearDups]]' `minFrames`). Shift-TOLERANT pairs stay
    * signature-gated (their alignment delta is not in the pair row).
    * Returns the pairs + `n_frames_confirmed` + `max_confirmed_diff`,
    * filtered. */
  def verifyVideoPairs(
      pairs: DataFrame, // (id1, id2, ...)
      media: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      firstKFrames: Int = 4,
      minFrames: Int = 2,
      maxMeanDiff: Double = 0.1): DataFrame = {
    require(firstKFrames >= minFrames,
      s"firstKFrames ($firstKFrames) must cover minFrames ($minFrames)")
    val payload = media.select(col(idCol), col(contentCol).as("__vc"))
    val joined = pairs
      .join(payload.withColumnRenamed(idCol, "__vid1")
        .withColumnRenamed("__vc", "__vc1"), col("id1") === col("__vid1"))
      .join(payload.withColumnRenamed(idCol, "__vid2")
        .withColumnRenamed("__vc", "__vc2"), col("id2") === col("__vid2"))
      .drop("__vid1", "__vid2")
    val outSchema = StructType(pairs.schema.fields ++ Seq(
      StructField("n_frames_confirmed", IntegerType, nullable = false),
      StructField("max_confirmed_diff", DoubleType, nullable = false)))
    val nPairCols = pairs.columns.length
    val (c1, c2) = (nPairCols, nPairCols + 1)
    joined.mapPartitions { it =>
      it.flatMap { row =>
        val p1 = Avi.parse(row.getAs[Array[Byte]](c1))
        val p2 = Avi.parse(row.getAs[Array[Byte]](c2))
        val n = math.min(firstKFrames, math.min(p1.frames.length, p2.frames.length))
        var confirmed = 0
        var worst = 0.0
        var f = 0
        while (f < n) {
          val d = gridMad(verifyGrid(p1.decodeFrame(f)), verifyGrid(p2.decodeFrame(f)))
          if (d <= maxMeanDiff) {
            confirmed += 1
            if (d > worst) worst = d
          }
          f += 1
        }
        if (confirmed >= minFrames)
          Some(Row.fromSeq(row.toSeq.take(nPairCols) :+ confirmed :+ worst))
        else None
      }
    }(Encoders.row(outSchema))
  }

  /** The 9×8 grayscale grid dHash reads — the verification evidence. */
  private def verifyGrid(d: Decoded): Array[Float] = resize(toGray(d), 9, 8).data

  /** Mean absolute difference of two equal-length grids, in [0, 1]. */
  private def gridMad(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s / a.length
  }

  /** MEDIA data card — the [[TextAnalysis.corpusReport]] counterpart
    * for an asset table: asset/null/decode-failure counts, byte sizes,
    * dimension totals, and fingerprint-collision statistics, in ONE
    * decode pass. DELIBERATELY integer-only aggregates (the corpus
    * report's bit-exactness rule — derive means downstream). Decode
    * failures COUNT rather than kill the card (a release report must
    * describe a dirty corpus, not crash on it); every other surface in
    * this module still fails loudly on corrupt assets. Fingerprint
    * stats use the modality's scalar hash (frame 0 for video — the
    * collision profile of clip heads); `n_distinct_fingerprints` far
    * below `n_decoded` or a large `max_fingerprint_group` is the
    * first sign a near-dup pass is overdue. */
  def mediaReport(
      df: DataFrame,
      modality: String,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame =
    mediaReportFrom(
      mediaReportRows(df, modality, idCol, contentCol, metaCol, batchSize),
      modality)

  /** The per-asset decode stage of [[mediaReport]]: one row per asset
    * `(bytes, status, w, h, units, sig)` — status 0 ok / 1 null
    * content / 2 decode failed. Split out so the aggregate stage is
    * independently consumable: the q136 gate dumps this frame and
    * DuckDB replays [[mediaReportFrom]]'s arithmetic over it (the
    * decode itself is the only rows-only step). */
  def mediaReportRows(
      df: DataFrame,
      modality: String,
      idCol: String = "asset_id",
      contentCol: String = "content",
      metaCol: String = "meta",
      batchSize: Int = 64): DataFrame = {
    require(Set("image", "audio", "video")(modality),
      s"mediaReport modality must be image | audio | video, got '$modality'")
    locally {
      val schema = StructType(Seq(
        StructField("bytes", LongType, nullable = false),
        StructField("status", IntegerType, nullable = false), // 0 ok, 1 null, 2 failed
        StructField("w", LongType, nullable = false),
        StructField("h", LongType, nullable = false),
        StructField("units", LongType, nullable = false), // samples / frames / 1
        StructField("sig", LongType, nullable = true)))
      val (cIdx, mIdx) = (df.columns.indexOf(contentCol), df.columns.indexOf(metaCol))
      df.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val content = row.getAs[Array[Byte]](cIdx)
            if (content == null) Row(0L, 1, 0L, 0L, 0L, null)
            else {
              val meta = Option(row.getMap[String, String](mIdx))
                .map(_.toMap).getOrElse(Map.empty[String, String])
              try {
                modality match {
                  case "image" =>
                    val d = ImageIoDecoder.decode(content, meta)
                    Row(content.length.toLong, 0, d.width.toLong, d.height.toLong,
                      1L, dHash64(d))
                  case "audio" =>
                    val d = WavDecoder.decode(content, meta)
                    Row(content.length.toLong, 0, 0L, 0L, d.width.toLong,
                      audioHash64(d))
                  case "video" =>
                    val p = Avi.parse(content)
                    Row(content.length.toLong, 0, p.width.toLong, p.height.toLong,
                      p.frames.length.toLong,
                      if (p.frames.isEmpty) null else dHash64(p.decodeFrame(0)))
                }
              } catch {
                case scala.util.control.NonFatal(_) =>
                  Row(content.length.toLong, 2, 0L, 0L, 0L, null)
              }
            }
          }
        }
      }(Encoders.row(schema))
    }
  }

  /** The aggregate stage of [[mediaReport]]: the data-card arithmetic
    * over a [[mediaReportRows]] frame — pure SQL-replayable counts,
    * sums, and fingerprint-group stats. */
  def mediaReportFrom(perAsset: DataFrame, modality: String): DataFrame = {
    val base = perAsset.agg(
      count(lit(1)).as("n_assets"),
      sum((col("status") === 1).cast("long")).as("n_null_content"),
      sum((col("status") === 2).cast("long")).as("n_decode_failed"),
      sum(col("bytes")).as("total_bytes"),
      min(when(col("status") === 0, col("bytes"))).as("min_bytes"),
      max(when(col("status") === 0, col("bytes"))).as("max_bytes"),
      sum(when(col("status") === 0, col("w"))).as("total_width"),
      sum(when(col("status") === 0, col("h"))).as("total_height"),
      sum(when(col("status") === 0, col("units"))).as("total_units"))
    val sigStats = perAsset.filter(col("sig").isNotNull)
      .groupBy(col("sig")).agg(count(lit(1)).as("__g"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_distinct_fingerprints"),
        coalesce(max(col("__g")), lit(0L)).as("max_fingerprint_group"))
    base.crossJoin(sigStats).withColumn("modality", lit(modality))
  }

  /** Re-render a REAL asset's content through a genuinely different
    * encoding of the same signal — the per-corpus calibration twin
    * (MediaDedup `calibrate` mode): image → the JDK JPEG codec over the
    * decoded pixels, audio → a half-volume 16-bit re-render, video →
    * MJPEG over the decoded frames. Twin fingerprint distances measured
    * on the corpus's OWN assets turn the gate fixtures' envelope claim
    * into per-corpus evidence. */
  private[graft] def calibrationTwin(
      modality: String, content: Array[Byte], meta: Map[String, String]): Array[Byte] =
    modality match {
      case "image" => Avi.encodeJpegFrame(ImageIoDecoder.decode(content, meta))
      case "audio" =>
        val d = WavDecoder.decode(content, meta)
        encodeWav(Decoded(d.width, 1, d.channels, d.data.map(_ * 0.5f)))
      case "video" =>
        val p = Avi.parse(content)
        encodeAvi((0 until p.frames.length).map(p.decodeFrame), mjpeg = true)
      case other => throw new IllegalArgumentException(
        s"calibrationTwin modality must be image | audio | video, got '$other'")
    }

  /** Replace each asset's content with its [[calibrationTwin]] — the
    * distributed form the calibrate mode maps over its sample. */
  def reencodeAsCalibrationTwin(
      df: DataFrame,
      modality: String,
      contentCol: String = "content",
      metaCol: String = "meta"): DataFrame = {
    val schema = df.schema
    val cIdx = df.columns.indexOf(contentCol)
    val mIdx = df.columns.indexOf(metaCol)
    df.mapPartitions { it =>
      it.map { row =>
        val content = row.getAs[Array[Byte]](cIdx)
        if (content == null) row
        else {
          val meta = Option(row.getMap[String, String](mIdx))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          Row.fromSeq(row.toSeq.updated(cIdx,
            calibrationTwin(modality, content, meta)))
        }
      }
    }(Encoders.row(schema))
  }

  /** Wrap any table into the media layout for tests/examples: content =
    * utf-8 bytes of a string column, metadata from literal entries. */
  def asMediaTable(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      mediaType: String,
      meta: Map[String, String]): DataFrame = {
    val metaEntries = meta.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq
    // an EMPTY meta must still be map<string,string>: a zero-arg map()
    // infers map<void,void>, and any downstream mapPartitions that
    // re-encodes rows under that schema writes null keys (then
    // element_at NPEs on the null-key comparison)
    val metaExpr =
      if (metaEntries.isEmpty) typedlit(Map.empty[String, String])
      else map(metaEntries: _*)
    df.select(
      col(idCol).as("asset_id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("content"),
      metaExpr.as("meta"))
  }
}
