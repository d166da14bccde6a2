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
  * Codecs: images decode through the REAL JDK codecs
  * ([[Multimodal.ImageIoDecoder]]: PNG/JPEG/GIF/BMP) and audio through
  * the REAL JDK sampled-sound stack ([[Multimodal.WavDecoder]]:
  * WAV/AIFF/AU) — both zero-dependency. Only VIDEO, which has no JDK
  * codec, goes through the deterministic `FakeDecoder` stand-in.
  * Everything around the decoders — the schema contract, the batched
  * `mapPartitions` shape, frame-index explosion, resize arithmetic —
  * is shared; a real video codec is one more trait implementation.
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

  /** Deterministic fake codec — the VIDEO-only stand-in (images and
    * audio decode for real via [[ImageIoDecoder]] / [[WavDecoder]]):
    * "decodes" bytes into a small pseudo-frame whose values are a
    * hash-seeded function of the content. The JDK ships no video codec;
    * replace this impl, keep the plumbing. */
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
    * normalized to [0,1]. Exotic formats (video, audio) still go through
    * [[FakeDecoder]] — that is the honest boundary in this container. */
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
    * stand-in (video), so stand-in features can never silently pass as
    * real ones downstream. */
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

  /** Wrap any table into the media layout for tests/examples: content =
    * utf-8 bytes of a string column, metadata from literal entries. */
  def asMediaTable(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      mediaType: String,
      meta: Map[String, String]): DataFrame = {
    val metaEntries = meta.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq
    df.select(
      col(idCol).as("asset_id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("content"),
      map(metaEntries: _*).as("meta"))
  }
}
