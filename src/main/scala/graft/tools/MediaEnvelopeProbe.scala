package graft.tools

/** Envelope evidence for the round-13 DCT-tier decision: do realistic
  * blur / re-quantization twins fall OUTSIDE the scalar dHash radius
  * the image gates run at (3 bits), and does a DCT pHash separate them
  * where dHash cannot?
  *
  * Per plate family (smooth q129 plates, anisotropic q137 plates, and
  * the seed-random-spectrum TEXTURED family the DCT tier's q144
  * fixture uses), per transform (3×3 box blur; JPEG at quality 0.3; a
  * double JPEG 0.75 → 0.5 chain; blur-then-JPEG-0.3), the probe
  * reports the twin Hamming distribution (max/mean) against the
  * cross-seed stranger minimum over the same hashes — for dHash AND
  * pHash. Driver-side only — 150 seeds × a few transforms is not a
  * Spark job. Output is quoted in DESIGN.md: the smooth/asym families
  * are DEGENERATE for a DCT hash (single-sinusoid spectra collapse
  * the AC sign pattern → cross-seed pHash collisions at 0 bits),
  * which is why the DCT tier's fixture family is the textured one. */
object MediaEnvelopeProbe {
  import graft.llm.Multimodal
  import graft.llm.Multimodal.Decoded

  private def decode(bytes: Array[Byte]): Decoded =
    Multimodal.ImageIoDecoder.decode(bytes, Map.empty)

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 150
    for ((famName, plate) <- Seq(
        "smooth" -> ((s: Long) => Multimodal.smoothImage(s)),
        "asym" -> ((s: Long) => Multimodal.smoothImageAsym(s)),
        "textured" -> ((s: Long) => Multimodal.texturedImage(s)))) {
      // canonical hashes: PNG-rendered plates, decoded back (the gates'
      // own base-side pipeline)
      val base = (0 until n).map { s =>
        decode(Multimodal.encodePng(plate(s.toLong)))
      }
      val transforms: Seq[(String, Decoded => Array[Byte])] = Seq(
        "blur3x3" -> (d => Multimodal.encodePng(Multimodal.boxBlur3(d))),
        "jpeg_q30" -> (d => Multimodal.jpegBytesAtQuality(d, 0.3f)),
        "jpeg_q75_then_q50" -> (d => Multimodal.jpegBytesAtQuality(
          decode(Multimodal.jpegBytesAtQuality(d, 0.75f)), 0.5f)),
        "blur_then_jpeg30" -> (d => Multimodal.jpegBytesAtQuality(
          Multimodal.boxBlur3(d), 0.3f)))
      for ((hashName, hash) <- Seq(
          "dhash" -> ((d: Decoded) => Multimodal.dHash64(d)),
          "phash" -> ((d: Decoded) => Multimodal.pHash64(d)))) {
        val h0 = base.map(hash)
        var strangerMin = 64
        for (i <- 0 until n; j <- (i + 1) until n) {
          val d = java.lang.Long.bitCount(h0(i) ^ h0(j))
          if (d < strangerMin) strangerMin = d
        }
        for ((label, f) <- transforms) {
          val ds = (0 until n).map { s =>
            java.lang.Long.bitCount(h0(s) ^ hash(decode(f(base(s)))))
          }
          println(f"$famName%-8s $hashName%-5s $label%-18s twin max ${ds.max}%2d  " +
            f"mean ${ds.sum.toDouble / n}%5.2f  stranger min $strangerMin%2d")
        }
      }
    }
    tierComposites(n)
  }

  /** Round-14 (verdict item 7): do blur/re-quantization COMPOSITES of
    * the crop and rotation arrivals fall outside the dHash kernels the
    * tile/dihedral tiers run at — and would a pHash kernel hold them?
    *
    * Crop tier: the stored state holds the original's tile hashes; a
    * center-crop arrival matches its full frame (tile 0) against the
    * original's center half (tile 5). Twin distance here = that exact
    * comparison with the arrival degraded (JPEG q0.3 / blur+JPEG)
    * after cropping; stranger = the same slot comparison cross-seed.
    *
    * Rotation tier: the arrival's eight orientations compare against
    * the stored canonical (the q137 witness direction). Twin distance
    * = min over the degraded rotated arrival's orientations vs the
    * original's hash; stranger = the same minimum cross-seed (the
    * honest comparison — the tier itself takes that minimum, so a
    * stranger gets it too). Textured family only: the smooth families
    * are DCT-degenerate (above) and the crop fixture family for q135
    * is anisotropic, measured separately in the base loop. */
  private def tierComposites(n: Int): Unit = {
    val plates = (0 until n).map(s =>
      decode(Multimodal.encodePng(Multimodal.texturedImage(s.toLong))))
    val degrades: Seq[(String, Decoded => Decoded)] = Seq(
      "png" -> (d => decode(Multimodal.encodePng(d))),
      "jpeg_q30" -> (d => decode(Multimodal.jpegBytesAtQuality(d, 0.3f))),
      "blur_then_jpeg30" -> (d => decode(
        Multimodal.jpegBytesAtQuality(Multimodal.boxBlur3(d), 0.3f))))
    for ((hashName, hash) <- Seq(
        "dhash" -> ((d: Decoded) => Multimodal.dHash64(d)),
        "phash" -> ((d: Decoded) => Multimodal.pHash64(d)))) {
      // ---- crop tier: orig tile-5 (center half) vs degraded crop tile-0
      val tile5 = plates.map { d =>
        hash(Multimodal.cropRegion(d, d.width / 4, d.height / 4,
          d.width / 2, d.height / 2))
      }
      for ((label, deg) <- degrades) {
        val cropHash = plates.map { d =>
          hash(deg(Multimodal.cropRegion(d, d.width / 4, d.height / 4,
            d.width / 2, d.height / 2)))
        }
        val twins = (0 until n).map(s =>
          java.lang.Long.bitCount(tile5(s) ^ cropHash(s)))
        var strangerMin = 64
        for (i <- 0 until n; j <- 0 until n if i != j) {
          val d = java.lang.Long.bitCount(tile5(i) ^ cropHash(j))
          if (d < strangerMin) strangerMin = d
        }
        println(f"tier=crop     $hashName%-5s $label%-18s twin max ${twins.max}%2d  " +
          f"mean ${twins.sum.toDouble / n}%5.2f  stranger min $strangerMin%2d")
      }
      // ---- rotation tier: degraded rot90 arrival's 8 orientations vs
      // the stored canonical, min-witness on both twin AND stranger
      val canon = plates.map(hash)
      for ((label, deg) <- degrades) {
        val arrivalOrients = plates.map { d =>
          val arrival = deg(Multimodal.dihedral(d, 1))
          (0 until 8).map(k => hash(Multimodal.dihedral(arrival, k)))
        }
        def minDist(i: Int, j: Int): Int =
          arrivalOrients(j).map(h =>
            java.lang.Long.bitCount(canon(i) ^ h)).min
        val twins = (0 until n).map(s => minDist(s, s))
        var strangerMin = 64
        for (i <- 0 until n; j <- 0 until n if i != j) {
          val d = minDist(i, j)
          if (d < strangerMin) strangerMin = d
        }
        println(f"tier=rotation $hashName%-5s $label%-18s twin max ${twins.max}%2d  " +
          f"mean ${twins.sum.toDouble / n}%5.2f  stranger min $strangerMin%2d")
      }
    }
    wideEnvelope(n)
    cropTileScale(n)
  }

  /** Round-15 (verdict item 6): degraded-crop recall — the r14
    * measurement closed the kernel-swap hypothesis (global dHash AND
    * global pHash both fail on blur/JPEG'd crops); the next candidate
    * is hashing each crop-hypothesis slot with a DCT AT THE TILE'S OWN
    * SCALE (no resize through the global 32×32 kernel front end — an
    * N-point 2-D DCT over the tile's native pixels, top 8×8 AC-sign
    * block). Comparison is the crop tier's exact slot: orig tile-5
    * (center half) vs the DEGRADED arrival's tile-0 (its full frame),
    * twins same-seed, strangers cross-seed, textured family. */
  private def cropTileScale(n: Int): Unit = {
    def dctNative(d: Decoded): Long = {
      val g = Multimodal.toGray(d)
      val (w, h) = (g.width, g.height)
      val cx = Array.tabulate(8, w)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / (2.0 * w)))
      val cy = Array.tabulate(8, h)((v, y) =>
        math.cos((2 * y + 1) * v * math.Pi / (2.0 * h)))
      val block = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { s += g.data(y * w + x) * cx(u)(x) * cy(v)(y); x += 1 }
            y += 1
          }
          block(v * 8 + u) = s
          u += 1
        }
        v += 1
      }
      var mean = 0.0
      var i = 1
      while (i < 64) { mean += block(i); i += 1 }
      mean /= 63.0
      var hh = 0L
      i = 0
      while (i < 64) { hh = (hh << 1) | (if (block(i) > mean) 1L else 0L); i += 1 }
      hh
    }
    val plates = (0 until n).map(s =>
      decode(Multimodal.encodePng(Multimodal.texturedImage(s.toLong))))
    val degrades: Seq[(String, Decoded => Decoded)] = Seq(
      "png" -> (d => decode(Multimodal.encodePng(d))),
      "jpeg_q30" -> (d => decode(Multimodal.jpegBytesAtQuality(d, 0.3f))),
      "blur_then_jpeg30" -> (d => decode(
        Multimodal.jpegBytesAtQuality(Multimodal.boxBlur3(d), 0.3f))))
    val tile5 = plates.map { d =>
      dctNative(Multimodal.cropRegion(d, d.width / 4, d.height / 4,
        d.width / 2, d.height / 2))
    }
    for ((label, deg) <- degrades) {
      val cropHash = plates.map { d =>
        dctNative(deg(Multimodal.cropRegion(d, d.width / 4, d.height / 4,
          d.width / 2, d.height / 2)))
      }
      val twins = (0 until n).map(s =>
        java.lang.Long.bitCount(tile5(s) ^ cropHash(s)))
      var strangerMin = 64
      for (i <- 0 until n; j <- 0 until n if i != j) {
        val d = java.lang.Long.bitCount(tile5(i) ^ cropHash(j))
        if (d < strangerMin) strangerMin = d
      }
      println(f"tier=crop     dctN  $label%-18s twin max ${twins.max}%2d  " +
        f"mean ${twins.sum.toDouble / n}%5.2f  stranger min $strangerMin%2d")
    }
  }

  /** Round-15: the 256-bit DCT kernel's envelope — picks the wide dct
    * tier's default radius the way the 64-bit tiers' defaults were
    * picked (measured twin max vs cross-seed stranger min, per plate
    * family and transform). Also reports the smooth-family negative:
    * the single-sinusoid degeneracy is a property of the SPECTRUM, so
    * quadrupling the sign evidence must not be claimed to fix it
    * without measurement. */
  private def wideEnvelope(n: Int): Unit = {
    def ham(a: Array[Long], b: Array[Long]): Int = {
      var s = 0; var i = 0
      while (i < a.length) { s += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
      s
    }
    val transforms: Seq[(String, Decoded => Array[Byte])] = Seq(
      "blur3x3" -> (d => Multimodal.encodePng(Multimodal.boxBlur3(d))),
      "jpeg_q30" -> (d => Multimodal.jpegBytesAtQuality(d, 0.3f)),
      "jpeg_q75_then_q50" -> (d => Multimodal.jpegBytesAtQuality(
        decode(Multimodal.jpegBytesAtQuality(d, 0.75f)), 0.5f)),
      "blur_then_jpeg30" -> (d => Multimodal.jpegBytesAtQuality(
        Multimodal.boxBlur3(d), 0.3f)))
    for ((famName, plate) <- Seq(
        "smooth" -> ((s: Long) => Multimodal.smoothImage(s)),
        "textured" -> ((s: Long) => Multimodal.texturedImage(s)),
        "texwide" -> ((s: Long) => Multimodal.texturedImageWide(s)))) {
      val base = (0 until n).map(s => decode(Multimodal.encodePng(plate(s.toLong))))
      val h0 = base.map(Multimodal.pHash256)
      var strangerMin = 256
      for (i <- 0 until n; j <- (i + 1) until n) {
        val d = ham(h0(i), h0(j))
        if (d < strangerMin) strangerMin = d
      }
      for ((label, f) <- transforms) {
        val ds = (0 until n).map { s =>
          ham(h0(s), Multimodal.pHash256(decode(f(base(s)))))
        }
        println(f"$famName%-8s ph256 $label%-18s twin max ${ds.max}%3d  " +
          f"mean ${ds.sum.toDouble / n}%6.2f  stranger min $strangerMin%3d")
      }
    }
  }
}
