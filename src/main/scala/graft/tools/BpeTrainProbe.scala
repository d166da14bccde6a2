package graft.tools

/** Round-6 probe: BpeTrainer.learnFromCounts at production vocab —
  * 32k merges over a 1M-word Zipf-weighted table (the top-maxWords cut
  * a 5M-doc corpus would hand the driver loop). Driver-only: the
  * Spark-side pretoken aggregate is already measured in ScaleProbe;
  * this times the sequential merge loop the r5 verdict flagged as
  * linear-argmax-bound. No Spark session needed.
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val numWords = args.headOption.map(_.toInt).getOrElse(1 << 20)
    val numMerges = if (args.length > 1) args(1).toInt else 32768
    val rnd = new scala.util.Random(4233L)
    // natural-ish words: skewed letter unigrams (English-like ranks so
    // pair counts overlap heavily, the hard case for invalidation),
    // lengths 2..14, Zipf(1.1) frequency by rank
    val letters = "etaoinshrdlcumwfgypbvkjxqz"
    def word(): String = {
      val len = 2 + rnd.nextInt(13)
      val sb = new StringBuilder(len)
      var i = 0
      while (i < len) {
        // quadratic skew toward the head of the frequency ranking
        val r = rnd.nextDouble()
        sb += letters((r * r * letters.length).toInt.min(letters.length - 1))
        i += 1
      }
      sb.result()
    }
    val seen = scala.collection.mutable.HashSet.empty[String]
    while (seen.size < numWords) seen += word()
    val counts = seen.toSeq.sorted.zipWithIndex.map { case (w, i) =>
      w -> math.max(1L, (1e9 / math.pow(i + 1.0, 1.1)).toLong)
    }
    println(s"[bpeprobe] table: $numWords words, merges target: $numMerges")
    val t0 = System.nanoTime()
    val merges = graft.llm.BpeTrainer.learnFromCounts(counts, numMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpeprobe] learned ${merges.length} merges in $sec%.1f s " +
      f"(${merges.length / sec}%.0f merges/s); first 5: ${merges.take(5)}")
  }
}
