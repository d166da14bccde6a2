package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece vocabulary LEARNING (Schuster & Nakajima 2012; the
  * likelihood-criterion variant of the BPE merge loop): symbols start
  * as single codepoints (word-initial bare, continuations `##`-prefixed
  * — the BERT representation), and each round merges the adjacent pair
  * maximizing `count(l,r) / (count(l) × count(r))` — the pair whose
  * merge most increases a unigram language model's corpus likelihood —
  * rather than BPE's raw `count(l,r)`. The trained `vocab.txt` (one
  * token per line, the published BERT format) drives the
  * `graft_wordpiece_*` expression family
  * ([[graft.functions.WordPieceVocab]]).
  *
  * Division of labor (the [[BpeTrainer.learnMerges]] split, same
  * `maxWords` contract): Spark does the corpus-scale pretoken
  * frequency aggregate under the exact [[graft.functions.BpeVocab]]
  * pretokenization; below `maxWords` distinct pretokens the merge loop
  * runs in-heap over the collected table, above it the DISTRIBUTED
  * loop engages (per round: one pair-count aggregate + one symbol-
  * count aggregate, scores joined against the broadcast-small symbol
  * table, only the top-`batchK` rows reaching the driver).
  *
  * The in-heap argmax is a lazy-invalidation max-heap like the BPE
  * trainer's, with one likelihood-specific extension: an entry stores
  * all THREE counts its score was computed from (pair, left symbol,
  * right symbol) and is live at pop only while all three are current —
  * a merge changes the counts of its own symbols everywhere, so pairs
  * in untouched words can still change SCORE, and a per-symbol pair
  * index re-pushes them.
  *
  * Determinism: ties on score break by the lexicographically smallest
  * `(left, right)` — never hash-map order — so the same corpus always
  * learns the same vocabulary. Batch rounds on the distributed path
  * apply only a pairwise NON-INTERACTING prefix of the top pairs (no
  * shared symbol or product — exactly the condition under which both
  * a pair's count and its score are unaffected by the other merges in
  * the batch).
  */
object WordPieceTrainer {

  /** BERT's control tokens, in their conventional id order. */
  val DefaultSpecials: Seq[String] = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")

  /** WordPiece base split: first codepoint bare, the rest `##`-prefixed
    * (surrogate pairs stay whole). */
  private[graft] def units(w: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var first = true
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      val cp = w.substring(i, i + n)
      out += (if (first) cp else "##" + cp)
      first = false
      i += n
    }
    out.toIndexedSeq
  }

  /** Merge product: continuations drop their `##` when glued onto the
    * left symbol (the right element of an adjacent pair is always a
    * continuation — position ≥ 1). */
  private[graft] def product(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** Merge all non-overlapping occurrences left to right — the greedy
    * application order, shared by both paths. Returns `syms` unchanged
    * (same reference) when the pair is absent. */
  private def applyMergeTo(
      syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    var has = false
    var i = 0
    while (!has && i < syms.length - 1) {
      has = syms(i) == a && syms(i + 1) == b; i += 1
    }
    if (!has) syms
    else {
      val merged = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = 0
      while (p < syms.length) {
        if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
          merged += product(a, b); p += 2
        } else { merged += syms(p); p += 1 }
      }
      merged.toIndexedSeq
    }
  }

  /** Learn a WordPiece vocabulary of (at most) `vocabSize` tokens:
    * `specials`, then the corpus alphabet (distinct base units, sorted),
    * then merge products in learned order. Stops early when no adjacent
    * pair occurs twice. */
  def learnVocab(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      specials: Seq[String] = DefaultSpecials,
      maxWords: Int = 1 << 20,
      batchK: Int = 8,
      checkpointEvery: Int = 12): Seq[String] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(specials.contains("[UNK]"),
      "wordpiece specials must include [UNK] — greedy matching needs a failure token")
    val counts = BpeTrainer.pretokenCounts(df, textCol)
    val top = counts
      .orderBy(desc("n"), asc("word")).limit(maxWords + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val (alphabet, merges) =
      if (top.size <= maxWords) {
        val alpha = top.iterator.flatMap(e => units(e._1)).toSeq.distinct.sorted
        val numMerges = vocabSize - specials.size - alpha.size
        require(numMerges > 0,
          s"vocabSize=$vocabSize leaves no room for merges over an alphabet of " +
            s"${alpha.size} plus ${specials.size} specials")
        (alpha, learnFromCounts(top, numMerges))
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        val alpha = counts.select(col("word")).as[String]
          .flatMap(units(_)).distinct().collect().sorted.toSeq
        val numMerges = vocabSize - specials.size - alpha.size
        require(numMerges > 0,
          s"vocabSize=$vocabSize leaves no room for merges over an alphabet of " +
            s"${alpha.size} plus ${specials.size} specials")
        (alpha, learnDistributedFromCounts(counts, numMerges, batchK, checkpointEvery))
      }
    val out = new scala.collection.mutable.LinkedHashSet[String]
    specials.foreach(out += _)
    alphabet.foreach(out += _)
    merges.foreach { case (a, b) => out += product(a, b) }
    out.toSeq
  }

  /** The in-heap likelihood-scored merge loop over a word-frequency
    * table. Per-merge cost is proportional to the words containing the
    * chosen pair plus the pairs whose SCORE the merge perturbed (those
    * sharing a symbol — tracked in the per-symbol index), never the
    * vocabulary. */
  def learnFromCounts(
      wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      wordCounts.iterator.filter(_._1.nonEmpty)
        .map { case (w, c) => (mutable.ArrayBuffer(units(w): _*), c) }.toArray
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val symCount = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // every pair a symbol has EVER participated in — stale entries are
    // filtered by the heap's liveness check, precise upkeep would cost
    // more than the re-pushes it saves
    val symPairs = mutable.HashMap.empty[String, mutable.Set[(String, String)]]
    val touched = mutable.HashSet.empty[(String, String)]
    def adjustWord(wi: Int, sign: Long): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        val n = symCount.getOrElse(s, 0L) + sign * c
        if (n == 0L) symCount.remove(s) else symCount(s) = n
        if (i < syms.length - 1) {
          val p = (s, syms(i + 1))
          val pn = pairCount.getOrElse(p, 0L) + sign * c
          if (pn == 0L) pairCount.remove(p) else pairCount(p) = pn
          touched += p
          if (sign > 0) {
            pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
            symPairs.getOrElseUpdate(p._1, mutable.Set.empty) += p
            symPairs.getOrElseUpdate(p._2, mutable.Set.empty) += p
          }
        }
        i += 1
      }
    }
    words.indices.foreach(adjustWord(_, 1L))
    // heap entry: (score-counts snapshot, pair); live iff all three
    // counts are still current. Order: score desc, then (l, r) asc.
    final case class Entry(pn: Long, ln: Long, rn: Long, l: String, r: String) {
      def score: Double = pn.toDouble / (ln.toDouble * rn.toDouble)
    }
    val heap = new java.util.PriorityQueue[Entry](64,
      new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int = {
          val byS = java.lang.Double.compare(b.score, a.score)
          if (byS != 0) byS
          else {
            val byL = a.l.compareTo(b.l)
            if (byL != 0) byL else a.r.compareTo(b.r)
          }
        }
      })
    def pushTouched(): Unit = {
      touched.foreach { p =>
        val pn = pairCount.getOrElse(p, 0L)
        if (pn > 1L) {
          val ln = symCount.getOrElse(p._1, 0L)
          val rn = symCount.getOrElse(p._2, 0L)
          if (ln > 0L && rn > 0L) { heap.add(Entry(pn, ln, rn, p._1, p._2)); () }
        }
      }
      touched.clear()
    }
    pushTouched()
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      var best: Entry = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        if (pairCount.getOrElse((e.l, e.r), 0L) == e.pn &&
            symCount.getOrElse(e.l, 0L) == e.ln &&
            symCount.getOrElse(e.r, 0L) == e.rn) best = e
      }
      if (best == null) exhausted = true
      else {
        val pair = (best.l, best.r)
        merges += pair
        val affected = pairWords.getOrElse(pair, mutable.Set.empty).toArray.sorted
        for (wi <- affected) {
          val (syms, _) = words(wi)
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == best.l && syms(i + 1) == best.r; i += 1
          }
          if (has) {
            adjustWord(wi, -1L)
            val merged = applyMergeTo(syms.toIndexedSeq, best.l, best.r)
            syms.clear(); syms ++= merged
            adjustWord(wi, 1L)
          }
        }
        // the merge changed count(l), count(r), count(product)
        // everywhere — every pair involving them has a new score even
        // in untouched words
        val prod = product(best.l, best.r)
        Seq(best.l, best.r, prod).foreach { s =>
          symPairs.get(s).foreach(ps => touched ++= ps)
        }
        pushTouched()
      }
    }
    merges.toSeq
  }

  /** The DISTRIBUTED likelihood-scored loop (the
    * [[BpeTrainer.learnMergesDistributedFromCounts]] shape): per round,
    * one adjacent-pair aggregate and one symbol aggregate over the
    * cached symbol table, scores computed by joining pair counts
    * against the broadcast-small symbol counts, top-`batchK` collected,
    * and the maximal pairwise non-interacting prefix applied in one
    * pass. Driver memory is O(batchK + merges + |symbols|); lineage is
    * cut with explicit RDD-level checkpoints like the BPE loop. */
  def learnDistributedFromCounts(
      counts: DataFrame, // (word: String, n: Long)
      numMerges: Int,
      batchK: Int = 8,
      checkpointEvery: Int = 12): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(batchK > 0, s"batchK must be positive, got $batchK")
    val spark = counts.sparkSession
    import spark.implicits._
    import scala.collection.mutable
    var words = counts.select(col("word"), col("n").cast("long"))
      .as[(String, Long)]
      .filter(_._1.nonEmpty)
      .map { case (w, n) => (units(w): Seq[String], n) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count()
    var liveCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var round = 0
    try {
      while (merges.size < numMerges && !exhausted) {
        val want = math.min(batchK, numMerges - merges.size)
        val syms = words.flatMap { case (ss, n) => ss.iterator.map((_, n)) }
          .toDF("s", "c").groupBy("s").agg(sum("c").as("sc"))
        val top = words.flatMap { case (ss, n) =>
            (0 until ss.length - 1).iterator.map(i => (ss(i), ss(i + 1), n))
          }.toDF("l", "r", "c")
          .groupBy("l", "r").agg(sum("c").as("cnt"))
          .filter(col("cnt") > 1)
          .join(broadcast(syms).withColumnRenamed("s", "l").withColumnRenamed("sc", "lc"), "l")
          .join(broadcast(syms).withColumnRenamed("s", "r").withColumnRenamed("sc", "rc"), "r")
          .withColumn("score",
            col("cnt").cast("double") / (col("lc").cast("double") * col("rc").cast("double")))
          .orderBy(desc("score"), asc("l"), asc("r"))
          .limit(want)
          .select("l", "r")
          .collect()
          .map(r => (r.getString(0), r.getString(1)))
        if (top.isEmpty) exhausted = true
        else {
          val accepted = mutable.ArrayBuffer.empty[(String, String)]
          val involved = mutable.HashSet.empty[String]
          var stop = false
          for ((l, r) <- top if !stop) {
            if (involved(l) || involved(r) || involved(product(l, r))) stop = true
            else {
              accepted += ((l, r))
              involved += l; involved += r; involved += product(l, r)
            }
          }
          val batch = accepted.toArray
          val next = words.map { case (ss, n) =>
            var cur = ss.toIndexedSeq
            batch.foreach { case (a, b) => cur = applyMergeTo(cur, a, b) }
            (cur: Seq[String], n)
          }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          words.unpersist()
          words =
            if (round % checkpointEvery == checkpointEvery - 1) {
              val ckpt = next.rdd.localCheckpoint()
              ckpt.count()
              next.unpersist()
              liveCkpt.foreach(_.unpersist(blocking = false))
              liveCkpt = Some(ckpt)
              spark.createDataset(ckpt)
            } else next
          merges ++= batch
          round += 1
        }
      }
      merges.toSeq
    } finally {
      words.unpersist()
      liveCkpt.foreach(_.unpersist(blocking = false))
    }
  }

  /** Write the vocab in the published `vocab.txt` format (one token per
    * line, id = line number) — what [[graft.functions.WordPieceVocab]]
    * and any BERT-family tool load. */
  def save(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      vocab: Seq[String]): Unit = {
    require(vocab.contains("[UNK]"), "wordpiece vocab must contain [UNK]")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try vocab.foreach { t => out.write(t); out.write('\n') }
    finally out.close()
  }
}
