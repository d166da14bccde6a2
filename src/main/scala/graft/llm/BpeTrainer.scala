package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table LEARNING (Sennrich et al. 2016, arXiv:1508.07909) —
  * the tokenizer-training side of the BPE surface in
  * [[graft.functions.BpeVocab]] (which consumes published merge
  * tables): train on a corpus, save `merges.txt`, and every existing
  * consumer (`graft_bpe_count`/`graft_bpe_segments`/`graft_bpe_chunks`,
  * the Curator's `bpe-merges` knob) runs the learned tokenizer.
  *
  * Division of labor (a merge decision depends on the counts AFTER the
  * previous merge — the loop is inherently sequential in MERGE RANK,
  * but each round's pair COUNTING distributes):
  *  - Spark always does the corpus-scale part: pretokenize (the exact
  *    [[graft.functions.BpeVocab.pretokenRegex]] contract — counting
  *    under any other tokenization would learn merges that don't
  *    round-trip through segmentation) and aggregate word frequencies.
  *    One explode + one shuffle; partial aggregation collapses repeats
  *    map-side, so the shuffle carries distinct words per partition.
  *  - Below `maxWords` distinct pretokens the merge loop runs
  *    driver-side over the top-`maxWords` rows of that table (a
  *    deterministic `TakeOrdered` cut: by count desc, then word —
  *    never a hash-order-dependent `limit`); driver memory is bounded
  *    by `maxWords` and per-merge cost by the inverted index.
  *  - ABOVE the cut the loop itself distributes
  *    ([[learnMergesDistributedFromCounts]]): the symbol table stays a
  *    cached Dataset, each round re-counts pairs with one aggregation,
  *    and only the top-`batchK` pairs ever reach the driver — the
  *    256k-merge multilingual-vocabulary shape, no truncated tail.
  *
  * Determinism: merge selection is max count with ties broken by the
  * lexicographically smallest `(left, right)` — byte-order ties, NOT
  * hash-map iteration order — so the same corpus always learns the
  * same table. Merge application mirrors `segmentWord` exactly (all
  * non-overlapping occurrences, left to right), so re-segmenting a
  * training word with the learned table reproduces the trainer's own
  * final symbols.
  */
object BpeTrainer {

  /** Corpus pretoken frequencies: `(word, n)`, one shuffle. */
  def pretokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(graft.functions.BpeVocab.pretokenRegex), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges from a corpus. Below `maxWords` distinct
    * pretokens the merge loop runs in-heap over the collected frequency
    * table ([[learnFromCounts]] — fastest, exact); above it the
    * DISTRIBUTED loop engages ([[learnMergesDistributedFromCounts]]) so
    * driver memory stays flat instead of silently truncating the tail
    * of a larger-than-`maxWords` vocabulary. */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1 << 20,
      batchK: Int = 16,
      resumeFrom: Seq[(String, String)] = Nil,
      onProgress: Seq[(String, String)] => Unit = _ => (),
      checkpointEvery: Int = 12): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val counts = pretokenCounts(df, textCol)
    // one extra row beyond the cut tells us whether the cut truncates
    val top = counts
      .orderBy(desc("n"), asc("word")).limit(maxWords + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // resume only matters on the distributed path (the multi-hour
    // runs); the in-heap trainer is fast enough to just retrain
    if (top.size <= maxWords) learnFromCounts(top, numMerges)
    else learnMergesDistributedFromCounts(counts, numMerges, batchK,
      checkpointEvery, resumeFrom, onProgress)
  }

  /** The driver-side merge loop over a word-frequency table. Cost per
    * merge is proportional to the words CONTAINING the chosen pair
    * (tracked in an inverted index), not the vocabulary — the standard
    * incremental trainer shape. The argmax is a lazy-invalidation
    * max-heap: each merge pushes fresh `(count, pair)` entries only for
    * the pairs it touched, and stale entries (count no longer current)
    * are discarded at pop — O(log |pairs|) per selection instead of a
    * full scan, which is what makes production vocab sizes (32k merges
    * over a 1M-word table) minutes instead of hours. Stops early when
    * no adjacent pair occurs twice (merging a count-1 pair would just
    * memorize one word). */
  def learnFromCounts(
      wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    // codepoint-aware base split — the exact segmentWord contract
    // (surrogate pairs stay whole, so every symbol is valid Unicode)
    def units(w: String): mutable.ArrayBuffer[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n)
        i += n
      }
      out
    }
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      wordCounts.iterator.filter(_._1.nonEmpty)
        .map { case (w, c) => (units(w), c) }.toArray
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // pair -> indices of words that contained it at some point; stale
    // entries are filtered at use (cheaper than precise maintenance)
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // pairs whose count changed since their last heap push
    val touched = mutable.HashSet.empty[(String, String)]
    def adjustWord(wi: Int, sign: Long): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = pairCount.getOrElse(p, 0L) + sign * c
        if (n == 0L) pairCount.remove(p) else pairCount(p) = n
        touched += p
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(adjustWord(_, 1L))
    // max-heap ordered exactly like the old linear argmax: count desc,
    // tie → lexicographically smallest (left, right). Entries carry the
    // count AT PUSH TIME; an entry is live iff that count is still
    // current (same-count duplicates are harmless — the first pop
    // merges the pair away, zeroing its count and staling the rest).
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      math.max(pairCount.size, 16),
      new java.util.Comparator[(Long, String, String)] {
        def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
          val byN = java.lang.Long.compare(b._1, a._1)
          if (byN != 0) byN
          else {
            val byL = a._2.compareTo(b._2)
            if (byL != 0) byL else a._3.compareTo(b._3)
          }
        }
      })
    def pushTouched(): Unit = {
      touched.foreach { p =>
        val n = pairCount.getOrElse(p, 0L)
        if (n > 1L) heap.add((n, p._1, p._2))
      }
      touched.clear()
    }
    pushTouched()
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // pop to the first LIVE entry (stored count still current)
      var best: (String, String) = null
      while (best == null && !heap.isEmpty) {
        val (n, l, r) = heap.poll()
        if (pairCount.getOrElse((l, r), 0L) == n) best = (l, r)
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val affected = pairWords.getOrElse(best, mutable.Set.empty).toArray.sorted
        for (wi <- affected) {
          val (syms, _) = words(wi)
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == best._1 && syms(i + 1) == best._2; i += 1
          }
          if (has) { // stale index entries skip here
            adjustWord(wi, -1L)
            // merge all non-overlapping occurrences, left to right —
            // the exact segmentWord application order
            val merged = mutable.ArrayBuffer.empty[String]
            var p = 0
            while (p < syms.length) {
              if (p < syms.length - 1 && syms(p) == best._1 && syms(p + 1) == best._2) {
                merged += syms(p) + syms(p + 1); p += 2
              } else { merged += syms(p); p += 1 }
            }
            syms.clear(); syms ++= merged
            adjustWord(wi, 1L)
          }
        }
        pushTouched()
        round += 1
      }
    }
    merges.toSeq
  }

  /** Codepoint-aware base split shared by the in-heap and distributed
    * loops — the exact `segmentWord` contract (surrogate pairs stay
    * whole, so every symbol is valid Unicode). */
  private def unitsSeq(w: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toIndexedSeq
  }

  /** Merge all non-overlapping occurrences of `(a, b)` left to right —
    * the exact `segmentWord` application order, shared with the in-heap
    * loop's rebuild step. Returns `syms` unchanged (same reference) when
    * the pair is absent, so unaffected words cost one scan, no alloc. */
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
          merged += a + b; p += 2
        } else { merged += syms(p); p += 1 }
      }
      merged.toIndexedSeq
    }
  }

  /** The DISTRIBUTED merge loop — engaged by [[learnMerges]] /
    * [[learnByteMerges]] when the vocabulary exceeds the driver cut.
    * The word-frequency table stays a cached Dataset of
    * `(symbols, count)`; each round is one pair-count aggregation
    * (flatMap adjacents → groupBy → sum, partial aggregation map-side)
    * whose top-`batchK` rows — and ONLY those — come to the driver.
    * Driver memory is O(batchK + merges), flat in the vocabulary size.
    *
    * Batching (the standard distributed-BPE throughput trade): from the
    * round's top-`batchK` pairs, the maximal PREFIX of pairwise
    * NON-INTERACTING pairs (no symbol of one equals a symbol or product
    * of another) is applied in a single pass over the table, so `k`
    * merges cost one aggregation instead of `k`. `batchK = 1` replays
    * the in-heap loop exactly (one aggregation per merge — same argmax,
    * same tie order, same application order). With `batchK > 1` a pair
    * CREATED by an earlier accepted merge can occasionally out-count a
    * later accepted one, reordering a handful of adjacent ranks vs the
    * strictly sequential trainer — the accepted approximation in every
    * production distributed trainer, and tightly bounded here by the
    * prefix-interaction stop (interacting pairs never share a batch).
    *
    * Tie order matches the in-heap comparator (count desc, then
    * lexicographically smallest pair) via Spark's binary string sort —
    * identical to Java's `compareTo` for BMP-only symbol sets (always
    * true byte-level; classic path with supplementary-plane text could
    * tie-break differently, same as any UTF-8-ordered system).
    *
    * Lineage is cut with an eager `localCheckpoint` every
    * `checkpointEvery` batches — without it the per-round map lineage
    * compounds and job setup grows linearly in rounds.
    *
    * CRASH RESUME (the multi-hour 256k-merge concern): `resumeFrom`
    * seeds the loop with an already-learned merge prefix — the symbol
    * table is rebuilt by applying the prefix in order (one map over
    * the base units, same `applyMergeTo` order the original rounds
    * used), so continuing from a ROUND-boundary prefix with the same
    * `batchK` reproduces the uninterrupted run's remaining merges
    * exactly. `onProgress` fires with the full merge list so far on
    * every lineage-checkpoint round (and on the final round) — the
    * hook the Tokenizer CLI's `merges-checkpoint-path` persists
    * through. The returned list INCLUDES the resumed prefix. */
  def learnMergesDistributedFromCounts(
      counts: DataFrame, // (word: String, n: Long)
      numMerges: Int,
      batchK: Int = 16,
      checkpointEvery: Int = 12,
      resumeFrom: Seq[(String, String)] = Nil,
      onProgress: Seq[(String, String)] => Unit = _ => ()): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(batchK > 0, s"batchK must be positive, got $batchK")
    require(resumeFrom.size <= numMerges,
      s"resumeFrom carries ${resumeFrom.size} merges but numMerges is $numMerges")
    val spark = counts.sparkSession
    import spark.implicits._
    import scala.collection.mutable
    val prefix = resumeFrom.toArray
    var words = counts.select(col("word"), col("n").cast("long"))
      .as[(String, Long)]
      .filter(_._1.nonEmpty)
      .map { case (w, n) =>
        var cur: IndexedSeq[String] = unitsSeq(w)
        prefix.foreach { case (a, b) => cur = applyMergeTo(cur, a, b) }
        (cur: Seq[String], n)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count() // materialize before the source `counts` plan re-runs
    // The one live checkpoint generation's RDD handle. Checkpointing is
    // done at the RDD level (not Dataset.localCheckpoint) so the blocks
    // of a superseded generation can be unpersisted EXPLICITLY the
    // moment the next generation materializes — Dataset.unpersist() on
    // a localCheckpoint-backed Dataset is a cache-manager no-op for the
    // RDD-persisted checkpoint blocks, so the r10 form leaked one block
    // set per checkpoint round until the ContextCleaner happened to GC
    // the plan (round-10 advice: unbounded storage growth on long 256k
    // runs).
    var liveCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    merges ++= resumeFrom
    var exhausted = false
    var round = 0
    try {
      while (merges.size < numMerges && !exhausted) {
        val want = math.min(batchK, numMerges - merges.size)
        val top = words.flatMap { case (syms, n) =>
            (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), n))
          }.toDF("l", "r", "c")
          .groupBy("l", "r").agg(sum("c").as("cnt"))
          .filter(col("cnt") > 1) // a count-1 merge would just memorize one word
          .orderBy(desc("cnt"), asc("l"), asc("r"))
          .limit(want)
          .collect()
          .map(r => (r.getString(0), r.getString(1)))
        if (top.isEmpty) exhausted = true
        else {
          // maximal non-interacting PREFIX: stop at the first pair that
          // shares a symbol (or product) with an already-accepted one —
          // its count would change under the earlier merge
          val accepted = mutable.ArrayBuffer.empty[(String, String)]
          val involved = mutable.HashSet.empty[String]
          var stop = false
          for ((l, r) <- top if !stop) {
            if (involved(l) || involved(r) || involved(l + r)) stop = true
            else {
              accepted += ((l, r))
              involved += l; involved += r; involved += (l + r)
            }
          }
          val batch = accepted.toArray
          val next = words.map { case (syms, n) =>
            var cur = syms.toIndexedSeq
            batch.foreach { case (a, b) => cur = applyMergeTo(cur, a, b) }
            (cur: Seq[String], n)
          }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          words.unpersist()
          words =
            if (round % checkpointEvery == checkpointEvery - 1) {
              // cut lineage: materialize a fresh checkpoint generation,
              // then free BOTH superseded block sets — `next`'s persist
              // (the checkpoint has its own blocks once counted) and
              // the previous checkpoint generation (the new one's
              // lineage was truncated by the materializing count, so
              // its ancestors' blocks are no longer reachable).
              val ckpt = next.rdd.localCheckpoint()
              ckpt.count()
              next.unpersist()
              liveCkpt.foreach(_.unpersist(blocking = false))
              liveCkpt = Some(ckpt)
              spark.createDataset(ckpt)
            } else next
          merges ++= batch
          // progress hook on lineage-checkpoint rounds: cheap relative
          // to the localCheckpoint just paid, and a crash between
          // hooks loses at most checkpointEvery rounds of merges
          if (round % checkpointEvery == checkpointEvery - 1)
            onProgress(merges.toSeq)
          round += 1
        }
      }
      onProgress(merges.toSeq)
      merges.toSeq
    } finally {
      words.unpersist()
      liveCkpt.foreach(_.unpersist(blocking = false))
    }
  }

  /** Vocab for id encoding (`graft_bpe_encode`): `<unk>` first (id 0 —
    * kept for legacy decode and the registry's line-0 contract, never
    * emitted under byte fallback), then `<eos>` (id 1 — the document
    * separator the packed-sequence export uses), then the 256 reserved
    * byte tokens `<0x00>`…`<0xFF>` (ids 2–257 — the GPT-2/SentencePiece
    * byte-fallback alphabet that makes encoding TOTAL: any segment the
    * training corpus never saw degrades to its UTF-8 bytes instead of
    * `<unk>`), then the training corpus's distinct base characters in
    * codepoint order, then each merge's product in rank order (first
    * occurrence wins when two merges produce the same string, mirroring
    * [[graft.functions.BpeVocabIdRegistry]]'s first-id-wins parse).
    * Every segment the tokenizer can emit over ANY input is covered by
    * construction — base characters or merge products directly, and
    * everything else through the byte tokens — so `<unk>` is
    * structurally impossible with `byteFallback = true` (the default).
    * Reserved spellings cannot collide with real segments: pretokens
    * are single-class runs (letters | digits | symbols), so no segment
    * or merge product ever mixes `<`, letters, and digits.
    *
    * The base alphabet comes from one Spark aggregate over pretoken
    * characters (distinct chars — bounded by the script, not the
    * corpus); the merge list is driver-side already.
    *
    * Alphabet unit contract: the trainer ([[learnFromCounts]]), the
    * segmenter ([[graft.functions.BpeVocab.segmentWord]]), and this
    * builder all split words into CODEPOINTS (surrogate pairs stay
    * whole) — which is exactly what Spark's `split(w, "")` produces.
    * Codepoints, not UTF-16 units, because base symbols must be valid
    * Unicode strings to round-trip through the UTF-8 merge/vocab
    * files (a lone surrogate half encodes as `?`). */
  def buildVocab(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      byteFallback: Boolean = true): Seq[String] = {
    val chars = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(graft.functions.BpeVocab.pretokenRegex), lit(0))).as("w"))
      .select(explode(split(col("w"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .distinct()
      .collect().map(_.getString(0)).sorted
    val out = new scala.collection.mutable.LinkedHashSet[String]
    out += "<unk>"
    if (byteFallback) {
      out += "<eos>"
      (0 until 256).foreach(out += graft.functions.IdVocab.byteToken(_))
    }
    chars.foreach(out += _)
    merges.foreach { case (a, b) => out += (a + b) }
    out.toSeq
  }

  /** Corpus pretoken frequencies under the GPT-2 BYTE-LEVEL
    * pretokenizer ([[graft.functions.ByteUnicode.pretokenRegex]] —
    * contractions, ` ?`-prefixed runs, whitespace runs): `(word, n)`,
    * one shuffle, raw (unmapped) spellings. Same shape as
    * [[pretokenCounts]]; the byte→unicode mapping happens driver-side
    * on the top-`maxWords` cut (it is not expressible as a builtin
    * column function, and the cut is already driver-bounded). */
  def bytePretokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(graft.functions.ByteUnicode.pretokenRegex), lit(0))).as("raw"))
      // map through the byte→unicode bijection IN the plan
      // (`graft_byte_unicode`, codegen'd): the count shuffle carries
      // merge-table symbols directly and the driver's top-maxWords cut
      // collects rows it can feed to the merge loop verbatim.
      // Injective, so distinct raw words stay distinct counts.
      .select(graft.functions.GraftFunctions.byteUnicodeMap(col("raw")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` BYTE-LEVEL merges: pretokenize with the GPT-2
    * regex, map each word's UTF-8 bytes through the byte↔unicode
    * bijection inside the count plan ([[bytePretokenCounts]] — the
    * shuffle carries mapped symbols, nothing re-maps driver-side), and
    * run the exact same driver-side merge loop — mapped symbols are
    * ordinary BMP chars, so [[learnFromCounts]]'s codepoint splits, tie
    * rules, and merge application carry over unchanged. The saved
    * `merges.txt` is what a published byte-level tokenizer ships. */
  def learnByteMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1 << 20,
      batchK: Int = 16,
      resumeFrom: Seq[(String, String)] = Nil,
      onProgress: Seq[(String, String)] => Unit = _ => (),
      checkpointEvery: Int = 12): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val counts = bytePretokenCounts(df, textCol)
    val top = counts
      .orderBy(desc("n"), asc("word")).limit(maxWords + 1)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSeq
    // same threshold contract as learnMerges: in-heap below the cut,
    // distributed pair-count loop above it (driver heap flat — the
    // 256k-multilingual-vocab shape; mapped symbols are ordinary BMP
    // chars, so tie order is identical to the in-heap comparator);
    // resume only engages on the distributed path
    if (top.size <= maxWords) learnFromCounts(top, numMerges)
    else learnMergesDistributedFromCounts(counts, numMerges, batchK,
      checkpointEvery, resumeFrom, onProgress)
  }

  /** Byte-level vocab: `<unk>` (id 0 — the uniform line-0 loader
    * contract; byte-level encoding never emits it), `<eos>` (id 1 —
    * the packed-export document separator), the 256 mapped byte
    * symbols in byte order (ids 2–257 — the ENTIRE base alphabet, which
    * is what makes encoding total with no fallback path at all), then
    * each merge's product in rank order (first occurrence wins). Needs
    * no corpus scan: the alphabet is fixed by the bijection, not the
    * data — every pretoken maps into it and every merge product is a
    * concatenation of its symbols. */
  def buildByteVocab(merges: Seq[(String, String)]): Seq[String] = {
    val out = new scala.collection.mutable.LinkedHashSet[String]
    out += "<unk>"
    out += "<eos>"
    (0 until 256).foreach(b => out += graft.functions.ByteUnicode.toChar(b).toString)
    merges.foreach { case (a, b) => out += (a + b) }
    out.toSeq
  }

  /** Write a vocab (one token per line, id = line number) — the
    * [[graft.functions.BpeVocabIdRegistry]] format. Tokens contain no
    * whitespace (pretokens exclude it), so the line is the token. */
  def saveVocab(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      vocab: Seq[String]): Unit = {
    require(vocab.headOption.contains("<unk>"), "vocab must start with <unk>")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try vocab.foreach { t => out.write(t); out.write('\n') }
    finally out.close()
  }

  /** Write merges in the standard `merges.txt` format
    * ([[graft.functions.BpeVocab.parse]] round-trips it; so does any
    * tool consuming trained-tokenizer merge files). Hadoop-FS path,
    * like every other artifact writer here. */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      merges: Seq[(String, String)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write("#version: 0.2\n")
      merges.foreach { case (a, b) => out.write(a); out.write(' '); out.write(b); out.write('\n') }
    } finally out.close()
  }

  /** Read a `merges.txt` back into the trainer's pair form — the
    * inverse of [[saveMerges]] (header and blank lines skipped), used
    * to seed `resumeFrom` from a crash checkpoint. */
  def loadMerges(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().zipWithIndex
      .filter { case (l, i) => l.trim.nonEmpty && !(i == 0 && l.startsWith("#version")) }
      .map { case (l, _) =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1 && l.indexOf(' ', sp + 1) < 0,
          s"malformed merge line in $path: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toList
    finally in.close()
  }
}
