package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram algorithm): seed a large candidate vocabulary
  * from frequent substrings, run EM to fit per-piece log probabilities
  * (each pretoken's likelihood marginalizes over ALL segmentations via
  * forward–backward on the substring lattice), then iteratively prune
  * the pieces whose removal costs the corpus likelihood least, until
  * the target size is reached. The trained model file drives the
  * `graft_unigram_*` expression family
  * ([[graft.functions.UnigramVocab]]).
  *
  * Division of labor (the [[BpeTrainer.learnMerges]] split, same
  * `maxWords` contract): Spark always does the corpus-scale pretoken
  * frequency aggregate (the exact [[graft.functions.BpeVocab]]
  * pretokenization — training under any other walk would fit pieces
  * that don't round-trip through segmentation) AND the substring-count
  * SEEDING aggregate (a driver-side substring map over a 1M-word cut
  * would retain tens of millions of entries; the Spark form is
  * bit-equivalent — exact long counts, same ranking). Below `maxWords`
  * distinct pretokens the EM/prune loop then runs in-heap over the
  * collected frequency table (deterministic to the bit — what
  * single-node SentencePiece does); above it the E-step distributes:
  * the word table stays a cached Dataset, each iteration broadcasts
  * the (driver-bounded, ≤ seed-size) piece scores and aggregates
  * per-piece expected counts with one map-side-combined shuffle whose
  * width is the PIECE count, not the corpus. The M-step, pruning, and
  * every vocabulary decision stay driver-side over ≤ seed-size rows
  * either way. (Distributed expected counts are floating-point sums in
  * partition order — bit-identical models across cluster layouts are
  * not guaranteed on that path, same as any distributed EM; piece
  * RANKINGS are robust because prune margins are orders of magnitude
  * above summation noise.)
  *
  * Determinism (in-heap path): seed selection and prune survival rank
  * by (score desc, piece asc) — lexicographic tie-breaks, never
  * hash-map iteration order — so the same corpus always trains the
  * same model.
  */
object UnigramTrainer {

  /** One seed/trained piece: spelling + natural-log probability. */
  final case class Piece(piece: String, logp: Double)

  /** A ROUND-BOUNDARY snapshot of the EM/prune loop — the crash-resume
    * unit. Captured after each `emRound` (scores AND the expected
    * counts that round produced), so resuming continues with the next
    * PRUNE and reproduces the uninterrupted run exactly (bit-exact on
    * the in-heap path; the distributed path carries the same fp-sum
    * caveat as any distributed EM). */
  final case class TrainState(
      pieces: Array[String],
      scores: Array[Double],
      counts: Array[Double]) {
    require(pieces.length == scores.length && pieces.length == counts.length,
      s"inconsistent checkpoint state: ${pieces.length} pieces, " +
        s"${scores.length} scores, ${counts.length} counts")
    require(pieces.nonEmpty, "checkpoint state must carry at least one piece")
  }

  // ---------------------------------------------------------------
  // lattice kernel (shared by in-heap and distributed E-steps; object-
  // level so the distributed closure captures no enclosing state)
  // ---------------------------------------------------------------

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  private def utf8Len(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4

  private def cpBounds(word: String): Array[Int] = {
    val nCp = word.codePointCount(0, word.length)
    val bounds = new Array[Int](nCp + 1)
    var i = 0
    var k = 0
    while (i < word.length) {
      bounds(k) = i
      i += Character.charCount(word.codePointAt(i))
      k += 1
    }
    bounds(nCp) = word.length
    bounds
  }

  /** Forward–backward over one pretoken's substring lattice: adds
    * `n ×` the posterior expected count of every piece occurrence into
    * `counts` (indexed like `scores`) and returns `n ×` the word's log
    * likelihood. The per-codepoint fallback edge (scored `floorScore ×
    * utf8 bytes`) keeps the lattice connected even where no piece
    * covers; fallback edges contribute likelihood but no piece count.
    */
  private[graft] def accumulateWord(
      word: String,
      n: Long,
      index: java.util.HashMap[String, Integer],
      scores: Array[Double],
      maxLenCp: Int,
      floorScore: Double,
      counts: Array[Double]): Double = {
    if (word.isEmpty) return 0.0
    val bounds = cpBounds(word)
    val nCp = bounds.length - 1
    val NegInf = Double.NegativeInfinity
    val alpha = Array.fill(nCp + 1)(NegInf)
    val beta = Array.fill(nCp + 1)(NegInf)
    alpha(0) = 0.0
    var e = 1
    while (e <= nCp) {
      var s = math.max(0, e - maxLenCp)
      while (s < e) {
        if (alpha(s) != NegInf) {
          val edge =
            if (e - s == 1) {
              val id = index.get(word.substring(bounds(s), bounds(e)))
              if (id != null) scores(id.intValue())
              else utf8Len(word.codePointAt(bounds(s))) * floorScore
            } else {
              val id = index.get(word.substring(bounds(s), bounds(e)))
              if (id == null) NegInf else scores(id.intValue())
            }
          if (edge != NegInf) alpha(e) = logSumExp(alpha(e), alpha(s) + edge)
        }
        s += 1
      }
      e += 1
    }
    val total = alpha(nCp)
    if (total == NegInf) return 0.0 // unreachable: fallback edges connect
    beta(nCp) = 0.0
    var s2 = nCp - 1
    while (s2 >= 0) {
      var e2 = s2 + 1
      val lim = math.min(nCp, s2 + maxLenCp)
      while (e2 <= lim) {
        if (beta(e2) != NegInf) {
          val sub = word.substring(bounds(s2), bounds(e2))
          val id = index.get(sub)
          val edge =
            if (id != null) scores(id.intValue())
            else if (e2 - s2 == 1) utf8Len(word.codePointAt(bounds(s2))) * floorScore
            else NegInf
          if (edge != NegInf) {
            beta(s2) = logSumExp(beta(s2), edge + beta(e2))
            if (id != null && alpha(s2) != NegInf) {
              val post = math.exp(alpha(s2) + edge + beta(e2) - total)
              counts(id.intValue()) += post * n
            }
          }
        }
        e2 += 1
      }
      s2 -= 1
    }
    total * n
  }

  /** Viterbi best log-prob of `word` under (index, scores) — used by
    * pruning to score each piece's own best ALTERNATIVE segmentation
    * (`exclude` = the piece's own id, or -1 for none). Same edge set
    * and fallback as [[accumulateWord]]. */
  private[graft] def viterbiScore(
      word: String,
      index: java.util.HashMap[String, Integer],
      scores: Array[Double],
      maxLenCp: Int,
      floorScore: Double,
      exclude: Int): Double = {
    val bounds = cpBounds(word)
    val nCp = bounds.length - 1
    val NegInf = Double.NegativeInfinity
    val best = Array.fill(nCp + 1)(NegInf)
    best(0) = 0.0
    var e = 1
    while (e <= nCp) {
      var s = math.max(0, e - maxLenCp)
      while (s < e) {
        if (best(s) != NegInf) {
          val id = index.get(word.substring(bounds(s), bounds(e)))
          val edge =
            if (id != null && id.intValue() != exclude) scores(id.intValue())
            else if (e - s == 1)
              utf8Len(word.codePointAt(bounds(s))) * floorScore
            else NegInf
          if (edge != NegInf && best(s) + edge > best(e))
            best(e) = best(s) + edge
        }
        s += 1
      }
      e += 1
    }
    best(nCp)
  }

  /** Digamma ψ(x) (Bernardo 1976 AS 103: upward recurrence below 6,
    * asymptotic series above) — Kudo's Bayesianified M-step smoothing:
    * `logp_i = ψ(c_i) − ψ(Σc)` damps near-zero counts harder than the
    * plain ML ratio, which is what drives useless pieces toward the
    * prune floor. */
  private[graft] def digamma(x0: Double): Double = {
    require(x0 > 0, s"digamma needs x > 0, got $x0")
    var x = x0
    var acc = 0.0
    while (x < 8.0) { acc -= 1.0 / x; x += 1.0 }
    val inv = 1.0 / x
    val inv2 = inv * inv
    acc + math.log(x) - 0.5 * inv -
      inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0 - inv2 / 240.0)))
  }

  // ---------------------------------------------------------------
  // seeding
  // ---------------------------------------------------------------

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Deterministic seed assembly from (substring, count) rows: all
    * singles, then top multis by (count × cpLen desc, piece asc). */
  private def assembleSeed(
      entries: Seq[(String, Long)],
      seedSize: Int,
      minCount: Long): (Array[String], Array[Double]) = {
    val singles = entries.filter(e => cpLen(e._1) == 1).sortBy(_._1)
    val multis = entries
      .filter(e => cpLen(e._1) >= 2 && e._2 >= minCount)
      .sortBy { case (p, c) => (-c * cpLen(p), p) }
      .take(math.max(0, seedSize - singles.size))
    val seed = singles ++ multis
    val total = seed.iterator.map(_._2.toDouble).sum
    val pieces = seed.map(_._1).toArray
    val scores = seed.map(e => math.log(e._2.toDouble) - math.log(total)).toArray
    (pieces, scores)
  }

  /** Distributed seed: same selection, computed with one substring
    * explode + aggregate (partial aggregation collapses repeats
    * map-side; the shuffle carries distinct substrings). Only the
    * singles (alphabet-bounded) and the top-`seedSize` multis are
    * collected. */
  private def seedDistributed(
      words: Dataset[(String, Long)],
      maxPieceLen: Int,
      seedSize: Int,
      minCount: Long): (Array[String], Array[Double]) = {
    val spark = words.sparkSession
    import spark.implicits._
    val subs = words.flatMap { case (w, n) =>
      val bounds = cpBounds(w)
      val nCp = bounds.length - 1
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var s = 0
      while (s < nCp) {
        var e = s + 1
        val lim = math.min(nCp, s + maxPieceLen)
        while (e <= lim) { out += ((w.substring(bounds(s), bounds(e)), n)); e += 1 }
        s += 1
      }
      out
    }.toDF("piece", "n").groupBy("piece").agg(sum("n").as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val singles = subs
        .filter(length(col("piece")) > 0)
        .filter(cpLen(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val multis = subs
        .filter(cpLen(col("piece")) >= 2 && col("c") >= minCount)
        .withColumn("score", col("c") * cpLen(col("piece")))
        .orderBy(desc("score"), asc("piece"))
        .limit(math.max(0, seedSize - singles.size))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assembleSeed(singles ++ multis, seedSize, minCount)
    } finally { subs.unpersist(); () }
  }

  // codepoint length as a column — the codegen'd graft_cp_count
  // expression (Java codePointCount semantics: a surrogate pair is ONE)
  private def cpLen(c: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.cpCount(c)

  // ---------------------------------------------------------------
  // E-steps
  // ---------------------------------------------------------------

  private def eStepInHeap(
      words: Array[(String, Long)],
      index: java.util.HashMap[String, Integer],
      scores: Array[Double],
      maxLenCp: Int,
      floorScore: Double): (Array[Double], Double) = {
    val counts = new Array[Double](scores.length)
    var ll = 0.0
    for ((w, n) <- words)
      ll += accumulateWord(w, n, index, scores, maxLenCp, floorScore, counts)
    (counts, ll)
  }

  /** Distributed E-step: one mapPartitions pass accumulating a local
    * count array per partition (the map-side combine), emitting only
    * NONZERO (pieceIdx, count) rows plus one log-likelihood sentinel
    * per partition; the shuffle then reduces ≤ pieces × partitions
    * rows. Piece arrays ship once per executor via broadcast. */
  private def eStepDistributed(
      words: Dataset[(String, Long)],
      pieces: Array[String],
      scores: Array[Double],
      maxLenCp: Int,
      floorScore: Double): (Array[Double], Double) = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((pieces, scores))
    try {
      val rows = words.mapPartitions { iter =>
        val (ps, sc) = bc.value
        val idx = new java.util.HashMap[String, Integer]()
        var i = 0
        while (i < ps.length) {
          if (!idx.containsKey(ps(i))) { idx.put(ps(i), Integer.valueOf(i)); () }
          i += 1
        }
        val counts = new Array[Double](sc.length)
        var ll = 0.0
        for ((w, n) <- iter)
          ll += accumulateWord(w, n, idx, sc, maxLenCp, floorScore, counts)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
        var j = 0
        while (j < counts.length) {
          if (counts(j) != 0.0) out += ((j, counts(j)))
          j += 1
        }
        out += ((-1, ll))
        out.iterator
      }.toDF("idx", "c").groupBy("idx").agg(sum("c").as("c"))
        .collect()
      val counts = new Array[Double](scores.length)
      var ll = 0.0
      rows.foreach { r =>
        val i = r.getInt(0)
        if (i < 0) ll = r.getDouble(1) else counts(i) = r.getDouble(1)
      }
      (counts, ll)
    } finally { bc.destroy(); () }
  }

  // ---------------------------------------------------------------
  // the driver loop
  // ---------------------------------------------------------------

  private def buildIndex(pieces: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < pieces.length) {
      if (!m.containsKey(pieces(i))) { m.put(pieces(i), Integer.valueOf(i)); () }
      i += 1
    }
    m
  }

  /** Train a unigram model of (about) `targetPieces` learned pieces.
    * `maxPieceLen` bounds piece length in codepoints (a model property
    * — the encoder's lattice width); `seedSize` defaults to 4× the
    * target (Kudo's practical ratio); `emIters` sub-iterations per
    * prune round and `keepRatio` the per-round multi-piece survival
    * fraction (both SentencePiece defaults). Returns pieces with their
    * final log probabilities, singles first is NOT guaranteed — order
    * is the internal ranking; [[save]] lays out the model file. */
  def train(
      df: DataFrame,
      textCol: String,
      targetPieces: Int,
      maxPieceLen: Int = 8,
      seedSize: Int = 0,
      emIters: Int = 2,
      keepRatio: Double = 0.75,
      minCount: Long = 2L,
      maxWords: Int = 1 << 20,
      resume: Option[TrainState] = None,
      onRound: TrainState => Unit = _ => ()): Seq[Piece] = {
    require(targetPieces > 0, s"targetPieces must be positive, got $targetPieces")
    require(maxPieceLen >= 2, s"maxPieceLen must be ≥ 2, got $maxPieceLen")
    require(keepRatio > 0 && keepRatio < 1, s"keepRatio must be in (0,1), got $keepRatio")
    resume.foreach(st => require(
      st.pieces.forall(pc => pc.codePointCount(0, pc.length) <= maxPieceLen),
      "resume checkpoint carries pieces longer than maxPieceLen — " +
        "stale checkpoint from another configuration; delete it to retrain"))
    val spark = df.sparkSession
    import spark.implicits._
    val counts = BpeTrainer.pretokenCounts(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // path choice by COUNT first — collecting a 1M-row string table to
    // the driver only to discover the corpus is over the cut would pay
    // the driver transfer for nothing on exactly the large corpora
    val nDistinct = counts.limit(maxWords + 1).count()
    val seedN = if (seedSize > 0) seedSize else targetPieces * 4
    val wordsDs = counts.select(col("word"), col("n").cast("long"))
      .as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      wordsDs.count() // materialize once; seeding (and distributed
      // E-steps) re-read the cache. Seeding is ALWAYS the Spark
      // aggregate — an in-heap substring map over a 1M-word cut would
      // retain tens of millions of entries on the driver, and the
      // distributed seed is bit-equivalent anyway (exact long counts,
      // the same (score desc, piece asc) ranking).
      // resume skips the seed aggregate entirely — the checkpoint IS
      // the live vocabulary state
      val (p0, s0) = resume match {
        case Some(st) => (st.pieces, st.scores)
        case None => seedDistributed(wordsDs, maxPieceLen, seedN, minCount)
      }
      if (nDistinct <= maxWords) {
        val words = wordsDs
          .orderBy(desc("n"), asc("word")) // deterministic E-step sum order
          .collect()
        runLoop(p0, s0, maxPieceLen, targetPieces, emIters, keepRatio,
          (ps, sc, fl) => eStepInHeap(words, buildIndex(ps), sc, maxPieceLen, fl),
          resume, onRound)
      } else {
        runLoop(p0, s0, maxPieceLen, targetPieces, emIters, keepRatio,
          (ps, sc, fl) => eStepDistributed(wordsDs, ps, sc, maxPieceLen, fl),
          resume, onRound)
      }
    } finally { wordsDs.unpersist(); counts.unpersist(); () }
  }

  /** EM + prune to target, shared by both paths. `eStep` maps (pieces,
    * scores, floorScore) to (expected counts, log likelihood). */
  private def runLoop(
      seedPieces: Array[String],
      seedScores: Array[Double],
      maxLenCp: Int,
      targetPieces: Int,
      emIters: Int,
      keepRatio: Double,
      eStep: (Array[String], Array[Double], Double) => (Array[Double], Double),
      resume: Option[TrainState] = None,
      onRound: TrainState => Unit = _ => ()): Seq[Piece] = {
    var pieces = seedPieces
    var scores = seedScores
    val nSingles = pieces.count(p => cpLen(p) == 1)
    require(targetPieces >= nSingles,
      s"targetPieces=$targetPieces is below the training alphabet size $nSingles — " +
        "every single codepoint is kept for lattice totality; raise the target")

    def floorScore: Double = {
      var mn = 0.0
      var i = 0
      while (i < scores.length) { mn = math.min(mn, scores(i)); i += 1 }
      mn - 10.0
    }

    def emRound(): Array[Double] = {
      var lastCounts: Array[Double] = null
      var it = 0
      while (it < emIters) {
        val (cnt, _) = eStep(pieces, scores, floorScore)
        var total = 0.0
        var i = 0
        while (i < cnt.length) { total += cnt(i); i += 1 }
        val dTot = digamma(math.max(total, 1e-9))
        val next = new Array[Double](cnt.length)
        i = 0
        while (i < cnt.length) {
          next(i) = digamma(math.max(cnt(i), 1e-9)) - dTot
          i += 1
        }
        scores = next
        lastCounts = cnt
        it += 1
      }
      lastCounts
    }

    var counts = resume match {
      case Some(st) => st.counts // round-boundary state: next step is the prune
      case None =>
        val c = emRound()
        onRound(TrainState(pieces, scores, c))
        c
    }
    while (pieces.length > targetPieces) {
      // prune: singles always survive; multis ranked by likelihood loss
      // if removed ≈ expCount × (own score − best alternative cover)
      val index = buildIndex(pieces)
      val fl = floorScore
      val multiIdx = pieces.indices.filter(i => cpLen(pieces(i)) >= 2)
      val losses = multiIdx.map { i =>
        val alt = viterbiScore(pieces(i), index, scores, maxLenCp, fl, exclude = i)
        (i, counts(i) * (scores(i) - alt))
      }
      val keepMulti = math.max(targetPieces - nSingles,
        math.floor(keepRatio * multiIdx.size).toInt)
      val kept = losses.sortBy { case (i, l) => (-l, pieces(i)) }
        .take(keepMulti).map(_._1).toSet
      val nextIdx = pieces.indices.filter(i => cpLen(pieces(i)) == 1 || kept(i))
      pieces = nextIdx.map(pieces).toArray
      scores = nextIdx.map(scores).toArray
      counts = emRound()
      onRound(TrainState(pieces, scores, counts))
    }
    // final-state hook, unconditionally (the BPE trainer's final-round
    // onProgress shape): when a RESUME landed on the terminal state the
    // loop never ran, and without this the checkpoint cycle would end
    // half-promoted (live file retired aside, nothing promoted)
    onRound(TrainState(pieces, scores, counts))
    pieces.indices.map(i => Piece(pieces(i), scores(i)))
  }

  // ---------------------------------------------------------------
  // crash-resume checkpoint I/O (the Tokenizer CLI's
  // `model-checkpoint-path` rides these; the file is INTERNAL loop
  // state — piece, score, AND that round's expected count — not the
  // published model layout)
  // ---------------------------------------------------------------

  private val CheckpointHeader = "# graft-unigram-checkpoint "

  /** Write a round-boundary state with a caller-supplied parameter
    * record in the header — resuming under different training knobs
    * would silently diverge, so the caller guards on it at load. */
  def saveCheckpoint(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      st: TrainState,
      params: String): Unit = {
    require(!params.contains('\n'), "checkpoint params must be one line")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write(CheckpointHeader); out.write(params); out.write('\n')
      var i = 0
      while (i < st.pieces.length) {
        out.write(st.pieces(i)); out.write('\t')
        out.write(st.scores(i).toString); out.write('\t')
        out.write(st.counts(i).toString); out.write('\n')
        i += 1
      }
    } finally out.close()
  }

  /** Read a checkpoint back: `(state, params)` — the caller compares
    * `params` against its own configuration and refuses a mismatch. */
  def loadCheckpoint(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (TrainState, String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      require(lines.hasNext, s"empty unigram checkpoint at $path")
      val header = lines.next()
      require(header.startsWith(CheckpointHeader),
        s"not a unigram checkpoint at $path (bad header)")
      val params = header.substring(CheckpointHeader.length)
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      val scores = scala.collection.mutable.ArrayBuffer.empty[Double]
      val counts = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (l <- lines if l.nonEmpty) {
        val a = l.indexOf('\t')
        val b = l.indexOf('\t', a + 1)
        require(a > 0 && b > a && l.indexOf('\t', b + 1) < 0,
          s"malformed unigram checkpoint line in $path: '$l'")
        pieces += l.substring(0, a)
        scores += java.lang.Double.parseDouble(l.substring(a + 1, b))
        counts += java.lang.Double.parseDouble(l.substring(b + 1))
      }
      (TrainState(pieces.toArray, scores.toArray, counts.toArray), params)
    } finally in.close()
  }

  // ---------------------------------------------------------------
  // model file I/O
  // ---------------------------------------------------------------

  /** Write the model in the [[graft.functions.UnigramVocab]] layout:
    * `<unk>` (floor − 10; structurally never emitted), `<eos>` (0, a
    * control separator), the 256 byte pieces (uniform floor score =
    * min learned score − 10, so the lattice prefers any real piece),
    * then the learned pieces. Hadoop-FS path like every other artifact
    * writer. */
  def save(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      pieces: Seq[Piece]): Unit = {
    require(pieces.nonEmpty, "cannot save an empty unigram model")
    val minScore = pieces.iterator.map(_.logp).min
    val byteScore = minScore - 10.0
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write(s"<unk>\t${byteScore - 10.0}\n")
      out.write("<eos>\t0.0\n")
      (0 until 256).foreach { b =>
        out.write(s"${graft.functions.IdVocab.byteToken(b)}\t$byteScore\n")
      }
      pieces.foreach { pc =>
        require(!pc.piece.exists(_.isWhitespace),
          s"piece '${pc.piece}' contains whitespace — pretokens never do")
        out.write(pc.piece); out.write('\t')
        out.write(pc.logp.toString); out.write('\n')
      }
    } finally out.close()
  }
}
