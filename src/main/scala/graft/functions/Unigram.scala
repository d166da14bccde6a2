package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword tokenization (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model): each piece carries an independent log
  * probability and a text's segmentation is the VITERBI-best path
  * through the lattice of in-vocab substrings, rather than a greedy
  * merge replay. The third tokenizer family next to classic BPE
  * ([[BpeVocab]]) and byte-level BPE ([[ByteUnicode]]), sharing their
  * contracts end to end:
  *
  *  - pretokenization: the repo-wide [[BpeVocab.Pretoken]] walker
  *    (letter runs / digit runs / symbol runs; whitespace between
  *    pretokens is never inside a piece), so trained pieces round-trip
  *    through the same text walk the trainer counted under;
  *  - id layout: `<unk>` line 0 (required, structurally never emitted),
  *    `<eos>` line 1, the 256 reserved byte pieces `<0x00>`…`<0xFF>` on
  *    lines 2–257 (the SentencePiece `byte_fallback` contract that
  *    makes encoding TOTAL), learned pieces from line 258 — the exact
  *    [[BpeVocabIdRegistry]] byte-fallback layout with a TAB-separated
  *    score column appended;
  *  - losslessness: `graft_unigram_decode(graft_unigram_encode_lossless
  *    (x)) == x` byte-for-byte — whitespace gaps and out-of-vocab
  *    codepoints ride the byte pieces.
  *
  * Model file: one `piece<TAB>score` per line, id = line number, UTF-8.
  * Scores are natural-log probabilities from the trainer's EM
  * ([[graft.llm.UnigramTrainer]]); byte pieces carry a floor score
  * strictly below every learned piece, so the lattice prefers real
  * pieces and falls back per-codepoint only where the vocab has no
  * cover.
  *
  * Viterbi determinism: edges at each end position are scanned from the
  * LONGEST candidate down, and a candidate replaces the incumbent only
  * when its path score is STRICTLY greater — equal-score ties resolve
  * to the longest final piece, never to map iteration order.
  *
  * Scale shape (the [[BpeRegistry]] contract): the model loads once per
  * (executor JVM, path); expressions ship only the path string and
  * codegen to a static call, so scans stay inside whole-stage codegen;
  * per-pretoken segmentations are memoized (Zipfian corpora hit the
  * cache constantly). Lattice cost per word is O(len × maxPieceLen)
  * map probes — maxPieceLen is a model property, bounded at training
  * time.
  */
final class UnigramVocab private (
    val ids: java.util.HashMap[String, Integer],
    val tokens: Array[String],
    val scores: Array[Double]) {

  /** First learned-piece line — ids below are control/byte pieces and
    * never participate in the lattice (their spellings cannot form one
    * pretoken anyway: they mix `<`, letters, and digits, and pretokens
    * are single-class runs — this is belt and braces). */
  private val FirstPiece = 258

  /** `byteIds(b)` = id of `<0xNN>` (lines 2–257 by layout). */
  val byteIds: Array[Int] = Array.tabulate(256)(_ + 2)

  /** `byteValue(id)` = raw byte the id decodes to, -1 for non-byte. */
  val byteValue: Array[Int] = {
    val v = Array.fill(tokens.length)(-1)
    var b = 0
    while (b < 256) { v(b + 2) = b; b += 1 }
    v
  }

  /** Floor score of a single out-of-vocab codepoint: its UTF-8 byte
    * count times the (uniform) byte-piece score — what the fallback
    * edge actually costs in the id stream. */
  private val byteScore: Double = scores(2)

  /** Lattice lookup: learned pieces only. */
  private val lattice = {
    val m = new java.util.HashMap[String, Integer]()
    var i = FirstPiece
    while (i < tokens.length) {
      if (!m.containsKey(tokens(i))) { m.put(tokens(i), Integer.valueOf(i)); () }
      i += 1
    }
    m
  }

  /** Longest learned piece in CODEPOINTS — the lattice edge bound. */
  val maxPieceLenCp: Int = {
    var mx = 1
    var i = FirstPiece
    while (i < tokens.length) {
      mx = math.max(mx, tokens(i).codePointCount(0, tokens(i).length))
      i += 1
    }
    mx
  }

  /** Memoized per-pretoken segmentations, space-joined (the
    * [[BpeVocab]] memo contract: pretokens contain no whitespace, so
    * the join is unambiguous; long pretokens are recomputed, keeping
    * retained memory bounded). */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MemoCap = 1 << 16

  private def utf8Len(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4

  /** Viterbi segmentation of ONE pretoken: the max-log-probability
    * cover of the word by learned pieces, with per-codepoint byte
    * fallback where (and only where) no piece covers. */
  def segmentWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val cached = memo.get(word)
    if (cached != null) return cached.split(' ')
    // codepoint boundaries: bounds(k) = char offset of the k-th boundary
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
    val NegInf = Double.NegativeInfinity
    val best = Array.fill(nCp + 1)(NegInf)
    val back = Array.fill(nCp + 1)(-1)
    best(0) = 0.0
    var e = 1
    while (e <= nCp) {
      // longest candidate first; strict improvement only → equal-score
      // ties keep the longest final piece (deterministic)
      var s = math.max(0, e - maxPieceLenCp)
      while (s < e) {
        if (best(s) != NegInf) {
          val id = lattice.get(word.substring(bounds(s), bounds(e)))
          if (id != null) {
            val sc = best(s) + scores(id.intValue())
            if (sc > best(e)) { best(e) = sc; back(e) = s }
          }
        }
        s += 1
      }
      // per-codepoint byte-fallback edge — scored below every piece at
      // save time, so it only wins where the vocab has no cover
      if (best(e - 1) != NegInf) {
        val cp = word.codePointAt(bounds(e - 1))
        val sc = best(e - 1) + utf8Len(cp) * byteScore
        if (sc > best(e)) { best(e) = sc; back(e) = e - 1 }
      }
      e += 1
    }
    // reconstruct right-to-left (the fallback edge guarantees back is set)
    var cnt = 0
    var p = nCp
    while (p > 0) { cnt += 1; p = back(p) }
    val out = new Array[String](cnt)
    p = nCp
    var j = cnt - 1
    while (p > 0) {
      out(j) = word.substring(bounds(back(p)), bounds(p))
      j -= 1
      p = back(p)
    }
    if (word.length <= UnigramVocab.MaxMemoWordLen) {
      if (memo.size >= MemoCap) memo.clear()
      memo.put(word, String.join(" ", out: _*))
      ()
    }
    out
  }

  /** Segments of every pretoken in order (whitespace dropped) — the
    * [[BpeVocab.segmentText]] shape. */
  def segmentText(text: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val m = BpeVocab.Pretoken.matcher(text)
    while (m.find()) {
      val segs = segmentWord(m.group())
      var i = 0
      while (i < segs.length) { out.add(segs(i)); i += 1 }
    }
    out
  }

  /** Lossless segmentation: whitespace gaps between pretokens are
    * emitted verbatim as segments too (never in a vocab — they ride the
    * byte pieces at id time), so concatenating the segments reproduces
    * the input byte-for-byte. */
  def segmentTextLossless(text: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val m = BpeVocab.Pretoken.matcher(text)
    var last = 0
    while (m.find()) {
      if (m.start() > last) out.add(text.substring(last, m.start()))
      val segs = segmentWord(m.group())
      var i = 0
      while (i < segs.length) { out.add(segs(i)); i += 1 }
      last = m.end()
    }
    if (last < text.length) out.add(text.substring(last))
    out
  }

  private def emitSegment(seg: String, out: java.util.ArrayList[Integer]): Unit = {
    val id = lattice.get(seg)
    if (id != null) { out.add(id); () }
    else {
      val bytes = seg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < bytes.length) {
        out.add(Integer.valueOf(byteIds(bytes(i) & 0xFF)))
        i += 1
      }
    }
  }

  /** Token ids: Viterbi segments mapped to their line ids; fallback
    * codepoints (and, lossless, whitespace gaps) to byte-piece ids.
    * `<unk>` is structurally impossible — every segment is either a
    * learned piece or raw bytes. */
  def encode(text: String, lossless: Boolean): java.util.ArrayList[Integer] = {
    val segs = if (lossless) segmentTextLossless(text) else segmentText(text)
    val out = new java.util.ArrayList[Integer](segs.size)
    var i = 0
    while (i < segs.size) { emitSegment(segs.get(i), out); i += 1 }
    out
  }

  /** `size(encode(text, lossless=false))` without building the array —
    * the id budget a context window actually consumes. */
  def idCount(text: String): Int = {
    var n = 0
    val m = BpeVocab.Pretoken.matcher(text)
    while (m.find()) {
      val segs = segmentWord(m.group())
      var i = 0
      while (i < segs.length) {
        n += (if (lattice.containsKey(segs(i))) 1
              else segs(i).getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
        i += 1
      }
    }
    n
  }

  /** Ids back to text — the [[BpeVocabIdRegistry.decode]] semantics:
    * byte pieces reassemble verbatim, `<unk>` renders U+FFFD, `<eos>`
    * renders nothing, every other id its spelling. Inverse of the
    * lossless encode by construction. */
  def decode(ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = ids.numElements()
    val buf = new java.io.ByteArrayOutputStream(n * 4)
    var i = 0
    while (i < n) {
      require(!ids.isNullAt(i), s"graft_unigram_decode: null id at position $i")
      val id = ids.getInt(i)
      require(id >= 0 && id < tokens.length,
        s"graft_unigram_decode: id $id out of range for model of ${tokens.length}")
      val b = byteValue(id)
      if (b >= 0) buf.write(b)
      else if (id == 0) // <unk>
        buf.write("�".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else if (id != 1) // <eos>
        buf.write(tokens(id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    UTF8String.fromBytes(buf.toByteArray)
  }
}

object UnigramVocab {
  private[functions] val MaxMemoWordLen = 512

  /** Parse model lines (`piece<TAB>score`). The fixed header — `<unk>`
    * line 0, `<eos>` line 1, all 256 byte pieces on lines 2–257 — is
    * REQUIRED: unigram encoding here is always total, so a model
    * without byte fallback would silently break the round-trip
    * contract; fail loudly at load instead. Duplicate spellings keep
    * the first id. */
  def parse(lines: Iterator[String]): UnigramVocab = {
    val ids = new java.util.HashMap[String, Integer]()
    val toks = new java.util.ArrayList[String]()
    val scs = new java.util.ArrayList[java.lang.Double]()
    var id = 0
    for (line <- lines if line.nonEmpty) {
      val tab = line.indexOf('\t')
      require(tab > 0, s"malformed unigram model line (need piece<TAB>score): '$line'")
      val piece = line.substring(0, tab)
      val score = java.lang.Double.parseDouble(line.substring(tab + 1))
      if (!ids.containsKey(piece)) { ids.put(piece, Integer.valueOf(id)); () }
      toks.add(piece)
      scs.add(score)
      id += 1
    }
    require(toks.size >= 258, s"unigram model too short (${toks.size} lines) — " +
      "needs <unk>, <eos>, and the 256 byte pieces before any learned piece")
    require(toks.get(0) == "<unk>", "unigram model must have <unk> on line 0")
    require(toks.get(1) == "<eos>", "unigram model must have <eos> on line 1")
    var b = 0
    while (b < 256) {
      require(toks.get(b + 2) == IdVocab.byteToken(b),
        s"unigram model line ${b + 2} must be ${IdVocab.byteToken(b)}, got ${toks.get(b + 2)}")
      b += 1
    }
    val scores = new Array[Double](scs.size)
    var i = 0
    while (i < scores.length) { scores(i) = scs.get(i).doubleValue(); i += 1 }
    new UnigramVocab(ids, toks.toArray(new Array[String](toks.size())), scores)
  }
}

/** Executor-side unigram-model cache: one load per (JVM, path), same
  * contract as [[BpeRegistry]]. Static so generated code and every
  * task share it; expressions carry only the path. */
object UnigramRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, UnigramVocab]()

  def get(path: String): UnigramVocab =
    cache.computeIfAbsent(path, load(_))

  /** Test hook: drop a cached model (e.g. after rewriting the file). */
  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): UnigramVocab = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try UnigramVocab.parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  private def toArrayData(
      out: java.util.ArrayList[Integer]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ids = new Array[Int](out.size)
    var i = 0
    while (i < ids.length) { ids(i) = out.get(i).intValue(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ids)
  }

  private def toStringArrayData(
      segs: java.util.ArrayList[String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val vals = new Array[Any](segs.size)
    var i = 0
    while (i < vals.length) { vals(i) = UTF8String.fromString(segs.get(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }

  /** Codegen / eval entries. */
  def segments(path: String, text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    toStringArrayData(get(path).segmentText(text.toString))

  def encode(path: String, text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    toArrayData(get(path).encode(text.toString, lossless = false))

  def encodeLossless(path: String, text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    toArrayData(get(path).encode(text.toString, lossless = true))

  def decode(path: String,
      ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String =
    get(path).decode(ids)

  def count(path: String, text: UTF8String): Int = get(path).idCount(text.toString)

  /** Codegen / eval entry for budget chunking: the shared
    * [[TokenBudgetChunker]] walk with the unigram id counter — each
    * chunk's `chunk_bpe_tokens` is exactly what `graft_unigram_count`
    * (and hence `size(graft_unigram_encode)`) returns on its text. */
  def chunks(path: String, text: UTF8String, budget: Int,
      overlap: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val v = get(path)
    TokenBudgetChunker.compute(v.idCount(_), text, budget, overlap)
  }
}

/** `graft_unigram_segments(string, 'model-path') -> array<string>`:
  * Viterbi-best subword segments under the unigram model (whitespace
  * dropped; out-of-vocab codepoints appear as themselves — they ride
  * the byte pieces at id time). */
case class UnigramSegments(child: Expression, modelPath: String) extends UnaryExpression {
  require(modelPath.nonEmpty, "graft_unigram_segments needs a model path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_segments expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segments"

  override protected def nullSafeEval(t: Any): Any =
    UnigramRegistry.segments(modelPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModelPath", modelPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramRegistry.segments($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_unigram_encode(string, 'model-path') -> array<int>`: token
  * ids of the Viterbi segmentation (whitespace dropped). Encoding is
  * total — out-of-vocab codepoints emit their UTF-8 bytes through the
  * reserved byte pieces, never `<unk>`. */
case class UnigramEncode(child: Expression, modelPath: String) extends UnaryExpression {
  require(modelPath.nonEmpty, "graft_unigram_encode needs a model path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_encode expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_unigram_encode"

  override protected def nullSafeEval(t: Any): Any =
    UnigramRegistry.encode(modelPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModelPath", modelPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramRegistry.encode($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_unigram_encode_lossless(string, 'model-path') -> array<int>`:
  * token ids with whitespace gaps preserved through the byte pieces —
  * `graft_unigram_decode` of the result reproduces the input
  * byte-for-byte (spec- and oracle-pinned). */
case class UnigramEncodeLossless(child: Expression, modelPath: String) extends UnaryExpression {
  require(modelPath.nonEmpty, "graft_unigram_encode_lossless needs a model path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_encode_lossless expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_unigram_encode_lossless"

  override protected def nullSafeEval(t: Any): Any =
    UnigramRegistry.encodeLossless(modelPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModelPath", modelPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramRegistry.encodeLossless($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_unigram_decode(array<int>, 'model-path') -> string`: ids back
  * to text (byte pieces reassemble verbatim, `<unk>` → U+FFFD, `<eos>`
  * → nothing). `decode(encode_lossless(x)) == x` byte-parity. */
case class UnigramDecode(child: Expression, modelPath: String) extends UnaryExpression {
  require(modelPath.nonEmpty, "graft_unigram_decode needs a model path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_decode expects array<int>, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unigram_decode"

  override protected def nullSafeEval(ids: Any): Any =
    UnigramRegistry.decode(modelPath,
      ids.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModelPath", modelPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramRegistry.decode($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_unigram_chunks(string, 'model-path', budget, overlap) ->
  * array<struct<chunk_text string, chunk_tokens int, chunk_bpe_tokens
  * int>>`: context-window chunking under the UNIGRAM id budget — the
  * [[BpeChunks]] contract (same whitespace-boundary walk, same struct,
  * so the two families are drop-in interchangeable downstream), with
  * `chunk_bpe_tokens == graft_unigram_count(chunk_text) ==
  * size(graft_unigram_encode(chunk_text))` by construction. */
case class UnigramChunks(child: Expression, modelPath: String, budget: Int,
    overlap: Int) extends UnaryExpression {
  require(modelPath.nonEmpty, "graft_unigram_chunks needs a model path")
  require(budget > 0, s"budget must be positive, got $budget")
  require(overlap >= 0, s"overlap must be non-negative, got $overlap")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_chunks expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("chunk_tokens", IntegerType, nullable = false),
    StructField("chunk_bpe_tokens", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_unigram_chunks"

  override protected def nullSafeEval(t: Any): Any =
    UnigramRegistry.chunks(modelPath, t.asInstanceOf[UTF8String], budget, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModelPath", modelPath, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramRegistry.chunks($ref, $c, $budget, $overlap)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_unigram_count(string, 'model-path') -> int`: the id count of
  * the non-lossless encode without building the array —
  * `graft_unigram_count(t) == size(graft_unigram_encode(t))` by
  * construction (same memoized segmentation). */
case class UnigramCount(child: Expression, modelPath: String) extends UnaryExpression {
  require(modelPath.nonEmpty, "graft_unigram_count needs a model path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_unigram_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_unigram_count"

  override protected def nullSafeEval(t: Any): Any =
    UnigramRegistry.count(modelPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModelPath", modelPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramRegistry.count($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
