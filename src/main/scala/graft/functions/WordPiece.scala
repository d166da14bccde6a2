package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece subword tokenization (Schuster & Nakajima 2012; the BERT
  * tokenizer, Devlin et al. 2018 arXiv:1810.04805) — the fourth
  * tokenizer family next to classic BPE, byte-level BPE, and the
  * unigram model: GREEDY LONGEST-MATCH-FIRST segmentation against a
  * plain vocabulary, with `##`-prefixed continuation pieces and a
  * whole-word `[UNK]` when any position fails to match (the published
  * `WordpieceTokenizer` semantics, including the max-chars-per-word
  * cap).
  *
  * Vocab file: the published BERT `vocab.txt` format — one token per
  * line, id = line number, `[UNK]` REQUIRED (any line). Continuation
  * pieces carry the literal `##` prefix in the file.
  *
  * Pretokenization: the repo-wide [[BpeVocab.Pretoken]] walker (letter
  * / digit / symbol runs) — BERT's BasicTokenizer additionally
  * lower-cases and strips accents in its `uncased` variants; those are
  * orthogonal column transforms here (`lower()`, [[NfcNormalize]]),
  * applied upstream when a published uncased vocab is the target.
  *
  * Unlike BPE/unigram there is no byte fallback: WordPiece is LOSSY by
  * design (`[UNK]` erases the word). Two escape hatches keep pipeline
  * round-trips possible: `keepRaw` on the segments form (a failed word
  * emits itself verbatim instead of `[UNK]` — ids are not requested,
  * so nothing is lost), and [[WordPieceRoundtrip]] (re-joins segments
  * with the original whitespace — the oracle gate that pins the
  * walker + greedy join as structurally lossless).
  *
  * Scale shape: the [[BpeRegistry]] contract — one vocab load per
  * (executor JVM, path), memoized per-pretoken segmentations, path
  * strings in the expression tree, static-call codegen. Greedy
  * matching costs O(len²) substring probes per word worst-case, with
  * the same Zipfian memo making the amortized cost ~0 on natural
  * corpora.
  */
final class WordPieceVocab private (
    val ids: java.util.HashMap[String, Integer],
    val tokens: Array[String],
    val maxCharsPerWord: Int) {

  val unkId: Int = ids.get("[UNK]").intValue()

  /** Memoized per-pretoken segmentations ([[BpeVocab]] memo contract):
    * space-joined; the `[UNK]` outcome memoizes as the marker itself
    * (pretokens never contain `[` runs mixed with letters, so the
    * marker cannot collide with a real segmentation). */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MemoCap = 1 << 16

  /** Greedy longest-match segmentation of ONE pretoken. Returns null
    * when the word cannot be covered (the caller chooses `[UNK]` or
    * the raw word) — also the outcome for words over the char cap. */
  def segmentWordOrNull(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val cached = memo.get(word)
    if (cached != null)
      return if (cached == WordPieceVocab.UnkMarker) null else cached.split(' ')
    val result = computeSegments(word)
    if (word.length <= BpeVocab.MaxMemoWordLen) {
      if (memo.size >= MemoCap) memo.clear()
      memo.put(word,
        if (result == null) WordPieceVocab.UnkMarker
        else String.join(" ", result: _*))
      ()
    }
    result
  }

  private def computeSegments(word: String): Array[String] = {
    if (word.codePointCount(0, word.length) > maxCharsPerWord) return null
    val out = new java.util.ArrayList[String](4)
    var start = 0
    while (start < word.length) {
      // longest match first: walk the end boundary down codepoint-wise
      var end = word.length
      var cur: String = null
      while (cur == null && end > start) {
        val s = word.substring(start, end)
        val probe = if (start > 0) "##" + s else s
        if (ids.containsKey(probe)) cur = probe
        else {
          // step back one CODEPOINT (never split a surrogate pair)
          end -= 1
          if (end > start && Character.isLowSurrogate(word.charAt(end))) end -= 1
        }
      }
      if (cur == null) return null // whole word → [UNK] (BERT's is_bad)
      out.add(cur)
      start = end
    }
    out.toArray(new Array[String](out.size))
  }

  /** Segments of every pretoken in order; a failed word contributes
    * `[UNK]` (default) or itself verbatim (`keepRaw`). */
  def segmentText(text: String, keepRaw: Boolean): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val m = BpeVocab.Pretoken.matcher(text)
    while (m.find()) {
      val segs = segmentWordOrNull(m.group())
      if (segs == null) out.add(if (keepRaw) m.group() else "[UNK]")
      else {
        var i = 0
        while (i < segs.length) { out.add(segs(i)); i += 1 }
      }
    }
    out
  }

  /** Token ids (`[UNK]`'s id for failed words — the BERT contract). */
  def encode(text: String): java.util.ArrayList[Integer] = {
    val out = new java.util.ArrayList[Integer]()
    val m = BpeVocab.Pretoken.matcher(text)
    while (m.find()) {
      val segs = segmentWordOrNull(m.group())
      if (segs == null) { out.add(Integer.valueOf(unkId)); () }
      else {
        var i = 0
        while (i < segs.length) { out.add(ids.get(segs(i))); i += 1 }
      }
    }
    out
  }

  /** `size(encode(text))` without building the array. */
  def idCount(text: String): Int = {
    var n = 0
    val m = BpeVocab.Pretoken.matcher(text)
    while (m.find()) {
      val segs = segmentWordOrNull(m.group())
      n += (if (segs == null) 1 else segs.length)
    }
    n
  }

  /** Structural round-trip: segment every pretoken (keepRaw — failed
    * words survive verbatim), strip the continuation prefixes by
    * POSITION (the first segment of a word is never a continuation;
    * every later one always is — no string heuristics, so a literal
    * `##`-initial symbol pretoken cannot mis-strip), and re-join with
    * the original whitespace gaps. Equals the input byte-for-byte by
    * construction — the oracle-checkable invariant that pins the
    * walker and the greedy join. */
  def roundtrip(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    val m = BpeVocab.Pretoken.matcher(text)
    var last = 0
    while (m.find()) {
      if (m.start() > last) sb.append(text, last, m.start())
      val segs = segmentWordOrNull(m.group())
      if (segs == null) sb.append(m.group())
      else {
        var i = 0
        while (i < segs.length) {
          if (i == 0) sb.append(segs(i))
          else sb.append(segs(i), 2, segs(i).length) // strip "##"
          i += 1
        }
      }
      last = m.end()
    }
    if (last < text.length) sb.append(text, last, text.length)
    sb.toString
  }
}

object WordPieceVocab {
  /** Memo sentinel for the `[UNK]` outcome. Cannot collide with a real
    * space-joined segmentation: the marker mixes a control symbol with
    * letters, and a pretoken — segmentWordOrNull's input — is always a
    * single character class, so no segmentation join ever equals it. */
  private[functions] val UnkMarker = "\u0001UNK"

  /** BERT's published per-word char cap (WordpieceTokenizer's
    * `max_input_chars_per_word`). */
  val MaxCharsPerWord = 100

  /** Parse `vocab.txt` lines (one token per line, id = line number;
    * duplicates keep the first id, the uniform loader contract).
    * `[UNK]` is required — greedy matching needs a failure token. */
  def parse(lines: Iterator[String]): WordPieceVocab = {
    val ids = new java.util.HashMap[String, Integer]()
    val toks = new java.util.ArrayList[String]()
    var id = 0
    for (line <- lines) {
      if (!ids.containsKey(line)) { ids.put(line, Integer.valueOf(id)); () }
      toks.add(line)
      id += 1
    }
    require(ids.containsKey("[UNK]"),
      "wordpiece vocab must contain [UNK] — greedy matching needs a failure token")
    new WordPieceVocab(ids, toks.toArray(new Array[String](toks.size())),
      MaxCharsPerWord)
  }
}

/** Executor-side WordPiece vocab cache — the [[BpeRegistry]] contract. */
object WordPieceRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, WordPieceVocab]()

  def get(path: String): WordPieceVocab =
    cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): WordPieceVocab = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try WordPieceVocab.parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  def segments(path: String, keepRaw: Boolean,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val segs = get(path).segmentText(text.toString, keepRaw)
    val vals = new Array[Any](segs.size)
    var i = 0
    while (i < vals.length) { vals(i) = UTF8String.fromString(segs.get(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }

  def encode(path: String,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = get(path).encode(text.toString)
    val ids = new Array[Int](out.size)
    var i = 0
    while (i < ids.length) { ids(i) = out.get(i).intValue(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ids)
  }

  def count(path: String, text: UTF8String): Int = get(path).idCount(text.toString)

  def roundtrip(path: String, text: UTF8String): UTF8String =
    UTF8String.fromString(get(path).roundtrip(text.toString))
}

/** `graft_wordpiece_segments(string, 'vocab-path'[, keepRaw]) ->
  * array<string>`: greedy longest-match WordPiece segments (`##`
  * continuation prefixes preserved). A word no vocab walk can cover
  * emits `[UNK]` — or itself verbatim with `keepRaw = true`. */
case class WordPieceSegments(child: Expression, vocabPath: String,
    keepRaw: Boolean = false) extends UnaryExpression {
  require(vocabPath.nonEmpty, "graft_wordpiece_segments needs a vocab path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_wordpiece_segments expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_segments"

  override protected def nullSafeEval(t: Any): Any =
    WordPieceRegistry.segments(vocabPath, keepRaw, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordPieceRegistry.segments($ref, $keepRaw, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_wordpiece_encode(string, 'vocab-path') -> array<int>`: token
  * ids (line numbers); failed words emit `[UNK]`'s id — the BERT
  * contract, lossy by design. */
case class WordPieceEncode(child: Expression, vocabPath: String) extends UnaryExpression {
  require(vocabPath.nonEmpty, "graft_wordpiece_encode needs a vocab path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_wordpiece_encode expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  override protected def nullSafeEval(t: Any): Any =
    WordPieceRegistry.encode(vocabPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPieceRegistry.encode($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_wordpiece_count(string, 'vocab-path') -> int`:
  * `size(graft_wordpiece_encode(text))` without building the array. */
case class WordPieceCount(child: Expression, vocabPath: String) extends UnaryExpression {
  require(vocabPath.nonEmpty, "graft_wordpiece_count needs a vocab path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_wordpiece_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_wordpiece_count"

  override protected def nullSafeEval(t: Any): Any =
    WordPieceRegistry.count(vocabPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPieceRegistry.count($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_wordpiece_roundtrip(string, 'vocab-path') -> string`: segment
  * every pretoken (failed words kept verbatim), strip continuation
  * prefixes positionally, re-join with the original whitespace —
  * equals the input byte-for-byte by construction (the oracle gate for
  * the walker + greedy join). */
case class WordPieceRoundtrip(child: Expression, vocabPath: String) extends UnaryExpression {
  require(vocabPath.nonEmpty, "graft_wordpiece_roundtrip needs a vocab path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_wordpiece_roundtrip expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wordpiece_roundtrip"

  override protected def nullSafeEval(t: Any): Any =
    WordPieceRegistry.roundtrip(vocabPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPieceRegistry.roundtrip($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
