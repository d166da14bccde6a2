package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding token counting from a config-loaded merge
  * table (the `merges.txt` format trained BPE tokenizers publish: one
  * `left right` pair per line, priority = line order, optional
  * `#version` header).
  *
  * Algorithm (the standard one): pretokenize into letter runs, digit
  * runs, and symbol runs (whitespace dropped); within each pretoken,
  * start from characters and repeatedly merge ALL occurrences of the
  * lowest-rank adjacent pair present in the table until none applies;
  * the token count is the number of surviving symbols. With a real
  * tokenizer's merge table this reproduces its segment count for text
  * covered by the table — upgrading `n_tokens` from the
  * `bpeishTokenCount` heuristic to actual subword counts.
  *
  * Scale shape: the merge table is loaded ONCE per executor JVM
  * ([[BpeRegistry]], keyed by path) — the expression ships only the
  * path string, never the table; per-word results are memoized
  * (Zipfian corpora hit the cache constantly); and the expression
  * codegens to a static call so the scan stays inside whole-stage
  * codegen. Paths should be absolute URIs reachable from executors
  * (`file:///...` on shared storage, `hdfs://...`) — ship small tables
  * with `--files` and reference the local name.
  */
final class BpeVocab private (ranks: java.util.HashMap[String, Integer]) {

  /** Memoized per-pretoken segmentations, stored SPACE-JOINED (one
    * String per entry, ~word length — pretokens contain no whitespace,
    * so the join is unambiguous; an Array[String] payload would cost
    * one object per SYMBOL and break the cap's memory bound). Words
    * longer than [[BpeVocab.MaxMemoWordLen]] are recomputed instead of
    * cached — unbounded pretoken runs (base64 blobs, URLs) are rare,
    * low-reuse, and would blow the per-entry size bound. Counts derive
    * from the same entries, so count and segment consumers share one
    * cache. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MemoCap = 1 << 16

  private def rank(a: String, b: String): Int = {
    val r = ranks.get(a + " " + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** BPE segmentation of ONE pretoken (no whitespace inside): the
    * surviving merge symbols, in order. */
  def segmentWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val cached = memo.get(word)
    if (cached != null) return cached.split(' ')
    // codepoint-aware base split (surrogate pairs stay together): base
    // symbols must be valid Unicode strings or they cannot round-trip
    // through UTF-8 merge/vocab files — lone surrogates encode as '?'.
    // The trainer (BpeTrainer.learnFromCounts) and the vocab builder
    // use the same unit, so the three always agree.
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && syms.size >= 2) {
      // lowest-rank adjacent pair present in the table
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = rank(syms.get(j), syms.get(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL (non-overlapping, left-to-right) occurrences of it
        val merged = new java.util.ArrayList[String](syms.size)
        var p = 0
        while (p < syms.size) {
          if (p < syms.size - 1 && rank(syms.get(p), syms.get(p + 1)) == best) {
            merged.add(syms.get(p) + syms.get(p + 1)); p += 2
          } else { merged.add(syms.get(p)); p += 1 }
        }
        syms = merged
      }
    }
    val arr = syms.toArray(new Array[String](syms.size))
    if (word.length <= BpeVocab.MaxMemoWordLen) {
      if (memo.size >= MemoCap) memo.clear()
      memo.put(word, String.join(" ", syms))
      ()
    }
    arr
  }

  /** BPE token count of ONE pretoken — the hot BpeCount path reads the
    * cached joined form without materializing the segment array. */
  def countWord(word: String): Int = {
    if (word.isEmpty) return 0
    val cached = memo.get(word)
    if (cached != null) {
      var n = 1
      var i = 0
      while (i < cached.length) { if (cached.charAt(i) == ' ') n += 1; i += 1 }
      n
    } else segmentWord(word).length
  }

  /** Total BPE token count of a text: sum over pretokens (letter runs /
    * digit runs / symbol runs; whitespace contributes nothing). */
  def countText(text: String): Int = {
    val m = BpeVocab.Pretoken.matcher(text)
    var n = 0
    while (m.find()) n += countWord(m.group())
    n
  }

  /** Full subword segmentation of a text: segments of every pretoken
    * in order — the training-export form (map segments to ids with any
    * published vocab downstream). */
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

  /** LOSSLESS segmentation: like [[segmentText]], but the whitespace
    * gaps BETWEEN pretokens are emitted as segments too (verbatim, one
    * segment per gap — merges never span whitespace, so gaps need no
    * merge loop). Concatenating the segments reproduces the input
    * byte-for-byte, which is what makes `decode(encode(x)) == x`
    * possible downstream: whitespace segments are never in a vocab and
    * ride the byte-fallback ids. */
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
}

object BpeVocab {
  private[functions] val Pretoken =
    java.util.regex.Pattern.compile("""[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]+""")

  /** The pretokenization regex as a string — the trainer
    * ([[graft.llm.BpeTrainer]]) must count words under EXACTLY the
    * contract segmentation/counting use, or learned merges would not
    * round-trip. */
  def pretokenRegex: String = Pretoken.pattern()

  /** Pretokens longer than this are recomputed instead of memoized —
    * keeps the memo's retained memory ≤ MemoCap × this many chars. */
  private[functions] val MaxMemoWordLen = 512

  /** Parse `merges.txt` lines: `left right` per line, rank = order;
    * blank lines and a leading `#version` header are skipped. */
  def parse(lines: Iterator[String]): BpeVocab = {
    val ranks = new java.util.HashMap[String, Integer]()
    var rank = 0
    var first = true
    for (line <- lines) {
      val l = line.trim
      val isHeader = first && l.startsWith("#version")
      first = false
      if (l.nonEmpty && !isHeader) {
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1 && l.indexOf(' ', sp + 1) < 0,
          s"malformed merge line (need exactly 'left right'): '$l'")
        if (!ranks.containsKey(l)) { ranks.put(l, Integer.valueOf(rank)); rank += 1 }
      }
    }
    new BpeVocab(ranks)
  }
}

/** Executor-side merge-table cache: one load per (JVM, path). Static so
  * generated code and every task share it; the expression tree carries
  * only the path. */
object BpeRegistry {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, BpeVocab]()

  def get(path: String): BpeVocab =
    cache.computeIfAbsent(path, load(_))

  /** Test hook: drop a cached table (e.g. after rewriting the file). */
  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): BpeVocab = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try BpeVocab.parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Codegen / eval entry: count tokens of `text` under the table at
    * `path`. */
  def count(path: String, text: UTF8String): Int = get(path).countText(text.toString)

  /** Codegen / eval entry: full subword segmentation of `text`. */
  def segments(path: String, text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val segs = get(path).segmentText(text.toString)
    val vals = new Array[Any](segs.size)
    var i = 0
    while (i < vals.length) { vals(i) = UTF8String.fromString(segs.get(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }
}

/** `graft_bpe_segments(string, 'merges-path') -> array<string>`: the
  * actual subword SEGMENTS under the merge table (the training-export
  * form — join against any published vocab for ids), same registry /
  * memo / codegen contract as [[BpeCount]], and `size(segments) ==
  * graft_bpe_count` by construction (one shared cache entry). */
case class BpeSegments(child: Expression, mergesPath: String) extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_segments needs a merges path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_segments expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_segments"

  override protected def nullSafeEval(t: Any): Any =
    BpeRegistry.segments(mergesPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("bpeMergesPath", mergesPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeRegistry.segments($pathRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** User-defined PROTECTED special tokens (`<|endoftext|>`-class): spans
  * of the input that match a declared spelling are carved out BEFORE
  * pretokenization, so they are never merged across, always emit their
  * single fixed vocab id, and decode back to their spelling verbatim —
  * the contract every downstream trainer consumes (the HuggingFace
  * `added_tokens` / SentencePiece `user_defined_symbols` behavior,
  * reimplemented from the published semantics).
  *
  * The FIXED-ID guarantee is the artifact's: a special's id is its
  * vocab line number like any token, so pinning `<|endoftext|>` to an
  * id means putting it on that line (the Tokenizer CLI appends
  * declared specials at the vocab tail in declaration order — stable
  * ids across re-encodes of the same artifact). Encoding with a
  * special the vocab does not carry fails loudly, never silently
  * re-segments.
  *
  * Matching is literal (no regex), earliest-occurrence-first; when two
  * spellings match at the same position the LONGEST wins (so
  * `<|endoftext|>` beats a declared `<|end|>` prefix). A special found
  * mid-word splits the word: `ab<|eot|>cd` encodes as
  * `encode("ab") :+ eotId :++ encode("cd")` — nothing merges across
  * the boundary by construction, because the surrounding spans are
  * segmented independently.
  *
  * Scale shape: the expression ships one joined spelling string; the
  * parsed array is cached per key (static, shared by generated code);
  * matching is k × indexOf per span with k = a handful of declared
  * tokens. */
object SpecialTokensImpl {
  /** Joiner for shipping a spelling list through one codegen reference
    * object — U+0001 can never appear in a declared spelling (the
    * expressions reject it). */
  val Sep = "\u0001"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  def parse(key: String): Array[String] =
    cache.computeIfAbsent(key, _.split(Sep).filter(_.nonEmpty))

  def join(spellings: Seq[String]): String = {
    spellings.foreach { s =>
      require(s.nonEmpty, "special token spelling must be non-empty")
      require(!s.contains(Sep),
        "special token spelling must not contain U+0001")
    }
    spellings.mkString(Sep)
  }

  /** Earliest occurrence of any spelling at or after `from`:
    * `(start << 32) | spellingIndex`, or -1 when none occurs. Ties on
    * start go to the longest spelling. */
  def findNext(text: String, from: Int, spellings: Array[String]): Long = {
    var bestStart = -1
    var bestIdx = -1
    var bestLen = 0
    var i = 0
    while (i < spellings.length) {
      val p = text.indexOf(spellings(i), from)
      if (p >= 0 && (bestStart < 0 || p < bestStart ||
          (p == bestStart && spellings(i).length > bestLen))) {
        bestStart = p; bestIdx = i; bestLen = spellings(i).length
      }
      i += 1
    }
    if (bestIdx < 0) -1L else (bestStart.toLong << 32) | bestIdx.toLong
  }
}

/** A loaded id vocab: token→id map, id→token table, and the derived
  * byte-fallback / control-token structure. */
final class IdVocab(
    val ids: java.util.HashMap[String, Integer],
    val tokens: Array[String]) {

  /** Byte-fallback table: `byteIds(b)` = id of the reserved token
    * `<0xNN>`; null when the vocab does not carry all 256 byte tokens
    * (legacy vocabs → `<unk>` behavior). The reserved spelling cannot
    * collide with a real segment: pretokens are single-class runs
    * (letters | digits | symbols), so no segment or merge product ever
    * mixes `<`, digits, and letters. */
  val byteIds: Array[Int] = {
    val b = new Array[Int](256)
    var ok = true
    var i = 0
    while (ok && i < 256) {
      val id = ids.get(IdVocab.byteToken(i))
      if (id == null) ok = false else b(i) = id.intValue()
      i += 1
    }
    if (ok) b else null
  }

  /** Id of the `<eos>` document separator, or -1 when absent. */
  val eosId: Int = {
    val id = ids.get("<eos>")
    if (id == null) -1 else id.intValue()
  }

  /** `byteValue(id)` = the raw byte an id decodes to, or -1 for
    * non-byte tokens — the decode-side inverse of `byteIds`. */
  val byteValue: Array[Int] = {
    val v = Array.fill(tokens.length)(-1)
    if (byteIds != null) {
      var b = 0
      while (b < 256) { v(byteIds(b)) = b; b += 1 }
    }
    v
  }

  def hasByteFallback: Boolean = byteIds != null
}

object IdVocab {
  /** The reserved byte-token spelling: `<0x00>` … `<0xFF>`. */
  def byteToken(b: Int): String = f"<0x$b%02X>"
}

/** Executor-side vocab cache for id encoding: one token per line, id =
  * line number, `<unk>` REQUIRED at line 0. Unknown segments map to
  * their UTF-8 bytes through the reserved `<0xNN>` byte tokens when the
  * vocab carries all 256 of them (the SentencePiece byte_fallback
  * contract — encoding is TOTAL, `<unk>` structurally impossible), and
  * to `<unk>` = 0 on legacy vocabs without them. Same
  * one-load-per-(JVM, path) contract as [[BpeRegistry]]. */
object BpeVocabIdRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, IdVocab]()

  def get(path: String): IdVocab =
    cache.computeIfAbsent(path, load(_))

  /** Test hook: drop a cached vocab (e.g. after rewriting the file). */
  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): IdVocab = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val m = new java.util.HashMap[String, Integer]()
    val toks = new java.util.ArrayList[String]()
    try {
      var id = 0
      for (line <- scala.io.Source.fromInputStream(in, "UTF-8").getLines()) {
        // tokens never contain whitespace (pretokens exclude it), so
        // the line IS the token — no escaping needed; duplicate lines
        // keep the FIRST id (merge products can collide textually)
        if (!m.containsKey(line)) { m.put(line, Integer.valueOf(id)); () }
        toks.add(line)
        id += 1
      }
    } finally in.close()
    require(m.containsKey("<unk>") && m.get("<unk>").intValue() == 0,
      s"vocab at $path must have <unk> on line 0 (the unknown-segment id)")
    new IdVocab(m, toks.toArray(new Array[String](toks.size())))
  }

  /** Map one segment to ids into `out`: its vocab id, or its UTF-8
    * bytes through the byte tokens, or `<unk>` = 0 (legacy vocab). */
  private def emitSegment(v: IdVocab, seg: String,
      out: java.util.ArrayList[Integer]): Unit = {
    val id = v.ids.get(seg)
    if (id != null) { out.add(id); () }
    else if (v.byteIds != null) {
      val bytes = seg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < bytes.length) {
        out.add(Integer.valueOf(v.byteIds(bytes(i) & 0xFF)))
        i += 1
      }
    } else { out.add(Integer.valueOf(0)); () }
  }

  private def toArrayData(
      out: java.util.ArrayList[Integer]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ids = new Array[Int](out.size)
    var i = 0
    while (i < ids.length) { ids(i) = out.get(i).intValue(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ids)
  }

  /** Encode one normal (special-free) span into `out`. */
  private def encodeSpan(bpe: BpeVocab, v: IdVocab, span: String,
      lossless: Boolean, out: java.util.ArrayList[Integer]): Unit = {
    val segs =
      if (lossless) bpe.segmentTextLossless(span) else bpe.segmentText(span)
    var i = 0
    while (i < segs.size) { emitSegment(v, segs.get(i), out); i += 1 }
  }

  /** Resolve one declared special spelling to its fixed vocab id —
    * loudly: encoding with a special the vocab does not carry would
    * otherwise silently re-segment it as ordinary text. */
  private def specialId(v: IdVocab, vocabPath: String, spelling: String): Integer = {
    val id = v.ids.get(spelling)
    require(id != null,
      s"special token '$spelling' missing from vocab at $vocabPath — " +
        "append it to the vocab (fixed id = its line) before encoding with it")
    id
  }

  /** Shared encode core: carve out declared special-token spans
    * ([[SpecialTokensImpl]] — emitted as their single fixed id), encode
    * the text between them through the normal segment path. With no
    * specials the whole text is one span (zero extra work). */
  private def encodeWithSpecials(mergesPath: String, vocabPath: String,
      specialsKey: String, text: UTF8String,
      lossless: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bpe = BpeRegistry.get(mergesPath)
    val v = get(vocabPath)
    if (lossless) require(v.hasByteFallback,
      s"graft_bpe_encode_lossless: vocab at $vocabPath has no byte-fallback " +
        "tokens (<0x00>..<0xFF>) — rebuild it with BpeTrainer.buildVocab")
    val s = text.toString
    val out = new java.util.ArrayList[Integer](32)
    val spellings =
      if (specialsKey.isEmpty) null else SpecialTokensImpl.parse(specialsKey)
    if (spellings == null || spellings.isEmpty) {
      encodeSpan(bpe, v, s, lossless, out)
      return toArrayData(out)
    }
    var pos = 0
    while (pos < s.length) {
      val hit = SpecialTokensImpl.findNext(s, pos, spellings)
      if (hit < 0) {
        encodeSpan(bpe, v, s.substring(pos), lossless, out)
        pos = s.length
      } else {
        val start = (hit >> 32).toInt
        val spelling = spellings((hit & 0xFFFFFFFFL).toInt)
        if (start > pos) encodeSpan(bpe, v, s.substring(pos, start), lossless, out)
        out.add(specialId(v, vocabPath, spelling))
        pos = start + spelling.length
      }
    }
    toArrayData(out)
  }

  /** Codegen / eval entry: segment `text` under the merge table, map
    * each segment to ids (byte fallback when the vocab supports it);
    * `specialsKey` (possibly empty) declares protected special tokens
    * — see [[SpecialTokensImpl]]. */
  def encode(mergesPath: String, vocabPath: String, specialsKey: String,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    encodeWithSpecials(mergesPath, vocabPath, specialsKey, text, lossless = false)

  def encode(mergesPath: String, vocabPath: String,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    encode(mergesPath, vocabPath, "", text)

  /** Codegen / eval entry for the LOSSLESS form: whitespace gaps are
    * encoded too (always through byte fallback — whitespace is never in
    * a vocab), so `decode(encodeLossless(x)) == x` byte-for-byte.
    * Requires a byte-fallback vocab: without one the whitespace would
    * collapse into `<unk>` runs and the round-trip contract would be
    * silently broken — fail loudly instead. Declared specials keep the
    * round-trip: their id decodes to their spelling verbatim. */
  def encodeLossless(mergesPath: String, vocabPath: String, specialsKey: String,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    encodeWithSpecials(mergesPath, vocabPath, specialsKey, text, lossless = true)

  def encodeLossless(mergesPath: String, vocabPath: String,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    encodeLossless(mergesPath, vocabPath, "", text)

  /** Number of ids one segment encodes to: 1 when in-vocab, its UTF-8
    * byte count under byte fallback, 1 (`<unk>`) on a legacy vocab —
    * so `idCountText == size(encode(text))` by construction. */
  private def idCountSegment(v: IdVocab, seg: String): Int =
    if (v.ids.containsKey(seg)) 1
    else if (v.byteIds != null)
      seg.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    else 1

  /** Codegen entry for [[BpeIdCount]] — UTF8String bridge over
    * [[idCountText]]. */
  def idCount(mergesPath: String, vocabPath: String, text: UTF8String): Int =
    idCountText(mergesPath, vocabPath, text.toString)

  /** Token-ID count of a text under (merges, vocab) — what
    * `size(graft_bpe_encode(text))` would return, without building the
    * array. This, not the segment count, is the budget a context
    * window actually consumes once byte fallback exists: an unseen
    * segment costs its UTF-8 byte count of ids, not 1. */
  def idCountText(mergesPath: String, vocabPath: String, text: String): Int = {
    val bpe = BpeRegistry.get(mergesPath)
    val v = get(vocabPath)
    val m = BpeVocab.Pretoken.matcher(text)
    var n = 0
    while (m.find()) {
      val segs = bpe.segmentWord(m.group())
      var i = 0
      while (i < segs.length) { n += idCountSegment(v, segs(i)); i += 1 }
    }
    n
  }

  /** Codegen / eval entry: ids → text. Byte tokens contribute their raw
    * byte; every other token contributes its UTF-8 bytes; `<unk>`
    * decodes to U+FFFD (it carries no recoverable content) and `<eos>`
    * to nothing (a control separator — document structure rides the
    * boundaries column of the packed export, not the text). Inverse of
    * [[encodeLossless]] by construction: in-vocab segments decode to
    * their own spelling, fallback bytes reassemble verbatim. */
  def decode(vocabPath: String,
      ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val v = get(vocabPath)
    val n = ids.numElements()
    val buf = new java.io.ByteArrayOutputStream(n * 4)
    var i = 0
    while (i < n) {
      require(!ids.isNullAt(i), s"graft_bpe_decode: null id at position $i")
      val id = ids.getInt(i)
      require(id >= 0 && id < v.tokens.length,
        s"graft_bpe_decode: id $id out of range for vocab of ${v.tokens.length}")
      val b = v.byteValue(id)
      if (b >= 0) buf.write(b)
      else if (id == 0) // <unk>
        buf.write("�".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else if (id != v.eosId)
        buf.write(v.tokens(id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    UTF8String.fromBytes(buf.toByteArray)
  }
}

/** `graft_bpe_encode(string, 'merges-path', 'vocab-path'[, 'specials'])
  * -> array<int>`: token IDS for training export — the segments of
  * [[BpeSegments]] mapped through a line-per-token vocab file (`<unk>`
  * = id 0 for segments outside it). `size(ids) == graft_bpe_count` by
  * construction (same segmentation, same memo) when no specials are
  * declared. `specials` (comma-separated in SQL, a Seq in the Column
  * API) declares protected special tokens — see
  * [[SpecialTokensImpl]]. */
case class BpeEncode(child: Expression, mergesPath: String,
    vocabPath: String, specials: Seq[String] = Nil) extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_encode needs a merges path")
  require(vocabPath.nonEmpty, "graft_bpe_encode needs a vocab path")
  private val specialsKey = SpecialTokensImpl.join(specials)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_encode expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(t: Any): Any =
    BpeVocabIdRegistry.encode(mergesPath, vocabPath, specialsKey,
      t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMergesPath", mergesPath, "java.lang.String")
    val vRef = ctx.addReferenceObj("bpeVocabPath", vocabPath, "java.lang.String")
    val sRef = ctx.addReferenceObj("bpeSpecials", specialsKey, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeVocabIdRegistry.encode($mRef, $vRef, $sRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_bpe_encode_lossless(string, 'merges-path', 'vocab-path'[,
  * 'specials']) -> array<int>`: token ids with whitespace preserved
  * through byte fallback — `graft_bpe_decode` of the result reproduces
  * the input byte-for-byte (the training-export contract where nothing
  * may be lost). Requires a byte-fallback vocab (fails loudly
  * otherwise). Declared specials ([[SpecialTokensImpl]]) keep the
  * round-trip: their single fixed id decodes to their spelling. */
case class BpeEncodeLossless(child: Expression, mergesPath: String,
    vocabPath: String, specials: Seq[String] = Nil) extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_encode_lossless needs a merges path")
  require(vocabPath.nonEmpty, "graft_bpe_encode_lossless needs a vocab path")
  private val specialsKey = SpecialTokensImpl.join(specials)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_encode_lossless expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode_lossless"

  override protected def nullSafeEval(t: Any): Any =
    BpeVocabIdRegistry.encodeLossless(mergesPath, vocabPath, specialsKey,
      t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMergesPath", mergesPath, "java.lang.String")
    val vRef = ctx.addReferenceObj("bpeVocabPath", vocabPath, "java.lang.String")
    val sRef = ctx.addReferenceObj("bpeSpecials", specialsKey, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeVocabIdRegistry.encodeLossless($mRef, $vRef, $sRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_bpe_decode(array<int>, 'vocab-path') -> string`: ids back to
  * text. Byte tokens reassemble verbatim; `<unk>` renders U+FFFD;
  * `<eos>` renders nothing. `decode(encode_lossless(x)) == x`
  * byte-parity (spec-pinned). */
case class BpeDecode(child: Expression, vocabPath: String) extends UnaryExpression {
  require(vocabPath.nonEmpty, "graft_bpe_decode needs a vocab path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_decode expects array<int>, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_decode"

  override protected def nullSafeEval(ids: Any): Any =
    BpeVocabIdRegistry.decode(vocabPath,
      ids.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("bpeVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeVocabIdRegistry.decode($vRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Greedy BPE-budget chunking (`graft_bpe_chunks`): split a document at
  * WHITESPACE-token boundaries so that each chunk's REAL subword count
  * (under the config-loaded merge table) stays within `budget` — the
  * packing step training pipelines actually need, since a context
  * window is a SUBWORD budget and a 32-whitespace-token chunk can be
  * anywhere from 10 to 80 BPE tokens.
  *
  * Semantics: walk whitespace tokens left to right, accumulating each
  * token's BPE count (pretokens never span whitespace, so a chunk's
  * count is exactly the sum of its tokens' counts); cut BEFORE the
  * token that would exceed `budget`. A single token whose own count
  * exceeds the budget forms its own (over-budget) chunk — progress is
  * guaranteed and nothing is silently dropped; filter on the emitted
  * `chunk_bpe_tokens` if hard enforcement is wanted. The next chunk
  * starts `overlap` whitespace tokens before the previous end (clamped
  * to always advance). Zero tokens → empty array.
  *
  * Scale shape: same as [[BpeCount]] — the merge table loads once per
  * executor JVM, per-token counts hit the Zipfian memo, the chunk text
  * is built by byte-range copies (no token-array materialization), and
  * the expression codegens to one static call. */
object BpeChunksImpl {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** `vocabPath` empty = budget in SEGMENTS (the legacy contract,
    * `graft_bpe_count` units); non-empty = budget in token IDS under
    * that vocab (`size(graft_bpe_encode)` units) — the honest budget
    * once byte fallback exists, where an unseen segment encodes to its
    * UTF-8 byte count of ids and a segment-counted chunk could
    * silently overflow the context window it was sized for. */
  def compute(path: String, vocabPath: String, text: UTF8String,
      budget: Int, overlap: Int): ArrayData = {
    val vocab = BpeRegistry.get(path)
    val countOf: String => Int =
      if (vocabPath.isEmpty) vocab.countText(_)
      else BpeVocabIdRegistry.idCountText(path, vocabPath, _)
    TokenBudgetChunker.compute(countOf, text, budget, overlap)
  }
}

/** The tokenizer-agnostic subword-budget chunker behind
  * `graft_bpe_chunks` and `graft_unigram_chunks`: walk whitespace
  * tokens left to right (byte-for-byte the same `\s+` semantics as
  * `ChunksImpl`, so every chunker cuts at identical boundaries),
  * accumulate each token's count under the supplied counter, cut
  * BEFORE the token that would exceed `budget` (a single over-budget
  * token forms its own chunk — progress guaranteed, nothing dropped),
  * and restart `overlap` tokens back, always advancing. The counter is
  * where the tokenizer family plugs in; each family's registry memo
  * makes the per-token probe amortized ~0. */
object TokenBudgetChunker {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def compute(countOf: String => Int, text: UTF8String,
      budget: Int, overlap: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // whitespace-token boundary scan — byte-for-byte the same `\s+`
    // semantics as ChunksImpl so the two chunkers cut at identical
    // boundaries
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var n = 0
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        if (n == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(n) = tokStart; ends(n) = i; n += 1
        tokStart = -1
      }
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // per-token subword counts (memoized in the vocab)
    val bpe = new Array[Int](n)
    i = 0
    while (i < n) {
      bpe(i) = countOf(
        UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i)).toString)
      i += 1
    }
    val out = new java.util.ArrayList[Any](8)
    var t0 = 0
    while (t0 < n) {
      var t1 = t0
      var sum = 0
      // greedy fill; always take at least one token
      while (t1 < n && (t1 == t0 || sum + bpe(t1) <= budget)) {
        sum += bpe(t1); t1 += 1
      }
      var outLen = t1 - t0 - 1
      var t = t0
      while (t < t1) { outLen += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](outLen)
      var pos = 0
      t = t0
      while (t < t1) {
        if (t > t0) { buf(pos) = 0x20; pos += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, pos, l)
        pos += l
        t += 1
      }
      out.add(InternalRow(UTF8String.fromBytes(buf), t1 - t0, sum))
      // next start: overlap whitespace tokens back, but always advance
      t0 = if (t1 >= n) n else math.max(t1 - overlap, t0 + 1)
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_bpe_chunks(string, 'merges-path', budget, overlap) ->
  * array<struct<chunk_text string, chunk_tokens int, chunk_bpe_tokens int>>`
  * — with `vocabPath` non-empty the budget (and `chunk_bpe_tokens`)
  * count token IDS under that vocab instead of segments. */
case class BpeChunks(child: Expression, mergesPath: String, budget: Int,
    overlap: Int, vocabPath: String = "") extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_chunks needs a merges path")
  require(budget > 0, s"budget must be positive, got $budget")
  require(overlap >= 0, s"overlap must be non-negative, got $overlap")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_chunks expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("chunk_tokens", IntegerType, nullable = false),
    StructField("chunk_bpe_tokens", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_bpe_chunks"

  override protected def nullSafeEval(t: Any): Any =
    BpeChunksImpl.compute(mergesPath, vocabPath, t.asInstanceOf[UTF8String],
      budget, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("bpeMergesPath", mergesPath, "java.lang.String")
    val vRef = ctx.addReferenceObj("bpeVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeChunksImpl.compute($pathRef, $vRef, $c, $budget, $overlap)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_bpe_count(string, 'merges-path') -> int` */
case class BpeCount(child: Expression, mergesPath: String) extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_count needs a merges path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(t: Any): Any =
    BpeRegistry.count(mergesPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the path goes through a reference object, not a string literal —
    // no escaping hazards in generated Java
    val pathRef = ctx.addReferenceObj("bpeMergesPath", mergesPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeRegistry.count($pathRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_bpe_id_count(string, 'merges-path', 'vocab-path') -> int` —
  * the TRUE id count under (merges, vocab): `size(graft_bpe_encode)`
  * without building the array. Differs from [[BpeCount]] exactly when
  * byte fallback is live — an OOV segment costs its UTF-8 byte count
  * of ids, not 1 — so this, not the segment count, is what
  * `real-token-counts` and token budgets must use once a vocab is
  * configured (same contract [[BpeChunksImpl]] already follows). */
case class BpeIdCount(child: Expression, mergesPath: String,
    vocabPath: String) extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_id_count needs a merges path")
  require(vocabPath.nonEmpty, "graft_bpe_id_count needs a vocab path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_id_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_id_count"

  override protected def nullSafeEval(t: Any): Any =
    BpeVocabIdRegistry.idCount(mergesPath, vocabPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMergesPath", mergesPath, "java.lang.String")
    val vRef = ctx.addReferenceObj("bpeVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeVocabIdRegistry.idCount($mRef, $vRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
