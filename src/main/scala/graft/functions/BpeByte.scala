package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style BYTE-LEVEL BPE (Radford et al. 2019 — the released
  * encoder's published algorithm; also the HuggingFace `ByteLevel`
  * pretokenizer contract): the space-aware counterpart to the
  * segment-level surface in [[BpeVocab]]/[[BpeVocabIdRegistry]].
  *
  * Why a second mode exists: the segment-level tokenizer drops
  * whitespace during pretokenization, so its LOSSLESS export carries
  * every whitespace byte as one byte-fallback id — total, but
  * space-heavy text (code, markup, indented prose) spends ~one id per
  * space. Byte-level BPE instead attaches the leading space TO the
  * following word before merging, so `" the"` ends up ONE id (the
  * famous `Ġthe`) and whitespace costs asymptotically nothing on
  * natural text, while still being lossless-total by construction.
  *
  * The three published ingredients, all reimplemented from the
  * algorithm description (reference `tokenization/bpe.go` holds the
  * reference engine's segment-level analog; it has no byte-level mode):
  *
  *  1. A byte↔unicode BIJECTION ([[ByteUnicode]]): printable bytes map
  *     to themselves, the rest shift to `256+n` — so arbitrary bytes
  *     become a printable, whitespace-free string and the standard
  *     `merges.txt` / line-per-token vocab formats apply unchanged
  *     (space = 0x20 is the 33rd non-printable byte, hence
  *     256+32 = U+0120 = `Ġ`).
  *  2. The GPT-2 pretokenizer regex ([[ByteUnicode.PretokenRegex]]):
  *     contractions, ` ?`-prefixed letter/digit/symbol runs, and
  *     whitespace runs. The alternation TILES any input — every
  *     character lands in exactly one pretoken — which is what makes
  *     encode total and decode(encode(x)) == x byte-exact with no
  *     special whitespace path at all.
  *  3. BPE merges over the MAPPED strings — the merge loop, memo, and
  *     `merges.txt` parsing are [[BpeVocab]] verbatim (mapped symbols
  *     are ordinary BMP chars), so [[BpeRegistry]] is reused as-is and
  *     a published GPT-2 merge table is directly loadable.
  *
  * Scale shape: identical to the segment-level expressions — tables
  * load once per (executor JVM, path), per-pretoken segmentations hit
  * the Zipfian memo, and every expression codegens to one static call
  * inside whole-stage codegen.
  */
object ByteUnicode {

  /** `toChar(b)` = the printable char byte `b` maps to (the GPT-2
    * `bytes_to_unicode` table: `!`..`~`, `¡`..`¬`, `®`..`ÿ` identity,
    * everything else `256+n` in byte order). */
  val toChar: Array[Char] = {
    val printable = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse table: `fromChar(c)` = the byte char `c` decodes to, or -1
    * when `c` is not in the 256-char alphabet. Size 512 covers the
    * maximum mapped codepoint (256 + 67 shifted bytes < 512). */
  val fromChar: Array[Int] = {
    val out = Array.fill(512)(-1)
    var b = 0
    while (b < 256) { out(toChar(b).toInt) = b; b += 1 }
    out
  }

  /** The GPT-2 pretokenizer. Published pattern; `\s+(?!\S)` keeps a
    * trailing-whitespace run whole while backtracking one space before
    * a word so the ` ?\p{L}+` branch can claim it. */
  private[graft] val Pretoken = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  /** The pretokenizer as a string — the trainer must count words under
    * EXACTLY the contract the encoder segments with (the
    * [[BpeVocab.pretokenRegex]] rule). */
  def pretokenRegex: String = Pretoken.pattern()

  /** UTF-8 bytes of `s`, each mapped through [[toChar]] — the string
    * the merge table operates on. Injective (byte bijection + UTF-8),
    * and never contains whitespace, so the line-oriented artifact
    * formats stay safe. */
  def mapBytes(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(toChar(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }
}

/** A loaded byte-level id vocab: token→id, id→token, `<eos>`, and the
  * per-token decoded bytes (precomputed at load — decode is a byte
  * copy, not a per-id unmap loop). */
final class ByteLevelVocab(
    val ids: java.util.HashMap[String, Integer],
    val tokens: Array[String]) {

  /** Id of the `<eos>` document separator, or -1 when absent. */
  val eosId: Int = {
    val id = ids.get("<eos>")
    if (id == null) -1 else id.intValue()
  }

  private val unkId: Int = {
    val id = ids.get("<unk>")
    if (id == null) -1 else id.intValue()
  }

  /** `tokenBytes(id)` = the raw bytes id decodes to (null for control
    * tokens — `<unk>` renders U+FFFD, `<eos>` renders nothing).
    * Populated eagerly so a malformed vocab (a token containing a char
    * outside the 256-char alphabet) fails at LOAD, loudly, instead of
    * emitting wrong bytes mid-decode. */
  val tokenBytes: Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](tokens.length)
    var id = 0
    while (id < tokens.length) {
      if (id != unkId && id != eosId) {
        val t = tokens(id)
        val b = new Array[Byte](t.length)
        var i = 0
        while (i < t.length) {
          val c = t.charAt(i).toInt
          val byte = if (c < 512) ByteUnicode.fromChar(c) else -1
          require(byte >= 0,
            s"byte-level vocab token '$t' (id $id) contains char U+${c.toHexString.toUpperCase} " +
              "outside the 256-char byte alphabet — not a byte-level vocab")
          b(i) = byte.toByte
          i += 1
        }
        out(id) = b
      }
      id += 1
    }
    out
  }
}

/** Executor-side byte-level vocab cache: one token per line, id = line
  * number, `<unk>` required at line 0 (the uniform artifact contract —
  * never emitted by byte-level encoding, kept so one loader rule covers
  * both vocab families) and all 256 single-char byte symbols required
  * (without them encoding could NOT be total and the file is not a
  * byte-level vocab — fail at load). Same one-load-per-(JVM, path)
  * contract as [[BpeRegistry]]. */
object BpeByteVocabRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ByteLevelVocab]()

  def get(path: String): ByteLevelVocab =
    cache.computeIfAbsent(path, load(_))

  /** Test hook: drop a cached vocab (e.g. after rewriting the file). */
  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): ByteLevelVocab = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val m = new java.util.HashMap[String, Integer]()
    val toks = new java.util.ArrayList[String]()
    try {
      var id = 0
      for (line <- scala.io.Source.fromInputStream(in, "UTF-8").getLines()) {
        if (!m.containsKey(line)) { m.put(line, Integer.valueOf(id)); () }
        toks.add(line)
        id += 1
      }
    } finally in.close()
    require(m.containsKey("<unk>") && m.get("<unk>").intValue() == 0,
      s"vocab at $path must have <unk> on line 0")
    var b = 0
    while (b < 256) {
      require(m.containsKey(ByteUnicode.toChar(b).toString),
        s"vocab at $path is missing byte symbol ${b} ('${ByteUnicode.toChar(b)}') — " +
          "not a byte-level vocab (build it with BpeTrainer.buildByteVocab)")
      b += 1
    }
    new ByteLevelVocab(m, toks.toArray(new Array[String](toks.size())))
  }

  /** Encode one normal (special-free) span into `out`. */
  private def encodeSpan(bpe: BpeVocab, v: ByteLevelVocab, vocabPath: String,
      span: String, out: java.util.ArrayList[Integer]): Unit = {
    val m = ByteUnicode.Pretoken.matcher(span)
    while (m.find()) {
      val segs = bpe.segmentWord(ByteUnicode.mapBytes(m.group()))
      var i = 0
      while (i < segs.length) {
        val id = v.ids.get(segs(i))
        require(id != null,
          s"byte-level segment '${segs(i)}' missing from vocab at $vocabPath — " +
            "merges and vocab were not built together")
        out.add(id)
        i += 1
      }
    }
  }

  /** Codegen / eval entry: text → byte-level token ids. Total over any
    * input: every pretoken maps to alphabet chars, every surviving
    * segment is a base char or a merge product — both in any
    * consistently-built vocab; a miss means the (merges, vocab) pair
    * drifted apart, which is artifact corruption → loud failure, never
    * a silent `<unk>`. `specialsKey` (possibly empty) declares
    * protected special tokens ([[graft.functions.SpecialTokensImpl]]):
    * matching spans emit their single fixed vocab id and are never
    * merged across. Byte-level special spellings must sit inside the
    * printable byte alphabet (ASCII `<|endoftext|>`-class spellings
    * do), because the vocab loader unmaps every non-control line —
    * such a spelling unmaps to itself, so decode reproduces it. */
  def encode(mergesPath: String, vocabPath: String, specialsKey: String,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bpe = BpeRegistry.get(mergesPath)
    val v = get(vocabPath)
    val s = text.toString
    val out = new java.util.ArrayList[Integer](32)
    val spellings =
      if (specialsKey.isEmpty) null else SpecialTokensImpl.parse(specialsKey)
    if (spellings == null || spellings.isEmpty) {
      encodeSpan(bpe, v, vocabPath, s, out)
    } else {
      var pos = 0
      while (pos < s.length) {
        val hit = SpecialTokensImpl.findNext(s, pos, spellings)
        if (hit < 0) {
          encodeSpan(bpe, v, vocabPath, s.substring(pos), out)
          pos = s.length
        } else {
          val start = (hit >> 32).toInt
          val spelling = spellings((hit & 0xFFFFFFFFL).toInt)
          if (start > pos) encodeSpan(bpe, v, vocabPath, s.substring(pos, start), out)
          val id = v.ids.get(spelling)
          require(id != null,
            s"special token '$spelling' missing from vocab at $vocabPath — " +
              "append it to the vocab (fixed id = its line) before encoding with it")
          out.add(id)
          pos = start + spelling.length
        }
      }
    }
    val ids = new Array[Int](out.size)
    var i = 0
    while (i < ids.length) { ids(i) = out.get(i).intValue(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ids)
  }

  def encode(mergesPath: String, vocabPath: String,
      text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    encode(mergesPath, vocabPath, "", text)

  /** Codegen / eval entry: byte-level token count of `text` — exactly
    * `size(encode(text))` (every segment is one id; byte-level has no
    * multi-id fallback), without building the array. Shares the
    * segmentation memo with encode. */
  def count(mergesPath: String, text: UTF8String): Int = {
    val bpe = BpeRegistry.get(mergesPath)
    var n = 0
    val m = ByteUnicode.Pretoken.matcher(text.toString)
    while (m.find()) n += bpe.countWord(ByteUnicode.mapBytes(m.group()))
    n
  }

  /** Codegen / eval entry: ids → text, byte-exact inverse of
    * [[encode]]. Control ids: `<eos>` renders nothing (document
    * structure rides the packed export's boundaries column), `<unk>`
    * renders U+FFFD (it cannot appear in this registry's own output but
    * may in hand-made id streams). */
  def decode(vocabPath: String,
      ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val v = get(vocabPath)
    val n = ids.numElements()
    val buf = new java.io.ByteArrayOutputStream(n * 4)
    var i = 0
    while (i < n) {
      require(!ids.isNullAt(i), s"graft_bpe_byte_decode: null id at position $i")
      val id = ids.getInt(i)
      require(id >= 0 && id < v.tokens.length,
        s"graft_bpe_byte_decode: id $id out of range for vocab of ${v.tokens.length}")
      val b = v.tokenBytes(id)
      if (b != null) buf.write(b, 0, b.length)
      else if (id != v.eosId) // <unk>
        buf.write("�".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    UTF8String.fromBytes(buf.toByteArray)
  }
}

/** `graft_bpe_byte_encode(string, 'merges-path', 'vocab-path'[,
  * 'specials']) -> array<int>`: GPT-2-style byte-level token ids.
  * Total AND lossless over any input (whitespace rides the `Ġ`-class
  * symbols, not per-byte fallback ids); `graft_bpe_byte_decode`
  * inverts it byte-for-byte. `specials` (comma-separated in SQL, a Seq
  * in the Column API) declares protected special tokens
  * ([[SpecialTokensImpl]]) — the published GPT-2 artifact's own
  * `<|endoftext|>` is exactly this contract (one fixed id, never
  * merged across, decodes to its spelling). */
case class BpeByteEncode(child: Expression, mergesPath: String,
    vocabPath: String, specials: Seq[String] = Nil) extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_byte_encode needs a merges path")
  require(vocabPath.nonEmpty, "graft_bpe_byte_encode needs a vocab path")
  private val specialsKey = SpecialTokensImpl.join(specials)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_byte_encode expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_byte_encode"

  override protected def nullSafeEval(t: Any): Any =
    BpeByteVocabRegistry.encode(mergesPath, vocabPath, specialsKey,
      t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeByteMergesPath", mergesPath, "java.lang.String")
    val vRef = ctx.addReferenceObj("bpeByteVocabPath", vocabPath, "java.lang.String")
    val sRef = ctx.addReferenceObj("bpeByteSpecials", specialsKey, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeByteVocabRegistry.encode($mRef, $vRef, $sRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_bpe_byte_decode(array<int>, 'vocab-path') -> string`: ids
  * back to text, byte-exact (`decode(encode(x)) == x` for ANY x —
  * spec- and gate-pinned). */
case class BpeByteDecode(child: Expression, vocabPath: String)
    extends UnaryExpression {
  require(vocabPath.nonEmpty, "graft_bpe_byte_decode needs a vocab path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_byte_decode expects array<int>, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_byte_decode"

  override protected def nullSafeEval(ids: Any): Any =
    BpeByteVocabRegistry.decode(vocabPath,
      ids.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("bpeByteVocabPath", vocabPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeByteVocabRegistry.decode($vRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_bpe_byte_count(string, 'merges-path') -> int`: the byte-level
  * id count — the budget a context window consumes under this
  * tokenizer (`== size(graft_bpe_byte_encode)` by construction; no
  * vocab needed since every segment is exactly one id). */
case class BpeByteCount(child: Expression, mergesPath: String)
    extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_byte_count needs a merges path")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_byte_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_byte_count"

  override protected def nullSafeEval(t: Any): Any =
    BpeByteVocabRegistry.count(mergesPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeByteMergesPath", mergesPath, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeByteVocabRegistry.count($mRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_byte_unicode(string) -> string`: the byte→unicode bijection
  * over the input's UTF-8 bytes — the mapped form the byte-level merge
  * table operates on (`ByteUnicode.mapBytes` as a codegen'd column).
  * Injective and whitespace-free by construction. Exists so the
  * TRAINER's pretoken-count shuffle can carry mapped strings directly:
  * the groupBy keys are already merge-table symbols and the driver's
  * top-`maxWords` cut does zero per-word re-mapping. */
case class ByteUnicodeMap(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_byte_unicode expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_unicode"

  override protected def nullSafeEval(t: Any): Any =
    ByteUnicodeMapImpl.map(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteUnicodeMapImpl.map($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ByteUnicodeMapImpl {
  /** The UTF8String form of [[ByteUnicode.mapBytes]]: the input's bytes
    * ARE its UTF-8 encoding, so the map is one pass, no decode. */
  def map(t: UTF8String): UTF8String = {
    val bytes = t.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(ByteUnicode.toChar(bytes(i) & 0xFF))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Greedy BYTE-LEVEL budget chunking (`graft_bpe_byte_chunks`) — the
  * [[BpeChunksImpl]] contract under the byte-level tokenizer. Cuts at
  * PRETOKEN boundaries (the GPT-2 regex tiles the input, so cutting
  * between matches never splits a token) and each chunk's text is the
  * EXACT substring between its first and last pretoken — with
  * overlap 0 the chunks concatenate back to the input byte-for-byte,
  * the lossless property the byte-level family exists for (the
  * whitespace-token chunker rebuilds text with single-space joins).
  * A chunk's `chunk_bpe_tokens` equals `graft_bpe_byte_count` of its
  * own text: a pretoken-boundary-aligned substring re-pretokenizes to
  * the same tiling (the one context-sensitive branch, `\s+(?!\S)`,
  * only distinguishes trailing whitespace, and a cut turns a mid-doc
  * whitespace run into a trailing one — same single pretoken), so the
  * budget a chunk was sized under is exactly what encode emits for it.
  *
  * Same greedy semantics as the segment chunker: cut BEFORE the
  * pretoken that would exceed `budget`; a single over-budget pretoken
  * forms its own chunk (progress guaranteed, nothing dropped — filter
  * on `chunk_bpe_tokens` for hard caps); the next chunk starts
  * `overlap` pretokens back, clamped to always advance.
  * `chunk_tokens` counts PRETOKENS (the unit this chunker cuts in).
  * Scale shape: merge table loads once per executor JVM, per-pretoken
  * counts hit the Zipfian memo, chunk text is one substring copy. */
object BpeByteChunksImpl {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def compute(mergesPath: String, specialsKey: String, text: UTF8String,
      budget: Int, overlap: Int): ArrayData = {
    val bpe = BpeRegistry.get(mergesPath)
    val s = text.toString
    // pretoken tiling: char offsets + per-pretoken byte-level id count.
    // Declared special spellings (`<|endoftext|>`-class) are carved out
    // FIRST as ATOMIC pretokens of cost 1 — the same carve order as the
    // encode path (SpecialTokensImpl.findNext over the same spans), so
    // a chunk cut can never land mid-spelling (a split spelling would
    // re-encode as ordinary text, silently breaking the never-split /
    // fixed-id contract) and the budget counts the special as the ONE
    // fixed id encode actually emits for it.
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var counts = new Array[Int](cap)
    var n = 0
    def addTok(st: Int, en: Int, cnt: Int): Unit = {
      if (n == cap) {
        cap *= 2
        starts = java.util.Arrays.copyOf(starts, cap)
        ends = java.util.Arrays.copyOf(ends, cap)
        counts = java.util.Arrays.copyOf(counts, cap)
      }
      starts(n) = st; ends(n) = en; counts(n) = cnt; n += 1
    }
    // pretokenize one special-free span, offsets shifted to `s` space
    // (substring-per-span, matching the encode path's segmentation
    // exactly so chunk_bpe_tokens == size(graft_bpe_byte_encode(chunk)))
    def addSpan(from: Int, to: Int): Unit = {
      if (to > from) {
        val m = ByteUnicode.Pretoken.matcher(s.substring(from, to))
        while (m.find())
          addTok(from + m.start(), from + m.end(),
            bpe.countWord(ByteUnicode.mapBytes(m.group())))
      }
    }
    val spellings =
      if (specialsKey.isEmpty) null else SpecialTokensImpl.parse(specialsKey)
    if (spellings == null || spellings.isEmpty) addSpan(0, s.length)
    else {
      var pos = 0
      while (pos < s.length) {
        val hit = SpecialTokensImpl.findNext(s, pos, spellings)
        if (hit < 0) {
          addSpan(pos, s.length)
          pos = s.length
        } else {
          val start = (hit >> 32).toInt
          val spelling = spellings((hit & 0xFFFFFFFFL).toInt)
          addSpan(pos, start)
          addTok(start, start + spelling.length, 1)
          pos = start + spelling.length
        }
      }
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](8)
    var t0 = 0
    while (t0 < n) {
      var t1 = t0
      var sum = 0
      while (t1 < n && (t1 == t0 || sum + counts(t1) <= budget)) {
        sum += counts(t1); t1 += 1
      }
      // pretokens tile, so the chunk is one contiguous substring
      out.add(InternalRow(
        UTF8String.fromString(s.substring(starts(t0), ends(t1 - 1))),
        t1 - t0, sum))
      t0 = if (t1 >= n) n else math.max(t1 - overlap, t0 + 1)
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_bpe_byte_chunks(string, 'merges-path', budget, overlap[,
  * specials]) -> array<struct<chunk_text string, chunk_tokens int,
  * chunk_bpe_tokens int>>` — budget and `chunk_bpe_tokens` in
  * BYTE-LEVEL token ids (`graft_bpe_byte_count` units); `chunk_tokens`
  * counts pretokens. With overlap 0 the chunk texts concatenate back
  * to the input. `specials` declares protected spellings
  * ([[SpecialTokensImpl]]): each occurrence is an atomic pretoken of
  * budget cost 1 (its single fixed id), never cut through. */
case class BpeByteChunks(child: Expression, mergesPath: String,
    budget: Int, overlap: Int,
    specials: Seq[String] = Nil) extends UnaryExpression {
  require(mergesPath.nonEmpty, "graft_bpe_byte_chunks needs a merges path")
  require(budget > 0, s"budget must be positive, got $budget")
  require(overlap >= 0, s"overlap must be non-negative, got $overlap")
  private val specialsKey = SpecialTokensImpl.join(specials)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_byte_chunks expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("chunk_tokens", IntegerType, nullable = false),
    StructField("chunk_bpe_tokens", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_bpe_byte_chunks"

  override protected def nullSafeEval(t: Any): Any =
    BpeByteChunksImpl.compute(mergesPath, specialsKey, t.asInstanceOf[UTF8String],
      budget, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeByteMergesPath", mergesPath, "java.lang.String")
    val sRef = ctx.addReferenceObj("bpeByteChunkSpecials", specialsKey, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeByteChunksImpl.compute($mRef, $sRef, $c, $budget, $overlap)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** PRETOKEN count under the GPT-2 pretokenizer with declared specials
  * atomic — the exact unit [[BpeByteChunks]]' `chunk_tokens` counts, so
  * a post-transform recount (the Curator's FIM stage rewrites chunk
  * text after byte-budget chunking) keeps the column's counting
  * definition instead of silently switching to whitespace tokens
  * (advice finding). No merge table involved: specials carve first
  * (cost 1 each, the chunker's carve order), the special-free spans
  * count `ByteUnicode.Pretoken` matches. */
object PretokenCountImpl {
  def compute(specialsKey: String, text: UTF8String): Int = {
    val s = text.toString
    var n = 0
    def countSpan(from: Int, to: Int): Unit =
      if (to > from) {
        val m = ByteUnicode.Pretoken.matcher(s.substring(from, to))
        while (m.find()) n += 1
      }
    val spellings =
      if (specialsKey.isEmpty) null else SpecialTokensImpl.parse(specialsKey)
    if (spellings == null || spellings.isEmpty) countSpan(0, s.length)
    else {
      var pos = 0
      while (pos < s.length) {
        val hit = SpecialTokensImpl.findNext(s, pos, spellings)
        if (hit < 0) {
          countSpan(pos, s.length)
          pos = s.length
        } else {
          val start = (hit >> 32).toInt
          val spelling = spellings((hit & 0xFFFFFFFFL).toInt)
          countSpan(pos, start)
          n += 1
          pos = start + spelling.length
        }
      }
    }
    n
  }
}

/** `graft_pretoken_count(string[, specials]) -> int` — see
  * [[PretokenCountImpl]]. */
case class PretokenCount(child: Expression, specials: Seq[String] = Nil)
    extends UnaryExpression {
  private val specialsKey = SpecialTokensImpl.join(specials)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pretoken_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pretoken_count"

  override protected def nullSafeEval(t: Any): Any =
    PretokenCountImpl.compute(specialsKey, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("pretokenCountSpecials", specialsKey, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PretokenCountImpl.compute($sRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
