package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass within-document repetition score (`graft_repetition`): the
  * native form of `TextAnalysis.repetitionScore`'s HOF program —
  * `1 − distinct/total` over word n-grams of the lowercased
  * whitespace-token stream, 0.0 when fewer than n tokens.
  *
  * The HOF pipeline materializes a token array, builds every n-gram as
  * a joined String, and runs `array_distinct` over them — one String
  * allocation per gram per document. This expression finds token byte
  * boundaries in a single scan (the SimHashImpl tokenizer contract:
  * `lower()`-equivalent UTF8String.toLowerCase + ASCII `\s`), then
  * counts distinct n-grams with an open-addressing table whose
  * collisions verify by EXACT byte comparison of the token sequence —
  * so the result is bit-identical to the HOF/SQL form (a space-joined
  * gram equals another iff the token sequences match; tokens contain
  * no spaces, so the join is injective). Same double arithmetic at the
  * end → the q64 oracle pins both forms hash-exactly (the q41
  * pattern). */
object RepetitionImpl {

  def compute(text: UTF8String, n: Int): Double = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    // token boundary scan (ASCII \s+, as in ChunksImpl/SimHashImpl)
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var nTok = 0
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        if (nTok == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(nTok) = tokStart; ends(nTok) = i; nTok += 1
        tokStart = -1
      }
      i += 1
    }
    val total = nTok - n + 1
    if (total <= 0) return 0.0
    // per-token hashes once, gram hash = mix over n token hashes
    val tokHash = new Array[Long](nTok)
    i = 0
    while (i < nTok) {
      tokHash(i) = SimHashImpl.tokenHash(
        UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i)))
      i += 1
    }
    // open-addressing table of gram START indices; equality = exact
    // token-sequence byte comparison, so hash collisions cannot
    // inflate or deflate the distinct count
    var tcap = Integer.highestOneBit(math.max(4, total * 2) - 1) << 1
    if (tcap < 4) tcap = 4
    val table = new Array[Int](tcap)
    java.util.Arrays.fill(table, -1)
    val mask = tcap - 1

    def gramsEqual(a: Int, b: Int): Boolean = {
      var k = 0
      while (k < n) {
        val la = ends(a + k) - starts(a + k)
        if (la != ends(b + k) - starts(b + k)) return false
        var p = 0
        val sa = starts(a + k); val sb = starts(b + k)
        while (p < la) {
          if (bytes(sa + p) != bytes(sb + p)) return false
          p += 1
        }
        k += 1
      }
      true
    }

    var distinct = 0
    var g = 0
    while (g < total) {
      var h = 0L
      var k = 0
      while (k < n) { h = h * 0x9E3779B97F4A7C15L + tokHash(g + k); k += 1 }
      var slot = (h ^ (h >>> 32)).toInt & mask
      var placed = false
      while (!placed) {
        val occ = table(slot)
        if (occ < 0) { table(slot) = g; distinct += 1; placed = true }
        else if (gramsEqual(occ, g)) placed = true // duplicate
        else slot = (slot + 1) & mask
      }
      g += 1
    }
    1.0 - distinct.toDouble / total
  }
}

/** Distinct word-n-gram hashes of a document (`graft_gram_hashes`):
  * one-pass tokenize (same lowercase + ASCII `\s` contract as
  * [[RepetitionImpl]]) → per-token xxhash64 → rolling gram mix →
  * DISTINCT 64-bit hashes, deduplicated in the same open-addressing
  * table. No gram String is ever built — this is the scale form of
  * `Dedup.shingles` for hash-based consumers (decontamination), where
  * the HOF slice+concat construction dominates the cost (measured:
  * the string-gram decontamination probe spends ~75 s of its 77 s
  * building grams on 5M docs). Shorter-than-n documents emit one gram
  * over the tokens that exist, mirroring `shingles`. */
object GramHashesImpl {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var nTok = 0
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        if (nTok == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(nTok) = tokStart; ends(nTok) = i; nTok += 1
        tokStart = -1
      }
      i += 1
    }
    if (nTok == 0) return new GenericArrayData(Array.empty[Any])
    val tokHash = new Array[Long](nTok)
    i = 0
    while (i < nTok) {
      tokHash(i) = SimHashImpl.tokenHash(
        UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i)))
      i += 1
    }
    val g = math.min(n, nTok) // short doc → one gram over what exists
    val total = nTok - g + 1
    var tcap = Integer.highestOneBit(math.max(4, total * 2) - 1) << 1
    if (tcap < 4) tcap = 4
    val table = new Array[Long](tcap)
    val used = new Array[Boolean](tcap)
    val mask = tcap - 1
    val out = new Array[Long](total)
    var distinct = 0
    var s = 0
    while (s < total) {
      var h = 0L
      var k = 0
      while (k < g) { h = h * 0x9E3779B97F4A7C15L + tokHash(s + k); k += 1 }
      var slot = (h ^ (h >>> 32)).toInt & mask
      var placed = false
      while (!placed) {
        if (!used(slot)) {
          used(slot) = true; table(slot) = h
          out(distinct) = h; distinct += 1; placed = true
        } else if (table(slot) == h) placed = true // hash-level duplicate
        else slot = (slot + 1) & mask
      }
      s += 1
    }
    val vals = new Array[Any](distinct)
    i = 0
    while (i < distinct) { vals(i) = out(i); i += 1 }
    new GenericArrayData(vals)
  }
}

/** Per-OFFSET span hashes (`graft_span_hashes`): the i-th element is a
  * 64-bit polynomial hash of the n-token span starting at whitespace
  * token i — ALL offsets in order, duplicates included, case PRESERVED
  * (unlike [[GramHashesImpl]], which lowercases and deduplicates for
  * signature semantics; span REMOVAL must key on the exact text it
  * will cut). A true rolling update (subtract `tokHash(s)·K^(n-1)`,
  * multiply by K, add the entering token — exact in mod-2^64 Long
  * arithmetic) makes this O(tokens), not O(tokens·n). Documents
  * shorter than n tokens have no n-token span → empty array.
  * Hash-equality stands in for sequence-equality at ~2^-64 collision
  * odds per pair. */
object SpanHashesImpl {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val K = 0x9E3779B97F4A7C15L

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var nTok = 0
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        if (nTok == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(nTok) = tokStart; ends(nTok) = i; nTok += 1
        tokStart = -1
      }
      i += 1
    }
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val tokHash = new Array[Long](nTok)
    i = 0
    while (i < nTok) {
      tokHash(i) = SimHashImpl.tokenHash(
        UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i)))
      i += 1
    }
    // K^(n-1): the weight the leaving token carries in the window hash
    var kPow = 1L
    i = 1
    while (i < n) { kPow *= K; i += 1 }
    val total = nTok - n + 1
    val out = new Array[Any](total)
    var h = 0L
    i = 0
    while (i < n) { h = h * K + tokHash(i); i += 1 }
    out(0) = h
    var s = 1
    while (s < total) {
      h = (h - tokHash(s - 1) * kPow) * K + tokHash(s + n - 1)
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_span_hashes(string, n) -> array<bigint>` (per offset, in order) */
case class SpanHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"span size must be >= 2, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_span_hashes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"

  override protected def nullSafeEval(t: Any): Any =
    SpanHashesImpl.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHashesImpl.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_gram_hashes(string, n) -> array<bigint>` (distinct) */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_gram_hashes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(t: Any): Any =
    GramHashesImpl.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHashesImpl.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_repetition(string, n) -> double` */
case class Repetition(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"repetition n-gram size must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_repetition expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_repetition"

  override protected def nullSafeEval(t: Any): Any =
    RepetitionImpl.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionImpl.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
