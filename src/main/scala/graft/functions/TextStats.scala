package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_textstats(text)` — every scalar the text-analysis suite needs,
  * in ONE byte pass over the document:
  *
  *   struct<n_tokens int, n_nonspace int, n_punct int,
  *          hits_en .. hits_ru int,    -- total stopword occurrences
  *          dhits_en .. dhits_ru int,  -- DISTINCT stopword hits
  *          cjk int, n_chars int,
  *          kana int, hangul int, cyr int, arab int,
  *          hebr int, grek int, deva int, thai int>  -- script tier
  *
  * The composable column formulation (`TextAnalysis.qualityScore` +
  * `langId` + `wsTokenCount`) re-derives the token array per metric and
  * runs one `array_intersect` per language profile through interpreted
  * lambdas — measured ~8 µs/doc on the 5M-doc scale probe. This
  * expression tokenizes the lowercased UTF-8 bytes once, classifies
  * bytes inline, and checks stopword membership against precomputed
  * hash sets.
  *
  * Semantics (matching the composable forms):
  *  - counters count decoded CHARACTERS, not bytes (UTF-8 continuation
  *    bytes are skipped), so `n_nonspace`/`n_chars` equal
  *    `length(regexp_replace(c,"\\s",""))`/`length(c)` on any corpus;
  *  - `hits_XX` are TOTAL stopword occurrences (what `stopwordRatio`
  *    computes), while `dhits_XX` are DISTINCT stopword hits (a bitmask
  *    per profile, one bit per stopword — the same vote `langId`
  *    computes via `array_distinct` + `array_intersect`);
  *  - ASCII alnum = word chars; ASCII \s = space; other ASCII =
  *    punctuation; multi-byte chars = word chars (so non-ASCII
  *    punctuation like "—" counts as a letter here but as punctuation
  *    in the regex-based composable `punctCount` — the one remaining
  *    documented divergence); CJK (U+4E00–U+9FFF) additionally counted
  *    for language ID.
  */
object TextStatsImpl {

  // derived from the profile map so a new profile automatically joins
  // the one-pass vote (and the struct schema) in the same sorted order
  // the composable vote uses
  val Langs: Seq[String] =
    graft.llm.TextAnalysis.StopwordProfiles.keys.toSeq.sorted
  private val NumLangs = Langs.length

  /** token-hash sets per profile (xxhash64 of the stopword bytes) —
    * membership by hash, collision odds negligible for 10-word sets.
    * Sorted so binarySearch gives both membership AND the stopword's
    * index within the profile (the distinct-hit bitmask bit). */
  private val profileHashes: Array[Array[Long]] =
    Langs.map(l => graft.llm.TextAnalysis.StopwordProfiles(l)
      .map(w => SimHashImpl.tokenHash(UTF8String.fromString(w))).toArray.sorted).toArray

  // layout of the counter array returned by compute
  private val IdxTokens = 0
  private val IdxNonspace = 1
  private val IdxPunct = 2
  private val IdxHits = 3 // .. IdxHits + NumLangs - 1 (total occurrences)
  private val IdxDHits = IdxHits + NumLangs // .. + NumLangs - 1 (distinct)
  private val IdxCjk = IdxDHits + NumLangs
  private val IdxChars = IdxCjk + 1
  // script counters (round 10 — the non-Latin script tier of langId):
  // appended AFTER the original layout so every existing getField
  // consumer keeps its offsets
  private val IdxKana = IdxChars + 1
  private val IdxHangul = IdxKana + 1
  private val IdxCyr = IdxHangul + 1
  private val IdxArab = IdxCyr + 1
  private val IdxHebr = IdxArab + 1
  private val IdxGrek = IdxHebr + 1
  private val IdxDeva = IdxGrek + 1
  private val IdxThai = IdxDeva + 1
  val NumCounters: Int = IdxThai + 1

  /** Script names in struct order (see the Idx constants above). */
  val Scripts: Seq[String] = Seq("kana", "hangul", "cyr", "arab", "hebr", "grek", "deva", "thai")

  /** One pass: returns the counters (layout above).
    *
    * Counting walks the ORIGINAL bytes — Unicode lowercasing can change
    * the character count (e.g. U+0130 'İ' lowercases to two code
    * points), so lowercasing the whole document first would break the
    * `n_chars == length()` parity. Only the per-token stopword hash
    * lowercases (its token slice), matching the composable forms'
    * `lower()` + tokenize. */
  def compute(text: UTF8String): Array[Int] = {
    val out = new Array[Int](NumCounters)
    val masks = new Array[Int](NumLangs) // distinct-hit bitmask per profile
    val bytes = text.getBytes
    val len = bytes.length
    var tokStart = -1
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if ((b & 0xC0) != 0x80) { // skip UTF-8 continuation bytes: count chars
        val isSpace = b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D
        out(IdxChars) += 1
        if (!isSpace) {
          out(IdxNonspace) += 1
          if (b >= 0) {
            // ASCII: alnum is word-like, the rest is punctuation
            val alnum = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
            if (!alnum) out(IdxPunct) += 1
          } else if ((b & 0xE0) == 0xC0 && i + 1 < len) {
            // 2-byte char: decode for the alphabetic-script counters
            val cp = ((b & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
            if (cp >= 0x0400 && cp <= 0x04FF) out(IdxCyr) += 1
            else if (cp >= 0x0600 && cp <= 0x06FF) out(IdxArab) += 1
            else if (cp >= 0x0590 && cp <= 0x05FF) out(IdxHebr) += 1
            else if (cp >= 0x0370 && cp <= 0x03FF) out(IdxGrek) += 1
          } else if ((b & 0xF0) == 0xE0 && i + 2 < len) {
            // 3-byte char: decode for the CJK/script range checks
            val cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
            if (cp >= 0x4E00 && cp <= 0x9FFF) out(IdxCjk) += 1
            else if (cp >= 0x3040 && cp <= 0x30FF) out(IdxKana) += 1
            else if ((cp >= 0xAC00 && cp <= 0xD7AF) || (cp >= 0x1100 && cp <= 0x11FF))
              out(IdxHangul) += 1
            else if (cp >= 0x0900 && cp <= 0x097F) out(IdxDeva) += 1
            else if (cp >= 0x0E00 && cp <= 0x0E7F) out(IdxThai) += 1
          }
          if (tokStart < 0) tokStart = i
        } else if (tokStart >= 0) {
          endToken(bytes, tokStart, i, out, masks)
          tokStart = -1
        }
      }
      i += 1
    }
    if (tokStart >= 0) endToken(bytes, tokStart, len, out, masks)
    var l = 0
    while (l < NumLangs) {
      out(IdxDHits + l) = java.lang.Integer.bitCount(masks(l))
      l += 1
    }
    out
  }

  private def endToken(
      bytes: Array[Byte], start: Int, end: Int, out: Array[Int], masks: Array[Int]): Unit = {
    out(IdxTokens) += 1
    // stopword membership is case-insensitive: lowercase the token slice
    // (ASCII-only slices lowercase without allocation inside UTF8String)
    val h = SimHashImpl.tokenHash(UTF8String.fromBytes(bytes, start, end - start).toLowerCase)
    var l = 0
    while (l < NumLangs) {
      val idx = java.util.Arrays.binarySearch(profileHashes(l), h)
      if (idx >= 0) { out(IdxHits + l) += 1; masks(l) |= 1 << idx }
      l += 1
    }
  }

  /** Row form for eval + generated code (generated code is Java — it
    * calls this static method and assigns the InternalRow). */
  def computeRow(text: UTF8String): InternalRow = {
    val c = compute(text)
    val vals = new Array[Any](NumCounters)
    var i = 0
    while (i < NumCounters) { vals(i) = c(i); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}

/** `graft_textstats(string) -> struct<...>` (see TextStatsImpl). */
/** `graft_cp_count(string) -> int` — Unicode code-point count (Java
  * `String.codePointCount` semantics: a surrogate pair is ONE). The
  * trainer-side piece-length filter needs the exact count on pieces
  * with astral chars; kept as a codegen'd expression so the repo's
  * "zero `udf()` in main" rule holds unqualified. */
object CodePointCountImpl {
  def compute(s: UTF8String): Int = {
    val str = s.toString
    str.codePointCount(0, str.length)
  }
}

case class CodePointCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_cp_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_cp_count"

  override protected def nullSafeEval(t: Any): Any =
    CodePointCountImpl.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodePointCountImpl.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class TextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_textstats expects string, got $t")
  }
  override def dataType: DataType = StructType(
    Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("n_nonspace", IntegerType, nullable = false),
      StructField("n_punct", IntegerType, nullable = false)) ++
    TextStatsImpl.Langs.map(l => StructField(s"hits_$l", IntegerType, nullable = false)) ++
    TextStatsImpl.Langs.map(l => StructField(s"dhits_$l", IntegerType, nullable = false)) ++
    Seq(
      StructField("cjk", IntegerType, nullable = false),
      StructField("n_chars", IntegerType, nullable = false)) ++
    TextStatsImpl.Scripts.map(s => StructField(s, IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_textstats"

  override protected def nullSafeEval(t: Any): Any =
    TextStatsImpl.computeRow(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsImpl.computeRow($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
