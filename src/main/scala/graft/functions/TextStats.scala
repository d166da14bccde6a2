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
  *          hits_en int, hits_de int, hits_fr int, hits_es int,
  *          cjk int>
  *
  * The composable column formulation (`TextAnalysis.qualityScore` +
  * `langId` + `wsTokenCount`) re-derives the token array per metric and
  * runs four `array_intersect`s through interpreted lambdas — measured
  * ~8 µs/doc on the 5M-doc scale probe. This expression tokenizes the
  * lowercased UTF-8 bytes once, classifies bytes inline, and checks
  * stopword membership against precomputed hash sets. Character
  * classes: ASCII alnum = word chars; ASCII \s = space; other ASCII =
  * punctuation; multi-byte chars = word chars (letters), with CJK
  * (U+4E00–U+9FFF) additionally counted for language ID.
  */
object TextStatsImpl {

  val Langs: Seq[String] = Seq("en", "de", "fr", "es")

  /** token-hash sets per profile (xxhash64 of the stopword bytes) —
    * membership by hash, collision odds negligible for 10-word sets. */
  private val profileHashes: Array[Array[Long]] =
    Langs.map(l => graft.llm.TextAnalysis.StopwordProfiles(l)
      .map(w => SimHashImpl.tokenHash(UTF8String.fromString(w))).toArray.sorted).toArray

  private def inProfile(p: Array[Long], h: Long): Boolean =
    java.util.Arrays.binarySearch(p, h) >= 0

  /** One pass: returns the 8 counters. */
  def compute(text: UTF8String): Array[Int] = {
    val out = new Array[Int](9) // tokens, nonspace, punct, en, de, fr, es, cjk, bytes
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    var tokStart = -1
    var i = 0
    while (i < len) {
      val b = bytes(i)
      val isSpace = b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D
      if (!isSpace) {
        out(1) += 1
        if (b >= 0) {
          // ASCII: alnum is word-like, the rest is punctuation
          val alnum = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
          if (!alnum) out(2) += 1
        } else if ((b & 0xF0) == 0xE0 && i + 2 < len) {
          // 3-byte char: decode for the CJK range check
          val cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
          if (cp >= 0x4E00 && cp <= 0x9FFF) out(7) += 1
        }
        if (tokStart < 0) tokStart = i
      } else if (tokStart >= 0) {
        endToken(bytes, tokStart, i, out)
        tokStart = -1
      }
      i += 1
    }
    if (tokStart >= 0) endToken(bytes, tokStart, len, out)
    out(8) = len
    out
  }

  private def endToken(bytes: Array[Byte], start: Int, end: Int, out: Array[Int]): Unit = {
    out(0) += 1
    val h = SimHashImpl.tokenHash(UTF8String.fromBytes(bytes, start, end - start))
    var l = 0
    while (l < 4) {
      if (inProfile(profileHashes(l), h)) out(3 + l) += 1
      l += 1
    }
  }

  /** Row form for eval + generated code (generated code is Java — it
    * calls this static method and assigns the InternalRow). */
  def computeRow(text: UTF8String): InternalRow = {
    val c = compute(text)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](c(0), c(1), c(2), c(3), c(4), c(5), c(6), c(7), c(8)))
  }
}

/** `graft_textstats(string) -> struct<...>` (see TextStatsImpl). */
case class TextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_textstats expects string, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_nonspace", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("hits_en", IntegerType, nullable = false),
    StructField("hits_de", IntegerType, nullable = false),
    StructField("hits_fr", IntegerType, nullable = false),
    StructField("hits_es", IntegerType, nullable = false),
    StructField("cjk", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_textstats"

  override protected def nullSafeEval(t: Any): Any =
    TextStatsImpl.computeRow(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsImpl.computeRow($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
