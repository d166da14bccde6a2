package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass context-window chunking (`graft_chunks`): the native form
  * of `CorpusPrep.chunkByTokens`'s HOF program. The HOF pipeline
  * materializes a token ARRAY per document (one String allocation per
  * token), then slices + re-joins it once per chunk; this expression
  * finds token byte-boundaries in a single scan and builds each chunk
  * text by copying byte ranges — no token objects at all. Bit-parity
  * with the HOF form (same ASCII `\s+` split semantics, same
  * single-space join, same window arithmetic) is spec-pinned, and the
  * shared q26 DuckDB oracle verifies the native path hash-exactly.
  */
object ChunksImpl {

  /** `array<struct<chunk_text string, chunk_tokens int>>` for one doc.
    * Chunk `i` covers whitespace tokens `[i·step, i·step + chunkSize)`,
    * `step = chunkSize − overlap`; the last chunk is the first whose
    * window reaches the end. Zero tokens → empty array. */
  def compute(text: UTF8String, chunkSize: Int, overlap: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token boundary scan (ASCII \s+, identical to split("\\s+") after
    // trim + empty-filter in the HOF reference)
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
    val step = chunkSize - overlap
    val nChunks =
      if (n <= chunkSize) 1
      else math.ceil((n - chunkSize).toDouble / step).toInt + 1
    val rows = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val t0 = c * step
      val t1 = math.min(t0 + chunkSize, n)
      var outLen = t1 - t0 - 1 // single spaces between tokens
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
      rows(c) = InternalRow(UTF8String.fromBytes(buf), t1 - t0)
      c += 1
    }
    new GenericArrayData(rows)
  }
}

/** `graft_chunks(string, chunkSize, overlap) ->
  * array<struct<chunk_text string, chunk_tokens int>>` */
case class DocChunks(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression {
  require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
  require(overlap >= 0 && overlap < chunkSize,
    s"overlap must be in [0, chunkSize), got $overlap")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_chunks expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("chunk_tokens", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_chunks"

  override protected def nullSafeEval(t: Any): Any =
    ChunksImpl.compute(t.asInstanceOf[UTF8String], chunkSize, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ChunksImpl.compute($c, $chunkSize, $overlap)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
