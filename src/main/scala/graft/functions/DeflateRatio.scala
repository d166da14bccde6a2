package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** zlib compressibility (`graft_deflate_ratio`): deflated size over raw
  * UTF-8 size — the repetitiveness signal several published corpus
  * quality suites carry (machine-generated boilerplate, keyword
  * stuffing, and template farms compress far better than prose; random
  * noise compresses worse). Natural English prose sits ~0.4–0.7;
  * heavily repeated templates fall under ~0.2; the ratio can exceed 1
  * on short or high-entropy text (deflate framing overhead), which is
  * fine — thresholds are one-sided.
  *
  * Deflate at the default level 6 with the zlib wrapper, one shot per
  * document into a scratch buffer (output is COUNTED, never kept — no
  * allocation proportional to the compressed text beyond the reused
  * 8 KiB scratch). Deterministic for a given input across JVMs: level-6
  * deflate is a pure function of the bytes in practice on the JDK's
  * bundled zlib, and the gate only thresholds it, never hashes it.
  * Empty text → 1.0 (nothing to judge). Cost is a single pass over the
  * document bytes — scan-speed, no shuffle, stream-safe. */
object DeflateRatioImpl {
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = scratch.get()
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}

/** `graft_deflate_ratio(string) -> double` */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_deflate_ratio expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(s: Any): Any =
    DeflateRatioImpl.ratio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatioImpl.ratio($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
