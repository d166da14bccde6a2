package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (`graft_nfc`): canonical composition —
  * combining sequences collapse to their precomposed forms (e +
  * U+0301 → é), singleton canonical duplicates fold together, and
  * already-NFC text round-trips unchanged. The normalization stage
  * every cross-source corpus needs BEFORE hashing: the same visible
  * string in composed and decomposed form would otherwise carry two
  * content hashes, two SimHashes, and two BPE segmentations.
  *
  * Canonical (NFC), not compatibility (NFKC) — ligatures, fullwidth
  * forms, and superscripts are real content distinctions a corpus
  * pipeline should not silently erase. The fast path is free:
  * `Normalizer.isNormalized` is a table-driven scan, and real-world
  * text is overwhelmingly already NFC, so the common case never
  * allocates. DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm, which is what makes the q106 oracle exact. */
object NfcImpl {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `graft_nfc(string) -> string` */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $t")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcImpl.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcImpl.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
