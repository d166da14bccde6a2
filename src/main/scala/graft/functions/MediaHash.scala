package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `graft_media_hash(binary, 'image' | 'audio') -> long`: the
  * modality perceptual fingerprint as a COLUMN — decode + hash in one
  * executor-side call ([[graft.llm.Multimodal.dHash64]] over
  * javax.imageio for images, [[graft.llm.Multimodal.audioHash64]] over
  * javax.sound for audio), so fingerprints compose with every
  * column-level surface: the streaming arrival filter
  * (`Streams.dropNearSeenMediaStream` bands this column against
  * persisted state), ad-hoc SQL over media tables, and any projection
  * that wants the hash without the batched mapPartitions pass.
  * Video stays on the frame-exploding mapPartitions path
  * ([[graft.llm.Multimodal.videoFrameHashes]]) — one clip is many
  * hashes, not a scalar.
  *
  * Same determinism contract as the batch hashers: same bytes, same
  * hash, any row order. Decode failures propagate loudly (corrupt
  * assets must be quarantined upstream, never silently hashed). */
object MediaHashImpl {
  def image(content: Array[Byte]): Long =
    graft.llm.Multimodal.dHash64(
      graft.llm.Multimodal.ImageIoDecoder.decode(content, Map.empty))

  def audio(content: Array[Byte]): Long =
    graft.llm.Multimodal.audioHash64(
      graft.llm.Multimodal.WavDecoder.decode(content, Map.empty))
}

case class MediaHash(child: Expression, modality: String)
    extends UnaryExpression {
  require(modality == "image" || modality == "audio",
    s"graft_media_hash modality must be image | audio (video is a " +
      s"frame-exploding path, not a scalar), got '$modality'")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_media_hash expects binary, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_media_hash"

  override protected def nullSafeEval(content: Any): Any = {
    val bytes = content.asInstanceOf[Array[Byte]]
    if (modality == "image") MediaHashImpl.image(bytes)
    else MediaHashImpl.audio(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaHashImpl.${modality}($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
