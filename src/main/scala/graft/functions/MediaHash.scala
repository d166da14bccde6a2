package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `graft_media_hash(binary, 'image' | 'image-dct' | 'audio') -> long`:
  * the modality perceptual fingerprint as a COLUMN — decode + hash in
  * one executor-side call ([[graft.llm.Multimodal.dHash64]] over
  * javax.imageio for images, [[graft.llm.Multimodal.pHash64]] for the
  * DCT kernel, [[graft.llm.Multimodal.audioHash64]] over
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

  /** The DCT (pHash) image kernel — modality `image-dct`: the arrival
    * column for a MediaDedup `image-hash = dct` lineage (dHash and
    * pHash signatures are NOT comparable; the state fingerprint line
    * keeps them apart, and so must this column's modality). */
  def imageDct(content: Array[Byte]): Long =
    graft.llm.Multimodal.pHash64(
      graft.llm.Multimodal.ImageIoDecoder.decode(content, Map.empty))

  def audio(content: Array[Byte]): Long =
    graft.llm.Multimodal.audioHash64(
      graft.llm.Multimodal.WavDecoder.decode(content, Map.empty))

  /** First-`k`-frame dHashes of an AVI clip, index-ordered — the
    * BOUNDED video fingerprint column (one clip is many hashes, so the
    * video form is an array, never a scalar): frame i's hash sits at
    * array slot i, which is what lets the streaming arrival filter
    * band each slot against the persisted per-frame state at the SAME
    * frame index (the batch tier's frame-aligned contract). Clips
    * shorter than k emit their actual frame count. */
  def videoFrames(content: Array[Byte], k: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val avi = graft.llm.Multimodal.Avi.parse(content)
    val n = math.min(k, avi.frames.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = graft.llm.Multimodal.dHash64(avi.decodeFrame(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class MediaHash(child: Expression, modality: String)
    extends UnaryExpression {
  require(modality == "image" || modality == "image-dct" || modality == "audio",
    s"graft_media_hash modality must be image | image-dct | audio (video " +
      s"is a frame-exploding path, not a scalar), got '$modality'")
  private def implMethod: String = modality match {
    case "image-dct" => "imageDct"
    case m => m
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_media_hash expects binary, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_media_hash"

  override protected def nullSafeEval(content: Any): Any = {
    val bytes = content.asInstanceOf[Array[Byte]]
    modality match {
      case "image" => MediaHashImpl.image(bytes)
      case "image-dct" => MediaHashImpl.imageDct(bytes)
      case _ => MediaHashImpl.audio(bytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaHashImpl.${implMethod}($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_media_video_hash(binary, k) -> array<long>`: dHashes of a
  * clip's first `k` frames, slot i = frame i ([[MediaHashImpl
  * .videoFrames]]) — decode + hash in one column call, so the video
  * modality composes with the streaming arrival filter
  * (`Streams.dropNearSeenVideoStream` bands each slot against the
  * persisted frame-sig state) and ad-hoc SQL, without the
  * frame-exploding mapPartitions pass. Bounded by construction: an
  * arrival decision needs the clip's HEAD, not every frame. */
case class MediaVideoHash(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"graft_media_video_hash needs k > 0 frames, got $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_media_video_hash expects binary, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_media_video_hash"

  override protected def nullSafeEval(content: Any): Any =
    MediaHashImpl.videoFrames(content.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaHashImpl.videoFrames($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
