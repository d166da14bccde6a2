package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit sign-random-projection signature (`graft_srp`): the VECTOR
  * analog of SimHash. Bit i of the signature is the sign of `v · r_i`
  * for 64 pseudo-random Rademacher (±1) directions derived from
  * `xxhash64(coordinate_index, seed)` — one pass over the vector, 64
  * running sums, no direction matrix materialized anywhere.
  *
  * By the hyperplane-LSH bound, `P[bit differs] = angle(a,b)/π`, so two
  * vectors at cosine c disagree on an expected `64·acos(c)/π` bits:
  * near-duplicates (c ≥ 0.99) land within a few bits while unrelated
  * vectors (c ≈ 0) sit near 32. That makes 16-bit banded joins on these
  * signatures collision-free for unrelated pairs (~2^-16 per band,
  * independent of how densely the corpus clusters) — the scale-safe
  * alternative to distance-bucketed LSH, whose bucket occupancy (and
  * join cost) tracks data density. Signatures are deterministic given
  * (vector, seed): persistable as incremental dedup state, comparable
  * across runs and engines that reproduce xxhash64. */
object SrpImpl {
  def compute(v: ArrayData, isFloat: Boolean, seed: Long): Long = {
    val votes = new Array[Double](64)
    val n = v.numElements()
    var j = 0
    while (j < n) {
      val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
      // one xxhash64 per coordinate yields that coordinate's 64 signs
      val bits = XxHash64Function.hash(j.toLong, LongType, seed)
      var i = 0
      while (i < 64) {
        if (((bits >>> i) & 1L) == 1L) votes(i) += x else votes(i) -= x
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** `graft_srp(array<float|double>[, seed]) -> bigint` */
case class Srp64(child: Expression, seed: Long = 4233L) extends UnaryExpression {
  private def elemFloat(t: DataType): Option[Boolean] = t match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }
  override def checkInputDataTypes(): TypeCheckResult = elemFloat(child.dataType) match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"graft_srp expects an array<float|double>, got ${child.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp"

  private lazy val isFloat = elemFloat(child.dataType).get

  override protected def nullSafeEval(v: Any): Any =
    SrpImpl.compute(v.asInstanceOf[ArrayData], isFloat, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SrpImpl.compute($c, $isFloat, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
