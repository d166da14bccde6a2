package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Rank-bucket lookup for ZOrder: the count of ascending `edges` ≤ value,
  * by binary search over an array shipped as a codegen reference object.
  *
  * Replaces ZOrder's original chained `when()` fold, which built
  * `2^bits − 1` nested expression nodes PER COLUMN (65,535 at the
  * accepted MaxBits=16 — Catalyst stack-overflow / Janino-limit
  * territory, and ~1,020 nodes per row already at the default bits=8
  * over 4 columns). This expression is O(1) plan nodes and O(log n)
  * work per row, stays inside whole-stage codegen, and makes every
  * value of `bits` up to MaxBits actually usable.
  */
object BucketCountImpl {
  /** `edges` must be ascending and duplicate-free (callers pass
    * `.distinct.sorted` percentile output). Returns #{e : e ≤ v}. */
  def count(edges: Array[Double], v: Double): Long = {
    val i = java.util.Arrays.binarySearch(edges, v)
    if (i >= 0) i + 1L else (-(i + 1)).toLong
  }
}

/** `graft_bucket_count(castable-to-double) -> bigint`; null → null (the
  * ZOrder wrapper coalesces nulls to bucket 0 so they cluster at the
  * curve's lowest corner). */
case class BucketCount(child: Expression, edges: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_count expects double, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bucket_count"

  override protected def nullSafeEval(v: Any): Any =
    BucketCountImpl.count(edges, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the edges array is a reference object on the generated class —
    // one instance per task, shared across rows, never re-parsed
    val edgesRef = ctx.addReferenceObj("edges", edges, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BucketCountImpl.count($edgesRef, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
