package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_might_contain(hash) -> boolean` over a BROADCAST bloom
  * filter — the scan-side pre-filter of incremental span dedup
  * ([[graft.llm.Dedup.removeDuplicateSpansAgainst]]).
  *
  * The bloom rides a `Broadcast`, NOT a binary literal in the plan:
  * a literal puts the whole bit array inside the expression tree, where
  * plan stringification/canonicalization during optimization copies it
  * repeatedly — a multi-MB filter inflated a routine curation plan to
  * heap exhaustion, and at corpus scale (a bloom over 10^10+ span
  * hashes is GBs) a plan-embedded filter is structurally wrong. The
  * broadcast ships once per executor over the torrent protocol, the
  * expression itself serializes as a small handle, and codegen reads
  * `bloom.value` straight from the broadcast cache.
  *
  * Semantics: `mightContainLong` under `putLong` hashing — probe with
  * the same longs the bloom was built from (`df.stat.bloomFilter` on a
  * LONG column). False positives pass the filter and are re-checked by
  * the exact state join downstream; false negatives are impossible, so
  * this expression must only ever GATE work, never decide results. */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects bigint (putLong hashing), got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$bc.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
