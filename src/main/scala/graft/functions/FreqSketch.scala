package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters sketch (Misra–Gries summaries): estimated
  * counts of the most frequent string values in one pass with a hard
  * `k`-entry memory bound — "what are the dominant tokens / sources /
  * event types in 100 TB" without a full GROUP BY of the long tail.
  *
  * Guarantees (classic MG): every estimate UNDERcounts by at most
  * `n/(k+1)` (n = total rows fed in), so any value with true count
  * > n/(k+1) is guaranteed present. With fewer than `k` distinct values
  * no decrement ever fires and every count is EXACT — which is what
  * makes the sketch oracle-checkable against a plain GROUP BY (q46).
  *
  * At 100 TB: a standard partial/final aggregate — every executor
  * summarizes its partitions into ≤ k counters, the exchange carries
  * one ≤ k-entry sketch per partition, merges are associative
  * (union-sum then trim to the (k+1)-th largest count, the standard MG
  * merge that preserves the error bound). Compare Spark's built-in
  * `freqItems` (no counts, not exposed as a mergeable aggregate).
  */
object FreqSketchImpl {

  /** Boxed mutable count — HashMap values update in place. */
  final class Ctr(var v: Long)

  /** Misra–Gries buffer over UTF8String keys. Keys arriving from
    * `eval` may point into reused row buffers — they are `clone()`d
    * before being retained (lookup probes need no copy). */
  final class MG(val k: Int) {
    val counts = new java.util.HashMap[UTF8String, Ctr](k * 2)

    def add(s: UTF8String, w: Long): Unit = {
      val cur = counts.get(s)
      if (cur != null) cur.v += w
      else if (counts.size < k) counts.put(s.clone(), new Ctr(w))
      else {
        // decrement-all by the arriving weight, capped at the smallest
        // survivor (decrementing by min(w, minCount) keeps the bound;
        // simple w-decrement could overshoot for weighted adds)
        var dec = w
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val c = it0.next(); if (c.v < dec) dec = c.v }
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue.v -= dec
          if (e.getValue.v <= 0) it.remove()
        }
        val rem = w - dec
        if (rem > 0) add(s, rem) // room freed (or decrement repeats)
      }
    }

    /** Standard MG merge: union-sum, then if over k entries subtract
      * the (k+1)-th largest count from all and drop the non-positive. */
    def mergeWith(other: MG): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        if (cur != null) cur.v += e.getValue.v
        else counts.put(e.getKey.clone(), new Ctr(e.getValue.v))
      }
      if (counts.size > k) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val vi = counts.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next().v; i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - k - 1) // (k+1)-th largest
        val ei = counts.entrySet().iterator()
        while (ei.hasNext) {
          val e = ei.next()
          e.getValue.v -= cut
          if (e.getValue.v <= 0) ei.remove()
        }
      }
    }

    /** Entries sorted by (count desc, item asc) — deterministic output
      * order, binary string order matching SQL VARCHAR collation. */
    def sortedEntries(): Array[(UTF8String, Long)] = {
      val arr = new Array[(UTF8String, Long)](counts.size)
      var i = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue.v); i += 1 }
      scala.util.Sorting.stableSort(arr,
        (a: (UTF8String, Long), b: (UTF8String, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0))
      arr
    }

    def serialize(): Array[Byte] = {
      var size = 4
      val it0 = counts.keySet().iterator()
      while (it0.hasNext) size += 4 + it0.next().numBytes() + 8
      val bb = ByteBuffer.allocate(size)
      bb.putInt(counts.size)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val bytes = e.getKey.getBytes
        bb.putInt(bytes.length); bb.put(bytes); bb.putLong(e.getValue.v)
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte], k: Int): MG = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new MG(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.counts.put(UTF8String.fromBytes(b), new Ctr(bb.getLong))
      i += 1
    }
    m
  }
}

/** `graft_freq_sketch(string, k) ->
  * array<struct<item string, count long>>` (count desc, item asc). */
case class FreqSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketchImpl.MG] {
  require(k > 0, s"graft_freq_sketch k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_freq_sketch expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): FreqSketchImpl.MG = new FreqSketchImpl.MG(k)

  override def update(buf: FreqSketchImpl.MG, input: InternalRow): FreqSketchImpl.MG = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(buf: FreqSketchImpl.MG, other: FreqSketchImpl.MG): FreqSketchImpl.MG = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: FreqSketchImpl.MG): Any = {
    val entries = buf.sortedEntries()
    val out = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      out(i) = InternalRow(entries(i)._1, entries(i)._2); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: FreqSketchImpl.MG): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): FreqSketchImpl.MG =
    FreqSketchImpl.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object FreqSketch {
  /** Column form: one-pass mergeable heavy-hitters aggregate. */
  def sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
