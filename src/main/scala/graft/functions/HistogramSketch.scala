package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable one-pass histogram sketch (t-digest-lite), the upgrade the
  * datadiff scaladoc promises: continuous drift detection without the
  * separate min/max edge pass and without re-scanning raw data to bin.
  *
  * Each partition folds its values into ≤ `maxCentroids` weighted
  * centroids (nearest-pair compression, the core t-digest idea without
  * the quantile-dependent size bound); partial sketches merge
  * associatively. One `TypedImperativeAggregate` pass yields a sketch
  * from which any equi-width histogram or CDF is derived driver-side
  * from ≤ maxCentroids numbers.
  *
  * At 100 TB: the aggregate is a standard partial/final plan — every
  * executor compresses locally, the exchange carries one ≤ maxCentroids
  * sketch per partition, and two columns of the SAME table sketch in a
  * single scan (two aggregates, one Aggregate node).
  */
object HistogramSketchImpl {

  /** Mutable sketch buffer: parallel arrays of (centroid, weight).
    *
    * This is the per-ROW update path of a full-scan aggregate, so the
    * hot loop is allocation-free primitive code: an in-place parallel-
    * array quicksort (no boxed index `sortBy`), primitive gap sort for
    * the merge threshold, in-place merge sweep, and scratch buffers
    * reused across the ~1-per-256-inserts compressions. */
  final class Sketch(val maxCentroids: Int) {
    var n = 0
    var cs: Array[Double] = new Array[Double](maxCentroids * 2)
    var ws: Array[Long] = new Array[Long](maxCentroids * 2)
    // gap scratch, reused across compressions; never escapes
    private[this] var gapBuf: Array[Double] = null
    private[this] var gapSort: Array[Double] = null

    def insert(x: Double): Unit = append(x, 1L)

    def append(c: Double, w: Long): Unit = {
      if (n == cs.length) compress(maxCentroids)
      cs(n) = c; ws(n) = w; n += 1
    }

    /** In-place quicksort of the (cs, ws) pairs by centroid —
      * median-of-three pivot, insertion sort below 16 elements. */
    def sortInPlace(): Unit = if (n > 1) quicksort(0, n - 1)

    private def swap(i: Int, j: Int): Unit = {
      val c = cs(i); cs(i) = cs(j); cs(j) = c
      val w = ws(i); ws(i) = ws(j); ws(j) = w
    }

    private def quicksort(lo: Int, hi: Int): Unit = {
      var l = lo
      var h = hi
      while (h - l >= 16) {
        // median-of-three pivot to dodge the sorted-prefix worst case
        // (after a compression the head of the buffer IS sorted)
        val mid = (l + h) >>> 1
        if (cs(mid) < cs(l)) swap(mid, l)
        if (cs(h) < cs(l)) swap(h, l)
        if (cs(h) < cs(mid)) swap(h, mid)
        val pivot = cs(mid)
        var i = l
        var j = h
        while (i <= j) {
          while (cs(i) < pivot) i += 1
          while (cs(j) > pivot) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        // recurse into the smaller half, loop on the larger
        if (j - l < h - i) { if (l < j) quicksort(l, j); l = i }
        else { if (i < h) quicksort(i, h); h = j }
      }
      // insertion sort for the short tail
      var i = l + 1
      while (i <= h) {
        val c = cs(i); val w = ws(i)
        var j = i - 1
        while (j >= l && cs(j) > c) { cs(j + 1) = cs(j); ws(j + 1) = ws(j); j -= 1 }
        cs(j + 1) = c; ws(j + 1) = w
        i += 1
      }
    }

    /** Sort by centroid and merge smallest-gap adjacent pairs down to
      * `target`. Runs in sweeps: each sweep merges every pair whose gap
      * is at or below the (excess)-th smallest gap, each element merged
      * at most once per sweep — O(n log n) per sweep, a few sweeps per
      * compression, vs. the naive globally-nearest-pair loop's O(n²). */
    def compress(target: Int): Unit = {
      while (n > target) {
        sortInPlace()
        val m = n
        if (gapBuf == null || gapBuf.length < m) {
          gapBuf = new Array[Double](cs.length)
          gapSort = new Array[Double](cs.length)
        }
        var i = 0
        while (i < m - 1) { gapBuf(i) = cs(i + 1) - cs(i); i += 1 }
        val excess = m - target
        System.arraycopy(gapBuf, 0, gapSort, 0, m - 1)
        java.util.Arrays.sort(gapSort, 0, m - 1)
        val threshold = gapSort(math.min(excess, m - 1) - 1)
        // in-place merge sweep: o trails i, reads happen before writes
        var o = 0
        var merged = 0
        i = 0
        while (i < m) {
          if (i < m - 1 && merged < excess && gapBuf(i) <= threshold) {
            val w = ws(i) + ws(i + 1)
            val c = (cs(i) * ws(i) + cs(i + 1) * ws(i + 1)) / w
            cs(o) = c; ws(o) = w
            merged += 1
            i += 2
          } else {
            cs(o) = cs(i); ws(o) = ws(i)
            i += 1
          }
          o += 1
        }
        n = o
        if (merged == 0) return // defensive: cannot shrink further
      }
    }

    def mergeWith(other: Sketch): Unit = {
      var i = 0
      while (i < other.n) { append(other.cs(i), other.ws(i)); i += 1 }
      compress(maxCentroids)
    }

    def serialize(): Array[Byte] = {
      compress(maxCentroids)
      val bb = ByteBuffer.allocate(4 + n * 16)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(cs(i)); bb.putLong(ws(i)); i += 1 }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte], maxCentroids: Int): Sketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new Sketch(maxCentroids)
    var i = 0
    while (i < n) { s.append(bb.getDouble, bb.getLong); i += 1 }
    s
  }

  /** Evaluate the sketch's CDF at `x` (linear interpolation between
    * centroids — t-digest convention: half a centroid's weight sits at
    * its mean). */
  def cdf(cs: Array[Double], ws: Array[Long], x: Double): Double = {
    val total = ws.sum.toDouble
    if (total == 0) return 0.0
    if (x < cs.head) return 0.0
    if (x >= cs.last) return 1.0
    // find i with cs(i) <= x < cs(i+1); cum = weight strictly before i
    var i = 0
    var cum = 0.0
    while (i < cs.length - 1 && cs(i + 1) <= x) { cum += ws(i); i += 1 }
    // CDF at a centroid = (weight before it + half its own) / total;
    // linear between adjacent centroids
    val left = cum + ws(i) / 2.0
    val right = cum + ws(i) + ws(i + 1) / 2.0
    val frac = (x - cs(i)) / (cs(i + 1) - cs(i))
    (left + frac * (right - left)) / total
  }

  /** TVD between two sketches over `bins` equi-width cells spanning the
    * first sketch's range (mirrors `continuousComparator` semantics). */
  def tvd(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long]), bins: Int): Double = {
    if (a._1.isEmpty || b._1.isEmpty) return 0.0
    val (lo, hi) = (a._1.head, a._1.last)
    if (lo == hi) return 0.0
    var res = 0.0
    var i = 0
    var fa0 = 0.0
    var fb0 = 0.0
    // clamp side b to side a's range like continuousComparator drops
    // out-of-range values: renormalize b's CDF within [lo, hi]
    val bLo = cdf(b._1, b._2, lo)
    val bHi = cdf(b._1, b._2, hi)
    val bSpan = math.max(bHi - bLo, 1e-300)
    while (i < bins) {
      val e = lo + (hi - lo) * (i + 1) / bins
      val fa1 = cdf(a._1, a._2, e)
      val fb1 = (cdf(b._1, b._2, e) - bLo) / bSpan
      res += math.abs((fa1 - fa0) - (fb1 - fb0))
      fa0 = fa1; fb0 = fb1
      i += 1
    }
    res / 2.0
  }
}

/** `graft_hist_sketch(x) -> array<struct<centroid double, weight long>>` */
case class HistogramSketchAgg(
    child: Expression,
    maxCentroids: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HistogramSketchImpl.Sketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_hist_sketch expects numeric, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("centroid", DoubleType, nullable = false),
    StructField("weight", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hist_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): HistogramSketchImpl.Sketch =
    new HistogramSketchImpl.Sketch(maxCentroids)

  override def update(buf: HistogramSketchImpl.Sketch, input: InternalRow): HistogramSketchImpl.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble // not a java.lang.Number
      case n: Number => n.doubleValue()
      case other => other.toString.toDouble
    })
    buf
  }

  override def merge(buf: HistogramSketchImpl.Sketch, other: HistogramSketchImpl.Sketch): HistogramSketchImpl.Sketch = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: HistogramSketchImpl.Sketch): Any = {
    buf.compress(maxCentroids)
    buf.sortInPlace() // compress sorts only when it shrinks; the
    // emitted array is ordered by centroid (cdf/decode rely on it)
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = InternalRow(buf.cs(i), buf.ws(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: HistogramSketchImpl.Sketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): HistogramSketchImpl.Sketch =
    HistogramSketchImpl.deserialize(bytes, maxCentroids)

  override def withNewMutableAggBufferOffset(offset: Int): HistogramSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HistogramSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object HistogramSketch {
  /** Column form: one-pass mergeable histogram sketch aggregate. */
  def sketch(c: Column, maxCentroids: Int = 256): Column =
    ColumnBridge.column(
      HistogramSketchAgg(ColumnBridge.expression(c), maxCentroids)
        .toAggregateExpression())

  /** Decode a collected sketch row value into (centroids, weights). */
  def decode(rows: Seq[org.apache.spark.sql.Row]): (Array[Double], Array[Long]) =
    (rows.map(_.getDouble(0)).toArray, rows.map(_.getLong(1)).toArray)
}
