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

  /** Mutable sketch buffer: parallel arrays of (centroid, weight). */
  final class Sketch(val maxCentroids: Int) {
    var n = 0
    var cs: Array[Double] = new Array[Double](maxCentroids * 2)
    var ws: Array[Long] = new Array[Long](maxCentroids * 2)

    def insert(x: Double): Unit = { append(x, 1L); maybeCompress() }

    def append(c: Double, w: Long): Unit = {
      if (n == cs.length) compress(maxCentroids)
      cs(n) = c; ws(n) = w; n += 1
    }

    private def maybeCompress(): Unit = if (n >= cs.length) compress(maxCentroids)

    /** Sort by centroid and merge smallest-gap adjacent pairs down to
      * `target`. Runs in sweeps: each sweep merges every pair whose gap
      * is at or below the (excess)-th smallest gap, each element merged
      * at most once per sweep — O(n log n) per sweep, a few sweeps per
      * compression, vs. the naive globally-nearest-pair loop's O(n²)
      * which would dominate the per-row update path of a 100 TB scan. */
    def compress(target: Int): Unit = {
      while (n > target) {
        val idx = (0 until n).sortBy(cs)
        val sc = idx.map(cs).toArray
        val sw = idx.map(ws).toArray
        val m = n
        val gaps = Array.tabulate(m - 1)(i => sc(i + 1) - sc(i))
        val excess = m - target
        val threshold = gaps.sorted.apply(math.min(excess, gaps.length) - 1)
        val outC = new Array[Double](m)
        val outW = new Array[Long](m)
        var (i, o, merged) = (0, 0, 0)
        while (i < m) {
          if (i < m - 1 && merged < excess && gaps(i) <= threshold) {
            val w = sw(i) + sw(i + 1)
            outC(o) = (sc(i) * sw(i) + sc(i + 1) * sw(i + 1)) / w
            outW(o) = w
            merged += 1
            i += 2
          } else {
            outC(o) = sc(i); outW(o) = sw(i)
            i += 1
          }
          o += 1
        }
        System.arraycopy(outC, 0, cs, 0, o)
        System.arraycopy(outW, 0, ws, 0, o)
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
    val idx = (0 until buf.n).sortBy(buf.cs)
    new GenericArrayData(idx.map { i =>
      InternalRow(buf.cs(i), buf.ws(i))
    }.toArray[Any])
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
