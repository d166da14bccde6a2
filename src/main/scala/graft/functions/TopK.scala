package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator: keeps the k highest-scoring (score, id)
  * pairs per group with map-side partial aggregation.
  *
  * Why not `row_number().over(Window.partitionBy(group))`? The window
  * shuffles EVERY scored row to its group's partition — for a KNN join
  * that is |corpus|×|queries| rows through the exchange, and one hot
  * query key = one hot partition. This aggregator reduces each map
  * partition to ≤ k pairs per group before the shuffle, so the exchange
  * carries O(partitions × groups × k) — independent of corpus size —
  * and combines bounded buffers on the reduce side. Ties break on the
  * smaller id (matching `ORDER BY score DESC, id` row_number).
  *
  * State is a sorted vector capped at k (k is small — top-k search);
  * merge is a bounded merge of two ≤k vectors.
  */
object TopK {

  type Pair = (Double, Long) // (score, id)

  final class TopKAgg(k: Int) extends Aggregator[Pair, Seq[Pair], Seq[Pair]] {
    require(k > 0, s"k must be positive, got $k")

    /** Descending score, then ascending id — row_number tie order. */
    private def better(a: Pair, b: Pair): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[Pair] = Vector.empty

    override def reduce(buf: Seq[Pair], x: Pair): Seq[Pair] =
      if (buf.size >= k && better(buf.last, x)) buf
      else insert(buf, x)

    private def insert(buf: Seq[Pair], x: Pair): Seq[Pair] = {
      val i = buf.indexWhere(e => better(x, e)) match {
        case -1 => buf.size
        case j  => j
      }
      val grown = (buf.take(i) :+ x) ++ buf.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }

    override def merge(a: Seq[Pair], b: Seq[Pair]): Seq[Pair] = {
      // bounded merge of two sorted vectors
      val out = Vector.newBuilder[Pair]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        val takeA = j >= b.size || (i < a.size && better(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(r: Seq[Pair]): Seq[Pair] = r

    override def bufferEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** Column form: `topK(k)(scoreCol, idCol)` → `array<struct<_1:score,
    * _2:id>>` sorted best-first. Use after a `groupBy(group)`. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Pair]())
      .apply(score, id)
}
