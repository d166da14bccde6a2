package graft

import org.apache.spark.sql.functions._
import graft.datadiff.DataDiff
import graft.functions.{HistogramSketch, HistogramSketchImpl}

/** One-pass mergeable histogram sketch (TypedImperativeAggregate). */
class HistogramSketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("sketch conserves total weight and spans the data range") {
    val rows = li.agg(HistogramSketch.sketch(col("l_quantity")).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val (cs, ws) = HistogramSketch.decode(rows)
    assert(ws.sum == li.count())
    assert(cs.length <= 256)
    val (mn, mx) = li.agg(min("l_quantity"), max("l_quantity"))
      .head() match { case r => (r.getDouble(0), r.getDouble(1)) }
    assert(cs.head >= mn && cs.last <= mx)
    assert(cs.sameElements(cs.sorted))
  }

  test("sketch accepts decimal columns (Decimal is not a java.lang.Number)") {
    val rows = li.select(col("l_quantity").cast("decimal(10,2)").as("q"))
      .agg(HistogramSketch.sketch(col("q")).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val (_, ws) = HistogramSketch.decode(rows)
    assert(ws.sum == li.count())
  }

  test("sketch CDF is monotone from 0 to 1") {
    val rows = li.agg(HistogramSketch.sketch(col("l_extendedprice")).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val (cs, ws) = HistogramSketch.decode(rows)
    val xs = (0 to 50).map(i => cs.head + (cs.last - cs.head) * i / 50.0)
    val cdfs = xs.map(HistogramSketchImpl.cdf(cs, ws, _))
    assert(cdfs.zip(cdfs.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(HistogramSketchImpl.cdf(cs, ws, cs.head - 1) == 0.0)
    assert(HistogramSketchImpl.cdf(cs, ws, cs.last + 1) == 1.0)
  }

  test("sketch TVD ~ exact TVD: same dist ~ 0, shifted dist matches exact within 0.05") {
    // two independent sketches of the SAME column differ slightly in
    // centroid placement (merge order), so "same" is near-zero, not zero
    val same = DataDiff.continuousComparatorSketch(li, "l_quantity", li, "l_quantity", 100)
    assert(same < 0.05, s"same-dist sketch TVD $same")
    val shifted = li.select((col("l_quantity") + 25.0).as("q2"))
    val exact = DataDiff.continuousComparator(li, "l_quantity", shifted, "q2", 100)
    val approx = DataDiff.continuousComparatorSketch(li, "l_quantity", shifted, "q2", 100)
    assert(math.abs(exact - approx) < 0.05, s"exact=$exact sketch=$approx")
  }

  test("same-table sketch comparator uses ONE scan for both columns") {
    val df = li.agg(
      HistogramSketch.sketch(col("l_quantity")).as("s1"),
      HistogramSketch.sketch(col("l_extendedprice")).as("s2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 == 1, s"expected 1 scan:\n$plan")
    val v = DataDiff.continuousComparatorSketchSameTable(li, "l_quantity", "l_extendedprice", 100)
    // disjoint ranges: side b has no mass inside side a's range, which
    // the exact comparator also scores as 0.5 (all of a's mass unmatched)
    assert(v == 0.5, s"disjoint-range TVD $v")
  }

  test("sketch aggregate does partial aggregation across partitions") {
    val df = li.repartition(8)
      .agg(HistogramSketch.sketch(col("l_quantity")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"unexpected agg strategy:\n$plan")
    // result identical regardless of partitioning (merge correctness)
    val a = HistogramSketch.decode(df.head().getSeq[org.apache.spark.sql.Row](0))
    val b = HistogramSketch.decode(
      li.coalesce(1).agg(HistogramSketch.sketch(col("l_quantity")).as("s"))
        .head().getSeq[org.apache.spark.sql.Row](0))
    assert(a._2.sum == b._2.sum)
  }
}
