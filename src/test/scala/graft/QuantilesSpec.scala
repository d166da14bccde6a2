package graft

import org.apache.spark.sql.functions._
import graft.datadiff.DataDiff

/** DataDiff.quantiles: the scale-safe (approx default) per-group quantile
  * API. The exact form is oracle-verified by q34; here we pin the approx
  * path's rank-error contract against it and the plan/naming invariants. */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("quantileColName is deterministic and readable") {
    assert(DataDiff.quantileColName(0.5) == "p50")
    assert(DataDiff.quantileColName(0.95) == "p95")
    assert(DataDiff.quantileColName(0.999) == "p99_9")
    assert(DataDiff.quantileColName(0.25) == "p25")
    assert(DataDiff.quantileColName(1.0) == "p100")
    assert(DataDiff.quantileColName(0.0) == "p0")
  }

  test("approx default matches exact within the GK rank-error bound") {
    val probs = Seq(0.5, 0.95, 0.99)
    val exact = DataDiff.quantiles(li, "l_extendedprice", Seq("l_returnflag"), probs, exact = true)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // accuracy 10000 on a few-thousand-row table → rank error < 1 row:
    // approx must land on (or interpolate between) the same order stats.
    val approx = DataDiff.quantiles(li, "l_extendedprice", Seq("l_returnflag"), probs,
      exact = false, accuracy = 10000)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (e50, e95, e99)) <- exact) {
      val (a50, a95, a99) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$k p50: approx=$a50 exact=$e50")
      assert(math.abs(a95 - e95) / e95 < 0.01, s"$k p95: approx=$a95 exact=$e95")
      assert(math.abs(a99 - e99) / e99 < 0.01, s"$k p99: approx=$a99 exact=$e99")
    }
  }

  test("coarse accuracy stays inside the rank-error envelope [p-eps, p+eps]") {
    val accuracy = 100 // eps = 1/100 rank error
    val eps = 1.0 / accuracy
    val p = 0.9
    val approxV = DataDiff.quantiles(li, "l_extendedprice", Seq.empty, Seq(p),
      exact = false, accuracy = accuracy).head().getDouble(0)
    val Array(lo, hi) = DataDiff.quantiles(li, "l_extendedprice", Seq.empty,
      Seq(p - eps, p + eps), exact = true)
      .select(col(DataDiff.quantileColName(p - eps)), col(DataDiff.quantileColName(p + eps)))
      .head() match { case r => Array(r.getDouble(0), r.getDouble(1)) }
    assert(approxV >= lo && approxV <= hi,
      s"approx($p)=$approxV outside exact envelope [$lo, $hi]")
  }

  test("empty groupers → one global row; quantiles are monotone in p") {
    val r = DataDiff.quantiles(li, "l_extendedprice", Seq.empty, Seq(0.1, 0.5, 0.9))
    assert(r.columns.toSeq == Seq("p10", "p50", "p90"))
    val rows = r.collect()
    assert(rows.length == 1)
    val Seq(p10, p50, p90) = Seq(0, 1, 2).map(rows(0).getDouble)
    assert(p10 <= p50 && p50 <= p90)
  }

  test("all probs share ONE aggregate buffer (array form, single agg expr)") {
    // the plan must contain exactly one approx_percentile, fed the probs
    // array — not one independent sketch per prob
    val plan = DataDiff.quantiles(li, "l_extendedprice", Seq("l_returnflag"), Seq(0.5, 0.95, 0.99))
      .queryExecution.optimizedPlan.toString
    assert(plan.split("percentile_approx").length - 1 == 1, s"expected 1 sketch:\n$plan")
  }

  test("approx path partial-aggregates (map-side combine before the shuffle)") {
    val plan = DataDiff.quantiles(li, "l_extendedprice", Seq("l_returnflag"), Seq(0.5))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate(partial) below the exchange proves the sketch
    // merges map-side — the property that makes it the 100 TB shape
    assert(plan.contains("partial_approx_percentile") || plan.contains("partial approx_percentile")
      || plan.toLowerCase.contains("partial_percentile_approx"),
      s"expected a partial approx_percentile below the exchange:\n$plan")
  }

  test("input validation: bad probs / empty probs / duplicate names reject") {
    intercept[IllegalArgumentException] {
      DataDiff.quantiles(li, "l_extendedprice", Seq.empty, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DataDiff.quantiles(li, "l_extendedprice", Seq.empty, Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      DataDiff.quantiles(li, "l_extendedprice", Seq.empty, Seq(0.5, 0.5))
    }
    intercept[IllegalArgumentException] {
      DataDiff.quantiles(li, "l_extendedprice", Seq.empty, Seq(0.5), accuracy = 0)
    }
  }
}
