package graft

import org.apache.spark.sql.functions._
import graft.datadiff.DataDiff

/** R11-R14 drift-detection semantics (reference `datadiff.py:1-56`). */
class DataDiffSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("hashHistogramDF: freqs sum to 1, width capped at maxBins (R12)") {
    val h = DataDiff.hashHistogramDF(li, "l_returnflag", maxBins = 1000)
    val rows = h.collect()
    assert(rows.length <= 1000)
    assert(rows.length >= 2) // A, N, R hash to distinct bins w.h.p.
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(rows.map(_.getLong(1)).sum == li.count())
  }

  test("hashHistogramDF folds null keys into 'None' (datadiff.py:9-11)") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("v")
    val h = DataDiff.hashHistogram(df, "v", 100)
    assert(h.contains("None"))
    assert(math.abs(h("None") - 0.25) < 1e-9)
    assert(math.abs(h.values.sum - 1.0) < 1e-9)
  }

  test("histogramDF caps shuffle width with a custom arithmetic bin") {
    val h = DataDiff.histogramDF(li, pmod(col("l_orderkey") * lit(2654435761L), lit(50L)))
    assert(h.count() <= 50)
  }

  test("TVD(x,x) == 0 and TVD in [0,1] (datadiff.py invariants)") {
    assert(DataDiff.discreteComparator(li, "l_returnflag", li, "l_returnflag") === 0.0)
    val t = DataDiff.discreteComparator(li, "l_returnflag", li, "l_linestatus")
    assert(t >= 0.0 && t <= 1.0)
    assert(t > 0.0) // distributions genuinely differ
  }

  test("tvdSameTable == join-based TVD, one table scan (single-scan form)") {
    val joined = DataDiff.tvdOfHistograms(
      DataDiff.histogramDF(li, col("l_returnflag")),
      DataDiff.histogramDF(li, col("l_linestatus")))
    val single = DataDiff.tvdSameTable(li, "l_returnflag", "l_linestatus")
    assert(math.abs(joined - single) < 1e-12, s"join=$joined single=$single")
    // exactly one scan of the parquet in the plan
    val plan = DataDiff.tvdSameTableDF(li, "l_returnflag", "l_linestatus")
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 == 1, s"expected 1 scan:\n$plan")
  }

  test("TVD on empty inputs is 0, not an NPE") {
    val empty = li.filter(col("l_quantity") < -1)
    assert(DataDiff.discreteComparator(empty, "l_returnflag", empty, "l_linestatus") == 0.0)
    assert(DataDiff.tvdSameTable(empty, "l_returnflag", "l_linestatus") == 0.0)
  }

  test("TVD = 1 for disjoint distributions") {
    val d1 = Seq("a", "a", "b").toDF("v")
    val d2 = Seq("x", "y", "y").toDF("v")
    val t = DataDiff.discreteComparator(d1, "v", d2, "v", 1000)
    assert(math.abs(t - 1.0) < 1e-9)
  }

  test("profile: nulls/distincts/min/max correct; approx path is one scan, no Expand") {
    val df = Seq(
      (Option(1), Option("a")), (Option.empty[Int], Option("b")),
      (Option(3), Option.empty[String]), (Option(1), Option("a"))
    ).toDF("x", "s")
    val p = DataDiff.profile(df, Seq("x", "s"), exact = true)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("x") == ((4L, 1L, 2L, "1", "3")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    // scale path: HLL distincts keep everything in ONE partial-agg scan
    // (exact count-distinct would plan an Expand of |cols| row copies)
    val plan = DataDiff.profile(li, Seq("l_orderkey", "l_returnflag"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 == 1, s"expected 1 scan:\n$plan")
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    // empty table: well-defined zeros, not nulls
    val e = DataDiff.profile(df.filter(lit(false)), Seq("x"), exact = true).head()
    assert(e.getLong(1) == 0L && e.getLong(2) == 0L && e.getLong(3) == 0L)
    // dotted column names resolve as top-level refs, not struct access
    val dotted = Seq((1, 2)).toDF("a.b", "c")
    val pd = DataDiff.profile(dotted, Seq("a.b"), exact = true).head()
    assert(pd.getString(0) == "a.b" && pd.getLong(3) == 1L)
  }

  test("PSI: same-table form == join form; 0 for identical; blows up on new mass") {
    val joined = DataDiff.psiOfHistograms(
      DataDiff.histogramDF(li, col("l_returnflag")),
      DataDiff.histogramDF(li, col("l_linestatus")))
    val single = DataDiff.psiSameTable(li, "l_returnflag", "l_linestatus")
    assert(math.abs(joined - single) < 1e-12, s"join=$joined single=$single")
    assert(DataDiff.psiSameTable(li, "l_returnflag", "l_returnflag") === 0.0)
    // hand-computed: p1 = {x:.5, y:.5}, p2 = {x:.25, y:.5, z:.25}, eps=1e-6
    val df = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "z")).toDF("a", "b")
    val eps = 1e-6
    val want = (0.5 - 0.25) * math.log(0.5 / 0.25) +
      (eps - 0.25) * math.log(eps / 0.25)
    assert(math.abs(DataDiff.psiSameTable(df, "a", "b") - want) < 1e-12)
    // a category appearing from nothing dominates the score (the PSI
    // property TVD lacks: TVD caps its contribution at its mass)
    assert(want > 2.0)
  }

  test("PSI on empty inputs is 0") {
    val empty = li.filter(col("l_quantity") < -1)
    assert(DataDiff.psiSameTable(empty, "l_returnflag", "l_linestatus") == 0.0)
  }

  test("JSD: 0 for identical, ln2 for disjoint, hand-checked, finite without eps") {
    assert(DataDiff.jsdSameTable(li, "l_returnflag", "l_returnflag") === 0.0)
    // disjoint supports → every bin one-sided: JSD = ln 2
    val disjoint = Seq(("a", "x"), ("b", "y")).toDF("a", "b")
    assert(math.abs(DataDiff.jsdSameTable(disjoint, "a", "b") - math.log(2)) < 1e-12)
    // p1={x:.5,y:.5}, p2={x:1}: m(x)=.75, m(y)=.25
    val df = Seq(("x", "x"), ("y", "x")).toDF("a", "b")
    val want = 0.5 * (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)) +
      0.5 * (1.0 * math.log(1.0 / 0.75))
    assert(math.abs(DataDiff.jsdSameTable(df, "a", "b") - want) < 1e-12)
    val real = DataDiff.jsdSameTable(li, "l_returnflag", "l_linestatus")
    assert(real > 0.0 && real <= math.log(2) + 1e-12)
  }

  test("KS: 0 for identical columns, hand-checked for a known shift, <= 1") {
    val edges = DataDiff.equiWidthEdges(li, "l_extendedprice", 20)
    assert(DataDiff.ksContinuousSameTable(li, "l_extendedprice", "l_extendedprice", edges) === 0.0)
    // values 0..9 vs 2..11 over edges 0..10 (10 bins of width 1): side2's
    // in-range filter keeps 2..10 (9 values; 11 dropped), CDFs known
    val df = (0 to 9).map(i => (i.toDouble, i + 2.0)).toDF("a", "b")
    val e10 = (0 to 10).map(_.toDouble).toArray
    val got = DataDiff.ksContinuousSameTable(df, "a", "b", e10)
    // side1: 1/10 per bin 0..9; side2: 1/9 per bin 2..8, 2/9 in bin 9
    // (10.0 folds in via last-edge-inclusive). max gap at bin 1: 2/10 = 0.2
    assert(math.abs(got - 0.2) < 1e-12, s"ks=$got")
    val li2 = li.withColumn("__disc", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val drift = DataDiff.ksContinuousSameTable(li2, "l_extendedprice", "__disc", edges)
    assert(drift > 0.0 && drift <= 1.0)
  }

  test("continuousComparator: same dist ~ 0, shifted dist >> 0 (R11+R13)") {
    val same = DataDiff.continuousComparator(li, "l_quantity", li, "l_quantity", 100)
    assert(same === 0.0)
    val shifted = li.select((col("l_quantity") + 25.0).as("q2"))
    val drift = DataDiff.continuousComparator(li, "l_quantity", shifted, "q2", 100)
    assert(drift > 0.3, s"expected big drift, got $drift")
    assert(drift <= 1.0)
  }

  test("continuousHistogramDF: last edge inclusive, out-of-range dropped") {
    val df = Seq(0.0, 0.5, 1.0, 2.0, -1.0).toDF("x") // 2.0/-1.0 out of [0,1]
    val h = DataDiff.continuousHistogramDF(df, "x", Array(0.0, 0.5, 1.0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(0L -> 1L, 1L -> 2L)) // 0.0 -> bin0; 0.5, 1.0 -> bin1
  }

  test("equiWidthEdges: maxBins+1 edges spanning min..max (R11)") {
    val e = DataDiff.equiWidthEdges(li, "l_quantity", 10)
    assert(e.length == 11)
    assert(e.head < e.last)
    assert(e.sameElements(e.sorted))
  }

  test("histogramToMap labels bins lower_upper (R14, datadiff.py:18-24)") {
    val m = DataDiff.histogramToMap(Array(0.0, 1.0, 2.0), Map(0L -> 3L))
    assert(m == Map("0.0_1.0" -> 3L, "1.0_2.0" -> 0L))
  }

  test("tableDiff: added/removed/changed/unchanged incl. null transitions") {
    import spark.implicits._
    val oldDf = Seq(
      (1L, Some("a"), Some(10.0)), // unchanged
      (2L, Some("b"), Some(20.0)), // changed (value)
      (3L, None, Some(30.0)),      // changed (null → value)
      (4L, Some("d"), None),       // unchanged (null == null)
      (5L, Some("e"), Some(50.0))  // removed
    ).toDF("k", "s", "v")
    val newDf = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("B"), Some(20.0)),
      (3L, Some("c"), Some(30.0)),
      (4L, Some("d"), None),
      (6L, Some("f"), Some(60.0))  // added
    ).toDF("k", "s", "v")
    val out = DataDiff.tableDiff(oldDf, newDf, Seq("k")).cache()
    val st = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged", 5L -> "removed", 6L -> "added"), s"$st")
    // old/new value columns carried for triage
    val r2 = out.filter(col("k") === 2L).head()
    assert(r2.getAs[String]("old_s") == "b" && r2.getAs[String]("new_s") == "B")
    assert(out.filter(col("k") === 6L).head().getAs[Any]("old_s") == null)
    out.unpersist()
    // explicit compareCols subset: status ignores other columns
    val sub = DataDiff.tableDiff(oldDf, newDf, Seq("k"), compareCols = Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub(2L) == "unchanged" && sub(3L) == "unchanged")
    intercept[IllegalArgumentException](DataDiff.tableDiff(oldDf, newDf, Nil))
    intercept[IllegalArgumentException](
      DataDiff.tableDiff(oldDf, newDf, Seq("k"), compareCols = Seq("nope")))
  }
}
