package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqSketch

class FreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def entries(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("k >= distinct values: every count exact, any partitioning") {
    val data = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"v${i % 13}"))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 11)) {
      val got = entries(data.toDF("s").repartition(parts)
        .agg(FreqSketch.sketch(col("s"), k = 64).as("sk"))).toMap
      assert(got == truth, s"parts=$parts: $got")
    }
  }

  test("output ordered by (count desc, item asc)") {
    val got = entries(Seq("b", "b", "a", "a", "c").toDF("s")
      .agg(FreqSketch.sketch(col("s"), 8).as("sk")))
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("k < distinct on a skewed stream: MG bound holds, heavy items present") {
    // 3 heavy values drown a 200-value tail; k=16 << 203 distinct
    val heavy = Seq.fill(500)("h1") ++ Seq.fill(400)("h2") ++ Seq.fill(300)("h3")
    val tail = (1 to 200).map(i => s"t$i")
    val data = scala.util.Random.shuffle(heavy ++ tail) // seedless OK: bound must hold for ANY order
    val n = data.size.toLong
    val k = 16
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = entries(data.toDF("s").repartition(4)
      .agg(FreqSketch.sketch(col("s"), k).as("sk"))).toMap
    val maxErr = n / (k + 1)
    // every value with true count > n/(k+1) is guaranteed reported
    for ((v, c) <- truth if c > maxErr)
      assert(got.contains(v), s"heavy item $v (true $c) missing; err bound $maxErr")
    // estimates never overcount and undercount by at most n/(k+1)
    for ((v, est) <- got) {
      assert(est <= truth(v), s"$v overcounted: est $est > true ${truth(v)}")
      assert(truth(v) - est <= maxErr, s"$v undercounted past the bound")
    }
    // the memory contract: never more than k entries
    assert(got.size <= k)
  }

  test("nulls ignored; rejects non-string input and bad k") {
    val got = entries(Seq(Some("a"), None, Some("a")).toDF("s")
      .agg(FreqSketch.sketch(col("s"), 4).as("sk")))
    assert(got == Seq(("a", 2L)))
    intercept[Exception] {
      Seq(1, 2).toDF("x").agg(FreqSketch.sketch(col("x"), 4)).collect()
    }
    intercept[IllegalArgumentException](FreqSketch.sketch(lit("a"), 0))
  }

  test("freqState/mergeFreqStates: lifetime counts exact under k; nulls " +
      "surface as the non-colliding sentinel; k drift rejected; report ranks") {
    import graft.llm.Cardinality
    // "null" the STRING is a real value here — it must stay separate
    // from the NULL row in persisted state (review finding)
    val b1 = Seq(("s0", "en"), ("s0", "en"), ("s1", "de"), ("s0", null),
        ("s1", "null"))
      .toDF("source", "lang")
    val b2 = Seq(("s0", "en"), ("s2", "en"), ("s2", "fr")).toDF("source", "lang")
    val s1 = Cardinality.freqState(b1, Seq("source", "lang"), k = 16)
    val s2 = Cardinality.freqState(b2, Seq("source", "lang"), k = 16)
    val merged = Cardinality.mergeFreqStates(Seq(s1, s2))
    val got = merged.select(col("value_column"), explode(col("items")).as("e"))
      .select(col("value_column"), col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // under k lifetime distincts no MG trim ever fires: merged state
    // equals the exact group-by over the union of both batches
    assert(got == Map(
      ("source", "s0") -> 4L, ("source", "s1") -> 2L, ("source", "s2") -> 2L,
      ("lang", "en") -> 4L, ("lang", "de") -> 1L, ("lang", "fr") -> 1L,
      ("lang", "null") -> 1L,
      ("lang", Cardinality.NullItem) -> 1L), s"got $got")
    // the report surfaces the sentinel as SQL NULL + is_null, and the
    // genuine string "null" stays is_null = false
    val rep = Cardinality.freqReport(merged)
      .filter(col("value_column") === "lang")
      .collect().map(r => (Option(r.getAs[String]("item")),
        r.getAs[Boolean]("is_null"), r.getAs[Long]("estimate"))).toSet
    assert(rep.contains((None, true, 1L)), s"report $rep")
    assert(rep.contains((Some("null"), false, 1L)), s"report $rep")
    // single-frame merge is identity on the entries
    val one = Cardinality.mergeFreqStates(Seq(s1))
    assert(one.count() == s1.count())
    // report: rank 1 is the dominant value per column
    val top = Cardinality.freqReport(merged)
      .filter(col("rank") === 1)
      .collect().map(r => r.getAs[String]("value_column") ->
        (r.getAs[String]("item"), r.getAs[Long]("estimate"))).toMap
    assert(top == Map("source" -> ("s0", 4L), "lang" -> ("en", 4L)))
    // mixed k states do not merge
    val s8 = Cardinality.freqState(b2, Seq("source", "lang"), k = 8)
    val err = intercept[IllegalArgumentException] {
      Cardinality.mergeFreqStates(Seq(s1, s8))
    }
    assert(err.getMessage.contains("mixed k"), err.getMessage)
  }

  test("mergeFreqStates over k: MG bound holds on the combined stream, " +
      "the heavy item survives the merge") {
    import graft.llm.Cardinality
    // two batches of mostly-unique values + one value heavy ACROSS
    // batches: the lifetime sketch must surface it even though neither
    // batch alone makes it dominant enough to be safe from trims
    val k = 8
    val b1 = ((1 to 60).map(i => s"u1_$i") ++ Seq.fill(30)("heavy")).toDF("v")
    val b2 = ((1 to 60).map(i => s"u2_$i") ++ Seq.fill(30)("heavy")).toDF("v")
    val merged = Cardinality.mergeFreqStates(Seq(
      Cardinality.freqState(b1, Seq("v"), k),
      Cardinality.freqState(b2, Seq("v"), k)))
    val items = merged.select(explode(col("items")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 180L // total rows fed across both batches
    assert(items.contains("heavy"),
      s"true count 60 > n/(k+1) = ${n / (k + 1)} guarantees presence: $items")
    assert(items("heavy") <= 60L && items("heavy") >= 60L - n / (k + 1),
      s"MG undercounts by at most n/(k+1): ${items("heavy")}")
    assert(items.size <= k, "hard k-entry state bound")
  }

  test("plans as a partial/final aggregate (map-side summaries)") {
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.llm.Dedup.tokens(col("text"))).as("t"))
      .agg(FreqSketch.sketch(col("t"), 64).as("sk"))
      .queryExecution.executedPlan.toString
    assert("graft_freq_sketch".r.findAllIn(plan).size >= 2,
      s"expected partial+final graft_freq_sketch:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"plan:\n$plan")
  }
}
