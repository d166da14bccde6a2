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
