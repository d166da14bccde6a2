package graft

import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Single-pass text stats vs the composable column formulations. */
class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("stats counters match the composable forms on the real (ASCII) corpus") {
    val cmp = docs.select(
      TextAnalysis.stats(col("text")).as("s"),
      TextAnalysis.wsTokenCount(col("text")).as("toks"),
      TextAnalysis.punctCount(col("text")).as("punct"),
      length(col("text")).as("chars"))
    val bad = cmp.filter(
      col("s.n_tokens") =!= col("toks") ||
      col("s.n_punct") =!= col("punct") ||
      col("s.n_bytes") =!= col("chars")).count()
    assert(bad == 0)
  }

  test("qualityScoreFast == qualityScore on the real corpus") {
    val cmp = docs.select(
      TextAnalysis.qualityScoreFast(TextAnalysis.stats(col("text"))).as("fast"),
      TextAnalysis.qualityScore(col("text")).as("slow"))
    assert(cmp.filter(abs(col("fast") - col("slow")) > 1e-9).count() == 0)
  }

  test("langIdFast agrees with langId on planted natural-language samples") {
    val samples = Seq(
      "the house is in the middle of the village and it is old",
      "der hund ist nicht mit der katze und ich gehe zu dir",
      "le chat est dans la maison et les enfants sont pour une heure",
      "el perro es un animal y la casa que es de madera",
      "你好世界这是一个中文句子没有空格",
      "xk9qq7 zzz9 blorp").toDF("text")
    val cmp = samples.select(
      TextAnalysis.langIdFast(TextAnalysis.stats(col("text"))).as("fast"),
      TextAnalysis.langId(col("text")).as("slow"))
    cmp.collect().foreach(r =>
      assert(r.getString(0) == r.getString(1), s"fast=${r.getString(0)} slow=${r.getString(1)}"))
  }

  test("stats stays inside whole-stage codegen") {
    val plan = docs.select(TextAnalysis.stats(col("text")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen span:\n$plan")
  }

  test("null text yields null stats") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.stats(col("text"))).head()
    assert(r.isNullAt(0))
  }
}
