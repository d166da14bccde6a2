package graft

import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column) = spark.range(1).select(c).head()

  test("wsTokenCount counts whitespace-separated tokens") {
    assert(one(TextAnalysis.wsTokenCount(lit("a  b\tc\nd"))).getInt(0) == 4)
    assert(one(TextAnalysis.wsTokenCount(lit(""))).getInt(0) == 0)
  }

  test("bpeishTokenCount splits long words and counts punct per char") {
    // "tokenization" = 12 letters -> 3 subwords; "42" -> 2 digits; "!" -> 1
    assert(one(TextAnalysis.bpeishTokenCount(lit("tokenization 42!"))).getInt(0) == 6)
  }

  test("punctCount and meanTokenLength") {
    assert(one(TextAnalysis.punctCount(lit("a,b.c!"))).getInt(0) == 3)
    assert(one(TextAnalysis.meanTokenLength(lit("ab cdef"))).getDouble(0) == 3.0)
  }

  test("stopwordRatio high for prose, zero for garbage") {
    val prose = one(TextAnalysis.stopwordRatio(lit("the cat sat on the mat and it slept"))).getDouble(0)
    val junk = one(TextAnalysis.stopwordRatio(lit("xk9 qq7 zzz9"))).getDouble(0)
    assert(prose > 0.2)
    assert(junk == 0.0)
  }

  test("qualityScore in [0,1], orders prose above garbage") {
    val prose = one(TextAnalysis.qualityScore(
      lit("the quick brown fox jumps over the lazy dog and it runs to the forest in the morning light for a while"))).getDouble(0)
    val junk = one(TextAnalysis.qualityScore(lit("$$@@!! ## ___ ???"))).getDouble(0)
    assert(prose > 0.7, s"prose=$prose")
    assert(junk < 0.3, s"junk=$junk")
    assert(prose <= 1.0 && junk >= 0.0)
  }

  test("langId identifies planted natural-language samples") {
    val samples = Seq(
      ("the house is in the middle of the village and it is old", "en"),
      ("der hund ist nicht mit der katze und ich gehe zu dir", "de"),
      ("le chat est dans la maison et les enfants sont pour une heure", "fr"),
      ("el perro es un animal y la casa que es de madera", "es"),
      ("o menino que mora em uma casa para os amigos do porto", "pt"),
      ("il gatto che non sono con una casa di roma per la sera", "it"),
      ("ik denk dat het een huis van de stad niet op straat te zien is", "nl"),
      ("я не знаю что это он как в на с берегу", "ru"),
      ("你好世界这是一个中文句子没有空格", "zh"),
      ("xk9qq7 zzz9 blorp", "unknown"),
    ).toDF("text", "want")
    val got = samples.withColumn("got", TextAnalysis.langId(col("text"))).collect()
    got.foreach(r => assert(r.getString(2) == r.getString(1),
      s"text='${r.getString(0).take(30)}' want=${r.getString(1)} got=${r.getString(2)}"))
  }

  test("native docFingerprint is bit-identical to the HOF reference form") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"))
      .unionByName(Seq(
        "héllo wörld ça va bien aujourd'hui — vraiment",
        "я не знаю что это за текст но он тут",
        "短 short", "", "x").toDF("text"))
    val cmp = docs.select(
      TextAnalysis.docFingerprint(col("text")).as("native"),
      TextAnalysis.docFingerprintHof(col("text")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
    // and the SQL registration path resolves to the same expression
    graft.functions.GraftFunctions.register(spark)
    val viaSql = docs.limit(5).select(
      call_function("graft_fingerprint", col("text"), lit(8), lit(4)).as("f"),
      TextAnalysis.docFingerprint(col("text")).as("g"))
    assert(viaSql.filter(col("f") =!= col("g")).count() == 0)
  }

  test("docFingerprint: shift-tolerant, distinct for different docs") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog near the river bank"),
      ("b", "PREFIX the quick brown fox jumps over the lazy dog near the river bank"),
      ("c", "a completely different document about query engines and columnar storage")
    ).toDF("id", "text").withColumn("fp", TextAnalysis.docFingerprint(col("text")))
    val fp = df.collect().map(r => r.getString(0) -> r.getSeq[Long](2)).toMap
    assert(fp("a").length == 4)
    // shared min-grams survive a prefix shift (min-sampling is position-free)
    val overlapNear = fp("a").toSet.intersect(fp("b").toSet).size
    val overlapFar = fp("a").toSet.intersect(fp("c").toSet).size
    assert(overlapNear > overlapFar)
    assert(overlapNear >= 3, s"near overlap $overlapNear")
  }

  test("analysis runs shuffle-free over documents (scan-speed map)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("toks"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("lang"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(out.count() == docs.count())
  }
}
