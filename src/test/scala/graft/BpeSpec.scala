package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeRegistry, BpeVocab, GraftFunctions}

/** Real BPE token counting from a config-loaded merge table: the
  * classic `low/lower/newer` fixture hand-computed, merge-priority
  * order sensitivity, merge-all-occurrences semantics, and the Spark
  * surface (Column + SQL forms, codegen, null handling). */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def mergesFile(lines: String*): String = {
    val f = java.nio.file.Files.createTempFile("graft_bpe_merges", ".txt")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  // the standard BPE textbook fixture: merges learned as l+o, lo+w, e+r
  private lazy val classicPath =
    mergesFile("#version: 0.2", "l o", "lo w", "e r")

  test("classic fixture: low/lower/newer counts match hand-applied merges") {
    val v = BpeRegistry.get(classicPath)
    // low:   l,o,w -> lo,w -> low            = 1 token
    // lower: l,o,w,e,r -> lo,w,e,r -> low,e,r -> low,er = 2 tokens
    // newer: n,e,w,e,r -> n,e,w,er           = 4 tokens (no n/e merges)
    assert(v.countWord("low") == 1)
    assert(v.countWord("lower") == 2)
    assert(v.countWord("newer") == 4)
    assert(v.countText("low lower newer") == 7)
    // case-sensitive: 'L o' is not in the table
    assert(v.countWord("Low") == 3)
  }

  test("merge priority order changes the result (rank = line order)") {
    // a+b first: abc -> ab,c -> abc = 1 token
    val ab = BpeRegistry.get(mergesFile("a b", "ab c", "b c"))
    assert(ab.countWord("abc") == 1)
    // b+c first: abc -> a,bc (a+bc not in table) = 2 tokens
    val bc = BpeRegistry.get(mergesFile("b c", "a b", "ab c"))
    assert(bc.countWord("abc") == 2)
  }

  test("the best pair merges at ALL occurrences, then iterates") {
    // aaaa -> aa,aa -> aaaa = 1 token
    val v = BpeRegistry.get(mergesFile("a a", "aa aa"))
    assert(v.countWord("aaaa") == 1)
    assert(v.countWord("aaa") == 2)  // aa,a (left-to-right, no overlap)
  }

  test("pretokenizer: letter/digit/symbol runs, whitespace free") {
    val v = BpeRegistry.get(mergesFile("s t"))
    // don't stop! -> don / ' / t / stop / ! ; st merges inside 'stop'
    assert(v.countText("don't stop!") == 3 + 1 + 1 + 3 + 1)
    // digits are their own runs: 'ab12' -> ab | 12
    val empty = BpeRegistry.get(mergesFile("q q"))
    assert(empty.countText("ab12") == 4)
    assert(empty.countText("   ") == 0)
    assert(empty.countText("") == 0)
  }

  test("malformed merge lines are rejected") {
    intercept[IllegalArgumentException] {
      BpeVocab.parse(Iterator("a b c"))
    }
    intercept[IllegalArgumentException] {
      BpeVocab.parse(Iterator("single"))
    }
  }

  test("Column + SQL surfaces agree; null stays null; codegen survives") {
    val df = Seq((1L, "low lower newer"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val viaColumn = df.select(col("id"),
      graft.llm.TextAnalysis.bpeTokenCount(col("text"), classicPath).as("n"))
    val rows = viaColumn.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(rows == Map(1L -> 7, 2L -> -1))
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("bpe_docs")
    val viaSql = spark.sql(
      s"SELECT id, graft_bpe_count(text, '$classicPath') AS n FROM bpe_docs WHERE text IS NOT NULL")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == Map(1L -> 7))
    // stays inside whole-stage codegen (spans show as the *(n) prefix);
    // a parquet-backed scan — local relations fold before codegen
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.llm.TextAnalysis.bpeTokenCount(col("text"), classicPath))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected WholeStageCodegen:\n$plan")
  }

  test("counts over the documents table are sane vs the heuristic") {
    // with a tiny table most text stays at ~1 token per character run;
    // a real merges table only ever lowers counts relative to raw chars
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val v = docs.select(
      graft.llm.TextAnalysis.bpeTokenCount(col("text"), classicPath).as("real"),
      graft.llm.TextAnalysis.bpeishTokenCount(col("text")).as("heur"),
      length(col("text")).as("chars"))
      .collect()
    v.foreach { r =>
      assert(r.getInt(0) > 0)
      assert(r.getInt(0) <= r.getInt(2), "token count cannot exceed char count")
    }
  }
}
