package graft.tools

import org.apache.spark.sql.functions._

/** Round-9 dev probe: throughput of the byte-fallback encode paths and
  * the packed token-id export on the sf0.1 corpus (numbers cited in
  * DESIGN.md). Usage: runMain graft.tools.PerfProbe9 [sfDir] */
object PerfProbe9 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Local.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      logLevel = "ERROR")
    import graft.llm.BpeTrainer
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("probe9").toString
    val (mPath, vPath) = (s"$dir/merges.txt", s"$dir/vocab.txt")
    val t0 = System.nanoTime()
    val merges = BpeTrainer.learnMerges(docs, "text", numMerges = 512)
    BpeTrainer.saveMerges(spark, mPath, merges)
    BpeTrainer.saveVocab(spark, vPath, BpeTrainer.buildVocab(docs, "text", merges))
    println(f"train 512 merges + byte-fallback vocab over $n docs: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t) / 1e9}%.2f s over $n docs")
    }
    time("bpeEncode (plain)") {
      docs.select(sum(size(graft.functions.GraftFunctions.bpeEncode(
        col("text"), mPath, vPath)))).head()
    }
    time("bpeEncodeLossless") {
      docs.select(sum(size(graft.functions.GraftFunctions.bpeEncodeLossless(
        col("text"), mPath, vPath)))).head()
    }
    time("lossless round-trip (encode+decode+compare)") {
      docs.select(count(when(graft.functions.GraftFunctions.bpeDecode(
        graft.functions.GraftFunctions.bpeEncodeLossless(col("text"), mPath, vPath),
        vPath) === col("text"), 1))).head()
    }
    val ids = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.bpeEncode(col("text"), mPath, vPath).as("ids"))
      .cache()
    val tok = ids.select(sum(size(col("ids")))).head().getLong(0)
    time(s"packTokenIds seqLen=2048 over $tok ids") {
      graft.llm.CorpusPrep.packTokenIds(ids, "doc_id", "ids",
        seqLen = 2048, eosId = 1, buckets = 64)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
