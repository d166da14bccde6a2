package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway-style perf probe for round-5 tuning experiments (kept in
  * tools/ like ScaleProbe; run manually, never part of the gate).
  *
  * Round-5 questions:
  *  1. does q36 cost ~0.3 s when run in ISOLATION at sf0.1 (verdict:
  *     3.61 s inside the 59-query bench with unchanged code)?
  *  2. where do q39's 8 s go — persist materialization, LSH fit,
  *     candidate join, or the summary collect?
  *  3. what does q38 cost broken into fit/join/verify stages?
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: same shapes Bench warms
    Seq("q1_pricing_summary", "q6_join_agg", "q15_knn_brute").foreach { q =>
      noop(graft.SparkEntry.queries(q)(spark, sfDir))
    }

    // ---- 1. q36 in isolation (3 passes, like the bench)
    (1 to 3).foreach { i =>
      time(s"q36 isolated pass $i") {
        noop(graft.SparkEntry.queries("q36_supplier_region")(spark, sfDir))
      }
    }

    // ---- 2. q39 stage breakdown
    time("q39 whole") { noop(graft.SparkEntry.queries("q39_vector_near_dup")(spark, sfDir)) }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 1000)
    val noisy = emb.filter(col("vec_id") < 500)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => (x * (lit(1.0) + lit(0.1) * sin(col("vec_id") * 7919 + i * 104729))).cast("float")))
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val all = emb.unionByName(noisy)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("q39 persist materialize") { all.count(); () }
    time("q39 lshNearDupPairs count") {
      val n = graft.llm.Similarity.lshNearDupPairs(all,
        maxCosineDistance = 0.05, bucketLength = 0.02).count()
      println(s"[perf]   pairs: $n")
    }
    time("q39 lshNearDupPairs again (model refit)") {
      graft.llm.Similarity.lshNearDupPairs(all,
        maxCosineDistance = 0.05, bucketLength = 0.02).count(); ()
    }
    all.unpersist()

    // ---- 3. q38 stage breakdown
    time("q38 whole") { noop(graft.SparkEntry.queries("q38_transitive_dedup")(spark, sfDir)) }
    import graft.llm.Dedup
    val planted = graft.SparkEntry.q38Planted(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("q38 planted materialize") { println(s"[perf]   planted: ${planted.count()}") }
    time("q38 minhash candidates (5 tables)") {
      val n = Dedup.minHashNearDups(planted, "doc_id", "text",
        maxJaccardDistance = 0.2).count()
      println(s"[perf]   candidates: $n")
    }
    time("q38 minhash candidates (3 tables)") {
      val n = Dedup.minHashNearDups(planted, "doc_id", "text",
        maxJaccardDistance = 0.2, numHashTables = 3).count()
      println(s"[perf]   candidates: $n")
    }
    time("q38 candidates + verify (3 tables)") {
      val n = Dedup.verifyPairs(
        Dedup.minHashNearDups(planted, "doc_id", "text",
          maxJaccardDistance = 0.2, numHashTables = 3),
        planted, "doc_id", "text", 0.8).count()
      println(s"[perf]   verified: $n")
    }
    planted.unpersist()

    // ---- q36 again at the END of a session that ran LSH persists —
    // does neighbourhood pressure reproduce the bench regression?
    (1 to 3).foreach { i =>
      time(s"q36 after-LSH pass $i") {
        noop(graft.SparkEntry.queries("q36_supplier_region")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
