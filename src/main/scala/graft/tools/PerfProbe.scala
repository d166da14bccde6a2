package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway-style perf probe for round-4 tuning experiments (kept in
  * tools/ like ScaleProbe; run manually, never part of the gate). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Local.session("8")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(graft.SparkEntry.queries("q22_curation")(spark, sfDir))

    // ---- where do q38's seconds go?
    time("q38 whole") { noop(graft.SparkEntry.queries("q38_transitive_dedup")(spark, sfDir)) }

    import graft.llm.{Curation, Dedup}
    // the exact gate fixture, shared with SparkEntry (no drift)
    val planted = graft.SparkEntry.q38Planted(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    planted.count()
    val cfg = Curation.Config(minQuality = 0.0, nearDupStrategy = "minhash",
      nearDupMaxJaccardDistance = 0.2, nearDupMinJaccard = 0.8)
    time("curate(pair-drop)") {
      val s = Curation.curate(planted, "doc_id", "text", cfg); s.count(); s.unpersist()
    }
    time("curate(transitive)") {
      val s = Curation.curate(planted, "doc_id", "text", cfg.copy(transitiveNearDups = true))
      s.count(); s.unpersist()
    }
    // CC alone on the verified pair graph
    val cands = Dedup.minHashNearDups(planted, "doc_id", "text",
      maxJaccardDistance = cfg.nearDupMaxJaccardDistance)
    val verified = Dedup.verifyPairs(cands, planted, "doc_id", "text", 0.8)
      .select("id1", "id2").persist()
    println(s"[perf] verified pairs: ${verified.count()}")
    time("connectedComponents alone") {
      Dedup.connectedComponents(verified).count(); ()
    }
    time("minhash candidates + verify alone") {
      Dedup.verifyPairs(
        Dedup.minHashNearDups(planted, "doc_id", "text",
          maxJaccardDistance = cfg.nearDupMaxJaccardDistance),
        planted, "doc_id", "text", 0.8).count(); ()
    }
    spark.stop()
  }
}
