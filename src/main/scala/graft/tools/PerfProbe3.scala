package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-5 probe #3: where do q38's remaining seconds go with the new
  * tagged-union CC and the trimmed corpus? Manual tool, not in the gate. */
object PerfProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup

    import graft.llm.Dedup
    (1 to 2).foreach { pass =>
      val planted = graft.SparkEntry.q38Planted(
        spark.read.parquet(s"$sfDir/documents.parquet"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time(s"[$pass] planted materialize") { planted.count(); () }
      var cands: org.apache.spark.sql.DataFrame = null
      time(s"[$pass] minhash fit+join (3 tables)") {
        cands = Dedup.minHashNearDups(planted, "doc_id", "text",
          maxJaccardDistance = 0.2, numHashTables = 3)
        cands.count(); ()
      }
      val verified = Dedup.verifyPairs(cands, planted, "doc_id", "text", 0.8)
        .select("id1", "id2").persist(StorageLevel.MEMORY_AND_DISK)
      time(s"[$pass] verify materialize") { verified.count(); () }
      var cc: org.apache.spark.sql.DataFrame = null
      time(s"[$pass] connectedComponents (new)") {
        cc = Dedup.connectedComponents(verified)
        cc.count(); ()
      }
      time(s"[$pass] survivors x2") {
        def countSurvivors(dropIds: org.apache.spark.sql.DataFrame): Unit = {
          planted.join(dropIds, Seq("doc_id"), "left_anti")
            .agg(count(lit(1)),
              count(when(col("doc_id") >= 10000 && col("doc_id") < 20000, 1)),
              count(when(col("doc_id") >= 20000, 1))).head()
          ()
        }
        countSurvivors(verified.select(col("id2").as("doc_id")).distinct())
        countSurvivors(cc.filter(col("id") =!= col("label")).select(col("id").as("doc_id")))
      }
      verified.unpersist(); planted.unpersist()
    }
    spark.stop()
  }
}
