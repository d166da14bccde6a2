package graft.tools

import org.apache.spark.sql.functions._

/** Stage accounting for q38's regression on the regenerated testdata:
  * where do the seconds go — planted-frame build, MinHash fit, LSH
  * candidate join, Jaccard verify, or the survivor cross-tab? */
object PerfProbe7 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Local.session("32")
    import graft.llm.Dedup
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe7] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val planted = graft.SparkEntry.q38Planted(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("planted count")(println(s"  rows=${planted.count()}"))
    timed("planted token stats") {
      planted.select(size(Dedup.tokens(col("text"))).as("n"))
        .agg(min("n"), avg("n"), max("n")).show()
    }
    val (featured, model) = timed("fitMinHash") {
      val r = Dedup.fitMinHash(planted, "text", 3, numHashTables = 5)
      r._1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      r
    }
    val cand = timed("approxSimilarityJoin") {
      val c = model.approxSimilarityJoin(featured, featured, 0.2, "jaccard_distance")
        .select(col("datasetA.doc_id").as("id1"), col("datasetB.doc_id").as("id2"),
          col("jaccard_distance"))
        .filter(col("id1") < col("id2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  candidates=${c.count()}")
      c
    }
    val verified = timed("verifyPairs") {
      val v = Dedup.verifyPairs(cand, planted, "doc_id", "text", minJaccard = 0.8)
        .select("id1", "id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  verified=${v.count()}")
      v
    }
    timed("connectedComponents")(
      println(s"  cc=${Dedup.connectedComponents(verified).count()}"))
    s.stop()
  }
}
