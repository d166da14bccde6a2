package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-5 probe #2: q38 tail cost (CC + survivor counts) and q39 trim
  * variants. Manual tool, never part of the gate. */
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    import graft.llm.Dedup
    val planted = graft.SparkEntry.q38Planted(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    planted.count()
    val verified = Dedup.verifyPairs(
      Dedup.minHashNearDups(planted, "doc_id", "text", maxJaccardDistance = 0.2,
        numHashTables = 3),
      planted, "doc_id", "text", 0.8)
      .select("id1", "id2").persist(StorageLevel.MEMORY_AND_DISK)
    time("q38 verified materialize (3 tables)") { println(s"[perf]   pairs: ${verified.count()}") }
    time("q38 connectedComponents") {
      Dedup.connectedComponents(verified).count(); ()
    }
    time("q38 countSurvivors x2") {
      def countSurvivors(dropIds: org.apache.spark.sql.DataFrame): Unit = {
        planted.join(dropIds, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)),
            count(when(col("doc_id") >= 10000 && col("doc_id") < 20000, 1)),
            count(when(col("doc_id") >= 20000, 1))).head()
        ()
      }
      countSurvivors(verified.select(col("id2").as("doc_id")).distinct())
      countSurvivors(Dedup.connectedComponents(verified)
        .filter(col("id") =!= col("label")).select(col("id").as("doc_id")))
    }
    verified.unpersist(); planted.unpersist()

    // smaller base slice: doc_id < 48
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = size(Dedup.tokens(col("text")))
    val base = docs.filter(col("doc_id") < 48 && n.between(40, 300))
    val k = floor((n - lit(2)) / lit(6)).cast("int")
    def extras(to: org.apache.spark.sql.Column) = concat_ws(" ",
      transform(sequence(lit(1), to), i => concat(lit("zzq"), col("doc_id"), lit("x"), i)))
    val prepped = base
      .withColumn("__textB", concat_ws(" ", col("text"), extras(k)))
      .withColumn("__textC", concat_ws(" ", col("text"), extras(k * 2)))
    val planted2 = base
      .unionByName(prepped.select((col("doc_id") + 10000).as("doc_id"), col("__textC").as("text")))
      .unionByName(prepped.select((col("doc_id") + 20000).as("doc_id"), col("__textB").as("text")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("q38-small planted materialize") { println(s"[perf]   planted: ${planted2.count()}") }
    time("q38-small full pipeline (3 tables)") {
      val v2 = Dedup.verifyPairs(
        Dedup.minHashNearDups(planted2, "doc_id", "text", maxJaccardDistance = 0.2,
          numHashTables = 3),
        planted2, "doc_id", "text", 0.8)
        .select("id1", "id2").persist(StorageLevel.MEMORY_AND_DISK)
      v2.count()
      Dedup.connectedComponents(v2).count()
      v2.unpersist()
    }
    planted2.unpersist()

    // ---- q39 variants
    def q39Variant(label: String, corpusCap: Int, plantCap: Int): Unit = {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).filter(col("vec_id") < corpusCap)
      val noisy = emb.filter(col("vec_id") < plantCap)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => (x * (lit(1.0) + lit(0.1) * sin(col("vec_id") * 7919 + i * 104729))).cast("float")))
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val all = emb.unionByName(noisy).persist(StorageLevel.MEMORY_AND_DISK)
      all.count()
      time(s"q39 $label lshNearDupPairs") {
        val pairs = graft.llm.Similarity.lshNearDupPairs(all,
          maxCosineDistance = 0.05, bucketLength = 0.02)
        val planted = pairs.filter(col("id2") - col("id1") === 100000).count()
        println(s"[perf]   planted found: $planted / $plantCap")
      }
      all.unpersist()
    }
    q39Variant("1000/500 (current)", 1000, 500)
    q39Variant("500/500 (no extra naturals)", 500, 500)
    q39Variant("600/300", 600, 300)
    spark.stop()
  }
}
