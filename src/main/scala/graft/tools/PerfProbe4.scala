package graft.tools

import org.apache.spark.sql.functions._

/** Round-6 probe: where does a single q62/q73 pass spend its ~3 s at
  * sf0.1, given that the marker-gated state cache (r5 verdict #3)
  * removed the state-construction cost but the wall time barely moved?
  * Decomposes each query into its dataflow stages and times them
  * individually (warm JVM, warm state). */
object PerfProbe4 {
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

    // warmup
    Seq("q1_pricing_summary", "q6_join_agg", "q15_knn_brute").foreach { q =>
      noop(graft.SparkEntry.queries(q)(spark, sfDir))
    }
    // warm the state markers
    noop(graft.SparkEntry.queries("q62_incremental_vector_dedup")(spark, sfDir))
    noop(graft.SparkEntry.queries("q73_semdedup")(spark, sfDir))

    // ---- q62 whole, then stages
    (1 to 2).foreach { i =>
      time(s"q62 whole pass $i") {
        noop(graft.SparkEntry.queries("q62_incremental_vector_dedup")(spark, sfDir))
      }
    }
    import graft.llm.{Dedup, Similarity}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 1000)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val stateDir = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_state"),
      s"${sfDir.replaceAll("[^A-Za-z0-9.-]", "_")}_q62_sigs").toString
    val sigs0 = spark.read.parquet(s"$stateDir/data")
    time("q62/a state read+persist+count") {
      sigs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    }
    val hot = Dedup.simHashHotBuckets(sigs0)
    time("q62/b hotBuckets materialize") { noop(hot) }
    val echoes = corpus.filter(col("vec_id") < 100)
      .select((col("vec_id") + 30000).as("vec_id"),
        transform(col("embedding"), x => (x * 0.5f).cast("float")).as("embedding"))
    val batch = emb.filter(col("vec_id") % 2 === 1).unionByName(echoes)
    time("q62/c batch persist+count") {
      batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    }
    val dropped = Similarity.dropSeenVectors(batch, sigs0, corpusHotBuckets = Some(hot))
    time("q62/d dropSeenVectors materialize") { noop(dropped) }
    time("q62/e final groupBy+summary") {
      noop(dropped.groupBy(when(col("vec_id") >= 30000, "echo")
        .otherwise("fresh").as("cohort")).agg(count(lit(1)).as("n_survivors")))
    }
    sigs0.unpersist(); batch.unpersist()

    // ---- q73 whole, then stages
    (1 to 2).foreach { i =>
      time(s"q73 whole pass $i") {
        noop(graft.SparkEntry.queries("q73_semdedup")(spark, sfDir))
      }
    }
    val emb2 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 100000L)
    val rescaled = emb2.filter(col("vec_id") < 30)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => (x * 2.0f).cast("float")).as("embedding"))
    val noisy = emb2.filter(col("vec_id") < 30)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    val corpus2 = emb2.unionByName(rescaled).unionByName(noisy)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("q73/a corpus persist+count") { corpus2.count(); () }
    val ivfDir = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_state"),
      s"${sfDir.replaceAll("[^A-Za-z0-9.-]", "_")}_q73_ivf").toString
    var model: org.apache.spark.ml.clustering.KMeansModel = null
    var tagged: org.apache.spark.sql.DataFrame = null
    time("q73/b ivfLoad (model+corpus read)") {
      val mt = Similarity.ivfLoad(spark, ivfDir)
      model = mt._1; tagged = mt._2
      tagged.count(); ()
    }
    var surv: org.apache.spark.sql.DataFrame = null
    time("q73/c semDedupWithIndex") {
      surv = Similarity.semDedupWithIndex(corpus2, model, tagged,
        minCosine = 0.99, keepPolicy = "far-from-centroid")
    }
    time("q73/d final groupBy+summary") {
      noop(surv.groupBy(when(col("vec_id") < 30 || col("vec_id") >= 100000L, "triple")
        .otherwise("untouched").as("vec_class"))
        .agg(count(lit(1)).as("n")))
    }
    corpus2.unpersist()
    spark.stop()
  }
}
