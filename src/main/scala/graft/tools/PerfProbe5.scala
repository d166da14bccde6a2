package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

/** Round-6 probe: job/stage accounting for one q62 pass. Counts Spark
  * jobs, stages, tasks and sums task runtimes — if wall time >> summed
  * task time, the cost is DAG scheduling/planning, not execution. */
object PerfProbe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Seq("q1_pricing_summary", "q6_join_agg", "q15_knn_brute").foreach { q =>
      noop(graft.SparkEntry.queries(q)(spark, sfDir))
    }
    noop(graft.SparkEntry.queries("q62_incremental_vector_dedup")(spark, sfDir))

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    noop(graft.SparkEntry.queries("q62_incremental_vector_dedup")(spark, sfDir))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener drain
    println(f"[probe5] q62: wall=$wall%.2f s jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskMs / 1000.0}%.2f s")

    jobs = 0; stages = 0; tasks = 0; taskMs = 0L
    val t1 = System.nanoTime()
    noop(graft.SparkEntry.queries("q73_semdedup")(spark, sfDir))
    val wall2 = (System.nanoTime() - t1) / 1e9
    Thread.sleep(500)
    println(f"[probe5] q73: wall=$wall2%.2f s jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskMs / 1000.0}%.2f s")

    // ---- q62 sub-step job accounting
    def acct(label: String)(body: => Unit): Unit = {
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L
      val s0 = System.nanoTime()
      body
      val w = (System.nanoTime() - s0) / 1e9
      Thread.sleep(300)
      println(f"[probe5] $label: wall=$w%.2f s jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskMs / 1000.0}%.2f s")
    }
    import graft.llm.{Dedup, Similarity}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 1000)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val stateDir = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_state"),
      s"${sfDir.replaceAll("[^A-Za-z0-9.-]", "_")}_q62_sigs").toString
    val sigs = spark.read.parquet(s"$stateDir/data")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    acct("q62/sigs persist")(sigs.count())
    val hot = Dedup.simHashHotBuckets(sigs)
    acct("q62/hot noop")(noop(hot))
    val echoes = corpus.filter(col("vec_id") < 100)
      .select((col("vec_id") + 30000).as("vec_id"),
        transform(col("embedding"), x => (x * 0.5f).cast("float")).as("embedding"))
    val batch = emb.filter(col("vec_id") % 2 === 1).unionByName(echoes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    acct("q62/batch persist")(batch.count())
    val batchSigs = Similarity.srpSignatures(batch)
    acct("q62/batchSigs noop")(noop(batchSigs))
    val seen = Similarity.srpNearDupsAgainst(batchSigs, sigs, 0.99, 4, 10000, Some(hot))
      .select(col("batch_id").as("vec_id")).distinct()
    acct("q62/seen(corpus tier) noop")(noop(seen))
    val fresh = batch.join(seen, Seq("vec_id"), "left_anti")
    acct("q62/fresh anti noop")(noop(fresh))
    val full = Similarity.dropSeenVectors(batch, sigs, corpusHotBuckets = Some(hot))
    acct("q62/full dropSeenVectors noop")(noop(full))
    sigs.unpersist(); batch.unpersist()
    spark.stop()
  }
}
