package graft.tools

import org.apache.spark.scheduler._

/** Round-6 probe: top stages by summed task time for one q62 and one
  * q73 pass — names the actual compute sink that job-count accounting
  * (PerfProbe5) cannot see. */
object PerfProbe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Seq("q1_pricing_summary", "q6_join_agg", "q15_knn_brute").foreach { q =>
      noop(graft.SparkEntry.queries(q)(spark, sfDir))
    }
    noop(graft.SparkEntry.queries("q62_incremental_vector_dedup")(spark, sfDir))
    noop(graft.SparkEntry.queries("q73_semdedup")(spark, sfDir))

    val stages = scala.collection.concurrent.TrieMap.empty[Int, (String, Long, Int)]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (s <- si.submissionTime; e <- si.completionTime) yield e - s).getOrElse(0L)
        stages(si.stageId) = (si.name.take(120), dur, si.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def top(label: String)(body: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[probe6] ==== $label wall=$wall%.2f s, ${stages.size} stages; top by stage wall-duration:")
      stages.toSeq.sortBy(-_._2._2).take(12).foreach { case (id, (name, dur, nt)) =>
        println(f"[probe6]   stage $id%4d dur=${dur / 1000.0}%6.2f s tasks=$nt%4d  $name")
      }
    }
    top("q62")(noop(graft.SparkEntry.queries("q62_incremental_vector_dedup")(spark, sfDir)))
    top("q73")(noop(graft.SparkEntry.queries("q73_semdedup")(spark, sfDir)))
    spark.stop()
  }
}
