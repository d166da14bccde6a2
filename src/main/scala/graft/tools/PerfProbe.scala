package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway-style perf probe for round-3 tuning experiments (kept in
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
    // warmup both machineries
    graft.SparkEntry.queries("q19_stream_window")(spark, sfDir).write.format("noop").mode("overwrite").save()
    graft.SparkEntry.queries("q25_ivf_recall")(spark, sfDir).write.format("noop").mode("overwrite").save()

    for (parts <- Seq(2, 4, 8)) {
      time(s"q19 shufflePartitions=$parts") {
        val name = s"perf_q19_$parts"
        graft.streaming.Streams.runToMemory(
          graft.streaming.Streams.windowedEventStats(
            graft.streaming.Streams.readEventStream(spark, sfDir, "events.parquet"),
            windowLength = "1 hour", watermarkDelay = "2 hours"),
          name, org.apache.spark.sql.streaming.OutputMode.Append(),
          shufflePartitions = Some(parts))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (iter <- Seq(3, 5, 8)) {
      var mean = Double.NaN
      time(s"q25 maxIter=$iter") {
        val r = graft.llm.Similarity.ivfRecallVsBrute(
          emb.filter(col("vec_id") < 20), emb, k = 10, numCells = 16, nprobe = 8,
          maxIter = iter).cache()
        try mean = r.agg(avg("recall")).head().getDouble(0)
        finally r.unpersist()
      }
      println(f"[perf] q25 maxIter=$iter mean recall: $mean%.4f")
    }
    spark.stop()
  }
}
