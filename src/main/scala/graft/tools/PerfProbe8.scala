package graft.tools

import org.apache.spark.sql.functions._

/** Quantify the hot-bucket upkeep change: per-commit cost of deriving
  * the hot tables from the FULL signature union (the old path: band
  * every corpus signature, shuffle, count) vs merging the persisted
  * cumulative bucket counts with one batch's pre-aggregated counts
  * (the new path). Synthetic corpus so the signature count scales
  * beyond what sf0.1 holds: `SPARK_GRAFT_PROBE8_CORPUS` signatures
  * (default 5M) against a `SPARK_GRAFT_PROBE8_BATCH` batch (default
  * 50k), bands = 4 → a counts table capped at 4·2^16 rows. */
object PerfProbe8 {
  def main(args: Array[String]): Unit = {
    val corpusN = sys.env.getOrElse("SPARK_GRAFT_PROBE8_CORPUS", "5000000").toLong
    val batchN = sys.env.getOrElse("SPARK_GRAFT_PROBE8_BATCH", "50000").toLong
    val s = Local.session("32")
    import graft.llm.Dedup
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe8] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val base = java.nio.file.Files.createTempDirectory("probe8").toString
    // synthetic signatures: xxhash64 of the id is as uniform as SimHash
    // bits over real text for banding purposes
    def sigs(n: Long, seed: Int) = s.range(n)
      .select(col("id"), xxhash64(col("id"), lit(seed)).as("sig"))
    timed(s"write corpus sigs ($corpusN)") {
      sigs(corpusN, 1).write.mode("overwrite").parquet(s"$base/sigs")
    }
    val corpus = s.read.parquet(s"$base/sigs")
    timed("write cumulative counts (once)") {
      Dedup.bucketCounts(corpus, 4).write.mode("overwrite").parquet(s"$base/counts")
    }
    val prior = s.read.parquet(s"$base/counts")
    val batch = sigs(batchN, 2)
    // old path: re-band the full union every commit
    val oldHot = timed("OLD: hot from full sig union") {
      val h = Dedup.simHashHotBuckets(corpus.unionByName(batch), 4, 100)
      println(s"  hot keys=${h.count()}"); h
    }
    // new path: batch counts + bounded-table merge
    val newHot = timed("NEW: hot from counts merge") {
      val h = Dedup.hotFromCounts(Dedup.mergeBucketCounts(
        prior.unionByName(Dedup.bucketCounts(batch, 4))), 100)
      println(s"  hot keys=${h.count()}"); h
    }
    val diff = oldHot.unionByName(newHot)
      .groupBy("band", "bits").count().filter(col("count") =!= 2).count()
    println(s"[probe8] hot-set symmetric difference = $diff (must be 0)")
    println(s"[probe8] counts table rows = ${prior.count()} (bounded by 4*2^16 = ${4 << 16})")
    s.stop()
  }
}
