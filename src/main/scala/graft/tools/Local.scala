package graft.tools

import org.apache.spark.sql.SparkSession

/** One local-session builder for every tool/main — the five entry points
  * had each hand-copied the config and already drifted (missing
  * timeZone or nanosAsLong in some), which silently changes results for
  * timestamp-bearing reads. */
object Local {
  def session(cpus: String, logLevel: String = "WARN"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // harmless for the current us-precision testdata; keeps a
      // ns-precision source readable (as raw longs) rather than failing
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }
}
