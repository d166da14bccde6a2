ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`.
// Bench prints its compact JSON as its final act (after spark.stop()),
// but sbt's own `[success] Total time: …` epilogue printed after it kept
// BENCH_r{7..10}.json parse-dead. Suppress the epilogue globally, and
// pass the forked process's stdout through UNPREFIXED (the default
// LoggedOutput strategy stamps every line with `[info] `, which would
// leave the tail line as `[info] {...}` — not bare JSON).
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-setting lint so builds stay warning-free.
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Parallel forked test groups (round-10 verdict item 8: `sbt test` was
// 17 m of strictly sequential suites; round-16: the 4-group layout's
// long pole was the unsplit 1,250 s CliSpec — the whole run sat right
// at the verify runner's budget and exited non-zero). Suites partition
// into 8 groups, each a SEPARATE forked JVM with its own Spark session,
// its own warehouse/derby dirs (DataIOHolesSpec's catalog-table tests
// must not share a metastore across concurrent JVMs), and — new in r16
// — its OWN java.io.tmpdir: SparkEntry's statePath cache, the oracle
// aux dumps, and every CLI test's temp roots all live under tmpdir, so
// per-group tmpdirs are what make the CliSpec/EntryRunAll shards safe
// to run concurrently. Suites within a group stay sequential, so
// nothing shares a SparkSession concurrently. Heavy suites are pinned
// from the r15 JUnit timings to balance groups at ~8 min each;
// unlisted suites hash into a group. Each JVM runs local[4], so 8
// groups use the box's 32 cores.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  val tgt = target.value
  val n = 8
  val pinned = Map(
    "graft.CliSpec" -> 0, "graft.WordPieceSpec" -> 0,
    "graft.CliSpecB" -> 1, "graft.StreamsSpec" -> 1,
    "graft.CliSpecC" -> 2, "graft.DedupSpec" -> 2, "graft.CorpusPrepSpec" -> 2,
    "graft.CliSpecD" -> 3, "graft.CurationSpec" -> 3, "graft.AsofRangeJoinSpec" -> 3,
    "graft.SimilaritySpec" -> 4, "graft.BpeSpec" -> 4,
    "graft.EntryRunAllSpecA" -> 5, "graft.PropertySpec" -> 5,
      "graft.TextAnalysisSpec" -> 5,
    "graft.EntryRunAllSpecB" -> 6, "graft.MultimodalSpec" -> 6,
      "graft.EntrySpec" -> 6,
    "graft.EntryRunAllSpecC" -> 7, "graft.EntryRunAllSpecD" -> 7,
      "graft.LangModelSpec" -> 7)
  tests.groupBy(t => pinned.getOrElse(t.name, math.abs(t.name.hashCode) % n))
    .toSeq.sortBy(_._1).map { case (i, ts) =>
      val tmpDir = tgt / s"tmp-g$i"
      IO.createDirectory(tmpDir)
      val opts = baseOpts ++ Vector(
        s"-Dspark.sql.warehouse.dir=${(tgt / s"spark-warehouse-g$i").getAbsolutePath}",
        s"-Dderby.system.home=${(tgt / s"derby-g$i").getAbsolutePath}",
        s"-Djava.io.tmpdir=${tmpDir.getAbsolutePath}")
      Tests.Group(s"g$i", ts.sortBy(_.name),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8), Tags.limitAll(32))
