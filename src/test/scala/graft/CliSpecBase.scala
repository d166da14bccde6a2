package graft

import java.nio.file.{Files, Path}
import graft.cli.Cli
import graft.conf.GraftConfig

/** Shared helpers for the CLI e2e shards. ONE suite (CliSpec) held all
  * 88 CLI tests until r16; at ~1,250 s it was the longest pole of the
  * whole forked-group test run (the r15 verify's `sbt test` window ran
  * right up against the runner's budget and exited non-zero). The tests
  * were always independent (each builds its own tmp dirs and configs),
  * so they now run as four ~310 s shards pinned to different forked
  * groups. No test body changed.
  */
trait CliSpecBase extends SparkTestBase {

  private[graft] def tmp(): Path = Files.createTempDirectory("graft-cli")

  private[graft] def write(path: Path, text: String): String = {
    Files.writeString(path, text)
    path.toString
  }

  private[graft] def dirChecksums(dir: String): Map[String, String] = {
    val root = java.nio.file.Paths.get(dir)
    val md = java.security.MessageDigest.getInstance("MD5")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith(".")) // ignore CRC sidecars
      .map { p =>
        md.reset()
        root.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }
}
