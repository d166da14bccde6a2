package graft

import graft.conf.GraftConfig
import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  val doc =
    """# pipeline config (reference README.md:76-152 shape)
      |source {
      |  storage-type = local
      |  dataset-dir = "/tmp/in"
      |  dataset-store-format = parquet
      |  sample = 0.5
      |  limit: 100
      |}
      |target {
      |  storage-type = hive
      |  table = out_table
      |  partition-by = [business_dt, region]
      |}
      |spark {
      |  spark.executor.memory = 4g
      |  spark.sql.shuffle.partitions = 32
      |}
      |paths { base = "/data", derived = ${paths.base}"/x" }
      |""".stripMargin

  test("parses nested objects into dotted paths") {
    val c = GraftConfig.parse(doc)
    assert(c.string("source.storage-type") == "local")
    assert(c.string("source.dataset-dir") == "/tmp/in")
    assert(c.getInt("source.limit").contains(100))
    assert(c.getDouble("source.sample").contains(0.5))
    assert(c.string("spark.spark.executor.memory") == "4g")
  }

  test("lists parse") {
    val c = GraftConfig.parse(doc)
    assert(c.getList("target.partition-by").contains(Seq("business_dt", "region")))
  }

  test("empty unquoted list elements are rejected; quoted empties parse") {
    intercept[IllegalArgumentException] { GraftConfig.parse("k = [a,,b]") }
    assert(GraftConfig.parse("""k = [a, "", b]""").getList("k").contains(Seq("a", "", "b")))
    // trailing comma stays legal (common HOCON style)
    assert(GraftConfig.parse("k = [a, b,]").getList("k").contains(Seq("a", "b")))
  }

  test("substitution resolves") {
    val c = GraftConfig.parse(doc)
    assert(c.string("paths.derived") == "/data/x")
  }

  test("CLI overrides win via withFallback (reference scorer.py:71-76)") {
    val base = GraftConfig.parse(doc)
    val merged = GraftConfig.fromOverrides(Seq("source.limit=7", "source.new-key=v")).withFallback(base)
    assert(merged.getInt("source.limit").contains(7))
    assert(merged.string("source.new-key") == "v")
    assert(merged.string("source.storage-type") == "local") // untouched keys survive
  }

  test("at() re-bases a subtree") {
    val src = GraftConfig.parse(doc).at("source")
    assert(src.string("storage-type") == "local")
    assert(!src.has("target.table"))
  }

  test("comments and blank lines are ignored") {
    val c = GraftConfig.parse("a = 1 # trailing\n// full line\n\nb: two words\n")
    assert(c.getInt("a").contains(1))
    assert(c.string("b") == "two words")
  }
}
