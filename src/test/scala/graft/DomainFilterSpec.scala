package graft

import org.apache.spark.sql.functions._
import graft.llm.DomainFilter

class DomainFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("normalizeDomain strips scheme, path, query, port, one www") {
    val got = Seq(
      "https://www.Example.COM/path?q=1#frag",
      "http://sub.example.org:8080/x",
      "ftp://files.example.net",
      "example.com",
      "www.www.example.com", // only ONE leading www strips
      "  https://spaced.example.com/  ").toDF("d")
      .select(DomainFilter.normalizeDomain(col("d"))).as[String].collect().toSeq
    assert(got == Seq("example.com", "sub.example.org", "files.example.net",
      "example.com", "www.example.com", "spaced.example.com"))
    // null-safe: null in, null out
    val n = Seq[Option[String]](None).toDF("d")
      .select(DomainFilter.normalizeDomain(col("d"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("domainChain emits every parent suffix, most-specific first") {
    val got = Seq("a.b.co.uk").toDF("d")
      .select(DomainFilter.domainChain(col("d"))).as[Seq[String]].head()
    assert(got == Seq("a.b.co.uk", "b.co.uk", "co.uk", "uk"))
    assert(Seq("single").toDF("d")
      .select(DomainFilter.domainChain(col("d"))).as[Seq[String]].head() == Seq("single"))
  }

  test("block mode: exact and parent-suffix hits drop; allow mode inverts; " +
      "matchParents=false blocks only exact") {
    val docs = Seq(
      (1L, "https://spam.example.com/x"), // parent of blocked example.com
      (2L, "http://example.com"),         // exact
      (3L, "https://fine.example.org"),   // unlisted
      (4L, "notexample.com")              // NOT a suffix match (no dot boundary)
    ).toDF("doc_id", "url")
    val block = Seq("example.com").toDF("domain")
    val blocked = DomainFilter.filterByDomains(docs, "doc_id", "url", block)
      .select("doc_id").as[Long].collect().toSet
    assert(blocked == Set(3L, 4L), s"survivors: $blocked")
    val allowed = DomainFilter.filterByDomains(docs, "doc_id", "url", block, mode = "allow")
      .select("doc_id").as[Long].collect().toSet
    assert(allowed == Set(1L, 2L))
    val exactOnly = DomainFilter.filterByDomains(docs, "doc_id", "url", block,
      matchParents = false).select("doc_id").as[Long].collect().toSet
    assert(exactOnly == Set(1L, 3L, 4L), "only the exact match drops without parents")
    intercept[IllegalArgumentException] {
      DomainFilter.filterByDomains(docs, "doc_id", "url", block, mode = "oops")
    }
  }

  test("list entries are normalized too — raw URLs in a blocklist still match") {
    val docs = Seq((1L, "spam.example.com"), (2L, "ok.example.org")).toDF("doc_id", "url")
    val rawList = Seq("https://www.example.com/landing").toDF("domain")
    val kept = DomainFilter.filterByDomains(docs, "doc_id", "url", rawList)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("filterByTlds is a scan predicate on the last label; null domains drop") {
    val docs = Seq(
      (1L, Some("https://a.example.xxx/p")),
      (2L, Some("b.example.org")),
      (3L, None: Option[String]),
      (4L, Some("xxx.example.org")) // 'xxx' as a LABEL, not the TLD
    ).toDF("doc_id", "url")
    val kept = DomainFilter.filterByTlds(docs, "url", Seq(".XXX", "zip"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L), s"survivors: $kept")
    intercept[IllegalArgumentException] {
      DomainFilter.filterByTlds(docs, "url", Seq("co.uk")) // multi-label
    }
  }

  test("loadDomainList skips comments/blanks; list join is broadcast in-plan") {
    val f = java.nio.file.Files.createTempFile("graft_blocklist", ".txt")
    java.nio.file.Files.write(f,
      "# UT1-style list\nexample.com\n\nbad.example.org\n".getBytes("UTF-8"))
    val list = DomainFilter.loadDomainList(spark, f.toString)
    assert(list.as[String].collect().toSet == Set("example.com", "bad.example.org"))
    val docs = Seq((1L, "x.example.com"), (2L, "good.org")).toDF("doc_id", "url")
    val out = DomainFilter.filterByDomains(docs, "doc_id", "url", list)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"list side must broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"suffix matching must stay equi-join (chain explode), never nested-loop:\n$plan")
  }
}
