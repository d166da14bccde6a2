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

  test("normalizeUrl: scheme/host lowercase, fragment cut, default port and " +
      "one www stripped, utm params dropped in place, trailing slash runs " +
      "cut, non-URLs pass through, null stays null") {
    import spark.implicits._
    val cases = Seq(
      // (raw, expected)
      ("HTTP://WWW.Example.COM:80/Path/To/Page", "http://example.com/Path/To/Page"),
      ("https://example.com:443/a/", "https://example.com/a"),
      ("https://example.com:8443/a", "https://example.com:8443/a"),
      ("http://example.com:80", "http://example.com"),
      ("https://example.com/a?utm_source=x&id=7&utm_campaign=y", "https://example.com/a?id=7"),
      ("https://example.com/a?utm_source=x&utm_campaign=y", "https://example.com/a"),
      ("https://example.com/a?b=2&a=1", "https://example.com/a?b=2&a=1"), // order kept
      ("https://example.com/a#section-3", "https://example.com/a"),
      ("https://example.com///", "https://example.com"),
      ("  https://example.com/a  ", "https://example.com/a"),
      ("https://sub.www.example.com/a", "https://sub.www.example.com/a"), // only LEADING www
      ("ftp://Files.Example.com/X", "ftp://files.example.com/X"),
      ("not a url at all", "not a url at all"),
      ("example.com/path", "example.com/path"), // no scheme -> untouched
      ("https://example.com/a?&&id=7&", "https://example.com/a?id=7") // empty params dropped
    )
    val got = cases.map(_._1).toDF("url")
      .select(DomainFilter.normalizeUrl(col("url")).as("n"))
      .collect().map(_.getString(0)).toSeq
    cases.zip(got).foreach { case ((raw, want), g) =>
      assert(g == want, s"normalizeUrl('$raw') = '$g', want '$want'")
    }
    assert(Seq((1, null: String)).toDF("i", "url")
      .select(DomainFilter.normalizeUrl(col("url"))).head().isNullAt(0))
  }

  test("dedupByUrl: one survivor per canonical URL (smallest id), null urls " +
      "pass through, url_norm attached") {
    import spark.implicits._
    val docs = Seq(
      (3L, "https://example.com/a?utm_source=x"),
      (1L, "HTTP://WWW.Other.COM/b"),
      (2L, "https://example.com/a"),          // same canonical as 3
      (4L, "https://other.com/b"),            // DIFFERENT scheme than 1 -> distinct
      (5L, null: String),
      (6L, null: String)
    ).toDF("doc_id", "url")
    val out = DomainFilter.dedupByUrl(docs, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L, 6L),
      s"smallest id per canonical URL must win, nulls pass: ${out.keySet}")
    assert(out(2L).contains("https://example.com/a"))
    assert(out(1L).contains("http://other.com/b"))
    assert(out(4L).contains("https://other.com/b"))
  }
}
