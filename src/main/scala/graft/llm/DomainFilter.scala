package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level corpus gating — the stage every production
  * web-corpus pipeline runs BEFORE touching text (UT1-style blocklists,
  * TLD heuristics; e.g. CCNet/RefinedWeb drop blocklisted domains ahead
  * of any text processing, Penedo et al. 2023, arXiv:2306.01116).
  * Metadata filtering is the cheapest gate in the pipeline: it reads
  * one short column, so running it first means redact/boilerplate/dedup
  * and every signature in the persisted state only ever see admitted
  * documents.
  *
  * 100 TB shape: the list side is a broadcast (UT1-class lists are
  * millions of rows — MBs); the document side explodes each domain into
  * its parent chain (bounded by label count, ≤ ~10 rows/doc) and
  * equi-joins — never a per-row scan of the list, never a non-equi
  * join. The id-level anti/semi join back is AQE-broadcast when the hit
  * set is small. TLD gating is a pure scan predicate.
  */
object DomainFilter {

  /** Registrable-host normalization for URL-or-domain columns:
    * lowercase, scheme/path/query/fragment/port stripped, one leading
    * `www.` stripped. Pure `regexp_replace` chain — replayable in ANSI
    * SQL, pushdown-friendly, null-safe (null in → null out, which no
    * list matches). */
  def normalizeDomain(c: Column): Column = {
    val noScheme = regexp_replace(lower(trim(c)), "^[a-z][a-z0-9+.-]*://", "")
    val noPath = regexp_replace(noScheme, "[/?#].*$", "")
    val noPort = regexp_replace(noPath, ":[0-9]+$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Full-URL canonicalization for URL-keyed dedup (RefinedWeb
    * deduplicates fetched pages by URL before any text processing —
    * Penedo et al. 2023): one normative, SQL-replayable rewrite so
    * that the same page fetched under trivially-different spellings
    * keys identically. Steps, in order:
    *
    *  1. trim; cut the `#fragment`;
    *  2. no `scheme://` → returned as-is (not a URL — never guess);
    *  3. scheme and host lowercase (path/query case is significant and
    *     stays); ONE leading `www.` stripped; the scheme's default
    *     port stripped (`:80` for http, `:443` for https — others are
    *     real distinctions and stay);
    *  4. `utm_*` tracking parameters and empty params dropped from the
    *     query, remaining params in their original order (reordering
    *     would be a semantic claim; tracking-stripping is the
    *     published hygiene); an emptied query drops its `?`;
    *  5. trailing `/` runs on the path stripped (`…/a/` == `…/a`,
    *     host-root `…com/` == `…com`).
    *
    * Pure built-in composition (regex chain + higher-order array ops,
    * no backreferences) — codegen'd for free and replayed verbatim by
    * the q123 oracle in RE2. Null in → null out. */
  def normalizeUrl(c: Column): Column = {
    val t = regexp_replace(trim(c), "#.*$", "")
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(t, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostRaw = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val hostNoWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val rem = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(regexp_replace(rem, "\\?.*$", ""), "/+$", "")
    val query = regexp_replace(rem, "^[^?]*\\??", "")
    val keptParams = array_join(
      filter(split(query, "&"),
        p => p =!= "" && !p.startsWith("utm_")), "&")
    val tail = concat(path,
      when(keptParams =!= "", concat(lit("?"), keptParams)).otherwise(lit("")))
    when(scheme === "", t)
      .otherwise(concat(scheme, lit("://"), host, tail))
  }

  /** URL-keyed exact dedup, first occurrence wins: one survivor per
    * [[normalizeUrl]] key — the row with the smallest `idCol` — with
    * the canonical URL attached as `url_norm`. Rows whose URL column
    * is null pass through (no key to collide on). One shuffle on the
    * canonical key. */
  def dedupByUrl(
      df: DataFrame,
      idCol: String,
      urlCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url_norm")).orderBy(col(idCol))
    df.withColumn("url_norm", normalizeUrl(col(urlCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("url_norm").isNull || col("__rn") === 1)
      .drop("__rn")
  }

  /** The parent-suffix chain of a normalized domain:
    * `a.b.c → [a.b.c, b.c, c]` — how "block example.com" also blocks
    * `sub.example.com` with pure equi-joins. Bounded by the label
    * count. */
  def domainChain(c: Column): Column = {
    val parts = split(c, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
  }

  /** Drop (`mode = "block"`) or keep (`mode = "allow"`) documents whose
    * normalized domain — or, with `matchParents`, any parent suffix —
    * appears in `domains` (one `domain` column; normalized here, so raw
    * lists work). `idCol` must uniquely key rows (it maps the exploded
    * chain back). */
  def filterByDomains(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      domains: DataFrame,
      mode: String = "block",
      matchParents: Boolean = true): DataFrame = {
    require(Set("block", "allow").contains(mode),
      s"domain filter mode must be block|allow, got '$mode'")
    val norm = normalizeDomain(col(domainCol))
    val chain = if (matchParents) domainChain(norm) else array(norm)
    val exploded = df.select(col(idCol).as("__fid"), explode(chain).as("__dom"))
    val listed = domains.select(normalizeDomain(col("domain")).as("__dom"))
    val hitIds = exploded.join(broadcast(listed), Seq("__dom"), "left_semi")
      .select(col("__fid").as(idCol)).distinct()
    mode match {
      case "block" => df.join(hitIds, Seq(idCol), "left_anti")
      case "allow" => df.join(hitIds, Seq(idCol), "left_semi")
    }
  }

  /** Drop documents whose normalized domain ends in one of
    * `blockedTlds` (compared against the LAST label, dots optional in
    * the input). Scan predicate — no join at all. */
  def filterByTlds(
      df: DataFrame,
      domainCol: String,
      blockedTlds: Seq[String]): DataFrame = {
    require(blockedTlds.nonEmpty, "blockedTlds must be non-empty")
    val cleaned = blockedTlds.map(_.trim.toLowerCase.stripPrefix("."))
    cleaned.foreach(t => require(t.nonEmpty && !t.contains("."),
      s"blocked TLD must be a single label, got '$t'"))
    val tld = substring_index(normalizeDomain(col(domainCol)), ".", -1)
    df.filter(col(domainCol).isNotNull && !tld.isin(cleaned: _*))
  }

  /** Read a text blocklist (one domain per line; blank lines and
    * `#` comments skipped) — the UT1/adblock file convention. Returns a
    * one-column `domain` frame for [[filterByDomains]]. */
  def loadDomainList(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("domain"))
      .filter(length(col("domain")) > 0 && !col("domain").startsWith("#"))
}
