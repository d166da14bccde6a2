package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for LLM-training-data curation (north-star extension,
  * SURVEY.md §7.6): token counting, quality scoring, language
  * identification, document fingerprinting.
  *
  * Everything is a Catalyst column expression (built-ins + higher-order
  * functions, zero UDFs) so analysis stays inside whole-stage codegen
  * and scales as a pure map — no shuffle, no driver involvement, no
  * Python workers. On 100 TB these run at parquet-scan speed.
  */
object TextAnalysis {

  // ------------------------------------------------------------ tokens

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    size(filter(split(trim(c), "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count: letter runs split at length 4 (≈ one BPE
    * merge depth), digit runs per char, punctuation per char — a cheap
    * deterministic proxy for a trained tokenizer's token count. For
    * REAL subword counts from a published merge table, use
    * [[bpeTokenCount]]. */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit("[\\p{L}]{1,4}|[\\p{N}]|[^\\p{L}\\p{N}\\s]"))

  /** Real BPE subword count from a config-loaded merge table
    * (`merges.txt` format; loaded once per executor JVM, memoized per
    * pretoken, codegen'd — see `graft.functions.BpeCount`). With a
    * trained tokenizer's table this makes `n_tokens` match the actual
    * training tokenizer instead of the [[bpeishTokenCount]] heuristic. */
  def bpeTokenCount(c: Column, mergesPath: String): Column =
    graft.functions.GraftFunctions.bpeCount(c, mergesPath)

  /** Characters that are neither word-chars nor whitespace. */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[\\p{L}\\p{N}\\s]", ""))

  /** Mean token length over non-space characters. */
  def meanTokenLength(c: Column): Column = {
    val n = wsTokenCount(c)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s", "")).cast("double") / n)
  }

  // ----------------------------------------------------------- quality

  /** Tiny per-language stopword profiles (top function words). Public
    * knowledge; intentionally small — presence counts, not coverage. */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "ich", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "des", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que", "de", "por"),
    "pt" -> Seq("o", "os", "do", "da", "em", "e", "que", "um", "uma", "para"),
    "it" -> Seq("il", "di", "che", "e", "la", "per", "non", "sono", "con", "una"),
    "nl" -> Seq("de", "het", "een", "en", "van", "ik", "dat", "niet", "op", "te"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "с", "это", "он", "как"),
  )

  /** Fraction of tokens that are stopwords of `lang` — high for natural
    * prose, near zero for boilerplate/code/garbage. Languages without a
    * profile (incl. langId's own "zh"/"unknown" outputs) score 0 rather
    * than throwing. */
  def stopwordRatio(c: Column, lang: String = "en"): Column =
    StopwordProfiles.get(lang) match {
      case None | Some(Nil) => lit(0.0)
      case Some(stops) =>
        val toks = Dedup.tokens(c)
        val hits = size(filter(toks, t => t.isin(stops: _*)))
        when(size(toks) === 0, lit(0.0))
          .otherwise(hits.cast("double") / size(toks))
    }

  /** Composite quality score in [0,1]: length sufficiency (40%),
    * stopword presence (40%), punctuation sanity (20%). Deterministic
    * arithmetic only — filterable at scan time. */
  def qualityScore(c: Column, lang: String = "en"): Column = {
    val lengthScore = least(wsTokenCount(c).cast("double") / 20.0, lit(1.0))
    val stopScore = least(stopwordRatio(c, lang) * 5.0, lit(1.0))
    val punctRatio = when(length(c) === 0, lit(0.0))
      .otherwise(punctCount(c).cast("double") / length(c))
    val punctScore = greatest(lit(1.0) - punctRatio * 4.0, lit(0.0))
    round(lengthScore * 0.4 + stopScore * 0.4 + punctScore * 0.2, 6)
  }

  // ----------------------------------------------------------- lang id

  /** Language ID by stopword-profile voting plus a CJK character check:
    * returns the profile code with the most distinct stopword hits
    * ("und" beats "the"), `zh` when CJK chars dominate, `unknown` when
    * nothing matches. Ties break lexicographically (deterministic). */
  def langId(c: Column): Column = {
    val toks = array_distinct(Dedup.tokens(c))
    val scored = StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      struct(size(array_intersect(toks, array(stops.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    val cjk = regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]"))
    when(cjk > length(c) / 4, lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("unknown"))
  }

  // ----------------------------------------------- single-pass fast path

  /** One-pass stats struct (`graft.functions.TextStats`): every counter
    * the metrics above need, from a single byte scan — use on hot scan
    * paths where the composable forms' repeated tokenization costs.
    * Counters are character-based (UTF-8 continuation bytes skipped) and
    * stopword hits are distinct, matching the composable forms on any
    * corpus; the one divergence is non-ASCII punctuation, which the
    * byte classifier counts as a letter while the regex-based
    * `punctCount` counts as punctuation. */
  def stats(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.TextStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** qualityScore computed from ONE stats struct (same formula/weights). */
  def qualityScoreFast(stats: Column, lang: String = "en"): Column = {
    val hits = stats.getField(s"hits_$lang")
    val nTok = stats.getField("n_tokens")
    val lengthScore = least(nTok.cast("double") / 20.0, lit(1.0))
    val stopScore = least(
      when(nTok === 0, lit(0.0)).otherwise(hits.cast("double") / nTok) * 5.0, lit(1.0))
    // same denominator as the composable form: full length incl. spaces
    // (n_chars counts decoded characters, == length())
    val total = stats.getField("n_chars")
    val punctScore = greatest(lit(1.0) -
      when(total === 0, lit(0.0))
        .otherwise(stats.getField("n_punct").cast("double") / total) * 4.0, lit(0.0))
    round(lengthScore * 0.4 + stopScore * 0.4 + punctScore * 0.2, 6)
  }

  /** langId computed from ONE stats struct. The vote uses the DISTINCT
    * hit counters (`dhits_XX`, bitmask-deduplicated in the expression),
    * so it is identical to the composable `langId`'s `array_distinct` +
    * `array_intersect` form — a doc repeating one English stopword
    * cannot out-vote several distinct German ones. */
  def langIdFast(stats: Column): Column = {
    val scored = graft.functions.TextStatsImpl.Langs.map { lang =>
      struct(stats.getField(s"dhits_$lang").as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    // both cjk and n_chars count decoded characters: "CJK dominates"
    // is cjk > chars/4, same test as the composable form
    when(stats.getField("cjk") * 4 > stats.getField("n_chars"), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("unknown"))
  }

  // ------------------------------------------------------ fingerprints

  /** Document fingerprint: `m` min-hashes over rolling character
    * `k`-grams (each with a distinct hash seed mixed in) — a compact
    * signature for shift-tolerant near-dup detection and sampling keys.
    * Delegates to the native one-pass expression
    * (`graft.functions.DocFingerprint`) — 14× the HOF form's corpus-scan
    * throughput, bit-identical values (parity spec). No shuffle. */
  def docFingerprint(c: Column, k: Int = 8, m: Int = 4): Column =
    graft.functions.GraftFunctions.fingerprint(c, k, m)

  /** HOF reference formulation the native expression is verified
    * against (TextAnalysisSpec parity). On NULL text this yields an
    * array of m NULLs where the native form yields NULL. */
  private[graft] def docFingerprintHof(c: Column, k: Int = 8, m: Int = 4): Column = {
    // per seed: min over rolling k-gram positions of xxhash64(seed, gram)
    val mins = (0 until m).map { seed =>
      array_min(transform(
        sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
        i => xxhash64(lit(seed), call_function("substring", c, i, lit(k)))))
    }
    array(mins: _*)
  }
}
