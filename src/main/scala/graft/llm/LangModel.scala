package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained unigram language model: the vocab count table plus the two
  * scalars every scoring form shares. Laplace-smoothed probabilities:
  *
  *   p(w in vocab) = (count(w) + 1) / (N + V + 1)
  *   p(OOV)        =              1 / (N + V + 1)
  *
  * where N = total token occurrences of the kept vocab and V = kept
  * vocab size. All three are integers, so the denominator is exact and
  * the model is bit-reproducible from the table alone — which is what
  * lets the DuckDB oracle replay scoring verbatim (q71/q72).
  */
/** Bigram LM: the minCount-pruned `(w1, w2, cnt2)` table plus the
  * unigram model that supplies context counts, vocab size, and the
  * first-position score. */
final case class BigramLm(unigram: UnigramLm, table: DataFrame)

final case class UnigramLm(table: DataFrame, totalTokens: Long, vocab: Long) {

  /** The shared Laplace denominator `N + V + 1` as a double — computed
    * ONCE here so the composable column form, the native expression,
    * and the saved-file header can never disagree on it. */
  def denom: Double = (totalTokens + vocab + 1).toDouble
}

/** CCNet-style n-gram language-model quality scoring: train a small
  * unigram LM on a REFERENCE corpus (a curated high-quality slice),
  * then score every candidate document by its average per-token log10
  * probability under that LM. Gibberish, boilerplate, and
  * wrong-language text sit far from the reference distribution and
  * score low; `perplexity = 10^(-avg log10 p)` is the familiar form of
  * the same number. (CCNet does this with a 5-gram KenLM; the unigram
  * form keeps the model a broadcastable table and the arithmetic
  * SQL-replayable, which is what the correctness gate needs — the
  * quality ORDERING it induces is what curation filters use.)
  *
  * Scale shape:
  *  - `trainUnigram` shuffles only REFERENCE tokens (one groupBy) —
  *    the reference slice is small by construction, and `minCount`
  *    bounds the vocab (rare-token mass folds into OOV smoothing, and
  *    a count threshold stays SQL-replayable where a top-K vocab cut
  *    would need tie-breaking the oracle can't mirror).
  *  - [[logProbPerDoc]] is the composable REFERENCE form: explode +
  *    broadcast-join + one groupBy(doc) shuffle whose width is the
  *    corpus TOKEN count — fine at verify scale, wrong at 100 TB.
  *  - the native expression (`graft_lm_logprob`,
  *    [[graft.functions.LmLogProb]]) is the scale path: the saved LM
  *    loads once per executor JVM, scoring is a zero-shuffle
  *    scan-speed projection, and both forms produce bit-identical
  *    doubles (same token boundaries, same `StrictMath.log10`, same
  *    left-to-right accumulation) — pinned by ONE shared oracle, the
  *    q41/q65 pattern.
  */
object LangModel {

  /** Train the unigram table over `Dedup.tokens` (lowercased
    * whitespace tokens — the same tokenizer contract as shingling and
    * the native text expressions). `minCount` drops rare tokens from
    * the vocab (they score as OOV); the vocab table is bounded by it. */
  def trainUnigram(
      ref: DataFrame,
      textCol: String,
      minCount: Long = 1L): UnigramLm = {
    val counts = ref
      .select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    // one tiny aggregate for both scalars; bounded driver egress (2 longs)
    val row = counts
      .agg(coalesce(sum("cnt"), lit(0L)).as("n"), count(lit(1)).as("v"))
      .head()
    UnigramLm(counts, row.getLong(0), row.getLong(1))
  }

  /** Train a bigram LM over the SAME tokenizer contract: within-doc
    * adjacent token pairs, `minCount`-pruned, plus the unigram model
    * for context counts and the first position. Word order now
    * matters — a bigram LM ranks ordered prose above the same tokens
    * shuffled, which NO unigram model can (their scores are
    * permutation-invariant by construction); that ordering fidelity is
    * the CCNet-direction upgrade for perplexity filtering and DSIR
    * weights.
    *
    * Bigram pairs are built with an in-row HOF over the token array
    * (no shuffle, no window) and aggregated once; the table is
    * minCount-bounded like the unigram vocab. */
  def trainBigram(
      ref: DataFrame,
      textCol: String,
      minCount: Long = 1L): BigramLm = {
    val pairs = ref
      .select(Dedup.tokens(col(textCol)).as("tk"))
      .select(explode(pairsOf(col("tk"))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
      .filter(col("cnt2") >= minCount)
    BigramLm(trainUnigram(ref, textCol, minCount), pairs)
  }

  /** Adjacent `(w1, w2)` pairs of a token array, in order — shared by
    * training and scoring so the two can never disagree on pair
    * construction. */
  private def pairsOf(tk: Column): Column =
    when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1),
        i => struct(element_at(tk, i).as("w1"), element_at(tk, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Composable bigram scoring: one row per scoring doc with
    * `lm2_logp` (average log10 conditional probability over ALL
    * positions — position 0 scores under the unigram model, position
    * i>0 under Laplace `log10((c(w1,w2)+1) / (c(w1)+V+1))`) and
    * `lm2_positions`. Token-less docs are absent, single-token docs
    * score their one position under the unigram.
    *
    * Shape: pair construction is in-row (no shuffle); the unigram/
    * context joins broadcast (minCount-bounded vocab); the bigram join
    * keys on (w1, w2) — minCount-bounded too, but larger, so AQE picks
    * broadcast vs shuffle at runtime; one final aggregate per doc. */
  def logProbPerDocBigram(
      docs: DataFrame,
      lm: BigramLm,
      idCol: String,
      textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol), Dedup.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
    val first = base
      .select(col(idCol), element_at(col("tk"), 1).as("token"))
      .join(broadcast(lm.unigram.table), Seq("token"), "left")
      .select(col(idCol), tokenLogProb(col("cnt"), lm.unigram).as("logp"))
    val ctx = lm.unigram.table
      .withColumnRenamed("token", "w1").withColumnRenamed("cnt", "__c1")
    val scored = base
      .select(col(idCol), explode(pairsOf(col("tk"))).as("p"))
      .select(col(idCol), col("p.w1"), col("p.w2"))
      .join(broadcast(ctx), Seq("w1"), "left")
      .join(lm.table, Seq("w1", "w2"), "left")
      .select(col(idCol),
        log10((coalesce(col("cnt2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("__c1"), lit(0L)) + lit(lm.unigram.vocab) + lit(1L)).cast("double"))
          .as("logp"))
    first.unionByName(scored)
      .groupBy(idCol)
      .agg(avg("logp").as("lm2_logp"), count(lit(1)).as("lm2_positions"))
  }

  /** Per-token log10 probability column for a joined `cnt` column
    * (null = OOV): `log10((cnt + 1) / (N + V + 1))`. Exposed so the
    * gate query and any custom pipeline share one arithmetic shape. */
  def tokenLogProb(cnt: Column, lm: UnigramLm): Column =
    log10((coalesce(cnt, lit(0L)) + lit(1L)).cast("double") / lit(lm.denom))

  /** Composable scoring (REFERENCE form — see the scale note above):
    * one row per document with `lm_logp` (average log10 token
    * probability; null when the document has no tokens — explode drops
    * it and the caller's left join keeps the null) and `lm_tokens`.
    * Documents with no tokens are absent from the result. */
  def logProbPerDoc(
      docs: DataFrame,
      lm: UnigramLm,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(Dedup.tokens(col(textCol))).as("token"))
    toks
      .join(broadcast(lm.table), Seq("token"), "left")
      .select(col(idCol), tokenLogProb(col("cnt"), lm).as("logp"))
      .groupBy(idCol)
      .agg(avg("logp").as("lm_logp"), count(lit(1)).as("lm_tokens"))
  }

  /** [[logProbPerDoc]] joined back onto the input: every document
    * keeps its columns and gains `lm_logp` / `lm_tokens` (null for
    * token-less documents). */
  def annotateLogProb(
      docs: DataFrame,
      lm: UnigramLm,
      idCol: String,
      textCol: String): DataFrame =
    docs.join(logProbPerDoc(docs, lm, idCol, textCol), Seq(idCol), "left")

  /** `perplexity = 10^(-avg log10 p)` — the conventional reading of
    * the score (lower = more reference-like). */
  def perplexity(avgLogP: Column): Column = pow(lit(10.0), -avgLogP)

  /** Persist the LM as ONE small text file (`token<TAB>count` lines,
    * header carries N and V): the artifact [[graft.functions.LmRegistry]]
    * loads once per executor JVM. The collect is bounded driver egress
    * — the vocab is `minCount`-bounded by construction (same contract
    * as the other documented driver-side sinks). Lines are sorted so
    * the file bytes are deterministic for identical training data;
    * the registry entry for `path` is invalidated after the write. */
  /** Persist a bigram LM as ONE text file (unigram section, a
    * `#pairs` marker — unambiguous, tokens cannot contain the tab that
    * would follow it in a data line — then `w1<TAB>w2<TAB>count`
    * lines). Both collects are minCount-bounded driver egress, sorted
    * for deterministic bytes; [[graft.functions.Lm2Registry]] loads it
    * once per executor JVM. */
  def saveBigram(lm: BigramLm, path: String): Unit = {
    val spark = lm.unigram.table.sparkSession
    val uniRows = lm.unigram.table.orderBy("token").collect()
    val pairRows = lm.table.orderBy("w1", "w2").collect()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write(s"#graft-bigram-lm v1 total=${lm.unigram.totalTokens} " +
        s"vocab=${lm.unigram.vocab} pairs=${pairRows.length}\n")
      uniRows.foreach { r =>
        out.write(r.getString(0)); out.write('\t')
        out.write(r.getLong(1).toString); out.write('\n')
      }
      out.write("#pairs\n")
      pairRows.foreach { r =>
        out.write(r.getString(0)); out.write('\t')
        out.write(r.getString(1)); out.write('\t')
        out.write(r.getLong(2).toString); out.write('\n')
      }
    } finally out.close()
    graft.functions.Lm2Registry.invalidate(path)
  }

  def save(lm: UnigramLm, path: String): Unit = {
    val spark = lm.table.sparkSession
    val rows = lm.table.orderBy("token").collect()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write(s"#graft-unigram-lm v1 total=${lm.totalTokens} vocab=${lm.vocab}\n")
      rows.foreach { r =>
        out.write(r.getString(0)); out.write('\t')
        out.write(r.getLong(1).toString); out.write('\n')
      }
    } finally out.close()
    graft.functions.LmRegistry.invalidate(path)
  }
}
