package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs, ordered cheapest-filter-first so each stage shrinks
  * the data the next (more expensive) stage sees:
  *
  *  1. annotate  — scan-speed column expressions (quality, language,
  *                 token count); no shuffle;
  *  2. filter    — quality/language thresholds push down to the scan;
  *  3. exact dedup — one shuffle on the content hash;
  *  4. near dedup  — MinHash-LSH bucketed join on the (already much
  *                 smaller) survivor set; drops the higher id of each
  *                 candidate pair after exact-Jaccard verification.
  *
  * Near-dup resolution is the standard one-pass approximation (drop
  * pair's higher id), not a transitive closure — chains A~B~C where
  * A!~C keep A and may keep C; exact for the dominant case (clusters of
  * mutual near-dups). A connected-components pass (GraphX / iterative
  * join) is the upgrade if chain-dedup is required.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.3,
      langs: Set[String] = Set.empty, // empty = keep all
      nearDupMaxJaccardDistance: Double = 0.2,
      nearDupMinJaccard: Double = 0.8,
      shingleSize: Int = 3)

  /** Stage 1: annotate every document with curation signals — pure
    * projection, runs at scan speed. */
  def annotate(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_id", TextAnalysis.langId(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col(textCol)))

  /** Stages 1-4. Returns surviving rows with the annotation columns. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      conf: Config = Config()): DataFrame = {
    // 1-2: annotate + cheap filters (pushed toward the scan)
    var df = annotate(docs, textCol).filter(col("quality") >= conf.minQuality)
    if (conf.langs.nonEmpty)
      df = df.filter(col("lang_id").isin(conf.langs.toSeq: _*))

    // 3: exact dedup — one shuffle on sha2(text)
    val exact = Dedup.dropExactDuplicates(df, textCol, idCol)

    // 4: near dedup on the survivors — bucketed LSH candidates,
    // exact-Jaccard verified, drop the higher id of each pair
    val pairs = Dedup.minHashNearDups(exact, idCol, textCol,
      maxJaccardDistance = conf.nearDupMaxJaccardDistance,
      shingleSize = conf.shingleSize)
    val verified = Dedup.verifyPairs(pairs, exact, idCol, textCol,
      minJaccard = conf.nearDupMinJaccard, n = conf.shingleSize)
    val dropIds = verified.select(col("id2").as(idCol)).distinct()
    exact.join(dropIds, Seq(idCol), "left_anti")
  }

  /** Curation report: per-stage survivor counts for observability —
    * actions, so call on samples or cache the input. */
  def report(docs: DataFrame, idCol: String, textCol: String,
      conf: Config = Config()): Map[String, Long] = {
    val annotated = annotate(docs, textCol).cache()
    try {
      val total = annotated.count()
      val afterQuality = annotated.filter(col("quality") >= conf.minQuality).count()
      val curated = curate(docs, idCol, textCol, conf).count()
      Map("input" -> total, "after_quality" -> afterQuality, "curated" -> curated)
    } finally { annotated.unpersist(); () }
  }
}
