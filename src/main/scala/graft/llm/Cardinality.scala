package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable corpus-cardinality state: per-group HyperLogLog sketches
  * (Apache DataSketches HLL via Spark's `hll_sketch_agg`) of distinct
  * documents and distinct tokens, persistable as small binary columns
  * and UNIONABLE across batches — the data-card statistic exact
  * counting cannot provide incrementally.
  *
  * Why sketches are the 100 TB shape: an exact lifetime
  * `countDistinct(token)` over an incrementally-curated corpus would
  * either rescan every prior batch per increment or keep the full
  * distinct-token set as state (corpus-sized). An HLL sketch is a few
  * KB per group at lgK=12 (~1.6% relative standard error), its
  * aggregation is map-side partial (the token shuffle carries one
  * sketch per partition × group, not one row per token), and
  * `hll_union_agg` over persisted batch sketches is LOSSLESS with
  * respect to the sketch state: merging per-batch sketches yields the
  * IDENTICAL estimate a single pass over the union would — the
  * property CardinalitySpec pins exactly, and what makes the persisted
  * state trustworthy release documentation.
  *
  * The sketch estimate is a pure function of the input set (hash-based,
  * no RNG), so results are retry/partitioning-stable — but DuckDB's
  * approx_count_distinct is a DIFFERENT HLL implementation, so the
  * gate query (q89) is rows-only with the estimates value-asserted in
  * EntrySpec against exact counts.
  *
  * Reference anchor: the reference's datadiff histograms
  * (datadiff.py:27-51) summarize distributions; this extends the same
  * "summaries as data" idea to cardinality with mergeable state. */
object Cardinality {

  /** One batch's cardinality state: per `groupCols` group, HLL sketches
    * of distinct document texts (via the content hash — whitespace
    * variants are distinct documents, the dedup tiers' contract) and
    * distinct lowercased whitespace tokens (`gramSize` = 1) or word
    * n-gram shingles (`gramSize` > 1 — distinct-shingle cardinality is
    * the denominator contamination budgeting needs: "how many of the
    * corpus's N distinct 8-grams does this benchmark share?").
    *
    * Two aggregates (docs on the un-exploded frame, grams on the
    * exploded one) joined on the group key: sketching docs through the
    * gram explode would silently drop token-less documents. Both
    * shuffles are partial-aggregated sketches, bounded by group count.
    * `gram_size` rides the state as data so incremental merges can
    * reject a drifted configuration (sketches of tokens and sketches
    * of 8-grams merge into nonsense). */
  /** `hashGrams = true` is the SCALE form (the contamination-hits
    * convention): both the sketch input and [[benchmarkHitGrams]]'
    * join keys become per-doc-distinct 64-bit gram hashes from the
    * native one-pass expression (`graft_gram_hashes` — tokenize +
    * rolling mix, no gram String ever built). HLL estimates are
    * statistically identical (the sketch hashes its input anyway) and
    * the exploded token-scale pass stops materializing 8-word
    * Strings. States sketched over strings and hashes do not merge —
    * the representation rides the state as `hashed_grams` (the column
    * is added only in hashed mode, so pre-existing string states stay
    * schema-compatible and a representation drift fails the schema
    * compare loudly). */
  def sketchState(
      df: DataFrame,
      groupCols: Seq[String],
      textCol: String = "text",
      lgK: Int = 12,
      gramSize: Int = 1,
      hashGrams: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "sketchState needs at least one group column")
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    require(gramSize >= 1, s"gramSize must be >= 1, got $gramSize")
    val g = groupCols.map(col)
    val grams =
      if (hashGrams) graft.functions.GraftFunctions.gramHashes(col(textCol), gramSize)
      else if (gramSize == 1) Dedup.tokens(col(textCol))
      else Dedup.shingles(col(textCol), gramSize)
    val docs = df
      .select(g :+ Dedup.contentHash(col(textCol)).as("__h"): _*)
      .groupBy(g: _*)
      .agg(hll_sketch_agg(col("__h"), lit(lgK)).as("doc_sketch"))
    val toks = df
      .select(g :+ explode(grams).as("__tok"): _*)
      .groupBy(g: _*)
      .agg(hll_sketch_agg(col("__tok"), lit(lgK)).as("token_sketch"))
    // left join: a group whose docs are all token-less keeps its doc
    // sketch and reports 0 distinct tokens (estimate of a null sketch
    // is handled in report())
    val joined = docs.join(toks, groupCols, "left")
      .withColumn("gram_size", lit(gramSize))
    if (hashGrams) joined.withColumn("hashed_grams", lit(true)) else joined
  }

  /** Union batch states into corpus-lifetime state — same schema in,
    * same schema out, so the result persists under the same protocol.
    * `hll_union_agg` merges sketch registers; nothing rescans text.
    * Mixed `gram_size` states are rejected: token sketches and n-gram
    * sketches do not mean anything merged. */
  def mergeStates(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    // a string-gram state and a hashed-gram state differ in schema
    // (hashed_grams present only in hashed mode), so a representation
    // drift fails unionByName loudly before any merge happens
    val u = states.reduce(_.unionByName(_))
    val hashedCol =
      if (u.columns.contains("hashed_grams"))
        Seq(min("hashed_grams").as("hashed_grams"))
      else Nil
    u.groupBy(groupCols.map(col): _*)
      .agg(
        hll_union_agg(col("doc_sketch")).as("doc_sketch"),
        (Seq(hll_union_agg(col("token_sketch")).as("token_sketch"),
          min("gram_size").as("__gs_min"),
          max("gram_size").as("__gs_max")) ++ hashedCol): _*)
      // the guard lives INSIDE the kept column (a dropped guard column
      // would be pruned by Catalyst and never evaluate)
      .withColumn("gram_size",
        when(col("__gs_min") =!= col("__gs_max"),
          raise_error(lit("mergeStates: mixed gram_size states do not merge")))
          .otherwise(col("__gs_min")).cast("int"))
      .drop("__gs_min", "__gs_max")
  }

  /** Human-readable estimates from a state frame: per group, the
    * approximate distinct document and token counts. */
  def report(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.select(groupCols.map(col) :+
      hll_sketch_estimate(col("doc_sketch")).as("distinct_docs") :+
      coalesce(hll_sketch_estimate(col("token_sketch")), lit(0L))
        .as("distinct_tokens"): _*)

  // -------------------------------------- frequent-items (heavy hitters)

  /** Sentinel under which [[freqState]] counts NULL values: the NUL
    * prefix keeps it outside any printable value's range, so a column
    * that genuinely holds the string "null" stays distinguishable in
    * persisted heavy-hitter state.
    *
    * STATE-ERA NOTE: lifetime `freqsketch` state committed before this
    * sentinel existed counted NULLs under the literal string "null";
    * merging such state forward keeps those historical counts under
    * "null" (indistinguishable from the real value, which is exactly
    * why the sentinel exists). The schema carries no era marker to
    * reject on — rebuild pre-sentinel lifetimes if the distinction
    * matters for the column. */
  val NullItem: String = "\u0000<null>"

  /** One batch's heavy-hitter state: for each named value column, the
    * Misra–Gries top sketch of its values ([[graft.functions.FreqSketch]]
    * — estimated counts, hard k-entry bound, every estimate
    * undercounting by at most n/(k+1)) — "what are the dominant
    * sources / domains / languages" as persistable state. One scan: the
    * columns melt into (value_column, value) pairs and a single grouped
    * aggregate sketches all of them; the shuffle carries one ≤ k-entry
    * sketch per partition × column. Output schema
    * `(value_column, k, items array<struct<item, count>>)` — the same
    * schema [[mergeFreqStates]] returns, so lifetime state persists
    * under the incremental protocol like `cardsketch`. Null values are
    * counted under [[NullItem]] — a NUL-prefixed sentinel that
    * no printable source value can collide with (the literal string
    * "null" is a plausible value in CSV-ingested string columns, and
    * the conflation would persist into lifetime state where it could
    * never be untangled — review finding). [[freqReport]] surfaces the
    * sentinel as a real SQL NULL plus an `is_null` flag. */
  def freqState(df: DataFrame, valueCols: Seq[String], k: Int = 64): DataFrame = {
    require(valueCols.nonEmpty, "freqState needs at least one value column")
    require(k > 0, s"freqState k must be positive, got $k")
    val pairs = df.select(explode(array(valueCols.map(cn =>
        struct(lit(cn).as("value_column"),
          coalesce(col(cn).cast("string"), lit(NullItem)).as("__v"))): _*)).as("e"))
      .select(col("e.value_column"), col("e.__v"))
    pairs.groupBy("value_column")
      .agg(graft.functions.FreqSketch.sketch(col("__v"), k).as("items"))
      .withColumn("k", lit(k))
  }

  /** Merge batch heavy-hitter states into corpus-lifetime state — the
    * standard MG merge (union-sum, then subtract the (k+1)-th largest
    * count and drop non-positives), which preserves the n/(k+1) error
    * bound over the COMBINED stream; with fewer than k lifetime
    * distinct values no trim ever fires and the merged counts are
    * EXACT (the spec-pinned regime). Driver-side by design: state is
    * ≤ columns × k entries — the same bounded-egress class as the
    * histogram maps — and the driver merge reuses the aggregate's own
    * MG buffers, so batch and lifetime semantics cannot drift. Mixed
    * `k` states are rejected (different trim depths do not merge). */
  def mergeFreqStates(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeFreqStates needs at least one state frame")
    import graft.functions.FreqSketchImpl
    import org.apache.spark.unsafe.types.UTF8String
    val spark = states.head.sparkSession
    val rows = states.map(_.select("value_column", "k", "items")).reduce(_.unionByName(_))
      .collect()
    val ks = rows.map(_.getInt(1)).distinct
    require(ks.length <= 1,
      s"mergeFreqStates: mixed k states do not merge (saw k = ${ks.sorted.mkString(", ")})")
    val k = ks.headOption.getOrElse(0)
    val merged = new scala.collection.mutable.LinkedHashMap[String, FreqSketchImpl.MG]
    rows.foreach { r =>
      val m = new FreqSketchImpl.MG(k)
      r.getSeq[org.apache.spark.sql.Row](2).foreach { e =>
        m.counts.put(UTF8String.fromString(e.getString(0)),
          new FreqSketchImpl.Ctr(e.getLong(1)))
      }
      merged.get(r.getString(0)) match {
        case Some(acc) => acc.mergeWith(m)
        case None => merged.put(r.getString(0), m)
      }
    }
    import spark.implicits._
    merged.toSeq.map { case (cn, m) =>
      (cn, k, m.sortedEntries().map { case (it, n) => (it.toString, n) }.toSeq)
    }.toDF("value_column", "k", "items")
      .select(col("value_column"), col("k"),
        col("items").cast("array<struct<item:string,count:bigint>>").as("items"))
  }

  /** Human-readable heavy hitters from a state frame: one row per
    * (value_column, item) with its rank and estimated count. The
    * [[NullItem]] sentinel surfaces as a real SQL NULL item plus
    * `is_null = true`, so a report consumer never sees the NUL byte
    * and a genuine string "null" stays `is_null = false`. */
  def freqReport(state: DataFrame): DataFrame =
    state.select(col("value_column"),
        posexplode(col("items")).as(Seq("__pos", "e")))
      .select(col("value_column"), (col("__pos") + 1).as("rank"),
        when(col("e.item") === NullItem, lit(null)).otherwise(col("e.item"))
          .as("item"),
        (col("e.item") === NullItem).as("is_null"),
        col("e.count").as("estimate"))

  // -------------------------------------------- contamination budget

  /** Per-group DISTINCT corpus n-grams that also appear in the
    * benchmark set — the EXACT numerator of the contamination budget.
    * Why exact state is affordable here when distinct-gram state is
    * not: the hit set is bounded by the BENCHMARK's gram count (the
    * semi-join keeps nothing else), and benchmarks are small by
    * definition — so lifetime hit state is a few MB of parquet however
    * large the corpus grows, and batches merge by union-distinct.
    * Shape: benchmark grams broadcast; the corpus-side explode is the
    * same token-scale pass the cardinality sketch pays. */
  /** `hashGrams = true`: 64-bit gram hashes as the join keys and the
    * persisted hit rows — the state shrinks from 8-word strings to
    * 8 bytes per hit, and no gram String is ever built (same tradeoff
    * as [[TextAnalysis.contaminationHits]]: a 2^-64 collision could
    * count one extra shared gram — the budget then reads a hair too
    * HIGH, the conservative direction for a release gate). The hit
    * column is named `gram_hash` (vs `gram`), so merging hashed state
    * into string state fails loudly on schema. */
  def benchmarkHitGrams(
      df: DataFrame,
      bench: DataFrame,
      groupCols: Seq[String],
      textCol: String = "text",
      benchTextCol: String = "text",
      gramSize: Int = 8,
      hashGrams: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "benchmarkHitGrams needs at least one group column")
    require(gramSize >= 2, s"contamination gramSize must be >= 2, got $gramSize")
    def grams(c: Column): Column =
      if (hashGrams) graft.functions.GraftFunctions.gramHashes(c, gramSize)
      else Dedup.shingles(c, gramSize)
    val gcol = if (hashGrams) "gram_hash" else "gram"
    val benchGrams = bench
      .select(explode(grams(col(benchTextCol))).as(gcol))
      .distinct()
    df.select(groupCols.map(col) :+
        explode(grams(col(textCol))).as(gcol): _*)
      .join(broadcast(benchGrams), Seq(gcol), "left_semi")
      .distinct()
  }

  /** The data-card contamination budget: per group, the (estimated)
    * distinct n-gram count from the sketch state, the EXACT count of
    * distinct grams shared with the benchmark (from [[benchmarkHitGrams]]
    * state), and their ratio — "what fraction of this group's distinct
    * 8-grams does the benchmark share?", the number a release card
    * needs next to its decontamination claim. Composable with the
    * incremental protocol on BOTH sides: sketches merge via
    * [[mergeStates]], hit grams via union-distinct. */
  def contaminationReport(
      state: DataFrame,
      hitGrams: DataFrame,
      groupCols: Seq[String]): DataFrame =
    contaminationReportFromEstimates(
      estimateDistinct(state, groupCols), hitGrams, groupCols)

  /** The sketch state's per-group distinct-gram ESTIMATES
    * `(groupCols…, distinct_grams, gram_size)` — the decomposed first
    * half of [[contaminationReport]], and the natural data-card
    * artifact to PERSIST: the estimate is the only sketch-internal
    * (non-SQL-portable) step of the budget, so once this tiny table
    * (one row per group) is materialized, everything downstream — the
    * exact shared-gram numerator, the join, the fraction — replays in
    * plain SQL (the q95 dump-and-replay oracle rides exactly this
    * seam). */
  def estimateDistinct(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.select(groupCols.map(col) :+
      coalesce(hll_sketch_estimate(col("token_sketch")), lit(0L))
        .as("distinct_grams") :+
      col("gram_size"): _*)

  /** [[contaminationReport]] over an already-materialized estimates
    * table (from [[estimateDistinct]], possibly persisted/read back):
    * exact numerator from the hit-gram state, left join (a group with
    * zero hits reports 0, never drops), fraction guarded against an
    * empty group. All plain relational arithmetic — SQL-replayable. */
  def contaminationReportFromEstimates(
      estimates: DataFrame,
      hitGrams: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val shared = hitGrams
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("shared_grams"))
    estimates
      .join(shared, groupCols, "left")
      .withColumn("shared_grams", coalesce(col("shared_grams"), lit(0L)))
      .withColumn("contaminated_fraction",
        when(col("distinct_grams") > 0,
          col("shared_grams").cast("double") / col("distinct_grams"))
          .otherwise(lit(0.0)))
  }
}
