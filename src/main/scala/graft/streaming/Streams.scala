package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` stream table
  * (north-star extension, SURVEY.md §7.6 — the reference has no
  * streaming at all, §2.6).
  *
  * Design: streams are the same declarative DataFrames as batch —
  * every stateless operator in this library (scoring, text analysis,
  * JSON extraction) applies to a stream unchanged. This module adds the
  * genuinely streaming pieces: event-time watermarks, tumbling-window
  * aggregation, in-stream dedup, and keyed running state.
  *
  * At scale: windowed aggs shuffle once per trigger on (window, key)
  * with partial aggregation; the watermark bounds state size — state
  * for windows older than the watermark is dropped; stream dedup keeps
  * only ids younger than the watermark. `mapGroupsWithState` state is
  * per-key and lives in the state store (RocksDB in production),
  * checkpointed for exactly-once recovery.
  */
object Streams {

  /** events schema as stored (`ts` is a microsecond-precision
    * zone-less parquet timestamp — Spark reads it as TIMESTAMP_NTZ;
    * the session timezone is pinned to UTC so NTZ and instant
    * semantics coincide). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events directory (file source: new files are
    * discovered per trigger — the standard landing-zone pattern). */
  def readEventStream(spark: SparkSession, dir: String, globFilter: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(EventsSchema)
      .option("pathGlobFilter", globFilter)
      .parquet(dir)

  /** Event-time column: `ts` is a timestamp (NTZ from the parquet
    * source) cast to the instant type — Spark's event-time watermark
    * accepts only TIMESTAMP, and the UTC session pins the NTZ→instant
    * conversion so values are preserved exactly. Identity for already-
    * instant fixtures. */
  def eventTime(ts: Column): Column = ts.cast("timestamp")

  /** Event-time tumbling-window stats per event type, with a watermark
    * that bounds state: counts + value aggregates per (window, type). */
  def windowedEventStats(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg("value"), 4).as("avg_value"),
        round(sum("value"), 4).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("avg_value"), col("sum_value"))

  /** Per-user session windows: events closer than `gap` merge into one
    * session; watermark bounds open-session state. Works identically in
    * batch (session_window is a grouping expression). */
  def sessionStats(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame = {
    // withWatermark is a no-op on batch plans (EliminateEventTimeWatermark)
    events.withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
  }

  /** In-stream exact dedup on event id: duplicates arriving within the
    * watermark horizon are dropped; state is bounded by the watermark. */
  def dedupEventStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val wm = events
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
    // dropDuplicates on the id alone would keep state for every id ever
    // seen (state is only evicted when the watermarked column is part of
    // the key); the WithinWatermark variant expires ids with the horizon
    if (wm.isStreaming) wm.dropDuplicatesWithinWatermark("event_id")
    else wm.dropDuplicates("event_id")
  }

  /** Stream-static URL tier: drop arriving docs whose CANONICAL URL
    * ([[graft.llm.DomainFilter.normalizeUrl]]) hash appears in the
    * batch Curator's committed `urls` state — the metadata tier BEFORE
    * any text tier, so refetched pages cost one 8-byte-hash probe and
    * no text work. Stateless: a stream-static anti-join, re-planned
    * per microbatch (broadcast when the hash table fits) — no
    * watermark, no state store. Null/absent URLs pass (no key to
    * collide on). Batch parity: the same code on a batch frame is a
    * plain anti-join (spec-pinned). */
  def dropSeenUrlsStream(
      docs: DataFrame,
      urlCol: String,
      urlState: DataFrame): DataFrame =
    docs.join(urlState.select(col("url_hash").as("__url_ph")),
      xxhash64(graft.llm.DomainFilter.normalizeUrl(col(urlCol))) === col("__url_ph"),
      "left_anti")

  /** Streaming incremental dedup against PERSISTED corpus state: drop
    * stream rows whose content hash already exists in `seenHashes` (a
    * STATIC frame — point it at the Curator's committed `hashes` state
    * dir), then drop in-stream exact duplicates within the watermark
    * horizon. The streaming arrival path of the Curator's batch
    * `Dedup.dropSeen` tier 1.
    *
    * Shapes: the stream-static anti-join keeps NO join state (the
    * static side is re-planned per microbatch — broadcast when the
    * hash table fits, shuffled otherwise); the in-stream tier's state
    * is bounded by the watermark horizon via
    * `dropDuplicatesWithinWatermark`, never by stream lifetime. Batch
    * parity: on a batch frame the same code is a plain anti-join +
    * dropDuplicates — same rows out (spec-pinned).
    *
    * Near-dup-vs-corpus has its own streaming arrival path —
    * [[dropNearSeenStream]] below; full in-batch near-dup clustering
    * (keep-lower-id within the arriving set) still belongs to the
    * incremental BATCH Curator on the stream's sink output. */
  def dropSeenStream(
      stream: DataFrame,
      seenHashes: DataFrame,
      textCol: String,
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame = {
    require(!seenHashes.isStreaming, "seenHashes must be a static frame (persisted state)")
    // temp columns pick unused names and are BOTH dropped on the way
    // out — the output schema is exactly the input schema, and a
    // pre-existing event_time/hash column is never clobbered
    def fresh(base: String): String = Iterator.from(0).map(i => s"$base$i")
      .find(!stream.columns.contains(_)).get
    val hashCol = fresh("__content_hash")
    val timeTmp = fresh("__dedup_event_time")
    val hashed = stream
      .withColumn(hashCol, graft.llm.Dedup.contentHash(col(textCol)))
      .withColumn(timeTmp, eventTime(col(timeCol)))
      .withWatermark(timeTmp, watermarkDelay)
    val unseen = hashed.join(
      seenHashes.select(col("content_hash").as(hashCol)),
      Seq(hashCol), "left_anti")
    (if (unseen.isStreaming) unseen.dropDuplicatesWithinWatermark(hashCol)
     else unseen.dropDuplicates(hashCol))
      .drop(hashCol, timeTmp)
  }

  /** Stateless streaming curation-lite: annotate a DOCUMENT stream
    * with the Curator's scan-speed quality signals and apply the
    * configured floors — the streaming arrival path of the Curator's
    * projection stages (quality heuristic, language gate, repetition,
    * native LM scorers, learned classifier). Everything here is a
    * per-row projection or filter: NO watermark, NO state store, NO
    * shuffle — a microbatch is one codegen'd scan, so throughput is
    * the file source's. Floors of `None` annotate without filtering
    * (the Curator's own -Infinity convention). Batch parity is
    * structural: the same code path on a batch frame produces the same
    * rows (spec-pinned), because nothing here depends on streaming
    * semantics.
    *
    * The heavier Curator stages stay OUT by design: dedup tiers have
    * their own streaming arrival paths ([[dropSeenStream]]/
    * [[dropNearSeenStream]]), and corpus-relative stages (boilerplate
    * evidence, DSIR, mixing, packing) need corpus state a stateless
    * stream cannot see — they belong to the incremental batch Curator
    * over the stream's sink output. */
  def filterDocStream(
      docs: DataFrame,
      textCol: String = "text",
      minQuality: Option[Double] = None,
      stripHtml: Boolean = false,
      stripMarkdown: Boolean = false,
      normalizeText: Boolean = false,
      gopherRules: Boolean = false,
      c4Rules: Boolean = false,
      langs: Set[String] = Set.empty,
      repetition: Option[(Int, Double)] = None,
      minDeflateRatio: Option[Double] = None,
      lmPath: Option[String] = None,
      minLmLogP: Option[Double] = None,
      kn3Path: Option[String] = None,
      minKn3LogP: Option[Double] = None,
      knnPath: Option[String] = None,
      minKnnLogP: Option[Double] = None,
      knnPacked: Boolean = false,
      knnModified: Boolean = false,
      classifierPath: Option[String] = None,
      minClassifierScore: Option[Double] = None,
      // optional custom rewrite/filter lists (the batch Curator's
      // entity-list-path / mojibake-list-path / badword-list-path
      // knobs, mirrored so arrival-time filtering and batch curation
      // judge with the same data); defaults = the shipped stand-ins
      entityList: Option[Seq[(String, String)]] = None,
      mojibakeList: Option[Seq[(String, String)]] = None,
      badwordList: Option[Seq[String]] = None): DataFrame = {
    import graft.llm.TextAnalysis
    // normalization, then C4 cleaning (the same pre-annotation order
    // as the batch Curator): projections + a predicate, so the stream
    // stays stateless with them on — every later signal sees repaired,
    // cleaned text
    val unHtmled =
      if (stripHtml) docs.withColumn(textCol, entityList match {
        // same default as the batch Curator: the full WHATWG set via
        // the native decoder; a custom list switches to the chain form
        case Some(list) => TextAnalysis.stripHtml(col(textCol), list)
        case None => TextAnalysis.stripHtmlFull(col(textCol))
      })
      else docs
    // markdown strip next (same order as the batch Curator: an
    // HTML-rendered markdown doc sheds both layers)
    val unMarked =
      if (stripMarkdown)
        unHtmled.withColumn(textCol,
          graft.functions.GraftFunctions.markdownStrip(col(textCol)))
      else unHtmled
    val normed =
      if (normalizeText)
        unMarked.withColumn(textCol, mojibakeList match {
          // same default as the batch Curator: algorithmic ftfy-core
          // repair; a custom list switches to the chain form
          case Some(list) => TextAnalysis.normalizeText(col(textCol), list)
          case None => TextAnalysis.normalizeTextFull(col(textCol))
        })
      else unMarked
    val cleaned =
      if (c4Rules) TextAnalysis.c4Apply(normed, textCol,
        TextAnalysis.C4Thresholds(
          badWords = badwordList.getOrElse(TextAnalysis.C4BadWordsDefault)))
      else normed
    val st = TextAnalysis.stats(col(textCol))
    var df = cleaned
      .withColumn("quality", TextAnalysis.qualityScoreFast(st))
      .withColumn("lang_id", TextAnalysis.langIdFast(st))
    minQuality.foreach(q => df = df.filter(col("quality") >= q))
    // the published Gopher rule set — still a pure scan predicate, so
    // the stream stays stateless with it on
    if (gopherRules)
      df = df.filter(TextAnalysis.gopherKeep(col(textCol)))
    if (langs.nonEmpty)
      df = df.filter(col("lang_id").isin(langs.toSeq: _*))
    repetition.foreach { case (n, maxRep) =>
      df = df.withColumn("repetition",
        TextAnalysis.repetitionScoreFast(col(textCol), n))
        .filter(col("repetition") <= maxRep)
    }
    // zlib-compressibility floor (the batch Curator's min-deflate-ratio,
    // mirrored): still a stateless scan predicate
    minDeflateRatio.foreach { floor =>
      df = df.withColumn("deflate_ratio",
        graft.functions.GraftFunctions.deflateRatio(col(textCol)))
        .filter(col("deflate_ratio") >= floor)
    }
    lmPath.foreach { p =>
      df = df.withColumn("lm_logp",
        graft.functions.GraftFunctions.lmLogProb(col(textCol), p))
      minLmLogP.foreach(f => df = df.filter(col("lm_logp") >= f))
    }
    kn3Path.foreach { p =>
      df = df.withColumn("kn3_logp",
        graft.functions.GraftFunctions.kn3LogProb(col(textCol), p))
      minKn3LogP.foreach(f => df = df.filter(col("kn3_logp") >= f))
    }
    knnPath.foreach { p =>
      import graft.functions.GraftFunctions._
      val score = (knnModified, knnPacked) match {
        case (true, true) => knModLogProbPacked(col(textCol), p)
        case (true, false) => knModLogProb(col(textCol), p)
        case (false, true) => knNLogProbPacked(col(textCol), p)
        case (false, false) => knNLogProb(col(textCol), p)
      }
      df = df.withColumn("knn_logp", score)
      minKnnLogP.foreach(f => df = df.filter(col("knn_logp") >= f))
    }
    classifierPath.foreach { p =>
      val clf = graft.llm.QualityClassifier.load(docs.sparkSession, p)
      df = df.withColumn("clf_score", clf.score(col(textCol)))
      minClassifierScore.foreach(f => df = df.filter(col("clf_score") >= f))
    }
    df
  }

  /** Streaming NEAR-dup dedup against persisted corpus signature state:
    * drop stream rows whose SimHash lands within `maxHamming` bits of
    * any corpus signature — the streaming arrival path of the batch
    * `Dedup.simHashNearDupsAgainst` tier. `corpusSigs` is the same
    * `(id, sig)` state frame the batch tier reads (point it at the
    * Curator's committed `simhash` state dir; SimHash is a pure
    * function of the text, so batch and stream signatures agree).
    *
    * Why not the batch shape (band-explode both sides, join, distinct
    * batch ids, anti-join back)? The distinct-ids step is a streaming
    * AGGREGATION — in append mode its output waits for the watermark,
    * and the re-join of stream against its own derived stream is a
    * second stateful stage. Instead the per-doc "any band matched"
    * decision stays ON the stream row: compute the `bands` band-bits
    * columns in the projection, then chain `bands` STATELESS
    * stream-static left_anti joins, one per band slice of the corpus
    * state, each with the `hamming <= maxHamming` residual predicate.
    * Candidate rule is identical to the batch banded join (drop iff
    * some corpus sig shares >= 1 band AND is within the Hamming
    * budget), so the pigeonhole recall contract carries over:
    * `maxHamming < bands` guarantees every true near-dup shares a
    * band. Batch parity: on a batch frame the same code is `bands`
    * plain anti-joins — same rows out (spec-pinned).
    *
    * Shapes at scale: zero streaming join state (every anti-join is
    * stream-static — the corpus side is re-planned per microbatch and
    * broadcasts when it fits, shuffles on the band bits otherwise);
    * `bands` joins per microbatch instead of batch's single exploded
    * join is the price of statelessness, and `bands` is a small
    * constant (4). The hot-bucket guard bounds worst-case per-key
    * fan-in; pass `corpusHotBuckets` (part of the persisted state —
    * see `Dedup.simHashHotBuckets`) so the guard costs a broadcast
    * instead of a per-microbatch corpus aggregate. The in-stream tier
    * collapses only exact-signature duplicates within the watermark
    * horizon (`dropDuplicatesWithinWatermark` keys exactly; a
    * within-stream HAMMING tier would need the stateful aggregation
    * this design avoids — run the batch Curator on the sink output for
    * that). */
  def dropNearSeenStream(
      stream: DataFrame,
      corpusSigs: DataFrame,
      textCol: String,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None,
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours",
      gramSize: Int = 1): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming < bands ($maxHamming >= $bands misses pairs)")
    dropNearSigStream(stream, graft.llm.Dedup.simHash(col(textCol), gramSize),
      corpusSigs, maxHamming, bands, maxBucketSize, corpusHotBuckets,
      timeCol, watermarkDelay)
  }

  /** Vector counterpart of [[dropNearSeenStream]]: drop stream rows
    * whose SRP signature collides with the persisted corpus state
    * within the `minCosine`-derived Hamming budget — the streaming
    * arrival path of `Similarity.dropSeenVectors`' vs-corpus tier.
    * Same seed as the state builder, or signatures diverge (the
    * `srpSignatures` contract). SRP recall is probabilistic (a band
    * match decides candidacy), so no pigeonhole requirement here. */
  def dropNearSeenVectorStream(
      stream: DataFrame,
      corpusSigs: DataFrame,
      vecCol: String = "embedding",
      minCosine: Double = 0.99,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None,
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours",
      seed: Long = 4233L): DataFrame =
    dropNearSigStream(stream,
      graft.functions.GraftFunctions.srp(col(vecCol), seed), corpusSigs,
      graft.llm.Similarity.defaultMaxHamming(minCosine), bands,
      maxBucketSize, corpusHotBuckets, timeCol, watermarkDelay)

  /** Media counterpart of [[dropNearSeenStream]]: drop arriving IMAGE
    * or AUDIO assets whose perceptual fingerprint
    * (`graft_media_hash` — dHash / pHash for `image-dct` lineages /
    * the spectral hash, decode + hash in one column call) lands within
    * `maxHamming` bits of the persisted corpus state (a `MediaDedup`
    * run's `state-out-dir/sigs`) — the streaming arrival path of the
    * MediaDedup incremental tier. Same
    * stateless stream-static shape as the text/vector forms: band bits
    * live on the stream row, each band left-anti-joins a broadcastable
    * slice of the STATIC state, no stream-side aggregation or shuffle
    * state beyond the watermarked in-stream fingerprint dedup. Video
    * is a frame-exploding path and stays on the batch increment. The
    * state must come from the SAME modality and band geometry
    * (MediaDedup's fingerprint line guards the batch side; here the
    * caller owns it — mixed-geometry signatures have ~random Hamming
    * distances and every near-dup sails through). */
  def dropNearSeenMediaStream(
      stream: DataFrame,
      corpusSigs: DataFrame,
      modality: String,
      contentCol: String = "content",
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None,
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours",
      probe: Int = 0,
      preparedState: Option[DataFrame] = None): DataFrame = {
    require(probe == 0 || probe == 1, s"probe depth must be 0 or 1, got $probe")
    require(maxHamming < bands * (probe + 1),
      s"pigeonhole needs maxHamming < bands*(probe+1) " +
        s"($maxHamming >= ${bands * (probe + 1)} misses pairs)")
    dropNearSigStream(stream,
      graft.functions.GraftFunctions.mediaHash(col(contentCol), modality),
      corpusSigs, maxHamming, bands, maxBucketSize, corpusHotBuckets,
      timeCol, watermarkDelay, probe, preparedState)
  }

  /** The PRE-AGGREGATED static side of a near-dup arrival filter: one
    * row per occupied (band, bits) key with the bucket's signature
    * array — hot-guarded, probe-EXPANDED (at probe 1 each stored key
    * also registers under its Hamming-≤1 neighborhood), exactly the
    * frame [[dropNearSigStream]] derives internally. Compute it ONCE,
    * `.persist()` it (or write it to parquet next to the sigs state,
    * probe depth recorded with the lineage), and pass it as
    * `preparedState`: a stream-static join re-executes its static
    * subtree EVERY micro-batch, so without this the corpus re-bands —
    * and at probe 1 re-pays the ×(width+1) probe explosion — per
    * batch (round-14 verdict nit; PerfProbe 21 measures the delta at
    * 1M-sig state). Array sizes are bounded by maxBucketSize at probe
    * 0 and (width+1)×maxBucketSize at probe 1. The frame is only
    * valid for the (bands, maxBucketSize, probe, hot-table) it was
    * built with — callers own that lineage, like corpusHotBuckets. */
  def prepareNearSigState(
      corpusSigs: DataFrame,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None,
      probe: Int = 0): DataFrame = {
    require(!corpusSigs.isStreaming, "corpusSigs must be a static frame (persisted state)")
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(probe == 0 || probe == 1, s"probe depth must be 0 or 1, got $probe")
    val width = 64 / bands
    val banded0 = graft.llm.Dedup.dropHotBuckets(
      graft.llm.Dedup.bandSignatures(corpusSigs, bands), maxBucketSize,
      corpusHotBuckets)
    val banded =
      if (probe == 0) banded0
      else banded0.select(col("band"), col("sig"),
        explode(array(col("bits") +: (0 until width).map(j =>
          col("bits").bitwiseXOR(lit(1L << j))): _*)).as("bits"))
    banded.groupBy("band", "bits").agg(collect_list(col("sig")).as("sigs"))
  }

  /** VIDEO counterpart of [[dropNearSeenMediaStream]] — the last
    * arrival-time modality: a clip is MANY hashes, so its fingerprint
    * column is the bounded first-k-frames array
    * (`graft_media_video_hash`, slot i = frame i) and the filter
    * re-creates the batch tier's frame-ALIGNED semantics statelessly:
    * each slot's band bits join the persisted per-frame state at the
    * SAME frame index, a slot "hits" when any band bucket holds a
    * stored sig within `maxHamming`, and the row drops when at least
    * `minFrames` slots hit — batch parity with
    * `Multimodal.videoNearDupsAgainst` over the first k frames
    * (spec-pinned). No stream-side aggregation: the per-(frame, band)
    * state slices are PRE-aggregated static bucket arrays (bounded by
    * `maxBucketSize` — hot buckets are dropped on the corpus side,
    * like every near-dup stream), joined left-outer and folded into
    * hit flags, so the plan is k × bands stream-static joins and the
    * only streaming state is the watermarked in-stream fingerprint
    * dedup. Keep k small (it is an ARRIVAL decision — the clip's head
    * identifies a re-encode; default 3). */
  def dropNearSeenVideoStream(
      stream: DataFrame,
      corpusFrameSigs: DataFrame, // (id, frame_idx, sig)
      firstKFrames: Int = 3,
      contentCol: String = "content",
      minFrames: Int = 2,
      maxHamming: Int = 5,
      bands: Int = 8,
      maxBucketSize: Int = 10000,
      corpusHotBuckets: Option[DataFrame] = None,
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours",
      probe: Int = 0): DataFrame = {
    require(!corpusFrameSigs.isStreaming,
      "corpusFrameSigs must be a static frame (persisted state)")
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(probe == 0 || probe == 1, s"probe depth must be 0 or 1, got $probe")
    require(maxHamming < bands * (probe + 1),
      s"pigeonhole needs maxHamming < bands*(probe+1) " +
        s"($maxHamming >= ${bands * (probe + 1)} misses pairs)")
    require(firstKFrames >= minFrames,
      s"firstKFrames ($firstKFrames) must cover minFrames ($minFrames)")
    require(firstKFrames <= 16,
      s"firstKFrames is a PLAN size (k × bands stream-static joins) — " +
        s"$firstKFrames would compile ${firstKFrames * bands} joins; an " +
        "arrival decision reads the clip's head, use the batch MediaDedup " +
        "increment for deep-frame matching")
    val width = 64 / bands
    val mask = ((BigInt(1) << width) - 1).toLong
    def fresh(base: String): String = Iterator.from(0).map(i => s"$base$i")
      .find(!stream.columns.contains(_)).get
    val framesCol = fresh("__vnd_frames")
    val timeTmp = fresh("__vnd_event_time")
    val hitBase = fresh("__vnd_hit")
    val withSig = stream
      .withColumn(framesCol,
        graft.functions.GraftFunctions.mediaVideoHash(col(contentCol), firstKFrames))
      .withColumn(timeTmp, eventTime(col(timeCol)))
      .withWatermark(timeTmp, watermarkDelay)
    // corpus side: band + hot-guard ONCE, then per-(frame, band) bucket
    // arrays — `bits -> [sigs]`. Under multi-probe the CORPUS side
    // expands AFTER the hot drop (each stored key also registers under
    // its Hamming-<=1 neighborhood, the dropNearSigStream idiom) so the
    // stream side keeps one home-key equi-join per (frame, band) — and
    // a probe-1 bucket array is therefore bounded by
    // (width+1) x maxBucketSize (~17x at 16-bit bands), not
    // maxBucketSize: the join payload broadcast per micro-batch carries
    // that multiplier (advice finding — size corpus state accordingly).
    val banded0 = graft.llm.Dedup.dropHotBuckets(
      graft.llm.Dedup.bandSignatures(
        corpusFrameSigs.select(
          struct(col("id").as("vid"), col("frame_idx").as("f")).as("id"),
          col("sig")), bands),
      maxBucketSize, corpusHotBuckets)
      .select(col("id.f").as("f"), col("band"), col("bits"), col("sig"))
    val banded =
      if (probe == 0) banded0
      else banded0.select(col("f"), col("band"), col("sig"),
        explode(array(col("bits") +: (0 until width).map(j =>
          col("bits").bitwiseXOR(lit(1L << j))): _*)).as("bits"))
    var cur = withSig
    val hitCols = (0 until firstKFrames).map { f =>
      // `get` (0-based) returns null past the clip's actual frame count
      // (never an ANSI error); null bits join nothing -> slot no-hit
      val frameHash = get(col(framesCol), lit(f))
      val bandCols = (0 until bands).map { b =>
        val kCol = s"$hitBase${f}_${b}k"
        val vCol = s"$hitBase${f}_${b}v"
        val slice = banded.filter(col("f") === f && col("band") === b)
          .groupBy(col("bits").as(kCol))
          .agg(collect_list(col("sig")).as(vCol))
        val withBits = cur.withColumn(kCol + "s",
          shiftright(frameHash, b * width).bitwiseAND(lit(mask)))
        cur = withBits.join(slice, withBits(kCol + "s") === slice(kCol), "left_outer")
          .drop(kCol, kCol + "s")
        vCol
      }
      val hitCol = s"$hitBase${f}_"
      cur = cur.withColumn(hitCol,
        bandCols.map(v => coalesce(exists(col(v),
            s => graft.llm.Dedup.hamming(frameHash, s) <= maxHamming), lit(false)))
          .reduce(_ || _))
        .drop(bandCols: _*)
      hitCol
    }
    val matched = hitCols.map(h => when(col(h), 1).otherwise(0).cast("int"))
      .reduce(_ + _)
    val unseen = cur.filter(matched < minFrames)
    (if (unseen.isStreaming) unseen.dropDuplicatesWithinWatermark(framesCol)
     else unseen.dropDuplicates(framesCol))
      .drop(framesCol +: timeTmp +: hitCols: _*)
  }

  /** Shared signature-agnostic core of the two near-dup streams.
    * `probe` = the multi-probe depth of the wide-radius geometries
    * (`Dedup.sigNearDups`): the CORPUS side expands — each stored
    * band key also registers under its Hamming-≤1 neighborhood — so
    * the stream side keeps its single home-key lookup per band and
    * the plan stays stateless stream-static. Same completeness
    * contract: maxHamming < bands×(probe+1).
    *
    * The static side is the PER-(band, bits) BUCKET-ARRAY frame of
    * [[prepareNearSigState]] (the r12 video-filter shape): one row
    * per occupied key, so each band's membership test is a ≤1:1
    * left-outer lookup + an `exists` Hamming scan over the bucket —
    * row-for-row the same drop rule as the former per-band anti-join
    * (drop iff some corpus sig shares a band key AND is within the
    * budget; spec-pinned parity). `preparedState` substitutes a
    * CACHED/persisted copy of that frame: a stream-static join
    * re-executes its static subtree every micro-batch, so without it
    * the corpus re-bands (and at probe 1 re-pays the ×(width+1)
    * probe explosion) per batch. */
  private def dropNearSigStream(
      stream: DataFrame,
      sig: Column,
      corpusSigs: DataFrame,
      maxHamming: Int,
      bands: Int,
      maxBucketSize: Int,
      corpusHotBuckets: Option[DataFrame],
      timeCol: String,
      watermarkDelay: String,
      probe: Int = 0,
      preparedState: Option[DataFrame] = None): DataFrame = {
    require(!corpusSigs.isStreaming, "corpusSigs must be a static frame (persisted state)")
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = ((BigInt(1) << width) - 1).toLong
    // temp columns pick unused names and are ALL dropped on the way out
    // (the dropSeenStream convention — output schema = input schema)
    def fresh(base: String): String = Iterator.from(0).map(i => s"$base$i")
      .find(!stream.columns.contains(_)).get
    val sigCol = fresh("__nd_sig")
    val timeTmp = fresh("__nd_event_time")
    val bitsBase = Iterator.from(0).map(i => s"__nd_bits${i}_")
      .find(b => (0 until bands).forall(k => !stream.columns.contains(s"$b$k"))).get
    val withSig = stream
      .withColumn(sigCol, sig)
      .withColumn(timeTmp, eventTime(col(timeCol)))
      .withWatermark(timeTmp, watermarkDelay)
    // band bits live on the stream row — same bit slicing as the batch
    // bandSignatures explode, without the explode
    val withBits = (0 until bands).foldLeft(withSig) { (df, b) =>
      df.withColumn(s"$bitsBase$b",
        shiftright(col(sigCol), b * width).bitwiseAND(lit(mask)))
    }
    val buckets = preparedState.getOrElse(prepareNearSigState(
      corpusSigs, bands, maxBucketSize, corpusHotBuckets, probe))
    val unseen = (0 until bands).foldLeft(withBits) { (df, b) =>
      val cBits = s"${bitsBase}c$b"
      val cSigs = s"${bitsBase}s$b"
      val slice = buckets.filter(col("band") === b)
        .select(col("bits").as(cBits), col("sigs").as(cSigs))
      // bits are unique per band after the group-by, so the left-outer
      // lookup never multiplies stream rows; a missed key reads null
      // sigs -> no hit
      df.join(slice, df(s"$bitsBase$b") === slice(cBits), "left_outer")
        .filter(!coalesce(
          exists(col(cSigs),
            s => graft.llm.Dedup.hamming(col(sigCol), s) <= maxHamming),
          lit(false)))
        .drop(cBits, cSigs)
    }
    (if (unseen.isStreaming) unseen.dropDuplicatesWithinWatermark(sigCol)
     else unseen.dropDuplicates(sigCol))
      .drop(sigCol +: timeTmp +: (0 until bands).map(b => s"$bitsBase$b"): _*)
  }

  /** Watermarked stream-stream interval join (attribution): pair each
    * click with every view by the same user in the preceding `horizon`.
    *
    * The time-range predicate + watermarks are what make this run
    * unbounded: Spark derives a state watermark from them and evicts
    * buffered view rows older than `click watermark − horizon` (and
    * clicks older than the view watermark), so join state is bounded by
    * horizon + delay instead of growing with the stream. Without the
    * range condition a stream-stream join must buffer both sides
    * forever. Batch parity: on batch frames the watermark is a no-op
    * and this is a plain interval self-join — same rows out.
    *
    * At scale: one shuffle per side on `user_id`; per-user view fan-in
    * is bounded by event rate × horizon. Timestamps compare at
    * microsecond precision (`eventTime`) on both sides. */
  def attributionJoin(
      events: DataFrame,
      clickType: String = "click",
      viewType: String = "view",
      horizon: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === clickType)
      .select(col("event_id").as("click_id"), col("user_id"),
        eventTime(col("ts")).as("click_time"))
      .withWatermark("click_time", watermarkDelay)
    val views = events.filter(col("event_type") === viewType)
      .select(col("event_id").as("view_id"), col("user_id").as("__view_user"),
        eventTime(col("ts")).as("view_time"), col("value").as("view_value"))
      .withWatermark("view_time", watermarkDelay)
    clicks.join(views,
      col("user_id") === col("__view_user") &&
        col("view_time") <= col("click_time") &&
        col("view_time") >= col("click_time") - expr(s"INTERVAL $horizon"),
      "inner")
      .drop("__view_user")
  }

  /** Streaming model scoring: stateless, so the batch scorer's
    * expression path applies verbatim (graft.ml.Scorer.scoreExpr works
    * on a streaming DataFrame unchanged). Provided for discoverability. */
  def scoreEventStream(
      events: DataFrame,
      predictions: Seq[(String, Column)],
      colsToSave: Seq[String]): DataFrame =
    graft.ml.Scorer.scoreExpr(events, predictions, colsToSave)

  /** Keyed running state via mapGroupsWithState: per-user event count,
    * running value sum, and last-seen event time (epoch micros — keyed
    * state wants a primitive, not a timestamp object). */
  final case class UserStats(userId: Long, nEvents: Long, sumValue: Double, lastTs: Long)

  def userRunningStats(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").as("userId"),
        unix_micros(col("ts").cast("timestamp")).as("ts"), col("value"))
      // a single null in a nullable source field would kill the whole
      // streaming query at primitive-tuple deserialization
      .filter(col("userId").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { (acc, r) =>
            UserStats(uid, acc.nEvents + 1, acc.sumValue + r._3, math.max(acc.lastTs, r._2))
          }
          state.update(next)
          next
      }
      .toDF()
  }

  /** Production run options for the streaming harnesses.
    *
    *  - `checkpointLocation`: durable WAL + state checkpoint dir —
    *    REQUIRED for exactly-once recovery in production (the default
    *    temp checkpoint is deleted on success and lost on crash);
    *  - `useRocksDB`: swap the state store to the RocksDB provider —
    *    state lives off-heap on local disk instead of the executor heap,
    *    the production choice once keyed state exceeds memory (millions
    *    of sessions/dedup ids per partition at 100 TB);
    *  - `shufflePartitions`: stateful streaming creates one state-store
    *    instance per shuffle partition; for modest key cardinality that
    *    bootstrap dominates a run-to-completion query, so callers may
    *    right-size it. Session values are restored afterwards (both
    *    confs are captured at query start).
    */
  final case class RunOptions(
      shufflePartitions: Option[Int] = None,
      checkpointLocation: Option[String] = None,
      useRocksDB: Boolean = false)

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Apply RunOptions around a streaming start: sets session confs,
    * runs `body`, restores the previous conf values. */
  private def withRunOptions[A](spark: SparkSession, opts: RunOptions)(body: => A): A = {
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevProvider = spark.conf.getOption(ProviderConf)
    opts.shufflePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    if (opts.useRocksDB) spark.conf.set(ProviderConf, RocksDBProvider)
    try body
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevProvider match {
        case Some(p) => spark.conf.set(ProviderConf, p)
        case None => spark.conf.unset(ProviderConf)
      }
    }
  }

  /** Run any of the above to completion over the files currently in the
    * directory (AvailableNow trigger + memory sink) and return the
    * result — the batch-parity harness used by specs and oracles. */
  def runToMemory(
      stream: DataFrame,
      queryName: String,
      outputMode: OutputMode,
      shufflePartitions: Option[Int] = None): DataFrame =
    runToMemory(stream, queryName, outputMode, RunOptions(shufflePartitions))

  def runToMemory(
      stream: DataFrame,
      queryName: String,
      outputMode: OutputMode,
      opts: RunOptions): DataFrame = {
    val spark = stream.sparkSession
    withRunOptions(spark, opts) {
      var w = stream.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode(outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      opts.checkpointLocation.foreach(c => w = w.option("checkpointLocation", c))
      w.start().awaitTermination()
    }
    spark.table(queryName)
  }

  /** Run a stream to a durable file sink (parquet) to completion — the
    * production landing path: checkpointed, exactly-once, restartable
    * (a later run with the same checkpoint resumes from the offset log
    * and appends only new files' windows). */
  def runToFiles(
      stream: DataFrame,
      outDir: String,
      checkpointLocation: String,
      opts: RunOptions = RunOptions()): Unit = {
    require(opts.checkpointLocation.forall(_ == checkpointLocation),
      "runToFiles: RunOptions.checkpointLocation conflicts with the checkpointLocation argument")
    val spark = stream.sparkSession
    withRunOptions(spark, opts) {
      stream.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointLocation)
        .outputMode(OutputMode.Append) // file sinks support append only
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
  }

  /** Run a stream through a `foreachBatch` sink to completion
    * (AvailableNow, checkpointed, restartable). Each micro-batch
    * arrives as a STATIC frame, so `body` can run whole-batch
    * semantics the incremental plans above deliberately avoid —
    * in-batch near-dup clustering, multi-pass aggregation, idempotent
    * multi-table writes. Structured Streaming's contract transfers to
    * `body`: a failed batch is RETRIED with the same `batchId`, so
    * every write must be idempotent per batch id (overwrite a
    * batch-id-keyed path; never blind-append). */
  def runForeachBatch(
      stream: DataFrame,
      checkpointLocation: String,
      opts: RunOptions = RunOptions())(
      body: (DataFrame, Long) => Unit): Unit = {
    require(opts.checkpointLocation.forall(_ == checkpointLocation),
      "runForeachBatch: RunOptions.checkpointLocation conflicts with the " +
        "checkpointLocation argument")
    val spark = stream.sparkSession
    withRunOptions(spark, opts) {
      stream.writeStream
        .foreachBatch(body)
        .option("checkpointLocation", checkpointLocation)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
  }
}
