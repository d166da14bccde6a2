package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB-equivalent `oracleSql` where the operator is
  * SQL-expressible. Column names and dtypes are aligned on both sides
  * (the driver sorts columns by name before hashing); doubles produced by
  * multi-row accumulation are rounded on both sides to absorb
  * summation-order differences.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** [[t]] fanned out for per-row-HEAVY gates (r15 optimization): the
    * local test parquets are single row groups, so every scan plans as
    * ONE task and a gate whose cost is per-row expression work (regex
    * normalization, langID, native LM scoring, tokenizer encode,
    * deflate) runs serialized on one core. `Ops.fanOutForCompute` is a
    * no-op on well-split inputs, so this changes nothing at production
    * parallelism; rows are unchanged, only their order — use ONLY in
    * gates whose result is order-insensitive (row-wise projections,
    * aggregates), never where packing/limit/sampling reads order. */
  private def tH(s: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.Ops.fanOutForCompute(t(s, dir, name))

  /** Unique memory-sink names so repeated runs (bench warmup + timed
    * pass) never collide on an active query name. */
  private val StreamRunSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** q38's planted chain corpus (shared with PerfProbe so the probe
    * always times the exact gate workload): for each base doc, C = base
    * + 2k sentinel tokens (id+10000) and hub B = base + k sentinels
    * (id+20000) — B sits between base and C in Jaccard, so base ~ B ~ C
    * chains without base ~ C. Variant texts derive BEFORE the id shift
    * (withColumn, not a sibling select) so B and C embed the SAME
    * base-id sentinels — B's token stream must be a prefix of C's. */
  /** q125's planted language samples (ASCII corpus → the gate plants
    * its multilingual text, the q106/q108 idiom): one per stopword
    * profile (tracks [[graft.llm.TextAnalysis.StopwordProfiles]]), one
    * per script-tier language, plus garbage. Shared verbatim by the
    * query and its generated oracle; TextAnalysisSpec pins each
    * sample's expected code. */
  private val Q125Samples: Seq[String] = Seq(
    "the house and it is of that for them old",
    "der hund ist nicht mit der katze und ich zu",
    "le chat est dans la maison et les une pour",
    "el perro es un animal y la los que por",
    "o menino em uma casa para os do da amigos",
    "il gatto che non sono con una di per la",
    "ik denk dat het een huis van de niet op te",
    "я не знаю что это он как в на с",
    "你好世界这是一个中文句子没有空格测试",
    "これは日本語の文章ですテストです",
    "이것은 한국어 테스트 문장입니다",
    "هذا اختبار للغة العربية فقط",
    "זהו מבחן בשפה העברית בלבד",
    "αυτό είναι ένα τεστ στα ελληνικά",
    "यह हिंदी में एक परीक्षण है",
    "นี่คือการทดสอบภาษาไทย",
    // the round-10 profile additions — ukrainian FIRST among them: its
    // stopword vote must beat both the ru profile (3 shared words) and
    // the Cyrillic script fallback
    "і в не на що як з до це та мова",
    "i w nie na się z do to jest że dom",
    "och att det som en på är av för med hus",
    "ve bir bu için ile de da ne gibi çok ev",
    "a se na je že s z do to k dům",
    "și de la cu un o în pe este care casă",
    "ja on ei että se hän oli mutta niin kun talo",
    "og i at det en den til er som på hus",
    "a az és hogy nem is egy van de ez ház",
    "yang dan di itu dengan untuk tidak ini dari ke rumah",
    "và của là có không được trong đã người này",
    // round 11, the Cyrillic split: bulgarian and serbian samples must
    // outvote ru (and each other) instead of riding the script fallback
    "и в на не се да е за от с език",
    "и у је се на да не за су од реч",
    "xk9 zz9 blorp qqq")

  private[graft] def q38Planted(docs0: DataFrame): DataFrame = {
    val docs = docs0.select(col("doc_id"), col("text"))
    val n = size(graft.llm.Dedup.tokens(col("text")))
    // doc_id < 48 (round-5 trim from < 100): the chain-semantics signal
    // (pair-drop vs transitive survivor delta) needs dozens of chains,
    // not hundreds — ~30 chains at sf0.1 carry identical EntrySpec
    // assertions at a fraction of the per-bench-run LSH cost
    val base = docs.filter(col("doc_id") < 48 && n.between(40, 300))
    val k = floor((n - lit(2)) / lit(6)).cast("int")
    def extras(to: Column) = concat_ws(" ",
      transform(sequence(lit(1), to), i => concat(lit("zzq"), col("doc_id"), lit("x"), i)))
    val prepped = base
      .withColumn("__textB", concat_ws(" ", col("text"), extras(k)))
      .withColumn("__textC", concat_ws(" ", col("text"), extras(k * 2)))
    val endC = prepped.select((col("doc_id") + 10000).as("doc_id"), col("__textC").as("text"))
    val hubB = prepped.select((col("doc_id") + 20000).as("doc_id"), col("__textB").as("text"))
    base.unionByName(endC).unionByName(hubB)
  }

  /** Collect a small summary frame EAGERLY so its persisted inputs can
    * be unpersisted before returning (a lazily-returned frame would pin
    * every cache for the rest of the session — Verify/Bench run ~50
    * queries in one). Use ONLY for results of a few rows. */
  private def eagerSummary(s: SparkSession, out: DataFrame,
      cached: DataFrame*): DataFrame = {
    val rows = out.collect()
    cached.foreach(_.unpersist())
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Marker-gated parquet state cache keyed on a state dir (the
    * `ivfEnsure` `_BUILT` protocol): pay `build` once per (sf dir,
    * name), read the persisted layout every run after — how the
    * production arrival path treats corpus state, and what keeps
    * deterministic-but-expensive gate-state construction (q62's SRP
    * signatures, q73's KMeans cells) out of every bench pass. */
  private def ensureState(s: SparkSession, stateDir: String)
      (build: => DataFrame): DataFrame = {
    val marker = new org.apache.hadoop.fs.Path(stateDir, "_BUILT")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      build.write.mode("overwrite").parquet(s"$stateDir/data")
      fs.create(marker, true).close()
    }
    s.read.parquet(s"$stateDir/data")
  }

  /** Per-(sf dir, name) state path under the JVM temp dir — the q72
    * LM-file keying convention. The source tables' max mtime is part of
    * the key (the q25 ivfEnsure rule): testdata regenerated IN PLACE
    * must rebuild state, never serve signatures of the previous
    * corpus — exactly what happened when the round-6 bench read
    * round-5-era SRP state over regenerated embeddings.
    *
    * The mtime walks the WHOLE tree (not just direct children): a
    * regeneration that rewrites files inside nested partition
    * subdirectories may not bump any direct child's mtime. Superseded
    * sibling keys for the same (dir, name) are deleted on the way —
    * each regeneration mints a new key, and without cleanup the old
    * state dirs accumulate unbounded under java.io.tmpdir. */
  private def statePath(dir: String, name: String): String = {
    def maxMtime(f: java.io.File): Long = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.foldLeft(f.lastModified)((m, k) => math.max(m, maxMtime(k)))
    }
    val mtime = maxMtime(new java.io.File(dir))
    val root = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_state")
    val base = dir.replaceAll("[^A-Za-z0-9.-]", "_")
    val keyed = s"${base}_m${mtime}_$name"
    val stale = ("^" + java.util.regex.Pattern.quote(base) + "_m\\d+_" +
      java.util.regex.Pattern.quote(name) + "$").r
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName != keyed && stale.matches(f.getName))
      .foreach(deleteTree)
    new java.io.File(root, keyed).toString
  }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteTree)
    f.delete(): Unit
  }

  /** Root of a run's REPLAY-INPUT dumps for the DuckDB oracle — the
    * dump-and-replay idiom that converts the near-dup gates from
    * rows-only to hash-exact: a gate computes its deterministic
    * fingerprint/pair table once, dumps it here, consumes the
    * READ-BACK copy for its own pairing, and the oracle SQL replays
    * the identical pairing arithmetic (bit_count(xor), delta grouping,
    * recursive closure) over the same parquet via `read_parquet`.
    * What stays unverified is exactly the non-SQL-expressible DECODE
    * step that produced the dump; every decision after it is
    * cross-engine-pinned.
    *
    * Keyed by the sf dir (not mtime — the dump is overwritten by every
    * run, staleness is impossible) so a bench run at another SF can
    * never overwrite the verify run's dumps between `graft.Verify` and
    * the driver's DuckDB compare. The SQL in [[oracleSql]] carries the
    * literal `__AUX__` placeholder; [[Verify]] substitutes
    * `auxRoot(sfDir)` when it writes oracle_sql.json (the SQL map is
    * static and cannot know the dir). */
  def auxRoot(dir: String): String =
    new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_oracle_aux"),
      dir.replaceAll("[^A-Za-z0-9.-]", "_")).toString

  /** Dump `df` as the replay input named `name` and return the
    * READ-BACK frame: both the Spark pairing and the DuckDB replay
    * consume the exact same bytes (and the one mapPartitions decode
    * pass is never re-run by the downstream join's two sides).
    *
    * `SPARK_GRAFT_AUX_SKIP=1` (env) or `-Dgraft.aux.skip=1` (system
    * property — what `graft.Bench` sets for its production-form
    * timings, round-14 verdict item 3) turns the dump into a
    * pass-through (no write, no read-back): the query plans are then
    * byte-identical to the pre-dump (r12) forms, which is also how the
    * dump side-channel's bench cost is isolated when triaging a
    * per-query delta. Correctness runs (graft.Verify) refuse both. */
  private def dumpAux(df: DataFrame, dir: String, name: String): DataFrame =
    if (sys.env.get("SPARK_GRAFT_AUX_SKIP").contains("1") ||
        sys.props.get("graft.aux.skip").contains("1")) df
    else {
      val path = s"${auxRoot(dir)}/$name"
      df.coalesce(1).write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }

  /** Train-once BPE artifacts (mtime-keyed state dir, `_DONE` written
    * AFTER both files — the q90 crash-safety idiom), trained on
    * `doc_id < 100`. Shared by the gates that score with them: q109 and
    * q113 (byte-FALLBACK pair), q112 and q113 (byte-LEVEL pair) —
    * whichever runs first builds, the rest reuse. */
  private def ensureBpeArtifacts(s: SparkSession, dir: String, name: String,
      byteLevel: Boolean, specials: Seq[String] = Nil): (String, String) = {
    import graft.llm.BpeTrainer
    val base = statePath(dir, name)
    val mergesPath = s"$base/merges.txt"
    val vocabPath = s"$base/vocab.txt"
    val doneMarker = new java.io.File(base, "_DONE")
    if (!doneMarker.exists()) {
      val train = t(s, dir, "documents")
        .filter(col("doc_id") < 100).select(col("text"))
      val merges =
        if (byteLevel) BpeTrainer.learnByteMerges(train, "text", numMerges = 64)
        else BpeTrainer.learnMerges(train, "text", numMerges = 64)
      BpeTrainer.saveMerges(s, mergesPath, merges)
      // declared specials ride the vocab TAIL (fixed ids = their lines)
      BpeTrainer.saveVocab(s, vocabPath,
        (if (byteLevel) BpeTrainer.buildByteVocab(merges)
         else BpeTrainer.buildVocab(train, "text", merges)) ++ specials)
      doneMarker.createNewFile(): Unit
    }
    (mergesPath, vocabPath)
  }

  /** Marker-gated unigram tokenizer artifact (the [[ensureBpeArtifacts]]
    * idiom): a model trained on the docs<100 slice. The target size is
    * alphabet-aware — every single codepoint is kept for lattice
    * totality, and the synthetic corpus is multilingual (q125 spans 30
    * codes), so a fixed target could undercut a large alphabet. */
  private def ensureUnigramArtifact(s: SparkSession, dir: String): String = {
    // v2: full-corpus alphabet coverage joined the training input — the
    // version suffix invalidates any v1 artifact cached under the same
    // testdata mtime (the state key hashes data, not trainer code)
    val base = statePath(dir, "unigram_tok_v2")
    val modelPath = s"$base/unigram.tsv"
    val doneMarker = new java.io.File(base, "_DONE")
    if (!doneMarker.exists()) {
      // the statistics slice stays docs<100, but the ALPHABET covers the
      // whole corpus: q140 scores held-out docs and gates ids <
      // non-whitespace chars, which only holds if no scoring codepoint
      // byte-falls-back (an unseen char costs up to 4 ids). Two copies
      // of one synthetic all-distinct-chars doc (space-joined) clear the
      // trainer's minCount=2 so every single survives seeding.
      val slice = t(s, dir, "documents")
        .filter(col("doc_id") < 100).select(col("text"))
      val allChars = t(s, dir, "documents")
        .select(explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0).distinct()
      val alpha = allChars.count()
      val alphaDoc = allChars.agg(concat_ws(" ", collect_list(col("ch"))))
        .head().getString(0)
      import s.implicits._
      val train = slice.unionByName(Seq(alphaDoc, alphaDoc).toDF("text"))
      val pieces = graft.llm.UnigramTrainer.train(train, "text",
        targetPieces = alpha.toInt + 256, maxPieceLen = 8)
      graft.llm.UnigramTrainer.save(s, modelPath, pieces)
      doneMarker.createNewFile(): Unit
    }
    modelPath
  }

  /** Marker-gated WordPiece vocab artifact: likelihood-scored merges on
    * the docs<100 slice; vocab sized alphabet-aware (bare + `##` forms
    * can double the distinct-char count) so ~200 merges always fit. */
  private def ensureWordPieceArtifact(s: SparkSession, dir: String): String = {
    val base = statePath(dir, "wordpiece_tok")
    val vocabPath = s"$base/vocab.txt"
    val doneMarker = new java.io.File(base, "_DONE")
    if (!doneMarker.exists()) {
      val train = t(s, dir, "documents")
        .filter(col("doc_id") < 100).select(col("text"))
      val alpha = train
        .select(explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0).distinct().count()
      val vocab = graft.llm.WordPieceTrainer.learnVocab(train, "text",
        vocabSize = 2 * alpha.toInt + 5 + 200)
      graft.llm.WordPieceTrainer.save(s, vocabPath, vocab)
      doneMarker.createNewFile(): Unit
    }
    vocabPath
  }

  /** Fixed id of a special at the tail of the vocab at `vocabPath`
    * (local artifact file): its line number. */
  private def vocabIdOf(vocabPath: String, spelling: String): Int = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(vocabPath))
    val id = lines.indexOf(spelling)
    require(id >= 0, s"$spelling not in vocab at $vocabPath")
    id
  }

  /** Marker-gated shared KN count artifact (the [[ensureBpeArtifacts]]
    * idiom): the UNPRUNED order-n `saveNgram` file every native/packed
    * KN gate query scores — `trainNgram(minCount = 1)` of the docs<100
    * training slice, built once per (testdata mtime, order) and reused
    * across q115/q116/q118/q119/q120 (order 4) and q121 (order 5);
    * interpolated and modified KN derive from the same counts, so ONE
    * file serves both. Construction is one-time corpus state and runs
    * in Bench's untimed warmup (the q62 steady-state-timing contract);
    * the composable anchors q114/q117 keep training inline — their
    * cost IS the demonstration. */
  private def ensureKnArtifact(s: SparkSession, dir: String, order: Int): String = {
    val base = statePath(dir, s"kn_o$order")
    val lmPath = s"$base/ngram.lm"
    val doneMarker = new java.io.File(base, "_DONE")
    if (!doneMarker.exists()) {
      val ng = graft.llm.LangModel.trainNgram(
        t(s, dir, "documents").filter(col("doc_id") < 100), "text",
        order, minCount = 1L)
      graft.llm.LangModel.saveNgram(ng, lmPath)
      doneMarker.createNewFile(): Unit
    }
    lmPath
  }

  /** q39/q42 planted-pair accounting (eager — see [[eagerSummary]]). */
  private def pairTypeSummary(s: SparkSession, pairs: DataFrame,
      cached: DataFrame): DataFrame =
    eagerSummary(s, pairs
      .groupBy(when(col("id2") - col("id1") === 100000, "planted")
        .otherwise("other").as("pair_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(min("cos_sim"), 4).as("min_cos"),
        round(avg("cos_sim"), 4).as("avg_cos")), cached)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- R9/R10-style aggregation over lineitem (flagship; TPC-H Q1 shape).
    // One shuffle on the group keys with partial (map-side) aggregation.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- R2 null-filter + R3 cast projection (reference scorer.py:31-32).
    // Filter and the 3-column projection both push into the parquet scan.
    "q2_filter_cast" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_custkey").isNotNull && col("o_orderstatus") === "F")
        .select(col("o_orderkey").cast("string").as("uid"),
          col("o_totalprice"), col("o_orderpriority"))
    }),

    // ---- R4 literal metadata projection (reference scorer.py:53-57).
    "q3_literal_meta" -> ((s, dir) =>
      Ops.withMeta(
        t(s, dir, "customer"),
        Seq("model_name" -> "m1", "current_dt" -> "2026-01-01 00:00:00"))),

    // ---- R5/S8 exact ordered limit: TakeOrderedAndProject (distributed
    // per-partition top-n + driver merge; no global sort).
    "q4_limit" -> ((s, dir) =>
      Ops.exactLimit(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        100, Seq(col("o_orderkey")))),

    // ---- S7 Bernoulli sample, fixed reference seed 4233 (core.py:163).
    // Seeded RNG differs across engines — no SQL oracle (rows-only check).
    "q5_sample" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .sample(withReplacement = false, 0.1, graft.sources.DataIO.SampleSeed)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // ---- R6 inner equi-join ×2 + aggregation. `nation` (25 rows) is
    // explicitly broadcast; orders⋈customer shuffles on the key — at 100 TB
    // both sides co-partition on custkey, so the single shuffle is minimal.
    "q6_join_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    // ---- R7 window row_number, with a deterministic orderBy (the
    // reference's window has none — core.py:543 — which is unverifiable).
    "q7_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    }),

    // ---- R8 stratified quota sampling (proportion_samples,
    // core.py:525-547) with broadcast proportions + deterministic tiebreak.
    "q8_stratified_sample" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val props = o.select("o_orderpriority").distinct()
        .withColumn("rows_count", lit(7))
      Ops.proportionSamples(o, props, Seq("o_orderpriority"), Seq(col("o_orderkey")))
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // ---- R9 group-by count (datadiff.py:5-7), kept distributed (no
    // collectAsMap — the result set is the per-key table itself).
    "q9_group_count" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // ---- R10 min/max aggregate (the JDBC bound-probe shape, core.py:432-438).
    "q10_minmax" -> ((s, dir) =>
      t(s, dir, "orders")
        .agg(min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          count(lit(1)).as("n"))),

    // ---- R12 hashed discrete histogram (datadiff.py:4-15). The bin is an
    // engine-portable multiplicative hash (DuckDB lacks crc32); the product
    // default crc32Bin is covered by DataDiffSpec. One bounded-width
    // shuffle: ≤50 keys regardless of column cardinality.
    "q11_discrete_hist" -> ((s, dir) =>
      graft.datadiff.DataDiff.histogramDF(
        t(s, dir, "lineitem"),
        pmod(col("l_orderkey") * lit(2654435761L), lit(50L)))
        .withColumn("freq", round(col("freq"), 6))),

    // ---- R13 total-variation distance, single-scan form: both columns'
    // histograms from ONE pass over lineitem (explode to (side,bin) +
    // partial-agg shuffle bounded at 2×bins keys), conditional pivot
    // instead of a join (datadiff.py:36-56 semantics).
    "q12_tvd" -> ((s, dir) =>
      graft.datadiff.DataDiff.tvdSameTableDF(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")
        .select(round(col("tvd"), 6).as("tvd"))),

    // ---- U5 declarative model scoring (simple_model f1*f2 through the
    // scorer's cols_to_save + pred contract) — a single codegen'd
    // projection, the plan every expression-model score should have.
    "q13_score_expr" -> ((s, dir) =>
      graft.ml.Scorer.scoreExpr(
        t(s, dir, "lineitem"),
        Seq("pred" -> (col("l_extendedprice") * col("l_discount"))),
        colsToSave = Seq("l_orderkey", "l_linenumber"))),

    // ---- LLM tier-1 exact dedup: sha2 content hash, one bounded shuffle
    // (graft.llm.Dedup.exactDuplicateGroups).
    "q14_exact_dedup" -> ((s, dir) =>
      graft.llm.Dedup.exactDuplicateGroups(
        t(s, dir, "documents"), "text", "doc_id")),

    // ---- LLM similarity search: exact cosine top-k, query side
    // broadcast, corpus scanned once shuffle-free before per-query top-k.
    "q15_knn_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.llm.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 5), emb, k = 3)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank"))
    }),

    // ---- LLM text analysis via the one-pass stats expression (bit-
    // identical to the composable forms on this ASCII corpus — same
    // integer counters, same FP ops; TextStatsSpec pins the parity).
    "q16_doc_stats" -> ((s, dir) => {
      val st = graft.llm.TextAnalysis.stats(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        st.getField("n_tokens").cast("long").as("n_tokens"),
        st.getField("n_punct").cast("long").as("n_punct"),
        round(when(st.getField("n_tokens") === 0, lit(0.0))
          .otherwise(st.getField("n_nonspace").cast("double") / st.getField("n_tokens")), 4)
          .as("avg_token_len"))
    }),

    // ---- Multimodal plumbing through the REAL codec: deterministic
    // pixels derived from each document are encoded as genuine PNG
    // bytes in-query (reencodeAsPng), then decoded by javax.imageio
    // (ImageIoDecoder — width/height come from the PNG header, pixel
    // values from the raster). FakeDecoder pixels live on the n/255
    // grid, so the PNG round trip is bit-exact and the digests below
    // are identical to the stub-codec values. Not SQL-expressible →
    // rows-only check; MultimodalSpec keeps the raw-array asserts.
    "q18_multimodal_decode" -> ((s, dir) => {
      val media = graft.llm.Multimodal.asMediaTable(
        t(s, dir, "documents"), "doc_id", "text", "image",
        Map("width" -> "16", "height" -> "8", "channels" -> "1"))
      val png = graft.llm.Multimodal.reencodeAsPng(media)
      graft.llm.Multimodal.decodeAndFeaturize(png, graft.llm.Multimodal.ImageIoDecoder)
        .select(col("asset_id"), col("width"), col("height"), col("channels"),
          size(col("features")).as("feat_dim"),
          round(aggregate(col("features"), lit(0.0d), (acc, x) => acc + x), 4).as("feat_sum"),
          round(element_at(col("features"), 1).cast("double"), 4).as("feat_0"))
    }),

    // ---- LLM tier-1 dedup, drop form: keep the lowest-id row per
    // content hash (window over the hash — same single shuffle).
    "q20_drop_dups" -> ((s, dir) =>
      graft.llm.Dedup.dropExactDuplicates(
        t(s, dir, "documents"), "text", "doc_id")
        .select("doc_id", "lang", "source", "n_chars")),

    // ---- Full curation pipeline (annotate → quality filter → exact
    // dedup → verified near-dedup). LSH stage is seeded but not
    // SQL-expressible → rows-only check.
    "q22_curation" -> ((s, dir) =>
      graft.llm.Curation.curate(
        t(s, dir, "documents"), "doc_id", "text",
        graft.llm.Curation.Config(minQuality = 0.2))
        .select("doc_id", "quality", "lang_id", "n_tokens")),

    // ---- LLM text quality scoring, one-pass stats form (value-equal to
    // the composable formula the oracle SQL reproduces).
    "q21_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.llm.TextAnalysis.qualityScoreFast(
          graft.llm.TextAnalysis.stats(col("text"))).as("quality"))),

    // ---- One-pass drift sketch (custom TypedImperativeAggregate):
    // both columns' histogram sketches from a single lineitem scan,
    // compared against the EXACT fixed-bin TVD the sketch approximates
    // (continuousComparator semantics: side 1's range fixes the edges,
    // side 2 clamps + renormalizes — HistogramSketchImpl.tvd mirrors
    // exactly this). ORACLE-EXACT via dump-and-replay on the one
    // sketch-internal value (the r14 q95 seam, applied per the r14
    // verdict): the sketch TVD dumps as replay input; DuckDB recomputes
    // the exact TVD from lineitem with the q24 binning idiom and
    // replays the tolerance judgment as data. Columns: price vs the
    // discount-adjusted price — overlapping ranges, so the TVD is a
    // real distribution distance, not the disjoint-range degenerate.
    "q23_sketch_tvd" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").withColumn("l_discounted",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val v = graft.datadiff.DataDiff.continuousComparatorSketchSameTable(
        li, "l_extendedprice", "l_discounted", maxBins = 100)
      val exact = graft.datadiff.DataDiff.continuousComparator(
        li, "l_extendedprice", li, "l_discounted", maxBins = 100)
      dumpAux(Seq(v).toDF("tvd_sketch"), dir, "q23_sketch")
        .select(round(col("tvd_sketch"), 6).as("tvd_sketch"),
          round(lit(exact), 6).as("tvd_exact"),
          (abs(col("tvd_sketch") - lit(exact)) <= lit(0.05)).as("within_tol"))
    }),

    // ---- Structured Streaming: event-time tumbling windows + watermark
    // over the events table, run to completion (AvailableNow). Append
    // mode emits exactly the windows the watermark has passed — the
    // oracle reproduces that cutoff in SQL.
    "q19_stream_window" -> ((s, dir) => {
      val name = s"q19_mem_${StreamRunSeq.incrementAndGet()}"
      graft.streaming.Streams.runToMemory(
        graft.streaming.Streams.windowedEventStats(
          graft.streaming.Streams.readEventStream(s, dir, "events.parquet"),
          windowLength = "1 hour", watermarkDelay = "2 hours"),
        name, org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(4)) // state sized to 5 event types
        // (4 store instances measured fastest on this box: PerfProbe)
        .select(
          // NTZ → instant under the UTC session, then epoch seconds
          // (NTZ has no direct numeric cast)
          col("window_start").cast("timestamp").cast("long").as("window_start"),
          col("window_end").cast("timestamp").cast("long").as("window_end"),
          col("event_type"), col("n_events"), col("avg_value"), col("sum_value"))
    }),

    // ---- Stream-stream interval join: click→prior-views attribution
    // with watermarked state eviction (join state bounded by
    // horizon + delay, not stream length). Inner-join matches emit
    // immediately, and the single AvailableNow batch starts below any
    // watermark cutoff, so the oracle is the plain interval self-join —
    // micro-truncated timestamps compare identically in both engines.
    "q56_stream_join" -> ((s, dir) => {
      val name = s"q56_mem_${StreamRunSeq.incrementAndGet()}"
      graft.streaming.Streams.runToMemory(
        graft.streaming.Streams.attributionJoin(
          graft.streaming.Streams.readEventStream(s, dir, "events.parquet")),
        name, org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(4))
        .select(col("click_id"), col("user_id"),
          unix_micros(col("click_time").cast("timestamp")).as("click_us"),
          col("view_id"), unix_micros(col("view_time").cast("timestamp")).as("view_us"),
          col("view_value"))
    }),

    // ---- R11 continuous (equi-width) histogram: edges fixed by one
    // min/max pass, then a single bounded shuffle (≤ bins keys). The
    // bin arithmetic floor((x−lo)/w) is engine-portable, so this is
    // oracle-exact (reference datadiff.py:27-33 semantics).
    "q24_continuous_hist" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val edges = graft.datadiff.DataDiff.equiWidthEdges(li, "l_extendedprice", 20)
      graft.datadiff.DataDiff.continuousHistogramDF(li, "l_extendedprice", edges)
        .withColumn("freq", round(col("freq"), 6))
    }),

    // ---- IVF ANN quality as data: per-query recall of the cell-pruned
    // probe vs the exact brute-force ranking — against a PERSISTED
    // index (ivfEnsure): KMeans is paid once per corpus version, every
    // later invocation (bench median runs, monitoring at scale) loads
    // the cell-partitioned layout and pays probe + brute only. The
    // index dir is keyed by corpus path + mtime + build params, so a
    // regenerated corpus rebuilds instead of serving stale cells.
    // KMeans is seeded but float-iteration-order dependent → rows-only
    // check; the recall floor itself is pinned in SimilaritySpec.
    "q25_ivf_recall" -> ((s, dir) => {
      import graft.llm.Similarity
      val emb = t(s, dir, "embeddings")
      val src = new java.io.File(s"$dir/embeddings.parquet")
      val idxDir = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_ivf"),
        s"${src.getCanonicalPath.replaceAll("[^A-Za-z0-9.-]", "_")}_m${src.lastModified}_c16_i8")
      val (model, tagged) = Similarity.ivfEnsure(emb, numCells = 16,
        indexDir = idxDir.toString, maxIter = 8) // coarse cells converge
        // fast; probe quality, not centroid polish, dominates recall
      val queries = emb.filter(col("vec_id") < 20)
      // ORACLE-EXACT recall arithmetic (r13): both shortlists dump and
      // DuckDB replays the semi-join/coalesce/round recall program —
      // the ANN ranking itself (KMeans cells) stays rows-only by nature
      Similarity.probeRecall(
        dumpAux(Similarity.bruteForceTopK(queries, emb, k = 10)
          .select("query_id", "neighbor_id"), dir, "q25_brute"),
        dumpAux(Similarity.ivfTopK(queries, tagged, model, k = 10, nprobe = 8)
          .select("query_id", "neighbor_id"), dir, "q25_probe"))
    }),

    // ---- Multimodal/JSON column extraction: typed props out of the
    // events stream table + per-type aggregates (one bounded shuffle).
    "q17_events_json" -> ((s, dir) =>
      tH(s, dir, "events")
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(avg("value"), 4).as("avg_value"),
          round(avg("k"), 4).as("avg_k"),
          max("k").as("max_k"))),

    // ---- Context-window chunking: overlapping token windows per doc,
    // shuffle-free map + bounded explode (CorpusPrep.chunkByTokens).
    "q26_chunking" -> ((s, dir) =>
      graft.llm.CorpusPrep.chunkByTokens(
        t(s, dir, "documents"), "doc_id", "text", chunkSize = 32, overlap = 8)),

    // ---- The same chunking through the native one-pass expression
    // (graft_chunks: byte-boundary scan + byte-range copies, no token
    // array per doc) — verified hash-exactly by the SAME oracle as q26,
    // so HOF and native paths are both under the gate independently.
    "q41_native_chunking" -> ((s, dir) =>
      graft.llm.CorpusPrep.chunkByTokensFast(
        t(s, dir, "documents"), "doc_id", "text", chunkSize = 32, overlap = 8)),

    // ---- As-of join: each click joined to the user's latest preceding
    // view — union + one windowed pass, a single shuffle, no join node
    // (plan pinned in AsofRangeJoinSpec).
    "q27_asof_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val clicks = events.filter(col("event_type") === "click")
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      graft.operators.Ops.asofJoin(clicks, views, Seq("user_id"), "ts",
        Seq("view_id" -> "prior_view_id", "view_value" -> "prior_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("prior_view_id"), lit(-1L)).as("prior_view_id"),
          round(coalesce(col("prior_value"), lit(0.0)), 4).as("prior_value"))
    }),

    // ---- Training-mix composition: per-source deterministic keep
    // fractions via md5 thresholds — reproducible across partitionings,
    // retries, and engines (the oracle runs the SAME predicate).
    "q28_mixture_sample" -> ((s, dir) =>
      graft.llm.CorpusPrep.mixtureSample(
        t(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
        defaultFraction = 0.05, salt = "mix1")
        .select("doc_id", "source", "lang")),

    // ---- Rolling min-hash document fingerprints (shift-tolerant
    // signatures, R-fingerprint): xxhash64-based → no portable SQL
    // equivalent → rows-only check; value semantics pinned in
    // TextAnalysisSpec (shift tolerance + distinctness).
    "q32_fingerprint" -> ((s, dir) => {
      val fp = graft.llm.TextAnalysis.docFingerprint(col("text"), k = 8, m = 4)
      t(s, dir, "documents").select(
        col("doc_id"),
        element_at(fp, 1).as("fp0"), element_at(fp, 2).as("fp1"),
        element_at(fp, 3).as("fp2"), element_at(fp, 4).as("fp3"))
    }),

    // ---- PSI drift score (single scan, same plan family as q12's TVD):
    // the ML-ops standard metric, log-sensitive to new-category mass.
    "q30_psi" -> ((s, dir) =>
      graft.datadiff.DataDiff.psiSameTableDF(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")
        .select(round(col("psi"), 6).as("psi"))),

    // ---- Dimension-chain join: supplier ⋈ nation ⋈ region with BOTH
    // dims broadcast — the snowflake lookup pattern; the fact side
    // (supplier) never shuffles before the aggregate.
    "q36_supplier_region" -> ((s, dir) =>
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_suppliers"),
          round(avg("s_acctbal"), 4).as("avg_acctbal"),
          round(max("s_acctbal"), 2).as("max_acctbal"))),

    // ---- Multi-key rollup over part: brand × size-band aggregation
    // (arithmetic banding — no join needed for fixed-width bands).
    "q37_part_brands" -> ((s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_brand"), (floor(col("p_size") / 10) * 10).cast("long").as("size_band"))
        .agg(count(lit(1)).as("n_parts"),
          round(avg("p_retailprice"), 4).as("avg_retail"))),

    // ---- Column profiling: nulls/distincts/min/max per column in one
    // scan. exact = true here ONLY for the oracle: count(DISTINCT) over
    // 4 columns makes Catalyst plan an Expand of 4 copies of EVERY row
    // (×4 shuffle volume) — the API default (exact = false) is
    // approx_count_distinct (HLL++), partial-aggregated with no Expand,
    // which is the 100 TB shape (plan-asserted in DataDiffSpec).
    "q35_profile" -> ((s, dir) =>
      graft.datadiff.DataDiff.profile(
        t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
        exact = true)),

    // ---- Per-group quantiles via DataDiff.quantiles. exact = true here
    // ONLY because the oracle needs bit-identical linear interpolation
    // (Spark percentile == DuckDB quantile_cont): exact percentile
    // buffers every group value on a 3-key shuffle — an OOM at 100 TB.
    // The API default (exact = false) is approx_percentile: a mergeable
    // bounded-buffer sketch, partial-aggregated — that is the scale
    // path, and QuantilesSpec pins its error against this exact form.
    "q34_quantiles" -> ((s, dir) =>
      graft.datadiff.DataDiff.quantiles(
        t(s, dir, "lineitem"), "l_extendedprice",
        Seq("l_returnflag"), Seq(0.5, 0.95, 0.99), exact = true)
        .select(col("l_returnflag"),
          round(col("p50"), 4).as("p50"),
          round(col("p95"), 4).as("p95"),
          round(col("p99"), 4).as("p99"))),

    // ---- Jensen–Shannon divergence: symmetric, finite drift (no eps),
    // same single-scan pivot as q12/q30.
    "q33_jsd" -> ((s, dir) =>
      graft.datadiff.DataDiff.jsdSameTableDF(
        t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")
        .select(round(col("jsd"), 6).as("jsd"))),

    // ---- Kolmogorov–Smirnov drift between a column and its discounted
    // transform: shared equi-width bins, per-side CDFs, max gap. The
    // cumulative window runs over ≤ 20 rows (bounded by construction).
    "q31_ks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("disc_price", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val edges = graft.datadiff.DataDiff.equiWidthEdges(li, "l_extendedprice", 20)
      graft.datadiff.DataDiff.ksContinuousSameTableDF(li, "l_extendedprice", "disc_price", edges)
        .select(round(col("ks"), 6).as("ks"))
    }),

    // ---- Broadcast range join: band lookup on a non-equi interval
    // condition; the fact side streams unshuffled through a
    // BroadcastNestedLoopJoin against the 3-row band dimension.
    "q29_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 1e9))
        .toDF("band", "lo", "hi")
      graft.operators.Ops.broadcastRangeJoin(
        t(s, dir, "lineitem"), bands, "l_quantity", "lo", "hi")
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("revenue"))
    }),

    // ---- Transitive near-dup clustering under the gate: hub-and-
    // endpoint chains planted from real documents. For each base doc A,
    // hub B = A + k sentinel tokens and endpoint C = B + k more, with
    // k ≈ (n_shingles)/6 so the distinct-trigram Jaccards straddle the
    // 0.8 verify threshold: J(A,B)≈6/7, J(B,C)≈7/8 (both pairs real),
    // J(A,C)≈6/8 (not a near-dup). The hub carries the HIGHEST id, so
    // pair-drop mode (drop the higher id per verified pair) keeps BOTH
    // endpoints, while connected components keeps one survivor (min id)
    // per chain — the two modes must return different counts, which is
    // the exact semantics this entry pins. ORACLE-EXACT drop arithmetic
    // via dump-and-replay (recursive min-label closure in DuckDB); the
    // seeded MinHash candidate step stays rows-only by nature.
    "q38_transitive_dedup" -> ((s, dir) => {
      import s.implicits._
      import graft.llm.Dedup
      // persisted: the pair graph reads the planted frame several times
      // (LSH fit, join sides, verify) — build the variants once. Fanned
      // out BEFORE the persist (r15): the single-row-group source plans
      // as one task, so the cached frame held one partition and the LSH
      // fit + candidate join + Jaccard verify all ran on one core.
      val planted = graft.operators.Ops.fanOutForCompute(
          q38Planted(t(s, dir, "documents")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // The MinHash candidate join + Jaccard verification run ONCE; both
      // drop disciplines derive from the same verified pair graph (the
      // exact semantics curate() applies per mode — its transitive wiring
      // is integration-covered in CurationSpec). Running curate() twice
      // here doubled the dominant LSH cost for no extra signal.
      // keep the API default 5 hash tables: q38's EntrySpec assertions
      // are EXACT (any missed chain edge leaves an endpoint surviving
      // transitive mode), and OR-amplified MinHash misses an edge at
      // J≈0.86 with prob (1−J)^T — 0.3% per edge at T=3 is one broken
      // chain per ~6 corpus regenerations, while T=5 is 6e-5 (review
      // finding: the round-5 T=3 trim had no real margin)
      // ORACLE-EXACT drop arithmetic (r13): the verified pair graph and
      // the planted node list dump as replay inputs — DuckDB replays
      // BOTH drop disciplines (distinct-id2 for pair mode, WITH
      // RECURSIVE min-label closure for transitive mode) over the same
      // tables. What stays rows-only is exactly the seeded MinHash
      // candidate generation that produced the pair graph.
      val verified = dumpAux(Dedup.verifyPairs(
        Dedup.minHashNearDups(planted, "doc_id", "text", maxJaccardDistance = 0.2),
        planted, "doc_id", "text", minJaccard = 0.8)
        .select("id1", "id2"), dir, "q38_pairs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = dumpAux(planted.select(col("doc_id")), dir, "q38_nodes")
      // both drop disciplines counted in ONE job: planted left-joins the
      // two (tiny, broadcast) drop sets and a single aggregate
      // cross-tabulates survivors per mode × cohort — replacing two
      // sequential anti-join agg jobs (the entry is job-overhead-bound)
      val dropPair = broadcast(verified.select(col("id2").as("doc_id")).distinct()
        .withColumn("__dp", lit(1)))
      val dropCc = broadcast(Dedup.connectedComponents(verified)
        .filter(col("id") =!= col("label")).select(col("id").as("doc_id"))
        .withColumn("__dc", lit(1)))
      val isEnd = col("doc_id") >= 10000 && col("doc_id") < 20000
      val isHub = col("doc_id") >= 20000
      val r = nodes
        .join(dropPair, Seq("doc_id"), "left").join(dropCc, Seq("doc_id"), "left")
        .agg(
          count(when(col("__dp").isNull, 1)),
          count(when(col("__dp").isNull && isEnd, 1)),
          count(when(col("__dp").isNull && isHub, 1)),
          count(when(col("__dc").isNull, 1)),
          count(when(col("__dc").isNull && isEnd, 1)),
          count(when(col("__dc").isNull && isHub, 1))).head()
      val (pt, pe, ph) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (tt, te, th) = (r.getLong(3), r.getLong(4), r.getLong(5))
      verified.unpersist()
      planted.unpersist() // counts are eager — nothing reads it again
      Seq(("pair_drop", pt, pe, ph), ("transitive", tt, te, th))
        .toDF("mode", "n_survivors", "n_endpoint_survivors", "n_hub_survivors")
    }),

    // ---- Vector near-dup under the gate: the testdata embeddings are
    // pure random (max natural pairwise cosine ~0.47), so real near-dups
    // are planted in-query — each corpus vector gets a deterministic
    // perturbed copy (±10% multiplicative sin-noise per element, scale-
    // independent → cosine ≈ 0.997, id + 100000), then lshNearDupPairs
    // must surface exactly the planted pairs at cos ≥ 0.95 and nothing
    // else. ORACLE-EXACT (r13): the vectors dump and DuckDB replays
    // exact all-pairs cosine at the same threshold — the seeded LSH
    // candidate generation is pinned to the all-pairs truth.
    "q39_vector_near_dup" -> ((s, dir) => {
      // the corpus slice is capped at 500 vectors (round-5 trim from
      // 1000) for the same reason planting is capped at 500 pairs: the
      // signal (planted found, natural excluded) does not grow with
      // corpus size, the LSH join cost does (PerfProbe 2: 3.4 s → 1.6 s)
      // — and q42 runs the scale-path (SRP) alternative on the same
      // harness. Every corpus vector has a planted copy; the "nothing
      // else" half of the gate still covers all natural×natural and
      // cross base×planted(i≠j) pairs.
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 500)
      // noise BEFORE the id shift (withColumn, not a sibling select
      // alias) so the perturbation is seeded by the base id
      val noisy = emb.filter(col("vec_id") < 500)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => (x * (lit(1.0) + lit(0.1) * sin(col("vec_id") * 7919 + i * 104729))).cast("float")))
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      // ORACLE-EXACT precision + summary (r13): the vectors AND the
      // emitted pair set dump; DuckDB re-derives the exact cosine of
      // every emitted pair and re-applies the 0.95 threshold — a false
      // positive would survive on the Spark side only and go red. The
      // RECALL side stays EntrySpec's planted floor by design: MLlib's
      // OR-amplified LSH misses ~1% of planted pairs (494/500 at
      // sf0.001, the documented ~98%/pair collision odds), so an
      // all-pairs oracle would flag honest probabilistic misses — the
      // pigeonhole-complete alternative is q42's SRP form, which IS
      // pinned to the all-pairs truth.
      val all = dumpAux(emb.unionByName(noisy), dir, "q39_vecs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // bucketLength 0.02: random unit vectors project at ~N(0, 1/√dim),
      // so narrower buckets than the API default keep the candidate set
      // small here; planted pairs project their difference at ~0.01 and
      // still collide in ≥1 of the 4 tables with ~98% probability
      val cand = dumpAux(graft.llm.Similarity.lshNearDupPairs(all,
        maxCosineDistance = 0.05, bucketLength = 0.02).select("id1", "id2"),
        dir, "q39_pairs")
      // re-score with the exact double cosine for the summary: the
      // MLlib distance-derived cos_sim rides FLOAT-normalized vectors
      // (~1e-7 noise), which could flip a 4-decimal rounding against
      // the oracle; both engines now run the same double arithmetic
      // over the same dumped floats
      val pairs = cand
        .join(all.select(col("vec_id").as("id1"), col("embedding").as("__v1")), "id1")
        .join(all.select(col("vec_id").as("id2"), col("embedding").as("__v2")), "id2")
        .select(col("id1"), col("id2"),
          graft.llm.Similarity.cosine(col("__v1"), col("__v2")).as("cos_sim"))
      pairTypeSummary(s, pairs, all)
    }),

    // ---- The same planted-pair harness through SRP signatures + the
    // text-SimHash banded join (Similarity.srpNearDupPairs): the
    // density-independent, knob-free, persistable-state alternative to
    // distance-bucketed LSH (scaladoc derives the collision math).
    // Smaller noise than q39 (0.01 amplitude → cos ≈ 0.99995) because
    // SRP recall targets NEAR-DUPLICATES, not 0.95-neighbors.
    "q42_srp_near_dup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val noisy = emb.filter(col("vec_id") < 500)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => (x * (lit(1.0) + lit(0.01) * sin(col("vec_id") * 7919 + i * 104729))).cast("float")))
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      // ORACLE-EXACT pairing (r13): q39's dump-and-replay at the SRP
      // threshold — srpNearDupPairs already emits the exact double
      // cosine, so the summary needs no re-score
      val all = dumpAux(emb.unionByName(noisy), dir, "q42_vecs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = graft.llm.Similarity.srpNearDupPairs(all, minCosine = 0.999)
      pairTypeSummary(s, pairs, all)
    }),

    // ---- Gap-based batch sessionization (Ops.sessionize): one shuffle
    // on user_id, lag-flag + running sum in a single window scan, then
    // per-session rollup. Times are epoch-MICROS on both sides: ts is a
    // zone-less us-precision timestamp, so Spark unix_micros (via the
    // UTC session) == DuckDB epoch_us exactly.
    "q43_sessionize" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      graft.operators.Ops.sessionize(ev, Seq("user_id"), "ts_us",
          maxGap = 30L * 60 * 1000000, tieBreakCols = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("session_start"),
          max("ts_us").as("session_end"))
    }),

    // ---- Multi-level rollup aggregation: Spark's rollup() plans ONE
    // Expand + one shuffle for all three grouping levels (leaf /
    // per-flag / grand total) — not three scans. Rollup null
    // placeholders are coalesced to 'ALL' (group cols are non-null in
    // data) and grouping_id disambiguates levels; DuckDB's GROUPING()
    // bit order matches Spark's grouping_id (verified: 0/1/3).
    "q45_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("n_rows"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("sum_disc_price"), col("n_rows"), col("gid"))),

    // ---- Full cube aggregation: all FOUR grouping levels (leaf /
    // per-status / per-priority / grand total) from ONE Expand + one
    // shuffle — the cross-dimension rollup q45's ROLLUP cannot express.
    // Shuffle keys ≤ |status|×|priority| ×4 levels, partial-aggregated;
    // grouping_id bit order matches DuckDB GROUPING() (q45 precedent).
    "q54_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n_orders"), col("sum_price"), col("gid"))),

    // ---- Salted skew join under the oracle gate: Ops.saltedJoin
    // spreads one hot key over 16 reducers (salt on the big side,
    // explode ×16 on the small side). The machinery must be INVISIBLE
    // in the result — the oracle runs the PLAIN join, so hash-equality
    // proves salting preserves inner-join semantics exactly.
    "q55_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val ords = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Ops.saltedJoin(li, ords, "l_orderkey", saltFactor = 16)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
    }),

    // ---- Semi/anti join surface: per-nation balance of customers WITH
    // orders (left_semi) and WITHOUT (left_anti). Both plan as one
    // existence join on the key — no row multiplication, the orders
    // side carries only its join key through the shuffle.
    "q57_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      def side(tp: String, label: String) =
        c.join(o, col("c_custkey") === col("o_custkey"), tp)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_customers"),
            round(sum("c_acctbal"), 2).as("sum_bal"))
          .withColumn("segment", lit(label))
      side("left_semi", "active").unionByName(side("left_anti", "inactive"))
    }),

    // ---- Deterministic weighted sampling (Efraimidis–Spirakis
    // bottom-k): 100 lineitems proportional-to-quantity. The rank key
    // is a pure function of (id, salt, weight) → the oracle replays the
    // identical md5 + ln arithmetic in SQL. TakeOrderedAndProject plan:
    // per-partition heaps, exchange carries ≤ k rows per partition.
    "q58_weighted_sample" -> ((s, dir) =>
      graft.operators.Ops.weightedSample(
        tH(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        idCol = concat(col("l_orderkey"), lit("-"), col("l_linenumber")),
        weightCol = col("l_quantity"), k = 100, salt = "q58")),

    // ---- Bounded top-k per group via the TopK TypedImperativeAggregate
    // (map-side ≤k-entry heaps — the exchange carries k rows per
    // partition per group, corpus-size-independent, where the window
    // form shuffles EVERY row). The oracle is the row_number window —
    // hash-equality proves the heap implements exactly that semantic.
    "q59_topk_groups" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(graft.functions.TopK.topK(3)(col("c_acctbal"), col("c_custkey")).as("top"))
        .select(col("c_nationkey"), posexplode(col("top")))
        .select(col("c_nationkey"), (col("pos") + 1).cast("long").as("rank"),
          col("col._2").as("c_custkey"), col("col._1").as("c_acctbal"))),

    // ---- Int8 embedding quantization AS DATA: 4× less storage/shuffle
    // for an embedding store; the quality cost is reported as a query —
    // direction fidelity (self-cosine after round-trip) and top-10
    // KNN recall of the quantized store against the float32 truth.
    // Asserted floors in EntrySpec; not SQL-rankable → rows-only.
    "q53_quantized_recall" -> ((s, dir) => {
      import graft.llm.Similarity
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      // ORACLE-EXACT arithmetic (r13): the dequantized table and both
      // shortlists dump; DuckDB replays the recall program AND the
      // fidelity cosine (against the registered embeddings view) — the
      // quantize/rank kernels stay rows-only by nature
      val deq = dumpAux(Similarity.quantize(emb)
        .select(col("vec_id"),
          Similarity.dequantize(col("q_vec"), col("q_scale")).as("embedding")),
          dir, "q53_deq")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exact = dumpAux(Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 20), emb, k = 10)
        .select("query_id", "neighbor_id"), dir, "q53_exact")
      val quant = dumpAux(Similarity.bruteForceTopK(
        deq.filter(col("vec_id") < 20), deq, k = 10)
        .select("query_id", "neighbor_id"), dir, "q53_quant")
      val recall = Similarity.probeRecall(exact, quant)
        .agg(count(lit(1)).as("n_queries"),
          round(avg("recall"), 4).as("avg_recall"),
          round(min("recall"), 4).as("min_recall"))
      val fidelity = emb.join(deq.withColumnRenamed("embedding", "__deq"), "vec_id")
        .select(Similarity.cosine(col("embedding"), col("__deq")).as("c"))
        .agg(round(min("c"), 6).as("min_self_cos"))
      eagerSummary(s, recall.crossJoin(fidelity), deq)
    }),

    // ---- The scale-safe quantile path AS DATA (the q25-recall
    // pattern): per-group approx_percentile (mergeable sketch, bounded
    // buffers — the plan that survives 100 TB) joined against the exact
    // form (unbounded buffers — oracle-only), reporting worst relative
    // error. ORACLE-EXACT (r13, the recall-as-data idiom upgraded): the
    // approx side's per-group values dump, and DuckDB recomputes the
    // EXACT side INDEPENDENTLY — same md5-predicate sample, its own
    // quantile_cont (the same R-7 interpolation as Spark's percentile)
    // — then replays the error arithmetic. Only the KLL-sketch
    // internals stay unverified; the truth they're judged against is
    // now cross-engine. QuantilesSpec keeps the error-floor pin.
    "q52_quantile_error" -> ((s, dir) => {
      // the EXACT side buffers every group value — monitoring runs it on
      // a deterministic 25% sample so the comparison stays bounded at
      // any scale (both sides see the same sample: the error measured is
      // still sketch-vs-truth on identical data)
      val li = graft.operators.Ops.hashSample(
        t(s, dir, "lineitem"), "l_orderkey", 0.25, salt = "q52")
      val probs = Seq(0.5, 0.95, 0.99)
      def q(exact: Boolean) = graft.datadiff.DataDiff.quantiles(
        li, "l_extendedprice", Seq("l_returnflag"), probs, exact = exact)
      val ex = q(exact = true)
      val ap = q(exact = false)
      val renamed = dumpAux(ap.columns.foldLeft(ap)((d, c) =>
        if (c == "l_returnflag") d else d.withColumnRenamed(c, s"a_$c")),
        dir, "q52_approx")
      ex.join(renamed, "l_returnflag")
        .select(col("l_returnflag") +: probs.map { p =>
          val n = f"p${(p * 100).toInt}%d"
          (abs(col(s"a_$n") - col(n)) / abs(col(n))).as(s"err_$n")
        }: _*)
        .agg(count(lit(1)).as("n_groups"),
          probs.map(p => round(max(col(f"err_p${(p * 100).toInt}%d")), 6)
            .as(f"max_rel_err_p${(p * 100).toInt}%d")): _*)
    }),

    // ---- Pivot/crosstab: hour-of-day × event_type counts + summed
    // value. Pivot values are EXPLICIT (no distinct-collect job — at
    // 100 TB an implicit pivot first scans the data to list columns);
    // one shuffle on ≤24 keys, aggregation pushed partial. The hour is
    // integer epoch-micros arithmetic (matches the oracle's epoch_ns
    // floor-division exactly — both are UTC-epoch based).
    "q51_pivot" -> ((s, dir) => {
      val hour = pmod(call_function("div",
        unix_micros(col("ts").cast("timestamp")), lit(3600L * 1000000L)), lit(24L))
      val types = Seq("view", "click", "purchase", "signup", "error")
      t(s, dir, "events")
        .groupBy(hour.as("hour_utc"))
        .pivot("event_type", types)
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("val"))
        .select(col("hour_utc") +:
          types.flatMap(tp => Seq(
            coalesce(col(s"${tp}_n"), lit(0L)).as(s"${tp}_n"),
            coalesce(col(s"${tp}_val"), lit(0.0)).as(s"${tp}_val"))): _*)
    }),

    // ---- Running totals + moving window per customer: one shuffle on
    // o_custkey, every frame (row_number, cumulative sum, 3-row moving
    // sum, lag) shares the same partitioning/ordering. Money runs in
    // integer CENTS and gaps in epoch-millis so ordered window sums are
    // bit-exact across engines (float accumulation order is not).
    "q50_running_totals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last3 = w.rowsBetween(-2, Window.currentRow)
      // o_orderdate reads as TIMESTAMP_NTZ; the session runs UTC, so the
      // LTZ cast is identity and unix_millis == DuckDB epoch_ms
      val ms = unix_millis(col("o_orderdate").cast("timestamp_ltz"))
      t(s, dir, "orders")
        .withColumn("__cents", round(col("o_totalprice") * 100, 0).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("n_so_far"),
          sum(col("__cents")).over(cum).as("cum_cents"),
          sum(col("__cents")).over(last3).as("last3_cents"),
          coalesce(ms - lag(ms, 1).over(w), lit(-1L)).as("gap_ms"))
    }),

    // ---- Snapshot diff (DataDiff.tableDiff): yesterday's orders vs a
    // planted today — keys %97 removed, prices %13 bumped, %101 re-keyed
    // as additions. One full-outer shuffle join; per-column null-safe
    // comparison replayed verbatim by the oracle (IS NOT DISTINCT FROM).
    "q49_table_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
      val kept = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(13)) === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val added = o.filter(pmod(col("o_orderkey"), lit(101)) === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus"))
      graft.datadiff.DataDiff.tableDiff(o, kept.unionByName(added), Seq("o_orderkey"))
        .groupBy("diff_status")
        .agg(count(lit(1)).as("n_rows"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
    }),

    // ---- PII redaction (TextAnalysis.redact): corpus text has no
    // digits or '@' (checked), so planted snippets are the only matches
    // — email/ip/phone planted on varying doc_id residues, scrubbed by
    // the default rule set. Patterns live in the Java ∩ RE2 regex
    // subset, so the oracle runs them VERBATIM; the redacted text and
    // per-rule counts are hash-exact.
    "q48_pii_redaction" -> ((s, dir) => {
      val id = col("doc_id")
      val planted = tH(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(pmod(id, lit(3)) === 0, lit("")).otherwise(
            concat(lit(" contact user"), id.cast("string"), lit("@example.com"))),
          when(pmod(id, lit(4)) === 0, lit("")).otherwise(
            concat(lit(" from 10.0."), pmod(id, lit(256)).cast("string"), lit(".7"))),
          when(pmod(id, lit(5)) === 0, lit("")).otherwise(
            concat(lit(" tel +1 555 010 "),
              (lit(1000) + pmod(id, lit(9000))).cast("string"))),
          lit(" end")).as("text"))
      planted.select(Seq(col("doc_id"),
        graft.llm.TextAnalysis.redact(col("text")).as("redacted")) ++
        graft.llm.TextAnalysis.redactionCounts(col("text")): _*)
    }),

    // ---- Deterministic train/val/test split (CorpusPrep.hashSplit):
    // consecutive md5-digest ranges, exhaustive + disjoint, stable
    // under repartition/retry/engine — the oracle runs the IDENTICAL
    // threshold predicate, so per-split counts and id extremes are
    // hash-exact.
    "q47_hash_split" -> ((s, dir) =>
      graft.llm.CorpusPrep.hashSplit(
        t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split1")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))),

    // ---- Heavy hitters over the corpus token stream via the mergeable
    // Misra-Gries aggregate (graft_freq_sketch). k=4096 far exceeds the
    // synthetic vocabulary, so no decrement ever fires and every count
    // is EXACT — the property that makes a sketch query oracle-checkable
    // against a plain GROUP BY. Top 20 by (count desc, token) matches
    // the SQL LIMIT under the same deterministic tie-break.
    "q46_heavy_hitters" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(graft.llm.Dedup.tokens(col("text"))).as("token"))
        .agg(graft.functions.FreqSketch.sketch(col("token"), 4096).as("sk"))
        .select(explode(slice(col("sk"), 1, 20)).as("e"))
        .select(col("e.item").as("token"), col("e.count").as("n"))),

    // ---- Okapi BM25 keyword relevance (TextAnalysis.bm25Score): one
    // tiny global-stats aggregate broadcast into one scoring scan.
    // Terms span the idf range of the synthetic vocabulary ("dup" is
    // ~50× rarer than "join"/"scan"). Oracle runs the identical
    // program — same token split, same Lucene-form idf, same operation
    // nesting — so the score is hash-exact at round(4).
    "q44_bm25" -> ((s, dir) =>
      graft.llm.TextAnalysis.bm25Score(
        t(s, dir, "documents"), "doc_id", "text", Seq("dup", "join", "scan"))),

    // ---- Incremental dedup under the gate: a two-batch scenario from
    // the documents table. "Yesterday's corpus" = even doc_ids; its
    // hash + signature + hot-bucket state is built in-query (exactly
    // what the Curator CLI persists between runs). Today's batch = odd
    // doc_ids (fresh) plus planted echoes of the corpus: exact copies
    // (id+30000, caught by the hash tier) and case-changed copies
    // (id+40000 — sha2 differs, but the simhash tokenizer lowercases so
    // the signature tier catches them). Survivors grouped by cohort:
    // the only expected row is ("fresh", n_odd); EntrySpec asserts it.
    "q40_incremental_dedup" -> ((s, dir) => {
      import graft.llm.Dedup
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      // ORACLE-EXACT drop arithmetic (r13, the q62 idiom for the TEXT
      // tiers): corpus hash/signature state and the batch's own
      // (hash, sig) projection — pure functions of text, recomputed for
      // the dump, identical to dropSeen's internal set — dump as replay
      // inputs; DuckDB replays all three tiers (in-batch exact keep-min,
      // exact-vs-seen anti, in-batch + vs-corpus Hamming). Only the
      // sha2/simhash computation itself stays rows-only.
      val seen = dumpAux(
        Dedup.exactDuplicateGroups(corpus, "text", "doc_id").select("content_hash"),
        dir, "q40_seen")
      val sigs = dumpAux(
        Dedup.simHashSignatures(corpus, "doc_id", "text", gramSize = 3),
        dir, "q40_corpus_sigs")
      val hot = Dedup.simHashHotBuckets(sigs)
      val planted = corpus.filter(col("doc_id") < 50)
      val batch = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(planted.select((col("doc_id") + 30000).as("doc_id"), col("text")))
        .unionByName(planted.select((col("doc_id") + 40000).as("doc_id"),
          upper(col("text")).as("text")))
      dumpAux(batch.select(col("doc_id"),
        Dedup.contentHash(col("text")).as("content_hash"),
        Dedup.simHash(col("text"), gramSize = 3).as("sig")), dir, "q40_batch")
      Dedup.dropSeen(batch, "text", "doc_id", seen, sigs,
        gramSize = 3, corpusHotBuckets = Some(hot))
        .groupBy(
          when(col("doc_id") >= 40000, "near_echo")
            .when(col("doc_id") >= 30000, "exact_echo")
            .otherwise("fresh").as("cohort"))
        .agg(count(lit(1)).as("n_survivors"))
    }),

    // ---- BPE-budget chunking under the gate: greedy-pack whitespace
    // tokens until the chunk's REAL subword count (under a merge table
    // of common English merges, written deterministically at first use)
    // would exceed the budget. ORACLE-EXACT packing (r13): the per-
    // whitespace-token subword counts dump (`graft_bpe_count` per token
    // — the chunker's own countOf) and DuckDB replays the sequential
    // greedy fill as a recursive CTE (cut before the token that would
    // exceed the budget; a lone over-budget token keeps its own chunk).
    // Only the merge-table segmentation behind each count stays
    // rows-only; EntrySpec keeps the budget-adherence asserts.
    "q60_bpe_chunking" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      dumpAux(docs.select(col("doc_id"),
          posexplode(filter(split(col("text"), "\\s+"), t => length(t) > 0))
            .as(Seq("idx", "tok")))
        .select(col("doc_id"), col("idx"),
          graft.functions.GraftFunctions.bpeCount(col("tok"), q60MergesPath)
            .as("n_bpe")),
        dir, "q60_tokens")
      graft.llm.CorpusPrep.chunkByBpeBudget(docs,
        "doc_id", "text", bpeBudget = 128, mergesPath = q60MergesPath)
        .select("doc_id", "chunk_id", "chunk_tokens", "chunk_bpe_tokens")
    }),

    // ---- Multimodal AUDIO plumbing through the REAL codec (the q18
    // pattern for sound): deterministic PCM derived from each document
    // is encoded as genuine 16-bit WAV bytes in-query (reencodeAsWav),
    // then decoded by javax.sound.sampled (WavDecoder — frame count
    // from the RIFF header, samples from the PCM payload). Not
    // SQL-expressible → rows-only; MultimodalSpec keeps the raw
    // bit-exactness asserts.
    "q61_audio_decode" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text", "audio",
        Map("width" -> "256", "height" -> "1", "channels" -> "1"))
      val wav = Multimodal.reencodeAsWav(media)
      Multimodal.decodeAndFeaturize(wav, Multimodal.WavDecoder, featureDim = 8)
        .select(col("asset_id"), col("width").as("n_frames"), col("channels"),
          size(col("features")).as("feat_dim"),
          round(aggregate(col("features"), lit(0.0d), (acc, x) => acc + x), 4).as("feat_sum"))
    }),

    // ---- Incremental VECTOR dedup under the gate (the q40 pattern for
    // embeddings, the tier the Curator's embedding-column now drives):
    // "yesterday's corpus" = even vec_ids, its 8-byte SRP signature +
    // hot-bucket state built in-query; today's batch = odd vec_ids
    // (fresh) plus planted echoes of the corpus — rescaled copies
    // (id+30000; cosine exactly 1, so the signature tier must catch
    // every one). Survivors grouped by cohort: the only expected row is
    // ("fresh", n_odd). ORACLE-EXACT (r13): the signature/vector tables
    // dump and DuckDB replays both drop tiers; only the seeded
    // hyperplane generation stays rows-only.
    "q62_incremental_vector_dedup" -> ((s, dir) => {
      import graft.llm.{Dedup, Similarity}
      // vec_id < 1000 cap: the cohort signal (50 planted echoes all
      // dropped, fresh kept) is corpus-size-independent; the two banded
      // joins' cost is not — same budget rule as q38/q39/q63
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 1000)
      val corpus = emb.filter(col("vec_id") % 2 === 0)
      // "yesterday's corpus" signature state comes from the persisted
      // layout (marker-gated, built on first touch) — the production
      // arrival shape: an increment never re-derives corpus state, it
      // reads what the last run committed (signatures are a pure
      // function of (vector, seed), so the layout is run-stable)
      val sigs0 = ensureState(s, statePath(dir, "q62_sigs")) {
        Similarity.srpSignatures(corpus)
      }
      // ORACLE-EXACT drop arithmetic (r13): corpus signatures, batch
      // signatures (pure function of vector + seed — recomputed for the
      // dump, identical to dropSeenVectors' internal set), and batch
      // vectors dump as replay inputs; DuckDB replays BOTH tiers (the
      // signature-only corpus tier at the derived Hamming budget, the
      // cosine-verified in-batch tier) over the same tables. The seeded
      // hyperplanes behind the signatures stay rows-only by nature.
      val sigs = dumpAux(sigs0, dir, "q62_corpus_sigs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hot = Dedup.simHashHotBuckets(sigs)
      val echoes = corpus.filter(col("vec_id") < 100)
        .select((col("vec_id") + 30000).as("vec_id"),
          transform(col("embedding"), x => (x * 0.5f).cast("float")).as("embedding"))
      val batch = dumpAux(emb.filter(col("vec_id") % 2 === 1).unionByName(echoes),
          dir, "q62_batch_vecs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dumpAux(Similarity.srpSignatures(batch), dir, "q62_batch_sigs")
      // survivors come back persisted+materialized (the dropSeenVectors
      // contract) — list them for release alongside the inputs
      val survivors = Similarity.dropSeenVectors(batch, sigs,
        corpusHotBuckets = Some(hot))
      eagerSummary(s,
        survivors
          .groupBy(when(col("vec_id") >= 30000, "echo").otherwise("fresh").as("cohort"))
          .agg(count(lit(1)).as("n_survivors")),
        sigs, batch, survivors)
    }),

    // ---- Benchmark decontamination (train/test overlap): distinct
    // 8-gram hits of each corpus doc against a benchmark set (docs
    // 0-9), with planted echoes (id+50000 copies of the benchmark) so
    // the gate signal is corpus-independent. The benchmark gram set
    // broadcasts; the corpus side is scan + explode + broadcast
    // semi-join — no corpus-vs-corpus join. Oracle replays the same
    // tokenize/shingle/semi-join program in SQL → hash-exact.
    "q63_contamination" -> ((s, dir) => {
      // corpus slice doc_id < 1500: the gate signal (planted echoes
      // flagged, 5-gram-only overlaps not) is corpus-size-independent;
      // the 8-gram explode cost is not — same budget rule as q38/q39
      val docs = tH(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 1500)
      val bench = docs.filter(col("doc_id") < 10)
      val corpus = docs.filter(col("doc_id") >= 10)
        .unionByName(bench.select((col("doc_id") + 50000).as("doc_id"), col("text")))
      graft.llm.TextAnalysis.contaminationHits(
        corpus, bench, "doc_id", "text", "text", n = 8)
    }),

    // ---- Within-document repetition (Gopher-style quality signal):
    // duplicate word-trigram fraction per document — boilerplate and
    // keyword stuffing score high, natural prose near 0. Pure HOF
    // projection at scan speed; the oracle replays the identical
    // list program in SQL → hash-exact.
    // (doc_id < 1500 on both forms AND the shared oracle: the HOF form
    // exists to pin semantics, not to scan corpora — the native q65
    // form is the one that runs at scale, and TextAnalysisSpec proves
    // them bit-identical over the FULL table)
    "q64_repetition" -> ((s, dir) =>
      tH(s, dir, "documents").filter(col("doc_id") < 1500).select(col("doc_id"),
        round(graft.llm.TextAnalysis.repetitionScore(col("text"), 3), 6).as("rep3"))),

    // ---- The same semantics through the native one-pass expression
    // (graft_repetition — exact byte-compare distinctness in an
    // open-addressing table, no per-gram String): both forms are
    // hash-exact against the SAME oracle, proving the fast path
    // implements precisely the declared program (the q26/q41 pattern).
    "q65_native_repetition" -> ((s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 1500).select(col("doc_id"),
        round(graft.llm.TextAnalysis.repetitionScoreFast(col("text"), 3), 6).as("rep3"))),

    // ---- Sequence packing: chunks → fixed-token-budget training
    // sequences by bucketed offset binning (one shuffle on the bucket
    // key, one running-sum window per bucket — never a global order).
    // The oracle replays bucket → cumsum → floor boundary arithmetic
    // in SQL over the SAME chunk set, so the packing is hash-exact.
    "q66_pack_sequences" -> ((s, dir) => {
      val chunks = graft.llm.CorpusPrep.chunkByTokensFast(
        t(s, dir, "documents"), "doc_id", "text", chunkSize = 32, overlap = 8)
      graft.llm.CorpusPrep.packSequences(
        chunks, "doc_id", "chunk_tokens", budget = 256, buckets = 8)
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_chunks"), sum("chunk_tokens").as("seq_tokens"))
    }),

    // ---- Streaming incremental dedup against persisted corpus state
    // (Streams.dropSeenStream — the streaming arrival path of the
    // Curator's exact tier): corpus = even doc_ids' content hashes
    // (static), stream = odd doc_ids; corpus-seen texts are dropped by
    // a stateless stream-static anti-join, in-stream duplicates
    // collapse within the watermark. Output = surviving TEXTS (the id
    // kept per duplicate group is arrival-order-arbitrary; the text
    // set is deterministic), which the oracle replays as a plain
    // NOT EXISTS + DISTINCT — oracle-exact streaming semantics.
    "q68_stream_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val seen = docs.filter(col("doc_id") % 2 === 0)
        .select(graft.llm.Dedup.contentHash(col("text")).as("content_hash")).distinct()
      val name = s"q68_mem_${StreamRunSeq.incrementAndGet()}"
      // the streaming file source takes a DIRECTORY; select the one
      // table file with the glob (the readEventStream pattern)
      val stream = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .filter(col("doc_id") % 2 === 1)
        .withColumn("__ts", col("doc_id") * lit(1000000L)) // doc_id ms as nanos
      graft.streaming.Streams.runToMemory(
        graft.streaming.Streams.dropSeenStream(stream, seen, "text", timeCol = "__ts"),
        name, org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(4))
        .select("text")
    }),

    // ---- The full training-export chain: chunk → pack → ASSEMBLE one
    // text row per sequence (ordered concat via sort_array over
    // (doc_id, chunk_id) structs — collect_list alone has no order
    // guarantee). The oracle replays the assembly with
    // `string_agg(... ORDER BY ...)` over the same packing CTEs, so
    // even the concatenated text is hash-exact.
    "q67_assemble_sequences" -> ((s, dir) => {
      val chunks = graft.llm.CorpusPrep.chunkByTokensFast(
        t(s, dir, "documents"), "doc_id", "text", chunkSize = 32, overlap = 8)
      val packed = graft.llm.CorpusPrep.packSequences(
        chunks, "doc_id", "chunk_tokens", budget = 256, buckets = 8)
      graft.llm.CorpusPrep.assembleSequences(packed)
    }),

    // ---- Packing density as DATA (CorpusPrep.packingReport): totals,
    // efficiency, and the underfull/overfull split of the q66 packing.
    // The one-underfull-per-bucket invariant of offset-bin packing is
    // emitted as max_underfull_per_bucket (spec-pinned ≤ 1); integer
    // arithmetic + one division → the oracle replays it exactly.
    "q87_packing_report" -> ((s, dir) => {
      val chunks = graft.llm.CorpusPrep.chunkByTokensFast(
        t(s, dir, "documents"), "doc_id", "text", chunkSize = 32, overlap = 8)
      val packed = graft.llm.CorpusPrep.packSequences(
        chunks, "doc_id", "chunk_tokens", budget = 256, buckets = 8)
      graft.llm.CorpusPrep.packingReport(packed, budget = 256)
    }),

    // ---- Incremental corpus cardinality (Cardinality.sketchState /
    // mergeStates / report): per-lang distinct-doc and distinct-token
    // estimates from TWO batch HLL states (even/odd doc_ids) merged
    // without rescanning either batch — the mergeable data-card
    // statistic exact counting cannot provide incrementally.
    // ORACLE-EXACT via dump-and-replay on the report seam (the r14 q95
    // idiom, applied per the r14 verdict): the merged per-lang
    // ESTIMATES (the one sketch-internal step — one row per lang) dump
    // as replay input; DuckDB recomputes the EXACT distinct docs and
    // tokens from the documents table and replays the within-tolerance
    // judgment as data. Only the HLL register arithmetic stays
    // unverified; EntrySpec additionally pins merge == single-pass.
    "q89_cardinality" -> ((s, dir) => {
      import graft.llm.Cardinality
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      val merged = Cardinality.mergeStates(Seq(
        Cardinality.sketchState(docs.filter(col("doc_id") % 2 === 0), Seq("lang")),
        Cardinality.sketchState(docs.filter(col("doc_id") % 2 === 1), Seq("lang"))),
        Seq("lang"))
      val est = dumpAux(
        Cardinality.report(merged, Seq("lang")), dir, "q89_est")
      val exactDocs = docs.groupBy("lang")
        .agg(count_distinct(col("text")).as("exact_docs"))
      val exactToks = docs
        .select(col("lang"), explode(graft.llm.Dedup.tokens(col("text"))).as("__tok"))
        .groupBy("lang")
        .agg(count_distinct(col("__tok")).as("exact_tokens"))
      // lgK=12 → ~1.6% RSE; 5% (floored at ±2 for tiny groups) is >3σ
      def ok(estC: Column, exactC: Column) =
        abs(estC - exactC) <= greatest(lit(2.0), lit(0.05) * exactC)
      est.join(exactDocs, Seq("lang"))
        .join(exactToks, Seq("lang"), "left")
        .withColumn("exact_tokens", coalesce(col("exact_tokens"), lit(0L)))
        .select(col("lang"), col("distinct_docs"), col("distinct_tokens"),
          col("exact_docs"), col("exact_tokens"),
          ok(col("distinct_docs"), col("exact_docs")).as("docs_within_tol"),
          ok(col("distinct_tokens"), col("exact_tokens")).as("tokens_within_tol"))
        .orderBy("lang")
    }),

    // ---- Per-group quantile filter: keep the top 25% of documents by
    // length WITHIN each language — the "top X% quality per language"
    // curation step a global cut gets wrong. This is the EXACT
    // (percent_rank window) form, whose arithmetic DuckDB replays
    // verbatim → oracle-exact; the API default (keepTopQuantile) is the
    // scale path — approx-percentile thresholds (one row per group)
    // broadcast into a scan filter, no per-group window — and
    // CurationSpec pins the two forms' agreement.
    "q69_quantile_filter" -> ((s, dir) =>
      graft.llm.Curation.keepTopQuantileExact(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "n_chars", keepFraction = 0.25)),

    // ---- Deterministic corpus shuffle for training export: a
    // reproducible pseudo-random permutation keyed by the shared md5
    // sampling digest (salt = epoch), planned as repartitionByRange +
    // local sort — a distributed total sort, nothing funnels through
    // one task. The oracle replays the key derivation verbatim; the
    // ORDER itself (range-partitioned, monotone across partitions,
    // salt-sensitive) is pinned in CorpusPrepSpec — the driver compare
    // is order-insensitive by design.
    "q70_corpus_shuffle" -> ((s, dir) =>
      graft.llm.CorpusPrep.deterministicShuffle(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", salt = "epoch1")),

    // ---- SemDeDup (Abbas et al. 2023): semantic dedup = KMeans cells
    // over L2-NORMALIZED embeddings, within-cell cosine pair graph,
    // one survivor per connected component (keep = farthest from its
    // cell centroid, the paper's diversity-preserving choice). Planted
    // triples {base, 1.5× rescale (cos 1.0), tiny perturbation} must
    // collapse to ONE survivor each; untouched vectors all survive.
    // KMeans is float-iteration-order dependent → rows-only; the
    // accounting is pinned in EntrySpec.
    "q73_semdedup" -> ((s, dir) => {
      import graft.llm.Similarity
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 300)
      val rescaled = emb.filter(col("vec_id") < 30)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => (x * lit(1.5f)).cast("float")).as("embedding"))
      val noisy = emb.filter(col("vec_id") < 30)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => (x * (lit(1.0) + lit(0.002) * sin(col("vec_id") * 31 + i))).cast("float")))
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
      // ORACLE-EXACT survivor accounting (r13): the corpus dumps and
      // DuckDB replays the GLOBAL closure — all-pairs cosine >= 0.99 →
      // min-label components → one survivor per component, counted per
      // class (component members never span classes, so the class
      // counts are independent of WHICH member far-from-centroid
      // keeps). Equality also pins the within-cell candidate stage to
      // the global truth; only the KMeans cell fit stays rows-only.
      val corpus = dumpAux(emb.unionByName(rescaled).unionByName(noisy),
          dir, "q73_vecs")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the KMeans cell assignment comes from the marker-gated persisted
      // index (ivfEnsure) — the fit is paid once per corpus version, the
      // production shape; every bench pass reads the cell-partitioned
      // layout and runs only the within-cell pair/CC stages.
      // 64 cells for ~100k vectors: within-cell pair-gen is quadratic
      // per cell, so cells ∝ corpus size keeps it linear-ish (measured:
      // 8 cells = 1.2B cosine pairs ≈ 35 s of task time; 64 cells ≈ 8×
      // less). Cohort semantics are cell-count-independent — exact and
      // rescaled copies L2-normalize to IDENTICAL vectors, so a planted
      // triple always shares one cell. Cell count keys the state path.
      val (model, tagged) = Similarity.ivfEnsure(
        Similarity.semDedupPrep(corpus), numCells = 64,
        indexDir = statePath(dir, "q73_ivf64"), vecCol = "__nv", maxIter = 8)
      val survivors = Similarity.semDedupWithIndex(corpus, model, tagged,
        minCosine = 0.99, keepPolicy = "far-from-centroid")
      val out = eagerSummary(s, survivors
        .groupBy(when(col("vec_id") < 30 || col("vec_id") >= 100000L, "triple")
          .otherwise("untouched").as("vec_class"))
        .agg(count(lit(1)).as("n_survivors")), corpus)
      survivors.unpersist()
      out
    }),

    // ---- CCNet-style LM quality scoring, composable REFERENCE form:
    // unigram LM (Laplace-smoothed, minCount-bounded vocab) trained on
    // a reference slice, every other document scored by avg log10
    // token probability. Integer counts + one shared denominator make
    // the arithmetic SQL-replayable → oracle-exact; round(6) absorbs
    // the libm-vs-StrictMath log10 1-ulp gap (the q58 caveat class).
    // Scale note: this form shuffles corpus TOKENS (explode+groupBy) —
    // it exists as the oracle anchor; q72 is the shape you run at
    // 100 TB, and LangModelSpec pins the two bit-identical.
    "q71_lm_logprob" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainUnigram(
        docs.filter(col("doc_id") < 100), "text", minCount = 2)
      LangModel.logProbPerDoc(
        docs.filter(col("doc_id") >= 100), lm, "doc_id", "text")
        .select(col("doc_id"), round(col("lm_logp"), 6).as("lm_logp"),
          col("lm_tokens"))
    }),

    // ---- The same scores through the SCALE path: LM saved as one
    // small file, loaded once per executor JVM (LmRegistry), scoring a
    // zero-shuffle codegen'd projection (graft_lm_logprob) — no
    // explode, no token shuffle, no join. Same oracle as q71 pins the
    // native expression hash-exactly (the q41/q65 pattern). Train+save
    // is paid per run because the reference slice is tiny; at scale
    // the artifact is built once and shipped like the BPE merges.
    "q72_lm_native" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainUnigram(
        docs.filter(col("doc_id") < 100), "text", minCount = 2)
      val lmPath = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm"),
        s"${dir.replaceAll("[^A-Za-z0-9.-]", "_")}_mc2.lm").toString
      LangModel.save(lm, lmPath)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.lmLogProb(col("text"), lmPath), 6)
            .as("lm_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("lm_tokens"))
        .filter(col("lm_logp").isNotNull)
    }),

    // ---- Temperature-scaled domain mixing: rates derived from the
    // observed per-source counts (∝ n^(alpha-1), largest rate pinned to
    // budget), decisions from the shared numeric unit uniform. The
    // corpus is skewed deterministically (doc_id ≡ 0 mod src#+2) so
    // the temperature actually has something to flatten; the oracle
    // replays count→pow→least→compare arithmetic verbatim.
    "q74_temperature_mix" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("source"))
        .filter(col("doc_id") % (substring(col("source"), 4, 5).cast("int") + lit(2)) === 0)
      graft.llm.CorpusPrep.temperatureMix(
        corpus, "doc_id", "source", alpha = 0.5, budget = 0.9, salt = "q74")
    }),

    // ---- Epoched mixture (the UP-sampling half next to q74's
    // temperature down-sampling): per-source repetition factors — the
    // GPT-3/Llama/Dolma "epochs per source" recipe. floor(w) full
    // copies + one more for the deterministic md5-fraction frac(w) of
    // the source's docs, every copy tagged with its epoch index. The
    // oracle replays weight lookup, 60-bit uniform, and
    // generate_series explosion verbatim.
    "q102_epoch_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      graft.llm.CorpusPrep.epochMix(docs, "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 0.0, "src3" -> 3.0),
        defaultWeight = 1.0, salt = "q102")
    }),

    // ---- Gopher rule-based quality filter (Rae et al. 2021 §A1.1):
    // per-rule evidence, per-rule pass booleans (as int for cross-engine
    // hashing), and the conjunction `keep` — one scan projection whose
    // every rule (token split, replace-counting, line fractions,
    // stopword intersection) the oracle replays in SQL. Flags compare
    // UNROUNDED IEEE ratios in both engines; only the reported evidence
    // columns round.
    "q104_gopher_rules" -> ((s, dir) => {
      val num = Seq("n_words", "mean_word_len", "hash_ratio", "ellipsis_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac", "stop_hits")
      val flags = Seq("ok_word_count", "ok_word_len", "ok_symbols", "ok_bullets",
        "ok_ellipsis_lines", "ok_alpha", "ok_stopwords", "keep")
      tH(s, dir, "documents")
        .select(col("doc_id"), graft.llm.TextAnalysis.gopherFlags(col("text")).as("g"))
        .select(col("doc_id") +: (num.map(f => col(s"g.$f").as(f)) ++
          flags.map(f => col(s"g.$f").cast("int").as(f))): _*)
    }),

    // ---- C4 cleaning filter (Raffel et al. 2020 §2.2): line-level
    // retention (terminal punctuation, >=3 words, no "javascript")
    // REWRITES the text; page rules (>=5 sentences over retained
    // lines, no '{', no "lorem ipsum", no bad word) decide `keep`.
    // One scan projection; every rule — line filtering, the joined
    // clean text, terminal-punct sentence counting, substring and
    // whole-word page checks — replays in SQL.
    // The synthetic corpus has no punctuation or newlines (every page
    // would fail line retention), so — the q75 planting pattern — the
    // query builds a multi-line page per doc in BOTH engines: a kept
    // prose line, a too-short line, a javascript line, an
    // unterminated line, and doc_id-keyed sentence/lorem/brace/badword
    // lines, so every rule fires both ways (~100 keeps at sf0.001).
    "q105_c4_rules" -> ((s, dir) => {
      val planted = concat(
        substring(col("text"), 1, 80), lit(" end."),
        lit("\ntoo short."),
        lit("\nplease enable Javascript now."),
        lit("\nno terminal punctuation here"),
        when(col("doc_id") % 3 === 0,
          lit("\nOne more. And another! Question? Sure. Done.")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit("\ncode block { x } inside.")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit("\nwell shit happens sometimes.")).otherwise(lit("")))
      val f = graft.llm.TextAnalysis.c4Flags(planted)
      t(s, dir, "documents")
        .select(col("doc_id"), f.as("c"))
        .select(col("doc_id"),
          col("c.n_lines").as("n_lines"),
          col("c.n_lines_kept").as("n_lines_kept"),
          col("c.n_sentences").as("n_sentences"),
          col("c.has_brace").cast("int").as("has_brace"),
          col("c.has_lorem").cast("int").as("has_lorem"),
          col("c.has_badword").cast("int").as("has_badword"),
          col("c.clean_text").as("clean_text"),
          col("c.keep").cast("int").as("keep"))
    }),

    // ---- Text normalization (the pre-hashing stage every cross-source
    // ---- Text normalization through the ALGORITHMIC mojibake fixer
    // (normalizeTextFull — graft_fix_mojibake re-decodes any cp1252/
    // latin-1-rendered UTF-8, looped for double encodings; the
    // production default since round 10), then CRLF→LF + control
    // stripping, Unicode NFC via the native graft_nfc expression. The
    // corpus is plain ASCII (spec-guarded), so the query plants the
    // constructs identically in both engines: list-covered repairs,
    // repairs OUTSIDE any list (&dagger;-class ‡, š), a DOUBLE-encoded
    // quote the algorithm unwinds in two passes, and a legitimate
    // "Ã " that must survive unrepaired (no continuation glyph
    // follows). LOCKSTEP: the oracle replays exactly the planted
    // sequences — adding one here requires adding its replace there.
    "q106_normalize_text" -> ((s, dir) => {
      val planted = concat(
        substring(col("text"), 1, 40),
        lit(" cafÃ© â€œquotedâ€"),
        lit(" âdash"),
        // outside the core list: double dagger (cp1252 rendering of
        // E2 80 A1) and s-caron (C5 A1); a two-layer double encoding
        // of the right single quote; a legit standalone "Ã "
        lit(" â€¡x Å¡ip"),
        lit(" Ã¢â‚¬â„¢twice"),
        lit(" Ã stays"),
        lit("\r\nLine2 étude"),
        lit("bellctrl"))
      t(s, dir, "documents").select(col("doc_id"),
          graft.llm.TextAnalysis.normalizeTextFull(planted).as("text_norm"))
        .withColumn("n_chars", length(col("text_norm")).cast("long"))
    }),

    // ---- Product-quantization ANN (Jégou et al. 2011): codebook
    // ensured once per corpus version (marker-gated, the q25 pattern),
    // corpus encoded to m byte-sized codes (4·dim → m bytes/vector),
    // queries ADC-shortlist + exact re-rank on the shortlist only.
    // KMeans is seeded but float-iteration-order dependent → rows-only;
    // the recall floor is pinned in EntrySpec/SimilaritySpec.
    "q103_pq_recall" -> ((s, dir) => {
      import graft.llm.Similarity
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val cb = Similarity.pqEnsure(emb, m = 8, k = 32,
        indexDir = statePath(dir, "q103_pq"), maxIter = 8)
      val codes = Similarity.pqEncode(emb, cb)
      val queries = emb.filter(col("vec_id") < 20)
      // ORACLE-EXACT recall arithmetic (r13): the q25 dump-and-replay
      // over the PQ-ADC shortlists; codebook training stays rows-only
      val brute = dumpAux(Similarity.bruteForceTopK(queries, emb, k = 10)
        .select("query_id", "neighbor_id"), dir, "q103_brute")
      val probe = dumpAux(Similarity.pqAdcTopKReranked(
        queries, codes, cb, emb, k = 10, oversample = 8)
        .select("query_id", "neighbor_id"), dir, "q103_probe")
      Similarity.probeRecall(brute, probe)
        .agg(count(lit(1)).as("n_queries"),
          round(avg("recall"), 4).as("avg_recall"),
          round(min("recall"), 4).as("min_recall"))
        .withColumn("bytes_per_vec_raw", lit(cb.dim * 4))
        .withColumn("bytes_per_vec_pq", lit(cb.m))
    }),

    // ---- Line-level boilerplate removal: lines verbatim-shared by
    // ≥ minDocFreq docs are dropped everywhere, the rest reassembled in
    // order. Header/footer planted on every doc (df 200) and a promo
    // line on every 4th (df 50) must vanish at minDocFreq=10; the rare
    // tag (df ≈ 2–3 per doc_id%97 value) and the natural one-line body
    // survive. Oracle replays split→count→anti-join→string_agg.
    "q75_boilerplate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(
            lit("graft common header\n"), col("text"),
            when(col("doc_id") % 4 === 0, lit("\npromo line")).otherwise(lit("")),
            concat(lit("\nrare tag "), (col("doc_id") % 97).cast("string")),
            lit("\ngraft common footer")).as("text"))
        .filter(col("doc_id") < 200)
      graft.llm.TextAnalysis.stripBoilerplate(
        docs, "doc_id", "text", minDocFreq = 10)
    }),

    // ---- Exact duplicated-span removal (Lee et al. substring dedup):
    // a 12-token passage planted on every 5th doc (and twice on doc 7)
    // must survive only at its globally-first occurrence; every other
    // copy is cut and the doc rebuilt around it. q76 runs the
    // SQL-replayable string-span form, q77 the native rolling-hash
    // scale path — BOTH against the same oracle (the q41/q65 pattern).
    "q76_span_dedup" -> ((s, dir) =>
      graft.llm.Dedup.removeDuplicateSpans(
        SpanDedupCorpus(t(s, dir, "documents")), "doc_id", "text",
        n = 10, hashSpans = false)),
    "q77_span_dedup_native" -> ((s, dir) =>
      graft.llm.Dedup.removeDuplicateSpans(
        SpanDedupCorpus(t(s, dir, "documents")), "doc_id", "text",
        n = 10, hashSpans = true)),

    // ---- BPE merge learning (tokenizer training): Spark counts
    // pretokens corpus-scale, the (inherently sequential) merge loop
    // runs driver-side on the bounded frequency table. Rows-only by
    // design — the loop is not SQL-expressible; EntrySpec re-derives
    // merge 1 from raw pair counts independently and round-trips the
    // table through the graft_bpe_* consumers.
    "q78_bpe_learn" -> ((s, dir) => {
      import s.implicits._
      val merges = graft.llm.BpeTrainer.learnMerges(
        t(s, dir, "documents").select(col("text")), "text", numMerges = 12)
      merges.zipWithIndex
        .map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("rank", "left", "right")
    }),

    // ---- BPE id ENCODING for training export (graft_bpe_encode): the
    // learned tokenizer applied end-to-end — merges + vocab trained on
    // docs < 100 (the q78 trainer), every doc encoded to int token ids
    // at scan speed (registry-loaded table + vocab, codegen'd, zero
    // shuffle). Per-doc output: id count, <unk> count, and an integer
    // id checksum so value drift is visible, not just lengths. The
    // greedy segmentation is not SQL-expressible → rows-only; EntrySpec
    // pins zero <unk>s on the training slice, size(ids)==bpe_count
    // parity, and decode round-trip at the API level.
    "q90_bpe_encode" -> ((s, dir) => {
      import graft.llm.BpeTrainer
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val train = docs.filter(col("doc_id") < 100)
      val base = statePath(dir, "q90_bpe")
      val mergesPath = s"$base/merges.txt"
      val vocabPath = s"$base/vocab.txt"
      // artifacts are mtime-keyed (statePath): regenerated corpora
      // retrain instead of serving a stale tokenizer. The retrain gate
      // is a _DONE marker written AFTER both artifacts (the ensureState
      // _BUILT idiom): gating on merges.txt — the first artifact — left
      // a crash between the two saves permanently half-built, since the
      // mtime key only changes when the data does.
      val doneMarker = new java.io.File(base, "_DONE")
      if (!doneMarker.exists()) {
        val merges = BpeTrainer.learnMerges(train, "text", numMerges = 64)
        BpeTrainer.saveMerges(s, mergesPath, merges)
        // byteFallback = false ON PURPOSE: q90 pins the LEGACY vocab
        // contract — size(ids) == graft_bpe_count for every doc (one id
        // per segment) and <unk> = 0 marking out-of-vocab segments.
        // The total-encoding contract (byte fallback, <unk> impossible,
        // lossless round-trip) is q109's gate.
        BpeTrainer.saveVocab(s, vocabPath,
          BpeTrainer.buildVocab(train, "text", merges, byteFallback = false))
        doneMarker.createNewFile(): Unit
      }
      val ids = graft.functions.GraftFunctions.bpeEncode(col("text"), mergesPath, vocabPath)
      docs.select(col("doc_id"),
          ids.as("__ids"))
        .select(col("doc_id"),
          size(col("__ids")).cast("long").as("n_ids"),
          size(filter(col("__ids"), i => i === 0)).cast("long").as("n_unk"),
          aggregate(col("__ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))
    }),

    // ---- Byte-fallback TOTAL encoding (GPT-2/SentencePiece
    // byte_fallback): tokenizer trained on doc_id < 100, the HELD-OUT
    // slice encoded under a byte-fallback vocab — unseen segments
    // degrade to their UTF-8 bytes through the reserved <0xNN> tokens,
    // so <unk> is structurally impossible on ANY input; and the
    // lossless form (whitespace rides the byte tokens too) decodes back
    // byte-for-byte. Every 7th held-out doc gets characters the
    // training slice cannot contain appended (the corpus is ASCII), so
    // the fallback path provably fires. rows-only: BPE segmentation is
    // not SQL-expressible; EntrySpec pins zero-unk on the WHOLE
    // held-out slice, fallback-fired, and round-trip parity.
    "q109_bpe_byte_fallback" -> ((s, dir) => {
      val docs = tH(s, dir, "documents").select(col("doc_id"), col("text"))
      val (mergesPath, vocabPath) =
        ensureBpeArtifacts(s, dir, "q109_bpe_fb", byteLevel = false)
      val heldOut = docs.filter(col("doc_id") >= 100)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" naïve ☃😀")))
            .otherwise(col("text")))
      val ids = graft.functions.GraftFunctions.bpeEncodeLossless(
        col("text"), mergesPath, vocabPath)
      heldOut.select(col("doc_id"), col("text"), ids.as("__ids"))
        .select(col("doc_id"),
          size(col("__ids")).cast("long").as("n_ids"),
          size(filter(col("__ids"), i => i === 0)).cast("long").as("n_unk"),
          // byte-token ids occupy the reserved range 2..257
          size(filter(col("__ids"), i => i >= 2 && i <= 257)).cast("long")
            .as("n_byte_ids"),
          (graft.functions.GraftFunctions.bpeDecode(col("__ids"), vocabPath)
            === col("text")).cast("int").as("roundtrip_ok"))
    }),

    // ---- Packed token-id sequences with document separators (the
    // trainer-facing export: GPT-2-style packing where docs CROSS
    // sequence boundaries, an EOS id after every doc, and per-sequence
    // doc-start offsets for attention masking). The ids here are
    // SQL-computable (whitespace-token lengths) so the oracle replays
    // the ENTIRE per-bucket stream arithmetic — cumulative offsets,
    // window assignment, slice concatenation, boundary offsets — in
    // DuckDB; the real-BPE-ids bridge is the Curator's `pack-seq-len`
    // path (CliSpec e2e) over the exact same operator. Arrays compare
    // as canonical CSV strings (the q67 seq_text convention).
    "q110_pack_token_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        transform(filter(split(trim(col("text")), "\\s+"), x => length(x) > 0),
          x => length(x)).as("ids"))
      graft.llm.CorpusPrep.packTokenIds(docs, "doc_id", "ids",
          seqLen = 128, eosId = 0, buckets = 8)
        .select(col("seq_id"), col("n_tokens"), col("n_docs_started"),
          concat_ws(",", transform(col("input_ids"), _.cast("string"))).as("ids_csv"),
          concat_ws(",", transform(col("doc_boundaries"), _.cast("string")))
            .as("boundaries_csv"))
    }),

    // ---- The packed export's observability report (the packingReport
    // analog): sequence/full/partial counts, packed tokens vs capacity,
    // docs-started totals — integer arithmetic plus two divisions, the
    // oracle replays it OVER the q110 packing replay, so the report's
    // numbers are pinned against an independent reconstruction of the
    // entire packing.
    "q111_packed_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        transform(filter(split(trim(col("text")), "\\s+"), x => length(x) > 0),
          x => length(x)).as("ids"))
      graft.llm.CorpusPrep.packedIdsReport(
        graft.llm.CorpusPrep.packTokenIds(docs, "doc_id", "ids",
          seqLen = 128, eosId = 0, buckets = 8), seqLen = 128)
    }),

    // ---- Byte-level (GPT-2-style) BPE round-trip, ORACLE-EXACT: the
    // tokenizer trains on doc_id < 100, then EVERY doc — with
    // characters the training slice cannot contain planted on every 7th
    // (the corpus is ASCII; the plant includes a supplementary-plane
    // emoji) — goes text → byte-level ids → text, and the oracle is
    // simply the input itself. A hash match means the full
    // pretokenize → byte-map → merge → id → unmap cycle is byte-exact
    // over the whole corpus in any script; any drift anywhere in the
    // chain breaks the hash. (The ids themselves are not
    // SQL-expressible — totality IS the SQL-checkable contract.)
    "q112_bpe_byte_roundtrip" -> ((s, dir) => {
      val (mergesPath, vocabPath) =
        ensureBpeArtifacts(s, dir, "q112_bpe_byte", byteLevel = true)
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" naïve ☃😀")))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.bpeByteDecode(
            graft.functions.GraftFunctions.bpeByteEncode(
              col("text"), mergesPath, vocabPath), vocabPath).as("text"))
    }),

    // ---- Byte-level vs byte-fallback token economy (the reason the
    // second tokenizer family exists): both LOSSLESS total encodings of
    // the same held-out slice, summed. Byte-level attaches the leading
    // space to the word (Ġ-prefix merges); byte-fallback spends one id
    // per whitespace byte — on natural text the byte-level stream must
    // be strictly smaller. rows-only (greedy merges not SQL-
    // expressible); EntrySpec pins byte_ids < fallback_ids and both
    // round-tripping (the q112 oracle already pins byte-level parity).
    "q113_bpe_byte_economy" -> ((s, dir) => {
      val (mSeg, vSeg) = ensureBpeArtifacts(s, dir, "q109_bpe_fb", byteLevel = false)
      val (mByte, vByte) = ensureBpeArtifacts(s, dir, "q112_bpe_byte", byteLevel = true)
      val heldOut = t(s, dir, "documents")
        .filter(col("doc_id") >= 100).select(col("text"))
      heldOut.select(
          size(graft.functions.GraftFunctions.bpeByteEncode(
            col("text"), mByte, vByte)).cast("long").as("byte_ids"),
          size(graft.functions.GraftFunctions.bpeEncodeLossless(
            col("text"), mSeg, vSeg)).cast("long").as("fb_ids"),
          (graft.functions.GraftFunctions.bpeByteDecode(
            graft.functions.GraftFunctions.bpeByteEncode(
              col("text"), mByte, vByte), vByte) === col("text"))
            .cast("long").as("rt_byte"),
          (graft.functions.GraftFunctions.bpeDecode(
            graft.functions.GraftFunctions.bpeEncodeLossless(
              col("text"), mSeg, vSeg), vSeg) === col("text"))
            .cast("long").as("rt_fb"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("byte_ids")).as("byte_level_ids"),
          sum(col("fb_ids")).as("byte_fallback_ids"),
          sum(col("rt_byte")).as("n_roundtrip_byte"),
          sum(col("rt_fb")).as("n_roundtrip_fallback"),
          round(sum(col("byte_ids")) / sum(col("fb_ids")).cast("double"), 6)
            .as("byte_per_fallback"))
    }),

    // ---- DSIR importance resampling: select 150 docs TOWARD the src0
    // domain via the likelihood ratio of two unigram LMs (target =
    // src0-trained, raw = full-corpus-trained), then the deterministic
    // E–S bottom-k. Pure composition of the oracle-pinned LM scoring
    // (q71/q72) and weighted sampling (q58) — the q79 oracle replays
    // BOTH LM trainings, the ratio, and the rank arithmetic verbatim.
    // q80 is the same program through the zero-shuffle native scoring
    // path (saved LM files + graft_lm_logprob) under the SAME oracle.
    "q79_dsir_sample" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.{CorpusPrep, LangModel}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      val target = LangModel.trainUnigram(
        docs.filter(col("source") === "src0"), "text", minCount = 2)
      val raw = LangModel.trainUnigram(docs, "text", minCount = 2)
      CorpusPrep.dsirSample(docs, "doc_id", "text", target, raw,
          k = 150, salt = "q79", roundLogP = Some(6))
        .select(col("doc_id"), col("source"), round(col("dsir_weight"), 6).as("dsir_weight"))
    }),
    "q80_dsir_native" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.{CorpusPrep, LangModel}
      val docs = tH(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      val base = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm")
      val tag = dir.replaceAll("[^A-Za-z0-9.-]", "_")
      val tPath = new java.io.File(base, s"${tag}_dsir_target.lm").toString
      val rPath = new java.io.File(base, s"${tag}_dsir_raw.lm").toString
      LangModel.save(LangModel.trainUnigram(
        docs.filter(col("source") === "src0"), "text", minCount = 2), tPath)
      LangModel.save(LangModel.trainUnigram(docs, "text", minCount = 2), rPath)
      CorpusPrep.dsirSampleFast(docs, "doc_id", "text", tPath, rPath,
          k = 150, salt = "q79", roundLogP = Some(6))
        .select(col("doc_id"), col("source"), round(col("dsir_weight"), 6).as("dsir_weight"))
    }),

    // ---- Corpus report (data card): per-(source, lang) counts and
    // size totals, integer-only aggregates so the table is bit-exact
    // on any engine. One partial-agg shuffle, one row per group.
    "q81_corpus_report" -> ((s, dir) =>
      graft.llm.TextAnalysis.corpusReport(
        t(s, dir, "documents"), Seq("source", "lang"), "text")),

    // ---- Bigram LM scoring: position 0 under the unigram, positions
    // i>0 under Laplace P(w2|w1) — word ORDER now matters, which no
    // unigram can express (LangModelSpec proves the ordering property
    // on shuffled text). Oracle replays both trainings and every
    // position's arithmetic verbatim.
    "q82_bigram_logprob" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainBigram(
        docs.filter(col("doc_id") < 100), "text", minCount = 2)
      LangModel.logProbPerDocBigram(
        docs.filter(col("doc_id") >= 100), lm, "doc_id", "text")
        .select(col("doc_id"), round(col("lm2_logp"), 6).as("lm2_logp"),
          col("lm2_positions"))
    }),

    // ---- The same bigram scores through the SCALE path: LM saved as
    // one file, loaded once per executor JVM (Lm2Registry — all
    // probabilities precomputed at load), scoring a zero-shuffle
    // codegen'd projection. Same oracle as q82 pins the parity at the
    // 6-decimal rounding (the union-vs-left-to-right float order is
    // inside the rounding, unlike the single-branch unigram pair).
    "q83_bigram_native" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainBigram(
        docs.filter(col("doc_id") < 100), "text", minCount = 2)
      val lmPath = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm"),
        s"${dir.replaceAll("[^A-Za-z0-9.-]", "_")}_mc2.lm2").toString
      LangModel.saveBigram(lm, lmPath)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.lm2LogProb(col("text"), lmPath), 6)
            .as("lm2_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("lm2_positions"))
        .filter(col("lm2_logp").isNotNull)
    }),

    // ---- Trigram stupid-backoff LM scoring (Brants et al. 2007):
    // position 0 unigram Laplace, position 1 bigram-with-backoff,
    // positions ≥2 trigram → bigram → unigram with ×0.4 per backoff
    // step. Order now matters TWO tokens back. Oracle replays all
    // three trainings and every position's CASE arithmetic.
    "q85_trigram_logprob" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainTrigram(
        docs.filter(col("doc_id") < 100), "text", minCount = 2)
      // scored slice bounded to 600 docs at every SF (the q96
      // bounding idiom): this composable anchor pins the oracle
      // arithmetic — corpus-scale scoring is q86's native registry —
      // and unbounded its count-joins dominated bench heap (~2 GB at
      // sf0.1, round-8 verdict item)
      LangModel.logProbPerDocTrigram(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 700),
        lm, "doc_id", "text")
        .select(col("doc_id"), round(col("lm3_logp"), 6).as("lm3_logp"),
          col("lm3_positions"))
    }),

    // ---- The same trigram scores through the SCALE path: LM saved as
    // one file (unigram/#pairs/#triples sections), loaded once per
    // executor JVM (Lm3Registry — every ratio precomputed), scoring a
    // zero-shuffle codegen'd projection. The same oracle PROGRAM as
    // q85 (full scored slice here vs q85's bounded anchor slice) pins
    // the parity at the 6-decimal rounding.
    "q86_trigram_native" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainTrigram(
        docs.filter(col("doc_id") < 100), "text", minCount = 2)
      val lmPath = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm"),
        s"${dir.replaceAll("[^A-Za-z0-9.-]", "_")}_mc2.lm3").toString
      LangModel.saveTrigram(lm, lmPath)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.lm3LogProb(col("text"), lmPath), 6)
            .as("lm3_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("lm3_positions"))
        .filter(col("lm3_logp").isNotNull)
    }),

    // ---- Order-4 stupid-backoff LM, composable path: the trigram
    // program one order up — position p starts at order min(4, p+1)
    // and adds log10(0.4) per backoff step down to the unigram Laplace
    // floor. round(5), not 6: the SHARED oracle also pins q94's
    // quantized native tables, whose float32 values carry ~6e-7 error.
    "q93_quadgram_logprob" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainNgram(
        docs.filter(col("doc_id") < 100), "text", order = 4, minCount = 2)
      // scored slice bounded like q85 (the composable anchor exists to
      // pin arithmetic; q94's native registry is the scale path)
      LangModel.logProbPerDocNgram(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 700),
        lm, "doc_id", "text")
        .select(col("doc_id"), round(col("lmn_logp"), 5).as("lmn_logp"),
          col("lmn_positions"))
    }),

    // ---- The same 4-gram scores through the memory-engineered SCALE
    // path: one saved file, loaded once per executor JVM into FLAT
    // fingerprinted tables (64-bit FNV keys, float32 log-probs, ~24 B
    // per gram — the KenLM layout) with every backoff ratio
    // precomputed; scoring is a zero-shuffle codegen'd projection. The
    // same oracle PROGRAM as q93 (full scored slice here vs q93's
    // bounded anchor slice) pins parity at round(5) — quantization's
    // one visible cost, documented in the registry scaladoc.
    "q94_quadgram_native" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainNgram(
        docs.filter(col("doc_id") < 100), "text", order = 4, minCount = 2)
      val lmPath = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm"),
        s"${dir.replaceAll("[^A-Za-z0-9.-]", "_")}_mc2.lm4").toString
      LangModel.saveNgram(lm, lmPath)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.lmNLogProb(col("text"), lmPath), 5)
            .as("lmn_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("lmn_positions"))
        .filter(col("lmn_logp").isNotNull)
    }),

    // ---- Learned quality classifier, SCORING path: sigmoid(b + w·x)
    // over the fixed SQL-replayable feature surface, with pinned
    // weights so the oracle replays the entire dot product (plausible
    // hand-set values: longer prose with stopwords up, punctuation
    // noise and repetition down). The identical score() code path runs
    // in production with TRAINED weights (q88 + Curation stage); the
    // arithmetic is the same either way. round(6) absorbs the one
    // libm-dependent op (exp) — the q71/q58 caveat class.
    "q84_classifier_score" -> ((s, dir) => {
      val clf = graft.llm.QualityClassifier(
        Seq("tok_score" -> 1.25, "avg_token_len" -> 0.3, "stop_ratio" -> 2.5,
          "punct_ratio" -> -3.0, "repetition" -> -2.0),
        intercept = -0.75)
      t(s, dir, "documents").select(col("doc_id"),
        round(clf.score(col("text")), 6).as("clf_score"))
    }),

    // ---- Learned quality classifier, TRAINING path (fastText-style
    // reference-vs-random, the LLaMA recipe): positives = the real
    // corpus, negatives = deterministic hex gibberish derived from it
    // (md5 chains — long uniform tokens, no stopwords). Distributed
    // MLlib LR fit; output is the 6-scalar model. LBFGS float order is
    // engine-specific → rows-only; EntrySpec re-scores both cohorts
    // with the trained model and asserts separation.
    "q88_classifier_train" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = docs.filter(col("doc_id") % 2 === 0)
      val neg = docs.filter(col("doc_id") % 2 === 1)
        .withColumn("text", concat_ws(" ",
          md5(col("text")), md5(concat(col("text"), lit("a"))),
          md5(concat(col("text"), lit("b"))), md5(concat(col("text"), lit("c")))))
      val clf = graft.llm.QualityClassifier.train(ref, neg, "text")
      (clf.weights :+ ("intercept" -> clf.intercept))
        .toDF("feature", "weight")
    }),

    // ---- Bag-of-words classifier (hashed TF→IDF→LR, the production
    // fastText recipe; q88's shape-feature form is the oracle anchor,
    // THIS is the fidelity step — word identity, not just shape):
    // train reference-vs-negative on docs >= 100, score the HELD-OUT
    // docs < 100 (both cohorts), emit per-cohort score aggregates.
    // Negatives are REVERSED text: identical lengths, punctuation and
    // repetition — the shape features are nearly blind to it — but a
    // disjoint stable pseudo-vocabulary the BOW model learns and
    // GENERALIZES to held-out docs (hex-hash gibberish would not: every
    // hash is an unseen token with zero learned weight, the word-level
    // analog of why fastText needs char n-grams). LBFGS float order and
    // hashing are engine-specific → rows-only; EntrySpec asserts the
    // separation floor on the held-out cohorts.
    "q91_bow_classifier" -> ((s, dir) => {
      import graft.llm.QualityClassifier
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      def reversed(d: DataFrame): DataFrame =
        d.withColumn("text", reverse(col("text")))
      val train = docs.filter(col("doc_id") >= 100)
      val model = QualityClassifier.trainBow(
        train.filter(col("doc_id") % 2 === 0),
        reversed(train.filter(col("doc_id") % 2 === 1)),
        "text", numFeatures = 1 << 16)
      val holdout = docs.filter(col("doc_id") < 100)
      val scored = QualityClassifier.scoreBow(
        holdout.filter(col("doc_id") % 2 === 0).withColumn("cohort", lit("ref"))
          .unionByName(reversed(holdout.filter(col("doc_id") % 2 === 1))
            .withColumn("cohort", lit("neg"))),
        "text", model)
      scored.groupBy("cohort").agg(
        count(lit(1)).as("n_docs"),
        round(avg("bow_score"), 6).as("avg_score"),
        round(min("bow_score"), 6).as("min_score"),
        round(max("bow_score"), 6).as("max_score"))
    }),

    // ---- Domain/URL metadata gate (the pre-text stage of every
    // production web pipeline): synthesize a URL per doc from its
    // source (the corpus ships no url column — the construction is part
    // of the oracle), normalize to the registrable host, and
    // anti-join a blocklist with parent-suffix matching — blocking
    // `example.com` also blocks `ads.srcN.example.com`. The Spark side
    // runs the scale shape (bounded parent-chain explode + broadcast
    // equi semi-join + AQE-broadcast id anti-join); the oracle replays
    // normalization and suffix semantics directly (NOT EXISTS with
    // equality-or-LIKE — fine at oracle scale, wrong at corpus scale).
    "q92_domain_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
        .withColumn("url", concat(
          when(col("doc_id") % 3 === 0, lit("https://www.")).otherwise(lit("http://")),
          when(col("doc_id") % 7 === 0,
            concat(lit("ads."), col("source"), lit(".example.com")))
            .otherwise(concat(col("source"), lit(".example.org"))),
          lit("/page/"), col("doc_id").cast("string")))
      import s.implicits._
      val block = Seq("example.com", "src3.example.org").toDF("domain")
      graft.llm.DomainFilter.filterByDomains(docs, "doc_id", "url", block)
        .select(col("doc_id"),
          graft.llm.DomainFilter.normalizeDomain(col("url")).as("domain"))
    }),

    // ---- Contamination budget (the data-card number NEXT TO the
    // decontamination claim): per source, what fraction of the corpus's
    // distinct 8-gram shingles does the benchmark share? Benchmark =
    // docs < 50 drawn from the corpus itself, so every source has real
    // planted overlap. Numerator EXACT (distinct hit grams are bounded
    // by the benchmark — semi-join state, mergeable by union-distinct);
    // denominator = the mergeable HLL gram sketch (q89's state at
    // gram_size 8). Hashed grams — the scale form: native 64-bit gram
    // hashes feed the sketch and the hit join, no 8-word gram String is
    // ever built. ORACLE-EXACT via dump-and-replay on the
    // estimateDistinct seam: the per-source sketch ESTIMATE (the one
    // sketch-internal step — 20 rows) dumps as replay input, and DuckDB
    // recomputes the exact numerator from the documents table with
    // q63's string-shingle idiom (hashed and string gram counts agree
    // at 2^-64 collision odds — EntrySpec's cross-representation
    // assertion), the left join, and the fraction. What stays
    // unverified is exactly the HLL register arithmetic; EntrySpec pins
    // that estimate within 5% of exact.
    "q95_contamination_budget" -> ((s, dir) => {
      import graft.llm.Cardinality
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      val bench = docs.filter(col("doc_id") < 50).select(col("text"))
      val state = Cardinality.sketchState(docs, Seq("source"), "text",
        gramSize = 8, hashGrams = true)
      val est = dumpAux(
        Cardinality.estimateDistinct(state, Seq("source")), dir, "q95_distinct")
      val hits = Cardinality.benchmarkHitGrams(docs, bench, Seq("source"),
        "text", "text", gramSize = 8, hashGrams = true)
      Cardinality.contaminationReportFromEstimates(est, hits, Seq("source"))
        .select(col("source"), col("distinct_grams"), col("shared_grams"),
          round(col("contaminated_fraction"), 6).as("contaminated_fraction"))
    }),

    // ---- HTML text extraction (the ingest step upstream of every
    // web-corpus stage): script/style/comment blocks dropped, block
    // separators become newlines, tags stripped, character references
    // decoded through the FULL bundled WHATWG table (stripHtmlFull —
    // named entities beyond the old core list, decimal and hex numeric
    // forms including a supplementary-plane codepoint; unknown names
    // pass through), whitespace squeezed. Planted markup built
    // identically in both engines; no backreferences anywhere so the
    // RE2 oracle replays every pattern, and the oracle's decode chain
    // replays EXACTLY the planted reference set (LOCKSTEP: adding a
    // reference here requires adding its replace below — documents
    // text itself contains no '&' at any SF, asserted in
    // TextAnalysisSpec).
    "q108_html_extract" -> ((s, dir) => {
      val planted = concat(
        lit("<html><head><style type=\"text/css\">body { color: red }</style>"),
        lit("<script>var x = 1 < 2;</script></head><body>"),
        lit("<!-- hidden comment --><h1>Title  here</h1>"),
        lit("<p>First&nbsp;para with <b>bold</b> &amp; "),
        substring(col("text"), 1, 40),
        lit("</p><div>Second &lt;div&gt; line</div>"),
        lit("<ul><li>item one</li><li>item&#39;s two</li></ul>"),
        lit("<p>Caf&eacute; &hellip; &copy; 2024 &mdash; n&#8212;m"),
        lit(" &#x1F60A; but &notareal; and Fish&Chips stay</p>"),
        lit("<br/>tail text</body></html>"))
      t(s, dir, "documents").select(col("doc_id"),
          graft.llm.TextAnalysis.stripHtmlFull(planted).as("text_plain"))
        .withColumn("n_lines",
          size(split(col("text_plain"), "\n")).cast("long"))
    }),

    // ---- Token-budget mixture (the production mixing contract —
    // budgets in TOKENS per source, not doc fractions): per source,
    // docs taken in deterministic md5(id|salt) order until the
    // cumulative token sum reaches the budget; the crossing doc is
    // included (overshoot ≤ one doc, never underfilled). src2's zero
    // budget keeps nothing; unbudgeted sources keep everything.
    // Window + integer arithmetic → the oracle replays verbatim.
    "q107_token_budget_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("n_tokens",
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long"))
      graft.llm.CorpusPrep.tokenBudgetMix(docs, "doc_id", "source", "n_tokens",
          Map("src0" -> 500L, "src1" -> 200L, "src2" -> 0L),
          defaultBudget = -1L, salt = "q107")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_kept"))
    }),

    // ---- Char-n-gram classifier (TRUE fastText, Bojanowski et al.
    // 2017): word tokens + boundary-marked char 3..5-grams, vs the
    // word-identity BOW model on the SAME task — held-out negatives
    // whose every WORD is unseen (hex-hash gibberish under a held-out
    // salt). Word identity hashes unseen tokens to untrained buckets
    // and scores ~prior; the char-gram surface is drawn from the
    // stable hex alphabet and generalizes. Both models' per-cohort
    // aggregates come back so the gap itself is the asserted result
    // (EntrySpec: char saturates the separation, word does not
    // confidently reject the unseen cohort). LBFGS/hashing are
    // engine-specific → rows-only.
    "q96_chargram_classifier" -> ((s, dir) => {
      import graft.llm.QualityClassifier
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      // deterministic hex gibberish; the salt decides the vocabulary,
      // so train ("t") and held-out ("z") negatives share NO words
      def hexed(d: DataFrame, salt: String): DataFrame =
        d.withColumn("text", concat_ws(" ",
          md5(concat(col("text"), lit(salt))),
          md5(concat(col("text"), lit(salt + "a"))),
          md5(concat(col("text"), lit(salt + "b"))),
          md5(concat(col("text"), lit(salt + "c")))))
      // training slice bounded to 1000 docs so the two MLlib fits cost
      // the same at every SF — the gate demonstrates the MODEL-CLASS
      // gap, not training throughput (q88/q91 already cover the fit).
      // 12 LBFGS iterations saturate this separable task, and 2^16
      // hash buckets comfortably hold the hex-alphabet gram surface
      // (EntrySpec pins the >0.9/<0.1 margins — the LBFGS gradient is
      // a dense numFeatures-length vector per iteration, so both knobs
      // are directly bench-visible)
      val train = docs.filter(col("doc_id") >= 100 && col("doc_id") < 1100)
      val ref = train.filter(col("doc_id") % 2 === 0)
      val neg = hexed(train.filter(col("doc_id") % 2 === 1), "t")
      // The two fits are INDEPENDENT jobs over deliberately 1-2
      // partition inputs (fanning the LBFGS gradient out is the r15
      // measured negative), so run them CONCURRENTLY (guide §2.6):
      // the char fit's stages back-fill the cores the word fit's
      // gradient reduction leaves idle. Each fit is deterministic over
      // its own lineage — the models (and the gate's rows) are
      // unchanged, only the wall-clock overlap is new.
      val charF = java.util.concurrent.CompletableFuture.supplyAsync(() =>
        QualityClassifier.trainCharBow(ref, neg, "text",
          numFeatures = 1 << 16, maxIter = 12))
      val wordModel = QualityClassifier.trainBow(ref, neg, "text",
        numFeatures = 1 << 16, maxIter = 12)
      val charModel = charF.join()
      val holdout = docs.filter(col("doc_id") < 100)
      val testSet = holdout.filter(col("doc_id") % 2 === 0)
        .withColumn("cohort", lit("ref"))
        .unionByName(hexed(holdout.filter(col("doc_id") % 2 === 1), "z")
          .withColumn("cohort", lit("neg")))
      val w = QualityClassifier.scoreBow(testSet, "text", wordModel, "score")
        .withColumn("model", lit("word"))
      val c = QualityClassifier.scoreBow(testSet, "text", charModel, "score")
        .withColumn("model", lit("char"))
      w.unionByName(c).groupBy("model", "cohort").agg(
        count(lit(1)).as("n_docs"),
        round(avg("score"), 6).as("avg_score"),
        round(min("score"), 6).as("min_score"),
        round(max("score"), 6).as("max_score"))
    }),

    // ---- Interpolated Kneser–Ney bigram LM (the perplexity-optimal
    // smoothing next to q85's production-scale stupid backoff): proper
    // conditional distribution — discounted ML mass + D·nfwd·pcont
    // interpolation, continuation counts at the lower order, discount
    // estimated from the bigram count-of-counts. minCount=1 by
    // construction (the discount IS the singleton treatment). Training
    // AND scoring are count arithmetic, so the oracle replays both;
    // round(6) absorbs log10 libm variation (the q71 caveat class).
    "q97_kneser_ney" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainKneserNey(docs.filter(col("doc_id") < 100), "text")
      // scored slice bounded like q85/q93: composable anchors pin the
      // oracle arithmetic, the native registries are the scale path
      LangModel.logProbPerDocKneserNey(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 700), lm, "doc_id", "text")
        .select(col("doc_id"), round(col("kn_logp"), 6).as("kn_logp"),
          col("kn_positions"))
    }),

    // ---- The same KN scores through the SCALE path: the saveBigram
    // artifact of the UNPRUNED tables loads once per executor JVM; the
    // registry recomputes every derived statistic (context sums,
    // continuation counts, the clamped count-of-counts discount) from
    // the stored counts and precomputes stored-pair log-probs; scoring
    // is a zero-shuffle codegen'd projection. The SAME oracle as q97
    // pins parity at round(6).
    "q99_kn_native" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainKneserNey(docs.filter(col("doc_id") < 100), "text")
      val lmPath = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm"),
        s"${dir.replaceAll("[^A-Za-z0-9.-]", "_")}_kn.lm2").toString
      LangModel.saveBigram(lm.bigram, lmPath)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.knLogProb(col("text"), lmPath), 6)
            .as("kn_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("kn_positions"))
        .filter(col("kn_logp").isNotNull)
    }),

    // ---- Interpolated Kneser–Ney at ORDER 3 (Chen & Goodman 1999
    // §3's recursion): top level discounts raw trigram counts; the
    // middle level runs on CONTINUATION counts N1+(·ab) derived from
    // the trigram table; the bottom level is the continuation-unigram
    // Laplace floor. One discount per level, each from its own
    // count-of-counts. Proper distribution at every level (spec-pinned);
    // training AND scoring replay in SQL, round(6) as q97.
    "q100_kn3" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainKneserNey3(docs.filter(col("doc_id") < 100), "text")
      // scored slice bounded like q85/q93 (q101 is the scale path)
      LangModel.logProbPerDocKneserNey3(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 700), lm, "doc_id", "text")
        .select(col("doc_id"), round(col("kn3_logp"), 6).as("kn3_logp"),
          col("kn3_positions"))
    }),

    // ---- The same KN3 scores through the SCALE path: the saveTrigram
    // artifact (the SAME file the stupid-backoff registry scores)
    // loads once per executor JVM; the registry recomputes every
    // derived statistic — the continuation-bigram table, both
    // discounts, all sums/fan-outs — from the stored trigram counts
    // and precomputes stored-triple log-probs; scoring is a
    // zero-shuffle codegen'd projection. The SAME oracle as q100 pins
    // parity at round(6).
    "q101_kn3_native" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = tH(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainKneserNey3(docs.filter(col("doc_id") < 100), "text")
      val lmPath = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm"),
        s"${dir.replaceAll("[^A-Za-z0-9.-]", "_")}_kn3.lm3").toString
      LangModel.saveTrigram(lm.trigram, lmPath)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.kn3LogProb(col("text"), lmPath), 6)
            .as("kn3_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("kn3_positions"))
        .filter(col("kn3_logp").isNotNull)
    }),

    // ---- Interpolated Kneser–Ney at ORDER 4 — the generic recursion
    // (trainKneserNeyN / logProbPerDocKneserNeyN) at the order real
    // CCNet/KenLM filters run near, ORACLE-EXACT: training (UNPRUNED
    // 4-gram counts, the three-level continuation chain, per-level
    // count-of-counts discounts) AND scoring (the bottom-up
    // interpolation at every starting order) replayed verbatim by the
    // GENERATED CTE chain (kneserNeyNOracleSql(4, ·) — the same
    // program that would write the order-5 oracle). Scored slice
    // bounded like q100 (q115 is the scale path).
    "q114_kn4" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainKneserNeyN(
        docs.filter(col("doc_id") < 100), "text", order = 4)
      LangModel.logProbPerDocKneserNeyN(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 700), lm, "doc_id", "text")
        .select(col("doc_id"), round(col("knn_logp"), 6).as("knn_logp"),
          col("knn_positions"))
    }),

    // ---- The same KN4 scores through the SCALE path: the saveNgram
    // artifact (the SAME file the stupid-backoff order-n registry
    // scores) loads once per executor JVM; the registry re-derives the
    // whole continuation chain, every context sum/fan-out, and all
    // three discounts from the stored top-order counts; scoring is a
    // zero-shuffle codegen'd projection. The SAME generated oracle as
    // q114 pins parity at round(6).
    "q115_kn4_native" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lmPath = ensureKnArtifact(s, dir, order = 4)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.knNLogProb(col("text"), lmPath), 6)
            .as("knn_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("knn_positions"))
        .filter(col("knn_logp").isNotNull)
    }),

    // ---- The same KN4 scores once more through the PACKED registry
    // (flat 64-bit-fingerprint → float32 tables — the KenLM memory
    // layout the stupid-backoff registry already uses, here carrying
    // the live KN recursion: pre-discounted numerators per gram,
    // D·nfwd / ctx per context). Same artifact, same generated oracle,
    // pinned at round(4): float32 quantization perturbs scores by
    // ~1e-8 relative, and round(5) measured a ~1/400-doc boundary-flip
    // rate across SFs — round(4) buys a ~10x margin while still
    // pinning real parity.
    "q116_kn4_packed" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lmPath = ensureKnArtifact(s, dir, order = 4)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.knNLogProbPacked(col("text"), lmPath), 4)
            .as("knn_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("knn_positions"))
        .filter(col("knn_logp").isNotNull)
    }),

    // ---- MODIFIED Kneser–Ney at order 4 (Chen & Goodman 1999 §5 —
    // KenLM's DEFAULT smoothing, the one CCNet's 5-gram filter
    // actually runs): three discounts per level selected by count
    // bucket, interpolation weight = the context's exact discounted
    // mass. ORACLE-EXACT vs the generated mod-CTE chain
    // (kneserNeyNModOracleSql(4, ·)) — training (count-of-counts n1-n4,
    // clamped discount triples), per-context bucketed fan-outs, AND the
    // count-bucketed numerator all replayed. Composable anchor on the
    // bounded slice; q118/q119 are the scale paths.
    "q117_mkn4" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.LangModel
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = LangModel.trainKneserNeyNMod(
        docs.filter(col("doc_id") < 100), "text", order = 4)
      LangModel.logProbPerDocKneserNeyNMod(
        docs.filter(col("doc_id") >= 100 && col("doc_id") < 700), lm, "doc_id", "text")
        .select(col("doc_id"), round(col("mkn_logp"), 6).as("mkn_logp"),
          col("mkn_positions"))
    }),

    // ---- Modified KN through the native exact-string registry: the
    // SAME saveNgram artifact every other LM scores — the smoothing is
    // entirely load-time derivation, so one persisted file serves
    // stupid-backoff, interpolated KN, and modified KN. Zero-shuffle
    // codegen'd projection; the SAME generated oracle as q117 pins
    // parity at round(6).
    "q118_mkn4_native" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lmPath = ensureKnArtifact(s, dir, order = 4)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.knModLogProb(col("text"), lmPath), 6)
            .as("mkn_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("mkn_positions"))
        .filter(col("mkn_logp").isNotNull)
    }),

    // ---- Modified KN through the PACKED registry — the same
    // KnNPackedTable class as q116, because once `c − D(c)` per gram
    // and the discount mass per context are precomputed, the scoring
    // recursion cannot tell how many discounts the smoothing had.
    // Pinned at round(4), the measured float32 margin.
    "q119_mkn4_packed" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lmPath = ensureKnArtifact(s, dir, order = 4)
      docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.knModLogProbPacked(col("text"), lmPath), 4)
            .as("mkn_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("mkn_positions"))
        .filter(col("mkn_logp").isNotNull)
    }),

    // ---- Modified KN at ORDER 5 — CCNet's actual order — through
    // the SAME generic machinery: the shared order-5 count artifact
    // (marker-gated one-time corpus state), the native registry's
    // four-level continuation re-derivation, and the GENERATED oracle
    // at n = 5 (the same program that wrote the order-4 oracles —
    // five frame programs, a three-level continuation chain, four
    // discount triples, all from the same index arithmetic). Bounded
    // scored slice: the order-5 oracle's CTE chain is the widest in
    // the suite.
    "q121_mkn5" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lmPath = ensureKnArtifact(s, dir, order = 5)
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 700)
        .select(col("doc_id"),
          round(graft.functions.GraftFunctions.knModLogProb(col("text"), lmPath), 6)
            .as("mkn_logp"),
          graft.llm.TextAnalysis.wsTokenCount(col("text")).cast("long")
            .as("mkn_positions"))
        .filter(col("mkn_logp").isNotNull)
    }),

    // ---- Corpus-global LINE dedup, first occurrence wins (the
    // Dolma/RefinedWeb exact-paragraph dedup step — distinct from
    // q75's boilerplate threshold, which drops the FIRST copy too):
    // a promo line planted on every 3rd doc and a footer on EVERY doc
    // survive exactly once each (lowest doc_id); the short "-" line is
    // exempt everywhere; unique bodies untouched. ORACLE-EXACT: the
    // whole program — split, first-wins row_number over (doc, pos),
    // short-line exemption, ordered reassembly, removal counts —
    // replayed in SQL.
    "q122_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 3 === 0,
              lit("subscribe to our newsletter for weekly updates\n"))
              .otherwise(lit("")),
            lit("-\n"),
            col("text"),
            lit("\nall rights reserved by the original publisher"))
          .as("text"))
        .filter(col("doc_id") < 200)
      graft.llm.Dedup.dedupLinesGlobal(docs, "doc_id", "text", minLineLen = 15)
    }),

    // ---- URL-keyed dedup over canonicalized URLs (RefinedWeb
    // deduplicates fetched pages by URL before any text touch —
    // Penedo 2023): messy synthetic URLs (case-varied scheme/host,
    // www, default ports, utm params, fragments, trailing slashes)
    // collapse to canonical keys, one survivor per key (smallest id).
    // ORACLE-EXACT: the whole normalization chain (every regex RE2-
    // compatible, no backreferences) AND the first-wins window
    // replayed in SQL.
    "q123_url_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
        .filter(col("doc_id") < 300)
        .withColumn("url", concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.")).otherwise(lit("https://")),
          col("source"), lit(".example.org"),
          when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
          lit("/page/"), (col("doc_id") % 25).cast("string"),
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 4 === 0, lit("?utm_source=feed&ref=a")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit(""))))
      graft.llm.DomainFilter.dedupByUrl(docs, "doc_id", "url")
        .select(col("doc_id"), col("url_norm"))
    }),

    // ---- Language ID under the ORACLE (previously spec-only): one
    // planted sample per stopword profile (Q125Samples tracks
    // StopwordProfiles — 21 as of the round-11 bg/sr Cyrillic split),
    // the 8 script-tier languages (including Japanese, whose han+kana
    // mix must NOT read "zh"), and garbage — keyed by doc_id, classified
    // by the composable langId. The fast_agrees column additionally
    // pins the native one-pass TextStats form against the composable
    // form INSIDE the gate (the oracle expects constant true, so any
    // future divergence hash-fails). Every step — tokenize, distinct,
    // stopword intersect, (score, lang) max with its lexicographic
    // tie, script regexp counts, the decision CASE — replays in SQL.
    "q125_langid" -> ((s, dir) => {
      import graft.llm.TextAnalysis
      val txt = element_at(array(Q125Samples.map(lit): _*),
        (col("doc_id") % Q125Samples.length + 1).cast("int"))
      tH(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(txt).as("lang_id"),
        (TextAnalysis.langIdFast(TextAnalysis.stats(txt)) === TextAnalysis.langId(txt))
          .as("fast_agrees"))
    }),

    // ---- zlib-compressibility quality signal (the repetitiveness
    // ratio published quality suites carry): every 5th doc becomes a
    // 40×-repeated template line — it must deflate far below prose.
    // The gate reports, per cohort, how many docs a 0.25 floor would
    // drop: templates all, prose none (EntrySpec value-asserts the
    // separation).
    "q126_deflate_ratio" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 300)
      val planted = docs.withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat_ws(" ", transform(sequence(lit(1), lit(40)),
            _ => lit("click here to win a free prize now"))))
          .otherwise(col("text")))
      // ORACLE-EXACT gating (r13): the per-doc ratios dump and DuckDB
      // replays the floor test + cohort aggregates; the Deflater pass
      // itself (a JVM codec, like the media decodes) stays rows-only.
      val ratios = dumpAux(
        planted.select(col("doc_id"), (col("doc_id") % 5 === 0).as("is_template"),
          graft.functions.GraftFunctions.deflateRatio(col("text")).as("ratio")),
        dir, "q126_ratios")
      ratios.groupBy(col("is_template"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("ratio") < 0.25, 1)).as("n_below_floor"),
          round(avg("ratio"), 2).as("avg_ratio"))
    }),

    // ---- Multimodal VIDEO plumbing through the REAL container+codec
    // (closes the last synthetic modality): deterministic per-frame
    // pixels derived from each document are muxed as genuine RIFF/AVI
    // bytes in-query (reencodeAsAvi) — once as lossless 24-bit DIB
    // `00db` frames, once as MJPEG `00dc` (a real JDK JPEG per frame)
    // — then frame-sampled declaratively (sampleFrames row explosion
    // on the probed n_frames), frame-selected via metadata, and
    // decoded by the RIFF parser + javax.imageio (AviDecoder;
    // synthetic_decode = FALSE on every row). The two decodes are
    // joined per asset: every frame must decode (3 per asset, as
    // data), shapes must agree, and the lossy MJPEG feature sum must
    // sit within JPEG tolerance of the bit-exact DIB sum. Not
    // SQL-expressible → rows-only; MultimodalSpec holds the raw
    // bit-exactness asserts.
    "q124_video_decode" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text", "video",
        Map("width" -> "16", "height" -> "8"))
      def perAsset(mjpeg: Boolean): DataFrame = {
        val avi = Multimodal.reencodeAsAvi(media, nFrames = 3, mjpeg = mjpeg)
        val frames = Multimodal.frameIdxIntoMeta(
          Multimodal.sampleFrames(avi, everyN = 1))
        Multimodal.decodeAndFeaturize(frames, Multimodal.AviDecoder, featureDim = 8)
          .groupBy(col("asset_id"))
          .agg(count(lit(1)).as("n_frames_decoded"),
            max("width").as("width"), max("height").as("height"),
            max("channels").as("channels"),
            max(col("synthetic_decode").cast("int")).as("synthetic_any"),
            sum(aggregate(col("features"), lit(0.0d), (a, x) => a + x)).as("feat_sum"))
      }
      perAsset(mjpeg = false).alias("d")
        .join(perAsset(mjpeg = true).alias("m"), Seq("asset_id"))
        .select(col("asset_id"),
          col("d.n_frames_decoded").as("n_frames"),
          col("d.width"), col("d.height"), col("d.channels"),
          (col("d.synthetic_any") + col("m.synthetic_any")).as("synthetic_decodes"),
          round(col("d.feat_sum"), 4).as("dib_feat_sum"),
          (abs(col("m.feat_sum") - col("d.feat_sum")) < 1.0).as("mjpeg_within_tol"))
    }),

    // ---- Protected special tokens (<|endoftext|>-class), ORACLE-EXACT
    // on BOTH encode paths: every 5th doc gets the spelling planted
    // mid-text (whitespace-free on one side, so a merge-across would
    // change the id stream); encode-with-specials must emit EXACTLY ONE
    // occurrence of the fixed tail id (n_special_* — the never-split
    // pin, replayed in SQL as the plant indicator) and decode must
    // reproduce the planted text byte-for-byte (text_* — the
    // round-trip pin, replayed in SQL as the plant expression itself).
    // A special that merged across, split into pieces, or re-segmented
    // as plain text breaks the hash on n_special_*; any decode drift
    // breaks it on text_*.
    "q127_special_tokens" -> ((s, dir) => {
      import graft.functions.GraftFunctions._
      val Eot = "<|endoftext|>"
      val sp = Seq(Eot)
      val (mSeg, vSeg) =
        ensureBpeArtifacts(s, dir, "q127_bpe_sp_seg", byteLevel = false, specials = sp)
      val (mByte, vByte) =
        ensureBpeArtifacts(s, dir, "q127_bpe_sp_byte", byteLevel = true, specials = sp)
      val segId = vocabIdOf(vSeg, Eot)
      val byteId = vocabIdOf(vByte, Eot)
      val planted = tH(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(lit("pre "), col("text"), lit(s" mid${Eot}post")))
          .otherwise(col("text")).as("text"))
      planted
        .select(col("doc_id"), col("text"),
          bpeEncodeLossless(col("text"), mSeg, vSeg, sp).as("ids_seg"),
          bpeByteEncode(col("text"), mByte, vByte, sp).as("ids_byte"))
        .select(col("doc_id"),
          bpeDecode(col("ids_seg"), vSeg).as("text_seg"),
          bpeByteDecode(col("ids_byte"), vByte).as("text_byte"),
          size(filter(col("ids_seg"), i => i === segId)).as("n_special_seg"),
          size(filter(col("ids_byte"), i => i === byteId)).as("n_special_byte"))
    }),

    // ---- Curator END-TO-END as a timed bench line (round-10 verdict:
    // the product surface users actually run had per-stage wall
    // seconds but no round-over-round trend). Every invocation REDOES
    // the full config-driven pipeline — quality floor, PII redaction,
    // SimHash near-dup, deterministic splits, window chunking, data
    // card, stage log — into a fixed overwrite target, so the bench
    // median times the real multi-stage production path, not a cache.
    // The returned per-split summary is deterministic (fixed salts);
    // the composed pipeline (SimHash banding + redaction + chunker)
    // is not SQL-expressible → rows-only; CliSpec holds the per-stage
    // semantics.
    "q128_curator_e2e" -> ((s, dir) => {
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_q128_" + Integer.toHexString(dir.hashCode))
      root.mkdirs()
      val out = new java.io.File(root, "curated").toString
      val report = new java.io.File(root, "report").toString
      val confFile = new java.io.File(root, "curator.conf")
      java.nio.file.Files.writeString(confFile.toPath,
        s"""source { storage-type = local, dataset-dir = $dir/documents.parquet }
           |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.2
           |  redact = true
           |  shingle-size = 3
           |  near-dup-strategy = simhash
           |  splits = ["train:0.8", "val:0.1", "test:0.1"]
           |  split-salt = q128
           |  chunk-size = 64
           |  chunk-overlap = 16
           |  report-dir = $report
           |  stage-log-path = ${new java.io.File(root, "stages.json")}
           |}
           |""".stripMargin)
      graft.cli.Curator.main(Array("--conf", confFile.toString))
      s.read.parquet(out)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("chunk_tokens")).as("total_tokens"),
          max(col("chunk_tokens")).as("max_chunk_tokens"))
    }),

    // ---- Image NEAR-DUP via perceptual hash (dHash), cross-codec:
    // 150 deterministic smooth plates rendered as REAL PNGs; every 6th
    // also rendered as a REAL JPEG of the SAME plate under id+100000.
    // Both decode through javax.imageio, hash through the published
    // dHash (gray → 9×8 → gradient signs), and pair through the SAME
    // banded engine as SimHash text near-dup (Dedup.sigNearDups —
    // never all-pairs). Every planted cross-codec twin must pair
    // within Hamming 3; PerfProbe 10 calibrates the margins (planted
    // ≤ 2, cross-seed min 4 over these seeds). ORACLE-EXACT pairing
    // via dump-and-replay (the hashes dump, DuckDB replays the radius
    // decision over all pairs); the pixel decode itself stays
    // SQL-inexpressible — MultimodalSpec holds its per-step asserts.
    "q129_image_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "image", Map.empty)
      val png = Multimodal.reencodeAsSmoothImage(media, jpeg = false)
      val jpgTwins = Multimodal.reencodeAsSmoothImage(
        media.filter(col("asset_id") % 6 === 0), jpeg = true,
        seedCol = "asset_id")
        .withColumn("asset_id", col("asset_id") + 100000)
      // ORACLE-EXACT pairing (r13): the per-asset dHashes dump as the
      // replay input; DuckDB brute-forces the same Hamming decision
      // (bit_count(xor) <= 3) over ALL pairs — so the banded engine is
      // cross-engine-pinned to equal all-pairs-within-radius (no hot
      // bucket fires here; pigeonhole guarantees no missed pair).
      // Only the pixel decode stays rows-only, by nature.
      val sigs = dumpAux(Multimodal.perceptualHashes(
        png.unionByName(jpgTwins), Multimodal.ImageIoDecoder), dir, "q129_sigs")
      graft.llm.Dedup.sigNearDups(sigs, maxHamming = 3)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_cross_codec")
          .otherwise("other").as("pair_type"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("hamming")).as("min_hamming"),
          max(col("hamming")).as("max_hamming"))
    }),

    // ---- Audio NEAR-DUP via spectral fingerprint: 150 deterministic
    // smooth recordings rendered as REAL 16-bit PCM WAVs; every 6th
    // also at HALF VOLUME under id+100000. Both decode through
    // javax.sound.sampled, fingerprint through the Haitsma–Kalman-
    // style sign-of-band-energy-change hash (volume-invariant by
    // construction — energies scale by c², difference signs don't),
    // and pair through the SAME banded engine as text/image near-dup.
    // PerfProbe 11 calibrates: twins 0 bits apart, cross-seed min 9 —
    // radius 3 separates with a wide margin. ORACLE-EXACT pairing via
    // dump-and-replay (q129 idiom); the DSP decode stays
    // SQL-inexpressible — MultimodalSpec holds its per-step asserts.
    "q130_audio_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "audio", Map.empty)
      val full = Multimodal.reencodeAsSmoothAudio(media)
      val halfTwins = Multimodal.reencodeAsSmoothAudio(
        media.filter(col("asset_id") % 6 === 0), volume = 0.5f)
        .withColumn("asset_id", col("asset_id") + 100000)
      // ORACLE-EXACT pairing (r13): same dump-and-replay as q129 — the
      // spectral fingerprints dump, DuckDB replays the Hamming radius
      // over all pairs; only the DSP decode stays rows-only.
      val sigs = dumpAux(Multimodal.audioHashes(
        full.unionByName(halfTwins), Multimodal.WavDecoder), dir, "q130_sigs")
      graft.llm.Dedup.sigNearDups(sigs, maxHamming = 3)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_half_volume")
          .otherwise("other").as("pair_type"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("hamming")).as("min_hamming"),
          max(col("hamming")).as("max_hamming"))
    }),

    // ---- Video NEAR-DUP: 100 deterministic 3-frame smooth clips as
    // REAL lossless-DIB AVIs; every 6th also as an MJPEG AVI of the
    // SAME frames under id+100000. Frames explode declaratively, hash
    // per-frame (dHash through the RIFF parser + both codecs), and
    // clips pair when ALL 3 aligned frames land within Hamming 5
    // (8 bands — MJPEG wobble reaches 3 bits on some plates, so the
    // image gate's radius of 3 leaves no margin here) —
    // the frame-aligned variant of the shared banded join
    // (frame_idx rides the band key; never all-pairs). rows-only;
    // MultimodalSpec holds the per-step asserts.
    "q131_video_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text",
        "video", Map.empty)
      val dib = Multimodal.reencodeAsSmoothAvi(media, nFrames = 3, mjpeg = false)
      val mjpegTwins = Multimodal.reencodeAsSmoothAvi(
        media.filter(col("asset_id") % 6 === 0), nFrames = 3, mjpeg = true)
        .withColumn("asset_id", col("asset_id") + 100000)
      // ORACLE-EXACT pairing (r13): per-frame hashes dump; DuckDB
      // replays the frame-aligned join + min-frames gate.
      val sigs = dumpAux(Multimodal.videoFrameHashes(
        dib.unionByName(mjpegTwins)), dir, "q131_sigs")
      // radius 5 over 4 bands of 16 bits, Hamming-<=1 probed (round 14:
      // 8 unprobed bands = 8-bit bucket keys, the dct tier's measured
      // guard-saturation class; the replay below is banding-agnostic)
      Multimodal.videoNearDupsFromSigs(sigs,
          minFrames = 3, maxHamming = 5, bands = 4, probe = 1)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_cross_codec")
          .otherwise("other").as("pair_type"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("n_frames_matched")).as("min_frames_matched"),
          max(col("max_hamming")).as("max_hamming"))
    }),

    // ---- Cluster-balanced (topic-diversity) subsampling: KMeans over
    // the embeddings table (fixed seed), an equal deterministic quota
    // per cluster (salted-digest bottom-k within each), docs joined to
    // their cell tag by id. The gate reports the balance property
    // itself: every cluster contributes min(perCluster, cluster size)
    // docs — a dominant topic cannot crowd out the tail. ORACLE-EXACT
    // (r13): the cluster-tagged docs dump and DuckDB replays the ENTIRE
    // selection — digest (md5 is cross-engine), per-cluster rank, quota
    // cut — which also pins the digest-threshold pre-thin's exactness
    // claim against an engine with no pre-thin. Only the seeded KMeans
    // fit stays rows-only; CorpusPrepSpec pins determinism separately.
    "q132_cluster_balanced_sample" -> ((s, dir) => {
      val cells = graft.llm.CorpusPrep.clusterCells(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        numClusters = 8, idCol = "doc_id")
      val withCell = dumpAux(
        t(s, dir, "documents").select(col("doc_id"), col("source"))
          .join(cells, Seq("doc_id")),
        dir, "q132_cells")
      val kept = graft.llm.CorpusPrep.clusterQuotaSample(withCell, "doc_id",
        perCluster = 20)
      kept.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_kept"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n_kept")).as("n_docs_kept"),
          min(col("n_kept")).as("min_per_cluster"),
          max(col("n_kept")).as("max_per_cluster"))
    }),

    // ---- Audio TRIM near-dup: the windowed Haitsma–Kalman form. 150
    // recordings as real WAVs; every 6th also with its first 1024
    // samples CUT under id+100000 (a hop-multiple trim: the trimmed
    // clip's windows are sample-identical to the original's two hops
    // in). Overlapping 2048-frame windows (hop 512) hash per window and
    // pair through the OFFSET-CONSISTENT engine (Dedup.seqSigNearDups):
    // the twins match 3 windows at ONE delta (+2), strangers never
    // reach minWindows=2 at any single delta (cross-seed window
    // collisions within radius 3 are ~7e-5 per window pair, measured in
    // MultimodalSpec's margins probe — two at the SAME delta is
    // negligible). Closes q130's documented trim limitation. rows-only;
    // MultimodalSpec pins the alignment arithmetic.
    "q133_audio_trim_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "audio", Map.empty)
      val full = Multimodal.reencodeAsSmoothAudio(media)
      val trimmed = Multimodal.reencodeAsSmoothAudio(
        media.filter(col("asset_id") % 6 === 0), trimFrames = 1024)
        .withColumn("asset_id", col("asset_id") + 100000)
      // ORACLE-EXACT pairing (r13): windowed sub-sigs dump; DuckDB
      // replays the offset-consistent (delta-grouped) decision.
      val sigs = dumpAux(Multimodal.audioWindowHashes(
        full.unionByName(trimmed), Multimodal.WavDecoder), dir, "q133_sigs")
      graft.llm.Dedup.seqSigNearDups(
          sigs.withColumnRenamed("window_idx", "seq_idx"),
          minMatches = 2, maxHamming = 3)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_trimmed")
          .otherwise("other").as("pair_type"))
        .agg(countDistinct(col("id1"), col("id2")).as("n_pairs"),
          min(col("n_matched")).as("min_windows_matched"),
          max(col("max_hamming")).as("max_hamming"),
          min(col("delta")).as("min_delta"),
          max(col("delta")).as("max_delta"))
    }),

    // ---- Video TEMPORAL-SHIFT near-dup: 100 six-frame DIB clips;
    // every 6th re-rendered as MJPEG starting TWO frames later under
    // id+100000 (the prepend/drop-frames shape the frame-ALIGNED q131
    // join misses by construction — delta 0 only). The same per-frame
    // dHashes pair through the offset-consistent engine: twins overlap
    // on 4 genuine frames at one delta (+2) within the MJPEG radius 5;
    // a stranger pair would need 3 cross-seed frame collisions at ONE
    // delta. rows-only; MultimodalSpec pins the arithmetic.
    "q134_video_shift_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text",
        "video", Map.empty)
      val dib = Multimodal.reencodeAsSmoothAvi(media, nFrames = 6, mjpeg = false)
      val shifted = Multimodal.reencodeAsSmoothAvi(
        media.filter(col("asset_id") % 6 === 0), nFrames = 6, mjpeg = true,
        frameOffset = 2)
        .withColumn("asset_id", col("asset_id") + 100000)
      // ORACLE-EXACT pairing (r13): frame hashes dump; DuckDB replays
      // the delta-grouped offset-consistent decision.
      val sigs = dumpAux(Multimodal.videoFrameHashes(
        dib.unionByName(shifted)), dir, "q134_sigs")
      // radius 5 probed over 4x16-bit bands (round 14 — see q131)
      graft.llm.Dedup.seqSigNearDups(
          sigs.withColumnRenamed("frame_idx", "seq_idx"),
          minMatches = 3, maxHamming = 5, bands = 4, probe = 1)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_shifted")
          .otherwise("other").as("pair_type"))
        .agg(countDistinct(col("id1"), col("id2")).as("n_pairs"),
          min(col("n_matched")).as("min_frames_matched"),
          max(col("max_hamming")).as("max_hamming"),
          min(col("delta")).as("min_delta"),
          max(col("delta")).as("max_delta"))
    }),

    // ---- Image CENTER-CROP near-dup: 150 PNG plates; every 6th also
    // as a PNG of its CENTER-HALF crop under id+100000 (outside plain
    // dHash's envelope — q129 cannot pair these). The ten-tile state
    // frame pairs them through the crop-hypothesis SLOT-ALIGNED join:
    // the crop's full frame + quadrants match the original's
    // center-half + its quadrants slot for slot — FIVE exact witnesses
    // per true crop, while strangers reach at most THREE (small smooth
    // patches collide, measured in MultimodalSpec's margins probe —
    // also why tile-BLIND matching is unsafe and not offered); the
    // gate sits at minSlots=4, one slot of margin each way. rows-only.
    "q135_image_crop_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "image", Map.empty)
      val png = Multimodal.reencodeAsSmoothImage(media, jpeg = false)
      val crops = Multimodal.reencodeAsSmoothImageCrop(
        media.filter(col("asset_id") % 6 === 0))
        .withColumn("asset_id", col("asset_id") + 100000)
      // ORACLE-EXACT pairing (r13): the ten-tile hashes dump; DuckDB
      // replays the slot-aligned crop-hypothesis decision.
      val tiles = dumpAux(Multimodal.tileHashes(
        png.unionByName(crops), Multimodal.ImageIoDecoder), dir, "q135_tiles")
      Multimodal.centerCropNearDupsFromSigs(tiles, minSlots = 4, maxHamming = 3)
        .groupBy(when(col("crop_id") - col("orig_id") === 100000,
            "planted_center_crop").otherwise("other").as("pair_type"))
        .agg(countDistinct(col("orig_id"), col("crop_id")).as("n_pairs"),
          min(col("n_slots_matched")).as("min_slots_matched"),
          max(col("max_hamming")).as("max_hamming"))
    }),

    // ---- Image ROTATION/MIRROR near-dup: 150 ANISOTROPIC PNG plates
    // (the isotropic plate family is rotation-ALIASED — one seed's
    // quarter-turn genuinely approximates another seed, a synthetic
    // pathology real photos don't have; the pure-x component breaks
    // it); every 6th also rotated a quarter-turn clockwise under
    // id+100000 (outside plain dHash's envelope — q129 cannot pair
    // these). Eight dihedral orientation hashes per asset; a pair
    // needs witnesses in BOTH directions (A's orientation g vs B
    // canonical AND B's g⁻¹ vs A canonical — pixel-equal for true
    // pairs, independent accidents for strangers), the corroboration
    // argument behind minWitnesses=2: single one-way collisions exist
    // even on this corpus (margins probe), two-way ones don't.
    // rows-only.
    "q137_image_rotation_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "image", Map.empty)
      val png = Multimodal.reencodeAsSmoothImageRotated(media, k = 0)
      val rot = Multimodal.reencodeAsSmoothImageRotated(
        media.filter(col("asset_id") % 6 === 0), k = 1)
        .withColumn("asset_id", col("asset_id") + 100000)
      // ORACLE-EXACT pairing (r13): the eight dihedral orientation
      // hashes dump; DuckDB replays the two-directional witness rule.
      val sigs = dumpAux(Multimodal.dihedralHashes(
        png.unionByName(rot), Multimodal.ImageIoDecoder), dir, "q137_sigs")
      Multimodal.rotationNearDupsFromSigs(sigs, minWitnesses = 2, maxHamming = 3)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_rotated")
          .otherwise("other").as("pair_type"))
        .agg(countDistinct(col("id1"), col("id2")).as("n_pairs"),
          min(col("n_witnesses")).as("min_witnesses"),
          max(col("min_hamming")).as("max_hamming"))
    }),

    // ---- MEDIA curation END-TO-END bench line (the q128 idiom for the
    // media stack): ALL THREE image tiers run back to back each
    // invocation — scalar dHash over 150 plates + 25 JPEG re-encodes,
    // the slot-aligned crop tier over 150 plates + 25 center crops,
    // the two-witness rotation tier over 150 anisotropic plates + 25
    // quarter-turns (each tier on ITS calibrated fixture family) —
    // so the bench median times the full multi-tier media path and
    // the per-query diff trends it round-over-round. One row of
    // per-tier drop accounting: exactly the planted twins, nothing
    // else (q129/q135/q137 hold the fine-grained margins). rows-only.
    "q138_media_curation_e2e" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "image", Map.empty)
      val sixth = media.filter(col("asset_id") % 6 === 0)
      def shifted(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("asset_id", col("asset_id") + 100000)
      // tier 1: scalar re-encode dedup (plain plate family, q129's)
      val plainPng = Multimodal.reencodeAsSmoothImage(media, jpeg = false)
      val scalarDrops = Multimodal.imageNearDups(
          plainPng.unionByName(shifted(
            Multimodal.reencodeAsSmoothImage(sixth, jpeg = true))),
          Multimodal.ImageIoDecoder, maxHamming = 3)
        .select(greatest(col("id1"), col("id2")).as("id")).distinct()
      // tier 2: center-crop dedup (plain family + crop twins, q135's)
      val cropDrops = Multimodal.centerCropNearDups(
          plainPng.unionByName(shifted(
            Multimodal.reencodeAsSmoothImageCrop(sixth))),
          Multimodal.ImageIoDecoder, minSlots = 4, maxHamming = 3)
        .select(col("crop_id").as("id")).distinct()
      // tier 3: rotation dedup (anisotropic family, q137's)
      val rotDrops = Multimodal.rotationNearDups(
          Multimodal.reencodeAsSmoothImageRotated(media, k = 0)
            .unionByName(shifted(
              Multimodal.reencodeAsSmoothImageRotated(sixth, k = 1))),
          Multimodal.ImageIoDecoder, minWitnesses = 2, maxHamming = 3)
        .select(greatest(col("id1"), col("id2")).as("id")).distinct()
      scalarDrops.select(lit("scalar_reencode").as("tier"), col("id"))
        .unionByName(cropDrops.select(lit("center_crop").as("tier"), col("id")))
        .unionByName(rotDrops.select(lit("rotation").as("tier"), col("id")))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_dropped"),
          sum(when(col("id") >= 100000, 1).otherwise(0)).as("n_planted_dropped"))
    }),

    // ---- MEDIA data card: the corpusReport counterpart for asset
    // tables, over a deliberately DIRTY corpus — 100 plates with 5 null
    // payloads and 5 corrupt assets planted (a release report must
    // DESCRIBE a dirty corpus, not crash on it), plus 10 exact
    // duplicates of plate 0 (an 11-asset fingerprint collision group —
    // the "near-dup pass overdue" signal the card exists to surface).
    // Integer-only aggregates (the corpusReport bit-exactness rule).
    // ORACLE-EXACT card arithmetic (r13): the per-asset decode frame
    // dumps and DuckDB replays every aggregate (status cohorts, byte
    // extrema over healthy assets, fingerprint-group stats); the decode
    // pass itself stays rows-only. EntrySpec pins the planted numbers.
    "q136_media_report" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text",
        "image", Map.empty)
      val plates = Multimodal.reencodeAsSmoothImage(media, jpeg = false)
      val doctored = plates.withColumn("content",
        when(col("asset_id") % 20 === 7, lit(null).cast("binary"))
          .when(col("asset_id") % 20 === 11, encode(lit("not an image"), "UTF-8"))
          .otherwise(col("content")))
      val dups = Multimodal.reencodeAsSmoothImage(
        media.filter(col("asset_id") < 10).withColumn("seed", lit(0L)),
        jpeg = false, seedCol = "seed")
        .drop("seed").withColumn("asset_id", col("asset_id") + 100000)
      Multimodal.mediaReportFrom(
        dumpAux(Multimodal.mediaReportRows(doctored.unionByName(dups), "image"),
          dir, "q136_assets"),
        "image")
    }),

    // ---- Unigram-LM tokenizer (Kudo 2018): train on the docs<100
    // slice, then encode-lossless → decode over EVERY doc — with the
    // q112 mutation (every 7th doc gets an OOV suffix) exercising the
    // byte-fallback path. ORACLE-EXACT: the oracle replays the
    // mutation; equality pins totality + losslessness end to end.
    "q139_unigram_roundtrip" -> ((s, dir) => {
      val modelPath = ensureUnigramArtifact(s, dir)
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" naïve ☃😀")))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.unigramDecode(
            graft.functions.GraftFunctions.unigramEncodeLossless(
              col("text"), modelPath), modelPath).as("text"))
    }),

    // ---- Unigram token economy + internal consistency over the
    // held-out slice: the learned pieces must COMPRESS (total ids <
    // total non-whitespace UTF-16 units — singles alone would tie at
    // codepoints, multis push below) and `graft_unigram_count` must
    // equal `size(graft_unigram_encode)` on every doc (same memoized
    // segmentation, counted two ways). rows-only (Viterbi not SQL-
    // expressible); EntrySpec pins all four numbers' relations.
    "q140_unigram_economy" -> ((s, dir) => {
      val modelPath = ensureUnigramArtifact(s, dir)
      t(s, dir, "documents").filter(col("doc_id") >= 100)
        .select(
          graft.functions.GraftFunctions.unigramCount(col("text"), modelPath)
            .as("n_ids"),
          size(graft.functions.GraftFunctions.unigramEncode(col("text"), modelPath))
            .as("n_enc"),
          length(regexp_replace(col("text"), "\\s", "")).as("n_chars"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ids")).as("unigram_ids"),
          sum(when(col("n_ids") === col("n_enc"), 1L).otherwise(0L)).as("consistent"),
          sum(col("n_chars")).as("char_units"))
    }),

    // ---- WordPiece (Schuster & Nakajima 2012 / BERT): likelihood-
    // scored vocab trained on docs<100, then the STRUCTURAL round-trip
    // over every doc — segments re-joined with positional ##-stripping
    // and original whitespace, failed words kept verbatim. ORACLE-
    // EXACT against the identity (with the q112 OOV mutation): pins
    // the pretoken walker + greedy join as lossless; greedy CHOICE
    // semantics are WordPieceSpec's hand vocabularies.
    "q141_wordpiece_roundtrip" -> ((s, dir) => {
      val vocabPath = ensureWordPieceArtifact(s, dir)
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" naïve ☃😀")))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.wordPieceRoundtrip(col("text"), vocabPath)
            .as("text"))
    }),

    // ---- Context-window chunking under the UNIGRAM id budget (the
    // q60 shape on the third tokenizer family): greedy whitespace-
    // boundary fill where each chunk's declared cost is exactly what
    // graft_unigram_encode of its text emits. rows-only (Viterbi not
    // SQL-expressible); EntrySpec re-derives costs and budgets.
    "q142_unigram_chunking" -> ((s, dir) => {
      val modelPath = ensureUnigramArtifact(s, dir)
      graft.llm.CorpusPrep.chunkByUnigramBudget(
        t(s, dir, "documents").filter(col("doc_id") < 200),
        "doc_id", "text", budget = 128, modelPath = modelPath)
        .select("doc_id", "chunk_id", "chunk_tokens", "chunk_bpe_tokens")
    }),

    // ---- Markdown → plain-text ingest rewrite: every corpus doc's
    // text, SANITIZED of marker characters, is wrapped in constructed
    // markdown exercising the full rule set (header, bold+emphasis,
    // link+inline code, blockquote, list, hr, fenced code, table row +
    // separator), then stripped. ORACLE-EXACT: the oracle replays the
    // sanitize + the hand-derived expected layout — so every rule's
    // output is pinned against DuckDB on 500 real payloads.
    "q143_markdown_strip" -> ((s, dir) => {
      // explicit whitespace class, not \s: Java's \s includes U+000B
      // while RE2's does not, so a doc containing a vertical tab would
      // collapse differently in the two engines — the oracle uses the
      // identical class
      val p0 = trim(regexp_replace(regexp_replace(col("text"),
        "[\\]\\[()*_`#>|\\\\=:.~{}!+<-]", ""), "[ \\t\\n\\r\\f\\x0B]+", " "))
      val p = when(length(p0) === 0, lit("x")).otherwise(p0)
      val md = concat_ws("\n",
        lit("# Header One"),
        concat(lit("**"), p, lit("** mid *"), p, lit("*")),
        concat(lit("["), p, lit("](http://ex.com/a) and `"), p, lit("`")),
        concat(lit("> "), p),
        concat(lit("- item "), p),
        lit("---"),
        lit("```"),
        concat(lit("code "), p),
        lit("```"),
        concat(lit("| "), p, lit(" | cell |")),
        lit("|---|---|"))
      tH(s, dir, "documents").select(col("doc_id"),
        graft.functions.GraftFunctions.markdownStrip(md).as("text"))
    }),

    // ---- Streaming SINGLE-PASS near-dedup (the foreachBatch cluster
    // op, Streamer `operation = near-dedup-cluster`): two micro-batches
    // through the CLI with planted in-batch near (case-changed echo —
    // same SimHash, different sha) and exact dups, plus a cross-batch
    // echo that must drop via the ACCRETED parts state. Rows = the
    // per-batch survivors. Artifacts are marker-gated so bench
    // re-invocations replay the committed checkpoint (AvailableNow
    // with no new files is a no-op) — deterministic across runs.
    // rows-only by design (a stateful CLI e2e, like q128/q138);
    // EntrySpec pins the exact id sets per batch.
    "q145_stream_cluster_e2e" -> ((s, dir) => {
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_q145_" + Integer.toHexString(dir.hashCode))
      root.mkdirs()
      val landing = new java.io.File(root, "landing").toString
      val out = new java.io.File(root, "clustered").toString
      // torn-state detection: a crash between a streamer commit and its
      // marker leaves landing/checkpoint out of lockstep — the retry
      // would re-append the same rows, which the committed checkpoint
      // processes as a NEW batch, shifting batch numbering permanently.
      // Any run evidence without its marker → wipe and rebuild (every
      // file under the root is regenerable).
      locally {
        def rmAll(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete(); ()
        }
        val torn =
          (!new java.io.File(root, "_RAN1").exists() &&
            new java.io.File(root, "ckpt").exists()) ||
          (!new java.io.File(root, "_RAN2").exists() &&
            new java.io.File(out, "batch-1").exists())
        if (torn) { rmAll(root); root.mkdirs(): Unit }
      }
      val confFile = new java.io.File(root, "streamer.conf")
      java.nio.file.Files.writeString(confFile.toPath,
        s"""streaming {
           |  events-dir = $landing
           |  target-dir = $out
           |  checkpoint-location = ${new java.io.File(root, "ckpt")}
           |  operation = near-dedup-cluster
           |  cluster-state-dir = ${new java.io.File(root, "cluster_state")}
           |}
           |""".stripMargin)
      // texts derived from each id's sha2 (8 hex words): pairwise FAR
      // in shingle space by construction. The raw corpus is word-salad
      // over a tiny vocabulary where natural SimHash near-collisions
      // are routine (doc 12 pairs with a doc<10 at sf0.001) — planted
      // echoes, not corpus accidents, must decide this gate's sets
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ", (0 until 8).map(i =>
          substring(sha2(col("doc_id").cast("string"), 256), i * 8 + 1, 8)): _*)
          .as("text"))
      def run(markerName: String)(land: => Unit): Unit = {
        val marker = new java.io.File(root, markerName)
        if (!marker.exists()) {
          land
          graft.cli.Streamer.main(Array("--conf", confFile.toString))
          marker.createNewFile(): Unit
        }
      }
      run("_RAN1") {
        docs.filter(col("doc_id") < 10)
          .unionByName(docs.filter(col("doc_id") === 0)
            .select((col("doc_id") + 900000).as("doc_id"),
              upper(col("text")).as("text")))   // in-batch NEAR echo
          .unionByName(docs.filter(col("doc_id") === 1)
            .select((col("doc_id") + 900000).as("doc_id"), col("text")))
          .coalesce(1).write.mode("append").parquet(landing) // in-batch EXACT
      }
      run("_RAN2") {
        docs.filter(col("doc_id") >= 10 && col("doc_id") < 15)
          .unionByName(docs.filter(col("doc_id") === 2)
            .select((col("doc_id") + 900000).as("doc_id"),
              upper(col("text")).as("text")))   // cross-batch echo vs state
          .coalesce(1).write.mode("append").parquet(landing)
      }
      s.read.parquet(s"$out/batch-0").select(lit(0L).as("batch"), col("doc_id"))
        .unionByName(
          s.read.parquet(s"$out/batch-1").select(lit(1L).as("batch"), col("doc_id")))
        .orderBy(col("batch"), col("doc_id"))
    }),

    // ---- Image NEAR-DUP via DCT hash (pHash), blur+re-quantization:
    // 150 deterministic TEXTURED plates (seed-random low-frequency
    // spectra — the photo-like regime a DCT hash operates in; the
    // single-sinusoid q129 plates are measured-degenerate for it)
    // rendered as REAL PNGs; every 6th also as a 3×3-box-blurred JPEG
    // at quality 0.3 of the SAME plate under id+100000 — a degradation
    // OUTSIDE dHash's envelope (MediaEnvelopeProbe, 500 seeds: dHash
    // twin max 10 vs stranger min 10, no radius separates; pHash twins
    // ≤ 8 vs strangers ≥ 13). Hash through the published DCT pHash
    // (gray → 32×32 → 2-D DCT → 8×8 low block → sign vs AC mean),
    // pair through the SAME banded engine at radius 7 over 4 bands of
    // 16 bits with the Hamming-<=1 MULTI-PROBE (pigeonhole-complete:
    // 7 differing bits over 4 bands leave some band with <=1; the
    // r13 8-band form's 8-bit bucket keys saturated the hot-bucket
    // guard at corpus scale — PerfProbe 19). The replay below is
    // banding-agnostic (all pairs within the radius), so completeness
    // of the probed geometry is exactly what the oracle pins.
    // ORACLE-EXACT pairing via dump-and-replay
    // (q129 idiom); the pixel decode stays SQL-inexpressible —
    // MultimodalSpec holds the kernel laws.
    "q144_image_blur_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "image", Map.empty)
      val png = Multimodal.reencodeAsTexturedImage(media)
      val degradedTwins = Multimodal.reencodeAsTexturedImageDegraded(
        media.filter(col("asset_id") % 6 === 0))
        .withColumn("asset_id", col("asset_id") + 100000)
      val sigs = dumpAux(Multimodal.dctHashes(
        png.unionByName(degradedTwins), Multimodal.ImageIoDecoder), dir, "q144_sigs")
      graft.llm.Dedup.sigNearDups(sigs, maxHamming = 7, bands = 4, probe = 1)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_degraded")
          .otherwise("other").as("pair_type"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("hamming")).as("min_hamming"),
          max(col("hamming")).as("max_hamming"))
    }),

    // ---- WIDE (256-bit) DCT image near-dup — the round-14 verdict's
    // prescribed remedy landed: pHash256 signatures through the wide
    // banded engine (Dedup.wideSigNearDups) at radius 15 on SIXTEEN
    // 16-bit bands, probe 0 — a geometry the 64-bit engine structurally
    // cannot run (16 bands of 4-bit keys saturate instantly; 8 probed
    // bands cap at radius 15 with 8-bit keys that saturate past ~2.5M —
    // PerfProbe 20 measures both). Fixture: wide-spectrum textured
    // plates (16×16 planted block — the band the kernel reads) with
    // blur+JPEG-q30 twins (measured envelope: twin max 10, stranger
    // min 98 at 150 seeds). ORACLE-EXACT and STRONGER than banded
    // parity: the dumped 4-word signatures replay in DuckDB as the
    // full O(n²) brute-force Hamming join — equality pins the banded
    // join complete AND sound against ground truth.
    "q147_image_wide_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 150), "doc_id", "text",
        "image", Map.empty)
      val png = Multimodal.reencodeAsTexturedImageWide(media)
      val degradedTwins = Multimodal.reencodeAsTexturedImageWideDegraded(
        media.filter(col("asset_id") % 6 === 0))
        .withColumn("asset_id", col("asset_id") + 100000)
      val sigs4 = dumpAux(
        Multimodal.dctHashesWide(
          png.unionByName(degradedTwins), Multimodal.ImageIoDecoder)
          .select(col("id"),
            element_at(col("sig"), 1).as("s0"), element_at(col("sig"), 2).as("s1"),
            element_at(col("sig"), 3).as("s2"), element_at(col("sig"), 4).as("s3")),
        dir, "q147_sigs")
      val sigs = sigs4.select(col("id"),
        array(col("s0"), col("s1"), col("s2"), col("s3")).as("sig"))
      graft.llm.Dedup.wideSigNearDups(sigs, maxHamming = 15, bands = 16,
        probe = 0, sigBits = 256)
        .groupBy(when(col("id2") - col("id1") === 100000, "planted_degraded")
          .otherwise("other").as("pair_type"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("hamming")).as("min_hamming"),
          max(col("hamming")).as("max_hamming"))
    }),

    // ---- The wide engine's INCREMENTAL form (wideSigNearDupsAgainst)
    // through the full persisted-state protocol: corpus wide sigs +
    // mergeable wideBucketCounts-derived hot table, batch = degraded
    // echoes of every 5th corpus plate (+100000) plus fresh
    // wide-spectrum plates the corpus has never seen. Row-level output
    // (batch_id, corpus_id, hamming) — ORACLE-EXACT via the q147
    // brute-force replay over the two dumped signature tables, so the
    // batch-vs-corpus banding is pinned complete AND sound. The batch
    // probes at depth 1 (radius 15 over 16 bands needs only probe 0 —
    // depth 1 exercises the probe-agnostic state contract in-gate:
    // same pairs, same persisted hot table).
    "q148_wide_incremental_neardup" -> ((s, dir) => {
      import graft.llm.Multimodal
      val media = Multimodal.asMediaTable(
        t(s, dir, "documents").filter(col("doc_id") < 120), "doc_id", "text",
        "image", Map.empty)
      val corpusSigs4 = dumpAux(
        Multimodal.dctHashesWide(
          Multimodal.reencodeAsTexturedImageWide(media), Multimodal.ImageIoDecoder)
          .select(col("id"),
            element_at(col("sig"), 1).as("s0"), element_at(col("sig"), 2).as("s1"),
            element_at(col("sig"), 3).as("s2"), element_at(col("sig"), 4).as("s3")),
        dir, "q148_corpus_sigs")
      val echoes = Multimodal.reencodeAsTexturedImageWideDegraded(
        media.filter(col("asset_id") % 5 === 0))
        .withColumn("asset_id", col("asset_id") + 100000)
      val freshMedia = Multimodal.reencodeAsTexturedImageWide(
        media.filter(col("asset_id") < 20)
          .withColumn("asset_id", col("asset_id") + 200000))
      val batchSigs4 = dumpAux(
        Multimodal.dctHashesWide(
          echoes.unionByName(freshMedia), Multimodal.ImageIoDecoder)
          .select(col("id"),
            element_at(col("sig"), 1).as("s0"), element_at(col("sig"), 2).as("s1"),
            element_at(col("sig"), 3).as("s2"), element_at(col("sig"), 4).as("s3")),
        dir, "q148_batch_sigs")
      def arr(df: DataFrame) = df.select(col("id"),
        array(col("s0"), col("s1"), col("s2"), col("s3")).as("sig"))
      val hot = graft.llm.Dedup.hotFromCounts(
        graft.llm.Dedup.wideBucketCounts(arr(corpusSigs4), 16, 256), 10000)
      graft.llm.Dedup.wideSigNearDupsAgainst(
        arr(batchSigs4), arr(corpusSigs4), maxHamming = 15, bands = 16,
        corpusHotBuckets = Some(hot), probe = 1, sigBits = 256)
    }),

    // ---- S7's CAPABILITY, oracle-exact (round-15 verdict item 5):
    // the reference's `sample` config satisfied by the DETERMINISTIC
    // digest sampler under `sample-method = digest` — the md5 recipe
    // (Ops.hashSample, q28's idiom) instead of Spark's engine-specific
    // Bernoulli RNG, driven through the very DataIO.read config path
    // S7 lives in. q5 stays as the fidelity pin on Spark's own sampler
    // (rows-only by nature); THIS gate makes seeded sampling as a
    // capability hash-verified: the predicate replays verbatim in any
    // engine with md5.
    "q150_digest_sample" -> ((s, dir) =>
      graft.sources.DataIO.read(s, graft.conf.GraftConfig.parse(
        s"""source {
           |  storage-type = local
           |  dataset-dir = $dir/lineitem.parquet
           |  sample = 0.25
           |  sample-method = digest
           |  sample-id-column = l_orderkey
           |  sample-salt = q150
           |}
           |""".stripMargin).at("source"))
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // ---- Bench LOAD-CALIBRATION query (round-15 verdict item 3):
    // PINNED UNTOUCHED reference code, like q1-q10 — part of the
    // bench's baseline set, whose total is the box-load proxy behind
    // `load_scale` / `norm_vs_prev`. q1-q10 are tiny single-stage
    // scans (2.5 s at sf0.1 combined) that barely feel the co-tenant
    // steal a multi-stage shuffle pays (~10% measured in r14), so the
    // proxy under-read; this query is the deliberately MID-WEIGHT
    // member: two wide aggregations, a sort-merge join pinned by hint
    // (broadcast would dodge the shuffle the proxy must feel), and a
    // bucketed ranking window — 4 exchanges of real shuffle volume.
    // All-decimal arithmetic and integer ranks keep it oracle-exact
    // (ties broken by key; no float-order sensitivity). DO NOT tune
    // this query: its value is being identical across rounds.
    "q149_load_calibration" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      // the table stores doubles; the revenue ranking key must be
      // EXACT (a float sum is partition-order dependent and its
      // round(2) knife-edges across engines) — cast to decimal FIRST,
      // then every aggregate downstream is exact arithmetic
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("revenue"))
      val perCust = perOrder
        .join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("qty")).as("cust_qty"),
          sum(col("revenue")).as("cust_revenue"))
      val bucket = pmod(col("o_custkey"), lit(16))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(bucket).orderBy(col("cust_revenue").desc, col("o_custkey"))
      perCust
        .withColumn("bucket", bucket.cast("long"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 200)
        .select(col("bucket"), col("rnk"), col("o_custkey"), col("n_orders"),
          round(col("cust_qty"), 2).as("cust_qty"),
          // exact decimal ranking above; DOUBLE on the way out (the
          // rounded value is 2-decimal exact, so the conversion is
          // deterministic) — DuckDB's round() emits float64
          round(col("cust_revenue"), 2).cast("double").as("cust_revenue"))
    }),

    // ---- Fill-in-the-middle transform (Bavarian et al. 2022,
    // 2207.14255 — the infilling-pretraining staple for code corpora):
    // at fim_rate 0.5, split each selected doc at two md5-derived
    // character cuts and re-emit as sentinel-delimited
    // prefix/suffix/middle (PSM). Pure scan-speed column program —
    // digest predicate, hex-parsed cuts, substr concat — so the oracle
    // replays EVERY step: ORACLE-EXACT on the full transformed text.
    // The sentinels are exactly the protected-special-token surface
    // (q127) downstream tokenization rides. CorpusPrepSpec pins the
    // reassembly law (prefix ⧺ middle ⧺ suffix == text) and both modes.
    "q146_fim_transform" -> ((s, dir) =>
      graft.llm.CorpusPrep.fimTransform(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", rate = 0.5)
        .select(col("doc_id"), col("fim_applied"), col("fim_text"))),

    // ---- CCNet in its PRODUCTION configuration: per-source
    // head/middle/tail thirds by the KenLM-class model's score — q98's
    // bucket machinery over MODIFIED-KN (q98 buckets on the unigram
    // LM; Wenzek et al. 2019 bucket on a 5-gram KenLM model). Scores
    // come through the native registry (the zero-shuffle production
    // path) and round to 6 BEFORE ranking so percent_rank ties
    // identically cross-engine. ORACLE-EXACT: the whole mod chain AND
    // the bucket replay in one generated CTE program.
    "q120_mkn_ppl_buckets" -> ((s, dir) => {
      import graft.llm.CorpusPrep
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      val lmPath = ensureKnArtifact(s, dir, order = 4)
      val scored = docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"), col("source"),
          round(graft.functions.GraftFunctions.knModLogProb(col("text"), lmPath), 6)
            .as("mkn_logp"))
        .filter(col("mkn_logp").isNotNull)
      CorpusPrep.perplexityBuckets(scored, "mkn_logp", Seq("source"))
        .select(col("doc_id"), col("source"), col("mkn_logp"), col("ppl_bucket"))
    }),

    // ---- CCNet perplexity buckets (Wenzek et al. 2019): per source,
    // head/middle/tail thirds by unigram-LM score (q71's training and
    // arithmetic). The score is rounded to the oracle's 6 decimals
    // BEFORE ranking so cross-engine libm noise cannot flip an
    // ordering; percent_rank tie/boundary semantics are identical in
    // Spark and DuckDB (ties share a rank; a pr exactly on 1/3 is
    // middle in both). The scale path (threshold form, zero per-group
    // sort) is pinned against this exact form in CorpusPrepSpec.
    "q98_ppl_buckets" -> ((s, dir) => graft.llm.LangModel.releasingCaches(s) {
      import graft.llm.{CorpusPrep, LangModel}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      val lm = LangModel.trainUnigram(
        docs.filter(col("doc_id") < 100), "text", minCount = 2)
      val scored = LangModel.logProbPerDoc(
        docs.filter(col("doc_id") >= 100), lm, "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("source"), round(col("lm_logp"), 6).as("lm_logp"))
      CorpusPrep.perplexityBuckets(scored, "lm_logp", Seq("source"))
        .select(col("doc_id"), col("source"), col("lm_logp"), col("ppl_bucket"))
    }),
  )

  /** DuckDB replay of [[graft.llm.Dedup.sigNearDups]] over a dumped
    * `(id, sig)` table: all pairs within `maxHamming` bits
    * (bit_count(xor) — DuckDB's BIGINT bit ops match Java's two's-
    * complement longs exactly), summarized per pair type the way the
    * media gates do. */
  private def scalarSigPairOracleSql(auxName: String, maxHamming: Int,
      plantedLabel: String): String =
    s"""WITH s AS (SELECT id, sig FROM read_parquet('__AUX__/$auxName/*.parquet')),
       |p AS (
       |  SELECT a.id AS id1, b.id AS id2,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |  FROM s a JOIN s b ON a.id < b.id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming)
       |SELECT
       |  CASE WHEN id2 - id1 = 100000 THEN '$plantedLabel' ELSE 'other' END AS pair_type,
       |  count(*)::BIGINT AS n_pairs,
       |  min(hamming) AS min_hamming,
       |  max(hamming) AS max_hamming
       |FROM p GROUP BY 1""".stripMargin

  /** The 4-word Hamming sum over two aliased `(s0..s3)` sig rows —
    * shared by the WIDE brute-force replays (q147/q148). Each term
    * casts BEFORE the sum: DuckDB's bit_count returns TINYINT and four
    * 64-bit word counts can pass 127. */
  private def wideHammingSql(a: String, b: String): String =
    Seq("s0", "s1", "s2", "s3")
      .map(w => s"CAST(bit_count(xor($a.$w, $b.$w)) AS INTEGER)")
      .mkString("(", " + ", ")")

  /** DuckDB replay of [[graft.llm.Dedup.wideSigNearDups]] over a dumped
    * 4-word `(id, s0..s3)` signature table: the FULL O(n²) brute-force
    * Hamming join — equality pins the wide banded join complete and
    * sound against ground truth, not merely self-consistent. */
  private def wideSigPairOracleSql(auxName: String, maxHamming: Int,
      plantedLabel: String): String =
    s"""WITH s AS (SELECT id, s0, s1, s2, s3
       |  FROM read_parquet('__AUX__/$auxName/*.parquet')),
       |p AS (
       |  SELECT a.id AS id1, b.id AS id2,
       |    ${wideHammingSql("a", "b")} AS hamming
       |  FROM s a JOIN s b ON a.id < b.id)
       |SELECT
       |  CASE WHEN id2 - id1 = 100000 THEN '$plantedLabel' ELSE 'other' END AS pair_type,
       |  count(*)::BIGINT AS n_pairs,
       |  min(hamming) AS min_hamming,
       |  max(hamming) AS max_hamming
       |FROM p WHERE hamming <= $maxHamming GROUP BY 1""".stripMargin

  /** DuckDB replay of [[graft.llm.Dedup.seqSigNearDups]] over a dumped
    * `(id, <seqCol>, sig)` table: sub-signature matches grouped per
    * (pair, index delta), a pair passing when one delta accumulates
    * `minMatches` — then the gates' distinct-pair summary. */
  private def seqSigPairOracleSql(auxName: String, seqCol: String,
      maxHamming: Int, minMatches: Int, plantedLabel: String,
      minMatchedName: String): String =
    s"""WITH s AS (SELECT id, $seqCol AS w, sig
       |  FROM read_parquet('__AUX__/$auxName/*.parquet')),
       |m AS (
       |  SELECT a.id AS id1, b.id AS id2, a.w AS s1, b.w AS s2,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |  FROM s a JOIN s b ON a.id < b.id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming),
       |g AS (
       |  SELECT id1, id2, CAST(s1 - s2 AS INTEGER) AS delta,
       |    count(*)::BIGINT AS n_matched, max(hamming) AS max_hamming
       |  FROM m GROUP BY id1, id2, s1 - s2
       |  HAVING count(*) >= $minMatches)
       |SELECT
       |  CASE WHEN id2 - id1 = 100000 THEN '$plantedLabel'
       |       ELSE 'other' END AS pair_type,
       |  count(DISTINCT (id1, id2))::BIGINT AS n_pairs,
       |  min(n_matched) AS $minMatchedName,
       |  max(max_hamming) AS max_hamming,
       |  min(delta) AS min_delta,
       |  max(delta) AS max_delta
       |FROM g GROUP BY 1""".stripMargin

  /** q62's signature-tier Hamming budget — the same derived value
    * `dropSeenVectors` uses at its 0.99 default. */
  private lazy val q62MaxHamming: Int =
    graft.llm.Similarity.defaultMaxHamming(0.99)

  /** DuckDB replay of the exact-cosine pairing summary over a dumped
    * `(vec_id, embedding)` table: all pairs at `minCosine`, the q39/q42
    * pair-type rollup. Vectors cast to DOUBLE[] so both engines run
    * double arithmetic over the same floats (VecMath.cosine semantics;
    * decision margins are ~0.5 wide so last-ulp noise cannot flip a
    * pair, and the 4-decimal rounding absorbs it in the summary). */
  private def vecPairOracleSql(auxName: String, minCosine: Double): String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
       |  FROM read_parquet('__AUX__/$auxName/*.parquet')),
       |p AS (
       |  SELECT a.vec_id AS id1, b.vec_id AS id2,
       |    list_dot_product(a.e, b.e) /
       |      (sqrt(list_dot_product(a.e, a.e)) *
       |       sqrt(list_dot_product(b.e, b.e))) AS cos_sim
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
       |SELECT
       |  CASE WHEN id2 - id1 = 100000 THEN 'planted' ELSE 'other' END AS pair_type,
       |  count(*)::BIGINT AS n_pairs,
       |  round(min(cos_sim), 4) AS min_cos,
       |  round(avg(cos_sim), 4) AS avg_cos
       |FROM p WHERE cos_sim >= $minCosine GROUP BY 1""".stripMargin

  /** DuckDB replay of [[graft.llm.Similarity.probeRecall]] over dumped
    * brute/probe shortlists — semi-join hit counting, coalesce, the
    * 4-decimal rounding. Emitted as CTEs ending in `r(query_id,
    * n_true, n_hits, recall)` so callers can aggregate further. */
  private def probeRecallOracleCtes(bruteAux: String, probeAux: String): String =
    s"""b AS (SELECT query_id, neighbor_id
       |  FROM read_parquet('__AUX__/$bruteAux/*.parquet')),
       |pp AS (SELECT query_id, neighbor_id
       |  FROM read_parquet('__AUX__/$probeAux/*.parquet')),
       |h AS (
       |  SELECT b.query_id, count(*)::BIGINT AS n_hits FROM b
       |  WHERE EXISTS (SELECT 1 FROM pp
       |    WHERE pp.query_id = b.query_id AND pp.neighbor_id = b.neighbor_id)
       |  GROUP BY b.query_id),
       |t AS (SELECT query_id, count(*)::BIGINT AS n_true FROM b GROUP BY query_id),
       |r AS (
       |  SELECT t.query_id, t.n_true, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       |    round(coalesce(h.n_hits, 0)::DOUBLE / t.n_true, 4) AS recall
       |  FROM t LEFT JOIN h USING (query_id))""".stripMargin

  /** q76/q77's planted corpus: a shared 12-token passage appended to
    * every 5th doc, twice (a self-repeat) on doc 7. */
  private def SpanDedupCorpus(documents: DataFrame): DataFrame = {
    val p = "the quick brown fox jumps over the lazy dog again and again"
    documents.select(col("doc_id"), col("text")).filter(col("doc_id") < 150)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" " + p)))
          .when(col("doc_id") === 7, concat(col("text"), lit(" " + p + " " + p)))
          .otherwise(col("text")))
  }

  /** q60's deterministic merge table (common English pair merges),
    * written once to the JVM temp dir — the gate needs a merges PATH
    * and the environment ships none. Content is fixed, so the BPE
    * counts are reproducible across runs and processes. */
  private lazy val q60MergesPath: String = {
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_q60_merges.txt")
    val content = Seq("#version: 0.2",
      "t h", "th e", "i n", "in g", "a n", "an d", "e r", "o n",
      "r e", "a t", "e n", "o r", "t i", "ti on", "s t", "l e")
      .mkString("\n")
    if (!f.exists || f.length != content.getBytes("UTF-8").length) {
      val tmp = java.io.File.createTempFile("graft_q60_merges", ".tmp")
      java.nio.file.Files.write(tmp.toPath, content.getBytes("UTF-8"))
      tmp.renameTo(f) // atomic-enough publish; content is constant
      ()
    }
    f.getAbsolutePath
  }

  /** Shared by q71 (composable explode+join+avg) and q72 (native
    * graft_lm_logprob over a saved LM file): ONE oracle pins both
    * hash-exactly — the Laplace arithmetic replayed verbatim
    * (vocab = ref tokens with count ≥ 2; D = N + V + 1; OOV cnt 0). */
  /** q76/q77's shared oracle: the span-dedup program replayed verbatim
    * in SQL — same planted corpus, same first-occurrence keep rule with
    * the same-doc overlap exemption, same windowed index union, same
    * ordered reassembly with untouched docs passing through verbatim. */
  private val SpanDedupOracleSql: String = {
    val p = "the quick brown fox jumps over the lazy dog again and again"
    s"""WITH docs AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' ' || '$p'
      |         WHEN doc_id = 7 THEN text || ' ' || '$p' || ' ' || '$p'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id < 150),
      |toks AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0) AS tk
      |  FROM docs),
      |span0 AS (
      |  SELECT doc_id, tk,
      |    unnest(generate_series(1, greatest(len(tk) - 9, 0))) AS i
      |  FROM toks),
      |spans AS (
      |  SELECT doc_id, i - 1 AS off, array_to_string(tk[i:i+9], ' ') AS key
      |  FROM span0),
      |ranked AS (
      |  SELECT doc_id, off,
      |    count(*) OVER (PARTITION BY key) AS cnt,
      |    first_value(doc_id) OVER w AS fid,
      |    first_value(off) OVER w AS foff
      |  FROM spans
      |  WINDOW w AS (PARTITION BY key ORDER BY doc_id, off
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
      |marked AS (
      |  SELECT doc_id, off FROM ranked
      |  WHERE cnt >= 2 AND NOT (doc_id = fid AND abs(off - foff) < 10)),
      |removed AS (
      |  SELECT DISTINCT doc_id, idx FROM (
      |    SELECT doc_id, unnest(generate_series(off, off + 9)) AS idx FROM marked)),
      |toks_pos AS (
      |  SELECT doc_id, unnest(tk) AS tok,
      |    unnest(generate_series(1, len(tk))) - 1 AS idx
      |  FROM toks WHERE doc_id IN (SELECT doc_id FROM removed)),
      |kept AS (
      |  SELECT t.doc_id, t.idx, t.tok FROM toks_pos t
      |  WHERE NOT EXISTS (SELECT 1 FROM removed r
      |                    WHERE r.doc_id = t.doc_id AND r.idx = t.idx)),
      |rebuilt AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS rtext,
      |    count(*) AS n_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CASE WHEN r0.doc_id IS NULL THEN d.text
      |       ELSE coalesce(rb.rtext, '') END AS text,
      |  CASE WHEN r0.doc_id IS NULL THEN CAST(0 AS BIGINT)
      |       ELSE len(t.tk) - coalesce(rb.n_kept, 0) END AS n_removed
      |FROM docs d
      |JOIN toks t USING (doc_id)
      |LEFT JOIN (SELECT DISTINCT doc_id FROM removed) r0 USING (doc_id)
      |LEFT JOIN rebuilt rb USING (doc_id)""".stripMargin
  }

  /** q79/q80's shared oracle: BOTH unigram LM trainings (src0-target
    * and full-corpus-raw, the exact q71 Laplace arithmetic), the
    * rounded log-prob ratio, and the q58 E–S rank replay — the whole
    * DSIR pipeline verbatim in SQL. */
  private val DsirOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0)) AS token
      |  FROM documents),
      |tvocab AS (
      |  SELECT token, count(*) AS cnt FROM toks WHERE source = 'src0'
      |  GROUP BY token HAVING count(*) >= 2),
      |td AS (SELECT CAST(coalesce(sum(cnt), 0) + count(*) + 1 AS DOUBLE) AS d
      |       FROM tvocab),
      |rvocab AS (
      |  SELECT token, count(*) AS cnt FROM toks
      |  GROUP BY token HAVING count(*) >= 2),
      |rd AS (SELECT CAST(coalesce(sum(cnt), 0) + count(*) + 1 AS DOUBLE) AS d
      |       FROM rvocab),
      |lt AS (
      |  SELECT t.doc_id,
      |    round(avg(log10(CAST(coalesce(v.cnt, 0) + 1 AS DOUBLE) / td.d)), 6) AS lt
      |  FROM toks t LEFT JOIN tvocab v USING (token) CROSS JOIN td
      |  GROUP BY t.doc_id),
      |lr AS (
      |  SELECT t.doc_id,
      |    round(avg(log10(CAST(coalesce(v.cnt, 0) + 1 AS DOUBLE) / rd.d)), 6) AS lr
      |  FROM toks t LEFT JOIN rvocab v USING (token) CROSS JOIN rd
      |  GROUP BY t.doc_id),
      |w AS (
      |  SELECT d.doc_id, d.source, pow(10.0, lt.lt - lr.lr) AS w
      |  FROM documents d JOIN lt USING (doc_id) JOIN lr USING (doc_id))
      |SELECT doc_id, source, round(w, 6) AS dsir_weight FROM (
      |  SELECT *, -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'q79'),
      |      1, 15))::UBIGINT + 1.0) / 1152921504606846976.0) / w AS wkey
      |  FROM w WHERE w > 0)
      |ORDER BY wkey, doc_id LIMIT 150""".stripMargin

  /** q82/q83's shared oracle: both trainings, position-0 unigram
    * arithmetic, Laplace conditionals, 6-decimal rounding. */
  private val BigramOracleSql: String =
    """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |uni AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(tk) AS token FROM toks WHERE doc_id < 100)
        |  GROUP BY token HAVING count(*) >= 2),
        |uv AS (SELECT CAST(coalesce(sum(cnt), 0) + count(*) + 1 AS DOUBLE) AS du,
        |              CAST(count(*) AS DOUBLE) AS v
        |       FROM uni),
        |big AS (
        |  SELECT w1, w2, count(*) AS cnt2 FROM (
        |    SELECT tk[i-1] AS w1, tk[i] AS w2 FROM (
        |      SELECT tk, unnest(generate_series(2, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2 HAVING count(*) >= 2),
        |first AS (
        |  SELECT t.doc_id, log10((coalesce(u.cnt, 0) + 1) / uv.du) AS logp
        |  FROM (SELECT doc_id, tk[1] AS token FROM toks
        |        WHERE doc_id >= 100 AND len(tk) > 0) t
        |  LEFT JOIN uni u USING (token) CROSS JOIN uv),
        |pairs AS (
        |  SELECT doc_id, tk[i-1] AS w1, tk[i] AS w2 FROM (
        |    SELECT doc_id, tk, unnest(generate_series(2, len(tk))) AS i
        |    FROM toks WHERE doc_id >= 100)),
        |scored AS (
        |  SELECT p.doc_id,
        |    log10(CAST(coalesce(b.cnt2, 0) + 1 AS DOUBLE) /
        |          (coalesce(u.cnt, 0) + uv.v + 1)) AS logp
        |  FROM pairs p
        |  LEFT JOIN big b USING (w1, w2)
        |  LEFT JOIN uni u ON p.w1 = u.token
        |  CROSS JOIN uv),
        |allpos AS (SELECT * FROM first UNION ALL SELECT * FROM scored)
        |SELECT doc_id, round(avg(logp), 6) AS lm2_logp,
        |  CAST(count(*) AS BIGINT) AS lm2_positions
        |FROM allpos GROUP BY doc_id""".stripMargin

  private val PackTokenIdsOracleSql: String =
    """WITH d AS (
        |  SELECT doc_id,
        |    list_transform(regexp_extract_all(trim(text), '\S+'),
        |      t -> length(t)) AS ids
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, doc_id % 8 AS bucket,
        |    list_append(ids, 0) AS stream, len(ids) + 1 AS n
        |  FROM d),
        |c AS (
        |  SELECT *, sum(n) OVER (PARTITION BY bucket ORDER BY doc_id) - n AS start
        |  FROM e),
        |tok AS (
        |  SELECT bucket, start, stream,
        |    unnest(generate_series(1, n)) AS i
        |  FROM c),
        |pos AS (
        |  SELECT bucket,
        |    (start + i - 1) // 128 AS s,
        |    start + i - 1 AS gpos,
        |    stream[i] AS tk,
        |    CASE WHEN i = 1 THEN 1 ELSE 0 END AS is_start
        |  FROM tok)
        |SELECT
        |  (bucket * (1::BIGINT << 40) + s)::BIGINT AS seq_id,
        |  count(*)::BIGINT AS n_tokens,
        |  sum(is_start)::BIGINT AS n_docs_started,
        |  string_agg(tk::VARCHAR, ',' ORDER BY gpos) AS ids_csv,
        |  coalesce(string_agg(CASE WHEN is_start = 1
        |    THEN (gpos % 128)::VARCHAR END, ',' ORDER BY gpos), '')
        |    AS boundaries_csv
        |FROM pos
        |GROUP BY bucket, s""".stripMargin

  /** The scored-slice predicates the LM oracles parameterize over: the
    * NATIVE registries (q86/q94) score the whole held-out corpus —
    * that is the production shape being demonstrated — while the
    * COMPOSABLE anchors (q85/q93) score a fixed 600-doc slice at
    * every SF (the q96 bounding idiom): their count-arithmetic join
    * programs exist to pin the oracle arithmetic, not to demonstrate
    * scoring throughput, and unbounded they dominated bench HEAP
    * (~2 GB at sf0.1 — round-8 verdict item) for no extra evidence. */
  private val LmScoredFull = "doc_id >= 100"
  private val LmScoredBounded = "doc_id >= 100 AND doc_id < 700"

  /** q85/q86's oracle (same program, scored slice parameterized): all
    * three trainings, then the exact per-position stupid-backoff CASE —
    * raw ratios at the n-gram levels, `log10(0.4)` added per backoff
    * step, Laplace floor at the unigram, 6-decimal rounding. */
  private def trigramOracleSql(scored: String): String =
    raw"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |uni AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(tk) AS token FROM toks WHERE doc_id < 100)
        |  GROUP BY token HAVING count(*) >= 2),
        |uv AS (SELECT CAST(coalesce(sum(cnt), 0) + count(*) + 1 AS DOUBLE) AS du
        |       FROM uni),
        |big AS (
        |  SELECT w1, w2, count(*) AS cnt2 FROM (
        |    SELECT tk[i-1] AS w1, tk[i] AS w2 FROM (
        |      SELECT tk, unnest(generate_series(2, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT w1, w2, w3, count(*) AS cnt3 FROM (
        |    SELECT tk[i-2] AS w1, tk[i-1] AS w2, tk[i] AS w3 FROM (
        |      SELECT tk, unnest(generate_series(3, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2, w3 HAVING count(*) >= 2),
        |first AS (
        |  SELECT t.doc_id, log10((coalesce(u.cnt, 0) + 1) / uv.du) AS logp
        |  FROM (SELECT doc_id, tk[1] AS token FROM toks
        |        WHERE $scored AND len(tk) > 0) t
        |  LEFT JOIN uni u USING (token) CROSS JOIN uv),
        |second AS (
        |  SELECT t.doc_id,
        |    CASE WHEN b.cnt2 IS NOT NULL
        |         THEN log10(CAST(b.cnt2 AS DOUBLE) / u1.cnt)
        |         ELSE log10(0.4) + log10((coalesce(u2.cnt, 0) + 1) / uv.du)
        |    END AS logp
        |  FROM (SELECT doc_id, tk[1] AS w1, tk[2] AS w2 FROM toks
        |        WHERE $scored AND len(tk) >= 2) t
        |  LEFT JOIN big b USING (w1, w2)
        |  LEFT JOIN uni u1 ON t.w1 = u1.token
        |  LEFT JOIN uni u2 ON t.w2 = u2.token
        |  CROSS JOIN uv),
        |rest AS (
        |  SELECT p.doc_id,
        |    CASE WHEN tr.cnt3 IS NOT NULL
        |         THEN log10(CAST(tr.cnt3 AS DOUBLE) / b12.cnt2)
        |         WHEN b23.cnt2 IS NOT NULL
        |         THEN log10(0.4) + log10(CAST(b23.cnt2 AS DOUBLE) / u2.cnt)
        |         ELSE 2 * log10(0.4) + log10((coalesce(u3.cnt, 0) + 1) / uv.du)
        |    END AS logp
        |  FROM (SELECT doc_id, tk[i-2] AS w1, tk[i-1] AS w2, tk[i] AS w3 FROM (
        |          SELECT doc_id, tk, unnest(generate_series(3, len(tk))) AS i
        |          FROM toks WHERE $scored)) p
        |  LEFT JOIN tri tr USING (w1, w2, w3)
        |  LEFT JOIN big b12 ON p.w1 = b12.w1 AND p.w2 = b12.w2
        |  LEFT JOIN big b23 ON p.w2 = b23.w1 AND p.w3 = b23.w2
        |  LEFT JOIN uni u2 ON p.w2 = u2.token
        |  LEFT JOIN uni u3 ON p.w3 = u3.token
        |  CROSS JOIN uv),
        |allpos AS (SELECT * FROM first UNION ALL SELECT * FROM second
        |           UNION ALL SELECT * FROM rest)
        |SELECT doc_id, round(avg(logp), 6) AS lm3_logp,
        |  CAST(count(*) AS BIGINT) AS lm3_positions
        |FROM allpos GROUP BY doc_id""".stripMargin

  /** Shared by q93 (composable order-4 scoring) and q94 (native
    * fingerprinted/quantized registry): the trigram oracle one order
    * up, rounded at 5 decimals because q94's float32 tables carry
    * ~6e-7 absolute error. */
  private def quadgramOracleSql(scored: String): String =
    raw"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |uni AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(tk) AS token FROM toks WHERE doc_id < 100)
        |  GROUP BY token HAVING count(*) >= 2),
        |uv AS (SELECT CAST(coalesce(sum(cnt), 0) + count(*) + 1 AS DOUBLE) AS du
        |       FROM uni),
        |big AS (
        |  SELECT w1, w2, count(*) AS cnt2 FROM (
        |    SELECT tk[i-1] AS w1, tk[i] AS w2 FROM (
        |      SELECT tk, unnest(generate_series(2, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT w1, w2, w3, count(*) AS cnt3 FROM (
        |    SELECT tk[i-2] AS w1, tk[i-1] AS w2, tk[i] AS w3 FROM (
        |      SELECT tk, unnest(generate_series(3, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2, w3 HAVING count(*) >= 2),
        |quad AS (
        |  SELECT w1, w2, w3, w4, count(*) AS cnt4 FROM (
        |    SELECT tk[i-3] AS w1, tk[i-2] AS w2, tk[i-1] AS w3, tk[i] AS w4 FROM (
        |      SELECT tk, unnest(generate_series(4, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2, w3, w4 HAVING count(*) >= 2),
        |first AS (
        |  SELECT t.doc_id, log10((coalesce(u.cnt, 0) + 1) / uv.du) AS logp
        |  FROM (SELECT doc_id, tk[1] AS token FROM toks
        |        WHERE $scored AND len(tk) > 0) t
        |  LEFT JOIN uni u USING (token) CROSS JOIN uv),
        |second AS (
        |  SELECT t.doc_id,
        |    CASE WHEN b.cnt2 IS NOT NULL
        |         THEN log10(CAST(b.cnt2 AS DOUBLE) / u1.cnt)
        |         ELSE log10(0.4) + log10((coalesce(u2.cnt, 0) + 1) / uv.du)
        |    END AS logp
        |  FROM (SELECT doc_id, tk[1] AS w1, tk[2] AS w2 FROM toks
        |        WHERE $scored AND len(tk) >= 2) t
        |  LEFT JOIN big b USING (w1, w2)
        |  LEFT JOIN uni u1 ON t.w1 = u1.token
        |  LEFT JOIN uni u2 ON t.w2 = u2.token
        |  CROSS JOIN uv),
        |third AS (
        |  SELECT p.doc_id,
        |    CASE WHEN tr.cnt3 IS NOT NULL
        |         THEN log10(CAST(tr.cnt3 AS DOUBLE) / b12.cnt2)
        |         WHEN b23.cnt2 IS NOT NULL
        |         THEN log10(0.4) + log10(CAST(b23.cnt2 AS DOUBLE) / u2.cnt)
        |         ELSE 2 * log10(0.4) + log10((coalesce(u3.cnt, 0) + 1) / uv.du)
        |    END AS logp
        |  FROM (SELECT doc_id, tk[1] AS w1, tk[2] AS w2, tk[3] AS w3 FROM toks
        |        WHERE $scored AND len(tk) >= 3) p
        |  LEFT JOIN tri tr USING (w1, w2, w3)
        |  LEFT JOIN big b12 ON p.w1 = b12.w1 AND p.w2 = b12.w2
        |  LEFT JOIN big b23 ON p.w2 = b23.w1 AND p.w3 = b23.w2
        |  LEFT JOIN uni u2 ON p.w2 = u2.token
        |  LEFT JOIN uni u3 ON p.w3 = u3.token
        |  CROSS JOIN uv),
        |rest AS (
        |  SELECT p.doc_id,
        |    CASE WHEN q.cnt4 IS NOT NULL
        |         THEN log10(CAST(q.cnt4 AS DOUBLE) / t123.cnt3)
        |         WHEN t234.cnt3 IS NOT NULL
        |         THEN log10(0.4) + log10(CAST(t234.cnt3 AS DOUBLE) / b23.cnt2)
        |         WHEN b34.cnt2 IS NOT NULL
        |         THEN 2 * log10(0.4) + log10(CAST(b34.cnt2 AS DOUBLE) / u3.cnt)
        |         ELSE 3 * log10(0.4) + log10((coalesce(u4.cnt, 0) + 1) / uv.du)
        |    END AS logp
        |  FROM (SELECT doc_id, tk[i-3] AS w1, tk[i-2] AS w2, tk[i-1] AS w3,
        |               tk[i] AS w4 FROM (
        |          SELECT doc_id, tk, unnest(generate_series(4, len(tk))) AS i
        |          FROM toks WHERE $scored)) p
        |  LEFT JOIN quad q USING (w1, w2, w3, w4)
        |  LEFT JOIN tri t123 ON p.w1 = t123.w1 AND p.w2 = t123.w2 AND p.w3 = t123.w3
        |  LEFT JOIN tri t234 ON p.w2 = t234.w1 AND p.w3 = t234.w2 AND p.w4 = t234.w3
        |  LEFT JOIN big b23 ON p.w2 = b23.w1 AND p.w3 = b23.w2
        |  LEFT JOIN big b34 ON p.w3 = b34.w1 AND p.w4 = b34.w2
        |  LEFT JOIN uni u3 ON p.w3 = u3.token
        |  LEFT JOIN uni u4 ON p.w4 = u4.token
        |  CROSS JOIN uv),
        |allpos AS (SELECT * FROM first UNION ALL SELECT * FROM second
        |           UNION ALL SELECT * FROM third UNION ALL SELECT * FROM rest)
        |SELECT doc_id, round(avg(logp), 5) AS lmn_logp,
        |  CAST(count(*) AS BIGINT) AS lmn_positions
        |FROM allpos GROUP BY doc_id""".stripMargin

  /** Shared by q97 (composable interpolated KN) and q99 (native
    * registry over the saveBigram artifact): training and scoring
    * replayed from the unpruned count tables. */
  private def kneserNeyOracleSql(scored: String): String =
    raw"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |uni AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(tk) AS token FROM toks WHERE doc_id < 100)
        |  GROUP BY token),
        |big AS (
        |  SELECT w1, w2, count(*) AS cnt2 FROM (
        |    SELECT tk[i-1] AS w1, tk[i] AS w2 FROM (
        |      SELECT tk, unnest(generate_series(2, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2),
        |sc AS (
        |  SELECT CAST(bb.b + vv.v + 1 AS DOUBLE) AS dc,
        |    CASE WHEN bb.n1 = 0 THEN 0.5
        |         ELSE least(CAST(bb.n1 AS DOUBLE) / (bb.n1 + 2.0 * bb.n2), 1.0) END AS d
        |  FROM (SELECT count(*) AS b,
        |          coalesce(sum(CASE WHEN cnt2 = 1 THEN 1 ELSE 0 END), 0) AS n1,
        |          coalesce(sum(CASE WHEN cnt2 = 2 THEN 1 ELSE 0 END), 0) AS n2
        |        FROM big) bb,
        |       (SELECT count(*) AS v FROM uni) vv),
        |fwd AS (SELECT w1, sum(cnt2) AS ctx, count(*) AS nfwd FROM big GROUP BY w1),
        |bwd AS (SELECT w2, count(*) AS nbwd FROM big GROUP BY w2),
        |first AS (
        |  SELECT t.doc_id, log10((coalesce(b.nbwd, 0) + 1) / sc.dc) AS logp
        |  FROM (SELECT doc_id, tk[1] AS w2 FROM toks
        |        WHERE $scored AND len(tk) > 0) t
        |  LEFT JOIN bwd b USING (w2) CROSS JOIN sc),
        |pairs AS (
        |  SELECT p.doc_id,
        |    CASE WHEN f.ctx IS NOT NULL
        |      THEN log10((greatest(CAST(coalesce(bg.cnt2, 0) AS DOUBLE) - sc.d, 0.0) +
        |                  sc.d * CAST(f.nfwd AS DOUBLE) *
        |                    ((coalesce(b.nbwd, 0) + 1) / sc.dc))
        |                 / CAST(f.ctx AS DOUBLE))
        |      ELSE log10((coalesce(b.nbwd, 0) + 1) / sc.dc)
        |    END AS logp
        |  FROM (SELECT doc_id, tk[i-1] AS w1, tk[i] AS w2 FROM (
        |          SELECT doc_id, tk, unnest(generate_series(2, len(tk))) AS i
        |          FROM toks WHERE $scored)) p
        |  LEFT JOIN big bg USING (w1, w2)
        |  LEFT JOIN fwd f USING (w1)
        |  LEFT JOIN bwd b USING (w2)
        |  CROSS JOIN sc),
        |allpos AS (SELECT * FROM first UNION ALL SELECT * FROM pairs)
        |SELECT doc_id, round(avg(logp), 6) AS kn_logp,
        |  CAST(count(*) AS BIGINT) AS kn_positions
        |FROM allpos GROUP BY doc_id""".stripMargin

  /** Shared by q100 (composable KN3) and q101 (native registry):
    * identical recursion — trigram discounting over continuation-count
    * middle/bottom levels — so ONE oracle pins both at round(6). */
  private def kneserNey3OracleSql(scored: String): String =
    raw"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |uni AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(tk) AS token FROM toks WHERE doc_id < 100)
        |  GROUP BY token),
        |tri AS (
        |  SELECT w1, w2, w3, count(*) AS cnt3 FROM (
        |    SELECT tk[i-2] AS w1, tk[i-1] AS w2, tk[i] AS w3 FROM (
        |      SELECT tk, unnest(generate_series(3, len(tk))) AS i
        |      FROM toks WHERE doc_id < 100))
        |  GROUP BY w1, w2, w3),
        |cbg AS (SELECT w2, w3, count(*) AS ccnt FROM tri GROUP BY w2, w3),
        |sc AS (
        |  SELECT CAST(bb.b + vv.v + 1 AS DOUBLE) AS dc,
        |    CASE WHEN tt.n1 = 0 THEN 0.5
        |         ELSE least(CAST(tt.n1 AS DOUBLE) / (tt.n1 + 2.0 * tt.n2), 1.0) END AS d3,
        |    CASE WHEN bb.n1 = 0 THEN 0.5
        |         ELSE least(CAST(bb.n1 AS DOUBLE) / (bb.n1 + 2.0 * bb.n2), 1.0) END AS d2
        |  FROM (SELECT count(*) AS b,
        |          coalesce(sum(CASE WHEN ccnt = 1 THEN 1 ELSE 0 END), 0) AS n1,
        |          coalesce(sum(CASE WHEN ccnt = 2 THEN 1 ELSE 0 END), 0) AS n2
        |        FROM cbg) bb,
        |       (SELECT coalesce(sum(CASE WHEN cnt3 = 1 THEN 1 ELSE 0 END), 0) AS n1,
        |          coalesce(sum(CASE WHEN cnt3 = 2 THEN 1 ELSE 0 END), 0) AS n2
        |        FROM tri) tt,
        |       (SELECT count(*) AS v FROM uni) vv),
        |fwd3 AS (SELECT w1, w2, sum(cnt3) AS ctx3, count(*) AS nfwd3 FROM tri GROUP BY w1, w2),
        |fwd2 AS (SELECT w2, sum(ccnt) AS ctx2, count(*) AS nfwd2 FROM cbg GROUP BY w2),
        |bwd1 AS (SELECT w3, count(*) AS nbwd1 FROM cbg GROUP BY w3),
        |first AS (
        |  SELECT t.doc_id, log10((coalesce(b.nbwd1, 0) + 1) / sc.dc) AS logp
        |  FROM (SELECT doc_id, tk[1] AS w3 FROM toks
        |        WHERE $scored AND len(tk) > 0) t
        |  LEFT JOIN bwd1 b USING (w3) CROSS JOIN sc),
        |second AS (
        |  SELECT p.doc_id,
        |    CASE WHEN f2.ctx2 IS NOT NULL
        |      THEN log10((greatest(CAST(coalesce(cb.ccnt, 0) AS DOUBLE) - sc.d2, 0.0) +
        |                  sc.d2 * CAST(f2.nfwd2 AS DOUBLE) *
        |                    ((coalesce(b.nbwd1, 0) + 1) / sc.dc))
        |                 / CAST(f2.ctx2 AS DOUBLE))
        |      ELSE log10((coalesce(b.nbwd1, 0) + 1) / sc.dc)
        |    END AS logp
        |  FROM (SELECT doc_id, tk[1] AS w2, tk[2] AS w3 FROM toks
        |        WHERE $scored AND len(tk) >= 2) p
        |  LEFT JOIN cbg cb USING (w2, w3)
        |  LEFT JOIN fwd2 f2 USING (w2)
        |  LEFT JOIN bwd1 b USING (w3)
        |  CROSS JOIN sc),
        |tripos0 AS (
        |  SELECT p.doc_id, tg.cnt3, f3.ctx3, f3.nfwd3, sc.d3,
        |    CASE WHEN f2.ctx2 IS NOT NULL
        |      THEN (greatest(CAST(coalesce(cb.ccnt, 0) AS DOUBLE) - sc.d2, 0.0) +
        |            sc.d2 * CAST(f2.nfwd2 AS DOUBLE) *
        |              ((coalesce(b.nbwd1, 0) + 1) / sc.dc))
        |           / CAST(f2.ctx2 AS DOUBLE)
        |      ELSE (coalesce(b.nbwd1, 0) + 1) / sc.dc
        |    END AS p2
        |  FROM (SELECT doc_id, tk[i-2] AS w1, tk[i-1] AS w2, tk[i] AS w3 FROM (
        |          SELECT doc_id, tk, unnest(generate_series(3, len(tk))) AS i
        |          FROM toks WHERE $scored)) p
        |  LEFT JOIN tri tg USING (w1, w2, w3)
        |  LEFT JOIN fwd3 f3 USING (w1, w2)
        |  LEFT JOIN cbg cb USING (w2, w3)
        |  LEFT JOIN fwd2 f2 USING (w2)
        |  LEFT JOIN bwd1 b USING (w3)
        |  CROSS JOIN sc),
        |tripos AS (
        |  SELECT doc_id,
        |    CASE WHEN ctx3 IS NOT NULL
        |      THEN log10((greatest(CAST(coalesce(cnt3, 0) AS DOUBLE) - d3, 0.0) +
        |                  d3 * CAST(nfwd3 AS DOUBLE) * p2) / CAST(ctx3 AS DOUBLE))
        |      ELSE log10(p2)
        |    END AS logp
        |  FROM tripos0),
        |allpos AS (SELECT * FROM first UNION ALL SELECT * FROM second
        |           UNION ALL SELECT * FROM tripos)
        |SELECT doc_id, round(avg(logp), 6) AS kn3_logp,
        |  CAST(count(*) AS BIGINT) AS kn3_positions
        |FROM allpos GROUP BY doc_id""".stripMargin

  /** GENERATED interpolated-KN order-n oracle — the
    * kneserNey3OracleSql program produced programmatically for any
    * order: raw top-order counts, the continuation chain (`g{k}` =
    * distinct left extensions of `g{k+1}`), per-level count-of-counts
    * discounts, context sums/fan-outs, the Laplace-over-continuations
    * OOV floor, and one frame per starting order running the bottom-up
    * interpolation as nested CASE arithmetic. Generating the SQL from
    * the same index arithmetic the Scala scorer loops over means the
    * order-4 gate exercises the GENERIC recursion, not a hand-kept
    * transcription. Shared by q114 (composable) and q115 (native). */
  private def kneserNeyNOracleSql(n: Int, scored: String, decimals: Int = 6): String = {
    require(n >= 2, s"order must be >= 2, got $n")
    val sb = new StringBuilder
    sb ++= """WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |      t -> len(t) > 0) AS tk
             |  FROM documents),
             |""".stripMargin
    // raw top-order counts from the training slice
    val topCols = (1 to n).map(j => s"tk[i-${n - j}] AS w$j").mkString(", ")
    sb ++= s"""g$n AS (
              |  SELECT ${(1 to n).map("w" + _).mkString(", ")}, count(*) AS cnt$n FROM (
              |    SELECT $topCols FROM (
              |      SELECT tk, unnest(generate_series($n, len(tk))) AS i
              |      FROM toks WHERE doc_id < 100))
              |  GROUP BY ${(1 to n).map("w" + _).mkString(", ")}),
              |""".stripMargin
    // continuation chain: distinct left extensions, renamed down
    for (k <- n - 1 to 2 by -1)
      sb ++= s"""g$k AS (SELECT ${(2 to k + 1).map(j => s"w$j AS w${j - 1}").mkString(", ")},
                |  count(*) AS cnt$k FROM g${k + 1}
                |  GROUP BY ${(2 to k + 1).map("w" + _).mkString(", ")}),
                |""".stripMargin
    // scalars: the continuation-unigram denominator and one
    // count-of-counts discount per level (same clamped arithmetic as
    // LangModel.trainKneserNeyN)
    val dExprs = (2 to n).map { k =>
      s"""CASE WHEN s$k.n1 = 0 THEN 0.5
         |      ELSE least(CAST(s$k.n1 AS DOUBLE) / (s$k.n1 + 2.0 * s$k.n2), 1.0) END AS d$k""".stripMargin
    }.mkString(",\n    ")
    val dFroms = (2 to n).map { k =>
      s"""(SELECT coalesce(sum(CASE WHEN cnt$k = 1 THEN 1 ELSE 0 END), 0) AS n1,
         |     coalesce(sum(CASE WHEN cnt$k = 2 THEN 1 ELSE 0 END), 0) AS n2
         |   FROM g$k) s$k""".stripMargin
    }.mkString(",\n  ")
    sb ++= s"""sc AS (
              |  SELECT CAST(bb.b + vv.v + 1 AS DOUBLE) AS dc,
              |    $dExprs
              |  FROM (SELECT count(*) AS b FROM g2) bb,
              |  (SELECT count(DISTINCT token) AS v FROM
              |    (SELECT unnest(tk) AS token FROM toks WHERE doc_id < 100)) vv,
              |  $dFroms),
              |""".stripMargin
    // per-level context sums/fan-outs and the bottom fan-in
    for (k <- 2 to n)
      sb ++= s"""fwd$k AS (SELECT ${(1 until k).map("w" + _).mkString(", ")},
                |  sum(cnt$k) AS ctx$k, count(*) AS nfwd$k FROM g$k
                |  GROUP BY ${(1 until k).map("w" + _).mkString(", ")}),
                |""".stripMargin
    sb ++= "bwd1 AS (SELECT w2, count(*) AS nbwd1 FROM g2 GROUP BY w2),\n"
    // the bottom-up interpolation as a nested CASE over joined columns
    def pExpr(j: Int): String =
      if (j == 1) "((coalesce(b.nbwd1, 0) + 1) / sc.dc)"
      else
        s"""(CASE WHEN f$j.ctx$j IS NOT NULL
           | THEN (greatest(CAST(coalesce(c$j.cnt$j, 0) AS DOUBLE) - sc.d$j, 0.0) +
           |       sc.d$j * CAST(f$j.nfwd$j AS DOUBLE) * ${pExpr(j - 1)})
           |      / CAST(f$j.ctx$j AS DOUBLE)
           | ELSE ${pExpr(j - 1)} END)""".stripMargin
    // one frame per starting order: m < n scores position m-1 from the
    // doc's first m tokens; m = n scores every sliding n-gram
    for (m <- 1 to n) {
      val src =
        if (m < n)
          s"""(SELECT doc_id, ${(1 to m).map(j => s"tk[$j] AS t$j").mkString(", ")}
             |   FROM toks WHERE $scored AND len(tk) >= $m) f""".stripMargin
        else
          s"""(SELECT doc_id, ${(1 to n).map(j => s"tk[i-${n - j}] AS t$j").mkString(", ")}
             |   FROM (SELECT doc_id, tk, unnest(generate_series($n, len(tk))) AS i
             |         FROM toks WHERE $scored)) f""".stripMargin
      val joins = (2 to m).map { j =>
        s"""LEFT JOIN g$j c$j ON ${(1 to j).map(x => s"c$j.w$x = f.t${m - j + x}").mkString(" AND ")}
           |LEFT JOIN fwd$j f$j ON ${(1 until j).map(x => s"f$j.w$x = f.t${m - j + x}").mkString(" AND ")}""".stripMargin
      }.mkString("\n")
      sb ++= s"""fr$m AS (
                |  SELECT f.doc_id, log10(${pExpr(m)}) AS logp
                |  FROM $src
                |$joins
                |LEFT JOIN bwd1 b ON b.w2 = f.t$m
                |CROSS JOIN sc),
                |""".stripMargin
    }
    sb ++= s"""allpos AS (${(1 to n).map(m => s"SELECT * FROM fr$m").mkString(" UNION ALL ")})
              |SELECT doc_id, round(avg(logp), $decimals) AS knn_logp,
              |  CAST(count(*) AS BIGINT) AS knn_positions
              |FROM allpos GROUP BY doc_id""".stripMargin
    sb.toString
  }

  /** GENERATED MODIFIED-KN order-n oracle — [[kneserNeyNOracleSql]]
    * with the three-discount derivation: per level, count-of-counts
    * n1..n4 feed the Chen–Goodman triple (`Y = n1/(n1+2n2)`,
    * `D1 = 1−2Y·n2/n1` capped at 1, `D2 = 2−3Y·n3/n2` at 2,
    * `D3 = 3−4Y·n4/n3` at 3; nk = 0 or a non-positive estimate → the
    * strictly-positive range midpoint);
    * per context the interpolation weight is the EXACT discounted mass
    * `D1·N1 + D2·N2 + D3·N3+`; per gram the numerator selects the
    * discount by count bucket. Shared by q117 (composable), q118
    * (native registry), q119 (packed registry). */
  private def kneserNeyNModOracleSql(n: Int, scored: String, decimals: Int = 6,
      buckets: Boolean = false): String = {
    require(n >= 2, s"order must be >= 2, got $n")
    val sb = new StringBuilder
    sb ++= """WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |      t -> len(t) > 0) AS tk
             |  FROM documents),
             |""".stripMargin
    val topCols = (1 to n).map(j => s"tk[i-${n - j}] AS w$j").mkString(", ")
    sb ++= s"""g$n AS (
              |  SELECT ${(1 to n).map("w" + _).mkString(", ")}, count(*) AS cnt$n FROM (
              |    SELECT $topCols FROM (
              |      SELECT tk, unnest(generate_series($n, len(tk))) AS i
              |      FROM toks WHERE doc_id < 100))
              |  GROUP BY ${(1 to n).map("w" + _).mkString(", ")}),
              |""".stripMargin
    for (k <- n - 1 to 2 by -1)
      sb ++= s"""g$k AS (SELECT ${(2 to k + 1).map(j => s"w$j AS w${j - 1}").mkString(", ")},
                |  count(*) AS cnt$k FROM g${k + 1}
                |  GROUP BY ${(2 to k + 1).map("w" + _).mkString(", ")}),
                |""".stripMargin
    // per-level Chen–Goodman triples from n1..n4, with the strictly-
    // positive fallback rule (nk = 0 OR a non-positive estimate → the
    // range midpoint) — zero-mass contexts would zero out unseen
    // continuations, which the implementations forbid
    val dExprs = (2 to n).map { k =>
      val y = s"(CASE WHEN s$k.n1 = 0 THEN 0.5 ELSE CAST(s$k.n1 AS DOUBLE) / (s$k.n1 + 2.0 * s$k.n2) END)"
      val e1 = s"(1.0 - 2.0 * $y * s$k.n2 / s$k.n1)"
      val e2 = s"(2.0 - 3.0 * $y * s$k.n3 / s$k.n2)"
      val e3 = s"(3.0 - 4.0 * $y * s$k.n4 / s$k.n3)"
      s"""CASE WHEN s$k.n1 = 0 OR $e1 <= 0 THEN 0.5 ELSE least($e1, 1.0) END AS d1_$k,
         |    CASE WHEN s$k.n2 = 0 OR $e2 <= 0 THEN 1.0 ELSE least($e2, 2.0) END AS d2_$k,
         |    CASE WHEN s$k.n3 = 0 OR $e3 <= 0 THEN 1.5 ELSE least($e3, 3.0) END AS d3_$k""".stripMargin
    }.mkString(",\n    ")
    val dFroms = (2 to n).map { k =>
      s"""(SELECT coalesce(sum(CASE WHEN cnt$k = 1 THEN 1 ELSE 0 END), 0) AS n1,
         |     coalesce(sum(CASE WHEN cnt$k = 2 THEN 1 ELSE 0 END), 0) AS n2,
         |     coalesce(sum(CASE WHEN cnt$k = 3 THEN 1 ELSE 0 END), 0) AS n3,
         |     coalesce(sum(CASE WHEN cnt$k = 4 THEN 1 ELSE 0 END), 0) AS n4
         |   FROM g$k) s$k""".stripMargin
    }.mkString(",\n  ")
    sb ++= s"""sc AS (
              |  SELECT CAST(bb.b + vv.v + 1 AS DOUBLE) AS dc,
              |    $dExprs
              |  FROM (SELECT count(*) AS b FROM g2) bb,
              |  (SELECT count(DISTINCT token) AS v FROM
              |    (SELECT unnest(tk) AS token FROM toks WHERE doc_id < 100)) vv,
              |  $dFroms),
              |""".stripMargin
    // per-level context sums + count-bucketed fan-outs (the discount
    // mass assembles in the frame, where sc's d's are in scope)
    for (k <- 2 to n)
      sb ++= s"""fwd$k AS (SELECT ${(1 until k).map("w" + _).mkString(", ")},
                |  sum(cnt$k) AS ctx$k,
                |  sum(CASE WHEN cnt$k = 1 THEN 1 ELSE 0 END) AS nf1_$k,
                |  sum(CASE WHEN cnt$k = 2 THEN 1 ELSE 0 END) AS nf2_$k,
                |  sum(CASE WHEN cnt$k >= 3 THEN 1 ELSE 0 END) AS nf3_$k FROM g$k
                |  GROUP BY ${(1 until k).map("w" + _).mkString(", ")}),
                |""".stripMargin
    sb ++= "bwd1 AS (SELECT w2, count(*) AS nbwd1 FROM g2 GROUP BY w2),\n"
    def pExpr(j: Int): String =
      if (j == 1) "((coalesce(b.nbwd1, 0) + 1) / sc.dc)"
      else
        s"""(CASE WHEN f$j.ctx$j IS NOT NULL
           | THEN ((CASE WHEN c$j.cnt$j IS NULL THEN 0.0
           |        ELSE CAST(c$j.cnt$j AS DOUBLE) -
           |          (CASE WHEN c$j.cnt$j = 1 THEN sc.d1_$j
           |                WHEN c$j.cnt$j = 2 THEN sc.d2_$j
           |                ELSE sc.d3_$j END) END) +
           |       (sc.d1_$j * f$j.nf1_$j + sc.d2_$j * f$j.nf2_$j +
           |        sc.d3_$j * f$j.nf3_$j) * ${pExpr(j - 1)})
           |      / CAST(f$j.ctx$j AS DOUBLE)
           | ELSE ${pExpr(j - 1)} END)""".stripMargin
    for (m <- 1 to n) {
      val src =
        if (m < n)
          s"""(SELECT doc_id, ${(1 to m).map(j => s"tk[$j] AS t$j").mkString(", ")}
             |   FROM toks WHERE $scored AND len(tk) >= $m) f""".stripMargin
        else
          s"""(SELECT doc_id, ${(1 to n).map(j => s"tk[i-${n - j}] AS t$j").mkString(", ")}
             |   FROM (SELECT doc_id, tk, unnest(generate_series($n, len(tk))) AS i
             |         FROM toks WHERE $scored)) f""".stripMargin
      val joins = (2 to m).map { j =>
        s"""LEFT JOIN g$j c$j ON ${(1 to j).map(x => s"c$j.w$x = f.t${m - j + x}").mkString(" AND ")}
           |LEFT JOIN fwd$j f$j ON ${(1 until j).map(x => s"f$j.w$x = f.t${m - j + x}").mkString(" AND ")}""".stripMargin
      }.mkString("\n")
      sb ++= s"""fr$m AS (
                |  SELECT f.doc_id, log10(${pExpr(m)}) AS logp
                |  FROM $src
                |$joins
                |LEFT JOIN bwd1 b ON b.w2 = f.t$m
                |CROSS JOIN sc),
                |""".stripMargin
    }
    if (!buckets)
      sb ++= s"""allpos AS (${(1 to n).map(m => s"SELECT * FROM fr$m").mkString(" UNION ALL ")})
                |SELECT doc_id, round(avg(logp), $decimals) AS mkn_logp,
                |  CAST(count(*) AS BIGINT) AS mkn_positions
                |FROM allpos GROUP BY doc_id""".stripMargin
    else
      // the CCNet production configuration: per-source head/middle/tail
      // thirds by the MODIFIED-KN score — the q98 percent_rank replay
      // over the mod chain's per-doc scores (rounded BEFORE ranking so
      // cross-engine libm noise cannot flip a tie)
      sb ++= s"""allpos AS (${(1 to n).map(m => s"SELECT * FROM fr$m").mkString(" UNION ALL ")}),
                |perdoc AS (SELECT doc_id, round(avg(logp), $decimals) AS mkn_logp
                |  FROM allpos GROUP BY doc_id),
                |scoredb AS (
                |  SELECT p.doc_id, d.source, p.mkn_logp,
                |    percent_rank() OVER (PARTITION BY d.source ORDER BY p.mkn_logp DESC) AS pr
                |  FROM perdoc p JOIN documents d USING (doc_id))
                |SELECT doc_id, source, mkn_logp,
                |  CASE WHEN pr < 1.0/3 THEN 'head'
                |       WHEN pr < 1.0/3 + 1.0/3 THEN 'middle'
                |       ELSE 'tail' END AS ppl_bucket
                |FROM scoredb""".stripMargin
    sb.toString
  }

  private val LmOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0)) AS token
      |  FROM documents),
      |vocab AS (
      |  SELECT token, count(*) AS cnt FROM toks WHERE doc_id < 100
      |  GROUP BY token HAVING count(*) >= 2),
      |c AS (SELECT CAST(coalesce(sum(cnt), 0) + count(*) + 1 AS DOUBLE) AS d
      |      FROM vocab),
      |scored AS (
      |  SELECT t.doc_id, log10(CAST(coalesce(v.cnt, 0) + 1 AS DOUBLE) / c.d) AS logp
      |  FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN c
      |  WHERE t.doc_id >= 100)
      |SELECT doc_id, round(avg(logp), 6) AS lm_logp,
      |  CAST(count(*) AS BIGINT) AS lm_tokens
      |FROM scored GROUP BY doc_id""".stripMargin

  /** Shared by q64 (HOF repetition score) and q65 (native expression):
    * identical program, one oracle pins both hash-exactly. */
  private val RepetitionOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS ts
      |  FROM documents WHERE doc_id < 1500),
      |g AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(range(0, greatest(len(ts) - 3, 0) + 1),
      |      i -> array_to_string(ts[i+1:i+3], ' ')), s -> len(s) > 0) AS grams,
      |    greatest(len(ts) - 2, 0) AS total
      |  FROM toks)
      |SELECT doc_id,
      |  round(CASE WHEN total <= 0 THEN 0.0
      |             ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / total END, 6) AS rep3
      |FROM g""".stripMargin

  /** Shared by q26 (HOF chunker) and q41 (native expression): both
    * implement the identical window program, so one oracle pins both. */
  private val ChunkingOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS ts
      |  FROM documents),
      |sized AS (
      |  SELECT doc_id, ts,
      |    CASE WHEN len(ts) = 0 THEN 0
      |         ELSE CAST(ceil(greatest(len(ts) - 32, 0) / 24.0) AS INT) + 1 END AS n
      |  FROM toks)
      |SELECT s.doc_id,
      |  CAST(u.i AS BIGINT) AS chunk_id,
      |  array_to_string(s.ts[u.i*24 + 1 : u.i*24 + 32], ' ') AS chunk_text,
      |  CAST(len(s.ts[u.i*24 + 1 : u.i*24 + 32]) AS BIGINT) AS chunk_tokens
      |FROM sized s, LATERAL (SELECT unnest(range(s.n)) AS i) u""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // ---- media near-dup pairing replays (the r13 dump-and-replay
    // conversions): each gate dumps its deterministic fingerprint
    // table under __AUX__ (substituted by Verify to auxRoot(sfDir));
    // DuckDB brute-forces the identical pairing decision over it —
    // all-pairs is fine at oracle scale, and equality proves the
    // banded engine equals all-pairs-within-radius.
    "q129_image_neardup" -> scalarSigPairOracleSql("q129_sigs", 3, "planted_cross_codec"),
    "q130_audio_neardup" -> scalarSigPairOracleSql("q130_sigs", 3, "planted_half_volume"),
    "q144_image_blur_neardup" -> scalarSigPairOracleSql("q144_sigs", 7, "planted_degraded"),
    "q147_image_wide_neardup" -> wideSigPairOracleSql("q147_sigs", 15, "planted_degraded"),
    // q148: row-level brute force over the two dumped wide sig tables —
    // the incremental banding must emit exactly the ground-truth pairs
    "q148_wide_incremental_neardup" ->
      s"""WITH c AS (SELECT id, s0, s1, s2, s3
        |  FROM read_parquet('__AUX__/q148_corpus_sigs/*.parquet')),
        |b AS (SELECT id, s0, s1, s2, s3
        |  FROM read_parquet('__AUX__/q148_batch_sigs/*.parquet'))
        |SELECT * FROM (
        |  SELECT b.id AS batch_id, c.id AS corpus_id,
        |    ${wideHammingSql("b", "c")} AS hamming
        |  FROM b, c)
        |WHERE hamming <= 15""".stripMargin,
    // frame-ALIGNED video pairing: per-frame Hamming join + the
    // min-frames gate, replayed over the dumped (id, frame_idx, sig)
    "q131_video_neardup" ->
      """WITH s AS (SELECT id, frame_idx, sig
        |  FROM read_parquet('__AUX__/q131_sigs/*.parquet')),
        |m AS (
        |  SELECT a.id AS id1, b.id AS id2,
        |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |  FROM s a JOIN s b ON a.frame_idx = b.frame_idx AND a.id < b.id
        |  WHERE bit_count(xor(a.sig, b.sig)) <= 5),
        |p AS (
        |  SELECT id1, id2, count(*)::BIGINT AS n_frames_matched,
        |    max(hamming) AS max_hamming
        |  FROM m GROUP BY id1, id2
        |  HAVING count(*) >= 3)
        |SELECT
        |  CASE WHEN id2 - id1 = 100000 THEN 'planted_cross_codec'
        |       ELSE 'other' END AS pair_type,
        |  count(*)::BIGINT AS n_pairs,
        |  min(n_frames_matched) AS min_frames_matched,
        |  max(max_hamming) AS max_hamming
        |FROM p GROUP BY 1""".stripMargin,
    // OFFSET-CONSISTENT (delta-grouped) pairing replays: audio windows
    // and shifted video frames through the identical seqSigNearDups
    // arithmetic — match counting happens PER DELTA, a pair passes
    // when any single delta accumulates enough window/frame matches
    "q133_audio_trim_neardup" ->
      seqSigPairOracleSql("q133_sigs", "window_idx", 3, 2,
        "planted_trimmed", "min_windows_matched"),
    "q134_video_shift_neardup" ->
      seqSigPairOracleSql("q134_sigs", "frame_idx", 5, 3,
        "planted_shifted", "min_frames_matched"),
    // SLOT-ALIGNED crop-hypothesis replay: the crop side's tiles 0-4
    // against the original side's tiles 5-9, slot for slot
    "q135_image_crop_neardup" ->
      """WITH tl AS (SELECT id, tile_idx, sig
        |  FROM read_parquet('__AUX__/q135_tiles/*.parquet')),
        |m AS (
        |  SELECT o.id AS orig_id, c.id AS crop_id,
        |    CAST(bit_count(xor(o.sig, c.sig)) AS INTEGER) AS hamming
        |  FROM tl o JOIN tl c
        |    ON o.tile_idx - 5 = c.tile_idx AND o.id <> c.id
        |  WHERE o.tile_idx >= 5 AND c.tile_idx <= 4
        |    AND bit_count(xor(o.sig, c.sig)) <= 3),
        |p AS (
        |  SELECT orig_id, crop_id, count(*)::BIGINT AS n_slots_matched,
        |    max(hamming) AS max_hamming
        |  FROM m GROUP BY orig_id, crop_id
        |  HAVING count(*) >= 4)
        |SELECT
        |  CASE WHEN crop_id - orig_id = 100000 THEN 'planted_center_crop'
        |       ELSE 'other' END AS pair_type,
        |  count(*)::BIGINT AS n_pairs,
        |  min(n_slots_matched) AS min_slots_matched,
        |  max(max_hamming) AS max_hamming
        |FROM p GROUP BY 1""".stripMargin,
    // ---- vector-family replays (r13): exact-cosine pairing, the
    // two-tier incremental drop, the semantic-dedup closure, and the
    // recall arithmetic — all over dumped deterministic tables
    // q39's pair set is MLlib-LSH-emitted (recall is probabilistic, the
    // planted floor lives in EntrySpec); the oracle re-derives exact
    // cosine per emitted pair and RE-APPLIES the threshold, so any
    // false-positive pair or summary-arithmetic drift goes red
    "q39_vector_near_dup" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM read_parquet('__AUX__/q39_vecs/*.parquet')),
        |c AS (SELECT id1, id2 FROM read_parquet('__AUX__/q39_pairs/*.parquet')),
        |p AS (
        |  SELECT c.id1, c.id2,
        |    list_dot_product(a.e, b.e) /
        |      (sqrt(list_dot_product(a.e, a.e)) *
        |       sqrt(list_dot_product(b.e, b.e))) AS cos_sim
        |  FROM c JOIN v a ON a.vec_id = c.id1 JOIN v b ON b.vec_id = c.id2)
        |SELECT
        |  CASE WHEN id2 - id1 = 100000 THEN 'planted' ELSE 'other' END AS pair_type,
        |  count(*)::BIGINT AS n_pairs,
        |  round(min(cos_sim), 4) AS min_cos,
        |  round(avg(cos_sim), 4) AS avg_cos
        |FROM p WHERE cos_sim >= 0.95 GROUP BY 1""".stripMargin,
    "q42_srp_near_dup" -> vecPairOracleSql("q42_vecs", 0.999),
    "q25_ivf_recall" ->
      s"""WITH ${probeRecallOracleCtes("q25_brute", "q25_probe")}
         |SELECT query_id, n_true, n_hits, recall FROM r""".stripMargin,
    "q103_pq_recall" ->
      s"""WITH ${probeRecallOracleCtes("q103_brute", "q103_probe")}
         |SELECT count(*)::BIGINT AS n_queries,
         |  round(avg(recall), 4) AS avg_recall,
         |  round(min(recall), 4) AS min_recall,
         |  (SELECT (len(embedding) * 4)::INT FROM embeddings LIMIT 1)
         |    AS bytes_per_vec_raw,
         |  8 AS bytes_per_vec_pq
         |FROM r""".stripMargin,
    "q53_quantized_recall" ->
      s"""WITH ${probeRecallOracleCtes("q53_exact", "q53_quant")},
         |agg AS (
         |  SELECT count(*)::BIGINT AS n_queries,
         |    round(avg(recall), 4) AS avg_recall,
         |    round(min(recall), 4) AS min_recall
         |  FROM r),
         |d AS (SELECT vec_id, embedding::DOUBLE[] AS de
         |  FROM read_parquet('__AUX__/q53_deq/*.parquet')),
         |f AS (
         |  SELECT round(min(
         |    list_dot_product(e.embedding::DOUBLE[], d.de) /
         |      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
         |       sqrt(list_dot_product(d.de, d.de)))), 6) AS min_self_cos
         |  FROM embeddings e JOIN d USING (vec_id))
         |SELECT agg.n_queries, agg.avg_recall, agg.min_recall, f.min_self_cos
         |FROM agg, f""".stripMargin,
    // the two-tier incremental vector drop: signature-only corpus tier
    // at the derived Hamming budget, then the cosine-verified in-batch
    // tier (drop the higher id per verified pair)
    "q62_incremental_vector_dedup" ->
      s"""WITH cs AS (SELECT id, sig
         |  FROM read_parquet('__AUX__/q62_corpus_sigs/*.parquet')),
         |bs AS (SELECT id, sig
         |  FROM read_parquet('__AUX__/q62_batch_sigs/*.parquet')),
         |bv AS (SELECT vec_id, embedding::DOUBLE[] AS e
         |  FROM read_parquet('__AUX__/q62_batch_vecs/*.parquet')),
         |seen AS (SELECT DISTINCT b.id FROM bs b
         |  JOIN cs c ON bit_count(xor(b.sig, c.sig)) <= $q62MaxHamming),
         |fsig AS (SELECT * FROM bs WHERE id NOT IN (SELECT id FROM seen)),
         |drops AS (
         |  SELECT DISTINCT a2.id
         |  FROM fsig a1 JOIN fsig a2 ON a1.id < a2.id
         |    AND bit_count(xor(a1.sig, a2.sig)) <= $q62MaxHamming
         |  JOIN bv v1 ON v1.vec_id = a1.id
         |  JOIN bv v2 ON v2.vec_id = a2.id
         |  WHERE list_dot_product(v1.e, v2.e) /
         |    (sqrt(list_dot_product(v1.e, v1.e)) *
         |     sqrt(list_dot_product(v2.e, v2.e))) >= 0.99),
         |surv AS (SELECT id FROM fsig WHERE id NOT IN (SELECT id FROM drops))
         |SELECT CASE WHEN id >= 30000 THEN 'echo' ELSE 'fresh' END AS cohort,
         |  count(*)::BIGINT AS n_survivors
         |FROM surv GROUP BY 1""".stripMargin,
    // the semantic-dedup survivor accounting: global min-label closure
    // of the cos >= 0.99 graph, one survivor per component, counted
    // per class (members never span classes)
    "q73_semdedup" ->
      """WITH RECURSIVE
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM read_parquet('__AUX__/q73_vecs/*.parquet')),
        |pr AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.e, b.e) /
        |    (sqrt(list_dot_product(a.e, a.e)) *
        |     sqrt(list_dot_product(b.e, b.e))) >= 0.99),
        |e AS (SELECT id1 AS a, id2 AS b FROM pr UNION SELECT id2, id1 FROM pr),
        |reach(id, r) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT re.id, e.b FROM reach re JOIN e ON re.r = e.a),
        |lab AS (
        |  SELECT v.vec_id,
        |    least(v.vec_id, coalesce(min(re.r), v.vec_id)) AS label
        |  FROM v LEFT JOIN reach re ON re.id = v.vec_id
        |  GROUP BY v.vec_id)
        |SELECT
        |  CASE WHEN vec_id < 30 OR vec_id >= 100000 THEN 'triple'
        |       ELSE 'untouched' END AS vec_class,
        |  count(DISTINCT label)::BIGINT AS n_survivors
        |FROM lab GROUP BY 1""".stripMargin,
    // TRANSITIVE-DEDUP drop replay: both drop disciplines over the
    // dumped verified pair graph — pair mode drops every distinct
    // higher id, transitive mode drops every node that is not its
    // component's minimum (WITH RECURSIVE min-label closure; the
    // planted chains keep components tiny, so the closure is bounded)
    "q38_transitive_dedup" ->
      """WITH RECURSIVE
        |pr AS (SELECT id1, id2 FROM read_parquet('__AUX__/q38_pairs/*.parquet')),
        |n AS (SELECT doc_id FROM read_parquet('__AUX__/q38_nodes/*.parquet')),
        |e AS (SELECT id1 AS a, id2 AS b FROM pr UNION SELECT id2, id1 FROM pr),
        |reach(id, r) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT re.id, e.b FROM reach re JOIN e ON re.r = e.a),
        |lab AS (
        |  SELECT n.doc_id,
        |    least(n.doc_id, coalesce(min(re.r), n.doc_id)) AS label
        |  FROM n LEFT JOIN reach re ON re.id = n.doc_id
        |  GROUP BY n.doc_id),
        |drp AS (SELECT DISTINCT id2 AS doc_id FROM pr),
        |modes AS (
        |  SELECT 'pair_drop' AS mode, n.doc_id,
        |    CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END AS surv
        |  FROM n LEFT JOIN drp d USING (doc_id)
        |  UNION ALL
        |  SELECT 'transitive', lab.doc_id,
        |    CASE WHEN lab.doc_id = lab.label THEN 1 ELSE 0 END
        |  FROM lab)
        |SELECT mode,
        |  sum(surv)::BIGINT AS n_survivors,
        |  sum(CASE WHEN doc_id >= 10000 AND doc_id < 20000
        |      THEN surv ELSE 0 END)::BIGINT AS n_endpoint_survivors,
        |  sum(CASE WHEN doc_id >= 20000
        |      THEN surv ELSE 0 END)::BIGINT AS n_hub_survivors
        |FROM modes GROUP BY mode""".stripMargin,
    // INCREMENTAL-TEXT-DEDUP drop replay (the q62 idiom): all three
    // tiers over the dumped hash/signature state. The near tiers
    // replay as all-pairs Hamming — pigeonhole-identical to the banded
    // join (maxHamming 3 < bands 4) with empty hot sets at this scale
    "q40_incremental_dedup" ->
      """WITH b AS (SELECT doc_id, content_hash, sig
        |  FROM read_parquet('__AUX__/q40_batch/*.parquet')),
        |seen AS (SELECT content_hash
        |  FROM read_parquet('__AUX__/q40_seen/*.parquet')),
        |cs AS (SELECT id, sig
        |  FROM read_parquet('__AUX__/q40_corpus_sigs/*.parquet')),
        |ex AS (
        |  SELECT doc_id, sig FROM (
        |    SELECT doc_id, sig, content_hash,
        |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        |    FROM b) t
        |  WHERE rn = 1
        |    -- NOT EXISTS, not NOT IN: a NULL hash in seen (a null-text
        |    -- corpus row) must not vacate the tier — Spark's left_anti
        |    -- keeps null-keyed batch rows, and so does this
        |    AND NOT EXISTS (SELECT 1 FROM seen s
        |      WHERE s.content_hash = t.content_hash)),
        |nearb AS (
        |  SELECT DISTINCT a2.doc_id
        |  FROM ex a1 JOIN ex a2 ON a1.doc_id < a2.doc_id
        |  WHERE bit_count(xor(a1.sig, a2.sig)) <= 3),
        |nearc AS (
        |  SELECT DISTINCT e.doc_id
        |  FROM ex e JOIN cs c ON bit_count(xor(e.sig, c.sig)) <= 3),
        |surv AS (
        |  SELECT doc_id FROM ex
        |  WHERE doc_id NOT IN (SELECT doc_id FROM nearb)
        |    AND doc_id NOT IN (SELECT doc_id FROM nearc))
        |SELECT
        |  CASE WHEN doc_id >= 40000 THEN 'near_echo'
        |       WHEN doc_id >= 30000 THEN 'exact_echo'
        |       ELSE 'fresh' END AS cohort,
        |  count(*)::BIGINT AS n_survivors
        |FROM surv GROUP BY 1""".stripMargin,
    // GREEDY SUBWORD-BUDGET PACKING replay: walk each doc's whitespace
    // tokens in order via a recursive CTE — same chunk while the
    // accumulated count stays within the budget, cut before the token
    // that would exceed it, a lone over-budget token keeps its own
    // chunk (the first token of a chunk is always taken)
    "q60_bpe_chunking" ->
      """WITH RECURSIVE
        |tk AS (SELECT doc_id, idx, n_bpe
        |  FROM read_parquet('__AUX__/q60_tokens/*.parquet')),
        |walk(doc_id, idx, chunk_id, acc) AS (
        |  SELECT doc_id, idx, 0::BIGINT, n_bpe::BIGINT FROM tk WHERE idx = 0
        |  UNION ALL
        |  SELECT t.doc_id, t.idx,
        |    CASE WHEN w.acc + t.n_bpe <= 128 THEN w.chunk_id
        |         ELSE w.chunk_id + 1 END,
        |    CASE WHEN w.acc + t.n_bpe <= 128 THEN w.acc + t.n_bpe
        |         ELSE t.n_bpe::BIGINT END
        |  FROM walk w JOIN tk t ON t.doc_id = w.doc_id AND t.idx = w.idx + 1)
        |SELECT w.doc_id, w.chunk_id,
        |  count(*)::BIGINT AS chunk_tokens,
        |  sum(t.n_bpe)::BIGINT AS chunk_bpe_tokens
        |FROM walk w JOIN tk t USING (doc_id, idx)
        |GROUP BY w.doc_id, w.chunk_id""".stripMargin,
    // DEFLATE-FLOOR gating replay over the dumped per-doc ratios (the
    // Deflater pass is the rows-only step, like the media decodes)
    "q126_deflate_ratio" ->
      """SELECT is_template,
        |  count(*)::BIGINT AS n_docs,
        |  count(CASE WHEN ratio < 0.25 THEN 1 END)::BIGINT AS n_below_floor,
        |  round(avg(ratio), 2) AS avg_ratio
        |FROM read_parquet('__AUX__/q126_ratios/*.parquet')
        |GROUP BY is_template""".stripMargin,
    // CLUSTER-QUOTA selection replay over the dumped cluster-tagged
    // docs: the ENTIRE selection — salted md5 digest, per-cluster
    // (digest, id) rank, quota cut — re-derived with no pre-thin,
    // which pins proportionSamplesByDigest's exactness claim
    // cross-engine; only the seeded KMeans fit stays rows-only
    "q132_cluster_balanced_sample" ->
      """WITH wc AS (SELECT doc_id, cluster
        |  FROM read_parquet('__AUX__/q132_cells/*.parquet')),
        |ranked AS (
        |  SELECT cluster, doc_id,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY md5(doc_id::VARCHAR || '|' || 'clusterbal'), doc_id) AS rn
        |  FROM wc),
        |per AS (
        |  SELECT cluster, count(*) AS n_kept
        |  FROM ranked WHERE rn <= 20 GROUP BY cluster)
        |SELECT count(*)::BIGINT AS n_clusters,
        |  sum(n_kept)::BIGINT AS n_docs_kept,
        |  min(n_kept)::BIGINT AS min_per_cluster,
        |  max(n_kept)::BIGINT AS max_per_cluster
        |FROM per""".stripMargin,
    // MEDIA DATA-CARD arithmetic replay over the dumped per-asset
    // decode frame: status cohorts, byte extrema over healthy assets
    // only, fingerprint-group stats (the decode stays rows-only)
    "q136_media_report" ->
      """WITH pa AS (SELECT *
        |  FROM read_parquet('__AUX__/q136_assets/*.parquet')),
        |base AS (SELECT
        |  count(*)::BIGINT AS n_assets,
        |  sum(CASE WHEN status = 1 THEN 1 ELSE 0 END)::BIGINT AS n_null_content,
        |  sum(CASE WHEN status = 2 THEN 1 ELSE 0 END)::BIGINT AS n_decode_failed,
        |  sum(bytes)::BIGINT AS total_bytes,
        |  min(CASE WHEN status = 0 THEN bytes END)::BIGINT AS min_bytes,
        |  max(CASE WHEN status = 0 THEN bytes END)::BIGINT AS max_bytes,
        |  sum(CASE WHEN status = 0 THEN w END)::BIGINT AS total_width,
        |  sum(CASE WHEN status = 0 THEN h END)::BIGINT AS total_height,
        |  sum(CASE WHEN status = 0 THEN units END)::BIGINT AS total_units
        |  FROM pa),
        |g AS (SELECT sig, count(*) AS n FROM pa
        |  WHERE sig IS NOT NULL GROUP BY sig),
        |sg AS (SELECT
        |  coalesce(count(*), 0)::BIGINT AS n_distinct_fingerprints,
        |  coalesce(max(n), 0)::BIGINT AS max_fingerprint_group
        |  FROM g)
        |SELECT base.*, sg.*, 'image' AS modality FROM base, sg""".stripMargin,
    // SKETCH-VS-TRUTH quantile error: the approx side's per-group
    // values are the dump; the EXACT side is recomputed INDEPENDENTLY
    // by DuckDB — same md5-predicate 25% sample (threshold hex =
    // hashThresholdHex(0.25)), quantile_cont's R-7 interpolation ==
    // Spark percentile's — then the relative-error arithmetic replays
    "q52_quantile_error" ->
      """WITH ap AS (SELECT *
        |  FROM read_parquet('__AUX__/q52_approx/*.parquet')),
        |li AS (SELECT l_returnflag, l_extendedprice::DOUBLE AS v
        |  FROM lineitem
        |  WHERE md5(l_orderkey::VARCHAR || '|' || 'q52')
        |    < '40000000000000000000000000000000'),
        |ex AS (SELECT l_returnflag,
        |    quantile_cont(v, 0.5) AS p50,
        |    quantile_cont(v, 0.95) AS p95,
        |    quantile_cont(v, 0.99) AS p99
        |  FROM li GROUP BY l_returnflag)
        |SELECT count(*)::BIGINT AS n_groups,
        |  round(max(abs(a_p50 - p50) / abs(p50)), 6) AS max_rel_err_p50,
        |  round(max(abs(a_p95 - p95) / abs(p95)), 6) AS max_rel_err_p95,
        |  round(max(abs(a_p99 - p99) / abs(p99)), 6) AS max_rel_err_p99
        |FROM ex JOIN ap USING (l_returnflag)""".stripMargin,
    // FULL FIM replay — nothing is dumped: the digest (md5), the rate
    // threshold (hashThresholdHex(0.5)), the two hex-parsed cuts, and
    // the sentinel concatenation are all re-derived from the documents
    // table alone (both engines count length/substr in codepoints)
    "q146_fim_transform" ->
      """WITH d AS (SELECT doc_id, text,
        |    md5(doc_id::VARCHAR || '|' || 'fim') AS dg,
        |    length(text) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, text, n, dg,
        |    least(('0x' || substr(dg, 17, 5))::BIGINT % (n + 1),
        |          ('0x' || substr(dg, 22, 5))::BIGINT % (n + 1)) AS lo,
        |    greatest(('0x' || substr(dg, 17, 5))::BIGINT % (n + 1),
        |             ('0x' || substr(dg, 22, 5))::BIGINT % (n + 1)) AS hi
        |  FROM d)
        |SELECT doc_id,
        |  dg < '80000000000000000000000000000000' AND text IS NOT NULL AS fim_applied,
        |  CASE WHEN dg < '80000000000000000000000000000000' AND text IS NOT NULL THEN
        |    '<|fim_prefix|>' || substr(text, 1, lo) ||
        |    '<|fim_suffix|>' || substr(text, hi + 1, n - hi) ||
        |    '<|fim_middle|>' || substr(text, lo + 1, hi - lo)
        |  ELSE text END AS fim_text
        |FROM c""".stripMargin,
    // TWO-DIRECTIONAL witness replay: every orientation of A against
    // B's canonical (orient 0); a pair needs witnesses in BOTH
    // directions, and its min_hamming is the best witness's distance
    "q137_image_rotation_neardup" ->
      """WITH s AS (SELECT id, orient, sig
        |  FROM read_parquet('__AUX__/q137_sigs/*.parquet')),
        |m AS (
        |  SELECT a.id AS ida, b.id AS idb,
        |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |  FROM s a JOIN s b ON b.orient = 0 AND a.id <> b.id
        |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
        |d AS (
        |  SELECT least(ida, idb) AS id1, greatest(ida, idb) AS id2,
        |    CASE WHEN ida < idb THEN 0 ELSE 1 END AS dir, hamming
        |  FROM m),
        |p AS (
        |  SELECT id1, id2, count(DISTINCT dir)::BIGINT AS n_witnesses,
        |    min(hamming) AS min_hamming
        |  FROM d GROUP BY id1, id2
        |  HAVING count(DISTINCT dir) >= 2)
        |SELECT
        |  CASE WHEN id2 - id1 = 100000 THEN 'planted_rotated'
        |       ELSE 'other' END AS pair_type,
        |  count(*)::BIGINT AS n_pairs,
        |  min(n_witnesses) AS min_witnesses,
        |  max(min_hamming) AS max_hamming
        |FROM p GROUP BY 1""".stripMargin,
    "q63_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS ts
        |  FROM documents WHERE doc_id < 1500),
        |grams AS (
        |  SELECT doc_id, list_distinct(list_filter(list_transform(
        |    range(0, greatest(len(ts) - 8, 0) + 1),
        |    i -> array_to_string(ts[i+1:i+8], ' ')), s -> len(s) > 0)) AS gs
        |  FROM toks),
        |benchg AS (SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id < 10),
        |docg AS (
        |  SELECT doc_id, unnest(gs) AS gram FROM grams WHERE doc_id >= 10
        |  UNION ALL
        |  SELECT doc_id + 50000 AS doc_id, unnest(gs) AS gram FROM grams WHERE doc_id < 10)
        |SELECT doc_id, count(*) AS n_hits
        |FROM docg WHERE gram IN (SELECT gram FROM benchg)
        |GROUP BY doc_id""".stripMargin,
    // q95: the per-source sketch ESTIMATES are this run's dumped replay
    // input (the one non-SQL-portable step); the exact shared-gram
    // numerator replays from the documents table with q63's
    // string-shingle idiom (hashed == string counts at 2^-64 collision
    // odds, EntrySpec-pinned), then the left join + guarded fraction.
    "q95_contamination_budget" ->
      """WITH est AS (
        |  SELECT source, distinct_grams
        |  FROM read_parquet('__AUX__/q95_distinct/*.parquet')),
        |toks AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS ts
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, list_distinct(list_filter(list_transform(
        |    range(0, greatest(len(ts) - 8, 0) + 1),
        |    i -> array_to_string(ts[i+1:i+8], ' ')), s -> len(s) > 0)) AS gs
        |  FROM toks),
        |benchg AS (SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id < 50),
        |srcg AS (SELECT DISTINCT source, unnest(gs) AS gram FROM grams),
        |sh AS (
        |  SELECT source, count(*) AS shared_grams FROM srcg
        |  WHERE gram IN (SELECT gram FROM benchg) GROUP BY source)
        |SELECT est.source, est.distinct_grams,
        |  CAST(coalesce(sh.shared_grams, 0) AS BIGINT) AS shared_grams,
        |  round(CASE WHEN est.distinct_grams > 0
        |    THEN coalesce(sh.shared_grams, 0) / CAST(est.distinct_grams AS DOUBLE)
        |    ELSE 0.0 END, 6) AS contaminated_fraction
        |FROM est LEFT JOIN sh ON est.source = sh.source""".stripMargin,
    // q89: the merged per-lang HLL ESTIMATES are this run's dumped
    // replay input (the one sketch-internal step — the q95 seam);
    // DuckDB recomputes the exact distinct docs/tokens from the
    // documents table (q95's token idiom) and replays the within-5%
    // judgment. Tolerance arithmetic forced to DOUBLE on both sides —
    // DuckDB's bare 0.05 is DECIMAL and could flip a knife-edge bound.
    "q89_cardinality" ->
      """WITH est AS (
        |  SELECT lang, distinct_docs, distinct_tokens
        |  FROM read_parquet('__AUX__/q89_est/*.parquet')),
        |ed AS (
        |  SELECT lang, count(DISTINCT text) AS exact_docs
        |  FROM documents GROUP BY lang),
        |toks AS (
        |  SELECT lang, unnest(list_filter(
        |    regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0)) AS tok
        |  FROM documents),
        |et AS (SELECT lang, count(DISTINCT tok) AS exact_tokens
        |  FROM toks GROUP BY lang)
        |SELECT est.lang, est.distinct_docs, est.distinct_tokens,
        |  ed.exact_docs,
        |  CAST(coalesce(et.exact_tokens, 0) AS BIGINT) AS exact_tokens,
        |  abs(est.distinct_docs - ed.exact_docs) <=
        |    greatest(CAST(2.0 AS DOUBLE),
        |      CAST(0.05 AS DOUBLE) * ed.exact_docs) AS docs_within_tol,
        |  abs(est.distinct_tokens - coalesce(et.exact_tokens, 0)) <=
        |    greatest(CAST(2.0 AS DOUBLE),
        |      CAST(0.05 AS DOUBLE) * coalesce(et.exact_tokens, 0))
        |    AS tokens_within_tol
        |FROM est JOIN ed USING (lang) LEFT JOIN et USING (lang)""".stripMargin,
    // q23: the sketch TVD is the dumped replay input (the q52
    // sketch-vs-truth idiom); DuckDB recomputes the exact fixed-bin
    // TVD with the q24 binning (side 1's range fixes the edges, side
    // 2 clamps — continuousComparator semantics) and replays the
    // tolerance judgment. All value arithmetic in DOUBLE.
    "q23_sketch_tvd" ->
      """WITH sk AS (
        |  SELECT tvd_sketch FROM read_parquet('__AUX__/q23_sketch/*.parquet')),
        |li AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS p,
        |    CAST(l_extendedprice AS DOUBLE) *
        |      (1.0 - CAST(l_discount AS DOUBLE)) AS d
        |  FROM lineitem),
        |b AS (SELECT min(p) AS lo, max(p) AS hi FROM li),
        |h1 AS (
        |  SELECT least(CAST(floor((p - lo) / ((hi - lo) / 100)) AS BIGINT), 99) AS bin,
        |    count(*) / (sum(count(*)) OVER ()) AS p1
        |  FROM li, b WHERE p >= lo AND p <= hi GROUP BY 1),
        |h2 AS (
        |  SELECT least(CAST(floor((d - lo) / ((hi - lo) / 100)) AS BIGINT), 99) AS bin,
        |    count(*) / (sum(count(*)) OVER ()) AS p2
        |  FROM li, b WHERE d >= lo AND d <= hi GROUP BY 1),
        |ex AS (
        |  SELECT coalesce(sum(abs(coalesce(p1, 0) - coalesce(p2, 0))) / 2, 0) AS tvd_exact
        |  FROM h1 FULL OUTER JOIN h2 USING (bin))
        |SELECT round(sk.tvd_sketch, 6) AS tvd_sketch,
        |  round(ex.tvd_exact, 6) AS tvd_exact,
        |  abs(sk.tvd_sketch - ex.tvd_exact) <= 0.05 AS within_tol
        |FROM sk, ex""".stripMargin,
    // the digest-sample predicate verbatim (q28's idiom): seeded
    // sampling as a capability, engine-portable
    "q150_digest_sample" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         |WHERE md5(CAST(l_orderkey AS VARCHAR) || '|' || 'q150') <
         |  '${graft.operators.Ops.hashThresholdHex(0.25)}'""".stripMargin,
    "q149_load_calibration" ->
      """WITH po AS (
        |  SELECT l_orderkey, sum(l_quantity) AS qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
        |  FROM lineitem GROUP BY l_orderkey),
        |pc AS (
        |  SELECT o_custkey, count(*) AS n_orders, sum(qty) AS cust_qty,
        |    sum(revenue) AS cust_revenue
        |  FROM po JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey),
        |r AS (
        |  SELECT o_custkey % 16 AS bucket, o_custkey, n_orders, cust_qty,
        |    cust_revenue,
        |    row_number() OVER (PARTITION BY o_custkey % 16
        |      ORDER BY cust_revenue DESC, o_custkey) AS rnk
        |  FROM pc)
        |SELECT bucket, rnk, o_custkey, n_orders,
        |  round(cust_qty, 2) AS cust_qty,
        |  round(cust_revenue, 2) AS cust_revenue
        |FROM r WHERE rnk <= 200""".stripMargin,
    "q64_repetition" -> RepetitionOracleSql,
    "q65_native_repetition" -> RepetitionOracleSql,
    "q66_pack_sequences" ->
      (s"""WITH chunks AS ($ChunkingOracleSql),
        |b AS (SELECT doc_id, chunk_id, chunk_tokens, doc_id % 8 AS bucket FROM chunks),
        |c AS (SELECT *, sum(chunk_tokens) OVER (
        |        PARTITION BY bucket ORDER BY doc_id, chunk_id) AS cum FROM b),
        |s AS (SELECT bucket * 1099511627776 + CAST(floor((cum - chunk_tokens) / 256.0) AS BIGINT) AS seq_id,
        |        chunk_tokens FROM c)
        |SELECT seq_id, count(*) AS n_chunks,
        |  CAST(sum(chunk_tokens) AS BIGINT) AS seq_tokens
        |FROM s GROUP BY seq_id""").stripMargin,
    // the q66 packing CTEs aggregated twice (per-seq, per-bucket) then
    // reduced to one row; all-integer except the final division
    "q87_packing_report" ->
      (s"""WITH chunks AS ($ChunkingOracleSql),
        |b AS (SELECT doc_id, chunk_id, chunk_tokens, doc_id % 8 AS bucket FROM chunks),
        |c AS (SELECT *, sum(chunk_tokens) OVER (
        |        PARTITION BY bucket ORDER BY doc_id, chunk_id) AS cum FROM b),
        |s AS (SELECT bucket * 1099511627776 + CAST(floor((cum - chunk_tokens) / 256.0) AS BIGINT) AS seq_id,
        |        chunk_tokens FROM c),
        |mx AS (SELECT max(chunk_tokens) AS m FROM s),
        |per AS (SELECT seq_id, sum(chunk_tokens) AS t, count(*) AS c
        |        FROM s GROUP BY seq_id),
        |pb AS (SELECT seq_id // 1099511627776 AS bucket,
        |         count(*) AS nseq, sum(c) AS nchunk, sum(t) AS tok,
        |         count(CASE WHEN t < 256 THEN 1 END) AS und,
        |         count(CASE WHEN t < 256 - mx.m + 1 THEN 1 END) AS deep,
        |         count(CASE WHEN t > 256 THEN 1 END) AS ov,
        |         max(mx.m) AS m
        |       FROM per, mx GROUP BY 1)
        |SELECT CAST(sum(nseq) AS BIGINT) AS n_sequences,
        |  CAST(sum(nchunk) AS BIGINT) AS n_chunks,
        |  CAST(sum(tok) AS BIGINT) AS tokens_packed,
        |  CAST(sum(nseq) * 256 AS BIGINT) AS budget_tokens,
        |  round(sum(tok) / (sum(nseq) * 256.0), 6) AS efficiency,
        |  CAST(sum(und) AS BIGINT) AS n_underfull,
        |  CAST(sum(deep) AS BIGINT) AS n_deep_underfull,
        |  CAST(sum(ov) AS BIGINT) AS n_overfull,
        |  CAST(max(deep) AS BIGINT) AS max_deep_underfull_per_bucket,
        |  CAST(max(m) AS BIGINT) AS max_chunk_tokens
        |FROM pb""").stripMargin,
    "q68_stream_dedup" ->
      """SELECT DISTINCT text FROM documents o
        |WHERE doc_id % 2 = 1
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents e
        |    WHERE e.doc_id % 2 = 0 AND e.text = o.text)""".stripMargin,
    "q69_quantile_filter" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    percent_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS pr
        |  FROM documents) WHERE pr <= 0.25""".stripMargin,
    "q70_corpus_shuffle" ->
      """SELECT doc_id, lang,
        |  md5(CAST(doc_id AS varchar) || '|' || 'epoch1') AS shuffle_key
        |FROM documents""".stripMargin,
    "q71_lm_logprob" -> LmOracleSql,
    "q72_lm_native" -> LmOracleSql,
    // q71's LM replay + percent_rank bucketing; ranking happens on the
    // round(6) score both engines agree on, boundaries at 1.0/3 and
    // 1.0/3 + 1.0/3 (bit-identical to Spark's headFrac arithmetic —
    // doubling a double is exact)
    "q98_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0)) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token, count(*) AS cnt FROM toks WHERE doc_id < 100
        |  GROUP BY token HAVING count(*) >= 2),
        |c AS (SELECT CAST(coalesce(sum(cnt), 0) + count(*) + 1 AS DOUBLE) AS d
        |      FROM vocab),
        |perdoc AS (
        |  SELECT t.doc_id,
        |    round(avg(log10(CAST(coalesce(v.cnt, 0) + 1 AS DOUBLE) / c.d)), 6) AS lm_logp
        |  FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN c
        |  WHERE t.doc_id >= 100 GROUP BY t.doc_id),
        |scored AS (
        |  SELECT p.doc_id, d.source, p.lm_logp,
        |    percent_rank() OVER (PARTITION BY d.source ORDER BY p.lm_logp DESC) AS pr
        |  FROM perdoc p JOIN documents d USING (doc_id))
        |SELECT doc_id, source, lm_logp,
        |  CASE WHEN pr < 1.0/3 THEN 'head'
        |       WHEN pr < 1.0/3 + 1.0/3 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM scored""".stripMargin,
    "q76_span_dedup" -> SpanDedupOracleSql,
    "q77_span_dedup_native" -> SpanDedupOracleSql,
    "q79_dsir_sample" -> DsirOracleSql,
    "q80_dsir_native" -> DsirOracleSql,
    // same tokenizer as the q71 oracle; bigram pairs are within-doc
    // adjacent tokens in BOTH training and scoring; position 0 is the
    // q71 unigram arithmetic, later positions Laplace over (c1, V);
    // ONE oracle pins the composable (q82) and native (q83) forms
    "q82_bigram_logprob" -> BigramOracleSql,
    "q83_bigram_native" -> BigramOracleSql,
    "q85_trigram_logprob" -> trigramOracleSql(LmScoredBounded),
    "q86_trigram_native" -> trigramOracleSql(LmScoredFull),
    "q93_quadgram_logprob" -> quadgramOracleSql(LmScoredBounded),
    "q94_quadgram_native" -> quadgramOracleSql(LmScoredFull),
    // interpolated Kneser–Ney replayed end to end: UNPRUNED count
    // tables, count-of-counts discount, continuation counts with the
    // Laplace-style OOV floor; the CASE arms and operator grouping
    // mirror logProbPerDocKneserNey exactly. ONE oracle pins the
    // composable (q97) and native-registry (q99) forms.
    "q97_kneser_ney" -> kneserNeyOracleSql(LmScoredBounded),
    "q99_kn_native" -> kneserNeyOracleSql(LmScoredFull),
    "q100_kn3" -> kneserNey3OracleSql(LmScoredBounded),
    "q101_kn3_native" -> kneserNey3OracleSql(LmScoredFull),
    // the order-4 KN recursion replayed by the GENERATED CTE chain —
    // training, continuation chain, discounts, and all four frame
    // programs produced from the same index arithmetic the Scala
    // scorer loops over; ONE oracle pins the composable (q114) and
    // native-registry (q115) forms
    // special tokens: the round-trip oracle is the plant expression
    // itself (both encode paths must decode back to it), and the
    // never-split pin is the plant indicator (exactly one fixed tail
    // id per planted spelling, zero elsewhere)
    "q127_special_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0
        |       THEN 'pre ' || text || ' mid<|endoftext|>post' ELSE text END AS text_seg,
        |  CASE WHEN doc_id % 5 = 0
        |       THEN 'pre ' || text || ' mid<|endoftext|>post' ELSE text END AS text_byte,
        |  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS n_special_seg,
        |  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS n_special_byte
        |FROM documents""".stripMargin,
    "q114_kn4" -> kneserNeyNOracleSql(4, LmScoredBounded),
    "q115_kn4_native" -> kneserNeyNOracleSql(4, LmScoredFull),
    "q116_kn4_packed" -> kneserNeyNOracleSql(4, LmScoredFull, decimals = 4),
    // modified KN: the three-discount derivation replayed by ITS
    // generated CTE chain; ONE oracle pins the composable (q117),
    // native (q118), and packed (q119) forms
    "q117_mkn4" -> kneserNeyNModOracleSql(4, LmScoredBounded),
    "q118_mkn4_native" -> kneserNeyNModOracleSql(4, LmScoredFull),
    "q119_mkn4_packed" -> kneserNeyNModOracleSql(4, LmScoredFull, decimals = 4),
    "q120_mkn_ppl_buckets" -> kneserNeyNModOracleSql(4, LmScoredFull, buckets = true),
    // the generic program at CCNet's actual order — nothing in the
    // generator or the engine is order-4-specific
    "q121_mkn5" -> kneserNeyNModOracleSql(5, LmScoredBounded),
    // the whole language-ID program replayed: same planted samples,
    // same tokenizer (split lower-trimmed on \s+, drop empties), same
    // distinct-stopword intersects, the same (score, lang) max with
    // Spark's struct-ordering tie (equal score → lexicographically
    // LARGEST lang), the same script regexp counts and decision CASE.
    // fast_agrees replays as constant TRUE — the native one-pass form
    // is pinned to the composable form inside the gate.
    "q125_langid" -> {
      val samples = Q125Samples.map(s => s"'$s'").mkString(", ")
      val langs = graft.llm.TextAnalysis.StopwordProfiles.toSeq.sortBy(_._1)
      val scoreCols = langs.map { case (lang, stops) =>
        val list = stops.map(w => s"'$w'").mkString(",")
        s"len(list_intersect(toks, [$list])) AS s_$lang"
      }.mkString(",\n        |    ")
      val bestScore = "greatest(" + langs.map(l => s"s_${l._1}").mkString(", ") + ")"
      val bestLang = langs.map(_._1).sorted.reverse
        .map(l => s"WHEN s_$l = best_score THEN '$l'").mkString(" ")
      def rc(range: String) = s"len(regexp_extract_all(t, '$range'))"
      s"""WITH p AS (
        |  SELECT doc_id,
        |    ([$samples])[(doc_id % ${Q125Samples.length} + 1)::INT] AS t
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, t,
        |    list_distinct(list_filter(
        |      string_split_regex(lower(trim(t)), '\\s+'), x -> len(x) > 0)) AS toks
        |  FROM p),
        |sc AS (
        |  SELECT doc_id, t, length(t) AS n,
        |    $scoreCols,
        |    ${rc("[\\x{4e00}-\\x{9fff}]")} AS cjk,
        |    ${rc("[\\x{3040}-\\x{30ff}]")} AS kana,
        |    ${rc("[\\x{ac00}-\\x{d7af}\\x{1100}-\\x{11ff}]")} AS hangul,
        |    ${rc("[\\x{0400}-\\x{04ff}]")} AS cyr,
        |    ${rc("[\\x{0600}-\\x{06ff}]")} AS arab,
        |    ${rc("[\\x{0590}-\\x{05ff}]")} AS hebr,
        |    ${rc("[\\x{0370}-\\x{03ff}]")} AS grek,
        |    ${rc("[\\x{0900}-\\x{097f}]")} AS deva,
        |    ${rc("[\\x{0e00}-\\x{0e7f}]")} AS thai
        |  FROM k),
        |b AS (
        |  SELECT *, $bestScore AS best_score FROM sc),
        |v AS (
        |  SELECT *, CASE $bestLang END AS best_lang FROM b)
        |SELECT doc_id,
        |  CASE WHEN kana * 20 > n THEN 'ja'
        |       WHEN hangul * 4 > n THEN 'ko'
        |       WHEN cjk * 4 > n THEN 'zh'
        |       WHEN arab * 4 > n THEN 'ar'
        |       WHEN hebr * 4 > n THEN 'he'
        |       WHEN grek * 4 > n THEN 'el'
        |       WHEN deva * 4 > n THEN 'hi'
        |       WHEN thai * 4 > n THEN 'th'
        |       WHEN best_score > 0 THEN best_lang
        |       WHEN cyr * 4 > n THEN 'ru'
        |       ELSE 'unknown' END AS lang_id,
        |  TRUE AS fast_agrees
        |FROM v""".stripMargin
    },
    // the whole URL canonicalization chain + first-wins window
    // replayed: same synthetic URLs, same regex steps in RE2
    "q123_url_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END) ||
        |    source || '.example.org' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
        |    '/page/' || CAST(doc_id % 25 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=a' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents WHERE doc_id < 300),
        |n1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS t FROM raw),
        |n2 AS (SELECT doc_id, t,
        |    lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(t, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM n1),
        |n3 AS (SELECT doc_id, t, scheme,
        |    regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\.', '') AS h0,
        |    regexp_replace(rest, '^[^/?]*', '') AS rem FROM n2),
        |n4 AS (SELECT doc_id, t, scheme,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(h0, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(h0, ':443$', '')
        |         ELSE h0 END AS host,
        |    regexp_replace(regexp_replace(rem, '\?.*$', ''), '/+$', '') AS path,
        |    regexp_replace(rem, '^[^?]*\??', '') AS q FROM n3),
        |n5 AS (SELECT doc_id, t, scheme, host, path,
        |    array_to_string(list_filter(str_split(q, '&'),
        |      p -> p <> '' AND NOT starts_with(p, 'utm_')), '&') AS kept FROM n4),
        |norm AS (SELECT doc_id,
        |    CASE WHEN scheme = '' THEN t
        |         ELSE scheme || '://' || host || path ||
        |              (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) END AS url_norm
        |  FROM n5)
        |SELECT doc_id, url_norm FROM (
        |  SELECT doc_id, url_norm,
        |    row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn
        |  FROM norm) WHERE rn = 1""".stripMargin,
    // the whole first-wins line-dedup program replayed: same planted
    // corpus, same (doc, pos) tie order, same exemption and counts
    "q122_line_dedup" ->
      """WITH arr AS (
        |  SELECT doc_id,
        |    str_split(
        |      CASE WHEN doc_id % 3 = 0
        |           THEN 'subscribe to our newsletter for weekly updates' || chr(10)
        |           ELSE '' END ||
        |      '-' || chr(10) || text || chr(10) ||
        |      'all rights reserved by the original publisher', chr(10)) AS ls
        |  FROM documents WHERE doc_id < 200),
        |lines AS (
        |  SELECT doc_id, i, ls[i] AS line
        |  FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM arr)),
        |kept AS (
        |  SELECT doc_id, i, line FROM (
        |    SELECT doc_id, i, line,
        |      row_number() OVER (PARTITION BY line ORDER BY doc_id, i) AS rn
        |    FROM lines)
        |  WHERE len(line) < 15 OR rn = 1),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS clean,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT a.doc_id, coalesce(r.clean, '') AS text,
        |  CAST(len(a.ls) - coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_removed
        |FROM arr a LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,
    // the full learned-classifier dot product replayed: the five
    // features are the q16/q21/q64 replays, the sigmoid accumulates
    // intercept-first then features in declaration order (matching the
    // score() fold); round(6) absorbs exp's libm dependence
    "q84_classifier_score" ->
      """WITH st AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(trim(text), '\S+')) AS n_tokens,
        |    length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
        |    length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
        |    length(text) AS n_chars,
        |    len(list_filter(regexp_extract_all(lower(trim(text)), '\S+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS hits,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS ts
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens, n_nonspace, n_punct, n_chars, hits,
        |    greatest(len(ts) - 2, 0) AS total,
        |    list_filter(list_transform(range(0, greatest(len(ts) - 3, 0) + 1),
        |      i -> array_to_string(ts[i+1:i+3], ' ')), g -> len(g) > 0) AS grams
        |  FROM st),
        |f AS (
        |  SELECT doc_id,
        |    least(n_tokens / 100.0, 1.0) AS tok_score,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE n_nonspace / CAST(n_tokens AS DOUBLE) END AS avg_token_len,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE hits / CAST(n_tokens AS DOUBLE) END AS stop_ratio,
        |    CASE WHEN n_chars = 0 THEN 0.0
        |         ELSE n_punct / CAST(n_chars AS DOUBLE) END AS punct_ratio,
        |    CASE WHEN total <= 0 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / total END AS repetition
        |  FROM r)
        |SELECT doc_id,
        |  round(1.0 / (1.0 + exp(-(-0.75 + 1.25 * tok_score + 0.3 * avg_token_len
        |    + 2.5 * stop_ratio + -3.0 * punct_ratio + -2.0 * repetition))), 6) AS clf_score
        |FROM f""".stripMargin,
    // the whole domain gate replayed: same synthetic URL construction,
    // same regexp_replace normalization chain (every pattern anchored /
    // single-match, so first-match-vs-global replace semantics agree),
    // same exact-or-parent-suffix block semantics via NOT EXISTS
    "q92_domain_filter" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'https://www.' ELSE 'http://' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN 'ads.' || source || '.example.com'
        |          ELSE source || '.example.org' END) ||
        |    '/page/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      lower(trim(url)),
        |      '^[a-z][a-z0-9+.-]*://', ''), '[/?#].*$', ''),
        |      ':[0-9]+$', ''), '^www\.', '') AS domain
        |  FROM docs),
        |block AS (SELECT * FROM (VALUES ('example.com'), ('src3.example.org')) AS t(domain))
        |SELECT n.doc_id, n.domain FROM norm n
        |WHERE NOT EXISTS (SELECT 1 FROM block b
        |  WHERE n.domain = b.domain OR n.domain LIKE '%.' || b.domain)""".stripMargin,
    // same whitespace-token arithmetic as the q16 oracle; all-integer
    // aggregates, so no float caveat anywhere
    "q81_corpus_report" ->
      """SELECT source, lang,
        |  count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(len(regexp_extract_all(trim(text), '\S+'))) AS BIGINT) AS total_tokens,
        |  CAST(min(len(regexp_extract_all(trim(text), '\S+'))) AS BIGINT) AS min_doc_tokens,
        |  CAST(max(len(regexp_extract_all(trim(text), '\S+'))) AS BIGINT) AS max_doc_tokens,
        |  CAST(sum(CASE WHEN len(regexp_extract_all(trim(text), '\S+')) = 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
        |FROM documents GROUP BY source, lang""".stripMargin,
    // identical temperature arithmetic: same skewed corpus, same
    // count→pow(n, alpha-1)→least(1, budget·w/max w) rates, same 60-bit
    // numeric uniform (the q58 idiom) on the shared digest
    "q74_temperature_mix" ->
      """WITH corpus AS (
        |  SELECT doc_id, source FROM documents
        |  WHERE doc_id % (CAST(substr(source, 4) AS INT) + 2) = 0),
        |counts AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n
        |  FROM corpus GROUP BY source),
        |rates AS (
        |  SELECT source, least(1.0, 0.9 * pow(n, -0.5) /
        |    (SELECT max(pow(n, -0.5)) FROM counts)) AS rate
        |  FROM counts)
        |SELECT c.doc_id, c.source
        |FROM corpus c JOIN rates r USING (source)
        |WHERE (('0x' || substr(md5(CAST(c.doc_id AS VARCHAR) || '|' || 'q74'),
        |          1, 15))::UBIGINT + 1.0) / 1152921504606846976.0 <= r.rate""".stripMargin,
    // identical epoch arithmetic: same weight map (when-chain ==
    // coalesced scalar lookup), same 60-bit md5 uniform, same
    // floor+fraction copy count, same 0..k-1 epoch tags
    "q102_epoch_mix" ->
      """WITH w AS (SELECT * FROM (VALUES
        |    ('src0', 2.5), ('src1', 0.5), ('src2', 0.0), ('src3', 3.0))
        |    t(source, wt)),
        |d AS (
        |  SELECT doc_id, d0.source,
        |    coalesce((SELECT wt FROM w WHERE w.source = d0.source), 1.0) AS wt
        |  FROM documents d0),
        |k AS (
        |  SELECT doc_id, source,
        |    CAST(floor(wt) AS BIGINT) +
        |    CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'q102'),
        |             1, 15))::UBIGINT + 1.0) / 1152921504606846976.0 <= wt - floor(wt)
        |         THEN 1 ELSE 0 END AS copies
        |  FROM d)
        |SELECT doc_id, source,
        |  CAST(unnest(generate_series(0, copies - 1)) AS BIGINT) AS epoch
        |FROM k WHERE copies > 0""".stripMargin,
    // every Gopher rule replayed: regexp token split, replace-delta
    // symbol counting (the '...' delta is a multiple of 3, so the
    // double division is exact), line fractions, distinct-stopword
    // intersection; flags compare UNROUNDED IEEE ratios in both engines
    // the whole packing arithmetic replayed: per-bucket cumulative
    // stream offsets, fixed-length window assignment via integer
    // division of each token's global position, ordered concatenation,
    // and doc-start boundary offsets (idx = 0 within the doc stream)
    "q110_pack_token_ids" -> PackTokenIdsOracleSql,
    // the report replayed OVER the packing replay (nested CTE)
    "q111_packed_report" ->
      s"""WITH pk AS ($PackTokenIdsOracleSql)
         |SELECT count(*)::BIGINT AS n_sequences,
         |  (count(*) FILTER (WHERE n_tokens = 128))::BIGINT AS n_full,
         |  (count(*) FILTER (WHERE n_tokens <> 128))::BIGINT AS n_partial,
         |  sum(n_tokens)::BIGINT AS tokens_packed,
         |  (count(*) * 128)::BIGINT AS capacity_tokens,
         |  round(sum(n_tokens) / (count(*) * 128.0), 6) AS efficiency,
         |  sum(n_docs_started)::BIGINT AS n_docs_started,
         |  round(sum(n_docs_started)::DOUBLE / count(*), 6) AS avg_docs_per_seq
         |FROM pk""".stripMargin,
    // the round-trip gate: Spark returns decode(encode(text)) — the
    // oracle is the INPUT text itself (with the same planted suffix),
    // so a hash match proves the entire byte-level tokenize/detokenize
    // cycle is byte-exact over every document
    "q112_bpe_byte_roundtrip" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' naïve ☃😀' ELSE text END AS text
        |FROM documents""".stripMargin,
    "q139_unigram_roundtrip" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' naïve ☃😀' ELSE text END AS text
        |FROM documents""".stripMargin,
    "q141_wordpiece_roundtrip" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' naïve ☃😀' ELSE text END AS text
        |FROM documents""".stripMargin,
    "q143_markdown_strip" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(text,
        |      '[\]\[()*_`#>|\\=:.~{}!+<-]', '', 'g'),
        |      '[ \t\n\r\f\x0B]+', ' ', 'g')) AS pp
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, CASE WHEN length(pp) = 0 THEN 'x' ELSE pp END AS p FROM s)
        |SELECT doc_id,
        |  'Header One' || chr(10) ||
        |  p || ' mid ' || p || chr(10) ||
        |  p || ' and ' || p || chr(10) ||
        |  p || chr(10) ||
        |  'item ' || p || chr(10) ||
        |  'code ' || p || chr(10) ||
        |  p || ' cell' AS text
        |FROM p""".stripMargin,
    "q104_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    regexp_extract_all(trim(text), '\S+') AS toks,
        |    regexp_split_to_array(text, '\r?\n') AS lines
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(toks) AS n_words,
        |    CAST(greatest(len(toks), 1) AS DOUBLE) AS dw,
        |    CAST(greatest(len(lines), 1) AS DOUBLE) AS dl,
        |    length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
        |    length(text) - length(replace(text, '#', '')) AS n_hash,
        |    (length(text) - length(replace(text, '…', ''))) +
        |      (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell,
        |    len(list_filter(lines, l -> substr(ltrim(l), 1, 1) IN ('•','‣','-','*'))) AS n_bullet,
        |    len(list_filter(lines, l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…')) AS n_ell_lines,
        |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
        |    len(list_intersect(list_distinct(list_transform(toks, x -> lower(x))),
        |        ['the','be','to','of','and','that','have','with'])) AS stop_hits
        |  FROM t),
        |f AS (
        |  SELECT doc_id, n_words, stop_hits,
        |    n_nonspace / dw AS mwl, n_hash / dw AS hr, n_ell / dw AS er,
        |    n_bullet / dl AS bf, n_ell_lines / dl AS ef, n_alpha / dw AS af
        |  FROM c)
        |SELECT doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  round(mwl, 6) AS mean_word_len,
        |  round(hr, 6) AS hash_ratio,
        |  round(er, 6) AS ellipsis_ratio,
        |  round(bf, 6) AS bullet_line_frac,
        |  round(ef, 6) AS ellipsis_line_frac,
        |  round(af, 6) AS alpha_word_frac,
        |  CAST(stop_hits AS BIGINT) AS stop_hits,
        |  CAST(n_words BETWEEN 50 AND 100000 AS INT) AS ok_word_count,
        |  CAST(n_words > 0 AND mwl BETWEEN 3.0 AND 10.0 AS INT) AS ok_word_len,
        |  CAST(hr <= 0.1 AND er <= 0.1 AS INT) AS ok_symbols,
        |  CAST(bf <= 0.9 AS INT) AS ok_bullets,
        |  CAST(ef <= 0.3 AS INT) AS ok_ellipsis_lines,
        |  CAST(n_words > 0 AND af >= 0.8 AS INT) AS ok_alpha,
        |  CAST(stop_hits >= 2 AS INT) AS ok_stopwords,
        |  CAST(n_words BETWEEN 50 AND 100000
        |    AND n_words > 0 AND mwl BETWEEN 3.0 AND 10.0
        |    AND hr <= 0.1 AND er <= 0.1 AND bf <= 0.9 AND ef <= 0.3
        |    AND af >= 0.8 AND stop_hits >= 2 AS INT) AS keep
        |FROM f""".stripMargin,
    // the whole extraction chain replayed in RE2: block drops (script/
    // style/comments), break-tag newlines, tag strip, the SAME entity
    // list unfolded into replace() calls, whitespace squeeze
    "q108_html_extract" -> {
      // LOCKSTEP with the q108 fixture: the chain replays the decode of
      // exactly the PLANTED references (the engine side decodes through
      // the full WHATWG table, whose single-pass semantics equal an
      // ordered chain with &amp; last when — as here — no replacement
      // value contains a reference form). The extended names prove the
      // full-table default: they are OUTSIDE the old 7-entity core.
      val plantedRefs = graft.llm.TextAnalysis.HtmlEntities.filterNot(_._1 == "&amp;") ++ Seq(
        "&eacute;" -> "é", "&hellip;" -> "…",
        "&copy;" -> "©", "&mdash;" -> "—",
        "&#8212;" -> "—", "&#x1F60A;" -> new String(Character.toChars(0x1f60a)),
        "&amp;" -> "&") // &amp; LAST: "&amp;lt;" must yield "&lt;", not "<"
      val entityChain = plantedRefs.foldLeft("t4") {
        case (acc, (e, ch)) =>
          val lit = ch.replace("'", "''")
          s"replace($acc, '$e', '$lit')"
      }
      s"""WITH p AS (
         |  SELECT doc_id,
         |    '<html><head><style type="text/css">body { color: red }</style>' ||
         |    '<script>var x = 1 < 2;</script></head><body>' ||
         |    '<!-- hidden comment --><h1>Title  here</h1>' ||
         |    '<p>First&nbsp;para with <b>bold</b> &amp; ' ||
         |    substr(text, 1, 40) ||
         |    '</p><div>Second &lt;div&gt; line</div>' ||
         |    '<ul><li>item one</li><li>item&#39;s two</li></ul>' ||
         |    '<p>Caf&eacute; &hellip; &copy; 2024 &mdash; n&#8212;m' ||
         |    ' &#x1F60A; but &notareal; and Fish&Chips stay</p>' ||
         |    '<br/>tail text</body></html>' AS t
         |  FROM documents),
         |s0 AS (SELECT doc_id,
         |  regexp_replace(t, '\\r\\n?', chr(10), 'g') AS t FROM p),
         |s1 AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '(?is)<script\\b[^>]*>.*?</script\\s*>', '', 'g'),
         |    '(?is)<style\\b[^>]*>.*?</style\\s*>', '', 'g'),
         |    '(?s)<!--.*?-->', '', 'g') AS t FROM s0),
         |s2 AS (SELECT doc_id, regexp_replace(t,
         |  '(?i)<br\\s*/?>|</p\\s*>|</div\\s*>|</li\\s*>|</h[1-6]\\s*>|</tr\\s*>',
         |  chr(10), 'g') AS t FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(t,
         |  '</?[A-Za-z][^>]*>|<![A-Za-z][^>]*>', '', 'g') AS t FROM s2),
         |s4 AS (SELECT doc_id, t AS t4 FROM s3),
         |s5 AS (SELECT doc_id, $entityChain AS t FROM s4),
         |s6 AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(t, '[ \\t]+', ' ', 'g'),
         |    '(?m)^ +| +$$', '', 'g'),
         |    '^\\n+|\\n+$$', '', 'g') AS t FROM s5)
         |SELECT doc_id, t AS text_plain,
         |  CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines
         |FROM s6""".stripMargin
    },
    // prefix-by-digest token budgeting replayed: md5 order, cumulative
    // sum window, crossing-doc rule (cum - n < budget), zero and
    // unlimited budgets
    "q107_token_budget_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR) || '|' || 'q107') AS dg
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY dg, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 200
        |      WHEN 'src2' THEN 0 ELSE -1 END AS budget
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
        |FROM c WHERE budget < 0 OR cum - n_tokens < budget
        |GROUP BY source""".stripMargin,
    // the whole normalization chain replayed: the SAME MojibakeRepairs
    // list unfolds into a replace() chain (no transcription gap
    // possible), then CRLF->LF, control strip, and DuckDB's
    // nfc_normalize (the same Unicode NFC algorithm)
    "q106_normalize_text" -> {
      val chain = graft.llm.TextAnalysis.MojibakeRepairs.foldLeft("t") {
        case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')"
      }
      val planted = " caf\u00c3\u00a9 \u00e2\u20ac\u0153quoted" +
        "\u00e2\u20ac\u009d \u00e2\u0080\u0093dash" +
        " \u00e2\u20ac\u00a1x \u00c5\u00a1ip" +
        " \u00c3\u00a2\u00e2\u201a\u00ac\u00e2\u201e\u00a2twice" +
        " \u00c3 stays"
      // LOCKSTEP with the q106 fixture: the plants OUTSIDE the core
      // list (double dagger, s-caron, the two-layer double encoding)
      // replay as explicit replaces BEFORE the list chain; the legit
      // "\u00c3 " has no replace on either side and must survive
      val extra = "replace(replace(replace(t, " +
        "'\u00c3\u00a2\u00e2\u201a\u00ac\u00e2\u201e\u00a2', '\u2019'), " +
        "'\u00e2\u20ac\u00a1', '\u2021'), " +
        "'\u00c5\u00a1', '\u0161')"
      s"""WITH p AS (
         |  SELECT doc_id,
         |    substr(text, 1, 40) || '$planted' ||
         |    chr(13) || chr(10) || 'Line2 e' || chr(769) || 'tude' ||
         |    chr(7) || 'bell' || chr(128) || 'ctrl' AS t
         |  FROM documents),
         |r0 AS (SELECT doc_id, $extra AS t FROM p),
         |r AS (SELECT doc_id, $chain AS t FROM r0),
         |n AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(t, '\\r\\n?', chr(10), 'g'),
         |    '[\\x00-\\x08\\x0B-\\x1F\\x7F-\\x9F]', '', 'g') AS t FROM r)
         |SELECT doc_id, nfc_normalize(t) AS text_norm,
         |  length(nfc_normalize(t)) AS n_chars
         |FROM n""".stripMargin
    },
    // every C4 rule replayed: line retention (terminal-punct regex,
    // \S+ word count, javascript substring), array_to_string rejoin,
    // terminal-punct sentence counting, page-level substring checks,
    // whole-word bad-word intersection over letter runs
    "q105_c4_rules" ->
      // the bad-word IN-list is GENERATED from the same default the
      // engine side scores with (the bundled LDNOOBW-subset resource)
      // — no transcription gap as the list grows
      s"""WITH p AS (
        |  SELECT doc_id,
        |    substr(text, 1, 80) || ' end.' ||
        |    chr(10) || 'too short.' ||
        |    chr(10) || 'please enable Javascript now.' ||
        |    chr(10) || 'no terminal punctuation here' ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
        |      'One more. And another! Question? Sure. Done.' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
        |      'lorem ipsum dolor sit amet.' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |      'code block { x } inside.' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
        |      'well shit happens sometimes.' ELSE '' END AS text
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, text, string_split(text, chr(10)) AS lines
        |  FROM p),
        |k AS (
        |  SELECT doc_id, text, lines,
        |    list_filter(lines, l ->
        |      regexp_matches(rtrim(l), '[.!?"”]$$')
        |      AND len(regexp_extract_all(l, '\\S+')) >= 3
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM t),
        |c AS (
        |  SELECT doc_id, text, lines, kept,
        |    coalesce(array_to_string(kept, chr(10)), '') AS clean,
        |    contains(text, '{') AS has_brace,
        |    contains(lower(text), 'lorem ipsum') AS has_lorem,
        |    len(list_intersect(
        |      list_distinct(regexp_extract_all(lower(text), '[a-z]+')),
        |      [${graft.llm.TextAnalysis.C4BadWordsDefault.map(w => s"'$w'").mkString(",")}])) > 0 AS has_bad
        |  FROM k),
        |f AS (
        |  SELECT doc_id, lines, kept, clean, has_brace, has_lorem, has_bad,
        |    length(clean) - length(regexp_replace(clean, '[.!?]', '', 'g'))
        |      AS n_sentences
        |  FROM c)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(has_brace AS INT) AS has_brace,
        |  CAST(has_lorem AS INT) AS has_lorem,
        |  CAST(has_bad AS INT) AS has_badword,
        |  clean AS clean_text,
        |  CAST(NOT has_brace AND NOT has_lorem AND NOT has_bad
        |    AND n_sentences >= 5 AS INT) AS keep
        |FROM f""".stripMargin,
    // identical boilerplate program: same planted corpus, same exact-line
    // doc-frequency threshold, same ordered reassembly (empty text +
    // n_kept 0 for fully-boilerplate docs)
    "q75_boilerplate" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    'graft common header' || chr(10) || text ||
        |    CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'promo line' ELSE '' END ||
        |    chr(10) || 'rare tag ' || CAST(doc_id % 97 AS VARCHAR) ||
        |    chr(10) || 'graft common footer' AS text
        |  FROM documents WHERE doc_id < 200),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, len(string_split(text, chr(10))))) - 1 AS pos,
        |    unnest(string_split(text, chr(10))) AS line
        |  FROM docs),
        |boiler AS (
        |  SELECT line FROM lines GROUP BY line
        |  HAVING count(DISTINCT doc_id) >= 10),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
        |    count(*) AS n_kept
        |  FROM lines WHERE line NOT IN (SELECT line FROM boiler)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.clean, '') AS text,
        |  coalesce(r.n_kept, 0) AS n_kept
        |FROM docs d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,
    "q67_assemble_sequences" ->
      (s"""WITH chunks AS ($ChunkingOracleSql),
        |b AS (SELECT doc_id, chunk_id, chunk_text, chunk_tokens, doc_id % 8 AS bucket FROM chunks),
        |c AS (SELECT *, sum(chunk_tokens) OVER (
        |        PARTITION BY bucket ORDER BY doc_id, chunk_id) AS cum FROM b),
        |s AS (SELECT bucket * 1099511627776 + CAST(floor((cum - chunk_tokens) / 256.0) AS BIGINT) AS seq_id,
        |        doc_id, chunk_id, chunk_text, chunk_tokens FROM c)
        |SELECT seq_id,
        |  string_agg(chunk_text, ' ' ORDER BY doc_id, chunk_id) AS seq_text,
        |  count(*) AS n_chunks,
        |  CAST(sum(chunk_tokens) AS BIGINT) AS seq_tokens
        |FROM s GROUP BY seq_id""").stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_cast" ->
      """SELECT cast(o_orderkey AS varchar) AS uid, o_totalprice, o_orderpriority
        |FROM orders WHERE o_custkey IS NOT NULL AND o_orderstatus = 'F'""".stripMargin,
    "q3_literal_meta" ->
      """SELECT 'm1' AS model_name, '2026-01-01 00:00:00' AS current_dt, *
        |FROM customer""".stripMargin,
    "q4_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q6_join_agg" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q7_window_topn" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q8_stratified_sample" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn
        | FROM orders) WHERE rn <= 7
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q9_group_count" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q10_minmax" ->
      "SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price, count(*) AS n FROM orders",
    "q11_discrete_hist" ->
      """SELECT cast(mod(l_orderkey * 2654435761, 50) AS varchar) AS bin,
        | count(*) AS cnt,
        | round(count(*) / (sum(count(*)) OVER ()), 6) AS freq
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q12_tvd" ->
      """WITH h1 AS (
        |  SELECT l_returnflag AS bin,
        |         count(*) / (sum(count(*)) OVER ()) AS p1
        |  FROM lineitem GROUP BY 1),
        |h2 AS (
        |  SELECT l_linestatus AS bin,
        |         count(*) / (sum(count(*)) OVER ()) AS p2
        |  FROM lineitem GROUP BY 1)
        |SELECT round(sum(abs(coalesce(p1, 0) - coalesce(p2, 0))) / 2, 6) AS tvd
        |FROM h1 FULL OUTER JOIN h2 USING (bin)""".stripMargin,
    "q13_score_expr" ->
      """SELECT l_orderkey, l_linenumber,
        | cast(l_extendedprice * l_discount AS real) AS pred
        |FROM lineitem""".stripMargin,
    "q14_exact_dedup" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q15_knn_brute" ->
      """SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      (list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
        |        / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
        |           * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))) AS cos_sim
        |    FROM embeddings q, embeddings c
        |    WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id))
        |WHERE rank <= 3""".stripMargin,
    "q16_doc_stats" ->
      """SELECT doc_id,
        | len(regexp_extract_all(trim(text), '\S+')) AS n_tokens,
        | length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
        | round(length(regexp_replace(text, '\s', '', 'g'))
        |   / len(regexp_extract_all(trim(text), '\S+')), 4) AS avg_token_len
        |FROM documents""".stripMargin,
    "q20_drop_dups" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,
    "q21_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    regexp_extract_all(lower(trim(text)), '\S+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, len(toks) AS n_toks,
        |    len(list_filter(toks, x -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], x))) AS hits,
        |    length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct
        |  FROM t)
        |SELECT doc_id, round(
        |    least(n_toks / 20.0, 1.0) * 0.4
        |  + least((CASE WHEN n_toks = 0 THEN 0.0 ELSE hits / CAST(n_toks AS DOUBLE) END) * 5.0, 1.0) * 0.4
        |  + greatest(1.0 - (CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE n_punct / CAST(length(text) AS DOUBLE) END) * 4.0, 0.0) * 0.2, 6) AS quality
        |FROM c""".stripMargin,
    "q19_stream_window" ->
      """WITH e AS (
        |  SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS ws,
        |         event_type, value, epoch(ts) AS es
        |  FROM events),
        |m AS (SELECT max(es) AS met FROM e)
        |SELECT cast(ws AS bigint) AS window_start,
        |       cast(ws + 3600 AS bigint) AS window_end,
        |       event_type, count(*) AS n_events,
        |       round(avg(value), 4) AS avg_value,
        |       round(sum(value), 4) AS sum_value
        |FROM e, m
        |GROUP BY ws, event_type, m.met
        |HAVING ws + 3600 <= m.met - 7200""".stripMargin,
    // plain interval self-join at microsecond precision (both engines
    // truncate ns→us identically; 1 hour = 3 600 000 000 us)
    "q56_stream_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  epoch_us(c.ts) AS click_us,
        |  v.event_id AS view_id, epoch_us(v.ts) AS view_us,
        |  v.value AS view_value
        |FROM events c JOIN events v ON v.user_id = c.user_id
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |  AND epoch_us(v.ts) <= epoch_us(c.ts)
        |  AND epoch_us(v.ts) >= epoch_us(c.ts) - 3600000000""".stripMargin,
    "q24_continuous_hist" ->
      """WITH b AS (
        |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |  FROM lineitem)
        |SELECT least(cast(floor((l_extendedprice - lo) / ((hi - lo) / 20)) AS bigint), 19) AS bin,
        | count(*) AS cnt,
        | round(count(*) / (sum(count(*)) OVER ()), 6) AS freq
        |FROM lineitem, b
        |WHERE l_extendedprice IS NOT NULL
        |  AND l_extendedprice >= lo AND l_extendedprice <= hi
        |GROUP BY 1""".stripMargin,
    "q17_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        | round(avg(value), 4) AS avg_value,
        | round(avg(cast(json_extract_string(props, '$.k') AS bigint)), 4) AS avg_k,
        | max(cast(json_extract_string(props, '$.k') AS bigint)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    // chunk i covers tokens [i·24, i·24+32); chunk count = the first
    // window reaching the end (same arithmetic as CorpusPrep)
    "q26_chunking" -> ChunkingOracleSql,
    // native path, same window arithmetic → same oracle
    "q41_native_chunking" -> ChunkingOracleSql,
    // The view side is deduped to one row per (user_id, ts) — the max
    // (event_id, value) tuple, mirroring asofJoin's max-payload-struct
    // tie-break — because native ASOF JOIN leaves the choice among
    // equal-timestamp matches unspecified. Testdata has no such ties
    // today; this keeps the oracle deterministic if it ever does.
    "q27_asof_join" ->
      """SELECT l.event_id, l.user_id,
        | coalesce(r.event_id, -1) AS prior_view_id,
        | round(coalesce(r.value, 0.0), 4) AS prior_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC, value DESC) AS __rn
        |    FROM events WHERE event_type = 'view') WHERE __rn = 1) r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    // CASE-pivot replay; hour boundaries are whole microseconds, so the
    // ns→us truncation in DuckDB's timestamp read cannot flip a bucket
    "q51_pivot" -> {
      val cols = Seq("view", "click", "purchase", "signup", "error").map { tp =>
        s"""  CAST(count(CASE WHEN event_type = '$tp' THEN 1 END) AS BIGINT) AS ${tp}_n,
           |  round(coalesce(sum(CASE WHEN event_type = '$tp' THEN value END), 0.0), 4) AS ${tp}_val""".stripMargin
      }.mkString(",\n")
      s"""SELECT (epoch_ns(ts) // 3600000000000) % 24 AS hour_utc,
         |$cols
         |FROM events GROUP BY 1""".stripMargin
    },
    // integer-cents window sums (exact regardless of engine-internal
    // accumulation order), same (date, key) tie-break, same frames
    "q50_running_totals" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS n_so_far,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS last3_cents,
        |  coalesce(epoch_ms(o_orderdate) - lag(epoch_ms(o_orderdate)) OVER w, -1) AS gap_ms
        |FROM (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    // identical planted snapshot; null-safe per-column comparison via
    // IS NOT DISTINCT FROM; presence from the join sides (keys non-null)
    "q49_table_diff" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        |n AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |j AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
        |           OR NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
        |           THEN 'changed'
        |         ELSE 'unchanged' END AS diff_status
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT diff_status, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM j GROUP BY diff_status""".stripMargin,
    // the same rule patterns verbatim (Java ∩ RE2 subset), same
    // application order, same planted snippets
    "q48_pii_redaction" -> {
      val rs = graft.llm.TextAnalysis.defaultRedactions
      val redactExpr = rs.foldLeft("text") { (acc, r) =>
        s"regexp_replace($acc, '${r.pattern}', '${r.replacement}', 'g')"
      }
      // counts are progressive (rule i counted after rules 0..i-1
      // replaced), matching TextAnalysis.redactionCounts
      val countCols = rs.indices.map { i =>
        val prior = rs.take(i).foldLeft("text") { (acc, r) =>
          s"regexp_replace($acc, '${r.pattern}', '${r.replacement}', 'g')"
        }
        s"CAST(len(regexp_extract_all($prior, '${rs(i).pattern}')) AS BIGINT) AS n_${rs(i).name}"
      }.mkString(",\n  ")
      s"""WITH p AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0 THEN ''
         |            ELSE ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' END
         |    || CASE WHEN doc_id % 4 = 0 THEN ''
         |            ELSE ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' END
         |    || CASE WHEN doc_id % 5 = 0 THEN ''
         |            ELSE ' tel +1 555 010 ' || CAST(1000 + doc_id % 9000 AS VARCHAR) END
         |    || ' end' AS text
         |  FROM documents)
         |SELECT doc_id, $redactExpr AS redacted,
         |  $countCols
         |FROM p""".stripMargin
    },
    // same digest recipe and threshold strings as the Spark when-chain
    "q47_hash_split" ->
      s"""SELECT CASE
         |    WHEN md5(CAST(doc_id AS VARCHAR) || '|' || 'split1')
         |         < '${graft.operators.Ops.hashThresholdHex(0.8)}' THEN 'train'
         |    WHEN md5(CAST(doc_id AS VARCHAR) || '|' || 'split1')
         |         < '${graft.operators.Ops.hashThresholdHex(0.8 + 0.1)}' THEN 'val'
         |    ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents GROUP BY 1""".stripMargin,
    "q46_heavy_hitters" ->
      """SELECT t AS token, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                t -> len(t) > 0)) AS t
        |  FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q45_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS n_rows,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q54_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q55_salted_join" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q57_semi_anti" ->
      """SELECT c_nationkey, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_bal, 'active' AS segment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_nationkey
        |UNION ALL
        |SELECT c_nationkey, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_bal, 'inactive' AS segment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_nationkey""".stripMargin,
    // identical Efraimidis–Spirakis arithmetic: same digest, same 60-bit
    // uniform, same -ln(u)/w key, same (key, id) tie order
    "q58_weighted_sample" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT *,
        |    -ln((('0x' || substr(md5(
        |        CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
        |          || '|' || 'q58'), 1, 15))::UBIGINT + 1.0)
        |        / 1152921504606846976.0) / l_quantity AS wkey,
        |    CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS wid
        |  FROM lineitem WHERE l_quantity > 0)
        |ORDER BY wkey, wid LIMIT 100""".stripMargin,
    "q59_topk_groups" ->
      """SELECT c_nationkey, CAST(rnk AS BIGINT) AS rank, c_custkey, c_acctbal
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY c_nationkey
        |          ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |      FROM customer)
        |WHERE rnk <= 3""".stripMargin,
    // identical BM25 program: same tokenization as the chunking oracle,
    // idf = ln(1 + (N-df+.5)/(df+.5)), numerator (1.2 + 1.0) written as
    // the same float op Scala performs (the literal 2.2 is a DIFFERENT
    // double), operation nesting mirrored term by term
    "q44_bm25" -> {
      val tfs = Seq("dup" -> 0, "join" -> 1, "scan" -> 2)
      val tfCols = tfs.map { case (term, i) =>
        s"CAST(len(list_filter(toks, t -> t = '$term')) AS DOUBLE) AS tf$i"
      }.mkString(",\n    ")
      val dfCols = tfs.map { case (_, i) =>
        s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i"
      }.mkString(", ")
      val scoreTerms = tfs.map { case (_, i) =>
        s"ln((s.n - s.df$i + 0.5)/(s.df$i + 0.5) + 1.0) * f.tf$i * (1.2 + 1.0) / " +
          s"(f.tf$i + 1.2*(0.25 + 0.75*f.dl/s.avgdl))"
      }.mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |                t -> len(t) > 0) AS toks
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         |    $tfCols
         |  FROM d),
         |s AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl, $dfCols
         |  FROM f)
         |SELECT f.doc_id, CAST(f.dl AS BIGINT) AS n_tokens,
         |  round($scoreTerms, 4) AS bm25
         |FROM f, s WHERE f.tf0 > 0 OR f.tf1 > 0 OR f.tf2 > 0""".stripMargin
    },
    // identical session program: epoch_us both sides, same tie-break,
    // same 30-min gap in micros
    "q43_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |              OR ts_us - lag(ts_us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |t AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts_us) AS session_start,
        |  max(ts_us) AS session_end
        |FROM t GROUP BY user_id, session_id""".stripMargin,
    // thresholds interpolated from the SAME function the Spark predicate
    // uses — the oracle runs the identical md5-vs-hex comparison
    // (digest recipe: md5(id || '|' || salt), Ops.hashDigestCol)
    "q28_mixture_sample" ->
      s"""SELECT doc_id, source, lang FROM documents
         |WHERE md5(CAST(doc_id AS VARCHAR) || '|' || 'mix1') <
         |  CASE source
         |    WHEN 'src0' THEN '${graft.operators.Ops.hashThresholdHex(1.0)}'
         |    WHEN 'src1' THEN '${graft.operators.Ops.hashThresholdHex(0.5)}'
         |    WHEN 'src2' THEN '${graft.operators.Ops.hashThresholdHex(0.25)}'
         |    WHEN 'src3' THEN '${graft.operators.Ops.hashThresholdHex(0.1)}'
         |    ELSE '${graft.operators.Ops.hashThresholdHex(0.05)}' END""".stripMargin,
    "q29_range_join" ->
      """SELECT band, count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 25.0), ('high', 25.0, 1e9))
        |  b(band, lo, hi)
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band""".stripMargin,
    "q30_psi" ->
      """WITH h1 AS (
        |  SELECT l_returnflag AS bin,
        |         count(*) / (sum(count(*)) OVER ()) AS p1
        |  FROM lineitem GROUP BY 1),
        |h2 AS (
        |  SELECT l_linestatus AS bin,
        |         count(*) / (sum(count(*)) OVER ()) AS p2
        |  FROM lineitem GROUP BY 1)
        |SELECT round(sum(
        |    (greatest(coalesce(p1, 0), 1e-6) - greatest(coalesce(p2, 0), 1e-6))
        |  * ln(greatest(coalesce(p1, 0), 1e-6) / greatest(coalesce(p2, 0), 1e-6))), 6) AS psi
        |FROM h1 FULL OUTER JOIN h2 USING (bin)""".stripMargin,
    "q36_supplier_region" ->
      """SELECT r_name, count(*) AS n_suppliers,
        | round(avg(s_acctbal), 4) AS avg_acctbal,
        | round(max(s_acctbal), 2) AS max_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q37_part_brands" ->
      """SELECT p_brand, CAST(floor(p_size / 10) * 10 AS BIGINT) AS size_band,
        | count(*) AS n_parts,
        | round(avg(p_retailprice), 4) AS avg_retail
        |FROM part GROUP BY 1, 2""".stripMargin,
    "q35_profile" ->
      """SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val FROM (
        |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_val, CAST(max(o_orderkey) AS VARCHAR) AS max_val
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderstatus),
        |    min(o_orderstatus), max(o_orderstatus)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*),
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderpriority),
        |    min(o_orderpriority), max(o_orderpriority)
        |  FROM orders)""".stripMargin,
    "q34_quantiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q33_jsd" ->
      """WITH h1 AS (
        |  SELECT l_returnflag AS bin,
        |         count(*) / (sum(count(*)) OVER ()) AS p1
        |  FROM lineitem GROUP BY 1),
        |h2 AS (
        |  SELECT l_linestatus AS bin,
        |         count(*) / (sum(count(*)) OVER ()) AS p2
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT coalesce(p1, 0) AS p1, coalesce(p2, 0) AS p2,
        |         (coalesce(p1, 0) + coalesce(p2, 0)) / 2 AS m
        |  FROM h1 FULL OUTER JOIN h2 USING (bin))
        |SELECT round(sum(
        |    (CASE WHEN p1 > 0 THEN p1 * ln(p1 / m) ELSE 0 END) / 2
        |  + (CASE WHEN p2 > 0 THEN p2 * ln(p2 / m) ELSE 0 END) / 2), 6) AS jsd
        |FROM j""".stripMargin,
    "q31_ks" ->
      """WITH b AS (
        |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
        |pairs AS (
        |  SELECT 1 AS side, l_extendedprice AS x FROM lineitem
        |  UNION ALL
        |  SELECT 2 AS side, l_extendedprice * (1 - l_discount) AS x FROM lineitem),
        |binned AS (
        |  SELECT side, least(CAST(floor((x - lo) / ((hi - lo) / 20)) AS BIGINT), 19) AS bin
        |  FROM pairs, b WHERE x IS NOT NULL AND x >= lo AND x <= hi),
        |freqs AS (
        |  SELECT side, bin,
        |         count(*) / (sum(count(*)) OVER (PARTITION BY side)) AS p
        |  FROM binned GROUP BY side, bin),
        |piv AS (
        |  SELECT bin,
        |         coalesce(sum(CASE WHEN side = 1 THEN p END), 0) AS p1,
        |         coalesce(sum(CASE WHEN side = 2 THEN p END), 0) AS p2
        |  FROM freqs GROUP BY bin),
        |cdf AS (
        |  SELECT sum(p1) OVER (ORDER BY bin) AS c1,
        |         sum(p2) OVER (ORDER BY bin) AS c2
        |  FROM piv)
        |SELECT round(max(abs(c1 - c2)), 6) AS ks FROM cdf""".stripMargin,
  )
}
