package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus preparation for LLM training (north-star extension, SURVEY.md
  * §7.6): turning a curated document table into training-ready rows —
  * fixed-size chunking and weighted mixture sampling.
  *
  * Both are pure per-row column programs (chunking adds one explode):
  * no shuffle, no UDFs, no driver involvement — they run at parquet-scan
  * speed and compose with any upstream filter/dedup stage.
  */
object CorpusPrep {

  /** Split each document into fixed-size overlapping token-window
    * chunks — the standard context-window packing step before
    * tokenization. Chunk `i` covers whitespace tokens
    * `[i·step, i·step + chunkSize)` with `step = chunkSize − overlap`;
    * the last chunk is the first one whose window reaches the document
    * end (so every token appears in ≥ 1 chunk and no start index runs
    * past the end). Documents with zero tokens produce zero chunks.
    *
    * Output: input id column + `chunk_id` (0-based), `chunk_text`,
    * `chunk_tokens` (size of the possibly-short final window).
    *
    * Scale shape: tokenize → compute chunk starts → posexplode. A pure
    * map with bounded fan-out (≤ len/step rows per doc), no shuffle;
    * the explode happens AFTER any pushed-down document filter. */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    // raw whitespace tokens — chunking must preserve case/punctuation
    // (unlike Dedup.tokens, which lowercases for matching)
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val sz = size(col("__toks"))
    // last chunk start L = step·ceil((sz − chunkSize)/step), clamped ≥ 0
    val nChunks = (ceil(greatest(sz - chunkSize, lit(0)).cast("double") / step) + 1).cast("int")
    val starts = when(sz <= 0, array().cast("array<int>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1), i => i * step))
    val window = slice(col("__toks"), col("__start") + 1, lit(chunkSize))
    df.withColumn("__toks", toks)
      .withColumn("__starts", starts)
      // posexplode drops zero-token documents (empty starts array)
      .select(col(idCol), col("__toks"),
        posexplode(col("__starts")).as(Seq("chunk_id", "__start")))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        array_join(window, " ").as("chunk_text"),
        size(window).cast("long").as("chunk_tokens"))
  }

  /** [[chunkByTokens]] through the one-pass native expression
    * (`graft_chunks`): identical output — same window arithmetic, same
    * ASCII `\s+` tokenization, same single-space join; spec-pinned
    * bit-parity and the same q26 oracle verifies it hash-exactly (q41).
    * The HOF form allocates a token array per document and re-joins it
    * per chunk; this one finds byte boundaries in a single scan and
    * copies byte ranges, so corpus prep stays parquet-scan-bound. The
    * HOF form above remains the readable reference. */
  def chunkByTokensFast(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      overlap: Int = 16,
      keepCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: keepCols.map(col) :+
      posexplode(graft.functions.GraftFunctions.chunks(col(textCol), chunkSize, overlap))
        .as(Seq("chunk_id", "__c")): _*)
      .select(col(idCol) +: keepCols.map(col) :+
        col("chunk_id").cast("long").as("chunk_id") :+
        col("__c.chunk_text").as("chunk_text") :+
        col("__c.chunk_tokens").cast("long").as("chunk_tokens"): _*)

  /** Chunk to a model's REAL context window: greedy-pack whitespace
    * tokens until the chunk's BPE subword count (under the merge table
    * at `mergesPath` — see [[graft.functions.BpeVocab]]) would exceed
    * `bpeBudget`. The existing chunkers cut at a fixed WHITESPACE-token
    * width, but a context window is a SUBWORD budget — a 32-whitespace-
    * token chunk can be 10–80 BPE tokens, so fixed-width chunks either
    * waste window or overflow it.
    *
    * Output rows: id + keepCols + `chunk_id`, `chunk_text`,
    * `chunk_tokens` (whitespace), `chunk_bpe_tokens` (subword count the
    * budget applies to). A single token over the budget forms its own
    * over-budget chunk rather than being dropped — filter
    * `chunk_bpe_tokens <= budget` downstream for hard enforcement.
    * `overlap` is in whitespace tokens, like the other chunkers.
    *
    * Same scale shape as [[chunkByTokensFast]]: one native-expression
    * scan + posexplode, no shuffle; the merge table loads once per
    * executor JVM. */
  /** `vocabPath` set = the budget (and `chunk_bpe_tokens`) count token
    * IDS under that vocab — `size(graft_bpe_encode(chunk_text))` units —
    * instead of segments. The honest budget when the vocab has byte
    * fallback: an unseen segment encodes to its UTF-8 byte count of
    * ids, so a segment-counted chunk could silently exceed the context
    * window it was sized for. */
  def chunkByBpeBudget(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bpeBudget: Int,
      mergesPath: String,
      overlap: Int = 0,
      keepCols: Seq[String] = Nil,
      vocabPath: Option[String] = None): DataFrame =
    df.select(col(idCol) +: keepCols.map(col) :+
      posexplode(graft.functions.GraftFunctions.bpeChunks(
        col(textCol), mergesPath, bpeBudget, overlap, vocabPath.getOrElse("")))
        .as(Seq("chunk_id", "__c")): _*)
      .select(col(idCol) +: keepCols.map(col) :+
        col("chunk_id").cast("long").as("chunk_id") :+
        col("__c.chunk_text").as("chunk_text") :+
        col("__c.chunk_tokens").cast("long").as("chunk_tokens") :+
        col("__c.chunk_bpe_tokens").cast("long").as("chunk_bpe_tokens"): _*)

  /** [[chunkByBpeBudget]] under the UNIGRAM tokenizer
    * (`graft_unigram_chunks`): budgets and `chunk_bpe_tokens` count
    * unigram ids — exactly what `graft_unigram_encode` of `chunk_text`
    * emits, so budget-sized chunks never overflow the context window
    * the exported ids are sized for. Same struct and same whitespace-
    * boundary cuts as the BPE families (the chunkers are drop-in
    * interchangeable downstream), same 100 TB shape: one scan-speed
    * projection, no shuffle. */
  def chunkByUnigramBudget(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      modelPath: String,
      overlap: Int = 0,
      keepCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: keepCols.map(col) :+
      posexplode(graft.functions.GraftFunctions.unigramChunks(
        col(textCol), modelPath, budget, overlap))
        .as(Seq("chunk_id", "__c")): _*)
      .select(col(idCol) +: keepCols.map(col) :+
        col("chunk_id").cast("long").as("chunk_id") :+
        col("__c.chunk_text").as("chunk_text") :+
        col("__c.chunk_tokens").cast("long").as("chunk_tokens") :+
        col("__c.chunk_bpe_tokens").cast("long").as("chunk_bpe_tokens"): _*)

  /** [[chunkByBpeBudget]] under the BYTE-LEVEL tokenizer
    * (`graft_bpe_byte_chunks`): budgets and `chunk_bpe_tokens` count
    * byte-level ids, cuts land on pretoken boundaries, and with
    * overlap 0 the chunk texts concatenate back to the document
    * byte-for-byte — so downstream byte-level `token_ids` encoding of
    * `chunk_text` emits exactly the budget each chunk was sized under.
    * `chunk_tokens` counts pretokens. Same 100 TB shape: one
    * scan-speed projection, no shuffle. */
  def chunkByByteBudget(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bpeBudget: Int,
      mergesPath: String,
      overlap: Int = 0,
      keepCols: Seq[String] = Nil,
      specials: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: keepCols.map(col) :+
      posexplode(graft.functions.GraftFunctions.bpeByteChunks(
        col(textCol), mergesPath, bpeBudget, overlap, specials))
        .as(Seq("chunk_id", "__c")): _*)
      .select(col(idCol) +: keepCols.map(col) :+
        col("chunk_id").cast("long").as("chunk_id") :+
        col("__c.chunk_text").as("chunk_text") :+
        col("__c.chunk_tokens").cast("long").as("chunk_tokens") :+
        col("__c.chunk_bpe_tokens").cast("long").as("chunk_bpe_tokens"): _*)

  /** Sequence packing: assign every chunk to a fixed-token-budget
    * training sequence — the step between chunking and batch
    * construction (training rows are SEQUENCES of budget tokens, not
    * raw chunks; packing several short chunks per sequence is what
    * keeps the context window dense).
    *
    * Offset binning, fully declarative: chunks are bucketed by
    * `pmod(idCol, buckets)`, totally ordered inside each bucket by
    * `orderCols`, and a chunk starts a new sequence when its START
    * offset (running token sum minus its own tokens) crosses a budget
    * boundary — `seq = floor(startOffset / budget)`. A chunk
    * straddling the boundary stays with the sequence it started in, so
    * a sequence's total can exceed the budget by at most
    * `max(chunkTokens) − 1`; pre-filter over-budget chunks for hard
    * caps. `seq_id = bucket · 2^40 + seq` is stable and dense per
    * bucket; a bucket overflowing 2^40 sequences (≥ 2^40·budget tokens
    * in ONE bucket — raise `buckets` long before that) fails loudly
    * via `raise_error` instead of silently aliasing into the next
    * bucket's id space.
    *
    * 100 TB shape: ONE shuffle on the bucket key and one running-sum
    * window per bucket — no global ordering, no driver involvement
    * (a single global window would serialize the corpus through one
    * partition; with `buckets` ≈ cluster parallelism the only waste is
    * ≤ 1 partial sequence per bucket). Deterministic given (idCol,
    * orderCols), so re-runs and engine swaps produce identical
    * packing — the q66 oracle replays it in SQL. */
  def packSequences(
      chunks: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      buckets: Int = 256,
      orderCols: Seq[String] = Nil, // default: (idCol, "chunk_id")
      seqCol: String = "seq_id"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0 && buckets <= (1 << 20), s"buckets must be in [1, 2^20], got $buckets")
    require(!chunks.columns.contains(seqCol), s"column $seqCol already exists")
    val order = if (orderCols.nonEmpty) orderCols else Seq(idCol, "chunk_id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__bucket").orderBy(order.map(col): _*)
    val seq0 = floor((col("__cum") - col(tokenCol)) / lit(budget)).cast("long")
    chunks
      .withColumn("__bucket", pmod(col(idCol), lit(buckets.toLong)))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn(seqCol,
        col("__bucket") * lit(1L << 40) +
          // loud failure beats silent cross-bucket id aliasing; the
          // branch is codegen'd and free until a bucket actually holds
          // ≥ 2^40 sequences
          when(seq0 >= lit(1L << 40),
            raise_error(lit(s"packSequences: bucket overflowed 2^40 sequences " +
              s"(budget=$budget, buckets=$buckets) — raise `buckets`")))
            .otherwise(seq0).cast("long"))
      .drop("__bucket", "__cum")
  }

  /** Assemble packed chunks into one training row per sequence:
    * `(seqCol, seq_text, n_chunks, seq_tokens)`. Chunks concatenate in
    * `orderCols` order — enforced via `sort_array(collect_list(struct))`
    * because `collect_list` alone has NO cross-partition order
    * guarantee (the classic silent-corruption trap in assembly jobs).
    * One shuffle on the sequence id; per-group state is bounded by the
    * pack budget, so buffers stay small no matter the corpus size. */
  def assembleSequences(
      packed: DataFrame,
      seqCol: String = "seq_id",
      textCol: String = "chunk_text",
      tokenCol: String = "chunk_tokens",
      orderCols: Seq[String] = Seq("doc_id", "chunk_id"),
      sep: String = " "): DataFrame = {
    val ordered = sort_array(collect_list(
      struct(orderCols.map(col) :+ col(textCol).as("__t"): _*)))
    packed.groupBy(col(seqCol))
      .agg(
        concat_ws(sep, transform(ordered, s => s.getField("__t"))).as("seq_text"),
        count(lit(1)).as("n_chunks"),
        sum(col(tokenCol)).as("seq_tokens"))
  }

  /** Pack per-document token-id arrays into FIXED-LENGTH training
    * sequences with an `eosId` separator after every document — the
    * contract an actual trainer consumes (GPT-2-style packing: documents
    * CROSS sequence boundaries; nothing is padded or dropped except the
    * one partial tail sequence per bucket, which is emitted with
    * `n_tokens < seqLen` for the consumer to keep or drop).
    *
    * Output, one row per sequence:
    *  - `seq_id` — `bucket·2^40 + window` (the [[packSequences]] id
    *    layout, same overflow guard);
    *  - `input_ids array<int>` — exactly `seqLen` ids (except the tail);
    *  - `n_tokens` — `size(input_ids)`;
    *  - `doc_boundaries array<int>` — offsets in `[0, seqLen)` where a
    *    document STARTS (the attention-masking contract: a sequence that
    *    begins mid-document has no 0 entry); consecutive boundaries
    *    differ by that document's id count + 1 (its EOS), so the
    *    boundary arithmetic re-derives per-doc token counts — the
    *    property CorpusPrepSpec pins;
    *  - `n_docs_started` — `size(doc_boundaries)`.
    *
    * Scale shape (the [[packSequences]] recipe): ids are laid into one
    * conceptual token stream PER BUCKET (`pmod(idCol, buckets)`), with
    * one bounded window per bucket over `orderCols` (default `idCol`) —
    * no global ordering, no driver involvement. Each document explodes
    * into the ≤ `n/seqLen + 1` sequence windows it touches and ships
    * only the `slice` of its ids inside each window; the group state per
    * sequence is bounded by `seqLen` tokens regardless of corpus size.
    * Deterministic given (idCol, orderCols) — re-runs and engine swaps
    * produce identical sequences, which is what lets a DuckDB oracle
    * replay the whole concatenation arithmetic (q110). */
  /** `partitionCols` (e.g. the train/val/test split label): each value
    * combination packs its OWN per-bucket streams and the columns ride
    * every output row — documents from different partitions never share
    * a sequence (the eval-contamination guarantee packing must not
    * silently break). `seq_id` is unique only WITHIN a partition-column
    * combination; consumers group by the carried columns anyway. */
  def packTokenIds(
      docs: DataFrame,
      idCol: String,
      idsCol: String,
      seqLen: Int,
      eosId: Int,
      buckets: Int = 256,
      orderCols: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(eosId >= 0, s"eosId must be non-negative, got $eosId")
    require(buckets > 0 && buckets <= (1 << 20), s"buckets must be in [1, 2^20], got $buckets")
    // bucketing is pmod on the id itself (deterministic AND replayable
    // in any engine — a hash bucket would be engine-specific); that
    // needs an integral id, and an implicit string→numeric cast would
    // silently null out the bucket instead
    require(docs.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.ShortType => true
      case _ => false
    }, s"packTokenIds needs an integral $idCol (got " +
      s"${docs.schema(idCol).dataType.simpleString}) — derive a numeric " +
      "surrogate id upstream")
    val order = if (orderCols.nonEmpty) orderCols else Seq(idCol)
    import org.apache.spark.sql.expressions.Window
    val pc = partitionCols.map(col)
    val w = Window.partitionBy(pc :+ col("__bucket"): _*)
      .orderBy(order.map(col): _*)
    val L = lit(seqLen.toLong)
    val withStream = docs
      .withColumn("__ids",
        when(col(idsCol).isNull || exists(col(idsCol), x => x.isNull),
          raise_error(lit(s"packTokenIds: null $idsCol array or null id " +
            "element — filter or encode upstream")))
          .otherwise(concat(col(idsCol), array(lit(eosId)))))
      .withColumn("__n", size(col("__ids")).cast("long"))
      .withColumn("__bucket", pmod(col(idCol), lit(buckets.toLong)))
      .withColumn("__cum", sum(col("__n")).over(w))
      // duplicate order keys would be SILENT corruption: the RANGE
      // cumulative frame gives tied rows one shared __cum, so their
      // streams overlap and sequences assemble over-long. The guard
      // lags the ORDER KEY itself and rides __start so Catalyst cannot
      // prune it; the lag frame differs from the cumulative frame, so
      // Spark plans a second Window PASS, but both share the single
      // Exchange+Sort — no extra shuffle (plan-verified).
      .withColumn("__start",
        col("__cum") - col("__n") +
          when(lag(struct(order.map(col): _*), 1).over(w) ===
              struct(order.map(col): _*),
            raise_error(lit(s"packTokenIds: duplicate order key under " +
              s"(${order.mkString(", ")}) — stream positions would overlap; " +
              "add a disambiguating column (chunk_id, epoch) to orderCols")))
            .otherwise(lit(0L)))
    // sequence windows this doc touches: floor(start/L) .. floor((cum-1)/L)
    val exploded = withStream
      .withColumn("__s", explode(sequence(
        floor(col("__start") / L), floor((col("__cum") - 1) / L))))
      .withColumn("__from", col("__s") * L)
      // local slice of this doc's ids that falls inside the window
      .withColumn("__off", greatest(col("__from") - col("__start"), lit(0L)))
      .withColumn("__take",
        least(col("__n"), (col("__s") + 1) * L - col("__start")) - col("__off"))
      .withColumn("__pos", greatest(col("__start") - col("__from"), lit(0L)))
      .withColumn("__slice",
        slice(col("__ids"), (col("__off") + 1).cast("int"), col("__take").cast("int")))
      .withColumn("__is_start", (col("__start") >= col("__from")).cast("int"))
    // one shuffle on (bucket, window); docs tile a sequence at disjoint
    // __pos, so the sort key is unique and assembly order deterministic
    val ordered = sort_array(collect_list(struct(
      col("__pos"), col("__is_start"), col("__slice"))))
    val seq0 = col("__s")
    exploded
      .groupBy(pc ++ Seq(col("__bucket"), col("__s")): _*)
      .agg(ordered.as("__parts"))
      .select(pc ++ Seq(
        (col("__bucket") * lit(1L << 40) +
          when(seq0 >= lit(1L << 40),
            raise_error(lit(s"packTokenIds: bucket overflowed 2^40 sequences " +
              s"(seqLen=$seqLen, buckets=$buckets) — raise `buckets`")))
            .otherwise(seq0)).cast("long").as("seq_id"),
        flatten(transform(col("__parts"), p => p.getField("__slice"))).as("input_ids"),
        transform(filter(col("__parts"), p => p.getField("__is_start") === 1),
          p => p.getField("__pos").cast("int")).as("doc_boundaries")): _*)
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
      .withColumn("n_docs_started", size(col("doc_boundaries")).cast("long"))
  }

  /** One-row observability report for a [[packTokenIds]] output — the
    * packed-export analog of [[packingReport]]: sequence/full/partial
    * counts, packed tokens vs `n_sequences × seqLen` capacity (the
    * only waste packing can have is the ≤ 1 partial tail per bucket —
    * docs cross boundaries, nothing pads), and docs-started totals.
    * Integer arithmetic plus two final divisions → engine-portable
    * (the q111 oracle replays it over the q110 packing replay). */
  /** Padded PER-EXAMPLE token export — the SFT/finetuning trainer
    * contract, the alternative to [[packTokenIds]]'s cross-doc stream
    * packing: every input row becomes exactly ONE fixed-length
    * sequence (its ids, the separator, then `padId` up to `seqLen`).
    * Rows whose ids overflow `seqLen − 1` TRUNCATE — the separator
    * still terminates the kept prefix — and set `truncated`; size the
    * upstream chunker budget at `seqLen − 1` to avoid truncation
    * entirely. Example-level columns (labels, split, epoch, chunk_id)
    * ride along untouched because the row is never re-assembled.
    *
    * Scale shape: a pure projection — ZERO shuffle (stream packing
    * pays one bounded (bucket, window) shuffle; padding pays none).
    * Emits the same `input_ids` / `n_tokens` / `n_docs_started`
    * columns [[packedIdsReport]] consumes (`n_docs_started` = 1: each
    * sequence IS one example), so the efficiency report reads padding
    * waste directly. */
  def padTokenIds(
      docs: DataFrame,
      idsCol: String,
      seqLen: Int,
      eosId: Int,
      padId: Int): DataFrame = {
    require(seqLen > 1, s"seqLen must be > 1 (ids + separator), got $seqLen")
    require(eosId >= 0, s"eosId must be non-negative, got $eosId")
    require(padId >= 0, s"padId must be non-negative, got $padId")
    docs
      .withColumn("__body",
        when(col(idsCol).isNull || exists(col(idsCol), x => x.isNull),
          raise_error(lit(s"padTokenIds: null $idsCol array or null id " +
            "element — filter or encode upstream")))
          .otherwise(slice(col(idsCol), 1, seqLen - 1)))
      .withColumn("n_tokens", (size(col("__body")) + 1).cast("long"))
      .withColumn("input_ids",
        concat(col("__body"), array(lit(eosId)),
          array_repeat(lit(padId), lit(seqLen) - col("n_tokens").cast("int"))))
      .withColumn("truncated", size(col(idsCol)) > seqLen - 1)
      .withColumn("n_docs_started", lit(1L))
      .drop("__body")
  }

  def packedIdsReport(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    packed.agg(
      count(lit(1)).cast("long").as("n_sequences"),
      count(when(col("n_tokens") === seqLen, 1)).cast("long").as("n_full"),
      count(when(col("n_tokens") =!= seqLen, 1)).cast("long").as("n_partial"),
      sum("n_tokens").cast("long").as("tokens_packed"),
      (count(lit(1)) * seqLen).cast("long").as("capacity_tokens"),
      round(sum("n_tokens") / (count(lit(1)) * lit(seqLen.toDouble)), 6)
        .as("efficiency"),
      sum("n_docs_started").cast("long").as("n_docs_started"),
      round(sum("n_docs_started") / count(lit(1)).cast("double"), 6)
        .as("avg_docs_per_seq"))
  }

  /** Packing-efficiency report for a [[packSequences]] output — makes
    * the packer's density claims OBSERVABLE on a real corpus instead of
    * asserted in prose: one row with sequence/chunk/token totals,
    * `efficiency` = tokens packed / (sequences × budget), and the
    * underfull/overfull split.
    *
    * Invariant this surfaces (and the spec pins): offset-bin packing
    * tiles each bucket's token offset space, so a non-final bin spans
    * at least `budget − maxChunk + 1` tokens (a boundary-straddling
    * chunk can push the next bin's start up to maxChunk−1 tokens past
    * the boundary, no further). DEEP-underfull sequences — below that
    * structural floor — are therefore bounded by ONE PER BUCKET
    * (`max_deep_underfull_per_bucket ≤ 1`): waste is O(buckets ×
    * budget) regardless of corpus size. `n_underfull` (below budget)
    * is informational; overfull sequences are straddling chunks (a
    * chunk is never split), not an error — their count calibrates the
    * chunk-size/budget ratio.
    *
    * Shape: one shuffle on the sequence id (bounded groups), one on the
    * bucket id (≤ buckets rows), a 1-row broadcast of the global max
    * chunk size, then a single-row reduce — report cost is a rounding
    * error next to the packing itself. Integer arithmetic except the
    * one final division → engine-portable. */
  def packingReport(
      packed: DataFrame,
      budget: Int,
      seqCol: String = "seq_id",
      tokenCol: String = "chunk_tokens"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val mx = packed.agg(max(col(tokenCol)).as("__mx"))
    val perSeq = packed.groupBy(col(seqCol))
      .agg(sum(col(tokenCol)).as("__t"), count(lit(1)).as("__c"))
    // bucket = high 24 bits of the packed id (packSequences layout)
    val perBucket = perSeq
      .crossJoin(broadcast(mx))
      .withColumn("__bucket", floor(col(seqCol) / lit(1L << 40)).cast("long"))
      .groupBy("__bucket")
      .agg(
        count(lit(1)).as("__nseq"),
        sum("__c").as("__nchunk"),
        sum("__t").as("__tok"),
        count(when(col("__t") < budget, 1)).as("__under"),
        count(when(col("__t") < lit(budget) - col("__mx") + 1, 1)).as("__deep"),
        count(when(col("__t") > budget, 1)).as("__over"),
        max("__mx").as("__mx"))
    perBucket.agg(
      sum("__nseq").cast("long").as("n_sequences"),
      sum("__nchunk").cast("long").as("n_chunks"),
      sum("__tok").cast("long").as("tokens_packed"),
      (sum("__nseq") * budget).cast("long").as("budget_tokens"),
      round(sum("__tok") / (sum("__nseq") * lit(budget.toDouble)), 6).as("efficiency"),
      sum("__under").cast("long").as("n_underfull"),
      sum("__deep").cast("long").as("n_deep_underfull"),
      sum("__over").cast("long").as("n_overfull"),
      max("__deep").cast("long").as("max_deep_underfull_per_bucket"),
      max("__mx").cast("long").as("max_chunk_tokens"))
  }

  /** Deterministic train/val/test split: label every row with the name
    * of its split, by consecutive ranges of the SAME md5 digest space
    * deterministic sampling uses ([[graft.operators.Ops.hashDigestCol]]).
    * Splits are exhaustive and disjoint by construction (the last split
    * takes everything past the last threshold — no float-gap leakage);
    * membership is a pure function of (id, salt), so the assignment
    * survives repartitioning, retries, reruns, engine swaps — and
    * composes with [[graft.operators.Ops.hashSample]]: a hashSample
    * with the same salt NESTS inside the first split rather than
    * cutting across all of them.
    *
    * Leakage-safe GROUPED splits come free: pass the group key (a
    * canonical domain, a dedup cluster label) as `idCol` and every row
    * of a group lands in the same split — near-duplicates of one site
    * can never straddle train/test.
    *
    * At 100 TB this is a scan-speed projection (one md5 per row, CSE'd
    * across the branch comparisons); downstream filters on `splitCol`
    * stay plain predicates. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "hashSplit: at least two splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"hashSplit: duplicate split names in ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0.0), s"hashSplit: weights must be positive")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"hashSplit: weights must sum to 1.0, got $total")
    require(!df.columns.contains(splitCol),
      s"hashSplit: column $splitCol already exists")
    val digest = graft.operators.Ops.hashDigestCol(col(idCol), salt)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // when-chain over the cumulative thresholds; the final split is the
    // unconditional otherwise
    val label = splits.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        val cond = digest < lit(graft.operators.Ops.hashThresholdHex(cum))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }.get.otherwise(lit(splits.last._1))
    df.withColumn(splitCol, label)
  }

  /** Deterministic fill-in-the-middle (FIM) transformation — the
    * published infilling-pretraining recipe (Bavarian et al. 2022,
    * 2207.14255): split a document at two character positions into
    * (prefix, middle, suffix) and re-emit it with sentinel tokens so
    * the model learns to fill the middle from both sides. `mode`:
    *   - `psm` (the canonical form):
    *     `preTok ⧺ prefix ⧺ sufTok ⧺ suffix ⧺ midTok ⧺ middle`
    *   - `spm` (the paper's joint variant — suffix first, prefix moved
    *     after the middle sentinel, same sentinels so one model trains
    *     on both): `preTok ⧺ sufTok ⧺ suffix ⧺ midTok ⧺ prefix ⧺ middle`
    *
    * Everything is a pure function of (id, salt): the apply decision is
    * the shared md5 sampling predicate ([[graft.operators.Ops
    * .hashSamplePredicate]], `rate` of documents transformed — the
    * paper's fim_rate), and the two cut points are uniform draws over
    * `[0, length]` parsed from digest hex positions 17–21 and 22–26
    * (disjoint from the leading chars the rate threshold orders on).
    * So the transform is reproducible across retries/partitionings/
    * engines, composes with [[hashSplit]]/[[mixtureSample]] under
    * other salts, and is SQL-replayable end to end — the q146 gate
    * pins digest, cuts, and concatenation against DuckDB. Downstream,
    * the sentinels ride the tokenizer's protected special tokens
    * (`graft_bpe_encode_special`, the q127 surface), so they encode to
    * single ids and can never be split by merges.
    *
    * By construction `prefix ⧺ middle ⧺ suffix == text` (CorpusPrepSpec
    * pins it), empty/degenerate cuts are legal (a zero-length middle
    * still teaches end-of-span), and untransformed rows pass through
    * verbatim with `appliedCol = false`. One md5 per row, CSE'd across
    * predicate and cuts; scan-speed projection, no shuffle.
    *
    * Sharp edge (the same one every protected special carries, e.g.
    * `<|endoftext|>`): a document whose TEXT already contains a
    * sentinel spelling aliases the control — downstream encode emits
    * the control id for the in-text occurrence, and a parser cannot
    * tell the planted sentinel from the literal. Filter or rewrite
    * such documents upstream when the corpus may contain them (the
    * Curator's `fim-rate` stage counts and logs the collisions). */
  def fimTransform(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double,
      preTok: String = "<|fim_prefix|>",
      sufTok: String = "<|fim_suffix|>",
      midTok: String = "<|fim_middle|>",
      mode: String = "psm",
      salt: String = "fim",
      outCol: String = "fim_text",
      appliedCol: String = "fim_applied"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"fimTransform: rate must be in [0,1], got $rate")
    require(Set("psm", "spm")(mode), s"fimTransform: mode must be psm | spm, got '$mode'")
    require(Seq(preTok, sufTok, midTok).distinct.size == 3,
      s"fimTransform: sentinels must be distinct, got ($preTok, $sufTok, $midTok)")
    require(!df.columns.contains(outCol) && !df.columns.contains(appliedCol),
      s"fimTransform: output column $outCol/$appliedCol already exists")
    val t = col(textCol)
    val n = length(t)
    val digest = graft.operators.Ops.hashDigestCol(col(idCol), salt)
    // two independent 20-bit draws from the digest tail, uniform mod
    // (n+1) — 5 hex chars each keeps the modulo bias ≤ n/2^20
    def cut(pos: Int): Column =
      pmod(conv(substring(digest, pos, 5), 16, 10).cast("long"), n + 1)
    val (c1, c2) = (cut(17), cut(22))
    val (lo, hi) = (least(c1, c2), greatest(c1, c2))
    val prefix = t.substr(lit(1), lo)
    val middle = t.substr(lo + 1, hi - lo)
    val suffix = t.substr(hi + 1, n - hi)
    val transformed =
      if (mode == "psm")
        concat(lit(preTok), prefix, lit(sufTok), suffix, lit(midTok), middle)
      else
        concat(lit(preTok), lit(sufTok), suffix, lit(midTok), prefix, middle)
    // null text never claims `applied` (concat over null is null — a
    // consumer selecting applied rows must never receive null training
    // text); such rows pass through verbatim like unsampled ones
    val applied = graft.operators.Ops.hashSamplePredicate(col(idCol), rate, salt) &&
      t.isNotNull
    df.withColumn(appliedCol, applied)
      .withColumn(outCol, when(col(appliedCol), transformed).otherwise(t))
  }

  /** Weighted mixture sampling: keep a per-source deterministic fraction
    * of the corpus — how a training mix is composed ("20% of web, all of
    * books, 5% of logs") at 100 TB, where `rand()`-based sampling is
    * irreproducible across retries/partitionings (see
    * [[graft.operators.Ops.hashSamplePredicate]]).
    *
    * `weights` maps source values to keep-fractions; sources absent from
    * the map keep `defaultFraction`. The decision is a pure predicate of
    * (id, salt), so it pushes into the scan, and the same document set
    * is selected no matter how the corpus is partitioned or which
    * engine evaluates it. */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((weights.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "mixture fractions must be in [0,1]")
    // same digest recipe as Ops.hashSamplePredicate so mixture decisions
    // compose/nest with plain hashSample decisions for the same salt
    val digest = graft.operators.Ops.hashDigestCol(col(idCol), salt)
    // per-source threshold string (32-hex, lexicographic = numeric;
    // fraction 1.0 → "g", which sorts above every hex digest)
    def thr(f: Double): Column = lit(graft.operators.Ops.hashThresholdHex(f))
    val threshold = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (src, f)) => when(col(sourceCol) === src, thr(f)).otherwise(acc)
    }
    val effective = coalesce(threshold, thr(defaultFraction))
    df.filter(digest < effective)
  }

  /** Temperature-scaled domain mixing — the multilingual/multi-domain
    * sampling rule (sample domain s with probability ∝ n_s^alpha):
    * `alpha = 1` preserves the natural mix, `alpha = 0` equalizes
    * domains, values between damp the head without starving the tail.
    * Implemented as a per-domain keep-RATE ∝ n_s^(alpha-1), scaled so
    * the largest rate (the smallest domain when alpha < 1) equals
    * `budget` — budget = 1.0 keeps the rarest domain whole and
    * downsamples everything else toward the temperature target.
    *
    * Unlike [[mixtureSample]] (explicit per-source fractions), the rates
    * here are DERIVED from the observed domain counts: one tiny
    * groupBy(domain) aggregate (map-side partial — the shuffle carries
    * one row per domain per partition), broadcast back as a join, and
    * the per-row decision `u <= rate` uses the numeric unit uniform of
    * the shared sampling digest ([[graft.operators.Ops.hashUniform]]) —
    * stable across partitionings/retries/engines, and the q74 oracle
    * replays count→pow→least→compare verbatim in SQL. The corpus is
    * scanned twice (once for counts, once filtered) but never shuffled.
    *
    * Oracle caveat (the q58 class): cross-engine bit-parity assumes
    * `pow`/division round identically in both libms at the `u = rate`
    * boundary; the sample itself is valid under any exact-real
    * arithmetic — only the bit-replay is at stake. */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      alpha: Double,
      budget: Double = 1.0,
      salt: String = ""): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(budget > 0.0 && budget <= 1.0, s"budget must be in (0,1], got $budget")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", pow(col("__n"), lit(alpha - 1.0)))
    val maxw = counts.agg(max(col("__w")).as("__maxw"))
    val rates = counts.crossJoin(broadcast(maxw))
      .select(col(domainCol).as("__dom"),
        least(lit(1.0), lit(budget) * col("__w") / col("__maxw")).as("__rate"))
    // null-safe join: NULL-domain rows were counted in the rate
    // aggregate, so they must survive into the output too (the
    // keepTopQuantile convention)
    df.join(broadcast(rates), df(domainCol) <=> rates("__dom"))
      .filter(graft.operators.Ops.hashUniform(col(idCol), salt) <= col("__rate"))
      .select(df.columns.map(df(_)): _*)
  }

  /** Epoched mixture — the UP-sampling half of mix composition
    * ([[temperatureMix]] is the down-sampling half): per-group
    * repetition factors ("epochs"), the published training-mix recipe
    * (GPT-3 Table 2.2, Llama, Dolma) where weight `w_g > 1` repeats
    * group g's documents ~`w_g` times over a training run. Every
    * group-g doc appears `floor(w_g)` times, plus ONE more copy for
    * the deterministic hash-fraction `frac(w_g)` of the group's docs
    * — expected group multiplicity exactly `w_g`, and the per-doc
    * decision is a pure function of (id, salt): stable under
    * repartition/retry/rerun and replayable in any engine with md5
    * (the q102 oracle replays it verbatim). Copies carry
    * `epochCol` = 0..k−1; feed the epoch into the export shuffle salt
    * so a doc's epochs land far apart in the emitted order. Groups
    * absent from `weights` (including NULL groups) take
    * `defaultWeight`; weight 0 drops the group.
    *
    * Scale shape: the weight map is a config-sized when-chain of plan
    * literals — no join, no shuffle; per row one md5 (CSE'd with any
    * same-salt split/sample) and one sequence-explode of length
    * ≤ ceil(max w). Output rows = Σ_g ~w_g·|g| — the training set's
    * actual size, which no operator can avoid materializing. */
  def epochMix(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      salt: String = "",
      epochCol: String = "epoch"): DataFrame = {
    require(weights.values.forall(_ >= 0.0) && defaultWeight >= 0.0,
      "epochMix: weights must be >= 0")
    require(!df.columns.contains(epochCol),
      s"epochMix: column $epochCol already exists")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (g, wg)) =>
      when(col(groupCol) === lit(g), lit(wg)).otherwise(acc)
    }
    val copies = (floor(w) +
      when(graft.operators.Ops.hashUniform(col(idCol), salt) <= w - floor(w),
        lit(1.0)).otherwise(lit(0.0))).cast("long")
    df.withColumn("__epochs", copies)
      .filter(col("__epochs") > 0)
      .withColumn(epochCol, explode(sequence(lit(0L), col("__epochs") - 1)))
      .drop("__epochs")
  }

  /** Token-BUDGET mixture — the production mixing contract ("20 B web
    * tokens, 5 B code tokens"), where [[mixtureSample]]'s per-source
    * FRACTIONS are the wrong unit: a fraction keeps doc counts, but a
    * training mix is specified in tokens, and per-source document
    * length distributions differ. Per source, documents are taken in
    * the deterministic md5(id|salt) order (an unbiased reproducible
    * permutation — the [[hashSplit]]/[[deterministicShuffle]] digest)
    * until the cumulative `tokenCol` sum reaches the source's budget;
    * the first document CROSSING the budget is included (overshoot
    * bounded by one document — the documented rule, so a budget is
    * never silently underfilled by a long tail doc). Sources absent
    * from `budgets` keep everything (`-1` = unlimited) unless
    * `defaultBudget` says otherwise.
    *
    * Shape: ONE window (cumulative sum per source in digest order) —
    * a per-source sort, the exact-form cost. For 100 TB sources use
    * [[tokenBudgetMixByFraction]]: same digest, no window. The window
    * arithmetic is integer-only, so the q107 oracle replays it
    * verbatim. */
  def tokenBudgetMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = -1L,
      salt: String = ""): DataFrame = {
    require(budgets.values.forall(b => b >= 0L),
      "tokenBudgetMix: budgets must be >= 0 (use defaultBudget = -1 for unlimited)")
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (src, b)) => when(col(sourceCol) === lit(src), lit(b)).otherwise(acc)
    }
    val digest = graft.operators.Ops.hashDigestCol(col(idCol), salt)
    // explicit ROWS frame: the default RANGE frame makes duplicate
    // (digest, id) rows peers sharing one cumulative sum, which would
    // underfill the budget — and the q107 oracle is ROWS (review finding)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(digest, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("__budget", budget)
      .filter(col("__budget") < 0 ||
        col("__cum") - col(tokenCol) < col("__budget"))
      .drop("__cum", "__budget")
  }

  /** The SCALE form of [[tokenBudgetMix]]: derive each source's keep
    * fraction `f = min(1, budget / total_tokens)` from one tiny
    * groupBy(source) aggregate, then keep documents whose unit uniform
    * of the SAME digest is < f — a scan predicate, NO window, no
    * per-source sort. The selected token mass is approximate
    * (Binomial concentration: relative error ~1/sqrt(docs kept)), the
    * price of skipping the sort; the exact form remains the oracle
    * anchor. Budget semantics and digest match [[tokenBudgetMix]], so
    * switching forms changes WHICH docs are kept (threshold vs prefix
    * rule) but not the distributional contract. */
  def tokenBudgetMixByFraction(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = -1L,
      salt: String = ""): DataFrame = {
    require(budgets.values.forall(b => b >= 0L),
      "tokenBudgetMixByFraction: budgets must be >= 0")
    val totals = df.groupBy(sourceCol)
      .agg(sum(col(tokenCol)).cast("double").as("__total"))
      .withColumnRenamed(sourceCol, "__tb_src")
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (src, b)) => when(col(sourceCol) === lit(src), lit(b)).otherwise(acc)
    }
    // null-safe join: NULL-source docs must meet their own total (the
    // groupBy produced a null group) and keep flowing under
    // defaultBudget, matching the exact form (review finding)
    df.join(broadcast(totals), col(sourceCol) <=> col("__tb_src"))
      .drop("__tb_src")
      .withColumn("__budget", budget)
      .filter(col("__budget") < 0 ||
        graft.operators.Ops.hashUniform(col(idCol), salt) <
          least(lit(1.0), col("__budget").cast("double") /
            greatest(col("__total"), lit(1.0))))
      .drop("__total", "__budget")
  }

  /** DSIR-style importance resampling (Xie et al. 2023,
    * arXiv:2302.03169 "Data Selection for Language Models via
    * Importance Resampling"): select `k` documents from a raw corpus
    * TOWARD a target distribution. Importance weight = the per-token
    * geometric-mean likelihood ratio `10^(lm_target − lm_raw)`, where
    * each `lm_*` is the average log10 token probability under a
    * [[LangModel]] unigram LM (the paper uses hashed-ngram LMs; the
    * unigram ratio is the same estimator family and shares this
    * engine's oracle-pinned scoring), then DETERMINISTIC weighted
    * sampling without replacement ([[graft.operators.Ops.weightedSample]]
    * — Efraimidis–Spirakis bottom-k on the shared md5 digest, so the
    * selection is stable across partitionings/retries and replayable
    * in SQL).
    *
    * Composition is the whole point: both halves are existing
    * oracle-exact operators (q71/q72 scoring, q58 sampling), so the
    * full pipeline — two LM scorings, a pow, a rank key, a bottom-k —
    * replays verbatim in the q79/q80 oracle. Token-less documents have
    * null scores → null weight → excluded (they carry no evidence).
    *
    * Shape at 100 TB: each scoring is a broadcast join + aggregate in
    * the composable form, or a ZERO-shuffle codegen'd projection in the
    * native form ([[dsirSampleFast]]); the bottom-k is a
    * TakeOrderedAndProject — k rows per partition cross the wire, never
    * the corpus. Same q58-class caveat: cross-engine bit-parity at the
    * k-th/k+1-th boundary assumes both libms round `pow`/`ln`
    * identically; the sample is valid under any exact arithmetic.
    * `roundLogP = Some(d)` additionally rounds each avg log-prob to d
    * decimals BEFORE the ratio — the float-summation-order stabilizer
    * the q71 oracle uses, making the weights (not just the scores)
    * replay across engines; selection quality is unaffected at d ≥ 6. */
  def dsirSample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetLm: UnigramLm,
      rawLm: UnigramLm,
      k: Int,
      salt: String = "",
      roundLogP: Option[Int] = None): DataFrame = {
    require(!df.columns.contains("dsir_weight"),
      "input already has a dsir_weight column — rename it before resampling")
    def rnd(c: Column): Column = roundLogP.map(round(c, _)).getOrElse(c)
    val t = LangModel.logProbPerDoc(df, targetLm, idCol, textCol)
      .select(col(idCol), col("lm_logp").as("__lt"))
    val r = LangModel.logProbPerDoc(df, rawLm, idCol, textCol)
      .select(col(idCol), col("lm_logp").as("__lr"))
    val weighted = df.join(t, Seq(idCol), "left").join(r, Seq(idCol), "left")
      .withColumn("dsir_weight",
        pow(lit(10.0), rnd(col("__lt")) - rnd(col("__lr"))))
    graft.operators.Ops.weightedSample(
        weighted, col(idCol), col("dsir_weight"), k, salt)
      .select(df.columns.map(col) :+ col("dsir_weight"): _*)
  }

  /** [[dsirSample]] through the native scale path: weights from
    * `graft_lm_logprob` over SAVED LM files (one load per executor JVM,
    * zero-shuffle scoring scan) — bit-identical weights to the
    * composable form (LangModelSpec pins the scoring parity), so both
    * run under ONE oracle. */
  def dsirSampleFast(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetLmPath: String,
      rawLmPath: String,
      k: Int,
      salt: String = "",
      roundLogP: Option[Int] = None): DataFrame = {
    require(!df.columns.contains("dsir_weight"),
      "input already has a dsir_weight column — rename it before resampling")
    import graft.functions.GraftFunctions.lmLogProb
    def rnd(c: Column): Column = roundLogP.map(round(c, _)).getOrElse(c)
    val weighted = df.withColumn("dsir_weight",
      pow(lit(10.0),
        rnd(lmLogProb(col(textCol), targetLmPath)) -
          rnd(lmLogProb(col(textCol), rawLmPath))))
    graft.operators.Ops.weightedSample(
        weighted, col(idCol), col("dsir_weight"), k, salt)
      .select(df.columns.map(col) :+ col("dsir_weight"): _*)
  }

  /** Deterministic global shuffle for training export: order the corpus
    * by `(md5(id|salt), id)` — a reproducible pseudo-random permutation
    * of the rows, the "shuffle the sequences before training" step.
    * `rand()`-keyed sorts are irreproducible across retries (a lost
    * executor re-rolls its partition); this key is a pure function of
    * (id, salt), so the permutation survives retries, repartitionings,
    * and reruns, and a different `salt` yields an independent epoch
    * order. The digest recipe is shared with the sampling family
    * ([[graft.operators.Ops.hashDigestCol]]), so the q70 oracle replays
    * the key verbatim in SQL.
    *
    * At 100 TB: `repartitionByRange` + `sortWithinPartitions` is
    * Spark's distributed total sort — range bounds come from a sample,
    * every partition sorts locally, nothing funnels through one task.
    * Writing the result preserves file order, so a sequential reader
    * (a training loader) sees the shuffled order without any further
    * work. The key column stays on the output (`keyCol`) so downstream
    * stages can re-assert or resume the order cheaply. */
  /** CCNet-style perplexity bucketing (Wenzek et al. 2019,
    * arXiv:1911.00359): per group (language/domain), split documents
    * into `head` / `middle` / `tail` by their LM score — CCNet trains
    * on head+middle and drops tail, and downstream mixing often
    * up-weights head. `scoreCol` is an average per-token LOG
    * probability (higher = lower perplexity = better), so `head` is
    * the TOP `headFrac` of each group by score.
    *
    * EXACT form: `percent_rank` over (group, score desc) — rank ties
    * share a bucket, and the boundaries compare against
    * `headFrac` / `headFrac + middleFrac` exactly, which makes the
    * whole assignment SQL-replayable (q98 pins it against DuckDB; pass
    * a score ROUNDED to the oracle's precision so cross-engine libm
    * noise cannot flip an ordering). Callers should filter null scores
    * first (token-less docs): nulls would count into `n` under
    * engine-specific null ordering.
    *
    * Scale caveat — this form sorts each group in one window
    * partition, so a group holding most of the corpus serializes into
    * one task; it is the verify-scale reference. The scale path is
    * [[perplexityBucketsByThreshold]]: two scans, no per-group sort. */
  def perplexityBuckets(
      scored: DataFrame,
      scoreCol: String,
      groupCols: Seq[String],
      headFrac: Double = 1.0 / 3,
      middleFrac: Double = 1.0 / 3,
      bucketCol: String = "ppl_bucket"): DataFrame = {
    require(headFrac > 0 && middleFrac >= 0 && headFrac + middleFrac <= 1,
      s"fractions must satisfy 0 < head, 0 <= middle, head+middle <= 1, " +
        s"got $headFrac/$middleFrac")
    require(groupCols.nonEmpty, "perplexityBuckets needs at least one group column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc_nulls_last)
    val pr = percent_rank().over(w)
    scored.withColumn(bucketCol,
      when(pr < lit(headFrac), lit("head"))
        .when(pr < lit(headFrac + middleFrac), lit("middle"))
        .otherwise(lit("tail")))
  }

  /** The 100 TB form of [[perplexityBuckets]]: per-group score
    * thresholds from one mergeable `percentile_approx` aggregate
    * (map-side partial, numeric-histogram sketch), broadcast back, and
    * bucket assignment as a scan predicate — two passes, ZERO
    * per-group sort, immune to group skew (the biggest language is
    * just more scan rows). Bucket boundaries are approximate at the
    * sketch's accuracy (docs within ±ε of a cutoff may land one bucket
    * over — CorpusPrepSpec pins agreement with the exact form); CCNet
    * itself computes bucket cutoffs once on a sample, so threshold
    * semantics are faithful to the method. Null scores bucket to null;
    * docs whose GROUP value is null fall to `tail` (join on null keys
    * finds no thresholds) — coalesce the group column upstream if null
    * groups must be bucketed. */
  def perplexityBucketsByThreshold(
      scored: DataFrame,
      scoreCol: String,
      groupCols: Seq[String],
      headFrac: Double = 1.0 / 3,
      middleFrac: Double = 1.0 / 3,
      accuracy: Int = 10000,
      bucketCol: String = "ppl_bucket"): DataFrame = {
    require(headFrac > 0 && middleFrac >= 0 && headFrac + middleFrac <= 1,
      s"fractions must satisfy 0 < head, 0 <= middle, head+middle <= 1, " +
        s"got $headFrac/$middleFrac")
    require(groupCols.nonEmpty, "perplexityBucketsByThreshold needs at least one group column")
    val cuts = scored
      .filter(col(scoreCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(scoreCol),
        array(lit(1.0 - headFrac - middleFrac), lit(1.0 - headFrac)),
        lit(accuracy)).as("__ppl_cuts"))
    scored.join(broadcast(cuts), groupCols, "left")
      .withColumn(bucketCol,
        when(col(scoreCol).isNull, lit(null).cast("string"))
          .when(col(scoreCol) >= col("__ppl_cuts").getItem(1), lit("head"))
          .when(col(scoreCol) >= col("__ppl_cuts").getItem(0), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__ppl_cuts")
  }

  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      salt: String = "",
      numPartitions: Option[Int] = None,
      keyCol: String = "shuffle_key"): DataFrame =
    deterministicShuffleBy(df, col(idCol), salt, numPartitions, keyCol)

  /** Column-expression form of [[deterministicShuffle]] — for composite
    * row identities (e.g. chunked output, where the row id is
    * `(doc_id, chunk_id)`): pass any deterministic unique expression,
    * such as `concat(col("doc_id"), lit(":"), col("chunk_id"))`. */
  def deterministicShuffleBy(
      df: DataFrame,
      id: Column,
      salt: String = "",
      numPartitions: Option[Int] = None,
      keyCol: String = "shuffle_key"): DataFrame = {
    require(!df.columns.contains(keyCol),
      s"deterministicShuffle: column $keyCol already exists")
    val keyed = df.withColumn(keyCol,
      graft.operators.Ops.hashDigestCol(id, salt))
    val ranged = numPartitions match {
      case Some(n) => keyed.repartitionByRange(n, col(keyCol), id)
      case None    => keyed.repartitionByRange(col(keyCol), id)
    }
    // id as the tie-break makes the order total even if two ids ever
    // collide on the 128-bit digest (they won't, but total is free)
    ranged.sortWithinPartitions(col(keyCol), id)
  }

  /** CLUSTER-BALANCED (topic-diversity) subsampling: KMeans-cluster
    * the embedding space (the IVF machinery [[Similarity.ivfBuild]]
    * already proves out), then take an EQUAL deterministic quota per
    * cluster — the published diversity-preserving recipe (cluster-
    * balanced subset selection, the DataComp/SemDeDup-adjacent shape):
    * a dominant topic can no longer crowd the tail out of a fixed
    * token budget the way source-blind digest sampling lets it.
    *
    * Determinism: within a cluster, rows rank by the salted digest of
    * their id (the E–S bottom-k idiom every sampler here uses), so the
    * same corpus + salt + cluster model always keeps the same rows.
    * Scale shape: KMeans fits on the (small) embedding table; docs
    * join their cell tag by id (one equi-join shuffle); the per-cell
    * quota is [[graft.operators.Ops.proportionSamplesByDigest]] — the
    * rank-aware digest-threshold pre-thin, so NO cluster's full
    * membership ever sorts through one window task (with few clusters
    * each stratum holds a large corpus share — the exact shape the
    * keepTopQuantile scaladoc forbids for plain per-group windows);
    * the exact window runs over `O(clusters × oversample × quota)`
    * survivors, identical keep-set to the plain window form by
    * construction. Output keeps a `cluster` column for downstream
    * accounting. */
  def clusterBalancedSample(
      docs: DataFrame,
      idCol: String,
      embeddings: DataFrame,
      embIdCol: String,
      vecCol: String,
      numClusters: Int,
      perCluster: Int,
      salt: String = "clusterbal",
      maxIter: Int = 20): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive, got $perCluster")
    val cells = clusterCells(embeddings, embIdCol, vecCol, numClusters,
      idCol = idCol, maxIter = maxIter)
    clusterQuotaSample(docs.join(cells, Seq(idCol)), idCol, perCluster, salt)
  }

  /** The tagging stage of [[clusterBalancedSample]]: KMeans-cluster the
    * embedding table ([[Similarity.ivfBuild]], fixed seed) and emit
    * `(idCol, cluster)` tags. Split out so consumers of the selection
    * stage ([[clusterQuotaSample]] — the q132 gate among them) tag
    * through the SAME production recipe rather than re-deriving it. */
  def clusterCells(
      embeddings: DataFrame,
      embIdCol: String,
      vecCol: String,
      numClusters: Int,
      idCol: String,
      maxIter: Int = 20): DataFrame = {
    require(numClusters > 0, s"numClusters must be positive, got $numClusters")
    val (_, tagged) = Similarity.ivfBuild(
      embeddings.select(col(embIdCol), col(vecCol)), numClusters, vecCol,
      maxIter = maxIter)
    tagged.select(col(embIdCol).as(idCol), col("cell").as("cluster"))
  }

  /** The selection stage of [[clusterBalancedSample]], split out so the
    * two stages are independently consumable: given rows ALREADY tagged
    * with a `cluster` column, keep the deterministic per-cluster quota
    * (rank by salted md5 digest of the id, [[graft.operators.Ops
    * .proportionSamplesByDigest]] pre-thin + exact window). Pure
    * integer/string arithmetic over (id, cluster) — SQL-replayable,
    * which is how the q132 gate pins it against DuckDB (the seeded
    * KMeans fit upstream is the only rows-only step). */
  def clusterQuotaSample(
      withCell: DataFrame,
      idCol: String,
      perCluster: Int,
      salt: String = "clusterbal"): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive, got $perCluster")
    val quotas = withCell.select(col("cluster")).distinct()
      .withColumn("rows_count", lit(perCluster))
    graft.operators.Ops.proportionSamplesByDigest(
      withCell, quotas, Seq("cluster"),
      digest = graft.operators.Ops.hashDigestCol(col(idCol).cast("string"), salt),
      tieBreak = col(idCol))
  }
}
