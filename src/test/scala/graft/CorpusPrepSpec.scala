package graft

import org.apache.spark.sql.functions._
import graft.llm.CorpusPrep
import graft.operators.Ops

/** Chunking, deterministic sampling, mixture composition. */
class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // ------------------------------------------------------------ chunking

  test("chunkByTokens: known small inputs") {
    val df = Seq(
      (1L, "a b c d e f g h"), // 8 tokens
      (2L, "x y"),             // shorter than one chunk
      (3L, ""),                // no tokens → no chunks
      (4L, "   ")              // whitespace only → no chunks
    ).toDF("doc_id", "text")
    val got = CorpusPrep.chunkByTokens(df, "doc_id", "text", chunkSize = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    // step=2: doc1 starts 0,2,4 (start 4 reaches the end: 4+4 ≥ 8)
    assert(got == Set(
      (1L, 0L, "a b c d", 4L),
      (1L, 1L, "c d e f", 4L),
      (1L, 2L, "e f g h", 4L),
      (2L, 0L, "x y", 2L)))
  }

  test("chunkByTokens: every token covered, overlap honored, ids dense") {
    val out = CorpusPrep.chunkByTokens(docs, "doc_id", "text", chunkSize = 32, overlap = 8)
      .cache()
    try {
      // chunk token counts: all full except possibly the last per doc
      val bad = out.filter(col("chunk_tokens") > 32 || col("chunk_tokens") <= 0).count()
      assert(bad == 0)
      // reconstruction: stepping the chunks by (chunkSize − overlap) and
      // dropping each chunk's first `overlap` tokens (except chunk 0)
      // re-yields the doc's token stream exactly
      val rebuilt2 = out
        .orderBy("doc_id", "chunk_id")
        .withColumn("__part",
          when(col("chunk_id") === 0, col("chunk_text"))
            .otherwise(array_join(slice(split(col("chunk_text"), " "), 9, 32), " ")))
      val perDoc = rebuilt2.groupBy("doc_id")
        .agg(concat_ws(" ", collect_list("__part")).as("rebuilt"))
      val orig = docs.select(col("doc_id"),
        array_join(filter(split(trim(col("text")), "\\s+"), t => length(t) > 0), " ").as("want"))
      val mismatches = perDoc.join(orig, "doc_id")
        .filter(col("rebuilt") =!= col("want")).count()
      assert(mismatches == 0)
      assert(out.count() > docs.count()) // fan-out happened
    } finally out.unpersist()
  }

  test("chunkByTokens stays shuffle-free (pure map + explode)") {
    val plan = CorpusPrep.chunkByTokens(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("chunkByTokensFast (native expression) is bit-identical to the HOF chunker") {
    // real corpus + handpicked edges: whitespace runs/tabs/newlines,
    // unicode (incl. a non-breaking space, which \s must NOT split),
    // single token, exactly-chunk-size, empty, blank
    val edges = Seq(
      (9001L, "  a\t\tb\nc   d  "), (9002L, "héllo wörld glued"),
      (9003L, "single"), (9004L, "t1 t2 t3 t4"), (9005L, ""), (9006L, " \t \n ")
    ).toDF("doc_id", "text")
    for (df <- Seq(docs, edges); (cs, ov) <- Seq((32, 8), (4, 2), (4, 0))) {
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      val hof = canon(CorpusPrep.chunkByTokens(df, "doc_id", "text", cs, ov))
      val fast = canon(CorpusPrep.chunkByTokensFast(df, "doc_id", "text", cs, ov))
      assert(fast == hof, s"chunkSize=$cs overlap=$ov: native diverges from HOF")
    }
    // names + dtypes agree (the oracle hashes dtypes); the native form
    // is stricter on nullability (chunk fields provably non-null)
    def nt(d: org.apache.spark.sql.DataFrame) =
      d.schema.fields.map(f => f.name -> f.dataType).toSeq
    assert(nt(CorpusPrep.chunkByTokensFast(docs, "doc_id", "text")) ==
      nt(CorpusPrep.chunkByTokens(docs, "doc_id", "text")))
  }

  test("chunkByTokensFast stays shuffle-free and inside codegen") {
    val plan = CorpusPrep.chunkByTokensFast(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("*(1)"), s"expected WholeStageCodegen:\n$plan")
  }

  test("packSequences: budget-dense bins, bounded overflow, deterministic, no global order") {
    import org.apache.spark.sql.functions.{col, countDistinct, max, sum}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val chunks = CorpusPrep.chunkByTokensFast(docs, "doc_id", "text", 32, 8)
    val packed = CorpusPrep.packSequences(chunks, "doc_id", "chunk_tokens",
      budget = 256, buckets = 8).cache()
    // every chunk assigned, chunk set unchanged
    assert(packed.count() == chunks.count())
    val seqs = packed.groupBy("seq_id")
      .agg(sum("chunk_tokens").as("tok"), max("chunk_tokens").as("mx"),
        countDistinct("doc_id").as("docs"))
      .cache()
    // overflow bound: a sequence exceeds the budget by < its largest chunk
    assert(seqs.filter(col("tok") >= lit(256) + col("mx")).count() == 0)
    // packing is DENSE: every sequence except (possibly) the last one
    // per bucket crosses the budget boundary — so at most `buckets`
    // sequences may be underfull below budget − 31 (max chunk is 32)
    val under = seqs.filter(col("tok") < 256 - 31).count()
    assert(under <= 8, s"$under underfull sequences for 8 buckets")
    // sequences do pack MULTIPLE docs' chunks together (the point)
    assert(seqs.filter(col("docs") > 1).count() > 0)
    // deterministic: same input → identical assignment
    val again = CorpusPrep.packSequences(chunks, "doc_id", "chunk_tokens",
      budget = 256, buckets = 8)
    assert(packed.select("doc_id", "chunk_id", "seq_id")
      .except(again.select("doc_id", "chunk_id", "seq_id")).count() == 0)
    // plan: exactly one exchange (the bucket shuffle) feeds the window —
    // no single-partition global sort
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), s"global window:\n$plan")
    packed.unpersist(); seqs.unpersist()
  }

  test("packingReport: totals re-verify, efficiency bounded, ≤1 underfull per bucket") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val chunks = CorpusPrep.chunkByTokensFast(docs, "doc_id", "text", 32, 8)
    val packed = CorpusPrep.packSequences(chunks, "doc_id", "chunk_tokens",
      budget = 256, buckets = 8).cache()
    val r = CorpusPrep.packingReport(packed, budget = 256).head()
    // totals re-verify against the packed frame itself
    assert(r.getAs[Long]("n_chunks") == packed.count())
    assert(r.getAs[Long]("tokens_packed") ==
      packed.agg(org.apache.spark.sql.functions.sum("chunk_tokens")).head().getLong(0))
    assert(r.getAs[Long]("budget_tokens") == r.getAs[Long]("n_sequences") * 256)
    // the offset-bin invariant: deep-underfull (below budget − maxChunk
    // + 1, the structural floor of non-final bins) ⇔ bucket-final bin
    assert(r.getAs[Long]("max_deep_underfull_per_bucket") <= 1,
      s"packing invariant broken: ${r.getAs[Long]("max_deep_underfull_per_bucket")} deep-underfull in one bucket")
    assert(r.getAs[Long]("n_deep_underfull") <= 8)
    // density floor from the invariant: nseq ≤ tokens/(B−mx+1) + buckets
    val eff = r.getAs[Double]("efficiency")
    val T = r.getAs[Long]("tokens_packed").toDouble
    val span = 256.0 - r.getAs[Long]("max_chunk_tokens") + 1
    val floor = T / (256.0 * (T / span + 8))
    assert(eff >= floor, s"efficiency $eff below structural floor $floor")
    packed.unpersist()
  }

  test("assembleSequences: ordered concat per sequence, token totals re-verify") {
    import org.apache.spark.sql.functions.{col, size => asize, split, trim}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // overlap 0 so assembled text token counts are exactly additive
    val chunks = CorpusPrep.chunkByTokensFast(docs, "doc_id", "text", 32, 0)
    val packed = CorpusPrep.packSequences(chunks, "doc_id", "chunk_tokens",
      budget = 128, buckets = 4)
    val seqs = CorpusPrep.assembleSequences(packed).cache()
    assert(seqs.count() > 0)
    // the assembled text's whitespace token count equals the recorded sum
    val bad = seqs.filter(
      asize(split(trim(col("seq_text")), "\\s+")) =!= col("seq_tokens")).count()
    assert(bad == 0, "assembled token counts must match chunk sums")
    // chunk order inside a sequence: the first chunk of the min doc_id
    // leads the text (sort_array over (doc_id, chunk_id) structs)
    val sid = packed.select("seq_id").head().getLong(0) // one draw — head() is unordered
    val probe = packed.filter(col("seq_id") === sid)
      .orderBy("doc_id", "chunk_id").select("chunk_text").collect().map(_.getString(0))
    val assembled = seqs.filter(col("seq_id") === sid)
      .head().getAs[String]("seq_text")
    assert(assembled == probe.mkString(" "))
    seqs.unpersist()
  }

  test("packTokenIds: hand-computed sequences — docs cross boundaries, EOS " +
      "separators placed, boundary offsets re-derive doc token counts") {
    // one bucket; stream = [10,11,12,99 | 20,99 | 30..35,99] (13 tokens)
    val df = Seq(
      (1L, Seq(10, 11, 12)),
      (2L, Seq(20)),
      (3L, Seq(30, 31, 32, 33, 34, 35)))
      .toDF("doc_id", "ids")
    val got = CorpusPrep.packTokenIds(df, "doc_id", "ids",
        seqLen = 5, eosId = 99, buckets = 1)
      .orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList,
        r.getSeq[Int](2).toList, r.getLong(3), r.getLong(4)))
    assert(got.toList == List(
      // seq 0: doc1 whole + its EOS + doc2's first token; doc1 starts at
      // 0, doc2 at 4
      (0L, List(10, 11, 12, 99, 20), List(0, 4), 5L, 2L),
      // seq 1: doc2's EOS crossed the boundary; doc3 starts at offset 1
      (1L, List(99, 30, 31, 32, 33), List(1), 5L, 1L),
      // partial tail: emitted short, no doc starts
      (2L, List(34, 35, 99), List(), 3L, 0L)))
    // boundary arithmetic re-derives doc token counts: within seq 0,
    // 4 - 0 = doc1's 3 ids + 1 EOS
    assert(got(0)._3(1) - got(0)._3(0) == 3 + 1)
  }

  test("padTokenIds: one padded sequence per row, truncation flagged, " +
      "example columns ride along, report-compatible, null ids rejected") {
    val df = Seq(
      (1L, "train", Seq(10, 11, 12)),   // fits: 3 ids + eos + 1 pad
      (2L, "val", Seq(20)),             // mostly padding
      (3L, "train", Seq(30, 31, 32, 33, 34, 35))) // overflows seqLen-1=4
      .toDF("doc_id", "label", "ids")
    val got = CorpusPrep.padTokenIds(df, "ids", seqLen = 5, eosId = 99, padId = 0)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("label"),
        r.getAs[Seq[Int]]("input_ids").toList, r.getAs[Long]("n_tokens"),
        r.getAs[Boolean]("truncated")))
    assert(got.toList == List(
      (1L, "train", List(10, 11, 12, 99, 0), 4L, false),
      (2L, "val", List(20, 99, 0, 0, 0), 2L, false),
      // truncated: first 4 ids kept, separator still terminates
      (3L, "train", List(30, 31, 32, 33, 99), 5L, true)))
    // the packing report reads padding waste directly
    val rep = CorpusPrep.packedIdsReport(
      CorpusPrep.padTokenIds(df, "ids", seqLen = 5, eosId = 99, padId = 0), 5).head()
    assert(rep.getAs[Long]("n_sequences") == 3 &&
      rep.getAs[Long]("tokens_packed") == 11 &&
      rep.getAs[Long]("n_docs_started") == 3)
    // null ids fail loudly, never pad silently
    val bad = Seq((1L, "x", null.asInstanceOf[Seq[Int]])).toDF("doc_id", "label", "ids")
    val e = intercept[Exception] {
      CorpusPrep.padTokenIds(bad, "ids", seqLen = 5, eosId = 99, padId = 0).collect()
    }
    assert(e.getMessage.contains("padTokenIds"))
  }

  test("packTokenIds: token conservation, fixed length, determinism under " +
      "repartitioning, empty docs, null ids rejected") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        transform(filter(split(trim(col("text")), "\\s+"), t => length(t) > 0),
          t => length(t)).as("ids"))
    val packed = CorpusPrep.packTokenIds(docs, "doc_id", "ids",
      seqLen = 128, eosId = 0, buckets = 8).cache()
    // every token lands in exactly one sequence (+1 EOS per doc)
    val totalIn = docs.select(sum(size(col("ids")) + 1)).head().getLong(0)
    val totalOut = packed.select(sum("n_tokens")).head().getLong(0)
    assert(totalIn == totalOut, s"token conservation: $totalIn vs $totalOut")
    // every doc started exactly once
    assert(packed.select(sum("n_docs_started")).head().getLong(0) == docs.count())
    // all but ≤ buckets tail sequences are exactly seqLen
    val short = packed.filter(col("n_tokens") =!= 128).count()
    assert(short <= 8, s"more than one partial tail per bucket: $short")
    // boundaries are valid offsets and sorted
    assert(packed.filter(exists(col("doc_boundaries"),
      b => b < 0 || b >= 128)).count() == 0)
    // determinism: a repartitioned input packs identically
    val re = CorpusPrep.packTokenIds(docs.repartition(13), "doc_id", "ids",
      seqLen = 128, eosId = 0, buckets = 8)
    assert(packed.exceptAll(re).count() == 0 && re.exceptAll(packed).count() == 0,
      "packing must be partitioning-invariant")
    packed.unpersist()
    // an empty-ids doc contributes exactly its EOS
    val lone = CorpusPrep.packTokenIds(
      Seq((5L, Seq.empty[Int])).toDF("doc_id", "ids"),
      "doc_id", "ids", seqLen = 4, eosId = 7, buckets = 1)
      .collect().map(r => (r.getSeq[Int](1).toList, r.getSeq[Int](2).toList))
    assert(lone.toList == List((List(7), List(0))))
    // null ids fail loudly instead of silently corrupting the stream
    val err = intercept[Exception] {
      CorpusPrep.packTokenIds(
        Seq((1L, Seq(1, 2)), (2L, null)).toDF("doc_id", "ids"),
        "doc_id", "ids", seqLen = 4, eosId = 0, buckets = 1).collect()
    }
    assert(String.valueOf(err.getMessage).contains("null") ||
      String.valueOf(err.getCause).contains("null"))
    // duplicate order keys fail loudly: under the RANGE cumulative
    // frame tied rows would share one offset and sequences would
    // silently assemble over-long (epoch copies without `epoch` in
    // orderCols — the exact trap)
    val dup = intercept[Exception] {
      CorpusPrep.packTokenIds(
        Seq((1L, Seq(1, 2)), (1L, Seq(3, 4)), (2L, Seq(5))).toDF("doc_id", "ids"),
        "doc_id", "ids", seqLen = 4, eosId = 0, buckets = 1).collect()
    }
    assert(String.valueOf(dup.getMessage).contains("duplicate") ||
      String.valueOf(dup.getCause).contains("duplicate"), s"got $dup")
  }

  test("packedIdsReport: totals re-verify against the packed frame; " +
      "partitioned packing carries its labels and never mixes them") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        transform(filter(split(trim(col("text")), "\\s+"), t => length(t) > 0),
          t => length(t)).as("ids"),
        (pmod(col("doc_id"), lit(3)) === 0).cast("string").as("part"))
    val packed = CorpusPrep.packTokenIds(docs, "doc_id", "ids",
      seqLen = 64, eosId = 0, buckets = 4).cache()
    val r = CorpusPrep.packedIdsReport(packed, 64).head()
    assert(r.getAs[Long]("n_sequences") == packed.count())
    assert(r.getAs[Long]("n_full") + r.getAs[Long]("n_partial") ==
      r.getAs[Long]("n_sequences"))
    assert(r.getAs[Long]("tokens_packed") ==
      packed.agg(sum("n_tokens")).head().getLong(0))
    assert(r.getAs[Long]("capacity_tokens") == r.getAs[Long]("n_sequences") * 64)
    assert(r.getAs[Double]("efficiency") > 0.9,
      s"crossing-doc packing should be dense: $r")
    assert(r.getAs[Long]("n_docs_started") == docs.count())
    packed.unpersist()
    // partitioned packing: the label rides every row; per-label token
    // totals equal per-label input totals (no cross-label leakage)
    val pp = CorpusPrep.packTokenIds(docs, "doc_id", "ids",
      seqLen = 64, eosId = 0, buckets = 4, partitionCols = Seq("part")).cache()
    assert(pp.columns.contains("part"))
    val inTotals = docs.groupBy("part").agg(sum(size(col("ids")) + 1).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val outTotals = pp.groupBy("part").agg(sum("n_tokens").as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(inTotals == outTotals, s"$inTotals vs $outTotals")
    pp.unpersist()
  }

  test("hashSplit: exhaustive, disjoint, partition-invariant, nests with hashSample") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = CorpusPrep.hashSplit(docs, "doc_id", splits, salt = "s1").cache()
    // every row gets exactly one label; no rows lost or duplicated
    assert(labeled.count() == docs.count())
    val byLabel = labeled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    // fractions near the weights (binomial tolerance on 500 docs)
    assert(byLabel("train") > 350 && byLabel("val") < 100 && byLabel("test") < 100, s"$byLabel")
    // partition-invariant assignment
    val re = CorpusPrep.hashSplit(docs.repartition(7), "doc_id", splits, salt = "s1")
    assert(re.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      labeled.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // same-salt hashSample(0.5) ⊂ train(0.8): nesting, not crosscutting
    val sampled = graft.operators.Ops.hashSample(docs, "doc_id", 0.5, salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val train = labeled.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampled.subsetOf(train), "same-salt sample must nest inside the first split")
    labeled.unpersist()
    // guards
    intercept[IllegalArgumentException](
      CorpusPrep.hashSplit(docs, "doc_id", Seq("a" -> 1.0)))
    intercept[IllegalArgumentException](
      CorpusPrep.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "a" -> 0.5)))
    intercept[IllegalArgumentException](
      CorpusPrep.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      CorpusPrep.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), splitCol = "text"))
  }

  // ------------------------------------------- deterministic hash sample

  test("hashSample: deterministic, partition-invariant, near the fraction") {
    val a = Ops.hashSample(docs, "doc_id", 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Ops.hashSample(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // rand(seed) sampling fails exactly this property
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.1, s"got ${a.size / n}")
  }

  test("hashSample: nested fractions with same salt, independent with different salts") {
    val small = Ops.hashSample(docs, "doc_id", 0.1).select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Ops.hashSample(docs, "doc_id", 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big)) // nested: threshold prefix ordering
    val other = Ops.hashSample(docs, "doc_id", 0.1, salt = "v2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != small) // different salt draws a different sample
  }

  test("hashSample predicate pushes into the parquet scan") {
    val plan = Ops.hashSample(docs, "doc_id", 0.25)
      .select("doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(plan.contains("*(1)"), s"not codegen'd:\n$plan")
  }

  test("hashSample edge fractions") {
    assert(Ops.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Ops.hashSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  // ------------------------------------------------------------- mixture

  test("mixtureSample keeps per-source fractions; default drops unknown sources") {
    val out = graft.llm.CorpusPrep.mixtureSample(
      docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.4, "src2" -> 0.0), defaultFraction = 0.0)
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet.subsetOf(Set("src0", "src1")))
    assert(bySrc("src0") == totals("src0")) // fraction 1.0 keeps all
    val frac1 = bySrc.getOrElse("src1", 0L).toDouble / totals("src1")
    assert(frac1 > 0.05 && frac1 < 0.8, s"src1 kept $frac1")
  }

  test("mixtureSample defaultFraction applies to unlisted sources") {
    val out = graft.llm.CorpusPrep.mixtureSample(
      docs, "doc_id", "source", Map("src0" -> 0.0), defaultFraction = 1.0)
    assert(out.filter(col("source") === "src0").count() == 0)
    assert(out.count() == docs.filter(col("source") =!= "src0").count())
  }

  test("temperatureMix: rates follow n^(alpha-1), smallest domain pinned to budget") {
    // skewed corpus: per-source counts differ, so alpha < 1 has a head to damp
    val corpus = docs.select(col("doc_id"), col("source"))
      .filter(col("doc_id") % (substring(col("source"), 4, 5).cast("int") + lit(2)) === 0)
      .cache()
    try {
      val totals = corpus.groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(totals.values.toSet.size > 1, s"corpus must be skewed: $totals")
      val out = CorpusPrep.temperatureMix(
        corpus, "doc_id", "source", alpha = 0.5, budget = 1.0, salt = "tm")
      assert(out.columns.toSeq == Seq("doc_id", "source")) // schema preserved
      val kept = out.select("doc_id").as[Long].collect().toSet
      // replay the rate arithmetic in plain Scala and the per-row uniform
      // via the shared digest recipe (itself pinned by the q58 oracle):
      // the keep-set must match EXACTLY, no statistical tolerance
      val maxw = totals.values.map(n => math.pow(n.toDouble, -0.5)).max
      val rates = totals.map { case (src, n) =>
        src -> math.min(1.0, math.pow(n.toDouble, -0.5) / maxw)
      }
      val want = corpus
        .withColumn("__u", Ops.hashUniform(col("doc_id"), "tm"))
        .collect()
        .filter(r => r.getDouble(2) <= rates(r.getString(1)))
        .map(_.getLong(0)).toSet
      assert(kept == want, s"keep-set diverges: extra=${kept -- want}, missing=${want -- kept}")
      // the smallest domain has rate 1.0 at budget=1 → kept WHOLE, exactly
      val smallest = totals.minBy(_._2)._1
      val keptSmallest = out.filter(col("source") === smallest).count()
      assert(keptSmallest == totals(smallest), s"smallest domain $smallest must be kept whole")
    } finally corpus.unpersist()
  }

  test("tokenBudgetMix: digest-prefix per source, crossing doc included, zero " +
      "and unlimited budgets; scale form lands near the budget") {
    import spark.implicits._
    // 20 docs/source, 10 tokens each → source totals of 200 tokens
    val docs = (0L until 60L).map(i => (i, s"src${i % 3}", 10L))
      .toDF("doc_id", "source", "n_tokens")
    val kept = CorpusPrep.tokenBudgetMix(docs, "doc_id", "source", "n_tokens",
      Map("src0" -> 95L, "src1" -> 0L), defaultBudget = -1L, salt = "s")
    val bySrc = kept.groupBy("source")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 95-token budget over 10-token docs: 9 docs end at 90 < 95, the
    // 10th CROSSES (cum-before 90 < 95) and is included → 100 tokens
    assert(bySrc("src0") == ((10L, 100L)), s"crossing-doc rule: ${bySrc.get("src0")}")
    assert(!bySrc.contains("src1"), "zero budget keeps nothing")
    assert(bySrc("src2") == ((20L, 200L)), "unbudgeted source keeps everything")
    // determinism + prefix property: the kept src0 set is the 10
    // smallest digests, so re-running with a LARGER budget is a superset
    val kept0 = kept.filter(col("source") === "src0")
      .select("doc_id").as[Long].collect().toSet
    val kept0b = CorpusPrep.tokenBudgetMix(docs, "doc_id", "source", "n_tokens",
        Map("src0" -> 155L), salt = "s")
      .filter(col("source") === "src0").select("doc_id").as[Long].collect().toSet
    assert(kept0.subsetOf(kept0b) && kept0b.size == 16,
      s"budgets nest as digest prefixes: ${kept0.size} ⊆ ${kept0b.size}")
    // scale form: no window in the plan; token mass ~ budget on the
    // real corpus (law-of-large-numbers band, exact form is the anchor)
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    val budget = 600L
    val scale = CorpusPrep.tokenBudgetMixByFraction(real, "doc_id", "source",
      "n_tokens", Map("src0" -> budget), salt = "s")
    assert(!scale.queryExecution.executedPlan.toString.contains("Window"),
      "scale form must not sort per source")
    val got = scale.filter(col("source") === "src0")
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0)
    assert(math.abs(got - budget) <= budget / 2,
      s"scale form token mass $got should land near the $budget budget")
    // unbudgeted sources pass through whole in the scale form too
    assert(scale.filter(col("source") === "src1").count() ==
      real.filter(col("source") === "src1").count())
    // review-fix pins: duplicate ids are NOT window peers (explicit
    // ROWS frame) — a 10-token budget over two identical 10-token rows
    // keeps exactly one, never zero
    val dup = Seq((1L, "s", 10L), (1L, "s", 10L)).toDF("doc_id", "source", "n_tokens")
    assert(CorpusPrep.tokenBudgetMix(dup, "doc_id", "source", "n_tokens",
      Map("s" -> 10L)).count() == 1, "RANGE-frame peers would underfill to 0")
    // NULL-source docs flow under defaultBudget in BOTH forms
    val withNull = Seq((1L, Option("s"), 10L), (2L, None, 10L))
      .toDF("doc_id", "source", "n_tokens")
    assert(CorpusPrep.tokenBudgetMix(withNull, "doc_id", "source", "n_tokens",
      Map("s" -> 100L)).count() == 2)
    assert(CorpusPrep.tokenBudgetMixByFraction(withNull, "doc_id", "source",
      "n_tokens", Map("s" -> 100L)).count() == 2,
      "the scale form's join must be null-safe")
  }

  test("epochMix: integral weights repeat exactly, fractional weights add the " +
      "deterministic md5-share extra copy, weight 0 drops, epochs tag 0..k-1") {
    val corpus = docs.select(col("doc_id"), col("source"))
    val out = CorpusPrep.epochMix(corpus, "doc_id", "source",
      Map("src0" -> 3.0, "src1" -> 0.5, "src2" -> 0.0, "src3" -> 2.25),
      defaultWeight = 1.0, salt = "em")
    assert(out.columns.toSeq == Seq("doc_id", "source", "epoch"))
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("k"), min("epoch").as("lo"), max("epoch").as("hi"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // epochs are a contiguous 0..k-1 tag on every emitted doc
    assert(perDoc.forall { case (_, _, k, lo, hi) => lo == 0 && hi == k - 1 })
    val bySrc = perDoc.groupBy(_._2).map { case (s2, rows) => s2 -> rows.map(_._3) }
    assert(bySrc("src0").forall(_ == 3), "integral weight 3 = exactly 3 copies")
    assert(!bySrc.contains("src2"), "weight 0 drops the source")
    assert(bySrc("src9").forall(_ == 1), "unlisted sources take the default once")
    // fractional parts are the EXACT md5-share, replayed independently
    val docsOf = { src: String => corpus.filter(col("source") === src)
      .withColumn("__u", Ops.hashUniform(col("doc_id"), "em"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap }
    val u1 = docsOf("src1")
    val got1 = out.filter(col("source") === "src1")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(got1 == u1.filter(_._2 <= 0.5).keySet,
      "w=0.5: exactly the md5-half of src1 appears, once")
    val u3 = docsOf("src3")
    val want3 = perDoc.filter(_._2 == "src3").map { case (id, _, k, _, _) =>
      id -> k }.toMap
    assert(u3.forall { case (id, u) =>
      want3(id) == (if (u <= 0.25) 3L else 2L) },
      "w=2.25: 2 copies, or 3 for the md5-quarter")
    // pure function of (id, salt): a second run is identical
    val again = CorpusPrep.epochMix(corpus, "doc_id", "source",
      Map("src0" -> 3.0, "src1" -> 0.5, "src2" -> 0.0, "src3" -> 2.25),
      defaultWeight = 1.0, salt = "em")
      .groupBy("doc_id").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == perDoc.map(r => r._1 -> r._3).toMap)
    // existing-column collision is rejected
    intercept[IllegalArgumentException] {
      CorpusPrep.epochMix(out, "doc_id", "source", Map("src0" -> 2.0))
    }
  }

  test("temperatureMix: alpha=1 keeps the natural mix scaled by budget; " +
      "budget-monotone subset; deterministic") {
    val corpus = docs.select(col("doc_id"), col("source"))
    // alpha=1 → every rate = budget; budget=1 → identity
    val all = CorpusPrep.temperatureMix(corpus, "doc_id", "source", alpha = 1.0)
    assert(all.count() == corpus.count())
    // the keep-set shrinks monotonically with budget (same uniform u)
    val at1 = CorpusPrep.temperatureMix(corpus, "doc_id", "source", 0.3, 1.0, "tm")
      .select("doc_id").as[Long].collect().toSet
    val atHalf = CorpusPrep.temperatureMix(corpus, "doc_id", "source", 0.3, 0.5, "tm")
      .select("doc_id").as[Long].collect().toSet
    assert(atHalf.subsetOf(at1), "budget=0.5 keep-set must nest inside budget=1")
    assert(atHalf.size < at1.size)
    // rerun is bit-identical (pure hash decisions, no RNG)
    val again = CorpusPrep.temperatureMix(corpus, "doc_id", "source", 0.3, 0.5, "tm")
      .select("doc_id").as[Long].collect().toSet
    assert(again == atHalf)
  }

  test("temperatureMix: NULL-domain rows form their own domain — counted AND kept") {
    // 3 null-domain rows vs 12 "big" rows: alpha=0 damps big to 1/12,
    // null's rate is 3^-1/3^-1... maxw comes from the smaller group
    val corpus = ((1 to 12).map(i => (i.toLong, "big")) ++
      (101 to 103).map(i => (i.toLong, null: String))).toDF("doc_id", "source")
    val out = CorpusPrep.temperatureMix(corpus, "doc_id", "source",
      alpha = 1.0, budget = 1.0, salt = "nd")
    // alpha=1, budget=1 → identity: EVERY row survives, including NULL domain
    assert(out.count() == 15, "NULL-domain rows must not be dropped by the rate join")
    assert(out.filter(col("source").isNull).count() == 3)
    // and at alpha<1 the null group is rate-limited like any other domain
    val damped = CorpusPrep.temperatureMix(corpus, "doc_id", "source",
      alpha = 0.0, budget = 1.0, salt = "nd")
    assert(damped.filter(col("source").isNull).count() == 3,
      "smallest (null) domain has rate 1 → kept whole")
  }

  test("temperatureMix: rejects out-of-range alpha/budget; corpus never shuffled") {
    val corpus = docs.select(col("doc_id"), col("source"))
    intercept[IllegalArgumentException] {
      CorpusPrep.temperatureMix(corpus, "doc_id", "source", alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.temperatureMix(corpus, "doc_id", "source", alpha = 0.5, budget = 0.0)
    }
    // the corpus side joins the broadcast rates without an exchange of its own
    val plan = CorpusPrep.temperatureMix(corpus, "doc_id", "source", 0.5, 0.9, "tm")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the rate join:\n$plan")
  }

  test("deterministicShuffle: md5 key, global order across partitions, " +
      "salt-sensitive, reproducible") {
    val input = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
    val shuffled = graft.llm.CorpusPrep.deterministicShuffle(
      input, "doc_id", salt = "ep0", numPartitions = Some(4))
    // key is exactly the shared sampling digest
    val wrongKeys = shuffled.filter(col("shuffle_key") =!=
      md5(concat(col("doc_id").cast("string"), lit("|"), lit("ep0")))).count()
    assert(wrongKeys == 0)
    // collect() preserves partition order, and each partition is
    // locally sorted over disjoint ascending ranges — so the collected
    // key sequence must BE the globally sorted sequence
    val keys = shuffled.select("shuffle_key").collect().map(_.getString(0))
    assert(keys.length == input.count())
    assert((keys, keys.sorted).zipped.forall(_ == _),
      "collected order is not the global (key, id) sort order")
    // reproducible: a second run yields the identical permutation
    val again = graft.llm.CorpusPrep.deterministicShuffle(
      input, "doc_id", salt = "ep0", numPartitions = Some(4))
      .select("doc_id").collect().map(_.getLong(0))
    val first = shuffled.select("doc_id").collect().map(_.getLong(0))
    assert((first, again).zipped.forall(_ == _), "shuffle is not reproducible")
    // a different salt is a different (independent) permutation
    val other = graft.llm.CorpusPrep.deterministicShuffle(
      input, "doc_id", salt = "ep1", numPartitions = Some(4))
      .select("doc_id").collect().map(_.getLong(0))
    assert(!(first, other).zipped.forall(_ == _), "salt must change the order")
    // and it IS a permutation, not a resample
    assert(first.sorted.sameElements(other.sorted))
    // key-column collision is rejected up front
    intercept[IllegalArgumentException](graft.llm.CorpusPrep.deterministicShuffle(
      shuffled, "doc_id", salt = "x"))
  }
  // ------------------------------------------------------------------ FIM

  private val fimPre = "<|fim_prefix|>"
  private val fimSuf = "<|fim_suffix|>"
  private val fimMid = "<|fim_middle|>"

  /** Parse a PSM-formatted fim_text back into (prefix, suffix, middle).
    * Safe on the fixtures: no document contains a sentinel string. */
  private def parsePsm(s: String): (String, String, String) = {
    assert(s.startsWith(fimPre), s"no prefix sentinel: $s")
    val sufAt = s.indexOf(fimSuf)
    val midAt = s.indexOf(fimMid)
    assert(sufAt >= 0 && midAt > sufAt, s"sentinel order broken: $s")
    (s.substring(fimPre.length, sufAt),
      s.substring(sufAt + fimSuf.length, midAt),
      s.substring(midAt + fimMid.length))
  }

  test("fimTransform: prefix ⧺ middle ⧺ suffix reassembles every document " +
      "bit-exactly at rate 1.0, and the same call is deterministic") {
    val out = CorpusPrep.fimTransform(docs.select(col("doc_id"), col("text")),
      "doc_id", "text", rate = 1.0).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Boolean]("fim_applied")))
    out.foreach { r =>
      val (p, s, m) = parsePsm(r.getAs[String]("fim_text"))
      assert(p + m + s == r.getAs[String]("text"),
        s"reassembly broke for doc ${r.getAs[Long]("doc_id")}")
    }
    val again = CorpusPrep.fimTransform(docs.select(col("doc_id"), col("text")),
      "doc_id", "text", rate = 1.0).collect()
    assert(out.map(_.getAs[String]("fim_text")).toSeq ==
      again.map(_.getAs[String]("fim_text")).toSeq)
  }

  test("fimTransform: rate 0 passes every row through verbatim; the rate " +
      "predicate is the shared sampling digest (nests with hashSample)") {
    val zero = CorpusPrep.fimTransform(docs.select(col("doc_id"), col("text")),
      "doc_id", "text", rate = 0.0)
    assert(zero.filter(col("fim_applied")).count() == 0)
    assert(zero.filter(col("fim_text") =!= col("text")).count() == 0)
    // rate-r applied set == hashSample(r) with the same salt
    val half = CorpusPrep.fimTransform(docs.select(col("doc_id"), col("text")),
      "doc_id", "text", rate = 0.5, salt = "s4")
    val applied = half.filter(col("fim_applied")).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val sampled = Ops.hashSample(docs.select(col("doc_id")), "doc_id", 0.5, salt = "s4")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(applied == sampled)
  }

  test("fimTransform: spm mode reorders the SAME pieces (suffix before the " +
      "middle sentinel, prefix after it); degenerate cuts are legal") {
    val df = Seq((1L, "abcdefgh"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val psm = CorpusPrep.fimTransform(df, "doc_id", "text", rate = 1.0)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("fim_text")).toMap
    val spm = CorpusPrep.fimTransform(df, "doc_id", "text", rate = 1.0, mode = "spm")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("fim_text")).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      val (p, s, m) = parsePsm(psm(id))
      assert(spm(id) == fimPre + fimSuf + s + fimMid + p + m)
    }
    // empty doc: all three pieces empty, sentinels alone survive
    assert(psm(2L) == fimPre + fimSuf + fimMid)
  }

  test("fimTransform stays shuffle-free and inside codegen (the q146 plan)") {
    val plan = CorpusPrep.fimTransform(docs.select(col("doc_id"), col("text")),
      "doc_id", "text", rate = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("*(1)"), s"expected WholeStageCodegen:\n$plan")
  }

  test("fimTransform: null text never claims fim_applied — a consumer " +
      "selecting applied rows can never receive null training text " +
      "(concat over null is null; the row passes through like an " +
      "unsampled one)") {
    val df = Seq((0L, Option("hello world")), (1L, Option.empty[String]),
      (2L, Option.empty[String]), (3L, Option("abc")))
      .toDF("doc_id", "text")
    val out = CorpusPrep.fimTransform(df, "doc_id", "text", rate = 1.0).collect()
    assert(out.length == 4)
    out.foreach { r =>
      if (r.isNullAt(r.fieldIndex("text"))) {
        assert(!r.getAs[Boolean]("fim_applied"),
          s"null text claimed applied: doc ${r.getAs[Long]("doc_id")}")
        assert(r.isNullAt(r.fieldIndex("fim_text")))
      } else {
        assert(r.getAs[Boolean]("fim_applied"))
        assert(r.getAs[String]("fim_text") != null)
      }
    }
  }

  test("fimTransform: misuse fails loudly") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      CorpusPrep.fimTransform(df, "doc_id", "text", rate = 1.5)
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.fimTransform(df, "doc_id", "text", rate = 0.5, mode = "pms")
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.fimTransform(df, "doc_id", "text", rate = 0.5,
        preTok = "<X>", sufTok = "<X>")
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.fimTransform(df.withColumn("fim_text", lit("")),
        "doc_id", "text", rate = 0.5)
    }
  }
}

/** As-of join and broadcast range join. */
class AsofRangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin: known input — latest right row at or before each left time") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 50L), (4L, "u2", 100L)
    ).toDF("id", "user", "t")
    val right = Seq(
      ("u1", 60L, "a"), ("u1", 100L, "b"), ("u1", 150L, "c"), ("u3", 10L, "z")
    ).toDF("user", "t", "tag")
    val got = graft.operators.Ops.asofJoin(
      left, right, Seq("user"), "t", Seq("tag" -> "prior_tag"))
      .select("id", "prior_tag")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      1L -> Some("b"),  // inclusive: right at t=100 matches left at t=100
      2L -> Some("c"),  // latest ≤ 200 is t=150
      3L -> None,       // nothing at or before 50
      4L -> None))      // no right rows for u2 at all
  }

  test("asofJoin payload is row-atomic: a null field on the latest right row stays null") {
    val left = Seq((1L, "u", 10L)).toDF("id", "user", "t")
    val right = Seq(
      ("u", 1L, Option(10L), Option(0.5)),
      ("u", 2L, Option(20L), Option.empty[Double]) // latest row, value NULL
    ).toDF("user", "t", "vid", "vval")
    val r = graft.operators.Ops.asofJoin(
      left, right, Seq("user"), "t", Seq("vid" -> "pv", "vval" -> "pval")).head()
    // the latest right ROW (t=2) wins as a unit: pv=20 and pval stays
    // NULL — not back-filled with t=1's 0.5 (which would fabricate a
    // (20, 0.5) row that never existed)
    assert(r.getAs[Long]("pv") == 20L)
    assert(r.isNullAt(r.fieldIndex("pval")))
  }

  test("asofJoin matches a per-row subquery on the events table (click→latest view)") {
    val events = spark.read.option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val clicks = events.filter(col("event_type") === "click")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val got = graft.operators.Ops.asofJoin(
      clicks, views, Seq("user_id"), "ts", Seq("view_id" -> "prior_view_id"))
      .select("event_id", "prior_view_id")
    // independent formulation: max-ts view per click via join + agg
    val pairs = clicks.select(col("event_id"), col("user_id"), col("ts").as("ct"))
      .join(views.select(col("user_id"), col("ts").as("vt"), col("view_id")), Seq("user_id"))
      .filter(col("vt") <= col("ct"))
    val latest = pairs.groupBy("event_id").agg(max(struct(col("vt"), col("view_id"))).as("m"))
      .select(col("event_id"), col("m.view_id").as("prior_view_id"))
    val want = clicks.select("event_id").join(latest, Seq("event_id"), "left")
    assert(got.count() == clicks.count())
    val gotM = got.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val wantM = want.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotM == wantM)
  }

  test("q27 oracle precondition: view-side (user_id, ts) is unique in events testdata") {
    // asofJoin breaks (key, ts) ties deterministically (max payload
    // struct), but DuckDB ASOF JOIN leaves its tie choice unspecified —
    // the q27 comparison is only deterministic while the view side has
    // no duplicate (user_id, ts). Pin that precondition here, at every
    // generated scale the gate runs, so a testdata regen that violates
    // it fails loudly instead of flaking the oracle.
    for (dir <- Seq(sfDir, "/root/testdata/sf0.001", "/root/testdata/sf0.01")
        if new java.io.File(s"$dir/events.parquet").exists) {
      val views = spark.read.option("pathGlobFilter", "events.parquet").parquet(dir)
        .filter(col("event_type") === "view")
      val dups = views.groupBy("user_id", "ts").count().filter(col("count") > 1).count()
      assert(dups == 0, s"$dir: $dups duplicate (user_id, ts) view rows — q27 oracle nondeterministic")
    }
  }

  test("asofJoin plans exactly one exchange (union + window, no join)") {
    val events = spark.read.option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val clicks = events.filter(col("event_type") === "click")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val plan = graft.operators.Ops.asofJoin(
      clicks, views, Seq("user_id"), "ts", Seq("view_id" -> "prior_view_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected exactly 1 exchange:\n$plan")
  }

  test("broadcastRangeJoin: band lookup, broadcast plan, no cartesian blowup") {
    val facts = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val bands = Seq(("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 1e9))
      .toDF("band", "lo", "hi")
    val out = graft.operators.Ops.broadcastRangeJoin(
      facts, bands, "l_quantity", "lo", "hi")
    assert(out.count() == facts.count()) // bands partition the domain
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
    val byBand = out.groupBy("band").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBand.keySet == Set("low", "mid", "high") && byBand.values.forall(_ > 0))
  }

  test("perplexityBuckets: hand-computed thirds per group, ties share a bucket, " +
      "higher score = head") {
    val scored = Seq(
      ("en", 1L, -1.0), ("en", 2L, -2.0), ("en", 3L, -3.0),
      ("en", 4L, -4.0), ("en", 5L, -5.0), ("en", 6L, -6.0),
      ("de", 7L, -1.0), ("de", 8L, -1.0), ("de", 9L, -9.0), // tie at the top
      ("fr", 10L, -2.0) // single-row group
    ).toDF("lang", "doc_id", "logp")
    val got = CorpusPrep.perplexityBuckets(scored, "logp", Seq("lang"))
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    // en: pr = 0, .2, .4, .6, .8, 1 → head, head, middle, middle, tail, tail
    assert(got(1L) == "head" && got(2L) == "head")
    assert(got(3L) == "middle" && got(4L) == "middle")
    assert(got(5L) == "tail" && got(6L) == "tail")
    // de: tied best rows share pr = 0 → both head; worst pr = 1 → tail
    assert(got(7L) == "head" && got(8L) == "head" && got(9L) == "tail")
    // single-row group: pr = 0 → head
    assert(got(10L) == "head")
  }

  test("perplexityBucketsByThreshold agrees with the exact form on the real " +
      "corpus and never sorts a group in one task") {
    import graft.llm.LangModel
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val lm = LangModel.trainUnigram(d.filter(col("doc_id") < 200), "text", minCount = 2)
    val scored = LangModel.logProbPerDoc(
      d.filter(col("doc_id") >= 200), lm, "doc_id", "text")
      .join(d.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lm_logp"))
    val exact = CorpusPrep.perplexityBuckets(scored, "lm_logp", Seq("source"))
      .select(col("doc_id"), col("ppl_bucket").as("b_exact"))
    val approx = CorpusPrep.perplexityBucketsByThreshold(scored, "lm_logp", Seq("source"))
      .select(col("doc_id"), col("ppl_bucket").as("b_approx"))
    val joined = exact.join(approx, "doc_id").cache()
    val n = joined.count()
    val agree = joined.filter(col("b_exact") === col("b_approx")).count()
    assert(n > 0 && agree >= (n * 0.95).toLong,
      s"threshold form must agree with exact on >=95%: $agree/$n")
    // bucket mass lands near the requested thirds
    val frac = joined.groupBy("b_approx").count()
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    Seq("head", "middle", "tail").foreach { b =>
      assert(math.abs(frac.getOrElse(b, 0.0) - 1.0 / 3) < 0.08,
        s"$b fraction ${frac.get(b)} far from 1/3")
    }
    joined.unpersist()
    // null scores bucket to null in the threshold form (exact form
    // callers filter nulls — documented)
    val withNull = Seq(("en", 1L, Some(-1.0)), ("en", 2L, None: Option[Double]))
      .toDF("lang", "doc_id", "logp")
    val nb = CorpusPrep.perplexityBucketsByThreshold(withNull, "logp", Seq("lang"))
      .collect().map(r => r.getLong(1) -> Option(r.getString(3))).toMap
    assert(nb(2L).isEmpty, "null score must bucket to null")
    assert(nb(1L).contains("head"))
  }

  test("clusterBalancedSample: equal deterministic quota per cluster, " +
      "salt steers the within-cluster pick, output carries the cluster tag") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def run(salt: String) = CorpusPrep.clusterBalancedSample(
      docs, "doc_id", emb, "vec_id", "embedding",
      numClusters = 6, perCluster = 10, salt = salt)
    val a = run("s1").collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("cluster")))
    val b = run("s1").collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("cluster")))
    assert(a.sorted.toSeq == b.sorted.toSeq, "same salt must keep the same rows")
    // quota: every cluster with >= 10 members contributes exactly 10,
    // smaller clusters contribute all their members
    val sizes = run("s1").groupBy("cluster").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= 10), s"quota exceeded: $sizes")
    // with 500 docs over 6 clusters, every cluster holds >= 10 members
    assert(sizes.size == 6 && sizes.values.forall(_ == 10L),
      s"every cluster must fill its quota on this corpus: $sizes")
    // a different salt picks a different within-cluster subset
    val c = run("s2").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(c != a.map(_._1).toSet, "salt must steer the within-cluster pick")
  }

  test("clusterBalancedSample scale path: keep-set equality with the plain " +
      "per-cluster window form; the window input is digest-thinned, never " +
      "a full-membership cluster sort") {
    import org.apache.spark.sql.functions._
    import graft.operators.Ops
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val kept = CorpusPrep.clusterBalancedSample(
      docs, "doc_id", emb, "vec_id", "embedding",
      numClusters = 8, perCluster = 20)
    val got = kept.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("cluster"))).sorted.toSeq
    // the window-form comparator: same deterministic cell tags (fixed
    // kmeans seed), same digest order, ranked by the plain window
    val (_, tagged) = graft.llm.Similarity.ivfBuild(
      emb.select(col("vec_id"), col("embedding")), 8, "embedding", maxIter = 20)
    val cells = tagged.select(col("vec_id").as("doc_id"), col("cell").as("cluster"))
    val quotas = cells.select("cluster").distinct().withColumn("rows_count", lit(20))
    val windowForm = Ops.proportionSamples(
      docs.join(cells, Seq("doc_id")), quotas, Seq("cluster"),
      Seq(Ops.hashDigestCol(col("doc_id").cast("string"), "clusterbal"), col("doc_id")))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("cluster"))).sorted.toSeq
    assert(got == windowForm,
      "the digest-thinned scale path must keep EXACTLY the window form's rows")
    // plan audit: the per-cluster window ranks a digest-THINNED pool —
    // the threshold filter sits below the Window node, so no cluster's
    // full membership sorts through one task (the q132 verdict finding)
    val plan = kept.queryExecution.executedPlan.toString
    val wIdx = plan.indexOf("Window")
    val tIdx = plan.indexOf("__thr")
    assert(wIdx >= 0 && tIdx > wIdx,
      s"the digest-threshold filter must feed the window:\n$plan")
  }

}
