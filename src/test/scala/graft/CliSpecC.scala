package graft

import java.nio.file.{Files, Path}
import graft.cli.Cli
import graft.conf.GraftConfig

/** CLI e2e shard C (of 4) — see CliSpecBase. */
class CliSpecC extends CliSpecBase {

  test("compactor: parts collapse to one compacted part per table, lineage " +
      "continues against the compacted dir, input generation retired") {
    import spark.implicits._
    val base = tmp()
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val inA = base.resolve("ca").toString
    val inB = base.resolve("cb").toString
    val inC = base.resolve("cc").toString
    (Seq((1L, s"first batch owner doc carries the quoted text $passage"),
      (2L, "plain first batch document nothing shared at all")): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inA)
    (Seq((200L, "second batch quoting entity reuses verbatim material " +
        s"$passage trailing words continue afterwards"),
      (201L, "another clean second batch document full of fresh words")): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inB)
    (Seq((2L, "plain first batch document nothing shared at all"),
      (201L, "another clean second batch document full of fresh words"),
      (300L, "a genuinely novel third batch document with unseen content")): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inC)
    val spd = base.resolve("cstparts").toString
    val spp = base.resolve("cspparts").toString
    def conf(run: Int, in: String, stateIn: Option[String]) =
      write(base.resolve(s"cmp$run.conf"),
        s"""source { storage-type = local, dataset-dir = $in }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"cout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |  span-dedup-tokens = 10
           |  state-parts-dir = $spd
           |  span-parts-dir = $spp
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"cstate$run")}
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, inA, None)))
    val st1 = base.resolve("cstate1")
    graft.cli.Curator.main(Array("--conf", conf(2, inB, Some(st1.toString))))
    val st2 = base.resolve("cstate2")
    val markerBefore = scala.io.Source.fromFile(
      st2.resolve("_COMMITTED").toString).mkString
    def tableCount(d: String, t: String): Long =
      graft.cli.Cli.readStateTable(spark, d, t).count()
    val hashesBefore = tableCount(st2.toString, "hashes")
    val sigsBefore = tableCount(st2.toString, "sigs")
    val spansDistinctBefore =
      graft.cli.Cli.readStateTable(spark, st2.toString, "spans").distinct().count()
    // compact: state-dir is the committed generation, parts dirs come
    // from its own parameter records
    val cst = base.resolve("ccompact")
    val cf = write(base.resolve("compact.conf"),
      s"""compaction { state-dir = $st2, state-out-dir = $cst }
         |""".stripMargin)
    graft.cli.Compactor.main(Array("--conf", cf))
    // output committed with the SAME params; input generation retired
    assert(scala.io.Source.fromFile(cst.resolve("_COMMITTED").toString).mkString
      == markerBefore, "compaction must not alter the lineage parameters")
    assert(!new java.io.File(st2.resolve("_COMMITTED").toString).exists(),
      "input dir must be retired — its manifests reference swept parts")
    // one compacted part per table; superseded parts swept
    for ((pd, t) <- Seq((spd, "hashes"), (spd, "sigs"), (spd, "hotcounts"),
        (spp, "spans"))) {
      val manifest = scala.io.Source.fromFile(
        cst.resolve(s"${t}manifest").toString).mkString
        .split("\n").filter(_.nonEmpty)
      assert(manifest.length == 1 && manifest(0).endsWith("part-c1"),
        s"$t manifest: ${manifest.toSeq}")
      assert(new java.io.File(s"$pd/$t").listFiles().map(_.getName).toSet ==
        Set("part-c1"), s"$t parts dir must hold only the compacted part")
    }
    // semantics preserved: concatenation for hashes/sigs, sum-merge for
    // hotcounts, distinct for spans
    assert(tableCount(cst.toString, "hashes") == hashesBefore)
    assert(tableCount(cst.toString, "sigs") == sigsBefore)
    assert(tableCount(cst.toString, "spans") == spansDistinctBefore)
    val countsSum = graft.cli.Cli.readStateTable(spark, cst.toString, "hotcounts")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(countsSum == sigsBefore * 4,
      "merged counts must still cover every signature's four bands")
    assert(new java.io.File(cst.resolve("hot").toString).exists())
    assert(new java.io.File(cst.resolve("spanbloom").toString).exists())
    // the lineage continues transparently: everything seen converges,
    // fresh content survives, the new batch part sits beside part-c1
    graft.cli.Curator.main(Array("--conf", conf(3, inC, Some(cst.toString))))
    val ids3 = spark.read.parquet(base.resolve("cout3").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids3 == Set(300L), s"convergence through compaction broken: $ids3")
    val manifest3 = scala.io.Source.fromFile(
      base.resolve("cstate3").resolve("hashesmanifest").toString).mkString
      .split("\n").filter(_.nonEmpty)
    assert(manifest3.length == 2 && manifest3(0).endsWith("part-c1") &&
      manifest3(1).endsWith("part-1"), s"manifest: ${manifest3.toSeq}")
    // rewrite-mode state (no parts anywhere) has nothing to compact
    val plainState = base.resolve("plainstate")
    val pc = write(base.resolve("plain.conf"),
      s"""source { storage-type = local, dataset-dir = $inA }
         |target { storage-type = local, dataset-dir = ${base.resolve("plainout")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-quality = 0.0, state-out-dir = $plainState }
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", pc))
    val err = intercept[IllegalArgumentException] {
      graft.cli.Compactor.main(Array("--conf", write(base.resolve("badc.conf"),
        s"""compaction { state-dir = $plainState, state-out-dir = ${base.resolve("badout")} }
           |""".stripMargin)))
    }
    assert(err.getMessage.contains("nothing to compact"), err.getMessage)
  }

  test("indexer: build lays out cells + PQ codes with a perfect full-probe " +
      "recall; append grows without retraining; drift rejected") {
    val base = tmp()
    val idx = base.resolve("annindex").toString
    def conf(mode: String, src: String, pq: Boolean, recallQ: Int) =
      write(base.resolve(s"idx_${mode}_${pq}_$recallQ.conf"),
        s"""index {
           |  embeddings-dir = $src
           |  index-dir = $idx
           |  mode = $mode
           |  num-cells = 8
           |  kmeans-max-iter = 8
           |${if (pq) "  pq-m = 8\n  pq-k = 16" else ""}
           |  recall-queries = $recallQ
           |  recall-nprobe = 8
           |  recall-oversample = 100
           |}
           |""".stripMargin)
    val embSrc = s"$sfDir/embeddings.parquet"
    graft.cli.Indexer.main(Array("--conf", conf("build", embSrc, pq = true, recallQ = 5)))
    val n = spark.read.parquet(embSrc).count()
    assert(new java.io.File(s"$idx/_BUILT").exists())
    assert(new java.io.File(s"$idx/corpus").listFiles()
      .count(_.getName.startsWith("cell=")) == 8)
    assert(new java.io.File(s"$idx/codes").listFiles()
      .count(_.getName.startsWith("cell=")) == 8)
    assert(spark.read.parquet(s"$idx/codes").count() == n)
    assert(spark.read.parquet(s"$idx/pq/codebook").count() == 8 * 16)
    // full probe + full oversample → the recall monitor reads exactly 1.0
    val rec = spark.read.parquet(s"$idx/recall")
    assert(rec.count() == 5)
    assert(rec.filter(org.apache.spark.sql.functions.col("recall") < 1.0).count() == 0,
      "full-probe recall must be exact")
    // append: same vectors under fresh ids — no retraining, cells grow
    import spark.implicits._
    val more = base.resolve("more").toString
    spark.read.parquet(embSrc)
      .select((org.apache.spark.sql.functions.col("vec_id") + 10000L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .write.parquet(more)
    graft.cli.Indexer.main(Array("--conf", conf("append", more, pq = true, recallQ = 0)))
    assert(new java.io.File(s"$idx/_BUILT").exists(), "marker must come back after append")
    assert(spark.read.parquet(s"$idx/corpus").count() == 2 * n)
    assert(spark.read.parquet(s"$idx/codes").count() == 2 * n)
    // drift: appending without the pq knobs against a coded index
    val err = intercept[IllegalArgumentException] {
      graft.cli.Indexer.main(Array("--conf", conf("append", more, pq = false, recallQ = 0)))
    }
    assert(err.getMessage.contains("pq-m"), err.getMessage)
    // review-fix pin: a codebook-mismatch append is a clean NO-OP —
    // validation runs before the marker comes down or any rows land
    val nBefore = spark.read.parquet(s"$idx/corpus").count()
    val mism = write(base.resolve("idx_mismatch.conf"),
      s"""index {
         |  embeddings-dir = $more
         |  index-dir = $idx
         |  mode = append
         |  pq-m = 8
         |  pq-k = 32
         |}
         |""".stripMargin)
    val err3 = intercept[IllegalArgumentException] {
      graft.cli.Indexer.main(Array("--conf", mism))
    }
    assert(err3.getMessage.contains("codebook"), err3.getMessage)
    assert(new java.io.File(s"$idx/_BUILT").exists(),
      "marker must survive a rejected append")
    assert(spark.read.parquet(s"$idx/corpus").count() == nBefore,
      "no rows may land before validation")
    // rebuilding over a committed index is refused
    val err2 = intercept[IllegalArgumentException] {
      graft.cli.Indexer.main(Array("--conf", conf("build", embSrc, pq = true, recallQ = 0)))
    }
    assert(err2.getMessage.contains("already built"), err2.getMessage)
    // min-recall gate: an impossible floor breaches AFTER the report
    // lands (full-probe recall is 1.0, so floor 1.01 must trip)
    val gateConf = write(base.resolve("idx_gate.conf"),
      s"""index {
         |  embeddings-dir = $embSrc
         |  index-dir = $idx
         |  mode = append
         |  pq-m = 8
         |  pq-k = 16
         |  recall-queries = 3
         |  recall-nprobe = 8
         |  recall-oversample = 100
         |  min-recall = 1.01
         |}
         |""".stripMargin)
    val gate = intercept[IllegalStateException] {
      graft.cli.Indexer.main(Array("--conf", gateConf))
    }
    assert(gate.getMessage.contains("rebuild"), gate.getMessage)
    // (this append re-used the original ids, so the digest sample may
    // collapse duplicates — presence, not count, is the contract here)
    assert(spark.read.parquet(s"$idx/recall").count() >= 1,
      "the recall artifact must land before the gate trips")
  }

  test("tokenizer: trains both layouts end-to-end, artifacts drive every consumer, " +
      "self-check gates, missing knobs rejected") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    def conf(name: String, byteLevel: Boolean, extra: String = "") =
      write(base.resolve(s"tok_$name.conf"),
        s"""tokenizer {
           |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
           |  num-merges = 48
           |  byte-level = $byteLevel
           |  merges-path = ${base.resolve(s"m_$name.txt")}
           |  vocab-path = ${base.resolve(s"v_$name.txt")}
           |$extra
           |}
           |""".stripMargin)
    // segment level (byte-fallback vocab): artifacts land, self-check runs
    graft.cli.Tokenizer.main(Array("--conf", conf("seg", byteLevel = false)))
    val segMerges = base.resolve("m_seg.txt").toString
    val segVocab = base.resolve("v_seg.txt").toString
    val mergeLines = scala.io.Source.fromFile(segMerges, "UTF-8").getLines().toList
    assert(mergeLines.head == "#version: 0.2" && mergeLines.length == 49)
    val vocabLines = scala.io.Source.fromFile(segVocab, "UTF-8").getLines().toList
    assert(vocabLines.head == "<unk>" && vocabLines(1) == "<eos>")
    // the artifacts drive an existing consumer lossless end-to-end
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val rt = docs.select(
        graft.functions.GraftFunctions.bpeDecode(
          graft.functions.GraftFunctions.bpeEncodeLossless(
            col("text"), segMerges, segVocab), segVocab).as("rt"),
        col("text"))
      .filter(col("rt") =!= col("text")).count()
    assert(rt == 0, "CLI-trained artifacts must round-trip through the consumers")
    // byte level: same surface, GPT-2-style layout
    graft.cli.Tokenizer.main(Array("--conf", conf("byte", byteLevel = true)))
    val byteVocab = scala.io.Source.fromFile(
      base.resolve("v_byte.txt").toString, "UTF-8").getLines().toList
    assert(byteVocab.take(2) == List("<unk>", "<eos>") && byteVocab.length == 2 + 256 + 48)
    // CLI parity with the library call (same corpus, same determinism)
    val lib = graft.llm.BpeTrainer.learnMerges(
      spark.read.parquet(s"$sfDir/documents.parquet").select("text"),
      "text", numMerges = 48)
    assert(mergeLines.tail == lib.map { case (a, b) => s"$a $b" },
      "CLI merges must equal the library's on the same corpus")
    // missing required knobs are clean failures
    val bad = write(base.resolve("tok_bad.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  merges-path = ${base.resolve("m_bad.txt")}
         |  vocab-path = ${base.resolve("v_bad.txt")}
         |}
         |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", bad))
    }
    assert(e.getMessage.contains("num-merges"), e.getMessage)
    // special-tokens knob: spellings land at the vocab TAIL in
    // declaration order (fixed ids), the CLI's own planted self-check
    // passes (it asserts exactly-one-fixed-id + round-trip), and the
    // artifacts drive the encode surface with the specials protected
    val spConf = conf("sp", byteLevel = true,
      """  special-tokens = ["<|endoftext|>", "<|fim|>"]""")
    graft.cli.Tokenizer.main(Array("--conf", spConf))
    val spVocab = scala.io.Source.fromFile(
      base.resolve("v_sp.txt").toString, "UTF-8").getLines().toList
    assert(spVocab.takeRight(2) == List("<|endoftext|>", "<|fim|>"))
    val eotId = spVocab.length - 2
    val ids = spark.range(1)
      .select(org.apache.spark.sql.functions.lit("a<|endoftext|>b").as("t"))
      .select(graft.functions.GraftFunctions.bpeByteEncode(col("t"),
        base.resolve("m_sp.txt").toString, base.resolve("v_sp.txt").toString,
        Seq("<|endoftext|>", "<|fim|>")).as("ids"))
      .head().getSeq[Int](0)
    assert(ids.count(_ == eotId) == 1, s"want one id $eotId in $ids")
    // a whitespace-bearing spelling is rejected loudly
    val wsConf = conf("ws", byteLevel = false,
      """  special-tokens = ["<|bad token|>"]""")
    val we = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", wsConf))
    }
    assert(we.getMessage.contains("whitespace-free"), we.getMessage)
    // merges-checkpoint-path: force the distributed path (max-words=10),
    // pre-seed the checkpoint with a ROUND-BOUNDARY prefix captured from
    // the library's own progress hook (what a crashed CLI run leaves
    // behind) — the CLI must RESUME (identical final merges to an
    // uninterrupted run) and leave the checkpoint holding the full list
    val ckpt = base.resolve("merges_ckpt.txt").toString
    val ckptKnobs = s"  max-words = 10\n  checkpoint-every = 1\n" +
      s"  merges-checkpoint-path = $ckpt\n"
    graft.cli.Tokenizer.main(Array("--conf",
      conf("full", byteLevel = false, "  max-words = 10\n  checkpoint-every = 1\n")))
    val fullMerges = graft.llm.BpeTrainer.loadMerges(spark,
      base.resolve("m_full.txt").toString)
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    graft.llm.BpeTrainer.learnMerges(
      spark.read.parquet(s"$sfDir/documents.parquet").select("text"), "text",
      numMerges = 48, maxWords = 10, checkpointEvery = 1,
      onProgress = ms => { snaps += ms; () })
    val mid = snaps.find(s => s.nonEmpty && s.size < fullMerges.size).get
    graft.llm.BpeTrainer.saveMerges(spark, ckpt, mid)
    graft.cli.Tokenizer.main(Array("--conf", conf("res", byteLevel = false, ckptKnobs)))
    val resumed = graft.llm.BpeTrainer.loadMerges(spark,
      base.resolve("m_res.txt").toString)
    assert(resumed == fullMerges,
      s"resumed CLI run must reproduce the uninterrupted run's merges " +
        s"(resumed from ${mid.size}/${fullMerges.size})")
    assert(graft.llm.BpeTrainer.loadMerges(spark, ckpt) == fullMerges,
      "the checkpoint file must end holding the full merge list")
    // a stale over-long checkpoint (from another config) is rejected
    graft.llm.BpeTrainer.saveMerges(spark, ckpt, fullMerges ++ fullMerges.take(5))
    val ce = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", conf("res2", byteLevel = false, ckptKnobs)))
    }
    assert(ce.getMessage.contains("stale checkpoint"), ce.getMessage)
    // crash-window recovery: promotion renames the live checkpoint
    // ASIDE (cp -> cp.old) before promoting the fresh .tmp, so a crash
    // between the two leaves cp missing but cp.old complete — resume
    // must pick the .old up (the prior delete-then-rename scheme left
    // NOTHING there and silently retrained). The .tmp is never trusted
    // (its own write may have crashed mid-line).
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), false)
    graft.llm.BpeTrainer.saveMerges(spark, ckpt + ".old", mid)
    graft.llm.BpeTrainer.saveMerges(spark, ckpt + ".tmp",
      fullMerges ++ fullMerges.take(5)) // a garbage tmp must be ignored
    graft.cli.Tokenizer.main(Array("--conf", conf("res3", byteLevel = false, ckptKnobs)))
    assert(graft.llm.BpeTrainer.loadMerges(spark,
      base.resolve("m_res3.txt").toString) == fullMerges,
      "resume from the renamed-aside checkpoint must reproduce the full run")
    assert(graft.llm.BpeTrainer.loadMerges(spark, ckpt) == fullMerges)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(ckpt + ".old")),
      "a completed promotion retires the aside copy")
  }

  test("tokenizer algo = unigram | wordpiece: artifacts land in their published " +
      "formats, drive the expression consumers, self-checks gate, bad algo rejected") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    // unigram: TSV model, lossless through graft_unigram_* end to end
    val ugModel = base.resolve("unigram.tsv").toString
    val ugConf = write(base.resolve("tok_ug.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  algo = unigram
         |  target-pieces = 400
         |  max-piece-len = 6
         |  model-path = $ugModel
         |}
         |""".stripMargin)
    graft.cli.Tokenizer.main(Array("--conf", ugConf))
    val ugLines = scala.io.Source.fromFile(ugModel, "UTF-8").getLines().toList
    assert(ugLines.head.startsWith("<unk>\t") && ugLines(1).startsWith("<eos>\t"))
    assert(ugLines(2).startsWith("<0x00>\t") && ugLines(257).startsWith("<0xFF>\t"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val ugRt = docs.select(
        graft.functions.GraftFunctions.unigramDecode(
          graft.functions.GraftFunctions.unigramEncodeLossless(
            col("text"), ugModel), ugModel).as("rt"),
        col("text"))
      .filter(col("rt") =!= col("text")).count()
    assert(ugRt == 0, "CLI-trained unigram model must round-trip through the consumers")
    // missing target-pieces is a clean failure
    val ugBad = write(base.resolve("tok_ug_bad.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  algo = unigram
         |  model-path = ${base.resolve("ug_bad.tsv")}
         |}
         |""".stripMargin)
    val e1 = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", ugBad))
    }
    assert(e1.getMessage.contains("target-pieces"), e1.getMessage)
    // wordpiece: published vocab.txt, specials at the head, structural
    // round-trip through graft_wordpiece_roundtrip
    val wpVocab = base.resolve("wp_vocab.txt").toString
    val wpConf = write(base.resolve("tok_wp.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  algo = wordpiece
         |  vocab-size = 400
         |  vocab-path = $wpVocab
         |}
         |""".stripMargin)
    graft.cli.Tokenizer.main(Array("--conf", wpConf))
    val wpLines = scala.io.Source.fromFile(wpVocab, "UTF-8").getLines().toList
    assert(wpLines.take(5) == graft.llm.WordPieceTrainer.DefaultSpecials.toList)
    // the tiny sf0.001 corpus exhausts mergeable pairs early — learnVocab
    // stops when no pair occurs twice, never pads
    assert(wpLines.length > 50 && wpLines.length <= 400)
    assert(wpLines.distinct.length == wpLines.length)
    val wpRt = docs.select(
        graft.functions.GraftFunctions.wordPieceRoundtrip(col("text"), wpVocab).as("rt"),
        col("text"))
      .filter(col("rt") =!= col("text")).count()
    assert(wpRt == 0, "CLI-trained wordpiece vocab must survive the structural round-trip")
    // mode = evaluate: one report row per artifact across families,
    // each family's own round-trip contract, the lossless gate
    val merges = graft.llm.BpeTrainer.learnMerges(
      spark.read.parquet(s"$sfDir/documents.parquet").select("text"),
      "text", numMerges = 48)
    val (bm, bv) = (base.resolve("ev_m.txt").toString, base.resolve("ev_v.txt").toString)
    graft.llm.BpeTrainer.saveMerges(spark, bm, merges)
    graft.llm.BpeTrainer.saveVocab(spark, bv, graft.llm.BpeTrainer.buildVocab(
      spark.read.parquet(s"$sfDir/documents.parquet").select("text"), "text", merges))
    val evRep = base.resolve("ev_report").toString
    val evConf = write(base.resolve("tok_ev.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  mode = evaluate
         |  evaluate = ["seg|bpe|$bm|$bv", "ug|unigram|$ugModel", "wp|wordpiece|$wpVocab"]
         |  report-dir = $evRep
         |  require-lossless = true
         |}
         |""".stripMargin)
    graft.cli.Tokenizer.main(Array("--conf", evConf))
    val ev = spark.read.parquet(evRep).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(ev.size == 3)
    val n = ev("seg").getAs[Long]("n_docs")
    assert(n > 0 && ev.values.forall(_.getAs[Long]("n_docs") == n))
    // every family round-trips under its own contract on this corpus
    assert(ev.values.forall(r => r.getAs[Long]("roundtrip_ok") == n))
    // fallback_ids now counts real byte-fallback emissions: the unigram
    // artifact trained on this very corpus covers its alphabet → 0
    assert(ev("seg").getAs[Long]("fallback_ids") >= 0)
    assert(ev("ug").getAs[Long]("fallback_ids") == 0)
    // compression is measured, not asserted between families — but every
    // artifact must beat one byte per id on natural text
    assert(ev.values.forall(_.getAs[Double]("bytes_per_id") > 1.0))
    // group-column: per-language fertility rows (one per artifact×lang)
    // that sum-decompose the ungrouped totals exactly
    val evRepG = base.resolve("ev_report_g").toString
    graft.cli.Tokenizer.main(Array("--conf", write(base.resolve("tok_ev_g.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  mode = evaluate
         |  evaluate = ["seg|bpe|$bm|$bv", "ug|unigram|$ugModel"]
         |  group-column = lang
         |  report-dir = $evRepG
         |}
         |""".stripMargin)))
    val evg = spark.read.parquet(evRepG)
    val nLangs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang").distinct().count()
    assert(evg.filter(col("name") === "seg").count() == nLangs)
    val segTotals = evg.filter(col("name") === "seg").agg(
      org.apache.spark.sql.functions.sum("n_docs"),
      org.apache.spark.sql.functions.sum("total_ids"),
      org.apache.spark.sql.functions.sum("roundtrip_ok")).head()
    assert(segTotals.getLong(0) == n)
    assert(segTotals.getLong(1) == ev("seg").getAs[Long]("total_ids"))
    assert(segTotals.getLong(2) == n)
    // unknown group column is a clean failure
    val e5 = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", write(base.resolve("tok_ev_badg.conf"),
        s"""tokenizer {
           |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
           |  mode = evaluate
           |  evaluate = ["seg|bpe|$bm|$bv"]
           |  group-column = nope
           |  report-dir = ${base.resolve("ev_badg")}
           |}
           |""".stripMargin)))
    }
    assert(e5.getMessage.contains("group-column"), e5.getMessage)
    // malformed spec is a clean failure
    val evBad = write(base.resolve("tok_ev_bad.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  mode = evaluate
         |  evaluate = ["just-a-name"]
         |  report-dir = ${base.resolve("ev_bad")}
         |}
         |""".stripMargin)
    val e4 = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", evBad))
    }
    assert(e4.getMessage.contains("name|algo|path"), e4.getMessage)
    // unknown algo fails loudly before any work
    val badAlgo = write(base.resolve("tok_bad_algo.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  algo = sentencepiece
         |  model-path = ${base.resolve("x.tsv")}
         |}
         |""".stripMargin)
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", badAlgo))
    }
    assert(e2.getMessage.contains("sentencepiece"), e2.getMessage)
  }

  test("tokenizer unigram crash-resume: round-boundary checkpoints under the " +
      "write-aside-promote protocol; resume reproduces the run; stale rejected") {
    val base = tmp()
    val model = base.resolve("ug_cr.tsv").toString
    val cp = base.resolve("ug_cr_ck.tsv").toString
    def conf(target: Int) = write(base.resolve(s"tok_cr_$target.conf"),
      s"""tokenizer {
         |  source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |  algo = unigram
         |  target-pieces = $target
         |  max-piece-len = 6
         |  model-path = $model
         |  model-checkpoint-path = $cp
         |}
         |""".stripMargin)
    graft.cli.Tokenizer.main(Array("--conf", conf(400)))
    val modelBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(model))
    assert(new java.io.File(cp).exists(), "the final round must leave a checkpoint")
    assert(!new java.io.File(cp + ".old").exists(),
      "a completed promotion retires the aside copy")
    // crash after the last checkpoint: the model never landed — rerun
    // resumes from the checkpoint and writes the identical model
    java.nio.file.Files.delete(java.nio.file.Paths.get(model))
    graft.cli.Tokenizer.main(Array("--conf", conf(400)))
    assert(java.util.Arrays.equals(modelBytes,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(model))),
      "resume must reproduce the uninterrupted model byte-for-byte")
    // crash WINDOW between rename-aside and promote: only cp.old is
    // complete, the .tmp is garbage — recovery resumes from the aside
    java.nio.file.Files.move(java.nio.file.Paths.get(cp),
      java.nio.file.Paths.get(cp + ".old"))
    java.nio.file.Files.write(java.nio.file.Paths.get(cp + ".tmp"),
      "garbage".getBytes("UTF-8"))
    graft.cli.Tokenizer.main(Array("--conf", conf(400)))
    assert(java.util.Arrays.equals(modelBytes,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(model))))
    assert(!new java.io.File(cp + ".old").exists())
    // a checkpoint from another configuration is refused by its header
    val e = intercept[IllegalArgumentException] {
      graft.cli.Tokenizer.main(Array("--conf", conf(300)))
    }
    assert(e.getMessage.contains("stale checkpoint"), e.getMessage)
  }

  test("curator unigram-model: budget chunking, token_ids, and packing run the " +
      "whole token pipeline under the unigram tokenizer; bpe-* mixing rejected") {
    import org.apache.spark.sql.functions.{col, explode, sum => asum, size => asize}
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = base.resolve("ug.tsv").toString
    graft.llm.UnigramTrainer.save(spark, model,
      graft.llm.UnigramTrainer.train(docs.select("text"), "text",
        targetPieces = 400, maxPieceLen = 6))
    def conf(out: String, extra: String) = write(base.resolve(s"ug${extra.length}.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  unigram-model = $model
         |$extra
         |}
         |""".stripMargin)
    // run 1: budget chunking + per-chunk ids — the declared chunk cost
    // must equal what the encode actually emits, row for row
    val flat = base.resolve("ug_flat").toString
    graft.cli.Curator.main(Array("--conf",
      conf(flat, "  bpe-budget = 64\n  unigram-ids = true")))
    val flatRows = spark.read.parquet(flat)
    val nChunks = flatRows.count()
    assert(nChunks > 0)
    assert(flatRows.filter(col("chunk_bpe_tokens") =!= asize(col("token_ids"))).count() == 0,
      "chunk_bpe_tokens must equal size(token_ids) under the same model")
    assert(flatRows.filter(col("chunk_bpe_tokens") > 64 && col("chunk_tokens") > 1).count() == 0,
      "multi-token chunks never exceed the budget")
    val nIds = flatRows.select(asum(asize(col("token_ids")) + 1)).head().getLong(0)
    // run 2: same chunking + packing — <eos> is id 1 by the unigram
    // layout; conservation holds chunk-for-chunk
    val packed = base.resolve("ug_packed").toString
    graft.cli.Curator.main(Array("--conf",
      conf(packed, "  bpe-budget = 64\n  pack-seq-len = 128\n  pack-buckets = 2")))
    val packedRows = spark.read.parquet(packed)
    assert(packedRows.select(asum(col("n_tokens"))).head().getLong(0) == nIds,
      "packing must conserve every chunk's ids + one <eos> each")
    assert(packedRows.select(explode(col("input_ids")).as("i"))
      .filter(col("i") === 1).count() == nChunks,
      "every chunk ends with the layout's <eos> id 1")
    // run 3: pack-mode = pad — one padded sequence per chunk (the
    // SFT-style export), zero cross-doc packing, report reads waste
    val padOut = base.resolve("ug_pad").toString
    val padRep = base.resolve("ug_pad_rep").toString
    graft.cli.Curator.main(Array("--conf",
      conf(padOut, "  bpe-budget = 64\n  pack-seq-len = 128\n" +
        s"  pack-mode = pad\n  pack-report-dir = $padRep")))
    val padRows = spark.read.parquet(padOut)
    assert(padRows.count() == nChunks, "pad mode keeps one sequence per chunk")
    assert(padRows.filter(asize(col("input_ids")) =!= 128).count() == 0)
    assert(padRows.filter(col("truncated")).count() == 0,
      "budget 64 chunks never overflow seqLen-1 = 127")
    // the separator terminates the real ids at position n_tokens - 1
    assert(padRows.filter(
      org.apache.spark.sql.functions.element_at(
        col("input_ids"), col("n_tokens").cast("int")) =!= 1).count() == 0)
    val rep = spark.read.parquet(padRep).head()
    assert(rep.getAs[Long]("n_sequences") == nChunks &&
      rep.getAs[Double]("efficiency") < 1.0)
    // pad-mode dead-config guards
    val e3 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(base.resolve("ug_x1").toString,
          "  bpe-budget = 64\n  pack-seq-len = 128\n  pack-mode = pad\n" +
            "  pack-buckets = 2")))
    }
    assert(e3.getMessage.contains("stream packing only"), e3.getMessage)
    // run 4: real-token-counts — budgets and the data card in the
    // TRAINING tokenizer's units, pinned against an independent
    // recomputation through the expression surface
    val rtOut = base.resolve("ug_rt").toString
    val rtCard = base.resolve("ug_rt_card").toString
    graft.cli.Curator.main(Array("--conf",
      conf(rtOut, "  real-token-counts = true\n" +
        "  token-budgets { src0 = 2000 }\n  token-budget-default = -1\n" +
        s"  report-dir = $rtCard\n" +
        "  report-group-columns = [\"source\"]")))
    val rtRows = spark.read.parquet(rtOut)
    // kept src0 token mass, measured in unigram ids, respects the cap
    // (the crossing doc may finish over — the documented contract)
    val kept = rtRows.filter(col("source") === "src0")
    val keptIds = kept.select(org.apache.spark.sql.functions.sum(
      graft.functions.GraftFunctions.unigramCount(col("text"), model))).head().getLong(0)
    val maxDoc = kept.select(org.apache.spark.sql.functions.max(
      graft.functions.GraftFunctions.unigramCount(col("text"), model))).head().getInt(0)
    assert(keptIds <= 2000 + maxDoc, s"src0 kept $keptIds unigram ids vs budget 2000")
    assert(keptIds > 0)
    // the card's total_tokens equals the unigram count over the same
    // docs — but the card covers the CURATED frame (pre-budget), so
    // recompute against the budget-free run's source
    val card = spark.read.parquet(rtCard)
    val cardTotal = card.select(org.apache.spark.sql.functions.sum("total_tokens"))
      .head().getLong(0)
    assert(cardTotal > 0)
    // same run WITHOUT the flag: same curated set (n_docs equal), but
    // total_tokens reverts to the whitespace heuristic — proving the
    // real counter actually drove the card
    val wsCard = base.resolve("ug_ws_card").toString
    graft.cli.Curator.main(Array("--conf",
      conf(base.resolve("ug_ws_out").toString,
        s"  report-dir = $wsCard\n  report-group-columns = [\"source\"]")))
    val ws = spark.read.parquet(wsCard)
    assert(card.select(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0) ==
      ws.select(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0))
    assert(cardTotal != ws.select(org.apache.spark.sql.functions.sum("total_tokens"))
      .head().getLong(0), "the real-tokenizer card must differ from the heuristic card")
    // real-token-counts without any tokenizer is refused
    val rtBad = write(base.resolve("ug_rt_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("ug_rt_bad_out")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { real-token-counts = true }
         |""".stripMargin)
    val eRt = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", rtBad))
    }
    assert(eRt.getMessage.contains("real-token-counts"), eRt.getMessage)
    // mixing tokenizer families in one run is refused up front
    val mixed = write(base.resolve("ug_mixed.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("ug_mix_out")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  unigram-model = $model
         |  bpe-merges = ${base.resolve("never.txt")}
         |}
         |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", mixed))
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
    // unigram-ids without a model is dead config
    val dead = write(base.resolve("ug_dead.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("ug_dead_out")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { unigram-ids = true }
         |""".stripMargin)
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", dead))
    }
    assert(e2.getMessage.contains("dead config"), e2.getMessage)
  }

  test("indexer compact: repeated appends pile files per cell; compact rewrites " +
      "to one file per cell (corpus + codes, one marker window), recall is " +
      "unchanged, appends continue") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    val idx = base.resolve("cidx").toString
    def conf(name: String, mode: String, src: String, extra: String = "") =
      write(base.resolve(s"cidx_$name.conf"),
        s"""index {
           |  embeddings-dir = $src
           |  index-dir = $idx
           |  mode = $mode
           |  num-cells = 4
           |  kmeans-max-iter = 8
           |  pq-m = 8
           |  pq-k = 16
           |$extra
           |}
           |""".stripMargin)
    val embSrc = s"$sfDir/embeddings.parquet"
    graft.cli.Indexer.main(Array("--conf", conf("build", "build", embSrc)))
    val n = spark.read.parquet(embSrc).count()
    // 3 appends, fresh ids each — every touched cell gains a file per batch
    (1 to 3).foreach { i =>
      val more = base.resolve(s"more$i").toString
      spark.read.parquet(embSrc)
        .select((col("vec_id") + i * 10000L).as("vec_id"), col("embedding"))
        .write.parquet(more)
      graft.cli.Indexer.main(Array("--conf", conf(s"ap$i", "append", more)))
    }
    def cellFileCounts(tbl: String): Map[String, Int] =
      new java.io.File(s"$idx/$tbl").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles().count(f => f.isFile && f.getName.startsWith("part-")))
        .toMap
    assert(cellFileCounts("corpus").values.max > 1,
      "appends must have accumulated multiple files in at least one cell")
    // content digests before compaction (xor: overflow-free, order-free);
    // recall is measured full-probe (= exact) by the compact run below
    def corpusDigest: Long = spark.read.parquet(s"$idx/corpus")
      .selectExpr("bit_xor(xxhash64(vec_id, cell)) AS d").head.getLong(0)
    val corpusBefore = corpusDigest
    val codesBefore = spark.read.parquet(s"$idx/codes").count()
    graft.cli.Indexer.main(Array("--conf", conf("cp", "compact", embSrc,
      "  recall-queries = 4\n  recall-nprobe = 4\n  recall-oversample = 100")))
    // one file per cell in BOTH tables, marker restored, content identical
    assert(cellFileCounts("corpus").values.forall(_ == 1),
      s"corpus cells not compacted: ${cellFileCounts("corpus")}")
    assert(cellFileCounts("codes").values.forall(_ == 1),
      s"codes cells not compacted: ${cellFileCounts("codes")}")
    assert(new java.io.File(s"$idx/_BUILT").exists(), "marker must come back")
    assert(spark.read.parquet(s"$idx/corpus").count() == 4 * n)
    assert(corpusDigest == corpusBefore,
      "compaction must not change corpus content")
    assert(spark.read.parquet(s"$idx/codes").count() == codesBefore)
    // full-probe recall over the compacted layout stays exact
    val rec = spark.read.parquet(s"$idx/recall")
    assert(rec.count() == 4 &&
      rec.filter(col("recall") < 1.0).count() == 0,
      "recall must be unchanged (exact) after compaction")
    // a second compact run is a cheap no-op: everything already tight
    graft.cli.Indexer.main(Array("--conf", conf("cp2", "compact", embSrc)))
    assert(cellFileCounts("corpus").values.forall(_ == 1))
    // appends continue against the compacted layout
    val more = base.resolve("more9").toString
    spark.read.parquet(embSrc)
      .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
      .write.parquet(more)
    graft.cli.Indexer.main(Array("--conf", conf("ap9", "append", more)))
    assert(spark.read.parquet(s"$idx/corpus").count() == 5 * n)
    assert(new java.io.File(s"$idx/_BUILT").exists())
  }

  test("indexer monitor: appends degrade recall below the floor; a plain " +
      "monitor run alerts; one rebuild-on-breach run retrains, swaps " +
      "atomically, retires the old index, and restores the gate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{avg => favg, col}
    val base = tmp()
    val idx = base.resolve("monidx").toString
    // three tight 4-d clusters; the appended one sits EXACTLY between
    // the two build-time centroids, so its members split ~half/half
    // across the two cells and an nprobe=1 probe finds only half of
    // any appended query's true neighbors — the drift signature the
    // monitor exists to catch
    def noise(seed: String, j: Int) =
      ((scala.util.hashing.MurmurHash3.stringHash(s"$seed-$j") & 0xFFFF) / 65536.0f - 0.5f) * 0.2f
    def cluster(lo: Long, n: Int, cx: Float, cy: Float) =
      (0 until n).map { i =>
        val id = lo + i
        (id, Array(cx + noise(s"v$id", 0), cy + noise(s"v$id", 1),
          noise(s"v$id", 2), noise(s"v$id", 3)))
      }
    val builtSrc = base.resolve("mon_built").toString
    val apSrc = base.resolve("mon_appended").toString
    (cluster(0L, 60, 10f, 0f) ++ cluster(100L, 60, 0f, 10f))
      .toDF("vec_id", "embedding").write.parquet(builtSrc)
    cluster(200L, 80, 6f, 6f).toDF("vec_id", "embedding").write.parquet(apSrc)
    def conf(name: String, mode: String, src: String, cells: Int, extra: String) =
      write(base.resolve(s"mon_$name.conf"),
        s"""index {
           |  embeddings-dir = $src
           |  index-dir = $idx
           |  mode = $mode
           |  num-cells = $cells
           |  kmeans-max-iter = 10
           |  recall-queries = 40
           |  recall-k = 5
           |  recall-nprobe = 1
           |$extra
           |}
           |""".stripMargin)
    // build on two clusters: each lives in one cell, the gate passes
    graft.cli.Indexer.main(Array("--conf",
      conf("build", "build", builtSrc, 2, "  min-recall = 0.9")))
    // the between-centroids cluster arrives
    graft.cli.Indexer.main(Array("--conf",
      conf("append", "append", apSrc, 2, "")))
    // plain monitor: reports, then alerts nonzero
    val breach = intercept[IllegalStateException] {
      graft.cli.Indexer.main(Array("--conf",
        conf("watch", "monitor", apSrc, 2, "  min-recall = 0.9")))
    }
    assert(breach.getMessage.contains("rebuild"), breach.getMessage)
    val degraded = spark.read.parquet(s"$idx/recall")
      .agg(favg("recall")).head().getDouble(0)
    assert(degraded < 0.9, s"appends must degrade nprobe=1 recall: $degraded")
    // rebuild-on-breach: retrain (3 cells now — the grown corpus has 3
    // clusters), swap, retire, and the gate passes in the same run
    graft.cli.Indexer.main(Array("--conf",
      conf("heal", "monitor", apSrc, 3,
        "  min-recall = 0.9\n  rebuild-on-breach = true")))
    assert(new java.io.File(s"$idx/_BUILT").exists(), "promoted index committed")
    assert(new java.io.File(s"$idx.retired/_BUILT").exists(),
      "old index retired intact")
    assert(!new java.io.File(s"$idx.rebuild").exists(), "staging dir promoted away")
    assert(spark.read.parquet(s"$idx/corpus").count() == 200,
      "rebuild covers the whole grown corpus")
    assert(new java.io.File(s"$idx/corpus").listFiles()
      .count(_.getName.startsWith("cell=")) == 3, "retrained cell layout")
    val restored = spark.read.parquet(s"$idx/recall")
      .agg(favg("recall")).head().getDouble(0)
    assert(restored >= 0.9, s"rebuild must restore the gate: $restored")
    // healthy index: a further monitor run is a clean pass, no new swap
    // — and it needs NO embeddings-dir: a scheduled monitor keeps
    // working after the original export is gone (review finding: the
    // source read must be lazy, not a startup requirement)
    graft.cli.Indexer.main(Array("--conf", write(base.resolve("mon_noemb.conf"),
      s"""index {
         |  index-dir = $idx
         |  mode = monitor
         |  recall-queries = 40
         |  recall-k = 5
         |  recall-nprobe = 1
         |  min-recall = 0.9
         |  rebuild-on-breach = true
         |}
         |""".stripMargin)))
    assert(spark.read.parquet(s"$idx/corpus").count() == 200)
    // monitor without its gate knobs is dead config — rejected
    val e = intercept[IllegalArgumentException] {
      graft.cli.Indexer.main(Array("--conf", conf("bad", "monitor", apSrc, 3, "")))
    }
    assert(e.getMessage.contains("min-recall"), e.getMessage)
  }

  test("compactor size tier: only the small-tail parts merge; the big part " +
      "is carried untouched and the lineage continues") {
    import spark.implicits._
    val base = tmp()
    def hex(seed: String) =
      f"${scala.util.hashing.MurmurHash3.stringHash(seed)}%08x"
    def doc(i: Long) = (i,
      s"distinct corpus document number $i " +
        (0 until 30).map(j => hex(s"$i-$j")).mkString(" "))
    val inBig = base.resolve("tin1").toString
    val inS1 = base.resolve("tin2").toString
    val inS2 = base.resolve("tin3").toString
    (0L until 150L).map(doc).toDF("doc_id", "text").write.parquet(inBig)
    Seq(doc(1000L), doc(1001L)).toDF("doc_id", "text").write.parquet(inS1)
    Seq(doc(2000L), doc(2001L)).toDF("doc_id", "text").write.parquet(inS2)
    val spd = base.resolve("tierparts").toString
    def conf(run: Int, in: String, stateIn: Option[String]) =
      write(base.resolve(s"tier$run.conf"),
        s"""source { storage-type = local, dataset-dir = $in }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"tout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |  state-parts-dir = $spd
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"tstate$run")}
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, inBig, None)))
    graft.cli.Curator.main(Array("--conf",
      conf(2, inS1, Some(base.resolve("tstate1").toString))))
    graft.cli.Curator.main(Array("--conf",
      conf(3, inS2, Some(base.resolve("tstate2").toString))))
    val st3 = base.resolve("tstate3").toString
    def dirSize(f: java.io.File): Long = {
      // the SAME measure the Compactor tiers on
      val pp = new org.apache.hadoop.fs.Path(f.toString)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(pp).getLength
    }
    def snapshot(f: java.io.File): Map[String, (Long, Long)] =
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.isFile).map(x => x.getName -> (x.length, x.lastModified)).toMap
    val hashesDir = new java.io.File(s"$spd/hashes")
    val big = new java.io.File(hashesDir, "part-0")
    val bigBefore = snapshot(big)
    val sizes = hashesDir.listFiles().map(f => f.getName -> dirSize(f)).toMap
    assert(sizes("part-0") > sizes("part-1") && sizes("part-0") > sizes("part-2"),
      s"batch-1 part must be the big one: $sizes")
    // threshold excludes ONLY the big part
    val threshold = (sizes("part-0") + math.max(sizes("part-1"), sizes("part-2"))) / 2
    assert(sizes("part-1") <= threshold && sizes("part-2") <= threshold, s"$sizes")
    val hashesBefore = graft.cli.Cli.readStateTable(spark, st3, "hashes").count()
    val cst = base.resolve("tiercompact")
    graft.cli.Compactor.main(Array("--conf", write(base.resolve("tierc.conf"),
      s"""compaction { state-dir = $st3, state-out-dir = $cst, max-part-bytes = $threshold }
         |""".stripMargin)))
    // manifest: untouched big part first, then the merged tail
    val manifest = scala.io.Source.fromFile(
      cst.resolve("hashesmanifest").toString).mkString.split("\n").filter(_.nonEmpty)
    assert(manifest.length == 2 && manifest(0).endsWith("part-0") &&
      manifest(1).endsWith("part-c1"), s"manifest: ${manifest.toSeq}")
    assert(snapshot(big) == bigBefore,
      "the big part's files must be byte-and-mtime identical after tiered compaction")
    assert(hashesDir.listFiles().map(_.getName).toSet == Set("part-0", "part-c1"),
      "small-tail parts must be swept, big part kept")
    assert(graft.cli.Cli.readStateTable(spark, cst.toString, "hashes").count()
      == hashesBefore, "tiered merge must preserve the union")
    // the lineage continues: everything seen converges, fresh survives
    val inNext = base.resolve("tin4").toString
    (Seq(doc(3L), doc(1000L), doc(2001L), doc(9000L)): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inNext)
    graft.cli.Curator.main(Array("--conf",
      conf(4, inNext, Some(cst.toString))))
    val ids4 = spark.read.parquet(base.resolve("tout4").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids4 == Set(9000L), s"convergence through tiered compaction broken: $ids4")
  }

  test("curator span-parts-dir: immutable parts + manifest — prior parts never " +
      "rewritten, cross-batch cut identical, stage-off carry is metadata-only") {
    import spark.implicits._
    val base = tmp()
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val inA = base.resolve("ppa").toString
    val inB = base.resolve("ppb").toString
    (Seq((1L, s"first batch owner doc carries the quoted text $passage"),
      (2L, "plain first batch document nothing shared at all")): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inA)
    (Seq((200L, "second batch quoting entity reuses verbatim material " +
        s"$passage trailing words continue afterwards"),
      (201L, "another clean second batch document full of fresh words")): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inB)
    val partsDir = base.resolve("spanparts").toString
    def conf(run: Int, in: String, stateIn: Option[String], partsLine: String) =
      write(base.resolve(s"pp$run.conf"),
        s"""source { storage-type = local, dataset-dir = $in }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"ppout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |  span-dedup-tokens = 10
           |$partsLine
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"ppstate$run")}
           |}
           |""".stripMargin)
    val partsLine = s"  span-parts-dir = $partsDir"
    graft.cli.Curator.main(Array("--conf", conf(1, inA, None, partsLine)))
    val st1 = base.resolve("ppstate1")
    assert(new java.io.File(st1.resolve("spansmanifest").toString).exists(),
      "parts mode must commit a manifest")
    assert(!new java.io.File(st1.resolve("spans").toString).exists(),
      "parts mode must NOT write the union parquet")
    val part0 = new java.io.File(s"$partsDir/spans", "part-0")
    assert(part0.exists(), "batch 1's spans must land in part-0")
    def partFiles(d: java.io.File): Map[String, (Long, Long)] =
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    val part0Before = partFiles(part0)
    // batch 2: cross-batch passage cut, part-0 untouched, manifest grows
    graft.cli.Curator.main(Array("--conf",
      conf(2, inB, Some(st1.toString), partsLine)))
    val out2 = spark.read.parquet(base.resolve("ppout2").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(!out2(200L).contains("alpha beta"),
      s"cross-batch duplicated passage must be cut: ${out2(200L)}")
    assert(out2(201L) == "another clean second batch document full of fresh words")
    assert(partFiles(part0) == part0Before,
      "prior part must be byte-identical after batch 2 — immutability is the point")
    assert(new java.io.File(s"$partsDir/spans", "part-1").exists())
    val manifest2 = scala.io.Source.fromFile(
      base.resolve("ppstate2").resolve("spansmanifest").toString).mkString
      .split("\n").filter(_.nonEmpty)
    assert(manifest2.length == 2 && manifest2(0).endsWith("part-0") &&
      manifest2(1).endsWith("part-1"), s"manifest: ${manifest2.toSeq}")
    // dropping span-parts-dir against parts-mode state = parameter drift
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(3, inB, Some(base.resolve("ppstate2").toString), "")))
    }
    assert(e.getMessage.contains("span"), e.getMessage)
    // stage off: metadata-only carry — manifest copied, no parquet written
    val f4 = write(base.resolve("pp4.conf"),
      s"""source { storage-type = local, dataset-dir = $inB }
         |target { storage-type = local, dataset-dir = ${base.resolve("ppout4")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  state-dir = ${base.resolve("ppstate2")}
         |  state-out-dir = ${base.resolve("ppstate4")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f4))
    val manifest4 = scala.io.Source.fromFile(
      base.resolve("ppstate4").resolve("spansmanifest").toString).mkString
    assert(manifest4.split("\n").filter(_.nonEmpty).toSeq == manifest2.toSeq,
      "stage-off carry must copy the manifest verbatim")
    assert(!new java.io.File(base.resolve("ppstate4").resolve("spans").toString).exists(),
      "stage-off carry over parts-mode state must not materialize a union")
    assert(new java.io.File(s"$partsDir/spans").listFiles().map(_.getName).toSet ==
      Set("part-0", "part-1"), "no new parts without a batch")
  }

  test("curator temperature mixing: rates replay exactly from the no-mix run; " +
      "conflicts with mixture-weights") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = tmp()
    val in = base.resolve("tin").toString
    // skewed domains: 200 "big" docs vs 20 "small" docs, distinct texts
    ((0 until 200).map(i => (i.toLong, s"big doc $i alpha beta gamma delta", "big")) ++
      (1000 until 1020).map(i => (i.toLong, s"small doc $i alpha beta gamma delta", "small")))
      .toDF("doc_id", "text", "source").write.parquet(in)
    def conf(run: Int, extra: String) = write(base.resolve(s"tm$run.conf"),
      s"""source { storage-type = local, dataset-dir = $in }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"tout$run")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |$extra
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, ""))) // baseline: no mixing
    graft.cli.Curator.main(Array("--conf", conf(2, "  temperature-alpha = 0.5")))
    val pre = spark.read.parquet(base.resolve("tout1").toString)
    val got = spark.read.parquet(base.resolve("tout2").toString)
      .select("doc_id").as[Long].collect().toSet
    // replay: totals from the baseline run, rates in plain Scala, the
    // row decision via the shared uniform — keep-sets must match EXACTLY
    val totals = pre.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxw = totals.values.map(n => math.pow(n.toDouble, -0.5)).max
    val rates = totals.map { case (s, n) =>
      s -> math.min(1.0, math.pow(n.toDouble, -0.5) / maxw)
    }
    val want = pre.withColumn("__u", graft.operators.Ops.hashUniform(col("doc_id")))
      .select("doc_id", "source", "__u").as[(Long, String, Double)].collect()
      .filter { case (_, s, u) => u <= rates(s) }.map(_._1).toSet
    assert(got == want, s"extra=${got -- want}, missing=${want -- got}")
    // the small domain is the largest rate → kept whole at budget 1
    assert((1000L until 1020L).toSet.subsetOf(got))
    assert(got.size < 220, "big domain must be downsampled")
    // explicit fractions and derived rates cannot combine
    val bad = write(base.resolve("tm_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $in }
         |target { storage-type = local, dataset-dir = ${base.resolve("tnope")}, dataset-store-format = parquet }
         |curation { temperature-alpha = 0.5, mixture-weights { big = 0.5 } }
         |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("curator DSIR stage: importance resampling keeps target-domain docs; " +
      "conflicts with the other composition rules") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = tmp()
    val in = base.resolve("din").toString
    // pool: 30 fruit docs + 30 metal docs; target domain speaks fruit
    val pool = ((0 until 30).map(i => (i.toLong, s"apple banana cherry date fig d$i")) ++
      (100 until 130).map(i => (i.toLong, s"iron copper zinc nickel cobalt d$i")))
      .toDF("doc_id", "text")
    pool.write.parquet(in)
    val tLm = graft.llm.LangModel.trainUnigram(
      (1 to 20).map(i => s"apple banana cherry date apple t$i").toDF("text"), "text", minCount = 2)
    val rLm = graft.llm.LangModel.trainUnigram(pool, "text", minCount = 2)
    val tPath = base.resolve("t.lm").toString
    val rPath = base.resolve("r.lm").toString
    graft.llm.LangModel.save(tLm, tPath)
    graft.llm.LangModel.save(rLm, rPath)
    val f = write(base.resolve("dsir.conf"),
      s"""source { storage-type = local, dataset-dir = $in }
         |target { storage-type = local, dataset-dir = ${base.resolve("dout")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  dsir-k = 20
         |  dsir-target-lm = "$tPath"
         |  dsir-raw-lm = "$rPath"
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val kept = spark.read.parquet(base.resolve("dout").toString)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == 20)
    assert(kept.count(_ < 100) >= 18,
      s"DSIR must select overwhelmingly from the target domain: $kept")
    val bad = write(base.resolve("dsir_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $in }
         |target { storage-type = local, dataset-dir = ${base.resolve("dnope")}, dataset-store-format = parquet }
         |curation { dsir-k = 20, dsir-target-lm = "$tPath", dsir-raw-lm = "$rPath",
         |  mixture-weights { a = 0.5 } }
         |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("streamer runs a checkpointed windowed stream to a parquet sink (RocksDB state)") {
    val base = tmp()
    val events = base.resolve("events").toString
    spark.read.option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .write.parquet(events)
    val out = base.resolve("windows").toString
    val f = write(base.resolve("stream.conf"),
      s"""streaming {
         |  events-dir = $events
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("ckpt")}
         |  operation = window
         |  window-length = "1 hour"
         |  watermark = "2 hours"
         |  state-store = rocksdb
         |  shuffle-partitions = 8
         |}
         |""".stripMargin)
    graft.cli.Streamer.main(Array("--conf", f))
    val windows = spark.read.parquet(out)
    assert(windows.count() > 0)
    assert(Seq("window_start", "window_end", "event_type", "n_events").forall(windows.columns.contains))
    // second run, same checkpoint, no new files → exactly-once, no re-append
    val n1 = windows.count()
    graft.cli.Streamer.main(Array("--conf", f))
    assert(spark.read.parquet(out).count() == n1)
  }

  test("streamer near-dedup drops a case-changed corpus echo against Curator state") {
    import org.apache.spark.sql.functions.{col, lower, timestamp_micros}
    val base = tmp()
    // 1. curate a corpus slice and commit its dedup state — in PARTS
    //    mode, so the stream path provably reads sigs through the
    //    manifest accessor and the materialized `hot` aggregate through
    //    the same readStateTable entry point (review finding: a raw
    //    `$stateDir/hot` read would break the day hot moves to
    //    manifests; both accessor paths are exercised here)
    val stateDir = base.resolve("state").toString
    val cf = write(base.resolve("cur.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("curated")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  state-out-dir = $stateDir
         |  state-parts-dir = ${base.resolve("parts")}
         |  bands = 8
         |  max-bucket = 3
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", cf))
    // precondition: parts mode actually engaged and hot is non-empty
    assert(new java.io.File(base.resolve("state").toString, "sigsmanifest").exists(),
      "curate must have committed sigs via a parts manifest")
    assert(spark.read.parquet(s"$stateDir/hot").count() > 0,
      "hot-bucket state must be non-empty for the stream to consult")
    // 2. stage a landing dir: a case-changed echo of a curated doc
    //    (identical SimHash under lowercased tokenization) + fresh docs
    import spark.implicits._
    val curated = spark.read.parquet(base.resolve("curated").toString)
    val echoText = curated.select("text").head().getString(0).toUpperCase
    val landing = base.resolve("landing").toString
    Seq(
      (900001L, echoText, 1L),
      (900002L, "a genuinely fresh arriving document tonight", 2L),
      (900003L, "another unseen arrival with different words", 3L)
    ).toDF("doc_id", "text", "ts")
      .withColumn("ts", timestamp_micros(col("ts") * 3600L * 1000000L))
      .write.parquet(landing)
    // 3. run the near-dedup stream against the committed state
    val out = base.resolve("survivors").toString
    val sf = write(base.resolve("nd.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("ndckpt")}
         |  operation = near-dedup
         |  state-dir = $stateDir
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)
    graft.cli.Streamer.main(Array("--conf", sf))
    val survivors = spark.read.parquet(out)
    val ids = survivors.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(900001L), s"case-changed corpus echo survived: $ids")
    assert(ids == Set(900002L, 900003L), s"fresh arrivals lost: $ids")
    // an uncommitted state dir is refused loudly
    val bad = write(base.resolve("ndbad.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = ${base.resolve("outB")}
         |  checkpoint-location = ${base.resolve("ckptB")}
         |  operation = near-dedup
         |  state-dir = ${base.resolve("nope")}
         |}
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Streamer.main(Array("--conf", bad)) }
  }

  test("streamer near-dedup-cluster: single-pass in-batch clustering + " +
      "cross-batch state accretion, seeded by a committed corpus state") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    val base = tmp()
    // 1. seed corpus state: a committed Curator lineage
    val stateDir = base.resolve("seed_state").toString
    graft.cli.Curator.main(Array("--conf", write(base.resolve("cur.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("curated")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  state-out-dir = $stateDir
         |}
         |""".stripMargin)))
    val curated = spark.read.parquet(base.resolve("curated").toString)
    val seedSigRows = curated.count()
    val echoText = curated.select("text").head().getString(0).toUpperCase
    // 2. micro-batch 1: a corpus echo (vs-SEED near tier), an in-batch
    //    near pair (case-changed -> same SimHash, different sha), an
    //    in-batch exact dup, and a genuinely fresh doc
    val freshA = "a genuinely fresh arriving document about volcanic glass tonight"
    val freshB = "another unseen arrival discussing tidal harmonics and kelp forests"
    val landing = base.resolve("landing").toString
    def land(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
        .write.mode("append").parquet(landing)
    land(Seq(
      900001L -> echoText,
      900010L -> freshA,
      900011L -> freshA.toUpperCase, // in-batch NEAR (hamming 0, sha differs)
      900012L -> freshA,             // in-batch EXACT
      900020L -> freshB))
    val out = base.resolve("clustered").toString
    val clusterState = base.resolve("cluster_state").toString
    val conf = write(base.resolve("ndc.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("ndcckpt")}
         |  operation = near-dedup-cluster
         |  state-dir = $stateDir
         |  cluster-state-dir = $clusterState
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)
    graft.cli.Streamer.main(Array("--conf", conf))
    val batch0 = spark.read.parquet(s"$out/batch-0")
      .select("doc_id").as[Long].collect().toSet
    assert(batch0 == Set(900010L, 900020L),
      s"batch 0 must keep the lower id of each in-batch cluster and drop " +
        s"the corpus echo: $batch0")
    // 3. micro-batch 2 (same checkpoint, new file): near + exact echoes
    //    of BATCH-1 SURVIVORS must drop via the accreted state
    land(Seq(
      900030L -> freshA.toUpperCase, // near a batch-1 survivor
      900031L -> freshB,             // exact text of a batch-1 survivor
      900040L -> "entirely new prose concerning glacier mice and moss balls"))
    graft.cli.Streamer.main(Array("--conf", conf))
    val batch1 = spark.read.parquet(s"$out/batch-1")
      .select("doc_id").as[Long].collect().toSet
    assert(batch1 == Set(900040L),
      s"batch 1 must drop near/exact echoes of batch-0 survivors: $batch1")
    // 4. the cluster state dir is itself a committed, manifest-readable
    //    near-dedup state: seed ∪ accreted survivors
    assert(new java.io.File(clusterState, "_COMMITTED").exists())
    assert(Cli.readStateTable(spark, clusterState, "sigs").count() ==
      seedSigRows + 3, "sigs manifest must cover seed + the 3 survivors")
    // ... consumable by the stateless near-dedup arrival filter directly
    val landing3 = base.resolve("landing3").toString
    Seq(900050L -> "entirely NEW prose concerning GLACIER mice and moss balls",
      900060L -> "completely unrelated sentence about antikythera gears")
      .toDF("doc_id", "text")
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      .write.parquet(landing3)
    val out3 = base.resolve("nd_out3").toString
    graft.cli.Streamer.main(Array("--conf", write(base.resolve("nd3.conf"),
      s"""streaming {
         |  events-dir = $landing3
         |  target-dir = $out3
         |  checkpoint-location = ${base.resolve("ckpt3")}
         |  operation = near-dedup
         |  state-dir = $clusterState
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)))
    val ids3 = spark.read.parquet(out3).select("doc_id").as[Long].collect().toSet
    assert(ids3 == Set(900060L),
      s"the arrival filter must drop the case-changed echo of an accreted " +
        s"survivor: $ids3")
    // LINEAGE ROTATION — the part-list bound: the cluster loop reads
    // its parts by batch index (retry self-consistency), so the bound
    // is not in-place compaction but a fresh lineage SEEDED by the old
    // dir, whose accreted parts collapse into the new lineage's lazy
    // seed frames
    val landing4 = base.resolve("landing4").toString
    Seq(900070L -> freshB.toUpperCase, // near a lineage-1 survivor
      900080L -> "brand new material on desert varnish formation")
      .toDF("doc_id", "text")
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      .write.parquet(landing4)
    val out4 = base.resolve("rotated").toString
    graft.cli.Streamer.main(Array("--conf", write(base.resolve("rot.conf"),
      s"""streaming {
         |  events-dir = $landing4
         |  target-dir = $out4
         |  checkpoint-location = ${base.resolve("rot_ckpt")}
         |  operation = near-dedup-cluster
         |  state-dir = $clusterState
         |  cluster-state-dir = ${base.resolve("rot_state")}
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)))
    val ids4 = spark.read.parquet(s"$out4/batch-0").select("doc_id")
      .as[Long].collect().toSet
    assert(ids4 == Set(900080L),
      s"the rotated lineage must drop near echoes of the OLD lineage's " +
        s"accreted survivors through its seed frames: $ids4")
    // ... and by the BATCH Curator itself: the cluster marker carries
    // the Curator's own stateParams line, so `curation.state-dir` can
    // point straight at the stream's accreted state
    val batchSrc = base.resolve("batch_src").toString
    Seq(900090L -> freshA, // exact text of a stream-accreted survivor
      900091L -> "unmistakably fresh writing about tundra polygons")
      .toDF("doc_id", "text").write.parquet(batchSrc)
    val batchOut = base.resolve("batch_out").toString
    graft.cli.Curator.main(Array("--conf", write(base.resolve("cur2.conf"),
      s"""source { storage-type = local, dataset-dir = $batchSrc }
         |target { storage-type = local, dataset-dir = $batchOut, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  state-dir = $clusterState
         |}
         |""".stripMargin)))
    val batchIds = spark.read.parquet(batchOut).select("doc_id")
      .as[Long].collect().toSet
    assert(batchIds == Set(900091L),
      s"the batch Curator must drop docs seen by the stream lineage: $batchIds")
    // 5. drifted restart parameters are refused — one lineage, one
    //    parameter set
    val drift = intercept[IllegalArgumentException] {
      graft.cli.Streamer.main(Array("--conf", write(base.resolve("ndc_drift.conf"),
        s"""streaming {
           |  events-dir = $landing
           |  target-dir = $out
           |  checkpoint-location = ${base.resolve("ndcckpt")}
           |  operation = near-dedup-cluster
           |  state-dir = $stateDir
           |  cluster-state-dir = $clusterState
           |  max-hamming = 2
           |}
           |""".stripMargin)))
    }
    assert(drift.getMessage.contains("one lineage"), drift.getMessage)
  }

  test("streamer near-dedup-cluster rotate-after-parts: the part-list bound " +
      "refuses loudly with the reseed recipe; the reseeded lineage continues " +
      "and still drops echoes of the old lineage's survivors") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    val base = tmp()
    val landing = base.resolve("landing").toString
    def land(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
        .write.mode("append").parquet(landing)
    val out = base.resolve("out").toString
    val state = base.resolve("state").toString
    val conf = write(base.resolve("rot_bound.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("ckpt")}
         |  operation = near-dedup-cluster
         |  cluster-state-dir = $state
         |  rotate-after-parts = 2
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)
    // two batches fit inside the bound (parts 1 and 2 accrete)
    land(Seq(1L -> "first arrival about basalt columns and hexagonal jointing"))
    graft.cli.Streamer.main(Array("--conf", conf))
    land(Seq(2L -> "second arrival describing estuarine silt deposition rates"))
    graft.cli.Streamer.main(Array("--conf", conf))
    assert(new java.io.File(s"$state/sigs/part-2").exists())
    // the third batch crosses the bound: loud refusal carrying the
    // exact reseed recipe (the error surfaces through the streaming
    // query's cause chain)
    land(Seq(3L -> "third arrival on lichen growth rings and dating"))
    val e = intercept[Exception] { graft.cli.Streamer.main(Array("--conf", conf)) }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("rotate-after-parts = 2 is reached"), chain)
    assert(chain.contains("state-dir = ") && chain.contains("RESEEDING"), chain)
    // rotation = the recipe from the error: fresh lineage seeded by the
    // old dir. A new events dir carries an echo of an OLD survivor + a
    // fresh doc; the reseeded lineage numbers from batch-0 again and
    // drops the echo through its seed frames
    val landing2 = base.resolve("landing2").toString
    Seq(10L -> "FIRST ARRIVAL ABOUT BASALT COLUMNS AND HEXAGONAL JOINTING",
      11L -> "wholly fresh prose about carbonate platform drowning")
      .toDF("doc_id", "text")
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      .write.parquet(landing2)
    val out2 = base.resolve("out2").toString
    graft.cli.Streamer.main(Array("--conf", write(base.resolve("rot2.conf"),
      s"""streaming {
         |  events-dir = $landing2
         |  target-dir = $out2
         |  checkpoint-location = ${base.resolve("ckpt2")}
         |  operation = near-dedup-cluster
         |  state-dir = $state
         |  cluster-state-dir = ${base.resolve("state2")}
         |  rotate-after-parts = 2
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)))
    val kept = spark.read.parquet(s"$out2/batch-0").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(11L),
      s"the reseeded lineage must drop the old survivor's echo and keep " +
        s"the fresh doc: $kept")
    // misconfig: a non-positive bound is refused up front
    val bad = intercept[IllegalArgumentException] {
      graft.cli.Streamer.main(Array("--conf", write(base.resolve("rot_bad.conf"),
        s"""streaming {
           |  events-dir = $landing2
           |  target-dir = ${base.resolve("x")}
           |  checkpoint-location = ${base.resolve("xc")}
           |  operation = near-dedup-cluster
           |  cluster-state-dir = ${base.resolve("xs")}
           |  rotate-after-parts = 0
           |}
           |""".stripMargin)))
    }
    assert(bad.getMessage.contains("must be positive"), bad.getMessage)
  }
}
