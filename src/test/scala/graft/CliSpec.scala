package graft

import java.nio.file.{Files, Path}
import graft.cli.Cli
import graft.conf.GraftConfig

/** CLI e2e shard A (of 4) — see CliSpecBase. */
class CliSpec extends CliSpecBase {
  test("parseConf merges --conf file with k=v overrides (B3, scorer.py:71-76)") {
    val f = write(tmp().resolve("c.conf"),
      """source { storage-type = local, dataset-dir = /a }
        |target { storage-type = local, dataset-dir = /b }
        |""".stripMargin)
    val conf = Cli.parseConf(Array("--conf", f, "target.dataset-dir=/c", "spark.app=x"))
    assert(conf.string("source.dataset-dir") == "/a")
    assert(conf.string("target.dataset-dir") == "/c") // override wins
    assert(conf.string("spark.app") == "x")
  }

  test("include \"file\" splices shared config blocks (reference README.md:92)") {
    val dir = tmp()
    write(dir.resolve("shared.conf"),
      """spark-prop { spark.sql.shuffle.partitions = 4 }
        |app = shared-app
        |""".stripMargin)
    val main = write(dir.resolve("main.conf"),
      """spark {
        |  include "shared.conf"
        |  app = main-app
        |}
        |source { storage = local, query = /x }
        |""".stripMargin)
    val conf = GraftConfig.parseFile(main)
    assert(conf.string("spark.spark-prop.spark.sql.shuffle.partitions") == "4")
    assert(conf.string("spark.app") == "main-app") // later key wins
    assert(conf.string("source.query") == "/x")
  }

  test("session folds spark-prop into the builder (B1/B2)") {
    // shared session already exists; getOrCreate returns it — assert the
    // config path on a value that is safe to set redundantly.
    val conf = GraftConfig.parse(
      """spark {
        |  app = graft-test
        |  spark-prop { spark.sql.shuffle.partitions = 4 }
        |}""".stripMargin)
    val s = Cli.session(conf, "fallback")
    assert(s.conf.get("spark.sql.shuffle.partitions") == "4")
  }

  test("mover copies source parquet to target directory (E1)") {
    val out = tmp().resolve("moved").toString
    val f = write(tmp().resolve("mover.conf"),
      s"""source {
         |  storage-type = local
         |  dataset-dir = $sfDir/nation.parquet
         |  dataset-store-format = parquet
         |}
         |target {
         |  storage-type = local
         |  dataset-dir = $out
         |  dataset-store-format = parquet
         |  write-mode = overwrite
         |}
         |""".stripMargin)
    graft.cli.Mover.main(Array("--conf", f))
    val moved = spark.read.parquet(out)
    assert(moved.count() == 25)
    assert(moved.columns.sameElements(spark.read.parquet(s"$sfDir/nation.parquet").columns))
  }

  test("mover applies post-read transform-sql + limit (S6/S8 through E1)") {
    val out = tmp().resolve("moved2").toString
    val f = write(tmp().resolve("mover2.conf"),
      s"""source {
         |  storage-type = local
         |  dataset-dir = $sfDir/orders.parquet
         |  transform-sql = "select o_orderkey, o_totalprice from dataset_temp where o_totalprice > 100"
         |  limit = 10
         |}
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet }
         |""".stripMargin)
    graft.cli.Mover.main(Array("--conf", f))
    val moved = spark.read.parquet(out)
    assert(moved.count() == 10)
    assert(moved.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
  }

  test("trainer trains from config and scorer scores with the saved model (E2+E3)") {
    val base = tmp()
    val modelPath = base.resolve("model").toString
    val scoresOut = base.resolve("scores").toString

    // train: label = high-value order, features = price-ish numerics
    import org.apache.spark.sql.functions._
    val trainData = base.resolve("train_data").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("uid"), col("o_totalprice"),
        col("o_custkey").cast("double").as("o_cust"),
        (col("o_totalprice") > 150000).cast("double").as("label"))
      .write.mode("overwrite").parquet(trainData)

    val trainerConf = write(base.resolve("trainer.conf"),
      s"""model-definition {
         |  dataset { storage-type = local, dataset-dir = $trainData }
         |  target-column = label
         |  estimator = logistic-regression
         |  feature-columns = [o_totalprice, o_cust]
         |  params { maxIter = 20 }
         |}
         |model-path = $modelPath
         |""".stripMargin)
    graft.cli.Trainer.main(Array("--conf", trainerConf))
    assert(Files.exists(java.nio.file.Paths.get(modelPath)))

    val scorerConf = write(base.resolve("scorer.conf"),
      s"""source { storage-type = local, dataset-dir = $trainData }
         |target { storage-type = local, dataset-dir = $scoresOut, dataset-store-format = parquet }
         |model-path = $modelPath
         |cols-to-save = [uid, label]
         |current-dt = 2026-01-01T00-00
         |""".stripMargin)
    graft.cli.Scorer.main(Array("--conf", scorerConf))

    val scores = spark.read.parquet(scoresOut)
    assert(scores.columns.toSeq ==
      Seq("model_name", "current_dt", "uid", "label", "target_proba"))
    assert(scores.count() == spark.read.parquet(trainData).count())
    assert(scores.select("model_name").head().getString(0) == "model")
    // the model actually separates: high-value orders score higher
    val hi = scores.filter(col("label") === 1.0).agg(avg("target_proba")).head().getDouble(0)
    val lo = scores.filter(col("label") === 0.0).agg(avg("target_proba")).head().getDouble(0)
    assert(hi > lo, s"hi=$hi lo=$lo")
  }

  test("curator runs the full curation pipeline config-driven") {
    val base = tmp()
    val out = base.resolve("curated").toString
    val f = write(base.resolve("curator.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.2
         |  shingle-size = 3
         |  near-dup-strategy = simhash
         |  report-dir = ${base.resolve("report")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val curated = spark.read.parquet(out)
    assert(curated.count() > 0)
    assert(curated.count() <= spark.read.parquet(s"$sfDir/documents.parquet").count())
    assert(Seq("quality", "lang_id", "n_tokens").forall(curated.columns.contains))
    // the data card rides along: per-lang rows whose doc counts sum to
    // the curated corpus
    val report = spark.read.parquet(base.resolve("report").toString)
    assert(report.columns.toSeq == Seq("lang_id", "n_docs", "total_chars",
      "total_tokens", "min_doc_tokens", "max_doc_tokens", "n_empty"))
    val totalDocs = report.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0)
    assert(totalDocs == curated.count(), s"report must cover the curated corpus")
  }

  test("curator with mixture + chunking emits training-ready chunk rows") {
    val base = tmp()
    val out = base.resolve("chunks").toString
    val f = write(base.resolve("curator2.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.2
         |  mixture-weights { src0 = 1.0, src1 = 1.0 }
         |  mixture-default-fraction = 0.5
         |  chunk-size = 32
         |  chunk-overlap = 8
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val chunks = spark.read.parquet(out)
    assert(chunks.columns.toSeq == Seq("doc_id", "chunk_id", "chunk_text", "chunk_tokens"))
    assert(chunks.count() > 0)
    assert(chunks.filter(org.apache.spark.sql.functions.col("chunk_tokens") > 32).count() == 0)
    // mixture dropped roughly half the unlisted sources before chunking
    val docsKept = chunks.select("doc_id").distinct().count()
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(docsKept < total, s"mixture should drop some docs ($docsKept vs $total)")
  }

  test("curator chunks to a BPE subword budget when bpe-budget + bpe-merges are set") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    val merges = write(base.resolve("merges.txt"), "#version: 0.2\nl o\nlo w\ne r")
    val out = base.resolve("bpe_chunks").toString
    val f = write(base.resolve("curator_bpe.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.2
         |  bpe-budget = 48
         |  bpe-merges = "$merges"
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val chunks = spark.read.parquet(out)
    assert(chunks.columns.toSeq ==
      Seq("doc_id", "chunk_id", "chunk_text", "chunk_tokens", "chunk_bpe_tokens"))
    assert(chunks.count() > 0)
    // the budget binds on the SUBWORD count: no multi-token chunk above
    // it, and the recorded counts replay under graft_bpe_count
    assert(chunks.filter(col("chunk_tokens") > 1 && col("chunk_bpe_tokens") > 48).count() == 0)
    val mismatch = chunks.withColumn("recount",
      graft.llm.TextAnalysis.bpeTokenCount(col("chunk_text"), merges).cast("long"))
      .filter(col("recount") =!= col("chunk_bpe_tokens")).count()
    assert(mismatch == 0)
    // chunk-size and bpe-budget cannot combine
    val bad = write(base.resolve("curator_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("nope")}, dataset-store-format = parquet }
         |curation { chunk-size = 32, bpe-budget = 48, bpe-merges = "$merges" }
         |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("curator with redact + splits labels every chunk and scrubs planted PII") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val base = tmp()
    // corpus with planted PII in every doc
    val src = base.resolve("pii_docs").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text", concat(col("text"), lit(" mail bob@example.com now")))
      .write.parquet(src)
    val out = base.resolve("split_chunks").toString
    val f = write(base.resolve("curator3.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  redact = true
         |  splits = ["train:0.8", "val:0.1", "test:0.1"]
         |  split-salt = s1
         |  chunk-size = 32
         |  chunk-overlap = 8
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val chunks = spark.read.parquet(out)
    assert(chunks.columns.toSeq ==
      Seq("doc_id", "split", "chunk_id", "chunk_text", "chunk_tokens"))
    val bySplit = chunks.select("doc_id", "split").distinct()
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")) && bySplit.contains("train"),
      s"$bySplit")
    // each doc carries exactly one split label
    assert(chunks.select("doc_id", "split").distinct().count() ==
      chunks.select("doc_id").distinct().count())
    // the PII never reaches the training output (scrubbed pre-curation)
    assert(chunks.filter(col("chunk_text").contains("bob@example.com")).count() == 0)
    assert(chunks.filter(col("chunk_text").contains("<EMAIL>")).count() > 0)
  }

  test("curator incremental mode: re-running the same corpus against state keeps nothing") {
    val base = tmp()
    def conf(run: Int, stateIn: Option[String]) = write(base.resolve(s"cur$run.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"out$run")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.2
         |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
         |  state-out-dir = ${base.resolve(s"state$run")}
         |}
         |""".stripMargin)
    // run 1: no prior state — curates the corpus, writes state1
    graft.cli.Curator.main(Array("--conf", conf(1, None)))
    val n1 = spark.read.parquet(base.resolve("out1").toString).count()
    assert(n1 > 0)
    assert(new java.io.File(base.resolve("state1").resolve("hashes").toString).exists())
    assert(new java.io.File(base.resolve("state1").resolve("hot").toString).exists())
    // run 2: SAME corpus against run 1's state — everything exact-seen
    // or SimHash-near the corpus is dropped. A handful of chain remnants
    // may survive (doc B near dropped-doc X near corpus, with B itself
    // beyond the radius — triangle inequality only bounds B at 2×radius)
    graft.cli.Curator.main(Array("--conf", conf(2, Some(base.resolve("state1").toString))))
    val n2 = spark.read.parquet(base.resolve("out2").toString).count()
    assert(n2 <= n1 / 50, s"run 2 kept $n2 of $n1 — incremental dedup not effective")
    // state accumulated: run 1's survivors plus run 2's remnants
    assert(spark.read.parquet(base.resolve("state2").resolve("hashes").toString).count() == n1 + n2)
    // run 3: remnants are now IN the state → converges to zero new docs
    graft.cli.Curator.main(Array("--conf", conf(3, Some(base.resolve("state2").toString))))
    assert(spark.read.parquet(base.resolve("out3").toString).count() == 0)
    assert(new java.io.File(base.resolve("state2").resolve("_COMMITTED").toString).exists())
    // writing state over the dir being read is rejected, even via a
    // path alias (trailing slash) the raw-string compare would miss
    val bad = write(base.resolve("bad.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("outX")} }
         |curation { state-dir = ${base.resolve("state1")}, state-out-dir = "${base.resolve("state1")}/" }
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Curator.main(Array("--conf", bad)) }
    // an uncommitted / nonexistent state dir fails loudly instead of
    // silently skipping dedup and clobbering accumulated state
    val missing = write(base.resolve("missing.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("outY")} }
         |curation { state-dir = ${base.resolve("no-such-state")} }
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Curator.main(Array("--conf", missing)) }
    // parameter drift between increments is rejected (stored sigs are
    // only comparable under the parameters that built them)
    val drift = write(base.resolve("drift.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("outZ")} }
         |curation { state-dir = ${base.resolve("state1")}, shingle-size = 5 }
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Curator.main(Array("--conf", drift)) }
    // max-bucket rides stateParams too: persisted hotcounts thresholds
    // only mean anything under the cap that built the lineage
    val bdrift = write(base.resolve("bdrift.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("outW")} }
         |curation { state-dir = ${base.resolve("state1")}, max-bucket = 7 }
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Curator.main(Array("--conf", bdrift)) }
    // a pre-counts state dir (no hotcounts table) bootstraps from the
    // signature union once, then the lineage is incremental
    val fs = java.nio.file.Paths.get(base.resolve("state2").resolve("hotcounts").toString)
    assert(fs.toFile.exists())
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete()
    }
    deleteRec(fs.toFile)
    graft.cli.Curator.main(Array("--conf", conf(4, Some(base.resolve("state2").toString))))
    assert(new java.io.File(base.resolve("state4").resolve("hotcounts").toString).exists())
    val counts4 = spark.read.parquet(base.resolve("state4").resolve("hotcounts").toString)
    val sigs4 = spark.read.parquet(base.resolve("state4").resolve("sigs").toString)
    assert(counts4.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0) ==
      sigs4.count() * 4, "bootstrapped counts must cover the full signature union")
  }

  test("curator state-parts-dir: hashes/sigs become immutable parts + manifests; " +
      "incremental convergence identical, prior parts untouched, drift rejected") {
    val base = tmp()
    val partsDir = base.resolve("stparts").toString
    def conf(run: Int, stateIn: Option[String], partsLine: String) =
      write(base.resolve(s"pcur$run.conf"),
        s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"pout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.2
           |$partsLine
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"pstate$run")}
           |}
           |""".stripMargin)
    val partsLine = s"  state-parts-dir = $partsDir"
    graft.cli.Curator.main(Array("--conf", conf(1, None, partsLine)))
    val n1 = spark.read.parquet(base.resolve("pout1").toString).count()
    assert(n1 > 0)
    val st1 = base.resolve("pstate1")
    for (t <- Seq("hashes", "sigs")) {
      assert(new java.io.File(st1.resolve(s"${t}manifest").toString).exists(),
        s"$t manifest must commit")
      assert(!new java.io.File(st1.resolve(t).toString).exists(),
        s"parts mode must not materialize $t in the state dir")
    }
    // hot buckets stay a materialized aggregate either way — but they
    // derive from the mergeable hotcounts parts, not a re-band of the
    // full signature union
    assert(new java.io.File(st1.resolve("hot").toString).exists())
    assert(new java.io.File(st1.resolve("hotcountsmanifest").toString).exists())
    def partFiles(t: String, i: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$partsDir/$t", s"part-$i")
      assert(d.exists(), s"$t/part-$i must exist")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    }
    val hashes0 = partFiles("hashes", 0)
    val sigs0 = partFiles("sigs", 0)
    // run 2: same corpus against state — drops to remnants, same
    // convergence contract as rewrite mode
    graft.cli.Curator.main(Array("--conf",
      conf(2, Some(st1.toString), partsLine)))
    val n2 = spark.read.parquet(base.resolve("pout2").toString).count()
    assert(n2 <= n1 / 50, s"run 2 kept $n2 of $n1 — incremental dedup not effective")
    assert(partFiles("hashes", 0) == hashes0 && partFiles("sigs", 0) == sigs0,
      "prior parts must be byte-identical after run 2 — immutability is the point")
    // hotcounts appended a batch part (counts merge by sum; no corpus
    // signature re-band), and the derived hot table equals the direct
    // aggregate over the full signature union
    assert(new java.io.File(s"$partsDir/hotcounts", "part-1").exists())
    val st2 = base.resolve("pstate2")
    val sigsAll = graft.cli.Cli.readStateTable(spark, st2.toString, "sigs")
    def hotSet(df: org.apache.spark.sql.DataFrame) =
      df.select("band", "bits").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(hotSet(spark.read.parquet(st2.resolve("hot").toString)) ==
      hotSet(graft.llm.Dedup.simHashHotBuckets(sigsAll, 4, 10000)))
    // manifest union covers corpus + remnants, exactly like the
    // rewrite-mode accumulated table
    val manifest2 = scala.io.Source.fromFile(
      base.resolve("pstate2").resolve("hashesmanifest").toString).mkString
      .split("\n").filter(_.nonEmpty)
    assert(manifest2.length == 2, s"manifest: ${manifest2.toSeq}")
    assert(spark.read.parquet(manifest2.toIndexedSeq: _*).count() == n1 + n2)
    // run 3 converges to zero
    graft.cli.Curator.main(Array("--conf",
      conf(3, Some(base.resolve("pstate2").toString), partsLine)))
    assert(spark.read.parquet(base.resolve("pout3").toString).count() == 0)
    // dropping state-parts-dir against a parts-mode state = param drift
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(4, Some(base.resolve("pstate2").toString), "")))
    }
    assert(e.getMessage.contains("state-parts-dir"), e.getMessage)
    // a crashed commit's orphan part beyond the manifest is swept by the
    // next successful commit (a param-compatible retry overwrites its
    // own index; anything higher is dead weight within the lineage)
    val orphan = new java.io.File(s"$partsDir/hashes", "part-7")
    orphan.mkdirs()
    val orphanFile = new java.io.File(orphan, "junk.parquet")
    orphanFile.createNewFile()
    graft.cli.Curator.main(Array("--conf",
      conf(5, Some(base.resolve("pstate3").toString), partsLine)))
    assert(!orphan.exists(), "orphan part beyond the manifest must be swept")
    // a FRESH lineage (no state-dir) refuses a non-empty parts table dir
    // instead of silently clobbering it from part-0
    val fresh = intercept[IllegalStateException] {
      graft.cli.Curator.main(Array("--conf", conf(6, None, partsLine)))
    }
    assert(fresh.getMessage.contains("not empty"), fresh.getMessage)
  }

  test("curator cardinality state accumulates lifetime distincts across batches") {
    import org.apache.spark.sql.functions.{col, countDistinct, explode}
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val b1 = base.resolve("b1.parquet").toString
    val b2 = base.resolve("b2.parquet").toString
    docs.filter(col("doc_id") % 2 === 0).write.parquet(b1)
    docs.filter(col("doc_id") % 2 === 1).write.parquet(b2)
    def conf(run: Int, src: String, stateIn: Option[String]) =
      write(base.resolve(s"card$run.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"out$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"state$run")}
           |  cardinality-group-columns = [lang]
           |  cardinality-report-dir = ${base.resolve(s"cardrep$run")}
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, b1, None)))
    assert(new java.io.File(base.resolve("state1").resolve("cardsketch").toString).exists())
    graft.cli.Curator.main(Array("--conf",
      conf(2, b2, Some(base.resolve("state1").toString))))
    // lifetime estimates after batch 2 track EXACT distincts over the
    // union of what the two runs actually emitted — not batch 2 alone,
    // and not the (overlap-inflated) sum of per-batch distincts
    val got = spark.read.parquet(base.resolve("cardrep2").toString)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("distinct_docs"), r.getAs[Long]("distinct_tokens"))).toMap
    val emitted = spark.read.parquet(base.resolve("out1").toString)
      .unionByName(spark.read.parquet(base.resolve("out2").toString))
    val exact = emitted
      .select(col("lang"), col("text"),
        explode(graft.llm.Dedup.tokens(col("text"))).as("tok"))
      .groupBy("lang")
      .agg(countDistinct("text").as("d"), countDistinct("tok").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet, s"langs ${got.keySet} vs ${exact.keySet}")
    got.foreach { case (lang, (dd, dt)) =>
      val (ed, et) = exact(lang)
      assert(math.abs(dd - ed) <= math.max(2.0, 0.05 * ed), s"$lang docs: $dd vs $ed")
      assert(math.abs(dt - et) <= math.max(2.0, 0.05 * et), s"$lang tokens: $dt vs $et")
      // accumulation is real: the lifetime doc estimate exceeds what
      // batch 2 alone could account for
      val n2 = spark.read.parquet(base.resolve("out2").toString)
        .filter(col("lang") === lang).count()
      assert(dd > n2 * 0.9, s"$lang lifetime $dd does not exceed batch-2-only $n2")
    }
    // group-column drift between increments is rejected loudly
    val drift = write(base.resolve("carddrift.conf"),
      s"""source { storage-type = local, dataset-dir = $b1 }
         |target { storage-type = local, dataset-dir = ${base.resolve("outD")} }
         |curation {
         |  state-dir = ${base.resolve("state2")}
         |  cardinality-group-columns = [source]
         |}
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Curator.main(Array("--conf", drift)) }
    // gram-size drift is rejected too (token and n-gram sketches do
    // not mean anything merged)
    val gdrift = write(base.resolve("cardgdrift.conf"),
      s"""source { storage-type = local, dataset-dir = $b1 }
         |target { storage-type = local, dataset-dir = ${base.resolve("outG")} }
         |curation {
         |  state-dir = ${base.resolve("state2")}
         |  cardinality-group-columns = [lang]
         |  cardinality-gram-size = 3
         |}
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Curator.main(Array("--conf", gdrift)) }
    // shingle mode: distinct trigram estimate exceeds distinct tokens
    // (each doc contributes ~as many trigrams as tokens, far fewer repeats)
    import org.apache.spark.sql.functions.sum
    val tokTotal = spark.read.parquet(base.resolve("cardrep2").toString)
      .agg(sum("distinct_tokens")).head().getLong(0)
    val g3 = graft.llm.Cardinality.report(
      graft.llm.Cardinality.sketchState(docs, Seq("lang"), gramSize = 3), Seq("lang"))
      .agg(sum("distinct_tokens")).head().getLong(0)
    assert(g3 > tokTotal, s"distinct trigrams $g3 should exceed distinct tokens $tokTotal")
  }

  test("curator freq state: lifetime heavy hitters accumulate exactly across " +
      "batches, carry forward on stage-off, reject column-set and k drift") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val b1 = base.resolve("fb1.parquet").toString
    val b2 = base.resolve("fb2.parquet").toString
    docs.filter(col("doc_id") % 2 === 0).write.parquet(b1)
    docs.filter(col("doc_id") % 2 === 1).write.parquet(b2)
    def conf(run: Int, src: String, stateIn: Option[String], knobs: String) =
      write(base.resolve(s"freq$run.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"fout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"fstate$run")}
           |$knobs
           |}
           |""".stripMargin)
    val freqKnobs =
      s"""  freq-value-columns = [source, lang]
         |  freq-report-dir = ${base.resolve("freqrep")}""".stripMargin
    graft.cli.Curator.main(Array("--conf", conf(1, b1, None, freqKnobs)))
    assert(new java.io.File(base.resolve("fstate1").resolve("freqsketch").toString).exists())
    graft.cli.Curator.main(Array("--conf",
      conf(2, b2, Some(base.resolve("fstate1").toString), freqKnobs)))
    // k=64 exceeds the lifetime distinct sources/langs, so no MG trim
    // ever fires: the lifetime report must EQUAL the exact group-by
    // over the union of what the two runs actually emitted
    val emitted = spark.read.parquet(base.resolve("fout1").toString)
      .unionByName(spark.read.parquet(base.resolve("fout2").toString))
    val rep = spark.read.parquet(base.resolve("freqrep").toString)
    Seq("source", "lang").foreach { cn =>
      val got = rep.filter(col("value_column") === cn)
        .select("item", "estimate")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = emitted.groupBy(cn).count()
        .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
      assert(got == exact, s"$cn lifetime: $got vs exact $exact")
    }
    // stage off in run 3: the lifetime sketch carries forward unchanged
    graft.cli.Curator.main(Array("--conf",
      conf(3, b1, Some(base.resolve("fstate2").toString), "")))
    val carried = spark.read.parquet(base.resolve("fstate3").resolve("freqsketch").toString)
    val prior = spark.read.parquet(base.resolve("fstate2").resolve("freqsketch").toString)
    assert(carried.collect().toSet == prior.collect().toSet,
      "stage-off run must carry the freqsketch state forward unchanged")
    // column-set drift between increments is rejected loudly
    val cdrift = conf(4, b1, Some(base.resolve("fstate2").toString),
      "  freq-value-columns = [lang]")
    val e1 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", cdrift))
    }
    assert(e1.getMessage.contains("per-column sketches"), e1.getMessage)
    // k drift is rejected inside the merge
    val kdrift = conf(5, b1, Some(base.resolve("fstate2").toString),
      "  freq-value-columns = [source, lang]\n  freq-k = 8")
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", kdrift))
    }
    assert(e2.getMessage.contains("mixed k"), e2.getMessage)
  }

  test("curator cardinality-hash-grams: hashed sketch+hit state accumulates; " +
      "representation drift against string state is rejected") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val b1 = base.resolve("hb1.parquet").toString
    docs.filter(col("doc_id") < 100).write.parquet(b1)
    val benchDir = base.resolve("hbench").toString
    docs.filter(col("doc_id") < 10).select("doc_id", "text").write.parquet(benchDir)
    def conf(run: Int, stateIn: Option[String], hashed: Boolean) =
      write(base.resolve(s"hash$run.conf"),
        s"""source { storage-type = local, dataset-dir = $b1 }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"hout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"hstate$run")}
           |  cardinality-group-columns = [source]
           |  cardinality-gram-size = 8
           |  cardinality-hash-grams = $hashed
           |  benchmark-dir = $benchDir
           |  contamination-min-hits = 999
           |  cardinality-report-dir = ${base.resolve(s"hrep$run")}
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, None, hashed = true)))
    // the hit state is 8-byte hashes, not strings
    val hits = spark.read.parquet(base.resolve("hstate1").resolve("benchhits").toString)
    assert(hits.columns.contains("gram_hash") && !hits.columns.contains("gram"))
    assert(hits.count() > 0)
    val rep = spark.read.parquet(base.resolve("hrep1").toString)
    assert(rep.filter(col("shared_grams") > 0).count() > 0,
      "benchmark drawn from the corpus must overlap")
    // toggling the representation against committed hashed state fails
    // loudly (cardsketch schema compare catches it first)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(2, Some(base.resolve("hstate1").toString), hashed = false)))
    }
    assert(err.getMessage.contains("do not merge"), err.getMessage)
  }

  test("curator token-budgets: per-source token caps bite in docs-in-digest " +
      "order; unbudgeted sources pass whole; scale knob avoids the window") {
    import org.apache.spark.sql.functions.{col, sum}
    val base = tmp()
    val src = base.resolve("tbsrc").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").write.parquet(src)
    def conf(name: String, extra: String) = write(base.resolve(s"$name.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"out_$name")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  token-budgets { src0 = 300, src1 = 0 }
         |$extra
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf("tb", "")))
    val out = spark.read.parquet(base.resolve("out_tb").toString)
    val tok = out.groupBy("source").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxDoc = out.filter(col("source") === "src0")
      .agg(org.apache.spark.sql.functions.max("n_tokens").cast("long")).head().getLong(0)
    assert(tok("src0") >= 300 && tok("src0") < 300 + maxDoc,
      s"budget with crossing-doc overshoot: ${tok.get("src0")}")
    assert(!tok.contains("src1"), "zero budget keeps nothing")
    val full = spark.read.parquet(src).filter(col("source") === "src2").count()
    assert(out.filter(col("source") === "src2").count() == full,
      "unbudgeted source passes whole")
    // scale form: approximate mass, same knobs
    graft.cli.Curator.main(Array("--conf", conf("tbs", "  token-budget-scale = true")))
    val gotS = spark.read.parquet(base.resolve("out_tbs").toString)
      .filter(col("source") === "src0").agg(sum("n_tokens")).head().getLong(0)
    assert(gotS > 0 && math.abs(gotS - 300) <= 300,
      s"scale form lands in the budget band: $gotS")
  }

  test("differ: zero drift on identical data passes; a shifted dataset " +
      "breaches the gate AFTER the report is written") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    val refDir = base.resolve("dref").toString
    val sameDir = base.resolve("dsame").toString
    val shiftDir = base.resolve("dshift").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    li.write.parquet(refDir)
    li.write.parquet(sameDir)
    // shifted copy: quantities doubled, flags collapsed to one value
    li.select(org.apache.spark.sql.functions.lit("X").as("l_returnflag"),
        (col("l_quantity") * 2).as("l_quantity"))
      .write.parquet(shiftDir)
    def conf(name: String, srcDir: String, extra: String) =
      write(base.resolve(s"$name.conf"),
        s"""source { storage-type = local, dataset-dir = $srcDir }
           |reference { storage-type = local, dataset-dir = $refDir }
           |diff {
           |  discrete-columns = [l_returnflag]
           |  continuous-columns = [l_quantity]
           |  report-dir = ${base.resolve(s"rep_$name")}
           |  max-drift = 0.1
           |$extra
           |}
           |""".stripMargin)
    graft.cli.Differ.main(Array("--conf", conf("same", sameDir, "")))
    val rep = spark.read.parquet(base.resolve("rep_same").toString)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rep.keySet == Set("l_returnflag", "l_quantity"))
    assert(rep.values.forall(_ == 0.0), s"identical data must show zero drift: $rep")
    val err = intercept[IllegalStateException] {
      graft.cli.Differ.main(Array("--conf", conf("shift", shiftDir, "")))
    }
    assert(err.getMessage.contains("l_returnflag"), err.getMessage)
    // the artifact landed BEFORE the breach was raised
    val rep2 = spark.read.parquet(base.resolve("rep_shift").toString)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rep2("l_returnflag") > 0.5, s"collapsed flags must drift hard: $rep2")
    // degenerate reference: an all-constant continuous column must
    // fail loudly, never read as zero drift (review finding)
    val constDir = base.resolve("dconst").toString
    li.select(col("l_returnflag"),
        org.apache.spark.sql.functions.lit(1.0).as("l_quantity"))
      .write.parquet(constDir)
    val badConf = write(base.resolve("dbad.conf"),
      s"""source { storage-type = local, dataset-dir = $sameDir }
         |reference { storage-type = local, dataset-dir = $constDir }
         |diff { continuous-columns = [l_quantity], max-drift = 0.1 }
         |""".stripMargin)
    val degen = intercept[IllegalArgumentException] {
      graft.cli.Differ.main(Array("--conf", badConf))
    }
    assert(degen.getMessage.contains("distinct"), degen.getMessage)
    // sketch form agrees on the continuous column within tolerance
    graft.cli.Differ.main(Array("--conf",
      conf("sk", sameDir, "  sketch = true")))
    val rep3 = spark.read.parquet(base.resolve("rep_sk").toString)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rep3("l_quantity") <= 0.05, s"sketch drift on identical data: $rep3")
  }

  test("differ edges-dir: run 1 persists bin edges, run 2 reuses them so " +
      "nightly TVDs compare even as the reference range drifts; a shifted " +
      "copy still breaches under pinned edges") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    val refDir = base.resolve("eref").toString
    val ref2Dir = base.resolve("eref2").toString
    val shiftDir = base.resolve("eshift").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_quantity")
    li.write.parquet(refDir)
    // a DIFFERENT reference snapshot with a wider range — without
    // pinned edges this run would re-bin everything
    li.select((col("l_quantity") * 10).as("l_quantity")).write.parquet(ref2Dir)
    li.select((col("l_quantity") * 2).as("l_quantity")).write.parquet(shiftDir)
    val edges = base.resolve("edges").toString
    def conf(name: String, srcDir: String, refD: String, extra: String = "") =
      write(base.resolve(s"e$name.conf"),
        s"""source { storage-type = local, dataset-dir = $srcDir }
           |reference { storage-type = local, dataset-dir = $refD }
           |diff {
           |  continuous-columns = [l_quantity]
           |  report-dir = ${base.resolve(s"erep_$name")}
           |  edges-dir = $edges
           |  max-drift = 0.1
           |$extra
           |}
           |""".stripMargin)
    // run 1: derives and persists the reference edges; identical data
    // shows zero drift
    graft.cli.Differ.main(Array("--conf", conf("r1", refDir, refDir)))
    val stored = spark.read.parquet(s"$edges/edges").collect()
    assert(stored.length == 1 && stored.head.getString(0) == "l_quantity")
    val run1Edges = stored.head.getSeq[Double](1)
    assert(run1Edges.length >= 2)
    val rep1 = spark.read.parquet(base.resolve("erep_r1").toString).head()
    assert(rep1.getString(1) == "tvd_continuous" && rep1.getDouble(2) == 0.0)
    // run 2: reuses run-1 edges (metric says so, file unchanged) even
    // though THIS run's reference has a 10x range — without the pin the
    // shifted source below would be rebinned into looking closer
    val err = intercept[IllegalStateException] {
      graft.cli.Differ.main(Array("--conf", conf("r2", shiftDir, ref2Dir)))
    }
    assert(err.getMessage.contains("l_quantity"), err.getMessage)
    val rep2 = spark.read.parquet(base.resolve("erep_r2").toString).head()
    assert(rep2.getString(1) == "tvd_fixed_edges", rep2.toString)
    assert(rep2.getDouble(2) > 0.1, s"shifted copy must breach under pinned edges: $rep2")
    val stored2 = spark.read.parquet(s"$edges/edges").head().getSeq[Double](1)
    assert(stored2 == run1Edges, "run 2 must not rewrite the pinned edges")
    // a changed column set does not compare longitudinally — rejected
    val badCols = write(base.resolve("ebad.conf"),
      s"""source { storage-type = local, dataset-dir = $refDir }
         |reference { storage-type = local, dataset-dir = $refDir }
         |diff {
         |  continuous-columns = [l_quantity, l_missing]
         |  edges-dir = $edges
         |}
         |""".stripMargin)
    val e1 = intercept[IllegalArgumentException] {
      graft.cli.Differ.main(Array("--conf", badCols))
    }
    assert(e1.getMessage.contains("l_missing"), e1.getMessage)
    // edges-dir + sketch is contradictory config — rejected
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Differ.main(Array("--conf",
        conf("sk", refDir, refDir, "  sketch = true")))
    }
    assert(e2.getMessage.contains("sketch"), e2.getMessage)
  }

  test("curator stage log: the artifact covers every enabled stage in run " +
      "order with seconds and observed row counts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val src = base.resolve("slsrc").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60)
      .withColumn("url", concat(lit("https://ok.example.org/"), col("doc_id")))
      .write.parquet(src)
    val bl = base.resolve("sl_block.txt")
    write(bl, "blocked.example.net\n")
    val logPath = base.resolve("stage_log.json").toString
    val f = write(base.resolve("curator_sl.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("slout")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  domain-column = url
         |  blocklist-path = "$bl"
         |  redact = true
         |  boilerplate-min-doc-freq = 50
         |  span-dedup-tokens = 20
         |  quality-quantile = 0.9
         |  splits = ["train:0.9", "val:0.1"]
         |  chunk-size = 64
         |  shuffle-salt = e1
         |  state-out-dir = ${base.resolve("slstate")}
         |  report-dir = ${base.resolve("slrep")}
         |  cardinality-group-columns = [source]
         |  stage-log-path = "$logPath"
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(logPath)), "UTF-8")
    val enabled = Seq("domain-gate", "redact", "boilerplate", "span-dedup",
      "curate", "quality-quantile", "splits", "chunking", "shuffle",
      "target-write", "corpus-report", "cardinality", "state-write")
    enabled.foreach { st =>
      assert(json.contains(s""""$st":{"sec":"""), s"stage '$st' missing from: $json")
    }
    // disabled stages are absent; counted stages carry their rows
    Seq("decontaminate", "mixture", "dsir", "encode-ids", "incremental-text-tiers")
      .foreach { st => assert(!json.contains(s""""$st""""), s"'$st' should be absent") }
    assert(json.contains(""""curate":{"sec":""") && json.contains(""""rows":"""))
    // run order is preserved: the gate precedes the write
    assert(json.indexOf("domain-gate") < json.indexOf("target-write"))
  }
}
