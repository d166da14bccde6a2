package graft

import java.nio.file.{Files, Path}
import graft.cli.Cli
import graft.conf.GraftConfig

/** E1-E3 CLI pipelines end-to-end against testdata (B1-B4). Sessions in
  * these tests reuse the shared local session via getOrCreate (the
  * configs set no master), so session-from-config props are asserted
  * separately on the parse level. */
class CliSpec extends SparkTestBase {

  private def tmp(): Path = Files.createTempDirectory("graft-cli")

  private def write(path: Path, text: String): String = {
    Files.writeString(path, text)
    path.toString
  }

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

  test("curator contamination budget: lifetime hit grams accumulate across " +
      "batches; report carries the fraction next to the distinct estimates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // two 10-token benchmark snippets of unique tokens → 3 distinct
    // 8-gram shingles each; batch 1 quotes snippet A, batch 2 snippet B
    val snipA = (1 to 10).map(i => s"zqa$i").mkString(" ")
    val snipB = (1 to 10).map(i => s"zqb$i").mkString(" ")
    val benchDir = base.resolve("bench.parquet").toString
    Seq(snipA, snipB).toDF("text").write.parquet(benchDir)
    val b1 = base.resolve("cb1.parquet").toString
    val b2 = base.resolve("cb2.parquet").toString
    docs.filter(col("doc_id") < 50)
      .withColumn("text", when(col("doc_id") === 0, concat(col("text"), lit(" " + snipA)))
        .otherwise(col("text"))).write.parquet(b1)
    docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
      .withColumn("text", when(col("doc_id") === 50, concat(col("text"), lit(" " + snipB)))
        .otherwise(col("text"))).write.parquet(b2)
    def conf(run: Int, src: String, stateIn: Option[String]) =
      write(base.resolve(s"cont$run.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"cout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"cstate$run")}
           |  cardinality-group-columns = [source]
           |  cardinality-gram-size = 8
           |  benchmark-dir = $benchDir
           |  contamination-min-hits = 1000000
           |  cardinality-report-dir = ${base.resolve(s"contrep$run")}
           |}
           |""".stripMargin)
    // (contamination-min-hits set sky-high so the decontamination FILTER
    // keeps the planted docs — this test is about the BUDGET numbers)
    graft.cli.Curator.main(Array("--conf", conf(1, b1, None)))
    assert(new java.io.File(base.resolve("cstate1").resolve("benchhits").toString).exists(),
      "hit-gram state must ride the commit")
    val rep1 = spark.read.parquet(base.resolve("contrep1").toString)
    assert(rep1.columns.toSet.contains("contaminated_fraction") &&
      rep1.columns.toSet.contains("shared_grams"))
    assert(rep1.agg(sum("shared_grams")).head().getLong(0) == 3L,
      "snippet A contributes exactly its 3 interior 8-gram shingles")
    graft.cli.Curator.main(Array("--conf",
      conf(2, b2, Some(base.resolve("cstate1").toString))))
    val rep2 = spark.read.parquet(base.resolve("contrep2").toString).persist()
    // lifetime: batch 1's snippet-A hits persist even though batch 2
    // never contained snippet A
    assert(rep2.agg(sum("shared_grams")).head().getLong(0) == 6L,
      "lifetime hit grams must accumulate across batches")
    // fraction arithmetic: shared / estimated distinct, per group
    rep2.collect().foreach { r =>
      val est = r.getAs[Long]("distinct_grams")
      val shared = r.getAs[Long]("shared_grams")
      val frac = r.getAs[Double]("contaminated_fraction")
      if (est > 0)
        assert(math.abs(frac - shared.toDouble / est) < 1e-9,
          s"${r.getAs[String]("source")}: $frac vs $shared/$est")
    }
    rep2.unpersist()
    ()
  }

  test("curator target write honors the DataIO layout knobs (range-by disjoint files)") {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val base = tmp()
    val out = base.resolve("ranged").toString
    // the write-layout knobs live on the TARGET config — the same K0
    // surface every DataIO sink gets — so curated corpora lay out for
    // data skipping without a separate pass
    val f = write(base.resolve("curator_layout.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target {
         |  storage-type = local, dataset-dir = $out,
         |  dataset-store-format = parquet, write-mode = overwrite,
         |  range-by = [doc_id], n-partitions = 4,
         |}
         |curation { min-quality = 0.2 }
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val spans = spark.read.parquet(out).groupBy(input_file_name())
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .select("lo", "hi").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(spans.length >= 2, s"expected multiple ranged files, got ${spans.length}")
    spans.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file ranges overlap: $spans")
    }
    // z-order layout also flows through (doc_id × n_tokens curve)
    val zout = base.resolve("zordered").toString
    val fz = write(base.resolve("curator_zorder.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target {
         |  storage-type = local, dataset-dir = $zout,
         |  dataset-store-format = parquet, write-mode = overwrite,
         |  zorder-by = [doc_id, n_tokens], zorder-bits = 4, n-partitions = 4,
         |}
         |curation { min-quality = 0.2 }
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", fz))
    assert(spark.read.parquet(zout).count() ==
      spark.read.parquet(out).count(), "layout must be a pure reordering")
  }

  test("curator quality-quantile keeps a per-group top-prefix; shuffle-salt " +
      "emits the deterministic export permutation") {
    import org.apache.spark.sql.functions.{col, concat, input_file_name, lit, max, md5, min}
    val base = tmp()
    // run 1: plain curation — the reference survivor set
    val out1 = base.resolve("all").toString
    val f1 = write(base.resolve("curator_all.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out1, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-quality = 0.2 }
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f1))
    // run 2: same curation + top-50% by n_chars within each lang + a
    // shuffled export. Score/group columns ride on documents natively,
    // so the top-prefix check below is independent of the annotators.
    val out2 = base.resolve("quantiled").toString
    val f2 = write(base.resolve("curator_quant.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out2, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.2
         |  quality-quantile = 0.5
         |  quantile-group-column = lang
         |  quantile-score-column = n_chars
         |  shuffle-salt = ep0
         |  shuffle-partitions = 3
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f2))
    val all = spark.read.parquet(out1).select("doc_id", "lang", "n_chars")
    val kept = spark.read.parquet(out2)
    // quantile stage: kept ⊂ all, and within each lang the kept set is a
    // top-prefix of the n_chars order (lowest kept ≥ highest dropped)
    assert(kept.count() > 0 && kept.count() < all.count(),
      s"quantile must drop some but not all: ${kept.count()} of ${all.count()}")
    val dropped = all.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val bad = kept.groupBy("lang").agg(min("n_chars").as("kmin"))
      .join(dropped.groupBy("lang").agg(max("n_chars").as("dmax")), Seq("lang"))
      .filter(col("kmin") < col("dmax")).count()
    assert(bad == 0, "kept set is not a per-lang top-prefix of n_chars")
    // shuffle stage: the key column landed and matches the shared md5
    // digest of the doc id (no chunking → row identity is the doc)
    assert(kept.columns.contains("shuffle_key"))
    assert(kept.filter(col("shuffle_key") =!= md5(concat(
      col("doc_id").cast("string"), lit("|"), lit("ep0")))).count() == 0)
    // file layout IS the permutation: each file holds a disjoint
    // ascending key range (range partition), readable in file order
    val spans = kept.groupBy(input_file_name())
      .agg(min("shuffle_key").as("lo"), max("shuffle_key").as("hi"))
      .select("lo", "hi").collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1)
    assert(spans.length >= 2, s"expected multiple shuffled files, got ${spans.length}")
    spans.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"shuffled file key ranges overlap: ${spans.mkString(",")}")
    }
    // combining the shuffle with a target layout knob is rejected up
    // front — a post-shuffle repartition would destroy the permutation
    val fBad = write(base.resolve("curator_badshuffle.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target {
         |  storage-type = local, dataset-dir = ${base.resolve("nope")},
         |  dataset-store-format = parquet, write-mode = overwrite,
         |  range-by = [doc_id],
         |}
         |curation { min-quality = 0.2, shuffle-salt = ep0 }
         |""".stripMargin)
    intercept[IllegalArgumentException](graft.cli.Curator.main(Array("--conf", fBad)))
    // partition-by regroups rows into per-value subdirectories — just as
    // order-destroying as the K0 layouts, and guarded by the same
    // DataIO-owned knob list
    val fBad2 = write(base.resolve("curator_badshuffle2.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target {
         |  storage-type = local, dataset-dir = ${base.resolve("nope2")},
         |  dataset-store-format = parquet, write-mode = overwrite,
         |  partition-by = [lang],
         |}
         |curation { min-quality = 0.2, shuffle-salt = ep0 }
         |""".stripMargin)
    intercept[IllegalArgumentException](graft.cli.Curator.main(Array("--conf", fBad2)))
    // and the conflict fires from config alone — before any Spark work
    val fBad3 = write(base.resolve("curator_badquant.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("nope3")}, dataset-store-format = parquet }
         |curation { quality-quantile = 25 }
         |""".stripMargin)
    intercept[IllegalArgumentException](graft.cli.Curator.main(Array("--conf", fBad3)))
  }

  test("curator drops stuffed docs (max-repetition) and benchmark-contaminated docs") {
    import spark.implicits._
    val base = tmp()
    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    Seq((900L, benchText)).toDF("doc_id", "text")
      .write.parquet(base.resolve("bench").toString)
    val corpus = Seq(
      (1L, "w1a w1b w1c w1d w1e w1f w1g w1h w1i w1j w1k w1l"), // clean prose
      (2L, Seq.fill(30)("buy now").mkString(" ")),              // stuffed: rep ≈ 0.97
      (3L, s"intro words $benchText outro words"))              // contaminated
      .toDF("doc_id", "text")
    corpus.write.parquet(base.resolve("corpus").toString)
    val f = write(base.resolve("curator_filters.conf"),
      s"""source { storage-type = local, dataset-dir = ${base.resolve("corpus")} }
         |target { storage-type = local, dataset-dir = ${base.resolve("fout")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  max-repetition = 0.5
         |  benchmark-dir = ${base.resolve("bench")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val out = spark.read.parquet(base.resolve("fout").toString)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L),
      "only the clean doc may survive repetition + contamination filters")
    // the annotation rides along for observability
    assert(out.columns.contains("repetition"))
  }

  test("curator contamination-near-dup: a paraphrased benchmark copy the " +
      "n-gram tier misses is dropped by the SimHash tier") {
    import spark.implicits._
    val base = tmp()
    def hex(seed: String) =
      f"${scala.util.hashing.MurmurHash3.stringHash(seed)}%08x"
    val benchWords = (0 until 50).map(j => hex(s"cb-$j"))
    Seq((900L, benchWords.mkString(" "))).toDF("doc_id", "text")
      .write.parquet(base.resolve("ndbench").toString)
    // near-copy: case-reformatted token stream (identical shingles ->
    // hamming 0; different bytes -> no exact-hash or 8-gram-cased match
    // for the disabled tier); unrelated: fresh vocabulary
    val corpus = Seq(
      (1L, benchWords.zipWithIndex.map { case (w, i) =>
        if (i % 7 == 0) w.toUpperCase else w }.mkString(" ")),
      (2L, (0 until 50).map(j => hex(s"clean-$j")).mkString(" ")))
      .toDF("doc_id", "text")
    corpus.write.parquet(base.resolve("ndcorpus").toString)
    def conf(name: String, nearDup: Boolean) = write(base.resolve(s"$name.conf"),
      s"""source { storage-type = local, dataset-dir = ${base.resolve("ndcorpus")} }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"out_$name")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  benchmark-dir = ${base.resolve("ndbench")}
         |  contamination-min-hits = 999
         |${if (nearDup) "  contamination-near-dup = true" else ""}
         |}
         |""".stripMargin)
    // min-hits 999 disables the exact tier: without the near-dup tier
    // the paraphrase sails through...
    graft.cli.Curator.main(Array("--conf", conf("ndoff", nearDup = false)))
    assert(spark.read.parquet(base.resolve("out_ndoff").toString)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // ...and with it, only the genuinely clean doc survives
    graft.cli.Curator.main(Array("--conf", conf("ndon", nearDup = true)))
    assert(spark.read.parquet(base.resolve("out_ndon").toString)
      .select("doc_id").as[Long].collect().toSet == Set(2L),
      "the SimHash tier must catch what the n-gram tier was blinded to")
  }

  test("curator vector tier: planted embedding echoes converge across runs") {
    import org.apache.spark.sql.functions.{col, lit, transform => tf}
    import spark.implicits._
    val base = tmp()
    // distinct-token texts so the TEXT tiers never fire — every drop in
    // this test must come from the vector tier
    def texts(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, s"t${i}a t${i}b t${i}c t${i}d t${i}e t${i}f t${i}g t${i}h"))
        .toDF("doc_id", "text")
    val allEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def withEmb(t: org.apache.spark.sql.DataFrame, vecFrom: Long => Long) = {
      val ids = t.select("doc_id").as[Long].collect().toSeq
      val m = ids.map(i => i -> vecFrom(i)).toDF("doc_id", "vec_id")
      t.join(m, "doc_id").join(allEmb, "vec_id").drop("vec_id")
    }
    def conf(run: Int, in: String, stateIn: Option[String]) = write(base.resolve(s"vec$run.conf"),
      s"""source { storage-type = local, dataset-dir = $in }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"vout$run")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  embedding-column = embedding
         |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
         |  state-out-dir = ${base.resolve(s"vstate$run")}
         |}
         |""".stripMargin)
    // run 1: docs 0..19 carry embeddings 0..19
    val in1 = base.resolve("vin1").toString
    withEmb(texts(0L until 20L), identity).write.parquet(in1)
    graft.cli.Curator.main(Array("--conf", conf(1, in1, None)))
    val n1 = spark.read.parquet(base.resolve("vout1").toString).count()
    assert(n1 == 20, s"run 1 should keep all 20 distinct docs, kept $n1")
    assert(spark.read.parquet(base.resolve("vstate1").resolve("vecsigs").toString).count() == 20)
    // run 2: 10 ECHOES (new ids/texts, embeddings 0..9 perturbed ~1e-4
    // in direction -> cosine ~1) + 10 FRESH rows (embeddings 40..49)
    val in2 = base.resolve("vin2").toString
    val echoes = withEmb(texts(1000L until 1010L), i => i - 1000L)
      .withColumn("embedding", tf(col("embedding"),
        x => (x * lit(1.0f) + x * lit(1e-4f)).cast("float")))
    val fresh = withEmb(texts(2000L until 2010L), i => i - 1960L)
    echoes.unionByName(fresh).write.parquet(in2)
    graft.cli.Curator.main(Array("--conf",
      conf(2, in2, Some(base.resolve("vstate1").toString))))
    val out2 = spark.read.parquet(base.resolve("vout2").toString)
    val kept2 = out2.select("doc_id").as[Long].collect().toSet
    assert(kept2 == (2000L until 2010L).toSet,
      s"vector tier must drop exactly the 10 echoes, kept $kept2")
    // state accumulated under the commit marker
    assert(spark.read.parquet(base.resolve("vstate2").resolve("vecsigs").toString).count() == 30)
    assert(new java.io.File(base.resolve("vstate2").resolve("_COMMITTED").toString).exists())
    // run 3: echoes of run 2's fresh vectors -> converges to zero
    val in3 = base.resolve("vin3").toString
    withEmb(texts(3000L until 3010L), i => i - 2960L).write.parquet(in3)
    graft.cli.Curator.main(Array("--conf",
      conf(3, in3, Some(base.resolve("vstate2").toString))))
    assert(spark.read.parquet(base.resolve("vout3").toString).count() == 0)
    // seed/band drift against committed vector state is rejected
    val drift = write(base.resolve("vecdrift.conf"),
      s"""source { storage-type = local, dataset-dir = $in3 }
         |target { storage-type = local, dataset-dir = ${base.resolve("voutZ")} }
         |curation { min-quality = 0.0, embedding-column = embedding,
         |  srp-seed = 99, state-dir = ${base.resolve("vstate2")} }
         |""".stripMargin)
    intercept[IllegalArgumentException] { graft.cli.Curator.main(Array("--conf", drift)) }
  }

  test("curator LM filter: lm-path + min-lm-logp drop off-distribution docs; floor alone rejects") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    // train + save an LM on the corpus' own reference slice
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val lm = graft.llm.LangModel.trainUnigram(
      docs.filter(col("doc_id") < 200), "text", minCount = 2)
    val lmPath = base.resolve("ref.lm").toString
    graft.llm.LangModel.save(lm, lmPath)
    // corpus with a planted off-distribution doc
    val src = base.resolve("src").toString
    import spark.implicits._
    docs.filter(col("doc_id") < 50)
      .unionByName(
        Seq((80000L, "zxqv kwpj vrtn qplm wxyz bcdf " * 8)).toDF("doc_id", "text"))
      .write.parquet(src)
    val out = base.resolve("curated").toString
    val f = write(base.resolve("curator_lm.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  lm-path = "$lmPath"
         |  min-lm-logp = -2.5
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val curated = spark.read.parquet(out)
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(80000L), "off-distribution doc survived the curator LM filter")
    assert(ids.contains(0L))
    assert(curated.columns.contains("lm_logp"))

    // the bigram filter stacks on the same pipeline: a doc built from
    // REAL in-distribution tokens in scrambled order passes the
    // unigram filter but fails the order-aware bigram one
    val bi = graft.llm.LangModel.trainBigram(
      docs.filter(col("doc_id") < 200), "text", minCount = 2)
    val lm2Path = base.resolve("ref.lm2").toString
    graft.llm.LangModel.saveBigram(bi, lm2Path)
    val sample = docs.filter(col("doc_id") === 0L)
      .head().getString(1).split("\\s+").filter(_.nonEmpty)
    val scrambled = sample.reverse.mkString(" ")
    val src2 = base.resolve("src2").toString
    docs.filter(col("doc_id") < 50)
      .unionByName(Seq((90000L, scrambled)).toDF("doc_id", "text"))
      .write.parquet(src2)
    // floor = the scrambled doc's unigram-equivalent would pass; pick
    // the bigram floor between the natural docs' scores and scrambled's
    val probe = spark.read.parquet(src2)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.lm2LogProb(col("text"), lm2Path).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val floor2 = (probe(90000L) + probe.filter(_._1 < 50).values.min) / 2
    val f2 = write(base.resolve("curator_lm2.conf"),
      s"""source { storage-type = local, dataset-dir = $src2 }
         |target { storage-type = local, dataset-dir = ${base.resolve("curated2")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  lm2-path = "$lm2Path"
         |  min-lm2-logp = $floor2
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f2))
    val ids2 = spark.read.parquet(base.resolve("curated2").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids2.contains(90000L), "scrambled doc survived the bigram filter")
    assert(ids2.contains(0L), "the in-order original must survive")

    // min-lm-logp without lm-path is a config error, caught UP FRONT
    val bad = write(base.resolve("curator_lm_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-lm-logp = -2.5 }
         |""".stripMargin)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(err.getMessage.contains("lm-path"))
  }

  test("curator ppl buckets: CCNet head+middle keep drops the per-group " +
      "worst scorers; bucket label rides the output; keep-list validated") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val lm = graft.llm.LangModel.trainUnigram(
      docs.filter(col("doc_id") < 200), "text", minCount = 2)
    val lmPath = base.resolve("ppl_ref.lm").toString
    graft.llm.LangModel.save(lm, lmPath)
    // one group of 30 real docs + 3 planted extreme off-distribution
    // docs: the planted rows are the group's worst scorers, so with
    // thirds they are guaranteed inside the tail bucket
    val src = base.resolve("pplsrc").toString
    docs.filter(col("doc_id") < 30)
      .unionByName((0 until 3).map(i =>
        (70000L + i, s"zxqv$i kwpj vrtn qplm wxyz bcdf " * 8))
        .toDF("doc_id", "text"))
      .withColumn("source", lit("web"))
      .write.parquet(src)
    val out = base.resolve("pplcurated").toString
    val f = write(base.resolve("curator_ppl.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  lm-path = "$lmPath"
         |  ppl-bucket-keep = [head, middle]
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val curated = spark.read.parquet(out)
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(Set(70000L, 70001L, 70002L)).isEmpty,
      "planted worst scorers must fall in the dropped tail bucket")
    assert(ids.nonEmpty && ids.exists(_ < 30),
      "head+middle docs must survive")
    assert(curated.columns.contains("ppl_bucket"),
      "bucket label must ride the output as provenance")
    assert(curated.select("ppl_bucket").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("head", "middle")))
    // keep-list without lm-path rejected up front; unknown bucket too
    val bad1 = write(base.resolve("curator_ppl_bad1.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation { ppl-bucket-keep = [head] }
         |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad1))
    }.getMessage.contains("lm-path"))
    val bad2 = write(base.resolve("curator_ppl_bad2.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation { lm-path = "$lmPath", ppl-bucket-keep = [head, bogus] }
         |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad2))
    }.getMessage.contains("bogus"))
    // `ppl-bucket-model = mkn`: CCNet's ACTUAL configuration — buckets
    // by the KenLM-class modified-KN score over the knn-path artifact.
    // The planted gibberish has no seen n-grams at any order, so it
    // bottoms out at the OOV floor per position and lands in the
    // dropped tail under the stronger model too.
    val kn = graft.llm.LangModel.trainKneserNeyNMod(
      docs.filter(col("doc_id") < 200), "text", order = 4)
    val knPath = base.resolve("ppl_mkn.lm4").toString
    graft.llm.LangModel.saveNgram(kn.ngram, knPath)
    val outM = base.resolve("pplmkn").toString
    val fm = write(base.resolve("curator_ppl_mkn.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $outM, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  knn-path = "$knPath"
         |  ppl-bucket-model = mkn
         |  ppl-bucket-keep = [head, middle]
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", fm))
    val idsM = spark.read.parquet(outM).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsM.intersect(Set(70000L, 70001L, 70002L)).isEmpty,
      "planted gibberish must fall in the tail under the mkn model too")
    assert(idsM.nonEmpty && idsM.exists(_ < 30))
    // model knob without the keep list is dead config; knn model
    // without knn-path rejected up front
    assert(intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", write(base.resolve("curator_ppl_bad3.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = $outM, dataset-store-format = parquet, write-mode = overwrite }
           |curation { ppl-bucket-model = mkn }
           |""".stripMargin)))
    }.getMessage.contains("ppl-bucket-keep"))
    assert(intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", write(base.resolve("curator_ppl_bad4.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = $outM, dataset-store-format = parquet, write-mode = overwrite }
           |curation { ppl-bucket-model = knn, ppl-bucket-keep = [head] }
           |""".stripMargin)))
    }.getMessage.contains("knn-path"))
  }

  test("curator order-n LM filter: lmn-path + min-lmn-logp drop a scrambled " +
      "doc under the 4-gram; floor alone rejects up front") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val lm = graft.llm.LangModel.trainNgram(
      docs.filter(col("doc_id") < 100), "text", order = 4, minCount = 2)
    val lmnPath = base.resolve("ref.lm4").toString
    graft.llm.LangModel.saveNgram(lm, lmnPath)
    // plant the SAME tokens twice: in corpus order (91001) and reversed
    // (91000) — identical unigrams, so only the higher-order
    // continuations separate them; the floor sits between THEIR scores
    // (real docs vary too much for a global floor, the whole reason the
    // filter is a knob)
    val sample = docs.filter(col("doc_id") === 0).head().getString(1)
      .split("\\s+").filter(_.nonEmpty).take(40)
    val ordered = sample.mkString(" ")
    val scrambled = sample.reverse.mkString(" ")
    val src = base.resolve("lmnsrc").toString
    // doc 0 itself stays OUT of the corpus: 91001 is its 40-token
    // prefix and would near-dup against it in curation
    docs.filter(col("doc_id") > 0 && col("doc_id") < 50)
      .unionByName(Seq((91000L, scrambled), (91001L, ordered)).toDF("doc_id", "text"))
      .write.parquet(src)
    val probe = spark.read.parquet(src)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.lmNLogProb(col("text"), lmnPath).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probe(91001L) > probe(91000L),
      "the 4-gram must score ordered text above its scramble")
    val floor = (probe(91000L) + probe(91001L)) / 2
    val f = write(base.resolve("curator_lmn.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("lmncur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  lmn-path = "$lmnPath"
         |  min-lmn-logp = $floor
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val out = spark.read.parquet(base.resolve("lmncur").toString)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(91000L), "scrambled doc survived the 4-gram filter")
    assert(ids.contains(91001L), "the in-order twin must survive the same floor")
    assert(out.columns.contains("lmn_logp"))
    val bad = write(base.resolve("curator_lmn_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("lmncur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-lmn-logp = -2.5 }
         |""".stripMargin)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(err.getMessage.contains("lmn-path"))
  }

  test("curator epoch-weights: sources repeat with epoch tags that ride " +
      "chunking and join the shuffle row identity") {
    import org.apache.spark.sql.functions._
    val base = tmp()
    val src = base.resolve("epochsrc").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 40).write.parquet(src)
    val out = base.resolve("epochout").toString
    val f = write(base.resolve("epoch.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  epoch-weights { src0 = 2.0 }
         |  chunk-size = 32
         |  shuffle-salt = es
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val chunks = spark.read.parquet(out)
    assert(chunks.columns.contains("epoch"), chunks.columns.mkString(","))
    val srcOf = spark.read.parquet(src)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perChunk = chunks.groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("k"),
        collect_set("epoch").as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getSeq[Long](3).toSet))
    assert(perChunk.nonEmpty)
    perChunk.foreach { case (id, k, es) =>
      if (srcOf(id) == "src0")
        assert(k == 2 && es == Set(0L, 1L), s"doc $id: k=$k epochs=$es")
      else assert(k == 1 && es == Set(0L), s"doc $id: k=$k epochs=$es")
    }
    // the shuffle key includes the epoch: both copies emitted, distinct
    // key positions (no collapsed duplicates), shuffle_key column dropped
    // from user-facing output only if the writer drops it — here it rides
    assert(chunks.filter(col("chunk_text").isNull).count() == 0)
  }

  test("curator KN3 filter: kn3-path + min-kn3-logp drop a scrambled doc " +
      "under interpolated Kneser-Ney; floor alone rejects up front") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val lm = graft.llm.LangModel.trainKneserNey3(
      docs.filter(col("doc_id") < 100), "text")
    val kn3Path = base.resolve("ref_kn.lm3").toString
    graft.llm.LangModel.saveTrigram(lm.trigram, kn3Path)
    // ordered prefix vs its reverse: identical unigrams, trigram
    // continuations separate them; the floor sits between THEIR scores
    val sample = docs.filter(col("doc_id") === 0).head().getString(1)
      .split("\\s+").filter(_.nonEmpty).take(40)
    val ordered = sample.mkString(" ")
    val scrambled = sample.reverse.mkString(" ")
    val src = base.resolve("kn3src").toString
    docs.filter(col("doc_id") > 0 && col("doc_id") < 50)
      .unionByName(Seq((91000L, scrambled), (91001L, ordered)).toDF("doc_id", "text"))
      .write.parquet(src)
    val probe = spark.read.parquet(src)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.kn3LogProb(col("text"), kn3Path).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probe(91001L) > probe(91000L),
      "KN3 must score ordered text above its scramble")
    val floor = (probe(91000L) + probe(91001L)) / 2
    val f = write(base.resolve("curator_kn3.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("kn3cur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  kn3-path = "$kn3Path"
         |  min-kn3-logp = $floor
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val out = spark.read.parquet(base.resolve("kn3cur").toString)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(91000L), "scrambled doc survived the KN3 filter")
    assert(ids.contains(91001L), "the in-order twin must survive the same floor")
    assert(out.columns.contains("kn3_logp"))
    val bad = write(base.resolve("curator_kn3_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("kn3cur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-kn3-logp = -2.5 }
         |""".stripMargin)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(err.getMessage.contains("kn3-path"))
  }

  test("curator KN-n filter: knn-path + min-knn-logp drop a scrambled doc " +
      "under order-4 interpolated Kneser-Ney; floor alone rejects up front") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val lm = graft.llm.LangModel.trainKneserNeyN(
      docs.filter(col("doc_id") < 100), "text", order = 4)
    val knnPath = base.resolve("ref_kn.lm4").toString
    graft.llm.LangModel.saveNgram(lm.ngram, knnPath)
    val sample = docs.filter(col("doc_id") === 0).head().getString(1)
      .split("\\s+").filter(_.nonEmpty).take(40)
    val ordered = sample.mkString(" ")
    val scrambled = sample.reverse.mkString(" ")
    val src = base.resolve("knnsrc").toString
    docs.filter(col("doc_id") > 0 && col("doc_id") < 50)
      .unionByName(Seq((91000L, scrambled), (91001L, ordered)).toDF("doc_id", "text"))
      .write.parquet(src)
    val probe = spark.read.parquet(src)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.knNLogProb(col("text"), knnPath).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probe(91001L) > probe(91000L),
      "KN-4 must score ordered text above its scramble")
    val floor = (probe(91000L) + probe(91001L)) / 2
    val f = write(base.resolve("curator_knn.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("knncur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  knn-path = "$knnPath"
         |  min-knn-logp = $floor
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val out = spark.read.parquet(base.resolve("knncur").toString)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(91000L), "scrambled doc survived the KN-4 filter")
    assert(ids.contains(91001L), "the in-order twin must survive the same floor")
    assert(out.columns.contains("knn_logp"))
    // the PACKED registry path (`knn-packed = true`) judges the same
    // floor identically: exact and quantized scores agree to ~1e-5,
    // the floor sits mid-gap between the twins
    val fp = write(base.resolve("curator_knn_packed.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("knncurp")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  knn-path = "$knnPath"
         |  knn-packed = true
         |  min-knn-logp = $floor
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", fp))
    val idsP = spark.read.parquet(base.resolve("knncurp").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsP == ids, "packed and exact KN-4 registries must agree at the floor")
    val bad = write(base.resolve("curator_knn_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("knncur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-knn-logp = -2.5 }
         |""".stripMargin)
    val err2 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(err2.getMessage.contains("knn-path"))
    // knn-packed without knn-path is dead config
    val bad2 = write(base.resolve("curator_knn_bad2.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("knncur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { knn-packed = true }
         |""".stripMargin)
    val err3 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad2))
    }
    assert(err3.getMessage.contains("knn-packed"))
    // MODIFIED KN over the SAME artifact (`knn-modified = true` — the
    // smoothing is load-time derivation, not a file format): the
    // scramble still drops at a mod-score floor
    val probeM = spark.read.parquet(src)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.knModLogProb(col("text"), knnPath).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probeM(91001L) > probeM(91000L),
      "modified KN must also score ordered text above its scramble")
    val floorM = (probeM(91000L) + probeM(91001L)) / 2
    val fm = write(base.resolve("curator_mkn.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("mkncur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  knn-path = "$knnPath"
         |  knn-modified = true
         |  min-knn-logp = $floorM
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", fm))
    val idsM = spark.read.parquet(base.resolve("mkncur").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!idsM.contains(91000L) && idsM.contains(91001L),
      "modified-KN floor must drop the scramble and keep the twin")
    // knn-modified without knn-path is dead config
    val bad3 = write(base.resolve("curator_knn_bad3.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("knncur")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { knn-modified = true }
         |""".stripMargin)
    val err4 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad3))
    }
    assert(err4.getMessage.contains("knn-modified"))
  }

  test("curator learned classifier: outfilters stopword-stuffed hex gibberish " +
      "that the heuristic quality filter PASSES") {
    import org.apache.spark.sql.functions._
    val base = tmp()
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    // adversarial construction: enough stopwords for a perfect heuristic
    // stop-score, enough tokens for a perfect length score, zero
    // punctuation — qualityScore ≈ 1.0 — but long uniform hex tokens
    // and in-doc repetition, which only the LEARNED boundary penalizes
    val stops = "the of and to in is that it for a"
    def stuffed(src: org.apache.spark.sql.DataFrame) = src.withColumn("text",
      concat_ws(" ", lit(stops), md5(col("text")),
        md5(concat(col("text"), lit("a"))), lit(stops), md5(col("text")),
        md5(concat(col("text"), lit("a")))))
    // train reference-vs-random on the corpus vs the same construction
    // (disjoint doc ids from the planted cohort below)
    val clf = graft.llm.QualityClassifier.train(
      docs.filter(col("doc_id") < 200),
      stuffed(docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)),
      "text")
    val clfPath = base.resolve("quality.clf").toString
    clf.save(spark, clfPath)
    // corpus: 50 real docs + 3 planted stuffed docs (fresh ids/text)
    val planted = stuffed(
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 403)
        .withColumn("doc_id", col("doc_id") + lit(80000L)))
    val src = base.resolve("src").toString
    docs.filter(col("doc_id") < 50).unionByName(planted).write.parquet(src)
    // the planted cohort PASSES the heuristic filter it will be run under
    val hq = planted.select(min(graft.llm.TextAnalysis.qualityScoreFast(
      graft.llm.TextAnalysis.stats(col("text"))))).head().getDouble(0)
    assert(hq >= 0.9, s"planted docs must pass the heuristic, quality=$hq")
    val out = base.resolve("curated").toString
    val f = write(base.resolve("curator_clf.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.3
         |  classifier-path = "$clfPath"
         |  min-classifier-score = 0.5
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val curated = spark.read.parquet(out)
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(Set(80400L, 80401L, 80402L)).isEmpty,
      "stuffed docs survived the learned classifier filter")
    assert(ids.contains(0L), "real docs must survive")
    assert(curated.columns.contains("clf_score"))

    // min-classifier-score without classifier-path is caught up front
    val bad = write(base.resolve("curator_clf_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-classifier-score = 0.5 }
         |""".stripMargin)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(err.getMessage.contains("classifier-path"))
  }

  test("curator gopher-rules: the published rule set drops planted violators " +
      "the heuristic quality floor alone would keep") {
    val base = tmp()
    import spark.implicits._
    // 20 good docs: 6 Gopher stopwords + 48 distinct hex tokens each —
    // pass every rule, and per-doc-unique hex keeps SimHash far apart
    def hex(seed: String) =
      f"${scala.util.hashing.MurmurHash3.stringHash(seed)}%08x"
    val good = (0L until 20L).map(i => (i,
      "the of and that have with " +
        (0 until 48).map(j => hex(s"$i-$j")).mkString(" ")))
    val planted = Seq(
      (90001L, (0 until 60).map(j => s"- item ${hex(s"b$j")}").mkString("\n")),
      (90002L, "the cat sat"),
      (90003L, (0 until 54).map(j => hex(s"s$j")).mkString(" ")))
    val src = base.resolve("src").toString
    (good ++ planted).toDF("doc_id", "text").write.parquet(src)
    val out = base.resolve("curated").toString
    val f = write(base.resolve("curator_gopher.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  gopher-rules = true
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val ids = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(Set(90001L, 90002L, 90003L)).isEmpty,
      s"bullet-list / too-short / stopword-free docs must drop: $ids")
    assert((0L until 20L).forall(ids.contains),
      s"all rule-passing docs must survive: $ids")
  }

  test("curator c4-rules: line retention rewrites surviving text; page rules " +
      "drop planted brace/lorem/badword/thin pages") {
    val base = tmp()
    import spark.implicits._
    def hex(seed: String) =
      f"${scala.util.hashing.MurmurHash3.stringHash(seed)}%08x"
    // 10 good pages: five sentences of per-doc-unique hex prose (keeps
    // SimHash far apart) + a junk trailer line C4 must strip
    def prose(i: Long) = (0 until 5).map(j =>
      s"${hex(s"$i-$j-a")} ${hex(s"$i-$j-b")} ${hex(s"$i-$j-c")} " +
        s"${hex(s"$i-$j-d")} stands firmly.").mkString(" ")
    val good = (0L until 10L).map(i =>
      (i, prose(i) + "\ntrailing junk without punctuation"))
    val planted = Seq(
      (90001L, prose(101L) + "\ncode block { x } inside."),
      (90002L, prose(102L) + "\nmore lorem ipsum filler text."),
      (90003L, prose(103L) + "\nwell shit happens sometimes."),
      (90004L, s"Only one sentence of ${hex("thin")} prose here."))
    val src = base.resolve("c4src").toString
    (good ++ planted).toDF("doc_id", "text").write.parquet(src)
    val out = base.resolve("c4out").toString
    val f = write(base.resolve("curator_c4.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  c4-rules = true
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val rows = spark.read.parquet(out).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet == (0L until 10L).toSet,
      s"brace/lorem/badword/thin pages must drop, good pages survive: ${rows.keySet}")
    (0L until 10L).foreach(i => assert(rows(i) == prose(i),
      s"doc $i text must be rewritten to the retained lines"))
  }

  test("curator normalize-text: mojibake repaired before hashing, so a later " +
      "batch arriving in canonical form dedups against the repaired state") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    import spark.implicits._
    def hex(seed: String) =
      f"${scala.util.hashing.MurmurHash3.stringHash(seed)}%08x"
    def prose(i: Long) = (0 until 40).map(j => hex(s"$i-$j")).mkString(" ")
    // batch 1 carries doc 5 in MOJIBAKE form; batch 2 carries the SAME
    // doc in clean canonical form plus one genuinely new doc
    val dirty = "caf\u00c3\u00a9 \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d " + prose(5L)
    val clean = "caf\u00e9 \u201cquoted\u201d " + prose(5L)
    val b1 = base.resolve("nb1").toString
    val b2 = base.resolve("nb2").toString
    ((0L until 5L).map(i => (i, prose(i))) :+ (5L, dirty)).toDF("doc_id", "text")
      .write.parquet(b1)
    Seq((105L, clean), (106L, prose(106L))).toDF("doc_id", "text").write.parquet(b2)
    def conf(run: Int, src: String, stateIn: Option[String]) =
      write(base.resolve(s"norm$run.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"nout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"nstate$run")}
           |  min-quality = 0.0
           |  normalize-text = true
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, b1, None)))
    val out1 = spark.read.parquet(base.resolve("nout1").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out1(5L) == clean, "emitted text must be the repaired form")
    graft.cli.Curator.main(Array("--conf",
      conf(2, b2, Some(base.resolve("nstate1").toString))))
    val ids2 = spark.read.parquet(base.resolve("nout2").toString)
      .select("doc_id").as[Long].collect().toSet
    assert(ids2 == Set(106L),
      s"the canonical-form echo of the mojibake doc must dedup against " +
        s"state hashed over NORMALIZED text: $ids2")
  }

  test("curator strip-html + max-pii-hits: markup extracted before any text " +
      "stage; PII-dense directory pages dropped, light PII scrubbed") {
    import spark.implicits._
    val base = tmp()
    // letters-only filler: digit runs would trip the phone/IP rules
    // and make the PII count depend on hash luck
    def word(seed: String) =
      f"${scala.util.hashing.MurmurHash3.stringHash(seed)}%08x"
        .map(c => if (c.isDigit) ('g' + (c - '0')).toChar else c)
    def prose(i: Long) = (0 until 30).map(j => word(s"h$i-$j")).mkString(" ")
    val docs = Seq(
      // HTML page: markup must be gone from the output text
      (1L, s"<html><body><p>${prose(1L)}</p><script>var x=1;</script></body></html>"),
      // light PII (1 email): survives the gate, gets scrubbed
      (2L, s"${prose(2L)} contact bob@example.com thanks"),
      // PII-dense directory page (6 emails): dropped by the gate
      (3L, (0 until 6).map(k => s"user$k@example.com").mkString(" ") + " " + prose(3L)))
      .toDF("doc_id", "text")
    val src = base.resolve("hsrc").toString
    docs.write.parquet(src)
    val out = base.resolve("hout").toString
    val f = write(base.resolve("curator_html.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  strip-html = true
         |  max-pii-hits = 3
         |  redact = true
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val rows = spark.read.parquet(out).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(1L, 2L), s"directory page must drop: ${rows.keySet}")
    assert(rows(1L) == prose(1L), s"markup must be extracted: '${rows(1L).take(60)}'")
    assert(rows(2L).contains("<EMAIL>") && !rows(2L).contains("bob@"),
      "light PII scrubbed after the density gate")
  }

  test("curator strip-markdown: markup stripped at ingest (after strip-html — " +
      "an HTML-rendered markdown doc sheds both layers), code kept verbatim") {
    import spark.implicits._
    val base = tmp()
    val docs = Seq(
      (1L, "# Readme\n**install** with [pip](https://x)\n```\npip install x\n```"),
      // both layers: html wrapping markdown
      (2L, "<html><body><p># Title and **bold** words here</p></body></html>"),
      (3L, "plain prose document with no markup at all"))
      .toDF("doc_id", "text")
    val src = base.resolve("mdsrc").toString
    docs.write.parquet(src)
    val out = base.resolve("mdout").toString
    val f = write(base.resolve("curator_md.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  strip-html = true
         |  strip-markdown = true
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val rows = spark.read.parquet(out).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(rows(1L) == "Readme\ninstall with pip\npip install x",
      s"markdown must strip with code kept: '${rows(1L)}'")
    assert(rows(2L).contains("Title and bold words here") &&
      !rows(2L).contains("**") && !rows(2L).contains("#"),
      s"both layers must shed: '${rows(2L)}'")
    assert(rows(3L) == "plain prose document with no markup at all")
  }

  test("curator web-ingest chain: strip-html + normalize-text + c4 + gopher " +
      "+ budget compose in one config, each stage catching its own class") {
    import org.apache.spark.sql.functions.{col, sum}
    import spark.implicits._
    val base = tmp()
    // C4/Gopher-passing prose: stopworded sentences, terminal punct
    def prose(i: Long) = (0 until 8).map(j =>
      s"the data value v$i$j holds with care and that is good to have.").mkString(" ")
    val docs = Seq(
      // 1: healthy page wrapped in markup + mojibake — must survive,
      // fully cleaned
      (1L, s"<html><body><p>${prose(1L)} caf\u00c3\u00a9 bonus.</p>" +
        "<script>var x=1;</script></body></html>"),
      // 2: page whose text is one long unterminated line — C4 drops it
      (2L, prose(2L).replace(".", "")),
      // 3: bullet-list page — Gopher drops it
      (3L, (0 until 60).map(j => s"- item v3$j the of and that with have").mkString("\n")),
      // 4: healthy page in a zero-budget source
      (4L, prose(4L)))
      .toDF("doc_id", "text")
      .withColumn("source",
        org.apache.spark.sql.functions.when(col("doc_id") === 4L, "blocked")
          .otherwise("web"))
    val src = base.resolve("wsrc").toString
    docs.write.parquet(src)
    val out = base.resolve("wout").toString
    val f = write(base.resolve("curator_web.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  strip-html = true
         |  normalize-text = true
         |  c4-rules = true
         |  gopher-rules = true
         |  token-budgets { blocked = 0 }
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val rows = spark.read.parquet(out).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(1L),
      s"unterminated/bullet/zero-budget pages must drop: ${rows.keySet}")
    val t = rows(1L)
    assert(!t.contains("<") && !t.contains("var x"), "markup extracted")
    assert(t.contains("caf\u00e9") && !t.contains("caf\u00c3"),
      "mojibake repaired before hashing")
    assert(t.endsWith("caf\u00e9 bonus."), s"retained lines rejoined: '${t.takeRight(40)}'")
  }

  test("curator config-loadable lists: custom mojibake/entity/badword files " +
      "change the outcome; a loaded rewrite list fingerprints into state and " +
      "drift is rejected") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = tmp()
    def prose(i: Long) = (0 until 8).map(j =>
      s"the data value v$i$j holds with care and that is good to have.").mkString(" ")
    // &copy;/&eacute; are OUTSIDE the old 7-entity core list (the r10
    // defaults decode the full WHATWG table); Ã¿/Ã± are OUTSIDE the
    // core repair list (the r10 default repairs algorithmically);
    // 'gubbins' is outside the shipped badword stand-in. The custom
    // lists below cover only &copy;/&nbsp; and Ã¿ — so under them
    // &eacute; and Ã± must SURVIVE RAW, proving the override actually
    // switches decode/repair to the listed chain
    val docs = Seq(
      (1L, s"<p>${prose(1L)} marker &copy; caf&eacute; sign Ã¿ and Ã± here.</p>"),
      (2L, s"${prose(2L)} gubbins appears here."))
      .toDF("doc_id", "text")
    val src = base.resolve("lsrc").toString
    docs.write.parquet(src)
    val entityList = base.resolve("entities.tsv")
    write(entityList, "# extra entities\n&copy;\t©\n&nbsp;\t \n")
    val mojiList = base.resolve("mojibake.tsv")
    write(mojiList, "Ã¿\tÿ\n")
    val badList = base.resolve("badwords.txt")
    write(badList, "# custom\ngubbins\n")
    def conf(run: Int, extra: String, stateIn: Option[String] = None) =
      write(base.resolve(s"lists$run.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"lout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"lstate$run")}
           |  min-quality = 0.0
           |  strip-html = true
           |  normalize-text = true
           |  c4-rules = true
           |$extra
           |}
           |""".stripMargin)
    // run 1: shipped defaults (full WHATWG decode + algorithmic
    // repair since r10) — everything decodes/repairs, 'gubbins' not a
    // bad word → both docs survive with clean text
    graft.cli.Curator.main(Array("--conf", conf(1, "")))
    val out1 = spark.read.parquet(base.resolve("lout1").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out1.keySet == Set(1L, 2L))
    assert(out1(1L).contains("©") && !out1(1L).contains("&copy;"),
      s"default full-table decode: '${out1(1L).takeRight(60)}'")
    assert(out1(1L).contains("café") && !out1(1L).contains("&eacute;"))
    assert(out1(1L).contains("ÿ") && !out1(1L).contains("Ã¿"),
      "default algorithmic repair")
    assert(out1(1L).contains("ñ") && !out1(1L).contains("Ã±"))
    // run 2: custom lists RESTRICT decode/repair to the listed pairs —
    // listed forms transform, unlisted ones survive raw, and the
    // custom bad word drops doc 2
    graft.cli.Curator.main(Array("--conf", conf(2,
      s"""  entity-list-path = "$entityList"
         |  mojibake-list-path = "$mojiList"
         |  badword-list-path = "$badList"""".stripMargin)))
    val out2 = spark.read.parquet(base.resolve("lout2").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out2.keySet == Set(1L), s"custom bad word must drop doc 2: ${out2.keySet}")
    assert(out2(1L).contains("©") && !out2(1L).contains("&copy;"),
      s"listed entity must decode: '${out2(1L).takeRight(60)}'")
    assert(out2(1L).contains("&eacute;"),
      "an entity OUTSIDE the custom list must survive raw under the override")
    assert(out2(1L).contains("ÿ") && !out2(1L).contains("Ã¿"),
      "listed mojibake pair must repair")
    assert(out2(1L).contains("Ã±"),
      "a rendering OUTSIDE the custom repair list must survive raw under the override")
    // run 3: continuing run 2's state lineage with the DEFAULT lists is
    // a canonical-bytes drift — rejected via the commit fingerprint
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(3, "", Some(base.resolve("lstate2").toString))))
    }
    assert(e.getMessage.contains("parameters"), e.getMessage)
    // run 4: same custom lists against the same state → accepted
    graft.cli.Curator.main(Array("--conf", conf(4,
      s"""  entity-list-path = "$entityList"
         |  mojibake-list-path = "$mojiList"
         |  badword-list-path = "$badList"""".stripMargin,
      Some(base.resolve("lstate2").toString))))
    // a list path without its stage on is dead config — rejected
    val bad = write(base.resolve("lists_dead.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve("ldead")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { badword-list-path = "$badList" }
         |""".stripMargin)
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(e2.getMessage.contains("c4-rules"), e2.getMessage)
  }

  test("curator domain gate: blocklisted domains (and their subdomains) drop " +
      "BEFORE any text stage — dedup state covers admitted docs only") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 40)
      .withColumn("url",
        when(col("doc_id") % 10 === 0, concat(lit("https://ads.badsite.com/p/"), col("doc_id")))
          .when(col("doc_id") % 10 === 1, concat(lit("http://tracker.net/x"), col("doc_id")))
          .otherwise(concat(lit("https://www.goodnews.org/a/"), col("doc_id"))))
    val src = base.resolve("dsrc").toString
    docs.write.parquet(src)
    val bl = base.resolve("blocklist.txt")
    write(bl, "# test list\nbadsite.com\ntracker.net\n")
    val out = base.resolve("dout").toString
    val f = write(base.resolve("curator_dom.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  domain-column = url
         |  blocklist-path = "$bl"
         |  state-out-dir = ${base.resolve("dstate")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty && ids.forall(i => i % 10 >= 2),
      s"blocked-domain docs must not survive: ${ids.filter(i => i % 10 < 2)}")
    // the gate ran before state: hashes cover ONLY admitted docs
    val nState = spark.read.parquet(base.resolve("dstate").resolve("hashes").toString).count()
    assert(nState == ids.size,
      s"state must hash admitted docs only: $nState hashes vs ${ids.size} docs")
    // blocked-tlds without domain-column is rejected up front
    val bad = write(base.resolve("curator_dom_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation { blocked-tlds = [xxx] }
         |""".stripMargin)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(err.getMessage.contains("domain-column"))
  }

  test("curator bag-of-words classifier: outfilters planted reversed-text docs " +
      "by word identity; floor without model path rejected up front") {
    import org.apache.spark.sql.functions._
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    // reversed text: shape features (length/punct/repetition) can't see
    // it, word identity can — the BOW model's distinctive value; the
    // pseudo-vocabulary is stable, so the model generalizes to planted
    // docs it never trained on
    def reversed(src: org.apache.spark.sql.DataFrame) =
      src.withColumn("text", reverse(col("text")))
    val model = graft.llm.QualityClassifier.trainBow(
      docs.filter(col("doc_id") < 200),
      reversed(docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)),
      "text", numFeatures = 1 << 16)
    val modelPath = base.resolve("bow_clf").toString
    graft.llm.QualityClassifier.saveBow(model, modelPath)
    val planted = reversed(
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 403)
        .withColumn("doc_id", col("doc_id") + lit(90000L)))
    val src = base.resolve("bsrc").toString
    docs.filter(col("doc_id") < 50).unionByName(planted).write.parquet(src)
    val out = base.resolve("bcurated").toString
    val f = write(base.resolve("curator_bow.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  bow-classifier-path = "$modelPath"
         |  min-bow-score = 0.5
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val curated = spark.read.parquet(out)
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(Set(90400L, 90401L, 90402L)).isEmpty,
      "planted gibberish survived the BOW classifier filter")
    assert(ids.contains(0L), "real docs must survive")
    assert(curated.columns.contains("bow_score"))
    val bad = write(base.resolve("curator_bow_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation { min-bow-score = 0.5 }
         |""".stripMargin)
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }
    assert(err.getMessage.contains("bow-classifier-path"))
    // a Platt sidecar in the artifact flows through the same knob: the
    // emitted bow_score becomes the calibrated probability (monotone, so
    // the same docs drop at the same floor, and the score provably went
    // through the transform)
    val cal = graft.llm.QualityClassifier.calibrateBow(model,
      docs.filter(col("doc_id") >= 403 && col("doc_id") < 450),
      reversed(docs.filter(col("doc_id") >= 450 && col("doc_id") < 500)),
      "text")
    val calPath = base.resolve("bow_clf_cal").toString
    graft.llm.QualityClassifier.saveBow(model, calPath, Some(cal))
    val outC = base.resolve("bcurated_cal").toString
    val fc = write(base.resolve("curator_bow_cal.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = $outC, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  bow-classifier-path = "$calPath"
         |  min-bow-score = 0.5
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", fc))
    val curatedCal = spark.read.parquet(outC)
    assert(curatedCal.select("doc_id").collect().map(_.getLong(0)).toSet == ids,
      "calibration is monotone — the same docs survive the same floor")
    // scores differ from the raw run on every surviving doc (the
    // sidecar was actually applied, not silently ignored)
    val rawScores = curated.select(col("doc_id"), col("bow_score").as("raw"))
    val diffCount = curatedCal.select(col("doc_id"), col("bow_score").as("cal"))
      .join(rawScores, "doc_id")
      .filter(col("cal") === col("raw")).count()
    assert(diffCount == 0,
      "calibrated run must emit transformed scores, not the raw sigmoid")
  }

  test("curator boilerplate stage: shared lines stripped BEFORE dedup state, " +
      "all-boilerplate docs dropped, state matches cleaned re-runs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = tmp()
    val in = base.resolve("bin").toString
    // 12 docs share a header+footer (df 12 ≥ 10); bodies are distinct
    // multi-token lines; doc 99 is NOTHING BUT boilerplate
    val docs = ((0 until 12).map { i =>
      (i.toLong, s"graft shared header\nunique body $i alpha beta gamma delta\ngraft shared footer")
    } :+ (99L, "graft shared header\ngraft shared footer")).toDF("doc_id", "text")
    docs.write.parquet(in)
    def conf(run: Int, stateIn: Option[String]) = write(base.resolve(s"bp$run.conf"),
      s"""source { storage-type = local, dataset-dir = $in }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"bout$run")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  boilerplate-min-doc-freq = 10
         |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
         |  state-out-dir = ${base.resolve(s"bstate$run")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, None)))
    val out1 = spark.read.parquet(base.resolve("bout1").toString)
    val texts = out1.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(texts.keySet == (0 until 12).map(_.toLong).toSet,
      s"12 body docs survive, all-boilerplate doc 99 is dropped: ${texts.keySet}")
    (0 until 12).foreach(i => assert(
      texts(i.toLong) == s"unique body $i alpha beta gamma delta", s"doc $i: ${texts(i.toLong)}"))
    // the dedup state was hashed over the CLEANED text: re-running the
    // same RAW batch (boilerplate re-stripped to identical bodies)
    // against it keeps nothing — the design reason the stage runs first
    graft.cli.Curator.main(Array("--conf", conf(2, Some(base.resolve("bstate1").toString))))
    assert(spark.read.parquet(base.resolve("bout2").toString).count() == 0,
      "re-run of the same raw batch against state must converge to zero")
  }

  test("curator boilerplate accumulates evidence across batches: a header below " +
      "the threshold in EVERY batch is stripped once the corpus has seen enough") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = tmp()
    val header = "graft cross batch header"
    def mk(ids: Range, tag: String) = ids.map { i =>
      (i.toLong, s"$header\n$tag body $i alpha beta gamma delta epsilon")
    }.toDF("doc_id", "text")
    val inA = base.resolve("xa").toString
    val inB = base.resolve("xb").toString
    mk(0 until 6, "first").write.parquet(inA)
    mk(100 until 106, "second wholly different content").write.parquet(inB)
    def conf(run: Int, in: String, stateIn: Option[String]) =
      write(base.resolve(s"xb$run.conf"),
        s"""source { storage-type = local, dataset-dir = $in }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"xout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |  boilerplate-min-doc-freq = 10
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"xstate$run")}
           |}
           |""".stripMargin)
    // run 1: the header appears in 6 docs — below min-doc-freq=10, so
    // per-batch evidence keeps it; the evidence table commits with state
    graft.cli.Curator.main(Array("--conf", conf(1, inA, None)))
    val out1 = spark.read.parquet(base.resolve("xout1").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out1.size == 6 && out1.values.forall(_.startsWith(header)),
      s"run 1 must keep the under-threshold header: $out1")
    assert(new java.io.File(
      base.resolve("xstate1").resolve("linefreqs").toString).exists(),
      "line-frequency evidence must ride the committed state")
    // run 2: a DIFFERENT batch where the header again appears only 6
    // times — per-batch evidence would keep it again, but accumulated
    // evidence (6 + 6 = 12 ≥ 10) strips it
    graft.cli.Curator.main(Array("--conf",
      conf(2, inB, Some(base.resolve("xstate1").toString))))
    val out2 = spark.read.parquet(base.resolve("xout2").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out2.nonEmpty, "batch 2's distinct bodies must survive dedup")
    assert(out2.values.forall(!_.contains(header)),
      s"accumulated evidence must strip the cross-batch header: $out2")
    // the accumulated table records the full cross-batch count
    val acc = spark.read.parquet(base.resolve("xstate2").resolve("linefreqs").toString)
      .filter(col("__line") === header).head().getLong(1)
    assert(acc == 12L, s"accumulated header doc-frequency must be 12, got $acc")
  }

  test("curator span-dedup stage: duplicated passage survives only at its first " +
      "occurrence, fully-duplicated docs drop, state hashes the cut text") {
    import spark.implicits._
    val base = tmp()
    val in = base.resolve("sin").toString
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // docs 0..9 all end with the same 12-token passage; doc 50 is ONLY
    // the passage; doc 100 shares nothing
    val docs = ((0 until 10).map { i =>
      (i.toLong, s"own body $i one two three four five six $passage")
    } ++ Seq((50L, passage), (100L, "completely unrelated body text here okay")))
      .toDF("doc_id", "text")
    docs.write.parquet(in)
    val f = write(base.resolve("span.conf"),
      s"""source { storage-type = local, dataset-dir = $in }
         |target { storage-type = local, dataset-dir = ${base.resolve("sout")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  span-dedup-tokens = 10
         |  state-out-dir = ${base.resolve("sstate")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val out = spark.read.parquet(base.resolve("sout").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // doc 0 holds the globally-first occurrence and keeps it verbatim
    assert(out(0L).endsWith(passage), s"doc 0 must keep the passage: ${out(0L)}")
    (1 until 10).foreach { i =>
      assert(!out(i.toLong).contains("alpha beta"), s"doc $i still has the passage")
      assert(out(i.toLong).contains(s"own body $i"), s"doc $i lost its own text")
    }
    assert(!out.contains(50L), "the all-passage doc must be dropped")
    assert(out(100L) == "completely unrelated body text here okay")
    // the dedup state hashed the POST-cut text (the ordering argument):
    // state row count covers exactly the emitted docs
    assert(spark.read.parquet(base.resolve("sstate").resolve("hashes").toString)
      .count() == out.size)
  }

  test("curator span-dedup accumulates evidence across batches: a passage " +
      "duplicated only ACROSS batches is cut in batch 2; parameters are pinned") {
    import spark.implicits._
    val base = tmp()
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val inA = base.resolve("spa").toString
    val inB = base.resolve("spb").toString
    // batch 1: the passage appears ONCE (kept — it is the corpus's
    // first copy); batch 2: the passage again appears ONCE, in a doc
    // that shares nothing else with batch 1
    (Seq((1L, s"first batch owner doc carries the quoted text $passage"),
      (2L, "plain first batch document nothing shared at all")): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inA)
    (Seq((200L, "second batch quoting entity reuses verbatim material " +
        s"$passage trailing words continue afterwards"),
      (201L, "another clean second batch document full of fresh words")): Seq[(Long, String)])
      .toDF("doc_id", "text").write.parquet(inB)
    def conf(run: Int, in: String, stateIn: Option[String], spanTokens: Int) =
      write(base.resolve(s"sp$run.conf"),
        s"""source { storage-type = local, dataset-dir = $in }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"spout$run")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |  span-dedup-tokens = $spanTokens
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"spstate$run")}
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, inA, None, 10)))
    val out1 = spark.read.parquet(base.resolve("spout1").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out1(1L).endsWith(passage), "batch 1's single copy must be kept verbatim")
    val st1 = base.resolve("spstate1")
    assert(new java.io.File(st1.resolve("spans").toString).exists(), "span table must commit")
    assert(new java.io.File(st1.resolve("spanbloom").toString).exists(), "bloom must commit")
    assert(new java.io.File(st1.resolve("spanparams").toString).exists(), "params must commit")
    // batch 2 vs state: the passage occurs once IN THE BATCH — per-batch
    // span dedup keeps it; accumulated evidence cuts it
    graft.cli.Curator.main(Array("--conf", conf(2, inB, Some(st1.toString), 10)))
    val out2 = spark.read.parquet(base.resolve("spout2").toString)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(!out2(200L).contains("alpha beta"),
      s"cross-batch duplicated passage must be cut: ${out2(200L)}")
    assert(out2(200L).contains("second batch quoting entity") &&
      out2(200L).contains("trailing words continue afterwards"),
      s"doc 200 must keep its own text: ${out2(200L)}")
    assert(out2(201L) == "another clean second batch document full of fresh words")
    // the accumulated table is a superset of batch 1's
    val st2 = base.resolve("spstate2")
    assert(spark.read.parquet(st2.resolve("spans").toString).count() >
      spark.read.parquet(st1.resolve("spans").toString).count() / 2,
      "batch 2's state must accumulate, not replace")
    // parameter drift is rejected: same state, different span width
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", conf(3, inB, Some(st2.toString), 12)))
    }
    assert(e.getMessage.contains("span"), e.getMessage)
    // stage toggled OFF for one batch: evidence carries forward unchanged
    val f4 = write(base.resolve("sp4.conf"),
      s"""source { storage-type = local, dataset-dir = $inB }
         |target { storage-type = local, dataset-dir = ${base.resolve("spout4")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  state-dir = $st2
         |  state-out-dir = ${base.resolve("spstate4")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f4))
    assert(spark.read.parquet(base.resolve("spstate4").resolve("spans").toString).count() ==
      spark.read.parquet(st2.resolve("spans").toString).count(),
      "span evidence must carry forward when the stage is off")
  }

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

  test("streamer near-dedup-cluster with embedding-column: vector tiers ride " +
      "the same per-batch commit and accrete vecsigs state") {
    import spark.implicits._
    val base = tmp()
    // distinct texts (no text-tier collisions) whose VECTORS collide:
    // 101/102 share a vector in batch 1 (in-batch vector tier,
    // cosine-verified keep-lower-id); batch 2 re-sends the same vector
    // under a new text (vs-corpus signature tier over accreted vecsigs)
    val vA = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val vB = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val vC = Seq(0.0f, 0.0f, 1.0f, 0.0f)
    val landing = base.resolve("vlanding").toString
    def land(rows: Seq[(Long, String, Seq[Float])]): Unit =
      rows.toDF("doc_id", "text", "embedding")
        .write.mode("append").parquet(landing)
    land(Seq(
      (101L, "first document about estuarine sediment transport", vA),
      (102L, "second and textually unrelated note on glass frit", vA),
      (103L, "third piece concerning migratory shorebird counts", vB)))
    val out = base.resolve("vclustered").toString
    val clusterState = base.resolve("vcluster_state").toString
    val conf = write(base.resolve("vndc.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("vndcckpt")}
         |  operation = near-dedup-cluster
         |  cluster-state-dir = $clusterState
         |  embedding-column = embedding
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)
    graft.cli.Streamer.main(Array("--conf", conf))
    val batch0 = spark.read.parquet(s"$out/batch-0")
      .select("doc_id").as[Long].collect().toSet
    assert(batch0 == Set(101L, 103L),
      s"the in-batch vector twin must collapse to the lower id: $batch0")
    land(Seq(
      (201L, "entirely new words yet the same embedding as before", vA),
      (202L, "genuinely novel vector and novel text about karst", vC)))
    graft.cli.Streamer.main(Array("--conf", conf))
    val batch1 = spark.read.parquet(s"$out/batch-1")
      .select("doc_id").as[Long].collect().toSet
    assert(batch1 == Set(202L),
      s"the vector echo of an accreted survivor must drop vs-corpus: $batch1")
    // the commit carries the vector lineage: vecsigs manifest + marker
    // params (embedding/srp-seed/srp-bands — the Curator contract)
    assert(Cli.readStateTable(spark, clusterState, "vecsigs").count() == 3,
      "vecsigs must cover the 3 vector-distinct survivors")
    val marker = scala.io.Source.fromFile(
      new java.io.File(clusterState, "_COMMITTED")).mkString
    assert(marker.contains("embedding=embedding") && marker.contains("srp-seed="),
      marker)
    // a vector-seeded lineage refuses to continue without its tier
    val noVec = intercept[IllegalArgumentException] {
      graft.cli.Streamer.main(Array("--conf", write(base.resolve("vndc_novec.conf"),
        s"""streaming {
           |  events-dir = $landing
           |  target-dir = ${base.resolve("vout2")}
           |  checkpoint-location = ${base.resolve("vckpt2")}
           |  operation = near-dedup-cluster
           |  state-dir = $clusterState
           |  cluster-state-dir = ${base.resolve("vcluster2")}
           |}
           |""".stripMargin)))
    }
    assert(noVec.getMessage.contains("vector-seeded"), noVec.getMessage)
  }

  test("streamer media-near-dedup drops a re-encoded corpus image at the door " +
      "against MediaDedup state; modality drift rejected") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import graft.llm.Multimodal
    import spark.implicits._
    val base = tmp()
    // 1. a MediaDedup run commits image fingerprint state
    val corpusDir = base.resolve("media_corpus").toString
    Multimodal.reencodeAsSmoothImage(
      Multimodal.asMediaTable(
        spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 10),
        "doc_id", "text", "image", Map.empty), jpeg = false)
      .write.parquet(corpusDir)
    val stateDir = base.resolve("media_state").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("md_seed.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $corpusDir }
         |  target { storage-type = local, dataset-dir = ${base.resolve("md_out")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  mode = filter
         |  state-out-dir = $stateDir
         |}
         |""".stripMargin)))
    // 2. landing dir: a JPEG re-encode of corpus plate 3 (near, must
    //    drop) + a fresh plate
    val landing = base.resolve("media_landing").toString
    Seq(
      (900001L, Multimodal.Avi.encodeJpegFrame(Multimodal.smoothImage(3L)), 1L),
      (900002L, Multimodal.encodePng(Multimodal.smoothImage(77L)), 2L)
    ).toDF("asset_id", "content", "ts")
      .withColumn("ts", timestamp_micros(col("ts") * 3600L * 1000000L))
      .write.parquet(landing)
    val out = base.resolve("media_survivors").toString
    graft.cli.Streamer.main(Array("--conf", write(base.resolve("mnd.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("mndckpt")}
         |  operation = media-near-dedup
         |  state-dir = $stateDir
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)))
    val ids = spark.read.parquet(out).select("asset_id").as[Long].collect().toSet
    assert(ids == Set(900002L), s"re-encoded corpus image must drop at the door: $ids")
    // modality drift (explicit audio vs image state) is rejected
    intercept[IllegalArgumentException] {
      graft.cli.Streamer.main(Array("--conf", write(base.resolve("mnd_bad.conf"),
        s"""streaming {
           |  events-dir = $landing
           |  target-dir = ${base.resolve("outC")}
           |  checkpoint-location = ${base.resolve("ckptC")}
           |  operation = media-near-dedup
           |  modality = audio
           |  state-dir = $stateDir
           |}
           |""".stripMargin)))
    }
  }

  test("streamer media-near-dedup VIDEO: a re-encoded corpus clip drops at " +
      "the door via the first-k-frames array; fresh clips land") {
    import org.apache.spark.sql.functions.{col, timestamp_micros, when}
    import graft.llm.Multimodal
    import spark.implicits._
    val base = tmp()
    // 1. a video MediaDedup run commits per-frame fingerprint state
    val corpusDir = base.resolve("vid_corpus").toString
    Multimodal.reencodeAsSmoothAvi(
      Multimodal.asMediaTable(
        spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 8),
        "doc_id", "text", "video", Map.empty), nFrames = 4, mjpeg = false)
      .write.parquet(corpusDir)
    val stateDir = base.resolve("vid_state").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("vmd_seed.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $corpusDir }
         |  target { storage-type = local, dataset-dir = ${base.resolve("vmd_out")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = video
         |  mode = filter
         |  state-out-dir = $stateDir
         |}
         |""".stripMargin)))
    // 2. landing dir: an MJPEG re-encode of corpus clip 3 + a fresh clip
    val landing = base.resolve("vid_landing").toString
    Multimodal.reencodeAsSmoothAvi(
      Multimodal.asMediaTable(
        Seq((900001L, "x"), (900002L, "x")).toDF("asset_id", "payload"),
        "asset_id", "payload", "video", Map.empty)
        .withColumn("seed", when(col("asset_id") === 900001L, 3L).otherwise(77L)),
      nFrames = 4, mjpeg = true, seedCol = "seed")
      .drop("seed")
      .withColumn("ts", timestamp_micros(col("asset_id") % 100 * 3600L * 1000000L))
      .write.parquet(landing)
    val out = base.resolve("vid_survivors").toString
    graft.cli.Streamer.main(Array("--conf", write(base.resolve("vmnd.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("vmndckpt")}
         |  operation = media-near-dedup
         |  state-dir = $stateDir
         |  first-k-frames = 3
         |  min-frames = 2
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)))
    val ids = spark.read.parquet(out).select("asset_id").as[Long].collect().toSet
    assert(ids == Set(900002L),
      s"the re-encoded corpus clip must drop at the door: $ids")
  }

  test("curator dedup-lines: first-occurrence-wins line dedup with " +
      "accumulated cross-batch state; exemption-parameter drift rejected; " +
      "stage-off batches carry the evidence forward") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val nl = "\n"
    val promo = "this exact promotional line repeats across many documents"
    // batch 1: the promo line on docs 1 AND 2 (first-wins in-batch),
    // unique long bodies, a short line everywhere
    val src1 = base.resolve("lsrc1").toString
    Seq(
      (1L, Seq(promo, "-", "unique body of document one with plenty of words").mkString(nl)),
      (2L, Seq("unique body of document two with plenty of words", "-", promo).mkString(nl)),
      (3L, Seq("unique body of document three with plenty of words").mkString(nl))
    ).toDF("doc_id", "text").write.parquet(src1)
    def conf(n: Int, src: String, stateIn: Option[String], extra: String = "") =
      write(base.resolve(s"ldcur$n.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"ldout$n")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |  dedup-lines = true
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"ldstate$n")}
           |$extra
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, src1, None)))
    val out1 = spark.read.parquet(base.resolve("ldout1").toString)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out1(1L).contains(promo), "doc 1 holds the first copy")
    assert(!out1(2L).contains(promo), "doc 2's later copy must be cut")
    assert(out1(2L).split(nl).toSeq ==
      Seq("unique body of document two with plenty of words", "-"),
      "order + exempt short line preserved")
    assert(new java.io.File(base.resolve("ldstate1").resolve("lines").toString).exists())
    // batch 2 against state: the promo line's first copy lives in
    // batch 1 -> cut at arrival even at its batch-first occurrence;
    // a NEW repeated line still dedups first-wins within the batch
    val fresh = "a brand new line arriving for the first time in batch two"
    val src2 = base.resolve("lsrc2").toString
    Seq(
      (100L, Seq(promo, fresh, "unique body of document one hundred").mkString(nl)),
      (101L, Seq(fresh, "unique body of document one hundred one").mkString(nl))
    ).toDF("doc_id", "text").write.parquet(src2)
    graft.cli.Curator.main(Array("--conf",
      conf(2, src2, Some(base.resolve("ldstate1").toString))))
    val out2 = spark.read.parquet(base.resolve("ldout2").toString)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(!out2(100L).contains(promo), "prior-corpus line must be cut at arrival")
    assert(out2(100L).contains(fresh), "doc 100 holds the batch-first copy")
    assert(!out2(101L).contains(fresh), "doc 101's later copy must be cut")
    // exemption-threshold drift against committed state is rejected
    val err = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(3, src2, Some(base.resolve("ldstate2").toString),
          extra = "  dedup-lines-min-len = 20")))
    }
    assert(err.getMessage.contains("dedup-lines-min-len"), err.getMessage)
    // a stage-off batch carries the lines state forward unchanged
    val offConf = write(base.resolve("ldoff.conf"),
      s"""source { storage-type = local, dataset-dir = $src2 }
         |target { storage-type = local, dataset-dir = ${base.resolve("ldoutOff")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  state-dir = ${base.resolve("ldstate2")}
         |  state-out-dir = ${base.resolve("ldstateOff")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", offConf))
    assert(spark.read.parquet(base.resolve("ldstateOff").resolve("lines").toString).count() ==
      spark.read.parquet(base.resolve("ldstate2").resolve("lines").toString).count(),
      "toggling the stage off must not discard accumulated line state")
    // min-len without the stage is dead config
    val bad = write(base.resolve("ldbad.conf"),
      s"""source { storage-type = local, dataset-dir = $src1 }
         |target { storage-type = local, dataset-dir = ${base.resolve("ldoutB")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { dedup-lines-min-len = 20 }
         |""".stripMargin)
    assert(intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", bad))
    }.getMessage.contains("dedup-lines"))
  }

  test("curator dedup-urls: canonical-URL first-seen-wins dedup with " +
      "accumulated cross-batch state; null urls pass; dead config rejected") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    // batch 1: three spellings of ONE page + a distinct page + no-url
    val src1 = base.resolve("usrc1").toString
    Seq(
      (1L, "HTTPS://WWW.Example.COM/a?utm_source=x", "body one"),
      (2L, "https://example.com/a/", "body two"),
      (3L, "https://example.com/a#frag", "body three"),
      (4L, "https://example.com/b", "body four"),
      (5L, null: String, "body five")
    ).toDF("doc_id", "url", "text").write.parquet(src1)
    def conf(n: Int, src: String, stateIn: Option[String], extra: String = "") =
      write(base.resolve(s"ud$n.conf"),
        s"""source { storage-type = local, dataset-dir = $src }
           |target { storage-type = local, dataset-dir = ${base.resolve(s"udout$n")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  min-quality = 0.0
           |  dedup-urls = true
           |  url-column = url
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = ${base.resolve(s"udstate$n")}
           |$extra
           |}
           |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(1, src1, None)))
    val ids1 = spark.read.parquet(base.resolve("udout1").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == Set(1L, 4L, 5L),
      s"one survivor per canonical URL (smallest id), null passes: $ids1")
    assert(new java.io.File(base.resolve("udstate1").resolve("urls").toString).exists())
    // batch 2: yet another spelling of the batch-1 page -> cut at
    // arrival; a genuinely new page survives
    val src2 = base.resolve("usrc2").toString
    Seq(
      (100L, "https://example.com:443/a", "refetched body"),
      (101L, "https://example.com/c", "new page body")
    ).toDF("doc_id", "url", "text").write.parquet(src2)
    graft.cli.Curator.main(Array("--conf",
      conf(2, src2, Some(base.resolve("udstate1").toString))))
    val ids2 = spark.read.parquet(base.resolve("udout2").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids2 == Set(101L), s"prior-corpus URL must be cut at arrival: $ids2")
    // stage-off batch carries the urls state forward unchanged
    val offConf = write(base.resolve("udoff.conf"),
      s"""source { storage-type = local, dataset-dir = $src2 }
         |target { storage-type = local, dataset-dir = ${base.resolve("udoutOff")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  state-dir = ${base.resolve("udstate2")}
         |  state-out-dir = ${base.resolve("udstateOff")}
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", offConf))
    assert(spark.read.parquet(base.resolve("udstateOff").resolve("urls").toString).count() ==
      spark.read.parquet(base.resolve("udstate2").resolve("urls").toString).count())
    // the Streamer's near-dedup gains the same URL tier: a refetched
    // canonical URL is cut at ARRIVAL, before any text-tier work
    val landing = base.resolve("udland").toString
    Seq(
      (900L, "https://example.com:443/a?utm_campaign=z", "totally different text one", 1L),
      (901L, "https://example.com/z", "totally different text two", 2L)
    ).toDF("doc_id", "url", "text", "ts")
      .withColumn("ts", timestamp_micros(col("ts") * 3600L * 1000000L))
      .write.parquet(landing)
    val sconf = write(base.resolve("udstream.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = ${base.resolve("udsurv")}
         |  checkpoint-location = ${base.resolve("udckpt")}
         |  operation = near-dedup
         |  state-dir = ${base.resolve("udstate2")}
         |  url-column = url
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)
    graft.cli.Streamer.main(Array("--conf", sconf))
    val surv = spark.read.parquet(base.resolve("udsurv").toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(901L), s"URL-refetched arrival must be cut in-stream: $surv")
    // dead configs rejected up front, both directions
    assert(intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", write(base.resolve("udbad1.conf"),
        s"""source { storage-type = local, dataset-dir = $src1 }
           |target { storage-type = local, dataset-dir = ${base.resolve("udoutB")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation { dedup-urls = true }
           |""".stripMargin)))
    }.getMessage.contains("url-column"))
    assert(intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", write(base.resolve("udbad2.conf"),
        s"""source { storage-type = local, dataset-dir = $src1 }
           |target { storage-type = local, dataset-dir = ${base.resolve("udoutB")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation { url-column = url }
           |""".stripMargin)))
    }.getMessage.contains("dedup-urls"))
  }

  test("streamer filter: LM floors/knobs without their path are rejected " +
      "up front (the batch Curator's dead-config rules)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = tmp()
    val landing = base.resolve("fland").toString
    Seq((1L, "a doc", 1L)).toDF("doc_id", "text", "ts")
      .withColumn("ts", timestamp_micros(col("ts") * 3600L * 1000000L))
      .write.parquet(landing)
    def conf(extra: String) = write(base.resolve(s"sf${extra.length}.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = ${base.resolve("fout")}
         |  checkpoint-location = ${base.resolve("fckpt")}
         |  operation = filter
         |$extra
         |}
         |""".stripMargin)
    for ((knob, needle) <- Seq(
        ("  min-knn-logp = -2.0", "knn-path"),
        ("  knn-packed = true", "knn-path"),
        ("  knn-modified = true", "knn-path"),
        ("  min-kn3-logp = -2.0", "kn3-path"),
        ("  min-lm-logp = -2.0", "lm-path"),
        ("  min-classifier-score = 0.5", "classifier-path"))) {
      val e = intercept[IllegalArgumentException] {
        graft.cli.Streamer.main(Array("--conf", conf(knob)))
      }
      assert(e.getMessage.contains(needle), s"$knob: ${e.getMessage}")
    }
  }

  test("curator bpe-vocab emits token_ids on chunks (trained tokenizer end-to-end)") {
    import org.apache.spark.sql.functions.{col, explode, size => asize}
    val base = tmp()
    // train a small tokenizer on the corpus and save both artifacts
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.llm.BpeTrainer.learnMerges(docs, "text", numMerges = 32)
    val mPath = base.resolve("merges.txt").toString
    val vPath = base.resolve("vocab.txt").toString
    graft.llm.BpeTrainer.saveMerges(spark, mPath, merges)
    graft.llm.BpeTrainer.saveVocab(spark, vPath,
      graft.llm.BpeTrainer.buildVocab(docs, "text", merges))
    val out = base.resolve("chunks").toString
    val f = write(base.resolve("enc.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  chunk-size = 32
         |  bpe-merges = $mPath
         |  bpe-vocab = $vPath
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", f))
    val chunks = spark.read.parquet(out)
    assert(chunks.columns.contains("token_ids"))
    assert(chunks.filter(asize(col("token_ids")) === 0).count() ==
      chunks.filter(col("chunk_tokens") === 0).count())
    // the tokenizer was trained on this corpus → no <unk> ids anywhere
    assert(chunks.select(explode(col("token_ids")).as("i"))
      .filter(col("i") === 0).count() == 0)
    // ids are consistent with the independent count expression
    val bad = chunks.withColumn("__n",
      graft.functions.GraftFunctions.bpeCount(col("chunk_text"), mPath))
      .filter(asize(col("token_ids")) =!= col("__n")).count()
    assert(bad == 0, "token_ids length diverged from graft_bpe_count on chunk_text")
    // bpe-special-tokens: plant the spelling into the corpus, append it
    // to the vocab tail, and the Curator's token_ids export must emit
    // its single fixed id per occurrence (never split or merged across)
    val eot = "<|endoftext|>"
    val srcSp = base.resolve("sp_docs").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text", org.apache.spark.sql.functions.concat(
        col("text"), org.apache.spark.sql.functions.lit(s" tail$eot")))
      .write.parquet(srcSp)
    val vSp = base.resolve("vocab_sp.txt").toString
    graft.llm.BpeTrainer.saveVocab(spark, vSp,
      graft.llm.BpeTrainer.buildVocab(docs, "text", merges) :+ eot)
    val eotId = scala.io.Source.fromFile(vSp, "UTF-8").getLines().size - 1
    val outSp = base.resolve("sp_out").toString
    val fSp = write(base.resolve("enc_sp.conf"),
      s"""source { storage-type = local, dataset-dir = $srcSp }
         |target { storage-type = local, dataset-dir = $outSp, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  min-quality = 0.0
         |  bpe-merges = $mPath
         |  bpe-vocab = $vSp
         |  bpe-special-tokens = ["$eot"]
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", fSp))
    val spRows = spark.read.parquet(outSp)
    val nRows = spRows.count()
    assert(nRows > 0)
    assert(spRows.select(explode(col("token_ids")).as("i"))
      .filter(col("i") === eotId).count() == nRows,
      "every doc plants one spelling -> exactly one fixed id per doc")
  }

  test("curator pack-seq-len emits packed input_ids sequences with <eos> " +
      "separators and doc boundaries (the trainer-facing export)") {
    import org.apache.spark.sql.functions.{col, explode, sum => asum, size => asize}
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.llm.BpeTrainer.learnMerges(docs, "text", numMerges = 32)
    val mPath = base.resolve("merges.txt").toString
    val vPath = base.resolve("vocab.txt").toString
    graft.llm.BpeTrainer.saveMerges(spark, mPath, merges)
    graft.llm.BpeTrainer.saveVocab(spark, vPath,
      graft.llm.BpeTrainer.buildVocab(docs, "text", merges))
    val eos = graft.functions.BpeVocabIdRegistry.get(vPath).eosId
    assert(eos == 1, "byte-fallback layout carries <eos> at id 1")
    // run 1: the SAME curation with packing off — the per-doc token_ids
    // export is the conservation baseline (default curation drops docs,
    // so raw-corpus totals would not be comparable)
    val flat = base.resolve("flat").toString
    def conf(out: String, extra: String) = write(base.resolve(s"pack${extra.length}.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  bpe-merges = $mPath
         |  bpe-vocab = $vPath
         |$extra
         |}
         |""".stripMargin)
    graft.cli.Curator.main(Array("--conf", conf(flat, "")))
    val flatRows = spark.read.parquet(flat)
    val nDocs = flatRows.count()
    val nIds = flatRows.select(asum(asize(col("token_ids")) + 1)).head().getLong(0)
    // run 2: identical curation + packing (+ the 1-row report artifact)
    val out = base.resolve("packed").toString
    val repDir = base.resolve("packrep").toString
    graft.cli.Curator.main(Array("--conf",
      conf(out, "  pack-seq-len = 256\n  pack-buckets = 4\n" +
        s"  pack-report-dir = $repDir")))
    val packed = spark.read.parquet(out)
    assert(packed.columns.toSet ==
      Set("seq_id", "input_ids", "doc_boundaries", "n_tokens", "n_docs_started"))
    // token conservation vs the unpacked export: every surviving doc's
    // ids + one <eos> each, nothing lost or duplicated
    assert(packed.select(asum(col("n_tokens"))).head().getLong(0) == nIds)
    // every surviving doc started exactly once; non-tail sequences full
    assert(packed.select(asum(col("n_docs_started"))).head().getLong(0) == nDocs)
    assert(packed.filter(col("n_tokens") =!= 256).count() <= 4)
    // the separator between docs is the vocab's <eos> id, one per doc
    assert(packed.select(explode(col("input_ids")).as("i"))
      .filter(col("i") === eos).count() == nDocs)
    // the report artifact re-verifies against the export
    val rep = spark.read.parquet(repDir).head()
    assert(rep.getAs[Long]("n_sequences") == packed.count())
    assert(rep.getAs[Long]("tokens_packed") == nIds)
    assert(rep.getAs[Long]("n_docs_started") == nDocs)
    // with splits, the split label partitions the packing and rides the
    // output — train/val docs must never share a sequence (review
    // finding: packing across the split would contaminate evaluation)
    val outS = base.resolve("packed_split").toString
    graft.cli.Curator.main(Array("--conf",
      conf(outS, "  pack-seq-len = 256\n  pack-buckets = 4\n" +
        "  splits = [\"train:0.8\", \"val:0.2\"]")))
    val packedS = spark.read.parquet(outS)
    assert(packedS.columns.contains("split"), "split label must ride the export")
    assert(packedS.select("split").distinct().count() == 2)
    // token conservation still holds across the partitioned packing
    assert(packedS.select(asum(col("n_tokens"))).head().getLong(0) == nIds)
    // ≤ 1 partial tail per (split, bucket)
    assert(packedS.filter(col("n_tokens") =!= 256).count() <= 8)
    // with epochs, the digest-led stream order still conserves every
    // copy's tokens (each doc's ids + EOS, times its multiplicity)
    val outE = base.resolve("packed_epoch").toString
    graft.cli.Curator.main(Array("--conf",
      conf(outE, "  pack-seq-len = 256\n" +
        "  epoch-weights { src0 = 2 }\n  epoch-default-weight = 2")))
    assert(spark.read.parquet(outE).select(asum(col("n_tokens")))
      .head().getLong(0) == 2 * nIds,
      "epoch copies must pack with exact multiplicity")
    // pack-eos-token: a declared special (appended to the vocab tail)
    // replaces <eos> as the separator — the GPT-2-style export where
    // the separator has a spelling. Conservation math is unchanged.
    val eot = "<|endoftext|>"
    val vSp = base.resolve("vocab_eot.txt").toString
    graft.llm.BpeTrainer.saveVocab(spark, vSp,
      graft.llm.BpeTrainer.buildVocab(docs, "text", merges) :+ eot)
    val eotId = scala.io.Source.fromFile(vSp, "UTF-8").getLines().size - 1
    val outT = base.resolve("packed_eot").toString
    graft.cli.Curator.main(Array("--conf",
      conf(outT, s"  pack-seq-len = 256\n  pack-eos-token = \"$eot\"\n" +
        s"  bpe-vocab = $vSp")))
    val packedT = spark.read.parquet(outT)
    assert(packedT.select(explode(col("input_ids")).as("i"))
      .filter(col("i") === eotId).count() == nDocs,
      "every doc ends with the named separator's fixed id")
    assert(packedT.select(explode(col("input_ids")).as("i"))
      .filter(col("i") === eos).count() == 0,
      "the control <eos> must not appear when a named separator is set")
    assert(packedT.select(asum(col("n_tokens"))).head().getLong(0) == nIds)
    // a separator missing from the vocab is rejected up front
    val eMiss = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(base.resolve("nope2").toString,
          "  pack-seq-len = 256\n  pack-eos-token = \"<|nope|>\"")))
    }
    assert(eMiss.getMessage.contains("pack-eos-token"), eMiss.getMessage)
    // a packing run without a vocab is rejected up front
    val badConf = write(base.resolve("pack_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("nope")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { pack-seq-len = 256 }
         |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", badConf))
    }
    assert(e.getMessage.contains("bpe-vocab"), e.getMessage)
  }

  test("curator bpe-byte-level: token_ids, budget chunking, and the packed " +
      "export speak the GPT-2-style byte-level tokenizer — byte-exact " +
      "round trips through the CLI path; dead config rejected up front") {
    import org.apache.spark.sql.functions.{col, explode, sum => asum, size => asize}
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.llm.BpeTrainer.learnByteMerges(docs, "text", numMerges = 32)
    val mPath = base.resolve("bmerges.txt").toString
    val vPath = base.resolve("bvocab.txt").toString
    graft.llm.BpeTrainer.saveMerges(spark, mPath, merges)
    graft.llm.BpeTrainer.saveVocab(spark, vPath,
      graft.llm.BpeTrainer.buildByteVocab(merges))
    val eos = graft.functions.BpeByteVocabRegistry.get(vPath).eosId
    assert(eos == 1, "byte-level layout carries <eos> at id 1")
    def conf(out: String, extra: String) = write(base.resolve(s"bl${extra.length}.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  bpe-merges = $mPath
         |  bpe-vocab = $vPath
         |  bpe-byte-level = true
         |$extra
         |}
         |""".stripMargin)
    // flat run: per-doc token_ids decode byte-exactly back to the text
    val flat = base.resolve("blflat").toString
    graft.cli.Curator.main(Array("--conf", conf(flat, "")))
    val flatRows = spark.read.parquet(flat)
    assert(flatRows.columns.contains("token_ids"))
    val broken = flatRows.filter(
      graft.functions.GraftFunctions.bpeByteDecode(col("token_ids"), vPath)
        =!= col("text")).count()
    assert(broken == 0, s"$broken docs failed decode(token_ids) == text")
    // byte-level never emits <unk> (id 0) — totality is structural
    assert(flatRows.select(explode(col("token_ids")).as("i"))
      .filter(col("i") === 0).count() == 0)
    val nDocs = flatRows.count()
    val nIds = flatRows.select(asum(asize(col("token_ids")) + 1)).head().getLong(0)
    // packed run: same structure contract as the byte-fallback export,
    // conservation against the flat run, <eos> separator per doc
    val out = base.resolve("blpacked").toString
    graft.cli.Curator.main(Array("--conf", conf(out, "  pack-seq-len = 128\n  pack-buckets = 4")))
    val packed = spark.read.parquet(out)
    assert(packed.columns.toSet ==
      Set("seq_id", "input_ids", "doc_boundaries", "n_tokens", "n_docs_started"))
    assert(packed.select(asum(col("n_tokens"))).head().getLong(0) == nIds)
    assert(packed.select(asum(col("n_docs_started"))).head().getLong(0) == nDocs)
    assert(packed.select(explode(col("input_ids")).as("i"))
      .filter(col("i") === eos).count() == nDocs)
    // byte-level + bpe-budget: chunks cut at pretoken boundaries under
    // a byte-level id budget, and each chunk's encoding emits EXACTLY
    // the budget it was sized under (chunk_bpe_tokens == size(ids))
    val chunked = base.resolve("blchunks").toString
    graft.cli.Curator.main(Array("--conf", conf(chunked,
      "  bpe-budget = 48\n  chunk-overlap = 0")))
    val chunkRows = spark.read.parquet(chunked)
    assert(chunkRows.columns.contains("chunk_text") &&
      chunkRows.columns.contains("token_ids"))
    assert(chunkRows.filter(col("chunk_bpe_tokens") > 48)
      .filter(col("chunk_tokens") > 1).count() == 0,
      "multi-pretoken chunks must respect the byte-level budget")
    assert(chunkRows.filter(asize(col("token_ids")) =!= col("chunk_bpe_tokens"))
      .count() == 0,
      "byte-level encoding of a chunk must emit exactly its sized budget")
    // overlap-0 lossless property THROUGH the CLI: per doc, the chunks
    // concatenate back to the curated text byte-for-byte
    val rebuilt = chunkRows
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.concat_ws("",
        org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.collect_list(
            org.apache.spark.sql.functions.struct(col("chunk_id"), col("chunk_text"))))
          .getField("chunk_text")).as("rebuilt"))
    val srcTexts = flatRows.select(col("doc_id"), col("text"))
    assert(rebuilt.join(srcTexts, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count() == 0,
      "overlap-0 byte-level chunks must concatenate back to the document")
    // byte-level without a vocab is dead config
    val badConf = write(base.resolve("bl_bad.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = ${base.resolve("nope2")}, dataset-store-format = parquet, write-mode = overwrite }
         |curation { bpe-byte-level = true }
         |""".stripMargin)
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", badConf))
    }
    assert(e2.getMessage.contains("bpe-byte-level"), e2.getMessage)
  }

  test("scorer with model-expr scores without a saved model (U5 through E2)") {
    val base = tmp()
    val out = base.resolve("scores").toString
    val f = write(base.resolve("s.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/orders.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet }
         |uid-column = o_orderkey
         |model-expr = "o_totalprice * 2"
         |model-name = doubler
         |cols-to-save = [o_orderkey]
         |current-dt = 2026-01-01T00-00
         |""".stripMargin)
    graft.cli.Scorer.main(Array("--conf", f))
    val scores = spark.read.parquet(out)
    assert(scores.columns.toSeq == Seq("model_name", "current_dt", "o_orderkey", "pred"))
    assert(scores.select("model_name").head().getString(0) == "doubler")
  }

  test("trainer validation holdout: deterministic digest split, AUC on the " +
      "holdout, report lands and the model saves even when the gate trips") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    // separable data: label = x > 0.5 + a noise feature
    val src = base.resolve("tv_src").toString
    spark.range(400).select(
        col("id").as("uid"),
        (col("id") / 400.0).as("x"),
        (col("id") % 7 / 7.0).as("noise"),
        (col("id") >= 200).cast("int").as("label"))
      .write.parquet(src)
    val rep = base.resolve("tv_rep").toString
    val modelDir = base.resolve("tv_model").toString
    def conf(name: String, gate: String) = write(base.resolve(s"tv_$name.conf"),
      s"""model-definition {
         |  dataset { storage-type = local, dataset-dir = $src }
         |  target-column = label
         |  estimator = logistic-regression
         |  feature-columns = [x, noise]
         |}
         |model-path = $modelDir
         |validation {
         |  fraction = 0.25
         |  id-column = uid
         |  report-dir = $rep
         |$gate
         |}
         |""".stripMargin)
    graft.cli.Trainer.main(Array("--conf", conf("ok", "  min-auc = 0.95")))
    val m1 = spark.read.parquet(rep).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m1("auc") > 0.95, s"separable data must validate cleanly: $m1")
    assert(m1("n") > 60 && m1("n") < 140, s"~25% holdout of 400: ${m1("n")}")
    // determinism: the same salt carves the same holdout
    graft.cli.Trainer.main(Array("--conf", conf("ok2", "  min-auc = 0.95")))
    assert(spark.read.parquet(rep).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap == m1)
    // an impossible gate trips AFTER the report and the model save
    val e = intercept[IllegalStateException] {
      graft.cli.Trainer.main(Array("--conf", conf("bad", "  min-auc = 1.01")))
    }
    assert(e.getMessage.contains("below the"), e.getMessage)
    assert(new java.io.File(modelDir).exists(), "model must save even on a gate trip")
    assert(spark.read.parquet(rep).count() > 0, "the failing run's report must land")
    // fraction without an id column is rejected up front
    val g = intercept[IllegalArgumentException] {
      graft.cli.Trainer.main(Array("--conf", write(base.resolve("tv_noid.conf"),
        s"""model-definition {
           |  dataset { storage-type = local, dataset-dir = $src }
           |  target-column = label
           |}
           |model-path = ${base.resolve("nope_tv")}
           |validation { fraction = 0.25 }
           |""".stripMargin)))
    }
    assert(g.getMessage.contains("id-column"), g.getMessage)
    // single-class data: the holdout AUC is a vacuous 1.0 (MLlib with
    // no negatives) — the gate must refuse to apply, never silently
    // pass a meaningless validation (the model still saves;
    // report-then-gate)
    val oneSrc = base.resolve("tv_one").toString
    spark.range(400).select(
        col("id").as("uid"), (col("id") / 400.0).as("x"),
        (col("id") % 7 / 7.0).as("noise"),
        org.apache.spark.sql.functions.lit(1).as("label"))
      .write.parquet(oneSrc)
    val nanE = intercept[IllegalStateException] {
      graft.cli.Trainer.main(Array("--conf", write(base.resolve("tv_one.conf"),
        s"""model-definition {
           |  dataset { storage-type = local, dataset-dir = $oneSrc }
           |  target-column = label
           |  estimator = logistic-regression
           |  feature-columns = [x, noise]
           |}
           |model-path = ${base.resolve("tv_one_model")}
           |validation {
           |  fraction = 0.25
           |  id-column = uid
           |  report-dir = $rep
           |  min-auc = 0.5
           |}
           |""".stripMargin)))
    }
    assert(nanE.getMessage.contains("single label class"), nanE.getMessage)
    assert(new java.io.File(base.resolve("tv_one_model").toString).exists(),
      "the model still saves when the gate refuses (report-then-gate)")
    assert(spark.read.parquet(rep).count() > 0,
      "the refusing run's report must still land")
  }

  test("scorer evaluate block: AUC/accuracy metrics + report artifact; " +
      "min-auc gate trips AFTER the report; regression kind; guards") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    // dataset: feature x in [0,1], label = x > 0.5 — scoring with
    // pred = x ranks perfectly (AUC 1.0, accuracy@0.5 = 1.0)
    val src = base.resolve("eval_src").toString
    spark.range(200).select(
        col("id").as("uid"),
        (col("id") / 200.0).as("x"),
        (col("id") >= 100).cast("int").as("label"))
      .write.parquet(src)
    val rep = base.resolve("eval_rep").toString
    def conf(name: String, expr: String, extra: String) = write(base.resolve(s"ev_$name.conf"),
      s"""source { storage-type = local, dataset-dir = $src }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"sc_$name")}, dataset-store-format = parquet }
         |uid-column = uid
         |model-expr = "$expr"
         |model-name = m
         |cols-to-save = [uid, label]
         |current-dt = 2026-01-01T00-00
         |evaluate {
         |  label-column = label
         |  report-dir = $rep
         |$extra
         |}
         |""".stripMargin)
    // perfect ranking: AUC = 1, gate passes
    graft.cli.Scorer.main(Array("--conf", conf("ok", "x", "  min-auc = 0.99")))
    val m1 = spark.read.parquet(rep).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m1("auc") == 1.0 && m1("accuracy_at_0.5") == 1.0 && m1("n") == 200.0, s"$m1")
    // anti-correlated scores: AUC = 0, gate trips — but the report
    // must land FIRST (Differ convention)
    val e = intercept[IllegalStateException] {
      graft.cli.Scorer.main(Array("--conf", conf("bad", "1.0 - x", "  min-auc = 0.5")))
    }
    assert(e.getMessage.contains("below the"), e.getMessage)
    val m2 = spark.read.parquet(rep).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m2("auc") == 0.0, "the failing run's report must still land")
    // regression kind: pred == label -> rmse 0; max-rmse gate enforced
    graft.cli.Scorer.main(Array("--conf",
      conf("reg", "CAST(uid >= 100 AS DOUBLE)", "  kind = regression\n  max-rmse = 0.01")))
    val m3 = spark.read.parquet(rep).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m3("rmse") == 0.0 && m3("mae") == 0.0, s"$m3")
    // guard: min-auc with regression kind is rejected
    val g = intercept[IllegalArgumentException] {
      graft.cli.Scorer.main(Array("--conf",
        conf("guard", "x", "  kind = regression\n  min-auc = 0.5")))
    }
    assert(g.getMessage.contains("min-auc"), g.getMessage)
    // single-class labels: MLlib reports a vacuous AUC of 1.0 (no
    // negatives → every floor passes) — before the guard this gate
    // went GREEN on the most broken input. It must fail loudly, after
    // the report lands.
    val oneSrc = base.resolve("eval_one").toString
    spark.range(100).select(col("id").as("uid"), (col("id") / 100.0).as("x"),
      org.apache.spark.sql.functions.lit(1).as("label")).write.parquet(oneSrc)
    def degenConf(name: String, srcDir: String) = write(base.resolve(s"ev_$name.conf"),
      s"""source { storage-type = local, dataset-dir = $srcDir }
         |target { storage-type = local, dataset-dir = ${base.resolve(s"sc_$name")}, dataset-store-format = parquet }
         |uid-column = uid
         |model-expr = "x"
         |model-name = m
         |cols-to-save = [uid, label]
         |current-dt = 2026-01-01T00-00
         |evaluate {
         |  label-column = label
         |  report-dir = $rep
         |  min-auc = 0.5
         |}
         |""".stripMargin)
    val oneE = intercept[IllegalStateException] {
      graft.cli.Scorer.main(Array("--conf", degenConf("one", oneSrc)))
    }
    assert(oneE.getMessage.contains("single class"), oneE.getMessage)
    assert(spark.read.parquet(rep).count() > 0,
      "the refusing run's report must still land (report-then-gate)")
    // all-null labels: zero (score, label) pairs — same loud refusal
    // (the aggregate path would otherwise NPE or report nothing)
    val nullSrc = base.resolve("eval_null").toString
    spark.range(100).select(col("id").as("uid"), (col("id") / 100.0).as("x"),
      org.apache.spark.sql.functions.lit(null).cast("int").as("label"))
      .write.parquet(nullSrc)
    val emptyE = intercept[IllegalStateException] {
      graft.cli.Scorer.main(Array("--conf", degenConf("null", nullSrc)))
    }
    assert(emptyE.getMessage.contains("zero non-null"), emptyE.getMessage)
  }

  test("mediadedup: report mode writes the pair evidence; filter mode collapses " +
      "each near-dup cluster to its minimum id; bad modality rejected") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    // media table: 20 smooth plates as PNGs + JPEG twins of every 4th
    // under id+100000 (5 clusters of 2)
    val seedTable = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 20),
      "doc_id", "text", "image", Map.empty)
    val png = Multimodal.reencodeAsSmoothImage(seedTable, jpeg = false)
    val twins = Multimodal.reencodeAsSmoothImage(
      seedTable.filter(col("asset_id") % 4 === 0), jpeg = true)
      .withColumn("asset_id", col("asset_id") + 100000)
    val src = base.resolve("media").toString
    png.unionByName(twins).write.parquet(src)
    val out = base.resolve("deduped").toString
    val pairsDir = base.resolve("pairs").toString
    def conf(mode: String, modality: String = "image") = write(
      base.resolve(s"md_$mode$modality.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = $modality
         |  mode = $mode
         |  pairs-dir = $pairsDir
         |}
         |""".stripMargin)
    // report mode: pairs written, nothing filtered
    graft.cli.MediaDedup.main(Array("--conf", conf("report")))
    val pairs = spark.read.parquet(pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == 5 && pairs.forall(p => p._2 - p._1 == 100000),
      s"want exactly the 5 planted twins: ${pairs.toSeq}")
    assert(!new java.io.File(out).exists(), "report mode must not write a target")
    // filter mode: each 2-asset cluster keeps its minimum id
    graft.cli.MediaDedup.main(Array("--conf", conf("filter")))
    val kept = spark.read.parquet(out).select("asset_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == 20, s"25 assets -> 20 survivors, got ${kept.size}")
    assert(kept == (0L until 20L).toSet,
      s"every cluster keeps its MINIMUM id (the PNG original): $kept")
    // modality validation
    val e = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", conf("report", "hologram")))
    }
    assert(e.getMessage.contains("modality"), e.getMessage)
    // verify-pairs: pixel confirmation keeps the same pair set on the
    // clean corpus, and the report rows carry the evidence column
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("md_vp.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  modality = image
         |  mode = report
         |  verify-pairs = true
         |  pairs-dir = $pairsDir
         |}
         |""".stripMargin)))
    val vRows = spark.read.parquet(pairsDir)
    assert(vRows.columns.contains("mean_diff"),
      "confirmed pairs must carry the pixel evidence")
    assert(vRows.count() == 5 &&
      vRows.collect().forall(_.getAs[Double]("mean_diff") <= 0.1))
    // verification covers image tiers + scalar audio; offset-matched
    // windowed pairs stay signature-gated (their evidence would need
    // window alignment)
    val vg = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("md_vpa.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = audio
           |  windowed = true
           |  mode = report
           |  verify-pairs = true
           |}
           |""".stripMargin)))
    }
    assert(vg.getMessage.contains("signature-gated"), vg.getMessage)
    // INCREMENTAL: run 1 filters and writes fingerprint state; run 2
    // feeds the SAME corpus against it -> every asset is near a stored
    // fingerprint and drops (the text-tier incremental contract)
    val st1 = base.resolve("mdstate1").toString
    val out2 = base.resolve("dedup2").toString
    def confInc(n: Int, stateIn: Option[String], stateOut: String, outDir: String) =
      write(base.resolve(s"md_inc$n.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  target { storage-type = local, dataset-dir = $outDir, dataset-store-format = parquet, write-mode = overwrite }
           |  modality = image
           |  mode = filter
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = $stateOut
           |}
           |""".stripMargin)
    graft.cli.MediaDedup.main(Array("--conf",
      confInc(1, None, st1, base.resolve("dedup1").toString)))
    assert(new java.io.File(s"$st1/sigs").exists() &&
      new java.io.File(s"$st1/fingerprint").exists())
    // state holds exactly the 20 survivors' fingerprints
    assert(spark.read.parquet(s"$st1/sigs").count() == 20)
    graft.cli.MediaDedup.main(Array("--conf",
      confInc(2, Some(st1), base.resolve("mdstate2").toString, out2)))
    assert(spark.read.parquet(out2).count() == 0,
      "re-feeding the same corpus against its own state must drop everything")
    // fingerprint-geometry drift is rejected loudly
    val badState = write(base.resolve(s"md_drift.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  target { storage-type = local, dataset-dir = ${base.resolve("nope_md")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = audio
         |  mode = filter
         |  state-dir = $st1
         |}
         |""".stripMargin)
    val de = intercept[Throwable] {
      graft.cli.MediaDedup.main(Array("--conf", badState))
    }
    val msgs = Iterator.iterate(de)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("not comparable"), msgs)
  }

  /** md5 of every data file under a dir, keyed by relative path — the
    * "prior parts stay byte-identical" witness. */
  private def dirChecksums(dir: String): Map[String, String] = {
    val root = java.nio.file.Paths.get(dir)
    val md = java.security.MessageDigest.getInstance("MD5")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith(".")) // ignore CRC sidecars
      .map { p =>
        md.reset()
        root.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }

  test("mediadedup parts-mode lineage: per-batch write-once sig parts (prior " +
      "parts byte-identical across commits), mergeable hotcounts equal the " +
      "direct aggregate, the Compactor consolidates media state, and " +
      "parts/rewrite mode mixing is rejected loudly") {
    import org.apache.spark.sql.functions.col
    import graft.llm.{Dedup, Multimodal}
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def plates(lo: Int, hi: Int) = Multimodal.reencodeAsSmoothImage(
      Multimodal.asMediaTable(
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
        "doc_id", "text", "image", Map.empty), jpeg = false)
    // batch 1: plates 0..19; batch 2: NEW plates 20..29 + JPEG re-encodes
    // of 0/4/8 under shifted ids (near the STORED fingerprints -> drop)
    val src1 = base.resolve("mb1").toString
    val src2 = base.resolve("mb2").toString
    plates(0, 20).write.parquet(src1)
    val reenc = Multimodal.reencodeAsSmoothImage(
      Multimodal.asMediaTable(
        docs.filter(col("doc_id").isin(0, 4, 8)), "doc_id", "text", "image",
        Map.empty), jpeg = true)
      .withColumn("asset_id", col("asset_id") + 100000)
    plates(20, 30).unionByName(reenc).write.parquet(src2)
    val parts = base.resolve("mdparts").toString
    val (st1, st2, st3) = (base.resolve("pst1").toString,
      base.resolve("pst2").toString, base.resolve("pst3").toString)
    def conf(n: Int, src: String, stateIn: Option[String], stateOut: String,
        partsDir: Option[String] = Some(parts)) =
      write(base.resolve(s"mdp_$n.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  target { storage-type = local, dataset-dir = ${base.resolve(s"mdout$n")}, dataset-store-format = parquet, write-mode = overwrite }
           |  modality = image
           |  mode = filter
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = $stateOut
           |${partsDir.map(d => s"  state-parts-dir = $d").getOrElse("")}
           |}
           |""".stripMargin)
    // ---- batch 1: fresh parts lineage
    graft.cli.MediaDedup.main(Array("--conf", conf(1, src1, None, st1)))
    def manifest(d: String, t: String): Seq[String] =
      scala.io.Source.fromFile(s"$d/${t}manifest", "UTF-8")
        .getLines().filter(_.nonEmpty).toSeq
    assert(manifest(st1, "sigs").length == 1 &&
      manifest(st1, "hotcounts").length == 1,
      "batch 1 commits one write-once part per table")
    assert(new java.io.File(s"$st1/hot").exists(), "derived hot keys materialize")
    val part0Sums = dirChecksums(s"$parts/sigs/part-0")
    assert(spark.read.parquet(manifest(st1, "sigs"): _*).count() == 20)
    // ---- batch 2: appends ONLY its own rows; batch-1 part untouched
    graft.cli.MediaDedup.main(Array("--conf", conf(2, src2, Some(st1), st2)))
    assert(dirChecksums(s"$parts/sigs/part-0") == part0Sums,
      "a later commit must leave prior sig parts byte-identical")
    assert(manifest(st2, "sigs") == manifest(st1, "sigs") :+
      s"file:$parts/sigs/part-1",
      s"batch 2's manifest = batch 1's + its own part: ${manifest(st2, "sigs")}")
    val unionSigs = spark.read.parquet(manifest(st2, "sigs"): _*)
    assert(unionSigs.count() == 30,
      "state = 20 batch-1 survivors + 10 new batch-2 survivors (re-encodes dropped)")
    assert(spark.read.parquet(s"${base.resolve("mdout2")}").count() == 10,
      "the 3 JPEG re-encodes of stored plates drop at the door")
    // mergeable-counts contract: summing the per-batch count parts
    // equals one aggregate over the signature union
    val merged = Dedup.mergeBucketCounts(
      spark.read.parquet(manifest(st2, "hotcounts"): _*))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val direct = Dedup.bucketCounts(unionSigs, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(merged == direct,
      "merged per-batch hotcounts must equal the direct aggregate over the union")
    // ---- Compactor consolidates the media lineage (same sigs/hotcounts
    // semantics as Curator state; the fingerprint line rides along)
    graft.cli.Compactor.main(Array("--conf", write(base.resolve("mdp_c.conf"),
      s"""compaction {
         |  state-dir = $st2
         |  state-out-dir = $st3
         |}
         |""".stripMargin)))
    assert(manifest(st3, "sigs").length == 1 &&
      manifest(st3, "sigs").head.contains("part-c"),
      s"compaction rewrites to one fresh-generation part: ${manifest(st3, "sigs")}")
    assert(spark.read.parquet(manifest(st3, "sigs"): _*).count() == 30)
    assert(new java.io.File(s"$st3/fingerprint").exists(),
      "the modality/geometry fingerprint must survive compaction")
    // the compacted lineage continues: re-feeding batch 1 drops all
    graft.cli.MediaDedup.main(Array("--conf", conf(4, src1, Some(st3), base.resolve("pst4").toString)))
    assert(spark.read.parquet(s"${base.resolve("mdout4")}").count() == 0,
      "every batch-1 asset is near its own stored fingerprint")
    // ---- mode mixing is rejected loudly (a lineage never switches)
    val mix = intercept[Throwable] {
      graft.cli.MediaDedup.main(Array("--conf",
        conf(5, src1, Some(st3), base.resolve("nope_st").toString, partsDir = None)))
    }
    val mixMsgs = Iterator.iterate(mix)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(mixMsgs.contains("never changes mode"), mixMsgs)
  }

  test("mediadedup audio windowed tier: trimmed twins collapse in-batch, a " +
      "trimmed arrival drops against windowed state, scalar state is not " +
      "comparable") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaTable(docs.filter(col("doc_id") < 12),
      "doc_id", "text", "audio", Map.empty)
    val full = Multimodal.reencodeAsSmoothAudio(media)
    val twins = Multimodal.reencodeAsSmoothAudio(
      media.filter(col("asset_id") % 4 === 0), trimFrames = 1024)
      .withColumn("asset_id", col("asset_id") + 100000)
    val src1 = base.resolve("aw_src1").toString
    full.unionByName(twins).write.parquet(src1)
    val st1 = base.resolve("aw_st1").toString
    def conf(n: Int, src: String, stateIn: Option[String], stateOut: String) =
      write(base.resolve(s"aw_$n.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  target { storage-type = local, dataset-dir = ${base.resolve(s"aw_out$n")}, dataset-store-format = parquet, write-mode = overwrite }
           |  modality = audio
           |  windowed = true
           |  mode = filter
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = $stateOut
           |}
           |""".stripMargin)
    graft.cli.MediaDedup.main(Array("--conf", conf(1, src1, None, st1)))
    val kept1 = spark.read.parquet(base.resolve("aw_out1").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept1 == (0L until 12L).toSet,
      s"every trimmed twin collapses onto its original: $kept1")
    assert(scala.io.Source.fromFile(s"$st1/fingerprint", "UTF-8").mkString.trim ==
      "audio-windowed|wf=2048|hop=512|bands=4|maxHamming=3",
      "the windowed state shape gets its own fingerprint line")
    // incremental: a NEW trimmed rendering of stored recording 3 drops
    // at the increment; a fresh recording lands
    val src2 = base.resolve("aw_src2").toString
    val arrivals = Multimodal.asMediaTable(
      docs.filter(col("doc_id").isin(3, 499)), "doc_id", "text", "audio", Map.empty)
    Multimodal.reencodeAsSmoothAudio(arrivals.filter(col("asset_id") === 3), trimFrames = 1024)
      .withColumn("asset_id", col("asset_id") + 200000)
      .unionByName(Multimodal.reencodeAsSmoothAudio(arrivals.filter(col("asset_id") === 499)))
      .write.parquet(src2)
    graft.cli.MediaDedup.main(Array("--conf",
      conf(2, src2, Some(st1), base.resolve("aw_st2").toString)))
    val kept2 = spark.read.parquet(base.resolve("aw_out2").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(499L),
      s"the trimmed arrival is near stored windowed state: $kept2")
    // a windowed run cannot read scalar audio state (shape drift)
    val scalarState = base.resolve("aw_scalar_st").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("aw_scalar.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src1 }
         |  target { storage-type = local, dataset-dir = ${base.resolve("aw_outs")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = audio
         |  mode = filter
         |  state-out-dir = $scalarState
         |}
         |""".stripMargin)))
    val de = intercept[Throwable] {
      graft.cli.MediaDedup.main(Array("--conf",
        conf(3, src2, Some(scalarState), base.resolve("aw_nope").toString)))
    }
    assert(Iterator.iterate(de)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      .contains("not comparable"))
  }

  test("mediadedup video shift-tolerant tier: temporally shifted twins " +
      "collapse in-batch and a shifted arrival drops against the SAME " +
      "frame-sig state an aligned run wrote") {
    import org.apache.spark.sql.functions.{col, when}
    import graft.llm.Multimodal
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaTable(docs.filter(col("doc_id") < 10),
      "doc_id", "text", "video", Map.empty)
    val dib = Multimodal.reencodeAsSmoothAvi(media, nFrames = 6, mjpeg = false)
    val shifted = Multimodal.reencodeAsSmoothAvi(
      media.filter(col("asset_id") % 5 === 0), nFrames = 6, mjpeg = true,
      frameOffset = 2).withColumn("asset_id", col("asset_id") + 100000)
    val src = base.resolve("vs_src").toString
    dib.unionByName(shifted).write.parquet(src)
    val st = base.resolve("vs_st").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("vs_1.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  target { storage-type = local, dataset-dir = ${base.resolve("vs_out1")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = video
         |  shift-tolerant = true
         |  min-frames = 3
         |  mode = filter
         |  state-out-dir = $st
         |}
         |""".stripMargin)))
    val kept = spark.read.parquet(base.resolve("vs_out1").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 10L).toSet,
      s"shifted twins collapse onto their originals: $kept")
    // the state is plain frame sigs — the fingerprint line is tier-free
    assert(scala.io.Source.fromFile(s"$st/fingerprint", "UTF-8").mkString.trim
      .startsWith("video|"), "shift tolerance is matching-time, not a state shape")
    // a shifted arrival of stored clip 7 drops; a fresh clip lands
    val src2 = base.resolve("vs_src2").toString
    Multimodal.reencodeAsSmoothAvi(
      Multimodal.asMediaTable(docs.filter(col("doc_id").isin(7, 499)),
        "doc_id", "text", "video", Map.empty)
        .withColumn("seed", when(col("asset_id") === 7L, 7L).otherwise(col("asset_id"))),
      nFrames = 6, mjpeg = true, seedCol = "seed",
      frameOffset = 2)
      .drop("seed")
      .withColumn("asset_id", when(col("asset_id") === 7L, 200007L).otherwise(col("asset_id")))
      .write.parquet(src2)
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("vs_2.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src2 }
         |  target { storage-type = local, dataset-dir = ${base.resolve("vs_out2")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = video
         |  shift-tolerant = true
         |  min-frames = 3
         |  mode = filter
         |  state-dir = $st
         |  state-out-dir = ${base.resolve("vs_st2")}
         |}
         |""".stripMargin)))
    val kept2 = spark.read.parquet(base.resolve("vs_out2").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(499L),
      s"the shifted arrival shares 4 frames at one delta with stored clip 7: $kept2")
  }

  test("mediadedup image crop-tier: the CROP side drops regardless of id " +
      "order (directional collapse, not min-id), and a crop arrival drops " +
      "against stored tile state") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // originals under HIGH ids (1000+), crops under LOW ids (1..3) of
    // seeds 1000/1004/1008 — min-id collapse would keep the CROPS; the
    // directional collapse must keep the ORIGINALS
    val originals = Multimodal.reencodeAsSmoothImage(
      Multimodal.asMediaTable(docs.filter(col("doc_id") < 12), "doc_id", "text",
        "image", Map.empty)
        .withColumn("asset_id", col("asset_id") + 1000), jpeg = false)
    val crops = Multimodal.reencodeAsSmoothImageCrop(
      Multimodal.asMediaTable(docs.filter(col("doc_id").isin(0, 4, 8)), "doc_id",
        "text", "image", Map.empty)
        .withColumn("seed", col("asset_id") + 1000)
        .withColumn("asset_id", (col("asset_id") / 4 + 1).cast("long")), seedCol = "seed")
      .drop("seed")
    val src = base.resolve("ct_src").toString
    originals.unionByName(crops).write.parquet(src)
    val st = base.resolve("ct_st").toString
    def conf(n: Int, src0: String, stateIn: Option[String], stateOut: String) =
      write(base.resolve(s"ct_$n.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src0 }
           |  target { storage-type = local, dataset-dir = ${base.resolve(s"ct_out$n")}, dataset-store-format = parquet, write-mode = overwrite }
           |  modality = image
           |  crop-tier = true
           |  mode = filter
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = $stateOut
           |}
           |""".stripMargin)
    graft.cli.MediaDedup.main(Array("--conf", conf(1, src, None, st)))
    val kept = spark.read.parquet(base.resolve("ct_out1").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept == (1000L until 1012L).toSet,
      s"originals survive, crops drop — even at lower ids: $kept")
    assert(scala.io.Source.fromFile(s"$st/fingerprint", "UTF-8").mkString.trim ==
      "image-tiles|bands=4|maxHamming=3")
    // a crop ARRIVAL of stored original 1006 drops (batch_is_crop); a
    // fresh plate lands
    val src2 = base.resolve("ct_src2").toString
    Multimodal.reencodeAsSmoothImageCrop(
      Multimodal.asMediaTable(docs.filter(col("doc_id") === 6), "doc_id", "text",
        "image", Map.empty)
        .withColumn("seed", col("asset_id") + 1000)
        .withColumn("asset_id", col("asset_id") + 200000), seedCol = "seed")
      .drop("seed")
      .unionByName(Multimodal.reencodeAsSmoothImage(
        Multimodal.asMediaTable(docs.filter(col("doc_id") === 7), "doc_id", "text",
          "image", Map.empty)
          .withColumn("asset_id", col("asset_id") + 700000), jpeg = false))
      .write.parquet(src2)
    graft.cli.MediaDedup.main(Array("--conf",
      conf(2, src2, Some(st), base.resolve("ct_st2").toString)))
    val kept2 = spark.read.parquet(base.resolve("ct_out2").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(700007L),
      s"the crop arrival is near stored tile state: $kept2")
  }

  test("mediadedup image rotation-tier: rotated/mirrored twins collapse " +
      "in-batch (both directional witnesses), a rotated arrival drops " +
      "against stored dihedral state, tile state is not comparable") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMediaTable(docs.filter(col("doc_id") < 12),
      "doc_id", "text", "image", Map.empty)
    val originals = Multimodal.reencodeAsSmoothImageRotated(media, k = 0)
    // twins: a quarter-turn AND a mirror (k=4) under shifted ids
    val rotTwins = Multimodal.reencodeAsSmoothImageRotated(
      media.filter(col("asset_id") % 4 === 0), k = 1)
      .withColumn("asset_id", col("asset_id") + 100000)
    val mirTwins = Multimodal.reencodeAsSmoothImageRotated(
      media.filter(col("asset_id") % 4 === 1), k = 4)
      .withColumn("asset_id", col("asset_id") + 200000)
    val src = base.resolve("rt_src").toString
    originals.unionByName(rotTwins).unionByName(mirTwins).write.parquet(src)
    val st = base.resolve("rt_st").toString
    def conf(n: Int, src0: String, stateIn: Option[String], stateOut: String) =
      write(base.resolve(s"rt_$n.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src0 }
           |  target { storage-type = local, dataset-dir = ${base.resolve(s"rt_out$n")}, dataset-store-format = parquet, write-mode = overwrite }
           |  modality = image
           |  rotation-tier = true
           |  mode = filter
           |${stateIn.map(d => s"  state-dir = $d").getOrElse("")}
           |  state-out-dir = $stateOut
           |}
           |""".stripMargin)
    graft.cli.MediaDedup.main(Array("--conf", conf(1, src, None, st)))
    val kept = spark.read.parquet(base.resolve("rt_out1").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 12L).toSet,
      s"rotated AND mirrored twins collapse onto their originals: $kept")
    assert(scala.io.Source.fromFile(s"$st/fingerprint", "UTF-8").mkString.trim ==
      "image-dihedral|bands=4|maxHamming=3")
    // a 180°-rotated arrival of stored plate 5 drops; a fresh plate lands
    val src2 = base.resolve("rt_src2").toString
    Multimodal.reencodeAsSmoothImageRotated(
      Multimodal.asMediaTable(docs.filter(col("doc_id") === 5), "doc_id", "text",
        "image", Map.empty)
        .withColumn("asset_id", col("asset_id") + 300000)
        .withColumn("seed", col("asset_id") - 300000), k = 2, seedCol = "seed")
      .drop("seed")
      .unionByName(Multimodal.reencodeAsSmoothImageRotated(
        Multimodal.asMediaTable(docs.filter(col("doc_id") === 450), "doc_id",
          "text", "image", Map.empty), k = 0))
      .write.parquet(src2)
    graft.cli.MediaDedup.main(Array("--conf",
      conf(2, src2, Some(st), base.resolve("rt_st2").toString)))
    val kept2 = spark.read.parquet(base.resolve("rt_out2").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(450L),
      s"the rotated arrival is near stored dihedral state: $kept2")
    // crop-tier state (different shape) is rejected loudly; so is
    // running both image tiers in one lineage
    val g = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("rt_both.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  rotation-tier = true
           |  crop-tier = true
           |  mode = report
           |}
           |""".stripMargin)))
    }
    assert(g.getMessage.contains("separate lineages"), g.getMessage)
  }

  test("mediadedup rotation-tier image-hash = dct: blur+JPEG rotated twins " +
      "outside the dHash envelope collapse through the probed dihedral-dct " +
      "lineage; its fingerprint line keeps the kernels apart; crop+dct " +
      "stays refused (the measured negative)") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.llm.Multimodal
    import spark.implicits._
    val base = tmp()
    def png(s: Long) = Multimodal.encodePng(Multimodal.texturedImage(s))
    def rotDegraded(s: Long) = {
      val d = Multimodal.ImageIoDecoder.decode(png(s), Map.empty)
      Multimodal.jpegBytesAtQuality(
        Multimodal.boxBlur3(Multimodal.dihedral(d, 1)), 0.3f)
    }
    val src = base.resolve("rdct_src").toString
    // twins of seeds 0 and 19 measure dHash min-witness 6 and 7 — both
    // OUTSIDE the dHash tier's radius 3; pHash holds them at 0
    ((0L until 20L).map(s => s -> png(s)) ++
      Seq(0L, 19L).map(s => (s + 100000L) -> rotDegraded(s)))
      .toDF("asset_id", "content")
      .withColumn("meta", lit(null).cast("map<string,string>"))
      .write.parquet(src)
    val st = base.resolve("rdct_st").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("rdct.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  target { storage-type = local, dataset-dir = ${base.resolve("rdct_out")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  rotation-tier = true
         |  image-hash = dct
         |  mode = filter
         |  state-out-dir = $st
         |}
         |""".stripMargin)))
    // NO bands/max-hamming/probe knobs above: the dihedral-dct lineage
    // must default to the probed radius-7 geometry
    val kept = spark.read.parquet(base.resolve("rdct_out").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 20L).toSet,
      s"blur+JPEG rotated twins must collapse onto their originals: $kept")
    assert(scala.io.Source.fromFile(s"$st/fingerprint", "UTF-8").mkString.trim ==
      "image-dihedral-dct|bands=4|maxHamming=7")
    // the incremental tier rides the same lineage: a degraded rotated
    // arrival of stored plate 5 drops, a fresh plate lands
    val src2 = base.resolve("rdct_src2").toString
    Seq((300005L, rotDegraded(5L)), (777L, png(777L)))
      .toDF("asset_id", "content")
      .withColumn("meta", lit(null).cast("map<string,string>"))
      .write.parquet(src2)
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("rdct2.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src2 }
         |  target { storage-type = local, dataset-dir = ${base.resolve("rdct_out2")}, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  rotation-tier = true
         |  image-hash = dct
         |  mode = filter
         |  state-dir = $st
         |  state-out-dir = ${base.resolve("rdct_st2")}
         |}
         |""".stripMargin)))
    val kept2 = spark.read.parquet(base.resolve("rdct_out2").toString)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(777L),
      s"the degraded rotated arrival must drop against dihedral-dct state: $kept2")
    // a dHash dihedral run cannot consume the dct lineage
    val drift = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("rdct_drift.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src2 }
           |  modality = image
           |  rotation-tier = true
           |  mode = report
           |  state-dir = $st
           |}
           |""".stripMargin)))
    }
    assert(drift.getMessage.contains("image-dihedral-dct"), drift.getMessage)
    // crop + dct: the measured negative stays a loud refusal
    val crop = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("rdct_crop.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  crop-tier = true
           |  image-hash = dct
           |  mode = report
           |}
           |""".stripMargin)))
    }
    assert(crop.getMessage.contains("NEITHER kernel"), crop.getMessage)
  }

  test("mediadedup calibrate mode + card-dir: per-corpus twin/stranger " +
      "Hamming evidence lands first, the separation gate trips on a radius " +
      "that cannot separate; the data card rides any mode") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    val src = base.resolve("cal_media").toString
    Multimodal.reencodeAsSmoothImage(
      Multimodal.asMediaTable(
        spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 40),
        "doc_id", "text", "image", Map.empty), jpeg = false)
      .write.parquet(src)
    val rep = base.resolve("cal_rep").toString
    val card = base.resolve("cal_card").toString
    def conf(name: String, radius: Int, extra: String = "") =
      write(base.resolve(s"cal_$name.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  mode = calibrate
           |  max-hamming = $radius
           |  calibrate-sample = 30
           |  calibrate-report-dir = $rep
           |$extra
           |}
           |""".stripMargin)
    // the q129 radius separates this corpus: JPEG twins within 3 bits,
    // strangers beyond — the run PASSES with the gate on
    graft.cli.MediaDedup.main(Array("--conf",
      conf("ok", 3, s"  calibrate-require-separation = true\n  card-dir = $card\n")))
    val rows = spark.read.parquet(rep).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val twins = rows.filter(_._1 == "twin")
    val strangers = rows.filter(_._1 == "stranger")
    assert(twins.map(_._3).sum == 30L, s"one twin distance per sampled asset: ${twins.toSeq}")
    assert(strangers.map(_._3).sum == 30L * 29 / 2, "all sampled stranger pairs")
    assert(twins.map(_._2).max <= 3 && strangers.map(_._2).min > 3,
      s"the evidence itself must show the separation: ${rows.toSeq}")
    // the card rode along
    val cardRow = spark.read.parquet(card).head()
    assert(cardRow.getAs[Long]("n_assets") == 40L &&
      cardRow.getAs[Long]("n_decode_failed") == 0L)
    // a radius of 0 cannot separate (JPEG twins drift) -> report still
    // lands, THEN the gate trips
    spark.read.parquet(rep).count() // warm check below re-reads
    val e = intercept[IllegalStateException] {
      graft.cli.MediaDedup.main(Array("--conf",
        conf("bad", 0, "  calibrate-require-separation = true\n")))
    }
    assert(e.getMessage.contains("does not separate"), e.getMessage)
    assert(spark.read.parquet(rep).count() > 0, "report-then-gate")
    // calibrate-report-dir is required in calibrate mode
    val g = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("cal_norep.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  mode = calibrate
           |}
           |""".stripMargin)))
    }
    assert(g.getMessage.contains("calibrate-report-dir"), g.getMessage)

    // ---- max-hamming = auto closes the loop: filter mode derives the
    // radius from the calibration report above (max-margin midpoint of
    // the twin/stranger gap) and that radius separates THIS corpus —
    // exactly the planted JPEG twins drop, every original survives
    val twinSrc = base.resolve("cal_twin_media").toString
    val plates = spark.read.parquet(src)
    plates.unionByName(
      Multimodal.reencodeAsSmoothImage(
          plates.filter(col("asset_id") < 20), jpeg = true, seedCol = "asset_id")
        .withColumn("asset_id", col("asset_id") + 100000))
      .write.parquet(twinSrc)
    val autoOut = base.resolve("cal_auto_out").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("cal_auto.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $twinSrc }
         |  target { storage-type = local, dataset-dir = $autoOut, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  mode = filter
         |  max-hamming = auto
         |  calibrate-report-dir = $rep
         |}
         |""".stripMargin)))
    val surv = spark.read.parquet(autoOut).select("asset_id")
      .collect().map(_.getLong(0))
    assert(surv.length == 40 && !surv.exists(_ >= 100000L),
      s"auto radius must drop exactly the 20 planted twins: ${surv.sorted.toSeq}")
    // auto in calibrate mode is circular and rejected
    val circ = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf",
        write(base.resolve("cal_auto_circ.conf"),
          s"""media-dedup {
             |  source { storage-type = local, dataset-dir = $src }
             |  modality = image
             |  mode = calibrate
             |  max-hamming = auto
             |  calibrate-report-dir = $rep
             |}
             |""".stripMargin)))
    }
    assert(circ.getMessage.contains("CONSUMES"), circ.getMessage)
    // auto without a report dir is rejected up front
    val norep = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("cal_auto_norep.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $twinSrc }
           |  modality = image
           |  mode = report
           |  max-hamming = auto
           |}
           |""".stripMargin)))
    }
    assert(norep.getMessage.contains("calibrate-report-dir"), norep.getMessage)
    // a report with NO separating gap fails loudly instead of picking a
    // radius that would silently false-drop or miss
    val badRep = base.resolve("cal_bad_rep").toString
    locally {
      import spark.implicits._
      Seq(("twin", 5, 1L), ("stranger", 3, 1L)).toDF("kind", "hamming", "n_pairs")
        .write.parquet(badRep)
    }
    val nogap = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("cal_auto_nogap.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $twinSrc }
           |  modality = image
           |  mode = report
           |  max-hamming = auto
           |  calibrate-report-dir = $badRep
           |}
           |""".stripMargin)))
    }
    assert(nogap.getMessage.contains("NO separating gap"), nogap.getMessage)
  }

  test("mediadedup image-hash = dct256: the WIDE lineage defaults to its own " +
      "16x16-bit radius-15 geometry, drops degraded twins, runs the full " +
      "incremental state protocol, and keeps its 256-bit state apart by " +
      "fingerprint line") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    val media = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 40),
      "doc_id", "text", "image", Map.empty)
    // 40 wide-spectrum plates + 20 blur+JPEG-q30 twins under id+100000
    // (measured wide envelope: twin max 10 vs stranger min 98)
    val src = base.resolve("w_media").toString
    Multimodal.reencodeAsTexturedImageWide(media)
      .unionByName(Multimodal.reencodeAsTexturedImageWideDegraded(
          media.filter(col("asset_id") < 20))
        .withColumn("asset_id", col("asset_id") + 100000))
      .write.parquet(src)
    // NO bands/max-hamming knobs: dct256 must default to ITS geometry
    // (radius 15 / 16 bands / probe 0), not inherit a 64-bit one
    val out = base.resolve("w_out").toString
    val stOut = base.resolve("w_st").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("w.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  image-hash = dct256
         |  mode = filter
         |  state-out-dir = $stOut
         |}
         |""".stripMargin)))
    val surv = spark.read.parquet(out).select("asset_id").collect().map(_.getLong(0))
    assert(surv.length == 40 && !surv.exists(_ >= 100000L),
      s"wide lineage must drop exactly the 20 degraded twins: ${surv.sorted.toSeq}")
    // the state carries the width-versioned fingerprint line and the
    // wide sig schema (array<bigint>), plus mergeable hotcounts + hot
    val fpLine = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(stOut, "fingerprint")), "UTF-8").trim
    assert(fpLine == "image-dct256|sigBits=256|bands=16|maxHamming=15", fpLine)
    val stSigs = spark.read.parquet(s"$stOut/sigs")
    // parquet round-trips arrays containsNull-relaxed — element type is
    // the contract
    assert(stSigs.schema("sig").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.LongType)
    assert(stSigs.count() == 40)
    // INCREMENTAL: a second batch of degraded echoes of stored plates
    // + fresh wide plates — echoes drop against the persisted state
    // (hot guard from the persisted counts), fresh survive
    val media2 = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") >= 20 && col("doc_id") < 30),
      "doc_id", "text", "image", Map.empty)
    val src2 = base.resolve("w_media2").toString
    Multimodal.reencodeAsTexturedImageWideDegraded(media2)
      .withColumn("asset_id", col("asset_id") + 300000) // echoes of 20..29
      .unionByName(Multimodal.reencodeAsTexturedImageWide(
          media2.withColumn("asset_id", col("asset_id") + 500000))) // fresh seeds
      .write.parquet(src2)
    val out2 = base.resolve("w_out2").toString
    val stOut2 = base.resolve("w_st2").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("w2.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src2 }
         |  target { storage-type = local, dataset-dir = $out2, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  image-hash = dct256
         |  mode = filter
         |  state-dir = $stOut
         |  state-out-dir = $stOut2
         |}
         |""".stripMargin)))
    val surv2 = spark.read.parquet(out2).select("asset_id").collect().map(_.getLong(0))
    assert(surv2.forall(_ >= 500000L) && surv2.length == 10,
      s"echoes of stored plates must drop, fresh survive: ${surv2.sorted.toSeq}")
    assert(spark.read.parquet(s"$stOut2/sigs").count() == 50)
    // a 64-bit dct run refuses the wide state by fingerprint line
    val fp = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("w_fp.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  image-hash = dct
           |  mode = report
           |  state-dir = $stOut
           |}
           |""".stripMargin)))
    }
    assert(fp.getMessage.contains("image-dct256"), fp.getMessage)
    // wide is the SCALAR lineage — no dihedral/crop composition knob
    val tier = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("w_tier.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  image-hash = dct256
           |  rotation-tier = true
           |  mode = report
           |}
           |""".stripMargin)))
    }
    assert(tier.getMessage.contains("SCALAR wide lineage"), tier.getMessage)
    // the streaming arrival filter refuses the wide lineage loudly
    // (64-bit kernels only — the fingerprint line is the gate)
    val arr = intercept[IllegalArgumentException] {
      graft.cli.Streamer.main(Array("--conf", write(base.resolve("w_arr.conf"),
        s"""streaming {
           |  events-dir = $src
           |  target-dir = ${base.resolve("w_arr_out")}
           |  checkpoint-location = ${base.resolve("w_arr_ckpt")}
           |  operation = media-near-dedup
           |  state-dir = $stOut
           |  shuffle-partitions = 4
           |}
           |""".stripMargin)))
    }
    assert(arr.getMessage.contains("SCALAR fingerprints"), arr.getMessage)
  }

  test("mediadedup image-hash = dct: blur+requantized twins outside dHash's " +
      "radius drop through the DCT lineage; the state fingerprint keeps the " +
      "kernels apart") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    val media = Multimodal.asMediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 40),
      "doc_id", "text", "image", Map.empty)
    // 40 textured PNG plates + 20 blur+JPEG-q30 twins under id+100000 —
    // the degradation the per-seed probe measured: 11 of these 20 twins
    // sit OUTSIDE dHash radius 3 while all 20 stay within pHash 2
    val src = base.resolve("dct_media").toString
    Multimodal.reencodeAsTexturedImage(media)
      .unionByName(Multimodal.reencodeAsTexturedImageDegraded(
          media.filter(col("asset_id") < 20))
        .withColumn("asset_id", col("asset_id") + 100000))
      .write.parquet(src)
    // the dct lineage at the probe's radius drops ALL planted twins
    val out = base.resolve("dct_out").toString
    val stOut = base.resolve("dct_st").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("dct.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  image-hash = dct
         |  mode = filter
         |  state-out-dir = $stOut
         |}
         |""".stripMargin)))
    // NO bands/max-hamming knobs above: the dct kernel must DEFAULT to
    // its own geometry (radius 7 / 8 bands — the measured pHash twin
    // envelope), not inherit dHash's — a dHash-geometry default here
    // silently misses the very twins the tier exists for
    val surv = spark.read.parquet(out).select("asset_id").collect().map(_.getLong(0))
    assert(surv.length == 40 && !surv.exists(_ >= 100000L),
      s"dct lineage must drop exactly the 20 degraded twins: ${surv.sorted.toSeq}")
    // the dHash scalar kernel at ITS radius measurably misses twins on
    // this corpus — the knob's reason to exist, pinned at the CLI level
    val dhOut = base.resolve("dh_out").toString
    graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("dh.conf"),
      s"""media-dedup {
         |  source { storage-type = local, dataset-dir = $src }
         |  target { storage-type = local, dataset-dir = $dhOut, dataset-store-format = parquet, write-mode = overwrite }
         |  modality = image
         |  mode = filter
         |}
         |""".stripMargin)))
    val dhSurv = spark.read.parquet(dhOut).select("asset_id").collect().map(_.getLong(0))
    assert(dhSurv.count(_ >= 100000L) > 0,
      "expected dHash radius 3 to miss blur twins on the textured corpus")
    // the dct state carries its own fingerprint line: a dHash run
    // refuses it loudly instead of silently under-matching
    val fp = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("dct_fp.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  mode = report
           |  state-dir = $stOut
           |}
           |""".stripMargin)))
    }
    assert(fp.getMessage.contains("image-dct"), fp.getMessage)
    // dct is the SCALAR lineage — tier states are dHash kernels
    val tier = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("dct_tier.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = image
           |  image-hash = dct
           |  crop-tier = true
           |  mode = report
           |}
           |""".stripMargin)))
    }
    assert(tier.getMessage.contains("SCALAR image lineage"), tier.getMessage)
    // and the kernel knob is image-only
    val mod = intercept[IllegalArgumentException] {
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve("dct_mod.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  modality = audio
           |  image-hash = dct
           |  mode = report
           |}
           |""".stripMargin)))
    }
    assert(mod.getMessage.contains("image kernel"), mod.getMessage)
    // the dct lineage feeds the streaming arrival filter end to end:
    // the state line's modality selects the pHash kernel column
    // (graft_media_hash 'image-dct') AND supplies the lineage's own
    // radius/bands as defaults (7/8 here — the hand-typed dHash
    // defaults would silently under-match), so a blur+requantized
    // arrival of a stored plate drops at the door
    import org.apache.spark.sql.functions.timestamp_micros
    import spark.implicits._
    val landing = base.resolve("dct_landing").toString
    Seq(
      (910001L, Multimodal.jpegBytesAtQuality(
        Multimodal.boxBlur3(Multimodal.texturedImage(5L)), 0.3f), 1L),
      (910002L, Multimodal.encodePng(Multimodal.texturedImage(450L)), 2L)
    ).toDF("asset_id", "content", "ts")
      .withColumn("ts", timestamp_micros(col("ts") * 3600L * 1000000L))
      .write.parquet(landing)
    val arrOut = base.resolve("dct_arrivals").toString
    graft.cli.Streamer.main(Array("--conf", write(base.resolve("dct_arr.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $arrOut
         |  checkpoint-location = ${base.resolve("dct_arr_ckpt")}
         |  operation = media-near-dedup
         |  state-dir = $stOut
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)))
    val arrIds = spark.read.parquet(arrOut).select("asset_id")
      .as[Long].collect().toSet
    assert(arrIds == Set(910002L),
      s"the degraded arrival of a stored plate must drop through the dct " +
        s"kernel at the state's own radius: $arrIds")
  }

  test("streamer media-near-dedup-cluster: in-batch and cross-batch degraded " +
      "image twins collapse through the DCT kernel; the state feeds the " +
      "arrival filter") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import graft.llm.Multimodal
    import spark.implicits._
    val base = tmp()
    def png(seed: Long) = Multimodal.encodePng(Multimodal.texturedImage(seed))
    def degraded(seed: Long) = Multimodal.jpegBytesAtQuality(
      Multimodal.boxBlur3(Multimodal.texturedImage(seed)), 0.3f)
    val landing = base.resolve("mc_landing").toString
    def land(rows: Seq[(Long, Array[Byte])]): Unit =
      rows.toDF("asset_id", "content")
        .withColumn("ts", timestamp_micros(col("asset_id") * 1000000L))
        .write.mode("append").parquet(landing)
    // batch 1: 10 textured plates + an in-batch blur+JPEG-q30 twin of
    // plate 0 under a higher id — outside dHash's radius, inside pHash 7
    land((0L until 10L).map(s => s -> png(s)) :+ (100000L -> degraded(0L)))
    val out = base.resolve("mc_out").toString
    val state = base.resolve("mc_state").toString
    val conf = write(base.resolve("mc.conf"),
      s"""streaming {
         |  events-dir = $landing
         |  target-dir = $out
         |  checkpoint-location = ${base.resolve("mc_ckpt")}
         |  operation = media-near-dedup-cluster
         |  modality = image
         |  image-hash = dct
         |  cluster-state-dir = $state
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)
    graft.cli.Streamer.main(Array("--conf", conf))
    val b0 = spark.read.parquet(s"$out/batch-0").select("asset_id")
      .as[Long].collect().toSet
    assert(b0 == (0L until 10L).toSet,
      s"the in-batch degraded twin must collapse to the lower id: $b0")
    // batch 2 (same checkpoint): fresh plates + a degraded echo of
    // plate 1 — near the ACCRETED state, drops vs-corpus
    land(Seq(10L -> png(10L), 11L -> png(11L), 100001L -> degraded(1L)))
    graft.cli.Streamer.main(Array("--conf", conf))
    val b1 = spark.read.parquet(s"$out/batch-1").select("asset_id")
      .as[Long].collect().toSet
    assert(b1 == Set(10L, 11L),
      s"the cross-batch echo must drop against accreted state: $b1")
    // the cluster state dir IS a media-near-dedup state: the stateless
    // arrival filter consumes it directly (kernel + radius/bands from
    // the fingerprint line) and drops a degraded echo of a survivor
    val landing2 = base.resolve("mc_arr").toString
    Seq((200001L, degraded(11L), 1L), (200002L, png(300L), 2L))
      .toDF("asset_id", "content", "ts")
      .withColumn("ts", timestamp_micros(col("ts") * 3600L * 1000000L))
      .write.parquet(landing2)
    val arrOut = base.resolve("mc_arr_out").toString
    graft.cli.Streamer.main(Array("--conf", write(base.resolve("mc_arr.conf"),
      s"""streaming {
         |  events-dir = $landing2
         |  target-dir = $arrOut
         |  checkpoint-location = ${base.resolve("mc_arr_ckpt")}
         |  operation = media-near-dedup
         |  state-dir = $state
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)))
    val arr = spark.read.parquet(arrOut).select("asset_id")
      .as[Long].collect().toSet
    assert(arr == Set(200002L),
      s"the arrival echo must drop via the cluster state: $arr")
    // video is scalar-incompatible and pointed at the batch increment
    val vid = intercept[IllegalArgumentException] {
      graft.cli.Streamer.main(Array("--conf", write(base.resolve("mc_vid.conf"),
        s"""streaming {
           |  events-dir = $landing
           |  target-dir = ${base.resolve("mc_x")}
           |  checkpoint-location = ${base.resolve("mc_xc")}
           |  operation = media-near-dedup-cluster
           |  modality = video
           |  cluster-state-dir = ${base.resolve("mc_xs")}
           |}
           |""".stripMargin)))
    }
    assert(vid.getMessage.contains("SCALAR"), vid.getMessage)
    // verify-pairs: signatures nominate, pixels CONFIRM — an absurdly
    // strict bar rejects the blur+JPEG twin (its pixel diff is real),
    // the default bar confirms it
    def vconf(name: String, extra: String) = write(base.resolve(s"$name.conf"),
      s"""streaming {
         |  events-dir = ${base.resolve(s"${name}_land")}
         |  target-dir = ${base.resolve(s"${name}_out")}
         |  checkpoint-location = ${base.resolve(s"${name}_ckpt")}
         |  operation = media-near-dedup-cluster
         |  modality = image
         |  image-hash = dct
         |  cluster-state-dir = ${base.resolve(s"${name}_state")}
         |  verify-pairs = true
         |$extra
         |  shuffle-partitions = 4
         |}
         |""".stripMargin)
    for ((name, bar, wantDrop) <- Seq(
        ("vstrict", "  max-mean-diff = 0.000001\n", false),
        ("vloose", "", true))) {
      Seq(5L -> png(5L), 100005L -> degraded(5L))
        .toDF("asset_id", "content")
        .withColumn("ts", timestamp_micros(col("asset_id")))
        .write.parquet(base.resolve(s"${name}_land").toString)
      graft.cli.Streamer.main(Array("--conf", vconf(name, bar)))
      val kept = spark.read.parquet(s"${base.resolve(s"${name}_out")}/batch-0")
        .select("asset_id").as[Long].collect().toSet
      if (wantDrop) assert(kept == Set(5L),
        s"$name: confirmed twin must drop: $kept")
      else assert(kept == Set(5L, 100005L),
        s"$name: unconfirmed nomination must NOT drop: $kept")
    }
    // a restart that swaps the seed dir is refused (the line alone
    // cannot see that drift)
    val swap = intercept[IllegalArgumentException] {
      graft.cli.Streamer.main(Array("--conf", write(base.resolve("mc_swap.conf"),
        s"""streaming {
           |  events-dir = $landing
           |  target-dir = $out
           |  checkpoint-location = ${base.resolve("mc_ckpt")}
           |  operation = media-near-dedup-cluster
           |  modality = image
           |  image-hash = dct
           |  cluster-state-dir = $state
           |  state-dir = $state
           |}
           |""".stripMargin)))
    }
    assert(swap.getMessage.contains("never swaps its seed"), swap.getMessage)
  }

  test("differ over media fingerprint state: a shifted media batch shows as " +
      "sig-histogram drift and breaches the gate; an identical batch does not") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Multimodal
    val base = tmp()
    // two MediaDedup state dirs: plates 0..19 vs plates 10..29 (half
    // the corpus replaced — the nightly drift shape)
    def seed(name: String, lo: Int, hi: Int): String = {
      val src = base.resolve(s"dm_src_$name").toString
      Multimodal.reencodeAsSmoothImage(
        Multimodal.asMediaTable(
          spark.read.parquet(s"$sfDir/documents.parquet")
            .filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", "text", "image", Map.empty), jpeg = false)
        .write.parquet(src)
      val st = base.resolve(s"dm_state_$name").toString
      graft.cli.MediaDedup.main(Array("--conf", write(base.resolve(s"dm_$name.conf"),
        s"""media-dedup {
           |  source { storage-type = local, dataset-dir = $src }
           |  target { storage-type = local, dataset-dir = ${base.resolve(s"dm_out_$name")}, dataset-store-format = parquet, write-mode = overwrite }
           |  modality = image
           |  mode = filter
           |  state-out-dir = $st
           |}
           |""".stripMargin)))
      st
    }
    val stA = seed("a", 0, 20)
    val stB = seed("b", 10, 30)
    val rep = base.resolve("dm_rep").toString
    def diffConf(name: String, cur: String, refc: String, gate: String) =
      write(base.resolve(s"dmdiff_$name.conf"),
        s"""source { storage-type = local, dataset-dir = $cur/sigs }
           |reference { storage-type = local, dataset-dir = $refc/sigs }
           |diff {
           |  discrete-columns = [sig]
           |  report-dir = $rep
           |$gate
           |}
           |""".stripMargin)
    // identical fingerprint table: zero drift, gate passes
    graft.cli.Differ.main(Array("--conf", diffConf("same", stA, stA, "  max-drift = 0.01")))
    val same = spark.read.parquet(rep).head()
    assert(same.getAs[Double]("drift") == 0.0)
    // half the assets replaced: TVD ~0.5 over the sig histogram — the
    // report lands, then the gate breaches
    val e = intercept[IllegalStateException] {
      graft.cli.Differ.main(Array("--conf", diffConf("moved", stB, stA, "  max-drift = 0.2")))
    }
    assert(e.getMessage.contains("distribution moved"), e.getMessage)
    val moved = spark.read.parquet(rep).head()
    assert(moved.getAs[Double]("drift") > 0.4 && moved.getAs[Double]("drift") < 0.6,
      s"10 of 20 fingerprints replaced: ${moved.getAs[Double]("drift")}")
  }

  test("curator fim-rate without chunking: doc-level n_tokens is recounted " +
      "over the emitted sentinel-bearing text, never left describing the " +
      "pre-FIM document; degenerate sentinels refuse before any corpus pass") {
    import org.apache.spark.sql.functions.{col, length, size, split}
    val base = tmp()
    val out = base.resolve("fim_doc").toString
    graft.cli.Curator.main(Array("--conf", write(base.resolve("fd.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  fim-rate = 1.0
         |}
         |""".stripMargin)))
    val rows = spark.read.parquet(out)
    assert(rows.filter(!col("fim_applied")).count() == 0)
    // every row's n_tokens equals the annotate pass's own definition
    // (TextAnalysis.stats) applied to the text actually emitted
    def statCount(c: org.apache.spark.sql.Column) =
      graft.llm.TextAnalysis.stats(c).getField("n_tokens")
    val bad = rows.filter(col("n_tokens") =!= statCount(col("text"))).count()
    assert(bad == 0, s"$bad rows carry an n_tokens that does not describe " +
      "the emitted FIM text")
    // and the recount is real: cuts split words, so some rows' counts
    // moved vs the pre-FIM annotate pass
    val pre = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), statCount(col("text")).as("pre_n"))
    val moved = rows.select(col("doc_id"), col("n_tokens"))
      .join(pre, Seq("doc_id"))
      .filter(col("n_tokens") =!= col("pre_n")).count()
    assert(moved > 0, "fixture must exercise the recount (no cut split a token?)")
    // an empty sentinel must refuse up front — before the collision
    // count aggregate could burn a corpus pass on contains("")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", write(base.resolve("fd_bad.conf"),
        s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
           |target { storage-type = local, dataset-dir = ${base.resolve("x")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  fim-rate = 1.0
           |  fim-prefix-token = ""
           |}
           |""".stripMargin)))
    }
    assert(e.getMessage.contains("whitespace-free"), e.getMessage)
  }

  test("curator fim-rate: each chunk becomes a sentinel-delimited PSM " +
      "infilling example that reassembles to the untransformed chunk, the " +
      "sentinels export as their single fixed ids, misconfigs fail loudly") {
    import org.apache.spark.sql.functions.{col, explode}
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.llm.BpeTrainer.learnMerges(docs, "text", numMerges = 32)
    val mPath = base.resolve("merges.txt").toString
    val vPath = base.resolve("vocab.txt").toString
    graft.llm.BpeTrainer.saveMerges(spark, mPath, merges)
    val sentinels = Seq("<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>")
    val vocab = graft.llm.BpeTrainer.buildVocab(docs, "text", merges) ++ sentinels
    graft.llm.BpeTrainer.saveVocab(spark, vPath, vocab)
    val sentinelIds = sentinels.map(sp => sp -> vocab.indexOf(sp)).toMap
    def conf(out: String, name: String, extra: String) = write(base.resolve(name),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  chunk-size = 32
         |  bpe-merges = $mPath
         |  bpe-vocab = $vPath
         |$extra
         |}
         |""".stripMargin)
    // baseline: same curation, FIM off — the reassembly comparator
    val flat = base.resolve("flat").toString
    graft.cli.Curator.main(Array("--conf", conf(flat, "f0.conf", "")))
    // FIM on at rate 1.0, sentinels declared protected
    val out = base.resolve("fim").toString
    graft.cli.Curator.main(Array("--conf", conf(out, "f1.conf",
      s"""  fim-rate = 1.0
         |  bpe-special-tokens = ["<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"]""".stripMargin)))
    val fimRows = spark.read.parquet(out)
    assert(fimRows.count() > 0)
    assert(fimRows.filter(!col("fim_applied")).count() == 0)
    // reassembly per (doc, chunk) against the FIM-off baseline
    val baseline = spark.read.parquet(flat)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text").as("orig"))
    val joined = fimRows.select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .join(baseline, Seq("doc_id", "chunk_id")).collect()
    assert(joined.length == fimRows.count())
    joined.foreach { r =>
      val s = r.getAs[String]("chunk_text")
      assert(s.startsWith("<|fim_prefix|>"), s)
      val sufAt = s.indexOf("<|fim_suffix|>")
      val midAt = s.indexOf("<|fim_middle|>")
      assert(sufAt >= 0 && midAt > sufAt, s)
      val prefix = s.substring("<|fim_prefix|>".length, sufAt)
      val suffix = s.substring(sufAt + "<|fim_suffix|>".length, midAt)
      val middle = s.substring(midAt + "<|fim_middle|>".length)
      assert(prefix + middle + suffix == r.getAs[String]("orig"),
        s"reassembly broke for (${r.getAs[Long]("doc_id")}, ${r.getAs[Long]("chunk_id")})")
    }
    // every sentinel encodes to its single fixed vocab id, once per row
    val n = fimRows.count()
    sentinels.foreach { sp =>
      assert(fimRows.select(explode(col("token_ids")).as("i"))
        .filter(col("i") === sentinelIds(sp)).count() == n,
        s"sentinel $sp must emit exactly one fixed id per row")
    }
    // misconfig 1: token-id export without the sentinels declared special
    val e1 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(base.resolve("x1").toString, "x1.conf", "  fim-rate = 1.0")))
    }
    assert(e1.getMessage.contains("bpe-special-tokens"), e1.getMessage)
    // misconfig 2: whitespace in an overridden sentinel
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf",
        conf(base.resolve("x2").toString, "x2.conf",
          "  fim-rate = 1.0\n  fim-prefix-token = \"<|fim pre|>\"")))
    }
    assert(e2.getMessage.contains("whitespace-free"), e2.getMessage)
    // misconfig 3: FIM + unigram id export must trip the FIM-specific
    // refusal (no protected-specials path on that encoder). The conf
    // carries NO bpe-* knobs — with any of those the earlier
    // unigram/bpe mutual-exclusion require fires first and this
    // refusal would never be exercised — and the dummy model path
    // proves the refusal is up-front (never opened).
    val e3 = intercept[IllegalArgumentException] {
      graft.cli.Curator.main(Array("--conf", write(base.resolve("x3.conf"),
        s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
           |target { storage-type = local, dataset-dir = ${base.resolve("x3")}, dataset-store-format = parquet, write-mode = overwrite }
           |curation {
           |  fim-rate = 1.0
           |  unigram-model = ${base.resolve("no_such_model.tsv")}
           |  pack-seq-len = 128
           |}
           |""".stripMargin)))
    }
    assert(e3.getMessage.contains("fim-rate is not supported with unigram"),
      e3.getMessage)
  }

  test("curator fim-rate after byte-budget chunking: chunk_tokens recounts " +
      "in PRETOKENS (the byte chunker's own unit, specials atomic), not " +
      "whitespace tokens (advice finding)") {
    import org.apache.spark.sql.functions.col
    val base = tmp()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.llm.BpeTrainer.learnByteMerges(docs, "text", numMerges = 32)
    val mPath = base.resolve("bmerges.txt").toString
    val vPath = base.resolve("bvocab.txt").toString
    val sentinels = Seq("<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>")
    graft.llm.BpeTrainer.saveMerges(spark, mPath, merges)
    graft.llm.BpeTrainer.saveVocab(spark, vPath,
      graft.llm.BpeTrainer.buildByteVocab(merges) ++ sentinels)
    val out = base.resolve("bfim").toString
    graft.cli.Curator.main(Array("--conf", write(base.resolve("bfim.conf"),
      s"""source { storage-type = local, dataset-dir = $sfDir/documents.parquet }
         |target { storage-type = local, dataset-dir = $out, dataset-store-format = parquet, write-mode = overwrite }
         |curation {
         |  bpe-merges = $mPath
         |  bpe-vocab = $vPath
         |  bpe-byte-level = true
         |  bpe-budget = 48
         |  chunk-overlap = 0
         |  fim-rate = 1.0
         |  bpe-special-tokens = ["<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"]
         |}
         |""".stripMargin)))
    val rows = spark.read.parquet(out)
    assert(rows.count() > 0)
    assert(rows.filter(!col("fim_applied")).count() == 0)
    // the recounted column must be the byte chunker's unit: pretokens
    // with the declared sentinels atomic — a whitespace recount
    // disagrees on every sentinel-glued boundary
    val drift = rows.filter(col("chunk_tokens") =!=
      graft.functions.GraftFunctions.pretokenCount(
        col("chunk_text"), sentinels).cast("long")).count()
    assert(drift == 0, s"$drift FIM rows recounted in the wrong unit")
    // and it genuinely differs from the old whitespace recount on a
    // meaningful fraction of rows (the bug this pins was silent)
    val ws = org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.filter(
        org.apache.spark.sql.functions.split(col("chunk_text"), "\\s+"),
        t => org.apache.spark.sql.functions.length(t) > 0)).cast("long")
    assert(rows.filter(col("chunk_tokens") =!= ws).count() > 0,
      "fixture too weak: pretoken and whitespace counts agree everywhere")
  }
}
