package graft

import org.apache.spark.sql.functions._
import graft.llm.Curation

/** End-to-end curation over documents + planted noise. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  /** documents + an exact copy, a near copy, and a garbage doc. */
  private lazy val noisy = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val exactCopy = base.filter(col("doc_id") === 0)
      .select((col("doc_id") + 50000).as("doc_id"), col("text"))
    val nearCopy = base.filter(col("doc_id") === 1)
      .select((col("doc_id") + 60000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val garbage = Seq((70000L, "$$$ ### @@@ !!! %%% ^^^ &&& *** ((( )))")).toDF("doc_id", "text")
    base.union(exactCopy).union(nearCopy).union(garbage).cache()
  }

  test("minDeflateRatio drops a planted template doc, keeps prose, off by default") {
    val template = Seq((80000L,
      Array.fill(40)("click here to win a free prize now").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 20)
      .union(template)
    val kept = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minQuality = 0.0, minDeflateRatio = 0.25))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(80000L), "the template must deflate below the floor")
    assert(kept.exists(_ < 20), "prose must survive the floor")
    // default (0.0) = off: the template rides through
    val keptOff = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minQuality = 0.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptOff.contains(80000L))
  }

  test("annotate adds scan-speed signal columns without shuffle") {
    val out = Curation.annotate(noisy, "text")
    assert(Seq("quality", "lang_id", "n_tokens").forall(out.columns.contains))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("curate drops garbage, exact dup, and near dup; keeps originals") {
    val curated = Curation.curate(noisy, "doc_id", "text",
      Curation.Config(minQuality = 0.3, nearDupMaxJaccardDistance = 0.5, nearDupMinJaccard = 0.5))
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(70000L), "garbage survived the quality filter")
    assert(!ids.contains(50000L), "exact duplicate survived")
    assert(!ids.contains(60000L), "near duplicate survived")
    assert(ids.contains(0L) && ids.contains(1L), "originals must survive")
    assert(curated.columns.contains("quality")) // annotations carried through
  }

  test("report counts monotonically decrease per stage") {
    val r = Curation.report(noisy, "doc_id", "text",
      Curation.Config(minQuality = 0.3, nearDupMaxJaccardDistance = 0.5, nearDupMinJaccard = 0.5))
    assert(r("input") == noisy.count())
    assert(r("after_quality") < r("input"))
    assert(r("curated") <= r("after_quality"))
    assert(r("curated") > 0)
  }

  test("transitive near-dups: chain keeps one survivor, pair-drop keeps endpoints") {
    // A(1) ~ MID(5000) and B(2) ~ MID, but A !~ B: a chain through the
    // highest id. Pair-drop removes only id2 (=5000) of each verified
    // pair and keeps BOTH endpoints; connected components collapses the
    // cluster to its min id.
    // measured: J(a,mid)=J(b,mid)=0.90, J(a,b)=0.81 — the verify
    // threshold 0.85 sits between them, so only the mid pairs verify
    val words = (0 until 40).map(i => s"word$i")
    val mid = words.mkString(" ")
    val a = ("xx yy" +: words.drop(2)).mkString(" ")
    val b = (words.take(38) :+ "zz ww").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (5000L, mid)).toDF("doc_id", "text")
    val conf = Curation.Config(minQuality = 0.0, nearDupStrategy = "minhash",
      nearDupMaxJaccardDistance = 0.3, nearDupMinJaccard = 0.85)
    val pairDrop = Curation.curate(docs, "doc_id", "text", conf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pairDrop == Set(1L, 2L), s"pair-drop kept $pairDrop")
    val cc = Curation.curate(docs, "doc_id", "text", conf.copy(transitiveNearDups = true))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cc == Set(1L), s"transitive resolution kept $cc")
  }

  test("keepPolicy best-quality keeps the highest-quality cluster member") {
    // same chain shape as above (1 ~ 5000 ~ 2, 1 !~ 2), but doc 2's two
    // distinctive tokens are English stopwords, boosting its quality
    // score above the others — so the two policies pick DIFFERENT
    // survivors and the test discriminates
    val words = (0 until 40).map(i => s"word$i")
    val mid = words.mkString(" ")
    val a = ("xx yy" +: words.drop(2)).mkString(" ")
    val b = (words.take(38) :+ "the of").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (5000L, mid)).toDF("doc_id", "text")
    val conf = Curation.Config(minQuality = 0.0, nearDupStrategy = "minhash",
      nearDupMaxJaccardDistance = 0.3, nearDupMinJaccard = 0.85,
      transitiveNearDups = true)
    val q = Curation.annotate(docs, "text").select("doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(2L) > q(1L) && q(2L) > q(5000L), s"fixture must favor doc 2: $q")
    val best = Curation.curate(docs, "doc_id", "text",
      conf.copy(keepPolicy = "best-quality"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L), s"best-quality kept $best")
    val minId = Curation.curate(docs, "doc_id", "text", conf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L), s"min-id kept $minId")
    intercept[IllegalArgumentException](Curation.curate(docs, "doc_id", "text",
      Curation.Config(keepPolicy = "best-quality"))) // needs transitive mode
    intercept[IllegalArgumentException](Curation.curate(docs, "doc_id", "text",
      Curation.Config(keepPolicy = "bogus", transitiveNearDups = true)))
  }

  test("keepTopQuantileExact: hand-computed percent_rank boundaries, ties kept") {
    // group a: scores 10..1 → pr = (rank-1)/9; 0.25 keeps ranks 1-3
    val a = (1 to 10).map(i => ("a", i.toLong, (11 - i).toDouble))
    // group b: ties AT the boundary — scores 5,4,4,1: pr(4) = 1/3 ≤ 0.4,
    // BOTH 4s kept (equal values share a rank; membership never depends
    // on sort order among ties)
    val b = Seq(("b", 101L, 5.0), ("b", 102L, 4.0), ("b", 103L, 4.0), ("b", 104L, 1.0))
    val df = (a ++ b).toDF("g", "id", "score")
    val kept25 = Curation.keepTopQuantileExact(df, "g", "score", 0.25)
      .filter(col("g") === "a").select("id").collect().map(_.getLong(0)).toSet
    assert(kept25 == Set(1L, 2L, 3L), s"group a at 0.25 kept $kept25")
    val keptB = Curation.keepTopQuantileExact(df, "g", "score", 0.4)
      .filter(col("g") === "b").select("id").collect().map(_.getLong(0)).toSet
    assert(keptB == Set(101L, 102L, 103L), s"group b ties at 0.4 kept $keptB")
    // both forms share the (0,1] domain — a percentage passed where a
    // fraction belongs must fail loudly, not silently keep everything
    intercept[IllegalArgumentException](
      Curation.keepTopQuantileExact(df, "g", "score", 1.5))
    intercept[IllegalArgumentException](
      Curation.keepTopQuantile(df, "g", "score", 25.0))
    intercept[IllegalArgumentException](
      Curation.keepTopQuantileExact(df, "g", "score", 0.0))
    intercept[IllegalArgumentException](
      Curation.keepTopQuantile(df, "g", "score", 0.0))
  }

  test("keepTopQuantile treats a NULL group as a real group (null-safe join)") {
    val df = Seq(
      (Some("en"), 1L, 9.0), (Some("en"), 2L, 5.0), (Some("en"), 3L, 1.0),
      (None, 11L, 9.0), (None, 12L, 5.0), (None, 13L, 1.0)
    ).toDF("g", "id", "score")
    val kept = Curation.keepTopQuantile(df, "g", "score", 0.4)
      .select("id").collect().map(_.getLong(0)).toSet
    // the NULL group keeps its own top scores — a non-null-safe join
    // would silently drop all of 11/12/13
    assert(kept.exists(_ >= 11L), s"NULL-group rows all dropped: $kept")
    assert(kept.contains(11L), s"NULL group's top row must survive: $kept")
    assert(!kept.contains(13L) && !kept.contains(3L), s"bottom rows survived: $kept")
    // threshold-name collision: a frame already carrying score_threshold
    // (e.g. from topQuantileThresholds) still filters cleanly
    val carrying = df.withColumn("score_threshold", lit(0.0))
    val kept2 = Curation.keepTopQuantile(carrying, "g", "score", 0.4)
    assert(kept2.columns.count(_ == "score_threshold") == 1)
    assert(kept2.select("id").collect().map(_.getLong(0)).toSet == kept)
  }

  test("keepTopQuantile (approx threshold form): top-prefix per group, " +
      "fraction near target, broadcast plan with no window") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("double").as("score"))
    val kept = Curation.keepTopQuantile(docs, "lang", "score", 0.25)
    // scale shape: thresholds broadcast into a scan filter — no
    // per-group window, no sort
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("Window"), s"approx form must not plan a window:\n$plan")
    // kept set is a top-prefix of each group's score order: the lowest
    // kept score is ≥ the highest dropped score
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val keptMin = kept.groupBy("lang").agg(min("score").as("kmin"))
    val dropMax = dropped.groupBy("lang").agg(max("score").as("dmax"))
    val bad = keptMin.join(dropMax, Seq("lang"))
      .filter(col("kmin") < col("dmax")).count()
    assert(bad == 0, "kept set is not a top-prefix of the score order")
    // kept fraction lands near the target (ties + sketch boundary slack)
    val fracs = docs.groupBy("lang").count().withColumnRenamed("count", "n")
      .join(kept.groupBy("lang").count().withColumnRenamed("count", "k"), Seq("lang"))
      .select((col("k") / col("n")).as("f")).collect().map(_.getDouble(0))
    assert(fracs.nonEmpty && fracs.forall(f => f > 0.15 && f < 0.40),
      s"kept fractions off target 0.25: ${fracs.mkString(",")}")
    // keepFraction = 1.0 is the identity
    assert(Curation.keepTopQuantile(docs, "lang", "score", 1.0).count() == docs.count())
  }

  test("LM filter drops off-distribution gibberish, keeps prose, annotates lm_logp") {
    import graft.llm.LangModel
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val lm = LangModel.trainUnigram(base.filter(col("doc_id") < 200), "text", minCount = 2)
    val lmPath = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_lm_spec"),
      "curation.lm").toString
    LangModel.save(lm, lmPath)
    // gibberish that PASSES the surface-quality filter (real-looking
    // words structure) but sits far from the reference distribution
    val offDist = Seq((80000L, "zxqv kwpj vrtn qplm wxyz bcdf " * 8))
      .toDF("doc_id", "text")
    val docs = base.filter(col("doc_id") < 50).union(offDist)
    // threshold between the corpus' own scores and the gibberish score
    val cutoff = -2.5
    val curated = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minQuality = 0.0, lmPath = Some(lmPath), minLmLogP = cutoff))
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(80000L), "off-distribution doc survived the LM filter")
    assert(ids.contains(0L), "reference-like docs must survive")
    assert(curated.columns.contains("lm_logp"))
    // annotate-only mode: no filter, column still present
    val annotated = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minQuality = 0.0, lmPath = Some(lmPath)))
    assert(annotated.select("doc_id").collect().map(_.getLong(0)).toSet.contains(80000L),
      "without a floor the LM column must not drop anything")
    assert(annotated.columns.contains("lm_logp"))
  }

  test("lang filter keeps only requested languages") {
    val planted = Seq(
      (1L, "the cat is in the house and it is a good day for the garden"),
      (2L, "der hund ist nicht mit der katze und ich gehe zu der schule")
    ).toDF("doc_id", "text")
    val onlyEn = Curation.curate(planted, "doc_id", "text",
      Curation.Config(minQuality = 0.0, langs = Set("en")))
    assert(onlyEn.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  // -------------------------------------------- learned quality classifier

  test("QualityClassifier: save/load round-trips to bit-identical scores; " +
      "loader rejects foreign files and feature drift") {
    import graft.llm.QualityClassifier
    val clf = QualityClassifier(
      QualityClassifier.FeatureNames.zip(
        Seq(1.25, 0.3, 2.5, -3.0, -2.0)),
      intercept = -0.7512345678901234) // full-precision round trip
    val dir = java.nio.file.Files.createTempDirectory("graft_clf")
    val path = dir.resolve("q.clf").toString
    clf.save(spark, path)
    val loaded = QualityClassifier.load(spark, path)
    assert(loaded == clf, "Double.toString round-trip must be exact")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
    val mism = docs.select(
      clf.score(col("text")).as("a"), loaded.score(col("text")).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(mism == 0, "saved+loaded model must score bit-identically")
    // null text → null score
    assert(Seq((1L, null: String)).toDF("doc_id", "text")
      .select(clf.score(col("text"))).head().isNullAt(0))
    // wrong feature list / foreign file rejected
    val badF = dir.resolve("bad.clf")
    java.nio.file.Files.write(badF,
      "#graft-quality-clf v1 features=1\nnope\t1.0\n#intercept\t0.0\n".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] {
      QualityClassifier.load(spark, badF.toString) }
    assert(e1.getMessage.contains("don't match"))
    val notClf = dir.resolve("not.clf")
    java.nio.file.Files.write(notClf, "hello\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.load(spark, notClf.toString) }
    assert(e2.getMessage.contains("not a graft quality-classifier"))
    // constructor enforces the feature contract (order included)
    intercept[IllegalArgumentException] {
      QualityClassifier(QualityClassifier.FeatureNames.reverse.map(_ -> 1.0), 0.0)
    }
  }

  test("charGramSql: boundary-marked fastText grams, word token kept, " +
      "char model save/load round-trips through the BOW artifact path") {
    import graft.llm.QualityClassifier
    // grams of "<where>" at n=3..4 plus the word itself
    val grams = Seq(("where zz", 1L)).toDF("__bow_text", "doc_id")
      .selectExpr(s"(${QualityClassifier.charGramSql(3, 4)}) AS g")
      .head().getSeq[String](0)
    assert(grams.contains("where") && grams.contains("zz"), "word tokens kept")
    assert(grams.contains("<wh") && grams.contains("her") && grams.contains("re>"),
      "3-grams of <where> present")
    assert(grams.contains("<whe") && grams.contains("ere>"),
      "4-grams of <where> present")
    assert(grams.contains("<zz") && grams.contains("zz>") &&
      grams.contains("<zz>"), "short word: <zz> is 4 chars, so n=3 gives " +
      "<zz/zz> and n=4 the whole marked word")
    assert(!grams.exists(g => g.startsWith("<zz") && g.length > 4),
      "no gram longer than the marked word")
    assert(!grams.contains(""), "no empty grams")
    // train a tiny char model, save through the SAME BOW artifact path
    // the Curator loads, and assert identical scores after reload
    val ref = (0 until 40).map(i => s"the quick brown fox number $i jumps high")
      .toDF("text")
    val neg = (0 until 40).map(i => f"deadbeef$i%04x cafebabe$i%04x feedface$i%04x")
      .toDF("text")
    val model = QualityClassifier.trainCharBow(ref, neg, "text",
      numFeatures = 1 << 14, regParam = 0.01)
    val dir = java.nio.file.Files.createTempDirectory("graft_charclf")
    val path = dir.resolve("char_clf").toString
    QualityClassifier.saveBow(model, path)
    val loaded = QualityClassifier.loadBow(path)
    val probe = Seq((1L, "an unseen quick fox sentence"),
      (2L, "0123abcd4567ef89 aabbccddeeff0011")).toDF("doc_id", "text")
    val a = QualityClassifier.scoreBow(probe, "text", model)
      .select("doc_id", "bow_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = QualityClassifier.scoreBow(probe, "text", loaded)
      .select("doc_id", "bow_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "saved+loaded char model must score identically")
    // generalization to unseen hex words — the char-gram point
    assert(a(1L) > 0.5 && a(2L) < 0.5,
      s"char model must generalize to unseen words: prose=${a(1L)} hex=${a(2L)}")
  }

  test("Platt calibration: monotone rescale (a > 0, no reorders), improved " +
      "held-out reliability on noisy cohorts, sidecar round-trip, raw scores " +
      "unchanged at the defaults") {
    import graft.llm.QualityClassifier
    import org.apache.spark.sql.functions.{avg, col, pow}
    def hex(seed: String) =
      f"${scala.util.hashing.MurmurHash3.stringHash(seed)}%08x"
    def prose(i: Int) =
      s"the quick value number v$i holds with care and that is good " +
        (0 until 4).map(j => s"w${(i + j) % 50}").mkString(" ")
    def gib(i: Int) = (0 until 10).map(j => hex(s"g$i-$j")).mkString(" ")
    // 15% LABEL NOISE in every slice (same generative process): docs
    // labeled reference that are really gibberish and vice versa. LR
    // with hashing memorizes the TRAINING noise and scores held-out
    // docs overconfidently — the exact miscalibration Platt corrects.
    def cohort(lo: Int, n: Int, refSide: Boolean) = (lo until lo + n).map { i =>
      val flipped = i % 7 == 0
      val isProse = refSide != flipped
      (i.toLong, if (isProse) prose(i) else gib(i),
        if (refSide) 1.0 else 0.0)
    }.toDF("id", "text", "label")
    val (refTrain, randTrain) = (cohort(0, 140, true), cohort(1000, 140, false))
    val (refHeld, randHeld) = (cohort(2000, 140, true), cohort(3000, 140, false))
    val (refEval, randEval) = (cohort(4000, 200, true), cohort(5000, 200, false))
    val model = QualityClassifier.trainBow(refTrain, randTrain, "text",
      numFeatures = 1 << 14, maxIter = 80)
    val cal = QualityClassifier.calibrateBow(model, refHeld, randHeld, "text")
    assert(cal.a > 0, s"monotone slope: $cal")
    // monotone: calibrated order == raw order on the eval slice
    val eval = refEval.unionByName(randEval)
    val both = QualityClassifier.scoreBow(eval, "text", model, "raw")
    val scored = QualityClassifier.scoreBow(both, "text", model, "calib",
        calibration = Some(cal))
      .select("id", "label", "raw", "calib").cache()
    val ordered = scored.orderBy("raw").select("calib")
      .collect().map(_.getDouble(0))
    assert(ordered.sliding(2).forall(p => p(0) <= p(1)),
      "calibration must never reorder documents")
    // reliability: Brier score against the (noisy) labels improves —
    // the held-out fit shrinks the memorized-noise overconfidence
    val r = scored.agg(
      avg(pow(col("raw") - col("label"), 2)).as("b_raw"),
      avg(pow(col("calib") - col("label"), 2)).as("b_cal")).head()
    val (bRaw, bCal) = (r.getDouble(0), r.getDouble(1))
    assert(bCal < bRaw,
      f"calibrated Brier must improve: raw=$bRaw%.4f calibrated=$bCal%.4f")
    scored.unpersist()
    // sidecar round-trip through the artifact the Curator loads
    val dir = java.nio.file.Files.createTempDirectory("graft_platt")
    val path = dir.resolve("bow_cal").toString
    QualityClassifier.saveBow(model, path, Some(cal))
    val back = QualityClassifier.loadBowCalibration(path)
    assert(back.contains(cal), s"sidecar round-trip: $back vs $cal")
    // an artifact saved WITHOUT calibration has no sidecar, and the
    // default scoreBow emits the raw sigmoid — q84/q91 behavior
    val path2 = dir.resolve("bow_plain").toString
    QualityClassifier.saveBow(model, path2)
    assert(QualityClassifier.loadBowCalibration(path2).isEmpty)
    val rawAgain = QualityClassifier.scoreBow(eval, "text", model, "raw2")
      .select("id", "raw2")
    val joined = both.select("id", "raw").join(rawAgain, "id")
      .filter(col("raw") =!= col("raw2")).count()
    assert(joined == 0, "default scoring path must be unchanged")
  }
}
