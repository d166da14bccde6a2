package graft.llm

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned document-quality classifier — the fastText-style
  * reference-vs-random filter (Joulin et al. 2016, arXiv:1607.01759;
  * the LLaMA recipe trains one on "pages used as references by
  * Wikipedia" vs random CommonCrawl, Touvron et al. 2023,
  * arXiv:2302.13971). Heuristics ([[TextAnalysis.qualityScore]]) and LM
  * perplexity ([[LangModel]]) are fixed formulas; this stage LEARNS the
  * decision boundary from a curated positive slice and a random/garbage
  * negative slice, which is the most common production quality filter.
  *
  * Spark-first composition of machinery this engine already has
  * (reference `sparktools/trainer.py:12-72` / `scorer.py:12-65`, both
  * MLlib-ported in [[graft.ml.Trainer]]/[[graft.ml.Scorer]]):
  *  - TRAINING is the distributed MLlib flow: the fixed feature columns
  *    below + `Trainer.train(..., "logistic-regression")` — cluster-side
  *    fit, no driver materialization;
  *  - the MODEL is extracted to a tiny artifact (5 weights + intercept,
  *    one text file — the [[LangModel.save]] pattern), because logistic
  *    scoring with saved coefficients is pure arithmetic;
  *  - SCORING is `sigmoid(b + w·x)` as a codegen'd column expression —
  *    zero shuffle, zero UDFs, scan speed at 100 TB, and every feature
  *    is SQL-replayable so the q84 oracle replays the whole dot product
  *    (the weights become literals in the plan).
  *
  * The feature surface is deliberately the ORACLE-REPLAYABLE slice of
  * [[TextAnalysis]] (the q16/q21/q64 idiom): token-count sufficiency,
  * average token length, stopword ratio, punctuation ratio, 3-gram
  * repetition. A hashing-TF bag-of-words model would be stronger but
  * not replayable cross-engine; these five already separate prose from
  * the gibberish/boilerplate/stuffing classes the heuristics pass
  * through (CurationSpec plants exactly such a cohort).
  */
final case class QualityClassifier(
    weights: Seq[(String, Double)],
    intercept: Double) {
  require(weights.map(_._1) == QualityClassifier.FeatureNames,
    s"classifier weights must cover ${QualityClassifier.FeatureNames} in order, " +
      s"got ${weights.map(_._1)}")

  /** `sigmoid(intercept + Σ wᵢ·fᵢ)` over the fixed feature columns —
    * a pure codegen'd projection; the accumulation order (intercept
    * first, then features in declaration order) is part of the oracle
    * contract. Null text → null score (drops under any >= filter). */
  def score(textCol: Column): Column = {
    val feats = QualityClassifier.features(textCol).toMap
    val z = weights.foldLeft(lit(intercept)) { case (acc, (name, w)) =>
      acc + lit(w) * feats(name)
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Persist as ONE tiny text file (the [[LangModel.save]] pattern):
    * header, `feature<TAB>weight` lines in feature order, then
    * `#intercept<TAB>b`. `Double.toString` round-trips exactly, so the
    * loaded model scores bit-identically. */
  def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write(s"#graft-quality-clf v1 features=${weights.size}\n")
      weights.foreach { case (n, w) => out.write(s"$n\t$w\n") }
      out.write(s"#intercept\t$intercept\n")
    } finally out.close()
  }
}

object QualityClassifier {

  /** The fixed feature surface, in order — training, scoring, the saved
    * artifact, and the q84 oracle all share this list. */
  val FeatureNames: Seq[String] =
    Seq("tok_score", "avg_token_len", "stop_ratio", "punct_ratio", "repetition")

  /** Named feature columns over one [[TextAnalysis.stats]] struct
    * (codegen CSE collapses the getFields into a single byte scan; the
    * repetition feature is the one extra tokenizing pass — same cost
    * class as the LM filters it runs beside):
    *  - `tok_score`     = min(n_tokens / 100, 1) — length sufficiency;
    *  - `avg_token_len` = n_nonspace / n_tokens (0 if no tokens) —
    *    hex/base64/url garbage runs long, prose averages ~5;
    *  - `stop_ratio`    = en-stopword occurrences / n_tokens — near
    *    zero for non-linguistic text;
    *  - `punct_ratio`   = n_punct / n_chars — markup and stuffing
    *    score high;
    *  - `repetition`    = duplicate 3-gram fraction
    *    ([[TextAnalysis.repetitionScoreFast]]) — boilerplate/template
    *    signal the other four miss. */
  def features(textCol: Column): Seq[(String, Column)] = {
    val st = TextAnalysis.stats(textCol)
    val nTok = st.getField("n_tokens")
    Seq(
      "tok_score" -> least(nTok.cast("double") / lit(100.0), lit(1.0)),
      "avg_token_len" -> when(nTok === 0, lit(0.0))
        .otherwise(st.getField("n_nonspace").cast("double") / nTok),
      "stop_ratio" -> when(nTok === 0, lit(0.0))
        .otherwise(st.getField("hits_en").cast("double") / nTok),
      "punct_ratio" -> when(st.getField("n_chars") === 0, lit(0.0))
        .otherwise(st.getField("n_punct").cast("double") / st.getField("n_chars")),
      "repetition" -> TextAnalysis.repetitionScoreFast(textCol, 3))
  }

  /** Train reference-vs-random: label 1 = `ref` (curated high-quality
    * slice), label 0 = `rand` (random/garbage slice), logistic
    * regression over the fixed features via the standard
    * [[graft.ml.Trainer]] flow (E3). The fit is distributed; only the
    * 6 learned scalars come back to the driver. */
  def train(
      ref: DataFrame,
      rand: DataFrame,
      textCol: String,
      maxIter: Int = 100,
      regParam: Double = 0.0): QualityClassifier = {
    def prep(df: DataFrame, label: Double) = df.select(
      features(col(textCol)).map { case (n, c) => c.as(n) } :+
        lit(label).as("label"): _*)
    val data = prep(ref, 1.0).unionByName(prep(rand, 0.0))
    val model = graft.ml.Trainer.train(data, "label", "logistic-regression",
      featureCols = FeatureNames,
      params = Seq("maxIter" -> maxIter.toString, "regParam" -> regParam.toString))
    val lr = model.stages.collectFirst { case m: LogisticRegressionModel => m }
      .getOrElse(throw new IllegalStateException("pipeline has no LR stage"))
    QualityClassifier(FeatureNames.zip(lr.coefficients.toArray).toSeq, lr.intercept)
  }

  // ------------------------------------------- bag-of-words variant

  /** The production-fidelity fastText recipe: hashed bag-of-words
    * (HashingTF) → IDF → logistic regression, trained
    * reference-vs-random like [[train]]. The 5-feature replayable form
    * stays the oracle anchor (q84); THIS is what a real deployment
    * runs — word identity separates domains the shape features cannot
    * (e.g. on-topic prose vs fluent off-topic prose with identical
    * length/stopword/punctuation profiles).
    *
    * 100 TB shape: training is the distributed MLlib fit; scoring
    * ([[scoreBow]]) is `PipelineModel.transform` — tokenize/hash/IDF/LR
    * are all narrow per-row transforms (the IDF vector and LR
    * coefficients broadcast with the task closure, ~`2^18` doubles),
    * zero shuffle added to a scan. `numFeatures` bounds memory
    * regardless of vocabulary; hash collisions degrade resolution,
    * never correctness of the pipeline.
    *
    * Whitespace tokenization (lowercased) matches [[TextAnalysis]]'s
    * token contract rather than learning a separate one. */
  def trainBow(
      ref: DataFrame,
      rand: DataFrame,
      textCol: String,
      numFeatures: Int = 1 << 18,
      maxIter: Int = 100,
      regParam: Double = 0.0): org.apache.spark.ml.PipelineModel = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
    def prep(df: DataFrame, label: Double) =
      df.select(col(textCol).as("__bow_text"), lit(label).as("label"))
    val data = prep(ref, 1.0).unionByName(prep(rand, 0.0))
    val tok = new RegexTokenizer().setInputCol("__bow_text")
      .setOutputCol("__bow_words").setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF().setInputCol("__bow_words")
      .setOutputCol("__bow_tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("__bow_tf").setOutputCol("__bow_features")
    val lr = new LogisticRegression().setFeaturesCol("__bow_features")
      .setLabelCol("label").setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(tok, tf, idf, lr)).fit(data)
  }

  /** Score with a [[trainBow]] model: P(reference class) as `scoreCol`,
    * input columns preserved, internal pipeline columns dropped. Null
    * text scores null (drops under any >= filter), matching the
    * composable form's contract. With `calibration` set (a
    * [[calibrateBow]] fit, typically recovered from the artifact via
    * [[loadBowCalibration]]) the emitted score is the Platt-calibrated
    * probability — a strictly monotone rescale, so rankings and the
    * zero-shuffle scoring shape are unchanged; only the meaning of a
    * threshold improves. */
  def scoreBow(
      df: DataFrame,
      textCol: String,
      model: org.apache.spark.ml.PipelineModel,
      scoreCol: String = "bow_score",
      calibration: Option[PlattCalibration] = None): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val in = df.withColumn("__bow_text", coalesce(col(textCol), lit("")))
    val raw = vector_to_array(col("probability")).getItem(1).cast("double")
    val scoreExpr = calibration.fold(raw)(_.apply(raw))
    val out = model.transform(in)
      .withColumn(scoreCol,
        when(col(textCol).isNull, lit(null).cast("double")).otherwise(scoreExpr))
    out.select(df.columns.map(col) :+ col(scoreCol): _*)
  }

  // --------------------------------------- char-n-gram (fastText) variant

  /** SQL expression producing the fastText token surface from
    * `__bow_text`: each lowercased whitespace word plus its boundary-
    * marked char n-grams (`<where>` → `<wh, whe, her, ere, re>` at
    * n=3; Bojanowski et al. 2017, arXiv:1607.04606). A pure SQL string
    * so it rides an MLlib `SQLTransformer` — which is what makes the
    * whole pipeline persistable with [[saveBow]] unchanged. */
  private[graft] def charGramSql(nMin: Int, nMax: Int): String = {
    val grams = (nMin to nMax).map { n =>
      s"""CASE WHEN length(concat('<', w, '>')) >= $n
         |  THEN transform(sequence(1, length(concat('<', w, '>')) - $n + 1),
         |                 i -> substring(concat('<', w, '>'), i, $n))
         |  ELSE cast(array() AS array<string>) END""".stripMargin
    }
    s"""flatten(transform(
       |  filter(split(lower(coalesce(__bow_text, '')), '\\\\s+'), w -> w != ''),
       |  w -> concat(array(w), ${grams.mkString(",\n")})))""".stripMargin
  }

  /** TRUE-fastText fidelity: [[trainBow]] with the word tokens
    * AUGMENTED by boundary-marked char n-grams (default 3..5). Word
    * identity fails exactly where every test token is UNSEEN — hashed
    * gibberish, typos, OOV morphology hash to untrained buckets and
    * the model scores ~prior; the char-gram surface is drawn from a
    * small stable alphabet, so the model generalizes to tokens it
    * never saw (the gap the q91 scaladoc documents; q96 demonstrates
    * both sides on one held-out cohort).
    *
    * Same 100 TB shape as [[trainBow]]: the gram expansion is an
    * in-row codegen'd HOF (×(nMax−nMin+1) tokens per word — more hash
    * updates per row, zero extra shuffle); scoring stays a chain of
    * narrow per-row transforms. The model artifact is a PipelineModel
    * with the same `__bow_text` input and `probability` output, so
    * [[scoreBow]]/[[saveBow]]/[[loadBow]] and the Curator
    * `bow-classifier-path` knob work on it unchanged. */
  def trainCharBow(
      ref: DataFrame,
      rand: DataFrame,
      textCol: String,
      nMin: Int = 3,
      nMax: Int = 5,
      numFeatures: Int = 1 << 20,
      maxIter: Int = 100,
      regParam: Double = 0.0): org.apache.spark.ml.PipelineModel = {
    require(nMin >= 1 && nMax >= nMin, s"need 1 <= nMin <= nMax, got [$nMin,$nMax]")
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{HashingTF, IDF, SQLTransformer}
    def prep(df: DataFrame, label: Double) =
      df.select(col(textCol).as("__bow_text"), lit(label).as("label"))
    val data = prep(ref, 1.0).unionByName(prep(rand, 0.0))
    val tok = new SQLTransformer().setStatement(
      s"SELECT *, (${charGramSql(nMin, nMax)}) AS __bow_words FROM __THIS__")
    val tf = new HashingTF().setInputCol("__bow_words")
      .setOutputCol("__bow_tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("__bow_tf").setOutputCol("__bow_features")
    val lr = new LogisticRegression().setFeaturesCol("__bow_features")
      .setLabelCol("label").setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(tok, tf, idf, lr)).fit(data)
  }

  // ----------------------------------------------- Platt calibration

  /** Platt scaling (Platt 1999, "Probabilistic Outputs for Support
    * Vector Machines..."): `calibrated = sigmoid(a·z + b)` over the raw
    * score's LOGIT `z`. Why it matters here: a HashingTF→LR fit's raw
    * sigmoid outputs drift in meaning across retrains (different
    * corpus, regularization, iteration budget ⇒ differently-scaled
    * decision values), so a `min-bow-score = 0.8` floor tuned against
    * one artifact silently means something else against the next.
    * Calibrating on a HELD-OUT slice anchors the score to an actual
    * probability, making floors retrain-portable. `a > 0` ⇒ the
    * transform is strictly monotone: calibration re-scales confidence,
    * it never reorders documents. */
  final case class PlattCalibration(a: Double, b: Double) {
    require(a.isFinite && b.isFinite, s"non-finite Platt parameters ($a, $b)")
    require(a > 0,
      s"Platt slope must be positive (monotone transform), got $a — the " +
        "held-out slice disagrees with the model's score direction")

    /** Calibrated probability column from a raw-probability column
      * (null-safe: null raw ⇒ null calibrated). Raw scores clamp to
      * [1e-12, 1−1e-12] before the logit so saturated LR outputs stay
      * finite. */
    def apply(raw: Column): Column = {
      val p = least(greatest(raw, lit(1e-12)), lit(1.0 - 1e-12))
      val z = log(p / (lit(1.0) - p))
      lit(1.0) / (lit(1.0) + exp(-(lit(a) * z + lit(b))))
    }
  }

  /** Fit Platt scaling for a [[trainBow]]/[[trainCharBow]] model on
    * HELD-OUT reference/random slices (never the training slices — the
    * whole point is correcting the fit's overconfidence, which the
    * training data cannot see). Classic Platt details: the targets are
    * the smoothed `(n₊+1)/(n₊+2)` / `1/(n₋+2)` values (an out-of-sample
    * Bayes correction that keeps the fit from chasing 0/1 asymptotes),
    * and the 2-parameter logistic fit runs as Newton iterations whose
    * gradient/Hessian are ONE Spark aggregate each over the cached
    * `(z, target)` frame — distributed over any held-out size, ~10
    * iterations, nothing but two doubles ever on the driver. */
  def calibrateBow(
      model: org.apache.spark.ml.PipelineModel,
      refHeldOut: DataFrame,
      randHeldOut: DataFrame,
      textCol: String,
      maxIter: Int = 50): PlattCalibration = {
    val nPos = refHeldOut.count()
    val nNeg = randHeldOut.count()
    require(nPos > 0 && nNeg > 0,
      s"calibrateBow needs non-empty held-out slices (got $nPos ref, $nNeg rand)")
    val tPos = (nPos + 1.0) / (nPos + 2.0)
    val tNeg = 1.0 / (nNeg + 2.0)
    def side(df: DataFrame, t: Double) =
      scoreBow(df.select(col(textCol)), textCol, model, "__p")
        .filter(col("__p").isNotNull)
        .select(col("__p"), lit(t).as("__t"))
    val zt = side(refHeldOut, tPos).unionByName(side(randHeldOut, tNeg))
      .select({
        val p = least(greatest(col("__p"), lit(1e-12)), lit(1.0 - 1e-12))
        log(p / (lit(1.0) - p)).as("z")
      }, col("__t").as("t"))
      .cache()
    try {
      // Lin–Weng–Lin 2007 ("A Note on Platt's Probabilistic Outputs"):
      // Newton with BACKTRACKING from the a=0 / b=prior-logit start.
      // Plain Newton from a=1 fails exactly here — an overconfident LR
      // emits saturated z≈±27, where q(1−q)≈0 flattens the Hessian and
      // the ridge-dominated step explodes (observed: calibration made
      // Brier WORSE before the damping).
      def stats(a: Double, b: Double): (Double, Double, Double, Double, Double, Double) = {
        val m = lit(a) * col("z") + lit(b)
        val q = lit(1.0) / (lit(1.0) + exp(-m))
        // softplus(x) = max(x,0) + log1p(exp(−|x|)) — stable at ±27
        def softplus(x: Column): Column =
          greatest(x, lit(0.0)) + log1p(exp(-abs(x)))
        val r = zt.agg(
          sum(col("t") * softplus(-m) + (lit(1.0) - col("t")) * softplus(m)).as("loss"),
          sum((q - col("t")) * col("z")).as("ga"),
          sum(q - col("t")).as("gb"),
          sum(q * (lit(1.0) - q) * col("z") * col("z")).as("haa"),
          sum(q * (lit(1.0) - q) * col("z")).as("hab"),
          sum(q * (lit(1.0) - q)).as("hbb")).head()
        (r.getDouble(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))
      }
      var a = 0.0
      var b = math.log((nNeg + 1.0) / (nPos + 1.0))
      var (loss, ga, gb, haa0, hab, hbb0) = stats(a, b)
      var it = 0
      var done = false
      while (it < maxIter && !done) {
        val (haa, hbb) = (haa0 + 1e-9, hbb0 + 1e-9)
        val det = haa * hbb - hab * hab
        val da = (hbb * ga - hab * gb) / det
        val db = (haa * gb - hab * ga) / det
        if (math.abs(da) < 1e-10 && math.abs(db) < 1e-10) done = true
        else {
          // backtracking line search: halve until the loss decreases
          var step = 1.0
          var accepted = false
          var tries = 0
          while (!accepted && tries < 20) {
            val (l2, g2a, g2b, h2aa, h2ab, h2bb) = stats(a - step * da, b - step * db)
            if (l2 < loss) {
              a -= step * da; b -= step * db
              loss = l2; ga = g2a; gb = g2b; haa0 = h2aa; hab = h2ab; hbb0 = h2bb
              accepted = true
            } else { step /= 2; tries += 1 }
          }
          if (!accepted) done = true // at a local optimum within precision
        }
        it += 1
      }
      PlattCalibration(a, b)
    } finally { zt.unpersist(); () }
  }

  private val PlattFile = "graft_platt.txt"

  /** Persist/load a [[trainBow]] model — the MLlib native directory
    * artifact ([[graft.ml.Trainer.save]] idiom): tokenizer params,
    * hash width, IDF vector, LR coefficients all ride the pipeline.
    * With `calibration` set, the Platt parameters ride the SAME
    * directory (a `graft_platt.txt` sidecar), so the calibrated score
    * travels with the model it calibrates — [[loadBowCalibration]]
    * recovers it and the Curator applies it automatically. */
  def saveBow(model: org.apache.spark.ml.PipelineModel, path: String,
      calibration: Option[PlattCalibration] = None): Unit = {
    model.write.overwrite().save(path)
    calibration.foreach { cal =>
      val p = new org.apache.hadoop.fs.Path(path, PlattFile)
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = fs.create(p, true)
      try out.write(
        s"#graft-platt v1\na\t${cal.a}\nb\t${cal.b}\n".getBytes("UTF-8"))
      finally out.close()
    }
  }

  def loadBow(path: String): org.apache.spark.ml.PipelineModel =
    org.apache.spark.ml.PipelineModel.load(path)

  /** The Platt sidecar of a [[saveBow]] artifact, if one was stored. */
  def loadBowCalibration(path: String): Option[PlattCalibration] = {
    val p = new org.apache.hadoop.fs.Path(path, PlattFile)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
        finally in.close()
      require(lines.nonEmpty && lines(0).startsWith("#graft-platt v1"),
        s"not a graft Platt-calibration file: $p")
      val kv = lines.drop(1).filter(_.nonEmpty).map { l =>
        val t = l.split('\t'); require(t.length == 2, s"malformed line '$l' in $p")
        t(0) -> t(1).toDouble
      }.toMap
      Some(PlattCalibration(kv("a"), kv("b")))
    }
  }

  /** Load a [[QualityClassifier#save]] artifact; validates the feature
    * list matches this library's surface (a file from a different
    * feature version must fail loudly, not score garbage). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): QualityClassifier = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    require(lines.nonEmpty && lines(0).startsWith("#graft-quality-clf v1 "),
      s"not a graft quality-classifier file: $path")
    val body = lines.drop(1).filter(_.nonEmpty)
    val (wLines, iLines) = body.partition(!_.startsWith("#intercept"))
    require(iLines.length == 1, s"classifier file $path needs exactly one #intercept line")
    val ws = wLines.map { l =>
      val t = l.indexOf('\t')
      require(t > 0, s"malformed weight line (need name<TAB>weight): '$l'")
      l.substring(0, t) -> l.substring(t + 1).toDouble
    }.toSeq
    require(ws.map(_._1) == FeatureNames,
      s"classifier file $path features ${ws.map(_._1)} don't match $FeatureNames")
    QualityClassifier(ws, iLines.head.split('\t')(1).toDouble)
  }
}
