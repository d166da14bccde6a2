package graft.ml

import graft.conf.GraftConfig
import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.param.{BooleanParam, DoubleArrayParam, DoubleParam, FloatParam, IntArrayParam, IntParam, LongParam, Param, StringArrayParam}
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Distributed training (SURVEY.md §7.5; replaces reference
  * `trainer.py:46-65`).
  *
  * The reference collects the whole dataset to the driver (`toPandas`,
  * `trainer.py:48`) and fits a single-node sklearn pipeline shipped as a
  * Python file (`pipeline-file`, `trainer.py:32-40`). Here the fit is
  * cluster-side — `Pipeline(VectorAssembler → estimator)` — and the
  * user-code contract becomes a config-selected estimator name + params
  * (the pipeline-file idea without dynamic code loading; `B4`).
  *
  * Feature engineering mirrors the reference's pre-fit normalization:
  *  - `pandify` (decimal→float, dotted names) is applied by the caller;
  *  - all-null column drop (`df.dropna(axis=1, how='all')`,
  *    `trainer.py:50`) becomes ONE distributed aggregate pass
  *    (`count(col)` per column) instead of a driver materialization;
  *  - feature columns default to every numeric non-target column.
  *
  * At scale: the assembler and estimators are MLlib's distributed
  * implementations; nothing here collects rows to the driver. Model
  * persistence is `model.write.save` (a directory of parquet + JSON
  * metadata), the cluster-native replacement for joblib.
  */
object Trainer {

  /** All-null column drop as one aggregate pass (`trainer.py:50`).
    * Positional lookups — name-based ones could collide with user
    * column names. */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val aggs = df.columns.map(c => count(col(c)))
    val counts = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) > 0L => c
    }
    df.select(keep.map(col).toIndexedSeq: _*)
  }

  /** Numeric columns other than the target — the default feature set. */
  def numericFeatureColumns(df: DataFrame, targetColumn: String): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && f.name != targetColumn => f.name
    }.toSeq

  /** Sets params by name, parsing the string value per the param's
    * declared type (IntParam/DoubleParam/…) — the config-side half of the
    * B4 contract (estimator name + params instead of a shipped code file). */
  def setParams(stage: PipelineStage, params: Seq[(String, String)]): PipelineStage = {
    params.foreach { case (name, value) =>
      val p = stage.getParam(name)
      val v: Any = (p: Any) match {
        case _: IntParam     => value.trim.toInt
        case _: LongParam    => value.trim.toLong
        case _: DoubleParam  => value.trim.toDouble
        case _: FloatParam   => value.trim.toFloat
        case _: BooleanParam => value.trim.toBoolean
        case _: DoubleArrayParam => value.split(",").map(_.trim.toDouble)
        case _: IntArrayParam    => value.split(",").map(_.trim.toInt)
        case _: StringArrayParam => value.split(",").map(_.trim)
        case _: Param[_]     => value
      }
      stage.set(p.asInstanceOf[Param[Any]], v)
    }
    stage
  }

  /** Build the training pipeline: assemble numeric features, fit the
    * configured estimator. */
  def buildPipeline(
      featureCols: Seq[String],
      estimatorName: String,
      targetColumn: String,
      params: Seq[(String, String)] = Nil): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")
    val est = estimatorName match {
      case "logistic-regression"      => new LogisticRegression().setLabelCol(targetColumn)
      case "linear-regression"        => new LinearRegression().setLabelCol(targetColumn)
      case "random-forest-classifier" => new RandomForestClassifier().setLabelCol(targetColumn)
      case "random-forest-regressor"  => new RandomForestRegressor().setLabelCol(targetColumn)
      case "gbt-classifier"           => new GBTClassifier().setLabelCol(targetColumn)
      case "gbt-regressor"            => new GBTRegressor().setLabelCol(targetColumn)
      case other => throw new IllegalArgumentException(s"unknown estimator: $other")
    }
    setParams(est, params)
    new Pipeline().setStages(Array(assembler, est))
  }

  /** E3 training flow (`trainer.py:46-65`), fully distributed. Returns the
    * fitted model; `featureCols` defaults to all numeric non-target
    * columns after the all-null drop. */
  def train(
      df0: DataFrame,
      targetColumn: String,
      estimatorName: String,
      featureCols: Seq[String] = Nil,
      params: Seq[(String, String)] = Nil): PipelineModel = {
    val df = dropAllNullColumns(df0)
    val feats =
      if (featureCols.nonEmpty) featureCols
      else numericFeatureColumns(df, targetColumn)
    require(feats.nonEmpty, "no numeric feature columns found")
    buildPipeline(feats, estimatorName, targetColumn, params).fit(df)
  }

  /** Train from a `model-definition` config subtree (trainer CLI core):
    * keys `target-column`, `estimator`, optional `feature-columns`,
    * optional `params { }`. */
  def trainFromConf(df: DataFrame, conf: GraftConfig): PipelineModel =
    train(
      df,
      targetColumn = conf.string("target-column"),
      estimatorName = conf.getString("estimator").getOrElse("logistic-regression"),
      featureCols = conf.getList("feature-columns").getOrElse(Nil),
      params = conf.at("params").flat)

  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Score a fitted MLlib model under the Scorer dispatch contract
    * (`core.py:56-71`): binary classifier → `target_proba` = P(class 1),
    * multiclass → one column per class (given `targetClassNames` or
    * `class{i}`, `core.py:63-67`), otherwise → `pred`. Pure DataFrame
    * transform — distributed, no driver involvement. */
  def scoreModel(model: PipelineModel, df: DataFrame, colsToSave: Seq[String] = Nil,
      targetClassNames: Seq[String] = Nil): DataFrame = {
    val out = model.transform(df)
    val saved = colsToSave.filter(out.columns.contains).map(col)
    if (out.columns.contains("probability")) {
      val probs = vector_to_array(col("probability"))
      val n = model.stages.collectFirst {
        case c: org.apache.spark.ml.classification.ClassificationModel[_, _] => c.numClasses
      }.getOrElse(2)
      if (n == 2)
        out.select(saved :+ probs.getItem(1).cast("float").as("target_proba"): _*)
      else {
        val names =
          if (targetClassNames.nonEmpty) {
            require(targetClassNames.length == n,
              s"${targetClassNames.length} class names for $n classes")
            targetClassNames
          } else (0 until n).map(i => s"class$i")
        out.select(saved ++ names.zipWithIndex.map { case (nm, i) =>
          probs.getItem(i).cast("float").as(nm)
        }: _*)
      }
    } else
      out.select(saved :+ col("prediction").cast("float").as("pred"): _*)
  }
}
