package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.conf.GraftConfig
import graft.ml.Trainer

/** Distributed trainer semantics (replaces reference `trainer.py:46-65`). */
class TrainerSpec extends SparkTestBase {
  import spark.implicits._

  /** Linearly separable binary data: label = 1 iff f1 + f2 > 1. */
  private def labeled(n: Int = 500) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map { i =>
      val (f1, f2) = (rnd.nextDouble(), rnd.nextDouble())
      (i.toLong, f1, f2, if (f1 + f2 > 1.0) 1.0 else 0.0)
    }.toDF("id", "f1", "f2", "label")
  }

  test("dropAllNullColumns drops only fully-null columns in one pass (trainer.py:50)") {
    val df = Seq((1, Option.empty[String], Some(2.0)), (2, None, None))
      .toDF("a", "all_null", "partial")
    val out = Trainer.dropAllNullColumns(df)
    assert(out.columns.toSeq == Seq("a", "partial"))
  }

  test("numericFeatureColumns excludes target and non-numeric columns") {
    val df = Seq((1L, "x", 2.0, 0.0)).toDF("id", "name", "f1", "label")
    assert(Trainer.numericFeatureColumns(df, "label") == Seq("id", "f1"))
  }

  test("train + scoreModel learns a separable boundary (E3 distributed fit)") {
    val df = labeled().cache()
    val model = Trainer.train(df, "label", "logistic-regression",
      featureCols = Seq("f1", "f2"), params = Seq("maxIter" -> "50"))
    val scored = Trainer.scoreModel(model, df, colsToSave = Seq("id", "label"))
    assert(scored.columns.toSeq == Seq("id", "label", "target_proba"))
    val acc = scored.filter(
      (col("target_proba") > 0.5 && col("label") === 1.0) ||
      (col("target_proba") <= 0.5 && col("label") === 0.0)).count().toDouble / df.count()
    assert(acc > 0.95, s"accuracy $acc")
    df.unpersist()
  }

  test("save/load roundtrip scores identically (joblib.dump replacement)") {
    val df = labeled(200).cache()
    val model = Trainer.train(df, "label", "logistic-regression", Seq("f1", "f2"))
    val dir = Files.createTempDirectory("graft-model").toString + "/m1"
    Trainer.save(model, dir)
    val reloaded = Trainer.load(dir)
    val a = Trainer.scoreModel(model, df, Seq("id")).collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val b = Trainer.scoreModel(reloaded, df, Seq("id")).collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(a == b)
    df.unpersist()
  }

  test("regressor dispatch emits pred (core.py:68-69 shape)") {
    val df = labeled(200)
    val model = Trainer.train(df, "label", "linear-regression", Seq("f1", "f2"))
    val scored = Trainer.scoreModel(model, df, Seq("id"))
    assert(scored.columns.toSeq == Seq("id", "pred"))
  }

  test("multiclass dispatch emits class{i} columns (core.py:63-67)") {
    val df = spark.read.parquet(s"$sfDir/../sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("double").as("label"),
        element_at(col("embedding"), 1).as("e1"), element_at(col("embedding"), 2).as("e2"),
        element_at(col("embedding"), 3).as("e3"))
    val model = Trainer.train(df, "label", "logistic-regression", Seq("e1", "e2", "e3"))
    val scored = Trainer.scoreModel(model, df, Seq("vec_id"))
    assert(scored.columns.head == "vec_id")
    val n = scored.columns.count(_.startsWith("class"))
    assert(n >= 3)
    // explicit class names (scorer.py target-class-names)
    val named = Trainer.scoreModel(model, df, Seq("vec_id"),
      targetClassNames = (0 until n).map(i => s"cat_$i"))
    assert(named.columns.toSeq == "vec_id" +: (0 until n).map(i => s"cat_$i"))
    intercept[IllegalArgumentException] {
      Trainer.scoreModel(model, df, Nil, targetClassNames = Seq("just_one"))
    }
  }

  test("trainFromConf wires target/estimator/features/params from HOCON (B4)") {
    val conf = GraftConfig.parse(
      """target-column = label
        |estimator = logistic-regression
        |feature-columns = [f1, f2]
        |params { maxIter = 25, regParam = 0.01 }
        |""".stripMargin)
    val model = Trainer.trainFromConf(labeled(200), conf)
    val lr = model.stages.last.asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    assert(lr.getMaxIter == 25)
    assert(lr.getRegParam == 0.01)
  }

  test("setParams rejects unknown params with a useful error") {
    val ex = intercept[NoSuchElementException] {
      Trainer.train(labeled(50), "label", "logistic-regression", Seq("f1"),
        params = Seq("notAParam" -> "1"))
    }
    assert(ex.getMessage.contains("notAParam"))
  }
}
