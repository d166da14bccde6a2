package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ml.Scorer
import graft.ml.Scorer.RowModel

/** U1-U5 scoring semantics — the repo equivalent of the reference's only
  * test (`tests/test_score.py:10-23`), with actual assertions. */
class ScorerSpec extends SparkTestBase {
  import spark.implicits._

  private def featureDf(n: Int = 1000) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, rnd.nextDouble(), rnd.nextDouble()))
      .toDF("id", "f1", "f2")
  }

  test("score with SimpleModel saves cols and predicts f1*f2 (test_score.py parity)") {
    val df = featureDf().cache()
    val scored = Scorer.score(df, new Scorer.SimpleModel(), colsToSave = Seq("id"))
    assert(scored.columns.toSeq == Seq("id", "pred"))
    val got = scored.collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val want = df.collect().map(r => r.getLong(0) -> (r.getDouble(1) * r.getDouble(2)).toFloat).toMap
    assert(got == want)
    df.unpersist()
  }

  test("binary classifier emits target_proba = P(class 1) (core.py:60-61)") {
    val model = new RowModel {
      override def isClassifier = true
      override def numOutputs = 2
      def predictBatch(rows: Seq[Row], cols: Map[String, Int]) =
        rows.map { r => val p = r.getDouble(cols("f1")); Array(1 - p, p) }
    }
    val df = featureDf(50).cache()
    val scored = Scorer.score(df, model, colsToSave = Seq("id"))
    assert(scored.columns.toSeq == Seq("id", "target_proba"))
    // target_proba must be P(class 1) = f1, NOT P(class 0) = 1 - f1
    val want = df.collect().map(r => r.getLong(0) -> r.getDouble(1).toFloat).toMap
    scored.collect().foreach { r =>
      assert(math.abs(r.getFloat(1) - want(r.getLong(0))) < 1e-6,
        s"target_proba is not P(class 1) for id ${r.getLong(0)}")
    }
    df.unpersist()
  }

  test("multiclass emits one column per class, default names class{i} (core.py:63-67)") {
    val model = new RowModel {
      override def isClassifier = true
      override def numOutputs = 3
      def predictBatch(rows: Seq[Row], cols: Map[String, Int]) =
        rows.map(_ => Array(0.2, 0.3, 0.5))
    }
    val def3 = Scorer.score(featureDf(10), model)
    assert(def3.columns.toSeq == Seq("class0", "class1", "class2"))
    val named = Scorer.score(featureDf(10), model, targetClassNames = Seq("a", "b", "c"))
    assert(named.columns.toSeq == Seq("a", "b", "c"))
    val row = named.head()
    assert(math.abs(row.getFloat(2) - 0.5f) < 1e-6)
    intercept[IllegalArgumentException] {
      Scorer.score(featureDf(10), model, targetClassNames = Seq("only", "two"))
    }
  }

  test("models violating the batch/output arity contract fail loudly") {
    val dropsRows = new RowModel {
      def predictBatch(rows: Seq[Row], cols: Map[String, Int]) =
        rows.drop(1).map(_ => Array(1.0)) // one prediction short
    }
    val ex = intercept[org.apache.spark.SparkException] {
      Scorer.score(featureDf(10), dropsRows, Seq("id")).collect()
    }
    assert(ex.getMessage.contains("predictions") || ex.getCause != null)
    val wrongWidth = new RowModel {
      override def numOutputs = 2
      override def isClassifier = true
      def predictBatch(rows: Seq[Row], cols: Map[String, Int]) =
        rows.map(_ => Array(0.5)) // declared 2 outputs, returns 1
    }
    intercept[org.apache.spark.SparkException] {
      Scorer.score(featureDf(10), wrongWidth, Seq("id")).collect()
    }
  }

  test("cols_to_save intersects with existing columns (core.py:51-53)") {
    val scored = Scorer.score(featureDf(10), new Scorer.SimpleModel(),
      colsToSave = Seq("id", "not_a_column", "f1"))
    assert(scored.columns.toSeq == Seq("id", "f1", "pred"))
  }

  test("batching covers all rows exactly once (block size < partition size)") {
    val scored = Scorer.score(featureDf(1000), new Scorer.SimpleModel(),
      colsToSave = Seq("id"), batchSize = 64)
    val ids = scored.collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 1000L))
  }

  test("scoreExpr matches the mapPartitions scorer on the same model (U5)") {
    val df = featureDf(200).cache()
    val viaExpr = Scorer.scoreExpr(df, Seq("pred" -> (col("f1") * col("f2"))), Seq("id"))
    val viaScore = Scorer.score(df, new Scorer.SimpleModel(), Seq("id"))
    assert(viaExpr.columns.toSeq == viaScore.columns.toSeq)
    val e = viaExpr.collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val s = viaScore.collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(e == s)
    df.unpersist()
  }

  test("scoreExpr plans as a single projection (no shuffle, no RDD drop)") {
    val plan = Scorer.scoreExpr(featureDf(10), Seq("pred" -> (col("f1") * col("f2"))), Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
