package graft

import org.apache.spark.sql.functions.{col, count => cnt}

class SkewSafeSamplingSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.lit

  test("proportionSamplesSkewSafe fills every quota with fewer window rows") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val props = o.select("o_orderpriority").distinct().withColumn("rows_count", lit(5))
    val out = graft.operators.Ops.proportionSamplesSkewSafe(
      o, props, Seq("o_orderpriority"), Seq(col("o_orderkey")), oversample = 8.0)
    val perStratum = out.groupBy("o_orderpriority").agg(cnt("*").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.size == 5)
    assert(perStratum.values.forall(_ == 5L), s"quotas unfilled: $perStratum")
  }

  test("oversample >= stratum size degenerates to the exact sampler") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "id")
    val props = Seq(("a", 1), ("b", 1)).toDF("k", "rows_count")
    val exact = graft.operators.Ops.proportionSamples(df, props, Seq("k"), Seq(col("id")))
      .collect().map(_.getLong(1)).toSet
    val safe = graft.operators.Ops.proportionSamplesSkewSafe(df, props, Seq("k"), Seq(col("id")),
      oversample = 100.0)
      .collect().map(_.getLong(1)).toSet
    assert(safe == exact) // keepRate clamps to 1 → identical top-1 per stratum
  }

  /** Driver-side replica of [[graft.operators.Ops.hashDigestCol]] for
    * picking adversarial salts: md5 hex of "id|salt". */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("proportionSamplesByDigest: keep-set EQUALITY with the window form " +
      "(rank-aware thinning, unlike the Bernoulli variant), digest filter " +
      "below the window in the plan, under-filled strata relax exactly") {
    import graft.operators.Ops
    // skewed strata: one dominant, one mid, one smaller than its quota,
    // one absent from the proportions side
    val df = ((1 to 4000).map(i => ("big", i.toLong)) ++
      (1 to 300).map(i => ("mid", 10000L + i)) ++
      (1 to 3).map(i => ("tiny", 20000L + i)) ++
      (1 to 50).map(i => ("orphan", 30000L + i))).toDF("k", "id")
    val props = Seq(("big", 25), ("mid", 10), ("tiny", 10)).toDF("k", "rows_count")
    def digest(salt: String) = Ops.hashDigestCol(col("id").cast("string"), salt)
    def windowForm(salt: String) =
      Ops.proportionSamples(df, props, Seq("k"), Seq(digest(salt), col("id")))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val fast = Ops.proportionSamplesByDigest(df, props, Seq("k"), digest("pbd"), col("id"))
    val got = fast.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == windowForm("pbd"),
      "the digest-thinned sampler must keep EXACTLY the window form's rows")
    // tiny fills with all 3 of its members; orphan contributes nothing
    val perK = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perK == Map("big" -> 25, "mid" -> 10, "tiny" -> 3), s"$perK")
    // schema passthrough: the temp digest/threshold columns never leak
    assert(fast.columns.toSeq == Seq("k", "id"))
    // plan shape: the digest-threshold Filter feeds the Window — the
    // dominant stratum's full membership is cut BEFORE the sort
    val plan = fast.queryExecution.executedPlan.toString
    val wIdx = plan.indexOf("Window")
    val tIdx = plan.indexOf("__thr")
    assert(wIdx >= 0 && tIdx > wIdx,
      s"the threshold filter must sit below the window:\n$plan")
    // relaxation exactness: pick a salt where the 'big' stratum
    // UNDER-FILLS at the tight oversample-1 threshold (the ~exp(-q)
    // tail the fallback exists for) and prove the result still equals
    // the window form — correctness never rides the tail bound
    val bigIds = (1 to 4000).map(_.toLong)
    val relaxSalt = (0 until 200).map(i => s"r$i").find { salt =>
      val t = Ops.hashThresholdHex(25.0 / 4000)
      bigIds.count(id => md5Hex(s"$id|$salt") < t) < 25
    }.getOrElse(fail("no under-filling salt in 200 candidates — check the threshold math"))
    val relaxed = Ops.proportionSamplesByDigest(df, props, Seq("k"),
      digest(relaxSalt), col("id"), oversample = 1.0, minKeep = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(relaxed == windowForm(relaxSalt),
      s"under-filled strata (salt $relaxSalt) must relax to the exact window result")
  }
}

class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin == plain inner join on skewed data, spreads the hot key") {
    // 10k rows of one hot key + a tail, joined to a 3-row dimension
    val skewed = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "name")
    val plain = skewed.join(dim, Seq("key"), "inner")
      .groupBy("key").agg(cnt("*").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.operators.Ops.saltedJoin(skewed, dim, "key", saltFactor = 8)
      .groupBy("key").agg(cnt("*").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 10000L)
  }

  test("saltedJoin refuses degenerate salt and avoids column collisions") {
    val df = Seq(("a", 1)).toDF("key", "__salt0") // collides with the default name
    val dim = Seq(("a", "x")).toDF("key", "d")
    val out = graft.operators.Ops.saltedJoin(df, dim, "key", 4)
    assert(out.columns.toSeq.sorted == Seq("__salt0", "d", "key"))
    intercept[IllegalArgumentException] {
      graft.operators.Ops.saltedJoin(df, dim, "key", 1)
    }
  }
}

import graft.operators.Ops
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("pandify renames dotted columns and casts decimals to float (A3)") {
    val df = spark.range(3).toDF("id")
      .withColumn("a.b", col("id").cast(DecimalType(10, 2)))
      .withColumn("c", lit("x"))
    val out = Ops.pandify(df)
    assert(out.columns.toSeq == Seq("id", "a__b", "c"))
    assert(out.schema("a__b").dataType == FloatType)
    assert(out.schema("c").dataType == StringType)
  }

  test("pandify is idempotent on clean schemas") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val once = Ops.pandify(df)
    val twice = Ops.pandify(once)
    assert(once.schema == twice.schema)
    assert(once.count() == twice.count())
  }

  test("exactLimit returns exactly n rows in order") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val out = Ops.exactLimit(df, 10, Seq(col("o_orderkey"))).collect()
    assert(out.length == 10)
    val keys = out.map(_.getAs[Long]("o_orderkey"))
    assert(keys.sorted.sameElements(keys))
  }

  test("proportionSamples: per-stratum count <= quota; missing strata dropped (A5)") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 5L), ("b", 6L),
      ("c", 7L)).toDF("g", "v")
    val props = Seq(("a", 2L), ("b", 5L)).toDF("g", "rows_count")
    val out = Ops.proportionSamples(df, props, Seq("g"), Seq(col("v")))
    val byG = out.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 2L, "b" -> 2L)) // quota caps a; b has fewer rows than quota; c dropped
    // deterministic: lowest v's kept within each stratum
    assert(out.filter($"g" === "a").select("v").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
  }

  test("withMeta prepends constant columns") {
    val df = spark.range(2).toDF("id")
    val out = Ops.withMeta(df, Seq("model_name" -> "m", "dt" -> "2026"))
    assert(out.columns.toSeq == Seq("model_name", "dt", "id"))
    assert(out.select("model_name").distinct().as[String].collect().sameElements(Array("m")))
  }

  test("groupedCollect yields fixed-size batches covering all rows") {
    val df = spark.range(25).toDF("id")
    val batches = Ops.groupedCollect(df, 10).toSeq
    assert(batches.map(_.size).sum == 25)
    assert(batches.forall(_.size <= 10))
  }

  test("sessionize: hand-computed session boundaries, ordinals start at 1") {
    // user 1: events at t=0,10,20 (one session), 100 (gap 80 > 25 → new),
    //         110 (same); user 2: single event; gap boundary: exactly
    //         maxGap does NOT open a session (> not >=)
    val df = Seq(
      (1L, 0L), (1L, 10L), (1L, 20L), (1L, 100L), (1L, 110L),
      (2L, 5L), (3L, 0L), (3L, 25L), (3L, 51L)
    ).toDF("uid", "t")
    val got = Ops.sessionize(df, Seq("uid"), "t", maxGap = 25L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 20L, 1L), (1L, 100L, 2L), (1L, 110L, 2L),
      (2L, 5L, 1L),
      (3L, 0L, 1L), (3L, 25L, 1L), // gap == maxGap → same session
      (3L, 51L, 2L)) // gap 26 > 25 → new session
    assert(got == want, s"got $got")
  }

  test("sessionize: both window passes share one Exchange + one Sort") {
    val df = Seq((1L, 0L, 10L), (1L, 9L, 11L)).toDF("uid", "t", "eid")
    val plan = Ops.sessionize(df, Seq("uid"), "t", 5L, tieBreakCols = Seq("eid"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"plan:\n$plan")
    assert("(?m)^\\s*[+:]?-?\\s*\\*?\\(?\\d*\\)?\\s*Sort ".r.findAllIn(plan).size <= 1,
      s"expected a single Sort:\n$plan")
    assert("WindowGroupLimit|Window".r.findAllIn(plan).size >= 1)
  }

  test("sessionize rejects bad arguments") {
    val df = Seq((1L, 0L)).toDF("uid", "t")
    intercept[IllegalArgumentException](Ops.sessionize(df, Nil, "t", 5L))
    intercept[IllegalArgumentException](Ops.sessionize(df, Seq("uid"), "t", 0L))
    intercept[IllegalArgumentException](
      Ops.sessionize(df, Seq("uid"), "t", 5L, sessionCol = "t"))
  }
}

class WeightedSampleSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Ops

  private def pool = spark.range(2000)
    .select(col("id"), when(col("id") < 200, 50.0).otherwise(1.0).as("w"))

  test("weightedSample is deterministic and biased toward heavy weights") {
    val a = Ops.weightedSample(pool, col("id"), col("w"), k = 200, salt = "s1")
      .select("id").as[Long].collect().toSet
    val b = Ops.weightedSample(pool, col("id"), col("w"), k = 200, salt = "s1")
      .select("id").as[Long].collect().toSet
    assert(a == b, "same (data, salt, k) must select the same rows")
    assert(a.size == 200)
    // 200 rows carry weight 50 (total 10000) vs 1800 rows at weight 1
    // (total 1800): heavy rows should dominate the sample — under E-S
    // their expected share is far above 80%; uniform sampling gives 10%
    val heavy = a.count(_ < 200)
    assert(heavy > 140, s"expected heavy-weight dominance, got $heavy/200")
    // a different salt draws a genuinely different sample
    val c = Ops.weightedSample(pool, col("id"), col("w"), k = 200, salt = "s2")
      .select("id").as[Long].collect().toSet
    assert(a != c)
  }

  test("weightedSample excludes non-positive weights and bounds the plan") {
    val withBad = pool.withColumn("w",
      when(col("id") === 7, -1.0).when(col("id") === 8, 0.0).otherwise(col("w")))
    val got = Ops.weightedSample(withBad, col("id"), col("w"), k = 2000, salt = "s")
    assert(!got.select("id").as[Long].collect().toSet.exists(Set(7L, 8L)))
    // TakeOrderedAndProject = per-partition heaps, no global Sort+Exchange
    val plan = Ops.weightedSample(pool, col("id"), col("w"), k = 10, salt = "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    intercept[IllegalArgumentException](
      Ops.weightedSample(pool, col("id"), col("w"), k = 0))
  }
}
