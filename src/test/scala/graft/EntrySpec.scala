package graft

class EntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and returns a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q38: pair-drop keeps both chain endpoints, transitive keeps one per chain") {
    val rows = SparkEntry.queries("q38_transitive_dedup")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (pt, pe, ph) = rows("pair_drop")
    val (tt, te, th) = rows("transitive")
    assert(pt > 0 && tt > 0)
    // hub (highest id of each planted chain) is dropped in BOTH modes
    assert(ph == 0 && th == 0, s"hub survivors: pair=$ph transitive=$th")
    // pair-drop keeps the C endpoints; transitive collapses each chain
    // to its min id, so every C endpoint goes too
    assert(pe > 0, s"pair_drop must keep chain endpoints, got $pe")
    assert(te == 0, s"transitive must drop chain endpoints, got $te")
    assert(pt == tt + pe, s"survivor delta must be exactly the endpoints: $pt vs $tt + $pe")
  }

  test("q39: LSH vector near-dup finds the planted perturbed pairs and nothing else") {
    val nBase = math.min(500L, spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    val rows = SparkEntry.queries("q39_vector_near_dup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.contains("planted"), s"no planted pairs surfaced: $rows")
    val (nPlanted, minCos) = rows("planted")
    // seeded LSH: misses are deterministic, but allow a small recall
    // slack rather than pinning the exact table draw
    assert(nPlanted >= (nBase * 9) / 10, s"found $nPlanted of $nBase planted pairs")
    assert(minCos >= 0.95, s"planted pair below threshold: $minCos")
    // random embeddings have max natural cosine ~0.47 — nothing else
    // may clear 0.95
    assert(!rows.contains("other"), s"non-planted pairs above threshold: $rows")
  }

  test("q42: SRP near-dup finds the planted perturbed pairs and nothing else") {
    val nBase = math.min(500L, spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    val rows = SparkEntry.queries("q42_srp_near_dup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.contains("planted"), s"no planted pairs surfaced: $rows")
    val (nPlanted, minCos) = rows("planted")
    // two OR-ed signature tables cover the recall tail; allow slack
    // rather than pinning the exact hash draw
    assert(nPlanted >= (nBase * 9) / 10, s"found $nPlanted of $nBase planted pairs")
    assert(minCos >= 0.999, s"planted pair below threshold: $minCos")
    assert(!rows.contains("other"), s"non-planted pairs above threshold: $rows")
  }

  test("q53: int8 quantization keeps KNN recall and direction fidelity") {
    val r = SparkEntry.queries("q53_quantized_recall")(spark, sfDir).head()
    assert(r.getAs[Long]("n_queries") == 20L)
    assert(r.getAs[Double]("avg_recall") >= 0.8, s"avg recall ${r.getAs[Double]("avg_recall")}")
    assert(r.getAs[Double]("min_self_cos") >= 0.999,
      s"direction fidelity ${r.getAs[Double]("min_self_cos")}")
  }

  test("q40: incremental dropSeen removes every planted echo, keeps fresh batch rows") {
    val rows = SparkEntry.queries("q40_incremental_dedup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("fresh"), s"echo cohorts survived: $rows")
    assert(rows("fresh") > 0)
  }

  test("q36 dim-chain plan: both dimensions broadcast, no sort-merge join") {
    val plan = SparkEntry.queries("q36_supplier_region")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2, s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must not shuffle for dims:\n$plan")
  }
}
