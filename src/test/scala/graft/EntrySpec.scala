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

  test("q36 dim-chain plan: both dimensions broadcast, no sort-merge join") {
    val plan = SparkEntry.queries("q36_supplier_region")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2, s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must not shuffle for dims:\n$plan")
  }
}
