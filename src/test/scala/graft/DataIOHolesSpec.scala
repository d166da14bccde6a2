package graft

import org.apache.spark.sql.functions._
import graft.conf.GraftConfig
import graft.sources.DataIO
import graft.operators.Ops

/** Round-1 verdict test holes: S1 JDBC option assembly (pure, no DB),
  * K4 hive sink against the in-memory catalog, R15 partitionIterator. */
class DataIOHolesSpec extends SparkTestBase {

  // ------------------------------------------------------------ S1 JDBC

  private def jdbcConf(extra: String = "") = GraftConfig.parse(
    s"""url = "jdbc:postgresql://db/x"
       |table = facts
       |user = u
       |$extra
       |""".stripMargin)

  test("jdbcReadOptions: basic table read with default fetch size (S1)") {
    val o = DataIO.jdbcReadOptions(jdbcConf())
    assert(o("dbtable") == "facts")
    assert(o("fetchsize") == DataIO.DefaultFetchSize.toString)
    assert(o("user") == "u")
    assert(!o.contains("partitionColumn"))
  }

  test("jdbcReadOptions: explicit bounds pass through UNswapped (core.py:437-438 bug fixed)") {
    val o = DataIO.jdbcReadOptions(jdbcConf(
      "partition-column = id\nlower-bound = 5\nupper-bound = 99\nnum-partitions = 7"))
    assert(o("partitionColumn") == "id")
    assert(o("lowerBound") == "5")
    assert(o("upperBound") == "99")
    assert(o("numPartitions") == "7")
  }

  test("jdbcReadOptions: probed bounds map min->lower, max->upper") {
    val conf = jdbcConf("partition-column = id\nnum-partitions = 8")
    assert(DataIO.jdbcNeedsProbe(conf))
    val o = DataIO.jdbcReadOptions(conf, probedBounds = Some((3L, 42L)))
    assert(o("lowerBound") == "3") // min
    assert(o("upperBound") == "42") // max
    intercept[IllegalStateException] { DataIO.jdbcReadOptions(conf) }
    // reference gate (core.py:431): no num-partitions → unpartitioned read
    assert(!DataIO.jdbcNeedsProbe(jdbcConf("partition-column = id")))
    assert(!DataIO.jdbcReadOptions(jdbcConf("partition-column = id")).contains("partitionColumn"))
  }

  test("jdbcTable wraps a query as (q) as a unless already aliased (core.py:424-427)") {
    val qc = GraftConfig.parse("url = u\nquery = \"select * from t where x > 0\"")
    assert(DataIO.jdbcTable(qc) == "(select * from t where x > 0) as a")
    // already-aliased queries pass through untouched
    assert(DataIO.wrapJdbcQuery("(select 1) as z") == "(select 1) as z")
    // bare table names via `query` wrap too (valid SQL), `table` stays raw
    assert(DataIO.wrapJdbcQuery("facts") == "(facts) as a")
    val probe = DataIO.jdbcProbeSql("id", DataIO.jdbcTable(qc))
    assert(probe == "(select min(id) mn, max(id) mx from (select * from t where x > 0) as a) b")
    assert(!probe.contains(") as a x")) // the double-alias bug
  }

  test("reference README config shape works verbatim (storage/query/conn)") {
    // the Greenplum-to-Hive source example, reference README.md:126-140
    val conf = GraftConfig.parse(
      """storage: jdbc
        |query: "jdbc_schema.jdbc_table"
        |conn: {
        |  url: "jdbc:postgresql://HOST:PORT/DATABASE"
        |  user: gp_user
        |}
        |partition-column: gp_segment_id
        |num-partitions: 50
        |lower-bound: 0
        |upper-bound: 95
        |""".stripMargin)
    val o = DataIO.jdbcReadOptions(conf)
    assert(o("url") == "jdbc:postgresql://HOST:PORT/DATABASE")
    assert(o("user") == "gp_user")
    assert(o("dbtable") == "(jdbc_schema.jdbc_table) as a")
    assert(o("partitionColumn") == "gp_segment_id")
    assert(o("lowerBound") == "0" && o("upperBound") == "95")
    assert(o("numPartitions") == "50")
  }

  test("reference keys read/write files: storage + query as path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-refkeys").toString
    val df = spark.read.parquet(s"$sfDir/region.parquet")
    DataIO.write(df, GraftConfig.parse(
      s"""storage: local
         |query: $dir/out
         |dataset-store-format: parquet
         |write-mode: overwrite
         |""".stripMargin))
    val back = DataIO.read(spark, GraftConfig.parse(
      s"""storage: local
         |query: $dir/out
         |""".stripMargin))
    assert(back.count() == df.count())
  }

  test("jdbcWriteProps assembles only the configured credentials (K3)") {
    val p = DataIO.jdbcWriteProps(jdbcConf("password = s3cret\ndriver = org.postgresql.Driver"))
    assert(p.getProperty("user") == "u")
    assert(p.getProperty("password") == "s3cret")
    assert(p.getProperty("driver") == "org.postgresql.Driver")
    val minimal = DataIO.jdbcWriteProps(GraftConfig.parse("url = u\ntable = t"))
    assert(minimal.isEmpty)
  }

  // ------------------------------------------------------- K4 hive sink

  test("hive sink: saveAsTable then column-reordered insertInto (K4, core.py:210-216,234-250)") {
    val table = "graft_k4_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val df = spark.read.parquet(s"$sfDir/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
      // first write: table absent -> saveAsTable
      DataIO.write(df, GraftConfig.parse(
        s"storage-type = hive\ntable = $table\ndataset-store-format = parquet"))
      assert(spark.catalog.tableExists(table))
      assert(spark.table(table).count() == 25)
      // second write with SHUFFLED column order: must reorder to table order
      val shuffled = df.select("n_name", "n_regionkey", "n_nationkey")
      DataIO.write(shuffled, GraftConfig.parse(
        s"storage-type = hive\ntable = $table\ndataset-store-format = parquet"))
      val out = spark.table(table)
      assert(out.count() == 50) // default append (core.py:211)
      assert(out.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
      // values landed in the right columns despite the input order
      assert(out.filter(col("n_name") === "NATION_0").count() == 2)
      assert(out.filter(col("n_name").startsWith("NATION_")).count() == 50)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("hive sink honors overwrite write-mode on existing table") {
    val table = "graft_k4_overwrite"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val df = spark.read.parquet(s"$sfDir/region.parquet")
      DataIO.write(df, GraftConfig.parse(s"storage-type = hive\ntable = $table"))
      DataIO.write(df, GraftConfig.parse(
        s"storage-type = hive\ntable = $table\nwrite-mode = overwrite"))
      assert(spark.table(table).count() == df.count())
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("bucketed tables join without a shuffle (co-located join layout)") {
    val (t1, t2) = ("graft_bkt_orders", "graft_bkt_customer")
    spark.sql(s"DROP TABLE IF EXISTS $t1"); spark.sql(s"DROP TABLE IF EXISTS $t2")
    try {
      DataIO.write(spark.read.parquet(s"$sfDir/orders.parquet"),
        GraftConfig.parse(
          s"storage = hive\ntable = $t1\ndataset-store-format = parquet\nbucket-by = [o_custkey]\nn-buckets = 4"))
      DataIO.write(spark.read.parquet(s"$sfDir/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey"),
        GraftConfig.parse(
          s"storage = hive\ntable = $t2\ndataset-store-format = parquet\nbucket-by = [o_custkey]\nn-buckets = 4"))
      val joined = spark.table(t1).join(spark.table(t2), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t1"); spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  // -------------------------------------------------- R15 partition iter

  test("partitionIterator streams all rows in partition order (R15)") {
    val df = spark.read.parquet(s"$sfDir/nation.parquet").repartition(4)
    val rows = Ops.partitionIterator(df).toSeq
    assert(rows.size == 25)
    assert(rows.map(_.getAs[Int]("n_nationkey")).toSet == (0 until 25).toSet)
  }
}
