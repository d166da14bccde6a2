package graft

import graft.conf.GraftConfig
import graft.sources.DataIO
import java.nio.file.Files

class DataIOSpec extends SparkTestBase {

  private def tmp(): String = Files.createTempDirectory("graft-io").toString

  test("local source reads parquet with post-read limit + sample (S2,S7,S8)") {
    val c = GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$sfDir/orders.parquet"
         |dataset-store-format = parquet
         |limit = 50""".stripMargin)
    assert(DataIO.read(spark, c).count() == 50)
  }

  test("sample-method = digest: S7's capability through the deterministic " +
      "md5 sampler (Ops.hashSample recipe); rng stays the default; " +
      "misconfigs refuse loudly") {
    def conf(extra: String) = GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$sfDir/orders.parquet"
         |sample = 0.25
         |$extra""".stripMargin)
    val digest = DataIO.read(spark, conf(
      "sample-method = digest\nsample-id-column = o_orderkey\nsample-salt = s1"))
    // identical to the shared hashSample recipe — the engine-portable
    // contract the q150 oracle replays
    val want = graft.operators.Ops.hashSample(
      spark.read.parquet(s"$sfDir/orders.parquet"), "o_orderkey", 0.25, "s1")
    assert(digest.exceptAll(want).isEmpty && want.exceptAll(digest).isEmpty)
    assert(digest.count() > 0)
    // deterministic: a second read is row-identical (the RNG path is
    // seeded but engine/partitioning-specific — this one is a pure
    // function of (id, salt))
    val again = DataIO.read(spark, conf(
      "sample-method = digest\nsample-id-column = o_orderkey\nsample-salt = s1"))
    assert(again.exceptAll(digest).isEmpty)
    // misconfigs: digest without an id column; unknown method
    val e1 = intercept[IllegalArgumentException](
      DataIO.read(spark, conf("sample-method = digest")))
    assert(e1.getMessage.contains("sample-id-column"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      DataIO.read(spark, conf("sample-method = bogus")))
    assert(e2.getMessage.contains("rng | digest"), e2.getMessage)
  }

  test("json and orc roundtrip through the format passthrough (S2/K1)") {
    for (fmt <- Seq("json", "orc")) {
      val dir = s"${tmp()}/data"
      val src = GraftConfig.parse(
        s"""storage-type = local
           |dataset-dir = "$sfDir/nation.parquet"""".stripMargin)
      val sink = GraftConfig.parse(
        s"""storage-type = local
           |dataset-dir = "$dir"
           |dataset-store-format = $fmt
           |write-mode = overwrite""".stripMargin)
      DataIO.write(DataIO.read(spark, src), sink)
      val back = DataIO.read(spark, GraftConfig.parse(
        s"""storage-type = local
           |dataset-dir = "$dir"
           |dataset-store-format = $fmt""".stripMargin))
      assert(back.count() == 25, s"format $fmt")
      assert(back.select("n_name").collect().map(_.getString(0)).sorted.head == "NATION_0")
    }
  }

  test("transform-sql applies SQL over dataset_temp (S6)") {
    val c = GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$sfDir/orders.parquet"
         |transform-sql = "select o_orderkey from dataset_temp where o_orderstatus = 'F'"
         |""".stripMargin)
    val df = DataIO.read(spark, c)
    assert(df.columns.toSeq == Seq("o_orderkey"))
    assert(df.count() > 0)
  }

  test("distribute-by repartitions by key (S5)") {
    val c = GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$sfDir/orders.parquet"
         |distribute-by = o_orderpriority
         |n-partitions = 3""".stripMargin)
    assert(DataIO.read(spark, c).rdd.getNumPartitions == 3)
  }

  test("hive source runs arbitrary SQL (S4)") {
    spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("nation_v")
    val c = GraftConfig.parse("""storage-type = hive
                                |query = "select count(*) n from nation_v"""".stripMargin)
    assert(DataIO.read(spark, c).collect()(0).getLong(0) == 25)
  }

  test("file sink roundtrip with write-mode + partition-by (K1/K2)") {
    val dir = tmp() + "/out"
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    DataIO.write(df, GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$dir"
         |dataset-store-format = parquet
         |write-mode = overwrite
         |partition-by = [o_orderpriority]""".stripMargin))
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("range-by + sort-within-partitions lay out disjoint, sorted files (data skipping)") {
    import org.apache.spark.sql.functions._
    val dir = s"${tmp()}/ranged"
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    DataIO.write(df, GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$dir"
         |dataset-store-format = parquet
         |write-mode = overwrite
         |range-by = [o_orderkey]
         |sort-within-partitions = [o_orderkey]
         |n-partitions = 4""".stripMargin))
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    // files hold DISJOINT key ranges — the property parquet footer
    // min/max pruning needs (hash layout would interleave every file)
    val spans = back.groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length > 1, "expected multiple files")
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: ${spans.toSeq}")
      case _ =>
    }
    // a selective key filter prunes at the file level: the matching
    // key lives in exactly one file span
    val k = spans.head._2 // a key from the first file
    val hits = spans.count { case (lo, hi) => lo <= k && k <= hi }
    assert(hits == 1, s"key $k should fall in exactly one file span")
  }

  test("disabled target writes nothing (K0)") {
    val dir = tmp() + "/never"
    DataIO.write(spark.range(5).toDF(),
      GraftConfig.parse(s"""storage-type = local
                           |disabled = true
                           |dataset-dir = "$dir"""".stripMargin))
    assert(!new java.io.File(dir).exists())
  }

  test("single-csv sink writes one file with header (K5); source reads it back (S3)") {
    val path = tmp() + "/out.csv"
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    DataIO.write(df, GraftConfig.parse(
      s"""storage-type = single-csv
         |file-path = "$path"""".stripMargin))
    val lines = Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.size == 26) // header + 25 nations
    assert(lines.get(0) == "n_nationkey\tn_name\tn_regionkey")
    val back = DataIO.read(spark, GraftConfig.parse(
      s"""storage-type = single-csv
         |file-path = "$path"""".stripMargin))
    assert(back.count() == 25)
  }

  test("max-records-per-file caps shard size without changing row content") {
    val dir = tmp() + "/shards"
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    DataIO.write(df, GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$dir"
         |dataset-store-format = parquet
         |n-partitions = 2
         |max-records-per-file = 100""".stripMargin))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 2, s"partitions must split into shards: ${files.length}")
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 100, s"${f.getName} holds $n rows")
    }
    assert(spark.read.parquet(dir).count() == df.count())
    intercept[IllegalArgumentException] {
      DataIO.write(df, GraftConfig.parse(
        s"""storage-type = local
           |dataset-dir = "$dir-bad"
           |max-records-per-file = 0""".stripMargin))
    }
    // file-only knobs fail fast on non-file sinks instead of being
    // silently ignored (review finding)
    val e = intercept[IllegalArgumentException] {
      DataIO.write(df, GraftConfig.parse(
        """storage-type = hive
          |table = t
          |max-records-per-file = 100""".stripMargin))
    }
    assert(e.getMessage.contains("local/hdfs"), e.getMessage)
  }

  test("bloom-filter-columns: parquet footers carry blooms for the listed " +
      "columns only; non-parquet formats rejected") {
    val dir = tmp() + "/bloomout"
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    DataIO.write(df, GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$dir"
         |dataset-store-format = parquet
         |n-partitions = 1
         |bloom-filter-columns = [n_name]""".stripMargin))
    val pf = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(pf.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val cols = reader.getRowGroups.get(0).getColumns.asScala
        .map(c => c.getPath.toDotString -> (c.getBloomFilterOffset >= 0)).toMap
      assert(cols("n_name"), s"n_name must carry a bloom filter: $cols")
      assert(!cols("n_nationkey"), s"unlisted columns must not: $cols")
    } finally reader.close()
    // read-back equivalence (blooms are a pure skipping aid)
    assert(spark.read.parquet(dir).count() == df.count())
    val err = intercept[IllegalArgumentException] {
      DataIO.write(df, GraftConfig.parse(
        s"""storage-type = local
           |dataset-dir = "$dir-orc"
           |dataset-store-format = orc
           |bloom-filter-columns = [n_name]""".stripMargin))
    }
    assert(err.getMessage.contains("parquet"), err.getMessage)
  }

  test("streaming csv sink matches single-csv content (K6)") {
    val p1 = tmp() + "/a.csv"
    val p2 = tmp() + "/b.csv"
    val df = spark.read.parquet(s"$sfDir/region.parquet").orderBy("r_regionkey")
    DataIO.writeSingleCsv(df, p1, "\t")
    DataIO.writeStreamingCsv(df, p2, "\t")
    assert(Files.readString(java.nio.file.Paths.get(p1)) ==
      Files.readString(java.nio.file.Paths.get(p2)))
  }
}
