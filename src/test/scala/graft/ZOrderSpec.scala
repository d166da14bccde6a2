package graft

import graft.conf.GraftConfig
import graft.operators.ZOrder
import graft.sources.DataIO
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("zorder").toString

  test("bucketize counts edges at or below the value; nulls land in bucket 0") {
    val edges = Seq(10.0, 20.0)
    val got = Seq[Option[Double]](Some(5), Some(10), Some(15), Some(25), None)
      .toDF("v")
      .select(ZOrder.bucketize(col("v"), edges).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 1L, 2L, 0L))
  }

  test("interleave produces the Morton code (hand-computed, 2 cols x 2 bits)") {
    // x=0b10, y=0b01: bit i of col j lands at i*2+j
    // x bit0=0->pos0, x bit1=1->pos2, y bit0=1->pos1, y bit1=0->pos3 = 0b0110 = 6
    val got = Seq((2L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), bits = 2).as("z"))
      .as[Long].head()
    assert(got == 6L)
    // identity on a single column
    val one = Seq(5L).toDF("x")
      .select(ZOrder.interleave(Seq(col("x")), bits = 3).as("z"))
      .as[Long].head()
    assert(one == 5L)
  }

  test("interleave rejects key overflow and bad bit widths") {
    val c = Seq(col("a"), col("b"), col("c"), col("d"), col("e"))
    intercept[IllegalArgumentException](ZOrder.interleave(c, bits = 13)) // 65 > 63
    intercept[IllegalArgumentException](ZOrder.interleave(Seq(col("a")), bits = 0))
    intercept[IllegalArgumentException](ZOrder.withZKey(
      spark.range(1).select(col("id"), col("id").as("__zkey")), Seq("id")))
  }

  test("z-order layout prunes files on BOTH columns; linear sort only on one") {
    // 64x64 independent uniform grid — the adversarial case for a
    // single-column sort (every x-file spans all of y)
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zdir = s"${tmp()}/z"
    DataIO.write(grid, GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$zdir"
         |dataset-store-format = parquet
         |write-mode = overwrite
         |zorder-by = [x, y]
         |zorder-bits = 6
         |n-partitions = 16""".stripMargin))
    val ldir = s"${tmp()}/linear"
    DataIO.write(grid, GraftConfig.parse(
      s"""storage-type = local
         |dataset-dir = "$ldir"
         |dataset-store-format = parquet
         |write-mode = overwrite
         |range-by = [x]
         |sort-within-partitions = [x, y]
         |n-partitions = 16""".stripMargin))
    def spans(dir: String, c: String): Seq[(Long, Long)] =
      spark.read.parquet(dir).groupBy(input_file_name())
        .agg(min(c).as("lo"), max(c).as("hi"))
        .select("lo", "hi").as[(Long, Long)].collect().toSeq
    // average file-hit count over ALL 64 point filters on a column —
    // robust to the sampling jitter in repartitionByRange boundaries
    // (a single unaligned file can double one point's hit count)
    def avgHits(s: Seq[(Long, Long)]): Double =
      (0L until 64L).map(v => s.count { case (lo, hi) => lo <= v && v <= hi })
        .sum / 64.0
    val (zx, zy) = (spans(zdir, "x"), spans(zdir, "y"))
    val ly = spans(ldir, "y")
    assert(zx.size == 16 && zy.size == 16)
    // a point filter on EITHER z-column skips at least half the files on
    // average (ideal 16x16 tiling touches 4/16; boundary jitter at most
    // doubles a span, so <=8 is the safe half-way bound)
    assert(avgHits(zx) <= 8, s"x point filters hit ${avgHits(zx)}/16 z files")
    assert(avgHits(zy) <= 8, s"y point filters hit ${avgHits(zy)}/16 z files")
    // the linear layout cannot skip anything on the secondary column
    assert(avgHits(ly) == ly.size, "every x-sorted file spans all of y")
    // the layout is a pure reordering
    assert(spark.read.parquet(zdir).count() == 4096)
  }

  test("bucketize at bits=12 (4095 edges) plans and evaluates — no expression blowup") {
    // the former chained-when fold built 2^bits-1 nested nodes per
    // column; the BucketCount binary-search expression is O(1) nodes,
    // so bits=12 must both plan quickly and stay codegen'd
    val edges = (1 until 4096).map(_.toDouble)
    val df = spark.range(8192)
      .select(ZOrder.bucketize(col("id").cast("double"), edges).as("b"))
    // `*(n)` is the WholeStageCodegen marker in the compact plan form
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_bucket_count"),
      s"fell out of codegen:\n$plan")
    // value check: bucket of v = #edges <= v = min(floor(v), 4095)
    val got = df.as[Long].collect()
    (0 until 8192).foreach { v =>
      assert(got(v) == math.min(v, 4095).toLong, s"v=$v got ${got(v)}")
    }
    // and the full layout path accepts bits=12 end-to-end
    val keyed = ZOrder.withZKey(
      spark.range(1000).select(col("id").cast("double").as("a"),
        (col("id") % 37).cast("double").as("b")), Seq("a", "b"), bits = 12)
    assert(keyed.select("__zkey").distinct().count() > 1)
  }

  test("zorder-by rejects sort-within-partitions (it would discard the curve order)") {
    val e = intercept[IllegalArgumentException] {
      DataIO.write(spark.range(10).toDF(), GraftConfig.parse(
        s"""storage-type = local
           |dataset-dir = "${tmp()}/x"
           |zorder-by = [id]
           |sort-within-partitions = [id]""".stripMargin))
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("zorder-by is mutually exclusive with range-by and distribute-by") {
    val e = intercept[IllegalArgumentException] {
      DataIO.write(spark.range(10).toDF(), GraftConfig.parse(
        s"""storage-type = local
           |dataset-dir = "${tmp()}/x"
           |zorder-by = [id]
           |range-by = [id]""".stripMargin))
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }
}
