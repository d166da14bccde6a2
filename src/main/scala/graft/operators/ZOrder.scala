package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout: multi-column data skipping.
  *
  * `range-by` (DataIO K0) gives perfect file-level pruning on ONE sort
  * column and none on any other — each file spans the full range of every
  * secondary column. Z-ordering interleaves the bits of per-column rank
  * buckets so files cluster in EVERY z-dimension at once: a selective
  * filter on any one of the z-columns touches ~N^((d-1)/d) of N files
  * instead of all of them. This is the standard multi-dimensional layout
  * for filter-heavy 100 TB readers (the same design as Delta OSS
  * `OPTIMIZE ZORDER BY`, built here from public Spark primitives).
  *
  * Mechanics (all declarative, codegen'd — no UDFs):
  *  1. one small aggregate computes `2^bits - 1` approx-percentile edges
  *    per column (mergeable sketch, one pass; driver egress bounded by
  *    `cols × 2^bits` doubles);
  *  2. each value maps to its rank bucket by counting edges ≤ value —
  *    equi-DEPTH buckets, so skewed columns still spread over all 2^bits
  *    codes (equi-width interleaving collapses under skew);
  *  3. bucket bits interleave into one long z-key (column shift/or
  *    arithmetic, whole-stage codegen);
  *  4. `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)` lays
  *    files out along the curve; the key is dropped before the write.
  *
  * Scale note: the edge aggregate is one extra scan over the z-columns
  * only (projection-pruned), the same two-pass shape as the continuous
  * histogram; the layout write itself is the one range shuffle any
  * sorted write pays.
  */
object ZOrder {

  val MaxBits = 16 // 4 cols × 16 bits = 64-bit z-key ceiling

  /** Rank bucket of `c` given ascending duplicate-free `edges`: the
    * count of edges ≤ value — a native binary-search expression
    * (`graft.functions.BucketCount`), O(1) plan nodes and O(log n) per
    * row, inside whole-stage codegen. (The original chained-`when` fold
    * was O(2^bits) nested nodes per column — a Catalyst/Janino blowup
    * at bits>10.) Nulls sort to bucket 0 (lowest curve corner) so they
    * cluster too. */
  def bucketize(c: Column, edges: Seq[Double]): Column =
    if (edges.isEmpty) lit(0L)
    else coalesce(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.BucketCount(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(c.cast("double")),
          // dedup+sort defensively: binary search needs ascending
          // distinct edges; duplicate edges would double-count a rank
          edges.distinct.sorted.toArray)),
      lit(0L))

  /** Interleave `bits` bits of each bucket column into one long: bit i
    * of column j lands at position i * nCols + j — the Morton code.
    *
    * PRECONDITION: every bucket value must lie in [0, 2^bits) — only
    * the low `bits` bits are inspected, so a larger value would alias
    * onto another z-cell silently. `withZKey` guarantees this by
    * construction (bucketize is bounded by its edge count, ≤ 2^bits−1)
    * and asserts it; direct callers own the check. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "interleave needs at least one column")
    require(bits > 0 && bits <= MaxBits, s"bits must be in [1,$MaxBits], got $bits")
    require(buckets.size * bits <= 63,
      s"z-key overflow: ${buckets.size} cols × $bits bits > 63")
    val n = buckets.size
    val parts =
      for {
        i <- 0 until bits
        (b, j) <- buckets.zipWithIndex
      } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    parts.reduce(_.bitwiseOR(_))
  }

  /** Project a z-key column named `keyName` onto `df`, bucketing each of
    * `cols` into `2^bits` equi-depth ranks via one approx-percentile
    * aggregate. Columns must be castable to double (numeric / date /
    * timestamp) — the standard z-order domain. */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 8,
      keyName: String = "__zkey"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(!df.columns.contains(keyName),
      s"zorder: input already has a '$keyName' column")
    val nEdges = (1 << bits) - 1
    val probs = (1 to nEdges).map(i => i.toDouble / (1 << bits))
    // one pass, projection-pruned to the z-columns; mergeable sketch agg
    val edgeRow = df
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
      .agg(
        percentile_approx(col(cols.head), typedLit(probs), lit(10000)).as(cols.head),
        cols.tail.map(c =>
          percentile_approx(col(c), typedLit(probs), lit(10000)).as(c)): _*)
      .head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val edges = Option(edgeRow.getSeq[Double](i)).getOrElse(Seq.empty).distinct
      // interleave's aliasing precondition: bucket ∈ [0, 2^bits) ⇐
      // #edges ≤ 2^bits − 1 (bucketize returns a count of edges ≤ v)
      require(edges.size <= nEdges,
        s"zorder: ${edges.size} edges for '$c' exceed 2^$bits-1 = $nEdges")
      bucketize(col(c), edges)
    }
    df.withColumn(keyName, interleave(buckets, bits))
  }

  /** Lay `df` out along the z-curve of `cols`: range-partition into
    * `nPartitions` files (or Spark's default when None) and sort rows
    * inside each by the curve, then drop the key. Write the result with
    * any file sink; parquet/orc footer min/max on every z-column then
    * prune multi-dimensionally. */
  def layout(df: DataFrame, cols: Seq[String], bits: Int = 8,
      nPartitions: Option[Int] = None): DataFrame = {
    val keyed = withZKey(df, cols, bits)
    val ranged = nPartitions match {
      case Some(n) => keyed.repartitionByRange(n, col("__zkey"))
      case None    => keyed.repartitionByRange(col("__zkey"))
    }
    ranged.sortWithinPartitions("__zkey").drop("__zkey")
  }
}
