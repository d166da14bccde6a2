package graft.datadiff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection (SURVEY.md §2 R11–R14; reference
  * `sparktools/datadiff.py:1-56`).
  *
  * Re-expressed Spark-first: histograms are `groupBy(bin).count()` frames
  * that stay distributed, and total-variation distance is a full-outer
  * join + aggregate over them — no `rdd.collectAsMap`, so the key set may
  * be arbitrarily large. The reference's driver-side `Map` forms are kept
  * as thin `collect` wrappers for parity, bounded by `maxBins` rows.
  *
  * Scale notes (100 TB design):
  *  - hashed binning (crc32 % maxBins, reference `datadiff.py:5`) caps the
  *    shuffle width at `maxBins` keys regardless of column cardinality;
  *  - each histogram is one partial-aggregated shuffle of ≤ maxBins keys;
  *  - the continuous path needs one extra min/max pass to fix bin edges
  *    (same two-pass scheme as the reference, `datadiff.py:31-33`); a
  *    one-pass sketch (t-digest-style TypedImperativeAggregate) is the
  *    future upgrade if the extra scan ever dominates;
  *  - TVD joins two ≤ maxBins-row aggregates — negligible at any scale.
  */
object DataDiff {

  /** R12 default binning: `crc32(cast(col as string)) pmod maxBins`
    * (reference `datadiff.py:5`; `pmod` is the safe spelling of `%`). */
  def crc32Bin(c: Column, maxBins: Int): Column =
    pmod(crc32(c.cast("string")), lit(maxBins.toLong))

  /** Single-partition normalization window over a literal key: the
    * histogram totals below run over ≤ maxBins grouped rows — bounded
    * by construction — and the literal partition key states that in
    * the plan instead of tripping `WindowExec: No Partition Defined`,
    * keeping that warning meaningful for genuinely unbounded windows. */
  private val normW = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))

  /** R12 hashed discrete histogram as a distributed frame:
    * `(bin string, cnt long, freq double)`, null bin folded to "None"
    * (reference `datadiff.py:8-11`). `bin` accepts any expression so
    * callers can swap crc32 for an engine-portable arithmetic hash.
    *
    * The single-partition normalization window is safe ONLY because
    * the grouped histogram is ≤ maxBins rows (hashing bounds the key
    * set); callers passing an unbounded `bin` expression should cap it. */
  def histogramDF(df: DataFrame, bin: Column): DataFrame =
    df.select(coalesce(bin.cast("string"), lit("None")).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("freq", col("cnt") / sum("cnt").over(normW))

  def hashHistogramDF(df: DataFrame, columnName: String, maxBins: Int = 1000): DataFrame =
    histogramDF(df, crc32Bin(col(columnName), maxBins))

  /** Driver-side Map form for reference parity (`datadiff.py:4-15`) —
    * bounded at `maxBins` rows by construction. */
  def hashHistogram(df: DataFrame, columnName: String, maxBins: Int = 1000): Map[String, Double] =
    hashHistogramDF(df, columnName, maxBins)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

  /** R11 equi-width bin edges for a numeric column: one min/max aggregate
    * pass (the same edge-fixing pass as `rdd.histogram(n)`,
    * `datadiff.py:32`). Returns maxBins+1 edges; null column → empty. */
  def equiWidthEdges(df: DataFrame, columnName: String, maxBins: Int): Array[Double] = {
    val row = df.agg(
      min(col(columnName).cast("double")).as("mn"),
      max(col(columnName).cast("double")).as("mx")).head()
    if (row.isNullAt(0)) return Array.empty
    val (mn, mx) = (row.getDouble(0), row.getDouble(1))
    if (mn == mx) Array(mn, mx)
    else (0 to maxBins).map(i => mn + (mx - mn) * i / maxBins).toArray
  }

  /** Bin-index arithmetic in this module assumes EQUI-WIDTH edges (the
    * only kind it produces); arbitrary edges would silently mis-bin. */
  private def requireEquiWidth(edges: Array[Double], caller: String): Unit = {
    require(edges.length >= 2, s"need >=2 bin edges, got ${edges.length}")
    if (edges.length > 2) {
      val w = (edges.last - edges.head) / (edges.length - 1)
      val uniform = edges.sliding(2).forall { case Array(a, b) =>
        math.abs((b - a) - w) <= math.max(1e-9, math.abs(w) * 1e-9)
      }
      require(uniform, s"$caller requires equi-width edges (use equiWidthEdges)")
    }
  }

  /** R11 continuous histogram against fixed `edges`: values binned
    * `[e_i, e_{i+1})`, last edge inclusive, out-of-range and null values
    * dropped — `rdd.histogram(buckets)` semantics, computed as a single
    * groupBy instead of an RDD pass. Returns `(bin long, cnt long,
    * freq double)` over occupied bins. */
  def continuousHistogramDF(df: DataFrame, columnName: String, edges: Array[Double]): DataFrame = {
    requireEquiWidth(edges, "continuousHistogramDF")
    val bins = edges.length - 1
    val (lo, hi) = (edges.head, edges.last)
    val idx = least(
      floor((col("x") - lit(lo)) / lit((hi - lo) / bins)).cast("long"),
      lit(bins.toLong - 1))
    df.select(col(columnName).cast("double").as("x"))
      .filter(col("x").isNotNull && col("x") >= lo && col("x") <= hi)
      .select(idx.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("freq", col("cnt") / sum("cnt").over(normW))
  }

  /** Column profile — the standard ingestion data-quality sweep: per
    * column, row/null counts, distinct cardinality, min/max (stringified
    * for a uniform schema). ONE scan of the table: all per-column
    * aggregates run in a single global Aggregate, then `stack` unpivots
    * the 1-row result (driver-free, ≤ |cols| output rows).
    *
    * `exact = false` (default) uses `approx_count_distinct` (HLL++):
    * partial-aggregated, no expand — the 100 TB shape. `exact = true`
    * uses `count(DISTINCT)`: Catalyst plans an Expand of |cols| copies
    * of every row — exact but ×|cols| shuffle volume; use it for
    * verification on samples (the q35 oracle does). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    require(cols.forall(df.columns.contains), s"profile: unknown columns ${cols.filterNot(df.columns.contains)}")
    require(cols.distinct == cols, "profile: duplicate columns requested")
    // names are spliced into stack() SQL below and used as aliases —
    // backticks/quotes would break the parse, so reject them up front
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "profile: column names must not contain backticks or quotes")
    def src(c: String) = col(s"`$c`") // dotted names stay top-level refs
    def cd(c: Column) = if (exact) count_distinct(c) else approx_count_distinct(c)
    // EXACT path: TWO aggregates, not one (r15 optimization). Mixing
    // count_distinct with min/max-of-string in a single agg makes the
    // multi-distinct Expand rewrite plan as SortAggregate (string-typed
    // agg buffers are not hash-aggregable), which inserts two full
    // sorts of the x(cols+1)-expanded table by a (cols+1)-column key.
    // Split so the distinct counts (long buffers) keep the Expand dedup
    // in a HashAggregate and the min/max/null pass (grouping-free, so
    // SortAggregate needs no sort) stays a single scan. Both sides are
    // one-row frames; the cross join broadcasts one row. Values are
    // identical — same inputs, same aggregate semantics.
    // APPROX path: unchanged ONE-scan single aggregate —
    // approx_count_distinct is a mergeable sketch with no Expand
    // rewrite, so the split would only add a second scan
    // (DataDiffSpec pins the approx plan to one scan).
    // Snapshot caveat (r15 advice): the exact split scans df TWICE, so
    // a source mutated between the scans (or a non-deterministic
    // column) could pair __n/__distinct with __nulls/__min/__max from
    // different snapshots. Every caller here profiles immutable parquet
    // snapshots; persist/checkpoint df first if profiling a live or
    // non-deterministic source with exact = true.
    val one = if (exact) {
      val distinctCols = count(lit(1)).as("__n") +:
        cols.map(c => cd(src(c)).as(s"__distinct__$c"))
      val mmCols = cols.flatMap(c => Seq(
        // coalesce: sum over ZERO rows is null — an empty table must
        // profile as 0 nulls, not null nulls
        coalesce(sum(when(src(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls__$c"),
        min(src(c)).cast("string").as(s"__min__$c"),
        max(src(c)).cast("string").as(s"__max__$c")))
      df.agg(distinctCols.head, distinctCols.tail: _*)
        .crossJoin(df.agg(mmCols.head, mmCols.tail: _*))
    } else {
      val aggCols = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
        coalesce(sum(when(src(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls__$c"),
        cd(src(c)).as(s"__distinct__$c"),
        min(src(c)).cast("string").as(s"__min__$c"),
        max(src(c)).cast("string").as(s"__max__$c")))
      df.agg(aggCols.head, aggCols.tail: _*)
    }
    val stackArgs = cols.map(c =>
      s"'$c', `__nulls__$c`, `__distinct__$c`, `__min__$c`, `__max__$c`").mkString(", ")
    one.select(
      expr(s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)"),
      col("__n").as("n_rows"))
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
  }

  /** Column name for a quantile probability: 0.5 → `p50`, 0.95 → `p95`,
    * 0.999 → `p99_9`. Deterministic so callers (and oracles) can predict
    * the output schema from the probs they pass. */
  private[graft] def quantileColName(p: Double): String = {
    val s = BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString
    "p" + s.replace(".", "_")
  }

  /** Per-group quantiles with a scale-safe default.
    *
    * `exact = false` (default) uses `approx_percentile(col, probs,
    * accuracy)`: a mergeable Greenwald–Khanna quantile summary whose
    * aggregation buffer is bounded by `accuracy` (rank error ≤
    * n/accuracy), partial-aggregated map-side — the 100 TB shape.
    * `exact = true` uses `percentile(col, probs)`: Spark's exact
    * ImperativeAggregate, which buffers EVERY group value in the
    * aggregation buffer — a low-cardinality grouper at scale means a few
    * reducers each holding the full group (OOM by design). Use exact only
    * for verification on samples (the q34 oracle does; its linear
    * interpolation is bit-identical to DuckDB `quantile_cont`).
    *
    * All probs share ONE aggregate buffer (array form), not one buffer
    * per prob. Output: groupers ++ one double column per prob, named via
    * [[quantileColName]]. Empty `groupers` → a single global row. */
  def quantiles(df: DataFrame, valueCol: String, groupers: Seq[String], probs: Seq[Double],
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty, "quantiles: need at least one probability")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"quantiles: probs must be in [0,1], got $probs")
    require(probs.map(quantileColName).distinct.size == probs.size,
      s"quantiles: probs map to duplicate column names: $probs")
    require(accuracy > 0, s"quantiles: accuracy must be positive, got $accuracy")
    val probsArr = array(probs.map(lit): _*)
    val v = col(valueCol).cast("double")
    val agg =
      if (exact) percentile(v, probsArr).as("__q")
      else percentile_approx(v, probsArr, lit(accuracy)).as("__q")
    val grouped =
      if (groupers.isEmpty) df.agg(agg)
      else df.groupBy(groupers.map(col): _*).agg(agg)
    val qCols = probs.zipWithIndex.map { case (p, i) =>
      element_at(col("__q"), i + 1).cast("double").as(quantileColName(p))
    }
    grouped.select(groupers.map(col) ++ qCols: _*)
  }

  /** R14 histogram→map labeling (`datadiff.py:18-24`): bin edges →
    * `"lower_upper"` keys. Driver-side pure function over a collected
    * histogram — bounded at bins rows. */
  def histogramToMap(edges: Array[Double], counts: Map[Long, Long]): Map[String, Long] =
    (0 until edges.length - 1).map { i =>
      s"${edges(i)}_${edges(i + 1)}" -> counts.getOrElse(i.toLong, 0L)
    }.toMap

  /** R13 total-variation distance between two `(bin, …, freq)` histogram
    * frames: Σ|p1 − p2| / 2 over the union of bins (reference
    * `datadiff.py:36-56`), as a full-outer join + aggregate. Frequencies
    * are already normalized per side, so missing bins contribute their
    * full mass. */
  def tvdOfHistograms(h1: DataFrame, h2: DataFrame): Double = {
    val a = h1.select(col("bin").cast("string").as("bin"), col("freq").as("p1"))
    val b = h2.select(col("bin").cast("string").as("bin"), col("freq").as("p2"))
    a.join(b, Seq("bin"), "full_outer")
      .agg(coalesce( // empty inputs: sum over zero rows is null, TVD is 0
        sum(abs(coalesce(col("p1"), lit(0.0)) - coalesce(col("p2"), lit(0.0)))) / 2,
        lit(0.0)).as("tvd"))
      .head().getDouble(0)
  }

  /** R12+R13 discrete comparator (`datadiff.py:47-56`): TVD between the
    * crc32-hashed histograms of two columns. When both columns live in
    * the SAME DataFrame, prefer [[tvdSameTable]] — it reads the table
    * once instead of twice. */
  def discreteComparator(df1: DataFrame, col1: String, df2: DataFrame, col2: String,
      maxBins: Int = 1000): Double =
    tvdOfHistograms(hashHistogramDF(df1, col1, maxBins), hashHistogramDF(df2, col2, maxBins))

  /** Single-scan `(bin, p1, p2)` frequency pivot for two columns of ONE
    * table — the shared core of the same-table drift metrics: each row
    * contributes a (side, bin) pair per column via a 2-element explode;
    * one partially-aggregated shuffle bounded at 2×bins keys builds both
    * histograms, and a conditional pivot replaces the full-outer join.
    * At 100 TB this halves the table I/O vs. two hashHistogramDF passes
    * — the scan, not the ≤2×bins-row shuffle, is the cost that matters.
    * Bins absent from a side carry NULL (callers coalesce to 0). */
  private[graft] def binPivotSameTable(df: DataFrame, col1: String, col2: String,
      bin: Column => Column): DataFrame = {
    val pairs = df.select(explode(array(
      struct(lit(1).as("side"),
        coalesce(bin(col(col1)).cast("string"), lit("None")).as("bin")),
      struct(lit(2).as("side"),
        coalesce(bin(col(col2)).cast("string"), lit("None")).as("bin")))).as("e"))
      .select(col("e.side").as("side"), col("e.bin").as("bin"))
    val counts = pairs.groupBy("side", "bin").agg(count(lit(1)).as("cnt"))
      .withColumn("freq",
        col("cnt") / sum("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy("side")))
    counts.groupBy("bin")
      .agg(sum(when(col("side") === 1, col("freq"))).as("p1"),
        sum(when(col("side") === 2, col("freq"))).as("p2"))
  }

  /** TVD between two columns of ONE table in a single scan (see
    * [[binPivotSameTable]] for the plan shape). Returns a 1-row frame
    * (`tvd` double) so callers can stay lazy. */
  def tvdSameTableDF(df: DataFrame, col1: String, col2: String,
      bin: Column => Column = identity): DataFrame =
    binPivotSameTable(df, col1, col2, bin)
      .agg(coalesce(
        sum(abs(coalesce(col("p1"), lit(0.0)) - coalesce(col("p2"), lit(0.0)))) / 2,
        lit(0.0)).as("tvd"))

  /** Population stability index Σ (p1−p2)·ln(p1/p2) — the ML-ops
    * standard drift score (PSI < 0.1 stable, > 0.25 shifted). Zero/empty
    * bins are clamped to `eps` (the conventional fix for the log):
    * unlike TVD, PSI diverges on mass appearing from nothing, which is
    * exactly what makes it sensitive to new-category drift. Same
    * single-scan plan as [[tvdSameTableDF]]. */
  def psiSameTableDF(df: DataFrame, col1: String, col2: String,
      bin: Column => Column = identity, eps: Double = 1e-6): DataFrame = {
    val p1 = greatest(coalesce(col("p1"), lit(0.0)), lit(eps))
    val p2 = greatest(coalesce(col("p2"), lit(0.0)), lit(eps))
    binPivotSameTable(df, col1, col2, bin)
      .agg(coalesce(sum((p1 - p2) * log(p1 / p2)), lit(0.0)).as("psi"))
  }

  def psiSameTable(df: DataFrame, col1: String, col2: String,
      bin: Column => Column = identity, eps: Double = 1e-6): Double =
    psiSameTableDF(df, col1, col2, bin, eps).head().getDouble(0)

  /** PSI between two `(bin, …, freq)` histogram frames (join form, for
    * histograms of DIFFERENT tables — e.g. training vs serving). */
  def psiOfHistograms(h1: DataFrame, h2: DataFrame, eps: Double = 1e-6): Double = {
    val a = h1.select(col("bin").cast("string").as("bin"), col("freq").as("p1"))
    val b = h2.select(col("bin").cast("string").as("bin"), col("freq").as("p2"))
    val p1 = greatest(coalesce(col("p1"), lit(0.0)), lit(eps))
    val p2 = greatest(coalesce(col("p2"), lit(0.0)), lit(eps))
    a.join(b, Seq("bin"), "full_outer")
      .agg(coalesce(sum((p1 - p2) * log(p1 / p2)), lit(0.0)).as("psi"))
      .head().getDouble(0)
  }

  /** Jensen–Shannon divergence ½KL(p1‖m) + ½KL(p2‖m), m = (p1+p2)/2 —
    * the symmetric, always-finite drift score (∈ [0, ln 2]): zero bins
    * contribute 0 (0·log 0 = 0), so unlike PSI no eps clamp is needed,
    * and unlike KL it never diverges. Same single-scan plan as
    * [[tvdSameTableDF]]. */
  def jsdSameTableDF(df: DataFrame, col1: String, col2: String,
      bin: Column => Column = identity): DataFrame = {
    val p1 = coalesce(col("p1"), lit(0.0))
    val p2 = coalesce(col("p2"), lit(0.0))
    val m = (p1 + p2) / 2
    val term = (p: Column) => when(p > 0, p * log(p / m)).otherwise(lit(0.0))
    binPivotSameTable(df, col1, col2, bin)
      .agg(coalesce(sum(term(p1) / 2 + term(p2) / 2), lit(0.0)).as("jsd"))
  }

  def jsdSameTable(df: DataFrame, col1: String, col2: String,
      bin: Column => Column = identity): Double =
    jsdSameTableDF(df, col1, col2, bin).head().getDouble(0)

  /** Kolmogorov–Smirnov statistic max|CDF1 − CDF2| between two numeric
    * columns of ONE table, over shared equi-width `edges` (from
    * [[equiWidthEdges]]); values outside the edge range are dropped and
    * each side normalizes by its own in-range total (the same
    * conventions as [[continuousComparator]]). One scan; the CDF
    * cumulative window runs unpartitioned over ≤ bins rows — bounded by
    * construction, same argument as [[histogramDF]]'s normalization. */
  def ksContinuousSameTableDF(df: DataFrame, col1: String, col2: String,
      edges: Array[Double]): DataFrame = {
    requireEquiWidth(edges, "ksContinuousSameTableDF")
    val bins = edges.length - 1
    val (lo, hi) = (edges.head, edges.last)
    val idx = least(
      floor((col("x") - lit(lo)) / lit((hi - lo) / bins)).cast("long"),
      lit(bins.toLong - 1))
    val pairs = df.select(explode(array(
      struct(lit(1).as("side"), col(col1).cast("double").as("x")),
      struct(lit(2).as("side"), col(col2).cast("double").as("x")))).as("e"))
      .select(col("e.side").as("side"), col("e.x").as("x"))
      .filter(col("x").isNotNull && col("x") >= lo && col("x") <= hi)
      .select(col("side"), idx.as("bin"))
    val freqs = pairs.groupBy("side", "bin").agg(count(lit(1)).as("cnt"))
      .withColumn("p",
        col("cnt") / sum("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy("side")))
    val pivot = freqs.groupBy("bin")
      .agg(sum(when(col("side") === 1, col("p"))).as("p1"),
        sum(when(col("side") === 2, col("p"))).as("p2"))
    // the literal partition key spells out what the plan does anyway
    // (ONE partition over ≤ bins rows — bounded by construction) and
    // keeps the honest `WindowExec: No Partition Defined` warning free
    // for windows that are actually unbounded
    val cdfW = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      .orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    pivot
      .withColumn("c1", sum(coalesce(col("p1"), lit(0.0))).over(cdfW))
      .withColumn("c2", sum(coalesce(col("p2"), lit(0.0))).over(cdfW))
      .agg(coalesce(max(abs(col("c1") - col("c2"))), lit(0.0)).as("ks"))
  }

  def ksContinuousSameTable(df: DataFrame, col1: String, col2: String,
      edges: Array[Double]): Double =
    ksContinuousSameTableDF(df, col1, col2, edges).head().getDouble(0)

  def tvdSameTable(df: DataFrame, col1: String, col2: String,
      bin: Column => Column = identity): Double =
    tvdSameTableDF(df, col1, col2, bin).head().getDouble(0)

  /** R11+R13 continuous comparator (`datadiff.py:27-44`): bin edges fixed
    * by df1's min/max, df2 re-binned with the same edges, then TVD. Values
    * of df2 outside df1's range are dropped (reference `histogram(buckets)`
    * behavior) — each side is normalized by its own in-range total.
    * Exact, but costs 3 scans (edge pass + bin pass per side); see
    * [[continuousComparatorSketch]] for the one-scan-per-side form. */
  def continuousComparator(df1: DataFrame, col1: String, df2: DataFrame, col2: String,
      maxBins: Int = 1000): Double = {
    val edges = equiWidthEdges(df1, col1, maxBins)
    if (edges.length < 2) return 0.0
    tvdOfHistograms(
      continuousHistogramDF(df1, col1, edges),
      continuousHistogramDF(df2, col2, edges))
  }

  /** Fixed-edge continuous comparator: both sides binned under EDGES
    * SUPPLIED BY THE CALLER rather than re-derived from side 1's
    * observed range — the longitudinal form (the Differ's `edges-dir`
    * artifact): TVDs from different runs only compare if they binned
    * the same way, so a nightly gate pins run 1's edges and reuses
    * them. Values outside the pinned range DROP before normalization
    * (`continuousHistogramDF` = the reference's `rdd.histogram`
    * semantics, datadiff.py:32-33); a side shifted fully out of range
    * normalizes to an empty histogram and the TVD reads 1.0 — range
    * drift surfaces as drift, never as silent rebinning. */
  def continuousComparatorWithEdges(df1: DataFrame, col1: String,
      df2: DataFrame, col2: String, edges: Array[Double]): Double = {
    require(edges.length >= 2,
      s"fixed-edge comparison needs >= 2 bin edges, got ${edges.length}")
    tvdOfHistograms(
      continuousHistogramDF(df1, col1, edges),
      continuousHistogramDF(df2, col2, edges))
  }

  /** Approximate continuous comparator via the mergeable histogram-sketch
    * aggregate (`graft.functions.HistogramSketch`): ONE scan per side
    * (no separate min/max edge pass, no raw re-bin), with the TVD derived
    * driver-side from two ≤ maxCentroids sketches. The scan reduction is
    * the 100 TB win; accuracy is bounded by centroid resolution. */
  def continuousComparatorSketch(df1: DataFrame, col1: String, df2: DataFrame, col2: String,
      maxBins: Int = 1000, maxCentroids: Int = 256): Double = {
    import graft.functions.HistogramSketch
    def sketchOf(df: DataFrame, c: String) = HistogramSketch.decode(
      df.agg(HistogramSketch.sketch(col(c).cast("double"), maxCentroids).as("s"))
        .head().getSeq[org.apache.spark.sql.Row](0))
    graft.functions.HistogramSketchImpl.tvd(sketchOf(df1, col1), sketchOf(df2, col2), maxBins)
  }

  /** Same-table variant: BOTH columns' sketches from a single scan (two
    * aggregates, one Aggregate node). */
  def continuousComparatorSketchSameTable(df: DataFrame, col1: String, col2: String,
      maxBins: Int = 1000, maxCentroids: Int = 256): Double = {
    import graft.functions.HistogramSketch
    val row = df.agg(
      HistogramSketch.sketch(col(col1).cast("double"), maxCentroids).as("s1"),
      HistogramSketch.sketch(col(col2).cast("double"), maxCentroids).as("s2")).head()
    graft.functions.HistogramSketchImpl.tvd(
      HistogramSketch.decode(row.getSeq[org.apache.spark.sql.Row](0)),
      HistogramSketch.decode(row.getSeq[org.apache.spark.sql.Row](1)), maxBins)
  }

  // ------------------------------------------------------ snapshot diff

  /** Row-level diff of two versions of a table by key: every key
    * labeled `added` / `removed` / `changed` / `unchanged` — the "what
    * moved between yesterday's corpus and today's" primitive behind
    * incremental publishing, cache invalidation, and regression triage.
    *
    * `compareCols` defaults to every shared non-key column. Comparison
    * is per-column null-safe equality (`<=>`), not a hash — portable to
    * any SQL engine (q49's oracle replays it verbatim) and immune to
    * hash collisions silently masking a change.
    *
    * PRECONDITION: the key columns identify rows UNIQUELY on each side.
    * Duplicate keys fan out through the full-outer join and mislabel
    * (a disappearing duplicate is never reported `removed`); pass
    * `requireUniqueKeys = true` to fail fast instead — one extra
    * aggregate per side, worth it on snapshots of unknown provenance.
    *
    * Scale shape: ONE full-outer shuffle join on the key columns — both
    * sides partial-projected to key + compared columns first (column
    * pruning reaches the scans). Row-level output; compose with
    * `groupBy("diff_status").count()` for the summary (one extra
    * ≤4-key aggregate). For very wide compare sets at 100 TB, pass an
    * explicit `compareCols` subset rather than diffing every column. */
  def tableDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Nil,
      statusCol: String = "diff_status",
      requireUniqueKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "tableDiff: at least one key column")
    val shared = newDf.columns.toSet.intersect(oldDf.columns.toSet)
    require(keyCols.forall(shared.contains),
      s"tableDiff: key columns $keyCols must exist on both sides")
    if (requireUniqueKeys) {
      // aliased count: a key column literally named "count" must not
      // collide with the probe's aggregate
      for ((side, df) <- Seq("old" -> oldDf, "new" -> newDf)) {
        val dup = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"tableDiff: $side side has duplicate keys, e.g. ${dup.head.mkString("(", ",", ")")}")
      }
    }
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(c => shared.contains(c) && !keyCols.contains(c)).toSeq
    require(cmp.forall(shared.contains),
      s"tableDiff: compare columns $cmp must exist on both sides")
    require(!(keyCols ++ cmp).contains(statusCol),
      s"tableDiff: $statusCol collides with a data column")
    val o = oldDf.select((keyCols ++ cmp).map(col): _*)
      .withColumn("__in_old", lit(1))
    val n = newDf.select((keyCols ++ cmp).map(col): _*)
      .withColumn("__in_new", lit(1))
    val joined = o.alias("o").join(n.alias("n"), keyCols, "full_outer")
    val changed = cmp.map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col("__in_old").isNull, "added")
      .when(col("__in_new").isNull, "removed")
      .when(changed, "changed")
      .otherwise("unchanged")
    joined.select(keyCols.map(col) ++ Seq(status.as(statusCol)) ++
      cmp.flatMap(c => Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))): _*)
  }
}
