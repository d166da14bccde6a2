package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, FloatType, StructField, StructType}

/** Core relational/dataflow operators (SURVEY.md §2.3).
  *
  * All are thin, declarative DataFrame transforms — Catalyst keeps full
  * visibility (pushdown, pruning, join selection) because nothing here
  * drops to RDDs except the explicitly driver-bound iterators at the
  * bottom, which exist for bounded-memory egress, not dataflow.
  */
object Ops {

  /** R1 `pandify` (reference `sparktools/core.py:1-20`): schema
    * normalization — rename dotted column names to `__` and cast every
    * DecimalType column to float. A single `select` so it stays one
    * projection node (column-pruning friendly), not a fold of
    * `withColumn` (which would stack N Project nodes). Idempotent. */
  def pandify(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val renamed = f.name.replace(".", "__")
      val base = col(s"`${f.name}`")
      val castd = f.dataType match {
        case _: DecimalType => base.cast(FloatType)
        case _              => base
      }
      castd.as(renamed)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** R5 exact ordered limit (reference `core.py:23-27` zipWithIndex): with
    * a sort key, Catalyst plans TakeOrderedAndProject — a distributed
    * per-partition top-n plus a driver merge, no global sort. Without one
    * it is Spark's first-n `limit`, same semantics as the reference. */
  def exactLimit(df: DataFrame, n: Int, orderBy: Seq[Column] = Nil): DataFrame =
    if (orderBy.isEmpty) df.limit(n) else df.orderBy(orderBy: _*).limit(n)

  /** R6+R7+R8 stratified quota sampling (`proportion_samples`, reference
    * `core.py:525-547`): join each row to its stratum's requested
    * `rows_count`, keep `row_number <= rows_count` within the stratum.
    *
    * Differences from the reference, by design:
    *  - the reference's window has NO orderBy (`core.py:543`) which is
    *    nondeterministic; callers pass `tieBreaker` columns to make runs
    *    reproducible/oracle-checkable (SURVEY.md §7 hard-parts);
    *  - the proportions side is broadcast: it has one row per stratum, so
    *    the join must never shuffle the fact table.
    *
    * At scale: the only shuffle is the window's hash-partition by the
    * groupers — unavoidable for per-stratum ranking; with heavy skew in a
    * stratum, pre-filter with an approximate per-stratum sample before
    * ranking (quota N only needs ~N survivors per stratum).
    */
  def proportionSamples(
      df: DataFrame,
      proportions: DataFrame,
      groupers: Seq[String],
      tieBreaker: Seq[Column],
      countCol: String = "rows_count"): DataFrame = {
    require(!df.columns.contains(countCol),
      s"proportionSamples: input already has a '$countCol' column — rename it or pass a different countCol")
    // unique internal rank column so user data can never collide with it
    val rn = Iterator.from(0).map(i => s"__rownum$i").find(!df.columns.contains(_)).get
    val w0 = Window.partitionBy(groupers.map(col): _*)
    val w = if (tieBreaker.isEmpty) w0.orderBy(monotonically_increasing_id()) else w0.orderBy(tieBreaker: _*)
    df.join(broadcast(proportions), groupers, "inner")
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) <= col(countCol))
      .drop(rn, countCol)
  }

  /** Skew-safe stratified quota sampling — the scale path the
    * [[proportionSamples]] scaladoc defers to: when one stratum holds a
    * large share of all rows, ranking it with a window funnels that
    * share through a single partition. This variant first thins each
    * stratum with a seeded Bernoulli sample at rate
    * `oversample × quota / strataCount` (rows that can't be in the top
    * quota are dropped BEFORE the window shuffle; rate ≥ 1 keeps all),
    * then ranks the survivors exactly.
    *
    * APPROXIMATE by design, in two ways callers must accept:
    *  - the thinning is rank-blind Bernoulli, so with a MEANINGFUL
    *    tie-breaker the result is the top-q of a random subset, not the
    *    stratum's true top-q — use this only where the tie-breaker is
    *    arbitrary (the reference's unordered-sampling semantics,
    *    `core.py:543`); use [[proportionSamples]] for true top-q;
    *  - a stratum can in principle under-fill its quota; the `minKeep`
    *    floor keeps expected survivors ≥ max(oversample×quota, minKeep),
    *    making under-fill probability negligible for quotas ≪ minKeep.
    * Deterministic given the seed and input partitioning. */
  def proportionSamplesSkewSafe(
      df: DataFrame,
      proportions: DataFrame,
      groupers: Seq[String],
      tieBreaker: Seq[Column],
      countCol: String = "rows_count",
      oversample: Double = 4.0,
      minKeep: Int = 200,
      seed: Long = 4233L): DataFrame = {
    require(!df.columns.contains(countCol),
      s"proportionSamplesSkewSafe: input already has a '$countCol' column")
    val taken = df.columns.toSet ++ proportions.columns
    val cnt = Iterator.from(0).map(i => s"__stratum_n$i").find(!taken(_)).get
    val strataCounts = df.groupBy(groupers.map(col): _*)
      .agg(count(lit(1)).as(cnt))
    val joined = df
      .join(broadcast(proportions), groupers, "inner")
      .join(broadcast(strataCounts), groupers, "inner")
    val keepRate = least(lit(1.0),
      greatest(lit(oversample) * col(countCol), lit(minKeep.toDouble)) / col(cnt))
    val thinned = joined.filter(rand(seed) < keepRate).drop(cnt)
    val rn = Iterator.from(0).map(i => s"__rownum$i").find(!taken(_)).get
    val w0 = Window.partitionBy(groupers.map(col): _*)
    val w = if (tieBreaker.isEmpty) w0.orderBy(monotonically_increasing_id()) else w0.orderBy(tieBreaker: _*)
    thinned
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) <= col(countCol))
      .drop(rn, countCol)
  }

  /** Rank-AWARE skew-safe stratified quota sampling for the digest-keyed
    * case — exact [[proportionSamples]] output without its per-stratum
    * full-membership window sort. When the PRIMARY ranking key is a
    * uniform salted digest (the bottom-k idiom every deterministic
    * sampler here uses), rows that cannot be in a stratum's top quota
    * are identified by a digest-threshold predicate BEFORE the window:
    * keep rows whose digest sorts under `max(oversample×quota, minKeep)
    * / n` of the hex space (the q58/q69 broadcast-threshold idiom), then
    * rank only the survivors. Unlike [[proportionSamplesSkewSafe]]'s
    * rank-blind Bernoulli thinning, the thinning key IS the ranking key,
    * so the survivor pool always CONTAINS the true top quota — verified
    * exactly: per-stratum survivor counts are checked against
    * `min(quota, n)` and any under-filled stratum (a ~`exp(-quota)`
    * tail event) is relaxed to its full membership, so the result
    * equals the window form's on every input, by construction.
    *
    * At scale: two map-side-combined aggregates bounded by the stratum
    * count (the proportions side is broadcastable by contract, so both
    * are) plus one window over `O(strata × oversample × quota)` rows —
    * a dominant stratum no longer sorts its full membership in one
    * task. Deterministic: same input, salt, and quotas → same rows. */
  def proportionSamplesByDigest(
      df: DataFrame,
      proportions: DataFrame,
      groupers: Seq[String],
      digest: Column,
      tieBreak: Column,
      countCol: String = "rows_count",
      oversample: Double = 8.0,
      minKeep: Int = 64): DataFrame = {
    require(!df.columns.contains(countCol),
      s"proportionSamplesByDigest: input already has a '$countCol' column")
    require(oversample >= 1.0, s"oversample must be >= 1, got $oversample")
    require(minKeep >= 1, s"minKeep must be >= 1, got $minKeep")
    val spark = df.sparkSession
    val taken = df.columns.toSet ++ proportions.columns
    val dcol = Iterator.from(0).map(i => s"__digest$i").find(!taken(_)).get
    val thrCol = Iterator.from(0).map(i => s"__thr$i").find(!taken(_)).get
    val withD = df.withColumn(dcol, digest)
    val gFields = groupers.map(g => withD.schema(g))
    def keyOf(r: Row): Seq[Any] = groupers.indices.map(r.get)
    // per-stratum sizes: ≤ |strata| rows after map-side combine
    val sizes = withD.groupBy(groupers.map(col): _*)
      .agg(count(lit(1)).as("__n")).collect()
    val quotaMap = proportions
      .select(groupers.map(col) :+ col(countCol): _*).collect()
      .map(r => keyOf(r) -> r.getAs[Number](groupers.length).longValue()).toMap
    val thrRows: Seq[Row] = sizes.toSeq.map { r =>
      val n = r.getLong(groupers.length)
      val q = quotaMap.getOrElse(keyOf(r), 0L)
      val rate =
        if (q <= 0L) 0.0
        else math.min(1.0, math.max(oversample * q, minKeep.toDouble) / n)
      Row.fromSeq(keyOf(r) :+ hashThresholdHex(rate))
    }
    import scala.jdk.CollectionConverters._
    val thresholds = spark.createDataFrame(thrRows.asJava,
      StructType(gFields :+ StructField(thrCol, org.apache.spark.sql.types.StringType)))
    val survivors = withD.join(broadcast(thresholds), groupers)
      .filter(col(dcol) < col(thrCol)).drop(thrCol)
    // exactness check: a stratum whose survivor pool cannot hold its
    // full top quota falls back to its complete membership (the window
    // then ranks it exactly — correctness never rides the tail bound)
    val survMap = survivors.groupBy(groupers.map(col): _*)
      .agg(count(lit(1)).as("__s")).collect()
      .map(r => keyOf(r) -> r.getLong(groupers.length)).toMap
    val relaxedKeys = sizes.toSeq.flatMap { r =>
      val n = r.getLong(groupers.length)
      val q = quotaMap.getOrElse(keyOf(r), 0L)
      if (q > 0L && survMap.getOrElse(keyOf(r), 0L) < math.min(q, n))
        Some(Row.fromSeq(keyOf(r)))
      else None
    }
    val pool =
      if (relaxedKeys.isEmpty) survivors
      else {
        val rdf = spark.createDataFrame(relaxedKeys.asJava, StructType(gFields))
        withD.join(broadcast(rdf), groupers, "left_semi")
          .unionByName(survivors.join(broadcast(rdf), groupers, "left_anti"))
      }
    proportionSamples(pool, proportions, groupers,
      tieBreaker = Seq(col(dcol), tieBreak), countCol = countCol)
      .drop(dcol)
  }

  /** Skew-safe equi-join: salt the skewed (big) side's key with a random
    * suffix in [0, saltFactor) and explode the other side across all
    * suffixes, so one hot key spreads over `saltFactor` reducers instead
    * of one. Use when a handful of keys dominate (power-law joins) and
    * AQE's skew splitting isn't enough — e.g. joining events to a user
    * dimension where a few bot users hold most rows. The replicated side
    * grows ×saltFactor, so keep it the smaller input.
    *
    * Inner joins only (salting drops no rows for inner semantics). */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 1, s"saltFactor must be > 1, got $saltFactor")
    val salt = Iterator.from(0).map(i => s"__salt$i")
      .find(c => !skewed.columns.contains(c) && !other.columns.contains(c)).get
    val left = skewed.withColumn(salt, pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val right = other.withColumn(salt, explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<long>")))
    // SHUFFLE_HASH hint (r15 optimization, guide §3.1): salting exists
    // to spread one hot key over saltFactor REDUCERS, which presumes a
    // shuffled join on (key, salt). Left to the planner, the exploded
    // side's estimated size can sit under the auto-broadcast threshold
    // and the plan degenerates to a broadcast join — the salt is then
    // pure overhead (a broadcast join has no key skew to fix) and the
    // build side is xsaltFactor the data the caller deliberately kept
    // off the driver (measured on q55: an 891 MB retained broadcast of
    // the x16-exploded dimension, 0.8 s of GC per pass). Shuffled-hash
    // beats sort-merge here: the exploded side divided by (key, salt)
    // is small per partition by construction, and no sort is needed.
    // Join RESULTS are unchanged — same inner equi-join semantics.
    left.join(right.hint("shuffle_hash"), Seq(key, salt), "inner").drop(salt)
  }

  /** As-of join: attach to each left row the LATEST right row whose
    * `timeCol` is ≤ the left row's (per join key) — the standard
    * event-to-most-recent-context join (impressions→latest model
    * version, clicks→latest preceding view, trades→latest quote).
    *
    * Spark has no AsOfJoin operator; the naive formulations are a range
    * join (quadratic per key) or a per-left-row subquery. This is the
    * scalable shape: tag both inputs, union them, and take a running
    * `last(_, ignoreNulls)` over one window — ONE shuffle on the key,
    * each partition scanned once in time order, no join at all. Skewed
    * keys shard exactly like any window (AQE handles the exchange; a
    * hot key still serializes its own window, as any per-key ordering
    * must).
    *
    * `payload` maps right-side columns to output names. Right rows at
    * the same timestamp as a left row DO match (inclusive, DuckDB/pandas
    * `merge_asof` semantics). The payload is carried as ONE struct, so
    * the output always reflects a single right ROW — a NULL field on the
    * latest right row stays NULL (it is not back-filled from an older
    * row). Left rows with no preceding right row get NULL payloads
    * (left-outer semantics). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      payload: Seq[(String, String)]): DataFrame = {
    require(payload.nonEmpty, "asofJoin: payload must name at least one right column")
    require(payload.forall { case (_, out) => !left.columns.contains(out) },
      s"asofJoin: payload output names collide with left columns")
    // the payload travels as ONE struct so all output fields come from
    // the SAME right row (independent per-column last() could combine
    // fields of different rows when some payload values are null)
    val pStructType = StructType(payload.map { case (src, out) =>
      StructField(out, right.schema(src).dataType, nullable = true)
    })
    // left rows carry a null payload struct; right rows carry null
    // left-only columns — unionByName just needs both sides to expose
    // all names
    val lSel = left.columns.map(col) ++ Seq(lit(1).as("__asof_side"),
      lit(null).cast(pStructType).as("__asof_p"))
    val rSel = left.columns.map { c =>
      if (keyCols.contains(c) || c == timeCol) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)
    } ++ Seq(lit(0).as("__asof_side"),
      struct(payload.map { case (src, out) => col(src).as(out) }: _*).as("__asof_p"))
    val unioned = left.select(lSel.toIndexedSeq: _*)
      .unionByName(right.select(rSel.toIndexedSeq: _*))
    // right (side 0) sorts before left (side 1) at equal timestamps →
    // inclusive "≤" match; running frame keeps the scan one-pass.
    // The payload struct breaks ties among right rows sharing a
    // timestamp (the max payload tuple wins — deterministic,
    // oracle-checkable).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__asof_side").asc, col("__asof_p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned
      .withColumn("__asof_hit", last(col("__asof_p"), ignoreNulls = true).over(w))
    attached.filter(col("__asof_side") === 1)
      .select(left.columns.map(col) ++
        payload.map { case (_, out) => col(s"__asof_hit.$out").as(out) }: _*)
  }

  /** Gap-based batch sessionization: number each key's events into
    * sessions, a new session starting whenever the gap to the previous
    * event exceeds `maxGap` (same units as `timeCol` — pass epoch-micros
    * with a micros gap, epoch-seconds with seconds). Adds `sessionCol`:
    * a per-key ordinal starting at 1, via lag-flag + running sum.
    *
    * Scale shape: ONE shuffle on the keys — both window passes (the lag
    * and the cumulative sum) share the same partitioning and ordering,
    * so Catalyst plans a single Exchange + Sort and evaluates both in
    * one `WindowExec` scan over each partition (plan-asserted in
    * OpsSpec). The streaming equivalent is
    * `Streams`' session windows; this is the batch/backfill form.
    *
    * `tieBreakCols` orders events at equal timestamps deterministically
    * (session BOUNDARIES are tie-invariant — a zero gap never opens a
    * session — but downstream per-row consumers of running ordinals
    * deserve a stable order). */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      maxGap: Long,
      sessionCol: String = "session_id",
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "sessionize: at least one key column")
    require(maxGap > 0, s"sessionize: maxGap must be positive, got $maxGap")
    require(!df.columns.contains(sessionCol),
      s"sessionize: column $sessionCol already exists")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(timeCol) +: tieBreakCols.map(col)).map(_.asc): _*)
    val prev = lag(col(timeCol), 1).over(w)
    val isNew = when(prev.isNull || col(timeCol) - prev > maxGap, 1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Deterministic hash-sampling predicate: true iff
    * `md5(id || salt) < fraction` (comparing the 32-hex digest against a
    * threshold string — lexicographic order on equal-length lowercase
    * hex IS numeric order). Granularity 2^-60.
    *
    * This is how sampling should work at 100 TB, where `rand(seed)` is
    * NOT reproducible (it seeds per-partition, so any repartition,
    * retry, or input split change reshuffles the sample):
    *  - the decision is a pure function of the row's id — stable across
    *    runs, partitionings, task retries, and engines (the same
    *    expression runs in any SQL dialect with md5);
    *  - it is a plain predicate, so it pushes into the scan and
    *    composes with any other filter;
    *  - independent samples come from different `salt`s; nested samples
    *    (10% ⊃ 1%) from nested fractions with the SAME salt. */
  def hashSamplePredicate(idCol: Column, fraction: Double, salt: String = ""): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    if (fraction <= 0.0) lit(false)
    else if (fraction >= 1.0) lit(true)
    else hashDigestCol(idCol, salt) < lit(hashThresholdHex(fraction))
  }

  /** The sampling digest: `md5(id || '|' || salt)` — the single recipe
    * every deterministic-sampling path (and its SQL oracles) must share
    * so samples with the same salt compose/nest. The delimiter keeps
    * (id, salt) unambiguous (id "1" + salt "2x" ≠ id "12" + salt "x"). */
  def hashDigestCol(idCol: Column, salt: String = ""): Column =
    md5(concat(idCol.cast("string"), lit("|"), lit(salt)))

  /** The 32-char hex threshold encoding `fraction` (first 15 hex digits
    * = floor(fraction·2^60), zero-padded). Exposed so SQL oracles can
    * reproduce the predicate verbatim. Total on [0,1]: 1.0 maps to "g"
    * (sorts above every hex digest → keep all), 0.0 to all-zeros (keep
    * none); out-of-range fractions are rejected. */
  def hashThresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    if (fraction >= 1.0) "g" // 2^60 needs 16 hex digits — handle total
    else f"${(fraction * (1L << 60)).toLong}%015x" + "0" * 17
  }

  /** Keep a deterministic `fraction` of `df` by id hash (see
    * [[hashSamplePredicate]]). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, salt: String = ""): DataFrame =
    df.filter(hashSamplePredicate(col(idCol), fraction, salt))

  /** The 60-bit unit uniform `u ∈ (0, 1]` of the sampling digest: the
    * first 15 hex digits of `md5(id|salt)` as an integer, +1 (so u is
    * never 0 — `ln(0)` would blow up weightedSample's key), over 2^60.
    * The single recipe every numeric-uniform consumer (weightedSample,
    * CorpusPrep.temperatureMix) and its SQL oracles must share. */
  def hashUniform(idCol: Column, salt: String = ""): Column = {
    val v = conv(substring(hashDigestCol(idCol, salt), 1, 15), 16, 10).cast("double")
    (v + lit(1.0)) / lit(1.152921504606846976e18) // 2^60
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis bottom-k): every row gets rank key `-ln(u) / w`, where
    * `u ∈ (0,1]` is a unit uniform derived from the shared md5 sampling
    * digest of (id, salt) and `w` the row's weight; the k smallest keys
    * ARE the sample. Inclusion probability is proportional-to-size, and
    * the decision is a pure function of (id, salt, weight) — stable
    * under repartition/retry, and reproducible in any engine with md5
    * (the q58 oracle replays the identical arithmetic in SQL).
    *
    * At scale: `orderBy(key).limit(k)` plans as TakeOrderedAndProject —
    * per-partition bounded heaps, NO global sort; the exchange carries
    * ≤ k rows per partition regardless of input size. Rows with
    * non-positive weight are excluded (E–S is defined for w > 0);
    * ties (u collisions) break on ascending id.
    *
    * Oracle portability caveat (q58): the cross-engine hash-exact check
    * assumes `java.lang.Math.log` and the oracle engine's libm `log`
    * round identically on the evaluated u values. Neither is guaranteed
    * correctly rounded, so a 1-ulp divergence at the k-th/(k+1)-th key
    * boundary could flip one membership on another platform/libm — the
    * SAMPLE ITSELF stays valid (E–S holds for any exact-real log; only
    * the bit-replay is at risk). Verified bit-identical for JDK17 +
    * DuckDB on this box; if the q58 gate ever flakes on a new platform,
    * relax the oracle to top-(k+ε) set containment rather than touching
    * this operator. */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val keyName = Iterator.from(0).map(i => s"__wkey$i")
      .find(!df.columns.contains(_)).get
    val u = hashUniform(idCol, salt)
    df.filter(weightCol > lit(0.0))
      .withColumn(keyName, -log(u) / weightCol)
      .orderBy(col(keyName), idCol)
      .limit(k)
      .drop(keyName)
  }

  /** Broadcast range join: match each fact row to dimension rows by a
    * half-open interval `lo ≤ v < hi` — band/bucket/tier lookups
    * (price bands, IP ranges, SLA tiers). The dimension is broadcast,
    * so the plan is a BroadcastNestedLoopJoin: the fact side streams
    * through unshuffled at scan speed and each row tests ≤ |dim| bands.
    * Right for the small-dimension contract (bands ≪ facts — the only
    * case a range join over a fact table makes sense); for fixed-width
    * bands prefer computing the band key arithmetically (no join at
    * all, see DataDiff's equi-width binning). */
  def broadcastRangeJoin(
      fact: DataFrame,
      dim: DataFrame,
      factCol: String,
      loCol: String,
      hiCol: String,
      joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim),
      fact(factCol) >= dim(loCol) && fact(factCol) < dim(hiCol), joinType)

  /** R4 literal metadata projection (reference `scorer.py:53-57`):
    * prepend constant columns to every row. */
  def withMeta(df: DataFrame, meta: Seq[(String, String)]): DataFrame =
    df.select(meta.map { case (k, v) => lit(v).as(k) } ++ Seq(col("*")): _*)

  /** Fan a per-row-HEAVY computation out over the cluster when the
    * input's planned parallelism is below it (guide §2.5's unsplittable-
    * input remedy: one row group / one gzip member / a handful of tiny
    * files all plan as ~1 scan task, serializing everything downstream
    * of the read on one core). A round-robin `repartition(parallelism)`
    * fires ONLY when the planned partition count is under half the
    * session's default parallelism — on well-split production inputs
    * (thousands of splits) this is a no-op, so the scale path never
    * pays an extra exchange; the shuffle that does fire carries only
    * the frame's projected columns. Row ORDER changes, values do not —
    * callers must be order-insensitive (per-row projections, decode/
    * hash passes, aggregations).
    *
    * Sites: expensive per-row work directly over a source scan — media
    * render/decode/hash passes, native LM scoring projections, text
    * quality/normalization scans. NOT for cheap columnar aggregates,
    * where the shuffle costs more than the single-core scan (measured:
    * a 600k-row groupBy slows 3.5x under a blanket repartition). */
  def fanOutForCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // METADATA-ONLY probe. Never touch queryExecution.toRdd/executedPlan
    // here: under AQE, `execute()` materializes every upstream query
    // stage eagerly, so a partition-count check through the physical
    // plan RUNS the whole DAG once per call (measured: the media tier
    // slowed ~2x under exactly that bug before this form landed).
    // Proxy for planned scan parallelism: the analyzed plan's input
    // file count (each local test file is one row group = one split;
    // production scans carry thousands of files). A frame already
    // repartitioned upstream (this helper, distribute-by, salting)
    // is left alone so stacked call sites cannot double-shuffle.
    import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}
    val repartitioned = df.queryExecution.logical.collectFirst {
      case _: Repartition => (); case _: RepartitionByExpression => ()
    }.isDefined
    // inputFiles semantics (r16 advice fixes): 0 means a NON-FILE
    // relation (JDBC/Hive/local) whose parallelism the file count says
    // nothing about — a partition-column-bounded JDBC read carries no
    // Repartition node, so repartitioning here would shrink it; skip.
    // A thrown probe (-1) means unknown — also skip, and the comparison
    // is Long so a sentinel can never overflow into "repartition".
    val nFiles = try df.inputFiles.length
      catch { case scala.util.control.NonFatal(_) => -1 }
    if (!repartitioned && nFiles > 0 && nFiles.toLong * 2 <= target)
      df.repartition(target)
    else df
  }

  /** R15 partition-pruned iteration (reference `core.py:504-509`): iterate
    * the dataset one Spark partition at a time on the driver, without ever
    * holding more than one partition in memory. Unlike the reference
    * (cache + N filtered passes), `toLocalIterator` already streams
    * partition-by-partition in one pass. */
  def partitionIterator(df: DataFrame): Iterator[Row] = df.toLocalIterator().asScala

  /** R16/U4 batched driver collect (reference `core.py:512-522,76-84`):
    * fixed-size row blocks with constant driver memory. */
  def groupedCollect(df: DataFrame, batch: Int = 10000): Iterator[Seq[Row]] =
    df.toLocalIterator().asScala.grouped(batch).map(_.toSeq)

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
