package graft.sources

import graft.conf.GraftConfig
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven source/sink layer.
  *
  * Re-expresses the reference's `define_data_frame` (S1-S8,
  * `sparktools/core.py:121-168`) and `write` (K0-K6, `core.py:171-231`)
  * dispatch on the Scala DataFrame API. Storage types: `local`, `hdfs`,
  * `jdbc`, `hive`, `single-csv`, `csv`; post-read transforms
  * `distribute-by` / `transform-sql` / `sample` / `limit`.
  *
  * Scale notes (100 TB design):
  *  - file reads stay fully declarative (`spark.read.format(..).load`) so
  *    Catalyst keeps partition pruning / filter pushdown / column pruning;
  *  - JDBC reads are range-partitioned with a min/max probe when bounds are
  *    absent (reference `core.py:432-438` — implemented here with the
  *    bounds UNswapped; the reference assigns max to lowerBound, a bug);
  *  - `transform-sql` registers a temp view and delegates to Catalyst —
  *    user SQL is optimized together with the scan, not applied post-hoc.
  */
object DataIO {

  val SampleSeed = 4233L // reference core.py:163
  val DefaultFetchSize = 10000000 // reference core.py:421,439

  /** Storage selector — the reference key is `storage` (`core.py:124`);
    * `storage-type` is accepted as an alternate spelling. */
  private def storageOf(conf: GraftConfig): String =
    conf.getString("storage").orElse(conf.getString("storage-type")).getOrElse("local")

  /** The reference's universal locator key is `query` — a path for
    * local/hdfs/single-csv, SQL for hive, table-or-query for JDBC
    * (`core.py:137,141,144,151`). Alternate explicit spellings
    * (`dataset-dir`, `file-path`, `table`) are also accepted. */
  private def locator(conf: GraftConfig, alternates: String*): String =
    conf.getString("query")
      .orElse(alternates.iterator.flatMap(conf.getString(_)).nextOption())
      .getOrElse(throw new NoSuchElementException(
        s"missing locator: need 'query' (or ${alternates.mkString("/")})"))

  /** Reference `distribute-by` is an object `{key, n-partitions}`
    * (`core.py:156`); a flat string key + top-level `n-partitions` is
    * accepted as an alternate. Returns (key, numPartitions). */
  private def distributeBy(conf: GraftConfig): Option[(String, Option[Int])] =
    conf.getString("distribute-by.key")
      .map(k => (k, conf.getInt("distribute-by.n-partitions")))
      .orElse(conf.getString("distribute-by").filter(_.nonEmpty)
        .map(k => (k, conf.getInt("n-partitions"))))

  /** S1-S8: build a (lazy) DataFrame from a source config. */
  def read(spark: SparkSession, conf: GraftConfig): DataFrame = {
    val storage = storageOf(conf)
    var df = storage match {
      case "local" | "hdfs" =>
        val fmt = conf.getString("dataset-store-format").getOrElse("parquet")
        spark.read.format(fmt).load(locator(conf, "dataset-dir"))
      case "single-csv" =>
        // reference: header 'infer', sep '\t', decimal '.' (core.py:145-147)
        val header = conf.getString("header").getOrElse("infer") match {
          case "infer" | "true" => "true"
          case _                => "false"
        }
        spark.read
          .option("header", header)
          .option("sep", conf.getString("sep").getOrElse("\t"))
          .option("inferSchema", "true")
          .csv(locator(conf, "file-path"))
      case "hive" =>
        spark.sql(conf.string("query"))
      case "jdbc" =>
        readJdbc(spark, conf)
      case other => throw new IllegalArgumentException(s"unknown source storage: $other")
    }
    // post-read transforms, reference order: distribute-by, transform-sql, sample, limit
    distributeBy(conf).foreach { case (key, nOpt) =>
      val n = nOpt.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
      df = df.repartition(n, col(key))
    }
    conf.getString("transform-sql").foreach { sql =>
      df.createOrReplaceTempView("dataset_temp")
      df = spark.sql(sql)
    }
    conf.getDouble("sample").foreach { fraction =>
      // `sample-method = rng | digest` (default rng — reference
      // fidelity: Spark's Bernoulli sampler at the fixed seed,
      // core.py's `sample` semantics). `digest` keeps the same
      // CAPABILITY engine-portably: the md5 sampling digest over
      // `sample-id-column` (+ optional `sample-salt`), the
      // Ops.hashSample recipe every deterministic-sampling path
      // shares — reproducible in any engine with md5 (oracle-exact,
      // q150), stable under repartition/retry, and nestable across
      // salts, where the RNG sample is engine-specific by nature.
      conf.getString("sample-method").getOrElse("rng") match {
        case "rng" =>
          df = df.sample(withReplacement = false, fraction, SampleSeed)
        case "digest" =>
          val idc = conf.getString("sample-id-column").getOrElse(
            throw new IllegalArgumentException(
              "sample-method = digest keys the md5 sampling digest on a " +
                "column — set sample-id-column"))
          df = graft.operators.Ops.hashSample(df, idc, fraction,
            conf.getString("sample-salt").getOrElse(""))
        case other => throw new IllegalArgumentException(
          s"sample-method must be rng | digest, got '$other'")
      }
    }
    conf.getInt("limit").foreach { n => df = df.limit(n) }
    df
  }

  /** S1 option assembly, pure and unit-testable (no DB needed). The
    * `conn { }` block spreads into reader options exactly like the
    * reference passes `conn_params` through (`core.py:429,445`); legacy
    * top-level url/user/password/driver keys are accepted too.
    * `probedBounds` are (min, max) — assigned min→lowerBound,
    * max→upperBound (the reference swaps them, `core.py:437-438`). */
  def jdbcReadOptions(conf: GraftConfig, probedBounds: Option[(Long, Long)] = None): Map[String, String] = {
    // partitioned read only when BOTH a column and num-partitions > 1 are
    // configured (reference `core.py:431`)
    (conf.getString("partition-column"), conf.getInt("num-partitions")) match {
      case (Some(pc), Some(np)) if np > 1 =>
        val (lo, hi) = (conf.getLong("lower-bound"), conf.getLong("upper-bound")) match {
          case (Some(l), Some(h)) => (l, h)
          case _ => probedBounds.getOrElse(throw new IllegalStateException(
            s"partition-column $pc needs bounds: configure lower-bound/upper-bound or probe them"))
        }
        jdbcBaseOptions(conf) ++ Map(
          "partitionColumn" -> pc,
          "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString,
          "numPartitions" -> np.toString)
      case _ => jdbcBaseOptions(conf)
    }
  }

  /** Connection + table options without the partitioning keys — shared
    * by the real read and the bound probe (which must carry the same
    * credentials/driver or fail against any authenticated DB). */
  def jdbcBaseOptions(conf: GraftConfig): Map[String, String] = {
    val conn = conf.at("conn").flat.toMap
    // precedence: defaults < conn{} < explicit top-level keys — a
    // conn-tuned fetchsize must never be clobbered by the default, and a
    // top-level url must override a conn-included one like every other key
    val url = conf.getString("url").orElse(conn.get("url"))
      .getOrElse(throw new IllegalArgumentException("jdbc source needs conn.url (or url)"))
    Map("fetchsize" -> DefaultFetchSize.toString) ++
      conn ++
      Map("url" -> url, "dbtable" -> jdbcTable(conf)) ++
      conf.getInt("fetch-size").map("fetchsize" -> _.toString) ++
      conf.getString("driver").map("driver" -> _) ++
      conf.getString("user").map("user" -> _) ++
      conf.getString("password").map("password" -> _)
  }

  /** The dbtable string: a `query` is wrapped `(q) as a` unless it
    * already matches the aliased form (reference regex,
    * `core.py:424-427`); an explicit `table` passes through raw. */
  def jdbcTable(conf: GraftConfig): String =
    conf.getString("table")
      .orElse(conf.getString("query").map(wrapJdbcQuery))
      .getOrElse(throw new IllegalArgumentException("jdbc source needs table or query"))

  private val AliasedQuery = """\s*\(.+\)\s+[aA][sS]\s+\w+\s*""".r
  def wrapJdbcQuery(q: String): String =
    if (AliasedQuery.matches(q)) q else s"($q) as a"

  /** Bound-discovery probe SQL, pushed down to the remote DB. No extra
    * alias after `table`: it is either a plain name or an
    * already-aliased `(q) a`. */
  def jdbcProbeSql(partitionColumn: String, table: String): String =
    s"(select min($partitionColumn) mn, max($partitionColumn) mx from $table) b"

  /** K3 connection properties, pure and unit-testable: the `conn { }`
    * block passes through as properties (reference `core.py:207-208`),
    * legacy top-level credentials accepted. */
  def jdbcWriteProps(conf: GraftConfig): java.util.Properties = {
    val props = new java.util.Properties()
    conf.at("conn").flat.foreach { case (k, v) =>
      if (k != "url") props.setProperty(k, v)
    }
    conf.getString("user").foreach(props.setProperty("user", _))
    conf.getString("password").foreach(props.setProperty("password", _))
    conf.getString("driver").foreach(props.setProperty("driver", _))
    props
  }

  /** True when a bound probe is needed before assembling read options. */
  def jdbcNeedsProbe(conf: GraftConfig): Boolean =
    conf.getString("partition-column").isDefined &&
      conf.getInt("num-partitions").exists(_ > 1) &&
      (conf.getLong("lower-bound").isEmpty || conf.getLong("upper-bound").isEmpty)

  /** S1: JDBC table-or-query read with optional range partitioning
    * (reference `core.py:414-445`). Code-complete; the option assembly
    * and probe SQL above are unit-tested without a DB (offline env). */
  private def readJdbc(spark: SparkSession, conf: GraftConfig): DataFrame = {
    val bounds =
      if (jdbcNeedsProbe(conf)) {
        val pc = conf.string("partition-column")
        // probe with the SAME credentials/driver options as the real read
        val probe = spark.read.format("jdbc")
          .options(jdbcBaseOptions(conf) +
            ("dbtable" -> jdbcProbeSql(pc, jdbcTable(conf))))
          .load().first()
        if (probe.isNullAt(0) || probe.isNullAt(1)) None // empty table / all-null column
        else Some((probe.getAs[Number]("mn").longValue(), probe.getAs[Number]("mx").longValue()))
      } else None
    if (jdbcNeedsProbe(conf) && bounds.isEmpty) {
      // probed an empty table: partitioning is pointless — plain read
      spark.read.format("jdbc").options(jdbcBaseOptions(conf)).load()
    } else
      spark.read.format("jdbc").options(jdbcReadOptions(conf, bounds)).load()
  }

  /** K0-K6: write a DataFrame per a target config. */
  /** The target-config knobs [[write]] honors that re-partition,
    * re-sort, or re-group rows on the way out (K0 layouts, file
    * partitioning, hive bucketing). A caller whose input row ORDER must
    * survive the write (e.g. the Curator's deterministic export
    * shuffle) rejects configs where any of these is set. Lives here,
    * next to write() itself, so the list cannot drift from what write()
    * actually does. */
  def activeLayoutKnobs(conf: GraftConfig): Seq[String] = Seq(
    "n-partitions" -> conf.getInt("n-partitions").isDefined,
    "distribute-by" -> distributeBy(conf).isDefined,
    "range-by" -> conf.getList("range-by").isDefined,
    "zorder-by" -> conf.getList("zorder-by").isDefined,
    "sort-within-partitions" -> conf.getList("sort-within-partitions").isDefined,
    "partition-by" -> conf.getList("partition-by").isDefined,
    "bucket-by" -> conf.getList("bucket-by").isDefined
  ).collect { case (k, true) => k }

  def write(df0: DataFrame, conf: GraftConfig): Unit = {
    if (conf.getBoolean("disabled").getOrElse(false)) return
    val spark = df0.sparkSession
    // K0 pre-write repartition (reference core.py:174-181).
    // `range-by` replaces the hash repartition with a RANGE partition:
    // files then hold disjoint key ranges, so parquet/orc footer min/max
    // stats actually PRUNE — the data-skipping layout knob for columns
    // readers filter on (dates, ids). Hash-partitioned files each span
    // the whole key range and skip nothing.
    // `zorder-by` is the MULTI-column data-skipping layout: bit-interleaved
    // equi-depth ranks (graft.operators.ZOrder) so footer min/max prune on
    // EVERY listed column, where range-by prunes only its leading column.
    val layouts = Seq("zorder-by" -> conf.getList("zorder-by").isDefined,
      "range-by" -> conf.getList("range-by").isDefined,
      "distribute-by" -> distributeBy(conf).isDefined).collect { case (k, true) => k }
    require(layouts.size <= 1,
      s"${layouts.mkString(" and ")} are mutually exclusive layouts — " +
        "zorder-by prunes on every listed column, range-by on its leading " +
        "column, distribute-by gives hash co-location; pick one")
    // sort-within-partitions would re-sort each partition AFTER the
    // z-curve ordering, silently discarding the in-file row-group
    // clustering that is zorder-by's point (file-level pruning would
    // survive, row-group skipping would not) — reject the combination
    // like the layout pairs above instead of quietly honoring the last
    // sort
    require(conf.getList("zorder-by").isEmpty || conf.getList("sort-within-partitions").isEmpty,
      "zorder-by and sort-within-partitions are mutually exclusive — the " +
        "z-order layout already sorts rows inside each file along the " +
        "curve; a second within-partition sort would discard that " +
        "row-group clustering")
    val nParts = conf.getInt("n-partitions")
    var df = (conf.getList("zorder-by"), conf.getList("range-by"), distributeBy(conf)) match {
      case (Some(zcols), _, _) =>
        require(zcols.nonEmpty, "zorder-by must name at least one column")
        graft.operators.ZOrder.layout(df0, zcols,
          bits = conf.getInt("zorder-bits").getOrElse(8), nPartitions = nParts)
      case (_, Some(cols0), _) =>
        require(cols0.nonEmpty, "range-by must name at least one column")
        val cols = cols0.map(col)
        nParts match {
          case Some(n) => df0.repartitionByRange(n, cols: _*)
          case None    => df0.repartitionByRange(cols: _*)
        }
      case (_, _, Some((key, nOpt))) => nOpt match {
        case Some(n) => df0.repartition(n, col(key))
        case None    => df0.repartition(col(key))
      }
      case _ => nParts match {
        case Some(n) => df0.repartition(n)
        case None    => df0
      }
    }
    // order rows INSIDE each file (no shuffle): tightens row-group
    // min/max spans so stats-based skipping works within files too
    conf.getList("sort-within-partitions").foreach { cols =>
      df = df.sortWithinPartitions(cols.map(col): _*)
    }
    val storage = storageOf(conf)
    // file-writer-only knobs fail fast on other sinks — a silently
    // ignored shard-size contract is worse than an error
    require(conf.getInt("max-records-per-file").isEmpty ||
        storage == "local" || storage == "hdfs",
      s"max-records-per-file applies to local/hdfs file sinks, not $storage")
    require(conf.getList("bloom-filter-columns").isEmpty ||
        storage == "local" || storage == "hdfs",
      s"bloom-filter-columns applies to local/hdfs parquet sinks, not $storage")
    storage match {
      case "local" | "hdfs" => // K1/K2 — file formats; default overwrite (core.py:190,199)
        val fmt = conf.getString("dataset-store-format").getOrElse("orc")
        val mode = conf.getString("write-mode").getOrElse("overwrite")
        var w = df.write.mode(mode).format(fmt)
        conf.getList("partition-by").foreach(cols => w = w.partitionBy(cols: _*))
        // `bloom-filter-columns`: parquet row-group bloom filters on the
        // listed columns — the data-skipping complement for EQUALITY
        // probes on high-cardinality keys (content hashes, ids), where
        // min/max stats prune nothing because every row group spans the
        // whole hash range. Readers (Spark included) skip row groups
        // whose bloom excludes the probed value; ~1 bit/row-ish of file
        // overhead at the default FPP. Parquet-only by construction.
        // `max-records-per-file`: cap rows per output file WITHOUT
        // changing partitioning (Spark splits a partition's write into
        // multiple files) — the trainer-facing shard-size knob; files
        // stay deterministic under the deterministic export shuffle
        // because row order within partitions is what it caps.
        conf.getInt("max-records-per-file").foreach { n =>
          require(n > 0, s"max-records-per-file must be positive, got $n")
          w = w.option("maxRecordsPerFile", n.toLong)
        }
        conf.getList("bloom-filter-columns").foreach { cols =>
          require(fmt == "parquet",
            s"bloom-filter-columns requires dataset-store-format = parquet, got $fmt")
          require(cols.nonEmpty, "bloom-filter-columns must name at least one column")
          cols.foreach { c =>
            w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
          }
        }
        w.save(locator(conf, "dataset-dir"))
      case "jdbc" => // K3 — single-connection write (core.py:201-209); default append
        val url = conf.at("conn").getString("url").orElse(conf.getString("url"))
          .getOrElse(throw new IllegalArgumentException("jdbc target needs conn.url (or url)"))
        df.repartition(1).write
          .mode(conf.getString("write-mode").getOrElse("append"))
          .jdbc(url, locator(conf, "table"), jdbcWriteProps(conf))
      case "hive" => // K4 — column-reordered insertInto vs saveAsTable (core.py:210-216,234-250)
        val table = locator(conf, "table")
        val fmt = conf.getString("dataset-store-format").getOrElse("orc")
        val mode = conf.getString("write-mode").getOrElse("append")
        if (spark.catalog.tableExists(table)) {
          val tableCols = spark.table(table).columns
          df.select(tableCols.map(col).toIndexedSeq: _*).write.mode(mode).insertInto(table)
        } else {
          var w = df.write.mode(mode).format(fmt)
          conf.getList("partition-by").foreach(cols => w = w.partitionBy(cols: _*))
          // bucket-by + n-buckets: lay the table out hash-bucketed (and
          // sorted) on the join key so equi-joins between co-bucketed
          // tables plan WITHOUT a shuffle — the storage-level co-location
          // knob for repeated big-table joins
          conf.getList("bucket-by").foreach { cols =>
            val n = conf.getInt("n-buckets").getOrElse(throw new IllegalArgumentException(
              "bucket-by requires n-buckets"))
            w = w.bucketBy(n, cols.head, cols.tail: _*).sortBy(cols.head, cols.tail: _*)
          }
          w.saveAsTable(table)
        }
      case "single-csv" => // K5 — one file with header (core.py:217-223)
        writeSingleCsv(df, locator(conf, "file-path"), conf.getString("sep").getOrElse("\t"))
      case "csv" => // K6 — constant-driver-memory streaming CSV (core.py:224-229,253-263)
        writeStreamingCsv(df, locator(conf, "file-path"), conf.getString("sep").getOrElse("\t"))
      case other => throw new IllegalArgumentException(s"unknown target storage: $other")
    }
  }

  /** K5: true single local CSV file. Deliberately driver-bound like the
    * reference's `toPandas().to_csv` — use only for small results. */
  def writeSingleCsv(df: DataFrame, path: String, sep: String): Unit =
    writeCsvIterator(df, path, sep, df.collect().iterator)

  /** K6: streaming CSV via `toLocalIterator` — constant driver memory, one
    * partition in flight at a time (replaces the reference's py2 DictWriter
    * loop, `core.py:253-263`). */
  def writeStreamingCsv(df: DataFrame, path: String, sep: String): Unit = {
    import scala.jdk.CollectionConverters._
    writeCsvIterator(df, path, sep, df.toLocalIterator().asScala)
  }

  private def writeCsvIterator(df: DataFrame, path: String, sep: String,
      rows: Iterator[org.apache.spark.sql.Row]): Unit = {
    val file = new java.io.File(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    // plain Writer, NOT PrintWriter: println there swallows IOExceptions
    // and a full disk would silently truncate the file
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(new java.io.FileOutputStream(file),
        java.nio.charset.StandardCharsets.UTF_8), 1 << 20)
    try {
      val cols = df.columns
      def esc(v: Any): String = {
        val s = if (v == null) "" else v.toString
        if (s.contains(sep) || s.contains('"') || s.contains('\n') || s.contains('\r'))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      }
      def line(s: String): Unit = { out.write(s); out.write('\n') }
      line(cols.map(esc).mkString(sep)) // header escaped like data cells
      rows.foreach(r => line(cols.indices.map(i => esc(r.get(i))).mkString(sep)))
    } finally out.close()
  }
}
