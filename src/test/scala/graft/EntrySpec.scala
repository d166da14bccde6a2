package graft

class EntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // "every query runs on sf0.001" moved to the EntryRunAllShard suites
  // (EntryRunAllSpecs.scala): as ONE test it was an 828 s monolith that
  // kept its forked group — and the whole `sbt test` run — pinned to a
  // ~17-minute floor (the r15 verify exited non-zero right at the
  // runner's budget). The four shards cover the same queries, pinned to
  // different forked groups; EntryRunAllShard asserts the union is
  // exhaustive by construction (index mod shard count).

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

  test("q103: PQ ADC + exact re-rank holds recall at 32× compression") {
    val r = SparkEntry.queries("q103_pq_recall")(spark, sfDir).head()
    assert(r.getAs[Long]("n_queries") == 20L)
    assert(r.getAs[Double]("avg_recall") >= 0.8,
      s"avg recall ${r.getAs[Double]("avg_recall")}")
    assert(r.getAs[Int]("bytes_per_vec_raw") == 256) // 64 dims × float32
    assert(r.getAs[Int]("bytes_per_vec_pq") == 8)    // m byte-sized codes
  }

  test("q40: incremental dropSeen removes every planted echo, keeps fresh batch rows") {
    val rows = SparkEntry.queries("q40_incremental_dedup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("fresh"), s"echo cohorts survived: $rows")
    assert(rows("fresh") > 0)
  }

  test("q60: every multi-token chunk respects the BPE budget and counts replay") {
    import org.apache.spark.sql.functions.col
    val chunks = SparkEntry.queries("q60_bpe_chunking")(spark, sfDir)
      .persist()
    assert(chunks.count() > 0)
    // the budget binds on the subword count wherever splitting was possible
    assert(chunks.filter(col("chunk_tokens") > 1 && col("chunk_bpe_tokens") > 128).count() == 0)
    // overlap 0: chunks partition the tokens — per-doc sums match the raw count
    import org.apache.spark.sql.functions.{filter => afilter, length, size, split, trim}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        size(afilter(split(trim(col("text")), "\\s+"), t => length(t) > 0)).as("n_toks"))
    val bad = chunks.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("chunk_tokens").as("sum_toks"))
      .join(docs, "doc_id")
      .filter(col("sum_toks") =!= col("n_toks")).count()
    assert(bad == 0, "chunk token sums must re-cover each document exactly")
    chunks.unpersist()
  }

  test("q61: real WAV codec path — header-derived frames, bounded samples") {
    val rows = SparkEntry.queries("q61_audio_decode")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_frames") == 256) // the 256×1×1 fake buffer as PCM frames
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Int]("feat_dim") == 8)
      // mean-pooled [0,1) fake samples stay in [0,1) through the PCM trip
      val sum = r.getAs[Double]("feat_sum")
      assert(sum >= 0.0 && sum <= 8.0, s"feat_sum out of range: $sum")
    }
  }

  test("q124: real AVI codec path — every frame decodes, real flag, MJPEG in tolerance") {
    val rows = SparkEntry.queries("q124_video_decode")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_frames") == 3, "all 3 muxed frames must decode")
      assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 8)
      assert(r.getAs[Int]("channels") == 3)
      assert(r.getAs[Int]("synthetic_decodes") == 0,
        "AVI decode is real — no row may carry the stand-in flag")
      val sum = r.getAs[Double]("dib_feat_sum")
      // 3 frames × 8 mean-pooled [0,1) buckets
      assert(sum >= 0.0 && sum <= 24.0, s"dib_feat_sum out of range: $sum")
      assert(r.getAs[Boolean]("mjpeg_within_tol"),
        "lossy MJPEG features must stay within tolerance of the exact DIB features")
    }
  }

  test("q126: deflate ratio separates templates from prose; a 0.25 floor splits exactly") {
    val rows = SparkEntry.queries("q126_deflate_ratio")(spark, sfDir).collect()
      .map(r => r.getBoolean(0) -> r).toMap
    assert(rows.size == 2)
    val tpl = rows(true); val prose = rows(false)
    assert(tpl.getAs[Long]("n_below_floor") == tpl.getAs[Long]("n_docs"),
      "every 40x-repeated template must deflate below the floor")
    assert(prose.getAs[Long]("n_below_floor") == 0L,
      "no prose document may deflate below the floor")
    assert(tpl.getAs[Double]("avg_ratio") < prose.getAs[Double]("avg_ratio"))
  }

  test("q129: every cross-codec twin pairs within dHash radius 3; nothing else does") {
    val rows = SparkEntry.queries("q129_image_neardup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_cross_codec"),
      s"non-planted pairs inside the radius: ${rows.keySet}")
    val p = rows("planted_cross_codec")
    assert(p.getAs[Long]("n_pairs") == 25L, // 150 plates, every 6th twinned
      s"want all 25 planted PNG<->JPEG twins, got ${p.getAs[Long]("n_pairs")}")
    assert(p.getAs[Int]("max_hamming") <= 3)
  }

  test("q144: every blur+requantized twin pairs within pHash radius 7; nothing else does") {
    val rows = SparkEntry.queries("q144_image_blur_neardup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_degraded"),
      s"non-planted pairs inside the radius: ${rows.keySet}")
    val p = rows("planted_degraded")
    assert(p.getAs[Long]("n_pairs") == 25L, // 150 plates, every 6th twinned
      s"want all 25 planted PNG<->degraded twins, got ${p.getAs[Long]("n_pairs")}")
    assert(p.getAs[Int]("max_hamming") <= 7)
  }

  test("q145: streaming cluster e2e keeps the lower id of each in-batch " +
      "cluster and drops cross-batch echoes via accreted state") {
    val rows = SparkEntry.queries("q145_stream_cluster_e2e")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch0 = rows.filter(_._1 == 0L).map(_._2).toSet
    val batch1 = rows.filter(_._1 == 1L).map(_._2).toSet
    assert(batch0 == (0L until 10L).toSet,
      s"batch 0 must keep docs 0-9 and drop the planted near/exact echoes: $batch0")
    assert(batch1 == (10L until 15L).toSet,
      s"batch 1 must keep docs 10-14 and drop the cross-batch echo: $batch1")
  }

  test("q130: every half-volume audio twin fingerprints identically; nothing else pairs") {
    val rows = SparkEntry.queries("q130_audio_neardup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_half_volume"),
      s"non-planted pairs inside the radius: ${rows.keySet}")
    val p = rows("planted_half_volume")
    assert(p.getAs[Long]("n_pairs") == 25L)
    assert(p.getAs[Int]("max_hamming") == 0,
      "volume scaling must not move a single fingerprint bit")
  }

  test("q131: every cross-codec clip twin matches on all 3 aligned frames; nothing else pairs") {
    val rows = SparkEntry.queries("q131_video_neardup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_cross_codec"),
      s"non-planted clip pairs inside the radius: ${rows.keySet}")
    val p = rows("planted_cross_codec")
    assert(p.getAs[Long]("n_pairs") == 17L) // doc_id % 6 == 0 in [0, 100)
    assert(p.getAs[Long]("min_frames_matched") == 3L)
  }

  test("q133: every trimmed audio twin matches 3 windows at ONE consistent " +
      "delta with zero hash drift; nothing else pairs") {
    val rows = SparkEntry.queries("q133_audio_trim_neardup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_trimmed"),
      s"non-planted pairs reached minWindows at a single delta: ${rows.keySet}")
    val p = rows("planted_trimmed")
    assert(p.getAs[Long]("n_pairs") == 25L)
    // trim = 2 hops: the original's window w+2 IS the trimmed clip's
    // window w, so 3 of 5 windows match exactly at delta +2
    assert(p.getAs[Long]("min_windows_matched") == 3L)
    assert(p.getAs[Int]("max_hamming") == 0,
      "hop-multiple trims are sample-identical — zero drift")
    assert(p.getAs[Int]("min_delta") == 2 && p.getAs[Int]("max_delta") == 2,
      "every planted pair aligns at the one true offset")
  }

  test("q134: every temporally-shifted video twin matches its 4 overlapping " +
      "frames at ONE delta inside the MJPEG radius; nothing else pairs") {
    val rows = SparkEntry.queries("q134_video_shift_neardup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_shifted"),
      s"non-planted clip pairs at a consistent delta: ${rows.keySet}")
    val p = rows("planted_shifted")
    assert(p.getAs[Long]("n_pairs") == 17L) // doc_id % 6 == 0 in [0, 100)
    assert(p.getAs[Long]("min_frames_matched") == 4L,
      "6-frame clips shifted by 2 overlap on exactly 4 frames")
    assert(p.getAs[Int]("max_hamming") <= 5)
    assert(p.getAs[Int]("min_delta") == 2 && p.getAs[Int]("max_delta") == 2)
  }

  test("q135: every center-crop twin pairs through all five slot-aligned " +
      "tile witnesses exactly; nothing else reaches minSlots") {
    val rows = SparkEntry.queries("q135_image_crop_neardup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_center_crop"),
      s"non-planted pairs reached minSlots: ${rows.keySet}")
    val p = rows("planted_center_crop")
    assert(p.getAs[Long]("n_pairs") == 25L)
    assert(p.getAs[Long]("min_slots_matched") == 5L,
      "a true center crop witnesses all five aligned tiles")
    assert(p.getAs[Int]("max_hamming") == 0,
      "the crop's pixels ARE the original's tile region — zero drift")
  }

  test("q137: every rotated twin pairs with BOTH directional witnesses at " +
      "zero drift; nothing else reaches two witnesses") {
    val rows = SparkEntry.queries("q137_image_rotation_neardup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("planted_rotated"),
      s"non-planted pairs reached two directional witnesses: ${rows.keySet}")
    val p = rows("planted_rotated")
    assert(p.getAs[Long]("n_pairs") == 25L)
    assert(p.getAs[Long]("min_witnesses") >= 2L,
      "a true rotation always has the forward AND reverse witness")
    assert(p.getAs[Int]("max_hamming") == 0,
      "rotation is a pixel permutation — zero drift through the PNG path")
  }

  test("q138: the media curation e2e drops exactly the 25 planted twins in " +
      "every tier — re-encodes, crops, rotations — and nothing else") {
    val rows = SparkEntry.queries("q138_media_curation_e2e")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("scalar_reencode", "center_crop", "rotation"))
    for ((tier, (dropped, planted)) <- rows) {
      assert(dropped == 25L && planted == 25L,
        s"$tier must drop exactly the planted twins: dropped=$dropped planted=$planted")
    }
  }

  test("q136: media data card counts every planted defect and collision " +
      "group exactly — nulls, corrupt assets, the 11-plate fingerprint group") {
    val r = SparkEntry.queries("q136_media_report")(spark, sfDir).head()
    assert(r.getAs[Long]("n_assets") == 110L)
    assert(r.getAs[Long]("n_null_content") == 5L)
    assert(r.getAs[Long]("n_decode_failed") == 5L,
      "corrupt assets must COUNT in the card, not kill it")
    // 100 decoded 32x32 plates
    assert(r.getAs[Long]("total_width") == 3200L && r.getAs[Long]("total_height") == 3200L)
    // 90 decoded originals have distinct plates; the 10 duplicates of
    // plate 0 join ITS group -> 90 distinct fingerprints, worst group 11
    assert(r.getAs[Long]("n_distinct_fingerprints") == 90L)
    assert(r.getAs[Long]("max_fingerprint_group") == 11L,
      "the planted duplicate cluster is the near-dup-overdue signal")
    assert(r.getAs[String]("modality") == "image")
  }

  test("q132: cluster-balanced sample fills every cluster's quota, never exceeds it") {
    val r = SparkEntry.queries("q132_cluster_balanced_sample")(spark, sfDir).head()
    assert(r.getAs[Long]("n_clusters") == 8L)
    assert(r.getAs[Long]("max_per_cluster") <= 20L, "quota must never be exceeded")
    assert(r.getAs[Long]("min_per_cluster") >= 1L, "every cluster contributes")
    assert(r.getAs[Long]("n_docs_kept") <= 160L)
  }

  test("q62: vector signature tier drops every rescaled echo, keeps fresh rows") {
    val rows = SparkEntry.queries("q62_incremental_vector_dedup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("fresh"), s"echo cohorts survived: $rows")
    assert(rows("fresh") > 0)
  }

  test("q73: SemDeDup collapses each planted triple to one survivor, untouched intact") {
    val rows = SparkEntry.queries("q73_semdedup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 30 planted triples {base, rescale, perturbation} → exactly one
    // survivor each; the other 270 bases have no semantic dup (natural
    // max cosine ~0.47 << 0.99) and must all survive
    assert(rows("triple") == 30L, s"one survivor per planted triple, got ${rows.get("triple")}")
    assert(rows("untouched") == 270L, s"untouched vectors must all survive, got ${rows.get("untouched")}")
  }

  test("q89: merged batch sketches track exact distincts; merge == single pass") {
    import org.apache.spark.sql.functions.{col, countDistinct, explode, lower}
    val got = SparkEntry.queries("q89_cardinality")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("text"))
    val exact = docs
      .select(col("lang"), col("text"),
        explode(graft.llm.Dedup.tokens(col("text"))).as("tok"))
      .groupBy("lang")
      .agg(countDistinct("text").as("d"), countDistinct("tok").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet, s"langs ${got.keySet} vs ${exact.keySet}")
    got.foreach { case (lang, (dd, dt)) =>
      val (ed, et) = exact(lang)
      // lgK=12 → ~1.6% RSE; 5% is > 3 sigma
      assert(math.abs(dd - ed) <= math.max(2.0, 0.05 * ed), s"$lang docs: $dd vs exact $ed")
      assert(math.abs(dt - et) <= math.max(2.0, 0.05 * et), s"$lang tokens: $dt vs exact $et")
    }
    // merging per-batch sketches is lossless wrt the sketch: identical
    // estimates to one pass over the whole corpus
    val single = graft.llm.Cardinality.report(
      graft.llm.Cardinality.sketchState(docs, Seq("lang")), Seq("lang"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(single == got, s"merge lost information: $single vs $got")
  }

  test("q90: id encoding — zero unks on the training slice, count parity, checksum sane") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q90_bpe_encode")(spark, sfDir)
      .persist()
    // the vocab covers every segment the tokenizer can emit over its
    // own training corpus — docs < 100 must encode with ZERO <unk>s
    assert(out.filter(col("doc_id") < 100 && col("n_unk") > 0).count() == 0,
      "training-slice docs hit <unk> — vocab does not cover its own corpus")
    // id count == the native bpe token count for every doc (same
    // segmentation, same memo)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val joined = out.join(docs, "doc_id")
    val base = {
      // mirror SparkEntry.statePath exactly: WHOLE-tree max mtime,
      // including the dir's own timestamp
      def maxMtime(f: java.io.File): Long = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        kids.foldLeft(f.lastModified)((m, k) => math.max(m, maxMtime(k)))
      }
      new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_state"),
        s"${sfDir.replaceAll("[^A-Za-z0-9.-]", "_")}_m${maxMtime(new java.io.File(sfDir))}_q90_bpe").toString
    }
    val counts = joined.withColumn("__n",
      graft.functions.GraftFunctions.bpeCount(col("text"), s"$base/merges.txt"))
    assert(counts.filter(col("n_ids") =!= col("__n")).count() == 0,
      "size(ids) diverged from graft_bpe_count")
    // checksums are nonzero wherever a doc has any non-<unk> id
    assert(out.filter(col("n_ids") > 0 && col("n_ids") =!= col("n_unk") &&
      col("id_sum") === 0).count() == 0)
    out.unpersist()
  }

  test("q109: byte-fallback total encoding — zero unks on the WHOLE held-out " +
      "slice, fallback provably fires on unseen characters, lossless round-trip") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q109_bpe_byte_fallback")(spark, sfDir)
      .persist()
    // <unk> is structurally impossible under a byte-fallback vocab —
    // including on held-out docs with planted never-seen characters
    assert(out.filter(col("n_unk") > 0).count() == 0,
      "held-out docs hit <unk> — byte fallback did not fire")
    // decode(encode_lossless(x)) == x byte-for-byte on EVERY held-out doc
    assert(out.filter(col("roundtrip_ok") =!= 1).count() == 0,
      "lossless round-trip broke on a held-out doc")
    // the byte-token path is genuinely exercised
    assert(out.filter(col("n_byte_ids") > 0).count() > 0)
    // and specifically by UNSEEN CHARS, not just whitespace: the planted
    // string encodes (non-lossless — no whitespace ids) to byte tokens
    // with zero <unk>, under the same artifacts the query built
    val base = {
      def maxMtime(f: java.io.File): Long = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        kids.foldLeft(f.lastModified)((m, k) => math.max(m, maxMtime(k)))
      }
      new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir"), "graft_state"),
        s"${sfDir.replaceAll("[^A-Za-z0-9.-]", "_")}_m${maxMtime(new java.io.File(sfDir))}_q109_bpe_fb").toString
    }
    import spark.implicits._
    val planted = Seq("naïve ☃😀").toDF("t")
      .select(graft.functions.GraftFunctions.bpeEncode(
        col("t"), s"$base/merges.txt", s"$base/vocab.txt").as("ids"))
      .head().getSeq[Int](0)
    assert(!planted.contains(0), s"planted chars hit <unk>: $planted")
    assert(planted.exists(i => i >= 2 && i <= 257),
      s"planted chars did not use the byte-token range: $planted")
    out.unpersist()
  }

  test("q112/q113: byte-level BPE — round-trip reproduces the input " +
      "corpus-wide, and the Ġ-economy beats byte-fallback lossless") {
    import org.apache.spark.sql.functions.{col, concat, lit, pmod, when}
    // q112 returns decode(encode(text)); the API-level twin of the
    // driver's oracle: it must equal the (suffix-planted) input exactly
    val rt = SparkEntry.queries("q112_bpe_byte_roundtrip")(spark, sfDir)
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit(" naïve ☃😀")))
          .otherwise(col("text")).as("text"))
    assert(rt.except(expected).count() == 0 && expected.except(rt).count() == 0,
      "byte-level decode(encode(x)) diverged from x somewhere in the corpus")
    // q113: the whole point of the second tokenizer family — fewer ids
    // than the byte-fallback lossless export on the same text, with
    // BOTH streams still round-tripping every held-out doc
    val e = SparkEntry.queries("q113_bpe_byte_economy")(spark, sfDir).head()
    val n = e.getAs[Long]("n_docs")
    assert(n > 0)
    assert(e.getAs[Long]("byte_level_ids") < e.getAs[Long]("byte_fallback_ids"),
      s"byte-level (${e.getAs[Long]("byte_level_ids")}) must be strictly cheaper " +
        s"than byte-fallback (${e.getAs[Long]("byte_fallback_ids")})")
    assert(e.getAs[Long]("n_roundtrip_byte") == n, "a byte-level round-trip broke")
    assert(e.getAs[Long]("n_roundtrip_fallback") == n, "a fallback round-trip broke")
  }

  test("q139/q140/q141: unigram + WordPiece gates — round-trips equal the " +
      "planted input, unigram compresses, count == size(encode) corpus-wide") {
    import org.apache.spark.sql.functions.{col, concat, lit, pmod, when}
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit(" naïve ☃😀")))
          .otherwise(col("text")).as("text"))
    // q139: Viterbi encode-lossless → decode is the identity (API-level
    // twin of the driver's oracle)
    val ug = SparkEntry.queries("q139_unigram_roundtrip")(spark, sfDir)
    assert(ug.except(expected).count() == 0 && expected.except(ug).count() == 0,
      "unigram decode(encode_lossless(x)) diverged from x somewhere")
    // q141: WordPiece structural round-trip is the identity too
    val wp = SparkEntry.queries("q141_wordpiece_roundtrip")(spark, sfDir)
    assert(wp.except(expected).count() == 0 && expected.except(wp).count() == 0,
      "wordpiece roundtrip diverged from x somewhere")
    // q140: the learned pieces compress, and the count expression
    // agrees with the encode array on EVERY held-out doc
    val e = SparkEntry.queries("q140_unigram_economy")(spark, sfDir).head()
    val n = e.getAs[Long]("n_docs")
    assert(n > 0)
    assert(e.getAs[Long]("consistent") == n,
      "graft_unigram_count != size(graft_unigram_encode) on some doc")
    assert(e.getAs[Long]("unigram_ids") > 0)
    assert(e.getAs[Long]("unigram_ids") < e.getAs[Long]("char_units"),
      s"unigram ids (${e.getAs[Long]("unigram_ids")}) must compress below " +
        s"non-whitespace units (${e.getAs[Long]("char_units")})")
    // q142: every multi-token chunk respects the 128-id budget, chunk
    // ids are dense per doc, and every chunked doc survives
    val ch = SparkEntry.queries("q142_unigram_chunking")(spark, sfDir)
    assert(ch.count() > 0)
    assert(ch.filter(col("chunk_bpe_tokens") > 128 && col("chunk_tokens") > 1).count() == 0,
      "a multi-token chunk exceeded the unigram id budget")
    val dense = ch.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.max("chunk_id").as("mx"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1).count()
    assert(dense == 0, "chunk ids must be dense 0..n-1 per doc")
  }

  test("q78: learned merge table — dense ranks, true-argmax first merge, " +
      "table genuinely compresses the corpus under graft_bpe_count") {
    import org.apache.spark.sql.functions.col
    val m = SparkEntry.queries("q78_bpe_learn")(spark, sfDir)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(m.length == 12 && m.map(_._1).toSeq == (0L until 12L))
    // merge 1 re-derived from raw pair counts, no trainer code involved
    val wc = graft.llm.BpeTrainer.pretokenCounts(
      spark.read.parquet(s"$sfDir/documents.parquet").select("text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
    for ((w, c) <- wc; i <- 0 until w.length - 1) {
      val p = (String.valueOf(w(i)), String.valueOf(w(i + 1)))
      pairs(p) = pairs.getOrElse(p, 0L) + c
    }
    val maxN = pairs.values.max
    val expect = pairs.filter(_._2 == maxN).keys.toSeq.sorted.head
    assert((m(0)._2, m(0)._3) == expect, s"first merge ${m(0)} vs argmax $expect")
    // round trip: the learned table drives the existing consumers and
    // strictly compresses vs char-level (an empty table)
    val dir = java.nio.file.Files.createTempDirectory("q78")
    val learned = dir.resolve("learned.txt").toString
    val empty = dir.resolve("empty.txt").toString
    graft.llm.BpeTrainer.saveMerges(spark, learned, m.map(x => (x._2, x._3)).toSeq)
    graft.llm.BpeTrainer.saveMerges(spark, empty, Seq.empty)
    val cmp = spark.read.parquet(s"$sfDir/documents.parquet").limit(200).select(
      org.apache.spark.sql.functions.sum(
        graft.llm.TextAnalysis.bpeTokenCount(col("text"), learned)).as("l"),
      org.apache.spark.sql.functions.sum(
        graft.llm.TextAnalysis.bpeTokenCount(col("text"), empty)).as("e")).head()
    assert(cmp.getLong(0) < cmp.getLong(1),
      s"learned table must compress: ${cmp.getLong(0)} vs ${cmp.getLong(1)}")
  }

  test("q88: trained classifier separates corpus prose from hex gibberish — " +
      "and the weights round-trip into a working scorer") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q88_classifier_train")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet ==
      (graft.llm.QualityClassifier.FeatureNames :+ "intercept").toSet)
    assert(rows.values.forall(w => !w.isNaN && !w.isInfinite))
    // rebuild the model from the QUERY OUTPUT (not trainer internals)
    // and re-score both training cohorts: prose ~1, gibberish ~0
    val clf = graft.llm.QualityClassifier(
      graft.llm.QualityClassifier.FeatureNames.map(n => n -> rows(n)),
      rows("intercept"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mRef = docs.filter(col("doc_id") % 2 === 0)
      .select(avg(clf.score(col("text")))).head().getDouble(0)
    val mNeg = docs.filter(col("doc_id") % 2 === 1)
      .withColumn("text", concat_ws(" ",
        md5(col("text")), md5(concat(col("text"), lit("a"))),
        md5(concat(col("text"), lit("b"))), md5(concat(col("text"), lit("c")))))
      .select(avg(clf.score(col("text")))).head().getDouble(0)
    assert(mRef > 0.9 && mNeg < 0.1,
      s"classifier must separate the cohorts: ref=$mRef neg=$mNeg")
  }

  test("q91: bag-of-words classifier separates HELD-OUT prose from gibberish " +
      "with a margin the shape features alone need not reach") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q91_bow_classifier")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set("ref", "neg"), s"cohorts: ${rows.keySet}")
    val (nRef, avgRef, minRef, _) = rows("ref")
    val (nNeg, avgNeg, _, maxNeg) = rows("neg")
    assert(nRef > 0 && nNeg > 0)
    // held-out separation floor: cohorts land on the right side of 0.5
    // and the averages are far apart (the planted vocabularies do not
    // overlap, so a working BOW model should be near-saturated)
    assert(avgRef > 0.9 && avgNeg < 0.1,
      s"BOW classifier must separate held-out cohorts: ref=$avgRef neg=$avgNeg")
    assert(minRef > 0.5 && maxNeg < 0.5,
      s"every held-out doc must classify correctly: minRef=$minRef maxNeg=$maxNeg")
  }

  test("q95: contamination budget — shared grams EXACT, sketch denominator " +
      "within 5% of exact, fraction arithmetic consistent") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q95_contamination_budget")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.nonEmpty)
    // exact replay: per-source distinct 8-gram shingles + exact overlap
    // with the benchmark slice (docs < 50)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val grams = docs.select(col("source"),
      explode(graft.llm.Dedup.shingles(col("text"), 8)).as("g")).distinct()
    val benchGrams = docs.filter(col("doc_id") < 50)
      .select(explode(graft.llm.Dedup.shingles(col("text"), 8)).as("g")).distinct()
    val exactDistinct = grams.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactShared = grams.join(benchGrams, Seq("g"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exactDistinct.keySet)
    rows.foreach { case (src, (est, shared, frac)) =>
      assert(shared == exactShared.getOrElse(src, 0L),
        s"$src: shared grams must be EXACT: $shared vs ${exactShared.get(src)}")
      assert(shared > 0, s"$src: benchmark drawn from the corpus must overlap")
      val exact = exactDistinct(src)
      assert(math.abs(est - exact) <= 0.05 * exact,
        s"$src: sketch estimate $est vs exact $exact beyond 5%")
      assert(math.abs(frac - shared.toDouble / est) < 1e-5,
        s"$src: fraction must be shared/estimate")
    }
  }

  test("q96: char-n-gram classifier saturates separation on UNSEEN-word noise; " +
      "the word-identity model demonstrably does not") {
    val rows = SparkEntry.queries("q96_chargram_classifier")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.keySet ==
      Set(("word", "ref"), ("word", "neg"), ("char", "ref"), ("char", "neg")),
      s"model×cohort grid: ${rows.keySet}")
    val (nCharRef, avgCharRef, minCharRef, _) = rows(("char", "ref"))
    val (nCharNeg, avgCharNeg, _, maxCharNeg) = rows(("char", "neg"))
    assert(nCharRef > 0 && nCharNeg > 0)
    // the char-gram surface generalizes: hex grams were trained even
    // though every held-out WORD is new
    assert(avgCharRef > 0.9 && avgCharNeg < 0.1,
      s"char model must separate unseen-word cohorts: ref=$avgCharRef neg=$avgCharNeg")
    assert(minCharRef > 0.5 && maxCharNeg < 0.5,
      s"every held-out doc must classify: minRef=$minCharRef maxNeg=$maxCharNeg")
    // the word model's failure IS the demonstration: unseen tokens hash
    // to untrained buckets, so the unseen-noise cohort is NOT
    // confidently rejected (scores sit near the prior, not near 0)
    val (_, avgWordNeg, _, _) = rows(("word", "neg"))
    assert(avgWordNeg > 0.3,
      s"word model should NOT confidently reject unseen-word noise " +
        s"(that's the char-gram gap): avgWordNeg=$avgWordNeg")
    assert(avgCharNeg < avgWordNeg - 0.2,
      s"char model must beat word identity on unseen noise: " +
        s"char=$avgCharNeg word=$avgWordNeg")
  }

  test("q36 dim-chain plan: both dimensions broadcast, no sort-merge join") {
    val plan = SparkEntry.queries("q36_supplier_region")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2, s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must not shuffle for dims:\n$plan")
  }
}
