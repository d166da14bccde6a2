package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.datadiff.DataDiff
import graft.llm.{Dedup, TextAnalysis}
import graft.operators.Ops

/** Property-based invariants (SURVEY.md §5): generated inputs, laws the
  * reference implies but never tests. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatest bridge offline):
    * n samples from `gen`, seeds 0..n-1. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  private val texts: Gen[List[String]] = Gen.listOfN(30,
    Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("the", "cat", "sat", "on", "mat", "a", "b", "x1", "", "42"))
        .map(_.mkString(" "))))

  private val doubles: Gen[List[Double]] =
    Gen.listOfN(40, Gen.chooseNum(-1e6, 1e6)).suchThat(_.nonEmpty)

  test("TVD is symmetric, in [0,1], and 0 on identical columns") {
    samples(texts, 5).foreach { ts =>
      if (ts.nonEmpty) {
        val df = ts.toDF("v")
        val d2 = ts.reverse.toDF("v")
        val ab = DataDiff.discreteComparator(df, "v", d2, "v", 64)
        val ba = DataDiff.discreteComparator(d2, "v", df, "v", 64)
        assert(math.abs(ab - ba) < 1e-12)
        assert(ab >= 0.0 && ab <= 1.0)
        assert(DataDiff.discreteComparator(df, "v", df, "v", 64) == 0.0)
      }
    }
  }

  test("hash histogram frequencies always sum to 1") {
    samples(texts, 5).foreach { ts =>
      if (ts.nonEmpty) {
        val h = DataDiff.hashHistogram(ts.toDF("v"), "v", 32)
        assert(math.abs(h.values.sum - 1.0) < 1e-9)
        assert(h.values.forall(f => f > 0.0 && f <= 1.0))
      }
    }
  }

  test("pandify is idempotent and preserves row count") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100)
    val once = Ops.pandify(df)
    val twice = Ops.pandify(once)
    assert(once.schema == twice.schema)
    assert(once.count() == twice.count())
  }

  test("exactLimit(n) returns at most n rows for any n") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    samples(Gen.chooseNum(0, 2000), 5).foreach { n =>
      assert(Ops.exactLimit(df, n).count() <= n)
    }
  }

  test("proportionSamples never exceeds any stratum quota") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    samples(Gen.chooseNum(1, 20), 3).foreach { quota =>
      val props = o.select("o_orderpriority").distinct()
        .withColumn("rows_count", lit(quota))
      val sampled = Ops.proportionSamples(o, props, Seq("o_orderpriority"), Seq(col("o_orderkey")))
      val maxPerStratum = sampled.groupBy("o_orderpriority").count()
        .agg(max("count")).head().getLong(0)
      assert(maxPerStratum <= quota)
    }
  }

  test("exact dedup: groups partition the rows (sum of copies == row count)") {
    samples(texts, 5).foreach { ts =>
      if (ts.nonEmpty) {
        val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val groups = Dedup.exactDuplicateGroups(df, "text", "id")
        assert(groups.agg(sum("n_copies")).head().getLong(0) == ts.length)
        assert(Dedup.dropExactDuplicates(df, "text", "id").count() == groups.count())
      }
    }
  }

  test("ngramJaccard is within [0,1] and 1 on self") {
    samples(Gen.alphaLowerStr.suchThat(_.nonEmpty), 5).foreach { s =>
      val row = spark.range(1).select(
        Dedup.ngramJaccard(lit(s), lit(s)).as("self"),
        Dedup.ngramJaccard(lit(s), lit(s + " zzz qqq www vvv")).as("near")).head()
      assert(row.getDouble(0) == 1.0)
      assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
    }
  }

  test("qualityScore stays in [0,1] on arbitrary strings") {
    samples(Gen.asciiPrintableStr, 10).foreach { s =>
      val q = spark.range(1).select(TextAnalysis.qualityScore(lit(s))).head().getDouble(0)
      assert(q >= 0.0 && q <= 1.0, s"quality $q for ${s.take(30)}")
    }
  }

  test("histogram sketch: weight conserved and range correct under any partitioning") {
    samples(doubles, 3).foreach { xs =>
      (1 to 3).foreach { parts =>
        val rows = xs.toDF("x").repartition(parts)
          .agg(graft.functions.HistogramSketch.sketch(col("x")).as("s"))
          .head().getSeq[org.apache.spark.sql.Row](0)
        val (cs, ws) = graft.functions.HistogramSketch.decode(rows)
        assert(ws.sum == xs.length, s"weight lost at $parts partitions")
        assert(cs.head >= xs.min - 1e-9 && cs.last <= xs.max + 1e-9)
      }
    }
  }

  test("probed banded join equals brute force for any legal (radius, bands, " +
      "probe) geometry on clustered random signatures") {
    // generated sig families with planted flip-variants so pairs
    // straddle every radius; geometry drawn from the legal grid
    // (maxHamming < bands*(probe+1)) including the unprobed forms —
    // completeness AND no-false-positives, guard off
    val rnd = new scala.util.Random(4233)
    val base = Seq.fill(20)(rnd.nextLong())
    val sigsSeq = (base ++ base.flatMap { s =>
      Seq.fill(2) {
        var v = s
        rnd.shuffle((0 until 64).toList).take(rnd.nextInt(10)).foreach(j => v ^= 1L << j)
        v
      }
    }).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val sigs = sigsSeq.toDF("id", "sig")
    for {
      (bands, probe) <- Seq((4, 0), (8, 0), (4, 1), (8, 1), (16, 1))
      maxHamming <- Seq(1, 3, bands * (probe + 1) - 1).distinct
    } {
      val want = (for {
        (i1, s1) <- sigsSeq; (i2, s2) <- sigsSeq
        if i1 < i2 && java.lang.Long.bitCount(s1 ^ s2) <= maxHamming
      } yield (i1, i2)).toSet
      val got = graft.llm.Dedup.sigNearDups(sigs, maxHamming, bands,
        maxBucketSize = 0, probe = probe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"(bands=$bands probe=$probe r=$maxHamming): missing ${want -- got}, " +
          s"extra ${got -- want}")
    }
  }

  test("WIDE probed banded join equals brute force for any legal (radius, " +
      "bands, probe, sigBits) geometry on clustered 128/256-bit signatures") {
    val rnd = new scala.util.Random(4233)
    for (words <- Seq(2, 4)) {
      val sigBits = words * 64
      def randSig() = Array.fill(words)(rnd.nextLong())
      val base = Seq.fill(12)(randSig())
      val sigsSeq = (base ++ base.flatMap { s =>
        Seq.fill(2) {
          val v = s.clone()
          rnd.shuffle((0 until sigBits).toList).take(rnd.nextInt(sigBits / 6))
            .foreach(j => v(j >> 6) ^= 1L << (j & 63))
          v
        }
      }).zipWithIndex.map { case (s, i) => (i.toLong, s.toSeq) }
      val sigs = sigsSeq.toDF("id", "sig")
      def ham(a: Seq[Long], b: Seq[Long]): Int =
        a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      // legal grid: bands divides sigBits, width in [8,32] dividing 64
      val geoms = (if (words == 2) Seq((4, 0), (8, 0), (8, 1), (16, 1))
        else Seq((8, 0), (16, 0), (16, 1), (32, 1)))
      for {
        (bands, probe) <- geoms
        maxHamming <- Seq(3, bands * (probe + 1) - 1).distinct
      } {
        val want = (for {
          (i1, s1) <- sigsSeq; (i2, s2) <- sigsSeq
          if i1 < i2 && ham(s1, s2) <= maxHamming
        } yield (i1, i2)).toSet
        val got = graft.llm.Dedup.wideSigNearDups(sigs, maxHamming, bands,
          maxBucketSize = 0, probe = probe, sigBits = sigBits)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want,
          s"($sigBits bits, bands=$bands probe=$probe r=$maxHamming): " +
            s"missing ${want -- got}, extra ${got -- want}")
      }
    }
  }

  test("saltedJoin equals plain join for any salt factor") {
    val skewed = ((1 to 500).map(i => ("hot", i)) ++ (1 to 20).map(i => (s"k$i", i))).toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k3", "C")).toDF("key", "name")
    val want = skewed.join(dim, Seq("key")).count()
    samples(Gen.chooseNum(2, 64), 4).foreach { factor =>
      assert(Ops.saltedJoin(skewed, dim, "key", factor).count() == want, s"factor $factor")
    }
  }

  test("continuous histogram conserves in-range mass") {
    samples(doubles, 5).foreach { xs =>
      val df = xs.toDF("x")
      val edges = DataDiff.equiWidthEdges(df, "x", 16)
      if (edges.length >= 2) {
        val total = DataDiff.continuousHistogramDF(df, "x", edges)
          .agg(sum("cnt")).head().getLong(0)
        assert(total == xs.length) // edges span min..max → nothing dropped
      }
    }
  }

  test("chunking conserves the token stream for any (chunkSize, overlap)") {
    val params = Gen.chooseNum(2, 12).flatMap(cs =>
      Gen.chooseNum(0, cs - 1).map(ov => (cs, ov)))
    val docs = samples(texts, 1).head.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val tokenTotal = docs.select(
      sum(size(filter(split(trim(col("text")), "\\s+"), t => length(t) > 0))))
      .head().getLong(0)
    samples(params, 6).foreach { case (cs, ov) =>
      val step = cs - ov
      val chunks = graft.llm.CorpusPrep.chunkByTokens(docs, "doc_id", "text", cs, ov)
      // every chunk but a doc's last carries exactly chunkSize tokens;
      // total tokens = sum over chunks of (full steps + last remainder):
      // ids dense from 0 and each token appears in ≥1 chunk ⇒ the
      // de-overlapped total equals the doc token total
      val deOverlapped = chunks
        .withColumn("own", when(col("chunk_id") === 0, col("chunk_tokens"))
          .otherwise(greatest(col("chunk_tokens") - ov, lit(0L))))
        .agg(sum("own")).head().getLong(0)
      assert(deOverlapped == tokenTotal, s"cs=$cs ov=$ov step=$step")
      val over = chunks.filter(col("chunk_tokens") > cs).count()
      assert(over == 0)
    }
  }

  test("hashSample: nested thresholds nest and fractions concentrate for any salt") {
    val ids = (1L to 400L).toDF("id")
    samples(Gen.alphaNumStr.map(_.take(6)), 4).foreach { salt =>
      val s10 = Ops.hashSample(ids, "id", 0.1, salt).collect().map(_.getLong(0)).toSet
      val s50 = Ops.hashSample(ids, "id", 0.5, salt).collect().map(_.getLong(0)).toSet
      val all = Ops.hashSample(ids, "id", 1.0, salt).count()
      assert(s10.subsetOf(s50), s"salt=$salt")
      assert(all == 400L) // fraction 1.0 is total after the threshold fix
      assert(s50.size > s10.size)
    }
  }

  test("asofJoin equals the max-struct subquery on random event sets") {
    val gen = for {
      lefts <- Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 50L)))
      rights <- Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 50L)))
    } yield (lefts, rights)
    samples(gen, 4).zipWithIndex.foreach { case ((ls, rs), it) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000L, k, t) }
        .toDF("rid", "k", "t")
      val got = Ops.asofJoin(left, right.select(col("k"), col("t"), col("rid")),
        Seq("k"), "t", Seq("rid" -> "prior"))
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      val want = left.join(right.select(col("k"), col("t").as("rt"), col("rid")), Seq("k"), "left")
        .filter(col("rt").isNull || col("rt") <= col("t"))
        .groupBy("lid").agg(max(struct(col("rt"), col("rid"))).as("m"))
        .select(col("lid"), col("m.rid"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      // rows with no match at all drop out of the filtered join; fold in
      val wantFull = got.keys.map(k => k -> want.getOrElse(k, None)).toMap
      assert(got == wantFull, s"iteration $it")
    }
  }

  test("normalizeText is idempotent and returns NFC on generated unicode soup") {
    val soup: Gen[List[String]] = Gen.listOfN(20,
      Gen.listOfN(12, Gen.oneOf(
        "a", "B", " ", "\n", "\t", "\r\n",
        "\u00e9", "e\u0301", "caf\u00c3\u00a9",
        "\u00e2\u20ac\u0153", "\u00e2\u0080\u0099",
        "\u0007", "\u009f",
        "\u4f60\u597d", "\ud83d\ude00", "x.y!", "{", "0")).map(_.mkString))
    samples(soup, 4).foreach { ts =>
      val df = ts.toDF("text")
      val once = df.select(TextAnalysis.normalizeText(col("text")).as("t"))
      val twice = once.select(TextAnalysis.normalizeText(col("t")).as("t"))
      val o = once.collect().map(_.getString(0))
      val w = twice.collect().map(_.getString(0))
      assert(o.sameElements(w), "normalizeText must be idempotent")
      o.foreach { s =>
        assert(java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
        assert(!s.exists(ch => ch < ' ' && ch != '\n' && ch != '\t'),
          s"no bare control chars may survive: ${s.map(_.toInt)}")
      }
    }
  }

  test("unigram lossless round-trip, count==size(encode), and Viterbi optimality " +
      "vs the all-singles cover on generated unicode soup") {
    import graft.functions.{IdVocab, UnigramRegistry, UnigramVocab}
    // a fixed tiny model: a few multi-char pieces over ascii + one CJK
    val f = java.nio.file.Files.createTempFile("graft_prop_ug", ".tsv")
    val sb = new StringBuilder
    sb.append("<unk>\t-60.0\n<eos>\t0.0\n")
    (0 until 256).foreach(b => sb.append(s"${IdVocab.byteToken(b)}\t-50.0\n"))
    Seq("a" -> -2.0, "B" -> -2.5, "aB" -> -1.5, "x" -> -2.0, "y" -> -2.0,
      "xy" -> -1.2, "\u4f60\u597d" -> -1.0, "\u4f60" -> -3.0, "\u597d" -> -3.0,
      "0" -> -2.0, "42" -> -1.8, "4" -> -2.2, "2" -> -2.2)
      .foreach { case (pc, sc) => sb.append(s"$pc\t$sc\n") }
    java.nio.file.Files.write(f, sb.toString.getBytes("UTF-8"))
    val v = UnigramRegistry.get(f.toString)
    val soup: Gen[List[String]] = Gen.listOfN(25,
      Gen.listOfN(14, Gen.oneOf(
        "a", "B", "aB", "xy", " ", "\n", "\t",
        "\u4f60\u597d", "\ud83d\ude00", "q", "42", "0", "!", "{", "\u0007"))
        .map(_.mkString))
    samples(soup, 6).foreach { ts =>
      ts.foreach { t =>
        // totality + losslessness on ANY string (OOV, emoji, controls)
        val ids = v.encode(t, lossless = true)
        val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array.tabulate(ids.size)(i => ids.get(i).intValue()))
        assert(v.decode(arr).toString == t, s"round-trip broke on '$t'")
        // the count expression and the encode array always agree
        assert(v.idCount(t) == v.encode(t, lossless = false).size)
        // segments concatenate back to each pretoken, and never emit <unk>
        assert(!ids.contains(Integer.valueOf(0)), "unigram must never emit <unk>")
      }
    }
    // Viterbi optimality law: the chosen cover's score is >= the
    // all-singles cover's score for any pretoken over model pieces
    val words = Gen.listOfN(30, Gen.listOfN(6,
      Gen.oneOf("a", "B", "x", "y", "0", "4", "2")).map(_.mkString))
    val idx = new java.util.HashMap[String, Integer]()
    val pieces = Seq("a", "B", "aB", "x", "y", "xy", "0", "42", "4", "2")
    val scores = Array(-2.0, -2.5, -1.5, -2.0, -2.0, -1.2, -2.0, -1.8, -2.2, -2.2)
    pieces.zipWithIndex.foreach { case (pc, i) => idx.put(pc, i) }
    samples(words, 4).foreach(_.foreach { w =>
      if (w.nonEmpty) {
        val best = graft.llm.UnigramTrainer.viterbiScore(
          w, idx, scores, 2, -50.0, exclude = -1)
        val singles = w.map(ch => scores(idx.get(ch.toString).intValue())).sum
        assert(best >= singles - 1e-9,
          s"Viterbi ($best) must beat the all-singles cover ($singles) on '$w'")
        // and the emitted segmentation concatenates back to the word
        assert(v.segmentWord(w).mkString == w)
      }
    })
  }

  test("wordpiece structural round-trip is the identity on generated unicode soup") {
    import graft.functions.WordPieceRegistry
    val f = java.nio.file.Files.createTempFile("graft_prop_wp", ".txt")
    java.nio.file.Files.write(f,
      Seq("[UNK]", "a", "##a", "##B", "xy", "##z", "#", "##", "\u4f60")
        .mkString("\n").getBytes("UTF-8"))
    val v = WordPieceRegistry.get(f.toString)
    val soup: Gen[List[String]] = Gen.listOfN(25,
      Gen.listOfN(14, Gen.oneOf(
        "a", "aa", "aB", "xyz", " ", "\n", "##", "####", "#a#",
        "\u4f60\u597d", "\ud83d\ude00", "q", "42", "!", "\u0007"))
        .map(_.mkString))
    samples(soup, 6).foreach(_.foreach { t =>
      assert(v.roundtrip(t) == t, s"wordpiece round-trip broke on '$t'")
      // count always equals the id array the encoder emits
      assert(v.idCount(t) == v.encode(t).size)
    })
  }

  test("graft_html_entities: identity without '&'; every table name decodes in " +
      "context; valid numerics round-trip; invalid forms pass through") {
    import scala.jdk.CollectionConverters._
    def decode(ss: Seq[String]): Seq[String] =
      ss.toDF("text")
        .select(graft.functions.GraftFunctions.htmlEntities(col("text")).as("t"))
        .collect().toSeq.map(_.getString(0))
    val table = graft.functions.HtmlEntityImpl.table.asScala
    // ampersand-free text is untouched (also byte-identical fast path)
    val plain: Gen[List[String]] = Gen.listOfN(25,
      Gen.listOfN(10, Gen.oneOf("a", "Z", " ", "<", ">", ";", "#",
        "é", "你", "😀", "lt", "amp", "9")).map(_.mkString))
    samples(plain, 3).foreach { ts =>
      assert(decode(ts) == ts, "no '&' → identity")
    }
    // sampled named references decode between random safe affixes
    val names = table.keys.toVector.sorted
    val named: Gen[List[(String, String)]] = Gen.listOfN(40,
      for {
        n <- Gen.oneOf(names)
        pre <- Gen.oneOf("", "x", " ", "&", "&#", "&zz ")
        post <- Gen.oneOf("", "y", ";", " &", "q;")
      } yield (pre + n + post, pre + table(n) + post))
    samples(named, 3).foreach { pairs =>
      // affixes chosen so they cannot complete a reference themselves:
      // '&'/'&#'/'&zz ' have no terminating ';' before the next ref
      val (in, want) = pairs.unzip
      assert(decode(in) == want, "table names must decode in any context")
    }
    // valid numeric references round-trip any non-surrogate codepoint
    val cps: Gen[List[Int]] = Gen.listOfN(30, Gen.frequency(
      4 -> Gen.chooseNum(1, 0xd7ff), 1 -> Gen.chooseNum(0xe000, 0x10ffff)))
    samples(cps, 3).foreach { cs =>
      val dec = cs.map(cp => s"a&#$cp;b")
      val hex = cs.map(cp => f"a&#x$cp%X;b")
      val want = cs.map(cp => "a" + new String(Character.toChars(cp)) + "b")
      assert(decode(dec) == want, "decimal numerics")
      assert(decode(hex) == want, "hex numerics")
    }
    // invalid forms survive verbatim
    val bad = Seq("&#0;", "&#xD800;", "&#x110000;", "&#;", "&nosuchname;",
      "&amp", "& amp;", "&#12a;")
    assert(decode(bad) == bad, "invalid references must pass through")
  }

  test("graft_fix_mojibake: inverts the cp1252 rendering of any clean string; " +
      "idempotent on arbitrary soup") {
    def fix(ss: Seq[String]): Seq[String] =
      ss.toDF("text")
        .select(graft.functions.GraftFunctions.fixMojibake(col("text")).as("t"))
        .collect().toSeq.map(_.getString(0))
    def render(s: String): String = // UTF-8 bytes read as cp1252 — the damage
      new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
    // clean strings over 2/3/4-byte codepoints: fix(render(s)) == s
    // whenever s is itself a fixed point (a string that already looks
    // like mojibake legitimately unwinds one layer further — that IS
    // the contract, so such samples are asserted to unwind instead)
    val clean: Gen[List[String]] = Gen.listOfN(25,
      Gen.listOfN(8, Gen.oneOf(
        "a", " ", "9", "é", "ñ", "€", "’", "—",
        "你", "š", "😊", ".")).map(_.mkString))
    samples(clean, 4).foreach { ts =>
      val fixedPoint = ts.zip(fix(ts)).collect { case (s, f) if s == f => s }
      val back = fix(fixedPoint.map(render))
      fixedPoint.zip(back).foreach { case (s, b) =>
        assert(b == s, s"fix(render('$s')) = '$b'")
      }
    }
    // idempotence on arbitrary soup, mojibake fragments included
    val soup: Gen[List[String]] = Gen.listOfN(25,
      Gen.listOfN(10, Gen.oneOf(
        "a", "Ã", "©", "â", "€", "™", "",
        "", "¿", "😊", " ", "&")).map(_.mkString))
    samples(soup, 4).foreach { ts =>
      val once = fix(ts)
      assert(fix(once) == once, "fix must be idempotent")
    }
  }

  test("tokenBudgetMix: kept sets nest as budgets grow; token mass within " +
      "one doc of the budget; whole-corpus budget is identity") {
    val rows: Gen[List[(Long, String, Long)]] = Gen.listOfN(40,
      for {
        id <- Gen.chooseNum(0L, 10000L)
        src <- Gen.oneOf("a", "b", "c")
        n <- Gen.chooseNum(1L, 50L)
      } yield (id, src, n)).map(_.distinctBy(_._1))
    samples(rows, 4).filter(_.nonEmpty).foreach { rs =>
      val df = rs.toDF("doc_id", "source", "n_tokens")
      val total = rs.filter(_._2 == "a").map(_._3).sum
      val budgets = Seq(total / 4, total / 2, total + 1).filter(_ > 0)
      val keptSets = budgets.map { b =>
        graft.llm.CorpusPrep.tokenBudgetMix(df, "doc_id", "source", "n_tokens",
            Map("a" -> b))
          .filter(col("source") === "a")
          .select("doc_id").as[Long].collect().toSet
      }
      keptSets.sliding(2).foreach {
        case Seq(small, big) => assert(small.subsetOf(big), "budgets must nest")
        case _ =>
      }
      budgets.zip(keptSets).foreach { case (b, kept) =>
        val mass = rs.filter(r => kept.contains(r._1)).map(_._3).sum
        val maxDoc = rs.filter(_._2 == "a").map(_._3).max
        assert(mass >= math.min(b, total), s"budget $b underfilled: $mass")
        assert(mass < b + maxDoc, s"budget $b overshot beyond one doc: $mass")
      }
      assert(keptSets.last == rs.filter(_._2 == "a").map(_._1).toSet,
        "a budget covering the whole source is identity")
    }
  }

  test("MG heavy-hitter merge: lifetime estimates within n/(k+1) of exact " +
      "for any batch split") {
    val vals: Gen[List[String]] = Gen.listOfN(120,
      Gen.frequency(3 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        5 -> Gen.chooseNum(0, 40).map(i => s"v$i")))
    samples(vals, 4).foreach { vs =>
      val k = 8
      val (b1, b2) = vs.splitAt(vs.length / 3)
      val merged = graft.llm.Cardinality.mergeFreqStates(Seq(
        graft.llm.Cardinality.freqState(b1.toDF("v"), Seq("v"), k),
        graft.llm.Cardinality.freqState(b2.toDF("v"), Seq("v"), k)))
      val got = merged.select(explode(col("items")).as("e"))
        .select(col("e.item"), col("e.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = vs.length.toLong / (k + 1)
      got.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t && est >= t - bound,
          s"$item: estimate $est outside [${t - bound}, $t]")
      }
      truth.filter(_._2 > bound).keys.foreach(item =>
        assert(got.contains(item), s"guaranteed-heavy $item missing"))
      assert(got.size <= k)
    }
  }

  test("dHash64 invariance laws: brightness scale/offset preserve every bit; " +
      "determinism; inversion flips gradient bits") {
    import graft.llm.Multimodal._
    val imgs: Gen[Decoded] = for {
      w <- Gen.chooseNum(9, 40)
      h <- Gen.chooseNum(8, 40)
      px <- Gen.listOfN(w * h * 3, Gen.chooseNum(0.05f, 0.95f))
    } yield Decoded(w, h, 3, px.toArray)
    samples(imgs, 25).foreach { img =>
      val base = dHash64(img)
      // positive affine transforms preserve gray-value ORDER, and dHash
      // is gradient-sign only -> every bit survives
      assert(dHash64(Decoded(img.width, img.height, 3, img.data.map(_ * 0.5f))) == base)
      assert(dHash64(Decoded(img.width, img.height, 3, img.data.map(v => v * 0.9f + 0.05f))) == base)
      assert(dHash64(img) == base, "determinism")
      // value inversion reverses every strict gray order -> gradient
      // bits flip wherever neighbors differ (ties stay 0: a>b is
      // strict, so inverted ties contribute 0 too — bits that were 1
      // MUST become 0)
      val inv = dHash64(Decoded(img.width, img.height, 3, img.data.map(1.0f - _)))
      assert((base & inv) == 0L, "a strict gradient cannot survive inversion")
    }
  }

  test("audioHash64 invariance laws: volume scale preserves every bit; " +
      "channel duplication (mono->stereo) preserves; determinism") {
    import graft.llm.Multimodal._
    val clips: Gen[Array[Float]] = for {
      n <- Gen.chooseNum(64, 2048)
      xs <- Gen.listOfN(n, Gen.chooseNum(-0.9f, 0.9f))
    } yield xs.toArray
    samples(clips, 25).foreach { mono =>
      val d = Decoded(mono.length, 1, 1, mono)
      val base = audioHash64(d)
      assert(audioHash64(Decoded(mono.length, 1, 1, mono.map(_ * 0.25f))) == base,
        "band energies scale by c^2 - difference signs must not move")
      val stereo = Decoded(mono.length, 1, 2, mono.flatMap(v => Seq(v, v)))
      assert(audioHash64(stereo) == base, "mono-mix of duplicated channels is identity")
      assert(audioHash64(d) == base, "determinism")
    }
  }

  test("fimTransform reassembly law holds on generated unicode soup " +
      "(astral pairs, combining marks — the codepoint-cut adversaries)") {
    import graft.llm.CorpusPrep
    val pre = "<|fim_prefix|>"; val suf = "<|fim_suffix|>"; val mid = "<|fim_middle|>"
    // surrogate pairs and combining sequences sit AT the md5-derived cut
    // positions for some seed — a UTF-16-unit slicer would shear them
    val soup: Gen[List[String]] = Gen.listOfN(40,
      Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf(
        "a", "Z", " ", "\n", "é", "é", "你",
        "😀", "👍🏽", "हि", "x",
        "")).map(_.mkString)))
    samples(soup, 4).foreach { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = CorpusPrep.fimTransform(df, "doc_id", "text", rate = 1.0)
        .collect()
      assert(out.length == ts.length)
      out.foreach { r =>
        val s = r.getAs[String]("fim_text")
        val orig = r.getAs[String]("text")
        assert(s.startsWith(pre), s)
        val sufAt = s.indexOf(suf); val midAt = s.indexOf(mid)
        assert(sufAt >= 0 && midAt > sufAt, s)
        val p = s.substring(pre.length, sufAt)
        val x = s.substring(sufAt + suf.length, midAt)
        val m = s.substring(midAt + mid.length)
        assert(p + m + x == orig,
          s"reassembly broke on ${orig.map(_.toInt).mkString(",")}")
        // no cut may shear a surrogate pair: every piece is well-formed
        Seq(p, m, x).foreach { piece =>
          assert(!piece.headOption.exists(Character.isLowSurrogate),
            s"piece starts mid-pair: ${piece.map(_.toInt).mkString(",")}")
          assert(!piece.lastOption.exists(Character.isHighSurrogate),
            s"piece ends mid-pair: ${piece.map(_.toInt).mkString(",")}")
        }
      }
    }
  }
}
