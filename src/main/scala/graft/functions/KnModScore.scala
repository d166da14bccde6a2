package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MODIFIED Kneser–Ney (Chen & Goodman 1999 §5 — KenLM's default and
  * the smoothing CCNet's 5-gram filters actually run): instead of one
  * absolute discount per level, THREE — `D1` for singleton grams, `D2`
  * for doubletons, `D3` for counts ≥ 3 — each estimated from that
  * level's count-of-counts (`Y = n1/(n1+2n2)`, `D1 = 1−2Y·n2/n1`,
  * `D2 = 2−3Y·n3/n2`, `D3 = 3−4Y·n4/n3`), capped at 1/2/3 so
  * `c − D(c) ≥ 0` always, and the per-context discounted mass is
  * EXACTLY `D1·N1 + D2·N2 + D3·N3+` (`Nk` = extensions of that
  * context with count k) — which keeps every level a PROPER
  * distribution, the same Σp=1 invariant the single-discount family
  * proves. Degenerate count-of-counts (`nk = 0`) AND non-positive
  * estimates both fall back to the range midpoint (0.5 / 1.0 / 1.5),
  * keeping every discount strictly positive — deterministic and
  * replayed verbatim by the SQL oracle.
  *
  * Shares [[KnNRegistry.buildCounts]] (same saveNgram artifact, same
  * continuation-count recursion); only the per-level derivation
  * differs. Shared by [[KnModRegistry]] (exact tables) and
  * [[KnModPackedRegistry]] (flat fingerprint/float32 — which reuses
  * [[KnNPackedTable]] unchanged, because modified KN's per-gram
  * numerator `c − D(c)` and per-context discount mass are still ONE
  * value each once precomputed). */
object KnMod {

  /** The Chen–Goodman discounts for one level's count table, with a
    * STRICTLY-POSITIVE fallback rule: a degenerate count-of-counts
    * (`nk = 0`) or a non-positive estimate falls back to the range
    * midpoint (0.5 / 1.0 / 1.5). A discount clamped to 0 would reserve
    * ZERO mass for contexts whose extensions all sit in that bucket —
    * probability 0 for unseen continuations, −∞ log scores, and a
    * Spark/native divergence (Spark's log10(0) is NULL and silently
    * drops the position; found the hard way on a 200-doc table whose
    * level-2 D2/D3 estimates went negative). Positive discounts keep
    * every level fully supported; the upper clamps (1/2/3) keep every
    * numerator non-negative. */
  private[functions] def discountsOf(
      lvl: java.util.HashMap[String, java.lang.Long]): (Double, Double, Double) = {
    var n1 = 0L; var n2 = 0L; var n3 = 0L; var n4 = 0L
    val it = lvl.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      if (c == 1L) n1 += 1
      else if (c == 2L) n2 += 1
      else if (c == 3L) n3 += 1
      else if (c == 4L) n4 += 1
    }
    val y = if (n1 == 0) 0.5 else n1.toDouble / (n1 + 2.0 * n2)
    val d1 = if (n1 == 0) 0.5 else {
      val est = 1.0 - 2.0 * y * n2 / n1
      if (est <= 0) 0.5 else math.min(est, 1.0)
    }
    val d2 = if (n2 == 0) 1.0 else {
      val est = 2.0 - 3.0 * y * n3 / n2
      if (est <= 0) 1.0 else math.min(est, 2.0)
    }
    val d3 = if (n3 == 0) 1.5 else {
      val est = 3.0 - 4.0 * y * n4 / n3
      if (est <= 0) 1.5 else math.min(est, 3.0)
    }
    (d1, d2, d3)
  }

  /** The discount a count pays: D1 / D2 / D3 by count bucket. */
  private[functions] def dOf(c: Long, d: (Double, Double, Double)): Double =
    if (c == 1L) d._1 else if (c == 2L) d._2 else d._3
}

/** Loaded modified-KN order-n model over exact string-keyed tables —
  * [[KnNLmTable]] with the three-discount selection: seen level-j
  * context → `p_j = (c − D_j(c) + a_j·p_{j−1}) / ctx_j` with
  * `a_j = D1·N1 + D2·N2 + D3·N3+` precomputed per context, unseen →
  * `p_{j−1}` unchanged; `p_1` is the same
  * Laplace-over-continuation-counts floor. */
final class KnModLmTable(
    val order: Int,
    p1: java.util.HashMap[String, java.lang.Double],
    p1Oov: Double,
    cnts: Array[java.util.HashMap[String, java.lang.Long]],
    // context key -> [a_j (discount mass), ctx_j (denominator)]
    ctxs: Array[java.util.HashMap[String, Array[Double]]],
    discounts: Array[(Double, Double, Double)]) {

  private def p1Of(tok: String): Double = {
    val v = p1.get(tok)
    if (v == null) p1Oov else v.doubleValue()
  }

  def avgLogProb(text: UTF8String): java.lang.Double = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val n = order
    val ring = new Array[String](n)
    var count = 0
    var sum = 0.0
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        val tok = new String(bytes, tokStart, i - tokStart,
          java.nio.charset.StandardCharsets.UTF_8)
        ring(count % n) = tok
        count += 1
        val m = if (count < n) count else n
        var p = p1Of(tok)
        if (m >= 2) {
          val offs = new Array[Int](m - 1)
          val sb = new java.lang.StringBuilder()
          var x = m - 1
          while (x >= 1) {
            offs(m - 1 - x) = sb.length()
            sb.append(ring((count - 1 - x) % n))
            if (x > 1) sb.append('\t')
            x -= 1
          }
          val fullCtx = sb.toString
          var j = 2
          while (j <= m) {
            val ctxKey = fullCtx.substring(offs(m - j))
            val ctx = ctxs(j - 2).get(ctxKey)
            if (ctx != null) {
              val c = cnts(j - 2).get(ctxKey + "\t" + tok)
              val num =
                if (c == null) 0.0
                else c.longValue().toDouble - KnMod.dOf(c.longValue(), discounts(j - 2))
              p = (num + ctx(0) * p) / ctx(1)
            }
            j += 1
          }
        }
        sum += StrictMath.log10(p)
        tokStart = -1
      }
      i += 1
    }
    if (count == 0) null else java.lang.Double.valueOf(sum / count)
  }
}

/** Executor-side modified-KN cache over the plain saveNgram artifact:
  * the count chain parses once ([[KnNRegistry.buildCounts]]), then the
  * three-discount derivation replaces the single-discount one. */
object KnModRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, KnModLmTable]()

  def get(path: String): KnModLmTable = cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  /** The modified-KN derivation over the raw chain — shared by the
    * exact and packed loaders: per-level (D1, D2, D3), per-context
    * [discount mass a, denominator ctx], and the continuation-unigram
    * floor (identical to interpolated KN's — the bottom level has no
    * discounts). */
  private[functions] def derive(path: String): (Int,
      Array[java.util.HashMap[String, java.lang.Long]],
      Array[(Double, Double, Double)],
      Array[java.util.HashMap[String, Array[Double]]],
      java.util.HashMap[String, java.lang.Double], Double) = {
    val (order, vocab, cnts) = KnNRegistry.buildCounts(path)
    val discounts = new Array[(Double, Double, Double)](order - 1)
    val ctxs = new Array[java.util.HashMap[String, Array[Double]]](order - 1)
    var j = 2
    while (j <= order) {
      val lvl = cnts(j - 2)
      val d = KnMod.discountsOf(lvl)
      discounts(j - 2) = d
      // accumulate integer bucket counts first, THEN combine as
      // d1·N1 + d2·N2 + d3·N3 — the exact operand order of the
      // composable aggregate and the SQL oracle (summing per-gram
      // discounts one at a time lands a different last-ulp and breaks
      // round(6) parity — found the hard way)
      val sums = new java.util.HashMap[String, Array[Double]]()
      val eit = lvl.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val key = e.getKey
        val ctxKey = key.substring(0, key.lastIndexOf('\t'))
        var agg = sums.get(ctxKey)
        if (agg == null) { agg = Array(0.0, 0.0, 0.0, 0.0); sums.put(ctxKey, agg); () }
        val c = e.getValue.longValue()
        if (c == 1L) agg(0) += 1.0
        else if (c == 2L) agg(1) += 1.0
        else agg(2) += 1.0
        agg(3) += c.toDouble
      }
      val sit = sums.entrySet().iterator()
      val packed = new java.util.HashMap[String, Array[Double]](
        math.max(16, sums.size() * 2))
      while (sit.hasNext) {
        val e = sit.next()
        val a = e.getValue
        packed.put(e.getKey,
          Array(d._1 * a(0) + d._2 * a(1) + d._3 * a(2), a(3)))
        ()
      }
      ctxs(j - 2) = packed
      j += 1
    }
    val nbwd1 = new java.util.HashMap[String, java.lang.Long]()
    val bit = cnts(0).keySet().iterator()
    while (bit.hasNext) {
      val key = bit.next()
      nbwd1.merge(key.substring(key.indexOf('\t') + 1), java.lang.Long.valueOf(1L),
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
      ()
    }
    val denom1 = (cnts(0).size().toLong + vocab + 1).toDouble
    val p1 = new java.util.HashMap[String, java.lang.Double](
      math.max(16, nbwd1.size() * 2))
    val nit = nbwd1.entrySet().iterator()
    while (nit.hasNext) {
      val e = nit.next()
      p1.put(e.getKey, java.lang.Double.valueOf(
        (e.getValue.longValue() + 1L).toDouble / denom1))
      ()
    }
    (order, cnts, discounts, ctxs, p1, 1.0 / denom1)
  }

  private def load(path: String): KnModLmTable = {
    val (order, cnts, discounts, ctxs, p1, p1Oov) = derive(path)
    System.err.println(s"[graft] modified-KN-$order LM $path loaded: " +
      (2 to order).map(x => s"o$x=${cnts(x - 2).size()}").mkString(" ") +
      s" p1=${p1.size()} " +
      (2 to order).map { x =>
        val (d1, d2, d3) = discounts(x - 2)
        f"D$x=($d1%.4f,$d2%.4f,$d3%.4f)"
      }.mkString(" "))
    new KnModLmTable(order, p1, p1Oov, cnts, ctxs, discounts)
  }

  def score(path: String, text: UTF8String): java.lang.Double =
    get(path).avgLogProb(text)
}

/** Packed modified-KN: same flat fingerprint/float32 layout — and the
  * same [[KnNPackedTable]] CLASS — as packed interpolated KN, because
  * once `c − D(c)` is precomputed per gram and the discount mass per
  * context, the scoring recursion no longer knows how many discounts
  * the smoothing had. Only the loader differs. */
object KnModPackedRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, KnNPackedTable]()

  def get(path: String): KnNPackedTable = cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def fpOfKey(key: String): Long = {
    val parts = key.split('\t')
    NgramFingerprint.ofGram(parts, 0, parts.length)
  }

  private def load(path: String): KnNPackedTable = {
    val (order, cnts, discounts, ctxsEx, p1Ex, p1Oov) = KnModRegistry.derive(path)
    val grams = new Array[LongFloatMap](order - 1)
    val ctxs = new Array[LongFloat2Map](order - 1)
    var j = 2
    while (j <= order) {
      val d = discounts(j - 2)
      val lvl = cnts(j - 2)
      val g = new LongFloatMap(lvl.size())
      val git = lvl.entrySet().iterator()
      while (git.hasNext) {
        val e = git.next()
        val c = e.getValue.longValue()
        g.put(fpOfKey(e.getKey), (c.toDouble - KnMod.dOf(c, d)).toFloat)
      }
      grams(j - 2) = g
      val cx = ctxsEx(j - 2)
      val pair = new LongFloat2Map(cx.size())
      val cit = cx.entrySet().iterator()
      while (cit.hasNext) {
        val e = cit.next()
        pair.put(fpOfKey(e.getKey),
          e.getValue()(0).toFloat, e.getValue()(1).toFloat)
      }
      ctxs(j - 2) = pair
      j += 1
    }
    val p1 = new LongFloatMap(p1Ex.size())
    val pit = p1Ex.entrySet().iterator()
    while (pit.hasNext) {
      val e = pit.next()
      p1.put(NgramFingerprint.ofString(e.getKey), e.getValue.doubleValue().toFloat)
    }
    val bytes = (p1.capacity.toLong + grams.map(_.capacity.toLong).sum) * 12 +
      ctxs.map(_.capacity.toLong).sum * 16
    System.err.println(s"[graft] packed modified-KN-$order LM $path: " +
      (2 to order).map(x => s"o$x=${grams(x - 2).size}+ctx${ctxs(x - 2).size}")
        .mkString(" ") +
      f" p1=${p1.size} resident=${bytes / 1024.0 / 1024.0}%.1f MB " +
      "(flat fp64->f32 tables)")
    new KnNPackedTable(order, p1, p1Oov, grams, ctxs)
  }

  def score(path: String, text: UTF8String): java.lang.Double =
    get(path).avgLogProb(text)
}

/** `graft_knmod_logprob(string, 'lm-path') -> double`: average log10
  * probability under MODIFIED Kneser–Ney (three discounts per level —
  * the KenLM default) over a saved UNPRUNED order-n LM — the
  * zero-shuffle scale form of `LangModel.logProbPerDocKneserNeyNMod`;
  * parity at the shared oracle's rounding. Null / no tokens → null. */
case class KnModLogProb(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_knmod_logprob needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_knmod_logprob expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_knmod_logprob"

  override protected def nullSafeEval(t: Any): Any =
    KnModRegistry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.KnModRegistry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_knmod_logprob_packed(string, 'lm-path') -> double`: modified
  * KN through the flat fingerprint/float32 registry — the q116
  * quantization contract. Null / no tokens → null. */
case class KnModLogProbPacked(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_knmod_logprob_packed needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_knmod_logprob_packed expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_knmod_logprob_packed"

  override protected def nullSafeEval(t: Any): Any =
    KnModPackedRegistry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.KnModPackedRegistry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
