package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PACKED interpolated Kneser–Ney order-n model — [[KnNRegistry]]'s
  * exact string-keyed tables re-laid into the stupid-backoff
  * registry's KenLM-style memory shape ([[LongFloatMap]]: flat
  * open-addressing 64-bit-FNV-fingerprint → float32 arrays, 12 bytes
  * of array per slot, no per-entry objects):
  *
  *  - level-j grams store the PRE-DISCOUNTED numerator
  *    `max(c_j − D_j, 0)` (the only per-gram quantity the recursion
  *    reads, so the discount subtraction leaves the hot loop);
  *  - level-j contexts store `D_j·nfwd_j` and `ctx_j` as ONE paired
  *    entry ([[LongFloat2Map]]): a single probe sequence per level per
  *    position answers presence (the exact-string registry's
  *    `ctx != null` test) and yields both values;
  *  - the unigram floor stores `p1cont(w)` per continuing token with
  *    the shared OOV fallback.
  *
  * The budget this buys: ~36 bytes per context + ~12 per gram at the
  * load ceiling versus a `HashMap[String,·]`'s ~100+ bytes per entry
  * with live key strings — the difference between an order-5 table
  * fitting an executor or not. The costs, both documented and both
  * the trade KenLM itself makes: (a) float32 quantization, visible at
  * round(6) but not at the gate's round(5) — same contract as the
  * stupid-backoff pair q93/q94; (b) a 64-bit fingerprint collision
  * budget — two colliding grams share one stored value, never an
  * error. Scoring arithmetic is term-for-term
  * [[KnNLmTable.avgLogProb]] with values widened to double. */
final class KnNPackedTable(
    val order: Int,
    p1: LongFloatMap,
    p1Oov: Double,
    grams: Array[LongFloatMap], // level j at j-2: fp(gram) -> max(c-D,0)
    ctxs: Array[LongFloat2Map]) { // fp(ctx) -> (D_j * nfwd_j, ctx_j)

  def avgLogProb(text: UTF8String): java.lang.Double = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val n = order
    // ring of the last n tokens as (start, end) offsets into bytes
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var count = 0
    var sum = 0.0
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        val slot = count % n
        starts(slot) = tokStart
        ends(slot) = i
        count += 1
        val m = if (count < n) count else n
        val u = p1.getOrNaN(NgramFingerprint.absorb(
          NgramFingerprint.Offset, bytes, tokStart, i - tokStart))
        var p: Double = if (java.lang.Float.isNaN(u)) p1Oov else u.toDouble
        var j = 2
        while (j <= m) {
          // fp of the level-j context = the last j-1 tokens oldest-first
          var h = NgramFingerprint.Offset
          var x = j - 1
          while (x >= 1) {
            val s = (count - 1 - x) % n
            if (x < j - 1) h = NgramFingerprint.absorbSep(h)
            h = NgramFingerprint.absorb(h, bytes, starts(s), ends(s) - starts(s))
            x -= 1
          }
          val slot = ctxs(j - 2).slot(h)
          if (slot >= 0) {
            val cD = grams(j - 2).getOrNaN(NgramFingerprint.absorb(
              NgramFingerprint.absorbSep(h), bytes, tokStart, i - tokStart))
            val num = if (java.lang.Float.isNaN(cD)) 0.0 else cD.toDouble
            p = (num + ctxs(j - 2).a(slot).toDouble * p) /
              ctxs(j - 2).b(slot).toDouble
          }
          j += 1
        }
        sum += StrictMath.log10(p)
        tokStart = -1
      }
      i += 1
    }
    if (count == 0) null else java.lang.Double.valueOf(sum / count)
  }
}

/** Executor-side packed order-n KN cache: one load per (JVM, path),
  * same saveNgram artifact as [[KnNRegistry]] — the chain builds once
  * in exact string tables, packs into fingerprint maps, and the
  * strings are discarded before the table goes live. */
object KnNPackedRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, KnNPackedTable]()

  def get(path: String): KnNPackedTable = cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def fpOfKey(key: String): Long = {
    val parts = key.split('\t')
    NgramFingerprint.ofGram(parts, 0, parts.length)
  }

  private def load(path: String): KnNPackedTable = {
    val ch = KnNRegistry.buildChain(path)
    val n = ch.order
    val grams = new Array[LongFloatMap](n - 1)
    val ctxs = new Array[LongFloat2Map](n - 1)
    var j = 2
    while (j <= n) {
      val d = ch.discounts(j - 2)
      val lvl = ch.cnts(j - 2)
      val g = new LongFloatMap(lvl.size())
      val git = lvl.entrySet().iterator()
      while (git.hasNext) {
        val e = git.next()
        g.put(fpOfKey(e.getKey),
          math.max(e.getValue.longValue().toDouble - d, 0.0).toFloat)
      }
      grams(j - 2) = g
      val cx = ch.ctxs(j - 2)
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
    val p1 = new LongFloatMap(ch.p1.size())
    val pit = ch.p1.entrySet().iterator()
    while (pit.hasNext) {
      val e = pit.next()
      p1.put(NgramFingerprint.ofString(e.getKey), e.getValue.doubleValue().toFloat)
    }
    // the size report that decides whether an order-5 model ships
    val bytes = (p1.capacity.toLong + grams.map(_.capacity.toLong).sum) * 12 +
      ctxs.map(_.capacity.toLong).sum * 16
    System.err.println(s"[graft] packed KN-$n LM $path: " +
      (2 to n).map(x => s"o$x=${grams(x - 2).size}+ctx${ctxs(x - 2).size}")
        .mkString(" ") +
      f" p1=${p1.size} resident=${bytes / 1024.0 / 1024.0}%.1f MB " +
      "(flat fp64->f32 tables)")
    new KnNPackedTable(n, p1, ch.p1Oov, grams, ctxs)
  }

  def score(path: String, text: UTF8String): java.lang.Double =
    get(path).avgLogProb(text)
}

/** `graft_knn_logprob_packed(string, 'lm-path') -> double`: average
  * log10 interpolated Kneser–Ney order-n probability over the packed
  * fingerprint/float32 registry — same saveNgram artifact and same
  * recursion as `graft_knn_logprob`, parity at round(5) (quantized
  * values — the q93/q94 contract). Null input / no tokens → null. */
case class KnNLogProbPacked(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_knn_logprob_packed needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_knn_logprob_packed expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_knn_logprob_packed"

  override protected def nullSafeEval(t: Any): Any =
    KnNPackedRegistry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.KnNPackedRegistry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
