package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Loaded interpolated Kneser–Ney TRIGRAM model. The ARTIFACT is the
  * ordinary `LangModel.saveTrigram` file of the UNPRUNED tables
  * (`KneserNey3Lm` trains at minCount=1 by construction): every
  * derived statistic — top-level context sums/fan-outs, the
  * continuation-bigram table `cbg(a,b) = N1+(·ab)` with ITS
  * sums/fan-outs, the bottom continuation-unigram counts, and both
  * count-of-counts discounts — is a pure function of the stored
  * trigram counts, so the loader recomputes them once per (JVM, path)
  * instead of persisting a second format (the [[KnRegistry]] contract
  * one order up).
  *
  * Precomputation mirrors `LangModel.logProbPerDocKneserNey3`'s
  * operand order exactly, so parity with the composable form holds at
  * the shared oracle's 6-decimal rounding:
  *  - `p1(w) = (nbwd1(w) + 1) / (B′ + V + 1)` raw and log10 forms;
  *  - per stored continuation bigram: raw
  *    `p2(b|a) = (max(cbg−D2,0) + (D2·nfwd2(a))·p1(b)) / ctx2(a)`;
  *    unseen pair in a seen `a`: `((D2·nfwd2(a))·p1(b)) / ctx2(a)`;
  *    unseen `a`: `p1(b)`;
  *  - per stored triple: `log10((max(c−D3,0) + (D3·nfwd3)·p2) / ctx3)`
  *    fully precomputed; unseen triple in a seen (w1,w2):
  *    `log10(((D3·nfwd3)·p2) / ctx3)`; unseen context: `log10(p2)`.
  */
final class Kn3LmTable(
    cont1Raw: java.util.HashMap[UTF8String, java.lang.Double],
    cont1RawOov: Double,
    ctx2: java.util.HashMap[UTF8String, Kn3LmTable.Context2],
    ctx3: java.util.HashMap[UTF8String,
      java.util.HashMap[UTF8String, Kn3LmTable.Context3]]) {

  private def p1raw(tok: UTF8String): Double = {
    val v = cont1Raw.get(tok)
    if (v == null) cont1RawOov else v.doubleValue()
  }

  /** Raw middle-level probability p2cont(tok | prev). */
  private def p2raw(prev: UTF8String, tok: UTF8String): Double = {
    val c = ctx2.get(prev)
    if (c == null) p1raw(tok)
    else {
      val v = c.pairs.get(tok)
      if (v != null) v.doubleValue()
      else (c.a2 * p1raw(tok)) / c.ctxSum
    }
  }

  def avgLogProb(text: UTF8String): java.lang.Double = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    var sum = 0.0
    var n = 0
    var prev2: UTF8String = null // token i-2
    var prev1: UTF8String = null // token i-1
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        val tok = UTF8String.fromBytes(bytes, tokStart, i - tokStart)
        if (prev1 == null) sum += StrictMath.log10(p1raw(tok))
        else if (prev2 == null) sum += StrictMath.log10(p2raw(prev1, tok))
        else {
          val outer = ctx3.get(prev2)
          val ctx = if (outer == null) null else outer.get(prev1)
          if (ctx == null) sum += StrictMath.log10(p2raw(prev1, tok))
          else {
            val v = ctx.triples.get(tok)
            if (v != null) sum += v.doubleValue()
            else sum += StrictMath.log10(
              (ctx.a3 * p2raw(prev1, tok)) / ctx.ctxSum)
          }
        }
        n += 1
        prev2 = prev1
        prev1 = tok
        tokStart = -1
      }
      i += 1
    }
    if (n == 0) null else java.lang.Double.valueOf(sum / n)
  }
}

object Kn3LmTable {
  /** Middle level for context `a`: stored-pair raw p2cont values,
    * `a2 = D2 · nfwd2(a)`, `ctxSum = Σ_b cbg(a,b)` as a double. */
  final class Context2(
      val pairs: java.util.HashMap[UTF8String, java.lang.Double],
      val a2: Double,
      val ctxSum: Double)

  /** Top level for context (w1,w2): fully precomputed stored-triple
    * log-probs, `a3 = D3 · nfwd3`, `ctxSum = Σ_w c(w1,w2,w)`. */
  final class Context3(
      val triples: java.util.HashMap[UTF8String, java.lang.Double],
      val a3: Double,
      val ctxSum: Double)
}

/** Executor-side KN3 cache: one load per (JVM, path), over the same
  * saveTrigram artifact the stupid-backoff Lm3Registry scores. */
object Kn3Registry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Kn3LmTable]()

  def get(path: String): Kn3LmTable = cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): Kn3LmTable = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    require(lines.nonEmpty && lines(0).startsWith("#graft-trigram-lm v1 "),
      s"not a graft trigram LM file (KN3 scores the saveTrigram artifact): $path")
    val header = lines(0).split(' ')
    def scalar(key: String): Long = header
      .collectFirst { case kv if kv.startsWith(key + "=") =>
        kv.substring(key.length + 1).toLong }
      .getOrElse(throw new IllegalArgumentException(
        s"trigram LM header missing $key= in: ${lines(0)}"))
    val vocab = scalar("vocab")
    val nPairs = scalar("pairs")
    val nTriples = scalar("triples")
    // one pass over the triple section: top-level context sums and
    // fan-outs, the continuation-bigram counts, trigram count-of-counts
    val ctxSum3 = new java.util.HashMap[String, java.lang.Long]()
    val nfwd3 = new java.util.HashMap[String, java.lang.Integer]()
    val cbg = new java.util.HashMap[UTF8String,
      java.util.HashMap[UTF8String, java.lang.Integer]]()
    val rawTriples = new java.util.HashMap[String,
      java.util.HashMap[UTF8String, java.lang.Long]]()
    var n1t = 0L; var n2t = 0L
    var uniCount = 0L; var pairCount = 0L; var tripleCount = 0L
    var section = 0 // 0 = unigrams, 1 = pairs, 2 = triples
    var i = 1
    while (i < lines.length) {
      val line = lines(i)
      if (line == "#pairs") section = 1
      else if (line == "#triples") section = 2
      else if (line.nonEmpty && section == 0) uniCount += 1
      else if (line.nonEmpty && section == 1) pairCount += 1
      else if (line.nonEmpty) {
        val t1 = line.indexOf('\t')
        val t2 = line.indexOf('\t', t1 + 1)
        val t3 = line.indexOf('\t', t2 + 1)
        require(t1 > 0 && t2 > t1 && t3 > t2,
          s"malformed triple line (need w1<TAB>w2<TAB>w3<TAB>count): '$line'")
        val w1 = line.substring(0, t1)
        val w2 = line.substring(t1 + 1, t2)
        val w3 = UTF8String.fromString(line.substring(t2 + 1, t3))
        val cnt = line.substring(t3 + 1).toLong
        if (cnt == 1L) n1t += 1
        if (cnt == 2L) n2t += 1
        val ck = w1 + "\t" + w2
        val prevSum = ctxSum3.get(ck)
        ctxSum3.put(ck,
          java.lang.Long.valueOf((if (prevSum == null) 0L else prevSum.longValue()) + cnt))
        val prevF = nfwd3.get(ck)
        nfwd3.put(ck,
          java.lang.Integer.valueOf((if (prevF == null) 0 else prevF.intValue()) + 1))
        val w2u = UTF8String.fromString(w2)
        var binner = cbg.get(w2u)
        if (binner == null) { binner = new java.util.HashMap(); cbg.put(w2u, binner); () }
        val prevC = binner.get(w3)
        binner.put(w3,
          java.lang.Integer.valueOf((if (prevC == null) 0 else prevC.intValue()) + 1))
        var tinner = rawTriples.get(ck)
        if (tinner == null) { tinner = new java.util.HashMap(); rawTriples.put(ck, tinner); () }
        tinner.put(w3, java.lang.Long.valueOf(cnt))
        tripleCount += 1
      }
      i += 1
    }
    require(uniCount == vocab,
      s"trigram LM $path header says vocab=$vocab but has $uniCount unigram entries")
    require(pairCount == nPairs,
      s"trigram LM $path header says pairs=$nPairs but has $pairCount pair entries")
    require(tripleCount == nTriples,
      s"trigram LM $path header says triples=$nTriples but has $tripleCount triple entries")
    // derived statistics of the continuation-bigram table: per-context
    // sums/fan-outs, per-word backward counts, its count-of-counts
    // (for D2), and B' = |cbg| for the bottom-level denominator
    val nbwd1 = new java.util.HashMap[UTF8String, java.lang.Integer]()
    var bPrime = 0L
    var n1c = 0L; var n2c = 0L
    val cit0 = cbg.entrySet().iterator()
    while (cit0.hasNext) {
      val e = cit0.next()
      val pit = e.getValue.entrySet().iterator()
      while (pit.hasNext) {
        val pe = pit.next()
        val c = pe.getValue.intValue()
        if (c == 1) n1c += 1
        if (c == 2) n2c += 1
        bPrime += 1
        val prevB = nbwd1.get(pe.getKey)
        nbwd1.put(pe.getKey,
          java.lang.Integer.valueOf((if (prevB == null) 0 else prevB.intValue()) + 1))
        ()
      }
    }
    // same clamped count-of-counts arithmetic as LangModel.trainKneserNey3
    val d3 = if (n1t == 0) 0.5 else math.min(n1t.toDouble / (n1t + 2.0 * n2t), 1.0)
    val d2 = if (n1c == 0) 0.5 else math.min(n1c.toDouble / (n1c + 2.0 * n2c), 1.0)
    val denom1 = (bPrime + vocab + 1).toDouble
    val cont1Raw = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, nbwd1.size() * 2))
    val bit = nbwd1.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      cont1Raw.put(e.getKey, java.lang.Double.valueOf(
        (e.getValue.intValue().toLong + 1L).toDouble / denom1))
      ()
    }
    def p1rawOf(w: UTF8String): Double = {
      val v = cont1Raw.get(w)
      if (v == null) 1.0 / denom1 else v.doubleValue()
    }
    // middle level: raw p2cont per stored continuation bigram
    val ctx2 = new java.util.HashMap[UTF8String, Kn3LmTable.Context2](
      math.max(16, cbg.size() * 2))
    val cit = cbg.entrySet().iterator()
    while (cit.hasNext) {
      val e = cit.next()
      var cs = 0L
      val sit = e.getValue.values().iterator()
      while (sit.hasNext) cs += sit.next().intValue().toLong
      val csD = cs.toDouble
      val a2 = d2 * e.getValue.size().toDouble
      val pairs = new java.util.HashMap[UTF8String, java.lang.Double](
        math.max(4, e.getValue.size() * 2))
      val pit = e.getValue.entrySet().iterator()
      while (pit.hasNext) {
        val pe = pit.next()
        val c = pe.getValue.intValue().toDouble
        pairs.put(pe.getKey, java.lang.Double.valueOf(
          (math.max(c - d2, 0.0) + a2 * p1rawOf(pe.getKey)) / csD))
        ()
      }
      ctx2.put(e.getKey, new Kn3LmTable.Context2(pairs, a2, csD))
      ()
    }
    def p2rawOf(a: UTF8String, b: UTF8String): Double = {
      val c = ctx2.get(a)
      if (c == null) p1rawOf(b)
      else {
        val v = c.pairs.get(b)
        if (v != null) v.doubleValue() else (c.a2 * p1rawOf(b)) / c.ctxSum
      }
    }
    // top level: fully precomputed stored-triple log-probs, nested
    // (w1 → w2 → Context3) so score-time lookup needs no key concat
    val ctx3 = new java.util.HashMap[UTF8String,
      java.util.HashMap[UTF8String, Kn3LmTable.Context3]]()
    val tit = rawTriples.entrySet().iterator()
    while (tit.hasNext) {
      val e = tit.next()
      val ck = e.getKey
      val tab = ck.indexOf('\t')
      val w1 = UTF8String.fromString(ck.substring(0, tab))
      val w2 = UTF8String.fromString(ck.substring(tab + 1))
      val cs = ctxSum3.get(ck).longValue().toDouble
      val a3 = d3 * nfwd3.get(ck).intValue().toDouble
      val triples = new java.util.HashMap[UTF8String, java.lang.Double](
        math.max(4, e.getValue.size() * 2))
      val pit = e.getValue.entrySet().iterator()
      while (pit.hasNext) {
        val pe = pit.next()
        val c = pe.getValue.longValue().toDouble
        triples.put(pe.getKey, java.lang.Double.valueOf(StrictMath.log10(
          (math.max(c - d3, 0.0) + a3 * p2rawOf(w2, pe.getKey)) / cs)))
        ()
      }
      var outer = ctx3.get(w1)
      if (outer == null) { outer = new java.util.HashMap(); ctx3.put(w1, outer); () }
      outer.put(w2, new Kn3LmTable.Context3(triples, a3, cs))
      ()
    }
    new Kn3LmTable(cont1Raw, 1.0 / denom1, ctx2, ctx3)
  }

  def score(path: String, text: UTF8String): java.lang.Double =
    get(path).avgLogProb(text)
}

/** `graft_kn3_logprob(string, 'lm-path') -> double`: average log10
  * probability under interpolated Kneser–Ney trigram smoothing over a
  * saved UNPRUNED trigram LM (`LangModel.saveTrigram` of a
  * `trainKneserNey3(...).trigram`) — the zero-shuffle scale form of
  * `LangModel.logProbPerDocKneserNey3`; parity at the shared oracle's
  * 6-decimal rounding. Null input / no tokens → null. */
case class Kn3LogProb(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_kn3_logprob needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kn3_logprob expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kn3_logprob"

  override protected def nullSafeEval(t: Any): Any =
    Kn3Registry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.Kn3Registry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
