package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Loaded interpolated Kneser–Ney bigram model. The ARTIFACT is the
  * ordinary `LangModel.saveBigram` file of the UNPRUNED tables
  * (`KneserNeyLm` trains at minCount=1 by construction): every derived
  * statistic — context sums, forward/backward continuation counts, the
  * count-of-counts discount — is a pure function of the stored counts,
  * so the loader recomputes them once per (JVM, path) instead of
  * persisting a second format.
  *
  * Precomputation mirrors `LangModel.logProbPerDocKneserNey`'s operand
  * order exactly (same doubles in, same op sequence), so parity with
  * the composable form holds at the q97 oracle's 6-decimal rounding
  * (the per-doc average's accumulation order differs — the q82/q86
  * caveat class):
  *  - `pcont(w) = (nbwd(w) + 1) / (B + V + 1)` raw and log10 forms;
  *  - per stored pair: `log10((max(c−D,0) + (D·nfwd)·pcont(w2)) / ctx)`
  *    fully precomputed;
  *  - unseen pair in a seen context: `log10(((D·nfwd)·pcont(w2)) / ctx)`
  *    — one hash lookup + one log10 at score time;
  *  - unseen context and position 0: the `pcont` log10 table.
  */
final class KnLmTable(
    contLogp: java.util.HashMap[UTF8String, java.lang.Double],
    contRaw: java.util.HashMap[UTF8String, java.lang.Double],
    contOovLogp: Double,
    contRawOov: Double,
    contexts: java.util.HashMap[UTF8String, KnLmTable.Context]) {

  private def pcontRaw(tok: UTF8String): Double = {
    val v = contRaw.get(tok)
    if (v == null) contRawOov else v.doubleValue()
  }

  private def pcontLogp(tok: UTF8String): Double = {
    val v = contLogp.get(tok)
    if (v == null) contOovLogp else v.doubleValue()
  }

  def avgLogProb(text: UTF8String): java.lang.Double = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    var sum = 0.0
    var n = 0
    var prev: UTF8String = null
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        val tok = UTF8String.fromBytes(bytes, tokStart, i - tokStart)
        if (prev == null) sum += pcontLogp(tok)
        else {
          val ctx = contexts.get(prev)
          if (ctx == null) sum += pcontLogp(tok)
          else {
            val v = ctx.pairs.get(tok)
            if (v != null) sum += v.doubleValue()
            else sum += StrictMath.log10((ctx.a1 * pcontRaw(tok)) / ctx.ctxSum)
          }
        }
        n += 1
        prev = tok
        tokStart = -1
      }
      i += 1
    }
    if (n == 0) null else java.lang.Double.valueOf(sum / n)
  }
}

object KnLmTable {
  /** `a1 = D · nfwd(w1)`, `ctxSum = Σ_w2 c(w1, w2)` as a double. */
  final class Context(
      val pairs: java.util.HashMap[UTF8String, java.lang.Double],
      val a1: Double,
      val ctxSum: Double)
}

/** Executor-side KN cache: one load per (JVM, path) — the
  * [[Lm2Registry]] contract, over the same saveBigram artifact. */
object KnRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, KnLmTable]()

  def get(path: String): KnLmTable = cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): KnLmTable = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    require(lines.nonEmpty && lines(0).startsWith("#graft-bigram-lm v1 "),
      s"not a graft bigram LM file (KN scores the saveBigram artifact): $path")
    val header = lines(0).split(' ')
    def scalar(key: String): Long = header
      .collectFirst { case kv if kv.startsWith(key + "=") =>
        kv.substring(key.length + 1).toLong }
      .getOrElse(throw new IllegalArgumentException(
        s"bigram LM header missing $key= in: ${lines(0)}"))
    val vocab = scalar("vocab")
    val nPairs = scalar("pairs")
    // pass over the pair section: per-context sums + fan-out, per-word
    // continuation counts, count-of-counts for the discount
    val ctxSum = new java.util.HashMap[UTF8String, java.lang.Long]()
    val nfwd = new java.util.HashMap[UTF8String, java.lang.Integer]()
    val nbwd = new java.util.HashMap[UTF8String, java.lang.Integer]()
    val rawPairs =
      new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
    var n1 = 0L
    var n2 = 0L
    var pairCount = 0L
    var uniCount = 0L
    var inPairs = false
    var i = 1
    while (i < lines.length) {
      val line = lines(i)
      if (line == "#pairs") inPairs = true
      else if (line.nonEmpty && !inPairs) uniCount += 1
      else if (line.nonEmpty) {
        val t1 = line.indexOf('\t')
        val t2 = line.indexOf('\t', t1 + 1)
        require(t1 > 0 && t2 > t1,
          s"malformed pair line (need w1<TAB>w2<TAB>count): '$line'")
        val w1 = UTF8String.fromString(line.substring(0, t1))
        val w2 = UTF8String.fromString(line.substring(t1 + 1, t2))
        val cnt = line.substring(t2 + 1).toLong
        if (cnt == 1L) n1 += 1
        if (cnt == 2L) n2 += 1
        val prevSum = ctxSum.get(w1)
        ctxSum.put(w1,
          java.lang.Long.valueOf((if (prevSum == null) 0L else prevSum.longValue()) + cnt))
        val prevF = nfwd.get(w1)
        nfwd.put(w1,
          java.lang.Integer.valueOf((if (prevF == null) 0 else prevF.intValue()) + 1))
        val prevB = nbwd.get(w2)
        nbwd.put(w2,
          java.lang.Integer.valueOf((if (prevB == null) 0 else prevB.intValue()) + 1))
        var inner = rawPairs.get(w1)
        if (inner == null) { inner = new java.util.HashMap(); rawPairs.put(w1, inner); () }
        inner.put(w2, java.lang.Long.valueOf(cnt))
        pairCount += 1
      }
      i += 1
    }
    require(uniCount == vocab,
      s"bigram LM $path header says vocab=$vocab but has $uniCount unigram entries")
    require(pairCount == nPairs,
      s"bigram LM $path header says pairs=$nPairs but has $pairCount pair entries")
    // same clamped count-of-counts arithmetic as LangModel.trainKneserNey
    val d = if (n1 == 0) 0.5 else math.min(n1.toDouble / (n1 + 2.0 * n2), 1.0)
    val dc = (nPairs + vocab + 1).toDouble
    val contRaw = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, nbwd.size() * 2))
    val contLogp = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, nbwd.size() * 2))
    val bit = nbwd.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      val raw = (e.getValue.intValue().toLong + 1L).toDouble / dc
      contRaw.put(e.getKey, java.lang.Double.valueOf(raw))
      contLogp.put(e.getKey, java.lang.Double.valueOf(StrictMath.log10(raw)))
      ()
    }
    val contexts = new java.util.HashMap[UTF8String, KnLmTable.Context](
      math.max(16, rawPairs.size() * 2))
    val cit = rawPairs.entrySet().iterator()
    while (cit.hasNext) {
      val e = cit.next()
      val w1 = e.getKey
      val cs = ctxSum.get(w1).longValue().toDouble
      val a1 = d * nfwd.get(w1).intValue().toDouble
      val pairs = new java.util.HashMap[UTF8String, java.lang.Double](
        math.max(4, e.getValue.size() * 2))
      val pit = e.getValue.entrySet().iterator()
      while (pit.hasNext) {
        val pe = pit.next()
        val w2 = pe.getKey
        val c = pe.getValue.longValue().toDouble
        val raw = contRaw.get(w2).doubleValue() // stored pair ⇒ nbwd(w2) ≥ 1
        pairs.put(w2, java.lang.Double.valueOf(
          StrictMath.log10((math.max(c - d, 0.0) + a1 * raw) / cs)))
        ()
      }
      contexts.put(w1, new KnLmTable.Context(pairs, a1, cs))
      ()
    }
    new KnLmTable(contLogp, contRaw,
      StrictMath.log10(1.0 / dc), 1.0 / dc, contexts)
  }

  def score(path: String, text: UTF8String): java.lang.Double =
    get(path).avgLogProb(text)
}

/** `graft_kn_logprob(string, 'lm-path') -> double`: average log10
  * probability under interpolated Kneser–Ney smoothing over a saved
  * UNPRUNED bigram LM (`LangModel.saveBigram` of a
  * `trainKneserNey(...).bigram`) — the zero-shuffle scale form of
  * `LangModel.logProbPerDocKneserNey`; parity at the oracle's
  * 6-decimal rounding. Null input / no tokens → null. */
case class KnLogProb(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_kn_logprob needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kn_logprob expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kn_logprob"

  override protected def nullSafeEval(t: Any): Any =
    KnRegistry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.KnRegistry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
