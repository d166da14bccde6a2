package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Loaded bigram LM (the `LangModel.saveBigram` artifact). All
  * probabilities are PRECOMPUTED at load (`StrictMath.log10`, the
  * value codegen'd `LOG10` emits) so scoring is pure hash lookups:
  *  - position 0: the unigram table's `log10((cnt+1)/(N+V+1))`;
  *  - position i>0 with a stored pair: its exact
  *    `log10((cnt2+1)/(c1+V+1))`;
  *  - in-vocab context `w1` (even if all its bigrams were pruned),
  *    unseen pair: the per-context OOV `log10(1/(c1+V+1))`;
  *  - out-of-vocab context: the global `log10(1/(V+1))`.
  * The layout is a nested map `w1 -> (pairs of w1, context OOV)` — one
  * outer lookup per position serves both cases.
  *
  * Tokenization is the shared contract (lowercase, ASCII `\s` runs).
  * Accumulation is left-to-right; the composable form's union feeds a
  * hash aggregate whose float order differs, so parity with
  * `LangModel.logProbPerDocBigram` holds at the q82 oracle's
  * `round(..., 6)` — same as the oracle itself — not bit-for-bit
  * (unlike the unigram pair, whose single-branch accumulation order
  * coincides). */
final class BigramLmTable(
    uniLogp: java.util.HashMap[UTF8String, java.lang.Double],
    uniOov: Double,
    contexts: java.util.HashMap[UTF8String, BigramLmTable.Context],
    globalPairOov: Double) {

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
        if (prev == null) {
          val v = uniLogp.get(tok)
          sum += (if (v == null) uniOov else v.doubleValue())
        } else {
          val ctx = contexts.get(prev)
          if (ctx == null) sum += globalPairOov
          else {
            val v = ctx.pairs.get(tok)
            sum += (if (v == null) ctx.oov else v.doubleValue())
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

object BigramLmTable {
  final class Context(
      val pairs: java.util.HashMap[UTF8String, java.lang.Double],
      val oov: Double)
}

/** Executor-side bigram-LM cache: one load per (JVM, path) — the
  * [[LmRegistry]]/[[BpeRegistry]] contract. */
object Lm2Registry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, BigramLmTable]()

  def get(path: String): BigramLmTable =
    cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): BigramLmTable = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    require(lines.nonEmpty && lines(0).startsWith("#graft-bigram-lm v1 "),
      s"not a graft bigram LM file: $path")
    val header = lines(0).split(' ')
    def scalar(key: String): Long = header
      .collectFirst { case kv if kv.startsWith(key + "=") =>
        kv.substring(key.length + 1).toLong }
      .getOrElse(throw new IllegalArgumentException(
        s"bigram LM header missing $key= in: ${lines(0)}"))
    val total = scalar("total")
    val vocab = scalar("vocab")
    val nPairs = scalar("pairs")
    val uniDenom = (total + vocab + 1).toDouble
    val uniLogp = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, (vocab * 2).min(Int.MaxValue / 2).toInt))
    // unigram counts kept so each context's denominator (c1 + V + 1)
    // replays the EXACT composable arithmetic
    val uniCnt = new java.util.HashMap[UTF8String, java.lang.Long]()
    var i = 1
    var inPairs = false
    val contexts = new java.util.HashMap[UTF8String, BigramLmTable.Context]()
    // pass 1 collects raw pair counts per context; probabilities are
    // finalized after the file is read (they need c1)
    val rawPairs = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
    while (i < lines.length) {
      val line = lines(i)
      if (line == "#pairs") inPairs = true
      else if (line.nonEmpty && !inPairs) {
        val tab = line.indexOf('\t')
        require(tab > 0, s"malformed unigram line (need token<TAB>count): '$line'")
        val tok = UTF8String.fromString(line.substring(0, tab))
        val cnt = line.substring(tab + 1).toLong
        uniLogp.put(tok, java.lang.Double.valueOf(
          StrictMath.log10((cnt + 1).toDouble / uniDenom)))
        uniCnt.put(tok, java.lang.Long.valueOf(cnt))
        ()
      } else if (line.nonEmpty) {
        val t1 = line.indexOf('\t')
        val t2 = line.indexOf('\t', t1 + 1)
        require(t1 > 0 && t2 > t1, s"malformed pair line (need w1<TAB>w2<TAB>count): '$line'")
        val w1 = UTF8String.fromString(line.substring(0, t1))
        var inner = rawPairs.get(w1)
        if (inner == null) { inner = new java.util.HashMap(); rawPairs.put(w1, inner); () }
        inner.put(UTF8String.fromString(line.substring(t1 + 1, t2)),
          java.lang.Long.valueOf(line.substring(t2 + 1).toLong))
        ()
      }
      i += 1
    }
    require(uniLogp.size().toLong == vocab,
      s"bigram LM $path header says vocab=$vocab but has ${uniLogp.size()} unigram entries")
    // EVERY vocab word is a known context (denominator c1+V+1), whether
    // or not any of its bigrams survived minCount pruning — a pair-less
    // context must score its per-context OOV, not the global one
    val uit = uniCnt.entrySet().iterator()
    while (uit.hasNext) {
      val ue = uit.next()
      val denom = (ue.getValue.longValue() + vocab + 1).toDouble
      contexts.put(ue.getKey, new BigramLmTable.Context(
        new java.util.HashMap[UTF8String, java.lang.Double](4),
        StrictMath.log10(1.0 / denom)))
      ()
    }
    var pairCount = 0L
    // every stored context has a stored unigram count (a kept bigram's
    // c1 >= cnt2 >= minCount under the shared minCount) — enforced, not
    // assumed, because the file could have been edited
    val it = rawPairs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c1Boxed = uniCnt.get(e.getKey)
      require(c1Boxed != null,
        s"bigram LM $path has pairs for context '${e.getKey}' missing from the unigram section")
      val denom = (c1Boxed.longValue() + vocab + 1).toDouble
      val inner = contexts.get(e.getKey).pairs
      val pit = e.getValue.entrySet().iterator()
      while (pit.hasNext) {
        val pe = pit.next()
        inner.put(pe.getKey, java.lang.Double.valueOf(
          StrictMath.log10((pe.getValue.longValue() + 1).toDouble / denom)))
        pairCount += 1
      }
    }
    require(pairCount == nPairs,
      s"bigram LM $path header says pairs=$nPairs but has $pairCount pair entries")
    new BigramLmTable(uniLogp, StrictMath.log10(1.0 / uniDenom),
      contexts, StrictMath.log10(1.0 / (vocab + 1).toDouble))
  }

  def score(path: String, text: UTF8String): java.lang.Double =
    get(path).avgLogProb(text)
}

/** `graft_lm2_logprob(string, 'lm-path') -> double`: average log10
  * conditional probability under a saved bigram LM
  * (`LangModel.saveBigram`) — the zero-shuffle scale form of
  * `LangModel.logProbPerDocBigram`; parity at the oracle's 6-decimal
  * rounding. Null input / no tokens → null. */
case class Lm2LogProb(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_lm2_logprob needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lm2_logprob expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm2_logprob"

  override protected def nullSafeEval(t: Any): Any =
    Lm2Registry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.Lm2Registry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
