package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Loaded trigram stupid-backoff LM (the `LangModel.saveTrigram`
  * artifact; Brants et al. 2007, "Large Language Models in Machine
  * Translation"). Per-position score, matching
  * `LangModel.logProbPerDocTrigram` term for term:
  *  - position 0: unigram Laplace `log10((c1+1)/(N+V+1))`
  *    (OOV → `log10(1/(N+V+1))`);
  *  - position 1, stored pair (w1,w2): `log10(cnt2/c1(w1))`;
  *    else backoff `log10(0.4) + unigram Laplace(w2)`;
  *  - position i≥2, stored triple: `log10(cnt3/cnt2(w1,w2))`;
  *    stored backoff pair (w2,w3): `log10(0.4) + log10(cnt2/c1(w2))`;
  *    else `2·log10(0.4) + unigram Laplace(w3)`.
  * Stupid backoff ALWAYS backs off on a miss (no per-context OOV — the
  * structural fix-by-design for the r5 pair-less-context bug class in
  * the bigram scorer). All ratios are precomputed at load with
  * `StrictMath.log10` (the value codegen'd LOG10 emits); the backoff
  * constant is ADDED, mirroring the composable form's
  * `log10(0.4) + log10(ratio)` spelling, so the three forms share one
  * arithmetic shape and parity holds at the oracle's `round(6)`.
  *
  * Pairs key as `"w1 w2"` — tokens are `\s`-run-split, so a space
  * separator is unambiguous. The scoring loop builds each pair key
  * once and reuses it as the next position's trigram context key.
  */
final class TrigramLmTable(
    uniLogp: java.util.HashMap[UTF8String, java.lang.Double],
    uniOov: Double,
    pairLogp: java.util.HashMap[UTF8String, java.lang.Double],
    triples: java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Double]]) {

  private[this] val log04 = StrictMath.log10(0.4)

  private def uni(tok: UTF8String): Double = {
    val v = uniLogp.get(tok)
    if (v == null) uniOov else v.doubleValue()
  }

  def avgLogProb(text: UTF8String): java.lang.Double = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    var sum = 0.0
    var n = 0
    var prev: UTF8String = null       // previous token
    var prevPairKey: UTF8String = null // "prev2 prev" — trigram context
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        val tok = UTF8String.fromBytes(bytes, tokStart, i - tokStart)
        if (prev == null) {
          sum += uni(tok)
          prev = tok
        } else {
          val pairKey = UTF8String.concat(prev, TrigramLmTable.Sep, tok)
          if (prevPairKey == null) {
            // position 1: bigram level with one backoff step
            val p = pairLogp.get(pairKey)
            sum += (if (p != null) p.doubleValue() else log04 + uni(tok))
          } else {
            val ctx = triples.get(prevPairKey)
            val t = if (ctx == null) null else ctx.get(tok)
            if (t != null) sum += t.doubleValue()
            else {
              val p = pairLogp.get(pairKey)
              sum += (if (p != null) log04 + p.doubleValue()
                      else 2 * log04 + uni(tok))
            }
          }
          prevPairKey = pairKey
          prev = tok
        }
        n += 1
        tokStart = -1
      }
      i += 1
    }
    if (n == 0) null else java.lang.Double.valueOf(sum / n)
  }
}

object TrigramLmTable {
  private[functions] val Sep = UTF8String.fromString(" ")
}

/** Executor-side trigram-LM cache: one load per (JVM, path) — the
  * [[LmRegistry]]/[[Lm2Registry]] contract. */
object Lm3Registry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, TrigramLmTable]()

  def get(path: String): TrigramLmTable =
    cache.computeIfAbsent(path, load(_))

  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): TrigramLmTable = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    require(lines.nonEmpty && lines(0).startsWith("#graft-trigram-lm v1 "),
      s"not a graft trigram LM file: $path")
    val header = lines(0).split(' ')
    def scalar(key: String): Long = header
      .collectFirst { case kv if kv.startsWith(key + "=") =>
        kv.substring(key.length + 1).toLong }
      .getOrElse(throw new IllegalArgumentException(
        s"trigram LM header missing $key= in: ${lines(0)}"))
    val total = scalar("total")
    val vocab = scalar("vocab")
    val nPairs = scalar("pairs")
    val nTriples = scalar("triples")
    val uniDenom = (total + vocab + 1).toDouble
    val uniLogp = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, (vocab * 2).min(Int.MaxValue / 2).toInt))
    val uniCnt = new java.util.HashMap[UTF8String, java.lang.Long]()
    val pairLogp = new java.util.HashMap[UTF8String, java.lang.Double]()
    val pairCnt = new java.util.HashMap[UTF8String, java.lang.Long]()
    val triples =
      new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Double]]()
    var section = 0 // 0 = unigrams, 1 = pairs, 2 = triples
    var pairsSeen = 0L
    var triplesSeen = 0L
    var i = 1
    while (i < lines.length) {
      val line = lines(i)
      if (line == "#pairs") section = 1
      else if (line == "#triples") section = 2
      else if (line.nonEmpty && section == 0) {
        val tab = line.indexOf('\t')
        require(tab > 0, s"malformed unigram line (need token<TAB>count): '$line'")
        val tok = UTF8String.fromString(line.substring(0, tab))
        val cnt = line.substring(tab + 1).toLong
        uniLogp.put(tok, java.lang.Double.valueOf(
          StrictMath.log10((cnt + 1).toDouble / uniDenom)))
        uniCnt.put(tok, java.lang.Long.valueOf(cnt))
        ()
      } else if (line.nonEmpty && section == 1) {
        val t1 = line.indexOf('\t')
        val t2 = line.indexOf('\t', t1 + 1)
        require(t1 > 0 && t2 > t1, s"malformed pair line (need w1<TAB>w2<TAB>count): '$line'")
        val w1 = line.substring(0, t1)
        val w2 = line.substring(t1 + 1, t2)
        val cnt2 = line.substring(t2 + 1).toLong
        val c1 = uniCnt.get(UTF8String.fromString(w1))
        // a kept pair's context survives the shared minCount
        // (c1 >= cnt2 >= minCount) — enforced, the file could be edited
        require(c1 != null,
          s"trigram LM $path pair context '$w1' missing from the unigram section")
        val key = UTF8String.fromString(w1 + " " + w2)
        pairLogp.put(key, java.lang.Double.valueOf(
          StrictMath.log10(cnt2.toDouble / c1.longValue())))
        pairCnt.put(key, java.lang.Long.valueOf(cnt2))
        pairsSeen += 1
      } else if (line.nonEmpty) {
        val t1 = line.indexOf('\t')
        val t2 = line.indexOf('\t', t1 + 1)
        val t3 = line.indexOf('\t', t2 + 1)
        require(t1 > 0 && t2 > t1 && t3 > t2,
          s"malformed triple line (need w1<TAB>w2<TAB>w3<TAB>count): '$line'")
        val w1 = line.substring(0, t1)
        val w2 = line.substring(t1 + 1, t2)
        val w3 = UTF8String.fromString(line.substring(t2 + 1, t3))
        val cnt3 = line.substring(t3 + 1).toLong
        val key = UTF8String.fromString(w1 + " " + w2)
        val c2 = pairCnt.get(key)
        // same invariant one level up: cnt2(w1,w2) >= cnt3 >= minCount
        require(c2 != null,
          s"trigram LM $path triple context '$w1 $w2' missing from the pairs section")
        var inner = triples.get(key)
        if (inner == null) {
          inner = new java.util.HashMap[UTF8String, java.lang.Double](4)
          triples.put(key, inner)
          ()
        }
        inner.put(w3, java.lang.Double.valueOf(
          StrictMath.log10(cnt3.toDouble / c2.longValue())))
        triplesSeen += 1
      }
      i += 1
    }
    require(uniLogp.size().toLong == vocab,
      s"trigram LM $path header says vocab=$vocab but has ${uniLogp.size()} unigram entries")
    require(pairsSeen == nPairs,
      s"trigram LM $path header says pairs=$nPairs but has $pairsSeen pair entries")
    require(triplesSeen == nTriples,
      s"trigram LM $path header says triples=$nTriples but has $triplesSeen triple entries")
    new TrigramLmTable(uniLogp, StrictMath.log10(1.0 / uniDenom), pairLogp, triples)
  }

  def score(path: String, text: UTF8String): java.lang.Double =
    Lm3Registry.get(path).avgLogProb(text)
}

/** `graft_lm3_logprob(string, 'lm-path') -> double`: average log10
  * stupid-backoff trigram probability under a saved trigram LM
  * (`LangModel.saveTrigram`) — the zero-shuffle scale form of
  * `LangModel.logProbPerDocTrigram`; parity at the oracle's 6-decimal
  * rounding. Null input / no tokens → null. */
case class Lm3LogProb(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_lm3_logprob needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lm3_logprob expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm3_logprob"

  override protected def nullSafeEval(t: Any): Any =
    Lm3Registry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.Lm3Registry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
