package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Loaded unigram LM (the `LangModel.save` artifact): token → log10
  * probability, precomputed at load so scoring is a hash lookup per
  * token. Keys are [[UTF8String]] so the scan never converts token
  * bytes to java Strings.
  *
  * Scoring contract (must stay bit-identical to
  * `LangModel.logProbPerDoc`, the composable form — one shared oracle
  * pins both): lowercase the text (`UTF8String.toLowerCase`, the
  * `lower()` Spark applies), split on ASCII `\s` runs (the
  * SimHashImpl tokenizer contract = `split(..., "\\s+")`), accumulate
  * `log10((cnt+1)/D)` per token LEFT TO RIGHT (the order a hash
  * aggregate over explode output accumulates in), divide by the token
  * count. No tokens → null. The per-token values are precomputed with
  * `StrictMath.log10` — what Spark's `LOG10` emits under whole-stage
  * codegen (the interpreted path calls `Math.log10`, which differs by
  * 1 ulp on some inputs; gate plans are codegen'd).
  */
final class UnigramLmTable(
    logp: java.util.HashMap[UTF8String, java.lang.Double],
    oovLogProb: Double) {

  def avgLogProb(text: UTF8String): java.lang.Double = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    var sum = 0.0
    var n = 0
    var tokStart = -1
    var i = 0
    while (i <= len) {
      val isSpace = i == len || SimHashImpl.isRegexSpaceByte(bytes(i))
      if (!isSpace && tokStart < 0) tokStart = i
      else if (isSpace && tokStart >= 0) {
        val v = logp.get(UTF8String.fromBytes(bytes, tokStart, i - tokStart))
        sum += (if (v == null) oovLogProb else v.doubleValue())
        n += 1
        tokStart = -1
      }
      i += 1
    }
    if (n == 0) null else java.lang.Double.valueOf(sum / n)
  }
}

/** Executor-side LM cache: one load per (JVM, path) — the expression
  * tree ships only the path string, the table loads from shared
  * storage on first use (the [[BpeRegistry]] contract). */
object LmRegistry {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, UnigramLmTable]()

  def get(path: String): UnigramLmTable =
    cache.computeIfAbsent(path, load(_))

  /** Drop a cached table (after rewriting the file — `LangModel.save`
    * calls this on the writing JVM). */
  private[graft] def invalidate(path: String): Unit = { cache.remove(path); () }

  private def load(path: String): UnigramLmTable = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    require(lines.nonEmpty && lines(0).startsWith("#graft-unigram-lm v1 "),
      s"not a graft unigram LM file: $path")
    val header = lines(0).split(' ')
    def scalar(key: String): Long = header
      .collectFirst { case kv if kv.startsWith(key + "=") =>
        kv.substring(key.length + 1).toLong }
      .getOrElse(throw new IllegalArgumentException(
        s"LM header missing $key= in: ${lines(0)}"))
    val total = scalar("total")
    val vocab = scalar("vocab")
    // the SAME denominator expression as UnigramLm.denom — exact
    // integer sum, so file round-trips cannot drift the probabilities
    val denom = (total + vocab + 1).toDouble
    val map = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, (vocab * 2).min(Int.MaxValue / 2).toInt))
    var i = 1
    while (i < lines.length) {
      val line = lines(i)
      if (line.nonEmpty) {
        val tab = line.indexOf('\t')
        require(tab > 0, s"malformed LM line (need token<TAB>count): '$line'")
        val cnt = line.substring(tab + 1).toLong
        map.put(UTF8String.fromString(line.substring(0, tab)),
          java.lang.Double.valueOf(StrictMath.log10((cnt + 1).toDouble / denom)))
        ()
      }
      i += 1
    }
    require(map.size().toLong == vocab,
      s"LM file $path header says vocab=$vocab but has ${map.size()} entries")
    new UnigramLmTable(map, StrictMath.log10(1.0 / denom))
  }

  /** Codegen / eval entry: average log10 token probability of `text`
    * under the LM at `path`; null when `text` has no tokens. */
  def score(path: String, text: UTF8String): java.lang.Double =
    get(path).avgLogProb(text)
}

/** `graft_lm_logprob(string, 'lm-path') -> double`: average log10
  * token probability under a saved unigram LM (`LangModel.save`) —
  * the zero-shuffle scale form of `LangModel.logProbPerDoc`, bit-
  * identical to it by the [[UnigramLmTable]] contract. Null input →
  * null; a document with no tokens → null (unscorable, filterable). */
case class LmLogProb(child: Expression, lmPath: String)
    extends UnaryExpression {
  require(lmPath.nonEmpty, "graft_lm_logprob needs an LM path")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lm_logprob expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm_logprob"

  override protected def nullSafeEval(t: Any): Any =
    LmRegistry.score(lmPath, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("lmPath", lmPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.LmRegistry.score($pathRef, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
