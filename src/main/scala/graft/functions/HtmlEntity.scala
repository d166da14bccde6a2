package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full HTML5 character-reference decoding (`graft_html_entities`):
  * one left-to-right pass that resolves
  *  - every NAMED reference in the published WHATWG table (2,125
  *    semicolon-terminated names, bundled as the
  *    `/graft/html5-entities.tsv` resource — including multi-codepoint
  *    replacements like `&nGt;`), and
  *  - NUMERIC references `&#NNN;` / `&#xHH;` for any valid
  *    non-surrogate codepoint.
  * Anything that does not parse as a reference (`Fish&Chips`, unknown
  * names, unterminated `&amp`) passes through verbatim — the
  * semicolon-required rule, deliberately stricter than the browser's
  * legacy no-semicolon quirks so prose ampersands can never decode by
  * accident.
  *
  * Single-pass semantics equal the browser's: the scanner continues
  * AFTER each replacement, so `&amp;lt;` yields the literal text
  * `&lt;` (double-escaping survives one level), which is also what
  * the ordered literal-replace chain in
  * [[graft.llm.TextAnalysis.HtmlEntities]] produces for its subset.
  * The fast path is free: a string without `&` returns unchanged,
  * no allocation. */
object HtmlEntityImpl {

  /** `&name;` -> replacement, loaded once per JVM from the bundled
    * WHATWG table (escaped TSV; see the resource header). */
  lazy val table: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    val in = getClass.getResourceAsStream("/graft/html5-entities.tsv")
    require(in != null, "bundled /graft/html5-entities.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().foreach { l =>
      if (l.nonEmpty && !l.startsWith("#")) {
        val i = l.indexOf('\t')
        require(i > 0, s"malformed entity line: '$l'")
        m.put(l.substring(0, i), unescape(l.substring(i + 1)))
      }
    } finally src.close()
    m
  }

  /** Longest name in the table ("CounterClockwiseContourIntegral"),
    * the scan bound for named references. */
  private val MaxNameLen = 32

  // one left-to-right scan, so `\\t` and a literal backslash can never
  // confuse each other (order-dependent replace chains would)
  private def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append(c).append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    var amp = str.indexOf('&')
    if (amp < 0) return s
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var last = 0
    while (amp >= 0) {
      var repl: String = null
      var end = amp
      if (amp + 1 < n && str.charAt(amp + 1) == '#') {
        // numeric reference: &#NNN; or &#xHH;
        var j = amp + 2
        val hex = j < n && (str.charAt(j) == 'x' || str.charAt(j) == 'X')
        if (hex) j += 1
        val digits0 = j
        var cp = 0L
        var ok = true
        while (ok && j < n && str.charAt(j) != ';' && j - digits0 <= 7) {
          val d = Character.digit(str.charAt(j), if (hex) 16 else 10)
          if (d < 0) ok = false else { cp = cp * (if (hex) 16 else 10) + d; j += 1 }
        }
        if (ok && j > digits0 && j < n && str.charAt(j) == ';' &&
            cp > 0 && cp <= 0x10ffffL && !(cp >= 0xd800L && cp <= 0xdfffL)) {
          repl = new String(Character.toChars(cp.toInt))
          end = j + 1
        }
      } else {
        // named reference: alphanumeric run + ';', table lookup
        var j = amp + 1
        val limit = math.min(n, amp + 2 + MaxNameLen)
        while (j < limit && {
          val c = str.charAt(j)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
        }) j += 1
        if (j > amp + 1 && j < n && str.charAt(j) == ';') {
          val hit = table.get(str.substring(amp, j + 1))
          if (hit != null) { repl = hit; end = j + 1 }
        }
      }
      if (repl != null) {
        sb.append(str, last, amp).append(repl)
        last = end
        amp = str.indexOf('&', end)
      } else amp = str.indexOf('&', amp + 1)
    }
    if (last == 0) s
    else {
      sb.append(str, last, n)
      UTF8String.fromString(sb.toString)
    }
  }
}

/** `graft_html_entities(string) -> string` */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_html_entities expects string, got $t")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_html_entities"

  override protected def nullSafeEval(s: Any): Any =
    HtmlEntityImpl.decode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntityImpl.decode($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
