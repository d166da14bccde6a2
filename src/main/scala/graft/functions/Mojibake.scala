package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Algorithmic mojibake repair (`graft_fix_mojibake`) — the ftfy-core
  * `fix_encoding` idea as one codegen'd pass, replacing the
  * fixed-pair-list stand-in ([[graft.llm.TextAnalysis.MojibakeRepairs]])
  * with the ALGORITHM that list was hand-derived from:
  *
  * UTF-8 bytes decoded as cp1252 (or latin-1) render each byte as one
  * glyph — `é` (C3 A9) becomes `Ã©`, `’` (E2 80 99) becomes `â€™`. The
  * repair inverts that: map each character back to the byte it renders
  * (cp1252 glyph table ∪ latin-1 identity — the two encodings agree
  * everywhere except 0x80–0x9F, where BOTH renderings map to the same
  * byte), and wherever a valid-UTF-8 byte sequence reassembles (correct
  * lead/continuation structure, no overlongs, no surrogates, ≤
  * U+10FFFF), emit its decoded codepoint instead. Anything that does
  * not reassemble passes through verbatim, so clean text — including
  * legitimate `Ã` before a non-continuation glyph — is untouched; the
  * strict validity rules are what keep false repairs out (a "ñ" is only
  * rewritten if the three following glyphs happen to be continuation
  * renderings, which real prose does not produce).
  *
  * Repeats until a fixed point (≤ 4 passes) so doubly-encoded text
  * (`Ã¢â‚¬â„¢`, the classic two-layer case) unwinds completely, exactly
  * like ftfy's loop. The fast path is free: pure-ASCII text returns
  * unchanged without allocating. */
object MojibakeImpl {

  /** char → the byte that renders as it under cp1252/latin-1; -1 when
    * the char is not a single-byte rendering. Covers 0x00–0xFF via
    * latin-1 identity plus the 27 cp1252 glyphs for 0x80–0x9F (built
    * from the JVM's own windows-1252 decoder, not transcribed). */
  private val toByte: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](512)
    var b = 0
    while (b < 256) {
      m.put(b.toChar, b) // latin-1 identity (includes raw C1 controls)
      b += 1
    }
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    b = 0x80
    while (b < 0xa0) {
      val ch = new String(Array(b.toByte), cp1252).charAt(0)
      if (ch != '�') m.put(ch, b) // cp1252 glyph for the same byte
      b += 1
    }
    m
  }

  private def byteOf(c: Char): Int = {
    val v = toByte.get(c)
    if (v == null) -1 else v.intValue()
  }

  /** One repair pass; returns `null` when nothing changed. */
  private def fixOnce(str: String): String = {
    val n = str.length
    var i = 0
    var changed = false
    var sb: java.lang.StringBuilder = null
    while (i < n) {
      val b0 = byteOf(str.charAt(i))
      var consumed = 0
      var cp = -1
      if (b0 >= 0xc2 && b0 <= 0xf4) {
        val need = if (b0 < 0xe0) 1 else if (b0 < 0xf0) 2 else 3
        if (i + need < n) {
          var acc = b0 & (if (need == 1) 0x1f else if (need == 2) 0x0f else 0x07)
          var k = 1
          var ok = true
          while (ok && k <= need) {
            val bk = byteOf(str.charAt(i + k))
            if (bk >= 0x80 && bk <= 0xbf) { acc = (acc << 6) | (bk & 0x3f); k += 1 }
            else ok = false
          }
          // overlong / range / surrogate validity — the guards that keep
          // legitimate text from ever being "repaired"
          val minCp = if (need == 1) 0x80 else if (need == 2) 0x800 else 0x10000
          if (ok && acc >= minCp && acc <= 0x10ffff &&
              !(acc >= 0xd800 && acc <= 0xdfff)) {
            cp = acc
            consumed = need + 1
          }
        }
      }
      if (cp >= 0) {
        if (sb == null) {
          sb = new java.lang.StringBuilder(n)
          sb.append(str, 0, i)
        }
        sb.appendCodePoint(cp)
        i += consumed
        changed = true
      } else {
        if (sb != null) sb.append(str.charAt(i))
        i += 1
      }
    }
    if (changed) sb.toString else null
  }

  def fix(s: UTF8String): UTF8String = {
    // fast path: no char maps to a UTF-8 lead byte rendering → no work.
    // numBytes == numChars means pure ASCII, which can hold none.
    if (s.numBytes == s.numChars) return s
    var cur = s.toString
    var pass = 0
    var changed = true
    while (changed && pass < 4) {
      val next = fixOnce(cur)
      if (next == null) changed = false else cur = next
      pass += 1
    }
    if (pass == 1 && !changed) s else UTF8String.fromString(cur)
  }
}

/** `graft_fix_mojibake(string) -> string` */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_fix_mojibake expects string, got $t")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_fix_mojibake"

  override protected def nullSafeEval(s: Any): Any =
    MojibakeImpl.fix(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MojibakeImpl.fix($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
