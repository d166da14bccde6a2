package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Markdown → plain text for corpus ingest (`graft_markdown_strip`) —
  * the sibling of the HTML extractor ([[HtmlEntityDecode]] /
  * `extractText`) for the OTHER markup that dominates code and
  * documentation corpora (READMEs, wikis, papers-in-md): strip the
  * structural markup, keep every piece of human-visible content,
  * including fenced code VERBATIM (code is content in a training
  * corpus; the fence delimiters are not).
  *
  * Supported subset (CommonMark's high-frequency constructs — each
  * rule spec-pinned, the whole chain oracle-pinned end to end by the
  * q143 wrap-and-strip identity):
  *  - ATX headers: leading `#…# ` (and a closing ` #…#`) stripped;
  *  - horizontal rules / setext underlines: lines of only `===`,
  *    `---`, or `***` (3+) dropped;
  *  - fenced code blocks: the ``` / ~~~ delimiter lines dropped, the
  *    code inside emitted verbatim (no inline rules applied);
  *  - blockquotes: leading `> ` markers stripped (nested included);
  *  - list markers: leading `- `/`* `/`+ ` and `1. `-style ordered
  *    markers stripped;
  *  - tables: `| a | b |` rows become space-joined cells, `|---|---|`
  *    separator rows dropped;
  *  - images `![alt](url)` → alt, links `[text](url)` → text,
  *    reference links `[text][ref]` → text, link definitions
  *    (`[ref]: url` lines) dropped, autolinks `<scheme://…>` → url;
  *  - emphasis `**x**`/`__x__`/`*x*`/`_x_` → x (innermost-first, so
  *    `***x***` unwraps fully), inline code `` `x` `` → x;
  *  - backslash escapes of ASCII punctuation: `\*` → `*`.
  *
  * NOT claimed: idempotence. Markdown is contextual — stripped output
  * can itself look like markup (`*a*b*c*` leaves a starred remainder)
  * — so this is a ONE-SHOT ingest rewrite, like the reference
  * pipelines that run extraction exactly once. Plain text without
  * marker characters passes through byte-identical (spec-pinned).
  *
  * Scale shape: a per-row transformation with no state and no lookups
  * — pure scan work inside whole-stage codegen, same contract as
  * [[HtmlEntityDecode]]. */
object MarkdownStripImpl {
  import java.util.regex.Pattern

  private val HrLine = Pattern.compile("""^\s{0,3}(={3,}|-{3,}|\*{3,})\s*$""")
  private val TableSep = Pattern.compile("""^\s*\|?[\s:|-]*-[\s:|-]*\|?\s*$""")
  private val LinkDef = Pattern.compile("""^\s{0,3}\[[^\]]+\]:\s+\S+.*$""")
  private val Blockquote = Pattern.compile("""^\s{0,3}(>\s?)+""")
  private val AtxOpen = Pattern.compile("""^\s{0,3}#{1,6}\s+""")
  private val AtxClose = Pattern.compile("""\s+#+\s*$""")
  private val ListMarker = Pattern.compile("""^\s*(?:[-*+]|\d{1,3}\.)\s+""")
  private val Fence = Pattern.compile("""^\s{0,3}(`{3,}|~{3,}).*$""")
  private val Image = Pattern.compile("""!\[([^\]]*)\]\([^)]*\)""")
  private val Link = Pattern.compile("""\[([^\]]*)\]\([^)]*\)""")
  private val RefLink = Pattern.compile("""\[([^\]]*)\]\[[^\]]*\]""")
  private val Autolink = Pattern.compile("""<([a-zA-Z][a-zA-Z0-9+.-]*://[^>\s]+)>""")
  // escaped delimiters (\* \_ \`) never open or close a span — the
  // escape pass afterwards turns them into their literal characters
  private val Bold = Pattern.compile(
    """(?<!\\)\*\*(.*?)(?<!\\)\*\*|(?<!\\)__(.*?)(?<!\\)__""")
  private val Emph = Pattern.compile(
    """(?<!\\)\*([^*\n]*)(?<!\\)\*|\b(?<!\\)_([^_\n]+)(?<!\\)_\b""")
  private val Code = Pattern.compile("""(?<!\\)`([^`\n]*)(?<!\\)`""")
  private val Escape = Pattern.compile("""\\([\\`*_{}\[\]()#+\-.!>|~])""")

  private def replaceAll(p: Pattern, s: String, group2: Boolean): String = {
    val m = p.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      val g = if (group2 && m.group(1) == null) m.group(2) else m.group(1)
      sb.append(if (g == null) "" else g)
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  private def stripInline(line0: String): String = {
    var line = line0
    line = replaceAll(Image, line, group2 = false)
    line = replaceAll(Link, line, group2 = false)
    line = replaceAll(RefLink, line, group2 = false)
    line = replaceAll(Autolink, line, group2 = false)
    // innermost-first unwrap with a small fixpoint cap: ***x*** needs
    // one bold pass + one emphasis pass; nesting deeper than 4 is not
    // natural markup
    var it = 0
    var changed = true
    while (changed && it < 4) {
      val next = replaceAll(Emph, replaceAll(Bold, line, group2 = true), group2 = true)
      changed = next != line
      line = next
      it += 1
    }
    line = replaceAll(Code, line, group2 = false)
    line = replaceAll(Escape, line, group2 = false)
    line
  }

  private def stripTableRow(line: String): String = {
    val t = line.trim
    if (t.length < 2 || t.charAt(0) != '|') return line
    // space-join the trimmed cells, dropping the empty edge cells the
    // leading/trailing pipes produce
    val cells = t.split("\\|", -1).map(_.trim).filter(_.nonEmpty)
    cells.mkString(" ")
  }

  def strip(text: String): String = {
    val lines = text.split("\n", -1)
    val out = new java.lang.StringBuilder(text.length)
    var inFence = false
    var first = true
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      if (Fence.matcher(raw).matches()) {
        inFence = !inFence // the delimiter line itself is dropped
      } else if (inFence) {
        if (!first) out.append('\n')
        out.append(raw) // code is content — verbatim, no inline rules
        first = false
      } else if (HrLine.matcher(raw).matches() ||
          TableSep.matcher(raw).matches() ||
          LinkDef.matcher(raw).matches()) {
        () // structural-only lines vanish
      } else {
        var line = raw
        line = Blockquote.matcher(line).replaceFirst("")
        val atx = AtxOpen.matcher(line)
        if (atx.find()) {
          line = line.substring(atx.end())
          line = AtxClose.matcher(line).replaceFirst("")
        }
        line = ListMarker.matcher(line).replaceFirst("")
        line = stripTableRow(line)
        line = stripInline(line)
        if (!first) out.append('\n')
        out.append(line)
        first = false
      }
      i += 1
    }
    out.toString
  }
}

/** Executor entry for codegen. */
object MarkdownStripRegistry {
  def strip(text: UTF8String): UTF8String =
    UTF8String.fromString(MarkdownStripImpl.strip(text.toString))
}

/** `graft_markdown_strip(string) -> string`: markdown markup to plain
  * text (see [[MarkdownStripImpl]] for the supported subset and the
  * one-shot contract). */
case class MarkdownStrip(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_markdown_strip expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_markdown_strip"

  override protected def nullSafeEval(t: Any): Any =
    MarkdownStripRegistry.strip(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkdownStripRegistry.strip($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
