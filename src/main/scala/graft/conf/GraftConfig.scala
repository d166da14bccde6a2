package graft.conf

/** Minimal HOCON-subset configuration tree.
  *
  * Mirrors the reference's config-driven pipeline model
  * (`sparktools/core.py:369-411` parse/merge/override; `scorer.py:71-76`
  * CLI-override protocol) without external dependencies — the offline build
  * has no Typesafe Config jar, so we parse the subset the reference
  * actually uses: nested objects `{}`, `k = v` / `k: v`, quoted and
  * unquoted scalars, lists `[a, b]`, `#`/`//` comments, dotted key paths,
  * and `${path}` substitution.
  *
  * Values are stored flattened by dotted path, which is also how the
  * reference feeds Spark conf (`prop_list`, `core.py:266-274`).
  */
final case class GraftConfig(entries: Map[String, ConfValue]) {
  def get(path: String): Option[ConfValue] = entries.get(path)
  def getString(path: String): Option[String] = entries.get(path).map(_.render)
  def getInt(path: String): Option[Int] = getString(path).map(_.trim.toInt)
  def getLong(path: String): Option[Long] = getString(path).map(_.trim.toLong)
  def getDouble(path: String): Option[Double] = getString(path).map(_.trim.toDouble)
  def getBoolean(path: String): Option[Boolean] = getString(path).map(_.trim.toBoolean)
  def getList(path: String): Option[Seq[String]] = entries.get(path).collect {
    case CList(xs) => xs.map(_.render)
    case v         => Seq(v.render)
  }

  def string(path: String): String =
    getString(path).getOrElse(throw new NoSuchElementException(s"missing config key: $path"))

  def has(path: String): Boolean = entries.contains(path) || hasObject(path)

  /** True when `path` is an interior node (some key extends it). */
  def hasObject(path: String): Boolean = {
    val prefix = path + "."
    entries.keysIterator.exists(_.startsWith(prefix))
  }

  /** Sub-config rooted at `path` (keys re-based). */
  def at(path: String): GraftConfig = {
    val prefix = path + "."
    GraftConfig(entries.collect {
      case (k, v) if k.startsWith(prefix) => k.drop(prefix.length) -> v
    })
  }

  /** `this` wins over `other` — reference `with_fallback` semantics
    * (`scorer.py:76`). */
  def withFallback(other: GraftConfig): GraftConfig =
    GraftConfig(other.entries ++ entries)

  /** Flattened key/value pairs, e.g. to fold into SparkSession config. */
  def flat: Seq[(String, String)] =
    entries.toSeq.sortBy(_._1).map { case (k, v) => k -> v.render }
}

sealed trait ConfValue { def render: String }
final case class CStr(s: String) extends ConfValue { def render: String = s }
final case class CList(xs: Seq[ConfValue]) extends ConfValue {
  def render: String = xs.map(_.render).mkString("[", ",", "]")
}

object GraftConfig {
  val empty: GraftConfig = GraftConfig(Map.empty)

  def parseFile(path: String): GraftConfig =
    parse(readWithIncludes(java.nio.file.Paths.get(path), depth = 0))

  /** HOCON `include "file"` support (the reference's configs include
    * shared spark blocks, `README.md:92`): each include line is spliced
    * with the referenced file's content, paths resolved relative to the
    * including file. Bounded depth guards include cycles. */
  private def readWithIncludes(path: java.nio.file.Path, depth: Int): String = {
    require(depth < 16, s"include depth > 16 — include cycle at $path")
    val text = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val inc = """^\s*include\s+"([^"]+)"\s*$""".r
    text.linesIterator.map {
      case inc(rel) =>
        val target = Option(path.getParent).map(_.resolve(rel)).getOrElse(java.nio.file.Paths.get(rel))
        readWithIncludes(target, depth + 1)
      case line => line
    }.mkString("\n")
  }

  /** Parse a HOCON-subset document into a flattened config. A document may
    * optionally be wrapped in one top-level `{ }` (root-braced HOCON) —
    * detected after comment/whitespace skipping, so leading or trailing
    * comments around the braces are fine. */
  def parse(text: String): GraftConfig = {
    val p = new Parser(text)
    GraftConfig(resolveSubstitutions(p.parseDocument()))
  }

  /** CLI-override protocol: unknown argv tokens of the form `a.b=c`
    * override the file config (reference `scorer.py:71-76`). */
  def fromOverrides(tokens: Seq[String]): GraftConfig =
    GraftConfig(tokens.flatMap { t =>
      val i = t.indexOf('=')
      if (i <= 0) None else Some(t.take(i).trim -> (CStr(stripQuotes(t.drop(i + 1).trim)): ConfValue))
    }.toMap)

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1) else s

  /** `${a.b}` substitution against the flattened tree (pyhocon-resolve
    * equivalent, `core.py:388`). Unresolvable refs are left verbatim. */
  private def resolveSubstitutions(m: Map[String, ConfValue]): Map[String, ConfValue] = {
    val ref = "\\$\\{([^}]+)\\}".r
    def subst(v: ConfValue, depth: Int): ConfValue = v match {
      case CList(xs) => CList(xs.map(subst(_, depth)))
      case CStr(s) if depth < 8 =>
        CStr(ref.replaceAllIn(s, mm => {
          val k = mm.group(1).trim
          m.get(k) match {
            case Some(rv) => java.util.regex.Matcher.quoteReplacement(subst(rv, depth + 1).render)
            case None     => java.util.regex.Matcher.quoteReplacement(mm.matched)
          }
        }))
      case other => other
    }
    m.map { case (k, v) => k -> subst(v, 0) }
  }

  private final class Parser(text: String) {
    private var pos = 0
    private def peek: Char = text.charAt(pos)
    private def eof: Boolean = pos >= text.length

    private def skipWs(newlines: Boolean): Unit = {
      var done = false
      while (!done && !eof) {
        val c = peek
        if (c == '#' || (c == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '/')) {
          while (!eof && peek != '\n') pos += 1
        } else if (c == ' ' || c == '\t' || c == '\r' || (newlines && c == '\n')) pos += 1
        else done = true
      }
    }

    /** Whole document: either bare `k = v` pairs or one root-braced
      * object, with comments allowed around the braces. */
    def parseDocument(): Map[String, ConfValue] = {
      skipWs(newlines = true)
      if (!eof && peek == '{') {
        val m = parseObject(topLevel = false)
        skipWs(newlines = true)
        require(eof, s"unexpected content after root object at $pos")
        m
      } else parseObject(topLevel = true)
    }

    def parseObject(topLevel: Boolean): Map[String, ConfValue] = {
      var out = Map.empty[String, ConfValue]
      skipWs(newlines = true)
      if (!topLevel) { require(peek == '{', s"expected '{' at $pos"); pos += 1 }
      var done = false
      while (!done) {
        skipWs(newlines = true)
        if (eof) { require(topLevel, "unexpected EOF in object"); done = true }
        else if (peek == '}') { require(!topLevel, s"unexpected '}' at $pos"); pos += 1; done = true }
        else if (peek == ',') pos += 1
        else {
          val key = parseKey()
          skipWs(newlines = false)
          if (!eof && peek == '{') {
            out = merge(out, parseObject(topLevel = false).map { case (k, v) => s"$key.$k" -> v })
          } else {
            if (!eof && (peek == '=' || peek == ':')) { pos += 1; skipWs(newlines = false) }
            if (!eof && peek == '{')
              out = merge(out, parseObject(topLevel = false).map { case (k, v) => s"$key.$k" -> v })
            else {
              sawQuote = false
              val v = parseValue()
              // an EMPTY unquoted value means malformed input — commonly
              // an unbracketed list 'k = a, b' whose tail would otherwise
              // become a phantom key with an empty value (silent data
              // loss downstream); explicit empty needs quotes: k = ""
              v match {
                case CStr("") if !sawQuote =>
                  throw new IllegalArgumentException(
                    s"missing value for key '$key' near position $pos " +
                      "(unbracketed list? write k = [a, b]; empty value? write k = \"\")")
                case _ => ()
              }
              out += key -> v
            }
          }
        }
      }
      out
    }

    /** Later keys override earlier (HOCON object merge). */
    private def merge(a: Map[String, ConfValue], b: Map[String, ConfValue]) = a ++ b

    /** Set by parseValue when the scalar consumed a quoted section —
      * distinguishes an intentional `k = ""` from a missing value. */
    private var sawQuote = false

    private def parseKey(): String = {
      skipWs(newlines = true)
      if (peek == '"') parseQuoted()
      else {
        val sb = new StringBuilder
        while (!eof && !"=:{}\n#, \t\r".contains(peek)) { sb += peek; pos += 1 }
        sb.result().trim
      }
    }

    private def parseValue(): ConfValue = {
      skipWs(newlines = false)
      if (eof) CStr("")
      else peek match {
        case '[' =>
          pos += 1
          var xs = Vector.empty[ConfValue]
          skipWs(newlines = true)
          while (!eof && peek != ']') {
            val elemStart = pos
            sawQuote = false
            val elem = parseValue()
            // same guard as object values: an empty UNQUOTED element
            // ('[a,,b]' or a trailing ',]') would silently become an
            // empty-string entry; explicit empty needs quotes: [""]
            elem match {
              case CStr("") if !sawQuote =>
                throw new IllegalArgumentException(
                  s"empty list element near position $elemStart " +
                    "(stray comma? explicit empty element? write \"\")")
              case _ => ()
            }
            xs :+= elem
            skipWs(newlines = true)
            if (!eof && peek == ',') { pos += 1; skipWs(newlines = true) }
          }
          require(!eof, s"unterminated list: expected ']' before end of input (opened near $pos)")
          pos += 1
          CList(xs)
        case _ =>
          // scalar: a concatenation of quoted strings, ${...} substitutions
          // (consumed atomically so their '}' doesn't close the enclosing
          // object), and raw chunks, running to newline/comma/}/]/comment.
          val sb = new StringBuilder
          var done = false
          while (!done && !eof) {
            val c = peek
            if (c == '\n' || c == ',' || c == '}' || c == ']' || c == '#') done = true
            else if (c == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '/') done = true
            else if (c == '"') { sawQuote = true; sb ++= parseQuoted() }
            else if (c == '$' && pos + 1 < text.length && text.charAt(pos + 1) == '{') {
              while (!eof && peek != '}') { sb += peek; pos += 1 }
              if (!eof) { sb += '}'; pos += 1 }
            } else { sb += c; pos += 1 }
          }
          CStr(sb.result().trim)
      }
    }

    private def parseQuoted(): String = {
      require(peek == '"'); pos += 1
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        if (peek == '\\' && pos + 1 < text.length) {
          pos += 1
          sb += (peek match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
        } else sb += peek
        pos += 1
      }
      require(!eof, s"unterminated quoted string: expected '\"' before end of input")
      pos += 1
      sb.result()
    }
  }
}
