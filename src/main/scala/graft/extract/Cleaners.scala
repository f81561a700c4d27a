package graft.extract

import graft.dom.Node

/** The pre-clean stage (P1) and attribute stripper (P11).
  *
  * P1 reproduces the effective behavior of the reference's lxml `Cleaner`
  * configuration (/root/reference/readability/cleaners.py:28-32: scripts,
  * javascript, comments, style, links, processing_instructions on;
  * page_structure/forms/frames/embedded off): drop `<script>`, `<style>`,
  * `<link>` elements, comments and PIs; remove `on*` event attributes and
  * `style` attributes; blank `javascript:`/`vbscript:` URLs.
  * Implemented as a single tree pass (no serialization round-trip).
  */
object Cleaners {

  private val killTags = Set("script", "style", "link")

  /** In-place P1 clean. Dropped nodes keep their tails (lxml Cleaner uses
    * drop_tree-style removal via `el.drop_tree()`). */
  def cleanHtml(root: Node): Unit = {
    def walk(n: Node): Unit = {
      // iterate over a snapshot since we mutate the child list
      var i = 0
      while (i < n.children.length) {
        val c = n.children(i)
        if (c.isComment || c.isPi || killTags.contains(c.tag)) {
          c.dropTree()
          // child list shrank; re-check same index
        } else {
          cleanNodeAttrs(c)
          walk(c)
          i += 1
        }
      }
    }
    cleanNodeAttrs(root)
    walk(root)
  }

  private def cleanNodeAttrs(n: Node): Unit = {
    if (!n.hasAttrs) return
    val toRemove = n.attrs.keysIterator.filter { k =>
      (k.length > 2 && k.startsWith("on")) || k == "style"
    }.toList
    toRemove.foreach(n.removeAttr)
    for (urlAttr <- List("href", "src", "action")) {
      val v = n.attr(urlAttr)
      if (v != null) {
        val t = v.trim.toLowerCase(java.util.Locale.ROOT)
        if (t.startsWith("javascript:") || t.startsWith("vbscript:"))
          n.setAttr(urlAttr, "")
      }
    }
  }

  private val onStar = java.util.regex.Pattern.compile("on*",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  def isBadAttr(kRaw: String): Boolean = {
    val k = kRaw.toLowerCase(java.util.Locale.ROOT)
    k == "width" || k == "height" || k == "style" ||
      (k.endsWith("color") && k.dropRight(5).forall(c => (c >= 'a' && c <= 'z') || c == '-')) ||
      (k.startsWith("background") && k.drop(10).forall(c => (c >= 'a' && c <= 'z') || c == '-')) ||
      onStar.matcher(k).matches()
  }

  /** Python 2 `unicode.isspace()` — Unicode whitespace incl. NBSP and NEL,
    * which Java's `Character.isWhitespace` excludes. */
    @inline def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00A0' || c == '\u2007' ||
      c == '\u202F' || c == '\u0085'

  /** `normalize_spaces` (/root/reference/readability/cleaners.py:22-26):
    * Python `' '.join(s.split())` — any (unicode) whitespace run to one
    * space, leading/trailing stripped. */
  def normalizeSpaces(s: String): String = {
    if (s == null || s.isEmpty) return ""
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (pyIsSpace(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    sb.toString
  }

  /** `clean` (/root/reference/readability/htmls.py:122-125):
    * `\s*\n\s*` → `\n`, then `[ \t]{2,}` → one space, then strip. The Py2
    * pattern has no re.UNICODE flag, so `\s` is ASCII-only there, while the
    * final unicode `.strip()` IS unicode-aware — replicated exactly. */
  def clean(text: String): String = {
    if (text == null) return ""
    val a = NL.matcher(text).replaceAll("\n")
    val b = MULTISPACE.matcher(a).replaceAll(" ")
    strip(b)
  }

  private val NL = java.util.regex.Pattern.compile(
    "[ \\t\\n\\x0B\\f\\r]*\\n[ \\t\\n\\x0B\\f\\r]*")
  private val MULTISPACE = java.util.regex.Pattern.compile("[ \\t]{2,}")

  /** Python 2 `unicode.strip()`. */
  def strip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && pyIsSpace(s.charAt(a))) a += 1
    while (b > a && pyIsSpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Zero-allocation `clean(textContent).length` over a DOM subtree —
    * the extraction hot path calls text_length per node per decision
    * (scoring, link density, sanitize); building the subtree string and
    * running two regexes each time dominates the garbage profile. This
    * streams the subtree's text pieces through a normalizer with exactly
    * `clean`'s semantics: an ASCII-whitespace run containing '\n' → one
    * unit; each maximal [ \t] subrun → one unit; \r \f \x0B pass through;
    * unicode-stripped at both ends. Property-tested equal to
    * `clean(textContent).length`. */
  final class CleanLengthCounter {
    private var length = 0
    private var trailingWs = 0
    private var leadingDone = false
    // pending ASCII-ws run state
    private var runUnits = 0
    private var runHasNl = false
    private var inTabSpace = false

    @inline private def isAsciiWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

    private def flushRun(): Unit = {
      if (runUnits > 0 || runHasNl) {
        val k = if (runHasNl) 1 else runUnits
        if (leadingDone) { length += k; trailingWs += k }
        runUnits = 0
        runHasNl = false
        inTabSpace = false
      }
    }

    def accept(s: String): Unit = {
      if (s == null) return
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (isAsciiWs(c)) {
          if (c == '\n') { runHasNl = true; inTabSpace = false }
          else if (c == ' ' || c == '\t') {
            if (!inTabSpace) { runUnits += 1; inTabSpace = true }
          } else { // \r \f \x0B pass through individually
            runUnits += 1
            inTabSpace = false
          }
        } else {
          flushRun()
          if (pyIsSpace(c)) { // unicode whitespace: kept by clean, stripped at ends
            if (leadingDone) { length += 1; trailingWs += 1 }
          } else {
            leadingDone = true
            length += 1
            trailingWs = 0
          }
        }
        i += 1
      }
    }

    def result: Int = length - trailingWs // pending ws run never counts at EOF
  }

  /** Streaming `len(clean(node.text_content()))` (readability.py:44-45). */
  def cleanLength(n: Node): Int = {
    val c = new CleanLengthCounter
    def walk(x: Node): Unit = {
      if (x.isElement && x.text != null) c.accept(x.text)
      var i = 0
      while (i < x.children.length) {
        val ch = x.children(i)
        walk(ch)
        if (ch.tail != null) c.accept(ch.tail)
        i += 1
      }
    }
    walk(n)
    c.result
  }

  /** Streaming comma count of `node.text_content()`, early-exits at `cap`
    * (sanitize only tests `< 10`, readability.py:480). */
  def commasAtLeast(n: Node, cap: Int): Boolean = {
    var count = 0
    def countIn(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == ',') { count += 1; if (count >= cap) return true }
        i += 1
      }
      false
    }
    def walk(x: Node): Boolean = {
      if (x.isElement && x.text != null && countIn(x.text)) return true
      var i = 0
      while (i < x.children.length) {
        val ch = x.children(i)
        if (walk(ch)) return true
        if (ch.tail != null && countIn(ch.tail)) return true
        i += 1
      }
      false
    }
    walk(n)
  }

  /** Streaming exact comma count over a subtree. */
  def countCommas(n: Node): Int = {
    var count = 0
    def countIn(s: String): Unit = {
      var i = 0
      while (i < s.length) { if (s.charAt(i) == ',') count += 1; i += 1 }
    }
    def walk(x: Node): Unit = {
      if (x.isElement && x.text != null) countIn(x.text)
      var i = 0
      while (i < x.children.length) {
        val ch = x.children(i)
        walk(ch)
        if (ch.tail != null) countIn(ch.tail)
        i += 1
      }
    }
    walk(n)
    count
  }
}
