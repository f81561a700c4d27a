package graft.dom

import scala.collection.mutable

/** From-scratch error-tolerant HTML tokenizer + tree builder.
  *
  * Plays the role of libxml2's recovering HTML parser in the reference
  * (`lxml.html.document_fromstring`, /root/reference/readability/htmls.py:13-17):
  * implied `<html><head><body>`, void elements, raw-text elements, `<p>`/`<li>`/
  * table-cell auto-close, unmatched end tags ignored, character references
  * decoded. It does NOT implement the full HTML5 algorithm (no adoption agency,
  * no foster parenting) — libxml2 does not either.
  *
  * This runs inside `mapPartitions` on the extraction hot path (SURVEY.md §7
  * module 1); it is a single forward scan building the tree directly with no
  * intermediate token list.
  */
object HtmlParser {

  val voidElements: Set[String] = Set(
    "area", "base", "basefont", "br", "col", "embed", "frame", "hr", "img",
    "input", "isindex", "keygen", "link", "meta", "param", "source", "track",
    "wbr")

  /** Content scanned raw until the matching close tag; script/style get no
    * entity decoding, textarea/title (RCDATA) do. */
  private val rawText = Set("script", "style")
  private val rcdata = Set("textarea", "title")

  private val headOnly = Set("title", "base", "link", "meta", "style",
    "script", "isindex")

  /** Starting any of these closes an open <p> — the HTML4 block set the
    * era libxml2 knew. HTML5 elements (article, header, section, aside,
    * figure, nav, …) are deliberately ABSENT: libxml2 treated them as
    * unknown inline-ish elements that nest freely inside <p>, and the
    * golden fixtures encode that (slate-000's golden has
    * `<p><article><div…` and `<h2>` nested inside an unclosed `<h1>`). */
  private val pClosers = Set(
    "address", "blockquote", "center", "dir", "div", "dl", "fieldset",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "listing", "menu",
    "noscript", "ol", "p", "pre", "table", "ul", "xmp")

  def parse(html: String): Node = new Parser(html).run()

  /** Parse a fragment with a single root element (lxml
    * `fragment_fromstring`): returns the first element parsed under body. */
  def parseFragment(html: String): Node = {
    val root = parse(html)
    val body = root.findFirst("body")
    val host = if (body != null) body else root
    host.children.find(_.isElement).getOrElse {
      throw new IllegalArgumentException("no root element in fragment")
    }
  }

  private final class Parser(in: String) {
    private val len = in.length
    private var pos = 0

    private var root: Node = null  // <html>
    private var head: Node = null
    private var body: Node = null
    private var inBody = false
    // open-element stack; root is stack bottom once created
    private val stack = new mutable.ArrayBuffer[Node](16)

    private def cur: Node = stack(stack.length - 1)

    def run(): Node = {
      while (pos < len) {
        val lt = in.indexOf('<', pos)
        if (lt < 0) {
          addText(in.substring(pos), atEof = true); pos = len
        } else {
          if (lt > pos) addText(in.substring(pos, lt))
          pos = lt
          parseMarkup()
        }
      }
      ensureRoot()
      ensureBody()
      root
    }

    private def parseMarkup(): Unit = {
      // pos is at '<'
      if (pos + 1 >= len) { addText("<"); pos = len; return }
      val c = in.charAt(pos + 1)
      if (c == '!') parseDeclaration()
      else if (c == '?') parsePi()
      else if (c == '/') parseEndTag()
      else if (isNameStart(c)) parseStartTag()
      else { addText("<"); pos += 1 }
    }

    private def isNameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    private def isNameChar(c: Char): Boolean =
      isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' ||
        c == ':' || c == '.'

    private def parseDeclaration(): Unit = {
      if (in.startsWith("<!--", pos)) {
        val end = in.indexOf("-->", pos + 4)
        val content = if (end < 0) in.substring(pos + 4)
          else in.substring(pos + 4, end)
        pos = if (end < 0) len else end + 3
        addComment(content)
      } else {
        // <!DOCTYPE ...>, <![CDATA[...]]>, bogus declarations: skip to '>'
        if (in.regionMatches(true, pos, "<![CDATA[", 0, 9)) {
          val end = in.indexOf("]]>", pos + 9)
          pos = if (end < 0) len else end + 3
        } else {
          val end = in.indexOf('>', pos + 2)
          pos = if (end < 0) len else end + 1
        }
      }
    }

    private def parsePi(): Unit = {
      val end = in.indexOf('>', pos + 2)
      val content = if (end < 0) in.substring(pos + 2)
        else in.substring(pos + 2, end)
      pos = if (end < 0) len else end + 1
      val n = new Node(Node.Pi)
      n.text = content.stripSuffix("?")
      // PIs are dropped by the cleaner anyway; attach only inside body
      if (inBody) appendNode(n)
    }

    private def parseEndTag(): Unit = {
      var i = pos + 2
      if (i >= len || !isNameStart(in.charAt(i))) {
        // "</" not followed by a name: bogus comment until '>'
        val end = in.indexOf('>', pos + 2)
        pos = if (end < 0) len else end + 1
        return
      }
      val start = i
      while (i < len && isNameChar(in.charAt(i))) i += 1
      val name = in.substring(start, i).toLowerCase(java.util.Locale.ROOT)
      val end = in.indexOf('>', i)
      pos = if (end < 0) len else end + 1
      endTag(name)
    }

    private def parseStartTag(): Unit = {
      var i = pos + 1
      val start = i
      while (i < len && isNameChar(in.charAt(i))) i += 1
      val name = in.substring(start, i).toLowerCase(java.util.Locale.ROOT)
      var attrPairs: mutable.ArrayBuffer[(String, String)] = null
      // attribute scanning
      var done = false
      while (!done && i < len) {
        // skip whitespace and stray '/'
        while (i < len && (isWs(in.charAt(i)) || in.charAt(i) == '/')) i += 1
        if (i >= len) done = true
        else if (in.charAt(i) == '>') { i += 1; done = true }
        else {
          // attribute name
          val ns = i
          while (i < len && !isWs(in.charAt(i)) && in.charAt(i) != '=' &&
            in.charAt(i) != '>' && in.charAt(i) != '/') i += 1
          val aname = in.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
          while (i < len && isWs(in.charAt(i))) i += 1
          var avalue = ""
          if (i < len && in.charAt(i) == '=') {
            i += 1
            while (i < len && isWs(in.charAt(i))) i += 1
            if (i < len) {
              val q = in.charAt(i)
              if (q == '"' || q == '\'') {
                i += 1
                val vs = i
                while (i < len && in.charAt(i) != q) i += 1
                avalue = Entities.decode(in.substring(vs, i))
                if (i < len) i += 1
              } else {
                val vs = i
                while (i < len && !isWs(in.charAt(i)) && in.charAt(i) != '>') i += 1
                avalue = Entities.decode(in.substring(vs, i))
              }
            }
          }
          if (aname.nonEmpty) {
            if (attrPairs == null) attrPairs = new mutable.ArrayBuffer[(String, String)](4)
            if (!attrPairs.exists(_._1 == aname)) attrPairs += (aname -> avalue)
          }
        }
      }
      pos = i
      startTag(name, attrPairs)
      if (rawText.contains(name)) consumeRawText(name, decodeEntities = false)
      else if (rcdata.contains(name)) consumeRawText(name, decodeEntities = true)
    }

    /** Scan raw content of script/style/textarea/title up to its close tag. */
    private def consumeRawText(name: String, decodeEntities: Boolean): Unit = {
      val closer = "</" + name
      var i = pos
      var end = -1
      while (end < 0) {
        val idx = in.indexOf('<', i)
        if (idx < 0 || idx + closer.length > len) end = len
        else if (in.regionMatches(true, idx, closer, 0, closer.length)) {
          val after = idx + closer.length
          if (after >= len || isWs(in.charAt(after)) || in.charAt(after) == '>' ||
            in.charAt(after) == '/') end = idx
          else i = idx + 1
        } else i = idx + 1
      }
      val content = in.substring(pos, end)
      val text = if (decodeEntities) Entities.decode(content) else content
      val owner = cur
      if (owner.tag == name) {
        if (text.nonEmpty) owner.text =
          (if (owner.text == null) "" else owner.text) + text
        // close the raw element
        if (stack.length > 1) stack.remove(stack.length - 1)
      }
      // skip past the close tag
      if (end >= len) pos = len
      else {
        val gt = in.indexOf('>', end)
        pos = if (gt < 0) len else gt + 1
      }
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    // ---- tree construction ----

    private def ensureRoot(): Unit = {
      if (root == null) {
        root = new Node("html")
        stack += root
      }
    }

    private def ensureHead(): Unit = {
      ensureRoot()
      if (head == null) {
        head = new Node("head")
        head.parent = root
        root.children += head
      }
    }

    private def ensureBody(): Unit = {
      ensureRoot()
      if (body == null) {
        ensureHead()
        body = new Node("body")
        body.parent = root
        root.children += body
      }
      if (!inBody) {
        inBody = true
        // reset stack to html > body
        stack.clear()
        stack += root
        stack += body
      }
    }

    /** libxml2 `IS_BLANK_CH` — ASCII blanks only. */
    private def isBlankCh(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r'

    /** libxml2 `areBlanks` (HTMLparser.c, the 2.7-era variant lxml used when
      * the reference's fixtures were generated): a whitespace-only character
      * run followed by `<` (or EOF) is DROPPED unless the insertion point's
      * last child is a text node (in our model: pending `text`/`tail`) or a
      * `b`/`bold`/`em` element, or the node is `body`. The reference's
      * double-breaks-expected fixtures encode exactly this (e.g. whitespace
      * between `<br><br>` and `<strong>` vanishes, text after `</h1>` stays).
      */
    private def dropsBlankRun(raw: String, atEof: Boolean): Boolean = {
      var i = 0
      while (i < raw.length) {
        if (!isBlankCh(raw.charAt(i))) return false
        i += 1
      }
      if (atEof) return true
      val t = cur
      if (t.tag == "body") return false
      if (t.children.nonEmpty) {
        val last = t.children(t.children.length - 1)
        if (last.tail != null) return false // lastChild is a text node
        if (last.isElement &&
          (last.tag == "b" || last.tag == "bold" || last.tag == "em")) return false
        true
      } else {
        // empty element (or after own leading text): KEEP — the golden
        // corpus shows lxml kept `<div>` leading blanks (washingtonpost-001
        // keeps "&#13;\n    " at div start) while dropping inter-element
        // blanks (`</p>\r\n<p>` collapses)
        false
      }
    }

    private def addText(raw: String, atEof: Boolean = false): Unit = {
      if (raw.isEmpty) return
      if (!inBody) {
        // whitespace-only text before body is dropped (libxml2 behavior);
        // non-whitespace forces the body open
        if (raw.forall(isWs)) return
        ensureBody()
      } else if (dropsBlankRun(raw, atEof)) return
      val text = Entities.decode(raw)
      val t = cur
      if (t.children.nonEmpty) {
        val last = t.children(t.children.length - 1)
        last.tail = (if (last.tail == null) "" else last.tail) + text
      } else {
        t.text = (if (t.text == null) "" else t.text) + text
      }
    }

    private def addComment(content: String): Unit = {
      if (!inBody) return // pre-body comments dropped (cleaner would anyway)
      val n = new Node(Node.Comment)
      n.text = content
      appendNode(n)
    }

    private def appendNode(n: Node): Unit = {
      val t = cur
      n.parent = t
      t.children += n
    }

    /** libxml2 `htmlAutoClose`: pop open elements WHILE the innermost one
      * is auto-closed by the incoming start tag. An unknown (e.g. HTML5)
      * element on top of the stack stops the loop — content nests inside
      * it, matching the era parser that produced the goldens. */
    private def autoClosedBy(newTag: String, oldTag: String): Boolean =
      oldTag match {
        case "p" => pClosers.contains(newTag)
        case "li" => newTag == "li"
        case "dd" | "dt" => newTag == "dd" || newTag == "dt"
        case "option" => newTag == "option" || newTag == "optgroup"
        case "td" | "th" => newTag == "td" || newTag == "th" || newTag == "tr"
        case "tr" => newTag == "tr"
        case _ => false
      }

    private def runAutoClose(newTag: String): Unit = {
      while (stack.length > 1 && autoClosedBy(newTag, cur.tag))
        stack.remove(stack.length - 1)
    }

    private def startTag(name: String, attrPairs: mutable.ArrayBuffer[(String, String)]): Unit = {
      name match {
        case "html" =>
          ensureRoot()
          if (attrPairs != null) attrPairs.foreach { case (k, v) =>
            if (root.attr(k) == null) root.setAttr(k, v)
          }
          return
        case "head" =>
          if (!inBody) { ensureHead(); if (attrPairs != null)
            attrPairs.foreach { case (k, v) => head.setAttr(k, v) } }
          return
        case "body" =>
          ensureBody()
          if (attrPairs != null) attrPairs.foreach { case (k, v) =>
            if (body.attr(k) == null) body.setAttr(k, v)
          }
          return
        case _ =>
      }

      if (!inBody && headOnly.contains(name)) {
        ensureHead()
        val n = mkNode(name, attrPairs)
        n.parent = head
        head.children += n
        if (!voidElements.contains(name)) stack += n
        // raw-text consumption (script/style/title) reads `cur`
        if (rawText.contains(name) || rcdata.contains(name)) {
          // handled by caller via consumeRawText; make it the current node
        }
        return
      }

      ensureBody()

      runAutoClose(name)

      val n = mkNode(name, attrPairs)
      appendNode(n)
      if (!voidElements.contains(name)) stack += n
    }

    private def mkNode(name: String, attrPairs: mutable.ArrayBuffer[(String, String)]): Node = {
      val n = new Node(name)
      if (attrPairs != null) attrPairs.foreach { case (k, v) => n.setAttr(k, v) }
      n
    }

    private def endTag(name: String): Unit = {
      name match {
        case "html" | "head" => return // structural; never popped explicitly
        case "body" => return
        case "br" =>
          return // '</br>' ignored (libxml2 drops it)
        case _ =>
      }
      if (!inBody) {
        // closing a head-only element
        var i = stack.length - 1
        while (i >= 1) {
          if (stack(i).tag == name) {
            while (stack.length > i) stack.remove(stack.length - 1)
            return
          }
          i -= 1
        }
        return
      }
      // find matching open element; ignore if none (error tolerance)
      var i = stack.length - 1
      while (i >= 0) {
        val t = stack(i)
        if (t.tag == name) {
          if (t eq body) return
          if (t eq root) return
          while (stack.length > i) stack.remove(stack.length - 1)
          return
        }
        i -= 1
      }
    }
  }
}
