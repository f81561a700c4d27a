package graft.extract

import graft.dom.{HtmlParser, Node, Serializer}

import scala.collection.mutable

/** Extraction options — the live option keys of the reference
  * (/root/reference/readability/readability.py:690-706).
  *
  * Scoring-gate note: the CURRENT reference reads the never-set
  * `min_text_len` option at readability.py:406 (Py2 `len < None` is always
  * False ⇒ gate off), but the golden fixture corpus was generated when the
  * 25-char gate was LIVE (slate-001's ranking requires it; the option-key
  * typo postdates the fixtures). The north rule targets fixture equality,
  * so [[Extractor.scoreParagraphs]] keeps the gate at `minTextLength`.
  */
final case class ExtractOptions(
    minTextLength: Int = 25,
    retryLength: Int = 250,
    url: String = null)

/** Result of extraction, mirroring `Summary(confidence, html)`
  * (/root/reference/readability/readability.py:678-687) plus the engine's
  * additions: extracted plain text (whitespace-normalized) and per-block
  * character spans into it (north star). */
final case class Summary(
    confidence: Double,
    html: String,
    text: String,
    spans: Array[(Int, Int)],
    failed: Boolean)

/** The readability extraction pipeline, re-derived from
  * /root/reference/readability/readability.py as pure Scala over our DOM.
  * All quirks of the reference that shaped its golden fixtures are
  * replicated deliberately; each is cited. Stateless; safe to call from many
  * threads (one call per transcript turn inside `mapPartitions`).
  */
object Extractor {

  private class UnparseableException(msg: String) extends RuntimeException(msg)

  // ---------- public API ----------

  /** `Document(input, url=...).summary()` equivalent — the flagship path.
    * The reference's multi-page tail is dead code behind an early return
    * (readability.py:731-733); only page_0 is produced (SURVEY.md §2k). */
  def extract(html: String, opts: ExtractOptions = ExtractOptions()): Summary = {
    try {
      val doc = parse(html, opts.url)
      getArticle(doc, opts)
    } catch {
      case _: StackOverflowError => Summary(0.0, null, "", Array.empty, failed = true)
      case scala.util.control.NonFatal(_) => Summary(0.0, null, "", Array.empty, failed = true)
    }
  }

  /** Multi-page `summary()` as it behaved when the golden fixtures were
    * generated: page-0 extraction, then follow next-page links through the
    * supplied fetcher, wrapping each page in
    * `<div id="page-N" class="article-page">` under `<div id="article">`
    * with first-paragraph duplicate suppression
    * (/root/reference/readability/readability.py:724-749 +
    * multi_page.py:367-401). The current reference early-returns page-0
    * (readability.py:731-733 — the flagship [[extract]] path); the fixtures
    * under regression_test_data/ predate both that early return and the
    * MAX_PAGES bound (arstechnica-002's golden has 19 pages), so
    * `maxPages` defaults to unbounded here.
    */
  def extractMultiPage(html: String, opts: ExtractOptions,
      fetch: String => Option[String],
      maxPages: Int = Int.MaxValue): Summary = {
    try {
      val doc = parse(html, opts.url)
      val parsedUrls = mutable.Set.empty[String]
      if (opts.url != null) parsedUrls += opts.url
      // next-page detection runs on the FRESH doc, before get_article's
      // ruthless pass removes pagination blocks and moves the article out —
      // the same find-then-extract order append_next_page uses
      // (multi_page.py:386-388); the goldens' 5-page chains require it
      val nextPageUrl = Pages.findNextPageUrl(parsedUrls, opts.url, doc)
      val page0 = getArticle(doc, opts)
      if (page0.html == null) return page0
      val page0Doc = HtmlParser.parseFragment(page0.html)
      Pages.makePageElem(0, page0Doc)
      val articleDoc = new Node("div")
      articleDoc.setAttr("id", "article")
      articleDoc.append(page0Doc)
      if (nextPageUrl != null)
        appendNextPage(parsedUrls, 1, nextPageUrl, articleDoc, opts, fetch, maxPages)
      val outHtml = Serializer.serialize(articleDoc)
      val (text, spans) = extractTextAndSpans(articleDoc)
      Summary(page0.confidence, outHtml, text, spans, failed = false)
    } catch {
      case _: StackOverflowError => Summary(0.0, null, "", Array.empty, failed = true)
      case scala.util.control.NonFatal(_) => Summary(0.0, null, "", Array.empty, failed = true)
    }
  }

  /** `append_next_page` (multi_page.py:367-401). */
  private def appendNextPage(parsedUrls: mutable.Set[String], pageIndex: Int,
      pageUrl: String, doc: Node, opts: ExtractOptions,
      fetch: String => Option[String], maxPages: Int): Unit = {
    if (pageIndex >= maxPages) return
    val html = fetch(pageUrl) match {
      case Some(h) => h
      case None => return // fetch failure swallowed (multi_page.py:381-385)
    }
    val origPageDoc = parse(html, pageUrl)
    val nextPageUrl = Pages.findNextPageUrl(parsedUrls, pageUrl, origPageDoc)
    val pageArticle = getArticle(origPageDoc, opts.copy(url = pageUrl))
    if (pageArticle.html == null) return
    val pageDoc = HtmlParser.parseFragment(pageArticle.html)
    Pages.makePageElem(pageIndex, pageDoc)
    if (!Pages.isSuspectedDuplicate(doc, pageDoc)) {
      doc.append(pageDoc)
      if (nextPageUrl != null)
        appendNextPage(parsedUrls, pageIndex + 1, nextPageUrl, doc, opts, fetch, maxPages)
    }
  }

  /** `parse(input, url)` (/root/reference/readability/htmls.py:127-135):
    * DOM parse → Cleaner pass (P1) → link absolutization. */
  def parse(html: String, url: String = null): Node = {
    val doc = HtmlParser.parse(html)
    Cleaners.cleanHtml(doc)
    if (url != null) makeLinksAbsolute(doc, url)
    else resolveBaseHref(doc)
    doc
  }

  // ---------- scalar helpers ----------

  /** `text_length` (readability.py:44-45) — streaming, zero-allocation
    * (hot path: called per node per decision). */
  def textLength(n: Node): Int = Cleaners.cleanLength(n)

  /** `class_weight` (readability.py:47-63). */
  def classWeight(e: Node): Int = {
    var weight = 0
    val cls = e.attr("class")
    if (cls != null && cls.nonEmpty) {
      if (Regexes.search(Regexes.negative, cls)) weight -= 25
      if (Regexes.search(Regexes.positive, cls)) weight += 25
    }
    val id = e.attr("id")
    if (id != null && id.nonEmpty) {
      if (Regexes.search(Regexes.negative, id)) weight -= 25
      if (Regexes.search(Regexes.positive, id)) weight += 25
    }
    weight
  }

  /** `score_node` tag prior + class weight (readability.py:65-79). */
  def scoreNode(elem: Node): Double = {
    var s = classWeight(elem).toDouble
    elem.tag match {
      case "div" => s += 5
      case "pre" | "td" | "blockquote" => s += 3
      case "address" | "ol" | "ul" | "dl" | "dd" | "dt" | "li" | "form" => s -= 3
      case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" | "th" => s -= 5
      case _ =>
    }
    s
  }

  /** Single-pass subtree statistics: total clean text length, summed
    * per-anchor clean text lengths (each `.//a` measured independently,
    * nested anchors counted repeatedly — exactly
    * `sum(text_length(a) for a in findall('.//a'))`), and descendant tag
    * counts for sanitize. One walk replaces the reference's ~9 subtree
    * traversals per judged node. */
  final case class SubtreeStats(textLen: Int, linkLen: Int,
      p: Int, img: Int, li: Int, a: Int, embed: Int, input: Int)

  def subtreeStats(elem: Node): SubtreeStats = {
    val root = new Cleaners.CleanLengthCounter
    val active = new mutable.ArrayBuffer[Cleaners.CleanLengthCounter](2)
    var linkLen = 0
    var nP = 0; var nImg = 0; var nLi = 0; var nA = 0; var nEmbed = 0; var nInput = 0
    def feed(s: String): Unit = {
      root.accept(s)
      var i = 0
      while (i < active.length) { active(i).accept(s); i += 1 }
    }
    def walk(n: Node): Unit = {
      if (n.isElement && n.text != null) feed(n.text)
      var i = 0
      while (i < n.children.length) {
        val c = n.children(i)
        var isA = false
        if (c.isElement) {
          c.tag match {
            case "p" => nP += 1
            case "img" => nImg += 1
            case "li" => nLi += 1
            case "a" => nA += 1; isA = true
            case "embed" => nEmbed += 1
            case "input" => nInput += 1
            case _ =>
          }
        }
        if (isA) active += new Cleaners.CleanLengthCounter
        walk(c)
        if (isA) {
          val cnt = active.remove(active.length - 1)
          linkLen += cnt.result
        }
        if (c.tail != null) feed(c.tail)
        i += 1
      }
    }
    walk(elem)
    SubtreeStats(root.result, linkLen, nP, nImg, nLi, nA, nEmbed, nInput)
  }

  /** `get_link_density` (readability.py:381-388) — single pass. */
  def linkDensity(elem: Node): Double = {
    val s = subtreeStats(elem)
    s.linkLen.toDouble / math.max(s.textLen, 1)
  }

  // ---------- P4: remove_unlikely_candidates ----------

  /** Replicates lxml's `doc.iter()` mutation semantics exactly
    * (readability.py:369-379): lxml's depth-first iterator precomputes the
    * next node from the current one BEFORE the loop body runs, so dropping
    * the current element makes iteration descend into the *detached*
    * subtree and terminate at its end (the detached root has no parent to
    * walk up through). A dropped childless element does not disturb
    * iteration. This quirk shaped the golden fixtures and is preserved. */
  def removeUnlikelyCandidates(doc: Node): Unit = {
    def nextOf(top: Node, n: Node): Node = {
      if (n.children.nonEmpty) return n.children(0)
      var c = n
      while (c != null && !(c eq top)) {
        val p = c.parent
        if (p == null) return null
        val i = p.children.indexOf(c)
        if (i >= 0 && i + 1 < p.children.length) return p.children(i + 1)
        c = p
      }
      null
    }
    var current: Node = doc
    while (current != null) {
      val nxt = nextOf(doc, current)
      if (current.isElement) {
        val s = current.attrOr("class", "") + " " + current.attrOr("id", "")
        if (Regexes.search(Regexes.unlikelyCandidates, s) &&
          !Regexes.search(Regexes.okMaybeItsACandidate, s) &&
          current.tag != "body" &&
          current.parent != null) {
          current.dropTree()
        }
      }
      current = nxt
    }
  }

  // ---------- P5-P9: double-break and misused-div transforms ----------

  /** A "part" is either a string or an element
    * (readability.py:81-137). */
  private type Part = Either[String, Node]

  /** `split_into_parts` — destroys `.text` and child tails
    * (readability.py:125-137). */
  def splitIntoParts(elem: Node): mutable.ArrayBuffer[Part] = {
    val parts = new mutable.ArrayBuffer[Part]
    if (elem.text != null) { parts += Left(elem.text); elem.text = null }
    elem.children.foreach { child =>
      parts += Right(child)
      if (child.tail != null) { parts += Left(child.tail); child.tail = null }
    }
    parts
  }

  /** `mark_if_whitespace` (readability.py:168-191). */
  def markIfWhitespace(parts: collection.Seq[Part], left: Int, right: Int): Set[Int] = {
    var onlyWs = true
    var i = left + 1
    while (onlyWs && i < right) {
      parts(i) match {
        case Left(s) => if (Cleaners.strip(s).nonEmpty) onlyWs = false
        case Right(_) => onlyWs = false
      }
      i += 1
    }
    if (onlyWs) (left + 1 until right).toSet else Set.empty
  }

  /** `squeeze_breaks` (readability.py:193-225). */
  def squeezeBreaks(parts: mutable.ArrayBuffer[Part]): mutable.ArrayBuffer[Part] = {
    val breaks = parts.zipWithIndex.collect {
      case (Right(n), i) if n.tag == "br" => i
    }
    var leftBreak = -1
    val marked = mutable.Set.empty[Int]
    breaks.foreach { b =>
      if (leftBreak < 0) leftBreak = b
      else {
        marked ++= markIfWhitespace(parts, leftBreak, b)
        leftBreak = b
      }
    }
    val out = new mutable.ArrayBuffer[Part](parts.length)
    parts.zipWithIndex.foreach { case (p, i) => if (!marked.contains(i)) out += p }
    out
  }

  /** `make_paragraph_from_parts` (readability.py:145-166). Returns null when
    * the paragraph would be empty (whitespace-only strings are then LOST —
    * they were already detached by split_into_parts; fixture-relevant). */
  def makeParagraphFromParts(parts: collection.Seq[Part]): Node = {
    val p = new Node("p")
    var lastElement: Node = null
    parts.foreach {
      case Left(s) =>
        if (lastElement == null) p.text = (if (p.text == null) "" else p.text) + s
        else lastElement.tail = (if (lastElement.tail == null) "" else lastElement.tail) + s
      case Right(n) =>
        p.append(n)
        lastElement = n
    }
    if ((p.text == null || Cleaners.strip(p.text).isEmpty) && p.children.isEmpty) null
    else p
  }

  private def insertP(parent: Node, atElem: Node, parts: mutable.ArrayBuffer[Part]): Unit = {
    val p = makeParagraphFromParts(parts)
    if (p != null) {
      val index = parent.indexOf(atElem)
      parent.insert(index, p)
    }
    parts.clear()
  }

  private def appendP(parent: Node, parts: mutable.ArrayBuffer[Part]): Unit = {
    val p = makeParagraphFromParts(parts)
    if (p != null) parent.append(p)
    parts.clear()
  }

  private val doubleBreakBlockTags: Set[String] =
    Set("h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "div", "img", "p",
      "pre", "table")

  /** `transform_double_breaks_into_paragraphs_elem` — the 2-state FSM
    * (readability.py:250-308). */
  def transformDoubleBreaksElem(elem: Node): Unit = {
    val START = 0; val BR = 1
    var state = START
    var firstBr: Node = null
    val acc = new mutable.ArrayBuffer[Part]
    val parts = squeezeBreaks(splitIntoParts(elem))
    parts.foreach { part =>
      if (state == START) {
        part match {
          case Left(s) => acc += Left(s)
          case Right(n) =>
            if (n.tag == "br") { firstBr = n; state = BR }
            else if (doubleBreakBlockTags.contains(n.tag)) insertP(elem, n, acc)
            else acc += Right(n)
        }
      } else { // BR
        part match {
          case Left(s) =>
            acc += Right(firstBr)
            acc += Left(s)
          case Right(n) =>
            if (n.tag == "br") {
              firstBr.dropTree()
              insertP(elem, n, acc)
              n.dropTree()
            } else if (doubleBreakBlockTags.contains(n.tag)) {
              acc += Right(firstBr)
              insertP(elem, n, acc)
            } else {
              acc += Right(firstBr)
              acc += Right(n)
            }
        }
        state = START
        firstBr = null
      }
    }
    appendP(elem, acc)
  }

  /** `transform_double_breaks_into_paragraphs` (readability.py:310-359) —
    * applied to every div, like the reference. Note the FSM's BLOCK_TAGS
    * set (readability.py:262-265) lacks HTML5 elements, so an `<article>`
    * child gets wrapped into a generated `<p>` — the goldens rely on this
    * (slate-000's winning candidate is such a generated giant `<p>`). */
  def transformDoubleBreaks(doc: Node): Unit =
    doc.findAll("div").foreach(transformDoubleBreaksElem)

  /** `transform_misused_divs_into_paragraphs` (readability.py:361-367):
    * divs whose *serialized* children don't match divToPElementsRe are
    * retagged <p>. The regex has a quirk — `<a` also matches `<abbr>` and
    * `<address>`, i.e. anchors (and any a-/p-prefixed tag) count as
    * block; running the regex on serialized children preserves that. */
  def transformMisusedDivs(doc: Node): Unit = {
    doc.findAll("div").foreach { elem =>
      if (!childrenMatchBlockRegex(elem))
        elem.tag = "p"
    }
  }

  // memo: tag name -> does "<tag" match divToPElementsRe (tags repeat
  // endlessly; the set is tiny)
  private val tagBlockish = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Tree-walk equivalent of `search(divToPElementsRe,
    * serializeChildren(elem))` — the reference serializes each div's
    * children and regex-scans the HTML (readability.py:361-367), which is
    * O(subtree) allocation per div and quadratic on nested divs. The
    * serialized string can only match at: element OPEN tags (`<tag…`;
    * close tags `</` never match), raw comment/PI text, and raw-text
    * (script/style) content — everything else escapes `<` as `&lt;`
    * (dom/Serializer). So we scan the tree and apply the SAME compiled
    * pattern to exactly those fragments. Equivalence is property-tested
    * against the serialize-based oracle (TransformSpec). */
  private def childrenMatchBlockRegex(elem: Node): Boolean = {
    def matches(n: Node): Boolean = {
      if (n.isComment || n.isPi)
        n.text != null && Regexes.search(Regexes.divToPElements, n.text)
      else {
        val tagHit = tagBlockish.computeIfAbsent(n.tag,
          t => Regexes.search(Regexes.divToPElements, "<" + t))
        tagHit == java.lang.Boolean.TRUE ||
          (Serializer.isRawText(n.tag) && n.text != null &&
            Regexes.search(Regexes.divToPElements, n.text)) ||
          n.children.exists(matches)
      }
    }
    elem.children.exists(matches)
  }

  // ---------- A3/A4: score_paragraphs ----------

  /** `score_paragraphs` (readability.py:390-437). The per-paragraph length
    * gate is OFF (see ExtractOptions note); the length bonus uses Py2 floor
    * division (`inner_text_len / 100`, readability.py:419). Candidates are
    * keyed by node identity; insertion order is retained for the
    * link-density scaling pass and for deterministic tie-breaks. */
  def scoreParagraphs(doc: Node): mutable.LinkedHashMap[Node, Double] = {
    val candidates = mutable.LinkedHashMap.empty[Node, Double]
    val contributing = new mutable.ArrayBuffer[Node]

    for (tag <- Seq("p", "pre", "td"); elem <- doc.findAll(tag)) {
      val parentNode = elem.parent
      if (parentNode != null) {
        val grandParent = parentNode.parent
        val innerTextLen = Cleaners.cleanLength(elem)
        // 25-char paragraph gate (readability.py:405-407). The CURRENT
        // reference reads the never-set 'min_text_len' option (Py2
        // `len < None` is False ⇒ gate off), but the golden corpus was
        // generated with the gate LIVE (slate-001: short byline <p>s must
        // not score, else div.slb-post-creds outranks the article) — the
        // option-key typo postdates the fixtures. We follow the fixtures.
        if (innerTextLen >= 25) {
        if (!candidates.contains(parentNode)) {
          candidates(parentNode) = scoreNode(parentNode)
          contributing += parentNode
        }
        if (grandParent != null && !candidates.contains(grandParent)) {
          candidates(grandParent) = scoreNode(grandParent)
          contributing += grandParent
        }
        var contentScore = 1.0
        // commas survive clean() unchanged: count them streaming on the tree
        contentScore += Cleaners.countCommas(elem) + 1 // len(split(','))
        contentScore += math.min(innerTextLen / 100, 3) // Py2 floor div
        candidates(parentNode) = candidates(parentNode) + contentScore
        if (grandParent != null)
          candidates(grandParent) = candidates(grandParent) + contentScore / 2.0
        }
      }
    }
    // link-density scaling over the `ordered` list (readability.py:428-435)
    contributing.foreach { elem =>
      val ld = linkDensity(elem)
      candidates(elem) = candidates(elem) * (1 - ld)
    }
    candidates
  }

  private def countCommas(s: String): Int = {
    var c = 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ',') c += 1; i += 1 }
    c
  }

  /** `select_best_candidate` (readability.py:439-449) — top-1 by score.
    * Ties: the reference sorts an (unordered Py2) dict's values stably;
    * we break ties by first insertion, which is deterministic. */
  def selectBestCandidate(candidates: mutable.LinkedHashMap[Node, Double]): Candidate0 = {
    if (candidates.isEmpty) return null
    var bestElem: Node = null
    var bestScore = Double.NegativeInfinity
    candidates.foreach { case (elem, score) =>
      if (score > bestScore) { bestScore = score; bestElem = elem }
    }
    Candidate0(bestElem, bestScore)
  }

  final case class Candidate0(elem: Node, score: Double)

  // ---------- W2: sibling merge ----------

  /** `get_raw_article` (readability.py:586-629). NOTE: the per-sibling `<p>`
    * rescue reads `sibling.text` — the element's own leading text only, not
    * text_content (readability.py:616). Appending MOVES nodes out of the
    * document (lxml semantics), which shapes the lenient retry
    * (SURVEY.md §2j). */
  def getRawArticle(candidates: mutable.LinkedHashMap[Node, Double],
      best: Candidate0): Node = {
    val siblingScoreThreshold = math.max(10.0, best.score * 0.2)
    val article = new Node("div")
    article.setAttr("id", "page")
    val bestElem = best.elem
    if (bestElem.parent == null)
      throw new UnparseableException("best candidate has no parent")
    val siblings = bestElem.parent.children.toList // snapshot (getchildren())
    siblings.foreach { sibling =>
      var append = false
      if (sibling eq bestElem) append = true
      if (!append && candidates.contains(sibling) &&
        candidates(sibling) >= siblingScoreThreshold) append = true
      if (!append && sibling.tag == "p") {
        val ld = linkDensity(sibling)
        val nodeContent = if (sibling.text == null) "" else sibling.text
        val nodeLength = nodeContent.length
        if (nodeLength > 80 && ld < 0.25) append = true
        else if (nodeLength < 80 && ld == 0.0 && sentenceEnd(nodeContent))
          append = true
      }
      if (append) article.append(sibling)
    }
    article
  }

  private val sentenceEndRe = java.util.regex.Pattern.compile("\\.( |$)")
  private def sentenceEnd(s: String): Boolean = sentenceEndRe.matcher(s).find()

  // ---------- 2i: sanitize ----------

  /** `sanitize` (readability.py:456-584). Returns the serialized,
    * attribute-stripped article HTML. Structure of the conditional clean is
    * replicated code-exactly, including:
    *   - reverse document order per tag (children judged before ancestors);
    *   - `counts["li"] -= 100`; `counts["p"] / 3` floor division;
    *   - the sibling-text rescue block being nested INSIDE the `<embed>`
    *     elif branch (readability.py:523-570 — its 16-space indentation puts
    *     it in that suite), with the `i =+ 1` typo making it sample exactly
    *     one non-empty sibling per direction;
    *   - the parent-score reassignment at readability.py:488-493 being dead
    *     (only feeds logging).
    */
  def sanitize(node: Node, candidates: mutable.LinkedHashMap[Node, Double],
      opts: ExtractOptions): String = {
    for (tag <- Seq("h1", "h2", "h3", "h4", "h5", "h6");
         header <- node.findAll(tag)) {
      if (classWeight(header) < 0 || linkDensity(header) > 0.33)
        header.dropTree()
    }
    for (tag <- Seq("form", "iframe", "textarea"); el <- node.findAll(tag))
      el.dropTree()

    val allowed = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Node, java.lang.Boolean]())

    for (tag <- Seq("table", "ul", "div");
         el <- node.findAll(tag).reverseIterator) {
      if (!allowed.contains(el)) {
        val weight = classWeight(el)
        val contentScore = candidates.getOrElse(el, 0.0)

        if (weight + contentScore < 0) {
          el.dropTree()
        } else if (!Cleaners.commasAtLeast(el, 10)) {
          val st = subtreeStats(el)
          val pCount = st.p
          val imgCount = st.img
          val liCount = st.li - 100
          val inputCount = st.input
          val embedCount = st.embed
          val contentLength = st.textLen
          val ld = st.linkLen.toDouble / math.max(st.textLen, 1)

          var toRemove = false
          if (pCount > 0 && imgCount > pCount) toRemove = true
          else if (liCount > pCount && tag != "ul" && tag != "ol") toRemove = true
          else if (inputCount > floorDiv(pCount, 3)) toRemove = true
          else if (contentLength < opts.minTextLength &&
            (imgCount == 0 || imgCount > 2)) toRemove = true
          else if (weight < 25 && ld > 0.2) toRemove = true
          else if (weight >= 25 && ld > 0.5) toRemove = true
          else if ((embedCount == 1 && contentLength < 75) || embedCount > 1) {
            toRemove = true
            // sibling-text rescue — nested in this branch only (see note)
            var followingLen = -1
            val itF = el.siblingsAfter
            while (followingLen < 0 && itF.hasNext) {
              val l = textLength(itF.next())
              if (l > 0) followingLen = l
            }
            var precedingLen = -1
            val itP = el.siblingsBefore
            while (precedingLen < 0 && itP.hasNext) {
              val l = textLength(itP.next())
              if (l > 0) precedingLen = l
            }
            val sum = math.max(followingLen, 0) + math.max(precedingLen, 0)
            if ((followingLen > 0 || precedingLen > 0) && sum > 1000) {
              toRemove = false
              for (t <- Seq("table", "ul", "div"); des <- el.findAll(t))
                allowed.add(des)
            }
          }

          if (toRemove) el.dropTree()
        }
      }
    }
    val serialized = Serializer.serialize(node)
    Cleaners2.cleanAttributesString(serialized)
  }

  /** Python 2 `/` on ints floors toward negative infinity. */
  private def floorDiv(a: Int, b: Int): Int = Math.floorDiv(a, b)

  // ---------- 2j: get_article retry loop ----------

  /** `get_article` (readability.py:631-673) — ruthless pass, then on low
    * yield one lenient retry ON THE SAME MUTATED DOC (the best-candidate
    * region has already been MOVED into the discarded article; the retry
    * scores the remainder — replicated exactly). */
  def getArticle(doc: Node, opts: ExtractOptions): Summary = {
    try {
      var ruthless = true
      while (true) {
        doc.findAll("script").foreach(_.dropTree())
        doc.findAll("style").foreach(_.dropTree())
        doc.findAll("body").foreach(_.setAttr("id", "readabilityBody"))
        if (ruthless) removeUnlikelyCandidates(doc)
        transformDoubleBreaks(doc)
        transformMisusedDivs(doc)
        val candidates = scoreParagraphs(doc)
        val best = selectBestCandidate(candidates)
        if (best == null) {
          if (ruthless) { ruthless = false }
          else return Summary(0.0, null, "", Array.empty, failed = false)
        } else {
          val confidence = best.score
          val article = getRawArticle(candidates, best)
          val sanitized = sanitize(article, candidates, opts)
          // the reference REPARSES the sanitized string
          // (fragment_fromstring → tounicode, readability.py:661-662); this
          // matters: divs retagged <p> whose block children then pop out of
          // the <p> on reparse (p auto-close) — visible in the goldens
          val cleanedDoc = HtmlParser.parseFragment(sanitized)
          val cleanedArticle = Serializer.serialize(cleanedDoc)
          val acceptable = cleanedArticle.length >= opts.retryLength
          if (ruthless && !acceptable) { ruthless = false }
          else {
            val (text, spans) = extractTextAndSpans(cleanedDoc)
            return Summary(confidence, cleanedArticle, text, spans, failed = false)
          }
        }
      }
      throw new IllegalStateException("unreachable")
    } catch {
      case e: UnparseableException => throw e
      case scala.util.control.NonFatal(e) => throw new UnparseableException(String.valueOf(e))
    }
  }

  // ---------- debug helpers (F9 describe, T2 top-5 slice) ----------

  /** Debug node-path string — the reference's `describe`
    * (/root/reference/readability/readability.py:22-33): tag plus `#id`
    * and `.class` (spaces → dots), a leading `div` elided before the
    * marker, and — while `depth` > 0 and a parent exists — the parent's
    * description appended after " - ". Debug-only (F9): never on the
    * extraction path; used by [[debugCandidates]] and RegressionSpec
    * failure messages to name a diverging candidate the way the
    * reference's logs would. */
  def describe(node: Node, depth: Int = 1): String = {
    if (node == null) return "[null]"
    if (!node.isElement) return s"[${node.tag}]"
    var name = node.tag
    val id = node.attrOr("id", "")
    if (id.nonEmpty) name += "#" + id
    val cls = node.attrOr("class", "")
    if (cls.nonEmpty) name += "." + cls.replace(" ", ".")
    if (name.length >= 4 && (name.substring(0, 4) == "div#" || name.substring(0, 4) == "div."))
      name = name.substring(3)
    if (depth > 0 && node.parent != null)
      name + " - " + describe(node.parent, depth - 1)
    else name
  }

  /** Top-`n` candidate debug slice — the reference's per-extraction log
    * line (readability.py:441-443, T2): run the ruthless preprocessing
    * and scoring passes of [[getArticle]] on a fresh parse and name the
    * best-scored candidates via [[describe]]. Stable sort, so tied
    * scores keep candidate-map insertion order exactly as Python's
    * `sorted(..., reverse=True)` does. */
  def debugCandidates(html: String, opts: ExtractOptions = ExtractOptions(),
      n: Int = 5): Seq[(String, Double)] = {
    val doc = parse(html, opts.url)
    doc.findAll("script").foreach(_.dropTree())
    doc.findAll("style").foreach(_.dropTree())
    doc.findAll("body").foreach(_.setAttr("id", "readabilityBody"))
    removeUnlikelyCandidates(doc)
    transformDoubleBreaks(doc)
    transformMisusedDivs(doc)
    scoreParagraphs(doc).toSeq.sortBy { case (_, s) => -s }.take(n)
      .map { case (e, s) => (describe(e, depth = 1), s) }
  }

  // ---------- engine addition: text + spans ----------

  /** Tags that do NOT force a word boundary in extracted text. Everything
    * else (div, p, headers, list items, table cells, br, …) acts as a block
    * boundary: a single space separates its text from neighbors. This makes
    * extracted text robust to whether parse-level whitespace-only nodes
    * between blocks were retained — libxml2's blank-dropping varied across
    * the era the goldens were generated in — and is the behavior a
    * training-data pipeline wants (no word-joins across paragraphs). The
    * SAME function must normalize the golden fixture side. */
  private val inlineTags: Set[String] = Set(
    "a", "abbr", "acronym", "b", "bdi", "bdo", "big", "cite", "code", "data",
    "del", "dfn", "em", "font", "i", "ins", "kbd", "label", "mark", "nobr",
    "q", "rb", "rp", "rt", "ruby", "s", "samp", "small", "span", "strike",
    "strong", "sub", "sup", "time", "tt", "u", "var", "wbr", "img")

  /** Normalized extracted text (whitespace runs collapsed, block-boundary
    * separators) with, for each top-level block of the article, its
    * (start, end) character span — the engine's span addition (north star;
    * FIXTURES.md §4). */
  def extractTextAndSpans(article: Node): (String, Array[(Int, Int)]) = {
    val sb = new java.lang.StringBuilder
    var pendingSpace = false
    def boundary(): Unit = { if (sb.length > 0) pendingSpace = true }
    def add(s: String): Unit = {
      if (s == null) return
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Cleaners.pyIsSpace(c)) { if (sb.length > 0) pendingSpace = true }
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
        }
        i += 1
      }
    }
    def walk(n: Node): Unit = {
      if (!n.isElement) return
      val isBlock = !inlineTags.contains(n.tag)
      if (isBlock) boundary()
      if (n.text != null) add(n.text)
      n.children.foreach { c =>
        walk(c)
        if (c.tail != null) add(c.tail)
      }
      if (isBlock) boundary()
    }
    val spans = new mutable.ArrayBuffer[(Int, Int)]
    if (article.isElement && article.text != null) add(article.text)
    article.children.foreach { c =>
      val start0 = sb.length + (if (pendingSpace) 1 else 0)
      walk(c)
      val end = sb.length
      if (end > start0) spans += ((start0, end))
      if (c.tail != null) add(c.tail)
    }
    (sb.toString, spans.toArray)
  }

  /** The normalized text of any fragment under the same rules as
    * [[extractTextAndSpans]] — used to normalize golden fixtures
    * identically to engine output. */
  def normalizedText(fragment: Node): String = extractTextAndSpans(fragment)._1

  // ---------- link absolutization (htmls.py:130-134) ----------

  private val urlAttrs = List("href", "src", "action", "background", "cite",
    "poster", "usemap", "longdesc")

  /** lxml `resolve_base_href()`: apply `<base href>` to all links, then
    * drop the base tags. */
  def resolveBaseHref(doc: Node): Unit = {
    val bases = doc.findAll("base")
    val baseHref = bases.collectFirst {
      case b if b.attr("href") != null && b.attr("href").nonEmpty => b.attr("href")
    }
    bases.foreach(_.dropTree())
    baseHref.foreach(b => rewriteLinks(doc, u => PyUrl.urljoin(b, u)))
  }

  /** lxml `make_links_absolute(url, resolve_base_href=True)`. */
  def makeLinksAbsolute(doc: Node, url: String): Unit = {
    resolveBaseHref(doc)
    rewriteLinks(doc, u => PyUrl.urljoin(url, u))
  }

  private def rewriteLinks(doc: Node, f: String => String): Unit = {
    doc.iterSubtree.foreach { n =>
      if (n.isElement && n.hasAttrs) {
        urlAttrs.foreach { a =>
          val v = n.attr(a)
          if (v != null && v.nonEmpty) {
            try n.setAttr(a, f(v))
            catch { case scala.util.control.NonFatal(_) => }
          }
        }
      }
    }
  }
}

/** String-level `clean_attributes` (/root/reference/readability/cleaners.py:5-20)
  * applied to serialized HTML exactly like the reference (regex loop to
  * fixpoint), preserving its quirks: only *valued*, space-preceded
  * attributes are stripped; `on*` means `o` followed by `n`s; empty
  * quoted values survive. */
object Cleaners2 {
  private val htmlstrip = java.util.regex.Pattern.compile(
    "<" +
      "([^>]+) " +
      "(?:width|height|style|[-a-z]*color|background[-a-z]*|on*) *" +
      "= *(?:[^ \"'>]+|'[^']+'|\"[^\"]+\")" +
      "([^>]*)" +
      ">",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  def cleanAttributesString(html: String): String = {
    var h = html
    var m = htmlstrip.matcher(h)
    while (m.find()) {
      h = m.replaceAll("<$1$2>")
      m = htmlstrip.matcher(h)
    }
    h
  }
}
