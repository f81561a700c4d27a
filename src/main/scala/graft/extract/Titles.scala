package graft.extract

import graft.dom.Node

import scala.collection.mutable

/** Title extraction (F3–F6) — /root/reference/readability/htmls.py:23-104. */
object Titles {

  /** `normalize_entities` (htmls.py:23-38): dash/nbsp/guillemet folding on
    * the already-entity-decoded title, plus the literal strings (which can
    * appear if the source double-escaped them). */
  def normalizeEntities(t0: String): String = {
    var t = t0
    t = t.replace("\u2014", "-").replace("\u2013", "-")
    t = t.replace("&mdash;", "-").replace("&ndash;", "-")
    t = t.replace("\u00A0", " ")
    t = t.replace("\u00AB", "\"").replace("\u00BB", "\"")
    t = t.replace("&quot;", "\"")
    t
  }

  /** `norm_title` (htmls.py:40-41). */
  def normTitle(title: String): String = normalizeEntities(Cleaners.normalizeSpaces(title))

  /** `get_title` (htmls.py:43-52) — first `<title>`'s own text. */
  def getTitle(doc: Node): String = {
    val titleElem = doc.findFirst("title")
    if (titleElem == null || titleElem.text == null) return ""
    normTitle(titleElem.text)
  }

  private def addMatch(collection: mutable.LinkedHashSet[String], text0: String,
      orig: String): Unit = {
    val text = normTitle(text0)
    if (text.split(" ").count(_.nonEmpty) >= 2 && text.length >= 15) {
      if (orig.replace("\"", "").contains(text.replace("\"", "")))
        collection += text
    }
  }

  private val cssIds = List("title", "head", "heading")
  private val cssClasses = List("pageTitle", "news_title", "title", "head",
    "heading", "contentheading", "small_header_red")

  /** `shorten_title` (htmls.py:54-104): h1/h2/h3 + css-selector candidates
    * that are ≥2 words, ≥15 chars and a substring of the title; pick the
    * longest; else delimiter-split heuristics; final 15<len<150 guard.
    * Tie-break on equal length: the reference sorts a Py2 set (arbitrary
    * order) stably — we keep the first-seen longest, deterministic
    * (SURVEY.md §2f T3). */
  def shortenTitle(doc: Node): String = {
    val orig = getTitle(doc)
    if (orig.isEmpty) return ""
    var title = orig

    val candidates = mutable.LinkedHashSet.empty[String]
    for (tag <- List("h1", "h2", "h3"); e <- doc.findAll(tag)) {
      if (e.text != null && e.text.nonEmpty) addMatch(candidates, e.text, orig)
      val tc = e.textContent
      if (tc.nonEmpty) addMatch(candidates, tc, orig)
    }
    // css selectors: '#title', '#head', … then '.pageTitle', '.news_title', …
    // (htmls.py:74) — document-order per selector
    val all = doc.iterSubtree.filter(_.isElement).toVector
    for (id <- cssIds; e <- all.filter(_.attrOr("id", "") == id)) {
      if (e.text != null && e.text.nonEmpty) addMatch(candidates, e.text, orig)
      val tc = e.textContent
      if (tc.nonEmpty) addMatch(candidates, tc, orig)
    }
    for (cls <- cssClasses;
         e <- all.filter(_.attrOr("class", "").split("\\s+").contains(cls))) {
      if (e.text != null && e.text.nonEmpty) addMatch(candidates, e.text, orig)
      val tc = e.textContent
      if (tc.nonEmpty) addMatch(candidates, tc, orig)
    }

    if (candidates.nonEmpty) {
      var best: String = null
      candidates.foreach { c => if (best == null || c.length > best.length) best = c }
      title = best
    } else {
      title = delimiterPick(orig)
    }

    if (!(title.length > 15 && title.length < 150)) orig else title
  }

  /** Faithful transcription of the htmls.py:84-99 for/else block: a
    * delimiter only "breaks" when it yields a ≥4-word side; otherwise the
    * loop continues, and if it exhausts, the `': '` fallback (for/else)
    * runs. */
  private def delimiterPick(orig: String): String = {
    var title = orig
    val delims = List(" | ", " - ", " :: ", " / ")
    for (d <- delims) {
      if (title.contains(d)) {
        val parts = splitAll(orig, d)
        if (wordCount(parts.head) >= 4) return parts.head
        else if (wordCount(parts.last) >= 4) return parts.last
        // no break: continue to next delimiter
      }
    }
    // for/else: no break happened
    if (title.contains(": ")) {
      val parts = splitAll(orig, ": ")
      if (wordCount(parts.last) >= 4) title = parts.last
      else title = splitFirst(orig, ": ")
    }
    title
  }

  private def wordCount(s: String): Int = s.split(" ").count(_.nonEmpty)

  /** Python str.split(sep) — no regex, keeps empty fields. */
  private def splitAll(s: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var idx = s.indexOf(sep)
    while (idx >= 0) {
      out += s.substring(i, idx)
      i = idx + sep.length
      idx = s.indexOf(sep, i)
    }
    out += s.substring(i)
    out.result()
  }

  /** Python `s.split(sep, 1)[1]` (falls back to whole string when absent). */
  private def splitFirst(s: String, sep: String): String = {
    val idx = s.indexOf(sep)
    if (idx < 0) s else s.substring(idx + sep.length)
  }

  /** `get_body` (htmls.py:106-115): drop script|link|style, serialize body,
    * strip attributes. */
  def getBody(doc: Node): String = {
    for (t <- List("script", "link", "style"); e <- doc.findAll(t)) e.dropTree()
    val body = doc.findFirst("body")
    val target = if (body != null) body else doc
    Cleaners2.cleanAttributesString(graft.dom.Serializer.serialize(target))
  }
}
