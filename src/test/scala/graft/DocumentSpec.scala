package graft

import graft.extract.Document
import org.scalatest.funsuite.AnyFunSuite

/** The reference-parity facade: every public call a reference user makes
  * (`summary`, `content`, `title`, `short_title`) works identically. */
class DocumentSpec extends AnyFunSuite {

  private val html =
    """<html><head><title>The Quick Brown Fox Jumps | Example</title></head><body>
      |<div class="sidebar"><a href="/x">junk link farm</a></div>
      |<div class="article-content">
      |<h1>The Quick Brown Fox Jumps</h1>
      |<p>The quick brown fox jumps over the lazy dog again and again today.</p>
      |<p>Another sufficiently long paragraph with some words, commas, and more text here.</p>
      |<p>A third paragraph keeps the article comfortably past the retry threshold limit.</p>
      |</div></body></html>""".stripMargin

  test("summary extracts the article") {
    val s = Document(html).summary()
    assert(!s.failed)
    assert(s.confidence > 0)
    assert(s.text.contains("quick brown fox jumps over the lazy dog"))
    assert(!s.text.contains("junk link farm"))
    assert(s.spans.nonEmpty)
  }

  test("title and shortTitle") {
    val d = Document(html)
    assert(d.title() == "The Quick Brown Fox Jumps | Example")
    assert(d.shortTitle() == "The Quick Brown Fox Jumps")
  }

  test("content returns cleaned body html") {
    val c = Document(html).content()
    assert(c.startsWith("<body"))
    assert(c.contains("quick brown fox"))
  }

  test("multi-page summary via fetcher") {
    val page2 = html.replace("quick brown fox", "second page content body")
      .replace("sidebar", "sidebar2")
    val p1 = html.replace("</body>",
      """<div class="pager"><a class="next-page" href="http://e.com/a-1.html?page=2">Next</a></div></body>""")
    val d = new Document(p1, url = "http://e.com/a-1.html",
      urlfetch = u => if (u.endsWith("page=2")) Some(page2) else None,
      multiPage = true)
    val s = d.summary()
    assert(s.text.contains("quick brown fox"))
    assert(s.text.contains("second page content body"))
    assert(s.html.contains("id=\"page-2\""))
  }
}
