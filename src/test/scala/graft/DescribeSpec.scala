package graft

import graft.dom.HtmlParser
import graft.extract.{ExtractOptions, Extractor}
import org.scalatest.funsuite.AnyFunSuite

/** F9 `describe` parity (readability.py:22-33) and the T2 top-5 debug
  * slice (readability.py:441-443) — table cases mirror the Python rules:
  * #id and .class suffixes (spaces → dots), a leading `div` elided
  * before the marker, one parent level by default. */
class DescribeSpec extends AnyFunSuite {

  private def elemOf(html: String, tag: String) =
    HtmlParser.parse(html).findAll(tag).head

  test("describe: tag, id, class, div elision, parent chain") {
    val d = elemOf("<html><body><div id='main'><p class='a b'>x</p></div></body></html>", "p")
    // class spaces become dots; one parent level; div#main loses its div
    assert(Extractor.describe(d) == "p.a.b - #main")
    assert(Extractor.describe(d, depth = 0) == "p.a.b")
    // div with BOTH id and class: id binds first, 'div' still elided
    val dv = elemOf("<html><body><div id='m' class='c'>x</div></body></html>", "div")
    assert(Extractor.describe(dv, depth = 0) == "#m.c")
    // non-div keeps its tag before the marker
    val sp = elemOf("<html><body><span id='s'>x</span></body></html>", "span")
    assert(Extractor.describe(sp, depth = 0) == "span#s")
    // bare div with no id/class is NOT elided (name[:4] check fails)
    val bare = elemOf("<html><body><div>x</div></body></html>", "div")
    assert(Extractor.describe(bare, depth = 0) == "div")
  }

  test("debugCandidates: names the winning candidate of a simple page") {
    val html = "<html><body><div id='content'>" +
      ("<p>" + "long enough paragraph with plenty of words, commas, and text. " * 4 + "</p>") * 3 +
      "</div><div id='sidebar'><p>tiny</p></div></body></html>"
    val top = Extractor.debugCandidates(html, ExtractOptions())
    assert(top.nonEmpty && top.size <= 5)
    // scores descend; the content div (div elided => '#content - …') wins
    assert(top.sliding(2).forall { w => w.size < 2 || w(0)._2 >= w(1)._2 })
    assert(top.head._1.startsWith("#content"), top.mkString("; "))
  }
}
