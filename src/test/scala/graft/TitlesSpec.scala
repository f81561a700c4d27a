package graft

import graft.dom.HtmlParser
import graft.extract.Titles
import org.scalatest.funsuite.AnyFunSuite

/** Ports of htmls_test.py (get_title) plus shorten_title cascade cases
  * derived from /root/reference/readability/htmls.py:54-104. */
class TitlesSpec extends AnyFunSuite {

  private def doc(html: String) = HtmlParser.parse(html)

  test("no title → empty") {
    assert(Titles.getTitle(doc("<html><body></body></html>")) == "")
  }

  test("simple title") {
    assert(Titles.getTitle(doc("<html><head><title>test title</title></head></html>")) == "test title")
  }

  test("title normalization: dashes, nbsp, guillemets, entities") {
    assert(Titles.getTitle(doc("<html><head><title>a — b «c»</title></head></html>")) ==
      "a - b \"c\"")
    // double-escaped literals survive entity decoding and are then folded
    assert(Titles.normTitle("x &amp;mdash; y".replace("&amp;", "&")) == "x - y")
  }

  test("shorten: h1 candidate that is a substring of the title wins") {
    val d = doc("<html><head><title>The Quick Brown Fox Jumps | Example Site</title></head>" +
      "<body><h1>The Quick Brown Fox Jumps</h1></body></html>")
    assert(Titles.shortenTitle(d) == "The Quick Brown Fox Jumps")
  }

  test("shorten: delimiter split keeps the >=4-word side") {
    val d = doc("<html><head><title>One Two Three Four Five | Site</title></head><body></body></html>")
    assert(Titles.shortenTitle(d) == "One Two Three Four Five")
  }

  test("shorten: short sides fall through to ': ' rule") {
    val d = doc("<html><head><title>Site: The Actual Headline Of The Story</title></head><body></body></html>")
    assert(Titles.shortenTitle(d) == "The Actual Headline Of The Story")
  }

  test("shorten: 15<len<150 guard returns original") {
    val d = doc("<html><head><title>Tiny | A</title></head><body></body></html>")
    assert(Titles.shortenTitle(d) == "Tiny | A")
  }

  test("css id/class selectors feed candidates") {
    val d = doc("<html><head><title>Actual Headline Of Record — Publisher</title></head>" +
      "<body><div id=\"title\">Actual Headline Of Record</div></body></html>")
    assert(Titles.shortenTitle(d) == "Actual Headline Of Record")
  }
}
