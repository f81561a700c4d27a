package graft

import graft.extract.{Pages, PyUrl}
import org.scalatest.funsuite.AnyFunSuite

/** Port of TestFindBaseUrl
  * (/root/reference/readability/readability_test.py:4-128). */
class UrlSpec extends AnyFunSuite {

  private def check(url: String, expected: String): Unit =
    assert(Pages.findBaseUrl(url) == expected, s"for $url")

  test("none") { assert(Pages.findBaseUrl(null) == null) }

  test("no change") {
    check("http://foo.com/article", "http://foo.com/article")
  }

  test("extension stripping") {
    check("http://foo.com/article.html", "http://foo.com/article")
    check("http://foo.com/path/to/article.html", "http://foo.com/path/to/article")
    check("http://foo.com/article.123not", "http://foo.com/article.123not")
    check("http://foo.com/path/to/article.123not", "http://foo.com/path/to/article.123not")
  }

  test("ew-cms") {
    check("http://www.ew.com/ew/article/0,,20313460_20369436,00.html",
      "http://www.ew.com/ew/article/0,,20313460_20369436")
  }

  test("page numbers") {
    check("http://foo.com/page5.html", "http://foo.com")
    check("http://foo.com/path/to/page5.html", "http://foo.com/path/to")
    check("http://foo.com/article-5.html", "http://foo.com/article")
  }

  test("numbers") {
    check("http://foo.com/5.html", "http://foo.com")
    check("http://foo.com/path/to/5.html", "http://foo.com/path/to")
  }

  test("index") {
    check("http://foo.com/index.html", "http://foo.com")
    check("http://foo.com/path/to/index.html", "http://foo.com/path/to")
  }

  test("short") {
    check("http://foo.com/en/1234567890", "http://foo.com/1234567890")
    check("http://foo.com/en/de/1234567890", "http://foo.com/en/1234567890")
  }

  test("urljoin basics") {
    assert(PyUrl.urljoin("http://basic.com/article.html", "?pagewanted=2") ==
      "http://basic.com/article.html?pagewanted=2")
    assert(PyUrl.urljoin("http://a.com/b/c.html", "d.html") == "http://a.com/b/d.html")
    assert(PyUrl.urljoin("http://a.com/b/c.html", "/x/y") == "http://a.com/x/y")
    assert(PyUrl.urljoin("http://a.com/b/c.html", "http://z.com/q") == "http://z.com/q")
    assert(PyUrl.urljoin("http://a.com/b/", "../up.html") == "http://a.com/up.html")
    assert(PyUrl.urljoin("http://a.com/b/c.html", "#frag") == "http://a.com/b/c.html#frag")
  }
}

/** Conformance table generated from Python's urllib.parse.urljoin
  * (equivalent to the Py2 urlparse the reference uses for http URLs). */
class UrlJoinConformanceSpec extends AnyFunSuite {
  test("urljoin agrees with Python urllib on 140 cases") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/urljoin_cases.tsv"), "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    var mismatches = List.empty[String]
    lines.foreach { line =>
      val parts = line.split("\t", -1)
      val (base, ref, want) = (parts(0), parts(1), parts(2))
      val got = PyUrl.urljoin(base, ref)
      if (got != want) mismatches ::= s"urljoin($base, $ref) = $got, want $want"
    }
    assert(mismatches.isEmpty, mismatches.take(10).mkString("\n"))
  }
}
