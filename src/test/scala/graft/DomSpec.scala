package graft

import graft.dom.{Entities, HtmlParser, Node, Serializer}
import org.scalatest.funsuite.AnyFunSuite

class DomSpec extends AnyFunSuite {

  test("basic parse: implied structure, text/tail model") {
    val doc = HtmlParser.parse("<html><body><div>Hello <b>World</b>!  <i>- Jerry</i> C.</div></body></html>")
    val body = doc.findFirst("body")
    assert(body != null)
    val div = body.children.head
    assert(div.tag == "div")
    assert(div.text == "Hello ")
    assert(div.children.map(_.tag).toList == List("b", "i"))
    assert(div.children(0).text == "World")
    assert(div.children(0).tail == "!  ")
    assert(div.children(1).text == "- Jerry")
    assert(div.children(1).tail == " C.")
    assert(div.textContent == "Hello World!  - Jerry C.")
  }

  test("bare fragment gets html/head/body wrapper") {
    val doc = HtmlParser.parse("<div>x</div>")
    assert(doc.tag == "html")
    assert(doc.children.map(_.tag).toList == List("head", "body"))
    assert(doc.findFirst("body").children.head.tag == "div")
  }

  test("head elements vs body content") {
    val doc = HtmlParser.parse(
      "<html><head><title>T &amp; U</title><meta charset=utf-8><link rel=x></head><body><p>hi</p></body></html>")
    val head = doc.findFirst("head")
    assert(head.findFirst("title").text == "T & U")
    assert(head.findAll("meta").nonEmpty)
    assert(doc.findFirst("body").findFirst("p").text == "hi")
  }

  test("p auto-close and void elements") {
    val doc = HtmlParser.parse("<body><p>one<p>two<br>three<hr><p>four")
    val body = doc.findFirst("body")
    val tags = body.children.map(_.tag).toList
    assert(tags == List("p", "p", "hr", "p"), tags.toString)
    assert(body.children(1).textContent == "twothree")
    assert(body.children(1).children.head.tag == "br")
  }

  test("li auto-close, table cells") {
    val doc = HtmlParser.parse("<ul><li>a<li>b</ul><table><tr><td>1<td>2<tr><td>3</table>")
    val ul = doc.findFirst("ul")
    assert(ul.children.map(_.tag).toList == List("li", "li"))
    val table = doc.findFirst("table")
    val trs = table.findAll("tr")
    assert(trs.length == 2)
    assert(trs(0).children.map(_.textContent).toList == List("1", "2"))
    assert(trs(1).children.map(_.textContent).toList == List("3"))
  }

  test("script/style raw text, comments") {
    val doc = HtmlParser.parse(
      "<body><script>if (a < b && c > d) { x(); }</script><!-- note --><style>p > a { color: red }</style><p>t</p></body>")
    val body = doc.findFirst("body")
    assert(body.findFirst("script").text == "if (a < b && c > d) { x(); }")
    assert(body.findFirst("style").text == "p > a { color: red }")
    assert(body.children.exists(_.isComment))
    assert(body.findFirst("p").text == "t")
  }

  test("unmatched end tags ignored; misnested recovery") {
    val doc = HtmlParser.parse("<body><div>a</span>b</div></p>c</body>")
    val body = doc.findFirst("body")
    assert(body.children.head.textContent == "ab")
    assert(body.children.head.tail == "c")
  }

  test("entities: named, numeric, bare ampersand") {
    assert(Entities.decode("a &amp; b &#65; &#x42; &rsquo; &nope; & c") ==
      "a & b A B ’ &nope; & c")
    val doc = HtmlParser.parse("<body><p>R&amp;D &#8212; caf&eacute;</p></body>")
    assert(doc.findFirst("p").text == "R&D — café")
  }

  test("attributes: quoting styles, case, duplicates") {
    val doc = HtmlParser.parse(
      "<body><div ID=\"Main\" class='a b' data-x=1 checked novalue>x</div></body>")
    val div = doc.findFirst("div")
    assert(div.attr("id") == "Main")
    assert(div.attr("class") == "a b")
    assert(div.attr("data-x") == "1")
    assert(div.attr("checked") == "")
  }

  test("drop_tree keeps tail") {
    val doc = HtmlParser.parse("<body><div>a<span>X</span>tail1<b>Y</b>tail2</div></body>")
    val div = doc.findFirst("div")
    doc.findFirst("span").dropTree()
    assert(div.text == "atail1")
    doc.findFirst("b").dropTree()
    assert(div.text == "atail1tail2")
    assert(div.children.isEmpty)
  }

  test("serialize round-trip stability") {
    val html = "<html><head><title>t</title></head><body><div id=\"a\" class=\"b c\">x<br>y<p>z &amp; w</p></div></body></html>"
    val doc = HtmlParser.parse(html)
    val s1 = Serializer.serialize(doc)
    val doc2 = HtmlParser.parse(s1)
    val s2 = Serializer.serialize(doc2)
    assert(s1 == s2)
  }

  test("findAll document order; textContent excludes comments") {
    val doc = HtmlParser.parse("<body><div><p>1</p><div><p>2</p></div></div><p>3<!-- c -->4</p></body>")
    val ps = doc.findAll("p").map(_.textContent).toList
    assert(ps == List("1", "2", "34"))
  }

  test("fragment parse") {
    val frag = HtmlParser.parseFragment("<div id=\"page\"><p>hello</p></div>")
    assert(frag.tag == "div")
    assert(frag.attr("id") == "page")
    assert(frag.findFirst("p").text == "hello")
  }
}
