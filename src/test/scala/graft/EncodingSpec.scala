package graft

import graft.extract.{Document, Encodings}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.{Charset, StandardCharsets}

/** Charset sniffing (SURVEY §2a S2, reference encoding.py:4-23): UTF-8
  * fast path with the 1% loss budget, the <10-byte ascii rule, BOMs, and
  * the deterministic cp1251/cp1252 stand-in for chardet. */
class EncodingSpec extends AnyFunSuite {

  private def b(s: String, cs: Charset) = s.getBytes(cs)

  test("short or markup-only pages are ascii") {
    assert(Encodings.getEncoding("<p></p>".getBytes) == "ascii")
    assert(Encodings.getEncoding("hi".getBytes) == "ascii")
    assert(Encodings.getEncoding(Array.emptyByteArray) == "ascii")
  }

  test("clean utf-8 with multibyte content") {
    val page = "<html><body><p>über café — naïve жизнь of text</p></body></html>"
    assert(Encodings.getEncoding(b(page, StandardCharsets.UTF_8)) == "utf-8")
  }

  test("utf-8 tolerates <1% malformed bytes (the reference's loss budget)") {
    val good = ("word " * 200) + "ééé"
    val bytes = b(s"<html><body>$good</body></html>", StandardCharsets.UTF_8) :+ 0xfe.toByte
    assert(Encodings.getEncoding(bytes) == "utf-8")
  }

  test("cyrillic cp1251 page detected") {
    val page = "<html><body>Жизнь прекрасна и удивительна каждый день</body></html>"
    assert(Encodings.getEncoding(b(page, Charset.forName("windows-1251"))) == "windows-1251")
  }

  test("latin-1/cp1252 page detected") {
    val page = "<html><body>der große Bär läuft über die straße und trinkt café jeden morgen dort</body></html>"
    assert(Encodings.getEncoding(b(page, Charset.forName("windows-1252"))) == "windows-1252")
  }

  test("BOMs decide outright") {
    val utf8bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++
      b("<p>plenty of body text here to pass the length gate</p>", StandardCharsets.UTF_8)
    assert(Encodings.getEncoding(utf8bom) == "utf-8")
    val utf16 = b("<p>plenty of body text here to pass the length gate</p>", StandardCharsets.UTF_16LE)
    assert(Encodings.getEncoding(Array(0xff.toByte, 0xfe.toByte) ++ utf16) == "utf-16le")
  }

  test("byte-payload Document extracts through the decode path") {
    val body = ("wörter und sätze mit umlauten im fließtext " * 12).trim
    val html = s"<html><head><title>T</title></head><body><div class='article-content'>" +
      s"<p>$body</p><p>$body</p></div></body></html>"
    val viaString = Document(html).summary().text
    val via1252 = Document(b(html, Charset.forName("windows-1252")), null).summary().text
    val viaUtf8 = Document(b(html, StandardCharsets.UTF_8), null).summary().text
    assert(via1252 == viaString)
    assert(viaUtf8 == viaString)
    assert(viaString.contains("umlauten"))
  }

  test("replacement decode never throws on arbitrary bytes") {
    val junk = Array.tabulate[Byte](4096)(i => ((i * 131 + 17) % 251).toByte)
    val s = Encodings.decodePage(junk)
    assert(s.nonEmpty)
  }
}
