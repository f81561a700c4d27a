package graft

import graft.dom.{HtmlParser, Serializer}
import graft.extract.Extractor
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Golden DOM-to-DOM pairs for the double-break → paragraph transform
  * (TestTransformDoubleBreaksIntoParagraphs,
  * /root/reference/readability/readability_test.py:273-310). Both sides go
  * through OUR parser+serializer, so the comparison isolates the transform. */
class TransformSpec extends AnyFunSuite {

  private def res(name: String): String = {
    val p = Paths.get(getClass.getResource(s"/test_data/$name").toURI)
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
  }

  private def testOne(id: String): Unit = {
    val doc = HtmlParser.parse(res(s"double-breaks-$id-original.html"))
    Extractor.transformDoubleBreaks(doc)
    val expected = HtmlParser.parse(res(s"double-breaks-$id-expected.html"))
    val got = Serializer.serialize(doc)
    val want = Serializer.serialize(expected)
    assert(got == want, s"\n=== got ===\n$got\n=== want ===\n$want")
  }

  test("double-breaks basic") { testOne("basic") }
  test("double-breaks some-headers") { testOne("some-headers") }
  test("double-breaks proper-paragraphs") { testOne("proper-paragraphs") }
  test("double-breaks mit") { testOne("mit") }
}
