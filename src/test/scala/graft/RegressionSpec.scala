package graft

import graft.dom.HtmlParser
import graft.extract.{Cleaners, ExtractOptions, Extractor}
import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The reference's 15-case regression corpus
  * (/root/reference/regression_test_data/, harness
  * /root/reference/regression_test.py): per case, extract the mirrored
  * original page and compare the extracted text against the text of the
  * golden `.rdbl` readability output — exact text equality, stricter than
  * the reference's htmldiff drift meter (north rule). */
class RegressionSpec extends AnyFunSuite {

  private val root = new File(getClass.getResource("/regression").toURI)

  private def readFile(f: File): String =
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)

  /** Text of an .rdbl golden fragment: parsed with our DOM, then
    * whitespace-normalized the same way as the engine output. */
  private def goldenText(rdbl: String): String = {
    val frag = HtmlParser.parseFragment(rdbl)
    Cleaners.normalizeSpaces(frag.textContent)
  }

  private val cases: Seq[File] =
    root.listFiles().filter(_.isDirectory).sortBy(_.getName).toSeq

  for (caseDir <- cases) {
    test(s"regression ${caseDir.getName}") {
      val meta = readFile(new File(caseDir, "meta.txt")).split("\n")
      val url = meta(0).trim
      val original = readFile(new File(caseDir, "original.html"))
      val expected = goldenText(readFile(new File(caseDir, "expected.rdbl")))
      val summary = Extractor.extract(original, ExtractOptions(url = url))
      assert(!summary.failed, "extraction failed")
      assert(summary.text == expected, {
        val a = summary.text
        val b = expected
        val diffAt = a.zip(b).indexWhere { case (x, y) => x != y }
        val at = if (diffAt < 0) math.min(a.length, b.length) else diffAt
        val ctx = 120
        s"""|text mismatch at char $at (got ${a.length} chars, want ${b.length})
            |got : …${a.slice(math.max(0, at - ctx), at + ctx)}…
            |want: …${b.slice(math.max(0, at - ctx), at + ctx)}…""".stripMargin
      })
    }
  }
}
