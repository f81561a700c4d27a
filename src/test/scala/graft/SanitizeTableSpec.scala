package graft

import graft.extract.{ExtractOptions, Extractor}
import graft.spark.TranscriptGen
import org.scalatest.funsuite.AnyFunSuite

/** Pins the sanitize decision table (2i, readability.py:456-584) via the
  * crafted page behind `sanitize_decisions`: each keep/drop row fires and
  * the output is exactly the survivor text. */
class SanitizeTableSpec extends AnyFunSuite {

  private def text(id: Long): String =
    Extractor.extract(TranscriptGen.sanitizeHtml(id), ExtractOptions()).text

  test("survivor text is exactly the kept blocks, in document order") {
    for (id <- Seq(0L, 7L, 99999L))
      assert(text(id) === TranscriptGen.sanitizeExpected(id))
  }

  test("every vanish marker is cleaned") {
    val t = text(3)
    assert(!t.contains("vanish"))
  }

  test("each keep branch leaves its marker") {
    val t = text(3)
    // header retention, comma shield, weight>=25 link-density relaxation,
    // embed sibling rescue, long-cell table
    for (m <- Seq(TranscriptGen.SanKeptHeader, TranscriptGen.SanCommaKeep2,
        TranscriptGen.SanEntryKeep, TranscriptGen.SanRescueKeep,
        TranscriptGen.SanTableKeep))
      assert(t.contains(m), s"missing marker: $m")
  }

  test("lonely embed without the >1000-char sibling rescue drops") {
    assert(!text(5).contains("vanish lonely embed"))
  }
}
