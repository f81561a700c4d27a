package graft

import graft.extract.Drift
import org.scalatest.funsuite.AnyFunSuite

/** Drift (htmldiff-parity ins/del) correctness: hand cases + a
  * deterministic random sweep against an O(N·M) LCS reference. */
class DriftSpec extends AnyFunSuite {

  test("hand cases") {
    assert(Drift.insDel("a b c", "a b c") === Drift.InsDel(0, 0, 0, 0))
    // word appended to actual → one inserted block
    assert(Drift.insDel("a b c", "a b c dd") === Drift.InsDel(1, 2, 0, 0))
    // sentence present only in expected → one deleted block, joined length
    assert(Drift.insDel("a b tail sent here", "a b") === Drift.InsDel(0, 0, 1, 14))
    // replacement in the middle → one ins and one del block
    assert(Drift.insDel("a x y b", "a p b") === Drift.InsDel(1, 1, 1, 3))
    // two separated edits → two blocks
    assert(Drift.insDel("a b c d e", "a X b c d Y e") === Drift.InsDel(2, 2, 0, 0))
    assert(Drift.insDel("", "x y") === Drift.InsDel(1, 3, 0, 0))
    assert(Drift.insDel("x y", "") === Drift.InsDel(0, 0, 1, 3))
  }

  test("matches O(N*M) LCS reference on a deterministic random sweep") {
    // reference: LCS DP; non-LCS words are the edits. Myers produces a
    // SHORTEST script, so total edited-word counts must match the DP; the
    // run partition may differ between equally-short scripts, so compare
    // total ins/del WORD counts (block split is script-dependent only
    // when ties exist; chars of single-word runs pin most of it).
    def lcsLen(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) =
          if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rnd = new java.util.Random(7)
    (1 to 300).foreach { _ =>
      val vocab = Vector("aa", "bb", "cc", "dd")
      val e = Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      val a = Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      val r = Drift.insDelWords(e, a)
      val lcs = lcsLen(e, a)
      val delWords = e.length - lcs
      val insWords = a.length - lcs
      // every word is 2 chars: blocks of size s contribute 3s-1 chars
      // ⇒ word count recoverable as (chars + blocks) / 3
      assert((r.insChars + r.insBlocks) / 3 === insWords, s"$e vs $a ins")
      assert((r.delChars + r.delBlocks) / 3 === delWords, s"$e vs $a del")
    }
  }
}
