package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.Bpe

/** Pins the BPE training/application kernels ([[graft.spark.Bpe]]):
  * the left-to-right non-overlapping merge rewrite, the count-then-
  * lexicographic argmax, early exhaustion, and the classic
  * Sennrich-et-al.-style worked example. The oracle SQL mirrors these
  * exact semantics, so any drift here breaks bit-equality. */
class BpeSpec extends AnyFunSuite {

  test("applyMerge: left-to-right, non-overlapping, fresh symbol never re-merges") {
    // "aaa" with merge (a,a): first pair merges, third 'a' survives —
    // the freshly built "aa" must NOT pair with the trailing 'a'
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    // four a's: two disjoint merges
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    // no occurrence: unchanged
    assert(Bpe.applyMerge(Array("a", "b"), "x", "y").toSeq == Seq("a", "b"))
    // merge at the end
    assert(Bpe.applyMerge(Array("c", "a", "b"), "a", "b").toSeq == Seq("c", "ab"))
    // single symbol / empty: unchanged
    assert(Bpe.applyMerge(Array("a"), "a", "a").toSeq == Seq("a"))
    assert(Bpe.applyMerge(Array.empty[String], "a", "a").toSeq == Seq())
  }

  test("trainOn: worked example — counts are weighted, ties break (left, right) lexicographically") {
    // vocabulary: "abab" x3, "abc" x2  → pair counts round 0:
    //   (a,b): 3*2 + 2 = 8 ; (b,a): 3 ; (b,c): 2   → merge (a,b), count 8
    // round 1 (symbols: [ab,ab] x3, [ab,c] x2):
    //   (ab,ab): 3 ; (ab,c): 2                     → merge (ab,ab), count 3
    val merges = Bpe.trainOn(Array(("abab", 3L), ("abc", 2L)), numMerges = 2)
    assert(merges.map(m => (m.merge_idx, m.lhs, m.rhs, m.pair_count)) ==
      Seq((0, "a", "b", 8L), (1, "ab", "ab", 3L)))
  }

  test("trainOn: overlapping positions count (reference semantics) but rewrite is non-overlapping") {
    // "aaa" x1: round-0 pair count for (a,a) is 2 (positions 0-1 and
    // 1-2 BOTH count), yet the rewrite yields [aa, a] (non-overlapping)
    val merges = Bpe.trainOn(Array(("aaa", 1L)), numMerges = 2)
    assert(merges.head.pair_count == 2L)
    assert((merges.head.lhs, merges.head.rhs) == ("a", "a"))
    // round 1 operates on [aa, a] → pair (aa, a) count 1
    assert(merges(1).pair_count == 1L)
    assert((merges(1).lhs, merges(1).rhs) == ("aa", "a"))
  }

  test("trainOn: tie on count falls to smaller (left, right)") {
    // "ba" x2, "cd" x2 → (b,a) and (c,d) both count 2; (b,a) < (c,d)
    val merges = Bpe.trainOn(Array(("ba", 2L), ("cd", 2L)), numMerges = 1)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("b", "a")))
  }

  test("trainOn: exhaustion — stops early when no adjacent pair remains") {
    // single-char words only: zero pairs from the start
    assert(Bpe.trainOn(Array(("a", 5L), ("b", 3L)), numMerges = 8).isEmpty)
    // "ab" collapses to one symbol after merge 0; training must stop at 1
    val merges = Bpe.trainOn(Array(("ab", 1L)), numMerges = 8)
    assert(merges.size == 1)
  }

  test("trainOn is deterministic: same vocab, same merges, independent of HashMap iteration order") {
    val vocab = Array("the", "then", "these", "theme", "than", "that")
      .zipWithIndex.map { case (w, i) => (w, (i + 1).toLong) }
    val a = Bpe.trainOn(vocab, numMerges = 16)
    val b = Bpe.trainOn(vocab.reverse, numMerges = 16)
    assert(a == b)
    assert(a.size == 16 || a.size < 16) // bounded
    // merge indices are dense 0..n-1
    assert(a.map(_.merge_idx) == a.indices)
  }
}
