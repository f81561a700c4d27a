package graft

import graft.spark.Hash61
import org.scalatest.funsuite.AnyFunSuite

/** Pins the allocation-free GF(2^61-1) kernel against BigInteger reference
  * arithmetic — the substrate every oracle-checked signature kernel
  * (fingerprint, shingles, minhash, simhash, LSH planes) now rests on. */
class Hash61Spec extends AnyFunSuite {
  private val M = Hash61.M

  private def refMulMod(a: Long, b: Long): Long =
    java.math.BigInteger.valueOf(a).multiply(java.math.BigInteger.valueOf(b))
      .mod(java.math.BigInteger.valueOf(M)).longValue()

  test("mulmod matches BigInteger over the full domain incl. 2^61 edge") {
    val edge = Seq(0L, 1L, 2L, M - 1, M, 1L << 61, 1L << 60, Hash61.C1, Hash61.C2)
    for (a <- edge; b <- edge) assert(Hash61.mulmod(a, b) === refMulMod(a, b))
    val rnd = new java.util.Random(42) // deterministic sweep of [0, 2^61)
    (1 to 20000).foreach { _ =>
      val a = rnd.nextLong() >>> 3
      val b = rnd.nextLong() >>> 3
      assert(Hash61.mulmod(a, b) === refMulMod(a, b))
    }
  }

  test("mix stays in [0, M) and is injective-ish on small domain") {
    val vals = (0L until 4096L).map(Hash61.mix)
    assert(vals.forall(v => v >= 0 && v < M))
    assert(vals.distinct.length === vals.length) // no collisions in 4k
  }

  test("rawWordHash is the documented fold (no silent overflow)") {
    // reference fold in BigInteger
    def ref(w: String): Long = {
      var h = java.math.BigInteger.ZERO
      val m = java.math.BigInteger.valueOf(M)
      w.foreach { c =>
        h = h.multiply(java.math.BigInteger.valueOf(131))
          .add(java.math.BigInteger.valueOf(c.toLong)).mod(m)
      }
      h.longValue()
    }
    for (w <- Seq("hello", "a", "", "x" * 500, "The-Quick_Brown fox 42!"))
      assert(Hash61.rawWordHash(w) === ref(w))
  }

  test("shingle3 is order-sensitive and in-field") {
    val (a, b, c) = (Hash61.wordHash("aa"), Hash61.wordHash("bb"), Hash61.wordHash("cc"))
    val s1 = Hash61.shingle3(a, b, c)
    assert(s1 >= 0 && s1 < M)
    assert(s1 !== Hash61.shingle3(c, b, a))
    assert(s1 !== Hash61.shingle3(b, a, c))
  }

  test("shingleN is the documented fold, order-sensitive, BigInteger-exact") {
    val rnd = new java.util.Random(7)
    val whs = Array.fill(12)(math.abs(rnd.nextLong()) % M)
    def ref(i: Int, n: Int): Long = {
      var s = java.math.BigInteger.ZERO
      val bM = java.math.BigInteger.valueOf(M)
      val bR = java.math.BigInteger.valueOf(Hash61.R1)
      (0 until n).foreach { k =>
        s = s.multiply(bR).add(java.math.BigInteger.valueOf(whs(i + k))).mod(bM)
      }
      Hash61.mix(s.longValue())
    }
    for (i <- 0 to 4; n <- Seq(3, 8)) assert(Hash61.shingleN(whs, i, n) === ref(i, n))
    // order sensitivity: swapping two window words must change the value
    val swapped = whs.clone(); val t0 = swapped(0); swapped(0) = swapped(1); swapped(1) = t0
    assert(Hash61.shingleN(whs, 0, 8) !== Hash61.shingleN(swapped, 0, 8))
  }
}
