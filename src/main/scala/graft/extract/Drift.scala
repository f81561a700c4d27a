package graft.extract

/** htmldiff-parity drift metric (SURVEY.md §2 A7).
  *
  * The reference's own quality meter is the number and text-length of
  * `<ins>`/`<del>` elements in `lxml.html.diff.htmldiff(benchmark,
  * result)` (`regression_test.py:208,214-235` — `ResultSummary` sums
  * `len(text_content())` and counts elements per tag). htmldiff is a
  * word-level diff that wraps maximal changed runs, so the equivalent
  * text-space metric is: word-level diff of (expected, actual), where
  * each maximal run of inserted words is one ins BLOCK whose CHARS is
  * the space-joined run length — and symmetrically for deletions.
  * "Inserted" = present in `actual` (the result) but not in `expected`
  * (the benchmark); "deleted" = the reverse, matching htmldiff(benchmark,
  * result) orientation.
  *
  * Implementation: common prefix/suffix strip + Myers O(ND) shortest
  * edit script on the middle — exact, fast when drift is small (the
  * regression corpus is 13/15 identical).
  */
object Drift {

  final case class InsDel(insBlocks: Long, insChars: Long,
      delBlocks: Long, delChars: Long)

  def insDelWords(expected: IndexedSeq[String], actual: IndexedSeq[String]): InsDel = {
    // strip common prefix/suffix (Myers cost is quadratic in drift size)
    var lo = 0
    val maxLo = math.min(expected.length, actual.length)
    while (lo < maxLo && expected(lo) == actual(lo)) lo += 1
    var eHi = expected.length
    var aHi = actual.length
    while (eHi > lo && aHi > lo && expected(eHi - 1) == actual(aHi - 1)) { eHi -= 1; aHi -= 1 }
    val e = expected.slice(lo, eHi)
    val a = actual.slice(lo, aHi)
    if (e.isEmpty && a.isEmpty) return InsDel(0, 0, 0, 0)
    if (e.isEmpty) return InsDel(1, joined(a), 0, 0)
    if (a.isEmpty) return InsDel(0, 0, 1, joined(e))

    // Myers: ops(i) over the edit script; recover via V-array trace
    val n = e.length
    val m = a.length
    val max = n + m
    val vs = new scala.collection.mutable.ArrayBuffer[Array[Int]]
    var v = new Array[Int](2 * max + 1)
    var dFound = -1
    var d = 0
    while (d <= max && dFound < 0) {
      var k = -d
      while (k <= d && dFound < 0) {
        val kIdx = k + max
        var x =
          if (k == -d || (k != d && v(kIdx - 1) < v(kIdx + 1))) v(kIdx + 1)
          else v(kIdx - 1) + 1
        var y = x - k
        while (x < n && y < m && e(x) == a(y)) { x += 1; y += 1 }
        v(kIdx) = x
        if (x >= n && y >= m) dFound = d
        k += 2
      }
      vs += v.clone()
      d += 1
    }
    // backtrack: collect per-position edit flags
    val delFlag = new Array[Boolean](n) // expected words deleted
    val insFlag = new Array[Boolean](m) // actual words inserted
    var x = n
    var y = m
    var dd = dFound
    while (dd > 0) {
      val vPrev = vs(dd - 1)
      val k = x - y
      val kIdx = k + max
      val down = k == -dd || (k != dd && vPrev(kIdx - 1) < vPrev(kIdx + 1))
      val prevK = if (down) k + 1 else k - 1
      val prevX = vPrev(prevK + max)
      val prevY = prevX - prevK
      // snake back
      while (x > prevX && y > prevY && x > 0 && y > 0) { x -= 1; y -= 1 }
      if (down) { y -= 1; insFlag(y) = true } // insertion in actual
      else { x -= 1; delFlag(x) = true } // deletion from expected
      dd -= 1
    }
    // blocks = maximal runs; chars = space-joined run length
    def runs(flags: Array[Boolean], words: IndexedSeq[String]): (Long, Long) = {
      var blocks = 0L
      var chars = 0L
      var i = 0
      while (i < flags.length) {
        if (flags(i)) {
          blocks += 1
          var runChars = -1L // joined length: Σ len + (run−1) spaces
          while (i < flags.length && flags(i)) {
            runChars += words(i).length + 1
            i += 1
          }
          chars += runChars
        } else i += 1
      }
      (blocks, chars)
    }
    val (ib, ic) = runs(insFlag, a)
    val (db, dc) = runs(delFlag, e)
    InsDel(ib, ic, db, dc)
  }

  private def joined(ws: IndexedSeq[String]): Long =
    if (ws.isEmpty) 0L else ws.map(_.length.toLong).sum + ws.length - 1

  /** Convenience over whitespace-tokenized texts. */
  def insDel(expectedText: String, actualText: String): InsDel =
    insDelWords(
      expectedText.split("\\s+").filter(_.nonEmpty).toIndexedSeq,
      actualText.split("\\s+").filter(_.nonEmpty).toIndexedSeq)
}
