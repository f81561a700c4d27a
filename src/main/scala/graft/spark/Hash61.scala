package graft.spark

/** Arithmetic over the Mersenne field GF(2^61−1) — the shared hashing
  * substrate for every signature kernel (fingerprints, shingles, minhash,
  * simhash, LSH planes).
  *
  * Why this field: (a) the multiply-mod is allocation-free on the JVM
  * (`Math.multiplyHigh` + Mersenne folding — no BigInteger, VERDICT.md
  * "What's wrong" #4), and (b) the same arithmetic is exactly expressible
  * in DuckDB HUGEINT (`(a*b) % M` fits int128), so every kernel built on
  * it gets a bit-exact SQL oracle. 64-bit wrapping hashes (the round-1
  * splitmix64 kernels) had neither property.
  */
object Hash61 {

  /** 2^61 − 1 (prime). */
  val M: Long = (1L << 61) - 1

  // mix constants: golden-ratio / splitmix multipliers folded into [0, M)
  val C1: Long = 0x9e3779b97f4a7c15L & M
  val C2: Long = 0xbf58476d1ce4e5b9L & M
  // shingle position multipliers
  val R1: Long = 0x94d049bb133111ebL & M
  val R2: Long = 0xd6e8feb86659fd93L & M

  /** (a*b) mod (2^61−1), valid for 0 ≤ a,b ≤ 2^61. The 128-bit product
    * hi·2^64 + lo reduces via 2^64 ≡ 8 and 2^61 ≡ 1 (mod M). */
  @inline def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & M) + (lo >>> 61) + (hi << 3)
    r = (r & M) + (r >>> 61)
    if (r >= M) r - M else r
  }

  /** Deterministic mixer on [0, 2^61) → [0, 2^61): two multiply-mods with
    * xor-shifts between. Input may be any value ≤ 2^61−1 (xor-combined
    * hashes included). */
  @inline def mix(x0: Long): Long = {
    val a = mulmod(x0 + 1, C1)
    val b = a ^ (a >>> 29)
    val c = mulmod(b, C2)
    c ^ (c >>> 32)
  }

  /** Polynomial word hash: fold (h·131 + char) mod M over UTF-16 units,
    * then mix. (The unmixed fold is [[rawWordHash]] — the doc-fingerprint
    * kernel keeps it for round-1 value stability.) */
  @inline def wordHash(w: CharSequence): Long = mix(rawWordHash(w))

  /** The bare polynomial fold (no final mix): h = (h·131 + c) mod M.
    * h < 2^61 ⇒ h·131 < 2^68 — needs mulmod, not a plain multiply. */
  @inline def rawWordHash(w: CharSequence): Long = {
    var h = 0L
    var i = 0
    while (i < w.length) { h = (mulmod(h, 131L) + w.charAt(i)) % M; i += 1 }
    h
  }

  /** Ordered 3-shingle combiner: position-weighted sum in the field, then
    * mix — (w1·R1 + w2·R2 + w3) distinguishes permutations. */
  @inline def shingle3(w1: Long, w2: Long, w3: Long): Long = {
    var s = mulmod(w1, R1) + mulmod(w2, R2)
    s = (s & M) + (s >>> 61) // fold the ≤2^62 sum back under 2^61
    s += w3
    s = (s & M) + (s >>> 61)
    mix(if (s >= M) s - M else s)
  }

  /** Ordered n-shingle over word hashes `whs(i until i+n)`: left fold
    * s ← (s·R1 + w) mod M, then mix. (The 3-shingle combiner above
    * predates this; kept for oracle stability of the dedup family.) */
  def shingleN(whs: Array[Long], i: Int, n: Int): Long = {
    var s = 0L
    var k = 0
    while (k < n) { s = (mulmod(s, R1) + whs(i + k)) % M; k += 1 }
    mix(s)
  }

  // ---------- SQL generators (DuckDB HUGEINT mirrors) ----------
  // Each takes a SQL expression string (HUGEINT-valued) and returns the
  // expression computing the same function. Used by SparkEntry.oracleSql.

  private val varCtr = new java.util.concurrent.atomic.AtomicInteger(0)

  /** SQL let-binding: evaluates `expr` once, binds it to a fresh lambda
    * variable inside `body` — keeps generated oracles linear in size
    * instead of exponential (naive textual substitution would duplicate
    * `expr` at every use site). */
  def letSql(expr: String)(body: String => String): String = {
    val v = "g" + varCtr.incrementAndGet()
    s"list_transform([$expr], $v -> ${body(v)})[1]"
  }

  /** DuckDB mirror of [[mix]]. `x` must evaluate to HUGEINT in [0, 2^61]. */
  def mixSql(x: String): String =
    letSql(s"((($x) + 1) * $C1::HUGEINT) % $M::HUGEINT") { a =>
      letSql(s"(xor($a, $a >> 29) * $C2::HUGEINT) % $M::HUGEINT") { c =>
        s"xor($c, $c >> 32)"
      }
    }

  /** DuckDB mirror of [[rawWordHash]] over an ASCII string expression
    * (chars = bytes = UTF-16 units for this corpus). Lambda vars are
    * prefixed to avoid capture when nested inside caller lambdas. */
  def rawWordHashSql(w: String): String =
    s"list_reduce(list_prepend(0::HUGEINT, list_transform(string_split($w, ''), " +
      s"wc_ -> unicode(wc_)::HUGEINT)), (wa_, wb_) -> (wa_ * 131 + wb_) % $M::HUGEINT)"

  /** DuckDB mirror of [[wordHash]]. */
  def wordHashSql(w: String): String = mixSql(rawWordHashSql(w))

  /** DuckDB mirror of [[shingle3]] (the folds in the Scala version are
    * just the mod — one `% M` over the 3-term sum is the same value). */
  def shingle3Sql(a: String, b: String, c: String): String =
    mixSql(s"((($a) * $R1::HUGEINT) % $M + (($b) * $R2::HUGEINT) % $M + ($c)) % $M::HUGEINT")

  /** DuckDB mirror of [[shingleN]] over a HUGEINT-list expression `whs`
    * starting at 1-based index expression `i`. */
  def shingleNSql(whs: String, i: String, n: Int): String =
    mixSql(s"list_reduce(list_prepend(0::HUGEINT, ($whs)[($i):($i) + ${n - 1}]), " +
      s"(sa_, sb_) -> (sa_ * $R1::HUGEINT + sb_) % $M::HUGEINT)")
}
