package graft.spark

/** Generators for the large DuckDB oracle statements that replay whole
  * distributed algorithms in SQL — LSH bucketing and the deterministic
  * Lloyd/IVF quantizer. Exactness rests on two invariants proven
  * elsewhere: Hash61 arithmetic is HUGEINT-replayable (Hash61Spec), and
  * DuckDB `list_dot_product` / ordered `list_reduce` folds are strict
  * left-to-right double sums — bit-identical to the JVM loops and the
  * codegen'd `dot_f64` (SimilaritySpec).
  */
object OracleGen {

  /** Shared head: normalized embeddings + the corpus dimensionality. */
  private val embHead =
    "WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings), " +
      "dims AS MATERIALIZED (SELECT max(len(v)) AS dim FROM e)"

  private val rankTail =
    "SELECT query_id, CAST(rn AS INTEGER) AS \"rank\", corpus_id, cosine " +
      "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY cosine DESC, corpus_id) AS rn FROM sc) t WHERE rn <= "

  /** Replays [[Similarity.lshTopK]]: Hash61-derived hyperplanes, per-band
    * sign buckets, multi-band candidate union, exact cosine re-rank.
    * With `multiprobe`, the query side also probes every 1-bit-flip
    * neighbor of each band bucket ([[Similarity.lshMultiprobeTopK]]). */
  def lshTopKSql(numBands: Int = 4, planesPerBand: Int = 8,
      k: Int = 5, numQueries: Int = 20, multiprobe: Boolean = false): String = {
    val numPlanes = numBands * planesPerBand
    val queryProbes =
      if (!multiprobe)
        "qp AS MATERIALIZED (SELECT bk.vec_id, band_idx, bucket " +
          "FROM bk JOIN q ON bk.vec_id = q.query_id), "
      else
        "qp AS MATERIALIZED (" +
          "SELECT bk.vec_id, band_idx, bucket FROM bk JOIN q ON bk.vec_id = q.query_id " +
          "UNION ALL " +
          "SELECT bk.vec_id, band_idx, xor(bucket, (1 << fr.r)::HUGEINT) AS bucket " +
          "FROM bk JOIN q ON bk.vec_id = q.query_id " +
          s"CROSS JOIN (SELECT unnest(range(0, $planesPerBand)) AS r) fr), "
    embHead +
      // hyperplane component (p, i): (mix(p·4096+i+1) mod 2001 − 1000)/1000
      ", pl AS MATERIALIZED (SELECT p, list_transform(range(0, (SELECT dim FROM dims)), " +
      s"i -> CAST(${Hash61.mixSql("p * 4096 + i + 1")} % 2001 - 1000 AS DOUBLE) / 1000.0) AS plane " +
      s"FROM (SELECT unnest(range(0, $numPlanes)) AS p)), " +
      "sb AS MATERIALIZED (SELECT e.vec_id, pl.p, CASE WHEN list_dot_product(e.v, pl.plane) >= 0.0 " +
      "THEN 1 ELSE 0 END AS bit FROM e, pl), " +
      s"bk AS MATERIALIZED (SELECT vec_id, CAST(p // $planesPerBand AS INTEGER) AS band_idx, " +
      s"SUM(bit * (1 << (p % $planesPerBand))) AS bucket FROM sb GROUP BY 1, 2), " +
      s"q AS MATERIALIZED (SELECT vec_id AS query_id FROM e ORDER BY vec_id LIMIT $numQueries), " +
      queryProbes +
      "cand AS MATERIALIZED (SELECT DISTINCT qp.vec_id AS query_id, cb.vec_id AS corpus_id " +
      "FROM bk cb JOIN qp ON cb.band_idx = qp.band_idx AND cb.bucket = qp.bucket " +
      "WHERE cb.vec_id <> qp.vec_id), " +
      "sc AS MATERIALIZED (SELECT c.query_id, c.corpus_id, " +
      "list_dot_product(ce.v, qe.v) / (ce.nrm * qe.nrm) AS cosine " +
      "FROM cand c JOIN e ce ON ce.vec_id = c.corpus_id " +
      "JOIN e qe ON qe.vec_id = c.query_id) " +
      rankTail + k
  }

  // ---------- Spark Murmur3_x86_32 replay (ExtractJob.bucketCol) ----------
  // 32-bit wrapping arithmetic emulated in HUGEINT kept in [0, 2^32).
  // Spark's hashUnsafeBytes is NOT standard murmur3: the tail is hashed
  // one sign-extended byte at a time through a full mixK1/mixH1 round
  // (Murmur3_x86_32.java) — replayed faithfully below.

  private val U32 = "4294967296::HUGEINT"
  import Hash61.letSql

  private def rotl32Sql(x: String, r: Int): String =
    // (x<<r) and (x>>(32-r)) occupy disjoint bit ranges ⇒ OR == +, and one
    // mod keeps bits 0..31
    s"((($x) << $r) | (($x) >> ${32 - r})) % $U32"

  private def mixK1Sql(k: String): String =
    letSql(s"(($k) * 3432918353::HUGEINT) % $U32") { a => // * 0xcc9e2d51
      letSql(rotl32Sql(a, 15)) { r =>
        s"(($r) * 461845907::HUGEINT) % $U32" // * 0x1b873593
      }
    }

  private def mixH1Sql(h: String, k: String): String =
    letSql(s"xor(($h), ($k))") { x =>
      letSql(rotl32Sql(x, 13)) { r =>
        s"(($r) * 5 + 3864292196::HUGEINT) % $U32" // + 0xe6546b64
      }
    }

  private def fmixSql(h: String, len: Int): String =
    letSql(s"xor(($h), $len::HUGEINT)") { a =>
      letSql(s"(xor(($a), ($a) >> 16) * 2246822507::HUGEINT) % $U32") { b => // * 0x85ebca6b
        letSql(s"(xor(($b), ($b) >> 13) * 3266489909::HUGEINT) % $U32") { c => // * 0xc2b2ae35
          s"xor(($c), ($c) >> 16)"
        }
      }
    }

  /** Spark `pmod(hash(conv_id, tm), numBuckets)` where conv_id =
    * 'conv-' || lpad(k, 5, '0') (always 10 ASCII bytes ⇒ the byte loop
    * unrolls to 2 little-endian words + 2 tail bytes) and `tm` is a
    * non-negative int expression. Result is the bucket id: since
    * 2^32 ≡ 0 (mod numBuckets) for power-of-two bucket counts, pmod of
    * the signed int equals the unsigned value mod numBuckets. */
  def sparkBucketSql(kExpr: String, tmExpr: String, numBuckets: Int): String = {
    require(Integer.bitCount(numBuckets) == 1, "power-of-two buckets only")
    val word1 = 'c'.toInt | ('o'.toInt << 8) | ('n'.toInt << 16) | ('v'.toInt << 24)
    letSql(s"lpad(CAST(($kExpr) AS VARCHAR), 5, '0')") { ck =>
      letSql(s"45 + unicode(substr($ck, 1, 1))::HUGEINT * 256 + " +
        s"unicode(substr($ck, 2, 1))::HUGEINT * 65536 + " +
        s"unicode(substr($ck, 3, 1))::HUGEINT * 16777216") { word2 =>
        val h1 = mixH1Sql("42::HUGEINT", mixK1Sql(s"$word1::HUGEINT"))
        val h2 = mixH1Sql(h1, mixK1Sql(word2))
        val h3 = mixH1Sql(h2, mixK1Sql(s"unicode(substr($ck, 4, 1))::HUGEINT"))
        val h4 = mixH1Sql(h3, mixK1Sql(s"unicode(substr($ck, 5, 1))::HUGEINT"))
        val hs = fmixSql(h4, 10)
        // second column: hashInt(tm, seed = hs)
        val hi = fmixSql(mixH1Sql(hs, mixK1Sql(s"($tmExpr)::HUGEINT")), 4)
        s"CAST(($hi) % $numBuckets AS INTEGER)"
      }
    }
  }

  // squared euclidean distance of centroid list `cv` vs vector list `vv`,
  // as the same left-to-right fold the JVM loop performs. `dim` must be a
  // plain column in scope (subqueries are rejected inside lambdas).
  private def distSql(cv: String, vv: String): String =
    "list_reduce(list_prepend(0.0, list_transform(range(1, dim + 1), " +
      s"dj_ -> ($cv[dj_] - $vv[dj_]) * ($cv[dj_] - $vv[dj_]))), (dx_, dy_) -> dx_ + dy_)"

  // squared distance of sub-centroid list `cv` (length `sub`) vs the s-th
  // slice of full vector `vv`; `sub` must be a plain column in scope.
  private def subDistSql(cv: String, vv: String, sExpr: String): String =
    "list_reduce(list_prepend(0.0, list_transform(range(1, sub + 1), " +
      s"sj_ -> ($cv[sj_] - $vv[($sExpr) * sub + sj_]) * ($cv[sj_] - $vv[($sExpr) * sub + sj_]))), " +
      "(sx_, sy_) -> sx_ + sy_)"

  /** Per-subspace PQ training + coding CTEs over source CTE `src`
    * (columns `vec_id`, `r DOUBLE[]`): emits sp, ps0, pcent0..N (Lloyd),
    * cdist (per-(vector, subspace, centroid) distances vs the final
    * codebook) and codes (per-(vector, subspace) nearest centroid).
    * Requires `pd` (the `sub` width) in scope. [[pqTopKSql]] trains on
    * the raw vectors, [[ivfpqTopKSql]] on coarse residuals. */
  private def pqTrainCtes(src: String, m: Int, ksub: Int, lloydIters: Int,
      sampleCap: Int): String = {
    val sb = new StringBuilder
    sb.append(s", sp AS MATERIALIZED (SELECT unnest(range(0, $m)) AS s)")
    // training sample: first `sampleCap` vectors by vec_id — EXACTLY the
    // bounded sample Similarity.trainPq collects, so parity no longer
    // rests on the corpus fitting under the cap (ADVICE r4). Coding
    // (cdist/codes) still covers the FULL corpus, as the JVM does.
    sb.append(s", psmp AS MATERIALIZED (SELECT vec_id, r FROM $src ORDER BY vec_id LIMIT $sampleCap)")
    sb.append(s", ps0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, r FROM psmp)")
    sb.append(", pcent0 AS MATERIALIZED (SELECT sp.s, ps0.c, " +
      "list_transform(range(1, sub + 1), j0_ -> ps0.r[sp.s * sub + j0_]) AS cv " +
      s"FROM ps0 CROSS JOIN sp CROSS JOIN pd WHERE ps0.c < $ksub)")
    for (i <- 1 to lloydIters) {
      val prev = s"pcent${i - 1}"
      sb.append(s", pq$i AS MATERIALIZED (SELECT sv.vec_id, c0.s, c0.c, ${subDistSql("c0.cv", "sv.r", "c0.s")} AS d " +
        s"FROM psmp sv CROSS JOIN $prev c0 CROSS JOIN pd)")
      sb.append(s", pa$i AS MATERIALIZED (SELECT vec_id, s, c FROM (SELECT vec_id, s, c, " +
        s"row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn FROM pq$i) WHERE rn = 1)")
      // ordered elementwise slice sum (vec_id order == JVM accumulation)
      sb.append(s", pm$i AS MATERIALIZED (SELECT a.s, a.c, count(*) AS cnt, " +
        "list_reduce(list(list_transform(range(1, sub + 1), mj_ -> sv.r[a.s * sub + mj_]) ORDER BY sv.vec_id), " +
        "(mx_, my_) -> list_transform(range(1, sub + 1), ej_ -> mx_[ej_] + my_[ej_])) AS sums " +
        s"FROM pa$i a JOIN psmp sv ON sv.vec_id = a.vec_id CROSS JOIN pd GROUP BY a.s, a.c, sub)")
      sb.append(s", pcent$i AS MATERIALIZED (SELECT c0.s, c0.c, CASE WHEN pm.c IS NULL THEN c0.cv " +
        "ELSE list_transform(range(1, sub + 1), cj_ -> pm.sums[cj_] / pm.cnt) END AS cv " +
        s"FROM $prev c0 CROSS JOIN pd LEFT JOIN pm$i pm ON c0.s = pm.s AND c0.c = pm.c)")
    }
    val cf = s"pcent$lloydIters"
    sb.append(s", cdist AS MATERIALIZED (SELECT sv.vec_id, c0.s, c0.c, ${subDistSql("c0.cv", "sv.r", "c0.s")} AS d " +
      s"FROM $src sv CROSS JOIN $cf c0 CROSS JOIN pd)")
    sb.append(", codes AS MATERIALIZED (SELECT vec_id, s, c FROM (SELECT vec_id, s, c, " +
      "row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn FROM cdist) WHERE rn = 1)")
    sb.toString
  }

  /** Replays [[Similarity.pqTopK]] end to end: per-subspace Lloyd
    * training (the IVF replay with a subspace grouping column), corpus
    * codes, ADC distances summed in subspace order (`list_reduce` over
    * `list(d ORDER BY s)` — the JVM folds s ascending), top-`shortlist`
    * by (approx, id), exact cosine re-rank. Same sampleCap assumption as
    * [[ivfTopKSql]]. */
  def pqTopKSql(m: Int = 8, ksub: Int = 16, shortlist: Int = 32, k: Int = 5,
      numQueries: Int = 20, lloydIters: Int = 5, sampleCap: Int = 4096): String = {
    val sb = new StringBuilder(embHead)
    sb.append(s", pd AS MATERIALIZED (SELECT dim // $m AS sub FROM dims)")
    sb.append(", pv AS MATERIALIZED (SELECT vec_id, v AS r FROM e)")
    sb.append(pqTrainCtes("pv", m, ksub, lloydIters, sampleCap))
    sb.append(s", q AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT $numQueries)")
    // ADC: the query rows of cdist ARE the lookup tables dt(s, c)
    sb.append(", ax AS MATERIALIZED (SELECT dt.vec_id AS query_id, cd.vec_id AS corpus_id, " +
      "list_reduce(list_prepend(0.0, list(dt.d ORDER BY dt.s)), (ax_, ay_) -> ax_ + ay_) AS ad " +
      "FROM cdist dt JOIN q ON dt.vec_id = q.vec_id " +
      "JOIN codes cd ON cd.s = dt.s AND cd.c = dt.c " +
      "WHERE cd.vec_id <> dt.vec_id GROUP BY dt.vec_id, cd.vec_id)")
    sb.append(s", cand AS MATERIALIZED (SELECT query_id, corpus_id FROM (SELECT query_id, corpus_id, " +
      s"row_number() OVER (PARTITION BY query_id ORDER BY ad, corpus_id) AS rn FROM ax) WHERE rn <= $shortlist)")
    sb.append(", sc AS MATERIALIZED (SELECT c.query_id, c.corpus_id, " +
      "list_dot_product(ce.v, qe.v) / (ce.nrm * qe.nrm) AS cosine " +
      "FROM cand c JOIN e ce ON ce.vec_id = c.corpus_id " +
      "JOIN e qe ON qe.vec_id = c.query_id) ")
    sb.append(rankTail + k)
    sb.toString
  }

  /** Replays [[Similarity.ivfpqTopK]] (IVFADC): the coarse-IVF CTEs
    * ([[coarseCtes]] — training, corpus cell assignment), per-vector
    * residuals vs the final coarse centroid, PQ training/coding on those
    * residuals ([[pqTrainCtes]]), query probing (nprobe nearest cells),
    * per-(query, cell) residual ADC tables, subspace-ordered ADC sums on
    * the probed cells' codes, top-`shortlist` by (approx, id), exact
    * cosine re-rank. Same bounded-sample assumption as the pieces. */
  def ivfpqTopKSql(numCentroids: Int = 16, nprobe: Int = 4, m: Int = 8,
      ksub: Int = 16, shortlist: Int = 32, k: Int = 5,
      numQueries: Int = 20, lloydIters: Int = 5, sampleCap: Int = 4096): String = {
    val cf = s"cent$lloydIters"
    val pcf = s"pcent$lloydIters"
    val sb = new StringBuilder(embHead)
    sb.append(s", pd AS MATERIALIZED (SELECT dim // $m AS sub FROM dims)")
    sb.append(coarseCtes(numCentroids, lloydIters, sampleCap))
    // corpus residuals vs the assigned cell's final centroid
    sb.append(", res AS MATERIALIZED (SELECT e.vec_id, list_transform(range(1, dim + 1), " +
      "rj_ -> e.v[rj_] - cf.cv[rj_]) AS r " +
      s"FROM e JOIN asg ON asg.vec_id = e.vec_id JOIN $cf cf ON cf.c = asg.cell CROSS JOIN dims)")
    sb.append(pqTrainCtes("res", m, ksub, lloydIters, sampleCap))
    sb.append(s", q AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT $numQueries)")
    sb.append(", probes AS MATERIALIZED (SELECT vec_id AS query_id, c AS cell FROM (" +
      "SELECT df.vec_id, df.c, row_number() OVER (PARTITION BY df.vec_id ORDER BY d, c) AS rn " +
      s"FROM df JOIN q ON df.vec_id = q.vec_id) WHERE rn <= $nprobe)")
    // per-(query, probed cell) residual, then its ADC table rows
    sb.append(", qres AS MATERIALIZED (SELECT p.query_id, p.cell, list_transform(range(1, dim + 1), " +
      "qj_ -> qe.v[qj_] - cf.cv[qj_]) AS r " +
      s"FROM probes p JOIN e qe ON qe.vec_id = p.query_id JOIN $cf cf ON cf.c = p.cell CROSS JOIN dims)")
    sb.append(s", qdt AS MATERIALIZED (SELECT qr.query_id, qr.cell, c0.s, c0.c, " +
      s"${subDistSql("c0.cv", "qr.r", "c0.s")} AS d " +
      s"FROM qres qr CROSS JOIN $pcf c0 CROSS JOIN pd)")
    // ADC sum over the probed cells' codes, folded in subspace order
    sb.append(", ax AS MATERIALIZED (SELECT qd.query_id, ca.vec_id AS corpus_id, " +
      "list_reduce(list_prepend(0.0, list(qd.d ORDER BY qd.s)), (ax_, ay_) -> ax_ + ay_) AS ad " +
      "FROM asg ca JOIN probes p ON p.cell = ca.cell " +
      "JOIN codes cd ON cd.vec_id = ca.vec_id " +
      "JOIN qdt qd ON qd.query_id = p.query_id AND qd.cell = ca.cell AND qd.s = cd.s AND qd.c = cd.c " +
      "WHERE ca.vec_id <> p.query_id GROUP BY qd.query_id, ca.vec_id)")
    sb.append(s", cand AS MATERIALIZED (SELECT query_id, corpus_id FROM (SELECT query_id, corpus_id, " +
      s"row_number() OVER (PARTITION BY query_id ORDER BY ad, corpus_id) AS rn FROM ax) WHERE rn <= $shortlist)")
    sb.append(", sc AS MATERIALIZED (SELECT c.query_id, c.corpus_id, " +
      "list_dot_product(ce.v, qe.v) / (ce.nrm * qe.nrm) AS cosine " +
      "FROM cand c JOIN e ce ON ce.vec_id = c.corpus_id " +
      "JOIN e qe ON qe.vec_id = c.query_id) ")
    sb.append(rankTail + k)
    sb.toString
  }

  /** Replays [[Similarity.ivfTopK]] incl. quantizer training: init =
    * lowest-vec_id vectors, `lloydIters` unrolled Lloyd steps (ordered
    * elementwise sums → bit-exact means) over the first-`sampleCap`
    * vec_id-ordered sample (the exact sample the Spark side collects),
    * full-corpus assignment, nprobe probing, exact re-rank. */
  /** Coarse-IVF CTEs shared by [[ivfTopKSql]] and [[ivfpqTopKSql]]:
    * training (cent0..N), per-(vector, final centroid) distances (df) and
    * the corpus cell assignment (asg). Requires e/dims in scope. */
  private def coarseCtes(numCentroids: Int, lloydIters: Int,
      sampleCap: Int): String = {
    val sb = new StringBuilder
    // training sample: first `sampleCap` vectors by vec_id — EXACTLY the
    // bounded sample Similarity.trainQuantizer collects, so parity no
    // longer rests on the corpus fitting under the cap (ADVICE r4). The
    // final assignment (df/asg) still covers the FULL corpus, as the JVM
    // does.
    sb.append(s", smp AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $sampleCap)")
    sb.append(", s0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v FROM smp)")
    sb.append(s", cent0 AS MATERIALIZED (SELECT c, v AS cv FROM s0 WHERE c < $numCentroids)")
    for (i <- 1 to lloydIters) {
      val prev = s"cent${i - 1}"
      // assign every sample vector to its nearest centroid (ties → low c)
      sb.append(s", d$i AS MATERIALIZED (SELECT e.vec_id, e.v, c0.c, ${distSql("c0.cv", "e.v")} AS d " +
        s"FROM smp e CROSS JOIN $prev c0 CROSS JOIN dims)")
      sb.append(s", a$i AS MATERIALIZED (SELECT vec_id, v, c FROM (SELECT vec_id, v, c, " +
        s"row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d$i) WHERE rn = 1)")
      // ordered elementwise sum (vec_id order == the JVM accumulation order)
      sb.append(s", m$i AS MATERIALIZED (SELECT c, count(*) AS cnt, " +
        "list_reduce(list(v ORDER BY vec_id), (mx_, my_) -> " +
        "list_transform(range(1, dim + 1), mj_ -> mx_[mj_] + my_[mj_])) AS sums " +
        s"FROM a$i CROSS JOIN dims GROUP BY c, dim)")
      sb.append(s", cent$i AS MATERIALIZED (SELECT c0.c, CASE WHEN m.c IS NULL THEN c0.cv " +
        "ELSE list_transform(range(1, dim + 1), cj_ -> m.sums[cj_] / m.cnt) END AS cv " +
        s"FROM $prev c0 CROSS JOIN dims LEFT JOIN m$i m ON c0.c = m.c)")
    }
    val cf = s"cent$lloydIters"
    sb.append(s", df AS MATERIALIZED (SELECT e.vec_id, c0.c, ${distSql("c0.cv", "e.v")} AS d " +
      s"FROM e CROSS JOIN $cf c0 CROSS JOIN dims)")
    sb.append(", asg AS MATERIALIZED (SELECT vec_id, c AS cell FROM (SELECT vec_id, c, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df) WHERE rn = 1)")
    sb.toString
  }

  /** Replays [[Dedup.semanticOn]] over the fully-planted union corpus
    * (every vector gets a near-dup at vec_id + 100000 with every 9th
    * dim halved — an exponent-only float op, exact in float AND double,
    * so both engines see identical vectors): Lloyd training over the
    * union's first-`sampleCap` vec_id-ordered sample (matching
    * `Similarity.trainQuantizer` at ANY corpus size — ADVICE r4), cell
    * assignment, within-cell a<b pair scan at `threshold`,
    * keep-lowest-id winner per dropped vector. */
  def semanticDedupSql(numCentroids: Int = 16, lloydIters: Int = 5,
      threshold: Double = 0.95, sampleCap: Int = 4096): String = {
    val sb = new StringBuilder(
      "WITH e0 AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "pl AS MATERIALIZED (SELECT vec_id + 100000 AS vec_id, " +
        "list_transform(range(1, len(v) + 1), j -> CASE WHEN (j - 1) % 9 = 0 " +
        "THEN v[j] * 0.5 ELSE v[j] END) AS v FROM e0), " +
        "e AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm " +
        "FROM (SELECT * FROM e0 UNION ALL SELECT * FROM pl)), " +
        "dims AS MATERIALIZED (SELECT max(len(v)) AS dim FROM e)")
    sb.append(coarseCtes(numCentroids, lloydIters, sampleCap))
    sb.append(", prs AS MATERIALIZED (SELECT a.vec_id AS ka, b.vec_id AS kb, " +
      "a.cell AS cell, list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm) AS cosine " +
      "FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id " +
      "JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id) ")
    sb.append("SELECT kb AS vec_id, ka AS kept_id, CAST(cell AS INTEGER) AS cell, cosine " +
      "FROM (SELECT *, row_number() OVER (PARTITION BY kb ORDER BY ka) AS rn " +
      s"FROM prs WHERE cosine >= $threshold) t WHERE rn = 1")
    sb.toString
  }

  def ivfTopKSql(numCentroids: Int = 16, nprobe: Int = 4, k: Int = 5,
      numQueries: Int = 20, lloydIters: Int = 5, sampleCap: Int = 4096): String = {
    val sb = new StringBuilder(embHead)
    sb.append(coarseCtes(numCentroids, lloydIters, sampleCap))
    sb.append(s", q AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT $numQueries)")
    sb.append(", probes AS MATERIALIZED (SELECT vec_id AS query_id, c AS cell FROM (" +
      "SELECT df.vec_id, df.c, row_number() OVER (PARTITION BY df.vec_id ORDER BY d, c) AS rn " +
      s"FROM df JOIN q ON df.vec_id = q.vec_id) WHERE rn <= $nprobe)")
    sb.append(", cand AS MATERIALIZED (SELECT p.query_id, a.vec_id AS corpus_id " +
      "FROM probes p JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.query_id)")
    sb.append(", sc AS MATERIALIZED (SELECT c.query_id, c.corpus_id, " +
      "list_dot_product(ce.v, qe.v) / (ce.nrm * qe.nrm) AS cosine " +
      "FROM cand c JOIN e ce ON ce.vec_id = c.corpus_id " +
      "JOIN e qe ON qe.vec_id = c.query_id) ")
    sb.append(rankTail + k)
    sb.toString
  }
}
