package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scoring operators for data selection — the two published
  * families a training pipeline runs between dedup and sharding:
  *
  *  - [[dsirWeights]]: hashed n-gram importance weights (Xie et al.
  *    2023, "Data Selection for Language Models via Importance
  *    Resampling" — DSIR): score every raw document by how much more
  *    likely its words are under a TARGET domain's hashed-unigram
  *    distribution than under the raw distribution.
  *  - [[perplexity]]: LM cross-entropy scoring (Wenzek et al. 2020,
  *    "CCNet: Extracting High Quality Monolingual Datasets from Web
  *    Crawl Data"): per-document negative log-likelihood under an
  *    add-one-smoothed word-bigram model; CCNet buckets the corpus by
  *    LM perplexity and keeps the low-perplexity head.
  *
  * Float determinism: every `ln` is floored to integer MICRO-NATS
  * (`floor(x·10^6)` as a BIGINT) before any aggregation, so document
  * scores are exact integer sums — order-independent, engine-identical
  * (the tfidf floor-then-rank technique; the only cross-engine freedom
  * left is a 1-ulp `ln` landing exactly on a floor boundary, oracle-
  * checked at all SFs).
  */
object Curation {

  /** Add-λ smoothing pseudo-count for [[dsirWeights]]. Small so the
    * empty buckets' pseudo-mass (λ·B) stays negligible next to either
    * side's real total at every SF. Interpolated into the oracle SQL via
    * `toString` (shortest-repr round-trip ⇒ bit-identical doubles). */
  val Lambda: Double = 0.01

  /** DSIR importance weights over hashed unigrams.
    *
    * Features: word → `Hash61.wordHash % numBuckets` (the paper's
    * hashed n-gram bag, n=1 face). The target distribution is the
    * corpus slice whose word set contains `targetWord` — a stand-in for
    * "the curated target-domain corpus" (in production the target is a
    * separate table; the synthetic corpus's only real distributional
    * signature is its planted marker token, so that slice is the one
    * target choice the scorer can meaningfully recover). The raw
    * distribution is everything else. With add-λ smoothing (λ small so
    * the B−V empty buckets don't steal mass from the smaller side — the
    * add-ONE face tilts every common word negative whenever B ~ Tt),
    * bucket b scores
    * `s_b = floor(10^6 · ln( ((ct_b+λ)·(Tr+λB)) / ((cr_b+λ)·(Tt+λB)) ))`
    * micro-nats, and a document's log importance weight is the sum of
    * `s_b(w)` over its word OCCURRENCES. `keep = 1` iff the weight is
    * positive — the document looks more target-like than raw-like.
    * (The paper resamples with Gumbel noise; the deterministic
    * positive-weight face is what an oracle can replay — no RNG.)
    *
    * Scale shape: two map-side-combined aggregates of at most
    * `numBuckets` rows each (the whole point of feature HASHING is that
    * the model stays O(B) no matter the corpus), the score table is
    * collected (bounded by `numBuckets`) and broadcast, and the scoring
    * pass is ROW-LOCAL — the corpus never shuffles.
    *
    * Emits (doc_id, source, n_words, score_unats, keep). */
  def dsirWeights(spark: SparkSession, sfDir: String,
      targetWord: String = "dup", numBuckets: Int = 256): DataFrame = {
    import spark.implicits._
    require(numBuckets > 0 && numBuckets <= (1 << 16),
      s"numBuckets=$numBuckets must be a bounded broadcastable model size")
    val words = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .flatMap { case (_, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        val isTarget = ws.contains(targetWord)
        ws.iterator.map(w => (isTarget, (Hash61.wordHash(w) % numBuckets).toInt))
      }
      .toDF("is_target", "bucket")
    // bounded collect: exactly one row per (side, bucket), ≤ 2·numBuckets
    val counts = words.groupBy("is_target", "bucket")
      .agg(count(lit(1)).as("c")).collect()
    val ct = new Array[Long](numBuckets)
    val cr = new Array[Long](numBuckets)
    counts.foreach { r =>
      val arr = if (r.getBoolean(0)) ct else cr
      arr(r.getInt(1)) = r.getLong(2)
    }
    val tT = ct.sum; val tR = cr.sum
    val scores = Array.tabulate(numBuckets) { b =>
      val num = (ct(b) + Lambda) * (tR + Lambda * numBuckets)
      val den = (cr(b) + Lambda) * (tT + Lambda * numBuckets)
      math.floor(math.log(num / den) * 1e6).toLong
    }
    val bcScores = spark.sparkContext.broadcast(scores)
    val nb = numBuckets
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "source", "text").as[(Long, String, String)])
      .map { case (id, src, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        var s = 0L
        ws.foreach(w => s += bcScores.value((Hash61.wordHash(w) % nb).toInt))
        (id, src, ws.length.toLong, s, if (s > 0) 1L else 0L)
      }
      .toDF("doc_id", "source", "n_words", "score_unats", "keep")
  }

  /** SQL replay of [[dsirWeights]]: same word model, same Hash61 bucket,
    * same add-one ratio, ln floored to micro-nats per bucket BEFORE the
    * per-document sum (integer aggregation — order-free). */
  def dsirWeightsSql(targetWord: String = "dup",
      numBuckets: Int = 256): String = {
    val wh = Hash61.wordHashSql("uw_")
    s"WITH wd AS MATERIALIZED (SELECT doc_id, source, " +
      "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
      s"pos AS MATERIALIZED (SELECT doc_id, list_contains(ws, '$targetWord') AS is_target, " +
      s"CAST(unnest(list_transform(ws, uw_ -> $wh)) % $numBuckets AS INTEGER) AS bucket FROM wd), " +
      "ct AS MATERIALIZED (SELECT bucket, " +
      "SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ctb, " +
      "SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS crb FROM pos GROUP BY bucket), " +
      "tot AS (SELECT SUM(ctb) AS tt, SUM(crb) AS tr FROM ct), " +
      "sc AS MATERIALIZED (SELECT bucket, CAST(floor(ln(" +
      s"((ctb::DOUBLE + $Lambda) * (tr::DOUBLE + ${Lambda * numBuckets})) / " +
      s"((crb::DOUBLE + $Lambda) * (tt::DOUBLE + ${Lambda * numBuckets}))) * 1000000) AS BIGINT) AS s " +
      "FROM ct CROSS JOIN tot), " +
      "ds AS (SELECT pos.doc_id, SUM(sc.s) AS score FROM pos JOIN sc USING (bucket) " +
      "GROUP BY pos.doc_id) " +
      "SELECT wd.doc_id, wd.source, CAST(len(wd.ws) AS BIGINT) AS n_words, " +
      "CAST(coalesce(ds.score, 0) AS BIGINT) AS score_unats, " +
      "CAST(CASE WHEN coalesce(ds.score, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep " +
      "FROM wd LEFT JOIN ds ON ds.doc_id = wd.doc_id"
  }

  /** Distribution-drift monitor between corpus snapshots: per-source
    * KL(new ‖ old) over hashed unigram buckets, where "new" is the
    * deterministic slice `Hash61.mix(doc_id) % newMod == 0` (standing in
    * for this increment's crawl — in production the two sides are two
    * snapshot reads of the same table). The pipeline gate this feeds:
    * a source whose incoming token distribution drifts (spam flood,
    * template change, scraper breakage) should fail loudly BEFORE its
    * documents reach training shards.
    *
    * Same O(B) hashed model as [[dsirWeights]], same add-λ smoothing,
    * same micro-nat floor per bucket term before the integer sum. The
    * sum runs over OCCUPIED buckets only (identical set on both
    * engines); empty buckets' λ-only terms are excluded by construction.
    * Scale shape: one map-side-combined (source, bucket) aggregate — the
    * exchange carries ≤ sources·B rows — then a per-source fold; the
    * corpus never shuffles.
    *
    * Emits (source, n_new_tokens, n_old_tokens, kl_unats). */
  def klDrift(spark: SparkSession, sfDir: String,
      numBuckets: Int = 256, newMod: Int = 4): DataFrame = {
    import spark.implicits._
    val nb = numBuckets
    val occ = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "source", "text").as[(Long, String, String)])
      .flatMap { case (id, src, text) =>
        val isNew = if (Hash61.mix(id) % newMod == 0) 1L else 0L
        text.split(" ").iterator.filter(_.nonEmpty)
          .map(w => (src, (Hash61.wordHash(w) % nb).toInt, isNew))
      }.toDF("source", "bucket", "is_new")
    val bk = occ.groupBy("source", "bucket")
      .agg(sum(col("is_new")).as("cn"), sum(lit(1L) - col("is_new")).as("co"))
    val tot = bk.groupBy("source")
      .agg(sum(col("cn")).as("tn"), sum(col("co")).as("tl"))
    val lamB = Lambda * numBuckets
    bk.join(tot, "source")
      .withColumn("pn", (col("cn") + Lambda) / (col("tn") + lamB))
      .withColumn("po", (col("co") + Lambda) / (col("tl") + lamB))
      .withColumn("term",
        floor(col("pn") * log(col("pn") / col("po")) * lit(1e6)).cast("long"))
      .groupBy("source")
      .agg(max(col("tn")).as("n_new_tokens"), max(col("tl")).as("n_old_tokens"),
        sum(col("term")).as("kl_unats"))
  }

  /** SQL replay of [[klDrift]]: same slice predicate, same bucket model,
    * pn/po bound as CTE columns so both engines reuse one double value,
    * same per-bucket micro-nat floor. */
  def klDriftSql(numBuckets: Int = 256, newMod: Int = 4): String = {
    val wh = Hash61.wordHashSql("uw_")
    val lamB = Lambda * numBuckets
    "WITH pos AS MATERIALIZED (SELECT source, " +
      s"CAST($wh % $numBuckets AS INTEGER) AS bucket, " +
      s"CASE WHEN ${Hash61.mixSql("doc_id::HUGEINT")} % $newMod = 0 THEN 1 ELSE 0 END AS is_new " +
      "FROM (SELECT doc_id, source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS uw_ FROM documents)), " +
      "bk AS MATERIALIZED (SELECT source, bucket, SUM(is_new) AS cn, SUM(1 - is_new) AS co FROM pos GROUP BY 1, 2), " +
      "tot AS (SELECT source, SUM(cn) AS tn, SUM(co) AS tl FROM bk GROUP BY 1), " +
      s"tm AS (SELECT bk.source, tn, tl, ((cn::DOUBLE + $Lambda) / (tn::DOUBLE + $lamB)) AS pn, " +
      s"((co::DOUBLE + $Lambda) / (tl::DOUBLE + $lamB)) AS po " +
      "FROM bk JOIN tot ON tot.source = bk.source) " +
      "SELECT source, CAST(MAX(tn) AS BIGINT) AS n_new_tokens, CAST(MAX(tl) AS BIGINT) AS n_old_tokens, " +
      "CAST(SUM(CAST(floor(pn * ln(pn / po) * 1000000) AS BIGINT)) AS BIGINT) AS kl_unats " +
      "FROM tm GROUP BY source"
  }

  /** CCNet-style LM scoring: per-document negative log-likelihood in
    * micro-nats under an add-one word-bigram model trained on the corpus
    * itself, `p(w2|w1) = (c(w1,w2)+1) / (cctx(w1)+V)` with `cctx(w1)` =
    * bigram positions starting at w1 and `V` = distinct vocabulary size.
    * `nll_per_bigram` (the perplexity exponent, integer-divided) is the
    * CCNet bucketing key: low = fluent-under-the-model head.
    *
    * Scale shape: unlike [[dsirWeights]]'s O(B) hashed model, a bigram
    * table grows with the corpus, so NOTHING is collected or broadcast:
    * the position stream equi-joins the bigram-count and context-count
    * aggregates on their hash keys, then sums per document — three
    * map-side-combined hash aggregates and two equi-joins, all
    * key-partitioned (AQE splits a skewed stop-bigram key). Collisions
    * of the 61-bit keys are negligible AND engine-identical (both sides
    * hash identically), so they cannot break the oracle.
    *
    * Emits (doc_id, n_bigrams, nll_unats, nll_per_bigram). */
  def perplexity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
    // one row per bigram position: (doc, h(w1), bigram hash)
    val pos = docs.flatMap { case (id, text) =>
      val whs = text.split(" ").filter(_.nonEmpty).map(Hash61.wordHash)
      (1 until whs.length).iterator
        .map(i => (id, whs(i - 1), Hash61.shingleN(whs, i - 1, 2)))
    }.toDF("doc_id", "h1", "bgh")
    val vocab = docs.flatMap { case (_, t) => t.split(" ").filter(_.nonEmpty) }
      .distinct().count()
    // one position-level aggregate feeds BOTH model tables: grouping by
    // (h1, bgh) first is exact (bgh counts and h1 context counts are
    // sums of the disjoint (h1, bgh) cells — no collision caveat), and
    // it gives the two branches an IDENTICAL child exchange, which the
    // engine reuses at runtime — the corpus bigram kernel runs once for
    // the model instead of once per table (guide §1.2/§2.4; the direct
    // groupBy("bgh") / groupBy("h1") pair exchanged on different keys,
    // so nothing could be shared and the typed flatMap ran twice). The
    // second aggregates are bigram-TYPE-level — tiny next to positions.
    val pairs = pos.groupBy("h1", "bgh").agg(count(lit(1)).as("c"))
    val cbg = pairs.groupBy("bgh").agg(sum(col("c")).as("cbg"))
    val cctx = pairs.groupBy("h1").agg(sum(col("c")).as("cctx"))
    val perPos = pos.join(cbg, "bgh").join(cctx, "h1")
      .select(col("doc_id"),
        floor(log((col("cbg") + 1).cast("double") /
          (col("cctx") + vocab).cast("double")) * lit(1e6))
          .cast("long").as("lp"))
    docs.toDF("doc_id", "text").select("doc_id")
      .join(perPos.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), (-sum(col("lp"))).as("nll_unats")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_unats"), lit(0L)).as("nll_unats"),
        when(col("n_bigrams").isNull, 0L)
          .otherwise(col("nll_unats") / col("n_bigrams")).cast("long")
          .as("nll_per_bigram"))
  }

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): each
    * source's documents are ranked by [[perplexity]]'s `nll_per_bigram`
    * (ascending — fluent first) and cut into terciles. Downstream
    * pipelines train preferentially on `head`, sample `middle`, and
    * drop or audit `tail`.
    *
    * The tercile is `((rank − 1) · 3) div n` on the deterministic
    * (nll_per_bigram, doc_id) rank — NOT `NTILE(3)`: engines place
    * NTILE's remainder rows differently, while this integer formula is
    * bit-identical everywhere. Scale shape: perplexity's key-partitioned
    * equi-joins plus ONE rank window per source (the quota sampler's
    * exchange shape); nothing new is collected or broadcast.
    *
    * Emits (doc_id, source, nll_per_bigram, bucket). */
  def ccnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = TableIO(spark, sfDir).read("documents").select("doc_id", "source")
    val w = Window.partitionBy("source")
      .orderBy(col("nll_per_bigram"), col("doc_id"))
    perplexity(spark, sfDir).join(src, "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("tercile", expr("((rn - 1) * 3) div n"))
      .select(col("doc_id"), col("source"), col("nll_per_bigram"),
        when(col("tercile") === 0, "head")
          .when(col("tercile") === 1, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** SQL replay of [[ccnetBuckets]]: [[perplexitySql]] as a nested CTE,
    * same deterministic rank, same integer tercile formula. */
  def ccnetBucketsSql(): String =
    s"WITH base AS MATERIALIZED (${perplexitySql()}), " +
      "j AS (SELECT base.doc_id, d.source, base.nll_per_bigram " +
      "FROM base JOIN documents d ON d.doc_id = base.doc_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source " +
      "ORDER BY nll_per_bigram, doc_id) AS rn, " +
      "COUNT(*) OVER (PARTITION BY source) AS n FROM j) " +
      "SELECT doc_id, source, nll_per_bigram, " +
      "CASE ((rn - 1) * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle' " +
      "ELSE 'tail' END AS bucket FROM r"

  /** SQL replay of [[perplexity]]: same word-hash stream, same bigram
    * shingle, ln floored to micro-nats per position before the sum. */
  def perplexitySql(): String = {
    val wh = Hash61.wordHashSql("uw_")
    val bg = Hash61.shingleNSql("whs", "pi_", 2)
    "WITH wd AS MATERIALIZED (SELECT doc_id, " +
      "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
      s"hs AS MATERIALIZED (SELECT doc_id, list_transform(ws, uw_ -> $wh) AS whs FROM wd), " +
      "pos AS MATERIALIZED (SELECT doc_id, whs[pi_] AS h1, " +
      s"$bg AS bgh FROM hs, unnest(range(1, len(whs))) AS t(pi_)), " +
      "v AS (SELECT COUNT(DISTINCT uw_) AS vocab FROM (SELECT unnest(ws) AS uw_ FROM wd)), " +
      "cbg AS MATERIALIZED (SELECT bgh, COUNT(*) AS cbg FROM pos GROUP BY bgh), " +
      "cctx AS MATERIALIZED (SELECT h1, COUNT(*) AS cctx FROM pos GROUP BY h1), " +
      "pp AS (SELECT pos.doc_id, CAST(floor(ln((cbg.cbg + 1)::DOUBLE / " +
      "(cctx.cctx + v.vocab)::DOUBLE) * 1000000) AS BIGINT) AS lp " +
      "FROM pos JOIN cbg USING (bgh) JOIN cctx USING (h1) CROSS JOIN v), " +
      "ds AS (SELECT doc_id, COUNT(*) AS nb, -SUM(lp) AS nll FROM pp GROUP BY doc_id) " +
      "SELECT wd.doc_id, CAST(coalesce(ds.nb, 0) AS BIGINT) AS n_bigrams, " +
      "CAST(coalesce(ds.nll, 0) AS BIGINT) AS nll_unats, " +
      "CAST(CASE WHEN ds.nb IS NULL THEN 0 ELSE ds.nll // ds.nb END AS BIGINT) AS nll_per_bigram " +
      "FROM wd LEFT JOIN ds ON ds.doc_id = wd.doc_id"
  }
}
