package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: integer-exact
  * metrics (DuckDB-oracled), language-ID heuristic, rolling-hash document
  * fingerprinting. All whole-stage-codegen-friendly (built-in functions;
  * the lang-id map lookup is a typed map over a tiny broadcastable table).
  */
object TextAnalysis {

  /** Integer-exact quality metrics; every column reproducible in ANSI SQL
    * (the DuckDB oracle in SparkEntry mirrors it 1:1). */
  def metrics(spark: SparkSession, sfDir: String): DataFrame = {
    TableIO(spark, sfDir).read("documents")
      .select(
        col("doc_id"),
        expr("size(split(trim(text), ' +'))").cast("long").as("n_words"),
        length(col("text")).cast("long").as("n_chars_m"),
        // BPE-ish token estimate: ceil(len / 4) in pure integer arithmetic
        expr("cast(floor((length(text) + 3) / 4) as bigint)").as("token_estimate"),
        // occurrences of ' the ' — divisible-by-5 arithmetic, exact
        expr("cast((length(text) - length(replace(text, ' the ', ''))) / 5 as bigint)")
          .as("the_count"),
        // BPE-ish regex tokenizer count (GPT-2-style word/number/punct
        // classes, lookaheads omitted — RE2 in the DuckDB oracle has
        // none). Codegen'd RegExpExtractAll.
        expr("cast(size(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +', 0)) as bigint)")
          .as("token_count_bpe"))
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "en", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "in", "ist", "von", "ein"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you"))

  /** Language-ID heuristic: per language, the fraction of words that are
    * that language's stopwords; argmax wins ('und' = undetermined when no
    * stopword hits). A real corpus would use char n-gram profiles — the
    * operator shape (per-row scoring against a tiny broadcast profile
    * table) is the same. */
  /** Shared prediction kernel (used by both the corpus query and the
    * oracle-checked class query). */
  def predict(text: String): (String, Double) = {
    val words = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    val total = math.max(words.length, 1)
    val scores = stopwords.map { case (lang, s) =>
      lang -> words.count(s.contains).toDouble / total
    }
    val best = scores.maxBy { case (l, v) => (v, l) }
    (if (best._2 > 0) best._1 else "und", best._2)
  }

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // all four lang-id faces and the fingerprint rebalance their
    // single-row-group scan so the row-local scorers run at full
    // parallelism (guide §2.5; size-guarded, no exchange at scale)
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) =>
        val (lang, ratio) = predict(text)
        (id, lang, ratio)
      }.toDF("doc_id", "predicted_lang", "stopword_ratio")
  }

  /** Discriminating lang-ID check: deterministic stopword-rich payloads,
    * one language class per doc_id % 6 (the real corpus is all-English,
    * which would make an oracle vacuous). Class 5 has no stopwords at
    * all → 'und'. */
  def langIdClasses(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val langs = Vector("en", "es", "fr", "de", "zh")
    val sw = stopwords
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id").as[Long])
      .map { id =>
        val cls = (id % 6).toInt
        val payload =
          if (cls == 5) s"zyx$id wvu$id tsr$id qpo$id"
          else (sw(langs(cls)).mkString(" ") + " ") * 5 + s"filler$id"
        (id, TextAnalysis.predict(payload)._1)
      }.toDF("doc_id", "predicted_lang")
  }

  // ---------- n-gram language ID (round 2 — the discriminating face) ----

  /** Char-trigram profiles: the most frequent trigrams of each language
    * (public knowledge — any frequency table of en/es/fr/de text yields
    * these). Chinese is NOT profile-scored: real CJK text is caught by a
    * Unicode-script gate ([[predictNgram]]), which the round-1 stopword
    * scorer could never match (its 'zh' stopwords were pinyin). */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "er ", " de", "die", "ie ", "und", "nd ", " un",
      "sch", " sc", "ein", " ei", "ich", "ch ", "en ", "ung", "gen", "das",
      " da", "ber", "cht", "den", " ge", "ten"),
    "en" -> Seq("the", "he ", " th", "ing", "ng ", "and", " an", "ion",
      "tio", "ent", " of", "of ", " to", "to ", "ed ", " in", "is ", " is",
      "hat", "er ", "es ", " be", "at ", "on "),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "ión", "ció", "aci",
      " es", "es ", " en", "en ", "que", " qu", "ue ", "ado", "los", " lo",
      "ar ", "nte", " co", "el ", " el", "as "),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", "nt ", " la",
      "la ", "ion", " et", "et ", "les", "une", " un", "re ", "ait", "eur",
      "aux", " pa", "our", "ur ", "ais", "dan"))

  /** Trigram/script language ID: CJK-script gate first (fraction of CJK
    * Unified Ideographs among non-space chars > 0.2 ⇒ 'zh'), else the
    * argmax of per-language trigram-hit ratios over the space-padded
    * normalized text; 'und' when nothing matches. */
  def predictNgram(text: String): (String, Double) = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    var cjk = 0
    var nonSpace = 0
    t.foreach { c =>
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      if (!Character.isWhitespace(c)) nonSpace += 1
    }
    if (nonSpace > 0 && cjk.toDouble / nonSpace > 0.2)
      return ("zh", cjk.toDouble / nonSpace)
    val words = t.split("\\s+").filter(_.nonEmpty)
    val norm = " " + words.mkString(" ") + " "
    val total = norm.length - 2
    if (total <= 0) return ("und", 0.0)
    var bestLang = "und"
    var bestRatio = 0.0
    var first = true
    trigramProfiles.foreach { case (lang, profile) =>
      val set = profile.toSet
      var cnt = 0
      var i = 0
      while (i < total) {
        if (set.contains(norm.substring(i, i + 3))) cnt += 1
        i += 1
      }
      val ratio = cnt.toDouble / total
      // maxBy (ratio, lang): strictly greater, or equal ratio + later lang
      if (first || ratio > bestRatio || (ratio == bestRatio && lang > bestLang)) {
        bestLang = lang; bestRatio = ratio; first = false
      }
    }
    (if (bestRatio > 0) bestLang else "und", bestRatio)
  }

  /** n-gram lang-ID over the corpus (oracle replays the full scorer in
    * SQL: trigram extraction, profile membership counts, argmax, gate). */
  def langIdNgram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) =>
        val (lang, ratio) = predictNgram(text)
        (id, lang, ratio)
      }.toDF("doc_id", "predicted_lang", "trigram_ratio")
  }

  /** Discriminating check on REAL multilingual text — incl. actual CJK
    * for zh (the round-1 gap) — one language class per doc_id % 6. */
  def langIdNgramClasses(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val samples = Vector(
      "the quick brown fox jumps over the lazy dog and then it runs into the woods again",
      "el zorro marrón salta sobre el perro perezoso que duerme en la casa de la señora",
      "le renard brun saute par dessus le chien paresseux dans la maison de la dame",
      "der schnelle braune fuchs springt über den faulen hund und läuft in den wald",
      "敏捷的棕色狐狸跳过了懒惰的狗然后跑进了山里的树林",
      "12345 67890 24680 13579")
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id").as[Long])
      .map { id =>
        val payload = samples((id % 6).toInt) + " " + id
        (id, TextAnalysis.predictNgram(payload)._1)
      }.toDF("doc_id", "predicted_lang")
  }

  /** Rabin–Karp base of the document fingerprint fold (shared with the
    * HLL sketch's document hash — [[Sketches.hllDistinctPerSource]]). */
  val FingerprintBase = 1000003L

  /** Rolling-hash (Rabin–Karp, mod 2^61-1) document fingerprint over
    * words. Deterministic pure function of the text; allocation-free
    * multiply-mod via [[Hash61.mulmod]] (Math.multiplyHigh + Mersenne
    * folding — the round-1 BigInteger hot-loop is gone). NOTE: round-1
    * values are NOT preserved on purpose — the old inner fold's `wh*131`
    * silently wrapped Long for wh ≥ 2^56, so those values were never the
    * documented mod-M function; the correct fold (Hash61Spec pins it
    * against BigInteger) is what the DuckDB oracle now checks. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val M = Hash61.M
    val B = FingerprintBase
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) =>
        val words = text.split("\\s+").filter(_.nonEmpty)
        var h = 0L
        words.foreach { w =>
          h = (Hash61.mulmod(h, B) + Hash61.rawWordHash(w)) % M
        }
        (id, h, words.length.toLong)
      }.toDF("doc_id", "fingerprint", "n_words")
  }

  /** Inter-source content-overlap matrix: Jaccard similarity of the
    * DISTINCT word-3-shingle sets of every source pair — the corpus-level
    * diagnostic that tells a curation run which crawl sources are
    * near-copies of each other (mirror domains, syndication networks)
    * BEFORE doc-pair dedup spends a shuffle on them.
    *
    * Plan shape and why it scales: shingle hashing is row-local
    * ([[Dedup.shingleHashes]], the same GF(2^61-1) kernel every
    * signature operator shares); `distinct(source, shingle)` collapses
    * corpus size to (sources × shingle-space) in ONE exchange with
    * map-side partial aggregation; the pair counts come from a self
    * equi-join on the shingle hash — an inverted-index meet whose
    * per-key fanout is bounded by #sources² (a fixed catalog, ~10³ at
    * web scale), never by corpus size; and the final matrix is
    * #sources² rows. No all-pairs document scan exists at any stage.
    * Pairs that share nothing still appear (jaccard 0) via the
    * broadcast cross of the tiny per-source count table — an absent row
    * and a zero row mean different things in a source audit. */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val srcShingles = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("source", "text").as[(String, String)])
      .flatMap { case (src, text) =>
        Dedup.shingleHashes(text).distinct.map(h => (src, h)) }
      .toDF("source", "sh")
      .distinct()
    val counts = srcShingles.groupBy("source")
      .agg(count(lit(1)).as("n"))
    val inter = srcShingles.select(col("sh"), col("source").as("source_a"))
      .join(srcShingles.select(col("sh"), col("source").as("source_b")), "sh")
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
    val pairs = broadcast(counts.select(col("source").as("source_a"), col("n").as("n_a")))
      .join(broadcast(counts.select(col("source").as("source_b"), col("n").as("n_b"))),
        col("source_a") < col("source_b"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_shared"), lit(0L))))
          .as("jaccard"))
  }

  /** DuckDB replay of [[sourceOverlap]]: same Hash61 3-shingles, same
    * distinct-set Jaccard, same zero-pair completion. */
  def sourceOverlapSql(): String =
    "WITH wdocs AS (SELECT source, list_transform(" +
      "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> ''), " +
      s"w -> ${Hash61.wordHashSql("w")}) AS whs FROM documents), " +
      "g AS (SELECT DISTINCT source, unnest(list_transform(range(1, len(whs) - 1), " +
      s"i -> ${Hash61.shingle3Sql("whs[i]", "whs[i+1]", "whs[i+2]")})) AS sh " +
      "FROM wdocs WHERE len(whs) >= 3), " +
      "c AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source), " +
      "i AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared " +
      "FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2) " +
      "SELECT ca.source AS source_a, cb.source AS source_b, " +
      "ca.n AS n_a, cb.n AS n_b, COALESCE(i.n_shared, 0) AS n_shared, " +
      "CAST(COALESCE(i.n_shared, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(i.n_shared, 0)) AS jaccard " +
      "FROM c ca JOIN c cb ON ca.source < cb.source " +
      "LEFT JOIN i ON i.source_a = ca.source AND i.source_b = cb.source"
}
