package graft.spark

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the query-side face of the
  * engine: BM25 (Robertson et al., Okapi TREC-3) top-k for a bounded set
  * of query strings.
  *
  * Scale shape (100 TB): the query set is user input — tiny and
  * broadcast; the corpus-side term-frequency table is built once by a
  * map-side-combined explode+count (the inverted-index layout — in
  * production it is persisted bucketed by word, so per-query cost is an
  * index probe, not a scan). Joining the broadcast terms FIRST means df,
  * the per-(query,doc) accumulation, and the rank window all run over
  * postings of the query terms only, never the full index. The final
  * top-k is a per-query window over scored documents — scored pairs are
  * the only rows that cross the last exchange.
  *
  * Float determinism: the per-(term,doc) BM25 contribution is floored to
  * integer MICRO-UNITS before the per-document sum, so document scores
  * are exact integer sums and the rank order is engine-identical (the
  * tfidf floor-then-rank technique). All derived double constants
  * (k1+1, λ-style products) are computed once on the JVM and
  * interpolated into the oracle SQL via `toString` — shortest-repr
  * round-trip makes both engines use bit-identical doubles.
  */
object Retrieval {

  val K1: Double = 1.2
  val B: Double = 0.75

  /** Default query workload: multi-word queries over the synthetic
    * vocabulary (queries are an API input, not data — these defaults
    * exist so the driver-visible face is self-contained). */
  val DefaultQueries: Seq[String] = Seq(
    "fast hash join",
    "slow table scan",
    "window sort merge",
    "spark stream batch",
    "customer order line",
    "big data query",
    "dup filter scan",
    "vector column agg")

  /** The per-(term, doc) BM25 contribution in floored integer
    * micro-units — ONE copy of the formula shared by the one-shot scan
    * and the persisted-index probe, so the two faces are score-identical
    * by construction. Needs columns tf, df, dl, n_docs, avgdl in scope. */
  private def microScore: Column = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val frac = (col("tf") * lit(K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl") / col("avgdl")))
    floor(idf * frac * lit(1e6)).cast("long")
  }

  /** Per-query top-k rank over the scored (query_id, doc_id, score_u)
    * stream: rank 1..k by (score desc, doc_id asc). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_u").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id").cast("int").as("query_id"), col("rank"),
        col("doc_id"), col("score_u").cast("long").as("score_u"))
  }

  private def termsFrame(spark: SparkSession, queries: Seq[String]): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && queries.size <= 10000,
      "query set must be a bounded broadcastable workload")
    queries.zipWithIndex.flatMap { case (q, i) =>
      q.split(" ").filter(_.nonEmpty).distinct.map(t => (i, t))
    }.toDF("query_id", "word").distinct()
  }

  /** BM25 top-k documents per query.
    * Emits (query_id, rank, doc_id, score_u) with rank 1..k by
    * (floored-micro-unit score desc, doc_id asc). */
  def bm25TopK(spark: SparkSession, sfDir: String,
      queries: Seq[String] = DefaultQueries, k: Int = 5): DataFrame = {
    val terms = termsFrame(spark, queries)
    val queryWords = queries.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    val docs = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents"))
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
      // drop non-query words BEFORE the tf aggregate (guide §3.2 semi-
      // join pre-filter, here exact since the term list is tiny driver
      // state): the aggregate then counts postings of the query terms
      // only instead of the whole vocabulary — the inner join on word
      // below made this restriction anyway, just one exchange too late
      .where(col("word") =!= "" && col("word").isin(queryWords: _*))
    // query-term postings with term frequency (map-side combined)
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val qtf = tf.join(broadcast(terms), "word")
    val df = qtf.select("word", "doc_id").distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val dls = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("dl"))
    val stats = dls.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    val scored = qtf.join(broadcast(df), "word").join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), microScore.as("su"))
      .groupBy("query_id", "doc_id").agg(sum(col("su")).as("score_u"))
    rankTopK(scored, k)
  }

  /** Build the STANDING BM25 index through `io` — the production
    * lifecycle the scaladoc above promises (VERDICT r4 #2): the corpus
    * is tokenized, counted, and measured ONCE per snapshot; every query
    * workload afterwards is an index probe ([[bm25TopKIndexed]]) that
    * never touches the corpus text again. Three tables:
    *  - `<prefix>_postings` (word, doc_id, tf, dl): the inverted index,
    *    denormalized with the document length so the probe needs no
    *    doc-axis join;
    *  - `<prefix>_wordstats` (word, df): full per-word document
    *    frequency (query-independent, unlike the one-shot scan's
    *    query-restricted df — same values for the probed words);
    *  - `<prefix>_stats` (n_docs, avgdl): one row. avgdl is an exact
    *    integer sum divided once, so the stored double is identical to
    *    the one-shot computation. */
  def writeIndex(spark: SparkSession, sfDir: String, io: TableIO,
      prefix: String = "bm25"): Unit = {
    val docs = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents"))
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
    // persist: the corpus tokenize+count feeds BOTH the postings and the
    // wordstats writes — without the cache the full explode+aggregate
    // runs once per output table (guide §1.2: don't repeat passes)
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf")).persist()
    val dls = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("dl"))
      .persist()
    try {
      io.write(tf.join(dls, "doc_id").select("word", "doc_id", "tf", "dl"),
        s"${prefix}_postings", SaveMode.Overwrite)
      io.write(tf.groupBy("word").agg(count(lit(1)).as("df")),
        s"${prefix}_wordstats", SaveMode.Overwrite)
      io.write(dls.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")),
        s"${prefix}_stats", SaveMode.Overwrite)
    } finally { tf.unpersist(blocking = false); dls.unpersist(blocking = false) }
  }

  /** Probe the standing [[writeIndex]] tables: broadcast the query terms
    * into the stored postings, score with the shared [[microScore]]
    * formula, rank. Score-identical to [[bm25TopK]] (longs and stored
    * doubles round-trip parquet exactly); the plan reads ONLY the index
    * tables — per-query cost is postings-of-the-query-terms, the corpus
    * is never rescanned or re-aggregated (pinned in PlanSpec). */
  def bm25TopKIndexed(spark: SparkSession, io: TableIO,
      queries: Seq[String] = DefaultQueries, k: Int = 5,
      prefix: String = "bm25"): DataFrame = {
    val terms = termsFrame(spark, queries)
    val queryWords = queries.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    // the isin predicate (unlike the broadcast join alone) pushes down
    // to the postings/wordstats parquet scans — PushedFilters: In(word)
    // — so the probe reads the query terms' postings, not the index
    val qtf = io.read(s"${prefix}_postings")
      .where(col("word").isin(queryWords: _*))
      .join(broadcast(terms), "word")
    // df rows for the query words only — tiny, broadcast
    val df = io.read(s"${prefix}_wordstats")
      .where(col("word").isin(queryWords: _*))
      .join(broadcast(terms.select("word").distinct()), "word")
    val scored = qtf.join(broadcast(df), "word")
      .crossJoin(broadcast(io.read(s"${prefix}_stats")))
      .select(col("query_id"), col("doc_id"), microScore.as("su"))
      .groupBy("query_id", "doc_id").agg(sum(col("su")).as("score_u"))
    rankTopK(scored, k)
  }

  /** SQL replay of [[bm25TopK]]: same query VALUES, same word model,
    * same per-(term,doc) micro-unit floor before the integer sum, same
    * (score desc, doc_id) rank. */
  def bm25TopKSql(queries: Seq[String] = DefaultQueries, k: Int = 5): String = {
    val vals = queries.zipWithIndex.flatMap { case (q, i) =>
      q.split(" ").filter(_.nonEmpty).distinct.map(t => s"($i, '$t')")
    }.mkString(", ")
    val k1p1 = K1 + 1.0
    s"WITH q(query_id, word) AS (VALUES $vals), " +
      "dls AS MATERIALIZED (SELECT doc_id, " +
      "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS dl FROM documents), " +
      "st AS (SELECT count(*) AS n_docs, SUM(dl)::DOUBLE / count(*) AS avgdl FROM dls), " +
      "wrds AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents), " +
      "tf AS MATERIALIZED (SELECT doc_id, word, COUNT(*) AS tf FROM wrds GROUP BY 1, 2), " +
      "qtf AS MATERIALIZED (SELECT q.query_id, tf.doc_id, tf.word, tf.tf FROM tf JOIN q USING (word)), " +
      "df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM qtf GROUP BY 1), " +
      "sc AS (SELECT query_id, qtf.doc_id, CAST(floor(" +
      "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * " +
      s"((tf * $k1p1) / (tf + $K1 * (1.0 - $B + $B * dl / avgdl))) " +
      "* 1000000.0) AS BIGINT) AS su " +
      "FROM qtf JOIN df USING (word) JOIN dls ON dls.doc_id = qtf.doc_id CROSS JOIN st), " +
      "ds AS (SELECT query_id, doc_id, SUM(su) AS score_u FROM sc GROUP BY 1, 2) " +
      "SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rn AS INTEGER) AS \"rank\", " +
      "doc_id, CAST(score_u AS BIGINT) AS score_u FROM (" +
      "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS rn FROM ds) " +
      s"WHERE rn <= $k"
  }
}
