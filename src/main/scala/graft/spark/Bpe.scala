package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE-style tokenizer-merge training (Sennrich et al. 2016) and
  * application — real pipelines don't just ESTIMATE token counts
  * ([[TextAnalysis.metrics]]), they train the merges that define them.
  *
  * Training follows the standard shape: symbols start as characters;
  * each iteration counts adjacent symbol pairs across the weighted
  * vocabulary (overlapping positions count, as in the reference
  * implementation), merges the most frequent pair (ties: smaller (left,
  * right) lexicographically), and rewrites the vocabulary with a
  * left-to-right non-overlapping replacement.
  *
  * Scale split, same pattern as the Lloyd-trained quantizer
  * ([[Similarity.trainQuantizer]]): the corpus-sized work — the word
  * frequency count — is a distributed map-side-combined aggregate with a
  * TakeOrdered top-`vocabTopK` (never a global sort); the iterative
  * merge loop then runs on that BOUNDED weighted vocabulary on the
  * driver (≤ vocabTopK rows — iterating distributed would shuffle the
  * corpus `numMerges` times for no benefit, since merge decisions need
  * only the vocab). Application ([[tokenCounts]]) broadcasts the ≤
  * `numMerges` merge table and is ROW-LOCAL over any corpus size.
  *
  * Every step is deterministic and integer/string-valued, so the DuckDB
  * oracle replays the FULL training (32 chained pair-count/argmax/
  * rewrite CTE rounds) and the application bit-exactly
  * (SparkEntry.oracleSql `bpe_merges` / `bpe_token_counts`). */
object Bpe {

  final case class Merge(merge_idx: Int, lhs: String, rhs: String, pair_count: Long)

  /** Left-to-right non-overlapping merge application — the kernel shared
    * by training and application, mirrored by the oracle's string fold:
    * append each symbol; when the last equals `l` and the next is `r`,
    * replace the last with `l+r` (the freshly merged symbol never
    * re-merges in the same pass, because it equals `l+r`, not `l`). */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      if (buf.nonEmpty && buf.last == l && s == r)
        buf(buf.length - 1) = l + r
      else buf += s
      i += 1
    }
    buf.toArray
  }

  /** The weighted top-`vocabTopK` vocabulary: word → corpus count,
    * (count DESC, word) ordered — a TakeOrdered, never a global sort. */
  private def topVocab(spark: SparkSession, sfDir: String,
      vocabTopK: Int): Array[(String, Long)] = {
    import spark.implicits._
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents"))
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(vocabTopK)
      .as[(String, Long)].collect()
  }

  /** Driver-side merge loop over a bounded weighted vocabulary. */
  private[graft] def trainOn(vocab: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.toCharArray.map(_.toString), c) }
    val merges = Seq.newBuilder[Merge]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), cnt, java.lang.Long.sum)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v > best._2 ||
            (v == best._2 && Ordering[(String, String)].lt(k, best._1)))
            best = (k, v)
        }
        val ((l, r), c) = best
        merges += Merge(m, l, r, c)
        words = words.map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
        m += 1
      }
    }
    merges.result()
  }

  /** Train `numMerges` merges over the corpus's top-`vocabTopK` words.
    * Output: (merge_idx, lhs, rhs, pair_count), one row per merge in
    * training order. */
  def trainMerges(spark: SparkSession, sfDir: String,
      numMerges: Int = 32, vocabTopK: Int = 256): DataFrame = {
    import spark.implicits._
    spark.createDataset(trainOn(topVocab(spark, sfDir, vocabTopK), numMerges))
      .toDF()
  }

  /** Apply the trained merges to EVERY document (row-local, merges
    * broadcast): per-doc token count under the trained tokenizer next to
    * the raw word count — the "how many tokens is my corpus" face. */
  def tokenCounts(spark: SparkSession, sfDir: String,
      numMerges: Int = 32, vocabTopK: Int = 256): DataFrame = {
    import spark.implicits._
    val merges = trainOn(topVocab(spark, sfDir, vocabTopK), numMerges)
      .map(mg => (mg.lhs, mg.rhs))
    val bc = spark.sparkContext.broadcast(merges)
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        var tokens = 0L
        words.foreach { w =>
          var syms = w.toCharArray.map(_.toString)
          bc.value.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
          tokens += syms.length
        }
        (id, words.length.toLong, tokens)
      }.toDF("doc_id", "n_words", "n_tokens")
  }

  // ---------- DuckDB replay (SQL generators) ----------

  /** The sep-encoded merge-application fold: symbols ride a chr(31)-
    * separated string so the list_reduce accumulator stays VARCHAR
    * (DuckDB folds element-typed accumulators only). `ends_with(acc,
    * sep || l)` is exact last-symbol equality because every symbol is
    * sep-prefixed and symbols never contain the separator. */
  private def applySql(syms: String, l: String, r: String): String =
    s"list_filter(string_split(list_reduce(list_prepend('', $syms), " +
      s"(acc_, s_) -> CASE WHEN $l IS NOT NULL AND s_ = $r AND ends_with(acc_, chr(31) || $l) " +
      s"THEN left(acc_, length(acc_) - length($l)) || $l || $r " +
      "ELSE acc_ || chr(31) || s_ END), chr(31)), x_ -> x_ <> '')"

  /** CTE chain replaying [[trainOn]]: v/w0 (top-K weighted vocab as char
    * symbols), then per round i: p_i (weighted adjacent-pair counts),
    * m_i (argmax with the (count DESC, l, r) tie-break), w_{i+1} (the
    * rewrite; LEFT JOIN ON TRUE so an exhausted vocabulary passes
    * through unchanged). */
  private def trainCtes(numMerges: Int, vocabTopK: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH v AS MATERIALIZED (SELECT w AS word, COUNT(*) AS cnt FROM (")
    sb.append("SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w FROM documents) ")
    sb.append(s"GROUP BY w ORDER BY cnt DESC, w LIMIT $vocabTopK), ")
    sb.append("w0 AS MATERIALIZED (SELECT word, cnt, ")
    sb.append("list_filter(string_split(word, ''), x -> x <> '') AS syms FROM v), ")
    for (i <- 0 until numMerges) {
      sb.append(s"p$i AS MATERIALIZED (SELECT syms[j] AS l, syms[j+1] AS r, SUM(cnt) AS c ")
      sb.append(s"FROM w$i, unnest(generate_series(1, len(syms) - 1)) AS t(j) ")
      sb.append("WHERE len(syms) >= 2 GROUP BY 1, 2), ")
      sb.append(s"m$i AS MATERIALIZED (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1), ")
      sb.append(s"w${i + 1} AS MATERIALIZED (SELECT word, cnt, ")
      sb.append(applySql("syms", "m.l", "m.r"))
      sb.append(s" AS syms FROM w$i LEFT JOIN m$i AS m ON TRUE), ")
    }
    sb.toString
  }

  /** Full-training oracle for `bpe_merges`. */
  def mergesSql(numMerges: Int = 32, vocabTopK: Int = 256): String =
    trainCtes(numMerges, vocabTopK).stripSuffix(", ") + " " +
      (0 until numMerges).map { i =>
        s"SELECT $i AS merge_idx, l AS lhs, r AS rhs, CAST(c AS BIGINT) AS pair_count FROM m$i"
      }.mkString(" UNION ALL ")

  /** Application oracle for `bpe_token_counts`: the train chain, then
    * the merges applied to the DISTINCT corpus words (the dictionary
    * trick — each word is rewritten once, then joined back with
    * multiplicity), summed per document. */
  def tokenCountsSql(numMerges: Int = 32, vocabTopK: Int = 256): String = {
    val sb = new StringBuilder(trainCtes(numMerges, vocabTopK))
    sb.append("dw AS MATERIALIZED (SELECT DISTINCT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents), ")
    sb.append("a0 AS MATERIALIZED (SELECT word, list_filter(string_split(word, ''), x -> x <> '') AS syms FROM dw), ")
    for (i <- 0 until numMerges) {
      sb.append(s"a${i + 1} AS MATERIALIZED (SELECT word, ")
      sb.append(applySql("syms", "m.l", "m.r"))
      sb.append(s" AS syms FROM a$i LEFT JOIN m$i AS m ON TRUE), ")
    }
    sb.append("occ AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents) ")
    sb.append("SELECT d.doc_id, CAST(COALESCE(COUNT(a.word), 0) AS BIGINT) AS n_words, ")
    sb.append(s"CAST(COALESCE(SUM(len(a.syms)), 0) AS BIGINT) AS n_tokens ")
    sb.append(s"FROM documents d LEFT JOIN occ ON occ.doc_id = d.doc_id ")
    sb.append(s"LEFT JOIN a$numMerges a ON a.word = occ.word GROUP BY d.doc_id")
    sb.toString
  }
}
