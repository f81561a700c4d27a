package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic training-shard writer — the terminal operator of the
  * curation pipeline: the curated corpus lands as `numShards` output
  * shards plus a MANIFEST (per shard: row count, byte size, content
  * hash) that a downstream trainer can audit before reading a byte.
  *
  * Shard assignment is `Hash61.mix(doc_id) % numShards` — a pure
  * function of the ROW, never of Spark partition indexes or arrival
  * order, so retries, re-runs, and different cluster sizes reproduce
  * every shard bit-exactly (the property that makes "resume the failed
  * writer job" safe: re-writing a shard yields the same shard).
  * Size balance is statistical (law of large numbers over the hash):
  * at production shard sizes — millions of rows each — relative
  * imbalance is negligible, and unlike greedy bin-packing by byte size
  * the assignment stays order-independent and deterministic.
  *
  * The content hash is the per-shard sum (mod 2^61−1) of per-row hashes
  * `mix(mix(doc_id) XOR fingerprint(text))` — commutative and
  * associative, so it map-side combines and is independent of row order
  * within the shard (parquet writers don't promise one); multiset-
  * sensitive (unlike an XOR fold, duplicated rows don't cancel). The
  * 128-bit-safe modular sum is a Decimal(38,0) aggregate on the Spark
  * side and a HUGEINT sum in the DuckDB oracle — identical integers.
  *
  * Scale shape: one exchange (the partitioned write clusters by shard),
  * and the manifest is a map-side-combined aggregate over the written
  * table. All I/O goes through the [[TableIO]] seam, same as
  * [[ExtractJob.runResumable]].
  */
object Shards {

  /** Per-row content hash: doc identity ⊕ word-sequence fingerprint
    * (the Rabin–Karp fold of [[TextAnalysis.fingerprint]]), mixed. */
  def rowHash(id: Long, text: String): Long = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    var fp = 0L
    words.foreach { w =>
      fp = (Hash61.mulmod(fp, TextAnalysis.FingerprintBase) + Hash61.rawWordHash(w)) % Hash61.M
    }
    Hash61.mix(Hash61.mix(id) ^ fp)
  }

  /** Shard rows of `docs` (doc_id, text, ...) deterministically, write
    * them shard-partitioned through `io` (dynamic partition overwrite —
    * a half-written shard from a crashed attempt is replaced wholesale
    * when re-run), and return the manifest computed FROM THE WRITTEN
    * TABLE — the manifest audits what is on disk, not what the job
    * intended to write. */
  def write(spark: SparkSession, docs: DataFrame, io: TableIO,
      outTable: String, numShards: Int = 64): DataFrame = {
    import spark.implicits._
    val sharded = TableIO.rebalanceSmall(docs
      .select(col("doc_id"), col("text")).as[(Long, String)])
      .map { case (id, text) =>
        (Hash61.mix(id) % numShards, id, text, rowHash(id, text))
      }
      .toDF("shard", "doc_id", "text", "row_hash")
      // the exchange the scaladoc promises: cluster by shard before the
      // partitioned write, so each shard is written by one task — without
      // it every input partition opens a file in every shard directory
      // (scan_partitions × numShards small files; guide §6 "small files
      // hurt twice"). The partition count is EXPLICIT: a bare
      // repartition(col) lets AQE coalesce the tiny local corpus to one
      // partition, and that single task then opens all numShards writers
      // sequentially (measured 0.84 s of a 1.2 s query); one partition
      // per shard is also the right write parallelism at any scale.
      .repartition(numShards, col("shard"))
    io.writePartitioned(sharded, outTable, "shard")
    manifest(io.read(outTable))
  }

  /** Manifest of a written shard table (shard, doc_id, text, row_hash):
    * per shard — rows, bytes (UTF-8 text payload), content hash. */
  def manifest(written: DataFrame): DataFrame =
    written
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(octet_length(col("text"))).cast("long").as("n_bytes"),
        // modular sum in Decimal(38,0): row hashes are < 2^61, so the
        // un-reduced sum stays far below 10^38 at any realistic shard
        // row count (2^61·2^33 ≈ 10^28) — one mod at the end is exact
        (sum(col("row_hash").cast(DecimalType(38, 0))) % lit(Hash61.M))
          .cast("long").as("content_hash"))

  /** Concat-and-chunk sequence packing — the GPT-style pre-training
    * layout: within each shard, documents concatenate in `doc_id` order
    * into one token stream that is cut into fixed-`seqLen` training
    * sequences; a document whose tokens straddle a cut is a boundary
    * crosser (the fraction the trainer's attention-mask / doc-boundary
    * handling has to care about). Token count is the whitespace word
    * model shared with the quality/dedup family.
    *
    * Packing is defined WITHIN a shard, never globally — the global
    * order a monolithic packer needs is exactly what doesn't scale, and
    * [[write]]'s hash assignment already makes shards the reproducible
    * unit. Scale shape: assignment + token count are row-local; one
    * exchange clusters by shard; the running sum is a window per shard
    * (a sort within the shard's partition — shard count grows with the
    * corpus, so the sorted run stays bounded). Deterministic: position
    * is a pure function of (doc_id set, seqLen), independent of
    * parallelism, retries, and arrival order.
    *
    * Emits one row per document: (shard, doc_id, n_tokens, start_tok,
    * seq_first, seq_last, crosses). */
  def packSequences(spark: SparkSession, sfDir: String,
      numShards: Int = 8, seqLen: Int = 64): DataFrame = {
    import spark.implicits._
    require(seqLen > 0 && numShards > 0)
    val toks = TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) =>
        (Hash61.mix(id) % numShards, id,
          text.split(" ").count(_.nonEmpty).toLong)
      }
      .toDF("shard", "doc_id", "n_tokens")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        (col("end_tok") - col("n_tokens")).as("start_tok"),
        // exact BIGINT division (`div`), matching the oracle's `//`: a
        // DOUBLE round-trip loses exactness once end_tok exceeds 2^53,
        // which the 100 TB contract must not assume away (ADVICE r4)
        expr(s"(end_tok - n_tokens) div $seqLen").as("seq_first"),
        expr(s"greatest(end_tok - 1, end_tok - n_tokens) div $seqLen")
          .as("seq_last"))
      .withColumn("crosses",
        (col("seq_first") =!= col("seq_last")).cast("long"))
  }

  /** Deterministic train/val/test assignment: `rank = mix(mix(doc_id)
    * xor SplitSalt) % 10^6` parts-per-million thresholds. Hash-threshold
    * (not per-source ntile windows) is the 100 TB shape: the assignment
    * is ROW-LOCAL — zero shuffles, identical under retries, append-only
    * under corpus growth (a doc's split never changes when new docs
    * arrive, which per-source ranking cannot promise) — and the salt
    * makes it independent of [[write]]'s shard hash, so eval rows spread
    * uniformly over shards. Stratification per source is exact in
    * expectation (hash ⊥ source); the judge of that tolerance is the
    * spec, not a second shuffle.
    *
    * Emits (doc_id, source, split_rank_ppm, split). */
  def splitAssign(spark: SparkSession, sfDir: String,
      valPpm: Int = 10000, testPpm: Int = 10000): DataFrame = {
    require(valPpm >= 0 && testPpm >= 0 && valPpm + testPpm < 1000000)
    VectorFunctions.register(spark)
    // pure column arithmetic on the codegen'd hash61_mix expression — no
    // typed map, so the whole stage (scan → rank → case → project) is one
    // WholeStageCodegen span with no object-serialization barrier
    // (PlanSpec-pinned); mix ∈ [0, 2^61) and the salt < 2^31, so the xor
    // stays inside the mixer's input domain
    TableIO(spark, sfDir).read("documents")
      .select(col("doc_id"), col("source"))
      .withColumn("split_rank_ppm",
        call_function("hash61_mix",
          call_function("hash61_mix", col("doc_id"))
            .bitwiseXOR(lit(SplitSalt))) % 1000000L)
      .withColumn("split",
        when(col("split_rank_ppm") < testPpm, "test")
          .when(col("split_rank_ppm") < testPpm + valPpm, "val")
          .otherwise("train"))
  }

  /** Salt decorrelating [[splitAssign]]'s rank from [[write]]'s shard
    * hash (both start from `mix(doc_id)`). */
  val SplitSalt: Long = 0x5eed5a17L

  /** SQL replay of [[splitAssign]]. */
  def splitAssignSql(valPpm: Int = 10000, testPpm: Int = 10000): String = {
    val rank = Hash61.mixSql(
      s"xor(${Hash61.mixSql("doc_id::HUGEINT")}, $SplitSalt)")
    s"SELECT doc_id, source, CAST($rank % 1000000 AS BIGINT) AS split_rank_ppm, " +
      s"CASE WHEN $rank % 1000000 < $testPpm THEN 'test' " +
      s"WHEN $rank % 1000000 < ${testPpm} + ${valPpm} THEN 'val' " +
      "ELSE 'train' END AS split FROM documents"
  }

  /** SQL replay of [[packSequences]]: same mix-assignment, same word
    * model, same per-shard running sum (integer window — order-free
    * given the unique doc_id sort key). */
  def packSequencesSql(numShards: Int = 8, seqLen: Int = 64): String =
    s"WITH t AS (SELECT CAST(${Hash61.mixSql("doc_id::HUGEINT")} % $numShards AS BIGINT) AS shard, " +
      "doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens " +
      "FROM documents), " +
      "c AS (SELECT shard, doc_id, n_tokens, " +
      "SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS end_tok FROM t) " +
      "SELECT shard, doc_id, n_tokens, " +
      "CAST(end_tok - n_tokens AS BIGINT) AS start_tok, " +
      s"CAST((end_tok - n_tokens) // $seqLen AS BIGINT) AS seq_first, " +
      s"CAST(greatest(end_tok - 1, end_tok - n_tokens) // $seqLen AS BIGINT) AS seq_last, " +
      s"CAST(CASE WHEN (end_tok - n_tokens) // $seqLen <> " +
      s"greatest(end_tok - 1, end_tok - n_tokens) // $seqLen THEN 1 ELSE 0 END AS BIGINT) AS crosses " +
      "FROM c"
}
