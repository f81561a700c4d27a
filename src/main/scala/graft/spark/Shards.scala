package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val sharded = docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (Hash61.mix(id) % numShards, id, text, rowHash(id, text))
      }
      .toDF("shard", "doc_id", "text", "row_hash")
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
}
