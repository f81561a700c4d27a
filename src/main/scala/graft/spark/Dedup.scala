package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, over the
  * `documents` table. All declarative DataFrame plans: Catalyst handles
  * pushdown/pruning; the only shuffles are the groupBys/joins on the
  * dedup keys themselves.
  *
  * Scale notes (100 TB): exact dedup is one hash-aggregate on md5(text)
  * (map-side partial aggregation collapses duplicates before the
  * exchange). MinHash/SimHash banding turns all-pairs similarity into
  * equi-joins on small band keys — candidate pairs only, never n². Skewed
  * bands (e.g. empty-text clusters) are handled by AQE skew-join; the band
  * join keys include the band index so one hot signature spreads over
  * `bands` keys.
  */
object Dedup {

  /** Exact duplicate groups: hash-groupBy on content digest. */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
  }

  /** MinHash signatures + LSH banding.
    *
    * Pipeline: word-3-shingles → k minhashes (xxhash64 with per-hash seed
    * column, min-aggregated per doc) → group minhashes into bands → explode
    * bands → self-join on (band_idx, band_hash) → candidate pairs with
    * estimated Jaccard = fraction of matching minhashes.
    */
  def minhashLsh(spark: SparkSession, sfDir: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), "\\s+").as("words"))
      // word 3-gram shingle strings
      .select(col("doc_id"), expr(
        "transform(sequence(0, greatest(size(words) - 3, 0) - 1), " +
          "i -> concat_ws(' ', words[i], words[i+1], words[i+2]))").as("shingles"))
      .where(size(col("shingles")) > 0)

    // signature: for each seed, min over shingles of xxhash64(shingle, seed)
    val sigCols = (0 until numHashes).map { s =>
      expr(s"array_min(transform(shingles, sh -> xxhash64(sh, $s)))").as(s"mh$s")
    }
    val sigs = docs.select(col("doc_id") +: sigCols: _*)
      .withColumn("sig", array((0 until numHashes).map(i => col(s"mh$i")): _*))
      .select("doc_id", "sig")

    val rowsPerBand = numHashes / bands
    val banded0 = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, $bands - 1), b -> " +
          s"hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")).as(Seq("band_idx", "band_hash")))

    // hot-bucket cap: a bucket holding a large fraction of the corpus is a
    // degenerate signature (boilerplate/near-empty docs) and would make the
    // self-join quadratic — standard LSH practice is to drop such buckets
    // (at 100 TB this is the difference between a join and an outage)
    val maxBucket = 64
    val bucketSizes = banded0.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= maxBucket)
    // plain equi-join (bucket list is O(docs) — not broadcastable at scale;
    // AQE picks broadcast when it actually fits)
    val banded = banded0.join(bucketSizes, Seq("band_idx", "band_hash"))
      .drop("bsz")

    val a = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .as("matching"))
      .distinct()
  }

  /** 64-bit SimHash near-dup detection: per word, xxhash64; sum ±1 per bit
    * weighted by term frequency; near-dups = pairs sharing a 16-bit band of
    * the fingerprint with Hamming distance ≤ 3 overall. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), "\\s+").as("words"))
      .where(size(col("words")) > 0)

    // fingerprint: for each of 64 bits, majority vote over word hashes
    val fp = docs.withColumn("hashes", expr("transform(words, w -> xxhash64(w))"))
      .withColumn("fp", expr(
        "aggregate(sequence(0, 63), 0L, (acc, bit) -> " +
          "acc + if(aggregate(hashes, 0L, (s, h) -> s + if(shiftright(h, bit) % 2 != 0, 1L, -1L)) > 0, " +
          "shiftleft(1L, bit), 0L))"))
      .select("doc_id", "fp")

    // band on 4×16-bit chunks; pairs agreeing on any band are candidates
    val banded = fp.select(col("doc_id"), col("fp"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(fp, b * 16) & 65535)")).as(Seq("band_idx", "band")))
    val a = banded.select(col("band_idx"), col("band"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band_idx"), col("band"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band_idx", "band"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(fp_a ^ fp_b)").as("hamming"))
      .distinct()
      .where(col("hamming") <= 6)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs, blocked by
    * `source` (blocking keeps the join linear-ish; at scale the blocking
    * key is a cheap signature, not a full cross join). */
  def ngramJaccard(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        split(col("text"), "\\s+").as("words"))
      .select(col("doc_id"), col("source"), expr(
        s"array_distinct(transform(sequence(0, greatest(size(words) - $n, 0) - 1), " +
          s"i -> concat_ws(' ', slice(words, i + 1, $n))))").as("grams"))
      .where(size(col("grams")) > 0)

    val a = docs.select(col("source"), col("doc_id").as("doc_a"), col("grams").as("grams_a"))
    val b = docs.select(col("source"), col("doc_id").as("doc_b"), col("grams").as("grams_b"))
    a.join(b, "source")
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b")))).as("jaccard"))
      .where(col("jaccard") > 0.2)
  }
}
