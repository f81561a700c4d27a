package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    side, codegen'd `aggregate`/`zip_with` dot products, per-query top-k
  *    via window rank. Baseline and verifier.
  *  - [[lshTopK]]: random-hyperplane LSH — deterministic hyperplanes from
  *    xxhash64 (no RNG state), sign-bit bucket key, candidates only within
  *    matching buckets, then exact re-rank. The scale path: the all-pairs
  *    product becomes an equi-join on bucket keys.
  *
  * Scale notes: at 100 TB the corpus side stays partitioned; only queries
  * are broadcast. IVF (k-means coarse quantizer) would replace the LSH
  * bucket key by nearest-centroid id — same join shape.
  */
object Similarity {

  private def normed(df: DataFrame, idCol: String): DataFrame =
    df.select(col("vec_id").as(idCol), col("embedding"),
      expr("sqrt(aggregate(embedding, 0.0D, (s, x) -> s + cast(x as double) * cast(x as double)))")
        .as(idCol + "_norm"))

  /** Exact cosine top-k of `corpus` for each of the first `numQueries`
    * vectors (deterministic query subset). */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, numQueries: Int = 20): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = normed(emb, "corpus_id")
    val queries = normed(emb.orderBy("vec_id").limit(numQueries), "query_id")
      .withColumnRenamed("embedding", "q_embedding")

    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        (expr("aggregate(zip_with(embedding, q_embedding, (x, y) -> cast(x as double) * cast(y as double)), 0.0D, (s, v) -> s + v)") /
          (col("corpus_id_norm") * col("query_id_norm"))).as("cosine"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }

  /** Sign-bucket LSH: `numPlanes` deterministic hyperplanes; bucket =
    * packed sign bits; exact cosine re-rank within buckets. */
  def lshTopK(spark: SparkSession, sfDir: String,
      numPlanes: Int = 8, k: Int = 5, numQueries: Int = 20): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // deterministic pseudo-random hyperplane component for (plane, dim):
    // xxhash64 scaled to [-1, 1]
    val planeExpr = (p: Int) =>
      s"aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), " +
        s"(x, i) -> cast(x as double) * (cast(xxhash64(i, $p) % 1000 as double) / 1000.0D)), " +
        "0.0D, (s, v) -> s + v)"
    val bucketExpr = (0 until numPlanes)
      .map(p => s"if((${planeExpr(p)}) >= 0.0D, shiftleft(1, $p), 0)")
      .mkString(" + ")

    val bucketed = emb.withColumn("bucket", expr(bucketExpr))
    val corpus = normed(bucketed, "corpus_id").withColumn("bucket", expr(bucketExpr))
    val queries = normed(bucketed.orderBy("vec_id").limit(numQueries), "query_id")
      .withColumn("bucket", expr(bucketExpr))
      .withColumnRenamed("embedding", "q_embedding")

    val scored = corpus.join(broadcast(queries), "bucket")
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        (expr("aggregate(zip_with(embedding, q_embedding, (x, y) -> cast(x as double) * cast(y as double)), 0.0D, (s, v) -> s + v)") /
          (col("corpus_id_norm") * col("query_id_norm"))).as("cosine"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }
}
