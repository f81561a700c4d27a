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

  /** Codegen'd dot product (see [[DotF64]]) — bit-identical to the
    * interpreted `aggregate`/`zip_with` formulation it replaced, ~100×
    * cheaper per element because it stays inside whole-stage codegen. */
  private def dot(a: String, b: String) =
    call_function("dot_f64", col(a), col(b))

  private def normed(df: DataFrame, idCol: String): DataFrame =
    df.select(col("vec_id").as(idCol), col("embedding"),
      sqrt(dot("embedding", "embedding")).as(idCol + "_norm"))

  /** Exact cosine top-k of `corpus` for each of the first `numQueries`
    * vectors (deterministic query subset). */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, numQueries: Int = 20): DataFrame = {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = normed(emb, "corpus_id")
    val queries = normed(emb.orderBy("vec_id").limit(numQueries), "query_id")
      .withColumnRenamed("embedding", "q_embedding")

    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        (dot("embedding", "q_embedding") /
          (col("corpus_id_norm") * col("query_id_norm"))).as("cosine"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer assigns every
    * corpus vector to its nearest centroid cell; queries probe their
    * `nprobe` nearest cells; exact cosine re-rank happens only within the
    * probed cells. Training is deterministic: init = lowest-vec_id
    * vectors, fixed Lloyd iteration count, on a bounded sample collected
    * once (at 100 TB: sample ~10^5 rows, centroids broadcast — the
    * all-pairs product becomes an equi-join on `cell`, identical shape to
    * [[lshTopK]] with the bucket key replaced by nearest-centroid id). */
  def ivfTopK(spark: SparkSession, sfDir: String,
      numCentroids: Int = 16, nprobe: Int = 4, k: Int = 5,
      numQueries: Int = 20, lloydIters: Int = 5,
      sampleCap: Int = 4096): DataFrame = {
    import spark.implicits._
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]

    // --- train the coarse quantizer on a deterministic bounded sample ---
    val sample = emb.orderBy("vec_id").limit(sampleCap).collect()
    val dim = sample.head._2.length
    var centroids = Array.tabulate(numCentroids) { c =>
      sample(c % sample.length)._2.map(_.toDouble)
    }
    def nearest(cs: Array[Array[Double]], v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var j = 0
        val cv = cs(c)
        while (j < dim) { val t = cv(j) - v(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    var iter = 0
    while (iter < lloydIters) {
      val sums = Array.fill(numCentroids)(new Array[Double](dim))
      val cnts = new Array[Long](numCentroids)
      sample.foreach { case (_, v) =>
        val c = nearest(centroids, v)
        cnts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(numCentroids) { c =>
        if (cnts(c) == 0) centroids(c) // empty cell keeps its centroid
        else { val s = sums(c); var j = 0; while (j < dim) { s(j) /= cnts(c); j += 1 }; s }
      }
      iter += 1
    }
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    // --- assign: corpus → one cell each (typed kernel, no HOFs) ---
    val corpus = emb.map { case (id, v) =>
      var n = 0.0; var j = 0
      while (j < v.length) { val x = v(j).toDouble; n += x * x; j += 1 }
      (nearest(bcCentroids.value, v), id, v, math.sqrt(n))
    }.toDF("cell", "corpus_id", "embedding", "corpus_norm")

    // --- queries probe their nprobe nearest cells ---
    val queries = emb.orderBy("vec_id").limit(numQueries)
      .flatMap { case (id, v) =>
        val cs = bcCentroids.value
        var n = 0.0; var j = 0
        while (j < v.length) { val x = v(j).toDouble; n += x * x; j += 1 }
        val byDist = (0 until cs.length).map { c =>
          var d = 0.0; var jj = 0
          while (jj < dim) { val t = cs(c)(jj) - v(jj); d += t * t; jj += 1 }
          (d, c)
        }.sorted.take(nprobe)
        byDist.iterator.map { case (_, c) => (c, id, v, math.sqrt(n)) }
      }.toDF("cell", "query_id", "q_embedding", "query_norm")

    val scored = corpus.join(broadcast(queries), "cell")
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        (dot("embedding", "q_embedding") /
          (col("corpus_norm") * col("query_norm"))).as("cosine"))

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
    VectorFunctions.register(spark)
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
        (dot("embedding", "q_embedding") /
          (col("corpus_id_norm") * col("query_id_norm"))).as("cosine"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }
}
