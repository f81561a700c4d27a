package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugDedupTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), "\\s+").as("words"))
      .select(col("doc_id"), expr(
        "transform(sequence(0, greatest(size(words) - 3, 0) - 1), " +
          "i -> concat_ws(' ', words[i], words[i+1], words[i+2]))").as("shingles"))
      .where(size(col("shingles")) > 0)
    t("shingles")(docs.count())
    val sigs = docs.select(col("doc_id"), expr(
      "transform(sequence(0, 15), s -> array_min(transform(shingles, sh -> xxhash64(sh, s))))").as("sig"))
    t("signatures")(sigs.count())
    val banded0 = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr("transform(sequence(0, 3), b -> hash(slice(sig, b * 4 + 1, 4)))")).as(Seq("band_idx","band_hash")))
    t("banded")(banded0.count())
    val sizes = banded0.groupBy("band_idx","band_hash").agg(count(lit(1)).as("bsz")).where(col("bsz") <= 64)
    t("bucket sizes")(sizes.count())
    val banded = banded0.join(sizes, Seq("band_idx","band_hash")).drop("bsz")
    val a = banded.select(col("band_idx"),col("band_hash"),col("doc_id").as("doc_a"),col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"),col("band_hash"),col("doc_id").as("doc_b"),col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band_idx","band_hash")).where(col("doc_a") < col("doc_b"))
    t("candidate pairs")(pairs.count())
    t("full")(graft.spark.Dedup.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
