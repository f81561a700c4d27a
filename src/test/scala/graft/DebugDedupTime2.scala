package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugDedupTime2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    t("bare count")(spark.read.parquet(s"$dir/documents.parquet").count())
    t("split only")(spark.read.parquet(s"$dir/documents.parquet")
      .select(split(col("text"), "\\s+").as("words")).where(size(col("words")) > 0).count())
    t("seq only")(spark.read.parquet(s"$dir/documents.parquet")
      .select(split(col("text"), "\\s+").as("words"))
      .select(expr("transform(sequence(0, greatest(size(words)-3,0)-1), i -> i)").as("s"))
      .where(size(col("s")) > 0).count())
    t("shingle concat")(spark.read.parquet(s"$dir/documents.parquet")
      .select(split(col("text"), "\\s+").as("words"))
      .select(expr("transform(sequence(0, greatest(size(words)-3,0)-1), i -> concat_ws(' ', words[i], words[i+1], words[i+2]))").as("s"))
      .where(size(col("s")) > 0).count())
    t("shingle again")(spark.read.parquet(s"$dir/documents.parquet")
      .select(split(col("text"), "\\s+").as("words"))
      .select(expr("transform(sequence(0, greatest(size(words)-3,0)-1), i -> concat_ws(' ', words[i], words[i+1], words[i+2]))").as("s"))
      .where(size(col("s")) > 0).count())
    spark.stop()
  }
}
