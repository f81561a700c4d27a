package graft

import graft.spark.{Hash61, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The inter-source overlap matrix equals a naive in-memory reference and
  * keeps its scale contract (inverted-index meet, no corpus cartesian). */
class SourceOverlapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("matrix equals the naive per-source shingle-set reference") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
    // independent shingle reference: Hash61 word hashes, sliding 3
    def shingles(text: String): Seq[Long] =
      text.split("\\s+").filter(_.nonEmpty).map(Hash61.wordHash(_)).toSeq
        .sliding(3).filter(_.size == 3)
        .map(w => Hash61.shingle3(w(0), w(1), w(2))).toSeq
    val sets = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap(d => shingles(d._2)).toSet
    }
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toLong
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, inter,
        inter.toDouble / (sets(a).size + sets(b).size - inter)))
      .toSeq.sorted

    val got = TextAnalysis.sourceOverlap(s, sfDir)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(got == want)
    // non-vacuous: sources share content, and the full matrix is emitted
    assert(got.exists(_._5 > 0) && got.size == sets.size * (sets.size - 1) / 2)
  }

  test("plan: shingle meet is an equi join — no corpus cartesian") {
    val plan = TextAnalysis.sourceOverlap(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "source overlap must never cross the corpus with itself")
  }
}
