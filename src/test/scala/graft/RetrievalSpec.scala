package graft

import graft.spark.Retrieval
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BM25 top-k retrieval: the distributed scorer must agree bit-for-bit
  * with a naive single-machine BM25 over the same corpus, and the rank
  * order must be the deterministic (score desc, doc_id) tiebreak. */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("bm25TopK matches a naive in-memory reference exactly") {
    val s = spark
    import s.implicits._
    val k = 5
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ").filter(_.nonEmpty)) }
    val n = corpus.length.toLong
    val avgdl = corpus.map(_._2.length.toLong).sum.toDouble / n

    val want = Retrieval.DefaultQueries.zipWithIndex.flatMap { case (q, qi) =>
      val terms = q.split(" ").filter(_.nonEmpty).distinct
      val dfs = terms.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
      val scored = corpus.flatMap { case (id, ws) =>
        val dl = ws.length.toLong
        val su = terms.map { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0 || dfs(t) == 0) 0L
          else {
            val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
            val frac = (tf * (Retrieval.K1 + 1.0)) /
              (tf + Retrieval.K1 * (1.0 - Retrieval.B + Retrieval.B * dl / avgdl))
            math.floor(idf * frac * 1e6).toLong
          }
        }.sum
        // a doc scores only if it contains at least one query term (the
        // inverted-index probe never reaches term-free docs)
        if (terms.exists(ws.contains)) Some((id, su)) else None
      }
      scored.sortBy { case (id, su) => (-su, id) }.take(k)
        .zipWithIndex.map { case ((id, su), r) => (qi, r + 1, id, su) }
    }.sortBy(t => (t._1, t._2))

    val got = Retrieval.bm25TopK(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
    // every query must return a full page (vocabulary guarantees hits)
    assert(got.groupBy(_._1).size == Retrieval.DefaultQueries.size)
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to k), s"query $q page incomplete")
    }
  }

  test("bm25TopK is deterministic across runs") {
    val s = spark
    import s.implicits._
    def run() = Retrieval.bm25TopK(spark, sfDir)
      .as[(Int, Int, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(run() == run())
  }
}
