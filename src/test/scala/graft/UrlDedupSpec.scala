package graft

import graft.PlanTestUtil.finalPlan
import graft.spark.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Canonical-URL dedup: the canonicalizer must collapse every planted
  * dressing (case, default port, fragment, tracking query, trailing
  * slash) onto one form, leave already-canonical URLs alone, be
  * idempotent, and the group aggregate must stay a single
  * map-side-combined hash agg — no join, no window. */
class UrlDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def canon(urls: Seq[String]): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("url").select(Dedup.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq
  }

  test("canonicalizer collapses every dressing; leaves canonical and foreign forms alone") {
    val want = "http://example.com/articles/7"
    val dressed = Seq(
      want,
      "HTTP://EXAMPLE.COM/articles/7",
      "http://example.com:80/articles/7#section-2",
      "http://example.com/articles/7?utm_source=feed&utm_campaign=x",
      "http://example.com/articles/7/")
    assert(canon(dressed).forall(_ == want), canon(dressed).mkString(", "))
    // idempotent, and meaningful query strings are NOT stripped
    assert(canon(Seq(want)) == Seq(want))
    val keepQuery = "http://example.com/search?q=spark&utm=x" // not utm-only
    assert(canon(Seq(keepQuery)) == Seq(keepQuery))
    assert(canon(Seq("http://example.com:8080/a")) ==
      Seq("http://example.com:8080/a"), "only the DEFAULT port strips")
  }

  test("url dedup groups: five docs per article key, keeper = min, single hash agg") {
    val df = Dedup.urlDedup(spark, sfDir)
    val rows = df.collect()
    val nDocs = spark.read
      .parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "every doc in exactly one group")
    // full five-variant groups collapse 5 -> 1 (the last key may be short)
    val full = rows.filter(_.getLong(1) == 5L)
    assert(full.length >= (nDocs / 5 - 1).toInt, s"got ${full.length} full groups")
    full.foreach { r =>
      val key = r.getString(0).split("/").last.toLong
      assert(r.getLong(2) == key * 5, s"keeper must be the min doc_id: $r")
    }
    val plan = finalPlan(df)
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    assert("HashAggregate".r.findAllIn(plan).size == 2,
      "partial + final hash agg expected (map-side combine)\n" + plan)
  }
}
