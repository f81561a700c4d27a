package graft

import graft.spark.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring duplicate spans (Lee et al. 2022 family): crafted
  * corpora with known duplicated runs must yield exactly the expected
  * maximal spans — cross-document, self-repeat, and the overlap merge —
  * and the driver face must recover every planted splice. */
class DedupSubstringSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def spans(docs: Seq[(Long, String)], k: Int = 20)
      : Map[Long, Seq[(Int, Long, Long, Long)]] = {
    val s = spark
    import s.implicits._
    Dedup.substringSpansOn(spark, docs.toDS(), k)
      .as[(Long, Int, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4, r._5)).sortBy(_._1).toSeq)
      .toMap
  }

  test("cross-document duplicated run becomes ONE maximal span on both docs") {
    // 30 shared words in the middle of otherwise-unique docs: the 11
    // overlapping 20-gram windows must merge into a single 30-word span
    val shared = words("dup", 30)
    val a = words("alpha", 10) + " " + shared + " " + words("atail", 10)
    val b = words("beta", 5) + " " + shared + " " + words("btail", 15)
    val got = spans(Seq((1L, a), (2L, b)))
    assert(got(1L) == Seq((0, 10L, 40L, 30L)), s"doc 1: ${got.get(1L)}")
    assert(got(2L) == Seq((0, 5L, 35L, 30L)), s"doc 2: ${got.get(2L)}")
  }

  test("self-repeat within one document is flagged (Lee et al. drop those too)") {
    val run = words("rep", 22)
    val doc = run + " " + words("mid", 8) + " " + run
    val got = spans(Seq((1L, doc), (2L, words("other", 40))))
    // two islands: [0,22) and [30,52); the unique middle keeps them apart
    assert(got(1L) == Seq((0, 0L, 22L, 22L), (1, 30L, 52L, 22L)),
      s"got ${got.get(1L)}")
    assert(!got.contains(2L), "unique doc must have no spans")
  }

  test("runs shorter than k are invisible; exact-duplicate docs are full-doc spans") {
    val short = words("s", 19) // 19 < k=20: no gram can cover it
    val a = words("ax", 15) + " " + short
    val b = words("bx", 15) + " " + short
    val dupDoc = words("full", 25)
    val got = spans(Seq((1L, a), (2L, b), (3L, dupDoc), (4L, dupDoc)))
    assert(!got.contains(1L) && !got.contains(2L),
      "sub-threshold shared run must not produce spans")
    assert(got(3L) == Seq((0, 0L, 25L, 25L)))
    assert(got(4L) == Seq((0, 0L, 25L, 25L)))
  }

  test("driver face recovers every planted splice at sf0.001") {
    val s = spark
    import s.implicits._
    val got = Dedup.substringSpans(spark, sfDir)
      .as[(Long, Int, Long, Long, Long)].collect()
      .groupBy(_._1)
    val wordCounts = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id",
        "size(filter(split(text, ' '), w -> w != '')) AS nw")
      .as[(Long, Int)].collect().toMap
    val docIds = wordCounts.keys.toSeq.sorted
    // a plant is detectable iff its source prefix holds at least one full
    // k-gram (k=20): the same prefix then also opens the SOURCE doc, so
    // the gram is cross-document duplicated by construction
    val planted = docIds.filter(id => id % 5 == 2 && wordCounts(id % 40) >= 20)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val srcSpan = math.min(25L, wordCounts(id % 40).toLong)
      val sp = got.getOrElse(id, Array.empty)
      // the splice sits at the front: a span starting at word 0 covering
      // at least the planted prefix (more when the duplicated run
      // extends naturally into the doc's own text)
      assert(sp.exists(r => r._3 == 0L && r._4 >= srcSpan),
        s"planted doc $id missing its leading span (src $srcSpan words): ${sp.toSeq}")
    }
    // determinism
    val again = Dedup.substringSpans(spark, sfDir)
      .as[(Long, Int, Long, Long, Long)].collect().sorted.toSeq
    assert(again == got.values.flatten.toSeq.sorted)
  }

  test("plan: never forms pairs — equi-joins only, occurrence count map-side combined") {
    val plan = graft.PlanTestUtil.finalPlan(Dedup.substringSpans(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "substring dedup must stay linear in positions\n" + plan)
    // duplicated-gram membership is a window count riding the one gram
    // exchange — the corpus text is scanned ONCE (the former
    // aggregate-plus-join shape re-ran the gram kernel per reference)
    assert(plan.contains("Window"), "gram membership must be a window count\n" + plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      "the corpus must be scanned exactly once\n" + plan)
  }
}
