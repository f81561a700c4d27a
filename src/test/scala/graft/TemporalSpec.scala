package graft

import graft.spark.{TableIO, Temporal}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range join: fixture agreement with a naive in-memory
  * reference, plus crafted boundary cases (inclusive as-of tie, window
  * edges, match-free probes) the synthetic corpus can't guarantee. */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def events(): Seq[(Long, Long, Long, String, Double)] = {
    val s = spark
    import s.implicits._
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id", "unix_micros(cast(ts as timestamp))",
        "user_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect().toSeq
  }

  test("oracle precondition: (user_id, ts) is unique (ASOF tie-safety)") {
    val keys = events().map(e => (e._3, e._2))
    assert(keys.distinct.length == keys.length,
      "duplicate (user_id, ts) would make the native ASOF oracle ambiguous")
  }

  test("asofJoin matches a naive latest-prior scan exactly") {
    val ev = events()
    val builds = ev.filter(_._4 == "purchase")
    val want = ev.filter(_._4 == "error").map { case (id, us, uid, _, _) =>
      val prior = builds.filter(b => b._3 == uid && b._2 <= us)
      if (prior.isEmpty) (id, uid, us, -1L, -1L)
      else {
        val p = prior.maxBy(_._2)
        (id, uid, us, p._1, us - p._2)
      }
    }.sortBy(_._1)
    val got = Temporal.asofJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == want)
    // both regimes present: matched errors and -1 no-prior errors would
    // ideally both occur; at minimum every error row must be emitted
    assert(got.length == ev.count(_._4 == "error"))
  }

  test("rangeJoin matches a naive quadratic scan exactly") {
    val ev = events()
    val clicks = ev.filter(_._4 == "click")
    val win = Temporal.RangeWindowUs
    val want = ev.filter(_._4 == "error").map { case (id, us, uid, _, _) =>
      val in = clicks.filter(c => c._3 == uid && c._2 >= us - win && c._2 < us)
      (id, uid, in.length.toLong, in.map(c => math.round(c._5 * 100)).sum)
    }.sortBy(_._1)
    val got = Temporal.rangeJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    assert(got.exists(_._3 > 0) && got.exists(_._3 == 0L),
      "fixture must exercise both matched and zero-match probes")
  }

  test("randomized corpus: both joins match naive references on a 10-min grid") {
    // a coarse time grid makes window edges and same-instant ties COMMON
    // instead of measure-zero — the cases the fixture can't force
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260817L)
    val tenMinUs = 10L * 60 * 1000000
    val types = Vector("error", "purchase", "click", "view")
    val ev = (0 until 400).map { i =>
      val us = (rnd.nextInt(60) + 1).toLong * tenMinUs
      (i.toLong, us, (rnd.nextInt(4) + 1).toLong, types(rnd.nextInt(types.length)),
        rnd.nextInt(10000) / 100.0)
    }
    val crafted = ev.map { case (id, us, uid, t, v) =>
      (id, new java.sql.Timestamp(us / 1000), uid, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
    TableIO.registerScheme("tmrand",
      (_, _) => new TableIO {
        def read(table: String) = { require(table == "events", table); crafted }
        def exists(table: String) = table == "events"
        def write(df: org.apache.spark.sql.DataFrame, table: String,
            mode: org.apache.spark.sql.SaveMode) = fail("stub is read-only")
        def writePartitioned(df: org.apache.spark.sql.DataFrame, table: String,
            partitionCol: String) = fail("stub is read-only")
      })
    try {
      val builds = ev.filter(_._4 == "purchase")
      val wantAsof = ev.filter(_._4 == "error").map { case (id, us, uid, _, _) =>
        val prior = builds.filter(b => b._3 == uid && b._2 <= us)
        if (prior.isEmpty) (id, uid, us, -1L, -1L)
        else { // tie semantics: latest ts, then largest event_id
          val p = prior.maxBy(b => (b._2, b._1))
          (id, uid, us, p._1, us - p._2)
        }
      }.sortBy(_._1)
      val gotAsof = Temporal.asofJoin(spark, "tmrand://x").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      assert(gotAsof == wantAsof)
      // the grid must actually produce same-instant build/probe ties
      assert(wantAsof.exists(_._5 == 0L), "no inclusive tie generated — weak seed")

      val clicks = ev.filter(_._4 == "click")
      val win = Temporal.RangeWindowUs
      val wantRange = ev.filter(_._4 == "error").map { case (id, us, uid, _, _) =>
        val in = clicks.filter(c => c._3 == uid && c._2 >= us - win && c._2 < us)
        (id, uid, in.length.toLong, in.map(c => math.round(c._5 * 100)).sum)
      }.sortBy(_._1)
      val gotRange = Temporal.rangeJoin(spark, "tmrand://x").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(gotRange == wantRange)
      // exact-edge clicks must occur (grid multiples of the bin width / 3)
      assert(ev.filter(_._4 == "error").exists { case (_, us, uid, _, _) =>
        clicks.exists(c => c._3 == uid && c._2 == us - win)
      }, "no exact window-start click generated — weak seed")
    } finally TableIO.unregisterScheme("tmrand")
  }

  test("crafted boundaries: inclusive as-of tie, half-open range edges") {
    val s = spark
    import s.implicits._
    val M = 60L * 1000000 // one minute in µs
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // u1: purchase at the EXACT error instant (inclusive → matched, lag 0)
    //     plus clicks exactly at both window edges: -30min (in), 0 (out)
    // u2: no purchases, one click 31min before (out) → (-1, zero-match)
    val crafted = Seq(
      (1L, 100 * M, 1L, "purchase", 1.0),
      (2L, 100 * M, 1L, "error", 0.0),
      (3L, 70 * M, 1L, "click", 2.50),   // = err - 30min → IN
      (4L, 100 * M, 1L, "click", 4.00),  // = err instant → OUT
      (5L, 99 * M, 1L, "click", 1.25),   // interior → IN
      (6L, 200 * M, 2L, "error", 0.0),
      (7L, 169 * M, 2L, "click", 9.99)   // 31min before → OUT
    ).map { case (id, us, uid, t, v) => (id, ts(us), uid, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
    TableIO.registerScheme("tmev",
      (_, _) => new TableIO {
        def read(table: String) = { require(table == "events", table); crafted }
        def exists(table: String) = table == "events"
        def write(df: org.apache.spark.sql.DataFrame, table: String,
            mode: org.apache.spark.sql.SaveMode) = fail("stub is read-only")
        def writePartitioned(df: org.apache.spark.sql.DataFrame, table: String,
            partitionCol: String) = fail("stub is read-only")
      })
    try {
      val asof = Temporal.asofJoin(spark, "tmev://x").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(asof == Seq((2L, 1L, 0L), (6L, -1L, -1L)),
        s"as-of tie/no-prior semantics wrong: $asof")
      val rng = Temporal.rangeJoin(spark, "tmev://x").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
      // u1: clicks at -30min (250¢) and -1min (125¢) in; the err-instant
      // click excluded by the half-open edge. u2: zero matches.
      assert(rng == Seq((2L, 2L, 375L), (6L, 0L, 0L)),
        s"range window edges wrong: $rng")
    } finally TableIO.unregisterScheme("tmev")
  }
}
