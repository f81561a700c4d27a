package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical evidence for the two cluster-scale join claims the docs make
  * (SURVEY.md §7 / BENCH.md scale-up argument):
  *
  *  1. bucketed tables co-locate joins — two tables bucketed on the join
  *     key join with ZERO exchanges (the disk-layout analogue of
  *     ExtractJob's pre-bucketed map-only face);
  *  2. AQE splits a skewed join at runtime — the mega-key that would
  *     straggle one task is broken into parallel splits.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed tables join with zero exchanges (co-located join)") {
    val s = spark
    import org.apache.spark.sql.functions._
    val docs = graft.spark.TableIO(s, "/root/testdata/sf0.001").read("documents")
    // two bucketed tables on the same key, same bucket count — the layout
    // a 100 TB corpus would carry in its lakehouse table spec
    docs.select("doc_id", "source", "n_chars")
      .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("docs_meta_b")
    docs.select(col("doc_id"), length(col("text")).as("len"))
      .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("docs_len_b")

    // force the sort-merge path so the bucket layout (not a broadcast)
    // carries the join — at 100 TB neither side broadcasts anyway
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try PlanTestUtil.finalPlan(
        s.table("docs_meta_b").join(s.table("docs_len_b"), "doc_id"))
      finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(!plan.contains("Exchange"),
      "bucketed-on-key join must not shuffle either side\n" + plan)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"),
      "scan did not use the bucket layout\n" + plan)

    // the CONTRAST: the same join from plain (unbucketed) tables shuffles
    val flat = docs.select("doc_id", "source", "n_chars")
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
    flat.collect()
    // AQE may broadcast the small side instead of exchanging both — either
    // way the bucketed plan above is the one with ZERO data movement
  }

  test("AQE splits a skewed join key into parallel tasks") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // tighten AQE's skew thresholds so the synthetic skew triggers at
    // test scale (defaults target multi-GB partitions)
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // distinct payloads — a constant string compresses the shuffle
      // blocks below any skew threshold; one mega-key (0) holding ~all
      // rows + a uniform tail: the web-scale "one domain is half the
      // corpus" shape
      val left = (0 until 40000).map(i =>
        (if (i < 36000) 0L else i.toLong, s"payload-$i-" + (i * 2654435761L).toHexString * 8))
        .toDF("k", "pay")
      val right = (0L until 4000L).map(k => (k, k * 2)).toDF("k", "v")
      val plan = PlanTestUtil.finalPlan(left.join(right, "k"))
      assert(plan.contains("skew=true"),
        "AQE did not mark the skewed join side\n" + plan.take(2000))
    } finally {
      s.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      s.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      s.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
