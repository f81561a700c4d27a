package graft

import graft.spark.TranscriptGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The second half of the skew story (north star: "AQE skew-join /
  * coalesce tuning to hold shuffle balance"): SkewSpec pins that the
  * SALT bounds the extraction exchange; this spec pins that for the
  * join a downstream consumer naturally writes — extracted turns joined
  * to per-conversation metadata on `conv_id` — AQE's skew-split handles
  * the mega-conversation WITHOUT engine code: the hot partition is
  * split into subpartitions (`skew=true` in the final adaptive plan)
  * and the join result is exact.
  *
  * Thresholds are scaled down to the test corpus; at 100 TB the same
  * mechanism fires at the default 256 MB advisory size. */
class AqeSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE splits the mega-conversation partition in a conv_id join") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale stand-ins for the production defaults (factor 5 /
      // 256 MB): the mega conv is ~20% of ~2k conversations' turns, so
      // its partition is >> factor x median at any byte threshold
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a shuffle join — broadcast would hide the skew entirely
      // (and IS the right plan for a small dim; this spec is about the
      // large-dim case where the shuffle is unavoidable)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // keep the text payload: skew detection works on shuffle BYTES, and
      // a (conv_id, turn_idx)-only projection leaves every partition under
      // any sane threshold at test scale
      val turns = TranscriptGen.skewedTurns(s, sfDir, turnsPerDoc = 32)
        .select("conv_id", "turn_idx", "text")
      // metadata is its own table (as a consumer would have it), not an
      // aggregation inside the same query: AQE's OptimizeSkewedJoin only
      // matches Sort(ShuffleStage) join children, and an agg-above-shuffle
      // child (whose partitioning the split would break) disqualifies it
      val convMeta = s.createDataset(
        turns.select("conv_id").distinct().as[String].collect().toSeq)
        .toDF("conv_id")
        .withColumn("conv_label", concat(lit("meta-"), col("conv_id")))
      val joined = turns.join(convMeta, "conv_id")

      // execute THIS query (count() would plan a different, column-pruned
      // query whose adaptive plan never materializes the wide shuffle)
      val n = joined.collect().length.toLong
      val total = turns.count()
      assert(n == total, s"join must be lossless: $n vs $total")
      // after execution the adaptive plan is final; the skew split shows
      // up as `skew=true` on the AQEShuffleRead of the hot side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"),
        "AQE did not split the skewed partition:\n" + plan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
