package graft

import graft.extract.ExtractOptions
import graft.spark.{ExtractJob, TranscriptGen, Turn}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-stress wall-clock evidence (VERDICT r4 #3), the measured side of
  * SkewSpec's deterministic layout pins: on a corpus where ONE
  * conversation holds ~20% of all turns,
  *
  *  1. the salted ExtractJob still scales N→4N (matched-pair protocol,
  *     BENCH.md "Measurement protocol"),
  *  2. its hottest task stays near the median task (max/median wall
  *     time per the heaviest stage), and
  *  3. the unsalted layout pays a measurable straggler penalty at the
  *     same size — the counterfactual that shows the salt is earning
  *     its keep, not just passing through.
  *
  * One JSON line on stdout (BENCH.md records it).
  */
object SkewBench {

  /** Task wall times (ms) of the heaviest-by-shuffle-read stage. */
  private final class TaskTimes extends SparkListener {
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null)
        recs.add((te.stageId, m.shuffleReadMetrics.recordsRead, m.executorRunTime))
    }
    /** (max/median, max/fair-share) task wall time of the heaviest
      * stage. Fair share = stage CPU total / cores — the straggler
      * factor that actually gates wall-clock scaling: a task under 1.0
      * here cannot be the critical path no matter how many medians it
      * spans. */
    def ratios(cores: Int): (Double, Double) = {
      import scala.jdk.CollectionConverters._
      val byStage = recs.asScala.toSeq.groupBy(_._1)
      if (byStage.isEmpty) return (-1, -1)
      val stage = byStage.maxBy(_._2.map(_._2).sum)._2
      val times = stage.map(_._3).sorted
      val med = math.max(times(times.size / 2), 1L).toDouble
      val fair = math.max(times.sum.toDouble / cores, 1.0)
      (times.last / med, times.last / fair)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "2").toInt
    val tpd = sys.env.getOrElse("SPARK_GRAFT_TPD", "200").toInt
    // ONE logical bucket layout across both sizes (buckets are the
    // data-level lineage/resume contract, not a per-cluster knob), sized
    // B >> cores as at production scale: the salt bounds a hot bucket to
    // (1-f) + f*B/salt of the mean REGARDLESS of B (B/salt is fixed at 8
    // by saltFor), but FIFO wave-packing of those hot buckets only
    // amortizes when each core runs many waves — at B = 4*cores a 2.4x
    // bucket can stretch the last wave by its full excess (measured:
    // 0.667 N->4N at B=32 on 8 cores vs 16 waves/core here)
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "128").toInt

    def cpuStat(): (Long, Long) = {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val v = line.split("\\s+").drop(1).map(_.toLong)
      (v(7), v.take(8).sum)
    }

    /** One measured run. salted=false swaps the bucket key for the raw
      * conv_id hash (same exchange, same extraction kernel). */
    def once(cores: Int, salted: Boolean): (Long, Double, Double, (Double, Double)) = {
      val (s0, t0) = cpuStat()
      val spark = Bench.session(cores.toString)
      val lst = new TaskTimes
      spark.sparkContext.addSparkListener(lst)
      val turns = TranscriptGen.skewedTurns(spark, sfDir, tpd)
      val t = System.nanoTime()
      val count =
        if (salted)
          ExtractJob.run(spark, turns, buckets).extracted
            .filter(_.extracted_text != null).count()
        else {
          import spark.implicits._
          val opts = ExtractOptions()
          turns.toDF()
            .withColumn("b", pmod(hash(col("conv_id")), lit(buckets)))
            .repartition(buckets, col("b")).drop("b").as[Turn]
            .mapPartitions(it => it.map(x => ExtractJob.extractTurn(x, opts)))
            .filter(_.extracted_text != null).count()
        }
      val sec = (System.nanoTime() - t) / 1e9
      Thread.sleep(600) // let the listener bus drain
      val ratio = lst.ratios(cores)
      spark.stop()
      val (s1, t1) = cpuStat()
      val steal = (s1 - s0).toDouble / math.max(t1 - t0, 1L)
      (count, sec, steal, ratio)
    }

    // global JIT warmup
    locally {
      val spark = Bench.session((4 * n).toString)
      ExtractJob.run(spark,
        TranscriptGen.skewedTurns(spark, sfDir, tpd), buckets)
        .extracted.count()
      spark.stop()
    }

    case class Pair(rN: (Long, Double, Double, (Double, Double)),
        r4: (Long, Double, Double, (Double, Double))) {
      def clean: Boolean = rN._3 < 0.03 && r4._3 < 0.03
      def eff: Double = (rN._2 / r4._2) / 4.0
    }
    val pairs = scala.collection.mutable.ArrayBuffer.empty[Pair]
    while (pairs.length < 5 && pairs.count(_.clean) < 3) {
      pairs += Pair(once(n, salted = true), once(4 * n, salted = true))
    }
    val usable = { val c = pairs.filter(_.clean); if (c.nonEmpty) c else pairs }
    System.err.println("[skew] pairs: " + pairs.map(p =>
      f"(${p.rN._2}%.2f,${p.r4._2}%.2f)->${p.eff}%.3f${if (p.clean) "" else "*steal"}").mkString(" "))
    val byEff = usable.sortBy(_.eff)
    val med = byEff(byEff.length / 2)

    // counterfactual: unsalted at 4N, best of 2 (min wall, max task ratio)
    val un = (1 to 2).map(_ => once(4 * n, salted = false))
    val unSec = un.map(_._2).min
    val unRatio = un.maxBy(_._4._2)._4

    require(med.rN._1 == med.r4._1 && med.rN._1 == un.head._1,
      "row counts diverged across configurations")
    println(
      s"""{"metric":"skew-stress scaling efficiency N->4N","value":${f"${med.eff}%.3f"},"unit":"ratio",""" +
        s""""n_cores":$n,"turns":${med.rN._1},"mega_frac":0.2,""" +
        s""""sec_n":${f"${med.rN._2}%.3f"},"sec_4n":${f"${med.r4._2}%.3f"},""" +
        s""""task_max_over_median_4n":${f"${med.r4._4._1}%.2f"},"task_max_over_fairshare_4n":${f"${med.r4._4._2}%.2f"},""" +
        s""""unsalted_sec_4n":${f"$unSec%.3f"},"unsalted_task_max_over_median":${f"${unRatio._1}%.2f"},""" +
        s""""unsalted_task_max_over_fairshare":${f"${unRatio._2}%.2f"},""" +
        s""""unsalted_penalty":${f"${unSec / med.r4._2}%.2f"},""" +
        s""""steal_n":${f"${med.rN._3}%.4f"},"steal_4n":${f"${med.r4._3}%.4f"},""" +
        s""""pairs":${pairs.length},"buckets":$buckets,"sf":"$sfDir","tpd":$tpd}""")
  }
}
