package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the north rule's N→4N criterion
  * (BASELINE.json: throughput scaling efficiency ≥ 0.8 between cluster
  * sizes N and 4N; sandbox stand-in per BASELINE.md: identical input and
  * seed at local[N] vs local[4N]).
  *
  * Runs the identical extraction job at local[N] then local[4N] in one
  * JVM (sessions stopped between runs), prints one JSON line with both
  * throughputs and the efficiency `(thru_4N / thru_N) / 4`, and verifies
  * the two outputs are identical under stable (conv_id, turn_idx)
  * ordering (determinism across parallelism).
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val turnsPerDoc = sys.env.getOrElse("SPARK_GRAFT_TPD", "20").toInt

    // global JIT warmup: one full-size run before ANY measurement, so
    // neither config benefits from compilation the other paid for
    locally {
      val spark = Bench.session((4 * n).toString)
      Bench.extractionThroughput(spark, sfDir, turnsPerDoc, buckets = 16 * n)
      spark.stop()
    }

    def runAt(cores: Int): (Long, Double, Long) = {
      val spark = Bench.session(cores.toString)
      // measure 3×, keep the fastest (shared noisy machine)
      val runs = (1 to 3).map { _ =>
        Bench.extractionThroughput(spark, sfDir, turnsPerDoc, buckets = cores * 4)
      }
      val turns = runs.head._1
      val sec = runs.map(_._2).min
      System.err.println(f"[scaling] cores=$cores runs=${runs.map(r => f"${r._2}%.3f").mkString(",")}")
      // determinism digest: hash of the sorted extracted text
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val digest = graft.spark.ExtractJob
        .run(spark, graft.spark.TranscriptGen.turns(spark, sfDir, 2), cores * 4)
        .extracted.toDF()
        .orderBy("conv_id", "turn_idx")
        .select(xxhash64(col("conv_id"), col("turn_idx"),
          coalesce(col("extracted_text"), lit("")), col("confidence")))
        .as[Long].reduce(_ ^ _)
      spark.stop()
      (turns, sec, digest)
    }

    val (turnsN, secN, digestN) = runAt(n)
    val (turns4, sec4, digest4) = runAt(4 * n)
    require(turnsN == turns4, "row counts differ across parallelism")
    val thruN = turnsN / secN
    val thru4 = turns4 / sec4
    val eff = (thru4 / thruN) / 4.0
    println(
      s"""{"metric":"scaling efficiency N->4N","value":${f"$eff%.3f"},"unit":"ratio",""" +
        s""""n_cores":$n,"thru_n":${f"$thruN%.1f"},"thru_4n":${f"$thru4%.1f"},""" +
        s""""turns":$turnsN,"sec_n":${f"$secN%.3f"},"sec_4n":${f"$sec4%.3f"},""" +
        s""""deterministic":${digestN == digest4},"sf":"$sfDir"}""")
  }
}
