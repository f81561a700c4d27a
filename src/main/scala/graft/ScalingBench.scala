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

    def digestAt(spark: SparkSession, cores: Int): Long = {
      // determinism digest: hash of the sorted extracted text
      import spark.implicits._
      import org.apache.spark.sql.functions._
      graft.spark.ExtractJob
        .run(spark, graft.spark.TranscriptGen.turns(spark, sfDir, 2), cores * 4)
        .extracted.toDF()
        .orderBy("conv_id", "turn_idx")
        .select(xxhash64(col("conv_id"), col("turn_idx"),
          coalesce(col("extracted_text"), lit("")), col("confidence")))
        .as[Long].reduce(_ ^ _)
    }

    // INTERLEAVED, STEAL-AWARE measurement: alternate N / 4N so noise
    // windows hit both configs equally, and reject samples taken under
    // hypervisor steal (this sandbox shows 0-31% steal swinging by the
    // minute; a sequential 3×N-then-3×4N protocol measured efficiency
    // anywhere between 0.68 and 0.97 on identical code). A sample is
    // KEPT when steal during its window is < 3%; min per config wins.
    def cpuStat(): (Long, Long) = {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val v = line.split("\\s+").drop(1).map(_.toLong)
      (v(7), v.take(8).sum) // (steal, total)
    }
    def once(cores: Int): (Long, Double, Double) = {
      val (s0, t0) = cpuStat()
      val spark = Bench.session(cores.toString)
      val r = Bench.extractionThroughput(spark, sfDir, turnsPerDoc, buckets = cores * 4)
      spark.stop()
      val (s1, t1) = cpuStat()
      val steal = (s1 - s0).toDouble / math.max(t1 - t0, 1L)
      (r._1, r._2, steal)
    }
    val maxAttempts = 8
    val wanted = 3
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Int, (Long, Double, Double))]
    var attempt = 0
    def cleanCount(cores: Int) =
      samples.count { case (c, (_, _, st)) => c == cores && st < 0.03 }
    while (attempt < maxAttempts &&
        (cleanCount(n) < wanted || cleanCount(4 * n) < wanted)) {
      if (cleanCount(n) < wanted) samples += (n -> once(n))
      if (cleanCount(4 * n) < wanted) samples += ((4 * n) -> once(4 * n))
      attempt += 1
    }
    def best(cores: Int): (Long, Double, Double) = {
      val rs = samples.collect { case (c, r) if c == cores => r }
      val clean = rs.filter(_._3 < 0.03)
      val pool = if (clean.nonEmpty) clean else rs
      System.err.println(
        f"[scaling] cores=$cores runs=${rs.map(r => f"${r._2}%.3f@${r._3 * 100}%.1f%%steal").mkString(",")}")
      val bestRun = pool.minBy(_._2)
      (rs.head._1, bestRun._2, bestRun._3)
    }
    val (turnsN, secN, stealN) = best(n)
    val (turns4, sec4, steal4) = best(4 * n)
    val (digestN, digest4) = {
      val sN = Bench.session(n.toString)
      val dN = digestAt(sN, n); sN.stop()
      val s4 = Bench.session((4 * n).toString)
      val d4 = digestAt(s4, 4 * n); s4.stop()
      (dN, d4)
    }
    require(turnsN == turns4, "row counts differ across parallelism")
    val thruN = turnsN / secN
    val thru4 = turns4 / sec4
    val eff = (thru4 / thruN) / 4.0
    println(
      s"""{"metric":"scaling efficiency N->4N","value":${f"$eff%.3f"},"unit":"ratio",""" +
        s""""n_cores":$n,"thru_n":${f"$thruN%.1f"},"thru_4n":${f"$thru4%.1f"},""" +
        s""""turns":$turnsN,"sec_n":${f"$secN%.3f"},"sec_4n":${f"$sec4%.3f"},""" +
        s""""steal_n":${f"$stealN%.4f"},"steal_4n":${f"$steal4%.4f"},""" +
        s""""deterministic":${digestN == digest4},"sf":"$sfDir"}""")
  }
}
