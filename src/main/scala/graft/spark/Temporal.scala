package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operator set lacks: as-of join and
  * range join, both expressed as compositions that keep the plan
  * equi-join-shaped (preference (a) of the extension ladder — no custom
  * physical operator needed, and Catalyst/AQE still see ordinary
  * exchanges they know how to optimize).
  *
  * Scale shapes (100 TB):
  *  - [[asofJoin]] is ONE shuffle on the join key and a single
  *    sorted-window pass — the union-and-carry formulation. The naive
  *    formulations both die at scale: a per-row correlated subquery
  *    re-scans the build side per probe row, and an inequality theta-join
  *    is a cartesian the optimizer cannot prune. Here each side is
  *    tagged, unioned, and the window carries the most recent build-side
  *    row forward, so cost is sort-within-partition, not pairs.
  *  - [[rangeJoin]] buckets time into bins exactly as wide as the query
  *    window, so every probe window spans at most two bins: the probe
  *    side expands 2×, the join is EQUI on (key, bin), and the residual
  *    range predicate filters locally after the hash join. Candidate
  *    rows are only same-user same-2-bin pairs — never the all-pairs
  *    product of a raw `t1.ts BETWEEN t2.ts - Δ AND t2.ts` theta-join.
  *
  * Both oracles are genuinely independent of the implementation: the
  * as-of oracle is DuckDB's NATIVE `ASOF LEFT JOIN` (safe because
  * (user_id, ts) is unique — asserted by TemporalSpec), the range oracle
  * a naive inequality join. All emitted quantities are integer
  * microseconds / cents, so the compare is exact.
  */
object Temporal {

  /** 30 minutes in microseconds — [[rangeJoin]]'s window and bin width
    * (equal by construction: that is what bounds probe expansion at 2). */
  val RangeWindowUs: Long = 30L * 60 * 1000000

  /** As-of join: each `probeType` event paired with the latest
    * `buildType` event of the same user at or before it.
    *
    * Emits (event_id, user_id, err_us, purchase_id, lag_us), with
    * purchase_id = lag_us = -1 when no prior build-side event exists
    * (-1 instead of NULL keeps the driver compare integer-typed). */
  def asofJoin(spark: SparkSession, sfDir: String,
      probeType: String = "error", buildType: String = "purchase"): DataFrame = {
    val ev = TableIO(spark, sfDir).read("events")
      .where(col("event_type").isin(probeType, buildType))
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        (col("event_type") === buildType).as("is_build"))
    // at equal timestamps the build row must sort first so the probe row
    // sees it ("at or before" is inclusive) — (user_id, ts) uniqueness
    // makes this unreachable in this corpus, but the contract is explicit
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("is_build").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ev.withColumn("last_build",
      last(when(col("is_build"), struct(col("us"), col("event_id"))),
        ignoreNulls = true).over(w))
    carried.where(!col("is_build"))
      .select(col("event_id"), col("user_id"), col("us").as("err_us"),
        coalesce(col("last_build.event_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("us") - col("last_build.us"), lit(-1L)).as("lag_us"))
  }

  /** Independent oracle for [[asofJoin]]: DuckDB's native ASOF join —
    * a different algorithm entirely, not a replay. */
  def asofJoinSql(probeType: String = "error", buildType: String = "purchase"): String =
    "SELECT e.event_id, e.user_id, epoch_us(e.ts) AS err_us, " +
      "coalesce(p.event_id, -1) AS purchase_id, " +
      "coalesce(epoch_us(e.ts) - epoch_us(p.ts), -1) AS lag_us " +
      s"FROM (SELECT * FROM events WHERE event_type = '$probeType') e " +
      s"ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = '$buildType') p " +
      "ON e.user_id = p.user_id AND e.ts >= p.ts"

  /** Range join: per `probeType` event, the count and cent-exact value
    * sum of `buildType` events by the same user in the half-open window
    * `[ts - 30min, ts)`.
    *
    * Emits (event_id, user_id, n_clicks, click_cents); zero-match probe
    * events appear with (0, 0). */
  def rangeJoin(spark: SparkSession, sfDir: String,
      probeType: String = "error", buildType: String = "click"): DataFrame = {
    val win = RangeWindowUs
    val ev = TableIO(spark, sfDir).read("events")
    val build = ev.where(col("event_type") === buildType)
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("c_us"),
        // two-decimal doubles: ×100 rounds to exact integer cents, so
        // the aggregate is an order-free integer sum on both engines
        round(col("value") * 100).cast("long").as("cents"),
        floor(expr("unix_micros(cast(ts as timestamp))") / win).as("bin"))
    val probe = ev.where(col("event_type") === probeType)
      .select(col("event_id"), col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("e_us"))
      .withColumn("bin",
        explode(array(floor(col("e_us") / win), floor(col("e_us") / win) - 1)))
    // left join keeps every probe row; the residual range predicate must
    // run INSIDE the aggregate (a post-join filter would drop probe
    // events whose same-bin clicks all fall outside the window)
    val inRange = col("c_us").isNotNull &&
      col("c_us") >= col("e_us") - win && col("c_us") < col("e_us")
    probe.join(build, Seq("user_id", "bin"), "left")
      .groupBy("event_id", "user_id")
      .agg(count(when(inRange, col("c_us"))).as("n_clicks"),
        coalesce(sum(when(inRange, col("cents"))), lit(0L)).as("click_cents"))
  }

  /** Independent oracle for [[rangeJoin]]: the naive inequality join the
    * binned plan must agree with (quadratic is fine at oracle scale). */
  def rangeJoinSql(probeType: String = "error", buildType: String = "click"): String =
    "SELECT e.event_id, e.user_id, COUNT(c.event_id) AS n_clicks, " +
      "coalesce(CAST(SUM(CAST(round(c.value * 100) AS BIGINT)) AS BIGINT), 0) AS click_cents " +
      s"FROM (SELECT * FROM events WHERE event_type = '$probeType') e " +
      s"LEFT JOIN (SELECT * FROM events WHERE event_type = '$buildType') c " +
      "ON c.user_id = e.user_id " +
      s"AND epoch_us(c.ts) >= epoch_us(e.ts) - $RangeWindowUs " +
      "AND epoch_us(c.ts) < epoch_us(e.ts) " +
      "GROUP BY e.event_id, e.user_id"
}
