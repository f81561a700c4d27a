package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed session: [start_us, end_us] in epoch microseconds. */
final case class UserSession(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long)

/** Open-session state carried across micro-batches. */
final case class OpenSession(start_us: Long, last_us: Long, n_events: Long)

/** Stateful Structured Streaming sessionization (the 2l face beyond the
  * stateless extraction map): watermark + `flatMapGroupsWithState` with an
  * event-time timeout. A session closes when the gap to the next event
  * exceeds `gapUs`, or when the watermark passes last_event + gap (the
  * timeout path — no unbounded state for idle users).
  *
  * Semantics match the batch [[sessionStats]] (same microsecond gap rule),
  * which StreamingSpec asserts and the driver's DuckDB oracle checks —
  * streaming == batch == oracle.
  *
  * Contract: per-user event-time order across micro-batches (within a
  * batch the group is sorted here). Out-of-order arrival within the
  * watermark but across batches would need a buffer-until-watermark
  * design — deliberately not paid for, matching the batch job's
  * sorted-input assumption (ExtractJob's partition-local sort).
  *
  * Scale: state is one 24-byte record per ACTIVE user (closed and
  * timed-out sessions leave the store); the only shuffle is the groupByKey
  * hash partition — the same exchange the batch window needs.
  */
object StreamingSessionize {

  val GapUs: Long = 3600L * 1000000L

  /** events: streaming DataFrame with (user_id: Long, event_id: Long,
    * ts: Timestamp) columns. Emits closed sessions (append mode). */
  def sessionize(events: DataFrame, gapUs: Long = GapUs,
      watermarkDelay: String = "1 hour"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .selectExpr("user_id", "event_id", "ts", "unix_micros(ts) AS ts_us")
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Long, java.sql.Timestamp, Long)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(uid, s.start_us, s.last_us, s.n_events))
          } else {
            val evs = it.toArray.sortBy(e => (e._4, e._2))
            val out = Seq.newBuilder[UserSession]
            var cur = state.getOption.orNull
            evs.foreach { e =>
              val us = e._4
              if (cur == null) cur = OpenSession(us, us, 1)
              else if (us - cur.last_us > gapUs) {
                out += UserSession(uid, cur.start_us, cur.last_us, cur.n_events)
                cur = OpenSession(us, us, 1)
              } else cur = OpenSession(cur.start_us, math.max(cur.last_us, us),
                cur.n_events + 1)
            }
            if (cur != null) {
              state.update(cur)
              // close via timeout once the watermark passes last + gap.
              // This timestamp is always strictly beyond the watermark:
              // the engine filters behind-watermark rows before this
              // operator (StreamingSpec pins that), so last_us >= wm and
              // last + gap > wm — setTimeoutTimestamp cannot throw.
              // Ceil to ms: a floored timeout could fire up to 999µs
              // before last+gap (and a sub-ms gapUs would truncate to 0);
              // firing late is safe — the gap rule itself is enforced on
              // the event path above, the timeout only flushes idle state.
              state.setTimeoutTimestamp((cur.last_us + gapUs + 999L) / 1000L)
            }
            out.result().iterator
          }
      }
  }

  /** Batch face with identical semantics: per-session rows via the lag
    * window — one shuffle (hash by user), partial nothing to combine (the
    * window needs the full user partition, which is the minimum possible
    * state for exact sessionization). DuckDB-oracled (`q_session_stats`). */
  def sessionStats(spark: SparkSession, sfDir: String, gapUs: Long = GapUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    TableIO(spark, sfDir).read("events")
      // the parquet ts is TIMESTAMP_NTZ; the cast is identity on the
      // epoch in this UTC environment (matches DuckDB's epoch_us)
      .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
  }
}
