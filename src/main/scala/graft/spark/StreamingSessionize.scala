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

  /** Driver-verification REPLAY face: run the events table through
    * [[sessionize]] as a real micro-batched stream — `nBatches`
    * event-time slices staged as one parquet file each
    * ([[StreamingExtract.stageReplayFiles]], collect-free), streamed with
    * `maxFilesPerTrigger = 1` — then TWO sentinel flush batches
    * (`user_id = -1`, far-future event time): the first advances the
    * watermark past every open session's `last + gap`, the second gives
    * the engine a batch in which those event-time timeouts fire (the
    * same two-step flush StreamingSpec uses). Time-sliced batching keeps
    * every user's arrivals in event-time order (the parity contract), so
    * the closed sessions equal the batch lag-window [[sessionStats]] and
    * share its DuckDB oracle (minus the batch-only session_idx column).
    * Bounded driver actions only (one max row). */
  def replay(spark: SparkSession, sfDir: String,
      nBatches: Int = 3): DataFrame = {
    val ev = TableIO(spark, sfDir).read("events")
      .selectExpr("user_id", "event_id", "cast(ts as timestamp) AS ts",
        "unix_micros(cast(ts as timestamp)) AS us")
    val mx = ev.agg(min("us"), max("us")).head()
    val (mn, span) = (mx.getLong(0), mx.getLong(1) - mx.getLong(0) + 1)
    val classed = ev
      .withColumn("cls", least(
        floor((col("us") - mn) * nBatches / span), lit(nBatches - 1L)))
      .select(col("user_id"), col("event_id"), col("ts"), col("cls"))
    // two flush classes: sentinel 30 days past the corpus horizon
    val flushUs = mx.getLong(1) + 30L * 24 * 3600 * 1000000L
    val sentinels = spark.range(2).selectExpr(
      "-1L AS user_id", "id AS event_id",
      s"timestamp_micros(${flushUs}L) AS ts",
      s"CAST($nBatches AS BIGINT) + id AS cls")
    StreamingExtract.runReplay(spark, "sess_replay_",
      classed.unionByName(sentinels), nBatches + 2)(src => sessionize(src).toDF())
      .where(col("user_id") >= 0)
      .select("user_id", "start_us", "end_us", "n_events")
  }

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
