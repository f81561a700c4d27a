package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One enriched probe event — the same row shape the batch
  * [[Temporal.asofJoin]] emits (purchase_id = lag_us = -1 when no prior
  * build-side event exists). */
final case class AsOfEnriched(event_id: Long, user_id: Long, err_us: Long,
    purchase_id: Long, lag_us: Long)

/** Streaming as-of enrichment — the stream-side face of the batch
  * union-and-carry as-of join ([[Temporal.asofJoin]]), completing the
  * streaming mirror of the temporal family: each arriving `probeType`
  * event is enriched ON ARRIVAL with the latest `buildType` event of the
  * same user at or before it, instead of waiting for the nightly batch
  * join.
  *
  * The batch formulation unions the two sides and lets a sorted window
  * carry the last build row forward; here the stream IS that union
  * (probe and build events share one source), and the carry is the state:
  * per user, the (event time, id) of the newest build event seen — the
  * window's `last(build) ignoreNulls` collapsed to the only thing the
  * future can ask for. Within a micro-batch, rows apply in the exact
  * window order of the batch face — (event time, build-before-probe,
  * event_id) — so an equal-timestamp build is visible to its probe
  * ("at or before" is inclusive), and a build row only advances the
  * carry (a stale one never regresses it).
  *
  * Scale bounds, in the [[StreamingQuota]] spirit: state is ONE
  * (us, event_id) pair per user — bounded by user cardinality, not the
  * stream — and there is no per-event state. No timeout: the batch
  * as-of looks back unboundedly, so evicting a user's carry would
  * silently diverge from the batch answer on their next probe (a
  * bounded-lookback product variant would add an event-time timeout
  * exactly like [[StreamingSessionize]], trading state for a horizon on
  * the carry).
  *
  * Parity contract (same as the quota/sessionize faces, pinned in
  * StreamingSpec): streaming == batch when each user's events arrive in
  * event-time order across micro-batches. Append mode cannot
  * retroactively re-enrich an already-emitted probe row when a build
  * row arrives late — that is the definitional streaming/batch gap for
  * as-of, not an implementation limit.
  */
object StreamingAsOf {

  /** Driver-verification REPLAY face: run the events table through
    * [[enrich]] as a real micro-batched stream — `nBatches` event-time
    * slices of the `us` range, one parquet file each
    * ([[StreamingExtract.stageReplayFiles]], collect-free), streamed
    * with `maxFilesPerTrigger = 1` — and return the enriched probe rows
    * as a batch DataFrame. Time-sliced batching keeps every user's
    * arrivals in event-time order (the parity contract), so the result
    * equals the batch [[Temporal.asofJoin]] and shares its independent
    * DuckDB `ASOF LEFT JOIN` oracle. Bounded driver actions only (one
    * min/max row). */
  def replay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 3, probeType: String = "error",
      buildType: String = "purchase"): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = TableIO(spark, sfDir).read("events")
      .where(col("event_type").isin(probeType, buildType))
      .selectExpr("event_id", "user_id", "event_type",
        "cast(ts as timestamp) AS ts",
        "unix_micros(cast(ts as timestamp)) AS us")
    val r = ev.agg(min("us"), max("us")).head()
    val (mn, span) = (r.getLong(0), r.getLong(1) - r.getLong(0) + 1)
    val classed = ev
      .withColumn("cls", least(
        floor((col("us") - mn) * nBatches / span), lit(nBatches - 1L)))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("cls"))
    StreamingExtract.runReplay(spark, "asof_replay_", classed, nBatches)(
      src => enrich(src, probeType, buildType).toDF())
      .select("event_id", "user_id", "err_us", "purchase_id", "lag_us")
  }

  /** events: streaming DataFrame with (event_id: Long, user_id: Long,
    * event_type: String, ts: Timestamp). Emits enriched probe events in
    * append mode. */
  def enrich(events: DataFrame, probeType: String = "error",
      buildType: String = "purchase"): Dataset[AsOfEnriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(org.apache.spark.sql.functions.col("event_type")
        .isin(probeType, buildType))
      .selectExpr("event_id", "user_id", "event_type = '" + buildType + "' AS is_build",
        "unix_micros(cast(ts as timestamp)) AS us")
      .as[(Long, Long, Boolean, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Boolean, Long)],
         state: GroupState[(Long, Long)]) =>
          // the batch window's order: event time, build first at ties
          // (inclusive "at or before"), then event_id
          val rows = it.toArray.sortBy(r => (r._4, !r._3, r._1))
          var carry = state.getOption
          val out = Seq.newBuilder[AsOfEnriched]
          rows.foreach { case (eid, _, isBuild, us) =>
            if (isBuild) {
              if (carry.forall(_._1 <= us)) carry = Some((us, eid))
            } else {
              out += (carry match {
                case Some((bus, bid)) if bus <= us =>
                  AsOfEnriched(eid, user, us, bid, us - bus)
                case _ => AsOfEnriched(eid, user, us, -1L, -1L)
              })
            }
          }
          carry.foreach(state.update)
          out.result().iterator
      }
  }
}
