package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admitted document: its domain-local admission rank (1-based). */
final case class AdmittedDoc(doc_id: Long, source: String, admit_rank: Long)

/** Streaming per-domain ingest quota — the streaming analogue of the
  * batch quota window ([[Quality.samplePerDomain]]'s cap): admit at most
  * `quota` documents per source, cumulatively across micro-batches,
  * first-come in (event-time, doc_id) order within each batch. The
  * pipeline gate this feeds: a crawler that floods one domain must not
  * starve the ingest of every other domain — excess rows are dropped AT
  * THE SOURCE-KEYED state operator, before any downstream work.
  *
  * Scale shape: state is ONE counter per source — bounded by the number
  * of domains, not the corpus — with no per-document state at all (the
  * admitted set is implied by the counter). No timeout: a domain's
  * counter must live as long as the query, because the quota is a
  * lifetime budget, not a rate (a windowed rate limit would add an
  * event-time timeout exactly like [[StreamingSessionize]]).
  *
  * Semantics note (vs the batch face): the batch window ranks by the
  * deterministic hash (`sample_per_domain` — a SAMPLE), while the
  * streaming quota admits by ARRIVAL — an ingest CAP. The two agree on
  * which count survives per domain, not on which rows, except when
  * arrival order is event-time order (StreamingSpec pins that case
  * against a (ts, doc_id) rank window).
  */
object StreamingQuota {

  /** Driver-verification REPLAY face: run the documents table through
    * [[admit]] as a real micro-batched stream — `nBatches` doc_id-range
    * slices staged as one parquet file each
    * ([[StreamingExtract.stageReplayFiles]], collect-free), streamed
    * with `maxFilesPerTrigger = 1`. The synthetic event time is
    * `timestamp_micros(doc_id)` (the corpus has no ingest timestamp), so
    * arrival order IS event-time order — the parity contract under which
    * the arrival-ordered cap equals the batch rank window, giving this
    * face a plain DuckDB oracle: `row_number() OVER (PARTITION BY source
    * ORDER BY doc_id) <= quota`. Bounded driver actions only (one
    * min/max row). */
  def replay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      quota: Int = 10, nBatches: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = TableIO(spark, sfDir).read("documents")
      .selectExpr("doc_id", "source", "timestamp_micros(doc_id) AS ts")
    val r = docs.agg(min("doc_id"), max("doc_id")).head()
    val (mn, span) = (r.getLong(0), r.getLong(1) - r.getLong(0) + 1)
    val classed = docs.withColumn("cls", least(
      floor((col("doc_id") - mn) * nBatches / span), lit(nBatches - 1L)))
    StreamingExtract.runReplay(spark, "quota_replay_", classed, nBatches)(
      src => admit(src, quota).toDF())
      .select("doc_id", "source", "admit_rank")
  }

  /** docs: streaming DataFrame with (doc_id: Long, source: String,
    * ts: Timestamp). Emits admitted docs with their 1-based per-source
    * admission rank, in append mode. */
  def admit(docs: DataFrame, quota: Int): Dataset[AdmittedDoc] = {
    require(quota > 0, "quota must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .selectExpr("doc_id", "source", "unix_micros(ts) AS ts_us")
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[(Long, String, Long)],
         state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[AdmittedDoc]
          // deterministic in-batch order: event time, then doc id
          it.toArray.sortBy(r => (r._3, r._1)).foreach { case (id, _, _) =>
            if (admitted < quota) {
              admitted += 1
              out += AdmittedDoc(id, source, admitted)
            }
          }
          state.update(admitted)
          out.result().iterator
      }
  }
}
