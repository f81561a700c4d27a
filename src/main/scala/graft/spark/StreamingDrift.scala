package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running per-source drift snapshot: token totals seen so far and the
  * current KL(new‖old) in floored micro-nats. `n_tokens` is the
  * monotone progress key — the snapshot with the highest value is the
  * most recent. */
final case class DriftSnapshot(source: String, n_new_tokens: Long,
    n_old_tokens: Long, kl_unats: Long)

/** Per-source bucket occupancy carried between micro-batches. */
final case class DriftState(cn: Array[Long], co: Array[Long])

/** Streaming face of [[Curation.klDrift]] — the monitoring shape: the
  * drift gate evaluated continuously as documents arrive, instead of as
  * a snapshot-vs-snapshot batch job. A spam flood or template change in
  * one source raises that source's KL within the micro-batch that
  * carries it — the alert fires while the crawl is still running, not
  * at the next pipeline run.
  *
  * State is the hashed unigram model itself: 2·B counters per source
  * (B = 256 longs ⇒ ~4 KB/source, bounded by the domain count, never by
  * the corpus). Each micro-batch folds its tokens into the counters and
  * emits one refreshed [[DriftSnapshot]] per touched source; the math
  * (same λ, same occupied-bucket sum, same per-bucket micro-nat floor)
  * is shared with the batch operator, so after the last batch the final
  * snapshot per source equals [[Curation.klDrift]] on the same data —
  * pinned in StreamingSpec. No timeout: the model is a lifetime
  * accumulator like [[StreamingQuota]]'s counter.
  */
object StreamingDrift {

  /** Driver-verification REPLAY face: run the documents table through
    * [[monitor]] as a real micro-batched stream — `nBatches` doc_id-range
    * slices staged as one parquet file each
    * ([[StreamingExtract.stageReplayFiles]], collect-free), streamed with
    * `maxFilesPerTrigger = 1` — and keep each source's LAST snapshot
    * (the row with the largest token total: totals grow by at least one
    * token in every batch that touches a source, so the max is unique
    * and is the post-final-batch state). Because the snapshot arithmetic
    * is the batch operator's exact arithmetic over the accumulated
    * model, that last snapshot equals [[Curation.klDrift]] on the whole
    * table and shares its DuckDB oracle. Bounded driver actions only
    * (one min/max row). */
  def replay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = TableIO(spark, sfDir).read("documents")
      .select(col("doc_id"), col("source"), col("text"))
    val r = docs.agg(min("doc_id"), max("doc_id")).head()
    val (mn, span) = (r.getLong(0), r.getLong(1) - r.getLong(0) + 1)
    val classed = docs.withColumn("cls", least(
      floor((col("doc_id") - mn) * nBatches / span), lit(nBatches - 1L)))
    StreamingExtract.runReplay(spark, "drift_replay_", classed, nBatches)(
      src => monitor(src).toDF())
      .groupBy("source")
      .agg(max(struct(
        (col("n_new_tokens") + col("n_old_tokens")).as("total"),
        col("n_new_tokens"), col("n_old_tokens"), col("kl_unats"))).as("m"))
      .select(col("source"), col("m.n_new_tokens"),
        col("m.n_old_tokens"), col("m.kl_unats"))
  }

  /** docs: streaming DataFrame with (doc_id: Long, source: String,
    * text: String). Emits refreshed snapshots in append mode. */
  def monitor(docs: DataFrame, numBuckets: Int = 256,
      newMod: Int = 4): Dataset[DriftSnapshot] = {
    require(numBuckets > 0 && numBuckets <= (1 << 16),
      "bucket model must stay a bounded per-source state")
    val spark = docs.sparkSession
    import spark.implicits._
    val nb = numBuckets
    docs
      .selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[(Long, String, String)],
         state: GroupState[DriftState]) =>
          val st = state.getOption
            .getOrElse(DriftState(new Array[Long](nb), new Array[Long](nb)))
          it.foreach { case (id, _, text) =>
            val isNew = Hash61.mix(id) % newMod == 0
            val arr = if (isNew) st.cn else st.co
            text.split(" ").iterator.filter(_.nonEmpty)
              .foreach(w => arr((Hash61.wordHash(w) % nb).toInt) += 1)
          }
          state.update(st)
          Iterator.single(snapshot(source, st, nb))
      }
  }

  /** The batch operator's exact arithmetic over the accumulated model:
    * occupied buckets only, add-λ over all B buckets in the denominator,
    * micro-nat floor per bucket term. */
  private def snapshot(source: String, st: DriftState, nb: Int): DriftSnapshot = {
    val lam = Curation.Lambda
    val lamB = lam * nb
    val tn = st.cn.sum
    val tl = st.co.sum
    var kl = 0L
    var b = 0
    while (b < nb) {
      if (st.cn(b) + st.co(b) > 0) {
        val pn = (st.cn(b) + lam) / (tn + lamB)
        val po = (st.co(b) + lam) / (tl + lamB)
        kl += math.floor(pn * math.log(pn / po) * 1e6).toLong
      }
      b += 1
    }
    DriftSnapshot(source, tn, tl, kl)
  }
}
