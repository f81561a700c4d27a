package graft.spark

import graft.extract.ExtractOptions
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader

/** Structured Streaming face of the extraction stage. The reference and
  * the north rule are batch-first (resumable snapshot checkpoints, not
  * watermarks — SURVEY.md §2l), but the extraction operator itself is
  * stateless per turn, so the streaming form is the same typed map over a
  * `readStream` source: no state store, no watermark, exactly-once via
  * sink checkpointing. Useful for incremental ingestion of new
  * transcript partitions.
  */
object StreamingExtract {

  /** Transform a streaming Dataset[Turn] into extracted turns — the same
    * per-turn function as the batch hot path. */
  def extractStream(turns: Dataset[Turn]): Dataset[ExtractedTurn] = {
    import turns.sparkSession.implicits._
    val opts = ExtractOptions()
    turns.mapPartitions { it => it.map(t => ExtractJob.extractTurn(t, opts)) }
  }

  /** Streaming exact dedup: first-seen row per content digest, duplicate
    * arrivals dropped via the watermark-bounded state store
    * (`dropDuplicatesWithinWatermark` — state for a digest is evicted once
    * the watermark passes its arrival + delay, so the store is bounded by
    * the dedup horizon, not corpus size). The streaming counterpart of the
    * batch `dedup_exact`/`dedup_rewrite` pair; StreamingSpec pins
    * first-seen-wins against the batch digests. `rows` needs (text, ts). */
  def dedupStream(rows: org.apache.spark.sql.DataFrame,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.DataFrame = {
    rows
      .withColumn("digest", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("digest")
  }

  /** File-source streaming over a directory of transcript parquet. */
  def fromParquetDir(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): Dataset[Turn] = {
    import spark.implicits._
    val reader: DataStreamReader = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Turn].schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    reader.parquet(dir).as[Turn]
  }
}
