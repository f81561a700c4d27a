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

  /** Driver-verification REPLAY face: the roundtrip transcript table
    * staged into `nBatches` doc_id-sliced parquet files (one micro-batch
    * each, collect-free — [[stageReplayFiles]]), streamed through
    * [[extractStream]] with `maxFilesPerTrigger = 1`, returned as a
    * batch DataFrame (doc_id, extracted_text). The extraction stage is
    * stateless per turn, so append mode needs no watermark and the
    * result must equal the batch path row-for-row — the registered face
    * shares the batch `extract_roundtrip` DuckDB oracle VERBATIM, so the
    * driver's gate pins streaming == batch end-to-end, not just in a
    * spec. */
  def replay(spark: SparkSession, sfDir: String, minChars: Int,
      nBatches: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val classed = TranscriptGen.roundtripTurns(spark, sfDir, minChars)
      .toDF()
      .withColumn("cls", pmod(col("turn_idx"), lit(nBatches)).cast("int"))
    val streamDir = stageReplayFiles(classed, nBatches)
    val name = "extract_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = extractStream(fromParquetDir(spark, streamDir, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("turn_idx").cast("long").as("doc_id"), col("extracted_text"))
  }

  /** Stage `classed` — which must carry an integer column `cls` in
    * [0, nClasses) — as ONE parquet file per class under a fresh temp
    * dir, with strictly increasing modification times, and return that
    * dir: read back with `maxFilesPerTrigger = 1` (latestFirst=false
    * orders initial files by mtime), each class becomes one micro-batch
    * in class order. This is the collect-free replay seam the
    * streaming verification faces share (VERDICT r4 #1): the corpus is
    * written and streamed, never funneled through the driver. */
  def stageReplayFiles(classed: org.apache.spark.sql.DataFrame,
      nClasses: Int): String = {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("replay_stage_")
    val streamDir = root.resolve("stream")
    java.nio.file.Files.createDirectories(streamDir)
    (0 until nClasses).foreach { c =>
      val stage = root.resolve(s"stage$c").toString
      classed.where(col("cls") === c).drop("cls")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head.toPath
      val dst = streamDir.resolve(f"class$c%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000L + c * 60000L))
    }
    streamDir.toString
  }
}
