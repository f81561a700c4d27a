package graft.spark

import graft.extract.{ExtractOptions, Extractor}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

import scala.collection.mutable

/** The Spark-native extraction pipeline (SURVEY.md §3 "Spark lifecycle
  * equivalent"):
  *
  *   scan (column-pruned to conv_id/turn_idx/text) →
  *   explicit bucketing on hash(conv_id) with turn-level salting for
  *   skewed long conversations →
  *   one `mapPartitions` hot path (batched per-partition DOM tokenize +
  *   node-classify: the whole readability pipeline, node-local, zero
  *   shuffle after the bucketing exchange) →
  *   extracted turns + per-partition lineage rows.
  *
  * Scale notes (10^12 turns, 1000 executors):
  *  - extraction is per-turn independent ⇒ salting is safe and the single
  *    exchange is the only shuffle in the job; with Iceberg hidden
  *    partitioning `bucket(B, conv_id)` even that exchange disappears
  *    (the scan is already bucketed) — the local stand-in keeps the seam;
  *  - per-row memory is bounded by one DOM (~8× payload size); pathological
  *    payloads fail soft into `failed=true` rows like the reference's
  *    Unparseable (readability.py:670-676), never killing the task;
  *  - lineage rows (1 per bucket) ride a CollectionAccumulator —
  *    deduplicated by bucket on read, so task retries cannot double-count.
  */
object ExtractJob {

  val HistogramBins = 12 // confidence bins: [0,10), [10,20), …, [110,∞)

  /** Extraction result: the distributed dataset plus (after an action)
    * the per-bucket lineage rows. */
  final class Result(
      val extracted: Dataset[ExtractedTurn],
      acc: CollectionAccumulator[LineageRow]) {
    /** Per-bucket lineage, valid once an action has run; deduped by
      * bucket id (task retries may report twice). */
    def lineageRows: Seq[LineageRow] = {
      val seen = mutable.Set.empty[Int]
      val out = Seq.newBuilder[LineageRow]
      acc.value.forEach { r => if (seen.add(r.bucket)) out += r }
      out.result()
    }
  }

  /** Number of salt values for long conversations: a conversation spreads
    * over at most `salt` buckets, each still sorted by turn_idx within. */
  def saltFor(numBuckets: Int): Int = math.max(1, numBuckets / 8)

  def extractTurn(t: Turn, opts: ExtractOptions): ExtractedTurn = {
    val s = Extractor.extract(t.text, opts)
    ExtractedTurn(t.conv_id, t.turn_idx, s.confidence,
      s.html, s.text, s.spans.map { case (a, b) => Span(a, b) }, s.failed)
  }

  /** Stable data-level bucket of a turn — the resume/lineage unit. Must be
    * a pure function of the ROW (not of Spark partition indexes), so a
    * restarted run reproduces it. */
  def bucketCol(numBuckets: Int): org.apache.spark.sql.Column = {
    val salt = saltFor(numBuckets)
    pmod(hash(col("conv_id"), pmod(col("turn_idx"), lit(salt))), lit(numBuckets))
  }

  /** A turn tagged with its stable data-level bucket. */
  final case class BucketedTurn(bucket: Int, conv_id: String, turn_idx: Int,
      role: String, text: String, tool: String, ts: java.sql.Timestamp)

  private final class BucketStats {
    var nOk = 0L
    var nFail = 0L
    var nEmpty = 0L
    val hist = new Array[Long](HistogramBins)
    val t0: Long = System.nanoTime()
  }

  /** Core distributed extraction: bucket + salt, then one mapPartitions.
    * Output is sorted within partitions by (conv_id, turn_idx) — stable
    * turn ordering per the north rule. Lineage is tracked per data-level
    * bucket (a partition may host several buckets after the hash
    * exchange). */
  def run(spark: SparkSession, turns: Dataset[Turn], numBuckets: Int,
      fingerprint: String = "local"): Result =
    runImpl(spark, turns, numBuckets, fingerprint, exchange = true)

  /** The production shape on an Iceberg table with hidden partitioning
    * `bucket(B, conv_id)`: the scan is already clustered by bucket, so the
    * exchange is elided and the job is map-only (plus a partition-local
    * sort for stable turn ordering). Lineage still keys on the data-level
    * bucket. Correctness is identical to [[run]] — only the physical
    * distribution differs (ScalingBench measures both). */
  def runPreBucketed(spark: SparkSession, turns: Dataset[Turn], numBuckets: Int,
      fingerprint: String = "local"): Result =
    runImpl(spark, turns, numBuckets, fingerprint, exchange = false)

  private def runImpl(spark: SparkSession, turns: Dataset[Turn], numBuckets: Int,
      fingerprint: String, exchange: Boolean): Result = {
    import spark.implicits._
    val tagged = turns
      .withColumn("bucket", bucketCol(numBuckets))
      .select("bucket", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[BucketedTurn]
    val bucketed =
      (if (exchange) tagged.repartition(numBuckets, col("bucket")) else tagged)
        .sortWithinPartitions("conv_id", "turn_idx")

    val acc: CollectionAccumulator[LineageRow] =
      spark.sparkContext.collectionAccumulator[LineageRow]("graft.lineage")
    val opts = ExtractOptions()

    val extracted = bucketed.mapPartitions { it =>
      val stats = mutable.LongMap.empty[BucketStats]
      var pending = true
      val out = it.map { bt =>
        val t = Turn(bt.conv_id, bt.turn_idx, bt.role, bt.text, bt.tool, bt.ts)
        val r = extractTurn(t, opts)
        val s = stats.getOrElseUpdate(bt.bucket.toLong, new BucketStats)
        if (r.failed) s.nFail += 1
        else if (r.extracted_html == null) s.nEmpty += 1
        else {
          s.nOk += 1
          val bin = math.min(math.max((r.confidence / 10).toInt, 0), HistogramBins - 1)
          s.hist(bin) += 1
        }
        r
      }
      new Iterator[ExtractedTurn] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h && pending) {
            stats.foreach { case (bucket, s) =>
              acc.add(LineageRow(fingerprint, bucket.toInt, s.nOk, s.nFail,
                s.nEmpty, s.hist, (System.nanoTime() - s.t0) / 1000000L))
            }
            pending = false
          }
          h
        }
        def next(): ExtractedTurn = out.next()
      }
    }
    new Result(extracted, acc)
  }

  // ---------- resumable run (north rule: snapshot checkpoints) ----------

  /** Input "snapshot id" stand-in: fingerprint of the input files
    * (path, size) — deterministic, no wall clock. With real Iceberg this
    * is the snapshot id. */
  def inputFingerprint(spark: SparkSession, path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return "missing"
    val parts = fs.listStatus(p).map(s => s"${s.getPath.getName}:${s.getLen}")
      .sorted.mkString(",")
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(parts).toLong & 0xffffffffL)
  }

  /** Resumable extraction: processes only buckets not yet recorded in the
    * ledger for this input fingerprint, appends bucket-partitioned output,
    * then appends ledger + lineage rows. Restart-safe: a crashed run
    * re-processes only unledgered buckets (bucket partitions are
    * dynamically overwritten, so partial bucket output is replaced,
    * giving exactly-once per bucket). All sink I/O goes through the
    * [[TableIO]] seam — parquet dirs locally, a lakehouse catalog on a
    * cluster. */
  def runResumable(spark: SparkSession, turns: Dataset[Turn], numBuckets: Int,
      fingerprint: String, io: TableIO,
      outTable: String, ledgerTable: String): Seq[LineageRow] = {
    import spark.implicits._
    // done-buckets as a broadcast LEFT ANTI join against the ledger — no
    // driver collect and no isin literal list (which at production bucket
    // counts, 2^15+, becomes a giant expression tree; VERDICT.md "What's
    // wrong" #3)
    val remaining =
      if (!io.exists(ledgerTable)) turns
      else {
        val done = io.read(ledgerTable)
          .where(col("input_fingerprint") === fingerprint)
          .select("bucket").distinct()
        turns.withColumn("bucket", bucketCol(numBuckets))
          .join(broadcast(done), Seq("bucket"), "left_anti")
          .drop("bucket").as[Turn]
      }

    val res = run(spark, remaining, numBuckets, fingerprint)
    // dynamic partition overwrite: only the buckets written by THIS run
    // are replaced, so a bucket half-written by a crashed attempt is
    // cleanly overwritten when its turn comes again (exactly-once per
    // bucket), while ledgered buckets' output is untouched
    io.writePartitioned(
      res.extracted.withColumn("bucket", bucketCol(numBuckets)).toDF(),
      outTable, "bucket")
    val lineage = res.lineageRows
    io.write(spark.createDataset(lineage).toDF(), ledgerTable, SaveMode.Append)
    lineage
  }

}
