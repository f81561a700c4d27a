package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decode/feature-extract as a batched per-partition stage.
  *
  * The actual image/audio codecs are NOT in this container, so the decode
  * is a clearly-marked deterministic STUB ([[decodeStub]]) that parses our
  * own fake header; everything Spark-side — binary column handling, struct
  * metadata schema, partition-batched decode, row-count-preserving map —
  * is real. On a real cluster the stub body is replaced by the codec call
  * (or, in PySpark, a pandas UDF over mapInPandas with the same batch
  * shape).
  */
object Multimodal {

  /** Synthesizes an opaque media payload per document: fake 16-byte header
    * (magic, width, height, channels) + body bytes derived from the text.
    * Deterministic stand-in for real image bytes. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TableIO.rebalanceSmall(TableIO(spark, sfDir).read("documents")
      .select("doc_id", "text").as[(Long, String)])
      .map { case (id, text) =>
        val w = 64 + (id % 8).toInt * 32
        val h = 64 + (id % 5).toInt * 48
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bb = java.nio.ByteBuffer.allocate(16 + body.length)
        bb.putInt(0x47524654) // 'GRFT'
        bb.putInt(w)
        bb.putInt(h)
        bb.putInt(3)
        bb.put(body)
        (id, bb.array(), "image/grft", body.length)
      }.toDF("doc_id", "media", "mime", "body_len")
  }

  /** STUB decoder: parses the fake header and computes cheap "features"
    * (dimensions, bytes, a checksum standing in for pixel statistics).
    * Replace the body of `decodeOne` with a real codec on a cluster. */
  def decodeStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir).select("doc_id", "media")
      .as[(Long, Array[Byte])]
    media.mapPartitions { it =>
      // batched per-partition decode: codec/context initialized once per
      // partition, amortized over the batch (the mapInPandas batch shape)
      it.map { case (id, bytes) =>
        decodeOne(id, bytes)
      }
    }.toDF("doc_id", "width", "height", "channels", "n_bytes", "checksum")
  }

  private def decodeOne(id: Long, bytes: Array[Byte]): (Long, Int, Int, Int, Int, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt()
    require(magic == 0x47524654, s"bad magic for doc $id")
    val w = bb.getInt(); val h = bb.getInt(); val c = bb.getInt()
    // polynomial byte checksum in GF(2^61-1): overflow-free on the JVM and
    // bit-exactly reproducible by the DuckDB oracle (the body is the UTF-8
    // of an ASCII text column, so bytes == character codes in SQL)
    var checksum = 0L
    var i = 16
    while (i < bytes.length) {
      checksum = (Hash61.mulmod(checksum, 31L) + (bytes(i) & 0xff)) % Hash61.M
      i += 1
    }
    (id, w, h, c, bytes.length - 16, checksum)
  }

  /** STUB feature extractor: per-channel statistics over the interleaved
    * 3-channel body (sum and max per channel, global mean byte) — the
    * feature-extract stage of the multimodal family, with the same
    * batched per-partition plumbing a real embedding/stat extractor
    * needs. Integer-exact except the mean (one long/long division —
    * reproduced identically by the oracle). */
  def featureStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).select("doc_id", "media")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val sums = new Array[Long](3)
          val maxs = new Array[Long](3)
          var i = 16
          while (i < bytes.length) {
            val v = (bytes(i) & 0xff).toLong
            val c = (i - 16) % 3
            sums(c) += v
            if (v > maxs(c)) maxs(c) = v
            i += 1
          }
          val bodyLen = bytes.length - 16
          val mean = (sums(0) + sums(1) + sums(2)).toDouble / bodyLen
          (id, sums(0), sums(1), sums(2), maxs(0), maxs(1), maxs(2), mean)
        }
      }.toDF("doc_id", "ch0_sum", "ch1_sum", "ch2_sum",
        "ch0_max", "ch1_max", "ch2_max", "mean_byte")
  }

  /** STUB resize: halves both header dimensions and keeps every 4th body
    * byte (the deterministic stand-in for 2×2 pixel pooling). Binary in →
    * binary out, row-preserving — the exact plumbing a real resampler
    * needs. Returns the new header fields + payload size for the oracle. */
  def resizeStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).select("doc_id", "media")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          require(bb.getInt() == 0x47524654, s"bad magic for doc $id")
          val w = bb.getInt(); val h = bb.getInt(); val c = bb.getInt()
          val body = java.util.Arrays.copyOfRange(bytes, 16, bytes.length)
          val pooled = Array.tabulate((body.length + 3) / 4)(i => body(i * 4))
          val out = java.nio.ByteBuffer.allocate(16 + pooled.length)
          out.putInt(0x47524654).putInt(w / 2).putInt(h / 2).putInt(c)
          out.put(pooled)
          (id, out.array(), w / 2, h / 2, pooled.length.toLong)
        }
      }.toDF("doc_id", "media", "width", "height", "n_bytes")
  }

  /** STUB frame sampler: treats the body as a fixed-rate "video" of
    * 256-byte frames and emits every 4th frame — the one-row-to-many-rows
    * (flatMap/explode) plumbing a real frame extractor needs, with a
    * synthetic presentation timestamp per frame. */
  def frameSample(spark: SparkSession, sfDir: String,
      frameBytes: Int = 256, every: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).select("doc_id", "media")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val bodyLen = bytes.length - 16
        val total = (bodyLen + frameBytes - 1) / frameBytes
        (0 until total by every).iterator.map { f =>
          val start = 16 + f * frameBytes
          val end = math.min(start + frameBytes, bytes.length)
          (id, f, (f * 40L), (end - start).toLong) // 25 fps → 40 ms/frame
        }
      }.toDF("doc_id", "frame_idx", "pts_ms", "frame_len")
  }
}
