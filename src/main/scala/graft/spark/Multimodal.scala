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
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
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
    var checksum = 0L
    var i = 16
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    (id, w, h, c, bytes.length - 16, checksum)
  }
}
