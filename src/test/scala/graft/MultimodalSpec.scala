package graft

import graft.spark.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary plumbing: opaque media columns with typed metadata,
  * row-preserving decode/resize, one-to-many frame sampling. Codecs are
  * stubbed (absent in this container); these tests pin the Spark-side
  * contracts a real codec would inherit. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("decode is row-preserving and reads back the header law") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val decoded = Multimodal.decodeStub(spark, sfDir)
      .as[(Long, Int, Int, Int, Int, Long)].collect()
    assert(decoded.length == docs)
    decoded.foreach { case (id, w, h, c, _, _) =>
      assert(w == 64 + (id % 8).toInt * 32)
      assert(h == 64 + (id % 5).toInt * 48)
      assert(c == 3)
    }
  }

  test("resize halves dimensions, keeps magic, pools body 4:1") {
    val s = spark
    import s.implicits._
    val rows = Multimodal.resizeStub(spark, sfDir)
      .select("doc_id", "media", "width", "height", "n_bytes")
      .as[(Long, Array[Byte], Int, Int, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, media, w, h, n) =>
      val bb = java.nio.ByteBuffer.wrap(media)
      assert(bb.getInt() == 0x47524654, s"doc $id lost its magic")
      assert(bb.getInt() == w && w == (64 + (id % 8).toInt * 32) / 2)
      assert(bb.getInt() == h && h == (64 + (id % 5).toInt * 48) / 2)
      assert(media.length - 16 == n)
    }
  }

  test("frame sampling: every 4th 256-byte frame, lengths cover the tail") {
    val s = spark
    import s.implicits._
    val frames = Multimodal.frameSample(spark, sfDir)
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1)
    val bodyLens = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8'))")
      .as[(Long, Long)].collect().toMap
    assert(frames.nonEmpty)
    frames.foreach { case (id, fs) =>
      val blen = bodyLens(id)
      val total = ((blen + 255) / 256).toInt
      val expectedIdx = (0 until total by 4).toSeq
      assert(fs.map(_._2).sorted.toSeq == expectedIdx, s"doc $id")
      fs.foreach { case (_, f, pts, len) =>
        assert(pts == f * 40L)
        assert(len == math.min(256L, blen - f * 256L))
      }
    }
  }

  test("feature extraction: channel sums reconcile with the byte total") {
    val s = spark
    import s.implicits._
    val rows = Multimodal.featureStub(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect()
    val bodies = Multimodal.mediaTable(spark, sfDir)
      .select("doc_id", "media").as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> b.drop(16) }.toMap
    assert(rows.length == bodies.size)
    rows.foreach { case (id, s0, s1, s2, m0, m1, m2, mean) =>
      val body = bodies(id)
      assert(s0 + s1 + s2 == body.map(_ & 0xff).map(_.toLong).sum)
      assert(mean == (s0 + s1 + s2).toDouble / body.length)
      assert(Seq(m0, m1, m2).max == body.map(_ & 0xff).max.toLong)
    }
  }
}
