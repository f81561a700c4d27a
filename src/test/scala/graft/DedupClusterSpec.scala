package graft

import graft.spark.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Near-dup clustering over the MinHash-LSH pair graph: the min-label
  * propagation must land on the unique fixpoint — both endpoints of every
  * pair share a cluster, the cluster id is its smallest member, and the
  * result is identical across runs. */
class DedupClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("clusters are the min-label fixpoint of the pair graph") {
    val s = spark
    import s.implicits._
    val labels = Dedup.clusters(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.minhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()

    // every doc labeled; ids never exceed their own doc_id
    labels.foreach { case (id, c) => assert(c <= id) }
    // endpoints of every dup pair agree
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    // each cluster id is its own smallest member
    labels.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c missing its min member")
    }
    // docs in no pair are singletons
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.foreach { case (id, c) =>
      if (!paired.contains(id)) assert(c == id)
    }
  }

  test("clustering is deterministic across runs") {
    val s = spark
    import s.implicits._
    val a = Dedup.clusters(spark, sfDir).as[(Long, Long)].collect().sorted.toSeq
    val b = Dedup.clusters(spark, sfDir).as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
