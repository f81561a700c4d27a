package graft

import graft.spark.{Curation, Hash61, Shards}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Data-selection scorers (DSIR, bigram-LM perplexity) and the packing
  * layout: each operator is replayed by a naive in-memory reference over
  * the full sf0.001 corpus — exact integer equality, not statistics —
  * plus discrimination checks so a constant-output kernel can't pass. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docs(): Seq[(Long, String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("dsirWeights matches a naive in-memory reference exactly") {
    val nb = 256
    val corpus = docs()
    val ct = new Array[Long](nb); val cr = new Array[Long](nb)
    corpus.foreach { case (_, _, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val arr = if (ws.contains("dup")) ct else cr
      ws.foreach(w => arr((Hash61.wordHash(w) % nb).toInt) += 1)
    }
    val tT = ct.sum; val tR = cr.sum
    val lam = Curation.Lambda
    val sc = Array.tabulate(nb) { b =>
      math.floor(math.log((ct(b) + lam) * (tR + lam * nb) /
        ((cr(b) + lam) * (tT + lam * nb))) * 1e6).toLong
    }
    val want = corpus.map { case (id, src, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val s = ws.map(w => sc((Hash61.wordHash(w) % nb).toInt)).sum
      (id, src, ws.length.toLong, s, if (s > 0) 1L else 0L)
    }.sortBy(_._1)
    val got = Curation.dsirWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("dsirWeights recovers the planted target signature") {
    val marker = docs().collect {
      case (id, _, text) if text.split(" ").contains("dup") => id
    }.toSet
    assert(marker.nonEmpty && marker.size < 500)
    val rows = Curation.dsirWeights(spark, sfDir)
      .select("doc_id", "score_unats", "keep").collect()
    // every target-slice doc must score positive (the marker bucket's
    // weight dominates), and keep must not degenerate to all-1
    rows.filter(r => marker(r.getLong(0))).foreach { r =>
      assert(r.getLong(2) == 1L, s"doc ${r.getLong(0)} in target slice must keep")
    }
    val kept = rows.count(_.getLong(2) == 1L)
    assert(kept < rows.length, s"keep must split: $kept/${rows.length}")
    def mean(xs: Array[Double]) = xs.sum / math.max(xs.length, 1)
    val (tgt, rest) = rows.partition(r => marker(r.getLong(0)))
    assert(mean(tgt.map(_.getLong(1).toDouble)) > mean(rest.map(_.getLong(1).toDouble)))
  }

  test("perplexity matches a naive in-memory bigram LM exactly") {
    val corpus = docs()
    val vocab = corpus.flatMap(_._3.split(" ").filter(_.nonEmpty)).distinct.size.toLong
    val cbg = collection.mutable.Map.empty[Long, Long]
    val cctx = collection.mutable.Map.empty[Long, Long]
    val perDoc = corpus.map { case (id, _, text) =>
      val whs = text.split(" ").filter(_.nonEmpty).map(Hash61.wordHash)
      (id, whs, (1 until whs.length).map(i => (whs(i - 1), Hash61.shingleN(whs, i - 1, 2))))
    }
    perDoc.foreach { case (_, _, ps) => ps.foreach { case (h1, bg) =>
      cbg(bg) = cbg.getOrElse(bg, 0L) + 1; cctx(h1) = cctx.getOrElse(h1, 0L) + 1
    } }
    val want = perDoc.map { case (id, _, ps) =>
      val nll = -ps.map { case (h1, bg) =>
        math.floor(math.log((cbg(bg) + 1).toDouble / (cctx(h1) + vocab).toDouble) * 1e6).toLong
      }.sum
      (id, ps.length.toLong, nll, if (ps.isEmpty) 0L else nll / ps.length)
    }.sortBy(_._1)
    val got = Curation.perplexity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("perplexity discriminates: corpus-repeated phrasing scores lower") {
    // nll_per_bigram must vary across the corpus — a model that assigned
    // a constant bigram probability would collapse it to one value
    val vals = Curation.perplexity(spark, sfDir)
      .select("nll_per_bigram").collect().map(_.getLong(0)).filter(_ != 0L)
    assert(vals.distinct.length > 10, "per-bigram NLL must vary across docs")
  }

  test("packSequences matches a naive per-shard packer exactly") {
    val numShards = 8; val seqLen = 64
    val want = docs().map { case (id, _, text) =>
      (Hash61.mix(id) % numShards, id, text.split(" ").count(_.nonEmpty).toLong)
    }.groupBy(_._1).toSeq.flatMap { case (shard, ds) =>
      var acc = 0L
      ds.sortBy(_._2).map { case (_, id, n) =>
        val start = acc; acc += n
        val sFirst = start / seqLen
        val sLast = math.max(acc - 1, start) / seqLen
        (shard, id, n, start, sFirst, sLast, if (sFirst != sLast) 1L else 0L)
      }
    }.sortBy(_._2)
    val got = Shards.packSequences(spark, sfDir, numShards, seqLen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._2).toSeq
    assert(got == want)
    // the layout must contain crossers and non-crossers (attention-mask
    // handling is exercised) and every token position exactly once
    assert(got.exists(_._7 == 1L) && got.exists(_._7 == 0L))
    got.groupBy(_._1).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_._4)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._4 + a._3 == b._4, "token stream must be gap-free per shard")
      }
    }
  }

  test("ccnetBuckets: exact tercile cut on the deterministic rank, fluent head") {
    val ppl = Curation.perplexity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val srcs = docs().map(d => (d._1, d._2))
    val want = srcs.groupBy(_._2).flatMap { case (src, m) =>
      val ds = m.map(_._1).toSeq.map(id => (id, ppl(id)))
        .sortBy { case (id, p) => (p, id) }
      val n = ds.length
      ds.zipWithIndex.map { case ((id, p), i) =>
        val b = (i * 3) / n match {
          case 0 => "head"; case 1 => "middle"; case _ => "tail"
        }
        (id, src, p, b)
      }
    }.toSet
    val got = Curation.ccnetBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == want)
    // the split is by fluency: within each source, head ≤ middle ≤ tail
    got.groupBy(_._2).foreach { case (src, rs) =>
      def of(b: String) = rs.filter(_._4 == b).map(_._3)
      val (h, m, t) = (of("head"), of("middle"), of("tail"))
      assert(h.nonEmpty && m.nonEmpty && t.nonEmpty, s"$src missing a bucket")
      assert(h.max <= m.min && m.max <= t.min, s"$src buckets out of order")
    }
  }

  test("klDrift matches a naive in-memory reference exactly") {
    val nb = 256; val newMod = 4
    // replicate the operator's model verbatim: occupied buckets only,
    // add-λ over ALL buckets in the denominator, micro-nat floor per term
    val byBucket = scala.collection.mutable.Map.empty[(String, Int), (Long, Long)]
    docs().foreach { case (id, src, text) =>
      val isNew = Hash61.mix(id) % newMod == 0
      text.split(" ").iterator.filter(_.nonEmpty).foreach { w =>
        val k = (src, (Hash61.wordHash(w) % nb).toInt)
        val (cn, co) = byBucket.getOrElse(k, (0L, 0L))
        byBucket(k) = if (isNew) (cn + 1, co) else (cn, co + 1)
      }
    }
    val lam = Curation.Lambda; val lamB = lam * nb
    val want = byBucket.toSeq.groupBy(_._1._1).map { case (src, bks) =>
      val tn = bks.map(_._2._1).sum; val tl = bks.map(_._2._2).sum
      val kl = bks.map { case (_, (cn, co)) =>
        val pn = (cn + lam) / (tn + lamB)
        val po = (co + lam) / (tl + lamB)
        math.floor(pn * math.log(pn / po) * 1e6).toLong
      }.sum
      (src, tn, tl, kl)
    }.toSeq.sortBy(_._1)
    val got = Curation.klDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    // both slices must be populated in every source (else the gate
    // degenerates to comparing against the λ prior)
    got.foreach { case (src, tn, tl, _) =>
      assert(tn > 0 && tl > 0, s"$src has an empty slice")
    }
    // floored-term sum may undershoot true KL (≥ 0) by at most 1
    // micro-nat per occupied bucket
    got.foreach { case (src, _, _, kl) =>
      assert(kl >= -nb.toLong, s"$src: kl_unats=$kl below the floor bound")
    }
  }
}
