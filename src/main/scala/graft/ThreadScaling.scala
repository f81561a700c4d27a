package graft

import graft.extract.{ExtractOptions, Extractor}
import graft.spark.TranscriptGen

import java.util.concurrent.atomic.AtomicInteger

/** Hardware-scaling diagnostic: pure-thread extraction throughput (no
  * Spark) at various thread counts, to separate engine/executor overhead
  * from the sandbox's memory-bandwidth ceiling. */
object ThreadScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = 40000
    val docs: Array[String] = (0 until nDocs).map { i =>
      TranscriptGen.htmlWrap(i.toLong,
        ("the quick brown fox jumps over the lazy dog word" + (i % 97)) * 8)
    }.toArray

    def run(threads: Int): Double = {
      val idx = new AtomicInteger(0)
      val opts = ExtractOptions()
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < nDocs) {
            Extractor.extract(docs(i), opts)
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
      nDocs / ((System.nanoTime() - t0) / 1e9)
    }

    run(8) // warmup
    run(8)
    // max-of-3 per thread count: co-tenant noise swings single samples
    // several-fold on this shared box
    Seq(1, 2, 4, 8, 16, 32).foreach { k =>
      val thru = (1 to 3).map(_ => run(k)).max
      println(f"threads=$k%2d  docs/sec=$thru%9.0f  per-thread=${thru / k}%8.0f")
    }
  }
}
