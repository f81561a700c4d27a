package graft

import graft.dom.{HtmlParser, Serializer}
import graft.extract.{Cleaners, ExtractOptions, Extractor}
import graft.spark.TranscriptGen

/** Phase timing of the per-document hot path. */
object HotPathProfile {
  def main(args: Array[String]): Unit = {
    val docs: Array[String] = (0 until 20000).map { i =>
      TranscriptGen.htmlWrap(i.toLong,
        ("the quick brown fox jumps over the lazy dog word" + (i % 97)) * 8)
    }.toArray
    val opts = ExtractOptions()

    def time(label: String)(f: String => Any): Unit = {
      // warmup
      docs.take(5000).foreach(f)
      val t0 = System.nanoTime()
      docs.foreach(f)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s ${docs.length / sec}%9.0f docs/sec  (${sec * 1e6 / docs.length}%6.1f us/doc)")
    }

    time("parse only")(h => HtmlParser.parse(h))
    time("parse+clean")(h => { val d = HtmlParser.parse(h); Cleaners.cleanHtml(d); d })
    time("+unlikely")(h => {
      val d = Extractor.parse(h); Extractor.removeUnlikelyCandidates(d); d
    })
    time("+doublebreaks")(h => {
      val d = Extractor.parse(h); Extractor.removeUnlikelyCandidates(d)
      Extractor.transformDoubleBreaks(d); d
    })
    time("+div2p")(h => {
      val d = Extractor.parse(h); Extractor.removeUnlikelyCandidates(d)
      Extractor.transformDoubleBreaks(d); Extractor.transformMisusedDivs(d); d
    })
    time("+score")(h => {
      val d = Extractor.parse(h); Extractor.removeUnlikelyCandidates(d)
      Extractor.transformDoubleBreaks(d); Extractor.transformMisusedDivs(d)
      Extractor.scoreParagraphs(d)
    })
    time("full extract")(h => Extractor.extract(h, opts))
    time("parse+serialize")(h => Serializer.serialize(HtmlParser.parse(h)))
  }
}
