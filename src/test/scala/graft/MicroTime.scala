package graft
import graft.extract.{ExtractOptions, Extractor}
import graft.spark.TranscriptGen
object MicroTime {
  def main(args: Array[String]): Unit = {
    val docs = (0 until 20000).map { i =>
      TranscriptGen.htmlWrap(i.toLong,
        ("the quick brown fox jumps over the lazy dog word" + (i % 97)) * 8)
    }.toArray
    val opts = ExtractOptions()
    var sink = 0
    for (round <- 1 to 6) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < docs.length) { sink ^= Extractor.extract(docs(i), opts).text.length; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"round $round: ${docs.length / sec}%9.0f docs/sec (${sec * 1e6 / docs.length}%6.1f us/doc) sink=$sink")
    }
  }
}
