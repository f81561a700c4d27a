package graft

import graft.extract.{Extractor, Pages}
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

object DebugNext2 {
  def main(args: Array[String]): Unit = {
    val path = args(0); val url = args(1)
    val html = new String(Files.readAllBytes(new File(path).toPath), StandardCharsets.UTF_8)
    val doc = Extractor.parse(html, url)
    val parsed = scala.collection.mutable.Set(args.drop(1): _*)
    val cands = Pages.nextPageCandidates(parsed, url, doc)
    cands.foreach { case (href, c) =>
      println(f"${c.score}%5d  $href  text='${c.linkText.take(50)}'")
    }
  }
}
