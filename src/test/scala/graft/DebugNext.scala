package graft

import graft.extract.{ExtractOptions, Extractor, Pages}

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Debug: print next-page candidate scores for a regression case. */
object DebugNext {
  def main(args: Array[String]): Unit = {
    val caseName = args(0)
    val caseDir = new File(s"src/test/resources/regression/$caseName")
    def readFile(f: File): String =
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    val url = readFile(new File(caseDir, "meta.txt")).split("\n")(0).trim
    val original = readFile(new File(caseDir, "original.html"))
    val doc = Extractor.parse(original, url)
    val parsed = scala.collection.mutable.Set(url)
    println("baseUrl = " + Pages.findBaseUrl(url))
    // reproduce candidate scoring with visibility
    val next = Pages.findNextPageUrl(parsed, url, doc)
    println("next = " + next)
    // list all hrefs containing likely pagination markers
    doc.findAll("a").foreach { a =>
      val h = a.attrOr("href", "")
      if (h.contains("_story_") || h.toLowerCase.contains("pagewanted") ||
        h.toLowerCase.contains("page=")) {
        println(s"link href=$h text='${a.textContent.trim.take(40)}' class='${a.attrOr("class","")}'")
      }
    }
  }
}
