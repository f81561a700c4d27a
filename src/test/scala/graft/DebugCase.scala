package graft

import graft.dom.HtmlParser
import graft.extract.{Cleaners, ExtractOptions, Extractor}

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Debug helper: run one regression case and dump got/want HTML + texts to
  * /tmp/graftdbg/<case>/ for diffing. Run via `Test/runMain graft.DebugCase
  * <case>`. */
object DebugCase {
  def main(args: Array[String]): Unit = {
    val caseName = args(0)
    val caseDir = new File(s"src/test/resources/regression/$caseName")
    def readFile(f: File): String =
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    val meta = readFile(new File(caseDir, "meta.txt")).split("\n")
    val url = meta(0).trim
    val original = readFile(new File(caseDir, "original.html"))
    val rdbl = readFile(new File(caseDir, "expected.rdbl"))
    val umFile = new File(caseDir, "urlmap.tsv")
    val um: Map[String, File] =
      if (!umFile.exists()) Map.empty
      else readFile(umFile).split("\n").filter(_.contains("\t")).map { line =>
        val Array(u, rel) = line.split("\t", 2)
        u -> new File(new File(caseDir, "mirror"), rel)
      }.toMap
    val fetch: String => Option[String] =
      u => um.get(u).filter(_.isFile).map(readFile)
    val summary = Extractor.extractMultiPage(original, ExtractOptions(url = url), fetch)
    val out = Paths.get(s"/tmp/graftdbg/$caseName")
    Files.createDirectories(out)
    Files.writeString(out.resolve("got.html"), if (summary.html == null) "" else summary.html)
    Files.writeString(out.resolve("want.html"), rdbl)
    Files.writeString(out.resolve("got.txt"), summary.text)
    val want = Extractor.normalizedText(HtmlParser.parseFragment(rdbl))
    Files.writeString(out.resolve("want.txt"), want)
    println(s"got=${summary.text.length} want=${want.length} confidence=${summary.confidence}")
  }
}
