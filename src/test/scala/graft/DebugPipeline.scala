package graft

import graft.dom.{HtmlParser, Node}
import graft.extract._

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Step-by-step pipeline debugger for one regression case: traces which
  * stage removes a given needle text and what the candidate ranking is. */
object DebugPipeline {
  def main(args: Array[String]): Unit = {
    val caseName = args(0)
    val needle = args(1)
    def readFile(f: File): String =
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    val (original, url) =
      if (caseName.startsWith("/")) {
        // raw file mode: args(0)=path, args(2)=url
        (readFile(new File(caseName)), if (args.length > 2) args(2) else null)
      } else {
        val caseDir = new File(s"src/test/resources/regression/$caseName")
        (readFile(new File(caseDir, "original.html")),
          readFile(new File(caseDir, "meta.txt")).split("\n")(0).trim)
      }

    def has(doc: Node): Boolean = doc.textContent.contains(needle)
    def pathOf(doc: Node): String = {
      var target: Node = null
      doc.iterSubtree.foreach { n =>
        if (target == null && n.isElement && n.children.isEmpty == false || true) {}
      }
      def find(n: Node): Node = {
        if (n.isElement && (n.text != null && n.text.contains(needle))) return n
        var r: Node = null
        n.children.foreach { c =>
          if (r == null) {
            if (c.tail != null && c.tail.contains(needle)) r = n
            else r = find(c)
          }
        }
        r
      }
      target = find(doc)
      if (target == null) return "NOT FOUND"
      val sb = new StringBuilder
      var cur = target
      while (cur != null) {
        sb.insert(0, s"/${cur.tag}#${cur.attrOr("id", "")}.${cur.attrOr("class", "")}")
        cur = cur.parent
      }
      sb.toString
    }

    val doc = Extractor.parse(original, url)
    println(s"after parse+clean: has=${has(doc)} at ${pathOf(doc)}")
    doc.findAll("script").foreach(_.dropTree())
    doc.findAll("style").foreach(_.dropTree())
    doc.findAll("body").foreach(_.setAttr("id", "readabilityBody"))
    Extractor.removeUnlikelyCandidates(doc)
    println(s"after unlikely: has=${has(doc)} at ${pathOf(doc)}")
    Extractor.transformDoubleBreaks(doc)
    println(s"after double-breaks: has=${has(doc)} at ${pathOf(doc)}")
    Extractor.transformMisusedDivs(doc)
    println(s"after div2p: has=${has(doc)} at ${pathOf(doc)}")
    val candidates = Extractor.scoreParagraphs(doc)
    val top = candidates.toSeq.sortBy(-_._2).take(8)
    top.foreach { case (n, s) =>
      println(f"cand $s%8.2f  <${n.tag}> id='${n.attrOr("id", "")}' class='${n.attrOr("class", "")}' textlen=${Extractor.textLength(n)}")
    }
  }
}
