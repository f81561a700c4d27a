package graft
import graft.dom._
import graft.extract._
import java.io.File
import java.nio.file.Files
object DebugSlate {
  def main(args: Array[String]): Unit = {
    val caseDir = new File(s"src/test/resources/regression/${args(0)}")
    val url = new String(Files.readAllBytes(new File(caseDir,"meta.txt").toPath)).split("\n")(0).trim
    val html = new String(Files.readAllBytes(new File(caseDir,"original.html").toPath))
    val doc = Extractor.parse(html, url)
    doc.findAll("script").foreach(_.dropTree()); doc.findAll("style").foreach(_.dropTree())
    Extractor.removeUnlikelyCandidates(doc)
    def show(tag: String): Unit = doc.findAll(tag).foreach { a =>
      val chain = Iterator.iterate(a)(_.parent).takeWhile(_ != null).map(n => n.tag+"."+n.attrOr("class","")).take(5).mkString(" < ")
      println(s"[$tag] $chain children=${a.children.map(_.tag).mkString(",")}")
    }
    show("article")
    Extractor.transformDoubleBreaks(doc)
    println("--- after FSM ---")
    show("article")
  }
}
