package graft.core.pdf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class PdfFileSpec extends AnyFunSuite {

  private def load(name: String) = new PdfFile(
    Files.readAllBytes(Paths.get(s"/root/reference/pkg/pdflibwrappers/testdata/$name")))

  test("2000001.pdf: xref stream + object streams, 2 pages, Info title") {
    val f = load("2000001.pdf")
    assert(f.pageCount == 2, s"pages=${f.pageCount}")
    val title = f.infoDict.flatMap(_.get("Title")).flatMap(f.str)
      .map(PdfText.decodePdfTextString).getOrElse("")
    assert(title == "Drucksache 20/1", s"title=$title")
    val content = f.pageContent(f.pages.head._1)
    assert(content.length > 100, s"content len=${content.length}")
    assert(new String(content, "ISO-8859-1").contains("BT"))
  }

  test("readme.pdf: classic xref table, pages and content decode") {
    val f = load("readme.pdf")
    assert(f.pageCount >= 1, s"pages=${f.pageCount}")
    val content = f.pageContent(f.pages.head._1)
    assert(content.length > 50)
  }
}
