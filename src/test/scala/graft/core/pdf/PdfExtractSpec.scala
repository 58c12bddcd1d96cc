package graft.core.pdf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class PdfExtractSpec extends AnyFunSuite {

  private def load(name: String) = new PdfFile(
    Files.readAllBytes(Paths.get(s"/root/reference/pkg/pdflibwrappers/testdata/$name")))

  test("2000001.pdf page 0 text (pdflib_test.go:144-147: >= 30 chars)") {
    val f = load("2000001.pdf")
    val txt = PdfExtract.pageText(f, 0).getOrElse("")
    info(s"page0 (${txt.length} chars): ${txt.take(600)}")
    assert(txt.length >= 30)
    val txt2 = PdfExtract.pageText(f, 1).getOrElse("")
    info(s"page1 (${txt2.length} chars): ${txt2.take(300)}")
    assert(txt2.nonEmpty)
    // pinned regression goldens (our extraction of the real Bundestag doc:
    // CID font decode, reading order, artifact suppression all visible here)
    assert(txt.contains("Deutscher Bundestag  Drucksache 20/1")) // 2-space gap: separate spans joined
    assert(txt.contains("20. Wahlperiode  25.10.2021"))
    assert(txt.contains("Der Bundestag wolle beschließen:"))
    assert(txt.contains("die Geschäftsordnung des Deutschen Bundestages"))
    assert(txt.trim.endsWith("(BGBl. I S. 677);"))
  }

  test("2000001.pdf metadata (title golden, 13 native keys)") {
    val f = load("2000001.pdf")
    val m = PdfExtract.metadata(f)
    info(m.toString)
    assert(m("x-document-title") == "Drucksache 20/1")
    assert(m("x-document-pages") == "2")
    assert(m.size == 13)
  }

  test("readme.pdf extracts text and reports images (extract_test.go)") {
    val f = load("readme.pdf")
    val txt = PdfExtract.pageText(f, 0).getOrElse("")
    info(s"page0 (${txt.length} chars): ${txt.take(400)}")
    assert(PdfExtract.pageHasImages(f, 0))
  }
}
