package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Golden tests against the reference's own fixture corpus
  * (office_parser_test.go:11-27, 91-114). The fixture files are read from
  * the read-only reference checkout; expected prefix/suffix/metadata values
  * are the constants from the reference test file.
  */
class OfficeXmlSpec extends AnyFunSuite {

  private val fixtureDir = "/root/reference/pkg/officexmlparser/testdata"

  private val beginning =
    "text-extraction-service\nTES is a simple Go service for extracting and storing textual content from PDF, RTF and legacy MS Word (.doc) documents."
  private val lastLine =
    "Nevertheless, if you intend to fork this project and remove the GPL-related code in favor of PDFium only, feel free to put it under Apache-2 license.\n"
  private val lastLineSlide =
    "(Experimental) Optical character recognition by Tesseract OCR (useful for images containing text and scanned PDFs)\n"

  private val expectedMeta = Map(
    "x-document-keywords" -> "PDF word document text extraction",
    "x-document-producer" -> "LibreOffice/24.2.7.2$Linux_X86_64 LibreOffice_project/420$Build-2",
    "x-document-subject" -> "Text extraction service",
    "x-document-title" -> "README of github.com/johbar/text-extraction-service")

  private def parse(ext: String): OfficeXml.OfficeDoc = {
    val data = Files.readAllBytes(Paths.get(s"$fixtureDir/readme.$ext"))
    OfficeXml.parse(data, ext)
  }

  private def checkReadme(ext: String): Unit = {
    val d = parse(ext)
    val text = d.fullText
    assert(text.startsWith(beginning), s"$ext text starts: ${text.take(160)}")
    if (ext == "pptx" || ext == "odp")
      assert(text.endsWith(lastLineSlide), s"$ext text ends: ...${text.takeRight(160)}")
    else
      assert(text.endsWith(lastLine), s"$ext text ends: ...${text.takeRight(160)}")
    expectedMeta.foreach { case (k, v) =>
      assert(d.metadata.get(k).contains(v), s"$ext metadata $k = ${d.metadata.get(k)}")
    }
  }

  test("odt readme matches reference goldens (TestOdt)") { checkReadme("odt") }
  test("odp readme matches reference goldens (TestOdp)") { checkReadme("odp") }
  test("docx readme matches reference goldens (TestDocx)") { checkReadme("docx") }
  test("pptx readme matches reference goldens (TestPptx)") { checkReadme("pptx") }

  test("pptx has per-slide pages, others -1 (office_parser.go:244-252)") {
    assert(parse("pptx").pages > 1)
    assert(parse("odp").pages == -1) // odp keeps all slides in one content.xml
    assert(parse("docx").pages == -1)
    assert(parse("odt").pages == -1)
  }

  test("zip without content files raises ContentNotFound (office_parser.go:98-100)") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("unrelated.txt"))
    z.write("hi".getBytes)
    z.closeEntry(); z.close()
    intercept[OfficeXml.ContentNotFoundException] {
      OfficeXml.parse(bos.toByteArray, "docx")
    }
  }

  test("slide numeric sort: slide10 after slide2 (office_parser.go:103-115)") {
    // synthesize a pptx-shaped zip with slides in adversarial zip order
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def slide(n: Int, txt: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(s"ppt/slides/slide$n.xml"))
      z.write(s"""<p:sld><p:cSld><a:t>$txt</a:t></p:cSld></p:sld>""".getBytes)
      z.closeEntry()
    }
    slide(10, "ten"); slide(2, "two"); slide(1, "one")
    z.close()
    val d = OfficeXml.parse(bos.toByteArray, "pptx")
    assert(d.contentTexts == Vector("one", "two", "ten"))
    assert(d.pages == 3)
  }

  test("xmlToText: whitespace collapse + break elements (xmltotext.go:46-77)") {
    val xml = "<root><body><p>a  b</p><x>  </x><y> </y><br/>c<text:s/>d</body></root>"
    // "a  b" collapses to "a b"; "  " (2 ws) dropped; " " (len 1) kept;
    // </p> and </br> emit newlines; </text:s> emits a space
    assert(OfficeXml.xmlToText(xml.getBytes, "body") == "a b\n \nc d")
  }

  test("xmlToText: tableStyleId UUID swallowed (xmltotext.go:58-64)") {
    val xml = "<root><cSld><a:t>x</a:t><tableStyleId>{UUID-HERE}</tableStyleId><a:t>y</a:t></cSld></root>"
    assert(OfficeXml.xmlToText(xml.getBytes, "cSld") == "xy")
  }

  test("xmlToText: content before body tag ignored (xmltotext.go:21-34)") {
    val xml = "<root>IGNORED<head>also ignored</head><body>kept</body></root>"
    assert(OfficeXml.xmlToText(xml.getBytes, "body") == "kept")
  }
}
