package graft.core.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of the content-stream semantics against the reference's
  * specified behaviors (text_extract.go / tagged_content_parser.go), driven
  * through raw content streams with a simple uniform-width font.
  */
class PdfSemanticsSpec extends AnyFunSuite {

  private def font(width: Double = 500): PdfText.PdfFont =
    new PdfText.PdfFont(PdfText.winAnsiEnc,
      null, (0 until 256).map(c => c -> width).toMap, 500, isComposite = false)

  private def extract(content: String, fonts: Map[String, PdfText.PdfFont] = Map("F1" -> font())): String =
    PdfExtract.extractContentText(content.getBytes("ISO-8859-1"), fonts, Map.empty)

  test("reading-order sort: untagged spans sort by -devY then devX (L2)") {
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 300 100 Tm (bottom) Tj
        |1 0 0 1 50 700 Tm (top-left) Tj
        |1 0 0 1 300 700 Tm (top-right) Tj
        |ET""".stripMargin
    assert(extract(content) == "top-left top-right\nbottom")
  }

  test("tagged pages keep content-stream order (L2 tagged variant)") {
    val content =
      """/P <</MCID 0>> BDC
        |BT /F1 12 Tf
        |1 0 0 1 300 100 Tm (first-in-stream) Tj
        |1 0 0 1 50 700 Tm (second-in-stream) Tj
        |ET
        |EMC""".stripMargin
    assert(extract(content) == "first-in-stream\nsecond-in-stream")
  }

  test("artifact runs suppressed (L4, tagged_content_parser.go:289-354)") {
    val content =
      """/Artifact <</Type /Pagination>> BDC
        |BT /F1 12 Tf 1 0 0 1 50 780 Tm (HEADER) Tj ET
        |EMC
        |BT /F1 12 Tf 1 0 0 1 50 700 Tm (body text) Tj ET""".stripMargin
    assert(extract(content) == "body text")
  }

  test("ActualText replaces enclosed glyphs (L4)") {
    val content =
      """BT /F1 12 Tf 1 0 0 1 50 700 Tm
        |/Span <</ActualText (replacement)>> BDC
        |(ligature glyphs) Tj
        |EMC
        |ET""".stripMargin
    assert(extract(content) == "replacement")
  }

  test("ActualText UTF-16BE BOM decode, NBSP and tab become spaces") {
    // FEFF 0048 0069 00A0 0009 → "Hi  " (NBSP and tab → ' ')
    val content =
      "BT /F1 12 Tf 1 0 0 1 50 700 Tm " +
        "/Span <</ActualText <FEFF0048006900A00009>>> BDC (x) Tj EMC ET"
    assert(extract(content) == "Hi  ")
  }

  test("same-baseline gap > fontSize*0.2 emits a space (L1)") {
    // glyph width 500/1000*12 = 6pt per char; "AB" ends at x=62;
    // next chunk at x=80 → gap 18 > 12*0.2=2.4 → space
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 50 700 Tm (AB) Tj
        |1 0 0 1 80 700 Tm (CD) Tj
        |ET""".stripMargin
    assert(extract(content) == "AB CD")
  }

  test("adjacent chunks with no gap join without space (L1)") {
    // "AB" from x=50 ends at 62; next at exactly 62 → no space
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 50 700 Tm (AB) Tj
        |1 0 0 1 62 700 Tm (CD) Tj
        |ET""".stripMargin
    assert(extract(content) == "ABCD")
  }

  test("baseline change > fontSize*0.5 starts a new span → newline (L1)") {
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 50 700 Tm (line one) Tj
        |1 0 0 1 50 680 Tm (line two) Tj
        |ET""".stripMargin
    assert(extract(content) == "line one\nline two")
  }

  test("TJ kerning < -150 emits pending space (P6, text_extract.go:1084-1086)") {
    val content =
      """BT /F1 12 Tf 1 0 0 1 50 700 Tm
        |[(Hello) -200 (World)] TJ
        |ET""".stripMargin
    assert(extract(content) == "Hello World")
  }

  test("TJ kerning > -150 does not emit space") {
    val content =
      """BT /F1 12 Tf 1 0 0 1 50 700 Tm
        |[(Hel) -50 (lo)] TJ
        |ET""".stripMargin
    assert(extract(content) == "Hello")
  }

  test("Tc > 0.2 emits inter-character spaces inside TJ chunks (P6)") {
    val content =
      """BT /F1 12 Tf 0.5 Tc 1 0 0 1 50 700 Tm
        |[(abc)] TJ
        |ET""".stripMargin
    assert(extract(content) == "a b c")
  }

  test("T* and leading move to next line (P4)") {
    val content =
      """BT /F1 12 Tf 14 TL
        |1 0 0 1 50 700 Tm (one) Tj
        |T* (two) Tj
        |ET""".stripMargin
    assert(extract(content) == "one\ntwo")
  }

  test("' operator: next line + show (P5)") {
    val content =
      """BT /F1 12 Tf 14 TL 1 0 0 1 50 700 Tm (one) Tj
        |(two) '
        |ET""".stripMargin
    assert(extract(content) == "one\ntwo")
  }

  test("octal and special escapes in literal strings (P11)") {
    val content = "BT /F1 12 Tf 1 0 0 1 50 700 Tm (A\\051B\\\\C\\050D) Tj ET"
    assert(extract(content) == "A)B\\C(D")
  }

  test("hex strings decode (P11)") {
    val content = "BT /F1 12 Tf 1 0 0 1 50 700 Tm <48656C6C6F> Tj ET"
    assert(extract(content) == "Hello")
  }

  test("artifact-exit space heuristic (L4, tagged_content_parser.go:337-347)") {
    // artifact moves cursor right on the same line by > fontSize*0.2 → ' '
    val content =
      """BT /F1 12 Tf 1 0 0 1 50 700 Tm (before) Tj
        |/Artifact <</Type /Layout>> BDC
        |(XXXXXX) Tj
        |EMC
        |(after) Tj ET""".stripMargin
    val got = extract(content)
    assert(got == "before after", s"got '$got'")
  }

  test("Do XObject recursion with matrix and font shadowing (L5)") {
    val inner = "BT /F1 10 Tf 1 0 0 1 0 0 Tm (inner text) Tj ET"
    val xobj = PdfExtract.XObj(Map.empty, Map.empty,
      inner.getBytes("ISO-8859-1"), PdfText.Matrix3(1, 0, 0, 1, 50, 500))
    val content = "BT /F1 12 Tf 1 0 0 1 50 700 Tm (outer) Tj ET /X1 Do"
    val got = PdfExtract.extractContentText(content.getBytes("ISO-8859-1"),
      Map("F1" -> font()), Map("X1" -> xobj))
    assert(got == "outer\ninner text", s"got '$got'")
  }

  test("synthetic PDF round-trip with golden text") {
    val pdf = PdfBuilder.build(Seq(
      Seq(PdfBuilder.Line("Erste Zeile", 50, 700),
        PdfBuilder.Line("zweite Zeile", 50, 680)),
      Seq(PdfBuilder.Line("Seite zwei", 50, 700))),
      title = "Synth Doc")
    val f = new PdfFile(pdf)
    assert(f.pageCount == 2)
    assert(PdfExtract.metadata(f)("x-document-title") == "Synth Doc")
    assert(PdfExtract.pageText(f, 0).get == "Erste Zeile\nzweite Zeile")
    assert(PdfExtract.pageText(f, 1).get == "Seite zwei")
  }

  test("image page has images and no text (OCR trigger input)") {
    val pdf = PdfBuilder.build(Seq(Seq(PdfBuilder.Line("text page", 50, 700))),
      withImagePage = true)
    val f = new PdfFile(pdf)
    assert(f.pageCount == 2)
    assert(!PdfExtract.pageHasImages(f, 0))
    assert(PdfExtract.pageHasImages(f, 1))
    assert(PdfExtract.pageText(f, 1).getOrElse("") == "")
  }

  test("PdfDate formats (pdfdate_test.go:24-51)") {
    assert(PdfDate.toIso("D:20240419110302+02'00'") == "2024-04-19T11:03:02+02:00")
    assert(PdfDate.toIso("D:20240419110302Z") == "2024-04-19T11:03:02Z")
    assert(PdfDate.toIso("D:20240419110302") == "2024-04-19T11:03:02Z")
    assert(PdfDate.toIso("D:20240419110302Z00'00'") == "2024-04-19T11:03:02Z")
    assert(PdfDate.toIso("") == "")
    assert(PdfDate.toIso("garbage") == "")
  }
}

/** Extractor dispatch integration for PDF payloads. */
class PdfDispatchSpec extends AnyFunSuite {
  import graft.core.Extractor

  test("pdf payload: one text span per page + OCR media span for image pages") {
    val pdf = PdfBuilder.build(Seq(
      Seq(PdfBuilder.Line("Erste Seite Inhalt hier", 50, 700)),
      Seq(PdfBuilder.Line("zweite Seite", 50, 700))),
      title = "T", withImagePage = true)
    val b64 = java.util.Base64.getEncoder.encodeToString(pdf)
    val r = Extractor.extract("p1", Seq(Extractor.Span("pdf", b64, "", 0)),
      Extractor.Config(removeNewlines = false))
    assert(r.failure == "")
    // 2 text pages + image page (short text + images → media span, then empty page text)
    assert(r.spans.map(_.kind) == Seq("text", "text", "media", "text"),
      r.spans.map(s => (s.kind, s.text.take(30))).toString)
    assert(r.spans(0).text == "Erste Seite Inhalt hier\n")
    assert(r.spans(1).text == "zweite Seite\n")
    // O2: decodable rasters get per-image refs (name.ext), not the opaque
    // page ref — Multimodal.pdfMediaRows resolves them to bytes
    assert(r.spans(2).mediaRef == "pdf:p1/page2/Im1.png")
    assert(r.metadata("x-document-title") == "T")
  }

  test("sniffed %PDF- magic dispatches to the pdf kernel (docfactory.go:180-206)") {
    val pdf = PdfBuilder.build(Seq(Seq(PdfBuilder.Line("magic works", 50, 700))))
    val b64 = java.util.Base64.getEncoder.encodeToString(pdf)
    val r = Extractor.extract("p2", Seq(Extractor.Span("bin", b64, "", 0)),
      Extractor.Config(removeNewlines = false))
    assert(r.failure == "")
    assert(r.spans.head.text == "magic works\n")
  }
}
