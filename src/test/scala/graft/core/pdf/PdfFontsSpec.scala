package graft.core.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Targeted font-machinery tests (P8-P10): encodings with Differences,
  * glyph-name resolution incl. uniXXXX, ToUnicode bfchar/bfrange in both
  * forms, CID widths — each against the reference's specified behavior.
  */
class PdfFontsSpec extends AnyFunSuite {

  test("glyphToRune: names, single chars, uniXXXX (text_extract.go:1655-1668)") {
    assert(PdfText.glyphToRune("adieresis").contains(0xE4))
    assert(PdfText.glyphToRune("germandbls").contains(0xDF))
    assert(PdfText.glyphToRune("nonbreakingspace").contains(' '.toInt)) // NBSP→space
    assert(PdfText.glyphToRune("Q").contains('Q'.toInt))
    assert(PdfText.glyphToRune("7").contains('7'.toInt)) // single char fallback
    assert(PdfText.glyphToRune("uni20AC").contains(0x20AC))
    assert(PdfText.glyphToRune("unknownglyphname").isEmpty)
  }

  test("named encodings: WinAnsi/MacRoman NBSP→space quirk (text_extract.go:125-126, 1639-1640)") {
    assert(PdfText.winAnsiEnc(0x80) == 0x20AC)
    assert(PdfText.standardEnc(0xA0) == ' '.toInt)
    assert(PdfText.macRomanEnc(0xC8) == ' '.toInt) // the reference's NBSP position (text_extract.go:1639-1640)
    assert(PdfText.macRomanEnc(0x80) == 0x00C4)
  }

  test("Differences overlay on base encoding (applyDifferences, text_extract.go:535-548)") {
    // build a font dict via a synthetic PDF fragment parsed by PdfLexer
    val frag = "<< /BaseEncoding /WinAnsiEncoding /Differences [ 65 /germandbls 66 /uni0041 /eacute ] >>"
    val lex = new PdfLexer(frag.getBytes("ISO-8859-1"), 0)
    val dict = lex.parseObj()
    val f = new PdfFile(minimalPdf)
    val enc = PdfText.parseEncoding(f, dict)
    assert(enc(65) == 0xDF) // A → ß
    assert(enc(66) == 0x41) // B → uni0041
    assert(enc(67) == 0xE9) // C → é (code auto-increments)
    assert(enc(0x80) == 0x20AC) // base preserved elsewhere
  }

  test("ToUnicode bfchar + bfrange scalar and array forms (text_extract.go:1248-1326)") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |2 beginbfchar
        |<0041> <0058>
        |<0042><00590059>
        |endbfchar
        |1 beginbfrange
        |<0050> <0052> <0061>
        |endbfrange
        |1 beginbfrange
        |<0060> <0061> [<0041> <0042>]
        |endbfrange
        |endcmap""".stripMargin
    val m = PdfText.parseToUnicodeCMap(cmap.getBytes("ISO-8859-1"))
    assert(m(0x41) == "X")
    assert(m(0x42) == "YY") // multi-char mapping
    assert(m(0x50) == "a" && m(0x51) == "b" && m(0x52) == "c") // scalar range
    assert(m(0x60) == "A" && m(0x61) == "B") // array range
  }

  test("composite font decode prefers 2-byte ToUnicode codes (decodeBytes)") {
    val f = new PdfText.PdfFont(null,
      Map(0x0041 -> "Ä", 0x42 -> "b"),
      Map(0x0041 -> 600.0), 500, isComposite = true)
    val sb = new java.lang.StringBuilder
    f.decodeBytes(Array(0x00, 0x41, 0x42).map(_.toByte), sb)
    assert(sb.toString == "Äb")
    // 2-byte advance consumed both bytes, then 1-byte toUnicode for 0x42
    assert(f.glyphAdvance(Array(0x00, 0x41).map(_.toByte), 0) == ((600.0, 2)))
  }

  test("Type3 font: FirstChar/Widths advance via the simple-font path (text_extract.go:399-425)") {
    // the reference has no Type3 special case — a /Subtype /Type3 font's
    // widths flow through the same FirstChar/Widths parse as Type1/TrueType
    // (FontMatrix is NOT applied to advances); pin that behavior
    val frag = "<< /Font << /T3 << /Type /Font /Subtype /Type3 /FirstChar 65 " +
      "/Widths [ 700 800 ] /FontMatrix [0.001 0 0 0.001 0 0] " +
      "/Encoding << /Differences [ 65 /germandbls 66 /A ] >> >> >> >>"
    val lex = new PdfLexer(frag.getBytes("ISO-8859-1"), 0)
    val res = lex.parseObj().asInstanceOf[PdfDict]
    val f = new PdfFile(minimalPdf)
    val t3 = PdfText.buildFontMap(f, res)("T3")
    assert(!t3.isComposite)
    assert(t3.glyphAdvance(Array(65.toByte), 0) == ((700.0, 1)))
    assert(t3.glyphAdvance(Array(66.toByte), 0) == ((800.0, 1)))
    assert(t3.glyphAdvance(Array(67.toByte), 0) == ((500.0, 1))) // MissingWidth default
    val sb = new java.lang.StringBuilder
    t3.decodeBytes(Array(65.toByte, 66.toByte), sb)
    assert(sb.toString == "ßA") // Differences overlay decodes Type3 codes
  }

  private lazy val minimalPdf = PdfBuilder.build(Seq(Seq(PdfBuilder.Line("x", 50, 700))))
}
