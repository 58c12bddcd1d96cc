package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Ports the reference RTF suite (rtf_test.go:14-212) case by case, the
  * readme.rtf fixture goldens (rtf1_test.go:9-36), and verifies every
  * codepage cell against the reference's own tables (codepage.go) parsed at
  * test time.
  */
class RtfTextSpec extends AnyFunSuite {

  private val cases: Seq[(String, String, String)] = Seq(
    ("plain text", """{\rtf1\ansi Hello World}""", "Hello World"),
    ("bold ignored, text preserved", """{\rtf1\ansi \b Bold\b0  normal}""", "Bold normal"),
    ("paragraph break", """{\rtf1\ansi Line one\par Line two}""", "Line one\nLine two"),
    ("multiple paragraphs", """{\rtf1\ansi First\par Second\par Third}""", "First\nSecond\nThird"),
    ("tab character", """{\rtf1\ansi Col1\tab Col2}""", "Col1\tCol2"),
    ("em dash", """{\rtf1\ansi before\emdash after}""", "before—after"),
    ("en dash", """{\rtf1\ansi before\endash after}""", "before–after"),
    ("smart quotes", """{\rtf1\ansi \ldblquote hello\rdblquote}""", "“hello”"),
    ("bullet point", """{\rtf1\ansi \bullet item}""", "•item"),
    ("hex escape CP1252 euro sign", "{\\rtf1\\ansi\\ansicpg1252 \\'80}", "€"),
    ("hex escape accented char", "{\\rtf1\\ansi\\ansicpg1252 caf\\'e9}", "café"),
    ("unicode control word", "{\\rtf1\\ansi \\u8364?}", "€"),
    ("unicode negative value (signed 16-bit)", "{\\rtf1\\ansi \\u-32768?}", "耀"),
    ("skip fonttbl", """{\rtf1\ansi {\fonttbl{\f0 Arial;}}Hello}""", "Hello"),
    ("skip colortbl", """{\rtf1\ansi {\colortbl;\red0\green0\blue0;}Hello}""", "Hello"),
    ("skip info", """{\rtf1\ansi {\info{\author Joe}}Hello}""", "Hello"),
    ("skip pict", """{\rtf1\ansi {\pict\wmetafile8 AABBCC}Hello}""", "Hello"),
    ("field result included",
      """{\rtf1\ansi {\field{\fldinst HYPERLINK "http://x.com"}{\fldrslt Click here}}}""",
      "Click here"),
    ("ignorable destination star", """{\rtf1\ansi {\*\customdest secret}visible}""", "visible"),
    ("nested groups", """{\rtf1\ansi outer {\b bold} outer}""", "outer bold outer"),
    ("escaped braces", """{\rtf1\ansi \{brace\}}""", "{brace}"),
    ("line break", """{\rtf1\ansi line1\line line2}""", "line1\nline2"),
    ("non-breaking space", """{\rtf1\ansi hello\~world}""", "hello world"),
    ("skip stylesheet", """{\rtf1\ansi {\stylesheet{\s0 Normal;}}Text}""", "Text"),
    ("complex document",
      "{\\rtf1\\ansi\\ansicpg1252\\deff0" +
        "{\\fonttbl{\\f0\\froman\\fcharset0 Times New Roman;}}" +
        "{\\colortbl ;\\red0\\green0\\blue0;}" +
        "\\widowctrl\\wpaper12240\\wpapr15840\\margl1800\\margr1800\\margt1440\\margb1440" +
        "\\f0\\fs24 " +
        "This is {\\b bold} and {\\i italic} text.\\par " +
        "Second paragraph with caf\\'e9 and \\emdash dash.\\par " +
        "}",
      "This is bold and italic text.\nSecond paragraph with café and —dash.\n"),
    ("uc2 unicode skip", "{\\rtf1\\ansi\\uc2 \\u955??}", "λ")
  )

  cases.foreach { case (name, rtf, want) =>
    test(s"rtf_test.go: $name") {
      assert(RtfText.convert(rtf) == want)
    }
  }

  test("large stream: 10k paragraphs (TestConvert_LargeStream)") {
    val sb = new StringBuilder("""{\rtf1\ansi """)
    for (_ <- 0 until 10000) sb.append("""Line of text goes here\par """)
    sb.append("}")
    val out = RtfText.convert(sb.toString)
    assert(out.contains("Line of text goes here"))
  }

  test("empty input (TestConvert_EmptyInput)") {
    val got = RtfText.convert("""{\rtf1\ansi }""")
    assert(got == "" || got == " ")
  }

  test("readme.rtf fixture matches reference goldens (rtf1_test.go)") {
    val data = Files.readAllBytes(Paths.get("/root/reference/pkg/rtfparser/testdata/readme.rtf"))
    val txt = RtfText.convert(data)
    val beginning =
      "text-extraction-service\nTES is a simple Go service for extracting and storing textual content from PDF, RTF and legacy MS Word (.doc) documents."
    val lastLine =
      "Nevertheless, if you intend to fork this project and remove the GPL-related code in favor of PDFium only, feel free to put it under Apache-2 license.\n"
    assert(txt.startsWith(beginning), s"starts: ${txt.take(170)}")
    assert(txt.endsWith(lastLine), s"ends: ...${txt.takeRight(170)}")
  }

  test("codepage tables match the reference cell-for-cell (codepage.go)") {
    val src = new String(Files.readAllBytes(
      Paths.get("/root/reference/pkg/rtfparser/codepage.go")), "UTF-8")
    val tableRe = """(?s)var (\w+) = \[128\]rune\{(.*?)\}""".r
    val nameToPage = Map("cp1252" -> 1252, "cp1250" -> 1250, "cp1251" -> 1251,
      "cp1253" -> 1253, "cp1254" -> 1254, "cp437" -> 437, "cp850" -> 850,
      "cpMacRoman" -> 10000)
    val found = tableRe.findAllMatchIn(src).toList
    assert(found.size == 8, s"expected 8 tables in reference, found ${found.size}")
    found.foreach { m =>
      val name = m.group(1)
      val page = nameToPage(name)
      val cells = "0x[0-9A-Fa-f]+".r.findAllIn(m.group(2))
        .map(h => Integer.parseInt(h.drop(2), 16)).toArray
      assert(cells.length == 128, s"$name parsed ${cells.length} cells")
      for (b <- 0x80 to 0xFF) {
        val want = cells(b - 0x80).toChar
        val got = RtfCodepages.decode(b, page)
        assert(got == want,
          f"$name byte 0x$b%02X: got U+${got.toInt}%04X want U+${want.toInt}%04X")
      }
    }
  }

  test("latin-1 fallback for unknown codepages (codepage.go:27-29)") {
    assert(RtfCodepages.decode(0xE9, 99999) == 'é')
    assert(RtfCodepages.decode(0x41, 1252) == 'A')
  }
}
