package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's dehyphenator spec (dehyphen_test.go:53-221).
  * Each case cites the Go test it replicates. The Go suite also asserts
  * whole-input == byte-by-byte-chunked output; our implementation is a pure
  * function so chunking cases collapse into the same inputs.
  */
class DehyphenatorSpec extends AnyFunSuite {

  private def check(input: String, want: String): Unit =
    assert(Dehyphenator.dehyphenate(input, removeNewlines = false) == want)

  test("plain line passes through (TestPlainLine)") {
    check("Hallo Welt\n", "Hallo Welt\n")
  }

  test("line-break hyphen removed before lowercase (TestLineBreakHyphenRemoved)") {
    check("Stra-\nße\n", "Straße\n")
  }

  test("hyphen restored before uppercase (TestLineBreakHyphenRestoredBeforeUppercase)") {
    check("EU-\nInstitution\n", "EU-Institution\n")
  }

  test("abbreviation compound kept (TestAbbreviationCompoundKept)") {
    check("E-\nMail\n", "E-Mail\n")
  }

  test("multiple lines no hyphens (TestMultipleLinesNoHyphens)") {
    check("Erste Zeile\nZweite Zeile\nDritte Zeile\n",
      "Erste Zeile\nZweite Zeile\nDritte Zeile\n")
  }

  test("mixed hyphens in document (TestMixedHyphensInDocument)") {
    val input = List(
      "Das ist ein Bei-",
      "spiel für die",
      "EU-",
      "Kommission und E-",
      "Mail-Adressen.\n").mkString("\n")
    check(input, "Das ist ein Beispiel für die\nEU-Kommission und E-Mail-Adressen.\n")
  }

  test("empty lines skipped (TestEmptyLinesSkipped)") {
    check("Wort\n\nNoch\n", "Wort\nNoch\n")
  }

  test("hyphen-only line skipped (TestHyphenOnlyLineSkipped)") {
    check("-\nWort\n", "Wort\n")
  }

  test("pending hyphen survives blank line (TestLastHyphenSurvivesBlankLine)") {
    check("wei-\n\nter\n", "weiter\n")
  }

  test("leading whitespace trimmed (TestLeadingWhitespaceTrimmed)") {
    check("   Einrückung\n", "Einrückung\n")
  }

  test("trailing whitespace trimmed (TestTrailingWhitespaceTrimmed)") {
    check("Wort   \n", "Wort\n")
  }

  test("leading whitespace before hyphen line (TestLeadingWhitespaceBeforeHyphenLine)") {
    check("   wei-\n   ter\n", "weiter\n")
  }

  test("removeNewlines replaces separators with spaces (TestRemoveNewlines)") {
    assert(Dehyphenator.dehyphenate("Erste Zeile\nZweite Zeile\n", removeNewlines = true)
      == "Erste Zeile Zweite Zeile ")
  }

  test("removeNewlines with hyphen (TestRemoveNewlinesWithHyphen)") {
    assert(Dehyphenator.dehyphenate("wei-\nter\n", removeNewlines = true) == "weiter ")
  }

  test("no trailing newline still flushed (TestNoTrailingNewline)") {
    check("Wort", "Wort\n")
  }

  test("no trailing newline after hyphen (TestNoTrailingNewlineAfterHyphen)") {
    check("Wort-\nTeil", "Wort-Teil\n")
  }

  test("pending hyphen at EOF emits bare stem (dehyphen.go:104-112 Close semantics)") {
    check("wei-\n", "wei")
  }

  test("soft hyphen U+00AD is a hyphen (unicode.Hyphen table)") {
    check("Stra­\nße\n", "Straße\n")
    check("EU­\nInstitution\n", "EU­Institution\n")
  }

  test("NBSP is whitespace for trimming (Go unicode.IsSpace)") {
    check(" Wort \n", "Wort\n")
  }

  // Properties over seeded random documents (deterministic).
  private val words = Array("wort", "Wort", "EU", "E", "stra", "ße", "Mail",
    "x", "Institution", "-", "", "  ", "über")

  test("property: no hyphen directly before a newline separator") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val lines = Seq.fill(rnd.nextInt(8))(
        Seq.fill(rnd.nextInt(4) + 1)(words(rnd.nextInt(words.length))).mkString(" ") +
          Seq("", "-", "‐")(rnd.nextInt(3)))
      val out = Dehyphenator.dehyphenate(lines.mkString("\n") + "\n", removeNewlines = false)
      val bad = out.sliding(2).exists(p =>
        p.length == 2 && Dehyphenator.isHyphen(p.charAt(0).toInt) && p.charAt(1) == '\n')
      assert(!bad, s"lines=$lines out=$out")
    }
  }

  test("property: dehyphenation is idempotent for hyphen-free text") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val lines = Seq.fill(rnd.nextInt(8))(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
      val once = Dehyphenator.dehyphenate(lines.mkString("\n"), removeNewlines = false)
      assert(Dehyphenator.dehyphenate(once, removeNewlines = false) == once)
    }
  }
}
