package graft.core

import scala.collection.mutable

/** Streaming RTF → plain text (reference: pkg/rtfparser/rtf.go:74-434).
  *
  * Semantics preserved exactly:
  *   - group stack with inherited (destination, skip, codePage, ucValue)
  *     state (rtf.go:106-123);
  *   - ignored destinations table, with `fldrslt` explicitly KEPT
  *     (rtf.go:42-62, 278-281);
  *   - control symbols: escaped braces/backslash, `\~`=NBSP, `\_`=U+2011,
  *     `\-`/`\|`/`\:` skipped, `\<newline>` = paragraph (rtf.go:142-184);
  *   - `\par \page \column \softcol \softpage` → '\n' (writeParagraph),
  *     `\line \softline` → '\n', `\tab` → '\t', `\cell` → ' ', `\row` → '\n'
  *     (rtf.go:282-349);
  *   - `\uN`: signed 16-bit (+65536 when negative), then skip ucValue
  *     fallback chars; `\ucN` sets the per-group skip count (rtf.go:294-305);
  *   - `\'xx` hex byte via the group's codepage; malformed hex skipped;
  *     fallback-skip consumes hex escapes too (rtf.go:357-381);
  *   - bare CR/LF are not content (rtf.go:96-97).
  */
object RtfText {

  private final class Group(
      var destination: String,
      var skip: Boolean,
      var codePage: Int,
      var ucValue: Int)

  /** Destinations whose content is suppressed (rtf.go:42-62). */
  private val IgnoredDestinations: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "objdata", "result", "fldinst", "shppict", "nonshppict", "themedata",
    "colorschememapping", "datastore", "latentstyles", "revtbl", "rsidtbl",
    "listtext")

  /** Destination control words that set `destination` (rtf.go:269-281). */
  private val DestinationWords: Set[String] = IgnoredDestinations - "result" + "fldrslt"

  def convert(data: Array[Byte]): String = {
    val out = new java.lang.StringBuilder(data.length / 2)
    val stack = mutable.Stack[Group](new Group("", skip = false, codePage = 1252, ucValue = 1))
    var unicodeSkip = 0
    var i = 0
    val n = data.length

    @inline def top: Group = stack.top

    def writeChar(b: Byte): Unit = {
      if (!top.skip) {
        if (unicodeSkip > 0) unicodeSkip -= 1
        else out.append((b & 0xFF).toChar)
      }
    }

    def writeRune(cp: Int): Unit =
      if (!top.skip) out.appendCodePoint(cp)

    def writeParagraph(): Unit =
      if (!top.skip) out.append('\n')

    def applyWord(word: String, param: Int, hasParam: Boolean): Unit = word match {
      case w if DestinationWords.contains(w) =>
        top.destination = w
        if (IgnoredDestinations.contains(w)) top.skip = true
        else if (w == "fldrslt") top.skip = false // field results ARE output
      case "par" | "page" | "column" | "softcol" | "softpage" => writeParagraph()
      case "line" | "softline" => writeRune('\n')
      case "tab" => writeRune('\t')
      case "u" =>
        val r = if (param < 0) param + 65536 else param
        writeRune(r)
        unicodeSkip = top.ucValue
      case "uc" => top.ucValue = param
      case "ansi" => top.codePage = 1252
      case "mac" => top.codePage = 10000
      case "pc" => top.codePage = 437
      case "pca" => top.codePage = 850
      case "ansicpg" => if (hasParam) top.codePage = param
      case "emdash" => writeRune(0x2014)
      case "endash" => writeRune(0x2013)
      case "lquote" => writeRune(0x2018)
      case "rquote" => writeRune(0x2019)
      case "ldblquote" => writeRune(0x201C)
      case "rdblquote" => writeRune(0x201D)
      case "bullet" => writeRune(0x2022)
      case "enspace" | "emspace" | "qmspace" => writeRune(' ')
      case "cell" | "nestcell" => writeRune(' ')
      case "row" | "nestrow" => writeRune('\n')
      case _ => // zero-width chars, formatting words: no text output
    }

    @inline def isLetter(b: Byte): Boolean =
      (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
    @inline def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

    def parseControl(): Unit = {
      if (i >= n) return // unexpected EOF in control: stop
      val b = data(i); i += 1
      b match {
        case '\'' => parseHexChar()
        case '*' => top.skip = true
        case '\\' => writeChar('\\')
        case '{' => writeChar('{')
        case '}' => writeChar('}')
        case '\r' | '\n' => writeParagraph()
        case '-' => // optional hyphen — skip
        case '_' => writeRune(0x2011) // non-breaking hyphen
        case '~' => writeRune(0x00A0) // non-breaking space
        case '|' | ':' => // formula char / index sub-entry — skip
        case _ if isLetter(b) => parseWord(b)
        case _ => // unknown symbol — skip
      }
    }

    def parseWord(first: Byte): Unit = {
      val buf = new java.lang.StringBuilder(16)
      buf.append(first.toChar)
      var done = false
      var numSign: Byte = 0
      while (!done && i < n) {
        val b = data(i)
        if (isLetter(b)) {
          i += 1
          if (buf.length < 64) buf.append(b.toChar)
        } else if (b == '-' || isDigit(b)) {
          i += 1
          numSign = b
          done = true
        } else {
          if (b == ' ') i += 1 // space is consumed as delimiter
          done = true
        }
      }
      if (numSign != 0) parseWordWithParam(buf.toString, numSign)
      else applyWord(buf.toString, 0, hasParam = false)
    }

    def parseWordWithParam(word: String, sign: Byte): Unit = {
      val negative = sign == '-'
      val digits = new java.lang.StringBuilder(8)
      if (isDigit(sign)) digits.append(sign.toChar)
      var done = false
      while (!done && i < n) {
        val b = data(i)
        if (isDigit(b)) {
          i += 1
          if (digits.length < 20) digits.append(b.toChar)
        } else {
          if (b == ' ') i += 1
          done = true
        }
      }
      var param = if (digits.length > 0) {
        try digits.toString.toInt catch { case _: NumberFormatException => 0 }
      } else 0
      if (negative) param = -param
      applyWord(word, param, hasParam = true)
    }

    def parseHexChar(): Unit = {
      if (i + 1 >= n) { i = n; return }
      val hi = data(i); val lo = data(i + 1); i += 2
      val v = hexVal(hi, lo)
      if (v < 0) return // skip malformed
      if (unicodeSkip > 0) { unicodeSkip -= 1; return }
      writeRune(RtfCodepages.decode(v, top.codePage))
    }

    while (i < n) {
      val b = data(i); i += 1
      b match {
        case '{' =>
          val t = top
          stack.push(new Group(t.destination, t.skip, t.codePage, t.ucValue))
        case '}' => if (stack.length > 1) stack.pop()
        case '\\' => parseControl()
        case '\r' | '\n' => // bare newlines are not content
        case _ => writeChar(b)
      }
    }
    out.toString
  }

  private def hexVal(hi: Byte, lo: Byte): Int = {
    val h = Character.digit(hi & 0xFF, 16)
    val l = Character.digit(lo & 0xFF, 16)
    if (h < 0 || l < 0) -1 else (h << 4) | l
  }

  def convert(rtf: String): String =
    convert(rtf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
}
