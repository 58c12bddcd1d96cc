package graft.core

import java.nio.charset.Charset

/** Single-byte codepage → Unicode tables for RTF \'xx escapes (reference:
  * pkg/rtfparser/codepage.go:5-30 + tables). The mappings are the standard
  * published unicode.org tables; rather than inlining 8×128 literals we
  * derive them from the JVM charsets and normalize the deltas:
  *   - bytes the table leaves undefined decode to C1 controls on the JVM
  *     (e.g. windows-1252 0x81 → U+0081); the reference uses U+FFFD — any
  *     C1 result is normalized to U+FFFD;
  *   - the reference's MacRoman table (codepage.go:171-190) is NOT standard
  *     MacRoman — it drops ã at 0x8B (shifting the rest) and uses the
  *     Mac OS 8.5 € — so it is pinned verbatim as the contract table.
  * RtfTextSpec verifies every cell against the reference's tables.
  */
object RtfCodepages {

  private def derive(charsetName: String, patches: (Int, Char)*): Array[Char] = {
    val cs = Charset.forName(charsetName)
    val arr = new Array[Char](128)
    var b = 0x80
    while (b <= 0xFF) {
      val s = new String(Array(b.toByte), cs)
      val c = if (s.length == 1) s.charAt(0) else '�'
      arr(b - 0x80) = if (c >= 0x80 && c <= 0x9F) '�' else c
      b += 1
    }
    patches.foreach { case (byteVal, ch) => arr(byteVal - 0x80) = ch }
    arr
  }

  private lazy val cp1252 = derive("windows-1252")
  private lazy val cp1250 = derive("windows-1250")
  private lazy val cp1251 = derive("windows-1251")
  private lazy val cp1253 = derive("windows-1253")
  private lazy val cp1254 = derive("windows-1254")
  private lazy val cp437 = derive("IBM437")
  private lazy val cp850 = derive("IBM850")
  private lazy val macRoman: Array[Char] = (
    "00C400C500C700C900D100D600DC00E100E000E200E400E500E700E900E800EA" +
    "00EB00ED00EC00EE00EF00F100F300F200F400F600FA00F900FB00FC202000B0" +
    "00A200A300A7202200B600DF00AE00A9212200B400A8226000C600D8221E00B1" +
    "2264226500A500B522022211220F03C0222B00AA00BA03A900E600F800BF00A1" +
    "00AC221A01922248220600AB00BB202600A000C000C300D50152015320132014" +
    "201C201D2018201900F725CA00FF0178204420AC2039203AFB01FB02202100B7" +
    "201A201E203000C200CA00C100CB00C800CD00CE00CF00CC00D300D4F8FF00D2" +
    "00DA00DB00D9013102C602DC00AF02D802D902DA00B802DD02DB02C7FFFDFFFD"
  ).grouped(4).map(h => Integer.parseInt(h, 16).toChar).toArray

  /** decodeCP (codepage.go:5-30): ASCII passthrough, Latin-1 fallback for
    * unknown pages.
    */
  def decode(b: Int, codePage: Int): Char = {
    val v = b & 0xFF
    if (v < 0x80) v.toChar
    else codePage match {
      case 1252 => cp1252(v - 0x80)
      case 1250 => cp1250(v - 0x80)
      case 1251 => cp1251(v - 0x80)
      case 1253 => cp1253(v - 0x80)
      case 1254 => cp1254(v - 0x80)
      case 437 => cp437(v - 0x80)
      case 850 => cp850(v - 0x80)
      case 10000 => macRoman(v - 0x80)
      case _ => v.toChar
    }
  }
}
