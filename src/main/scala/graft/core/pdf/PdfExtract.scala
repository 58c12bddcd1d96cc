package graft.core.pdf

import PdfText._
import scala.collection.mutable

/** Content-stream interpreter + layout reconstruction — the tagged-order
  * extractor (reference: tagged_content_parser.go:75-554, state machines in
  * text_extract.go:620-1090). Tagged pages keep content-stream order with
  * /Artifact suppression and /ActualText replacement; untagged pages sort
  * spans by (−devY, devX); spans join with inferred whitespace
  * (|Δy| > 1 ⇒ '\n', gap > 1 ⇒ ' ').
  */
object PdfExtract {

  // span of text at a fixed baseline (text_extract.go:856-864)
  private final class Span(var devY: Double, var devX: Double) {
    val text = new java.lang.StringBuilder
    var devXEnd: Double = 0
  }

  private final class GState(var ctm: Matrix3) {
    private val stack = mutable.ArrayBuffer[Matrix3]()
    def push(): Unit = stack += ctm
    def pop(): Unit = if (stack.nonEmpty) { ctm = stack.remove(stack.length - 1) }
  }

  final case class XObj(
      fontMap: FontLookup,
      xobjMap: Map[String, XObj],
      content: Array[Byte],
      matrix: Matrix3)
  object XObj {
    /** Spec convenience: explicit font maps. */
    def apply(fonts: Map[String, PdfFont], xobjMap: Map[String, XObj],
        content: Array[Byte], matrix: Matrix3): XObj =
      XObj(FontLookup.ofMap(fonts), xobjMap, content, matrix)
  }

  val MaxXObjDepth = 8 // text_extract.go:328

  // Packed operator keys (byte0 | byte1<<8 | byte2<<16) — the interpreter
  // dispatches on these instead of allocating a String per token.
  private final val OpLowerQ = 'q'.toInt
  private final val OpUpperQ = 'Q'.toInt
  private final val OpCm = 'c' | ('m' << 8)
  private final val OpBMC = 'B' | ('M' << 8) | ('C' << 16)
  private final val OpBDC = 'B' | ('D' << 8) | ('C' << 16)
  private final val OpEMC = 'E' | ('M' << 8) | ('C' << 16)
  private final val OpDo = 'D' | ('o' << 8)
  private final val OpBT = 'B' | ('T' << 8)
  private final val OpET = 'E' | ('T' << 8)
  private final val OpTf = 'T' | ('f' << 8)
  private final val OpTL = 'T' | ('L' << 8)
  private final val OpTc = 'T' | ('c' << 8)
  private final val OpTw = 'T' | ('w' << 8)
  private final val OpTm = 'T' | ('m' << 8)
  private final val OpTd = 'T' | ('d' << 8)
  private final val OpTD = 'T' | ('D' << 8)
  private final val OpTstar = 'T' | ('*' << 8)
  private final val OpTj = 'T' | ('j' << 8)
  private final val OpQuote = '\''.toInt
  private final val OpDquote = '"'.toInt
  private final val OpTJ = 'T' | ('J' << 8)

  def buildXObjMap(f: PdfFile, resources: PdfDict, depth: Int = 0): Map[String, XObj] = {
    if (depth > MaxXObjDepth) return Map.empty
    val xobjDict = resources.get("XObject").flatMap(f.dict).getOrElse(return Map.empty)
    val out = Map.newBuilder[String, XObj]
    xobjDict.entries.foreach { case (name, ref) =>
      f.stream(ref).foreach { sd =>
        if (sd.dict.get("Subtype").flatMap(n => f.name(n)).contains("Form")) {
          val content = try f.decodeStream(sd) catch { case _: Exception => null }
          if (content != null) {
            val mat = sd.dict.get("Matrix").flatMap(f.array) match {
              case Some(PdfArr(items)) if items.length == 6 =>
                val vs = items.map(v => f.num(v))
                if (vs.forall(_.isDefined)) {
                  val v = vs.map(_.get)
                  Matrix3(v(0), v(1), v(2), v(3), v(4), v(5))
                } else Identity
              case _ => Identity
            }
            val res = sd.dict.get("Resources").flatMap(f.dict).getOrElse(PdfDict(Map.empty))
            out += name -> XObj(
              new LazyFontMap(f, res): FontLookup,
              buildXObjMap(f, res, depth + 1),
              content, mat)
          }
        }
      }
    }
    out.result()
  }

  // ── text state (text_extract.go:645-854) ──

  private final class TState(var fontMap: FontLookup) {
    var currentFont: PdfFont = _
    var tlm: Matrix3 = Identity
    var tm: Matrix3 = Identity
    var charSpacing = 0.0
    var wordSpacing = 0.0
    var cursorDevX = 0.0
    var cursorDevY = 0.0
    var leading = 0.0
    var tfSize = 0.0
    var fontSize = 0.0
    var inBT = false
    var tlSet = false

    def deviceOrigin(gs: GState): (Double, Double) =
      tlm.multiply(gs.ctm).transformPoint(0, 0)

    def updateFontSize(gs: GState): Unit = {
      if (tfSize == 0) { fontSize = 0; return }
      var scale = tm.multiply(gs.ctm).scaleX
      if (scale == 0) scale = 1
      fontSize = tfSize * scale
    }

    def setTm(mat: Matrix3, gs: GState): Unit = {
      tlm = mat; tm = mat; updateFontSize(gs); tlSet = true
    }

    def applyTd(tx: Double, ty: Double, gs: GState): Unit = {
      tlm = Matrix3(1, 0, 0, 1, tx, ty).multiply(tlm)
      tm = tlm
      updateFontSize(gs)
      tlSet = true
    }

    def advanceTm(b: Array[Byte], gs: GState): Unit = {
      if (tfSize == 0) return
      val tx = rawBytesAdvance(b)
      tm = Matrix3(1, 0, 0, 1, tx, 0).multiply(tm)
      val (x, y) = tm.multiply(gs.ctm).transformPoint(0, 0)
      cursorDevX = x; cursorDevY = y
    }

    def advanceTmGS(gsAdv: Double, tcTwAdv: Double, gs: GState): Unit = {
      if (tfSize == 0) return
      val tx = gsAdv / 1000.0 * tfSize + tcTwAdv
      tm = Matrix3(1, 0, 0, 1, tx, 0).multiply(tm)
      val (x, y) = tm.multiply(gs.ctm).transformPoint(0, 0)
      cursorDevX = x; cursorDevY = y
    }

    def rawBytesAdvance(b: Array[Byte]): Double = {
      var tx = 0.0
      val tcf = charSpacing * tfSize
      val twf = wordSpacing * tfSize
      if (currentFont != null) {
        val f = currentFont
        var i = 0
        while (i < b.length) {
          val w = f.glyphWidth(b, i) // allocation-free; length in f.lastLen
          val n = f.lastLen
          tx += w / 1000.0 * tfSize + tcf
          if (n == 1 && b(i) == 0x20) tx += twf
          i += n
        }
      } else {
        var i = 0
        while (i < b.length) {
          tx += 500.0 / 1000.0 * tfSize + tcf
          if (b(i) == 0x20) tx += twf
          i += 1
        }
      }
      tx
    }
  }

  // ── the interpreter ──

  private final class Parser(
      spans: mutable.ArrayBuffer[Span],
      taggedFlag: Array[Boolean]) {

    var cur = new Span(0, 0)

    private final case class Tag(name: String, actualText: String,
        hasActualText: Boolean, devX: Double, devY: Double)

    def run(content: Array[Byte], fontMap: FontLookup,
        xobjMap: Map[String, XObj], gs: GState): Double = {
      val ts = new TState(fontMap)
      val winSize = 8
      val winS = new Array[Int](winSize)
      val winE = new Array[Int](winSize)
      var pos = 0
      var buf: Array[Byte] = content

      val tagStack = mutable.ArrayBuffer[Tag]()
      var artifactDepth = 0
      var actualTextDepth = 0
      val throwaway = new java.lang.StringBuilder

      def suppressed: Boolean = artifactDepth > 0 || actualTextDepth > 0
      def sink(): java.lang.StringBuilder =
        if (suppressed) { throwaway.setLength(0); throwaway } else cur.text

      def emitGapOrTrack(newDevX: Double, newDevY: Double): Unit = {
        if (suppressed) { ts.cursorDevX = newDevX; ts.cursorDevY = newDevY }
        else emitGap(ts, newDevX, newDevY)
      }

      // emitGap (text_extract.go:873-909)
      def emitGap(ts: TState, newDevX: Double, newDevY: Double): Unit = {
        if (!ts.tlSet) { ts.cursorDevX = newDevX; ts.cursorDevY = newDevY; return }
        var lineThreshold = ts.fontSize * 0.5
        if (lineThreshold < 1) lineThreshold = 1
        val dy = ts.cursorDevY - newDevY
        if (dy > lineThreshold || dy < -lineThreshold) {
          sealCur(ts, newDevX, newDevY)
          ts.cursorDevX = newDevX; ts.cursorDevY = newDevY
        } else {
          var spaceThreshold = ts.fontSize * 0.2
          if (spaceThreshold < 1) spaceThreshold = 1
          if (newDevX - ts.cursorDevX > spaceThreshold) cur.text.append(' ')
          if (newDevX > ts.cursorDevX) ts.cursorDevX = newDevX
          ts.cursorDevY = newDevY
        }
      }

      def sealCur(ts: TState, newDevX: Double, newDevY: Double): Unit = {
        if (cur.text.length > 0) {
          cur.devXEnd = ts.cursorDevX
          spans += cur
        }
        cur = new Span(newDevY, newDevX)
      }

      def tokStr(s: Int, e: Int): String = {
        val sb = new java.lang.StringBuilder(e - s)
        var i = s
        while (i < e) { sb.append((buf(i) & 0xFF).toChar); i += 1 }
        sb.toString
      }

      // NaN-sentinel operand read — no String/Option per numeric token
      // (the round-3 allocation profile put per-token Strings + boxed
      // Option[Double] vectors among the kernel's largest costs)
      def atBackD(n: Int): Double = {
        val idx = (pos - n) & (winSize - 1)
        PdfText.parseOperand(buf, winS(idx), winE(idx))
      }
      def orZero(v: Double): Double = if (java.lang.Double.isNaN(v)) 0.0 else v
      val m6 = new Array[Double](6)
      def back6(): Boolean = {
        var ok = true
        var k = 0
        while (k < 6) {
          val v = atBackD(6 - k)
          m6(k) = v
          if (java.lang.Double.isNaN(v)) ok = false
          k += 1
        }
        ok
      }
      def atBackS(n: Int): (Int, Int) =
        (winS((pos - n) & (winSize - 1)), winE((pos - n) & (winSize - 1)))
      def stripSlash(s: Int, e: Int): String = {
        val str = tokStr(s, e)
        if (str.startsWith("/")) str.substring(1) else str
      }

      tokenize(content) { (tS, tE) =>
        val len = tE - tS
        // packed-int operator key (≤ 3 bytes); numbers/strings/names pack
        // too but can't collide — no operator starts with a digit, sign,
        // '(', '<', '[' or '/'. No String allocated per token.
        val key: Int =
          if (len >= 1 && len <= 3) {
            (buf(tS) & 0xFF) |
              (if (len > 1) (buf(tS + 1) & 0xFF) << 8 else 0) |
              (if (len > 2) (buf(tS + 2) & 0xFF) << 16 else 0)
          } else 0
        key match {
          case OpLowerQ => gs.push()
          case OpUpperQ => gs.pop(); ts.updateFontSize(gs)
          case OpCm =>
            if (pos >= 6 && back6()) {
              gs.ctm = Matrix3(m6(0), m6(1), m6(2), m6(3), m6(4), m6(5)).multiply(gs.ctm)
              ts.updateFontSize(gs)
            }
          case OpBMC =>
            taggedFlag(0) = true
            if (pos >= 1) {
              val (s1, e1) = atBackS(1)
              val name = stripSlash(s1, e1)
              tagStack += Tag(name, "", hasActualText = false, ts.cursorDevX, ts.cursorDevY)
              if (name == "Artifact") artifactDepth += 1
            }
          case OpBDC =>
            taggedFlag(0) = true
            if (pos >= 2) {
              val (s2, e2) = atBackS(2)
              val name = stripSlash(s2, e2)
              val (s1, e1) = atBackS(1)
              val (mcid, actualText, hasActual) = parseMarkedContentProps(buf, s1, e1)
              val _ = mcid
              tagStack += Tag(name, actualText, hasActual, ts.cursorDevX, ts.cursorDevY)
              if (name == "Artifact") artifactDepth += 1
              if (hasActual) actualTextDepth += 1
            }
          case OpEMC =>
            if (tagStack.nonEmpty) {
              val top = tagStack.remove(tagStack.length - 1)
              if (top.name == "Artifact" && artifactDepth > 0) {
                artifactDepth -= 1
                if (artifactDepth == 0) {
                  val dy = ts.cursorDevY - top.devY
                  var lineThreshold = ts.fontSize * 0.5
                  if (lineThreshold < 1) lineThreshold = 1
                  if (dy > -lineThreshold && dy < lineThreshold &&
                    ts.cursorDevX > top.devX + ts.fontSize * 0.2)
                    cur.text.append(' ')
                }
              }
              if (top.hasActualText && actualTextDepth > 0) {
                actualTextDepth -= 1
                if (artifactDepth == 0) cur.text.append(top.actualText)
              }
            }
          case OpDo =>
            if (artifactDepth == 0 && pos >= 1) {
              val (s1, e1) = atBackS(1)
              xobjMap.get(stripSlash(s1, e1)).foreach { xobj =>
                sealCur(ts, ts.cursorDevX, ts.cursorDevY)
                val childGS = new GState(xobj.matrix.multiply(gs.ctm))
                val childFonts =
                  if (xobj.fontMap.isEmpty) fontMap
                  else new ChainFontLookup(xobj.fontMap, fontMap)
                // recurse with a fresh window buffer (buf changes!)
                val savedBuf = buf
                val devX = run(xobj.content, childFonts, xobj.xobjMap, childGS)
                buf = savedBuf
                if (cur.text.length > 0) {
                  cur.devXEnd = devX
                  spans += cur
                  cur = new Span(0, 0)
                }
              }
            }
          case OpBT =>
            ts.inBT = true
            ts.tlm = Identity
            ts.tm = Identity
            ts.updateFontSize(gs)
          case OpET => ts.inBT = false
          case OpTf =>
            if (pos >= 2) {
              val (s2, e2) = atBackS(2)
              ts.currentFont = fontMap.lookup(stripSlash(s2, e2))
              ts.tfSize = orZero(atBackD(1))
              if (ts.tfSize < 0) ts.tfSize = -ts.tfSize
              ts.updateFontSize(gs)
            }
          case OpTL => if (pos >= 1) ts.leading = orZero(atBackD(1))
          case OpTc => if (pos >= 1) ts.charSpacing = orZero(atBackD(1))
          case OpTw => if (pos >= 1) ts.wordSpacing = orZero(atBackD(1))
          case OpTm =>
            if (ts.inBT && pos >= 6 && back6()) {
              val mat = Matrix3(m6(0), m6(1), m6(2), m6(3), m6(4), m6(5))
              val (newDevX, newDevY) = mat.multiply(gs.ctm).transformPoint(0, 0)
              ts.setTm(mat, gs)
              emitGapOrTrack(newDevX, newDevY)
              if (newDevX > ts.cursorDevX) ts.cursorDevX = newDevX
              ts.cursorDevY = newDevY
            }
          case OpTd | OpTD =>
            if (ts.inBT && pos >= 2) {
              val tx = atBackD(2)
              val ty = atBackD(1)
              if (!java.lang.Double.isNaN(tx) && !java.lang.Double.isNaN(ty)) {
                if (key == OpTD) ts.leading = -ty
                ts.applyTd(tx, ty, gs)
                val (newDevX, newDevY) = ts.deviceOrigin(gs)
                emitGapOrTrack(newDevX, newDevY)
                if (newDevX > ts.cursorDevX) ts.cursorDevX = newDevX
                ts.cursorDevY = newDevY
              }
            }
          case OpTstar =>
            if (ts.inBT) {
              ts.applyTd(0, -ts.leading, gs)
              val (newDevX, newDevY) = ts.deviceOrigin(gs)
              emitGapOrTrack(newDevX, newDevY)
              if (newDevX > ts.cursorDevX) ts.cursorDevX = newDevX
              ts.cursorDevY = newDevY
            }
          case OpTj =>
            if (ts.inBT && pos >= 1) {
              val (s1, e1) = atBackS(1)
              val raw = parsePdfString(buf, s1, e1)
              if (raw != null) {
                decodeRaw(raw, ts.currentFont, sink())
                ts.advanceTm(raw, gs)
              }
            }
          case OpQuote =>
            if (ts.inBT && pos >= 1) {
              ts.applyTd(0, -ts.leading, gs)
              val (newDevX, newDevY) = ts.deviceOrigin(gs)
              emitGapOrTrack(newDevX, newDevY)
              if (newDevX > ts.cursorDevX) ts.cursorDevX = newDevX
              ts.cursorDevY = newDevY
              val (s1, e1) = atBackS(1)
              val raw = parsePdfString(buf, s1, e1)
              if (raw != null) {
                decodeRaw(raw, ts.currentFont, sink())
                ts.advanceTm(raw, gs)
              }
            }
          case OpDquote =>
            if (ts.inBT && pos >= 3) {
              ts.wordSpacing = orZero(atBackD(3))
              ts.charSpacing = orZero(atBackD(2))
              ts.applyTd(0, -ts.leading, gs)
              val (newDevX, newDevY) = ts.deviceOrigin(gs)
              emitGapOrTrack(newDevX, newDevY)
              if (newDevX > ts.cursorDevX) ts.cursorDevX = newDevX
              ts.cursorDevY = newDevY
              val (s1, e1) = atBackS(1)
              val raw = parsePdfString(buf, s1, e1)
              if (raw != null) {
                decodeRaw(raw, ts.currentFont, sink())
                ts.advanceTm(raw, gs)
              }
            }
          case OpTJ =>
            if (ts.inBT && pos >= 1) {
              val (s1, e1) = atBackS(1)
              val (gsAdv, tcTwAdv) = parseTJArray(buf, s1, e1, ts, sink())
              ts.advanceTmGS(gsAdv, tcTwAdv, gs)
            }
          case _ =>
        }
        winS(pos & (winSize - 1)) = tS
        winE(pos & (winSize - 1)) = tE
        pos += 1
      }
      ts.cursorDevX
    }

    /** parseTJArray (text_extract.go:951-1090). */
    private def parseTJArray(buf: Array[Byte], s0: Int, e0: Int, ts: TState,
        w: java.lang.StringBuilder): (Double, Double) = {
      var s = s0
      var e = e0
      while (s < e && isWhitespaceByte(buf(s))) s += 1
      while (e > s && isWhitespaceByte(buf(e - 1))) e -= 1
      if (e - s < 2 || buf(s) != '[' || buf(e - 1) != ']') return (0.0, 0.0)
      val inner0 = s + 1
      val innerEnd = e - 1

      val f = ts.currentFont
      val tcf = ts.charSpacing * ts.tfSize
      val twf = ts.wordSpacing * ts.tfSize
      val emitCharSpaces = ts.charSpacing > 0.2

      var gsAdv = 0.0
      var tcTwAdv = 0.0
      var pendingKernSpace = false
      var lastEndsWithSpace = false

      var i = inner0
      while (i < innerEnd) {
        while (i < innerEnd && isWhitespaceByte(buf(i))) i += 1
        if (i < innerEnd) {
          if (buf(i) == '(' || buf(i) == '<') {
            var raw: Array[Byte] = null
            if (buf(i) == '(') {
              val end = findClosingParen(buf, i, innerEnd)
              if (end < 0) i = innerEnd
              else {
                raw = parsePdfString(buf, i, end + 1)
                i = end + 1
              }
            } else {
              var j = i + 1
              while (j < innerEnd && buf(j) != '>') j += 1
              if (j >= innerEnd) i = innerEnd
              else {
                raw = parsePdfString(buf, i, j + 1)
                i = j + 1
              }
            }
            if (raw != null && raw.length > 0) {
              if (pendingKernSpace && !isWhitespaceByte(raw(0))) w.append(' ')
              pendingKernSpace = false
              if (f == null) {
                var j = 0
                while (j < raw.length) {
                  gsAdv += 500
                  tcTwAdv += tcf
                  if (raw(j) == 0x20) tcTwAdv += twf
                  val r = raw(j) & 0xFF
                  if (r >= 0x20 && r != 0x7F) w.appendCodePoint(r)
                  j += 1
                }
              } else {
                var prevWasSpace = false
                var j = 0
                while (j < raw.length) {
                  val width = f.glyphWidth(raw, j) // allocation-free; f.lastLen
                  val n0 = f.lastLen
                  gsAdv += width
                  tcTwAdv += tcf
                  val isSpace = n0 == 1 && raw(j) == 0x20
                  if (isSpace) tcTwAdv += twf
                  if (emitCharSpaces && j > 0 && !isSpace && !prevWasSpace) w.append(' ')
                  prevWasSpace = isSpace
                  var n = n0
                  var code = 0
                  if (f.isComposite && j + 1 < raw.length) {
                    code = ((raw(j) & 0xFF) << 8) | (raw(j + 1) & 0xFF)
                    n = 2
                  } else code = raw(j) & 0xFF
                  var consumed = false
                  if (f.toUnicode != null) {
                    if (n == 2) {
                      // composite 2-byte code — sparse key space stays a Map
                      f.toUnicode.get(code) match {
                        case Some(str) => w.append(str); j += n; consumed = true
                        case None =>
                      }
                    } else {
                      val str = f.toUni1(code)
                      if (str != null) { w.append(str); j += n; consumed = true }
                    }
                  }
                  if (!consumed) {
                    if (n == 1) {
                      val r = f.encRune(raw(j) & 0xFF)
                      if (r >= 0) { w.appendCodePoint(r); j += 1 }
                      else {
                        val c = raw(j) & 0xFF
                        if (c >= 0x20 && c != 0x7F) w.appendCodePoint(c)
                        j += n
                      }
                    } else j += n
                  }
                }
              }
              lastEndsWithSpace = raw.length > 0 && raw(raw.length - 1) == 0x20
            }
          } else {
            val start = i
            while (i < innerEnd && !isWhitespaceByte(buf(i)) && buf(i) != '(' && buf(i) != '<') i += 1
            val n = PdfText.parseOperand(buf, start, i)
            if (!java.lang.Double.isNaN(n)) {
              gsAdv -= n
              if (n < -150 && !lastEndsWithSpace) pendingKernSpace = true
            }
          }
        }
      }
      (gsAdv, tcTwAdv)
    }

    private def findClosingParen(buf: Array[Byte], start: Int, end: Int): Int = {
      var depth = 0
      var i = start
      while (i < end) {
        if (buf(i) == '\\') i += 2
        else {
          if (buf(i) == '(') depth += 1
          else if (buf(i) == ')') {
            depth -= 1
            if (depth == 0) return i
          }
          i += 1
        }
      }
      -1
    }

    /** parseMarkedContentProps (tagged_content_parser.go:572-602). */
    private def parseMarkedContentProps(buf: Array[Byte], s0: Int, e0: Int): (Int, String, Boolean) = {
      var mcid = -1
      var actualText = ""
      var hasActualText = false
      var s = s0
      var e = e0
      while (s < e && isWhitespaceByte(buf(s))) s += 1
      while (e > s && isWhitespaceByte(buf(e - 1))) e -= 1
      if (e - s < 4 || buf(s) != '<' || buf(s + 1) != '<') return (mcid, actualText, hasActualText)
      val inner = java.util.Arrays.copyOfRange(buf, s + 2, e - 2)
      var key = ""
      tokenize(inner) { (tS, tE) =>
        val tok = new String(inner, tS, tE - tS, "ISO-8859-1")
        if (tok.nonEmpty && tok.charAt(0) == '/') {
          key = tok.substring(1)
        } else {
          key match {
            case "MCID" =>
              try mcid = java.lang.Double.parseDouble(tok).toInt
              catch { case _: NumberFormatException => }
            case "ActualText" =>
              val raw = parsePdfString(inner, tS, tE)
              if (raw != null) {
                actualText = decodeActualText(raw)
                hasActualText = true
              }
            case _ =>
          }
          key = ""
        }
      }
      (mcid, actualText, hasActualText)
    }
  }

  /** decodeActualText (tagged_content_parser.go:610-638). */
  def decodeActualText(b: Array[Byte]): String = {
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF) {
      val sb = new java.lang.StringBuilder((b.length - 2) / 2)
      var i = 2
      while (i + 1 < b.length) {
        var u = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
        if (u == 0xA0 || u == '\t') u = ' '
        sb.append(u.toChar)
        i += 2
      }
      sb.toString
    } else {
      val sb = new java.lang.StringBuilder(b.length)
      b.foreach { c0 =>
        val c = c0 & 0xFF
        if (c >= 0x20 && c != 0x7F) {
          if (c == 0xA0) sb.append(' ') else sb.append(c.toChar)
        }
      }
      sb.toString
    }
  }

  /** extractTextFromContentTagged (tagged_content_parser.go:110-167). */
  /** Spec convenience: explicit font maps. */
  def extractContentText(content: Array[Byte], fontMap: Map[String, PdfFont],
      xobjMap: Map[String, XObj]): String =
    extractContentText(content, FontLookup.ofMap(fontMap), xobjMap)

  def extractContentText(content: Array[Byte], fontMap: FontLookup,
      xobjMap: Map[String, XObj]): String = {
    val spans = mutable.ArrayBuffer[Span]()
    val taggedFlag = Array(false)
    val p = new Parser(spans, taggedFlag)
    val cursorDevX = p.run(content, fontMap, xobjMap, new GState(Identity))
    if (p.cur.text.length > 0) {
      p.cur.devXEnd = cursorDevX
      spans += p.cur
    }
    val ordered =
      if (taggedFlag(0)) spans
      else spans.sortWith { (a, b) =>
        if (a.devY != b.devY) a.devY > b.devY
        else a.devX < b.devX
      }
    val out = new java.lang.StringBuilder
    var k = 0
    while (k < ordered.length) {
      val sp = ordered(k)
      if (k > 0) {
        val prev = ordered(k - 1)
        val dy = prev.devY - sp.devY
        if (dy > 1 || dy < -1) out.append('\n')
        else if (sp.devX - prev.devXEnd > 1) out.append(' ')
      }
      out.append(sp.text)
      k += 1
    }
    out.toString
  }

  /** Per-page extraction (native_pdf.go:100-131): page text, or None when
    * the page has no content; caller appends the page '\n'.
    */
  def pageText(f: PdfFile, pageIdx: Int): Option[String] = {
    if (pageIdx < 0 || pageIdx >= f.pageCount) return None
    val (page, res) = f.pages(pageIdx)
    val content = f.pageContent(page)
    if (content.isEmpty) return None
    val (fontMap, xobjMap) = f.resourceMapCache.getOrElseUpdate(res,
      (new LazyFontMap(f, res): FontLookup, buildXObjMap(f, res)))
    Some(extractContentText(content, fontMap, xobjMap))
  }

  /** true when the page references image XObjects (the hasImages flag of
    * Text(), thumbnails excluded implicitly — they live on the page dict's
    * /Thumb, not /Resources/XObject).
    */
  def pageHasImages(f: PdfFile, pageIdx: Int): Boolean = {
    if (pageIdx < 0 || pageIdx >= f.pageCount) return false
    val (_, res) = f.pages(pageIdx)
    res.get("XObject").flatMap(f.dict).exists(_.entries.values.exists { ref =>
      f.stream(ref).exists(_.dict.get("Subtype").flatMap(n => f.name(n)).contains("Image"))
    })
  }

  /** MetadataMap (native_pdf.go:78-98) — 13 fixed keys. */
  def metadata(f: PdfFile): Map[String, String] = {
    def info(key: String): String =
      f.infoDict.flatMap(_.get(key)).flatMap(f.str).map(decodePdfTextString).getOrElse("")
    Map(
      "x-document-author" -> info("Author"),
      "x-document-creator" -> info("Creator"),
      "x-document-title" -> info("Title"),
      "x-document-subject" -> info("Subject"),
      "x-document-producer" -> info("Producer"),
      "x-document-version" -> ("PDF-" + f.version),
      "x-document-keywords" -> info("Keywords"),
      "x-document-pages" -> f.pageCount.toString,
      "x-document-created" -> PdfDate.toIso(info("CreationDate")),
      "x-document-modified" -> PdfDate.toIso(info("ModDate")),
      "x-parsed-by" -> "text-extraction-service",
      "x-doc-type" -> "pdf",
      "x-pdf-tagged" -> (if (f.tagged) "true" else "false"))
  }
}
