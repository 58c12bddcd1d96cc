package graft.core

/** Word Binary (.doc) and PowerPoint Binary (.ppt) text + metadata
  * extraction over the CFB container (reference: pkg/docparser).
  *
  * DOC (word.go:28-299): FIB validation (wIdent 0xA5EC, encryption bit) →
  * Clx via fcClx/lcbClx (pair 33 of FibRgFcLcb) from the FIB-selected Table
  * stream → PlcPcd piece walk → per-piece Windows-1252 / UTF-16LE decode
  * with the Word control-char filter.
  *
  * PPT (ppt.go:114-519): CurrentUserAtom → UserEditAtom chain →
  * PersistDirectoryAtom merge (newest wins) → DocumentContainer → all
  * SlideListWithText children → SlidePersistAtoms filtered to real
  * SlideContainers → bounded recursive record walk collecting
  * TextCharsAtom/TextBytesAtom.
  *
  * Metadata (metadata.go): OLE property sets from \x05SummaryInformation and
  * \x05DocumentSummaryInformation.
  */
object DocBin {

  // limits.go:11-40
  private val MaxPieceCount = 1000000
  private val MaxPieceBytes = 10L * 1024 * 1024
  private val MaxPersistDirEntries = 100000
  private val MaxUserEditChain = 10000
  private val MaxSlides = 10000

  final class LimitException(what: String) extends RuntimeException(s"limit exceeded: $what")
  final class NotWordException(msg: String) extends RuntimeException(msg)

  final case class DocStreams(
      wordDocument: Option[Array[Byte]],
      table: Option[Array[Byte]],
      pptDoc: Option[Array[Byte]],
      currentUser: Option[Array[Byte]],
      siRaw: Option[Array[Byte]],
      dsiRaw: Option[Array[Byte]])

  /** Single CFB pass (open.go:84-174). */
  def openStreams(data: Array[Byte]): DocStreams = {
    val ss = Cfb.streams(data)
    def find(n: String) = ss.find(_.name == n).map(_.data)
    val wordDoc = find("WordDocument")
    val tbl0 = find("0Table")
    val tbl1 = find("1Table")
    val pptDoc = find("PowerPoint Document")
    val currentUser = find("Current User")
    val si = find("SummaryInformation")
    val dsi = find("DocumentSummaryInformation")
    if (wordDoc.isEmpty && pptDoc.isEmpty)
      throw new NotWordException("Neither WordDocument nor PowerPoint Document stream found")
    // FIB bit fWhichTblStm selects the table stream (open.go:157-169)
    val table = wordDoc.flatMap { wd =>
      if (wd.length < 32) throw new NotWordException("WordDocument stream too short for FibBase")
      val fWhich = (le16(wd, 10) >> 9) & 1
      val t = if (fWhich == 0) tbl0.orElse(tbl1) else tbl1.orElse(tbl0)
      if (t.isEmpty) throw new NotWordException("no Table stream found")
      t
    }
    DocStreams(wordDoc, table, pptDoc, currentUser, si, dsi)
  }

  // ── DOC text (word.go) ─────────────────────────────────────────────────────

  private final case class Piece(cpStart: Long, cpEnd: Long, fc: Long, compressed: Boolean)

  def wordText(wd: Array[Byte], table: Array[Byte]): String = {
    if (wd.length < 32) throw new NotWordException("WordDocument stream too short")
    if (le16(wd, 0) != 0xA5EC)
      throw new NotWordException(f"not a Word Binary file (wIdent=0x${le16(wd, 0)}%04X)")
    if (((le16(wd, 10) >> 8) & 1) != 0)
      throw new Extractor.EncryptedException

    // FibBase → fibRgW → fibRgLw → blob (word.go:58-80)
    var off = 32
    val csw = le16(wd, off); off += 2 + csw * 2
    val ccpTextOff = off + 2
    val cslw = le16(wd, off); off += 2 + cslw * 4
    val cbRgFcLcb = le16(wd, off); off += 2
    val fcClxInBlob = 264 // pair 33 × 8
    if (cbRgFcLcb * 8 < fcClxInBlob + 8)
      throw new NotWordException(s"FibRgFcLcb too small (cbRgFcLcb=$cbRgFcLcb)")
    if (wd.length < off + fcClxInBlob + 8)
      throw new NotWordException("FIB too short to reach fcClx")
    val fcClx = le32(wd, off + fcClxInBlob)
    val lcbClx = le32(wd, off + fcClxInBlob + 4)
    val ccpText = if (wd.length >= ccpTextOff + 4) le32(wd, ccpTextOff) else 0L

    val clxEnd = fcClx + lcbClx
    if (table.length < clxEnd)
      throw new NotWordException(s"Table stream too short for Clx (need $clxEnd)")
    val pieces = parsePlcPcd(table, fcClx.toInt, clxEnd.toInt)

    val sb = new java.lang.StringBuilder
    pieces.foreach { p =>
      var cpStart = p.cpStart
      var cpEnd = p.cpEnd
      var skip = false
      if (ccpText > 0) {
        if (cpStart >= ccpText) return sb.toString
        if (cpEnd > ccpText) cpEnd = ccpText
      }
      val nChars = cpEnd - cpStart
      if (nChars > 0 && !skip) {
        // soft error: skip corrupt pieces (word.go:111-116)
        try writePiece(wd, sb, p.fc, p.compressed, nChars)
        catch { case _: Exception => }
      }
    }
    sb.toString
  }

  private def parsePlcPcd(buf: Array[Byte], start: Int, end: Int): Vector[Piece] = {
    var off = start
    while (off < end && buf(off) == 0x01) { // skip Prc blocks
      off += 1
      if (off + 2 > end) throw new NotWordException("Prc block ends past the Clx")
      off += 2 + le16(buf, off)
    }
    if (off >= end || buf(off) != 0x02)
      throw new NotWordException("Clx has no piece-table block after the Prc runs")
    off += 1
    if (off + 4 > end) throw new NotWordException("piece-table block too short for its length field")
    val lcb = le32(buf, off).toInt
    off += 4
    if (off + lcb > end) throw new NotWordException("piece table runs past the end of the Clx")
    if (lcb < 4 || (lcb - 4) % 12 != 0)
      throw new NotWordException(s"piece-table byte length $lcb is not of the form 12n+4")
    val n = (lcb - 4) / 12
    if (n > MaxPieceCount) throw new LimitException("piece count")
    val cps = (0 to n).map(i => le32(buf, off + i * 4))
    val pcdBase = off + (n + 1) * 4
    (0 until n).map { i =>
      val fcRaw = le32(buf, pcdBase + i * 8 + 2)
      val fCompressed = ((fcRaw >> 30) & 1) == 1
      var fc = fcRaw & ~(3L << 30)
      if (fCompressed) fc >>= 1
      Piece(cps(i), cps(i + 1), fc, fCompressed)
    }.toVector
  }

  private def writePiece(wd: Array[Byte], sb: java.lang.StringBuilder,
      fc: Long, compressed: Boolean, nChars: Long): Unit = {
    if (compressed) {
      if (nChars > MaxPieceBytes) throw new LimitException("compressed piece size")
      var i = 0L
      while (i < nChars) {
        val idx = fc + i
        if (idx < wd.length) {
          val r = filterRune(w1252Rune(wd(idx.toInt)))
          if (r != 0) sb.appendCodePoint(r)
        }
        i += 1
      }
    } else {
      if (nChars * 2 > MaxPieceBytes) throw new LimitException("unicode piece size")
      // UTF-16LE decode with surrogate pairing (Go utf16.Decode semantics)
      var i = 0L
      while (i < nChars) {
        val idx = (fc + i * 2).toInt
        if (idx + 1 < wd.length) {
          val u = le16(wd, idx)
          val cp =
            if (u >= 0xD800 && u <= 0xDBFF && i + 1 < nChars && idx + 3 < wd.length) {
              val u2 = le16(wd, idx + 2)
              if (u2 >= 0xDC00 && u2 <= 0xDFFF) {
                i += 1
                0x10000 + ((u - 0xD800) << 10) + (u2 - 0xDC00)
              } else 0xFFFD
            } else if (u >= 0xD800 && u <= 0xDFFF) 0xFFFD
            else u
          val r = filterRune(cp)
          if (r != 0) sb.appendCodePoint(r)
        }
        i += 1
      }
    }
  }

  /** filterRune (word.go:355-373). Returns 0 to drop. */
  def filterRune(r: Int): Int = r match {
    case 0x0004 => '\n'
    case 0x0007 => '\t'
    case 0x0009 => '\t'
    case 0x0014 => ' '
    case 0x000A | 0x000B | 0x000C | 0x000D => '\n'
    case _ => if (r >= 0x0020) r else 0
  }

  /** w1252Rune (word.go:378-401): undefined cells drop (0). */
  def w1252Rune(b: Byte): Int = {
    val v = b & 0xFF
    if (v < 0x80 || v >= 0xA0) v
    else W1252Ext(v - 0x80)
  }
  private val W1252Ext: Array[Int] = Array(
    0x20AC, 0, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0, 0x017D, 0,
    0, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0, 0x017E, 0x0178)

  // ── PPT slides (ppt.go) ────────────────────────────────────────────────────

  private val RtUserEditAtom = 0x0FF5
  private val RtPersistDirectoryAtom = 0x1772
  private val RtDocumentContainer = 0x03E8
  private val RtSlideContainer = 0x03EE
  private val RtSlideListWithText = 0x0FF0
  private val RtSlidePersistAtom = 0x03F3
  private val RtTextCharsAtom = 0x0FA0
  private val RtTextBytesAtom = 0x0FA8
  private val RtCurrentUserAtom = 0x0FF6

  private final case class RecHeader(recVer: Int, recType: Int, recLen: Long) {
    def isContainer: Boolean = recVer == 0xF
  }

  private def readHeader(buf: Array[Byte], off: Int): Option[RecHeader] =
    if (off < 0 || off + 8 > buf.length) None
    else Some(RecHeader(le16(buf, off) & 0x0F, le16(buf, off + 2), le32(buf, off + 4)))

  /** extractSlides (ppt.go:440-519): returns per-slide text, 1-based order. */
  def pptSlides(pptDoc: Array[Byte], currentUser: Array[Byte]): Vector[String] = {
    if (currentUser.length < 20) throw new NotWordException("Current User stream too short")
    val cuH = readHeader(currentUser, 0)
      .getOrElse(throw new NotWordException("no CurrentUserAtom"))
    if (cuH.recType != RtCurrentUserAtom)
      throw new NotWordException("expected CurrentUserAtom")
    if (currentUser.length < 8 + 12) throw new NotWordException("CurrentUserAtom body too short")
    val headerToken = le32(currentUser, 8 + 4)
    if (headerToken == 0xDFC4D1F3L) throw new Extractor.EncryptedException
    val offsetToCurrentEdit = le32(currentUser, 8 + 8)

    // UserEditAtom chain → persist directory, newest wins (ppt.go:114-180)
    var chain = List.empty[Long] // persistDirOffsets, newest-first
    var off = offsetToCurrentEdit.toInt
    val newestOff = off
    var done = false
    while (!done) {
      if (chain.length >= MaxUserEditChain) throw new LimitException("UserEditAtom chain")
      val h = readHeader(pptDoc, off)
        .filter(_.recType == RtUserEditAtom)
        .getOrElse(throw new NotWordException(s"expected UserEditAtom at $off"))
      val bodyEnd = off + 8 + h.recLen.toInt
      if (bodyEnd > pptDoc.length || h.recLen < 20)
        throw new NotWordException("UserEditAtom too short or truncated")
      val offsetLastEdit = le32(pptDoc, off + 8 + 8)
      val offsetPersistDirectory = le32(pptDoc, off + 8 + 12)
      chain = offsetPersistDirectory :: chain // building oldest-last → prepend = reversed later
      if (offsetLastEdit == 0 || offsetLastEdit.toInt >= off) done = true
      else off = offsetLastEdit.toInt
    }
    // chain is oldest-first now (we prepended newest-first entries)
    val persistDir = scala.collection.mutable.HashMap[Long, Long]()
    chain.foreach { pdOff => parsePersistDirAtom(pptDoc, pdOff.toInt, persistDir) }

    // docPersistIdRef from newest UserEditAtom (ppt.go:227-237)
    val docPersistId = {
      if (pptDoc.length < newestOff + 8 + 20) throw new NotWordException("UserEditAtom body too short")
      le32(pptDoc, newestOff + 8 + 16)
    }
    val docOff = persistDir.getOrElse(docPersistId,
      throw new NotWordException(s"DocumentContainer persistId $docPersistId not found"))

    val slideOffs = slideOffsets(pptDoc, docOff.toInt, persistDir)

    val out = Vector.newBuilder[String]
    slideOffs.zipWithIndex.foreach { case (sOff, i) =>
      if (i >= MaxSlides) throw new LimitException("slide count")
      readHeader(pptDoc, sOff.toInt) match {
        case Some(sh) if sh.recType == RtSlideContainer &&
          sOff + 8 + sh.recLen <= pptDoc.length =>
          val sb = new java.lang.StringBuilder
          extractSlideText(pptDoc, sOff.toInt + 8, (sOff + 8 + sh.recLen).toInt, sb)
          out += sb.toString
        case _ =>
      }
    }
    out.result()
  }

  private def parsePersistDirAtom(doc: Array[Byte], off: Int,
      dir: scala.collection.mutable.HashMap[Long, Long]): Unit = {
    val h = readHeader(doc, off).filter(_.recType == RtPersistDirectoryAtom)
      .getOrElse(throw new NotWordException(s"expected PersistDirectoryAtom at $off"))
    val bodyEnd = off + 8 + h.recLen.toInt
    if (bodyEnd > doc.length) throw new NotWordException("PersistDirectoryAtom truncated")
    var pos = off + 8
    while (pos + 4 <= bodyEnd) {
      val entry = le32(doc, pos); pos += 4
      val persistId = entry & 0x000FFFFF
      val cPersist = entry >> 20
      var i = 0L
      while (i < cPersist) {
        if (pos + 4 > bodyEnd) throw new NotWordException("PersistDirectoryAtom truncated")
        if (dir.size >= MaxPersistDirEntries) throw new LimitException("persist directory entries")
        dir(persistId + i) = le32(doc, pos)
        pos += 4
        i += 1
      }
    }
  }

  private def slideOffsets(doc: Array[Byte], docOffset: Int,
      dir: scala.collection.mutable.HashMap[Long, Long]): Vector[Long] = {
    val dh = readHeader(doc, docOffset).filter(_.recType == RtDocumentContainer)
      .getOrElse(throw new NotWordException("expected DocumentContainer"))
    if (docOffset + 8 + dh.recLen > doc.length)
      throw new NotWordException("DocumentContainer recLen exceeds stream")
    val end = docOffset + 8 + dh.recLen.toInt
    var cursor = docOffset + 8
    val out = Vector.newBuilder[Long]
    var break = false
    while (!break && cursor + 8 <= end) {
      readHeader(doc, cursor) match {
        case Some(h) =>
          if (h.recType == RtSlideListWithText)
            out ++= parseSlidePersistAtoms(doc, cursor, dir)
          val step = 8 + h.recLen.toInt
          if (step <= 0) break = true else cursor += step
        case None => break = true
      }
    }
    out.result()
  }

  private def parseSlidePersistAtoms(doc: Array[Byte], off: Int,
      dir: scala.collection.mutable.HashMap[Long, Long]): Vector[Long] = {
    val h = readHeader(doc, off)
      .getOrElse(throw new NotWordException("truncated SlideListWithText header"))
    if (off + 8 + h.recLen > doc.length)
      throw new NotWordException("SlideListWithText recLen exceeds stream")
    val end = off + 8 + h.recLen.toInt
    var cursor = off + 8
    val out = Vector.newBuilder[Long]
    var break = false
    while (!break && cursor + 8 <= end) {
      readHeader(doc, cursor) match {
        case Some(ch) =>
          if (ch.recType == RtSlidePersistAtom && cursor + 12 <= doc.length) {
            val persistIdRef = le32(doc, cursor + 8)
            dir.get(persistIdRef).foreach { sOff =>
              readHeader(doc, sOff.toInt) match {
                case Some(th) if th.recType == RtSlideContainer => out += sOff
                case _ =>
              }
            }
          }
          val step = 8 + ch.recLen.toInt
          if (step <= 0) break = true else cursor += step
        case None => break = true
      }
    }
    out.result()
  }

  private def extractSlideText(doc: Array[Byte], off: Int, end: Int,
      sb: java.lang.StringBuilder): Unit = {
    var cursor = off
    var break = false
    while (!break && cursor + 8 <= end) {
      readHeader(doc, cursor) match {
        case Some(h) =>
          val bodyOff = cursor + 8
          val bodyEnd = bodyOff + h.recLen.toInt
          if (bodyEnd > end) break = true
          else {
            h.recType match {
              case RtTextCharsAtom if h.recLen <= MaxPieceBytes =>
                var i = bodyOff
                while (i + 1 < bodyEnd) {
                  val u = le16(doc, i)
                  val cp =
                    if (u >= 0xD800 && u <= 0xDBFF && i + 3 < bodyEnd) {
                      val u2 = le16(doc, i + 2)
                      if (u2 >= 0xDC00 && u2 <= 0xDFFF) {
                        i += 2
                        0x10000 + ((u - 0xD800) << 10) + (u2 - 0xDC00)
                      } else 0xFFFD
                    } else if (u >= 0xD800 && u <= 0xDFFF) 0xFFFD
                    else u
                  cp match {
                    case 0x0D | 0x0B | 0x0C => sb.append('\n')
                    case 0x00 =>
                    case r if r >= 0x0020 => sb.appendCodePoint(r)
                    case _ =>
                  }
                  i += 2
                }
                sb.append('\n')
              case RtTextBytesAtom if h.recLen <= MaxPieceBytes =>
                var i = bodyOff
                while (i < bodyEnd) {
                  (doc(i) & 0xFF) match {
                    case 0x0D | 0x0B | 0x0C => sb.append('\n')
                    case 0x00 =>
                    case _ =>
                      val r = w1252Rune(doc(i))
                      if (r != 0 && r >= 0x0020) sb.appendCodePoint(r)
                  }
                  i += 1
                }
                sb.append('\n')
              case _ =>
                if (h.isContainer) extractSlideText(doc, bodyOff, bodyEnd, sb)
            }
            cursor = bodyEnd
          }
        case None => break = true
      }
    }
  }

  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  @inline private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
}
