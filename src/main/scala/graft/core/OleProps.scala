package graft.core

/** OLE Property Set parsing for \x05SummaryInformation and
  * \x05DocumentSummaryInformation (reference: pkg/docparser/metadata.go).
  * Produces the x-document-* map per docparser.go:83-118.
  */
object OleProps {

  final case class Meta(
      title: String = "", subject: String = "", author: String = "",
      keywords: String = "", comments: String = "", template: String = "",
      lastAuthor: String = "", revisionNumber: String = "", application: String = "",
      category: String = "", manager: String = "", company: String = "",
      pageCount: Int = 0, wordCount: Int = 0, charCount: Int = 0,
      created: Option[String] = None, // RFC3339 UTC
      lastSaved: Option[String] = None) {

    /** MetadataMap (docparser.go:83-118). */
    def toMap: Map[String, String] = {
      val b = Map.newBuilder[String, String]
      b += "x-doctype" -> "msword"
      def put(k: String, v: String): Unit = if (v.nonEmpty) b += k -> v
      put("x-document-author", author)
      put("x-document-category", category)
      put("x-document-company", company)
      put("x-document-keywords", keywords)
      put("x-document-manager", manager)
      put("x-document-subject", subject)
      put("x-document-title", title)
      created.foreach(v => b += "x-document-created" -> v)
      lastSaved.foreach(v => b += "x-document-modified" -> v)
      if (pageCount != 0) b += "x-document-pages" -> pageCount.toString
      if (charCount != 0) b += "x-document-chars" -> charCount.toString
      if (wordCount != 0) b += "x-document-words" -> wordCount.toString
      b.result()
    }
  }

  private final case class PropVal(vt: Int, data: Array[Byte], off: Int, end: Int)

  /** parsePropertySet (metadata.go:75-153): single-section stream →
    * (codePage, pid → value).
    */
  private def parsePropertySet(raw: Array[Byte]): (Int, Map[Long, PropVal]) = {
    if (raw.length < 48) throw new RuntimeException("property stream too short")
    if (le16(raw, 0) != 0xFFFE) throw new RuntimeException("unexpected byte order mark")
    val numSets = le32(raw, 24)
    if (numSets == 0) return (0, Map.empty)
    val setOffset = le32(raw, 44).toInt
    if (raw.length < setOffset + 8) throw new RuntimeException("section offset out of range")
    val numProps = le32(raw, setOffset + 4).toInt
    val pairBase = setOffset + 8
    if (raw.length < pairBase + numProps * 8)
      throw new RuntimeException("property pairs extend beyond stream")
    var codePage = 0
    val props = Map.newBuilder[Long, PropVal]
    var i = 0
    while (i < numProps) {
      val pid = le32(raw, pairBase + i * 8)
      val poff = le32(raw, pairBase + i * 8 + 4).toInt
      val abs = setOffset + poff
      if (pid != 0L && pid != 0x80000000L && raw.length >= abs + 4) {
        val vt = le16(raw, abs)
        val valueStart = abs + 4
        if (valueStart <= raw.length) {
          val end = math.min(raw.length, valueStart + 4096)
          props += pid -> PropVal(vt, raw, valueStart, end)
          if (pid == 1L && vt == 0x0002 && end - valueStart >= 2)
            codePage = le16(raw, valueStart)
        }
      }
      i += 1
    }
    (codePage, props.result())
  }

  private def propString(props: Map[Long, PropVal], pid: Long, codePage: Int): String =
    props.get(pid).map { pv =>
      pv.vt match {
        case 0x001E => decodeLPSTR(pv, codePage)
        case 0x001F => decodeLPWSTR(pv)
        case _ => ""
      }
    }.getOrElse("")

  private def propI4(props: Map[Long, PropVal], pid: Long): Int =
    props.get(pid) match {
      case Some(pv) if (pv.vt == 0x0003 || pv.vt == 0x0013) && pv.end - pv.off >= 4 =>
        le32(pv.data, pv.off).toInt
      case _ => 0
    }

  /** VT_FILETIME → RFC3339 UTC (metadata.go:236-254). */
  private def propFileTime(props: Map[Long, PropVal], pid: Long): Option[String] =
    props.get(pid) match {
      case Some(pv) if pv.vt == 0x0040 && pv.end - pv.off >= 8 =>
        val ft = le32(pv.data, pv.off) | (le32(pv.data, pv.off + 4) << 32)
        val epochDiff = 116444736000000000L
        if (ft == 0 || java.lang.Long.compareUnsigned(ft, epochDiff) < 0) None
        else {
          val ticks = ft - epochDiff
          val inst = java.time.Instant.ofEpochSecond(ticks / 10000000L)
          Some(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
            .withZone(java.time.ZoneOffset.UTC).format(inst))
        }
      case _ => None
    }

  private def decodeLPWSTR(pv: PropVal): String = {
    if (pv.end - pv.off < 4) return ""
    val count = le32(pv.data, pv.off).toInt
    if (count == 0 || pv.end - pv.off < 4 + count * 2) return ""
    val sb = new java.lang.StringBuilder(count)
    var i = 0
    while (i < count) {
      sb.append(le16(pv.data, pv.off + 4 + i * 2).toChar)
      i += 1
    }
    val s = sb.toString
    val z = s.indexOf(0) // NUL terminator
    if (z >= 0) s.substring(0, z) else s
  }

  private def decodeLPSTR(pv: PropVal, codePage: Int): String = {
    if (pv.end - pv.off < 4) return ""
    val count = le32(pv.data, pv.off).toInt
    if (count == 0 || pv.end - pv.off < 4 + count) return ""
    val base = pv.off + 4
    codePage match {
      case 1200 =>
        val n = count / 2
        val sb = new java.lang.StringBuilder(n)
        var i = 0
        while (i < n) { sb.append(le16(pv.data, base + i * 2).toChar); i += 1 }
        val s = sb.toString
        val z = s.indexOf(0) // NUL terminator
        if (z >= 0) s.substring(0, z) else s
      case 65001 =>
        val s = new String(pv.data, base, count, java.nio.charset.StandardCharsets.UTF_8)
        val z = s.indexOf(0) // NUL terminator
        if (z >= 0) s.substring(0, z) else s
      case _ =>
        val sb = new java.lang.StringBuilder(count)
        var i = 0
        var stop = false
        while (i < count && !stop) {
          val b = pv.data(base + i)
          if (b == 0) stop = true
          else {
            val r = DocBin.w1252Rune(b)
            if (r != 0) sb.appendCodePoint(r)
          }
          i += 1
        }
        sb.toString
    }
  }

  /** Parse both property streams into the combined Meta
    * (metadata.go:165-207).
    */
  def parse(siRaw: Option[Array[Byte]], dsiRaw: Option[Array[Byte]]): Meta = {
    var m = Meta()
    siRaw.foreach { raw =>
      val (cp, props) = parsePropertySet(raw)
      m = m.copy(
        title = propString(props, 0x0002, cp),
        subject = propString(props, 0x0003, cp),
        author = propString(props, 0x0004, cp),
        keywords = propString(props, 0x0005, cp),
        comments = propString(props, 0x0006, cp),
        template = propString(props, 0x0007, cp),
        lastAuthor = propString(props, 0x0008, cp),
        revisionNumber = propString(props, 0x0009, cp),
        application = propString(props, 0x0012, cp),
        created = propFileTime(props, 0x000C),
        lastSaved = propFileTime(props, 0x000D),
        pageCount = propI4(props, 0x000E),
        wordCount = propI4(props, 0x000F),
        charCount = propI4(props, 0x0010))
    }
    dsiRaw.foreach { raw =>
      val (cp, props) = parsePropertySet(raw)
      m = m.copy(
        category = propString(props, 0x000D, cp),
        manager = propString(props, 0x000E, cp),
        company = propString(props, 0x000F, cp))
    }
    m
  }

  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  @inline private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
}
