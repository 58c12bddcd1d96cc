package graft.core

/** RTF `\info` group metadata extraction (reference:
  * pkg/rtfparser/metadata.go:61-453). A dedicated early-exit streaming
  * parser: stops as soon as the \info group closes (metadata.go:133-139),
  * so large documents cost only their header bytes.
  *
  * Field → x-document-* mapping and RFC3339 timestamp formatting follow
  * rich_text_document.go:76-110.
  */
object RtfMetadata {

  final case class Meta(
      created: Option[String], // RFC3339, UTC
      modified: Option[String],
      title: String, subject: String, author: String, manager: String,
      company: String, operator: String, category: String, keywords: String,
      comment: String, docComm: String, hlinkBase: String, version: Int) {

    /** MetadataMap (rich_text_document.go:76-110). */
    def toMap: Map[String, String] = {
      val b = Map.newBuilder[String, String]
      if (author.nonEmpty) b += "x-document-author" -> author
      if (category.nonEmpty) b += "x-document-category" -> category
      if (comment.nonEmpty) b += "x-document-comment" -> comment
      if (company.nonEmpty) b += "x-document-company" -> company
      if (operator.nonEmpty) b += "x-document-operator" -> operator
      if (subject.nonEmpty) b += "x-document-subject" -> subject
      if (title.nonEmpty) b += "x-document-title" -> title
      created.foreach(c => b += "x-document-created" -> c)
      modified.foreach(m => b += "x-document-modified" -> m)
      b.result()
    }
  }

  private val TextDests = Set("title", "subject", "author", "manager",
    "company", "operator", "category", "keywords", "comment", "doccomm",
    "hlinkbase")
  private val TimeDests = Set("creatim", "revtim", "printim", "buptim")

  def extract(data: Array[Byte]): Meta = {
    var created: Option[String] = None
    var modified: Option[String] = None
    val texts = scala.collection.mutable.HashMap[String, String]()
    var version = 0

    var subDest = ""
    var inTimeDest = false
    val textBuf = new java.lang.StringBuilder
    var yr, mo, dy, hr, min, sec = 0
    var depth = 0
    var infoDepth = 0
    var inInfo = false
    var ucValue = 1
    var unicodeSkip = 0
    var codePage = 1252
    var i = 0
    val n = data.length
    var stop = false

    /** Go time.Date normalization + RFC3339 (metadata.go:110-115). */
    def fmtTime(): String =
      if (yr == 0) "0001-01-01T00:00:00Z"
      else {
        val d = java.time.LocalDate.of(yr, 1, 1)
          .plusMonths(mo - 1L).plusDays(dy - 1L)
          .atStartOfDay(java.time.ZoneOffset.UTC)
          .plusHours(hr.toLong).plusMinutes(min.toLong).plusSeconds(sec.toLong)
        d.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'"))
      }

    def flushSubDest(): Unit = {
      if (subDest.nonEmpty) {
        if (inTimeDest) {
          val t = fmtTime()
          if (subDest == "creatim") created = Some(t)
          else if (subDest == "revtim") modified = Some(t)
        } else {
          texts(subDest) = textBuf.toString.trim
        }
        subDest = ""
        inTimeDest = false
        textBuf.setLength(0)
      }
    }

    def accumulateRune(cp: Int): Unit =
      if (subDest.nonEmpty && !inTimeDest) textBuf.appendCodePoint(cp)

    def accumulate(b: Byte): Unit = {
      if (subDest.nonEmpty && !inTimeDest) {
        if (unicodeSkip > 0) unicodeSkip -= 1
        else textBuf.append(RtfCodepages.decode(b & 0xFF, codePage))
      }
    }

    @inline def isLetter(b: Byte): Boolean =
      (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
    @inline def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

    def applyWord(word: String, param: Int, hasParam: Boolean): Unit = {
      word match {
        case "ansi" => codePage = 1252
        case "mac" => codePage = 10000
        case "pc" => codePage = 437
        case "pca" => codePage = 850
        case "ansicpg" => if (hasParam) codePage = param
        case "uc" => ucValue = param
        case "u" =>
          accumulateRune(if (param < 0) param + 65536 else param)
          unicodeSkip = ucValue
          return
        case _ =>
      }
      if (!inInfo) {
        if (word == "info") { inInfo = true; infoDepth = depth }
        return
      }
      if (TextDests.contains(word)) {
        flushSubDest(); subDest = word; inTimeDest = false; textBuf.setLength(0)
      } else if (TimeDests.contains(word)) {
        flushSubDest(); subDest = word; inTimeDest = true
        yr = 0; mo = 0; dy = 0; hr = 0; min = 0; sec = 0
      } else if (inTimeDest && hasParam) {
        word match {
          case "yr" => yr = param
          case "mo" => mo = param
          case "dy" => dy = param
          case "hr" => hr = param
          case "min" => min = param
          case "sec" => sec = param
          case _ =>
        }
      } else if (word == "version" && hasParam) {
        version = param
      } else if (subDest.nonEmpty && !inTimeDest) {
        word match {
          case "emdash" => accumulateRune(0x2014)
          case "endash" => accumulateRune(0x2013)
          case "lquote" => accumulateRune(0x2018)
          case "rquote" => accumulateRune(0x2019)
          case "ldblquote" => accumulateRune(0x201C)
          case "rdblquote" => accumulateRune(0x201D)
          case "tab" => accumulateRune('\t')
          case "enspace" | "emspace" | "qmspace" => accumulateRune(' ')
          case _ =>
        }
      }
    }

    def parseWord(first: Byte): Unit = {
      val buf = new java.lang.StringBuilder(16)
      buf.append(first.toChar)
      var numSign: Byte = 0
      var done = false
      while (!done && i < n) {
        val b = data(i)
        if (isLetter(b)) { i += 1; if (buf.length < 64) buf.append(b.toChar) }
        else if (b == '-' || isDigit(b)) { i += 1; numSign = b; done = true }
        else { if (b == ' ') i += 1; done = true }
      }
      if (numSign != 0) {
        val negative = numSign == '-'
        val digits = new java.lang.StringBuilder(8)
        if (isDigit(numSign)) digits.append(numSign.toChar)
        var d2 = false
        while (!d2 && i < n) {
          val b = data(i)
          if (isDigit(b)) { i += 1; if (digits.length < 20) digits.append(b.toChar) }
          else { if (b == ' ') i += 1; d2 = true }
        }
        var param = if (digits.length > 0) {
          try digits.toString.toInt catch { case _: NumberFormatException => 0 }
        } else 0
        if (negative) param = -param
        applyWord(buf.toString, param, hasParam = true)
      } else applyWord(buf.toString, 0, hasParam = false)
    }

    def parseControl(): Unit = {
      if (i >= n) return
      val b = data(i); i += 1
      b match {
        case '\'' =>
          if (i + 2 > n) { i = n }
          else {
            val hi = data(i); val lo = data(i + 1); i += 2
            val h = Character.digit(hi & 0xFF, 16)
            val l = Character.digit(lo & 0xFF, 16)
            if (h >= 0 && l >= 0) {
              if (unicodeSkip > 0) unicodeSkip -= 1
              else accumulateRune(RtfCodepages.decode((h << 4) | l, codePage))
            }
          }
        case '\\' | '{' | '}' => accumulateRune(b)
        case '\r' | '\n' =>
        case '~' => accumulateRune(0x00A0)
        case '_' => accumulateRune(0x2011)
        case '-' =>
        case '*' =>
        case _ if isLetter(b) => parseWord(b)
        case _ =>
      }
    }

    while (i < n && !stop) {
      val b = data(i); i += 1
      b match {
        case '{' => depth += 1
        case '}' =>
          if (inInfo) {
            if (depth == infoDepth) { flushSubDest(); stop = true }
            else if (subDest.nonEmpty && depth == infoDepth + 1) flushSubDest()
          }
          if (!stop) depth -= 1
        case '\\' => parseControl()
        case '\r' | '\n' =>
        case _ => accumulate(b)
      }
    }

    def t(k: String) = texts.getOrElse(k, "")
    Meta(created, modified, t("title"), t("subject"), t("author"),
      t("manager"), t("company"), t("operator"), t("category"),
      t("keywords"), t("comment"), t("doccomm"), t("hlinkbase"), version)
  }
}
