package graft.core.pdf

/** PDF date string (D:YYYYMMDDHHmmSS with Z / ±HH'mm' / Z00'00' timezone
  * forms) → RFC3339. Relaxed parsing per the reference's accepted formats
  * (internal/pdfdateparser/pdfdate.go:12-32, format matrix
  * pdfdate_test.go:18-52). Returns "" on parse failure.
  */
object PdfDate {

  private val Re =
    """^(?:D:)?(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?(?:(Z|[+\-])(?:(\d{2})'?(\d{2})?'?)?)?$""".r

  def toIso(pdfdate: String): String = {
    if (pdfdate == null || pdfdate.isEmpty) return ""
    val s = pdfdate.trim
    Re.findFirstMatchIn(s) match {
      case Some(m) =>
        try {
          val year = m.group(1).toInt
          def g(i: Int, default: Int): Int =
            Option(m.group(i)).map(_.toInt).getOrElse(default)
          val month = math.min(12, math.max(1, g(2, 1)))
          val day = math.min(31, math.max(1, g(3, 1)))
          val hour = g(4, 0)
          val min = g(5, 0)
          val sec = g(6, 0)
          val tzSign = Option(m.group(7)).getOrElse("Z")
          val tzH = g(8, 0)
          val tzM = g(9, 0)
          val offset =
            if (tzSign == "Z" || (tzH == 0 && tzM == 0)) java.time.ZoneOffset.UTC
            else {
              val total = tzH * 3600 + tzM * 60
              java.time.ZoneOffset.ofTotalSeconds(if (tzSign == "-") -total else total)
            }
          val odt = java.time.OffsetDateTime.of(year, month, day, hour, min, sec, 0, offset)
          // Go time.RFC3339: seconds precision, "Z" for UTC, ±HH:MM otherwise
          if (offset == java.time.ZoneOffset.UTC)
            odt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'"))
          else
            odt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssxxx"))
        } catch { case _: Exception => "" }
      case None => ""
    }
  }
}
