package graft.core.pdf

/** Minimal deterministic PDF writer for tests and the synthetic corpus:
  * classic xref table, one content stream per page, WinAnsi Helvetica-ish
  * simple font with uniform widths. The emitted operators (BT/Tf/Td/TL/
  * Tj/TJ/T*) exercise the extraction engine's positioning and layout paths
  * with known golden text.
  */
object PdfBuilder {

  final case class Line(text: String, x: Double, y: Double, size: Double = 12)

  /** Build a PDF whose page k shows pages(k) lines. */
  def build(pages: Seq[Seq[Line]], title: String = "", withImagePage: Boolean = false): Array[Byte] = {
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    // obj 1: catalog, obj 2: pages, obj 3: font, 4..: per page (page, content)
    val nPages = pages.length + (if (withImagePage) 1 else 0)
    val pageObjNums = (0 until nPages).map(i => 4 + i * 2)
    val kids = pageObjNums.map(n => s"$n 0 R").mkString(" ")

    objs += s"<< /Type /Catalog /Pages 2 0 R >>" // 1
    objs += s"<< /Type /Pages /Kids [$kids] /Count $nPages /Resources << /Font << /F1 3 0 R >> >> /MediaBox [0 0 612 792] >>" // 2
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 255 /Widths [" +
      (32 to 255).map(_ => "500").mkString(" ") + "] >>" // 3

    pages.foreach { lines =>
      // Tf size 1 with the point size in the Tm scale, like common writers
      // (cf. 2000001.pdf: "/TT0 1 Tf" + "16.56 0 0 16.56 … Tm")
      val content = new StringBuilder("BT\n/F1 1 Tf\n")
      lines.foreach { l =>
        content.append(s"${l.size} 0 0 ${l.size} ${l.x} ${l.y} Tm\n")
        content.append(s"(${escape(l.text)}) Tj\n")
      }
      content.append("ET\n")
      val pageNum = 4 + objs.length - 3
      objs += s"<< /Type /Page /Parent 2 0 R /Contents ${pageNum + 1} 0 R >>"
      objs += s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
    }
    if (withImagePage) {
      // image-only page: a tiny 1x1 image XObject, no text
      val imgObjNum = 4 + objs.length - 3 + 2
      objs += s"<< /Type /Page /Parent 2 0 R /Contents ${imgObjNum - 1} 0 R /Resources << /XObject << /Im1 ${imgObjNum} 0 R >> >> >>"
      val content = "q 100 0 0 100 100 600 cm /Im1 Do Q"
      objs += s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      objs += "<< /Type /XObject /Subtype /Image /Width 1 /Height 1 /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>\nstream\nA\nendstream"
    }

    val infoRef = if (title.nonEmpty) {
      objs += s"<< /Title (${escape(title)}) /Producer (graft-synth) >>"
      s" /Info ${objs.length} 0 R"
    } else ""

    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    objs.zipWithIndex.foreach { case (body, i) =>
      offsets += sb.length
      sb.append(s"${i + 1} 0 obj\n$body\nendobj\n")
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R$infoRef >>\nstartxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
}
