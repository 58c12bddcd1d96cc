package graft.core.pdf

/** Minimal deterministic PDF writer for tests and the synthetic corpus:
  * classic xref table, one content stream per page, WinAnsi Helvetica-ish
  * simple font with uniform widths. The emitted operators (BT/Tf/Td/TL/
  * Tj/TJ/T*) exercise the extraction engine's positioning and layout paths
  * with known golden text.
  */
object PdfBuilder {

  final case class Line(text: String, x: Double, y: Double, size: Double = 12)

  /** Build a PDF whose page k shows pages(k) lines.
    *
    * @param withImagePage append an image-only page (1×1 unfiltered
    *                      DeviceGray XObject) — the OCR-trigger fixture
    * @param rgbImage      append an image-only page with a Flate-compressed
    *                      8-bit DeviceRGB XObject of (width, height,
    *                      row-major RGB samples) — the embedded-raster
    *                      extraction fixture (O2)
    */
  def build(pages: Seq[Seq[Line]], title: String = "", withImagePage: Boolean = false,
      rgbImage: Option[(Int, Int, Array[Byte])] = None): Array[Byte] = {
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    // obj 1: catalog, obj 2: pages (patched with the real /Kids after all
    // pages are appended — image pages take 3 objects, text pages 2, so a
    // fixed stride can't predict page object numbers), obj 3: font
    objs += s"<< /Type /Catalog /Pages 2 0 R >>" // 1
    objs += "PAGES_PLACEHOLDER" // 2
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding /FirstChar 32 /LastChar 255 /Widths [" +
      (32 to 255).map(_ => "500").mkString(" ") + "] >>" // 3
    val pageObjNums = scala.collection.mutable.ArrayBuffer[Int]()

    pages.foreach { lines =>
      // Tf size 1 with the point size in the Tm scale, like common writers
      // (cf. 2000001.pdf: "/TT0 1 Tf" + "16.56 0 0 16.56 … Tm")
      val content = new StringBuilder("BT\n/F1 1 Tf\n")
      lines.foreach { l =>
        content.append(s"${l.size} 0 0 ${l.size} ${l.x} ${l.y} Tm\n")
        content.append(s"(${escape(l.text)}) Tj\n")
      }
      content.append("ET\n")
      val pageNum = objs.length + 1
      pageObjNums += pageNum
      objs += s"<< /Type /Page /Parent 2 0 R /Contents ${pageNum + 1} 0 R >>"
      objs += s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
    }
    if (withImagePage) {
      // image-only page: a tiny 1x1 image XObject, no text
      val pageNum = objs.length + 1
      pageObjNums += pageNum
      objs += s"<< /Type /Page /Parent 2 0 R /Contents ${pageNum + 1} 0 R /Resources << /XObject << /Im1 ${pageNum + 2} 0 R >> >> >>"
      val content = "q 100 0 0 100 100 600 cm /Im1 Do Q"
      objs += s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      objs += "<< /Type /XObject /Subtype /Image /Width 1 /Height 1 /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>\nstream\nA\nendstream"
    }
    rgbImage.foreach { case (w, h, samples) =>
      val deflated = deflate(samples)
      val pageNum = objs.length + 1
      pageObjNums += pageNum
      objs += s"<< /Type /Page /Parent 2 0 R /Contents ${pageNum + 1} 0 R /Resources << /XObject << /ImRGB ${pageNum + 2} 0 R >> >> >>"
      val content = s"q $w 0 0 $h 100 600 cm /ImRGB Do Q"
      objs += s"<< /Length ${content.length} >>\nstream\n$content\nendstream"
      objs += s"<< /Type /XObject /Subtype /Image /Width $w /Height $h /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length ${deflated.length} >>\nstream\n${new String(deflated, "ISO-8859-1")}\nendstream"
    }
    val kids = pageObjNums.map(n => s"$n 0 R").mkString(" ")
    objs(1) = s"<< /Type /Pages /Kids [$kids] /Count ${pageObjNums.length} /Resources << /Font << /F1 3 0 R >> >> /MediaBox [0 0 612 792] >>"

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

  private def deflate(in: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
}
