package graft.pipeline

import java.util.Base64
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic interleaved-span corpus (FIXTURES.md §3): every
  * doc derives purely from (seed, doc_id), so generation runs distributed
  * on executors via spark.range — no driver-side materialization, no
  * external data. Payloads are real RTF / OOXML / ODF bytes built
  * programmatically, exercising the full kernels.
  *
  * Row classes by doc_id mod 20:
  *   0-5   plain interleaved text docs (German hyphenation material)
  *   6-7   text docs with media spans (+ recorded OCR transcript on some)
  *   8-9   RTF payloads  10: PDF payloads (multi-page, some with image page)
  *   11-12 DOCX payloads  13: ODT  14-15: PPTX (multi-slide)  16: ODP
  *   17    mega-doc (many text spans — salting target)
  *   18    failure docs (zero-size / unknown format / empty zip)
  *   19    media-only docs
  */
object SynthCorpus {

  private val Words = Array("Straße", "weiter", "Beispiel", "EU", "Institution",
    "E-Mail", "Kommission", "Dokument", "Auswertung", "Verfahren", "extraction",
    "pipeline", "span", "media", "text", "Absatz", "Seite", "Titel", "über",
    "größer", "Verhältnis")

  /** xorshift64* — deterministic per (seed, id) stream. */
  private final class Rng(seed0: Long) {
    private var s = if (seed0 == 0) 0x9E3779B97F4A7C15L else seed0
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    def nextInt(bound: Int): Int = {
      val v = (nextLong() >>> 1) % bound
      v.toInt
    }
  }

  private def sentence(r: Rng, words: Int): String =
    (0 until words).map(_ => Words(r.nextInt(Words.length))).mkString(" ")

  /** Hyphenation-rich paragraph: some lines end in a stripped or kept
    * hyphen so the dehyphenator sees real work.
    */
  private def paragraph(r: Rng, lines: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < lines) {
      sb.append(sentence(r, 3 + r.nextInt(6)))
      r.nextInt(5) match {
        case 0 => sb.append("-\n") // line-break hyphen
        case 1 => sb.append("-\n").append(Words(r.nextInt(Words.length)).capitalize).append('\n')
        case _ => sb.append('\n')
      }
      i += 1
    }
    sb.toString
  }

  private def rtfPayload(r: Rng): Array[Byte] = {
    val sb = new StringBuilder("""{\rtf1\ansi\ansicpg1252{\info{\title Doc """)
    sb.append(r.nextInt(1000))
    sb.append("""}{\author synth}}""")
    for (_ <- 0 until 2 + r.nextInt(4)) {
      sb.append(sentence(r, 6)).append(" caf\\'e9 ")
      sb.append("{\\b ").append(sentence(r, 2)).append("}\\par ")
    }
    sb.append("}")
    sb.toString.getBytes("ISO-8859-1")
  }

  private def zipBytes(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def docxPayload(r: Rng): Array[Byte] = {
    val paras = (0 until 2 + r.nextInt(4))
      .map(_ => s"<w:p><w:r><w:t>${xmlEscape(sentence(r, 8))}</w:t></w:r></w:p>").mkString
    zipBytes(
      "word/document.xml" ->
        s"""<?xml version="1.0"?><w:document><w:body>$paras</w:body></w:document>""",
      "docProps/core.xml" ->
        s"""<?xml version="1.0"?><cp:coreProperties><dc:title>synth ${r.nextInt(100)}</dc:title><dc:creator>graft</dc:creator></cp:coreProperties>""",
      "docProps/app.xml" ->
        """<?xml version="1.0"?><Properties><Application>graft-synth</Application><Pages>1</Pages></Properties>""")
  }

  private def odtPayload(r: Rng): Array[Byte] = {
    val paras = (0 until 2 + r.nextInt(3))
      .map(_ => s"<text:p>${xmlEscape(sentence(r, 7))}</text:p>").mkString
    zipBytes(
      "mimetype" -> "application/vnd.oasis.opendocument.text",
      "content.xml" ->
        s"""<?xml version="1.0"?><office:document-content><office:body><office:text>$paras</office:text></office:body></office:document-content>""",
      "meta.xml" ->
        s"""<?xml version="1.0"?><office:document-meta><office:meta><dc:title>odt ${r.nextInt(100)}</dc:title></office:meta></office:document-meta>""")
  }

  private def pptxPayload(r: Rng): Array[Byte] = {
    val nSlides = 2 + r.nextInt(4)
    val slides = (1 to nSlides).map { i =>
      s"ppt/slides/slide$i.xml" ->
        s"""<?xml version="1.0"?><p:sld><p:cSld><a:t>${xmlEscape(sentence(r, 5))}</a:t><a:t> slide $i</a:t></p:cSld></p:sld>"""
    }
    zipBytes(slides: _*)
  }

  private def odpPayload(r: Rng): Array[Byte] = {
    val slides = (0 until 2 + r.nextInt(3))
      .map(i => s"<draw:page><text:p>${xmlEscape(sentence(r, 5))} folie $i</text:p></draw:page>").mkString
    zipBytes(
      "mimetype" -> "application/vnd.oasis.opendocument.presentation",
      "content.xml" ->
        s"""<?xml version="1.0"?><office:document-content><office:body><office:presentation>$slides</office:presentation></office:body></office:document-content>""")
  }

  private def b64(data: Array[Byte]): String = Base64.getEncoder.encodeToString(data)

  /** The pure generator — one Doc per id, fully determined by (seed, id). */
  def mkDoc(id: Long, seed: Long): Doc = {
    val r = new Rng(seed * 0x9E3779B97F4A7C15L + id + 1)
    val docId = s"doc$id"
    val cls = (id % 20).toInt
    val spans: Seq[Span] = cls match {
      case c if c <= 4 =>
        val n = 1 + r.nextInt(4)
        (0 until n).map(i => Span("text", paragraph(r, 2 + r.nextInt(4)), "", i))
      case 5 =>
        // HTML doc with boilerplate (nav/footer link lists) around content
        val paras = (0 until 2 + r.nextInt(3))
          .map(_ => s"<p>${sentence(r, 12)}</p>").mkString("\n")
        val html =
          s"""<html><body><nav><a href="/">Home</a> <a href="/a">About</a></nav>
             |<article>$paras</article>
             |<footer><a href="/i">Imprint</a> legal</footer></body></html>""".stripMargin
        Seq(Span("html", b64(html.getBytes("UTF-8")), "", 0))
      case 6 | 7 =>
        // interleaved text+media; some media carry recorded OCR transcripts
        val out = Seq.newBuilder[Span]
        var off = 0
        for (_ <- 0 until 2 + r.nextInt(3)) {
          if (r.nextInt(2) == 0) {
            val ocr = if (r.nextInt(2) == 0) sentence(r, 4) else ""
            out += Span("media", ocr, s"s3://media/$docId/${r.nextInt(100)}.png", off)
            off += 1
            // short page after an image triggers the OCR rule
            out += Span("text", sentence(r, 3), "", off)
          } else {
            out += Span("text", paragraph(r, 3), "", off)
          }
          off += 1
        }
        out.result()
      case 8 | 9 => Seq(Span("rtf", b64(rtfPayload(r)), "", 0))
      case 10 =>
        val nPages = 1 + r.nextInt(3)
        val pdfPages = (0 until nPages).map { p =>
          (0 until 2 + r.nextInt(4)).map(i =>
            graft.core.pdf.PdfBuilder.Line(sentence(r, 5), 50, 700 - i * 20))
        }
        val pdf = graft.core.pdf.PdfBuilder.build(pdfPages,
          title = s"pdf $docId", withImagePage = r.nextInt(3) == 0)
        Seq(Span("pdf", b64(pdf), "", 0))
      case 11 | 12 => Seq(Span("bin", b64(docxPayload(r)), "", 0))
      case 13 => Seq(Span("bin", b64(odtPayload(r)), "", 0))
      case 14 | 15 => Seq(Span("pptx", b64(pptxPayload(r)), "", 0))
      case 16 => Seq(Span("odp", b64(odpPayload(r)), "", 0))
      case 17 =>
        // mega-doc: many text spans (salting target)
        val n = 40 + r.nextInt(40)
        (0 until n).map(i => Span("text", paragraph(r, 6), "", i))
      case 18 =>
        r.nextInt(3) match {
          case 0 => Seq(Span("bin", "", "", 0)) // zero_size
          case 1 => Seq(Span("bin", b64("GARBAGE-FORMAT".getBytes), "", 0)) // unknown_format
          case _ => Seq(Span("bin", b64(zipBytes("nothing.txt" -> "x")), "", 0)) // content_not_found
        }
      case _ =>
        // media-only docs; the 39-mod-40 half carries a loose image binary
        // instead — the image MIME dispatch path (docfactory.go:201-203):
        // sniffed image/* payloads become OCR-routed media spans with
        // x-doctype metadata.
        if (id % 40 == 39) {
          val body = sentence(r, 4).getBytes("UTF-8")
          val magic: Array[Byte] = r.nextInt(3) match {
            case 0 => Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
            case 1 => Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
            case _ => "GIF89a".getBytes("US-ASCII")
          }
          Seq(Span("bin", b64(magic ++ body), "", 0))
        } else
          Seq(Span("media", "", s"s3://media/$docId/only.mp4", 0))
    }
    Doc(docId, spans)
  }

  /** Distributed generation: spark.range → map. Scales to any n without
    * touching the driver.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(id => mkDoc(id, seed))
  }
}
