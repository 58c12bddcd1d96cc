package graft.core.pdf

/** Embedded-image extraction from PDF pages (O2): the reference
  * materializes page images for the OCR path via pdfcpu
  * (`internal/pdfproc/pdf_images.go:30-67`, wired at
  * `native_pdf.go:101-107`; thumbnails are dropped — they live on the page
  * dict's /Thumb, not /Resources/XObject, so an XObject walk never sees
  * them).
  *
  * Two-phase by design for the 100 TB shape: the extraction kernel only
  * ENUMERATES decodable images (dict-only inspection, no stream inflate —
  * [[pageImageRefs]]), emitting one media span per image; the byte
  * materialization ([[decodeImage]]) runs in the downstream media stage for
  * the (rare) OCR-triggered pages only. Inflating every scanned raster
  * inside the text kernel would multiply its allocation for spans that are
  * mostly never OCR'd.
  *
  * Supported encodings:
  *   - DCTDecode (sole filter): the stream IS a JPEG file — passthrough.
  *   - FlateDecode / ASCIIHexDecode / unfiltered 8-bit DeviceGray or
  *     DeviceRGB rasters: inflate → samples → PNG (lossless, so the decoded
  *     pixels are bit-deterministic end to end).
  * Anything else (CCITT, JBIG2, JPX, palettes, sub-8-bit, ImageMask) is not
  * surfaced — at corpus scale an unsupported raster is data to skip, not an
  * error.
  */
object PdfImages {

  final case class ImageRef(name: String, ext: String) // ext: "jpg" | "png"

  /** Raster size cap (pixels) for PNG re-encode — a DELIBERATE deviation
    * from the reference (which has no cap; see FIXTURES.md): a worst-case
    * TYPE_INT_RGB at the default 64 MP still allocates ~256 MB per task,
    * so executors with small task slots can lower it
    * (`-Dgraft.pdf.maxImagePixels=…`). Oversize rasters are skipped like
    * any other unsupported encoding, never an error.
    */
  val MaxPixels: Long =
    sys.props.get("graft.pdf.maxImagePixels")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .getOrElse(64L * 1024 * 1024)

  private val RasterFilters = Set("FlateDecode", "Fl", "ASCIIHexDecode", "AHx")

  private def filtersOf(f: PdfFile, sd: PdfStreamObj): Vector[String] =
    sd.dict.get("Filter").map(f.resolve(_)) match {
      case Some(PdfName(n)) => Vector(n)
      case Some(PdfArr(items)) => items.flatMap(f.name(_)).toVector
      case _ => Vector.empty
    }

  private def colorComponents(f: PdfFile, sd: PdfStreamObj): Int =
    sd.dict.get("ColorSpace").map(f.resolve(_)) match {
      case Some(PdfName("DeviceGray" | "CalGray")) => 1
      case Some(PdfName("DeviceRGB" | "CalRGB")) => 3
      case _ => 0 // ICC/Indexed/Separation/…: unsupported here
    }

  private def intOf(f: PdfFile, sd: PdfStreamObj, key: String): Int =
    sd.dict.get(key).flatMap(f.num).map(_.toInt).getOrElse(0)

  /** Classify one XObject stream: Some(ext) when [[decodeImage]] can
    * materialize it, None otherwise. Dict-only — no stream decode.
    */
  private def classify(f: PdfFile, sd: PdfStreamObj): Option[String] = {
    if (!sd.dict.get("Subtype").flatMap(f.name(_)).contains("Image")) return None
    if (sd.dict.get("ImageMask").map(f.resolve(_)).contains(PdfBool(true))) return None
    val filters = filtersOf(f, sd)
    if (filters == Vector("DCTDecode") || filters == Vector("DCT")) Some("jpg")
    else if (filters.forall(RasterFilters.contains) &&
      intOf(f, sd, "BitsPerComponent") == 8 &&
      colorComponents(f, sd) > 0 &&
      intOf(f, sd, "Width") > 0 && intOf(f, sd, "Height") > 0) Some("png")
    else None
  }

  private def imageXObjects(f: PdfFile, pageIdx: Int): Vector[(String, PdfStreamObj)] = {
    if (pageIdx < 0 || pageIdx >= f.pageCount) return Vector.empty
    val (_, res) = f.pages(pageIdx)
    res.get("XObject").flatMap(f.dict) match {
      case Some(xd) =>
        xd.entries.toVector.sortBy(_._1).flatMap { case (n, ref) =>
          f.stream(ref).map(sd => (n, sd))
        }
      case None => Vector.empty
    }
  }

  /** Decodable image XObjects of a page, in name order (deterministic). */
  def pageImageRefs(f: PdfFile, pageIdx: Int): Vector[ImageRef] =
    imageXObjects(f, pageIdx).flatMap { case (n, sd) =>
      classify(f, sd).map(ext => ImageRef(n, ext))
    }

  /** Materialize one page image as an encoded file: JPEG passthrough for
    * DCTDecode, PNG for raw/Flate rasters. None when the named XObject is
    * absent, unsupported, or its samples are truncated.
    */
  def decodeImage(f: PdfFile, pageIdx: Int, name: String): Option[Array[Byte]] =
    imageXObjects(f, pageIdx).find(_._1 == name).flatMap { case (_, sd) =>
      classify(f, sd) match {
        case Some("jpg") => Some(sd.raw)
        case Some("png") =>
          try {
            val w = intOf(f, sd, "Width")
            val h = intOf(f, sd, "Height")
            val ncomp = colorComponents(f, sd)
            val samples = f.decodeStream(sd)
            // long arithmetic: hostile Width/Height dicts (50000×50000)
            // overflow an Int product to negative, defeating the truncation
            // guard and letting the BufferedImage allocation OOM the task;
            // anything above MaxPixels is "unsupported raster → skip" like
            // the rest of this file's contract (documented deviation)
            val pixels = w.toLong * h
            if (pixels <= 0 || pixels > MaxPixels ||
              samples.length < pixels * ncomp) None
            else {
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val base = (y * w + x) * ncomp
                  val rgb =
                    if (ncomp == 1) {
                      val g = samples(base) & 0xFF
                      (g << 16) | (g << 8) | g
                    } else {
                      ((samples(base) & 0xFF) << 16) |
                        ((samples(base + 1) & 0xFF) << 8) |
                        (samples(base + 2) & 0xFF)
                    }
                  img.setRGB(x, y, rgb)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              Some(bos.toByteArray)
            }
          } catch { case _: Exception => None }
        case _ => None
      }
    }

  /** All decodable images of a document as
    * (pageIdx, name, ext, mime, bytes) — the media-stage entry point that
    * resolves the extractor's `pdf:<doc>/page<N>/<name>.<ext>` refs.
    */
  def extractAll(payload: Array[Byte]): Vector[(Int, String, String, String, Array[Byte])] = {
    val f = new PdfFile(payload)
    (0 until f.pageCount).toVector.flatMap { p =>
      pageImageRefs(f, p).flatMap { r =>
        decodeImage(f, p, r.name).map { bytes =>
          val mime = if (r.ext == "jpg") "image/jpeg" else "image/png"
          (p, r.name, r.ext, mime, bytes)
        }
      }
    }
  }
}
