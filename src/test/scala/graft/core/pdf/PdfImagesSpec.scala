package graft.core.pdf

import org.scalatest.funsuite.AnyFunSuite

/** O2: embedded-raster extraction (reference: pdf_images.go:30-67 — page
  * images materialized for the OCR path, thumbnails dropped).
  */
class PdfImagesSpec extends AnyFunSuite {

  private def rgbSamples(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)

  test("Flate DeviceRGB XObject: enumerated and decoded pixel-exact") {
    val (w, h) = (4, 3)
    val samples = rgbSamples(w, h)
    val pdf = PdfBuilder.build(Seq(Seq(PdfBuilder.Line("text", 50, 700))),
      rgbImage = Some((w, h, samples)))
    val f = new PdfFile(pdf)
    assert(f.pageCount == 2)
    assert(PdfImages.pageImageRefs(f, 0).isEmpty)
    assert(PdfImages.pageImageRefs(f, 1) == Vector(PdfImages.ImageRef("ImRGB", "png")))

    val png = PdfImages.decodeImage(f, 1, "ImRGB").get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      val expected = 0xFF000000 |
        ((samples(base) & 0xFF) << 16) |
        ((samples(base + 1) & 0xFF) << 8) |
        (samples(base + 2) & 0xFF)
      assert(img.getRGB(x, y) == expected, s"pixel ($x,$y)")
    }
  }

  test("unfiltered DeviceGray 1x1 XObject decodes to its gray value") {
    val pdf = PdfBuilder.build(Seq(Seq(PdfBuilder.Line("t", 50, 700))),
      withImagePage = true)
    val f = new PdfFile(pdf)
    assert(PdfImages.pageImageRefs(f, 1) == Vector(PdfImages.ImageRef("Im1", "png")))
    val png = PdfImages.decodeImage(f, 1, "Im1").get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 1 && img.getHeight == 1)
    assert(img.getRGB(0, 0) == 0xFF414141) // sample byte 'A' = 0x41
  }

  test("extractAll walks every page and keys refs by page/name") {
    val (w, h) = (2, 2)
    val pdf = PdfBuilder.build(Seq(Seq(PdfBuilder.Line("t", 50, 700))),
      withImagePage = true, rgbImage = Some((w, h, rgbSamples(w, h))))
    val all = PdfImages.extractAll(pdf)
    assert(all.map(t => (t._1, t._2, t._3, t._4)) == Vector(
      (1, "Im1", "png", "image/png"),
      (2, "ImRGB", "png", "image/png")))
    assert(all.forall(_._5.nonEmpty))
  }

  test("unknown XObject name and out-of-range page return None/empty") {
    val pdf = PdfBuilder.build(Seq(Seq(PdfBuilder.Line("t", 50, 700))),
      withImagePage = true)
    val f = new PdfFile(pdf)
    assert(PdfImages.decodeImage(f, 1, "Nope").isEmpty)
    assert(PdfImages.pageImageRefs(f, 7).isEmpty)
  }
}
