package graft

/** Dev utility: per-corpus-class kernel allocation/time profile, no Spark —
  * isolates WHERE the extraction kernel's bytes/doc go (the bandwidth wall
  * that caps multi-thread scaling on this host is fed by allocation).
  * `sbt "runMain graft.DevAlloc [docsPerClass]"`.
  */
object DevAlloc {
  def main(args: Array[String]): Unit = {
    val perClass = if (args.nonEmpty) args(0).toInt else 2000
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId

    def profile(cls: Int): (Double, Double, Double) = {
      // fixed ids of this class; generation separated from extraction
      val ids = (0 until perClass).map(k => cls.toLong + 20L * k)
      val docs = ids.map(id => pipeline.SynthCorpus.mkDoc(id, 42L))
      val spans = docs.map(_.spans.sortBy(_.offset).map(s =>
        core.Extractor.Span(s.kind, s.text, s.media_ref, s.offset)))
      // warm
      spans.foreach(s => core.Extractor.extract("w", s))
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      var outChars = 0L
      docs.indices.foreach { i =>
        val r = core.Extractor.extract(docs(i).doc_id, spans(i))
        outChars += r.spans.iterator.map(_.text.length.toLong).sum
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val kb = (tmx.getThreadAllocatedBytes(tid) - a0) / 1e3 / perClass
      (kb, sec * 1e6 / perClass, outChars.toDouble / perClass)
    }

    // stage breakdown inside the two hottest kernels: `pdf` / `ooxml` modes
    if (args.length > 1 && args(1) == "pdf") {
      val payloads = (0 until perClass).map { k =>
        val d = pipeline.SynthCorpus.mkDoc(10L + 20L * k, 42L)
        java.util.Base64.getDecoder.decode(d.spans.head.text)
      }
      def stage(name: String)(f: Array[Byte] => Unit): Unit = {
        payloads.foreach(f) // warm
        val a0 = tmx.getThreadAllocatedBytes(tid)
        val t0 = System.nanoTime()
        payloads.foreach(f)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PDFSTAGE $name%-22s ${(tmx.getThreadAllocatedBytes(tid) - a0) / 1e3 / perClass}%9.1f KB/doc ${sec * 1e6 / perClass}%9.1f us/doc")
      }
      stage("open") { p => new core.pdf.PdfFile(p): Unit }
      stage("open+pages") { p => new core.pdf.PdfFile(p).pages: Unit }
      stage("open+meta") { p =>
        val f = new core.pdf.PdfFile(p); core.pdf.PdfExtract.metadata(f): Unit
      }
      stage("open+content") { p =>
        val f = new core.pdf.PdfFile(p)
        (0 until f.pageCount).foreach(i => f.pageContent(f.pages(i)._1))
      }
      stage("full_pageText") { p =>
        val f = new core.pdf.PdfFile(p)
        (0 until f.pageCount).foreach(i => core.pdf.PdfExtract.pageText(f, i))
      }
      stage("full+hasImages") { p =>
        val f = new core.pdf.PdfFile(p)
        (0 until f.pageCount).foreach { i =>
          core.pdf.PdfExtract.pageText(f, i)
          core.pdf.PdfExtract.pageHasImages(f, i)
        }
      }
      // hasImages-only on warm files (isolates its marginal cost)
      val filesH = payloads.map(new core.pdf.PdfFile(_))
      filesH.foreach(f => (0 until f.pageCount).foreach(i => core.pdf.PdfExtract.pageHasImages(f, i)))
      locally {
        val a0 = tmx.getThreadAllocatedBytes(tid)
        val t0 = System.nanoTime()
        filesH.foreach(f => (0 until f.pageCount).foreach(i => core.pdf.PdfExtract.pageHasImages(f, i)))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PDFSTAGE hasImages_warm        ${(tmx.getThreadAllocatedBytes(tid) - a0) / 1e3 / perClass}%9.1f KB/doc ${sec * 1e6 / perClass}%9.1f us/doc")
      }
      // interpreter-only: same files, warm font/xobj caches
      val files = payloads.map(new core.pdf.PdfFile(_))
      files.foreach(f => (0 until f.pageCount).foreach(i => core.pdf.PdfExtract.pageText(f, i)))
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      files.foreach(f => (0 until f.pageCount).foreach(i => core.pdf.PdfExtract.pageText(f, i)))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PDFSTAGE interp_warmfonts      ${(tmx.getThreadAllocatedBytes(tid) - a0) / 1e3 / perClass}%9.1f KB/doc ${sec * 1e6 / perClass}%9.1f us/doc")
      return
    }

    if (args.length > 1 && args(1) == "ooxml") {
      val payloads = (0 until perClass).map { k =>
        val d = pipeline.SynthCorpus.mkDoc(11L + 20L * k, 42L)
        java.util.Base64.getDecoder.decode(d.spans.head.text)
      }
      def stage(name: String)(f: Array[Byte] => Unit): Unit = {
        payloads.foreach(f)
        val a0 = tmx.getThreadAllocatedBytes(tid)
        val t0 = System.nanoTime()
        payloads.foreach(f)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"OOXSTAGE $name%-22s ${(tmx.getThreadAllocatedBytes(tid) - a0) / 1e3 / perClass}%9.1f KB/doc ${sec * 1e6 / perClass}%9.1f us/doc")
      }
      stage("zip_entries") { p =>
        core.ZipArchive.entries(p, _ => true): Unit
      }
      stage("zip_content_only") { p =>
        core.ZipArchive.entries(p, n => n == "word/document.xml"): Unit
      }
      stage("zip+xmlToText") { p =>
        core.ZipArchive.entries(p, n => n == "word/document.xml")
          .foreach(e => core.OfficeXml.xmlToText(e.data, "body"))
      }
      stage("full_parse") { p => core.OfficeXml.parse(p, "docx"): Unit }
      return
    }

    // class → share per 20 docs (SynthCorpus header)
    val share = Map(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1, 5 -> 1, 6 -> 1,
      7 -> 1, 8 -> 1, 9 -> 1, 10 -> 1, 11 -> 1, 12 -> 1, 13 -> 1, 14 -> 1,
      15 -> 1, 16 -> 1, 17 -> 1, 18 -> 1, 19 -> 1)
    var totalKb = 0.0
    var totalUs = 0.0
    (0 until 20).foreach { cls =>
      val (kb, us, chars) = profile(cls)
      totalKb += kb * share(cls) / 20.0
      totalUs += us * share(cls) / 20.0
      println(f"ALLOC cls$cls%-3d ${kb}%9.1f KB/doc ${us}%9.1f us/doc ${chars}%9.0f chars")
    }
    println(f"ALLOC mix  ${totalKb}%9.1f KB/doc ${totalUs}%9.1f us/doc (corpus-weighted)")
  }
}
