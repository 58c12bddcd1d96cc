package graft.pipeline

import graft.core.Extractor
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtractPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def extractWhole(doc: Doc): ExtractedDoc = {
    val r = Extractor.extract(doc.doc_id,
      doc.spans.map(s => Extractor.Span(s.kind, s.text, s.media_ref, s.offset)))
    ExtractedDoc(doc.doc_id,
      r.spans.map(s => Span(s.kind, s.text, s.mediaRef, s.offset)),
      r.metadata, r.failure, ExtractPipeline.docBytes(doc.spans))
  }

  test("salting invariance: chunked+merged mega-doc equals unsalted extraction") {
    // force tiny mega threshold so every multi-span doc splits
    val cfg = ExtractPipeline.PipelineConfig(megaDocBytes = 64, saltBuckets = 4)
    for (id <- 0L until 400L) {
      val doc = SynthCorpus.mkDoc(id, seed = 7L)
      val chunks = ExtractPipeline.splitChunks(doc, cfg)
      val results = chunks.map { c =>
        val r = Extractor.extract(c.doc_id,
          c.spans.map(s => Extractor.Span(s.kind, s.text, s.media_ref, s.offset)))
        ExtractPipeline.ChunkResult(c.doc_id, c.salt, c.nChunks,
          r.spans.map(s => Span(s.kind, s.text, s.mediaRef, s.offset)),
          r.metadata, r.failure, ExtractPipeline.docBytes(c.spans),
          r.pendingHyphenOut, r.sawContent, r.firstContentCp)
      }
      val merged = ExtractPipeline.mergeChunks(doc.doc_id, results)
      val whole = extractWhole(doc)
      val mergedText = merged.spans.filter(_.kind == "text").map(_.text).mkString
      val wholeText = whole.spans.filter(_.kind == "text").map(_.text).mkString
      assert(mergedText == wholeText, s"doc $id (${chunks.length} chunks) text diverged")
      assert(merged.spans.map(s => (s.kind, s.media_ref)) ==
        whole.spans.map(s => (s.kind, s.media_ref)), s"doc $id span structure diverged")
      assert(merged.spans.map(_.offset) == merged.spans.indices, s"doc $id offsets not renumbered")
      assert(merged.failure == whole.failure)
    }
  }

  test("cross-chunk pending hyphen: restored before uppercase, dropped before lowercase") {
    // chunk boundary between the hyphenated line and its continuation
    val mk = (cont: String) => Doc("d", Seq(
      Span("text", "eine Zeile wei-\n", "", 0),
      Span("text", cont + "\n", "", 1)))
    val cfg = ExtractPipeline.PipelineConfig(megaDocBytes = 4, saltBuckets = 2)
    def runSplit(doc: Doc): String = {
      val chunks = ExtractPipeline.splitChunks(doc, cfg)
      assert(chunks.length == 2, "expected the doc to split")
      val results = chunks.map { c =>
        val r = Extractor.extract(c.doc_id,
          c.spans.map(s => Extractor.Span(s.kind, s.text, s.media_ref, s.offset)),
          Extractor.Config(removeNewlines = false))
        ExtractPipeline.ChunkResult(c.doc_id, c.salt, c.nChunks,
          r.spans.map(s => Span(s.kind, s.text, s.mediaRef, s.offset)),
          r.metadata, r.failure, 0L, r.pendingHyphenOut, r.sawContent, r.firstContentCp)
      }
      ExtractPipeline.mergeChunks(doc.doc_id, results)
        .spans.map(_.text).mkString
    }
    assert(runSplit(mk("ter")) == "eine Zeile weiter\n")
    assert(runSplit(mk("Institution")) == "eine Zeile wei-Institution\n")
  }

  test("end-to-end Spark extraction on the synthetic corpus") {
    import spark.implicits._
    val n = 200L
    val corpus = SynthCorpus.generate(spark, n, seed = 42L, partitions = 4)
    val result = ExtractPipeline.extract(corpus,
      ExtractPipeline.PipelineConfig(numPartitions = 4)).collect()
    assert(result.length == n)
    // distributed result must equal per-doc local extraction exactly
    val byId = result.map(d => d.doc_id -> d).toMap
    for (id <- 0L until n) {
      val local = extractWhole(SynthCorpus.mkDoc(id, 42L))
      val dist = byId(s"doc$id")
      assert(dist.failure == local.failure, s"doc$id failure")
      assert(dist.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        local.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)), s"doc$id spans")
    }
    // failure classes present as designed (doc_id % 20 == 18)
    assert(result.count(_.failure.nonEmpty) == 10)
    assert(result.filter(_.failure.nonEmpty).map(_.failure).toSet
      .subsetOf(Set("zero_size", "unknown_format", "content_not_found")))
  }

  test("OCR trigger: recorded transcript emitted before short page text (misc.go:32-77)") {
    val doc = Doc("ocr1", Seq(
      Span("media", "recorded ocr transcript", "s3://m/1.png", 0),
      Span("text", "kurz", "", 1)))
    val r = extractWhole(doc)
    assert(r.spans.map(_.kind) == Seq("media", "text", "text"))
    assert(r.spans(0).media_ref == "s3://m/1.png")
    assert(r.spans(1).text.startsWith("recorded ocr transcript"))
    assert(r.spans(2).text.startsWith("kurz"))
    // long page text does NOT trigger OCR
    val longDoc = Doc("ocr2", Seq(
      Span("media", "transcript", "s3://m/2.png", 0),
      Span("text", "x" * 300, "", 1)))
    val r2 = extractWhole(longDoc)
    assert(r2.spans.map(_.kind) == Seq("media", "text"))
  }

  test("resume: committed docs are skipped, second run extracts the rest") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("lineage").toString
    val store = new ParquetSnapshotStore(tmp)
    val corpus = SynthCorpus.generate(spark, 100L, seed = 42L, partitions = 4)
    val firstHalf = corpus.filter(d => d.doc_id.drop(3).toLong < 50)
    Lineage.run(firstHalf, store, runId = "r1",
      ExtractPipeline.PipelineConfig(numPartitions = 4))
    assert(store.committedRuns == Seq("r1"))
    val committed = store.committedDocIds(spark).collect().toSet
    assert(committed.size == 48) // 50 minus the failure-class doc18/doc38... wait: ids 18, 38 fail
    val second = Lineage.run(corpus, store, runId = "r2",
      ExtractPipeline.PipelineConfig(numPartitions = 4))
    val secondIds = second.map(_.doc_id).collect().toSet
    // r2 re-extracts only uncommitted docs (failures retry + the second half)
    assert(secondIds.size == 100 - committed.size)
    assert(committed.intersect(secondIds).isEmpty)
    assert(store.committedRuns == Seq("r1", "r2"))
  }

  test("single-scan salting variant is byte-identical to the dual-branch plan") {
    import spark.implicits._
    val corpus = SynthCorpus.generate(spark, 120L, seed = 42L, partitions = 4)
    // small threshold so both mega and single docs exercise both plans
    val base = ExtractPipeline.PipelineConfig(numPartitions = 4, megaDocBytes = 16 * 1024)
    def key(d: ExtractedDoc) =
      (d.doc_id, d.failure, d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)))
    val dual = ExtractPipeline.extract(corpus, base).collect().map(key).sortBy(_._1)
    val single = ExtractPipeline.extract(corpus, base.copy(singleScan = true))
      .collect().map(key).sortBy(_._1)
    assert(single.toSeq == dual.toSeq)
  }

  test("metrics rows aggregate docs/bytes/spans/failures") {
    import spark.implicits._
    val corpus = SynthCorpus.generate(spark, 100L, seed = 42L, partitions = 4)
    val result = ExtractPipeline.extract(corpus, ExtractPipeline.PipelineConfig(numPartitions = 4))
    val m = ExtractPipeline.metrics(result, "t1").collect()
    assert(m.map(_.docs).sum == 100)
    assert(m.map(_.spans).sum > 0)
    val fails = m.flatMap(_.failures.toSeq).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(fails.values.sum == 5) // ids 18,38,58,78,98
  }
}
