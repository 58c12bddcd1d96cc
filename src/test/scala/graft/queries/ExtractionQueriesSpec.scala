package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the rows-only extraction queries (their span-level
  * correctness is covered by the kernel golden suites; these pin the
  * query-level composition).
  */
class ExtractionQueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extract_curate: deciles bounded, doc counts add up to deduped ok docs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Extraction.extractCurate(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(Set("en", "de", "es", "fr").contains(r.getString(0)))
      val d = r.getLong(1)
      assert(d >= 0 && d <= 9)
      assert(r.getLong(2) > 0)
    }
    // total docs == distinct non-empty extracted texts of ok docs
    val corpus = graft.pipeline.SynthCorpus.generate(spark, Extraction.corpusSize(dir), seed = 42L)
    val texts = graft.pipeline.ExtractPipeline.extract(corpus, Extraction.DemoCfg)
      .filter(_.failure == "")
      .map(d => d.spans.iterator.filter(_.kind == "text").map(_.text).mkString("\n"))
      .filter(_.nonEmpty)
    val expected = texts.distinct().count()
    assert(out.map(_.getLong(2)).sum == expected)
  }

  test("extract_ocr_queue: every queued ref resolves to real PNG bytes, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val out = Extraction.extractOcrQueue(spark, dir).collect()
    // class-10 PDFs with an image page exist in 200 docs (1/20 pdf, 1/3 image page)
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0).startsWith("doc"))
      assert(r.getLong(1) >= 1) // n_images
      assert(r.getLong(2) > 50) // real PNG payloads, not empty markers
    }
    val again = Extraction.extractOcrQueue(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("media_resize and media_audio_decode contract queries return full media classes") {
    val dir = "/root/testdata/sf0.001"
    val n = Extraction.corpusSize(dir) / 2
    assert(Extraction.mediaResize(spark, dir).count() == (n + 2) / 3) // ids % 3 == 0
    val audio = Extraction.mediaAudio(spark, dir)
    assert(audio.count() == n / 3 + (if (n % 3 >= 2) 1 else 0)) // ids % 3 == 1
    assert(audio.where(col("channels") === 0).count() == 0) // all real decodes succeed
  }
}
