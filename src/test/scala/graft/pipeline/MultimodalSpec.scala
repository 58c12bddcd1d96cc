package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("media table synthesizes deterministically with binary payloads") {
    val m1 = Multimodal.synthesize(spark, 30).collect().sortBy(_.media_ref)
    val m2 = Multimodal.synthesize(spark, 30).collect().sortBy(_.media_ref)
    assert(m1.length == 30)
    assert(m1.map(_.pixelKey) sameElements m2.map(_.pixelKey))
    assert(m1.map(_.mime).toSet == Set("image/png", "audio/wav", "video/mp4"))
  }

  implicit class RowKey(m: Multimodal.MediaRow) {
    def pixelKey: (String, Int, Long) =
      (m.media_ref, m.bytes.length, m.bytes.foldLeft(1L)((a, b) => 31 * a + b))
  }

  test("image decode stub: deterministic pixel hashes, images only") {
    val media = Multimodal.synthesize(spark, 30)
    val decoded = Multimodal.decodeImages(media).collect()
    assert(decoded.length == 10) // ids % 3 == 0
    assert(decoded.forall(_.channels == 3))
    val again = Multimodal.decodeImages(Multimodal.synthesize(spark, 30)).collect()
    assert(decoded.sortBy(_.media_ref).map(_.pixel_hash)
      sameElements again.sortBy(_.media_ref).map(_.pixel_hash))
  }

  test("frame sampling plumbing: frames per duration") {
    val media = Multimodal.synthesize(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 10000).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getString(2).contains("#t=")))
  }

  test("feature extraction stub: 8-dim deterministic vectors") {
    val f = Multimodal.extractFeatures(Multimodal.synthesize(spark, 12)).collect()
    assert(f.length == 12)
    assert(f.forall(_.feature.length == 8))
    assert(f.forall(_.feature.forall(v => v >= 0 && v <= 1)))
  }
}
