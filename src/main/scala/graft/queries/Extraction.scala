package graft.queries

import graft.pipeline.{Doc, ExtractPipeline, Span, SynthCorpus}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The extraction pipeline itself, surfaced through the driver contract.
  * The interleaved-span input table (BASELINE.json input_hint) is
  * synthesized deterministically (seed 42) at a size scaled to the sf dir —
  * the extraction kernels aren't SQL-expressible, so these register either
  * rows-only checks or DuckDB oracles over the *relational envelope*
  * (counts / failure codes / span statistics with deterministic values).
  */
object Extraction {

  /** Corpus size per sf dir: correctness gate (sf0.01) runs 2000 docs. */
  def corpusSize(dir: String): Long =
    if (dir.contains("0.1")) 20000L else if (dir.contains("0.01")) 2000L else 200L

  /** Salting threshold scaled down to the demo corpus (mega-docs here are
    * ~50-100 KB; production default is 512 KB+).
    */
  val DemoCfg: ExtractPipeline.PipelineConfig =
    ExtractPipeline.PipelineConfig(megaDocBytes = 16 * 1024)

  private def extracted(spark: SparkSession, dir: String) = {
    val corpus = SynthCorpus.generate(spark, corpusSize(dir), seed = 42L)
    ExtractPipeline.extract(corpus, DemoCfg)
  }

  // ── extraction-envelope oracle ────────────────────────────────────────────
  // The interleaved corpus never materializes as one of the sf parquet
  // tables, so the DuckDB oracle can't recompute the envelope from a view.
  // Instead the generator writes a per-doc EXPECTATION table to a
  // deterministic tmp path: each row is the single-doc, unsalted kernel run
  // (graft.core.Extractor — golden-tested against the reference's own
  // constants under `sbt -batch test`). The oracle SQL reads that parquet
  // directly, so the DuckDB compare verifies the DISTRIBUTED pipeline
  // (salting, chunk merge, shuffle, regroup) against the sequential kernel —
  // exactly the layer the rows-only check couldn't see. Bump the version
  // token whenever generator or kernel semantics change (stale /tmp files).
  private val ExpectationVersion = "r3"

  private def expectedPathForSize(n: Long): String =
    s"${sys.props("java.io.tmpdir")}/graft-expected-$ExpectationVersion-$n"

  /** Write the expectation parquet for this sf dir if absent (idempotent;
    * Bench calls it untimed so contract-query timings stay pure).
    */
  def ensureExpectation(spark: SparkSession, dir: String): String = synchronized {
    val path = expectedPathForSize(corpusSize(dir))
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      import spark.implicits._
      SynthCorpus.generate(spark, corpusSize(dir), seed = 42L)
        .map { d =>
          val sorted = d.spans.sortBy(_.offset)
          val r = graft.core.Extractor.extract(d.doc_id,
            sorted.map(s => graft.core.Extractor.Span(s.kind, s.text, s.media_ref, s.offset)),
            DemoCfg.extractor)
          (d.doc_id, r.spans.size.toLong,
            r.spans.iterator.map(_.text.length.toLong).sum,
            r.spans.count(_.kind == "media").toLong,
            r.failure,
            sorted.filter(_.kind == "media").map(_.media_ref).mkString("|"),
            r.spans.filter(_.kind == "media").map(_.mediaRef).mkString("|"))
        }
        .toDF("doc_id", "n_spans", "n_chars", "n_media", "failure", "in_refs", "out_refs")
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Flagship: full extraction, one summary row per doc, deterministic
    * values (span counts, char counts, failure codes). Rows-only check from
    * the driver; span-level equality runs under `sbt -batch test`.
    */
  def extractPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ensureExpectation(spark, dir)
    extracted(spark, dir)
      .map(d => (d.doc_id, d.spans.size,
        d.spans.iterator.map(_.text.length.toLong).sum,
        d.spans.count(_.kind == "media"), d.failure))
      .toDF("doc_id", "n_spans", "n_chars", "n_media", "failure")
      .orderBy(substring(col("doc_id"), 4, 12).cast("long"))
  }

  /** Failure-code distribution over the synthetic corpus — deterministic
    * (doc_id mod 20 == 18 rows are the failure class; the sub-kind cycles
    * by seeded rng). Rows-only check (values asserted in ScalaTest).
    */
  def extractFailureCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ensureExpectation(spark, dir)
    extracted(spark, dir)
      .map(d => (if (d.failure.isEmpty) "ok" else d.failure, 1L))
      .toDF("code", "one")
      .groupBy(col("code")).agg(sum(col("one")).as("docs"))
      .orderBy(col("code"))
  }

  /** Media passthrough invariant, SQL-checkable: every media span of every
    * non-failed doc survives extraction with its media_ref intact, in
    * order. Output: (doc_id, media_refs concatenated) — compared against
    * the same derivation computed directly from the deterministic
    * generator via a second Spark path (input side), NOT DuckDB (the
    * corpus never materializes as parquet). Registered rows-only.
    */
  def extractMediaPassthrough(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ensureExpectation(spark, dir)
    val corpus = SynthCorpus.generate(spark, corpusSize(dir), seed = 42L)
    val inputRefs = corpus
      .map(d => (d.doc_id, d.spans.sortBy(_.offset).filter(_.kind == "media").map(_.media_ref).mkString("|")))
      .toDF("doc_id", "in_refs")
    val outRefs = extracted(spark, dir)
      .filter(_.failure == "")
      .map(d => (d.doc_id, d.spans.sortBy(_.offset).filter(_.kind == "media").map(_.media_ref).mkString("|")))
      .toDF("doc_id", "out_refs")
    inputRefs.join(outRefs, Seq("doc_id"))
      .select(col("doc_id"),
        (col("in_refs") === col("out_refs")).as("refs_preserved"))
      .groupBy(col("refs_preserved")).agg(count(lit(1)).as("docs"))
      .orderBy(col("refs_preserved"))
  }

  /** Salting distribution over the real pipeline: how mega-docs spread into
    * chunks. Deterministic; rows-only.
    */
  def extractSaltSpread(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = SynthCorpus.generate(spark, corpusSize(dir), seed = 42L)
    corpus.flatMap(d => ExtractPipeline.splitChunks(d, DemoCfg))
      .map(c => (c.nChunks > 1, c.salt))
      .toDF("is_mega", "salt")
      .groupBy(col("is_mega"), col("salt"))
      .agg(count(lit(1)).as("chunks"))
      .orderBy(col("is_mega"), col("salt"))
  }

  /** End-to-end curation composition — the "switch to this library" user
    * story in one plan: extract the interleaved corpus → keep ok docs →
    * concat text spans → EXACT dedup (first doc per content hash) →
    * quality score + language ID on the extracted text → summary per
    * (predicted language, quality decile). Deterministic (rows-only check;
    * every stage it composes is individually oracled or golden-tested).
    * Scale shape: one kernel stage, one dedup shuffle on md5(text), one
    * final tiny aggregate.
    */
  def extractCurate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val texts = extracted(spark, dir)
      .filter(_.failure == "")
      .map(d => (d.doc_id,
        d.spans.iterator.filter(_.kind == "text").map(_.text).mkString("\n")))
      .toDF("doc_id", "text")
      .where(length(col("text")) > 0)
    val firstPerHash = Window.partitionBy(col("h"))
      .orderBy(expr("cast(substring(doc_id, 4, 12) as bigint)").asc)
    val deduped = texts
      .withColumn("h", md5(col("text")))
      .withColumn("rn", row_number().over(firstPerHash))
      .where(col("rn") === 1)
      .withColumn("words", expr("filter(split(text, ' '), w -> w <> '')"))
    TextAnalysis.withPredictedLang(TextAnalysis.withQualityCols(deduped))
      .withColumn("quality_decile", expr("least(greatest(quality_x10k div 1000, 0L), 9L)"))
      .groupBy(col("predicted_lang"), col("quality_decile"))
      .agg(count(lit(1)).as("docs"),
        sum(length(col("text"))).as("chars"))
      .orderBy(col("predicted_lang"), col("quality_decile"))
  }

  /** The OCR feed, end to end (O2): extract → collect OCR-triggered PDF
    * media refs → semi-join the corpus down to just those documents →
    * materialize their embedded rasters ([[graft.pipeline.Multimodal.pdfMediaRows]])
    * → equi-join bytes back to refs → per-doc queue summary. This is the
    * scale-correct order: only OCR-triggered documents ever pay image
    * decode, and the ref join is an equi-join on media_ref (shuffle on the
    * ref key, broadcastable while the triggered minority is small).
    * Deterministic (PNG re-encode is within-JVM stable); rows-only check —
    * pixel-level correctness is pinned by PdfImagesSpec/MultimodalSpec
    * goldens.
    */
  def extractOcrQueue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = SynthCorpus.generate(spark, corpusSize(dir), seed = 42L)
    val refs = ExtractPipeline.extract(corpus, DemoCfg)
      .filter(_.failure == "")
      .flatMap(d => d.spans.iterator
        .filter(s => s.kind == "media" && s.media_ref.startsWith("pdf:"))
        .map(s => (d.doc_id, s.media_ref)))
      .toDF("doc_id", "media_ref")
    val queuedDocs = SynthCorpus.generate(spark, corpusSize(dir), seed = 42L)
      .join(refs.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .as[Doc]
    val media = graft.pipeline.Multimodal.pdfMediaRows(queuedDocs)
      .toDF().select(col("media_ref"), col("mime"), octet_length(col("bytes")).as("png_bytes"))
    refs.join(media, Seq("media_ref"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_images"), sum(col("png_bytes")).as("bytes"))
      .orderBy(substring(col("doc_id"), 4, 12).cast("long"))
  }

  /** Multimodal pipeline surfaced through the contract (rows-only: image
    * decode is REAL — JDK ImageIO over real PNG payloads, deterministic
    * because PNG is lossless — but not SQL-expressible in DuckDB).
    */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = graft.pipeline.Multimodal.synthesize(spark, corpusSize(dir) / 2)
    graft.pipeline.Multimodal.decodeImages(media)
      .toDF().orderBy(col("media_ref"))
  }

  /** Real WAV decode over the synthetic media table (rows-only: PCM
    * statistics are not DuckDB-expressible over binary payloads).
    */
  def mediaAudio(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.pipeline.Multimodal.synthesize(spark, corpusSize(dir) / 2)
    graft.pipeline.Multimodal.decodeAudio(media)
      .toDF().orderBy(col("media_ref"))
  }

  /** Real nearest-neighbor resize over the media table (rows-only). */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.pipeline.Multimodal.synthesize(spark, corpusSize(dir) / 2)
    graft.pipeline.Multimodal.resizeImages(media, maxDim = 12)
      .toDF().select(col("media_ref"), col("width"), col("height"), col("pixel_hash"))
      .orderBy(col("media_ref"))
  }

  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.pipeline.Multimodal.synthesize(spark, corpusSize(dir) / 2)
    graft.pipeline.Multimodal.sampleFrames(media, everyMs = 10000)
      .groupBy(col("media_ref")).agg(count(lit(1)).as("n_frames"))
      .orderBy(col("media_ref"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "extract_pipeline" -> (extractPipeline _),
    "extract_failure_codes" -> (extractFailureCodes _),
    "extract_media_passthrough" -> (extractMediaPassthrough _),
    "extract_salt_spread" -> (extractSaltSpread _),
    "extract_curate" -> (extractCurate _),
    "extract_ocr_queue" -> (extractOcrQueue _),
    "media_decode" -> (mediaDecode _),
    "media_audio_decode" -> (mediaAudio _),
    "media_resize" -> (mediaResize _),
    "media_frame_sample" -> (mediaFrames _)
  )

  // The correctness gate runs at sf0.01 (2000 docs) — the oracle SQL bakes
  // that path; the queries write it via ensureExpectation before the driver's
  // DuckDB ever runs. Remaining entries (salt spread, media decode paths)
  // are genuinely non-SQL-expressible and stay rows-only with ScalaTest
  // golden/property backing.
  val oracle: Map[String, String] = {
    val exp = s"'${expectedPathForSize(2000L)}/*.parquet'"
    Map(
      "extract_pipeline" ->
        s"""SELECT doc_id, n_spans, n_chars, n_media, failure
            FROM $exp ORDER BY CAST(substring(doc_id, 4, 12) AS BIGINT)""",
      "extract_failure_codes" ->
        s"""SELECT CASE WHEN failure = '' THEN 'ok' ELSE failure END AS code,
              COUNT(*) AS docs
            FROM $exp GROUP BY 1 ORDER BY code""",
      "extract_media_passthrough" ->
        s"""SELECT (in_refs = out_refs) AS refs_preserved, COUNT(*) AS docs
            FROM $exp WHERE failure = '' GROUP BY 1 ORDER BY 1"""
    )
  }
}
