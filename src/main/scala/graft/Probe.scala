package graft

import graft.pipeline.{Doc, ExtractPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose extraction-path cost at one parallelism level.
  * Usage: runMain graft.Probe [nDocs] [cores]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      // extraction fuses the whole kernel into the scan stage, so scan
      // partitions must be sized by KERNEL cost, not by scan bytes: the
      // ~100 MB bench corpus would otherwise pack into ~5 tasks at the
      // 128 MB default and idle 27 of 32 cores (measured round 2)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpusPath = s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-$nDocs"
    if (!new java.io.File(corpusPath, "_SUCCESS").exists()) {
      graft.pipeline.SynthCorpus.generate(spark, nDocs, seed = 42L, partitions = cores * 4)
        .write.mode("overwrite").parquet(corpusPath)
    }
    def corpus = spark.read.parquet(corpusPath).as[Doc]
    val cfg = ExtractPipeline.PipelineConfig(numPartitions = cores * 4, megaDocBytes = 16 * 1024)

    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    def allocBytes: Long =
      tmx.getThreadAllocatedBytes(tmx.getAllThreadIds).filter(_ > 0).sum
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val a0 = allocBytes
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      val kbDoc = (allocBytes - a0) / 1e3 / nDocs
      println(f"PROBE $name%-28s ${s}%8.2f s   ${nDocs / s}%9.0f docs/s   $kbDoc%7.1f KB/doc")
    }

    time("scan_count") { corpus.count(): Unit }
    time("scan_full_noop") { corpus.toDF().write.format("noop").mode("overwrite").save() }
    time("scan_deser_reser") {
      corpus.mapPartitions(it => it).toDF().write.format("noop").mode("overwrite").save()
    }
    time("scan_deser_only") {
      corpus.mapPartitions(it => { var n = 0L; it.foreach(_ => n += 1); Iterator(n) })
        .toDF().write.format("noop").mode("overwrite").save()
    }
    time("kernel_only") {
      corpus.mapPartitions(it => {
        var n = 0L
        it.foreach { d =>
          val chunk = ExtractPipeline.Chunk(d.doc_id, 0, 1, d.spans.sortBy(_.offset))
          val r = graft.core.Extractor.extract(d.doc_id,
            chunk.spans.map(s => graft.core.Extractor.Span(s.kind, s.text, s.media_ref, s.offset)))
          n += r.spans.length
        }
        Iterator(n)
      }).toDF().write.format("noop").mode("overwrite").save()
    }
    time("full_extract") {
      ExtractPipeline.extract(corpus, cfg).toDF().write.format("noop").mode("overwrite").save()
    }
    time("extract_repart_singles") {
      ExtractPipeline.extract(corpus, cfg.copy(repartitionSingles = true))
        .toDF().write.format("noop").mode("overwrite").save()
    }
    time("extract_no_salting") {
      val cfgNs = cfg.copy(megaDocBytes = Long.MaxValue)
      ExtractPipeline.extract(corpus, cfgNs).toDF().write.format("noop").mode("overwrite").save()
    }
    time("salted_branch_only") {
      import org.apache.spark.sql.functions.col
      val isMega = graft.functions.SpanExpressions.span_byte_cost(col("spans")) > cfg.megaDocBytes && size(col("spans")) > 1
      corpus.where(isMega)
        .flatMap(d => ExtractPipeline.splitChunks(d, cfg))
        .repartition(cfg.numPartitions, col("doc_id"), col("salt"))
        .as[ExtractPipeline.Chunk]
        .mapPartitions(it => it.map { c =>
          val r = graft.core.Extractor.extract(c.doc_id,
            c.spans.map(s => graft.core.Extractor.Span(s.kind, s.text, s.media_ref, s.offset)))
          ExtractPipeline.ChunkResult(c.doc_id, c.salt, c.nChunks,
            r.spans.map(s => graft.pipeline.Span(s.kind, s.text, s.mediaRef, s.offset)),
            r.metadata, r.failure, 0L, r.pendingHyphenOut, r.sawContent, r.firstContentCp)
        })
        .groupByKey(_.doc_id)
        .mapGroups((id, it) => ExtractPipeline.mergeChunks(id, it.toSeq))
        .toDF().write.format("noop").mode("overwrite").save()
    }
    time("mega_filter_scan") {
      val isMega = expr("aggregate(spans, 0L, (a, s) -> a + length(s.text) + length(s.media_ref))") > cfg.megaDocBytes && size(col("spans")) > 1
      corpus.where(isMega).count(): Unit
    }
    spark.stop()
  }
}
