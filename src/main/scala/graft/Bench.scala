package graft

import graft.pipeline.{ExtractPipeline, SynthCorpus}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * The headline number is the extraction pipeline's docs/sec on the
  * deterministic synthetic interleaved-span corpus (the BASELINE.json
  * metric); the relational/dedup/similarity queries time alongside it.
  * Corpus size scales with the sf dir (sf0.1 → 20k docs ≈ the fixture
  * corpus scaled out).
  */
object Bench {

  /** `cores` is the parallelism level; tasks are sized at 4× cores so
    * straggling tasks (mega-docs, pptx-heavy rows) rebalance across waves —
    * with tasks == cores one slow task idles a whole core.
    *
    * The corpus is materialized to parquet once (untimed) so the measured
    * path is the production shape: parquet scan → salt → extract → count.
    */
  def extractionBench(spark: SparkSession, nDocs: Long, cores: Int): (Double, Long) = {
    import org.apache.spark.sql.functions.col
    val partitions = cores * 4
    val corpusPath = s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-$nDocs"
    if (!new java.io.File(corpusPath, "_SUCCESS").exists()) {
      SynthCorpus.generate(spark, nDocs, seed = 42L, partitions = partitions)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath).as[graft.pipeline.Doc](
      org.apache.spark.sql.Encoders.product[graft.pipeline.Doc])
    val cfg = ExtractPipeline.PipelineConfig(
      extractor = graft.core.Extractor.Default,
      numPartitions = partitions,
      megaDocBytes = 16 * 1024)
    val t0 = System.nanoTime()
    val n = ExtractPipeline.extract(corpus, cfg)
      .where(col("failure") === "").count()
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JIT/codegen once on a tiny slice so timings measure steady state
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
    }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: extraction throughput on the synthetic interleaved corpus
    val nDocs = queries.Extraction.corpusSize(sfDir) * 2
    val (extractSec, okDocs) = extractionBench(spark, nDocs, cpus.toInt)
    val docsPerSec = nDocs / extractSec

    val qs = (results + (s"extract_${nDocs}_docs" -> extractSec))
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum + extractSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"docs_per_sec":$docsPerSec,"extract_docs":$nDocs,"extract_ok":$okDocs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
