package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet table loader for the driver-generated testdata dirs
  * (/root/testdata/sf*). Column pruning + predicate pushdown come from the
  * parquet scan; callers select only what they need.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan-parallelism floor for tables feeding heavy per-row kernels
    * (guide §2.5 "input skew: one huge unsplittable file … repartition
    * immediately after the read"): the testdata tables are single small
    * parquet files — one row group, unsplittable by maxPartitionBytes — so
    * the scan yields 1 partition and every narrow kernel above it
    * (shingles+minhash, simhash, regex tokenizers, boilerplate strip, LSH
    * dots) ran single-task with the other cores idle (measured round 6:
    * text_quality 0.84 s of which ~0.7 s was one task).
    *
    * The floor is scale-adaptive, not a local constant: it only fires when
    * the scan has FEWER partitions than the session's default parallelism,
    * so a production-scale table (thousands of splits) passes through with
    * no added exchange. Redistribution hashes the primary key —
    * deterministic placement (never round-robin over a non-deterministic
    * source, SPARK-38388), and filters/pruning still push through the
    * repartition to the scan.
    */
  def spread(spark: SparkSession, dir: String, name: String, key: String): DataFrame = {
    val df = apply(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key)) else df
  }
}
