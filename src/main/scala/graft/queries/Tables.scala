package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated testdata dirs
  * (/root/testdata/sf*). Column pruning + predicate pushdown come from the
  * parquet scan; callers select only what they need.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
