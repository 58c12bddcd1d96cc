package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming shape of the pipeline's event rollups. The
  * reference has no event-time processing (SURVEY §2.9: its "streaming" is
  * per-request byte streaming), so this is the additive streaming surface
  * for the events table: watermarked sliding-window aggregation, the
  * streaming twin of queries.Relational.qEventsHourly (whose batch results
  * are DuckDB-oracle-verified).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** readStream → watermark → windowed agg. `dir` is a directory of parquet
    * files (file-source micro-batching at scale: each landed file is a
    * batch; the watermark bounds state for late events).
    */
  def windowedCounts(spark: SparkSession, dir: String,
      windowizeMinutes: Int = 60, watermarkMinutes: Int = 10): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(
        window(col("ts"), s"$windowizeMinutes minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
}
