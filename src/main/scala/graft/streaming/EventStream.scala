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

  /** Streaming EXACT-dedup via custom state: first-seen wins per content
    * hash. The stream of (doc_id, text) rows groups by md5(text);
    * [[org.apache.spark.sql.KeyValueGroupedDataset.mapGroupsWithState]]
    * keeps one boolean per hash (KV state store, incrementally
    * checkpointed) and emits a row only for the micro-batch that sees a
    * hash first — the streaming twin of `queries.Dedup.dedupExact`'s
    * min(doc_id) representative (same winner when arrival order follows
    * doc_id). State is the distinct-hash count only, bounded the same way
    * the batch shuffle is; at 10^12 docs pair with state TTL / RocksDB
    * state store.
    */
  final case class SeenDoc(content_hash: String, doc_id: Long)

  def firstSeenDedup(spark: SparkSession, dir: String,
      schema: StructType, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._
    val reader0 = spark.readStream.schema(schema)
    val reader = maxFilesPerTrigger
      .fold(reader0)(n => reader0.option("maxFilesPerTrigger", n.toString))
    reader
      .parquet(dir)
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .as[SeenDoc]
      .groupByKey(_.content_hash)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (hash: String, rows: Iterator[SeenDoc], state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          val firstInBatch = rows.minBy(_.doc_id)
          if (state.exists) SeenDoc(hash, -1L) // already emitted in an earlier batch
          else { state.update(true); firstInBatch }
      }
      .filter(_.doc_id >= 0L)
      .toDF("content_hash", "representative")
  }
}
