package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed agg equals the batch rollup on the same input") {
    // stage the sf0.001 events parquet as the stream source dir
    val src = java.nio.file.Files.createTempDirectory("events-src").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(src)

    val q = EventStream.windowedCounts(spark, src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_out")
        .select(col("window_start").cast("string").as("ws"), col("event_type"), col("n_events"))
        .orderBy(col("ws"), col("event_type"))
        .collect().toSeq

      val batch = spark.read.parquet(src)
        .groupBy(window(col("ts"), "60 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").cast("string").as("ws"), col("event_type"), col("n_events"))
        .orderBy(col("ws"), col("event_type"))
        .collect().toSeq

      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
