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

  test("gaps-and-islands sessionization agrees with Spark's built-in session_window") {
    // qSessions (the DuckDB-oracled two-window form) must produce the same
    // per-user session counts as the engine-native session_window — both
    // close a session at >= 30 min of inactivity. session_window is also
    // the streaming form (groupBy(session_window(ts, gap)) + watermark).
    val dir = "/root/testdata/sf0.001"
    val builtIn = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("tsec", col("ts").cast("timestamp"))
      .groupBy(session_window(col("tsec"), "30 minutes"), col("user_id"))
      .count()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
    val ours = graft.queries.Relational.qSessions(spark, dir)
      .select(col("user_id"), col("n_sessions"))
    val diff = builtIn.as("a").join(ours.as("b"), Seq("user_id"), "full_outer")
      .where(col("a.n_sessions") =!= col("b.n_sessions") ||
        col("a.n_sessions").isNull || col("b.n_sessions").isNull)
      .count()
    assert(diff == 0)
  }

  test("stateful first-seen dedup emits each content hash exactly once across micro-batches") {
    // stage documents as 4 separate files so the file source delivers
    // multiple micro-batches (maxFilesPerTrigger=1) and the dedup state
    // must survive batch boundaries
    val src = java.nio.file.Files.createTempDirectory("docs-src").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    val spark2 = spark
    import spark2.implicits._
    val q = EventStream.firstSeenDedup(spark, src,
        spark.read.parquet(src).schema, maxFilesPerTrigger = Some(1))
      .writeStream.outputMode("update").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("dedup_out").as[(String, Long)].collect().toSeq
      val expectedHashes = docs.select(md5(col("text"))).distinct().as[String].collect().toSet
      // exactly once per distinct hash
      assert(emitted.map(_._1).toSet == expectedHashes)
      assert(emitted.size == expectedHashes.size)
      // every representative actually carries its hash
      val hashOf = docs.select(col("doc_id"), md5(col("text")).as("h"))
        .as[(Long, String)].collect().toMap
      assert(emitted.forall { case (h, rep) => hashOf(rep) == h })
    } finally q.stop()
  }
}
