package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual contract queries in a quiet window.
  * `sbt "runMain graft.DevTime dedup_components"` — warms at sf0.001,
  * then two timed rounds at SPARK_GRAFT_SF_DIR (default sf0.1), noop-forced
  * like Bench so nothing prunes.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try Bench.evaluate(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case e: Throwable => println(s"warm $n: $e") }
    }
    (1 to 2).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        Bench.evaluate(SparkEntry.queries(n)(spark, dir))
        println(f"round$round $n%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
