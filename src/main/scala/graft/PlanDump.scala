package graft

/** Writes `.explain("formatted")` for each contract query to a directory —
  * the optimization-round evidence files (plans/r06/<query>_{before,after}.txt).
  * Usage: sbt "runMain graft.PlanDump <outDir> <suffix> [queryName ...]"
  *   SPARK_GRAFT_SF_DIR selects the data dir (default sf0.1 — the bench sf).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val only = args.drop(2).toSet
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try queries.Extraction.ensureCorpus(spark, sfDir) catch { case _: Throwable => }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
          System.err.println(s"[plan] wrote ${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plan] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
