package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper bench (guide §1.4): times INDIVIDUAL contract
  * queries through the same noop-sink methodology as [[Bench]]'s query phase
  * (same session config, same sf dir / cpu env contract), but with
  * per-query repeats and a name filter for fast iteration. Never used by
  * the driver; numbers quoted in OPTIMIZATION_r06.md cite this main.
  *
  * Usage: sbt "runMain graft.BenchExtra [queryName ...]"
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench;
  *   SPARK_GRAFT_EXTRA_REPEATS (default 3) timed runs per query.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    val s = Bench.withTmpfsLocalDir(b).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPEATS", "3").toInt
    val only = args.toSet
    val spark = session(cpus)
    // phase-0 parity with Bench: expectation parquets + contract corpus are
    // materialized untimed so the first extract_* query isn't billed for them
    try queries.Extraction.ensureExpectation(spark, sfDir) catch { case _: Throwable => }
    try queries.Extraction.ensureMediaExpectation(spark, sfDir) catch { case _: Throwable => }
    try queries.TextAnalysis.ensureBoilerplateExpectation(spark, sfDir) catch { case _: Throwable => }
    try queries.Extraction.ensureCorpus(spark, sfDir) catch { case _: Throwable => }

    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.isEmpty || only(n) }
      .sortBy(_._1)
    // JIT warm on the tiny sf (same as Bench's query phase)
    selected.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"warm:$name")
      try Bench.evaluate(fn(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => }
    }
    val results = selected.map { case (name, fn) =>
      val samples = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"$name#$i")
        val t0 = System.nanoTime()
        try Bench.evaluate(fn(spark, sfDir)) catch {
          case e: Throwable => System.err.println(s"[extra] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = samples(samples.length / 2)
      System.err.println(f"[extra] $name%-32s min ${samples.head}%.3f med $med%.3f")
      name -> (samples.head, med)
    }
    val total = results.map(_._2._2).sum
    val qs = results.map { case (k, (mn, md)) => f""""$k":{"min":$mn%.3f,"med":$md%.3f}""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"extra","total_med":$total%.3f,"repeats":$repeats,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
