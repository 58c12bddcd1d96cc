package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints the formatted plan of each contract query and
  * flags scale hazards (missing pushdown, unexpected full-column scans,
  * missing broadcasts, cartesian products).
  * Usage: runMain graft.PlanCheck [sfDir]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val scans = "Scan parquet.*ReadSchema: [^\n]*".r.findAllIn(
          df.queryExecution.toString).toList
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(
          df.queryExecution.toString).toList
        val flags = Seq(
          if (plan.contains("CartesianProduct") && !name.contains("knn") &&
            !name.contains("cosine")) Some("CARTESIAN") else None,
          if (plan.contains("SortMergeJoin")) Some("SMJ") else None,
          if (plan.contains("BroadcastHashJoin")) Some("BHJ") else None,
          if (plan.contains("Exchange")) Some("SHUFFLE") else None
        ).flatten.mkString(",")
        println(s"== $name [$flags]")
        scans.foreach(s => println(s"   $s"))
        pushed.filter(_.length > 17).foreach(p => println(s"   $p"))
      } catch { case e: Throwable => println(s"== $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
