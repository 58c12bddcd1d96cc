package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.json north_rule: throughput
  * scaling efficiency ≥ 0.8 between N and 4N executors; sandbox protocol
  * per BASELINE.md: same job at local[N] vs local[4N] on identical input).
  *
  * Runs the extraction bench twice in one JVM — a fresh SparkSession per
  * parallelism level — on the same deterministic corpus and prints one JSON
  * line with docs/sec at both levels and
  * efficiency = throughput(4N) / (4 × throughput(N)).
  *
  * Usage: runMain graft.ScalingBench [nDocs] [N]   (defaults 40000, 8)
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp"))
      .config("spark.sql.shuffle.partitions", cores.toString)
      // extraction fuses the whole kernel into the scan stage, so scan
      // partitions must be sized by KERNEL cost, not by scan bytes: the
      // ~100 MB bench corpus would otherwise pack into ~5 tasks at the
      // 128 MB default and idle 27 of 32 cores (measured round 2)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 40000L
    val n = if (args.length > 1) args(1).toInt else 8

    def runAt(cores: Int, warm: Boolean): Double = {
      val spark = session(cores)
      if (warm) Bench.extractionBench(spark, math.max(nDocs / 4, 5000), cores)
      val sec = Bench.extractionBench(spark, nDocs, cores)._1
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      nDocs / sec
    }

    // The sandbox host is time-shared with noisy neighbors, so single runs
    // swing 5-10x. Protocol: rapid N/4N alternation; report (a) best
    // throughput per level and (b) the best ADJACENT-pair efficiency —
    // paired runs are seconds apart, minimizing load drift inside a pair.
    runAt(n, warm = true); runAt(4 * n, warm = true) // JIT warmup both levels
    val pairs = (1 to 4).map { _ =>
      val tn = runAt(n, warm = false)
      val t4n = runAt(4 * n, warm = false)
      (tn, t4n)
    }
    val tN = pairs.map(_._1).max
    val t4N = pairs.map(_._2).max
    val pairEffs = pairs.map { case (a, b) => b / (4.0 * a) }
    // conservative: efficiency from best-per-level (not best pair — a noisy
    // slow N run would inflate a pair ratio)
    val eff = t4N / (4.0 * tN)
    val pairsStr = pairs.map { case (a, b) => f"[$a%.0f,$b%.0f]" }.mkString("[", ",", "]")
    println(f"""{"bench":"scaling","docs":$nDocs,"cores_n":$n,"cores_4n":${4 * n},"docs_per_sec_n":$tN%.1f,"docs_per_sec_4n":$t4N%.1f,"efficiency":$eff%.3f,"pairs":$pairsStr,"pair_effs":${pairEffs.map(e => f"$e%.3f").mkString("[", ",", "]")}}""")
  }
}
