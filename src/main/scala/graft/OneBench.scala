package graft

import org.apache.spark.sql.SparkSession

/** Single-level extraction bench with CPU utilization report.
  * Usage: runMain graft.OneBench [nDocs] [cores]
  */
object OneBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.task.cpus", sys.env.getOrElse("SPARK_TASK_CPUS", "1"))
      .config("spark.sql.shuffle.partitions", cores.toString)
      // extraction fuses the whole kernel into the scan stage, so scan
      // partitions must be sized by KERNEL cost, not by scan bytes: the
      // ~100 MB bench corpus would otherwise pack into ~5 tasks at the
      // 128 MB default and idle 27 of 32 cores (measured round 2)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // affinity pinning is opt-in (SPARK_GRAFT_PIN=1), matching Bench: pinned
    // levels were measured operationally fragile on this host (a pinned JVM
    // can't migrate off a neighbor-stolen CPU), so the default protocol for
    // BOTH entry points is unpinned + ambient validation
    if (sys.env.get("SPARK_GRAFT_PIN").contains("1")) Bench.pinCpus(cores)
    Bench.extractionBench(spark, math.max(nDocs / 5, 5000), cores) // warmup
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    // total allocated bytes across live threads: constant alloc/doc with
    // rising CPU/doc isolates cycle-stretching (bandwidth/LLC contention)
    // from actual extra work
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    def allocBytes: Long = {
      val ids = tmx.getAllThreadIds
      tmx.getThreadAllocatedBytes(ids).filter(_ > 0).sum
    }
    val cpu0 = osBean.getProcessCpuTime
    val gc0 = gcMs
    val alloc0 = allocBytes
    val t0 = System.nanoTime()
    val (sec, ok) = Bench.extractionBench(spark, nDocs, cores)
    val wall = (System.nanoTime() - t0) / 1e9
    val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
    val gcSec = (gcMs - gc0) / 1e3
    val allocGb = (allocBytes - alloc0) / 1e9
    println(f"""{"bench":"one","docs":$nDocs,"cores":$cores,"docs_per_sec":${nDocs / sec}%.0f,"ok":$ok,"wall_sec":$wall%.2f,"cpu_sec":$cpuSec%.2f,"cpu_util_cores":${cpuSec / wall}%.1f,"gc_sec":$gcSec%.2f,"alloc_gb":$allocGb%.2f,"alloc_kb_per_doc":${allocGb * 1e6 / nDocs}%.1f}""")
    spark.stop()
  }
}
