package graft

import graft.core.Extractor
import graft.pipeline.SynthCorpus
import java.util.concurrent.atomic.AtomicLong

/** Raw-thread kernel microbench (no Spark): isolates JVM-level scaling of
  * corpus-gen + extraction from Spark scheduling/shuffle effects.
  * Usage: runMain graft.KernelBench [docsPerThread] [threads...]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val docsPerThread = if (args.length > 0) args(0).toInt else 2000
    val threadCounts = if (args.length > 1) args.drop(1).map(_.toInt) else Array(1, 8, 32)
    threadCounts.foreach { tc =>
      // warmup
      runOnce(tc, docsPerThread / 4)
      val (sec, n) = runOnce(tc, docsPerThread)
      println(f"threads=$tc%3d docs=$n rate=${n / sec}%.0f docs/s per-thread=${n / sec / tc}%.0f")
    }
  }

  private def runOnce(threads: Int, docsPerThread: Int): (Double, Long) = {
    val done = new AtomicLong
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var i = 0
        while (i < docsPerThread) {
          val d = SynthCorpus.mkDoc(t.toLong * 1000000 + i, 42L)
          val r = Extractor.extract(d.doc_id,
            d.spans.map(s => Extractor.Span(s.kind, s.text, s.media_ref, s.offset)))
          done.addAndGet(r.spans.length.toLong max 1L)
          i += 1
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, threads.toLong * docsPerThread)
  }
}
