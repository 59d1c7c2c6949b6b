package graft

import java.util.concurrent.atomic.AtomicLong
import graft.synth.World
import graft.crawl.Fetcher

/** Raw (no Spark) multithreaded fetchParse scaling probe. */
object RawBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N", "40000").toInt
    // pre-generate the unit list once
    val units = (0L until n.toLong).flatMap { i =>
      val e = World.entity(42L, i)
      e.sitelinks.toSeq.sortBy(_._1).take(1).map { case (l, t) =>
        (e.qid, l, t, e.family)
      }
    }.toArray
    println(s"units=${units.length}")
    def run(threads: Int): Double = {
      val idx = new AtomicLong(0)
      val spanCount = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < units.length) {
            val (q, l, t, f) = units(i.toInt)
            val p = Fetcher.fetchParse(42L, q, l, t, f, s"https://x/$q/$l", "h")
            spanCount.addAndGet(p.result.spans.size.toLong)
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads: ${units.length} units in $sec%.2f s = ${units.length / sec}%.0f u/s (spans=${spanCount.get})")
      // machine-parseable (Locale.ROOT) — consumed by KneeMain forks
      println("RAWBENCH threads=" + threads + " sec=" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec)))
      sec
    }
    val plan = sys.env.getOrElse("THREADS", "8,32,8,32,1")
      .split(",").map(_.trim.toInt)
    plan.foreach(run)
  }
}
