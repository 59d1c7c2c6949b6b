package graft

/** Raw (no Spark) memory-BANDWIDTH scaling probe: each thread streams its
  * own 256 MB array (two summing passes — fixed work PER THREAD), so with
  * perfect scaling the wall-clock stays flat as threads grow and any rise
  * is contention for the shared memory subsystem. The complement to
  * [[RawBench]] (the compute kernel): RawBench shows where CPUs stop
  * helping, MemBench shows where the BUS stops helping — [[KneeMain]]
  * records both next to the crawl job's task-time inflation to attribute
  * the scaling knee.
  *
  * Prints one parseable line per run: `MEMBENCH threads=N sec=S`.
  * THREADS env = comma-separated plan (default "1,1").
  */
object MemBench {
  private final val Words = 1 << 25 // 256 MB of longs per thread

  def main(args: Array[String]): Unit = {
    val plan = sys.env.getOrElse("THREADS", "1,1")
      .split(",").map(_.trim.toInt)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    def run(threads: Int): Unit = {
      // per-thread private arrays: no cache-line sharing, pure streaming
      val arrays = Array.fill(threads) {
        val a = new Array[Long](Words)
        var i = 0
        while (i < a.length) { a(i) = i.toLong * 0x9E3779B97F4A7C15L; i += 1 }
        a
      }
      val t0 = System.nanoTime()
      val ts = arrays.map { a =>
        new Thread(() => {
          var s = 0L
          var pass = 0
          while (pass < 2) {
            var i = 0
            while (i < a.length) { s += a(i); i += 1 }
            pass += 1
          }
          sink.addAndGet(s)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println("MEMBENCH threads=" + threads + " sec=" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec)))
    }
    plan.foreach(run)
    System.err.println(s"sink=${sink.get}") // defeat dead-code elimination
  }
}
