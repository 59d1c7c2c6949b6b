package graft

import org.apache.spark.sql.SparkSession

import graft.crawl.Crawl
import graft.crawl.Crawl.CrawlConfig

/** Phase-timed single crawl run (dev probe): `GRAFT_PHASE_TIMING=1 sbt
  * "runMain graft.CrawlProbe <cores> <entities>"` — prints per-phase
  * wall-clock so N-vs-4N efficiency regressions are attributable to a
  * stage instead of guessed at. */
object CrawlProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val n = if (args.length > 1) args(1).toLong else 300000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_CODEC", "snappy"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT warmup
    Crawl.run(spark, CrawlConfig(seed = 7L, nEntities = 4000L,
      budgetPerHost = 1000000, saltBuckets = 4, maxTicks = 2,
      workDir = java.nio.file.Files.createTempDirectory("probe-w").toString))
    (1 to 2).foreach { rep =>
      val work = java.nio.file.Files.createTempDirectory("probe").toString
      val t0 = System.nanoTime()
      val res = Crawl.run(spark, CrawlConfig(seed = 42L, nEntities = n,
        budgetPerHost = 1000000, saltBuckets = 4, maxTicks = 3, workDir = work))
      val sec = (System.nanoTime() - t0) / 1e9
      val urls = res.map(_.scheduled).sum
      println(f"[probe] rep=$rep cores=$cores n=$n urls=$urls sec=$sec%.2f thr=${urls / sec}%.0f")
    }
    spark.stop()
  }
}
