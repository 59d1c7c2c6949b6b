package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

import graft.crawl.Crawl
import graft.crawl.Crawl.CrawlConfig

/** One forked crawl-bench rep (spawned by [[Bench]], one JVM per rep).
  *
  * Why a fork per rep instead of per-rep SparkSessions in one JVM:
  *  1. JVM-global thread pools are sized from the MACHINE's 32 cores, so
  *     an in-process local[2] rep got ~23 ParallelGC worker threads — free
  *     help a real 2-core executor node does not have, which deflates the
  *     measured N-vs-4N efficiency. `-XX:ActiveProcessorCount=N` in the
  *     fork sizes GC/JIT/common pools to the node being simulated.
  *  2. Reps in a shared JVM inherit its heap history: after the sf0.1
  *     query bench ran first, every crawl rep measured ~25% slower with
  *     identical binaries (grown fragmented heap + adapted-down GC
  *     sizing; even the idle memory probe read 3x slower). A fresh JVM
  *     per rep makes reps independent samples.
  *
  * args: cpus, nEntities, warmEntities. Prints one line:
  * `CRAWLREP urls=<n> sec=<s>`.
  */
object CrawlRepMain {
  private def benchTmp(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    Files.createTempDirectory(base, prefix).toString
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  /** Per-stage task-time totals for the TIMED window (GRAFT_STAGE_STATS=1;
    * used by [[KneeMain]]): registered after warmup, sums executorRunTime
    * by stage. Task-time is the scaling-attribution signal — the same
    * deterministic work at N cores taking more total task-ms than at 1
    * core is per-core slowdown (memory-bus contention), not scheduling. */
  private final class StageStats extends org.apache.spark.scheduler.SparkListener {
    val taskMs = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val tasks = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val names = scala.collection.concurrent.TrieMap.empty[Int, String]
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (te.taskMetrics != null) {
        taskMs.updateWith(te.stageId)(v =>
          Some(v.getOrElse(0L) + te.taskMetrics.executorRunTime))
        tasks.updateWith(te.stageId)(v => Some(v.getOrElse(0) + 1))
      }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      names.put(sc.stageInfo.stageId, sc.stageInfo.name.takeWhile(_ != '\n'))
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nEntities = args(1).toLong
    val warmEntities = args(2).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-crawlrep-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // JIT warmup: the fork is cold, so the whole pipeline runs once on a
      // small world before the timed window
      val warmDir = benchTmp(s"graft-rep-w$cpus")
      Crawl.run(spark, CrawlConfig(seed = 7L, nEntities = warmEntities,
        budgetPerHost = 1000000, saltBuckets = 4, maxTicks = 2,
        workDir = warmDir))
      deleteRec(new java.io.File(warmDir))

      val stats =
        if (sys.env.contains("GRAFT_STAGE_STATS")) {
          val s = new StageStats
          spark.sparkContext.addSparkListener(s)
          Some(s)
        } else None

      val work = benchTmp(s"graft-rep-c$cpus")
      val cfg = CrawlConfig(seed = 42L, nEntities = nEntities,
        budgetPerHost = 1000000, saltBuckets = 4, maxTicks = 3,
        workDir = work)
      val t0 = System.nanoTime()
      val res = Crawl.run(spark, cfg)
      val sec = (System.nanoTime() - t0) / 1e9
      val urls = res.map(_.scheduled).sum
      deleteRec(new java.io.File(work))
      // Locale.ROOT: this line is parsed back by Bench.crawlRep — a
      // comma-decimal default locale would print sec=12,345 and break it
      println("CRAWLREP urls=" + urls + " sec=" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec)))
      stats.foreach { s =>
        // listener bus is async: drain it DETERMINISTICALLY before reading
        // the totals (a fixed sleep was a race — task-end events arriving
        // after it were silently dropped from the attribution series)
        org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(
          spark.sparkContext, 60000L)
        val entries = s.taskMs.toSeq.sortBy(-_._2).map { case (id, ms) =>
          val name = s.names.getOrElse(id, "?").replace("\"", "'")
          s"""{"stage":$id,"name":"$name","taskMs":$ms,"tasks":${s.tasks.getOrElse(id, 0)}}"""
        }
        println("CRAWLSTAGES [" + entries.mkString(",") + "]")
      }
    } finally spark.stop()
  }
}
