package graft

import java.nio.file.Files
import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.crawl.Crawl
import graft.crawl.Crawl.CrawlConfig

/** Dev profiling: stage-level wall vs task-time breakdown of a crawl run. */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N", "150000").toLong
    val sides = sys.env.getOrElse("CPUS", "8").split(",").map(_.trim.toInt).toSeq
    sides.foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"dbg$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled",
          sys.env.getOrElse("GRAFT_AQE", "true"))
        .config("spark.hadoop.parquet.enable.dictionary",
          sys.env.getOrElse("GRAFT_PQ_DICT", "true"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Int, Long)]
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          val taskTime = si.taskMetrics.executorRunTime
          stages += ((si.stageId, si.name.take(60), wall, taskTime, si.numTasks,
            si.taskMetrics.jvmGCTime))
        }
      })

      // warmup
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      val wdir = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm/graftbench"), "w").toString
      Crawl.run(spark, CrawlConfig(7L, 3000L, 1000000, 4, 2, wdir))
      rm(new java.io.File(wdir))
      stages.clear()

      val work = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm/graftbench"), s"c$cpus").toString
      val t0 = System.nanoTime()
      val res = Crawl.run(spark, CrawlConfig(42L, n, 1000000, 4, 3, work))
      val sec = (System.nanoTime() - t0) / 1e9
      // tmpfs IS memory — leftover worlds from earlier runs contend with
      // the next run's heap
      rm(new java.io.File(work))
      Thread.sleep(500)
      val urls = res.map(_.scheduled).sum
      println(f"[c$cpus] $urls urls ${sec}%.2f s")
      val totalWall = stages.map(_._3).sum
      val totalTask = stages.map(_._4).sum
      val totalGc = stages.map(_._6).sum
      println(f"[c$cpus] stage wall sum=${totalWall / 1e3}%.2f s, task time sum=${totalTask / 1e3}%.2f s (ideal wall at $cpus cores=${totalTask / 1e3 / cpus}%.2f), gc sum=${totalGc / 1e3}%.2f s")
      stages.sortBy(-_._3).take(12).foreach { case (id, name, wall, task, nt, gc) =>
        println(f"[c$cpus]   stage $id%3d $name%-60s wall=${wall / 1e3}%6.2f s task=${task / 1e3}%7.2f s gc=${gc / 1e3}%6.2f s tasks=$nt")
      }
      spark.stop()
    }
  }
}
