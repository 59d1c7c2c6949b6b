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
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Int)]
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          val taskTime = si.taskMetrics.executorRunTime
          stages += ((si.stageId, si.name.take(60), wall, taskTime, si.numTasks))
        }
      })

      // warmup
      Crawl.run(spark, CrawlConfig(7L, 3000L, 1000000, 4, 2,
        Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm/graftbench"), "w").toString))
      stages.clear()

      val work = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm/graftbench"), s"c$cpus").toString
      val t0 = System.nanoTime()
      val res = Crawl.run(spark, CrawlConfig(42L, n, 1000000, 4, 3, work))
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val urls = res.map(_.scheduled).sum
      println(f"[c$cpus] $urls urls ${sec}%.2f s")
      val totalWall = stages.map(_._3).sum
      val totalTask = stages.map(_._4).sum
      println(f"[c$cpus] stage wall sum=${totalWall / 1e3}%.2f s, task time sum=${totalTask / 1e3}%.2f s (ideal wall at $cpus cores=${totalTask / 1e3 / cpus}%.2f)")
      stages.sortBy(-_._3).take(12).foreach { case (id, name, wall, task, nt) =>
        println(f"[c$cpus]   stage $id%3d $name%-60s wall=${wall / 1e3}%6.2f s task=${task / 1e3}%7.2f s tasks=$nt")
      }
      spark.stop()
    }
  }
}
