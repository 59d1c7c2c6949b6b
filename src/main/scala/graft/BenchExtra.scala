package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostics (guide §1.4) — NOT the driver bench.
  *
  * For each named query: run it `reps` times warm under the bench-session
  * settings, timing the bench action (`count()`), and report per-rep
  * seconds plus the number of Spark jobs/stages each rep submitted and the
  * summed task time. The jobs/stages column separates "the operator is
  * expensive" from "the plan schedules many tiny stages" — at sf0.1 the
  * data is KBs and per-stage fixed costs dominate several ~1 s queries.
  *
  * Usage: `sbt "runMain graft.BenchExtra q_simhash_dedup q_merge_latest"`
  * (no args = the full headline set).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskMs += sc.stageInfo.taskMetrics.executorRunTime
      }
    })

    val names =
      if (args.nonEmpty) args.toSeq
      else Bench.headline
    // session warmup at the smallest SF (the bench does the same)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-22s reps(s) | jobs stages taskMs (last rep)")
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(spark.sparkContext, 30000)
        jobs = 0; stages = 0; taskMs = 0L
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(spark.sparkContext, 30000)
        s
      }
      println(f"$n%-22s ${times.map(t => f"$t%.2f").mkString(",")} | $jobs%4d $stages%6d $taskMs%6d")
    }
    spark.stop()
  }
}
