package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streaming hourly agg equals the batch plan") {
    val streamed = StreamingOps.runHourlyAggBatchEquivalent(spark, sf0001)
      .orderBy("hour", "event_type").collect().toSeq
    val batch = graft.queries.Relational.hourlyAgg(spark, sf0001)
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("sessionization: counts and totals conserve events per user") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))
      .as[StreamingOps.Event]
    val sessions = StreamingOps.sessionize(events, gapMinutes = 30)
    // flatMapGroupsWithState in batch mode: emitted sessions are the CLOSED
    // ones; the trailing open session per user stays in state. So per user:
    // emitted events + (trailing session) == total events.
    val emitted = sessions.groupBy($"user_id".as("uid"))
      .agg(sum($"n_events").as("emitted"), count(lit(1)).as("n_sessions"))
    val totals = events.groupBy($"user_id".as("uid"))
      .agg(count(lit(1)).as("total"))
    val joined = totals.join(emitted, Seq("uid"), "left").collect()
    joined.foreach { r =>
      val total = r.getLong(1)
      val em = if (r.isNullAt(2)) 0L else r.getLong(2)
      assert(em <= total, s"user ${r.getLong(0)} emitted $em > total $total")
    }
    // sessions respect the gap: no session spans > 0 with internal gap —
    // verified structurally: started <= ended for all sessions
    val bad = sessions.filter($"started" > $"ended").count()
    assert(bad == 0)
    assert(sessions.count() > 0)
  }

  test("streaming frontier crawls the same world as the batch engine") {
    import java.nio.file.Files
    import graft.crawl.Crawl
    import graft.crawl.Crawl.CrawlConfig
    val seedDir = Files.createTempDirectory("graft-seeds")
    val work = Files.createTempDirectory("graft-stream-crawl").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val cfg = CrawlConfig(seed = 42L, nEntities = 200L, budgetPerHost = 1000,
      saltBuckets = 4, maxTicks = 10, workDir = work)
    // two seed drops covering the whole world in disjoint ranges
    Files.writeString(seedDir.resolve("drop1.txt"), "0,120\n")
    Files.writeString(seedDir.resolve("drop2.txt"), "120,200\n")
    val q = graft.streaming.StreamingCrawl.start(spark, cfg, seedDir.toString, ckpt)
    q.awaitTermination()

    // batch twin over the same world
    val workB = Files.createTempDirectory("graft-batch-twin").toString
    Crawl.run(spark, cfg.copy(workDir = workB))

    val seenS = spark.read.parquet(Crawl.seenDir(work))
      .select($"url").collect().map(_.getString(0)).toSet
    val seenB = spark.read.parquet(Crawl.seenDir(workB))
      .select($"url").collect().map(_.getString(0)).toSet
    assert(seenS == seenB)
    val docsS = Crawl.docsView(spark, work).collect()
      .map(d => d.doc_id -> d.spans).toMap
    val docsB = Crawl.docsView(spark, workB).collect()
      .map(d => d.doc_id -> d.spans).toMap
    assert(docsS == docsB)

    // the candidate set was materialized ONCE and served both micro-batches
    // (no full-world frontier recompute per batch — the scale contract)
    val candDir = new java.io.File(s"$work/candidates")
    assert(candDir.exists && candDir.isDirectory)
    assert(spark.read.parquet(candDir.getPath).count() ==
      Crawl.candidateUnits(spark, cfg).count())
  }
}
