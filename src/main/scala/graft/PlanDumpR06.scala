package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round plan capture: writes `plans/r06/<query>_<tag>.txt`
  * with the `explain("formatted")` output of each inspected query, under
  * the SAME session settings as [[Bench]] (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on, UTC) so the captured plans are the
  * bench plans. Detached dedup/ANN results are local relations, so their
  * *Planned (pre-detach) frames are dumped instead — that is the plan the
  * work actually runs.
  *
  * Usage: `sbt "runMain graft.PlanDumpR06 <tag>"` (tag = before/after).
  */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)

    def dump(name: String, df: DataFrame, caches: Seq[DataFrame] = Nil): Unit = {
      val p = df.queryExecution.explainString(FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), p)
      caches.foreach(_.unpersist())
      println(s"dumped $name ($tag)")
    }

    // plain (non-detached) headline queries: the returned frame IS the plan
    val plain = Seq(
      "q1_agg", "q_precedence_dedup", "q_keep_latest", "q_freq_agg",
      "q_hourly_agg", "q_curation", "q_ann_brute", "q_ann_lsh", "q_ann_ivf",
      "q_merge_latest")
    plain.foreach(n => dump(n, SparkEntry.queries(n)(spark, sfDir)))

    // detached dedup ops: dump the pre-detach plan
    {
      val (caches, planned) =
        graft.ops.DedupOps.minhashPairsPlanned(spark, sfDir, 16, 4, 0.8)
      dump("q_minhash_dedup", planned, caches)
    }
    {
      val (caches, planned) =
        graft.ops.DedupOps.winnowPairsPlanned(spark, sfDir, 24, 16, 1, 32, 0.8)
      dump("q_winnow_dedup", planned, caches)
    }
    {
      val (docs, planned) =
        graft.ops.DedupOps.ngramJaccardPlanned(spark, sfDir, 0.5, 32)
      dump("q_ngram_jaccard", planned, Seq(docs))
    }
    {
      val (banded, planned) =
        graft.ops.DedupOps.simhashDedupPlanned(spark, sfDir, 3)
      dump("q_simhash_dedup", planned, Seq(banded))
    }
    {
      val (emb, planned) =
        graft.ops.DedupOps.embeddingNearDupPlanned(spark, sfDir, 0, 0.9)
      dump("q_embedding_neardup", planned, Seq(emb))
    }

    // the crawl batch plan (candidate synthesis -> politeness selection),
    // AQE off as Crawl.run sets it for the crawl job
    {
      import graft.crawl.Crawl
      val cfg = Crawl.CrawlConfig(seed = 42L, nEntities = 200L,
        budgetPerHost = 64, saltBuckets = 4, maxTicks = 1, workDir = "")
      val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try dump("crawl_batch", Crawl.selectBatch(
        Crawl.candidateUnits(spark, cfg), cfg.budgetPerHost, cfg.saltBuckets))
      finally spark.conf.set("spark.sql.adaptive.enabled", before)
    }
    spark.stop()
  }
}
