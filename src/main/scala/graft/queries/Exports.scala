package graft.queries

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ColSyntax._
import graft.crawl.Crawl
import graft.ops.MultimodalOps
import graft.synth.World

/** Verify-time parquet exports giving DuckDB an independent view of the
  * engine-internal tables (flattened crawl world, media metadata), so the
  * crawl-view / writeback / media queries get HARD oracle rows instead of
  * rows-only checks. The oracle SQL references these via the `__EXPORT__`
  * token, which graft.Verify rewrites to the actual outDir. */
object Exports {

  // NOTE on the coalesce(1)s below: they are VERIFY-ONLY plumbing — one
  // file per export keeps the DuckDB oracle's read_parquet glob simple at
  // sf0.01 scale. This is NOT an engine pattern: engine code never
  // single-partitions a result (see Crawl/MergeStore write paths, which
  // stay partitioned and use maxRecordsPerFile for bounded files).
  def writeAll(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val work = CrawlQueries.sharedCrawl(spark)
    val pages = spark.read.parquet(s"$work/pages")

    // lang rank by World.langs order (the reference's per-entity language
    // processing order) — lets the writeback oracle pick the last writer
    val langRank = World.langs.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (l, i)) =>
        when(substring_index($"doc_id", ":", -1) === l, lit(i)).otherwise(acc)
      }

    pages.select(
      $"doc_id", $"url", $"host", $"family", $"title",
      $"sortKey".as("sort_key"), $"salt",
      $"httpStatus".as("http_status"), $"success",
      $"hasContent".as("has_content"),
      $"mainImageUrl".as("main_image_url"),
      $"formatLine".as("format_line"),
      size($"spans").as("n_spans"),
      langRank.as("lang_rank"),
      $"tick")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_crawl_pages")

    pages.filter($"hasContent")
      .select($"doc_id", explode($"spans").as("s"))
      .select($"doc_id", $"s.kind".as("kind"), $"s.text".as("text"),
        $"s.media_ref".as("media_ref"), $"s.offset".as("offset"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_crawl_spans")

    pages.filter($"hasContent")
      .select($"doc_id", explode($"sections").as("sec"))
      .select($"doc_id", $"sec.display_order".as("display_order"),
        $"sec.title".as("title"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_crawl_sections")

    Crawl.candidateUnits(spark, CrawlQueries.sharedCfg).toDF()
      .select($"qid", $"lang", $"family", $"docId".as("doc_id"),
        $"sortKey".as("sort_key"), $"url", $"host", $"title")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_crawl_frontier")

    MultimodalOps.exportMediaMeta(spark, sfDir)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_media_meta")

    MultimodalOps.exportMediaBytes(spark, sfDir)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_media_bytes")

    // signature tables for the dedup/ANN oracles: DuckDB independently
    // recomputes everything DOWNSTREAM of the kernel (banding recall,
    // all-pairs Hamming, probe ring + ranking); the kernels themselves are
    // sbt ground-truthed (OpsSpec: brute-force equality / property tests)
    graft.ops.DedupOps.simhashSigs(spark, sfDir)
      .toDF("doc_id", "simhash")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_simhash")

    graft.ops.AnnOps.lshBucketAssignments(spark, sfDir)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_lsh_buckets")

    // fingerprint table: DuckDB lacks xxhash64, so the hard check is on
    // the CLASS STRUCTURE — the q_fingerprint oracle asserts the
    // fingerprint equality classes coincide (both directions) with
    // md5(normalized text) classes it computes independently, which
    // verifies the normalization AND collision-freedom at test scale
    graft.ops.TextOps.fingerprint(spark, sfDir)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/export_fingerprint")
  }
}
