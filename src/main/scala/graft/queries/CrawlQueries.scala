package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.crawl.{Crawl, Fetcher, Views}
import graft.crawl.Crawl.CrawlConfig

/** Driver-visible entry points for the crawl engine (rows-only checks —
  * the crawl world is synthesized in-engine, so DuckDB has no input table
  * to oracle against; exact-equality guarantees live in
  * graft.CrawlEqualitySpec against the single-threaded oracle). */
object CrawlQueries {

  /** One full mini-crawl shared by the view queries below (memoized per
    * JVM: the world is deterministic, one crawl serves all views). */
  @volatile private var shared: Option[String] = None
  private def sharedCrawl(spark: SparkSession): String = synchronized {
    shared.getOrElse {
      val work = Files.createTempDirectory("graft-crawl-shared").toString
      Crawl.run(spark, CrawlConfig(seed = 42L, nEntities = 400L,
        budgetPerHost = 64, saltBuckets = 4, maxTicks = 12, workDir = work))
      shared = Some(work)
      work
    }
  }

  /** One mini-crawl tick batch: 2 ticks over a 150-entity world. */
  def crawlTick(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft-crawl-q").toString
    val cfg = CrawlConfig(seed = 42L, nEntities = 150L, budgetPerHost = 16,
      saltBuckets = 4, maxTicks = 2, workDir = work)
    Crawl.run(spark, cfg)
    spark.read.parquet(s"$work/pages")
  }

  /** The consolidated interleaved-document table (input_hint shape):
    * (doc_id, spans array<struct<kind,text,media_ref,offset>>). */
  def crawlDocs(spark: SparkSession, dir: String): DataFrame =
    Crawl.docsView(spark, sharedCrawl(spark)).toDF()

  /** Gallery view with IS_MAIN_IMAGE flag + thumbnail derivation (J4/F7). */
  def crawlImages(spark: SparkSession, dir: String): DataFrame =
    Views.imagesView(spark, sharedCrawl(spark))

  /** Titled sections view (the reference's SECTION table shape). */
  def crawlSections(spark: SparkSession, dir: String): DataFrame =
    Views.sectionsView(spark, sharedCrawl(spark))

  /** A7 — shared-image frequency report (decoration detector input). */
  def crawlImageFreq(spark: SparkSession, dir: String): DataFrame =
    Views.imageFrequencyReport(spark, sharedCrawl(spark))

  /** C7 — single-unit refresh: the one-Qid pipeline, no checkpoint writes
    * (wikipedia_functions.py:76-145). Picks a qid deterministically from
    * the world and fetches just that entity's units. */
  def refreshOne(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cfg = CrawlConfig(seed = 42L, nEntities = 400L, budgetPerHost = 64,
      saltBuckets = 4, maxTicks = 1, workDir = "")
    val seed = cfg.seed
    val one = Crawl.candidateUnits(spark, cfg)
      .orderBy($"sortKey").limit(4) // the first entity's units in crawl order
    one.mapPartitions(_.map { u =>
      val p = Fetcher.fetchParse(seed, u.qid, u.lang, u.title, u.family,
        u.url, u.host)
      (p.result.doc_id, p.result.httpStatus, p.result.success,
        p.result.spans.length)
    }).toDF("doc_id", "http_status", "success", "n_spans")
  }

  /** A3/F16 — per-language docs + main-image counts over crawl output. */
  def crawlLangSummary(spark: SparkSession, dir: String): DataFrame =
    Views.langSummary(spark, sharedCrawl(spark))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_crawl_tick" -> (crawlTick _),
    "q_crawl_lang_summary" -> (crawlLangSummary _),
    "q_crawl_docs" -> (crawlDocs _),
    "q_crawl_images" -> (crawlImages _),
    "q_crawl_sections" -> (crawlSections _),
    "q_crawl_image_freq" -> (crawlImageFreq _),
    "q_refresh_one" -> (refreshOne _))
}
