package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.crawl.Crawl
import graft.crawl.Crawl.CrawlConfig

/** Driver-visible entry points for the crawl engine (rows-only checks —
  * the crawl world is synthesized in-engine, so DuckDB has no input table
  * to oracle against; exact-equality guarantees live in
  * graft.CrawlEqualitySpec against the single-threaded oracle). */
object CrawlQueries {

  /** One mini-crawl: 2 ticks over a 150-entity world; returns the crawled
    * page metadata (doc_id, status, spans counts live in pages/docs). */
  def crawlTick(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft-crawl-q").toString
    val cfg = CrawlConfig(seed = 42L, nEntities = 150L, budgetPerHost = 16,
      saltBuckets = 4, maxTicks = 2, workDir = work)
    Crawl.run(spark, cfg)
    spark.read.parquet(s"$work/pages")
  }

  /** The consolidated interleaved-document table (input_hint shape) after
    * a full mini-crawl: (doc_id, spans array<struct<kind,text,media_ref,offset>>). */
  def crawlDocs(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft-crawl-d").toString
    val cfg = CrawlConfig(seed = 42L, nEntities = 150L, budgetPerHost = 24,
      saltBuckets = 4, maxTicks = 12, workDir = work)
    Crawl.run(spark, cfg)
    Crawl.docsView(spark, work).toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_crawl_tick" -> (crawlTick _),
    "q_crawl_docs" -> (crawlDocs _))
}
