package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: one end-to-end mini-crawl tick (frontier → canon → dedup →
    * politeness → fetch → parse → spans). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CrawlQueries.crawlTick(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + the
    * training-data pipeline operators (dedup / ANN / text / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.all ++
      graft.ops.TextOps.queries ++
      graft.ops.DedupOps.queries ++
      graft.ops.AnnOps.queries ++
      graft.ops.MultimodalOps.queries ++
      graft.store.Cleanup.queries ++
      graft.queries.CrawlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.ops.TextOps.oracle ++
      graft.ops.DedupOps.oracle ++
      graft.ops.AnnOps.oracle ++
      graft.ops.MultimodalOps.oracle ++
      graft.store.Cleanup.oracle ++
      graft.queries.CrawlQueries.oracle
}
