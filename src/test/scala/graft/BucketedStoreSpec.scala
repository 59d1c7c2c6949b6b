package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.MergeStore

/** The bucketed-snapshot scale path: after `snapshotBucketed`, every
  * key-clustered operator over the store (keep-latest window, doc-keyed
  * SMJ, groupBy-key agg) must plan with ZERO Exchange on the snapshot
  * side — the one-time bucketed write amortizes the store-wide shuffle
  * across all later runs (the Iceberg bucket-transform role at 100 TB).
  * A plain-parquet negative control proves the assertions aren't vacuous.
  */
class BucketedStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fresh() = Files.createTempDirectory("graft-bstore").toString

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.explainString(FormattedMode)
      .linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))

  // three generations over 600 (id, lang) keys: updates + late inserts
  private lazy val dir: String = {
    val d = fresh()
    MergeStore.ingest(
      (0L until 400L).map(i => (i, if (i % 3 == 0) "fr" else "en",
        s"t$i-g0", s"c$i", if (i % 5 == 0) null else s"img$i"))
        .toDF("id", "lang", "title", "dat_creat", "main_image"), d)
    MergeStore.ingest(
      (100L until 500L).map(i => (i, if (i % 3 == 0) "fr" else "en",
        s"t$i-g1", s"c$i-late", null: String))
        .toDF("id", "lang", "title", "dat_creat", "main_image"), d)
    MergeStore.ingest(
      (300L until 600L).map(i => (i, if (i % 3 == 0) "fr" else "en",
        s"t$i-g2", s"c$i-later", s"img$i-new"))
        .toDF("id", "lang", "title", "dat_creat", "main_image"), d)
    d
  }

  private val keys = Seq("id", "lang")

  private def rows(df: DataFrame): Set[(Long, String, String, String, String)] =
    df.select("id", "lang", "title", "dat_creat", "main_image").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4))).toSet

  test("bucketed snapshot holds exactly the merged view's rows") {
    val snap = MergeStore.snapshotBucketed(spark, dir, "pages_bucketed", 8,
      keys, creationCols = Seq("dat_creat"), stickyCols = Seq("main_image"))
    val plain = MergeStore.mergedView(spark, dir, keys,
      creationCols = Seq("dat_creat"), stickyCols = Seq("main_image"))
    assert(rows(snap) == rows(plain))
    assert(snap.count() == 600)
  }

  test("keep-latest window over the snapshot plans with ZERO exchange") {
    val snap = spark.table("pages_bucketed")
    val w = Window.partitionBy("id", "lang").orderBy(desc("title"))
    val q = snap.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(exchanges(q) == 0,
      q.queryExecution.explainString(FormattedMode))
    assert(q.count() == 600) // and it still executes correctly
  }

  test("doc-keyed self-join is an exchange-free sort-merge join; plain parquet control shuffles") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val snap = spark.table("pages_bucketed")
      val j = snap.as("a").join(snap.as("b"), keys)
        .select($"a.id", $"a.lang", $"a.title", $"b.main_image")
      val p = j.queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      assert(exchanges(j) == 0, p)
      assert(j.count() == 600)

      // negative control: same data as plain (unbucketed) parquet must
      // shuffle BOTH sides into the join
      val plainDir = fresh() + "/plain"
      snap.write.parquet(plainDir)
      val plain = spark.read.parquet(plainDir)
      val cj = plain.as("a").join(plain.as("b"), keys)
        .select($"a.id", $"a.lang", $"a.title", $"b.main_image")
      assert(exchanges(cj) >= 2,
        cj.queryExecution.explainString(FormattedMode))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy-key aggregation over the snapshot plans with ZERO exchange") {
    val snap = spark.table("pages_bucketed")
    val q = snap.groupBy("id", "lang").agg(count(lit(1)).as("n"))
    assert(exchanges(q) == 0,
      q.queryExecution.explainString(FormattedMode))
    assert(q.count() == 600)
  }

  test("delta merge telescopes over the snapshot and shuffles ONLY the delta") {
    val d2 = fresh()
    def g(gen: Int, lo: Long, hi: Long) =
      (lo until hi).map(i => (i, if (i % 3 == 0) "fr" else "en",
        s"t$i-g$gen", s"c$i-g$gen",
        if ((i + gen) % 4 == 0) null else s"img$i-g$gen"))
        .toDF("id", "lang", "title", "dat_creat", "main_image")
    MergeStore.ingest(g(0, 0, 300), d2)
    MergeStore.ingest(g(1, 100, 400), d2)
    MergeStore.ingest(g(2, 250, 500), d2)
    val base = MergeStore.snapshotBucketed(spark, d2, "pages_delta_base", 8,
      keys, creationCols = Seq("dat_creat"), stickyCols = Seq("main_image"))
    val delta = g(3, 350, 650) // updates 350..500, fresh inserts 500..650
    MergeStore.ingest(delta, d2)

    // telescoping: one delta step over the resolved base ≡ the full
    // 4-generation merge (creation, sticky, and latest-wins-with-null)
    val expect = MergeStore.mergedView(spark, d2, keys,
      creationCols = Seq("dat_creat"), stickyCols = Seq("main_image"))
    val got = MergeStore.mergeDelta(base, delta, keys,
      creationCols = Seq("dat_creat"), stickyCols = Seq("main_image"))
    assert(rows(got) == rows(expect))
    assert(got.count() == 650)

    // plan: the bucketed base side is EXCHANGE-FREE; the single exchange
    // is the delta shuffling into the base's bucket partitioning —
    // per-tick merge cost is O(delta), not O(store)
    val p = got.queryExecution.explainString(FormattedMode)
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
    assert(exchanges(got) == 1, p)
  }

  test("crawl docs compaction: bucketed docs table ≡ docsView; doc-keyed agg exchange-free") {
    import graft.crawl.Crawl
    import graft.crawl.Crawl.CrawlConfig
    val work = fresh()
    Crawl.run(spark, CrawlConfig(seed = 42L, nEntities = 250L,
      budgetPerHost = 24, saltBuckets = 4, maxTicks = 40, workDir = work))
    val docs = Crawl.compactDocs(spark, work, "docs_bucketed_t", 8)
    val expect = Crawl.docsView(spark, work).collect().map(d => (d.doc_id, d.spans)).toSet
    assert(docs.collect().map(d => (d.doc_id, d.spans)).toSet == expect)
    assert(expect.nonEmpty)
    // the compacted table's doc-keyed consumers plan exchange-free
    val agg = spark.table("docs_bucketed_t")
      .select($"doc_id", explode($"spans").as("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    assert(exchanges(agg) == 0,
      agg.queryExecution.explainString(FormattedMode))
  }

  test("incremental docs view: compact mid-crawl, fold later ticks as O(delta)") {
    import graft.crawl.Crawl
    import graft.crawl.Crawl.CrawlConfig
    val work = fresh()
    val cfg = CrawlConfig(seed = 42L, nEntities = 250L,
      budgetPerHost = 24, saltBuckets = 4, maxTicks = 2, workDir = work)
    Crawl.run(spark, cfg)
    val base = Crawl.compactDocs(spark, work, "docs_inc_t", 8)
    val baseCount = base.count()
    Crawl.run(spark, cfg.copy(maxTicks = 40)) // resume completes the crawl

    val inc = Crawl.docsViewIncremental(spark, work, "docs_inc_t")
    // plan captured BEFORE execution: a ran AQE plan prints Final+Initial
    // and would double-count exchanges
    val p = inc.toDF.queryExecution.explainString(FormattedMode)
    val full = Crawl.docsView(spark, work)
    assert(inc.collect().map(d => (d.doc_id, d.spans)).toSet ==
      full.collect().map(d => (d.doc_id, d.spans)).toSet)
    assert(inc.count() > baseCount) // the resume really added docs
    // the base side reads the bucketed table (no exchange to re-cluster it)
    assert(p.contains("Bucketed: true"), p)
    // the delta scan prunes to post-watermark tick partitions only
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("tick")), p)
    // every exchange belongs to the delta leg (its window + the fold's
    // re-cluster into the base's buckets); the base never shuffles
    val ex = p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
    assert(ex <= 2, s"expected at most 2 delta-side exchanges, got $ex:\n$p")
  }

  test("re-snapshot after a new generation replaces the table in place") {
    MergeStore.ingest(Seq((0L, "fr", "t0-g3", "c-new", null: String))
      .toDF("id", "lang", "title", "dat_creat", "main_image"), dir)
    val snap = MergeStore.snapshotBucketed(spark, dir, "pages_bucketed", 8,
      keys, creationCols = Seq("dat_creat"), stickyCols = Seq("main_image"))
    val r = snap.filter($"id" === 0L && $"lang" === "fr").collect()
    assert(r.length == 1 && r.head.getAs[String]("title") == "t0-g3")
    // creation column still the FIRST generation's value
    assert(r.head.getAs[String]("dat_creat") == "c0")
    assert(snap.count() == 600)
  }
}
