package graft.store

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ColSyntax._
import graft.crawl.Views
import graft.parse.UiChrome
import graft.queries.Tables.t

/** The reference's cleanup migrations as engine operators — the detector is
  * an aggregation, the APPLY is a MergeStore generation (or a hard row
  * delete), and BOTH emit the post-apply state so the survive-guard is
  * oracle-checked alongside the clear:
  *
  *  - `migrations/clear_shared_main_images.py:96-155`: a main image claimed
  *    by ≥ min DISTINCT entities is decoration, not a portrait — clear it
  *    to '' (empty string, NOT NULL: the reference's upsert layer never
  *    blanks on NULL, so its migration bypasses it with a raw UPDATE to '';
  *    our sticky-merge semantics reproduce exactly that — a clearing
  *    generation's '' wins as the latest NON-NULL value, while a NULL
  *    would be ignored);
  *  - the migration's own guard: sub-threshold rows (unique images, or
  *    images shared by a FEW entities — a real flag photo) must SURVIVE
  *    the apply, which is why the gallery table is deliberately NOT a
  *    frequency target there (clear_shared_main_images.py:60-75);
  *  - `migrations/clear_ui_chrome_images.py`: gallery rows whose filename
  *    matches the UI-chrome batteries are hard-DELETED — soft-delete is
  *    wrong on that table because the reference's DELETED flag is
  *    insert-only, so a tombstone would permanently mask a later
  *    legitimate image at the same display slot (its docstring makes the
  *    same argument). Known-lookalike filenames (the Crystal false
  *    positives of the first production dry run) must survive.
  */
object Cleanup {

  /** Frequency threshold: an image "shared" by ≥ minShared distinct docs
    * is decoration (the reference defaults to 25 at production scale).
    * Derived from the documents count so BOTH planted pools stay on the
    * intended sides of the threshold at ANY SF — a fixed 10 was tuned to
    * the 500-doc world and would silently invert the "sub-threshold
    * shared must survive" guard once the dup pools (~n/219 docs each)
    * crossed it (n ≳ 2200). shared pools are ~n/15 docs; ceil(n/60) sits
    * between with ~4× margin on each side, floored at the 500-doc
    * world's reference-like 10. Mirrored in SQL by [[minSharedSql]]. */
  def minShared(nDocs: Long): Long = math.max(10L, (nDocs + 59) / 60)

  /** The same threshold as a DuckDB scalar over the `documents` table. */
  private val minSharedSql =
    "greatest(10, (SELECT (count(*) + 59) // 60 FROM documents))"

  /** Deterministic seed generation over the documents table, planting
    * BOTH pools: `shared_N` images carried by ~33 docs each (over the
    * threshold → cleared) and `dup_N` images carried by 2-3 docs each
    * (shared but legitimate → must survive). */
  private def seedGeneration(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      $"doc_id",
      when(pmod($"doc_id", lit(5)) === 0,
        concat(lit("shared_"), pmod($"doc_id", lit(3))))
        .when(pmod($"doc_id", lit(7)) === 1,
          concat(lit("dup_"), pmod($"doc_id", lit(25))))
        .otherwise(concat(lit("img_"), $"doc_id"))
        .as("main_img"))

  private val stores =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Build the store once per (JVM, sf dir): seed generation, then the
    * detector agg over the LIVE merged view, then the clearing generation
    * — the full detect→apply migration as two MergeStore ingests. */
  private def sharedImageStore(spark: SparkSession, dir: String): String =
    synchronized {
      stores.getOrElseUpdate(dir, {
        val store = graft.queries.CrawlQueries.scratchTmp("graft-cleanup-q")
        val threshold = minShared(t(spark, dir, "documents").count())
        MergeStore.ingest(seedGeneration(spark, dir), store)
        val merged = MergeStore.mergedView(spark, store,
          keys = Seq("doc_id"), stickyCols = Seq("main_img"))
        // the reference's _scan: COUNT(DISTINCT id) per image, most-shared
        // first, threshold inclusive (clear_shared_main_images.py:77-92)
        val overShared = merged
          .filter($"main_img" =!= "")
          .groupBy($"main_img")
          .agg(countDistinct($"doc_id").as("n_entities"))
          .filter($"n_entities" >= threshold)
          .select($"main_img")
        // APPLY: one clearing generation — '' per affected key (the raw
        // UPDATE ... SET col = '' of the migration, as a generation so the
        // store stays append-only and the apply is idempotent/resumable)
        val clearGen = merged
          .join(overShared, Seq("main_img"), "left_semi")
          .select($"doc_id", lit("").as("main_img"))
        MergeStore.ingest(clearGen, store)
        store
      })
    }

  /** q_clear_shared_images — the post-apply merged view: over-shared main
    * images cleared to '', everything else (unique AND sub-threshold
    * shared) surviving untouched. The DuckDB twin reconstructs the seed
    * generation, the detector, and the conditional clear independently. */
  def clearSharedImages(spark: SparkSession, dir: String): DataFrame =
    MergeStore.mergedView(spark, sharedImageStore(spark, dir),
      keys = Seq("doc_id"), stickyCols = Seq("main_img"))

  // ---- gallery chrome-row delete -----------------------------------------

  /** Chrome filenames planted into the gallery (each matches a DIFFERENT
    * battery: anchored, project-logo, substring, icon-set+flat-graphic). */
  val plantedChrome = Seq(
    "OOjs_UI_icon_edit-ltr-progressive.svg",
    "Commons-logo.svg",
    "Disambig_gray.svg",
    "Nuvola_apps_kview.png")

  /** Lookalike filenames that MUST survive — the reference's production
    * false positives (clear_ui_chrome_images.py `_print_breakdown`
    * docstring: portraits of Crystal Allen/Crystal Pite caught by the
    * Crystal icon-set pattern before it was tightened). */
  val plantedLookalikes = Seq(
    "Crystal_Pite.jpg",
    "X_Marks_the_Spot_poster.jpg",
    "Emblem_of_New_Caledonia.svg")

  private val commonsBase = "https://upload.wikimedia.org/wikipedia/commons/a/ab/"

  /** The pre-fix gallery state: the real (already chrome-filtered) crawl
    * gallery plus deterministically planted chrome and lookalike rows —
    * the state `clear_ui_chrome_images.py` exists to repair (a crawler
    * running the broken display-form filter had stored chrome rows). */
  private[graft] def galleryWithPlanted(spark: SparkSession,
                                        workDir: String): DataFrame = {
    val gallery = Views.imagesView(spark, workDir)
    val qn = regexp_extract($"doc_id", "^Q(\\d+):", 1).cast("long")
    val chromeArr = array(plantedChrome.map(lit): _*)
    val lookArr = array(plantedLookalikes.map(lit): _*)
    val name = when(pmod($"qn", lit(3)) === 0,
      element_at(chromeArr, (pmod($"qn", lit(4)) + 1).cast("int")))
      .otherwise(element_at(lookArr, (pmod(pmod($"qn", lit(4)), lit(3)) + 1).cast("int")))
    val planted = spark.read.parquet(s"$workDir/pages")
      .filter($"hasContent")
      .select($"doc_id", qn.as("qn"))
      .filter(pmod($"qn", lit(3)) < 2)
      .withColumn("file_name", name)
      .select(
        $"doc_id",
        when(pmod($"qn", lit(3)) === 0, lit(1001)).otherwise(lit(1002))
          .cast("int").as("display_order"),
        concat(lit(commonsBase), $"file_name").as("image_url"),
        lit("").as("caption"),
        $"file_name",
        Views.thumbUrl(concat(lit(commonsBase), $"file_name"), 320)
          .as("thumbnail_url"),
        lit(false).as("is_main_image"))
    gallery.unionByName(planted)
  }

  private val chromeUrlUdf = udf((u: String) => UiChrome.isUiChromeUrl(u))

  /** q_clear_chrome_rows — the hard DELETE: the full P4 battery applied to
    * every gallery row (planted AND real); output = the surviving gallery.
    * The oracle twin reconstructs the gallery + planting from the crawl
    * exports and deletes by the anchored patterns covering the planted
    * names — equality also proves the real gallery carries no chrome (the
    * crawl path filters at fetch time, P4) and that every lookalike
    * survived the full battery. */
  def clearChromeRows(spark: SparkSession, dir: String): DataFrame = {
    val workDir = graft.queries.CrawlQueries.sharedCrawl(spark)
    galleryWithPlanted(spark, workDir).filter(!chromeUrlUdf($"image_url"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clear_shared_images" -> (clearSharedImages _),
    "q_clear_chrome_rows" -> (clearChromeRows _))

  val oracle: Map[String, String] = Map(
    "q_clear_shared_images" ->
      s"""WITH g0 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN 'shared_' || (doc_id % 3)
         |         WHEN doc_id % 7 = 1 THEN 'dup_' || (doc_id % 25)
         |         ELSE 'img_' || doc_id END AS main_img
         |  FROM documents
         |), over_shared AS (
         |  SELECT main_img FROM g0 WHERE main_img <> ''
         |  GROUP BY main_img HAVING count(DISTINCT doc_id) >= $minSharedSql
         |)
         |SELECT g0.doc_id,
         |  CASE WHEN o.main_img IS NOT NULL THEN '' ELSE g0.main_img END
         |    AS main_img
         |FROM g0 LEFT JOIN over_shared o ON g0.main_img = o.main_img""".stripMargin,
    "q_clear_chrome_rows" -> {
      val chromeCase = plantedChrome.zipWithIndex
        .map { case (n, i) => s"WHEN $i THEN '$n'" }.mkString(" ")
      val lookCase = plantedLookalikes.zipWithIndex
        .map { case (n, i) => s"WHEN $i THEN '$n'" }.mkString(" ")
      s"""WITH gallery AS (
         |  SELECT s.doc_id, s.offset AS display_order, s.media_ref AS image_url,
         |    s.text AS caption,
         |    regexp_extract(s.media_ref, '([^/]*)$$', 1) AS file_name,
         |    CASE WHEN regexp_matches(s.media_ref,
         |           '^https://[^/]+/wikipedia/commons/[^/]+/[^/]+/[^/]+$$')
         |      THEN regexp_replace(s.media_ref,
         |           '^(https://[^/]+/wikipedia/commons)/([^/]+)/([^/]+)/([^/]+)$$',
         |           '\\1/thumb/\\2/\\3/\\4/320px-\\4')
         |      ELSE s.media_ref END AS thumbnail_url,
         |    (s.media_ref = p.main_image_url AND p.main_image_url <> '')
         |      AS is_main_image
         |  FROM read_parquet('__EXPORT__/export_crawl_spans/*.parquet') s
         |  JOIN read_parquet('__EXPORT__/export_crawl_pages/*.parquet') p USING (doc_id)
         |  WHERE s.kind = 'image' AND p.has_content
         |), planted AS (
         |  SELECT doc_id,
         |    CASE WHEN qn % 3 = 0 THEN 1001 ELSE 1002 END AS display_order,
         |    '$commonsBase' || fn AS image_url, '' AS caption, fn AS file_name,
         |    'https://upload.wikimedia.org/wikipedia/commons/thumb/a/ab/' || fn
         |      || '/320px-' || fn AS thumbnail_url,
         |    false AS is_main_image
         |  FROM (
         |    SELECT doc_id, qn,
         |      CASE WHEN qn % 3 = 0 THEN CASE qn % 4 $chromeCase END
         |           ELSE CASE (qn % 4) % 3 $lookCase END END AS fn
         |    FROM (SELECT doc_id,
         |            CAST(regexp_extract(doc_id, '^Q(\\d+):', 1) AS BIGINT) AS qn
         |          FROM read_parquet('__EXPORT__/export_crawl_pages/*.parquet')
         |          WHERE has_content)
         |    WHERE qn % 3 < 2)
         |)
         |SELECT * FROM (
         |  SELECT * FROM gallery UNION ALL SELECT * FROM planted)
         |WHERE NOT (regexp_matches(file_name, '^OOjs_UI_icon_')
         |        OR regexp_matches(file_name, '^Commons-logo')
         |        OR regexp_matches(file_name, '^Disambig')
         |        OR regexp_matches(file_name, '^Nuvola[-_]'))""".stripMargin
    })
}
