package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ColSyntax._
import graft.model.Doc

/** Relational views over crawl output — the reference's gallery/section
  * tables and audit reports re-expressed over the nested pages table. */
object Views {

  /** The ordered image-gallery view (T_WC_WIKIPEDIA_PAGE_LANG_IMAGE
    * analogue): one row per (doc, display_order) with J4's IS_MAIN_IMAGE
    * flag, F3-F6 filename derivation, and F7 thumbnail derivation. */
  def imagesView(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/pages")
      .filter($"hasContent")
      .select($"doc_id", $"mainImageUrl",
        explode(filter($"spans", s => s("kind") === "image")).as("img"))
      .select(
        $"doc_id",
        $"img.offset".as("display_order"),
        $"img.media_ref".as("image_url"),
        $"img.text".as("caption"),
        // F6: filename from URL, decoded
        url_decode(substring_index($"img.media_ref", "/", -1)).as("file_name"),
        // F7: /commons/a/ab/N → /commons/thumb/a/ab/N/320px-N
        thumbUrl($"img.media_ref", 320).as("thumbnail_url"),
        // J4: theta match of gallery url vs the page-level main image
        ($"img.media_ref" === $"mainImageUrl" && $"mainImageUrl" =!= "")
          .as("is_main_image"))

  /** F7 — thumbnail URL derivation (wikipedia_images.py:557-579): rewrite
    * the commons upload path; unchanged when the layout doesn't match. */
  def thumbUrl(url: org.apache.spark.sql.Column, width: Int): org.apache.spark.sql.Column = {
    val re = "^(https://[^/]+/wikipedia/commons)/([^/]+)/([^/]+)/([^/]+)$"
    when(url.rlike(re),
      regexp_replace(url, re, s"$$1/thumb/$$2/$$3/$$4/${width}px-$$4"))
      .otherwise(url)
  }

  /** A7 — caption/filename frequency report
    * (migrations/clear_ui_chrome_images.py:97-112): top shared filenames
    * across documents — the frequency-based decoration detector's input. */
  def imageFrequencyReport(spark: SparkSession, workDir: String,
                           top: Int = 20): DataFrame =
    imagesView(spark, workDir)
      .groupBy($"file_name")
      .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_rows"))
      .orderBy($"n_docs".desc, $"file_name".asc)
      .limit(top)

  /** The titled-section view (T_WC_WIKIPEDIA_PAGE_LANG_SECTION analogue):
    * titles from the pages `sections` array joined positionally with the
    * section-span content. */
  def sectionsView(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/pages")
      .filter($"hasContent")
      .select($"doc_id", $"spans",
        explode($"sections").as("sec"))
      .select(
        $"doc_id",
        $"sec.display_order".as("display_order"),
        $"sec.title".as("title"),
        element_at(
          filter($"spans", s => s("kind") === "section" &&
            s("offset") === $"sec.display_order"), 1)("text").as("content"))

  /** A3 — per-language result summary (test_wikipedia_page_images.py:
    * 133-137): docs + main-image count per language; the boolean flag is
    * 0/1-coerced exactly like the reference (F16). */
  def langSummary(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/pages")
      .filter($"hasContent")
      .withColumn("lang", substring_index($"doc_id", ":", -1))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(($"mainImageUrl" =!= "").cast("int")).as("n_main_images"))

  /** M6 — French movie format-line writeback view. */
  def formatLines(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/pages")
      .filter($"formatLine" =!= "")
      .select($"doc_id", $"formatLine")
}
