package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl.{Crawl, Views}
import graft.crawl.Crawl.CrawlConfig

class ViewsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  lazy val work: String = {
    val dir = Files.createTempDirectory("graft-views").toString
    Crawl.run(spark, CrawlConfig(seed = 42L, nEntities = 200L,
      budgetPerHost = 1000, saltBuckets = 4, maxTicks = 3, workDir = dir))
    dir
  }

  test("F7 thumbnail derivation rewrites commons paths and passes others") {
    val got = Seq(
      "https://upload.wikimedia.org/wikipedia/commons/a/ab/Cat.jpg",
      "https://other.org/x/y.png").toDF("u")
      .select(Views.thumbUrl($"u", 320)).collect().map(_.getString(0))
    assert(got(0) ==
      "https://upload.wikimedia.org/wikipedia/commons/thumb/a/ab/Cat.jpg/320px-Cat.jpg")
    assert(got(1) == "https://other.org/x/y.png")
  }

  test("images view: dense order, main-image flag consistent with pages") {
    val imgs = Views.imagesView(spark, work).cache()
    // display_order dense 1..n per doc
    val bad = imgs.groupBy($"doc_id")
      .agg(max($"display_order").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n").count()
    assert(bad == 0)
    // is_main_image implies the page's main image equals that url
    val pages = spark.read.parquet(s"$work/pages")
      .select($"doc_id", $"mainImageUrl")
    val inconsistent = imgs.filter($"is_main_image")
      .join(pages, "doc_id")
      .filter($"image_url" =!= $"mainImageUrl").count()
    assert(inconsistent == 0)
    // no UI chrome survived into the gallery
    val chrome = imgs.collect().count(r =>
      graft.parse.UiChrome.isUiChromeUrl(r.getAs[String]("image_url")))
    assert(chrome == 0)
  }

  test("sections view carries titles and span content positionally") {
    val secs = Views.sectionsView(spark, work)
    assert(secs.count() > 0)
    assert(secs.filter($"title".isNull || $"content".isNull).count() == 0)
    // every (doc, display_order) unique
    assert(secs.groupBy($"doc_id", $"display_order").count()
      .filter($"count" > 1).count() == 0)
    // first section of every doc is the Intro (parser emits it first)
    assert(secs.filter($"display_order" === 1 && $"title" =!= "Intro").count() == 0)
  }

  test("image frequency report finds cross-document shared images") {
    val rep = Views.imageFrequencyReport(spark, work, top = 10).collect()
    assert(rep.nonEmpty)
    assert(rep.map(_.getLong(1)).toSeq == rep.map(_.getLong(1)).toSeq.sorted.reverse)
  }

  test("format lines extracted for French movie pages") {
    val fl = Views.formatLines(spark, work)
    assert(fl.filter($"formatLine" === "").count() == 0)
  }

  test("gallery URLs carry no percent-escapes (the q_crawl_images oracle's raw-segment file_name is exact)") {
    val iv = Views.imagesView(spark, work)
    assert(iv.filter($"image_url".contains("%")).count() == 0)
  }

  test("lang summary counts docs and 0/1-coerced main images per language") {
    val ls = Views.langSummary(spark, work).collect()
    assert(ls.nonEmpty)
    ls.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("F8/F9: html strip + lang-tagged fragment extraction") {
    import graft.ops.TextOps
    val df = Seq(
      ("<p>Hello <b>World</b> &amp; &lt;tags&gt;</p>",
       "<span lang=\"fr\">Bonjour <i>le</i> monde</span><span lang=\"en\">Hi</span>")
    ).toDF("h", "frags")
      .select(TextOps.stripHtml($"h").as("s"),
        TextOps.extractLangText($"frags", "fr").as("fr"),
        TextOps.extractLangText($"frags", "de").as("de"))
    val r = df.head
    assert(r.getString(0) == "Hello World & <tags>")
    assert(r.getString(1) == "Bonjour le monde")
    assert(r.getString(2) == "")
  }

  test("F8: numeric/hex entity unescape matches html.unescape semantics") {
    import graft.ops.TextOps.unescapeHtml
    assert(unescapeHtml("caf&#233; &#xE9;") == "café é")
    assert(unescapeHtml("A&#x2014;B") == "A—B")
    // single pass: &amp;#51; → &#51;, NOT 3 (html.unescape is one scan)
    assert(unescapeHtml("&amp;#51;") == "&#51;")
    // WHATWG quirks html.unescape implements: C1 range → windows-1252,
    // NUL/out-of-range/surrogates → U+FFFD, 0x0D → CR
    assert(unescapeHtml("&#151;") == "—")   // 0x97 → em dash
    assert(unescapeHtml("&#x80;") == "€")   // euro
    assert(unescapeHtml("&#0;") == "�")
    assert(unescapeHtml("&#xD800;") == "�")
    assert(unescapeHtml("&#1114112;") == "�") // 0x110000
    assert(unescapeHtml("&#13;") == "\r")
    assert(unescapeHtml("&nbsp;") == " ")   // NBSP, not plain space
    // huge digit strings must not overflow into a wrong codepoint
    assert(unescapeHtml("&#99999999999999;") == "�")
    // non-entities pass through
    assert(unescapeHtml("a & b &unknown; &#x;") == "a & b &unknown; &#x;")
  }

  test("P6: no non-image mime in any gallery; P9: imageless families have no main image") {
    val pages = spark.read.parquet(s"$work/pages").collect()
    pages.filter(p => !graft.synth.World.familiesWithImages.contains(p.getAs[String]("family")))
      .foreach(p => assert(p.getAs[String]("mainImageUrl") == ""))
  }

  test("effectiveBloomCapacity keeps measured fpp <= 2x nominal at a 1.6M-URL world") {
    // the SCALE.md world-size probe as a test: the world-derived capacity
    // (max(2^20, 2.5 x nEntities)) must keep the prefilter pruning at the
    // largest probed world — the fixed 2^20 capacity it replaced in round
    // 4 silently over-saturated here (fpp far past nominal; correct but
    // non-pruning, so the exact anti-join saw nearly the full frontier)
    val cfg = CrawlConfig(seed = 42L, nEntities = 1640000L,
      budgetPerHost = 64, saltBuckets = 4, maxTicks = 1, workDir = "")
    val urls = Crawl.candidateUnits(spark, cfg).map(_.url)
    val bf = graft.dedup.BloomSeen.build(
      urls, cfg.effectiveBloomCapacity, cfg.bloomFpp)
    val probes = 200000
    val fp = (0 until probes).count(i =>
      bf.mightContainString(s"https://not-a-world-url.example/$i"))
    val fpp = fp.toDouble / probes
    assert(fpp <= 2 * cfg.bloomFpp,
      s"measured fpp $fpp > 2x nominal ${cfg.bloomFpp} " +
        s"(capacity ${cfg.effectiveBloomCapacity})")
    // and it holds the world: no false negative on a sample of members
    urls.take(1000).foreach(u => assert(bf.mightContainString(u)))
  }

  test("bloom sketches persist per tick and merge") {
    val bf = graft.dedup.BloomSeen.loadMerged(work)
    assert(bf.isDefined)
    val seen = spark.read.parquet(graft.crawl.Crawl.seenDir(work))
      .select($"url").collect().map(_.getString(0))
    // no false negatives, ever
    seen.foreach(u => assert(bf.get.mightContainString(u)))
  }
}
