package graft.crawl

import graft.model.{FetchResult, Span}
import graft.parse.{SectionParser, UiChrome}
import graft.synth.World

/** The per-(entity, language) fetch+parse worker — pure function twin of
  * `f_fetchlangpayload` (wikipedia_page_writer.py:65-190). Runs inside
  * `mapPartitions` on executors; in synthetic mode the "network" is the
  * deterministic page-plan lookup, so N-vs-4N runs observe identical pages.
  *
  * Semantics reproduced:
  *  - retry policy (C4/C5): up to [[maxRetries]] attempts on transient 503;
  *    success only if a 200 lands within the budget
  *    (wikipedia_http.py:62-72, wikipedia_crawler_helpers.py:29-50)
  *  - lead image accepted only when not UI chrome; NO first-page-image
  *    fallback; absent lead ⇒ no main image (WIKIPEDIA-CRAWLER-019,
  *    wikipedia_page_writer.py:93-106, 240-259)
  *  - chrome gallery files dropped BEFORE enumeration numbering
  *    (wikipedia_images.py:336-337), display_order = 1-based position in
  *    the filtered list (wikipedia_images.py:684-693)
  *  - sections via [[SectionParser]] with writer post-processing
  *    ([edit] strip, 300-char title truncation)
  *  - spans = section stream then image stream, each with its own dense
  *    1-based offset; kind carries the interleaving (input_hint mapping,
  *    SURVEY.md §1.3)
  */
object Fetcher {

  val maxRetries = 3

  final case class ParsedPage(
      result: FetchResult,
      sections: Seq[(Int, String, String)], // (display_order, title, content)
      formatLine: Option[String])           // M6 writeback (movie/fr only)

  def fetchParse(seed: Long, qid: String, lang: String, title: String,
                 family: String, url: String, host: String): ParsedPage = {
    val plan = World.pagePlan(seed, qid, lang, title, family)
    val docId = s"$qid:$lang"

    // retry loop (deterministic): transientFailures 503s precede the final
    // status; if they EXCEED the retry budget the fetch fails with 503.
    // urllib3 Retry(total=3) permits 3 retries AFTER the initial attempt
    // (4 attempts total, wikipedia_http.py:62-72), so exactly-maxRetries
    // transients followed by a 200 still succeeds.
    val (status, success) =
      if (plan.transientFailures > maxRetries) (503, false)
      else (plan.httpStatus, plan.httpStatus == 200)

    if (!success || !plan.hasContent) {
      return ParsedPage(
        FetchResult(docId, url, host, status, success, hasContent = false,
          pageTitle = title, mainImageUrl = "", spans = Seq.empty),
        Seq.empty, None)
    }

    // main image: REST-summary lead only, rejected when chrome (M1);
    // fetched at all only for families that store one (P9 needs_image,
    // wikipedia_crawler.py:801, wikipedia_page_writer.py:93-106)
    val mainImage =
      if (World.familiesWithImages.contains(family) &&
          UiChrome.isAcceptableMainImageUrl(plan.leadImageUrl)) plan.leadImageUrl
      else ""

    // ONE rendered-HTML document and ONE DOM parse serve sections AND
    // captions (the reference's Phase-1b single-fetch + single-soup:
    // wikipedia_page_writer.py:74-75)
    val markup = World.renderPage(plan)
    val dom = graft.parse.MiniDom.parse(markup)
    val sections = SectionParser.toSectionRows(
      SectionParser.extractTitlesAndTextDom(dom))

    // M6 format line from the French movie 'Fiche technique' section
    val formatLine =
      if (family == "movie" && lang == "fr")
        sections.find(_._2 == "Fiche technique")
          .flatMap(s => SectionParser.extractFormatLine(s._3))
      else None

    // gallery: chrome (P4) + non-image mime (P6, wikipedia_images.py:370-371)
    // filtered BEFORE numbering. r6: one pass builds the numbered gallery
    // WITH its URL-derived filename (was: two filter passes + the filename
    // substring computed twice per image — for the lookup list and again
    // for the span)
    def fileNameOf(url: String) = url.substring(url.lastIndexOf('/') + 1)
    val gallery = {
      val b = Vector.newBuilder[(Int, World.ImagePlan, String)]
      var ord = 0
      plan.images.foreach { ip =>
        if (ip.mime.startsWith("image/") &&
            !UiChrome.isUiChromeFile(ip.fileTitle)) {
          ord += 1
          b += ((ord, ip, fileNameOf(ip.url)))
        }
      }
      b.result()
    }

    // J7 — captions extracted from the rendered HTML by the ancestor-walk
    // matcher (wikipedia_images.py:409-515), keyed by the URL-derived
    // filename; ONE DOM parse per page answers every gallery lookup.
    // no gallery → nothing to look up (the DOM already exists for sections)
    val galleryNames = gallery.map(_._3).distinct
    val captions =
      if (galleryNames.isEmpty) Map.empty[String, String]
      else graft.parse.CaptionMatcher.captionsForDom(dom, galleryNames)

    val spans =
      sections.map { case (ord, _, content) => Span("section", content, "", ord) } ++
      gallery.map { case (ord, ip, fn) =>
        Span("image", captions.getOrElse(fn, ""), ip.url, ord) }

    ParsedPage(
      FetchResult(docId, url, host, status, success = true, hasContent = true,
        pageTitle = title, mainImageUrl = mainImage, spans = spans),
      sections, formatLine)
  }
}
