package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parse.{CaptionMatcher, MiniDom}
import graft.synth.World

/** J7 — caption extraction (wikipedia_images.py:409-515): the five marker
  * shapes, href normalization, definitive-empty semantics, first-match
  * semantics, and a world sweep proving the Fetcher derives every gallery
  * caption from HTML alone. */
class CaptionSpec extends AnyFunSuite {

  private def cap(html: String, file: String): String =
    CaptionMatcher.captionFor(MiniDom.parse(html), file)

  private def a(href: String) =
    s"""<a class="mw-file-description" href="$href"><img src="x"/></a>"""

  test("figure/figcaption") {
    val html = s"""<figure>${a("/wiki/File:Pic_1.jpg")}<figcaption>A fine picture</figcaption></figure>"""
    assert(cap(html, "Pic_1.jpg") == "A fine picture")
  }

  test("figure with EMPTY figcaption is definitive: no fallback to outer markers") {
    val html = s"""<div class="thumb"><figure>${a("/wiki/File:P.jpg")}<figcaption></figcaption></figure>
      <div class="thumbcaption">outer wrong</div></div>"""
    assert(cap(html, "P.jpg") == "")
  }

  test("gallerybox via inner captionless thumb (keep-walking path)") {
    val html = s"""<ul class="gallery"><li class="gallerybox"><div class="thumb">${a("/wiki/File:G.png")}</div>
      <div class="gallerytext">Gallery says hi</div></li></ul>"""
    assert(cap(html, "G.png") == "Gallery says hi")
  }

  test("thumb/thumbcaption") {
    val html = s"""<div class="thumb tright"><div class="thumbinner">${a("/wiki/File:T.jpg")}
      <div class="thumbcaption">Thumbed</div></div></div>"""
    assert(cap(html, "T.jpg") == "Thumbed")
  }

  test("infobox-image: caption in the same cell and on the next table row") {
    val same = s"""<table class="infobox"><tr><td class="infobox-image">${a("/wiki/File:I.jpg")}
      <div class="infobox-caption">In cell</div></td></tr></table>"""
    assert(cap(same, "I.jpg") == "In cell")
    val nextRow = s"""<table class="infobox"><tr><td class="infobox-image">${a("/wiki/File:I.jpg")}</td></tr>
      <tr><td><div class="infobox-caption">Next row</div></td></tr></table>"""
    assert(cap(nextRow, "I.jpg") == "Next row")
  }

  test("fr legend: div.images followed by sibling div.legend") {
    val html = s"""<div class="images">${a("/wiki/Fichier:L.jpg")}</div><div class="legend">Légende</div>"""
    assert(cap(html, "L.jpg") == "Légende")
  }

  test("href normalization: percent-encoded and Fichier: namespace match") {
    val html = s"""<figure>${a("/wiki/Fichier:Name%5F1.jpg")}<figcaption>Enc</figcaption></figure>"""
    assert(cap(html, "Name_1.jpg") == "Enc")
  }

  test("space/underscore normalization on the filename side") {
    val html = s"""<figure>${a("/wiki/File:Two_Words.jpg")}<figcaption>SpaceForm</figcaption></figure>"""
    assert(cap(html, "Two Words.jpg") == "SpaceForm")
  }

  test("unmatched filename or absent image yields empty caption") {
    val html = s"""<figure>${a("/wiki/File:Other.jpg")}<figcaption>X</figcaption></figure>"""
    assert(cap(html, "Missing.jpg") == "")
    assert(cap("<body><p>no images</p></body>", "A.jpg") == "")
  }

  test("caption text is entity-decoded and inline-markup flattened") {
    val h1 = s"""<figure>${a("/wiki/File:E.jpg")}<figcaption>Caf&#233; one &amp; two</figcaption></figure>"""
    assert(cap(h1, "E.jpg") == "Café one & two")
    val h2 = s"""<figure>${a("/wiki/File:M.jpg")}<figcaption><i>First</i> rest here</figcaption></figure>"""
    assert(cap(h2, "M.jpg") == "First rest here")
  }

  test("first-match semantics: duplicate filenames answer with the first container") {
    val html =
      s"""<figure>${a("/wiki/File:Dup.jpg")}<figcaption>first</figcaption></figure>""" +
        s"""<figure>${a("/wiki/File:Dup.jpg")}<figcaption>second</figcaption></figure>"""
    assert(cap(html, "Dup.jpg") == "first")
  }

  test("world sweep: every gallery span's caption is derived from HTML and equals the plan's expectation") {
    var checked = 0
    (0 until 300).foreach { i =>
      val e = World.entity(7L, i.toLong)
      e.sitelinks.foreach { case (lang, title) =>
        val plan = World.pagePlan(7L, e.qid, lang, title, e.family)
        if (plan.hasContent) {
          val p = graft.crawl.Fetcher.fetchParse(7L, e.qid, lang, title,
            e.family, s"u$i", World.hostOf(lang))
          val gallery = plan.images
            .filterNot(ip => graft.parse.UiChrome.isUiChromeFile(ip.fileTitle))
            .filter(_.mime.startsWith("image/"))
          val imageSpans = p.result.spans.filter(_.kind == "image")
          assert(imageSpans.length == gallery.length)
          gallery.zip(imageSpans).foreach { case (ip, span) =>
            assert(span.text == ip.caption,
              s"qid=${e.qid} lang=$lang file=${ip.fileTitle} shape=${ip.shape}")
            checked += 1
          }
        }
      }
    }
    assert(checked > 500, s"sweep too thin: $checked")
  }
}
