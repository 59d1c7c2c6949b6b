package graft.parse

import graft.parse.MiniDom.Node

/** J7 — image→caption matching over rendered page HTML, the ancestor-walk
  * semantics of `_caption_from_soup` (wikipedia_images.py:409-515):
  *
  *  1. locate the `<img>` whose parent `<a class="mw-file-description">`
  *     href (URL-decoded) ends with `:filename` or `:filename_underscored`
  *     (:424-448); fallback for unwrapped imgs: filename substring of
  *     src/alt;
  *  2. walk UP from the img; each marker is DEFINITIVE — a matching
  *     container with a missing/empty caption element returns "" rather
  *     than falling through to a broader ancestor (:453-458):
  *      - `<figure>` → first `<figcaption>` text (:463-469)
  *      - class `gallerybox` → descendant class `gallerytext` (:471-477)
  *      - class `thumb` → descendant class `thumbcaption`; when absent KEEP
  *        WALKING (the img may sit in a gallerybox one level up, :479-485)
  *      - class `infobox-image` → descendant class `infobox-caption`, else
  *        the parent `<tr>`'s next sibling `<tr>`'s `infobox-caption`
  *        (:487-503)
  *      - `<div class="images">` → NEXT SIBLING `<div class="legend">`
  *        (frwiki infobox shape, :505-511)
  *  3. no marker to the root → "".
  *
  * Text extraction mirrors get_text(" ", strip=True); entity references in
  * caption text decode via the F8 kernel (an HTML parser's behavior).
  */
object CaptionMatcher {

  /** URL-decode that tolerates malformed escapes (urllib.parse.unquote
    * never throws; bad sequences pass through). Fast path (r6): a string
    * with no '%' and no '+' decodes to itself — skip the decoder (this
    * runs once per wrapped img per page). */
  private def softDecode(s: String): String =
    if (s.indexOf('%') < 0 && s.indexOf('+') < 0) s
    else try java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")
    catch { case _: Exception => s }

  /** One tree walk per PAGE: every `<img>` in document order with its
    * wrapping mw-file-description href (decoded) or its src/alt fallback
    * strings. Per-filename lookup then scans this small vector — the naive
    * form rescanned the full DOM per filename, which dominated fetch CPU
    * (gallery of g images over an n-node page = O(g·n)). */
  final class PageIndex private[CaptionMatcher] (val root: Node) {
    private[CaptionMatcher] val imgs: Vector[(Node, String, String, String)] = {
      val buf = Vector.newBuilder[(Node, String, String, String)]
      root.foreachDescendant { n =>
        if (n.tag == "img") {
          val wrappedHref = n.ancestors
            .find(a => a.tag == "a" && a.classes.contains("mw-file-description"))
            .map(a => softDecode(a.attrs.getOrElse("href", "")))
            .orNull
          buf += ((n, wrappedHref, n.attrs.getOrElse("src", ""),
            n.attrs.getOrElse("alt", "")))
        }
      }
      buf.result()
    }

    /** The reference's matches_img over imgs in document order: a wrapped
      * img matches by decoded-href suffix; an unwrapped one by src/alt
      * substring (wikipedia_images.py:434-448). */
    private[CaptionMatcher] def findImg(f: String, fu: String): Option[Node] = {
      // suffix keys hoisted out of the scan (r6: were rebuilt per img row)
      val cf = ":" + f
      val cfu = ":" + fu
      imgs.collectFirst {
        case (n, href, src, alt)
            if (if (href != null)
                  href.endsWith(cf) || href.endsWith(cfu)
                else
                  src.contains(f) || alt.contains(f) ||
                    src.contains(fu) || alt.contains(fu)) => n
      }
    }
  }

  def index(html: String): PageIndex = new PageIndex(MiniDom.parse(html))

  /** Caption for one image filename within parsed page HTML ("" = none). */
  def captionFor(root: Node, filename: String): String =
    captionFor(new PageIndex(root), filename)

  def captionFor(idx: PageIndex, filename: String): String = {
    if (filename.isEmpty) return ""
    val filenameUnderscored = filename.replace(" ", "_")
    val img = idx.findImg(filename, filenameUnderscored).orNull
    if (img == null) return ""

    var node: Node = img
    while (node != null && node.tag != "#root") {
      val classes = node.classes

      if (node.tag == "figure")
        return node.findFirst(_.tag == "figcaption")
          .map(_.getTextStripped).getOrElse("")

      if (classes.contains("gallerybox"))
        return node.findFirst(_.classes.contains("gallerytext"))
          .map(_.getTextStripped).getOrElse("")

      if (classes.contains("thumb")) {
        val cap = node.findFirst(_.classes.contains("thumbcaption"))
          .map(_.getTextStripped).getOrElse("")
        if (cap.nonEmpty) return cap
        // no thumbcaption — keep walking (gallerybox may be above)
      }

      if (classes.contains("infobox-image")) {
        val own = node.findFirst(_.classes.contains("infobox-caption"))
          .map(_.getTextStripped).getOrElse("")
        if (own.nonEmpty) return own
        val fromNextRow = node.ancestors.find(_.tag == "tr")
          .flatMap(_.nextSiblings.find(_.tag == "tr"))
          .flatMap(_.findFirst(_.classes.contains("infobox-caption")))
          .map(_.getTextStripped).getOrElse("")
        return fromNextRow
      }

      if (node.tag == "div" && classes.contains("images"))
        return node.nextSiblings
          .find(s => s.tag == "div" && s.classes.contains("legend"))
          .map(_.getTextStripped).getOrElse("")

      node = node.parent
    }
    ""
  }

  /** Captions for a batch of filenames over one page's HTML — parses and
    * indexes the DOM once per page (the reference's Phase-1b shape: one
    * rendered-HTML fetch serves sections AND captions). */
  def captionsFor(html: String, filenames: Seq[String]): Map[String, String] =
    captionsForDom(MiniDom.parse(html), filenames)

  def captionsForDom(root: Node, filenames: Seq[String]): Map[String, String] = {
    val idx = new PageIndex(root)
    filenames.map(f => f -> captionFor(idx, f)).toMap
  }
}
