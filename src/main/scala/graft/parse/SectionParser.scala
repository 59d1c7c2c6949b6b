package graft.parse

import scala.collection.mutable

/** The HTML→sections extractor (SURVEY.md §2.8), re-expressed as a pure
  * Scala function used inside a typed map over `Dataset[FetchResult]`.
  *
  * Reproduces `extract_titles_and_text`
  * (/root/reference/wikipedia_crawler_helpers.py:196-245) semantics exactly
  * over the markup subset the deterministic generator emits
  * (`<h2> <h3> <h4> <p> <ul>/<ol> + <li>` in flat block sequence):
  *
  *  1. Intro span = all block content before the first `<h2>`, titled
  *     'Intro', ALWAYS emitted (even when empty — helpers:222).
  *  2. Split on `<h2>` and `<h3>`; `<h4>` stays inline as a text line
  *     (helpers:159-162).
  *  3. An `<h3>` opens a composite-titled span `"{h2} - {h3}"`; the `<h2>`
  *     lead text before the first `<h3>` keeps the bare `<h2>` title
  *     (helpers:227-239). Empty h3 title keeps the bare h2 title.
  *  4. Headings in the no-subsplit set (14 EN+FR end-matter titles,
  *     case-insensitive, helpers:141-148) are never split on `<h3>` — the
  *     h3 text is appended inline like a paragraph.
  *  5. Block flattening (helpers:151-169): p/h3/h4 → '\n' + text + ' ';
  *     ul/ol → one '\n- ' bullet per li (strings stripped, space-joined).
  *  6. Clean: strip + collapse blank lines to fixpoint (helpers:172-176);
  *     drop empty non-Intro sections (helpers:234-236, 242-244).
  *  7. Intra-title " - " → " – " (en-dash) BEFORE the composite join
  *     (helpers:179-193).
  *
  * Writer post-processing (wikipedia_page_writer.py:344-346) is applied by
  * [[toSectionRows]]: strip "[edit]" from content, truncate title at 300.
  */
object SectionParser {

  /** helpers:141-148 — compared case-insensitively against the H2 title. */
  val NoSubsplitSectionTitles: Set[String] = Set(
    // EN
    "references", "see also", "external links", "further reading",
    "notes and references", "notes", "bibliography", "citations", "sources",
    // FR
    "références", "voir aussi", "liens externes", "notes et références",
    "bibliographie")

  /** One top-level block of the synthetic markup. */
  sealed trait Block { def name: String }
  final case class TextBlock(name: String, text: String) extends Block
  final case class ListBlock(name: String, items: Seq[String]) extends Block

  private val blockTags = Set("h2", "h3", "h4", "p", "ul", "ol")

  /** Tokenize the generator's markup subset into a flat block sequence. */
  def tokenize(markup: String): Seq[Block] =
    tokenizeDom(MiniDom.parse(markup))

  /** DOM-based tokenizer: ATTRIBUTE-LESS h2/h3/h4/p/ul/ol elements are
    * section blocks (image caption containers always carry class/typeof
    * attributes — e.g. `<ul class="gallery">` — and are never blocks).
    * Shares ONE MiniDom parse per page with the caption matcher; the
    * regex tokenizer this replaced re-scanned the full page and was the
    * single largest parse-kernel cost. */
  def tokenizeDom(root: MiniDom.Node): Seq[Block] = {
    val out = Vector.newBuilder[Block]
    def textOf(n: MiniDom.Node): String =
      n.children.iterator.filter(!_.isElement).map(_.text).mkString
    def walk(n: MiniDom.Node): Unit =
      if (n.isElement && blockTags.contains(n.tag) && n.attrs.isEmpty) {
        if (n.tag == "ul" || n.tag == "ol")
          out += ListBlock(n.tag,
            n.children.filter(c => c.isElement && c.tag == "li")
              .map(textOf).toSeq)
        else out += TextBlock(n.tag, textOf(n))
        // block content is flat by the markup contract — no recursion
      } else n.children.foreach(walk)
    walk(root)
    out.result()
  }

  /** helpers:151-169 `_append_block_text` (r6: appends into the section's
    * builder — the string-concat form re-copied the accumulated section
    * text on every block, O(section²) allocated bytes per section). */
  private def appendBlockText(sb: java.lang.StringBuilder, b: Block): Unit = b match {
    case TextBlock(_, text) => // p / h3 / h4 all share the line rule
      if (text.nonEmpty) sb.append('\n').append(text).append(' ')
    case ListBlock(_, items) =>
      items.foreach { li =>
        // ' '.join(t.strip() for t in li.strings if t.strip()) — the
        // generator emits one text node per <li>, so this is li.strip()
        // (inner whitespace preserved, as BeautifulSoup's strings would).
        sb.append("\n- ").append(li.trim)
      }
  }

  /** helpers:172-176 — strip + collapse blank lines to fixpoint. */
  def cleanSectionText(text: String): String = {
    var t = text.trim
    while (t.contains("\n\n")) t = t.replace("\n\n", "\n")
    t
  }

  /** helpers:179-193 — escape intra-title spaced hyphen as spaced en-dash
    * so the only " - " in a composite title is the H2/H3 join. */
  def normalizeHeadingSeparator(title: String): String =
    title.replace(" - ", " – ")

  /** The extractor: markup → ordered (title, text) sections. */
  def extractTitlesAndText(markup: String): Seq[(String, String)] =
    extractTitlesAndText(tokenize(markup))

  /** The extractor over an already-parsed DOM (one parse per page shared
    * with the caption matcher). */
  def extractTitlesAndTextDom(root: MiniDom.Node): Seq[(String, String)] =
    extractTitlesAndText(tokenizeDom(root))

  def extractTitlesAndText(blocks: Seq[Block]): Seq[(String, String)] = {
    val result = mutable.ArrayBuffer.empty[(String, String)]
    val sb = new java.lang.StringBuilder(256)

    // Intro = everything before the first <h2>, always emitted.
    blocks.takeWhile(_.name != "h2").foreach(appendBlockText(sb, _))
    result += (("Intro", cleanSectionText(sb.toString)))
    sb.setLength(0)

    var i = blocks.indexWhere(_.name == "h2")
    while (i != -1 && i < blocks.length) {
      val h2Title = normalizeHeadingSeparator(
        blocks(i).asInstanceOf[TextBlock].text.trim)
      val noSubsplit = NoSubsplitSectionTitles.contains(h2Title.toLowerCase)
      var currentTitle = h2Title // the H2 lead keeps the bare H2 title
      var j = i + 1
      while (j < blocks.length && blocks(j).name != "h2") {
        val b = blocks(j)
        if (b.name == "h3" && !noSubsplit) {
          // Flush the current (sub)section and open a new composite one.
          val cleaned = cleanSectionText(sb.toString)
          sb.setLength(0)
          if (cleaned.nonEmpty) result += ((currentTitle, cleaned))
          val h3Title = normalizeHeadingSeparator(
            b.asInstanceOf[TextBlock].text.trim)
          currentTitle = if (h3Title.nonEmpty) s"$h2Title - $h3Title" else h2Title
        } else {
          appendBlockText(sb, b)
        }
        j += 1
      }
      val cleaned = cleanSectionText(sb.toString)
      sb.setLength(0)
      if (cleaned.nonEmpty) result += ((currentTitle, cleaned))
      i = j
    }
    result.toSeq
  }

  /** Writer post-processing (wikipedia_page_writer.py:344-355): strip
    * "[edit]", truncate title at 300, assign dense 1-based display order. */
  def toSectionRows(sections: Seq[(String, String)]): Seq[(Int, String, String)] =
    sections.zipWithIndex.map { case ((title, content), idx) =>
      val t = if (title.length > 300) title.substring(0, 300) else title
      (idx + 1, t, content.replace("[edit]", ""))
    }

  /** M6 — French movie Format-line extraction
    * (wikipedia_page_writer.py:357-388): substring of the 'Fiche technique'
    * section between "\n- Format" (fallback "- Format") and the next "\n- ",
    * strip, then drop a leading ": ". Returns None when absent. */
  def extractFormatLine(sectionContent: String): Option[String] = {
    var begin = "\n- Format"
    var beginIdx = sectionContent.indexOf(begin)
    if (beginIdx == -1) {
      begin = "- Format"
      beginIdx = sectionContent.indexOf(begin)
    }
    if (beginIdx == -1) return None
    val from = beginIdx + begin.length
    val endIdx = sectionContent.indexOf("\n- ", from)
    var line =
      (if (endIdx != -1) sectionContent.substring(from, endIdx)
       else sectionContent.substring(from)).trim
    if (line.isEmpty) return None
    if (line.startsWith(": ")) line = line.substring(2)
    Some(line)
  }
}
