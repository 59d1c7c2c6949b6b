package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.SectionParser
import graft.parse.SectionParser.{TextBlock, ListBlock}
import graft.synth.World

class SectionParserSpec extends AnyFunSuite {

  private def extract(markup: String) = SectionParser.extractTitlesAndText(markup)

  test("intro + h2/h3 split with composite titles, [edit] strip") {
    val markup = "<body><p>alpha beta</p><h2>History</h2><p>one</p>" +
      "<h3>Early</h3><p>two[edit]</p>" +
      "<h2>References</h2><h3>Sub</h3><p>ref text</p></body>"
    val got = extract(markup)
    assert(got == Seq(
      ("Intro", "alpha beta"),
      ("History", "one"),
      ("History - Early", "two[edit]"),
      // References is in the no-subsplit set: the h3 is inlined as a line
      ("References", "Sub \nref text")))
    val rows = SectionParser.toSectionRows(got)
    assert(rows(2) == ((3, "History - Early", "two")))
    assert(rows.map(_._1) == Seq(1, 2, 3, 4)) // dense 1-based display order
  }

  test("Intro is always emitted, even when empty; empty sections dropped") {
    assert(extract("<body><h2>Empty</h2></body>") == Seq(("Intro", "")))
    assert(extract("<body></body>") == Seq(("Intro", "")))
  }

  test("intra-title spaced hyphen becomes en-dash before composite join") {
    val markup = "<body><h2>2015 - present</h2><p>x</p><h3>1926 - 1929</h3><p>y</p></body>"
    assert(extract(markup) == Seq(
      ("Intro", ""),
      ("2015 – present", "x"),
      ("2015 – present - 1926 – 1929", "y")))
  }

  test("empty h3 title keeps the bare h2 title") {
    val markup = "<body><h2>Main</h2><p>lead</p><h3></h3><p>tail</p></body>"
    assert(extract(markup) == Seq(
      ("Intro", ""), ("Main", "lead"), ("Main", "tail")))
  }

  test("h4 stays inline; ul/ol flatten to bullets with stripped items") {
    val markup = "<body><h2>S</h2><h4>Deep</h4><p>x</p>" +
      "<h2>List</h2><ul><li> a </li><li>b  c</li></ul><ol><li>z</li></ol></body>"
    assert(extract(markup) == Seq(
      ("Intro", ""),
      ("S", "Deep \nx"),
      ("List", "- a\n- b  c\n- z")))
  }

  test("h2 lead before first h3 keeps bare h2 title; empty lead skipped") {
    val markup = "<body><h2>T</h2><h3>A</h3><p>pa</p><h3>B</h3><p>pb</p></body>"
    assert(extract(markup) == Seq(
      ("Intro", ""), ("T - A", "pa"), ("T - B", "pb")))
  }

  test("title truncation at 300 chars") {
    val longTitle = "T" * 400
    val rows = SectionParser.toSectionRows(Seq((longTitle, "c")))
    assert(rows.head._2.length == 300)
  }

  test("format line extraction (M6)") {
    val content = "- Titre : X\n- Format : 35 mm couleur\n- Pays : France"
    assert(SectionParser.extractFormatLine(content) == Some("35 mm couleur"))
    assert(SectionParser.extractFormatLine("- Pays : France") == None)
    // fallback begin marker without leading newline, last-item case
    assert(SectionParser.extractFormatLine("- Format : mono") == Some("mono"))
  }

  test("parser output equals plan-derived expectation across many pages") {
    // independent derivation: walk plan blocks directly (no tokenizer)
    var checked = 0
    for (i <- 0L until 400L) {
      val e = World.entity(42L, i)
      e.sitelinks.foreach { case (lang, title) =>
        val plan = World.pagePlan(42L, e.qid, lang, title, e.family)
        if (plan.blocks.nonEmpty) {
          val viaMarkup = SectionParser.extractTitlesAndText(
            World.renderMarkup(plan.blocks))
          val expected = planExpectation(plan.blocks)
          assert(viaMarkup == expected, s"plan mismatch qid=${e.qid} lang=$lang")
          checked += 1
        }
      }
    }
    assert(checked > 200)
  }

  /** Plan-walk twin of the extractor (no tokenizer/markup involved). */
  private def planExpectation(
      blocks: Seq[SectionParser.Block]): Seq[(String, String)] = {
    def flat(acc: String, b: SectionParser.Block): String = b match {
      case TextBlock(_, t)     => if (t.nonEmpty) acc + "\n" + t + " " else acc
      case ListBlock(_, items) => items.foldLeft(acc)((a, li) => a + "\n- " + li.trim)
    }
    val out = Vector.newBuilder[(String, String)]
    val intro = blocks.takeWhile(_.name != "h2").foldLeft("")(flat)
    out += (("Intro", SectionParser.cleanSectionText(intro)))
    var rest = blocks.dropWhile(_.name != "h2")
    while (rest.nonEmpty) {
      val h2 = SectionParser.normalizeHeadingSeparator(
        rest.head.asInstanceOf[TextBlock].text.trim)
      val noSub = SectionParser.NoSubsplitSectionTitles.contains(h2.toLowerCase)
      val body = rest.tail.takeWhile(_.name != "h2")
      rest = rest.tail.dropWhile(_.name != "h2")
      var title = h2
      var acc = ""
      body.foreach { b =>
        if (b.name == "h3" && !noSub) {
          val c = SectionParser.cleanSectionText(acc)
          if (c.nonEmpty) out += ((title, c))
          val h3 = SectionParser.normalizeHeadingSeparator(
            b.asInstanceOf[TextBlock].text.trim)
          title = if (h3.nonEmpty) s"$h2 - $h3" else h2
          acc = ""
        } else acc = flat(acc, b)
      }
      val c = SectionParser.cleanSectionText(acc)
      if (c.nonEmpty) out += ((title, c))
    }
    out.result()
  }
}
