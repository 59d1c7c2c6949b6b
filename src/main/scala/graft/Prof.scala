package graft

import graft.synth.World

/** Stage-level profiler for the fetch+parse kernel (no Spark): isolates
  * pagePlan generation, page rendering, DOM parse, section extraction and
  * caption matching so kernel regressions are attributable. Run:
  * `sbt "runMain graft.Prof"`. */
object Prof {
  def main(args: Array[String]): Unit = {
    val units = (0L until 6000L).flatMap { i =>
      val e = World.entity(42L, i)
      e.sitelinks.toSeq.sortBy(_._1).take(1).map { case (l, t) => (e.qid, l, t, e.family) }
    }.toArray
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val plans = units.map { case (q, l, t, f) => World.pagePlan(42L, q, l, t, f) }
      time("pagePlan") { units.foreach { case (q, l, t, f) => World.pagePlan(42L, q, l, t, f) } }
      val pages = plans.filter(_.hasContent).map(p => (p, World.renderPage(p)))
      time("renderPage") { plans.filter(_.hasContent).foreach(World.renderPage) }
      time("minidom") { pages.foreach { case (_, m) => graft.parse.MiniDom.parse(m) } }
      time("tokenize+sections") { pages.foreach { case (_, m) =>
        graft.parse.SectionParser.toSectionRows(graft.parse.SectionParser.extractTitlesAndText(m)) } }
      time("captions") { pages.foreach { case (p, m) =>
        val names = p.images.map(ip => ip.url.substring(ip.url.lastIndexOf('/') + 1)).distinct
        if (names.nonEmpty) graft.parse.CaptionMatcher.captionsFor(m, names) } }
      time("full fetchParse") { units.foreach { case (q, l, t, f) =>
        graft.crawl.Fetcher.fetchParse(42L, q, l, t, f, "u", "h") } }
    }
  }
}
