package graft.synth

import graft.model._

/** Deterministic synthetic crawl world — seeded, splittable, no external
  * data (north rule: "synthesise it deterministically at small scale").
  *
  * Every property of the world is a pure function of (seed, key...) via a
  * splitmix64-style mixer, so the Spark pipeline (distributed, any partition
  * count) and the single-threaded oracle observe the SAME world without
  * coordination — the in-sandbox stand-in for the reference's fixed external
  * Wikipedia (the fetch is a pure lookup, as SURVEY.md §7.1 module `synth`).
  *
  * Shapes mirror FIXTURES.md: 20 entity families in the reference's
  * precedence order (wikipedia_crawler.py:600-761), Zipf-skewed hosts (en/fr
  * hot, ~60%), ~3% invalid Qids (fail ^Q[0-9]+$), ~10% cross-family
  * duplicates, ~5% URL near-duplicates (case/fragment/query-order), pages
  * with chrome images + lookalikes that must survive, ~70% lead images.
  */
object World {

  // ---- splittable deterministic hashing -----------------------------------

  /** splitmix64 finalizer — public-domain mixing constants. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private final val MixInit = 0x6A09E667F3BCC909L

  def mix(parts: Long*): Long = parts.foldLeft(MixInit)((a, p) => mix64(a ^ p))

  // exact-arity overloads: the varargs form boxes a Seq per call, which
  // dominated the MinHash inner loop (64 perms × shingles per doc) and a
  // visible slice of pagePlan; these produce IDENTICAL values (same fold)
  def mix(a: Long, b: Long): Long = mix64(mix64(MixInit ^ a) ^ b)
  def mix(a: Long, b: Long, c: Long): Long = mix64(mix(a, b) ^ c)
  def mix(a: Long, b: Long, c: Long, d: Long): Long = mix64(mix(a, b, c) ^ d)

  def hashStr(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001B3L; i += 1 }
    mix64(h)
  }

  /** Uniform [0, n) from a hash. */
  def bounded(h: Long, n: Int): Int = (Math.floorMod(h, n.toLong)).toInt

  /** Uniform [0,1) from a hash. */
  def unit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** Zero-padded 10-digit decimal — byte-identical to f"$v%010d" for the
    * non-negative pk range, without java.util.Formatter (r6: one Formatter
    * + locale lookup per entity was a visible slice of candidate synthesis). */
  private def pad10(v: Long): String = {
    val s = java.lang.Long.toString(v)
    if (s.length >= 10) s
    else {
      val sb = new java.lang.StringBuilder(10)
      var i = s.length
      while (i < 10) { sb.append('0'); i += 1 }
      sb.append(s).toString
    }
  }

  // ---- static world structure ---------------------------------------------

  /** The 20 entity families in precedence order
    * (wikipedia_crawler.py:600-761; README.md:285-320). */
  val families: Vector[String] = Vector(
    "movie", "person", "item", "character", "tmdbcollection", "episode",
    "keyword", "season", "serie", "wikidatacharacter", "other", "list",
    "movement", "collection", "group", "death", "award", "nomination",
    "topic", "technical")

  def familyRank(f: String): Int = families.indexOf(f)

  /** Language editions = hosts. en/fr hot (the commons/enwiki dominance
    * analogue, FIXTURES.md F2: 2 hot hosts carry ~60%). */
  val langs: Vector[String] = Vector(
    "en", "fr", "de", "es", "it", "pt", "ru", "ja", "zh", "pl", "nl", "sv")

  /** Zipf-ish cumulative weights: en 35%, fr 25%, rest split the tail. */
  def pickLang(h: Long): String = {
    val u = unit(h)
    if (u < 0.35) "en"
    else if (u < 0.60) "fr"
    else langs(2 + bounded(mix64(h), langs.length - 2))
  }

  def hostOf(lang: String): String = s"$lang.wikipedia.org"

  private val vocab: Vector[String] = Vector(
    "film", "director", "scene", "actor", "studio", "release", "script",
    "camera", "award", "festival", "cast", "producer", "editor", "score",
    "poster", "sequel", "critic", "review", "premiere", "budget", "plot",
    "archive", "museum", "series", "episode", "character", "novel", "stage",
    "record", "label", "journal", "letter", "estate", "garden", "bridge")

  def words(h: Long, n: Int): String = {
    // r6: direct StringBuilder fill — the Range.map built a Vector of word
    // refs plus a second builder pass per call, and this is the single
    // hottest allocation site of the synthetic fetch kernel (every
    // paragraph, list item, title and caption flows through it). Output
    // byte-identical (same picks, same single-space join).
    val sb = new java.lang.StringBuilder(n * 8)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(bounded(mix(h, i.toLong), vocab.length)))
      i += 1
    }
    sb.toString
  }

  // ---- entities / frontier -------------------------------------------------

  final case class Entity(
      idx: Long,
      qid: String,        // possibly invalid (~3%)
      family: String,
      familyRank: Int,
      pk: String,         // per-family ordered key (zero-padded, ORDER BY pk ASC)
      priority: Int,
      sitelinks: Map[String, String]) // lang -> page title

  def entity(seed: Long, i: Long): Entity = {
    val h = mix(seed, 0xE117L, i)
    val qnum = Math.floorMod(mix(h, 1L), 90000000L) + 1000000L
    val invalid = unit(mix(h, 2L)) < 0.03
    val qid =
      if (!invalid) s"Q$qnum"
      else bounded(mix(h, 3L), 3) match {
        case 0 => s"X$qnum"      // wrong prefix
        case 1 => s"Q${qnum}A"   // trailing letter
        case _ => ""             // empty
      }
    val fam = families(bounded(mix(h, 4L), families.length))
    val pk = pad10(Math.floorMod(mix(h, 5L), 10000000L))
    val priority = bounded(mix(h, 6L), 10)
    // 1-3 sitelinks; primary lang Zipf-picked, extras uniform
    val primary = pickLang(mix(h, 7L))
    val nExtra = bounded(mix(h, 8L), 3)
    val extraLangs = (0 until nExtra)
      .map(k => langs(bounded(mix(h, 9L, k.toLong), langs.length)))
    val linkLangs = (Seq(primary) ++ extraLangs).distinct
    // ~15% of (qid, lang) pairs missing a title (no-page path)
    val sitelinks = linkLangs.flatMap { l =>
      if (unit(mix(h, 10L, hashStr(l))) < 0.15) None
      else Some(l -> pageTitle(h, l))
    }.toMap
    Entity(i, qid, fam, familyRank(fam), pk, priority, sitelinks)
  }

  private val accentedWords = Vector("Café", "Vérité", "Señora", "Łódź", "Ostrava–Poruba")

  /** The words(h, n) stream with each word capitalized, joined by `sep` —
    * byte-identical to `words(h, n).split(" ").map(_.capitalize)
    * .mkString(sep)` (vocab words are non-empty and space-free), without
    * the split/map/join allocations (r6: every title and image name flows
    * through this). */
  private def capWords(h: Long, n: Int, sep: Char): String = {
    val sb = new java.lang.StringBuilder(n * 8)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(sep)
      val w = vocab(bounded(mix(h, i.toLong), vocab.length))
      sb.append(Character.toUpperCase(w.charAt(0))).append(w, 1, w.length)
      i += 1
    }
    sb.toString
  }

  def pageTitle(entityHash: Long, lang: String): String = {
    val h = mix(entityHash, 11L, hashStr(lang))
    val base0 = capWords(h, 2 + bounded(mix64(h), 3), ' ')
    // ~4% titles carry non-ASCII (exercises F1 percent-encoding)
    val base =
      if (unit(mix(h, 15L)) < 0.04)
        accentedWords(bounded(mix(h, 16L), accentedWords.length)) + " " + base0
      else base0
    // ~10% titles carry an intra-title " - " (exercises en-dash escape)
    if (unit(mix(h, 12L)) < 0.10) base + " - " + (1900 + bounded(mix(h, 13L), 120))
    else base
  }

  /** The raw frontier row for an entity in a family (pre-canonicalization
    * URL; ~5% emit a near-duplicate variant differing only by
    * case/fragment/query-order — FIXTURES.md F2). */
  def frontierUrl(e: Entity, lang: String, title: String, variant: Boolean): String = {
    val t = title.replace(' ', '_')
    val base = s"https://${hostOf(lang)}/wiki/$t?ref=crawl&v=1"
    if (!variant) base
    else {
      val h = mix(hashStr(base), 14L)
      bounded(h, 3) match {
        case 0 => s"HTTPS://${hostOf(lang).toUpperCase}/wiki/$t?ref=crawl&v=1"
        case 1 => base + "#section-2"
        case _ => s"https://${hostOf(lang)}/wiki/$t?v=1&ref=crawl"
      }
    }
  }

  /** A raw frontier row (S1 analogue — one per (entity, family) plus noise). */
  final case class FrontierRow(
      url: String, host: String, family: String, familyRank: Int,
      pk: String, priority: Int, qid: String)

  /** One sitelink dimension row (S4 analogue — the wbgetentities build side). */
  final case class SitelinkRow(qid: String, lang: String, langRank: Int, title: String)

  /** Frontier rows for entity i: the primary family row, ~10% a second
    * (later-processed) family row (exercises precedence dedup), ~5% a
    * near-duplicate URL variant (exercises canonicalization dedup). */
  /** Frontier-only fields of entity i — same hash streams as [[entity]]
    * (field hashes are independent), skipping title generation entirely:
    * the frontier never carries titles (wikipedia_crawler.py:86-95 selects
    * only (pk, ID_WIKIDATA)). */
  def entityFrontier(seed: Long, i: Long): Entity = {
    val h = mix(seed, 0xE117L, i)
    val qnum = Math.floorMod(mix(h, 1L), 90000000L) + 1000000L
    val invalid = unit(mix(h, 2L)) < 0.03
    val qid =
      if (!invalid) s"Q$qnum"
      else bounded(mix(h, 3L), 3) match {
        case 0 => s"X$qnum"
        case 1 => s"Q${qnum}A"
        case _ => ""
      }
    val fam = families(bounded(mix(h, 4L), families.length))
    val pk = pad10(Math.floorMod(mix(h, 5L), 10000000L))
    val priority = bounded(mix(h, 6L), 10)
    Entity(i, qid, fam, familyRank(fam), pk, priority, Map.empty)
  }

  def frontierRows(seed: Long, i: Long): Seq[FrontierRow] = {
    val e = entityFrontier(seed, i)
    val h = mix(seed, 0xF407L, i)
    val url = s"https://www.wikidata.org/wiki/${e.qid}?ref=crawl&v=1"
    val rows = Vector.newBuilder[FrontierRow]
    rows += FrontierRow(url, "www.wikidata.org", e.family, e.familyRank, e.pk, e.priority, e.qid)
    if (unit(mix(h, 1L)) < 0.10) { // duplicate entity in a second family
      val fam2 = families(bounded(mix(h, 2L), families.length))
      val pk2 = pad10(Math.floorMod(mix(h, 3L), 10000000L))
      rows += FrontierRow(url, "www.wikidata.org", fam2, familyRank(fam2), pk2, e.priority, e.qid)
    }
    if (unit(mix(h, 4L)) < 0.05) { // URL near-duplicate variant
      val variant = bounded(mix(h, 5L), 3) match {
        case 0 => s"HTTPS://WWW.WIKIDATA.ORG/wiki/${e.qid}?ref=crawl&v=1"
        case 1 => url + "#sitelinks"
        case _ => s"https://www.wikidata.org/wiki/${e.qid}?v=1&ref=crawl"
      }
      rows += FrontierRow(variant, "www.wikidata.org", e.family, e.familyRank, e.pk, e.priority, e.qid)
    }
    rows.result()
  }

  def sitelinkRows(seed: Long, i: Long): Seq[SitelinkRow] = {
    val e = entity(seed, i)
    e.sitelinks.toSeq.sortBy { case (l, _) => langs.indexOf(l) }
      .map { case (l, t) => SitelinkRow(e.qid, l, langs.indexOf(l), t) }
  }

  // ---- page plan (the deterministic "Wikipedia") ---------------------------

  final case class ImagePlan(
      fileTitle: String,   // namespaced "File:Name" form
      url: String,         // upload.wikimedia.org canonical URL
      caption: String,     // EXPECTED extracted caption (test ground truth;
                           // the engine must derive it from the HTML, J7)
      mime: String,        // ~5% non-image media (P6 must drop them)
      isChrome: Boolean,   // ground truth for tests (filter must agree)
      shape: String,       // caption container: figure/gallerybox/thumb/
                           //   infobox/legend, or "none" (not in the HTML)
      renderedCaption: String) // caption markup as rendered (entities/tags)

  /** P9 — families that store a main image (CONTENT_CONFIG imagetable !=
    * "", wikipedia_page_writer.py:41-62: keyword/season/other have none). */
  val familiesWithImages: Set[String] =
    families.toSet -- Set("keyword", "season", "other", "technical")

  final case class PagePlan(
      qid: String,
      lang: String,
      title: String,
      httpStatus: Int,           // final status after retries
      transientFailures: Int,    // 503s before success (retry policy C4/C5)
      hasContent: Boolean,
      leadImageUrl: String,      // "" when none; may be chrome (must be rejected)
      blocks: Seq[graft.parse.SectionParser.Block],
      images: Seq[ImagePlan])

  /** Chrome filename families actually caught by the P4 filter, and the
    * known lookalikes that MUST survive it (wikipedia_images.py:146-171). */
  private val chromeNames = Vector(
    "OOjs_UI_icon_edit-ltr-progressive.svg", "Commons-logo.svg",
    "Wikidata-logo.svg", "Ambox_important.svg", "Stub_icon_film.svg",
    "Disambig_gray.svg", "Question_book-new.svg", "Wiki_letter_w.svg",
    "2017-fr.wp-orange-source.svg", "Edit-clear.svg", "Merge-arrow.svg",
    "Information_icon.svg", "Text_document_with_red_question_mark.svg",
    "Cscr-featured.svg", "Increase2.svg", "Yes_check.svg", "X_mark.svg",
    "Magnify-clip.png", "Broom_icon.svg", "Searchtool.svg",
    "Speaker_Icon.svg", "Blue_pencil.svg", "Nuvola_apps_kaboodle.svg",
    "Crystal_Clear_app_kaboodle.png", "Gnome-mime-sound-openclipart.svg",
    "Emblem-important.svg", "Symbol_support_vote.svg", "Portal-puzzle.svg",
    "Logo_disambig.svg", "langfr-120px-Blue_pencil.svg.png",
    "960px-Commons-logo.svg.png")

  private val lookalikeNames = Vector(
    "Crystal_Pite.jpg", "Emblem_of_New_Caledonia.svg",
    "X_Marks_the_Spot_poster.jpg", "Portal_2_Official_Logo.png",
    "GNOME_Shell.png", "Broome_LGA_WA.png", "Symbol_of_Tokyo_Metropolis.svg",
    "Emblem-Ramakrishna-Mission-Transparent.png", "Lock-of-Youth.jpg")

  def uploadUrl(name: String): String = {
    val h = Math.floorMod(hashStr(name), 256L)
    val a = Integer.toHexString((h >> 4).toInt & 0xF)
    val ab = a + Integer.toHexString(h.toInt & 0xF)
    s"https://upload.wikimedia.org/wikipedia/commons/$a/$ab/$name"
  }

  import graft.parse.SectionParser.{Block, TextBlock, ListBlock}

  private def paragraph(h: Long): TextBlock = {
    val base = words(h, 12 + bounded(mix64(h), 28))
    // ~8% of paragraphs carry a "[edit]" marker the writer must strip
    val text = if (unit(mix(h, 20L)) < 0.08) base + "[edit]" else base
    TextBlock("p", text)
  }

  private def listBlock(h: Long): ListBlock = {
    val tag = if (unit(mix(h, 21L)) < 0.5) "ul" else "ol"
    val n = 1 + bounded(mix(h, 22L), 4)
    ListBlock(tag, (0 until n).map(i => words(mix(h, 23L, i.toLong), 3 + bounded(mix(h, 24L, i.toLong), 4))))
  }

  private def bodyBlock(h: Long): Block = bounded(mix(h, 25L), 10) match {
    case 0 | 1    => listBlock(h)
    case 2        => TextBlock("h4", words(mix(h, 26L), 2).capitalize)
    case _        => paragraph(h)
  }

  private val noSubsplitPool = Vector(
    "References", "See also", "External links", "Notes",
    "Références", "Voir aussi", "Liens externes", "Bibliographie")

  /** The full deterministic page for (qid, lang) — the synthetic stand-in
    * for the parse-API response (wikipedia_page_writer.py:108-188). */
  def pagePlan(seed: Long, qid: String, lang: String, title: String,
               family: String): PagePlan = {
    val h = mix(seed, hashStr(qid), hashStr(lang), 0xBEEFL)
    // status: 90% clean 200; 5% 200 after 1-3 transient 503s (3 = the full
    // retry budget — still a success, urllib3 Retry(total=3) semantics);
    // 3% 404; 2% hard 503 (4 transients = budget exhausted)
    val u = unit(mix(h, 30L))
    val (status, transients) =
      if (u < 0.90) (200, 0)
      else if (u < 0.95) (200, 1 + bounded(mix(h, 31L), 3))
      else if (u < 0.98) (404, 0)
      else (503, 4)
    val hasContent = status == 200 && unit(mix(h, 32L)) < 0.97

    // lead image (~70%); of those ~10% chrome (must be rejected, M1 rule)
    val leadImage =
      if (unit(mix(h, 33L)) >= 0.70) ""
      else if (unit(mix(h, 34L)) < 0.10) uploadUrl(chromeNames(bounded(mix(h, 35L), chromeNames.length)))
      else uploadUrl(realImageName(mix(h, 36L)))

    // body blocks
    val blocks = Vector.newBuilder[Block]
    if (hasContent) {
      val nIntro = bounded(mix(h, 40L), 4) // 0-3 intro blocks
      (0 until nIntro).foreach(i => blocks += bodyBlock(mix(h, 41L, i.toLong)))
      // 0-41 h2 sections (plus h3 subsections ⇒ ~60-80 emitted section rows
      // per doc, matching the reference's production ratio of ~76 section
      // rows per (doc, lang): 177.2M rows over ~2.33M page-langs,
      // doc/sql/Wikipedia-tables.sql:39,117)
      val nH2 = bounded(mix(h, 42L), 42)
      (0 until nH2).foreach { s =>
        val hs = mix(h, 43L, s.toLong)
        // ~20% of pages end with a no-subsplit end-matter section
        val isEndMatter = s == nH2 - 1 && unit(mix(h, 44L)) < 0.20
        val h2Title =
          if (isEndMatter) noSubsplitPool(bounded(mix(hs, 45L), noSubsplitPool.length))
          else {
            val t = words(mix(hs, 46L), 1 + bounded(mix(hs, 47L), 3)).capitalize
            if (unit(mix(hs, 48L)) < 0.10) t + " - " + (1900 + bounded(mix(hs, 49L), 120))
            else t
          }
        blocks += TextBlock("h2", h2Title)
        val nLead = bounded(mix(hs, 50L), 3)
        (0 until nLead).foreach(i => blocks += bodyBlock(mix(hs, 51L, i.toLong)))
        val nH3 = bounded(mix(hs, 52L), 5) // 0-4 subsections (h3 also emitted in end-matter; parser must inline them there)
        (0 until nH3).foreach { t =>
          val ht = mix(hs, 53L, t.toLong)
          blocks += TextBlock("h3", words(mix(ht, 54L), 1 + bounded(mix(ht, 55L), 2)).capitalize)
          val nBody = bounded(mix(ht, 56L), 3)
          (0 until nBody).foreach(i => blocks += bodyBlock(mix(ht, 57L, i.toLong)))
        }
      }
      // movie-family French pages carry a 'Fiche technique' section (M6)
      if (family == "movie" && lang == "fr" && unit(mix(h, 58L)) < 0.8) {
        blocks += TextBlock("h2", "Fiche technique")
        val fmt = words(mix(h, 59L), 3)
        blocks += ListBlock("ul", Seq(
          "Titre : " + title,
          "Format : " + fmt,
          "Pays : France"))
      }
    }

    // gallery images: 0-12; ~15% chrome, ~2% lookalikes. Captions are NOT
    // handed to the engine: each image renders into one of the 5 caption
    // container shapes (or none) and the engine must extract the caption
    // from the HTML (J7); ImagePlan.caption carries the EXPECTED result.
    val nImages = if (hasContent) bounded(mix(h, 60L), 13) else 0
    val imagesRaw = (0 until nImages).map { i =>
      val hi = mix(h, 61L, i.toLong)
      val ui = unit(mix(hi, 62L))
      val name =
        if (ui < 0.15) chromeNames(bounded(mix(hi, 63L), chromeNames.length))
        else if (ui < 0.17) lookalikeNames(bounded(mix(hi, 64L), lookalikeNames.length))
        else realImageName(mix(hi, 65L))
      val prefix = if (lang == "fr") "Fichier:" else "File:"
      val mime =
        if (unit(mix(hi, 68L)) < 0.05) // non-image media embedded on pages
          Vector("video/ogg", "audio/ogg", "application/pdf")(bounded(mix(hi, 69L), 3))
        else if (name.endsWith(".svg")) "image/svg+xml"
        else if (name.endsWith(".png")) "image/png"
        else "image/jpeg"
      val shape = bounded(mix(hi, 72L), 20) match {
        case 0 | 1 | 2 | 3 | 4 => "figure"
        case 5 | 6 | 7 | 8 | 9 => "gallerybox"
        case 10 | 11 | 12      => "thumb"
        case 13 | 14           => "infobox"
        case 15 | 16           => "legend"
        case _                 => "none" // enumerated via API, absent in HTML
      }
      val capWords = words(mix(hi, 66L), 4 + bounded(mix(hi, 67L), 5))
      // ~8% empty caption nodes (definitive-empty path); ~3/8 of the rest
      // carry entity or inline-markup decoration the matcher must clean
      val (renderedCap, ownExpected) =
        if (unit(mix(hi, 73L)) < 0.08) ("", "")
        else bounded(mix(hi, 74L), 8) match {
          case 0 => (s"Caf&#233; $capWords", s"Café $capWords")
          case 1 =>
            val ws = capWords.split(" ")
            (s"<i>${ws.head}</i> ${ws.tail.mkString(" ")}", capWords)
          case 2 => (s"$capWords &amp; more", s"$capWords & more")
          case _ => (capWords, capWords)
        }
      ImagePlan(
        fileTitle = prefix + name.replace('_', ' '),
        url = uploadUrl(name),
        caption = ownExpected, // provisional; resolved below
        mime = mime,
        isChrome = graft.parse.UiChrome.matchesChrome(name),
        shape = shape,
        renderedCaption = renderedCap)
    }
    // Expected captions follow the matcher's first-match semantics
    // (soup.find: the FIRST rendered container of a filename answers every
    // lookup of that filename, wikipedia_images.py:450): duplicate names —
    // chrome decorations recur — inherit the first rendered caption, and a
    // "none"-shaped image still resolves if another container renders its
    // name.
    val firstRendered = scala.collection.mutable.Map.empty[String, String]
    imagesRaw.foreach { ip =>
      val name = ip.url.substring(ip.url.lastIndexOf('/') + 1)
      if (ip.shape != "none" && !firstRendered.contains(name))
        firstRendered(name) = ip.caption
    }
    val images = imagesRaw.map { ip =>
      val name = ip.url.substring(ip.url.lastIndexOf('/') + 1)
      ip.copy(caption = firstRendered.getOrElse(name, ""))
    }

    PagePlan(qid, lang, title, status, transients, hasContent, leadImage,
      blocks.result(), images)
  }

  def realImageName(h: Long): String = {
    val exts = Vector(".jpg", ".png", ".jpg", ".jpg", ".svg")
    capWords(h, 2 + bounded(mix64(h), 3), '_') +
      "_" + bounded(mix(h, 70L), 9999) + exts(bounded(mix(h, 71L), exts.length))
  }

  /** Render a plan's blocks to the markup subset the parser consumes
    * (the synthetic stand-in for the rendered-HTML parse API, S8). */
  def renderMarkup(blocks: Seq[Block]): String = {
    val sb = new java.lang.StringBuilder(1024)
    sb.append("<body>")
    renderBlocksInto(sb, blocks)
    sb.append("</body>").toString
  }

  /** [[renderMarkup]] body without the enclosing <body> tags — appends
    * straight into the caller's builder (r6: the per-block s-interpolations
    * each allocated an intermediate string before the append). */
  private def renderBlocksInto(sb: java.lang.StringBuilder, blocks: Seq[Block]): Unit =
    blocks.foreach {
      case TextBlock(name, text) =>
        sb.append('<').append(name).append('>').append(text)
          .append("</").append(name).append('>')
      case ListBlock(name, items) =>
        sb.append('<').append(name).append('>')
        items.foreach(li => sb.append("<li>").append(li).append("</li>"))
        sb.append("</").append(name).append('>')
    }

  /** Render one image's caption container (J7 marker shapes, mirrors the
    * MediaWiki structures of wikipedia_images.py:463-511). ~20% of hrefs
    * are percent-encoded (the matcher must URL-decode before comparing);
    * frwiki pages use the `Fichier:` namespace. */
  def renderImageHtml(ip: ImagePlan, lang: String): String = {
    val sb = new java.lang.StringBuilder(256)
    renderImageHtmlInto(sb, ip, lang)
    sb.toString
  }

  /** [[renderImageHtml]] appended straight into the page builder (r6: the
    * interpolated form allocated 3-5 intermediate strings per image). */
  private def renderImageHtmlInto(sb: java.lang.StringBuilder,
                                  ip: ImagePlan, lang: String): Unit = {
    if (ip.shape == "none") return
    val name = ip.url.substring(ip.url.lastIndexOf('/') + 1)
    val h = mix(hashStr(name), 0x1A6EL)
    val encName = if (unit(mix(h, 75L)) < 0.20) name.replace("_", "%5F") else name
    val prefix = if (lang == "fr") "Fichier" else "File"
    def a(): Unit =
      sb.append("""<a class="mw-file-description" href="/wiki/""")
        .append(prefix).append(':').append(encName)
        .append(""""><img src="""").append(ip.url).append(""""/></a>""")
    val cap = ip.renderedCaption
    ip.shape match {
      case "figure" =>
        sb.append("""<figure typeof="mw:File/Thumb">"""); a()
        sb.append("<figcaption>").append(cap).append("</figcaption></figure>")
      case "gallerybox" =>
        // img sits in an inner class=thumb WITHOUT a thumbcaption: the
        // matcher must keep walking up to the gallerybox (the reference's
        // explicit non-definitive thumb case, wikipedia_images.py:484-485)
        sb.append("""<ul class="gallery"><li class="gallerybox"><div class="thumb">""")
        a()
        sb.append("""</div><div class="gallerytext">""").append(cap)
          .append("</div></li></ul>")
      case "thumb" =>
        sb.append("""<div class="thumb tright"><div class="thumbinner">"""); a()
        sb.append("""<div class="thumbcaption">""").append(cap)
          .append("</div></div></div>")
      case "infobox" =>
        if (bounded(mix(h, 76L), 2) == 0) {
          sb.append("""<table class="infobox"><tr><td class="infobox-image">""")
          a()
          sb.append("""<div class="infobox-caption">""").append(cap)
            .append("</div></td></tr></table>")
        } else { // caption on the NEXT table row (the tr-sibling path, :495-503)
          sb.append("""<table class="infobox"><tr><td class="infobox-image">""")
          a()
          sb.append("""</td></tr><tr><td><div class="infobox-caption">""")
            .append(cap).append("</div></td></tr></table>")
        }
      case "legend" => // frwiki infobox shape: caption in a SIBLING div
        sb.append("""<div class="images">"""); a()
        sb.append("""</div><div class="legend">""").append(cap).append("</div>")
    }
  }

  /** The full rendered page: section blocks + image containers — ONE
    * document serving both the section parser and the caption matcher
    * (the reference's Phase-1b single-fetch shape). */
  def renderPage(plan: PagePlan): String = {
    // r6: one builder for the whole page — the previous form rendered the
    // block markup, copied it once to strip "</body>", built a Vector of
    // per-image strings, joined them, and concatenated again (4 full-page
    // copies per fetch)
    val sb = new java.lang.StringBuilder(4096)
    sb.append("<body>")
    renderBlocksInto(sb, plan.blocks)
    plan.images.foreach(ip => renderImageHtmlInto(sb, ip, plan.lang))
    sb.append("</body>").toString
  }

  /** Robots rules (FIXTURES.md F4): deterministic per (host, first path
    * letter): ~5% of (host, letter) buckets are disallowed. */
  def robotsAllowed(seed: Long, host: String, path: String): Boolean = {
    val c = path.drop("/wiki/".length).headOption.getOrElse('_').toLower
    unit(mix(seed, 0x0B07L, hashStr(host), c.toLong)) >= 0.05
  }
}
