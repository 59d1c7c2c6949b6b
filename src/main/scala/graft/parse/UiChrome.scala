package graft.parse

import java.util.regex.Pattern

/** MediaWiki UI-chrome / template-decoration filename filter (operator P4).
  *
  * Reproduces the three pattern batteries of the reference
  * (wikipedia_images.py:97-272) exactly: anchored chrome patterns, icon-set
  * patterns gated on flat-graphic extensions, and the substring battery
  * (`disambig`). Thumbnail prefixes (`[lang...-]NNNpx-`) are stripped before
  * matching (wikipedia_images.py:243-245) and the known false-positive
  * lookalikes (Crystal_Pite.jpg, Emblem_of_New_Caledonia.svg,
  * X_Marks_the_Spot_poster.jpg, ...) must survive — covered by tests.
  *
  * Pure Scala predicate, used both row-at-a-time by the oracle and inside
  * the Spark parse stage (a deterministic scalar — kept as a compiled-regex
  * Scala function rather than an rlike battery because the 36 patterns would
  * bloat codegen; it runs once per image, not per row scan).
  */
object UiChrome {

  private def p(re: String) = Pattern.compile(re, Pattern.CASE_INSENSITIVE)

  // Anchored battery — wikipedia_images.py:97-130 (Python re.match = find at start)
  private val chromePatterns: Seq[Pattern] = Seq(
    p("^OOjs_UI_icon_"),
    p("^(Commons|Wikidata|Wikiquote|Wikisource|Wikibooks|Wikinews|Wikiversity|Wikivoyage|Wiktionary|Wikimedia|Wikipedia)-logo"),
    p("^(Padlock|Lock)-(green|blue|red|yellow|silver|gray|grey|pink|purple|black|white|semi|full|protect|move|office|pp)"),
    p("^(Ambox|Imbox|Tmbox|Cmbox|Ombox|Fmbox)"),
    p("^Stub_icon"),
    p("^Disambig"),
    p("^Question_book"),
    p("^Wiki_letter_w"),
    p("^\\d{4}-[a-z]{2}\\.wp-"),
    p("^Edit-(clear|copy|undo|redo|paste|cut|find)"),
    p("^(Merge|Split)-(arrow|split|transwiki)"),
    p("^(Information|Warning|Error)[-_]?icon"),
    p("^Text_document_with"),
    p("^Cscr-"),
    p("^Translation_(to_[a-z]{2,}_)?arrow"),
    p("^(Increase|Decrease|Steady)2?\\.svg$"),
    p("^Yes_check[._]"),
    p("^X_mark[._]"),
    p("^Magnify-clip"),
    p("^Broom_icon"),
    p("^Searchtool[._]"),
    p("^Speaker_Icon[._]")
  )

  // Icon-set battery, gated on .svg/.png — wikipedia_images.py:146-171
  private val iconsetPatterns: Seq[Pattern] = Seq(
    p("^(Blue|Red|Green)_pencil"),
    p("^Nuvola[-_]"),
    p("^Crystal_(Clear|Project|128|kcontrol|kpackage|energy|personal)[._]"),
    p("^Gnome-(mime|dev|fs|applications|document|settings|system|searchtool|globe|html|text|audio|video|image|colors)"),
    p("^Oxygen\\d"),
    p("^Emblem-(money|risk|relax|question|web|WikiVote|important|notice|star|package|photos|documents|downloads|favorite|generic|mail|new|readonly|shared|system|unreadable|urgent|symbolic|art|music|video)"),
    p("^Symbol_\\w+_(class|vote)[._]"),
    p("^Symbol_(confirmed|question|redirect|neutral|merge|move|comment|declined|related)[._]"),
    p("^Portal-puzzle"),
    p("^Portal_[\\w%.]+_[Ii]con\\.svg$")
  )

  // Substring battery (Python re.search) — wikipedia_images.py:235-237
  private val suffixPatterns: Seq[Pattern] = Seq(p("disambig"))

  /** F5 — the thumb-prefix rule (wikipedia_images.py:239-242): an optional
    * language-variant marker then a pixel-width marker. ONE definition
    * shared by the chrome predicate below and the driver-visible
    * `q_thumb_strip` column twin. */
  val ThumbPrefixRegex = "^(lang[a-z-]+-)?\\d+px-"

  private val thumbPrefix = p(ThumbPrefixRegex)

  private val iconsetExtensions = Seq(".svg", ".png")

  /** Battery application on a normalized bare filename
    * (wikipedia_images.py:239-263 `_matches_chrome`). */
  def matchesChrome(name: String): Boolean = {
    val stripped = thumbPrefix.matcher(name).replaceFirst("")
    val candidates = if (stripped != name) Seq(name, stripped) else Seq(name)
    // r6: lowercase once per name — the extension gate lowercased both
    // strings per extension probe (4 allocations per candidate)
    val nameL = name.toLowerCase
    candidates.exists { cand =>
      suffixPatterns.exists(_.matcher(cand).find()) ||
      chromePatterns.exists(_.matcher(cand).lookingAt()) || {
        val candL = if (cand eq name) nameL else cand.toLowerCase
        val flatGraphic = iconsetExtensions.exists(e =>
          candL.endsWith(e) || nameL.endsWith(e))
        flatGraphic && iconsetPatterns.exists(_.matcher(cand).lookingAt())
      }
    }
  }

  /** Namespaced File:/Fichier: title form (wikipedia_images.py:184-198). */
  def isUiChromeFile(title: String): Boolean = {
    if (title == null || title.isEmpty) return false
    val name = title.indexOf(':') match {
      case -1 => title
      case i  => title.substring(i + 1)
    }
    matchesChrome(name.replace(' ', '_'))
  }

  /** URL form: last path segment, query-stripped, URL-decoded
    * (wikipedia_images.py:266-272). */
  def isUiChromeUrl(url: String): Boolean = {
    if (url == null || url.isEmpty) return false
    val noQuery = url.split("\\?", 2)(0)
    val name = noQuery.substring(noQuery.lastIndexOf('/') + 1)
    val decoded = java.net.URLDecoder.decode(name, "UTF-8")
    matchesChrome(decoded.replace(' ', '_'))
  }

  /** M1 guard — only a non-chrome lead image may be stored as main image
    * (wikipedia_images.py:275-289). */
  def isAcceptableMainImageUrl(url: String): Boolean =
    url != null && url.nonEmpty && !isUiChromeUrl(url)
}
