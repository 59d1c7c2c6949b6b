package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.UiChrome

class UiChromeSpec extends AnyFunSuite {

  private val chrome = Seq(
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
    "Logo_disambig.svg",
    "Padlock-silver.svg", "Lock-green.svg",
    // thumbnail-prefixed forms (WIKIPEDIA-CRAWLER-021)
    "langfr-120px-Blue_pencil.svg.png", "960px-Commons-logo.svg.png",
    "120px-Disambig_gray.svg.png")

  private val legitimate = Seq(
    // the documented false-positive lookalikes that MUST survive
    "Crystal_Pite.jpg", "Emblem_of_New_Caledonia.svg",
    "X_Marks_the_Spot_poster.jpg", "Portal_2_Official_Logo.png",
    "GNOME_Shell.png", "Broome_LGA_WA.png", "Symbol_of_Tokyo_Metropolis.svg",
    "Emblem-Ramakrishna-Mission-Transparent.png",
    "Lock-of-Youth.jpg", "Lock-jaw_2857.jpg",
    "Crystal_Waters_-_Storyteller_cover.png",
    // *_icon suffix rule was deliberately REMOVED (frequency handles it)
    "GPT-5.1_icon.png", "Konami_logo_icon.svg", "Emmy_Icon.png",
    "Citizen_Kane_poster.jpg", "Apollo_11_Crew.jpg")

  test("chrome filenames are filtered") {
    chrome.foreach { n =>
      assert(UiChrome.matchesChrome(n), s"should filter: $n")
    }
  }

  test("legitimate filenames survive") {
    legitimate.foreach { n =>
      assert(!UiChrome.matchesChrome(n), s"false positive: $n")
    }
  }

  test("File:/Fichier: namespaced titles with display spaces are filtered") {
    assert(UiChrome.isUiChromeFile("File:OOjs UI icon edit-ltr-progressive.svg"))
    assert(UiChrome.isUiChromeFile("Fichier:Commons-logo.svg"))
    assert(!UiChrome.isUiChromeFile("File:Crystal Pite.jpg"))
    assert(!UiChrome.isUiChromeFile(""))
  }

  test("URL form: query-stripped, decoded, last segment") {
    assert(UiChrome.isUiChromeUrl(
      "https://upload.wikimedia.org/wikipedia/commons/3/3d/Blue_pencil.svg?x=1"))
    assert(UiChrome.isUiChromeUrl(
      "https://upload.wikimedia.org/wikipedia/commons/thumb/3/3d/Blue_pencil.svg/langfr-960px-Blue_pencil.svg.png"))
    assert(!UiChrome.isUiChromeUrl(
      "https://upload.wikimedia.org/wikipedia/commons/a/ab/Citizen_Kane_poster.jpg"))
    assert(!UiChrome.isAcceptableMainImageUrl(""))
    assert(UiChrome.isAcceptableMainImageUrl(
      "https://upload.wikimedia.org/wikipedia/commons/a/ab/Citizen_Kane_poster.jpg"))
  }
}
