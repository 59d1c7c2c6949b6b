package graft.parse

import scala.collection.mutable

/** Minimal DOM over the well-formed HTML subset the synthetic renderer
  * emits (and rendered MediaWiki HTML shares): tags with quoted attributes,
  * self-closing tags, text nodes. Enough tree structure for the caption
  * matcher's ancestor walk (J7) — this is a parser for OUR markup contract,
  * not a browser-grade HTML5 recovery parser (the reference leans on
  * BeautifulSoup for that; the semantics under test are the matcher's).
  */
object MiniDom {

  final class Node(
      val tag: String, // "" for text nodes
      val attrs: Map[String, String],
      var parent: Node) {
    val children: mutable.ArrayBuffer[Node] = mutable.ArrayBuffer.empty
    var text: String = "" // text nodes only

    def classes: Set[String] =
      attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)

    def isElement: Boolean = tag.nonEmpty

    /** Depth-first descendants (this node excluded), document order. */
    def descendants: Iterator[Node] =
      children.iterator.flatMap(c => Iterator.single(c) ++ c.descendants)

    def findFirst(p: Node => Boolean): Option[Node] =
      descendants.find(n => n.isElement && p(n))

    /** BeautifulSoup's get_text(" ", strip=True): each text string
      * stripped, empties dropped, joined with one space. Entity references
      * in text decode exactly as an HTML parser would (F8 kernel). */
    def getTextStripped: String =
      (Iterator.single(this) ++ descendants)
        .filter(n => !n.isElement)
        .map(n => graft.ops.TextOps.unescapeHtml(n.text).trim)
        .filter(_.nonEmpty)
        .mkString(" ")

    /** Following siblings in document order. */
    def nextSiblings: Iterator[Node] =
      if (parent == null) Iterator.empty
      else parent.children.iterator.dropWhile(_ ne this).drop(1)

    def ancestors: Iterator[Node] =
      Iterator.iterate(parent)(_.parent).takeWhile(_ != null)
  }

  /** Tags that never wrap children in this subset (void elements). */
  private val voidTags = Set("img", "br", "hr", "meta", "link", "input")

  private val TagToken =
    """(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s+[a-zA-Z-]+(?:="[^"]*"|='[^']*')?)*)\s*(/?)>""".r
  private val AttrToken =
    """([a-zA-Z-]+)(?:="([^"]*)"|='([^']*)')?""".r

  def parse(html: String): Node = {
    val root = new Node("#root", Map.empty, null)
    var cur = root
    var pos = 0
    def addText(upTo: Int): Unit =
      if (upTo > pos) {
        val t = html.substring(pos, upTo)
        if (t.exists(!_.isWhitespace)) {
          val n = new Node("", Map.empty, cur)
          n.text = t
          cur.children += n
        }
      }
    for (m <- TagToken.findAllMatchIn(html)) {
      addText(m.start)
      pos = m.end
      val closing = m.group(1) == "/"
      val name = m.group(2).toLowerCase
      if (closing) {
        // pop to the matching open tag (tolerant of stray closers)
        var n = cur
        while (n != null && n.tag != name) n = n.parent
        if (n != null && n.parent != null) cur = n.parent
        else if (n != null) cur = root
      } else {
        val attrs = AttrToken.findAllMatchIn(m.group(3)).map { a =>
          a.group(1).toLowerCase ->
            Option(a.group(2)).orElse(Option(a.group(3))).getOrElse("")
        }.toMap
        val n = new Node(name, attrs, cur)
        cur.children += n
        val selfClosed = m.group(4) == "/" || voidTags.contains(name)
        if (!selfClosed) cur = n
      }
    }
    addText(html.length)
    root
  }
}
