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

    // computed once per node (r6): the caption matcher's ancestor walk and
    // container probes re-read classes per visit, and the split+toSet
    // allocated each time
    private var _classes: Set[String] = null
    def classes: Set[String] = {
      if (_classes == null)
        _classes = attrs.get("class")
          .map(_.split("\\s+").filter(_.nonEmpty).toSet)
          .getOrElse(Set.empty)
      _classes
    }

    def isElement: Boolean = tag.nonEmpty

    /** Depth-first descendants (this node excluded), document order. */
    def descendants: Iterator[Node] =
      children.iterator.flatMap(c => Iterator.single(c) ++ c.descendants)

    /** Pre-order descendant walk without the iterator-concat churn of
      * [[descendants]] (r6: the recursive `++`/flatMap chain allocated an
      * iterator wrapper per node; these walks run on every fetched page). */
    def foreachDescendant(f: Node => Unit): Unit = {
      var i = 0
      val cs = children
      while (i < cs.length) {
        val c = cs(i)
        f(c)
        c.foreachDescendant(f)
        i += 1
      }
    }

    def findFirst(p: Node => Boolean): Option[Node] = {
      // same pre-order visit as descendants.find, early-exit, no iterators
      var res: Node = null
      def walk(n: Node): Boolean = {
        var i = 0
        val cs = n.children
        while (i < cs.length) {
          val c = cs(i)
          if (c.isElement && p(c)) { res = c; return true }
          if (walk(c)) return true
          i += 1
        }
        false
      }
      walk(this)
      Option(res)
    }

    /** BeautifulSoup's get_text(" ", strip=True): each text string
      * stripped, empties dropped, joined with one space. Entity references
      * in text decode exactly as an HTML parser would (F8 kernel). */
    def getTextStripped: String = {
      val sb = new java.lang.StringBuilder
      def add(n: Node): Unit = if (!n.isElement) {
        val t = graft.ops.TextOps.unescapeHtml(n.text).trim
        if (t.nonEmpty) {
          if (sb.length > 0) sb.append(' ')
          sb.append(t)
        }
      }
      add(this)
      foreachDescendant(add)
      sb.toString
    }

    /** Following siblings in document order. */
    def nextSiblings: Iterator[Node] =
      if (parent == null) Iterator.empty
      else parent.children.iterator.dropWhile(_ ne this).drop(1)

    def ancestors: Iterator[Node] =
      Iterator.iterate(parent)(_.parent).takeWhile(_ != null)
  }

  /** Tags that never wrap children in this subset (void elements). */
  private val voidTags = Set("img", "br", "hr", "meta", "link", "input")

  /** Hand-rolled single-pass scanner (no regex): this runs once per
    * fetched page inside the hot fetch+parse kernel, and the regex
    * tokenizer it replaced was measured at ~2× the whole kernel's prior
    * cost. */
  def parse(html: String): Node = {
    val root = new Node("#root", Map.empty, null)
    var cur = root
    val len = html.length
    var i = 0
    var textStart = 0

    def flushText(end: Int): Unit = if (end > textStart) {
      var k = textStart
      var allWs = true
      while (k < end && allWs) {
        if (!Character.isWhitespace(html.charAt(k))) allWs = false
        k += 1
      }
      if (!allWs) {
        val n = new Node("", Map.empty, cur)
        n.text = html.substring(textStart, end)
        cur.children += n
      }
    }

    while (i < len) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        flushText(len); i = len; textStart = len
      } else {
        var j = lt + 1
        val closing = j < len && html.charAt(j) == '/'
        if (closing) j += 1
        val nameStart = j
        while (j < len && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
        if (j == nameStart) {
          // bare '<' in text — keep scanning, the char stays in the text run
          i = lt + 1
        } else {
          flushText(lt)
          val name = html.substring(nameStart, j).toLowerCase
          var attrs = Map.empty[String, String]
          var selfClosed = false
          var done = false
          while (!done && j < len) {
            val c = html.charAt(j)
            if (c == '>') { done = true; j += 1 }
            else if (c == '/') { selfClosed = true; j += 1 }
            else if (Character.isWhitespace(c)) j += 1
            else {
              val as = j
              while (j < len && {
                val a = html.charAt(j)
                Character.isLetterOrDigit(a) || a == '-' || a == ':'
              }) j += 1
              val an = html.substring(as, j).toLowerCase
              while (j < len && Character.isWhitespace(html.charAt(j))) j += 1
              if (j < len && html.charAt(j) == '=') {
                j += 1
                while (j < len && Character.isWhitespace(html.charAt(j))) j += 1
                if (j < len && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j)
                  val vs = j + 1
                  val ve = html.indexOf(q, vs)
                  attrs = attrs.updated(an,
                    html.substring(vs, if (ve < 0) len else ve))
                  j = if (ve < 0) len else ve + 1
                } else {
                  val vs = j
                  while (j < len && !Character.isWhitespace(html.charAt(j)) &&
                    html.charAt(j) != '>') j += 1
                  attrs = attrs.updated(an, html.substring(vs, j))
                }
              } else if (an.nonEmpty) attrs = attrs.updated(an, "")
              else j += 1 // defensive: never stall on an unexpected char
            }
          }
          if (closing) {
            // pop to the matching open tag (tolerant of stray closers)
            var n = cur
            while (n != null && n.tag != name) n = n.parent
            if (n != null && n.parent != null) cur = n.parent
            else if (n != null) cur = root
          } else {
            val n = new Node(name, attrs, cur)
            cur.children += n
            if (!selfClosed && !voidTags.contains(name)) cur = n
          }
          i = j
          textStart = j
        }
      }
    }
    root
  }
}
