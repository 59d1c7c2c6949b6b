package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the engine's key-normalization step before the
  * URL-seen check (north rule) and keyed storage.
  *
  * Combines the reference's string rules (query strip for image URLs at
  * wikipedia_images.py:84-88, space→underscore at :193, title encoding at
  * wikipedia_page_writer.py:76-79) with standard crawl canonicalization:
  * lowercase scheme+host, strip default port, strip fragment, sort query
  * params, drop empty query.
  *
  * Two twin implementations, verified equal property-style in tests:
  *   - [[canonicalize]] — pure Scala, used by the single-threaded oracle
  *   - [[canonCol]] — Column-expression composition (whole-stage codegen'd;
  *     no UDF in the hot path)
  *
  * The synthetic URL grammar is `scheme://host[:port]/path[?query][#frag]`
  * with no userinfo — matching what the generator emits and what Wikipedia
  * URLs look like in the reference.
  */
object UrlCanon {

  /** Pure-Scala canonicalization (oracle twin). */
  def canonicalize(url: String): String = {
    if (url == null || url.isEmpty) return ""
    // strip fragment
    val noFrag = url.indexOf('#') match {
      case -1 => url
      case i  => url.substring(0, i)
    }
    val (beforeQ, query) = noFrag.indexOf('?') match {
      case -1 => (noFrag, "")
      case i  => (noFrag.substring(0, i), noFrag.substring(i + 1))
    }
    val schemeEnd = beforeQ.indexOf("://")
    val (scheme, rest) =
      if (schemeEnd == -1) ("", beforeQ)
      else (beforeQ.substring(0, schemeEnd).toLowerCase, beforeQ.substring(schemeEnd + 3))
    val slash = rest.indexOf('/')
    val (hostPort, path) =
      if (slash == -1) (rest, "") else (rest.substring(0, slash), rest.substring(slash))
    val host = {
      val hp = hostPort.toLowerCase
      // strip default ports
      if (scheme == "https" && hp.endsWith(":443")) hp.dropRight(4)
      else if (scheme == "http" && hp.endsWith(":80")) hp.dropRight(3)
      else hp
    }
    val sortedQuery =
      if (query.isEmpty) ""
      else "?" + query.split("&", -1).filter(_.nonEmpty).sorted.mkString("&")
    val normPath = if (path.isEmpty) "/" else path
    (if (scheme.isEmpty) "" else scheme + "://") + host + normPath + sortedQuery
  }

  /** Column twin of [[canonicalize]] — pure built-in function composition so
    * it stays inside WholeStageCodegen (SURVEY.md §2.10: expressions beat
    * UDFs). Must produce byte-identical output to the Scala twin. */
  def canonCol(url: Column): Column = {
    val noFrag  = substring_index(url, "#", 1)
    val beforeQ = substring_index(noFrag, "?", 1)
    // query = text after the first '?' ("" when absent)
    val query = when(noFrag.contains("?"),
      regexp_replace(noFrag, "^[^?]*\\?", "")).otherwise(lit(""))
    val hasScheme = beforeQ.contains("://")
    val scheme = when(hasScheme, lower(substring_index(beforeQ, "://", 1))).otherwise(lit(""))
    val rest   = regexp_replace(beforeQ, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val hostPort = substring_index(rest, "/", 1)
    val pathRaw  = regexp_extract(rest, "(/.*)", 1) // "" when no '/'
    val hostLc = lower(hostPort)
    val host = when(scheme === "https", regexp_replace(hostLc, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostLc, ":80$", ""))
      .otherwise(hostLc)
    val sortedQuery = when(query === "", lit(""))
      .otherwise(concat(lit("?"),
        array_join(array_sort(filter(split(query, "&", -1), x => x =!= "")), "&")))
    val path = when(pathRaw === "", lit("/")).otherwise(pathRaw)
    concat(
      when(scheme === "", lit("")).otherwise(concat(scheme, lit("://"))),
      host, path, sortedQuery)
  }

  /** Host extraction from a canonical URL (politeness bucketing key). */
  def hostCol(canonUrl: Column): Column =
    substring_index(substring_index(canonUrl, "://", -1), "/", 1)

  def hostOf(canonUrl: String): String = {
    val rest = canonUrl.indexOf("://") match {
      case -1 => canonUrl
      case i  => canonUrl.substring(i + 3)
    }
    rest.indexOf('/') match {
      case -1 => rest
      case i  => rest.substring(0, i)
    }
  }
}
