package graft.oracle

import scala.collection.mutable

import graft.canon.UrlCanon
import graft.crawl.{Crawl, Fetcher}
import graft.model.Span
import graft.synth.World

/** Single-threaded reference crawler — the semantic twin the Spark engine
  * must match exactly (SURVEY.md §5: "crawl-ordering + URL-seen-set
  * equality: single-threaded oracle scheduler vs Spark scheduler under the
  * same seed list + politeness budget").
  *
  * Implements, in plain Scala collections, the same contract as
  * [[graft.crawl.Crawl]]: Qid validity, canonical-URL dedup, family
  * precedence (keep min (familyRank, pk) per qid — the reference's NOT-IN
  * exclusion chain, wikipedia_crawler.py:71-79), sitelink fan-out, robots
  * gate, salted per-host budget selection, URL-seen set. The fetch+parse
  * step shares [[Fetcher]] (a pure function), so span equality here means
  * the Spark pipeline's plumbing — not the parser — is under test; the
  * parser has its own plan-derived expectation tests.
  */
object OracleCrawler {

  final case class OracleResult(
      batches: Vector[Vector[Crawl.CrawlUnit]], // each sorted by sortKey
      seen: Set[String],
      docs: Map[String, Seq[Span]],
      scheduledOrder: Vector[String]) // doc ids in global crawl order

  /** All candidate units, single-threaded (mirror of candidateUnits). */
  def candidates(cfg: Crawl.CrawlConfig): Vector[Crawl.CrawlUnit] = {
    val qidValid = "^Q[0-9]+$".r

    // frontier rows + validity; precedence dedup keeps one row per qid
    // (URL variants are identical in every kept field, so no separate
    // canonical-dedup pass is needed — mirrors Crawl.candidateUnits)
    val frontier = (0L until cfg.nEntities).flatMap(i => World.frontierRows(cfg.seed, i))
      .filter(r => qidValid.matches(r.qid))

    val deduped = frontier.groupBy(_.qid).view.mapValues(
      _.minBy(r => (r.familyRank, r.pk, r.priority))).values.toVector

    // sitelink dimension with colliding-qid dedup by min title
    val sitelinks = (0L until cfg.nEntities)
      .flatMap(i => World.sitelinkRows(cfg.seed, i))
      .groupBy(s => (s.qid, s.lang)).view.mapValues(_.minBy(_.title)).values
      .groupBy(_.qid)

    // fan-out + robots + sortKey
    val units = deduped.flatMap { r =>
      sitelinks.getOrElse(r.qid, Nil).map { s =>
        val host = World.hostOf(s.lang)
        // twin of Spark's url_encode (both are x-www-form-urlencoded)
        val encoded = java.net.URLEncoder.encode(
          s.title.replace(' ', '_'), "UTF-8")
        val url = UrlCanon.canonicalize(s"https://$host/wiki/$encoded")
        Crawl.CrawlUnit(r.qid, s.lang, s.langRank, r.family, r.familyRank,
          r.pk, r.priority, s.title, url, host, s"${r.qid}:${s.lang}",
          Crawl.sortKey(r.priority, r.familyRank, r.pk, s.langRank, r.qid),
          saltOf(url, cfg.saltBuckets))
      }
    }.filter { u =>
      val letter = u.title.headOption.getOrElse('_').toLower
      // mirror the robots DIMENSION join: rules exist only for [a-z_];
      // any other first letter (e.g. 'ł') has no rule row → allowed
      // (the Spark side's left-join + coalesce(true))
      if ((letter >= 'a' && letter <= 'z') || letter == '_')
        World.robotsAllowed(cfg.seed, u.host, s"/wiki/$letter")
      else true
    }

    // distinct canonical URL, keep first in crawl order
    units.groupBy(_.url).view.mapValues(_.minBy(_.sortKey)).values.toVector
      .sortBy(_.sortKey)
  }

  def run(cfg: Crawl.CrawlConfig): OracleResult = {
    val all = candidates(cfg)
    val seen = mutable.LinkedHashSet.empty[String]
    val docs = mutable.Map.empty[String, Seq[Span]]
    val batches = Vector.newBuilder[Vector[Crawl.CrawlUnit]]
    val order = Vector.newBuilder[String]

    val s = cfg.saltBuckets
    val perBucket = cfg.budgetPerHost / s
    val remainder = cfg.budgetPerHost % s

    var tick = 0
    var remaining = all
    while (tick < cfg.maxTicks && remaining.nonEmpty) {
      // per-(host, salt) ranked selection — the same pure filter as
      // Crawl.selectBatch (xxhash64 twin via Spark's own hash in tests;
      // here we use the same column function through a tiny local session-
      // free implementation: Spark's xxhash64 == XxHash64Function)
      val byBucket = remaining.groupBy(u => (u.host, saltOf(u.url, s)))
      val batch = byBucket.toVector.flatMap { case ((_, salt), us) =>
        val budget = perBucket + (if (salt == 0) remainder else 0)
        us.sortBy(_.sortKey).take(budget)
      }.sortBy(_.sortKey)

      if (batch.isEmpty) {
        tick = cfg.maxTicks
      } else {
        batches += batch
        batch.foreach { u =>
          seen += u.url
          order += u.docId
          val p = Fetcher.fetchParse(cfg.seed, u.qid, u.lang, u.title,
            u.family, u.url, u.host)
          if (p.result.hasContent) docs(u.docId) = p.result.spans
        }
        val seenNow = seen.toSet
        remaining = remaining.filterNot(u => seenNow.contains(u.url))
        tick += 1
      }
    }
    OracleResult(batches.result(), seen.toSet, docs.toMap, order.result())
  }

  /** Salt bucket — must equal Spark's pmod(xxhash64(url), s).
    * Spark's xxhash64 is XXH64 with seed 42 over the UTF-8 bytes. */
  def saltOf(url: String, s: Int): Int = {
    val h = xxhash64(url.getBytes(java.nio.charset.StandardCharsets.UTF_8), 42L)
    Math.floorMod(h, s.toLong).toInt
  }

  // ---- XXH64 (public algorithm; matches Spark's xxhash64 for strings) ----
  private val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private val P3 = 1609587929392839161L
  private val P4 = -8796714831421723037L
  private val P5 = 2870177450012600261L

  def xxhash64(data: Array[Byte], seed: Long): Long = {
    val len = data.length
    var h: Long = 0L
    var i = 0
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, getLong(data, i))
        v2 = round(v2, getLong(data, i + 8))
        v3 = round(v3, getLong(data, i + 16))
        v4 = round(v4, getLong(data, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, getLong(data, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (getInt(data, i) & 0xFFFFFFFFL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (data(i) & 0xFFL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  private def getLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  private def getInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF) << 24)
}
