package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.canon.UrlCanon
import graft.oracle.OracleCrawler
import graft.synth.World

class CanonSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val corpus: Seq[String] = Seq(
    "https://en.wikipedia.org/wiki/Citizen_Kane",
    "HTTPS://EN.WIKIPEDIA.ORG/wiki/Citizen_Kane",
    "https://en.wikipedia.org:443/wiki/Citizen_Kane",
    "http://example.org:80/a/b?z=1&a=2",
    "https://fr.wikipedia.org/wiki/Q42?b=2&a=1#frag",
    "https://fr.wikipedia.org/wiki/Q42?a=1&b=2",
    "https://host.org/wiki/T#x",
    "https://host.org",
    "https://host.org/",
    "en.wikipedia.org/wiki/NoScheme",
    "https://www.wikidata.org/wiki/Q1204187?ref=crawl&v=1"
  ) ++ (0L until 300L).flatMap(i => World.frontierRows(42L, i).map(_.url))

  test("pure and column canonicalization twins agree byte-for-byte") {
    val got = corpus.toDF("url")
      .select($"url", UrlCanon.canonCol($"url").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (url, viaCol) =>
      assert(viaCol == UrlCanon.canonicalize(url), s"mismatch for $url")
    }
  }

  test("canonicalization is idempotent") {
    corpus.foreach { u =>
      val c = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(c) == c, s"not idempotent: $u -> $c")
    }
  }

  test("variants collapse to the same canonical form") {
    assert(UrlCanon.canonicalize("HTTPS://WWW.WIKIDATA.ORG/wiki/Q5?ref=crawl&v=1")
      == UrlCanon.canonicalize("https://www.wikidata.org/wiki/Q5?ref=crawl&v=1"))
    // path case IS significant (only scheme/host are case-insensitive)
    assert(UrlCanon.canonicalize("https://h.org/wiki/q5")
      != UrlCanon.canonicalize("https://h.org/wiki/Q5"))
    assert(UrlCanon.canonicalize("https://www.wikidata.org/wiki/Q5?v=1&ref=crawl")
      == UrlCanon.canonicalize("https://www.wikidata.org/wiki/Q5?ref=crawl&v=1"))
    assert(UrlCanon.canonicalize("https://www.wikidata.org/wiki/Q5?ref=crawl&v=1#x")
      == UrlCanon.canonicalize("https://www.wikidata.org/wiki/Q5?ref=crawl&v=1"))
  }

  test("oracle xxhash64 matches Spark's xxhash64 (salt-bucket twin)") {
    val got = corpus.toDF("url").select($"url", xxhash64($"url").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (u, sparkHash) =>
      val ours = OracleCrawler.xxhash64(
        u.getBytes(java.nio.charset.StandardCharsets.UTF_8), 42L)
      assert(ours == sparkHash, s"xxhash64 mismatch for $u")
    }
  }

  test("host extraction twins agree") {
    corpus.map(UrlCanon.canonicalize).foreach { c =>
      val viaCol = Seq(c).toDF("u").select(UrlCanon.hostCol($"u")).head.getString(0)
      assert(viaCol == UrlCanon.hostOf(c), s"host mismatch for $c")
    }
  }
}
