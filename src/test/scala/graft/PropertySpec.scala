package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.canon.UrlCanon
import graft.oracle.OracleCrawler
import graft.parse.SectionParser
import graft.synth.World

/** SURVEY.md §5 property tests: canonicalization idempotence, Bloom
  * no-false-negatives, salting preserves per-host grouping, parser total
  * ordering. */
class PropertySpec extends AnyFunSuite {

  // minimal deterministic property driver over scalacheck Gen (the
  // scalatest-scalacheck bridge isn't in the offline cache)
  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val genHost = Gen.oneOf(World.langs.map(World.hostOf))
  private val genPathSeg = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
  private val genQuery = Gen.listOfN(3,
    Gen.zip(Gen.alphaLowerStr.map(_.take(3)), Gen.numStr.map(_.take(3))))
    .map(_.map { case (k, v) => s"$k=$v" })
  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS", "Http")
    host <- genHost
    hostCased <- Gen.oneOf(host, host.toUpperCase)
    seg <- genPathSeg
    q <- genQuery
    frag <- Gen.oneOf("", "#x", "#section-2")
  } yield s"$scheme://$hostCased/wiki/$seg?${q.mkString("&")}$frag"

  test("exact-arity mix overloads equal the varargs fold (world determinism pin)") {
    import graft.synth.World.mix
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      val c = rnd.nextLong(); val d = rnd.nextLong()
      assert(mix(a, b) == mix(Seq(a, b): _*))
      assert(mix(a, b, c) == mix(Seq(a, b, c): _*))
      assert(mix(a, b, c, d) == mix(Seq(a, b, c, d): _*))
    }
  }

  test("canonicalization is idempotent: canon(canon(u)) == canon(u)") {
    forAll(genUrl) { u =>
      val c = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(c) == c)
    }
  }

  test("canonicalization is invariant to query order, fragment, scheme/host case") {
    forAll(genUrl) { u =>
      val c = UrlCanon.canonicalize(u)
      val noFrag = u.split("#")(0)
      assert(UrlCanon.canonicalize(noFrag) == c)
      val (pre, q) = noFrag.span(_ != '?')
      if (q.nonEmpty) {
        val shuffled = pre + "?" + q.drop(1).split("&").reverse.mkString("&")
        assert(UrlCanon.canonicalize(shuffled) == c)
      }
    }
  }

  test("host extraction agrees with canonical host and is lowercase") {
    forAll(genUrl) { u =>
      val h = UrlCanon.hostOf(UrlCanon.canonicalize(u))
      assert(h == h.toLowerCase)
      assert(World.langs.map(World.hostOf).contains(h))
    }
  }

  test("bloom filter never false-negatives") {
    import org.apache.spark.util.sketch.BloomFilter
    forAll(Gen.listOfN(200, genUrl)) { urls =>
      val bf = BloomFilter.create(1024, 0.01)
      urls.foreach(bf.putString)
      urls.foreach(u => assert(bf.mightContainString(u)))
    }
  }

  test("native BloomProbe expression ≡ mightContainString, codegen and interpreted") {
    import org.apache.spark.util.sketch.BloomFilter
    val spark = SparkTestSession.spark
    import spark.implicits._
    val inserted = Seq("https://en.wikipedia.org/wiki/Q1",
      "https://fr.wikipedia.org/wiki/%C3%89t%C3%A9", // percent-escapes
      "https://ja.wikipedia.org/wiki/東京",            // multi-byte UTF-8
      "plain", "")
    val bf = BloomFilter.create(1024, 0.01)
    inserted.foreach(bf.putString)
    val probes: Seq[String] =
      inserted ++ Seq("https://en.wikipedia.org/wiki/Q2", "東京", null)
    val bc = spark.sparkContext.broadcast(bf)
    val df = probes.toDF("url")
    val expect = probes.map(u => if (u == null) null else bf.mightContainString(u))
    def run(): Seq[Any] = df
      .select($"url", graft.functions.BloomProbe.probe($"url", bc).as("hit"))
      .collect().toSeq
      .map(r => if (r.isNullAt(1)) null else r.getBoolean(1))
    assert(run() == expect) // whole-stage codegen path (default on)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == expect) // interpreted nullSafeEval path
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("salt buckets are stable and partition each host's urls completely") {
    forAll(genUrl, Gen.chooseNum(1, 16)) { (u, s) =>
      val b = OracleCrawler.saltOf(u, s)
      assert(b >= 0 && b < s)
      assert(OracleCrawler.saltOf(u, s) == b) // stable
    }
  }

  test("sortKey ordering is total and consistent with its components") {
    val genParts = for {
      p <- Gen.chooseNum(0, 9); fr <- Gen.chooseNum(0, 19)
      pk <- Gen.numStr.map(x => f"${x.take(9).padTo(9, '0')}%s")
      lr <- Gen.chooseNum(0, 11); q <- Gen.chooseNum(1000000L, 99999999L)
    } yield (p, fr, pk, lr, s"Q$q")
    forAll(genParts, genParts) { (a, b) =>
      val ka = Crawl.sortKey(a._1, a._2, a._3, a._4, a._5)
      val kb = Crawl.sortKey(b._1, b._2, b._3, b._4, b._5)
      // higher priority sorts strictly first regardless of other fields
      if (a._1 > b._1) assert(ka < kb)
      // identical components give identical keys
      assert(Crawl.sortKey(a._1, a._2, a._3, a._4, a._5) == ka)
    }
  }

  private val Crawl = graft.crawl.Crawl

  test("parser emits sections in document order with Intro first") {
    val genBlocks = Gen.listOf(Gen.oneOf(
      Gen.alphaStr.map(t => SectionParser.TextBlock("p", t.take(20))),
      Gen.alphaStr.suchThat(_.nonEmpty).map(t => SectionParser.TextBlock("h2", t.take(10))),
      Gen.alphaStr.map(t => SectionParser.TextBlock("h3", t.take(10)))))
    forAll(genBlocks) { blocks =>
      val out = SectionParser.extractTitlesAndText(World.renderMarkup(blocks))
      assert(out.nonEmpty && out.head._1 == "Intro")
      // display order assignment is dense and 1-based
      val rows = SectionParser.toSectionRows(out)
      assert(rows.map(_._1) == (1 to rows.length))
    }
  }
}
