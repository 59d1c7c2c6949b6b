package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.Crawl

/** Measured skew evidence for the politeness salt (C3, SCALE.md §3).
  *
  * The crawl world is host-skewed by design (en/fr carry ~60% of the
  * units — the reference's real language distribution), and a shuffle key
  * cannot split a single key's group: at 1000 executors the largest
  * (shuffle-key) cluster IS the straggler partition. The salt's scale
  * claim is therefore about the largest indivisible co-location group,
  * not about any particular partition count — this spec measures it on
  * the deterministic world rather than asserting it in prose.
  */
class SkewBalanceSpec extends AnyFunSuite {
  import SparkTestSession._

  private val buckets = 8
  private lazy val shares: (Double, Double, Long) = {
    val cfg = Crawl.CrawlConfig(seed = 42L, nEntities = 3000L,
      budgetPerHost = 64, saltBuckets = buckets, maxTicks = 1, workDir = "")
    val units = Crawl.candidateUnits(spark, cfg).toDF().persist()
    try {
      val n = units.count().toDouble
      val maxHost = units.groupBy("host").count()
        .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
      val maxHostSalt = units.groupBy("host", "salt").count()
        .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
      (maxHost / n, maxHostSalt / n, n.toLong)
    } finally units.unpersist()
  }

  test("the world is genuinely host-skewed (the test would be vacuous otherwise)") {
    val (maxHostShare, _, n) = shares
    assert(n > 1000, s"world too small to measure: $n units")
    assert(maxHostShare > 0.15,
      f"hottest host carries $maxHostShare%.3f of units — not skewed enough " +
        "to exercise the salt; the world generator changed")
  }

  test(s"salting cuts the largest co-location group ~${buckets}x on the hot host") {
    val (maxHostShare, maxSaltShare, _) = shares
    // xxhash64(url) spreads ~uniformly within a host, so the largest
    // (host, salt) group should be ~maxHost/buckets; allow 2x statistical
    // slack — anything worse means the salt stopped spreading (e.g. a
    // constant-per-host salt input) and the hot host is a straggler again
    assert(maxSaltShare <= maxHostShare * 2.0 / buckets,
      f"largest (host, salt) group carries $maxSaltShare%.4f of units vs " +
        f"hottest host $maxHostShare%.4f — salting is not spreading the hot host")
  }
}
