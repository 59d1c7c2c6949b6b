package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ColSyntax._
import graft.queries.Tables.t

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every stage is shuffle-minimal —
  *  - signatures are computed scan-side in ONE typed-map pass per row
  *    ([[Sigs]] kernels; see that file for why not Catalyst HOF lambdas);
  *  - LSH banding shuffles only (bandKey, doc_id) pairs — b rows per doc,
  *    not one per shingle;
  *  - candidate pairs come from an equi-self-join on bandKey (AQE handles
  *    skewed buckets); verification re-joins only the candidate doc ids.
  * At 10^10 docs the band join is the only O(n) shuffle; everything else
  * is embarrassingly parallel.
  */
object DedupOps {

  /** q_dedup_exact — exact dedup groups over md5(text): per-group keeper
    * (min doc_id) + group size. Hash-groupBy; one shuffle of (fp, doc_id). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5($"text").as("fp"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("group_size"))

  /** q_dedup_prefix — exact dedup on a 20-char prefix fingerprint: the
    * blocking-key variant (nonzero duplicate groups at every SF). */
  def prefixDedup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(substring($"text", 1, 20)).as("fp"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("group_size"))
      .filter($"group_size" > 1)

  private def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)), 6)

  /** Candidate pairs via MinHash LSH banding (b bands × r rows), verified
    * with exact shingle Jaccard ≥ threshold. */
  def minhashPairs(spark: SparkSession, dir: String,
                   b: Int = 16, r: Int = 4,
                   threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    // ONE shingle+signature pass per doc, persisted: band generation and
    // BOTH sides of the verify join reuse it. (Previously the shingle set
    // was recomputed 3× per doc — once for the signature, once per verify
    // side; at 10^10 docs the shingling IS the dominant CPU cost.)
    val sigs = t(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, tx) =>
        val sh = Sigs.shingles(tx).sorted
        (id, sh, Sigs.bands(Sigs.minhashOfShingles(sh, b * r), b, r)) }
      .toDF("doc_id", "sh", "bandKeys")
      .persist()

    val banded = sigs.select($"doc_id", explode($"bandKeys").as("bandKey"))
    val cand = banded.as("a")
      .join(banded.as("b"), Seq("bandKey"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()

    cand
      .join(sigs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
      .join(sigs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard($"sh_a", $"sh_b"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  def minhashDedup(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, dir)

  /** q_simhash_dedup — SimHash near-dup pairs: 4 bands of 16 bits generate
    * candidates; verified by full Hamming distance ≤ maxDist. */
  def simhashDedup(spark: SparkSession, dir: String,
                   maxDist: Int = 8): DataFrame = {
    import spark.implicits._
    val banded = t(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, tx) =>
        val sim = Sigs.simhash(tx)
        Sigs.simhashBands(sim).map(bk => (id, sim, bk)) }
      .toDF("doc_id", "sim", "bandKey")
    banded.as("a").join(banded.as("b"), Seq("bandKey"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        bit_count($"a.sim".bitwiseXOR($"b.sim")).as("dist"))
      .distinct()
      .filter($"dist" <= maxDist)
  }

  /** q_ngram_jaccard — exact n-gram Jaccard within a cheap blocking key
    * (20-char prefix); this is the "verify" operator LSH feeds at scale. */
  def ngramJaccard(spark: SparkSession, dir: String,
                   threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, tx) => (id, tx.take(20), Sigs.shingles(tx).sorted) }
      .toDF("doc_id", "blk", "sh")
    docs.as("a").join(docs.as("b"), Seq("blk"))
      .filter($"a.doc_id" < $"b.doc_id")
      .withColumn("jaccard", jaccard($"a.sh", $"b.sh"))
      .filter($"jaccard" >= threshold)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"), $"jaccard")
  }

  /** q_embedding_neardup — near-duplicate pairs by embedding cosine via
    * sign-LSH bucketing, verified with exact cosine ≥ threshold.
    * Brute-force cosine is the test-time baseline (AnnOps.cosine).
    *
    * nBits ≤ 0 (the default) sizes the hash adaptively from the table count
    * so expected bucket occupancy stays ~[[AnnOps.targetBucketSize]]: a
    * fixed width would make candidate generation O(n²/2^bits) — quadratic
    * again at 10^10 rows. The count is one metadata-cheap scan. */
  def embeddingNearDup(spark: SparkSession, dir: String,
                       nBits: Int = 0, threshold: Double = 0.25): DataFrame = {
    import spark.implicits._
    val base = t(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val bits = if (nBits > 0) nBits else AnnOps.adaptiveNBits(base.count())
    val emb = base.as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, Sigs.signBucket(v, bits)) }
      .toDF("vec_id", "embedding", "bucket")
    emb.as("a").join(emb.as("b"), Seq("bucket"))
      .filter($"a.vec_id" < $"b.vec_id")
      .withColumn("cos", round(AnnOps.cosine($"a.embedding", $"b.embedding"), 6))
      .filter($"cos" >= threshold)
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"), $"cos")
  }

  /** q_winnow_dedup — near-dup candidates by winnowing fingerprints
    * (rolling-hash document fingerprints, Sigs.winnow): inverted-index
    * self-join on fingerprint, pairs sharing ≥ minShared prints. Same
    * shuffle shape as MinHash banding — O(prints/doc) rows per doc, never
    * all-pairs; any shared run of ≥ w+k-1 chars guarantees a shared print
    * (the winnowing theorem), so copy-paste duplication cannot hide. */
  def winnowPairs(spark: SparkSession, dir: String,
                  k: Int = 24, w: Int = 16, minShared: Int = 2): DataFrame = {
    import spark.implicits._
    // k = 24 chars (~4 vocab words): long enough that unrelated docs over
    // a small vocabulary rarely share a k-gram; shared runs ≥ w+k-1 = 39
    // chars always fingerprint
    val inv = t(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, tx) => Sigs.winnow(tx, k, w).map(fp => (id, fp)) }
      .toDF("doc_id", "fp")
    inv.as("a").join(inv.as("b"), Seq("fp"))
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_winnow_dedup" -> ((s: SparkSession, d: String) => winnowPairs(s, d)),
    "q_dedup_exact" -> (exactDedup _),
    "q_dedup_prefix" -> (prefixDedup _),
    "q_minhash_dedup" -> ((s: SparkSession, d: String) => minhashDedup(s, d)),
    "q_simhash_dedup" -> ((s: SparkSession, d: String) => simhashDedup(s, d)),
    "q_ngram_jaccard" -> ((s: SparkSession, d: String) => ngramJaccard(s, d)),
    "q_embedding_neardup" -> ((s: SparkSession, d: String) => embeddingNearDup(s, d)))

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS group_size
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q_dedup_prefix" ->
      """SELECT md5(substr(text, 1, 20)) AS fp, min(doc_id) AS keeper,
        |  count(*) AS group_size
        |FROM documents GROUP BY md5(substr(text, 1, 20)) HAVING count(*) > 1""".stripMargin,
    // independent twin of the shingle kernel: word 3-grams (whole text when
    // <3 words), distinct, Jaccard = |∩|/|∪| rounded BEFORE the threshold
    // filter — exactly Sigs.shingles + DedupOps.jaccard
    "q_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 20) AS blk,
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
        |                i -> array_to_string(w[i:i+2], ' '))) END AS sh
        |  FROM (SELECT doc_id, text,
        |          regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        |)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        |  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.5""".stripMargin)
}
