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

  private def shingleDF(spark: SparkSession, dir: String) = {
    import spark.implicits._
    t(spark, dir, "documents").select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, tx) => (id, Sigs.shingles(tx).sorted) }
      .toDF("doc_id", "sh")
  }

  private def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)), 6)

  /** Candidate pairs via MinHash LSH banding (b bands × r rows), verified
    * with exact shingle Jaccard ≥ threshold. */
  def minhashPairs(spark: SparkSession, dir: String,
                   b: Int = 16, r: Int = 4,
                   threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    // one pass per doc: signature → band keys (no shingle explode)
    val banded = t(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, tx) =>
        Sigs.bands(Sigs.minhash(tx, b * r), b, r).map(bk => (id, bk)) }
      .toDF("doc_id", "bandKey")

    val cand = banded.as("a")
      .join(banded.as("b"), Seq("bandKey"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()

    val sh = shingleDF(spark, dir)
    cand
      .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
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
    * Brute-force cosine is the test-time baseline (AnnOps.cosine). */
  def embeddingNearDup(spark: SparkSession, dir: String,
                       nBits: Int = 6, threshold: Double = 0.25): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, Sigs.signBucket(v, nBits)) }
      .toDF("vec_id", "embedding", "bucket")
    emb.as("a").join(emb.as("b"), Seq("bucket"))
      .filter($"a.vec_id" < $"b.vec_id")
      .withColumn("cos", round(AnnOps.cosine($"a.embedding", $"b.embedding"), 6))
      .filter($"cos" >= threshold)
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"), $"cos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
        |FROM documents GROUP BY md5(substr(text, 1, 20)) HAVING count(*) > 1""".stripMargin)
}
