package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ColSyntax._
import graft.queries.Tables.t

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * sign-LSH (random-hyperplane) bucketed variant as the scale path.
  *
  * All vector math is `zip_with`/`aggregate` column expressions — no UDFs,
  * no collect. The brute-force path is one broadcast (Q queries) × scan
  * (N base) with a TakeOrderedAndProject per query; the LSH path prunes the
  * scan to matching buckets first.
  */
object AnnOps {

  /** Dot product of two float-array columns, in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // Sign-LSH bucketing lives in Sigs.signBucket (typed one-pass kernel).

  /** Expected rows per sign-LSH bucket when the hash is adaptively sized. */
  val targetBucketSize = 256L

  /** Hash width so expected bucket occupancy ≈ [[targetBucketSize]]:
    * ceil(log2(n / target)), floored at 6 bits (64 buckets) and capped at
    * 48. A FIXED width is a scale bug — candidate pairs grow O(n²/2^bits),
    * quadratic again at 10^10 rows; adaptive width keeps the per-bucket
    * join quadratic only in a constant (256² per bucket). */
  def adaptiveNBits(n: Long, target: Long = targetBucketSize, floor: Int = 6): Int = {
    val buckets = math.max(1L, n / target)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))
    math.min(48, math.max(floor, bits))
  }

  /** q_ann_brute — exact cosine top-k per query vector. Query set = the
    * first `nQueries` vec_ids (broadcast); base = the full table. */
  def bruteTopK(spark: SparkSession, dir: String,
                nQueries: Int = 8, k: Int = 10): DataFrame = {
    val emb = t(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val scored = emb.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("cos", round(cosine($"qv", $"embedding"), 6))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id", $"cos")
  }

  /** q_ann_lsh — the scale path: bucket base vectors by sign-LSH, probe
    * only the query's bucket (plus Hamming-1 neighbor buckets), exact
    * cosine within. Recall measured against bruteTopK in tests.
    * nBits ≤ 0 (default) = adaptive width from the table count, see
    * [[adaptiveNBits]]. */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 8,
              k: Int = 10, nBits: Int = 0): DataFrame = {
    import spark.implicits._
    val base = t(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val bits = if (nBits > 0) nBits else adaptiveNBits(base.count())
    val emb = base.as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, Sigs.signBucket(v, bits)) }
      .toDF("vec_id", "embedding", "bucket")
    val queries = emb.filter($"vec_id" < nQueries)
      .as[(Long, Seq[Float], Long)]
      // multi-probe: own bucket + all Hamming-1 neighbor buckets
      .flatMap { case (id, v, bkt) =>
        (bkt +: (0 until bits).map(i => bkt ^ (1L << i)))
          .distinct.map(p => (id, v, p)) }
      .toDF("query_id", "qv", "bucket")
    val scored = emb.join(broadcast(queries), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", round(cosine($"qv", $"embedding"), 6))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id", $"cos")
  }

  // ---- IVF (inverted-file) ANN — the trained-bucketer scale path ---------

  /** Pure-Scala cosine (double accumulation, left-to-right — bit-matches
    * DuckDB's list_cosine_similarity over DOUBLE[] casts). */
  def cosineScala(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Top-`m` centroid ids by (rounded) cosine, centroid-id tie-break —
    * rounding collapses float-association near-ties so the Spark kernel
    * and the DuckDB oracle pick identical lists. */
  private def nearestLists(cents: Array[(Long, Array[Float])],
                           v: Seq[Float], m: Int): Seq[(Long, Double)] =
    cents.map { case (cid, cv) => (cid, round6(cosineScala(cv, v))) }
      .sortBy { case (cid, c) => (-c, cid) }.take(m).toSeq

  /** q_ann_ivf — inverted-file ANN: K deterministic sampled centroids
    * (lowest minstd-LCG key — reproducible in plain SQL, no RNG), each
    * base vector assigned to its nearest list by ONE broadcast-kernel
    * pass (no shuffle, no crossJoin explosion: O(K·d) CPU per row),
    * queries probe their nProbe nearest lists, exact cosine inside.
    * The IVF upgrade path of SCALE.md §6: swap the sampled centroids for
    * trained ones and nothing else changes. nLists ≤ 0 = adaptive. */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 8,
              k: Int = 10, nProbe: Int = 4, nLists: Int = 0): DataFrame = {
    import spark.implicits._
    val base = t(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val n = base.count()
    val lists = if (nLists > 0) nLists
                else math.max(16L, n / targetBucketSize).toInt
    // centroid sample: lowest K by (vec_id * 48271) % 2147483647 — a pure
    // arithmetic key DuckDB computes identically (data-dependent sample,
    // driver-collected: K rows, a broadcast dimension)
    val cents: Array[(Long, Array[Float])] = base
      .withColumn("skey", pmod($"vec_id" * lit(48271L), lit(2147483647L)))
      .orderBy($"skey", $"vec_id").limit(lists)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect()
    val bc = spark.sparkContext.broadcast(cents)

    val assigned = base.as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (id, v, nearestLists(cs, v, 1).head._1) }
      }.toDF("vec_id", "embedding", "list_id")

    val probes = base.filter($"vec_id" < nQueries).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, v) =>
          nearestLists(cs, v, nProbe).map { case (cid, _) => (id, v, cid) } }
      }.toDF("query_id", "qv", "list_id")

    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    assigned.join(broadcast(probes), Seq("list_id"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", round(cosine($"qv", $"embedding"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id", $"cos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_brute" -> ((s: SparkSession, d: String) => bruteTopK(s, d)),
    "q_ann_lsh" -> ((s: SparkSession, d: String) => lshTopK(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) => ivfTopK(s, d)))

  val oracle: Map[String, String] = Map(
    // full IVF twin: same deterministic centroid sample (arithmetic LCG
    // key), same rounded-cosine assignment with cid tie-break, same
    // nProbe probing — a HARD equality check on an ANN index structure
    "q_ann_ivf" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
        |  ORDER BY (vec_id * 48271) % 2147483647, vec_id
        |  LIMIT greatest(16, (SELECT count(*) FROM embeddings) // 256)
        |), assigned AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT e.vec_id, e.embedding, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(c.cv,
        |          CAST(e.embedding AS DOUBLE[])), 6) DESC, c.cid ASC) AS rn
        |    FROM embeddings e CROSS JOIN cents c)
        |  WHERE rn = 1
        |), probes AS (
        |  SELECT query_id, qv, cid FROM (
        |    SELECT e.vec_id AS query_id, e.embedding AS qv, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(c.cv,
        |          CAST(e.embedding AS DOUBLE[])), 6) DESC, c.cid ASC) AS rn
        |    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 8)
        |  WHERE rn <= 4
        |), scored AS (
        |  SELECT p.query_id, a.vec_id,
        |    round(list_cosine_similarity(CAST(p.qv AS DOUBLE[]),
        |      CAST(a.embedding AS DOUBLE[])), 6) AS cos
        |  FROM probes p JOIN assigned a USING (cid) WHERE a.vec_id <> p.query_id
        |)
        |SELECT query_id, rank, vec_id, cos FROM (
        |  SELECT query_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)
        |      AS rank
        |  FROM scored) WHERE rank <= 10""".stripMargin,
    "q_ann_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |)
        |SELECT query_id, rank, vec_id, cos FROM (
        |  SELECT query_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)
        |      AS rank
        |  FROM scored) WHERE rank <= 10""".stripMargin)
}
