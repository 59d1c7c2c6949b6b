package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ColSyntax._
import graft.synth.World

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The actual codec work is STUBBED with a deterministic fake (no image or
  * audio libraries ship in this container) — what is real and tested here
  * is the Spark-side shape of a multimodal pipeline at scale:
  *   - schema: (media_id, doc_id, kind, bytes binary, meta struct)
  *   - batch-friendly partitioning by size (so one partition never holds
  *     too many bytes — the `maxRecordsPerFile`/`maxPartitionBytes` axis)
  *   - the decode/feature stages run in `mapPartitions` with a per-batch
  *     iterator, mirroring how a Pandas-UDF `mapInPandas` would batch rows
  *   - outputs are columnar (feature arrays, frame structs), joinable back
  *     by media_id
  */
object MultimodalOps {

  final case class MediaRow(
      media_id: Long, doc_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Int)

  final case class DecodedRow(
      media_id: Long, kind: String, width: Int, height: Int,
      channels: Int, n_frames: Int, features: Seq[Float])

  /** Deterministic synthetic media table derived from the documents table:
    * one media object per document, kind by hash, payload bytes seeded. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.queries.Tables.t(spark, dir, "documents")
      .select($"doc_id", $"n_chars")
      .as[(Long, Long)]
      .map { case (docId, nChars) =>
        val h = World.mix(0x3ED1AL, docId)
        val kind = Vector("image", "audio", "video")(World.bounded(h, 3))
        val size = 64 + World.bounded(World.mix(h, 1L), 192)
        val bytes = Array.tabulate[Byte](size)(i =>
          (World.mix(h, 2L, i.toLong) & 0xFF).toByte)
        MediaRow(
          media_id = docId * 10 + World.bounded(World.mix(h, 3L), 10),
          doc_id = docId, kind = kind, bytes = bytes,
          width = 16 * (1 + World.bounded(World.mix(h, 4L), 64)),
          height = 16 * (1 + World.bounded(World.mix(h, 5L), 64)),
          duration_ms = if (kind == "image") 0
                        else 1000 * (1 + World.bounded(World.mix(h, 6L), 300)))
      }
  }

  /** STUB decoder — deterministic fake standing in for a real codec
    * (``???`` boundary): derives pixel/sample statistics purely from the
    * payload bytes, so the pipeline is testable end-to-end. A real
    * deployment swaps ONLY this function body for an actual decode. */
  def stubDecode(r: MediaRow): DecodedRow = {
    // >>> STUB: real image/audio decode goes here (no codec libs in-sandbox)
    val channels = if (r.kind == "audio") 2 else 3
    val nFrames = r.kind match {
      case "image" => 1
      case "audio" => r.duration_ms / 20        // 50 fps sample frames
      case _       => r.duration_ms * 24 / 1000 // 24 fps
    }
    // "features": 16-dim deterministic embedding of the byte payload
    val features = (0 until 16).map { i =>
      val acc = r.bytes.indices.foldLeft(0L)((a, j) =>
        a + (r.bytes(j) & 0xFF) * ((j % 16 == i).compare(false)))
      (World.mix(acc, i.toLong) % 1000L).toFloat / 1000.0f
    }
    // <<< STUB
    DecodedRow(r.media_id, r.kind, r.width, r.height, channels, nFrames, features)
  }

  /** q_media_decode — decode + feature-extract over the binary column.
    * Batched per partition (the mapInPandas batch shape). Deliberately NO
    * repartition before the decode: it is map-only, needs no
    * co-partitioning, and an exchange here would shuffle the heaviest
    * column (the raw bytes) for zero benefit — at 100 TB the payload skew
    * axis is handled at the SCAN instead (`maxPartitionBytes` splits large
    * files; decode cost tracks byte count, which the scan already balances).
    * The features array is emitted as JSON (a scalar) so downstream
    * row-oriented consumers — including the driver's pandas compare — can
    * sort/hash it; the array form is one from_json away. Elements are
    * formatted fixed-point %.6f (format_string is Locale.US) rather than
    * Jackson's shortest-roundtrip floats: fixed precision is the ONLY
    * float↔text form two engines render identically (the DuckDB twin
    * emits the same string; ties are impossible — a float32 is a dyadic
    * rational, which can never terminate with digit 5 exactly at the
    * rounding position — so half-up vs half-even never diverges). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(stubDecode))
      .toDF()
      .select($"media_id", $"kind", $"width", $"height", $"channels",
        $"n_frames",
        concat(lit("["),
          array_join(transform($"features", f => format_string("%.6f", f)), ","),
          lit("]")).as("features_json"))
  }

  /** q_media_resize_plan — the resize stage as metadata math (real resize
    * is the stubbed codec): target box 224x224, preserve aspect. Pure
    * column expressions. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF()
      .filter($"kind" === "image")
      .withColumn("scale",
        least(lit(224.0) / $"width", lit(224.0) / $"height"))
      .select($"media_id",
        $"width", $"height",
        round($"width" * $"scale").cast("int").as("out_w"),
        round($"height" * $"scale").cast("int").as("out_h"))
  }

  /** q_frame_sample — frame sampling for video/audio rows: every Nth frame
    * index up to a cap, exploded to one row per sampled frame. */
  def frameSample(spark: SparkSession, dir: String,
                  everyNth: Int = 24, cap: Int = 16): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(stubDecode))
      .toDF()
      .filter($"kind" =!= "image")
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), greatest($"n_frames" - 1, lit(0)),
          lit(everyNth)), 1, cap)))
      .select($"media_id", $"kind", $"n_frames", $"frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_decode" -> (decodeFeatures _),
    "q_media_resize_plan" -> (resizePlan _),
    "q_frame_sample" -> ((s: SparkSession, d: String) => frameSample(s, d)))

  // ---- q_media_decode twin: the stub codec re-expressed in SQL ------------
  //
  // The stub's features are a byte-fold + World.mix (splitmix64) — fully
  // SQL-expressible once wrapping 64-bit arithmetic is emulated. Values
  // live as signed BIGINT (so DuckDB's xor() is native); the wrapping
  // add/multiply convert to HUGEINT-unsigned and back, and the constant
  // multiplicands are split 32/32 so no intermediate exceeds 2^65 (a full
  // 64×64 product would overflow HUGEINT). Each splitmix step is its own
  // CTE — referencing the previous step by column name instead of
  // inlining keeps the expression linear, not 2^steps.

  private val Mask64 = (BigInt(1) << 64) - 1
  private val U64 = (BigInt(1) << 64).toString

  private def toU(x: String) =
    s"(CAST(($x) AS HUGEINT) + CASE WHEN ($x) < 0 THEN $U64 ELSE 0 END)"
  private def toS(u: String) =
    s"CAST(($u) - CASE WHEN ($u) >= 9223372036854775808 THEN $U64 ELSE 0 END AS BIGINT)"
  private def lsr(x: String, n: Int) = toS(s"${toU(x)} // ${BigInt(2).pow(n)}")
  private def addc(x: String, c: Long) =
    toS(s"(${toU(x)} + ${BigInt(c) & Mask64}) % $U64")
  private def mulc(x: String, c: Long): String = {
    val cu = BigInt(c) & Mask64
    val ch = cu >> 32
    val cl = cu & 0xFFFFFFFFL
    val u = toU(x)
    val hi = s"((($u // 4294967296) * $cl + ($u % 4294967296) * $ch) % 4294967296)"
    toS(s"(($hi * 4294967296 + ($u % 4294967296) * $cl) % $U64)")
  }

  /** One splitmix64 finalizer (World.mix64) as a 4-CTE chain over a
    * column `x`, keyed (media_id, i); returns (cte text, last cte name). */
  private def mix64Ctes(prefix: String, from: String): (String, String) = {
    val Seq(a, b, c, d) = Seq("a", "b", "c", "d").map(prefix + _)
    val text =
      s"""$a AS (SELECT media_id, i, ${addc("x", 0x9E3779B97F4A7C15L)} AS x FROM $from),
         |$b AS (SELECT media_id, i, ${mulc(s"xor(x, ${lsr("x", 30)})", 0xBF58476D1CE4E5B9L)} AS x FROM $a),
         |$c AS (SELECT media_id, i, ${mulc(s"xor(x, ${lsr("x", 27)})", 0x94D049BB133111EBL)} AS x FROM $b),
         |$d AS (SELECT media_id, i, xor(x, ${lsr("x", 31)}) AS x FROM $c)""".stripMargin
    (text, d)
  }

  /** The full q_media_decode twin: byte-fold accumulators from the
    * exported payload (bytes re-encoded as a JSON int list — verify-only
    * plumbing, see [[exportMediaBytes]]), World.mix(acc, i) = mix64(mix64(
    * MixInit ^ acc) ^ i), then the same %.6f fixed-point JSON the query
    * emits.
    * 0x6A09E667F3BCC909 (MixInit) = 7640891576956012809. */
  private def mediaDecodeSql: String = {
    val (m1, m1out) = mix64Ctes("m1", "t0")
    val (m2, m2out) = mix64Ctes("m2", "t5")
    s"""WITH pb AS (
       |  SELECT media_id,
       |    list_transform(string_split(trim(b_json, '[]'), ','),
       |      x -> CAST(x AS INT)) AS b
       |  FROM read_parquet('__EXPORT__/export_media_bytes/*.parquet')
       |), acc AS (
       |  SELECT media_id, CAST(ii.i AS BIGINT) AS i,
       |    CAST(list_sum(list_transform(range(1, len(b) + 1),
       |      j -> CASE WHEN (j - 1) % 16 = ii.i THEN b[j] ELSE 0 END)) AS BIGINT) AS acc
       |  FROM pb CROSS JOIN (SELECT unnest(range(0, 16)) AS i) ii
       |), t0 AS (SELECT media_id, i, xor(7640891576956012809, acc) AS x FROM acc),
       |$m1,
       |t5 AS (SELECT media_id, i, xor(x, i) AS x FROM $m1out),
       |$m2,
       |feat AS (
       |  SELECT media_id,
       |    '[' || string_agg(format('{:.6f}',
       |        CAST(x % 1000 AS FLOAT) / CAST(1000.0 AS FLOAT)), ',' ORDER BY i)
       |    || ']' AS features_json
       |  FROM $m2out GROUP BY media_id
       |)
       |SELECT m.media_id, m.kind, m.width, m.height,
       |  CASE WHEN m.kind = 'audio' THEN 2 ELSE 3 END AS channels,
       |  CAST(CASE WHEN m.kind = 'image' THEN 1
       |            WHEN m.kind = 'audio' THEN m.duration_ms // 20
       |            ELSE m.duration_ms * 24 // 1000 END AS INT) AS n_frames,
       |  f.features_json
       |FROM read_parquet('__EXPORT__/export_media_meta/*.parquet') m
       |JOIN feat f USING (media_id)""".stripMargin
  }

  // graft.Verify exports the media table's metadata (everything except the
  // binary payload) as parquet into the verify outDir and rewrites
  // __EXPORT__ to that path, so DuckDB can independently recompute the
  // resize math and the frame-sampling sequence. q_media_decode's twin
  // additionally recomputes the stub features end-to-end from the
  // exported payload bytes (mediaDecodeSql above), closing the last
  // rows-only entry.
  val oracle: Map[String, String] = Map(
    "q_media_decode" -> mediaDecodeSql,
    "q_media_resize_plan" ->
      """SELECT media_id, width, height,
        |  CAST(round(width * least(224.0 / width, 224.0 / height)) AS INT) AS out_w,
        |  CAST(round(height * least(224.0 / width, 224.0 / height)) AS INT) AS out_h
        |FROM read_parquet('__EXPORT__/export_media_meta/*.parquet')
        |WHERE kind = 'image'""".stripMargin,
    "q_frame_sample" ->
      """SELECT media_id, kind, n_frames,
        |  CAST(unnest((generate_series(0, greatest(n_frames - 1, 0), 24))[1:16]) AS INT)
        |    AS frame_idx
        |FROM (SELECT media_id, kind,
        |        CAST(CASE WHEN kind = 'audio' THEN duration_ms // 20
        |                  ELSE duration_ms * 24 // 1000 END AS INT) AS n_frames
        |      FROM read_parquet('__EXPORT__/export_media_meta/*.parquet')
        |      WHERE kind <> 'image')""".stripMargin)

  /** The DuckDB-visible twin input for the oracles above: the media table
    * minus its binary payload. Written by graft.Verify. */
  def exportMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF()
      .select($"media_id", $"doc_id", $"kind", $"width", $"height",
        $"duration_ms")
  }

  /** The payload bytes re-encoded as a JSON string of INT[0,255] — verify-
    * only plumbing so the q_media_decode twin can byte-fold in SQL
    * (DuckDB's BLOB element access has no clean list form). A SCALAR
    * column, not array<int>: the driver's pandas compare sorts every
    * export column, and an ndarray cell is unhashable there (the one
    * permanent ERR row in rounds ≤4); the twin's pb CTE splits it back
    * into a list. The engine never ships payloads this way; it is the
    * oracle's independent view of the same binary column. */
  def exportMediaBytes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .map(r => (r.media_id,
        r.bytes.map(b => b & 0xFF).mkString("[", ",", "]")))
      .toDF("media_id", "b_json")
  }
}
