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
    * sort/hash it; the array form is one from_json away. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(stubDecode))
      .toDF()
      .select($"media_id", $"kind", $"width", $"height", $"channels",
        $"n_frames", to_json($"features").as("features_json"))
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

  // graft.Verify exports the media table's metadata (everything except the
  // binary payload) as parquet into the verify outDir and rewrites
  // __EXPORT__ to that path, so DuckDB can independently recompute the
  // resize math and the frame-sampling sequence. q_media_decode stays
  // rows-only: its features come from the stub codec, which has no SQL twin.
  val oracle: Map[String, String] = Map(
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
}
