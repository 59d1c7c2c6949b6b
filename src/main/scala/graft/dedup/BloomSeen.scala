package graft.dedup

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.Dataset
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable, persistable Bloom filter for the URL-seen set (SURVEY.md
  * §2.10 / §4.3: "custom Aggregator for cross-run merge/persist").
  *
  * [[build]] is a distributed mergeable aggregate: each partition builds a
  * partial `util.sketch.BloomFilter` over its strings, partials merge
  * associatively on the reducers (`mergeInPlace` — the Aggregator merge
  * step), one filter comes back. Per-tick filters persist as
  * `workDir/bloom/tick=N.bloom` and [[loadMerged]] ORs them at startup, so
  * batch k+1 never rebuilds the seen-set sketch from the full seen table —
  * at 10^10 URLs the rebuild would rescan everything; the merge reads only
  * the per-tick sketches (the checkpointed-state analogue of the
  * reference's resume protocol, README.md:506-516).
  *
  * The filter is only ever a PREFILTER: positives are confirmed by an
  * exact anti-join (Crawl.filterNew) — no false drops, seen-set equality
  * stays exact.
  */
object BloomSeen {

  /** Distributed build via the Catalyst-native [[BloomAggregate]]
    * (TypedImperativeAggregate): map-side partial filters, associative
    * OR-merge on the reducer — no RDD involved.
    *
    * `capacity` must be the SAME for every filter that will ever merge
    * (mergeInPlace requires identical bit arrays) — size it to the total
    * frontier, not the batch. */
  def build(urls: Dataset[String], capacity: Long,
            fpp: Double = 0.01): BloomFilter = {
    val bytes = urls.toDF("url")
      .agg(BloomAggregate.bloomAgg(org.apache.spark.sql.functions.col("url"),
        math.max(capacity, 1L), fpp))
      .head.getAs[Array[Byte]](0)
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  def bloomDir(workDir: String): Path = Paths.get(workDir, "bloom")

  def save(bf: BloomFilter, workDir: String, tick: Int): Unit = {
    Files.createDirectories(bloomDir(workDir))
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val tmp = bloomDir(workDir).resolve(s".tick=$tick.tmp")
    Files.write(tmp, bos.toByteArray)
    Files.move(tmp, bloomDir(workDir).resolve(s"tick=$tick.bloom"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** OR together every persisted per-tick filter (None when no state). */
  def loadMerged(workDir: String): Option[BloomFilter] = {
    val dir = bloomDir(workDir)
    if (!Files.exists(dir)) return None
    val files = Files.list(dir).iterator()
    var merged: BloomFilter = null
    files.forEachRemaining { p =>
      if (p.getFileName.toString.endsWith(".bloom")) {
        val bf = BloomFilter.readFrom(
          new ByteArrayInputStream(Files.readAllBytes(p)))
        if (merged == null) merged = bf else merged.mergeInPlace(bf)
      }
    }
    Option(merged)
  }
}
