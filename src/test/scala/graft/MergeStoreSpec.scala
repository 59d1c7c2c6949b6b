package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.MergeStore

/** The verify_inplace_upsert.py invariants (reference
  * migrations/verify_inplace_upsert.py:9-16): in-place update, creation
  * fields preserved, update marker advances, no duplicate keys —
  * re-expressed for the generation-versioned merge store. */
class MergeStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fresh() = Files.createTempDirectory("graft-store").toString

  private val keys = Seq("id", "lang")
  private val creation = Seq("dat_creat")
  private val sticky = Seq("main_image")

  test("upsert: latest wins, creation preserved, sticky never blanked") {
    val dir = fresh()
    MergeStore.ingest(Seq(
      (1L, "en", "t1", "g0", "img0"),
      (2L, "en", "t2", "g0", null)
    ).toDF("id", "lang", "title", "dat_creat", "main_image"), dir)
    MergeStore.ingest(Seq(
      (1L, "en", "t1b", "g1", null),     // update: no new image → keep img0
      (2L, "en", "t2b", "g1", "img2"),   // update: image resolved now
      (3L, "fr", "t3", "g1", null)       // fresh insert
    ).toDF("id", "lang", "title", "dat_creat", "main_image"), dir)

    val got = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, "en", "t1b", "g0", "img0"), // title updated, creation g0, image kept
      (2L, "en", "t2b", "g0", "img2"), // image filled in by later generation
      (3L, "fr", "t3", "g1", null)))
  }

  test("keys-only merged view (r6 agg fast path) equals the window form") {
    val dir = fresh()
    MergeStore.ingest(Seq(
      (1L, "en", "t1", "g0", "img0"),
      (2L, "en", "t2", "g0", null)
    ).toDF("id", "lang", "title", "dat_creat", "main_image"), dir)
    MergeStore.ingest(Seq(
      (1L, "en", "t1b", "g1", null),
      (3L, "fr", "t3", "g1", "img3")
    ).toDF("id", "lang", "title", "dat_creat", "main_image"), dir)
    val fast = MergeStore.mergedView(spark, dir, keys)
    // the window form the fast path replaced, recomputed inline
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id"), col("lang")).orderBy(col("gen").desc)
    val windowForm = spark.read.parquet(dir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "gen")
    assert(fast.columns.toSeq == windowForm.columns.toSeq)
    assert(fast.exceptAll(windowForm).isEmpty &&
      windowForm.exceptAll(fast).isEmpty)
  }

  test("re-ingesting the same batch is a no-op (idempotence) and keys unique") {
    val dir = fresh()
    val batch = Seq((1L, "en", "a", "g0", "i"), (2L, "fr", "b", "g0", null))
      .toDF("id", "lang", "title", "dat_creat", "main_image")
    MergeStore.ingest(batch, dir)
    val v1 = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .orderBy("id").collect().toSeq
    MergeStore.ingest(batch, dir)
    val v2 = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .orderBy("id").collect().toSeq
    assert(v1 == v2)
    val dups = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .groupBy("id", "lang").count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("compact preserves the merged view exactly") {
    val dir = fresh()
    MergeStore.ingest(Seq((1L, "en", "a", "g0", "i0"), (2L, "en", "b", "g0", null))
      .toDF("id", "lang", "title", "dat_creat", "main_image"), dir)
    MergeStore.ingest(Seq((1L, "en", "a2", "g9", Option.empty[String]))
      .toDF("id", "lang", "title", "dat_creat", "main_image"), dir)
    val before = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .orderBy("id").collect().toSeq
    MergeStore.compact(spark, dir, keys, creation, sticky)
    assert(MergeStore.generations(dir) == Seq(0))
    val after = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .orderBy("id").collect().toSeq
    assert(before == after)
  }

  test("clear_shared_images clears over-shared, preserves unique AND sub-threshold shared (inverse guard)") {
    import graft.store.Cleanup
    val out = Cleanup.clearSharedImages(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").as[Long].collect()
    assert(out.size == docs.length)
    docs.foreach { id =>
      if (id % 5 == 0)
        // the shared_N pools carry ~33 docs each >= threshold -> cleared
        assert(out(id) == "", s"doc $id should be cleared, got '${out(id)}'")
      else if (id % 7 == 1)
        // shared by 2-3 docs — BELOW the threshold: the migration's own
        // guard (a real flag photo is legitimately shared) — must survive
        assert(out(id) == s"dup_${id % 25}", s"doc $id lost its image")
      else
        assert(out(id) == s"img_$id", s"doc $id lost its unique image")
    }
  }

  test("clear_chrome_rows deletes every planted chrome row, keeps every lookalike") {
    import graft.store.Cleanup
    val work = graft.queries.CrawlQueries.sharedCrawl(spark)
    val before = Cleanup.galleryWithPlanted(spark, work)
      .select("file_name").as[String].collect()
    assert(Cleanup.plantedChrome.forall(before.contains),
      "fixture must plant all four chrome shapes")
    assert(Cleanup.plantedLookalikes.forall(before.contains),
      "fixture must plant the lookalikes")
    val after = Cleanup.clearChromeRows(spark, sf0001)
      .select("file_name").as[String].collect()
    Cleanup.plantedChrome.foreach(n =>
      assert(!after.contains(n), s"chrome row $n survived the delete"))
    Cleanup.plantedLookalikes.foreach(n =>
      assert(after.contains(n), s"lookalike $n was wrongly deleted"))
    // the hard delete removed EXACTLY the chrome rows, nothing else
    assert(before.length - after.length == before.count(Cleanup.plantedChrome.contains))
  }

  test("compact clears stale leftovers from a crashed compact and never strands the table") {
    val dir = fresh()
    MergeStore.ingest(Seq((1L, "en", "a", "g0", "i0"))
      .toDF("id", "lang", "title", "dat_creat", "main_image"), dir)
    val before = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .collect().toSeq
    // a prior compact crashed mid-flight: both scratch dirs linger with junk
    // — were they left in place, the renames would silently no-op and the
    // old implementation's rm() could delete the only copy of the data
    new java.io.File(s"$dir.compact/junk").mkdirs()
    new java.io.File(s"$dir.old/junk").mkdirs()
    MergeStore.compact(spark, dir, keys, creation, sticky)
    assert(!new java.io.File(s"$dir.old").exists)
    assert(!new java.io.File(s"$dir.compact").exists)
    val after = MergeStore.mergedView(spark, dir, keys, creation, sticky)
      .collect().toSeq
    assert(before == after)
  }
}
