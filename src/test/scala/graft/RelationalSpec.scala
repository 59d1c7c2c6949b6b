package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every query runs on sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has matching column names with its oracle declaration") {
    // oracle SQL must alias to the same names — driver hashes columns by name
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("q1_agg aggregates are exact on sf0.001") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf0001)
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == 6000L)
  }

  test("precedence dedup keeps exactly one row per key") {
    val df = SparkEntry.queries("q_precedence_dedup")(spark, sf0001)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("keep_latest keeps exactly one row per order") {
    val df = SparkEntry.queries("q_keep_latest")(spark, sf0001)
    assert(df.groupBy("l_orderkey").count().filter(col("count") > 1).count() == 0)
  }

  // ---- r6 agg rewrites: the partial-agg forms must equal the window forms
  // they replaced, row for row (the focused internals-change tests) --------

  test("events.event_id is unique (precedence-dedup tiebreak invariant)") {
    // min(struct(ts, event_id, event_type)) equals the old row_number
    // window exactly because (ts, event_id) is a total order per user —
    // pinned here so a future data change cannot silently weaken it
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    assert(ev.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("precedence dedup (agg form) equals the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val windowForm = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val aggForm = SparkEntry.queries("q_precedence_dedup")(spark, sf0001)
    assert(aggForm.exceptAll(windowForm).isEmpty &&
      windowForm.exceptAll(aggForm).isEmpty)
  }

  test("keep_latest (agg form) equals the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber").desc, col("l_partkey").desc,
        col("l_suppkey").desc)
    val windowForm = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val aggForm = SparkEntry.queries("q_keep_latest")(spark, sf0001)
    assert(aggForm.exceptAll(windowForm).isEmpty &&
      windowForm.exceptAll(aggForm).isEmpty)
  }

  test("topk is 10 rows in strict descending order") {
    val v = SparkEntry.queries("q_topk")(spark, sf0001)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(v.length == 10 && v.sameElements(v.sortBy(-_)))
  }

  test("chunk_upsert: every non-final chunk holds exactly 500 contiguous keys") {
    val rows = SparkEntry.queries("q_chunk_upsert")(spark, sf0001).collect()
    val byBucket = rows.groupBy(_.getAs[Long]("bucket"))
    byBucket.values.foreach { chunks =>
      val ordered = chunks.sortBy(_.getAs[Long]("chunk_id"))
      ordered.init.foreach(c => assert(c.getAs[Long]("n_rows") == 500L))
      assert(ordered.last.getAs[Long]("n_rows") <= 500L)
      // contiguity in key order: chunk k's max_key precedes chunk k+1's min_key
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("max_key") < b.getAs[Long]("min_key"))
        case _ =>
      }
    }
  }

  test("union precedence keeps the best-ranked row per key") {
    val df = SparkEntry.queries("q_union_precedence")(spark, sf0001)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
    // a key with a rank-0 (status F) order must resolve to rank 0
    val viaF = Queries.ordersWithStatus(spark, sf0001, "F")
    val resolved = df.join(viaF, Seq("o_custkey"), "left_semi")
    assert(resolved.filter(col("family_rank") =!= 0).count() == 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

/** Tiny fixture helpers for the assertions above. */
private object Queries {
  def ordersWithStatus(spark: org.apache.spark.sql.SparkSession, dir: String,
                       status: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === status)
      .select(col("o_custkey")).distinct()
}
