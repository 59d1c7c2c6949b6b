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
