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

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
