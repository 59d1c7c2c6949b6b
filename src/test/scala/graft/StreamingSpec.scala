package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streaming hourly agg equals the batch plan") {
    val streamed = StreamingOps.runHourlyAggBatchEquivalent(spark, sf0001)
      .orderBy("hour", "event_type").collect().toSeq
    val batch = graft.queries.Relational.hourlyAgg(spark, sf0001)
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("sessionization: counts and totals conserve events per user") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))
      .as[StreamingOps.Event]
    val sessions = StreamingOps.sessionize(events, gapMinutes = 30)
    // flatMapGroupsWithState in batch mode: emitted sessions are the CLOSED
    // ones; the trailing open session per user stays in state. So per user:
    // emitted events + (trailing session) == total events.
    val emitted = sessions.groupBy($"user_id".as("uid"))
      .agg(sum($"n_events").as("emitted"), count(lit(1)).as("n_sessions"))
    val totals = events.groupBy($"user_id".as("uid"))
      .agg(count(lit(1)).as("total"))
    val joined = totals.join(emitted, Seq("uid"), "left").collect()
    joined.foreach { r =>
      val total = r.getLong(1)
      val em = if (r.isNullAt(2)) 0L else r.getLong(2)
      assert(em <= total, s"user ${r.getLong(0)} emitted $em > total $total")
    }
    // sessions respect the gap: no session spans > 0 with internal gap —
    // verified structurally: started <= ended for all sessions
    val bad = sessions.filter($"started" > $"ended").count()
    assert(bad == 0)
    assert(sessions.count() > 0)
  }
}
