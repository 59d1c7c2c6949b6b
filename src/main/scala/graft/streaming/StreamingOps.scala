package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming operators over the events table: the streaming
  * twins of the batch aggregations (same grouping keys/aggregates as
  * Relational.hourlyAgg) plus stateful sessionization with
  * flatMapGroupsWithState — the engine's answer to SURVEY.md §1.3
  * "streams" (the reference is pure batch; these are the forward-looking
  * streaming surface).
  *
  * Local smoke: file source over the parquet dir + memory sink +
  * processAllAvailable() drives the full micro-batch machinery
  * synchronously (tested equal to the batch plan in StreamingSpec).
  */
object StreamingOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double,
                         props: String)

  final case class Session(user_id: Long, n_events: Long, total_value: Double,
                           started: java.sql.Timestamp, ended: java.sql.Timestamp)

  final case class SessState(n: Long, total: Double, started: Long, last: Long)

  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file source wants a directory (in production the event log IS a
    // directory of arriving files) — stage the single test file into one
    val staged = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
      // parquet infers TIMESTAMP_NTZ; event-time watermarks need TIMESTAMP
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling-window aggregation with watermark — the streaming twin of
    * q_hourly_agg (append mode once the watermark passes). */
  def hourlyAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  /** Stateful per-user sessionization: a session closes after `gapMinutes`
    * of inactivity (event-time, tracked in custom state). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[SessState]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var st = state.getOption.getOrElse(SessState(0, 0.0, Long.MaxValue, Long.MinValue))
      val out = Vector.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (st.n > 0 && t - st.last > gapMs) {
          out += Session(userId, st.n, st.total,
            new java.sql.Timestamp(st.started), new java.sql.Timestamp(st.last))
          st = SessState(0, 0.0, Long.MaxValue, Long.MinValue)
        }
        st = SessState(st.n + 1, st.total + e.value,
          math.min(st.started, t), math.max(st.last, t))
      }
      state.update(st)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Run the streaming hourly agg to completion against the static dir and
    * return the materialized result (memory sink). */
  def runHourlyAggBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val q = hourlyAggStream(eventStream(spark, dir))
      .writeStream.outputMode("complete") // no new data ⇒ complete = final
      .format("memory").queryName("graft_hourly")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_hourly")
  }
}
