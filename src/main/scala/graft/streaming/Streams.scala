package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fhir.{BundleReader, FhirSchemaModel}

/** Structured Streaming surfaces. The reference's "real-time" ADT feed is
  * batch directory re-reads (01_dbignite_sample.py:401-427 — no streaming
  * code anywhere); per SURVEY.md §2.10 the engine keeps the same declared
  * schemas and projections streaming-capable by construction: the batch
  * transforms compose unchanged onto `readStream` sources.
  */
object Streams {

  /** events.parquet schema, with the TIMESTAMP(NANOS) column as long
    * (matching the nanosAsLong batch read) converted to a micros timestamp
    * for event-time semantics. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Watermarked hourly windowed aggregate — the streaming twin of the
    * batch q_e2_hourly_window (same grouping semantics, late data bounded
    * by the watermark instead of assumed complete). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").cast("string").as("hour_bucket"),
        col("event_type"), col("cnt"), col("sum_value"))

  final case class SessionEvent(
      user_id: Long, event_id: Long, ts_sec: Long, value: Double)
  final case class SessionState(
      lastTs: Long, sessionId: Long, n: Long, start: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      start_sec: Long, end_sec: Long, sum_value: Double)

  /** Stateful gap-based sessionization via flatMapGroupsWithState: emits a
    * session whenever a >30min gap closes it (append mode); the per-user
    * open session rides in group state across micro-batches.
    *
    * Semantics match the batch q_e4_sessionize for in-order, bounded
    * input (what the spec asserts). Production caveats, by design of this
    * demo: events are sorted per group only WITHIN a micro-batch, so an
    * event arriving in a later batch with an older timestamp than the
    * open session's tail is clamped into that session (lastTs never
    * regresses); state uses NoTimeout, so an unbounded user universe
    * needs EventTimeTimeout + a watermark to bound the state store and to
    * flush the final open session per user. */
  def sessionize(events: DataFrame): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_sec"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[SessionEvent],
         state: org.apache.spark.sql.streaming.GroupState[SessionState]) => {
          val sorted = it.toSeq.sortBy(e => (e.ts_sec, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            if (st == null) {
              st = SessionState(e.ts_sec, 1L, 1L, e.ts_sec, e.value)
            } else if (e.ts_sec - st.lastTs > 1800) {
              out += SessionOut(userId, st.sessionId, st.n, st.start,
                st.lastTs, st.sum)
              st = SessionState(e.ts_sec, st.sessionId + 1, 1L, e.ts_sec,
                e.value)
            } else {
              // math.max: a late cross-batch event must not regress the
              // session tail (monotone state)
              st = SessionState(math.max(st.lastTs, e.ts_sec), st.sessionId,
                st.n + 1, st.start, st.sum + e.value)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
  }

  /** Streaming FHIR ADT feed: the same whole-file read + per-resource
    * pivot as the batch BundleReader, as a file-source stream. Downstream
    * flattens (graft.fhir.Flatten) apply unchanged. */
  def readBundleStream(
      spark: SparkSession, dir: String,
      model: FhirSchemaModel = FhirSchemaModel()): DataFrame =
    BundleReader.pivotStream(
      spark.readStream.option("wholetext", value = true).text(dir), model)
}
