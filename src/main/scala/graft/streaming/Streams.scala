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

  /** Streaming FHIR ADT feed: the same whole-file read + per-resource
    * pivot as the batch BundleReader, as a file-source stream. Downstream
    * flattens (graft.fhir.Flatten) apply unchanged. */
  def readBundleStream(
      spark: SparkSession, dir: String,
      model: FhirSchemaModel = FhirSchemaModel()): DataFrame =
    BundleReader.pivotStream(
      spark.readStream.option("wholetext", value = true).text(dir), model)
}
