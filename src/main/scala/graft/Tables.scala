package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under a scale-factor dir.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader
  * keeps the access path behind one function so the storage layout can change
  * without touching query code.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  /** Normalize an event-time column to a session-timezone `TimestampType`
    * (micros), whatever the parquet physically stores. The testdata has
    * carried two encodings across driver generations:
    *   - TIMESTAMP(NANOS), which Spark's vectorized reader surfaces as
    *     nanos-since-epoch `LongType` under
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (sessions keep that
    *     conf on — harmless for other types, and preserves compatibility
    *     if ns data ever returns). Integral `div` (not `/`, which routes
    *     through double and loses precision above 2^53) converts to µs.
    *   - timestamp[us] (the current generation), read as TIMESTAMP_NTZ
    *     (or TIMESTAMP with inferTimestampNTZ off); sessions pin
    *     `spark.sql.session.timeZone=UTC`, so the NTZ→TZ cast is the
    *     identity on the epoch value.
    * Every consumer of `events.ts` (batch queries, layout keys, streaming
    * sources) MUST go through this one dispatch so a future encoding change
    * breaks in exactly one place. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.withColumn(colName, normalizeTsCol(df.schema(colName).dataType, colName))

  /** Column-level form of [[normalizeTs]] for callers that already know the
    * input type (e.g. streaming sources with a declared schema). */
  def normalizeTsCol(dt: DataType, colName: String): Column = dt match {
    case LongType           => timestamp_micros(expr(s"$colName div 1000"))
    case _: TimestampNTZType => col(colName).cast(TimestampType)
    case _: TimestampType    => col(colName)
    case other => throw new IllegalArgumentException(
      s"unsupported event-time type for '$colName': $other " +
        "(expected nanos LongType, TIMESTAMP, or TIMESTAMP_NTZ)")
  }

  /** `events` with `ts` already normalized — the loader queries should use. */
  def eventsTs(s: SparkSession, d: String): DataFrame =
    normalizeTs(events(s, d))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
