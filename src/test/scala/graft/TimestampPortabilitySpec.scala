package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The events-time type dispatch ([[Tables.normalizeTs]]): all three
  * physical encodings the testdata has carried (or could carry again)
  * must normalize to the SAME micros TimestampType values — the legacy
  * nanos-long path is dead code against the current timestamp[us] data,
  * and this spec is what keeps it honest. */
class TimestampPortabilitySpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private val epochMicros = Seq(
    0L,                      // epoch
    1704153600000000L,       // 2024-01-02 00:00:00
    1704239999999999L,       // last micro of 2024-01-02
    1704240000000001L)       // just past a day boundary

  test("nanos-long, TIMESTAMP, and TIMESTAMP_NTZ normalize identically") {
    import spark.implicits._
    val asLong = epochMicros.map(_ * 1000L).toDF("ts") // ns since epoch
    val asTs = epochMicros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val asNtz = asTs.select(col("ts").cast(TimestampNTZType).as("ts"))
    def normed(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Tables.normalizeTs(df)
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
        .sorted
    val fromLong = normed(asLong)
    assert(fromLong == epochMicros.sorted, s"nanos path: $fromLong")
    assert(normed(asTs) == epochMicros.sorted, "TimestampType path")
    assert(normed(asNtz) == epochMicros.sorted,
      "TIMESTAMP_NTZ path (UTC session makes the cast the identity)")
    // normalized type is TimestampType on every path
    Seq(asLong, asTs, asNtz).foreach { df =>
      assert(Tables.normalizeTs(df).schema("ts").dataType ==
        TimestampType)
    }
  }

  test("nanos sub-microsecond precision truncates via integral div") {
    import spark.implicits._
    // 1234 ns → 1 µs (floor), never a double round-trip above 2^53
    val big = (1L << 60) + 1234L
    val out = Tables.normalizeTs(Seq(big).toDF("ts"))
      .select(unix_micros(col("ts"))).collect().head.getLong(0)
    assert(out == big / 1000L, s"expected ${big / 1000L}, got $out")
  }

  test("event stream cold-starts on an empty directory with the µs schema") {
    // the normal birth of a new ingest: the directory exists but holds
    // no files yet — schema inference fails with UNABLE_TO_INFER_SCHEMA
    // and the stream must fall back to the current-generation schema
    // (normalized ts) instead of throwing
    val dir = java.nio.file.Files.createTempDirectory("graft_cold").toString
    val df = graft.streaming.Streams.readEventStream(spark, dir)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType == TimestampType,
      "cold-started stream must carry the normalized event-time type")
  }

  test("unsupported event-time types are refused loudly") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeTs(Seq("2024-01-02").toDF("ts"))
    }
    assert(e.getMessage.contains("unsupported event-time type"))
  }
}
