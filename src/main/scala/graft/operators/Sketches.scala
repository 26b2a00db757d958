package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count estimation as a library surface: the KMV (k-minimum-
  * values) sketch ([[graft.functions.KmvSketch]]) wrapped in the
  * estimator arithmetic, so a pipeline gets `count(DISTINCT x)` shape
  * without the distinct shuffle — duplicates collapse map-side inside
  * each partial aggregate and at most k longs per group cross the wire.
  *
  * `tokenHash` picks the 64-bit hash: [[xxhash64]] (default — codegen'd,
  * the at-scale choice) or [[Dedup.md5Hash64]] (SQL-portable; what the
  * q_a13/q_a14 oracles replay). Estimator: `D̂ = (k−1)/h₍ₖ₎` over the
  * k-th smallest distinct hash normalized to [0,1) unsigned, exact count
  * when fewer than k distinct hashes exist; relative error ≈ 1/√(k−2)
  * (≈ 6 % at the default k = 256). Mergeable and streaming-safe (the
  * buffer rides the state store; KmvSpec pins prefix consistency). */
object Sketches {

  val KmvDefaultK = 256

  /** The estimate Column over a KMV sketch array — the one IEEE tree both
    * the Scala surface and the DuckDB oracles state: normalize the k-th
    * smallest hash by `CAST AS DOUBLE / 2⁶⁴ + (h<0 ? 1 : 0)` (unsigned
    * without 128-bit math), divide into k−1. The `size(sketch) < k`
    * exactness fallback counts distinct HASHES, not values — a 64-bit
    * collision inside a ≤k-distinct group would undercount by 1; at
    * p ≈ k²/2⁶⁵ this is negligible and inherent to KMV (the estimator
    * branch carries the same collapse inside its order statistic). */
  private[graft] def kmvEstimate(sketch: Column, k: Int): Column = {
    val kth = element_at(sketch, k)
    val norm = kth.cast("double") / lit(18446744073709551616.0) +
      when(kth < 0, lit(1.0)).otherwise(lit(0.0))
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / norm)
  }

  /** Approximate global distinct counts, one estimate column per input
    * column, single scan. */
  def approxDistinct(
      df: DataFrame, cols: Seq[String], k: Int = KmvDefaultK,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(cols.nonEmpty, "approxDistinct needs at least one column")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val aggs = cols.map(c => graft.functions.GraftFunctions
      .kmvSketch(tokenHash(col(c).cast("string")), k).as(s"__kmv_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(cols.map(c =>
        kmvEstimate(col(s"__kmv_$c"), k).as(s"est_$c")): _*)
  }

  /** Approximate distinct `valueCol` per group — the realistic shape
    * (distinct users per day, distinct docs per crawl): one shuffle of
    * ≤k longs per group, never the values. */
  def approxDistinctByGroup(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = KmvDefaultK,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(groupCols.nonEmpty, "approxDistinctByGroup needs group columns")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.GraftFunctions
        .kmvSketch(tokenHash(col(valueCol).cast("string")), k).as("__kmv"))
      .select(groupCols.map(col) :+
        kmvEstimate(col("__kmv"), k).as(s"est_$valueCol"): _*)
  }
}
