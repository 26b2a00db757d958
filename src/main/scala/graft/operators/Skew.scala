package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot aggregation/join keys.
  *
  * At 100 TB a single hot key (one customer, one null-ish default) can pin
  * an entire shuffle partition to one task. Salting splits each key into
  * `buckets` sub-keys for a partial aggregate, then combines partials — two
  * small shuffles instead of one skewed one. (AQE's skew-join handling
  * covers joins; salting covers aggregations and older planners.)
  */
object Skew {

  /** Two-phase salted aggregation: count + sum per key, numerically equal
    * to the direct groupBy (sums are reassociated — same canonicalized
    * result). `saltSource` must be deterministic per row (any column). */
  def saltedCountSum(
      df: DataFrame, key: String, value: String, saltSource: Column,
      buckets: Int = 16): DataFrame = {
    val partial = df
      .select(col(key), col(value).as("v"),
        pmod(xxhash64(saltSource), lit(buckets.toLong)).as("salt"))
      .groupBy(col(key), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
    partial
      .groupBy(col(key))
      .agg(sum(col("pc")).cast("long").as("cnt"), sum(col("ps")).as("sum_v"))
  }
}
