package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — Spark would execute the naive inequality
  * join as a broadcast-nested-loop (quadratic scan). The scalable form bins
  * time into fixed buckets: intervals explode into the buckets they cover,
  * points key into one bucket, the join becomes an equi-join on
  * (key, bucket), and the exact inequality is re-checked on the matches.
  * Result set is provably identical to the naive join; cost is
  * |intervals|·(span/bin) + |points| shuffled on a composite key the
  * planner can hash — skew governed by bucket width.
  */
object RangeJoin {

  /** Rows of `points` matched to every row of `intervals` of the same
    * `key` with `pointTime` ∈ [`startCol`, `endCol`] (inclusive), via
    * `binSize`-wide buckets. Times are numeric (e.g. epoch seconds). */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      key: String, pointTime: String,
      startCol: String, endCol: String,
      binSize: Long): DataFrame = {
    val p = points.withColumn("__bin",
      expr(s"$pointTime div $binSize"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binSize"),
        expr(s"$endCol div $binSize"))))
    p.join(iv, Seq(key, "__bin"))
      .filter(col(pointTime) >= col(startCol)
        && col(pointTime) <= col(endCol))
      .drop("__bin")
  }
}
