package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{count, lit, round, sum}

package object queries {

  /** Order-insensitive floating-point aggregation (driver-gate hash
    * stability): each value is rounded at a fixed decimal scale, summed as
    * exact integers — associative and commutative, so partial-aggregation
    * order can never flip a last bit — and divided back once. The DuckDB
    * oracle twin is `sum(CAST(round(x * scale) AS BIGINT)) / scale`.
    * Per-row rounding is engine-agreed: both sides round the *same* double
    * (identical parse tree) half-away-from-zero. Cents scale leaves ~1e11
    * max-value money rows per group of headroom before 2^63 overflow.
    */
  private[queries] def stableSum(e: Column, scale: Double = 100.0): Column =
    sum(round(e * lit(scale)).cast("long")) / lit(scale)

  /** avg as (exact-sum / scale) / count — same tree as the oracle's
    * `sum(CAST(round(x * scale) AS BIGINT)) / scale / count(*)`. */
  private[queries] def stableAvg(e: Column, scale: Double = 100.0): Column =
    stableSum(e, scale) / count(lit(1))

  /** One certified operator: a Spark builder plus (when SQL-expressible) the
    * equivalent DuckDB oracle SQL over the same parquet tables. Column names
    * and types must match between the two — the correctness harness sorts
    * columns by name and hash-compares values.
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      /** For rows-only queries: the one-line WHY (estimator state,
        * encounter-order semantics, oracle runtime) — surfaced in
        * `rows_only.json` so a CORRECTNESS consumer can tell a
        * documented estimator from a real missing oracle. */
      rowsOnlyWhy: Option[String] = None)

  object Q {
    def apply(name: String, oracle: String)(
        fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, Some(oracle))

    /** Rows-only check: no DuckDB-expressible oracle (engine-specific
      * hashing, e.g. MinHash signatures). `why` states the rationale
      * (the full version lives in the query's scaladoc). */
    def rowsOnly(name: String, why: String)(
        fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, None, Some(why))
  }
}
