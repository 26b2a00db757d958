package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** One certified operator: a Spark builder plus (when SQL-expressible) the
    * equivalent DuckDB oracle SQL over the same parquet tables. Column names
    * and types must match between the two — the correctness harness sorts
    * columns by name and hash-compares values.
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, oracle: String)(
        fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, Some(oracle))

    /** Rows-only check: no DuckDB-expressible oracle (engine-specific
      * hashing, e.g. MinHash signatures). */
    def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, None)
  }
}
