package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[graft.queries.Q]]: a Spark
  * builder `(SparkSession, sfDir) => DataFrame` plus, when SQL-expressible,
  * the equivalent DuckDB oracle SQL over the same parquet tables. Column
  * names/types match exactly between the two sides (the harness sorts
  * columns by name before hashing).
  */
object SparkEntry {

  private def registry: Seq[Q] =
    graft.queries.Core.all ++
      graft.queries.Extras.all ++
      graft.queries.Events.all ++
      graft.queries.Text.all ++
      graft.queries.DedupQ.all ++
      graft.queries.SimilarityQ.all ++
      graft.queries.MultimodalQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary (SURVEY.md §2.4). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Core.qA1Pricing.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hashing) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
