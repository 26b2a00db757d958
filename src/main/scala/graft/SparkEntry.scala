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

  /** (defining file, queries) per registry module — [[graft.Docs]]'s
    * source of truth, so the README appendix cannot drift from the code. */
  private[graft] def registryModules: Seq[(String, Seq[Q])] = Seq(
    "queries/Core.scala" -> graft.queries.Core.all,
    "queries/Extras.scala" -> graft.queries.Extras.all,
    "queries/Events.scala" -> graft.queries.Events.all,
    "queries/Text.scala" -> graft.queries.Text.all,
    "queries/DedupQ.scala" -> graft.queries.DedupQ.all,
    "queries/SimilarityQ.scala" -> graft.queries.SimilarityQ.all,
    "queries/MultimodalQ.scala" -> graft.queries.MultimodalQ.all)

  private def registry: Seq[Q] = registryModules.flatMap(_._2)

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
    registry.collect { case Q(n, _, Some(sql), _) => n -> sql }.toMap

  /** The rows-only queries (no oracle SQL) with their one-line
    * rationales — written by [[Verify]] as `rows_only.json` next to
    * `oracle_sql.json`, so a consumer of the driver's CORRECTNESS file
    * can tell a DOCUMENTED estimator (rows-only by nature, spec-pinned,
    * with a certified twin) from a genuinely missing oracle. */
  def rowsOnly: Map[String, String] =
    registry.collect {
      case Q(n, _, None, why) =>
        n -> why.getOrElse("no SQL-expressible oracle")
    }.toMap
}
