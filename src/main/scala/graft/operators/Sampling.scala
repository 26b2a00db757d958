package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Exact-k deterministic sampling — the missing sibling of the rate-based
  * samplers ([[graft.operators.TextAnalysis.stratifiedKeep]] keeps a
  * FRACTION per stratum; [[graft.operators.Skew.topKPerGroup]] ranks by a
  * domain ordering): "give me exactly k uniform examples per group",
  * reproducibly, in one aggregation pass.
  *
  * Mechanism: a deterministic md5-prefix priority per id (the engine's
  * standard portable hash — the same device stratifiedKeep's thresholds
  * and the NB feature buckets use; NOT a linear congruence, whose
  * priorities stay correlated on structured id sets like one-source-
  * every-20-ids) + the [[graft.functions.BottomKSketch]] bounded-heap
  * aggregate. Scale shape: the only exchange is the group-key hash
  * aggregate, and map-side partials cap what crosses the wire at k pairs
  * per group per partition — unlike a `row_number()` window, which
  * shuffles and sorts EVERY row. md5 is bit-identical across engines,
  * so any SQL engine can replay the exact draw (q_t38's DuckDB oracle
  * recomputes it with a window formulation).
  */
object Sampling {

  /** The deterministic priority column: the first 8 hex digits of
    * `md5(cast(id as string))` read as a long in [0, 2^32). Uniform
    * scatter regardless of id structure, replayable in plain SQL
    * (`('0x' || substring(md5(id::VARCHAR), 1, 8))::BIGINT` in DuckDB). */
  def md5Priority(id: Column): Column =
    conv(substring(md5(id.cast("long").cast("string")), 1, 8), 16, 10)
      .cast("long")

  /** Exactly min(k, |group|) rows per group, drawn uniformly and
    * reproducibly by md5 priority over `idCol` (ids must be integrals,
    * unique within a group for an exact-k guarantee; priority ties break
    * by id).
    *
    * @return groupCols + idCol + `rank` (1..k in priority order) */
  def uniformPerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame =
    drawPerGroup(df, groupCols, idCol, k, md5Priority(col(idCol)))

  /** Weight-biased exact-k sampling per group — priority sampling
    * (Duffield, Lund, Thorup: priority q = w/u for uniform u, keep the
    * k largest q), the standard one-pass weighted sample with unbiased
    * subset-sum estimators. Expressed in pure integer arithmetic so the
    * draw is replayable in any SQL engine: u = the md5 priority in
    * [0, 2^32), selection key = `(u+1)·2^20 / w` ASCENDING (equivalent
    * to q = w/(u+1) descending; +1 guards u = 0; the 2^20 scale keeps
    * integer division from collapsing distinct ratios; products stay
    * under 2^53). Heavier rows draw smaller keys and are
    * proportionally more likely to be kept — sample documents by token
    * count and the expected token mass is balanced, the usual pipeline
    * ask. `weightCol` must be a positive integral column.
    *
    * @return groupCols + idCol + `rank` (1..k in key order) */
  def weightedPerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, k: Int): DataFrame =
    drawPerGroup(df, groupCols, idCol, k,
      // `div` = IntegralDivide: EXACT integer division (DuckDB's `//`),
      // not the fractional `/` whose double rounding could flip a key
      call_function("div",
        (md5Priority(col(idCol)) + 1) * lit(1L << 20),
        col(weightCol).cast("long")))

  private def drawPerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String, k: Int,
      priority: Column): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(groupCols.nonEmpty, "need at least one group column")
    Seq("rank", "__bk").foreach { reserved =>
      require(!df.columns.contains(reserved),
        s"sampling reserves column name '$reserved'; rename it first")
    }
    GraftFunctions.register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_bottomk",
        priority, col(idCol).cast("long"), lit(k))
        .as("__bk"))
      .select((groupCols.map(col) :+ posexplode(col("__bk"))): _*)
      .select((groupCols.map(col) :+
        col("col.item").as(idCol) :+
        (col("pos") + 1).cast("long").as("rank")): _*)
  }
}
