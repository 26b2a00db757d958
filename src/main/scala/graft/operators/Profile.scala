package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic table profiling — the data-quality pass a pipeline runs before
  * trusting a new drop: per-column non-null/null counts, distinct counts,
  * and min/max, for ANY input schema, in ONE aggregation over one scan.
  *
  * Shape: a single wide `agg` row (4 aggregates per column + one total)
  * pivoted to one output row per column by `inline` over a literal struct
  * array — a driver-free projection of the single agg row, so the whole
  * profile is one job whose only exchange carries one partial-agg row per
  * task regardless of table width.
  *
  * `exactDistinct = false` (the default, and the 100 TB shape) uses
  * `approx_count_distinct` (HLL++, one pass, mergeable sketches).
  * `true` switches to `count(DISTINCT col)` for every column at once —
  * Catalyst plans that via Expand (input ×(columns+1)) — which is the
  * verification-scale mode q_s14 certifies against DuckDB's exact
  * answers. Min/max are emitted as strings so the profile row shape is
  * schema-independent.
  */
object Profile {

  /** @return one row per input column:
    *         (column, dtype, n_non_null, n_nulls, n_distinct,
    *         min_value, max_value) */
  def profileTable(
      df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__n_${f.name}"),
        (if (exactDistinct) countDistinct(c)
         else approx_count_distinct(c)).as(s"__d_${f.name}"),
        min(c).cast("string").as(s"__min_${f.name}"),
        max(c).cast("string").as(s"__max_${f.name}"))
    }
    val row = df.agg(count(lit(1)).as("__total"),
      aggs.toIndexedSeq: _*)
    row
      .select(col("__total"), inline(array(fields.map(f => struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col(s"__n_${f.name}").as("n_non_null"),
        col(s"__d_${f.name}").as("n_distinct"),
        col(s"__min_${f.name}").as("min_value"),
        col(s"__max_${f.name}").as("max_value"))).toIndexedSeq: _*)))
      .select(col("column"), col("dtype"),
        col("n_non_null"),
        (col("__total") - col("n_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Fixed-range equi-width histogram of a numeric column — the
    * distribution half of profiling ([[profileTable]] gives the
    * moments). One hash aggregation on the bucket id; rows outside
    * [lo, hi) drop (count them via [[profileTable]]'s min/max first —
    * which is also how a caller picks the range). The bucket arithmetic
    * is a single `floor((x − lo) / width)` in IEEE doubles, so an
    * engine computing the same expression buckets identically —
    * q_a12 certifies it bucket for bucket against DuckDB. */
  def histogram(
      df: DataFrame, column: String, bins: Int,
      lo: Double, hi: Double): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    require(lo < hi, s"empty range: [$lo, $hi)")
    val width = (hi - lo) / bins
    val c = col(column).cast("double")
    df.filter(c >= lo && c < hi)
      .select(floor((c - lit(lo)) / lit(width)).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * lit(width)).as("lo_edge"),
        col("cnt"))
  }
}
