package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag and union both sides, then one `last_value(..., ignoreNulls)`
  * window per picked column over (partition, time, side) ordering, keeping
  * left rows. Right rows sort before left rows at equal timestamps, so an
  * exactly-simultaneous right row matches (ASOF `<=` semantics).
  *
  * Scale shape: ONE shuffle of the unioned inputs by partition key — same
  * cost class as a sort-merge join, no range explosion, no skew beyond the
  * key's own distribution; AQE skew handling applies. A custom SparkPlan
  * could fuse the union away, but the window form stays inside codegen and
  * inherits every planner feature for free.
  */
object AsOfJoin {

  /** For each left row, attach `pickCols` from the latest right row with
    * `rightTime <= leftTime` within the same `partitionCol` group
    * (null when no prior right row exists).
    *
    * Column name contract: `leftTime`/`rightTime` name the event-time
    * columns; picked columns get a `asof_` prefix in the output.
    * `rightTieCol` breaks ties among right rows sharing a timestamp (the
    * highest value wins) — without it the winner would be physical row
    * order, which varies run to run.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      partitionCol: String,
      leftTime: String, rightTime: String,
      pickCols: Seq[String],
      rightTieCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tieType = rightTieCol.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    // side 0 = right (visible at equal time), side 1 = left
    val taggedRight = right.select(
      (col(partitionCol).as("__part") +:
        col(rightTime).as("__t") +:
        lit(0).as("__side") +:
        rightTieCol.fold(lit(0L).cast(tieType))(col).as("__tie") +:
        pickCols.map(c => col(c).as(s"asof_$c"))) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(partitionCol).as("__part") +:
        col(leftTime).as("__t") +:
        lit(1).as("__side") +:
        lit(0L).cast(tieType).as("__tie") +:
        pickCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"asof_$c"))) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy(col("__part"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = pickCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) =>
        df.withColumn(s"asof_$c",
          last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ pickCols.map(c => col(s"asof_$c")): _*)
  }
}
