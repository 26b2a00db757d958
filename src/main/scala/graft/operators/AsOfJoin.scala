package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag and union both sides; every right row carries ONE
  * non-null struct holding its own time plus all picked values, and a
  * single `last_value(struct, ignoreNulls)` window over (partition,
  * time, side) ordering fills left rows. The struct guarantees value and
  * matched-time always come from the SAME (nearest) right row — filling
  * each column independently would skip a null pick value back to an
  * older right row while the matched time stayed on the nearest one,
  * so the tolerance gate would validate a stale value against the wrong
  * row's age. Right rows sort before left rows at equal timestamps, so
  * an exactly-simultaneous right row matches (ASOF `<=` semantics).
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
    * (null when no prior right row exists) — or, with
    * `forward = true`, from the EARLIEST right row with
    * `rightTime >= leftTime` (the merge_asof 'forward' direction; the
    * same union is windowed over descending time, so the cost is
    * unchanged).
    *
    * `tolerance = Some(tol)` bounds the match's time gap (pandas
    * merge_asof semantics): a matched right row farther than `tol` time
    * units from the left row yields nulls instead. The time columns must
    * be NUMERIC in the unit `tol` is stated in (epoch micros etc. —
    * cast timestamps first); the matched right time rides the same
    * window fill, so tolerance adds no extra pass.
    *
    * Column name contract: `leftTime`/`rightTime` name the event-time
    * columns; picked columns get a `asof_` prefix in the output.
    * `rightTieCol` breaks ties among right rows sharing a timestamp (the
    * highest value wins in BOTH directions) — without it the winner
    * would be physical row order, which varies run to run.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      partitionCol: String,
      leftTime: String, rightTime: String,
      pickCols: Seq[String],
      rightTieCol: Option[String] = None,
      forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    tolerance.foreach { tol =>
      require(tol >= 0, s"tolerance must be nonnegative: $tol")
      require(right.schema(rightTime).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        left.schema(leftTime).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        "asOf tolerance needs NUMERIC time columns (cast timestamps to " +
          "epoch units first so the tolerance unit is explicit)")
    }
    val leftCols = left.columns.toSeq
    val tieType = rightTieCol.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val rtType = right.schema(rightTime).dataType
    // The matched right row travels as ONE struct (__rt = its own time,
    // plus every picked value — possibly-null fields ride inside a
    // non-null struct) so a single last(ignoreNulls) takes the nearest
    // right row wholesale; __rt feeds the tolerance check.
    val matchType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rt", rtType) +:
        pickCols.map(c => org.apache.spark.sql.types.StructField(
          s"asof_$c", right.schema(c).dataType)))
    // side 0 = right (visible at equal time), side 1 = left
    val taggedRight = right.select(
      (col(partitionCol).as("__part") +:
        col(rightTime).as("__t") +:
        lit(0).as("__side") +:
        rightTieCol.fold(lit(0L).cast(tieType))(col).as("__tie") +:
        Seq(struct(col(rightTime).as("__rt") +:
          pickCols.map(c => col(c).as(s"asof_$c")): _*).as("__m"))) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(partitionCol).as("__part") +:
        col(leftTime).as("__t") +:
        lit(1).as("__side") +:
        lit(0L).cast(tieType).as("__tie") +:
        Seq(lit(null).cast(matchType).as("__m"))) ++
        leftCols.map(col): _*)

    // forward flips only the time ordering; right rows still sort before
    // left rows at the boundary timestamp (ASOF >= semantics) and the
    // highest tie still wins (greatest __tie is nearest the current row)
    val timeOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__part"))
      .orderBy(timeOrd, col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
    val matchedLeft = filled.filter(col("__side") === 1)
    val bounded = tolerance.fold(matchedLeft) { tol =>
      // delta in the columns' NATIVE numeric type: cast("long") would
      // truncate fractional (double/decimal) times toward zero and make
      // the inclusive bound wrong by up to one unit
      val rt = col("__m.__rt")
      val delta = if (forward) rt - col("__t") else col("__t") - rt
      val ok = rt.isNotNull && delta <= lit(tol)
      matchedLeft.withColumn("__m", when(ok, col("__m")))
    }
    bounded.select(leftCols.map(col) ++
      pickCols.map(c => col(s"__m.asof_$c").as(s"asof_$c")): _*)
  }
}
