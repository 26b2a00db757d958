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

  /** Exact top-k rows per group without a group-sized sort partition:
    * the salted two-level rank ([[TextAnalysis.capPerKey]]'s shape,
    * generalized to any ordering). Level 1 ranks within
    * (group, salt-of-row) partitions — each ~n_group/`salts` rows — and
    * keeps k per salt; level 2 ranks the ≤ k·`salts` survivors. The
    * global top-k of a group is a subset of its per-salt top-ks, so the
    * result EXACTLY equals the naive `row_number() OVER (PARTITION BY
    * group ORDER BY …) <= k` — which is what the certified oracle
    * (q_o2) computes — while the biggest partition anyone sorts is
    * max(n_group/salts, k·salts) rows instead of n_group.
    *
    * `order` must be a TOTAL order per group (append a unique id as the
    * last sort key); a tie crossing a salt boundary could otherwise pick
    * either row. `saltSource` must be deterministic per row.
    *
    * @return the input columns plus `rank` (1..k per group) */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int,
      saltSource: Column, salts: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(salts >= 1, s"salts must be >= 1: $salts")
    require(groupCols.nonEmpty && order.nonEmpty, "need group and order")
    // helper/output names are injected below; an input frame already
    // carrying one would be silently clobbered or make the select ambiguous
    Seq("__salt", "__r1", "rank").foreach { reserved =>
      require(!df.columns.contains(reserved),
        s"topKPerGroup reserves column name '$reserved'; rename it first")
    }
    import org.apache.spark.sql.expressions.Window
    val inCols = df.columns.toSeq
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)))
    val pruned = salted
      .withColumn("__r1", row_number().over(
        Window.partitionBy((groupCols.map(col) :+ col("__salt")): _*)
          .orderBy(order: _*)))
      .where(col("__r1") <= k)
    pruned
      .withColumn("rank", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*))
        .cast("long"))
      .where(col("rank") <= k)
      .select((inCols.map(col) :+ col("rank")): _*)
  }

  /** FULL per-group row numbering without a group-sized sort
    * partition — the companion to [[topKPerGroup]] for when EVERY row
    * needs its rank (a crawl fetch sequence, a per-key pagination
    * index), not just the top k. Exactly equals `row_number() OVER
    * (PARTITION BY group ORDER BY order)` when `order` is a total
    * order within each group (append a unique tiebreak column
    * otherwise — ties straddling a range boundary would rank
    * partition-dependently).
    *
    * Shape: range-partition on (group ++ order) splits a hot group's
    * rows across CONTIGUOUS partitions, so no task ever holds more
    * than ~n_total/`numPartitions` rows regardless of key skew. The
    * rank then assembles from two bounded pieces:
    *   1. a row_number window over (physical partition id, group) —
    *      each window group is a slice of one range partition, capped
    *      by the partition size;
    *   2. per-(group, partition) counts cumulated per group in
    *      partition-id order — at most `numPartitions` rows per
    *      group — joined back as each slice's starting offset.
    * Both pieces MUST observe the identical partition assignment, and
    * "the same exchange in two plan branches" does not guarantee
    * that: range boundaries are re-sampled per execution, and AQE may
    * coalesce the exchange's output differently for each consumer —
    * either way `spark_partition_id()` diverges between the branches
    * and offsets misalign (caught by the crawl-loop ScaleProbe on a
    * 10k-row hot host). So the range-partitioned frame is pinned with
    * an EAGER `localCheckpoint()`: one materialization of the data
    * (the price of correctness here — comparable to the shuffle that
    * precedes it), after which both consumers read the same frozen
    * partitions. Range boundaries split on the full (group ++ order)
    * tuple, so every row in an earlier partition-id slice of a group
    * sorts before every row in a later one — offset + local rank IS
    * the global rank.
    *
    * @return the input columns plus `outCol` (1-based long rank) */
  def rankWithinKey(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      outCol: String = "rank", numPartitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty && orderCols.nonEmpty,
      "need group and order columns")
    Seq("__pid", "__lr", "__off", outCol).foreach { reserved =>
      require(!df.columns.contains(reserved),
        s"rankWithinKey reserves column name '$reserved'; rename it")
    }
    import org.apache.spark.sql.expressions.Window
    val inCols = df.columns.toSeq
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val rangeCols = (groupCols ++ orderCols).map(col)
    // eager pin: see scaladoc — both consumers below must agree on
    // __pid, which only a materialized partition assignment guarantees
    val parted = df.repartitionByRange(n, rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = parted.withColumn("__lr", row_number().over(
      Window.partitionBy((col("__pid") +: groupCols.map(col)): _*)
        .orderBy(orderCols.map(col): _*)))
    val offsets = parted
      .groupBy((groupCols.map(col) :+ col("__pid")): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(
          Window.partitionBy(groupCols.map(col): _*)
            .orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select((groupCols.map(col) :+ col("__pid") :+ col("__off")): _*)
    local.join(offsets, groupCols :+ "__pid")
      .withColumn(outCol, (col("__off") + col("__lr")).cast("long"))
      .select((inCols.map(col) :+ col(outCol)): _*)
  }
}
