package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction ("Bloom join", classic distributed-DB
  * technique: Mackert & Lohman SIGMOD'86 evaluated it for R*; Spark itself
  * applies the idea internally as runtime row-level filtering).
  *
  * Shape: ONE index-build aggregation over the build side produces a
  * compact Bloom filter of its join keys; the filter ships to every probe
  * task (a few MB broadcast, built via Spark's `DataFrameStatFunctions
  * .bloomFilter` sketch aggregate — map-side combined, no key list on the
  * driver); probe rows whose key cannot be in the build side drop BEFORE
  * the join's exchange. At 100 TB this is the difference between shuffling
  * the whole fact table and shuffling only the ~selectivity fraction that
  * can match — the exchange the optimizer cannot prune statically when the
  * build side is filtered at runtime.
  *
  * EXACT by construction: a Bloom filter has no false negatives, and the
  * false-positive rows it lets through are removed by the real join that
  * follows — so the output equals the plain join row-for-row (the oracle
  * states the plain join) while the shuffle carries ~fpp extra rows.
  */
object BloomJoin {

  /** Inner-join `probe` to `build` on `probeKey == buildKey`, pre-filtering
    * the probe side through a Bloom filter of the build side's long keys.
    *
    * @param expectedBuildRows sizes the filter (bits ≈ 1.44·n·log2(1/fpp));
    *        pass the build side's approximate cardinality — an OVERestimate
    *        only wastes filter bits, an underestimate only raises the
    *        false-positive rate. Both keep the result exact.
    * @param materializeBuild localCheckpoint the build side so the eager
    *        bloomFilter job and the final join share one computation.
    *        Default FALSE: a checkpoint replaces the scan's statistics
    *        with LogicalRDD defaults (which can cost a broadcast plan
    *        when AQE is off), pins blocks until the frame is GC'd, and
    *        cannot recompute on executor loss — the right trade only when
    *        the build side is an expensive derived pipeline, so that
    *        caller opts in explicitly. */
  def bloomFilteredJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedBuildRows: Long, fpp: Double = 0.01,
      materializeBuild: Boolean = false): DataFrame = {
    require(expectedBuildRows > 0, s"bad cardinality: $expectedBuildRows")
    val spark = probe.sparkSession
    val buildM = if (materializeBuild) build.localCheckpoint() else build
    // distributed sketch aggregate: executors build partial filters over
    // their partitions, the driver ORs the compact bitsets together
    val bf: BloomFilter =
      buildM.stat.bloomFilter(buildKey, expectedBuildRows, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
    // alias both sides so probeKey == buildKey (joining on the same column
    // name, the common case) resolves instead of AMBIGUOUS_REFERENCE
    val p = probe.as("__bj_p")
    val b = buildM.as("__bj_b")
    p.filter(col(probeKey).isNotNull && mightContain(col(probeKey)))
      .join(b, col(s"__bj_p.$probeKey") === col(s"__bj_b.$buildKey"))
  }
}
