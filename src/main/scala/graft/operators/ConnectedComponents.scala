package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation WITH pointer doubling —
  * turns near-dup PAIRS into dedup CLUSTERS (cluster id = smallest doc id
  * in the component), which is what a curation pipeline actually consumes:
  * keep one representative per cluster.
  *
  * Each round does two distributed steps (and exactly two Spark jobs — the
  * convergence changed-count rides the propagate checkpoint as an observed
  * metric instead of a third per-round count job):
  *  1. propagate: every node adopts the minimum label among itself and its
  *     neighbors (one join + one aggregation);
  *  2. shortcut (pointer doubling): every node then adopts the label OF its
  *     label (`component ← label(component)` — valid because labels are
  *     node ids and label(m) ≤ m, so the jump is monotone non-increasing).
  *
  * The shortcut halves the distance to the component minimum each round, so
  * convergence is O(log diameter) rounds, not O(diameter): a 1M-hop chain
  * converges in ~20 rounds where plain hash-min would need 1M. This is the
  * same mechanism as the Hash-to-Min / large-star contraction family
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) expressed as two DataFrame joins.
  *
  * Iteration frames are materialized with `localCheckpoint`, which (a)
  * truncates the logical plan each round — without it the plan doubles per
  * iteration and analysis time explodes — and (b) stores blocks under
  * reference tracking, so the ContextCleaner frees them when the frames are
  * dropped: no CacheManager entry outlives the call (earlier rounds leaked
  * the returned `persist()`ed frame forever).
  *
  * If the loop exhausts `maxIters` without converging it THROWS rather than
  * silently returning split clusters (a wrong answer that hash-matches
  * nothing): with pointer doubling, 30 rounds cover any component a 2^30-
  * node graph can contain, so hitting the bound means something is broken,
  * not big.
  */
object ConnectedComponents {

  /** @param edges two columns `src`, `dst` (undirected pairs, any order)
    * @param maxIters rounds bound — convergence needs ~log2(diameter)+1
    * @return `node`, `component` (min node id of the component)
    * @throws IllegalStateException if labels are still changing after
    *         `maxIters` rounds */
  def components(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = bidir.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    // tiny-loop gate ([[TinyLoop]]): the bidirectional edge list bounds
    // every round frame (labels = its distinct sources), and each round
    // re-joins it anyway, so one cached-scan count covers the loop;
    // enabled() first — disabled mode must not pay even that count
    val tiny = TinyLoop.enabled(edges.sparkSession) &&
      TinyLoop.isTiny(edges.sparkSession, bidir.count())
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // 1. propagate: min over self + neighbor labels.
      val neighborMin = bidir
        .join(labels, bidir("dst") === labels("node"))
        .groupBy(bidir("src").as("node"))
        .agg(min(col("component")).as("nbr_min"))
      // Convergence is checked on the PROPAGATE step alone — sound because
      // a propagate fixed point forces label(u) = label(v) across every
      // edge (each side's min-over-neighborhood bounds the other), i.e.
      // uniform labels per component, under which the shortcut is a no-op.
      // This makes the final round skip the shortcut join entirely.
      //
      // The changed-count rides the checkpoint job as an observed metric
      // (CollectMetrics accumulates while rows stream into the checkpoint
      // blocks) instead of a separate join + count job per round: the old
      // label is already on the propagate join, so comparing it there is
      // free, and rounds cost 2 jobs (propagate, shortcut), not 3.
      val (propWide, changed) = TinyLoop.pinCounted(labels.as("l")
        .join(neighborMin.as("n"), Seq("node"), "left_outer")
        .select(col("node"), col("component").as("__prev"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("__next")),
        tiny, s"graft_cc_changed_$iter",
        sum(when(col("__next") =!= col("__prev"), 1L).otherwise(0L)))
      val prop = propWide
        .select(col("node"), col("__next").as("component"))
      converged = changed == 0
      if (converged) {
        labels = prop
      } else {
        // 2. shortcut: component ← label(component). Every label IS a node
        // id present in `prop` (labels only ever take values from the node
        // set), so the lookup always matches; left_outer + coalesce is belt
        // and braces. label(m) ≤ m ⇒ the jump never increases a label.
        labels = TinyLoop.pin(prop.as("a")
          .join(prop
              .select(col("node").as("pnode"), col("component").as("pcomp"))
              .as("b"),
            col("a.component") === col("pnode"), "left_outer")
          .select(col("node"),
            coalesce(col("pcomp"), col("a.component")).as("component")),
          tiny)
      }
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge after $maxIters rounds; " +
          "with pointer doubling this needs ~log2(component diameter) " +
          "rounds — raise maxIters only if the graph genuinely has a " +
          s"component deeper than 2^$maxIters nodes")
    labels
  }

  /** Near-dup clusters of a document corpus: MinHash+LSH pairs → CC →
    * (doc_id, cluster_id) for every doc in at least one pair. */
  def dupClusters(
      docs: DataFrame, id: String, text: String,
      threshold: Double): DataFrame =
    components(
      Dedup.minHashLshPairs(docs, id, text, threshold)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
}
