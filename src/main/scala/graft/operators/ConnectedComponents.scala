package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns near-dup
  * PAIRS into dedup CLUSTERS (cluster id = smallest doc id in the
  * component), which is what a curation pipeline actually consumes: keep
  * one representative per cluster.
  *
  * Each round: every node adopts the minimum label among itself and its
  * neighbors; converged when no label changes. Rounds ≈ component diameter
  * (near-dup clusters are tiny), each round one join + one aggregation —
  * all distributed; the only driver-side value is the convergence count.
  */
object ConnectedComponents {

  /** @param edges two columns `src`, `dst` (undirected pairs, any order)
    * @return `node`, `component` (min node id of the component) */
  def components(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = bidir.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = bidir
        .join(labels, bidir("dst") === labels("node"))
        .groupBy(bidir("src").as("node"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels.as("l")
        .join(neighborMin.as("n"), Seq("node"), "left_outer")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .persist()
      val changed = next.as("a")
        .join(labels.as("b"), Seq("node"))
        .filter(col("a.component") =!= col("b.component"))
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    bidir.unpersist()
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
