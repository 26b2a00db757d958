package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact, O(|Q|·|C|) — correct baseline, used
  *    when the query set is small (broadcast) or as the oracle;
  *  - random-hyperplane LSH buckets: the scale path — candidates share a
  *    sign-pattern bucket, so the join is equi-key and linear-ish; recall
  *    traded via number of planes/tables.
  *
  * All arithmetic is `Column`-level (zip_with/aggregate fold over doubles,
  * sequential order) so results are bit-reproducible and SQL-portable.
  */
object Similarity {

  /** Sequential-fold dot product of two double-array columns. Uses the
    * native codegen'd [[graft.functions.DoubleDot]] expression (identical
    * ascending-index accumulation order to the HOF formulation — results
    * are bit-equal; this is purely the fast path). */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.doubleDot(a, b)

  /** vec_id, v (double array), nrm (L2 norm) — shared projection. Fans the
    * corpus across all cores first: a compact source (one parquet file →
    * one input split) would otherwise run every downstream pair loop
    * through a single task. */
  def normed(emb: DataFrame, id: String, vec: String): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val v = transform(col(vec), x => x.cast("double"))
    emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(id).as("vec_id"), v.as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    dot(va, vb) / (na * nb)

  /** All near-duplicate pairs with cosine ≥ threshold (brute-force
    * self-join; LSH-bucket first at scale). */
  def cosineNearDupPairs(
      emb: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val n = normed(emb, id, vec)
    n.as("a")
      .join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Exact top-k cosine neighbors for each query vector (queries broadcast
    * against the candidate corpus; ranks tie-broken by candidate id). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(queries.as("q"))
      .join(corpus.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("cand_id"),
        cosine(col("q.v"), col("c.v"), col("q.nrm"), col("c.nrm")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"), col("sim"))
  }

  /** Number of random hyperplanes = bucket sign bits. 6 planes → 64
    * buckets: sized so a corpus partition keeps enough candidates per
    * bucket; scale up with corpus size (buckets ≈ corpus/expected-bucket-
    * occupancy). */
  val Planes = 6

  /** Deterministic pseudo-random hyperplanes (LCG, fixed seed) — no RNG
    * state, reproducible across runs and executors. */
  def hyperplanes(dim: Int, planes: Int = Planes): Array[Array[Double]] = {
    var s = 42L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(planes, dim)(next())
  }

  /** Sign-pattern LSH bucket id for a double-vector column. */
  def lshBucket(v: Column, dim: Int, planes: Int = Planes): Column = {
    val hp = hyperplanes(dim, planes)
    (0 until planes).map { p =>
      val w = typedlit(hp(p).toSeq)
      when(dot(v, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF coarse quantization: number of inverted lists and probed lists. */
  val IvfLists = 16
  val IvfProbes = 2

  /** IVF-style ANN: a deterministic coarse quantizer (centroids = the
    * corpus vectors with the IvfLists smallest ids — reproducible without
    * RNG or iterative training; swap in k-means centroids at scale)
    * partitions the corpus into inverted lists; each query probes its
    * IvfProbes nearest lists only. The list assignment is one broadcast
    * argmax over IvfLists cosines per vector — linear, shuffle-free — and
    * the search joins on list id instead of crossing the corpus.
    * Probabilistic recall → rows-only certification. */
  def ivfTopK(
      emb: DataFrame, id: String, vec: String,
      queryPred: Column, k: Int): DataFrame = {
    val n = normed(emb, id, vec)
    val cents = n.orderBy(col("vec_id")).limit(IvfLists)
      .select(col("vec_id").as("list_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))

    // rank lists per vector by cosine; vectors keep 1 list, queries probe 2
    val scored = n.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("list_id"),
        cosine(col("v"), col("cv"), col("nrm"), col("cnrm")).as("cs"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cs").desc, col("list_id"))
    val ranked = scored.withColumn("lr", row_number().over(w))

    val corpusLists = ranked.filter(col("lr") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("list_id"))
    val queryLists = ranked.filter(queryPred && col("lr") <= IvfProbes)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("list_id"))

    val cand = broadcast(queryLists)
      .join(corpusLists,
        queryLists("list_id") === corpusLists("list_id")
          && col("q_id") =!= col("vec_id"))
      .select(col("q_id").as("query_id"), col("vec_id").as("cand_id"),
        cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("sim"))
      .distinct()
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    cand
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"), col("sim"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Misses are possible by construction (rows-only certification); the
    * payoff is an equi-join on bucket instead of a cross join. */
  def lshTopK(
      emb: DataFrame, id: String, vec: String,
      queryPred: Column, k: Int, dim: Int): DataFrame = {
    val n = normed(emb, id, vec)
      .withColumn("bucket", lshBucket(col("v"), dim))
    val q = n.filter(queryPred)
    val scored = broadcast(q.as("q"))
      .join(n.as("c"),
        col("q.bucket") === col("c.bucket")
          && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("cand_id"),
        cosine(col("q.v"), col("c.v"), col("q.nrm"), col("c.nrm")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"), col("sim"))
  }
}
