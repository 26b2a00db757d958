package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents whose shingle sets
  * substantially contain a probe (benchmark/eval) document's shingles — the
  * screen every training pipeline must run so eval data does not leak into
  * training data.
  *
  * Scale shape: the probe side is a benchmark suite — thousands of
  * documents, not billions — so its exploded shingle set broadcasts; the
  * corpus side streams map-side through shingle explode into one
  * hash-aggregation on (doc, probe). No corpus self-join, no shuffle of
  * document text, and the output is bounded by true overlaps. Containment
  * (|corpus ∩ probe| / |probe|) rather than Jaccard: a 10-word benchmark
  * answer embedded in a 10k-word document is 100% contained but has
  * near-zero Jaccard.
  */
object Decontaminate {

  /** @param probePred selects the probe (benchmark) rows of `docs`
    * @param minContainment keep pairs with containment ≥ this
    * @param maxProbeRows refusal bound on the PROBE side: its exploded
    *        shingles are broadcast, so the operator is asymmetric by design
    *        — the corpus may be arbitrarily large, the probe must stay
    *        benchmark-sized. A predicate that accidentally selects a corpus
    *        slice would otherwise build a giant broadcast and OOM the driver.
    * @param n shingle width in words. 3 (default) keeps the native
    *        [[Dedup.wordTrigrams]] expression; other widths (the published
    *        decontamination recipes collide on 8–13-grams) build distinct
    *        positional n-grams over a materialized token array, with the
    *        same whole-text fallback below n tokens that wordTrigrams has.
    *        Wider shingles = fewer spurious matches, but a probe answer
    *        shorter than n words can only match via the whole-text
    *        fallback — pick n at or below the shortest probe you care
    *        about.
    * @return doc_id, probe_id, overlap (shared distinct shingles),
    *         containment */
  def contamination(
      docs: DataFrame, id: String, text: String,
      probePred: Column, minContainment: Double,
      maxProbeRows: Long = 100000L, n: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val probeDocs = docs.filter(probePred)
    require(Guard.atMost(probeDocs, maxProbeRows),
      s"contamination broadcasts the probe side's exploded shingles: " +
        s"probePred selects more than maxProbeRows=$maxProbeRows rows. The " +
        "probe is the (small) benchmark suite and the corpus the (large) " +
        "streamed side — swap the sides or raise maxProbeRows explicitly " +
        "if the probe set is genuinely this big.")
    val probeGrams = grams(probeDocs, id, text, "probe_id", n)
    val probeSizes = probeGrams.groupBy("probe_id")
      .agg(count(lit(1)).as("probe_n"))
    // fanOut: the corpus-side shingle explode must not run on the scan's
    // (often single-file) partitioning — see Dedup.fanOut
    grams(Dedup.fanOut(docs.filter(!probePred)), id, text, "doc_id", n)
      .join(broadcast(probeGrams), Seq("tg"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("overlap"))
      .join(broadcast(probeSizes), Seq("probe_id"))
      .select(col("doc_id"), col("probe_id"), col("overlap"),
        (col("overlap").cast("double") / col("probe_n")).as("containment"))
      .filter(col("containment") >= minContainment)
  }

  /** One row per distinct shingle per document: (idAs, tg). */
  private def grams(
      df: DataFrame, id: String, text: String, as: String,
      n: Int): DataFrame =
    if (n == 3)
      df.select(col(id).as(as),
        explode(Dedup.wordTrigrams(col(text))).as("tg"))
    else {
      // tokens materialized as a real column; the shingle expression
      // feeds the Generate directly (the two Catalyst rules
      // Dedup.cutDuplicatedSpans documents)
      val t = col("__t")
      val sh = when(size(t) >= n,
        array_distinct(TextAnalysis.ngramsFrom(t, n)))
        .otherwise(array(concat_ws(" ", t)))
      df.select(col(id).as(as), col(text).as("__text"))
        .withColumn("__t", split(col("__text"), " "))
        .select(col(as), explode(sh).as("tg"))
        // null/empty text falls into the whole-text fallback and would emit
        // an empty shingle; drop it so degenerate documents behave exactly
        // like the n=3 wordTrigrams path (which drops null-text rows)
        .filter(length(col("tg")) > 0)
    }

  /** [[contamination]] for probe suites too big to broadcast their exact
    * shingle sets (a full eval-harness sweep can hold 10⁸+ distinct
    * n-grams; at that size the exact broadcast OOMs and [[contamination]]
    * rightly refuses). Two stages, EXACT by construction (the
    * [[BloomJoin]] argument: Bloom filters have no false negatives, and
    * false positives die in the verify join):
    *
    *  1. Bloom pre-screen: ONE distributed sketch aggregation compresses
    *     the probe side's shingle hashes into a compact filter
    *     (~14 bits/shingle at fpp 1e-3 — two orders denser than the
    *     strings) that ships to every corpus task; a corpus shingle the
    *     filter rejects drops map-side, BEFORE any exchange. Real
    *     contamination is rare, so this is almost the whole corpus.
    *  2. Exact verify: the surviving shingles equi-join the probe
    *     shingles on their 64-bit hash as a plain shuffle join — the
    *     probe set that could not broadcast stays distributed, and the
    *     corpus side of the exchange is now survivor-sized. Distinct
    *     grams colliding on xxhash64 would merge (the [[TextAnalysis
    *     .topNgrams]] collision argument: negligible and deterministic).
    *
    * @param expectedProbeShingles sizes the filter; overestimate wastes
    *        bits, underestimate raises fpp — both stay exact
    * @return doc_id, probe_id, overlap, containment — [[contamination]]'s
    *         schema and values */
  def contaminationBloomed(
      docs: DataFrame, id: String, text: String,
      probePred: Column, minContainment: Double,
      expectedProbeShingles: Long, fpp: Double = 0.001,
      n: Int = 3): DataFrame = {
    require(expectedProbeShingles > 0,
      s"bad probe-shingle estimate: $expectedProbeShingles")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val spark = docs.sparkSession
    // materialize the (large, by premise) probe shingles ONCE: the bloom
    // sketch action, the per-probe size aggregate and the verify join all
    // read this frame — un-checkpointed they would each re-run the
    // probe-side tokenize+explode (the lshIndexBuild lifecycle reasoning)
    val probeGrams = grams(docs.filter(probePred), id, text, "probe_id", n)
      .withColumn("tgh", xxhash64(col("tg")))
      .localCheckpoint()
    val bf = probeGrams.stat
      .bloomFilter("tgh", expectedProbeShingles, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))
    val probeSizes = probeGrams.groupBy("probe_id")
      .agg(count(lit(1)).as("probe_n"))
    grams(Dedup.fanOut(docs.filter(!probePred)), id, text, "doc_id", n)
      .withColumn("tgh", xxhash64(col("tg")))
      .filter(mightContain(col("tgh"))) // map-side; kills ~the whole corpus
      .select(col("doc_id"), col("tgh"))
      // exact verify: plain equi-join, NO broadcast hint — the premise is
      // a probe side too big to broadcast; AQE still may, if it shrank
      .join(probeGrams.select(col("probe_id"), col("tgh")), Seq("tgh"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("overlap"))
      .join(probeSizes, Seq("probe_id"))
      .select(col("doc_id"), col("probe_id"), col("overlap"),
        (col("overlap").cast("double") / col("probe_n")).as("containment"))
      .filter(col("containment") >= minContainment)
  }
}
