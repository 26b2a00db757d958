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
    def grams(df: DataFrame, as: String): DataFrame =
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
      }
    val probeGrams = grams(probeDocs, "probe_id")
    val probeSizes = probeGrams.groupBy("probe_id")
      .agg(count(lit(1)).as("probe_n"))
    // fanOut: the corpus-side shingle explode must not run on the scan's
    // (often single-file) partitioning — see Dedup.fanOut
    grams(Dedup.fanOut(docs.filter(!probePred)), "doc_id")
      .join(broadcast(probeGrams), Seq("tg"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("overlap"))
      .join(broadcast(probeSizes), Seq("probe_id"))
      .select(col("doc_id"), col("probe_id"), col("overlap"),
        (col("overlap").cast("double") / col("probe_n")).as("containment"))
      .filter(col("containment") >= minContainment)
  }
}
