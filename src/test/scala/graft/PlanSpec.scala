package graft
import org.scalatest.funsuite.AnyFunSuite

class PlanSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize this exact plan so AQE finalizes it
    df.queryExecution.executedPlan.toString
  }

  test("filters and projections reach the parquet scan") {
    val p = plan("q_a1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p)
    val proj = plan("q_p1_project")
    assert(proj.contains("ReadSchema") &&
      !proj.contains("l_shipdate"), "projection should prune unused columns:\n" + proj)
  }

  test("dim-side joins broadcast") {
    assert(plan("q_j1_join").contains("BroadcastHashJoin"), plan("q_j1_join"))
    assert(plan("q_j2_derived_key").contains("BroadcastHashJoin"))
  }

  test("snowflake join broadcasts every dimension") {
    val p = plan("q_a8_local_supplier")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected all dims broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "no dim should fall back to a shuffled join:\n" + p)
  }

  test("top-k avoids global sort") {
    assert(plan("q_o1_topk").contains("TakeOrderedAndProject"), plan("q_o1_topk"))
  }

  test("exact embedding near-dup plans an equi-join, not a nested loop") {
    val p = plan("q_d5_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "blocked all-pairs must not degrade to a nested loop:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("decontamination broadcasts the probe side") {
    val p = plan("q_t8_decontam")
    assert(p.contains("BroadcastHashJoin"),
      "probe shingles must broadcast — corpus side stays map-side:\n" + p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("multi-table LSH stays equi-join — no nested loop or cartesian") {
    val p = plan("q_x2_ann_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "bucket candidates and vector join-back must be equi-joins:\n" + p)
  }

  test("IVF list assignment is map-side — no corpus cross join") {
    val p = plan("q_x3_ann_ivf")
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"),
      "centroid scoring must ride as literal expressions:\n" + p)
  }

  test("all-pairs operators refuse oversized inputs") {
    import graft.Tables
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6,
        maxRows = 10L)
    }
    assert(e1.getMessage.contains("minHashLshPairs"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Similarity.cosineNearDupPairs(emb, "vec_id",
        "embedding", 0.45, maxRows = 10L)
    }
    assert(e2.getMessage.contains("all-pairs"))
  }

  test("like filter pushes to scan") {
    val p = plan("q_p4_like")
    assert(p.contains("PushedFilters") && p.contains("StringContains") || p.contains("Or(StringContains"), p)
  }

  test("mixture sampling broadcasts the rates — corpus rows never shuffle") {
    val p = plan("q_t14_mixture")
    assert(p.contains("BroadcastHashJoin"),
      "per-source rates must broadcast onto the corpus scan:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "a sources-sized table must never force a corpus shuffle join:\n" + p)
  }

  test("frequent n-gram mining cuts top-k without a global sort") {
    val p = plan("q_t15_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k cut must be TakeOrderedAndProject, not Sort+Limit:\n" + p)
  }

  test("classifier scoring is one scan-stage projection — no exchange") {
    val p = plan("q_t16_classifier")
    assert(!p.contains("Exchange"),
      "linear scoring must stay map-side in the scan stage:\n" + p)
  }

  test("gopher rules are one scan-stage projection — no exchange") {
    val p = plan("q_t27_gopher_rules")
    assert(!p.contains("Exchange"),
      "heuristic rules must stay map-side in the scan stage:\n" + p)
  }

  test("LM model scoring is a narrow map — no exchange") {
    import graft.operators.TextAnalysis
    val docs = graft.Tables.documents(GraftSpark.spark, GraftSpark.sf)
    val model = TextAnalysis.lmTrain(docs, "doc_id", "text", minCount = 2)
    val p = TextAnalysis.lmScoreWith(model, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      "broadcast-model scoring must not shuffle:\n" + p)
  }

  test("gram/span plans never re-evaluate an array expression in a filter") {
    // regression guard for the InferFiltersFromGenerate trap: exploding a
    // materialized array ATTRIBUTE lets the optimizer add a size(c) > 0
    // filter that pushdown inlines below the defining Project on
    // deterministic chains — re-running the whole array build per row,
    // interpreted (measured 5-10× on q_d11/q_t21 before the fix). The
    // tell is a Filter node whose predicate contains the gram/span
    // construction (a transform over split output).
    for (q <- Seq("q_d11_span_cut", "q_t15_top_ngrams",
        "q_t21_top_trigrams", "q_d9_dup_spans")) {
      val bad = plan(q).linesIterator.filter(l =>
        l.contains("Filter") && l.contains("transform(split("))
      assert(bad.isEmpty,
        s"$q re-evaluates the gram build inside a Filter:\n" +
          bad.mkString("\n"))
    }
  }

  test("date-partitioned read prunes to the selected partition") {
    val p = plan("q_s11_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(event_date")
      || p.contains("PartitionFilters: [(event_date"),
      "the day filter must prune partitions at the scan:\n" + p)
  }

  test("salted two-level ranks get WindowGroupLimit pushdown at both levels") {
    for (q <- Seq("q_t30_source_cap", "q_o2_topk_per_group")) {
      val p = plan(q)
      val limits = "WindowGroupLimit".r.findAllIn(p).length
      // partial+final per level = 4 nodes; the pushdown is what keeps
      // each sort bounded by k instead of the partition size
      assert(limits >= 4, s"$q lost WindowGroupLimit pushdown:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q grew a join:\n$p")
    }
  }

  test("centroid outliers broadcast every label-sized frame") {
    val p = plan("q_x8_centroid_outliers")
    assert(!p.contains("SortMergeJoin"),
      "label-sized joins must broadcast, never shuffle the corpus:\n" + p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("length buckets are one aggregation exchange") {
    // AQE's string repeats the plan under "== Initial Plan ==" — count
    // only the final section
    val p = plan("q_t31_length_buckets").split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1, s"expected exactly one agg exchange:\n$p")
  }

  test("funnel carries only user-keyed exchanges, no windows") {
    val p = plan("q_e10_funnel")
    assert(!p.contains("Window"), "funnel must not use window functions:\n" + p)
    val bad = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
        !l.contains("user_id"))
    assert(bad.isEmpty,
      s"non-user exchange in the funnel:\n${bad.mkString("\n")}")
  }

  test("3-D Hilbert is a zero-exchange projection chain") {
    val p = plan("q_z4_hilbert3")
    assert(!p.contains("Exchange"),
      "the Skilling fold must stay narrow — no shuffle:\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("NB training is one bucket-bounded agg + a broadcast of totals") {
    val p = plan("q_t36_nb_train")
    // bucket hash-agg shuffles on the b-bounded bucket key; the 1-row
    // totals ride a broadcast — the corpus is never exchanged raw
    val hashEx = p.linesIterator.filter(
      _.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("bucket")),
      s"non-bucket hash exchange in NB training:\n${hashEx.mkString("\n")}")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "totals must broadcast, not shuffle:\n" + p)
  }

  test("distributed IVF-PQ join path: equi-joins only, ranks limited") {
    val p = plan("q_x10_ann_ivfpq_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the list equi-join:\n" + p)
    // both shortlist ranks must carry a group limit — without it the
    // per-(query,salt) and per-query sorts buffer every candidate
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      "two-level shortlist lost its WindowGroupLimit pushdown:\n" + p)
  }

  test("distributed IVF-SQ8 join path: equi-joins only, ranks limited, ADC in codegen") {
    val p = plan("q_x13_ann_ivfsq8_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the list equi-join:\n" + p)
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      "two-level shortlist lost its WindowGroupLimit pushdown:\n" + p)
    // the asymmetric distance must be the native expression inside
    // whole-stage codegen, not an RDD drop-out or a HOF reconstruction
    assert(p.contains("sq8adcdistance") || p.contains("Sq8AdcDistance")
      || p.toLowerCase.contains("sq8_adc"),
      "SQ8 ADC kernel missing from the executed plan:\n" + p)
  }

  test("WARC manifest scan prunes payload and reports byte statistics") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_plan")
    graft.sources.WarcIO.warcSave(
      Tables.documents(spark, sf).limit(40).select(
        concat(lit("https://e/"), col("doc_id").cast("string"))
          .as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:d:"), col("doc_id").cast("string"), lit(">"))
          .as("record_id"),
        lit("text/html").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload")).repartition(2),
      dir.toString)
    val manifest = spark.read.format("graft-warc").load(dir.toString)
      .select("target_uri", "warc_type")
    manifest.collect()
    val p = manifest.queryExecution.executedPlan.toString
    assert(p.contains("target_uri") && !p.contains("payload"),
      "payload must be pruned from the manifest scan:\n" + p)
  }

  test("GIF frame extraction and FLAC decode carry no shuffle") {
    // both are flatMap/map-shaped codec passes: the only allowed
    // exchange is the explicit round-robin spreading of the compact
    // synthetic source across cores
    for (q <- Seq("q_m19_gif_frames", "q_m20_flac_decode")) {
      val p = plan(q)
      val bad = p.linesIterator.filter(l =>
        l.contains("Exchange") && !l.contains("RoundRobinPartitioning"))
      assert(bad.isEmpty,
        s"$q: codec pass must not shuffle:\n${bad.mkString("\n")}")
    }
  }

  test("disjunctive join predicate keeps the equi-key hash join") {
    val p = plan("q_j9_disjunctive_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "the OR residual must ride the l_partkey equi-join as a filter:\n" + p)
  }

  test("correlated subqueries decorrelate to joins — no per-row subquery") {
    val p9 = plan("q_a9_exists_priority")
    assert(p9.contains("LeftSemi"),
      "EXISTS must rewrite to a left-semi join:\n" + p9)
    val p10 = plan("q_a10_correlated_max")
    assert(p10.toLowerCase.contains("join") && !p10.contains("SubqueryExec"),
      "correlated scalar subquery must become aggregate+join:\n" + p10)
    for (p <- Seq(p9, p10))
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p)
  }

  test("audio and image content near-dup stay banded equi-joins — no nested loop") {
    for (q <- Seq("q_m26_audio_neardup", "q_m28_image_mirror_dedup",
        "q_m29_video_reorder_dedup")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"$q must join on (band, bv), never all-pairs:\n" + p)
    }
  }

  test("distributed ANN join scores ADC inside codegen — no RDD drop-out") {
    // the r10→r11 fix: the per-pair ADC scan must stay a codegen'd
    // expression (AdcDistance) in a Project over the candidate join, not
    // an opaque RDD mapPartitions (which re-boxed every pair and caused
    // a 15× run-to-run spread). SerializeFromObject/DeserializeToObject
    // around the scoring stage are the signature of that drop-out.
    val p = plan("q_x10_ann_ivfpq_join")
    assert(p.contains("adcdistance") && p.contains("packunitvector"),
      "ADC must be the native expression pair:\n" + p)
    val score = p.linesIterator
      .filter(_.contains("adcdistance")).mkString("\n")
    assert(!score.contains("Deserialize"),
      s"ADC scoring fell out of codegen:\n$score")
  }

  test("spectral features and URL canonicalization shuffle nothing") {
    // both are per-row maps; the only acceptable exchange is the decode
    // pass's explicit round-robin rebalance
    for (q <- Seq("q_m25_audio_spectral", "q_t40_url_canonical")) {
      val p = plan(q)
      val bad = p.linesIterator.filter(l =>
        l.contains("Exchange") && !l.contains("RoundRobinPartitioning"))
      assert(bad.isEmpty,
        s"$q: narrow op must not shuffle:\n${bad.mkString("\n")}")
    }
  }

  test("KMV sketch combines map-side; scan reads only the key columns") {
    val p = plan("q_a13_kmv_distinct").split("== Initial Plan ==").head
    // the whole point of the sketch: duplicates collapse in the partial
    // aggregate, so the single-partition exchange moves <=2k longs per
    // task, never the keys
    assert(p.contains("partial_kmvsketch"),
      "KMV must partial-aggregate before the exchange:\n" + p)
    val partialBelowExchange = p.linesIterator
      .dropWhile(l => !l.contains("Exchange SinglePartition"))
      .exists(_.contains("partial_kmvsketch"))
    assert(partialBelowExchange,
      "partial sketch must sit below the exchange:\n" + p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>"),
      "column pruning must reach the scan:\n" + p)
  }

  test("SQ8 scan broadcasts queries; exact rank is two-level, never corpus-sized") {
    val p = plan("q_x11_ann_sq8")
    // queries (the tiny side) are the broadcast build side; the corpus
    // rides ONE narrow scan with the quantizer literals inline
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft"),
      "queries must broadcast:\n" + p)
    assert(p.contains("LessThan(vec_id,8)"),
      "query-side filter must reach the parquet scan:\n" + p)
    assertSaltedExactRank(p, "SQ8")
  }

  test("brute-force top-k uses the same salted two-level rank") {
    val p = plan("q_x1_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft"),
      "queries must broadcast:\n" + p)
    assertSaltedExactRank(p, "brute")
  }

  test("IVF-SQ8 probes via equi-join; rank stays two-level") {
    val p = plan("q_x12_ann_ivfsq8")
    // the candidate step is a LIST equi-join with broadcast query probes
    // — never a nested-loop scan of the corpus
    assert(p.contains("BroadcastHashJoin [list_id"),
      "probed lists must candidate via a broadcast equi-join:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "IVF-SQ8 must not fall back to a nested-loop scan:\n" + p)
    // 2 shuffles since the r21 fusion: ONE (query, salt) repartition
    // shared by the shared-list dedup agg and rank level 1 (the salt is
    // a pure function of the candidate id, so both are clustered by
    // it), + the level-2 per-query rank. Was 3 when the dedup agg
    // exchanged separately on (query, cand).
    assertSaltedExactRank(p, "IVF-SQ8", expectShuffles = 2)
  }

  /** The exact top-k paths must never sort one query's whole scored
    * corpus in a single window partition: level 1 partitions by
    * (query, salt) with a PARTIAL WindowGroupLimit below its exchange
    * (each task forwards ≤ k rows per salt group), level 2 ranks the
    * ≤ salts·k survivors per query. Two hash exchanges, both pruned. */
  private def assertSaltedExactRank(p: String, tag: String,
      expectShuffles: Int = 2): Unit = {
    assert(p.contains("__salt"),
      s"$tag rank lost its salt level:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 4,
      s"$tag two-level rank lost WindowGroupLimit pushdown:\n$p")
    val partialBelowExchange = p.linesIterator
      .dropWhile(l => !l.contains("Exchange hashpartitioning"))
      .exists(l => l.contains("WindowGroupLimit") && l.contains("Partial"))
    assert(partialBelowExchange,
      s"$tag partial top-k prune must sit below the rank exchange:\n$p")
    // count in the FINAL plan only (AQE's printout repeats the initial)
    val shuffles = p.split("== Initial Plan ==").head.linesIterator
      .filter(l =>
        l.contains("Exchange") && !l.contains("RoundRobinPartitioning")
          && !l.contains("BroadcastExchange")).toSeq
    assert(shuffles.size == expectShuffles,
      s"$tag top-k needs exactly $expectShuffles pruned shuffles:\n" +
        shuffles.mkString("\n"))
    // and the per-query exchange must hash on query_id alone (level 2)
    assert(p.contains("hashpartitioning(query_id"),
      s"$tag level-2 rank must partition by query_id:\n$p")
  }

  /** Run `f`, returning its value plus every WARN+ log line matching
    * `needle` emitted while it ran — the only way to observe Catalyst's
    * "Max iterations (100) reached" fixpoint warning (RuleExecutor logs
    * it but exposes nothing via API outside spark.testing mode). */
  private def withCapturedWarnings[A](needle: String)(f: => A)
      : (A, Seq[String]) = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    import org.apache.logging.log4j.core.layout.PatternLayout
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new AbstractAppender("graft-fixpoint-cap", null,
        PatternLayout.createDefaultLayout(), false, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent)
          : Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains(needle)) hits.add(m)
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    try (f, hits.toArray(Array.empty[String]).toSeq)
    finally {
      cfg.getRootLogger.removeAppender("graft-fixpoint-cap")
      ctx.updateLoggers(); app.stop()
    }
  }

  test("wide mixture maps stay inside the optimizer's fixpoint budget") {
    // The r18 test log's two "Max iterations (100) reached" warnings
    // traced to the 10x composed-pipeline probe: mixtureResample over
    // ~100 distinct sources built its share map as a foldRight of
    // when(...).otherwise(nested) — N NESTED CaseWhen levels that the
    // optimizer flattens one per fixpoint pass, so ~100 sources
    // exhausted the 100-iteration budget. The share map is now ONE
    // flat CaseWhen (when().when()... chain) and must optimize in a
    // handful of passes no matter how many sources the mixture names.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 150 // comfortably past the 100-iteration budget if nested
    val docs = spark.range(0, 600, 1, 4)
      .select(col("id").as("doc_id"),
        concat(lit("text of doc "), col("id")).as("text"),
        concat(lit("src"), (col("id") % n).cast("string")).as("source"))
    val weights = (0 until n).map(i => s"src$i" -> 1.0 / n).toMap
    val ((), warnings) = withCapturedWarnings("Max iterations") {
      graft.operators.TextAnalysis
        .mixtureResample(docs, "doc_id", "text", "source", weights,
          totalMultiple = 0.5)
        .collect()
      graft.operators.TextAnalysis
        .mixtureSample(docs, "doc_id", "text", "source", weights)
        .collect()
      val rates = (0 until n).map(i => s"src$i" -> 0.5).toMap
      docs.filter(graft.operators.TextAnalysis.stratifiedKeep(
        col("doc_id"), col("source"), rates, defaultRate = 1.0)).collect()
      ()
    }
    assert(warnings.isEmpty,
      s"optimizer fixpoint budget exhausted:\n${warnings.mkString("\n")}")
  }
}
