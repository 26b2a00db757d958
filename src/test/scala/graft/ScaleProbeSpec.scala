package graft
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class ScaleProbeSpec extends AnyFunSuite {
  import GraftSpark.spark
  test("minhash scales ~linearly 5k -> 50k docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // each copy prefixes every token, so copies share no shingles — the
    // true-pair count grows linearly (256 per copy), not quadratically
    val big = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"c$i"), w))).as("text"))).reduce(_ unionByName _)
    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    // warm
    Dedup.minHashLshPairs(docs, "doc_id", "text", 0.6).count()
    // best-of-two per size: this is a quadratic-blowup guard (a true
    // quadratic regression shows ~100x), not a precision benchmark —
    // shared-box variance between runs is real.
    def best(df: => org.apache.spark.sql.DataFrame): Double =
      math.min(time(df), time(df))
    val t1 = best(Dedup.minHashLshPairs(docs, "doc_id", "text", 0.6))
    val t10 = best(Dedup.minHashLshPairs(big, "doc_id", "text", 0.6))
    println(f"minhash 5k: $t1%.2f s, 50k: $t10%.2f s, ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear blowup: $t1 vs $t10")
  }

  test("capPerKey equals the naive window on a 100k-row hot domain") {
    import org.apache.spark.sql.expressions.Window
    // one domain holds every row — the regime where the naive
    // PARTITION BY source window becomes a single 100k-row sort task;
    // the salted two-level rank must return the identical survivor set
    val docs = spark.range(100000L)
      .select(col("id").as("doc_id"), lit("hot").as("source"))
    val got = graft.operators.TextAnalysis
      .capPerKey(docs, "doc_id", "source", cap = 50)
      .select("doc_id", "cap_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hkey = md5(concat(lit("cap"), col("doc_id").cast("string"))
      .cast("binary"))
    val naive = docs.withColumn("__k", hkey)
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("__k"), col("doc_id"))))
      .where(col("rn") <= 50)
      .select(col("doc_id"), col("rn").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"salted decomposition diverged: ${
      (got -- naive).take(3)} / ${(naive -- got).take(3)}")
    assert(got.size == 50)
  }

  test("topKPerGroup equals the naive window under group skew") {
    import org.apache.spark.sql.expressions.Window
    // 90% of rows in one group, ties everywhere (value = id % 7) — the
    // id tiebreak must keep the order total across salt boundaries
    val docs = spark.range(20000L).select(col("id"),
      when(col("id") % 10 < 9, "big").otherwise("small").as("grp"),
      (col("id") % 7).as("v"))
    val got = graft.operators.Skew.topKPerGroup(docs, Seq("grp"),
      Seq(col("v").desc, col("id")), k = 8, saltSource = col("id"))
      .select("grp", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val naive = docs.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("v").desc, col("id"))))
      .where(col("rn") <= 8)
      .select(col("grp"), col("id"), col("rn").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, s"diverged: ${(got -- naive).take(3)}")
    assert(got.size == 16)
  }

  test("bottom-k sampler equals the window draw on a 100k-row hot group") {
    import org.apache.spark.sql.expressions.Window
    // 100k of 110k rows in ONE group: the window formulation sorts the
    // whole hot partition; the sketch path's exchange carries only
    // <= k pairs per map partition per group — same rows either way
    val docs = spark.range(110000L).select(col("id"),
      when(col("id") < 100000L, "hot")
        .otherwise(concat(lit("g"), col("id") % 97)).as("grp"))
    val k = 20
    val got = graft.operators.Sampling
      .uniformPerGroup(docs, Seq("grp"), "id", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val naive = docs
      .withColumn("pri", graft.operators.Sampling.md5Priority(col("id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy("pri", "id")))
      .where(col("rn") <= k)
      .select(col("grp"), col("id"), col("rn").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, s"diverged: ${(got -- naive).take(3)}")
    assert(got.count(_._1 == "hot") == k)
  }

  test("packShards packs a single giant group without a single-task sort") {
    import spark.implicits._
    // every row in ONE group: the old per-group window pulled the whole
    // input through one task; the two-level pack must stay partitioned and
    // still produce the exact greedy assignment
    val n = 50000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"), lit("g").as("source"),
      lit("a b c").as("text")) // 3 tokens per doc
    val out = graft.operators.TextAnalysis.packShards(
      docs, "doc_id", "text", "source", budgetTokens = 999L)
    assert(out.rdd.getNumPartitions > 1,
      "a giant group must not collapse into one partition")
    val bad = out.select("doc_id", "shard_id").as[(Long, Long)].collect()
      .filter { case (k, s) => s != (3 * k) / 999 }
    assert(bad.isEmpty, s"wrong shard ids: ${bad.take(5).toSeq}")
  }

  test("packShards equals the window formulation on multi-group data") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, GraftSpark.sf)
    val w = Window.partitionBy("source").orderBy("doc_id")
    val expected = docs
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("start_tok") / lit(1000L)).cast("long").as("shard_id"))
      .collect().map(_.toString).sorted.toSeq
    val actual = graft.operators.TextAnalysis.packShards(
        docs, "doc_id", "text", "source", budgetTokens = 1000L)
      .collect().map(_.toString).sorted.toSeq
    assert(actual == expected)
  }

  test("semantic dedup examines ~1/k of the exact pair space") {
    // the SemDeDup scale claim as a DETERMINISTIC count, not a timing:
    // intra-cluster pair search costs sum(c_i choose 2); on the sf0.1
    // corpus with k=16 that must be well under the exact all-pairs
    // n(n-1)/2 — balanced clusters give ~1/k, skew erodes it, so assert
    // a conservative 1/3 bound
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = emb.count()
    val exactPairs = n * (n - 1) / 2
    val clusterSizes = graft.operators.Similarity
      .kMeansAssign(emb, "vec_id", "embedding", k = 16)
      .groupBy("cluster").agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect()
    val intraPairs = clusterSizes.map(c => c * (c - 1) / 2).sum
    val ratio = intraPairs.toDouble / exactPairs
    println(f"semdedup pair-space ratio = $ratio%.4f " +
      f"($intraPairs of $exactPairs) over ${clusterSizes.length} clusters")
    assert(ratio < 1.0 / 3.0,
      f"clustering stopped pruning the pair space: $ratio%.3f")
  }

  test("duplicated spans scale ~linearly 5k -> 50k docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // same construction as the minhash probe: prefixed copies share no
    // trigrams, so dup-span mass grows linearly with the corpus
    val big = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"c$i"), w))).as("text"))).reduce(_ unionByName _)
    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    Dedup.duplicatedSpans(docs, "doc_id", "text").count() // warm
    def best(df: => org.apache.spark.sql.DataFrame): Double =
      math.min(time(df), time(df))
    val t1 = best(Dedup.duplicatedSpans(docs, "doc_id", "text"))
    val t10 = best(Dedup.duplicatedSpans(big, "doc_id", "text"))
    println(f"dupspans 5k: $t1%.2f s, 50k: $t10%.2f s, ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear blowup: $t1 vs $t10")
  }

  test("topNgrams scales ~linearly 5k -> 50k docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // prefixed copies share no n-grams, so the distinct-gram space (and the
    // hash-count exchange that carries it) grows linearly with the corpus
    val big = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"c$i"), w))).as("text"))).reduce(_ unionByName _)
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    import graft.operators.TextAnalysis
    TextAnalysis.topNgrams(docs, "doc_id", "text", k = 20).count() // warm
    def best(df: => org.apache.spark.sql.DataFrame): Double =
      math.min(time(df), time(df))
    val t1 = best(TextAnalysis.topNgrams(docs, "doc_id", "text", k = 20))
    val t10 = best(TextAnalysis.topNgrams(big, "doc_id", "text", k = 20))
    println(f"topNgrams 5k: $t1%.2f s, 50k: $t10%.2f s, ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear blowup: $t1 vs $t10")
  }

  test("LM scoring scales ~linearly 5k -> 50k docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // prefixed copies share no tokens, so vocabulary, bigram table and
    // transition mass all grow linearly with the corpus — if the
    // hash-keyed exchanges ever carried strings or the LM join went
    // quadratic, the ratio would blow past linear
    val big = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"c$i"), w))).as("text"))).reduce(_ unionByName _)
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    import graft.operators.TextAnalysis
    TextAnalysis.lmScore(docs, "doc_id", "text", minCount = 2).count() // warm
    def best(df: => org.apache.spark.sql.DataFrame): Double =
      math.min(time(df), time(df))
    val t1 = best(TextAnalysis.lmScore(docs, "doc_id", "text", minCount = 2))
    val t10 = best(TextAnalysis.lmScore(big, "doc_id", "text", minCount = 2))
    println(f"lmScore 5k: $t1%.2f s, 50k: $t10%.2f s, ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear blowup: $t1 vs $t10")
  }

  test("LM join scorer equals the closure scorer on random corpora") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // small vocab forces heavy bigram sharing (a real pruned LM); edge
    // lengths 0/1 exercise the no-transition path on both sides
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "the")
    for (round <- 0 until 3) {
      val docs = (0 until 60).map { i =>
        val len = (mix(round * 900L + i).abs % 14).toInt // 0..13 tokens
        val toks = (0 until len).map(j =>
          vocab((mix(round * 55L + i * 97L + j).abs % vocab.length).toInt))
        (i.toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val joinSide = key(TextAnalysis.lmScore(docs, "doc_id", "text",
        minCount = 2))
      val model = TextAnalysis.lmTrain(docs, "doc_id", "text", minCount = 2)
      val mapSide = key(TextAnalysis.lmScoreWith(model, docs,
        "doc_id", "text"))
      assert(mapSide == joinSide, s"round $round: scorers diverged")
    }
  }

  test("span cut equals a plain-Scala reference on random corpora") {
    import spark.implicits._
    import graft.operators.Dedup
    // deterministic generator: small vocab forces heavy trigram sharing,
    // so the cut genuinely fires across documents
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val vocab = Array("aa", "bb", "cc", "dd", "ee")
    for (round <- 0 until 3) {
      val docs = (0 until 40).map { i =>
        val len = (mix(round * 1000L + i).abs % 12).toInt // 0..11 tokens
        val toks = (0 until len).map(j =>
          vocab((mix(round * 77L + i * 131L + j).abs % vocab.length).toInt))
        (i.toLong, toks.mkString(" "))
      }
      // reference: direct restatement of the semantics, no Spark
      val triOf = docs.map { case (id, text) =>
        val t = text.split(" ", -1)
        id -> (if (t.length < 3) Seq.empty[Seq[String]]
               else t.sliding(3).map(_.toSeq).toSeq)
      }.toMap
      val dup = triOf.values
        .flatMap(_.distinct).groupBy(identity)
        .collect { case (g, occ) if occ.size >= 2 => g }.toSet
      val expected = docs.map { case (id, text) =>
        val t = text.split(" ", -1)
        val cut = triOf(id).zipWithIndex.collect {
          case (g, i) if dup(g) => Seq(i, i + 1, i + 2)
        }.flatten.toSet
        val clean = t.indices.filterNot(cut).map(t).mkString(" ")
        id -> ((id, clean, cut.size.toLong))
      }.toMap
      val got = Dedup.cutDuplicatedSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(0), r.getString(1), r.getLong(2))))
        .toMap
      val bad = expected.keys.filter(k => got(k) != ((expected(k))))
      assert(bad.isEmpty,
        s"round $round diverged for ids ${bad.take(3)}: " +
          bad.take(1).map(k => s"got ${got(k)} want ${expected(k)}")
            .mkString)
    }
  }

  test("connected components converge on a 200-hop chain (pointer doubling)") {
    import spark.implicits._
    // chain 0-1-2-...-200: diameter 200, one component with min label 0.
    // Plain hash-min needs 200 rounds; pointer doubling must close it
    // within the default 30 (log2(200) ≈ 8 propagate+shortcut rounds).
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = graft.operators.ConnectedComponents.components(edges)
    val comps = labels.select("component").distinct().as[Long].collect()
    assert(comps.sameElements(Array(0L)), s"split chain: ${comps.toSeq}")
    assert(labels.count() == 201)
  }

  test("cc convergence rides the checkpoint job — no count action per round") {
    import spark.implicits._
    val names =
      java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { names.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    // warm the compact clone BEFORE registering the listener:
    // cloneSession snapshots the parent's listener set, so a clone
    // created after registration would echo round events back into
    // this session and the mode-2 assertions would depend on which
    // suite happened to create the clone first
    graft.operators.ConnectedComponents.components(
      Seq((0L, 1L)).toDF("src", "dst"))
    spark.listenerManager.register(listener)
    def quiesce(): Array[String] = {
      // the listener bus is async: wait for the event stream to quiesce
      val deadline = System.nanoTime() + 5000000000L
      var last = -1
      while (System.nanoTime() < deadline
          && (names.size() != last || last == 0)) {
        last = names.size(); Thread.sleep(200)
      }
      names.toArray.map(_.toString)
    }
    val edges = (0L until 16L).map(i => (i, i + 1)).toDF("src", "dst")
    try {
      // mode 1 — tiny-loop gate DISABLED: the pre-TinyLoop contract
      // verbatim. Every round is two checkpoint jobs (propagate with
      // the observed changed-metric, shortcut); the per-round
      // convergence count() job this test guards against would surface
      // as a "count" action, and the disabled gate itself must not add
      // one either.
      spark.conf.set(graft.operators.TinyLoop.ThresholdConf, "0")
      graft.operators.ConnectedComponents.components(edges)
      val counted = quiesce()
      assert(counted.count(_ == "localCheckpoint") >= 3, counted.toSeq)
      assert(!counted.contains("count"),
        s"convergence must not run a count job per round: ${counted.toSeq}")

      // mode 2 — gate ENABLED (default): rounds execute through the
      // compact clone session, so THIS session sees only the two
      // ungated initial pins plus exactly ONE gate count for the whole
      // call — anything more would mean a per-round probe leaked back
      names.clear()
      spark.conf.unset(graft.operators.TinyLoop.ThresholdConf)
      graft.operators.ConnectedComponents.components(edges)
      val gated = quiesce()
      assert(gated.count(_ == "count") == 1,
        s"gate measures ONCE per call, never per round: ${gated.toSeq}")
      assert(gated.count(_ == "localCheckpoint") == 2,
        s"round pins must ride the compact session: ${gated.toSeq}")
    } finally {
      spark.conf.unset(graft.operators.TinyLoop.ThresholdConf)
      spark.listenerManager.unregister(listener)
    }
  }

  test("connected components fail loudly when iteration budget is too small") {
    import spark.implicits._
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.components(edges, maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("banded Hamming join on 100k signatures: exactly the planted pairs") {
    // the join every content-identity path rides (audio hot-band, image
    // pHash, video temporal, image/video dHash): 100k LCG signatures +
    // 500 planted <=3-bit edits. Pigeonhole guarantees recall <=7; this
    // probes the other side at scale — no false pairs from random
    // 64-bit hashes, and no quadratic blowup.
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val base = (0L until 100000L).map(i => (i, mix(i)))
    val planted = (0L until 500L).map { i =>
      val src = i * 199L // spread over the corpus
      val flips = 1 + (mix(src ^ 0xBEEFL) & 3L).toInt % 3
      var sig = mix(src)
      for (k <- 0 until flips)
        sig ^= 1L << ((mix(src * 31 + k) & 63L).toInt)
      (1000000L + src, sig)
    }
    val sigs = (base ++ planted).toDF("doc_id", "sim_sig")
    val t0 = System.nanoTime()
    val pairs = Dedup.hamming64Pairs(sigs, maxHamming = 7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"hamming join on 100.5k sigs: $secs%.2f s, ${pairs.size} pairs")
    val expected = (0L until 500L)
      .map(i => (i * 199L, 1000000L + i * 199L)).toSet
    assert(pairs == expected,
      s"missing ${(expected -- pairs).take(3)}, extra ${(pairs -- expected).take(3)}")

    // the adaptive banding: a hamming-0 exact-twin screen over the same
    // corpus runs as ONE 64-bit equality band — candidate pairs collapse
    // from ~n²/2^8 per band to hash-collisions only, and it must be far
    // faster than the 8-band <=7 search above
    val exact = (base ++ base.take(500).map { case (i, s) =>
      (2000000L + i, s)
    }).toDF("doc_id", "sim_sig")
    val t1 = System.nanoTime()
    val p0 = Dedup.hamming64Pairs(exact, maxHamming = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val secs0 = (System.nanoTime() - t1) / 1e9
    println(f"hamming-0 join on 100.5k sigs: $secs0%.2f s")
    assert(p0 == (0L until 500L).map(i => (i, 2000000L + i)).toSet)
    assert(secs0 < secs / 2,
      f"adaptive banding should beat the 8-band search: $secs0%.2f vs $secs%.2f")
  }

  test("AQE splits a skewed join partition at runtime") {
    // the runtime half of the skew story (Skew.saltedAgg/topKPerGroup are
    // the plan-level half): one hot key dominating a sort-merge join must
    // be split by AQE's skew-join rule, visible as skew=true in the final
    // plan. Thresholds lowered so the 60k-row hot partition qualifies.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // many input partitions matter: AQE splits a skewed REDUCE
      // partition along mapper boundaries, so a single-mapper local
      // relation is indivisible and the rule never fires
      val fact = spark.range(0, 200000, 1, 32)
        .select(when(col("id") % 5 =!= 4, 1L).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id"), lit("_"), lit("x" * 100))
            .as("v"))
      val dim = spark.range(0, 20000, 1, 8)
        .select(col("id").as("k"), (col("id") * 3).as("w"))
      // project narrow so the collect below is cheap; the SKEW lives in
      // the shuffle, which carries the wide payload either way
      val joined = fact.join(dim, Seq("k")).select(col("k"))
      // count() would build its OWN QueryExecution and leave `joined`'s
      // adaptive plan unexecuted — materialize the exact plan under test
      // hot key 1: the 160000 redirected rows (i=1 is among them);
      // non-hot: i in [0, 20000) with i%5 == 4 = 4000 matches
      assert(joined.collect().length == 164000)
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("skew=true"),
        "expected AQE to mark the hot partition skew=true:\n" +
          p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("COMPOSED curation pipeline decomposes exactly and ~linearly at 10x") {
    // The one 100 TB claim the per-operator probes above cannot carry:
    // the FULL pipeline (url-dedup → repetition → near-dup → decontam →
    // screens) composed with mixtureResample + packShards, on a
    // 10×-replicated sf0.1 corpus. Copies are made pairwise disjoint in
    // shingles/urls/sources (every non-marker token prefixed; the five
    // "en" marker words stay so langId/quality verdicts still fire), so
    // every stage verdict is decided WITHIN a copy and the big run must
    // decompose exactly: per-stage funnel(big) = Σ_c funnel(copy_c), the
    // big run's copy-0 row slice ≡ the standalone copy-0 run, packShards
    // assignments restricted to copy-0 sources ≡ the standalone pack,
    // and mixture factors are scale-invariant. Cross-copy banding
    // collisions may create candidates — exact-Jaccard verification
    // (jaccard 0 across copies) must erase them, which the equality pins.
    import spark.implicits._
    import graft.operators.{Curation, TextAnalysis}
    val markers = Seq("the", "a", "of", "and", "to")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "source")
    def copyDf(c: Int) = base.select(
      (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        w => when(w.isin(markers: _*), w)
          .otherwise(concat(lit(s"c$c"), w)))).as("text"),
      concat(lit(s"c${c}_"), col("source")).as("source"),
      // ~10% planted url-duplicates: doc 10k+1 shares doc 10k's page
      // under a different spelling; hosts carry the copy tag so url
      // dedup can never collapse across copies
      concat(lit(s"HTTP://Host$c.Example.COM/page/"),
        when(col("doc_id") % 10 === 1, col("doc_id") - 1)
          .otherwise(col("doc_id")),
        when(col("doc_id") % 10 === 1, lit("?utm_source=x"))
          .otherwise(lit(""))).as("url"))
    val copies = (0 until 10).map(c => copyDf(c).localCheckpoint())
    val big = copies.reduce(_ unionByName _).localCheckpoint()
    // probe suite: one slice per copy (its own prefixed text), so each
    // copy decontaminates against its own probes only
    val probes = copies.map(
      _.filter(col("doc_id") % 97 === 3)
        .select((col("doc_id") + 90000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint()
    val cfg = Curation.Config(urlDedup = Some("url"))
    def run(docs: org.apache.spark.sql.DataFrame)
        : (Seq[Long], Array[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val r = Curation.pipeline(docs, "doc_id", "text", cfg, Some(probes))
      val rows = r.df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      (r.stageRows.map(_._2) :+ rows.length.toLong, rows, secs)
    }
    run(copies.head) // warm
    val singles = copies.map(run)
    val (bigFunnel, bigRows, tBig) = run(big)
    // 1. per-stage funnel decomposes EXACTLY
    val summed = singles.map(_._1).transpose.map(_.sum)
    assert(bigFunnel == summed,
      s"funnel did not decompose: big=$bigFunnel sum-of-copies=$summed")
    // every stage fired and survivors remain
    assert(bigFunnel.last > 0, "no survivors — the probe lost its teeth")
    // the 4 observed stages strictly shrink (every planted screen fired);
    // the appended final count equals the last observation by definition
    val stages = bigFunnel.init
    assert(stages == stages.sorted.reverse && stages.distinct == stages,
      s"each planted screen should strictly shrink the corpus: $bigFunnel")
    assert(bigFunnel.last == stages.last)
    // 2. the big run's copy-0 slice is ROW-IDENTICAL to the solo run
    val slice0 = bigRows.filter(_.getLong(0) < 1000000L).map(_.toString).toSet
    assert(slice0 == singles.head._2.map(_.toString).toSet,
      "copy-0 rows differ between the solo run and the 10x run")
    // 3. packShards on the curated output decomposes per source
    val withSrc = (rows: Array[org.apache.spark.sql.Row],
        src: org.apache.spark.sql.DataFrame) =>
      rows.map(r => (r.getLong(0), r.getString(4))).toSeq
        .toDF("doc_id", "clean_text")
        .join(src.select("doc_id", "source"), Seq("doc_id"))
    def packKey(df: org.apache.spark.sql.DataFrame): Set[String] =
      TextAnalysis.packShards(df, "doc_id", "clean_text", "source",
        budgetTokens = 2000L).collect().map(_.toString).toSet
    val packBig = packKey(withSrc(bigRows, big))
    val packSolo = packKey(withSrc(singles.head._2, copies.head))
    assert(packBig.filter(_.contains("c0_")) == packSolo,
      "copy-0 shard assignment differs between the solo and 10x pack")
    // 4. mixture factors are scale-invariant (same factor per source at
    // 1x and 10x when the share map scales with the corpus)
    def factors(docs: org.apache.spark.sql.DataFrame): Map[String, Double] = {
      val srcs = docs.select("source").distinct().as[String].collect()
      TextAnalysis.mixtureResample(docs, "doc_id", "text", "source",
          srcs.map(_ -> 1.0 / srcs.length).toMap, totalMultiple = 0.5)
        .select("source", "factor").distinct()
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val fBig = factors(big)
    factors(copies.head).foreach { case (s, f) =>
      assert(math.abs(fBig(s) - f) <= math.abs(f) * 1e-9,
        s"factor for $s drifted at 10x: ${fBig(s)} vs $f")
    }
    // 5. wall-clock stays in the linear band (same conservative guard as
    // the single-operator probes; shared-box variance is real)
    val tSolo = singles.map(_._3).min
    println(f"composed pipeline solo: $tSolo%.2f s, 10x: $tBig%.2f s, " +
      f"ratio ${tBig / tSolo}%.1f")
    assert(tBig / tSolo < 30, s"super-linear blowup: $tSolo vs $tBig")
  }

  test("ivfPqTopKJoin decomposes over planted clusters and stays linear at 10x") {
    // The flagship ANN join's 100 TB claim: with the list count grown
    // with the corpus (the √n rule ivfPqIndexBuild documents), a 10×
    // corpus joined against 10× queries costs ~10×, not 100× — per-query
    // candidate work is |corpus|·probes/lists and stays constant. Ten
    // copies of the sf0.1 embeddings are planted in near-orthogonal
    // directions (copy c rides 10·e_c against 0.25·original, so
    // within-copy cosine ≳0.95 and cross-copy ≲0.1), which makes the
    // decomposition claim checkable without relying on quantizer
    // equality across differently-built indexes: every query's top-k
    // must come entirely from its own copy — any cross-copy leak means
    // the probed lists starved the query of its own cluster.
    import graft.operators.Similarity
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    def copyDf(c: Int) = base.select(
      (col("vec_id") + lit(c * 1000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x * lit(0.25f) + when(i === c, lit(10.0f)).otherwise(lit(0.0f)))
          .cast("float")).as("embedding"))
    val copies = (0 until 10).map(c => copyDf(c).localCheckpoint())
    val big = copies.reduce(_ unionByName _).localCheckpoint()
    def queriesOf(df: org.apache.spark.sql.DataFrame) =
      df.select((col("vec_id") + lit(50000000L)).as("vec_id"),
        col("embedding"))
    val K = 5
    // solo: 2k corpus, 16 lists; 10×: 20k corpus, 160 lists — same
    // corpus/lists ratio, so the candidate join carries the same rows
    // per query at both scales
    val idxSolo = Similarity.ivfPqIndexBuild(
      copies.head, "vec_id", "embedding", lists = 16)
    val idxBig = Similarity.ivfPqIndexBuild(
      big, "vec_id", "embedding", lists = 160)
    def run(idx: Similarity.IvfPqIndex,
        qs: org.apache.spark.sql.DataFrame)
        : (Array[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val rows = Similarity.ivfPqTopKJoin(
        idx, qs, "vec_id", "embedding", K).collect()
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(idxSolo, queriesOf(copies.head)) // warm
    val (soloRows, tSolo0) = run(idxSolo, queriesOf(copies.head))
    val (_, tSolo1) = run(idxSolo, queriesOf(copies.head))
    val tSolo = math.min(tSolo0, tSolo1)
    val (bigRows, tBig0) = run(idxBig, queriesOf(big))
    val (_, tBig1) = run(idxBig, queriesOf(big))
    val tBig = math.min(tBig0, tBig1)
    // every query answered with a full top-k at both scales
    val nBase = base.count()
    assert(soloRows.groupBy(_.getLong(0)).size == nBase)
    val perQuery = bigRows.groupBy(_.getLong(0))
    assert(perQuery.size == nBase * 10,
      s"only ${perQuery.size} of ${nBase * 10} queries answered")
    assert(perQuery.values.forall(_.length == K))
    // decomposition: all K neighbors live in the query's own copy
    val leaks = bigRows.filter { r =>
      (r.getLong(0) - 50000000L) / 1000000L != r.getLong(1) / 1000000L
    }
    assert(leaks.isEmpty,
      s"${leaks.length} cross-copy neighbors leaked, e.g. " +
        leaks.take(3).mkString(", "))
    // wall-clock stays in the linear band (same conservative guard as
    // the other probes; shared-box variance is real, quadratic is ~100×)
    println(f"ivfPqTopKJoin solo: $tSolo%.2f s, 10x: $tBig%.2f s, " +
      f"ratio ${tBig / tSolo}%.1f")
    assert(tBig / tSolo < 30, s"super-linear blowup: $tSolo vs $tBig")
  }

  test("sq8TopK stays linear at 10x corpus and decomposes over clusters") {
    // The SQ8 scan's 100 TB claim is the simplest of the family: cost is
    // |corpus|·|queries| byte-code reconstructions with no index
    // structure, so a 10× corpus against a FIXED query set must cost
    // ~10× — and the 256-level reconstruction preserves the planted
    // separation (within-copy cosine ≳0.95, cross-copy ≲0.1), so every
    // query's top-k stays inside its own copy at both scales.
    import graft.operators.Similarity
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    def copyDf(c: Int) = base.select(
      (col("vec_id") + lit(c * 1000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x * lit(0.25f) + when(i === c, lit(10.0f)).otherwise(lit(0.0f)))
          .cast("float")).as("embedding"))
    val copies = (0 until 10).map(c => copyDf(c).localCheckpoint())
    val big = copies.reduce(_ unionByName _).localCheckpoint()
    val K = 5
    val qs = Similarity.normed(copies.head, "vec_id", "embedding")
      .filter(col("vec_id") % 61 === 0).localCheckpoint()
    val nQs = qs.count()
    def run(corpus: org.apache.spark.sql.DataFrame)
        : (Array[org.apache.spark.sql.Row], Double) = {
      val n = Similarity.normed(corpus, "vec_id", "embedding")
      val t0 = System.nanoTime()
      val rows = Similarity.sq8TopK(qs, n, K).collect()
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(copies.head) // warm
    val (soloRows, tSolo0) = run(copies.head)
    val (_, tSolo1) = run(copies.head)
    val tSolo = math.min(tSolo0, tSolo1)
    val (bigRows, tBig0) = run(big)
    val (_, tBig1) = run(big)
    val tBig = math.min(tBig0, tBig1)
    assert(soloRows.groupBy(_.getLong(0)).size == nQs)
    val perQuery = bigRows.groupBy(_.getLong(0))
    assert(perQuery.size == nQs && perQuery.values.forall(_.length == K))
    // decomposition: copy-0 queries keep copy-0 neighbors at 10×
    val leaks = bigRows.filter(_.getLong(1) / 1000000L != 0L)
    assert(leaks.isEmpty,
      s"${leaks.length} cross-copy neighbors leaked, e.g. " +
        leaks.take(3).mkString(", "))
    println(f"sq8TopK solo: $tSolo%.2f s, 10x corpus: $tBig%.2f s, " +
      f"ratio ${tBig / tSolo}%.1f")
    assert(tBig / tSolo < 30, s"super-linear blowup: $tSolo vs $tBig")
  }

  test("bruteForceTopK stays linear at 10x corpus; salting never changes rows") {
    // the exact path's salted two-level rank: cost is |corpus|·|queries|
    // cosines, so 10× corpus against a FIXED query set must cost ~10× —
    // and the rank must be EXACTLY the single-window answer (salts=1
    // degenerates to it), at any salt count.
    import graft.operators.Similarity
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    def copyDf(c: Int) = base.select(
      (col("vec_id") + lit(c * 1000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x * lit(0.25f) + when(i === c, lit(10.0f)).otherwise(lit(0.0f)))
          .cast("float")).as("embedding"))
    val copies = (0 until 10).map(c => copyDf(c).localCheckpoint())
    val big = copies.reduce(_ unionByName _).localCheckpoint()
    val K = 5
    val qs = Similarity.normed(copies.head, "vec_id", "embedding")
      .filter(col("vec_id") % 61 === 0).localCheckpoint()
    val nQs = qs.count()
    def run(corpus: org.apache.spark.sql.DataFrame)
        : (Array[org.apache.spark.sql.Row], Double) = {
      val n = Similarity.normed(corpus, "vec_id", "embedding")
      val t0 = System.nanoTime()
      val rows = Similarity.bruteForceTopK(qs, n, K).collect()
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(copies.head) // warm
    val (soloRows, tSolo0) = run(copies.head)
    val (_, tSolo1) = run(copies.head)
    val tSolo = math.min(tSolo0, tSolo1)
    val (bigRows, tBig0) = run(big)
    val (_, tBig1) = run(big)
    val tBig = math.min(tBig0, tBig1)
    assert(soloRows.groupBy(_.getLong(0)).size == nQs)
    val perQuery = bigRows.groupBy(_.getLong(0))
    assert(perQuery.size == nQs && perQuery.values.forall(_.length == K))
    // exactness: the salted two-level rank IS the single-window rank
    val n1 = Similarity.normed(copies.head, "vec_id", "embedding")
    val single = Similarity.bruteForceTopK(qs, n1, K, salts = 1)
      .collect().map(_.toString).sorted.toSeq
    assert(soloRows.map(_.toString).sorted.toSeq == single,
      "salts=64 diverged from the single-window rank")
    println(f"bruteForceTopK solo: $tSolo%.2f s, 10x corpus: $tBig%.2f s, " +
      f"ratio ${tBig / tSolo}%.1f")
    assert(tBig / tSolo < 30, s"super-linear blowup: $tSolo vs $tBig")
  }

  test("wetSave + graft-warc scan scale ~linearly 5k -> 50k records") {
    // the crawl family's quadratic/driver-creep guard: archive write
    // (member-per-record gzip, one file per partition, cdx sidecar in
    // the same pass) and the scan read-back must both grow with the
    // corpus, not with corpus² or with per-record driver RPCs
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(
        concat(lit("https://probe.example/p/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:probe:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        col("text"))
    val big = (0 until 10).map(i =>
      docs.select(
        concat(lit(s"https://probe.example/c$i/"),
          col("target_uri")).as("target_uri"),
        col("warc_date"),
        concat(lit(s"<urn:c$i:"), col("record_id"), lit(">"))
          .as("record_id"),
        col("text"))).reduce(_ unionByName _)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def roundTrip(df: org.apache.spark.sql.DataFrame,
        parts: Int): (Double, Double) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_probe_wet").toString
      val (n, tw) = timed(graft.sources.WarcIO.wetSave(
        df.repartition(parts), dir))
      val (m, tr) = timed(spark.read.format("graft-warc").load(dir)
        .filter(col("warc_type") === "conversion").count())
      assert(n == m, s"round trip lost records: wrote $n, read $m")
      (tw, tr)
    }
    roundTrip(docs.limit(500), 2) // warm
    def best(parts: Int,
        df: => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val (w1, r1) = roundTrip(df, parts)
      val (w2, r2) = roundTrip(df, parts)
      (math.min(w1, w2), math.min(r1, r2))
    }
    // 10x the records AND 10x the files — the shape a 10x crawl lands
    val (w1, r1) = best(4, docs)
    val (w10, r10) = best(40, big)
    println(f"wetSave 5k: $w1%.2f s, 50k: $w10%.2f s, " +
      f"ratio ${w10 / w1}%.1f; scan 5k: $r1%.2f s, 50k: $r10%.2f s, " +
      f"ratio ${r10 / r1}%.1f")
    assert(w10 / w1 < 30, s"super-linear write blowup: $w1 vs $w10")
    assert(r10 / r1 < 30, s"super-linear read blowup: $r1 vs $r10")
  }

  test("warcDedupSave + expandRevisits scale ~linearly on duplicate-heavy data") {
    // dedup's hot case: few distinct payloads, huge capture classes.
    // 10x the corpus keeps the SAME 200 payload classes, so canonical
    // groups grow 10x — the min(struct) group-by must stay linear (a
    // window formulation would sort each class in one task) and the
    // expandRevisits join must stay skew-free (unique canonical ids on
    // the build side).
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(
        concat(lit("https://probe.example/d/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:dprobe:"),
          lpad(col("doc_id").cast("string"), 8, "0"),
          lit(">")).as("record_id"),
        lit("text/plain").as("http_content_type"),
        encode(concat(lit("payload #"),
          (col("doc_id") % 200).cast("string")), "UTF-8").as("payload"))
    val big = (0 until 10).map(i =>
      docs.select(
        concat(lit(s"https://probe.example/c$i/"),
          col("target_uri")).as("target_uri"),
        col("warc_date"),
        concat(lit(s"<urn:c$i:"), col("record_id"), lit(">"))
          .as("record_id"),
        col("http_content_type"),
        col("payload"))).reduce(_ unionByName _)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def roundTrip(df: org.apache.spark.sql.DataFrame,
        parts: Int): (Double, Double) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_probe_dedup").toString
      val (n, tw) = timed(graft.sources.WarcIO.warcDedupSave(
        df.repartition(parts), dir))
      val (m, tr) = timed {
        val raw = spark.read.format("graft-warc").load(dir)
          .filter(col("warc_type").isin("response", "revisit"))
        graft.sources.WarcIO.expandRevisits(raw)
          .filter(col("payload").isNotNull).count()
      }
      assert(n == m, s"dedup round trip lost captures: wrote $n, read $m")
      (tw, tr)
    }
    roundTrip(docs.limit(500), 2) // warm
    def best(parts: Int,
        df: => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val (w1, r1) = roundTrip(df, parts)
      val (w2, r2) = roundTrip(df, parts)
      (math.min(w1, w2), math.min(r1, r2))
    }
    val (w1, r1) = best(4, docs)
    val (w10, r10) = best(40, big)
    println(f"warcDedupSave 5k: $w1%.2f s, 50k: $w10%.2f s, " +
      f"ratio ${w10 / w1}%.1f; expand 5k: $r1%.2f s, 50k: $r10%.2f s, " +
      f"ratio ${r10 / r1}%.1f")
    assert(w10 / w1 < 30, s"super-linear dedup-write blowup: $w1 vs $w10")
    assert(r10 / r1 < 30, s"super-linear expand blowup: $r1 vs $r10")
  }

  test("crawl loop (outlinks → frontier → gate → fetch plan) ~linear at 10x, hot host") {
    import spark.implicits._
    import graft.operators.{Outlinks, Robots}
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // one page per doc; HALF its links target ONE hot host — the skew
    // a link farm / CDN produces — the rest spread over 100 site hosts
    // and 50 external hosts. `prefix` keeps the 10 copies' URL spaces
    // disjoint so the 10x corpus has 10x the distinct frontier.
    def pages(prefix: String) = docs.select(
      concat(lit("https://s"), (col("doc_id") % 100).cast("string"),
        lit(s".example/$prefix/"), col("doc_id").cast("string"))
        .as("target_uri"),
      concat(
        lit(s"""<html><body><a href="https://hot.example/$prefix/"""),
        col("doc_id").cast("string"), lit("/0\">h</a>"),
        lit(s"""<a href="https://hot.example/$prefix/"""),
        col("doc_id").cast("string"), lit("/1\">h</a>"),
        lit("""<a href="/l/"""), (col("doc_id") % 7).cast("string"),
        lit("\">r</a>"),
        lit("""<a href="https://x"""), (col("doc_id") % 50).cast("string"),
        lit(s".example/$prefix/"), col("doc_id").cast("string"),
        lit("\">x</a></body></html>")).as("text"))
    val p1 = pages("a")
    val p10 = (0 until 10).map(i => pages(s"c$i")).reduce(_ unionByName _)
    val policies = (Seq(
      ("hot.example", "User-agent: *\nDisallow: /private\nCrawl-delay: 2")) ++
      (0 until 100).map(i =>
        (s"s$i.example", "User-agent: *\nDisallow: /l/5")))
      .toDF("host", "robots")
    val seen = docs.filter(col("doc_id") % 2 === 0)
      .select(concat(lit("https://x"), (col("doc_id") % 50).cast("string"),
        lit(".example/a/"), col("doc_id").cast("string")).as("url"))
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def loop(p: org.apache.spark.sql.DataFrame): Long = {
      val links = Outlinks.extractOutlinks(p, "text", "target_uri")
      val gated = Robots.gateByPolicy(
        Outlinks.crawlFrontier(links, "outlink", seen, "url"),
        "frontier_url", policies, "host", "robots", "probebot")
      Outlinks.fetchPlan(gated, "frontier_url", policies,
        "host", "robots", "probebot", defaultDelay = 1.0).count()
    }
    loop(p1.limit(500)) // warm
    def best(p: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val (n1, t1) = timed(loop(p)); val (_, t2) = timed(loop(p))
      (n1, math.min(t1, t2))
    }
    val (n1, t1) = best(p1)
    val (n10, t10) = best(p10)
    println(f"crawl loop 5k: $t1%.2f s ($n1 rows), 50k: $t10%.2f s " +
      f"($n10 rows), ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear crawl-loop blowup: $t1 vs $t10")
    // the 10x corpus plans ~10x the frontier (disjoint URL spaces,
    // minus the shared per-site /l/ pool)
    assert(n10 > n1 * 8, s"10x corpus must plan ~10x URLs: $n1 vs $n10")
    // hot-host correctness under skew: every hot URL allowed, sequenced
    // 1..count with the declared 2 s delay honored at the top offset
    val plan = Outlinks.fetchPlan(
      Robots.gateByPolicy(
        Outlinks.crawlFrontier(
          Outlinks.extractOutlinks(p1, "text", "target_uri"),
          "outlink", seen, "url"),
        "frontier_url", policies, "host", "robots", "probebot"),
      "frontier_url", policies, "host", "robots", "probebot")
    val hot = plan.filter(col("url_host") === "hot.example")
      .agg(count(lit(1)), max(col("fetch_seq")), max(col("fetch_offset")),
        min(col("crawl_delay"))).head()
    assert(hot.getLong(0) == hot.getLong(1),
      s"hot host must sequence 1..n: ${hot.getLong(0)} vs ${hot.getLong(1)}")
    assert(hot.getDouble(2) == (hot.getLong(0) - 1) * 2.0
      && hot.getDouble(3) == 2.0,
      s"hot host must honor its 2 s crawl-delay: $hot")
    // the /l/5 pool is disallowed by every site host's policy
    assert(plan.filter(col("frontier_url").endsWith("/l/5")).count() == 0,
      "gate must drop the disallowed /l/5 pool")
  }

  test("containTraps ~linear at 10x frontier with one exploding template") {
    import spark.implicits._
    import graft.operators.Outlinks
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // one host explodes a calendar template (one URL per doc — the
    // hot (host, template) group), 50 clean hosts publish bounded
    // sections. `prefix` keeps the 10 copies' URL spaces disjoint —
    // LETTER-only prefixes, because a digit in the prefix would
    // template-collapse the copies back together (c0/c1/… → c#).
    def frontier(prefix: String) = docs.select(
      concat(lit("https://trap.example/"), lit(prefix), lit("/d/"),
        col("doc_id").cast("string")).as("frontier_url"))
      .union(docs.select(
        concat(lit("https://w"), (col("doc_id") % 50).cast("string"),
          lit(s".example/$prefix/sec/"),
          (col("doc_id") % 30).cast("string")).as("frontier_url")))
      .distinct()
    val f1 = frontier("qa")
    val f10 = (0 until 10).map(i => frontier("p" + ('a' + i).toChar))
      .reduce(_ unionByName _)
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def run(p: org.apache.spark.sql.DataFrame): Long =
      Outlinks.containTraps(p, "frontier_url", maxPerTemplate = 100)
        .count()
    run(f1.limit(500)) // warm
    def best(p: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val (n1, t1) = timed(run(p)); val (_, t2) = timed(run(p))
      (n1, math.min(t1, t2))
    }
    val (n1, t1) = best(f1)
    val (n10, t10) = best(f10)
    println(f"containTraps 1x: $t1%.2f s ($n1 rows), 10x: $t10%.2f s " +
      f"($n10 rows), ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear containTraps blowup: $t1 vs $t10")
    // per copy: the trap template caps at 100; the clean side holds
    // lcm(50, 30) = 150 distinct (host, section) pairs, all passing
    assert(n1 == 100 + 150, s"1x containment drifted: $n1")
    assert(n10 == 10 * n1, s"10x must contain per disjoint copy: $n10")
  }

  test("revisitSchedule ~linear at 10x history, hot-URL skew included") {
    import spark.implicits._
    import graft.operators.Revisit
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // per URL 4 fetches, plus ONE hot URL carrying half the history
    // rows (a health-check endpoint fetched constantly) — the skew a
    // naive per-URL window would choke on
    def history(prefix: String) = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("i"))
      .select(
        concat(lit(s"https://rv.example/$prefix/"),
          col("doc_id").cast("string")).as("url"),
        (lit(1.7e9) + col("doc_id") * 10 + col("i")).as("ft"),
        (col("i") < col("doc_id") % 3).as("chg"))
      .union(docs
        .select(lit(s"https://rv.example/$prefix-hot").as("url"),
          (lit(1.8e9) + col("doc_id")).as("ft"),
          lit(false).as("chg")))
    val h1 = history("qa")
    val h10 = (0 until 10).map(i => history("p" + ('a' + i).toChar))
      .reduce(_ unionByName _)
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def run(h: org.apache.spark.sql.DataFrame): Long =
      Revisit.revisitSchedule(h, "url", "ft", "chg").count()
    run(h1.limit(500)) // warm
    def best(h: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val (n1, t1) = timed(run(h)); val (_, t2) = timed(run(h))
      (n1, math.min(t1, t2))
    }
    val (n1, t1) = best(h1)
    val (n10, t10) = best(h10)
    println(f"revisit 1x: $t1%.2f s ($n1 rows), 10x: $t10%.2f s " +
      f"($n10 rows), ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear revisit blowup: $t1 vs $t10")
    assert(n10 == 10 * n1, s"disjoint copies must schedule per copy")
    // hot-URL correctness under skew: never changed → streak = count
    val hot = Revisit.revisitSchedule(h1, "url", "ft", "chg")
      .filter(col("url") === "https://rv.example/qa-hot").head()
    assert(hot.getLong(2) == docs.count(),
      s"hot URL streak must count its whole history: ${hot.getLong(2)}")
  }

  test("COMPOSED scheduling tier (traps → budgets → ranked plan) ~linear at 10x") {
    import spark.implicits._
    import graft.operators.Outlinks
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def frontier(prefix: String) = docs.select(
      concat(lit("https://trap.example/"), lit(prefix), lit("/d/"),
        col("doc_id").cast("string")).as("frontier_url"))
      .union(docs.select(
        concat(lit("https://w"), (col("doc_id") % 50).cast("string"),
          lit(s".example/$prefix/sec/"),
          (col("doc_id") % 30).cast("string")).as("frontier_url")))
      .distinct()
    def priorities(f: org.apache.spark.sql.DataFrame) =
      f.select(col("frontier_url").as("node"),
        pmod(xxhash64(col("frontier_url")), lit(1000L))
          .cast("double").as("rank"))
    val budgets = Seq(("trap.example", 40L)).toDF("url_host", "budget")
    def run(f: org.apache.spark.sql.DataFrame): Long =
      Outlinks.fetchPlan(
        Outlinks.containTraps(f, "frontier_url", maxPerTemplate = 100),
        "frontier_url",
        Seq.empty[(String, String)].toDF("host", "robots"),
        "host", "robots", "probebot", maxPerHost = 50,
        priorities = Some(priorities(f)), hostBudgets = Some(budgets))
        .count()
    val f1 = frontier("qa")
    val f10 = (0 until 10).map(i => frontier("p" + ('a' + i).toChar))
      .reduce(_ unionByName _)
    def timed(g: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = g
      (n, (System.nanoTime() - t0) / 1e9)
    }
    run(f1.limit(500)) // warm
    def best(f: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val (n1, t1) = timed(run(f)); val (_, t2) = timed(run(f))
      (n1, math.min(t1, t2))
    }
    val (n1, t1) = best(f1)
    val (n10, t10) = best(f10)
    println(f"sched tier 1x: $t1%.2f s ($n1 rows), 10x: $t10%.2f s " +
      f"($n10 rows), ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear scheduling blowup: $t1 vs $t10")
    // 1x: trap template capped 100 → host budget 40; 50 clean hosts
    // × 3 sections pass whole. 10x: trap.example is ONE host across
    // the copies, so its 40-URL budget does NOT scale — only the
    // clean tail does.
    assert(n1 == 40 + 150, s"1x schedule drifted: $n1")
    assert(n10 == 40 + 10 * 150, s"10x schedule drifted: $n10")
    // rank-order correctness under the composition: the 40 kept trap
    // URLs are EXACTLY the top-40 of the contained set by
    // (priority desc, url) — the naive window recomputation
    val contained = Outlinks.containTraps(f1, "frontier_url",
      maxPerTemplate = 100)
    val plan = Outlinks.fetchPlan(contained, "frontier_url",
      Seq.empty[(String, String)].toDF("host", "robots"),
      "host", "robots", "probebot", maxPerHost = 50,
      priorities = Some(priorities(f1)), hostBudgets = Some(budgets))
    val gotTrap = plan
      .filter(col("url_host") === "trap.example")
      .select("frontier_url").as[String].collect().toSet
    val wantTrap = contained
      .filter(col("frontier_url").startsWith("https://trap."))
      .join(priorities(contained), col("frontier_url") === col("node"))
      .orderBy(col("rank").desc, col("frontier_url"))
      .limit(40).select("frontier_url").as[String].collect().toSet
    assert(gotTrap == wantTrap,
      "budgeted plan must keep the top-priority trap URLs")
  }

  test("pageRank scales ~linearly at 10x edges") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // 10x corpus = 10 disjoint copies of the residue graph: node and
    // edge counts both scale 10x, per-iteration join/agg must follow
    def edges(prefix: String) = docs.select(
      concat(lit(prefix), (col("doc_id") % 997).cast("string")).as("src"),
      concat(lit(prefix), ((col("doc_id") * 31 + 7) % 997).cast("string"))
        .as("dst"))
      .union(docs.select(
        concat(lit(prefix), (col("doc_id") % 997).cast("string")).as("src"),
        concat(lit(prefix), (col("doc_id") % 463).cast("string")).as("dst")))
      .distinct()
    val e1 = edges("g")
    val e10 = (0 until 10).map(i => edges(s"g$i")).reduce(_ unionByName _)
    def time(e: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.operators.LinkGraph.pageRank(e, "src", "dst", 3).count()
      (System.nanoTime() - t0) / 1e9
    }
    time(e1.limit(200)) // warm
    def best(e: => org.apache.spark.sql.DataFrame): Double =
      math.min(time(e), time(e))
    val t1 = best(e1)
    val t10 = best(e10)
    println(f"pageRank 1x: $t1%.2f s, 10x: $t10%.2f s, ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear pagerank blowup: $t1 vs $t10")
  }

  test("hits scales ~linearly at 10x edges") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def edges(prefix: String) = docs.select(
      concat(lit(prefix), (col("doc_id") % 997).cast("string")).as("src"),
      concat(lit(prefix), ((col("doc_id") * 13 + 5) % 997).cast("string"))
        .as("dst"))
      .union(docs.select(
        concat(lit(prefix), (col("doc_id") % 997).cast("string")).as("src"),
        concat(lit(prefix), (col("doc_id") % 389).cast("string")).as("dst")))
      .distinct()
    def time(e: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.operators.LinkGraph.hits(e, "src", "dst", 3).count()
      (System.nanoTime() - t0) / 1e9
    }
    time(edges("h").limit(200)) // warm
    def best(e: => org.apache.spark.sql.DataFrame): Double =
      math.min(time(e), time(e))
    val t1 = best(edges("h"))
    val t10 = best((0 until 10).map(i => edges(s"h$i"))
      .reduce(_ unionByName _))
    println(f"hits 1x: $t1%.2f s, 10x: $t10%.2f s, ratio ${t10 / t1}%.1f")
    assert(t10 / t1 < 30, s"super-linear hits blowup: $t1 vs $t10")
  }

  test("resolveRedirectChains equals a plain-Scala walk on random graphs") {
    import spark.implicits._
    import graft.operators.Outlinks
    val rnd = new scala.util.Random(9017L)
    for (trial <- 0 until 8) {
      val n = 20 + rnd.nextInt(40)
      // random functional-ish graph over n nodes: ~70% of nodes
      // redirect somewhere (possibly to themselves or into cycles);
      // a few nodes carry DUPLICATE captures to exercise min-dedupe
      val edges = (0 until n).flatMap { i =>
        val base = if (rnd.nextDouble() < 0.7)
          Seq((s"u$i", s"u${rnd.nextInt(n)}")) else Seq.empty
        val dup = if (rnd.nextDouble() < 0.15)
          Seq((s"u$i", s"u${rnd.nextInt(n)}")) else Seq.empty
        base ++ dup
      }
      if (edges.nonEmpty) {
        // reference: min-target map, then walk with a visited set
        val m = edges.groupBy(_._1).map { case (f, ts) =>
          f -> ts.map(_._2).min
        }
        def walk(s: String): (Option[String], Boolean) = {
          var cur = s
          val seen = scala.collection.mutable.Set[String]()
          while (m.contains(cur)) {
            if (!seen.add(cur)) return (None, true)
            cur = m(cur)
          }
          (Some(cur), false)
        }
        val want = m.keys.map { f =>
          val (t, c) = walk(m(f))
          (f, t, c)
        }.toSet
        val got = Outlinks.resolveRedirectChains(
          edges.toDF("redirect_from", "redirect_to"))
          .collect().map(r => (r.getString(0), Option(r.getString(1)),
            r.getBoolean(2))).toSet
        assert(got == want, s"trial $trial diverged:\n got=$got\nwant=$want")
      }
    }
  }

  test("canonicalMapping equals the chained applyCanonical recipe on random graphs") {
    // the ONE-mapping contract (canonicalMapping's defining property,
    // pinned case-by-case in OutlinksSpec) holds over arbitrary
    // redirect graphs + declaration maps: applying the merged mapping
    // once ≡ applyCanonical through raw chains, then declarations —
    // including cycles, redirect sources that also declare,
    // self-declarations, dup keys, and URLs neither signal knows
    import spark.implicits._
    import graft.operators.Outlinks
    val rnd = new scala.util.Random(40417L)
    for (trial <- 0 until 6) {
      val n = 15 + rnd.nextInt(25)
      val redirects = (0 until n).flatMap { i =>
        if (rnd.nextDouble() < 0.5)
          Seq((s"u$i", s"u${rnd.nextInt(n)}")) else Seq.empty
      }
      val canon = (0 until n).flatMap { i =>
        val base = if (rnd.nextDouble() < 0.4)
          // ~1 in 8 declarations are self-identities
          Seq((s"u$i", if (rnd.nextDouble() < 0.125) s"u$i"
            else s"u${rnd.nextInt(n)}")) else Seq.empty
        val dup = if (rnd.nextDouble() < 0.1)
          Seq((s"u$i", s"u${rnd.nextInt(n)}")) else Seq.empty
        base ++ dup
      }
      if (redirects.nonEmpty && canon.nonEmpty) {
        val chains = Outlinks.resolveRedirectChains(
          redirects.toDF("redirect_from", "redirect_to"))
        val canonDf = canon.toDF("page_uri", "canonical_uri")
        val mapping = Outlinks.canonicalMapping(chains, canonDf)
        val urls = ((0 until n).map(i => s"u$i") ++
          Seq("unknown_a", "unknown_b")).toDF("url")
        val once = Outlinks.applyCanonical(urls, "url",
            mapping, "alias_url", "canonical_url")
          .as[String].collect().sorted.toSeq
        val chained = Outlinks.applyCanonical(
            Outlinks.applyCanonical(urls, "url",
              chains, "redirect_from", "final_target"),
            "url", canonDf, "page_uri", "canonical_uri")
          .as[String].collect().sorted.toSeq
        assert(once == chained,
          s"trial $trial diverged:\n once=$once\n chained=$chained")
      }
    }
  }

  test("bandsFor picks the widest exhaustive banding") {
    assert(Dedup.bandsFor(0) == 1)
    assert(Dedup.bandsFor(1) == 2)
    assert(Dedup.bandsFor(3) == 4)
    assert(Dedup.bandsFor(7) == 8)
    assert(Dedup.bandsFor(15) == 16)
    intercept[IllegalArgumentException](Dedup.bandsFor(64))
  }
}
