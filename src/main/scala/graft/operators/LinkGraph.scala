package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analysis for crawl prioritization — the rank signal a
  * frontier scheduler orders its fetch queue by. The crawl tier emits
  * the edges ([[Outlinks.extractOutlinks]] → per-page resolved links;
  * host- or domain-level edges via [[TextAnalysis.urlHost]] /
  * `registeredDomain`); this operator turns them into a stationary
  * importance score.
  *
  * PageRank (Page et al., "The PageRank Citation Ranking", 1998) by
  * power iteration, expressed as per-iteration DataFrame joins:
  *
  *   PR_{i+1}(v) = (1-d)/N + d · Σ_{u→v} PR_i(u)/outdeg(u)
  *
  * Pinned semantics (mirrored exactly by the q_t54/q_t67 oracles):
  *  - nodes = distinct sources ∪ distinct destinations;
  *  - PR_0 = 1/N uniform;
  *  - multi-edges count once each (dedupe upstream if unwanted) and a
  *    self-loop is an ordinary edge;
  *  - dangling nodes (no out-edges) leak their mass BY DEFAULT — the
  *    classic simplification; totals then sum to < 1 when dangling
  *    nodes exist. `redistributeDangling = true` adds each round's
  *    leaked mass back uniformly (the Page et al. formulation):
  *    totals then sum to 1.0, which matters to anyone thresholding
  *    ABSOLUTE ranks; the correction costs one extra in-plan
  *    aggregation per round (a broadcast one-row frame, the same
  *    trick [[hits]]' normalization uses — no driver action) and does
  *    not change relative ordering on link-shaped graphs.
  *
  * Scale shape: the edge list is augmented with its source's out-degree
  * ONCE and pinned (`localCheckpoint` — also what each iteration's join
  * re-reads instead of re-shuffling the raw edges); each iteration is
  * one equi-join hashing on the source plus one aggregation hashing on
  * the destination — both high-cardinality keys, AQE skew-split
  * applies. Rank frames are `localCheckpoint`ed per iteration: the
  * plan would otherwise double per round and analysis time explodes
  * (the [[ConnectedComponents]] lesson); blocks are reference-tracked,
  * so nothing outlives the call. The only driver-side scalar is N.
  */
object LinkGraph {

  /** @param edges   frame holding the directed edge list
    * @param src     source-node column (any orderable type; cast to
    *                string for rank bookkeeping)
    * @param dst     destination-node column
    * @param iterations power-iteration rounds (10–20 is the usual
    *                plateau for web graphs; the oracle pins 5)
    * @param damping the d in the update (0.85 canonical)
    * @param redistributeDangling add each round's dangling-node mass
    *                back uniformly (Σ rank = 1.0; see object doc)
    * @param initial optional WARM-START vector (`initNodeCol`,
    *                `initRankCol`) — a cyclical crawler re-ranking a
    *                grown graph each cycle should not re-converge
    *                from uniform: power iteration converges from any
    *                start, and last cycle's ranks are already near
    *                the answer, so the same accuracy costs fewer
    *                rounds. PR_0(v) = the given rank where present,
    *                else 1/N (new nodes enter at the uniform prior);
    *                duplicate node rows reduce to MAX. With no
    *                iterations the start vector echoes back — so a
    *                FIXED POINT rides through unchanged (spec-pinned),
    *                and q_t81 certifies the warm-started update
    *                end to end.
    * @return `node` (string), `rank` (double) — one row per node */
  def pageRank(
      edges: DataFrame, src: String, dst: String,
      iterations: Int = 10, damping: Double = 0.85,
      redistributeDangling: Boolean = false,
      initial: Option[DataFrame] = None,
      initNodeCol: String = "node", initRankCol: String = "rank")
      : DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(damping >= 0 && damping <= 1, s"damping must be in [0,1]")
    // pin the projected edge list FIRST: nodes, contribEdges and (when
    // redistributing) dangling each materialize it, and an expensive
    // upstream — a corpus-sized host-edge extraction, a WAT parse —
    // would otherwise be recomputed per consumer ([[hits]] and
    // [[seedDistance]] already pin theirs; q_t56 profiled the edge
    // aggregate running twice before this)
    val e = edges.select(col(src).cast("string").as("src"),
      col(dst).cast("string").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0))
    // tiny-loop gate ([[TinyLoop]]): the node count is already paid
    // for; the edge count only runs once the node side is known tiny
    // (short-circuit — a large graph never pays the extra cached scan,
    // and a tiny one re-joins the pinned edge list every round anyway)
    val ss = edges.sparkSession
    val tiny = TinyLoop.isTiny(ss, n) && TinyLoop.isTiny(ss, e.count())
    // out-degree rides the edge list from the start: the per-iteration
    // join then touches ONE static build side, not two
    val contribEdges = TinyLoop.pin(e
      .join(e.groupBy("src").agg(count(lit(1)).as("__outdeg")), "src"),
      tiny)
    // dangling = never a source; pinned once — the per-round leak is
    // then one aggregation over (ranks ⋈ this small frame)
    lazy val dangling = TinyLoop.pin(nodes
      .join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti"),
      tiny)
    val reset = (1.0 - damping) / n
    var ranks = initial match {
      case None => nodes.withColumn("rank", lit(1.0 / n))
      case Some(init) =>
        val i0 = init
          .select(col(initNodeCol).cast("string").as("node"),
            col(initRankCol).cast("double").as("__r0"))
          .groupBy("node").agg(max(col("__r0")).as("__r0"))
        // ALWAYS an adaptive pin: the caller's warm-start frame is
        // unmeasured (its aggregation would otherwise run through the
        // compact single-partition session — the 'big build side'
        // violation isTiny's contract warns about). The loop's gate is
        // unaffected: rounds read only this PINNED n-row result.
        nodes.join(i0, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__r0"), lit(1.0 / n)).as("rank"))
          .localCheckpoint()
    }
    for (i <- 1 to iterations) {
      val inflow = contribEdges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__outdeg")).as("__inflow"))
      val contributed = lit(damping) *
        coalesce(col("__inflow"), lit(0.0))
      val update =
        if (!redistributeDangling) lit(reset) + contributed
        else lit(reset) + contributed +
          lit(damping / n) * coalesce(col("__leak"), lit(0.0))
      val base = nodes.join(inflow, Seq("node"), "left")
      val joined =
        if (!redistributeDangling) base
        else base.crossJoin(broadcast(
          ranks.join(dangling, "node")
            .agg(sum(col("rank")).as("__leak"))))
      val next = joined.select(col("node"), update.as("rank"))
      // checkpoint every SECOND round (and the last): truncation only
      // exists to stop the plan doubling per round, and a two-round-deep
      // plan (join+agg+join, twice) analyzes fine — half the
      // materialization jobs of the one-per-round cadence for the same
      // bounded-lineage guarantee. EXCEPT when redistributing: the leak
      // aggregate reads the previous round's ranks a SECOND time (inflow
      // join + leak broadcast), so an un-pinned round would be
      // recomputed inside the broadcast side — pin every round there.
      ranks =
        if (redistributeDangling || i % 2 == 0 || i == iterations)
          TinyLoop.pin(next, tiny)
        else next
    }
    ranks
  }

  /** BFS distance from a SEED set — the crawl-depth signal: pages few
    * hops from a curated seed list carry a quality prior (the
    * observation behind focused crawling and OPIC-style frontier
    * scoring), and a depth column lets a curation pipeline stratify
    * or cap by distance. One row per REACHED node with its minimum
    * hop count (seeds = 0); unreachable nodes are absent, and
    * expansion stops at `maxDepth` hops (web graphs are shallow from
    * good seeds — a deep tail is usually trap territory).
    *
    * Shape: classic frontier-expansion BFS (what GraphX Pregel would
    * run), one round per depth level: join the frontier to the
    * deduped edge list (hashing on src), anti-join away visited
    * nodes, `localCheckpoint` per round for plan truncation. The only
    * driver-side action is the per-round emptiness probe on an
    * already-materialized frame — bounded, like
    * [[Outlinks.resolveRedirectChains]]'s convergence probe.
    *
    * @return `node` (string), `depth` (int, 0..maxDepth) */
  def seedDistance(
      edges: DataFrame, src: String, dst: String,
      seeds: DataFrame, seedCol: String,
      maxDepth: Int = 16): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0: $maxDepth")
    // dedupe: multi-edges multiply the per-round join fan-out but
    // cannot change a BFS distance
    val e = edges.select(col(src).cast("string").as("src"),
        col(dst).cast("string").as("dst"))
      .distinct()
      .localCheckpoint()
    var visited = seeds.select(col(seedCol).cast("string").as("node"))
      .distinct()
      .withColumn("depth", lit(0))
      .localCheckpoint()
    // tiny-loop gate ([[TinyLoop]]): seed count first (already
    // materialized, cheap), edge count only when the seeds are tiny.
    // The deduped edge list bounds every later frame — a frontier is a
    // subset of distinct dst, visited a subset of nodes — so these two
    // counts cover the whole BFS. enabled() first: disabled mode pays
    // zero extra jobs.
    val ss = edges.sparkSession
    val tiny = TinyLoop.enabled(ss) &&
      TinyLoop.isTiny(ss, visited.count()) &&
      TinyLoop.isTiny(ss, e.count())
    var frontier = visited
    var d = 0
    var exhausted = frontier.isEmpty
    while (!exhausted && d < maxDepth) {
      // the emptiness probe rides the materialization as an observed
      // metric ([[TinyLoop.pinCounted]], the [[ConnectedComponents]]
      // trick) — one job per depth, not two
      val (next, nNext) = TinyLoop.pinCounted(e
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(d + 1)),
        tiny, s"graft_bfs_next_$d", count(lit(1)))
      exhausted = nNext == 0
      if (!exhausted) {
        // visited stays LAZY: it is a union of already-pinned frames
        // (the seed frame + every round's `next`), so the anti-join
        // reads cached blocks either way — materializing the union
        // again would copy O(|visited|) rows per depth for nothing,
        // at any scale
        visited = visited.union(next)
        frontier = next
      }
      d += 1
    }
    visited
  }

  /** HITS (Kleinberg, "Authoritative Sources in a Hyperlinked
    * Environment", JACM 1999) — hubs point at good authorities,
    * authorities are pointed at by good hubs: the complementary signal
    * to [[pageRank]] for seed-list curation (a directory page is a
    * strong hub long before it accrues rank). Per round:
    *
    *   a(v) ← Σ_{u→v} h(u), then L1-normalized (Σa = 1);
    *   h(u) ← Σ_{u→v} a(v), then L1-normalized (Σh = 1).
    *
    * Pinned semantics (mirrored by the q_t58 oracle): node set =
    * sources ∪ destinations; h_0 = 1/N; L1 normalization (Kleinberg's
    * L2 changes nothing about the ordering, and L1 keeps the oracle's
    * arithmetic in plain sums); multi-edges count once each; an
    * edge-less graph returns all-zero scores rather than dividing by
    * zero.
    *
    * Scale shape: per round one join hashing on src + one on dst (each
    * with its aggregation); normalization sums stay IN the plan as
    * broadcast one-row frames — no per-round driver action. Frames are
    * `localCheckpoint`ed per round exactly as in [[pageRank]].
    *
    * @return `node`, `hub`, `authority` — one row per node */
  def hits(
      edges: DataFrame, src: String, dst: String,
      iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val e = edges.select(col(src).cast("string").as("src"),
      col(dst).cast("string").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0)
      return nodes.withColumn("hub", lit(0.0))
        .withColumn("authority", lit(0.0))
    // tiny-loop gate ([[TinyLoop]]) — same shape as [[pageRank]]'s
    val ss = edges.sparkSession
    val tiny = TinyLoop.isTiny(ss, n) && TinyLoop.isTiny(ss, e.count())
    def l1(df: DataFrame, c: String): DataFrame = {
      val total = df.agg(sum(col(c)).as("__total"))
      df.crossJoin(broadcast(total))
        .select(col("node"),
          when(col("__total") > 0, col(c) / col("__total"))
            .otherwise(lit(0.0)).as(c))
    }
    var hub = nodes.withColumn("hub", lit(1.0 / n))
    var auth = nodes.withColumn("authority", lit(0.0))
    for (_ <- 1 to iterations) {
      // checkpoint every round, AFTER normalization: l1's in-plan
      // broadcast total reads its input twice, so an un-pinned round
      // is recomputed inside the next round's broadcast side — the
      // every-second-round cadence [[pageRank]] uses measured SLOWER
      // here (q_t58 solo 1.5 → 2.5-4 s), and pinning the raw sums
      // before l1 instead measured slower still (9 s: one more
      // broadcast materialization per half-round). This is the r20
      // form, kept on measurement.
      auth = TinyLoop.pin(l1(nodes.join(
          e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node"))
            .agg(sum(col("hub")).as("authority")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("authority"), lit(0.0)).as("authority")),
        "authority"), tiny)
      hub = TinyLoop.pin(l1(nodes.join(
          e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node"))
            .agg(sum(col("authority")).as("hub")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub")),
        "hub"), tiny)
    }
    hub.join(auth, "node")
  }
}
