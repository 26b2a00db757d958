package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkGraph

/** PageRank semantics on closed-form graphs: stationary uniformity on
  * regular graphs, sink accumulation, dangling leak, self-loops, and
  * degenerate inputs. The q_t54 oracle certifies the numerical path;
  * these pin the SEMANTIC contract on graphs small enough to reason
  * about exactly. */
class LinkGraphSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int,
      damping: Double = 0.85): Map[String, Double] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iters, damping)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("directed cycle stays exactly uniform at any iteration count") {
    val cycle = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    for (it <- Seq(0, 1, 7)) {
      val r = ranks(cycle, it)
      assert(r.size == 4)
      r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12,
        s"cycle must stay uniform at iter $it: $r"))
    }
  }

  test("star: the hub out-ranks the leaves; leaves tie") {
    // leaves l1..l4 all point at hub; hub points back at l1 only
    val star = Seq("l1" -> "h", "l2" -> "h", "l3" -> "h", "l4" -> "h",
      "h" -> "l1")
    val r = ranks(star, 20)
    assert(r("h") > r("l1"), s"hub must out-rank: $r")
    assert(r("l1") > r("l2"), s"the hub's one target out-ranks: $r")
    assert(math.abs(r("l2") - r("l3")) < 1e-12
      && math.abs(r("l3") - r("l4")) < 1e-12, s"leaves must tie: $r")
    // no dangling nodes → total mass conserved at 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass: ${r.values.sum}")
  }

  test("dangling node leaks mass; totals stay below 1") {
    val r = ranks(Seq("a" -> "b", "b" -> "c"), 10) // c has no out-edge
    assert(r.size == 3)
    assert(r.values.sum < 1.0 - 1e-6,
      s"dangling leak must lower the total: ${r.values.sum}")
    assert(r("c") > r("b") && r("b") > r("a"),
      s"chain order must hold: $r")
  }

  test("redistributeDangling: totals sum to 1, ordering kept, no-op without sinks") {
    def ranksR(edges: Seq[(String, String)], iters: Int)
        : Map[String, Double] =
      LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters, 0.85, redistributeDangling = true)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // chain with a sink: default leaks (pinned above); redistribution
    // conserves total mass at EVERY iteration count
    val chain = Seq("a" -> "b", "b" -> "c")
    for (it <- Seq(1, 3, 10)) {
      val r = ranksR(chain, it)
      assert(math.abs(r.values.sum - 1.0) < 1e-9,
        s"Σ rank must be 1.0 at iter $it: ${r.values.sum}")
    }
    assert({ val r = ranksR(chain, 10)
      r("c") > r("b") && r("b") > r("a") },
      "relative ordering must match the default semantics")
    // dangle-free graph: redistribution must be numerically a no-op
    val free = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val d = ranks(free, 7)
    val rr = ranksR(free, 7)
    d.keys.foreach(k => assert(math.abs(d(k) - rr(k)) < 1e-12,
      s"no-sink graph must be unchanged at $k: ${d(k)} vs ${rr(k)}"))
  }

  test("self-loop is an ordinary edge") {
    // a keeps half its rank, sends half to b; b sends all back
    val r = ranks(Seq("a" -> "a", "a" -> "b", "b" -> "a"), 30)
    assert(r("a") > r("b"), s"self-retention must favor a: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("iterations=0 returns the uniform start; empty graph is empty") {
    val r0 = ranks(Seq("a" -> "b", "c" -> "d"), 0)
    r0.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
    assert(LinkGraph.pageRank(
      Seq.empty[(String, String)].toDF("src", "dst"), "src", "dst", 3)
      .count() == 0)
  }

  test("seedDistance: min depth, cycles, unreachable absent, maxDepth cap") {
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "d", // chain
      "a" -> "c", // shortcut: c is 1 hop, not 2
      "d" -> "b", // cycle back: must not re-visit
      "x" -> "y" // disconnected: unreachable
    ).toDF("src", "dst")
    val seeds = Seq("a").toDF("s")
    val got = LinkGraph.seedDistance(edges, "src", "dst", seeds, "s")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2),
      s"got: $got")
    // maxDepth stops the expansion; seeds always survive at 0
    val capped = LinkGraph.seedDistance(edges, "src", "dst", seeds, "s",
        maxDepth = 1)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(capped == Map("a" -> 0, "b" -> 1, "c" -> 1))
    val zero = LinkGraph.seedDistance(edges, "src", "dst", seeds, "s",
        maxDepth = 0)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(zero == Map("a" -> 0))
    // a seed missing from the graph still reports depth 0
    val lone = LinkGraph.seedDistance(edges, "src", "dst",
        Seq("zz").toDF("s"), "s")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(lone == Map("zz" -> 0))
  }

  test("hits: star separates hubs from the authority; L1 mass = 1 each") {
    val star = Seq("l1" -> "h", "l2" -> "h", "l3" -> "h", "l4" -> "h",
      "h" -> "l1").toDF("src", "dst")
    val r = LinkGraph.hits(star, "src", "dst", 10)
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2)))).toMap
    val (hubs, auths) = (r.view.mapValues(_._1), r.view.mapValues(_._2))
    assert(auths("h") > auths("l1") && auths("l1") > auths("l2"),
      s"the pointed-at node is the authority: $r")
    assert(hubs("l2") > hubs("h"), s"leaves are the hubs: $r")
    assert(math.abs(hubs("l2") - hubs("l3")) < 1e-12
      && math.abs(hubs("l3") - hubs("l4")) < 1e-12)
    assert(math.abs(hubs.values.sum - 1.0) < 1e-9
      && math.abs(auths.values.sum - 1.0) < 1e-9,
      s"L1 normalization must hold: $r")
  }

  test("hits: two-node chain converges to the obvious fixed point") {
    val r = LinkGraph.hits(Seq("a" -> "b").toDF("src", "dst"),
      "src", "dst", 5)
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(r("a") == ((1.0, 0.0)) && r("b") == ((0.0, 1.0)), s"$r")
  }

  test("damping=0 pins every node at 1/N regardless of edges") {
    val r = ranks(Seq("a" -> "b", "b" -> "b", "c" -> "a"), 5,
      damping = 0.0)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, s"$r"))
  }

  test("warm start: echo at 0 iterations, new nodes at 1/N, dup max, fixed point stays put") {
    val cycle = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    // iterations=0 echoes the seed vector: present nodes keep their
    // given rank (dup rows reduce to MAX), absent ones get 1/N
    val init = Seq(("a", 0.5), ("a", 0.2), ("b", 0.3)).toDF("node", "rank")
    val echoed = LinkGraph.pageRank(cycle, "src", "dst",
        iterations = 0, initial = Some(init))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(echoed("a") == 0.5 && echoed("b") == 0.3, s"$echoed")
    assert(math.abs(echoed("c") - 1.0 / 3) < 1e-15,
      s"a node the seed does not know starts at the uniform prior: $echoed")
    // a ring's exact fixed point is uniform: warm-starting FROM it
    // must stay put through further iterations (up to fp rounding)
    val uniform = Seq(("a", 1.0 / 3), ("b", 1.0 / 3), ("c", 1.0 / 3))
      .toDF("node", "rank")
    val stayed = LinkGraph.pageRank(cycle, "src", "dst",
        iterations = 4, initial = Some(uniform))
      .collect().map(r => r.getDouble(1))
    stayed.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-14,
      s"fixed point must ride through warm-started iterations: $v"))
    // warm-started and cold runs converge to the same place: enough
    // iterations from a LOPSIDED seed equals the cold run
    val cold = ranks(Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "a" -> "c"), 40)
    val lopsided = Seq(("a", 0.9), ("b", 0.05), ("c", 0.05))
      .toDF("node", "rank")
    val warm = LinkGraph.pageRank(
        Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
          .toDF("src", "dst"), "src", "dst",
        iterations = 40, initial = Some(lopsided))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cold.foreach { case (k, v) =>
      // asymptotic, not exact: 40 rounds leave ~4e-10 of start-
      // dependent residual on this graph (contraction ~d per round)
      assert(math.abs(warm(k) - v) < 1e-8,
        s"start independence: $k warm=${warm(k)} cold=$v")
    }
  }
}
