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

  test("like filter pushes to scan") {
    val p = plan("q_p4_like")
    assert(p.contains("PushedFilters") && p.contains("StringContains") || p.contains("Or(StringContains"), p)
  }
}
