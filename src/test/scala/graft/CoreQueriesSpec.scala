package graft

import org.scalatest.funsuite.AnyFunSuite

class CoreQueriesSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  test("every registered query runs and yields rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query with an oracle has matching column sets") {
    // The harness hash-compare sorts columns by name: a query whose output
    // columns drift from the oracle aliases fails even with equal values.
    // Guard the cheap invariant here: distinct, non-empty names.
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sf).columns
      assert(cols.nonEmpty, s"$name has no columns")
      assert(cols.distinct.length == cols.length,
        s"$name has duplicate column names: ${cols.mkString(",")}")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  test("registry names are unique (Map would silently drop duplicates)") {
    val names = Seq(
      graft.queries.Core.all, graft.queries.Extras.all,
      graft.queries.Events.all, graft.queries.Text.all,
      graft.queries.DedupQ.all, graft.queries.SimilarityQ.all,
      graft.queries.MultimodalQ.all).flatten.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == names.size)
  }

  test("q_s1_scan count equals raw lineitem count") {
    val n = Tables.lineitem(spark, sf).count()
    val row = SparkEntry.queries("q_s1_scan")(spark, sf).collect().head
    assert(row.getAs[Long]("cnt") == n)
  }

  test("q_o1_topk returns exactly 100 ordered rows") {
    val rows = SparkEntry.queries("q_o1_topk")(spark, sf).collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_w1_rownumber yields one row per customer with orders") {
    val expected = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(SparkEntry.queries("q_w1_rownumber")(spark, sf).count() == expected)
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
