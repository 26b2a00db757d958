package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** The bottom-k uniform sampler must pick EXACTLY the rows the naive
  * window formulation picks (it is a different physical plan for the
  * same draw), independent of input partitioning, with the bounded
  * aggregate's plan shape (one group exchange, no Window). */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private lazy val docs =
    Tables.documents(spark, GraftSpark.sf).select("source", "doc_id")

  private def windowDraw(k: Int): Set[(String, Long, Long)] =
    docs
      .withColumn("pri", Sampling.md5Priority(col("doc_id")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy("pri", "doc_id")).cast("long"))
      .where(col("rank") <= k)
      .select("source", "doc_id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("agrees with the window formulation for several k") {
    for (k <- Seq(1, 3, 16)) {
      val got = Sampling.uniformPerGroup(docs, Seq("source"), "doc_id", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == windowDraw(k), s"k=$k")
    }
  }

  test("draw is independent of input partitioning") {
    val k = 5
    val base = Sampling.uniformPerGroup(docs, Seq("source"), "doc_id", k)
      .collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 7, 32)) {
      val shuffled = Sampling.uniformPerGroup(
        docs.repartition(parts, col("doc_id") % 3), Seq("source"),
        "doc_id", k).collect().map(_.toSeq).toSet
      assert(shuffled == base, s"parts=$parts")
    }
  }

  test("plan: one group-key exchange, partial aggregation, no Window") {
    val df = Sampling.uniformPerGroup(docs, Seq("source"), "doc_id", 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.length == 1 && exchanges.head.contains("source"),
      s"expected exactly one group exchange:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"bounded-heap aggregate missing:\n$plan")
    assert(plan.contains("partial_graft_bottomk") ||
      plan.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      s"map-side partial aggregation missing:\n$plan")
  }

  test("exact-k per group, ranks 1..k, short groups keep all rows") {
    val k = 7
    val out = Sampling.uniformPerGroup(docs, Seq("source"), "doc_id", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length == math.min(k.toLong, sizes(src)))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.map(_._2).distinct.length == rows.length)
    }
    assert(out.groupBy(_._1).keySet == sizes.keySet)
  }

  test("weighted draw agrees with its window formulation") {
    val withW =
      Tables.documents(spark, GraftSpark.sf)
        .select("source", "doc_id", "n_chars")
    for (k <- Seq(1, 6)) {
      val got = Sampling
        .weightedPerGroup(withW, Seq("source"), "doc_id", "n_chars", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = withW
        .withColumn("key", call_function("div",
          (Sampling.md5Priority(col("doc_id")) + 1) * lit(1L << 20),
          col("n_chars").cast("long")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("source").orderBy("key", "doc_id"))
          .cast("long"))
        .where(col("rank") <= k)
        .select("source", "doc_id", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want, s"k=$k")
    }
  }

  test("weighted draw is actually weight-biased") {
    import spark.implicits._
    // 400 groups, each one HEAVY item (w=1000) among nine light (w=10):
    // priority sampling at k=1 must pick the heavy item in the vast
    // majority of groups (a uniform draw would pick it in ~10%)
    val pop = (0 until 400).flatMap { g =>
      (0 until 10).map { i =>
        (s"g$g", g * 100L + i, if (i == 0) 1000L else 10L)
      }
    }.toDF("g", "id", "w")
    val picked = Sampling.weightedPerGroup(pop, Seq("g"), "id", "w", 1)
      .collect().map(r => r.getLong(1))
    val heavy = picked.count(_ % 100 == 0)
    assert(heavy > 320, s"heavy item picked in only $heavy/400 groups")
  }

  test("null ids are skipped; argument validation") {
    import spark.implicits._
    val withNulls = Seq(
      ("a", Some(1L)), ("a", None), ("a", Some(2L)), ("b", None))
      .toDF("g", "id")
    val got = Sampling.uniformPerGroup(withNulls, Seq("g"), "id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == Set(("a", 1L), ("a", 2L)),
      "null ids must be skipped, a group of only nulls drops out")
    intercept[IllegalArgumentException] {
      Sampling.uniformPerGroup(docs, Seq("source"), "doc_id", 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.uniformPerGroup(
        docs.withColumn("rank", lit(1)), Seq("source"), "doc_id", 3)
    }
  }
}
