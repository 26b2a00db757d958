package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.kmvSketch
import graft.operators.Dedup.md5Hash64

/** Contracts of the KMV distinct-count sketch beyond q_a13's replay
  * certification: estimator accuracy against exact counts, partition- and
  * duplicate-insensitivity (the properties that make the sketch a safe
  * `count(DISTINCT …)` substitute at shuffle-free cost), and the exact
  * small-cardinality path. */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf

  private val K = 256

  private def estimate(df: org.apache.spark.sql.DataFrame,
      c: String): Double = {
    val a = df.agg(kmvSketch(md5Hash64(col(c).cast("string")), K).as("a"))
    val kth = element_at(col("a"), K)
    val norm = kth.cast("double") / lit(18446744073709551616.0) +
      when(kth < 0, lit(1.0)).otherwise(lit(0.0))
    a.select(when(size(col("a")) < K, size(col("a")).cast("double"))
        .otherwise(lit((K - 1).toDouble) / norm))
      .collect()(0).getDouble(0)
  }

  test("KMV estimate lands within 4/sqrt(k) of the exact distinct count") {
    val li = Tables.lineitem(spark, sf)
    // the default operator surface (xxhash64) in one pass over all keys
    val op = graft.operators.Sketches
      .approxDistinct(li, Seq("l_orderkey", "l_partkey", "l_suppkey"))
      .collect()(0)
    for ((c, i) <- Seq("l_orderkey", "l_partkey", "l_suppkey").zipWithIndex) {
      val exact = li.select(c).distinct().count().toDouble
      val est = estimate(li, c)
      val rel = math.abs(est - exact) / exact
      val relOp = math.abs(op.getDouble(i) - exact) / exact
      println(f"kmv $c: exact $exact%.0f est $est%.1f rel $rel%.4f " +
        f"op(xxhash64) rel $relOp%.4f")
      // σ ≈ 1/√(k−2) ≈ 0.063; 4σ keeps this deterministic check honest
      // without flaking on an unlucky hash draw
      assert(rel < 4.0 / math.sqrt(K - 2), f"$c: rel error $rel%.4f")
      assert(relOp < 4.0 / math.sqrt(K - 2), f"$c: op rel error $relOp%.4f")
    }
  }

  test("sketch is partition- and duplicate-insensitive") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey")
    def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(kmvSketch(md5Hash64(col("l_orderkey").cast("string")), K)
          .as("a"))
        .collect()(0).getSeq[Long](0)
    val base = arr(li)
    assert(base.length == K)
    assert(arr(li.repartition(3)) == base, "merge order changed the sketch")
    assert(arr(li.union(li).repartition(7)) == base,
      "duplicates perturbed the sketch")
    // unsigned ascending order is part of the eval contract
    val flipped = base.map(_ ^ Long.MinValue)
    assert(flipped == flipped.sorted, "eval must emit unsigned-ascending")
  }

  test("streaming KMV aggregation equals the batch sketch at every prefix") {
    // complete-mode aggregation: the sketch buffer rides the state store
    // (serialize/merge across micro-batches), so a running distinct-count
    // over a stream must equal the batch sketch over the prefix fed so far
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def sketchOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(kmvSketch(md5Hash64(col("k").cast("string")), K).as("a"))
        .collect()(0).getSeq[Long](0)
    val keys = Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).as[Long].collect()
    val chunks = keys.grouped(keys.length / 3 + 1).toSeq
    val ms = StreamTestSupport.memoryStream[Long]
    @volatile var current: Seq[Long] = Nil
    val q = ms.toDF().toDF("k")
      .agg(kmvSketch(md5Hash64(col("k").cast("string")), K).as("a"))
      .writeStream.outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        current = df.collect()(0).getSeq[Long](0)
      }
      .start()
    try {
      var fed = Array.empty[Long]
      chunks.foreach { c =>
        fed = fed ++ c
        ms.addData(c.toSeq)
        q.processAllAvailable()
        assert(current == sketchOf(fed.toSeq.toDF("k")),
          s"after ${fed.length} rows: stream sketch != batch sketch")
      }
    } finally q.stop()
  }

  test("below k distinct values the estimate is exact") {
    val s = spark
    import s.implicits._
    val tiny = (0 until 500).map(i => i % 37).toDF("v")
    assert(estimate(tiny, "v") == 37.0)
  }

  test("sourceCard per-source host/domain estimates match exact counts") {
    // default k=64 against the fixture's <=15 distinct hosts per source:
    // every group takes the exact branch, so the KMV columns must EQUAL
    // count(DISTINCT host/domain) per source - a deterministic contract,
    // plus the doc/token mass shared with the q_t24 formulas
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val url = concat(lit("https://www.Site"),
      (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 2 === 0, ".COM").otherwise(".org"),
      lit("/p"))
    val card = TextAnalysis.sourceCard(docs, "source", "text", url)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    val exact = docs.select(col("source"),
        lower(concat(lit("www.site"), (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 2 === 0, ".com").otherwise(".org")))
          .as("host"))
      .withColumn("dom", regexp_replace(col("host"), "^www\\.", ""))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), countDistinct("host").as("dh"),
        countDistinct("dom").as("dd"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(card.keySet == exact.keySet)
    exact.foreach { case (src, (n, dh, dd)) =>
      val (cn, ch, cd) = card(src)
      assert(cn == n, s"$src n_docs")
      assert(ch == dh.toDouble, s"$src hosts: est $ch vs exact $dh")
      assert(cd == dd.toDouble, s"$src domains: est $cd vs exact $dd")
    }
  }
}
