package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins (SURVEY.md §2.3/§4 scale notes): both sides
  * bucketed by the join key → the sort-merge join needs no Exchange. */
class BucketingSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$base/orders")
      .saveAsTable("graft_b_orders")
    Tables.customer(spark, sf).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$base/customer")
      .saveAsTable("graft_b_customer")

    // disable broadcast so the co-located sort-merge path is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_b_orders")
        .join(spark.table("graft_b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be exchange-free (no shuffle on either join
      // key); only the downstream aggregation may shuffle
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("hashpartitioning(o_custkey")
        && !plan.contains("hashpartitioning(c_custkey"),
        s"expected co-located join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }
}
