package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._

/** Operators beyond the reference's own surface (SURVEY.md §2.7 notes set
  * ops as absent-but-inherited; BASELINE's north star asks for real
  * analytics): set operations, hierarchical aggregates, scalar-function
  * coverage, approximate sketches. */
object Extras {

  private def building(s: org.apache.spark.sql.SparkSession, d: String) =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
  private def wealthy(s: org.apache.spark.sql.SparkSession, d: String) =
    customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))

  /** UNION (distinct) — Spark's union() is UNION ALL, so distinct() on top. */
  val qU1Union = Q(
    "q_u1_union",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000""".stripMargin) {
    (s, d) => building(s, d).union(wealthy(s, d)).distinct()
  }

  val qU2Intersect = Q(
    "q_u2_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000""".stripMargin) {
    (s, d) => building(s, d).intersect(wealthy(s, d))
  }

  val qU3Except = Q(
    "q_u3_except",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000""".stripMargin) {
    (s, d) => building(s, d).except(wealthy(s, d))
  }

  /** ROLLUP: year × status hierarchy with subtotal rows. */
  val qA3Rollup = Q(
    "q_a3_rollup",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderstatus,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(o_totalprice) AS revenue
      |FROM orders
      |GROUP BY ROLLUP(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)"""
      .stripMargin) { (s, d) =>
    orders(s, d)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), col("o_totalprice"))
      .rollup(col("y"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("revenue"))
  }

  /** CUBE over the same dimensions (adds the status-only slice). */
  val qA4Cube = Q(
    "q_a4_cube",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderstatus,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(o_totalprice) AS revenue
      |FROM orders
      |GROUP BY CUBE(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)"""
      .stripMargin) { (s, d) =>
    orders(s, d)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), col("o_totalprice"))
      .cube(col("y"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("revenue"))
  }

  /** Scalar-function coverage: case transforms, lengths, concat, regex
    * extraction, arithmetic. */
  val qF5Strings = Q(
    "q_f5_strings",
    """SELECT p_partkey,
      |       upper(p_name) AS uname,
      |       CAST(length(p_brand) AS BIGINT) AS brand_len,
      |       concat(p_brand, ':', p_type) AS tag,
      |       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT)
      |         AS brand_num,
      |       p_retailprice * 1.1 AS adj_price
      |FROM part""".stripMargin) { (s, d) =>
    part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("uname"),
      length(col("p_brand")).cast("long").as("brand_len"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("tag"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("long")
        .as("brand_num"),
      (col("p_retailprice") * lit(1.1)).as("adj_price"))
  }

  /** Multi-branch CASE + coalesce/nullif null plumbing. */
  val qF6Case = Q(
    "q_f6_case",
    """SELECT CASE WHEN o_totalprice > 200000 THEN 'high'
      |            WHEN o_totalprice > 100000 THEN 'mid'
      |            ELSE 'low' END AS bucket,
      |       coalesce(nullif(o_orderpriority, ''), 'NONE') AS prio,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM orders GROUP BY 1, 2""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderpriority"), lit("")), lit("NONE"))
          .as("prio"))
      .groupBy("bucket", "prio")
      .agg(count(lit(1)).as("cnt"))
  }

  /** HLL sketch: approximate distinct counts (engine-specific sketch →
    * rows-only; the exact twin is certified in q_a2_agg_suite). */
  val qA5Approx = Q.rowsOnly("q_a5_approx_distinct") { (s, d) =>
    lineitem(s, d).agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"))
  }

  /** Salted two-phase aggregation — numerically equal to the direct
    * groupBy (certified against it), shape-proof for hot keys. */
  val qK1SaltedAgg = Q(
    "q_k1_salted_agg",
    """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt,
      |       sum(l_quantity) AS sum_v
      |FROM lineitem GROUP BY l_suppkey""".stripMargin) { (s, d) =>
    graft.operators.Skew.saltedCountSum(
      lineitem(s, d), "l_suppkey", "l_quantity", col("l_orderkey"))
  }

  val all: Seq[Q] = Seq(
    qU1Union, qU2Intersect, qU3Except,
    qA3Rollup, qA4Cube,
    qF5Strings, qF6Case, qA5Approx, qK1SaltedAgg)
}
