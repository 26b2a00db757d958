package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operator surface certified against the DuckDB oracle
  * (SURVEY.md §2: Q-S1, Q-S3, Q-S5, Q-S6, Q-P1, Q-P2, Q-P3, Q-P4, Q-P6,
  * Q-J1, Q-J2, Q-J3, Q-A1, Q-A2, Q-W1, Q-O1, Q-F2, Q-F4).
  *
  * Scale notes (100 TB target):
  *  - every query is a pure declarative plan: filters/projections reach the
  *    parquet scan, aggregations run partial→final, joins pick broadcast for
  *    dimension tables (explicit `broadcast()` where the dim side is known
  *    small relative to the fact side);
  *  - no `collect()` anywhere; the only actions are taken by the caller;
  *  - sums/averages are plain shuffled hash aggregates — associative, so AQE
  *    can coalesce/split partitions freely.
  */
object Core {

  /** Q-S1 — full scan + checksum aggregate over the fact table
    * (ref: directory scan at 01_dbignite_sample.py:22-26). */
  val qS1Scan = Q(
    "q_s1_scan",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
      |       sum(l_quantity) AS sum_qty,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
      |         AS sum_price
      |FROM lineitem""".stripMargin) { (s, d) =>
    lineitem(s, d).agg(
      count(lit(1)).as("cnt"),
      sum(col("l_orderkey")).as("sum_okey"),
      // integral-valued doubles: partial sums are exact at any order
      sum(col("l_quantity")).as("sum_qty"),
      stableSum(col("l_extendedprice")).as("sum_price"))
  }

  /** Q-S3 — write → re-read round trip (ref: saveAsTable at
    * 01_dbignite_sample.py:72,112). Writes parquet to a temp dir, reads it
    * back, checksums; oracle is the checksum of the source (round trip must
    * be lossless). */
  val qS3RoundTrip = Q(
    "q_s3_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS sum_price
      |FROM orders""".stripMargin) { (s, d) =>
    val tmp = Files.createTempDirectory("graft_s3_rt").toString
    orders(s, d).write.mode("overwrite").parquet(s"$tmp/orders_rt")
    s.read.parquet(s"$tmp/orders_rt").agg(
      count(lit(1)).as("cnt"),
      sum(col("o_orderkey")).as("sum_okey"),
      stableSum(col("o_totalprice")).as("sum_price"))
  }

  /** Q-S5 — DDL passthrough: DROP TABLE IF EXISTS + CTAS
    * (ref: 01_dbignite_sample.py:215-219,471-484). */
  val qS5Ctas = Q(
    "q_s5_ctas",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_totalprice > 150000""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("graft_orders_src")
    s.sql("DROP TABLE IF EXISTS graft_ctas_orders")
    // Fresh LOCATION per run: a managed-table location would survive the
    // JVM while the in-memory catalog does not, failing the next CTAS.
    val loc = Files.createTempDirectory("graft_ctas").toString
    s.sql(
      s"""CREATE TABLE graft_ctas_orders USING parquet
         |LOCATION '$loc/ctas_orders' AS
         |SELECT o_orderkey, o_custkey, o_totalprice
         |FROM graft_orders_src WHERE o_totalprice > 150000""".stripMargin)
    s.table("graft_ctas_orders")
  }

  /** Q-S6 — relational rows → JSON strings, the inverse-ETL boundary
    * (ref: df_to_fhir at 01_dbignite_sample.py:497-548; here the JSON
    * emission primitive itself). Stays entirely inside codegen — no RDD. */
  val qS6ToJson = Q(
    "q_s6_tojson",
    """SELECT CAST(json_object('c_custkey', c_custkey, 'c_name', c_name)
      |            AS VARCHAR) AS js
      |FROM customer""".stripMargin) { (s, d) =>
    customer(s, d).select(
      to_json(struct(col("c_custkey"), col("c_name"))).as("js"))
  }

  /** Q-P1 — arithmetic projection (ref: nested projections at
    * 01_dbignite_sample.py:47-56; arithmetic shape from the claim amounts). */
  val qP1Project = Q(
    "q_p1_project",
    """SELECT l_orderkey, l_linenumber,
      |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      |       l_quantity * l_extendedprice AS gross
      |FROM lineitem WHERE l_linenumber <= 2""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_linenumber") <= 2)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("charge"),
        (col("l_quantity") * col("l_extendedprice")).as("gross"))
  }

  /** Q-P2 — array index [0] after split (ref: `[0]` indexing at
    * 01_dbignite_sample.py:51-53,88-89). */
  val qP2ArrayIndex = Q(
    "q_p2_arrayindex",
    """SELECT split_part(p_name, ' ', 1) AS word0,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0
      |         AS sum_price
      |FROM part GROUP BY 1""".stripMargin) { (s, d) =>
    part(s, d)
      .select(split(col("p_name"), " ").getItem(0).as("word0"),
        col("p_retailprice"))
      .groupBy("word0")
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("p_retailprice")).as("sum_price"))
  }

  /** Q-P3 — explode / lateral flatten, the reference's workhorse
    * (ref: 01_dbignite_sample.py:47,63,82 and LATERAL VIEW subqueries). */
  val qP3Explode = Q(
    "q_p3_explode",
    """SELECT label,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(CAST(x AS DOUBLE) * 1000000000) AS BIGINT))
      |         / 1000000000.0 AS sum_x
      |FROM (SELECT label, unnest(embedding) AS x FROM embeddings)
      |GROUP BY label""".stripMargin) { (s, d) =>
    embeddings(s, d)
      .select(col("label"), explode(col("embedding")).as("x"))
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("x").cast("double"), 1e9).as("sum_x"))
  }

  /** Q-P4 — LIKE-pattern filter with OR
    * (ref: 01_dbignite_sample.py:56,94,160). */
  val qP4Like = Q(
    "q_p4_like",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_name LIKE '%0001%' OR c_name LIKE '%0013%'""".stripMargin) {
    (s, d) =>
      customer(s, d)
        .filter(col("c_name").like("%0001%") || col("c_name").like("%0013%"))
        .select(col("c_custkey"), col("c_name"))
  }

  /** Q-P6 — higher-order array filter with a lambda
    * (ref: filter(patient.identifier, x -> ...) at
    * 01_dbignite_sample.py:435,451,453). */
  val qP6HofFilter = Q(
    "q_p6_hof_filter",
    """SELECT vec_id,
      |       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      |       CAST(len(embedding) AS BIGINT) AS n_dim
      |FROM embeddings""".stripMargin) { (s, d) =>
    embeddings(s, d).select(
      col("vec_id"),
      size(filter(col("embedding"), x => x > lit(0))).cast("long").as("n_pos"),
      size(col("embedding")).cast("long").as("n_dim"))
  }

  /** Q-J1 — inner equi-join fact⋈dim, dim broadcast
    * (ref: bundleUUID joins at 01_dbignite_sample.py:241-243,265-267). */
  val qJ1Join = Q(
    "q_j1_join",
    """SELECT c_mktsegment,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("o_totalprice")).as("revenue"))
  }

  /** Q-J2 — join on a derived (substring-extracted) key
    * (ref: substring(claim.provider, 82, 36) join at
    * 01_dbignite_sample.py:326-333). */
  val qJ2DerivedKey = Q(
    "q_j2_derived_key",
    """SELECT c_mktsegment,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS revenue
      |FROM orders
      |JOIN customer ON CAST(substring(c_name, 10, 9) AS BIGINT) = o_custkey
      |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
    orders(s, d)
      .join(
        broadcast(customer(s, d)),
        substring(col("c_name"), 10, 9).cast("long") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("o_totalprice")).as("revenue"))
  }

  /** Q-J3 — left-outer existence probe with Y/N flag
    * (ref: dedup staging join at 01_dbignite_sample.py:370-397). */
  val qJ3LeftFlag = Q(
    "q_j3_left_flag",
    """SELECT CASE WHEN o.o_custkey IS NOT NULL THEN 'Y' ELSE 'N' END
      |         AS has_orders,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS sum_bal
      |FROM customer c
      |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      |  ON c.c_custkey = o.o_custkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val c = customer(s, d)
    val o = orders(s, d).select(col("o_custkey")).distinct()
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .select(
        when(col("o_custkey").isNotNull, "Y").otherwise("N").as("has_orders"),
        col("c_acctbal"))
      .groupBy("has_orders")
      .agg(count(lit(1)).as("cnt"), stableSum(col("c_acctbal")).as("sum_bal"))
  }

  /** Q-J4 — anti join (idiomatic form of the reference's manual
    * NOT-EXISTS dedup pattern, SURVEY.md §2.3). */
  val qJ4Anti = Q(
    "q_j4_anti",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS sum_bal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey)""".stripMargin) {
    (s, d) =>
      customer(s, d)
        .join(orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt"), stableSum(col("c_acctbal")).as("sum_bal"))
  }

  /** Q-A1 — grouped aggregation, TPC-H Q1 shape
    * (ref: the group-by count at 01_dbignite_sample.py:340-346,
    * widened per SURVEY.md §2.4). */
  val qA1Pricing = Q(
    "q_a1_pricing",
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
      |         AS sum_base_price,
      |       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |                AS BIGINT)) / 100.0 AS sum_disc_price,
      |       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
      |                      * 100) AS BIGINT)) / 100.0 AS sum_charge,
      |       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*)
      |         AS avg_qty,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
      |         / count(*) AS avg_price,
      |       sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*)
      |         AS avg_disc,
      |       CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        stableSum(col("l_extendedprice")).as("sum_base_price"),
        // money products rounded to cents per row: deterministic on both
        // engines (same parse tree → bit-equal input double), exact after
        stableSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        stableSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        stableAvg(col("l_quantity")).as("avg_qty"),
        stableAvg(col("l_extendedprice")).as("avg_price"),
        stableAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Q-A2 — aggregate suite: count distinct / min / max / sum / avg
    * (SURVEY.md §2.4: certify real analytics beyond the reference's single
    * count(1)). */
  val qA2AggSuite = Q(
    "q_a2_agg_suite",
    """SELECT o_orderstatus,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |       min(o_totalprice) AS min_price,
      |       max(o_totalprice) AS max_price,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS sum_price,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         / count(*) AS avg_price,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        stableSum(col("o_totalprice")).as("sum_price"),
        stableAvg(col("o_totalprice")).as("avg_price"),
        count(lit(1)).as("cnt"))
  }

  /** Q-F2 — substring on fixed offsets
    * (ref: substring(claim.provider, 82, 36) at 01_dbignite_sample.py:329). */
  val qF2Substring = Q(
    "q_f2_substring",
    """SELECT substring(c_name, 13, 6) AS frag,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS sum_bal
      |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
    customer(s, d)
      .select(substring(col("c_name"), 13, 6).as("frag"), col("c_acctbal"))
      .groupBy("frag")
      .agg(count(lit(1)).as("cnt"), stableSum(col("c_acctbal")).as("sum_bal"))
  }

  /** Q-F4 — date-part extraction on timestamps
    * (ref: year(p.birthDate) at 01_dbignite_sample.py:476-478). */
  val qF4DateParts = Q(
    "q_f4_dateparts",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
      |       CAST(month(o_orderdate) AS BIGINT) AS m,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS revenue
      |FROM orders GROUP BY 1, 2""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        col("o_totalprice"))
      .groupBy("y", "m")
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("o_totalprice")).as("revenue"))
  }

  /** Q-W1 — row_number window: latest order per customer, the idiomatic
    * replacement for the reference's staging-join dedup (SURVEY.md §2.5). */
  val qW1RowNumber = Q(
    "q_w1_rownumber",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC,
      |                                     o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn = 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Q-W2 — analytic windows: running sum + lag over an ordered frame. */
  val qW2Running = Q(
    "q_w2_running",
    """SELECT o_custkey, o_orderkey,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
      |         PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
      |         AS run_total,
      |       lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey) AS prev_price
      |FROM orders""".stripMargin) { (s, d) =>
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).select(
      col("o_custkey"),
      col("o_orderkey"),
      // exact-integer running sum: engines may fold window frames in
      // different orders (sequential vs segment tree) — longs don't care
      (sum(round(col("o_totalprice") * 100).cast("long")).over(frame)
        / 100.0).as("run_total"),
      lag(col("o_totalprice"), 1).over(ord).as("prev_price"))
  }

  /** RANGE window frame with a value offset — peers by VALUE distance,
    * not row position (q_w2 covers ROWS): each order counts and sums the
    * same customer's orders whose key lies within 10 below its own.
    * Integer arithmetic throughout, so frame-fold order cannot matter. */
  val qW3RangeFrame = Q(
    "q_w3_range_frame",
    """SELECT o_custkey, o_orderkey,
      |       CAST(count(*) OVER w AS BIGINT) AS n_near,
      |       CAST(sum(o_orderkey) OVER w AS BIGINT) AS sum_near
      |FROM orders
      |WHERE o_custkey % 10 = 4
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |             RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)""".stripMargin) {
    (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rangeBetween(-10, Window.currentRow)
    orders(s, d).filter(col("o_custkey") % 10 === 4).select(
      col("o_custkey"), col("o_orderkey"),
      count(lit(1)).over(w).as("n_near"),
      sum(col("o_orderkey")).over(w).as("sum_near"))
  }

  /** Disjunctive join predicate — TPC-H Q19's shape: an equi-key join
    * whose residual condition is an OR of conjunction groups mixing both
    * sides. Certifies that the equi-conjunct still drives a hash join
    * with the disjunction as a post-join filter (PlanSpec pins no
    * nested loop). */
  val qJ9Disjunctive = Q(
    "q_j9_disjunctive_join",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
      |         AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_size <= 10 AND l_quantity >= 30)
      |   OR (p_size > 40 AND l_quantity < 5)
      |   OR (p_brand = 'Brand#3' AND l_discount > 0.09)""".stripMargin) {
    (s, d) =>
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_size") <= 10 && col("l_quantity") >= 30) ||
        (col("p_size") > 40 && col("l_quantity") < 5) ||
        (col("p_brand") === "Brand#3" && col("l_discount") > 0.09))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        stableSum(col("l_extendedprice")).as("revenue"))
  }

  /** Q-O1 — top-k: ORDER BY ... DESC LIMIT n → TakeOrderedAndProject,
    * no global sort (ref: 01_dbignite_sample.py:458-459). Unique tiebreak
    * key keeps the selected set deterministic. */
  val qO1TopK = Q(
    "q_o1_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) {
    (s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))
  }

  /** TPC-H Q3 shape: 3-way fact join with selective dim filter + top-k on
    * an aggregated measure — the classic join-order/broadcast probe. */
  val qA7ShippingPriority = Q(
    "q_a7_shipping_priority",
    """SELECT l_orderkey,
      |       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |                AS BIGINT)) / 100.0 AS revenue,
      |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, 3
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01 00:00:00")))
      .join(
        orders(s, d)
          .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(
        broadcast(customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("order_date"))
      .agg(stableSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("order_date"))
  }

  /** TPC-H Q5 shape: 6-table snowflake join with region filter — the
    * multi-way join-reorder probe. */
  val qA8LocalSupplier = Q(
    "q_a8_local_supplier",
    """SELECT n_name,
      |       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |                AS BIGINT)) / 100.0 AS revenue,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .join(orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(stableSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("cnt"))
  }

  /** Exact top-k per group via the salted two-level rank
    * ([[graft.operators.Skew.topKPerGroup]]) — no group-sized sort
    * partition ever exists, yet the oracle certifies equality with the
    * naive single-window form. */
  val qO2TopKPerGroup = Q(
    "q_o2_topk_per_group",
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_orderpriority, o_orderkey, o_totalprice,
      |       CAST(rn AS BIGINT) AS rank
      |FROM r WHERE rn <= 5""".stripMargin) { (s, d) =>
    graft.operators.Skew.topKPerGroup(
      orders(s, d).select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice")),
      groupCols = Seq("o_orderpriority"),
      order = Seq(col("o_totalprice").desc, col("o_orderkey")),
      k = 5, saltSource = col("o_orderkey"))
  }

  /** EXISTS correlated subquery — TPC-H Q4's shape: order-priority
    * counts over orders with at least one deep-discount lineitem (this
    * testdata carries no commit/receipt dates, so the late-line predicate
    * becomes a discount one — same decorrelation shape). Certifies
    * Catalyst's RewritePredicateSubquery (EXISTS → left-semi join on the
    * correlation key): the Spark side is the SQL a user would actually
    * write; the subquery must decorrelate, never execute per-row (plan
    * pinned in PlanSpec). */
  val qA9ExistsPriority = Q(
    "q_a9_exists_priority",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_discount > 0.08)
      |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d).createOrReplaceTempView("graft_sq_orders")
    lineitem(s, d).createOrReplaceTempView("graft_sq_lineitem")
    s.sql(
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM graft_sq_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM graft_sq_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_discount > 0.08)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** Correlated SCALAR subquery — each lineitem that carries its order's
    * maximum quantity. Certifies scalar-subquery decorrelation
    * (aggregate-then-join): integer equality, so the compare is exact in
    * both engines. */
  val qA10CorrelatedMax = Q(
    "q_a10_correlated_max",
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       CAST(l_quantity AS BIGINT) AS qty
      |FROM lineitem l
      |WHERE l_orderkey % 10 = 3
      |  AND l_quantity = (SELECT max(l2.l_quantity) FROM lineitem l2
      |                    WHERE l2.l_orderkey = l.l_orderkey)""".stripMargin) {
    (s, d) =>
    lineitem(s, d).createOrReplaceTempView("graft_sq_lineitem")
    s.sql(
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(l_quantity AS BIGINT) AS qty
        |FROM graft_sq_lineitem l
        |WHERE l_orderkey % 10 = 3
        |  AND l_quantity = (SELECT max(l2.l_quantity)
        |                    FROM graft_sq_lineitem l2
        |                    WHERE l2.l_orderkey = l.l_orderkey)""".stripMargin)
  }

  val all: Seq[Q] = Seq(
    qA7ShippingPriority, qA8LocalSupplier, qA9ExistsPriority,
    qA10CorrelatedMax,
    qS1Scan, qS3RoundTrip, qS5Ctas, qS6ToJson,
    qP1Project, qP2ArrayIndex, qP3Explode, qP4Like, qP6HofFilter,
    qJ1Join, qJ2DerivedKey, qJ3LeftFlag, qJ4Anti,
    qA1Pricing, qA2AggSuite,
    qF2Substring, qF4DateParts,
    qW1RowNumber, qW2Running, qW3RangeFrame, qJ9Disjunctive,
    qO1TopK, qO2TopKPerGroup)
}
