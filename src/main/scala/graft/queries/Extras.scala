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
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS revenue
      |FROM orders
      |GROUP BY ROLLUP(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)"""
      .stripMargin) { (s, d) =>
    orders(s, d)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), col("o_totalprice"))
      .rollup(col("y"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("o_totalprice")).as("revenue"))
  }

  /** CUBE over the same dimensions (adds the status-only slice). */
  val qA4Cube = Q(
    "q_a4_cube",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderstatus,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS revenue
      |FROM orders
      |GROUP BY CUBE(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)"""
      .stripMargin) { (s, d) =>
    orders(s, d)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), col("o_totalprice"))
      .cube(col("y"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("o_totalprice")).as("revenue"))
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
    * rows-only; the exact twin is certified in q_a2_agg_suite, and the
    * CERTIFIABLE sketch twin is q_a13's KMV estimator). */
  val qA5Approx = Q.rowsOnly("q_a5_approx_distinct",
    "HLL estimator: engine-specific sketch state has no DuckDB " +
      "restatement; exact twin certified in q_a2_agg_suite, certifiable " +
      "sketch twin in q_a13/q_a14 (KMV)") { (s, d) =>
    lineitem(s, d).agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"))
  }

  /** One KMV leg of the q_a13 oracle: the portable md5-prefix hash over
    * DISTINCT key strings, ranked in UNSIGNED 64-bit order (sign class
    * first, then signed value — exactly the sketch's flipped-sign
    * TreeSet order), and the `D̂ = (k−1)/h₍ₖ₎` estimate on the identical
    * IEEE tree the Spark side computes (`CAST AS DOUBLE / 2⁶⁴ + CASE`),
    * falling back to the exact count when fewer than k distinct hashes
    * exist. */
  private def kmvOracleLeg(tag: String, keyCol: String): String =
    s"""h_$tag AS (
       |  SELECT DISTINCT
       |    (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
       |      * 4294967296 + lo AS h
       |  FROM (SELECT
       |      CAST(('0x' || substring(md5(CAST($keyCol AS VARCHAR)), 1, 8))
       |        AS BIGINT) AS hi,
       |      CAST(('0x' || substring(md5(CAST($keyCol AS VARCHAR)), 9, 8))
       |        AS BIGINT) AS lo
       |    FROM lineitem)),
       |r_$tag AS (
       |  SELECT h, row_number() OVER (
       |      ORDER BY CASE WHEN h >= 0 THEN 0 ELSE 1 END, h) AS rn
       |  FROM h_$tag),
       |e_$tag AS (
       |  SELECT CASE WHEN (SELECT count(*) FROM h_$tag) < 256
       |    THEN (SELECT CAST(count(*) AS DOUBLE) FROM h_$tag)
       |    ELSE 255.0 / (SELECT CAST(h AS DOUBLE) / 18446744073709551616.0
       |                    + CASE WHEN h < 0 THEN 1.0 ELSE 0.0 END
       |                  FROM r_$tag WHERE rn = 256)
       |    END AS est)""".stripMargin

  /** Per-group KMV — the realistic grouped shape (distinct orders per
    * return flag; at 100 TB: distinct users per day, distinct docs per
    * crawl), HASH-CERTIFIED by the same replay as q_a13 with the order
    * statistic PARTITIONed per group. k = 64 keeps the estimator branch
    * live from sf0.001 up (hundreds of distinct orders per flag) while
    * the oracle's `max(CASE WHEN rn = k …)` turns NULL below k distinct,
    * selecting the exact-count branch — mirroring `size(a) < k`. */
  val qA14KmvGroups = Q(
    "q_a14_kmv_groups",
    """WITH hs AS (
      |  SELECT DISTINCT l_returnflag AS g,
      |    (hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
      |      * 4294967296 + lo AS h
      |  FROM (SELECT l_returnflag,
      |      CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))
      |        AS BIGINT) AS hi,
      |      CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 9, 8))
      |        AS BIGINT) AS lo
      |    FROM lineitem)),
      |r AS (
      |  SELECT g, h,
      |    row_number() OVER (PARTITION BY g
      |      ORDER BY CASE WHEN h >= 0 THEN 0 ELSE 1 END, h) AS rn,
      |    count(*) OVER (PARTITION BY g) AS nd
      |  FROM hs)
      |SELECT g AS l_returnflag,
      |  CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
      |       ELSE 63.0 / max(CASE WHEN rn = 64
      |         THEN CAST(h AS DOUBLE) / 18446744073709551616.0
      |            + CASE WHEN h < 0 THEN 1.0 ELSE 0.0 END END)
      |  END AS est_orders
      |FROM r GROUP BY g""".stripMargin) { (s, d) =>
    graft.operators.Sketches
      .approxDistinctByGroup(lineitem(s, d), Seq("l_returnflag"),
        "l_orderkey", k = 64,
        tokenHash = graft.operators.Dedup.md5Hash64)
      .select(col("l_returnflag"),
        col("est_l_orderkey").as("est_orders"))
  }

  /** KMV approximate distinct counts, HASH-CERTIFIED — the sketch twin
    * of q_a5 whose estimator is a pure order statistic: the k smallest
    * DISTINCT portable hashes ([[graft.functions.KmvSketch]], bounded
    * memory, set-union mergeable — duplicates collapse map-side, ≤k longs
    * cross the shuffle) and `D̂ = (k−1)/h₍ₖ₎` computed in Column land so
    * the oracle replays every IEEE op. Relative error ≈ 1/√(k−2) ≈ 6 %
    * at k = 256; KmvSpec pins accuracy against the exact counts. */
  val qA13KmvDistinct = Q(
    "q_a13_kmv_distinct",
    s"""WITH ${kmvOracleLeg("ord", "l_orderkey")},
       |${kmvOracleLeg("prt", "l_partkey")}
       |SELECT (SELECT est FROM e_ord) AS est_orders,
       |       (SELECT est FROM e_prt) AS est_parts""".stripMargin) {
    (s, d) =>
      graft.operators.Sketches
        .approxDistinct(lineitem(s, d), Seq("l_orderkey", "l_partkey"),
          tokenHash = graft.operators.Dedup.md5Hash64)
        .select(col("est_l_orderkey").as("est_orders"),
          col("est_l_partkey").as("est_parts"))
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

  /** FULL OUTER join: customers×orders coverage flags on both sides. */
  val qJ5FullOuter = Q(
    "q_j5_full_outer",
    """SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
      |            WHEN o.o_custkey IS NULL THEN 'customer_only'
      |            ELSE 'both' END AS side,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM (SELECT c_custkey FROM customer WHERE c_custkey < 1000) c
      |FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o
      |  ON c.c_custkey = o.o_custkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val c = customer(s, d).filter(col("c_custkey") < 1000)
      .select(col("c_custkey"))
    val o = orders(s, d).select(col("o_custkey")).distinct()
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("both").as("side"))
      .groupBy("side").agg(count(lit(1)).as("cnt"))
  }

  /** CROSS join of the two smallest dims. */
  val qJ6Cross = Q(
    "q_j6_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation""".stripMargin) {
    (s, d) =>
      region(s, d).select(col("r_name"))
        .crossJoin(nation(s, d).select(col("n_name")))
  }

  /** Upsert/merge staging pattern: keep all target rows, add staging rows
    * whose key is absent (the reference's manual dedup-then-insert flow,
    * 01_dbignite_sample.py:350-397, as one operator). */
  val qJ7Upsert = Q(
    "q_j7_upsert",
    """SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 900
      |UNION ALL
      |SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_custkey >= 600 AND c_custkey NOT IN
      |  (SELECT c_custkey FROM customer WHERE c_custkey < 900)"""
      .stripMargin) { (s, d) =>
    val target = customer(s, d).filter(col("c_custkey") < 900)
      .select(col("c_custkey"), col("c_acctbal"))
    val staging = customer(s, d).filter(col("c_custkey") >= 600)
      .select(col("c_custkey"), col("c_acctbal"))
    target.unionByName(
      staging.join(target.select("c_custkey"), Seq("c_custkey"), "left_anti"))
  }

  /** Order-sensitive string aggregation, made deterministic by sorting. */
  val qA6StrAgg = Q(
    "q_a6_str_agg",
    """SELECT CAST(n_regionkey AS BIGINT) AS rk,
      |       string_agg(n_name, ',' ORDER BY n_name) AS names,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM nation GROUP BY 1""".stripMargin) { (s, d) =>
    nation(s, d)
      .groupBy(col("n_regionkey").cast("long").as("rk"))
      .agg(
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("names"),
        count(lit(1)).as("cnt"))
  }

  /** Date arithmetic: day diffs from an epoch and quarter extraction. */
  val qF7DateArith = Q(
    "q_f7_date_arith",
    """SELECT CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |       CAST(min(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
      |                          o_orderdate)) AS BIGINT) AS min_days,
      |       CAST(max(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
      |                          o_orderdate)) AS BIGINT) AS max_days,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(
        quarter(col("o_orderdate")).cast("long").as("q"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1995-01-01"))).cast("long").as("days"))
      .groupBy("q")
      .agg(min(col("days")).as("min_days"), max(col("days")).as("max_days"),
        count(lit(1)).as("cnt"))
  }

  /** CSV round trip: write → schema'd read back → checksum (string/number
    * serialization survives the text format). */
  val qS7CsvRoundTrip = Q(
    "q_s7_csv_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
      |       CAST(count(DISTINCT n_name) AS BIGINT) AS n_names
      |FROM nation""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val src = nation(s, d)
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation")
    s.read.schema(src.schema).option("header", "true").csv(s"$tmp/nation")
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_nationkey")).as("sum_key"),
        countDistinct(col("n_name")).as("n_names"))
  }

  /** ORC round trip: the columnar alternative sink. */
  val qS8OrcRoundTrip = Q(
    "q_s8_orc_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(s_suppkey) AS BIGINT) AS sum_key,
      |       sum(CAST(round(s_acctbal * 100) AS BIGINT)) / 100.0 AS sum_bal
      |FROM supplier""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    supplier(s, d).write.mode("overwrite").orc(s"$tmp/supplier")
    s.read.orc(s"$tmp/supplier")
      .agg(count(lit(1)).as("cnt"),
        sum(col("s_suppkey")).as("sum_key"),
        stableSum(col("s_acctbal")).as("sum_bal"))
  }

  /** Bloom-join: the probe side pre-filters through a Bloom filter of the
    * build side's keys before the join exchange. Result equals the plain
    * join exactly (no false negatives; false positives die in the join), so
    * the oracle states the plain join; the benefit is shuffle volume. */
  val qK2BloomJoin = Q(
    "q_k2_bloom_join",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_acctbal > 9000
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val build = customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.operators.BloomJoin
      .bloomFilteredJoin(
        orders(s, d).select(col("o_custkey")), build,
        "o_custkey", "c_custkey", expectedBuildRows = 200000L)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("o_custkey")).as("n_cust"))
  }

  /** Morton z-value: bit-exact interleave certified against the same
    * magic-number spreading sequence written in SQL. The layout operator
    * ([[graft.operators.Layout.zOrderBy]]) range-clusters on this value;
    * partition-range disjointness is asserted in NorthStarSpec. */
  /** JSON-lines round trip: the interchange format for crawl/ingest
    * pipelines. Schema supplied on read (never inferred — inference scans
    * the data twice and types drift); values certified through the same
    * aggregate as the source table. */
  val qS10JsonRoundTrip = Q(
    "q_s10_json_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(doc_id) AS BIGINT) AS sum_id,
      |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |       CAST(sum(length(text)) AS BIGINT) AS sum_chars
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
    val src = documents(s, d)
    src.write.mode("overwrite").json(s"$tmp/documents")
    s.read.schema(src.schema).json(s"$tmp/documents")
      .agg(count(lit(1)).as("cnt"), sum(col("doc_id")).as("sum_id"),
        countDistinct(col("lang")).as("n_langs"),
        sum(length(col("text")).cast("long")).as("sum_chars"))
  }

  /** Date-partitioned write + partition-pruned read: the standard lake
    * layout (one directory per day). The read filters ONE day; the scan
    * must prune to that partition's files (PartitionFilters asserted in
    * PlanSpec) — at 100 TB this is the difference between reading 1/365th
    * and everything. Values certified against the unpartitioned source. */
  val qS11Partitioned = Q(
    "q_s11_partitioned",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
      |         AS sum_value
      |FROM events
      |WHERE CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-02'
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.Tables.eventsTs(s, d)
      .withColumn("ts_utc", col("ts"))
      .withColumn("event_date", to_date(col("ts_utc")).cast("string"))
      .write.mode("overwrite").partitionBy("event_date")
      .parquet(s"$tmp/events")
    s.read.parquet(s"$tmp/events")
      .filter(col("event_date") === "2024-01-02")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        stableSum(col("value"), 1e6).as("sum_value"))
  }

  /** Parquet schema evolution: two writers with different column sets
    * land in one directory (the day-N pipeline upgrade every lake
    * lives through); `mergeSchema` unions them and late columns read as
    * null. The oracle reconstructs the merged read as an explicit
    * two-branch union. */
  val qS13SchemaMerge = Q(
    "q_s13_schema_merge",
    """WITH m AS (
      |  SELECT o_orderkey, o_totalprice,
      |         CAST(NULL AS VARCHAR) AS o_orderpriority
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
      |  FROM orders)
      |SELECT COALESCE(o_orderpriority, '<none>') AS prio,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(count(o_totalprice) AS BIGINT) AS n_price,
      |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
      |         AS sum_price
      |FROM m GROUP BY 1""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_merge").toString
    orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$tmp/data")
    orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("append").parquet(s"$tmp/data")
    s.read.option("mergeSchema", "true").parquet(s"$tmp/data")
      .groupBy(coalesce(col("o_orderpriority"), lit("<none>")).as("prio"))
      .agg(count(lit(1)).as("cnt"),
        count(col("o_totalprice")).as("n_price"),
        stableSum(col("o_totalprice")).as("sum_price"))
  }

  /** Small-file compaction round trip: fragment the lineitem table into
    * per-row-group shards (the streaming-ingest pathology), compact to
    * ~2000-record files, certify the rewritten data against the original
    * aggregate. File-count reduction is asserted in NorthStarSpec. */
  val qS12Compact = Q(
    "q_s12_compact",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(l_orderkey) AS BIGINT) AS sum_key,
      |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
      |         AS sum_price
      |FROM lineitem""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
    val frag = s"$tmp/fragmented"
    val compacted = s"$tmp/compacted"
    lineitem(s, d).repartition(64).write.mode("overwrite").parquet(frag)
    graft.operators.Layout.compact(s, frag, compacted,
      targetRecordsPerFile = 2000L)
    s.read.parquet(compacted)
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_orderkey")).as("sum_key"),
        stableSum(col("l_extendedprice")).as("sum_price"))
  }

  /** Bucketed co-located join: both sides written bucketBy(custkey) +
    * sortBy, read back as tables, joined WITHOUT either side shuffling
    * (bucket layout satisfies the join's distribution requirement — the
    * 100 TB answer to recurring joins on a stable key; exchange-freeness
    * is asserted in BucketingSpec, the result certified here). Fresh
    * LOCATION per run, same catalog caveat as q_s5. */
  val qS9BucketedJoin = Q(
    "q_s9_bucketed_join",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(o_custkey) AS BIGINT) AS sum_cust
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin) { (s, d) =>
    s.sql("DROP TABLE IF EXISTS graft_q_b_orders")
    s.sql("DROP TABLE IF EXISTS graft_q_b_customer")
    val loc = java.nio.file.Files.createTempDirectory("graft_bjoin").toString
    orders(s, d).write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$loc/orders").saveAsTable("graft_q_b_orders")
    customer(s, d).write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$loc/customer").saveAsTable("graft_q_b_customer")
    s.table("graft_q_b_orders")
      .join(s.table("graft_q_b_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), sum(col("o_custkey")).as("sum_cust"))
  }

  val qZ1ZOrder = Q(
    "q_z1_zorder",
    """WITH b AS (SELECT event_id, user_id & 65535 AS x,
      |                  event_id & 65535 AS y
      |           FROM events),
      |s1 AS (SELECT event_id,
      |         (x | (x << 8)) & 16711935 AS x1,
      |         (y | (y << 8)) & 16711935 AS y1 FROM b),
      |s2 AS (SELECT event_id,
      |         (x1 | (x1 << 4)) & 252645135 AS x2,
      |         (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
      |s3 AS (SELECT event_id,
      |         (x2 | (x2 << 2)) & 858993459 AS x3,
      |         (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
      |s4 AS (SELECT event_id,
      |         (x3 | (x3 << 1)) & 1431655765 AS x4,
      |         (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3)
      |SELECT event_id, CAST(x4 | (y4 << 1) AS BIGINT) AS z
      |FROM s4""".stripMargin) { (s, d) =>
    events(s, d).select(col("event_id"),
      graft.operators.Layout.zValue2(col("user_id"), col("event_id"))
        .as("z"))
  }

  /** 3-D Morton code (user, event, time-second) via the generalized
    * bit-loop interleave — the multi-dimension z-order a (user_id,
    * event_id, ts)-predicated events lake clusters by. The oracle
    * recomputes the interleave with an explicit per-bit loop, independent
    * of the Spark expression tree. `ts` is normalized via Tables.eventsTs
    * (nanos-long or timestamp[us] → micros TimestampType), then
    * `unix_seconds` floors to epoch seconds; DuckDB's
    * `epoch_ns(ts) // 1e9` floors identically for these positive
    * timestamps. */
  val qZ2ZOrder3 = Q(
    "q_z2_zorder3",
    """WITH b AS (SELECT event_id, user_id & 65535 AS x,
      |                  event_id & 65535 AS y,
      |                  (epoch_ns(ts) // 1000000000) & 65535 AS t
      |           FROM events)
      |SELECT event_id,
      |       CAST(list_sum(list_transform(range(0, 16),
      |         j -> (((x >> j) & 1) << (j * 3))
      |            + (((y >> j) & 1) << (j * 3 + 1))
      |            + (((t >> j) & 1) << (j * 3 + 2)))) AS BIGINT) AS z
      |FROM b""".stripMargin) { (s, d) =>
    graft.Tables.eventsTs(s, d).select(col("event_id"),
      graft.operators.Layout.zValueN(Seq(
        col("user_id"), col("event_id"),
        unix_seconds(col("ts")))).as("z"))
  }

  /** 2-D Hilbert index — the locality-preserving layout key next to the
    * Morton pair. The oracle replays the classic per-bit fold (quadrant
    * contribution + XOR-flip/swap rotation) as a 16-step recursive CTE
    * carrying (x, y, d), fully independent of the Spark stage chain. */
  val qZ3Hilbert = Q(
    "q_z3_hilbert",
    """WITH RECURSIVE h AS (
      |  SELECT event_id, user_id & 65535 AS x, event_id & 65535 AS y,
      |         CAST(0 AS BIGINT) AS d, 32768 AS s
      |  FROM events
      |  UNION ALL
      |  SELECT event_id,
      |    CASE WHEN (y & s) = 0
      |         THEN CASE WHEN (x & s) > 0 THEN xor(y, 65535) ELSE y END
      |         ELSE x END,
      |    CASE WHEN (y & s) = 0
      |         THEN CASE WHEN (x & s) > 0 THEN xor(x, 65535) ELSE x END
      |         ELSE y END,
      |    d + CAST(s AS BIGINT) * s *
      |        xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
      |            CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END),
      |    s // 2
      |  FROM h WHERE s > 0)
      |SELECT event_id, d AS h FROM h WHERE s = 0""".stripMargin) { (s, d) =>
    graft.operators.Layout.withHilbert2(
      events(s, d).select(col("event_id"), col("user_id")),
      "user_id", "event_id", "h")
      .select(col("event_id"), col("h"))
  }

  /** 3-D Hilbert index over (user, event, time-second) — the Skilling
    * transform on the Spark side (Layout.withHilbert3), and a fully
    * independent DuckDB replay on the oracle side: the MSB→LSB
    * exchange/invert loop as a recursive CTE (one step per bit, the
    * three per-dimension updates unrolled through nested derived
    * tables), then the Gray correction with the parity mask as a
    * `bit_count` closed form, then the plain interleave. `ts` is
    * normalized via Tables.eventsTs exactly as q_z2. */
  val qZ4Hilbert3 = Q(
    "q_z4_hilbert3",
    """WITH RECURSIVE pts AS (
      |  SELECT event_id,
      |         CAST(user_id & 65535 AS BIGINT) AS x0,
      |         CAST(event_id & 65535 AS BIGINT) AS x1,
      |         CAST((epoch_ns(ts) // 1000000000) & 65535 AS BIGINT) AS x2
      |  FROM events),
      |h AS (
      |  SELECT event_id, x0, x1, x2, 15 AS s FROM pts
      |  UNION ALL
      |  SELECT event_id, c0, b1, c2, s - 1 FROM (
      |    SELECT event_id, s,
      |           CASE WHEN (x2 & q) != 0 THEN xor(b0, p)
      |                ELSE xor(b0, xor(b0, x2) & p) END AS c0,
      |           b1,
      |           CASE WHEN (x2 & q) != 0 THEN x2
      |                ELSE xor(x2, xor(b0, x2) & p) END AS c2
      |    FROM (
      |      SELECT event_id, s, q, p, x2,
      |             CASE WHEN (x1 & q) != 0 THEN xor(a0, p)
      |                  ELSE xor(a0, xor(a0, x1) & p) END AS b0,
      |             CASE WHEN (x1 & q) != 0 THEN x1
      |                  ELSE xor(x1, xor(a0, x1) & p) END AS b1
      |      FROM (
      |        SELECT event_id, s, q, p, x1, x2,
      |               CASE WHEN (x0 & q) != 0 THEN xor(x0, p)
      |                    ELSE x0 END AS a0
      |        FROM (
      |          SELECT event_id, x0, x1, x2, s,
      |                 (CAST(1 AS BIGINT) << s) AS q,
      |                 (CAST(1 AS BIGINT) << s) - 1 AS p
      |          FROM h WHERE s >= 1)))) ),
      |fin AS (
      |  SELECT event_id, x0, xor(x1, x0) AS g1, xor(x2, xor(x1, x0)) AS g2
      |  FROM h WHERE s = 0),
      |tt AS (
      |  SELECT event_id, x0, g1, g2,
      |         CAST(list_sum(list_transform(range(0, 15),
      |           k -> ((bit_count(g2 >> (k + 1)) & 1)::BIGINT << k)))
      |           AS BIGINT) AS t
      |  FROM fin)
      |SELECT event_id,
      |       CAST(list_sum(list_transform(range(0, 16),
      |         j -> (((xor(x0, t) >> j) & 1) << (j * 3 + 2))
      |            + (((xor(g1, t) >> j) & 1) << (j * 3 + 1))
      |            + (((xor(g2, t) >> j) & 1) << (j * 3)))) AS BIGINT) AS h
      |FROM tt""".stripMargin) { (s, d) =>
    graft.operators.Layout.withHilbert3(
      graft.Tables.eventsTs(s, d)
        .select(col("event_id"), col("user_id"),
          unix_seconds(col("ts")).as("__sec")),
      "user_id", "event_id", "__sec", "h")
      .select(col("event_id"), col("h"))
  }

  /** 4-D Hilbert index over (user, event, time-second, user+event) at 12
    * bits per dimension — [[Layout.withHilbertN]]'s generalized Skilling
    * loop, certified by the same fully independent DuckDB replay as q_z4
    * with a fourth exchange level nested in (dims run 0→3 per bit step,
    * then the Gray chain g1..g3, the parity mask off g3, and the 4-way
    * interleave with dimension 0 at the high bit of each group). */
  val qZ5Hilbert4 = Q(
    "q_z5_hilbert4",
    """WITH RECURSIVE pts AS (
      |  SELECT event_id,
      |         CAST(user_id & 4095 AS BIGINT) AS x0,
      |         CAST(event_id & 4095 AS BIGINT) AS x1,
      |         CAST((epoch_ns(ts) // 1000000000) & 4095 AS BIGINT) AS x2,
      |         CAST((user_id + event_id) & 4095 AS BIGINT) AS x3
      |  FROM events),
      |h AS (
      |  SELECT event_id, x0, x1, x2, x3, 11 AS s FROM pts
      |  UNION ALL
      |  SELECT event_id, d0, b1, c2, d3, s - 1 FROM (
      |    SELECT event_id, s, b1, c2,
      |           CASE WHEN (x3 & q) != 0 THEN xor(c0, p)
      |                ELSE xor(c0, xor(c0, x3) & p) END AS d0,
      |           CASE WHEN (x3 & q) != 0 THEN x3
      |                ELSE xor(x3, xor(c0, x3) & p) END AS d3
      |    FROM (
      |      SELECT event_id, s, q, p, x3, b1,
      |             CASE WHEN (x2 & q) != 0 THEN xor(b0, p)
      |                  ELSE xor(b0, xor(b0, x2) & p) END AS c0,
      |             CASE WHEN (x2 & q) != 0 THEN x2
      |                  ELSE xor(x2, xor(b0, x2) & p) END AS c2
      |      FROM (
      |        SELECT event_id, s, q, p, x2, x3,
      |               CASE WHEN (x1 & q) != 0 THEN xor(a0, p)
      |                    ELSE xor(a0, xor(a0, x1) & p) END AS b0,
      |               CASE WHEN (x1 & q) != 0 THEN x1
      |                    ELSE xor(x1, xor(a0, x1) & p) END AS b1
      |        FROM (
      |          SELECT event_id, s, q, p, x1, x2, x3,
      |                 CASE WHEN (x0 & q) != 0 THEN xor(x0, p)
      |                      ELSE x0 END AS a0
      |          FROM (
      |            SELECT event_id, x0, x1, x2, x3, s,
      |                   (CAST(1 AS BIGINT) << s) AS q,
      |                   (CAST(1 AS BIGINT) << s) - 1 AS p
      |            FROM h WHERE s >= 1))))) ),
      |fin AS (
      |  SELECT event_id, x0,
      |         xor(x1, x0) AS g1,
      |         xor(x2, xor(x1, x0)) AS g2,
      |         xor(x3, xor(x2, xor(x1, x0))) AS g3
      |  FROM h WHERE s = 0),
      |tt AS (
      |  SELECT event_id, x0, g1, g2, g3,
      |         CAST(list_sum(list_transform(range(0, 11),
      |           k -> ((bit_count(g3 >> (k + 1)) & 1)::BIGINT << k)))
      |           AS BIGINT) AS t
      |  FROM fin)
      |SELECT event_id,
      |       CAST(list_sum(list_transform(range(0, 12),
      |         j -> (((xor(x0, t) >> j) & 1) << (j * 4 + 3))
      |            + (((xor(g1, t) >> j) & 1) << (j * 4 + 2))
      |            + (((xor(g2, t) >> j) & 1) << (j * 4 + 1))
      |            + (((xor(g3, t) >> j) & 1) << (j * 4)))) AS BIGINT) AS h
      |FROM tt""".stripMargin) { (s, d) =>
    graft.operators.Layout.withHilbertN(
      graft.Tables.eventsTs(s, d)
        .select(col("event_id"), col("user_id"),
          unix_seconds(col("ts")).as("__sec"),
          (col("user_id") + col("event_id")).as("__uw")),
      Seq("user_id", "event_id", "__sec", "__uw"), "h", bits = 12)
      .select(col("event_id"), col("h"))
  }

  /** Generic one-pass table profile ([[graft.operators.Profile
    * .profileTable]]) in its exact-distinct verification mode,
    * hash-certified column for column: the oracle recomputes every
    * non-null/null/distinct count and stringified min/max independently
    * (one UNION ALL branch per column). The default approx mode swaps
    * only `count(DISTINCT)` for HLL++ — same plan minus the Expand. */
  val qS14Profile = Q(
    "q_s14_profile",
    """SELECT 'n_nationkey' AS "column", 'int' AS dtype,
      |       CAST(COUNT(n_nationkey) AS BIGINT) AS n_non_null,
      |       CAST(COUNT(*) - COUNT(n_nationkey) AS BIGINT) AS n_nulls,
      |       CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) AS n_distinct,
      |       CAST(MIN(n_nationkey) AS VARCHAR) AS min_value,
      |       CAST(MAX(n_nationkey) AS VARCHAR) AS max_value
      |FROM nation
      |UNION ALL
      |SELECT 'n_name', 'string',
      |       CAST(COUNT(n_name) AS BIGINT),
      |       CAST(COUNT(*) - COUNT(n_name) AS BIGINT),
      |       CAST(COUNT(DISTINCT n_name) AS BIGINT),
      |       MIN(n_name), MAX(n_name)
      |FROM nation
      |UNION ALL
      |SELECT 'n_regionkey', 'int',
      |       CAST(COUNT(n_regionkey) AS BIGINT),
      |       CAST(COUNT(*) - COUNT(n_regionkey) AS BIGINT),
      |       CAST(COUNT(DISTINCT n_regionkey) AS BIGINT),
      |       CAST(MIN(n_regionkey) AS VARCHAR),
      |       CAST(MAX(n_regionkey) AS VARCHAR)
      |FROM nation""".stripMargin) { (s, d) =>
    graft.operators.Profile.profileTable(nation(s, d), exactDistinct = true)
  }

  /** GROUPING SETS with grouping_id — the explicit form behind rollup
    * (q_a3) and cube (q_a4); certifies the grouping-bitmask encoding
    * agrees across engines (bit per column, 1 = aggregated out). */
  val qA11GroupingSets = Q(
    "q_a11_grouping_sets",
    """SELECT coalesce(l_returnflag, '<all>') AS rf,
      |       coalesce(l_linestatus, '<all>') AS ls,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), ())""".stripMargin) { (s, d) =>
    lineitem(s, d).createOrReplaceTempView("graft_gs_lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, '<all>') AS rf,
        |       coalesce(l_linestatus, '<all>') AS ls,
        |       CAST(grouping_id() AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM graft_gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())""".stripMargin)
  }

  /** Equi-width histogram ([[graft.operators.Profile.histogram]]): the
    * oracle replays the identical `floor((x − lo) / width)` IEEE
    * arithmetic, so buckets match exactly — including boundary values. */
  val qA12Histogram = Q(
    "q_a12_histogram",
    """SELECT CAST(floor((l_extendedprice - 0.0) / 5000.0) AS BIGINT)
      |         AS bucket,
      |       CAST(0.0 AS DOUBLE)
      |         + CAST(floor((l_extendedprice - 0.0) / 5000.0) AS BIGINT)
      |         * CAST(5000.0 AS DOUBLE) AS lo_edge,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem
      |WHERE l_extendedprice >= 0.0 AND l_extendedprice < 120000.0
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    graft.operators.Profile.histogram(
      lineitem(s, d), "l_extendedprice", bins = 24, lo = 0.0, hi = 120000.0)
  }

  /** MapType surface: build a map from columns, explode it to
    * (key, value) rows — the schema-dynamic path pipelines use for
    * sparse per-row attributes. The oracle restates the explosion as a
    * per-key UNION ALL. */
  val qP7MapExplode = Q(
    "q_p7_map_explode",
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       'qty' AS key, l_quantity AS value
      |FROM lineitem WHERE l_orderkey % 50 = 7
      |UNION ALL
      |SELECT CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT),
      |       'tax', l_tax
      |FROM lineitem WHERE l_orderkey % 50 = 7""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_orderkey") % 50 === 7)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        explode(map(
          lit("qty"), col("l_quantity"),
          lit("tax"), col("l_tax"))).as(Seq("key", "value")))
  }

  /** Native unpivot (wide → long) — the inverse of q_e6's pivot:
    * four measure columns melt to (metric, value) rows in one
    * Expand-based pass. */
  val qP8Unpivot = Q(
    "q_p8_unpivot",
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       m.metric, m.value
      |FROM lineitem,
      |     LATERAL (VALUES ('l_quantity', l_quantity),
      |                     ('l_extendedprice', l_extendedprice),
      |                     ('l_discount', l_discount),
      |                     ('l_tax', l_tax)) AS m(metric, value)
      |WHERE l_orderkey % 50 = 9""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_orderkey") % 50 === 9)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "metric", valueColumnName = "value")
  }

  /** Array-function surface over the embeddings table: size, distinct,
    * and min/max element reductions (fixed-point longs so the
    * float-typed elements compare exactly). */
  val qF8ArrayFuncs = Q(
    "q_f8_array_funcs",
    """SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |       CAST(len(embedding) AS BIGINT) AS n_dims,
      |       CAST(len(list_distinct(embedding)) AS BIGINT) AS n_distinct,
      |       CAST(round(CAST(list_aggregate(embedding, 'min') AS DOUBLE)
      |                  * 1000000) AS BIGINT) AS min_fp,
      |       CAST(round(CAST(list_aggregate(embedding, 'max') AS DOUBLE)
      |                  * 1000000) AS BIGINT) AS max_fp
      |FROM embeddings""".stripMargin) { (s, d) =>
    embeddings(s, d).select(
      col("vec_id").cast("long").as("vec_id"),
      size(col("embedding")).cast("long").as("n_dims"),
      size(array_distinct(col("embedding"))).cast("long").as("n_distinct"),
      round(array_min(col("embedding")).cast("double") * 1000000)
        .cast("long").as("min_fp"),
      round(array_max(col("embedding")).cast("double") * 1000000)
        .cast("long").as("max_fp"))
  }

  /** Null-safe join equality (`<=>` / IS NOT DISTINCT FROM): planted
    * null keys on both sides must MATCH each other, which a plain
    * equi-join silently drops — the classic three-valued-logic dedup
    * bug. Certified by aggregating the join's match counts per key
    * class. */
  val qJ8NullSafeJoin = Q(
    "q_j8_nullsafe_join",
    """WITH k AS (SELECT o_orderkey,
      |                  nullif(o_custkey % 100, 50) AS k
      |           FROM orders WHERE o_orderkey % 20 = 1)
      |SELECT coalesce(CAST(a.k AS VARCHAR), '<null>') AS key_class,
      |       CAST(count(*) AS BIGINT) AS n_pairs
      |FROM k a JOIN k b ON a.k IS NOT DISTINCT FROM b.k
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val k = orders(s, d).filter(col("o_orderkey") % 20 === 1)
      .select(col("o_orderkey"),
        nullif(col("o_custkey") % 100, lit(50)).as("k"))
    k.as("a").join(k.as("b"), col("a.k") <=> col("b.k"))
      .groupBy(coalesce(col("a.k").cast("string"), lit("<null>"))
        .as("key_class"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** explode_outer: rows whose array filters to EMPTY must survive with
    * a null element — the boundary a plain explode silently drops. The
    * filter keeps only near-1.0 floats, so most embeddings yield no
    * elements. */
  val qP9ExplodeOuter = Q(
    "q_p9_explode_outer",
    """SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
      |       CAST(round(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT) AS x_fp
      |FROM embeddings e
      |LEFT JOIN LATERAL (
      |  SELECT unnest(list_filter(e.embedding, v -> v > 0.995)) AS x
      |) u ON TRUE""".stripMargin) { (s, d) =>
    embeddings(s, d).select(
      col("vec_id").cast("long").as("vec_id"),
      explode_outer(filter(col("embedding"), v => v > lit(0.995f))).as("x"))
      .select(col("vec_id"),
        round(col("x").cast("double") * 1000000).cast("long").as("x_fp"))
  }

  /** Explicit null ordering in sorts — a real cross-engine trap (Spark
    * defaults NULLS FIRST on ASC, DuckDB NULLS LAST), so the certified
    * form states the ordering on every sort key and ranks with nulls
    * deliberately LAST. Planted nulls via nullif; unique tiebreak keeps
    * the limit deterministic. */
  val qO3NullOrdering = Q(
    "q_o3_null_ordering",
    """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
      |       CAST(nullif(o_custkey % 7, 3) AS BIGINT) AS grp
      |FROM orders WHERE o_orderkey % 25 = 2
      |ORDER BY grp ASC NULLS LAST, o_orderkey ASC
      |LIMIT 40""".stripMargin) { (s, d) =>
    orders(s, d).filter(col("o_orderkey") % 25 === 2)
      .select(col("o_orderkey"),
        nullif(col("o_custkey") % 7, lit(3)).as("grp"))
      .orderBy(col("grp").asc_nulls_last, col("o_orderkey").asc)
      .limit(40)
  }

  /** Parquet zstd codec round trip — the storage knob a 100 TB corpus
    * actually ships with (zstd ≈ snappy read speed at a much better
    * ratio): write with compression=zstd, read back, checksum against
    * the source. */
  val qS15ZstdRoundTrip = Q(
    "q_s15_zstd_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(p_partkey) AS BIGINT) AS sum_key,
      |       sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0
      |         AS sum_price
      |FROM part""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_zstd").toString
    part(s, d).write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$tmp/part")
    s.read.parquet(s"$tmp/part")
      .agg(count(lit(1)).as("cnt"),
        sum(col("p_partkey")).as("sum_key"),
        stableSum(col("p_retailprice")).as("sum_price"))
  }

  /** `graft-warc` crawl-archive round trip, HASH-CERTIFIED: the
    * documents table becomes a member-per-record gzip WARC archive via
    * the distributed [[graft.sources.WarcIO.warcSave]] writer (one
    * `.warc.gz` per partition, warcinfo-led, ISO 28500 framing), then
    * reads back through the `graft-warc` DSv2 source — envelope parse,
    * explicit multi-member gunzip, HTTP status/header split,
    * Content-Length byte framing. The oracle restates closed-form what
    * a correct round trip must recover from the source rows: the minted
    * URI, the 200 status, the byte-exact UTF-8 payload, and its octet
    * length. warcinfo records are filtered by type — the result is
    * partition-count independent. */
  val qS16WarcRoundTrip = Q(
    "q_s16_warc_roundtrip",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CAST(200 AS INTEGER) AS http_status,
      |       text,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_q").toString
    graft.sources.WarcIO.warcSave(
      documents(s, d).select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:doc:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload"))
        .repartition(8),
      tmp)
    s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"),
        col("http_status"),
        decode(col("payload"), "UTF-8").as("text"),
        length(col("payload")).cast("long").as("payload_len"))
  }

  /** WET (extracted-text `conversion` records) round trip,
    * HASH-CERTIFIED — the archive-the-curated-corpus tail of the crawl
    * story: [[graft.sources.WarcIO.wetSave]] frames each document's
    * text as an ISO 28500 `conversion` record (text/plain, no HTTP
    * envelope), and the `graft-warc` source reads it back. The
    * certified `content_length` pins the writer's Content-Length
    * framing to the exact UTF-8 octet count. */
  val qS17WetRoundTrip = Q(
    "q_s17_wet_roundtrip",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       text,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS content_length
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_wet_q").toString
    graft.sources.WarcIO.wetSave(
      documents(s, d).select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:wet:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        col("text"))
        .repartition(8),
      tmp)
    s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type") === "conversion")
      .select(col("target_uri"),
        decode(col("payload"), "UTF-8").as("text"),
        col("content_length"))
  }

  /** CDX-indexed record fetch, HASH-CERTIFIED — the random-access story
    * at archive scale: [[graft.sources.WarcIO.warcSave]] writes a
    * `_cdx` sidecar of exact byte extents in the same pass, and
    * [[graft.sources.WarcIO.warcFetch]] answers a URI list by seeking
    * just those extents (kilobytes per page out of a 100 TB archive, no
    * scan). The oracle restates the fetched subset closed-form from the
    * source rows; hash-matching payload text and octet length pins the
    * offset/length arithmetic and the single-member gunzip byte-exactly. */
  val qS18WarcFetch = Q(
    "q_s18_warc_fetch",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CAST(200 AS INTEGER) AS http_status,
      |       text,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
      |FROM documents WHERE doc_id % 7 = 3""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdx_q").toString
    val docs = documents(s, d)
    graft.sources.WarcIO.warcSave(
      docs.select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:doc:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload"))
        .repartition(8),
      tmp)
    graft.sources.WarcIO.warcFetch(s, tmp,
      docs.filter(col("doc_id") % 7 === 3)
        .select(concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri")))
      .select(col("target_uri"),
        col("http_status"),
        decode(col("payload"), "UTF-8").as("text"),
        length(col("payload")).cast("long").as("payload_len"))
  }

  /** CDX-driven `target_uri` pushdown in the `graft-warc` SCAN,
    * HASH-CERTIFIED — [[qS18WarcFetch]] proves the seek+bounded-read
    * path as a standalone function; this certifies it lifted into the
    * DSv2 source: `load(dir).filter(target_uri.isin(…))` consults the
    * `_cdx` sidecar and plans one partition per file of matched byte
    * extents (kilobytes per page out of a 100 TB archive), with the
    * filter also re-applied by Spark as residual (skip-only pushdown,
    * no correctness surface; WarcSpec pins the coverage-gate fallback
    * when unindexed files land). The driver-side `collect()` builds
    * the literal IN list itself — a pushed In filter is literal by
    * construction, bounded by the probe count. Oracle restates the
    * fetched subset closed-form from the source rows. */
  val qS19CdxPushdown = Q(
    "q_s19_cdx_pushdown",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CAST(200 AS INTEGER) AS http_status,
      |       text,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
      |FROM documents WHERE doc_id % 37 = 5""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdxp_q").toString
    val docs = documents(s, d)
    graft.sources.WarcIO.warcSave(
      docs.select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:doc:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload"))
        .repartition(8),
      tmp)
    val uris = docs.filter(col("doc_id") % 37 === 5)
      .select(concat(lit("https://example.org/doc/"),
        col("doc_id").cast("string"))).collect().map(_.getString(0))
    s.read.format("graft-warc").load(tmp)
      .filter(col("target_uri").isin(uris.toSeq: _*))
      .select(col("target_uri"),
        col("http_status"),
        decode(col("payload"), "UTF-8").as("text"),
        length(col("payload")).cast("long").as("payload_len"))
  }

  /** WARC request/response pairing via WARC-Concurrent-To,
    * HASH-CERTIFIED — real crawl archives interleave request/response/
    * metadata records; [[graft.sources.WarcIO.warcSave]] writes the
    * interleaved layout (requestHttp column → one `request` record per
    * response, Concurrent-To pointing at it) and
    * [[graft.sources.WarcIO.pairRequests]] attaches each request's
    * parsed HTTP header map back onto its response by record id (a
    * skew-free unique-key equi-join, no adjacency assumption). The
    * certified column reads a negotiation header (Accept-Language)
    * through the pairing — the curation signal the crawl side actually
    * reaches for. */
  val qS20RequestPairing = Q(
    "q_s20_request_pairing",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       text,
      |       'en-' || CAST(doc_id % 5 AS VARCHAR) AS accept_lang
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_pair_q").toString
    graft.sources.WarcIO.warcSave(
      documents(s, d).select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:doc:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("GET /doc/"), col("doc_id").cast("string"),
          lit(" HTTP/1.1\r\nHost: example.org\r\nAccept-Language: en-"),
          (col("doc_id") % 5).cast("string")).as("req_http"))
        .repartition(8),
      tmp, requestHttp = Some("req_http"))
    graft.sources.WarcIO.pairRequests(
      s.read.format("graft-warc").load(tmp))
      .select(col("target_uri"),
        decode(col("payload"), "UTF-8").as("text"),
        col("request_headers").getItem("accept-language")
          .as("accept_lang"))
  }

  /** `.warc.zst` archive round trip, HASH-CERTIFIED — the framing
    * newer public crawl tooling ships: frame-per-record zstd members
    * written via the shared archive loop, read back through
    * [[graft.sources.MultiFrameZstdInputStream]] (explicit RFC 8878
    * frame walking — zstd-jni's own stream silently truncates a cut
    * trailing frame, so boundaries are parsed from the framing itself;
    * WarcFuzzSpec pins the loud-failure contract). Same oracle shape
    * as q_s16: the round trip must be byte-identical. */
  val qS16zZstdWarc = Q(
    "q_s16z_warc_zstd",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CAST(200 AS INTEGER) AS http_status,
      |       text,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_wzst_q").toString
    graft.sources.WarcIO.warcSave(
      documents(s, d).select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:doc:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload"))
        .repartition(8),
      tmp, codec = "zstd")
    s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"),
        col("http_status"),
        decode(col("payload"), "UTF-8").as("text"),
        length(col("payload")).cast("long").as("payload_len"))
  }

  /** HTTP status fidelity through the WARC round trip, HASH-CERTIFIED —
    * a real crawl archive is full of 301/404/503 captures and their
    * statuses ARE curation signals; [[graft.sources.WarcIO.warcSave]]'s
    * httpStatus column writes each capture's REAL status line (with an
    * out-of-table 599 exercising the bare-phrase fallback RFC 9112
    * allows) and the reader's HTTP split parses the CODE back. Payload
    * text rides along: a non-200 status line must not disturb the
    * Content-Length byte framing. */
  val qS21StatusFidelity = Q(
    "q_s21_status_fidelity",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CAST(CASE doc_id % 8 WHEN 0 THEN 200 WHEN 1 THEN 301
      |            WHEN 2 THEN 302 WHEN 3 THEN 304 WHEN 4 THEN 404
      |            WHEN 5 THEN 500 WHEN 6 THEN 503 ELSE 599 END
      |            AS INTEGER) AS http_status,
      |       text,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_wst_q").toString
    graft.sources.WarcIO.warcSave(
      documents(s, d).select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:doc:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 8).cast("int").as("m"))
        .withColumn("status",
          when(col("m") === 0, 200).when(col("m") === 1, 301)
            .when(col("m") === 2, 302).when(col("m") === 3, 304)
            .when(col("m") === 4, 404).when(col("m") === 5, 500)
            .when(col("m") === 6, 503).otherwise(599))
        .repartition(8),
      tmp, httpStatus = Some("status"))
    s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"),
        col("http_status"),
        decode(col("payload"), "UTF-8").as("text"),
        length(col("payload")).cast("long").as("payload_len"))
  }

  /** WARC `revisit` dedup storage round trip, HASH-CERTIFIED — the
    * layout real archival crawlers write: per distinct payload digest
    * one full `response` holds the bytes and every other capture is a
    * `revisit` envelope pointing at it (WARC-Refers-To +
    * WARC-Payload-Digest, identical-payload-digest profile).
    * [[graft.sources.WarcIO.warcDedupSave]] picks the canonical
    * capture with a partial-aggregating min(struct) group-by (NOT a
    * window — the hot digest is the point of dedup and must not need
    * one partition), and [[graft.sources.WarcIO.expandRevisits]]
    * rematerializes payloads through a unique-key join on the
    * canonical record id. The oracle restates canonical choice
    * (min doc_id per payload class — record ids are zero-padded so
    * string order IS numeric order), the refers_to pointer, and the
    * rematerialized text closed-form. */
  val qS22RevisitDedup = Q(
    "q_s22_revisit_dedup",
    """WITH src AS (SELECT doc_id, doc_id % 41 AS cls FROM documents),
      |     canon AS (SELECT cls, min(doc_id) AS canon_id
      |               FROM src GROUP BY cls)
      |SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CASE WHEN doc_id = canon_id THEN 'response'
      |            ELSE 'revisit' END AS stored_type,
      |       CASE WHEN doc_id = canon_id THEN CAST(NULL AS VARCHAR)
      |            ELSE '<urn:graft:doc:'
      |                 || lpad(CAST(canon_id AS VARCHAR), 8, '0')
      |                 || '>' END AS refers_to,
      |       'shared payload #' || CAST(cls AS VARCHAR) AS text
      |FROM src JOIN canon USING (cls)""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_rvst_q").toString
    graft.sources.WarcIO.warcDedupSave(
      documents(s, d).select(
        concat(lit("https://example.org/doc/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:doc:"),
          lpad(col("doc_id").cast("string"), 8, "0"),
          lit(">")).as("record_id"),
        lit("text/plain; charset=utf-8").as("http_content_type"),
        encode(concat(lit("shared payload #"),
          (col("doc_id") % 41).cast("string")), "UTF-8").as("payload"))
        .repartition(8),
      tmp)
    val raw = s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type").isin("response", "revisit"))
    val expanded = graft.sources.WarcIO.expandRevisits(raw)
      .select(col("record_id"),
        decode(col("payload"), "UTF-8").as("text"))
    raw.select(col("record_id"), col("target_uri"),
      col("warc_type").as("stored_type"), col("refers_to"))
      .join(expanded, "record_id")
      .select(col("target_uri"), col("stored_type"), col("refers_to"),
        col("text"))
  }

  /** CROSS-ARCHIVE dedup via the `_cdx` digest index, HASH-CERTIFIED —
    * the continual-crawl two-batch story as one registry query: batch 0
    * (even doc ids) dedups internally, batch 1 (odd ids) passes
    * batch 0's sidecar as `priorIndex`, so any payload batch 0 ever
    * stored becomes a cross-archive `revisit` pointing at batch 0's
    * canonical record. The oracle restates the whole two-phase
    * canonical choice closed-form: a class's canonical is its minimum
    * EVEN doc id when one exists (batch 0 saw the payload first),
    * otherwise its minimum odd id — and every non-canonical capture's
    * refers_to pointer and rematerialized text follow from it. Reading
    * back is ONE glob scan over both archives + [[graft.sources.WarcIO
    * .expandRevisits]], whose unique-canonical join resolves referents
    * across archive directories. */
  val qS23CrossBatchDedup = Q(
    "q_s23_crossbatch_dedup",
    """WITH src AS (SELECT doc_id, doc_id % 29 AS cls FROM documents),
      |     canon AS (SELECT cls,
      |         coalesce(min(CASE WHEN doc_id % 2 = 0 THEN doc_id END),
      |                  min(doc_id)) AS canon_id
      |       FROM src GROUP BY cls)
      |SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CASE WHEN doc_id = canon_id THEN 'response'
      |            ELSE 'revisit' END AS stored_type,
      |       CASE WHEN doc_id = canon_id THEN CAST(NULL AS VARCHAR)
      |            ELSE '<urn:graft:doc:'
      |                 || lpad(CAST(canon_id AS VARCHAR), 8, '0')
      |                 || '>' END AS refers_to,
      |       'shared payload #' || CAST(cls AS VARCHAR) AS text
      |FROM src JOIN canon USING (cls)""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_xbat_q").toString
    val captures = documents(s, d).select(
      col("doc_id"),
      concat(lit("https://example.org/doc/"),
        col("doc_id").cast("string")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("<urn:graft:doc:"),
        lpad(col("doc_id").cast("string"), 8, "0"),
        lit(">")).as("record_id"),
      lit("text/plain; charset=utf-8").as("http_content_type"),
      encode(concat(lit("shared payload #"),
        (col("doc_id") % 29).cast("string")), "UTF-8").as("payload"))
    graft.sources.WarcIO.warcDedupSave(
      captures.filter(col("doc_id") % 2 === 0).repartition(4),
      s"$tmp/batch=0")
    graft.sources.WarcIO.warcDedupSave(
      captures.filter(col("doc_id") % 2 === 1).repartition(4),
      s"$tmp/batch=1",
      priorIndex = Some(s.read.parquet(s"$tmp/batch=0/_cdx")
        .filter(col("warc_type") === "response")))
    val raw = s.read.format("graft-warc").load(s"$tmp/batch=*")
      .filter(col("warc_type").isin("response", "revisit"))
    val expanded = graft.sources.WarcIO.expandRevisits(raw)
      .select(col("record_id"),
        decode(col("payload"), "UTF-8").as("text"))
    raw.select(col("record_id"), col("target_uri"),
      col("warc_type").as("stored_type"), col("refers_to"))
      .join(expanded, "record_id")
      .select(col("target_uri"), col("stored_type"), col("refers_to"),
        col("text"))
  }

  /** Conditional-GET re-crawl (ISO 28500 §6.7.1 `server-not-modified`
    * revisits), HASH-CERTIFIED — cycle 0 archives every page in full;
    * cycle 1's conditional fetches get `304` for every third page
    * (archived as a revisit pointing at cycle 0's capture of the SAME
    * URI via the `_cdx` index, no payload stored) and a changed `200`
    * body for the rest. Reading both cycles through one glob +
    * [[graft.sources.WarcIO.expandRevisits]] must show cycle 1 with
    * the 304s' ORIGINAL text rematerialized from cycle 0, their 304
    * status preserved (the honest capture), and the re-fetched pages'
    * new bodies — all restated closed-form. */
  val qS24NotModified = Q(
    "q_s24_not_modified",
    """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CASE WHEN doc_id % 3 = 0 THEN 'revisit'
      |            ELSE 'response' END AS stored_type,
      |       CAST(CASE WHEN doc_id % 3 = 0 THEN 304 ELSE 200 END
      |            AS INTEGER) AS http_status,
      |       CASE WHEN doc_id % 3 = 0 THEN text
      |            ELSE 'v2 ' || text END AS text
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_304_q").toString
    val docs = documents(s, d)
    def base(prefix: String) = docs.select(
      concat(lit("https://example.org/doc/"),
        col("doc_id").cast("string")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit(s"<$prefix:"), col("doc_id").cast("string"),
        lit(">")).as("record_id"),
      lit("text/plain; charset=utf-8").as("http_content_type"),
      col("doc_id"), col("text"))
    graft.sources.WarcIO.warcSave(
      base("urn:c0").withColumn("payload",
        encode(col("text"), "UTF-8")).repartition(4),
      s"$tmp/cycle=0")
    graft.sources.WarcIO.warcNotModifiedSave(
      base("urn:c1")
        .withColumn("http_status",
          when(col("doc_id") % 3 === 0, 304).otherwise(200))
        .withColumn("payload",
          when(col("doc_id") % 3 === 0, lit(Array.empty[Byte]))
            .otherwise(encode(concat(lit("v2 "), col("text")), "UTF-8")))
        .repartition(4),
      s"$tmp/cycle=1",
      priorIndex = s.read.parquet(s"$tmp/cycle=0/_cdx")
        .filter(col("warc_type") === "response"))
    val raw = s.read.format("graft-warc").load(s"$tmp/cycle=*")
      .filter(col("warc_type").isin("response", "revisit"))
    val expanded = graft.sources.WarcIO.expandRevisits(raw)
      .select(col("record_id"), col("http_status"),
        decode(col("payload"), "UTF-8").as("text"))
    raw.select(col("record_id"), col("target_uri"),
      col("warc_type").as("stored_type"))
      .join(expanded, "record_id")
      .filter(col("record_id").startsWith("<urn:c1:"))
      .select(col("target_uri"), col("stored_type"), col("http_status"),
        col("text"))
  }

  /** WAT metadata archival, HASH-CERTIFIED — the third member of the
    * public-crawl format triad (WARC pages / WAT metadata / WET text,
    * the other two certified by q_s16/q_s17): per page one `metadata`
    * record whose JSON payload packs the status and the page's
    * RESOLVED outlink array ([[graft.operators.Outlinks.pageLinks]] —
    * one RFC 3986 kernel call per page, document order), with
    * WARC-Refers-To naming the page's archive record. Read back
    * through `graft-warc`, the JSON fields and both resolved links are
    * restated closed-form — pinning the metadata framing, the
    * refers_to passthrough, and to_json/get_json_object round-trip
    * fidelity. */
  val qS25WatMetadata = Q(
    "q_s25_wat_metadata",
    """SELECT 'https://crawl.example/p' || CAST(doc_id AS VARCHAR)
      |         || '.html' AS target_uri,
      |       '<urn:resp:' || CAST(doc_id AS VARCHAR) || '>' AS refers_to,
      |       CAST(200 AS INTEGER) AS status,
      |       'https://crawl.example/l/' || CAST(doc_id % 5 AS VARCHAR)
      |         AS link0,
      |       'https://e.example/x/' || CAST(doc_id % 7 AS VARCHAR)
      |         AS link1
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val tmp = java.nio.file.Files.createTempDirectory("graft_wat_q").toString
    val uriC = concat(lit("https://crawl.example/p"),
      col("doc_id").cast("string"), lit(".html"))
    val page = concat(
      lit("<html><body><a href=\"/l/"), (col("doc_id") % 5).cast("string"),
      lit("\">a</a><a href=\"https://e.example/x/"),
      (col("doc_id") % 7).cast("string"),
      lit("\">b</a></body></html>"))
    graft.sources.WarcIO.watSave(
      documents(s, d).select(
        uriC.as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:wat:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        to_json(struct(lit(200).as("status"),
          Outlinks.pageLinks(page, uriC).as("links"))).as("metadata"),
        concat(lit("<urn:resp:"), col("doc_id").cast("string"),
          lit(">")).as("refers"))
        .repartition(8),
      tmp, refersTo = Some("refers"))
    val json = decode(col("payload"), "UTF-8")
    s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type") === "metadata")
      .select(col("target_uri"), col("refers_to"),
        get_json_object(json, "$.status").cast("int").as("status"),
        get_json_object(json, "$.links[0]").as("link0"),
        get_json_object(json, "$.links[1]").as("link1"))
  }

  /** Typed WAT read-back, HASH-CERTIFIED — q_s25 writes WAT metadata
    * and restates it with hand-written `get_json_object` paths; this
    * closes the loop at the API level: [[graft.sources.WarcIO
    * .watPayload]] packs the PINNED envelope (status, content type,
    * `<title>`, resolved links) and [[WarcIO.watEntries]] parses it
    * back to typed top-level columns with no caller-side schema. Also
    * certifies [[graft.operators.Outlinks.htmlTitle]] (entity decode +
    * whitespace collapse) field-for-field against the closed form. */
  val qS28WatEntries = Q(
    "q_s28_wat_entries",
    """SELECT 'https://crawl.example/w' || CAST(doc_id AS VARCHAR)
      |         || '.html' AS target_uri,
      |       '<urn:wresp:' || CAST(doc_id AS VARCHAR) || '>' AS refers_to,
      |       CASE WHEN doc_id % 7 = 0 THEN 404
      |            ELSE 200 END AS status,
      |       'text/html' AS content_type,
      |       'Doc ' || CAST(doc_id AS VARCHAR) || ' & more' AS title,
      |       'https://crawl.example/n/' || CAST(doc_id % 11 AS VARCHAR)
      |         AS link0,
      |       CAST(1 AS INTEGER) AS n_links
      |FROM documents""".stripMargin) { (s, d) =>
    import graft.operators.Outlinks
    val tmp = java.nio.file.Files.createTempDirectory("graft_wat2_q").toString
    val uriC = concat(lit("https://crawl.example/w"),
      col("doc_id").cast("string"), lit(".html"))
    val page = concat(
      lit("<html><head><title>  Doc "), col("doc_id").cast("string"),
      lit(" &amp;\n more </title></head><body><a href=\"/n/"),
      (col("doc_id") % 11).cast("string"),
      lit("\">n</a></body></html>"))
    graft.sources.WarcIO.watSave(
      documents(s, d).select(
        uriC.as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:wat2:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        graft.sources.WarcIO.watPayload(
          when(col("doc_id") % 7 === 0, 404).otherwise(200),
          lit("text/html"), Outlinks.htmlTitle(page),
          Outlinks.pageLinks(page, uriC)).as("metadata"),
        concat(lit("<urn:wresp:"), col("doc_id").cast("string"),
          lit(">")).as("refers"))
        .repartition(8),
      tmp, refersTo = Some("refers"))
    graft.sources.WarcIO.watEntries(
      s.read.format("graft-warc").load(tmp))
      .select(col("target_uri"), col("refers_to"), col("status"),
        col("content_type"), col("title"),
        col("links").getItem(0).as("link0"),
        size(col("links")).as("n_links"))
  }

  /** CDX `payload_digest` point lookup, HASH-CERTIFIED — the dedup
    * tier's natural forensic lookup (fetch-canonical-by-digest: the
    * dedup archive stores ONE full response per digest, so the digest
    * IS the content key). A digest EqualTo/In filter rides the same
    * `_cdx` extent machinery as q_s19's uri lookup — the scan seeks
    * just the matched records' byte extents instead of scanning the
    * archive, conjoined with the `warc_type` narrowing. Payloads are
    * doc-unique here, so the digest set is equivalent to the closed-
    * form doc_id predicate the oracle recomputes (DuckDB has no sha1 —
    * the digest column itself stays out of the projection; the framing
    * and extent fidelity are what the hash certifies). */
  val qS27DigestPushdown = Q(
    "q_s27_digest_pushdown",
    """SELECT 'https://example.org/dg/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       'doc ' || CAST(doc_id AS VARCHAR) || ': ' || text AS text
      |FROM documents WHERE doc_id % 41 = 7""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_dgp_q").toString
    val docs = documents(s, d).select(
      concat(lit("https://example.org/dg/"),
        col("doc_id").cast("string")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("<urn:graft:dg:"), col("doc_id").cast("string"),
        lit(">")).as("record_id"),
      lit("text/html; charset=utf-8").as("http_content_type"),
      encode(concat(lit("doc "), col("doc_id").cast("string"),
        lit(": "), col("text")), "UTF-8").as("payload"),
      col("doc_id"))
    graft.sources.WarcIO.warcDedupSave(
      docs.drop("doc_id").repartition(8), tmp)
    val digests = docs.filter(col("doc_id") % 41 === 7)
      .select(concat(lit("sha1:"), upper(sha1(col("payload")))))
      .collect().map(_.getString(0))
    s.read.format("graft-warc").load(tmp)
      .filter(col("payload_digest").isin(digests.toSeq: _*)
        && col("warc_type") === "response")
      .select(col("target_uri"), decode(col("payload"), "UTF-8").as("text"))
  }

  /** WAT archive as a LINK-GRAPH SOURCE, HASH-CERTIFIED — the workflow
    * public crawls actually run: graph work reads the WAT sidecar, not
    * the page archive. Pages on 19 source hosts write WAT metadata
    * (links packed via [[graft.sources.WarcIO.watPayload]]), the
    * archive reads back typed ([[WarcIO.watEntries]]), links explode,
    * and [[graft.operators.Outlinks.hostGraph]] emits the distinct
    * cross-host edges — certified against the closed-form edge set,
    * self-links (doc_id%19 == doc_id%13 collisions) dropped by the
    * graph derivation. */
  val qS29WatHostGraph = Q(
    "q_s29_wat_host_graph",
    """SELECT DISTINCT
      |       'w' || CAST(doc_id % 19 AS VARCHAR) || '.example' AS src,
      |       'w' || CAST(doc_id % 13 AS VARCHAR) || '.example' AS dst
      |FROM documents WHERE doc_id % 19 <> doc_id % 13""".stripMargin) {
    (s, d) =>
    import graft.operators.Outlinks
    val tmp = java.nio.file.Files.createTempDirectory("graft_watg_q")
      .toString
    val uriC = concat(lit("https://w"), (col("doc_id") % 19).cast("string"),
      lit(".example/p/"), col("doc_id").cast("string"))
    val page = concat(lit("<a href=\"https://w"),
      (col("doc_id") % 13).cast("string"), lit(".example/t/"),
      col("doc_id").cast("string"), lit("\">t</a>"))
    graft.sources.WarcIO.watSave(
      documents(s, d).select(
        uriC.as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:watg:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        graft.sources.WarcIO.watPayload(
          lit(200), lit("text/html"), Outlinks.htmlTitle(page),
          Outlinks.pageLinks(page, uriC)).as("metadata"))
        .repartition(8),
      tmp)
    val entries = graft.sources.WarcIO.watEntries(
      s.read.format("graft-warc").load(tmp))
    Outlinks.hostGraph(
      entries.select(col("target_uri"),
        explode(col("links")).as("link")),
      "target_uri", "link")
  }

  /** Typed WET read-back, HASH-CERTIFIED — the symmetric helper to
    * q_s28's WAT side: q_s17 certifies the `conversion` round trip
    * through raw `payload` columns; this certifies [[graft.sources
    * .WarcIO.wetEntries]], the typed surface the text tier consumes
    * `wetSave` output through with no hand-written parsing. Every
    * envelope field (uri, date, record id) and the UTF-8 payload
    * decode (non-ASCII suffix appended to pin the octet path)
    * round-trips field-for-field. */
  val qS30WetEntries = Q(
    "q_s30_wet_entries",
    """SELECT 'https://example.org/wet/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       '2026-01-05T06:07:08Z' AS warc_date,
      |       '<urn:graft:wet30:' || CAST(doc_id AS VARCHAR) || '>'
      |         AS record_id,
      |       text || ' — résumé ✓' AS text
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_wet30_q")
      .toString
    graft.sources.WarcIO.wetSave(
      documents(s, d).select(
        concat(lit("https://example.org/wet/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-05T06:07:08Z").as("warc_date"),
        concat(lit("<urn:graft:wet30:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        concat(col("text"), lit(" — résumé ✓")).as("text"))
        .repartition(8),
      tmp)
    graft.sources.WarcIO.wetEntries(
      s.read.format("graft-warc").load(tmp))
  }

  /** `resource` record round trip, HASH-CERTIFIED — the direct-payload
    * record type (ISO 28500 §6.5, no HTTP envelope): fetched assets
    * archive with their own Content-Type at the ENVELOPE level and the
    * raw bytes as the whole content block. Certifies the envelope
    * content_type surfacing (per-row, not the application/http
    * constant), the null http_status (no status line to parse), and
    * byte-exact payload framing. */
  val qS26ResourceRoundTrip = Q(
    "q_s26_resource_roundtrip",
    """SELECT 'https://example.org/asset/' || CAST(doc_id AS VARCHAR)
      |         AS target_uri,
      |       CASE WHEN doc_id % 2 = 0 THEN 'image/png'
      |            ELSE 'application/javascript' END AS content_type,
      |       CAST(NULL AS INTEGER) AS http_status,
      |       text,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS content_length
      |FROM documents""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_rsrc_q").toString
    graft.sources.WarcIO.resourceSave(
      documents(s, d).select(
        concat(lit("https://example.org/asset/"),
          col("doc_id").cast("string")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:graft:asset:"), col("doc_id").cast("string"),
          lit(">")).as("record_id"),
        when(col("doc_id") % 2 === 0, "image/png")
          .otherwise("application/javascript").as("content_type"),
        encode(col("text"), "UTF-8").as("payload"))
        .repartition(8),
      tmp)
    s.read.format("graft-warc").load(tmp)
      .filter(col("warc_type") === "resource")
      .select(col("target_uri"), col("content_type"), col("http_status"),
        decode(col("payload"), "UTF-8").as("text"),
        col("content_length"))
  }

  val all: Seq[Q] = Seq(
    qS16WarcRoundTrip, qS17WetRoundTrip, qS18WarcFetch, qS19CdxPushdown,
    qS20RequestPairing, qS16zZstdWarc, qS21StatusFidelity, qS22RevisitDedup,
    qS23CrossBatchDedup, qS24NotModified, qS25WatMetadata,
    qS26ResourceRoundTrip, qS27DigestPushdown, qS28WatEntries,
    qS29WatHostGraph, qS30WetEntries,
    qS14Profile, qA11GroupingSets, qA12Histogram,
    qP7MapExplode, qP8Unpivot, qF8ArrayFuncs,
    qJ8NullSafeJoin, qP9ExplodeOuter, qS15ZstdRoundTrip, qO3NullOrdering,
    qS7CsvRoundTrip, qS8OrcRoundTrip,
    qU1Union, qU2Intersect, qU3Except,
    qA3Rollup, qA4Cube, qA6StrAgg,
    qF5Strings, qF6Case, qF7DateArith,
    qA5Approx, qA13KmvDistinct, qA14KmvGroups,
    qK1SaltedAgg, qK2BloomJoin, qS9BucketedJoin,
    qS10JsonRoundTrip, qS11Partitioned, qS12Compact, qZ1ZOrder, qZ2ZOrder3,
    qZ3Hilbert, qZ4Hilbert3, qZ5Hilbert4, qS13SchemaMerge, qJ5FullOuter,
    qJ6Cross, qJ7Upsert)
}
