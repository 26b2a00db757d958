package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-probe data generator: writes an N×-scaled copy of a testdata
  * directory by unioning KEY-SHIFTED copies of each table, so fact/dim
  * join cardinalities scale realistically (every copy's lineitem rows
  * still join copy-local orders/parts/suppliers; documents/embeddings/
  * events get disjoint id spaces and copy-tagged text so dedup/token
  * statistics grow instead of collapsing onto one duplicate class).
  *
  * This data is for BENCH SCALING PROBES ONLY — it has no DuckDB
  * oracle and is never read by Verify or the driver; the declared
  * correctness surface stays the driver-generated `/root/testdata`.
  *
  * `sbt "runMain graft.ScaleSlice /root/testdata/sf0.1 /tmp/sfx1 10"`
  */
object ScaleSlice {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleSlice <srcDir> <dstDir> <n>")
    val Array(src, dst, nStr) = args
    val n = nStr.toInt
    require(n >= 1 && n <= 100, s"n in [1,100]: $n")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Shift = 100000000L // far above any sf0.1 key
    // long key columns shifted per copy; every other column rides along
    val keyCols: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "nation" -> Seq(), // dimensions copy once
      "region" -> Seq())
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out =
        if (keys.isEmpty) base
        else (0 until n).map { i =>
          val shifted = keys.foldLeft(base)((df, k) =>
            df.withColumn(k, col(k) + lit(i * Shift)))
          // copy-tag text so scaled dedup/shingle work grows instead of
          // collapsing onto n-way exact duplicates
          if (t == "documents" && i > 0)
            shifted.withColumn("text",
              concat(lit(s"copy$i "), col("text")))
          else shifted
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scale] $t x${if (keys.isEmpty) 1 else n}")
    }
    spark.stop()
  }
}
