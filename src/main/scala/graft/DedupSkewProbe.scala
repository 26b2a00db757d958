package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r22, VERDICT item 7): profile
  * [[graft.operators.Dedup.minHashLshPairs]]'s candidate/verify joins
  * under synthetic skew — sf0.1 documents x10 (disjoint-token copies,
  * linear growth) PLUS a planted hot near-duplicate template cluster
  * whose members share most shingles, i.e. the worst realistic LSH
  * bucket shape after exact dedup has collapsed identical texts.
  * Prints the bucket-size distribution (the candidate join's per-key
  * fan-out) and wall times, so "widen salting" is decided on numbers.
  */
object DedupSkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val hot = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // 10 disjoint-token copies (the ScaleProbeSpec construction: no
    // cross-copy shingles) = 50k docs of linear work
    val big = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"c$i"), w))).as("text")))
      .reduce(_ unionByName _)
    // hot cluster: `hot` docs sharing one 60-token template with a
    // 3-token unique tail — ~95% shared shingles, all in one LSH
    // neighborhood (post-exact-dedup near-dup pile-up)
    val template = (1 to 60).map(j => s"tpl$j").mkString(" ")
    val hotDocs = spark.range(hot.toLong)
      .select((col("id") + 90000000L).as("doc_id"),
        concat(lit(template + " "), lit("tail"), col("id").cast("string"),
          lit(" x"), (col("id") % 7).cast("string")).as("text"))
    val corpus = big.unionByName(hotDocs).localCheckpoint()
    println(s"[skew] corpus rows: ${corpus.count()}")

    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup
      .minHashLshPairs(corpus, "doc_id", "text", 0.6)
    val n = pairs.queryExecution.toRdd.count()
    println(f"[skew] pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")

    // bucket-size distribution: the candidate join's per-key fan-out
    val buckets = graft.operators.Dedup
      .bandedBuckets(corpus, "doc_id", "text")
      .groupBy("band", "bh").count()
      .select(col("count")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted(Ordering[Long].reverse)
    val tot = buckets.sum
    val pairsPerBucket = buckets.map(c => c * (c - 1) / 2)
    println(s"[skew] buckets=${buckets.length} rows=$tot " +
      s"max=${buckets.head} p99=${buckets(buckets.length / 100)} " +
      s"median=${buckets(buckets.length / 2)}")
    println(s"[skew] candidate pairs: total=${pairsPerBucket.sum} " +
      s"from top bucket=${pairsPerBucket.head} " +
      s"(top-32 share=${
        pairsPerBucket.take(32).sum.toDouble / pairsPerBucket.sum})")
    spark.stop()
  }
}
