package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** The upsert sink's incremental-state story: state is hash-partitioned
  * into buckets and manifest-committed, so a merge rewrites ONLY the
  * buckets its batch touches — the cost curve must track touched-bucket
  * count, not total state. [[Streams.compactUpsertState]] must fold the
  * live buckets into a fresh version with byte-identical contents, the
  * crash-recovery fallback (previous manifest) intact, and further
  * merges composing on top. */
class UpsertCompactionSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parquetFilesRec(dir: String): Int = {
    val hfs = fs(dir)
    val it = hfs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var n = 0
    while (it.hasNext)
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  private def subdirs(dir: String, pat: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val hfs = fs(dir)
    if (!hfs.exists(p)) Nil
    else hfs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.matches(pat)).sorted
  }

  private def versionDirs(stateDir: String): Seq[String] =
    subdirs(stateDir, "v\\d{5}")

  test("merges rewrite touched buckets only; compaction preserves state") {
    import spark.implicits._
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_upsert_compact").toString
    val keys = Seq("k")
    val nBatches = 6
    val batchRows = 4000
    // overlapping key space: each batch updates half the live keys and
    // introduces new ones — the standard CDC shape
    def batch(b: Int) = spark.range(batchRows)
      .select((col("id") + b * batchRows / 2).as("k"),
        lit(b.toLong).as("ver"),
        concat(lit(s"payload_b${b}_"), col("id")).as("v"))
    val curve = (0 until nBatches).map { b =>
      val t0 = System.nanoTime()
      Streams.upsertBatch(batch(b).toDF(), stateDir, keys, "ver")
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = Streams.readUpsertState(spark, stateDir).count()
      (b, rows, secs)
    }
    curve.foreach { case (b, rows, secs) =>
      println(f"upsert batch $b: state=$rows%6d rows, $secs%.2f s")
    }
    assert(curve.last._2 > curve.head._2)
    // reference state: every key's highest-version row
    def expected(): Set[(Long, Long, String)] =
      (0 until nBatches).flatMap { b =>
        (0 until batchRows).map(i =>
          (i.toLong + b * batchRows / 2, b.toLong, s"payload_b${b}_$i"))
      }.groupBy(_._1).map(_._2.maxBy(_._2)).toSet
    def state(): Set[(Long, Long, String)] =
      Streams.readUpsertState(spark, stateDir)
        .select("k", "ver", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = expected()
    assert(state() == want)

    // THE incremental claim: a single-key batch rewrites exactly one
    // bucket, and the new version holds just that bucket's rows
    val totalRows = want.size.toLong
    Streams.upsertBatch(
      Seq((0L, 99L, "fresh")).toDF("k", "ver", "v"),
      stateDir, keys, "ver")
    val vLatest = s"$stateDir/${versionDirs(stateDir).last}"
    val touchedBuckets = subdirs(vLatest, "__graft_p=\\d+")
    assert(touchedBuckets.length == 1,
      s"single-key merge must rewrite exactly one bucket: $touchedBuckets")
    val vRows = spark.read.parquet(s"$vLatest/${touchedBuckets.head}").count()
    assert(vRows < totalRows / 4,
      s"single-key merge rewrote $vRows of $totalRows rows — " +
        "cost must track the touched bucket, not total state")
    val wantFresh = want.filterNot(_._1 == 0L) + ((0L, 99L, "fresh"))
    assert(state() == wantFresh)

    // crash window: a version dir without a manifest is invisible
    val orphan = s"$stateDir/v99998"
    Seq((1L, 500L, "never-committed")).toDF("k", "ver", "v")
      .withColumn("__graft_p", lit(0))
      .write.partitionBy("__graft_p").parquet(orphan)
    assert(state() == wantFresh,
      "an uncommitted version dir must never be read")
    fs(stateDir).delete(new org.apache.hadoop.fs.Path(orphan), true)

    // compaction: identical state as a fresh fully-repointed version
    val filesBefore = parquetFilesRec(vLatest)
    val filesAfter = Streams.compactUpsertState(
      spark, stateDir, targetRecordsPerFile = 1000000L)
    val dirs = versionDirs(stateDir)
    val vCompact = s"$stateDir/${dirs.last}"
    val liveBuckets = subdirs(vCompact, "__graft_p=\\d+").length
    assert(filesAfter == liveBuckets.toLong,
      s"1M records/file must yield one file per bucket " +
        s"($filesAfter vs $liveBuckets buckets)")
    assert(state() == wantFresh, "compaction changed the visible state")
    // prune released every version the two retained manifests don't
    // reference: after compaction that is the compacted version plus
    // whatever the previous manifest still points at
    val manifests = subdirs(s"$stateDir/_manifests", "m\\d{5}\\.json")
    assert(manifests.length == 2,
      s"prune must keep exactly two manifests: $manifests")

    // and merges compose on the compacted state
    Streams.upsertBatch(
      Seq((0L, 100L, "freshest")).toDF("k", "ver", "v"),
      stateDir, keys, "ver")
    val after = state()
    assert(after((0L, 100L, "freshest")))
    assert(after.size == wantFresh.size)
    assert((after - ((0L, 100L, "freshest")))
      == wantFresh.filterNot(_._1 == 0L))
  }

  test("fresh-checkpoint replay merges instead of clobbering state") {
    import spark.implicits._
    // versions are manifest-chained, not batch-id-derived: re-merging
    // rows that are already in the state is a no-op on contents
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_upsert_replay").toString
    val rows = Seq((1L, 1L, "a"), (2L, 1L, "b"))
    Streams.upsertBatch(rows.toDF("k", "ver", "v"), stateDir, Seq("k"), "ver")
    Streams.upsertBatch(rows.toDF("k", "ver", "v"), stateDir, Seq("k"), "ver")
    val got = Streams.readUpsertState(spark, stateDir)
      .select("k", "ver", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == rows.toSet)
  }
}
