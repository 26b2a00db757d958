package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** The upsert sink's maintenance story: each merge rewrites full state
  * with the session's shuffle parallelism, so file counts drift with
  * batches, not data — [[Streams.compactUpsertState]] must fold the
  * current version into few files as a NEW committed version with
  * byte-identical contents, the crash-recovery fallback intact, and
  * further merges composing on top. The probe also documents the
  * full-state-rewrite cost curve over N batches (the honestly-stated
  * pre-table-format cost of the design). */
class UpsertCompactionSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def parquetFiles(dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  private def versionDirs(stateDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{5}")).sorted
  }

  test("cost curve over N batches; compaction preserves state exactly") {
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
    // state grows as new keys arrive — the rewrite cost scales with
    // STATE size, not batch size (the documented pre-table-format cost)
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
    val latestBefore = versionDirs(stateDir).last
    val filesBefore = parquetFiles(s"$stateDir/$latestBefore")
    // compact into one file, committed as the next version
    val filesAfter = Streams.compactUpsertState(
      spark, stateDir, targetRecordsPerFile = 1000000L)
    assert(filesAfter == 1L)
    val dirs = versionDirs(stateDir)
    assert(dirs.length == 2, s"prune must keep exactly two versions: $dirs")
    assert(dirs.last > latestBefore, "compaction must commit a NEW version")
    assert(parquetFiles(s"$stateDir/${dirs.last}") < filesBefore ||
      filesBefore == 1,
      s"compaction should shrink the file count ($filesBefore -> 1)")
    // the one claim that matters: identical state through the compaction
    assert(state() == want, "compaction changed the visible state")
    // and merges compose on the compacted state
    Streams.upsertBatch(
      Seq((0L, 99L, "fresh")).toDF("k", "ver", "v"),
      stateDir, keys, "ver")
    val after = state()
    assert(after((0L, 99L, "fresh")))
    assert(after.size == want.size)
    assert((after - ((0L, 99L, "fresh"))) == want.filterNot(_._1 == 0L))
  }
}
