package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LegacyFileListOffset, SeenFileLog, EpochStreamOffset}

/** Unit coverage for the compacted seen-file log behind the graft-fhir
  * and graft-warc stream offsets: epoch arithmetic, restart reload,
  * compaction subsuming history, legacy full-list offset migration,
  * and the r16 size column that makes micro-batch (re)planning
  * stat-free. */
class SeenFileLogSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpDir() = new Path(
    java.nio.file.Files.createTempDirectory("graft_seenlog").toString)

  test("offset JSON: epoch form round-trips; legacy array form parses") {
    assert(EpochStreamOffset(7).json() == """{"epoch":7}""")
    assert(EpochStreamOffset.parse("""{"epoch":7}""") == EpochStreamOffset(7))
    val legacy = EpochStreamOffset.parse("""["file:/a/b.json","file:/a/c.json"]""")
    assert(legacy == LegacyFileListOffset(
      Seq("file:/a/b.json", "file:/a/c.json")))
    // legacy offsets re-serialize unchanged (the WAL may re-write them)
    assert(EpochStreamOffset.parse(legacy.json()) == legacy)
  }

  test("advance tags epochs; filesIn slices exactly with sizes; reload preserves") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    assert(log.maxEpoch == 0)
    assert(log.advance(Seq("a" -> 10L, "b" -> 20L)) == 1)
    assert(log.advance(Seq("c" -> 30L)) == 2)
    assert(log.filesIn(0, 2) == Seq("a" -> 10L, "b" -> 20L, "c" -> 30L))
    assert(log.filesIn(1, 2) == Seq("c" -> 30L))
    assert(log.filesIn(2, 2) == Seq.empty)
    assert(log.contains("a") && !log.contains("z"))
    // a fresh instance over the same dir sees identical state INCLUDING
    // sizes — that is what makes a checkpoint-replayed batch's
    // bin-packing stat-free (no per-file getFileStatus on the driver)
    val re = new SeenFileLog(d, conf)
    assert(re.maxEpoch == 2)
    assert(re.filesIn(0, 2) == Seq("a" -> 10L, "b" -> 20L, "c" -> 30L))
    assert(re.filesIn(1, 2) == Seq("c" -> 30L))
  }

  test("legacy 2-field log lines parse with unknown size; withSizes re-stats only those") {
    val d = tmpDir()
    // hand-write a pre-r16 log file: `epoch TAB path`, no size column
    val real = java.nio.file.Files.createTempFile("graft_seen_real", ".dat")
    java.nio.file.Files.write(real, new Array[Byte](123))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.toString, "00000000000000000001.log"),
      s"1\tfile:$real\n1\tfile:${real}2\n".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${real}2"), new Array[Byte](7))
    val log = new SeenFileLog(d, conf)
    val in = log.filesIn(0, 1)
    assert(in.map(_._1) == Seq(s"file:$real", s"file:${real}2"))
    assert(in.forall(_._2 == -1L), "legacy lines carry unknown size")
    // withSizes resolves the -1s against the filesystem
    val sized = graft.sources.SourceFiles.withSizes(in, d.toString, conf)
    assert(sized.map(_._2) == Seq(123L, 7L))
    // entries that already carry a size pass through with NO stat —
    // a vanished file would throw if it were statted
    val phantom = Seq(("file:/definitely/not/there.bin", 55L))
    assert(graft.sources.SourceFiles.withSizes(phantom, d.toString, conf)
      == phantom)
    // mixed new-format lines written after a legacy reload keep sizes
    log.advance(Seq("n1" -> 42L))
    val re = new SeenFileLog(d, conf)
    assert(re.filesIn(1, 2) == Seq("n1" -> 42L))
  }

  test("compaction folds history into one file and keeps epoch tags + sizes") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    (1 to SeenFileLog.CompactInterval + 3)
      .foreach(i => log.advance(Seq(f"f$i%03d" -> (i * 100L))))
    val names = new java.io.File(d.toString).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".compact")) == 1)
    assert(names.count(_.endsWith(".log")) == 3,
      s"post-compact tail should be 3 logs, got ${names.mkString(", ")}")
    // reload reads compact + tail; per-epoch slices stay exact
    val re = new SeenFileLog(d, conf)
    assert(re.maxEpoch == SeenFileLog.CompactInterval + 3)
    assert(re.filesIn(4, 6) == Seq("f005" -> 500L, "f006" -> 600L))
    assert(re.allUpTo(2) == Set("f001", "f002"))
  }

  test("legacy migration is durable, idempotent, and epoch-0-tagged") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    log.migrate(Seq("old1", "old2"))
    log.migrate(Seq("old2", "old3")) // overlap: only old3 is new
    assert(log.maxEpoch == 0)
    assert(log.allUpTo(0) == Set("old1", "old2", "old3"))
    val e = log.advance(Seq("new1" -> 11L))
    assert(e == 1)
    // migrated files are NOT part of any positive epoch's batch
    assert(log.filesIn(0, 1) == Seq("new1" -> 11L))
    // durability: a restart still knows the migrated set
    val re = new SeenFileLog(d, conf)
    assert(re.contains("old1") && re.contains("old3"))
    assert(re.filesIn(0, 1) == Seq("new1" -> 11L))
    // compaction absorbs the migration files
    (2 to SeenFileLog.CompactInterval).foreach(i =>
      re.advance(Seq(s"new$i" -> (i * 1L))))
    val names = new java.io.File(d.toString).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".migrated")),
      s"compaction should remove migration files: ${names.mkString(", ")}")
    val re2 = new SeenFileLog(d, conf)
    assert(re2.contains("old1"), "migrated lines must survive compaction")
    assert(re2.filesIn(0, 1) == Seq("new1" -> 11L))
  }

  test("a crashed tmp write is ignored on reload") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    log.advance(Seq("a" -> 1L))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.toString, ".00000000000000000002.log.tmp"),
      "2\t9\tghost\n".getBytes)
    val re = new SeenFileLog(d, conf)
    assert(re.maxEpoch == 1 && !re.contains("ghost"))
  }
}
