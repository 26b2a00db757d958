package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LegacyFileListOffset, SeenFileLog, EpochStreamOffset}

/** Unit coverage for the compacted seen-file log behind the graft-fhir
  * stream offsets: epoch arithmetic, restart reload, compaction
  * subsuming history, and legacy full-list offset migration. */
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

  test("advance tags epochs; filesIn slices exactly; reload preserves") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    assert(log.maxEpoch == 0)
    assert(log.advance(Seq("a", "b")) == 1)
    assert(log.advance(Seq("c")) == 2)
    assert(log.filesIn(0, 2) == Seq("a", "b", "c"))
    assert(log.filesIn(1, 2) == Seq("c"))
    assert(log.filesIn(2, 2) == Seq.empty)
    assert(log.contains("a") && !log.contains("z"))
    // a fresh instance over the same dir sees identical state (restart)
    val re = new SeenFileLog(d, conf)
    assert(re.maxEpoch == 2)
    assert(re.filesIn(0, 2) == Seq("a", "b", "c"))
    assert(re.filesIn(1, 2) == Seq("c"))
  }

  test("compaction folds history into one file and keeps epoch tags") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    (1 to SeenFileLog.CompactInterval + 3)
      .foreach(i => log.advance(Seq(f"f$i%03d")))
    val names = new java.io.File(d.toString).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".compact")) == 1)
    assert(names.count(_.endsWith(".log")) == 3,
      s"post-compact tail should be 3 logs, got ${names.mkString(", ")}")
    // reload reads compact + tail; per-epoch slices stay exact
    val re = new SeenFileLog(d, conf)
    assert(re.maxEpoch == SeenFileLog.CompactInterval + 3)
    assert(re.filesIn(4, 6) == Seq("f005", "f006"))
    assert(re.allUpTo(2) == Set("f001", "f002"))
  }

  test("legacy migration is durable, idempotent, and epoch-0-tagged") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    log.migrate(Seq("old1", "old2"))
    log.migrate(Seq("old2", "old3")) // overlap: only old3 is new
    assert(log.maxEpoch == 0)
    assert(log.allUpTo(0) == Set("old1", "old2", "old3"))
    val e = log.advance(Seq("new1"))
    assert(e == 1)
    // migrated files are NOT part of any positive epoch's batch
    assert(log.filesIn(0, 1) == Seq("new1"))
    // durability: a restart still knows the migrated set
    val re = new SeenFileLog(d, conf)
    assert(re.contains("old1") && re.contains("old3"))
    assert(re.filesIn(0, 1) == Seq("new1"))
    // compaction absorbs the migration files
    (2 to SeenFileLog.CompactInterval).foreach(i =>
      re.advance(Seq(s"new$i")))
    val names = new java.io.File(d.toString).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".migrated")),
      s"compaction should remove migration files: ${names.mkString(", ")}")
    val re2 = new SeenFileLog(d, conf)
    assert(re2.contains("old1"), "migrated lines must survive compaction")
    assert(re2.filesIn(0, 1) == Seq("new1"))
  }

  test("a crashed tmp write is ignored on reload") {
    val d = tmpDir()
    val log = new SeenFileLog(d, conf)
    log.advance(Seq("a"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d.toString, ".00000000000000000002.log.tmp"),
      "2\tghost\n".getBytes)
    val re = new SeenFileLog(d, conf)
    assert(re.maxEpoch == 1 && !re.contains("ghost"))
  }
}
