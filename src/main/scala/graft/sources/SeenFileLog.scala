package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.connector.read.streaming

/** Offset for a seen-log-backed micro-batch stream ([[FhirMicroBatchStream]], [[WarcMicroBatchStream]]): one seen-log EPOCH — constant
  * size no matter how many files the stream has ever ingested. The file
  * sets live in the [[SeenFileLog]] under the source's checkpoint
  * directory; two epochs determine a batch's file set exactly (the
  * tagged lines in `(start, end]`), so a checkpoint-replayed batch
  * re-reads EXACTLY the same files — the property that makes restart
  * exactly-once. Replaces the unbounded full-file-list offset (every
  * offset JSON used to carry every path ever seen — O(total files) per
  * micro-batch at a million-file ADT feed); the legacy form is still
  * parsed for checkpoint compatibility ([[LegacyFileListOffset]]). */
private[graft] case class EpochStreamOffset(epoch: Long)
    extends streaming.Offset {
  override def json(): String = s"""{"epoch":$epoch}"""
}

/** Pre-r14 offset form: the full sorted file list. Never written
  * anymore — parsed so an old checkpoint restarts cleanly, its seen
  * set migrated into the log (epoch 0) on deserialization. */
private[graft] case class LegacyFileListOffset(files: Seq[String])
    extends streaming.Offset {
  override def json(): String =
    EpochStreamOffset.mapper.writeValueAsString(files.toArray)
}

private[graft] object EpochStreamOffset {
  private[sources] val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  def parse(json: String): streaming.Offset = {
    val t = json.trim
    if (t.startsWith("[")) LegacyFileListOffset(
      mapper.readValue(t, classOf[Array[String]]).toSeq)
    else EpochStreamOffset(mapper.readTree(t).get("epoch").asLong())
  }
}

/** Compacted seen-file log — the FileStreamSource metadata-log pattern,
  * kept under the source's checkpoint location so it shares the
  * checkpoint's durability and lineage. Epoch `N` lands as an atomic
  * (tmp + rename) `N.log` holding `epoch TAB path` lines for the files
  * FIRST seen at `N`; every [[SeenFileLog.CompactInterval]]-th
  * epoch lands as `N.compact` holding ALL tagged lines ≤ N, after which
  * older log files are deleted — so startup replay reads one compact
  * plus a bounded tail, and the offset each batch persists is just the
  * epoch number. Legacy full-list offsets migrate in as epoch-0 lines
  * (`0-K.migrated` files, idempotent by set-difference). */
private[graft] class SeenFileLog(
    dir: Path, hconf: org.apache.hadoop.conf.Configuration) {
  import SeenFileLog._

  private val fs = dir.getFileSystem(hconf)
  /** path → (epoch first seen, size in bytes) — insertion order
    * irrelevant; tags drive batch membership. Size rides in the log so
    * a replayed batch bin-packs WITHOUT re-statting every file on the
    * driver (a 100k-file backfill would otherwise be 100k sequential
    * namenode/object-store RPCs per replan); -1 marks a legacy line
    * whose size was never recorded (pre-r16 logs, migrated offsets). */
  private val seen = scala.collection.mutable.HashMap[String, (Long, Long)]()
  private var max = 0L

  if (!fs.exists(dir)) fs.mkdirs(dir)
  else {
    val names = fs.listStatus(dir).map(_.getPath.getName)
    val compacts = names.collect { case CompactName(e) => e.toLong }
    val latestC = if (compacts.nonEmpty) compacts.max else -1L
    val toRead = names.filter {
      case CompactName(e) => e.toLong == latestC
      case LogName(e) => e.toLong > latestC
      case MigratedName(_) => true // epoch-0 lines; compaction removes them
      case _ => false // tmp leftovers from a crashed write
    }.sorted
    toRead.foreach { n =>
      readLines(fs, new Path(dir, n)).foreach { case (e, sz, p) =>
        if (!seen.contains(p)) seen(p) = (e, sz)
        if (e > max) max = e
      }
    }
    val fileEpochs = names.collect {
      case CompactName(e) => e.toLong
      case LogName(e) => e.toLong
    }
    if (fileEpochs.nonEmpty) max = math.max(max, fileEpochs.max)
  }

  def maxEpoch: Long = max
  def contains(path: String): Boolean = seen.contains(path)

  /** Record `fresh` (path, size) pairs — none of which may be seen
    * already — as the next epoch; returns it. Compacting epochs fold
    * the whole seen set into one file and drop the older ones. */
  def advance(fresh: Seq[(String, Long)]): Long = {
    val e = max + 1
    val compact = e % CompactInterval == 0
    val lines: Seq[(Long, Long, String)] =
      if (compact)
        (seen.toSeq.map { case (p, (ep, sz)) => (ep, sz, p) } ++
          fresh.map { case (p, sz) => (e, sz, p) }).sortBy(_._1)
      else fresh.map { case (p, sz) => (e, sz, p) }
    val name = f"$e%020d." + (if (compact) "compact" else "log")
    writeAtomic(fs, dir, name, lines)
    if (compact) fs.listStatus(dir).map(_.getPath).foreach { p =>
      p.getName match {
        case CompactName(c) if c.toLong < e => fs.delete(p, false)
        case LogName(c) if c.toLong < e => fs.delete(p, false)
        case MigratedName(_) => fs.delete(p, false)
        case _ => ()
      }
    }
    fresh.foreach { case (f, sz) => seen(f) = (e, sz) }
    max = e
    e
  }

  /** Durably add a legacy offset's file list as epoch-0 lines (files
    * already in the log are skipped). Without this, a restart that
    * later reads only epoch offsets would lose the legacy seen set and
    * re-ingest every pre-migration file. Legacy offsets carry no
    * sizes — these lines record -1 and re-stat at plan time. */
  def migrate(files: Seq[String]): Unit = {
    val fresh = files.filterNot(seen.contains)
    if (fresh.isEmpty) return
    val k = fs.listStatus(dir)
      .count(st => MigratedName.matches(st.getPath.getName))
    writeAtomic(fs, dir, f"0-$k%d.migrated", fresh.map((0L, -1L, _)))
    fresh.foreach(f => seen(f) = (0L, -1L))
  }

  /** The (path, size) pairs first seen in `(startEpoch, endEpoch]`,
    * sorted by path; size -1 for legacy lines (caller stats those). */
  def filesIn(startEpoch: Long, endEpoch: Long): Seq[(String, Long)] =
    seen.collect {
      case (p, (e, sz)) if e > startEpoch && e <= endEpoch => (p, sz)
    }.toSeq.sortBy(_._1)

  /** Every file first seen at or before `endEpoch`. */
  def allUpTo(endEpoch: Long): Set[String] =
    seen.collect { case (p, (e, _)) if e <= endEpoch => p }.toSet
}

private[graft] object SeenFileLog {
  /** Compact every 10th epoch: startup replay reads ≤ 1 compact + 9
    * logs, and per-epoch log files stay proportional to that epoch's
    * FRESH files only. */
  val CompactInterval = 10

  private val LogName = "(\\d{20})\\.log".r
  private val CompactName = "(\\d{20})\\.compact".r
  private val MigratedName = "0-(\\d+)\\.migrated".r

  private def writeAtomic(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      name: String, lines: Seq[(Long, Long, String)]): Unit = {
    val tmp = new Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.map { case (e, sz, p) => s"$e\t$sz\t$p\n" }
      .mkString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, new Path(dir, name)),
      s"could not publish seen-file log ${new Path(dir, name)}")
  }

  /** (epoch, size, path) per line. Two formats coexist: pre-r16 logs
    * wrote `epoch TAB path` (size unknown → -1); r16+ writes
    * `epoch TAB size TAB path`. The path is always the LAST field, so
    * a path containing a tab can only exist in the 3-field form, where
    * only the first two tabs delimit. */
  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Seq[(Long, Long, String)] = {
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t')
      val e = l.substring(0, i).toLong
      val rest = l.substring(i + 1)
      val j = rest.indexOf('\t')
      if (j < 0) (e, -1L, rest) // legacy 2-field line
      else rest.substring(0, j).toLongOption match {
        case Some(sz) => (e, sz, rest.substring(j + 1))
        case None => (e, -1L, rest) // legacy path that contains a tab
      }
    }
  }
}

/** Directory listing + partition planning shared by the whole-file
  * DSv2 sources (`graft-fhir`, `graft-warc`). */
private[graft] object SourceFiles {

  /** (path, length) of every data file under the load path (one glob
    * level, dot/underscore files skipped — the Spark file-source
    * convention). Shared by the batch scans and the micro-batch
    * streams. */
  def listDataFiles(path: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val expanded = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }
    expanded
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith(".") && !n.startsWith("_")
      })
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** Resolve any size-unknown (-1, legacy log lines) entries with one
    * getFileStatus each; entries that carry their size pass through
    * untouched — the normal case after one round of r16+ listings. A
    * file that vanished between listing and (re)plan breaks source
    * immutability and fails loudly here, not by skipping rows. */
  def withSizes(files: Seq[(String, Long)], path: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] =
    if (files.forall(_._2 >= 0)) files
    else {
      val fs = new Path(path).getFileSystem(conf)
      files.map { case (f, sz) =>
        if (sz >= 0) (f, sz)
        else (f, fs.getFileStatus(new Path(f)).getLen)
      }
    }

  /** First-fit-decreasing bin-packing under the session's
    * `spark.sql.files.maxPartitionBytes`: a directory of small files
    * groups into few tasks; a huge file still gets its own bin (both
    * sources read whole records from a file — no intra-file split). */
  def packFileBins(files: Seq[(String, Long)]): Array[Array[String]] = {
    val maxBytes =
      org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
    files.sortBy(-_._2).foreach { case (f, len) =>
      bins.indexWhere(_._2 + len <= maxBytes) match {
        case -1 =>
          bins += ((scala.collection.mutable.ArrayBuffer(f), len))
        case i =>
          bins(i)._1 += f
          bins(i) = (bins(i)._1, bins(i)._2 + len)
      }
    }
    bins.map(_._1.toArray).toArray
  }
}
