package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for WARC web archives (ISO 28500 — the format
  * every large public crawl ships as):
  * `spark.read.format("graft-warc").load(dir)` yields one row per WARC
  * record with the envelope headers parsed, the HTTP response split
  * into status/headers/payload, and the raw payload bytes as a binary
  * column ready for [[graft.operators.TextAnalysis.extractText]] — the
  * missing head of the crawl-curation pipeline (WARC → HTML → text →
  * screens), the `graft-fhir` story for the crawl domain.
  *
  * Scale design, mirroring [[FhirBundleSource]]:
  *  - **One file = one sequential stream.** WARC files are record-
  *    concatenations (typically ~1 GB gzip members); records cannot be
  *    split without an external index, so parallelism comes from the
  *    file set — exactly how a real crawl lands (hundreds of thousands
  *    of archive files). Files bin-pack into input partitions under
  *    `spark.sql.files.maxPartitionBytes` ([[SourceFiles.packFileBins]]).
  *  - **Column pruning reaches the parser.** When neither `payload` nor
  *    the `http_*` columns are required, each record's content block is
  *    SKIPPED, not buffered — a `SELECT target_uri, warc_type` manifest
  *    scan never materializes page bytes.
  *  - **Gzip members decoded explicitly.** `.warc.gz` files are
  *    member-per-record concatenations; [[MultiMemberGzipInputStream]]
  *    drives member boundaries off the inflater's own remaining count
  *    instead of `InputStream.available()` (which object-store readers
  *    routinely report as 0 — `java.util.zip.GZIPInputStream`'s
  *    concatenation support silently truncates there).
  *  - **Streaming.** `spark.readStream.format("graft-warc")` tails a
  *    landing directory with the same constant-size epoch offsets and
  *    compacted [[SeenFileLog]] as the FHIR stream — continual-ingest
  *    crawl curation composes as readStream → extractText → screens.
  *
  * Failure semantics: record FRAMING errors (bad magic, truncated
  * content block, broken gzip member) fail loudly — a framing error
  * loses every following record in the file, which must never be
  * silent. Errors INSIDE one record's HTTP block (unparsable status
  * line, malformed chunked encoding) degrade that row (null status /
  * raw payload) and move on — one hostile page must not kill a crawl
  * job.
  */
class WarcSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-warc"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.Schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-warc: no path specified"))
    new WarcTable(path, schema)
  }
}

object WarcSource {
  /** Fixed table schema: envelope headers, HTTP split, payload bytes,
    * provenance. `warc_date` stays the ISO-8601 string the archive
    * carries (lossless; cast downstream when a timestamp is wanted);
    * `warc_type` canonicalizes to the registry's lowercase.
    * `concurrent_to` is the WARC-Concurrent-To envelope pointer (how
    * real crawls tie a `request` record to its `response`);
    * `refers_to` / `payload_digest` are the WARC-Refers-To and
    * WARC-Payload-Digest envelope headers — how `revisit` records
    * (crawl-side dedup storage) point at the capture that holds the
    * bytes ([[WarcIO.expandRevisits]] follows the pointer);
    * `http_headers` is the FULL parsed HTTP header map (lowercased
    * names, repeats comma-joined per RFC 9110) — the curation signals
    * (redirect Location, content negotiation, user-agent) live there. */
  val Schema: StructType = StructType(Seq(
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("concurrent_to", StringType, nullable = true),
    StructField("refers_to", StringType, nullable = true),
    StructField("payload_digest", StringType, nullable = true),
    StructField("http_headers",
      MapType(StringType, StringType), nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("warc_file", StringType, nullable = false)))
}

private[sources] class WarcTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-warc:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState
      .newHadoopConfWithOptions(options.asScala.toMap)
    new WarcScanBuilder(path, tableSchema, new SerializableHadoopConf(conf))
  }
}

private[sources] class WarcScanBuilder(path: String, full: StructType,
    conf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  private var required: StructType = full
  private var pushedTypes: Option[Set[String]] = None
  private var pushedUris: Option[Set[String]] = None
  private var pushedDigests: Option[Set[String]] = None
  private var pushed: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val byName = full.fieldNames.toSet
    required = StructType(
      requiredSchema.fields.filter(f => byName.contains(f.name)))
  }

  /** Record-type pushdown: `warc_type = 'response'` (or IN) reaches the
    * record loop, which then SKIPS non-matching records' content blocks
    * instead of materializing them — in a real crawl archive roughly
    * half the records are request/metadata envelopes, so a
    * response-only scan halves the bytes it buffers.
    *
    * URI pushdown: `target_uri = '…'` (or IN) makes the scan consult
    * the `_cdx` sidecar ([[WarcIO.archiveSave]] writes one per archive
    * directory) and read ONLY the matched records' byte extents —
    * fetching a thousand pages out of a 100 TB archive reads
    * kilobytes per page instead of scanning the corpus. Falls back to
    * the full scan whenever the sidecar is absent or does not cover
    * every listed archive file (foreign files landed next to ours).
    *
    * Digest pushdown: `payload_digest = '…'` (or IN) is served by the
    * SAME extent machinery — the sidecar carries each record's digest,
    * so fetch-canonical-by-digest (the dedup tier's natural forensic
    * point lookup: [[WarcIO.warcDedupSave]] stores canonical records
    * keyed by digest) seeks exact extents instead of scanning. When a
    * uri filter rides alongside, the extents are the conjunction
    * (Spark's pushed filter array is a conjunction).
    *
    * Every filter is also returned as residual (Spark re-applies it),
    * keeping all pushdowns skip-only with no correctness surface. */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    def collectSets(column: String): Seq[Set[String]] = filters.collect {
      case EqualTo(c, v: String) if c == column => Set(v)
      case In(c, vs) if c == column
          && vs.forall(_.isInstanceOf[String]) =>
        vs.map(_.asInstanceOf[String]).toSet
    }
    val types = collectSets("warc_type")
    if (types.nonEmpty) pushedTypes = Some(types.reduce(_ intersect _))
    val uris = collectSets("target_uri")
    if (uris.nonEmpty) pushedUris = Some(uris.reduce(_ intersect _))
    val digests = collectSets("payload_digest")
    if (digests.nonEmpty) pushedDigests = Some(digests.reduce(_ intersect _))
    pushed = filters.filter {
      case EqualTo("warc_type", _) | In("warc_type", _) => types.nonEmpty
      case EqualTo("target_uri", _) | In("target_uri", _) => uris.nonEmpty
      case EqualTo("payload_digest", _) | In("payload_digest", _) =>
        digests.nonEmpty
      case _ => false
    }
    filters // all residual: Spark re-applies, pushdown is skip-only
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan =
    new WarcScan(path, required, conf, pushedTypes, pushedUris,
      pushedDigests)
}

private[sources] class WarcScan(path: String, required: StructType,
    conf: SerializableHadoopConf,
    typeFilter: Option[Set[String]] = None,
    uriFilter: Option[Set[String]] = None,
    digestFilter: Option[Set[String]] = None)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  private def lookupTag(label: String, vals: Set[String]): String = {
    val shown = vals.toSeq.sorted.take(8)
    val more = if (vals.size > 8) s", … ${vals.size - 8} more" else ""
    s" $label: [${shown.mkString(", ")}$more]" +
      (if (extentPlan.isDefined) " (cdx-indexed)"
       else " (no cdx coverage — full scan)")
  }
  override def description(): String =
    s"graft-warc $path [${required.fieldNames.mkString(", ")}]" +
      typeFilter.fold("")(t =>
        s" PushedRecordTypes: [${t.toSeq.sorted.mkString(", ")}]") +
      uriFilter.fold("")(lookupTag("PushedUris", _)) +
      digestFilter.fold("")(lookupTag("PushedDigests", _))

  private lazy val files: Seq[(String, Long)] =
    SourceFiles.listDataFiles(path, conf.value)

  /** The CDX point-lookup plan: defined iff a `target_uri` and/or
    * `payload_digest` filter is pushed AND every listed archive file
    * is covered by a `_cdx` sidecar — then each partition is one
    * file's matched byte extents (kilobytes seeked, not terabytes
    * scanned). */
  private lazy val extentPlan: Option[Array[WarcExtentPartition]] =
    if (uriFilter.isEmpty && digestFilter.isEmpty) None
    else WarcCdx.planExtents(files.map(_._1), uriFilter, digestFilter,
      typeFilter, conf)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, extentPlan match {
        case Some(parts) => parts.map(_.lengths.sum).sum
        case None => files.map(_._2).sum
      }))
    override def numRows(): java.util.OptionalLong = extentPlan match {
      case Some(parts) =>
        java.util.OptionalLong.of(parts.map(_.offsets.length.toLong).sum)
      case None => java.util.OptionalLong.empty() // records unknown
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    extentPlan match {
      case Some(parts) => parts.map(p => p: InputPartition)
      case None => SourceFiles.packFileBins(files)
        .map(b => WarcInputPartition(b): InputPartition)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    if (extentPlan.isDefined) new WarcExtentReaderFactory(required, conf)
    else new WarcReaderFactory(required, conf, typeFilter)

  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read
        .streaming.MicroBatchStream =
    new WarcMicroBatchStream(path, required, conf, checkpointLocation,
      typeFilter)
}

private[sources] case class WarcInputPartition(files: Array[String])
    extends InputPartition

private[sources] class WarcReaderFactory(required: StructType,
    conf: SerializableHadoopConf,
    typeFilter: Option[Set[String]] = None)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].files, required, conf,
      typeFilter)
}

/** Micro-batch stream over a WARC landing directory: identical offset
  * protocol to [[FhirMicroBatchStream]] — each trigger tags newly
  * listed files as one epoch in the compacted [[SeenFileLog]], the
  * persisted offset is the constant-size epoch number, and a replayed
  * batch re-reads exactly its tagged files (exactly-once restart). No
  * legacy offset form exists for this source; an array-form offset in
  * the WAL means a corrupted/foreign checkpoint and fails loudly. */
private[sources] class WarcMicroBatchStream(
    path: String, required: StructType, conf: SerializableHadoopConf,
    checkpointLocation: String, typeFilter: Option[Set[String]] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {

  import org.apache.spark.sql.connector.read.streaming

  private lazy val log = new SeenFileLog(
    new Path(checkpointLocation, "graft_seen_files"), conf.value)

  override def initialOffset(): streaming.Offset = EpochStreamOffset(0L)

  override def latestOffset(): streaming.Offset = synchronized {
    val fresh = SourceFiles.listDataFiles(path, conf.value)
      .filterNot(f => log.contains(f._1)).sortBy(_._1)
    if (fresh.nonEmpty) log.advance(fresh)
    EpochStreamOffset(log.maxEpoch)
  }

  override def deserializeOffset(json: String): streaming.Offset =
    EpochStreamOffset.parse(json) match {
      case o: EpochStreamOffset => o
      case other => throw new IllegalStateException(
        s"graft-warc: unrecognized offset form in checkpoint: $other")
    }

  override def planInputPartitions(
      start: streaming.Offset, end: streaming.Offset)
      : Array[InputPartition] = synchronized {
    val (s, e) = (start, end) match {
      case (EpochStreamOffset(a), EpochStreamOffset(b)) => (a, b)
      case other => throw new IllegalStateException(
        s"graft-warc: unrecognized offset pair: $other")
    }
    // sizes ride in the seen log (recorded at listing time), so a
    // (re)plan is a pure in-memory bin-pack — no per-file getFileStatus
    // RPC storm on the driver at a 100k-file backfill. Only legacy
    // pre-r16 lines (size -1) re-stat.
    SourceFiles.packFileBins(
      SourceFiles.withSizes(log.filesIn(s, e), path, conf.value))
      .map(b => WarcInputPartition(b): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, conf, typeFilter)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One parsed WARC record (envelope + HTTP split, when present).
  * `httpHeaders` preserves field order, lowercased names, repeats
  * comma-joined; null when the block is not an HTTP message or was
  * skipped. */
private[sources] final case class WarcRecord(
    recordId: String, warcType: String, targetUri: String, warcDate: String,
    contentType: String, contentLength: Long, httpStatus: Integer,
    httpContentType: String, concurrentTo: String, refersTo: String,
    payloadDigest: String,
    httpHeaders: Seq[(String, String)], payload: Array[Byte])

/** Column extraction shared by the sequential scan reader and the CDX
  * extent reader: per-column closures resolved ONCE per reader — the
  * row loop must not string-match column names per cell (ten
  * comparisons x columns x millions of records). */
private[sources] object WarcColumns {
  /** Whether any required column forces materializing content blocks
    * (otherwise the parser SKIPS them). */
  def needBlock(required: StructType): Boolean =
    required.fieldNames.exists(
      Set("payload", "http_status", "http_content_type", "http_headers"))

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  def extractors(
      required: StructType): Array[(WarcRecord, UTF8String) => Any] =
    required.fields.map(f => f.name match {
      case "record_id" => (r: WarcRecord, _: UTF8String) => utf8(r.recordId)
      case "warc_type" => (r: WarcRecord, _: UTF8String) => utf8(r.warcType)
      case "target_uri" =>
        (r: WarcRecord, _: UTF8String) => utf8(r.targetUri)
      case "warc_date" => (r: WarcRecord, _: UTF8String) => utf8(r.warcDate)
      case "content_type" =>
        (r: WarcRecord, _: UTF8String) => utf8(r.contentType)
      case "content_length" =>
        (r: WarcRecord, _: UTF8String) => r.contentLength
      case "http_status" => (r: WarcRecord, _: UTF8String) =>
        if (r.httpStatus == null) null else r.httpStatus.intValue()
      case "http_content_type" => (r: WarcRecord, _: UTF8String) =>
        utf8(r.httpContentType)
      case "concurrent_to" =>
        (r: WarcRecord, _: UTF8String) => utf8(r.concurrentTo)
      case "refers_to" =>
        (r: WarcRecord, _: UTF8String) => utf8(r.refersTo)
      case "payload_digest" =>
        (r: WarcRecord, _: UTF8String) => utf8(r.payloadDigest)
      case "http_headers" => (r: WarcRecord, _: UTF8String) =>
        if (r.httpHeaders == null) null
        else new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            r.httpHeaders.map(h => utf8(h._1): Any).toArray),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            r.httpHeaders.map(h => utf8(h._2): Any).toArray))
      case "payload" => (r: WarcRecord, _: UTF8String) => r.payload
      case "warc_file" => (_: WarcRecord, file: UTF8String) => file
      case other => throw new IllegalStateException(
        s"graft-warc: unknown required column $other")
    })

  def toRow(rec: WarcRecord, file: UTF8String,
      extractors: Array[(WarcRecord, UTF8String) => Any]): InternalRow = {
    val row = new GenericInternalRow(extractors.length)
    var i = 0
    while (i < extractors.length) {
      row.update(i, extractors(i)(rec, file))
      i += 1
    }
    row
  }
}

private[sources] class WarcPartitionReader(
    files: Array[String], required: StructType,
    conf: SerializableHadoopConf,
    typeFilter: Option[Set[String]] = None)
    extends PartitionReader[InternalRow] {

  private val needBlock = WarcColumns.needBlock(required)
  private val needHeaders = required.fieldNames.contains("http_headers")
  private val extractors = WarcColumns.extractors(required)

  private var fi = -1
  private var it: WarcRecordIterator = _
  private var in: java.io.InputStream = _
  private var current: InternalRow = _
  private var currentFile: UTF8String = _

  private def openNext(): Boolean = {
    closeStream()
    fi += 1
    if (fi >= files.length) return false
    val p = new Path(files(fi))
    val fs = p.getFileSystem(conf.value)
    val raw: java.io.InputStream = fs.open(p)
    // buffer ABOVE the decompressor too: the record iterator reads
    // header bytes one at a time, and each unbuffered read would
    // otherwise be an inflater round-trip (plus a 1-byte array) per
    // header byte
    in = new java.io.BufferedInputStream(
      WarcCodec.decompressed(raw, files(fi)), 1 << 16)
    it = new WarcRecordIterator(in, files(fi), needBlock, typeFilter,
      needHeaders)
    currentFile = UTF8String.fromString(files(fi))
    true
  }

  override def next(): Boolean = {
    while (it == null || !it.hasNext) if (!openNext()) return false
    current = WarcColumns.toRow(it.next(), currentFile, extractors)
    true
  }

  override def get(): InternalRow = current

  private def closeStream(): Unit =
    if (in != null) { in.close(); in = null; it = null }

  override def close(): Unit = closeStream()
}

/** CDX point-lookup planning for the pushed `target_uri` /
  * `payload_digest` filters: the scan consults the `_cdx` sidecars and
  * plans one partition per archive file holding just the matched
  * records' byte extents. */
private[sources] object WarcCdx {

  /** Ceiling on extents collected to the driver at plan time. A
    * pushed EqualTo/In carries a bounded literal list, so this only
    * trips when the SAME uris/digests recur pathologically across an
    * archive — at which point [[planExtents]] returns None and the
    * scan falls back to the full pass + residual filter rather than
    * failing a query the user cannot restructure. */
  val MaxExtents: Int = 1 << 22

  def planExtents(
      dataFiles: Seq[String], uris: Option[Set[String]],
      digests: Option[Set[String]],
      typeFilter: Option[Set[String]],
      conf: SerializableHadoopConf): Option[Array[WarcExtentPartition]] = {
    import org.apache.spark.sql.functions.col
    if (dataFiles.isEmpty) return Some(Array.empty)
    val spark = org.apache.spark.sql.SparkSession.active
    val fs = new Path(dataFiles.head).getFileSystem(conf.value)
    val parents = dataFiles.map(f => new Path(f).getParent).distinct
    val cdxDirs = parents.map(new Path(_, "_cdx"))
    if (!cdxDirs.forall(fs.exists)) return None // no index → full scan
    val cdx = spark.read.parquet(cdxDirs.map(_.toString): _*)
    // coverage gate: every listed archive file must be indexed —
    // a foreign file landed next to ours could hold matching records
    // the index does not know about, and the residual filter can only
    // drop rows, never resurrect skipped ones
    val indexed = cdx.select("warc_file").distinct()
      .collect().map(_.getString(0)).toSet
    val listed = dataFiles.map(f =>
      fs.makeQualified(new Path(f)).toString)
    if (!listed.forall(indexed.contains)) return None
    // pushed filters are a conjunction: each defined lookup narrows
    val narrowed = Seq(
      uris.map(u => col("target_uri").isin(u.toSeq: _*)),
      digests.map(d => col("payload_digest").isin(d.toSeq: _*)),
      typeFilter.map(t => col("warc_type").isin(t.toSeq: _*)))
      .flatten.foldLeft(cdx)((d, p) => d.filter(p))
    val matched = narrowed
      .select("warc_file", "offset", "length")
      .limit(MaxExtents + 1).collect()
    if (matched.length > MaxExtents) {
      // pathologically recurring uris/digests: the extent list would
      // not fit the driver — fall back to the full scan + residual
      // filter (same rows, just slower) instead of failing a plain query
      return None
    }
    Some(matched.groupBy(_.getString(0)).toArray.sortBy(_._1)
      .map { case (file, rows) =>
        val sorted = rows.sortBy(_.getLong(1)) // forward sweep per file
        WarcExtentPartition(file,
          sorted.map(_.getLong(1)), sorted.map(_.getLong(2)))
      })
  }
}

private[sources] case class WarcExtentPartition(
    file: String, offsets: Array[Long], lengths: Array[Long])
    extends InputPartition

private[sources] class WarcExtentReaderFactory(required: StructType,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new WarcExtentReader(
      partition.asInstanceOf[WarcExtentPartition], required, conf)
}

/** Seek-and-read over one file's matched CDX extents (sorted by
  * offset — each task sweeps forward, never backward): per extent, one
  * bounded read + one single-member decompress + one record parse.
  * The point-lookup twin of [[WarcPartitionReader]], returning exactly
  * the rows a full scan of those records would. */
private[sources] class WarcExtentReader(
    part: WarcExtentPartition, required: StructType,
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {

  private val needBlock = WarcColumns.needBlock(required)
  private val needHeaders = required.fieldNames.contains("http_headers")
  private val extractors = WarcColumns.extractors(required)
  private val fileUtf8 = UTF8String.fromString(part.file)

  private var in: org.apache.hadoop.fs.FSDataInputStream = _
  private var i = -1
  private var current: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= part.offsets.length) return false
    if (in == null) {
      val p = new Path(part.file)
      in = p.getFileSystem(conf.value).open(p)
    }
    val len = part.lengths(i)
    require(len > 0 && len <= Int.MaxValue - 8,
      s"graft-warc: ${part.file}: unfetchable record extent $len at " +
        s"${part.offsets(i)} (corrupt _cdx row?)")
    in.seek(part.offsets(i))
    val bytes = new Array[Byte](len.toInt)
    in.readFully(bytes)
    val slice = new java.io.BufferedInputStream(
      WarcCodec.decompressed(
        new java.io.ByteArrayInputStream(bytes), part.file), 1 << 14)
    val rec = new WarcRecordIterator(slice, part.file, needBlock,
      needHeaders = needHeaders).next()
    current = WarcColumns.toRow(rec, fileUtf8, extractors)
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (in != null) { in.close(); in = null }
}

/** Pull-parser over one (decompressed) WARC stream. Record grammar
  * (ISO 28500): `WARC/<ver>` version line, CRLF-terminated
  * `Name: value` headers (obs-fold continuations honored), one blank
  * line, then exactly `Content-Length` block bytes, then record
  * separators (blank lines) before the next version line. Headers are
  * length-framed away from payloads, so the line reader never scans
  * content bytes. */
private[sources] final class WarcRecordIterator(
    in: java.io.InputStream, file: String, needBlock: Boolean,
    typeFilter: Option[Set[String]] = None,
    /** Collect the HTTP header map only when the `http_headers` column
      * is actually required — the map is a per-record allocation the
      * 100 TB scan hot path should not pay for a manifest query. */
    needHeaders: Boolean = false)
    extends Iterator[WarcRecord] {

  private var nextRec: WarcRecord = _
  private var finished = false

  /** Raw CRLF/LF line as UTF-8; null at clean EOF. */
  private def readLine(): String = {
    val bos = new java.io.ByteArrayOutputStream(96)
    var c = in.read()
    if (c == -1) return null
    while (c != -1 && c != '\n') { bos.write(c); c = in.read() }
    val b = bos.toByteArray
    val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1
      else b.length
    new String(b, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def advance(): Unit = {
    nextRec = null
    // loop, not recursion: a pushed type filter can skip an unbounded
    // run of records and must not grow the stack doing it
    while (nextRec == null && !finished) advanceOnce()
  }

  private def advanceOnce(): Unit = {
    var line = readLine()
    while (line != null && line.isEmpty) line = readLine() // separators
    if (line == null) { finished = true; return }
    if (!line.startsWith("WARC/")) throw new IllegalStateException(
      s"graft-warc: $file: expected a WARC/<version> record boundary, " +
        s"got '${line.take(40)}' — framing is broken; refusing to " +
        "silently drop the rest of the file")
    // envelope headers (names case-insensitive; obs-fold continuation)
    val h = scala.collection.mutable.LinkedHashMap[String, String]()
    var last: String = null
    var hl = readLine()
    while (hl != null && hl.nonEmpty) {
      if ((hl.charAt(0) == ' ' || hl.charAt(0) == '\t') && last != null)
        h(last) = h(last) + " " + hl.trim
      else {
        val i = hl.indexOf(':')
        if (i > 0) {
          last = hl.substring(0, i).trim.toLowerCase
          h(last) = hl.substring(i + 1).trim
        }
      }
      hl = readLine()
    }
    if (hl == null) throw new IllegalStateException(
      s"graft-warc: $file: EOF inside a record's WARC headers")
    val len = h.getOrElse("content-length", throw new IllegalStateException(
      s"graft-warc: $file: record without Content-Length")).toLong
    require(len >= 0 && len <= Int.MaxValue - 8,
      s"graft-warc: $file: unsupported Content-Length $len")
    // values canonicalize to the registry's lowercase ("Response" and
    // "response" are the same record type to every consumer downstream)
    val warcType = h.get("warc-type").map(_.toLowerCase).orNull
    val contentType = h.getOrElse("content-type", null)
    // pushed record-type filter: a non-matching record's content block
    // is SKIPPED, never buffered or HTTP-split (Spark re-applies the
    // residual filter, so this is a pure skip optimization)
    if (typeFilter.exists(t => warcType == null || !t.contains(warcType))) {
      in.skipNBytes(len)
      return // nextRec stays null; advance()'s loop tries the next record
    }
    var status: Integer = null
    var httpCt: String = null
    var headers: Seq[(String, String)] = null
    var payload: Array[Byte] = null
    if (needBlock) {
      val block = in.readNBytes(len.toInt)
      if (block.length != len) throw new IllegalStateException(
        s"graft-warc: $file: truncated content block " +
          s"(${block.length} of $len bytes) — archive is cut short")
      if (contentType != null
          && contentType.toLowerCase.startsWith("application/http")) {
        val (st, ct, hs, body) = WarcHttp.split(block, needHeaders)
        status = st; httpCt = ct; headers = hs; payload = body
      } else payload = block
    } else in.skipNBytes(len)
    nextRec = WarcRecord(
      h.getOrElse("warc-record-id", null), warcType,
      h.getOrElse("warc-target-uri", null), h.getOrElse("warc-date", null),
      contentType, len, status, httpCt,
      h.getOrElse("warc-concurrent-to", null),
      h.getOrElse("warc-refers-to", null),
      h.getOrElse("warc-payload-digest", null), headers, payload)
  }

  override def hasNext: Boolean = {
    if (nextRec == null && !finished) advance()
    nextRec != null
  }

  override def next(): WarcRecord = {
    if (!hasNext) throw new NoSuchElementException(s"graft-warc: $file")
    val r = nextRec
    nextRec = null
    r
  }
}

/** HTTP message split for `application/http` content blocks. Errors
  * here degrade ONE row (null status, raw block as payload) — interior
  * hostility must not kill the scan the way framing errors do. */
private[graft] object WarcHttp {

  /** (status | null, content-type | null, ordered header pairs | null,
    * payload bytes). Header names lowercase; repeated fields
    * comma-join (RFC 9110 list semantics). Requests and other
    * status-line-less messages return null status but REAL headers —
    * that is what [[WarcIO.pairRequests]] attaches to responses. The
    * header MAP is collected only under `wantHeaders` (a per-record
    * allocation the hot path skips when the column is pruned);
    * content-type/chunked detection always runs. */
  def split(block: Array[Byte], wantHeaders: Boolean = true)
      : (Integer, String, Seq[(String, String)], Array[Byte]) = {
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return (null, null, null, block) // headerless — keep raw
    val head = new String(block, 0, sep,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n", -1)
    val status: Integer =
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val parts = lines(0).split(" ")
        if (parts.length >= 2) parts(1).toIntOption
          .map(Integer.valueOf).orNull
        else null
      } else null // request/other message — no status line
    var ct: String = null
    var chunked = false
    val headers =
      if (wantHeaders)
        scala.collection.mutable.LinkedHashMap[String, String]()
      else null
    lines.drop(1).foreach { l =>
      val i = l.indexOf(':')
      if (i > 0) {
        val k = l.substring(0, i).trim.toLowerCase
        val v = l.substring(i + 1).trim
        if (headers != null)
          headers(k) = headers.get(k).fold(v)(prev => s"$prev, $v")
        if (k == "content-type" && ct == null) ct = v
        if (k == "transfer-encoding"
            && v.toLowerCase.contains("chunked")) chunked = true
      }
    }
    val body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    (status, ct, if (headers == null) null else headers.toSeq,
      if (chunked) dechunk(body).getOrElse(body) else body)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n'
          && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** RFC 9112 chunked decoding: `hex-size[;ext] CRLF data CRLF` until a
    * zero chunk (trailers ignored). None on any malformation — the
    * caller keeps the raw body rather than guessing. */
  def dechunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    while (true) {
      val nl = indexOfCrlf(body, pos)
      if (nl < 0) return None
      val sizeStr = new String(body, pos, nl - pos,
        java.nio.charset.StandardCharsets.ISO_8859_1)
        .split(";")(0).trim
      val size =
        try Integer.parseInt(sizeStr, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0) return None
      pos = nl + 2
      if (size == 0) return Some(out.toByteArray)
      if (pos + size + 2 > body.length) return None
      out.write(body, pos, size)
      pos += size
      if (body(pos) != '\r' || body(pos + 1) != '\n') return None
      pos += 2
    }
    None // unreachable
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }
}

/** Streaming decompressor for CONCATENATED gzip members (RFC 1952, the
  * `.warc.gz` member-per-record layout). `java.util.zip.GZIPInputStream`
  * nominally supports concatenation but gates the next-member probe on
  * `InputStream.available()` — object-store and HDFS readers routinely
  * answer 0 there, silently truncating a thousand-record archive to its
  * first record. This wrapper owns the input buffer and drives member
  * boundaries off `Inflater.getRemaining` instead: no `available()`,
  * no heuristics, a truncated member fails loudly. (CRC32/ISIZE
  * trailers are consumed but not verified — the deflate structure
  * itself frames each member; verification would add a full extra pass
  * of checksum arithmetic per byte.) */
private[graft] final class MultiMemberGzipInputStream(
    raw: java.io.InputStream, file: String) extends java.io.InputStream {

  private val inf = new java.util.zip.Inflater(true) // raw deflate
  private val buf = new Array[Byte](1 << 16)
  private var pos = 0
  private var lim = 0
  private var rawEof = false
  private var inMember = false
  private var eof = false

  private def refill(): Unit = {
    if (rawEof) { pos = 0; lim = 0; return }
    val n = raw.read(buf)
    if (n == -1) { rawEof = true; pos = 0; lim = 0 }
    else { pos = 0; lim = n }
  }

  /** Next header/trailer byte; -1 at clean raw EOF. */
  private def nextByte(): Int = {
    if (pos == lim) refill()
    if (pos == lim) return -1
    val b = buf(pos) & 0xff
    pos += 1
    b
  }

  private def need(what: String): Int = {
    val b = nextByte()
    if (b == -1) throw new java.io.EOFException(
      s"graft-warc: $file: truncated gzip $what")
    b
  }

  /** Parse one member header; false at clean EOF before any byte. */
  private def startMember(): Boolean = {
    val m1 = nextByte()
    if (m1 == -1) return false
    val m2 = need("magic")
    if (m1 != 0x1f || m2 != 0x8b) throw new java.io.IOException(
      s"graft-warc: $file: bad gzip member magic " +
        f"0x$m1%02x 0x$m2%02x")
    val cm = need("header")
    if (cm != 8) throw new java.io.IOException(
      s"graft-warc: $file: unsupported gzip compression method $cm")
    val flg = need("header")
    var i = 0
    while (i < 6) { need("header"); i += 1 } // mtime(4) xfl os
    if ((flg & 0x04) != 0) { // FEXTRA
      val xlen = need("extra") | (need("extra") << 8)
      var j = 0
      while (j < xlen) { need("extra"); j += 1 }
    }
    if ((flg & 0x08) != 0) while (need("name") != 0) () // FNAME
    if ((flg & 0x10) != 0) while (need("comment") != 0) () // FCOMMENT
    if ((flg & 0x02) != 0) { need("hcrc"); need("hcrc") } // FHCRC
    inf.reset()
    inMember = true
    true
  }

  /** The member's deflate stream just finished: give back the
    * inflater's over-read, consume the 8-byte trailer. */
  private def finishMember(): Unit = {
    pos = lim - inf.getRemaining
    var i = 0
    while (i < 8) { need("trailer"); i += 1 }
    inMember = false
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n == -1) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (true) {
      if (eof) return -1
      if (!inMember) {
        if (!startMember()) { eof = true; return -1 }
      } else if (inf.finished()) finishMember()
      else {
        if (inf.needsInput()) {
          if (pos == lim) refill()
          if (pos == lim) throw new java.io.EOFException(
            s"graft-warc: $file: truncated gzip member (deflate stream " +
              "cut mid-record)")
          inf.setInput(buf, pos, lim - pos)
          pos = lim // the inflater owns the window; finish backtracks
        }
        val n = inf.inflate(b, off, len)
        if (n > 0) return n
      }
    }
    -1 // unreachable
  }

  override def close(): Unit = {
    inf.end()
    raw.close()
  }
}

/** Decompressor dispatch by archive extension, shared by the scan
  * reader and [[WarcIO.warcFetch]]'s extent slices. `.gz` goes through
  * [[MultiMemberGzipInputStream]], `.zst` (the framing newer public
  * crawl tooling ships) through [[MultiFrameZstdInputStream]] — both
  * drive member/frame boundaries explicitly so a truncated archive
  * fails LOUDLY instead of silently ending early. Anything else reads
  * as plain bytes. */
private[graft] object WarcCodec {
  def decompressed(raw: java.io.InputStream,
      file: String): java.io.InputStream =
    if (file.endsWith(".gz")) new MultiMemberGzipInputStream(raw, file)
    else if (file.endsWith(".zst"))
      new MultiFrameZstdInputStream(raw, file)
    else raw
}

/** Streaming decompressor for CONCATENATED zstd frames (RFC 8878, the
  * frame-per-record `.warc.zst` layout). zstd-jni's `ZstdInputStream`
  * nominally continues across concatenated frames but SILENTLY returns
  * EOF when the trailing frame is cut mid-stream (measured: a 5-frame
  * archive truncated by 7 bytes read back partial bytes with no
  * exception) — the exact silent-truncation failure
  * [[MultiMemberGzipInputStream]] exists to prevent on the gzip side.
  * This wrapper walks each frame's structure itself — magic, frame
  * header (FCS/DID/window fields sized from the descriptor bits),
  * block headers (3-byte LE: last-flag, type, size; RLE blocks store
  * one byte), optional content checksum — so a frame's exact
  * compressed extent is known from its own framing, then hands the
  * COMPLETE frame to the native decoder (which does throw on
  * single-frame corruption). EOF inside any frame structure fails
  * loudly; skippable frames (0x184D2A5x — seekable-zstd indexes) are
  * consumed and skipped. */
private[graft] final class MultiFrameZstdInputStream(
    raw: java.io.InputStream, file: String) extends java.io.InputStream {

  private val in = new java.io.BufferedInputStream(raw, 1 << 16)
  private var cur: java.io.InputStream = _
  private var eof = false

  private def need(what: String): Int = {
    val b = in.read()
    if (b == -1) throw new java.io.EOFException(
      s"graft-warc: $file: truncated zstd $what")
    b
  }

  private def readIntLE(what: String): Int =
    need(what) | (need(what) << 8) | (need(what) << 16) |
      (need(what) << 24)

  private def copy(n: Long, bos: java.io.ByteArrayOutputStream,
      what: String): Unit = {
    var left = n
    val buf = new Array[Byte](1 << 14)
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length).toInt)
      if (r == -1) throw new java.io.EOFException(
        s"graft-warc: $file: truncated zstd $what " +
          s"($left of $n bytes missing)")
      bos.write(buf, 0, r)
      left -= r
    }
  }

  /** One complete frame's raw bytes; null at clean EOF. */
  private def nextFrameBytes(): Array[Byte] = {
    while (true) {
      val b0 = in.read()
      if (b0 == -1) return null
      val magic = b0 | (need("magic") << 8) | (need("magic") << 16) |
        (need("magic") << 24)
      if ((magic & 0xfffffff0) == 0x184d2a50) { // skippable frame
        val sz = readIntLE("skippable size")
        var left = sz.toLong & 0xffffffffL
        while (left > 0) { need("skippable body"); left -= 1 }
      } else if (magic != 0xfd2fb528) {
        throw new java.io.IOException(
          f"graft-warc: $file: bad zstd frame magic 0x$magic%08x")
      } else {
        val bos = new java.io.ByteArrayOutputStream(1 << 14)
        def w(v: Int): Unit = bos.write(v)
        w(b0); w((magic >>> 8) & 0xff); w((magic >>> 16) & 0xff)
        w((magic >>> 24) & 0xff)
        val fhd = need("frame header"); w(fhd)
        val singleSegment = (fhd & 0x20) != 0
        val checksum = (fhd & 0x04) != 0
        if (!singleSegment) w(need("window descriptor"))
        val didLen = (fhd & 3) match {
          case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
        }
        var i = 0
        while (i < didLen) { w(need("dictionary id")); i += 1 }
        val fcsLen = ((fhd >>> 6) & 3) match {
          case 0 => if (singleSegment) 1 else 0
          case 1 => 2; case 2 => 4; case _ => 8
        }
        i = 0
        while (i < fcsLen) { w(need("content size")); i += 1 }
        var last = false
        while (!last) {
          val h0 = need("block header"); val h1 = need("block header")
          val h2 = need("block header")
          w(h0); w(h1); w(h2)
          val hdr = h0 | (h1 << 8) | (h2 << 16)
          last = (hdr & 1) != 0
          val btype = (hdr >>> 1) & 3
          val bsize = hdr >>> 3
          if (btype == 3) throw new java.io.IOException(
            s"graft-warc: $file: reserved zstd block type")
          // RLE blocks store ONE byte (bsize is the regenerated size)
          copy(if (btype == 1) 1L else bsize.toLong, bos, "block")
        }
        if (checksum) { i = 0; while (i < 4) { w(need("checksum")); i += 1 } }
        return bos.toByteArray
      }
    }
    null // unreachable
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n == -1) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (true) {
      if (eof) return -1
      if (cur == null) {
        val frame = nextFrameBytes()
        if (frame == null) { eof = true; return -1 }
        cur = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(frame))
      }
      val n = cur.read(b, off, len)
      if (n > 0) return n
      // only -1 ends the frame: a 0-byte return is a legitimate
      // "no bytes THIS call" some codec versions emit mid-frame, and
      // treating it as exhaustion would silently truncate the frame —
      // the exact failure class this wrapper exists to prevent
      if (n == -1) { cur.close(); cur = null }
    }
    -1 // unreachable
  }

  override def close(): Unit = {
    if (cur != null) cur.close()
    in.close()
  }
}

/** Per-file gzip MEMBER writer (RFC 1952): ONE native Deflater and one
  * CRC32, reused across every member via `reset()` — header (10 bytes,
  * OS=unknown) and trailer (CRC32 + ISIZE, little-endian) are written
  * by hand so no per-member `GZIPOutputStream` is ever allocated. The
  * per-record-stream form holds a native zlib context per record until
  * GC (`finish()` does not `end()` its deflater) — off-heap memory
  * invisible to heap pressure, the classic archive-writer OOM. */
private[sources] final class GzipMemberWriter(out: java.io.OutputStream) {
  private val defl = new java.util.zip.Deflater(
    java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // raw deflate
  private val crc = new java.util.zip.CRC32()
  private val buf = new Array[Byte](1 << 15)

  def writeMember(bytes: Array[Byte]): Unit = {
    out.write(GzipMemberWriter.Header)
    defl.reset(); crc.reset()
    defl.setInput(bytes); defl.finish()
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    crc.update(bytes)
    writeIntLE(crc.getValue.toInt)
    writeIntLE(bytes.length) // ISIZE = input length mod 2^32
  }

  private def writeIntLE(v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Release the native zlib context (does NOT close `out`). */
  def end(): Unit = defl.end()
}

private[sources] object GzipMemberWriter {
  /** magic, deflate, no flags, mtime 0, xfl 0, OS unknown. */
  val Header: Array[Byte] = Array[Byte](
    0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)
}

/** Distributed WARC archive WRITER — the sink half of the crawl story:
  * one `.warc.gz` (or plain `.warc`) file per partition, one gzip
  * member per record (the layout public crawls ship, and the one
  * [[MultiMemberGzipInputStream]] reads back), each file led by a
  * `warcinfo` record. No driver collect: every partition streams its
  * own archive file via an atomic tmp+rename publish. Input columns
  * (by the default names): `target_uri`, `warc_date`, `record_id`,
  * `http_content_type`, `payload binary`; each row becomes one
  * `response` record wrapping an `HTTP/1.1 200 OK` message whose
  * Content-Length frames the payload byte-exactly (certified by the
  * q_s16 round-trip). */
object WarcIO {
  import org.apache.spark.sql.{DataFrame, Row}

  private val Crlf = "\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** @param requestHttp optional column holding the captured HTTP
    *        REQUEST message head ("GET /x HTTP/1.1\r\nHost: …" — no
    *        body); when set, each row also emits a `request` record
    *        tied to its response via WARC-Concurrent-To, the
    *        interleaved layout real crawls ship. The return count
    *        still counts responses only.
    * @param httpStatus optional int column with each capture's real
    *        HTTP status — a crawl archive is full of 301/404/503
    *        captures and their statuses ARE curation signals; null
    *        values (and an unset param) keep the 200 default.
    * @param httpHeaders optional `map<string,string>` column with the
    *        capture's response headers (redirect Location, caching,
    *        content negotiation) — re-emitted into the stored HTTP
    *        head in canonical key order, the writer's Content-Type /
    *        Content-Length framing pair excluded. Round-trips through
    *        the reader's `http_headers` map (lowercased keys). */
  def warcSave(
      df: DataFrame, dir: String, codec: String = "gzip",
      uri: String = "target_uri", date: String = "warc_date",
      recordId: String = "record_id",
      httpContentType: String = "http_content_type",
      payload: String = "payload",
      infoDate: String = "2026-01-01T00:00:00Z",
      requestHttp: Option[String] = None,
      httpStatus: Option[String] = None,
      httpHeaders: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val rows = df.select(
      col(uri).cast("string"), col(date).cast("string"),
      col(recordId).cast("string"), col(httpContentType).cast("string"),
      col(payload).cast("binary"),
      requestHttp.fold(lit(null).cast("string"))(c => col(c).cast("string")),
      httpStatus.fold(lit(null).cast("int"))(c => col(c).cast("int")),
      httpHeaders.fold(lit(null).cast("map<string,string>"))(c =>
        col(c).cast("map<string,string>")))
    archiveSave(rows, dir, codec, infoDate, r => {
      val rid = r.getString(2)
      val resp = ("response", rid, null,
        responseRecord(r.getString(0), r.getString(1), rid,
          r.getString(3),
          if (r.isNullAt(4)) Array.empty[Byte]
          else r.getAs[Array[Byte]](4),
          status = if (r.isNullAt(6)) 200 else r.getInt(6),
          extraHeaders =
            if (r.isNullAt(7)) Map.empty[String, String]
            else r.getMap[String, String](7).toMap))
      // record_id is nullable throughout the schema: a null-id row
      // still writes its response (responseRecord tolerates null) but
      // cannot anchor a Concurrent-To pair, so the request record is
      // skipped — one malformed row degrades, not the write stage
      if (r.isNullAt(5) || rid == null) Seq(resp)
      else {
        val reqId = s"<urn:graft:req:${rid.stripPrefix("<").stripSuffix(">")}>"
        // request FIRST, response second — the common crawl layout;
        // the reader pairs by Concurrent-To, not by adjacency
        Seq(("request", reqId, null,
          requestRecord(r.getString(0), r.getString(1), reqId, rid,
            r.getString(5))), resp)
      }
    })
  }

  /** Attach each `request` record's HTTP headers to its `response` via
    * the WARC-Concurrent-To pointer: response rows come back unchanged
    * plus `request_headers` (null when no request record points at
    * that response). A plain equi-join on the response record id — ids
    * are unique, so the shuffle is skew-free; at archive scale the
    * pairs co-reside in one file, but adjacency is NOT assumed
    * (ISO 28500 allows any interleaving, including cross-file). */
  def pairRequests(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val requests = df
      .filter(col("warc_type") === "request"
        && col("concurrent_to").isNotNull)
      .select(col("concurrent_to").as("record_id"),
        col("http_headers").as("request_headers"))
    df.filter(col("warc_type") === "response")
      .join(requests, Seq("record_id"), "left")
  }

  /** [[warcSave]] with DEDUPLICATED STORAGE — the layout real archival
    * crawlers write: per distinct payload digest ONE full `response`
    * record holds the bytes, and every other capture of those bytes
    * becomes a `revisit` envelope (WARC-Refers-To → the canonical
    * record, WARC-Payload-Digest = labelled sha1, identical-payload-
    * digest profile, HTTP head only). On a duplicate-heavy crawl this
    * is the difference between storing the corpus and storing its
    * distinct content.
    *
    * Canonical choice is deterministic: min (date, record_id) per
    * digest, computed as a partial-aggregating `min(struct(...))`
    * group-by + equi-join back on the digest — NOT a window, which
    * would sort each digest's captures inside one task: the hot digest
    * (empty page, parked-domain boilerplate) is exactly the case dedup
    * exists for, and its group must not need to fit one partition.
    * Both shuffles hash on the digest; AQE's skew split applies.
    *
    * Digest format: `sha1:` + uppercase hex of SHA-1 over the payload
    * bytes (computed by the codegen'd built-in; hex rather than the
    * Base32 some crawls ship — the label makes it self-describing and
    * [[expandRevisits]] follows record ids, not digest bytes). Every
    * record's digest also lands in the `_cdx` sidecar, which therefore
    * doubles as the PERSISTENT dedup index.
    *
    * `priorIndex` extends dedup ACROSS archives — the continual-crawl
    * story: pass prior batches' `_cdx` rows (columns `payload_digest`,
    * `record_id`, responses only) and any capture whose digest is
    * already indexed becomes a revisit pointing at the PRIOR canonical
    * record, storing zero payload bytes for content the crawl has ever
    * seen. The prior side reduces to one row per digest via a
    * partial-aggregating min before the join.
    *
    * Returns the response + revisit record count (every capture). */
  def warcDedupSave(
      df: DataFrame, dir: String, codec: String = "gzip",
      uri: String = "target_uri", date: String = "warc_date",
      recordId: String = "record_id",
      httpContentType: String = "http_content_type",
      payload: String = "payload",
      infoDate: String = "2026-01-01T00:00:00Z",
      httpStatus: Option[String] = None,
      priorIndex: Option[DataFrame] = None): Long = {
    import org.apache.spark.sql.functions.{
      coalesce, col, concat, lit, min, sha1, struct, upper}
    val rows = df.select(
      col(uri).cast("string").as("_uri"), col(date).cast("string").as("_dt"),
      col(recordId).cast("string").as("_rid"),
      col(httpContentType).cast("string").as("_ct"),
      coalesce(col(payload).cast("binary"), lit(Array.empty[Byte]))
        .as("_pl"),
      httpStatus.fold(lit(null).cast("int"))(c => col(c).cast("int"))
        .as("_st"))
      .withColumn("_digest", concat(lit("sha1:"), upper(sha1(col("_pl")))))
    val withPrior = priorIndex match {
      case Some(idx) =>
        // defensive min: a well-formed index has one canonical per
        // digest, but a duplicate must not fan the join out
        val prior = idx
          .filter(col("payload_digest").isNotNull)
          .select(col("payload_digest").as("_digest"),
            col("record_id").as("_prior_rid"))
          .groupBy(col("_digest"))
          .agg(min(col("_prior_rid")).as("_prior_rid"))
        rows.join(prior, Seq("_digest"), "left")
      case None =>
        rows.withColumn("_prior_rid", lit(null).cast("string"))
    }
    // canonical choice only among digests the index has never seen
    val canon = withPrior.filter(col("_prior_rid").isNull)
      .groupBy(col("_digest"))
      .agg(min(struct(col("_dt"), col("_rid"))).as("_c"))
      .select(col("_digest"), col("_c._rid").as("_fresh_rid"))
    val keyed = withPrior.join(canon, Seq("_digest"), "left").select(
      col("_uri"), col("_dt"), col("_rid"), col("_ct"), col("_pl"),
      col("_st"), col("_digest"),
      coalesce(col("_prior_rid"), col("_fresh_rid")).as("_canon_rid"))
    archiveSave(keyed, dir, codec, infoDate, r => {
      val rid = r.getString(2)
      val st = if (r.isNullAt(5)) 200 else r.getInt(5)
      val digest = r.getString(6)
      val canonRid = r.getString(7)
      if (rid == canonRid)
        Seq(("response", rid, digest,
          responseRecord(r.getString(0), r.getString(1), rid,
            r.getString(3), r.getAs[Array[Byte]](4), st, digest)))
      else
        Seq(("revisit", rid, digest,
          revisitRecord(r.getString(0), r.getString(1), rid, canonRid,
            digest, r.getString(3), st)))
    })
  }

  /** [[warcSave]] for CONDITIONAL-GET crawls — the ISO 28500 §6.7.1
    * `server-not-modified` revisit profile: a capture whose server
    * answered `304 Not Modified` carries no payload by definition, so
    * it archives as a revisit pointing at the URI's prior full capture
    * in `priorIndex` (earlier archives' `_cdx` rows — target_uri +
    * record_id, responses only). Non-304 rows (and 304s whose URI has
    * no indexed prior — nothing to refer to) archive as full
    * responses. The join hashes on target_uri: unique per crawl cycle,
    * skew-free. [[expandRevisits]] rematerializes the unchanged
    * payload from the referent on read; the revisit's own 304 status
    * is preserved (it is the honest capture record).
    * Returns the total record count (responses + revisits). */
  def warcNotModifiedSave(
      df: DataFrame, dir: String, priorIndex: DataFrame,
      codec: String = "gzip",
      uri: String = "target_uri", date: String = "warc_date",
      recordId: String = "record_id",
      httpContentType: String = "http_content_type",
      payload: String = "payload", httpStatus: String = "http_status",
      infoDate: String = "2026-01-01T00:00:00Z"): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, min}
    val prior = priorIndex
      .filter(col("target_uri").isNotNull)
      .select(col("target_uri").as("_uri"),
        col("record_id").as("_prior_rid"))
      .groupBy(col("_uri")) // defensive: one referent per URI
      .agg(min(col("_prior_rid")).as("_prior_rid"))
    val rows = df.select(
      col(uri).cast("string").as("_uri"),
      col(date).cast("string").as("_dt"),
      col(recordId).cast("string").as("_rid"),
      col(httpContentType).cast("string").as("_ct"),
      coalesce(col(payload).cast("binary"), lit(Array.empty[Byte]))
        .as("_pl"),
      col(httpStatus).cast("int").as("_st"))
      .join(prior, Seq("_uri"), "left")
    archiveSave(rows, dir, codec, infoDate, r => {
      val rid = r.getString(2)
      val st = if (r.isNullAt(5)) 200 else r.getInt(5)
      val priorRid = if (r.isNullAt(6)) null else r.getString(6)
      if (st == 304 && priorRid != null)
        Seq(("revisit", rid, null,
          revisitRecord(r.getString(0), r.getString(1), rid, priorRid,
            digest = null, r.getString(3), st,
            profile = "server-not-modified")))
      else
        Seq(("response", rid, null,
          responseRecord(r.getString(0), r.getString(1), rid,
            r.getString(3), r.getAs[Array[Byte]](4), st)))
    })
  }

  /** Compact a batched dedup archive (the `batch=<id>` tree
    * [[graft.streaming.Streams.crawlDedupArchiveSink]] grows) into ONE
    * fresh dedup archive at `destDir`: read every batch, rematerialize
    * revisits, and re-dedup from scratch — the index a later crawl
    * passes as `priorIndex` shrinks from per-batch sidecars back to a
    * single `_cdx`. Reads and writes are both distributed streaming
    * passes; the only driver-side work is the batch-dir glob. The
    * destination must be a DIFFERENT directory — the source tree stays
    * readable until the caller swaps it, the same publish discipline
    * as parquet compaction ([[graft.operators.Layout]]). Returns the
    * record count of the compacted archive. */
  def compactDedupArchive(
      spark: org.apache.spark.sql.SparkSession, batchedDir: String,
      destDir: String, codec: String = "gzip"): Long = {
    import org.apache.spark.sql.functions.col
    // qualify both paths before comparing: a trailing slash, relative
    // path, or scheme-less alias of the source must not slip past the
    // guard and let the compactor delete part files it is reading
    val fs = new Path(batchedDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val qSrc = fs.makeQualified(new Path(batchedDir))
    val qDst = fs.makeQualified(new Path(destDir))
    require(qDst != qSrc,
      "graft-warc: compact into a fresh directory, then swap")
    val full = expandRevisits(
      spark.read.format("graft-warc").load(s"$batchedDir/batch=*")
        .filter(col("warc_type").isin("response", "revisit")))
    warcDedupSave(full, destDir, codec, httpStatus = Some("http_status"))
  }

  /** Rematerialize a [[warcDedupSave]] archive: `revisit` rows come
    * back as full captures with the payload (and null-status fallback
    * fields) pulled from their WARC-Refers-To target, `warc_type`
    * rewritten to `response`; real responses pass through. The join is
    * a unique-key equi-join on the canonical record id — skew-free
    * regardless of how duplicate-heavy the corpus is, because the
    * BUILD side has one row per distinct payload. Rows whose referent
    * is missing (partial archive listing) keep their null payload —
    * degrading the row, not the scan. */
  def expandRevisits(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val originals = df.filter(col("warc_type") === "response")
      .select(col("record_id").as("_ref_rid"),
        col("payload").as("_ref_payload"),
        col("http_status").as("_ref_status"),
        col("http_content_type").as("_ref_ct"))
    val revisits = df.filter(col("warc_type") === "revisit")
      .join(originals, col("refers_to") === col("_ref_rid"), "left")
      .select(df.columns.map {
        case "warc_type" => lit("response").as("warc_type")
        // a revisit's OWN payload is the empty head-only body — the
        // real bytes live at the referent, unconditionally
        case "payload" => col("_ref_payload").as("payload")
        case "http_status" => coalesce(col("http_status"),
          col("_ref_status")).as("http_status")
        case "http_content_type" => coalesce(col("http_content_type"),
          col("_ref_ct")).as("http_content_type")
        case c => col(c)
      }.toSeq: _*)
    df.filter(col("warc_type") =!= "revisit"
      || col("warc_type").isNull).unionByName(revisits)
  }

  /** The WET analog of [[warcSave]]: archive an EXTRACTED-TEXT corpus as
    * `conversion` records (ISO 28500 §6.8 — the record type public
    * crawls ship their extracted text as), `Content-Type: text/plain`,
    * UTF-8 payloads, same member-per-record gzip layout and atomic
    * publish. The natural tail of the crawl pipeline: read WARC →
    * [[graft.operators.TextAnalysis.extractText]] → screens → `wetSave`
    * the surviving text, and the corpus re-reads through `graft-warc`
    * (q_s17 certifies the round trip). */
  def wetSave(
      df: DataFrame, dir: String, codec: String = "gzip",
      uri: String = "target_uri", date: String = "warc_date",
      recordId: String = "record_id", text: String = "text",
      infoDate: String = "2026-01-01T00:00:00Z"): Long = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(
      col(uri).cast("string"), col(date).cast("string"),
      col(recordId).cast("string"), col(text).cast("string"))
    archiveSave(rows, dir, codec, infoDate, r => {
      val rid = r.getString(2)
      Seq(("conversion", rid, null,
        conversionRecord(r.getString(0), r.getString(1), rid,
          if (r.isNullAt(3)) Array.empty[Byte]
          else r.getString(3)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    })
  }

  /** `resource` records (ISO 28500 §6.5) — direct payloads with NO
    * HTTP message envelope: the record type for archiving fetched
    * assets addressed by URI (images, scripts, data files) or locally
    * produced artifacts. Completes the writer-side record-type surface
    * (warcinfo/response/request/conversion/metadata/revisit/resource —
    * everything but segmented `continuation` records, which the
    * member-per-record layout deliberately avoids needing). Payload
    * bytes round-trip verbatim; `contentType` stamps the block's
    * Content-Type. Same layout, publish, and `_cdx` sidecar as every
    * other writer here. */
  def resourceSave(
      df: DataFrame, dir: String, codec: String = "gzip",
      uri: String = "target_uri", date: String = "warc_date",
      recordId: String = "record_id",
      contentType: String = "content_type", payload: String = "payload",
      infoDate: String = "2026-01-01T00:00:00Z"): Long = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(
      col(uri).cast("string"), col(date).cast("string"),
      col(recordId).cast("string"), col(contentType).cast("string"),
      col(payload).cast("binary"))
    archiveSave(rows, dir, codec, infoDate, r => {
      val rid = r.getString(2)
      Seq(("resource", rid, null,
        resourceRecord(r.getString(0), r.getString(1), rid,
          r.getString(3),
          if (r.isNullAt(4)) Array.empty[Byte]
          else r.getAs[Array[Byte]](4))))
    })
  }

  /** One `resource` record: WARC envelope over raw payload bytes. */
  private[sources] def resourceRecord(
      uri: String, date: String, recordId: String, contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val ct = if (contentType == null) "application/octet-stream"
      else contentType
    val envelope =
      (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"WARC-Record-ID: $recordId\r\n" +
        s"WARC-Date: $date\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Type: $ct\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(utf8)
    val bos = new java.io.ByteArrayOutputStream(
      envelope.length + payload.length + 4)
    bos.write(envelope); bos.write(payload)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  /** The WAT analog of [[warcSave]]/[[wetSave]] — the third member of
    * the public-crawl format triad: per page one `metadata` record
    * whose payload is a JSON document (headers, status, outlinks —
    * whatever the caller packs via `to_json`), `WARC-Refers-To`
    * pointing at the page's archive record when a referent column is
    * given. Same member-per-record layout, atomic publish, and `_cdx`
    * sidecar as the other writers; re-reads through `graft-warc` with
    * the JSON payload decoding via `from_json`/`get_json_object`. */
  def watSave(
      df: DataFrame, dir: String, codec: String = "gzip",
      uri: String = "target_uri", date: String = "warc_date",
      recordId: String = "record_id", metaJson: String = "metadata",
      refersTo: Option[String] = None,
      infoDate: String = "2026-01-01T00:00:00Z"): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val rows = df.select(
      col(uri).cast("string"), col(date).cast("string"),
      col(recordId).cast("string"), col(metaJson).cast("string"),
      refersTo.fold(lit(null).cast("string"))(c => col(c).cast("string")))
    archiveSave(rows, dir, codec, infoDate, r => {
      val rid = r.getString(2)
      Seq(("metadata", rid, null,
        metadataRecord(r.getString(0), r.getString(1), rid,
          if (r.isNullAt(4)) null else r.getString(4),
          if (r.isNullAt(3)) Array.empty[Byte]
          else r.getString(3)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    })
  }

  /** The PINNED graft WAT payload shape — what [[watPayload]] packs
    * and [[watEntries]] parses back, so a WAT consumer never hand-
    * writes `from_json` schemas against this writer. Field set follows
    * what public WAT records actually get queried for: the fetch
    * status, the served Content-Type, the page `<title>`, and the
    * RESOLVED outlink array ([[graft.operators.Outlinks.pageLinks]]).
    * All fields nullable — `to_json` drops nulls and `from_json` reads
    * absences back as null, so partial producers round-trip. */
  val WatPayloadSchema: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("links", ArrayType(StringType, containsNull = false),
      nullable = true)))

  /** The canonical WAT JSON payload (one codegen'd `to_json`, no
    * shuffle) — feed it to [[watSave]]'s `metaJson` column. */
  def watPayload(status: org.apache.spark.sql.Column,
      contentType: org.apache.spark.sql.Column,
      title: org.apache.spark.sql.Column,
      links: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{struct, to_json}
    to_json(struct(status.cast("int").as("status"),
      contentType.cast("string").as("content_type"),
      title.cast("string").as("title"),
      links.as("links")))
  }

  /** Typed read-back of a WAT archive ([[watSave]] + [[watPayload]]):
    * `metadata` records of a `graft-warc` frame parsed against the
    * pinned [[WatPayloadSchema]] — one row per WAT record with the
    * envelope columns (`target_uri`, `warc_date`, `record_id`,
    * `refers_to`) and the payload fields (`status`, `content_type`,
    * `title`, `links array<string>`) as top-level columns. Narrow
    * per-row work (`from_json` is codegen'd); a payload that is not
    * valid JSON yields null fields, not an error — foreign WAT
    * archives degrade instead of failing the scan. */
  def watEntries(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, decode, from_json}
    df.filter(col("warc_type") === "metadata")
      .select(col("target_uri"), col("warc_date"), col("record_id"),
        col("refers_to"),
        from_json(decode(col("payload"), "UTF-8"), WatPayloadSchema)
          .as("_wat"))
      .select("target_uri", "warc_date", "record_id", "refers_to",
        "_wat.status", "_wat.content_type", "_wat.title", "_wat.links")
  }

  /** Typed read-back of a WET archive ([[wetSave]]) — the symmetric
    * helper to [[watEntries]], so the text tier consumes `conversion`
    * records without hand-written payload parsing: one row per WET
    * record with `target_uri`, `warc_date`, `record_id`, and `text`
    * (the payload decoded as the UTF-8 the writer contractually
    * emits — foreign archives with other encodings should go through
    * [[graft.operators.CharsetDecode]] on the raw frame instead).
    * Narrow per-row decode, no shuffle; `warc_type` equality pushes
    * into the `graft-warc` scan. */
  def wetEntries(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, decode}
    df.filter(col("warc_type") === "conversion")
      .select(col("target_uri"), col("warc_date"), col("record_id"),
        decode(col("payload"), "UTF-8").as("text"))
  }

  /** One `metadata` record: WARC envelope over a JSON block. */
  private[sources] def metadataRecord(
      uri: String, date: String, recordId: String, refersTo: String,
      json: Array[Byte]): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val refLine =
      if (refersTo == null) "" else s"WARC-Refers-To: $refersTo\r\n"
    val envelope =
      (s"WARC/1.0\r\nWARC-Type: metadata\r\n" +
        s"WARC-Record-ID: $recordId\r\n" +
        s"WARC-Date: $date\r\nWARC-Target-URI: $uri\r\n" + refLine +
        "Content-Type: application/json\r\n" +
        s"Content-Length: ${json.length}\r\n\r\n").getBytes(utf8)
    val bos = new java.io.ByteArrayOutputStream(
      envelope.length + json.length + 4)
    bos.write(envelope); bos.write(json)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  /** The CDX sidecar's schema: one row per record with its EXACT byte
    * extent inside its archive file — for a `.warc.gz` the extent is one
    * whole gzip member, so a reader can seek + bounded-read + gunzip
    * exactly one record (the layout public crawl indexes describe).
    * `payload_digest` rides along when the writer computed one (real
    * public CDX files carry it too): it is the PERSISTENT DEDUP INDEX —
    * [[warcDedupSave]]'s priorIndex is exactly prior batches' sidecar
    * rows, no separate index structure to maintain. */
  val CdxSchema: StructType = StructType(Seq(
    StructField("target_uri", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = false),
    StructField("warc_file", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("payload_digest", StringType, nullable = true)))

  /** Archive part-file names this writer mints — also the overwrite
    * set: [[archiveSave]] clears matching stale files up front. */
  private val PartName = "part-\\d{5}\\.warc(\\.gz|\\.zst)?".r

  private[sources] def memberExt(codec: String): String = codec match {
    case "gzip" => ".warc.gz"
    case "zstd" => ".warc.zst"
    case "none" => ".warc"
    case other => throw new IllegalArgumentException(
      s"graft-warc: unknown archive codec '$other' " +
        "(gzip | zstd | none)")
  }

  /** Shared partition-archive loop: one warcinfo-led `.warc[.gz|.zst]`
    * file per partition, one compressed member (gzip member / zstd
    * frame) per record, tmp+rename publish. `mkRecords` turns each
    * projected row into its framed records — usually one, two when a
    * `request` record rides with its response — as (warc_type,
    * record_id, bytes); rows carry `target_uri` at ordinal 0 for the
    * index. The SAME pass emits each record's (offset, length) extent,
    * written as the `_cdx` parquet sidecar (underscore-prefixed — the
    * archive listing skips it): the record-level random-access index
    * [[warcFetch]] seeks with. Ordering is crash-safe: every archive
    * file publishes (tmp+rename) inside its task, and the sidecar
    * commits through Spark's output committer only after all tasks —
    * a visible `_cdx` implies every file it points into is live.
    *
    * Re-run/replay semantics are OVERWRITE: existing `part-*` archive
    * files (and crashed `.tmp` leftovers) are deleted up front, and
    * each publish deletes its destination before the rename — Hadoop
    * `rename` does not overwrite on HDFS/object stores, and a replayed
    * `foreachBatch` that repartitions smaller must not leave the prior
    * attempt's extra part files for the glob reader to double-count. */
  /** mkRecords yields (warc_type, record_id, payload_digest|null,
    * framed bytes) per record. */
  private def archiveSave(
      rows: DataFrame, dir: String, codec: String, infoDate: String,
      mkRecords: org.apache.spark.sql.Row
        => Seq[(String, String, String, Array[Byte])]): Long = {
    val spark = rows.sparkSession
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val fs0 = new Path(dir).getFileSystem(conf.value)
    fs0.mkdirs(new Path(dir))
    val ext = memberExt(codec)
    fs0.listStatus(new Path(dir)).map(_.getPath).foreach { p =>
      val n = p.getName
      if (PartName.matches(n) || (n.startsWith(".") && n.endsWith(".tmp")))
        fs0.delete(p, false)
    }
    val cdxRows = rows.rdd.mapPartitionsWithIndex { (pid, it) =>
      // a PRIVATE FileSystem instance: setWriteChecksum mutates the
      // instance it is called on, and the JVM-cached shared one must
      // keep its .crc behavior for every other writer on this executor
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(
        new Path(dir).toUri, conf.value)
      val cdx = scala.collection.mutable.ArrayBuffer[Row]()
      try {
        fs.setWriteChecksum(false) // no .crc sidecars in the archive dir
        val name = f"part-$pid%05d$ext"
        val tmp = new Path(dir, s".$name.tmp")
        val out = fs.create(tmp, true)
        val fullPath = fs.makeQualified(new Path(dir, name)).toString
        // ONE deflater for the whole file, reset per member — a fresh
        // GZIPOutputStream per record leaks a native zlib context per
        // record until GC (finish() never end()s its deflater): the
        // classic off-heap OOM on a million-record partition
        val gzw = if (codec == "gzip") new GzipMemberWriter(out) else null
        var pos = 0L
        try {
          def member(recBytes: Array[Byte]): Long = {
            codec match {
              case "gzip" => gzw.writeMember(recBytes)
              case "zstd" => out.write(
                com.github.luben.zstd.Zstd.compress(recBytes, 3))
              case _ => out.write(recBytes)
            }
            val start = pos
            pos = out.getPos
            pos - start
          }
          val infoLen = member(WarcIO.warcinfoRecord(name, infoDate))
          cdx += Row(null, s"<urn:graft:warcinfo:$name>", "warcinfo",
            fullPath, 0L, infoLen, null)
          it.foreach { r =>
            val uri = r.getString(0)
            mkRecords(r).foreach { case (recType, recId, digest, bytes) =>
              val start = pos
              val len = member(bytes)
              cdx += Row(uri, recId, recType, fullPath, start, len, digest)
            }
          }
        } finally {
          if (gzw != null) gzw.end()
          out.close()
        }
        val dest = new Path(dir, name)
        fs.delete(dest, false) // rename won't overwrite on HDFS/object stores
        require(fs.rename(tmp, dest),
          s"graft-warc: could not publish $name under $dir")
      } finally fs.close()
      cdx.iterator
    }
    spark.createDataFrame(cdxRows, CdxSchema)
      .write.mode("overwrite").parquet(s"$dir/_cdx")
    spark.read.parquet(s"$dir/_cdx")
      .filter(org.apache.spark.sql.functions.col("warc_type")
        =!= "warcinfo")
      .filter(org.apache.spark.sql.functions.col("warc_type")
        =!= "request").count()
  }

  /** Record-level RANDOM ACCESS into an archive [[warcSave]]/[[wetSave]]
    * wrote: join the wanted URIs against the `_cdx` sidecar, seek each
    * matched record's exact byte extent, and parse just that record —
    * fetching a thousand pages out of a 100 TB archive reads kilobytes
    * per page instead of scanning the corpus. Matched extents
    * repartition by file and sort by offset, so each task sweeps its
    * files forward instead of seeking randomly. Output schema =
    * [[WarcSource.Schema]] (what a full scan of only those records
    * would return). */
  def warcFetch(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      uris: DataFrame, uriCol: String = "target_uri"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val matched = spark.read.parquet(s"$dir/_cdx")
      .join(uris.select(col(uriCol).cast("string").as("target_uri"))
        .distinct(), "target_uri")
      .select("warc_file", "offset", "length")
      .repartition(spark.sparkContext.defaultParallelism,
        col("warc_file"))
      .sortWithinPartitions(col("warc_file"), col("offset"))
    val required = WarcSource.Schema
    val rows = matched.rdd.mapPartitions { it =>
      var openFile: String = null
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      def ensureOpen(f: String): org.apache.hadoop.fs.FSDataInputStream = {
        if (openFile != f) {
          if (in != null) in.close()
          val p = new Path(f)
          in = p.getFileSystem(conf.value).open(p)
          openFile = f
        }
        in
      }
      val out = it.map { r =>
        val (f, off, len) =
          (r.getString(0), r.getLong(1), r.getLong(2))
        require(len > 0 && len <= Int.MaxValue - 8,
          s"graft-warc: $f: unfetchable record extent $len at $off " +
            "(corrupt _cdx row?)")
        val stream = ensureOpen(f)
        stream.seek(off)
        val bytes = new Array[Byte](len.toInt)
        stream.readFully(bytes)
        val slice: java.io.InputStream =
          new java.io.BufferedInputStream(
            WarcCodec.decompressed(
              new java.io.ByteArrayInputStream(bytes), f), 1 << 14)
        val rec = new WarcRecordIterator(slice, f, needBlock = true,
          needHeaders = true).next()
        Row(rec.recordId, rec.warcType, rec.targetUri, rec.warcDate,
          rec.contentType, rec.contentLength, rec.httpStatus,
          rec.httpContentType, rec.concurrentTo, rec.refersTo,
          rec.payloadDigest,
          if (rec.httpHeaders == null) null
          else scala.collection.immutable.ListMap(rec.httpHeaders: _*),
          rec.payload, f)
      }
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h && in != null) { in.close(); in = null }
          h
        }
        def next(): Row = out.next()
      }
    }
    spark.createDataFrame(rows, required)
  }

  /** One `conversion` record: WARC envelope over a raw text block. */
  private[sources] def conversionRecord(
      uri: String, date: String, recordId: String,
      textBytes: Array[Byte]): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val envelope =
      (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Record-ID: $recordId\r\n" +
        s"WARC-Date: $date\r\nWARC-Target-URI: $uri\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${textBytes.length}\r\n\r\n").getBytes(utf8)
    val bos = new java.io.ByteArrayOutputStream(
      envelope.length + textBytes.length + 4)
    bos.write(envelope); bos.write(textBytes)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  /** One `request` record: WARC envelope (Concurrent-To pointing at
    * its response) + the captured HTTP request head, empty body. */
  private[sources] def requestRecord(
      uri: String, date: String, recordId: String, concurrentTo: String,
      httpHead: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val head = if (httpHead == null) "" else httpHead
    val block = (head.stripSuffix("\r\n") + "\r\n\r\n").getBytes(utf8)
    val envelope =
      (s"WARC/1.0\r\nWARC-Type: request\r\nWARC-Record-ID: $recordId\r\n" +
        s"WARC-Date: $date\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Concurrent-To: $concurrentTo\r\n" +
        "Content-Type: application/http; msgtype=request\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes(utf8)
    val bos = new java.io.ByteArrayOutputStream(
      envelope.length + block.length + 4)
    bos.write(envelope); bos.write(block)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  /** RFC 9110 reason phrases for the statuses a crawl actually sees;
    * anything else gets the bare "Status" phrase (readers parse the
    * CODE — the phrase is decorative, RFC 9112 §4 allows any text). */
  private val ReasonPhrase = Map(
    200 -> "OK", 201 -> "Created", 204 -> "No Content",
    206 -> "Partial Content", 301 -> "Moved Permanently", 302 -> "Found",
    303 -> "See Other", 304 -> "Not Modified", 307 -> "Temporary Redirect",
    308 -> "Permanent Redirect", 400 -> "Bad Request", 401 -> "Unauthorized",
    403 -> "Forbidden", 404 -> "Not Found", 410 -> "Gone",
    429 -> "Too Many Requests", 500 -> "Internal Server Error",
    502 -> "Bad Gateway", 503 -> "Service Unavailable",
    504 -> "Gateway Timeout")

  /** One `response` record: WARC envelope + an HTTP/1.1 message with
    * the capture's REAL status line (200 when the crawl did not record
    * one). `digest` (labelled, e.g. "sha1:…"), when non-null, rides as
    * WARC-Payload-Digest — what `revisit` records point back at. */
  private[sources] def responseRecord(
      uri: String, date: String, recordId: String, httpCt: String,
      payload: Array[Byte], status: Int = 200,
      digest: String = null,
      extraHeaders: Map[String, String] = Map.empty): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val phrase = ReasonPhrase.getOrElse(status, "Status")
    // captured response headers ride between Content-Type and
    // Content-Length; the framing trio stays writer-owned (skipped
    // case-insensitively — a stale captured Content-Length would
    // corrupt the member framing, and a captured Transfer-Encoding
    // would tell a reader to dechunk a payload that is stored as
    // identity bytes), and header-breaking characters are defanged on
    // BOTH sides: values get CR/LF collapsed, and a KEY that is not a
    // valid RFC 9110 token is dropped outright — a key like
    // "X\r\nTransfer-Encoding" would otherwise inject a header line
    // the filter above never saw
    // sorted by key: a canonical, replay-deterministic order (header
    // order is not semantic in HTTP; duplicate headers are already a
    // documented limitation of the map representation)
    val extras = extraHeaders.toSeq.sortBy(_._1)
      .filter { case (k, _) =>
        k != null && k.nonEmpty &&
          k.forall(c => c < 127 && (c.isLetterOrDigit ||
            "!#$%&'*+-.^_`|~".indexOf(c) >= 0)) && {
            val lk = k.toLowerCase(java.util.Locale.ROOT)
            lk != "content-type" && lk != "content-length" &&
              lk != "transfer-encoding"
          }
      }
      .map { case (k, v) =>
        s"$k: ${if (v == null) "" else v.replaceAll("[\\r\\n]+", " ")}\r\n"
      }.mkString
    val httpHead =
      (s"HTTP/1.1 $status $phrase\r\nContent-Type: $httpCt\r\n" + extras +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(utf8)
    val blockLen = httpHead.length + payload.length
    val digestLine =
      if (digest == null) "" else s"WARC-Payload-Digest: $digest\r\n"
    val envelope =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: $recordId\r\n" +
        s"WARC-Date: $date\r\nWARC-Target-URI: $uri\r\n" + digestLine +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: $blockLen\r\n\r\n").getBytes(utf8)
    val bos = new java.io.ByteArrayOutputStream(
      envelope.length + blockLen + 4)
    bos.write(envelope); bos.write(httpHead); bos.write(payload)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  /** One `revisit` record (ISO 28500 §6.7): the crawl-side DEDUP
    * storage form — an envelope that says "this capture's bytes live
    * at [[WARC-Refers-To]]", carrying only the HTTP message HEAD
    * (status line + headers, no body). Two profiles:
    * `identical-payload-digest` (§6.7.2 — same bytes seen before,
    * `digest` required) and `server-not-modified` (§6.7.1 — the server
    * answered 304, no digest to record). [[WarcIO.expandRevisits]]
    * rematerializes either on read. */
  private[sources] def revisitRecord(
      uri: String, date: String, recordId: String, refersTo: String,
      digest: String, httpCt: String, status: Int,
      profile: String = "identical-payload-digest"): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val phrase = ReasonPhrase.getOrElse(status, "Status")
    // head only — no Content-Length header, so nothing implies a body
    val httpHead =
      (s"HTTP/1.1 $status $phrase\r\nContent-Type: $httpCt\r\n\r\n")
        .getBytes(utf8)
    val digestLine =
      if (digest == null) "" else s"WARC-Payload-Digest: $digest\r\n"
    val envelope =
      (s"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Record-ID: $recordId\r\n" +
        s"WARC-Date: $date\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Refers-To: $refersTo\r\n" + digestLine +
        s"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/" +
        s"$profile\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${httpHead.length}\r\n\r\n").getBytes(utf8)
    val bos = new java.io.ByteArrayOutputStream(
      envelope.length + httpHead.length + 4)
    bos.write(envelope); bos.write(httpHead)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  /** The file-leading `warcinfo` record (ISO 28500 convention). */
  private[sources] def warcinfoRecord(
      filename: String, date: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val fields =
      ("software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n")
        .getBytes(utf8)
    val envelope =
      (s"WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
        s"WARC-Record-ID: <urn:graft:warcinfo:$filename>\r\n" +
        s"WARC-Date: $date\r\nWARC-Filename: $filename\r\n" +
        "Content-Type: application/warc-fields\r\n" +
        s"Content-Length: ${fields.length}\r\n\r\n").getBytes(utf8)
    val bos = new java.io.ByteArrayOutputStream(
      envelope.length + fields.length + 4)
    bos.write(envelope); bos.write(fields)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }
}
