package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{WarcHttp, WarcIO}

/** The `graft-warc` crawl source: envelope/HTTP parsing on hand-built
  * archives (every record type, folded headers, chunked bodies, hostile
  * framing), byte-exact round-trips through the distributed writer's
  * member-per-record gzip layout, column pruning, and the streaming
  * landing-directory story with exactly-once restart. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_warc_$tag")

  /** One raw record with computed Content-Length + separators. */
  private def rec(tpe: String, extra: Seq[(String, String)],
      block: Array[Byte]): Array[Byte] = {
    val head = (Seq("WARC-Type" -> tpe) ++ extra ++
      Seq("Content-Length" -> block.length.toString))
      .map { case (k, v) => s"$k: $v\r\n" }.mkString
    val env = s"WARC/1.0\r\n$head\r\n".getBytes(UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(env); bos.write(block); bos.write("\r\n\r\n".getBytes(UTF_8))
    bos.toByteArray
  }

  private def httpBlock(status: String, headers: Seq[(String, String)],
      body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status\r\n" +
      headers.map { case (k, v) => s"$k: $v\r\n" }.mkString + "\r\n")
      .getBytes(UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(head); bos.write(body)
    bos.toByteArray
  }

  test("plain .warc: every record type parses; chunked bodies decode") {
    val dir = tmp("plain")
    val body = "<html><body>hi &amp; bye</body></html>".getBytes(UTF_8)
    val chunkedBody =
      ("7\r\n<html><\r\n" + "6;ext=1\r\n/html>\r\n" + "0\r\n\r\n")
        .getBytes(UTF_8)
    val bytes = Seq(
      rec("warcinfo", Seq(
        "WARC-Record-ID" -> "<urn:w:info>",
        "WARC-Date" -> "2026-02-03T04:05:06Z",
        "Content-Type" -> "application/warc-fields"),
        "software: test\r\n".getBytes(UTF_8)),
      rec("request", Seq(
        "WARC-Record-ID" -> "<urn:w:req>",
        "WARC-Target-URI" -> "https://x.example/a",
        "Content-Type" -> "application/http; msgtype=request"),
        "GET /a HTTP/1.1\r\nHost: x.example\r\n\r\n".getBytes(UTF_8)),
      rec("response", Seq(
        "WARC-Record-ID" -> "<urn:w:resp>",
        "WARC-Target-URI" -> "https://x.example/a",
        "WARC-Date" -> "2026-02-03T04:05:07Z",
        "Content-Type" -> "application/http; msgtype=response"),
        httpBlock("200 OK",
          Seq("Content-Type" -> "text/html; charset=utf-8"), body)),
      rec("response", Seq(
        "WARC-Record-ID" -> "<urn:w:chunked>",
        "WARC-Target-URI" -> "https://x.example/c",
        "Content-Type" -> "application/http"),
        httpBlock("404 Not Found",
          Seq("Content-Type" -> "text/html",
            "Transfer-Encoding" -> "chunked"), chunkedBody)),
      rec("metadata", Seq(
        "WARC-Record-ID" -> "<urn:w:meta>",
        "WARC-Target-URI" -> "https://x.example/a",
        "Content-Type" -> "application/json"),
        """{"k":1}""".getBytes(UTF_8))
    ).reduce(_ ++ _)
    java.nio.file.Files.write(dir.resolve("sample.warc"), bytes)

    val df = spark.read.format("graft-warc").load(dir.toString)
    val rows = df.collect().map(r => r.getAs[String]("record_id") -> r).toMap
    assert(rows.size == 5)
    val info = rows("<urn:w:info>")
    assert(info.getAs[String]("warc_type") == "warcinfo"
      && info.getAs[String]("target_uri") == null
      && info.getAs[Integer]("http_status") == null)
    val req = rows("<urn:w:req>")
    assert(req.getAs[String]("warc_type") == "request"
      && req.getAs[Integer]("http_status") == null, // no status line
      "request records carry no status")
    val resp = rows("<urn:w:resp>")
    assert(resp.getAs[Int]("http_status") == 200
      && resp.getAs[String]("http_content_type")
        == "text/html; charset=utf-8"
      && resp.getAs[String]("warc_date") == "2026-02-03T04:05:07Z"
      && java.util.Arrays.equals(resp.getAs[Array[Byte]]("payload"), body))
    val chunked = rows("<urn:w:chunked>")
    assert(chunked.getAs[Int]("http_status") == 404)
    assert(new String(chunked.getAs[Array[Byte]]("payload"), UTF_8)
      == "<html></html>", "chunked body must decode")
    val meta = rows("<urn:w:meta>")
    assert(meta.getAs[String]("content_type") == "application/json"
      && new String(meta.getAs[Array[Byte]]("payload"), UTF_8)
        == """{"k":1}""", "non-http blocks pass through raw")
    // provenance + envelope length
    assert(rows.values.forall(_.getAs[String]("warc_file")
      .endsWith("sample.warc")))
    assert(meta.getAs[Long]("content_length") == 7L)
  }

  test("writer round-trip: member-per-record gzip archives read back byte-exact") {
    val dir = tmp("rt")
    import spark.implicits._
    val docs = (0 until 57).map { i =>
      (s"https://example.org/p/$i", "2026-01-01T00:00:00Z",
        s"<urn:graft:doc:$i>", "text/html; charset=utf-8",
        s"<html><body>doc $i ${"x" * (i % 13)}</body></html>"
          .getBytes(UTF_8))
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload")
    val written = WarcIO.warcSave(docs.repartition(4), dir.toString)
    assert(written == 57L)
    val names = new java.io.File(dir.toString).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".warc.gz")) == 4
      && !names.exists(_.startsWith(".")), s"bad layout: ${names.toSeq}")
    val back = spark.read.format("graft-warc").load(dir.toString)
    assert(back.filter(col("warc_type") === "warcinfo").count() == 4)
    val got = back.filter(col("warc_type") === "response")
      .select("target_uri", "warc_date", "record_id", "http_content_type",
        "http_status", "payload")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), new String(r.getAs[Array[Byte]](5),
          UTF_8))).toSet
    val want = docs.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), 200,
      new String(r.getAs[Array[Byte]](4), UTF_8))).toSet
    assert(got == want, "round-trip drifted")
    // plain (non-gzip) variant reads through the same parser
    val dir2 = tmp("rt_plain")
    WarcIO.warcSave(docs.limit(5).repartition(1), dir2.toString,
      codec = "none")
    assert(spark.read.format("graft-warc").load(dir2.toString)
      .filter(col("warc_type") === "response").count() == 5)
  }

  test("http status fidelity: real status lines round-trip; unknown and null codes behave") {
    val dir = tmp("status")
    import spark.implicits._
    val docs = Seq(
      ("https://x.example/ok", 200: Integer),
      ("https://x.example/moved", 301: Integer),
      ("https://x.example/missing", 404: Integer),
      ("https://x.example/down", 503: Integer),
      ("https://x.example/odd", 599: Integer), // no RFC phrase — bare fallback
      ("https://x.example/null", null: Integer) // null → 200 default
    ).zipWithIndex.map { case ((u, st), i) =>
      (u, "2026-01-01T00:00:00Z", s"<urn:graft:st:$i>", "text/html",
        s"<html>page $i</html>".getBytes(UTF_8), st)
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload", "status")
    WarcIO.warcSave(docs.repartition(2), dir.toString,
      httpStatus = Some("status"))
    val back = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("warc_type") === "response")
      .select("target_uri", "http_status", "payload")
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        new String(r.getAs[Array[Byte]](2), UTF_8))).toSet
    assert(back == Set(
      ("https://x.example/ok", 200, "<html>page 0</html>"),
      ("https://x.example/moved", 301, "<html>page 1</html>"),
      ("https://x.example/missing", 404, "<html>page 2</html>"),
      ("https://x.example/down", 503, "<html>page 3</html>"),
      ("https://x.example/odd", 599, "<html>page 4</html>"),
      ("https://x.example/null", 200, "<html>page 5</html>")),
      "status lines drifted through the round trip")
  }

  test("revisit dedup storage: duplicates become revisit envelopes; expandRevisits rematerializes") {
    val dir = tmp("revisit")
    import spark.implicits._
    // 6 captures, 3 distinct payloads: A x3 (distinct dates — canonical
    // must be the EARLIEST capture), B x2, C x1
    val docs = Seq(
      ("https://x.example/a1", "2026-01-03T00:00:00Z", "<urn:g:a1>", "A"),
      ("https://x.example/a2", "2026-01-01T00:00:00Z", "<urn:g:a2>", "A"),
      ("https://x.example/a3", "2026-01-02T00:00:00Z", "<urn:g:a3>", "A"),
      ("https://x.example/b1", "2026-01-01T00:00:00Z", "<urn:g:b1>", "B"),
      ("https://x.example/b2", "2026-01-01T00:00:00Z", "<urn:g:b2>", "B"),
      ("https://x.example/c1", "2026-01-01T00:00:00Z", "<urn:g:c1>", "C")
    ).map { case (u, dt, rid, p) =>
      (u, dt, rid, "text/plain", s"payload $p".getBytes(UTF_8))
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload")
    val written = WarcIO.warcDedupSave(docs.repartition(3), dir.toString)
    assert(written == 6L, "every capture counts, revisit or not")
    val raw = spark.read.format("graft-warc").load(dir.toString)
    val responses = raw.filter(col("warc_type") === "response")
    val revisits = raw.filter(col("warc_type") === "revisit")
    assert(responses.count() == 3, "one full response per distinct payload")
    // every record (both kinds) carries the labelled digest
    assert(raw.filter(col("warc_type").isin("response", "revisit"))
      .filter(!col("payload_digest").startsWith("sha1:")).count() == 0)
    val revRows = revisits
      .select("record_id", "refers_to", "payload", "http_status")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Array[Byte]](2).length, r.getInt(3))).toSet
    // canonical for A is the EARLIEST capture a2; for B the id tiebreak b1
    assert(revRows == Set(
      ("<urn:g:a1>", "<urn:g:a2>", 0, 200),
      ("<urn:g:a3>", "<urn:g:a2>", 0, 200),
      ("<urn:g:b2>", "<urn:g:b1>", 0, 200)),
      s"revisit envelopes drifted: $revRows")
    // expandRevisits: all six captures back with their real bytes
    val expanded = WarcIO.expandRevisits(
      raw.filter(col("warc_type").isin("response", "revisit")))
    val got = expanded.select("target_uri", "warc_type", "payload")
      .collect().map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), UTF_8))).toSet
    assert(got == docs.collect().map(r => (r.getString(0), "response",
      new String(r.getAs[Array[Byte]](4), UTF_8))).toSet,
      "rematerialization drifted")
    // a missing referent degrades the row (null payload), not the scan
    val orphaned = WarcIO.expandRevisits(
      raw.filter(col("warc_type") === "revisit"))
    assert(orphaned.count() == 3
      && orphaned.filter(col("payload").isNull).count() == 3,
      "orphaned revisits must survive with null payloads")
  }

  test("wetSave: conversion records round-trip extracted text byte-exact") {
    val dir = tmp("wet")
    import spark.implicits._
    val docs = (0 until 23).map { i =>
      (s"https://example.org/p/$i", "2026-01-01T00:00:00Z",
        s"<urn:graft:wet:$i>", s"extracted text $i\nsecond line é$i")
    }.toDF("target_uri", "warc_date", "record_id", "text")
    assert(WarcIO.wetSave(docs.repartition(3), dir.toString) == 23L)
    val back = spark.read.format("graft-warc").load(dir.toString)
    assert(back.filter(col("warc_type") === "warcinfo").count() == 3)
    val conv = back.filter(col("warc_type") === "conversion")
    val got = conv.select("target_uri", "record_id", "payload",
        "content_type", "http_status", "content_length")
      .collect().map { r =>
        assert(r.getAs[String]("content_type") == "text/plain")
        assert(r.getAs[Integer]("http_status") == null,
          "conversion records carry no HTTP message")
        val text = new String(r.getAs[Array[Byte]]("payload"),
          java.nio.charset.StandardCharsets.UTF_8)
        assert(r.getAs[Long]("content_length") ==
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
        (r.getString(0), r.getString(1), text)
      }.toSet
    val want = docs.collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3))).toSet
    assert(got == want, "WET round-trip drifted")
  }

  test("column pruning: a manifest scan skips content blocks") {
    val dir = tmp("prune")
    import spark.implicits._
    val docs = (0 until 9).map { i =>
      (s"https://e/$i", "2026-01-01T00:00:00Z", s"<urn:d:$i>",
        "text/html", s"payload $i".getBytes(UTF_8))
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload")
    WarcIO.warcSave(docs.repartition(1), dir.toString)
    val manifest = spark.read.format("graft-warc").load(dir.toString)
      .select("target_uri", "warc_type", "content_length")
    // pruning reaches the scan: ReadSchema carries only the manifest cols
    val plan = manifest.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"),
      s"payload survived pruning in:\n$plan")
    val uris = manifest.filter(col("warc_type") === "response")
      .collect().map(_.getString(0)).toSet
    assert(uris == (0 until 9).map(i => s"https://e/$i").toSet)
  }

  test("CDX sidecar + warcFetch: record-level random access is byte-exact") {
    val dir = tmp("cdx")
    import spark.implicits._
    val docs = (0 until 57).map { i =>
      (s"https://example.org/p/$i", "2026-01-01T00:00:00Z",
        s"<urn:graft:doc:$i>", "text/html; charset=utf-8",
        s"<html>fetch target $i ${"y" * (i % 11)}</html>".getBytes(UTF_8))
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload")
    WarcIO.warcSave(docs.repartition(4), dir.toString)
    // the sidecar indexes every record with its exact member extent
    val cdx = spark.read.parquet(s"$dir/_cdx")
    assert(cdx.count() == 57 + 4) // + one warcinfo per file
    assert(cdx.filter(col("length") <= 0 || col("offset") < 0).count() == 0)
    // extents tile each file exactly: sum(length) == file size
    val sizes = cdx.groupBy("warc_file")
      .agg(sum(col("length")).as("bytes")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    sizes.foreach { case (f, bytes) =>
      val real = new java.io.File(new java.net.URI(f)).length()
      assert(real == bytes, s"$f: indexed $bytes vs on-disk $real")
    }
    // fetch a subset: byte-exact payloads, full reader schema
    val want = (0 until 57).filter(_ % 7 == 3)
    val uris = want.map(i => s"https://example.org/p/$i").toDF("target_uri")
    val fetched = graft.sources.WarcIO.warcFetch(spark, dir.toString, uris)
    assert(fetched.schema == spark.read.format("graft-warc")
      .load(dir.toString).schema)
    val got = fetched.collect().map { r =>
      (r.getAs[String]("target_uri"), r.getAs[Int]("http_status"),
        new String(r.getAs[Array[Byte]]("payload"), UTF_8))
    }.toSet
    assert(got == want.map(i => (s"https://example.org/p/$i", 200,
      s"<html>fetch target $i ${"y" * (i % 11)}</html>")).toSet)
    // absent uris fetch nothing; plain (non-gzip) archives seek too
    assert(graft.sources.WarcIO.warcFetch(spark, dir.toString,
      Seq("https://nowhere/x").toDF("target_uri")).count() == 0)
    val plainDir = tmp("cdx_plain")
    WarcIO.warcSave(docs.limit(9).repartition(1), plainDir.toString,
      codec = "none")
    assert(graft.sources.WarcIO.warcFetch(spark, plainDir.toString,
      Seq("https://example.org/p/5").toDF("target_uri"))
      .select("payload").collect().map(r =>
        new String(r.getAs[Array[Byte]](0), UTF_8)).toSeq
      == Seq(s"<html>fetch target 5 ${"y" * 5}</html>"))
  }

  test("warc_type pushdown reaches the record loop; results stay exact") {
    val dir = tmp("push")
    import spark.implicits._
    val docs = (0 until 12).map { i =>
      (s"https://e/$i", "2026-01-01T00:00:00Z", s"<urn:p:$i>",
        "text/html", s"page $i".getBytes(UTF_8))
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload")
    WarcIO.warcSave(docs.repartition(2), dir.toString)     // + 2 warcinfo
    val wet = tmp("push_wet")
    WarcIO.wetSave(docs.limit(5).select(col("target_uri"),
      col("warc_date"), col("record_id"),
      decode(col("payload"), "UTF-8").as("text")).repartition(1),
      wet.toString)
    new java.io.File(wet.toString).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).foreach(f =>
        java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(
          dir.toString, s"wet-${f.getName}")))
    val all = spark.read.format("graft-warc").load(dir.toString)
    // 12 responses + 5 conversions + 3 warcinfo
    assert(all.count() == 20)
    val responses = all.filter(col("warc_type") === "response")
    responses.collect()
    val plan = responses.queryExecution.executedPlan.toString
    assert(plan.contains("PushedRecordTypes: [response]"),
      s"warc_type equality must reach the scan:\n$plan")
    assert(responses.count() == 12)
    assert(responses.select("target_uri").collect().map(_.getString(0))
      .toSet == (0 until 12).map(i => s"https://e/$i").toSet)
    // IN pushes too, and payloads of the kept types stay byte-exact
    val both = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("warc_type").isin("response", "conversion"))
    both.collect()
    assert(both.queryExecution.executedPlan.toString
      .contains("PushedRecordTypes: [conversion, response]"))
    assert(both.count() == 17)
    // a non-pushable filter still evaluates exactly (residual path)
    assert(spark.read.format("graft-warc").load(dir.toString)
      .filter(col("http_status") === 200).count() == 12)
  }

  test("target_uri pushdown: CDX point lookup, byte-exact, honest fallback") {
    val dir = tmp("uripush")
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (s"https://e/u/$i", "2026-01-01T00:00:00Z", s"<urn:u:$i>",
        "text/html", s"uri page $i ${"z" * (i % 9)}".getBytes(UTF_8))
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload")
    WarcIO.warcSave(docs.repartition(4), dir.toString)
    val wanted = Seq(3, 17, 29).map(i => s"https://e/u/$i")
    val pushed = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("target_uri").isin(wanted: _*))
    val got = pushed.collect().map(r => (r.getAs[String]("target_uri"),
      new String(r.getAs[Array[Byte]]("payload"), UTF_8),
      r.getAs[Int]("http_status"))).toSet
    assert(got == Set(3, 17, 29).map(i =>
      (s"https://e/u/$i", s"uri page $i ${"z" * (i % 9)}", 200)))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedUris:") && plan.contains("(cdx-indexed)"),
      s"uri lookup must consult the CDX index:\n$plan")
    // single-equality form pushes too
    val one = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("target_uri") === "https://e/u/7")
    assert(one.count() == 1)
    assert(one.queryExecution.executedPlan.toString
      .contains("(cdx-indexed)"))
    // coverage gate: a FOREIGN archive file the index does not know
    // about lands in the directory → the lookup must fall back to the
    // full scan (an indexed plan would silently miss its records)
    val foreign = rec("response", Seq(
      "WARC-Record-ID" -> "<urn:u:foreign>",
      "WARC-Target-URI" -> wanted.head,
      "Content-Type" -> "application/http; msgtype=response"),
      httpBlock("200 OK", Seq("Content-Type" -> "text/html"),
        "foreign copy".getBytes(UTF_8)))
    java.nio.file.Files.write(dir.resolve("foreign.warc"), foreign)
    val fb = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("target_uri").isin(wanted: _*))
    val fbRows = fb.collect()
    assert(fbRows.length == 4, "fallback must see the unindexed record")
    assert(fbRows.map(r => new String(r.getAs[Array[Byte]]("payload"),
      UTF_8)).toSet.contains("foreign copy"))
    assert(fb.queryExecution.executedPlan.toString
      .contains("(no cdx coverage — full scan)"))
    // no _cdx at all (e.g. a hand-landed archive) → same fallback
    val dir2 = tmp("uripush_nocdx")
    java.nio.file.Files.write(dir2.resolve("only.warc"), foreign)
    val noCdx = spark.read.format("graft-warc").load(dir2.toString)
      .filter(col("target_uri") === wanted.head)
    assert(noCdx.count() == 1)
    // combined with a warc_type filter, the extents narrow by type too
    val typed = spark.read.format("graft-warc").load(dir.toString)
    // (read from the pre-foreign copy: rebuild a clean archive)
    val dir3 = tmp("uripush_typed")
    WarcIO.warcSave(docs.repartition(2), dir3.toString)
    val both = spark.read.format("graft-warc").load(dir3.toString)
      .filter(col("target_uri").isin(wanted: _*)
        && col("warc_type") === "response")
    assert(both.collect().map(_.getAs[String]("target_uri")).toSet
      == wanted.toSet)
    assert(both.queryExecution.executedPlan.toString
      .contains("(cdx-indexed)"))
  }

  test("warcSave httpHeaders: captured headers round-trip; framing stays writer-owned") {
    import spark.implicits._
    val dir = tmp("hdrs")
    val rows = Seq(
      ("https://h/1", Map("Location" -> "/next", "Cache-Control" -> "no-store",
        "X-Multi" -> "a b\r\ninjected: no")),
      ("https://h/2", Map("Content-Length" -> "999999",
        "content-type" -> "text/evil", "Server" -> "probe/1.0")),
      ("https://h/3", null.asInstanceOf[Map[String, String]]),
      ("https://h/4", Map("X\r\nTransfer-Encoding" -> "chunked",
        "Transfer-Encoding" -> "chunked", "Via" -> "1.1 cache",
        "Bad Key" -> "v", "Also:Bad" -> "v")))
      .toDF("target_uri", "headers")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z"))
      .withColumn("record_id", concat(lit("<urn:h:"),
        element_at(split(col("target_uri"), "/"), -1), lit(">")))
      .withColumn("http_content_type", lit("text/html"))
      .withColumn("payload", encode(concat(lit("body "),
        col("target_uri")), "UTF-8"))
    WarcIO.warcSave(rows.repartition(1), dir.toString,
      httpHeaders = Some("headers"))
    val back = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("warc_type") === "response")
      .select("target_uri", "http_headers", "http_status",
        "http_content_type", "payload")
      .collect().map(r => r.getString(0) ->
        ((r.getMap[String, String](1), r.getInt(2), r.getString(3),
          new String(r.getAs[Array[Byte]](4), UTF_8)))).toMap
    val (h1, st1, ct1, b1) = back("https://h/1")
    assert(st1 == 200 && ct1 == "text/html" && b1 == "body https://h/1")
    assert(h1("location") == "/next" && h1("cache-control") == "no-store")
    // CR/LF in a captured value is defanged, not emitted as a header break
    assert(h1("x-multi") == "a b injected: no" && !h1.contains("injected"))
    // the framing pair is writer-owned: a stale captured Content-Length
    // (or a conflicting content-type) must not corrupt the member
    val (h2, _, ct2, b2) = back("https://h/2")
    assert(ct2 == "text/html" && b2 == "body https://h/2")
    assert(h2("content-length") == b2.length.toString,
      s"framing must reflect the real payload: $h2")
    assert(h2("server") == "probe/1.0" && h2("content-type") == "text/html")
    // null header map degrades to the minimal head
    val (h3, _, _, b3) = back("https://h/3")
    assert(b3 == "body https://h/3" && h3.keys.toSet
      == Set("content-type", "content-length"))
    // a non-token KEY cannot inject header lines (a CRLF-bearing key
    // would smuggle a Transfer-Encoding the value defang never sees),
    // and a legitimate captured Transfer-Encoding is writer-owned
    // framing (the stored payload is identity bytes) — both drop
    val (h4, _, _, b4) = back("https://h/4")
    assert(b4 == "body https://h/4", s"payload intact: $b4")
    assert(h4("via") == "1.1 cache")
    assert(h4.keys.toSet == Set("content-type", "content-length", "via"),
      s"injected/invalid keys must drop: ${h4.keys.toSet}")
  }

  test("payload_digest pushdown: CDX point lookup, revisit conjunction, fallback") {
    val dir = tmp("dgpush")
    import spark.implicits._
    // doc 0..29 unique payloads, plus 30..33 all duplicating doc 5's
    // payload — the dedup writer stores those as revisits of 5's record
    val docs = ((0 until 30).map(i => (i, s"digest page $i")) ++
      (30 until 34).map(i => (i, "digest page 5")))
      .map { case (i, text) =>
        (s"https://e/d/$i", f"2026-01-01T00:00:${i % 60}%02dZ",
          s"<urn:d:$i>", "text/html", text.getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload")
    WarcIO.warcDedupSave(docs.repartition(4), dir.toString)
    def digestOf(text: String): String = {
      val md = java.security.MessageDigest.getInstance("SHA-1")
      "sha1:" + md.digest(text.getBytes(UTF_8))
        .map("%02X".format(_)).mkString
    }
    val wanted = Seq(3, 17).map(i => digestOf(s"digest page $i"))
    val pushed = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("payload_digest").isin(wanted: _*))
    assert(pushed.collect().map(r => (r.getAs[String]("target_uri"),
      new String(r.getAs[Array[Byte]]("payload"), UTF_8))).toSet
      == Set(("https://e/d/3", "digest page 3"),
        ("https://e/d/17", "digest page 17")))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedDigests:") && plan.contains("(cdx-indexed)"),
      s"digest lookup must consult the CDX index:\n$plan")
    // a digest with revisits: the bare lookup surfaces the canonical
    // response AND every revisit envelope (all carry that digest in
    // the index); conjoining warc_type narrows the extents to one
    val hot = digestOf("digest page 5")
    val all5 = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("payload_digest") === hot)
    val types = all5.collect().map(_.getAs[String]("warc_type"))
    assert(types.count(_ == "response") == 1
      && types.count(_ == "revisit") == 4, types.mkString(","))
    assert(all5.queryExecution.executedPlan.toString
      .contains("(cdx-indexed)"))
    val canon = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("payload_digest") === hot
        && col("warc_type") === "response")
    assert(canon.collect().map(_.getAs[String]("record_id")).toSeq
      == Seq("<urn:d:5>"))
    assert(canon.queryExecution.executedPlan.toString
      .contains("(cdx-indexed)"))
    // coverage gate: a foreign unindexed file → honest full-scan fallback
    val foreign = rec("response", Seq(
      "WARC-Record-ID" -> "<urn:d:foreign>",
      "WARC-Target-URI" -> "https://e/d/f",
      "WARC-Payload-Digest" -> wanted.head,
      "Content-Type" -> "application/http; msgtype=response"),
      httpBlock("200 OK", Seq("Content-Type" -> "text/html"),
        "foreign digest copy".getBytes(UTF_8)))
    java.nio.file.Files.write(dir.resolve("foreign.warc"), foreign)
    val fb = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("payload_digest").isin(wanted: _*))
    assert(fb.collect().map(r =>
      new String(r.getAs[Array[Byte]]("payload"), UTF_8)).toSet
      .contains("foreign digest copy"),
      "fallback must see the unindexed record")
    assert(fb.queryExecution.executedPlan.toString
      .contains("(no cdx coverage — full scan)"))
  }

  test("WARC-Concurrent-To: request records parse and pair onto responses") {
    val dir = tmp("pair")
    import spark.implicits._
    val docs = (0 until 20).map { i =>
      (s"https://e/pair/$i", "2026-01-01T00:00:00Z", s"<urn:pr:$i>",
        "text/html", s"paired page $i".getBytes(UTF_8),
        s"GET /pair/$i HTTP/1.1\r\nHost: e\r\n" +
          s"Accept-Language: en-${i % 3}\r\nX-Dup: a\r\nX-Dup: b")
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload", "req_http")
    WarcIO.warcSave(docs.repartition(2), dir.toString,
      requestHttp = Some("req_http"))
    val all = spark.read.format("graft-warc").load(dir.toString)
    assert(all.filter(col("warc_type") === "request").count() == 20
      && all.filter(col("warc_type") === "response").count() == 20)
    val req = all.filter(col("warc_type") === "request"
      && col("target_uri") === "https://e/pair/4").collect().head
    assert(req.getAs[String]("concurrent_to") == "<urn:pr:4>")
    assert(req.getAs[Integer]("http_status") == null)
    val hdrs = req.getAs[Map[String, String]]("http_headers")
    assert(hdrs("host") == "e" && hdrs("accept-language") == "en-1")
    assert(hdrs("x-dup") == "a, b", "repeats must comma-join")
    // pairing: every response gets its request's headers
    val paired = WarcIO.pairRequests(all).collect()
    assert(paired.length == 20)
    paired.foreach { r =>
      val i = r.getAs[String]("target_uri").split("/").last.toInt
      val rh = r.getAs[Map[String, String]]("request_headers")
      assert(rh("accept-language") == s"en-${i % 3}",
        s"page $i paired with the wrong request")
      assert(new String(r.getAs[Array[Byte]]("payload"), UTF_8)
        == s"paired page $i")
    }
    // reader-side pairing does NOT assume adjacency or order: a hand
    // interleaved archive (response first, metadata between, request
    // last) still pairs; a response without a request keeps null
    val dir2 = tmp("pair_raw")
    val bytes = Seq(
      rec("response", Seq("WARC-Record-ID" -> "<urn:x:r1>",
        "WARC-Target-URI" -> "https://x/1",
        "Content-Type" -> "application/http; msgtype=response"),
        httpBlock("200 OK", Seq("Content-Type" -> "text/html"),
          "one".getBytes(UTF_8))),
      rec("metadata", Seq("WARC-Record-ID" -> "<urn:x:m>",
        "WARC-Target-URI" -> "https://x/1",
        "Content-Type" -> "application/json"),
        """{"note":1}""".getBytes(UTF_8)),
      rec("response", Seq("WARC-Record-ID" -> "<urn:x:r2>",
        "WARC-Target-URI" -> "https://x/2",
        "Content-Type" -> "application/http; msgtype=response"),
        httpBlock("200 OK", Seq("Content-Type" -> "text/html"),
          "two".getBytes(UTF_8))),
      rec("request", Seq("WARC-Record-ID" -> "<urn:x:q1>",
        "WARC-Target-URI" -> "https://x/1",
        "WARC-Concurrent-To" -> "<urn:x:r1>",
        "Content-Type" -> "application/http; msgtype=request"),
        "GET /1 HTTP/1.1\r\nUser-Agent: probe\r\n\r\n".getBytes(UTF_8))
    ).reduce(_ ++ _)
    java.nio.file.Files.write(dir2.resolve("mixed.warc"), bytes)
    val p2 = WarcIO.pairRequests(
      spark.read.format("graft-warc").load(dir2.toString))
      .collect().map(r => r.getAs[String]("record_id") ->
        Option(r.getAs[Map[String, String]]("request_headers"))).toMap
    assert(p2("<urn:x:r1>").exists(_("user-agent") == "probe"))
    assert(p2("<urn:x:r2>").isEmpty,
      "a response with no request record must keep null headers")
  }

  test("warcSave: a null record_id row degrades (no request), never NPEs") {
    val dir = tmp("nullrid")
    import spark.implicits._
    val docs = Seq(
      ("https://e/ok", "2026-01-01T00:00:00Z", "<urn:n:1>",
        "text/html", "fine".getBytes(UTF_8), "GET /ok HTTP/1.1\r\nHost: e"),
      ("https://e/anon", "2026-01-01T00:00:00Z", null,
        "text/html", "anon".getBytes(UTF_8), "GET /anon HTTP/1.1\r\nHost: e"))
      .toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload", "req_http")
    WarcIO.warcSave(docs, dir.toString, requestHttp = Some("req_http"))
    val all = spark.read.format("graft-warc").load(dir.toString)
    // both responses written; only the id-bearing row minted a request
    assert(all.filter(col("warc_type") === "response").count() == 2)
    val reqs = all.filter(col("warc_type") === "request").collect()
    assert(reqs.length == 1
      && reqs.head.getAs[String]("concurrent_to") == "<urn:n:1>")
  }

  test("compactDedupArchive rejects aliased same-directory targets") {
    val dir = tmp("aliasguard")
    // trailing-slash and unqualified aliases of the SAME directory must
    // all trip the guard — compacting in place would delete the part
    // files being read
    for (alias <- Seq(dir.toString, dir.toString + "/",
        s"file:$dir", s"file://$dir")) {
      val e = intercept[IllegalArgumentException] {
        WarcIO.compactDedupArchive(spark, dir.toString, alias)
      }
      assert(e.getMessage.contains("fresh directory"), s"alias $alias")
    }
  }

  test("foreign-case headers and type values parse; warc_type canonicalizes") {
    val dir = tmp("case")
    java.nio.file.Files.write(dir.resolve("c.warc"),
      ("WARC/1.1\r\nWaRc-TyPe: Response\r\n" +
        "WARC-RECORD-ID: <urn:cs:1>\r\n" +
        "warc-target-uri: https://e/cs\r\n" +
        "CONTENT-TYPE: application/http; msgtype=response\r\n" +
        "content-length: 38\r\n\r\n" +
        "HTTP/1.1 200 OK\r\n\r\n" +
        "0123456789012345678" +
        "\r\n\r\n").getBytes(UTF_8))
    val r = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("warc_type") === "response").collect()
    assert(r.length == 1, "mixed-case WARC-Type must canonicalize")
    assert(r(0).getAs[Int]("http_status") == 200
      && r(0).getAs[String]("target_uri") == "https://e/cs"
      && new String(r(0).getAs[Array[Byte]]("payload"), UTF_8)
        == "0123456789012345678")
  }

  test("framing errors fail loudly; interior HTTP hostility degrades one row") {
    // truncated content block: the archive lies about its last record
    val dir = tmp("trunc")
    val good = rec("resource", Seq("WARC-Record-ID" -> "<urn:ok>",
      "Content-Type" -> "text/plain"), "fine".getBytes(UTF_8))
    val lying = {
      val env = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
        "WARC-Record-ID: <urn:cut>\r\nContent-Type: text/plain\r\n" +
        "Content-Length: 9999\r\n\r\nonly-this").getBytes(UTF_8)
      env
    }
    java.nio.file.Files.write(dir.resolve("cut.warc"), good ++ lying)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir.toString).collect()
    }
    assert(e.getMessage.contains("truncated")
      || Option(e.getCause).exists(_.getMessage.contains("truncated")))
    // non-WARC bytes at a record boundary: refuse, never resync-guess
    val dir2 = tmp("garbage")
    java.nio.file.Files.write(dir2.resolve("bad.warc"),
      good ++ "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8))
    intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir2.toString).collect()
    }
    // malformed chunked interior: row survives with the RAW body
    val rawBody = "not actually chunked".getBytes(UTF_8)
    val dir3 = tmp("badchunk")
    java.nio.file.Files.write(dir3.resolve("c.warc"),
      rec("response", Seq("WARC-Record-ID" -> "<urn:bc>",
        "WARC-Target-URI" -> "https://e/b",
        "Content-Type" -> "application/http"),
        httpBlock("200 OK", Seq("Content-Type" -> "text/plain",
          "Transfer-Encoding" -> "chunked"), rawBody)))
    val r = spark.read.format("graft-warc").load(dir3.toString).collect()
    assert(r.length == 1 && java.util.Arrays.equals(
      r(0).getAs[Array[Byte]]("payload"), rawBody))
    assert(WarcHttp.dechunk(rawBody).isEmpty)
  }

  test("multi-member gzip: a bad second member fails loudly, not silently") {
    val dir = tmp("badgz")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec("resource", Seq("WARC-Record-ID" -> "<urn:m1>",
      "Content-Type" -> "text/plain"), "one".getBytes(UTF_8)))
    gz.finish()
    bos.write(Array[Byte](0x1f, 0x33)) // torn second member magic
    java.nio.file.Files.write(dir.resolve("two.warc.gz"), bos.toByteArray)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir.toString).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("magic")), msgs(e).mkString(" | "))
  }

  test("crawlScreenStream: WARC landing dir → extract → screens, batch-identical") {
    import spark.implicits._
    val root = tmp("crawl")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    // pages: real doc text wrapped in markup (every screen must judge the
    // EXTRACTED text), one non-HTML response, one 404 — both excluded
    val docs = spark.read.parquet(s"${GraftSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
    val pages = docs.select(
      concat(lit("https://crawl.example/p/"), col("doc_id").cast("string"))
        .as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("<urn:c:"), col("doc_id").cast("string"), lit(">"))
        .as("record_id"),
      lit("text/html; charset=utf-8").as("http_content_type"),
      encode(concat(lit("<html><body><p>"), col("text"),
        lit("</p></body></html>")), "UTF-8").as("payload"))
    WarcIO.warcSave(pages.repartition(2), in)
    // a binary response that must not reach the screen
    val stage = tmp("crawl_png")
    WarcIO.warcSave(Seq(("https://crawl.example/logo", "2026-01-01T00:00:00Z",
      "<urn:c:png>", "image/png", Array[Byte](1, 2, 3)))
      .toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
    new java.io.File(stage.toString).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).foreach(f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(in, s"png-${f.getName}")))

    val q = graft.streaming.Streams.crawlScreenStream(spark, in)
      .writeStream.outputMode("append")
      .format("memory").queryName("crawl_screen_out").start()
    val streamed =
      try {
        q.processAllAvailable()
        spark.table("crawl_screen_out").collect()
          .map(_.toString).sorted.toSeq
      } finally q.stop()
    // structural twin: batch pages through the batch screen call —
    // keyed by target_uri, the authoritative page identity (no 64-bit
    // hash key in the pipeline's joins)
    val batch = graft.streaming.Streams.curationScreenStream(
        graft.streaming.Streams.crawlPages(spark, in), "target_uri",
        "text", None,
        graft.operators.Curation.Config(htmlExtract = true),
        stringId = true)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.size == 60, s"got ${streamed.size} screened pages")
    assert(streamed == batch,
      "streamed crawl screen must equal the batch twin bit-for-bit")
    // the URI rides through the screen itself — no join-back needed
    val withUri = spark.table("crawl_screen_out")
    assert(withUri.count() == 60
      && withUri.filter(col("target_uri").startsWith(
        "https://crawl.example/p/")).count() == 60)
  }

  test("crawl pages decode charset-aware: cp1252/SJIS/BOM, twin-equal") {
    import spark.implicits._
    val in = tmp("charset").toString
    // four pages, four declaration paths: header cp1252, meta-only
    // cp1252, UTF-16LE BOM under a LYING utf-8 header, undeclared UTF-8
    val sjisless = Seq(
      ("https://cs.example/h1252", "text/html; charset=windows-1252",
        "caf".getBytes(UTF_8) ++ Array(0xe9.toByte)),
      ("https://cs.example/meta", "text/html",
        "<meta charset=windows-1252>x".getBytes(UTF_8) ++
          Array(0x80.toByte)),
      ("https://cs.example/bom16", "text/html; charset=utf-8",
        Array(0xff.toByte, 0xfe.toByte) ++
          "<p>snow</p>".getBytes("UTF-16LE")),
      ("https://cs.example/plain", "text/html",
        "<p>héllo</p>".getBytes(UTF_8)))
    WarcIO.warcSave(sjisless.toDF(
      "target_uri", "http_content_type", "payload")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z"))
      .withColumn("record_id",
        concat(lit("<urn:cs:"), monotonically_increasing_id()
          .cast("string"), lit(">"))), in)
    val batch = graft.streaming.Streams.crawlPages(spark, in)
      .collect().map(r => r.getAs[String]("target_uri").split("/").last
        -> r.getAs[String]("text")).toMap
    assert(batch("h1252") == "café")
    assert(batch("meta") == "<meta charset=windows-1252>x€")
    assert(batch("bom16") == "<p>snow</p>", "BOM beats the lying header")
    assert(batch("plain") == "<p>héllo</p>", "UTF-8 validity sniff")
    // streaming twin decodes identically
    val q = graft.streaming.Streams.crawlPageStream(spark, in)
      .writeStream.outputMode("append")
      .format("memory").queryName("charset_twin").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("charset_twin").collect()
        .map(r => r.getAs[String]("target_uri") ->
          r.getAs[String]("text")).toMap
      assert(streamed ==
        batch.map { case (k, v) => s"https://cs.example/$k" -> v })
    } finally q.stop()
  }

  test("curation screen keyed by uri: equal page hashes cannot merge rows") {
    import spark.implicits._
    // Two DISTINCT URIs. Before r16 the crawl pipeline joined verdicts
    // back by page_id = xxhash64(target_uri) alone, so a 64-bit
    // birthday collision (likely somewhere in a multi-billion-page
    // corpus) would cross-join the two pages' verdicts. The screen now
    // keys by target_uri ITSELF — a page_id column forced equal for
    // both rows must be irrelevant: two rows in, two correctly-mapped
    // rows out.
    val pages = Seq(
      ("https://a.example/x", 42L,
        "<html><body><p>the quick brown fox jumps over the lazy " +
          "dog and keeps on running through the long field</p></body></html>"),
      ("https://b.example/y", 42L, // same forced page_id
        "<html><body><p>a completely different page about spark " +
          "partitioning and the shuffles it takes to join two corpora" +
          "</p></body></html>"))
      .toDF("target_uri", "page_id", "text")
    val out = graft.streaming.Streams.curationScreenStream(
      pages, "target_uri", "text", None,
      graft.operators.Curation.Config(htmlExtract = true),
      stringId = true).collect()
    assert(out.length == 2, "two distinct URIs must survive as two rows")
    val byUri = out.map(r => r.getAs[String]("target_uri") ->
      r.getAs[String]("clean_text")).toMap
    assert(byUri("https://a.example/x").contains("quick brown fox"))
    assert(byUri("https://b.example/y").contains("spark partitioning"))
  }

  test("crawlCurateToWetSink: WARC in → screens → WET out, survivors only, idempotent") {
    import spark.implicits._
    val root = tmp("wetout")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    // 40 real-text pages (screen keeps most) + one low-quality page of
    // gibberish tokens (screen must drop it)
    val docs = spark.read.parquet(s"${GraftSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(40)
    val junk = Seq((999999L,
      (0 until 90).map(j => s"zq${j}xj").mkString(" ")))
      .toDF("doc_id", "text")
    WarcIO.warcSave(docs.unionByName(junk).select(
      concat(lit("https://crawl.example/p/"), col("doc_id").cast("string"))
        .as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      concat(lit("<urn:c:"), col("doc_id").cast("string"), lit(">"))
        .as("record_id"),
      lit("text/html; charset=utf-8").as("http_content_type"),
      encode(concat(lit("<html><body><p>"), col("text"),
        lit("</p></body></html>")), "UTF-8").as("payload"))
      .repartition(2), in)
    def run(): Unit = {
      val q = graft.streaming.Streams.crawlCurateToWetSink(
        spark, in, out, chk, warcDate = Some("2026-02-02T00:00:00Z"))
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val wet = spark.read.format("graft-warc").load(s"$out/*")
      .filter(col("warc_type") === "conversion")
    val expected = graft.streaming.Streams.curationScreenStream(
        graft.streaming.Streams.crawlPages(spark, in), "target_uri",
        "text", None,
        graft.operators.Curation.Config(htmlExtract = true),
        stringId = true)
      .filter(col("verdict") === "keep")
    val nKeep = expected.count()
    assert(nKeep > 0 && nKeep <= 40, s"fixture keeps $nKeep")
    assert(wet.count() == nKeep, "WET archive must hold exactly the keeps")
    // the junk page was screened out before archiving
    assert(wet.filter(col("target_uri") ===
      "https://crawl.example/p/999999").count() == 0)
    // archived text is the screen's emitted clean_text, byte-exact
    val gotText = wet.select(col("target_uri"),
      decode(col("payload"), "UTF-8").as("t")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val wantText = expected
      .select(col("target_uri"), col("clean_text")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gotText == wantText, "archived text diverged from clean_text")
    // idle restart: nothing new lands, archive unchanged
    run()
    assert(spark.read.format("graft-warc").load(s"$out/*")
      .filter(col("warc_type") === "conversion").count() == nKeep,
      "an idle restart must not duplicate archived records")
  }

  test("crawlDedupArchiveSink: cross-batch revisits via the _cdx index, replay-safe") {
    import spark.implicits._
    val root = tmp("dedupsink")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def landBatch(tag: String,
        rows: Seq[(String, String, String, Integer)]): Unit = {
      val stage = tmp(s"stage_$tag")
      WarcIO.warcSave(rows.map { case (u, rid, p, st) =>
        (u, "2026-01-01T00:00:00Z", rid, "text/plain",
          p.getBytes(UTF_8), st)
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload", "status").repartition(1), stage.toString,
        httpStatus = Some("status"))
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    def run(): Unit = {
      val q = graft.streaming.Streams.crawlDedupArchiveSink(
        spark, in, out, chk)
      try q.processAllAvailable() finally q.stop()
    }
    landBatch("a", Seq(
      ("https://x.example/a1", "<urn:d:a1>", "PAYLOAD-A", 200),
      ("https://x.example/a2", "<urn:d:a2>", "PAYLOAD-A", 200),
      ("https://x.example/b1", "<urn:d:b1>", "PAYLOAD-B", 200)))
    run()
    landBatch("b", Seq(
      ("https://x.example/a3", "<urn:d:a3>", "PAYLOAD-A", 200),
      ("https://x.example/b2", "<urn:d:b2>", "PAYLOAD-B", 404),
      ("https://x.example/c1", "<urn:d:c1>", "PAYLOAD-C", 200)))
    run()
    run() // idle restart: no new batch directory, nothing duplicated
    def archive() = spark.read.format("graft-warc").load(s"$out/batch=*")
    def check(): Unit = {
      val all = archive()
      // one full response per payload the CRAWL has ever seen
      assert(all.filter(col("warc_type") === "response")
        .select("record_id").collect().map(_.getString(0)).toSet
        == Set("<urn:d:a1>", "<urn:d:b1>", "<urn:d:c1>"))
      // batch 1 stored only ONE payload: c1 — a3/b2 dedup CROSS-batch
      assert(spark.read.format("graft-warc").load(s"$out/batch=000001")
        .filter(col("warc_type") === "response").count() == 1)
      val rev = all.filter(col("warc_type") === "revisit")
        .select("record_id", "refers_to", "http_status").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(rev == Set(
        ("<urn:d:a2>", "<urn:d:a1>", 200),
        ("<urn:d:a3>", "<urn:d:a1>", 200), // cross-batch referent
        ("<urn:d:b2>", "<urn:d:b1>", 404)), // status survives dedup
        s"revisit pointers drifted: $rev")
      // the glob spans every batch, so cross-batch referents resolve
      val got = WarcIO.expandRevisits(
        all.filter(col("warc_type").isin("response", "revisit")))
        .select(col("target_uri"), decode(col("payload"), "UTF-8"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map(
        "https://x.example/a1" -> "PAYLOAD-A",
        "https://x.example/a2" -> "PAYLOAD-A",
        "https://x.example/a3" -> "PAYLOAD-A",
        "https://x.example/b1" -> "PAYLOAD-B",
        "https://x.example/b2" -> "PAYLOAD-B",
        "https://x.example/c1" -> "PAYLOAD-C"),
        "rematerialization drifted")
    }
    check()
    // force a REPLAY of batch 1: offsets/1 exists but its commit marker
    // is gone, so restart re-executes it — the prior index must exclude
    // the batch's own directory or the replay would revisit against
    // itself and drift
    assert(new java.io.File(s"$chk/commits/1").delete())
    // the local FS keeps a checksum sidecar the commit rewrite trips on
    new java.io.File(s"$chk/commits/.1.crc").delete()
    run()
    check()
    // compaction: the batch tree re-dedups into ONE archive whose _cdx
    // alone is the next crawl's prior index
    val compacted = s"$root/compacted"
    val n = WarcIO.compactDedupArchive(spark, out, compacted)
    assert(n == 6L, "every capture survives compaction")
    val comp = spark.read.format("graft-warc").load(compacted)
    assert(comp.filter(col("warc_type") === "response").count() == 3)
    assert(comp.filter(col("warc_type") === "revisit").count() == 3)
    val gotComp = WarcIO.expandRevisits(
      comp.filter(col("warc_type").isin("response", "revisit")))
      .select(col("target_uri"), decode(col("payload"), "UTF-8"),
        col("http_status"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(gotComp == Map(
      "https://x.example/a1" -> (("PAYLOAD-A", 200)),
      "https://x.example/a2" -> (("PAYLOAD-A", 200)),
      "https://x.example/a3" -> (("PAYLOAD-A", 200)),
      "https://x.example/b1" -> (("PAYLOAD-B", 200)),
      "https://x.example/b2" -> (("PAYLOAD-B", 404)),
      "https://x.example/c1" -> (("PAYLOAD-C", 200))),
      "compaction must preserve every capture, payload, and status")
  }

  test("warcNotModifiedSave: 304 w/o a prior falls back to a full response") {
    import spark.implicits._
    val dir = tmp("nm")
    val rows = Seq(
      // 304 with NO prior capture of the URI: nothing to refer to —
      // must archive as a (payload-less) full response, not crash
      ("https://x.example/orphan", "<urn:nm:1>", 304),
      ("https://x.example/fresh", "<urn:nm:2>", 200))
      .toDF("target_uri", "record_id", "status")
      .select(col("target_uri"), lit("2026-01-01T00:00:00Z").as("warc_date"),
        col("record_id"), lit("text/plain").as("http_content_type"),
        encode(lit("body"), "UTF-8").as("payload"),
        col("status").as("http_status"))
    val prior = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("target_uri",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("record_id",
            org.apache.spark.sql.types.StringType))))
    assert(WarcIO.warcNotModifiedSave(rows.repartition(1), dir.toString,
      prior) == 2L)
    val back = spark.read.format("graft-warc").load(dir.toString)
      .filter(col("warc_type").isin("response", "revisit"))
      .select("warc_type", "record_id", "http_status").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(back == Set(("response", "<urn:nm:1>", 304),
      ("response", "<urn:nm:2>", 200)),
      s"orphan 304 must degrade to a full response: $back")
  }

  test("crawlFrontierStream matches the batch frontier; emits once") {
    import spark.implicits._
    val root = tmp("frontier")
    val in = s"$root/in"; val chk = s"$root/chk"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(tag: String, ids: Seq[Int]): Unit = {
      val stage = tmp(s"fstage_$tag")
      WarcIO.warcSave(ids.map { i =>
        (s"https://h.example/p/$i", "2026-01-01T00:00:00Z",
          s"<urn:f:$tag:$i>", "text/html; charset=utf-8",
          (s"""<html><body><a href="/l/${i % 4}">x</a>""" +
            s"""<a href="https://ext.example/e/$i">e</a></body></html>""")
            .getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    val seen = Seq("https://h.example/l/0").toDF("url")
    def run(): Unit = {
      val q = graft.streaming.Streams
        .crawlFrontierStream(spark, in, seen, "url")
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    land("a", 0 until 3); run()
    land("b", 2 until 5); run() // /l/2,/l/3 + ext/2 already emitted
    val got = spark.read.parquet(out)
    // exactly-once emission across batches: no frontier URL twice
    assert(got.count() == got.select("frontier_url").distinct().count(),
      "a frontier URL must be emitted exactly once across the stream")
    val want = graft.operators.Outlinks.crawlFrontier(
      graft.operators.Outlinks.extractOutlinks(
        graft.streaming.Streams.crawlPages(spark, in),
        "text", "target_uri"),
      "outlink", seen, "url")
    assert(got.select("frontier_url", "url_host", "registered_domain")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
      == want.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet,
      "stream frontier diverged from the batch derivation")
  }

  test("crawlFrontierStream: redirect targets enter the frontier exactly once") {
    import spark.implicits._
    val root = tmp("redirfront")
    val in = s"$root/in"; val chk = s"$root/chk"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stage = tmp("redirstage")
    // page A: 200 html linking /l/1 AND the same URL a redirect names;
    // page B: a bodyless 301 whose Location is that URL — the target
    // must surface in the frontier ONCE despite arriving twice
    WarcIO.warcSave(Seq(
      ("https://h.example/a", 200,
        ("""<a href="/l/1">x</a>""" +
          """<a href="https://moved.example/new">y</a>"""),
        null.asInstanceOf[Map[String, String]]),
      ("https://h.example/old", 301, "",
        Map("Location" -> "https://moved.example/new")),
      ("https://h.example/soft", 200,
        """<meta http-equiv="refresh" content="0;url=/landed">""",
        null.asInstanceOf[Map[String, String]]))
      .toDF("target_uri", "status", "body", "headers")
      .select(col("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:rf:"), col("target_uri"), lit(">"))
          .as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("body"), "UTF-8").as("payload"),
        col("status"), col("headers"))
      .repartition(1), stage.toString,
      httpStatus = Some("status"), httpHeaders = Some("headers"))
    new java.io.File(stage.toString).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(in, f.getName))
      }
    val q = graft.streaming.Streams
      .crawlFrontierStream(spark, in,
        Seq.empty[String].toDF("url"), "url")
      .writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
      .select("frontier_url").as[String].collect().toSeq
    assert(got.sorted == Seq("https://h.example/l/1",
      "https://h.example/landed", "https://moved.example/new"),
      s"both redirect classes must enter the frontier exactly once: $got")
  }

  test("crawlFrontierStream canonicalMap: aliases collapse before dedup and seen") {
    import spark.implicits._
    val root = tmp("canonfront")
    val in = s"$root/in"; val chk = s"$root/chk"; val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stage = tmp("canonfrontstage")
    // page A links an alias AND its canonical; page B links an alias of
    // a SEEN page — the collapsed frontier must emit the canonical once
    // and suppress the seen alias entirely
    WarcIO.warcSave(Seq(
      ("https://h.example/a",
        """<a href="/old">x</a><a href="/new">y</a><a href="/other">z</a>"""),
      ("https://h.example/b", """<a href="/dup">w</a>"""))
      .toDF("target_uri", "body")
      .select(col("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("<urn:cf:"), col("target_uri"), lit(">"))
          .as("record_id"),
        lit("text/html; charset=utf-8").as("http_content_type"),
        encode(col("body"), "UTF-8").as("payload"))
      .repartition(1), stage.toString)
    new java.io.File(stage.toString).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(in, f.getName))
      }
    val mapping = Seq(
      ("https://h.example/old", "https://h.example/new"),
      ("https://h.example/dup", "https://h.example/seen"))
      .toDF("alias_url", "canonical_url")
    val seen = Seq("https://h.example/seen").toDF("url")
    val q = graft.streaming.Streams
      .crawlFrontierStream(spark, in, seen, "url",
        canonicalMap = Some(mapping))
      .writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
      .select("frontier_url").as[String].collect().toSeq.sorted
    assert(got == Seq("https://h.example/new", "https://h.example/other"),
      s"collapse must precede dedup and the seen anti-join: $got")
    // batch twin: the stream equals applyCanonical over the batch links
    val want = graft.operators.Outlinks.applyCanonical(
        graft.operators.Outlinks.canonicalLinks(
          graft.operators.Outlinks.extractOutlinks(
            graft.streaming.Streams.crawlPages(spark, in),
            "text", "target_uri"),
          "outlink"),
        "frontier_url", mapping, "alias_url", "canonical_url")
      .distinct()
      .join(seen.select(col("url").as("frontier_url")),
        Seq("frontier_url"), "left_anti")
      .as[String].collect().toSeq.sorted
    assert(got == want, s"stream diverged from the batch twin: $want")
  }

  test("crawlFetchPlanSink: per-cycle politeness schedule equals the batch twin") {
    import spark.implicits._
    val root = tmp("plansink")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(tag: String, ids: Seq[Int]): Unit = {
      val stage = tmp(s"planstage_$tag")
      WarcIO.warcSave(ids.map { i =>
        (s"https://src.example/p/$i", "2026-01-01T00:00:00Z",
          s"<urn:fp:$tag:$i>", "text/html; charset=utf-8",
          (s"""<a href="https://t${i % 3}.example/u/$i">x</a>""" +
            s"""<a href="https://t0.example/blocked/$i">b</a>""")
            .getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    val policies = Seq(("t0.example",
      "User-agent: *\nDisallow: /blocked\nCrawl-delay: 3"))
      .toDF("host", "robots")
    val seen = Seq.empty[String].toDF("url")
    def run(): Unit = {
      val q = graft.streaming.Streams.crawlFetchPlanSink(
        spark, in, out, chk, seen, "url", policies, "host", "robots",
        "graftbot", defaultDelay = 1.0)
      try q.processAllAvailable() finally q.stop()
    }
    land("a", 0 until 9); run()
    val plan0 = spark.read.parquet(s"$out/batch=000000")
    // twin: the batch fetchPlan over the batch frontier
    val twin = graft.operators.Outlinks.fetchPlan(
      graft.operators.Outlinks.crawlFrontier(
        graft.operators.Outlinks.extractOutlinks(
          graft.streaming.Streams.crawlPages(spark, in),
          "text", "target_uri"),
        "outlink", seen, "url"),
      "frontier_url", policies, "host", "robots", "graftbot",
      defaultDelay = 1.0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("frontier_url", "url_host", "crawl_delay", "fetch_seq",
        "fetch_offset")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3), r.getDouble(4))).toSet
    assert(rows(plan0) == rows(twin),
      "sink schedule diverged from the batch twin")
    // the gate dropped t0's /blocked pool; t0's declared 3 s delay rides
    assert(plan0.filter(col("frontier_url").contains("/blocked"))
      .count() == 0)
    assert(plan0.filter(col("url_host") === "t0.example")
      .select("crawl_delay").distinct().as[Double].collect().toSeq
      == Seq(3.0))
    // a second landing plans ONLY the new URLs, in its own cycle dir
    land("b", 7 until 12); run()
    val plan1 = spark.read.parquet(s"$out/batch=000001")
    val p1Urls = plan1.select("frontier_url").as[String].collect().toSet
    assert(p1Urls == (9 until 12).map(i =>
      s"https://t${i % 3}.example/u/$i").toSet,
      s"cycle 1 must hold only the new URLs: $p1Urls")
    // per-cycle sequencing restarts at 1
    assert(plan1.agg(min(col("fetch_seq"))).head().getLong(0) == 1L)
  }

  test("revisit schedule ADVANCES across archive cycles (fromArchive)") {
    import spark.implicits._
    val dir = tmp("revcycles").toString
    def capture(cycle: Int, date: String, changedIds: Set[Int]) = {
      val rows = (0 until 6).map { i =>
        val version = if (changedIds.contains(i)) s"c$cycle" else "c0"
        (s"https://rv.example/p/$i", date, s"<urn:rv:$cycle:$i>",
          "text/html", s"$version body of page $i".getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload")
      val prior = if (cycle == 0) None
        else Some((0 until cycle).map(c =>
          spark.read.parquet(s"$dir/batch=$c/_cdx"))
          .reduce(_ unionByName _))
      WarcIO.warcDedupSave(rows.repartition(2), s"$dir/batch=$cycle",
        priorIndex = prior)
    }
    def schedule(): Map[String, (Long, Double)] =
      graft.operators.Revisit.fromArchive(
        spark.read.format("graft-warc").load(s"$dir/batch=*"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    // cycle 0: first sight of everything → streak 0, base interval
    capture(0, "2026-03-01T00:00:00Z", (0 until 6).toSet)
    assert(schedule().values.forall(_ == ((0L, 86400.0))))
    // cycle 1: pages 0,1 changed; 2-5 unchanged (revisit records) —
    // unchanged pages back off to 2x, changed stay at base
    capture(1, "2026-03-02T00:00:00Z", Set(0, 1))
    val s1 = schedule()
    assert(s1("https://rv.example/p/0") == ((0L, 86400.0)))
    assert(s1("https://rv.example/p/3") == ((1L, 172800.0)))
    // cycle 2: only page 3 changes — its backoff RESETS while page 4
    // keeps doubling and page 0 starts its own streak
    capture(2, "2026-03-04T00:00:00Z", Set(3))
    val s2 = schedule()
    assert(s2("https://rv.example/p/3") == ((0L, 86400.0)),
      s"change must reset the backoff: ${s2("https://rv.example/p/3")}")
    assert(s2("https://rv.example/p/4") == ((2L, 345600.0)),
      s"unchanged streak must keep doubling: ${s2("https://rv.example/p/4")}")
    assert(s2("https://rv.example/p/0") == ((1L, 172800.0)))
  }

  test("crawlFetchPlanSink maxPerHost: capped URLs carry over, none lost") {
    import spark.implicits._
    val root = tmp("plancarry")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(tag: String, ids: Seq[Int]): Unit = {
      val stage = tmp(s"carrystage_$tag")
      WarcIO.warcSave(ids.map { i =>
        (s"https://src.example/p/$tag$i", "2026-01-01T00:00:00Z",
          s"<urn:cy:$tag:$i>", "text/html; charset=utf-8",
          f"""<a href="https://one.example/u/$i%03d-$tag">x</a>"""
            .getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    def run(budgets: Option[org.apache.spark.sql.DataFrame] = None)
        : Unit = {
      val q = graft.streaming.Streams.crawlFetchPlanSink(
        spark, in, out, chk, Seq.empty[String].toDF("url"), "url",
        Seq.empty[(String, String)].toDF("host", "robots"),
        "host", "robots", "graftbot", maxPerHost = 10,
        hostBudgets = budgets)
      try q.processAllAvailable() finally q.stop()
    }
    // cycle 0: 30 URLs on one host, cap 10 → 10 planned, 20 deferred
    land("a", 0 until 30); run()
    val plan0 = spark.read.parquet(s"$out/batch=000000")
    assert(plan0.count() == 10)
    val def0 = spark.read.parquet(s"$out-deferred/batch=000000")
      .select("frontier_url").as[String].collect().toSet
    assert(def0.size == 20, s"over-cap rows must defer: ${def0.size}")
    // cycle 1: 5 new URLs — the plan draws from deferred ∪ new
    land("b", 0 until 5); run()
    val plan1 = spark.read.parquet(s"$out/batch=000001")
    assert(plan1.count() == 10)
    assert(plan1.agg(min(col("fetch_seq"))).head().getLong(0) == 1L)
    val def1 = spark.read.parquet(s"$out-deferred/batch=000001")
      .select("frontier_url").as[String].collect().toSet
    // NOTHING is lost: every frontier URL ever emitted is either in
    // some cycle's plan or still pending
    val planned = spark.read.parquet(s"$out/batch=000000")
      .select("frontier_url").as[String].collect().toSet ++
      plan1.select("frontier_url").as[String].collect().toSet
    assert(planned.size == 20, s"two cycles × cap 10: ${planned.size}")
    assert((planned ++ def1).size == 35 && (planned & def1).isEmpty,
      s"deferred ∪ planned must cover all 35 URLs exactly once: " +
        s"${(planned ++ def1).size}")
    // deferred backlog drains in order: cycle 1 planned the
    // lexicographically first 10 of (20 deferred ∪ 5 new)
    val expected1 = (def0 ++ (0 until 5).map(i =>
      f"https://one.example/u/$i%03d-b")).toSeq.sorted.take(10).toSet
    assert(plan1.select("frontier_url").as[String].collect().toSet
      == expected1, "cycle 1 must plan the first 10 pending URLs")
    // cycle 2 under a per-host BUDGET (3 for the host): kept shrinks
    // to 3, the rest keeps deferring — budgets and carry-over compose
    land("c", 0 until 2)
    run(budgets = Some(Seq(("one.example", 3L)).toDF("url_host", "budget")))
    val plan2 = spark.read.parquet(s"$out/batch=000002")
    assert(plan2.count() == 3, "budget must override maxPerHost")
    val def2 = spark.read.parquet(s"$out-deferred/batch=000002")
      .select("frontier_url").as[String].collect().toSet
    val planned2 = planned ++
      plan2.select("frontier_url").as[String].collect().toSet
    assert((planned2 ++ def2).size == 37 && (planned2 & def2).isEmpty,
      s"37 URLs total, still none lost: ${(planned2 ++ def2).size}")
    // the pending set lives in a SIBLING dir: a whole-directory read of
    // the plan output must keep working for capped sinks (a nested
    // deferred/ subtree used to break partition discovery)
    assert(spark.read.parquet(out).count() == 23,
      "spark.read.parquet(outDir) must see exactly the planned rows")
  }

  test("crawlFetchPlanSink: a pre-sibling checkpoint's legacy deferred backlog is not dropped") {
    import spark.implicits._
    val root = tmp("planlegacy")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(tag: String, ids: Seq[Int]): Unit = {
      val stage = tmp(s"legacystage_$tag")
      WarcIO.warcSave(ids.map { i =>
        (s"https://src.example/p/$tag$i", "2026-01-01T00:00:00Z",
          s"<urn:lg:$tag:$i>", "text/html; charset=utf-8",
          f"""<a href="https://one.example/u/$i%03d-$tag">x</a>"""
            .getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    def run(): Unit = {
      val q = graft.streaming.Streams.crawlFetchPlanSink(
        spark, in, out, chk, Seq.empty[String].toDF("url"), "url",
        Seq.empty[(String, String)].toDF("host", "robots"),
        "host", "robots", "graftbot", maxPerHost = 4)
      try q.processAllAvailable() finally q.stop()
    }
    // cycle 0: 10 URLs, cap 4 → 6 defer (written to the sibling tree)
    land("a", 0 until 10); run()
    val def0 = spark.read.parquet(s"$out-deferred/batch=000000")
      .select("frontier_url").as[String].collect().toSet
    assert(def0.size == 6)
    // simulate a checkpoint created by the PRE-SIBLING layout: the
    // backlog lives under outDir/deferred/, the sibling tree is gone
    val legacyDir = java.nio.file.Paths.get(out, "deferred")
    java.nio.file.Files.createDirectories(legacyDir)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$out-deferred/batch=000000"),
      legacyDir.resolve("batch=000000"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$out-deferred"))
    // cycle 1 must fall back to the legacy location — and write the
    // sibling layout from here on
    land("b", 0 until 2); run()
    val plan1 = spark.read.parquet(s"$out/batch=000001")
      .select("frontier_url").as[String].collect().toSet
    assert(plan1.size == 4)
    assert(plan1.subsetOf(def0 ++ (0 until 2).map(i =>
        f"https://one.example/u/$i%03d-b")),
      s"cycle 1 must draw from the legacy backlog: $plan1")
    assert((def0 & plan1).nonEmpty,
      s"legacy deferred URLs must actually be planned: $plan1")
    val def1 = spark.read.parquet(s"$out-deferred/batch=000001")
      .select("frontier_url").as[String].collect().toSet
    // nothing lost across the layout migration: 12 URLs total = 4
    // planned in cycle 0 + 4 in cycle 1 + 4 still pending
    val plan0 = spark.read.parquet(s"$out/batch=000000")
      .select("frontier_url").as[String].collect().toSet
    assert((plan0 ++ plan1 ++ def1).size == 12
      && (plan1 & def1).isEmpty,
      s"migration must not drop the backlog: " +
        s"${(plan0 ++ plan1 ++ def1).size}")
  }

  test("crawlFetchPlanSink: a STALE policy row gates as absent — default-allow, host resurfaces") {
    import spark.implicits._
    val root = tmp("planstale")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val stage = tmp("stalestage")
    WarcIO.warcSave((0 until 4).map { i =>
      (s"https://src.example/p/$i", "2026-01-01T00:00:00Z",
        s"<urn:st:$i>", "text/html; charset=utf-8",
        s"""<a href="https://t0.example/blocked/$i">b</a>"""
          .getBytes(UTF_8))
    }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
      "payload").repartition(1), stage.toString)
    new java.io.File(stage.toString).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(in, f.getName))
      }
    // the caller-supplied policy table was fetched on Jan 1 and the
    // freshness horizon is 2 days — the streaming sink has no in-loop
    // robots fetch (the pinned asymmetry with crawlCycles), so the
    // q_t65 semantics are the safety net: a fresh row enforces, a
    // stale row behaves as ABSENT (RFC 9309 default-allow)
    val policies = Seq(("t0.example",
      "User-agent: *\nDisallow: /blocked", "2026-01-01T00:00:00Z"))
      .toDF("host", "robots", "fat")
    def run(tag: String, asOf: String): Set[String] = {
      val q = graft.streaming.Streams.crawlFetchPlanSink(
        spark, in, s"$root/out_$tag", s"$root/chk_$tag",
        Seq.empty[String].toDF("url"), "url",
        policies, "host", "robots", "graftbot",
        fetchedAtCol = Some("fat"), maxAgeSeconds = 2L * 86400L,
        asOf = Some(lit(asOf).cast("timestamp")))
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(s"$root/out_$tag/batch=000000")
        .select("frontier_url").as[String].collect().toSet
    }
    val fresh = run("fresh", "2026-01-02T00:00:00Z")
    assert(fresh.isEmpty, s"a fresh policy must gate /blocked: $fresh")
    val stale = run("stale", "2026-01-10T00:00:00Z")
    assert(stale.size == 4,
      s"a stale policy must default-allow on the stream: $stale")
    // and the host RESURFACES on the caller's robots worklist — the
    // documented out-of-band refresh path
    val worklist = graft.operators.Robots.robotsFetchList(
        stale.toSeq.toDF("frontier_url"), "frontier_url",
        policies, "host", fetchedAtCol = Some("fat"),
        maxAgeSeconds = 2L * 86400L,
        asOf = Some(lit("2026-01-10T00:00:00Z").cast("timestamp")))
      .select("robots_url").as[String].collect().toSet
    assert(worklist == Set("https://t0.example/robots.txt"),
      s"the stale host must re-enter the worklist: $worklist")
  }

  test("crawlFetchPlanSink prioritiesRefresh: each cycle plans with its own rank frame") {
    import spark.implicits._
    val root = tmp("planrefresh")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(tag: String, ids: Seq[Int]): Unit = {
      val stage = tmp(s"refreshstage_$tag")
      WarcIO.warcSave(ids.map { i =>
        (s"https://src.example/p/$tag$i", "2026-01-01T00:00:00Z",
          s"<urn:pr:$tag:$i>", "text/html; charset=utf-8",
          s"""<a href="https://one.example/u/$tag-$i">x</a>"""
            .getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    // batch 0 ranks the LAST url of its cycle highest, batch 1 the
    // first — a deterministic function of the batch id, the hook's
    // replay contract (a real caller derives it from batch<N
    // artifacts: re-ranked archive, focused priorities, …)
    def refresh(batchId: Long): org.apache.spark.sql.DataFrame = {
      val tag = if (batchId == 0) "a" else "b"
      val top = if (batchId == 0) 2 else 0
      Seq((s"https://one.example/u/$tag-$top", 1.0)).toDF("node", "rank")
    }
    def run(): Unit = {
      val q = graft.streaming.Streams.crawlFetchPlanSink(
        spark, in, out, chk, Seq.empty[String].toDF("url"), "url",
        Seq.empty[(String, String)].toDF("host", "robots"),
        "host", "robots", "graftbot",
        prioritiesRefresh = Some(refresh))
      try q.processAllAvailable() finally q.stop()
    }
    land("a", 0 until 3); run()
    land("b", 0 until 3); run()
    def first(batch: String): String =
      spark.read.parquet(s"$out/batch=$batch")
        .filter(col("fetch_seq") === 1)
        .select("frontier_url").as[String].head()
    // each cycle's schedule follows THAT cycle's rank frame
    assert(first("000000") == "https://one.example/u/a-2",
      "batch 0 must lead with batch 0's top-ranked URL")
    assert(first("000001") == "https://one.example/u/b-0",
      "batch 1 must lead with batch 1's top-ranked URL")
  }

  test("foldFrontierSeen: state folds into seen; restart re-emits nothing, loses nothing") {
    import spark.implicits._
    val root = tmp("fold")
    val in = s"$root/in"; val chk = s"$root/chk"; val out = s"$root/out"
    val seenDir = s"$root/seen"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    Seq("https://h.example/l/0").toDF("url").write.parquet(seenDir)
    def land(tag: String, ids: Seq[Int]): Unit = {
      val stage = tmp(s"foldstage_$tag")
      WarcIO.warcSave(ids.map { i =>
        (s"https://h.example/p/$i", "2026-01-01T00:00:00Z",
          s"<urn:ff:$tag:$i>", "text/html; charset=utf-8",
          (s"""<html><body><a href="/l/${i % 4}">x</a>""" +
            s"""<a href="https://ext.example/e/$i">e</a></body></html>""")
            .getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    def run(): Unit = {
      val q = graft.streaming.Streams
        .crawlFrontierStream(spark, in,
          spark.read.parquet(seenDir), "url")
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    land("a", 0 until 3); run()
    val phase1 = spark.read.parquet(out)
      .select("frontier_url").as[String].collect().toSet
    assert(phase1 == Set("https://h.example/l/1", "https://h.example/l/2",
      "https://ext.example/e/0", "https://ext.example/e/1",
      "https://ext.example/e/2"))
    val n = graft.streaming.Streams.foldFrontierSeen(
      spark, out, seenDir, "url", chk)
    assert(n == 1 + phase1.size, "fold = seed ∪ emitted, distinct")
    assert(!new java.io.File(out).exists, "folded output must be cleared")
    assert(!new java.io.File(chk).exists, "checkpoint must rotate")
    assert(spark.read.parquet(seenDir).as[String].collect().toSet
      == phase1 + "https://h.example/l/0")
    // restart with the SAME seen path and a fresh lineage: the stream
    // re-reads the whole landing dir, yet must re-emit NOTHING folded
    // and lose NOTHING genuinely new
    land("b", 2 until 6); run()
    val phase2 = spark.read.parquet(out)
      .select("frontier_url").as[String].collect().toSet
    assert(phase2.intersect(phase1).isEmpty,
      s"re-emission after fold: ${phase2.intersect(phase1)}")
    val want = graft.operators.Outlinks.crawlFrontier(
      graft.operators.Outlinks.extractOutlinks(
        graft.streaming.Streams.crawlPages(spark, in),
        "text", "target_uri"),
      "outlink", spark.read.parquet(seenDir), "url")
      .select("frontier_url").as[String].collect().toSet
    assert(phase2 == want,
      s"fold-restart diverged from the batch twin: $phase2 vs $want")
    // a second fold is idempotent-shaped: seen absorbs phase2 too
    val n2 = graft.streaming.Streams.foldFrontierSeen(
      spark, out, seenDir, "url", chk,
      emittedArchive = Some(s"$root/arch/epoch0"))
    assert(n2 == n + phase2.size)
    assert(spark.read.parquet(s"$root/arch/epoch0")
      .select("frontier_url").as[String].collect().toSet == phase2,
      "archived emission must survive the fold verbatim")
  }

  test("crawlWatSink: per-batch WAT metadata, typed read-back, non-HTML rows") {
    import spark.implicits._
    val root = tmp("watsink")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(tag: String, rows: Seq[(String, String, Array[Byte])]): Unit = {
      val stage = tmp(s"watstage_$tag")
      WarcIO.warcSave(rows.map { case (uri, ct, payload) =>
        (uri, "2026-03-01T00:00:00Z", s"<urn:ws:$tag:${uri.hashCode}>",
          ct, payload)
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    def run(): Unit = {
      val q = graft.streaming.Streams.crawlWatSink(spark, in, out, chk)
      try q.processAllAvailable() finally q.stop()
    }
    land("a", Seq(
      ("https://w.example/p1", "text/html; charset=utf-8",
        ("""<html><head><title>P&amp;1</title></head><body>""" +
          """<a href="/n/1">x</a><a href="https://o.example/q">y</a>""" +
          "</body></html>").getBytes(UTF_8)),
      ("https://w.example/i.png", "image/png",
        Array[Byte](0x50, 0x4e, 0x47))))
    run()
    land("b", Seq(
      ("https://w.example/p2", "text/html",
        """<html><body><a href="/n/2">z</a></body></html>"""
          .getBytes(UTF_8))))
    run()
    val entries = WarcIO.watEntries(
      spark.read.format("graft-warc").load(s"$out/batch=*"))
    val got = entries.select("target_uri", "refers_to", "status",
      "content_type", "title", "links")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getString(3),
          Option(r.getString(4)),
          Option(r.getSeq[String](5)).map(_.toList)))).toMap
    assert(got.size == 3, s"one WAT row per response: ${got.keys}")
    val (ref1, st1, ct1, ti1, ln1) = got("https://w.example/p1")
    assert(ref1 == s"<urn:ws:a:${"https://w.example/p1".hashCode}>",
      "refers_to must name the capture's record")
    assert(st1 == 200 && ct1 == "text/html; charset=utf-8")
    assert(ti1.contains("P&1"), s"title with entity decode: $ti1")
    assert(ln1.contains(List("https://w.example/n/1",
      "https://o.example/q")), s"resolved links in order: $ln1")
    val (_, stPng, ctPng, tiPng, lnPng) = got("https://w.example/i.png")
    assert(stPng == 200 && ctPng == "image/png"
      && tiPng.isEmpty && lnPng.isEmpty,
      "non-HTML rows keep status/content-type, null title/links")
    assert(got("https://w.example/p2")._5
      .contains(List("https://w.example/n/2")))
    // capture date passes through; batch layout is per-microbatch
    assert(entries.select("warc_date").distinct().as[String].collect()
      .toSeq == Seq("2026-03-01T00:00:00Z"))
    assert(new java.io.File(out).list().count(_.startsWith("batch=")) == 2)
    // replay idempotence: re-running with nothing new changes nothing
    run()
    assert(WarcIO.watEntries(spark.read.format("graft-warc")
      .load(s"$out/batch=*")).count() == 3)
  }

  test("readStream graft-warc: exactly-once across restarts, epoch offsets") {
    import spark.implicits._
    val root = tmp("stream")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def landBatch(tag: String, ids: Range): Unit = {
      val stage = tmp(s"stage_$tag")
      WarcIO.warcSave(ids.map { i =>
        (s"https://example.org/p/$i", "2026-01-01T00:00:00Z",
          s"<urn:graft:doc:$i>", "text/html",
          s"payload $i".getBytes(UTF_8))
      }.toDF("target_uri", "warc_date", "record_id", "http_content_type",
        "payload").repartition(1), stage.toString)
      new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(in, s"$tag-${f.getName}"))
        }
    }
    def run(): Unit = {
      val q = spark.readStream.format("graft-warc").load(in)
        .filter(col("warc_type") === "response")
        .select("target_uri", "record_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    landBatch("a", 0 until 4); run()
    landBatch("b", 4 until 7); run() // restart picks up ONLY the new file
    run() // idle restart is a no-op
    val got = spark.read.parquet(out)
    assert(got.count() == 7, "each response must land exactly once")
    assert(got.select("record_id").distinct().count() == 7)
    // offsets are the constant-size epoch form
    val offsetFiles = new java.io.File(s"$chk/offsets")
      .listFiles().filter(_.getName.matches("\\d+"))
    assert(offsetFiles.nonEmpty)
    offsetFiles.foreach { f =>
      val line = new String(java.nio.file.Files.readAllBytes(f.toPath))
        .linesIterator.toSeq.last
      assert(line.matches("""\{"epoch":\d+\}"""), s"bad offset: $line")
    }
  }
}
