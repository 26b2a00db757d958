package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MultiMemberGzipInputStream, WarcHttp, WarcIO}

/** Property fuzz over the round's hand-rolled byte-level code: the WARC
  * framing must round-trip ARBITRARY payload bytes (including embedded
  * `\r\n\r\n`, fake record boundaries, gzip magics, NULs), the
  * multi-member gunzip must reassemble arbitrary member splits, and the
  * chunked decoder must invert arbitrary chunkings. Content-Length
  * framing means no payload byte sequence may confuse the parser — this
  * spec is where that claim earns itself. */
class WarcFuzzSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // hostile payloads: empty, CRLF runs, fake WARC/HTTP boundaries,
  // gzip magic, NULs, high bytes, long runs
  private val payloadGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(Array.empty[Byte]),
    Gen.const("\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n".getBytes(UTF_8)),
    Gen.const("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)),
    Gen.const(Array[Byte](0x1f, 0x8b.toByte, 8, 0)),
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray),
    Gen.chooseNum(1, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray)))

  test("warcSave/read round-trips arbitrary payload bytes (all codecs)") {
    import spark.implicits._
    val docs = (0 until 48).map { i =>
      (s"https://fuzz.example/p/$i", "2026-01-01T00:00:00Z",
        s"<urn:fuzz:$i>", "application/octet-stream",
        sample(payloadGen, 1000 + i))
    }
    val df = docs.toDF("target_uri", "warc_date", "record_id",
      "http_content_type", "payload")
    for (codec <- Seq("gzip", "zstd", "none")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_fuzz_$codec").toString
      assert(WarcIO.warcSave(df.repartition(3), dir, codec = codec) == 48L)
      val got = spark.read.format("graft-warc").load(dir)
        .filter(col("warc_type") === "response")
        .select("target_uri", "payload").collect()
        .map(r => r.getString(0) ->
          r.getAs[Array[Byte]](1).toSeq).toMap
      assert(got.size == 48)
      docs.foreach { case (uri, _, _, _, p) =>
        assert(got(uri) == p.toSeq,
          s"payload of $uri drifted through the $codec round trip")
      }
      // the indexed fetch survives the same hostile payloads
      val fetched = WarcIO.warcFetch(spark, dir,
        docs.take(7).map(_._1).toDF("target_uri"))
        .select("target_uri", "payload").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      docs.take(7).foreach { case (uri, _, _, _, p) =>
        assert(fetched(uri) == p.toSeq, s"fetch of $uri drifted ($codec)")
      }
    }
  }

  test("truncated/corrupt zstd frame fails loudly, never truncates silently") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fuzz_zcut").toString
    val df = (0 until 12).map(i =>
      (s"https://fuzz.example/z/$i", "2026-01-01T00:00:00Z",
        s"<urn:fuzzz:$i>", "text/plain",
        sample(payloadGen, 2000 + i)))
      .toDF("target_uri", "warc_date", "record_id",
        "http_content_type", "payload")
    WarcIO.warcSave(df.repartition(1), dir, codec = "zstd")
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.zst")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    // cut mid-frame: the reader must throw, not return a prefix as if
    // the archive simply ended there
    java.nio.file.Files.write(part.toPath, bytes.take(bytes.length - 7))
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir).count()
    }
    assert(ex.getMessage != null)
    // corrupt frame magic: equally loud
    val garbled = bytes.clone(); garbled(0) = 0x00
    java.nio.file.Files.write(part.toPath, garbled)
    intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir).count()
    }
  }

  test("multi-member gunzip reassembles arbitrary member splits") {
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { trial =>
      val members = (0 to rnd.nextInt(5)).map { _ =>
        val n = rnd.nextInt(3000)
        val b = new Array[Byte](n); rnd.nextBytes(b); b
      }
      val bos = new java.io.ByteArrayOutputStream()
      members.foreach { m =>
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(m); gz.finish()
      }
      val in = new MultiMemberGzipInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray), s"t$trial")
      val out = in.readAllBytes()
      assert(out.toSeq == members.flatten.toSeq,
        s"trial $trial: ${members.map(_.length)} reassembled wrong")
    }
  }

  test("chunked decoding inverts arbitrary chunkings; torn input is refused") {
    val rnd = new scala.util.Random(11)
    (0 until 40).foreach { trial =>
      val body = new Array[Byte](rnd.nextInt(2000)); rnd.nextBytes(body)
      // random chunking of the body, sometimes with extensions
      val bos = new java.io.ByteArrayOutputStream()
      var pos = 0
      while (pos < body.length) {
        val n = math.min(1 + rnd.nextInt(300), body.length - pos)
        val ext = if (rnd.nextBoolean()) ";x=1" else ""
        bos.write(s"${n.toHexString}$ext\r\n".getBytes(UTF_8))
        bos.write(body, pos, n)
        bos.write("\r\n".getBytes(UTF_8))
        pos += n
      }
      bos.write("0\r\n\r\n".getBytes(UTF_8))
      val enc = bos.toByteArray
      assert(WarcHttp.dechunk(enc).map(_.toSeq).contains(body.toSeq),
        s"trial $trial: dechunk lost bytes")
      // tearing the encoding anywhere must yield None, never garbage
      val cut = enc.take(rnd.nextInt(math.max(1, enc.length - 1)))
      val torn = WarcHttp.dechunk(cut)
      assert(torn.isEmpty || torn.map(_.toSeq).contains(
        body.take(torn.get.length).toSeq),
        s"trial $trial: torn chunking produced garbage")
    }
  }
}
