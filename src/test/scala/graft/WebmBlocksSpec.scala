package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.WebmBlocks

/** The Cluster walk must produce REAL frame-byte ranges: reading each
  * block's [offset, offset+size) out of the file must yield exactly the
  * closed-form filler the generator wrote, with the block-header clock
  * and keyframe flags resolved; hostile input degrades, never throws. */
class WebmBlocksSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark

  private def corpus(ids: Seq[Long]): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.syntheticWebms(ids.toDF("doc_id"), "doc_id")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])].collect().toMap
  }

  test("absolute offsets address the actual frame bytes") {
    corpus(Seq(0L, 2L, 6L, 14L)).foreach { case (mid, bytes) =>
      val blocks = WebmBlocks.blockTable(bytes).getOrElse(
        fail(s"media $mid: blockTable -> None"))
      val nb = (3 + mid % 5).toInt
      val c1 = (nb + 1) / 2
      assert(blocks.length == nb)
      blocks.foreach { b =>
        assert(b.size == 50 + 10 * ((mid + b.idx) % 4))
        val wantTs =
          if (b.idx < c1) b.idx * 40L else 1000L + (b.idx - c1) * 40L
        assert(b.tsMs == wantTs, s"media $mid block ${b.idx} ts")
        assert(b.keyframe == (b.idx % 2 == 0))
        var j = 0L
        while (j < b.size) {
          val expected = ((mid * 17 + b.idx * 5 + j) % 256).toByte
          assert(bytes((b.offset + j).toInt) == expected,
            s"media $mid block ${b.idx} byte $j")
          j += 1
        }
      }
    }
  }

  test("corruption fuzz: mutations never throw, only degrade") {
    val bytes = corpus(Seq(4L))(4L)
    val rnd = new scala.util.Random(42)
    var ok = 0
    (0 until 300).foreach { trial =>
      val mutated = rnd.nextInt(3) match {
        case 0 => bytes.take(rnd.nextInt(bytes.length + 1))
        case 1 =>
          val b = bytes.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        case _ =>
          val at = rnd.nextInt(bytes.length)
          bytes.take(at) ++
            Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte) ++
            bytes.drop(at)
      }
      try {
        if (WebmBlocks.blockTable(mutated).isDefined) ok += 1
      } catch {
        case e: Throwable =>
          fail(s"trial $trial threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    assert(ok > 0, "fuzz never reached a successful parse")
    assert(WebmBlocks.blockTable(Array[Byte](1, 2, 3)).isEmpty)
    assert(WebmBlocks.blockTable("RIFF....AVI ".getBytes).isEmpty)
  }

  test("Info AFTER the Clusters still scales every timestamp") {
    // legal Matroska: the Info element (with a non-default 2 ms
    // TimestampScale) follows the Clusters; TimestampScale must be
    // resolved in a first pass, not applied in file-walk order
    def el(idBytes: Array[Int], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127)
      idBytes.map(_.toByte) ++
        Array((0x80 | payload.length).toByte) ++ payload
    }
    def uintBytes(v: Long): Array[Byte] = {
      var n = v; var out = List.empty[Byte]
      do { out = (n & 0xff).toByte :: out; n >>= 8 } while (n > 0)
      out.toArray
    }
    def simpleBlock(relTicks: Int): Array[Byte] =
      el(Array(0xA3), java.nio.ByteBuffer.allocate(4)
        .put(0x81.toByte).putShort(relTicks.toShort).put(0x80.toByte)
        .array() ++ Array.fill(8)(7.toByte))
    def cluster(ticks: Long): Array[Byte] =
      el(Array(0x1F, 0x43, 0xB6, 0x75),
        el(Array(0xE7), uintBytes(ticks)) ++ simpleBlock(5))
    val info = el(Array(0x15, 0x49, 0xA9, 0x66),
      el(Array(0x2A, 0xD7, 0xB1), uintBytes(2000000L))) // 2 ms per tick
    val bytes = el(Array(0x1A, 0x45, 0xDF, 0xA3), Array.empty) ++
      el(Array(0x18, 0x53, 0x80, 0x67),
        cluster(100L) ++ cluster(200L) ++ info)
    val blocks = WebmBlocks.blockTable(bytes).getOrElse(fail("no blocks"))
    assert(blocks.map(_.tsMs) == Seq(210L, 410L),
      s"2 ms scale must apply to clusters preceding the Info element: " +
        s"${blocks.map(_.tsMs)}")
  }

  test("webmBlockTable operator stays a zero-shuffle narrow map") {
    val docs = Tables.documents(spark, GraftSpark.sf)
      .filter(col("doc_id") % 64 === 6)
    val df = Multimodal.webmBlockTable(Multimodal.syntheticWebms(
      docs, "doc_id"))
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the synthetic builder's ONE
    // narrow-id round-robin spread (r21 encode parallelization); the
    // walk itself must not shuffle — pin the exact count so a payload
    // round-robin shuffle sneaking in would fail, not just hash/range
    assert("(?i)Exchange roundrobinpartitioning".r
        .findAllMatchIn(plan).size == 1,
      s"exactly one builder round-robin spread expected:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning")
        && !plan.contains("Exchange rangepartitioning")
        && !plan.contains("Exchange SinglePartition"),
      "the block walk must stay a narrow map")
    assert(df.count() > 0)
  }
}
