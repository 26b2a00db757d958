package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.Mp4Samples

/** The stbl resolution must produce REAL byte ranges: reading each
  * sample's [offset, offset+size) out of the file must yield exactly the
  * closed-form filler the generator wrote — plus spec'd default behavior
  * (no stss ⇒ all sync) and hostile-input discipline. */
class Mp4SamplesSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark

  private def corpus(ids: Seq[Long]): Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal.syntheticMp4s(ids.toDF("doc_id"), "doc_id")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])].collect().toMap
  }

  test("absolute offsets address the actual sample bytes") {
    corpus(Seq(0L, 3L, 7L, 18L)).foreach { case (mid, bytes) =>
      val samples = Mp4Samples.sampleTable(bytes).getOrElse(
        fail(s"media $mid: sampleTable -> None"))
      assert(samples.length == (4 + mid % 5).toInt)
      samples.foreach { s =>
        assert(s.size == 100 + 10 * ((mid + s.idx) % 7))
        assert(s.dtsMs == s.idx * 40L)
        assert(s.keyframe == (s.idx % 3 == 0))
        var j = 0L
        while (j < s.size) {
          val expected = ((mid * 31 + s.idx * 7 + j) % 256).toByte
          assert(bytes((s.offset + j).toInt) == expected,
            s"media $mid sample ${s.idx} byte $j")
          j += 1
        }
      }
      // chunk 2's first sample still lands contiguously after chunk 1
      val offs = samples.map(_.offset)
      assert(offs == offs.sorted, "offsets must be non-decreasing")
    }
  }

  test("missing stss means every sample is sync (spec default)") {
    val bytes = corpus(Seq(5L))(5L)
    // rename the stss box to a 'free' box: same length, table dropped
    val idx = bytes.indexOfSlice("stss".getBytes("US-ASCII"))
    assert(idx > 0)
    val patched = bytes.clone()
    "free".getBytes("US-ASCII").copyToArray(patched, idx)
    val samples = Mp4Samples.sampleTable(patched).get
    assert(samples.nonEmpty && samples.forall(_.keyframe),
      "without an stss table every sample is a sync sample")
  }

  test("a sample range past the file end is refused, not mis-addressed") {
    val bytes = corpus(Seq(2L))(2L)
    // truncate inside the mdat payload: the table would address bytes
    // past the end -> the whole table is rejected
    val truncated = bytes.take(bytes.length - 50)
    assert(Mp4Samples.sampleTable(truncated).isEmpty)
  }

  test("corruption fuzz: mutations never throw, only degrade") {
    val bytes = corpus(Seq(9L))(9L)
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
        if (Mp4Samples.sampleTable(mutated).isDefined) ok += 1
      } catch {
        case e: Throwable =>
          fail(s"trial $trial threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    assert(ok > 0, "fuzz never reached a successful parse")
    assert(Mp4Samples.sampleTable(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("mp4SampleTable operator emits zero-shuffle rows incl. rel_offset") {
    // a narrow modulus slice, NOT .limit(): GlobalLimit inserts its own
    // exchange and would mask the operator's shuffle-free shape
    val docs = Tables.documents(spark, GraftSpark.sf)
      .filter(col("doc_id") % 64 === 3)
    val df = Multimodal.mp4SampleTable(Multimodal.syntheticMp4s(
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
      "the sample walk must stay a narrow map")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (mid, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getLong(6) == 0L, "rel_offset of sample 0 is 0")
      // rel_offset = prefix sum of sizes
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(6) == a.getLong(6) + a.getLong(3),
            s"media $mid: rel_offset not a prefix sum")
        case _ => ()
      }
    }
  }
}
