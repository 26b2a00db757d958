package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark
import graft.operators.TextAnalysis

/** BPE merge training: differential-tested against an independent
  * in-memory trainer (Map-based pair counting, no Spark), plus the
  * character-conservation property of segmentation.
  */
class BpeSpec extends AnyFunSuite {

  /** Independent reference BPE trainer: same semantics (character
    * symbols + end-of-word marker, weighted adjacent-pair counts over
    * the distinct-word frequency table, (count desc, left asc, right
    * asc) argmax, leftmost-first merge application), implemented with
    * plain collections — shares no code with the operator under test
    * except the tie-break contract. */
  private def referenceBpe(
      corpus: Seq[String], nMerges: Int,
      minPairCount: Long): Seq[(String, String, Long)] = {
    val wordFreq = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    def segment(w: String, merges: Seq[(String, String)]): Vector[String] = {
      var cur = (w.map(_.toString) :+ "</w>").toVector
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == l && cur(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += cur(i); i += 1 }
        }
        cur = out.result()
      }
      cur
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (!done && merges.size < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      wordFreq.foreach { case (w, f) =>
        val s = segment(w, merges.map(m => (m._1, m._2)).toSeq)
        (0 until s.length - 1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (bp, bc) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (bc < minPairCount) done = true
        else merges += ((bp._1, bp._2, bc))
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox was quick and the dog was lazy",
    "a quick test of the quick merge loop over the test corpus",
    "low lower lowest newer newest wider widest the the the")

  private def corpusDf = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("distributed BPE training matches the independent reference trainer") {
    val got = TextAnalysis.deriveBpeMerges(corpusDf, "doc_id", "text",
      nMerges = 30, minPairCount = 2L)
    val want = referenceBpe(corpus, nMerges = 30, minPairCount = 2L)
    assert(got == want)
    assert(got.nonEmpty && got.size <= 30)
    // counts are non-increasing only per unchanged pair space in general,
    // but every recorded merge must have met the floor
    assert(got.forall(_._3 >= 2L))
  }

  test("BPE training is deterministic across reruns and repartitioning") {
    val a = TextAnalysis.deriveBpeMerges(corpusDf, "doc_id", "text", 12)
    val b = TextAnalysis.deriveBpeMerges(corpusDf.repartition(7),
      "doc_id", "text", 12)
    assert(a == b)
  }

  test("segmentation conserves characters and terminates every word") {
    val merges = TextAnalysis.deriveBpeMerges(corpusDf, "doc_id", "text", 20)
      .map(m => (m._1, m._2))
    val seg = corpusDf.select(col("doc_id"),
      TextAnalysis.bpeTokens(col("text"), merges).as("pieces"),
      col("text"))
    seg.collect().foreach { r =>
      val pieces = r.getSeq[String](1)
      val text = r.getString(2)
      val words = text.split(" ").filter(_.nonEmpty)
      // stripping markers and concatenating recovers the original chars
      assert(pieces.mkString("").replace("</w>", "") == words.mkString(""))
      // exactly one end-of-word marker per word
      assert(pieces.count(_.endsWith("</w>")) == words.length)
    }
  }

  test("hostile corpora: empty, single-char, and null-safe segmentation") {
    import spark.implicits._
    // empty corpus -> no merges, no throw
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.deriveBpeMerges(empty, "doc_id", "text", 5).isEmpty)
    // single-char words: only (c, </w>) pairs are ever available
    val chars = Seq((1L, "a a a b b")).toDF("doc_id", "text")
    val m = TextAnalysis.deriveBpeMerges(chars, "doc_id", "text", 5)
    assert(m.nonEmpty && m.head == (("a", "</w>", 3L)))
    // null text segments to an empty piece list, not a throw
    val withNull = Seq((1L, "ab ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.deriveBpeMerges(withNull, "doc_id", "text", 3)
    val seg = withNull.select(
      TextAnalysis.bpeTokens(col("text"),
        merges.map(x => (x._1, x._2))).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(seg.exists(_.isEmpty) && seg.exists(_.nonEmpty))
  }

  test("driver-side trainer matches the per-merge-job trainer exactly") {
    // the scale path (trainBpeMerges) must produce the IDENTICAL merge
    // list — same pairs, same order, same weighted counts — as the
    // distributed sequential reference (deriveBpeMerges), which is itself
    // differential-tested against the independent plain-Scala trainer
    val slow = TextAnalysis.deriveBpeMerges(corpusDf, "doc_id", "text",
      nMerges = 30, minPairCount = 2L)
    val fast = TextAnalysis.trainBpeMerges(corpusDf, "doc_id", "text",
      nMerges = 30, minPairCount = 2L)
    assert(fast == slow)
    // and against the independent reference directly
    assert(fast == referenceBpe(corpus, nMerges = 30, minPairCount = 2L))
  }

  test("driver-side trainer: deep merge list is deterministic and ranked") {
    val a = TextAnalysis.trainBpeMerges(corpusDf, "doc_id", "text",
      nMerges = 512, minPairCount = 1L)
    val b = TextAnalysis.trainBpeMerges(corpusDf.repartition(5),
      "doc_id", "text", nMerges = 512, minPairCount = 1L)
    assert(a == b)
    // merge counts meet the floor, and the corpus is small enough that
    // training exhausts the pair space before 512 merges
    assert(a.forall(_._3 >= 1L) && a.nonEmpty)
    // independent reference agrees at full depth too
    assert(a == referenceBpe(corpus, nMerges = 512, minPairCount = 1L))
  }

  test("driver-side trainer: minWordCount prunes and maxWords guards loudly") {
    // pruning rare words changes the count table the same way on both paths
    val prunedFast = TextAnalysis.trainBpeMerges(corpusDf, "doc_id", "text",
      nMerges = 10, minPairCount = 2L, minWordCount = 2L)
    val freq = corpus.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).collect { case (w, ws) if ws.size >= 2 => w }
    assert(prunedFast.nonEmpty)
    // every merged symbol pair must be derivable from the surviving words
    val joined = freq.mkString(" ")
    prunedFast.foreach { case (l, r, _) =>
      assert(joined.contains((l + r).replace("</w>", "")))
    }
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.trainBpeMerges(corpusDf, "doc_id", "text",
        nMerges = 5, maxWords = 3L)
    }
    assert(ex.getMessage.contains("minWordCount"))
  }

  test("the registry query emits ranked merges") {
    val df = graft.queries.Text.qT32BpeMerges.fn(spark, GraftSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
  }

  test("the deep-vocab registry query trains hundreds of merges") {
    val rows = graft.queries.Text.qT37Bpe512.fn(spark, GraftSpark.sf)
      .collect()
    assert(rows.length > 100, s"expected deep merge list, got ${rows.length}")
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    // pair counts never increase faster than the pair space shrinks in a
    // way that breaks the floor; rank order is the training order
    assert(rows.forall(_.getLong(3) >= 1L))
  }
}
