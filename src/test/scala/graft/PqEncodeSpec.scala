package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PqEncodeCode, PqEncodeMath}

/** Pins the codegen'd PQ-encode expression byte-equal to the former
  * RDD-scan formulation (per-row `PqMath.unit` + `PqMath.nearest` over
  * nested codebook arrays) across fuzzed vectors, norms, and codebook
  * shapes — both through the DataFrame path (whole-stage codegen) and via
  * the static kernel directly (the interpreted-eval arithmetic) — and
  * guards that the rewired index builds plan no RDD scan. */
class PqEncodeSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private val rnd = new scala.util.Random(0xEC0DE)

  /** The former mapPartitions encode, verbatim: full-vector unit
    * normalization, then per-subspace strict-less argmin. */
  private def refEncode(v: Array[Double], nrm: Double,
      books: Array[Array[Array[Double]]]): Array[Byte] = {
    val u = if (nrm == 0) v else v.map(_ / nrm)
    val m = books.length
    val sub = books(0)(0).length
    val code = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < books(mi).length) {
        var d = 0.0
        var i = 0
        while (i < sub) {
          val t = u(off + i) - books(mi)(c)(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code(mi) = best.toByte
      mi += 1
    }
    code
  }

  private def books(m: Int, kk: Int, sub: Int): Array[Array[Array[Double]]] =
    Array.fill(m, kk, sub)(rnd.nextGaussian())

  test("static kernel is byte-equal to the former RDD formulation") {
    for (_ <- 1 to 200) {
      val m = 1 + rnd.nextInt(8)
      val kk = 1 + rnd.nextInt(256)
      val sub = 1 + rnd.nextInt(6)
      val bk = books(m, kk, sub)
      val v = Array.fill(m * sub)(rnd.nextGaussian() * 100)
      val nrm = if (rnd.nextInt(10) == 0) 0.0 else math.abs(rnd.nextGaussian())
      val got = PqEncodeMath.encode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
        nrm, PqEncodeMath.flatten(bk), m, sub, kk)
      assert(java.util.Arrays.equals(got, refEncode(v, nrm, bk)),
        s"m=$m kk=$kk sub=$sub nrm=$nrm")
    }
  }

  test("duplicated codewords tie to the lowest code, like PqMath.nearest") {
    val bk = books(2, 4, 3)
    bk(0)(3) = bk(0)(1).clone() // duplicate: argmin must pick 1, never 3
    bk(1)(2) = bk(1)(0).clone()
    for (_ <- 1 to 50) {
      val v = Array.fill(6)(rnd.nextGaussian())
      val got = PqEncodeMath.encode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
        1.0, PqEncodeMath.flatten(bk), 2, 3, 4)
      assert(java.util.Arrays.equals(got, refEncode(v, 1.0, bk)))
      assert(got(0) != 3 && got(1) != 2, "tie must go to the lowest code")
    }
  }

  test("DataFrame path (whole-stage codegen) matches, plans no RDD scan") {
    val s = spark
    import s.implicits._
    val bk = books(4, 16, 2)
    val data = (0 until 64).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian() * 10)
      val nrm = if (i % 16 == 0) 0.0 else math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v, nrm)
    }
    val df = data.toDF("vec_id", "v", "nrm")
      .select(col("vec_id"), ColumnBridge.column(PqEncodeCode(
        ColumnBridge.expression(col("v")),
        ColumnBridge.expression(col("nrm")), bk)).as("code"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") && !plan.contains("Scan ExistingRDD"),
      s"encode must stay declarative:\n$plan")
    val got = df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    data.foreach { case (id, v, nrm) =>
      assert(java.util.Arrays.equals(got(id), refEncode(v, nrm, bk)), s"id=$id")
    }
  }

  test("the index-build encode pass plans no RDD scan and matches codes") {
    val s = spark
    import s.implicits._
    val emb = (0 until 48)
      .map(i => (i.toLong, Array.fill(8)(((i * 31 + 7) % 13 - 6).toDouble)))
      .toDF("vec_id", "embedding")
    val n = graft.operators.Similarity.normed(emb, "vec_id", "embedding")
    val bk = graft.operators.Similarity.pqCodebooks(n, m = 4)
    val codes = graft.operators.Similarity.pqEncode(n, bk)
    val plan = codes.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") &&
      !plan.contains("Scan ExistingRDD"),
      s"index codes must be expression-born:\n$plan")
    val ref = n.select("vec_id", "v", "nrm").collect().map { r =>
      r.getLong(0) -> refEncode(r.getSeq[Double](1).toArray, r.getDouble(2), bk)
    }.toMap
    val got = codes.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.size == 48)
    got.foreach { case (id, c) =>
      assert(java.util.Arrays.equals(c, ref(id)), s"id=$id")
    }
  }
}
