package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AdcDistance, AdcMath, PackUnitVector}

/** Pins the codegen'd ADC expressions bit-equal to the former RDD-scan
  * formulation (ByteBuffer little-endian reads over nested codebook
  * arrays) across fuzzed vectors, norms, and codebook shapes — both
  * through the DataFrame path (whole-stage codegen) and via the static
  * kernels directly (the interpreted-eval arithmetic). */
class AdcDistanceSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private val rnd = new scala.util.Random(0xADC)

  /** The former udf's packing, verbatim. */
  private def refPack(v: Array[Double], nrm: Double): Array[Byte] = {
    val u = if (nrm == 0) v else v.map(_ / nrm)
    val bb = ByteBuffer.allocate(u.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    u.foreach(bb.putDouble)
    bb.array()
  }

  /** The former RDD map's per-pair distance, verbatim. */
  private def refDist(qu: Array[Byte], code: Array[Byte],
      books: Array[Array[Array[Double]]]): Double = {
    val m = books.length
    val sub = books(0)(0).length
    val bb = ByteBuffer.wrap(qu).order(ByteOrder.LITTLE_ENDIAN)
    var d = 0.0
    var mi = 0
    while (mi < m) {
      val cw = books(mi)(code(mi) & 0xff)
      var i = 0
      while (i < sub) {
        val t = bb.getDouble((mi * sub + i) * 8) - cw(i)
        d += t * t; i += 1
      }
      mi += 1
    }
    d
  }

  private def books(m: Int, kk: Int, sub: Int): Array[Array[Array[Double]]] =
    Array.fill(m, kk, sub)(rnd.nextGaussian())

  test("static kernels are bit-equal to the former RDD formulation") {
    for (_ <- 1 to 200) {
      val m = 1 + rnd.nextInt(8)
      val kk = 1 + rnd.nextInt(256)
      val sub = 1 + rnd.nextInt(6)
      val bk = books(m, kk, sub)
      val v = Array.fill(m * sub)(rnd.nextGaussian() * 100)
      val nrm = if (rnd.nextInt(10) == 0) 0.0 else math.abs(rnd.nextGaussian())
      val code = Array.fill(m)(rnd.nextInt(kk).toByte)
      val packed = refPack(v, nrm)
      val flat = new Array[Double](m * kk * sub)
      for (mi <- 0 until m; c <- 0 until kk)
        System.arraycopy(bk(mi)(c), 0, flat, (mi * kk + c) * sub, sub)
      val got = AdcMath.distance(packed, code, flat, m, sub, kk)
      val want = refDist(packed, code, bk)
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(want), s"m=$m kk=$kk sub=$sub")
      val gp = AdcMath.packUnit(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), nrm)
      assert(java.util.Arrays.equals(gp, packed))
    }
  }

  test("DataFrame path (whole-stage codegen) matches the reference") {
    val m = 4; val kk = 16; val sub = 3
    val bk = books(m, kk, sub)
    val rows = (1 to 300).map { i =>
      val v = Array.fill(m * sub)(rnd.nextGaussian() * 10)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val code = Array.fill(m)(rnd.nextInt(kk).toByte)
      (i.toLong, v.toSeq, nrm, code)
    }
    import spark.implicits._
    val df = rows.toDF("id", "v", "nrm", "code")
    def packUnit(v: Column, nrm: Column): Column =
      ColumnBridge.column(PackUnitVector(
        ColumnBridge.expression(v), ColumnBridge.expression(nrm)))
    def adc(qu: Column, code: Column): Column =
      ColumnBridge.column(AdcDistance(
        ColumnBridge.expression(qu), ColumnBridge.expression(code), bk))
    val got = df
      .select(col("id"), adc(packUnit(col("v"), col("nrm")), col("code"))
        .as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v, nrm, code) =>
      val want = refDist(refPack(v.toArray, nrm), code, bk)
      assert(java.lang.Double.doubleToRawLongBits(got(id)) ==
        java.lang.Double.doubleToRawLongBits(want), s"id=$id")
    }
    // and the plan keeps the scan inside whole-stage codegen (repartition
    // first: ConvertToLocalRelation would otherwise fold the whole literal
    // frame at plan time — incidentally exercising interpreted eval, which
    // the collect above already pinned bit-equal)
    val planDf = df.repartition(2)
      .select(adc(packUnit(col("v"), col("nrm")), col("code")).as("d"))
    planDf.collect() // finalize the AQE plan before inspecting it
    val plan = planDf.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in tree strings
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[adcdistance.*"), plan)
  }
}
