package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Shared static kernels for the PQ asymmetric-distance (ADC) expressions.
  *
  * A top-level object with no companion class compiles to static
  * forwarders, so janino-generated code calls these directly (the
  * [[HilbertCurve]] pattern). Both readers are endian-EXPLICIT: the packed
  * query vector is little-endian float64 regardless of platform, so a
  * heterogeneous cluster cannot skew distances.
  */
object AdcMath {

  /** Unit-normalize an array<double> and pack it as little-endian float64
    * bytes. Division by `nrm` (not multiplication by a reciprocal) keeps
    * every component bit-identical to [[graft.operators.Similarity]]'s
    * `PqMath.unit`; `nrm == 0` passes the raw values through unchanged,
    * same as there. */
  def packUnit(v: ArrayData, nrm: Double): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n * 8)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val bits =
        java.lang.Double.doubleToRawLongBits(if (nrm == 0) x else x / nrm)
      val off = i << 3
      out(off) = bits.toByte
      out(off + 1) = (bits >>> 8).toByte
      out(off + 2) = (bits >>> 16).toByte
      out(off + 3) = (bits >>> 24).toByte
      out(off + 4) = (bits >>> 32).toByte
      out(off + 5) = (bits >>> 40).toByte
      out(off + 6) = (bits >>> 48).toByte
      out(off + 7) = (bits >>> 56).toByte
      i += 1
    }
    out
  }

  /** ADC squared-L2 between a packed unit query vector and an m-byte PQ
    * code against flattened codebooks (`flat[(mi·kk + c)·sub + i]`). The
    * per-subspace / per-component summation order matches the LUT path
    * and the former RDD scan exactly, so distances are bit-equal. */
  def distance(qu: Array[Byte], code: Array[Byte], flat: Array[Double],
      m: Int, sub: Int, kk: Int): Double = {
    var d = 0.0
    var mi = 0
    while (mi < m) {
      val base = (mi * kk + (code(mi) & 0xff)) * sub
      var i = 0
      while (i < sub) {
        val off = (mi * sub + i) << 3
        val bits =
          (qu(off) & 0xffL) |
          ((qu(off + 1) & 0xffL) << 8) |
          ((qu(off + 2) & 0xffL) << 16) |
          ((qu(off + 3) & 0xffL) << 24) |
          ((qu(off + 4) & 0xffL) << 32) |
          ((qu(off + 5) & 0xffL) << 40) |
          ((qu(off + 6) & 0xffL) << 48) |
          ((qu(off + 7) & 0xffL) << 56)
        val t = java.lang.Double.longBitsToDouble(bits) - flat(base + i)
        d += t * t
        i += 1
      }
      mi += 1
    }
    d
  }
}

/** `pack_unit(v, nrm)` — unit-normalize an array<double> ONCE per query
  * row and ship it as a packed little-endian float64 BINARY: binary
  * survives every downstream operator as a primitive byte[], where an
  * array<double> column would re-box all `dim` elements on every joined
  * candidate pair (measured 3× slower on the 3M-pair sf0.1 shape).
  * Replaces the former Scala `packUnit` udf in
  * [[graft.operators.Similarity.ivfPqTopKJoin]] with a codegen'd
  * expression, bit-identical output (AdcDistanceSpec pins it). */
case class PackUnitVector(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcMath.packUnit(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.AdcMath.packUnit($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `adc_distance(qu, code)` — PQ asymmetric squared-L2 between a packed
  * query vector (BINARY, little-endian float64) and an m-byte PQ code,
  * with the trained codebooks embedded in the expression (a ~128 KB model
  * artifact, the [[DoubleDot]]-template shape).
  *
  * This is the innermost loop of the distributed ANN join
  * ([[graft.operators.Similarity.ivfPqTopKJoin]]): |query·probes ⋈ list|
  * pairs × dim components. As a native expression the scan stays inside
  * whole-stage codegen — no Row materialization, no per-pair boxing, no
  * `createDataFrame` round trip — which removes the GC pressure behind the
  * former RDD path's run-to-run variance. The flattened codebook array is
  * shipped once per task via the codegen reference mechanism, not once per
  * row.
  *
  * Summation order (subspace-major, component-ascending) is identical to
  * the collect path's LUT construction, so distances are bit-equal and
  * IvfPqJoinSpec's row-for-row equality keeps holding. */
case class AdcDistance(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]])
    extends BinaryExpression {

  @transient private lazy val m = books.length
  @transient private lazy val kk = books(0).length
  @transient private lazy val sub = books(0)(0).length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * kk * sub)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < kk) {
        System.arraycopy(books(mi)(c), 0, out, (mi * kk + c) * sub, sub)
        c += 1
      }
      mi += 1
    }
    out
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcMath.distance(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], flat, m, sub, kk)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("adcBooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.AdcMath.distance(
         |  $a, $b, $flatRef, $m, $sub, $kk);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
