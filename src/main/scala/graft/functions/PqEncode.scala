package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Static kernel for the PQ-encode expression — the [[AdcMath]] pattern:
  * a top-level object compiles to static forwarders janino-generated code
  * calls directly. */
object PqEncodeMath {

  /** Flatten per-subspace codebooks to the `flat[(mi·kk + c)·sub + i]`
    * layout both [[PqEncodeCode]] and
    * [[graft.functions.AdcDistance]] scan. */
  def flatten(books: Array[Array[Array[Double]]]): Array[Double] = {
    val m = books.length
    val kk = books(0).length
    val sub = books(0)(0).length
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

  /** PQ-encode one vector: unit-normalize (division by `nrm`, raw
    * pass-through when `nrm == 0` — bit-identical to `PqMath.unit`), then
    * per subspace the argmin-squared-L2 codeword with the strict-less
    * tie-to-lowest rule and the ascending-component summation order of
    * `PqMath.nearest`, so codes are byte-equal to the former RDD encode
    * path (PqEncodeSpec pins it). */
  def encode(v: ArrayData, nrm: Double, flat: Array[Double],
      m: Int, sub: Int, kk: Int): Array[Byte] = {
    val dim = m * sub
    val u = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val x = v.getDouble(i)
      u(i) = if (nrm == 0) x else x / nrm
      i += 1
    }
    val code = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < kk) {
        val base = (mi * kk + c) * sub
        var d = 0.0
        var j = 0
        while (j < sub) {
          val t = u(off + j) - flat(base + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict: ties → lowest code
        c += 1
      }
      code(mi) = best.toByte
      mi += 1
    }
    code
  }
}

/** `pq_encode(v, nrm)` — one PQ code (m bytes, one per subspace) per
  * vector, with the trained codebooks embedded in the expression (the
  * [[AdcDistance]] model-artifact shape, shipped once per task via the
  * codegen reference mechanism).
  *
  * This is the index-build hot path ([[graft.operators.Similarity]]'s
  * `pqEncode` and `codedListRows`): |corpus| rows × m·k·sub distance
  * components each. As a native expression the encode stays inside
  * whole-stage codegen — no Row materialization, no `createDataFrame`
  * round trip — and, unlike the former RDD scan, survives under any
  * downstream operator Catalyst plans (the coded column is born narrow on
  * the corpus partitioning either way). */
case class PqEncodeCode(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]])
    extends BinaryExpression {

  @transient private lazy val m = books.length
  @transient private lazy val kk = books(0).length
  @transient private lazy val sub = books(0)(0).length
  @transient private lazy val flat: Array[Double] =
    PqEncodeMath.flatten(books)

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqEncodeMath.encode(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Double], flat, m, sub, kk)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.PqEncodeMath.encode(
         |  $a, $b, $flatRef, $m, $sub, $kk);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
