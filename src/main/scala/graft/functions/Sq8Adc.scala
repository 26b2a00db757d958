package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static kernel for the SQ8 asymmetric distance — the [[AdcMath]]
  * pattern (top-level object → static forwarders janino calls
  * directly). Endian-explicit: the packed query is little-endian
  * float64 regardless of platform. */
object Sq8AdcMath {

  /** Asymmetric exact-on-reconstruction squared L2 between a packed unit
    * query (little-endian float64, ‖q‖ = 1) and a one-byte-per-dimension
    * SQ8 code: `d² = (1 − 2·q·r) + ‖r‖²` with `r_i` reconstructed at the
    * quantization-cell midpoint `mn_i + (code_i + 0.5)/256·sp_i`
    * (`sp_i == 0` → `mn_i`). The two dot products accumulate as separate
    * ascending-index sequential folds (one loop, two accumulators — each
    * accumulator's IEEE sequence is identical to its own fold), so the
    * result is BIT-EQUAL to the Column formulation
    * `1 − 2·dot(qu, sq8ReconCol(code)) + dot(recon, recon)` the one-shot
    * [[graft.operators.Similarity.ivfSq8TopK]] path evaluates — which is
    * what lets q_x13 hash-certify against the q_x12 replay oracle. */
  def distance(qu: Array[Byte], code: ArrayData,
      mins: Array[Double], spans: Array[Double]): Double = {
    val n = code.numElements()
    var qr = 0.0
    var rr = 0.0
    var i = 0
    while (i < n) {
      val sp = spans(i)
      val r =
        if (sp == 0) mins(i)
        else mins(i) + (code.getInt(i) + 0.5d) / 256d * sp
      val off = i << 3
      val bits =
        (qu(off) & 0xffL) |
        ((qu(off + 1) & 0xffL) << 8) |
        ((qu(off + 2) & 0xffL) << 16) |
        ((qu(off + 3) & 0xffL) << 24) |
        ((qu(off + 4) & 0xffL) << 32) |
        ((qu(off + 5) & 0xffL) << 40) |
        ((qu(off + 6) & 0xffL) << 48) |
        ((qu(off + 7) & 0xffL) << 56)
      val q = java.lang.Double.longBitsToDouble(bits)
      qr += q * r
      rr += r * r
      i += 1
    }
    (1.0 - 2.0 * qr) + rr
  }
}

/** `sq8_adc_distance(qu, code)` — the innermost loop of the distributed
  * IVF-SQ8 join ([[graft.operators.Similarity.ivfSq8TopKJoin]]):
  * |query·probes ⋈ list| pairs × dim components. The quantizer bounds
  * ride the expression as two dim-sized double arrays (a ~1 KB model
  * artifact at dim 64 — the [[AdcDistance]] template, three orders of
  * magnitude smaller than its codebooks), shipped once per task via the
  * codegen reference mechanism. As a native expression the probed scan
  * stays inside whole-stage codegen — no per-pair array<double>
  * reconstruction, boxing, or HOF lambda dispatch: the Column twin
  * materializes a 64-element reconstruction array per joined pair
  * before each of two HOF folds; this reads the byte codes in place. */
case class Sq8AdcDistance(left: Expression, right: Expression,
    mins: Array[Double], spans: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sq8AdcMath.distance(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[ArrayData], mins, spans)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val spRef = ctx.addReferenceObj("sq8Spans", spans, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.Sq8AdcMath.distance(
         |  $a, $b, $mnRef, $spRef);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
