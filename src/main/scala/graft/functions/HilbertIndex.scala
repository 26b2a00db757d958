package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** The Skilling transform (John Skilling, "Programming the Hilbert
  * curve", AIP 2004 — the standard public n-D algorithm) as one plain
  * JVM loop, shared verbatim by interpreted eval and generated code.
  *
  * A top-level object with no companion class compiles to static
  * forwarders, so janino-generated code calls
  * `graft.functions.HilbertCurve.index(xs, bits)` directly. */
object HilbertCurve {

  /** Axes → Hilbert distance for `xs.length` dimensions at `bits` bits
    * per dimension. Mutates `xs` (callers pass a scratch array). The
    * bit-for-bit reference for [[graft.operators.Layout.withHilbertN]] —
    * exchange/invert fold MSB→LSB, Gray correction, parity mask, plain
    * interleave with dimension 0 at the high bit of each group. */
  def index(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    val mask = (1L << bits) - 1
    var i = 0
    while (i < n) { xs(i) &= mask; i += 1 }
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((xs(i) & q) != 0) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((xs(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    var d = 0L
    var j = 0
    while (j < bits) {
      i = 0
      while (i < n) {
        d |= ((xs(i) >> j) & 1L) << (j * n + (n - 1 - i))
        i += 1
      }
      j += 1
    }
    d
  }
}

/** N-D Hilbert distance as a native Catalyst expression with whole-stage
  * codegen: `graft_hilbert(bits, x0, …, x_{n−1})`.
  *
  * The Column fold ([[graft.operators.Layout]]'s private differential
  * twin) needs `(bits−1)·n` materialized projection stages because each
  * exchange step reads both prior coordinates; as ONE expression the
  * whole Skilling loop runs inside the enclosing codegen stage — no
  * intermediate columns, no projection chain, one static call per row.
  * NorthStarSpec pins the two bit-equal across dimensions and widths.
  *
  * Null semantics: any null coordinate → null index (same as the fold,
  * where bitwise ops propagate null). */
case class HilbertIndex(bits: Int, dims: Seq[Expression])
    extends Expression {
  require(dims.length >= 2 && dims.length <= 6,
    s"graft_hilbert takes 2..6 dimensions, got ${dims.length}")
  require(bits >= 1 && dims.length * bits <= 63,
    s"bits in [1, ${63 / dims.length}] (n·bits ≤ 63): $bits")

  override def children: Seq[Expression] = dims
  override def dataType: DataType = LongType
  override def nullable: Boolean = dims.exists(_.nullable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = dims.filterNot(_.dataType == LongType)
    if (bad.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert dimensions must be BIGINT (cast first), got " +
          bad.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](dims.length)
    var i = 0
    while (i < dims.length) {
      val v = dims(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertCurve.index(xs, bits)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = dims.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    val childEval = evs.map(_.code.toString).mkString("\n")
    val nullCond =
      if (nullable) evs.map(_.isNull.toString).mkString(" || ")
      else "false"
    val assigns = evs.zipWithIndex
      .map { case (e, i) => s"$xs[$i] = ${e.value};" }.mkString(" ")
    ev.copy(code = code"""
      |$childEval
      |boolean ${ev.isNull} = $nullCond;
      |long ${ev.value} = -1L;
      |if (!${ev.isNull}) {
      |  long[] $xs = new long[${dims.length}];
      |  $assigns
      |  ${ev.value} = graft.functions.HilbertCurve.index($xs, $bits);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dims = newChildren)
}
