package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-level MinHash signature over an array of pre-folded hashes (values
  * already in [0, prime)) — the SAME permutation family, constants, and
  * update arithmetic as [[MinHashSketch]], so a signature computed per row
  * is bit-identical to one aggregated over the exploded hash column.
  *
  * Exists for STREAMING near-dup: an append-mode stream cannot run the
  * groupBy the sketch aggregate needs, but each document's shingle set
  * arrives whole on its row, so the signature is computable without any
  * shuffle at all. Batch callers keep the aggregate (map-side partial
  * merge); both paths land in the same banding, so stream candidates equal
  * batch candidates exactly.
  */
case class MinHashRow(
    child: Expression,
    permA: Array[Long],
    permB: Array[Long],
    prime: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = permA.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val x = (permA(j) * h + permB(j)) % prime
          if (x < sig(j)) sig(j) = x
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
