package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-trigram shingles of a single-space-tokenized string.
  *
  * Exact semantic twin of the composable form
  *   array_distinct(transform(sequence(0, size(t)-3),
  *     i -> concat_ws(" ", t[i+1], t[i+2], t[i+3])))
  * (with the whole text as the single shingle when < 3 tokens), but
  * evaluated as ONE native call per row instead of dozens of interpreted
  * higher-order-lambda invocations per shingle — shingling is the inner
  * loop of every near-dup operator, so it carries its own expression.
  * First-occurrence order is preserved (as array_distinct does).
  *
  * CodegenFallback is fine here: the per-row cost is a single JVM method
  * call; the codegen win was eliminating per-ELEMENT interpretation.
  */
case class WordTrigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    val out = new mutable.LinkedHashSet[UTF8String]
    if (toks.length >= 3) {
      var i = 0
      while (i <= toks.length - 3) {
        out.add(UTF8String.concatWs(space, toks(i), toks(i + 1), toks(i + 2)))
        i += 1
      }
    } else {
      out.add(UTF8String.concatWs(space, toks: _*))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
