package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization ("MaxMatch" — the WordPiece
  * inference algorithm of Devlin et al. 2019 / Song et al. EMNLP'21,
  * simplified: no continuation-prefix convention) against a fixed
  * vocabulary.
  *
  * Each whitespace word is segmented left-to-right: take the LONGEST
  * vocab piece (bounded by `maxPiece` chars) matching at the cursor,
  * else emit `[UNK]` and advance one character. Deterministic by
  * construction; every input character is consumed exactly once (a
  * `[UNK]` accounts for one character), which the spec asserts as a
  * conservation property.
  *
  * Exists because training-data budgeting (sequence packing, mixture
  * sampling) wants SUBWORD counts, not whitespace counts — a real BPE/WP
  * vocab drops in by swapping the `vocab` list. Row-level expression,
  * CodegenFallback like [[MinHashRow]]: per-row compute-bound, nothing
  * shuffles, and the vocab set rides the expression (one instance per
  * task after serialization, not per row).
  *
  * `vocab` is a Seq, not an Array, ON PURPOSE: case-class equality over an
  * Array field is reference equality, so two structurally identical
  * expressions would never compare equal — defeating Catalyst
  * canonicalization and common-subexpression elimination.
  */
case class WordpieceTokens(
    child: Expression, vocab: Seq[String], maxPiece: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxPiece > 0, s"bad maxPiece: $maxPiece")

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      text.length / 4 + 4)
    var w = 0
    val words = text.split(" ", -1)
    while (w < words.length) {
      val word = words(w)
      var i = 0
      while (i < word.length) {
        var l = math.min(maxPiece, word.length - i)
        var matched = false
        while (l >= 1 && !matched) {
          val cand = word.substring(i, i + l)
          if (vocabSet.contains(cand)) {
            out += UTF8String.fromString(cand)
            i += l
            matched = true
          }
          l -= 1
        }
        if (!matched) {
          out += UTF8String.fromString("[UNK]")
          i += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
