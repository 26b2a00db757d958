package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import com.fasterxml.jackson.core.util.JsonParserDelegate
import com.fasterxml.jackson.databind.util.TokenBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.json.{JSONOptions, JacksonParser}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-tokenization FHIR bundle pivot: parses a bundle JSON document ONCE
  * and emits `struct<timestamp string, <Type> array<struct<…>> …>` with one
  * array column per registered resource type.
  *
  * Why an expression and not `from_json` composition: the declarative
  * formulations either re-tokenize the whole document per registered type
  * (13× with the default registry) or round-trip every resource subtree
  * through a captured JSON string (serialize + 2 re-parses per resource).
  * Here the document's tokens flow once. FHIR serializes `resourceType`
  * first, so in the common case the discriminator is read directly off the
  * live token stream and the REST of the resource's tokens feed straight
  * into the matching type's Catalyst `JacksonParser` through a subtree-
  * restricting [[JsonParserDelegate]] — zero buffering, zero re-parsing.
  * When `resourceType` is not the first field, the subtree falls back to a
  * `TokenBuffer` (token-level buffering, still no text re-serialization)
  * that is scanned for the discriminator and replayed. Both routes drive
  * the same converters `from_json` uses, so field semantics (permissive
  * nulls, unknown-field skipping) are identical to the declarative paths.
  * FhirIngestSpec certifies byte-identical output and measures the
  * speedup.
  *
  * Semantics matched to the declarative pivot (FhirPivotPropertySpec
  * fuzzes the equality over shuffled field order, junk fields, missing /
  * empty / unregistered resources):
  *  - malformed document → null result (all columns null downstream);
  *  - document without an `entry` array → null arrays;
  *  - `entry: []` → empty arrays;
  *  - unregistered / missing resourceType → resource dropped everywhere;
  *  - duplicate top-level `timestamp`/`entry` keys → last occurrence wins
  *    (the Jackson converter under from_json overwrites per occurrence),
  *    EXCEPT a non-array non-null `entry` occurrence: its ArrayType
  *    conversion fails and from_json's permissive partial row retains the
  *    previous occurrence's value, so the token loop skips it untouched.
  *
  * Two deliberate IMPROVEMENTS over the declarative formulations (which
  * the fuzz spec pins via a clean-twin property instead):
  *  - a non-object `entry` element (null, scalar, nested array) is
  *    skipped and every other entry still parses; from_json's PERMISSIVE
  *    partial-result rule instead nulls the WHOLE entry array, losing
  *    every resource in the bundle to one junk element;
  *  - a resource whose typed parse fails keeps its PARTIAL row when the
  *    converter produced one, else a null array element — never a
  *    silently shrunken array.
  *
  * `registry` field order defines the output array-column order (callers
  * pass the sorted registry); `resourceType` itself is not in any declared
  * schema, so the replaying parser skips it like any unknown field.
  */
case class FhirBundlePivot(child: Expression, registry: StructType)
    extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true

  override def dataType: StructType = StructType(
    StructField("timestamp", StringType, nullable = true) +:
      registry.fields.map(f =>
        StructField(f.name, ArrayType(f.dataType), nullable = true)))

  @transient private lazy val factory = new JsonFactory()

  @transient private lazy val typeIndex: Map[String, Int] =
    registry.fieldNames.zipWithIndex.toMap

  @transient private lazy val parsers: Array[JacksonParser] = {
    val opts = new JSONOptions(Map.empty[String, String], "UTC", "")
    registry.fields.map(f =>
      new JacksonParser(f.dataType, opts, false, Seq.empty))
  }

  override protected def nullSafeEval(input: Any): Any = {
    // feed Jackson the UTF-8 bytes directly: the byte-based parser skips
    // the UTF-16 String round-trip and is the faster Jackson code path
    val json = input.asInstanceOf[UTF8String].getBytes
    try {
      val jp = factory.createParser(json)
      try {
        if (jp.nextToken() != JsonToken.START_OBJECT) return null
        var timestamp: UTF8String = null
        var sawEntry = false
        val buckets =
          Array.fill(registry.length)(new ArrayBuffer[InternalRow])
        var t = jp.nextToken()
        while (t == JsonToken.FIELD_NAME) {
          val name = jp.currentName()
          val vt = jp.nextToken()
          if (name == "timestamp") {
            // last occurrence wins, including an explicit null — matching
            // the Jackson-converter overwrite the from_json baselines
            // apply. Non-string values replicate Catalyst's StringType
            // converter exactly: strings via getText, anything else
            // (numbers, booleans, objects, arrays) written back out as
            // JSON text via copyCurrentStructure — so a structured
            // timestamp yields its JSON serialization, not null.
            timestamp = vt match {
              case JsonToken.VALUE_NULL => null
              case JsonToken.VALUE_STRING => UTF8String.fromString(jp.getText)
              case _ =>
                val bos = new java.io.ByteArrayOutputStream()
                val gen = factory.createGenerator(bos)
                try gen.copyCurrentStructure(jp) finally gen.close()
                UTF8String.fromBytes(bos.toByteArray)
            }
          } else if (name == "entry") {
            // duplicate top-level 'entry' keys: LAST CONVERTIBLE occurrence
            // wins — from_json's converter overwrites the field per
            // occurrence for an array or an explicit null, but a NON-ARRAY
            // value fails its ArrayType conversion and the permissive
            // partial row RETAINS the previous occurrence's value (probed
            // against Spark 4.1.2; FhirPivotPropertySpec pins both with
            // duplicate-key generators), so only array/null occurrences
            // reset the buckets and a failed one is skipped untouched
            if (vt == JsonToken.START_ARRAY || vt == JsonToken.VALUE_NULL) {
              var bi = 0
              while (bi < buckets.length) { buckets(bi).clear(); bi += 1 }
              sawEntry = false
            }
            if (vt == JsonToken.START_ARRAY) {
              sawEntry = true
              var et = jp.nextToken()
              while (et != JsonToken.END_ARRAY && et != null) {
                if (et == JsonToken.START_OBJECT) {
                  var ft = jp.nextToken()
                  while (ft == JsonToken.FIELD_NAME) {
                    val fn = jp.currentName()
                    jp.nextToken()
                    if (fn == "resource"
                        && jp.currentToken() == JsonToken.START_OBJECT) {
                      handleResource(jp, buckets)
                    } else jp.skipChildren()
                    ft = jp.nextToken()
                  }
                } else {
                  // non-object entry element (null, scalar, nested array):
                  // skip it, like the declarative filter does — it must not
                  // abort the rest of the document
                  jp.skipChildren()
                }
                et = jp.nextToken()
              }
            } else jp.skipChildren()
          } else jp.skipChildren()
          t = jp.nextToken()
        }
        val arrays: Array[Any] =
          if (sawEntry)
            buckets.map(b => new GenericArrayData(b.toArray[Any]): Any)
          else Array.fill[Any](registry.length)(null)
        InternalRow.fromSeq(timestamp +: arrays.toSeq)
      } finally jp.close()
    } catch { case NonFatal(_) => null }
  }

  /** Dispatch one resource whose START_OBJECT is the current token. Fast
    * path: `resourceType` is the first field (how FHIR serializes), so the
    * discriminator comes straight off the stream and the remaining tokens
    * feed the typed converter live via [[SubtreeParser]]. Fallback: buffer
    * the subtree's tokens, scan for the discriminator, replay. Either way
    * the parser is left ON the resource's END_OBJECT. A resource that
    * fails its typed parse keeps its partial row or a null element via
    * [[keepPartial]]. */
  private def handleResource(
      jp: JsonParser, buckets: Array[ArrayBuffer[InternalRow]]): Unit = {
    val t1 = jp.nextToken()
    if (t1 == JsonToken.FIELD_NAME && jp.currentName() == "resourceType") {
      val tv = jp.nextToken()
      if (tv == JsonToken.VALUE_STRING) {
        val idx = typeIndex.getOrElse(jp.getText, -1)
        if (idx >= 0) {
          val sub = new SubtreeParser(jp)
          try {
            // rows are safe to retain un-copied:
            // JacksonParser.convertObject allocates a fresh
            // GenericInternalRow per call (verified against the 4.1.2
            // bytecode), nothing is buffer-backed
            parsers(idx)
              .parse[JsonParser](sub, (_, p) => p, _ => UTF8String.EMPTY_UTF8)
              .foreach(r => buckets(idx) += r)
          } catch { case NonFatal(e) => keepPartial(e, idx, buckets) }
          finally sub.finishSubtree()
        } else skipRestOfObject(jp)
      } else { jp.skipChildren(); skipRestOfObject(jp) }
    } else if (t1 == JsonToken.FIELD_NAME) {
      // resourceType not first: token-buffer the remaining fields inside a
      // reconstructed object frame, find the discriminator, replay
      val buf = new TokenBuffer(jp)
      buf.writeStartObject()
      var ft = t1
      while (ft == JsonToken.FIELD_NAME) {
        buf.copyCurrentEvent(jp) // the field name
        jp.nextToken()
        buf.copyCurrentStructure(jp) // the value subtree
        ft = jp.nextToken()
      }
      buf.writeEndObject()
      dispatchBuffered(buf, buckets)
      buf.close()
    }
    // t1 == END_OBJECT: empty resource object — nothing to do
  }

  /** Consume the remainder of the current object after its current field
    * value, leaving the parser ON the END_OBJECT. */
  private def skipRestOfObject(jp: JsonParser): Unit = {
    var t = jp.nextToken()
    while (t == JsonToken.FIELD_NAME) {
      jp.nextToken()
      jp.skipChildren()
      t = jp.nextToken()
    }
  }

  /** Fallback dispatch: read resourceType from the buffered tokens, then
    * replay them into the matching type's JacksonParser. */
  private def dispatchBuffered(
      buf: TokenBuffer, buckets: Array[ArrayBuffer[InternalRow]]): Unit = {
    var rt: String = null
    val p = buf.asParser()
    try {
      if (p.nextToken() == JsonToken.START_OBJECT) {
        var t = p.nextToken()
        while (rt == null && t == JsonToken.FIELD_NAME) {
          val n = p.currentName()
          p.nextToken()
          if (n == "resourceType"
              && p.currentToken() == JsonToken.VALUE_STRING) rt = p.getText
          else p.skipChildren()
          t = p.nextToken()
        }
      }
    } finally p.close()
    if (rt != null) {
      val idx = typeIndex.getOrElse(rt, -1)
      if (idx >= 0) {
        try {
          parsers(idx)
            .parse[TokenBuffer](buf, (_, b) => b.asParser(),
              _ => UTF8String.EMPTY_UTF8)
            .foreach(r => buckets(idx) += r)
        } catch { case NonFatal(e) => keepPartial(e, idx, buckets) }
      }
    }
  }

  /** PERMISSIVE handling for a resource whose typed parse failed: keep the
    * partial rows a BadRecordException carries (the same recovery
    * FailureSafeParser applies under from_json — e.g. one ill-typed field
    * nulls out, the rest of the resource survives); if there is nothing
    * partial, keep a null element so the entry is visibly lost rather than
    * silently shrinking the array. */
  private def keepPartial(
      e: Throwable, idx: Int,
      buckets: Array[ArrayBuffer[InternalRow]]): Unit = e match {
    case bre: org.apache.spark.sql.catalyst.util.BadRecordException =>
      val partial = try bre.partialResults() catch {
        case NonFatal(_) => Array.empty[InternalRow]
      }
      if (partial.nonEmpty) partial.foreach(buckets(idx) += _)
      else buckets(idx) += null
    case _ => buckets(idx) += null
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Presents the REMAINDER of a live parser's current object as a complete
  * standalone object: emits one synthetic START_OBJECT, then passes the
  * underlying tokens through until the object's matching END_OBJECT, then
  * end-of-input. Built for handing a subtree to Catalyst's JacksonParser
  * without buffering; the underlying parser must sit INSIDE the object
  * (its START_OBJECT and the already-read discriminator field consumed).
  *
  * `close()` is a no-op — JacksonParser.parse closes the parser it is
  * given, and the underlying document stream must survive. `skipChildren`
  * adjusts depth for the subtree it swallows (its END token never passes
  * through `nextToken`).
  */
private final class SubtreeParser(underlying: JsonParser)
    extends JsonParserDelegate(underlying) {
  private var synthetic = true
  private var done = false
  private var depth = 1
  private var cur: JsonToken = null

  override def nextToken(): JsonToken = {
    if (synthetic) {
      synthetic = false
      cur = JsonToken.START_OBJECT
    } else if (done) {
      cur = null
    } else {
      val t = delegate.nextToken()
      t match {
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY =>
          depth -= 1
          if (depth == 0) done = true
        case _ => ()
      }
      cur = t
    }
    cur
  }

  override def getCurrentToken: JsonToken = cur
  override def currentToken(): JsonToken = cur

  override def skipChildren(): JsonParser = {
    if (cur == JsonToken.START_OBJECT || cur == JsonToken.START_ARRAY) {
      delegate.skipChildren()
      depth -= 1
      cur = delegate.currentToken()
      if (depth == 0) done = true
    }
    this
  }

  override def close(): Unit = ()

  /** Drain any unread remainder so the underlying parser lands ON the
    * object's END_OBJECT even if the typed parse bailed mid-subtree. */
  def finishSubtree(): Unit = {
    var t: JsonToken = if (synthetic) nextToken() else cur
    while (!done && t != null) t = nextToken()
  }
}
