package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sketch aggregates for the near-dup operators.
  *
  * A k-permutation MinHash signature as k separate `min(...)` aggregate
  * columns generates one enormous update function — past either Spark's
  * whole-stage-codegen field limit (interpreted fallback) or the JVM's 8KB
  * JIT threshold (deoptimized codegen), both slow. A
  * TypedImperativeAggregate keeps the whole signature in one primitive
  * long-array buffer with a tight native update loop: one aggregate column,
  * k multiply-add-mods per input row, partial-merge friendly (elementwise
  * min/sum), so the map-side combine still does most of the work before the
  * shuffle at scale.
  */

/** Elementwise-min signature over universal hashes
  * h → (a·h + b) mod p of a pre-hashed long input column. */
case class MinHashSketch(
    child: Expression,
    permA: Array[Long],
    permB: Array[Long],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val k = permA.length

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val x = (permA(i) * h + permB(i)) % prime
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
}

/** Per-bit ±1 vote accumulator over 64-bit hashes; eval packs the vote
  * signs into the final SimHash signature long. */
case class SimHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSketch =
    copy(child = newChildren.head)
}

/** Bounded bottom-k summary over (priority, item) long pairs: keeps the
  * k pairs with the smallest (priority, item) lexicographic order in a
  * size-k binary max-heap — one pass, order-independent, mergeable
  * (merging two heaps = pushing one into the other), so map-side combine
  * caps what crosses the shuffle at k pairs per group per partition.
  *
  * This is the aggregation-shaped alternative to
  * [[graft.operators.Skew.topKPerGroup]]'s salted two-level rank: the
  * window path shuffles EVERY row once (level-1 rank partitions), the
  * sketch path shuffles only the per-partition survivors — the right
  * trade when k is small and the per-row payload is an id to re-join.
  * Deterministic for a total (priority, item) order; ties in priority
  * break by item. Null priority or item → pair skipped. */
case class BottomKSketch(
    priority: Expression,
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKSketch.Heap] {

  require(k >= 1 && k <= 65536, s"k in [1, 65536]: $k")

  import BottomKSketch.Heap

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val p = priority.eval(input)
    val v = item.eval(input)
    if (p != null && v != null)
      buf.offer(p.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Heap, b: Heap): Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.pris(i), b.items(i)); i += 1 }
    a
  }

  override def eval(buf: Heap): Any = {
    val idx = Array.range(0, buf.size).sortBy(i => (buf.pris(i), buf.items(i)))
    new GenericArrayData(idx.map { i =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](buf.pris(i), buf.items(i)))
    })
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.pris(i)); bb.putLong(buf.items(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong(), bb.getLong()); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pri", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("item", LongType,
        nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(priority, item)

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSketch =
    copy(priority = newChildren.head, item = newChildren(1))
}

object BottomKSketch {
  /** Size-k max-heap on (pri, item) — root is the LARGEST kept pair, so
    * a new pair below it evicts the root in O(log k). Arrays, not boxed
    * nodes: the update loop is the per-row hot path. */
  final class Heap(k: Int) {
    val pris = new Array[Long](k)
    val items = new Array[Long](k)
    var size = 0

    private def gt(p1: Long, i1: Long, p2: Long, i2: Long): Boolean =
      p1 > p2 || (p1 == p2 && i1 > i2)

    def offer(p: Long, v: Long): Unit = {
      if (size < k) {
        var i = size
        pris(i) = p; items(i) = v; size += 1
        // sift up
        while (i > 0 && gt(pris(i), items(i), pris((i - 1) / 2),
            items((i - 1) / 2))) {
          val par = (i - 1) / 2
          swap(i, par); i = par
        }
      } else if (gt(pris(0), items(0), p, v)) {
        pris(0) = p; items(0) = v
        // sift down
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && gt(pris(l), items(l), pris(m), items(m))) m = l
          if (r < size && gt(pris(r), items(r), pris(m), items(m))) m = r
          if (m == i) done = true
          else { swap(i, m); i = m }
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val tp = pris(a); pris(a) = pris(b); pris(b) = tp
      val ti = items(a); items(a) = items(b); items(b) = ti
    }
  }
}

/** Mergeable Misra–Gries frequent-items summary over a string column:
  * at most `capacity` counters, one-pass, with the classic deterministic
  * guarantee that every item occurring more than N/(capacity+1) times IS
  * in the summary and every estimate undercounts by at most
  * N/(capacity+1). The bounded-memory answer to "top tokens" when the
  * item cardinality is too large for an exact (token)-keyed aggregation
  * — the summary is a few KB per partition regardless of input size, and
  * partial merges (Agarwal et al., mergeable-summaries reduction:
  * sum counts, subtract the (capacity+1)-th largest, drop non-positive)
  * preserve the bound, so map-side combine does almost all the work.
  *
  * Estimates depend on encounter order (inherent to MG), so queries over
  * it are rows-only; the guarantee itself is deterministic and
  * spec-tested against exact counts.
  */
case class FrequentItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      scala.collection.mutable.HashMap[String, Long]] {

  require(capacity >= 1 && capacity <= 65536,
    s"capacity in [1, 65536]: $capacity")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < capacity => buf(s) = 1L
        case None => // MG step: charge one to every counter
          // snapshot first — mutating a HashMap (even value-only writes)
          // while foreach-iterating it is contractually undefined
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          buf.toArray.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf(k) = c - 1
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone —
      // the mergeable-summaries reduction that keeps the MG bound
      val kth = a.values.toArray.sorted(Ordering.Long.reverse)(capacity)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      a.toArray.foreach { case (k, c) =>
        if (c - kth <= 0L) dead += k else a(k) = c - kth
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(k), c))
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map(_._1.getBytes("UTF-8"))
    val bb = ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(bytes).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf(new String(kb, "UTF-8")) = bb.getLong()
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("item",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType,
        nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItemsSketch =
    copy(child = newChildren.head)
}

/** KMV (k-minimum-values) distinct-count sketch: the k smallest DISTINCT
  * hash values under UNSIGNED 64-bit order. Unlike [[BottomKSketch]]
  * (which ranks possibly-repeating priorities), KMV's estimator
  * `D̂ = (k−1)/h₍ₖ₎` is only unbiased over a duplicate-free order
  * statistic, so the buffer is a bounded sorted SET — re-offering a hash
  * already held is a no-op, which is precisely what makes
  * `count(DISTINCT x)`'s shuffle avoidable: duplicates collapse inside
  * each map task, partials merge by set union, and at most k longs cross
  * the wire per group. With a deterministic portable hash the whole
  * sketch replays in SQL — q_a13 hash-certifies it, the certification
  * HLL (q_a5) cannot have.
  *
  * Unsigned order rides a sign-bit flip: `h ^ Long.MinValue` maps
  * unsigned order onto signed order, so a plain TreeSet compares
  * correctly; eval unflips and emits the ascending array. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2 && k <= 65536, s"k in [2, 65536]: $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(
      buf: java.util.TreeSet[java.lang.Long], flipped: Long): Unit = {
    if (buf.size < k) { buf.add(flipped); () }
    else if (flipped < buf.last()) {
      if (buf.add(flipped)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue() ^ Long.MinValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}
