package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (z-order) interleaving for
  * write-time clustering.
  *
  * Sorting a table by `zValue2(x, y)` before writing makes BOTH x- and
  * y-range predicates prune files: each output file covers a small square
  * of (x, y) space instead of a thin slice of one dimension, so parquet
  * min/max footer stats (or a catalog's file index) skip files for either
  * predicate. This is the layout step behind "OPTIMIZE ... ZORDER BY"-style
  * maintenance in lakehouse systems, expressed Spark-first: the z-value is
  * pure codegen'd column arithmetic (shift/and/or — no UDF), the clustering
  * is `repartitionByRange` + partition-local sort, and nothing shuffles
  * except the one range exchange the layout itself requires.
  */
object Layout {

  /** Spread the low 16 bits of `c` so one zero bit separates each data bit
    * (Morton "Part1By1", the standard magic-number sequence — public domain
    * bit-twiddling, e.g. Stanford Bit Twiddling Hacks). Pure column
    * arithmetic: stays inside whole-stage codegen. */
  private def part1By1(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton code of the low 16 bits of two non-negative integral
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1. Callers
    * bucket wider domains into 16 bits first (e.g. `pmod(k, 65536)` or a
    * range-rank); 16+16 interleaved bits address 4 billion cells, ample for
    * file-level clustering. */
  def zValue2(x: Column, y: Column): Column =
    part1By1(x).bitwiseOR(shiftleft(part1By1(y), 1))

  /** N-dimensional Morton code, n ∈ [2, 6]: bit j of dimension i lands at
    * position j·n + i. The 63-bit positive-long budget splits evenly —
    * `min(16, 63/n)` bits per dimension (n=3 → 16 bits each over 48;
    * n=4 → 15 each; n=6 → 10 each); callers bucket wider domains down
    * first, exactly as [[zValue2]] documents. Built as a plain bit loop
    * (shift/and/or per bit — n·bits leaf ops), which stays inside
    * whole-stage codegen like the magic-number 2-D form; the loop shape is
    * what generalizes, the 2-D fast path keeps its 10-op spread. */
  def zValueN(dims: Seq[Column]): Column = {
    val n = dims.length
    require(n >= 2 && n <= 6, s"zValueN takes 2..6 dimensions, got $n")
    val bits = math.min(16, 63 / n)
    dims.zipWithIndex.map { case (c, i) =>
      val m = c.bitwiseAND(lit((1L << bits) - 1))
      (0 until bits).map { j =>
        shiftleft(shiftright(m, j).bitwiseAND(lit(1L)), j * n + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** 2-D Hilbert index of the low `bits` bits of two non-negative
    * integral columns — the locality-preserving alternative to
    * [[zValue2]]: consecutive Hilbert values are always adjacent cells
    * (Morton order jumps at power-of-two boundaries), so range-clustered
    * files cover tighter (x, y) rectangles for the same file count.
    *
    * The classic per-bit fold (Wikipedia xy2d): at each scale s the
    * quadrant bits (rx, ry) contribute `s²·((3rx) XOR ry)` and the
    * remaining coordinates rotate — flip = XOR with the all-ones mask,
    * then swap. The rotation makes each stage reference BOTH previous
    * coordinates, so unlike the Morton chain this cannot be one Column
    * tree (the swap doubles subtree references per stage — a 2¹⁶-node
    * expression). It is therefore a DataFrame transform: each stage
    * materializes (x, y, d) via `withColumns`, and every stage's outputs
    * are attribute references — linear plan size, still
    * whole-stage-codegen'd projections.
    *
    * @return `df` with `outCol` = the Hilbert distance (0 ≤ d < 4^bits) */
  def withHilbert2(
      df: DataFrame, xCol: String, yCol: String, outCol: String,
      bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31]: $bits")
    val mask = (1L << bits) - 1
    var cur = df.withColumns(Map(
      "__hx" -> col(xCol).cast("long").bitwiseAND(lit(mask)),
      "__hy" -> col(yCol).cast("long").bitwiseAND(lit(mask)),
      outCol -> lit(0L)))
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      val nd = col(outCol) +
        lit(s) * lit(s) * (rx * lit(3L)).bitwiseXOR(ry)
      val fx = col("__hx").bitwiseXOR(lit(mask))
      val fy = col("__hy").bitwiseXOR(lit(mask))
      val nx = when(ry === 0, when(rx === 1, fy).otherwise(col("__hy")))
        .otherwise(col("__hx"))
      val ny = when(ry === 0, when(rx === 1, fx).otherwise(col("__hx")))
        .otherwise(col("__hy"))
      cur = cur.withColumns(Map("__hx" -> nx, "__hy" -> ny, outCol -> nd))
      s >>= 1
    }
    cur.drop("__hx", "__hy")
  }

  /** 3-D Hilbert index of the low `bits` bits of three non-negative
    * integral columns — [[withHilbert2]] generalized via the Skilling
    * transform (John Skilling, "Programming the Hilbert curve", AIP 2004
    * — the standard public n-D algorithm): an MSB→LSB exchange/invert
    * loop brings the coordinates into "transpose" form, a Gray-style
    * correction (`X[i] ^= X[i-1]`, then the parity mask `t`) undoes the
    * Gray encoding, and the index is the plain bit-interleave of the
    * result. Consecutive indexes are always face-adjacent cells, so
    * range-clustered files cover one connected (x, y, z) region — the
    * locality [[zValueN]]'s 3-D Morton code gives up at power-of-two
    * seams.
    *
    * Same plan discipline as [[withHilbert2]]: the exchange loop's swap
    * makes each stage reference both prior coordinates, so each of the
    * `bits−1` steps materializes its outputs via `withColumns`
    * (attribute references, linear plan size, whole-stage-codegen'd
    * projections); the Gray correction and interleave are single
    * expression trees (the parity mask uses `bit_count` — no loop
    * state). Certified against a DuckDB recursive-CTE replay of the
    * same per-bit loop (q_z4) and a driver-side reference in
    * LayoutSpec.
    *
    * @return `df` with `outCol` = the Hilbert distance (0 ≤ d < 8^bits) */
  def withHilbert3(
      df: DataFrame, xCol: String, yCol: String, zCol: String,
      outCol: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits in [1, 20] (3·bits ≤ 63): $bits")
    withHilbertN(df, Seq(xCol, yCol, zCol), outCol, bits)
  }

  /** N-dimensional Hilbert index, n ∈ [2, 6] — [[withHilbert3]]'s Skilling
    * transform generalized to any dimension count (the 3-D case
    * delegates here). Matches [[zValueN]]'s dimension range, so every
    * Morton layout key has a locality-preserving Hilbert twin.
    *
    * Plan shape: ONE native codegen'd expression
    * ([[graft.functions.HilbertIndex]] — a single static-call Skilling
    * loop per row inside whole-stage codegen), not a projection chain.
    * The Column-fold formulation of the same algorithm is retained as
    * [[withHilbertNFold]] purely as an independent differential twin;
    * NorthStarSpec pins the two bit-equal. n·bits ≤ 63 keeps the index a
    * positive long.
    *
    * NOTE the n=2 instance is Skilling's orientation of the curve, which
    * differs from [[withHilbert2]]'s classic quadrant-fold orientation —
    * both are true Hilbert curves (bijective, unit-step), they just label
    * cells in a different rotation order. Keep whichever one a layout was
    * written with.
    *
    * @return `df` with `outCol` = the Hilbert distance (0 ≤ d < 2^(n·bits)) */
  def withHilbertN(
      df: DataFrame, cols: Seq[String], outCol: String,
      bits: Int = 16): DataFrame = {
    val n = cols.length
    require(n >= 2 && n <= 6, s"withHilbertN takes 2..6 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"bits in [1, ${63 / n}] (n·bits ≤ 63): $bits")
    df.withColumn(outCol, graft.functions.GraftFunctions.hilbertIndex(
      bits, cols.map(c => col(c).cast("long"))))
  }

  /** The `withColumns`-fold formulation of [[withHilbertN]] — the per-bit
    * exchange/invert loop materialized as `(bits−1)·n` projection stages.
    * Kept (test-only) as an independent path for differential
    * certification of the native expression; both are certified against
    * DuckDB recursive-CTE replays (q_z4/q_z5) and the driver-side
    * bit-loop reference. */
  private[graft] def withHilbertNFold(
      df: DataFrame, cols: Seq[String], outCol: String,
      bits: Int = 16): DataFrame = {
    val n = cols.length
    require(n >= 2 && n <= 6, s"withHilbertN takes 2..6 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"bits in [1, ${63 / n}] (n·bits ≤ 63): $bits")
    val mask = (1L << bits) - 1
    var cur = df.withColumns(cols.zipWithIndex.map { case (c, i) =>
      s"__h$i" -> col(c).cast("long").bitwiseAND(lit(mask))
    }.toMap)
    val temps = scala.collection.mutable.LinkedHashSet.empty[String]
    (0 until n).foreach(i => temps += s"__h$i")
    var s = bits - 1
    while (s >= 1) {
      val q = 1L << s
      val p = q - 1
      // dimension 0: the else-branch exchange is X0^X0 = 0 — a no-op
      cur = cur.withColumn("__a0",
        when(col("__h0").bitwiseAND(lit(q)) > 0,
          col("__h0").bitwiseXOR(lit(p))).otherwise(col("__h0")))
      temps += "__a0"
      // dimensions 1..n−1: invert X0's low bits, or exchange them with
      // X[i]'s; X0 threads through as the running accumulator
      var acc = "__a0"
      var i = 1
      while (i < n) {
        val t = col(acc).bitwiseXOR(col(s"__h$i")).bitwiseAND(lit(p))
        cur = cur.withColumns(Map(
          s"__e${i}0" -> when(col(s"__h$i").bitwiseAND(lit(q)) > 0,
            col(acc).bitwiseXOR(lit(p)))
            .otherwise(col(acc).bitwiseXOR(t)),
          s"__e${i}i" -> when(col(s"__h$i").bitwiseAND(lit(q)) > 0,
            col(s"__h$i"))
            .otherwise(col(s"__h$i").bitwiseXOR(t))))
        temps += s"__e${i}0"; temps += s"__e${i}i"
        acc = s"__e${i}0"
        i += 1
      }
      // commit this bit level's outputs back into __h*
      cur = cur.withColumns(
        (Map("__h0" -> col(acc)) ++
          (1 until n).map(i => s"__h$i" -> col(s"__e${i}i"))).toMap)
      s -= 1
    }
    // Gray correction: X[i] ^= X[i-1] in order, then the parity mask —
    // bit k of t is the parity of g_{n−1}'s bits above k (the closed form
    // of Skilling's "t ^= Q−1 for each set bit" fold; bits never overlap,
    // so OR assembles it)
    var prev = "__h0"
    var gi = 1
    while (gi < n) {
      cur = cur.withColumn(s"__g$gi", col(s"__h$gi").bitwiseXOR(col(prev)))
      temps += s"__g$gi"
      prev = s"__g$gi"
      gi += 1
    }
    val gLast = prev
    val t =
      if (bits == 1) lit(0L)
      else (0 until bits - 1).map { k =>
        shiftleft(
          bit_count(shiftright(col(gLast), k + 1)).cast("long")
            .bitwiseAND(lit(1L)), k)
      }.reduce(_ bitwiseOR _)
    cur = cur.withColumns((0 until n).map { i =>
      val g = if (i == 0) col("__h0") else col(s"__g$i")
      s"__f$i" -> g.bitwiseXOR(t)
    }.toMap)
    (0 until n).foreach(i => temps += s"__f$i")
    // transpose → index: bit j of dimension i lands at j·n + (n−1−i)
    val d = (0 until bits).flatMap { j =>
      (0 until n).map { i =>
        shiftleft(shiftright(col(s"__f$i"), j).bitwiseAND(lit(1L)),
          j * n + (n - 1 - i))
      }
    }.reduce(_ bitwiseOR _)
    cur.withColumn(outCol, d).drop(temps.toSeq: _*)
  }

  /** [[hilbertOrderBy]] in three dimensions: cluster by the 3-D Hilbert
    * distance of (`xCol`, `yCol`, `zCol`) — the layout key for a lake
    * predicated on three correlated dimensions at once (e.g. user,
    * entity, time-bucket). */
  def hilbertOrderBy3(
      df: DataFrame, xCol: String, yCol: String, zCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame =
    hilbertOrderByN(df, Seq(xCol, yCol, zCol), numPartitions, bits)

  /** Cluster `df` for writing by the N-dimensional Hilbert distance
    * ([[withHilbertN]], n ∈ [2, 6]): range-partition on the key, sort
    * within partitions, drop the key — each output task then writes one
    * contiguous Hilbert segment, i.e. one connected region of the
    * n-dimensional space. The clustered-write form of every supported
    * dimension count (2-D keeps its classic-orientation twin in
    * [[hilbertOrderBy]]). */
  def hilbertOrderByN(
      df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 16): DataFrame = {
    require(numPartitions > 0, s"bad partition count: $numPartitions")
    withHilbertN(df, cols, "__h", bits)
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** Cluster `df` for writing: range-partition by the 2-D z-value of
    * (`xCol`, `yCol`), sort within partitions. Each output task then writes
    * one file covering a compact z-range = a small (x, y) square.
    * `numPartitions` is explicit so AQE cannot coalesce the layout away. */
  def zOrderBy(
      df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int): DataFrame = {
    require(numPartitions > 0, s"bad partition count: $numPartitions")
    val z = zValue2(col(xCol), col(yCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Cluster `df` for writing by Hilbert distance — [[zOrderBy]] with the
    * locality-preserving curve: each output task's value range is a
    * contiguous Hilbert segment, whose cells form one connected region
    * (Morton segments split across power-of-two seams). Same explicit
    * `numPartitions` so AQE cannot coalesce the layout away. */
  def hilbertOrderBy(
      df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions > 0, s"bad partition count: $numPartitions")
    withHilbert2(df, xCol, yCol, "__h", bits)
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** Small-file compaction — the other half of lakehouse maintenance next
    * to [[zOrderBy]]: streaming ingest and fine-grained partitioning leave
    * directories of kilobyte files whose per-file open/footer cost
    * dominates scans at scale. Rewrite the directory into EXACTLY
    * ⌈rows / targetRecordsPerFile⌉ files: one count job sizes the output,
    * round-robin `repartition` distributes near-evenly (per-file records
    * can exceed the target only by the input-split count — round-robin's
    * bounded imbalance — which is why there is deliberately NO
    * `maxRecordsPerFile` cap: the cap re-splits any partition a few rows
    * over target and breaks the file-count contract). Returns the file
    * count written. Values survive byte-for-byte (q_s12 certifies the
    * rewrite against the pre-compaction aggregate). */
  def compact(
      spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetRecordsPerFile: Long): Long = {
    require(targetRecordsPerFile > 0,
      s"bad target records/file: $targetRecordsPerFile")
    // mode("overwrite") DELETES outDir before the lazily-planned read of
    // inDir runs — same or nested paths would destroy the input mid-job
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String): String = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(conf).makeQualified(p).toUri.toString.stripSuffix("/")
    }
    val inQ = qualified(inDir)
    val outQ = qualified(outDir)
    require(inQ != outQ && !outQ.startsWith(inQ + "/")
        && !inQ.startsWith(outQ + "/"),
      s"compact would overwrite its own input: in=$inQ out=$outQ")
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    val nFilesL = math.max(1L,
      (rows + targetRecordsPerFile - 1) / targetRecordsPerFile)
    require(nFilesL <= Int.MaxValue,
      s"computed file count $nFilesL exceeds Int range — raise " +
        s"targetRecordsPerFile")
    val nFiles = nFilesL.toInt
    df.repartition(nFiles)
      .write.mode("overwrite")
      .parquet(outDir)
    // count via the Hadoop FileSystem API: outDir is a lake path
    // (hdfs://, s3a://, …) at the scale this operator exists for —
    // java.io.File would NPE on anything but the local disk
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path)
      .count(s => s.getPath.getName.endsWith(".parquet")).toLong
  }
}
