package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistence primitives for the prebuilt ANN indexes
  * ([[Similarity.LshIndex]]/[[Similarity.IvfIndex]]/[[Similarity.PqIndex]]/
  * [[Similarity.IvfPqIndex]]) and the streaming near-dup base index.
  *
  * Layout: one directory per index —
  * {{{
  * dir/
  *   _graft_index.json   tiny sidecar: kind + integer params (version, dim…)
  *   corpus/             the distributed frames, plain parquet
  *   buckets|lists|codes/
  *   centroids/          model arrays as (i, j?, v) parquet rows — doubles
  *   codebooks/          round-trip bit-exactly (no decimal formatting)
  * }}}
  *
  * The distributed frames are written as ordinary parquet (at 100 TB these
  * are object-store writes sized by the frame's own partitioning — no
  * coalesce); the model artifacts (IVF centroids ≤ 64×dim doubles, PQ
  * codebooks ≤ 8×256×sub) are driver-side arrays persisted as tiny parquet
  * tables so the doubles survive save→load bit-for-bit. All paths go
  * through Hadoop's FileSystem API, so `dir` may be local, HDFS, or s3a://.
  *
  * Load rebuilds an index whose query results are BIT-IDENTICAL to the
  * in-session original: every top-k path breaks ties deterministically
  * (sim desc then id), so parquet's row-order shuffle cannot change output.
  */
object IndexIO {

  /** Bump when the on-disk layout changes incompatibly. */
  val Version = 1

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Write the JSON sidecar (kind tag + integer params only — doubles
    * never travel through text). */
  private[graft] def writeMeta(
      spark: SparkSession, dir: String, kind: String,
      params: Map[String, Long]): Unit = {
    val (hfs, base) = fs(spark, dir)
    val fields = (Map("version" -> Version.toLong) ++ params)
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
    val json = s"""{"kind":"$kind",${fields.mkString(",")}}"""
    val out = hfs.create(
      new org.apache.hadoop.fs.Path(base, "_graft_index.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read + validate the sidecar; returns the integer params. */
  private[graft] def readMeta(
      spark: SparkSession, dir: String, expectKind: String)
      : Map[String, Long] = {
    val (hfs, base) = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(base, "_graft_index.json")
    require(hfs.exists(p), s"not a graft index dir (no _graft_index.json): $dir")
    val in = hfs.open(p)
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val kind = """"kind":"([a-z0-9_]+)"""".r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(s"no kind in $p: $json"))
    require(kind == expectKind,
      s"index at $dir is kind '$kind', expected '$expectKind'")
    val params = """"([a-z_]+)":(-?\d+)""".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    val v = params.getOrElse("version", -1L)
    require(v == Version, s"index version $v at $dir; this build reads $Version")
    params
  }

  private val matrixSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Persist a driver-side double matrix (row index, row) as parquet. */
  private[graft] def saveMatrix(
      spark: SparkSession, dir: String, m: Array[Array[Double]]): Unit = {
    val rows = m.zipWithIndex.map { case (r, i) => Row(i, r.toSeq) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), matrixSchema)
      .write.mode("overwrite").parquet(dir)
  }

  private[graft] def loadMatrix(
      spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(dir).collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)

  private val tensorSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Persist a driver-side rank-3 double tensor (PQ codebooks:
    * subspace, code, codeword) as parquet. */
  private[graft] def saveTensor(
      spark: SparkSession, dir: String,
      t: Array[Array[Array[Double]]]): Unit = {
    val rows = for {
      (mat, i) <- t.zipWithIndex
      (r, j) <- mat.zipWithIndex
    } yield Row(i, j, r.toSeq)
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), tensorSchema)
      .write.mode("overwrite").parquet(dir)
  }

  private[graft] def loadTensor(
      spark: SparkSession, dir: String): Array[Array[Array[Double]]] =
    spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3) }

  private val longPairSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** Persist parallel (key, value) long arrays — 64-bit hash keys MUST
    * NOT transit doubles (2^53 mantissa), hence a dedicated long table. */
  private[graft] def saveLongPairs(
      spark: SparkSession, dir: String,
      ks: Array[Long], vs: Array[Long]): Unit = {
    require(ks.length == vs.length, s"${ks.length} keys, ${vs.length} values")
    val rows = ks.indices.map(i => Row(ks(i), vs(i)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), longPairSchema)
      .write.mode("overwrite").parquet(dir)
  }

  /** Reload [[saveLongPairs]] output, re-sorted by key (the consumers
    * binary-search). */
  private[graft] def loadLongPairs(
      spark: SparkSession, dir: String): (Array[Long], Array[Long]) = {
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** Guard for batchId-idempotent foreachBatch sinks: idempotence is
    * scoped to ONE checkpoint lineage, so an output directory that
    * already holds `batch=NNNNNN` partitions combined with a BRAND-NEW
    * checkpoint means Spark will reassign batch ids from 0 and silently
    * OVERWRITE prior results. Refuse that combination up front; resuming
    * with the original checkpoint (it exists) or starting against a
    * fresh output directory both pass. */
  private[graft] def requireSameLineage(
      spark: SparkSession, batchOutDir: String, checkpoint: String,
      what: String): Unit = {
    val (ofs, op) = fs(spark, batchOutDir)
    val hasBatches = ofs.exists(op) && ofs.listStatus(op).exists(st =>
      st.isDirectory && st.getPath.getName.matches("batch=\\d+"))
    // a USED checkpoint carries an offsets/ directory; an empty or
    // missing one means Spark will start a new lineage at batch 0
    val (cfs, cp) = fs(spark, checkpoint)
    val used = cfs.exists(
      new org.apache.hadoop.fs.Path(cp, "offsets"))
    require(!hasBatches || used,
      s"$batchOutDir already holds $what from a previous run, but " +
        s"$checkpoint is not that run's checkpoint: a new checkpoint " +
        "lineage restarts batch ids at 0 and would overwrite them. " +
        "Resume with the original checkpoint, or use a fresh output " +
        "directory.")
  }

  private[graft] def saveFrame(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  private[graft] def loadFrame(
      spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
