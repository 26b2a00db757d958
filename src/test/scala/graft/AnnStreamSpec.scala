package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.Streams

/** The streaming ANN screen: per-micro-batch results equal the batch
  * distributed join on the same rows, and a replayed batch id rewrites
  * its own partition directory instead of duplicating results. */
class AnnStreamSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val K = 5

  test("stream batches equal the batch join; replay is idempotent") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val idx = Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding")
    // external queries: corpus vectors under shifted ids, two chunks
    val queries = emb.select(
      (col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val chunks = queries.grouped((queries.length + 1) / 2).toSeq
    assert(chunks.length == 2)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_ann_stream_out").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ann_stream_ckpt").toString
    val ms = StreamTestSupport.memoryStream[(Long, Array[Float])]
    val q = Streams.annScreenSink(
      idx, ms.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", K, outDir, ckpt)
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.read.parquet(outDir)
    // the `batch` partition column carries provenance
    assert(got.select("batch").distinct().count() == 2)
    // per-batch equality with the batch join on exactly that chunk
    chunks.zipWithIndex.foreach { case (c, bi) =>
      val want = Similarity.ivfPqTopKJoin(
          idx, c.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding", K)
        .collect().map(_.toString).toSet
      val have = got.filter(col("batch") === bi)
        .drop("batch").collect().map(_.toString).toSet
      assert(have == want, s"batch $bi diverged from the batch join")
    }
    assert(got.count() == queries.length * K)
    // exactly-once: re-running a batch id rewrites, never duplicates
    Streams.annScreenBatch(
      idx, chunks.head.toSeq.toDF("vec_id", "embedding"),
      "vec_id", "embedding", K, outDir, batchId = 0L)
    assert(spark.read.parquet(outDir).count() == queries.length * K,
      "replaying batch 0 must not append duplicates")
  }

  test("streaming index-append sink: loads see streamed rows exactly-once") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ann_append_idx").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ann_append_ckpt").toString
    val built = Similarity.ivfPqIndexBuild(half, "vec_id", "embedding")
    Similarity.ivfPqIndexSave(built, dir)
    // stream the other half in two micro-batches
    val rows = rest.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val chunks = rows.grouped((rows.length + 1) / 2).toSeq
    val ms = StreamTestSupport.memoryStream[(Long, Array[Float])]
    val q = Similarity.ivfPqAppendSink(
      spark, dir, ms.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", ckpt)
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // a fresh load sees base + streamed appends, equal to the in-session
    // append on every query path
    val loaded = Similarity.ivfPqIndexLoad(spark, dir)
    assert(loaded.corpus.count() == emb.count())
    val want = Similarity.ivfPqTopK(
        Similarity.ivfPqIndexAppend(built, rest, "vec_id", "embedding"),
        col("vec_id") % 37 === 0, K)
      .collect().map(_.toString).toSet
    val have = Similarity.ivfPqTopK(loaded, col("vec_id") % 37 === 0, K)
      .collect().map(_.toString).toSet
    assert(have == want, "loaded appends diverged from in-session append")
    // manual appends live in their own `manual=` namespace: a batch
    // caller reusing id 0 lands NEW rows instead of silently
    // overwriting the stream's checkpoint-assigned batch 0 ...
    val extra = chunks.head.map { case (id, v) => (id + 200000L, v) }
    Similarity.ivfPqIndexAppendSave(
      spark, dir, extra.toSeq.toDF("vec_id", "embedding"),
      "vec_id", "embedding", batchId = 0L)
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count() + extra.length,
      "manual id 0 must not clobber the streamed batch 0")
    // ... and replaying the SAME manual id rewrites, never duplicates
    Similarity.ivfPqIndexAppendSave(
      spark, dir, extra.toSeq.toDF("vec_id", "embedding"),
      "vec_id", "embedding", batchId = 0L)
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count() + extra.length,
      "replaying manual append 0 must not duplicate rows")
  }

  test("generic indexAppendSink: every family streams appends in, loads equal in-session") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val pred = col("vec_id") % 37 === 0
    val qs = Similarity.normed(emb.filter(pred), "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // (family, build+save, top-k of a fresh load, top-k of the
    // in-session build(half)+append(rest) reference)
    final case class Fam(tag: String,
        save: String => Unit,
        loadTopK: String => Set[String],
        wantTopK: () => Set[String])
    val fams = Seq(
      Fam("lsh",
        d => Similarity.lshIndexSave(
          Similarity.lshIndexBuild(half, "vec_id", "embedding", dim = 64), d),
        d => rows(Similarity.lshTopK(
          Similarity.lshIndexLoad(spark, d), pred, K)),
        () => rows(Similarity.lshTopK(Similarity.lshIndexAppend(
          Similarity.lshIndexBuild(half, "vec_id", "embedding", dim = 64),
          rest, "vec_id", "embedding"), pred, K))),
      Fam("ivf",
        d => Similarity.ivfIndexSave(
          Similarity.ivfIndexBuild(half, "vec_id", "embedding"), d),
        d => rows(Similarity.ivfTopK(
          Similarity.ivfIndexLoad(spark, d), pred, K)),
        () => rows(Similarity.ivfTopK(Similarity.ivfIndexAppend(
          Similarity.ivfIndexBuild(half, "vec_id", "embedding"),
          rest, "vec_id", "embedding"), pred, K))),
      Fam("pq",
        d => Similarity.pqIndexSave(
          Similarity.pqIndexBuild(half, "vec_id", "embedding"), d),
        d => rows(Similarity.pqTopK(
          Similarity.pqIndexLoad(spark, d), pred, K)),
        () => rows(Similarity.pqTopK(Similarity.pqIndexAppend(
          Similarity.pqIndexBuild(half, "vec_id", "embedding"),
          rest, "vec_id", "embedding"), pred, K))),
      Fam("sq8",
        d => Similarity.sq8IndexSave(
          Similarity.sq8IndexBuild(half, "vec_id", "embedding"), d),
        d => rows(Similarity.sq8TopK(
          Similarity.sq8IndexLoad(spark, d), qs, K)),
        () => rows(Similarity.sq8TopK(Similarity.sq8IndexAppend(
          Similarity.sq8IndexBuild(half, "vec_id", "embedding"),
          rest, "vec_id", "embedding"), qs, K))),
      Fam("ivfpq",
        d => Similarity.ivfPqIndexSave(
          Similarity.ivfPqIndexBuild(half, "vec_id", "embedding"), d),
        d => rows(Similarity.ivfPqTopK(
          Similarity.ivfPqIndexLoad(spark, d), pred, K)),
        () => rows(Similarity.ivfPqTopK(Similarity.ivfPqIndexAppend(
          Similarity.ivfPqIndexBuild(half, "vec_id", "embedding"),
          rest, "vec_id", "embedding"), pred, K))),
      Fam("ivfsq8",
        d => Similarity.ivfSq8IndexSave(
          Similarity.ivfSq8IndexBuild(half, "vec_id", "embedding"), d),
        d => rows(Similarity.ivfSq8TopK(
          Similarity.ivfSq8IndexLoad(spark, d), pred, K)),
        () => rows(Similarity.ivfSq8TopK(Similarity.ivfSq8IndexAppend(
          Similarity.ivfSq8IndexBuild(half, "vec_id", "embedding"),
          rest, "vec_id", "embedding"), pred, K))))
    val chunks = rest.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .grouped((rest.count().toInt + 1) / 2).toSeq
    fams.foreach { f =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_sink_${f.tag}").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_sink_ck_${f.tag}").toString
      f.save(dir)
      val ms = StreamTestSupport.memoryStream[(Long, Array[Float])]
      val q = Similarity.indexAppendSink(
        spark, dir, ms.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", ckpt)
      try {
        chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
      } finally q.stop()
      assert(f.loadTopK(dir) == f.wantTopK(),
        s"${f.tag}: streamed appends diverged from the in-session append")
    }
  }

  test("lineage guard: fresh checkpoint against existing batches refuses") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val idx = Similarity.ivfPqIndexBuild(
      emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_ann_guard_out").toString
    // land one batch directly (simulating a prior run's output)
    Streams.annScreenBatch(
      idx, emb.filter(col("vec_id") % 101 === 3)
        .select("vec_id", "embedding"),
      "vec_id", "embedding", K, outDir, batchId = 0L)
    // a NEW (unused) checkpoint would restart batch ids at 0 and
    // overwrite the landed partitions - the sink must refuse
    val freshCkpt = java.nio.file.Files
      .createTempDirectory("graft_ann_guard_ckpt").toString
    val ms = StreamTestSupport.memoryStream[(Long, Array[Float])]
    val e = intercept[IllegalArgumentException] {
      Streams.annScreenSink(
        idx, ms.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", K, outDir, freshCkpt)
    }
    assert(e.getMessage.contains("checkpoint"))
  }

  test("index save clears stale appends; fold is the safe maintenance") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ann_fold_idx").toString
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(half, "vec_id", "embedding"), dir)
    Similarity.ivfPqIndexAppendSave(
      spark, dir, rest, "vec_id", "embedding", batchId = 0L)
    val before = Similarity.ivfPqTopK(
        Similarity.ivfPqIndexLoad(spark, dir), col("vec_id") % 37 === 0, K)
      .collect().map(_.toString).toSet
    // fold: appends merge into the base without retraining, and the
    // appends directory is pruned - identical answers from a fresh load
    Similarity.ivfPqIndexFold(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/appends")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(p), "fold must prune the appends directory")
    val folded = Similarity.ivfPqIndexLoad(spark, dir)
    assert(folded.corpus.count() == emb.count())
    assert(Similarity.ivfPqTopK(folded, col("vec_id") % 37 === 0, K)
      .collect().map(_.toString).toSet == before)
    // a REBUILD saved into the same dir must also leave no stale appends
    Similarity.ivfPqIndexAppendSave(
      spark, dir, rest, "vec_id", "embedding", batchId = 1L)
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding"), dir)
    assert(!hfs.exists(p), "save must clear appends (stale quantizers)")
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count())
  }

  test("fold is crash-atomic: neither crash window doubles or loses rows") {
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ann_crashfold_idx").toString
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(half, "vec_id", "embedding"), dir)
    Similarity.ivfPqIndexAppendSave(
      spark, dir, rest, "vec_id", "embedding", batchId = 0L)
    val appends = new org.apache.hadoop.fs.Path(s"$dir/appends")
    val hfs = appends.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // window B: crash AFTER the aside rename, BEFORE the sidecar commit.
    // Rows are temporarily invisible (never doubled); recovery restores.
    require(hfs.rename(appends,
      new org.apache.hadoop.fs.Path(s"$dir/appends_folding_e1")))
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == half.count(), "uncommitted fold must not double anything")
    Similarity.foldRecover(spark, dir)
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count(), "recovery must restore the un-folded appends")

    // real fold commits at epoch 1
    Similarity.ivfPqIndexFold(spark, dir)
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count())

    // window A: crash AFTER the sidecar commit, BEFORE the aside delete.
    // Manufacture the leftover aside (same epoch as committed) holding a
    // duplicate batch — loads ignore it and recovery deletes it.
    val aside = new org.apache.hadoop.fs.Path(s"$dir/appends_folding_e1")
    rest.write.mode("overwrite").parquet(s"$aside/corpus/manual=000000")
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count(), "committed-fold leftovers must not double rows")
    Similarity.foldRecover(spark, dir)
    assert(!hfs.exists(aside), "recovery must delete committed leftovers")

    // an aside whose epoch was never committed gets restored by the NEXT
    // fold (foldRecover runs first), then folded in
    Similarity.ivfPqIndexAppendSave(
      spark, dir,
      emb.limit(5).select((col("vec_id") + 500000L).as("vec_id"),
        col("embedding")),
      "vec_id", "embedding", batchId = 7L)
    require(hfs.rename(appends,
      new org.apache.hadoop.fs.Path(s"$dir/appends_folding_e2")))
    Similarity.ivfPqIndexFold(spark, dir)
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count() + 5,
      "next fold must restore and fold an uncommitted aside")
    // a REBUILD prunes aside remnants (stale quantizers must not return)
    rest.write.mode("overwrite").parquet(
      s"$dir/appends_folding_e99/corpus/manual=000000")
    rest.write.mode("overwrite").parquet(s"$dir/corpus_old_e99")
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding"), dir)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/appends_folding_e99")),
      "rebuild must delete crashed-fold remnants")
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/corpus_old_e99")),
      "rebuild must delete parked-base remnants (would be 'rolled back' " +
        "over the rebuild once the fold epoch resets)")
  }

  test("fold swap windows roll back; concurrent appends survive a crash") {
    val emb = Tables.embeddings(spark, GraftSpark.sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ann_swapfold_idx").toString
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(half, "vec_id", "embedding"), dir)
    Similarity.ivfPqIndexAppendSave(
      spark, dir, rest, "vec_id", "embedding", batchId = 0L)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    // window C: crash AFTER the folding dirs are written, BEFORE the
    // swap — base untouched, scratch discarded, aside restored.
    require(hfs.rename(p("appends"), p("appends_folding_e1")))
    val idx1 = Similarity.ivfPqIndexLoad(spark, dir)
    idx1.corpus.write.parquet(s"$dir/corpus_folding_e1")
    idx1.codedLists.write.parquet(s"$dir/coded_lists_folding_e1")
    Similarity.foldRecover(spark, dir)
    assert(!hfs.exists(p("corpus_folding_e1")) &&
      !hfs.exists(p("coded_lists_folding_e1")),
      "pre-swap recovery must discard the folding scratch")
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count(), "pre-swap recovery must restore the aside appends")

    // window D: crash MID-SWAP — corpus published, coded_lists not.
    // Recovery restores the parked corpus so the pair stays consistent.
    require(hfs.rename(p("appends"), p("appends_folding_e1")))
    val idx2 = Similarity.ivfPqIndexLoad(spark, dir)
    idx2.corpus.write.parquet(s"$dir/corpus_folding_e1")
    idx2.codedLists.write.parquet(s"$dir/coded_lists_folding_e1")
    require(hfs.rename(p("corpus"), p("corpus_old_e1")))
    require(hfs.rename(p("corpus_folding_e1"), p("corpus")))
    // a live append sink keeps landing batches into the fresh appends/
    // while the fold is crashed — recovery must MERGE, not delete
    val extra = emb.limit(7).select(
      (col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    Similarity.ivfPqIndexAppendSave(
      spark, dir, extra, "vec_id", "embedding", batchId = 55L)
    Similarity.foldRecover(spark, dir)
    assert(!hfs.exists(p("corpus_old_e1")) &&
      !hfs.exists(p("coded_lists_folding_e1")),
      "mid-swap recovery must restore the parked base and drop scratch")
    val recovered = Similarity.ivfPqIndexLoad(spark, dir)
    assert(recovered.corpus.count() == emb.count() + 7,
      "rows from the crashed fold AND the concurrent append must survive")
    // and the settled index folds cleanly afterwards
    Similarity.ivfPqIndexFold(spark, dir)
    assert(Similarity.ivfPqIndexLoad(spark, dir).corpus.count()
      == emb.count() + 7)
    assert(!hfs.exists(p("appends")) && !hfs.exists(p("corpus_old_e1")),
      "a committed fold leaves no appends or remnants behind")
  }
}
