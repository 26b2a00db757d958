package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.Streams

/** save(dir)/load(dir) round-trips for every prebuilt index: a loaded
  * index must answer queries BIT-IDENTICALLY to the in-session build —
  * frames round-trip through parquet, model arrays (centroids/codebooks)
  * through [[graft.operators.IndexIO]]'s binary-exact tables, and all
  * top-k tie-breaks are deterministic, so nothing may drift. */
class AnnPersistenceSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.sf
  private val K = 5
  private def pred = col("vec_id") % 37 === 0
  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_idx_$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("LSH index: build → save → load → query is bit-identical") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.lshIndexBuild(emb, "vec_id", "embedding", dim = 64)
    val built = rows(Similarity.lshTopK(idx, pred, K))
    val dir = tmp("lsh")
    Similarity.lshIndexSave(idx, dir)
    val loaded = Similarity.lshIndexLoad(spark, dir)
    assert(loaded.dim == 64)
    assert(rows(Similarity.lshTopK(loaded, pred, K)) == built)
    // external-query overload works against the loaded index too
    val q = emb.filter(col("vec_id") % 41 === 0)
    assert(rows(Similarity.lshTopK(loaded, q, "vec_id", "embedding", K)) ==
      rows(Similarity.lshTopK(idx, q, "vec_id", "embedding", K)))
  }

  test("IVF index: build → save → load → query is bit-identical") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.ivfIndexBuild(emb, "vec_id", "embedding")
    val built = rows(Similarity.ivfTopK(idx, pred, K))
    val dir = tmp("ivf")
    Similarity.ivfIndexSave(idx, dir)
    val loaded = Similarity.ivfIndexLoad(spark, dir)
    // the model artifact itself must round-trip bit-exactly
    assert(loaded.centroids.length == idx.centroids.length)
    assert(loaded.centroids.zip(idx.centroids).forall {
      case (a, b) => java.util.Arrays.equals(a, b)
    }, "centroid doubles drifted through save/load")
    assert(rows(Similarity.ivfTopK(loaded, pred, K)) == built)
  }

  test("PQ index: build → save → load → query is bit-identical") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.pqIndexBuild(emb, "vec_id", "embedding")
    val built = rows(Similarity.pqTopK(idx, pred, K))
    val dir = tmp("pq")
    Similarity.pqIndexSave(idx, dir)
    val loaded = Similarity.pqIndexLoad(spark, dir)
    assert(loaded.codebooks.length == idx.codebooks.length)
    assert(loaded.codebooks.zip(idx.codebooks).forall { case (ma, mb) =>
      ma.zip(mb).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    }, "codebook doubles drifted through save/load")
    assert(rows(Similarity.pqTopK(loaded, pred, K)) == built)
  }

  test("IVF-PQ index: save → load → query identical; append composes") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val idx = Similarity.ivfPqIndexBuild(half, "vec_id", "embedding")
    val dir = tmp("ivfpq")
    Similarity.ivfPqIndexSave(idx, dir)
    val loaded = Similarity.ivfPqIndexLoad(spark, dir)
    assert(rows(Similarity.ivfPqTopK(loaded, pred, K)) ==
      rows(Similarity.ivfPqTopK(idx, pred, K)))
    // append-hourly on a LOADED index: frozen quantizers encode new rows
    val grown = Similarity.ivfPqIndexAppend(loaded, rest, "vec_id", "embedding")
    val grownB = Similarity.ivfPqIndexAppend(idx, rest, "vec_id", "embedding")
    assert(rows(Similarity.ivfPqTopK(grown, pred, K)) ==
      rows(Similarity.ivfPqTopK(grownB, pred, K)))
  }

  /** Appended vectors must be RETRIEVABLE: an external query equal to an
    * appended corpus vector must surface that vector in its top-k (exact
    * re-rank puts the cosine-1 self match at the top of the shortlist). */
  private def assertAppendedRetrievable(
      topk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      appended: org.apache.spark.sql.DataFrame): Unit = {
    val probes = appended.filter(col("vec_id") % 101 === 3)
    val hits = topk(probes)
      .filter(col("query_id") === col("cand_id"))
      .select(col("query_id")).collect().map(_.getLong(0)).toSet
    val want = probes.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty, "fixture slice is empty")
    assert(hits == want,
      s"appended vectors not retrievable: missing ${want -- hits}")
  }

  test("LSH index: append on a LOADED index composes and retrieves") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val idx = Similarity.lshIndexBuild(half, "vec_id", "embedding", dim = 64)
    val dir = tmp("lsh_app")
    Similarity.lshIndexSave(idx, dir)
    val loaded = Similarity.lshIndexLoad(spark, dir)
    val grown = Similarity.lshIndexAppend(loaded, rest, "vec_id", "embedding")
    val grownB = Similarity.lshIndexAppend(idx, rest, "vec_id", "embedding")
    assert(rows(Similarity.lshTopK(grown, pred, K)) ==
      rows(Similarity.lshTopK(grownB, pred, K)))
    assertAppendedRetrievable(
      q => Similarity.lshTopK(grown, q, "vec_id", "embedding", K), rest)
  }

  test("IVF index: append on a LOADED index composes and retrieves") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val idx = Similarity.ivfIndexBuild(half, "vec_id", "embedding")
    val dir = tmp("ivf_app")
    Similarity.ivfIndexSave(idx, dir)
    val loaded = Similarity.ivfIndexLoad(spark, dir)
    val grown = Similarity.ivfIndexAppend(loaded, rest, "vec_id", "embedding")
    val grownB = Similarity.ivfIndexAppend(idx, rest, "vec_id", "embedding")
    assert(rows(Similarity.ivfTopK(grown, pred, K)) ==
      rows(Similarity.ivfTopK(grownB, pred, K)))
    assertAppendedRetrievable(
      q => Similarity.ivfTopK(grown, q, "vec_id", "embedding", K), rest)
  }

  test("PQ index: append on a LOADED index composes and retrieves") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val idx = Similarity.pqIndexBuild(half, "vec_id", "embedding")
    val dir = tmp("pq_app")
    Similarity.pqIndexSave(idx, dir)
    val loaded = Similarity.pqIndexLoad(spark, dir)
    val grown = Similarity.pqIndexAppend(loaded, rest, "vec_id", "embedding")
    val grownB = Similarity.pqIndexAppend(idx, rest, "vec_id", "embedding")
    assert(rows(Similarity.pqTopK(grown, pred, K, Similarity.PqRerank)) ==
      rows(Similarity.pqTopK(grownB, pred, K, Similarity.PqRerank)))
    assertAppendedRetrievable(
      q => Similarity.pqTopK(grown, q, "vec_id", "embedding", K,
        Similarity.PqRerank), rest)
  }

  test("SQ8 index: save → load → query identical; on-disk append composes") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val qs = Similarity.normed(emb.filter(pred), "vec_id", "embedding")
    val idx = Similarity.sq8IndexBuild(half, "vec_id", "embedding")
    val built = rows(Similarity.sq8TopK(idx, qs, K))
    val dir = tmp("sq8")
    Similarity.sq8IndexSave(idx, dir)
    val loaded = Similarity.sq8IndexLoad(spark, dir)
    assert(loaded.quantizer.mins.toSeq == idx.quantizer.mins.toSeq
      && loaded.quantizer.spans.toSeq == idx.quantizer.spans.toSeq,
      "quantizer bounds must round-trip double-exact")
    assert(rows(Similarity.sq8TopK(loaded, qs, K)) == built)
    // on-disk append under the frozen bounds, then reload: identical to
    // the in-memory append of the same rows
    Similarity.sq8IndexAppendSave(spark, dir, rest,
      "vec_id", "embedding", batchId = 1L)
    Similarity.sq8IndexAppendSave(spark, dir, rest,
      "vec_id", "embedding", batchId = 1L) // replay: idempotent per batch
    val reloaded = Similarity.sq8IndexLoad(spark, dir)
    val grown = Similarity.sq8IndexAppend(idx, rest, "vec_id", "embedding")
    assert(rows(Similarity.sq8TopK(reloaded, qs, K)) ==
      rows(Similarity.sq8TopK(grown, qs, K)))
    // appended vectors are retrievable: an appended row queries itself
    val self = Similarity.normed(
      rest.filter(col("vec_id") % 41 === 0), "vec_id", "embedding")
    val hits = Similarity.sq8TopK(reloaded, self, K)
      .select("query_id").distinct().count()
    assert(hits == self.count(), "appended vectors must be query-able")
  }

  test("IVF-SQ8 index: save → load → query identical; on-disk append composes") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val idx = Similarity.ivfSq8IndexBuild(half, "vec_id", "embedding")
    val built = rows(Similarity.ivfSq8TopK(idx, pred, K))
    val dir = tmp("ivfsq8")
    Similarity.ivfSq8IndexSave(idx, dir)
    val loaded = Similarity.ivfSq8IndexLoad(spark, dir)
    // both model artifacts must round-trip bit-exactly
    assert(loaded.centroids.zip(idx.centroids).forall {
      case (a, b) => java.util.Arrays.equals(a, b)
    }, "centroid doubles drifted through save/load")
    assert(loaded.quantizer.mins.toSeq == idx.quantizer.mins.toSeq
      && loaded.quantizer.spans.toSeq == idx.quantizer.spans.toSeq,
      "quantizer bounds must round-trip double-exact")
    assert(rows(Similarity.ivfSq8TopK(loaded, pred, K)) == built)
    // on-disk append under the frozen centroids + bounds, then reload:
    // identical to the in-memory append of the same rows
    Similarity.ivfSq8IndexAppendSave(spark, dir, rest,
      "vec_id", "embedding", batchId = 1L)
    Similarity.ivfSq8IndexAppendSave(spark, dir, rest,
      "vec_id", "embedding", batchId = 1L) // replay: idempotent per batch
    val reloaded = Similarity.ivfSq8IndexLoad(spark, dir)
    val grown = Similarity.ivfSq8IndexAppend(idx, rest, "vec_id", "embedding")
    assert(rows(Similarity.ivfSq8TopK(reloaded, pred, K)) ==
      rows(Similarity.ivfSq8TopK(grown, pred, K)))
    // appended vectors are retrievable through the join path
    assertAppendedRetrievable(
      q => Similarity.ivfSq8TopKJoin(reloaded, q, "vec_id", "embedding", K),
      rest)
  }

  test("IVF-PQ index: appended vectors are retrievable") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val grown = Similarity.ivfPqIndexAppend(
      Similarity.ivfPqIndexBuild(half, "vec_id", "embedding"),
      rest, "vec_id", "embedding")
    assertAppendedRetrievable(
      q => Similarity.ivfPqTopK(grown, q, "vec_id", "embedding", K,
        Similarity.PqRerank, Similarity.IvfProbes), rest)
  }

  test("on-disk appends: every index type loads streamed batches in") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    def check(tag: String,
        build: org.apache.spark.sql.DataFrame => Unit,
        appendSave: (String, Long) => Unit,
        loadTopK: () => org.apache.spark.sql.DataFrame,
        wantTopK: () => org.apache.spark.sql.DataFrame): Unit = {
      build(half)
      // two idempotent batches; batch 0 replayed once
      appendSave(tag, 0L)
      appendSave(tag, 0L)
      assert(rows(loadTopK()) == rows(wantTopK()),
        s"$tag: on-disk appends diverged from the in-session append")
    }
    val lshDir = tmp("lsh_disk")
    check("lsh",
      h => Similarity.lshIndexSave(
        Similarity.lshIndexBuild(h, "vec_id", "embedding", dim = 64),
        lshDir),
      (_, b) => Similarity.lshIndexAppendSave(
        spark, lshDir, rest, "vec_id", "embedding", b),
      () => Similarity.lshTopK(
        Similarity.lshIndexLoad(spark, lshDir), pred, K),
      () => Similarity.lshTopK(Similarity.lshIndexAppend(
        Similarity.lshIndexBuild(half, "vec_id", "embedding", dim = 64),
        rest, "vec_id", "embedding"), pred, K))
    val ivfDir = tmp("ivf_disk")
    check("ivf",
      h => Similarity.ivfIndexSave(
        Similarity.ivfIndexBuild(h, "vec_id", "embedding"), ivfDir),
      (_, b) => Similarity.ivfIndexAppendSave(
        spark, ivfDir, rest, "vec_id", "embedding", b),
      () => Similarity.ivfTopK(
        Similarity.ivfIndexLoad(spark, ivfDir), pred, K),
      // quantizer training is deterministic, so an in-session rebuild +
      // append is the exact reference for the persisted lifecycle
      () => Similarity.ivfTopK(Similarity.ivfIndexAppend(
        Similarity.ivfIndexBuild(half, "vec_id", "embedding"),
        rest, "vec_id", "embedding"), pred, K))
    val pqDir = tmp("pq_disk")
    check("pq",
      h => Similarity.pqIndexSave(
        Similarity.pqIndexBuild(h, "vec_id", "embedding"), pqDir),
      (_, b) => Similarity.pqIndexAppendSave(
        spark, pqDir, rest, "vec_id", "embedding", b),
      () => Similarity.pqTopK(
        Similarity.pqIndexLoad(spark, pqDir), pred, K),
      () => Similarity.pqTopK(Similarity.pqIndexAppend(
        Similarity.pqIndexBuild(half, "vec_id", "embedding"),
        rest, "vec_id", "embedding"), pred, K))
    // save clears appends for every kind (stale-quantizer protection)
    Similarity.lshIndexSave(
      Similarity.lshIndexBuild(emb, "vec_id", "embedding", dim = 64),
      lshDir)
    val p = new org.apache.hadoop.fs.Path(s"$lshDir/appends")
    assert(!p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(p), "save must prune on-disk appends")
  }

  test("fold generalizes: every family folds appends crash-atomically") {
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val extra = emb.limit(5).select(
      (col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val qs = Similarity.normed(emb.filter(pred), "vec_id", "embedding")
    val total = emb.count()

    // (tag, build+save into dir, appendSave(df, batchId), corpus count
    // of a fresh load, top-k of a fresh load) — one row per family; the
    // SAME generic protocol must hold for each
    final case class Fam(tag: String,
        save: String => Unit,
        append: (String, org.apache.spark.sql.DataFrame, Long) => Unit,
        corpusCount: String => Long,
        topk: String => Set[String],
        fold: String => Unit)
    val fams = Seq(
      Fam("lsh",
        d => Similarity.lshIndexSave(
          Similarity.lshIndexBuild(half, "vec_id", "embedding", dim = 64), d),
        (d, df, b) => Similarity.lshIndexAppendSave(
          spark, d, df, "vec_id", "embedding", b),
        d => Similarity.lshIndexLoad(spark, d).corpus.count(),
        d => rows(Similarity.lshTopK(
          Similarity.lshIndexLoad(spark, d), pred, K)),
        d => Similarity.lshIndexFold(spark, d)),
      Fam("ivf",
        d => Similarity.ivfIndexSave(
          Similarity.ivfIndexBuild(half, "vec_id", "embedding"), d),
        (d, df, b) => Similarity.ivfIndexAppendSave(
          spark, d, df, "vec_id", "embedding", b),
        d => Similarity.ivfIndexLoad(spark, d).corpus.count(),
        d => rows(Similarity.ivfTopK(
          Similarity.ivfIndexLoad(spark, d), pred, K)),
        d => Similarity.ivfIndexFold(spark, d)),
      Fam("pq",
        d => Similarity.pqIndexSave(
          Similarity.pqIndexBuild(half, "vec_id", "embedding"), d),
        (d, df, b) => Similarity.pqIndexAppendSave(
          spark, d, df, "vec_id", "embedding", b),
        d => Similarity.pqIndexLoad(spark, d).corpus.count(),
        d => rows(Similarity.pqTopK(
          Similarity.pqIndexLoad(spark, d), pred, K)),
        d => Similarity.pqIndexFold(spark, d)),
      Fam("sq8",
        d => Similarity.sq8IndexSave(
          Similarity.sq8IndexBuild(half, "vec_id", "embedding"), d),
        (d, df, b) => Similarity.sq8IndexAppendSave(
          spark, d, df, "vec_id", "embedding", b),
        d => Similarity.sq8IndexLoad(spark, d).corpus.count(),
        d => rows(Similarity.sq8TopK(
          Similarity.sq8IndexLoad(spark, d), qs, K)),
        d => Similarity.sq8IndexFold(spark, d)),
      Fam("ivfsq8",
        d => Similarity.ivfSq8IndexSave(
          Similarity.ivfSq8IndexBuild(half, "vec_id", "embedding"), d),
        (d, df, b) => Similarity.ivfSq8IndexAppendSave(
          spark, d, df, "vec_id", "embedding", b),
        d => Similarity.ivfSq8IndexLoad(spark, d).corpus.count(),
        d => rows(Similarity.ivfSq8TopK(
          Similarity.ivfSq8IndexLoad(spark, d), pred, K)),
        d => Similarity.ivfSq8IndexFold(spark, d)))

    fams.foreach { f =>
      val dir = tmp(s"fold_${f.tag}")
      val hfs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def exists(name: String) =
        hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/$name"))
      f.save(dir)
      f.append(dir, rest, 0L)
      val before = f.topk(dir)
      // fold == load-with-appends, row for row, from a fresh load
      f.fold(dir)
      assert(!exists("appends"), s"${f.tag}: fold must prune appends/")
      assert(f.corpusCount(dir) == total,
        s"${f.tag}: folded corpus lost rows")
      assert(f.topk(dir) == before,
        s"${f.tag}: fold changed query answers")
      // crash BEFORE the sidecar commit (epoch 2 never commits): rows
      // are temporarily invisible, never doubled; recovery restores them
      f.append(dir, extra, 7L)
      require(hfs.rename(
        new org.apache.hadoop.fs.Path(s"$dir/appends"),
        new org.apache.hadoop.fs.Path(s"$dir/appends_folding_e2")))
      assert(f.corpusCount(dir) == total,
        s"${f.tag}: uncommitted aside must not double rows")
      Similarity.foldRecover(spark, dir)
      assert(f.corpusCount(dir) == total + 5,
        s"${f.tag}: recovery must restore the un-folded appends")
      // and the settled index folds cleanly afterwards
      f.fold(dir)
      assert(f.corpusCount(dir) == total + 5 && !exists("appends"),
        s"${f.tag}: post-recovery fold lost rows")
      // a rebuild prunes remnants for this family too
      f.append(dir, extra, 9L)
      rest.write.mode("overwrite").parquet(s"$dir/corpus_old_e99")
      f.save(dir)
      assert(!exists("appends") && !exists("corpus_old_e99"),
        s"${f.tag}: save must prune appends and fold remnants")
    }
  }

  test("kind/version validation refuses mismatched index dirs") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Similarity.lshIndexBuild(emb, "vec_id", "embedding", dim = 64)
    val dir = tmp("wrongkind")
    Similarity.lshIndexSave(idx, dir)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfIndexLoad(spark, dir)
    }
    assert(e.getMessage.contains("kind"))
    intercept[IllegalArgumentException] {
      Similarity.lshIndexLoad(spark, tmp("empty"))
    }
  }

  test("streaming near-dup screens against a LOADED base index") {
    import org.apache.spark.sql.types._
    val docs = Tables.documents(spark, sf)
    val isNew = substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 1) >= "8"
    val base = docs.filter(!isNew).select("doc_id", "text")
    val idxDir = tmp("neardup")
    Streams.nearDupIndexSave(
      Streams.nearDupIndexBuild(base, "doc_id", "text"), idxDir)
    val loaded = Streams.nearDupIndexLoad(spark, idxDir)

    val dir = java.nio.file.Files.createTempDirectory("graft_nd_loaded")
    docs.filter(isNew).select("doc_id", "text")
      .write.mode("overwrite").parquet(dir.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = Streams.nearDupAgainstBase(
      spark.readStream.schema(schema).parquet(dir.toString),
      loaded, "doc_id", "text", threshold = 0.6, watermark = None)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("nd_loaded_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nd_loaded_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val batch = graft.operators.Dedup.minHashLshPairsAcross(
          base, docs.filter(isNew), "doc_id", "text", 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(batch.nonEmpty, "fixture should contain cross-split pairs")
      assert(streamed == batch,
        s"loaded-index screen diverged: missed ${batch.keySet -- streamed.keySet}" +
          s", extra ${streamed.keySet -- batch.keySet}")
    } finally q.stop()
  }
}
