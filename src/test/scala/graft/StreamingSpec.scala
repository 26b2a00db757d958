package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  import GraftSpark.{spark, sf}

  test("streaming hourly counts match the batch query") {
    // file-source streams take a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Streams.hourlyCounts(
      Streams.readEventStream(spark, dir.toString))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; with a bounded
      // input everything except the trailing 2h closes.
      val streamed = spark.table("hourly_out")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val batch = SparkEntry.queries("q_e2_hourly_window")(spark, sf)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed.nonEmpty)
      streamed.foreach { case (k, v) =>
        assert(batch(k) == v, s"window $k differs: stream $v vs batch ${batch(k)}")
      }
    } finally q.stop()
  }

  test("stateful streaming sessionization matches the batch sessions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = Streams.sessionize(Streams.readEventStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      val batch = SparkEntry.queries("q_e4_sessionize")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      assert(streamed.nonEmpty)
      // append mode emits only gap-closed sessions; each must equal its
      // batch twin exactly (the trailing open session per user stays in
      // state)
      streamed.foreach { case (k, v) =>
        assert(batch(k) == v, s"session $k differs: stream $v vs batch ${batch(k)}")
      }
      val emittedPerUser = streamed.keys.groupBy(_._1).view.mapValues(_.size)
      val batchPerUser = batch.keys.groupBy(_._1).view.mapValues(_.size)
      emittedPerUser.foreach { case (u, n) =>
        assert(n == batchPerUser(u) - 1,
          s"user $u: expected all but the open session emitted")
      }
    } finally q.stop()
  }

  test("event-time timeout drops late events and flushes final sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input =
      StreamTestSupport.memoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "event_id", "ts", "value")
    val q = Streams.sessionize(events, watermarkDelay = Some("10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout").start()
    try {
      // batch 1: user 1's session — two events 100s apart
      input.addData((1L, 1L, t(1000), 1.1), (1L, 2L, t(1100), 2.2))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").count() == 0,
        "session still open — nothing should emit yet")
      // batch 2: user 2 far in the future advances the watermark to
      // 100000-600s, past user 1's close time (1100+1800) → the no-data
      // follow-up batch fires user 1's EventTimeTimeout and flushes it
      input.addData((2L, 3L, t(100000), 5.0))
      q.processAllAvailable()
      val flushed = spark.table("sess_timeout").collect()
      assert(flushed.length == 1)
      val r = flushed.head
      assert(r.getLong(0) == 1L && r.getLong(2) == 2L
        && r.getLong(3) == 1000L && r.getLong(4) == 1100L
        && r.getDouble(5) == 3.3,
        s"unexpected flushed session: $r")
      // batch 3: a late event for user 1 (t=500 « watermark) must be
      // dropped — no resurrected session, no state
      input.addData((1L, 4L, t(500), 9.9))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").count() == 1,
        "late event below the watermark must not create or reopen a session")
    } finally q.stop()
  }

  test("timeout-flushed sessions of one user get collision-free ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input =
      StreamTestSupport.memoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "event_id", "ts", "value")
    val q = Streams.sessionize(events, watermarkDelay = Some("10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ids").start()
    try {
      // two sessions for user 1, each flushed by a watermark advance that
      // removes the state between them — the ids must still differ
      input.addData((1L, 1L, t(1000), 1.0))
      q.processAllAvailable()
      input.addData((2L, 2L, t(100000), 0.0)) // watermark → flush session 1
      q.processAllAvailable()
      input.addData((1L, 3L, t(200000), 2.0))
      q.processAllAvailable()
      input.addData((2L, 4L, t(400000), 0.0)) // watermark → flush session 2
      q.processAllAvailable()
      val mine = spark.table("sess_ids").collect()
        .filter(_.getLong(0) == 1L)
      assert(mine.length == 2, s"expected both sessions flushed: ${mine.toSeq}")
      val ids = mine.map(_.getLong(1)).toSet
      assert(ids.size == 2,
        s"session ids must be collision-free across state removal: $ids")
      assert(ids == Set(1000L, 200000L),
        s"watermark-mode ids are start_sec: $ids")
    } finally q.stop()
  }

  test("streaming uniform sample equals the batch draw at every prefix") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chunks = docs.grouped(math.max(1, docs.length / 3)).toSeq
    val k = 5
    val ms = StreamTestSupport.memoryStream[(String, Long)]
    val current =
      scala.collection.concurrent.TrieMap.empty[String, Seq[Long]]
    val q = Streams
      .uniformSampleStream(ms.toDF().toDF("source", "doc_id"),
        "source", "doc_id", k)
      .toDF()
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          current(r.getString(0)) = r.getSeq[Long](1))
      }
      .start()
    try {
      var fed = Seq.empty[(String, Long)]
      chunks.foreach { chunk =>
        fed = fed ++ chunk
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
        // batch draw over exactly the prefix fed so far — the stream's
        // per-group state must match it, order included (prefix
        // consistency of the deterministic bottom-k)
        val batch = graft.operators.Sampling
          .uniformPerGroup(fed.toDF("source", "doc_id"),
            Seq("source"), "doc_id", k)
          .collect()
          .map(r => (r.getString(0), r.getLong(2), r.getLong(1)))
          .groupBy(_._1)
          .map { case (g, rows) =>
            g -> rows.sortBy(_._2).map(_._3).toSeq
          }
        assert(current.toMap == batch,
          s"after ${fed.length} rows: stream sample != batch draw")
      }
    } finally q.stop()
  }

  test("streaming uniform sample tolerates at-least-once re-delivery") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id")
      .limit(60)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val k = 5
    val ms = StreamTestSupport.memoryStream[(String, Long)]
    val current =
      scala.collection.concurrent.TrieMap.empty[String, Seq[Long]]
    val q = Streams
      .uniformSampleStream(ms.toDF().toDF("source", "doc_id"),
        "source", "doc_id", k)
      .toDF()
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          current(r.getString(0)) = r.getSeq[Long](1))
      }
      .start()
    try {
      val (first, rest) = docs.splitAt(docs.length / 2)
      ms.addData(first.toSeq)
      q.processAllAvailable()
      // an at-least-once source re-delivers the whole first chunk
      // alongside the new rows: duplicate (pri, id) offers must not
      // occupy sample slots
      ms.addData((first ++ rest).toSeq)
      q.processAllAvailable()
      val batch = graft.operators.Sampling
        .uniformPerGroup(docs.distinct.toSeq.toDF("source", "doc_id"),
          Seq("source"), "doc_id", k)
        .collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(1)))
        .groupBy(_._1)
        .map { case (g, rows) => g -> rows.sortBy(_._2).map(_._3).toSeq }
      assert(current.toMap == batch,
        "re-delivered rows must not displace distinct sample ids")
    } finally q.stop()
  }

  test("streaming exact dedup keeps one row per content digest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = Streams.dedupStream(
      spark.readStream.schema(schema).parquet(dir.toString), "text")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out").count()
      val batchGroups = graft.operators.Dedup
        .exactGroups(Tables.documents(spark, sf), "doc_id", "text").count()
      assert(streamed == batchGroups,
        s"stream kept $streamed digests, batch has $batchGroups groups")
    } finally q.stop()
  }

  test("streaming incremental near-dup equals the batch cross-corpus pairs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    // same md5 split as NorthStarSpec / the batch q_d7 shape
    val isNew = substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 1) >= "8"
    val base = docs.filter(!isNew).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_neardup")
    docs.filter(isNew).select("doc_id", "text")
      .write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = Streams.nearDupAgainstBase(
      spark.readStream.schema(schema).parquet(dir.toString),
      base, "doc_id", "text", threshold = 0.6)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val batch = graft.operators.Dedup.minHashLshPairsAcross(
          base, docs.filter(isNew), "doc_id", "text", 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(batch.nonEmpty, "fixture should contain cross-split pairs")
      // the row-level signature is bit-identical to the batch aggregate,
      // so candidates — and therefore verified pairs AND their jaccard
      // values — must match the batch operator exactly
      assert(streamed == batch,
        s"missed ${batch.keySet -- streamed.keySet} / " +
          s"extra ${streamed.keySet -- batch.keySet}")
    } finally q.stop()

    // watermark-bounded (production) mode: the event-time tag must survive
    // the band explode and stream-static joins into the within-watermark
    // dedup, and in-window output must still equal batch
    val schemaTs = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val dirTs = java.nio.file.Files.createTempDirectory("graft_stream_nd_wm")
    docs.filter(isNew).select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
      .write.mode("overwrite").parquet(dirTs.toString)
    val bounded = Streams.nearDupAgainstBase(
      spark.readStream.schema(schemaTs).parquet(dirTs.toString),
      base, "doc_id", "text", threshold = 0.6,
      watermark = Some(("ts", "10 minutes")))
    val q2 = bounded.writeStream.outputMode("append")
      .format("memory").queryName("neardup_wm_out").start()
    try {
      q2.processAllAvailable()
      val streamedWm = spark.table("neardup_wm_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val batch = graft.operators.Dedup.minHashLshPairsAcross(
          base, docs.filter(isNew), "doc_id", "text", 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(streamedWm == batch,
        s"watermark mode diverged: missed ${batch.keySet -- streamedWm.keySet}")
    } finally q2.stop()
  }

  test("streaming decontamination equals the batch containment screen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val probe = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, probe), // the benchmark document
      (100L, s"intro words here $probe trailing words after"), // full inclusion
      (101L, "completely unrelated content with different tokens entirely"),
      (102L, "alpha beta gamma delta filler filler filler")) // partial overlap
      .toDF("doc_id", "text")
    val batch = graft.operators.Decontaminate.contamination(
        corpus, "doc_id", "text",
        probePred = col("doc_id") < 10, minContainment = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(batch.size == 2, s"fixture should plant full + partial hits: $batch")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_decontam")
    corpus.filter(col("doc_id") >= 10)
      .write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = Streams.contaminationStream(
      spark.readStream.schema(schema).parquet(dir.toString),
      corpus.filter(col("doc_id") < 10), "doc_id", "text",
      minContainment = 0.3)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("decontam_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("decontam_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed == batch,
        s"stream $streamed must equal batch $batch bit-for-bit")
    } finally q.stop()
  }

  test("streaming LM scoring equals the batch model scorer") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val corpus = Tables.documents(spark, sf)
    val model = TextAnalysis.lmTrain(corpus, "doc_id", "text", minCount = 2)
    val incoming = corpus.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
    val batch = TextAnalysis.lmScoreWith(model, incoming, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(batch.nonEmpty, "fixture must score some documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_lm")
    incoming.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = Streams.lmScoreStream(
      spark.readStream.schema(schema).parquet(dir.toString),
      model, "doc_id", "text")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("lm_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("lm_out").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed == batch,
        "streamed LM scores must equal the batch scorer bit-for-bit")
    } finally q.stop()
  }

  test("composed curation screen stream: planted verdicts, batch twin") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Curation, TextAnalysis}
    // grammar corpus: 'the' every 5th token, shared 50-word vocabulary
    def grammarDoc(i: Int): String = (0 until 80)
      .map(j => if (j % 5 == 0) "the" else s"w${(i * 7 + j * 3) % 50}")
      .mkString(" ")
    val trainDocs = (0 until 30).map(i => (i.toLong, grammarDoc(i)))
      .toDF("doc_id", "text")
    val model = TextAnalysis.lmTrain(trainDocs, "doc_id", "text",
      minCount = 1)
    val keeper = (100L, grammarDoc(0)) // every transition seen in training
    val repeated = (101L, Seq.fill(40)("spam ham").mkString(" "))
    val spanish = (102L,
      (0 until 80).map(j => if (j % 5 == 0) "el" else s"w$j").mkString(" "))
    val gibberish = (103L, (0 until 80)
      .map(j => if (j % 5 == 0) "the" else s"zq${j}x").mkString(" "))
    val short = (104L, "solo")
    val incoming = Seq(keeper, repeated, spanish, gibberish, short)
      .toDF("doc_id", "text")
    // cap between the keeper's xent and the gibberish doc's
    val xents = TextAnalysis.lmScoreWith(model, incoming, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cfg = Curation.Config(
      lmXentMax = Some((xents(100L) + xents(103L)) / 2))
    val batch = Streams.curationScreenStream(
      incoming, "doc_id", "text", Some(model), cfg)
    val verdicts = batch.collect()
      .map(r => r.getLong(0) -> r.getAs[String]("verdict")).toMap
    assert(verdicts == Map(100L -> "keep", 101L -> "drop", 102L -> "drop",
      103L -> "drop", 104L -> "drop"), s"planted verdicts: $verdicts")
    // and each drop fired for its intended reason
    val rows = batch.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(101L).getAs[Double]("rep_fraction") >= 0.05)
    assert(rows(102L).getAs[String]("pred_lang") == "es")
    assert(rows(103L).getAs[Double]("xent") > cfg.lmXentMax.get
      && rows(103L).getAs[String]("pred_lang") == "en"
      && rows(103L).getAs[Double]("quality") >= 0.5)
    assert(rows(104L).isNullAt(rows(104L).fieldIndex("rep_fraction")))
    // gopherScreen folds the Gopher rules into the combined verdict,
    // mirroring the batch pipeline under the same Config
    val withG = Streams.curationScreenStream(
        incoming, "doc_id", "text", Some(model),
        cfg.copy(gopherScreen = true))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("verdict"), r.getAs[String]("gopher_verdict"))))
      .toMap
    withG.foreach { case (d, (v, g)) =>
      val expected = if (verdicts(d) == "keep" && g == "keep") "keep"
        else "drop"
      assert(v == expected,
        s"doc $d: gopherScreen verdict $v != expected $expected (g=$g)")
    }
    assert(withG.exists(_._2._2 == "drop"),
      "fixture must exercise at least one gopher drop")
    // structural twin: the same call on a file stream, bit-identical
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_screen")
    incoming.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = Streams.curationScreenStream(
      spark.readStream.schema(schema).parquet(dir.toString),
      "doc_id", "text", Some(model), cfg)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("screen_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("screen_out").collect()
        .map(_.toString).sorted.toSeq
      val batchRows = batch.collect().map(_.toString).sorted.toSeq
      assert(streamed == batchRows,
        "streamed screen must equal the batch twin bit-for-bit")
    } finally q.stop()
  }

  test("row-level MinHash signature equals the batch sketch aggregate") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf).limit(200)
    val prime = graft.functions.GraftFunctions.HashPrime
    val perRow = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.minHashRow(
        transform(graft.operators.Dedup.wordTrigrams(col("text")),
          t => pmod(xxhash64(t), lit(prime)))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = docs
      .select(col("doc_id"),
        explode(graft.operators.Dedup.wordTrigrams(col("text"))).as("tg"))
      .select(col("doc_id"), pmod(xxhash64(col("tg")), lit(prime)).as("h"))
      .groupBy("doc_id")
      .agg(graft.functions.GraftFunctions.minHashSketch(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(perRow.keySet == agg.keySet)
    perRow.foreach { case (id, sig) =>
      assert(sig == agg(id), s"doc $id signatures diverge")
    }
  }

  test("batch curation projections compose unchanged onto a stream") {
    // the quality/langid/redaction Columns are pure projections, so the
    // same expressions run on readStream input with no code changes —
    // values must match the batch run row-for-row
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_curate")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.{col, size}
    def curate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.piiCount(col("text")).as("n_pii"),
      size(graft.functions.GraftFunctions.wordpieceTokens(
        col("text"), graft.queries.Text.WpVocab)).as("n_wp"))
    val q = curate(spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curate_out").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2),
          r.getLong(3), r.getInt(4)))).toMap
      val batch = curate(Tables.documents(spark, sf)).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2),
          r.getLong(3), r.getInt(4)))).toMap
      assert(streamed.size == batch.size && streamed == batch,
        "streamed curation values must equal batch bit-for-bit")
    } finally q.stop()
  }

  test("streaming exact dedup against a base corpus drops known digests") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") < 400).select("doc_id", "text")
    // incoming: the remaining genuinely-new docs + 20 verbatim copies of
    // base docs under fresh ids (the corpus has no natural exact
    // duplicates — plant them)
    val incoming = docs.filter(col("doc_id") >= 400)
      .select("doc_id", "text")
      .union(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_exact")
    incoming.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = Streams.exactAgainstBase(
      spark.readStream.schema(schema).parquet(dir.toString), base, "text")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("exact_base_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("exact_base_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val expectedKept = docs.filter(col("doc_id") >= 400)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == expectedKept,
        "planted copies must drop, new docs must survive: kept " +
          s"${streamed.size}, expected ${expectedKept.size}")
    } finally q.stop()
  }

  test("streaming repetition screen equals the batch screen") {
    // repetitionScreen is a stateless narrow map (per-document statistic),
    // so the SAME operator runs on readStream input unchanged — the
    // whole-corpus screen and the live-ingest screen are one code path
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_rep")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = graft.operators.TextAnalysis.repetitionScreen(
      spark.readStream.schema(schema).parquet(dir.toString),
      "doc_id", "text")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("rep_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("rep_out").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
      val batch = graft.operators.TextAnalysis.repetitionScreen(
          Tables.documents(spark, sf), "doc_id", "text").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
      assert(streamed.size == batch.size && streamed == batch,
        "streamed repetition stats must equal batch bit-for-bit")
    } finally q.stop()
  }

  test("parquet sink with checkpoint is exactly-once across restart") {
    // the operational contract a training-data ingest pipeline relies on:
    // kill the query, restart from the same checkpoint, and the file sink
    // neither loses nor duplicates rows
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_stream_sink")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    val docs = Tables.documents(spark, sf)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def startQuery() = spark.readStream.schema(schema).parquet(in)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.qualityScore(col("text"))
          .as("quality"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk).start()
    docs.filter(col("doc_id") < 250).select("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    // second half lands while the query is down; restart from checkpoint
    docs.filter(col("doc_id") >= 250).select("doc_id", "text")
      .write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    val all = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.length == all.length && got.sameElements(all),
      s"exactly-once violated: ${got.length} rows out vs ${all.length} in")
  }

  test("composed curation chain is exactly-once across a kill-restart") {
    // the full continual-ingest hygiene chain as ONE checkpointed query:
    // curationScreenStream (keep verdicts) → exactAgainstBase (don't
    // re-ingest the training set) → decontamScreenStream (benchmark
    // screen) → parquet sink. Kill it mid-corpus, land more data, restart
    // from the checkpoint: the sink must hold exactly the batch
    // composition's survivors — no loss, no duplicates.
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_composed")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val cfg = graft.operators.Curation.Config(
      minQuality = 0.3, repetitionDropAt = 0.5)
    // base corpus: every 7th document is "already ingested" — its
    // REDACTED text digest must block the incoming twin
    val base = Streams.curationScreenStream(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", None, cfg)
      .select(col("clean_text").as("text"))
    // probes: two real documents → their trigrams contaminate themselves
    val probes = docs.filter(col("doc_id").isin(3L, 17L))
    def compose(src: org.apache.spark.sql.DataFrame) = {
      val screened = Streams.curationScreenStream(
          src, "doc_id", "text", None, cfg)
        .filter(col("verdict") === "keep")
        .select(col("doc_id"), col("clean_text").as("text"))
      Streams.decontamScreenStream(
        Streams.exactAgainstBase(screened, base, "text"),
        probes, "text", minContainment = 0.8)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def startQuery() = compose(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk).start()
    docs.filter(col("doc_id") < 250).write.mode("overwrite").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    docs.filter(col("doc_id") >= 250).write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(got.length == got.distinct.length,
      s"restart duplicated ${got.length - got.distinct.length} rows")
    // batch truth: the identical composition over a plain read
    val expected = compose(docs).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(got.sameElements(expected),
      s"composed funnel diverged: ${got.length} streamed vs " +
        s"${expected.length} batch; missing " +
        s"${(expected.toSet -- got.toSet).take(5)}, extra " +
        s"${(got.toSet -- expected.toSet).take(5)}")
    // the fixture must exercise every stage: some docs dropped by the
    // screen, some by the base digest, some by the decontam probes
    val n = docs.count()
    val afterScreen = Streams.curationScreenStream(
        docs, "doc_id", "text", None, cfg)
      .filter(col("verdict") === "keep").count()
    assert(afterScreen < n, "screen stage dropped nothing")
    assert(expected.length < afterScreen,
      "dedup+decontam stages dropped nothing")
    assert(!expected.contains(3L) && !expected.contains(17L),
      "probe documents must decontaminate themselves away")
  }

  test("watermarked media screen is exactly-once across a kill-restart") {
    // the continual media-ingest screen as a checkpointed query: kill it
    // mid-corpus, land more media, restart from the checkpoint — the
    // sink must hold each planted pair exactly once
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_media_restart")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    val contents = 0L until 10L
    def tones(ids: Seq[Long], offset: Long) = {
      import spark.implicits._
      graft.operators.Multimodal.syntheticTones(
        ids.map(c => (c + offset, c, 1.0, 0))
          .toDF("media_id", "content_id", "scale", "trim"))
    }
    val baseIdx = graft.operators.Multimodal.mediaFingerprints(
      tones(contents, 0L))
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("media_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    def startQuery() = Streams.mediaNearDupAgainstBase(
        spark.readStream.schema(schema).parquet(in), baseIdx,
        watermark = Some(("ts", "10 minutes")))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk).start()
    withTs(tones(contents.take(5), 5000L)).write.mode("overwrite").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    withTs(tones(contents.drop(5), 5000L)).write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out).select("base_id", "new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.length == got.distinct.length,
      s"restart duplicated ${got.length - got.distinct.length} pairs")
    assert(got.toSet == contents.map(c => (c, c + 5000L)).toSet,
      s"expected each planted copy exactly once across the restart: $got")
  }

  test("foreachBatch upsert sink: keyed state follows the highest version across restarts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_upsert")
    val in = s"$root/in"; val state = s"$root/state"; val chk = s"$root/chk"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ver",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val q = Streams.upsertSink(
        spark.readStream.schema(schema).parquet(in),
        state, keyCols = Seq("k"), versionCol = "ver", checkpoint = chk)
      try q.processAllAvailable() finally q.stop()
    }
    // wave 1: insert keys 1..5 at version 1
    (1L to 5L).map(k => (k, 1L, s"v1_$k")).toDF("k", "ver", "payload")
      .write.mode("overwrite").parquet(in)
    run()
    // wave 2 (after a full stop/restart): update 2 and 3, insert 6
    Seq((2L, 2L, "v2_2"), (3L, 2L, "v2_3"), (6L, 1L, "v1_6"))
      .toDF("k", "ver", "payload").write.mode("append").parquet(in)
    run()
    val got = Streams.readUpsertState(spark, state)
      .select("k", "ver", "payload").as[(Long, Long, String)]
      .collect().toSet
    val want = Set(
      (1L, 1L, "v1_1"), (2L, 2L, "v2_2"), (3L, 2L, "v2_3"),
      (4L, 1L, "v1_4"), (5L, 1L, "v1_5"), (6L, 1L, "v1_6"))
    assert(got == want, s"upsert state diverged: $got")
    // state pruning keeps at most the committed version + its fallback
    val dirs = new java.io.File(state).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d{5}"))
    assert(dirs.length <= 2, s"stale state versions survive: ${dirs.toSeq}")
  }

  test("decontam screens tolerate degenerate probes (null text, <3 words)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, null: String)).toDF("doc_id", "text")
    // a null-text probe carries a NULL shingle set and cannot witness
    // containment: the survivor screen must keep everything (no NPE, no
    // three-valued-logic drop of the null-text DOC either), and the
    // pair-audit stream must flag nothing. A 2-word probe is NOT
    // degenerate — the shingle expression emits the whole text as one
    // shingle — but it matches neither corpus doc here.
    val probes = Seq((10L, null: String), (11L, "two words"))
      .toDF("doc_id", "text")
    val kept = Streams.decontamScreenStream(
      corpus, probes, "text", minContainment = 0.8).collect()
    assert(kept.length == 3,
      "degenerate probes / null-text docs must not drop rows")
    // the singleton whole-text shingle of a short probe IS matchable:
    // an identical short document must be screened out
    val shortMatch = Streams.decontamScreenStream(
      corpus.unionByName(Seq((4L, "two words")).toDF("doc_id", "text")),
      probes, "text", minContainment = 0.8).collect()
    assert(shortMatch.map(_.getLong(0)).toSet == Set(1L, 2L, 3L),
      "a short probe's whole-text shingle must still catch its twin")
    val dir = java.nio.file.Files.createTempDirectory("graft_degen_probe")
    corpus.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = Streams.contaminationStream(
        spark.readStream.schema(schema).parquet(dir.toString),
        probes, "doc_id", "text", minContainment = 0.8)
      .writeStream.outputMode("append")
      .format("memory").queryName("degen_probe_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("degen_probe_out").count() == 0,
        "an empty-shingle probe must not flag documents")
    } finally q.stop()
    // and the probe-count guard fires BEFORE collecting anything
    val big = spark.range(0, 100).select(col("id").as("doc_id"),
      lit("a b c d e").as("text"))
    val e = intercept[IllegalArgumentException] {
      Streams.decontamScreenStream(corpus, big, "text",
        minContainment = 0.8, maxProbeRows = 10)
    }
    assert(e.getMessage.contains("exceeds 10"))
  }

  test("streaming media near-dup finds edited copies against a base index") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def noisePng(seed: Long, tweak: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        27, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 27) {
        img.setRGB(x, y, (mix(seed * 6007 + y * 27 + x) & 0xFFFFFF).toInt)
      }
      if (tweak) img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x00FFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val baseMedia = (0L until 10L)
      .map(i => (i, "image", noisePng(i, tweak = false)))
      .toDF("media_id", "kind", "bytes")
    val baseIdx = graft.operators.Multimodal.mediaFingerprints(baseMedia)
    // incoming: 5 one-pixel-edited copies of base images + 5 new ones
    val incoming = ((0L until 5L)
      .map(i => (i + 1000L, "image", noisePng(i, tweak = true))) ++
      (100L until 105L)
        .map(i => (i, "image", noisePng(i * 77 + 13, tweak = false))))
      .toDF("media_id", "kind", "bytes")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_media")
    incoming.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    val stream = Streams.mediaNearDupAgainstBase(
      spark.readStream.schema(schema).parquet(dir.toString), baseIdx)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("media_dup_out").start()
    try {
      q.processAllAvailable()
      val pairs = spark.table("media_dup_out")
        .select("base_id", "new_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (0L until 5L).map(i => (i, i + 1000L)).toSet
      assert(pairs == expected,
        s"expected exactly the planted copies: got $pairs")
    } finally q.stop()

    // watermark-bounded (production) mode: the event-time column must ride
    // through the codec map as a carry column into the within-watermark
    // pair dedup, and the screen must still recover the planted copies
    val schemaTs = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType))
    val dirTs = java.nio.file.Files.createTempDirectory("graft_stream_media_wm")
    incoming
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("media_id")))
      .write.mode("overwrite").parquet(dirTs.toString)
    val bounded = Streams.mediaNearDupAgainstBase(
      spark.readStream.schema(schemaTs).parquet(dirTs.toString), baseIdx,
      watermark = Some(("ts", "10 minutes")))
    val q2 = bounded.writeStream.outputMode("append")
      .format("memory").queryName("media_dup_wm_out").start()
    try {
      q2.processAllAvailable()
      val pairsWm = spark.table("media_dup_wm_out")
        .select("base_id", "new_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (0L until 5L).map(i => (i, i + 1000L)).toSet
      assert(pairsWm == expected,
        s"watermark mode diverged from the planted copies: got $pairsWm")
    } finally q2.stop()
  }

  test("streaming audio screen: spectral mode catches trimmed re-gained copies the envelope mode cannot") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val contents = 0L until 6L
    val base = graft.operators.Multimodal.syntheticTones(
      contents.map(c => (c, c, 1.0, 0))
        .toDF("media_id", "content_id", "scale", "trim"))
    // incoming: a 0.4x-volume, 300-sample-trimmed copy of each base clip
    val incoming = graft.operators.Multimodal.syntheticTones(
      contents.map(c => (c + 5000L, c, 0.4, 300))
        .toDF("media_id", "content_id", "scale", "trim"))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_audio")
    incoming.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    val read = () => spark.readStream.schema(schema).parquet(dir.toString)
    for ((spectral, name) <- Seq((true, "spec_audio_out"),
        (false, "env_audio_out"))) {
      val baseIdx = graft.operators.Multimodal.mediaFingerprints(
        base, spectralAudio = spectral)
      val q = Streams.mediaNearDupAgainstBase(read(), baseIdx,
        spectralAudio = spectral)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        q.processAllAvailable()
        val pairs = spark.table(name)
          .select("base_id", "new_id", "hamming").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        if (spectral)
          assert(pairs == contents.map(c => (c, c + 5000L, 0L)).toSet,
            s"spectral mode must catch every planted twin exactly: $pairs")
        else
          // measured: the trim shifts every time band; envelope distances
          // for these twins sit at 29-46 bits, far outside the <=7 screen
          assert(pairs.isEmpty,
            s"envelope mode unexpectedly matched a trimmed twin: $pairs")
      } finally q.stop()
    }
  }

  test("streaming image screen: pHash mode catches mirrored reposts the dHash mode cannot") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val contents = 0L until 6L
    val base = graft.operators.Multimodal.syntheticMirrorImages(
      contents.map(c => (c, c, 0)).toDF("media_id", "content_id", "mirror"))
    val incoming = graft.operators.Multimodal.syntheticMirrorImages(
      contents.map(c => (c + 5000L, c, 1))
        .toDF("media_id", "content_id", "mirror"))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mirror")
    incoming.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    for ((phash, name) <- Seq((true, "phash_img_out"),
        (false, "dhash_img_out"))) {
      val baseIdx = graft.operators.Multimodal.mediaFingerprints(
        base, phashImages = phash)
      val q = Streams.mediaNearDupAgainstBase(
        spark.readStream.schema(schema).parquet(dir.toString), baseIdx,
        phashImages = phash)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        q.processAllAvailable()
        val pairs = spark.table(name)
          .select("base_id", "new_id", "hamming").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        if (phash)
          assert(pairs == contents.map(c => (c, c + 5000L, 0L)).toSet,
            s"pHash mode must catch every planted mirror exactly: $pairs")
        else
          // PHashSpec pins mirror dHash distances > 7 on this generator
          assert(pairs.isEmpty,
            s"dHash mode unexpectedly matched a mirrored copy: $pairs")
      } finally q.stop()
    }
  }

  test("streaming video screen: temporal mode catches re-cut clips the first-frame mode cannot") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val contents = 0L until 5L
    val base = graft.operators.Multimodal.syntheticReorderedVideos(
      contents.map(c => (c, c, 0)).toDF("media_id", "content_id", "reverse"))
    val incoming = graft.operators.Multimodal.syntheticReorderedVideos(
      contents.map(c => (c + 5000L, c, 1))
        .toDF("media_id", "content_id", "reverse"))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_recut")
    incoming.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    for ((temporal, name) <- Seq((true, "tvid_out"), (false, "fvid_out"))) {
      val baseIdx = graft.operators.Multimodal.mediaFingerprints(
        base, temporalVideo = temporal)
      val q = Streams.mediaNearDupAgainstBase(
        spark.readStream.schema(schema).parquet(dir.toString), baseIdx,
        temporalVideo = temporal)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        q.processAllAvailable()
        val pairs = spark.table(name)
          .select("base_id", "new_id", "hamming").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        if (temporal)
          assert(pairs == contents.map(c => (c, c + 5000L, 0L)).toSet,
            s"temporal mode must catch every planted re-cut exactly: $pairs")
        else
          // VideoTemporalSpec pins first-frame distances > 7 under reversal
          assert(pairs.isEmpty,
            s"first-frame mode unexpectedly matched a re-cut: $pairs")
      } finally q.stop()
    }
  }

  test("container metadata probes run unchanged on a media stream") {
    import org.apache.spark.sql.functions._
    // a crawl ingest meets MP4/WebM/FLAC/MP3 in-flight: the probes are
    // narrow maps inside extractFeatures, so the same call must run on
    // readStream input and emit the same metadata the batch path does
    val docs = graft.Tables.documents(spark, GraftSpark.sf)
    val mixed = graft.operators.Multimodal
      .syntheticMp4s(docs.filter(col("doc_id") % 8 === 3).limit(8), "doc_id")
      .unionByName(graft.operators.Multimodal.syntheticFlacs(
        docs.filter(col("doc_id") % 8 === 4).limit(8), "doc_id"))
      .unionByName(graft.operators.Multimodal.syntheticMp3s(
        docs.filter(col("doc_id") % 8 === 5).limit(8), "doc_id"))
      .unionByName(graft.operators.Multimodal.syntheticWebms(
        docs.filter(col("doc_id") % 8 === 6).limit(8), "doc_id"))
    def meta(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.extractFeatures(df).toDF()
        .select("media_id", "kind", "width", "height", "duration_ms")
    val batch = meta(mixed).collect().map(_.toString).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_probe")
    mixed.write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    val q = meta(spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("probe_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("probe_out").collect()
        .map(_.toString).toSet
      assert(streamed == batch,
        s"stream probes diverged: missing ${batch -- streamed}, " +
          s"extra ${streamed -- batch}")
      assert(batch.size == 32, s"expected all 32 payloads probed: $batch")
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch interval join") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_join")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    def split(ev: org.apache.spark.sql.DataFrame) = (
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))
    // batch truth: identical frames and join, batch read
    val evB = graft.Tables.eventsTs(spark, sf)
    val (vB, pB) = split(evB)
    val batch = Streams.attributionJoin(vB, pB, windowSec = 3600)
      .collect().map(_.toString).toSet
    val evS = Streams.readEventStream(spark, dir.toString)
    val (vS, pS) = split(evS)
    val q = Streams.attributionJoin(vS, pS, windowSec = 3600)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out").collect()
        .map(_.toString).toSet
      assert(streamed.nonEmpty, "no attribution pairs streamed")
      assert(streamed == batch,
        s"stream-stream join diverged: missing ${(batch -- streamed).take(3)}" +
          s", extra ${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("audio stats and scene detection compose unchanged onto a stream") {
    import org.apache.spark.sql.functions._
    // both are narrow typed maps over decoded payloads, so the identical
    // calls must run on readStream input with bit-equal output
    val docs = graft.Tables.documents(spark, GraftSpark.sf)
    val audio = graft.operators.Multimodal
      .syntheticAudio(docs.filter(col("doc_id") % 8 === 1).limit(8), "doc_id")
    val video = graft.operators.Multimodal
      .syntheticVideos(docs.filter(col("doc_id") % 8 === 2).limit(8), "doc_id")
    val batchAudio = graft.operators.Multimodal.audioStatsOf(audio)
      .collect().map(_.toString).toSet
    val batchScenes = graft.operators.Multimodal.videoSceneChanges(video)
      .collect().map(_.toString).toSet
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    val aDir = java.nio.file.Files.createTempDirectory("graft_stream_astat")
    val vDir = java.nio.file.Files.createTempDirectory("graft_stream_scene")
    audio.write.mode("overwrite").parquet(aDir.toString)
    video.write.mode("overwrite").parquet(vDir.toString)
    val qa = graft.operators.Multimodal.audioStatsOf(
        spark.readStream.schema(schema).parquet(aDir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("astat_out").start()
    val qv = graft.operators.Multimodal.videoSceneChanges(
        spark.readStream.schema(schema).parquet(vDir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("scene_out").start()
    try {
      qa.processAllAvailable()
      qv.processAllAvailable()
      val sa = spark.table("astat_out").collect().map(_.toString).toSet
      val sv = spark.table("scene_out").collect().map(_.toString).toSet
      assert(sa == batchAudio, s"stream audio stats diverged: $sa")
      assert(sv == batchScenes,
        s"stream scenes diverged: missing ${batchScenes -- sv}")
      assert(sa.size == 8 && sv.nonEmpty)
    } finally { qa.stop(); qv.stop() }
  }

  test("streaming FHIR bundle pivot + flatten runs on the ADT feed") {
    val adtDir = getClass.getResource("/adt").getPath
    val bundles = Streams.readBundleStream(spark, adtDir)
    val events = graft.fhir.Flatten.patients(bundles)
      .drop("bundleUUID") // stream output: deterministic columns only
    val q = events.writeStream
      .outputMode("append")
      .format("memory").queryName("adt_out")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("adt_out").collect()
      assert(rows.length == 4)
      val ssns = rows.map(_.getAs[String]("ssn")).toSet
      assert(ssns == Set("555-55-5555", "666-66-6666"))
    } finally q.stop()
  }

  test("readStream graft-fhir: batch-identical rows, exactly-once restart") {
    // the DSv2 connector's MicroBatchStream: the ADT feed story through
    // the same pruned-registry parse as the batch scan — new files land
    // between restarts and each is read exactly once
    val fixtures = new java.io.File(getClass.getResource("/adt").getPath)
      .listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(fixtures.length == 4)
    val root = java.nio.file.Files.createTempDirectory("graft_fhir_stream")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(fs: Seq[java.io.File]): Unit = fs.foreach(f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(in, f.getName)))
    def run(): Unit = {
      val q = spark.readStream.format("graft-fhir").load(in)
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    land(fixtures.take(2)); run()
    // restart with two more files: only the new ones are read
    land(fixtures.drop(2)); run()
    // and a third restart with nothing new is a no-op
    run()
    val got = spark.read.parquet(out)
    val want = graft.fhir.BundleReader
      .readFromDirectory(spark, in).entry()
    assert(got.schema == want.schema,
      s"schema drift:\n${got.schema}\nvs\n${want.schema}")
    // bundleUUIDs are minted per read; compare the deterministic columns
    assert(got.drop("bundleUUID").toJSON.collect().sorted.toSeq
      == want.drop("bundleUUID").toJSON.collect().sorted.toSeq,
      "stream rows diverged from the batch read")
    val ids = got.select("bundleUUID").collect().map(_.getString(0))
    assert(ids.length == 4 && ids.distinct.length == 4,
      "a replayed or re-listed file was read twice")
  }

  test("graft-fhir: a legacy full-list checkpoint migrates mid-stream") {
    // pre-r14 checkpoints persisted the FULL sorted file list as the
    // offset. A restart from such a WAL must (a) not re-ingest any file
    // the legacy offset carries, (b) not lose files landed after it, and
    // (c) move the WAL forward in the constant-size epoch form, with the
    // legacy seen set durably migrated into the seen log as epoch 0
    val fixtures = new java.io.File(getClass.getResource("/adt").getPath)
      .listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(fixtures.length == 4)
    val root = java.nio.file.Files.createTempDirectory("graft_fhir_legacy")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def land(fs: Seq[java.io.File]): Unit = fs.foreach(f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(in, f.getName)))
    def run(): Unit = {
      val q = spark.readStream.format("graft-fhir").load(in)
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    land(fixtures.take(2)); run()
    // forge the legacy checkpoint: the seen log's own tagged lines carry
    // the EXACT path strings the source lists, so harvest them first...
    val logDir = new java.io.File(s"$chk/sources/0/graft_seen_files")
    assert(logDir.isDirectory, s"seen log missing at $logDir")
    val seenPaths = logDir.listFiles()
      .filter(f => f.getName.endsWith(".log") || f.getName.endsWith(".compact"))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath)
        .toArray(Array.empty[String]))
      .filter(_.nonEmpty).map(_.split('\t').last).distinct.sorted
    assert(seenPaths.length == 2, s"expected 2 seen files: ${seenPaths.toSeq}")
    // ...then rewrite the last committed WAL offset to the pre-r14 array
    // form and delete the seen log entirely (a legacy checkpoint has none)
    val offsetsDir = new java.io.File(s"$chk/offsets")
    val lastOff = offsetsDir.listFiles()
      .filter(_.getName.matches("\\d+")).maxBy(_.getName.toInt)
    val walLines = new String(
      java.nio.file.Files.readAllBytes(lastOff.toPath)).linesIterator.toSeq
    assert(walLines.last.startsWith("{\"epoch\":"))
    val legacyJson = seenPaths.map(p => "\"" + p + "\"")
      .mkString("[", ",", "]")
    java.nio.file.Files.write(lastOff.toPath,
      (walLines.init :+ legacyJson).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      java.nio.file.Files.delete(f.toPath)
    }
    rmTree(logDir)
    // land two more files and restart from the forged legacy WAL
    land(fixtures.drop(2)); run()
    val got = spark.read.parquet(out)
    assert(got.count() == 4,
      "legacy restart must neither re-ingest nor lose files")
    assert(got.select("bundleUUID").distinct().count() == 4,
      "a file carried by the legacy offset was read twice")
    // the post-restart WAL entry is back in the epoch form
    val newLast = offsetsDir.listFiles()
      .filter(_.getName.matches("\\d+")).maxBy(_.getName.toInt)
    assert(newLast.getName.toInt > lastOff.getName.toInt,
      "restart must have planned a new batch for the landed files")
    val newLine = new String(java.nio.file.Files.readAllBytes(
      newLast.toPath)).linesIterator.toSeq.last
    assert(newLine.matches("""\{"epoch":\d+\}"""),
      s"post-migration offset must be an epoch, got: $newLine")
    // and the legacy seen set is DURABLY in the rebuilt log (either as
    // epoch-0 `.migrated` lines from deserializeOffset, or tagged by the
    // first post-restart advance() if the trigger listed the directory
    // first — both orderings are exactly-once; what must hold is that
    // every legacy path is logged so it can never be re-ingested)
    val rebuilt = new java.io.File(s"$chk/sources/0/graft_seen_files")
      .listFiles()
      .filter(f => f.getName.endsWith(".log") || f.getName.endsWith(".compact")
        || f.getName.endsWith(".migrated"))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath)
        .toArray(Array.empty[String]))
      .filter(_.nonEmpty).map(_.split('\t').last).toSet
    assert(seenPaths.toSet.subsetOf(rebuilt),
      s"legacy files missing from the rebuilt seen log: " +
        s"${seenPaths.toSet -- rebuilt}")
    // a further restart with nothing new re-reads nothing
    run()
    assert(spark.read.parquet(out).count() == 4,
      "an idle restart after migration must be a no-op")
  }

  test("graft-fhir offsets stay constant-size across many batches; seen log compacts") {
    // the unbounded-offset fix: each persisted offset is one epoch
    // number backed by the compacted seen-file log, so offset JSON size
    // must NOT grow with the number of files ever ingested — while every
    // file is still read exactly once across restarts
    val fixture = new java.io.File(getClass.getResource("/adt").getPath)
      .listFiles().filter(_.getName.endsWith(".json")).minBy(_.getName)
    val root = java.nio.file.Files.createTempDirectory("graft_fhir_off")
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def run(): Unit = {
      val q = spark.readStream.format("graft-fhir").load(in)
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val nBatches = 13 // crosses the CompactInterval=10 boundary
    (1 to nBatches).foreach { i =>
      java.nio.file.Files.copy(fixture.toPath,
        java.nio.file.Paths.get(in, f"adt_more_$i%02d.json"))
      run() // restart per landing: every batch goes through the WAL
    }
    // exactly once: one output row per landed file, no dup mint
    val got = spark.read.parquet(out)
    assert(got.count() == nBatches.toLong,
      "each landed file must be read exactly once")
    assert(got.select("bundleUUID").distinct().count() == nBatches.toLong)
    // offset WAL entries are constant-size epochs, not file lists
    val offsetFiles = new java.io.File(s"$chk/offsets")
      .listFiles().filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
    assert(offsetFiles.length >= nBatches)
    val lineSizes = offsetFiles.map { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath))
      val offsetLine = text.linesIterator.toSeq.last
      assert(offsetLine.matches("""\{"epoch":\d+\}"""),
        s"offset must be an epoch, got: $offsetLine")
      offsetLine.length
    }
    // constant-size: the 13th batch's offset is as small as the 1st
    // (the legacy form grew by a full path per landed file)
    assert(lineSizes.max - lineSizes.min <= 2,
      s"offset lines grew across batches: ${lineSizes.mkString(", ")}")
    assert(lineSizes.max < 32)
    // the seen log compacted: after epoch >= 10 there is exactly one
    // compact file and fewer than CompactInterval tail logs
    val logDir = new java.io.File(s"$chk/sources/0/graft_seen_files")
    assert(logDir.isDirectory, s"seen log missing at $logDir")
    val names = logDir.listFiles().map(_.getName)
    assert(names.count(_.endsWith(".compact")) == 1,
      s"expected one compact file, got: ${names.mkString(", ")}")
    assert(names.count(_.endsWith(".log")) <
      graft.sources.SeenFileLog.CompactInterval)
  }
}
