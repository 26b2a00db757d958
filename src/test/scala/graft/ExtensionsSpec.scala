package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must hand a pure-SQL
  * client the whole custom-expression surface. The spec builds a second
  * session (same SparkContext) through the config path — no Scala-side
  * `register` call — and pins each function against an independent
  * reference. */
class ExtensionsSpec extends AnyFunSuite {

  /** Reference Morton interleave (bit loop, independent of the
    * shift-and-mask formulation under test). */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("config-driven extensions register the SQL function surface") {
    val base = GraftSpark.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf read off the SparkContext at
    // session build — on a shared test context the string can't be set any
    // more, so replicate Spark's loader exactly: instantiate the configured
    // class name reflectively and hand it to the builder. A cluster sets
    // the same class name in spark-defaults.conf.
    val injector = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(injector)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      assert(s2 ne base, "expected a fresh session for the extensions path")

      val d = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))"
          + " AS d").head.getDouble(0)
      assert(d == 32.0)

      val tg = s2.sql("SELECT graft_trigrams('a b c d') AS t")
        .head.getSeq[String](0)
      assert(tg.toSet == Set("a b c", "b c d"))

      // z-value twin: SQL expression vs the independent bit-loop reference
      // (and thereby vs Layout.zValue2, which NorthStarSpec pins to the
      // same values)
      val zs = s2.sql(
        """SELECT x, y, graft_zvalue2(x, y) AS z
          |FROM VALUES (0, 0), (1, 0), (0, 1), (1, 2), (12345, 54321),
          |            (65535, 65535) AS t(x, y)""".stripMargin).collect()
      assert(zs.nonEmpty)
      zs.foreach { r =>
        val (x, y, z) = (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2))
        assert(z == mortonRef(x, y), s"zvalue2($x, $y)")
      }

      // the aggregate sketch resolves through SQL GROUP BY and matches the
      // row-level signature over the same hash set
      val agg = s2.sql(
        """SELECT graft_minhash(h) AS sig
          |FROM VALUES (CAST(7 AS BIGINT)), (11), (13) AS t(h)""".stripMargin)
        .head.getSeq[Long](0)
      val row = s2.sql(
        "SELECT graft_minhash_row(array(CAST(7 AS BIGINT), 11, 13)) AS sig")
        .head.getSeq[Long](0)
      assert(agg == row,
        "aggregate and row-level MinHash must be bit-identical")

      val wp = s2.sql(
        "SELECT graft_wordpiece('abc xy', array('ab', 'c', 'x'), 4) AS p")
        .head.getSeq[String](0)
      assert(wp == Seq("ab", "c", "x", "[UNK]"), wp)

      // Hilbert twin: the SQL surface resolves, casts INT coordinates,
      // propagates null, and matches the direct static loop
      val hs = s2.sql(
        """SELECT x, y, z, graft_hilbert(12, x, y, z) AS h
          |FROM VALUES (0, 0, 0), (1, 2, 3), (4095, 17, 1234)
          |  AS t(x, y, z)""".stripMargin).collect()
      hs.foreach { r =>
        val ref = graft.functions.HilbertCurve.index(
          Array(r.getInt(0).toLong, r.getInt(1).toLong, r.getInt(2).toLong),
          12)
        assert(r.getLong(3) == ref, s"graft_hilbert row $r")
      }
      assert(s2.sql(
        "SELECT graft_hilbert(8, CAST(NULL AS BIGINT), CAST(3 AS BIGINT))")
        .head.isNullAt(0), "null coordinate must yield null index")

      val sh = s2.sql(
        """SELECT graft_simhash(h) AS sig
          |FROM VALUES (CAST(7 AS BIGINT)), (11), (13) AS t(h)""".stripMargin)
        .head.getLong(0)
      // one row → simhash equals that row's own hash contribution pattern;
      // just pin determinism against a second evaluation
      val sh2 = s2.sql(
        """SELECT graft_simhash(h) AS sig
          |FROM VALUES (CAST(7 AS BIGINT)), (11), (13) AS t(h)""".stripMargin)
        .head.getLong(0)
      assert(sh == sh2)

      // KMV through pure SQL: k smallest DISTINCT hashes in unsigned
      // order — the duplicate collapses, -1 (unsigned max) ranks last
      val kmv = s2.sql(
        """SELECT graft_kmv(h, 3) AS a
          |FROM VALUES (CAST(7 AS BIGINT)), (11), (7), (-1), (3) AS t(h)"""
          .stripMargin).head.getSeq[Long](0)
      assert(kmv == Seq(3L, 7L, 11L), s"got $kmv")

      // URL family: the SQL names must produce exactly the Column results
      // (one definition via the Column<->Expression bridge)
      val u = s2.sql(
        """SELECT graft_canonical_url(
          |         '  HTTP://U:p@WWW.Foo.COM:80/A/B?b=2&utm_source=x&a=1#f') AS c,
          |       graft_url_host('https://U:p@A.Site.CO.UK:8443/x') AS h,
          |       graft_registered_domain('a.b.site.co.uk') AS d,
          |       graft_canonical_url('nope') AS n""".stripMargin).head
      assert(u.getString(0) == "http://u:p@www.foo.com/A/B?a=1&b=2")
      assert(u.getString(1) == "a.site.co.uk")
      assert(u.getString(2) == "site.co.uk")
      assert(u.isNullAt(3))

      // perceptual hashes through pure SQL: same values as the Scala
      // kernels, null on junk
      {
        import s2.implicits._
        val png = graft.operators.Multimodal.syntheticMirrorImages(
          Seq((7L, 7L, 0)).toDF("media_id", "content_id", "mirror"))
          .collect().head.getAs[Array[Byte]]("bytes")
        Seq((png, Array.fill[Byte](16)(0x3C)))
          .toDF("good", "junk").createOrReplaceTempView("graft_hash_in")
        val r = s2.sql(
          """SELECT graft_image_phash(good), graft_image_dhash(good),
            |       graft_image_phash(junk), graft_audio_fingerprint(junk),
            |       graft_video_temporal_hash(junk)
            |FROM graft_hash_in""".stripMargin).head
        assert(r.getLong(0) ==
          graft.operators.Multimodal.imagePHash(png).get)
        assert(r.getLong(1) ==
          graft.operators.Multimodal.imageDHash(png).get)
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
      // no s2.stop(): the SparkContext is shared with every other suite
    }
  }
}
