package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Multimodal

/** Multimodal binary-column certification: metadata/digest path has a full
  * oracle; the stub-decoded feature extraction is engine-side (rows-only). */
object MultimodalQ {

  val qM1BinaryMeta = Q(
    "q_m1_binary_meta",
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |       CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS kind,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       md5(text) AS digest
      |FROM documents""".stripMargin) { (s, d) =>
    Multimodal.asMediaTable(documents(s, d), "doc_id", "text")
      .select(
        col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        md5(col("bytes")).as("digest"))
  }

  val qM2Features = Q.rowsOnly("q_m2_media_features") { (s, d) =>
    Multimodal.extractFeatures(
      Multimodal.asMediaTable(documents(s, d), "doc_id", "text")).toDF()
  }

  val all: Seq[Q] = Seq(qM1BinaryMeta, qM2Features)
}
