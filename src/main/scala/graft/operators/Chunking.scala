package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: overlapping token-window
  * chunks (window `chunkTokens`, stride `stride`), as a pure generate+
  * project plan — map-side, shuffle-free, SQL-portable for the oracle. */
object Chunking {

  def chunk(
      docs: DataFrame, id: String, text: String,
      chunkTokens: Int = 32, stride: Int = 16): DataFrame = {
    val t = split(col(text), " ")
    docs
      .select(col(id).as("doc_id"), t.as("t"),
        explode(sequence(lit(0), size(t) - 1, lit(stride))).as("start"))
      .select(
        col("doc_id"),
        expr(s"start div $stride").as("chunk_id"),
        concat_ws(" ", slice(col("t"), col("start") + 1, lit(chunkTokens)))
          .as("chunk"),
        least(lit(chunkTokens), size(col("t")) - col("start"))
          .cast("long").as("n_chunk_tokens"))
  }
}
