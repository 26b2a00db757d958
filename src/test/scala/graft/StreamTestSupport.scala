package graft

import org.apache.spark.sql.{Encoder, SQLContext}
// The ONLY place the internal MemoryStream package path appears: it is the
// standard test-only source for driving stateful streaming queries, but it
// lives in a private package whose location moves between Spark minor
// versions — a future Spark bump is a single-site fix here.
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object StreamTestSupport {
  type MemStream[A] = MemoryStream[A]

  def memoryStream[A: Encoder](implicit ctx: SQLContext): MemStream[A] =
    MemoryStream[A]
}
