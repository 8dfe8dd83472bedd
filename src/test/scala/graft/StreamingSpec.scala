package graft

import graft.streaming.StreamOps

/** Structured Streaming smoke: the same session aggregation that the
  * scored batch query runs, executed incrementally from a file source
  * into a memory sink. */
class StreamingSpec extends SparkSpec {

  test("streaming sessionization produces sessions from the file source") {
    val q = StreamOps.sessionizeStream(spark, sf001, "sess_smoke")
    try {
      val n = spark.sql("SELECT count(*) FROM sess_smoke")
        .collect()(0).getLong(0)
      assert(n > 0)
    } finally q.stop()
  }

  test("batch and streaming session counts agree at the session level") {
    val batch = StreamOps.sessionAgg(
      graft.io.Sources.events(spark, sf001)).count()
    val q = StreamOps.sessionizeStream(spark, sf001, "sess_parity")
    try {
      val streamed = spark.sql("SELECT count(*) FROM sess_parity")
        .collect()(0).getLong(0)
      assert(streamed === batch)
    } finally q.stop()
  }
}
