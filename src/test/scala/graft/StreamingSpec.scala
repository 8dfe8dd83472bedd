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

  test("stateful running totals accumulate across incremental batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[StreamOps.Ev](spark)
    val q = StreamOps.runningUserTotals(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("totals").start()
    try {
      input.addData(StreamOps.Ev(1L, 2.0), StreamOps.Ev(1L, 3.0),
        StreamOps.Ev(2L, 1.0))
      q.processAllAvailable()
      input.addData(StreamOps.Ev(1L, 5.0))
      q.processAllAvailable()
      val last = spark.sql(
        """SELECT n, sum_value FROM totals WHERE user_id = 1
          |ORDER BY n DESC LIMIT 1""".stripMargin).collect()(0)
      assert(last.getLong(0) === 3L)      // state carried across batches
      assert(last.getDouble(1) === 10.0)
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
