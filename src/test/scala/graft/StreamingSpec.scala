package graft

import org.apache.spark.sql.functions.{col, count, lit, unix_millis, window}
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

  test("streaming ANN serving answers each query batch same as batch ADC") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.VectorSearch
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cent = VectorSearch.pqTrain(emb).persist()
    val codes = VectorSearch.pqEncode(emb, cent).persist()
    val queries = emb.where(col("vec_id") % 100 === 0)
      .as[(Long, Array[Float])].collect()
    assert(queries.length >= 2)
    val (b1, b2) = queries.splitAt(queries.length / 2)
    val input = MemoryStream[(Long, Array[Float])](spark)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    val q = StreamOps.annServeStream(
        input.toDS().toDF("vec_id", "embedding"), cent, codes, 3) { out =>
      got.synchronized {
        got ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
    }
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val batch = VectorSearch.pqAdcTopK(
          emb.where(col("vec_id") % 100 === 0), cent, codes, 3)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // every arriving query answered exactly once, bit-identical to
      // the batch ADC over the same query set (read under the same
      // lock the sink writes under — visibility must not depend on
      // processAllAvailable's internal synchronization)
      got.synchronized {
        assert(got.toSet === batch)
        assert(got.size === batch.size)
      }
    } finally { q.stop(); cent.unpersist(); codes.unpersist() }
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

  test("watermarked tumbling agg drops rows later than the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val input = MemoryStream[(Timestamp, Long)](spark)
    val q = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("ws"), col("n"))
      .writeStream.outputMode("update")
      .format("memory").queryName("wm_agg").start()
    def t(min: Long) = new Timestamp(min * 60000L)
    try {
      // batch 1 advances event time to 120 min → watermark 110 min
      input.addData((t(60), 1L), (t(65), 2L), (t(120), 3L))
      q.processAllAvailable()
      // batch 2: a row at 30 min is BEYOND the watermark (30 < 110)
      // and must be dropped; 115 min is late-but-allowed and counts
      input.addData((t(30), 4L), (t(115), 5L))
      q.processAllAvailable()
      val got = spark.sql(
        """SELECT ws, max(n) AS n FROM wm_agg GROUP BY 1 ORDER BY 1""")
        .collect().map(r => r.getLong(0) / 60000L -> r.getLong(1)).toMap
      // [60,120): 60 + 65 from batch 1, plus 115 — out-of-order
      // (arrives after the 120-min row) but ABOVE the 110-min
      // watermark, so it still counts
      assert(got(60L) == 3L)
      assert(got(120L) == 1L)   // [120,180): the 120-min row only
      // the 30-min row is beyond the watermark: its [0,60) window
      // never materializes — THE drop the watermark promises
      assert(!got.contains(0L))
    } finally q.stop()
  }

  test("fixed-point running totals: incremental stream lands on the " +
      "batch aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[StreamOps.EvFx](spark)
    val q = StreamOps.runningUserTotalsFx(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("totals_fx").start()
    try {
      input.addData(StreamOps.EvFx(1L, 250L), StreamOps.EvFx(1L, 75L),
        StreamOps.EvFx(2L, 199L))
      q.processAllAvailable()
      input.addData(StreamOps.EvFx(1L, 1L), StreamOps.EvFx(2L, 1L))
      q.processAllAvailable()
      val got = spark.sql(
        """SELECT user_id, max(n) AS n, max(sum_value_c) AS s
          |FROM totals_fx GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === Seq((1L, 3L, 326L), (2L, 2L, 200L)))
    } finally q.stop()
  }

  test("ingest gate: bootstrapped state classifies across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamOps.{DocSig, SigSeen, IngestVerdict}
    // base corpus knows sig "a" (first doc 100)
    val base = Seq(SigSeen("a", 100L, from_base = true)).toDS()
    val input = MemoryStream[DocSig](spark)
    val q = StreamOps.ingestDedupGate(input.toDS(), base)
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest").start()
    try {
      // batch 1: a dup-of-base, a new sig (7 claims "b")
      input.addData(DocSig(7L, "b"), DocSig(3L, "a"))
      q.processAllAvailable()
      // batch 2: "b" again (dup_in_batch of 7 — state crossed the
      // micro-batch boundary), "a" again, and a fresh "c"
      input.addData(DocSig(12L, "b"), DocSig(15L, "a"), DocSig(20L, "c"))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM ingest").as[IngestVerdict]
        .collect().map(v => v.doc_id -> ((v.status, v.dup_of))).toMap
      assert(got === Map(
        3L -> ("dup_of_base", 100L), 7L -> ("new", -1L),
        12L -> ("dup_in_batch", 7L), 15L -> ("dup_of_base", 100L),
        20L -> ("new", -1L)))
    } finally q.stop()
  }

  test("ingest gate survives a checkpoint restart: no loss, no dupes") {
    // The deployment property the stream==batch equivalences don't
    // cover: kill the gate between micro-batches, restart from the
    // file checkpoint, and the final table must equal the batch twin.
    // Three runs over one source dir + one checkpoint: run 1 claims
    // sigs, run 2 (new files only visible after restart) classifies
    // dups of run-1 claims — provable ONLY if the
    // flatMapGroupsWithState state was recovered from the checkpoint,
    // since run 2's input alone never saw those claims (and
    // initialState is applied only on a fresh start, so recovery is
    // what carries it) — and run 3 restarts with nothing pending to
    // prove the sink's exactly-once commit log admits no replays.
    import spark.implicits._
    import StreamOps.{DocSig, SigSeen, IngestVerdict}
    import java.io.File
    val tmp = java.nio.file.Files.createTempDirectory("gate_ckpt").toFile
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val outDir = new File(tmp, "out").getAbsolutePath
    val ckptDir = new File(tmp, "ckpt").getAbsolutePath
    val base = Seq(SigSeen("a", 100L, from_base = true)).toDS()
    val schema = org.apache.spark.sql.Encoders.product[DocSig].schema

    def addFile(tag: String, docs: Seq[DocSig]): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      docs.toDS().coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val incoming = spark.readStream.schema(schema)
        .parquet(srcDir.getAbsolutePath).as[DocSig]
      val q = StreamOps.ingestDedupGate(incoming, base)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    val batch1 = Seq(DocSig(7L, "b"), DocSig(3L, "a"))
    val batch2 = Seq(DocSig(12L, "b"), DocSig(15L, "a"), DocSig(20L, "c"))
    addFile("f1", batch1)
    runOnce() // run 1: 7 claims "b", 3 is dup_of_base
    addFile("f2", batch2)
    runOnce() // run 2: restart — 12 must resolve against RECOVERED state
    runOnce() // run 3: restart with nothing pending — must add nothing

    val got = spark.read.parquet(outDir).as[IngestVerdict].collect()
    assert(got.length == 5, s"loss or dupes: ${got.toSeq}") // 5 docs in, 5 verdicts out
    val gotMap = got.map(v => v.doc_id -> ((v.status, v.dup_of))).toMap
    // equals the batch twin over the full input
    val batchTwin = StreamOps.ingestDedupGate((batch1 ++ batch2).toDS(), base)
      .collect().map(v => v.doc_id -> ((v.status, v.dup_of))).toMap
    assert(gotMap === batchTwin)
    assert(gotMap(12L) === (("dup_in_batch", 7L))) // the recovered-state proof
  }

  test("foreachBatch idempotent sink survives a forced batch " +
    "redelivery without duplicates") {
    // Crash window: offsets/N written, commits/N not — on restart
    // Spark REDELIVERS batch N with the SAME batchId. The
    // (batchId, overwrite-partition) sink must absorb the replay.
    import spark.implicits._
    import java.io.File
    val tmp = java.nio.file.Files.createTempDirectory("fb_sink").toFile
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val outDir = new File(tmp, "out").getAbsolutePath
    val ckptDir = new File(tmp, "ckpt")
    def addFile(tag: String, rows: Seq[(Long, String)]): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      rows.toDF("id", "v").coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType))))
        .parquet(srcDir.getAbsolutePath)
      val q = StreamOps.idempotentBatchSink(in, outDir,
        ckptDir.getAbsolutePath)
      try q.processAllAvailable() finally q.stop()
    }
    addFile("f1", Seq((1L, "a"), (2L, "b")))
    runOnce()
    // simulate the crash window: drop the newest commit marker so the
    // restart redelivers the batch under the same id
    val commits = new File(ckptDir, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val last = commits.last
    assert(last.delete())
    // the local-FS checksum sidecar must go too, or the re-commit's
    // rename fails on the stale .crc
    val crc = new File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    runOnce() // redelivery — must overwrite, not append
    addFile("f2", Seq((3L, "c")))
    runOnce()
    val got = spark.read.parquet(outDir).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"redelivery duplicated or lost rows: $got")
  }

  test("stateful gate through the idempotent sink: kill, redeliver, " +
    "restart — exactly-once end to end") {
    // The COMPOSITION the two halves prove separately: the
    // flatMapGroupsWithState dedup gate (state recovered from the
    // checkpoint) writing through the (batchId, overwrite-partition)
    // foreachBatch sink (redelivery absorbed). Kill between
    // micro-batches AND force a redelivery by dropping the newest
    // commit marker: the external table must equal the batch twin —
    // no lost verdicts, no duplicated ones, recovered state intact.
    import spark.implicits._
    import StreamOps.{DocSig, SigSeen, IngestVerdict}
    import java.io.File
    val tmp = java.nio.file.Files.createTempDirectory("gate_e2e").toFile
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val outDir = new File(tmp, "out").getAbsolutePath
    val ckptDir = new File(tmp, "ckpt")
    val base = Seq(SigSeen("a", 100L, from_base = true)).toDS()
    val schema = org.apache.spark.sql.Encoders.product[DocSig].schema
    def addFile(tag: String, docs: Seq[DocSig]): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      docs.toDS().coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val incoming = spark.readStream.schema(schema)
        .parquet(srcDir.getAbsolutePath).as[DocSig]
      val q = StreamOps.idempotentBatchSink(
        StreamOps.ingestDedupGate(incoming, base).toDF(),
        outDir, ckptDir.getAbsolutePath)
      try q.processAllAvailable() finally q.stop()
    }
    val batch1 = Seq(DocSig(7L, "b"), DocSig(3L, "a"))
    val batch2 = Seq(DocSig(12L, "b"), DocSig(15L, "a"), DocSig(20L, "c"))
    addFile("f1", batch1)
    runOnce() // run 1: 7 claims "b"
    // crash window: offsets written, commit marker gone → run 2
    // REDELIVERS the last batch under the same batchId, then
    // processes f2 against RECOVERED state
    val commits = new File(ckptDir, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val last = commits.last
    assert(last.delete())
    val crc = new File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    addFile("f2", batch2)
    runOnce() // redelivery + new data, one restart
    runOnce() // idle restart: must add nothing

    val got = spark.read.parquet(outDir)
      .select(col("doc_id"), col("status"), col("dup_of"))
      .as[IngestVerdict].collect()
    assert(got.length == 5, s"loss or dupes: ${got.toSeq}")
    val gotMap = got.map(v => v.doc_id -> ((v.status, v.dup_of))).toMap
    val batchTwin = StreamOps
      .ingestDedupGate((batch1 ++ batch2).toDS(), base)
      .collect().map(v => v.doc_id -> ((v.status, v.dup_of))).toMap
    assert(gotMap === batchTwin)
    assert(gotMap(12L) === (("dup_in_batch", 7L))) // recovered state
  }

  test("streaming MV upkeep lands on the batch stratum summary") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamOps.{DocMeta, StratumSummary}
    val docs = Seq(
      DocMeta("web", "en", 10L, "alpha beta"),
      DocMeta("web", "en", 7L, "gamma"),
      DocMeta("web", "de", 4L, "delta"),
      DocMeta("book", "en", 12L, "epsilon zeta"),
      DocMeta("web", "en", 3L, "eta"))
    val input = MemoryStream[DocMeta](spark)
    val q = StreamOps.runningSummary(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("mvstream").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      // last emission per stratum = the running state
      val got = spark.sql("SELECT * FROM mvstream").as[StratumSummary]
        .collect().groupBy(s => (s.source, s.lang))
        .map { case (k, rows) => k -> rows.maxBy(_.n_docs) }
      // batch ground truth through the Column-side hash — also
      // re-proves the JVM/Column hash twins compose identically
      import graft.core.PortableHash
      val batch = docs.toDF()
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.sum(col("n_chars")).as("n_chars"),
          org.apache.spark.sql.functions.sum(
            PortableHash.spread(PortableHash.h(col("text"))))
            .as("text_hash_sum"))
        .as[StratumSummary].collect()
        .map(s => (s.source, s.lang) -> s).toMap
      assert(got.keySet === batch.keySet)
      got.foreach { case (k, s) =>
        assert((s.n_docs, s.n_chars, s.text_hash_sum) ===
          ((batch(k).n_docs, batch(k).n_chars, batch(k).text_hash_sum)), k)
      }
    } finally q.stop()
  }

  test("stream-stream banded join equals its batch twin across micro-batches") {
    // both feeds arrive incrementally and OUT OF STEP (a click's
    // purchase lands two micro-batches later) — the state buffering
    // is what bridges them; batch-mode execution of the same op is
    // the ground truth.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val clicks = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(90)), (2L, 12L, ts(5)))
    val purchases = Seq(
      (1L, 100L, ts(30)),  // joins click 10 (within 1h)
      (1L, 101L, ts(95)),  // joins click 11 only (click 10 is >1h old)
      (2L, 102L, ts(70)),  // outside click 12's band — no match
      (3L, 103L, ts(10)))  // no click for user 3
    val ci = MemoryStream[(Long, Long, Timestamp)](spark)
    val pi = MemoryStream[(Long, Long, Timestamp)](spark)
    val joined = StreamOps.touchJoinStream(
      ci.toDF().toDF("user_id", "click_id", "cts"),
      pi.toDF().toDF("user_id", "purchase_id", "pts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin").start()
    try {
      ci.addData(clicks(0), clicks(2)) // batch 1: early clicks only
      q.processAllAvailable()
      pi.addData(purchases(0), purchases(3)) // batch 2: purchases arrive later
      q.processAllAvailable()
      ci.addData(clicks(1)) // batch 3: the late click...
      pi.addData(purchases(1), purchases(2)) // ...and its purchase together
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = StreamOps.touchJoinStream(
          clicks.toDF("user_id", "click_id", "cts"),
          purchases.toDF("user_id", "purchase_id", "pts"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === batch)
      assert(got === Set((1L, 10L, 100L), (1L, 11L, 101L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits the null side only after " +
    "the watermark proves no match can arrive") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ci = MemoryStream[(Long, Long, Timestamp)](spark)
    val pi = MemoryStream[(Long, Long, Timestamp)](spark)
    val joined = StreamOps.touchJoinLeftOuter(
      ci.toDF().toDF("user_id", "click_id", "cts"),
      pi.toDF().toDF("user_id", "purchase_id", "pts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssleft").start()
    try {
      // click 10 matches; click 12 never will
      ci.addData((1L, 10L, ts(0)), (2L, 12L, ts(5)))
      pi.addData((1L, 100L, ts(30)))
      q.processAllAvailable()
      val early = spark.sql("SELECT click_id, purchase_id FROM ssleft")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // the match emits promptly; the non-match must NOT have emitted
      // yet — its watermark hasn't proven absence
      assert(early == Set((10L, 100L)))
      // sentinel rows 10h later push BOTH watermarks past the band
      ci.addData((9L, 90L, ts(600)))
      pi.addData((9L, 900L, ts(600)))
      q.processAllAvailable()
      q.processAllAvailable() // extra no-data batch flushes expired state
      val late = spark.sql("SELECT click_id, purchase_id FROM ssleft")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(late.contains((12L, -1L)),
        s"abandoned click must surface with NULL purchase, got $late")
      assert(!late.contains((12L, 100L)))
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join defers BOTH null sides until " +
    "their watermarks prove absence") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ci = MemoryStream[(Long, Long, Timestamp)](spark)
    val pi = MemoryStream[(Long, Long, Timestamp)](spark)
    val joined = StreamOps.touchJoinFullOuter(
      ci.toDF().toDF("user_id", "click_id", "cts"),
      pi.toDF().toDF("user_id", "purchase_id", "pts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssfull").start()
    def rows() = spark.sql("SELECT click_id, purchase_id FROM ssfull")
      .collect().map(r => (
        if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    try {
      // click 10 matches purchase 100; click 12 never converts;
      // purchase 300 (user 3) has no prior click — the orphan side
      // only a FULL outer join can emit
      ci.addData((1L, 10L, ts(0)), (2L, 12L, ts(5)))
      pi.addData((1L, 100L, ts(30)), (3L, 300L, ts(10)))
      q.processAllAvailable()
      // only the match emits promptly; neither null side may have
      // surfaced before its watermark proves absence
      assert(rows() == Set((10L, 100L)))
      // sentinels 10h later push both watermarks past the band
      ci.addData((9L, 90L, ts(600)))
      pi.addData((9L, 900L, ts(600)))
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch flushes expired state
      val late = rows()
      assert(late.contains((12L, -1L)),
        s"abandoned click must surface, got $late")
      assert(late.contains((-1L, 300L)),
        s"orphan purchase must surface, got $late")
      assert(!late.contains((12L, 100L)) && !late.contains((10L, 300L)))
    } finally q.stop()
  }

  test("event-time timer closes an idle session WITHOUT another event") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val input = MemoryStream[StreamOps.TimerEv](spark)
    val q = StreamOps.timerSessions(input.toDS().toDF("user_id", "ts")
        .as[StreamOps.TimerEv], gapMs = 1800000L)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("twstimer").start()
    def rows() = spark.sql(
      "SELECT user_id, start_ms, end_ms, n_events FROM twstimer")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    try {
      // user 1 has a 2-event run then goes idle forever
      input.addData(StreamOps.TimerEv(1L, ts(0)),
        StreamOps.TimerEv(1L, ts(5)))
      q.processAllAvailable()
      assert(rows().isEmpty) // run still open, no next event — and none coming
      // ANOTHER user's much-later event advances the watermark past
      // user 1's (last + gap) timer: the idle session must surface
      // via handleExpiredTimer, no user-1 event involved
      input.addData(StreamOps.TimerEv(9L, ts(600)))
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch fires expired timers
      val got = rows()
      assert(got.contains((1L,
        1700000000000L, 1700000000000L + 5 * 60000L, 2L)), got.toString)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState clamped ledger: incremental batches land " +
    "on the batch fold") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // transformWithState needs per-state column families — RocksDB
    // provider only (the HDFS-backed default rejects it)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val input = MemoryStream[StreamOps.EvLedger](spark)
    val q = StreamOps.clampedLedgerStream(input.toDS())
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("twsledger").start()
    // user 1: +500, -800 (clamp), +300; user 2: +200, -100 — split
    // across two event-time-ordered batches (out of order WITHIN a
    // batch to exercise the per-batch sort)
    val evs = Seq(
      StreamOps.EvLedger(1L, 11L, 1000L, 500L),
      StreamOps.EvLedger(1L, 12L, 2000L, -800L),
      StreamOps.EvLedger(2L, 21L, 1500L, 200L),
      StreamOps.EvLedger(1L, 13L, 3000L, 300L),
      StreamOps.EvLedger(2L, 22L, 2500L, -100L))
    try {
      input.addData(evs(1), evs(0), evs(2)) // batch 1, shuffled
      q.processAllAvailable()
      input.addData(evs(4), evs(3))         // batch 2
      q.processAllAvailable()
      val last = spark.sql(
        """SELECT user_id, n_events, final_balance_c, n_clamped FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id
          |    ORDER BY n_events DESC) AS rn FROM twsledger)
          |WHERE rn = 1""".stripMargin)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // the exact batch fold: u1 500→clamp(0)→300; u2 200→100
      assert(last(1L) === ((3L, 300L, 1L)))
      assert(last(2L) === ((2L, 100L, 0L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming latest-version state equals the batch q_cdc_latest order") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[StreamOps.EvV](spark)
    val q = StreamOps.latestVersions(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("latest").start()
    try {
      // batch 1: two versions for key 1 (later ts wins), one for key 2
      input.addData(
        StreamOps.EvV(1L, 10L, "click", 1000L),
        StreamOps.EvV(1L, 11L, "view", 3000L),
        StreamOps.EvV(2L, 20L, "signup", 500L))
      q.processAllAvailable()
      // batch 2: an OLDER event for key 1 must NOT displace the state;
      //          a same-ts higher-id event for key 2 MUST (id tiebreak)
      input.addData(
        StreamOps.EvV(1L, 12L, "error", 2000L),
        StreamOps.EvV(2L, 21L, "purchase", 500L))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, event_id, event_type, ts_ms, n_events
          |FROM latest ORDER BY user_id, n_events DESC""".stripMargin)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.head).toMap
      assert(rows(1L).getLong(1) == 11L && rows(1L).getLong(4) == 3L)
      assert(rows(1L).getString(2) == "view" && rows(1L).getLong(3) == 3000L)
      assert(rows(2L).getLong(1) == 21L && rows(2L).getLong(4) == 2L)
    } finally q.stop()
  }

  test("streaming SCD2 closes versions incrementally, equal to the " +
    "batch build's closed rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[StreamOps.EvS](spark)
    val q = StreamOps.scd2Versions(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2").start()
    try {
      // batch 1: key 1 opens A, no-op A repeat, changes to B (closes
      // v1); key 2 opens X
      input.addData(
        StreamOps.EvS(1L, 10L, "A", 1000L),
        StreamOps.EvS(1L, 11L, "A", 2000L),
        StreamOps.EvS(1L, 12L, "B", 3000L),
        StreamOps.EvS(2L, 20L, "X", 500L))
      q.processAllAvailable()
      val afterB1 = spark.table("scd2").as[StreamOps.Scd2Row].collect()
      assert(afterB1.toSet == Set(
        StreamOps.Scd2Row(1L, 1L, "A", 1000L, 3000L)))
      // batch 2: key 1 changes to C (closes v2, which OPENED in the
      // previous batch — state carried across); key 2 no-ops
      input.addData(
        StreamOps.EvS(1L, 13L, "C", 5000L),
        StreamOps.EvS(2L, 21L, "X", 900L))
      q.processAllAvailable()
      val streamed = spark.table("scd2").as[StreamOps.Scd2Row]
        .collect().toSet
      assert(streamed == Set(
        StreamOps.Scd2Row(1L, 1L, "A", 1000L, 3000L),
        StreamOps.Scd2Row(1L, 2L, "B", 3000L, 5000L)))
      // batch twin over the SAME rows: closed versions must agree
      val batch = StreamOps.scd2Versions(Seq(
        StreamOps.EvS(1L, 10L, "A", 1000L),
        StreamOps.EvS(1L, 11L, "A", 2000L),
        StreamOps.EvS(1L, 12L, "B", 3000L),
        StreamOps.EvS(2L, 20L, "X", 500L),
        StreamOps.EvS(1L, 13L, "C", 5000L),
        StreamOps.EvS(2L, 21L, "X", 900L)).toDS()).collect().toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("rate source feeds the shared session aggregation") {
    val q = StreamOps.sessionAgg(StreamOps.rateEvents(spark, 500))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rate_sessions").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1200) // let the rate source emit at least one batch
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM rate_sessions")
        .collect()(0).getLong(0)
      assert(n > 0, "rate-sourced sessions should exist")
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence, drops in-watermark repeats") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val docs = input.toDF().toDF("ts", "doc_id", "sig")
    val q = StreamOps.dedupStream(docs, "ts", Seq("sig"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((t(0), 1L, "a"), (t(1), 2L, "a"), (t(2), 3L, "b"))
      q.processAllAvailable()
      // a repeat in a LATER batch, still inside the watermark horizon
      input.addData((t(3), 4L, "a"), (t(4), 5L, "c"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT sig, doc_id FROM dedup_stream")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.keySet === Set("a", "b", "c"))
      assert(rows("a") === 1L) // first occurrence won, 2 and 4 dropped
    } finally q.stop()
  }

  test("streaming minhash minima equal the batch minima across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Dedup
    // the batch transform IS the streaming transform: band minima are
    // algebraic (min), so the built-in streaming aggregation maintains
    // per-doc signatures incrementally — no custom state operator
    val input = MemoryStream[(Long, String)](spark)
    val q = Dedup.minhashBandMins(input.toDF().toDF("doc_id", "shingle"))
      .writeStream.outputMode("update")
      .format("memory").queryName("mh_stream").start()
    try {
      val batch1 = Seq((1L, "alpha beta gamma"), (1L, "beta gamma delta"),
        (2L, "zeta eta theta"))
      val batch2 = Seq((1L, "gamma delta epsilon"), (2L, "eta theta iota"))
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      // update mode re-emits rows as minima tighten; min over the sink
      // rows per (doc_id, band) is the final value
      val streamed = spark.sql(
        "SELECT doc_id, b, min(mh) FROM mh_stream GROUP BY 1, 2")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Dedup.minhashBandMins(
          (batch1 ++ batch2).toDF("doc_id", "shingle"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("whole-doc band minima are bit-identical to the groupBy minima") {
    import spark.implicits._
    import graft.ext.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "totally different words in this third document"),
      (4L, "too short")) // < 3 words after split: emits nothing
      .toDF("doc_id", "text")
    val whole = StreamOps.bandMinsWholeDoc(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val grouped = Dedup.minhashBandMins(Dedup.shingles(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole === grouped)
    assert(!whole.keys.exists(_._1 == 4L))
  }

  test("streaming near-dup gate equals its batch twin on the same slice") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Dedup
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy cat"),
      (12L, "completely unrelated corpus text lives right here today"))
      .toDF("doc_id", "text")
    val corpusMins = Dedup.minhashBandMins(Dedup.shingles(corpus))
    val incoming = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // ~10, 11
      (101L, "nothing in common with anything stored before now"),
      (10L, "the quick brown fox jumps over the lazy dog")) // self: dropped
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.nearDupGate(
        input.toDF().toDF("doc_id", "text"), corpusMins)
      .writeStream.outputMode("complete")
      .format("memory").queryName("gate_stream").start()
    try {
      input.addData(incoming.take(2): _*); q.processAllAvailable()
      input.addData(incoming.drop(2): _*); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, corpus_doc, bands FROM gate_stream")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = StreamOps.nearDupGate(
          incoming.toDF("doc_id", "text"), corpusMins)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(!streamed.keys.map(_._1).toSet.contains(101L)) // no match
      assert(!streamed.contains((10L, 10L)))                // self dropped
      assert(streamed.contains((10L, 11L)))  // near-dup of ANOTHER corpus doc
      assert(streamed((100L, 10L)) === Dedup.Bands.toLong)  // exact text match
    } finally q.stop()
  }

  test("chunked stateful band minima equal the batch minima over chunk union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Dedup
    val b1 = Seq(StreamOps.DocChunk(1L, "alpha beta gamma delta"),
      StreamOps.DocChunk(2L, "one two three four five"))
    val b2 = Seq(StreamOps.DocChunk(1L, "gamma delta epsilon zeta"),
      StreamOps.DocChunk(2L, "no"), // < 3 words: no contribution
      StreamOps.DocChunk(3L, "fresh doc arriving in the second batch"))
    val input = MemoryStream[StreamOps.DocChunk](spark)
    val q = StreamOps.runningBandMins(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("chunk_mins").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // minima only tighten, so the final value per (doc, band) is the
      // min over every update-mode emission
      val streamed = spark.sql(
        """SELECT doc_id, b, min(mh) FROM (
          |  SELECT doc_id, posexplode(mins) AS (b, mh) FROM chunk_mins
          |) GROUP BY 1, 2""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
      // batch twin: chunk-local shingles unioned per doc through the
      // SAME groupBy minima the corpus chain uses
      val batch = Dedup.minhashBandMins(Dedup.shingles(
          (b1 ++ b2).map(c => (c.doc_id, c.chunk)).toDF("doc_id", "text")))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermark drops events later than the threshold in append mode") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val q = StreamOps.tumblingCounts(
        input.toDF().toDF("ts", "event_type", "value"),
        width = "1 hour", watermark = "2 hours")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName("wm").start()
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    try {
      // batch 1: events in hours 1 and 2 -> watermark advances to 00:30
      input.addData((t(1), "a", 1.0), (t(2), "a", 1.0))
      q.processAllAvailable()
      // batch 2: push max event time to hour 8 -> watermark 06:30;
      // windows [1:00,2:00) and [2:00,3:00) close and emit
      input.addData((t(8), "a", 1.0))
      q.processAllAvailable()
      // batch 3: a straggler at hour 1, far behind the 06:30 watermark
      input.addData((t(1), "a", 99.0))
      q.processAllAvailable()
      input.addData((t(12), "a", 1.0))  // close hour-8 window too
      q.processAllAvailable()
      val counts = spark.sql("SELECT ws, n FROM wm ORDER BY ws").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      // the late hour-1 event was DROPPED: its closed window stays n=1
      assert(counts("2024-01-01 01:00:00.0") === 1L)
      assert(counts("2024-01-01 02:00:00.0") === 1L)
      assert(counts("2024-01-01 08:00:00.0") === 1L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits only closed sessions, keeps the open one") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[StreamOps.Ev2](spark)
    val q = StreamOps.closedSessions(input.toDS(), gapMs = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("closed_sessions").start()
    try {
      // session A: t=0,500; then a gap > 1000 starts session B at t=5000
      input.addData(StreamOps.Ev2(1L, 0L), StreamOps.Ev2(1L, 500L),
        StreamOps.Ev2(1L, 5000L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT start_ms, end_ms, n_events FROM closed_sessions").collect()
      assert(rows.length === 1)            // only session A closed
      assert(rows(0).getLong(0) === 0L && rows(0).getLong(1) === 500L
        && rows(0).getLong(2) === 2L)
      // next batch closes session B by starting session C
      input.addData(StreamOps.Ev2(1L, 9000L))
      q.processAllAvailable()
      val all = spark.sql(
        "SELECT count(*) FROM closed_sessions").collect()(0).getLong(0)
      assert(all === 2L)                   // A and B closed, C still open
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

  test("streaming ANN ingest: batchId-keyed index upkeep absorbs a " +
    "forced redelivery, served tables stay duplicate-free") {
    import java.io.File
    import graft.ext.{AnnIndex, VectorSearch}
    val tmp = java.nio.file.Files.createTempDirectory("ann_stream").toFile
    val ixDir = new File(tmp, "ix").getAbsolutePath
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val ckptDir = new File(tmp, "ckpt")
    val embAll = spark.read.parquet(s"$sf001/embeddings.parquet")
    val base = embAll.where(col("vec_id") % 10 =!= 9)
      .select(col("vec_id"), col("embedding"))
    AnnIndex.save(base,
      VectorSearch.labelCentroids(embAll.where(col("vec_id") % 10 =!= 9))
        .select(col("label").cast("long").as("cell_id"), col("centroid")),
      ixDir)
    val delta = embAll.where(col("vec_id") % 10 === 9)
      .select(col("vec_id"), col("embedding"))
    val half1 = delta.where(col("vec_id") % 20 === 9)
    val half2 = delta.where(col("vec_id") % 20 =!= 9)
    def addFile(tag: String,
                rows: org.apache.spark.sql.DataFrame): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      rows.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val in = spark.readStream.schema(delta.schema)
        .parquet(srcDir.getAbsolutePath)
      val q = AnnIndex.streamAppend(in, ixDir, ckptDir.getAbsolutePath)
      try q.processAllAvailable() finally q.stop()
    }
    addFile("f1", half1)
    runOnce()
    // crash window: drop the newest commit marker → the restart
    // REDELIVERS the batch under the same batchId; the overwrite-keyed
    // delta dirs must absorb it
    val commits = new File(ckptDir, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val last = commits.last
    assert(last.delete())
    val crc = new File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    addFile("f2", half2)
    runOnce() // redelivery + the second batch
    val ix = AnnIndex.load(spark, ixDir)
    val nBase = base.count(); val nDelta = delta.count()
    // exactly-once: every vector once in the inverted lists …
    assert(ix.codes.count() === nBase + nDelta)
    assert(ix.codes.select(col("vec_id")).distinct().count()
      === nBase + nDelta)
    // … and once per PQ subspace in the code table
    assert(ix.pqCodes.count() === (nBase + nDelta) *
      VectorSearch.PqSubspaces)
    // the served stack sees arriving vectors without any rebuild
    val dq = delta.limit(2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    assert(AnnIndex.ivfPqTopK(ix, dq, "qid", "qvec",
      k = 3, nProbe = 2, shortlistK = 10).count() > 0)
    // a zero-row micro-batch (a newly arrived empty file) must be a
    // no-op: no _SUCCESS-only delta dir, and load() keeps serving
    AnnIndex.appendBatch(delta.limit(0), ixDir, 99L)
    assert(!new File(s"$ixDir/delta_codes/batch=99").exists(),
      "empty batch must not write a delta dir")
    assert(AnnIndex.load(spark, ixDir).codes.count() === nBase + nDelta)
  }

  test("streaming rec-moment upkeep: delta batches fold into the " +
    "stored partials, survive a forced redelivery, and the merged " +
    "table equals the full rebuild cell-exact") {
    import java.io.File
    import graft.core.{Moments, PortableHash}
    val tmp = java.nio.file.Files.createTempDirectory("rec_upkeep").toFile
    val store = new File(tmp, "store").getAbsolutePath
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val ckptDir = new File(tmp, "ckpt")
    val r = graft.io.Sources.ratings(spark, sf001)
      .select(col("user_id"), col("item_id"), col("rating_i"))
    val gate = PortableHash.spread(
      (col("user_id") * lit(131071L) + col("item_id")) %
        lit(PortableHash.M.toLong))
    val base = r.where(gate < 800000L)
    val delta = r.where(gate >= 800000L)
    Moments.pairMoments(base)
      .write.parquet(s"$store/base_moments")
    base.write.parquet(s"$store/base_ratings")
    val (half1, half2) = (delta.where(col("item_id") % 2 === 0),
      delta.where(col("item_id") % 2 =!= 0))
    def addFile(tag: String,
                rows: org.apache.spark.sql.DataFrame): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      rows.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val in = spark.readStream.schema(delta.schema)
        .parquet(srcDir.getAbsolutePath)
      val q = StreamOps.recMomentUpkeep(in, store,
        ckptDir.getAbsolutePath)
      try q.processAllAvailable() finally q.stop()
    }
    addFile("f1", half1)
    runOnce()
    // crash window: drop the newest commit marker → batch 0 is
    // REDELIVERED; the overwrite-keyed fold must absorb it
    val commits = new File(ckptDir, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val last = commits.last
    assert(last.delete())
    val crc = new File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    addFile("f2", half2)
    runOnce() // redelivery + the second batch
    def key(row: org.apache.spark.sql.Row) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7))
    val cols = Seq("item_x", "item_y", "n", "sx", "sy", "sxx", "syy",
      "sxy").map(col)
    val merged = StreamOps.loadMoments(spark, store)
      .select(cols: _*).collect().map(key).toSet
    val rebuild = Moments.pairMoments(r)
      .select(cols: _*).collect().map(key).toSet
    assert(merged === rebuild,
      s"merged-only=${(merged diff rebuild).take(3)} " +
        s"rebuild-only=${(rebuild diff merged).take(3)}")
    // compaction folds the delta dirs into a new base EPOCH (the
    // marker creation is the commit point); the served table must
    // not move a cell, and the checkpoint guard must accept the
    // fully-committed stream
    StreamOps.compactStore(spark, store,
      ckpt = Some(ckptDir.getAbsolutePath))
    assert(new File(store).listFiles()
      .exists(_.getName.startsWith("_EPOCH_1_")))
    def batchDirs(d: String) = {
      val p = new File(s"$store/$d")
      if (!p.exists()) Array.empty[File]
      else p.listFiles().filter(_.getName.startsWith("batch="))
    }
    assert(batchDirs("delta_moments").isEmpty)
    assert(batchDirs("delta_ratings").isEmpty)
    val compacted = StreamOps.loadMoments(spark, store)
      .select(cols: _*).collect().map(key).toSet
    assert(compacted === rebuild)
    // idempotent on an already-compact store
    StreamOps.compactStore(spark, store)
    assert(StreamOps.loadMoments(spark, store).count() === rebuild.size)
    // crash-window parity: a STALE folded delta dir left behind by a
    // lost garbage-collection pass must be ignored by the epoch
    // filter, never re-merged
    Moments.pairMoments(half1)
      .write.parquet(s"$store/delta_moments/batch=0")
    assert(StreamOps.loadMoments(spark, store)
      .select(cols: _*).collect().map(key).toSet === rebuild)
    // crash-RECOVERY re-run (r12 ADVICE): with only stale (≤ folded)
    // deltas present, a compactStore re-run must finish the
    // interrupted garbage collection — never NPE on max(batch) = NULL
    // or fold a new empty epoch
    StreamOps.compactStore(spark, store)
    assert(batchDirs("delta_moments").isEmpty,
      "recovery re-run must GC the stale delta dir")
    assert(new File(store).listFiles()
      .count(_.getName.startsWith("_EPOCH_")) === 1,
      "recovery re-run must not mint a new epoch")
    assert(StreamOps.loadMoments(spark, store)
      .select(cols: _*).collect().map(key).toSet === rebuild)
  }

  test("compactStore epoch swap vs a concurrent reader: a serve that " +
    "resolved the OLD epoch stays consistent through the marker " +
    "commit, a post-marker serve sees the new epoch, and the " +
    "recovery GC finishes the swap") {
    import java.io.File
    import graft.core.Moments
    val tmp = java.nio.file.Files.createTempDirectory("epoch_swap").toFile
    val store = new File(tmp, "store").getAbsolutePath
    val r = graft.io.Sources.ratings(spark, sf001)
      .select(col("user_id"), col("item_id"), col("rating_i"))
    // split on USER parity: pair moments decompose exactly across a
    // user-disjoint split (each co-rating pair lives wholly on one
    // side), so pairMoments(delta) IS the delta increment here — the
    // cross-user fold path is the upkeep test's job, not this one's
    val base = r.where(col("user_id") % 2 === 0)
    val delta = r.where(col("user_id") % 2 =!= 0)
    Moments.pairMoments(base).write.parquet(s"$store/base_moments")
    base.write.parquet(s"$store/base_ratings")
    Moments.pairMoments(delta)
      .write.parquet(s"$store/delta_moments/batch=0")
    delta.write.parquet(s"$store/delta_ratings/batch=0")
    def key(row: org.apache.spark.sql.Row) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7))
    val cols = Seq("item_x", "item_y", "n", "sx", "sy", "sxx", "syy",
      "sxy").map(col)
    val rebuild = Moments.pairMoments(r)
      .select(cols: _*).collect().map(key).toSet
    // READER A lists the store BEFORE the swap: its plan is pinned to
    // epoch 0 (old base + all deltas)
    val readerA = StreamOps.loadMoments(spark, store).select(cols: _*)
    // the swap's commit sequence, stopped INSIDE the crash window:
    // new bases written, marker created, garbage collection NOT yet
    // run — exactly the state a reader can observe mid-compaction
    StreamOps.loadMoments(spark, store)
      .write.parquet(s"$store/base_moments_e1")
    StreamOps.loadRatings(spark, store)
      .write.parquet(s"$store/base_ratings_e1")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$store/_EPOCH_1_0"))
    // reader A executes AFTER the marker landed: the old epoch's
    // inputs (old base + un-GC'd deltas) are all still present, so
    // the all-OLD view must serve, cell-exact
    assert(readerA.collect().map(key).toSet === rebuild,
      "pre-swap reader must serve the consistent OLD epoch")
    // READER B resolves after the marker: all-NEW view (e1 base,
    // deltas filtered out by the marker's folded-through batch)
    assert(StreamOps.loadMoments(spark, store)
      .select(cols: _*).collect().map(key).toSet === rebuild,
      "post-swap reader must serve the consistent NEW epoch")
    // recovery completes the interrupted GC: old base + folded
    // deltas collected, epoch-1 view unchanged
    StreamOps.compactStore(spark, store)
    assert(!new File(s"$store/base_moments").exists(),
      "recovery must GC the superseded epoch-0 base")
    assert(!new File(s"$store/delta_moments/batch=0").exists(),
      "recovery must GC the folded delta")
    assert(StreamOps.loadMoments(spark, store)
      .select(cols: _*).collect().map(key).toSet === rebuild)
  }

  test("streaming PSI gate: an in-distribution batch scores low, a " +
    "shifted batch scores high, formula equals the batch kernel") {
    import java.io.File
    import graft.ext.Drift
    val tmp = java.nio.file.Files.createTempDirectory("psi_gate").toFile
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val outDir = new File(tmp, "out").getAbsolutePath
    val ckptDir = new File(tmp, "ckpt").getAbsolutePath
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val mx = docs.agg(org.apache.spark.sql.functions.max(col("n_chars")))
      .head().getLong(0)
    val ref = Drift.lengthHistogram(docs, mx)
    def addFile(tag: String,
                rows: org.apache.spark.sql.DataFrame): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      rows.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val in = spark.readStream.schema(docs.schema)
        .parquet(srcDir.getAbsolutePath)
      val q = StreamOps.psiMonitor(in, ref, mx, outDir, ckptDir)
      try q.processAllAvailable() finally q.stop()
    }
    // batch 0: the reference distribution itself (PSI ≈ 0);
    // batch 1: every length halved — a hard left-shift;
    // batch 2: every length tripled — a hard RIGHT-shift, entirely
    // past the frozen reference max. The edges were fixed at
    // reference time, so these rows must clamp into the top bucket
    // (and register as drift), not fall off the histogram — the
    // adversarial direction the gate exists to catch.
    addFile("f1", docs)
    runOnce()
    addFile("f2", docs.select(col("doc_id"),
      (col("n_chars") / 2).cast("long").as("n_chars")))
    runOnce()
    addFile("f3", docs.select(col("doc_id"),
      (col("n_chars") * 3).cast("long").as("n_chars")))
    runOnce()
    val out = spark.read.parquet(outDir)
      .select(col("batch_id"), col("psi_fx"), col("n_rows")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val psi = out.map { case (k, (p, _)) => k -> p }
    assert(psi.size === 3, s"expected 3 batch rows, got $psi")
    assert(psi(1L) > psi(0L) * 10 + 1,
      s"left-shifted batch must dominate: $psi")
    assert(psi(2L) > psi(0L) * 10 + 1,
      s"right-shifted batch must dominate: $psi")
    // every longer-than-reference row is COUNTED, not dropped
    assert(out(2L)._2 === docs.count(),
      s"right-shifted rows must clamp into bucket 9, got ${out(2L)}")
    // twin check: batch 0's monitor row equals the batch kernel run
    // directly over (ref, ref-as-current)
    val direct = Drift.psiTerms(
        ref.select(col("bucket"), col("n").as("n_ref"))
          .join(ref.select(col("bucket"), col("n").as("n_cur")),
            Seq("bucket")))
      .agg(org.apache.spark.sql.functions.sum(col("psi_term_fx")))
      .head().getLong(0)
    assert(psi(0L) === direct)
  }

  test("robots admission gate: stream equals batch row-for-row, " +
    "state bootstrapped from the rules table") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamOps.{FrontierUrl, HostPolicy, Admission}
    val policies = Seq(
      HostPolicy("a.com", Seq("/private", "/tmp")),
      HostPolicy("b.com", Seq.empty)).toDS()
    val urls = Seq(
      FrontierUrl(1L, "a.com", "/private/x"),
      FrontierUrl(2L, "a.com", "/ok"),
      FrontierUrl(3L, "b.com", "/anything"),
      FrontierUrl(4L, "nohost.com", "/y"),   // no policy: admitted
      FrontierUrl(5L, "a.com", "/tmp/z"))    // batch-2 arrival: the
    // a.com rules must survive the micro-batch boundary in state
    val batch = StreamOps.robotsAdmissionGate(urls.toDS(), policies)
      .collect().map(a => a.doc_id -> a.allowed).toMap
    val input = MemoryStream[FrontierUrl](spark)
    val q = StreamOps.robotsAdmissionGate(input.toDS(), policies)
      .writeStream.outputMode("append").format("memory")
      .queryName("robots_gate").start()
    try {
      input.addData(urls.take(4): _*); q.processAllAvailable()
      input.addData(urls.drop(4): _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM robots_gate").as[Admission]
        .collect().map(a => a.doc_id -> a.allowed).toMap
      assert(got === batch)
      assert(batch === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 0L))
    } finally q.stop()
  }

  test("robots gate with LIVE policy updates: a mid-stream rules " +
    "refetch flips later admissions, across micro-batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamOps.{FrontierEvent, HostPolicy, Admission}
    val boot = Seq(HostPolicy("a.com", Seq("/p"))).toDS()
    def url(seq: Long, path: String) =
      FrontierEvent(seq, "a.com", path, Seq.empty, is_policy = false)
    def policy(seq: Long, dis: String*) =
      FrontierEvent(seq, "a.com", "", dis, is_policy = true)
    val events = Seq(
      url(1L, "/p/x"),              // denied under the bootstrap rules
      policy(2L, "/q"),             // refetch: /p opens, /q closes
      url(3L, "/p/x"),              // now admitted
      url(4L, "/q/y"),              // now denied
      url(5L, "/q/z"))              // batch-2 arrival: the UPDATED
    // rules must have crossed the micro-batch boundary in state
    val batch = StreamOps.robotsAdmissionGateLive(events.toDS(), boot)
      .collect().map(a => a.doc_id -> a.allowed).toMap
    val input = MemoryStream[FrontierEvent](spark)
    val q = StreamOps.robotsAdmissionGateLive(input.toDS(), boot)
      .writeStream.outputMode("append").format("memory")
      .queryName("robots_live").start()
    try {
      input.addData(events.take(4): _*); q.processAllAvailable()
      input.addData(events.drop(4): _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM robots_live").as[Admission]
        .collect().map(a => a.doc_id -> a.allowed).toMap
      assert(got === batch)
      assert(batch === Map(1L -> 0L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
    } finally q.stop()
  }

  test("robots gate survives a checkpoint restart: bootstrapped rules " +
    "recovered, including for hosts with no pre-restart traffic") {
    // Round-14 verdict #5: the ingest gate had a kill-and-recover
    // spec, the robots gates didn't. The recovery property here:
    // initialState applies ONLY on a fresh start, so post-restart
    // admissions are driven by what batch 0 PERSISTED — both for a
    // host that saw traffic before the kill (a.com) and for one that
    // did NOT (k.com: its rules exist only as initial state written
    // through in batch 0; if recovery dropped it, /k would admit).
    import spark.implicits._
    import StreamOps.{FrontierUrl, HostPolicy, Admission}
    import java.io.File
    val tmp = java.nio.file.Files.createTempDirectory("robots_ckpt").toFile
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val outDir = new File(tmp, "out").getAbsolutePath
    val ckptDir = new File(tmp, "ckpt").getAbsolutePath
    val policies = Seq(HostPolicy("a.com", Seq("/private")),
      HostPolicy("k.com", Seq("/k"))).toDS()
    val schema = org.apache.spark.sql.Encoders.product[FrontierUrl].schema
    def addFile(tag: String, urls: Seq[FrontierUrl]): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      urls.toDS().coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val incoming = spark.readStream.schema(schema)
        .parquet(srcDir.getAbsolutePath).as[FrontierUrl]
      val q = StreamOps.robotsAdmissionGate(incoming, policies)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val b1 = Seq(FrontierUrl(1L, "a.com", "/private/x"),
      FrontierUrl(2L, "a.com", "/ok"))
    val b2 = Seq(FrontierUrl(3L, "a.com", "/private/y"),
      FrontierUrl(4L, "k.com", "/k/z"),
      FrontierUrl(5L, "nohost.com", "/w"))
    addFile("f1", b1)
    runOnce() // run 1: a.com rules enforced from initialState
    addFile("f2", b2)
    runOnce() // run 2: restart — RECOVERED state must carry both hosts
    runOnce() // run 3: idle restart — must add nothing
    val got = spark.read.parquet(outDir).as[Admission].collect()
    assert(got.length === 5, s"loss or dupes: ${got.toSeq}")
    val gotMap = got.map(a => a.doc_id -> a.allowed).toMap
    val batchTwin = StreamOps.robotsAdmissionGate((b1 ++ b2).toDS(), policies)
      .collect().map(a => a.doc_id -> a.allowed).toMap
    assert(gotMap === batchTwin)
    assert(gotMap === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 0L,
      5L -> 1L))
    // 4L -> 0L is the no-pre-restart-traffic proof: k.com's rules
    // came through the checkpoint, not a re-applied bootstrap
  }

  test("LIVE robots gate survives a checkpoint restart: UPDATED rules " +
    "recovered, not the stale bootstrap") {
    // The live variant carries refetched RULES in state — exactly
    // what must survive recovery (r14 verdict #5). Distinguishing
    // design: run 1 FLIPS a.com's rules (/old→/new) then dies; run
    // 2's URLs admit correctly ONLY under the flipped rules from the
    // recovered checkpoint — the stale bootstrap (which is all a
    // fresh start would know, and is what Spark would use if it
    // re-applied initialState on restart) gives the OPPOSITE answer
    // on both probe URLs.
    import spark.implicits._
    import StreamOps.{FrontierEvent, HostPolicy, Admission}
    import java.io.File
    val tmp = java.nio.file.Files.createTempDirectory("live_ckpt").toFile
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val outDir = new File(tmp, "out").getAbsolutePath
    val ckptDir = new File(tmp, "ckpt").getAbsolutePath
    val boot = Seq(HostPolicy("a.com", Seq("/old"))).toDS()
    val schema = org.apache.spark.sql.Encoders.product[FrontierEvent].schema
    def addFile(tag: String, evs: Seq[FrontierEvent]): Unit = {
      val stage = new File(tmp, s"stage_$tag")
      evs.toDS().coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new File(srcDir, s"$tag.parquet").toPath)
      ()
    }
    def runOnce(): Unit = {
      val incoming = spark.readStream.schema(schema)
        .parquet(srcDir.getAbsolutePath).as[FrontierEvent]
      val q = StreamOps.robotsAdmissionGateLive(incoming, boot)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val b1 = Seq(
      FrontierEvent(1L, "a.com", "/old/x", Seq.empty, is_policy = false),
      FrontierEvent(2L, "a.com", "", Seq("/new"), is_policy = true))
    val b2 = Seq( // both probes: updated rules say (1, 0); stale say (0, 1)
      FrontierEvent(3L, "a.com", "/old/y", Seq.empty, is_policy = false),
      FrontierEvent(4L, "a.com", "/new/z", Seq.empty, is_policy = false))
    addFile("f1", b1)
    runOnce() // run 1: deny /old/x under bootstrap, then flip the rules
    addFile("f2", b2)
    runOnce() // run 2: restart — admissions must follow the FLIPPED rules
    runOnce() // run 3: idle restart — must add nothing
    val got = spark.read.parquet(outDir).as[Admission].collect()
    assert(got.length === 3, s"loss or dupes: ${got.toSeq}")
    val gotMap = got.map(a => a.doc_id -> a.allowed).toMap
    val batchTwin = StreamOps
      .robotsAdmissionGateLive((b1 ++ b2).toDS(), boot)
      .collect().map(a => a.doc_id -> a.allowed).toMap
    assert(gotMap === batchTwin)
    assert(gotMap === Map(1L -> 0L, 3L -> 1L, 4L -> 0L))
  }
}
