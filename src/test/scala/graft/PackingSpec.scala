package graft

import org.apache.spark.sql.functions._
import graft.ext.{Packing, TextAnalysis}

/** Chunking, sequence packing, and PII redaction kernels. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs: counts, lengths, and reconstruction at the edges") {
    // lengths straddle every boundary: < stride, == stride, == stride+1,
    // == chunkSize, == chunkSize+1, multi-chunk
    val texts = Seq(149, 150, 151, 200, 201, 467).zipWithIndex.map {
      case (n, i) => (i.toLong, ("abcdefghij" * 47).take(n))
    }
    val df = texts.toDF("doc_id", "text")
    val chunks = Packing.chunkDocs(df, chunkSize = 200, stride = 150)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = chunks.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    for ((id, text) <- texts) {
      val cs = byDoc(id)
      val expectN = (text.length - 1) / 150 + 1
      assert(cs.length == expectN, s"doc $id chunk count")
      // chunk i covers text.substring(i*150, min(i*150+200, len)) —
      // verify via length (bytes are pinned by the hash column in the
      // oracle; here we re-derive the hash on one chunk)
      cs.foreach { r =>
        val i = r.getLong(1).toInt
        val expLen = math.min(200, text.length - i * 150)
        assert(r.getLong(2) == expLen, s"doc $id chunk $i len")
      }
      // overlapping reconstruction: stride-prefixes of all but the
      // last chunk + the last chunk = original text
      val expChunks = (0 until expectN).map(i =>
        text.substring(i * 150, math.min(i * 150 + 200, text.length)))
      val rebuilt = expChunks.dropRight(1).map(_.take(150)).mkString + expChunks.last
      assert(rebuilt == text, s"doc $id reconstruction")
    }
    // hash column matches the composed-Column hash of the real chunk text
    val h = df.where($"doc_id" === 5L)
      .select(graft.core.PortableHash.h($"text".substr(lit(151), lit(200))))
      .head().getInt(0)
    val got = chunks.filter(r => r.getLong(0) == 5L && r.getLong(1) == 1L).head
    assert(got.getLong(3) == h.toLong)
  }

  test("chunkTokens: budget is never exceeded, counts and lengths are " +
    "exact, token stream reconstructs") {
    // token counts straddle the geometry: < stride, == stride,
    // stride+1, == budget, budget+1, multi-chunk; budget 8, stride 6
    val texts = Seq(5, 6, 7, 8, 9, 23).zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(k => s"w$k").mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
    val chunks = Packing.chunkTokens(df, budget = 8, stride = 6)
      .orderBy("doc_id", "chunk_id").collect()
    assert(chunks.forall(_.getLong(2) <= 8), "a chunk exceeded the budget")
    val byDoc = chunks.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    for ((id, text) <- texts) {
      val toks = text.split(" ", -1)
      val cs = byDoc(id)
      val expectN = (toks.length - 1) / 6 + 1
      assert(cs.length == expectN, s"doc $id chunk count")
      cs.foreach { r =>
        val i = r.getLong(1).toInt
        val exp = toks.slice(i * 6, i * 6 + 8)
        assert(r.getLong(2) == exp.length, s"doc $id chunk $i tok_len")
        assert(r.getLong(3) == exp.mkString(" ").length, s"doc $id chunk $i len")
      }
      // stride-prefixes of all but the last chunk + last chunk = stream
      val expChunks = (0 until expectN).map(i => toks.slice(i * 6, i * 6 + 8))
      val rebuilt = expChunks.dropRight(1).flatMap(_.take(6)) ++ expChunks.last
      assert(rebuilt.toSeq == toks.toSeq, s"doc $id reconstruction")
    }
    // hash pins the exact re-joined chunk bytes
    val expText = (0 until 23).map(k => s"w$k").slice(6, 14).mkString(" ")
    val h = Seq(expText).toDF("t")
      .select(graft.core.PortableHash.h($"t")).head().getInt(0)
    val got = chunks.filter(r => r.getLong(0) == 5L && r.getLong(1) == 1L).head
    assert(got.getLong(4) == h.toLong)
  }

  test("packSequences: two-pass prefix sum equals the window cumsum " +
    "regardless of input partitioning") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 97L).map(i => (i, (i * 37 % 19) + 1))
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => (r._1, r._2)), parts)
          .map { case (k, t) => org.apache.spark.sql.Row(k, t) },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("nt",
            org.apache.spark.sql.types.LongType))))
      val got = Packing.packSequences(df, $"nt", $"doc_id", capacity = 16)
        .orderBy("k").collect()
      val want = df.select($"doc_id", $"nt",
          coalesce(sum($"nt").over(
            Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("off"))
        .orderBy("doc_id").collect()
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g.getLong(0) == w.getLong(0) && g.getLong(2) == w.getLong(2),
          s"offset mismatch at ${g.getLong(0)} with $parts input partitions")
        val off = g.getLong(2); val nt = g.getLong(1)
        assert(g.getLong(3) == off / 16, "bin_first")
        assert(g.getLong(4) == (off + nt - 1) / 16, "bin_last")
        assert(g.getLong(5) == g.getLong(4) - g.getLong(3) + 1, "n_bins")
      }
    }
  }

  test("pii: counts and redaction on a known string") {
    val df = Seq((1L, "mail a.b+c@x-corp.io or 10.2.3.4 acct 12345678 ok"),
      (2L, "no pii here 123 1.2 999999"))
      .toDF("doc_id", "text")
    // bypass enrichment: call the regex machinery directly
    val red = regexp_replace(regexp_replace(regexp_replace($"text",
      TextAnalysis.EmailRe, "<EMAIL>"),
      TextAnalysis.Ipv4Re, "<IP>"),
      TextAnalysis.LongNumRe, "<NUM>")
    val out = df.select($"doc_id",
        size(regexp_extract_all($"text", lit(TextAnalysis.EmailRe), lit(0))).as("e"),
        size(regexp_extract_all($"text", lit(TextAnalysis.Ipv4Re), lit(0))).as("i"),
        size(regexp_extract_all($"text", lit(TextAnalysis.LongNumRe), lit(0))).as("n"),
        red.as("r"))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1 && out(0).getInt(3) == 1)
    assert(out(0).getString(4) == "mail <EMAIL> or <IP> acct <NUM> ok")
    assert(out(1).getInt(1) == 0 && out(1).getInt(2) == 0 && out(1).getInt(3) == 0)
    assert(out(1).getString(4) == "no pii here 123 1.2 999999")
  }

  test("pii: enrichment plants exactly the residue-keyed rows") {
    val df = (0L to 20L).map(i => (i, "base")).toDF("doc_id", "text")
    val out = TextAnalysis.piiColumns(df).orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1 else 0), s"emails @$id")
      assert(r.getLong(2) == (if (id % 5 == 0) 1 else 0), s"ips @$id")
      assert(r.getLong(3) == (if (id % 7 == 0) 1 else 0), s"longnums @$id")
    }
  }
}
