package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.core.PortableHash

/** Shaping documents into model-ready training sequences: fixed-size
  * overlapping chunks (the context-window split) and exact
  * concatenate-and-cut packing offsets (which context window each
  * document's tokens land in). Neither is in the reference surface —
  * they are the step between a curated corpus and a token stream that
  * every large-scale pretraining pipeline runs (SURVEY.md §2.3
  * extension rows).
  */
object Packing {

  /** Default chunk geometry: 200-char windows, 150-char stride
    * (50-char overlap so no boundary context is lost). */
  val ChunkSize = 200
  val Stride    = 150

  /** Default packing capacity: tokens per training sequence. */
  val BinCapacity = 1024

  /** Default token-chunk geometry: 64-token windows, 48-token stride
    * (16-token overlap). */
  val TokenBudget = 64
  val TokenStride = 48

  /** Split each document into fixed-size overlapping character chunks.
    *
    * Chunk `i` starts at 1-based position `i·stride + 1`; starts are
    * generated while they land inside the text, so a document of
    * length L yields `⌊(L−1)/stride⌋ + 1` chunks and the last chunk
    * may be shorter than `chunkSize`. The whole operator is a
    * per-row `transform`+`explode` over generated offsets — no
    * shuffle, no UDF, chunking parallelism is exactly scan
    * parallelism, which is the property that matters when the corpus
    * is 100 TB: chunk fan-out multiplies rows, never moves them.
    *
    * Output carries `chunk_len` and the portable hash of the chunk
    * text rather than the text itself, so downstream checks pin the
    * exact bytes without re-emitting the corpus.
    */
  def chunkDocs(docs: DataFrame,
                chunkSize: Int = ChunkSize,
                stride: Int = Stride): DataFrame = {
    require(chunkSize >= stride, "overlapping chunks need chunkSize >= stride")
    val lastStart = floor((length(col("text")) - lit(1)) / lit(stride)).cast("int")
    docs.where(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lastStart), i =>
          struct(i.cast("long").as("chunk_id"),
            col("text").substr(i * lit(stride) + lit(1), lit(chunkSize))
              .as("chunk")))).as("c"))
      .select(col("doc_id"),
        col("c.chunk_id").as("chunk_id"),
        length(col("c.chunk")).cast("long").as("chunk_len"),
        PortableHash.h(col("c.chunk")).cast("long").as("chunk_hash"))
  }

  /** Split each document into overlapping TOKEN-budget chunks — the
    * context-window split real pretraining pipelines run ([[chunkDocs]]
    * cuts on character offsets, which splits tokens at the boundary;
    * a model's window is a token budget, not a byte budget).
    *
    * Tokens are the whitespace words ([[TextAnalysis.wordsCol]] — the
    * same tokenization `q_token_count` and [[packSequences]] score),
    * chunk `i` covers tokens `[i·stride+1, i·stride+budget]`, and a
    * document with n tokens yields `⌊(n−1)/stride⌋ + 1` chunks, the
    * last possibly short. Same execution shape as [[chunkDocs]]:
    * per-row split + `transform`+`explode` over generated starts —
    * zero shuffle, fan-out multiplies rows in place, chunking
    * parallelism is scan parallelism at any corpus size.
    *
    * Output pins the chunk bytes by (token count, char length,
    * portable hash of the re-joined text) instead of re-emitting the
    * corpus.
    */
  def chunkTokens(docs: DataFrame,
                  budget: Int = TokenBudget,
                  stride: Int = TokenStride): DataFrame = {
    require(budget >= stride, "overlapping chunks need budget >= stride")
    val ws = split(col("text"), " ")
    val lastStart = floor((size(ws) - lit(1)) / lit(stride)).cast("int")
    val chunk = array_join(col("c.cw"), " ")
    docs.where(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lastStart), i =>
          struct(i.cast("long").as("chunk_id"),
            slice(ws, i * lit(stride) + lit(1), lit(budget)).as("cw"))))
          .as("c"))
      .select(col("doc_id"),
        col("c.chunk_id").as("chunk_id"),
        size(col("c.cw")).cast("long").as("tok_len"),
        length(chunk).cast("long").as("chunk_len"),
        PortableHash.h(chunk).cast("long").as("chunk_hash"))
  }

  /** Exact concatenate-and-cut packing: documents are laid out in
    * `orderCol` order as one token stream, which is cut into
    * `capacity`-token training sequences; each document is annotated
    * with its exclusive token offset and the first/last bin it
    * touches (documents may straddle a cut — that is how pretraining
    * packing works, the straddle IS the design).
    *
    * The offset is an exact global prefix sum, computed the way it
    * must be at 100 TB: a range-partitioned sort, one tiny job that
    * collects ONE partial sum per partition (K values for K
    * partitions — driver traffic is O(parallelism), independent of
    * data size), then a per-partition running sum seeded from the
    * broadcast partition offsets. This is the same two-pass scan
    * shape as `RDD.zipWithIndex` / [[graft.core.Quantiles]], with sum
    * instead of count; a single global window (`sum over (order by
    * …)`) would funnel the whole corpus through one reducer.
    *
    * The sorted RDD is persisted before the first pass so both passes
    * see the SAME range boundaries (re-sampling between jobs would
    * silently skew every offset); it stays pinned for the lifetime of
    * the returned frame's lineage, so callers should memoize per
    * (session, input) like the other session caches (ExtQueries
    * does).
    */
  def packSequences(docs: DataFrame, tokens: Column, orderCol: Column,
                    capacity: Int = BinCapacity): DataFrame = {
    val spark = docs.sparkSession
    // Null keys/token counts are dropped, not crashed on: a NULL has
    // no position in a token stream (the oracle filters identically).
    val base = docs.select(orderCol.cast("long").as("k"),
      tokens.cast("long").as("n_tokens"))
      .na.drop(Seq("k", "n_tokens"))
    val sorted = base.rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = sorted
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // Exclusive prefix over partitions: offsets(i) = tokens before
    // partition i. scanLeft adds a trailing grand total we drop.
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val rows = sorted.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { case (k, t) =>
        val o = run; run += t; Row(k, t, o)
      }
    }
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("n_tokens", LongType),
      StructField("tok_offset", LongType)))
    spark.createDataFrame(rows, schema)
      .select(col("k"), col("n_tokens"), col("tok_offset"),
        // true integral division (`div` on longs stays in long
        // arithmetic — no detour through doubles, exact at any offset)
        expr(s"tok_offset div ${capacity}L").as("bin_first"),
        expr(s"(tok_offset + n_tokens - 1) div ${capacity}L").as("bin_last"))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + lit(1L))
  }
}
