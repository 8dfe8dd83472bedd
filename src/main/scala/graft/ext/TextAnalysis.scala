package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Det, PortableHash}

/** Text-analysis operators for a training-data pipeline: token
  * counting, quality scoring, marker-based language scoring, document
  * fingerprinting, tf-idf. All pure Column expressions (codegen'd, no
  * UDFs) with exact DuckDB twins.
  */
object TextAnalysis {

  /** Gopher-style repetition signals per doc: total / distinct word
    * n-gram counts, the hottest n-gram's multiplicity, and the
    * duplicate-n-gram fraction (`dup_ratio`, r4-rounded). Two
    * partial/final aggregations, never a self-join — the
    * per-(doc, shingle) counts collapse before the per-doc rollup, so
    * the shuffled volume is bounded by distinct shingles per doc. */
  def repetitionSignals(docs: DataFrame, n: Int = 3): DataFrame = {
    val counts = Dedup.shingles(docs, n)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_shingles"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_rep"))
      .select(col("doc_id"), col("n_shingles"), col("n_distinct"),
        col("max_rep"),
        Det.r4((col("n_shingles") - col("n_distinct")).cast("double") /
          col("n_shingles").cast("double")).as("dup_ratio"))
  }

  /** Tokenizers: whitespace words and a BPE-ish regex token stream. */
  def wordsCol: Column = split(col("text"), " ")
  val TokenRegex = "[a-z0-9]+"

  /** Language marker lists (deterministic tie order en>es>fr>de). On
    * real corpora these would be per-language stopword n-grams; the
    * operator shape — k marker counts + argmax — is the real thing. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "a"),
    "es" -> Seq("de", "la", "el"),
    "fr" -> Seq("le", "et", "les"),
    "de" -> Seq("der", "die", "und"))

  def markerCount(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => markers.map(m => w === m).reduce(_ || _))).cast("long")

  def markerCountSql(markers: Seq[String]): String = {
    val cond = markers.map(m => s"x = '$m'").mkString(" OR ")
    s"CAST(len(list_filter(w, x -> $cond)) AS BIGINT)"
  }

  /** Quality score in [0,1]: length band, non-stopword ratio, average
    * word length band. Weights are engine config, not reference
    * semantics (the reference has no text ops). */
  def qualityColumns(df: DataFrame): DataFrame = {
    val ws = wordsCol
    val nWords = size(ws).cast("long")
    val stop = markerCount(ws, Seq("the", "a", "and", "of"))
    val avgWlen = (length(col("text")) - nWords + lit(1)).cast("double") / nWords
    df.select(col("doc_id"), col("n_chars"),
        nWords.as("n_words"), stop.as("n_stop"), Det.r4(avgWlen).as("avg_wlen"))
      .withColumn("stop_ratio",
        Det.r4(col("n_stop").cast("double") / col("n_words")))
      .withColumn("quality", Det.r4(
        lit(0.3) * least(col("n_words").cast("double") / 50.0, lit(1.0))
          + lit(0.4) * (lit(1.0) - col("stop_ratio"))
          + lit(0.3) * least(col("avg_wlen") / 10.0, lit(1.0))))
  }

  /** Rolling-hash document fingerprint: position-weighted sum of
    * portable token hashes mod 1e9+7. Order-sensitive (a permuted doc
    * fingerprints differently) yet engine-neutral and exact.
    * `h` defaults to the composed-Column hash (works on any session);
    * callers that registered GraftFunctions pass the native
    * expression for the codegen'd fast path. */
  def fingerprint(ws: Column,
                  h: Column => Column = PortableHash.h): Column =
    aggregate(
      transform(ws, (w, i) => ((i + lit(1)).cast("long")) * h(w)),
      lit(0L), (acc, x) => acc + x) % lit(1000000007L)

  val fingerprintSql: String = {
    val h = PortableHash.hSql("w[i]")
    s"CAST(list_sum([i * ($h) FOR i IN range(1, len(w)+1)]) % 1000000007 AS BIGINT)"
  }

  /** tf-idf: tf = term occurrences within a language's corpus,
    * df = number of distinct docs (globally) containing the term,
    * idf = ln(N/df). Returns one row per (lang, term). */
  def tfidf(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"), col("lang"),
      explode(wordsCol).as("term"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val df = words.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tf = words.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("tf"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("lang"), col("term"), col("tf"), col("df"),
        Det.r4(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("score"))
  }
}
