package graft.ext

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-trained byte-pair encoding (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words
  * with Subword Units") — the real-token substrate for the packing /
  * chunking family. Whitespace counts are off 2–3× on code/CJK
  * against a model tokenizer; every token-denominated budget in a
  * training pipeline is a SUBWORD budget, so the engine learns one.
  *
  * Shape at 100 TB:
  *  - LEARNING runs on the word-frequency table capped to a vocab
  *    budget (count desc, word asc — a total order, same discipline
  *    as the q_oov_rate vocab cut), collected to the driver (bounded
  *    by the cap, not the corpus) and iterated there; the result is
  *    a ~[[NumMerges]]-row merge table, broadcast by construction as
  *    plan literals.
  *  - APPLICATION is a pure Column pipeline: seed each word as
  *    bracketed symbols (`[h][i][</w>]`), fold the merge table as
  *    chained `replace` calls (rank order — a merge can never
  *    re-enable an earlier one, because any pair containing a new
  *    symbol was necessarily learned later), count symbols as `]`
  *    occurrences. Whole-stage-codegen'd, zero shuffle, scan-parallel
  *    at any corpus size. (A production tokenizer swaps in a
  *    mapPartitions trie for constant-factor speed; the replace chain
  *    is the Column-native form whose DuckDB twin is exact.)
  *
  * Oracle replay: learning is a fixed number of
  * count-pairs → argmax → merge steps, each SQL-expressible, so the
  * WHOLE learn loop replays as chained CTEs (the k-means / PageRank
  * round-replay discipline) and application replays as one `replace`
  * CTE per merge. `AS MATERIALIZED` pins each learned step — DuckDB
  * inlines plain CTEs, which would re-evaluate the chain
  * exponentially. Determinism rests on exact integer counts and
  * lexicographic tie-breaks (ASCII corpus: Scala UTF-16 order ==
  * DuckDB UTF-8 byte order; a non-ASCII corpus would need a collation
  * pin).
  */
object Bpe {
  /** Word-frequency cap for learning — covers the synthetic corpus's
    * 31 distinct words; production budgets (50k) change nothing
    * structurally. */
  val VocabCap = 50

  /** Number of merges to learn. */
  val NumMerges = 24

  /** Model-window budget (in BPE tokens) that [[graft.ext.ExtQueries]]'
    * chunk audit checks against. */
  val BpeBudget = 128

  private val memo =
    TrieMap.empty[(String, String), Seq[(String, String)]]

  /** The learned merge table for a corpus dir, memoized per
    * (session, dir) — learning collects ≤[[VocabCap]] rows once. */
  def mergesMemo(docs: DataFrame, dir: String): Seq[(String, String)] =
    memo.getOrElseUpdate(
      (graft.core.Cache.sessionKey(docs.sparkSession), dir),
      learnMerges(docs))

  /** Merge one pair left-to-right, non-overlapping — the exact
    * semantics of SQL `replace` on the bracketed form. */
  private def mergePair(syms: Vector[String],
                        pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Driver-side Sennrich learn loop over the capped word-frequency
    * table. Argmax tie-break: highest count, then lexicographically
    * smallest (a, b) — the mirror of `ORDER BY cnt DESC, a, b
    * LIMIT 1`. Merging never collapses two distinct words (the symbol
    * concatenation is invariant), so the map keys stay unique. */
  def learnMerges(docs: DataFrame, numMerges: Int = NumMerges,
                  vocabCap: Int = VocabCap): Seq[(String, String)] = {
    val vocabRows = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(vocabCap)
      .collect()
    var vocab: Map[Vector[String], Long] = vocabRows.map { r =>
      (r.getString(0).map(_.toString).toVector :+ "</w>") -> r.getLong(1)
    }.toMap
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 1 to numMerges if !done) {
      val stats = mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        stats(k) = stats.getOrElse(k, 0L) + f
      }
      if (stats.isEmpty) done = true
      else {
        val best = stats.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, f) => mergePair(syms, best) -> f }
      }
    }
    merges.result()
  }

  /** A word column as bracketed seed symbols: `[h][i][</w>]`. */
  def seedCol(w: Column): Column =
    concat(regexp_replace(w, "(.)", "[$1]"), lit("[</w>]"))

  /** The seed folded through the merge table (rank order). */
  def tokenizeCol(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(seedCol(w)) { case (c, (a, b)) =>
      replace(c, lit(s"[$a][$b]"), lit(s"[$a$b]"))
    }

  /** Symbol count of a bracketed-token string = `]` occurrences. */
  def countCol(tok: Column): Column =
    (length(tok) - length(replace(tok, lit("]"), lit("")))).cast("long")

  /** BPE token count of one word column. */
  def wordBpeCol(w: Column, merges: Seq[(String, String)]): Column =
    countCol(tokenizeCol(w, merges))

  /** Per-document BPE token count over a text column — a fold over
    * the whitespace words, all inside one codegen'd projection. */
  def docBpeCol(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(
      transform(filter(split(text, " "), w => w =!= ""),
        w => wordBpeCol(w, merges)),
      lit(0L), (acc, x) => acc + x)

  // ------------------------------------------------------------------
  // DuckDB replay (the exact SQL twins of the learn + apply pipeline)
  // ------------------------------------------------------------------

  /** The learn-loop CTE chain: seeds `v0` from the capped vocab, then
    * per merge i: pair extraction (zip-unnest of adjacent symbols),
    * weighted count, argmax `b{i}`, and the merged vocab `v{i+1}`. */
  def learnCtesSql(n: Int = NumMerges, cap: Int = VocabCap): String = {
    val head = Seq(
      "bwords AS MATERIALIZED (SELECT unnest(string_split(text, ' ')) AS w " +
        "FROM documents)",
      "bvocab AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq " +
        s"FROM bwords WHERE w <> '' GROUP BY 1 ORDER BY freq DESC, w LIMIT $cap)",
      """v0 AS MATERIALIZED (SELECT regexp_replace(w, '(.)', '[\1]', 'g') """ +
        "|| '[</w>]' AS wstr, freq FROM bvocab)")
    val steps = (0 until n).flatMap { i =>
      Seq(
        s"s$i AS (SELECT string_split(substr(wstr, 2, length(wstr)-2), " +
          s"'][') AS syms, freq FROM v$i)",
        s"p$i AS (SELECT unnest(syms[1:len(syms)-1]) AS a, " +
          s"unnest(syms[2:len(syms)]) AS b, freq FROM s$i)",
        s"c$i AS (SELECT a, b, sum(freq) AS cnt FROM p$i GROUP BY 1, 2)",
        s"b$i AS MATERIALIZED (SELECT a, b FROM c$i " +
          "ORDER BY cnt DESC, a, b LIMIT 1)",
        s"v${i + 1} AS MATERIALIZED (SELECT replace(wstr, " +
          "'['||a||']['||b||']', '['||a||b||']') AS wstr, freq " +
          s"FROM v$i CROSS JOIN b$i)")
    }
    (head ++ steps).mkString(",\n")
  }

  /** Apply chain over a source CTE `src(…, w)`: seeds `t0` carrying
    * every `src` column plus the bracketed token string `tok`, then
    * one replace CTE per learned merge; read the result from `t{n}`.
    * `carryCols` are the src columns to keep alongside `tok`. */
  def applyCtesSql(srcCte: String, carryCols: Seq[String],
                   n: Int = NumMerges): String = {
    val carry = carryCols.mkString(", ")
    val head =
      s"""t0 AS (SELECT $carry, regexp_replace(w, '(.)', '[\\1]', 'g') """ +
        s"|| '[</w>]' AS tok FROM $srcCte WHERE w <> '')"
    val steps = (0 until n).map { i =>
      s"t${i + 1} AS (SELECT $carry, replace(tok, '['||a||']['||b||']', " +
        s"'['||a||b||']') AS tok FROM t$i CROSS JOIN b$i)"
    }
    (head +: steps).mkString(",\n")
  }

  /** `]`-count of the tok column, as SQL. */
  def countSql(tok: String): String =
    s"CAST(length($tok) - length(replace($tok, ']', '')) AS BIGINT)"
}
