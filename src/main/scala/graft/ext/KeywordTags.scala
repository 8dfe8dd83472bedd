package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multi-keyword tagging via an Aho–Corasick automaton (Aho &
  * Corasick, CACM 1975) — the standard large-scale corpus tagger
  * (PII terms, topic lexicons, blocklists).
  *
  * Scale shape: the dictionary is broadcast-tiny (it rides into the
  * task closure), the automaton is built once per PARTITION, and the
  * corpus is scanned ONCE in O(chars + matches) no matter how many
  * keywords — versus k independent regexp/LIKE passes, which at
  * 100 TB is k full corpus scans. The kernel is the
  * `Multimodal.decodeAll` mapPartitions shape: one init per
  * partition, streaming over rows, never collecting.
  *
  * Oracle contract: every keyword in [[Keywords]] is BORDER-FREE (no
  * proper prefix equals a suffix), so the automaton's
  * every-occurrence count equals DuckDB's non-overlapping
  * `regexp_extract_all` count — the equivalence KeywordTagsSpec
  * asserts for the shipped dictionary and refutes for a bordered
  * counter-example.
  */
object KeywordTags {

  /** Shipped dictionary (plain text, no regex metacharacters; all
    * border-free — see [[hasBorder]]). */
  val Keywords: Vector[String] = Vector(
    "table scan", "sort merge", "hash join", "window agg",
    "stream batch", "key order", "fast value", "slow query",
    "data row", "vector join", "small filter", "big merge",
    "spark", "customer")

  /** True iff some proper prefix of `s` is also a suffix — the one
    * shape where every-occurrence (Aho–Corasick) and non-overlapping
    * (regexp_extract_all) counts can differ. */
  def hasBorder(s: String): Boolean =
    (1 until s.length).exists(k => s.startsWith(s.substring(s.length - k)))

  /** Classic goto/fail/output automaton over raw chars. Dictionary
    * sizes here are lexicon-scale (10s–100Ks), so a per-node
    * HashMap goto is fine; build cost is O(total keyword chars). */
  private[graft] final class Automaton(kws: Vector[String]) {
    private val next =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
    private val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    private val fail = scala.collection.mutable.ArrayBuffer(0)

    kws.zipWithIndex.foreach { case (kw, id) =>
      var st = 0
      kw.foreach { ch =>
        st = next(st).getOrElseUpdate(ch, {
          next += scala.collection.mutable.Map.empty[Char, Int]
          out += Nil
          fail += 0
          next.size - 1
        })
      }
      out(st) = id :: out(st)
    }

    locally {
      val q = scala.collection.mutable.Queue.empty[Int]
      next(0).valuesIterator.foreach { s => fail(s) = 0; q += s }
      while (q.nonEmpty) {
        val u = q.dequeue()
        next(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !next(f).contains(ch)) f = fail(f)
          val cand = next(f).getOrElse(ch, 0)
          fail(v) = if (cand != v) cand else 0
          out(v) = out(v) ::: out(fail(v))
          q += v
        }
      }
    }

    /** Add every keyword occurrence in `text` into `acc` (indexed by
      * keyword id). One forward scan; fail-chain amortizes to O(1)
      * per char. */
    def countInto(text: String, acc: Array[Long]): Unit = {
      var st = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (st != 0 && !next(st).contains(ch)) st = fail(st)
        st = next(st).getOrElse(ch, 0)
        var o = out(st)
        while (o.nonEmpty) { acc(o.head) += 1L; o = o.tail }
        i += 1
      }
    }
  }

  /** Naive every-occurrence counter — the spec's ground truth. */
  private[graft] def naiveCount(text: String, kw: String): Long = {
    var n = 0L
    var i = text.indexOf(kw)
    while (i >= 0) { n += 1; i = text.indexOf(kw, i + 1) }
    n
  }

  case class DocText(doc_id: Long, text: String)
  case class DocKwHits(doc_id: Long, kw_id: Int, hits: Long)

  /** Per-keyword corpus tag summary: docs touched + total
    * occurrences. The kernel emits only (doc, kw) rows with hits > 0
    * (bounded by matches, not docs×keywords); the per-keyword rollup
    * is an ordinary partial-agg groupBy over that sparse frame, and
    * the id→keyword decode is a broadcast join against the
    * O(dictionary) lookup. */
  def tagCounts(docsDf: DataFrame): DataFrame = {
    val s = docsDf.sparkSession
    val kws = Keywords
    implicit val encIn = Encoders.product[DocText]
    implicit val encOut = Encoders.product[DocKwHits]
    val hits = docsDf.select(col("doc_id"), col("text")).as[DocText]
      .mapPartitions { it =>
        val ac = new Automaton(kws)
        it.flatMap { r =>
          val acc = new Array[Long](kws.length)
          ac.countInto(r.text, acc)
          (0 until kws.length).iterator
            .filter(acc(_) > 0L)
            .map(i => DocKwHits(r.doc_id, i, acc(i)))
            .toList
        }
      }
    val lookup = s.createDataFrame(
      kws.zipWithIndex.map { case (k, i) => (i, k) }
    ).toDF("kw_id", "keyword")
    hits.toDF()
      .groupBy(col("kw_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("hits")).as("n_hits"))
      .join(broadcast(lookup), "kw_id")
      .select(col("keyword"), col("n_docs"), col("n_hits"))
  }
}
