package graft

import org.apache.spark.sql.functions._
import graft.ext.Unigram

/** Unigram-LM Viterbi segmentation: optimality against brute-force
  * enumeration, the pinned tie-break order, and corpus invariants. */
class UnigramSpec extends SparkSpec {

  /** All segmentations of `word` into vocab pieces (≤ MaxPieceLen),
    * scored with the same cost map — the oracle for the oracle. */
  private def bruteBest(word: String, cost: Map[String, Long])
      : Option[(Long, Long)] = {
    def go(rest: String): Seq[(Long, Long)] =
      if (rest.isEmpty) Seq((0L, 0L))
      else (1 to math.min(Unigram.MaxPieceLen, rest.length)).flatMap {
        k =>
          cost.get(rest.take(k)).toSeq.flatMap { c =>
            go(rest.drop(k)).map { case (tc, tn) => (tc + c, tn + 1L) }
          }
      }
    val all = go(word)
    if (all.isEmpty) None else Some(all.min)
  }

  test("kernel cost equals brute-force minimum on real corpus words") {
    val d = Unigram.costMemo(
      graft.io.Sources.table(spark, sf001, "documents"), sf001)
    val words = Seq("customer", "lineitem", "window", "a", "hash",
      "stream", "batch")
    words.foreach { w =>
      val (c, n, seg) = Unigram.segment(w, d)
      val Some((bc, bn)) = bruteBest(w, d)
      assert(c === bc, s"cost mismatch for $w")
      assert(n === bn, s"piece-count mismatch for $w (got $seg)")
      assert(seg.split('|').mkString === w, s"pieces must respell $w")
    }
  }

  test("tie-break: equal (cost, n_pieces) goes to the longest final " +
    "piece") {
    // 'aaa' under {a:5, aa:10}: a|aa and aa|a both cost 15 with 2
    // pieces — the descending-k strict replacement must keep the
    // k=2 FINAL piece, i.e. 'a|aa'.
    val cost = Map("a" -> 5L, "aa" -> 10L)
    val (c, n, seg) = Unigram.segment("aaa", cost)
    assert(c === 15L && n === 2L)
    assert(seg === "a|aa")
  }

  test("every corpus word segments (chars guarantee cover)") {
    val segs = Unigram.segmentsAll(
      graft.io.Sources.table(spark, sf001, "documents"), sf001)
    assert(segs.where(col("cost_fx") >= Unigram.Inf).count() === 0L)
    assert(segs.where(col("n_pieces") < 1).count() === 0L)
  }
}
