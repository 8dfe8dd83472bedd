package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitter summaries as a two-level merge tree.
  *
  * The 100-TB frequent-items problem: an exact `groupBy(key).count`
  * shuffles every distinct key, which is exactly what a long-tail key
  * space (URLs, user ids, shingles) makes expensive — while the
  * answer anyone wants is the few keys above a frequency threshold.
  * The Misra–Gries summary (k counters; decrement all when a new key
  * arrives with the table full) answers it in one pass with bounded
  * memory and a DETERMINISTIC guarantee, and — unlike a plain
  * "sample and count" — the guarantee survives arbitrary merge order
  * (Agarwal et al., "Mergeable Summaries", PODS 2012): after any
  * merge tree over partitions, for every key
  *
  *     trueCount - n/(k+1)  <=  estimate  <=  trueCount
  *
  * where n is the TOTAL row count. Hence every key with
  * trueCount > n/(k+1) is guaranteed present (its estimate is > 0).
  *
  * Shape here: a per-partition MG pass (mapPartitions, k counters,
  * one decrement credit-ledger each) emits at most k (key, partial)
  * rows per partition; a single exact sum over those ≤ k·P rows
  * combines them. Summing partials without a final re-shrink only
  * TIGHTENS the bound (the paper's merge = pointwise sum, then
  * shrink; skipping the shrink keeps more mass), at the cost of up to
  * k·P candidate rows — trivia next to the input, and the final
  * threshold filter cuts them back to the true heavy set.
  */
object HeavyHitters {

  /** One Misra–Gries pass over an iterator: classic k-counter sweep.
    * An arriving key that is absent from a FULL table decrements every
    * live counter by 1 (its own +1 cancels against its -1); counters
    * reaching 0 drop out. O(k) per eviction, O(1) otherwise — and each
    * eviction destroys k+1 units of count mass out of the n total, so
    * there are ≤ n/(k+1) evictions and the amortized cost stays O(1)
    * per row. Exposed for the spec. */
  /** One MG arrival against a counter table — the k-counter step
    * shared by the flat and grouped kernels. */
  private def mgStep(counts: scala.collection.mutable.HashMap[String, Long],
                     key: String, k: Int): Unit =
    counts.get(key) match {
      case Some(c) => counts.update(key, c + 1L)
      case None if counts.size < k => counts.update(key, 1L)
      case None =>
        // decrement-all: every live counter loses 1; zeros drop out,
        // and the arriving key's +1 cancels against its own -1
        val dead = counts.iterator
          .flatMap { case (ky, c) =>
            if (c == 1L) Some(ky) else { counts.update(ky, c - 1L); None } }
          .toList
        dead.foreach(counts.remove)
    }

  private[graft] def mgPartition(it: Iterator[String], k: Int)
      : Iterator[(String, Long)] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach(mgStep(counts, _, k))
    counts.iterator.map { case (ky, c) => (ky, c) }
  }

  /** Distributed MG summary of `df(keyCol)` (any type; keys are
    * compared as strings): per-partition k-counter pass, then an exact
    * sum over the ≤ k·P partials. Output columns: (keyCol, est). */
  def summarize(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val s: SparkSession = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions(it => mgPartition(it, k))
      .toDF(keyCol, "est_part")
      .groupBy(col(keyCol))
      .agg(sum(col("est_part")).as("est"))
  }

  /** Grouped MG summaries: an independent k-counter table PER GROUP
    * inside each partition (state ≤ groups-in-partition × k), partials
    * exact-summed per (group, key). The per-group envelope is the flat
    * one: within group g, est ∈ [true − n_g/(k+1), true]. The enabler
    * for window fan-out reuse (q_trending_items): per-day partials are
    * built ONCE and any sliding window merges them by summation, the
    * same mergeability that powers [[summarize]]'s partition combine —
    * day errors add to exactly the window envelope. */
  def summarizeByGroup(df: DataFrame, groupCol: String, keyCol: String,
                       k: Int): DataFrame = {
    val s: SparkSession = df.sparkSession
    import s.implicits._
    df.select(col(groupCol).cast("long"), col(keyCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val byGroup = scala.collection.mutable
          .HashMap.empty[Long, scala.collection.mutable.HashMap[String, Long]]
        it.foreach { case (g, key) =>
          mgStep(byGroup.getOrElseUpdate(g,
            scala.collection.mutable.HashMap.empty[String, Long]), key, k)
        }
        byGroup.iterator.flatMap { case (g, m) =>
          m.iterator.map { case (ky, c) => (g, ky, c) } }
      }
      .toDF(groupCol, keyCol, "est_part")
      .groupBy(col(groupCol), col(keyCol))
      .agg(sum(col("est_part")).as("est"))
  }
}
