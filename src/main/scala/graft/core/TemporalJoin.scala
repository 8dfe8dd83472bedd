package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — backward as-of join and banded range
  * join.
  *
  * Not in the reference (its pipelines are strictly batch CF over
  * ratings; SURVEY.md §2.2 "joins" row records the absence) — added
  * because an event-shaped corpus needs both, and each has a
  * Spark-first formulation that avoids the naive per-row probe or
  * cross product:
  *
  *  - [[asof]]: union-the-sides + one window pass. One shuffle on the
  *    key, an O(n log n) sort inside each key partition, zero join
  *    blowup. At 100 TB this scales exactly like any windowed
  *    aggregation; a join-based formulation (left ⋈ right on key,
  *    then max-per-left-row) would shuffle both sides AND explode
  *    |left|·|right-per-key| intermediates.
  *  - [[bandJoin]]: time-bucketed equi-join. For bucket width W the
  *    band predicate `0 ≤ rightTs − leftTs ≤ W` implies
  *    `bucket(right) ∈ {bucket(left), bucket(left)+1}`, so the join
  *    runs as a hash-partitionable equi-join on (keys, bucket) — AQE
  *    skew-splittable, broadcastable when one side is small — with
  *    the exact band predicate applied as a post-filter. A plain
  *    theta join on the band predicate would plan as
  *    broadcast-nested-loop and die at scale.
  */
object TemporalJoin {

  /** For each `left` row, attach the most recent `right` row with the
    * same `key` and `right.ts ≤ left.ts` (backward as-of join).
    *
    * `payload` columns are taken from `right` and appear on every
    * output row — null when the key has no right row at or before the
    * left timestamp. Among right rows tied on timestamp the greatest
    * `tieBreak` wins (both engines sort identically, keeping the
    * operator deterministic). `payload` columns must be non-null in
    * `right` itself and disjoint from `left`'s column names; both
    * timestamp columns must be numeric (e.g. epoch millis).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payload: Seq[String], tieBreak: String): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, payload, tieBreak,
      forward = false)

  /** FORWARD as-of join: for each `left` row, the EARLIEST `right`
    * row with the same key and `right.ts ≥ left.ts` — the "next
    * event after" lookup (next maintenance slot, next price tick,
    * next session start). Identical plan shape to [[asof]]: the scan
    * direction of the one window pass flips, nothing else — so the
    * 100 TB cost model (one key shuffle, per-key sort, zero blowup)
    * carries over verbatim. Ties on timestamp resolve to the
    * greatest `tieBreak`, same as backward. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  payload: Seq[String], tieBreak: String): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, payload, tieBreak,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       payload: Seq[String], tieBreak: String,
                       forward: Boolean): DataFrame = {
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right.select(
      (col(key) +: col(rightTs).as("_ts") +: col(tieBreak).as("_tie") +:
        payload.map(col)): _*)
      .withColumn("_side", lit(0))
    // unionByName fills the side-specific columns with nulls; the
    // window then carries the latest non-null right payload forward.
    // Frame order (ts, side, tie): right rows sort before left rows at
    // equal ts (≤/≥ inclusive semantics), tied right rows resolve by
    // tieBreak, and left rows contribute only nulls so their relative
    // order is irrelevant under ignoreNulls. Forward mode scans ts
    // DESCENDING, so "last seen right row" is the smallest ts ≥ left.
    val u = l.unionByName(r, allowMissingColumns = true)
    val tsOrd = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrd, col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_ts", "_side", "_tie")
  }

  /** Banded range join: pairs with equal `keys` and
    * `0 ≤ right.ts − left.ts ≤ windowMs`. Non-key columns are emitted
    * prefixed `a_` (left) / `b_` (right). Self-join callers wanting
    * unordered pairs should add a canonical strict ordering filter
    * (e.g. `(a_ts, a_id) < (b_ts, b_id)`) — at Δ=0 both orientations
    * survive the band predicate.
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, windowMs: Long): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    val aCols = left.columns.toSeq.filterNot(keys.contains)
      .map(c => col(c).as(s"a_$c"))
    val bCols = right.columns.toSeq.filterNot(keys.contains)
      .map(c => col(c).as(s"b_$c"))
    val aTs = col(s"a_$leftTs"); val bTs = col(s"b_$rightTs")
    val a = left.select((keys.map(col) ++ aCols): _*)
      .withColumn("_bucket",
        explode(array(floor(aTs / windowMs), floor(aTs / windowMs) + 1)))
    val b = right.select((keys.map(col) ++ bCols): _*)
      .withColumn("_bucket", floor(bTs / windowMs))
    a.join(b, keys :+ "_bucket")
      .where(bTs >= aTs && bTs - aTs <= windowMs)
      .drop("_bucket")
  }
}
