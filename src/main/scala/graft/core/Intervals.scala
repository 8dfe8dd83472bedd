package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval merging (the q_interval_coverage core,
  * factored for reuse and property testing).
  *
  * The merge is the cumulative-max window formulation: a row opens a
  * new island iff its start exceeds the running maximum end of every
  * earlier row in its key (total (st, tie) order). One
  * hash-partitioned sort per key — never an O(n²) interval self-join,
  * never a driver-side sweep — so the shape survives any number of
  * keys; per-key interval counts bound the window, exactly like any
  * other per-key window operator.
  */
object Intervals {

  /** Merge overlapping-or-touching-at-a-point intervals per key.
    * Input columns: `key`, `st`, `en` (longs; en exclusive or
    * inclusive — the merge only compares, never adds), `tie` (unique
    * within key, makes boundaries tie-stable). Output: one row per
    * island — (key, island_id, i_st, i_en). Intervals with st equal
    * to an earlier interval's en MERGE (st > prevMax opens; st ==
    * prevMax continues), matching the closed-interval reading. */
  def mergePerKey(df: DataFrame, key: String, st: String, en: String,
                  tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(st), col(tie))
    val prevMax = max(col(en))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("new_island",
        when(prevMax.isNull || col(st) > prevMax, 1L).otherwise(0L))
      .withColumn("island_id",
        sum(col("new_island"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("island_id"))
      .agg(min(col(st)).as("i_st"), max(col(en)).as("i_en"))
  }

  /** Per-key coverage summary over the merged islands:
    * (key, n_islands, covered, max_island). */
  def coveragePerKey(islands: DataFrame, key: String): DataFrame =
    islands.groupBy(col(key))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("i_en") - col("i_st")).as("covered_ms"),
        max(col("i_en") - col("i_st")).as("max_island_ms"))
}
