package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * The reference's only skew guard is dropping power users outright
  * (MAX_NUM_RATERS, `vectorSimilarities.py ≈L95–98` [R]). At scale the
  * engine keeps AQE skew-join splitting on (runtime re-plan), and adds
  * key salting for the aggregation-side hot keys AQE cannot split —
  * e.g. a viral item's pair counts.
  */
object Skew {

  /** Inner equi-join with the left side's hot keys spread over
    * `salts` partitions: left rows get a per-row salt, right rows are
    * replicated once per salt value. Semantically identical to
    * `left.join(right, key)`; cost = right side × salts, so use for
    * broadcast-sized or pre-filtered right sides. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted partial, then final) count aggregation for a
    * hot group key: groupBy(key, salt) → partial counts → groupBy(key)
    * — bounds any single reducer's input at rows/salts for the hottest
    * key. Spark's own partial aggregation usually suffices; this is
    * for the adversarial case where the map-side hash table degrades. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))
}
