package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift kernels shared by the scored batch monitor
  * (`q_psi_drift`) and the streaming gate
  * ([[graft.streaming.StreamOps.psiMonitor]]) — the same
  * batch/stream twin discipline as the dedup gate: ONE formula
  * implementation, so the two surfaces cannot drift from each other.
  *
  * PSI here is the bit-base variant (conventionally natural log;
  * ln = log2·ln2 is a constant factor, thresholds rescale), computed
  * on an EXACT integer path: add-1 smoothed counts, 2²⁰-scaled
  * shares, and log2(p/q) as the integer-log2 of cross products
  * (log2Fx(n_ref·tc) − log2Fx(n_cur·tr)) — the fraction never
  * materializes as a double.
  */
object Drift {
  /** Equal-width 10-bucket histogram of `n_chars` over [0, mx],
    * add-1 smoothed (PSI's log blows up on an empty bucket; the +1
    * prior is the standard fix and keeps log2Fx positive). Emits all
    * 10 buckets even when empty. Rows with n_chars > mx clamp into
    * bucket 9 — the stream twin freezes edges at reference time, so a
    * batch drifting toward LONGER documents must land in the top
    * bucket (and register as drift) rather than fall off the
    * histogram entirely. */
  def lengthHistogram(rows: DataFrame, mx: Long): DataFrame = {
    val s = rows.sparkSession
    s.range(0, 10).select(col("id").as("bucket"))
      .join(rows
        .select(least(expr(s"(n_chars * 10) div ${mx + 1}"), lit(9L))
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("c0")),
        Seq("bucket"), "left")
      .select(col("bucket"),
        (coalesce(col("c0"), lit(0L)) + 1L).as("n"))
  }

  /** Per-bucket PSI terms over a (bucket, n_ref, n_cur) frame:
    * adds `psi_term_fx` = (p_fx − q_fx)·lg_fx at 2²⁰·2²⁰ scale.
    * Totals ride a 1-row broadcast — scan speed at any size. */
  def psiTerms(counts: DataFrame): DataFrame = {
    val S = LmScore.LogScale
    val tot = counts.agg(sum(col("n_ref")).as("tr"),
      sum(col("n_cur")).as("tc"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p_fx", expr(s"(n_ref * $S) div tr"))
      .withColumn("q_fx", expr(s"(n_cur * $S) div tc"))
      .withColumn("lg_fx",
        LmScore.log2FxCol(col("n_ref") * col("tc")) -
          LmScore.log2FxCol(col("n_cur") * col("tr")))
      .withColumn("psi_term_fx",
        (col("p_fx") - col("q_fx")) * col("lg_fx"))
  }
}
