package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.PortableHash

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` / TABLESAMPLE draw from a per-partition RNG: the
  * sample changes with partitioning, engine, and run — unusable for a
  * reproducible corpus cut. Hash-gating a stable key instead gives a
  * sample that is (a) identical across engines/runs/partitionings,
  * (b) embarrassingly parallel (a per-row filter after the scan — no
  * shuffle at all), (c) consistent across tables: any table sharing
  * the key samples the *same* entities, which is how you cut a
  * multi-table corpus coherently at 100 TB.
  *
  * Not in the reference (no sampling surface at all); extension per
  * the training-pipeline mandate.
  */
object Sampling {

  /** Keep rows whose spread key hash falls in [0, pct% · M): a
    * deterministic ~pct% Bernoulli sample, exact same rows everywhere.
    * (spread, not raw h: raw h clusters for short keys — see
    * [[PortableHash.spread]].) */
  def hashSample(df: DataFrame, key: Column, pct: Double): DataFrame = {
    val cut = math.round(PortableHash.M * pct / 100.0)
    df.where(PortableHash.spread(PortableHash.h(key)) < lit(cut))
  }

  /** SQL-twin predicate for [[hashSample]] (DuckDB). */
  def hashSampleSql(keyExpr: String, pct: Double): String =
    s"${PortableHash.spreadSql(PortableHash.hSql(keyExpr))}" +
      s" < ${math.round(PortableHash.M * pct / 100.0)}"

  /** Deterministic stratified sample: the `n` rows of each stratum
    * with the smallest (spread hash, key) — a seeded reservoir analog
    * whose output is a stable function of the data. Ranking runs as
    * one window per stratum; at scale this is the same
    * partial-top-k-per-partition shape WindowGroupLimit optimizes. */
  def stratified(df: DataFrame, stratum: Column, key: Column,
                 n: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(PortableHash.spread(PortableHash.h(key)).asc, key.asc)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= n)
  }
}
