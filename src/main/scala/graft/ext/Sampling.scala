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

  /** Deterministic train/val/test split assignment: each row lands in
    * exactly one named band of the spread-hash ring, by cumulative
    * percentage. Properties a training pipeline needs and random
    * splits don't give: stable under re-runs, partitioning and
    * engine; adding data never moves an EXISTING row between splits
    * (its hash doesn't change); and it is a per-row gate — no
    * shuffle, no state. Cuts are integer driver constants shared with
    * the SQL twin. */
  def splitAssign(df: DataFrame, key: Column,
                  splits: Seq[(String, Double)]): DataFrame = {
    val cuts = splitCuts(splits)
    val g = PortableHash.spread(PortableHash.h(key))
    val assigned = cuts.tail.foldLeft(
      when(g < lit(cuts.head._2), lit(cuts.head._1))) {
      case (acc, (name, hi)) => acc.when(g < lit(hi), lit(name))
    }
    df.withColumn("split", assigned)
  }

  /** Cumulative integer cuts on [0, M) for [[splitAssign]] — the last
    * band is clamped to M so percentages that sum to 100 cover the
    * whole ring (no unassigned rows from rounding). */
  def splitCuts(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty &&
      math.abs(splits.map(_._2).sum - 100.0) < 1e-9,
      "split percentages must sum to 100")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.map(_._1).zip(cum).zipWithIndex.map { case ((n, c), i) =>
      (n, if (i == splits.size - 1) PortableHash.M.toLong
          else math.round(PortableHash.M * c / 100.0))
    }
  }

  /** SQL twin of [[splitAssign]]'s CASE (DuckDB). */
  def splitAssignSql(keyExpr: String,
                     splits: Seq[(String, Double)]): String = {
    val g = PortableHash.spreadSql(PortableHash.hSql(keyExpr))
    val whens = splitCuts(splits).map { case (n, hi) =>
      s"WHEN $g < $hi THEN '$n'"
    }.mkString(" ")
    s"CASE $whens END"
  }

  /** Weighted dataset mix — the training-mix primitive ("1.5 epochs of
    * src0, half of src1, a tenth of src2"). Each row gets
    * `floor(rate)` whole copies plus one more when its spread key hash
    * clears the fractional cut; copies are numbered `copy_id` = 1…n.
    * Cuts are precomputed on the driver as integers, so the engine and
    * oracle share exact constants (no runtime float arithmetic), and
    * the whole thing is a per-row gate + generate — shuffle-free.
    *
    * Rows are filtered to `n_copies > 0` BEFORE the sequence: Spark's
    * `sequence(1, 0)` counts DOWN ([1,0]), it does not produce empty. */
  def weightedMix(df: DataFrame, source: Column, key: Column,
                  rates: Map[String, Double],
                  defaultRate: Double): DataFrame = {
    def parts(r: Double): (Long, Long) = {
      require(r >= 0, s"negative mix rate $r")
      val w = math.floor(r).toLong
      (w, math.round((r - w) * PortableHash.M))
    }
    val (dw, dc) = parts(defaultRate)
    val whole = rates.foldLeft(lit(dw)) { case (acc, (s, r)) =>
      when(source === s, lit(parts(r)._1)).otherwise(acc) }
    val cut = rates.foldLeft(lit(dc)) { case (acc, (s, r)) =>
      when(source === s, lit(parts(r)._2)).otherwise(acc) }
    val gate = PortableHash.spread(PortableHash.h(key))
    df.withColumn("n_copies",
        whole + when(gate < cut, lit(1L)).otherwise(lit(0L)))
      .where(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(1L), col("n_copies"))))
  }

  /** SQL twin of [[weightedMix]]'s copy computation (DuckDB): CASE
    * fragments over the same driver-side integer constants. Splice as
    * `SELECT …, $whole AS whole, $cut AS cut` then
    * `unnest(generate_series(1, n_copies)) AS copy_id`. */
  def weightedMixSql(sourceExpr: String, keyExpr: String,
                     rates: Map[String, Double],
                     defaultRate: Double): (String, String) = {
    def parts(r: Double): (Long, Long) = {
      val w = math.floor(r).toLong
      (w, math.round((r - w) * PortableHash.M))
    }
    def cases(pick: Double => Long, dflt: Long): String =
      rates.toSeq.sortBy(_._1).map { case (s, r) =>
        s"WHEN $sourceExpr = '$s' THEN ${pick(r)}"
      }.mkString("CASE ", " ", s" ELSE $dflt END")
    val whole = cases(r => parts(r)._1, parts(defaultRate)._1)
    val cut = cases(r => parts(r)._2, parts(defaultRate)._2)
    val gate = PortableHash.spreadSql(PortableHash.hSql(keyExpr))
    (s"($whole + CASE WHEN $gate < $cut THEN 1 ELSE 0 END)", gate)
  }

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
