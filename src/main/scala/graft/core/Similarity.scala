package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's five similarity metrics (`metrics.py` [R]) as pure
  * Column expressions over aggregated moments — no UDFs, fully inside
  * whole-stage codegen (SURVEY.md §2.4).
  *
  * Inputs are the per-pair moments (n, Σx, Σy, Σx², Σy², Σxy) plus the
  * per-item rater counts (n_x, n_y). All callers pass moments already
  * cast to DOUBLE (see [[Moments]]); each formula below is a fixed
  * sequence of IEEE-754 ops so the DuckDB oracle twin evaluates to the
  * identical bits.
  *
  * Edge conventions pinned by the reference (SURVEY.md Appendix B):
  *  - zero denominator → 0.0 (NOT null/NaN; differs from SQL `corr`):
  *    `metrics.py ≈L12–25 (correlation)` [R];
  *  - jaccard with empty union → 0.0: `metrics.py ≈L28–36` [R];
  *  - regularized correlation shrinks toward PRIOR_CORRELATION with
  *    weight n/(n+PRIOR_COUNT): `metrics.py ≈L65–80` [R].
  */
object Similarity {

  /** `vectorSimilarities.py ≈L26–33` [R] (constants' exact values are
    * [R-med]; see SURVEY.md §0). */
  val PriorCount: Double      = 10.0
  val PriorCorrelation: Double = 0.0
  val MinNumRaters: Int       = 2
  val MaxNumRaters: Int       = 10000
  val MinIntersection: Int    = 0

  /** Pearson from moments, 0.0 on zero/invalid denominator.
    * `metrics.py ≈L12–25` [R]. The `greatest(_, 0)` clamps tiny
    * negative values that double rounding of n·Σx²−(Σx)² can produce;
    * oracle twin uses the same clamp so both engines agree. */
  def correlation(n: Column, sxy: Column, sx: Column, sy: Column,
                  sxx: Column, syy: Column): Column = {
    val num = n * sxy - sx * sy
    val den = sqrt(greatest(n * sxx - sx * sx, lit(0.0))) *
              sqrt(greatest(n * syy - sy * sy, lit(0.0)))
    when(den === lit(0.0), lit(0.0)).otherwise(num / den)
  }

  /** `(corr + 1)/2` → [0,1]. Defined in `metrics.py ≈L39–50` [R] but
    * never wired into either reference pipeline [R-med]; we wire it. */
  def normalizedCorrelation(n: Column, sxy: Column, sx: Column, sy: Column,
                            sxx: Column, syy: Column): Column =
    (correlation(n, sxy, sx, sy, sxx, syy) + lit(1.0)) / lit(2.0)

  /** Cosine over the co-rating vectors, 0.0 on zero denominator.
    * `metrics.py ≈L53–62` [R] (caller passes √Σx², √Σy² — folded in). */
  def cosine(sxy: Column, sxx: Column, syy: Column): Column = {
    val den = sqrt(sxx) * sqrt(syy)
    when(den === lit(0.0), lit(0.0)).otherwise(sxy / den)
  }

  /** `common/(n_x + n_y − common)`, 0.0 on empty union.
    * `metrics.py ≈L28–36` [R]. Counts are exact longs upstream. */
  def jaccard(common: Column, nx: Column, ny: Column): Column = {
    val union = nx + ny - common
    when(union === lit(0.0), lit(0.0)).otherwise(common / union)
  }

  /** Shrinkage toward the prior: `w·corr + (1−w)·prior`, w=n/(n+k).
    * `metrics.py ≈L65–80` [R]; constants `vectorSimilarities.py
    * ≈L28–30` [R]. */
  def regularizedCorrelation(n: Column, sxy: Column, sx: Column, sy: Column,
                             sxx: Column, syy: Column,
                             virtualCount: Double = PriorCount,
                             priorCorrelation: Double = PriorCorrelation): Column = {
    val unregularized = correlation(n, sxy, sx, sy, sxx, syy)
    val w = n / (n + lit(virtualCount))
    w * unregularized + (lit(1.0) - w) * lit(priorCorrelation)
  }

  /** SQL twins of the five metrics for DuckDB oracles. Each takes the
    * moment column names (already-DOUBLE expressions) and returns the
    * exact same arithmetic as the Column versions above. */
  object Sql {
    def corr(n: String, sxy: String, sx: String, sy: String,
             sxx: String, syy: String): String =
      s"""CASE WHEN sqrt(greatest($n*$sxx - $sx*$sx, 0.0)) * sqrt(greatest($n*$syy - $sy*$sy, 0.0)) = 0.0
         | THEN 0.0
         | ELSE ($n*$sxy - $sx*$sy) / (sqrt(greatest($n*$sxx - $sx*$sx, 0.0)) * sqrt(greatest($n*$syy - $sy*$sy, 0.0)))
         | END""".stripMargin.replace("\n", " ")

    def cosine(sxy: String, sxx: String, syy: String): String =
      s"CASE WHEN sqrt($sxx)*sqrt($syy) = 0.0 THEN 0.0 ELSE $sxy/(sqrt($sxx)*sqrt($syy)) END"

    def jaccard(common: String, nx: String, ny: String): String =
      s"CASE WHEN $nx + $ny - $common = 0.0 THEN 0.0 ELSE $common/($nx + $ny - $common) END"

    def regCorr(n: String, sxy: String, sx: String, sy: String,
                sxx: String, syy: String): String =
      s"(($n/($n + ${PriorCount})) * (${corr(n, sxy, sx, sy, sxx, syy)}) " +
        s"+ (1.0 - $n/($n + ${PriorCount})) * ${PriorCorrelation})"

    def normCorr(n: String, sxy: String, sx: String, sy: String,
                 sxx: String, syy: String): String =
      s"((${corr(n, sxy, sx, sy, sxx, syy)}) + 1.0) / 2.0"
  }
}
