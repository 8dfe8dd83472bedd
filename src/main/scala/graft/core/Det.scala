package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every oracle-checked query.
  *
  * The driver hash-compares our parquet output against DuckDB output
  * (SURVEY.md §7.4). Floating-point aggregation order differs between
  * engines, so every double that crosses the comparison boundary goes
  * through one of these combinators, each of which has a character-for-
  * character SQL twin that DuckDB evaluates to the *identical* double:
  *
  *  - [[r4]]: `floor(x*10000 + 0.5)/10000.0` — portable round-half-up
  *    at 4 decimals. Unlike `round()`, whose boundary behavior is
  *    implementation-defined (Spark rounds the exact decimal expansion,
  *    DuckDB scales-then-rints), this is a fixed sequence of IEEE-754
  *    ops, so both engines produce the same bits. Also never yields
  *    `-0.0` (the integer quotient of `floor` normalizes it away).
  *  - [[fsum4]]/[[fsum2]]: fixed-point sums. Each term is snapped to
  *    4 (resp. 2) decimals as a BIGINT; the integer sum is exact and
  *    therefore independent of partitioning/aggregation order — the
  *    one thing a distributed engine cannot otherwise promise.
  *
  * SQL twins (splice into oracle SQL):
  *   r4(x)    = floor(x*10000 + 0.5)/10000.0
  *   fsum4(x) = CAST(sum(CAST(floor(x*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0
  */
object Det {
  /** Portable round-half-up to 4 decimals (see class doc). */
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Portable round-half-up to 2 decimals. */
  def r2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Order-independent sum, fixed-point at 4 decimals. Exact while the
    * scaled sum stays under 2^63 (~9e14 in input units) — far above any
    * testdata aggregate; at 100 TB use [[fsumDec]] instead. */
  def fsum4(c: Column): Column =
    sum(floor(c * lit(10000.0) + lit(0.5)).cast("long")) / lit(10000.0)

  /** Order-independent sum, fixed-point at 2 decimals (money columns). */
  def fsum2(c: Column): Column =
    sum(floor(c * lit(100.0) + lit(0.5)).cast("long")) / lit(100.0)

  /** 128-bit-safe variant for 100 TB scale: same per-term snapping, but
    * the running sum is a DECIMAL(38,0) so ~1e24 scaled units fit. */
  def fsumDec4(c: Column): Column =
    sum(floor(c * lit(10000.0) + lit(0.5)).cast("decimal(38,0)"))
      .cast("double") / lit(10000.0)

  /** Fixed-point scaled value as a long: x in 1e-4 units. */
  def fx4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)).cast("long")
}
