package graft.rel

/** String helpers for authoring DuckDB oracle SQL that is the exact
  * twin of the engine's Column expressions (see [[graft.core.Det]]).
  */
object Oracle {
  /** SQL twin of Det.r4: portable round-half-up at 4 decimals. */
  def r4(expr: String): String = s"floor(($expr)*10000 + 0.5)/10000.0"

  /** SQL twin of Det.r2. */
  def r2(expr: String): String = s"floor(($expr)*100 + 0.5)/100.0"

  /** SQL twin of Det.fsum4: order-independent fixed-point sum. */
  def fsum4(expr: String): String =
    s"CAST(sum(CAST(floor(($expr)*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0"

  /** SQL twin of Det.fsum2. */
  def fsum2(expr: String): String =
    s"CAST(sum(CAST(floor(($expr)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0"
}
