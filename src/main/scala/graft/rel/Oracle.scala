package graft.rel

/** String helpers for authoring DuckDB oracle SQL that is the exact
  * twin of the engine's Column expressions (see [[graft.core.Det]]).
  */
object Oracle {
  /** Pin every CTE in a DuckDB-side oracle as MATERIALIZED. For the
    * iterative replays (PageRank rounds, CC label rounds, k-core
    * peels, power iteration) each level references its predecessor
    * 2–3 times; DuckDB's default CTE inlining then expands the
    * replay tree EXPONENTIALLY in rounds — the q_graph_rank oracle
    * took ~20 minutes (and the k-core draft exhausted file handles)
    * where the materialized form takes 0.1 s with identical values.
    * Only for DuckDB-only texts — the verbatim two-engine q_sql_*
    * family cannot carry the hint (Spark has no MATERIALIZED). */
  def mat(sql: String): String =
    sql.replaceAll("""(?<!WINDOW )\b(\w+) AS \(""", "$1 AS MATERIALIZED (")

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
