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
  def mat(sql: String): String = {
    // Classify every `name AS (` site: it is a CTE head iff the
    // preceding token is WITH/RECURSIVE, or a comma continuing a
    // list whose previous same-paren-depth item was itself a CTE
    // head. This is what a naive regex cannot express — `), w2 AS (`
    // in a multi-window clause and `), cte2 AS (` in a WITH list are
    // byte-identical locally and only the list opener (WITH vs
    // WINDOW) at the same depth distinguishes them. Paren depth is
    // tracked outside '…' string literals and outside `--` line
    // comments — an apostrophe inside a comment ("engine's") must
    // not flip string state for the rest of the text, which would
    // silently suppress MATERIALIZED on every later CTE head.
    val n = sql.length
    val depthAt = new Array[Int](n)
    val inStrAt = new Array[Boolean](n)
    var d = 0; var inStr = false; var inCmt = false
    var i = 0
    while (i < n) {
      depthAt(i) = d; inStrAt(i) = inStr || inCmt
      val c = sql.charAt(i)
      if (inCmt) { if (c == '\n') inCmt = false }
      else if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' => inCmt = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    val m = java.util.regex.Pattern
      .compile("""\b(\w+)\s+AS\s*\(""").matcher(sql)
    val out = new java.lang.StringBuilder
    var last = 0
    val lastKind = scala.collection.mutable.Map.empty[Int, Boolean]
    while (m.find()) {
      val nameStart = m.start(1)
      if (!inStrAt(nameStart)) {
        val dep = depthAt(nameStart)
        var j = nameStart - 1
        while (j >= 0 && sql.charAt(j).isWhitespace) j -= 1
        val isCte =
          if (j >= 0 && sql.charAt(j) == ',')
            lastKind.getOrElse(dep, false)
          else {
            var k = j
            while (k >= 0 && (sql.charAt(k).isLetterOrDigit ||
              sql.charAt(k) == '_')) k -= 1
            val prev =
              if (j >= 0) sql.substring(k + 1, j + 1).toUpperCase else ""
            prev == "WITH" || prev == "RECURSIVE"
          }
        lastKind(dep) = isCte
        if (isCte) {
          out.append(sql, last, nameStart).append(m.group(1))
            .append(" AS MATERIALIZED (")
          last = m.end()
        }
      }
    }
    out.append(sql, last, n)
    out.toString
  }

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
