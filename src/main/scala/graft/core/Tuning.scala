package graft.core

import org.apache.spark.sql.SparkSession

/** Session-bootstrap tuning confs — set ONCE at session construction,
  * where the tradeoff is visible, instead of mutated mid-query from
  * operator code (round-14 verdict #4: `Ranking.topKAgg` used to raise
  * the ObjectHashAggregate fallback threshold session-globally as a
  * side effect of BUILDING a lazy plan, which silently changed every
  * later ObjectHashAggregate in the session).
  *
  * Each entry documents its own blast radius:
  *
  *  - `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` =
  *    16M (default 128): ObjectHashAggregate switches to SORT-BASED
  *    aggregation after this many distinct keys per task — the sort
  *    is exactly what the bounded-heap top-k path
  *    ([[graft.core.Ranking.topKAgg]], [[graft.expr.TopKAgg]]) exists
  *    to avoid. Raising it keeps hash buffers for up to 16M keys per
  *    task for EVERY typed aggregate in the session, not just top-k.
  *    Budget: the largest buffer this engine registers is
  *    TopKBuffer(10) ≈ 0.4 KB, so a worst-case 16M-key task map is a
  *    few GB on the 90g gate heap and a few hundred MB at bench
  *    shapes; on a real cluster rows-per-task shrink with executor
  *    count. Correctness does NOT depend on the conf: the sort-based
  *    fallback is row-identical (ExprSpec proves it by forcing the
  *    threshold below the group count), only slower.
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong` = true: some rounds'
  *    events.parquet shipped TIMESTAMP(NANOS), which Spark 4 refuses
  *    natively (PARQUET_TYPE_ILLEGAL); the flag reads the column as
  *    LONG and [[graft.io.Sources.normalizeEventTs]] lands it on
  *    µs-precision TimestampType. "true" is the only workable value
  *    for this corpus (without it the read FAILS, nothing degrades),
  *    so the reader keeps an idempotent fail-safe `set` for sessions
  *    built outside these entry points.
  */
object Tuning {
  val SessionDefaults: Seq[(String, String)] = Seq(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
      -> "16777216",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    //  - `spark.sql.codegen.hugeMethodLimit` = 8000 (default 65535):
    //    HotSpot refuses to JIT-compile any method above 8000
    //    bytecodes (-XX:HugeMethodLimit, not configurable), so a
    //    whole-stage-codegen method between 8000 and 65535 bytecodes
    //    runs INTERPRETED forever. The fused 11-aggregate pair-moment
    //    build generates exactly such a method: measured 17.0 s at
    //    sf0.1 under the default vs 5.1 s with the limit at 8000
    //    (Spark falls back to non-wholestage execution for that one
    //    stage, whose smaller per-expression methods all JIT). 8000
    //    matches the JVM's own limit, so the only stages affected are
    //    those that could never be JIT-compiled anyway — execution
    //    semantics are unchanged, and the setting is host-independent
    //    (the bytecode limit is a HotSpot constant, identical on any
    //    cluster JVM). r16 optimization round, guide §4.
    "spark.sql.codegen.hugeMethodLimit" -> "8000")

  /** Fold the defaults into a builder (every graft main + the test
    * session apply this, so no operator needs a session mutation). */
  def defaults(b: SparkSession.Builder): SparkSession.Builder =
    SessionDefaults.foldLeft(b) { case (acc, (k, v)) => acc.config(k, v) }
}
