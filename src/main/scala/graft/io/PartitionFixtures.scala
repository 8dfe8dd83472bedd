package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet fixture: the `events` table re-laid-out
  * with `partitionBy(event_type)`, so a scored query can exercise the
  * write-side partitioning AND the read-side partition PRUNING that a
  * 100 TB deployment lives on (a type-filtered scan must touch only
  * the matching directories — `PartitionFilters` in the scan node,
  * asserted in ApiSpec). Follows the [[DialectFixtures]] write-once
  * discipline: per-sf-leaf paths, `_GRAFT_SRC` marker, loud collision
  * failure.
  *
  * The fixture stores event-time as the PORTABLE epoch-day integer
  * (`unix_millis div 86400000`, the q_window_range idiom) rather than
  * the raw TIMESTAMP(NANOS) — the oracle recomputes the same integer
  * from the source table with `epoch_ms(ts) // 86400000`, so the
  * round-trip check never touches engine timestamp semantics.
  *
  * At scale the partition column choice matters more than here:
  * event_type is low-cardinality (5 values) so each partition is
  * large and splittable — the layout a real pipeline wants. A
  * high-cardinality partition key (user_id, day×type×region) would
  * produce millions of small files; that anti-pattern is documented
  * here instead of demonstrated.
  */
object PartitionFixtures {

  def eventsByTypePath(dir: String): String =
    s"${DialectFixtures.BaseDir}/${DialectFixtures.leaf(dir)}/events_by_type"

  /** Render events partitioned by `event_type`; returns the root path.
    * Write-once per (fixture path, source dir) — see
    * [[DialectFixtures.once]]. */
  def writeEventsByType(spark: SparkSession, dir: String): String = {
    val path = eventsByTypePath(dir)
    DialectFixtures.once(path, dir) {
      Sources.events(spark, dir)
        .select(col("event_id"), col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          col("value"), col("event_type"))
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    }
    path
  }
}
