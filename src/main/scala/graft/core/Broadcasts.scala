package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Conf-gated broadcast: the pattern for join sides that are USUALLY
  * tiny (id dictionaries, node→rep maps, distinct catalogs) but are
  * O(entities) — forcing `broadcast()` on those OOMs the driver the
  * day the entity space stops fitting in memory, while dropping the
  * hint costs a needless shuffle at every sane scale. The gate pays
  * one count (a cache scan when the frame is persisted) and falls
  * back to a shuffle join past the limit. */
object Broadcasts {
  val DefaultMaxRows = 10000000L // ~160 MB serialized for two longs

  def maxRows(df: DataFrame, confKey: String,
              default: Long = DefaultMaxRows): Long =
    df.sparkSession.conf.getOption(confKey).map(_.toLong).getOrElse(default)

  /** broadcast(df) iff df has at most conf(confKey) rows. */
  def gated(df: DataFrame, confKey: String,
            default: Long = DefaultMaxRows): DataFrame =
    if (df.count() <= maxRows(df, confKey, default)) broadcast(df) else df
}
