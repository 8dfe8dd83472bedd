package graft.core

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized intermediates.
  *
  * The query inventory is a set of independent entry points, but many
  * share expensive sub-plans (the ratings view, the pairwise moment
  * table, the shingle/LSH tables). A real engine materializes such
  * shared intermediates once per session; this registry does exactly
  * that with `persist(MEMORY_AND_DISK)` — spill-safe, and keyed by
  * (session, dir, name) so tests/verify/bench sessions never mix.
  *
  * At 100 TB the equivalent is a lifecycle-managed cached table (or a
  * bucketed materialized view); MEMORY_AND_DISK keeps the local[32]
  * behavior honest — data larger than executor memory spills instead
  * of OOMing.
  */
object Cache {
  private val store = TrieMap.empty[(String, String), DataFrame]

  /** Session memo key: applicationId is unique per SparkContext and is
    * never reused the way a GC'd session's identity hash can be — the
    * uniform key for every session-scoped memo in the engine. */
  def sessionKey(spark: SparkSession): String =
    spark.sparkContext.applicationId

  def getOrPersist(spark: SparkSession, name: String, dir: String)
                  (build: => DataFrame): DataFrame =
    store.getOrElseUpdate(
      (sessionKey(spark), s"$name:$dir"), {
        val df = build
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df
      })
}
