package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-layout utilities — the 100 TB co-partitioning story made
  * concrete (SURVEY.md §7.5).
  *
  * The pair-generation self-join shuffles the full ratings table on
  * `user_id` every run. Written bucketed-by-user once, both join
  * sides arrive pre-partitioned and the exchange disappears — the
  * single biggest shuffle in the CF pipeline is paid at ingest time
  * instead of per-query. BucketingSpec asserts the shuffle-free plan.
  */
object Bucketing {

  /** Write a frame as a bucketed+sorted managed table (parquet).
    * Bucketing requires the catalog path (`saveAsTable`) — plain
    * `.parquet(path)` writes carry no bucket metadata. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    by: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, by)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
