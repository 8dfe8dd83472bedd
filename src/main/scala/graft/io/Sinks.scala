package graft.io

import org.apache.spark.sql.DataFrame
import graft.core.Ranking

/** Sink surface (SURVEY.md §2.2 "sinks" row).
  *
  * The reference's only sink is semicolon-joined text lines
  * (`SemicolonValueProtocol`, `moviesSimilarities.py ≈L33–37` [R]);
  * [[writeSemicolon]] reproduces it byte-for-byte. Parquet/CSV are the
  * engine-native sinks a scale deployment actually uses — columnar,
  * splittable, statistics-bearing.
  */
object Sinks {

  /** Reference-compatible protocol sink: one `;`-joined line per row,
    * no header, plain text files. */
  def writeSemicolon(df: DataFrame, cols: Seq[String], path: String): Unit =
    Ranking.semicolonProtocol(df, cols).write.mode("overwrite").text(path)

  /** Columnar sink of record for 100 TB outputs; optional partition
    * columns turn downstream reads into partition-pruned scans. */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Interop CSV sink (configurable delimiter — `;` matches the
    * book-crossing dialect, `|` the movies dialect). */
  def writeCsv(df: DataFrame, path: String, sep: String = ";",
               header: Boolean = false): Unit =
    df.write.mode("overwrite")
      .option("sep", sep).option("header", header.toString)
      .csv(path)

  /** JSON-lines sink — the interchange twin of
    * [[graft.io.Sources.jsonRatings]]. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
