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

  /** ORC sink (columnar alternative to parquet; same pushdown and
    * vectorization properties on read). */
  def writeOrc(df: DataFrame, path: String,
               partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }

  /** Parquet sink with an explicit row-group size — the knob that
    * decides SCAN parallelism at 100 TB. Spark assigns read splits by
    * `spark.sql.files.maxPartitionBytes` (default 128 MB), but a split
    * can only start at a row-group boundary: a file written as one
    * giant row group serializes every reader on that file no matter
    * how many executors are idle, while ~128 MB row groups let a
    * 1000-executor scan fan out across every group. (All driver
    * testdata is single-row-group — fine at sf0.1, the wrong layout
    * for the engine's OWN outputs at scale, which is why the sinks
    * set it explicitly instead of inheriting parquet-mr's default.)
    * `rowGroupBytes` also bounds the writer's buffering memory per
    * open file. Page size scales down with tiny test row groups so
    * parquet-mr's "page per group" floor doesn't quietly merge them. */
  def writeParquetRowGrouped(df: DataFrame, path: String,
                             rowGroupBytes: Long = 128L << 20): Unit =
    df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .option("parquet.page.size",
        math.max(1024L, rowGroupBytes / 8).toString)
      .parquet(path)

  /** Row groups of the single data file at `path` (footer read only —
    * no data pages touched): the write-side assertion surface for
    * [[writeParquetRowGrouped]]. */
  def parquetRowGroups(spark: org.apache.spark.sql.SparkSession,
                       path: String): Int = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        dir.listFiles().filter(_.getName.endsWith(".parquet"))
      else Array(dir)
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toURI),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.size finally r.close()
    }.sum
  }

  /** Compact a parquet directory into ~targetMB files — the
    * small-files remedy (every file costs a task + namenode entry; a
    * 100 TB table accreted from streaming micro-batches degrades every
    * scan until compacted). Sizes from the actual on-disk bytes, not
    * row counts; coalesce (not repartition) so compaction itself does
    * not shuffle. Writes to `out` (compacting in place would destroy
    * the input on job failure). */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     in: String, out: String, targetMB: Int = 128): Unit = {
    val bytes = {
      val dir = new java.io.File(in)
      if (dir.isDirectory)
        dir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).sum
      else dir.length
    }
    val files = math.max(1, (bytes / (targetMB.toLong << 20)).toInt +
      (if (bytes % (targetMB.toLong << 20) > 0) 1 else 0))
    spark.read.parquet(in).coalesce(files)
      .write.mode("overwrite").parquet(out)
  }
}
