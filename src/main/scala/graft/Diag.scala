package graft

import org.apache.spark.sql.SparkSession

/** Ops diagnostic: build the session-shared caches and print what they
  * actually cost (memory/disk per cached RDD). Used to size the
  * `_shared_build` footprint — e.g. verifying that the shingle cache
  * slimming (strings → 8-byte hashes) shows up as real bytes. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tuning.defaults(
      SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.rel.SimQueries.warm(spark, sfDir)
    graft.ext.ExtQueries.warm(spark, sfDir)
    val infos = spark.sparkContext.getRDDStorageInfo
    infos.sortBy(-_.memSize).foreach { i =>
      val name = Option(i.name).getOrElse("?").linesIterator.next().take(100)
      println(f"CACHE mem=${i.memSize / 1048576.0}%8.1f MiB " +
        f"disk=${i.diskSize / 1048576.0}%6.1f MiB parts=${i.numCachedPartitions}%3d  $name")
    }
    println(f"CACHE_TOTAL mem=${infos.map(_.memSize).sum / 1048576.0}%.1f MiB " +
      f"disk=${infos.map(_.diskSize).sum / 1048576.0}%.1f MiB")
    spark.stop()
  }
}
