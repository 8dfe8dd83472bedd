package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc attribution harness: time individual queries (pass a name
  * twice for cold+warm), the full `_shared_build`, or
  * `_shared_components` (the four warm chains run SERIALLY, each
  * under its own timer — the component split for attributing shared-
  * build growth). Prints the 1-min load average next to every timing
  * so a number taken under co-tenant noise indicts itself. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    def load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def timed(tag: String)(f: => Long): Unit = {
      val l0 = load
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $tag ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"rows=$n load=$l0%.2f")
    }
    args.tail.foreach {
      case "_shared_build" =>
        timed("_shared_build") { SparkEntry.warmShared(spark, sfDir); 0L }
      case "_shared_components" =>
        timed("shared:sim") { rel.SimQueries.warm(spark, sfDir); 0L }
        timed("shared:minhash") { ext.ExtQueries.warmMinhash(spark, sfDir); 0L }
        timed("shared:simhash") { ext.ExtQueries.warmSimhash(spark, sfDir); 0L }
        timed("shared:vectors") { ext.ExtQueries.warmVectors(spark, sfDir); 0L }
      case "shared:sim" =>
        timed("shared:sim") { rel.SimQueries.warm(spark, sfDir); 0L }
      case "shared:minhash" =>
        timed("shared:minhash") { ext.ExtQueries.warmMinhash(spark, sfDir); 0L }
      case "shared:simhash" =>
        timed("shared:simhash") { ext.ExtQueries.warmSimhash(spark, sfDir); 0L }
      case "shared:vectors" =>
        timed("shared:vectors") { ext.ExtQueries.warmVectors(spark, sfDir); 0L }
      case q =>
        timed(q) { SparkEntry.queries(q)(spark, sfDir).count() }
    }
    spark.stop()
  }
}
