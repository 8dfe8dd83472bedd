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
    val spark = graft.core.Tuning.defaults(
      SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // A/B harness knob for the r16 relayout measurements
      .config("spark.graft.relayout.enabled",
        sys.env.getOrElse("SPARK_GRAFT_RELAYOUT", "true"))
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
        SparkEntry.sharedComponents.foreach { case (n, f) =>
          timed(s"shared:$n") { f(spark, sfDir); 0L }
        }
      case c if c.startsWith("shared:") =>
        val n = c.stripPrefix("shared:")
        val f = SparkEntry.sharedComponents.toMap.apply(n)
        timed(c) { f(spark, sfDir); 0L }
      case q =>
        timed(q) { SparkEntry.queries(q)(spark, sfDir).count() }
    }
    spark.stop()
  }
}
