package graft
import org.apache.spark.sql.SparkSession

/** Physical-plan inspection harness: prints `explain("formatted")` for
  * selected queries so scan pushdown, broadcast choices, codegen spans
  * and window-limit pushdown can be audited (and tracked in PLANS.md).
  * Usage: runMain graft.Plans [sfDir] [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q_scan_filter_project", "q_join_broadcast_dims",
      "q_topk_neighbors", "q_agg_pricing_summary", "q_parse_ratings")
    val spark = graft.core.Tuning.defaults(SparkSession.builder()
      .master("local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
