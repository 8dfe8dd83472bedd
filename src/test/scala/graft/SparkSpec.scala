package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + fixture helpers. One session per JVM (suites run
  * forked in one JVM; `lazy val` in the companion shares it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf001 = "/root/testdata/sf0.001"

  /** The FIXTURES.md §3 toy ratings as a DataFrame with `rating_i`
    * fixed-point units, matching [[graft.io.Sources.ratings]] shape. */
  def toyRatings: DataFrame = {
    import spark.implicits._
    Seq(
      ("u1", "A", 4.0), ("u1", "B", 3.0), ("u1", "C", 1.0),
      ("u2", "A", 5.0), ("u2", "B", 4.0),
      ("u3", "A", 1.0), ("u3", "C", 5.0),
      ("u4", "B", 2.0), ("u4", "C", 4.0))
      .toDF("user_id", "item_id", "rating")
      .withColumn("rating_i",
        floor(col("rating") * 10000 + 0.5).cast("long"))
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.core.Tuning.defaults(SparkSession.builder()
      .master("local[4]"))
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
