package graft

import org.apache.spark.sql.functions._
import graft.core.PortableHash
import graft.expr.GraftFunctions

/** The native hash expression must be bit-identical to the composed
  * Column formula (whose arithmetic the DuckDB oracles spell out). */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("native graft_hash equals the composed formula on corpus shingles") {
    GraftFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val ws = split(col("text"), " ")
    val sh = docs.where(size(ws) >= 3).select(explode(
      transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2)))).as("s"))
    val mismatches = sh.select(
      call_function("graft_hash", col("s")).as("fast"),
      PortableHash.h(col("s")).as("composed"))
      .where(col("fast") =!= col("composed")).count()
    assert(mismatches === 0L)
  }

  test("native graft_hash equals the composed formula on edge strings") {
    GraftFunctions.ensureRegistered(spark)
    val edge = Seq("", "a", "ab", "abc", "abcd", "abcde", "#", "     ",
      "a a a", "zzzzzzzzzzzzzzzzzzzzzzzz").toDF("s")
    val bad = edge.select(
      call_function("graft_hash", col("s")).as("fast"),
      PortableHash.h(col("s")).as("composed"))
      .where(col("fast") =!= col("composed")).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("graft_hash is callable from SQL after registration") {
    GraftFunctions.ensureRegistered(spark)
    val v = spark.sql("SELECT graft_hash('spark')").collect()(0).getInt(0)
    assert(v >= 0 && v < PortableHash.M)
  }
}
