package graft

import org.apache.spark.sql.functions._
import graft.io.{Relayout, Sources}

/** The scan-parallelism relayout (io.Relayout) must be invisible to
  * semantics: same rows, same schema, more files. These are the
  * optimization-round guards for the r16 layout change — a relayout
  * that dropped, duplicated or re-typed one row would otherwise only
  * surface in the full DuckDB verify. */
class RelayoutSpec extends SparkSpec {

  test("relayout copy is row-identical to the raw table (all facts)") {
    for (name <- Seq("lineitem", "orders", "documents", "embeddings")) {
      val raw = spark.read.parquet(s"$sf001/$name.parquet")
      val routed = Sources.table(spark, sf001, name)
      assert(routed.schema.map(f => (f.name, f.dataType)) ===
        raw.schema.map(f => (f.name, f.dataType)), s"$name schema")
      assert(routed.count() === raw.count(), s"$name count")
      assert(routed.exceptAll(raw).isEmpty && raw.exceptAll(routed).isEmpty,
        s"$name rows differ")
    }
  }

  test("relayout actually widens the scan (more than one input split)") {
    val routed = Sources.table(spark, sf001, "lineitem")
    assert(routed.rdd.getNumPartitions > 1,
      "lineitem relayout should produce multiple scan splits")
  }

  test("events route: ts lands on TimestampType through the copy") {
    val ev = Sources.events(spark, sf001)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // values must match the raw read bit-for-bit
    val rawTs = Sources.normalizeEventTs(
      spark.read.parquet(s"$sf001/events.parquet"))
      .agg(sum(unix_micros(col("ts")))).head().getLong(0)
    val gotTs = ev.agg(sum(unix_micros(col("ts")))).head().getLong(0)
    assert(gotTs === rawTs)
  }

  test("scale guard: a table over the byte budget is left alone") {
    spark.conf.set("spark.graft.relayout.max.bytes", "1")
    try {
      // fresh name not memoized for this budget: use a dir-distinct key
      val p = Relayout.path(spark, "/root/testdata/sf0.01", "lineitem")
      assert(p === "/root/testdata/sf0.01/lineitem.parquet",
        "over-budget table must read the original path")
    } finally spark.conf.unset("spark.graft.relayout.max.bytes")
  }
}
