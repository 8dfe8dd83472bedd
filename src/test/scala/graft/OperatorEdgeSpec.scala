package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Planted-edge cases for the round-9 closing operators: skyline
  * dominance corners, Gopher rule boundaries, SCD2 tie ordering, and
  * the recursive spine's gap row. Each case is a value the sf corpus
  * cannot be trusted to contain (exact boundary hits, co-located
  * duplicates, an empty month).
  */
class OperatorEdgeSpec extends SparkSpec {

  test("skyline keeps co-located duplicates and drops single-axis " +
    "dominated points") {
    import spark.implicits._
    // (part, size, cents): frontier = (1,100), (2,90)×2, (3,80);
    // dominated: (2,100) by (1,100) [same price, bigger size],
    // (3,95) by (2,90), (1,150) by (1,100) [same size, pricier]
    val p = Seq(
      (10L, 1L, 100L), (20L, 2L, 100L), (30L, 2L, 90L),
      (31L, 2L, 90L), (40L, 3L, 95L), (50L, 3L, 80L),
      (11L, 1L, 150L))
      .toDF("p_partkey", "p_size", "cents")
    val got = rel.RelQueries.skyline2d(p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 1L, 100L), (30L, 2L, 90L),
      (31L, 2L, 90L), (50L, 3L, 80L)))
  }

  test("gopher rule boundaries land keep-side exactly at the " +
    "published thresholds") {
    import spark.implicits._
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val docs = Seq(
      // 1: exactly 50 words of 4 chars — every rule boundary that can
      //    pass does (mean exactly 4.0, zero short); no stopwords
      doc(1L, Seq.fill(50)("wwww")),
      // 2: 49 words — word-count floor fails by one
      doc(2L, Seq.fill(49)("wwww")),
      // 3: 50 words of 3 chars — mean 3.0 < 4 floor fails
      doc(3L, Seq.fill(50)("www")),
      // 4: 60 words, exactly 3 short (5.0%) — r_short boundary PASS
      doc(4L, Seq.fill(57)("wwww") ++ Seq.fill(3)("xx")),
      // 5: 60 words, 4 short (6.7%) — r_short fails
      doc(5L, Seq.fill(56)("wwww") ++ Seq.fill(4)("xx")),
      // 6: both stopwords present — r_stop passes
      doc(6L, Seq.fill(48)("wwww") ++ Seq("the", "a")),
      // 7: only one stopword kind (twice) — r_stop fails
      doc(7L, Seq.fill(48)("wwww") ++ Seq("the", "the")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = ext.TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("r_wordcount"), col("r_wlen"),
        col("r_short"), col("r_stop"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((1L, 1L, 1L, 0L)))
    assert(got(2L)._1 == 0L)
    assert(got(3L)._2 == 0L)
    assert(got(4L)._3 == 1L)
    assert(got(5L)._3 == 0L)
    assert(got(6L)._4 == 1L)
    assert(got(7L)._4 == 0L, "two copies of ONE stopword are one kind")
  }

  test("SCD2 same-timestamp events order by event_id (the total order)") {
    import spark.implicits._
    // ts collision: id 1 ("A") precedes id 2 ("B") — A opens then B
    // closes it at the SAME timestamp (zero-width version)
    val closed = StreamOps.scd2Versions(Seq(
      StreamOps.EvS(7L, 2L, "B", 1000L),
      StreamOps.EvS(7L, 1L, "A", 1000L)).toDS()).collect().toSeq
    assert(closed == Seq(StreamOps.Scd2Row(7L, 1L, "A", 1000L, 1000L)))
  }

  test("k-core peel is genuinely iterative: a path graph's 2-core is " +
    "empty, a cycle survives") {
    import spark.implicits._
    // P5: 1-2-3-4-5. Round 1 drops endpoints 1,5; round 2 drops 2,4;
    // round 3 drops 3. A ONE-round degree filter would wrongly keep
    // {2,3,4} (their initial degree is 2).
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("d1", "d2")
    val pathCore = ext.GraphRank.kcoreSurvivors(path, k = 2, rounds = 4)
      .collect()
    assert(pathCore.isEmpty,
      s"path 2-core must peel to nothing, got ${pathCore.toSeq}")
    // C4: 1-2-3-4-1 — every vertex keeps degree 2 forever
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("d1", "d2")
    val cycleCore = ext.GraphRank.kcoreSurvivors(cycle, k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cycleCore == Set((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("recursive month spine materializes an explicit zero row for " +
    "an empty month") {
    import spark.implicits._
    val planted = Seq(
      (java.sql.Date.valueOf("1995-01-15"), 10.00),
      (java.sql.Date.valueOf("1995-03-10"), 20.00))
      .toDF("o_orderdate", "o_totalprice")
    planted.createOrReplaceTempView("orders")
    try {
      val rows = spark.sql(SparkEntry.oracleSql("q_sql_recursive"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assert(rows.toSeq == Seq(
        (1995L, 1L, 1L, 1000L),
        (1995L, 2L, 0L, 0L), // the gap month exists, explicitly zero
        (1995L, 3L, 1L, 2000L)))
    } finally spark.catalog.dropTempView("orders")
  }
}
