package graft

import org.apache.spark.sql.functions._
import graft.core.TemporalJoin

/** TemporalJoin semantics: backward as-of (≤, tie-break, no-match)
  * and the banded range join's equivalence to the naive theta join. */
class TemporalJoinSpec extends SparkSpec {

  test("asof picks the latest right row at or before each left row") {
    import spark.implicits._
    // key k1: rights at t=10, 20, 20 (tie -> greatest id), 40
    // lefts at t=5 (no match), 20 (ties INCLUDED: <=), 30, 50
    val left = Seq((1L, "k1", 5L), (2L, "k1", 20L), (3L, "k1", 30L),
      (4L, "k1", 50L), (5L, "k2", 100L))
      .toDF("lid", "key", "lts")
    val right = Seq((101L, "k1", 10L), (102L, "k1", 20L), (103L, "k1", 20L),
      (104L, "k1", 40L), (105L, "k3", 1L))
      .toDF("rid", "key", "rts")
    val out = TemporalJoin.asof(left, right, "key",
        leftTs = "lts", rightTs = "rts",
        payload = Seq("rid"), tieBreak = "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty)          // t=5: nothing at or before
    assert(out(2L).contains(103L))   // t=20: <= includes ties, max rid wins
    assert(out(3L).contains(103L))   // t=30: still the t=20 pair
    assert(out(4L).contains(104L))   // t=50: the t=40 row
    assert(out(5L).isEmpty)          // k2 has no right rows at all
  }

  test("asofForward picks the earliest right row at or after each left row") {
    import spark.implicits._
    val left = Seq((1L, "k1", 5L), (2L, "k1", 20L), (3L, "k1", 30L),
      (4L, "k1", 50L), (5L, "k2", 100L))
      .toDF("lid", "key", "lts")
    val right = Seq((101L, "k1", 10L), (102L, "k1", 20L), (103L, "k1", 20L),
      (104L, "k1", 40L), (105L, "k3", 1L))
      .toDF("rid", "key", "rts")
    val out = TemporalJoin.asofForward(left, right, "key",
        leftTs = "lts", rightTs = "rts",
        payload = Seq("rid"), tieBreak = "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(101L))   // t=5: next right is t=10
    assert(out(2L).contains(103L))   // t=20: >= includes ties, max rid wins
    assert(out(3L).contains(104L))   // t=30: next is t=40
    assert(out(4L).isEmpty)          // t=50: nothing after
    assert(out(5L).isEmpty)          // k2 has no right rows
    // randomized equivalence against brute force (ties included)
    val r = new scala.util.Random(78)
    for (trial <- 1 to 4) {
      val lefts = (0 until 25).map(i =>
        (i.toLong, s"k${r.nextInt(3)}", r.nextInt(80).toLong))
      val rights = (0 until 25).map(i =>
        (100L + i, s"k${r.nextInt(3)}", r.nextInt(80).toLong))
      val expect = lefts.map { case (lid, k, lts) =>
        val cands = rights.filter(x => x._2 == k && x._3 >= lts)
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy(x => (x._3, -x._1))._1))
      }.toMap
      val got = TemporalJoin.asofForward(
          lefts.toDF("lid", "key", "lts"), rights.toDF("rid", "key", "rts"),
          "key", leftTs = "lts", rightTs = "rts",
          payload = Seq("rid"), tieBreak = "rid")
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      assert(got === expect, s"asofForward trial $trial")
    }
  }

  test("bandJoin matches the naive theta join on events-shaped data") {
    import spark.implicits._
    // timestamps straddle bucket boundaries of W=100 deliberately
    val rows = Seq(
      ("a", 1L, 0L), ("a", 2L, 50L), ("a", 3L, 99L), ("a", 4L, 100L),
      ("a", 5L, 101L), ("a", 6L, 199L), ("a", 7L, 201L), ("a", 8L, 350L),
      ("b", 9L, 100L), ("b", 10L, 100L), ("b", 11L, 200L), ("b", 12L, 301L))
      .toDF("k", "id", "ts")
    val banded = TemporalJoin.bandJoin(rows, rows, Seq("k"), "ts", "ts", 100L)
      .where(col("b_ts") > col("a_ts") ||
        (col("b_ts") === col("a_ts") && col("b_id") > col("a_id")))
      .select(col("k"), col("a_id"), col("b_id"))
    val a = rows.select(col("k"), col("id").as("a_id"), col("ts").as("a_ts"))
    val b = rows.select(col("k").as("k2"), col("id").as("b_id"),
      col("ts").as("b_ts"))
    val naive = a.join(b, col("k") === col("k2") &&
        col("b_ts") - col("a_ts") <= 100L &&
        (col("b_ts") > col("a_ts") ||
          (col("b_ts") === col("a_ts") && col("b_id") > col("a_id"))))
      .select(col("k"), col("a_id"), col("b_id"))
    assert(banded.count() > 0)
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("q_asof_join and q_range_join run and keep their row contracts") {
    val asof = rel.RelQueries.queries("q_asof_join")(spark, sf001)
    val rows = asof.collect()
    assert(rows.nonEmpty)
    // gap is -1 exactly when there is no preceding click
    assert(rows.forall { r =>
      (r.getLong(2) == -1L) == (r.getLong(3) == -1L) &&
        (r.getLong(3) >= 0L || r.getLong(3) == -1L) })
    val range = rel.RelQueries.queries("q_range_join")(spark, sf001)
    val rr = range.collect()
    assert(rr.nonEmpty && rr.forall(_.getLong(3) <= 600000L))
  }

  test("asof and bandJoin match brute force on seeded random data") {
    import spark.implicits._
    val r = new scala.util.Random(77)
    for (trial <- 1 to 6) {
      // dense random timelines over 3 keys, many exact ties
      val W = 30L
      val lefts = (0 until 25).map(i =>
        (i.toLong, s"k${r.nextInt(3)}", r.nextInt(80).toLong))
      val rights = (0 until 25).map(i =>
        (100L + i, s"k${r.nextInt(3)}", r.nextInt(80).toLong))
      // asof reference: per left row, max-(rts, rid) right at or before
      val expectAsof = lefts.map { case (lid, k, lts) =>
        val cands = rights.filter(x => x._2 == k && x._3 <= lts)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(x => (x._3, x._1))._1))
      }.toMap
      val gotAsof = TemporalJoin.asof(
          lefts.toDF("lid", "key", "lts"), rights.toDF("rid", "key", "rts"),
          "key", leftTs = "lts", rightTs = "rts",
          payload = Seq("rid"), tieBreak = "rid")
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      assert(gotAsof === expectAsof, s"asof trial $trial")
      // band reference: 0 <= b.ts - a.ts <= W pairs
      val all = lefts ++ rights
      val expectBand = (for {
        (aid, ak, ats) <- all; (bid, bk, bts) <- all
        if ak == bk && bts >= ats && bts - ats <= W
      } yield (aid, bid)).toSet
      val gotBand = TemporalJoin.bandJoin(
          all.toDF("id", "k", "ts"), all.toDF("id", "k", "ts"),
          Seq("k"), "ts", "ts", W)
        .select(col("a_id"), col("b_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(gotBand === expectBand, s"band trial $trial")
    }
  }
}
