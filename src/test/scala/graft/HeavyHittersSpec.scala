package graft

import org.apache.spark.sql.functions._
import graft.core.HeavyHitters

/** Misra–Gries kernel + distributed summary properties, and the
  * rolling-window fan-out semantics backing q_rolling_distinct. */
class HeavyHittersSpec extends SparkSpec {

  test("mgPartition: estimates never exceed truth, error <= n/(k+1)") {
    // 3 heavy keys + 60 tail singletons; k=5 forces real evictions
    val heavy = Seq.fill(40)("A") ++ Seq.fill(30)("B") ++ Seq.fill(20)("C")
    val tail = (1 to 60).map(i => s"t$i")
    // interleave so evictions hit mid-stream, not only at the end
    val stream = (heavy ++ tail ++ heavy).grouped(7).toSeq.reverse.flatten
    val n = stream.size
    val k = 5
    val est = HeavyHitters.mgPartition(stream.iterator, k).toMap
    val truth = stream.groupBy(identity).map { case (ky, v) => ky -> v.size.toLong }
    assert(est.size <= k)
    est.foreach { case (ky, e) =>
      assert(e <= truth(ky), s"$ky overestimated")
      assert(truth(ky) - e <= n / (k + 1), s"$ky outside envelope")
    }
    // every key above the threshold must be present
    truth.filter(_._2 > n / (k + 1)).keys.foreach(ky => assert(est.contains(ky)))
  }

  test("summarize: merged partials keep the mergeable-summaries bound") {
    import spark.implicits._
    // 4 partitions, distinct tails per partition, one global majority
    val rows = (0 until 4).flatMap { p =>
      Seq.fill(50)("hot") ++ (1 to 40).map(i => s"p${p}_$i")
    }
    val df = rows.toDF("k").repartition(4)
    val n = rows.size
    val k = 8
    val est = HeavyHitters.summarize(df, "k", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).map { case (ky, v) => ky -> v.size.toLong }
    est.foreach { case (ky, e) => assert(e <= truth(ky)) }
    assert(est.contains("hot"))
    assert(truth("hot") - est("hot") <= n / (k + 1))
  }

  test("summarizeByGroup: per-group envelope survives window summation") {
    import spark.implicits._
    // 3 days, each with a majority key + its own tail; window = all 3
    val rows = (0 until 3).flatMap { day =>
      Seq.fill(60)((day.toLong, "hot")) ++
        (1 to 30).map(i => (day.toLong, s"d${day}_$i"))
    }
    val df = rows.toDF("day", "k").repartition(4)
    val k = 6
    val partials = HeavyHitters.summarizeByGroup(df, "day", "k", k)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // per-group: never overestimates, group envelope n_g/(k+1)
    val truth = rows.groupBy(identity).map { case (gk, v) => gk -> v.size.toLong }
    partials.foreach { case (gk, e) => assert(e <= truth(gk), s"$gk over") }
    (0L until 3L).foreach { day =>
      val nG = rows.count(_._1 == day)
      assert(truth((day, "hot")) - partials.getOrElse((day, "hot"), 0L)
        <= nG / (k + 1))
    }
    // summed over the 3-day window the errors ADD to the window bound
    val n = rows.size
    val winEst = partials.collect { case ((_, ky), e) if ky == "hot" => e }.sum
    val winTrue = truth.collect { case ((_, ky), c) if ky == "hot" => c }.sum
    assert(winEst <= winTrue && winTrue - winEst <= n / (k + 1))
  }

  test("rolling 7-day fan-out equals the naive per-day distinct") {
    import spark.implicits._
    val pairs = Seq( // (day, user): day 10 sees u1..u3; day 13 u3,u4; day 20 u1
      (10L, "u1"), (10L, "u2"), (10L, "u3"),
      (13L, "u3"), (13L, "u4"),
      (20L, "u1"))
    val ud = pairs.toDF("d0", "user_id").distinct()
    val days = ud.select(col("d0").as("day")).distinct()
    val got = ud.select(col("user_id"),
        explode(sequence(col("d0"), col("d0") + lit(6L))).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: for each observed day, distinct users in [day-6, day]
    val naive = pairs.map(_._1).distinct.map { day =>
      day -> pairs.filter(p => p._1 >= day - 6 && p._1 <= day)
        .map(_._2).distinct.size.toLong
    }.toMap
    assert(got === naive)
    assert(got(13L) === 4L) // day 13 window [7,13] spans both bursts
    assert(got(20L) === 1L) // day 20 window [14,20] sees only u1
  }
}
