package graft

import org.apache.spark.sql.functions._
import graft.core.{Det, Moments, Similarity => S}

/** The five metric formulas against the exact goldens computed in
  * SURVEY.md Appendix B / FIXTURES.md §3, plus the edge conventions
  * the reference pins (zero denominator → 0.0, never NULL/NaN). */
class MetricsSpec extends SparkSpec {

  private def metricsOnToy = {
    val m = Moments.asDoubles(Moments.pairMoments(toyRatings))
    m.select(col("item_x"), col("item_y"), col("n"),
      Det.r4(S.correlation(col("nd"), col("sxyd"), col("sxd"), col("syd"),
        col("sxxd"), col("syyd"))).as("corr"),
      Det.r4(S.cosine(col("sxyd"), col("sxxd"), col("syyd"))).as("cos"),
      Det.r4(S.regularizedCorrelation(col("nd"), col("sxyd"), col("sxd"),
        col("syd"), col("sxxd"), col("syyd"))).as("reg"),
      Det.r4(S.normalizedCorrelation(col("nd"), col("sxyd"), col("sxd"),
        col("syd"), col("sxxd"), col("syyd"))).as("norm"))
      .orderBy(col("item_x"), col("item_y"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
  }

  test("typed MomentAggregator path: per-item mean/variance goldens") {
    import spark.implicits._
    // toy item A: ratings 4,5,1 → mean 10/3, var = 14 − (10/3)² = 26/9
    val out = toyRatings.select(col("item_id"), col("rating_i"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, ri) => (ri.toDouble, ri.toDouble) }
      .agg(graft.core.MomentAggregator.toColumn.name("m"))
      .toDF("item_id", "m")
      .select(col("item_id"), col("m.n").as("n"),
        Det.r4(col("m.sx") / col("m.n") / lit(10000.0)).as("mean"),
        Det.r4((col("m.sxx") / col("m.n")
            - (col("m.sx") / col("m.n")) * (col("m.sx") / col("m.n")))
          / lit(1.0e8)).as("variance"))
      .orderBy(col("item_id")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out("A") == ((3L, 3.3333, 2.8889)))
    assert(out("B") == ((3L, 3.0, 0.6667)))   // 3,4,2 → var 2/3
    assert(out("C") == ((3L, 3.3333, 2.8889))) // 1,5,4 — same as A
  }

  test("appendix-B goldens: corr/cosine/regcorr/normcorr per pair") {
    val m = metricsOnToy
    assert(m(("A", "B")) === ((2L, 1.0, 0.9995, 0.1667, 1.0)))
    assert(m(("A", "C")) === ((2L, -1.0, 0.4281, -0.1667, 0.0)))
    assert(m(("B", "C")) === ((2L, -1.0, 0.7399, -0.1667, 0.0)))
  }

  test("jaccard uses per-item rater counts (A=B=C=3), all pairs 0.5") {
    val m = Moments.asDoubles(Moments.withRaterCounts(
      Moments.pairMoments(toyRatings), Moments.raterCounts(toyRatings)))
    val jac = m.select(col("item_x"), col("item_y"),
      Det.r4(S.jaccard(col("nd"), col("n_x").cast("double"),
        col("n_y").cast("double"))).as("j"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(jac.values.toSet === Set(0.5))
    assert(jac.size === 3)
  }

  test("edge: n=1 pair has zero denominator -> corr = 0.0, not null") {
    import spark.implicits._
    // single co-rater: denominator n*sxx - sx^2 = 0
    val one = Seq(("u1", "X", 3.0), ("u1", "Y", 4.0))
      .toDF("user_id", "item_id", "rating")
      .withColumn("rating_i", floor(col("rating") * 10000 + 0.5).cast("long"))
    val m = Moments.asDoubles(Moments.pairMoments(one))
    val r = m.select(S.correlation(col("nd"), col("sxyd"), col("sxd"),
      col("syd"), col("sxxd"), col("syyd")).as("c")).collect()
    assert(r.length === 1 && r(0).getDouble(0) === 0.0)
  }

  test("edge: constant co-rating vector -> corr = 0.0") {
    import spark.implicits._
    val const = Seq(("u1", "X", 3.0), ("u1", "Y", 1.0),
      ("u2", "X", 3.0), ("u2", "Y", 5.0))
      .toDF("user_id", "item_id", "rating")
      .withColumn("rating_i", floor(col("rating") * 10000 + 0.5).cast("long"))
    val m = Moments.asDoubles(Moments.pairMoments(const))
    val r = m.select(S.correlation(col("nd"), col("sxyd"), col("sxd"),
      col("syd"), col("sxxd"), col("syyd")).as("c")).collect()
    assert(r.length === 1 && r(0).getDouble(0) === 0.0)
  }

  test("edge: jaccard empty union -> 0.0") {
    import spark.implicits._
    val df = Seq((0.0, 0.0, 0.0)).toDF("common", "nx", "ny")
    val r = df.select(S.jaccard(col("common"), col("nx"), col("ny")))
      .collect()(0).getDouble(0)
    assert(r === 0.0)
  }

  test("regcorr shrinkage: n=2 => w=1/6 => reg = corr/6") {
    val m = metricsOnToy
    // A,B: corr=1.0 -> reg = 1/6 = 0.1667 (r4)
    assert(m(("A", "B"))._4 === 0.1667)
  }
}
