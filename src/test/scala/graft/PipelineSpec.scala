package graft

import org.apache.spark.sql.functions._
import graft.core.{Pipeline, Ranking}
import graft.io.Sources

/** Golden end-to-end pipeline tests (FIXTURES.md §3) and the R1
  * dialect readers (both dialects must parse to the same frame). */
class PipelineSpec extends SparkSpec {

  test("vector pipeline on the toy fixture matches the golden table") {
    val out = Pipeline.vector(toyRatings)
      .orderBy(col("item_x"), col("item_y"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      ("A", "B", 1.0, 0.9995, 0.1667, 0.5, 2L),
      ("A", "C", -1.0, 0.4281, -0.1667, 0.5, 2L),
      ("B", "C", -1.0, 0.7399, -0.1667, 0.5, 2L)))
  }

  test("movies pipeline + semicolon protocol matches reference output") {
    val out = Pipeline.movies(toyRatings)
      .orderBy(col("item_x"), col("rn"))
    val lines = Ranking.semicolonProtocol(out,
      Seq("item_x", "item_y", "corr", "n")).collect().map(_.getString(0))
    assert(lines.toSeq === Seq("A;B;1.0;2", "A;C;-1.0;2", "B;C;-1.0;2"))
  }

  test("vector pipeline ranks neighbors by corr desc within item") {
    val ranks = Pipeline.vector(toyRatings)
      .select(col("item_x"), col("item_y"), col("rn")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ranks(("A", "B")) === 1L) // corr 1.0 ranks above corr -1.0
    assert(ranks(("A", "C")) === 2L)
  }

  test("min-raters filter drops items below threshold") {
    import spark.implicits._
    // item Z rated once -> dropped entirely when minRaters=2
    val r = toyRatings.unionByName(
      Seq(("u1", "Z", 2.0)).toDF("user_id", "item_id", "rating")
        .withColumn("rating_i", floor(col("rating") * 10000 + 0.5).cast("long")))
    val out = Pipeline.vector(r)
    assert(!out.select(col("item_x")).collect().map(_.getString(0)).contains("Z"))
    assert(!out.select(col("item_y")).collect().map(_.getString(0)).contains("Z"))
  }

  test("movies and books dialect readers parse to the identical frame") {
    val base = "src/test/resources"
    val m = Sources.moviesRatings(spark, s"$base/ratings_movies.dat")
      .orderBy(col("user_id"), col("item_id")).collect()
    val b = Sources.booksRatings(spark, s"$base/ratings_books.csv")
      .orderBy(col("user_id"), col("item_id")).collect()
    assert(m.length === 9)
    assert(m.toSeq === b.toSeq)
  }

  test("determinism: running a heavy query twice yields identical rows") {
    val q = SparkEntry.queries("q_vector_pipeline")
    val a = q(spark, sf001).collect()
    val b = q(spark, sf001).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }
}
