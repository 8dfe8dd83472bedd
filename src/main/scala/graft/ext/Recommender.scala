package graft.ext

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Model-based collaborative filtering via MLlib ALS — the north-star
  * companion to the reference's neighborhood item-item CF
  * (BASELINE.json: "could be directly reimplemented using Spark
  * MLlib's ALS"). The reference's actual capability is the
  * neighborhood pipeline (graft.core.Pipeline — fidelity first); ALS
  * is the scale path for dense recommendation serving: factor tables
  * are O(users+items), not O(items²) similarity pairs.
  *
  * Seeded and `coldStartStrategy=drop` so runs are reproducible; the
  * iterative solver is still not bit-deterministic across cluster
  * topologies, so its query entry has no DuckDB oracle (rows-only
  * check, as the driver contract allows).
  */
object Recommender {

  /** Fit ALS on a ratings frame (user_id, item_id, rating). Keys are
    * cast to int — ALS's factor indexing is int-based; testdata keys
    * are well inside range (at true 100 TB scale, string/long ids need
    * a dictionary-encoding pass first). */
  def fit(ratings: DataFrame, rank: Int = 8, maxIter: Int = 5,
          regParam: Double = 0.1, seed: Long = 42L): ALSModel = {
    val train = ratings.select(
      col("user_id").cast("int").as("user"),
      col("item_id").cast("int").as("item"),
      col("rating").cast("float").as("rating"))
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(train)
  }

  /** Deterministic dense dictionary for arbitrary keys (string or
    * numeric): sorted distinct keys zipped with their global index —
    * the pre-pass [[fit]]'s scaladoc defers to for ids that are
    * strings or exceed int range. `zipWithIndex` computes per-partition
    * offsets with one extra small job, keeping the assignment
    * distributed; the naive `row_number()` over an unpartitioned
    * window would collapse every key into a single task. Output:
    * (<keyCol>, idx: INT dense 0…n−1). */
  def dictionary(df: DataFrame, keyCol: String): DataFrame = {
    val distinctSorted = df.select(col(keyCol)).distinct().orderBy(col(keyCol))
    val schema = StructType(distinctSorted.schema.fields :+
      StructField("idx", IntegerType, nullable = false))
    val rdd = distinctSorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i.toInt)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Top-k item recommendations per user, long-form:
    * (user_id, item_id, score, rn). */
  def recommendTopK(model: ALSModel, k: Int): DataFrame =
    model.recommendForAllUsers(k)
      .select(col("user").cast("long").as("user_id"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user_id"),
        col("rec.item").cast("long").as("item_id"),
        col("rec.rating").cast("double").as("score"),
        (col("pos") + 1).cast("long").as("rn"))
}
