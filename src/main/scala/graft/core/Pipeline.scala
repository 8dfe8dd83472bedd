package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Similarity => S}

/** End-to-end re-expressions of the reference's two MR pipelines.
  *
  *  - [[movies]]: the 3-step `MoviesSimilarities` job
  *    (`moviesSimilarities.py ≈L39–46` [R]) — Pearson only.
  *  - [[vector]]: the 4-step generalized `VectorSimilarities` job
  *    (`vectorSimilarities.py ≈L52–62` [R]) — rater-count filters,
  *    all four wired metrics, intersection filter, ranking.
  *
  * Where the reference materializes 3–4 HDFS barriers, each of these
  * is a single lazy DataFrame expression tree: Catalyst plans the whole
  * DAG at once and the only exchanges are the ones the data requires
  * (group-by-user → implicit in the self-join, group-by-pair, window by
  * item).
  */
object Pipeline {

  /** Full vector pipeline over a ratings DF (`user_id`, `item_id`,
    * `rating`, `rating_i`).
    *
    * Steps, with reference citations:
    *  1. per-item rater counts; drop items with < minRaters raters
    *     (`group_by_user_rating` reducer, `vectorSimilarities.py
    *     ≈L64–80` [R]);
    *  2. drop users with > maxRaters rated items — the whole user, not
    *     a truncation [R-med] (`count_ratings_users_freq`,
    *     ≈L82–99 [R]);
    *  3. pairwise moments via self-join (≈L101–110 [R]);
    *  4. four metrics + `n > minIntersection` filter
    *     (`calculate_similarity`, ≈L112–138 [R]);
    *  5. per-item rank by corr desc (`calculate_ranking` /
    *     `top_similar_items`, ≈L140–160 [R]).
    *
    * Output: item_x, item_y, corr, cos_sim, reg_corr, jaccard (all
    * r4-rounded), n, n_x, n_y, rn.
    */
  def vector(ratings: DataFrame,
             minRaters: Int = S.MinNumRaters,
             maxRaters: Int = S.MaxNumRaters,
             minIntersection: Int = S.MinIntersection): DataFrame = {
    val counts = Moments.raterCounts(ratings)
    // step 1: keep items with enough raters; carry nraters like the
    // reference does (it rides along to the final output).
    val withCounts = ratings
      .join(broadcast(counts.where(col("nraters") >= minRaters)), Seq("item_id"))
    // step 2: drop power users (skew guard, R3).
    val userSizes = withCounts.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_items"))
      .where(col("user_items") <= maxRaters)
      .select(col("user_id"))
    val filtered = withCounts.join(broadcast(userSizes), Seq("user_id"))
    // steps 3–4: moments (nraters carried per side) + metrics.
    val m = Moments.asDoubles(
      Moments.pairMoments(filtered, carry = Seq("nraters")))
    val sims = m
      .withColumn("corr", Det.r4(S.correlation(
        col("nd"), col("sxyd"), col("sxd"), col("syd"), col("sxxd"), col("syyd"))))
      .withColumn("cos_sim", Det.r4(S.cosine(col("sxyd"), col("sxxd"), col("syyd"))))
      .withColumn("reg_corr", Det.r4(S.regularizedCorrelation(
        col("nd"), col("sxyd"), col("sxd"), col("syd"), col("sxxd"), col("syyd"))))
      .withColumn("jaccard", Det.r4(S.jaccard(
        col("nd"), col("nraters_x").cast("double"), col("nraters_y").cast("double"))))
      .where(col("n") > minIntersection)
    // step 5: deterministic per-item ranking on the rounded score.
    Ranking.withRank(sims, "item_x", col("corr"), "item_y")
      .select(col("item_x"), col("item_y"), col("corr"), col("cos_sim"),
        col("reg_corr"), col("jaccard"), col("n"),
        col("nraters_x").as("n_x"), col("nraters_y").as("n_y"), col("rn"))
  }

  /** [[vector]] re-derived from an already-materialized *unfiltered*
    * pair-moment table — an exact rewrite under one precondition.
    *
    * Why it is exact: the min-raters step drops whole items before
    * pairing, but a pair's moments depend only on users who rated
    * *both* of its items — removing other items changes nothing — so
    * filtering pairs to `n_x >= minRaters AND n_y >= minRaters`
    * afterwards yields identical rows ( `nraters` is computed before
    * the item filter in the reference, i.e. it is the global count).
    * The max-raters user cap is the one step that would change the
    * moments themselves; the caller must verify no user exceeds it
    * (cheap aggregate over the ratings view) and fall back to
    * [[vector]] otherwise.
    *
    * This turns the pipeline's self-join + pair aggregation — the
    * dominant shuffles — into a reuse of the shared moment table that
    * the q_sim_* family already materialized.
    */
  def vectorFromMoments(moments: DataFrame, counts: DataFrame,
                        minRaters: Int = S.MinNumRaters,
                        minIntersection: Int = S.MinIntersection): DataFrame = {
    val ok = counts.where(col("nraters") >= minRaters)
    val cx = ok.select(col("item_id").as("item_x"), col("nraters").as("nraters_x"))
    val cy = ok.select(col("item_id").as("item_y"), col("nraters").as("nraters_y"))
    val m = Moments.asDoubles(
      moments.join(broadcast(cx), Seq("item_x"))
        .join(broadcast(cy), Seq("item_y")))
    val sims = m
      .withColumn("corr", Det.r4(S.correlation(
        col("nd"), col("sxyd"), col("sxd"), col("syd"), col("sxxd"), col("syyd"))))
      .withColumn("cos_sim", Det.r4(S.cosine(col("sxyd"), col("sxxd"), col("syyd"))))
      .withColumn("reg_corr", Det.r4(S.regularizedCorrelation(
        col("nd"), col("sxyd"), col("sxd"), col("syd"), col("sxxd"), col("syyd"))))
      .withColumn("jaccard", Det.r4(S.jaccard(
        col("nd"), col("nraters_x").cast("double"), col("nraters_y").cast("double"))))
      .where(col("n") > minIntersection)
    Ranking.withRank(sims, "item_x", col("corr"), "item_y")
      .select(col("item_x"), col("item_y"), col("corr"), col("cos_sim"),
        col("reg_corr"), col("jaccard"), col("n"),
        col("nraters_x").as("n_x"), col("nraters_y").as("n_y"), col("rn"))
  }

  /** The 3-step movies pipeline: Pearson only, `n > 0` ranking filter
    * (`moviesSimilarities.py ≈L130–141` [R]), no rater-count filters. */
  def movies(ratings: DataFrame): DataFrame = {
    val m = Moments.asDoubles(Moments.pairMoments(ratings))
    val sims = m
      .withColumn("corr", Det.r4(S.correlation(
        col("nd"), col("sxyd"), col("sxd"), col("syd"), col("sxxd"), col("syyd"))))
      .where(col("n") > 0)
    Ranking.withRank(sims, "item_x", col("corr"), "item_y")
      .select(col("item_x"), col("item_y"), col("corr"), col("n"), col("rn"))
  }
}
