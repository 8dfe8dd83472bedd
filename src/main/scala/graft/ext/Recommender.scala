package graft.ext

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

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

  /** A fitted model plus the id dictionaries used (None on each side
    * whose raw keys were int-safe and trained directly). `fitId` is a
    * process-unique tag for memo keys — unlike an identity hash it is
    * never reused after a fit is GC'd. */
  case class FittedRecommender(model: ALSModel,
                               userDict: Option[DataFrame],
                               itemDict: Option[DataFrame],
                               fitId: Long = fitCounter.incrementAndGet())

  private val fitCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Fit ALS on a ratings frame (user_id, item_id, rating). ALS's
    * factor indexing is int-based, and the reference accepts arbitrary
    * string ids everywhere — so keys that are not int-safe (strings,
    * or longs whose observed range leaves 32 bits — checked with one
    * tiny min/max agg) are routed through [[dictionary]] automatically
    * instead of crashing on the cast. The training frame is persisted
    * for the solver's maxIter sweeps (ALS re-reads its input when
    * building rating blocks; without the persist every sweep re-derives
    * the upstream lineage — the r1 bench's 30 s ALS tail). */
  def fit(ratings0: DataFrame, rank: Int = 8, maxIter: Int = 5,
          regParam: Double = 0.1, seed: Long = 42L): FittedRecommender = {
    // Null-key policy: DROP, explicitly and on BOTH routes. Without
    // this, dictionary-routed sides silently dropped null keys (inner
    // join on the dict) while int-safe sides passed null through the
    // cast and crashed inside ALS — same input, route-dependent
    // behavior. A rating with no user or item carries no signal for a
    // factor model, so drop is the semantic, and doing it up front
    // makes it route-independent.
    val ratings = ratings0
      .where(col("user_id").isNotNull && col("item_id").isNotNull)
    def intSafe(c: String): Boolean = ratings.schema(c).dataType match {
      case ByteType | ShortType | IntegerType => true
      case LongType =>
        val r = ratings.agg(min(col(c)), max(col(c))).head()
        !r.isNullAt(0) &&
          r.getLong(0) >= Int.MinValue.toLong &&
          r.getLong(1) <= Int.MaxValue.toLong
      case _ => false
    }
    val uDict =
      if (intSafe("user_id")) None
      else Some(dictionary(ratings, "user_id").persist(StorageLevel.MEMORY_AND_DISK))
    val iDict =
      if (intSafe("item_id")) None
      else Some(dictionary(ratings, "item_id").persist(StorageLevel.MEMORY_AND_DISK))
    val withU = uDict match {
      case Some(d) => ratings.join(
        d.select(col("user_id"), col("idx").as("__uidx")), Seq("user_id"))
      case None => ratings.withColumn("__uidx", col("user_id").cast("int"))
    }
    val withI = iDict match {
      case Some(d) => withU.join(
        d.select(col("item_id"), col("idx").as("__iidx")), Seq("item_id"))
      case None => withU.withColumn("__iidx", col("item_id").cast("int"))
    }
    val train = withI.select(
      col("__uidx").as("user"),
      col("__iidx").as("item"),
      col("rating").cast("float").as("rating"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val model = new ALS()
        .setUserCol("user").setItemCol("item").setRatingCol("rating")
        .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
        .setSeed(seed)
        .setColdStartStrategy("drop")
        .fit(train)
      FittedRecommender(model, uDict, iDict)
    } finally train.unpersist(blocking = false)
  }

  /** Deterministic dense dictionary for arbitrary keys (string or
    * numeric): sorted distinct keys zipped with their global index —
    * the pre-pass [[fit]] routes non-int-safe ids through.
    * `zipWithIndex` computes per-partition offsets with one extra
    * small job, keeping the assignment distributed; the naive
    * `row_number()` over an unpartitioned window would collapse every
    * key into a single task. Output: (<keyCol>, idx: INT dense 0…n−1). */
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
    * (user_id, item_id, score, rn). Dictionary-trained sides map the
    * int factor indices back to the ORIGINAL keys (and keep their
    * original type); direct sides normalize to BIGINT as before. The
    * dict joins broadcast only below a row-count gate
    * (`spark.graft.dict.broadcastMax`, default 10M): dictionaries are
    * O(distinct keys), usually tiny next to the k-per-user long-form,
    * but a billion-user dictionary would OOM the driver if force-
    * broadcast — past the gate the mapping falls back to a shuffle
    * join (the dicts are persisted by [[fit]], so the count is a
    * cache scan). */
  def recommendTopK(fitted: FittedRecommender, k: Int): DataFrame = {
    // memo key = the FIT's process-unique id + which side (not the
    // per-call select projection, which is a fresh instance every
    // call): fit() persists each dict once, so repeated recommendTopK
    // calls on the same fit share the key and skip the re-count job; a
    // new fit is a new id and counts afresh. Row count is invariant
    // under the projection, so gating the projection with the dict's
    // count is exact.
    def maybeB(side: String, proj: DataFrame): DataFrame =
      graft.core.Broadcasts.gatedMemo(proj, "spark.graft.dict.broadcastMax",
        s"dict:${fitted.fitId}:$side")
    val recs = fitted.model.recommendForAllUsers(k)
      .select(col("user").as("__uidx"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("__uidx"),
        col("rec.item").as("__iidx"),
        col("rec.rating").cast("double").as("score"),
        (col("pos") + 1).cast("long").as("rn"))
    val withU = fitted.userDict match {
      case Some(d) => recs.join(
        maybeB("user", d.select(col("user_id"), col("idx").as("__uidx"))),
        Seq("__uidx"))
      case None => recs.withColumn("user_id", col("__uidx").cast("long"))
    }
    val withI = fitted.itemDict match {
      case Some(d) => withU.join(
        maybeB("item", d.select(col("item_id"), col("idx").as("__iidx"))),
        Seq("__iidx"))
      case None => withU.withColumn("item_id", col("__iidx").cast("long"))
    }
    withI.select(col("user_id"), col("item_id"), col("score"), col("rn"))
  }
}
