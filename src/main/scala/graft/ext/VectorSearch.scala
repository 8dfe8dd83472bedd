package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Det

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, per the scale mandate:
  *  - brute-force cosine top-k against a small probe set (label
  *    centroids here) — the exact baseline; probes are broadcast so
  *    the scan is shuffle-free and embarrassingly parallel;
  *  - sign-LSH bucketed pair search — the sub-quadratic scale path
  *    for all-pairs near-duplicate detection (bucket on the sign
  *    pattern of leading dimensions; only intra-bucket pairs are
  *    compared).
  *
  * All dot products/norms go through per-term fixed-point snapping
  * ([[fixedDot]]): each product is floored to an integer in 1e-12
  * units and summed exactly, so the result is independent of the
  * fold order — Spark's `aggregate` HOF folds left, DuckDB's `sum`
  * over unnested terms is unordered, and both land on identical bits.
  */
object VectorSearch {
  val DotScale = 1e12

  /** Exact fixed-point dot product — composed-HOF reference form.
    * Documents the per-term math the DuckDB oracles spell out; the
    * operators below run [[fixedDot]], its fused native twin. */
  def fixedDotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * y.cast("double") * lit(DotScale) + lit(0.5))
          .cast("long")),
      lit(0L), (acc, x) => acc + x) / lit(DotScale)

  /** Exact fixed-point dot product via the native codegen'd
    * [[graft.expr.FixedDotExpr]] (bit-identical to [[fixedDotHof]],
    * asserted in ExprSpec; fused loop, no intermediate array).
    * Callers' sessions need [[graft.expr.GraftFunctions]] registered —
    * every DataFrame entry point here does it. */
  def fixedDot(a: Column, b: Column): Column =
    call_function("graft_fixed_dot", a, b) / lit(DotScale)

  /** Exact fixed-point squared norm. */
  def fixedNormSq(a: Column): Column = fixedDot(a, a)

  /** Cosine from fixed-point dot/norms, 0.0 on zero denominator. */
  def cosineCol(dot: Column, n1: Column, n2: Column): Column = {
    val den = sqrt(n1) * sqrt(n2)
    when(den === 0.0, lit(0.0)).otherwise(dot / den)
  }

  /** Per-label centroids as arrays, element-wise mean with exact
    * fixed-point sums (1e-9 units): (label, centroid, n_members). */
  def labelCentroids(emb: DataFrame): DataFrame = {
    val longForm = emb.select(col("label"),
      posexplode(col("embedding")).as(Seq("pos", "v")))
    val perPos = longForm.groupBy(col("label"), col("pos"))
      .agg(((sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5))
        .cast("long")).cast("double") / count(lit(1))) / lit(1e9)).as("cv"))
    perPos.groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("centroid"))
  }

  /** The k members FARTHEST from their own label centroid — the
    * embedding-quality outlier surface (mislabeled / degenerate
    * vectors sit far from their cluster's mean). Centroids are
    * O(labels) and ride a broadcast, so the corpus never shuffles; the
    * per-label window ranks only within a label's members. Rank on
    * the rounded cosine ASC with vec_id tiebreak (engine-stable). */
  def farthestFromCentroid(emb: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val cents = labelCentroids(emb)
      .withColumn("nrm_c", fixedNormSq(col("centroid")))
    val scored = emb.withColumn("nrm_e", fixedNormSq(col("embedding")))
      .join(broadcast(cents), Seq("label"))
      .select(col("label"), col("vec_id"),
        Det.r4(cosineCol(fixedDot(col("embedding"), col("centroid")),
          col("nrm_c"), col("nrm_e"))).as("cos_centroid"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_centroid"), col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** Top-k nearest embeddings per probe row (probeKey, probeVec) by
    * cosine; probes are broadcast. Rank on the rounded cosine with
    * vec_id tiebreak so ordering is engine-stable. */
  def topKByCosine(emb: DataFrame, probes: DataFrame,
                   probeKey: String, probeVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val embN = emb.withColumn("nrm_e", fixedNormSq(col("embedding")))
    val probesN = probes.withColumn("nrm_p", fixedNormSq(col(probeVec)))
    val scored = embN.crossJoin(broadcast(probesN))
      .select(col(probeKey), col("vec_id"),
        Det.r4(cosineCol(
          fixedDot(col(probeVec), col("embedding")),
          col("nrm_p"), col("nrm_e"))).as("cos_sim"))
    val w = Window.partitionBy(col(probeKey))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** IVF-style ANN: a coarse quantizer (cells = centroid table) maps
    * every vector to its nearest cell once (build side); a query then
    * probes only the `nProbe` cells nearest to it and brute-forces
    * within those — the classic inverted-file trade: recall vs the
    * fraction of the corpus scanned. At 100 TB the assignment table is
    * written partitioned by cell_id so a probe reads only its cells'
    * partitions; cells stay broadcast-sized (√N cells ≈ thousands).
    *
    * The cell table here is any (cell_id, centroid) frame —
    * [[labelCentroids]] in the queries (deterministic), k-means in a
    * production build.
    */
  def ivfTopK(emb: DataFrame, cells: DataFrame, queries: DataFrame,
              queryKey: String, queryVec: String,
              k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val cellsB = broadcast(cells.select(col("cell_id"),
      col("centroid"), fixedNormSq(col("centroid")).as("cnrm")))
    val assigned = assignCells(emb, cellsB)
    // probe: nProbe nearest cells per query
    val pw = Window.partitionBy(col(queryKey))
      .orderBy(col("cell_cos").desc, col("cell_id"))
    val probes = queries
      .withColumn("qnrm", fixedNormSq(col(queryVec)))
      .crossJoin(cellsB)
      .withColumn("cell_cos", Det.r4(cosineCol(
        fixedDot(col(queryVec), col("centroid")),
        col("qnrm"), col("cnrm"))))
      .withColumn("prn", row_number().over(pw))
      .where(col("prn") <= nProbe)
      .select(col(queryKey), col(queryVec), col("qnrm"), col("cell_id"))
    // scan only the probed cells
    val sw = Window.partitionBy(col(queryKey))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(assigned, Seq("cell_id"))
      .select(col(queryKey), col("vec_id"),
        Det.r4(cosineCol(
          fixedDot(col(queryVec), col("embedding")),
          col("qnrm"), col("enrm"))).as("cos_sim"))
      .withColumn("rn", row_number().over(sw).cast("long"))
      .where(col("rn") <= k)
  }

  /** IVF serving over a PRE-BUILT (ideally session-materialized)
    * [[assignCells]] frame, with an optional scan-time predicate —
    * the FILTERED vector search shape (every real vector deployment's
    * second feature: "nearest neighbors WHERE lang = query's lang").
    * The filter applies to the candidate rows AFTER the probe join,
    * exactly where an inverted-list scan applies its metadata
    * predicate — the index is built once, unfiltered; queries carry
    * their own constraint columns and `scanFilter` may reference both
    * sides. At 100 TB the assignment table stores the filter columns
    * alongside the codes so the predicate prunes before any distance
    * math — mirror that by joining the metadata into `assigned`
    * before calling. */
  def ivfTopKFromAssigned(assigned: DataFrame, cellsB: DataFrame,
                          queries: DataFrame, queryKey: String,
                          queryVec: String, k: Int, nProbe: Int,
                          scanFilter: Column = lit(true)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.ensureRegistered(assigned.sparkSession)
    val pw = Window.partitionBy(col(queryKey))
      .orderBy(col("cell_cos").desc, col("cell_id"))
    val probes = queries
      .withColumn("qnrm", fixedNormSq(col(queryVec)))
      .crossJoin(cellsB)
      .withColumn("cell_cos", Det.r4(cosineCol(
        fixedDot(col(queryVec), col("centroid")),
        col("qnrm"), col("cnrm"))))
      .withColumn("prn", row_number().over(pw))
      .where(col("prn") <= nProbe)
      .drop("centroid", "cnrm", "cell_cos", "prn")
    val sw = Window.partitionBy(col(queryKey))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(assigned, Seq("cell_id"))
      .where(scanFilter)
      .select(col(queryKey), col("vec_id"),
        Det.r4(cosineCol(
          fixedDot(col(queryVec), col("embedding")),
          col("qnrm"), col("enrm"))).as("cos_sim"))
      .withColumn("rn", row_number().over(sw).cast("long"))
      .where(col("rn") <= k)
  }

  /** Nearest-cell assignment of every corpus vector — the IVF build
    * side, shared by [[ivfTopK]] and [[semDedup]]. Argmax via max_by
    * aggregation: partial/final (map-side combine) and no sort. A
    * row_number() window here would force a full shuffle+sort of the
    * N×C crossed frame just to pick one row per vector (the r1
    * scale-killer); max_by reduces each partition's N×C slice to N
    * rows before the exchange. Ties break to the smallest cell_id
    * (the -cell_id struct field), mirroring the oracle's
    * `ORDER BY cell_cos DESC, cell_id`. `cellsB` must already carry
    * (cell_id, centroid, cnrm) and be broadcast-sized. */
  def assignCells(emb: DataFrame, cellsB: DataFrame): DataFrame =
    emb
      .withColumn("enrm", fixedNormSq(col("embedding")))
      .crossJoin(cellsB)
      .withColumn("cell_cos", Det.r4(cosineCol(
        fixedDot(col("embedding"), col("centroid")),
        col("enrm"), col("cnrm"))))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("cell_id"), col("embedding"), col("enrm")),
        struct(col("cell_cos"), (-col("cell_id")).as("tb"))).as("best"))
      .select(col("best.cell_id").as("cell_id"), col("vec_id"),
        col("best.embedding").as("embedding"), col("best.enrm").as("enrm"))

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    * by clustering embeddings with k-means and comparing pairs ONLY
    * within a cluster — the trick that turns all-pairs cosine dedup
    * into |cells| independent quadratic problems of bounded size. A
    * vector is a duplicate when some LOWER-id cluster-mate is within
    * cosine `tau` (keep-first, the repo's standing keeper policy; the
    * paper keeps the member farthest from the centroid — same pair
    * set, different keeper choice).
    *
    * Scale contract: production sizes k ≈ N/m so mean cell size m
    * stays fixed as the corpus grows (the paper uses 50k clusters for
    * 100M embeddings); cells that still exceed `cap` members (mode
    * collapse, all-zero vectors) are EXCLUDED from pair generation
    * and flagged `over_cap` — the same hot-bucket policy as the LSH
    * band caps. The within-cell self-join shuffles on cell_id only;
    * nothing in the plan is quadratic in the corpus. */
  def semDedup(emb: DataFrame, cells: DataFrame, tau: Double,
               cap: Int): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val cellsB = broadcast(cells.select(col("cell_id"),
      col("centroid"), fixedNormSq(col("centroid")).as("cnrm")))
    semDedupFromAssigned(assignCells(emb, cellsB), tau, cap)
  }

  /** [[semDedup]] over a pre-computed (and ideally MATERIALIZED)
    * [[assignCells]] frame. The dedup plan references the assignment
    * four times (both pair sides, the cell-size count, the final
    * projection) — un-materialized, that is four N×k assignment
    * passes over the corpus; the scored query persists it per
    * session like the other corpus-sized intermediates. */
  def semDedupFromAssigned(assigned: DataFrame, tau: Double,
                           cap: Int): DataFrame = {
    // cell sizes are O(|cells|) — broadcast the under-cap cell list
    val okc = broadcast(assigned.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("csz"))
      .where(col("csz") <= cap)
      .select(col("cell_id"), lit(1L).as("ok")))
    val a1 = assigned.select(col("cell_id"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("enrm").as("n1"))
    val a2 = assigned.select(col("cell_id"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("enrm").as("n2"))
    val pcos = a1.join(a2, Seq("cell_id")).where(col("v1") < col("v2"))
      .join(okc.select(col("cell_id")), Seq("cell_id"))
      .select(col("v1"), col("v2"),
        Det.r4(cosineCol(fixedDot(col("e1"), col("e2")),
          col("n1"), col("n2"))).as("cos_sim"))
    val prior = pcos.groupBy(col("v2").as("vec_id"))
      .agg(sum(when(col("cos_sim") >= lit(tau), lit(1L)).otherwise(lit(0L)))
        .as("n_prior"),
        max(col("cos_sim")).as("max_prior_cos"))
    assigned.select(col("vec_id"), col("cell_id"))
      .join(prior, Seq("vec_id"), "left")
      .join(okc, Seq("cell_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        // -2.0 sentinel: below any true cosine, so "no lower-id
        // cell-mate scored" is distinguishable from a real -1.0
        coalesce(col("max_prior_cos"), lit(-2.0)).as("max_prior_cos"),
        (coalesce(col("n_prior"), lit(0L)) > 0).cast("long").as("is_dup"),
        col("ok").isNull.cast("long").as("over_cap"))
  }

  /** Hot-cell rescue for [[semDedupFromAssigned]] — the second-chance
    * pass the minhash/simhash families already have
    * ([[Dedup]]'s rescue discipline): members of OVER-CAP cells get
    * one extra deterministic k-means split (seeds = the `ksub`
    * lowest vec_ids of the cell, one assignment round, one
    * fixed-point mean, one re-assignment — exactly one
    * [[kmeansCells]] iteration scoped to the cell), then dedup runs
    * within sub-cells that now fit the cap. A boilerplate-heavy
    * corpus concentrates exactly where dedup matters most; without
    * this, those rows exit the pipeline unjudged.
    *
    * Output (hot-cell members only): vec_id, cell_id, sub_id,
    * n_prior, max_prior_cos, is_dup, rescued — `rescued`=0 marks
    * members of sub-cells STILL over the cap (sentinel verdicts, the
    * residual monitoring surface; a deploy recurses or routes them to
    * exact dedup).
    *
    * Scale: the hot population is the over-cap residue, not the
    * corpus; seeds and sub-centroids are O(hot_cells·ksub) —
    * broadcast; the per-cell ranking window sorts only hot members
    * within their cell; pair generation stays cap-bounded per
    * sub-cell. Determinism: same seed/tie-break/fixed-point
    * discipline as [[kmeansCells]], so the DuckDB CTE replay is
    * exact. */
  def semDedupSubSplit(assigned: DataFrame, tau: Double, cap: Int,
                       ksub: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hotCells = broadcast(assigned.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("csz"))
      .where(col("csz") > cap)
      .select(col("cell_id")))
    val hot = assigned.join(hotCells, Seq("cell_id"))
    val sw = Window.partitionBy(col("cell_id")).orderBy(col("vec_id"))
    val seeds = hot
      .withColumn("srn", row_number().over(sw))
      .where(col("srn") <= ksub)
      .select(col("cell_id"), col("vec_id").as("sub_id"),
        transform(col("embedding"), _.cast("double")).as("scent"))
    def withNorm(cent: DataFrame): DataFrame =
      cent.withColumn("scnorm", fixedNormSq(col("scent")))
    // assign each hot member to its nearest same-cell sub-centroid —
    // the max_by argmax shape of assignCells, tie to smallest sub_id
    def assignTo(cent: DataFrame): DataFrame =
      hot.join(broadcast(cent), Seq("cell_id"))
        .withColumn("sub_cos", Det.r4(cosineCol(
          fixedDot(col("embedding"), col("scent")),
          col("enrm"), col("scnorm"))))
        .groupBy(col("vec_id"))
        .agg(max_by(
          struct(col("cell_id"), col("sub_id"), col("embedding"),
            col("enrm")),
          struct(col("sub_cos"), (-col("sub_id")).as("tb"))).as("best"))
        .select(col("best.cell_id").as("cell_id"),
          col("best.sub_id").as("sub_id"), col("vec_id"),
          col("best.embedding").as("embedding"),
          col("best.enrm").as("enrm"))
    val a0 = assignTo(withNorm(seeds))
    // one fixed-point mean round (the kmeansCells per-pos formula)
    val perPos = a0
      .select(col("cell_id"), col("sub_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell_id"), col("sub_id"), col("pos"))
      .agg(((sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5))
        .cast("long")).cast("double") / count(lit(1))) / lit(1e9)).as("cv"))
    val cent1 = perPos.groupBy(col("cell_id"), col("sub_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("scent"))
    val a1 = assignTo(withNorm(cent1))
    // dedup within sub-cells that fit the cap
    val sok = broadcast(a1.groupBy(col("cell_id"), col("sub_id"))
      .agg(count(lit(1)).as("ssz"))
      .where(col("ssz") <= cap)
      .select(col("cell_id"), col("sub_id"), lit(1L).as("sok")))
    val p1 = a1.select(col("cell_id"), col("sub_id"),
      col("vec_id").as("v1"), col("embedding").as("e1"), col("enrm").as("n1"))
    val p2 = a1.select(col("cell_id"), col("sub_id"),
      col("vec_id").as("v2"), col("embedding").as("e2"), col("enrm").as("n2"))
    val pcos = p1.join(p2, Seq("cell_id", "sub_id"))
      .where(col("v1") < col("v2"))
      .join(sok.select(col("cell_id"), col("sub_id")), Seq("cell_id", "sub_id"))
      .select(col("v1"), col("v2"),
        Det.r4(cosineCol(fixedDot(col("e1"), col("e2")),
          col("n1"), col("n2"))).as("cos_sim"))
    val prior = pcos.groupBy(col("v2").as("vec_id"))
      .agg(sum(when(col("cos_sim") >= lit(tau), lit(1L)).otherwise(lit(0L)))
        .as("n_prior"),
        max(col("cos_sim")).as("max_prior_cos"))
    a1.select(col("vec_id"), col("cell_id"), col("sub_id"))
      .join(prior, Seq("vec_id"), "left")
      .join(sok, Seq("cell_id", "sub_id"), "left")
      .select(col("vec_id"), col("cell_id"), col("sub_id"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        coalesce(col("max_prior_cos"), lit(-2.0)).as("max_prior_cos"),
        (coalesce(col("n_prior"), lit(0L)) > 0).cast("long").as("is_dup"),
        col("sok").isNotNull.cast("long").as("rescued"))
  }

  /** [[semDedupFromAssigned]] + [[semDedupSubSplit]] composed: the
    * base verdicts with over-cap rows REPLACED by their sub-split
    * verdicts where the split succeeded. Schema = the base columns +
    * `rescued` (1 = verdict came from the sub-split; `over_cap` keeps
    * meaning "the PRIMARY cell was over cap", so over_cap=1 ∧
    * rescued=0 is the still-unjudged residue a deploy monitors). */
  def semDedupWithRescue(assigned: DataFrame, tau: Double, cap: Int,
                         ksub: Int): DataFrame = {
    val base = semDedupFromAssigned(assigned, tau, cap)
    val resc = semDedupSubSplit(assigned, tau, cap, ksub)
      .select(col("vec_id"), col("n_prior").as("r_np"),
        col("max_prior_cos").as("r_mpc"), col("is_dup").as("r_dup"),
        col("rescued"))
    base.join(resc, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        when(col("rescued") === 1L, col("r_np"))
          .otherwise(col("n_prior")).as("n_prior"),
        when(col("rescued") === 1L, col("r_mpc"))
          .otherwise(col("max_prior_cos")).as("max_prior_cos"),
        when(col("rescued") === 1L, col("r_dup"))
          .otherwise(col("is_dup")).as("is_dup"),
        col("over_cap"),
        coalesce(col("rescued"), lit(0L)).as("rescued"))
  }

  /** SemDeDup cell-cap read-out (r14 verdict #6): ONE row
    * `(cap_used, cap_saturated, capped_frac, hot_cells)` over the
    * cell SIZE distribution — the [[graft.ext.Dedup.bucketCapStats]]
    * shape for the semantic family. Pair mass per cell is C(csz,2);
    * saturation = the cap keeps < 5% of the within-cell pair mass
    * (20× integer rule). Like the LSH bucket cap, no auto-escalation:
    * the structural escalation is [[semDedupSubSplit]] (over-cap
    * cells get a scoped k-means split), and the residual monitoring
    * surface is `over_cap=1 ∧ rescued=0` rows — this read-out makes
    * the aggregate saturation visible at serve time so a deploy sizes
    * `ksub` / recurses instead of discovering a thin verdict set
    * after the fact. Cell histogram is O(k) rows. SQL twin:
    * [[cellCapStatsSql]].
    */
  def cellCapStats(assigned: DataFrame, cap: Int): DataFrame =
    assigned.groupBy(col("cell_id")).agg(count(lit(1)).as("csz"))
      .withColumn("fan", shiftright(col("csz") * (col("csz") - 1), 1))
      .agg(
        coalesce(sum(col("fan")), lit(0L)).as("total_pairs"),
        coalesce(sum(when(col("csz") <= cap, col("fan"))
          .otherwise(lit(0L))), lit(0L)).as("kept_pairs"),
        coalesce(sum(when(col("csz") > cap, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("hot_cells"))
      .select(
        lit(cap.toLong).as("cap_used"),
        (col("kept_pairs") * 20 < col("total_pairs")).cast("long")
          .as("cap_saturated"),
        Det.r4(when(col("total_pairs") === 0L, lit(1.0))
          .otherwise(col("kept_pairs").cast("double") /
            col("total_pairs").cast("double"))).as("capped_frac"),
        col("hot_cells"))

  /** DuckDB twin of [[cellCapStats]] as CTEs ending in `cellstats`.
    * `assignCte` must expose (vec_id, cell_id); `r4` is the caller's
    * rounding twin. */
  def cellCapStatsSql(assignCte: String, cap: Int,
                      r4: String => String): String =
    s"""csz AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS csz
       |        FROM $assignCte GROUP BY 1),
       |cagg AS (SELECT
       |    CAST(coalesce(sum(csz*(csz-1)//2), 0) AS BIGINT) AS total_pairs,
       |    CAST(coalesce(sum(CASE WHEN csz <= $cap THEN csz*(csz-1)//2
       |      ELSE 0 END), 0) AS BIGINT) AS kept_pairs,
       |    CAST(coalesce(sum(CASE WHEN csz > $cap THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS hot_cells
       |    FROM csz),
       |cellstats AS (SELECT CAST($cap AS BIGINT) AS cap_used,
       |    CAST(CASE WHEN kept_pairs*20 < total_pairs THEN 1 ELSE 0 END
       |      AS BIGINT) AS cap_saturated,
       |    ${r4("CASE WHEN total_pairs = 0 THEN 1.0 ELSE " +
              "CAST(kept_pairs AS DOUBLE)/CAST(total_pairs AS DOUBLE) " +
              "END")} AS capped_frac,
       |    hot_cells FROM cagg)""".stripMargin

  /** Deterministic fixed-iteration k-means coarse quantizer — the
    * production cell builder [[ivfTopK]]'s scaladoc promises (label
    * centroids are the testdata stand-in). Spark-first shape: each
    * round is one broadcast-crossed assignment (the same `max_by`
    * argmax as ivfTopK's build side — partial/final agg, no window)
    * plus one fixed-point per-dimension mean (the [[labelCentroids]]
    * formula, grouped by assigned cell instead of label).
    *
    * Determinism contract (what makes the DuckDB CTE replay possible):
    * seeds are the k lowest-id vectors (cell_id = seed vec_id);
    * assignment ranks the r4-rounded cosine with min-cell_id
    * tie-break; means snap each member term to 1e-9 units and divide
    * exact integer sums — so every round is bit-reproducible on any
    * partitioning. FIXED iterations, no convergence test: a
    * data-dependent stopping rule would make the oracle's round count
    * dynamic. Cells that lose all members simply drop out (GROUP BY
    * emits only non-empty cells) — identically on both engines.
    *
    * Scale: cells stay broadcast-sized (k ≈ √N); each round touches
    * the corpus once (N×k crossed rows reduced map-side); the
    * per-round `localCheckpoint` is on the k-row centroid frame only,
    * keeping the loop's lineage flat. */
  def kmeansCells(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    var cells = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cell_id"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    for (_ <- 0 until iters) {
      val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
        fixedNormSq(col("centroid")).as("cnrm")))
      val assigned = emb
        .withColumn("enrm", fixedNormSq(col("embedding")))
        .crossJoin(cellsB)
        .withColumn("cell_cos", Det.r4(cosineCol(
          fixedDot(col("embedding"), col("centroid")),
          col("enrm"), col("cnrm"))))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cell_id"), col("embedding")),
          struct(col("cell_cos"), (-col("cell_id")).as("tb"))).as("best"))
        .select(col("best.cell_id").as("cell_id"),
          col("best.embedding").as("embedding"))
      val perPos = assigned
        .select(col("cell_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(((sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5))
          .cast("long")).cast("double") / count(lit(1))) / lit(1e9)).as("cv"))
      cells = perPos.groupBy(col("cell_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("cv")))),
          s => s.getField("cv")).as("centroid"))
        .localCheckpoint(true)
    }
    cells
  }

  /** Top principal direction of the embedding cloud via deterministic
    * fixed-iteration POWER ITERATION on the centered data — the
    * embedding-QA/dimensionality read-out (a collapsed corpus shows a
    * dominant direction carrying most variance; whitening and OPQ-
    * style rotations start from exactly this computation). Each round
    * is two corpus passes expressed as aggregations: s_x = (x−m)·v
    * per vector (1e-12 per-term snap, exact sum), then w_i = Σ_x
    * (x−m)_i·s_x (1e-9 snap), then v' = w/‖w‖ — every double step a
    * correctly-rounded IEEE op, every sum over snapped integers, so
    * the whole loop replays bit-exact as a DuckDB CTE chain (the
    * kmeansCells discipline). FIXED iterations and a FIXED seed: a
    * convergence test or random init would unfix the oracle; the
    * result is the documented `iters`-step approximant, not a claimed
    * eigenvector. The seed is the uniform direction 1/√d — an axis
    * seed (e_1) zeroes out whenever that axis has no variance (a
    * constant dimension: padding, a dead feature), which a real
    * corpus absolutely can have; a zero normalizer is still guarded
    * (emits the zero direction rather than dividing by zero, the
    * honest report for degenerate data).
    *
    * Scale: state per round is the 64-row direction frame
    * (localCheckpoint keeps lineage flat); the corpus long-form joins
    * s on vec_id (co-partitioned at write time at 100 TB) and never
    * materializes anything quadratic. Output: (dim, mean_v, pc1). */
  def topDirection(emb: DataFrame, iters: Int = 2): DataFrame = {
    val expl = emb
      .select(col("vec_id"),
        posexplode(transform(col("embedding"), _.cast("double")))
          .as(Seq("pos", "v")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("v"))
    val mean = expl.groupBy(col("i"))
      .agg(((sum(floor(col("v") * lit(1e9) + lit(0.5)).cast("long"))
        .cast("double") / count(lit(1))) / lit(1e9)).as("m"))
    val cexp = expl.join(broadcast(mean), Seq("i"))
      .select(col("vec_id"), col("i"), (col("v") - col("m")).as("cv"))
      .persist()
    val dcnt = mean.agg(count(lit(1)).as("dcnt"))
    var v = mean.crossJoin(broadcast(dcnt))
      .select(col("i"),
        (lit(1.0) / sqrt(col("dcnt").cast("double"))).as("vi"))
    for (_ <- 0 until iters) {
      val s = cexp.join(broadcast(v), Seq("i"))
        .groupBy(col("vec_id"))
        .agg((sum(floor(col("cv") * col("vi") * lit(1e12) + lit(0.5))
          .cast("long")).cast("double") / lit(1e12)).as("s"))
      val w = cexp.join(s, Seq("vec_id"))
        .groupBy(col("i"))
        .agg((sum(floor(col("cv") * col("s") * lit(1e9) + lit(0.5))
          .cast("long")).cast("double") / lit(1e9)).as("w"))
      val n = w.agg(sqrt(sum(floor(col("w") * col("w") * lit(1e12)
        + lit(0.5)).cast("long")).cast("double") / lit(1e12)).as("nr"))
      v = w.crossJoin(broadcast(n))
        .select(col("i"),
          when(col("nr") === 0.0, lit(0.0))
            .otherwise(col("w") / col("nr")).as("vi"))
        .localCheckpoint(true)
    }
    // every round's v is an EAGER checkpoint, so nothing downstream
    // reads cexp again — release the corpus-sized cache now instead
    // of leaking one copy per call for the session lifetime
    cexp.unpersist()
    v.join(broadcast(mean), Seq("i"))
      .select(col("i").cast("long").as("dim"),
        Det.r4(col("m")).as("mean_v"), Det.r4(col("vi")).as("pc1"))
  }

  // ---------------------------------------------------------------
  // Multi-band sign-LSH near-duplicate search.
  //
  // The r1 single-table variant bucketed on the sign pattern of the
  // first 6 dims: 64 buckets TOTAL, independent of N, so intra-bucket
  // pairs were ~N²/64 — quadratic with a constant shaved off. The
  // banded scheme below is the random-projection analog of minhash
  // banding: `bands` independent tables, each keyed by the sign
  // pattern of `bits` distinct dimensions. A pair is a candidate if
  // it agrees on ALL bits of ANY band; bucket count per band is 2^bits,
  // so expected candidates ≈ bands·N²/2^bits — pick bits ≳ log2(N)+4
  // ([[autoBandBits]]) and that is ~bands·N/16: linear in N.
  // ---------------------------------------------------------------

  /** Default shape for the scored query: 4 tables × 16 bits covers all
    * 64 embedding dims and gives 65 536 buckets per table (vs r1's 64
    * total). Constants are pinned (not [[autoBandBits]]) because the
    * DuckDB oracle is a static SQL string that must agree at every
    * scale factor; a production deployment sizes bits from the corpus
    * count instead. */
  val DefaultBands = 4
  val DefaultBandBits = 16

  /** Band buckets above this size are dropped from pair generation
    * (and counted via [[overCapBuckets]]): a degenerate hot bucket —
    * all-zero embeddings, boilerplate-heavy corpora — would otherwise
    * go quadratic WITHIN the bucket no matter how many buckets exist.
    * Contract note: members of an over-cap bucket are near-identical
    * along that band's dims; exact dedup (or a re-band on other dims)
    * owns them, the same policy as [[Dedup]]'s minhash cap. */
  val DefaultBucketCap = 1000

  /** Production sizing: 2^bits ≥ 16·N keeps expected intra-bucket
    * pairs per band under N/16. Floor of 16 bits; callers must keep
    * bands·bits ≤ embedding dim. */
  def autoBandBits(n: Long, floorBits: Int = 16): Int = {
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))
    math.max(floorBits, bitLen + 4)
  }

  /** Sign bucket of band `band`: bits from dims
    * [band·bits+1, band·bits+bits] (1-based), LSB-first. */
  def signBandBucket(emb: Column, band: Int, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(emb, band * bits + i + 1) > lit(0.0f), lit(1L << i))
        .otherwise(lit(0L)))
      .reduce(_ + _)

  def signBandBucketSql(expr: String, band: Int, bits: Int): String =
    (0 until bits)
      .map(i =>
        s"CASE WHEN $expr[${band * bits + i + 1}] > 0.0 THEN ${1L << i} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Long-form (vec_id, band, bucket) over all bands — one explode,
    * no self-union, so the source is scanned once. */
  def bandBuckets(emb: DataFrame, bands: Int, bits: Int): DataFrame =
    emb.select(col("vec_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b.toLong).as("band"),
          signBandBucket(col("embedding"), b, bits).as("bucket"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** (band, bucket, sz) for buckets over the cap — the monitoring
    * surface for the drop policy (a deploy logs/alerts on this count;
    * tests assert it). */
  def overCapBuckets(emb: DataFrame, bands: Int, bits: Int, cap: Int): DataFrame =
    bandBuckets(emb, bands, bits)
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("sz"))
      .where(col("sz") > cap)

  /** Candidate pairs from the banded tables: (v1, v2, bands) where
    * `bands` counts agreeing band tables. Shuffles only on
    * (band, bucket) keys and pair ids — never a cross join — and
    * drops over-cap buckets before pairing. */
  def bandedCandidates(emb: DataFrame, bands: Int, bits: Int,
                       cap: Int = DefaultBucketCap): DataFrame = {
    val bb = bandBuckets(emb, bands, bits)
    val ok = bb.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
      .where(col("sz") <= cap)
      .select(col("band"), col("bucket"))
    val kept = bb.join(ok, Seq("band", "bucket"))
    val a = kept.select(col("band"), col("bucket"), col("vec_id").as("v1"))
    val b2 = kept.select(col("band"), col("bucket"), col("vec_id").as("v2"))
    a.join(b2, Seq("band", "bucket")).where(col("v1") < col("v2"))
      .groupBy(col("v1"), col("v2")).agg(count(lit(1)).as("bands"))
  }

  /** Banded-LSH near-dup pairs rescored with the exact fixed-point
    * cosine: candidates from [[bandedCandidates]], embeddings joined
    * back per side (candidates ≪ N², so two hash joins on vec_id beat
    * carrying arrays through the band explosion). */
  def bandedPairCosine(emb: DataFrame,
                       bands: Int = DefaultBands,
                       bits: Int = DefaultBandBits,
                       cap: Int = DefaultBucketCap): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val cand = bandedCandidates(emb, bands, bits, cap)
    val withN = emb.select(col("vec_id"), col("embedding"),
      fixedNormSq(col("embedding")).as("nrm"))
    cand
      .join(withN.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1")), Seq("v1"))
      .join(withN.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("n2")), Seq("v2"))
      .select(col("v1"), col("v2"), col("bands"),
        Det.r4(cosineCol(
          fixedDot(col("e1"), col("e2")),
          col("n1"), col("n2"))).as("cos_sim"))
  }

  // ---------------------------------------------------------------
  // Graph ANN (NSW-family): greedy beam search over a k-NN graph —
  // the third serving family beside quantization (IVF/PQ/SQ) and
  // hashing (LSH). Malkov & Yashunin's HNSW is the public shape; the
  // distributed re-expression builds the neighbor graph from the
  // CAPPED banded-LSH candidates (never all pairs — the same bounded
  // candidate generation the near-dup family runs), keeps the top-K
  // neighbors per vertex, and serves by T fixed rounds of
  // expand-score-prune from deterministic entry points. Every stage
  // is joins + windows over key-partitioned frames; the graph is the
  // only corpus-sized artifact and it is scanned by key, never
  // shuffled whole.
  // ---------------------------------------------------------------

  /** Graph geometry for the scored queries: 8 neighbors per vertex,
    * beam width 32, 4 expansion rounds, 4 entry points. Pinned
    * constants (the oracle replays the rounds as CTEs); production
    * uses K≈32, beam ≈ 64–128. Tuned against the recall twin on the
    * sf0.01 corpus: beam width is the dominant lever (the efSearch
    * analog — 8→16→32 moved recall@3 0.40→0.53→0.67) and a 4th
    * round buys 0.67→0.73; widening the ENTRY set or densifying K
    * measured strictly worse (beam saturation by entry-region
    * vertices / near-dup edges crowding the expansion).
    *
    * The graph BUILD runs its own COARSE banded LSH
    * ([[GraphBandBits]] = 8 vs the near-dup family's 16): a
    * navigable graph needs medium-similarity edges to hill-climb
    * across, not just near-identical pairs — 8-bit sign buckets
    * admit them while the bucket cap still bounds the build. (The
    * first cut of this family reused the near-dup 16-bit bands and
    * measured recall@3 ≈ 0.03: the graph was near-edgeless, every
    * vertex isolated from its true neighbors. The recall twin is
    * the read-out that caught it.) */
  val GraphK = 8
  val GraphBeam = 32
  val GraphRounds = 4
  val GraphEntries = 4
  val GraphBands = 4
  val GraphBandBits = 8

  /** Deterministic k-NN graph over the corpus: symmetrized banded-LSH
    * candidate pairs rescored by exact cosine, top-[[GraphK]] per
    * vertex by (cos DESC, neighbor ASC). Build cost is bounded by the
    * LSH bucket caps — a vertex with no surviving candidates is
    * simply isolated (the recall twin prices that honestly). */
  def knnGraph(emb: DataFrame, k: Int = GraphK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pc = bandedPairCosine(emb, GraphBands, GraphBandBits)
    val sym = pc.select(col("v1").as("v"), col("v2").as("n"), col("cos_sim"))
      .unionByName(
        pc.select(col("v2").as("v"), col("v1").as("n"), col("cos_sim")))
    val w = Window.partitionBy(col("v"))
      .orderBy(col("cos_sim").desc, col("n"))
    sym.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("v"), col("n"))
  }

  /** Beam-search serve over a [[knnGraph]]: start from the `entries`
    * lowest-id vectors, then `rounds` rounds of (expand current beam
    * through the graph) → (exact-cosine score ONLY the candidates) →
    * (keep top-`beam` per query). Scoring touches ≤ nq·beam·(K+1)
    * rows per round — never the corpus.
    *
    * r17 REWRITE (same results, the r16 verdict's top item): the beam
    * is carried as ONE aggregated array-state row per query —
    * (queryKey, qvec, qnrm, beam: array<(cos, vid, ns)>) — where each
    * member's struct carries its OWN adjacency list, fetched in the
    * same scan that scored it. A round is then a single plan: explode
    * the state's candidate ids (beam ∪ members' neighbor lists —
    * pure array ops, no graph join), one broadcast-hash lookup into
    * the adjacency-joined corpus ([[corpusWithAdj]]), and one
    * per-query collect/sort/slice aggregation — ~3 Spark jobs per
    * round where the r16 shape paid ~5–6 (separate graph-expand
    * broadcast, a distinct() exchange, a qn broadcast, and the
    * ranking-window exchange, every round). The top-`beam` cut by
    * (cos DESC, vid ASC) over the array is element-identical to the
    * old row_number window; candidate sets are identical because a
    * member's `ns` IS its graph row set; the final top-k reads the
    * last round's scores (same rounded expression over the same
    * rows — every beam member was scored in the round that admitted
    * it, and rescoring is deterministic).
    *
    * Per-round localCheckpoints are now OFF by default: the r16
    * negative result (removal = 2–4× slower) was caused by the old
    * round plan referencing the previous beam TWICE (the union leg
    * and the graph-expand broadcast), which compounded the replay per
    * round; the array state is referenced exactly ONCE per round, so
    * the un-truncated plan is linear and the checkpoints were pure
    * overhead — measured at sf0.1 warm: q_ann_hnsw 3.7 → 2.3 s,
    * l1-only serve 1.7 → 0.8 s with checkpoints off on the new shape.
    * `spark.graft.ann.roundCheckpoint=true` restores them (a cluster
    * deploy that wants lineage cut per round for fault-recovery
    * bounds sets it, at ~0.1 s per round of driver-action cost). */
  def graphTopK(graph: DataFrame, emb: DataFrame, queries: DataFrame,
                queryKey: String, queryVec: String, k: Int,
                beam: Int = GraphBeam, rounds: Int = GraphRounds,
                entries: Int = GraphEntries,
                entryDf: Option[DataFrame] = None,
                corpusAdj: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val ckptRounds = emb.sparkSession.conf
      .getOption("spark.graft.ann.roundCheckpoint").contains("true")
    def trunc(df: DataFrame): DataFrame =
      if (ckptRounds) df.localCheckpoint(true) else df
    // the serving structure: corpus rows with their adjacency arrays.
    // Session callers pass the snapshot ([[corpusWithAdj]] warmed under
    // _shared:knn_graph); ad-hoc callers (persisted-index serves,
    // tests) get a per-serve eager materialization — the rounds would
    // otherwise re-run the adjacency agg + join once per round.
    val corpusG = corpusAdj.getOrElse(
      corpusWithAdj(graph, emb).localCheckpoint(true))
    val qn = queries.withColumn("qnrm", fixedNormSq(col(queryVec)))
    // one round = one plan: broadcast the candidate ids into the
    // adjacency-joined corpus, score, keep top-beam per query as a
    // sorted array slice. `cand` must expose (queryKey, qvec, qnrm,
    // vec_id).
    val cmp = (l: Column, r: Column) =>
      when(l.getField("cos") > r.getField("cos"), lit(-1))
        .when(l.getField("cos") < r.getField("cos"), lit(1))
        .when(l.getField("vid") < r.getField("vid"), lit(-1))
        .when(l.getField("vid") > r.getField("vid"), lit(1))
        .otherwise(lit(0))
    def round(cand: DataFrame): DataFrame =
      corpusG.join(broadcast(cand), Seq("vec_id"))
        .select(col(queryKey), col(queryVec), col("qnrm"),
          struct(
            Det.r4(cosineCol(fixedDot(col(queryVec), col("embedding")),
              col("qnrm"), col("enrm"))).as("cos"),
            col("vec_id").as("vid"), col("ns")).as("sc"))
        .groupBy(col(queryKey))
        .agg(first(col(queryVec)).as(queryVec),
          first(col("qnrm")).as("qnrm"),
          slice(array_sort(collect_list(col("sc")), cmp), 1, beam)
            .as("beam"))
    // entry set: per-query rows (the HNSW descend path hands the
    // upper layer's result down) or the global lowest-id vertices
    val entryCand = entryDf match {
      case Some(e) => qn.join(broadcast(e), Seq(queryKey))
        .select(col(queryKey), col(queryVec), col("qnrm"), col("vec_id"))
      case None =>
        val entry = corpusG.orderBy(col("vec_id")).limit(entries)
          .select(col("vec_id"))
        qn.crossJoin(broadcast(entry))
          .select(col(queryKey), col(queryVec), col("qnrm"), col("vec_id"))
    }
    var state = trunc(round(entryCand))
    for (_ <- 1 to rounds) {
      val cand = state.select(col(queryKey), col(queryVec), col("qnrm"),
        explode(array_distinct(concat(
          transform(col("beam"), b => b.getField("vid")),
          flatten(transform(col("beam"), b => b.getField("ns"))))))
          .as("vec_id"))
      state = trunc(round(cand))
    }
    // final top-k from the last beam's scores (identical to rescoring:
    // same rounded expression over the same rows)
    val w = Window.partitionBy(col(queryKey))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    state.select(col(queryKey), explode(col("beam")).as("b"))
      .select(col(queryKey), col("b.vid").as("vec_id"),
        col("b.cos").as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(queryKey), col("vec_id"), col("cos_sim"), col("rn"))
  }

  /** The graph-serve structure [[graphTopK]] scans each round: corpus
    * rows with norms and their out-neighbor arrays (empty for
    * isolated vertices). Session consumers snapshot this once (the
    * _shared:knn_graph build); a production deployment persists it —
    * it IS the navigable index. */
  def corpusWithAdj(graph: DataFrame, emb: DataFrame): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val adj = graph.groupBy(col("v"))
      .agg(sort_array(collect_list(col("n"))).as("ns"))
      .withColumnRenamed("v", "vec_id")
    emb.select(col("vec_id"), col("embedding"),
        fixedNormSq(col("embedding")).as("enrm"))
      .join(adj, Seq("vec_id"), "left")
      .withColumn("ns", coalesce(col("ns"),
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))))
  }

  /** HNSW layer geometry: layer 1 lives on the `vec_id %
    * [[HnswSampleMod]] == 0` subset (HNSW's exponentially-thinned
    * upper layer, made deterministic), searched with a narrow beam;
    * its result seeds layer 0, which then needs FEWER rounds than
    * the flat serve because the entries are already near the
    * target. Pinned constants — the oracle replays both layers.
    * Measured at sf0.01: 2 narrow subset rounds + 3 wide rounds →
    * recall@3 0.667 vs the flat serve's 0.733 at 4 wide rounds —
    * ~25% less wide-round scoring for −0.07 recall, the trade that
    * widens in the hierarchy's favor as N grows. */
  val HnswSampleMod = 8
  val HnswL1Beam = 8
  val HnswL1Rounds = 2
  val HnswL0Rounds = 3

  /** The layer-1 k-NN graph: [[knnGraph]] over the deterministic
    * sample (its own banded-LSH candidates, its own bucket caps —
    * the same bounded build at 1/[[HnswSampleMod]] the rows). */
  def knnGraphL1(emb: DataFrame, k: Int = GraphK): DataFrame =
    knnGraph(emb.where(col("vec_id") % HnswSampleMod === 0), k)

  /** Two-layer HNSW-style serve (Malkov & Yashunin's hierarchy,
    * depth 2): descend — beam-search layer 1 (subset graph, narrow
    * beam) for per-query entry points, then beam-search layer 0
    * from those entries with [[HnswL0Rounds]] rounds instead of the
    * flat serve's [[GraphRounds]]. Same bounded per-round work as
    * [[graphTopK]]; the hierarchy buys entry points already near
    * the target, which is what lets production HNSW cut rounds as
    * N grows (layer count grows log N; this pins depth 2 for the
    * oracle replay). */
  def hnswTopK(g0: DataFrame, g1: DataFrame, emb: DataFrame,
               queries: DataFrame, queryKey: String, queryVec: String,
               k: Int, corpusAdj0: Option[DataFrame] = None,
               corpusAdj1: Option[DataFrame] = None): DataFrame = {
    val sub = emb.where(col("vec_id") % HnswSampleMod === 0)
    val l1 = graphTopK(g1, sub, queries, queryKey, queryVec,
        k = HnswL1Beam, beam = HnswL1Beam, rounds = HnswL1Rounds,
        entries = GraphEntries, corpusAdj = corpusAdj1)
      .select(col(queryKey), col("vec_id"))
    graphTopK(g0, emb, queries, queryKey, queryVec, k,
      beam = GraphBeam, rounds = HnswL0Rounds, entryDf = Some(l1),
      corpusAdj = corpusAdj0)
  }

  private val kcenterMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Seq[Long]]

  /** Greedy k-center (farthest-point) coreset selection — the
    * classic 2-approximation (Gonzalez 1985) that active-learning /
    * coreset pipelines run to pick a maximally-spread data subset:
    * seed with the lowest vec_id, then k−1 rounds of "add the vector
    * whose nearest selected center is FARTHEST" (min max-cosine,
    * ties to the smallest vec_id). Each round is one broadcast
    * (selected set, O(k)) against the corpus scan plus one scalar
    * argmin fetch — k bounded driver fetches, never a data collect;
    * the corpus is never shuffled. Cosines ride the r4 fixed-point
    * pipeline, so the selection order is bit-portable and the oracle
    * replays every round. */
  def kcenterCoreset(emb: DataFrame, k: Int, memoKey: String): Seq[Long] =
    kcenterMemo.getOrElseUpdate(
      (emb.sparkSession.sparkContext.applicationId, memoKey), {
        graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
        val e = emb.select(col("vec_id"), col("embedding"),
          fixedNormSq(col("embedding")).as("nrm"))
        var centers = Seq(e.agg(min(col("vec_id"))).head().getLong(0))
        for (_ <- 2 to k) {
          val sel = e.where(col("vec_id").isin(centers: _*))
            .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
              col("nrm").as("cnrm"))
          val next = e.crossJoin(broadcast(sel))
            .select(col("vec_id"), Det.r4(cosineCol(
              fixedDot(col("embedding"), col("cvec")),
              col("nrm"), col("cnrm"))).as("cs"))
            .groupBy(col("vec_id")).agg(max(col("cs")).as("mc"))
            .agg(min(struct(col("mc"), col("vec_id"))).as("m"))
            .select(col("m.vec_id")).head().getLong(0)
          centers = centers :+ next
        }
        centers
      })

  /** The quantizer's train+encode core, shared by [[scalarQuantize]]
    * and [[sqDequantized]] so the code/dequantize formulas (which two
    * SQL oracles mirror term for term) live in exactly one place:
    * per-dim rows (vec_id, pos, v) with the corpus stats (mn, mx),
    * int8 `code`, and dequantized `dv` attached. Training state is
    * the dims-keyed stats frame — O(dims), broadcast back. */
  private def dimRows(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "f")))
      .select(col("vec_id"), col("pos"), col("f").cast("double").as("v"))

  /** The int8 scalar quantizer's TRAINING STATE: per-dimension
    * (pos, mn, mx) — O(dims) rows, the artifact a deployment persists
    * next to the IVF cells and PQ codebooks (see
    * [[graft.ext.AnnIndex]]). */
  def sqStats(emb: DataFrame): DataFrame =
    dimRows(emb).groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))

  private def codedDims(emb: DataFrame): DataFrame =
    codedDimsWith(emb, sqStats(emb))

  /** [[codedDims]] against an EXTERNALLY-TRAINED quantizer (a loaded
    * [[sqStats]] frame) — encode/decode must not retrain. */
  private def codedDimsWith(emb: DataFrame, stats: DataFrame): DataFrame = {
    val dims = dimRows(emb)
    dims.join(broadcast(stats), Seq("pos"))
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(floor((col("v") - col("mn")) / (col("mx") - col("mn"))
            * lit(255.0) + lit(0.5)).cast("long")))
      .withColumn("dv",
        col("mn") + col("code").cast("double") / lit(255.0)
          * (col("mx") - col("mn")))
  }

  /** Dequantized embeddings under the corpus-trained int8 quantizer:
    * (vec_id, dqvec, dqn) where dqvec[i] = mn_i + code/255*(mx_i-mn_i)
    * and dqn is the fixed-point squared norm (precomputed once per
    * vector — consumers score many pairs per vector). This is what a
    * compressed ANN serving tier actually scores against: codes in
    * cache, reconstruction on the fly. */
  def sqDequantized(emb: DataFrame): DataFrame =
    sqDequantizedWith(emb, sqStats(emb))

  /** [[sqDequantized]] against a loaded quantizer — the serve path of
    * a persisted SQ index. */
  def sqDequantizedWith(emb: DataFrame, stats: DataFrame): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    codedDimsWith(emb, stats)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("dv")))),
        s => s.getField("dv")).as("dqvec"))
      .withColumn("dqn", fixedNormSq(col("dqvec")))
  }

  /** Re-rank an ANN candidate shortlist (cand: queryKey, vec_id) by
    * cosine over DEQUANTIZED vectors — the serving pattern where the
    * IVF index picks candidates and the 4×-smaller SQ codes score
    * them without touching the full-precision embeddings. Output:
    * (queryKey, vec_id, sq_cos, rn ≤ k). */
  def sqRerank(cand: DataFrame, emb: DataFrame, queryKey: String,
               k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    val dq = sqDequantized(emb)
    val qdq = dq.select(col("vec_id").as(queryKey),
      col("dqvec").as("qdq"), col("dqn").as("qn"))
    val vdq = dq.select(col("vec_id"),
      col("dqvec").as("vdq"), col("dqn").as("vn"))
    val w = Window.partitionBy(col(queryKey))
      .orderBy(col("sq_cos").desc, col("vec_id"))
    cand.join(qdq, Seq(queryKey)).join(vdq, Seq("vec_id"))
      .select(col(queryKey), col("vec_id"),
        Det.r4(cosineCol(
          fixedDot(col("qdq"), col("vdq")),
          col("qn"), col("vn"))).as("sq_cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** Corpus-trained int8 scalar quantization — the compression leg of
    * a 100 TB ANN deployment (4 B float dims → 1 B codes; IVF cells
    * from [[kmeansCells]] pick candidates, SQ codes rank them in cache-
    * sized memory). Train = one per-DIMENSION min/max aggregation
    * (dims-sized frame, broadcast back — the corpus shuffles only by
    * position, never by vector); encode = pure Column arithmetic.
    *
    * Output is the per-vector code summary (n_dims, code sum/min/max,
    * reconstruction error), not the code arrays: the summary is what
    * a quality gate monitors, and it keeps the surface oracle-
    * checkable. Determinism: every double step (subtract, divide,
    * scale) is a correctly-rounded IEEE op, identical on any engine;
    * the per-dim errors are snapped to 1e-9 fixed-point BEFORE the
    * per-vector sum so summation order cannot matter. */
  def scalarQuantize(emb: DataFrame): DataFrame = {
    val coded = codedDims(emb)
      .withColumn("err_fx",
        floor(abs(col("v") - col("dv")) * lit(1e9) + lit(0.5)).cast("long"))
    coded.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("code")).as("code_sum"),
        min(col("code")).as("code_min"),
        max(col("code")).as("code_max"),
        sum(col("err_fx")).as("err_fx"))
      .withColumn("recon_err", Det.r4(col("err_fx").cast("double") / lit(1e9)))
  }

  // ---------------------------------------------------------------
  // Product quantization (PQ) + asymmetric-distance (ADC) search —
  // the third compression leg (after int8 SQ and IVF): Jégou et al.,
  // "Product Quantization for Nearest Neighbor Search", TPAMI 2011.
  // The 64-dim vector is split into 4 contiguous 16-dim subvectors;
  // each subspace gets its own 8-centroid codebook (deterministic
  // fixed-point L2 k-means), so a vector stores as 4 small codes —
  // 3 bits each here, 8 bits (256 centroids) in production — instead
  // of 256 bytes of floats. Query time never reconstructs: the query
  // precomputes a (subspace × centroid) distance table and scores a
  // candidate as the SUM of 4 table lookups (asymmetric distance).
  // ---------------------------------------------------------------

  /** PQ geometry for the scored query: 4 × 16-dim subspaces, 8 codes
    * per subspace, 1 training round. Pinned constants (not corpus-
    * sized) because the oracle is a static CTE chain; production uses
    * 8-bit codebooks (256 centroids) and ~10 rounds. */
  val PqSubspaces = 4
  val PqSubDim = 16
  val PqCodes = 8
  val PqIters = 1

  /** Long-form subvector view: (vec_id, sub, j, v) with `sub` the
    * subspace index and `j` the dimension within it. */
  private def subExpl(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        posexplode(transform(col("embedding"), _.cast("double")))
          .as(Seq("pos", "v")))
      .select(col("vec_id"),
        expr(s"pos div $PqSubDim").cast("int").as("sub"),
        expr(s"pos % $PqSubDim").cast("int").as("j"),
        col("v"))

  /** Per-subspace squared L2 distance to each codebook centroid, in
    * exact 1e-12 fixed-point units (BIGINT): every (v−cv)² term is
    * snapped to an integer before the sum, so the distance is
    * order-independent and needs NO double rounding anywhere —
    * distances stay integers end-to-end through argmin and ADC.
    * `cent` is the (sub, cell_id, j, cv) codebook — broadcast: it has
    * subspaces×codes×subdim rows (512 here) at ANY corpus size. */
  private def subDistances(vecs: DataFrame, cent: DataFrame): DataFrame =
    vecs.join(broadcast(cent), Seq("sub", "j"))
      .groupBy(col("vec_id"), col("sub"), col("cell_id"))
      .agg(sum(floor((col("v") - col("cv")) * (col("v") - col("cv"))
        * lit(1e12) + lit(0.5)).cast("long")).as("d2"))

  /** Argmin over [[subDistances]]: (vec_id, sub, cell_id) — min_by
    * over the total-order key (d2, cell_id), so ties are impossible
    * by construction. */
  private def subAssign(d2: DataFrame): DataFrame =
    d2.groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cell_id"), struct(col("d2"), col("cell_id")))
        .as("cell_id"))

  /** Train the per-subspace codebooks: seeds are the [[PqCodes]]
    * lowest-id vectors' subvectors (cell_id = seed vec_id, the
    * [[kmeansCells]] convention), then [[PqIters]] rounds of
    * assignment (exact integer L2 argmin) + fixed-point 1e-9 means.
    * Returns the long-form codebook (sub, cell_id, j, cv).
    *
    * Scale: each round is one broadcast join over the corpus's
    * long form plus one per-(sub, cell, j) mean — the corpus is
    * never shuffled by vector, and the codebook stays O(M·k·dsub)
    * rows regardless of N. */
  def pqTrain(emb: DataFrame): DataFrame = {
    val vecs = subExpl(emb)
    var cent = subExpl(emb.orderBy(col("vec_id")).limit(PqCodes))
      .select(col("sub"), col("vec_id").as("cell_id"), col("j"),
        col("v").as("cv"))
    for (_ <- 0 until PqIters) {
      val assign = subAssign(subDistances(vecs, cent))
      cent = assign.join(vecs, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("cell_id"), col("j"))
        .agg((((sum(floor(col("v") * lit(1e9) + lit(0.5)).cast("long")))
          .cast("double") / count(lit(1))) / lit(1e9)).as("cv"))
        .localCheckpoint(true)
    }
    cent
  }

  /** Encode the corpus against a trained codebook: (vec_id, sub,
    * code). N×M rows of small integers — the compressed index a
    * 100 TB deployment keeps hot (here 4 codes ≈ 2 B vs 256 B of
    * floats). */
  def pqEncode(emb: DataFrame, cent: DataFrame): DataFrame =
    subAssign(subDistances(subExpl(emb), cent))
      .withColumnRenamed("cell_id", "code")

  /** ADC top-k: each query builds its (sub, centroid) distance table
    * (nq×M×k rows — broadcast), then every corpus vector scores as
    * the sum of M integer table lookups against its codes; top-k by
    * (adist ASC, vec_id). Full-scan ADC here (N-linear, never
    * quadratic); production composes the same table with an IVF
    * shortlist exactly like [[sqRerank]] does for SQ codes. */
  def pqAdcTopK(queries: DataFrame, cent: DataFrame, codes: DataFrame,
                k: Int): DataFrame = {
    val dtable = queryDistTable(queries, cent)
    adcRankTail(
      codes.join(broadcast(dtable),
          codes("sub") === dtable("sub") && codes("code") === dtable("cell_id"))
        .withColumnRenamed("tqid", "qid")
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("d2")).as("adist")),
      "qid", k)
  }

  /** Per-query (sub, centroid) distance tables — nq×M×ksub integer
    * rows, the broadcast side of every ADC consumer. */
  private def queryDistTable(queries: DataFrame, cent: DataFrame): DataFrame =
    subDistances(subExpl(queries), cent)
      .select(col("vec_id").as("tqid"), col("sub"),
        col("cell_id"), col("d2"))

  /** Shared ADC ranking tail: top-k per query by (adist ASC, vec_id)
    * — ONE implementation of the tie-break both serving paths (and
    * their oracle CTEs) must match. */
  private def adcRankTail(scored: DataFrame, keyCol: String,
                          k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("adist"), col("vec_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(keyCol), col("vec_id"), col("adist"), col("rn"))
  }

  /** ADC re-rank of an ANN candidate shortlist — the full production
    * serving composition: IVF prunes the corpus to a per-query
    * shortlist, then the PQ codes (M small ints per vector) score it
    * by asymmetric distance without ever touching the full-precision
    * corpus vectors. 100 TB shape: the shortlist (nq×shortlistK rows)
    * broadcasts against the codes table, so the compressed index —
    * the only corpus-sized input — is scanned in place, never
    * shuffled; the per-query distance tables are nq×M×ksub integers,
    * broadcast like [[pqAdcTopK]]'s. Distances stay exact 1e-12-unit
    * BIGINTs, same as the full-scan path. */
  def pqAdcRerank(cand: DataFrame, queries: DataFrame, cent: DataFrame,
                  codes: DataFrame, queryKey: String, k: Int): DataFrame = {
    val dtable = queryDistTable(queries, cent)
    adcRankTail(
      codes.join(broadcast(cand), Seq("vec_id"))
        .join(broadcast(dtable),
          col(queryKey) === col("tqid") && codes("sub") === dtable("sub") &&
            codes("code") === dtable("cell_id"))
        .groupBy(col(queryKey), col("vec_id"))
        .agg(sum(col("d2")).as("adist")),
      queryKey, k)
  }
}
