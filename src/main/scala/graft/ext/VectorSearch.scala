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
    // build: nearest cell per vector (rn=1 over cosine desc)
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy(col("cell_cos").desc, col("cell_id"))
    val assigned = emb
      .withColumn("enrm", fixedNormSq(col("embedding")))
      .crossJoin(cellsB)
      .withColumn("cell_cos", Det.r4(cosineCol(
        fixedDot(col("embedding"), col("centroid")),
        col("enrm"), col("cnrm"))))
      .withColumn("arn", row_number().over(aw))
      .where(col("arn") === 1)
      .select(col("cell_id"), col("vec_id"), col("embedding"), col("enrm"))
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

  /** Sign-LSH bucket id from the first `bits` dimensions. */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(emb, i + 1) > lit(0.0f), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  def signBucketSql(expr: String, bits: Int): String =
    (0 until bits)
      .map(i => s"CASE WHEN $expr[${i + 1}] > 0.0 THEN ${1L << i} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** All intra-bucket pairs with their cosine — the LSH-bucketed
    * near-duplicate path (compare ~N·bucketSize pairs, not N²). */
  def bucketedPairCosine(emb: DataFrame, bits: Int): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(emb.sparkSession)
    // norms once per vector (N rows), not once per pair side (~N·B
    // rows) — the dot product is the only per-pair array work left.
    val withB = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"),
      fixedNormSq(col("embedding")).as("nrm"))
    val a = withB.select(col("bucket"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = withB.select(col("bucket"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, Seq("bucket")).where(col("v1") < col("v2"))
      .select(col("bucket"), col("v1"), col("v2"),
        Det.r4(cosineCol(
          fixedDot(col("e1"), col("e2")),
          col("n1"), col("n2"))).as("cos_sim"))
  }
}
