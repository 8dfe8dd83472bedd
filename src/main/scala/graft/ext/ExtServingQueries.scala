package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, PortableHash}
import graft.io.Sources
import graft.rel.Oracle
import graft.rel.Oracle.r4
import graft.core.Cache
import graft.streaming.StreamOps
import ExtQueries._
import ExtOracles._

/** Serving / acceptance slice of the extension inventory — split
  * from ExtQueries along its family seam (VERDICT r11 #6): the
  * curation funnel, ANN persisted serves, the recall-twin panel
  * family, retrieval evals and the MV/maintenance read-outs. Same
  * registration-only discipline as [[ExtCurationQueries]].
  */
object ExtServingQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The curation funnel: quality-score filter → exact-dup drop →
    // weighted source mix — the end-to-end shape of a training-data
    // preparation job, composed from the scored primitives above so
    // the whole funnel is one oracle-checked plan.
    "q_curation_mix" -> ((s, d) => {
      val dcs = docs(s, d)
      val q = TextAnalysis.qualityColumns(dcs)
        .select(col("doc_id"), col("quality"))
      val drops = Dedup.dropDuplicatesKeepFirst(dcs,
        Dedup.normPrefix(col("text"), 5)).select(col("doc_id"))
      val curated = dcs.select(col("doc_id"), col("source"))
        .join(q, Seq("doc_id"))
        .where(col("quality") >= 0.5)
        .join(drops, Seq("doc_id"), "left_anti")
      Sampling.weightedMix(curated, col("source"),
          col("doc_id").cast("string"), MixRates, defaultRate = 1.0)
        .select(col("doc_id"), col("source"), col("quality"), col("copy_id"))
        .orderBy(col("doc_id"), col("copy_id"))
    }),

    // Embedding-table QA — the health check an index build runs
    // BEFORE spending cluster-days on IVF/PQ training: per-dimension
    // mean/min/max and exact-zero counts expose collapsed dimensions
    // (mean pinned, zero spread), dead dimensions (all zero), and
    // truncated uploads. One explode + one partial/final agg over
    // |dims| groups — linear, no joins; values snap to 1e-9 units
    // before summing so the means are addition-order-proof.
    "q_embed_stats" -> ((s, d) =>
      emb(s, d).select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .withColumn("vfx",
          floor(col("v").cast("double") * lit(1e9) + lit(0.5)).cast("long"))
        .groupBy(col("i"))
        .agg(count(lit(1)).as("n"),
          sum(col("vfx")).as("sum_fx"),
          min(col("vfx")).as("min_fx"),
          max(col("vfx")).as("max_fx"),
          sum(when(col("vfx") === 0, lit(1L)).otherwise(lit(0L)))
            .as("n_zero"))
        .select((col("i") + 1).cast("long").as("dim"), col("n"),
          Det.r4(col("sum_fx").cast("double") / col("n") / lit(1e9))
            .as("mean"),
          Det.r4(col("min_fx").cast("double") / lit(1e9)).as("min_v"),
          Det.r4(col("max_fx").cast("double") / lit(1e9)).as("max_v"),
          col("n_zero"))
        .orderBy(col("dim"))),

    // Top principal direction by deterministic power iteration on the
    // centered embeddings (2 fixed rounds from the uniform 1/√d seed
    // — an axis seed zeroes out on a constant dimension) — the
    // collapse/whitening QA read-out; see VectorSearch.topDirection
    // for the fixed-point round discipline that makes the full
    // iterate-normalize loop oracle-replayable.
    "q_embed_pca_power" -> ((s, d) =>
      // result memoized per session: the power loop persists its
      // centered long form internally, so rebuild-per-action would
      // stack persisted copies
      Cache.getOrPersist(s, "pca_power_2", d)(
        VectorSearch.topDirection(
          emb(s, d).select(col("vec_id"), col("embedding")), iters = 2))
        .orderBy(col("dim"))),

    // SemDeDup (Abbas et al. 2023): semantic near-dup pruning by
    // within-k-means-cluster pairwise cosine — the embedding-space
    // dedup that catches paraphrases exact/minhash dedup misses. The
    // trained quantizer is the SAME session artifact q_ann_kmeans
    // serves from ("kmeans_cells_8_2"), so dedup and retrieval agree
    // on the partition of the space. τ here sits below the synthetic
    // corpus's natural cosine ceiling (~0.45 max pair) so real dup
    // populations exist; a production run sets τ≈0.95 on the
    // identical plan. See VectorSearch.semDedup for the k ≈ N/m and
    // over-cap scale contract.
    "q_semdedup" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cells = Cache.getOrPersist(s, "kmeans_cells_8_2", d)(
        VectorSearch.kmeansCells(e, k = 8, iters = 2))
      // the assignment is referenced four times by the dedup plan —
      // materialize it per session or the N×k argmax runs four times
      val assigned = Cache.getOrPersist(s, "semdedup_assign_8_2", d)(
        VectorSearch.assignCells(e, broadcast(cells.select(col("cell_id"),
          col("centroid"),
          VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))))
      // over-cap cells get the sub-split rescue (one deterministic
      // k-means split within the cell, dedup in sub-cells that fit
      // the cap) — the minhash-rescue discipline applied to the
      // semantic family; `rescued` marks verdicts from the split.
      // cell-cap saturation read-out on every row (r14 verdict #6):
      // the per-row over_cap/rescued flags show WHICH rows sit in hot
      // cells; the crossJoined one-row stats show the AGGREGATE pair
      // mass the cap is dropping — the serve-time signal for sizing
      // ksub / recursing. Memoized per (session, dir) like the other
      // one-row read-outs.
      val cellStats = Cache.getOrSnapshot(s, "semdedup_cellstats", d)(
        VectorSearch.cellCapStats(assigned, SemCellCap))
      VectorSearch.semDedupWithRescue(assigned, SemTau, SemCellCap,
          ksub = SemSubK)
        .crossJoin(broadcast(cellStats))
        .orderBy(col("vec_id"))
    }),

    // IVF over a REAL coarse quantizer: 2 rounds of deterministic
    // fixed-point k-means (8 cells seeded from the lowest vec_ids)
    // instead of the label centroids q_ann_ivf uses — the production
    // cell builder, fully replayed by the oracle's generated
    // round-by-round CTE chain.
    "q_ann_kmeans" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      // the trained quantizer is a session-shared artifact like the
      // moment/LSH tables: train once per (session, dir), reuse across
      // calls (a production deploy persists the codebook, not retrains)
      val cells = Cache.getOrPersist(s, "kmeans_cells_8_2", d)(
        VectorSearch.kmeansCells(e, k = 8, iters = 2))
      val queries = emb(s, d).where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      VectorSearch.ivfTopK(e, cells, queries, "qid", "qvec", 3, 2)
        .orderBy(col("qid"), col("rn"))
    }),

    // INCREMENTAL index upkeep — the operational property every
    // production ANN deployment needs: new vectors (the 10% delta
    // slice) join the index by ASSIGNMENT against the frozen
    // base-trained quantizer, never by rebuild. Because assignment is
    // per-row deterministic, union(assign(base), assign(delta)) is
    // cell-identical to one-shot assignment of the full corpus under
    // the same centroids — which is exactly what the oracle replays
    // (cent over the base slice, serving over everything). Corpus
    // codes are append-only; at 100 TB the delta pass touches only
    // arriving rows + the broadcast codebook. (Quantizer staleness is
    // the accepted cost — the acceptance pair for that is the recall
    // family.)
    "q_ann_incremental" -> ((s, d) => {
      graft.expr.GraftFunctions.ensureRegistered(s)
      val e = emb(s, d)
      val base = e.where(col("vec_id") % 10 =!= 9)
      val delta = e.where(col("vec_id") % 10 === 9)
      // r17: the FROZEN base-trained quantizer is the point of this
      // query (assignment against it, never a retrain) — snapshot it
      // per session like the other trained artifacts; the centroid
      // aggregation (a posexplode over the whole base slice) was
      // re-run per action, twice (both assignCells sides broadcast
      // it).
      val cells = Cache.getOrSnapshot(s, "ann_inc_cells", d)(
        VectorSearch.labelCentroids(base)
          .select(col("label").cast("long").as("cell_id"), col("centroid")))
      val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
        VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))
      val assigned = VectorSearch.assignCells(
          base.select(col("vec_id"), col("embedding")), cellsB)
        .unionByName(VectorSearch.assignCells(
          delta.select(col("vec_id"), col("embedding")), cellsB))
      val queries = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      VectorSearch.ivfTopKFromAssigned(assigned, cellsB, queries,
          "qid", "qvec", k = 3, nProbe = 2)
        .orderBy(col("qid"), col("rn"))
    }),

    // FILTERED vector search — ANN with a metadata predicate (each
    // query retrieves only corpus vectors sharing ITS OWN label): the
    // index (cells + assignment) is built once, unfiltered — the
    // session artifacts q_ann_kmeans/q_semdedup already share — and
    // the predicate prunes the candidate rows at scan time, exactly
    // where an inverted-list serving tier applies its filter. The
    // second feature every real vector deployment needs after top-k.
    "q_ann_filtered" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cells = Cache.getOrPersist(s, "kmeans_cells_8_2", d)(
        VectorSearch.kmeansCells(e, k = 8, iters = 2))
      val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
        VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))
      val assigned = Cache.getOrPersist(s, "semdedup_assign_8_2", d)(
          VectorSearch.assignCells(e, cellsB))
        .join(emb(s, d).select(col("vec_id"), col("label")), Seq("vec_id"))
      val queries = emb(s, d).where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("q_label"))
      VectorSearch.ivfTopKFromAssigned(assigned, cellsB, queries,
          "qid", "qvec", k = 3, nProbe = 2,
          scanFilter = col("label") === col("q_label"))
        .orderBy(col("qid"), col("rn"))
    }),

    // Recall@3 of the filtered serve vs the filtered exact truth —
    // the acceptance number for q_ann_filtered, same discipline as
    // the IVF/IVF-PQ/SQ recall triptych.
    "q_ann_filtered_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.expr.GraftFunctions.ensureRegistered(s)
      lazy val e = emb(s, d).select(col("vec_id"), col("embedding"),
        col("label"))
      lazy val cells = Cache.getOrPersist(s, "kmeans_cells_8_2", d)(
        VectorSearch.kmeansCells(
          e.select(col("vec_id"), col("embedding")), k = 8, iters = 2))
      lazy val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
        VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))
      lazy val assigned = Cache.getOrPersist(s, "semdedup_assign_8_2", d)(
          VectorSearch.assignCells(
            e.select(col("vec_id"), col("embedding")), cellsB))
        .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      lazy val queries = annPanelC(s, d).select(col("qid"), col("qvec"),
        col("label").as("q_label"))
      lazy val served = VectorSearch.ivfTopKFromAssigned(assigned, cellsB,
          queries, "qid", "qvec", k = 3, nProbe = 2,
          scanFilter = col("label") === col("q_label"))
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      lazy val eN = e.withColumn("enrm",
        VectorSearch.fixedNormSq(col("embedding")))
      lazy val qN = queries.withColumn("qnrm",
        VectorSearch.fixedNormSq(col("qvec")))
      lazy val scoredEx = eN.crossJoin(broadcast(qN))
        .where(col("label") === col("q_label"))
        .select(col("qid"), col("vec_id"),
          Det.r4(VectorSearch.cosineCol(
            VectorSearch.fixedDot(col("qvec"), col("embedding")),
            col("qnrm"), col("enrm"))).as("cos_sim"))
      lazy val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      lazy val exact = scoredEx.withColumn("ern", row_number().over(w))
        .where(col("ern") <= 3).select(col("qid"), col("vec_id"))
      recallTable(s, d, "filtered", exact, served)
    }),

    // PQ-ADC ANN: per-subspace codebooks (deterministic fixed-point
    // L2 k-means over 4×16-dim subvectors), corpus encoded to 4 small
    // codes per vector, queries scored by asymmetric distance — the
    // sum of 4 integer table lookups. Distances stay exact 1e-12
    // fixed-point BIGINTs end-to-end (argmin, ADC, ranking): no
    // double rounding exists anywhere in this query.
    "q_ann_pq" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val queries = e.where(col("vec_id") % 50 === 0)
      VectorSearch.pqAdcTopK(queries, pqCentC(s, d), pqCodesC(s, d), 3)
        .orderBy(col("qid"), col("rn"))
    }),

    // The COMPOSED production ANN serving stack (IVF-PQ, the FAISS
    // IndexIVFPQ shape): IVF prunes the corpus to a 10-candidate
    // shortlist per query by exact cosine over the probed cells, then
    // PQ codes re-rank the shortlist by asymmetric distance — exactly
    // how a billion-vector index serves (coarse quantizer for
    // pruning, compressed codes for scoring, full vectors never
    // touched at query time). Shortlist and distance tables
    // broadcast; the corpus-sized codes table is scanned, not
    // shuffled.
    "q_ann_ivf_pq" -> ((s, d) =>
      VectorSearch.pqAdcRerank(ivfPqShortlistC(s, d),
          emb(s, d).select(col("vec_id"), col("embedding"))
            .where(col("vec_id") % 50 === 0),
          pqCentC(s, d), pqCodesC(s, d), "qid", 3)
        .orderBy(col("qid"), col("rn"))),

    // PERSISTED-index serving — the deploy story q_ann_incremental's
    // append-without-rebuild was missing its other half of: write the
    // whole index (IVF cells + partitioned inverted lists + PQ
    // codebook/codes + SQ params + meta) to parquet, RELOAD it from
    // disk, and serve the composed IVF→PQ stack from the loaded
    // tables (graft.ext.AnnIndex; FAISS write_index is the public
    // shape). Because load-and-serve runs the same plan shapes over
    // the same frozen artifacts, the answers are bit-identical to the
    // in-session stack — proven by sharing q_ann_ivf_pq's value
    // oracle verbatim. Save+load happen once per (session, dir) (the
    // snapshot memo); at 100 TB the index persists for weeks and only
    // this query's serve tail runs per request.
    "q_ann_persist" -> ((s, d) => {
      Cache.getOrSnapshot(s, "ann_persist_serve", d) {
        val ix = AnnIndex.load(s, annIndexPath(s, d))
        val queries = emb(s, d).where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        AnnIndex.ivfPqTopK(ix, queries, "qid", "qvec",
          k = 3, nProbe = 2, shortlistK = 10)
      }.orderBy(col("qid"), col("rn"))
    }),

    // GRAPH serve from the RELOADED on-disk index — q_ann_persist's
    // traversal-family twin (VERDICT r10 #4): the beam rounds run
    // over `knn_graph` read back from parquet and score against the
    // inverted-list vectors, never the session-built graph. Shares
    // q_ann_graph's oracle verbatim: a disk roundtrip of the graph
    // and the vectors may not move a single served cell.
    "q_ann_graph_persist" -> ((s, d) => {
      Cache.getOrSnapshot(s, "ann_graph_persist_serve", d) {
        val ix = AnnIndex.load(s, annIndexPath(s, d))
        val queries = emb(s, d).where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        AnnIndex.graphTopK(ix, queries, "qid", "qvec", k = 3)
      }.orderBy(col("qid"), col("rn"))
    }),

    // Two-layer HNSW descent from the RELOADED index — both graph
    // layers come off disk (AnnIndex v2 persists knn_graph_l1 too).
    // Shares q_ann_hnsw's oracle verbatim, same discipline.
    "q_ann_hnsw_persist" -> ((s, d) => {
      Cache.getOrSnapshot(s, "ann_hnsw_persist_serve", d) {
        val ix = AnnIndex.load(s, annIndexPath(s, d))
        val queries = emb(s, d).where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        AnnIndex.hnswTopK(ix, queries, "qid", "qvec", k = 3)
      }.orderBy(col("qid"), col("rn"))
    }),

    // Cluster topic keywords (BERTopic's class-based TF-IDF,
    // Grootendorst 2022): k-means cells over the embeddings (the
    // session-shared quantizer q_ann_kmeans/q_semdedup already
    // train), each cell described by its top-5 terms under
    // c-TF-IDF = tf_{t,c} · log2(1 + A/f_t), where f_t is the term's
    // corpus frequency and A the average tokens per cell. The log
    // rides the exact integer-log2 pipeline as log2Fx(f_t + A) −
    // log2Fx(f_t) — pure BIGINT ops, so the scores cross the oracle
    // boundary bit-exact. The curation read-out that tells you WHAT
    // each embedding cluster is before you up/down-sample it. Plan:
    // one tf aggregate (shared with BM25), one cell join, two
    // aggregates, a ranking window over O(cells·terms) rows.
    "q_cluster_topics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cells = Cache.getOrPersist(s, "kmeans_cells_8_2", d)(
        VectorSearch.kmeansCells(e, k = 8, iters = 2))
      val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
        VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))
      val assigned = Cache.getOrPersist(s, "semdedup_assign_8_2", d)(
          VectorSearch.assignCells(e, cellsB))
        .select(col("vec_id").as("doc_id"), col("cell_id"))
      val tf = bm25TfC(s, d)
      val ctf = tf.join(assigned, Seq("doc_id"))
        .groupBy(col("cell_id"), col("w")).agg(sum(col("tf")).as("ctf"))
      val ft = ctf.groupBy(col("w")).agg(sum(col("ctf")).as("ft"))
      val tot = tf.agg(sum(col("tf")).as("ttok"))
      val scored = ctf.join(ft, Seq("w")).crossJoin(broadcast(tot))
        .withColumn("a_tok", expr("ttok div 8"))
        .withColumn("score_fx", col("ctf") *
          (LmScore.log2FxCol(col("ft") + col("a_tok")) -
            LmScore.log2FxCol(col("ft"))))
      val w = Window.partitionBy(col("cell_id"))
        .orderBy(col("score_fx").desc, col("w"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .select(col("cell_id"), col("w").as("term"), col("ctf"),
          col("ft"), col("score_fx"), col("rn"))
        .orderBy(col("cell_id"), col("rn"))
    }),

    // GRAPH ANN (NSW family — Malkov & Yashunin's HNSW re-expressed
    // distributed): k-NN graph from the CAPPED banded-LSH candidate
    // pairs (the bounded build — never all pairs), then 4 rounds of
    // beam-32 expansion from the 4 lowest-id entry points, scoring
    // ONLY the expanded candidates. The third serving family beside
    // quantization (IVF/PQ/SQ) and hashing (LSH); the oracle replays
    // graph build + every beam round as CTEs, so the traversal is
    // cell-exact, not just rows-plausible.
    "q_ann_graph" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      // the graph IS the index — session-materialized like the IVF
      // assignment and PQ codes (snapshot: the banded-LSH chain under
      // its plan would otherwise replay per action)
      val graph = knnGraphC(s, d)
      val queries = emb(s, d).where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      VectorSearch.graphTopK(graph, e, queries, "qid", "qvec", k = 3,
          corpusAdj = Some(knnCorpusC(s, d)))
        .orderBy(col("qid"), col("rn"))
    }),

    // Recall@3 of the graph serve vs exact ground truth — the
    // acceptance number for the traversal family, same discipline as
    // the IVF/IVF-PQ/SQ/filtered recall read-outs (and the honest
    // price of entry-point reachability: vectors the LSH caps leave
    // isolated are simply unreachable, and this query says what that
    // costs on this corpus).
    "q_ann_graph_recall" -> ((s, d) => {
      lazy val e = emb(s, d).select(col("vec_id"), col("embedding"))
      lazy val graph = knnGraphC(s, d)
      lazy val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      lazy val served = VectorSearch
        .graphTopK(graph, e, queries, "qid", "qvec", k = 3,
          corpusAdj = Some(knnCorpusC(s, d)))
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      lazy val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      recallTable(s, d, "graph", exact, served)
    }),

    // Two-layer HNSW serve (the hierarchy over q_ann_graph's flat
    // NSW): layer 1 = k-NN graph over the deterministic vec_id%8
    // sample, searched with a narrow beam (HnswL1Rounds=2) for
    // per-query entry points; layer 0 then runs FEWER wide rounds
    // (HnswL0Rounds=3 vs the flat serve's GraphRounds=4) because it
    // starts near the target — the round budget the hierarchy exists
    // to buy. Oracle replays both layers' graph builds and every
    // beam round.
    "q_ann_hnsw" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val g0 = knnGraphC(s, d)
      val g1 = knnGraphL1C(s, d)
      val queries = emb(s, d).where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      VectorSearch.hnswTopK(g0, g1, e, queries, "qid", "qvec", k = 3,
          corpusAdj0 = Some(knnCorpusC(s, d)),
          corpusAdj1 = Some(knnCorpusL1C(s, d)))
        .orderBy(col("qid"), col("rn"))
    }),

    // Recall@3 of the hierarchical serve vs the same exact ground
    // truth as the flat graph serve — the pair of numbers that
    // prices the hierarchy: ~25% less wide-round scoring (2 narrow
    // subset rounds + 3 wide vs the flat serve's 4 wide) for
    // recall@3 0.667 vs 0.733 at sf0.01 — a trade that widens in
    // the hierarchy's favor as N grows and entry distance starts to
    // dominate round count.
    "q_ann_hnsw_recall" -> ((s, d) => {
      lazy val e = emb(s, d).select(col("vec_id"), col("embedding"))
      lazy val g0 = knnGraphC(s, d)
      lazy val g1 = knnGraphL1C(s, d)
      lazy val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      lazy val served = VectorSearch
        .hnswTopK(g0, g1, e, queries, "qid", "qvec", k = 3,
          corpusAdj0 = Some(knnCorpusC(s, d)),
          corpusAdj1 = Some(knnCorpusL1C(s, d)))
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      lazy val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      recallTable(s, d, "hnsw", exact, served)
    }),

    // Recall@3 of the composed IVF-PQ stack vs exact ground truth —
    // the acceptance measurement for the COMPRESSED serving path
    // (q_ann_recall measures the uncompressed IVF; this measures what
    // the PQ codes additionally cost on this corpus). Deterministic
    // on both sides, so per-query n_hits/recall is a cell-exact value
    // oracle.
    "q_ann_ivf_pq_recall" -> ((s, d) => {
      lazy val e = emb(s, d).select(col("vec_id"), col("embedding"))
      lazy val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      // the SAME session-shared shortlist + rerank the serving query
      // runs — the recall twin measures the served stack, not a copy
      // (shortlist semi-joined to the panel: per-qid rows identical)
      lazy val served = VectorSearch.pqAdcRerank(
          ivfPqShortlistC(s, d)
            .join(broadcast(queries.select(col("qid"))), Seq("qid"),
              "left_semi"),
          annPanelC(s, d).select(col("qid").as("vec_id"),
            col("qvec").as("embedding")),
          pqCentC(s, d), pqCodesC(s, d), "qid", 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      lazy val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      recallTable(s, d, "ivf_pq", exact, served)
    }),

    // ANN recall@k measured against ground truth: the exact
    // brute-force top-3 per query (topKByCosine over the SAME query
    // sample) scored against what the 2-probe IVF actually returned.
    // This is the measurement a production ANN deploy runs — sample
    // queries, compute exact neighbors for the sample, count
    // overlap — and it upgrades the ANN family's correctness story
    // from "matches its own definition" to "finds true neighbors".
    // Fully deterministic (both sides are oracle-replayed CTE chains),
    // so per-query n_hits/recall is a cell-exact value oracle, not
    // just a bound; PropertySpec asserts the aggregate recall floor.
    "q_ann_recall" -> ((s, d) => {
      lazy val e = emb(s, d).select(col("vec_id"), col("embedding"))
      lazy val cells = labelCellsC(s, d)
        .select(col("label").cast("long").as("cell_id"), col("centroid"))
      lazy val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      lazy val ivf = VectorSearch.ivfTopK(e, cells, queries, "qid", "qvec", 3, 2)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      lazy val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      recallTable(s, d, "ivf", exact, ivf)
    }),

    // Matryoshka-style dimension truncation: recall@3 of brute-force
    // cosine over the FIRST 16 of 64 dims vs full-dim exact truth —
    // the read-out that prices a 4× index-size cut (truncated
    // embeddings are the cheapest compression there is: no codebooks,
    // no re-encode, just a shorter scan). Same fixed-point dot/norm
    // chain and recall tail as the IVF/PQ/SQ acceptance family, so
    // the four compression options (cells, product codes, int8,
    // truncation) are priced on one comparable scale. slice() keeps
    // the truncation inside the scan projection — at 100 TB the
    // truncated side reads 1/4 the vector bytes and nothing else
    // changes.
    "q_ann_truncated_recall" -> ((s, d) => {
      lazy val full = emb(s, d).select(col("vec_id"), col("embedding"))
      lazy val tcorpus = emb(s, d).select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      lazy val fullQ = annPanelC(s, d).select(col("qid"), col("qvec"))
      lazy val tQ = annPanelC(s, d).select(col("qid"),
        slice(col("qvec"), 1, 16).as("qvec"))
      lazy val served = VectorSearch.topKByCosine(tcorpus, tQ, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      lazy val exact = VectorSearch.topKByCosine(full, fullQ, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      recallTable(s, d, "truncated", exact, served)
    }),

    // The recall frontier in ONE table (VERDICT r10 #5): every ANN
    // serving variant priced on the same scale — corpus-level
    // recall@3 re-aggregated from each variant's recall twin, so the
    // frontier can never drift from the per-query acceptance numbers
    // (same lambdas, same session snapshots, same constants). The
    // cost half of the frontier (warm serve time + scoring-work
    // shape) lives in PLANS.md's frontier table — time is host
    // fact, not oracle-checkable. A user choosing a variant reads
    // this row set top-down: recall falls as scoring work falls.
    "q_ann_frontier" -> ((s, d) =>
      FrontierVariants.map { case (v, q) =>
        ExtQueries.queries(q)(s, d)
          .agg(count(lit(1)).as("n_queries"),
            sum(col("n_hits")).as("n_hits"))
          .select(lit(v).as("variant"),
            col("n_queries"), col("n_hits"),
            Det.r4(col("n_hits").cast("double") /
              (col("n_queries") * 3).cast("double")).as("recall_at_3"))
      }.reduce(_ unionByName _).orderBy(col("variant"))),

    // Token-budget context-window chunking: like q_chunk_docs but cut
    // on whitespace-token counts (the tokenization q_token_count and
    // q_pack_sequences already score) — a model's window is a token
    // budget, and char windows split tokens at the boundary. Same
    // zero-shuffle explode fan-out; chunk bytes pinned by
    // (tok_len, chunk_len, portable hash).
    "q_chunk_tokens" -> ((s, d) =>
      Packing.chunkTokens(docs(s, d))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Corpus-trained subword (BPE) token counts — the real
    // token-denomination for training budgets (whitespace counts run
    // 2–3× off on code/CJK). The merge table is learned ONCE per
    // (session, dir) from the capped word-frequency table (driver
    // loop over ≤VocabCap rows — bounded by the cap, not the corpus)
    // and applied as a pure Column fold (chained codegen'd replaces)
    // — zero shuffle, scan-parallel at any size. The oracle REPLAYS
    // the whole learn loop as materialized CTEs and the application
    // as one replace CTE per merge (Bpe scaladoc), so the check is
    // cell-exact end-to-end, learned table included.
    "q_bpe_tokens" -> ((s, d) => {
      val m = Bpe.mergesMemo(docs(s, d), d)
      docs(s, d).select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= ""))
          .cast("long").as("n_ws"),
        Bpe.docBpeCol(col("text"), m).as("n_bpe"))
        .orderBy(col("doc_id"))
    }),

    // The PRODUCTION BPE application path, oracle-checked: the
    // rank-indexed mapPartitions kernel (BpeTokenizer — per-word cost
    // independent of merge-table size) scored against the SAME oracle
    // text as q_bpe_tokens' replace chain. Equality of the two scored
    // queries is the strongest form of the kernel==chain contract:
    // both are cell-exact against one DuckDB replay.
    "q_bpe_tokens_kernel" -> ((s, d) => {
      val m = Bpe.mergesMemo(docs(s, d), d)
      val counts = Bpe.docBpeCounts(docs(s, d), m)
      docs(s, d).select(col("doc_id"),
          size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long").as("n_ws"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_ws"),
          coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
        .orderBy(col("doc_id"))
    }),

    // BPE-budget context-window chunking: the token stream is cut at
    // multiples of BpeBudget SUBWORD tokens (concatenate-and-cut, the
    // pretraining shape — a word straddling a cut belongs to the
    // chunk where it starts), and each (doc, chunk) reports its word
    // and subword mass. The within-doc offset is a per-doc window —
    // partitioned by doc_id, so at 100 TB it shuffles by doc and
    // never funnels through one reducer (docs bound the partition,
    // not the corpus).
    "q_chunk_bpe" -> ((s, d) => {
      val m = Bpe.mergesMemo(docs(s, d), d)
      val words = docs(s, d).select(col("doc_id"),
          posexplode(filter(split(col("text"), " "), w => w =!= "")))
        .withColumnRenamed("col", "w")
        .withColumn("c", Bpe.wordBpeCol(col("w"), m))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Long.MinValue, -1)
      words
        .withColumn("off", coalesce(sum(col("c")).over(win), lit(0L)))
        .withColumn("chunk_id", expr(s"off div ${Bpe.BpeBudget}L"))
        .groupBy(col("doc_id"), col("chunk_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("c")).as("n_bpe"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Sequence packing denominated in BPE tokens — q_pack_sequences'
    // two-pass distributed prefix sum (never a global single-reducer
    // window), with the per-doc token mass swapped from whitespace
    // words to learned subwords. Memoized like q_pack_sequences
    // because the prefix sum pins its sorted RDD.
    "q_pack_bpe" -> ((s, d) => {
      val m = Bpe.mergesMemo(docs(s, d), d)
      Cache.getOrPersist(s, "pack_bpe", d)(
        Packing.packSequences(docs(s, d),
          Bpe.docBpeCol(col("text"), m), col("doc_id"))
          .withColumnRenamed("k", "doc_id"))
        .orderBy(col("doc_id"))
    }),

    // The learned BPE merge table itself, scored as a query — the
    // tokenizer artifact a corpus release SHIPS (the merges.txt file
    // of a Sennrich tokenizer). Every downstream token count is only
    // as reproducible as this table, so the table is value-checked
    // directly: rank order and both symbol columns, against the
    // oracle's replayed learn loop (each b{i} argmax CTE).
    "q_bpe_vocab" -> ((s, d) => {
      val m = Bpe.mergesMemo(docs(s, d), d)
      val rows = m.zipWithIndex.map { case ((a, b), i) =>
        (i + 1L, a, b)
      }
      import s.implicits._
      rows.toDF("rank", "a", "b").orderBy(col("rank"))
    }),

    // Tokenizer fertility (subword tokens per whitespace word) by
    // language — THE acceptance metric for a tokenizer on a
    // multilingual corpus: fertility far above ~1.3–2 on a language
    // means its text burns the training budget on fragment tokens
    // (the reason production tokenizers are re-trained when a corpus
    // adds CJK/code). Per-doc counts are exact longs; the ratio is
    // one double division per GROUP, so the r4 round is portable.
    // Same zero-shuffle scan shape as q_bpe_tokens + one partial/
    // final agg over |langs| groups.
    "q_bpe_fertility" -> ((s, d) => {
      val m = Bpe.mergesMemo(docs(s, d), d)
      docs(s, d).select(col("lang"),
          size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long").as("n_ws"),
          Bpe.docBpeCol(col("text"), m).as("n_bpe"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ws")).as("n_words"),
          sum(col("n_bpe")).as("n_bpe"),
          Det.r4(sum(col("n_bpe")).cast("double") /
            sum(col("n_ws")).cast("double")).as("fertility"))
        .orderBy(col("lang"))
    }),

    // BYTE-level BPE fertility (VERDICT r12 #8): the same Sennrich
    // loop over the GPT-style alphabet — each word seeds as its
    // UTF-8 bytes rendered as fixed-width hex symbols, so the
    // alphabet is 256 symbols + </w>, any byte string is in-domain
    // (no character-coverage escape hatch), and fertility numbers
    // are comparable to production byte-level tokenizers. Same
    // zero-shuffle scan + one |langs|-group agg as the char twin;
    // the hex rendering keeps the argmax tie-break portable on
    // NON-ASCII corpora too (hex is order-preserving per byte),
    // which the char path only guarantees on ASCII.
    "q_bpe_byte_fertility" -> ((s, d) => {
      val m = Bpe.mergesBytesMemo(docs(s, d), d)
      docs(s, d).select(col("lang"),
          size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long").as("n_ws"),
          Bpe.docBpeBytesCol(col("text"), m).as("n_bpe"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ws")).as("n_words"),
          sum(col("n_bpe")).as("n_bpe"),
          Det.r4(sum(col("n_bpe")).cast("double") /
            sum(col("n_ws")).cast("double")).as("fertility"))
        .orderBy(col("lang"))
    }),

    // Padding-waste accounting per source: what fraction of the
    // training budget pays for pad tokens if each doc is its own
    // padded sequence (naive) vs concatenate-and-cut packing
    // (q_pack_sequences' discipline) — the measurement that justifies
    // a packing pass before training (naive waste on short-doc web
    // corpora is routinely 30–60%). Pure integer arithmetic per row +
    // one partial/final agg over |sources| groups; the only doubles
    // are the two final per-group divisions (r4-portable).
    "q_pack_efficiency" -> ((s, d) => {
      val b = Packing.BinCapacity
      docs(s, d).select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("naive_padded",
          expr(s"(n_tok + ${b - 1}) DIV $b * $b"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("naive_padded")).as("naive_padded"))
        .withColumn("packed_padded",
          expr(s"(n_tokens + ${b - 1}) DIV $b * $b"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("naive_padded"), col("packed_padded"),
          Det.r4((col("naive_padded") - col("n_tokens")).cast("double") /
            col("naive_padded").cast("double")).as("naive_waste"),
          Det.r4((col("packed_padded") - col("n_tokens")).cast("double") /
            col("packed_padded").cast("double")).as("packed_waste"))
        .orderBy(col("source"))
    }),

    // The distributed dictionary-encoding pre-pass as a first-class
    // op: dense deterministic int ids for arbitrary keys (what ALS —
    // and any factor/embedding table — needs at 100 TB where raw ids
    // are strings or exceed int range). zipWithIndex keeps the
    // assignment distributed; oracle is a plain dense row_number.
    "q_id_dictionary" -> ((s, d) => {
      val r = Cache.getOrPersist(s, "ratings", d)(Sources.ratings(s, d))
      Recommender.dictionary(
          r.select(concat(lit("u"), col("user_id").cast("string")).as("key")),
          "key")
        .orderBy(col("key"))
    }),

    // Model-based CF (MLlib ALS) — the BASELINE.json north-star
    // approach. The iterative solver's scores are not replayable in
    // SQL, so the scored surface is DERIVED-PROPERTY checked instead
    // of value-checked: the query runs the full fit + recommendTopK
    // path on the real ratings, then reduces the recommendations to
    // per-user invariants an oracle CAN state exactly — 5 recs per
    // user, rn dense 1..5, scores non-increasing in rn (0
    // violations), every item from the ratings catalog (0 unknown).
    // Wrong join plumbing, dropped users, unsorted output, or factor
    // blowups all flip a column. NaN blowups need their OWN counter:
    // under Spark's ordering NaN > x and NaN > NaN are both false, so
    // a (NaN, NaN, 3.2, ...) score sequence would sail through the
    // monotonicity check — nan_scores catches exactly that.
    // The raw scored frame remains the library API
    // (Recommender.recommendTopK, goldens in ExtSpec).
    "q_als_recommend" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val r = Cache.getOrPersist(s, "ratings", d)(Sources.ratings(s, d))
      // The trained model's top-k frame is deterministic (seeded ALS)
      // per dir; without materialization every action re-runs the
      // MLlib training job (6.8 s warm at sf0.1). Snapshot = the
      // session-lifecycle "model artifact" a production pipeline
      // would persist after training.
      val recs = Cache.getOrSnapshot(s, "als_recs", d)(
        Recommender.recommendTopK(Recommender.fit(r), 5))
      // item catalog is O(distinct items) — gate the broadcast like
      // every other entity-scaled map join; the gate count is memoized
      // per (session, dir) so repeated executions of this query don't
      // re-pay a distinct-items count job (the catalog is a property
      // of the ratings dir, not of this call's frame instance)
      val items = graft.core.Broadcasts.gatedMemo(
        r.select(col("item_id")).distinct().withColumn("__known", lit(1)),
        "spark.graft.dict.broadcastMax", s"als_items:$d")
      val w = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      recs
        .join(items, Seq("item_id"), "left")
        .withColumn("prev_score", lag(col("score"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_recs"),
          min(col("rn")).as("rn_min"),
          max(col("rn")).as("rn_max"),
          sum(col("rn")).as("rn_sum"),
          sum(when(col("score") > col("prev_score"), 1L).otherwise(0L))
            .as("mono_violations"),
          sum(when(isnan(col("score")), 1L).otherwise(0L))
            .as("nan_scores"),
          sum(when(col("__known").isNull, 1L).otherwise(0L))
            .as("unknown_items"))
        .orderBy(col("user_id"))
    }),

    // kNN label classification over the embedding table — the model-
    // inference shape the ANN family serves: every 50th vector is a
    // held-out probe classified by the majority label of its 3 exact
    // nearest neighbors (leave-one-out: self excluded). Vote tie-break
    // is (count desc, nearest-neighbor rank asc, label asc) — total
    // order, so the prediction is replayable cell-exact. Same
    // broadcast-probes × corpus-scan plan as topKByCosine: the corpus
    // never shuffles, scoring is the codegen'd fixed-dot expression,
    // and per-probe ranking windows run on |corpus| rows per probe —
    // at 100 TB the probe batch stays the broadcast side and the scan
    // parallelizes over corpus splits.
    "q_knn_classify" -> ((s, d) =>
      knnPerProbe(s, d).orderBy(col("qid"))),

    // Label-noise screen: per-label share of probes whose 3-NN
    // majority vote disagrees with their own label — the mislabel
    // triage a curation pass runs before training (Northcutt et al.'s
    // confident-learning signal, here with the exact-kNN judge). The
    // per-probe chain IS q_knn_classify (one definition, two scored
    // surfaces); the probes×corpus exact side is measurement by
    // construction, like the recall family.
    "q_label_noise" -> ((s, d) =>
      knnPerProbe(s, d)
        .groupBy(col("true_label"))
        .agg(count(lit(1)).as("n_probes"),
          sum(lit(1L) - col("correct")).as("n_disagree"))
        .select(col("true_label"), col("n_probes"), col("n_disagree"),
          Det.r4(col("n_disagree").cast("double") /
            col("n_probes").cast("double")).as("noise_rate"))
        .orderBy(col("true_label"))),

    // Triplet mining for metric learning (Schroff et al. 2015's
    // batch-hard shape): per anchor probe, the HARDEST positive
    // (same-label member with lowest cosine) and HARDEST negative
    // (other-label member with highest cosine), plus the violation
    // margin a triplet-loss curriculum ranks by. Scoring reuses the
    // knn broadcast-probes × corpus-scan plan (corpus never
    // shuffles); the argmin/argmax are conditional struct min/max in
    // ONE partial/final aggregation — no per-probe ranking window,
    // no second pass — which is the shape that survives a corpus
    // 100× this size. Ties break on vec_id (negated inside the max
    // struct so both extremes prefer the smaller id).
    "q_triplet_mining" -> ((s, d) => {
      graft.expr.GraftFunctions.ensureRegistered(s)
      val e = emb(s, d).select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
      // probes ride the fixed acceptance panel — this probes×corpus
      // exact side is the same measurement shape as knnPerProbe's
      val probes = annPanelC(s, d)
        .select(col("qid"), col("qvec"),
          col("label").cast("long").as("qlabel"))
        .withColumn("nrm_q", VectorSearch.fixedNormSq(col("qvec")))
      val scored = e
        .withColumn("nrm_e", VectorSearch.fixedNormSq(col("embedding")))
        .crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
          Det.r4(VectorSearch.cosineCol(
            VectorSearch.fixedDot(col("qvec"), col("embedding")),
            col("nrm_q"), col("nrm_e"))).as("cos_sim"))
      scored.groupBy(col("qid"), col("qlabel"))
        .agg(
          min(when(col("label") === col("qlabel"),
            struct(col("cos_sim"), col("vec_id")))).as("hp"),
          max(when(col("label") =!= col("qlabel"),
            struct(col("cos_sim"), (-col("vec_id")).as("nid")))).as("hn"),
          sum((col("label") === col("qlabel")).cast("long")).as("n_pos"),
          sum((col("label") =!= col("qlabel")).cast("long")).as("n_neg"))
        .select(col("qid"), col("qlabel").as("label"),
          col("n_pos"), col("n_neg"),
          col("hp.vec_id").as("hard_pos_id"),
          col("hp.cos_sim").as("pos_cos"),
          (-col("hn.nid")).as("hard_neg_id"),
          col("hn.cos_sim").as("neg_cos"),
          Det.r4(col("hn.cos_sim") - col("hp.cos_sim"))
            .as("violation_margin"),
          (col("hn.cos_sim") > col("hp.cos_sim")).cast("long")
            .as("violated"))
        .orderBy(col("qid"))
    }),

    // Cross-source exact-duplicate matrix — the provenance audit a
    // multi-source corpus runs before mixing: for every normalized
    // signature, how many duplicate PAIRS live within each source and
    // across each source pair. Shape at 100 TB: one (sig, source)
    // partial/final count (map-side combined), then a self-join on
    // sig over only the counted rows — the corpus text never joins,
    // and within-group pair counts are arithmetic (n·(n−1)/2 via
    // shiftright), never enumerated.
    "q_cross_source_dups" -> ((s, d) => {
      val bySrc = docs(s, d)
        .select(col("source"),
          sha2(Dedup.normPrefix(col("text"), 5), 256).as("sig"))
        .groupBy(col("sig"), col("source"))
        .agg(count(lit(1)).as("n"))
      val a = bySrc.select(col("sig"), col("source").as("source_a"),
        col("n").as("n_a"))
      val b = bySrc.select(col("sig"), col("source").as("source_b"),
        col("n").as("n_b"))
      a.join(b, Seq("sig"))
        .where(col("source_a") <= col("source_b"))
        .withColumn("pairs",
          when(col("source_a") === col("source_b"),
            shiftright(col("n_a") * (col("n_a") - lit(1L)), 1))
            .otherwise(col("n_a") * col("n_b")))
        .where(col("pairs") > 0)
        .groupBy(col("source_a"), col("source_b"))
        .agg(sum(col("pairs")).as("dup_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Deterministic weighted sampling without replacement (the
    // exponential-clock / Efraimidis–Spirakis shape with the portable
    // spread hash as the uniform draw): key = ⌊u·2²⁰ / weight⌋, take
    // the 5 SMALLEST keys per language — longer documents draw
    // proportionally more often. Integer division end-to-end, so both
    // engines rank identical keys; per-row keys need no shuffle and
    // the per-stratum top-k is the same partial WindowGroupLimit
    // shape as q_topk_neighbors — no global sort at any scale.
    "q_weighted_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val keyed = docs(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("pr_num", PortableHash.spread(
          PortableHash.h(col("doc_id").cast("string"))) * lit(1048576L))
        .withColumn("priority", expr("pr_num div n_chars"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("priority"), col("doc_id"))
      keyed.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"),
          col("priority"))
        .orderBy(col("lang"), col("rk"))
    }),

    // Consensus dedup table: the signature families' verdicts unioned
    // per pair with method flags — exact (normalized sha) and strong
    // minhash (≥2 agreeing bands) here; a pair flagged by BOTH
    // methods is corroborated, single-method pairs route to review.
    // Full-outer on the pair key over two already-small pair sets —
    // the corpus never joins. (Simhash's blocked partition has a
    // different recall envelope and stays its own scored family.)
    "q_dedup_consensus" -> ((s, d) => {
      val sig = docs(s, d).select(col("doc_id"),
        sha2(Dedup.normPrefix(col("text"), 5), 256).as("sig"))
      val exact = sig.as("a")
        .join(sig.as("b"), col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          lit(1L).as("m_exact"))
      val mh = candidatesC(s, d).where(col("bands") >= 2)
        .select(col("d1"), col("d2"), lit(1L).as("m_minhash"))
      exact.join(mh, Seq("d1", "d2"), "full_outer")
        .select(col("d1"), col("d2"),
          coalesce(col("m_exact"), lit(0L)).as("m_exact"),
          coalesce(col("m_minhash"), lit(0L)).as("m_minhash"))
        .withColumn("n_methods", col("m_exact") + col("m_minhash"))
        .orderBy(col("d1"), col("d2"))
    }),

    // Boilerplate n-gram monitor: the top-20 shingles by document
    // frequency with their cap verdict — the read-out that TUNES the
    // DF caps (split-leakage, source-overlap) before they silently
    // drop signal. Partial/final count over the cached distinct
    // shingle set; top-k as TakeOrderedAndProject.
    "q_boilerplate_ngrams" -> ((s, d) =>
      distinctShinglesC(s, d)
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .select(col("shingle"), col("df"),
          (col("df") > LeakDfCap).cast("long").as("over_cap"))
        .orderBy(col("df").desc, col("shingle"))
        .limit(20)),

    // Feature hashing (the HashingVectorizer / hashing-trick shape):
    // every token maps to one of 16 buckets via the portable spread
    // hash, per-doc bucket counts pivot to a FIXED 16-column feature
    // vector — no vocabulary pass, no dictionary state, the property
    // that makes the trick streaming- and scale-safe. Explode fans
    // out in place; the pivot value list is pinned (no discovery
    // scan).
    "q_feature_hashing" -> ((s, d) => {
      val toks = docs(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      val bucketed = toks.withColumn("bucket",
        PortableHash.spread(PortableHash.h(col("token"))) % lit(16L))
      // conditional aggregation, not Dataset.pivot: pivot plans TWO
      // aggregate exchanges (groupBy(doc,bucket) then the pivot agg);
      // the pinned-bucket conditional sums do it in ONE partial/final
      // agg on doc_id — the same plan the oracle's FILTER form states
      val feats = (0 until 16).map(i =>
        sum(when(col("bucket") === i.toLong, 1L).otherwise(0L))
          .as(s"f$i"))
      bucketed.groupBy(col("doc_id"))
        .agg(feats.head, feats.tail: _*)
        .orderBy(col("doc_id"))
    }),

    // Incremental materialized-view maintenance: the stored base
    // aggregate (partial sums per stratum over the standing corpus)
    // merges with the delta batch's partials by UNION + re-aggregate
    // — the base's ROWS are never rescanned, only its agg table (one
    // row per stratum). The oracle computes the same summary over
    // the full table directly: equality proves merge(base, delta) ==
    // recompute(all), the invariant that makes MV upkeep safe. Every
    // aggregate here is decomposable (counts/sums); the repo's
    // fixed-point discipline is what keeps them mergeable without
    // drift.
    "q_mv_merge" -> ((s, d) => {
      def partials(df: DataFrame) = df
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
          sum(PortableHash.spread(PortableHash.h(col("text"))))
            .as("text_hash_sum"))
      val base = partials(docs(s, d).where(col("doc_id") % 10 =!= 7))
      val delta = partials(docs(s, d).where(col("doc_id") % 10 === 7))
      base.unionByName(delta)
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("text_hash_sum")).as("text_hash_sum"))
        .orderBy(col("source"), col("lang"))
    }),

    // MV maintenance under RETRACTIONS — the CDC half q_mv_merge
    // doesn't cover: deletes arrive as NEGATED partials (sign −1) and
    // inserts as positive ones, merged into the stored summary by the
    // same union + re-aggregate; groups whose merged count hits zero
    // drop out (the HAVING — a retraction subtlety recompute gets for
    // free but merge must state). Equality with the oracle's direct
    // recompute over the post-change corpus proves merge(base,
    // +inserts, −deletes) == recompute(v2) for every decomposable
    // aggregate in the summary — the invariant that lets a 100 TB MV
    // absorb a delete feed without ever rescanning the base rows.
    "q_mv_retract" -> ((s, d) => {
      def partials(df: DataFrame, sgn: Long) = df
        .groupBy(col("source"), col("lang"))
        .agg((count(lit(1)) * lit(sgn)).as("n_docs"),
          (sum(col("n_chars")) * lit(sgn)).as("n_chars"),
          (sum(PortableHash.spread(PortableHash.h(col("text"))))
            * lit(sgn)).as("text_hash_sum"))
      val base = partials(docs(s, d), 1L)
      val dels = partials(docs(s, d).where(col("doc_id") % 13 === 2), -1L)
      val ins = partials(docs(s, d).where(col("doc_id") % 10 === 7)
        .select(col("source"), col("lang"),
          concat(col("text"), lit(" [ins]")).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long")), 1L)
      base.unionByName(dels).unionByName(ins)
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("text_hash_sum")).as("text_hash_sum"))
        .where(col("n_docs") > 0)
        .orderBy(col("source"), col("lang"))
    }),

    // Snapshot reconciliation (table diff): v2 is a deterministic
    // derivation of the corpus (drops, edits, late additions — the
    // transforms both engines replay verbatim), and the diff is ONE
    // full-outer join on the key classifying each row added / removed
    // / changed / unchanged, rolled up per source. At 100 TB this is
    // the shape data reconciliation must take: one key-partitioned
    // join, text compared in place, no row ever leaves its partition
    // twice. (With both snapshots on disk, bucketed layout makes the
    // join exchange-free — io.Bucketing.)
    "q_table_diff" -> ((s, d) => {
      val v1 = docs(s, d).select(col("doc_id"), col("source"), col("text"))
      val v2 = v1.where(col("doc_id") % 31 =!= 5)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 17 === 3, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"))
        .unionByName(v1.where(col("doc_id") % 23 === 7)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            col("source"), col("text")))
      v1.select(col("doc_id"), col("source").as("src1"),
          col("text").as("t1"))
        .join(v2.select(col("doc_id"), col("source").as("src2"),
          col("text").as("t2")), Seq("doc_id"), "full_outer")
        .select(coalesce(col("src1"), col("src2")).as("source"),
          when(col("t1").isNull, lit("added"))
            .when(col("t2").isNull, lit("removed"))
            .when(col("t1") =!= col("t2"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("status"))
    }),

    // Degree distribution of the minhash candidate graph — the
    // monitoring read-out that catches LSH bucket explosions before
    // they hit the pair stage (a hot shingle shows up as a heavy
    // right tail here). Reuses the session-cached candidate pairs;
    // two partial/final aggs over edge endpoints, nothing rescans
    // the corpus.
    "q_graph_degrees" -> ((s, d) => {
      val cand = candidatesC(s, d).select(col("d1"), col("d2"))
      cand.select(col("d1").as("doc_id"))
        .unionAll(cand.select(col("d2").as("doc_id")))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("degree"))
    }),

    // Sparse doc-doc cosine over shingle-count vectors — the exact
    // sparse-similarity complement of the family (minhash≈Jaccard,
    // simhash≈Hamming, embeddings≈dense cosine; THIS is ranked
    // lexical cosine, the related-documents score). Shingles, not
    // words, are the terms: a 31-word vocabulary makes every word a
    // stop-term (df ≈ corpus), while 3-gram shingles carry the
    // discriminative mass — the same reason the dedup family
    // shingles first. The self-join rides the postings' term key
    // with the saturation-escalating DF cap (Dedup.dfCapStats — a
    // common term contributes |D(t)|² pairs and near-zero cosine
    // mass, so the cap bounds the join the way split_leakage's
    // rare-shingle cap does, and the derived escalation keeps a
    // densified corpus from losing its signal silently). Numerator
    // and norms are INTEGER sums over the same capped term space
    // (Σtf₁tf₂, Σtf²) — only the final r4 division is floating.
    "q_doc_similarity" -> ((s, d) =>
      docSimilarity(docs(s, d), Some(docSimCapStats(s, d)),
        cappedOpt = Some(docSimCappedPostsC(s, d)))),

    // The MEASURED fan-out bound for q_doc_similarity's DF-capped
    // self-join (VERDICT r12 #2: the Σ_t C(df_t,2) pair count was
    // asserted, never measured): each term contributes exactly
    // C(df,2) joined rows, so the capped sum IS the pair-stage row
    // count, computed as arithmetic over the df table — no pair is
    // ever materialized (the q_boilerplate_ngrams read-out pattern).
    // One row: terms kept/dropped by the SERVING query's cap (the
    // derived cap_used, r13 verdict #7 — the audit must price the
    // join the serve actually runs), the capped fan-out, the fan-out
    // the UNCAPPED join would have paid, and the worst-case per-term
    // share — the audit a capacity plan reads before running the
    // pair stage at a new scale.
    "q_doc_sim_fanout" -> ((s, d) => {
      // r16: df histogram from the session postings cache — the raw
      // re-shingling was the whole warm cost of this one-row audit
      val tdf = ExtQueries.shinglePostsC(s, d)
        .groupBy(col("shingle").as("w")).agg(count(lit(1)).as("df"))
      val capStats = docSimCapStats(s, d)
      // C(df,2) in pure LONG arithmetic (df·(df−1) is even, so the
      // shift is exact; Spark's `/` would detour through double)
      val pairsOf = shiftright(col("df") * (col("df") - 1), 1)
      tdf.crossJoin(broadcast(capStats))
        .groupBy(col("cap_used"), col("cap_saturated"))
        .agg(
          count(lit(1)).as("n_terms"),
          sum(when(col("df") <= col("cap_used"), 1L).otherwise(0L))
            .as("n_terms_kept"),
          max(col("df")).as("max_df"),
          sum(when(col("df") <= col("cap_used"), pairsOf).otherwise(0L))
            .as("capped_pairs"),
          sum(pairsOf).as("uncapped_pairs"),
          max(when(col("df") <= col("cap_used"), pairsOf).otherwise(0L))
            .as("max_term_pairs"))
        .select(col("n_terms"), col("n_terms_kept"), col("max_df"),
          col("cap_used"), col("cap_saturated"),
          col("capped_pairs"), col("uncapped_pairs"), col("max_term_pairs"),
          Det.r4(col("capped_pairs").cast("double") /
            col("uncapped_pairs").cast("double")).as("capped_frac"))
    }),

    // Link prediction by common neighbors: for NON-adjacent pairs,
    // the number of shared neighbors — the classic missed-duplicate
    // candidate score (two docs that near-dup the same third docs
    // but never shared a band are exactly what LSH misses). Wedge
    // join through the middle vertex with a hub cap (degree ≤ 50):
    // a high-degree hub contributes |Γ(m)|² wedges and near-zero
    // signal — the same reason triangle counting contracts
    // supernodes — so the cap bounds the join superlinearity at any
    // scale. Existing edges are removed by an anti join; score ≥ 2
    // keeps the output a candidate list, not a pair dump.
    "q_link_prediction" -> ((s, d) => {
      val e = candidatesC(s, d).select(col("d1"), col("d2"))
      val viaMid = linkViaMidC(s, d)
      val wedges = viaMid.as("a")
        .join(viaMid.select(col("mid"), col("src").as("dst")).as("b"),
          col("a.mid") === col("b.mid") && col("a.src") < col("b.dst"))
        .groupBy(col("a.src").as("d1"), col("b.dst").as("d2"))
        .agg(count(lit(1)).as("common"))
        .where(col("common") >= 2)
      wedges.join(e, Seq("d1", "d2"), "left_anti")
        .orderBy(col("common").desc, col("d1"), col("d2"))
    }),

    // k-core decomposition (2-core) of the near-dup graph by
    // synchronous peeling: each round drops vertices of degree < 2
    // and the edges they carried, four fixed rounds (converged by
    // round 2 at sf0.01 — the round-over-round edge count is the
    // convergence read-out a production run checks; the per-round
    // plan is one partial/final degree agg + two key joins, so
    // until-fixpoint at 100 TB is the same plan looped). The dense
    // core that survives peeling is where template/boilerplate mass
    // concentrates — the subgraph SemDeDup-style passes should visit
    // first. Each round ends in an eager localCheckpoint: without
    // lineage truncation the round-N plan re-evaluates round N−1
    // THREE times (degree agg twice, join source once) and the
    // replay goes exponential in rounds — the q_graph_rank lesson
    // (NOTES round 2); reliable checkpoint at cluster scale. Result
    // snapshot-memoized like the other fixpoint artifacts.
    // Re-sort AFTER the snapshot read: the reliable-checkpoint
    // parquet path returns rows in file order, which is not
    // contractually the pre-snapshot orderBy — same discipline as
    // q_dedup_clusters / q_entity_resolution.
    "q_graph_kcore" -> ((s, d) =>
      Cache.getOrSnapshot(s, "kcore2", d)(
        GraphRank.kcoreSurvivors(
          candidatesC(s, d).select(col("d1"), col("d2")),
          k = 2, rounds = 4)).orderBy(col("doc_id"))),

    // Label-propagation communities (Raghavan et al. 2007) over the
    // near-dup candidate graph — the density-aware complement to
    // q_dedup_clusters' min-label CC (a bridge edge merges CC
    // components but not LPA communities). Four synchronous rounds,
    // deterministic majority vote (self-vote damped, ties to the
    // smallest label); the oracle replays every round's vote table.
    // Fixpoint artifact → session snapshot, like the kcore peel.
    "q_graph_communities" -> ((s, d) =>
      Cache.getOrSnapshot(s, "lpa4", d)(
        GraphRank.labelPropagation(
          candidatesC(s, d).select(col("d1"), col("d2")),
          rounds = 4)).orderBy(col("doc_id"))),

    // ORC sink→source roundtrip — the hive-ecosystem columnar
    // interchange format, written once per sf dir with full write
    // parallelism and read back through Spark's stripe-splittable ORC
    // scan. Summarized per language with the same folded per-row text
    // hash as the JSONL roundtrip; the oracle runs the summary over
    // the PARQUET table, so one mangled byte, lost row, or re-typed
    // column anywhere in the ORC write→read path moves a cell.
    "q_orc_roundtrip" -> ((s, d) => {
      val path = graft.io.DialectFixtures.writeDocsOrc(s, d)
      s.read.orc(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          sum(PortableHash.spread(PortableHash.h(col("text"))))
            .as("text_hash_sum"))
        .orderBy(col("lang"))
    }),

    // XML interchange through Spark 4's BUILT-IN xml source (the
    // spark-xml package merged upstream — no extra dependency): the
    // corpus written as <docs><doc>…</doc></docs>, read back through
    // the schema-inferring XML scan, summarized per language with the
    // same folded text hash as the JSONL/ORC/CSV roundtrips. XML's
    // entity encoding is the one most likely to mangle text ('<', '&',
    // quotes), and the hash moves on one mangled byte. The oracle runs
    // the summary over the parquet table. At 100 TB: XML files are
    // row-tag-splittable in Spark's reader, so the scan parallelizes
    // like the other text formats.
    "q_xml_roundtrip" -> ((s, d) => {
      val path = graft.io.DialectFixtures.writeDocsXml(s, d)
      // reader options pinned for byte-identity: the XML source
      // defaults ignoreSurroundingSpaces=true, which would TRIM
      // whitespace-bordered text and report a reader-option artifact
      // as an encoding failure; an empty <text/> element reads as
      // null (XML cannot distinguish it from absent), so the hash
      // input coalesces to "" — h("") == h(coalesce) on the writer
      // side where the column is never null
      s.read.option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .format("xml").load(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          sum(PortableHash.spread(PortableHash.h(
            coalesce(col("text"), lit(""))))).as("text_hash_sum"))
        .orderBy(col("lang"))
    }),

    // Avro interchange — the FIFTH roundtrip format, and the r13
    // park-list item unblocked without the spark-avro module: the
    // corpus written as Avro object-container files (one per input
    // partition) and read back through file-grain tasks, both legs
    // plain public Avro Java API over the core avro library every
    // Spark classpath already ships (io.AvroInterchange scaladoc has
    // the 100 TB shape). Avro is BINARY — no entity/quote/escape
    // layer at all — so the folded text hash proves the container
    // encoding itself hands back every byte. Same parquet-truth
    // summary oracle as the JSONL/ORC/CSV/XML roundtrips.
    "q_avro_roundtrip" -> ((s, d) => {
      val path = graft.io.DialectFixtures.writeDocsAvro(s, d)
      graft.io.AvroInterchange.read(s, path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          sum(PortableHash.spread(PortableHash.h(col("text"))))
            .as("text_hash_sum"))
        .orderBy(col("lang"))
    })
  )

  /** q_doc_similarity's body over an arbitrary documents frame — the
    * scored query binds it to the sf dir; CapSpec drives it with a
    * deliberately densified corpus to prove the saturation escalation
    * (r13 verdict #3: the audit existed, the serve didn't flag).
    * Every output row carries the ONE-row cap read-out
    * (cap_used/cap_saturated/capped_frac) next to the scores, so a
    * DF-cap that would exclude ~all pair mass is visible at serve
    * time, not only in q_doc_sim_fanout. */
  /** The ONE-row derived-cap read-out q_doc_similarity and
    * q_doc_sim_fanout share, memoized per (session, dir): the
    * histogram chain behind it scans the full posting aggregation,
    * and un-memoized every warm serve re-paid it (measured +2.1 s at
    * sf0.1). Spec-driven corpora (no dir) snapshot without the memo. */
  /** Capped symmetric wedge-edge list (src, mid) for
    * q_link_prediction, session-snapshotted (r17): the wedge
    * self-join references it twice and the degree-cap agg sits under
    * it — un-materialized, the candidate-graph subtree replayed ~8×
    * per action (106 Exchanges in plans/r17's before-plan; an
    * in-ACTION eager materialization was measured WORSE than the
    * cache-served replay, so this is a session artifact like the
    * knn graph, not a per-action checkpoint). Bounded: ≤ 50 rows per
    * mid by the hub cap. */
  private[graft] def linkViaMidC(s: SparkSession, d: String): DataFrame =
    Cache.getOrSnapshot(s, "link_via_mid", d) {
      val e = candidatesC(s, d).select(col("d1"), col("d2"))
      val sym = e.select(col("d1").as("src"), col("d2").as("dst"))
        .unionAll(e.select(col("d2").as("src"), col("d1").as("dst")))
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      val hubOk = deg.where(col("dg") <= 50).select(col("src").as("mid"))
      sym.select(col("src"), col("dst").as("mid")).join(hubOk, Seq("mid"))
    }

  /** The DF-capped tf posting table q_doc_similarity's self-join
    * scans — the similarity serve's real index artifact, snapshotted
    * once per session (r17): the norm agg and both pair-join sides
    * referenced the posts⋈dfOk subtree (with the df aggregation under
    * it) 3× per action. */
  private[graft] def docSimCappedPostsC(s: SparkSession, d: String)
      : DataFrame =
    Cache.getOrSnapshot(s, "doc_sim_capped_posts", d) {
      val posts = ExtQueries.shinglePostsC(s, d)
        .select(col("doc_id"), col("shingle").as("w"), col("tf"))
      val tdf = posts.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val dfOk = tdf
        .crossJoin(broadcast(docSimCapStats(s, d).select(col("cap_used"))))
        .where(col("df") <= col("cap_used"))
        .select(col("w"))
      posts.join(dfOk, Seq("w"))
    }

  private[graft] def docSimCapStats(s: SparkSession, d: String)
      : DataFrame =
    Cache.getOrSnapshot(s, "doc_sim_capstats", d) {
      // r16: derive the df histogram from the session postings cache
      // (ExtQueries.shinglePostsC) instead of re-shingling raw text
      val tdf = ExtQueries.shinglePostsC(s, d)
        .groupBy(col("shingle").as("w")).agg(count(lit(1)).as("df"))
      Dedup.dfCapStats(tdf, docs(s, d).agg(count(lit(1)).as("n_docs")),
        DocSimDfCap, DfCapBudget)
    }

  private[graft] def docSimilarity(docsDf: DataFrame,
      memoized: Option[DataFrame] = None,
      postsOpt: Option[DataFrame] = None,
      cappedOpt: Option[DataFrame] = None): DataFrame = {
    // r16: the scored query hands in the session postings cache; the
    // spec-driven corpora (no dir) still aggregate from raw text.
    // r17: the scored query passes the whole DF-capped posting table
    // ([[docSimCappedPostsC]]) — `capped` feeds the norm agg and both
    // self-join sides, so un-materialized the posts⋈dfOk subtree (df
    // aggregation included) replayed 3× per action.
    lazy val posts = postsOpt.getOrElse(
        Dedup.shingles(docsDf, 3)
          .groupBy(col("doc_id"), col("shingle"))
          .agg(count(lit(1)).as("tf")))
      .select(col("doc_id"), col("shingle").as("w"), col("tf"))
    lazy val tdf = posts.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nd = docsDf.agg(count(lit(1)).as("n_docs"))
    // one row; feeds the df filter AND the output columns — snapshot
    // so the histogram chain behind it runs once
    val capStats = memoized.getOrElse(
      Dedup.dfCapStats(tdf, nd, DocSimDfCap, DfCapBudget)
        .localCheckpoint(true))
    val capped = cappedOpt.getOrElse {
      val dfOk = tdf
        .crossJoin(broadcast(capStats.select(col("cap_used"))))
        .where(col("df") <= col("cap_used"))
        .select(col("w"))
      posts.join(dfOk, Seq("w"))
    }
    val norms = capped.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("nsq"))
    val pairs = capped.as("a")
      .join(capped.select(col("w"), col("doc_id").as("d2"),
        col("tf").as("tf2")).as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.d2"))
      .groupBy(col("a.doc_id").as("d1"), col("b.d2").as("d2"))
      .agg(sum(col("a.tf") * col("tf2")).as("num"),
        count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
    pairs
      .join(norms.select(col("doc_id").as("d1"), col("nsq").as("n1")),
        Seq("d1"))
      .join(norms.select(col("doc_id").as("d2"), col("nsq").as("n2")),
        Seq("d2"))
      .crossJoin(broadcast(capStats))
      .select(col("d1"), col("d2"), col("num"), col("n_shared"),
        Det.r4(col("num").cast("double") /
          (sqrt(col("n1").cast("double")) *
           sqrt(col("n2").cast("double")))).as("cos_sim"),
        col("cap_used"), col("cap_saturated"), col("capped_frac"))
      .orderBy(col("cos_sim").desc, col("d1"), col("d2"))
  }
}
