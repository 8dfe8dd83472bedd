package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, PortableHash}
import graft.io.Sources
import graft.rel.Oracle
import graft.rel.Oracle.r4
import graft.streaming.StreamOps

/** Extension query inventory: dedup, near-dup, text analysis,
  * embedding search, multimodal metadata, session windows — the
  * training-data-pipeline surface mandated beyond the reference
  * (SURVEY.md §2.3 extension rows + BASELINE.json north star).
  */
object ExtQueries {

  import graft.core.Cache

  /** The document corpus, spread to the executor width. The sf*
    * corpus is ONE small parquet file → one input split, so every
    * explode-heavy consumer (shingles, windows, tokens) would
    * single-thread its entire fan-out — measured: q_repetition_filter
    * runs 3.4 s on one core warm, and any co-tenant stall on that one
    * core balloons it 100×. Redistributing the 5k-row scan costs a
    * trivial exchange and buys 32-way fan-out parallelism; the gate
    * makes it a no-op at production scale, where the scan is already
    * multi-split. Result invariance under partitioning is the repo's
    * standing determinism contract (order-independent fixed-point
    * aggregates + total-order output sorts). */
  private[ext] val docSplitsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Int]

  /** Per-(session, dir) verdict of the triangle twin-contraction
    * structure check — two bounded counts, paid once per session. */
  private[ext] val triGuardMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

  private[ext] def docs(s: SparkSession, d: String) = {
    val t = Sources.table(s, d, "documents")
    // split count is a property of (context, dir) — memoize it so the
    // gate doesn't re-pay physical planning + file listing per call
    // (the Broadcasts.countMemo pattern). Keyed on applicationId (unique
    // per context, never reused the way a GC'd session's identity hash
    // can be); a file layout that CHANGES under a live context is not
    // re-observed — accepted staleness, same contract as countMemo, and
    // perf-only either way (results are partitioning-invariant).
    val splits = docSplitsMemo.getOrElseUpdate(
      (s.sparkContext.applicationId, d), t.rdd.getNumPartitions)
    val width = s.sparkContext.defaultParallelism
    if (splits < width) t.repartition(width) else t
  }
  private[ext] def emb(s: SparkSession, d: String) = Sources.table(s, d, "embeddings")

  /** Scale-safe acceptance panel (VERDICT r11 #1): the recall twins'
    * truth legs are nq×N brute force, and with nq = the whole
    * vec_id%50 sample, nq GROWS with the corpus — 30× queries × 30×
    * corpus = 900× truth work (q_ann_graph_recall gated 93× at 30×
    * before this). The fix is a FIXED seeded query panel: the
    * [[AnnPanelSize]] smallest-spread-hash ids among the %50 sample
    * (the portable Lehmer multiply, so DuckDB picks the IDENTICAL
    * panel). nq is pinned → truth work is O(PanelSize·N), linear,
    * and the twins ride the standing scale gate. At sf ≤ 0.01 (the
    * correctness gate's scale) the %50 sample is smaller than the
    * panel, so the panel IS the old sample and every oracle-checked
    * recall value is unchanged; per-query
    * results are per-qid window-independent, so panel restriction
    * never changes a served cell either. Serving queries
    * (q_ann_graph, q_ann_ivf_pq, …) still serve the full %50 sample —
    * only the acceptance MEASUREMENT pins its query count. */
  private[ext] val AnnPanelSize = 32
  private[ext] def annPanelC(s: SparkSession, d: String): DataFrame =
    Cache.getOrPersist(s, "ann_panel", d)(
      emb(s, d).where(col("vec_id") % 50 === 0)
        .orderBy(PortableHash.spread(col("vec_id")), col("vec_id"))
        .limit(AnnPanelSize)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label")))

  /** Shared recall tail over the twins' (exact, served-hit) frames,
    * SESSION-CACHED per variant: a twin's output is <= panel-size
    * rows, and q_ann_frontier re-aggregates all seven - caching the
    * tiny result tables turns the frontier (and every warm re-read
    * of a twin) into a union of cached scans instead of seven fresh
    * serve+truth plans. Values are unchanged by construction; the
    * scale gate grades the twins' first (build) runs, where the
    * serve+truth work actually happens. Snapshot (not persist): the
    * twins' plans carry panel/centroid/shortlist broadcasts, and a
    * persisted frame re-executes its broadcast futures on every
    * action — lineage truncation is the whole point here. */
  private[ext] def recallTable(s: SparkSession, d: String,
      variant: String, exact: => DataFrame, served: => DataFrame)
      : DataFrame =
    Cache.getOrSnapshot(s, s"recall_$variant", d)(
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall")))
      .orderBy(col("qid"))

  /** SQL twin of [[annPanelC]] — defines `panel(pqid)`. */
  private[ext] lazy val panelCte: String =
    s"""panel AS (
       |  SELECT vec_id AS pqid FROM embeddings
       |  WHERE vec_id % 50 = 0
       |  ORDER BY ${PortableHash.spreadSql("vec_id")}, vec_id
       |  LIMIT $AnnPanelSize)""".stripMargin

  /** q_zipf_fit: how many top frequency ranks enter the OLS fit
    * (shared by query and oracle). */
  private[ext] val ZipfTopRanks = 30

  /** Per-(doc, term) frequency postings — the BM25 INDEX, shared by
    * the retrieval query, the token-entropy aggregate and the
    * cluster-topics c-TF-IDF (session artifact like the PQ
    * codebook). */
  private[ext] def bm25TfC(s: SparkSession, d: String): DataFrame =
    Cache.getOrPersist(s, "bm25_tf", d)(
      docs(s, d).select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf")))

  /** Layer-0 NSW neighbor graph snapshot (graph-ANN serving
    * structure) — shared by the flat serve, its recall twin, and
    * both HNSW queries. */
  private[ext] def knnGraphC(s: SparkSession, d: String): DataFrame =
    Cache.getOrSnapshot(s, "knn_graph", d)(
      VectorSearch.knnGraph(
        emb(s, d).select(col("vec_id"), col("embedding"))))

  /** Layer-1 (sampled-subset) neighbor graph snapshot for the HNSW
    * descent. */
  private[ext] def knnGraphL1C(s: SparkSession, d: String): DataFrame =
    Cache.getOrSnapshot(s, "knn_graph_l1", d)(
      VectorSearch.knnGraphL1(
        emb(s, d).select(col("vec_id"), col("embedding"))))

  /** Write the full on-disk ANN index ONCE per (session, dir) and
    * return its path — shared by the three *_persist serving queries
    * so the save cost never repeats per query. Absolute base like
    * every other persisted artifact (a cwd-relative path would serve
    * different indexes per launch dir). */
  private[ext] val annSavedMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private[ext] def annIndexPath(s: SparkSession, d: String): String =
    annSavedMemo.getOrElseUpdate((Cache.sessionKey(s), d), {
      val path = sys.props.getOrElse("graft.ann.indexBase",
        "/root/repo/target/ann_index") + "/" +
        d.replaceAll("[^A-Za-z0-9._-]", "_")
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cells = VectorSearch.labelCentroids(emb(s, d))
        .select(col("label").cast("long").as("cell_id"), col("centroid"))
      AnnIndex.save(e, cells, path)
      path
    })

  /** Per-doc bigram-LM scores (doc_id, n_bigrams, sum_nl2fx,
    * avg_nl2fx, avg_bits) — the Laplace-smoothed integer-log2
    * pipeline (see LmScore scaladoc), shared by q_lm_score and the
    * CCNet tercile split. Count tables and the per-doc frame are
    * session artifacts; the count-table join sides ride gated
    * broadcasts (shuffle joins on the n-gram key past the gate). */
  private[ext] def lmDocScores(s: SparkSession, d: String): DataFrame =
    Cache.getOrPersist(s, "lm_doc_scores", d) {
      val ws = split(col("text"), " ")
      val docBg = Cache.getOrPersist(s, "lm_doc_bigrams", d)(
        docs(s, d).where(size(ws) >= 2).select(col("doc_id"),
          explode(transform(sequence(lit(1), size(ws) - 1), i =>
            struct(element_at(ws, i).as("w1"),
              concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))
                .as("bg")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"),
            col("b.bg").as("bg")))
      val bgCounts = Cache.getOrPersist(s, "lm_bigram_counts", d)(
        docBg.groupBy(col("bg")).agg(count(lit(1)).as("c12")))
      val ugCounts = Cache.getOrPersist(s, "lm_unigram_counts", d)(
        docs(s, d).select(explode(split(col("text"), " ")).as("w1"))
          .groupBy(col("w1")).agg(count(lit(1)).as("c1")))
      val vocab = ugCounts.agg(count(lit(1)).as("v"))
      def gate(tag: String, f: DataFrame) = graft.core.Broadcasts
        .gatedMemo(f, "spark.graft.lm.broadcastMax", s"lm_$tag:$d")
      docBg
        .join(gate("bg", bgCounts), Seq("bg"))
        .join(gate("ug", ugCounts), Seq("w1"))
        .crossJoin(broadcast(vocab))
        .withColumn("pfx", greatest(
          expr(s"((c12 + 1) * ${LmScore.PScale}L) div (c1 + v)"), lit(1L)))
        .withColumn("e", length(conv(col("pfx"), 10, 2)).cast("long"))
        .withColumn("m",
          expr(s"(pfx * ${LmScore.MScale}L) div " +
            "shiftleft(1L, CAST(e - 1 AS INT))"))
        .withColumn("nl2", lit(LmScore.L9Fx)
          - (col("e") - 1) * lit(LmScore.LogScale)
          - element_at(typedLit(LmScore.Log2Table),
              (col("m") - lit(LmScore.MScale - 1)).cast("int")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("nl2")).as("sum_nl2fx"))
        .withColumn("avg_nl2fx", expr("sum_nl2fx div n_bigrams"))
        .withColumn("avg_bits", Det.r4(
          col("avg_nl2fx").cast("double") / lit(LmScore.LogScale.toDouble)))
    }

  /** Shared dedup intermediates, materialized once per session. The
    * corpus-sized cache is the (doc_id, h) HASH projection, not the
    * string shingles: every minhash stage (band minima, candidates,
    * rescue re-band) consumes only the 8-byte hash, while a 3-word
    * shingle string averages ~20+ bytes — at 100 TB the strings would
    * dominate cache memory for rows only ngramJaccard's exact
    * rescoring ever reads. The string shingles live ONLY in
    * [[distinctShinglesC]], sized by the rescoring need. */
  private[ext] def shingleHashesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "shingle_hashes", d)(
      Dedup.shingleHashes(Dedup.shingles(docs(s, d))))

  /** Primary-family band minima, materialized once per session: used
    * three times per candidate build (cap filter + both self-join
    * sides) and again by the rescue pass's hot-bucket detection. */
  private[ext] def bandMinsC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "minhash_bandmins", d)(
      Dedup.minhashBandMinsFromHashes(shingleHashesC(s, d), 0, Dedup.Bands))

  private[ext] def candidatesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "minhash_cand", d)(
      Dedup.minhashCandidates(bandMinsC(s, d)))

  /** Distinct (doc_id, shingle) STRING set — the one cache that keeps
    * the strings, because exact Jaccard rescoring compares shingle
    * sets; materialized because ngramJaccard references it three times
    * and exchange reuse does not fire above a cached frame (PLANS.md
    * round 5). */
  private[ext] def distinctShinglesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "shingles_distinct", d)(
      Dedup.shingles(docs(s, d)).distinct())

  /** Cap for the rescue-pass query: low enough that the synthetic
    * corpus has over-cap buckets (see q_minhash_rescue's comment). */
  private[ext] val RescueCap = 15

  /** Vocab budget for q_oov_rate — below the corpus's 31 distinct
    * tokens so OOV is a real population; production budgets are
    * 50k–200k. */
  private[ext] val OovVocabSize = 20

  /** Rescue candidate pairs, shared by the rescue query and its exact
    * Jaccard rescore. */
  private[ext] def rescueCandC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "minhash_rescue_cand", d)(
      Dedup.minhashRescueCandidates(
        shingleHashesC(s, d), bandMinsC(s, d), cap = RescueCap))

  /** Simhash signatures, shared by the primary pair pass, the rescue
    * pass (hot-bucket detection + re-block) and the monitoring
    * surface — one corpus aggregation instead of three. */
  private[ext] def simhashSigsC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_sigs", d)(
      Dedup.simhash(docs(s, d)))

  /** Simhash near-dup pairs (primary partition, production cap),
    * shared by the pair query and the cluster resolution query. */
  private[ext] def simhashPairsC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_pairs", d)(
      Dedup.simhashNearDups(simhashSigsC(s, d)))

  /** Rescue-pass pairs for members of over-cap simhash blocks (the
    * sf0.01 corpus trips the production cap for real: one block-3
    * bucket holds all 500 docs — see Dedup.SimhashBlockCap). */
  private[ext] def simhashRescueC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_rescue", d)(
      Dedup.simhashRescueNearDups(simhashSigsC(s, d)))

  /** The near-dup edge set (capped primary pairs ∪ rescue pairs,
    * distinct), session-shared: connected components scans it three
    * times (contraction aggregate + both sides of the rep join) and
    * PageRank re-reads it every round — without the cache each scan
    * re-runs the union+distinct shuffle from the cached pair frames
    * (measured 2.1 s of q_dedup_clusters' 5.4 s warm at sf0.1). */
  private[ext] def simhashEdgesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_edges", d)(
      simhashPairsC(s, d).select(col("d1"), col("d2"))
        .unionByName(simhashRescueC(s, d).select(col("d1"), col("d2")))
        .distinct())

  /** Banded sign-LSH pair cosines, shared by the near-dup pair query
    * and the embedding-cluster resolution query. */
  private[ext] def bandedCosC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "banded_cos", d)(
      VectorSearch.bandedPairCosine(emb(s, d)))

  /** Force the minhash chain (shingle-hash table → LSH candidates). */
  def warmMinhash(spark: SparkSession, dir: String): Unit = {
    shingleHashesC(spark, dir).count()
    candidatesC(spark, dir).count()
    ()
  }

  /** PQ codebook + code table, session-shared: a production deploy
    * persists both (they ARE the index); the codebook is O(M·k·dsub)
    * rows at any corpus size, the codes N×M small integers. */
  private[ext] def pqCentC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "pq_codebook", d)(
      VectorSearch.pqTrain(emb(s, d).select(col("vec_id"), col("embedding"))))

  private[ext] def pqCodesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "pq_codes", d)(
      VectorSearch.pqEncode(
        emb(s, d).select(col("vec_id"), col("embedding")), pqCentC(s, d)))

  /** IVF side of the composed IVF-PQ stack, session-shared: the
    * 10-candidate exact-cosine shortlist (label-centroid cells,
    * 2 probes, %50 query sample) that BOTH the serving query and its
    * recall twin consume — one IVF corpus assignment per session, and
    * the serving parameters exist in exactly one place so the recall
    * measurement can never silently measure a different stack than
    * the one served. */
  private[ext] def ivfPqShortlistC(s: SparkSession, d: String) =
    // getOrSnapshot, not getOrPersist: the shortlist's build plan
    // carries the broadcast cells — a persisted frame re-runs those
    // broadcast stages on every downstream action (Cache scaladoc)
    Cache.getOrSnapshot(s, "ivfpq_shortlist", d) {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cells = VectorSearch.labelCentroids(emb(s, d))
        .select(col("label").cast("long").as("cell_id"), col("centroid"))
      val queries = emb(s, d).where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      VectorSearch.ivfTopK(e, cells, queries, "qid", "qvec", 10, 2)
        .select(col("qid"), col("vec_id"))
    }

  /** Force the trained quantizers (q_ann_kmeans's codebook, the PQ
    * codebook + codes — session-shared artifacts like the LSH
    * tables). */
  def warmVectors(spark: SparkSession, dir: String): Unit = {
    Cache.getOrPersist(spark, "kmeans_cells_8_2", dir)(
      VectorSearch.kmeansCells(
        emb(spark, dir).select(col("vec_id"), col("embedding")),
        k = 8, iters = 2)).count()
    pqCentC(spark, dir).count()
    pqCodesC(spark, dir).count()
    // the composed IVF-PQ shortlist snapshot too — otherwise its
    // build lands on whichever of q_ann_ivf_pq / its recall twin
    // runs first in a cold sweep
    ivfPqShortlistC(spark, dir).count()
    ()
  }

  /** Force the simhash signature/pair tables (primary + rescue) and
    * the banded-LSH pair cosines (all small next to the minhash
    * chain — one future). */
  def warmSimhash(spark: SparkSession, dir: String): Unit = {
    simhashSigsC(spark, dir).count()
    simhashPairsC(spark, dir).count()
    simhashRescueC(spark, dir).count()
    bandedCosC(spark, dir).count()
    ()
  }

  /** Force this module's session-shared intermediates (shingle table,
    * LSH candidate pairs) — see [[graft.rel.SimQueries.warm]]. */
  def warm(spark: SparkSession, dir: String): Unit = {
    warmMinhash(spark, dir)
    warmSimhash(spark, dir)
  }

  /** Force the string-shingle postings snapshots (distinct (doc,
    * shingle) set + rescue candidate pairs) — the first-touch cost
    * that otherwise lands on whichever of q_decontaminate /
    * q_ngram_jaccard / q_minhash_rescue runs first (VERDICT r10:
    * 53.2 s of q_decontaminate's driver cold was this build). */
  def warmShinglePostings(spark: SparkSession, dir: String): Unit = {
    distinctShinglesC(spark, dir).count()
    rescueCandC(spark, dir).count()
    ()
  }

  /** Force the bigram-LM count tables + per-doc score frame and the
    * BM25 term-frequency postings — the q_lm_score / q_token_entropy
    * / q_bm25_retrieval first-touch snapshots. */
  def warmLmTables(spark: SparkSession, dir: String): Unit = {
    lmDocScores(spark, dir).count()
    bm25TfC(spark, dir).count()
    ()
  }

  /** Force both graph-ANN serving structures (layer-0 NSW graph +
    * layer-1 subset graph) — the q_ann_graph/q_ann_hnsw first-touch
    * snapshot builds. */
  def warmKnnGraph(spark: SparkSession, dir: String): Unit = {
    knnGraphC(spark, dir).count()
    knnGraphL1C(spark, dir).count()
    ()
  }

  /** Render every binary media fixture set (PNG/JPEG/BMP/GIF, WAV,
    * animated GIF, phash PNGs) — one-time per sf dir; billing them
    * here keeps the multimodal queries' cold numbers about decode
    * work, not about whichever query wrote the fixture first. */
  def warmMediaFixtures(spark: SparkSession, dir: String): Unit = {
    graft.io.MediaFixtures.write(spark, dir)
    graft.io.AudioFixtures.write(spark, dir)
    graft.io.VideoFixtures.write(spark, dir)
    graft.io.PhashFixtures.write(spark, dir)
    graft.io.DialectFixtures.writeDocsHtml(spark, dir)
    ()
  }

  /** q_dataset_mix rates (shared by query and oracle). */
  private[ext] val MixRates =
    Map("src0" -> 1.5, "src1" -> 0.5, "src2" -> 0.1)

  /** q_lsh_recall ground-truth Jaccard threshold: the sf corpus is
    * cleanly bimodal (observed: 25 pairs ≥ 0.5, everything else
    * < 0.1 at sf0.01), so 0.3 selects exactly the true near-dup
    * population either mode would. */
  private[ext] val LshRecallThresh = 0.3

  /** q_pmi_bigrams min bigram count: PMI explodes on rare pairs
    * (c12=1 pairs of rare words dominate any top-k), so collocation
    * extraction floors the pair count first — the standard Church &
    * Hanks guard. */
  private[ext] val PmiMinCount = 5

  /** q_semdedup cosine threshold: below the synthetic embeddings'
    * natural pair-cosine ceiling (~0.51 max within-cell pair at
    * sf0.01) so a REAL but partial dup population exists — ~20% of
    * vectors flag, 80% survive (production paraphrase dedup runs
    * τ≈0.95 on real embeddings). */
  private[ext] val SemTau = 0.35

  /** q_semdedup cell-membership cap (the LSH bucket-cap policy
    * applied to k-means cells): over-cap cells skip pair generation
    * and their members are flagged, bounding the within-cell
    * quadratic term no matter how skewed the clustering. 65 sits
    * inside the sf0.01 cell-size range (53–71), so BOTH branches are
    * exercised — the RescueCap=15 convention; production caps are
    * ~10× the k ≈ N/m target cell size. */
  private[ext] val SemCellCap = 65

  /** q_semdedup sub-split width: over-cap cells split into ksub
    * sub-cells (one deterministic k-means iteration scoped to the
    * cell) before the rescue dedup pass. At sf0.01 the over-cap cells
    * (66–71 members) split into sub-cells well under the 65 cap, so
    * the rescued branch carries real verdicts. */
  private[ext] val SemSubK = 4

  /** q_split_leakage document-frequency cap: shingles in more docs
    * than this are boilerplate, not leakage evidence — and excluding
    * them bounds the leakage join's per-shingle fan-out. 5 at sf0.01
    * actually excludes shingles (observed DF reaches 7), so the cap
    * path is exercised; production runs use the same order (GPT-3's
    * audit dropped 13-grams above tiny DF for the same reason). */
  private[ext] val LeakDfCap = 5

  /** q_split_assign bands (shared by query and oracle). */
  private[ext] val SplitBands =
    Seq("test" -> 1.0, "train" -> 98.0, "val" -> 1.0)

  /** Per-block UNION ALL: (doc_id, simhash, blk, bv) from `src`, with
    * `sigExpr` as the (possibly rotated) signature to block on —
    * mirrors Dedup.simhashBlockRows term for term. */
  private[ext] def simhashBlocksSql(src: String, sigExpr: String): String =
    (0 until Dedup.SimhashBlocks).map(b =>
      s"SELECT doc_id, simhash, $b AS blk, " +
        s"CAST(floor(($sigExpr) / power(${Dedup.SimhashBlockBase}, $b)) AS BIGINT)" +
        s" % ${Dedup.SimhashBlockBase} AS bv " +
        s"FROM $src").mkString(" UNION ALL ")

  /** Capped pair CTEs over a blocks CTE: ok-bucket filter (cap), kept
    * rows, distinct candidate pairs — Dedup.simhashPairsFromBlocks. */
  private[ext] def simhashCappedPairsSql(blocks: String, cap: Int,
                                    pfx: String): String =
    s"""${pfx}okb AS (
       |  SELECT blk, bv FROM $blocks GROUP BY 1, 2
       |  HAVING count(*) <= $cap),
       |${pfx}kept AS (
       |  SELECT $blocks.* FROM $blocks JOIN ${pfx}okb USING (blk, bv)),
       |${pfx}pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2,
       |         a.simhash AS h1, b2.simhash AS h2
       |  FROM ${pfx}kept a JOIN ${pfx}kept b2
       |    ON a.blk = b2.blk AND a.bv = b2.bv AND a.doc_id < b2.doc_id)""".stripMargin

  /** Shared CTE chain for the simhash oracles: signatures → primary
    * blocks → capped primary pairs (`pairs`), plus the rescue chain —
    * hot buckets → hot docs → rotated re-block → capped rescue pairs
    * (`rpairs`). Pairs are pre-hamming-filter; consumers apply it. */
  private[ext] lazy val simhashPairCtes: String = {
    val rb = Dedup.SimhashRescueRotBits
    val rotExpr = s"(simhash >> $rb) + " +
      s"(simhash & ${(1L << rb) - 1}) * ${1L << (Dedup.SimhashBits - rb)}"
    s"""${Dedup.simhashSql},
       |blocks AS (
       |  ${simhashBlocksSql("simhash", "simhash")}
       |),
       |${simhashCappedPairsSql("blocks", Dedup.SimhashBlockCap, "")},
       |hotb AS (
       |  SELECT blk, bv FROM blocks GROUP BY 1, 2
       |  HAVING count(*) > ${Dedup.SimhashBlockCap}),
       |hotdocs AS (
       |  SELECT DISTINCT blocks.doc_id FROM blocks JOIN hotb USING (blk, bv)),
       |rsim AS (
       |  SELECT s.doc_id, s.simhash, $rotExpr AS rot
       |  FROM simhash s JOIN hotdocs USING (doc_id)),
       |rblocks AS (
       |  ${simhashBlocksSql("rsim", "rot")}
       |),
       |${simhashCappedPairsSql("rblocks", Dedup.SimhashBlockCap, "r")}""".stripMargin
  }

  /** Bounded-round min-label CC ladder — the oracle replay of
    * [[Dedup.connectedComponents]] WITHOUT the recursive-CTE
    * quadratic (VERDICT r12 #3: the recursive `cc` accumulates one
    * (node, label) row per node×reachable-label — ~n² rows inside a
    * giant near-dup cluster, 248 s at sf0.1). Each round takes the
    * min over {self, neighbors' labels, label-of-label} — neighbor
    * propagation plus pointer jumping, the Rastogi-et-al. shortcut —
    * so the reach DOUBLES per round and [[CcRounds]] = 24 converges
    * for any component up to ~2²² nodes (extra rounds are
    * idempotent; a correct label never changes once minimal).
    * Requires `sym(src, dst)` (the symmetric edge list) in scope;
    * emits `cgrp(doc_id, cluster_id)`. Chained plain CTEs — safe to
    * Oracle.mat(). */
  private[ext] val CcRounds = 24
  private[ext] lazy val ccLadderSql: String = {
    val rounds = (1 to CcRounds).map { i =>
      val p = s"lab${i - 1}"
      s"""lab$i AS (
         |  SELECT node, min(l) AS label FROM (
         |    SELECT node, label AS l FROM $p
         |    UNION ALL
         |    SELECT s.src AS node, t.label AS l
         |    FROM sym s JOIN $p t ON t.node = s.dst
         |    UNION ALL
         |    SELECT a.node, b.label AS l
         |    FROM $p a JOIN $p b ON b.node = a.label
         |  ) GROUP BY node)""".stripMargin
    }
    s"""lab0 AS (SELECT doc_id AS node, doc_id AS label FROM documents),
       |${rounds.mkString(",\n")},
       |cgrp AS (
       |  SELECT node AS doc_id, label AS cluster_id FROM lab$CcRounds)""".stripMargin
  }

  private[ext] val normSqlExpr =
    "array_to_string(string_split(text,' ')[1:5], ' ')"

  /** Shared by q_bpe_tokens (replace chain) and q_bpe_tokens_kernel
    * (rank-indexed kernel): the subword count is the `]`-count of the
    * folded string — the exact twin of Bpe.docBpeCol. LEFT JOIN keeps
    * any doc whose word list is empty at n_bpe = 0. */
  private[ext] lazy val bpeTokensOracleSql: String =
    s"""WITH ${Bpe.learnCtesSql()},
       |wsrc AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
       |    x -> x <> '')) AS w
       |  FROM documents),
       |${Bpe.applyCtesSql("wsrc", Seq("doc_id"))},
       |perword AS (
       |  SELECT doc_id, ${Bpe.countSql("tok")} AS c
       |  FROM t${Bpe.NumMerges}),
       |perdoc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ws,
       |         CAST(sum(c) AS BIGINT) AS n_bpe
       |  FROM perword GROUP BY 1)
       |SELECT d.doc_id, COALESCE(p.n_ws, 0) AS n_ws,
       |       COALESCE(p.n_bpe, 0) AS n_bpe
       |FROM documents d LEFT JOIN perdoc p USING (doc_id)
       |ORDER BY doc_id""".stripMargin


  /** Per-probe exact-3-NN prediction (qid, pred_label, true_label,
    * correct) — the shared chain behind q_knn_classify and
    * q_label_noise. Probes ride the FIXED seeded acceptance panel
    * (the recall-twin discipline): the exact side is probes×corpus
    * by construction, so pinning nq is what keeps this measurement
    * O(panel·N) instead of quadratic; the result (≤panel rows) is a
    * session snapshot, so the two consumers pay the scan once. */
  private[ext] def knnPerProbe(s: SparkSession, d: String): DataFrame =
    Cache.getOrSnapshot(s, "knn_per_probe", d) {
      import org.apache.spark.sql.expressions.Window
      graft.expr.GraftFunctions.ensureRegistered(s)
      val e = emb(s, d).select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
      val probes = annPanelC(s, d)
        .select(col("qid"), col("qvec"),
          col("label").cast("long").as("true_label"))
        .withColumn("nrm_q", VectorSearch.fixedNormSq(col("qvec")))
      val scored = e
        .withColumn("nrm_e", VectorSearch.fixedNormSq(col("embedding")))
        .crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("true_label"), col("vec_id"), col("label"),
          Det.r4(VectorSearch.cosineCol(
            VectorSearch.fixedDot(col("qvec"), col("embedding")),
            col("nrm_q"), col("nrm_e"))).as("cos_sim"))
      val wTop = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val votes = scored
        .withColumn("rn", row_number().over(wTop)).where(col("rn") <= 3)
        .groupBy(col("qid"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("n_votes"), min(col("rn")).as("best_rn"))
      val wVote = Window.partitionBy(col("qid"))
        .orderBy(col("n_votes").desc, col("best_rn"), col("label"))
      votes.withColumn("vr", row_number().over(wVote))
        .where(col("vr") === 1)
        .select(col("qid"), col("label").as("pred_label"),
          col("true_label"),
          (col("label") === col("true_label")).cast("long").as("correct"))
    }

  // lazy: oraclesBase references ExtServingOracles.oracles, whose own
  // initializer calls back into this object's CTE builders — with
  // EAGER vals a first touch of ExtServingOracles would re-enter
  // ExtQueries mid-init and read oraclesBase as null (Map ++ null
  // NPE), and two threads first-touching the two objects could
  // deadlock on class-init locks. Lazy maps break the cycle: this
  // object's eager init never touches the sibling objects.
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // Exact dedup: sha2 groups over prefix-normalized text.
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactDupGroups(docs(s, d), Dedup.normPrefix(col("text"), 5))
        .orderBy(col("sig"))),

    // The dataset card: per-(source, lang) release summary a training
    // corpus ships with — doc/char/token totals, mean quality, and
    // exact-dup exposure. Duplicate signatures are counted CORPUS-wide
    // (dup groups cross source/lang boundaries) and attributed to each
    // doc's stratum; quality means ride the fixed-point integer sum so
    // no double addition order can differ. One pass over documents +
    // an O(distinct sigs) count join — the card costs two shuffles at
    // any corpus size.
    "q_dataset_card" -> ((s, d) => {
      val dc = docs(s, d)
      val q = TextAnalysis.qualityColumns(dc)
        .select(col("doc_id"), col("n_words"), col("quality"))
      val sig = dc.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), Dedup.normPrefix(col("text"), 5).as("sig"))
      val sigCounts = sig.groupBy(col("sig")).agg(count(lit(1)).as("sc"))
      sig.join(sigCounts, Seq("sig"))
        .join(q, Seq("doc_id"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"),
          sum(col("n_words")).as("n_words_total"),
          sum(floor(col("quality") * 10000 + 0.5).cast("long")).as("qfx"),
          sum(when(col("sc") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
        .select(col("source"), col("lang"), col("n_docs"),
          col("n_chars_total"), col("n_words_total"),
          Det.r4(col("qfx").cast("double") / lit(10000.0) /
            col("n_docs").cast("double")).as("quality_mean"),
          col("n_dup_docs"),
          Det.r4(col("n_dup_docs").cast("double") /
            col("n_docs").cast("double")).as("dup_pct"))
        .orderBy(col("source"), col("lang"))
    }),

    // The streaming ingest gate executed in batch — the same
    // initialState flatMapGroupsWithState code path a live crawl
    // consumer runs (state bootstrapped from the base corpus, no
    // history replay), scored against the SAME oracle as
    // q_incremental_dedup: the O(1)-per-signature state machine must
    // classify exactly what the batch join does.
    "q_stream_incremental_dedup" -> ((s, d) => {
      import graft.streaming.StreamOps.{DocSig, SigSeen}
      implicit val encD = org.apache.spark.sql.Encoders.product[DocSig]
      implicit val encS = org.apache.spark.sql.Encoders.product[SigSeen]
      val sig = docs(s, d).select(col("doc_id"),
        sha2(Dedup.normPrefix(col("text"), 5), 256).as("sig"))
      val incoming = sig.where(col("doc_id") % 10 === 7).as[DocSig]
      val baseSigs = sig.where(col("doc_id") % 10 =!= 7)
        .groupBy(col("sig")).agg(min(col("doc_id")).as("first_doc"))
        .select(col("sig"), col("first_doc"), lit(true).as("from_base"))
        .as[SigSeen]
      StreamOps.ingestDedupGate(incoming, baseSigs)
        .toDF().orderBy(col("doc_id"))
    }),

    // The SQL front-end as a scored surface: Graft.registerTables
    // makes the corpus SQL-addressable, and the query text below runs
    // VERBATIM on both engines — the Spark side executes the literal
    // oracle string through spark.sql. This is the portability
    // contract a SQL-first user gets: the dialect-shared subset
    // (ANSI aggregates, CAST, GROUP/ORDER BY) behaves identically.
    "q_sql_surface" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlSurfaceSql)
    }),

    // The correlated-subquery third of the literal SQL surface:
    // orders costing more than 2× their own customer's average, as
    // ONE ANSI text with a correlated scalar subquery — Catalyst
    // rewrites it to an aggregate + join (RewriteCorrelatedScalar-
    // Subquery), DuckDB plans its own decorrelation, and both must
    // land on identical rows. Money in exact cents; the avg division
    // spelled once, IEEE on both engines.
    "q_sql_correlated" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlCorrelatedSql)
    }),

    // The LATERAL quarter of the literal SQL surface: a correlated
    // top-N-per-group via LATERAL (... ORDER BY ... LIMIT 2) — the
    // spelling analysts reach for before window functions. Both
    // engines parse the identical text; Spark rewrites it to a
    // ranked-window plan, DuckDB to its own dependent join.
    "q_sql_lateral" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlLateralSql)
    }),

    // The three-valued-logic corner of the literal SQL surface: NOT
    // IN vs NOT EXISTS against a NULL-bearing set (see
    // SqlNullSemanticsSql). Both engines execute the identical text;
    // an engine that "fixes" NOT IN's UNKNOWN into FALSE lands red.
    "q_sql_null_semantics" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlNullSemanticsSql)
    }),

    // The GROUPING()-marker corner of the literal SQL surface (see
    // SqlGroupingSql — rolled-up NULL vs data NULL, null order
    // pinned).
    "q_sql_grouping" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlGroupingSql)
    }),

    // The recursive-CTE corner of the literal SQL surface (Spark 4's
    // UnionLoop): one ANSI text executed verbatim by both engines.
    "q_sql_recursive" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlRecursiveSql)
    }),

    // The EXISTS-decorrelation corner of the literal SQL surface
    // (TPC-H Q4's shape over this schema's columns): a correlated
    // EXISTS predicate both engines must rewrite to a semi-join —
    // the third decorrelation path beside the correlated scalar
    // (q_sql_correlated) and LATERAL (q_sql_lateral).
    "q_sql_exists" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlExistsSql)
    }),

    // Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    // multiplicity arithmetic — min(m_a, m_b) and m_a − m_b per key —
    // that DISTINCT set ops erase; one verbatim two-engine text.
    "q_sql_bag_setops" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlBagSetopsSql)
    }),

    // Prefix top-k (autocomplete read-out): top-3 words per 3-char
    // prefix by corpus frequency. The word counts collapse BEFORE the
    // ranking window — the window runs over O(vocab) rows partitioned
    // by prefix, never over the corpus — and the rank-3 cut is
    // WindowGroupLimit-eligible, so no partition ever materializes
    // fully. Deterministic tie order (count desc, word asc).
    "q_prefix_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = docs(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 3)
        .groupBy(substring(col("w"), 1, 3).as("prefix"), col("w"))
        .agg(count(lit(1)).as("n"))
      val win = Window.partitionBy(col("prefix"))
        .orderBy(col("n").desc, col("w"))
      counts.withColumn("rank", row_number().over(win).cast("long"))
        .where(col("rank") <= 3)
        .orderBy(col("prefix"), col("rank"))
    }),

    // The window-function half of the literal SQL surface: one ANSI
    // text with a named WINDOW clause, ranking + offset functions,
    // executed verbatim by spark.sql AND by the oracle engine — the
    // dialect-portable window subset scored as-is. (CASTs pin the
    // BIGINT output types both engines agree on.)
    "q_sql_window_surface" -> ((s, d) => {
      graft.Graft.registerTables(s, d)
      s.sql(SqlWindowSurfaceSql)
    }),

    // CSV sink→source roundtrip — the third interchange format
    // (JSONL, ORC, now quoted CSV). The fixture embeds a comma in
    // the `tag` column so quoting is genuinely on the path; read
    // back with an EXPLICIT schema (positional, header skipped) and
    // summarized with folded per-row hashes of BOTH the text and the
    // quoted tag — a quoting/escaping bug anywhere moves a cell.
    "q_csv_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val path = graft.io.DialectFixtures.writeDocsCsv(s, d)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType), StructField("tag", StringType)))
      s.read.schema(schema).option("header", "true").csv(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("n_chars"),
          sum(PortableHash.spread(PortableHash.h(col("text"))))
            .as("text_hash_sum"),
          sum(PortableHash.spread(PortableHash.h(col("tag"))))
            .as("tag_hash_sum"))
        .orderBy(col("lang"))
    }),


    // Schema evolution read: two parquet generations under one root
    // (gen=2 added a `quality` column), read with mergeSchema so the
    // union schema surfaces old rows with NULL in the new column —
    // the append-only lakehouse contract. The summary separates "row
    // exists" from "column populated" (n_docs vs n_quality), which is
    // exactly what a reader pinned to either single generation's
    // schema gets wrong; the oracle replays the expected summary from
    // the base table via the deterministic gen split. mergeSchema
    // costs one footer read per file at planning, not a data pass —
    // at 100 TB the read itself stays an ordinary pruned scan.
    "q_schema_drift" -> ((s, d) => {
      val path = graft.io.DialectFixtures.writeDocsDrift(s, d)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("gen").cast("long")).as("gen_sum"),
          sum(when(col("quality").isNotNull, 1L).otherwise(0L))
            .as("n_quality"),
          sum(coalesce(col("quality"), lit(0L))).as("quality_sum"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    }),

    // JSONL sink→source roundtrip — the corpus interchange format
    // (one JSON object per line, splittable, schema-on-read). The
    // corpus is written as JSONL with full write parallelism, read
    // back with an EXPLICIT schema (schema inference would cost a
    // whole extra pass over 100 TB — production pins the schema), and
    // summarized per stratum with a per-row text hash folded into the
    // aggregate — one mangled byte, lost row, or re-typed column
    // anywhere in the write→parse path moves a cell. The oracle runs
    // the same summary over the PARQUET table: roundtrip fidelity IS
    // the check.
    "q_jsonl_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val path = graft.io.DialectFixtures.writeDocsJsonl(s, d)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      s.read.schema(schema).json(path)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("doc_id")).as("id_sum"),
          sum(PortableHash.spread(PortableHash.h(col("text"))))
            .as("text_hash_sum"))
        .orderBy(col("source"), col("lang"))
    }),

    // Keep-first policy: which docs a dedup pass would drop.
    "q_dedup_keep_first" -> ((s, d) =>
      Dedup.dropDuplicatesKeepFirst(docs(s, d), Dedup.normPrefix(col("text"), 5))
        .orderBy(col("doc_id"))),

    // Keep-BEST policy — the keeper choice a curation pipeline
    // actually wants: within each exact-dup group, keep the
    // highest-QUALITY member (q_quality_score's rubric; doc_id breaks
    // ties), not merely the first-seen. Argmax via max_by over the
    // (quality, -doc_id) struct — partial/final agg, no per-group
    // sort — then one join back classifies the drops. Same normalized
    // signature as q_dedup_exact, so all three keeper queries agree
    // on what "duplicate" means.
    "q_dedup_keep_best" -> ((s, d) => {
      val q = TextAnalysis.qualityColumns(docs(s, d))
        .select(col("doc_id"), col("quality"))
      val sigs = docs(s, d)
        .select(col("doc_id"),
          sha2(Dedup.normPrefix(col("text"), 5), 256).as("sig"))
        .join(q, Seq("doc_id"))
      val keepers = sigs.groupBy(col("sig"))
        .agg(max_by(struct(col("doc_id"), col("quality")),
          struct(col("quality"), (-col("doc_id")).as("tb"))).as("k"))
        .select(col("sig"), col("k.doc_id").as("keeper"),
          col("k.quality").as("keeper_quality"))
      sigs.join(keepers, Seq("sig"))
        .where(col("doc_id") =!= col("keeper"))
        .select(col("doc_id"), col("quality"), col("keeper"),
          col("keeper_quality"), col("sig"))
        .orderBy(col("doc_id"))
    }),

    // Incremental dedup — the snapshot-ingest triage every living
    // corpus runs: an incoming batch (docs with doc_id % 10 == 7
    // stand in for the new crawl) is classified per doc against the
    // existing corpus as dup_of_base (signature already in the base,
    // evidence = lowest base doc), dup_in_batch (new to the base but
    // an earlier batch doc has it first), or new. Same normalized
    // signature as q_dedup_exact, so the two agree on what "exact
    // dup" means. Shape at 100 TB: the base reduces to one (sig,
    // min_doc) row per signature (partial/final min — the base's
    // history never shuffles), the batch takes one per-sig window
    // over BATCH rows only, and the classifying join shuffles on sig.
    "q_incremental_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sig = docs(s, d).select(col("doc_id"),
        sha2(Dedup.normPrefix(col("text"), 5), 256).as("sig"))
      val inc = sig.where(col("doc_id") % 10 === 7)
        .withColumn("first_batch",
          min(col("doc_id")).over(Window.partitionBy(col("sig"))))
      val base = sig.where(col("doc_id") % 10 =!= 7)
        .groupBy(col("sig")).agg(min(col("doc_id")).as("base_doc"))
      inc.join(base, Seq("sig"), "left")
        .select(col("doc_id"),
          when(col("base_doc").isNotNull, lit("dup_of_base"))
            .when(col("doc_id") =!= col("first_batch"), lit("dup_in_batch"))
            .otherwise(lit("new")).as("status"),
          when(col("base_doc").isNotNull, col("base_doc"))
            .when(col("doc_id") =!= col("first_batch"), col("first_batch"))
            .otherwise(lit(-1L)).as("dup_of"))
        .orderBy(col("doc_id"))
    }),

    // MinHash+LSH near-dup candidates (8 portable-hash bands).
    "q_minhash_near_dup" -> ((s, d) =>
      candidatesC(s, d).orderBy(col("d1"), col("d2"))),

    // DURABLE near-dup index (the dedup family's q_ann_persist
    // analog): the base corpus's minhash band minima — the LSH
    // postings that ARE the near-dup index — written to parquet
    // partitioned by band, reloaded, and an arriving batch triaged
    // against the STORED postings with one (b, mh) key join. Base
    // text is never rescanned at ingest: each batch pays its own
    // shingling/banding plus the join, the deploy shape where
    // signatures persist for weeks (Lee et al.'s dedup-before-train
    // pipeline run incrementally). The same bucket cap guards both
    // sides, computed over stored ∪ arriving postings — band minima
    // are per-doc, so that union is exactly the full-corpus banding
    // and the oracle replays it as one chain. New-vs-new pairs are
    // deliberately absent (q_incremental_dedup's dup_in_batch covers
    // those); this query prices the index lookup.
    "q_dedup_index_persist" -> ((s, d) => {
      Cache.getOrSnapshot(s, "dedup_index_serve", d) {
        val path = sys.props.getOrElse("graft.dedup.indexBase",
          "/root/repo/target/dedup_index") + "/" +
          d.replaceAll("[^A-Za-z0-9._-]", "_")
        Dedup.minhashBandMins(
            Dedup.shingles(docs(s, d).where(col("doc_id") % 10 =!= 7)))
          .write.mode("overwrite").partitionBy("b").parquet(path)
        // b comes back INT from directory-partition inference — pin
        // it to the writer's BIGINT (the AnnIndex.load discipline)
        val stored = s.read.parquet(path)
          .select(col("doc_id"), col("b").cast("long").as("b"),
            col("mh"))
        val delta = Dedup.minhashBandMins(
          Dedup.shingles(docs(s, d).where(col("doc_id") % 10 === 7)))
        val ok = stored.unionByName(delta)
          .groupBy(col("b"), col("mh")).agg(count(lit(1)).as("sz"))
          .where(col("sz") <= Dedup.MinhashBucketCap)
          .select(col("b"), col("mh"))
        val dl = delta.join(ok, Seq("b", "mh"))
          .select(col("doc_id").as("dnew"), col("b"), col("mh"))
        val st = stored.join(ok, Seq("b", "mh"))
          .select(col("doc_id").as("dbase"), col("b"), col("mh"))
        dl.join(st, Seq("b", "mh"))
          .groupBy(col("dnew"), col("dbase"))
          .agg(count(lit(1)).as("bands"))
      }.orderBy(col("dnew"), col("dbase"))
    }),

    // The over-cap rescue pass end-to-end, at a cap (15) low enough
    // that the synthetic corpus actually HAS hot buckets (max primary
    // bucket is 21 at sf0.01; the production cap of 200 is never hit
    // there, which would make this query a trivial empty-vs-empty
    // check). See Dedup.minhashRescueCandidates.
    "q_minhash_rescue" -> ((s, d) =>
      rescueCandC(s, d).orderBy(col("d1"), col("d2"))),

    // Rescue candidates with >=2 agreeing rescue bands, re-scored with
    // exact n-gram Jaccard: the full hot-bucket second-chance chain.
    "q_rescue_jaccard" -> ((s, d) => {
      val strong = rescueCandC(s, d)
        .where(col("bands") >= 2).select(col("d1"), col("d2"))
      Dedup.ngramJaccard(strong, distinctShinglesC(s, d))
        .orderBy(col("d1"), col("d2"))
    }),

    // Exact 3-gram Jaccard over the strong (≥2 bands) candidates.
    "q_ngram_jaccard" -> ((s, d) => {
      val cand = candidatesC(s, d)
        .where(col("bands") >= 2).select(col("d1"), col("d2"))
      Dedup.ngramJaccard(cand, distinctShinglesC(s, d))
        .orderBy(col("d1"), col("d2"))
    }),

    // Containment rescoring — the asymmetric near-dup signal (short
    // doc embedded in a long one: Jaccard ~0, containment ~1) a drop
    // rule reads NEXT to Jaccard on quote/boilerplate-wrapped
    // corpora. Same candidate set and join plan as q_ngram_jaccard.
    "q_minhash_containment" -> ((s, d) => {
      val cand = candidatesC(s, d)
        .where(col("bands") >= 2).select(col("d1"), col("d2"))
      Dedup.ngramContainment(cand, distinctShinglesC(s, d))
        .orderBy(col("d1"), col("d2"))
    }),

    // The τ-tuning read-out a semantic-dedup deploy decides with: for
    // each candidate threshold, how many banded pairs qualify and how
    // many docs a keep-first pass would drop. Pairs are the capped
    // banded candidates (bounded, never N²) crossed with a 10-row
    // threshold axis — the sweep costs one pass over the pair table.
    "q_dedup_threshold_sweep" -> ((s, d) => {
      val taus = s.range(0, 10).select(col("id").as("i"))
      val pairs = bandedCosC(s, d)
      val hits = taus.join(pairs,
          pairs("cos_sim") >= taus("i").cast("double") * lit(0.05))
        .groupBy(col("i"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("v2")).as("n_dropped_docs"))
      taus.join(hits, Seq("i"), "left")
        .select((col("i") * 5).as("tau_pct"),
          Det.r4(col("i").cast("double") * lit(0.05)).as("tau"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_dropped_docs"), lit(0L)).as("n_dropped_docs"))
        .orderBy(col("tau_pct"))
    }),

    // LSH recall acceptance — q_ann_recall's twin for the TEXT dedup
    // stack: ground truth is every pair with exact n-gram Jaccard ≥
    // threshold (computed independently of any LSH table via the
    // shared-shingle join — pairs sharing nothing have Jaccard 0 and
    // can't reach any positive threshold), and each true pair reports
    // whether the capped primary banding and/or the rescue pass
    // surfaced it. THE number a production dedup deploy signs off on:
    // caps and band counts are recall trades, and this measures what
    // they actually cost on the corpus. The truth side is
    // quadratic-in-near-dups by construction (a measurement harness,
    // like q_ann_recall's exact side — deliberately not in the scale
    // gate); the measured chains are the production-capped ones.
    "q_lsh_recall" -> ((s, d) => {
      val ds = distinctShinglesC(s, d)
      // the exact-Jaccard ground truth is the expensive side (the
      // deliberate all-shared-pairs join) and is a per-dir constant —
      // materialize it once per session like the candidate tables
      val truth = Cache.getOrPersist(s, "jaccard_truth", d) {
        val sizes = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        ds.select(col("doc_id").as("d1"), col("shingle"))
          .join(ds.select(col("doc_id").as("d2"), col("shingle")),
            Seq("shingle"))
          .where(col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("common"))
          .join(sizes.select(col("doc_id").as("d1"), col("n_sh").as("c1")),
            Seq("d1"))
          .join(sizes.select(col("doc_id").as("d2"), col("n_sh").as("c2")),
            Seq("d2"))
          .withColumn("jaccard", Det.r4(col("common").cast("double") /
            (col("c1") + col("c2") - col("common")).cast("double")))
          .where(col("jaccard") >= lit(LshRecallThresh))
      }
      val prim = candidatesC(s, d)
        .select(col("d1"), col("d2"), lit(1L).as("hp"))
      val resc = rescueCandC(s, d)
        .select(col("d1"), col("d2"), lit(1L).as("hr"))
      truth.join(prim, Seq("d1", "d2"), "left")
        .join(resc, Seq("d1", "d2"), "left")
        .select(col("d1"), col("d2"), col("jaccard"),
          coalesce(col("hp"), lit(0L)).as("hit_primary"),
          coalesce(col("hr"), lit(0L)).as("hit_rescue"),
          greatest(coalesce(col("hp"), lit(0L)),
            coalesce(col("hr"), lit(0L))).as("hit"))
        .orderBy(col("d1"), col("d2"))
    }),

    // Robust per-language length outliers (median + MAD, the
    // modified-z gate): median char length and median absolute
    // deviation per language, then |x − med| > 2·MAD flags (2, not the
    // textbook 3: the synthetic length distribution is tight enough
    // that 3·MAD flags nothing — the gate must exercise a real flag
    // population). Robust
    // stats survive the heavy tails that wreck the 3σ z-score gate
    // (q_anomaly_zscore's complement). Exact `percentile` here is
    // scale-safe BECAUSE n_chars has a bounded value domain — the
    // merged value→count map stays small (the Quantiles scaladoc
    // trap applies to mostly-distinct doubles, not bounded ints);
    // per-lang stats broadcast back, the corpus never re-shuffles.
    "q_mad_outliers" -> ((s, d) => {
      val med = docs(s, d).groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.5)).as("med"),
          count(lit(1)).as("n_docs"))
      val dev = docs(s, d).join(broadcast(med), Seq("lang"))
        .withColumn("adev",
          abs(col("n_chars").cast("double") - col("med")))
      val mad = dev.groupBy(col("lang"))
        .agg(percentile(col("adev"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), Seq("lang"))
        .groupBy(col("lang"))
        .agg(min(col("n_docs")).as("n_docs"),
          Det.r4(min(col("med"))).as("median_chars"),
          Det.r4(min(col("mad"))).as("mad_chars"),
          sum(when(col("adev") > lit(2.0) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("lang"))
    }),

    // Embedding drift between splits — the QA check a train/eval
    // split ships with: per-label centroid distance between the
    // train (80%) and holdout (20%) halves of a deterministic hash
    // split. Large drift = the split is not exchangeable for that
    // label (leakage or skew). All centroid arithmetic is the ivf
    // fixed-point discipline (1e-9-unit sums, 1e-12-unit squared
    // diffs — integer sums are order-independent), so the distance
    // replays cell-exact.
    "q_embed_centroid_drift" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"),
        col("label").cast("long").as("label"), col("embedding"),
        when(col("vec_id") % 10 < 8, lit("train")).otherwise(lit("holdout"))
          .as("split"))
      val dims = e.select(col("label"), col("split"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      val cent = dims.groupBy(col("label"), col("split"), col("i"))
        .agg(((sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5))
          .cast("long")).cast("double") / count(lit(1))) / lit(1e9))
          .as("cv"))
      val n = e.groupBy(col("label"), col("split"))
        .agg(count(lit(1)).as("n"))
      val a = cent.where(col("split") === "train")
        .select(col("label"), col("i"), col("cv").as("ca"))
      val b = cent.where(col("split") === "holdout")
        .select(col("label"), col("i"), col("cv").as("cb"))
      val ss = a.join(b, Seq("label", "i"))
        .groupBy(col("label"))
        .agg((sum(floor((col("ca") - col("cb")) * (col("ca") - col("cb"))
          * lit(1e12) + lit(0.5)).cast("long")).cast("double") / lit(1e12))
          .as("ss"))
      ss.join(n.where(col("split") === "train")
            .select(col("label"), col("n").as("n_train")), Seq("label"))
        .join(n.where(col("split") === "holdout")
          .select(col("label"), col("n").as("n_holdout")), Seq("label"))
        .select(col("label"), col("n_train"), col("n_holdout"),
          Det.r4(sqrt(col("ss"))).as("drift"))
        .orderBy(col("label"))
    }),

    // Duplicate-status × quality-band cross-tab — the corpus-health
    // composition question ("are my duplicates the low-quality
    // docs?") answered by joining two already-scored paths: the
    // normalized exact-dup signature and the Gopher-style quality
    // score, banded to deciles. One doc-keyed join, enum-sized
    // output.
    "q_dup_quality_xtab" -> ((s, d) => {
      val q = TextAnalysis.qualityColumns(docs(s, d))
        .select(col("doc_id"), col("n_chars"),
          least(floor(col("quality") * lit(10)), lit(9.0)).cast("long")
            .as("q_band"))
      val sig = docs(s, d).select(col("doc_id"),
        sha2(Dedup.normPrefix(col("text"), 5), 256).as("sig"))
      val marked = sig
        .join(sig.groupBy(col("sig")).agg(count(lit(1)).as("cnt")),
          Seq("sig"))
        .select(col("doc_id"), (col("cnt") > 1).cast("long").as("is_dup"))
      q.join(marked, Seq("doc_id"))
        .groupBy(col("is_dup"), col("q_band"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("is_dup"), col("q_band"))
    }),

    // LSH precision — q_lsh_recall's complement, the other half of
    // the acceptance pair: of the pairs the capped banding SURFACED,
    // how many are true near-dups (exact Jaccard ≥ threshold),
    // stratified by agreeing-band count. Rising precision with band
    // count is the signature of a healthy banding table; a flat curve
    // means the hash family is broken. Reuses the session-cached
    // candidates + distinct shingles; the exact rescore touches only
    // candidate pairs, never all pairs.
    "q_lsh_precision" -> ((s, d) => {
      val cand = candidatesC(s, d)
      Dedup.ngramJaccard(cand.select(col("d1"), col("d2")),
          distinctShinglesC(s, d))
        .join(cand.select(col("d1"), col("d2"), col("bands")),
          Seq("d1", "d2"))
        .groupBy(col("bands"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("jaccard") >= lit(LshRecallThresh), 1L)
            .otherwise(0L)).as("n_true"))
        .select(col("bands"), col("n_cand"), col("n_true"),
          Det.r4(col("n_true").cast("double") / col("n_cand").cast("double"))
            .as("precision"))
        .orderBy(col("bands"))
    }),

    // Recall@3 of the SQ-rerank serving path vs exact ground truth —
    // completes the recall triptych (IVF 0.77, IVF-PQ 0.43, and now
    // the int8-SQ path): every compressed serving variant carries its
    // own acceptance measurement. Same shared IVF shortlist and exact
    // side as the siblings, so the three numbers are comparable by
    // construction.
    "q_ann_sq_recall" -> ((s, d) => {
      lazy val e = emb(s, d).select(col("vec_id"), col("embedding"))
      lazy val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      lazy val served = VectorSearch.sqRerank(
          ivfPqShortlistC(s, d)
            .join(broadcast(queries.select(col("qid"))), Seq("qid"),
              "left_semi"),
          e, "qid", 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      lazy val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      recallTable(s, d, "sq", exact, served)
    }),

    // Vocabulary growth (Heaps' law read-out) over 3-gram shingle
    // types: new distinct types per 50-doc ingest bucket + the
    // cumulative curve — the corpus statistic that sizes tokenizer
    // vocabularies and n-gram LM tables. (Unigram types saturate in
    // the first bucket on this synthetic corpus — 31 tokens — so the
    // scored curve runs on the 3-gram type space, which keeps
    // growing.) Each type reduces to its FIRST document
    // (partial/final min over the session-cached distinct shingle
    // set — the type stream never shuffles twice), buckets aggregate
    // those firsts, and the cumulative sum runs over REPORT rows
    // only (corpus/50 rows; pick the bucket width so the report
    // stays a report — the window is deliberately not over data).
    "q_vocab_growth" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val firstSeen = distinctShinglesC(s, d)
        .groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
      firstSeen
        .groupBy(expr("first_doc div 50").as("bucket"))
        .agg(count(lit(1)).as("new_types"))
        .withColumn("cum_types",
          sum(col("new_types")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy(col("bucket"))
    }),

    // The live ingest-time near-dup gate, executed in batch mode — the
    // same StreamOps.nearDupGate code path a continuously-ingesting
    // pipeline runs as a stream (StreamingSpec asserts stream == batch
    // on this construction): a slice of "incoming" docs, STATELESS
    // per-doc band minima (array_min over shingle hashes — no shuffle,
    // and the only legal streaming topology: a groupBy minima stage
    // could not be followed by the candidate join), matched against
    // the corpus's cap-filtered band-minima buckets.
    "q_stream_dedup_gate" -> ((s, d) =>
      StreamOps.nearDupGate(
        docs(s, d).where(col("doc_id") % 5 === 0), bandMinsC(s, d))
        .orderBy(col("doc_id"), col("corpus_doc"))),

    // SimHash near-dups via 8-bit pigeonhole blocking, hot blocks
    // capped at the production cap (which the synthetic corpus trips:
    // the degenerate block-3 bucket holds all docs).
    "q_simhash_near_dup" -> ((s, d) =>
      simhashPairsC(s, d).orderBy(col("d1"), col("d2"))),

    // The simhash hot-block rescue pass end-to-end: over-cap bucket
    // members re-blocked under the 4-bit-rotated partition, paired
    // there under the same cap — the pigeonhole guarantee restored
    // for the hot population the primary cap dropped.
    "q_simhash_rescue" -> ((s, d) =>
      simhashRescueC(s, d).orderBy(col("d1"), col("d2"))),

    // Near-dup pairs resolved into duplicate clusters: connected
    // components by iterative min-label propagation; cluster_id is
    // the component's smallest doc_id (= the keep-first keeper).
    // Edges = capped primary pairs ∪ rescue pairs — the full guarded
    // chain, not the uncapped quadratic join.
    // The converged (doc_id, cluster_id) map is a session graph
    // artifact like tri_quot_aggs: deterministic per dir, rebuilt by
    // min-label iteration on every call otherwise (3.4 s warm at
    // sf0.1). getOrSnapshot so downstream actions pay a bare scan.
    "q_dedup_clusters" -> ((s, d) =>
      Cache.getOrSnapshot(s, "cc_clusters", d)(
          Dedup.connectedComponents(
            docs(s, d).select(col("doc_id")),
            simhashEdgesC(s, d)))
        .withColumn("is_keeper",
          (col("doc_id") === col("cluster_id")).cast("long"))
        .orderBy(col("doc_id"))),

    // Leakage-free train/val/test split: assignment by near-dup
    // CLUSTER, not by doc — the GroupKFold discipline that keeps a
    // duplicate pair from straddling train and eval (q_split_leakage
    // MEASURES that failure on a doc-hashed split; this query
    // PREVENTS it by construction). Every doc inherits its CC
    // cluster's spread-hash band, so `n_cross_edges` — near-dup
    // edges whose endpoints land in different splits, counted over
    // the ACTUAL edge set — is a proven-zero column, not an
    // assumption. One broadcast of the O(clusters) split map; docs
    // and edges each scanned once. On the synthetic corpus the CC
    // closure collapses to 2 giant clusters (the whole corpus lands
    // in one band) — itself the honest lesson this audit teaches: a
    // group split on a high-duplication corpus degenerates, and you
    // find out HERE, not from eval contamination later.
    "q_leakage_free_split" -> ((s, d) => {
      import graft.core.PortableHash
      val clusters = Cache.getOrSnapshot(s, "cc_clusters", d)(
        Dedup.connectedComponents(
          docs(s, d).select(col("doc_id")), simhashEdgesC(s, d)))
      val sp = PortableHash.spread(PortableHash.h(
        concat(lit("split:"), col("cluster_id").cast("string"))))
      val assigned = clusters.select(col("doc_id"), col("cluster_id"),
        when(sp < 900002L, "train").when(sp < 950002L, "val")
          .otherwise("test").as("split"))
      val edges = simhashEdgesC(s, d)
      val eSplits = edges
        .join(assigned.select(col("doc_id").as("d1"),
          col("split").as("s1")), Seq("d1"))
        .join(assigned.select(col("doc_id").as("d2"),
          col("split").as("s2")), Seq("d2"))
      val eAgg = eSplits.groupBy(col("s1").as("split"))
        .agg(count(lit(1)).as("n_edges"),
          sum((col("s1") =!= col("s2")).cast("long")).as("n_cross_edges"))
      assigned.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .join(eAgg, Seq("split"), "left")
        .select(col("split"), col("n_docs"), col("n_clusters"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          coalesce(col("n_cross_edges"), lit(0L)).as("n_cross_edges"))
        .orderBy(col("split"))
    }),

    // Canonical-document centrality: 3 fixed integer PageRank rounds
    // over the SAME near-dup edge set q_dedup_clusters clusters —
    // inside a duplicate cluster the highest-rank member is the hub
    // the others copy, a better keeper than min-doc_id. All-integer
    // arithmetic (Scale units, 17/20 damping, truncating div), so
    // the 3 rounds replay bit-exactly as chained CTEs.
    // Converged integer ranks: same materialization rationale as
    // cc_clusters (3 replayed rounds = 4.2 s warm at sf0.1 otherwise).
    "q_graph_rank" -> ((s, d) =>
      Cache.getOrSnapshot(s, "pagerank", d)(
          GraphRank.pageRank(
            docs(s, d).select(col("doc_id")),
            simhashEdgesC(s, d)))
        .orderBy(col("doc_id"))),

    // Triangle participation over the minhash near-dup candidate
    // graph: edges that close triangles are corroborated by two other
    // detections (likely true near-dups); triangle-free edges are the
    // LSH false-positive suspects. Degree-ordered orientation keeps
    // the wedge join O(m^1.5) even inside near-dup cliques — see
    // GraphRank.triangleCounts.
    "q_graph_triangles" -> ((s, d) => {
      // Twin contraction first (GraphRank: near-dup cliques → weighted
      // supernodes, intra-clique triangles arithmetic), guarded by an
      // exact structure check on the real edge set — a fingerprint
      // collision falls back to plain enumeration, never to a wrong
      // answer. Both paths produce identical per-doc counts, so the
      // enumeration-shaped oracle is shared. The twin map, quotient
      // list, and guard verdict are session graph artifacts (the warm
      // pass re-reads them); build sides ride conf-gated broadcasts.
      val edges = candidatesC(s, d).select(col("d1"), col("d2"))
      // getOrSnapshot, not getOrPersist: the twin map and the
      // supernode aggregates sit above broadcast-bearing lineages
      // (candidates LSH chain; the gated quotient builds), and a
      // merely-persisted frame re-runs those broadcast stages on
      // every downstream action (Cache.getOrSnapshot scaladoc) —
      // measured 10 s/run on the warm perDoc join before truncation.
      val vmap = Cache.getOrSnapshot(s, "tri_twins", d)(
        GraphRank.twinClasses(edges))
      val contractible = triGuardMemo.getOrElseUpdate(
        (Cache.sessionKey(s), d),
        GraphRank.contractionViolations(edges, vmap) == 0L)
      if (contractible) {
        // the expensive half (quotient wedge enumeration) lands in a
        // per-SUPERNODE aggregate — one row per supernode — so it is
        // session-cached and each run pays only the per-doc join +
        // arithmetic expansion
        val aggs = Cache.getOrSnapshot(s, "tri_quot_aggs", d) {
          val qedges = Cache.getOrPersist(s, "tri_qedges", d)(
            GraphRank.quotientEdges(edges, vmap))
          GraphRank.quotientTriangleAggs(vmap, qedges,
            (tag, f) => graft.core.Broadcasts.gatedMemo(f,
              "spark.graft.graph.broadcastMax", s"tri_q_$tag:$d"))
        }
        GraphRank.perDocTriangles(vmap, aggs).orderBy(col("doc_id"))
      } else {
        val fwd = Cache.getOrPersist(s, "tri_fwd", d)(
          GraphRank.orientEdges(edges))
        GraphRank.triangleCountsOriented(fwd,
            f => graft.core.Broadcasts.gatedMemo(f,
              "spark.graft.graph.broadcastMax", s"tri_fwd:$d"))
          .orderBy(col("doc_id"))
      }
    }),

    // Exact duplicated-substring audit (the ExactSubstr shape of Lee
    // et al. 2022, strided-window approximation): per doc, how many
    // 40-char windows (stride 10) also appear in ANOTHER document.
    // Grouping is on the raw window string — exact semantics, no
    // hash-collision caveat (production swaps in a 128-bit hash key,
    // same plan). The per-window doc-count rides a window function
    // over the (wstr, doc_id) aggregate, so the corpus shuffles once
    // on wstr and once on doc_id — no join-back of a corpus-sized
    // dup set.
    "q_dup_windows" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val perDocWin = Dedup.textWindows(docs(s, d))
        .groupBy(col("wstr"), col("doc_id"))
        .agg(count(lit(1)).as("occ"))
      val marked = perDocWin.withColumn("ndocs",
        count(lit(1)).over(Window.partitionBy(col("wstr"))))
      marked.groupBy(col("doc_id"))
        .agg(sum(col("occ")).as("n_windows"),
          sum(when(col("ndocs") >= 2, col("occ")).otherwise(0L))
            .as("n_dup_windows"))
        .withColumn("dup_frac",
          Det.r4(col("n_dup_windows") / col("n_windows")))
        .orderBy(col("doc_id"))
    }),

    // The CDC storage read-out: what chunk-level dedup SAVES — every
    // duplicate chunk instance beyond its first stores as a
    // reference, so saved bytes = Σ (count−1)·chunk_len per distinct
    // chunk. The number a dedup store quotes (and the decision input
    // for CdcMod: smaller chunks find more sharing but cost more
    // references). One corpus-level row; arithmetic over the sig
    // groups, no joins back to text.
    "q_chunk_dedup_savings" -> ((s, d) => {
      // octet_length, not length: the columns quote STORAGE savings,
      // so multi-byte UTF-8 text must count bytes, not characters
      // (r12 ADVICE; DuckDB twin uses strlen = bytes).
      val sg = Dedup.contentChunks(docs(s, d))
        .select(sha2(col("chunk"), 256).as("sig"),
          octet_length(col("chunk")).cast("long").as("blen"))
      sg.groupBy(col("sig"))
        .agg(count(lit(1)).as("cnt"), min(col("blen")).as("blen"))
        .agg(count(lit(1)).as("n_unique_chunks"),
          sum(col("cnt")).as("n_chunks"),
          sum(col("cnt") * col("blen")).as("total_bytes"),
          sum(col("blen")).as("unique_bytes"),
          sum((col("cnt") - 1) * col("blen")).as("saved_bytes"))
        .withColumn("savings_frac", Det.r4(
          col("saved_bytes").cast("double") /
            col("total_bytes").cast("double")))
    }),

    // Content-defined chunk dedup (LBFS/FastCDC boundaries): the
    // insertion-robust complement of q_dup_windows — a fixed-stride
    // window table shifts wholesale on one inserted character, while
    // rolling-hash boundaries re-cut only the touched chunks, so
    // shared passages keep matching across edited copies. Chunks are
    // grouped by sha2 (exact semantics, no collision caveat), dup
    // exposure attributed per doc exactly like the window variant.
    // Scale: boundary detection is a per-row scan fan-out (no
    // shuffle); the sig groupBy is the only exchange, on ~len/64
    // rows per doc.
    "q_content_chunks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sg = Dedup.contentChunks(docs(s, d))
        .select(col("doc_id"), sha2(col("chunk"), 256).as("sig"))
      val perDoc = sg.groupBy(col("sig"), col("doc_id"))
        .agg(count(lit(1)).as("occ"))
      val marked = perDoc.withColumn("ndocs",
        count(lit(1)).over(Window.partitionBy(col("sig"))))
      marked.groupBy(col("doc_id"))
        .agg(sum(col("occ")).as("n_chunks"),
          sum(when(col("ndocs") >= 2, col("occ")).otherwise(0L))
            .as("n_dup_chunks"))
        .withColumn("dup_frac",
          Det.r4(col("n_dup_chunks") / col("n_chunks")))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary coverage / OOV rate: build the top-k corpus vocab
    // (count desc, token asc — a total order, so the rank-k cut is
    // deterministic) and score each doc's out-of-vocabulary token
    // fraction — the tokenizer-coverage check run before committing a
    // vocab budget. The cut is TakeOrderedAndProject (distributed
    // partial top-k, no global sort), and the vocab is broadcast by
    // construction (≤ VocabSize rows). k=20 here because the
    // synthetic corpus has 31 distinct tokens; production budgets are
    // 50k–200k and change nothing structurally.
    "q_oov_rate" -> ((s, d) => {
      val toks = docs(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(OovVocabSize)
        .select(col("token"), lit(1L).as("__v"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_frac", Det.r4(col("n_oov") / col("n_tokens")))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace words + regex token stream.
    "q_token_count" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"), lit(TextAnalysis.TokenRegex),
          lit(0))).cast("long").as("n_re"),
        col("n_chars"))
        .orderBy(col("doc_id"))),

    // Quality scoring: length/stopword/word-shape bands.
    "q_quality_score" -> ((s, d) =>
      TextAnalysis.qualityColumns(docs(s, d)).orderBy(col("doc_id"))),

    // Gopher-style rule filter (Rae et al. 2021, App. A): the word-
    // level subset of the published heuristics, each emitted as its
    // own 0/1 flag plus the AND verdict, so a curator sees WHICH rule
    // cut a document, not just that one did. Rule shapes are the
    // paper's — word-count band, mean-word-length band, junk-word
    // ratio cap, distinct-stopword floor — with the stopword list and
    // two thresholds calibrated to the corpus's language profile
    // (engine config, like every deployed Gopher variant): this
    // corpus's only function words are {the, a}, its mean word length
    // sits in [3.7, 5.3], and short-word mass is the junk signal a
    // punctuation-free word soup actually carries. All four rules are
    // integer inequalities over per-doc counts (the [4,10] word-length
    // band is spelled 4·n_words ≤ Σlen ≤ 10·n_words; the 5% short-
    // word cap is 20·n_short ≤ n_words): one scan, no doubles across
    // the oracle boundary, every flag whole-stage-codegen'd scalar
    // math — the shape that runs at scan speed on 100 TB.
    "q_gopher_rules" -> ((s, d) =>
      TextAnalysis.gopherRules(docs(s, d))),

    // Corpus bigram counts: top-10 per language by frequency — the
    // language-model-counts shape (explode adjacent pairs, count,
    // rank). Integer-only, so trivially engine-portable; a PMI variant
    // would need log(), which is not bit-portable.
    "q_top_bigrams" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ws = split(col("text"), " ")
      // size >= 2 guard: sequence(1, 0) counts DOWN in Spark (the
      // q_dataset_mix trap), and element_at(_, 0) throws
      val bigrams = docs(s, d).where(size(ws) >= 2).select(col("lang"),
        explode(transform(sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
          .as("bigram"))
      val counts = bigrams.groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("bigram"))
      counts.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 10)
        .orderBy(col("lang"), col("rn"))
    }),

    // Lexical-diversity stats: type-token ratio + Gini-Simpson index
    // (1 − Σp²) per doc — repetition detectors for template-heavy
    // corpora. Deliberately rational arithmetic over exact integer
    // counts: entropy's ln() is not bit-portable across engines
    // (libm vs JVM can differ a ulp), Σc²/n² is.
    "q_text_stats" -> ((s, d) => {
      val words = docs(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_words"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sumsq"))
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          Det.r4(col("n_distinct").cast("double") /
            col("n_words").cast("double")).as("ttr"),
          Det.r4(lit(1.0) - col("sumsq").cast("double") /
            (col("n_words") * col("n_words")).cast("double")).as("simpson"))
        .orderBy(col("doc_id"))
    }),

    // Bigram-LM scoring (the model-based quality signal production
    // curation runs next to q_quality_score's rules): per-doc average
    // bigram negative log2-probability under a Laplace-smoothed
    // corpus bigram model. True log-domain perplexity shape, but NO
    // ln() crosses the oracle boundary — the log is an integer
    // mantissa/exponent decomposition against a shared 128-entry
    // scaled-log table (LmScore scaladoc). Count tables are session
    // artifacts; their join sides ride gated broadcasts (shuffle
    // joins on the n-gram key past the gate — the distributed
    // LM-counts join).
    "q_lm_score" -> ((s, d) =>
      lmDocScores(s, d).orderBy(col("doc_id"))),

    // HELD-OUT bigram-LM perplexity — the honest eval twin of
    // q_lm_score (which scores the corpus under counts trained on
    // itself): counts train on the doc_id%5!=0 slice, the %5==0
    // holdout is scored under THOSE counts, unseen bigrams riding the
    // same Laplace floor (c12=0 ⇒ pfx = PScale/(c1+V), clamped ≥1) —
    // the number that actually detects distribution shift between
    // corpus slices. Same gated-broadcast count joins; the only new
    // plan feature is the LEFT joins (a holdout bigram may be absent
    // from training), whose null sides the Laplace arithmetic
    // absorbs. Per-language roll-up with the OOV-bigram rate beside
    // the bits.
    "q_lm_heldout" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val bg = (src: DataFrame) => src.where(size(ws) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(transform(sequence(lit(1), size(ws) - 1), i =>
            struct(element_at(ws, i).as("w1"),
              concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))
                .as("bg")))).as("b"))
        .select(col("doc_id"), col("lang"), col("b.w1").as("w1"),
          col("b.bg").as("bg"))
      val train = docs(s, d).where(col("doc_id") % 5 =!= 0)
      val hold = bg(docs(s, d).where(col("doc_id") % 5 === 0))
      val bgCounts = Cache.getOrPersist(s, "lmho_bg", d)(
        bg(train).groupBy(col("bg")).agg(count(lit(1)).as("c12")))
      val ugCounts = Cache.getOrPersist(s, "lmho_ug", d)(
        train.select(explode(split(col("text"), " ")).as("w1"))
          .groupBy(col("w1")).agg(count(lit(1)).as("c1")))
      val vocab = ugCounts.agg(count(lit(1)).as("v"))
      def gate(tag: String, f: DataFrame) = graft.core.Broadcasts
        .gatedMemo(f, "spark.graft.lm.broadcastMax", s"lmho_$tag:$d")
      hold
        .join(gate("bg", bgCounts), Seq("bg"), "left")
        .join(gate("ug", ugCounts), Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .withColumn("c12n", coalesce(col("c12"), lit(0L)))
        .withColumn("c1n", coalesce(col("c1"), lit(0L)))
        .withColumn("pfx", greatest(
          expr(s"((c12n + 1) * ${LmScore.PScale}L) div (c1n + v)"),
          lit(1L)))
        .withColumn("e", length(conv(col("pfx"), 10, 2)).cast("long"))
        .withColumn("nl2", lit(LmScore.L9Fx)
          - (col("e") - 1) * lit(LmScore.LogScale)
          - element_at(typedLit(LmScore.Log2Table),
              (expr(s"(pfx * ${LmScore.MScale}L) div " +
                "shiftleft(1L, CAST(e - 1 AS INT))")
                - lit(LmScore.MScale - 1)).cast("int")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum((col("c12n") === 0L).cast("long")).as("oov_bigrams"),
          sum(col("nl2")).as("sum_nl2fx"))
        .select(col("lang"), col("n_bigrams"), col("oov_bigrams"),
          Det.r4(col("oov_bigrams").cast("double") /
            col("n_bigrams").cast("double")).as("oov_rate"),
          Det.r4(col("sum_nl2fx").cast("double") /
            col("n_bigrams").cast("double") /
            lit(LmScore.LogScale.toDouble)).as("avg_bits"))
        .orderBy(col("lang"))
    }),

    // CCNet-style perplexity buckets (Wenzek et al. 2020): the corpus
    // split head/middle/tail by per-doc LM bits terciles — the public
    // curation recipe that keeps the fluent two thirds and reviews
    // the tail. Thresholds are ACTUAL avg_nl2fx elements at 0-based
    // ranks ⌊n/3⌋ and ⌊2n/3⌋ from ONE distributed sort
    // (Quantiles.valuesAtFractions — the r10 batched order-statistic
    // path), docs land in buckets by exact-integer comparison, and
    // the rollup is one partial/final agg — at 100 TB: one sort of
    // one integer column plus one scan.
    "q_ccnet_buckets" -> ((s, d) => {
      val scores = lmDocScores(s, d)
      val ts = graft.core.Quantiles.valuesAtFractionsMemo(
        scores, "avg_nl2fx", Seq(1.0 / 3, 2.0 / 3), s"ccnet_t:$d")
      val (t1, t2) = (ts.head, ts(1))
      scores
        .join(docs(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("bucket",
          when(col("avg_nl2fx") < lit(t1), lit("head"))
            .when(col("avg_nl2fx") < lit(t2), lit("middle"))
            .otherwise(lit("tail")))
        .groupBy(col("bucket"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("n_bigrams"),
          sum(col("sum_nl2fx")).as("sum_nl2fx"))
        .select(col("bucket"), col("lang"), col("n_docs"),
          col("n_bigrams"), col("sum_nl2fx"),
          Det.r4(col("sum_nl2fx").cast("double") /
            col("n_bigrams").cast("double") /
            lit(LmScore.LogScale.toDouble)).as("avg_bits"))
        .orderBy(col("bucket"), col("lang"))
    }),

    // PMI collocation mining (Church & Hanks 1990) over the SAME
    // session LM count tables q_lm_score builds: pmi(w1,w2) =
    // log2(c12·W²/(B·c1·c2)) as a sum/difference of six integer
    // fixed-point log2s (LmScore.log2FxCol — no ln() crosses the
    // oracle boundary, no division enters the log). The min-count
    // floor drops the rare-pair PMI explosion every collocation
    // extractor guards against. Top-20 by exact integer score →
    // TakeOrderedAndProject, never a global sort; count tables join
    // behind the same broadcast gates as q_lm_score.
    "q_pmi_bigrams" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val docBg = Cache.getOrPersist(s, "lm_doc_bigrams", d)(
        docs(s, d).where(size(ws) >= 2).select(col("doc_id"),
          explode(transform(sequence(lit(1), size(ws) - 1), i =>
            struct(element_at(ws, i).as("w1"),
              concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))
                .as("bg")))).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.bg").as("bg")))
      val bgCounts = Cache.getOrPersist(s, "lm_bigram_counts", d)(
        docBg.groupBy(col("bg")).agg(count(lit(1)).as("c12")))
      val ugCounts = Cache.getOrPersist(s, "lm_unigram_counts", d)(
        docs(s, d).select(explode(split(col("text"), " ")).as("w1"))
          .groupBy(col("w1")).agg(count(lit(1)).as("c1")))
      def gate(tag: String, f: DataFrame) = graft.core.Broadcasts
        .gatedMemo(f, "spark.graft.lm.broadcastMax", s"lm_$tag:$d")
      val totals = broadcast(
        ugCounts.agg(sum(col("c1")).as("wtot"))
          .crossJoin(bgCounts.agg(sum(col("c12")).as("btot"))))
      val lg = LmScore.log2FxCol _
      bgCounts.where(col("c12") >= lit(PmiMinCount))
        .withColumn("w1", element_at(split(col("bg"), " "), 1))
        .withColumn("w2", element_at(split(col("bg"), " "), 2))
        .join(gate("ug", ugCounts), Seq("w1"))
        .join(gate("ug2", ugCounts.select(col("w1").as("w2"),
          col("c1").as("c2"))), Seq("w2"))
        .crossJoin(totals)
        .withColumn("pmi_fx",
          lg(col("c12")) + lit(2L) * lg(col("wtot"))
            - lg(col("btot")) - lg(col("c1")) - lg(col("c2")))
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
          col("pmi_fx"),
          Det.r4(col("pmi_fx").cast("double") /
            lit(LmScore.LogScale.toDouble)).as("pmi_bits"))
        .orderBy(col("pmi_fx").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // Per-doc token-distribution entropy — the repetition signal in
    // log space (Gopher's symbol-entropy cousin): H = log2(n) −
    // (Σ c_w·log2fx(c_w)) div n over the doc's term frequencies, all
    // integer until the final r4 render. Low entropy = the doc
    // re-uses few tokens (boilerplate, keyword stuffing); paired with
    // q_repetition_filter's n-gram view it completes the repetition
    // family. Reuses the session BM25 postings (doc, w, tf) — one
    // per-doc partial/final agg, zero cross-doc joins, linear at any
    // corpus size.
    "q_token_entropy" -> ((s, d) => {
      val tf = bm25TfC(s, d)
      tf.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("tf") * LmScore.log2FxCol(col("tf"))).as("sum_clg"))
        .withColumn("ent_fx",
          LmScore.log2FxCol(col("n_tokens")) - expr("sum_clg div n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("ent_fx"),
          Det.r4(col("ent_fx").cast("double") /
            lit(LmScore.LogScale.toDouble)).as("ent_bits"))
        .orderBy(col("doc_id"))
    }),

    // BM25 lexical retrieval — the sparse half of a retrieval stack
    // (the ANN family is the dense half): score every document
    // against a deterministic query (the corpus's 5 highest-df terms,
    // ties lexical) with Lucene's BM25 (k1=1.2, b=0.75, the
    // log((N+1)/(df+0.5)) idf variant, always positive). No ln()
    // crosses the oracle boundary: idf rides the LmScore bit-length/
    // mantissa log2 decomposition (integer in, integer out), the tf
    // saturation is IEEE-exact double arithmetic spelled identically
    // in both engines, and each (doc, term) contribution snaps to a
    // 2^20-unit BIGINT before the per-doc sum, so addition order
    // never matters. Scale shape: postings ⨝ broadcast 5-term query
    // ⨝ doc-length join — linear in matching postings; top-10 via
    // TakeOrderedAndProject, never a global sort.
    "q_bm25_retrieval" -> ((s, d) => {
      // postings, doc lengths, and the 5-term idf table are the
      // INDEX — session artifacts like the PQ codebook; per-query
      // work is the joins + contribution sum below
      val tf = bm25TfC(s, d)
      val dlen = Cache.getOrPersist(s, "bm25_dlen", d)(
        tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")))
      val stats = dlen.agg(count(lit(1)).as("nn"), sum(col("len")).as("tot"))
        .select(col("nn"), expr("(tot * 1000) div nn").as("avgfx"))
      // snapshot (not persist): the 5-row idf table sits above the
      // broadcast(stats) lineage and a df agg over the postings
      val qidf = Cache.getOrSnapshot(s, "bm25_qidf", d)(
        tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("w")).limit(5)
          .crossJoin(broadcast(stats))
          // DECIMAL(38,0) intermediate: (nn+1)·2·1e9 passes 2^63 at
          // ~4.6e9 docs; the RATIO (xfx) stays BIGINT-sized for any
          // real (N, df), only the product needs headroom
          .withColumn("xfx",
            expr(s"CAST((CAST((nn + 1) * 2 AS DECIMAL(38,0)) * " +
              s"${LmScore.PScale}) div (2 * df + 1) AS BIGINT)"))
          .withColumn("e", length(conv(col("xfx"), 10, 2)).cast("long"))
          .withColumn("m", expr(s"(xfx * ${LmScore.MScale}L) div " +
            "shiftleft(1L, CAST(e - 1 AS INT))"))
          .withColumn("idf_fx", (col("e") - 1) * lit(LmScore.LogScale)
            + element_at(typedLit(LmScore.Log2Table),
                (col("m") - lit(LmScore.MScale - 1)).cast("int"))
            - lit(LmScore.L9Fx))
          .select(col("w"), col("idf_fx")))
      tf.join(broadcast(qidf), Seq("w"))
        .join(dlen, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("tfpart",
          col("tf").cast("double") * lit(2.2) /
            (col("tf").cast("double") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("len").cast("double") /
                (col("avgfx").cast("double") / lit(1000.0)))))
        .withColumn("cfx",
          floor(col("idf_fx").cast("double") * col("tfpart") + lit(0.5))
            .cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_qterms"), sum(col("cfx")).as("score_fx"))
        .orderBy(col("score_fx").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), col("n_qterms"), col("score_fx"),
          Det.r4(col("score_fx").cast("double") /
            lit(LmScore.LogScale.toDouble)).as("score"))
        .orderBy(col("score_fx").desc, col("doc_id"))
    }),

    // Known-item retrieval evaluation — the IR acceptance twin the
    // ANN family already has (recall twins): for each probe doc
    // (doc_id % 101 = 3) the query is its RAREST term (min df, ties
    // lexical — the most discriminative single-term query), the
    // candidate set is that term's posting list, ranked by the exact
    // BM25 contribution q_bm25_retrieval serves; the read-out is the
    // probe's SELF-rank and reciprocal rank, whose mean is the MRR a
    // retrieval stack is accepted on (known-item search). Candidate
    // work per probe is DF(term) BY CONSTRUCTION — picking the
    // rarest term is simultaneously the best query and the cost cap,
    // so the evaluation scales as Σ min-DF, never probes × corpus.
    "q_retrieval_mrr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = bm25TfC(s, d)
      val dlen = Cache.getOrPersist(s, "bm25_dlen", d)(
        tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")))
      val stats = dlen.agg(count(lit(1)).as("nn"),
          sum(col("len")).as("tot"))
        .select(col("nn"), expr("(tot * 1000) div nn").as("avgfx"))
      val dfTab = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val probes = docs(s, d).where(col("doc_id") % 101 === 3)
        .select(col("doc_id").as("probe"))
      // argmin (df, w) per probe — struct-min is the argmin idiom
      val pterm = tf.join(broadcast(probes),
          col("doc_id") === col("probe"))
        .join(dfTab, Seq("w")) // df is O(vocab): never hinted broadcast
        // (a web-scale vocab exceeds any broadcast budget; the probe
        // side is the small one and AQE may flip the build side)
        .groupBy(col("probe"))
        .agg(min(struct(col("df"), col("w"))).as("mt"))
        .select(col("probe"), col("mt.w").as("w"),
          col("mt.df").as("df"))
      val qidf = pterm.select(col("w"), col("df")).distinct()
        .crossJoin(broadcast(stats))
        .withColumn("xfx",
          expr(s"CAST((CAST((nn + 1) * 2 AS DECIMAL(38,0)) * " +
            s"${LmScore.PScale}) div (2 * df + 1) AS BIGINT)"))
        .withColumn("e", length(conv(col("xfx"), 10, 2)).cast("long"))
        .withColumn("m", expr(s"(xfx * ${LmScore.MScale}L) div " +
          "shiftleft(1L, CAST(e - 1 AS INT))"))
        .withColumn("idf_fx", (col("e") - 1) * lit(LmScore.LogScale)
          + element_at(typedLit(LmScore.Log2Table),
              (col("m") - lit(LmScore.MScale - 1)).cast("int"))
          - lit(LmScore.L9Fx))
        .select(col("w"), col("idf_fx"))
      val cand = tf
        .join(broadcast(pterm.select(col("probe"), col("w"))), Seq("w"))
        .join(broadcast(qidf), Seq("w"))
        .join(dlen, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("tfpart",
          col("tf").cast("double") * lit(2.2) /
            (col("tf").cast("double") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("len").cast("double") /
                (col("avgfx").cast("double") / lit(1000.0)))))
        .withColumn("cfx",
          floor(col("idf_fx").cast("double") * col("tfpart") + lit(0.5))
            .cast("long"))
      val rw = Window.partitionBy(col("probe"))
        .orderBy(col("cfx").desc, col("doc_id"))
      cand
        .withColumn("self_rank", row_number().over(rw).cast("long"))
        .withColumn("n_cand", count(lit(1))
          .over(Window.partitionBy(col("probe"))))
        .where(col("doc_id") === col("probe"))
        .join(broadcast(pterm.select(col("probe"), col("df"))),
          Seq("probe"))
        .select(col("probe"), col("w").as("term"), col("df"),
          col("n_cand"), col("self_rank"),
          Det.r4(lit(1.0) / col("self_rank").cast("double")).as("rr"))
        .orderBy(col("probe"))
    }),

    // Graded retrieval evaluation — nDCG@5 over the same known-item
    // candidate sets as q_retrieval_mrr, with graded relevance =
    // the query term's tf in the candidate (more occurrences, more
    // relevant — the self-consistent graded label a synthetic corpus
    // supports). DCG = Σ rel_i/log2(i+1) rides the integer path:
    // weight_fx(i) = 2⁴⁰ div log2Fx(i+1), dcg_fx = Σ rel·weight_fx;
    // IDCG re-ranks the same 5 rows by rel desc; ndcg = r4 of the
    // BIGINT ratio. MRR says WHERE the known item landed; nDCG says
    // how well the whole head of the list is ordered.
    "q_retrieval_ndcg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val S = LmScore.LogScale
      val tf = bm25TfC(s, d)
      val dlen = Cache.getOrPersist(s, "bm25_dlen", d)(
        tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")))
      val stats = dlen.agg(count(lit(1)).as("nn"),
          sum(col("len")).as("tot"))
        .select(col("nn"), expr("(tot * 1000) div nn").as("avgfx"))
      val dfTab = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val probes = docs(s, d).where(col("doc_id") % 101 === 3)
        .select(col("doc_id").as("probe"))
      val pterm = tf.join(broadcast(probes),
          col("doc_id") === col("probe"))
        .join(dfTab, Seq("w")) // df is O(vocab): never hinted broadcast
        // (a web-scale vocab exceeds any broadcast budget; the probe
        // side is the small one and AQE may flip the build side)
        .groupBy(col("probe"))
        .agg(min(struct(col("df"), col("w"))).as("mt"))
        .select(col("probe"), col("mt.w").as("w"),
          col("mt.df").as("df"))
      val qidf = pterm.select(col("w"), col("df")).distinct()
        .crossJoin(broadcast(stats))
        .withColumn("xfx",
          expr(s"CAST((CAST((nn + 1) * 2 AS DECIMAL(38,0)) * " +
            s"${LmScore.PScale}) div (2 * df + 1) AS BIGINT)"))
        .withColumn("e", length(conv(col("xfx"), 10, 2)).cast("long"))
        .withColumn("m", expr(s"(xfx * ${LmScore.MScale}L) div " +
          "shiftleft(1L, CAST(e - 1 AS INT))"))
        .withColumn("idf_fx", (col("e") - 1) * lit(LmScore.LogScale)
          + element_at(typedLit(LmScore.Log2Table),
              (col("m") - lit(LmScore.MScale - 1)).cast("int"))
          - lit(LmScore.L9Fx))
        .select(col("w"), col("idf_fx"))
      val cand = tf
        .join(broadcast(pterm.select(col("probe"), col("w"))), Seq("w"))
        .join(broadcast(qidf), Seq("w"))
        .join(dlen, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("tfpart",
          col("tf").cast("double") * lit(2.2) /
            (col("tf").cast("double") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("len").cast("double") /
                (col("avgfx").cast("double") / lit(1000.0)))))
        .withColumn("cfx",
          floor(col("idf_fx").cast("double") * col("tfpart") + lit(0.5))
            .cast("long"))
      val served = Window.partitionBy(col("probe"))
        .orderBy(col("cfx").desc, col("doc_id"))
      val ideal = Window.partitionBy(col("probe"))
        .orderBy(col("tf").desc, col("doc_id"))
      cand
        .withColumn("srank", row_number().over(served).cast("long"))
        .withColumn("irank", row_number().over(ideal).cast("long"))
        .withColumn("slg", LmScore.log2FxCol(col("srank") + 1))
        .withColumn("ilg", LmScore.log2FxCol(col("irank") + 1))
        .withColumn("sw", expr(s"${S * S} div slg"))
        .withColumn("iw", expr(s"${S * S} div ilg"))
        .groupBy(col("probe"))
        .agg(
          sum(when(col("srank") <= 5, col("tf") * col("sw"))
            .otherwise(0L)).as("dcg_fx"),
          sum(when(col("irank") <= 5, col("tf") * col("iw"))
            .otherwise(0L)).as("idcg_fx"))
        .select(col("probe"), col("dcg_fx"), col("idcg_fx"),
          Det.r4(col("dcg_fx").cast("double") /
            col("idcg_fx").cast("double")).as("ndcg"))
        .orderBy(col("probe"))
    }),

    // Marker-based language scoring + argmax prediction.
    "q_lang_id" -> ((s, d) => {
      val ws = TextAnalysis.wordsCol
      val scored = docs(s, d).select(
        (col("doc_id") +: col("lang") +:
          TextAnalysis.Markers.map { case (l, ms) =>
            TextAnalysis.markerCount(ws, ms).as(s"score_$l") }): _*)
      val en = col("score_en"); val es = col("score_es")
      val fr = col("score_fr"); val de = col("score_de")
      scored.withColumn("lang_pred",
        when(en >= es && en >= fr && en >= de && en > 0, "en")
          .when(es >= fr && es >= de && es > 0, "es")
          .when(fr >= de && fr > 0, "fr")
          .when(de > 0, "de")
          .otherwise("unknown"))
        .orderBy(col("doc_id"))
    }),

    // Position-weighted rolling-hash fingerprint (native hash expr).
    "q_doc_fingerprint" -> ((s, d) => {
      graft.expr.GraftFunctions.ensureRegistered(s)
      docs(s, d).select(col("doc_id"),
        TextAnalysis.fingerprint(split(col("text"), " "),
          w => call_function("graft_hash", w)).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // tf-idf top-5 terms per language.
    "q_tfidf_top_terms" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("score").desc, col("term"))
      TextAnalysis.tfidf(docs(s, d))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .select(col("lang"), col("term"), col("tf"), col("df"),
          col("score"), col("rn"))
        .orderBy(col("lang"), col("rn"))
    }),

    // Brute-force cosine top-5 per label centroid (exact ANN baseline).
    "q_embed_cosine_topk" -> ((s, d) =>
      VectorSearch.topKByCosine(
        emb(s, d).select(col("vec_id"), col("embedding")),
        VectorSearch.labelCentroids(emb(s, d)),
        "label", "centroid", 5)
        .select(col("label"), col("vec_id"), col("cos_sim"), col("rn"))
        .orderBy(col("label"), col("rn"))),

    // Embedding-quality outliers: the 3 members farthest (by cosine)
    // from their OWN label centroid — mislabeled or degenerate vectors
    // surface here first. Centroids broadcast, corpus unshuffled.
    "q_embed_outliers" -> ((s, d) =>
      VectorSearch.farthestFromCentroid(
        emb(s, d).select(col("vec_id"), col("label"), col("embedding")), 3)
        .orderBy(col("label"), col("rn"))),
  ) ++ ExtCurationQueries.queries ++ ExtServingQueries.queries ++
    ExtWebQueries.queries

  // ---------------------------------------------------------------
  // Oracle SQL twins.
  // ---------------------------------------------------------------

  private[ext] val dupSigSql =
    s"nsig AS (SELECT doc_id, sha256($normSqlExpr) AS sig FROM documents)"

  /** The window-function literal (q_sql_window_surface): named WINDOW
    * clause, ranking + offset functions, CAST-pinned BIGINT outputs —
    * one ANSI text, two engines, verbatim. */
  private[ext] val SqlWindowSurfaceSql: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(row_number() OVER w AS BIGINT) AS rn,
      |       CAST(rank() OVER w2 AS BIGINT) AS rnk,
      |       coalesce(lag(o_orderkey) OVER w, -1) AS prev_key
      |FROM orders
      |WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderkey),
      |       w2 AS (PARTITION BY o_custkey
      |              ORDER BY o_orderpriority, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** The LATERAL top-N-per-group literal (q_sql_lateral) — one ANSI
    * text, two engines, two independent dependent-join rewrites. */
  private[ext] val SqlLateralSql: String =
    """SELECT c_custkey, t.o_orderkey, t.cents
      |FROM customer,
      |LATERAL (
      |  SELECT o_orderkey,
      |         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY cents DESC, o_orderkey
      |  LIMIT 2
      |) t
      |WHERE c_custkey % 50 = 0
      |ORDER BY c_custkey, cents DESC, o_orderkey""".stripMargin

  /** The correlated-scalar-subquery literal (q_sql_correlated) — one
    * ANSI text, two engines, two independent decorrelations that must
    * agree row for row. */
  private[ext] val SqlCorrelatedSql: String =
    """WITH oc AS (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, cents
      |FROM oc o
      |WHERE cents > (SELECT 2.0 * (CAST(sum(o2.cents) AS DOUBLE)
      |                             / count(*))
      |               FROM oc o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** The three-valued-logic corner of the literal SQL surface
    * (q_sql_null_semantics): NOT IN against a set CONTAINING NULL is
    * never true for a non-member (x <> NULL is UNKNOWN), so the
    * NOT IN count collapses to 0 while the NOT EXISTS spelling — the
    * null-safe anti-join — counts real non-members, and IN stays
    * positive for members. The classic silent-wrong-answer trap when
    * porting between engines; scored here as one text both engines
    * must agree on, with a sentinel customer key (3·max, never an
    * order key) proving the non-member side. */
  private[ext] val SqlNullSemanticsSql: String =
    """WITH s AS (SELECT nullif(o_custkey, 1) AS k FROM orders),
      |probe AS (SELECT c_custkey AS ck FROM customer
      |          UNION ALL
      |          SELECT 3 * max(c_custkey) FROM customer)
      |SELECT
      |  (SELECT count(*) FROM probe WHERE ck NOT IN (SELECT k FROM s))
      |    AS n_not_in,
      |  (SELECT count(*) FROM probe p
      |   WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.k = p.ck))
      |    AS n_not_exists,
      |  (SELECT count(*) FROM probe WHERE ck IN (SELECT k FROM s))
      |    AS n_in""".stripMargin

  /** The GROUPING()-marker corner of the literal SQL surface
    * (q_sql_grouping): GROUPING SETS with grouping() flags
    * distinguishing "NULL because rolled up" from "NULL in the data"
    * — the disambiguation every BI layer on top of a lakehouse relies
    * on. NULLS FIRST is pinned explicitly: Spark's default null order
    * is NULLS FIRST ascending, DuckDB's is NULLS LAST, so an unpinned
    * ORDER BY over the rolled-up rows would shuffle the emitted order
    * between engines even with identical rows. */
  private[ext] val SqlGroupingSql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
      |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
      |       count(*) AS n,
      |       CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
      |            AS BIGINT) AS cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
      |                        (o_orderpriority), ())
      |ORDER BY g_pri, g_st,
      |         o_orderpriority NULLS FIRST,
      |         o_orderstatus NULLS FIRST""".stripMargin

  /** The recursive-CTE corner of the literal SQL surface
    * (q_sql_recursive): a month-spine generated by WITH RECURSIVE —
    * Spark 4 plans the recursion as UnionLoop (anchor + iterated
    * step, depth = month span, bounded by
    * spark.sql.cteRecursionLevelLimit), DuckDB as its recursive-CTE
    * operator — left-joined to the monthly order rollup so empty
    * months surface as explicit zero rows (the gapfill shape, but
    * driven by the SQL-standard recursion instead of sequence()).
    * The spine recurses on an INTEGER month index (year·12+month−1)
    * rather than DATE arithmetic: date+INTERVAL lands in different
    * types across engines (Spark DATE, DuckDB TIMESTAMP), while the
    * integer axis keeps every emitted column BIGINT. Recursion depth
    * is O(calendar span) — ~tens of iterations regardless of fact
    * volume, each a constant-size step; the 100-TB work lives
    * entirely in the ordinary monthly GROUP BY. The stop bound `hi`
    * rides THROUGH the recursion as a column (anchor selects the
    * (lo, hi) pair): with a scalar subquery bound instead, Spark
    * re-plans and re-executes the orders aggregate on EVERY
    * iteration (~80 × full agg ≈ 14 s warm at sf0.1); carried as a
    * column, each step is a pure projection of the previous row. */
  private[ext] val SqlRecursiveSql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(min(year(o_orderdate)*12 + month(o_orderdate) - 1)
      |              AS BIGINT) AS lo,
      |         CAST(max(year(o_orderdate)*12 + month(o_orderdate) - 1)
      |              AS BIGINT) AS hi
      |  FROM orders),
      |months AS (
      |  SELECT lo AS k, hi FROM bounds
      |  UNION ALL
      |  SELECT k + 1, hi FROM months WHERE k < hi),
      |agg AS (
      |  SELECT CAST(year(o_orderdate)*12 + month(o_orderdate) - 1
      |              AS BIGINT) AS k,
      |         count(*) AS n_orders,
      |         CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS cents
      |  FROM orders GROUP BY 1)
      |SELECT months.k AS month_idx,
      |       CAST(floor(months.k / 12.0) AS BIGINT) AS yr,
      |       months.k - CAST(floor(months.k / 12.0) AS BIGINT) * 12 + 1
      |         AS mth,
      |       coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
      |       coalesce(cents, CAST(0 AS BIGINT)) AS cents
      |FROM months LEFT JOIN agg ON months.k = agg.k
      |ORDER BY months.k""".stripMargin

  /** EXISTS decorrelation (q_sql_exists): late-shipment orders by
    * priority — TPC-H Q4's semi-join shape on this schema. Both
    * engines plan the correlated EXISTS as a left semi join on
    * l_orderkey with the date predicate riding as the join filter;
    * at 100 TB that is one key-partitioned semi join, and the count
    * per priority is a 5-group rollup. */
  private[ext] val SqlExistsSql: String =
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Bag-semantics set ops (q_sql_bag_setops): INTERSECT ALL keeps
    * min(m_a, m_b) copies per key, EXCEPT ALL keeps m_a − m_b — the
    * multiplicity arithmetic DISTINCT set ops erase. The customer-key
    * bags genuinely carry duplicates (a customer has many orders), so
    * the counts differ from the DISTINCT forms everywhere. */
  private[ext] val SqlBagSetopsSql: String =
    """WITH a AS (
      |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000),
      |b AS (
      |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      |SELECT op, k, count(*) AS n FROM (
      |  SELECT 'intersect_all' AS op, k FROM (
      |    SELECT k FROM a INTERSECT ALL SELECT k FROM b)
      |  UNION ALL
      |  SELECT 'except_all' AS op, k FROM (
      |    SELECT k FROM a EXCEPT ALL SELECT k FROM b))
      |GROUP BY 1, 2 ORDER BY op, k""".stripMargin

  /** One ANSI SQL text, two engines — q_sql_surface executes THIS
    * string via spark.sql and the driver executes it via DuckDB. */
  private[ext] val SqlSurfaceSql: String =
    """SELECT source, lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM documents
      |WHERE n_chars >= 100
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  /** Shared by q_incremental_dedup and its streaming twin. */
  private[ext] lazy val incrementalDedupSql: String =
    s"""WITH $dupSigSql,
       |inc AS (
       |  SELECT doc_id, sig,
       |         min(doc_id) OVER (PARTITION BY sig) AS first_batch
       |  FROM nsig WHERE doc_id % 10 = 7),
       |base AS (
       |  SELECT sig, min(doc_id) AS base_doc
       |  FROM nsig WHERE doc_id % 10 <> 7 GROUP BY 1)
       |SELECT i.doc_id,
       |       CASE WHEN b.base_doc IS NOT NULL THEN 'dup_of_base'
       |            WHEN i.doc_id <> i.first_batch THEN 'dup_in_batch'
       |            ELSE 'new' END AS status,
       |       CASE WHEN b.base_doc IS NOT NULL THEN b.base_doc
       |            WHEN i.doc_id <> i.first_batch THEN i.first_batch
       |            ELSE -1 END AS dup_of
       |FROM inc i LEFT JOIN base b USING (sig)
       |ORDER BY doc_id""".stripMargin

  private[ext] val candSql =
    s"""${Dedup.shinglesSql},
       |${Dedup.minhashBandMinsSql},
       |bmok AS (
       |  SELECT bandmins.* FROM bandmins
       |  JOIN (SELECT b, mh FROM bandmins GROUP BY 1, 2
       |        HAVING count(*) <= ${Dedup.MinhashBucketCap}) okb
       |    USING (b, mh)
       |),
       |cand AS (
       |  SELECT a.doc_id AS d1, b2.doc_id AS d2, count(*) AS bands
       |  FROM bmok a JOIN bmok b2
       |    ON a.b = b2.b AND a.mh = b2.mh AND a.doc_id < b2.doc_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** Exact-Jaccard rescore tail shared by the primary and rescue
    * candidate oracles: ≥2-band gate over `candCte`, distinct shingle
    * sets, pair intersection counts, and the final Jaccard projection
    * (mirrors [[Dedup.ngramJaccard]] term for term). Splice after a
    * chain that defines `shingles` and `candCte(d1, d2, bands)`. */
  private[ext] def jaccardRescoreSqlFrom(candCte: String,
                                    withContainment: Boolean = false): String = {
    val containCol =
      if (withContainment)
        ",\n       " + r4("CAST(coalesce(com.common, 0) AS DOUBLE) / " +
          "CAST(least(s1.n_sh, s2.n_sh) AS DOUBLE)") + "\n         AS containment"
      else ""
    s"""strong AS (SELECT d1, d2 FROM $candCte WHERE bands >= 2),
       |ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY 1),
       |com AS (
       |  SELECT c.d1, c.d2, count(*) AS common
       |  FROM strong c
       |  JOIN ds a  ON a.doc_id = c.d1
       |  JOIN ds b2 ON b2.doc_id = c.d2 AND b2.shingle = a.shingle
       |  GROUP BY 1, 2)
       |SELECT c.d1, c.d2, s1.n_sh AS c1, s2.n_sh AS c2,
       |       CAST(coalesce(com.common, 0) AS BIGINT) AS common,
       |       ${r4("CAST(coalesce(com.common, 0) AS DOUBLE) / " +
            "CAST(s1.n_sh + s2.n_sh - coalesce(com.common, 0) AS DOUBLE)")}
       |         AS jaccard$containCol
       |FROM strong c
       |JOIN sizes s1 ON s1.doc_id = c.d1
       |JOIN sizes s2 ON s2.doc_id = c.d2
       |LEFT JOIN com ON com.d1 = c.d1 AND com.d2 = c.d2
       |ORDER BY c.d1, c.d2""".stripMargin
  }

  /** SQ-rerank chain shared by q_ann_sq_rerank and q_ann_sq_recall
    * (references `ranked`/`expl` from [[ivfRankedCtes]]): IVF top-10
    * shortlist, per-dim quantizer stats, int8 dequantization, norms,
    * fixed-point dots, cosine scoring, ranking (final CTE
    * `sq_ranked`). */
  private[ext] lazy val sqChainCtes: String =
    s"""shortlist AS (
       |  SELECT qid, vec_id FROM ranked WHERE rn <= 10),
       |sstats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM expl GROUP BY 1),
       |deq AS (
       |  SELECT e.vec_id, e.i,
       |         s.mn + (CASE WHEN s.mx = s.mn THEN CAST(0 AS BIGINT)
       |                      ELSE CAST(floor((e.v - s.mn) / (s.mx - s.mn)
       |                                      * 255.0 + 0.5) AS BIGINT) END)
       |           / 255.0 * (s.mx - s.mn) AS dv
       |  FROM expl e JOIN sstats s USING (i)),
       |dqnorm AS (
       |  SELECT vec_id,
       |         CAST(sum(CAST(floor(dv*dv*1000000000000.0 + 0.5) AS BIGINT))
       |              AS DOUBLE) / 1000000000000.0 AS dn
       |  FROM deq GROUP BY 1),
       |sdots AS (
       |  SELECT sl.qid, sl.vec_id,
       |         CAST(sum(CAST(floor(q.dv*v.dv*1000000000000.0 + 0.5)
       |                       AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS dot
       |  FROM shortlist sl
       |  JOIN deq q ON q.vec_id = sl.qid
       |  JOIN deq v ON v.vec_id = sl.vec_id AND v.i = q.i
       |  GROUP BY 1, 2),
       |sq_scored AS (
       |  SELECT d.qid, d.vec_id,
       |         ${r4("CASE WHEN sqrt(nq.dn)*sqrt(nv.dn) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(nq.dn)*sqrt(nv.dn)) END")} AS sq_cos
       |  FROM sdots d
       |  JOIN dqnorm nq ON nq.vec_id = d.qid
       |  JOIN dqnorm nv ON nv.vec_id = d.vec_id),
       |sq_ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |                               ORDER BY sq_cos DESC, vec_id) AS rn
       |  FROM sq_scored)""".stripMargin

  /** Shared CTE chain for the IVF oracles: embedding explode,
    * label centroids, norms, assignment/probe cosines, candidate
    * scan, exact-cosine scoring and ranking (CTE `ranked`). */
  /** The IVF serving replay, with the centroid-training population
    * parameterizable (`centWhere`): q_ann_ivf trains on the full
    * corpus (`true`); q_ann_incremental freezes the quantizer on the
    * base slice while assignment/serving cover base+delta. */
  private[ext] def ivfRankedCtesCent(centWhere: String): String =
    s"""expl AS (
         |  SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |cent AS (
         |  SELECT CAST(label AS BIGINT) AS cell_id, i,
         |         (CAST(sum(CAST(floor(v*1000000000.0 + 0.5) AS BIGINT))
         |               AS DOUBLE) / count(*)) / 1000000000.0 AS cv
         |  FROM expl WHERE $centWhere GROUP BY 1, 2),
         |cnorm AS (
         |  SELECT cell_id,
         |         CAST(sum(CAST(floor(cv*cv*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS cn
         |  FROM cent GROUP BY 1),
         |enorm AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(v*v*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS en
         |  FROM expl GROUP BY 1),
         |acos AS (
         |  SELECT e.vec_id, c.cell_id,
         |         ${r4("CASE WHEN sqrt(cn)*sqrt(en) = 0.0 THEN 0.0 " +
              "ELSE (CAST(sum(CAST(floor(c.cv*e.v*1000000000000.0 + 0.5)" +
              " AS BIGINT)) AS DOUBLE)/1000000000000.0)" +
              "/(sqrt(cn)*sqrt(en)) END")} AS cell_cos
         |  FROM expl e
         |  JOIN cent c ON c.i = e.i
         |  JOIN cnorm ON cnorm.cell_id = c.cell_id
         |  JOIN enorm ON enorm.vec_id = e.vec_id
         |  GROUP BY e.vec_id, c.cell_id, cn, en),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT vec_id, cell_id,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY cell_cos DESC, cell_id) AS arn
         |    FROM acos) WHERE arn = 1),
         |probes AS (
         |  SELECT vec_id AS qid, cell_id FROM (
         |    SELECT vec_id, cell_id,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY cell_cos DESC, cell_id) AS prn
         |    FROM acos WHERE vec_id % 50 = 0) WHERE prn <= 2),
         |cand AS (
         |  SELECT p.qid, a.vec_id
         |  FROM probes p JOIN assign a ON a.cell_id = p.cell_id),
         |pdots AS (
         |  SELECT c.qid, c.vec_id,
         |         CAST(sum(CAST(floor(q.v*e.v*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS dot
         |  FROM cand c
         |  JOIN expl q ON q.vec_id = c.qid
         |  JOIN expl e ON e.vec_id = c.vec_id AND e.i = q.i
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.qid, d.vec_id,
         |         ${r4("CASE WHEN sqrt(nq.en)*sqrt(ne.en) = 0.0 THEN 0.0 " +
              "ELSE dot/(sqrt(nq.en)*sqrt(ne.en)) END")} AS cos_sim
         |  FROM pdots d
         |  JOIN enorm nq ON nq.vec_id = d.qid
         |  JOIN enorm ne ON ne.vec_id = d.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |                               ORDER BY cos_sim DESC, vec_id) AS rn
         |  FROM scored)""".stripMargin

  private[ext] lazy val ivfRankedCtes: String = ivfRankedCtesCent("true")

  /** Exact ground-truth side shared by the recall oracles: every
    * (panel query, corpus) pair through the same fixed-point dot/norm
    * chain as the serving paths, ranked to top-3 — defines `exact`.
    * References `expl`/`enorm` from [[ivfRankedCtes]]; queries come
    * from the fixed seeded `panel` ([[panelCte]]), so truth work is
    * O(PanelSize·N) on both engines. */
  private[ext] lazy val exactTop3Ctes: String =
    s"""$panelCte,
       |edots AS (
       |  SELECT q.vec_id AS qid, e.vec_id,
       |         CAST(sum(CAST(floor(q.v*e.v*1000000000000.0 + 0.5)
       |                       AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS dot
       |  FROM expl q
       |  JOIN panel ON panel.pqid = q.vec_id
       |  JOIN expl e ON e.i = q.i
       |  GROUP BY 1, 2),
       |escored AS (
       |  SELECT d.qid, d.vec_id,
       |         ${r4("CASE WHEN sqrt(nq.en)*sqrt(ne.en) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(nq.en)*sqrt(ne.en)) END")} AS cos_sim
       |  FROM edots d
       |  JOIN enorm nq ON nq.vec_id = d.qid
       |  JOIN enorm ne ON ne.vec_id = d.vec_id),
       |exact AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos_sim DESC, vec_id) AS ern
       |    FROM escored) WHERE ern <= 3)""".stripMargin

  /** Recall tail shared by the recall oracles: `exact` LEFT JOIN the
    * named served-results CTE → per-query n_hits + recall@3. */
  private[ext] def recallTail(served: String): String =
    s"""hits AS (
       |  SELECT x.qid,
       |         CAST(sum(CASE WHEN i.vec_id IS NULL THEN 0 ELSE 1 END)
       |              AS BIGINT) AS n_hits
       |  FROM exact x
       |  LEFT JOIN $served i ON i.qid = x.qid AND i.vec_id = x.vec_id
       |  GROUP BY 1)
       |SELECT qid, n_hits,
       |       ${r4("CAST(n_hits AS DOUBLE) / 3.0")} AS recall
       |FROM hits ORDER BY qid""".stripMargin

  /** Full IVF→PQ serving replay shared by q_ann_ivf_pq and its recall
    * twin: IVF ranked chain → 10-candidate `shortlist` → PQ chain →
    * ADC re-scores → `reranked`. CTE names of the two replays are
    * disjoint by construction. */
  private[ext] lazy val ivfPqCtes: String =
    s"""$ivfRankedCtes,
       |shortlist AS (SELECT qid, vec_id FROM ranked WHERE rn <= 10),
       |${pqChainCtes(dsub = VectorSearch.PqSubDim,
            ksub = VectorSearch.PqCodes, iters = VectorSearch.PqIters)},
       |adr AS (
       |  SELECT sl.qid, sl.vec_id,
       |         CAST(sum(t.d2) AS BIGINT) AS adist
       |  FROM shortlist sl
       |  JOIN codes k ON k.vec_id = sl.vec_id
       |  JOIN qd2 t ON t.vec_id = sl.qid AND t.sub = k.sub
       |            AND t.cell_id = k.cell_id
       |  GROUP BY 1, 2),
       |reranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |                               ORDER BY adist, vec_id) AS rn
       |  FROM adr)""".stripMargin

  /** Shared CTE chain for the rescue-pass oracles: primary band
    * minima → hot buckets (cap [[RescueCap]]) → hot shingles re-banded
    * with the second permutation family → capped candidates `rcand`. */
  /** Rescue chain MINUS the shingles/bandmins heads, so it can splice
    * after [[candSql]] (which defines the same heads) — the
    * q_lsh_recall oracle needs primary AND rescue candidates in one
    * WITH chain. */
  private[ext] lazy val rescueTailSql: String =
    s"""hot AS (SELECT b, mh FROM bandmins GROUP BY 1, 2
       |        HAVING count(*) > $RescueCap),
       |hotdocs AS (
       |  SELECT DISTINCT bandmins.doc_id
       |  FROM bandmins JOIN hot USING (b, mh)),
       |hotsh AS (
       |  SELECT s.doc_id, s.shingle
       |  FROM shingles s JOIN hotdocs USING (doc_id)),
       |${Dedup.bandMinsSqlFrom("hotsh", "rsig", "rbandmins",
                                Dedup.Bands, Dedup.Bands)},
       |rok AS (
       |  SELECT rbandmins.* FROM rbandmins
       |  JOIN (SELECT b, mh FROM rbandmins GROUP BY 1, 2
       |        HAVING count(*) <= $RescueCap) okb
       |    USING (b, mh)
       |),
       |rcand AS (
       |  SELECT a.doc_id AS d1, b2.doc_id AS d2, count(*) AS bands
       |  FROM rok a JOIN rok b2
       |    ON a.b = b2.b AND a.mh = b2.mh AND a.doc_id < b2.doc_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  private[ext] lazy val rescueCandSql: String =
    s"""${Dedup.shinglesSql},
       |${Dedup.minhashBandMinsSql},
       |$rescueTailSql""".stripMargin

  /** Shared CTE chain for the banded sign-LSH oracles: band buckets →
    * cap filter → candidate pairs → fixed-point cosine (`bcos`). */
  /** Banded sign-LSH candidate cosines as CTEs ending in
    * `${p}bcos(v1, v2, bands, cos_sim)`. `p` prefixes every CTE name
    * (so two corpora can coexist in one WITH list — the HNSW layer-1
    * replay runs this over the sampled subset) and `where` filters
    * the source rows. */
  private[ext] def bandedCosCtesFor(p: String, where: String,
      bands: Int = VectorSearch.DefaultBands,
      bits: Int = VectorSearch.DefaultBandBits): String = {
    val bandSelects = (0 until bands).map(b =>
      s"SELECT vec_id, CAST($b AS BIGINT) AS band, " +
        s"CAST(${VectorSearch.signBandBucketSql("embedding", b,
          bits)} AS BIGINT) AS bucket " +
        s"FROM embeddings $where").mkString(" UNION ALL ")
    s"""${p}bb AS ($bandSelects),
       |${p}ok AS (
       |  SELECT band, bucket FROM ${p}bb GROUP BY 1, 2
       |  HAVING count(*) <= ${VectorSearch.DefaultBucketCap}),
       |${p}kept AS (SELECT ${p}bb.* FROM ${p}bb
       |             JOIN ${p}ok USING (band, bucket)),
       |${p}cand AS (
       |  SELECT a.vec_id AS v1, b2.vec_id AS v2, count(*) AS bands
       |  FROM ${p}kept a JOIN ${p}kept b2
       |    ON a.band = b2.band AND a.bucket = b2.bucket
       |   AND a.vec_id < b2.vec_id
       |  GROUP BY 1, 2),
       |${p}cpairs AS (
       |  SELECT c.v1, c.v2, c.bands,
       |         e1.embedding AS e1, e2.embedding AS e2
       |  FROM ${p}cand c
       |  JOIN embeddings e1 ON e1.vec_id = c.v1
       |  JOIN embeddings e2 ON e2.vec_id = c.v2),
       |${p}terms AS (
       |  SELECT v1, v2, bands, i,
       |         CAST(e1[i] AS DOUBLE) AS x, CAST(e2[i] AS DOUBLE) AS y
       |  FROM ${p}cpairs, unnest(range(1, len(e1)+1)) AS t(i)),
       |${p}dots AS (
       |  SELECT v1, v2, bands,
       |         CAST(sum(CAST(floor(x*y*1000000000000.0 + 0.5) AS BIGINT))
       |              AS DOUBLE) / 1000000000000.0 AS dot,
       |         CAST(sum(CAST(floor(x*x*1000000000000.0 + 0.5) AS BIGINT))
       |              AS DOUBLE) / 1000000000000.0 AS nx,
       |         CAST(sum(CAST(floor(y*y*1000000000000.0 + 0.5) AS BIGINT))
       |              AS DOUBLE) / 1000000000000.0 AS ny
       |  FROM ${p}terms GROUP BY 1, 2, 3),
       |${p}bcos AS (
       |  SELECT v1, v2, bands,
       |         ${r4("CASE WHEN sqrt(nx)*sqrt(ny) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(nx)*sqrt(ny)) END")} AS cos_sim
       |  FROM ${p}dots)""".stripMargin
  }

  private[ext] lazy val bandedCosCtes: String = bandedCosCtesFor("", "")

  /** One beam-expansion round of a graph-ANN oracle: candidates =
    * previous beam ∪ its graph neighbors (UNION dedups, mirroring the
    * engine's distinct()), scored from the full score table, top-B
    * per query by (cos DESC, vec_id). Parametrized so the flat serve
    * and both HNSW layers share one definition. */
  private[ext] def beamRound(name: String, prev: String, graph: String,
                        beam: Int): String =
    s"""$name AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT c.qid, c.vec_id,
       |           row_number() OVER (PARTITION BY c.qid
       |                  ORDER BY s.cos_sim DESC, c.vec_id) AS rn
       |    FROM (SELECT qid, vec_id FROM $prev
       |          UNION
       |          SELECT b.qid, g.n AS vec_id
       |          FROM $prev b JOIN $graph g ON g.v = b.vec_id) c
       |    JOIN gscore s ON s.qid = c.qid AND s.vec_id = c.vec_id)
       |  WHERE rn <= $beam)""".stripMargin

  private[ext] def gBeamRound(r: Int): String =
    beamRound(s"gbeam$r", s"gbeam${r - 1}", "ggraph",
      VectorSearch.GraphBeam)

  /** Graph-ANN replay shared by q_ann_graph and its recall twin:
    * banded-LSH candidate cosines (bcos) → symmetrized top-K
    * neighbor graph → entry points → full query×corpus score table
    * (the ORACLE may brute-force; the engine never does — values
    * agree because the cosine formula is identical) → GraphRounds=4
    * beam rounds → `gserved` (top-3). MUST run under Oracle.mat():
    * each beam round
    * references its predecessor twice, so default CTE inlining goes
    * exponential in rounds. */
  /** Symmetrize + top-K cut of a `${p}bcos` pair table into a
    * neighbor graph `$name(v, n)` — shared by the layer-0 and
    * layer-1 graph builds. */
  private[ext] def knnGraphCtes(name: String, p: String): String =
    s"""${name}sym AS (
       |  SELECT v1 AS v, v2 AS n, cos_sim FROM ${p}bcos
       |  UNION ALL
       |  SELECT v2 AS v, v1 AS n, cos_sim FROM ${p}bcos),
       |$name AS (
       |  SELECT v, n FROM (
       |    SELECT v, n, row_number() OVER (PARTITION BY v
       |                   ORDER BY cos_sim DESC, n) AS rn
       |    FROM ${name}sym) WHERE rn <= ${VectorSearch.GraphK})"""
      .stripMargin

  /** The corpus-wide pieces every graph serve shares: banded-LSH
    * cosines → layer-0 graph (`ggraph`) + the brute-force score
    * table (`gscore` — the ORACLE may brute-force; the engine never
    * does, values agree because the cosine formula is identical). */
  private[ext] lazy val graphCoreCtes: String =
    s"""${bandedCosCtesFor("g0", "", VectorSearch.GraphBands,
          VectorSearch.GraphBandBits)},
       |${knnGraphCtes("ggraph", "g0")},
       |gexpl AS (
       |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
       |gnorm AS (
       |  SELECT vec_id,
       |         CAST(sum(CAST(floor(x*x*1000000000000.0 + 0.5) AS BIGINT))
       |              AS DOUBLE) / 1000000000000.0 AS en
       |  FROM gexpl GROUP BY 1),
       |gdots AS (
       |  SELECT q.vec_id AS qid, e.vec_id,
       |         CAST(sum(CAST(floor(q.x*e.x*1000000000000.0 + 0.5)
       |                       AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS dot
       |  FROM gexpl q JOIN gexpl e ON e.i = q.i
       |  WHERE q.vec_id % 50 = 0
       |  GROUP BY 1, 2),
       |gscore AS (
       |  SELECT d.qid, d.vec_id,
       |         ${r4("CASE WHEN sqrt(nq.en)*sqrt(ne.en) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(nq.en)*sqrt(ne.en)) END")} AS cos_sim
       |  FROM gdots d
       |  JOIN gnorm nq ON nq.vec_id = d.qid
       |  JOIN gnorm ne ON ne.vec_id = d.vec_id)""".stripMargin

  /** Seed beam `$name`: score the per-query entry rows of `$from`
    * (qid-less frames cross every query), cut to `beam`. */
  private[ext] def beamSeed(name: String, fromJoin: String,
                       beam: Int): String =
    s"""$name AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT s.qid, s.vec_id,
       |           row_number() OVER (PARTITION BY s.qid
       |                  ORDER BY s.cos_sim DESC, s.vec_id) AS rn
       |    FROM gscore s $fromJoin)
       |  WHERE rn <= $beam)""".stripMargin

  /** Final cut `$name`: re-score beam `$from`, keep top-`k`. */
  private[ext] def beamServe(name: String, from: String, k: Int): String =
    s"""$name AS (
       |  SELECT qid, vec_id, cos_sim, rn FROM (
       |    SELECT s.qid, s.vec_id, s.cos_sim,
       |           row_number() OVER (PARTITION BY s.qid
       |                  ORDER BY s.cos_sim DESC, s.vec_id) AS rn
       |    FROM $from b
       |    JOIN gscore s ON s.qid = b.qid AND s.vec_id = b.vec_id)
       |  WHERE rn <= $k)""".stripMargin

  private[ext] lazy val graphAnnCtes: String =
    s"""$graphCoreCtes,
       |gentry AS (SELECT vec_id FROM embeddings ORDER BY vec_id
       |           LIMIT ${VectorSearch.GraphEntries}),
       |${beamSeed("gbeam0", "JOIN gentry en ON en.vec_id = s.vec_id",
          VectorSearch.GraphBeam)},
       |${(1 to VectorSearch.GraphRounds).map(gBeamRound).mkString(",\n")},
       |${beamServe("gserved", s"gbeam${VectorSearch.GraphRounds}", 3)}"""
      .stripMargin

  /** Two-layer HNSW replay: layer-1 graph over the deterministic
    * `vec_id % ${VectorSearch.HnswSampleMod} = 0` subset (its own
    * banded-LSH build, prefix `s1`), a narrow-beam layer-1 descent,
    * then the layer-0 beam seeded by layer 1's final beam — exactly
    * [[VectorSearch.hnswTopK]]'s traversal, ending in `hserved`.
    * MUST run under Oracle.mat() (each beam round references its
    * predecessor twice). */
  private[ext] lazy val hnswCtes: String = {
    val l1b = VectorSearch.HnswL1Beam
    s"""$graphCoreCtes,
       |${bandedCosCtesFor("s1",
          s"WHERE vec_id % ${VectorSearch.HnswSampleMod} = 0",
          VectorSearch.GraphBands, VectorSearch.GraphBandBits)},
       |${knnGraphCtes("h1graph", "s1")},
       |h1entry AS (SELECT vec_id FROM embeddings
       |            WHERE vec_id % ${VectorSearch.HnswSampleMod} = 0
       |            ORDER BY vec_id LIMIT ${VectorSearch.GraphEntries}),
       |${beamSeed("h1beam0", "JOIN h1entry en ON en.vec_id = s.vec_id",
          l1b)},
       |${(1 to VectorSearch.HnswL1Rounds).map(r =>
          beamRound(s"h1beam$r", s"h1beam${r - 1}", "h1graph", l1b))
          .mkString(",\n")},
       |${beamSeed("h0beam0",
          s"JOIN h1beam${VectorSearch.HnswL1Rounds} en " +
            "ON en.qid = s.qid AND en.vec_id = s.vec_id",
          VectorSearch.GraphBeam)},
       |${(1 to VectorSearch.HnswL0Rounds).map(r =>
          beamRound(s"h0beam$r", s"h0beam${r - 1}", "ggraph",
            VectorSearch.GraphBeam)).mkString(",\n")},
       |${beamServe("hserved", s"h0beam${VectorSearch.HnswL0Rounds}", 3)}"""
      .stripMargin
  }

  /** The k-means train + final-assignment CTE chain, shared by the
    * q_ann_kmeans and q_semdedup oracles (NOTES round-8 lesson: big
    * CTE replays compose when factored with disjoint names): seeds →
    * `iters` rounds of (cell norms → assignment cosines → argmax →
    * fixed-point means) → `assign{iters}` = every vector's final
    * cell. Exposes `expl`, `enorm`, `acos{iters}`, `assign{iters}`
    * for tails. Every round's arithmetic mirrors
    * [[VectorSearch.kmeansCells]] term for term. */
  private[ext] def kmeansAssignCtes(k: Int, iters: Int): String = {
    val F12 = "1000000000000.0"
    def cnorm(r: Int) =
      s"""cnorm$r AS (
         |  SELECT cell_id,
         |         CAST(sum(CAST(floor(cv*cv*$F12 + 0.5) AS BIGINT))
         |              AS DOUBLE) / $F12 AS cn
         |  FROM cent$r GROUP BY 1)""".stripMargin
    def acos(r: Int) =
      s"""acos$r AS (
         |  SELECT e.vec_id, c.cell_id,
         |         ${r4("CASE WHEN sqrt(cn)*sqrt(en) = 0.0 THEN 0.0 " +
              s"ELSE (CAST(sum(CAST(floor(c.cv*e.v*$F12 + 0.5)" +
              s" AS BIGINT)) AS DOUBLE)/$F12)" +
              "/(sqrt(cn)*sqrt(en)) END")} AS cell_cos
         |  FROM expl e
         |  JOIN cent$r c ON c.i = e.i
         |  JOIN cnorm$r ON cnorm$r.cell_id = c.cell_id
         |  JOIN enorm ON enorm.vec_id = e.vec_id
         |  GROUP BY e.vec_id, c.cell_id, cn, en)""".stripMargin
    def assign(r: Int) =
      s"""assign$r AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT vec_id, cell_id,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY cell_cos DESC, cell_id) AS arn
         |    FROM acos$r) WHERE arn = 1)""".stripMargin
    def nextCent(r: Int) =
      s"""cent${r + 1} AS (
         |  SELECT a.cell_id, e.i,
         |         (CAST(sum(CAST(floor(e.v*1000000000.0 + 0.5) AS BIGINT))
         |               AS DOUBLE) / count(*)) / 1000000000.0 AS cv
         |  FROM assign$r a JOIN expl e ON e.vec_id = a.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    val rounds = (0 until iters).map(r =>
      Seq(cnorm(r), acos(r), assign(r), nextCent(r)).mkString(",\n"))
      .mkString(",\n")
    s"""expl AS (
       |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
       |enorm AS (
       |  SELECT vec_id,
       |         CAST(sum(CAST(floor(v*v*$F12 + 0.5) AS BIGINT))
       |              AS DOUBLE) / $F12 AS en
       |  FROM expl GROUP BY 1),
       |seeds AS (
       |  SELECT vec_id AS cell_id, embedding FROM embeddings
       |  ORDER BY vec_id LIMIT $k),
       |cent0 AS (
       |  SELECT cell_id, i, CAST(embedding[i] AS DOUBLE) AS cv
       |  FROM seeds, unnest(range(1, len(embedding)+1)) AS t(i)),
       |$rounds,
       |${cnorm(iters)},
       |${acos(iters)},
       |${assign(iters)}""".stripMargin
  }

  /** Generated oracle for q_embed_pca_power: centered long form →
    * `iters` power rounds (project, accumulate, normalize — each
    * fixed-point-snapped exactly as [[VectorSearch.topDirection]]). */
  private[ext] def pcaPowerOracle(iters: Int): String = {
    val F12 = "1000000000000.0"
    val F9 = "1000000000.0"
    val rounds = (0 until iters).map { r =>
      s"""ps$r AS (
         |  SELECT c.vec_id,
         |         CAST(sum(CAST(floor(c.cv*v.vi*$F12 + 0.5) AS BIGINT))
         |              AS DOUBLE)/$F12 AS s
         |  FROM cexp c JOIN pv$r v USING (i) GROUP BY 1),
         |pw$r AS (
         |  SELECT c.i,
         |         CAST(sum(CAST(floor(c.cv*ps$r.s*$F9 + 0.5) AS BIGINT))
         |              AS DOUBLE)/$F9 AS w
         |  FROM cexp c JOIN ps$r USING (vec_id) GROUP BY 1),
         |pn$r AS (
         |  SELECT sqrt(CAST(sum(CAST(floor(w*w*$F12 + 0.5) AS BIGINT))
         |              AS DOUBLE)/$F12) AS nr FROM pw$r),
         |pv${r + 1} AS MATERIALIZED (
         |  SELECT i, CASE WHEN nr = 0.0 THEN 0.0 ELSE w / nr END AS vi
         |  FROM pw$r CROSS JOIN pn$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH expl AS (
       |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
       |mexp AS MATERIALIZED (
       |  SELECT i, (CAST(sum(CAST(floor(v*$F9 + 0.5) AS BIGINT)) AS DOUBLE)
       |             / count(*)) / $F9 AS m
       |  FROM expl GROUP BY 1),
       |cexp AS MATERIALIZED (
       |  SELECT e.vec_id, e.i, e.v - m AS cv
       |  FROM expl e JOIN mexp USING (i)),
       |pdc AS (SELECT CAST(count(*) AS DOUBLE) AS dcnt FROM mexp),
       |pv0 AS (SELECT i, 1.0 / sqrt(dcnt) AS vi FROM mexp CROSS JOIN pdc),
       |$rounds
       |SELECT CAST(p.i AS BIGINT) AS dim, ${r4("m")} AS mean_v,
       |       ${r4("vi")} AS pc1
       |FROM pv$iters p JOIN mexp ON mexp.i = p.i
       |ORDER BY dim""".stripMargin
  }

  /** Generated oracle for q_semdedup: [[kmeansAssignCtes]] + the
    * within-cell pair/cosine/keeper tail + the hot-cell sub-split
    * rescue chain (u-prefixed CTEs — one k-means iteration scoped to
    * each over-cap cell, then the same pair/prior tail within
    * sub-cells that fit the cap), mirroring
    * [[VectorSearch.semDedupWithRescue]] term for term. */
  private[ext] def semDedupOracle(k: Int, iters: Int, tau: Double,
                             cap: Int, ksub: Int): String = {
    val F12 = "1000000000000.0"
    val F9 = "1000000000.0"
    // one sub-assignment round r over sub-centroids ucent{r}: norms,
    // member×sub-centroid cosines (same-cell only), argmax — the
    // kmeansAssignCtes round shape with a (cell_id, sub_id) key
    def subRound(r: Int) =
      s"""ucn$r AS (
         |  SELECT cell_id, sub_id,
         |         CAST(sum(CAST(floor(cv*cv*$F12 + 0.5) AS BIGINT))
         |              AS DOUBLE) / $F12 AS cn
         |  FROM ucent$r GROUP BY 1, 2),
         |uacos$r AS (
         |  SELECT h.vec_id, c.cell_id, c.sub_id,
         |         ${r4("CASE WHEN sqrt(cn)*sqrt(en) = 0.0 THEN 0.0 " +
              s"ELSE (CAST(sum(CAST(floor(c.cv*e.v*$F12 + 0.5)" +
              s" AS BIGINT)) AS DOUBLE)/$F12)" +
              "/(sqrt(cn)*sqrt(en)) END")} AS sub_cos
         |  FROM uhot h
         |  JOIN expl e ON e.vec_id = h.vec_id
         |  JOIN ucent$r c ON c.cell_id = h.cell_id AND c.i = e.i
         |  JOIN ucn$r ON ucn$r.cell_id = c.cell_id
         |   AND ucn$r.sub_id = c.sub_id
         |  JOIN enorm ON enorm.vec_id = h.vec_id
         |  GROUP BY h.vec_id, c.cell_id, c.sub_id, cn, en),
         |uassign$r AS MATERIALIZED (
         |  SELECT vec_id, cell_id, sub_id FROM (
         |    SELECT vec_id, cell_id, sub_id,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY sub_cos DESC, sub_id) AS arn
         |    FROM uacos$r) WHERE arn = 1)""".stripMargin
    s"""WITH ${kmeansAssignCtes(k, iters)},
       |okc AS (
       |  SELECT cell_id FROM assign$iters
       |  GROUP BY 1 HAVING count(*) <= $cap),
       |pairs AS (
       |  SELECT a1.cell_id, a1.vec_id AS v1, a2.vec_id AS v2
       |  FROM assign$iters a1
       |  JOIN assign$iters a2 ON a2.cell_id = a1.cell_id
       |   AND a1.vec_id < a2.vec_id
       |  JOIN okc ON okc.cell_id = a1.cell_id),
       |pdots AS (
       |  SELECT p.v1, p.v2,
       |         CAST(sum(CAST(floor(e1.v*e2.v*$F12 + 0.5) AS BIGINT))
       |              AS DOUBLE) / $F12 AS dot
       |  FROM pairs p
       |  JOIN expl e1 ON e1.vec_id = p.v1
       |  JOIN expl e2 ON e2.vec_id = p.v2 AND e2.i = e1.i
       |  GROUP BY 1, 2),
       |pcos AS (
       |  SELECT v1, v2,
       |         ${r4("CASE WHEN sqrt(n1.en)*sqrt(n2.en) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(n1.en)*sqrt(n2.en)) END")} AS cos_sim
       |  FROM pdots
       |  JOIN enorm n1 ON n1.vec_id = v1
       |  JOIN enorm n2 ON n2.vec_id = v2),
       |prior AS (
       |  SELECT v2 AS vec_id,
       |         CAST(sum(CASE WHEN cos_sim >= $tau THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_prior,
       |         max(cos_sim) AS max_prior_cos
       |  FROM pcos GROUP BY 1),
       |uhot AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell_id FROM assign$iters a
       |  JOIN (SELECT cell_id FROM assign$iters
       |        GROUP BY 1 HAVING count(*) > $cap) hc
       |    ON hc.cell_id = a.cell_id),
       |useed AS (
       |  SELECT cell_id, vec_id AS sub_id FROM (
       |    SELECT cell_id, vec_id,
       |           row_number() OVER (PARTITION BY cell_id
       |                              ORDER BY vec_id) AS srn
       |    FROM uhot) WHERE srn <= $ksub),
       |ucent0 AS MATERIALIZED (
       |  SELECT s.cell_id, s.sub_id, e.i, e.v AS cv
       |  FROM useed s JOIN expl e ON e.vec_id = s.sub_id),
       |${subRound(0)},
       |ucent1 AS MATERIALIZED (
       |  SELECT a.cell_id, a.sub_id, e.i,
       |         (CAST(sum(CAST(floor(e.v*$F9 + 0.5) AS BIGINT))
       |               AS DOUBLE) / count(*)) / $F9 AS cv
       |  FROM uassign0 a JOIN expl e ON e.vec_id = a.vec_id
       |  GROUP BY 1, 2, 3),
       |${subRound(1)},
       |usok AS (
       |  SELECT cell_id, sub_id FROM uassign1
       |  GROUP BY 1, 2 HAVING count(*) <= $cap),
       |upairs AS (
       |  SELECT a1.vec_id AS v1, a2.vec_id AS v2
       |  FROM uassign1 a1
       |  JOIN uassign1 a2 ON a2.cell_id = a1.cell_id
       |   AND a2.sub_id = a1.sub_id AND a1.vec_id < a2.vec_id
       |  JOIN usok ON usok.cell_id = a1.cell_id
       |   AND usok.sub_id = a1.sub_id),
       |updots AS (
       |  SELECT p.v1, p.v2,
       |         CAST(sum(CAST(floor(e1.v*e2.v*$F12 + 0.5) AS BIGINT))
       |              AS DOUBLE) / $F12 AS dot
       |  FROM upairs p
       |  JOIN expl e1 ON e1.vec_id = p.v1
       |  JOIN expl e2 ON e2.vec_id = p.v2 AND e2.i = e1.i
       |  GROUP BY 1, 2),
       |upcos AS (
       |  SELECT v1, v2,
       |         ${r4("CASE WHEN sqrt(n1.en)*sqrt(n2.en) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(n1.en)*sqrt(n2.en)) END")} AS cos_sim
       |  FROM updots
       |  JOIN enorm n1 ON n1.vec_id = v1
       |  JOIN enorm n2 ON n2.vec_id = v2),
       |uprior AS (
       |  SELECT v2 AS vec_id,
       |         CAST(sum(CASE WHEN cos_sim >= $tau THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_prior,
       |         max(cos_sim) AS max_prior_cos
       |  FROM upcos GROUP BY 1),
       |uresc AS (
       |  SELECT a.vec_id,
       |         COALESCE(up.n_prior, 0) AS n_prior,
       |         COALESCE(up.max_prior_cos, -2.0) AS max_prior_cos,
       |         CASE WHEN usok.cell_id IS NOT NULL THEN 1 ELSE 0 END
       |           AS rescued
       |  FROM uassign1 a
       |  LEFT JOIN uprior up ON up.vec_id = a.vec_id
       |  LEFT JOIN usok ON usok.cell_id = a.cell_id
       |   AND usok.sub_id = a.sub_id)
       |SELECT a.vec_id, a.cell_id,
       |       CAST(CASE WHEN r.rescued = 1 THEN r.n_prior
       |                 ELSE COALESCE(p.n_prior, 0) END AS BIGINT)
       |         AS n_prior,
       |       CASE WHEN r.rescued = 1 THEN r.max_prior_cos
       |            ELSE COALESCE(p.max_prior_cos, -2.0) END
       |         AS max_prior_cos,
       |       CAST(CASE WHEN r.rescued = 1 THEN
       |                   CASE WHEN r.n_prior > 0 THEN 1 ELSE 0 END
       |                 WHEN COALESCE(p.n_prior, 0) > 0 THEN 1
       |                 ELSE 0 END AS BIGINT) AS is_dup,
       |       CASE WHEN okc.cell_id IS NULL THEN CAST(1 AS BIGINT)
       |            ELSE CAST(0 AS BIGINT) END AS over_cap,
       |       CAST(COALESCE(r.rescued, 0) AS BIGINT) AS rescued
       |FROM assign$iters a
       |LEFT JOIN prior p USING (vec_id)
       |LEFT JOIN okc ON okc.cell_id = a.cell_id
       |LEFT JOIN uresc r ON r.vec_id = a.vec_id
       |ORDER BY vec_id""".stripMargin
  }

  /** Generated oracle for q_ann_kmeans: [[kmeansAssignCtes]] + the
    * same IVF probe/scan tail as q_ann_ivf over the final
    * centroids. */
  /** The kmeans-IVF serving chain (probes → cand → scored → ranked),
    * optionally label-filtered at the cand stage — shared by
    * q_ann_kmeans, q_ann_filtered, and the filtered-recall oracle.
    * References [[kmeansAssignCtes]]'s `expl`/`enorm`/`acos`/`assign`.
    */
  private[ext] def kmeansIvfChain(k: Int, iters: Int,
                             labelFiltered: Boolean): String = {
    val F12 = "1000000000000.0"
    val candJoin =
      if (labelFiltered)
        """|  JOIN embeddings le ON le.vec_id = a.vec_id
           |  JOIN embeddings qe ON qe.vec_id = p.qid
           |   AND le.label = qe.label""".stripMargin
      else ""
    s"""${kmeansAssignCtes(k, iters)},
       |probes AS (
       |  SELECT vec_id AS qid, cell_id FROM (
       |    SELECT vec_id, cell_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY cell_cos DESC, cell_id) AS prn
       |    FROM acos$iters WHERE vec_id % 50 = 0) WHERE prn <= 2),
       |cand AS (
       |  SELECT p.qid, a.vec_id
       |  FROM probes p JOIN assign$iters a ON a.cell_id = p.cell_id
       |$candJoin),
       |pdots AS (
       |  SELECT c.qid, c.vec_id,
       |         CAST(sum(CAST(floor(q.v*e.v*$F12 + 0.5) AS BIGINT))
       |              AS DOUBLE) / $F12 AS dot
       |  FROM cand c
       |  JOIN expl q ON q.vec_id = c.qid
       |  JOIN expl e ON e.vec_id = c.vec_id AND e.i = q.i
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.qid, d.vec_id,
       |         ${r4("CASE WHEN sqrt(nq.en)*sqrt(ne.en) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(nq.en)*sqrt(ne.en)) END")} AS cos_sim
       |  FROM pdots d
       |  JOIN enorm nq ON nq.vec_id = d.qid
       |  JOIN enorm ne ON ne.vec_id = d.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |                               ORDER BY cos_sim DESC, vec_id) AS rn
       |  FROM scored)""".stripMargin
  }

  private[ext] def kmeansIvfOracle(k: Int, iters: Int,
                              labelFiltered: Boolean = false): String =
    s"""WITH ${kmeansIvfChain(k, iters, labelFiltered)}
       |SELECT qid, vec_id, cos_sim, rn
       |FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** Label-filtered exact top-3 — the ground-truth side of
    * q_ann_filtered_recall (exactTop3Ctes with the same label
    * constraint the served side applies). References `expl`/`enorm`.
    */
  private[ext] lazy val exactTop3FilteredCtes: String =
    s"""$panelCte,
       |edots AS (
       |  SELECT q.vec_id AS qid, e.vec_id,
       |         CAST(sum(CAST(floor(q.v*e.v*1000000000000.0 + 0.5)
       |                       AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS dot
       |  FROM expl q
       |  JOIN panel ON panel.pqid = q.vec_id
       |  JOIN expl e ON e.i = q.i
       |  JOIN embeddings le ON le.vec_id = e.vec_id
       |  JOIN embeddings qe ON qe.vec_id = q.vec_id
       |   AND le.label = qe.label
       |  GROUP BY 1, 2),
       |escored AS (
       |  SELECT d.qid, d.vec_id,
       |         ${r4("CASE WHEN sqrt(nq.en)*sqrt(ne.en) = 0.0 THEN 0.0 " +
            "ELSE dot/(sqrt(nq.en)*sqrt(ne.en)) END")} AS cos_sim
       |  FROM edots d
       |  JOIN enorm nq ON nq.vec_id = d.qid
       |  JOIN enorm ne ON ne.vec_id = d.vec_id),
       |exact AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos_sim DESC, vec_id) AS ern
       |    FROM escored) WHERE ern <= 3)""".stripMargin

  /** Generated oracle for q_ann_pq: per-subspace seeds → `iters`
    * rounds of (exact integer L2 argmin → fixed-point means) → corpus
    * codes → per-query distance tables → ADC ranking. Mirrors
    * [[VectorSearch.pqTrain]]/[[VectorSearch.pqAdcTopK]] term for
    * term; distances are 1e-12-unit BIGINTs on both engines, so no
    * rounding discipline is needed past the snapping floor. */
  private[ext] def pqAdcOracle(m: Int, dsub: Int, ksub: Int, iters: Int): String =
    s"""WITH ${pqChainCtes(dsub, ksub, iters)},
       |ad AS (
       |  SELECT t.vec_id AS qid, k.vec_id,
       |         CAST(sum(t.d2) AS BIGINT) AS adist
       |  FROM codes k
       |  JOIN qd2 t ON t.sub = k.sub AND t.cell_id = k.cell_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |                               ORDER BY adist, vec_id) AS rn
       |  FROM ad)
       |SELECT qid, vec_id, adist, rn
       |FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** The PQ training/encoding CTE chain shared by the full-scan ADC
    * oracle and the IVF-PQ composition: subvector explode → seeds →
    * `iters` k-means rounds → corpus `codes` (vec_id, sub, cell_id) →
    * per-query distance tables `qd2`. Mirrors
    * [[VectorSearch.pqTrain]]/[[VectorSearch.pqEncode]] term for
    * term. */
  private[ext] def pqChainCtes(dsub: Int, ksub: Int, iters: Int): String = {
    val F12 = "1000000000000.0"
    def d2(name: String, centName: String, filter: String) =
      s"""$name AS (
         |  SELECT e.vec_id, e.sub, c.cell_id,
         |         sum(CAST(floor((e.v-c.cv)*(e.v-c.cv)*$F12 + 0.5)
         |             AS BIGINT)) AS d2
         |  FROM sexpl e
         |  JOIN $centName c ON c.sub = e.sub AND c.j = e.j
         |  $filter
         |  GROUP BY 1, 2, 3)""".stripMargin
    def asg(name: String, d2Name: String) =
      s"""$name AS (
         |  SELECT vec_id, sub, cell_id FROM (
         |    SELECT vec_id, sub, cell_id,
         |           row_number() OVER (PARTITION BY vec_id, sub
         |                              ORDER BY d2, cell_id) AS arn
         |    FROM $d2Name) WHERE arn = 1)""".stripMargin
    def nextCent(r: Int) =
      s"""cent${r + 1} AS (
         |  SELECT a.sub, a.cell_id, e.j,
         |         (CAST(sum(CAST(floor(e.v*1000000000.0 + 0.5) AS BIGINT))
         |               AS DOUBLE) / count(*)) / 1000000000.0 AS cv
         |  FROM pasg$r a
         |  JOIN sexpl e ON e.vec_id = a.vec_id AND e.sub = a.sub
         |  GROUP BY 1, 2, 3)""".stripMargin
    val rounds = (0 until iters).map(r =>
      Seq(d2(s"pd2$r", s"cent$r", ""), asg(s"pasg$r", s"pd2$r"),
        nextCent(r)).mkString(",\n")).mkString(",\n")
    s"""sexpl AS (
       |  SELECT vec_id, (i-1) // $dsub AS sub, (i-1) % $dsub AS j,
       |         CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
       |seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $ksub),
       |cent0 AS (
       |  SELECT e.sub, s.vec_id AS cell_id, e.j, e.v AS cv
       |  FROM sexpl e JOIN seeds s ON s.vec_id = e.vec_id),
       |$rounds,
       |${d2(s"pd2$iters", s"cent$iters", "")},
       |${asg("codes", s"pd2$iters")},
       |${d2("qd2", s"cent$iters", "WHERE e.vec_id % 50 = 0")}""".stripMargin
  }

  /** Shared CTE chain for the bigram-LM oracles (`agg` carries the
    * per-doc n_bigrams / sum_nl2fx) — the exact twin of
    * [[lmDocScores]]. */
  private[ext] lazy val lmAggCtes: String =
    s"""ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |docbg AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, len(w)), i -> w[i]))
       |           AS w1,
       |         unnest(list_transform(range(1, len(w)),
       |           i -> w[i] || ' ' || w[i+1])) AS bg
       |  FROM ws WHERE len(w) >= 2),
       |bgc AS (SELECT bg, count(*) AS c12 FROM docbg GROUP BY 1),
       |ugc AS (
       |  SELECT w1, count(*) AS c1 FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
       |  GROUP BY 1),
       |vv AS (SELECT count(*) AS v FROM ugc),
       |j AS (
       |  SELECT d.doc_id,
       |         GREATEST(((b.c12 + 1) * ${LmScore.PScale}) // (u.c1 + vv.v),
       |                  1) AS pfx
       |  FROM docbg d JOIN bgc b USING (bg) JOIN ugc u USING (w1)
       |  CROSS JOIN vv),
       |se AS (SELECT doc_id, pfx, length(bin(pfx)) AS e FROM j),
       |nl AS (
       |  SELECT doc_id,
       |         ${LmScore.L9Fx} - (e - 1) * ${LmScore.LogScale}
       |           - (${LmScore.log2TableSql}[
       |               CAST((pfx * ${LmScore.MScale})
       |                 // (CAST(1 AS BIGINT) << (e - 1))
       |                 AS INTEGER) - ${LmScore.MScale - 1}]) AS nl2
       |  FROM se),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |         CAST(sum(nl2) AS BIGINT) AS sum_nl2fx
       |  FROM nl GROUP BY 1)""".stripMargin

  /** Shared CTE chain for the quality-score oracles (`quals` carries
    * the final per-doc quality). */
  private[ext] lazy val qualityCtes: String =
    s"""ws AS (
       |  SELECT doc_id, n_chars, text, string_split(text, ' ') AS w
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, n_chars,
       |         CAST(len(w) AS BIGINT) AS n_words,
       |         ${TextAnalysis.markerCountSql(Seq("the", "a", "and", "of"))}
       |           AS n_stop,
       |         ${r4("CAST(length(text) - len(w) + 1 AS DOUBLE) / len(w)")}
       |           AS avg_wlen
       |  FROM ws),
       |rs AS (
       |  SELECT *, ${r4("CAST(n_stop AS DOUBLE) / n_words")} AS stop_ratio
       |  FROM base),
       |quals AS (
       |  SELECT *, ${r4("0.3*least(CAST(n_words AS DOUBLE)/50.0, 1.0)" +
            " + 0.4*(1.0 - stop_ratio)" +
            " + 0.3*least(avg_wlen/10.0, 1.0)")} AS quality
       |  FROM rs)""".stripMargin

  private[ext] lazy val decontamOracleSql: String =
    s"""WITH ${Dedup.shinglesSql},
       |ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
       |bench AS (SELECT shingle, doc_id AS bench_doc FROM ds
       |          WHERE doc_id % 20 = 0),
       |train AS (SELECT * FROM ds WHERE doc_id % 20 <> 0)
       |SELECT t.doc_id,
       |       count(DISTINCT t.shingle) AS n_hit_shingles,
       |       count(DISTINCT b.bench_doc) AS n_bench_docs
       |FROM train t JOIN bench b ON b.shingle = t.shingle
       |GROUP BY 1 ORDER BY t.doc_id""".stripMargin

  /** The exact-3-NN prediction chain (kexpl→kpred), shared by the
    * q_knn_classify and q_label_noise oracles. */
  private[ext] lazy val knnPredCtes: String =
    s"""kexpl AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label, i,
         |         CAST(embedding[i] AS DOUBLE) AS v
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |knorm AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(v*v*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE)
         |           / 1000000000000.0 AS en
         |  FROM kexpl GROUP BY 1),
         |$panelCte,
         |kdots AS (
         |  SELECT q.vec_id AS qid, e.vec_id,
         |         CAST(sum(CAST(floor(q.v*e.v*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE)
         |           / 1000000000000.0 AS dot
         |  FROM kexpl q
         |  JOIN panel ON panel.pqid = q.vec_id
         |  JOIN kexpl e ON e.i = q.i
         |  WHERE e.vec_id != q.vec_id
         |  GROUP BY 1, 2),
         |kscored AS (
         |  SELECT d.qid, d.vec_id,
         |         ${r4("CASE WHEN sqrt(nq.en)*sqrt(ne.en) = 0.0 THEN 0.0 " +
              "ELSE dot/(sqrt(nq.en)*sqrt(ne.en)) END")} AS cos_sim
         |  FROM kdots d
         |  JOIN knorm nq ON nq.vec_id = d.qid
         |  JOIN knorm ne ON ne.vec_id = d.vec_id),
         |ktop AS (
         |  SELECT qid, vec_id, rn FROM (
         |    SELECT qid, vec_id,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY cos_sim DESC, vec_id) AS rn
         |    FROM kscored) WHERE rn <= 3),
         |kvotes AS (
         |  SELECT t.qid, CAST(lab.label AS BIGINT) AS label,
         |         count(*) AS n_votes, min(t.rn) AS best_rn
         |  FROM ktop t JOIN embeddings lab ON lab.vec_id = t.vec_id
         |  GROUP BY 1, 2),
         |kpred AS (
         |  SELECT qid, label AS pred_label FROM (
         |    SELECT qid, label,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY n_votes DESC, best_rn,
         |                                       label) AS vr
         |    FROM kvotes) WHERE vr = 1)""".stripMargin

  /** Shared ER replay CTEs (EntityResolution.scala, twin-for-twin):
    * dirty three-source view → normalization → two capped blocking
    * passes → comparator edges → recursive min-label CC → per-record
    * (attrs, cluster_id) frame `j`. Recursive, so callers prepend
    * WITH RECURSIVE and must NOT Oracle.mat() the text. */
  private[ext] lazy val erCtes: String =
    s"""recs AS (
       |  SELECT c_custkey*4 AS rec_id, 'reg' AS src, c_name AS name_raw,
       |         CAST(c_nationkey AS BIGINT) AS nation,
       |         c_mktsegment AS seg, c_custkey AS true_key
       |  FROM customer
       |  UNION ALL
       |  SELECT c_custkey*4+1, 'crm',
       |         'CUST-' || lpad(CAST(c_custkey+1 AS VARCHAR), 9, '0'),
       |         CAST(c_nationkey AS BIGINT), c_mktsegment, c_custkey
       |  FROM customer WHERE c_custkey % 3 = 0
       |  UNION ALL
       |  SELECT c_custkey*4+2, 'bill',
       |         'acct ' || CASE WHEN regexp_replace(substr(c_name, 10),
       |                                             '^0+', '') = ''
       |                         THEN '0'
       |                         ELSE regexp_replace(substr(c_name, 10),
       |                                             '^0+', '') END,
       |         CAST(c_nationkey AS BIGINT), c_mktsegment, c_custkey
       |  FROM customer WHERE c_custkey % 5 = 0),
       |nv AS (
       |  SELECT *, CAST(mnorm AS BIGINT) AS numval FROM (
       |    SELECT *, CASE WHEN regexp_replace(regexp_replace(name_raw,
       |                          '[^0-9]', '', 'g'), '^0+', '') = ''
       |                   THEN '0'
       |                   ELSE regexp_replace(regexp_replace(name_raw,
       |                          '[^0-9]', '', 'g'), '^0+', '') END AS mnorm
       |    FROM recs)),
       |passes AS (
       |  SELECT 'n:' || nation || ':' || (numval // 10) AS bk, rec_id
       |  FROM nv
       |  UNION ALL
       |  SELECT 's:' || seg || ':' || (numval // 100) AS bk, rec_id
       |  FROM nv),
       |keepb AS (
       |  SELECT bk FROM passes GROUP BY bk
       |  HAVING count(*) <= ${EntityResolution.BlockCap}),
       |kp AS (SELECT p.bk, p.rec_id FROM passes p JOIN keepb USING (bk)),
       |cand AS (
       |  SELECT DISTINCT a.rec_id AS r1, b.rec_id AS r2
       |  FROM kp a JOIN kp b ON a.bk = b.bk AND a.rec_id < b.rec_id),
       |eredges AS (
       |  SELECT c.r1 AS d1, c.r2 AS d2
       |  FROM cand c
       |  JOIN nv x ON x.rec_id = c.r1
       |  JOIN nv y ON y.rec_id = c.r2
       |  WHERE x.nation = y.nation AND x.seg = y.seg
       |    AND levenshtein(x.mnorm, y.mnorm) <= 1),
       |ersym AS (
       |  SELECT d1 AS esrc, d2 AS edst FROM eredges
       |  UNION ALL
       |  SELECT d2, d1 FROM eredges),
       |ercc AS (
       |  SELECT rec_id AS node, rec_id AS label FROM nv
       |  UNION
       |  SELECT ersym.edst, ercc.label
       |  FROM ercc JOIN ersym ON ercc.node = ersym.esrc),
       |erlab AS (
       |  SELECT node AS rec_id, min(label) AS cluster_id
       |  FROM ercc GROUP BY 1),
       |j AS (
       |  SELECT n.*, l.cluster_id FROM nv n
       |  JOIN erlab l ON l.rec_id = n.rec_id)""".stripMargin

  /** The seven ANN serving variants priced by q_ann_frontier, each
    * measured through its existing recall twin — serving, recall
    * measurement and frontier share every constant by construction
    * (VERDICT r10 #5). */
  private[ext] val FrontierVariants: Seq[(String, String)] = Seq(
    "filtered" -> "q_ann_filtered_recall",
    "graph" -> "q_ann_graph_recall",
    "hnsw" -> "q_ann_hnsw_recall",
    "ivf" -> "q_ann_recall",
    "ivf_pq" -> "q_ann_ivf_pq_recall",
    "sq" -> "q_ann_sq_recall",
    "truncated" -> "q_ann_truncated_recall")

  private[ext] lazy val oraclesBase: Map[String, String] = Map(
    "q_dedup_exact" ->
      s"""WITH $dupSigSql
         |SELECT sig, count(*) AS cnt, min(doc_id) AS min_doc,
         |       max(doc_id) AS max_doc
         |FROM nsig GROUP BY 1 HAVING count(*) > 1 ORDER BY sig""".stripMargin,

    // Per-stratum card: quality CTEs per doc + corpus-wide dup-sig
    // counts, aggregated with the same fixed-point quality sum as the
    // Spark side.
    "q_dataset_card" ->
      s"""WITH $qualityCtes,
         |$dupSigSql,
         |sc AS (SELECT sig, count(*) AS sc FROM nsig GROUP BY 1),
         |per AS (
         |  SELECT d.source, d.lang, q.doc_id, d.n_chars, q.n_words,
         |         q.quality,
         |         CASE WHEN sc.sc > 1 THEN 1 ELSE 0 END AS isdup
         |  FROM documents d
         |  JOIN quals q ON q.doc_id = d.doc_id
         |  JOIN nsig ON nsig.doc_id = d.doc_id
         |  JOIN sc ON sc.sig = nsig.sig)
         |SELECT source, lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
         |       CAST(sum(n_words) AS BIGINT) AS n_words_total,
         |       ${r4("CAST(sum(CAST(floor(quality*10000.0 + 0.5) AS BIGINT))" +
              " AS DOUBLE) / 10000.0 / CAST(count(*) AS DOUBLE)")}
         |         AS quality_mean,
         |       CAST(sum(isdup) AS BIGINT) AS n_dup_docs,
         |       ${r4("CAST(sum(isdup) AS DOUBLE) / CAST(count(*) AS DOUBLE)")}
         |         AS dup_pct
         |FROM per GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The LITERAL string the Spark side executes.
    "q_sql_surface" -> SqlSurfaceSql,
    "q_sql_window_surface" -> SqlWindowSurfaceSql,
    "q_sql_correlated" -> SqlCorrelatedSql,
    "q_sql_null_semantics" -> SqlNullSemanticsSql,
    "q_sql_grouping" -> SqlGroupingSql,
    "q_sql_recursive" -> SqlRecursiveSql,
    "q_sql_bag_setops" -> SqlBagSetopsSql,
    "q_sql_exists" -> SqlExistsSql,

    // Prefix top-k: same collapse-then-rank replay.
    "q_prefix_topk" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |counts AS (
        |  SELECT substring(w, 1, 3) AS prefix, w, count(*) AS n
        |  FROM w WHERE len(w) >= 3 GROUP BY 1, 2),
        |ranked AS (
        |  SELECT prefix, w, n,
        |         CAST(row_number() OVER (PARTITION BY prefix
        |           ORDER BY n DESC, w) AS BIGINT) AS rank
        |  FROM counts)
        |SELECT prefix, w, n, rank FROM ranked WHERE rank <= 3
        |ORDER BY prefix, rank""".stripMargin,
    "q_sql_lateral" -> SqlLateralSql,

    // The parquet-side summary with the tag expression recomputed —
    // if the CSV write→quote→parse path preserved every field, the
    // two sides agree (the embedded comma in tag is the trap).
    "q_csv_roundtrip" ->
      s"""SELECT lang, count(*) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(${PortableHash.spreadSql(
                  PortableHash.hSql("text"))}) AS BIGINT) AS text_hash_sum,
         |       CAST(sum(${PortableHash.spreadSql(
                  PortableHash.hSql("source || ',' || lang"))}) AS BIGINT)
         |         AS tag_hash_sum
         |FROM documents
         |GROUP BY 1 ORDER BY lang""".stripMargin,

    // Schema drift: the expected merged-read summary replayed from
    // the base table — gen and quality both derive from the
    // deterministic doc_id % 2 generation split.
    "q_schema_drift" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END)
        |            AS BIGINT) AS gen_sum,
        |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_quality,
        |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 7
        |                     ELSE 0 END) AS BIGINT) AS quality_sum,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    // The parquet-side summary: if the engine's JSONL write→read
    // path preserved every row and byte, the two sides agree.
    "q_jsonl_roundtrip" ->
      s"""SELECT source, lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(${PortableHash.spreadSql(
                  PortableHash.hSql("text"))}) AS BIGINT) AS text_hash_sum
         |FROM documents
         |GROUP BY 1, 2 ORDER BY source, lang""".stripMargin,

    "q_dedup_keep_first" ->
      s"""WITH $dupSigSql,
         |k AS (SELECT sig, min(doc_id) AS keeper FROM nsig GROUP BY 1)
         |SELECT n.doc_id, k.keeper, n.sig
         |FROM nsig n JOIN k USING (sig)
         |WHERE n.doc_id != k.keeper ORDER BY n.doc_id""".stripMargin,

    // Keeper = argmax (quality, -doc_id) per signature group —
    // qualityCtes and dupSigSql compose (disjoint CTE names, the
    // q_dataset_card precedent).
    "q_dedup_keep_best" ->
      s"""WITH $qualityCtes,
         |$dupSigSql,
         |jq AS (
         |  SELECT n.doc_id, n.sig, q.quality
         |  FROM nsig n JOIN quals q USING (doc_id)),
         |k AS (
         |  SELECT sig, doc_id AS keeper, quality AS keeper_quality
         |  FROM (
         |    SELECT sig, doc_id, quality,
         |           row_number() OVER (PARTITION BY sig
         |                              ORDER BY quality DESC, doc_id) AS rn
         |    FROM jq) WHERE rn = 1)
         |SELECT j.doc_id, j.quality, k.keeper, k.keeper_quality, j.sig
         |FROM jq j JOIN k USING (sig)
         |WHERE j.doc_id != k.keeper ORDER BY j.doc_id""".stripMargin,

    // base-wins precedence: a doc duplicated in base AND batch is
    // dup_of_base (the base evidence is what blocks ingest).
    "q_incremental_dedup" -> incrementalDedupSql,

    // Shared SQL constant with q_incremental_dedup — the streaming
    // state machine and the batch join can never drift apart.
    "q_stream_incremental_dedup" -> incrementalDedupSql,

    "q_minhash_near_dup" ->
      s"""WITH $candSql
         |SELECT d1, d2, bands FROM cand ORDER BY d1, d2""".stripMargin,

    // Index-serve triage replayed: full-corpus band minima (stored ∪
    // arriving IS the full corpus — minima are per-doc), the shared
    // bucket cap, then arriving×stored pairs only.
    "q_dedup_index_persist" -> Oracle.mat(
      s"""WITH ${Dedup.shinglesSql},
         |${Dedup.minhashBandMinsSql},
         |okp AS (SELECT b, mh FROM bandmins GROUP BY 1, 2
         |        HAVING count(*) <= ${Dedup.MinhashBucketCap}),
         |dl AS (SELECT doc_id AS dnew, b, mh
         |       FROM bandmins JOIN okp USING (b, mh)
         |       WHERE doc_id % 10 = 7),
         |st AS (SELECT doc_id AS dbase, b, mh
         |       FROM bandmins JOIN okp USING (b, mh)
         |       WHERE doc_id % 10 <> 7)
         |SELECT dnew, dbase, count(*) AS bands
         |FROM dl JOIN st USING (b, mh)
         |GROUP BY 1, 2 ORDER BY dnew, dbase""".stripMargin),

    // Full replay of the rescue pass: primary band minima -> hot
    // buckets (cap 15 to force a non-trivial hot population at
    // sf0.01) -> hot docs' shingles re-banded with the second
    // permutation family -> capped candidate pairs.
    // Primary (cand) + rescue (rcand) chains share one shingles/
    // bandmins head; truth pairs from the independent shared-shingle
    // join over the same distinct sets.
    "q_lsh_recall" -> Oracle.mat(
      s"""WITH $candSql,
         |$rescueTailSql,
         |ds2 AS (SELECT DISTINCT doc_id, shingle FROM shingles),
         |sizes2 AS (SELECT doc_id, count(*) AS n_sh FROM ds2 GROUP BY 1),
         |tcom AS (
         |  SELECT a.doc_id AS d1, b2.doc_id AS d2, count(*) AS common
         |  FROM ds2 a JOIN ds2 b2
         |    ON b2.shingle = a.shingle AND a.doc_id < b2.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT d1, d2,
         |         ${r4("CAST(common AS DOUBLE) / " +
              "CAST(s1.n_sh + s2.n_sh - common AS DOUBLE)")} AS jaccard
         |  FROM tcom
         |  JOIN sizes2 s1 ON s1.doc_id = d1
         |  JOIN sizes2 s2 ON s2.doc_id = d2),
         |tkept AS (SELECT * FROM truth WHERE jaccard >= $LshRecallThresh)
         |SELECT t.d1, t.d2, t.jaccard,
         |       CAST(CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END
         |            AS BIGINT) AS hit_primary,
         |       CAST(CASE WHEN rc.d1 IS NOT NULL THEN 1 ELSE 0 END
         |            AS BIGINT) AS hit_rescue,
         |       CAST(CASE WHEN c.d1 IS NOT NULL OR rc.d1 IS NOT NULL
         |            THEN 1 ELSE 0 END AS BIGINT) AS hit
         |FROM tkept t
         |LEFT JOIN cand c ON c.d1 = t.d1 AND c.d2 = t.d2
         |LEFT JOIN rcand rc ON rc.d1 = t.d1 AND rc.d2 = t.d2
         |ORDER BY t.d1, t.d2""".stripMargin),

    "q_minhash_rescue" -> Oracle.mat(
      s"""WITH $rescueCandSql
         |SELECT d1, d2, bands FROM rcand ORDER BY d1, d2""".stripMargin),

    // Rescue candidates (>=2 agreeing rescue bands) re-scored with
    // exact n-gram Jaccard — the full "hot bucket -> second chance ->
    // exact rescore" chain end-to-end.
    "q_rescue_jaccard" -> Oracle.mat(
      s"""WITH $rescueCandSql,
         |${jaccardRescoreSqlFrom("rcand")}""".stripMargin),

    "q_ngram_jaccard" ->
      s"""WITH $candSql,
         |${jaccardRescoreSqlFrom("cand")}""".stripMargin,

    "q_minhash_containment" ->
      s"""WITH $candSql,
         |${jaccardRescoreSqlFrom("cand", withContainment = true)}""".stripMargin,

    "q_dedup_threshold_sweep" ->
      s"""WITH $bandedCosCtes,
         |taus AS (SELECT unnest(range(0, 10)) AS i),
         |hits AS (
         |  SELECT t.i, count(*) AS n_pairs,
         |         count(DISTINCT b.v2) AS n_dropped_docs
         |  FROM taus t JOIN bcos b ON b.cos_sim >= t.i * 0.05
         |  GROUP BY 1),
         |sweep AS (
         |  SELECT CAST(t.i * 5 AS BIGINT) AS tau_pct,
         |         ${r4("t.i * 0.05")} AS tau,
         |         CAST(coalesce(h.n_pairs, 0) AS BIGINT) AS n_pairs,
         |         CAST(coalesce(h.n_dropped_docs, 0) AS BIGINT)
         |           AS n_dropped_docs
         |  FROM taus t LEFT JOIN hits h ON h.i = t.i)
         |SELECT * FROM sweep ORDER BY tau_pct""".stripMargin,

    // The ingest gate replayed relationally: the stream side's
    // stateless whole-doc minima are bit-identical to the groupBy
    // band minima (same hash, same band transform, min over the same
    // shingle set), so ONE bandmins CTE serves both sides.
    "q_stream_dedup_gate" ->
      s"""WITH ${Dedup.shinglesSql},
         |${Dedup.minhashBandMinsSql},
         |okb AS (SELECT b, mh FROM bandmins GROUP BY 1, 2
         |        HAVING count(*) <= ${Dedup.MinhashBucketCap}),
         |kept AS (
         |  SELECT bandmins.doc_id AS corpus_doc, b, mh
         |  FROM bandmins JOIN okb USING (b, mh)),
         |qmins AS (SELECT * FROM bandmins WHERE doc_id % 5 = 0)
         |SELECT q.doc_id AS doc_id, k.corpus_doc, count(*) AS bands
         |FROM qmins q JOIN kept k USING (b, mh)
         |WHERE q.doc_id <> k.corpus_doc
         |GROUP BY 1, 2
         |ORDER BY doc_id, corpus_doc""".stripMargin,

    "q_simhash_near_dup" ->
      s"""WITH $simhashPairCtes
         |SELECT d1, d2, h1, h2,
         |       CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         |FROM pairs
         |WHERE bit_count(xor(h1, h2)) <= 3
         |ORDER BY d1, d2""".stripMargin,

    // Full replay of the simhash rescue pass: hot primary blocks →
    // hot docs → rotated re-block → capped rescue pairs → hamming.
    "q_simhash_rescue" -> Oracle.mat(
      s"""WITH $simhashPairCtes
         |SELECT d1, d2, h1, h2,
         |       CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         |FROM rpairs
         |WHERE bit_count(xor(h1, h2)) <= 3
         |ORDER BY d1, d2""".stripMargin),

    // Same pair CTEs + recursive min-label propagation: the recursive
    // member re-derives exactly what the engine's iterate-to-fixpoint
    // loop computes (min reachable doc_id per component). Edges are
    // the guarded chain: capped primary pairs ∪ rescue pairs.
    "q_dedup_clusters" -> Oracle.mat(
      s"""WITH $simhashPairCtes,
         |edges AS (
         |  SELECT d1, d2 FROM pairs WHERE bit_count(xor(h1, h2)) <= 3
         |  UNION
         |  SELECT d1, d2 FROM rpairs WHERE bit_count(xor(h1, h2)) <= 3),
         |sym AS (
         |  SELECT d1 AS src, d2 AS dst FROM edges
         |  UNION ALL
         |  SELECT d2 AS src, d1 AS dst FROM edges),
         |$ccLadderSql
         |SELECT doc_id, cluster_id,
         |       CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END
         |         AS BIGINT) AS is_keeper
         |FROM cgrp ORDER BY doc_id""".stripMargin),

    // Leakage-free split: same CC replay as q_dedup_clusters (the
    // bounded-round ladder — the RECURSIVE cc accumulated ~n²
    // (node, label) rows inside the giant near-dup cluster and cost
    // 248 s at sf0.1 even mat()'d; the ladder is O(rounds·E)), split
    // bands off the portable spread hash of the cluster id, edge
    // rollup attributed to the d1 endpoint's split. mat()'d: `edges`
    // is consumed by sym (×2) + dedges and cgrp by asg→{eagg twice,
    // final select} — un-materialized, DuckDB re-inlines the whole
    // simhash+ladder replay per reference.
    "q_leakage_free_split" -> Oracle.mat {
      import graft.core.PortableHash
      val spSql = PortableHash.spreadSql(PortableHash.hSql(
        "'split:' || CAST(cluster_id AS VARCHAR)"))
      s"""WITH $simhashPairCtes,
         |edges AS (
         |  SELECT d1, d2 FROM pairs WHERE bit_count(xor(h1, h2)) <= 3
         |  UNION
         |  SELECT d1, d2 FROM rpairs WHERE bit_count(xor(h1, h2)) <= 3),
         |sym AS (
         |  SELECT d1 AS src, d2 AS dst FROM edges
         |  UNION ALL
         |  SELECT d2 AS src, d1 AS dst FROM edges),
         |$ccLadderSql,
         |asg AS (
         |  SELECT doc_id, cluster_id,
         |         CASE WHEN $spSql < 900002 THEN 'train'
         |              WHEN $spSql < 950002 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM cgrp),
         |dedges AS (
         |  -- explicit dedup kept from the WITH RECURSIVE era (a bare
         |  -- UNION there did NOT dedup across branches — measured);
         |  -- harmless belt-and-braces now, and this count is the one
         |  -- consumer that is NOT multiset-insensitive
         |  SELECT DISTINCT d1, d2 FROM edges),
         |eagg AS (
         |  SELECT a1.split,
         |         CAST(count(*) AS BIGINT) AS n_edges,
         |         CAST(sum(CASE WHEN a1.split != a2.split
         |                       THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_cross_edges
         |  FROM dedges e
         |  JOIN asg a1 ON a1.doc_id = e.d1
         |  JOIN asg a2 ON a2.doc_id = e.d2
         |  GROUP BY 1)
         |SELECT g.split, count(*) AS n_docs,
         |       CAST(count(DISTINCT g.cluster_id) AS BIGINT)
         |         AS n_clusters,
         |       COALESCE(max(e.n_edges), 0) AS n_edges,
         |       COALESCE(max(e.n_cross_edges), 0) AS n_cross_edges
         |FROM asg g LEFT JOIN eagg e ON e.split = g.split
         |GROUP BY g.split, e.n_edges, e.n_cross_edges
         |ORDER BY g.split""".stripMargin
    },

    // ER audit: the full pipeline replay (erCtes) plus the
    // survivorship rollup — canonical name via min-rec_id row_number
    // (ties impossible: rec_id is unique).
    "q_entity_resolution" ->
      s"""WITH RECURSIVE $erCtes,
         |canon AS (
         |  SELECT cluster_id, name_raw AS canonical_name FROM (
         |    SELECT cluster_id, name_raw,
         |           row_number() OVER (PARTITION BY cluster_id
         |                              ORDER BY rec_id) AS rn
         |    FROM j) WHERE rn = 1)
         |SELECT j.cluster_id,
         |       CAST(count(*) AS BIGINT) AS n_records,
         |       CAST(sum(CASE WHEN j.src = 'reg' THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_reg,
         |       CAST(sum(CASE WHEN j.src = 'crm' THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_crm,
         |       CAST(sum(CASE WHEN j.src = 'bill' THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_bill,
         |       CAST(count(DISTINCT j.true_key) AS BIGINT) AS n_true_keys,
         |       max(c.canonical_name) AS canonical_name,
         |       CAST(CASE WHEN count(DISTINCT j.true_key) > 1
         |                 THEN 1 ELSE 0 END AS BIGINT) AS merged
         |FROM j JOIN canon c ON c.cluster_id = j.cluster_id
         |GROUP BY j.cluster_id
         |ORDER BY j.cluster_id""".stripMargin,

    // ER quality: pairwise precision/recall from group sizes only —
    // the same Σ C(n,2) arithmetic as the engine, so the readout is
    // cell-exact integer end to end.
    "q_er_quality" ->
      s"""WITH RECURSIVE $erCtes,
         |cs AS (SELECT cluster_id, count(*) AS sz FROM j GROUP BY 1),
         |ct AS (SELECT cluster_id, true_key, count(*) AS c
         |       FROM j GROUP BY 1, 2),
         |tk AS (SELECT true_key, count(*) AS t FROM j GROUP BY 1),
         |agg AS (
         |  SELECT CAST((SELECT count(*) FROM j) AS BIGINT) AS n_records,
         |         CAST((SELECT count(*) FROM cs) AS BIGINT) AS n_clusters,
         |         CAST((SELECT sum(sz*(sz-1)//2) FROM cs) AS BIGINT)
         |           AS pred_pairs,
         |         CAST((SELECT sum(t*(t-1)//2) FROM tk) AS BIGINT)
         |           AS true_pairs,
         |         CAST((SELECT sum(c*(c-1)//2) FROM ct) AS BIGINT)
         |           AS tp_pairs)
         |SELECT n_records, n_clusters, pred_pairs, true_pairs, tp_pairs,
         |       tp_pairs * 10000 // pred_pairs AS precision_x10000,
         |       tp_pairs * 10000 // true_pairs AS recall_x10000
         |FROM agg""".stripMargin,

    // Same edge CTEs as q_dedup_clusters; then the integer PageRank
    // rounds from GraphRank.pageRankSql — no doubles anywhere, so no
    // rounding discipline is even needed. ORDER BY is qualified
    // (n.doc_id) — DuckDB binds an unqualified name ambiguously here
    // (the decontam-oracle trap).
    "q_graph_rank" -> Oracle.mat(
      s"""WITH $simhashPairCtes,
         |edges AS (
         |  SELECT d1, d2 FROM pairs WHERE bit_count(xor(h1, h2)) <= 3
         |  UNION
         |  SELECT d1, d2 FROM rpairs WHERE bit_count(xor(h1, h2)) <= 3),
         |sym AS (
         |  SELECT d1 AS src, d2 AS dst FROM edges
         |  UNION ALL
         |  SELECT d2 AS src, d1 AS dst FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
         |nodes AS (SELECT doc_id FROM documents),
         |${GraphRank.pageRankSql()}
         |SELECT n.doc_id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg, p.pr
         |FROM nodes n
         |LEFT JOIN deg d ON d.src = n.doc_id
         |JOIN pr${GraphRank.Rounds} p ON p.doc_id = n.doc_id
         |ORDER BY n.doc_id""".stripMargin),

    // Triangle counts over the minhash candidate graph: candidate
    // CTE + the degree-ordered-orientation replay.
    "q_graph_triangles" -> Oracle.mat(
      s"""WITH $candSql,
         |edges AS (SELECT d1, d2 FROM cand),
         |${GraphRank.triangleCountsSql}
         |SELECT doc_id, n_triangles FROM tripart ORDER BY doc_id""".stripMargin),

    // Duplicated 40-char windows (stride 10): same strided fanout,
    // same (wstr, doc_id) aggregate + per-wstr window.
    "q_dup_windows" ->
      s"""WITH ${Dedup.textWindowsSql},
         |g AS (SELECT wstr, doc_id, count(*) AS occ
         |      FROM wins GROUP BY 1, 2),
         |m AS (SELECT wstr, doc_id, occ,
         |             count(*) OVER (PARTITION BY wstr) AS ndocs FROM g),
         |perdoc AS (
         |  SELECT doc_id,
         |         CAST(sum(occ) AS BIGINT) AS n_windows,
         |         CAST(sum(CASE WHEN ndocs >= 2 THEN occ ELSE 0 END)
         |              AS BIGINT) AS n_dup_windows
         |  FROM m GROUP BY 1)
         |SELECT doc_id, n_windows, n_dup_windows,
         |       ${r4("CAST(n_dup_windows AS DOUBLE) / n_windows")} AS dup_frac
         |FROM perdoc ORDER BY doc_id""".stripMargin,

    // Savings replayed off the same chunk-sig groups.
    "q_chunk_dedup_savings" ->
      s"""WITH ${Dedup.contentChunksSql},
         |csg AS (SELECT sha256(chunk) AS sig,
         |               CAST(strlen(chunk) AS BIGINT) AS blen FROM cdc),
         |cgr AS (SELECT sig, CAST(count(*) AS BIGINT) AS cnt,
         |               min(blen) AS blen
         |        FROM csg GROUP BY 1),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_unique_chunks,
         |         CAST(sum(cnt) AS BIGINT) AS n_chunks,
         |         CAST(sum(cnt * blen) AS BIGINT) AS total_bytes,
         |         CAST(sum(blen) AS BIGINT) AS unique_bytes,
         |         CAST(sum((cnt - 1) * blen) AS BIGINT) AS saved_bytes
         |  FROM cgr)
         |SELECT n_unique_chunks, n_chunks, total_bytes, unique_bytes,
         |       saved_bytes,
         |       ${r4("CAST(saved_bytes AS DOUBLE) / " +
              "CAST(total_bytes AS DOUBLE)")} AS savings_frac
         |FROM tot""".stripMargin,

    // CDC chunks replayed: identical rolling-window boundary cuts
    // (portable hash, same mod), sha256 chunk sigs, same per-doc
    // dup attribution as the window variant.
    "q_content_chunks" ->
      s"""WITH ${Dedup.contentChunksSql},
         |csig AS (SELECT doc_id, sha256(chunk) AS sig FROM cdc),
         |cg AS (SELECT sig, doc_id, count(*) AS occ
         |       FROM csig GROUP BY 1, 2),
         |cm AS (SELECT sig, doc_id, occ,
         |              count(*) OVER (PARTITION BY sig) AS ndocs FROM cg),
         |cperdoc AS (
         |  SELECT doc_id,
         |         CAST(sum(occ) AS BIGINT) AS n_chunks,
         |         CAST(sum(CASE WHEN ndocs >= 2 THEN occ ELSE 0 END)
         |              AS BIGINT) AS n_dup_chunks
         |  FROM cm GROUP BY 1)
         |SELECT doc_id, n_chunks, n_dup_chunks,
         |       ${r4("CAST(n_dup_chunks AS DOUBLE) / n_chunks")} AS dup_frac
         |FROM cperdoc ORDER BY doc_id""".stripMargin,

    // OOV rate: same deterministic top-k vocab cut + left-join mark.
    "q_oov_rate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |vc AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
         |vocab AS (SELECT token FROM vc
         |          ORDER BY cnt DESC, token LIMIT $OovVocabSize),
         |j AS (
         |  SELECT t.doc_id, count(*) AS n_tokens,
         |         CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_oov
         |  FROM toks t LEFT JOIN vocab v ON v.token = t.token
         |  GROUP BY 1)
         |SELECT doc_id, n_tokens, n_oov,
         |       ${r4("CAST(n_oov AS DOUBLE) / n_tokens")} AS oov_frac
         |FROM j ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      s"""SELECT doc_id,
         |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
         |       CAST(len(regexp_extract_all(text,
         |         '${TextAnalysis.TokenRegex}')) AS BIGINT) AS n_re,
         |       n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_top_bigrams" ->
      """WITH ws AS (
        |  SELECT lang, string_split(text, ' ') AS w FROM documents),
        |bigrams AS (
        |  SELECT lang,
        |         unnest(list_transform(range(1, len(w)),
        |           i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM ws),
        |counts AS (
        |  SELECT lang, bigram, count(*) AS n FROM bigrams GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, bigram, n,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n DESC, bigram) AS rn
        |  FROM counts)
        |SELECT lang, bigram, n, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin,

    "q_text_stats" ->
      s"""WITH words AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |wc AS (
         |  SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id,
         |         CAST(sum(c) AS BIGINT) AS n_words,
         |         count(*) AS n_distinct,
         |         CAST(sum(c*c) AS BIGINT) AS sumsq
         |  FROM wc GROUP BY 1)
         |SELECT doc_id, n_words, n_distinct,
         |       ${r4("CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)")}
         |         AS ttr,
         |       ${r4("1.0 - CAST(sumsq AS DOUBLE) / CAST(n_words*n_words AS DOUBLE)")}
         |         AS simpson
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      s"""WITH $qualityCtes
         |SELECT doc_id, n_chars, n_words, n_stop, avg_wlen, stop_ratio,
         |       quality
         |FROM quals ORDER BY doc_id""".stripMargin,

    // Gopher rule flags: pure integer inequalities over per-doc word
    // counts — the oracle replays each rule from the raw text with
    // list primitives, no doubles anywhere.
    "q_gopher_rules" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws, n_chars
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(ws) AS BIGINT) AS n_words,
        |         n_chars - CAST(len(ws) AS BIGINT) + 1 AS sum_wlen,
        |         CAST(len(list_filter(ws, x -> len(x) <= 2)) AS BIGINT)
        |           AS n_short,
        |         CAST(list_contains(ws, 'the') AS BIGINT)
        |           + CAST(list_contains(ws, 'a') AS BIGINT)
        |           AS n_stop_kinds
        |  FROM w),
        |r AS (
        |  SELECT doc_id, n_words, n_short, n_stop_kinds,
        |    CASE WHEN n_words BETWEEN 50 AND 100000
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |      AS r_wordcount,
        |    CASE WHEN sum_wlen >= n_words * 4
        |          AND sum_wlen <= n_words * 10
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |      AS r_wlen,
        |    CASE WHEN n_short * 20 <= n_words
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |      AS r_short,
        |    CASE WHEN n_stop_kinds >= 2
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
        |      AS r_stop
        |  FROM m)
        |SELECT doc_id, n_words, n_short, n_stop_kinds,
        |       r_wordcount, r_wlen, r_short, r_stop,
        |       r_wordcount * r_wlen * r_short * r_stop AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // lmAggCtes: integer replay of the LmScore pipeline — same Laplace smoothing,
    // same fixed-point probability, same bit-length/mantissa log
    // decomposition against the SAME embedded table — log2 never
    // computed by either engine at query time. Parallel unnests zip
    // (w1 with its bigram), matching the Spark struct explode.
    "q_lm_score" ->
      s"""WITH $lmAggCtes
         |SELECT doc_id, n_bigrams, sum_nl2fx,
         |       sum_nl2fx // n_bigrams AS avg_nl2fx,
         |       ${r4(s"CAST(sum_nl2fx // n_bigrams AS DOUBLE) / " +
                s"${LmScore.LogScale}.0")} AS avg_bits
         |FROM agg ORDER BY doc_id""".stripMargin,

    // Held-out LM: train counts from the %5!=0 slice, LEFT joins with
    // Laplace-absorbed nulls, same integer-log2 decomposition.
    "q_lm_heldout" ->
      s"""WITH tws AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE doc_id % 5 != 0),
         |hws AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS w
         |  FROM documents WHERE doc_id % 5 = 0),
         |tbg AS (
         |  SELECT unnest(list_transform(range(1, len(w)),
         |    i -> w[i] || ' ' || w[i+1])) AS bg
         |  FROM tws WHERE len(w) >= 2),
         |bgc AS (SELECT bg, count(*) AS c12 FROM tbg GROUP BY 1),
         |ugc AS (
         |  SELECT w1, count(*) AS c1 FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w1
         |    FROM documents WHERE doc_id % 5 != 0)
         |  GROUP BY 1),
         |vv AS (SELECT count(*) AS v FROM ugc),
         |hbg AS (
         |  SELECT doc_id, lang,
         |         unnest(list_transform(range(1, len(w)), i -> w[i]))
         |           AS w1,
         |         unnest(list_transform(range(1, len(w)),
         |           i -> w[i] || ' ' || w[i+1])) AS bg
         |  FROM hws WHERE len(w) >= 2),
         |j AS (
         |  SELECT h.lang, COALESCE(b.c12, 0) AS c12n,
         |         GREATEST(((COALESCE(b.c12, 0) + 1) * ${LmScore.PScale})
         |             // (COALESCE(u.c1, 0) + vv.v), 1) AS pfx
         |  FROM hbg h
         |  LEFT JOIN bgc b USING (bg)
         |  LEFT JOIN ugc u USING (w1)
         |  CROSS JOIN vv),
         |nl AS (
         |  SELECT lang, c12n,
         |         ${LmScore.L9Fx}
         |           - (length(bin(pfx)) - 1) * ${LmScore.LogScale}
         |           - (${LmScore.log2TableSql}[
         |               CAST((pfx * ${LmScore.MScale})
         |                 // (CAST(1 AS BIGINT) << (length(bin(pfx)) - 1))
         |                 AS INTEGER) - ${LmScore.MScale - 1}]) AS nl2
         |  FROM j)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       CAST(sum(CASE WHEN c12n = 0 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS oov_bigrams,
         |       ${r4("CAST(sum(CASE WHEN c12n = 0 THEN 1 ELSE 0 END) " +
              "AS DOUBLE) / count(*)")} AS oov_rate,
         |       ${r4(s"CAST(sum(nl2) AS DOUBLE) / count(*) / " +
              s"${LmScore.LogScale}.0")} AS avg_bits
         |FROM nl GROUP BY 1 ORDER BY 1""".stripMargin,

    // CCNet terciles: per-doc avg_nl2fx from the shared LM replay,
    // thresholds = the ACTUAL elements at 0-based ranks
    // ⌊(1/3)·n⌋ / ⌊(2/3)·n⌋ (both sides compute the rank through the
    // same IEEE double product, so n divisible by 3 cannot split the
    // engines), buckets by exact-integer comparison.
    "q_ccnet_buckets" ->
      s"""WITH $lmAggCtes,
         |pd AS (
         |  SELECT doc_id, n_bigrams, sum_nl2fx,
         |         sum_nl2fx // n_bigrams AS avg FROM agg),
         |ranked AS (
         |  SELECT avg, row_number() OVER (ORDER BY avg) AS rk,
         |         count(*) OVER () AS n
         |  FROM pd),
         |thr AS (
         |  SELECT max(CASE WHEN rk = CAST(floor((1.0/3) * n) AS BIGINT)
         |                      + 1 THEN avg END) AS t1,
         |         max(CASE WHEN rk = CAST(floor((2.0/3) * n) AS BIGINT)
         |                      + 1 THEN avg END) AS t2
         |  FROM ranked),
         |bucketed AS (
         |  SELECT CASE WHEN p.avg < t.t1 THEN 'head'
         |              WHEN p.avg < t.t2 THEN 'middle'
         |              ELSE 'tail' END AS bucket,
         |         d.lang, p.n_bigrams, p.sum_nl2fx
         |  FROM pd p JOIN documents d USING (doc_id) CROSS JOIN thr t)
         |SELECT bucket, lang, count(*) AS n_docs,
         |       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
         |       CAST(sum(sum_nl2fx) AS BIGINT) AS sum_nl2fx,
         |       ${r4("CAST(sum(sum_nl2fx) AS DOUBLE) / " +
              s"CAST(sum(n_bigrams) AS DOUBLE) / ${LmScore.LogScale}.0")}
         |         AS avg_bits
         |FROM bucketed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Six integer log2s against the SAME embedded table; exact-int
    // ordering makes the top-20 deterministic on both engines.
    "q_pmi_bigrams" ->
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |docbg AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(w)),
         |           i -> w[i] || ' ' || w[i+1])) AS bg
         |  FROM ws WHERE len(w) >= 2),
         |bgc AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12
         |        FROM docbg GROUP BY 1),
         |ugc AS (
         |  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
         |  GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM ugc) AS wtot,
         |         (SELECT CAST(sum(c12) AS BIGINT) FROM bgc) AS btot),
         |f AS (
         |  SELECT string_split(bg, ' ')[1] AS w1,
         |         string_split(bg, ' ')[2] AS w2, c12
         |  FROM bgc WHERE c12 >= $PmiMinCount),
         |j AS (
         |  SELECT f.w1, f.w2, f.c12, u1.c1 AS c1, u2.c1 AS c2,
         |         tot.wtot, tot.btot
         |  FROM f JOIN ugc u1 ON u1.w1 = f.w1
         |         JOIN ugc u2 ON u2.w1 = f.w2
         |  CROSS JOIN tot),
         |p AS (
         |  SELECT w1, w2, c12, c1, c2,
         |         CAST(${LmScore.log2FxSql("c12")}
         |           + 2 * ${LmScore.log2FxSql("wtot")}
         |           - ${LmScore.log2FxSql("btot")}
         |           - ${LmScore.log2FxSql("c1")}
         |           - ${LmScore.log2FxSql("c2")} AS BIGINT) AS pmi_fx
         |  FROM j)
         |SELECT w1, w2, c12, c1, c2, pmi_fx,
         |       ${r4(s"CAST(pmi_fx AS DOUBLE) / ${LmScore.LogScale}.0")}
         |         AS pmi_bits
         |FROM p ORDER BY pmi_fx DESC, w1, w2 LIMIT 20""".stripMargin,

    // Same tf CTE as q_bm25_retrieval; all-integer until the final
    // r4 render.
    "q_token_entropy" ->
      s"""WITH tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents)
         |  GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS n_distinct,
         |         CAST(sum(tf * ${LmScore.log2FxSql("tf")}) AS BIGINT)
         |           AS sum_clg
         |  FROM tf GROUP BY 1),
         |e AS (
         |  SELECT doc_id, n_tokens, n_distinct,
         |         CAST(${LmScore.log2FxSql("n_tokens")}
         |           - (sum_clg // n_tokens) AS BIGINT) AS ent_fx
         |  FROM agg)
         |SELECT doc_id, n_tokens, n_distinct, ent_fx,
         |       ${r4(s"CAST(ent_fx AS DOUBLE) / ${LmScore.LogScale}.0")}
         |         AS ent_bits
         |FROM e ORDER BY doc_id""".stripMargin,

    // BM25 replay: same top-df query terms, same integer idf
    // decomposition against the SAME embedded log table, same
    // double-spelled tf saturation, per-contribution snapping before
    // the BIGINT sum.
    "q_bm25_retrieval" ->
      s"""WITH tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents)
         |  GROUP BY 1, 2),
         |dlen AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len
         |  FROM tf GROUP BY 1),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS nn,
         |         (CAST(sum(len) AS BIGINT) * 1000)
         |           // CAST(count(*) AS BIGINT) AS avgfx
         |  FROM dlen),
         |dfx AS (SELECT w, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |qterms AS (SELECT w, df FROM dfx ORDER BY df DESC, w LIMIT 5),
         |qx AS (
         |  SELECT q.w,
         |         CAST((CAST((s.nn + 1) * 2 AS HUGEINT)
         |               * ${LmScore.PScale}) // (2 * q.df + 1)
         |           AS BIGINT) AS xfx
         |  FROM qterms q CROSS JOIN stats s),
         |qe AS (SELECT w, xfx, length(bin(xfx)) AS e FROM qx),
         |qidf AS (
         |  SELECT w,
         |         (e - 1) * ${LmScore.LogScale}
         |           + (${LmScore.log2TableSql}[
         |               CAST((xfx * ${LmScore.MScale})
         |                 // (CAST(1 AS BIGINT) << (e - 1))
         |                 AS INTEGER) - ${LmScore.MScale - 1}])
         |           - ${LmScore.L9Fx} AS idf_fx
         |  FROM qe),
         |contrib AS (
         |  SELECT t.doc_id,
         |         CAST(floor(CAST(i.idf_fx AS DOUBLE) *
         |           (CAST(t.tf AS DOUBLE) * 2.2 /
         |             (CAST(t.tf AS DOUBLE) + 1.2 *
         |               (0.25 + 0.75 * CAST(l.len AS DOUBLE) /
         |                 (CAST(s.avgfx AS DOUBLE) / 1000.0)))) + 0.5)
         |           AS BIGINT) AS cfx
         |  FROM tf t JOIN qidf i USING (w) JOIN dlen l USING (doc_id)
         |  CROSS JOIN stats s),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_qterms,
         |         CAST(sum(cfx) AS BIGINT) AS score_fx
         |  FROM contrib GROUP BY 1)
         |SELECT doc_id, n_qterms, score_fx,
         |       ${r4(s"CAST(score_fx AS DOUBLE) / ${LmScore.LogScale}.0")}
         |         AS score
         |FROM agg ORDER BY score_fx DESC, doc_id LIMIT 10""".stripMargin,

    // Known-item MRR replayed: rarest-term pick as a ranked window,
    // the same idf/tf-saturation arithmetic as the BM25 oracle, and
    // the self-rank window over each probe's posting list.
    "q_retrieval_mrr" -> Oracle.mat(
      s"""WITH tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents)
         |  GROUP BY 1, 2),
         |dlen AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len
         |  FROM tf GROUP BY 1),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS nn,
         |         (CAST(sum(len) AS BIGINT) * 1000)
         |           // CAST(count(*) AS BIGINT) AS avgfx
         |  FROM dlen),
         |dfx AS (SELECT w, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |probes AS (SELECT doc_id AS probe FROM documents
         |           WHERE doc_id % 101 = 3),
         |pt0 AS (
         |  SELECT p.probe, t.w, d.df,
         |         row_number() OVER (PARTITION BY p.probe
         |                ORDER BY d.df, t.w) AS prn
         |  FROM probes p
         |  JOIN tf t ON t.doc_id = p.probe
         |  JOIN dfx d USING (w)),
         |pterm AS (SELECT probe, w, df FROM pt0 WHERE prn = 1),
         |qw AS (SELECT DISTINCT w, df FROM pterm),
         |qx AS (
         |  SELECT q.w,
         |         CAST((CAST((s.nn + 1) * 2 AS HUGEINT)
         |               * ${LmScore.PScale}) // (2 * q.df + 1)
         |           AS BIGINT) AS xfx
         |  FROM qw q CROSS JOIN stats s),
         |qe AS (SELECT w, xfx, length(bin(xfx)) AS e FROM qx),
         |qidf AS (
         |  SELECT w,
         |         (e - 1) * ${LmScore.LogScale}
         |           + (${LmScore.log2TableSql}[
         |               CAST((xfx * ${LmScore.MScale})
         |                 // (CAST(1 AS BIGINT) << (e - 1))
         |                 AS INTEGER) - ${LmScore.MScale - 1}])
         |           - ${LmScore.L9Fx} AS idf_fx
         |  FROM qe),
         |cand AS (
         |  SELECT pt.probe, pt.w, pt.df, t.doc_id,
         |         CAST(floor(CAST(i.idf_fx AS DOUBLE) *
         |           (CAST(t.tf AS DOUBLE) * 2.2 /
         |             (CAST(t.tf AS DOUBLE) + 1.2 *
         |               (0.25 + 0.75 * CAST(l.len AS DOUBLE) /
         |                 (CAST(s.avgfx AS DOUBLE) / 1000.0)))) + 0.5)
         |           AS BIGINT) AS cfx
         |  FROM pterm pt
         |  JOIN tf t ON t.w = pt.w
         |  JOIN qidf i ON i.w = pt.w
         |  JOIN dlen l ON l.doc_id = t.doc_id
         |  CROSS JOIN stats s),
         |ranked AS (
         |  SELECT probe, w, df, doc_id,
         |         CAST(row_number() OVER (PARTITION BY probe
         |                ORDER BY cfx DESC, doc_id) AS BIGINT)
         |           AS self_rank,
         |         CAST(count(*) OVER (PARTITION BY probe) AS BIGINT)
         |           AS n_cand
         |  FROM cand)
         |SELECT probe, w AS term, df, n_cand, self_rank,
         |       ${r4("1.0 / CAST(self_rank AS DOUBLE)")} AS rr
         |FROM ranked WHERE doc_id = probe ORDER BY probe""".stripMargin),

    // nDCG replayed off the same candidate chain: served and ideal
    // rank windows, integer position weights 2⁴⁰ // log2Fx(rank+1),
    // BIGINT ratio at the end.
    "q_retrieval_ndcg" -> Oracle.mat(
      s"""WITH tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents)
         |  GROUP BY 1, 2),
         |dlen AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len
         |  FROM tf GROUP BY 1),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS nn,
         |         (CAST(sum(len) AS BIGINT) * 1000)
         |           // CAST(count(*) AS BIGINT) AS avgfx
         |  FROM dlen),
         |dfx AS (SELECT w, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |probes AS (SELECT doc_id AS probe FROM documents
         |           WHERE doc_id % 101 = 3),
         |pt0 AS (
         |  SELECT p.probe, t.w, d.df,
         |         row_number() OVER (PARTITION BY p.probe
         |                ORDER BY d.df, t.w) AS prn
         |  FROM probes p
         |  JOIN tf t ON t.doc_id = p.probe
         |  JOIN dfx d USING (w)),
         |pterm AS (SELECT probe, w, df FROM pt0 WHERE prn = 1),
         |qw AS (SELECT DISTINCT w, df FROM pterm),
         |qx AS (
         |  SELECT q.w,
         |         CAST((CAST((s.nn + 1) * 2 AS HUGEINT)
         |               * ${LmScore.PScale}) // (2 * q.df + 1)
         |           AS BIGINT) AS xfx
         |  FROM qw q CROSS JOIN stats s),
         |qe AS (SELECT w, xfx, length(bin(xfx)) AS e FROM qx),
         |qidf AS (
         |  SELECT w,
         |         (e - 1) * ${LmScore.LogScale}
         |           + (${LmScore.log2TableSql}[
         |               CAST((xfx * ${LmScore.MScale})
         |                 // (CAST(1 AS BIGINT) << (e - 1))
         |                 AS INTEGER) - ${LmScore.MScale - 1}])
         |           - ${LmScore.L9Fx} AS idf_fx
         |  FROM qe),
         |cand AS (
         |  SELECT pt.probe, t.doc_id, t.tf,
         |         CAST(floor(CAST(i.idf_fx AS DOUBLE) *
         |           (CAST(t.tf AS DOUBLE) * 2.2 /
         |             (CAST(t.tf AS DOUBLE) + 1.2 *
         |               (0.25 + 0.75 * CAST(l.len AS DOUBLE) /
         |                 (CAST(s.avgfx AS DOUBLE) / 1000.0)))) + 0.5)
         |           AS BIGINT) AS cfx
         |  FROM pterm pt
         |  JOIN tf t ON t.w = pt.w
         |  JOIN qidf i ON i.w = pt.w
         |  JOIN dlen l ON l.doc_id = t.doc_id
         |  CROSS JOIN stats s),
         |ranked AS (
         |  SELECT probe, tf,
         |         CAST(row_number() OVER (PARTITION BY probe
         |                ORDER BY cfx DESC, doc_id) AS BIGINT)
         |           AS srank,
         |         CAST(row_number() OVER (PARTITION BY probe
         |                ORDER BY tf DESC, doc_id) AS BIGINT)
         |           AS irank
         |  FROM cand),
         |weighted AS (
         |  SELECT probe, tf, srank, irank,
         |         ${1L << 40} // (${LmScore.log2FxSql("srank + 1")})
         |           AS sw,
         |         ${1L << 40} // (${LmScore.log2FxSql("irank + 1")})
         |           AS iw
         |  FROM ranked),
         |agg AS (
         |  SELECT probe,
         |         CAST(sum(CASE WHEN srank <= 5 THEN tf * sw
         |                       ELSE 0 END) AS BIGINT) AS dcg_fx,
         |         CAST(sum(CASE WHEN irank <= 5 THEN tf * iw
         |                       ELSE 0 END) AS BIGINT) AS idcg_fx
         |  FROM weighted GROUP BY 1)
         |SELECT probe, dcg_fx, idcg_fx,
         |       ${r4("CAST(dcg_fx AS DOUBLE) / CAST(idcg_fx AS DOUBLE)")}
         |         AS ndcg
         |FROM agg ORDER BY probe""".stripMargin),

    "q_lang_id" -> {
      val scoreCols = TextAnalysis.Markers.map { case (l, ms) =>
        s"${TextAnalysis.markerCountSql(ms)} AS score_$l" }.mkString(", ")
      s"""WITH ws AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         |scored AS (SELECT doc_id, lang, $scoreCols FROM ws)
         |SELECT doc_id, lang, score_en, score_es, score_fr, score_de,
         |       CASE
         |         WHEN score_en >= score_es AND score_en >= score_fr
         |              AND score_en >= score_de AND score_en > 0 THEN 'en'
         |         WHEN score_es >= score_fr AND score_es >= score_de
         |              AND score_es > 0 THEN 'es'
         |         WHEN score_fr >= score_de AND score_fr > 0 THEN 'fr'
         |         WHEN score_de > 0 THEN 'de'
         |         ELSE 'unknown'
         |       END AS lang_pred
         |FROM scored ORDER BY doc_id""".stripMargin
    },

    "q_doc_fingerprint" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
         |            FROM documents)
         |SELECT doc_id, ${TextAnalysis.fingerprintSql} AS fp
         |FROM ws ORDER BY doc_id""".stripMargin,

    "q_tfidf_top_terms" ->
      s"""WITH wrds AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |dfreq AS (
         |  SELECT term, count(*) AS df
         |  FROM (SELECT DISTINCT doc_id, term FROM wrds) GROUP BY 1),
         |tf AS (SELECT lang, term, count(*) AS tf FROM wrds GROUP BY 1, 2),
         |scored AS (
         |  SELECT lang, term, tf, df,
         |         ${r4("CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))")}
         |           AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |                               ORDER BY score DESC, term) AS rn
         |  FROM scored)
         |SELECT lang, term, tf, df, score, rn
         |FROM ranked WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,

    "q_embed_cosine_topk" ->
      s"""WITH expl AS (
         |  SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |cent AS (
         |  SELECT label, i,
         |         (CAST(sum(CAST(floor(v*1000000000.0 + 0.5) AS BIGINT))
         |               AS DOUBLE) / count(*)) / 1000000000.0 AS cv
         |  FROM expl GROUP BY 1, 2),
         |cnorm AS (
         |  SELECT label,
         |         CAST(sum(CAST(floor(cv*cv*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS cn
         |  FROM cent GROUP BY 1),
         |enorm AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(v*v*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS en
         |  FROM expl GROUP BY 1),
         |dots AS (
         |  SELECT c.label, e.vec_id,
         |         CAST(sum(CAST(floor(c.cv*e.v*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS dot
         |  FROM expl e JOIN cent c ON c.i = e.i GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.label, d.vec_id,
         |         ${r4("CASE WHEN sqrt(cn)*sqrt(en) = 0.0 THEN 0.0 " +
              "ELSE dot/(sqrt(cn)*sqrt(en)) END")} AS cos_sim
         |  FROM dots d JOIN cnorm USING (label) JOIN enorm USING (vec_id)),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY label
         |                               ORDER BY cos_sim DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT label, vec_id, cos_sim, rn
         |FROM ranked WHERE rn <= 5 ORDER BY label, rn""".stripMargin,

    // Same fixed-point centroid/norm/dot chain as q_embed_cosine_topk,
    // but each vector scores against its OWN label's centroid and the
    // ranking keeps the FARTHEST members (cos ASC).
    "q_embed_outliers" ->
      s"""WITH expl AS (
         |  SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |cent AS (
         |  SELECT label, i,
         |         (CAST(sum(CAST(floor(v*1000000000.0 + 0.5) AS BIGINT))
         |               AS DOUBLE) / count(*)) / 1000000000.0 AS cv
         |  FROM expl GROUP BY 1, 2),
         |cnorm AS (
         |  SELECT label,
         |         CAST(sum(CAST(floor(cv*cv*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS cn
         |  FROM cent GROUP BY 1),
         |enorm AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(v*v*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS en
         |  FROM expl GROUP BY 1),
         |dots AS (
         |  SELECT e.label, e.vec_id,
         |         CAST(sum(CAST(floor(c.cv*e.v*1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS dot
         |  FROM expl e JOIN cent c ON c.label = e.label AND c.i = e.i
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.label, d.vec_id,
         |         ${r4("CASE WHEN sqrt(cn)*sqrt(en) = 0.0 THEN 0.0 " +
              "ELSE dot/(sqrt(cn)*sqrt(en)) END")} AS cos_centroid
         |  FROM dots d JOIN cnorm USING (label) JOIN enorm USING (vec_id)),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY label
         |                               ORDER BY cos_centroid, vec_id) AS rn
         |  FROM scored)
         |SELECT label, vec_id, cos_centroid, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= 3 ORDER BY label, rn""".stripMargin,

    "q_embed_near_dup" ->
      s"""WITH $bandedCosCtes
         |SELECT v1, v2, bands, cos_sim FROM bcos
         |ORDER BY cos_sim DESC, v1, v2 LIMIT 100""".stripMargin,

    // Replays VectorSearch.scalarQuantize step for step: per-dim
    // min/max -> code -> dequantize -> 1e-9 fixed-point error before
    // the per-vector sum (summation-order-free). Every double step is
    // a correctly-rounded IEEE op with matching parenthesization on
    // both engines.
    "q_embed_quantize" ->
      s"""WITH expl AS (
         |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM expl GROUP BY 1),
         |coded AS (
         |  SELECT e.vec_id, e.v, s.mn, s.mx,
         |         CASE WHEN s.mx = s.mn THEN CAST(0 AS BIGINT)
         |              ELSE CAST(floor((e.v - s.mn) / (s.mx - s.mn) * 255.0
         |                               + 0.5) AS BIGINT) END AS code
         |  FROM expl e JOIN stats s USING (i)),
         |errs AS (
         |  SELECT vec_id, code,
         |         CAST(floor(abs(v - (mn + code / 255.0 * (mx - mn)))
         |                    * 1000000000.0 + 0.5) AS BIGINT) AS err_fx
         |  FROM coded)
         |SELECT vec_id, count(*) AS n_dims,
         |       CAST(sum(code) AS BIGINT) AS code_sum,
         |       min(code) AS code_min, max(code) AS code_max,
         |       CAST(sum(err_fx) AS BIGINT) AS err_fx,
         |       ${r4("CAST(sum(err_fx) AS DOUBLE) / 1000000000.0")} AS recon_err
         |FROM errs GROUP BY 1 ORDER BY vec_id""".stripMargin,

    // Banded candidates → cosine threshold → recursive min-label
    // propagation (same shape as the q_dedup_clusters oracle).
    "q_embed_dedup_clusters" ->
      s"""WITH RECURSIVE $bandedCosCtes,
         |edges AS (SELECT v1 AS d1, v2 AS d2 FROM bcos WHERE cos_sim >= 0.0),
         |sym AS (
         |  SELECT d1 AS src, d2 AS dst FROM edges
         |  UNION ALL
         |  SELECT d2 AS src, d1 AS dst FROM edges),
         |cc AS (
         |  SELECT vec_id AS node, vec_id AS label FROM embeddings
         |  UNION
         |  SELECT sym.dst AS node, cc.label
         |  FROM cc JOIN sym ON cc.node = sym.src)
         |SELECT node AS vec_id, min(label) AS cluster_id,
         |       CAST(CASE WHEN node = min(label) THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_keeper
         |FROM cc GROUP BY node ORDER BY vec_id""".stripMargin,

    "q_curation_mix" -> {
      val (copiesExpr, _) = Sampling.weightedMixSql(
        "source", "CAST(doc_id AS VARCHAR)", MixRates, defaultRate = 1.0)
      s"""WITH $qualityCtes,
         |$dupSigSql,
         |k AS (SELECT sig, min(doc_id) AS keeper FROM nsig GROUP BY 1),
         |drops AS (
         |  SELECT n.doc_id FROM nsig n JOIN k USING (sig)
         |  WHERE n.doc_id != k.keeper),
         |cur AS (
         |  SELECT d.doc_id, d.source, quals.quality
         |  FROM documents d JOIN quals ON quals.doc_id = d.doc_id
         |  WHERE quals.quality >= 0.5
         |    AND d.doc_id NOT IN (SELECT doc_id FROM drops)),
         |gated AS (
         |  SELECT doc_id, source, quality, $copiesExpr AS n_copies FROM cur)
         |SELECT doc_id, source, quality,
         |       unnest(generate_series(1, n_copies)) AS copy_id
         |FROM gated WHERE n_copies > 0
         |ORDER BY doc_id, copy_id""".stripMargin
    },
  ) ++ ExtServingOracles.oracles

  /** One frontier leg: a recall twin's FULL oracle text as a derived
    * table (its own WITH scope, so the graph and HNSW legs' identical
    * core CTE names never collide), aggregated to one priced row. */
  private[ext] def frontierLeg(v: String, q: String): String =
    s"""SELECT '$v' AS variant,
       |       CAST(count(*) AS BIGINT) AS n_queries,
       |       CAST(sum(n_hits) AS BIGINT) AS n_hits,
       |       ${r4("CAST(sum(n_hits) AS DOUBLE) / (count(*) * 3.0)")}
       |         AS recall_at_3
       |FROM (
       |${oraclesBase(q)}
       |) AS leg_$v""".stripMargin

  lazy val oracles: Map[String, String] = oraclesBase +
    ("q_ann_frontier" ->
      (FrontierVariants.map { case (v, q) => frontierLeg(v, q) }
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY variant"))) ++
    ExtWebQueries.oracles
}
