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
  private val docSplitsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Int]

  /** Per-(session, dir) verdict of the triangle twin-contraction
    * structure check — two bounded counts, paid once per session. */
  private val triGuardMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

  private def docs(s: SparkSession, d: String) = {
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
  private def emb(s: SparkSession, d: String) = Sources.table(s, d, "embeddings")

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
  private def annPanelC(s: SparkSession, d: String): DataFrame =
    Cache.getOrPersist(s, "ann_panel", d)(
      emb(s, d).where(col("vec_id") % 50 === 0)
        .orderBy((col("vec_id") * lit(48271L)) % lit(1000003L),
          col("vec_id"))
        .limit(AnnPanelSize)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label")))

  /** SQL twin of [[annPanelC]] — defines `panel(pqid)`. */
  private lazy val panelCte: String =
    s"""panel AS (
       |  SELECT vec_id AS pqid FROM embeddings
       |  WHERE vec_id % 50 = 0
       |  ORDER BY (CAST(vec_id AS BIGINT) * 48271) % 1000003, vec_id
       |  LIMIT $AnnPanelSize)""".stripMargin

  /** q_zipf_fit: how many top frequency ranks enter the OLS fit
    * (shared by query and oracle). */
  private val ZipfTopRanks = 30

  /** Per-(doc, term) frequency postings — the BM25 INDEX, shared by
    * the retrieval query, the token-entropy aggregate and the
    * cluster-topics c-TF-IDF (session artifact like the PQ
    * codebook). */
  private def bm25TfC(s: SparkSession, d: String): DataFrame =
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
  private val annSavedMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private def annIndexPath(s: SparkSession, d: String): String =
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
  private def lmDocScores(s: SparkSession, d: String): DataFrame =
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
  private def shingleHashesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "shingle_hashes", d)(
      Dedup.shingleHashes(Dedup.shingles(docs(s, d))))

  /** Primary-family band minima, materialized once per session: used
    * three times per candidate build (cap filter + both self-join
    * sides) and again by the rescue pass's hot-bucket detection. */
  private def bandMinsC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "minhash_bandmins", d)(
      Dedup.minhashBandMinsFromHashes(shingleHashesC(s, d), 0, Dedup.Bands))

  private def candidatesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "minhash_cand", d)(
      Dedup.minhashCandidates(bandMinsC(s, d)))

  /** Distinct (doc_id, shingle) STRING set — the one cache that keeps
    * the strings, because exact Jaccard rescoring compares shingle
    * sets; materialized because ngramJaccard references it three times
    * and exchange reuse does not fire above a cached frame (PLANS.md
    * round 5). */
  private def distinctShinglesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "shingles_distinct", d)(
      Dedup.shingles(docs(s, d)).distinct())

  /** Cap for the rescue-pass query: low enough that the synthetic
    * corpus has over-cap buckets (see q_minhash_rescue's comment). */
  private val RescueCap = 15

  /** Vocab budget for q_oov_rate — below the corpus's 31 distinct
    * tokens so OOV is a real population; production budgets are
    * 50k–200k. */
  private val OovVocabSize = 20

  /** Rescue candidate pairs, shared by the rescue query and its exact
    * Jaccard rescore. */
  private def rescueCandC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "minhash_rescue_cand", d)(
      Dedup.minhashRescueCandidates(
        shingleHashesC(s, d), bandMinsC(s, d), cap = RescueCap))

  /** Simhash signatures, shared by the primary pair pass, the rescue
    * pass (hot-bucket detection + re-block) and the monitoring
    * surface — one corpus aggregation instead of three. */
  private def simhashSigsC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_sigs", d)(
      Dedup.simhash(docs(s, d)))

  /** Simhash near-dup pairs (primary partition, production cap),
    * shared by the pair query and the cluster resolution query. */
  private def simhashPairsC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_pairs", d)(
      Dedup.simhashNearDups(simhashSigsC(s, d)))

  /** Rescue-pass pairs for members of over-cap simhash blocks (the
    * sf0.01 corpus trips the production cap for real: one block-3
    * bucket holds all 500 docs — see Dedup.SimhashBlockCap). */
  private def simhashRescueC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_rescue", d)(
      Dedup.simhashRescueNearDups(simhashSigsC(s, d)))

  /** The near-dup edge set (capped primary pairs ∪ rescue pairs,
    * distinct), session-shared: connected components scans it three
    * times (contraction aggregate + both sides of the rep join) and
    * PageRank re-reads it every round — without the cache each scan
    * re-runs the union+distinct shuffle from the cached pair frames
    * (measured 2.1 s of q_dedup_clusters' 5.4 s warm at sf0.1). */
  private def simhashEdgesC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "simhash_edges", d)(
      simhashPairsC(s, d).select(col("d1"), col("d2"))
        .unionByName(simhashRescueC(s, d).select(col("d1"), col("d2")))
        .distinct())

  /** Banded sign-LSH pair cosines, shared by the near-dup pair query
    * and the embedding-cluster resolution query. */
  private def bandedCosC(s: SparkSession, d: String) =
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
  private def pqCentC(s: SparkSession, d: String) =
    Cache.getOrPersist(s, "pq_codebook", d)(
      VectorSearch.pqTrain(emb(s, d).select(col("vec_id"), col("embedding"))))

  private def pqCodesC(s: SparkSession, d: String) =
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
  private def ivfPqShortlistC(s: SparkSession, d: String) =
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
    ()
  }

  /** q_dataset_mix rates (shared by query and oracle). */
  private val MixRates =
    Map("src0" -> 1.5, "src1" -> 0.5, "src2" -> 0.1)

  /** q_lsh_recall ground-truth Jaccard threshold: the sf corpus is
    * cleanly bimodal (observed: 25 pairs ≥ 0.5, everything else
    * < 0.1 at sf0.01), so 0.3 selects exactly the true near-dup
    * population either mode would. */
  private val LshRecallThresh = 0.3

  /** q_pmi_bigrams min bigram count: PMI explodes on rare pairs
    * (c12=1 pairs of rare words dominate any top-k), so collocation
    * extraction floors the pair count first — the standard Church &
    * Hanks guard. */
  private val PmiMinCount = 5

  /** q_semdedup cosine threshold: below the synthetic embeddings'
    * natural pair-cosine ceiling (~0.51 max within-cell pair at
    * sf0.01) so a REAL but partial dup population exists — ~20% of
    * vectors flag, 80% survive (production paraphrase dedup runs
    * τ≈0.95 on real embeddings). */
  private val SemTau = 0.35

  /** q_semdedup cell-membership cap (the LSH bucket-cap policy
    * applied to k-means cells): over-cap cells skip pair generation
    * and their members are flagged, bounding the within-cell
    * quadratic term no matter how skewed the clustering. 65 sits
    * inside the sf0.01 cell-size range (53–71), so BOTH branches are
    * exercised — the RescueCap=15 convention; production caps are
    * ~10× the k ≈ N/m target cell size. */
  private val SemCellCap = 65

  /** q_semdedup sub-split width: over-cap cells split into ksub
    * sub-cells (one deterministic k-means iteration scoped to the
    * cell) before the rescue dedup pass. At sf0.01 the over-cap cells
    * (66–71 members) split into sub-cells well under the 65 cap, so
    * the rescued branch carries real verdicts. */
  private val SemSubK = 4

  /** q_split_leakage document-frequency cap: shingles in more docs
    * than this are boilerplate, not leakage evidence — and excluding
    * them bounds the leakage join's per-shingle fan-out. 5 at sf0.01
    * actually excludes shingles (observed DF reaches 7), so the cap
    * path is exercised; production runs use the same order (GPT-3's
    * audit dropped 13-grams above tiny DF for the same reason). */
  private val LeakDfCap = 5

  /** q_split_assign bands (shared by query and oracle). */
  private val SplitBands =
    Seq("test" -> 1.0, "train" -> 98.0, "val" -> 1.0)

  /** Per-block UNION ALL: (doc_id, simhash, blk, bv) from `src`, with
    * `sigExpr` as the (possibly rotated) signature to block on —
    * mirrors Dedup.simhashBlockRows term for term. */
  private def simhashBlocksSql(src: String, sigExpr: String): String =
    (0 until Dedup.SimhashBlocks).map(b =>
      s"SELECT doc_id, simhash, $b AS blk, " +
        s"CAST(floor(($sigExpr) / power(${Dedup.SimhashBlockBase}, $b)) AS BIGINT)" +
        s" % ${Dedup.SimhashBlockBase} AS bv " +
        s"FROM $src").mkString(" UNION ALL ")

  /** Capped pair CTEs over a blocks CTE: ok-bucket filter (cap), kept
    * rows, distinct candidate pairs — Dedup.simhashPairsFromBlocks. */
  private def simhashCappedPairsSql(blocks: String, cap: Int,
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
  private lazy val simhashPairCtes: String = {
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

  private val normSqlExpr =
    "array_to_string(string_split(text,' ')[1:5], ' ')"

  /** Shared by q_bpe_tokens (replace chain) and q_bpe_tokens_kernel
    * (rank-indexed kernel): the subword count is the `]`-count of the
    * folded string — the exact twin of Bpe.docBpeCol. LEFT JOIN keeps
    * any doc whose word list is empty at n_bpe = 0. */
  private lazy val bpeTokensOracleSql: String =
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
    * q_label_noise. */
  private def knnPerProbe(s: SparkSession, d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      graft.expr.GraftFunctions.ensureRegistered(s)
      val e = emb(s, d).select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
      val probes = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("true_label"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      val served = VectorSearch.sqRerank(
          ivfPqShortlistC(s, d)
            .join(broadcast(queries.select(col("qid"))), Seq("qid"),
              "left_semi"),
          e, "qid", 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall"))
        .orderBy(col("qid"))
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

    // Multi-band sign-LSH pair search (4 tables × 16 bits, bucket cap):
    // the sub-quadratic scale path — see VectorSearch's banding notes.
    // int8 scalar quantization of the embedding corpus: per-dim
    // min/max training + encode + per-vector reconstruction-error
    // summary (see VectorSearch.scalarQuantize).
    "q_embed_quantize" -> ((s, d) =>
      VectorSearch.scalarQuantize(
          emb(s, d).select(col("vec_id"), col("embedding")))
        .orderBy(col("vec_id"))),

    "q_embed_near_dup" -> ((s, d) =>
      bandedCosC(s, d)
        .orderBy(col("cos_sim").desc, col("v1"), col("v2"))
        .limit(100)),

    // Deterministic ~10% corpus cut: portable-hash gate on doc_id —
    // a pure post-scan filter, zero shuffle, identical rows on any
    // engine/partitioning (ext.Sampling rationale).
    "q_hash_sample" -> ((s, d) =>
      Sampling.hashSample(docs(s, d), col("doc_id").cast("string"), 10.0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Deterministic train/val/test split (98/1/1): stable under
    // re-runs, partitioning and engine; new data never moves existing
    // rows between splits; per-row gate, no shuffle.
    "q_split_assign" -> ((s, d) =>
      Sampling.splitAssign(docs(s, d), col("doc_id").cast("string"),
          SplitBands)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy(col("split"))),

    // Marginal-novelty read-out: how much NEW content an incoming
    // crawl batch (the standing doc_id%10==7 convention) adds against
    // the base corpus, per document — the data-value metric a crawl
    // budget is allocated by (a batch that is 95% seen shingles is
    // not worth its ingest cost). One anti-join-shaped left join on
    // the shingle key over the shared distinct-shingle cache; at
    // 100 TB the base side reduces to its distinct shingle set once
    // and both sides shuffle only on the shingle hash.
    "q_ngram_novelty" -> ((s, d) => {
      val ds = distinctShinglesC(s, d)
      val batch = ds.where(col("doc_id") % 10 === 7)
      val base = ds.where(col("doc_id") % 10 =!= 7)
        .select(col("shingle")).distinct()
        .withColumn("seen", lit(1L))
      batch.join(base, Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty", Det.r4(
          col("n_novel").cast("double") / col("n_shingles")))
        .orderBy(col("doc_id"))
    }),

    // Distribution-drift monitor: exact length octiles of the two
    // hash-split halves, compared element-wise — the KS-shaped check
    // a pipeline runs before trusting a split (or a new crawl batch)
    // to be exchangeable. Eighths, not deciles: k/8 is exact binary,
    // so rank = (n·k) div 8 replays identically everywhere (the RFM
    // quartile lesson; 0.1·n in IEEE is NOT (n)//10). Quantiles come
    // from per-(split, value) counts + a cumulative window over the
    // bounded VALUE axis — scale-safe where a per-split row ranking
    // would single-thread each split — and every emitted number is an
    // integer: no double crosses the oracle boundary at all.
    // Population Stability Index between the even/odd doc-id halves'
    // length distributions — THE drift dashboard number (banking
    // scorecard heritage; same role in a data pipeline: "did this
    // ingest batch shift the distribution?"). Ten equal-width buckets
    // off the corpus max; PSI_bits = Σ (p_i − q_i)·log2(p_i/q_i) —
    // the bit-base variant (conventionally ln; ln = log2·ln2, a
    // constant factor, so thresholds rescale). EXACT integer path:
    // add-1 smoothed counts, p−q as S-scaled integer division, and
    // log2(p/q) = log2Fx(n_p·N_q) − log2Fx(n_q·N_p) — products stay
    // far under 2^63 and the fraction never materializes as a
    // double. Per-bucket terms emitted (monitor-friendly: WHICH
    // bucket drifted); consumer sums psi_term_fx for the headline.
    // One groupBy + broadcast scalar totals — scan speed at 100 TB.
    "q_psi_drift" -> ((s, d) => {
      val S = LmScore.LogScale
      val mx = docs(s, d).agg(max(col("n_chars")).as("mx"))
      val b = docs(s, d).crossJoin(broadcast(mx))
        .select(expr("(n_chars * 10) div (mx + 1)").as("bucket"),
          (col("doc_id") % 2 === 0).as("is_ref"))
      val counts = s.range(0, 10).select(col("id").as("bucket"))
        .join(b.groupBy(col("bucket")).agg(
          sum(when(col("is_ref"), 1L).otherwise(0L)).as("r0"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c0")),
          Seq("bucket"), "left")
        // add-1 smoothing: PSI's log blows up on an empty bucket;
        // the +1 prior is the standard fix and keeps log2Fx positive
        .select(col("bucket"),
          (coalesce(col("r0"), lit(0L)) + 1L).as("n_ref"),
          (coalesce(col("c0"), lit(0L)) + 1L).as("n_cur"))
      // the formula itself lives in ONE place (Drift.psiTerms) so
      // this scored monitor and the streaming gate cannot drift
      Drift.psiTerms(counts)
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          col("psi_term_fx"),
          Det.r4(col("psi_term_fx").cast("double") /
            lit(S.toDouble * S.toDouble)).as("psi_term_bits"))
        .orderBy(col("bucket"))
    }),

    "q_quantile_drift" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gate = PortableHash.spread(
        PortableHash.h(col("doc_id").cast("string")))
      val gated = docs(s, d).select(col("n_chars"),
        when(gate < lit(500000L), lit("train")).otherwise(lit("hold"))
          .as("split"))
      val counts = gated.groupBy(col("split"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("split")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = counts
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c"))
          .over(Window.partitionBy(col("split"))))
      val ks = s.range(1, 8).select(col("id").as("k"))
      val picks = cum.join(ks, col("cum") >= expr("(n * k) div 8") + 1)
        .groupBy(col("split"), col("k"))
        .agg(min(col("n_chars")).as("v"))
      picks.groupBy(col("k"))
        .agg(max(when(col("split") === "train", col("v"))).as("train_v"),
          max(when(col("split") === "hold", col("v"))).as("hold_v"))
        .withColumn("abs_diff", abs(col("train_v") - col("hold_v")))
        .orderBy(col("k"))
    }),

    // The RELEASE MANIFEST — what a dataset freeze actually ships:
    // per split (the q_split_assign bands), doc/char/token totals and
    // a content fingerprint (sum of per-doc text hashes — any changed
    // or reordered-in or dropped row moves it). One scan, partial/
    // final agg; the fingerprint makes two builds of "the same"
    // release byte-comparable without diffing corpora.
    "q_release_manifest" -> ((s, d) =>
      Sampling.splitAssign(docs(s, d), col("doc_id").cast("string"),
          SplitBands)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long")).as("n_tokens"),
          sum(PortableHash.spread(PortableHash.h(col("text"))))
            .as("content_fingerprint"))
        .orderBy(col("split"))),

    // Deterministic stratified sample: 20 docs per language by
    // smallest (hash, key) — seeded-reservoir analog.
    "q_stratified_sample" -> ((s, d) =>
      Sampling.stratified(docs(s, d), col("lang"),
          col("doc_id").cast("string"), 20)
        .select(col("lang"), col("doc_id"),
          col("sample_rank").cast("long").as("sample_rank"))
        .orderBy(col("lang"), col("sample_rank"))),

    // Weighted training mix: 1.5 epochs of src0, half of src1, a
    // tenth of src2, 1 epoch of everything else — deterministic
    // per-row gate + generate, no shuffle.
    "q_dataset_mix" -> ((s, d) =>
      Sampling.weightedMix(docs(s, d), col("source"),
          col("doc_id").cast("string"), MixRates, defaultRate = 1.0)
        .select(col("doc_id"), col("source"), col("copy_id"))
        .orderBy(col("doc_id"), col("copy_id"))),

    // Benchmark decontamination: every training doc sharing >=1 exact
    // 3-gram with the "benchmark suite" (docs with doc_id % 20 == 0
    // stand in for a held-out eval set), with how many distinct
    // n-grams and how many distinct benchmark docs it collides with.
    // Scale shape: benchmark suites are O(thousands of docs) — tiny
    // next to the training corpus — so the benchmark shingle set is a
    // (gated, memoized) broadcast and the corpus-sized side never
    // shuffles on the join; real pipelines raise n to 8–13, which
    // only SHRINKS the collision sets.
    "q_decontaminate" -> ((s, d) => {
      val ds = distinctShinglesC(s, d)
      val bench = graft.core.Broadcasts.gatedMemo(
        ds.where(col("doc_id") % 20 === 0),
        "spark.graft.decontam.broadcastMax", s"decontam_bench:$d")
      Dedup.contaminationHits(ds.where(col("doc_id") % 20 =!= 0), bench)
        .orderBy(col("doc_id"))
    }),

    // SEMANTIC decontamination — the embedding-space complement to
    // the n-gram overlap check (a paraphrased benchmark item shares
    // no 3-grams but sits next to its source in embedding space; the
    // practice several dataset cards now report alongside exact
    // overlap). Every corpus vector scored against the FULL bench
    // set (vec_id%20, the q_decontaminate split convention) via a
    // broadcast nested-loop — at 100 TB this brute force IS the
    // scale path, because benchmark sets are thousands of rows while
    // the corpus side streams once, partition-parallel, unshuffled.
    // Emits the per-vector nearest bench item + max cosine + the
    // ≥0.45 contamination flag, so the cut threshold is auditable
    // rather than silently applied.
    "q_semantic_decontaminate" -> ((s, d) => {
      graft.expr.GraftFunctions.ensureRegistered(s)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val bench = e.where(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bvec"),
          VectorSearch.fixedNormSq(col("embedding")).as("bnrm"))
      e.where(col("vec_id") % 20 =!= 0)
        .withColumn("nrm", VectorSearch.fixedNormSq(col("embedding")))
        .crossJoin(broadcast(bench))
        .select(col("vec_id"), col("bench_id"),
          Det.r4(VectorSearch.cosineCol(
            VectorSearch.fixedDot(col("embedding"), col("bvec")),
            col("nrm"), col("bnrm"))).as("cos_sim"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos_sim"), (-col("bench_id")).as("nb")))
          .as("m"))
        .select(col("vec_id"), (-col("m.nb")).as("bench_id"),
          col("m.cos_sim").as("cos_sim"),
          (col("m.cos_sim") >= lit(0.45)).cast("long").as("contaminated"))
        .orderBy(col("vec_id"))
    }),

    // Rendezvous (highest-random-weight) sharding (Thaler & Ravishankar
    // 1998 — the consistent-placement scheme behind cache rings):
    // every doc goes to the shard whose h(doc:shard) weight is
    // highest. The audit pairs the 16-shard assignment with the
    // 17-shard one: HRW guarantees a doc either stays put or moves
    // to the NEW shard, so `n_moved_elsewhere` is a proven-zero
    // column and `n_moved` ≈ n/17 — the minimal-churn property a
    // resharding plan is approved on. One crossJoin against the
    // broadcast 17-row shard axis, both argmaxes in ONE partial/final
    // agg, no second pass.
    "q_rendezvous_shards" -> ((s, d) => {
      import graft.core.PortableHash
      val shards = s.range(0, 17).select(col("id").as("shard"))
      docs(s, d).select(col("doc_id"))
        .crossJoin(broadcast(shards))
        .withColumn("wgt", PortableHash.spread(PortableHash.h(
          concat(col("doc_id").cast("string"), lit(":"),
            col("shard").cast("string")))))
        .groupBy(col("doc_id"))
        .agg(
          max(when(col("shard") < 16,
            struct(col("wgt"), (-col("shard")).as("ns")))).as("m16"),
          max(struct(col("wgt"), (-col("shard")).as("ns"))).as("m17"))
        .select(col("doc_id"), (-col("m16.ns")).as("a16"),
          (-col("m17.ns")).as("a17"))
        .groupBy(col("a16"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("a17") =!= col("a16")).cast("long")).as("n_moved"),
          sum((col("a17") =!= col("a16") && col("a17") =!= 16)
            .cast("long")).as("n_moved_elsewhere"))
        .select(col("a16").as("shard"), col("n_docs"), col("n_moved"),
          col("n_moved_elsewhere"))
        .orderBy(col("shard"))
    }),

    // Greedy k-center coreset (Gonzalez 1985 farthest-point — the
    // active-learning / coreset selection primitive): 8 centers
    // picked by iterated "farthest from nearest selected", then the
    // per-vector assignment (nearest center by cosine, ties to the
    // smaller id). Selection is k bounded scalar fetches over
    // broadcast-vs-scan rounds; the oracle replays every round's
    // argmin and the final assignment.
    "q_coreset_kcenter" -> ((s, d) => {
      graft.expr.GraftFunctions.ensureRegistered(s)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val centers = VectorSearch.kcenterCoreset(e, 8, s"kcenter8:$d")
      val en = e.withColumn("nrm",
        VectorSearch.fixedNormSq(col("embedding")))
      val sel = en.where(col("vec_id").isin(centers: _*))
        .select(col("vec_id").as("center_id"),
          col("embedding").as("cvec"), col("nrm").as("cnrm"))
      en.crossJoin(broadcast(sel))
        .select(col("vec_id"), col("center_id"),
          Det.r4(VectorSearch.cosineCol(
            VectorSearch.fixedDot(col("embedding"), col("cvec")),
            col("nrm"), col("cnrm"))).as("cs"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cs"), (-col("center_id")).as("nc"))).as("m"))
        .select(col("vec_id"), (-col("m.nc")).as("center_id"),
          col("m.cs").as("cos_sim"))
        .orderBy(col("vec_id"))
    }),

    // Source-overlap matrix: distinct shared 3-grams per source pair —
    // the corpus-audit view of cross-source contamination (a crawl
    // re-ingested under two source labels lights up here first).
    // Shape: distinct (source, shingle) → self-join on shingle
    // (s1 < s2) → count distinct shingles per pair. The pair blowup
    // per shingle is bounded by C(|sources|, 2), not corpus size, and
    // the join shuffles on the shingle key.
    "q_source_overlap" -> ((s, d) => {
      // reuses the session-cached distinct shingle set; the doc→source
      // map is O(docs) and broadcasts. ss is distinct (source,
      // shingle), so each shared shingle contributes exactly ONE row
      // per pair — count(*) equals count(DISTINCT) without the extra
      // dedup shuffle the explicit distinct-count would run.
      val ss = distinctShinglesC(s, d)
        .join(broadcast(docs(s, d).select(col("doc_id"), col("source"))),
          Seq("doc_id"))
        .select(col("source"), col("shingle")).distinct()
      ss.select(col("source").as("s1"), col("shingle"))
        .join(ss.select(col("source").as("s2"), col("shingle")), Seq("shingle"))
        .where(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2"))
        .agg(count(lit(1)).as("shared_shingles"))
        .orderBy(col("s1"), col("s2"))
    }),

    // The Bloom-prefiltered decontamination path — the shape for a
    // benchmark set too large to broadcast: a Bloom filter over the
    // benchmark shingles prunes the corpus side BEFORE the join
    // shuffle; false positives are removed by the exact join, so the
    // result (and the oracle) is identical to q_decontaminate. No
    // broadcast hint here on purpose — this is the non-broadcast
    // join's escort.
    "q_decontaminate_bloom" -> ((s, d) => {
      val ds = distinctShinglesC(s, d)
      Dedup.contaminationHitsBloom(
        ds.where(col("doc_id") % 20 =!= 0),
        ds.where(col("doc_id") % 20 === 0))
        .orderBy(col("doc_id"))
    }),

    // Train/test split leakage audit — decontamination's INTERNAL
    // twin: q_decontaminate screens against an external benchmark;
    // this reports holdout (test/val) docs that share rare 3-grams
    // with the TRAIN split of the same corpus, the overlap that
    // silently inflates held-out eval (GPT-3's appendix-C n-gram
    // audit, run split-vs-split). Split membership is the SAME
    // per-row hash gate as q_split_assign — no doc list is shipped
    // anywhere. Shingles with document frequency > LeakDfCap are
    // excluded: boilerplate n-grams are not leakage evidence, and the
    // cap bounds the shingle join's fan-out (≤ cap train rows per
    // shingle), which is what keeps this linear at 100 TB.
    "q_split_leakage" -> ((s, d) => {
      val ds = distinctShinglesC(s, d)
      // the rare-shingle list is a per-dir artifact (used twice per
      // action by the join planner's two sides) — session-cache it
      val kept = Cache.getOrPersist(s, "shingle_df_kept", d)(
        ds.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df"))
          .where(col("df") <= LeakDfCap)
          .select(col("shingle")))
      val tagged = Sampling.splitAssign(ds, col("doc_id").cast("string"),
        SplitBands)
      val train = tagged.where(col("split") === "train")
        .join(kept, Seq("shingle"))
        .select(col("shingle"), col("doc_id").as("train_doc"))
      val holdout = tagged.where(col("split") =!= "train")
        .select(col("split"), col("shingle"), col("doc_id"))
      holdout.join(train, Seq("shingle"))
        .groupBy(col("split"), col("doc_id"))
        .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
          countDistinct(col("train_doc")).as("n_train_docs"))
        .orderBy(col("split"), col("doc_id"))
    }),

    // Percentile-based curation cut: keep the top 90% of docs by
    // quality score, cutting at the EXACT element at rank ⌊0.1·n⌋
    // (no interpolation — the threshold is an actual r4-quantized
    // score, so its bits are engine-portable and the tie policy
    // `>= threshold` is deterministic). The threshold comes from the
    // distributed-sort order-statistic path (core.Quantiles), the
    // survivors from a shuffle-free scalar filter — at 100 TB that is
    // one sort of the score column plus one scan, vs window-ranking
    // the whole corpus.
    "q_quality_cut" -> ((s, d) => {
      val quals = TextAnalysis.qualityColumns(docs(s, d))
        .select(col("doc_id"), col("quality"))
      val thr = graft.core.Quantiles.valueAtFractionMemo(
        quals, "quality", 0.1, s"quality_p10:$d")
      quals.where(col("quality") >= lit(thr))
        .orderBy(col("doc_id"))
    }),

    // Inter-filter agreement (Cohen's kappa): do the Gopher rule
    // filter and the quality-score p10 cut agree beyond chance? The
    // curation question this answers is real — two filters that
    // agree at kappa ≈ 1 are redundant (drop one), near 0 they cut
    // INDEPENDENT slices (compounding loss needs review). Both
    // raters are recomputed from their own definitions (gopherRules;
    // the memoized p10 threshold q_quality_cut already shares), the
    // 2×2 confusion cells are one partial/final agg, and kappa
    // collapses to a SINGLE double division of two exact integers:
    // (n·agree − Σ marginal products) / (n² − Σ marginal products) —
    // so the statistic crosses the oracle boundary bit-exact under
    // one r4 snap.
    "q_filter_kappa" -> ((s, d) => {
      val r1 = TextAnalysis.gopherRules(docs(s, d))
        .select(col("doc_id"), col("keep").as("r1"))
      val quals = TextAnalysis.qualityColumns(docs(s, d))
        .select(col("doc_id"), col("quality"))
      val thr = graft.core.Quantiles.valueAtFractionMemo(
        quals, "quality", 0.1, s"quality_p10:$d")
      val r2 = quals.select(col("doc_id"),
        (col("quality") >= lit(thr)).cast("long").as("r2"))
      r1.join(r2, Seq("doc_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("r1") * col("r2")).as("n11"),
          sum(col("r1") * (lit(1L) - col("r2"))).as("n10"),
          sum((lit(1L) - col("r1")) * col("r2")).as("n01"),
          sum((lit(1L) - col("r1")) * (lit(1L) - col("r2"))).as("n00"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          (col("n11") + col("n00")).as("n_agree"),
          Det.r4(
            (col("n") * (col("n11") + col("n00")) -
              ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
               (col("n01") + col("n00")) * (col("n10") + col("n00"))))
              .cast("double") /
            (col("n") * col("n") -
              ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
               (col("n01") + col("n00")) * (col("n10") + col("n00"))))
              .cast("double")).as("kappa"))
    }),

    // Gopher-style repetition filter signals: per-doc duplicate-3-gram
    // fraction and the hottest shingle's multiplicity. Two partial/
    // final aggregations, never a self-join — the per-(doc, shingle)
    // counts collapse before the per-doc rollup.
    "q_repetition_filter" -> ((s, d) =>
      TextAnalysis.repetitionSignals(docs(s, d)).orderBy(col("doc_id"))),

    // PII scan + redaction: per-doc email/IPv4/long-number match
    // counts and the redacted text pinned by length + portable hash.
    // Deterministic PII is planted first (the synthetic corpus has
    // none), so the oracle exercises the cross-engine regex
    // machinery, not an all-zeros row set. Pure codegen'd Column
    // regex — shuffle-free, scan-parallel at any corpus size.
    "q_pii_redact" -> ((s, d) =>
      TextAnalysis.piiColumns(docs(s, d)).orderBy(col("doc_id"))),

    // Context-window chunking: fixed-size overlapping char chunks via
    // generated offsets + explode — fan-out multiplies rows in place,
    // never shuffles them. Chunk bytes pinned by (len, portable hash).
    "q_chunk_docs" -> ((s, d) =>
      Packing.chunkDocs(docs(s, d))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Concatenate-and-cut sequence packing: exact global token
    // offsets via the two-pass distributed prefix sum (range sort +
    // one partial per partition + broadcast seeds — never a global
    // single-reducer window), then the first/last capacity-sized
    // training bin each doc touches. Memoized per (session, dir)
    // because the prefix-sum pins its sorted RDD (Packing scaladoc).
    "q_pack_sequences" -> ((s, d) =>
      Cache.getOrPersist(s, "pack_sequences", d)(
        Packing.packSequences(docs(s, d),
          size(split(col("text"), " ")), col("doc_id"))
          .withColumnRenamed("k", "doc_id"))
        .orderBy(col("doc_id"))),

    // Balanced shard manifest — the release step after packing: lay
    // the corpus out in a DETERMINISTIC pseudo-random order (portable
    // hash of doc_id, doc_id tiebreak — the epoch-shuffle every
    // training run needs to be reproducible) and cut it into 16
    // token-balanced shards. Shard = ⌊offset·N/T⌋ over the exact
    // global token prefix sum, which reuses packSequences' two-pass
    // machinery (range sort + one partial per partition + broadcast
    // seeds) — never a single-reducer global window — so the same
    // code path produces byte-identical shard boundaries on 32 cores
    // or 1000 executors. Each doc lands wholly in one shard; the
    // per-shard deviation column (n_tokens·N − T) bounds imbalance
    // by N × the largest document, the guarantee a loader relies on.
    "q_shard_manifest" -> ((s, d) => {
      val nShards = 16L
      val dtok = docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        PortableHash.h(col("doc_id").cast("string")).cast("long").as("h"))
      val total = dtok.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
      val keyed = dtok.select(
        (col("h") * lit(1L << 24) + col("doc_id")).as("k2"),
        col("n_tokens"))
      Packing.packSequences(keyed, col("n_tokens"), col("k2"))
        .select((col("k") % lit(1L << 24)).as("doc_id"),
          col("n_tokens"), col("tok_offset"))
        .withColumn("shard",
          least(expr(s"tok_offset * $nShards div ${total}L"),
            lit(nShards - 1L)))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          col("min_doc"), col("max_doc"),
          (col("n_tokens") * lit(nShards) - lit(total))
            .as("dev_from_ideal_xn"))
        .orderBy(col("shard"))
    }),

    // DSIR importance weights (Xie et al. 2023): per-doc log-ratio of
    // hashed-bigram likelihood under the TARGET distribution (lang =
    // 'en' — the in-domain proxy) vs the RAW corpus — the score
    // data-selection-for-LM pipelines resample by. All log arithmetic
    // rides the LmScore integer-log2 pipeline (bit-length + mantissa
    // table, ×2²⁰ fixed point), so the weight is an exact BIGINT on
    // both engines. Scale shape: features hash into 1024 buckets, so
    // both distributions are B-bounded aggregates; the per-bucket
    // log-ratio table is a broadcast; the per-doc weight is one
    // broadcast join + partial/final sum over the bigram stream —
    // and the corpus-total terms fold in as n_bigrams × constant
    // instead of joining a scalar into every row.
    "q_dsir_weights" -> ((s, d) => {
      val B = 1024L
      val ws = split(col("text"), " ")
      val bg = docs(s, d).where(size(ws) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(transform(sequence(lit(1), size(ws) - 1),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
            .as("bigram"))
      val bkC = Cache.getOrPersist(s, "dsir_buckets", d)(
        bg.select(col("doc_id"), col("lang"),
          (PortableHash.h(col("bigram")).cast("long") % lit(B)).as("bkt")))
      val rc = bkC.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
      val tc = bkC.where(col("lang") === "en")
        .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
      val totals = bkC.agg(count(lit(1)).as("tr"),
        sum((col("lang") === "en").cast("long")).as("tt")).collect()(0)
      val constFx = LmScore.log2FxLong(totals.getLong(0) + B) -
        LmScore.log2FxLong(totals.getLong(1) + B)
      val lr = rc.join(tc, Seq("bkt"), "left").na.fill(0L, Seq("ct"))
        .select(col("bkt"),
          (LmScore.log2FxCol(col("ct") + lit(1L)) -
            LmScore.log2FxCol(col("cr") + lit(1L))).as("lr"))
      bkC.join(broadcast(lr), Seq("bkt"))
        .groupBy(col("doc_id"))
        .agg(max(col("lang")).as("lang"),
          count(lit(1)).as("n_bigrams"), sum(col("lr")).as("sum_lr"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          (col("sum_lr") + col("n_bigrams") * lit(constFx)).as("w_fx"),
          Det.r4((col("sum_lr") + col("n_bigrams") * lit(constFx))
            .cast("double") / lit(LmScore.LogScale.toDouble)).as("logw"))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM Viterbi segmentation (Unigram.scala — the
    // SentencePiece complement to the BPE merge family): every
    // distinct corpus word segmented into its minimum-cost piece
    // sequence under the capped substring-frequency model, costs in
    // exact integer log2 fixed point. The oracle replays model AND
    // Viterbi: a recursive CTE carries the 4-slot DP state and sorts
    // each step's transition candidates by (cost, n_pieces, 4−k) —
    // the same total order the kernel's descending-k strict
    // replacement realizes.
    "q_unigram_segment" -> ((s, d) =>
      Cache.getOrPersist(s, "unigram_seg", d)(
        Unigram.segmentsAll(docs(s, d), d))
        .orderBy(col("word"))),

    // Per-language fertility (pieces per word) under the unigram
    // model — the tokenizer-quality readout that decides whether a
    // vocab budget fits a language mix. The corpus word STREAM joins
    // the O(|distinct words|) broadcast segment table; text never
    // shuffles.
    "q_unigram_fertility" -> ((s, d) => {
      val seg = Cache.getOrPersist(s, "unigram_seg", d)(
        Unigram.segmentsAll(docs(s, d), d))
      docs(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .join(broadcast(seg.select(col("word"), col("n_pieces"),
          col("cost_fx"))), Seq("word"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("cost_fx")).as("cost_fx"))
        .select(col("lang"), col("n_words"), col("n_pieces"),
          col("cost_fx"),
          Det.r4(col("n_pieces").cast("double") /
            col("n_words").cast("double")).as("fertility"))
        .orderBy(col("lang"))
    }),

    // WordPiece greedy longest-match segmentation (WordPiece.scala —
    // the BERT-tokenizer third of the subword trio beside BPE merges
    // and unigram-LM Viterbi): every distinct corpus word walked
    // left-to-right taking the LONGEST vocab piece at each position,
    // continuation pieces as the `##` class. The oracle replays model
    // AND walk: a recursive CTE advances a cursor by the largest k
    // whose marked piece joins the vocab — greedy is a total order,
    // so `seg` strings match byte for byte.
    "q_wordpiece_segment" -> ((s, d) =>
      Cache.getOrPersist(s, "wordpiece_seg", d)(
        WordPiece.segmentsAll(docs(s, d), d))
        .orderBy(col("word"))),

    // Per-language WordPiece fertility — the third column of the
    // tokenizer-choice comparison (q_bpe_fertility /
    // q_unigram_fertility / this): same word stream, same broadcast
    // segment-table join, so the three numbers are directly
    // comparable.
    "q_wordpiece_fertility" -> ((s, d) => {
      val seg = Cache.getOrPersist(s, "wordpiece_seg", d)(
        WordPiece.segmentsAll(docs(s, d), d))
      docs(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .join(broadcast(seg.select(col("word"), col("n_pieces"))),
          Seq("word"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"))
        .select(col("lang"), col("n_words"), col("n_pieces"),
          Det.r4(col("n_pieces").cast("double") /
            col("n_words").cast("double")).as("fertility"))
        .orderBy(col("lang"))
    }),

    // Temperature-scaled domain mixing weights (the multilingual/
    // multi-domain training-mix formula): w_i ∝ p_i^(3/4) over each
    // source's share of corpus chars. Portability: alpha = 3/4 is
    // computed as sqrt(sqrt(p³)) — sqrt is IEEE correctly-rounded on
    // both engines, pow() is not; the weight normalizer is a
    // fixed-point (1e-9) integer sum, so no double addition order can
    // differ. The two totals ride on a broadcast cross join — the
    // by-source frame is O(sources).
    // Cluster-balanced mixing weights: the p^(3/4) temperature
    // formula applied to EMBEDDING-CLUSTER shares instead of source
    // labels — the semantic complement to q_domain_mix_weights (a
    // single web source hides many topical clusters; balancing on
    // k-means cells is how a curation run up-weights rare topics it
    // has no label for). Reuses the session k-means assignment the
    // SemDeDup/topics family trains; same sqrt(sqrt(p³)) portability
    // trick, same fixed-point snap.
    "q_cluster_mix_weights" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cells = Cache.getOrPersist(s, "kmeans_cells_8_2", d)(
        VectorSearch.kmeansCells(e, k = 8, iters = 2))
      val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
        VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))
      val byCell = Cache.getOrPersist(s, "semdedup_assign_8_2", d)(
          VectorSearch.assignCells(e, cellsB))
        .groupBy(col("cell_id")).agg(count(lit(1)).as("n_docs"))
      val tot = byCell.agg(sum(col("n_docs")).as("tot"))
      val p = col("n_docs").cast("double") / col("tot").cast("double")
      val wraw = sqrt(sqrt(p * p * p))
      val snapped = byCell.crossJoin(broadcast(tot))
        .select(col("cell_id"), col("n_docs"), Det.r4(p).as("p"),
          floor(wraw * lit(1.0e9) + lit(0.5)).cast("long").as("wfx"))
      val wtot = snapped.agg(sum(col("wfx")).as("wtot"))
      snapped.crossJoin(broadcast(wtot))
        .select(col("cell_id"), col("n_docs"), col("p"),
          Det.r4(col("wfx").cast("double") / col("wtot").cast("double"))
            .as("w"))
        .orderBy(col("cell_id"))
    }),

    "q_domain_mix_weights" -> ((s, d) => {
      val bySrc = docs(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      val tot = bySrc.agg(sum(col("n_chars")).as("tot"))
      val p = col("n_chars").cast("double") / col("tot").cast("double")
      val wraw = sqrt(sqrt(p * p * p))
      val snapped = bySrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_chars"),
          Det.r4(p).as("p"),
          floor(wraw * lit(1.0e9) + lit(0.5)).cast("long").as("wfx"))
      val wtot = snapped.agg(sum(col("wfx")).as("wtot"))
      snapped.crossJoin(broadcast(wtot))
        .select(col("source"), col("n_docs"), col("n_chars"), col("p"),
          Det.r4(col("wfx").cast("double") / col("wtot").cast("double"))
            .as("w"))
        .orderBy(col("source"))
    }),

    // Token-budget mixture planning (the LLaMA-1 Table-1 / DoReMi
    // shape): temperature-scaled target weights over per-source TOKEN
    // shares, then a planned-token allocation for a training budget
    // of 4× the corpus and the per-source repeat factor ("epochs")
    // that allocation implies — the number a curation run actually
    // publishes (w alone doesn't say how many times src9 repeats).
    // Same portability discipline as q_domain_mix_weights: α=3/4 via
    // nested sqrt, 1e-9 fixed-point weight normalizer, and every
    // double expression mirrored operation-for-operation in the
    // oracle. All frames past the one corpus scan are O(sources).
    "q_mix_epochs" -> ((s, d) => {
      val bySrc = docs(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("toks"))
      val tot = bySrc.agg(sum(col("toks")).as("ttot"))
      val p = col("toks").cast("double") / col("ttot").cast("double")
      val wraw = sqrt(sqrt(p * p * p))
      val snapped = bySrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("toks"), col("ttot"),
          Det.r4(p).as("p"),
          floor(wraw * lit(1.0e9) + lit(0.5)).cast("long").as("wfx"))
      val wtot = snapped.agg(sum(col("wfx")).as("wtot"))
      val planned = col("wfx").cast("double") * lit(4.0) *
        col("ttot").cast("double") / col("wtot").cast("double")
      snapped.crossJoin(broadcast(wtot))
        .select(col("source"), col("n_docs"), col("toks"), col("p"),
          Det.r4(col("wfx").cast("double") / col("wtot").cast("double"))
            .as("w"),
          floor(planned + lit(0.5)).cast("long").as("planned_toks"),
          Det.r4(planned / col("toks").cast("double")).as("epochs"))
        .orderBy(col("source"))
    }),

    // Aho–Corasick multi-keyword tagging: one automaton pass over
    // the corpus counts every dictionary occurrence — vs k regexp
    // scans. The kernel is partition-parallel (KeywordTags); the
    // dictionary is border-free so every-occurrence == the oracle's
    // non-overlapping regexp_extract_all (KeywordTagsSpec proves the
    // equivalence and its bordered counter-example).
    "q_keyword_tags" -> ((s, d) =>
      KeywordTags.tagCounts(docs(s, d)).orderBy(col("keyword"))),

    // Zipf tail fit over the token frequency spectrum: OLS of
    // log2(freq) on log2(rank) across the top ranks — the corpus
    // health number (natural text ≈ −1; synthetic/boilerplate drifts
    // shallow). Logs ride the LmScore exact integer-log2 pipeline
    // (bit-length + 512-entry mantissa table, 2²⁰ fixed point), the
    // OLS normal equations are exact BIGINT sums, and only the final
    // slope/intercept divisions touch doubles — mirrored
    // op-for-op in the oracle. The global sort is LIMIT-bounded
    // (TakeOrdered), the rank window runs on the 30-row frame.
    "q_zipf_fit" -> ((s, d) => {
      val words = docs(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
      val freq = words.groupBy(col("w")).agg(count(lit(1)).as("f"))
      val top = freq.orderBy(col("f").desc, col("w")).limit(ZipfTopRanks)
      val win = org.apache.spark.sql.expressions.Window
        .orderBy(col("f").desc, col("w"))
      val ranked = top.select(col("f"),
        row_number().over(win).cast("long").as("r"))
      val pts = ranked.select(LmScore.log2FxCol(col("r")).as("x"),
        LmScore.log2FxCol(col("f")).as("y"))
      val sums = pts.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val nd = sums.select(col("n"), col("sx"), col("sy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          .as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          .as("den"))
      nd.select(col("n").as("n_ranks"),
        Det.r4(col("num") / col("den")).as("slope"),
        Det.r4((col("sy").cast("double") -
            col("num") / col("den") * col("sx").cast("double")) /
          col("n").cast("double") / lit(1048576.0)).as("intercept_log2"))
    }),

    // Multimodal metadata over the opaque payload column.
    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.mediaMeta(docs(s, d)).orderBy(col("doc_id"))),

    // REAL image decode, scored: render a fixture of actual encoded
    // PNG/JPEG/BMP/GIF payloads (dimensions arithmetic in doc_id),
    // decode through the partition-parallel javax.imageio kernel, and
    // let the oracle predict width/height/format from the fixture
    // constants — the row goes red if the decode ever falls back to
    // the fake path (whose dims derive from byte length, not pixels).
    "q_multimodal_decode" -> ((s, d) => {
      val p = graft.io.MediaFixtures.write(s, d)
      Multimodal.decodeAll(s.read.parquet(p)).toDF()
        .orderBy(col("doc_id"))
    }),

    // REAL audio decode, scored (the WAV analog of
    // q_multimodal_decode): render a fixture of actual RIFF/WAVE PCM
    // payloads (rate/channels/samples arithmetic in doc_id), parse
    // the headers through the partition-parallel javax.sound kernel,
    // and let the oracle predict every field from the fixture
    // constants — red if the decode ever falls back to the fake path.
    "q_multimodal_audio" -> ((s, d) => {
      val p = graft.io.AudioFixtures.write(s, d)
      Multimodal.decodeAudioAll(s.read.parquet(p)).toDF()
        .orderBy(col("doc_id"))
    }),

    // REAL multi-frame inventory, scored (the video analog of
    // q_multimodal_decode): render a fixture of actual animated-GIF
    // containers (frame count / dims / per-frame delays arithmetic in
    // doc_id and frame_id), walk the sequence with the partition-
    // parallel javax.imageio kernel, and let the oracle predict every
    // frame row from the fixture constants — a broken parser emits no
    // rows (there is deliberately no fallback), so breakage is red,
    // never silently fake.
    "q_multimodal_frames" -> ((s, d) => {
      val p = graft.io.VideoFixtures.write(s, d)
      Multimodal.frameInventory(s.read.parquet(p)).toDF()
        .orderBy(col("doc_id"), col("frame_id"))
    }),

    // TIME-budgeted frame sampling (the ffmpeg `-r` shape, not
    // every-Nth): per-frame start instants from the running sum of
    // the REAL parsed GIF delays, then one sampled frame per 10 cs
    // instant — the frame whose [start, start+delay) interval covers
    // it (a bounded interval join: ≤6 frames × ≤9 instants per
    // video). The op a video-curation pipeline runs to cut decode
    // cost before feature extraction; the oracle replays the
    // fixtures' delay formula through the same cumsum + interval
    // arithmetic, so a mis-parsed delay or off-by-one interval bound
    // moves a cell.
    "q_frame_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = graft.io.VideoFixtures.write(s, d)
      val f = Multimodal.frameInventory(s.read.parquet(p)).toDF()
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_id"))
      // eager checkpoint: tl feeds BOTH interval-join sides (directly
      // and via dur→inst) — without it every reference re-decodes all
      // fixture GIFs through the ImageIO kernel
      val tl = f
        .withColumn("start_cs", sum(col("delay_cs")).over(w)
          - col("delay_cs"))
        .select(col("doc_id"), col("frame_id"), col("delay_cs"),
          col("start_cs"))
        .localCheckpoint(true)
      val dur = tl.groupBy(col("doc_id"))
        .agg(max(col("start_cs") + col("delay_cs")).as("dur"))
      val inst = dur.select(col("doc_id"),
        explode(sequence(lit(0L), col("dur") - 1, lit(10L))).as("t_cs"))
      inst.join(tl, Seq("doc_id"))
        .where(col("t_cs") >= col("start_cs") &&
          col("t_cs") < col("start_cs") + col("delay_cs"))
        .select(col("doc_id"), col("t_cs"), col("frame_id"),
          col("start_cs"), col("delay_cs"))
        .orderBy(col("doc_id"), col("t_cs"))
    }),

    // Perceptual-hash image near-dup, scored CELL-EXACT end to end:
    // real PNGs (PhashFixtures: block-constant grids whose levels are
    // arithmetic in id) → javax.imageio decode → integer dHash-64 →
    // 4×16-bit banded candidate join (hamming ≤ 3 ⇒ some band equal,
    // the simhash pigeonhole on image hashes) → popcount rescore.
    // The oracle replays every hash bit from the grid FORMULA, never
    // the bytes — so a wrong grayscale weight, block bound, or decode
    // fallback shifts a bit and lands red. Scale shape: hashes are
    // one scan-parallel kernel pass; candidates are band-equality
    // joins (never all pairs); the rescore is a popcount on the
    // already-joined longs. 100 TB adds the bucket caps the
    // minhash/simhash family already carries.
    // Streaming MULTIMODAL ingest gate: the incremental-dedup
    // flatMapGroupsWithState gate (StreamOps.ingestDedupGate) keyed
    // by IMAGE CONTENT — dHash-64 signatures from the real decode
    // kernel. Base corpus = the original images (variant 0), reduced
    // to keep-first (sig, first_doc) state; the incoming batch is the
    // copies and mirrors. A brightness-shifted copy hashes identically
    // → dup_of_base against its original; mirrors are new unless the
    // formula says they collide. The oracle replays hashes AND gate
    // semantics (base-hit beats in-batch, first-arrival-wins by
    // doc_id) from the grid formula — streaming state logic and the
    // pixel path scored together, cell-exact. Scale: state is
    // O(distinct signatures), the image bytes never enter the gate.
    "q_stream_phash_gate" -> ((s, d) => {
      val p = graft.io.PhashFixtures.write(s, d)
      val hashed = Multimodal.dhashAll(s.read.parquet(p)).toDF()
        .select(col("doc_id"), expr("lpad(bin(dhash), 64, '0')").as("sig"))
      import s.implicits._
      val base = hashed.where(col("doc_id") % 3 === 0)
        .groupBy(col("sig")).agg(min(col("doc_id")).as("first_doc"))
        .select(col("sig"), col("first_doc"), lit(true).as("from_base"))
        .as[StreamOps.SigSeen]
      val incoming = hashed.where(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("sig")).as[StreamOps.DocSig]
      StreamOps.ingestDedupGate(incoming, base)
        .toDF().orderBy(col("doc_id"))
    }),

    // Image near-dup CLUSTERS: the q_image_phash candidate edges
    // (banded, hamming ≤ 3) run through the SAME contraction-first
    // min-label connected components as the text dedup family
    // (Dedup.connectedComponents), keeper = min img_id — closing the
    // image-dedup loop pairs → clusters → keeper exactly as
    // q_dedup_clusters does for documents. The oracle replays edges
    // from the grid formula and clusters them with the recursive
    // min-label CTE — cluster assignments are cell-exact.
    "q_image_phash_clusters" -> ((s, d) => {
      val p = graft.io.PhashFixtures.write(s, d)
      val hashes = Multimodal.dhashAll(s.read.parquet(p)).toDF()
        .select(col("doc_id").as("img_id"), col("dhash"))
      val bands = hashes.select(col("img_id"), col("dhash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bv", expr("shiftright(dhash, band * 16) & 65535"))
      val edges = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.img_id") < col("b.img_id"))
        .select(col("a.img_id").as("d1"), col("b.img_id").as("d2"),
          expr("bit_count(a.dhash ^ b.dhash)").as("hd"))
        .distinct()
        .where(col("hd") <= 3)
        .select(col("d1"), col("d2"))
      // snapshot-memoized like q_dedup_clusters: the CC fixpoint is a
      // session artifact; its warm cost is a snapshot scan
      Cache.getOrSnapshot(s, "phash_cc_clusters", d)(
          Dedup.connectedComponents(
            hashes.select(col("img_id").as("doc_id")), edges))
        .withColumn("is_keeper",
          (col("doc_id") === col("cluster_id")).cast("long"))
        .orderBy(col("doc_id"))
    }),

    // Entity resolution end-to-end (EntityResolution.scala): three
    // deterministic record sources (clean registry, CRM with an
    // off-by-one numeric typo, billing with format noise) → capped
    // multi-pass blocking → (nation, segment, levenshtein ≤ 1)
    // comparator → the dedup family's contraction-first CC →
    // per-cluster survivorship audit. The oracle replays the whole
    // pipeline: same dirty view, same blocking passes + cap, same
    // comparator, recursive min-label CC, same audit rollup.
    // Snapshot-cached like the other CC fixpoints — the resolved
    // frame is a session artifact shared with q_er_quality.
    "q_entity_resolution" -> ((s, d) =>
      EntityResolution.clusterAudit(
        Cache.getOrSnapshot(s, "er_resolved", d)(
          EntityResolution.resolved(s, d)))),

    // ER acceptance pair (the lsh_recall/precision discipline applied
    // to identity): pairwise precision AND recall vs the held-out
    // true key, computed from group sizes only — Σ C(n,2) per
    // cluster / truth key / (cluster, truth) cell — so the quality
    // readout never enumerates pairs. Expected imperfection is REAL:
    // decade-crossing typos sit at edit distance 2 (recall misses),
    // and off-by-one typos land exactly on a neighboring customer's
    // number (precision misses when nation+segment also agree) —
    // the numbers a deploy decision actually weighs.
    "q_er_quality" -> ((s, d) =>
      EntityResolution.qualityRow(
        Cache.getOrSnapshot(s, "er_resolved", d)(
          EntityResolution.resolved(s, d)))),

    // Audio content fingerprint, scored CELL-EXACT: the WAV fixture's
    // PCM samples are a sawtooth that is pure arithmetic in
    // (doc_id, sample index), so the energy-envelope bits (adjacent
    // eighth-range mean-|amplitude| comparisons) replay in SQL from
    // the formula while the engine must earn them through real
    // javax.sound PCM decode. The audio analog of q_image_phash's
    // pixel-path discipline — a header-only parse can't fake it, the
    // DATA bytes feed the answer.
    "q_audio_fingerprint" -> ((s, d) => {
      val p = graft.io.AudioFixtures.write(s, d)
      Multimodal.audioFpAll(s.read.parquet(p)).toDF()
        .orderBy(col("doc_id"))
    }),

    "q_image_phash" -> ((s, d) => {
      val p = graft.io.PhashFixtures.write(s, d)
      val hashes = Multimodal.dhashAll(s.read.parquet(p)).toDF()
        .select(col("doc_id").as("img_id"), col("dhash"))
      val bands = hashes.select(col("img_id"), col("dhash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bv",
          expr("shiftright(dhash, band * 16) & 65535"))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.img_id") < col("b.img_id"))
        .select(col("a.img_id").as("img_a"), col("b.img_id").as("img_b"),
          expr("bit_count(a.dhash ^ b.dhash)").cast("long").as("hamming"))
        .distinct()
        .where(col("hamming") <= 3)
        .orderBy(col("img_a"), col("img_b"))
    }),

    // Image RESIZE over real decoded pixels: every phash fixture PNG
    // box-mean-pooled to a 3×2 thumbnail (each cell = exact integer
    // luminance sum over 12×16 px). The engine must earn the values
    // through javax.imageio decode + the pooling loops; the oracle
    // replays the fixtures' generation FORMULA + the same pooling
    // arithmetic — so a wrong decode, wrong luminance weights, or
    // off-by-one cell bound lands cell-visibly red (the
    // PhashFixtures discipline, now for the resize path). Shape at
    // 100 TB: partition-parallel mapPartitions kernel, one decode
    // per image, no shuffle before the final per-cell projection.
    "q_image_thumbnail" -> ((s, d) => {
      val p = graft.io.PhashFixtures.write(s, d)
      Multimodal.thumbnailAll(s.read.parquet(p), tw = 3, th = 2).toDF()
        .select(col("doc_id").as("img_id"), col("cx"), col("cy"),
          col("n_px"), col("sum_lum"),
          Det.r4(col("sum_lum").cast("double") /
            col("n_px").cast("double")).as("mean_lum"))
        .orderBy(col("img_id"), col("cy"), col("cx"))
    }),

    // session_window in batch mode (streaming twin: StreamOps).
    "q_session_window" -> ((s, d) =>
      StreamOps.sessionAgg(Sources.table(s, d, "events"))
        .orderBy(col("user_id"), col("start_us"))),

    // IVF ANN: label centroids as the coarse quantizer, every ~50th
    // vector as a query, 2 probes, top-3. Deterministic throughout
    // (fixed-point math); the oracle CTE chain below replays the
    // assignment/probe/scan stages in DuckDB.
    "q_ann_ivf" -> ((s, d) => {
      val e = emb(s, d)
      val cells = VectorSearch.labelCentroids(e)
        .select(col("label").cast("long").as("cell_id"), col("centroid"))
      val queries = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      VectorSearch.ivfTopK(
        e.select(col("vec_id"), col("embedding")), cells, queries,
        "qid", "qvec", 3, 2)
        .orderBy(col("qid"), col("rn"))
    }),

    // The compressed ANN serving path: IVF picks a top-10 shortlist
    // by exact cosine, then int8-dequantized vectors re-rank it to
    // top-3 (VectorSearch.sqRerank) — scoring happens against the
    // 4x-smaller SQ reconstruction, not the full-precision
    // embeddings. Queries are corpus members, so the quantizer covers
    // them.
    "q_ann_sq_rerank" -> ((s, d) =>
      // same session-shared IVF shortlist as the PQ composition —
      // the two compressed rerank paths serve the identical
      // shortlist, differing only in the scoring representation
      VectorSearch.sqRerank(ivfPqShortlistC(s, d),
          emb(s, d).select(col("vec_id"), col("embedding")), "qid", 3)
        .orderBy(col("qid"), col("rn"))),

    // Embedding-dedup end-to-end: banded sign-LSH candidates →
    // cosine threshold → connected components → cluster table with
    // keepers. The full "embedding-cosine near-dup dedup" pipeline a
    // training-data curation run executes. τ=0.0 here: the synthetic
    // embeddings have no true near-dups (max pair cosine ≈0.45), so
    // the scored query keeps any positively-aligned candidate to
    // exercise thresholding + clustering; a production corpus runs
    // the identical plan with τ≈0.95.
    "q_embed_dedup_clusters" -> ((s, d) => {
      val pairs = bandedCosC(s, d)
        .where(col("cos_sim") >= 0.0)
        .select(col("v1").as("d1"), col("v2").as("d2"))
      Cache.getOrSnapshot(s, "cc_embed_clusters", d)(
          Dedup.connectedComponents(emb(s, d).select(col("vec_id")), pairs,
            nodeCol = "vec_id"))
        .withColumn("is_keeper",
          (col("vec_id") === col("cluster_id")).cast("long"))
        .orderBy(col("vec_id"))
    }),

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
      VectorSearch.semDedupWithRescue(assigned, SemTau, SemCellCap,
          ksub = SemSubK)
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
      val e = emb(s, d)
      val base = e.where(col("vec_id") % 10 =!= 9)
      val delta = e.where(col("vec_id") % 10 === 9)
      val cells = VectorSearch.labelCentroids(base)
        .select(col("label").cast("long").as("cell_id"), col("centroid"))
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
      val e = emb(s, d).select(col("vec_id"), col("embedding"),
        col("label"))
      val cells = Cache.getOrPersist(s, "kmeans_cells_8_2", d)(
        VectorSearch.kmeansCells(
          e.select(col("vec_id"), col("embedding")), k = 8, iters = 2))
      val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
        VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))
      val assigned = Cache.getOrPersist(s, "semdedup_assign_8_2", d)(
          VectorSearch.assignCells(
            e.select(col("vec_id"), col("embedding")), cellsB))
        .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      val queries = annPanelC(s, d).select(col("qid"), col("qvec"),
        col("label").as("q_label"))
      val served = VectorSearch.ivfTopKFromAssigned(assigned, cellsB,
          queries, "qid", "qvec", k = 3, nProbe = 2,
          scanFilter = col("label") === col("q_label"))
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val eN = e.withColumn("enrm",
        VectorSearch.fixedNormSq(col("embedding")))
      val qN = queries.withColumn("qnrm",
        VectorSearch.fixedNormSq(col("qvec")))
      val scoredEx = eN.crossJoin(broadcast(qN))
        .where(col("label") === col("q_label"))
        .select(col("qid"), col("vec_id"),
          Det.r4(VectorSearch.cosineCol(
            VectorSearch.fixedDot(col("qvec"), col("embedding")),
            col("qnrm"), col("enrm"))).as("cos_sim"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val exact = scoredEx.withColumn("ern", row_number().over(w))
        .where(col("ern") <= 3).select(col("qid"), col("vec_id"))
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall"))
        .orderBy(col("qid"))
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
      VectorSearch.graphTopK(graph, e, queries, "qid", "qvec", k = 3)
        .orderBy(col("qid"), col("rn"))
    }),

    // Recall@3 of the graph serve vs exact ground truth — the
    // acceptance number for the traversal family, same discipline as
    // the IVF/IVF-PQ/SQ/filtered recall read-outs (and the honest
    // price of entry-point reachability: vectors the LSH caps leave
    // isolated are simply unreachable, and this query says what that
    // costs on this corpus).
    "q_ann_graph_recall" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val graph = knnGraphC(s, d)
      val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      val served = VectorSearch
        .graphTopK(graph, e, queries, "qid", "qvec", k = 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall"))
        .orderBy(col("qid"))
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
      VectorSearch.hnswTopK(g0, g1, e, queries, "qid", "qvec", k = 3)
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
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val g0 = knnGraphC(s, d)
      val g1 = knnGraphL1C(s, d)
      val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      val served = VectorSearch
        .hnswTopK(g0, g1, e, queries, "qid", "qvec", k = 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall"))
        .orderBy(col("qid"))
    }),

    // Recall@3 of the composed IVF-PQ stack vs exact ground truth —
    // the acceptance measurement for the COMPRESSED serving path
    // (q_ann_recall measures the uncompressed IVF; this measures what
    // the PQ codes additionally cost on this corpus). Deterministic
    // on both sides, so per-query n_hits/recall is a cell-exact value
    // oracle.
    "q_ann_ivf_pq_recall" -> ((s, d) => {
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      // the SAME session-shared shortlist + rerank the serving query
      // runs — the recall twin measures the served stack, not a copy
      // (shortlist semi-joined to the panel: per-qid rows identical)
      val served = VectorSearch.pqAdcRerank(
          ivfPqShortlistC(s, d)
            .join(broadcast(queries.select(col("qid"))), Seq("qid"),
              "left_semi"),
          annPanelC(s, d).select(col("qid").as("vec_id"),
            col("qvec").as("embedding")),
          pqCentC(s, d), pqCodesC(s, d), "qid", 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall"))
        .orderBy(col("qid"))
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
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val cells = VectorSearch.labelCentroids(emb(s, d))
        .select(col("label").cast("long").as("cell_id"), col("centroid"))
      val queries = annPanelC(s, d).select(col("qid"), col("qvec"))
      val ivf = VectorSearch.ivfTopK(e, cells, queries, "qid", "qvec", 3, 2)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val exact = VectorSearch.topKByCosine(e, queries, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      exact.join(ivf, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall"))
        .orderBy(col("qid"))
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
      val full = emb(s, d).select(col("vec_id"), col("embedding"))
      val tcorpus = emb(s, d).select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val fullQ = annPanelC(s, d).select(col("qid"), col("qvec"))
      val tQ = annPanelC(s, d).select(col("qid"),
        slice(col("qvec"), 1, 16).as("qvec"))
      val served = VectorSearch.topKByCosine(tcorpus, tQ, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
      val exact = VectorSearch.topKByCosine(full, fullQ, "qid", "qvec", 3)
        .select(col("qid"), col("vec_id"))
      exact.join(served, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("qid"), col("n_hits"),
          Det.r4(col("n_hits").cast("double") / lit(3.0)).as("recall"))
        .orderBy(col("qid"))
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
        queries(q)(s, d)
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
      val probes = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"))
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
    // with a DF cap (terms in ≤ 30 docs): a common term contributes
    // |D(t)|² pairs and near-zero cosine mass, so the cap bounds the
    // join the way split_leakage's rare-shingle cap does. Numerator
    // and norms are INTEGER sums over the same capped term space
    // (Σtf₁tf₂, Σtf²) — only the final r4 division is floating.
    "q_doc_similarity" -> ((s, d) => {
      val posts = Dedup.shingles(docs(s, d), 3)
        .groupBy(col("doc_id"), col("shingle").as("w"))
        .agg(count(lit(1)).as("tf"))
      val dfOk = posts.groupBy(col("w"))
        .agg(count(lit(1)).as("df")).where(col("df") <= 30)
        .select(col("w"))
      val capped = posts.join(dfOk, Seq("w"))
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
        .select(col("d1"), col("d2"), col("num"), col("n_shared"),
          Det.r4(col("num").cast("double") /
            (sqrt(col("n1").cast("double")) *
             sqrt(col("n2").cast("double")))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("d1"), col("d2"))
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
      val sym = e.select(col("d1").as("src"), col("d2").as("dst"))
        .unionAll(e.select(col("d2").as("src"), col("d1").as("dst")))
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      val hubOk = deg.where(col("dg") <= 50).select(col("src").as("mid"))
      val viaMid = sym.select(col("src"), col("dst").as("mid"))
        .join(hubOk, Seq("mid"))
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
    })
  )

  // ---------------------------------------------------------------
  // Oracle SQL twins.
  // ---------------------------------------------------------------

  private val dupSigSql =
    s"nsig AS (SELECT doc_id, sha256($normSqlExpr) AS sig FROM documents)"

  /** The window-function literal (q_sql_window_surface): named WINDOW
    * clause, ranking + offset functions, CAST-pinned BIGINT outputs —
    * one ANSI text, two engines, verbatim. */
  private val SqlWindowSurfaceSql: String =
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
  private val SqlLateralSql: String =
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
  private val SqlCorrelatedSql: String =
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
  private val SqlNullSemanticsSql: String =
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
  private val SqlGroupingSql: String =
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
  private val SqlRecursiveSql: String =
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
  private val SqlExistsSql: String =
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
  private val SqlBagSetopsSql: String =
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
  private val SqlSurfaceSql: String =
    """SELECT source, lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM documents
      |WHERE n_chars >= 100
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  /** Shared by q_incremental_dedup and its streaming twin. */
  private lazy val incrementalDedupSql: String =
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

  private val candSql =
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
  private def jaccardRescoreSqlFrom(candCte: String,
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
  private lazy val sqChainCtes: String =
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
  private def ivfRankedCtesCent(centWhere: String): String =
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

  private lazy val ivfRankedCtes: String = ivfRankedCtesCent("true")

  /** Exact ground-truth side shared by the recall oracles: every
    * (panel query, corpus) pair through the same fixed-point dot/norm
    * chain as the serving paths, ranked to top-3 — defines `exact`.
    * References `expl`/`enorm` from [[ivfRankedCtes]]; queries come
    * from the fixed seeded `panel` ([[panelCte]]), so truth work is
    * O(PanelSize·N) on both engines. */
  private lazy val exactTop3Ctes: String =
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
  private def recallTail(served: String): String =
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
  private lazy val ivfPqCtes: String =
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
  private lazy val rescueTailSql: String =
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

  private lazy val rescueCandSql: String =
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
  private def bandedCosCtesFor(p: String, where: String,
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

  private lazy val bandedCosCtes: String = bandedCosCtesFor("", "")

  /** One beam-expansion round of a graph-ANN oracle: candidates =
    * previous beam ∪ its graph neighbors (UNION dedups, mirroring the
    * engine's distinct()), scored from the full score table, top-B
    * per query by (cos DESC, vec_id). Parametrized so the flat serve
    * and both HNSW layers share one definition. */
  private def beamRound(name: String, prev: String, graph: String,
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

  private def gBeamRound(r: Int): String =
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
  private def knnGraphCtes(name: String, p: String): String =
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
  private lazy val graphCoreCtes: String =
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
  private def beamSeed(name: String, fromJoin: String,
                       beam: Int): String =
    s"""$name AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT s.qid, s.vec_id,
       |           row_number() OVER (PARTITION BY s.qid
       |                  ORDER BY s.cos_sim DESC, s.vec_id) AS rn
       |    FROM gscore s $fromJoin)
       |  WHERE rn <= $beam)""".stripMargin

  /** Final cut `$name`: re-score beam `$from`, keep top-`k`. */
  private def beamServe(name: String, from: String, k: Int): String =
    s"""$name AS (
       |  SELECT qid, vec_id, cos_sim, rn FROM (
       |    SELECT s.qid, s.vec_id, s.cos_sim,
       |           row_number() OVER (PARTITION BY s.qid
       |                  ORDER BY s.cos_sim DESC, s.vec_id) AS rn
       |    FROM $from b
       |    JOIN gscore s ON s.qid = b.qid AND s.vec_id = b.vec_id)
       |  WHERE rn <= $k)""".stripMargin

  private lazy val graphAnnCtes: String =
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
  private lazy val hnswCtes: String = {
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
  private def kmeansAssignCtes(k: Int, iters: Int): String = {
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
  private def pcaPowerOracle(iters: Int): String = {
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
  private def semDedupOracle(k: Int, iters: Int, tau: Double,
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
  private def kmeansIvfChain(k: Int, iters: Int,
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

  private def kmeansIvfOracle(k: Int, iters: Int,
                              labelFiltered: Boolean = false): String =
    s"""WITH ${kmeansIvfChain(k, iters, labelFiltered)}
       |SELECT qid, vec_id, cos_sim, rn
       |FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** Label-filtered exact top-3 — the ground-truth side of
    * q_ann_filtered_recall (exactTop3Ctes with the same label
    * constraint the served side applies). References `expl`/`enorm`.
    */
  private lazy val exactTop3FilteredCtes: String =
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
  private def pqAdcOracle(m: Int, dsub: Int, ksub: Int, iters: Int): String =
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
  private def pqChainCtes(dsub: Int, ksub: Int, iters: Int): String = {
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
  private lazy val lmAggCtes: String =
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
  private lazy val qualityCtes: String =
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

  private lazy val decontamOracleSql: String =
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
  private lazy val knnPredCtes: String =
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
         |kdots AS (
         |  SELECT q.vec_id AS qid, e.vec_id,
         |         CAST(sum(CAST(floor(q.v*e.v*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE)
         |           / 1000000000000.0 AS dot
         |  FROM kexpl q JOIN kexpl e ON e.i = q.i
         |  WHERE q.vec_id % 50 = 0 AND e.vec_id != q.vec_id
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
  private lazy val erCtes: String =
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
  private val FrontierVariants: Seq[(String, String)] = Seq(
    "filtered" -> "q_ann_filtered_recall",
    "graph" -> "q_ann_graph_recall",
    "hnsw" -> "q_ann_hnsw_recall",
    "ivf" -> "q_ann_recall",
    "ivf_pq" -> "q_ann_ivf_pq_recall",
    "sq" -> "q_ann_sq_recall",
    "truncated" -> "q_ann_truncated_recall")

  private val oraclesBase: Map[String, String] = Map(
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
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $simhashPairCtes,
         |edges AS (
         |  SELECT d1, d2 FROM pairs WHERE bit_count(xor(h1, h2)) <= 3
         |  UNION
         |  SELECT d1, d2 FROM rpairs WHERE bit_count(xor(h1, h2)) <= 3),
         |sym AS (
         |  SELECT d1 AS src, d2 AS dst FROM edges
         |  UNION ALL
         |  SELECT d2 AS src, d1 AS dst FROM edges),
         |cc AS (
         |  SELECT doc_id AS node, doc_id AS label FROM documents
         |  UNION
         |  SELECT sym.dst AS node, cc.label
         |  FROM cc JOIN sym ON cc.node = sym.src)
         |SELECT node AS doc_id, min(label) AS cluster_id,
         |       CAST(CASE WHEN node = min(label) THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_keeper
         |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin,

    // Leakage-free split: same CC replay as q_dedup_clusters, split
    // bands off the portable spread hash of the cluster id, edge
    // rollup attributed to the d1 endpoint's split.
    "q_leakage_free_split" -> {
      import graft.core.PortableHash
      val spSql = PortableHash.spreadSql(PortableHash.hSql(
        "'split:' || CAST(cluster_id AS VARCHAR)"))
      s"""WITH RECURSIVE $simhashPairCtes,
         |edges AS (
         |  SELECT d1, d2 FROM pairs WHERE bit_count(xor(h1, h2)) <= 3
         |  UNION
         |  SELECT d1, d2 FROM rpairs WHERE bit_count(xor(h1, h2)) <= 3),
         |sym AS (
         |  SELECT d1 AS src, d2 AS dst FROM edges
         |  UNION ALL
         |  SELECT d2 AS src, d1 AS dst FROM edges),
         |cc AS (
         |  SELECT doc_id AS node, doc_id AS label FROM documents
         |  UNION
         |  SELECT sym.dst AS node, cc.label
         |  FROM cc JOIN sym ON cc.node = sym.src),
         |cgrp AS (
         |  SELECT node AS doc_id, min(label) AS cluster_id
         |  FROM cc GROUP BY node),
         |asg AS (
         |  SELECT doc_id, cluster_id,
         |         CASE WHEN $spSql < 900002 THEN 'train'
         |              WHEN $spSql < 950002 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM cgrp),
         |dedges AS (
         |  -- DuckDB gotcha: under WITH RECURSIVE the bare UNION in
         |  -- `edges` does NOT dedup across branches (the CC consumer
         |  -- is multiset-insensitive; this count is not) — dedup
         |  -- explicitly to match the engine's distinct edge cache
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

    // IVF ANN replay: same fixed-point per-term snapping as the Spark
    // side; `acos` scores every (vector, cell) once and serves BOTH
    // the build-side assignment (argmax per vector) and the probe side
    // (top-nProbe per query vector), exactly as ivfTopK computes them.
    "q_ann_ivf" ->
      s"""WITH $ivfRankedCtes
         |SELECT qid, vec_id, cos_sim, rn
         |FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,

    // The same serving replay with the quantizer TRAINED ON THE BASE
    // slice only (vec_id % 10 <> 9) — assignment and serving still
    // cover the full corpus, which is precisely the incremental
    // append's semantics.
    "q_ann_incremental" ->
      s"""WITH ${ivfRankedCtesCent("vec_id % 10 <> 9")}
         |SELECT qid, vec_id, cos_sim, rn
         |FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,

    // Recall@3 of the 2-probe IVF vs exact ground truth: the IVF side
    // is the identical `ranked` replay as q_ann_ivf; the exact side
    // brute-forces every (query, vector) pair through the same
    // fixed-point dot/norm chain and ranks with the same tiebreak.
    "q_ann_recall" ->
      s"""WITH $ivfRankedCtes,
         |ivf AS (SELECT qid, vec_id FROM ranked WHERE rn <= 3),
         |$exactTop3Ctes,
         |${recallTail("ivf")}""".stripMargin,

    // Truncated-dimension recall: the served side is the same
    // brute-force chain over the i <= 16 prefix of the exploded
    // vectors; exact side and tail shared with the other recall
    // twins.
    "q_ann_truncated_recall" -> Oracle.mat(
      s"""WITH expl AS (
         |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |enorm AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(v*v*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE) / 1000000000000.0
         |           AS en
         |  FROM expl GROUP BY 1),
         |texpl AS (SELECT vec_id, i, v FROM expl WHERE i <= 16),
         |tnorm AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(v*v*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE) / 1000000000000.0
         |           AS en
         |  FROM texpl GROUP BY 1),
         |tdots AS (
         |  SELECT q.vec_id AS qid, e.vec_id,
         |         CAST(sum(CAST(floor(q.v*e.v*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE) / 1000000000000.0
         |           AS dot
         |  FROM texpl q JOIN texpl e ON e.i = q.i
         |  WHERE q.vec_id % 50 = 0
         |  GROUP BY 1, 2),
         |tscored AS (
         |  SELECT d.qid, d.vec_id,
         |         ${r4("CASE WHEN sqrt(nq.en)*sqrt(ne.en) = 0.0 THEN 0.0 " +
              "ELSE dot/(sqrt(nq.en)*sqrt(ne.en)) END")} AS cos_sim
         |  FROM tdots d
         |  JOIN tnorm nq ON nq.vec_id = d.qid
         |  JOIN tnorm ne ON ne.vec_id = d.vec_id),
         |tserved AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY cos_sim DESC, vec_id) AS trn
         |    FROM tscored) WHERE trn <= 3),
         |$exactTop3Ctes,
         |${recallTail("tserved")}""".stripMargin),

    // Recall@3 of the COMPOSED IVF-PQ stack vs exact ground truth —
    // the acceptance measurement for the compressed serving path
    // (compression must cost bounded recall, and this query measures
    // exactly what it costs on this corpus). Same exact side and
    // recall tail as q_ann_recall; the served side is the full
    // IVF-shortlist → ADC-rerank replay.
    "q_ann_ivf_pq_recall" ->
      s"""WITH $ivfPqCtes,
         |served AS (SELECT qid, vec_id FROM reranked WHERE rn <= 3),
         |$exactTop3Ctes,
         |${recallTail("served")}""".stripMargin,

    // IVF shortlist (top 10 by exact cosine) re-ranked by cosine over
    // DEQUANTIZED int8 vectors (VectorSearch.sqRerank): the compressed
    // serving path, replayed CTE for CTE (quantizer train + encode +
    // dequantize + fixed-point dot). Chain shared with the recall
    // twin via [[sqChainCtes]].
    "q_ann_sq_rerank" ->
      s"""WITH $ivfRankedCtes,
         |$sqChainCtes
         |SELECT qid, vec_id, sq_cos, rn
         |FROM sq_ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,

    // Recall@3 of the SQ path: same served chain as q_ann_sq_rerank
    // (shared sqChainCtes — the measurement can never drift from the
    // serving path), same exact side and tail as the IVF/PQ recall
    // twins.
    "q_ann_sq_recall" ->
      s"""WITH $ivfRankedCtes,
         |$sqChainCtes,
         |served AS (SELECT qid, vec_id FROM sq_ranked WHERE rn <= 3),
         |$exactTop3Ctes,
         |${recallTail("served")}""".stripMargin,

    "q_dataset_mix" -> {
      val (copiesExpr, _) = Sampling.weightedMixSql(
        "source", "CAST(doc_id AS VARCHAR)", MixRates, defaultRate = 1.0)
      s"""WITH gated AS (
         |  SELECT doc_id, source, $copiesExpr AS n_copies FROM documents)
         |SELECT doc_id, source,
         |       unnest(generate_series(1, n_copies)) AS copy_id
         |FROM gated WHERE n_copies > 0
         |ORDER BY doc_id, copy_id""".stripMargin
    },

    "q_ann_kmeans" -> kmeansIvfOracle(k = 8, iters = 2),

    "q_ann_filtered" -> kmeansIvfOracle(k = 8, iters = 2,
      labelFiltered = true),

    // Acceptance pair for the filtered path: recall@3 of the filtered
    // IVF serve vs the filtered exact ground truth — the same
    // discipline every other serving variant carries (IVF, IVF-PQ,
    // SQ). Both sides share the kmeans chain's expl/enorm and apply
    // the IDENTICAL label constraint.
    "q_ann_filtered_recall" ->
      s"""WITH ${kmeansIvfChain(k = 8, iters = 2, labelFiltered = true)},
         |fserved AS (SELECT qid, vec_id FROM ranked WHERE rn <= 3),
         |$exactTop3FilteredCtes,
         |${recallTail("fserved")}""".stripMargin,

    "q_semdedup" -> semDedupOracle(k = 8, iters = 2,
      tau = SemTau, cap = SemCellCap, ksub = SemSubK),

    "q_embed_pca_power" -> pcaPowerOracle(iters = 2),

    "q_embed_stats" ->
      s"""WITH expl AS (
         |  SELECT vec_id, i,
         |         CAST(floor(CAST(embedding[i] AS DOUBLE)*1000000000.0
         |              + 0.5) AS BIGINT) AS vfx
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i))
         |SELECT CAST(i AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
         |       ${r4("CAST(sum(vfx) AS DOUBLE)/count(*)/1000000000.0")}
         |         AS mean,
         |       ${r4("CAST(min(vfx) AS DOUBLE)/1000000000.0")} AS min_v,
         |       ${r4("CAST(max(vfx) AS DOUBLE)/1000000000.0")} AS max_v,
         |       CAST(sum(CASE WHEN vfx = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_zero
         |FROM expl GROUP BY 1 ORDER BY dim""".stripMargin,

    "q_ann_pq" -> pqAdcOracle(
      m = VectorSearch.PqSubspaces, dsub = VectorSearch.PqSubDim,
      ksub = VectorSearch.PqCodes, iters = VectorSearch.PqIters),

    // IVF-PQ composition: the IVF replay (identical `ranked` chain as
    // q_ann_ivf) cut to a 10-candidate shortlist, re-scored by the PQ
    // replay's codes/distance tables (identical chain as q_ann_pq) —
    // CTE names are disjoint by construction (expl/cent/… vs
    // sexpl/cent0/…), so the two replays compose verbatim.
    "q_ann_ivf_pq" ->
      s"""WITH $ivfPqCtes
         |SELECT qid, vec_id, adist, rn
         |FROM reranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,

    // The persisted-index serve must answer EXACTLY like the
    // in-session stack — same oracle text as q_ann_ivf_pq, which is
    // the whole point: a parquet roundtrip of the artifacts may not
    // change a single served cell.
    "q_ann_persist" ->
      s"""WITH $ivfPqCtes
         |SELECT qid, vec_id, adist, rn
         |FROM reranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,

    // c-TF-IDF topics: the k-means replay (shared chain, assign2 =
    // final assignment) joined to the corpus term frequencies; the
    // score's log2 decomposes into two integer-log2 table lookups so
    // every emitted cell is BIGINT-exact.
    "q_cluster_topics" -> Oracle.mat(
      s"""WITH ${kmeansAssignCtes(k = 8, iters = 2)},
         |ttf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents)
         |  GROUP BY 1, 2),
         |cassign AS (SELECT vec_id AS doc_id, cell_id FROM assign2),
         |cctf AS (
         |  SELECT a.cell_id, t.w, CAST(sum(t.tf) AS BIGINT) AS ctf
         |  FROM ttf t JOIN cassign a USING (doc_id) GROUP BY 1, 2),
         |cft AS (SELECT w, CAST(sum(ctf) AS BIGINT) AS ft
         |        FROM cctf GROUP BY 1),
         |ctot AS (SELECT CAST(sum(tf) AS BIGINT) // 8 AS a_tok FROM ttf),
         |cscore AS (
         |  SELECT c.cell_id, c.w, c.ctf, f.ft,
         |         CAST(c.ctf * (${LmScore.log2FxSql("f.ft + t.a_tok")}
         |           - ${LmScore.log2FxSql("f.ft")}) AS BIGINT) AS score_fx
         |  FROM cctf c JOIN cft f USING (w) CROSS JOIN ctot t)
         |SELECT cell_id, w AS term, ctf, ft, score_fx, rn FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY cell_id
         |                 ORDER BY score_fx DESC, w) AS BIGINT) AS rn
         |  FROM cscore)
         |WHERE rn <= 5 ORDER BY cell_id, rn""".stripMargin),

    // Graph-ANN serve: graph build + all three beam rounds replayed
    // as CTEs (mat()'d — each round references its predecessor twice,
    // the exponential-inlining trap Oracle.mat exists for).
    "q_ann_graph" -> Oracle.mat(
      s"""WITH $graphAnnCtes
         |SELECT qid, vec_id, cos_sim, rn
         |FROM gserved ORDER BY qid, rn""".stripMargin),

    // HNSW serve: both layers' graph builds and every beam round of
    // the descent replayed as MATERIALIZED CTEs.
    "q_ann_hnsw" -> Oracle.mat(
      s"""WITH $hnswCtes
         |SELECT qid, vec_id, cos_sim, rn
         |FROM hserved ORDER BY qid, rn""".stripMargin),

    // The reloaded-index graph serve must answer EXACTLY like the
    // session-built one — q_ann_graph's oracle verbatim (the
    // q_ann_persist discipline, traversal family).
    "q_ann_graph_persist" -> Oracle.mat(
      s"""WITH $graphAnnCtes
         |SELECT qid, vec_id, cos_sim, rn
         |FROM gserved ORDER BY qid, rn""".stripMargin),

    // Reloaded-index HNSW descent: q_ann_hnsw's oracle verbatim.
    "q_ann_hnsw_persist" -> Oracle.mat(
      s"""WITH $hnswCtes
         |SELECT qid, vec_id, cos_sim, rn
         |FROM hserved ORDER BY qid, rn""".stripMargin),

    // HNSW recall@3 against the shared brute-force truth table,
    // restricted to the fixed seeded query panel (the engine serves
    // and truths ONLY panel queries; per-qid independence makes the
    // restriction value-preserving).
    "q_ann_hnsw_recall" -> Oracle.mat(
      s"""WITH $hnswCtes,
         |$panelCte,
         |hexact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT s.qid, s.vec_id,
         |           row_number() OVER (PARTITION BY s.qid
         |                  ORDER BY s.cos_sim DESC, s.vec_id) AS ern
         |    FROM gscore s JOIN panel ON panel.pqid = s.qid)
         |  WHERE ern <= 3),
         |hhits AS (
         |  SELECT x.qid,
         |         CAST(sum(CASE WHEN s.vec_id IS NULL THEN 0 ELSE 1 END)
         |              AS BIGINT) AS n_hits
         |  FROM hexact x
         |  LEFT JOIN hserved s ON s.qid = x.qid AND s.vec_id = x.vec_id
         |  GROUP BY 1)
         |SELECT qid, n_hits,
         |       ${r4("CAST(n_hits AS DOUBLE) / 3.0")} AS recall
         |FROM hhits ORDER BY qid""".stripMargin),

    // Graph-ANN recall@3: gscore doubles as the exact ground truth
    // (it IS the brute-force score table), so served and exact share
    // every constant by construction.
    "q_ann_graph_recall" -> Oracle.mat(
      s"""WITH $graphAnnCtes,
         |$panelCte,
         |gexact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT s.qid, s.vec_id,
         |           row_number() OVER (PARTITION BY s.qid
         |                  ORDER BY s.cos_sim DESC, s.vec_id) AS ern
         |    FROM gscore s JOIN panel ON panel.pqid = s.qid)
         |  WHERE ern <= 3),
         |ghits AS (
         |  SELECT x.qid,
         |         CAST(sum(CASE WHEN s.vec_id IS NULL THEN 0 ELSE 1 END)
         |              AS BIGINT) AS n_hits
         |  FROM gexact x
         |  LEFT JOIN gserved s ON s.qid = x.qid AND s.vec_id = x.vec_id
         |  GROUP BY 1)
         |SELECT qid, n_hits,
         |       ${r4("CAST(n_hits AS DOUBLE) / 3.0")} AS recall
         |FROM ghits ORDER BY qid""".stripMargin),

    // Derived-property oracle for the ALS path (see the query's
    // comment): the properties hold for ANY correct top-5
    // recommendation output, so the oracle states them as constants
    // over the exact user set ALS trains on.
    "q_als_recommend" ->
      s"""WITH ${graft.io.Sources.ratingsSql},
         |users AS (SELECT DISTINCT user_id FROM ratings)
         |SELECT user_id,
         |       CAST(5 AS BIGINT) AS n_recs,
         |       CAST(1 AS BIGINT) AS rn_min,
         |       CAST(5 AS BIGINT) AS rn_max,
         |       CAST(15 AS BIGINT) AS rn_sum,
         |       CAST(0 AS BIGINT) AS mono_violations,
         |       CAST(0 AS BIGINT) AS nan_scores,
         |       CAST(0 AS BIGINT) AS unknown_items
         |FROM users ORDER BY user_id""".stripMargin,

    "q_id_dictionary" ->
      s"""WITH ${graft.io.Sources.ratingsSql},
         |keys AS (
         |  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS key
         |  FROM ratings)
         |SELECT key,
         |       CAST(row_number() OVER (ORDER BY key) - 1 AS INTEGER) AS idx
         |FROM keys ORDER BY key""".stripMargin,

    "q_hash_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${Sampling.hashSampleSql("CAST(doc_id AS VARCHAR)", 10.0)}
         |ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      s"""WITH ranked AS (
         |  SELECT lang, doc_id,
         |         row_number() OVER (
         |           PARTITION BY lang
         |           ORDER BY ${graft.core.PortableHash.spreadSql(
                       graft.core.PortableHash.hSql("CAST(doc_id AS VARCHAR)"))},
         |                    CAST(doc_id AS VARCHAR)) AS sample_rank
         |  FROM documents)
         |SELECT lang, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank
         |FROM ranked WHERE sample_rank <= 20
         |ORDER BY lang, sample_rank""".stripMargin,

    "q_ngram_novelty" ->
      s"""WITH ${Dedup.shinglesSql},
         |ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
         |base AS (SELECT DISTINCT shingle FROM ds WHERE doc_id % 10 <> 7),
         |b AS (SELECT doc_id, shingle FROM ds WHERE doc_id % 10 = 7)
         |SELECT b.doc_id, count(*) AS n_shingles,
         |       CAST(sum(CASE WHEN base.shingle IS NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_novel,
         |       ${r4("CAST(sum(CASE WHEN base.shingle IS NULL THEN 1 " +
              "ELSE 0 END) AS DOUBLE) / count(*)")} AS novelty
         |FROM b LEFT JOIN base ON base.shingle = b.shingle
         |GROUP BY 1 ORDER BY b.doc_id""".stripMargin,

    // Element-at-rank replay: row_number over each split's sorted
    // lengths, picked at (n·k)//8 — the value at a rank is tie-order
    // independent, so the window's tie behavior cannot matter.
    // PSI replayed: same buckets, +1 smoothing, S-scaled shares and
    // integer log2 of the cross products.
    "q_psi_drift" -> {
      val S = LmScore.LogScale
      s"""WITH mx AS (SELECT max(n_chars) AS mx FROM documents),
         |b AS (
         |  SELECT (n_chars * 10) // (mx + 1) AS bucket,
         |         doc_id % 2 = 0 AS is_ref
         |  FROM documents CROSS JOIN mx),
         |g AS (
         |  SELECT bucket,
         |         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
         |           AS r0,
         |         CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
         |           AS c0
         |  FROM b GROUP BY 1),
         |counts AS (
         |  SELECT k.bucket,
         |         coalesce(r0, 0) + 1 AS n_ref,
         |         coalesce(c0, 0) + 1 AS n_cur
         |  FROM (SELECT unnest(range(0, 10)) AS bucket) k
         |  LEFT JOIN g ON g.bucket = k.bucket),
         |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
         |               CAST(sum(n_cur) AS BIGINT) AS tc FROM counts),
         |terms AS (
         |  SELECT bucket, n_ref, n_cur,
         |         ((n_ref * $S) // tr - (n_cur * $S) // tc) *
         |           (${LmScore.log2FxSql("n_ref * tc")} -
         |            ${LmScore.log2FxSql("n_cur * tr")}) AS psi_term_fx
         |  FROM counts CROSS JOIN tot)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n_ref, n_cur,
         |       CAST(psi_term_fx AS BIGINT) AS psi_term_fx,
         |       ${r4(s"CAST(psi_term_fx AS DOUBLE) / (${S}.0 * ${S}.0)")}
         |         AS psi_term_bits
         |FROM terms ORDER BY bucket""".stripMargin
    },

    "q_quantile_drift" -> {
      val gate = PortableHash.spreadSql(
        PortableHash.hSql("CAST(doc_id AS VARCHAR)"))
      s"""WITH gated AS (
         |  SELECT n_chars,
         |         CASE WHEN $gate < 500000 THEN 'train' ELSE 'hold' END
         |           AS split
         |  FROM documents),
         |ranked AS (
         |  SELECT split, n_chars,
         |         row_number() OVER (PARTITION BY split
         |                            ORDER BY n_chars) - 1 AS r,
         |         count(*) OVER (PARTITION BY split) AS n
         |  FROM gated),
         |ks AS (SELECT unnest(range(1, 8)) AS k),
         |p AS (
         |  SELECT ks.k, r.split, r.n_chars
         |  FROM ks JOIN ranked r ON r.r = (r.n * ks.k) // 8)
         |SELECT k,
         |       max(CASE WHEN split = 'train' THEN n_chars END) AS train_v,
         |       max(CASE WHEN split = 'hold' THEN n_chars END) AS hold_v,
         |       abs(max(CASE WHEN split = 'train' THEN n_chars END) -
         |           max(CASE WHEN split = 'hold' THEN n_chars END))
         |         AS abs_diff
         |FROM p GROUP BY 1 ORDER BY k""".stripMargin
    },

    "q_release_manifest" ->
      s"""WITH assigned AS (
         |  SELECT *, ${Sampling.splitAssignSql("CAST(doc_id AS VARCHAR)",
              SplitBands)} AS split
         |  FROM documents)
         |SELECT split, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(len(list_filter(string_split(text, ' '),
         |                x -> x <> ''))) AS BIGINT) AS n_tokens,
         |       CAST(sum(${PortableHash.spreadSql(
                  PortableHash.hSql("text"))}) AS BIGINT)
         |         AS content_fingerprint
         |FROM assigned GROUP BY 1 ORDER BY split""".stripMargin,

    "q_split_assign" ->
      s"""WITH assigned AS (
         |  SELECT *, ${Sampling.splitAssignSql("CAST(doc_id AS VARCHAR)",
              SplitBands)} AS split
         |  FROM documents)
         |SELECT split, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars
         |FROM assigned GROUP BY 1 ORDER BY split""".stripMargin,

    // ss is distinct, so count(*) == count(DISTINCT shingle) per pair.
    "q_source_overlap" ->
      s"""WITH ${Dedup.shinglesSql},
         |ss AS (SELECT DISTINCT d.source, s.shingle
         |       FROM shingles s JOIN documents d USING (doc_id))
         |SELECT a.source AS s1, b.source AS s2,
         |       count(*) AS shared_shingles
         |FROM ss a JOIN ss b
         |  ON a.shingle = b.shingle AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY s1, s2""".stripMargin,

    "q_decontaminate" -> decontamOracleSql,

    // Bit-identical by construction: the Bloom pre-filter only prunes
    // rows the exact join would drop anyway (FPs survive the filter,
    // die in the join), so the exact-join oracle is THE oracle.
    "q_decontaminate_bloom" -> decontamOracleSql,

    // HRW replay: same portable-hash weights, both argmaxes as rank-1
    // windows, same churn rollup.
    "q_rendezvous_shards" -> {
      val key = "CAST(d.doc_id AS VARCHAR) || ':' || " +
        "CAST(s.shard AS VARCHAR)"
      s"""WITH sh AS (SELECT unnest(range(0, 17)) AS shard),
         |w AS (
         |  SELECT d.doc_id, s.shard,
         |         ${graft.core.PortableHash.spreadSql(
              graft.core.PortableHash.hSql(key))} AS wgt
         |  FROM documents d CROSS JOIN sh s),
         |a16 AS (
         |  SELECT doc_id, shard AS a16 FROM (
         |    SELECT doc_id, shard,
         |           row_number() OVER (PARTITION BY doc_id
         |                  ORDER BY wgt DESC, shard) AS rn
         |    FROM w WHERE shard < 16) WHERE rn = 1),
         |a17 AS (
         |  SELECT doc_id, shard AS a17 FROM (
         |    SELECT doc_id, shard,
         |           row_number() OVER (PARTITION BY doc_id
         |                  ORDER BY wgt DESC, shard) AS rn
         |    FROM w) WHERE rn = 1)
         |SELECT a16 AS shard, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN a17 != a16 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_moved,
         |       CAST(sum(CASE WHEN a17 != a16 AND a17 != 16
         |                     THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_moved_elsewhere
         |FROM a16 JOIN a17 USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // k-center replay: the full pairwise cosine table (the oracle
    // may brute-force; the engine never does), the seed, every
    // round's (min max-cos, vec_id) argmin, and the assignment.
    "q_coreset_kcenter" -> Oracle.mat({
      def round(r: Int): String =
        s"""kmc$r AS (
           |  SELECT c.a, max(c.cos_sim) AS mc
           |  FROM kcos c JOIN ksel$r s ON s.cid = c.b
           |  GROUP BY 1),
           |ksel${r + 1} AS (
           |  SELECT cid FROM ksel$r
           |  UNION ALL
           |  SELECT a AS cid FROM (
           |    SELECT a, row_number() OVER (ORDER BY mc, a) AS rn
           |    FROM kmc$r) WHERE rn = 1)""".stripMargin
      s"""WITH kx AS (
         |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |kn AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(x*x*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE)
         |           / 1000000000000.0 AS nn
         |  FROM kx GROUP BY 1),
         |kd AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b,
         |         CAST(sum(CAST(floor(a.x*b.x*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE)
         |           / 1000000000000.0 AS dot
         |  FROM kx a JOIN kx b ON b.i = a.i
         |  GROUP BY 1, 2),
         |kcos AS (
         |  SELECT d.a, d.b,
         |         ${r4("CASE WHEN sqrt(na.nn)*sqrt(nb.nn) = 0.0 THEN 0.0 " +
              "ELSE dot/(sqrt(na.nn)*sqrt(nb.nn)) END")} AS cos_sim
         |  FROM kd d
         |  JOIN kn na ON na.vec_id = d.a
         |  JOIN kn nb ON nb.vec_id = d.b),
         |ksel1 AS (SELECT min(vec_id) AS cid FROM embeddings),
         |${(1 to 7).map(round).mkString(",\n")}
         |SELECT a AS vec_id, b AS center_id, cos_sim FROM (
         |  SELECT c.a, c.b, c.cos_sim,
         |         row_number() OVER (PARTITION BY c.a
         |                ORDER BY c.cos_sim DESC, c.b) AS rn
         |  FROM kcos c JOIN ksel8 s ON s.cid = c.b)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
    }),

    // Semantic decontamination: per-corpus-vector argmax over the
    // bench set (ties to the smaller bench_id, the struct-max twin),
    // cosines through the same fixed-point pipeline as the ANN
    // oracles.
    "q_semantic_decontaminate" ->
      s"""WITH sx AS (
         |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |sn AS (
         |  SELECT vec_id,
         |         CAST(sum(CAST(floor(x*x*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE)
         |           / 1000000000000.0 AS nn
         |  FROM sx GROUP BY 1),
         |sd AS (
         |  SELECT c.vec_id, b.vec_id AS bench_id,
         |         CAST(sum(CAST(floor(c.x*b.x*1000000000000.0 + 0.5)
         |                       AS BIGINT)) AS DOUBLE)
         |           / 1000000000000.0 AS dot
         |  FROM sx c JOIN sx b ON b.i = c.i AND b.vec_id % 20 = 0
         |  WHERE c.vec_id % 20 != 0
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT d.vec_id, d.bench_id,
         |         ${r4("CASE WHEN sqrt(nc.nn)*sqrt(nb.nn) = 0.0 THEN 0.0 " +
              "ELSE dot/(sqrt(nc.nn)*sqrt(nb.nn)) END")} AS cos_sim
         |  FROM sd d
         |  JOIN sn nc ON nc.vec_id = d.vec_id
         |  JOIN sn nb ON nb.vec_id = d.bench_id)
         |SELECT vec_id, bench_id, cos_sim,
         |       CAST(CASE WHEN cos_sim >= 0.45 THEN 1 ELSE 0 END
         |            AS BIGINT) AS contaminated
         |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |              ORDER BY cos_sim DESC, bench_id) AS rn
         |      FROM sc)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // ds is distinct (doc_id, shingle) on both sides, so the HAVING
    // count is the true document frequency.
    "q_split_leakage" ->
      s"""WITH ${Dedup.shinglesSql},
         |ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
         |kept AS (SELECT shingle FROM ds
         |         GROUP BY 1 HAVING count(*) <= $LeakDfCap),
         |tagged AS (
         |  SELECT doc_id, shingle,
         |         ${Sampling.splitAssignSql("CAST(doc_id AS VARCHAR)",
              SplitBands)} AS split
         |  FROM ds),
         |train AS (
         |  SELECT t.shingle, t.doc_id AS train_doc
         |  FROM tagged t JOIN kept USING (shingle)
         |  WHERE split = 'train'),
         |holdout AS (
         |  SELECT split, shingle, doc_id FROM tagged
         |  WHERE split <> 'train')
         |SELECT split, doc_id,
         |       count(DISTINCT shingle) AS n_shared_shingles,
         |       count(DISTINCT train_doc) AS n_train_docs
         |FROM holdout JOIN train USING (shingle)
         |GROUP BY 1, 2 ORDER BY split, doc_id""".stripMargin,

    // The rank (0-based floor(0.1*n), spelled 1-based here) selects an
    // ACTUAL quality element as the threshold — same bits both
    // engines, ties kept by >=.
    "q_quality_cut" ->
      s"""WITH $qualityCtes,
         |ranked AS (
         |  SELECT doc_id, quality,
         |         row_number() OVER (ORDER BY quality) AS rk,
         |         count(*) OVER () AS n
         |  FROM quals),
         |thr AS (SELECT quality AS t FROM ranked
         |        WHERE rk = CAST(floor(0.1 * n) AS BIGINT) + 1)
         |SELECT doc_id, quality FROM quals, thr
         |WHERE quality >= t ORDER BY doc_id""".stripMargin,

    // Kappa between the gopher keep flag and the p10 quality cut:
    // both raters replayed from their own definitions, then the
    // single-division integer form of the statistic.
    "q_filter_kappa" ->
      s"""WITH $qualityCtes,
         |ranked AS (
         |  SELECT doc_id, quality,
         |         row_number() OVER (ORDER BY quality) AS rk,
         |         count(*) OVER () AS n
         |  FROM quals),
         |thr AS (SELECT quality AS t FROM ranked
         |        WHERE rk = CAST(floor(0.1 * n) AS BIGINT) + 1),
         |r2t AS (
         |  SELECT doc_id, CASE WHEN quality >= t THEN 1 ELSE 0 END AS r2
         |  FROM quals, thr),
         |gm AS (
         |  SELECT doc_id,
         |         CAST(len(w) AS BIGINT) AS n_words,
         |         n_chars - CAST(len(w) AS BIGINT) + 1 AS sum_wlen,
         |         CAST(len(list_filter(w, x -> len(x) <= 2)) AS BIGINT)
         |           AS n_short,
         |         CAST(list_contains(w, 'the') AS BIGINT)
         |           + CAST(list_contains(w, 'a') AS BIGINT)
         |           AS n_stop_kinds
         |  FROM ws),
         |r1t AS (
         |  SELECT doc_id,
         |         CASE WHEN n_words BETWEEN 50 AND 100000
         |               AND sum_wlen >= n_words * 4
         |               AND sum_wlen <= n_words * 10
         |               AND n_short * 20 <= n_words
         |               AND n_stop_kinds >= 2
         |              THEN 1 ELSE 0 END AS r1
         |  FROM gm),
         |cells AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(r1 * r2) AS BIGINT) AS n11,
         |         CAST(sum(r1 * (1 - r2)) AS BIGINT) AS n10,
         |         CAST(sum((1 - r1) * r2) AS BIGINT) AS n01,
         |         CAST(sum((1 - r1) * (1 - r2)) AS BIGINT) AS n00
         |  FROM r1t JOIN r2t USING (doc_id))
         |SELECT n, n11, n10, n01, n00, n11 + n00 AS n_agree,
         |       ${r4("CAST(n*(n11+n00) - ((n11+n10)*(n11+n01)" +
              " + (n01+n00)*(n10+n00)) AS DOUBLE)" +
              " / CAST(n*n - ((n11+n10)*(n11+n01)" +
              " + (n01+n00)*(n10+n00)) AS DOUBLE)")} AS kappa
         |FROM cells""".stripMargin,

    // Redaction order (email → ip → num) and the 'g' flag mirror the
    // Column form exactly; counts + (len, hash) pin the redacted
    // bytes without emitting the corpus.
    "q_pii_redact" ->
      s"""WITH enriched AS (
         |  SELECT doc_id, ${TextAnalysis.piiEnrichSql} AS etext
         |  FROM documents),
         |red AS (
         |  SELECT doc_id, etext,
         |         regexp_replace(regexp_replace(regexp_replace(etext,
         |           '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |           '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
         |           '${TextAnalysis.LongNumRe}', '<NUM>', 'g') AS rtext
         |  FROM enriched)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(etext,
         |         '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(etext,
         |         '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ips,
         |       CAST(len(regexp_extract_all(etext,
         |         '${TextAnalysis.LongNumRe}')) AS BIGINT) AS n_longnums,
         |       CAST(length(rtext) AS BIGINT) AS redacted_len,
         |       CAST(${graft.core.PortableHash.hSql("rtext")} AS BIGINT)
         |         AS redacted_hash
         |FROM red ORDER BY doc_id""".stripMargin,

    "q_chunk_docs" ->
      s"""WITH starts AS (
         |  SELECT doc_id, text,
         |         unnest(generate_series(0,
         |           (length(text)-1)//${Packing.Stride})) AS chunk_id
         |  FROM documents WHERE length(text) > 0),
         |chunks AS (
         |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |         substr(text,
         |           CAST(chunk_id*${Packing.Stride} + 1 AS BIGINT),
         |           ${Packing.ChunkSize}) AS chunk
         |  FROM starts)
         |SELECT doc_id, chunk_id,
         |       CAST(length(chunk) AS BIGINT) AS chunk_len,
         |       CAST(${graft.core.PortableHash.hSql("chunk")} AS BIGINT)
         |         AS chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    // Token-budget chunking: list_slice over the same whitespace
    // split, re-joined so the hash pins the exact chunk bytes.
    "q_chunk_tokens" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents WHERE length(text) > 0),
         |starts AS (
         |  SELECT doc_id, w,
         |         unnest(generate_series(0,
         |           (len(w)-1)//${Packing.TokenStride})) AS chunk_id
         |  FROM t),
         |chunks AS (
         |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |         array_to_string(list_slice(w,
         |           chunk_id*${Packing.TokenStride} + 1,
         |           chunk_id*${Packing.TokenStride} + ${Packing.TokenBudget}),
         |           ' ') AS chunk,
         |         len(list_slice(w,
         |           chunk_id*${Packing.TokenStride} + 1,
         |           chunk_id*${Packing.TokenStride} + ${Packing.TokenBudget}))
         |           AS tok_len
         |  FROM starts)
         |SELECT doc_id, chunk_id,
         |       CAST(tok_len AS BIGINT) AS tok_len,
         |       CAST(length(chunk) AS BIGINT) AS chunk_len,
         |       CAST(${graft.core.PortableHash.hSql("chunk")} AS BIGINT)
         |         AS chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    // Full BPE replay: the learn loop (capped vocab seed + per-merge
    // pair-count/argmax/merge CTEs, AS MATERIALIZED so DuckDB doesn't
    // re-inline the chain exponentially) feeds the apply chain (one
    // replace CTE per learned merge over the per-doc word list), and
    // the subword count is the `]`-count of the folded string — the
    // exact twin of Bpe.docBpeCol. LEFT JOIN keeps any doc whose
    // word list is empty at n_bpe = 0 (the Spark side's aggregate
    // over an empty array).
    "q_bpe_tokens" -> bpeTokensOracleSql,

    // One oracle text, two engine paths (replace chain vs the
    // rank-indexed kernel) — the kernel==chain contract, scored.
    "q_bpe_tokens_kernel" -> bpeTokensOracleSql,

    // Same learned table; the chunk cut is a per-doc window over the
    // word-position order (exclusive running subword sum div budget).
    "q_chunk_bpe" ->
      s"""WITH ${Bpe.learnCtesSql()},
         |wl AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '),
         |    x -> x <> '') AS ws
         |  FROM documents),
         |wp AS (
         |  SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws
         |  FROM wl),
         |wsrc AS (SELECT doc_id, pos, ws[pos] AS w FROM wp),
         |${Bpe.applyCtesSql("wsrc", Seq("doc_id", "pos"))},
         |perword AS (
         |  SELECT doc_id, pos, ${Bpe.countSql("tok")} AS c
         |  FROM t${Bpe.NumMerges}),
         |off AS (
         |  SELECT doc_id, c,
         |         CAST(COALESCE(sum(c) OVER (PARTITION BY doc_id
         |           ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
         |           AND 1 PRECEDING), 0) AS BIGINT) AS o
         |  FROM perword)
         |SELECT doc_id, o // ${Bpe.BpeBudget} AS chunk_id,
         |       CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(c) AS BIGINT) AS n_bpe
         |FROM off GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin,

    // q_pack_sequences' oracle with the token mass swapped to the
    // replayed BPE counts (global-window prefix sum — single-reducer
    // is fine for DuckDB at sf; the Spark side is the two-pass scan).
    "q_pack_bpe" ->
      s"""WITH ${Bpe.learnCtesSql()},
         |wsrc AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |    x -> x <> '')) AS w
         |  FROM documents),
         |${Bpe.applyCtesSql("wsrc", Seq("doc_id"))},
         |perword AS (
         |  SELECT doc_id, ${Bpe.countSql("tok")} AS c
         |  FROM t${Bpe.NumMerges}),
         |t AS (
         |  SELECT d.doc_id,
         |         CAST(COALESCE(sum(p.c), 0) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN perword p USING (doc_id)
         |  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
         |  GROUP BY 1),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS tok_offset
         |  FROM t)
         |SELECT doc_id, n_tokens, tok_offset,
         |       tok_offset // ${Packing.BinCapacity} AS bin_first,
         |       (tok_offset + n_tokens - 1) // ${Packing.BinCapacity}
         |         AS bin_last,
         |       ((tok_offset + n_tokens - 1) // ${Packing.BinCapacity})
         |         - (tok_offset // ${Packing.BinCapacity}) + 1 AS n_bins
         |FROM c ORDER BY doc_id""".stripMargin,

    // The replayed learn loop's per-step argmaxes, in merge order.
    "q_bpe_vocab" ->
      s"""WITH ${Bpe.learnCtesSql()}
         |${(0 until Bpe.NumMerges).map(i =>
              s"SELECT CAST(${i + 1} AS BIGINT) AS rank, a, b FROM b$i")
              .mkString("", "\nUNION ALL\n", "")}
         |ORDER BY rank""".stripMargin,

    // Same learned merge chain as q_bpe_tokens; the per-lang ratio is
    // one double division over exact integer sums.
    "q_bpe_fertility" ->
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
         |  FROM perword GROUP BY 1),
         |j AS (
         |  SELECT d.lang, COALESCE(p.n_ws, 0) AS n_ws,
         |         COALESCE(p.n_bpe, 0) AS n_bpe
         |  FROM documents d LEFT JOIN perdoc p USING (doc_id))
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(n_ws) AS BIGINT) AS n_words,
         |       CAST(sum(n_bpe) AS BIGINT) AS n_bpe,
         |       ${r4("CAST(sum(n_bpe) AS DOUBLE) / " +
              "CAST(sum(n_ws) AS DOUBLE)")} AS fertility
         |FROM j GROUP BY 1 ORDER BY lang""".stripMargin,

    // q_pack_sequences' token definition (unfiltered whitespace
    // split, like the Spark side); integer ceil via (x + B-1) // B.
    "q_pack_efficiency" -> {
      val b = Packing.BinCapacity
      s"""WITH t AS (
         |  SELECT source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |g AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |         CAST(sum(((n_tok + ${b - 1}) // $b) * $b) AS BIGINT)
         |           AS naive_padded
         |  FROM t GROUP BY 1),
         |p AS (
         |  SELECT *, ((n_tokens + ${b - 1}) // $b) * $b AS packed_padded
         |  FROM g)
         |SELECT source, n_docs, n_tokens, naive_padded, packed_padded,
         |       ${r4("CAST(naive_padded - n_tokens AS DOUBLE) / " +
              "CAST(naive_padded AS DOUBLE)")} AS naive_waste,
         |       ${r4("CAST(packed_padded - n_tokens AS DOUBLE) / " +
              "CAST(packed_padded AS DOUBLE)")} AS packed_waste
         |FROM p ORDER BY source""".stripMargin
    },

    // The oracle spells the prefix sum as a global window — fine for
    // DuckDB at sf, single-reducer at 100 TB, which is exactly why
    // the Spark side uses the two-pass scan instead (Packing
    // scaladoc). Values agree because both are THE prefix sum over
    // the same total order.
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS tok_offset
         |  FROM t)
         |SELECT doc_id, n_tokens, tok_offset,
         |       tok_offset // ${Packing.BinCapacity} AS bin_first,
         |       (tok_offset + n_tokens - 1) // ${Packing.BinCapacity}
         |         AS bin_last,
         |       ((tok_offset + n_tokens - 1) // ${Packing.BinCapacity})
         |         - (tok_offset // ${Packing.BinCapacity}) + 1 AS n_bins
         |FROM c ORDER BY doc_id""".stripMargin,

    // Shard manifest: same hash order, window-replayed prefix sum
    // (exact in DuckDB at this scale), same ⌊offset·N/T⌋ cut.
    "q_shard_manifest" ->
      s"""WITH dt AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         CAST(${PortableHash.hSql("CAST(doc_id AS VARCHAR)")}
         |              AS BIGINT) AS h
         |  FROM documents),
         |k AS (SELECT doc_id, n_tokens, h * 16777216 + doc_id AS k2
         |      FROM dt),
         |p AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY k2
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS tok_offset
         |  FROM k),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM dt)
         |SELECT least(tok_offset * 16 // t, 15) AS shard,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
         |       CAST(sum(n_tokens) AS BIGINT) * 16 - max(t)
         |         AS dev_from_ideal_xn
         |FROM p, tot GROUP BY 1 ORDER BY 1""".stripMargin,

    // DSIR: same hashed-bigram buckets, same integer-log2 pipeline;
    // the corpus-total constant folds in as n_bigrams × (log2Fx(Tr+B)
    // − log2Fx(Tt+B)), exactly as the engine does.
    "q_dsir_weights" -> {
      val cfx = s"(${LmScore.log2FxSql("t.tr + 1024")} - " +
        s"${LmScore.log2FxSql("t.tt + 1024")})"
      s"""WITH dws AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS w
         |  FROM documents),
         |dbg AS (
         |  SELECT doc_id, lang,
         |         unnest(list_transform(range(1, len(w)),
         |           i -> w[i] || ' ' || w[i+1])) AS bigram
         |  FROM dws WHERE len(w) >= 2),
         |dbk AS (
         |  SELECT doc_id, lang,
         |         (${PortableHash.hSql("bigram")}) % 1024 AS bkt
         |  FROM dbg),
         |drc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cr
         |        FROM dbk GROUP BY 1),
         |dtc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS ct
         |        FROM dbk WHERE lang = 'en' GROUP BY 1),
         |dtot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS tr,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |              AS BIGINT) AS tt
         |  FROM dbk),
         |dlr AS (
         |  SELECT r.bkt,
         |         ${LmScore.log2FxSql("coalesce(t.ct, 0) + 1")}
         |           - ${LmScore.log2FxSql("r.cr + 1")} AS lr
         |  FROM drc r LEFT JOIN dtc t USING (bkt)),
         |dper AS (
         |  SELECT b.doc_id, max(b.lang) AS lang,
         |         CAST(count(*) AS BIGINT) AS n_bigrams,
         |         CAST(sum(l.lr) AS BIGINT) AS sum_lr
         |  FROM dbk b JOIN dlr l ON l.bkt = b.bkt GROUP BY 1)
         |SELECT p.doc_id, p.lang, p.n_bigrams,
         |       p.sum_lr + p.n_bigrams * $cfx AS w_fx,
         |       ${r4("CAST(p.sum_lr + p.n_bigrams * " + cfx +
              " AS DOUBLE) / 1048576.0")} AS logw
         |FROM dper p, dtot t ORDER BY p.doc_id""".stripMargin
    },

    // Unigram model + Viterbi replay (Unigram.ctesSql). Recursive, so
    // no Oracle.mat().
    "q_unigram_segment" ->
      s"""WITH RECURSIVE ${Unigram.ctesSql}
         |SELECT word, cnt, n_pieces, cost_fx, seg
         |FROM useg ORDER BY word""".stripMargin,

    "q_unigram_fertility" ->
      s"""WITH RECURSIVE ${Unigram.ctesSql},
         |ustream AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS word
         |  FROM documents)
         |SELECT s.lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(g.n_pieces) AS BIGINT) AS n_pieces,
         |       CAST(sum(g.cost_fx) AS BIGINT) AS cost_fx,
         |       ${r4("CAST(sum(g.n_pieces) AS DOUBLE) / count(*)")}
         |         AS fertility
         |FROM ustream s JOIN useg g USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // WordPiece model + greedy-walk replay (WordPiece.ctesSql).
    // Recursive, so no Oracle.mat().
    "q_wordpiece_segment" ->
      s"""WITH RECURSIVE ${WordPiece.ctesSql}
         |SELECT word, cnt, n_pieces, seg
         |FROM wseg ORDER BY word""".stripMargin,

    "q_wordpiece_fertility" ->
      s"""WITH RECURSIVE ${WordPiece.ctesSql},
         |wstream AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS word
         |  FROM documents)
         |SELECT s.lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(g.n_pieces) AS BIGINT) AS n_pieces,
         |       ${r4("CAST(sum(g.n_pieces) AS DOUBLE) / count(*)")}
         |         AS fertility
         |FROM wstream s JOIN wseg g USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_repetition_filter" ->
      s"""WITH ${Dedup.shinglesSql},
         |cnt AS (SELECT doc_id, shingle, count(*) AS c
         |        FROM shingles GROUP BY 1, 2)
         |SELECT doc_id,
         |       CAST(sum(c) AS BIGINT) AS n_shingles,
         |       count(*) AS n_distinct,
         |       max(c) AS max_rep,
         |       ${r4("CAST(sum(c) - count(*) AS DOUBLE) / " +
              "CAST(sum(c) AS DOUBLE)")} AS dup_ratio
         |FROM cnt GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Temperature mix over the k-means assignment replay (shared
    // chain, assign2 = final assignment), same unrounded-p
    // discipline as the source-label twin.
    "q_cluster_mix_weights" -> Oracle.mat({
      val pe = "(CAST(n_docs AS DOUBLE)/CAST(tot AS DOUBLE))"
      s"""WITH ${kmeansAssignCtes(k = 8, iters = 2)},
         |bycell AS (
         |  SELECT cell_id, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM assign2 GROUP BY 1),
         |ctot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM bycell),
         |snapped AS (
         |  SELECT cell_id, n_docs,
         |         ${r4(pe)} AS p,
         |         CAST(floor(sqrt(sqrt($pe * $pe * $pe)) * 1000000000.0
         |              + 0.5) AS BIGINT) AS wfx
         |  FROM bycell, ctot),
         |cwt AS (SELECT CAST(sum(wfx) AS BIGINT) AS wtot FROM snapped)
         |SELECT cell_id, n_docs, p,
         |       ${r4("CAST(wfx AS DOUBLE)/CAST(wtot AS DOUBLE)")} AS w
         |FROM snapped, cwt
         |ORDER BY cell_id""".stripMargin
    }),

    // Same arithmetic, spelled out: raw share p goes UNROUNDED into
    // sqrt(sqrt(p*p*p)); only the emitted columns are r4-rounded.
    "q_domain_mix_weights" -> {
      val pe = "(CAST(n_chars AS DOUBLE)/CAST(tot AS DOUBLE))"
      s"""WITH bysrc AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tot FROM bysrc),
         |snapped AS (
         |  SELECT source, n_docs, n_chars,
         |         ${r4(pe)} AS p,
         |         CAST(floor(sqrt(sqrt($pe * $pe * $pe)) * 1000000000.0
         |              + 0.5) AS BIGINT) AS wfx
         |  FROM bysrc, tot),
         |wt AS (SELECT CAST(sum(wfx) AS BIGINT) AS wtot FROM snapped)
         |SELECT source, n_docs, n_chars, p,
         |       ${r4("CAST(wfx AS DOUBLE)/CAST(wtot AS DOUBLE)")} AS w
         |FROM snapped, wt
         |ORDER BY source""".stripMargin
    },

    // Same fixed-point discipline over TOKEN shares, plus the 4×
    // budget allocation — every double expression is the Spark
    // side's, operation for operation.
    "q_mix_epochs" -> {
      val pe = "(CAST(toks AS DOUBLE)/CAST(ttot AS DOUBLE))"
      val plan = "CAST(wfx AS DOUBLE) * 4.0 * CAST(ttot AS DOUBLE)" +
        " / CAST(wtot AS DOUBLE)"
      s"""WITH bysrc AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |           AS toks
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS ttot FROM bysrc),
         |snapped AS (
         |  SELECT source, n_docs, toks, ttot,
         |         ${r4(pe)} AS p,
         |         CAST(floor(sqrt(sqrt($pe * $pe * $pe)) * 1000000000.0
         |              + 0.5) AS BIGINT) AS wfx
         |  FROM bysrc, tot),
         |wt AS (SELECT CAST(sum(wfx) AS BIGINT) AS wtot FROM snapped)
         |SELECT source, n_docs, toks, p,
         |       ${r4("CAST(wfx AS DOUBLE)/CAST(wtot AS DOUBLE)")} AS w,
         |       CAST(floor($plan + 0.5) AS BIGINT) AS planned_toks,
         |       ${r4(s"$plan / CAST(toks AS DOUBLE)")} AS epochs
         |FROM snapped, wt
         |ORDER BY source""".stripMargin
    },

    // Non-overlapping regexp counts == the automaton's
    // every-occurrence counts because the dictionary is border-free.
    "q_keyword_tags" -> {
      val vals = KeywordTags.Keywords.map(k => s"('$k')").mkString(", ")
      s"""WITH kw AS (SELECT * FROM (VALUES $vals) t(keyword)),
         |h AS (
         |  SELECT k.keyword, d.doc_id,
         |         len(regexp_extract_all(d.text, k.keyword)) AS hits
         |  FROM documents d CROSS JOIN kw k)
         |SELECT keyword, count(*) AS n_docs,
         |       CAST(sum(hits) AS BIGINT) AS n_hits
         |FROM h WHERE hits > 0
         |GROUP BY 1 ORDER BY keyword""".stripMargin
    },

    // Exact integer-log2 points, exact BIGINT normal equations; the
    // two final divisions are the only doubles, mirrored op-for-op.
    "q_zipf_fit" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |freq AS (
         |  SELECT w, count(*) AS f FROM words
         |  WHERE len(w) > 0 GROUP BY 1),
         |top AS (
         |  SELECT w, f FROM freq ORDER BY f DESC, w LIMIT $ZipfTopRanks),
         |rk AS (
         |  SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
         |  FROM top),
         |pts AS (
         |  SELECT CAST(${LmScore.log2FxSql("r")} AS BIGINT) AS x,
         |         CAST(${LmScore.log2FxSql("f")} AS BIGINT) AS y
         |  FROM rk),
         |s AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx,
         |         CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(x*y) AS BIGINT) AS sxy,
         |         CAST(sum(x*x) AS BIGINT) AS sxx
         |  FROM pts),
         |nd AS (
         |  SELECT n, sx, sy,
         |         CAST(n*sxy - sx*sy AS DOUBLE) AS num,
         |         CAST(n*sxx - sx*sx AS DOUBLE) AS den
         |  FROM s)
         |SELECT n AS n_ranks,
         |       ${r4("num/den")} AS slope,
         |       ${r4("(CAST(sy AS DOUBLE) - num/den*CAST(sx AS DOUBLE))" +
                "/CAST(n AS DOUBLE)/1048576.0")} AS intercept_log2
         |FROM nd""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       CAST(ascii(substr(text, 1, 1)) % 4 AS BIGINT) AS format_id,
        |       CAST(64 + octet_length(CAST(text AS BLOB)) % 640 AS BIGINT)
        |         AS width,
        |       CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 480 AS BIGINT)
        |         AS height,
        |       CAST(floor(octet_length(CAST(text AS BLOB)) / 32.0) + 1
        |            AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The decoded dimensions are INDEPENDENTLY predicted from the
    // fixture's id→geometry constants; only n_bytes comes from the
    // parquet (both engines read the same encoded payload bytes).
    "q_multimodal_decode" ->
      s"""SELECT doc_id,
         |       CAST(octet_length(media) AS BIGINT) AS n_bytes,
         |       CAST(10 + doc_id % 4 AS BIGINT) AS format_id,
         |       CAST(8 + (doc_id * 3) % 24 AS BIGINT) AS width,
         |       CAST(8 + (doc_id * 5) % 24 AS BIGINT) AS height,
         |       CAST(1 AS BIGINT) AS n_frames
         |FROM read_parquet('${graft.io.MediaFixtures.mediaPath(
                graft.io.DialectFixtures.OracleSfDir)}/*.parquet')
         |ORDER BY doc_id""".stripMargin,

    // Audio decode: every field except n_bytes is INDEPENDENTLY
    // predicted from the fixture's id→geometry constants (the
    // q_multimodal_decode pattern); duration is exact truncating
    // integer arithmetic on both sides.
    "q_multimodal_audio" -> {
      val rates = graft.io.AudioFixtures.Rates
      val rateCase = rates.zipWithIndex.init
        .map { case (r, i) => s"WHEN $i THEN $r" }
        .mkString(s"CASE CAST(doc_id % ${rates.length} AS INTEGER) ",
          " ", s" ELSE ${rates.last} END")
      s"""WITH a AS (
         |  SELECT doc_id, octet_length(media) AS nb,
         |         $rateCase AS rate,
         |         64 + (doc_id * 37) % 512 AS ns
         |  FROM read_parquet('${graft.io.AudioFixtures.audioPath(
                graft.io.DialectFixtures.OracleSfDir)}/*.parquet'))
         |SELECT doc_id,
         |       CAST(nb AS BIGINT) AS n_bytes,
         |       CAST(rate AS BIGINT) AS sample_rate,
         |       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
         |       CAST(16 AS BIGINT) AS sample_bits,
         |       CAST(ns AS BIGINT) AS n_samples,
         |       CAST(ns * 1000 // rate AS BIGINT) AS duration_ms
         |FROM a ORDER BY doc_id""".stripMargin
    },

    // Every frame row is INDEPENDENTLY predicted from the fixture's
    // (doc_id, frame_id) → geometry constants; only doc_id/n_bytes
    // come from the shared parquet (both engines see the same
    // container bytes). A parse failure on the Spark side emits no
    // rows → row-count red.
    "q_multimodal_frames" ->
      s"""WITH v AS (
         |  SELECT doc_id, octet_length(media) AS nb
         |  FROM read_parquet('${graft.io.VideoFixtures.videoPath(
                graft.io.DialectFixtures.OracleSfDir)}/*.parquet')),
         |f AS (
         |  SELECT doc_id, nb,
         |         unnest(generate_series(0, CAST(1 + doc_id % 5 AS BIGINT)))
         |           AS frame_id
         |  FROM v)
         |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
         |       CAST(nb AS BIGINT) AS n_bytes,
         |       CAST(8 + (doc_id * 3) % 16 AS BIGINT) AS width,
         |       CAST(8 + (doc_id * 5) % 16 AS BIGINT) AS height,
         |       CAST(5 + (doc_id + 3 * frame_id) % 10 AS BIGINT) AS delay_cs
         |FROM f ORDER BY doc_id, frame_id""".stripMargin,

    // Frame sampling: the delay formula through the same cumsum +
    // interval-cover arithmetic.
    "q_frame_sample" ->
      s"""WITH v AS (
         |  SELECT doc_id
         |  FROM read_parquet('${graft.io.VideoFixtures.videoPath(
              graft.io.DialectFixtures.OracleSfDir)}/*.parquet')),
         |f AS (
         |  SELECT doc_id,
         |         unnest(generate_series(0, CAST(1 + doc_id % 5 AS BIGINT)))
         |           AS frame_id
         |  FROM v),
         |dl AS (
         |  SELECT doc_id, frame_id,
         |         5 + (doc_id + 3 * frame_id) % 10 AS delay_cs
         |  FROM f),
         |tl AS (
         |  SELECT doc_id, frame_id, delay_cs,
         |         sum(delay_cs) OVER (PARTITION BY doc_id
         |                             ORDER BY frame_id) - delay_cs
         |           AS start_cs
         |  FROM dl),
         |dur AS (SELECT doc_id, max(start_cs + delay_cs) AS dur
         |        FROM tl GROUP BY 1),
         |inst AS (
         |  SELECT doc_id,
         |         unnest(generate_series(0, CAST(dur - 1 AS BIGINT), 10))
         |           AS t_cs
         |  FROM dur)
         |SELECT i.doc_id, CAST(i.t_cs AS BIGINT) AS t_cs,
         |       CAST(t.frame_id AS BIGINT) AS frame_id,
         |       CAST(t.start_cs AS BIGINT) AS start_cs,
         |       CAST(t.delay_cs AS BIGINT) AS delay_cs
         |FROM inst i JOIN tl t ON t.doc_id = i.doc_id
         |  AND i.t_cs >= t.start_cs
         |  AND i.t_cs < t.start_cs + t.delay_cs
         |ORDER BY 1, 2""".stripMargin,

    // Formula edges + the recursive min-label CC replay (the
    // q_dedup_clusters oracle pattern over the phash edge set).
    "q_image_phash_clusters" ->
      """WITH RECURSIVE ids AS (SELECT unnest(generate_series(0, 47)) AS id),
        |vs AS (SELECT unnest(generate_series(0, 2)) AS v),
        |bxs AS (SELECT unnest(generate_series(0, 8)) AS bx),
        |bys AS (SELECT unnest(generate_series(0, 7)) AS by),
        |grid AS (
        |  SELECT id, v, bx, by,
        |         (id*7 + (CASE WHEN v = 2 THEN 8 - bx ELSE bx END)*13
        |          + by*29) % 192
        |           + CASE WHEN v = 1 THEN 8 ELSE 0 END AS val
        |  FROM ids, vs, bxs, bys),
        |bits AS (
        |  SELECT g1.id*3 + g1.v AS img, g1.by*8 + g1.bx AS pos,
        |         CASE WHEN g2.val > g1.val THEN 1 ELSE 0 END AS bit
        |  FROM grid g1 JOIN grid g2
        |    ON g2.id = g1.id AND g2.v = g1.v AND g2.by = g1.by
        |   AND g2.bx = g1.bx + 1
        |  WHERE g1.bx < 8),
        |pb AS (
        |  SELECT a.img AS ia, b.img AS ib, a.pos // 16 AS band,
        |         sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS bd
        |  FROM bits a JOIN bits b ON a.pos = b.pos AND a.img < b.img
        |  GROUP BY 1, 2, 3),
        |pairs AS (
        |  SELECT ia, ib, sum(bd) AS hamming,
        |         max(CASE WHEN bd = 0 THEN 1 ELSE 0 END) AS sb
        |  FROM pb GROUP BY 1, 2),
        |edges AS (
        |  SELECT ia AS d1, ib AS d2 FROM pairs
        |  WHERE sb = 1 AND hamming <= 3),
        |sym AS (
        |  SELECT d1 AS src, d2 AS dst FROM edges
        |  UNION ALL
        |  SELECT d2 AS src, d1 AS dst FROM edges),
        |imgs AS (SELECT unnest(generate_series(0, 143)) AS img),
        |cc AS (
        |  SELECT img AS node, img AS label FROM imgs
        |  UNION
        |  SELECT sym.dst AS node, cc.label
        |  FROM cc JOIN sym ON cc.node = sym.src)
        |SELECT CAST(node AS BIGINT) AS doc_id,
        |       CAST(min(label) AS BIGINT) AS cluster_id,
        |       CAST(CASE WHEN node = min(label) THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_keeper
        |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin,

    // The gate replay: hashes from the grid FORMULA (the q_image_phash
    // bits, MSB-first as the engine's lpad(bin())), then the gate's
    // exact semantics in SQL — base hit beats in-batch duplicate,
    // first arrival (min doc_id) wins within a signature.
    "q_stream_phash_gate" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 47)) AS id),
        |vs AS (SELECT unnest(generate_series(0, 2)) AS v),
        |bxs AS (SELECT unnest(generate_series(0, 8)) AS bx),
        |bys AS (SELECT unnest(generate_series(0, 7)) AS by),
        |grid AS (
        |  SELECT id, v, bx, by,
        |         (id*7 + (CASE WHEN v = 2 THEN 8 - bx ELSE bx END)*13
        |          + by*29) % 192
        |           + CASE WHEN v = 1 THEN 8 ELSE 0 END AS val
        |  FROM ids, vs, bxs, bys),
        |bits AS (
        |  SELECT g1.id*3 + g1.v AS img, g1.by*8 + g1.bx AS pos,
        |         CASE WHEN g2.val > g1.val THEN 1 ELSE 0 END AS bit
        |  FROM grid g1 JOIN grid g2
        |    ON g2.id = g1.id AND g2.v = g1.v AND g2.by = g1.by
        |   AND g2.bx = g1.bx + 1
        |  WHERE g1.bx < 8),
        |sigs AS (
        |  SELECT img, string_agg(CAST(bit AS VARCHAR), '' ORDER BY pos DESC)
        |           AS sig
        |  FROM bits GROUP BY 1),
        |base AS (SELECT sig, min(img) AS first_doc
        |         FROM sigs WHERE img % 3 = 0 GROUP BY 1),
        |inc AS (SELECT img, sig FROM sigs WHERE img % 3 <> 0),
        |w AS (
        |  SELECT inc.img, b.first_doc,
        |         min(inc.img) OVER (PARTITION BY inc.sig ORDER BY inc.img
        |                            ROWS BETWEEN UNBOUNDED PRECEDING
        |                            AND 1 PRECEDING) AS prev_img
        |  FROM inc LEFT JOIN base b USING (sig))
        |SELECT img AS doc_id,
        |       CASE WHEN first_doc IS NOT NULL THEN 'dup_of_base'
        |            WHEN prev_img IS NOT NULL THEN 'dup_in_batch'
        |            ELSE 'new' END AS status,
        |       CAST(coalesce(first_doc, prev_img, -1) AS BIGINT) AS dup_of
        |FROM w ORDER BY doc_id""".stripMargin,

    // Every fingerprint bit is INDEPENDENTLY replayed from the WAV
    // fixture's sawtooth FORMULA (AudioFixtures.encode: value j of
    // doc id is ((id*131 + j*37) % 65536) - 32768, nS*ch values);
    // the engine side must reproduce it from the decoded PCM bytes.
    "q_audio_fingerprint" ->
      s"""WITH a AS (
         |  SELECT doc_id, 64 + (doc_id * 37) % 512 AS ns,
         |         1 + doc_id % 2 AS ch
         |  FROM read_parquet('${graft.io.AudioFixtures.audioPath(
                graft.io.DialectFixtures.OracleSfDir)}/*.parquet')),
         |idx AS (
         |  SELECT doc_id, ns * ch AS nv,
         |         unnest(generate_series(0, ns * ch - 1)) AS j
         |  FROM a),
         |sm AS (
         |  SELECT doc_id, j * 8 // nv AS chunk,
         |         abs((doc_id * 131 + j * 37) % 65536 - 32768) AS av
         |  FROM idx),
         |cm AS (
         |  SELECT doc_id, chunk,
         |         CAST(sum(av) AS BIGINT) // count(*) AS m
         |  FROM sm GROUP BY 1, 2),
         |bits AS (
         |  SELECT c1.doc_id, c1.chunk AS i,
         |         CASE WHEN c2.m > c1.m THEN 1 ELSE 0 END AS bit
         |  FROM cm c1 JOIN cm c2
         |    ON c2.doc_id = c1.doc_id AND c2.chunk = c1.chunk + 1)
         |SELECT doc_id, CAST(sum(bit * (1 << i)) AS BIGINT) AS fingerprint
         |FROM bits GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Every dHash bit is INDEPENDENTLY replayed from the fixture's
    // block-level FORMULA (PhashFixtures.levelOf): a dHash bit is
    // "right block mean > left block mean" and the blocks are
    // constant, so the comparison IS the formula. The banded
    // candidate restriction and the hamming rescore replay in SQL
    // over those bits — the engine's pixel path (PNG decode, integer
    // luminance, box means, bit packing, band join, popcount) must
    // land on identical pairs cell-for-cell.
    // Resize replay: the fixture level formula + the same box-mean
    // arithmetic (cell = 3×4 blocks of 4×4 px; gray pixel luminance
    // is exactly its level, so sum_lum = 16·Σ levels).
    "q_image_thumbnail" ->
      s"""WITH ids AS (SELECT unnest(generate_series(0, 47)) AS id),
         |vs AS (SELECT unnest(generate_series(0, 2)) AS v),
         |bxs AS (SELECT unnest(generate_series(0, 8)) AS bx),
         |bys AS (SELECT unnest(generate_series(0, 7)) AS by),
         |grid AS (
         |  SELECT id, v, bx, by,
         |         (id*7 + (CASE WHEN v = 2 THEN 8 - bx ELSE bx END)*13
         |          + by*29) % 192
         |           + CASE WHEN v = 1 THEN 8 ELSE 0 END AS val
         |  FROM ids, vs, bxs, bys),
         |cells AS (
         |  SELECT id*3 + v AS img_id, bx // 3 AS cx, by // 4 AS cy,
         |         CAST(16 * count(*) AS BIGINT) AS n_px,
         |         CAST(16 * sum(val) AS BIGINT) AS sum_lum
         |  FROM grid GROUP BY 1, 2, 3)
         |SELECT img_id, cx, cy, n_px, sum_lum,
         |       ${r4("CAST(sum_lum AS DOUBLE) / CAST(n_px AS DOUBLE)")}
         |         AS mean_lum
         |FROM cells ORDER BY img_id, cy, cx""".stripMargin,

    "q_image_phash" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 47)) AS id),
        |vs AS (SELECT unnest(generate_series(0, 2)) AS v),
        |bxs AS (SELECT unnest(generate_series(0, 8)) AS bx),
        |bys AS (SELECT unnest(generate_series(0, 7)) AS by),
        |grid AS (
        |  SELECT id, v, bx, by,
        |         (id*7 + (CASE WHEN v = 2 THEN 8 - bx ELSE bx END)*13
        |          + by*29) % 192
        |           + CASE WHEN v = 1 THEN 8 ELSE 0 END AS val
        |  FROM ids, vs, bxs, bys),
        |bits AS (
        |  SELECT g1.id*3 + g1.v AS img, g1.by*8 + g1.bx AS pos,
        |         CASE WHEN g2.val > g1.val THEN 1 ELSE 0 END AS bit
        |  FROM grid g1 JOIN grid g2
        |    ON g2.id = g1.id AND g2.v = g1.v AND g2.by = g1.by
        |   AND g2.bx = g1.bx + 1
        |  WHERE g1.bx < 8),
        |pb AS (
        |  SELECT a.img AS ia, b.img AS ib, a.pos // 16 AS band,
        |         sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS bd
        |  FROM bits a JOIN bits b ON a.pos = b.pos AND a.img < b.img
        |  GROUP BY 1, 2, 3),
        |pairs AS (
        |  SELECT ia, ib, CAST(sum(bd) AS BIGINT) AS hamming,
        |         max(CASE WHEN bd = 0 THEN 1 ELSE 0 END) AS sb
        |  FROM pb GROUP BY 1, 2)
        |SELECT CAST(ia AS BIGINT) AS img_a, CAST(ib AS BIGINT) AS img_b,
        |       hamming
        |FROM pairs WHERE sb = 1 AND hamming <= 3
        |ORDER BY img_a, img_b""".stripMargin,

    "q_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |flagged AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                OR ts_us - lag(ts_us) OVER w >= 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |sessions AS (
        |  SELECT user_id, ts_us,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
        |                                ROWS BETWEEN UNBOUNDED PRECEDING
        |                                AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, min(ts_us) AS start_us,
        |       max(ts_us) + 1800000000 AS end_us,
        |       count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, start_us""".stripMargin,

    // Self-contained exact-kNN replay (k-prefixed CTEs, disjoint from
    // the ANN chains): fixed-point dots/norms, leave-one-out top-3,
    // majority vote with the (count desc, best rank, label) tie order.
    "q_knn_classify" ->
      s"""WITH $knnPredCtes
         |SELECT p.qid, p.pred_label,
         |       CAST(q.label AS BIGINT) AS true_label,
         |       CAST(CASE WHEN p.pred_label = q.label THEN 1 ELSE 0 END
         |            AS BIGINT) AS correct
         |FROM kpred p JOIN embeddings q ON q.vec_id = p.qid
         |ORDER BY p.qid""".stripMargin,

    // Per-label aggregation of the SAME kpred chain — prediction and
    // noise screen cannot drift.
    "q_label_noise" ->
      s"""WITH $knnPredCtes,
         |per AS (
         |  SELECT CAST(q.label AS BIGINT) AS true_label,
         |         CASE WHEN p.pred_label = q.label THEN 0 ELSE 1 END AS dis
         |  FROM kpred p JOIN embeddings q ON q.vec_id = p.qid)
         |SELECT true_label, count(*) AS n_probes,
         |       CAST(sum(dis) AS BIGINT) AS n_disagree,
         |       floor((CAST(sum(dis) AS DOUBLE) / count(*))*10000 + 0.5)
         |         /10000.0 AS noise_rate
         |FROM per GROUP BY 1 ORDER BY true_label""".stripMargin,


    // Triplet mining: the kscored chain (same CTEs as knn), labels
    // joined, extremes via ranked windows. LEFT joins mirror the
    // engine's null-on-empty-side struct aggregation.
    "q_triplet_mining" ->
      s"""WITH $knnPredCtes,
         |tlab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
         |         FROM embeddings),
         |tsc AS (
         |  SELECT s.qid, ql.label AS qlabel, s.vec_id, el.label,
         |         s.cos_sim
         |  FROM kscored s
         |  JOIN tlab ql ON ql.vec_id = s.qid
         |  JOIN tlab el ON el.vec_id = s.vec_id),
         |thp AS (
         |  SELECT qid, vec_id, cos_sim FROM (
         |    SELECT qid, vec_id, cos_sim,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY cos_sim, vec_id) AS rn
         |    FROM tsc WHERE label = qlabel) WHERE rn = 1),
         |thn AS (
         |  SELECT qid, vec_id, cos_sim FROM (
         |    SELECT qid, vec_id, cos_sim,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY cos_sim DESC, vec_id)
         |             AS rn
         |    FROM tsc WHERE label != qlabel) WHERE rn = 1),
         |tcnt AS (
         |  SELECT qid, max(qlabel) AS label,
         |         CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_pos,
         |         CAST(sum(CASE WHEN label != qlabel THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_neg
         |  FROM tsc GROUP BY 1)
         |SELECT c.qid, c.label, c.n_pos, c.n_neg,
         |       hp.vec_id AS hard_pos_id, hp.cos_sim AS pos_cos,
         |       hn.vec_id AS hard_neg_id, hn.cos_sim AS neg_cos,
         |       ${r4("hn.cos_sim - hp.cos_sim")} AS violation_margin,
         |       CAST(CASE WHEN hn.cos_sim IS NULL OR hp.cos_sim IS NULL
         |                 THEN NULL
         |                 WHEN hn.cos_sim > hp.cos_sim THEN 1 ELSE 0 END
         |            AS BIGINT) AS violated
         |FROM tcnt c
         |LEFT JOIN thp hp ON hp.qid = c.qid
         |LEFT JOIN thn hn ON hn.qid = c.qid
         |ORDER BY c.qid""".stripMargin,

    // Shares the normalized-signature constant with q_dedup_exact, so
    // the matrix and the dedup pass agree on what "exact dup" means.
    "q_cross_source_dups" ->
      s"""WITH $dupSigSql,
         |ssig AS (
         |  SELECT n.sig, d.source
         |  FROM nsig n JOIN documents d USING (doc_id)),
         |bysrc AS (
         |  SELECT sig, source, count(*) AS n FROM ssig GROUP BY 1, 2),
         |p AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |         CASE WHEN a.source = b.source
         |              THEN (a.n * (a.n - 1)) // 2
         |              ELSE a.n * b.n END AS pairs
         |  FROM bysrc a JOIN bysrc b
         |    ON a.sig = b.sig AND a.source <= b.source)
         |SELECT source_a, source_b, CAST(sum(pairs) AS BIGINT) AS dup_pairs
         |FROM p WHERE pairs > 0
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same integer priority key — // is DuckDB's integer division,
    // mirroring Spark's `div` truncation (operands non-negative).
    "q_weighted_sample" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, lang, n_chars,
         |         (${PortableHash.spreadSql(PortableHash.hSql(
                "CAST(doc_id AS VARCHAR)"))} * 1048576) // n_chars
         |           AS priority
         |  FROM documents)
         |SELECT lang, rk, doc_id, n_chars, CAST(priority AS BIGINT)
         |         AS priority
         |FROM (SELECT *, row_number() OVER (PARTITION BY lang
         |                                   ORDER BY priority, doc_id) AS rk
         |      FROM keyed)
         |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,

    "q_mad_outliers" ->
      s"""WITH med AS (
         |  SELECT lang, quantile_cont(n_chars, 0.5) AS med,
         |         count(*) AS n_docs
         |  FROM documents GROUP BY 1),
         |dev AS (
         |  SELECT d.lang, m.med, m.n_docs,
         |         abs(CAST(d.n_chars AS DOUBLE) - m.med) AS adev
         |  FROM documents d JOIN med m USING (lang)),
         |mad AS (SELECT lang, quantile_cont(adev, 0.5) AS mad
         |        FROM dev GROUP BY 1)
         |SELECT dev.lang, CAST(min(n_docs) AS BIGINT) AS n_docs,
         |       ${r4("min(med)")} AS median_chars,
         |       ${r4("min(mad.mad)")} AS mad_chars,
         |       CAST(sum(CASE WHEN adev > 2.0*mad.mad THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_outliers
         |FROM dev JOIN mad USING (lang)
         |GROUP BY 1 ORDER BY lang""".stripMargin,

    // cd-prefixed CTEs (disjoint from the ANN chains); same 1e-9 /
    // 1e-12 fixed-point discipline as the centroid oracles.
    "q_embed_centroid_drift" ->
      s"""WITH cde AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label,
         |         CASE WHEN vec_id % 10 < 8 THEN 'train'
         |              ELSE 'holdout' END AS split,
         |         i, CAST(embedding[i] AS DOUBLE) AS v
         |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)),
         |cdc AS (
         |  SELECT label, split, i,
         |         (CAST(sum(CAST(floor(v*1000000000.0 + 0.5) AS BIGINT))
         |               AS DOUBLE) / count(*)) / 1000000000.0 AS cv
         |  FROM cde GROUP BY 1, 2, 3),
         |cdn AS (
         |  SELECT CAST(label AS BIGINT) AS label,
         |         CASE WHEN vec_id % 10 < 8 THEN 'train'
         |              ELSE 'holdout' END AS split,
         |         count(*) AS n
         |  FROM embeddings GROUP BY 1, 2),
         |cdd AS (
         |  SELECT a.label,
         |         CAST(sum(CAST(floor((a.cv-b.cv)*(a.cv-b.cv)
         |                             *1000000000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE) / 1000000000000.0 AS ss
         |  FROM cdc a JOIN cdc b ON a.label = b.label AND a.i = b.i
         |  WHERE a.split = 'train' AND b.split = 'holdout'
         |  GROUP BY 1)
         |SELECT d.label, nt.n AS n_train, nh.n AS n_holdout,
         |       ${r4("sqrt(ss)")} AS drift
         |FROM cdd d
         |JOIN cdn nt ON nt.label = d.label AND nt.split = 'train'
         |JOIN cdn nh ON nh.label = d.label AND nh.split = 'holdout'
         |ORDER BY d.label""".stripMargin,

    // Composes the quality CTEs with the shared dup-signature
    // constant — the two scored paths agree on both definitions.
    "q_dup_quality_xtab" ->
      s"""WITH $qualityCtes,
         |$dupSigSql,
         |dcnt AS (SELECT sig, count(*) AS cnt FROM nsig GROUP BY 1),
         |m AS (
         |  SELECT n.doc_id,
         |         CAST(CASE WHEN d.cnt > 1 THEN 1 ELSE 0 END AS BIGINT)
         |           AS is_dup
         |  FROM nsig n JOIN dcnt d USING (sig)),
         |x AS (
         |  SELECT m.is_dup,
         |         CAST(least(floor(q.quality * 10), 9.0) AS BIGINT)
         |           AS q_band,
         |         q.n_chars
         |  FROM quals q JOIN m ON m.doc_id = q.doc_id)
         |SELECT is_dup, q_band, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // All candidate pairs exact-rescored, stratified by band count —
    // precision per stratum from the same candSql chain the recall
    // oracle replays.
    "q_lsh_precision" ->
      s"""WITH $candSql,
         |ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY 1),
         |com AS (
         |  SELECT c.d1, c.d2, count(*) AS common
         |  FROM cand c
         |  JOIN ds a  ON a.doc_id = c.d1
         |  JOIN ds b2 ON b2.doc_id = c.d2 AND b2.shingle = a.shingle
         |  GROUP BY 1, 2),
         |jac AS (
         |  SELECT c.bands,
         |         ${r4("CAST(coalesce(com.common, 0) AS DOUBLE) / " +
              "CAST(s1.n_sh + s2.n_sh - coalesce(com.common, 0) AS DOUBLE)")}
         |           AS jaccard
         |  FROM cand c
         |  JOIN sizes s1 ON s1.doc_id = c.d1
         |  JOIN sizes s2 ON s2.doc_id = c.d2
         |  LEFT JOIN com ON com.d1 = c.d1 AND com.d2 = c.d2)
         |SELECT bands, count(*) AS n_cand,
         |       CAST(sum(CASE WHEN jaccard >= $LshRecallThresh THEN 1
         |                     ELSE 0 END) AS BIGINT) AS n_true,
         |       ${r4("CAST(sum(CASE WHEN jaccard >= " + LshRecallThresh +
              " THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS precision
         |FROM jac GROUP BY 1 ORDER BY bands""".stripMargin,

    "q_vocab_growth" ->
      s"""WITH ${Dedup.shinglesSql},
         |fs AS (
         |  SELECT shingle, min(doc_id) AS first_doc
         |  FROM (SELECT DISTINCT doc_id, shingle FROM shingles)
         |  GROUP BY 1),
         |b AS (
         |  SELECT first_doc // 50 AS bucket, count(*) AS new_types
         |  FROM fs GROUP BY 1)
         |SELECT bucket, new_types,
         |       CAST(sum(new_types) OVER (ORDER BY bucket
         |                                 ROWS BETWEEN UNBOUNDED PRECEDING
         |                                 AND CURRENT ROW) AS BIGINT)
         |         AS cum_types
         |FROM b ORDER BY bucket""".stripMargin,

    "q_dedup_consensus" ->
      s"""WITH $dupSigSql,
         |$candSql,
         |ex AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM nsig a JOIN nsig b
         |    ON a.sig = b.sig AND a.doc_id < b.doc_id),
         |mh AS (SELECT d1, d2 FROM cand WHERE bands >= 2)
         |SELECT coalesce(e.d1, m.d1) AS d1, coalesce(e.d2, m.d2) AS d2,
         |       CAST(CASE WHEN e.d1 IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |         AS m_exact,
         |       CAST(CASE WHEN m.d1 IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |         AS m_minhash,
         |       CAST((CASE WHEN e.d1 IS NULL THEN 0 ELSE 1 END) +
         |            (CASE WHEN m.d1 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |         AS n_methods
         |FROM ex e FULL OUTER JOIN mh m ON m.d1 = e.d1 AND m.d2 = e.d2
         |ORDER BY d1, d2""".stripMargin,

    "q_boilerplate_ngrams" ->
      s"""WITH ${Dedup.shinglesSql},
         |ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
         |dfs AS (SELECT shingle, count(*) AS df FROM ds GROUP BY 1)
         |SELECT shingle, df,
         |       CAST(CASE WHEN df > $LeakDfCap THEN 1 ELSE 0 END AS BIGINT)
         |         AS over_cap
         |FROM dfs ORDER BY df DESC, shingle LIMIT 20""".stripMargin,

    "q_feature_hashing" -> {
      val b = PortableHash.spreadSql(PortableHash.hSql("token"))
      val cells = (0 until 16).map(i =>
        s"CAST(count(*) FILTER (($b) % 16 = $i) AS BIGINT) AS f$i")
          .mkString(",\n       ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents)
         |SELECT doc_id,
         |       $cells
         |FROM toks GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // The direct full-table summary — equality with the engine's
    // base+delta merge IS the MV-maintenance invariant.
    "q_mv_merge" ->
      s"""SELECT source, lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(${PortableHash.spreadSql(
                  PortableHash.hSql("text"))}) AS BIGINT) AS text_hash_sum
         |FROM documents
         |GROUP BY 1, 2 ORDER BY source, lang""".stripMargin,

    // Direct recompute over the post-change corpus (survivors + the
    // derived inserts) — equality with the engine's signed-partial
    // merge IS the retraction invariant.
    "q_mv_retract" ->
      s"""WITH v2 AS (
         |  SELECT source, lang, text, n_chars FROM documents
         |  WHERE doc_id % 13 <> 2
         |  UNION ALL
         |  SELECT source, lang, text || ' [ins]' AS text,
         |         CAST(length(text || ' [ins]') AS BIGINT) AS n_chars
         |  FROM documents WHERE doc_id % 10 = 7)
         |SELECT source, lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(${PortableHash.spreadSql(
                  PortableHash.hSql("text"))}) AS BIGINT) AS text_hash_sum
         |FROM v2
         |GROUP BY 1, 2 HAVING count(*) > 0
         |ORDER BY source, lang""".stripMargin,

    "q_table_diff" ->
      """WITH v1 AS (SELECT doc_id, source, text FROM documents),
        |v2 AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 17 = 3 THEN text || ' [rev2]'
        |              ELSE text END AS text
        |  FROM v1 WHERE doc_id % 31 != 5
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, text FROM v1
        |  WHERE doc_id % 23 = 7),
        |j AS (
        |  SELECT coalesce(a.source, b.source) AS source,
        |         CASE WHEN a.doc_id IS NULL THEN 'added'
        |              WHEN b.doc_id IS NULL THEN 'removed'
        |              WHEN a.text != b.text THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT source, status, count(*) AS n
        |FROM j GROUP BY 1, 2 ORDER BY source, status""".stripMargin,

    "q_graph_degrees" ->
      s"""WITH $candSql,
         |ends AS (
         |  SELECT d1 AS doc_id FROM cand
         |  UNION ALL SELECT d2 FROM cand),
         |deg AS (SELECT doc_id, count(*) AS degree FROM ends GROUP BY 1)
         |SELECT degree, count(*) AS n_docs, min(doc_id) AS min_doc,
         |       max(doc_id) AS max_doc
         |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin,

    // Sparse cosine: the same DF-capped postings self-join; integer
    // numerator/norms, one r4 division at the end.
    "q_doc_similarity" -> Oracle.mat(
      s"""WITH ${Dedup.shinglesSql},
         |posts AS (
         |  SELECT doc_id, shingle AS w, count(*) AS tf
         |  FROM shingles GROUP BY 1, 2),
         |dfok AS (
         |  SELECT w FROM posts GROUP BY 1 HAVING count(*) <= 30),
         |capped AS (
         |  SELECT p.doc_id, p.w, p.tf FROM posts p
         |  JOIN dfok f ON p.w = f.w),
         |norms AS (
         |  SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS nsq
         |  FROM capped GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2,
         |         CAST(sum(a.tf*b.tf) AS BIGINT) AS num,
         |         count(*) AS n_shared
         |  FROM capped a JOIN capped b
         |    ON a.w = b.w AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT p.d1, p.d2, p.num, p.n_shared,
         |       ${r4("CAST(p.num AS DOUBLE) / " +
              "(sqrt(CAST(x.nsq AS DOUBLE)) * sqrt(CAST(y.nsq AS DOUBLE)))")}
         |         AS cos_sim
         |FROM pairs p
         |JOIN norms x ON x.doc_id = p.d1
         |JOIN norms y ON y.doc_id = p.d2
         |ORDER BY cos_sim DESC, p.d1, p.d2""".stripMargin),

    // Link prediction: the same capped wedge join + anti join,
    // materialized (sym/viamid feed multiple references).
    "q_link_prediction" -> Oracle.mat(
      s"""WITH $candSql,
         |e AS (SELECT d1, d2 FROM cand),
         |sym AS (
         |  SELECT d1 AS src, d2 AS dst FROM e
         |  UNION ALL SELECT d2 AS src, d1 AS dst FROM e),
         |deg AS (SELECT src, count(*) AS dg FROM sym GROUP BY 1),
         |hubok AS (SELECT src AS mid FROM deg WHERE dg <= 50),
         |viamid AS (
         |  SELECT s.src, s.dst AS mid FROM sym s
         |  JOIN hubok h ON s.dst = h.mid),
         |wedges AS (
         |  SELECT a.src AS d1, b.src AS d2, count(*) AS common
         |  FROM viamid a JOIN viamid b
         |    ON a.mid = b.mid AND a.src < b.src
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT w.d1, w.d2, w.common FROM wedges w
         |LEFT JOIN e ON e.d1 = w.d1 AND e.d2 = w.d2
         |WHERE e.d1 IS NULL
         |ORDER BY w.common DESC, w.d1, w.d2""".stripMargin),

    // 2-core: the same four peel rounds replayed as CTE levels. Every
    // round-level CTE is MATERIALIZED — each is referenced three
    // times by the next level, and DuckDB's default CTE inlining
    // would otherwise expand the replay tree exponentially in rounds
    // (3⁴ copies of the candidate build; the un-hinted form exhausts
    // file handles before it exhausts patience).
    // LPA replay: every synchronous round's vote table (neighbor
    // labels + self-vote), majority with (count DESC, label ASC)
    // tie-break, under mat() — each round reads its predecessor
    // twice.
    "q_graph_communities" -> Oracle.mat({
      def round(r: Int): String =
        s"""lp$r AS (
           |  SELECT v, lbl FROM (
           |    SELECT v, lbl,
           |           row_number() OVER (PARTITION BY v
           |                  ORDER BY c DESC, lbl) AS rn
           |    FROM (
           |      SELECT v, lbl, count(*) AS c FROM (
           |        SELECT s.v, l.lbl
           |        FROM lsym s JOIN lp${r - 1} l ON l.v = s.n
           |        UNION ALL
           |        SELECT v, lbl FROM lp${r - 1})
           |      GROUP BY 1, 2))
           |  WHERE rn = 1)""".stripMargin
      s"""WITH $candSql,
         |lsym AS (SELECT d1 AS v, d2 AS n FROM cand
         |         UNION ALL
         |         SELECT d2 AS v, d1 AS n FROM cand),
         |lp0 AS (SELECT DISTINCT v, v AS lbl FROM lsym),
         |${(1 to 4).map(round).mkString(",\n")},
         |lsz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csz
         |        FROM lp4 GROUP BY 1)
         |SELECT l.v AS doc_id, l.lbl AS community, z.csz
         |FROM lp4 l JOIN lsz z USING (lbl)
         |ORDER BY doc_id""".stripMargin
    }),

    "q_graph_kcore" ->
      s"""WITH $candSql,
         |r0 AS MATERIALIZED (SELECT d1, d2 FROM cand),
         |g1 AS MATERIALIZED (SELECT v, count(*) AS c FROM (
         |  SELECT d1 AS v FROM r0 UNION ALL SELECT d2 FROM r0)
         |  GROUP BY 1),
         |k1 AS (SELECT v FROM g1 WHERE c >= 2),
         |r1 AS MATERIALIZED (SELECT r0.d1, r0.d2 FROM r0
         |  JOIN k1 a ON r0.d1 = a.v JOIN k1 b ON r0.d2 = b.v),
         |g2 AS MATERIALIZED (SELECT v, count(*) AS c FROM (
         |  SELECT d1 AS v FROM r1 UNION ALL SELECT d2 FROM r1)
         |  GROUP BY 1),
         |k2 AS (SELECT v FROM g2 WHERE c >= 2),
         |r2 AS MATERIALIZED (SELECT r1.d1, r1.d2 FROM r1
         |  JOIN k2 a ON r1.d1 = a.v JOIN k2 b ON r1.d2 = b.v),
         |g3 AS MATERIALIZED (SELECT v, count(*) AS c FROM (
         |  SELECT d1 AS v FROM r2 UNION ALL SELECT d2 FROM r2)
         |  GROUP BY 1),
         |k3 AS (SELECT v FROM g3 WHERE c >= 2),
         |r3 AS MATERIALIZED (SELECT r2.d1, r2.d2 FROM r2
         |  JOIN k3 a ON r2.d1 = a.v JOIN k3 b ON r2.d2 = b.v),
         |g4 AS MATERIALIZED (SELECT v, count(*) AS c FROM (
         |  SELECT d1 AS v FROM r3 UNION ALL SELECT d2 FROM r3)
         |  GROUP BY 1),
         |k4 AS (SELECT v FROM g4 WHERE c >= 2),
         |r4 AS MATERIALIZED (SELECT r3.d1, r3.d2 FROM r3
         |  JOIN k4 a ON r3.d1 = a.v JOIN k4 b ON r3.d2 = b.v)
         |SELECT doc_id, count(*) AS degree FROM (
         |  SELECT d1 AS doc_id FROM r4 UNION ALL SELECT d2 FROM r4)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // The parquet-side summary: if the engine's ORC write→read path
    // preserved every row and byte, the two sides agree.
    "q_orc_roundtrip" ->
      s"""SELECT lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |       CAST(sum(${PortableHash.spreadSql(
                  PortableHash.hSql("text"))}) AS BIGINT) AS text_hash_sum
         |FROM documents
         |GROUP BY 1 ORDER BY lang""".stripMargin
  )

  /** One frontier leg: a recall twin's FULL oracle text as a derived
    * table (its own WITH scope, so the graph and HNSW legs' identical
    * core CTE names never collide), aggregated to one priced row. */
  private def frontierLeg(v: String, q: String): String =
    s"""SELECT '$v' AS variant,
       |       CAST(count(*) AS BIGINT) AS n_queries,
       |       CAST(sum(n_hits) AS BIGINT) AS n_hits,
       |       ${r4("CAST(sum(n_hits) AS DOUBLE) / (count(*) * 3.0)")}
       |         AS recall_at_3
       |FROM (
       |${oraclesBase(q)}
       |) AS leg_$v""".stripMargin

  val oracles: Map[String, String] = oraclesBase +
    ("q_ann_frontier" ->
      (FrontierVariants.map { case (v, q) => frontierLeg(v, q) }
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY variant")))
}
