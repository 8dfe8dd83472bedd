package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, PortableHash}
import graft.io.Sources
import graft.rel.Oracle
import graft.rel.Oracle.r4
import ExtQueries._

/** Oracle CTE builders + the base oracle map for [[ExtQueries]] —
  * round-13 split along the engine/oracle seam (no behavior change:
  * every SQL text is byte-identical; SparkEntry still reads
  * ExtQueries.oracles, which delegates here). Engine-side constants
  * (caps, taus, panel sizes) remain on ExtQueries as `private[ext]`
  * and are imported wholesale, so an engine/oracle constant can never
  * drift. The nine Sql*Sql ANSI surface texts stay on ExtQueries
  * because the engine EXECUTES the same strings.
  */
object ExtOracles {

  // ---------------------------------------------------------------
  // Oracle SQL twins.
  // ---------------------------------------------------------------

  private[ext] val dupSigSql =
    s"nsig AS (SELECT doc_id, sha256($normSqlExpr) AS sig FROM documents)"


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
       |   AND usok.sub_id = a.sub_id),
       |${graft.ext.VectorSearch.cellCapStatsSql(s"assign$iters", cap, r4)}
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
       |       CAST(COALESCE(r.rescued, 0) AS BIGINT) AS rescued,
       |       cs.cap_used, cs.cap_saturated, cs.capped_frac,
       |       cs.hot_cells
       |FROM assign$iters a
       |LEFT JOIN prior p USING (vec_id)
       |LEFT JOIN okc ON okc.cell_id = a.cell_id
       |LEFT JOIN uresc r ON r.vec_id = a.vec_id
       |CROSS JOIN cellstats cs
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

    // per-bucket hot list at the rescue cap (the population
    // q_minhash_rescue re-bands); heads shared with the candidate
    // chain
    "q_lsh_hot_buckets" ->
      s"""WITH ${Dedup.shinglesSql},
         |${Dedup.minhashBandMinsSql}
         |SELECT b, mh, CAST(count(*) AS BIGINT) AS sz
         |FROM bandmins GROUP BY 1, 2
         |HAVING count(*) > ${RescueCap}
         |ORDER BY b, mh""".stripMargin,

    "q_minhash_near_dup" ->
      s"""WITH $candSql,
         |${Dedup.bucketCapStatsSql("bandmins", Dedup.MinhashBucketCap,
             r4)}
         |SELECT d1, d2, bands, cap_used, cap_saturated, capped_frac,
         |       hot_buckets
         |FROM cand, bucketstats ORDER BY d1, d2""".stripMargin,

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

    // rescue candidates + the RESCUE bands' own cap read-out (the
    // bucketCapStats discipline over rbandmins at the rescue cap)
    "q_minhash_rescue" -> Oracle.mat(
      s"""WITH $rescueCandSql,
         |${Dedup.bucketCapStatsSql("rbandmins", RescueCap, r4)}
         |SELECT d1, d2, bands, cap_used, cap_saturated, capped_frac,
         |       hot_buckets
         |FROM rcand, bucketstats ORDER BY d1, d2""".stripMargin),

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

    // per-block hot list at the production cap (the population
    // q_simhash_rescue re-blocks); heads shared with the pair chain
    "q_simhash_hot_blocks" ->
      s"""WITH $simhashPairCtes
         |SELECT CAST(blk AS BIGINT) AS blk, CAST(bv AS BIGINT) AS bv,
         |       CAST(count(*) AS BIGINT) AS sz
         |FROM blocks GROUP BY 1, 2
         |HAVING count(*) > ${Dedup.SimhashBlockCap}
         |ORDER BY blk, bv""".stripMargin,

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
}
