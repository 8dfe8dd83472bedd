package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources

/** Entity resolution (record linkage) over multi-source customer
  * records — the blocking → pairwise-match → connected-components →
  * survivorship pipeline of the classic ER literature (Fellegi–Sunter
  * 1969 scoring shape; Papadakis et al. 2020's multi-pass blocking),
  * built Spark-first:
  *
  *   - BLOCKING is two hash-partitionable groupBys (no all-pairs
  *     anywhere): a fine pass on (nation, numval div 10) and a coarse
  *     pass on (segment, numval div 100). Multi-pass blocking is the
  *     standard recall rescue — a pair missed by one key can be
  *     caught by the other — and the UNION of passes is deduplicated
  *     BEFORE the expensive comparator runs.
  *   - Block sizes are CAPPED (>[[BlockCap]] dropped whole), the
  *     minhash-LSH discipline applied to ER: a hot block is quadratic
  *     poison, and the coarse pass's width-100 value window keeps
  *     expected block size CONSTANT as the corpus grows — more
  *     blocks, not bigger blocks, so the candidate set scales
  *     linearly at 100 TB.
  *   - MATCHING is a codegen'd comparator over the capped candidate
  *     pairs only: exact agreement on (nation, segment) plus
  *     levenshtein ≤ 1 on the normalized name — never on the raw
  *     corpus.
  *   - CLUSTERING reuses [[Dedup.connectedComponents]] (contraction-
  *     first min-label CC, checkpointed) — identity transitivity is
  *     the same fixpoint the dedup family already scales.
  *   - EVALUATION ([[qualityRow]]) computes pairwise precision/recall
  *     vs the held-out true key from GROUP SIZES ONLY — Σ C(n,2)
  *     arithmetic per cluster / per truth key / per (cluster, truth)
  *     cell — so the quality readout never materializes a pair list
  *     even when clusters are large.
  *
  * The dirty corpus is derived deterministically from `customer` so
  * the DuckDB oracle replays it exactly: every customer appears as a
  * clean registry row; every third also as a CRM row whose name
  * carries an off-by-one numeric typo (digit-string edit distance 1
  * within a decade, 2 across one — so decade-crossing typos are
  * UNMATCHABLE at the ≤1 threshold: a measured recall miss, not a
  * bug); every fifth also as a billing row with format noise only
  * (prefix + zero-stripping — normalization must recover it).
  */
object EntityResolution {
  val BlockCap = 64

  /** The three-source dirty record view. rec_id = custkey·4 + source
    * tag keeps ids disjoint and min-rec_id survivorship = "registry
    * wins". true_key is ground truth for [[qualityRow]] ONLY — the
    * matcher never reads it. */
  def records(s: SparkSession, d: String): DataFrame = {
    val c = Sources.table(s, d, "customer").select(
      col("c_custkey"), col("c_name"),
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("seg"))
    val reg = c.select((col("c_custkey") * 4).as("rec_id"),
      lit("reg").as("src"), col("c_name").as("name_raw"),
      col("nation"), col("seg"), col("c_custkey").as("true_key"))
    val crm = c.where(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") * 4 + 1).as("rec_id"),
        lit("crm").as("src"),
        concat(lit("CUST-"),
          lpad((col("c_custkey") + 1).cast("string"), 9, "0"))
          .as("name_raw"),
        col("nation"), col("seg"), col("c_custkey").as("true_key"))
    val stripped = regexp_replace(expr("substr(c_name, 10)"), "^0+", "")
    val bill = c.where(col("c_custkey") % 5 === 0)
      .select((col("c_custkey") * 4 + 2).as("rec_id"),
        lit("bill").as("src"),
        concat(lit("acct "),
          when(stripped === "", lit("0")).otherwise(stripped))
          .as("name_raw"),
        col("nation"), col("seg"), col("c_custkey").as("true_key"))
    reg.unionByName(crm).unionByName(bill)
  }

  /** Name normalization: digits extracted, leading zeros stripped
    * (empty → "0"), plus the numeric value for blocking. Pure
    * codegen'd Column regex — scan-parallel. */
  def normalized(recs: DataFrame): DataFrame = {
    val digits = regexp_replace(col("name_raw"), "[^0-9]", "")
    val stripped = regexp_replace(digits, "^0+", "")
    recs
      .withColumn("mnorm",
        when(stripped === "", lit("0")).otherwise(stripped))
      .withColumn("numval", col("mnorm").cast("long"))
  }

  /** Candidate pairs from the capped union of both blocking passes.
    * Each pass is (key, rec_id); sizes are a partial/final count; the
    * within-block self-join is bounded by BlockCap² per block, and
    * the distinct collapses pairs found by both passes before the
    * comparator runs. */
  def candidatePairs(norm: DataFrame): DataFrame = {
    val p1 = norm.select(
      concat_ws(":", lit("n"), col("nation"), expr("numval div 10"))
        .as("bk"), col("rec_id"))
    val p2 = norm.select(
      concat_ws(":", lit("s"), col("seg"), expr("numval div 100"))
        .as("bk"), col("rec_id"))
    val passes = p1.unionByName(p2)
    val keep = passes.groupBy(col("bk"))
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= BlockCap)
      .select(col("bk"))
    val kp = passes.join(keep, Seq("bk"))
    kp.as("a").join(kp.as("b"),
        col("a.bk") === col("b.bk") &&
          col("a.rec_id") < col("b.rec_id"))
      .select(col("a.rec_id").as("r1"), col("b.rec_id").as("r2"))
      .distinct()
  }

  /** Match edges: candidates where (nation, segment) agree exactly
    * and the normalized names are within edit distance 1. */
  def matchEdges(norm: DataFrame, cands: DataFrame): DataFrame = {
    val a = norm.select(col("rec_id").as("r1"), col("nation").as("n1"),
      col("seg").as("s1"), col("mnorm").as("m1"))
    val b = norm.select(col("rec_id").as("r2"), col("nation").as("n2"),
      col("seg").as("s2"), col("mnorm").as("m2"))
    cands.join(a, Seq("r1")).join(b, Seq("r2"))
      .where(col("n1") === col("n2") && col("s1") === col("s2") &&
        levenshtein(col("m1"), col("m2")) <= 1)
      .select(col("r1").as("d1"), col("r2").as("d2"))
  }

  /** Full per-record resolution: every dirty record with its cluster
    * id (min rec_id reachable through match edges) and its attributes
    * — the frame both ER queries aggregate, snapshot-cached by the
    * caller. */
  def resolved(s: SparkSession, d: String): DataFrame = {
    val norm = normalized(records(s, d))
    val cl = Dedup.connectedComponents(
      norm.select(col("rec_id").as("doc_id")),
      matchEdges(norm, candidatePairs(norm)))
    norm.join(
      cl.select(col("doc_id").as("rec_id"), col("cluster_id")),
      Seq("rec_id"))
  }

  /** Per-cluster survivorship audit: member counts by source, how
    * many TRUE entities the cluster spans (1 = pure, >1 = a false
    * merge), and the canonical record's name (min rec_id = registry
    * wins when present). One partial/final agg over the resolved
    * frame — output is cluster-sized, never record-sized. */
  def clusterAudit(resolved: DataFrame): DataFrame =
    resolved.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_records"),
        sum(when(col("src") === "reg", 1L).otherwise(0L)).as("n_reg"),
        sum(when(col("src") === "crm", 1L).otherwise(0L)).as("n_crm"),
        sum(when(col("src") === "bill", 1L).otherwise(0L)).as("n_bill"),
        countDistinct(col("true_key")).as("n_true_keys"),
        min(struct(col("rec_id"), col("name_raw")))
          .getField("name_raw").as("canonical_name"))
      .withColumn("merged",
        (col("n_true_keys") > 1L).cast("long"))
      .orderBy(col("cluster_id"))

  /** Pairwise precision/recall vs the held-out truth, from group
    * sizes only: predicted pairs = Σ C(cluster size, 2), truth pairs
    * = Σ C(per-true-key count, 2), true positives = Σ C((cluster,
    * true_key) cell count, 2). Three partial/final aggs and integer
    * fixed-point ratios — no pair list is ever built, which is what
    * makes the quality readout itself runnable at corpus scale. */
  def qualityRow(resolved: DataFrame): DataFrame = {
    val cs = resolved.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(expr("sz * (sz - 1) div 2")).as("pred_pairs"))
    val tk = resolved.groupBy(col("true_key"))
      .agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("true_pairs"))
    val ct = resolved.groupBy(col("cluster_id"), col("true_key"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("tp_pairs"))
    val n = resolved.agg(count(lit(1)).as("n_records"))
    n.crossJoin(cs).crossJoin(tk).crossJoin(ct)
      .select(col("n_records"), col("n_clusters"), col("pred_pairs"),
        col("true_pairs"), col("tp_pairs"),
        expr("tp_pairs * 10000 div pred_pairs").as("precision_x10000"),
        expr("tp_pairs * 10000 div true_pairs").as("recall_x10000"))
  }
}
