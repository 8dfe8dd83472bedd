package graft

import graft.ext.GraphRank

/** Integer PageRank: hand-computed goldens on a path graph plus the
  * isolated-node and determinism properties the oracle relies on. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("3-round fixed-point PageRank matches hand-computed goldens") {
    // path 1–2–3, node 4 isolated; Scale 1e9, damping 17/20:
    //   r1: A/C = .15e9 + (.5e9*17)div20 = 575000000, B = 1850000000
    //   r2: A/C = 936250000,  B = 1127500000
    //   r3: A/C = 629187500,  B = 1741625000;  isolated stays at Base
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val out = GraphRank.pageRank(nodes, edges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 629187500L),
      (2L, 2L, 1741625000L),
      (3L, 1L, 629187500L),
      (4L, 0L, GraphRank.Base)))
  }

  test("triangleCounts: two shared-edge triangles + a pendant, exactly once") {
    // triangles (1,2,3) and (2,3,5) share edge 2–3; node 4 is pendant
    // off 3 and closes nothing → absent from the output
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 5L), (2L, 5L),
      (3L, 4L)).toDF("d1", "d2")
    val out = GraphRank.triangleCounts(edges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 2L), (5L, 1L)))
  }

  test("triangleCounts: K4 counts each of the 4 triangles exactly once") {
    // degree-ordered orientation must not over- or under-count inside
    // a clique where all degrees tie (order falls back to doc_id)
    val vs = Seq(10L, 11L, 12L, 13L)
    val edges = (for { a <- vs; b <- vs if a < b } yield (a, b))
      .toDF("d1", "d2")
    val out = GraphRank.triangleCounts(edges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == vs.map(v => (v, 3L)))
  }

  /** Contracted-path harness: twin map + guard + quotient formula,
    * compared against plain enumeration on the same edge set. */
  private def contractedCounts(edges: org.apache.spark.sql.DataFrame) = {
    val vmap = GraphRank.twinClasses(edges)
    assert(GraphRank.contractionViolations(edges, vmap) == 0L)
    GraphRank.triangleCountsContracted(vmap,
      GraphRank.quotientEdges(edges, vmap), (_, f) => f)
  }

  private def asPairs(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("twin contraction: clique families reproduce plain enumeration") {
    // two disjoint replica families (5-clique {1..5}, 3-clique
    // {10,11,12}) — each a true twin class — plus a hub vertex 20
    // adjacent to ALL members of both families (cross-supernode
    // wedges must close through it), and a pendant 30–20 that closes
    // nothing.
    val fam1 = Seq(1L, 2L, 3L, 4L, 5L)
    val fam2 = Seq(10L, 11L, 12L)
    val intra = (for { a <- fam1; b <- fam1 if a < b } yield (a, b)) ++
      (for { a <- fam2; b <- fam2 if a < b } yield (a, b))
    val hub = (fam1 ++ fam2).map(v => (v, 20L))
    val edges = (intra ++ hub :+ (20L, 30L)).toDF("d1", "d2")
    assert(asPairs(contractedCounts(edges)) ==
      asPairs(GraphRank.triangleCounts(edges)))
    // the quotient graph really contracted: 3 supernodes + hub + pendant
    assert(GraphRank.twinClasses(edges)
      .select("gid").distinct().count() == 4L)
  }

  test("twin contraction: twin-free graph degrades to enumeration") {
    // the shared-edge triangle graph from above has no twins at all —
    // every class is a singleton and the formula reduces to the plain
    // quotient enumeration
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 5L), (2L, 5L),
      (3L, 4L)).toDF("d1", "d2")
    assert(asPairs(contractedCounts(edges)) ==
      Seq((1L, 1L), (2L, 2L), (3L, 2L), (5L, 1L)))
  }

  test("twin contraction: guard counts broken-clique merges") {
    // two vertices with equal closed-neighborhood fingerprints CANNOT
    // be produced without a hash collision, so exercise the guard
    // directly: hand it a vmap that wrongly merges 1 and 4 (not
    // adjacent, different neighborhoods) and expect violations.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
    val badVmap = Seq((1L, 1L, 2L), (4L, 1L, 2L), (2L, 2L, 1L),
      (3L, 3L, 1L)).toDF("v", "gid", "k")
    assert(GraphRank.contractionViolations(edges, badVmap) > 0L)
  }

  test("rank is partitioning-independent (all-integer arithmetic)") {
    val nodes = (0L until 40L).toDF("doc_id")
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("d1", "d2")
    val a = GraphRank.pageRank(nodes.repartition(1), edges.repartition(1))
      .orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    val b = GraphRank.pageRank(nodes.repartition(7), edges.repartition(5))
      .orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    assert(a == b)
  }
}
