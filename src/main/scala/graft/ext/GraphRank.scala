package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank over a document graph — the
  * centrality pass a dedup pipeline runs to pick CANONICAL documents:
  * within a near-dup cluster, the member most connected to the rest
  * is the best keeper (min-doc_id keepers are arbitrary; centrality
  * keepers are the hub the cluster duplicates).
  *
  * Everything is 64-bit integer arithmetic on purpose:
  *  - rank mass in [[Scale]] units (1e9 per unit);
  *  - damping 0.85 as the rational 17/20 — `x*17 div 20`;
  *  - neighbor contributions as `pr div deg` truncating division.
  * Truncating integer division is deterministic and means the whole
  * iteration is bit-for-bit replayable in ANSI SQL (`//` on positive
  * BIGINTs in DuckDB == `div` in Spark), so a FIXED number of rounds
  * has an exact chained-CTE oracle — same trick as the k-means
  * round-by-round replay, without the fixed-point snapping, because
  * no doubles ever appear.
  *
  * Scale shape: each round is one shuffle join (contributions keyed
  * by source node) plus one aggregation (sum by destination) — the
  * standard distributed PageRank; rounds are fixed (no convergence
  * job), and every iterate is materialized through
  * [[Dedup.IterMaterializer]], so lineage stays flat and the reliable
  * checkpoint path (spark.graft.checkpoint.dir) applies unchanged.
  * Overflow envelope: total mass = n·[[Scale]]; a hub's rank is
  * bounded by total mass, so Long holds to ~9e9 documents at this
  * Scale — past that, lower Scale or move to DECIMAL like the
  * pairMomentsDec twin.
  */
object GraphRank {
  /** Fixed-point units per unit of rank mass. */
  val Scale = 1000000000L
  /** Damping 0.85 as an exact rational. */
  val DampNum = 17L
  val DampDen = 20L
  /** (1 − d)·Scale — the teleport floor every node keeps. */
  val Base: Long = Scale - Scale * DampNum / DampDen
  val Rounds = 3

  /** `rounds` synchronous PageRank iterations over the undirected
    * graph `edges(d1, d2)` (pairs, each stored once; symmetrized
    * here). Returns (doc_id, deg, pr) — isolated nodes keep deg 0 and
    * settle at [[Base]] after the first round. */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               rounds: Int = Rounds): DataFrame = {
    val spark = nodes.sparkSession
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(edges.select(col("d2").as("src"), col("d1").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val mat = new Dedup.IterMaterializer("pagerank", spark)
    // Symmetrized edges + degrees are read once per round: material-
    // ize them up front instead of re-deriving from the pair table.
    val symM = mat(sym)
    val degM = mat(deg)
    var pr = nodes.select(col("doc_id"), lit(Scale).as("pr"))
    for (_ <- 1 to rounds) {
      val contrib = symM
        .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
        .join(degM, Seq("src"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("acc"))
      pr = mat(nodes
        .join(contrib.withColumnRenamed("dst", "doc_id"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(Base) + expr(
            s"coalesce(acc, 0L) * $DampNum div $DampDen")).as("pr")))
    }
    pr.join(degM.withColumnRenamed("src", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("deg"), lit(0L)).as("deg"),
        col("pr"))
  }

  /** Per-document triangle participation counts over the undirected
    * pair graph `edges(d1, d2)` (each pair once, d1 < d2) — the
    * clustering-coefficient ingredient a dedup-graph audit reads:
    * near-dup edges that close triangles are corroborated by two
    * other detections, while triangle-free edges are the likely LSH
    * false positives.
    *
    * Algorithm: degree-ordered orientation. Every edge is directed
    * from its endpoint that is LOWER in the (degree, doc_id) total
    * order; a triangle then has exactly one vertex with out-edges to
    * the other two, so the wedge join u→v, v→w closed by u→w counts
    * each triangle exactly once — no ×6 overcount, no distinct. The
    * orientation is the scale guarantee: out-degrees are bounded by
    * O(√m) on any graph (arboricity bound), so the wedge join's
    * fan-out is capped even when a near-dup clique makes raw degrees
    * huge — the standard distributed triangle algorithm (Suri &
    * Vassilvitskii's MR "last reducer" fix). Both joins shuffle on
    * vertex keys; nothing is ever all-pairs.
    *
    * Ties in the order resolve to the lower doc_id; since `edges`
    * stores d1 < d2, `deg(d1) <= deg(d2)` orients d1→d2 exactly when
    * the lexicographic (deg, id) order does — the oracle spells the
    * same CASE. */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangleCountsOriented(orientEdges(edges), identity)

  /** Degree-ordered orientation of `edges(d1, d2)` (d1 < d2): each
    * edge directed from the endpoint lower in the (degree, doc_id)
    * total order — emitted as (u, w). Callers that count triangles
    * over a session-shared graph should materialize this frame once
    * ([[triangleCountsOriented]] reads it three times, and exchange
    * reuse does not fire above cached inputs — PLANS.md round 5). */
  def orientEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(col("d1"), col("d2"))
    val deg = e.select(col("d1").as("v"))
      .unionByName(e.select(col("d2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("dg"))
    e.join(deg.select(col("v").as("d1"), col("dg").as("dg1")), Seq("d1"))
      .join(deg.select(col("v").as("d2"), col("dg").as("dg2")), Seq("d2"))
      .select(
        when(col("dg1") <= col("dg2"), col("d1")).otherwise(col("d2")).as("u"),
        when(col("dg1") <= col("dg2"), col("d2")).otherwise(col("d1")).as("w"))
  }

  /** Triangle participation from pre-oriented edges. `gate` wraps the
    * two BUILD sides of the wedge and closure joins — pass a conf-
    * gated broadcast ([[graft.core.Broadcasts.gatedMemo]]) so the
    * m-row oriented list broadcasts while it fits (the wedge stream
    * then flows with ZERO exchanges into the closure probe) and falls
    * back to shuffle joins past the gate; the wedge volume itself
    * (O(m^1.5) worst case) is partial-aggregated before the final
    * per-doc shuffle either way. */
  def triangleCountsOriented(fwd: DataFrame,
                             gate: DataFrame => DataFrame): DataFrame = {
    val wedge = fwd.select(col("u").as("a"), col("w").as("b"))
      .join(gate(fwd.select(col("u").as("b"), col("w").as("c"))), Seq("b"))
    val tri = wedge
      .join(gate(fwd.select(col("u").as("a"), col("w").as("c"))),
        Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
  }

  // ---------------------------------------------------------------
  // Twin contraction — the 100 TB guard for triangle counting.
  //
  // Near-dup clusters are cliques, and triangle OUTPUT grows
  // cubically in clique size: a replica family of k exact/near-exact
  // copies contributes C(k,3) triangle rows even though they carry
  // zero information beyond "k mutual duplicates". The scale-safe
  // plan contracts TRUE-TWIN classes — vertices with identical
  // closed neighborhoods N(v)∪{v} — to weighted supernodes first:
  // a k-clique of twins becomes ONE node with multiplicity k, its
  // intra-clique triangles become arithmetic (C(k−1,2) per member),
  // and the wedge join runs on the (much smaller) quotient graph.
  //
  // Twins are found by a deterministic power-sum fingerprint of the
  // closed neighborhood (size + Σm, Σm² mod P, Σm³ mod P of
  // m = id mod P — order-free, so one aggregation, no sorted
  // adjacency arrays that would themselves be quadratic on a hot
  // clique). The fingerprint only GROUPS; correctness never rests on
  // it: [[contractionViolations]] verifies from the actual edge set
  // that every class is a clique and every adjacent class pair is
  // complete-bipartite. Under that (checked) structure the per-doc
  // formula below is an exact identity with plain enumeration —
  // which is why q_graph_triangles keeps its original
  // enumeration-shaped DuckDB oracle unchanged — and a fingerprint
  // collision degrades to the uncontracted path, never to a wrong
  // answer. An over-split fingerprint (true twins landing in
  // different classes) is always safe: subsets of a twin class still
  // satisfy both checked properties.
  // ---------------------------------------------------------------

  /** Fingerprint modulus (shared with [[graft.core.PortableHash]] —
    * small enough that m³ stays in a Long). */
  private val FpMod: Long = graft.core.PortableHash.M.toLong

  /** Twin-class map (v, gid, k) over the undirected edge set
    * `edges(d1, d2)`: gid = smallest member of v's fingerprint class,
    * k = class size. Only vertices with ≥1 edge appear (isolated
    * nodes have no triangles). One O(m) aggregation + one class-level
    * aggregation — no adjacency lists are ever materialized. */
  /** k-core peel (q_graph_kcore body), factored out so the spec can
    * plant graphs where ITERATION is load-bearing: a path graph's
    * 2-core is empty, but only repeated peeling discovers it — each
    * round's endpoint removal exposes the next endpoints, so a
    * one-round degree filter wrongly keeps the middle. Emits the
    * surviving vertices with their residual degree after `rounds`
    * synchronous peels at threshold `k`; every round ends in an eager
    * localCheckpoint (see the query's comment). */
  def kcoreSurvivors(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("d1"), col("d2"))
    for (_ <- 1 to rounds) {
      val deg = e.select(col("d1").as("v"))
        .unionAll(e.select(col("d2").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      val keep = deg.where(col("c") >= k).select(col("v"))
      e = e.join(keep.withColumnRenamed("v", "d1"), Seq("d1"))
        .join(keep.withColumnRenamed("v", "d2"), Seq("d2"))
        .localCheckpoint(true)
    }
    e.select(col("d1").as("doc_id"))
      .unionAll(e.select(col("d2").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
      .orderBy(col("doc_id"))
  }

  /** Synchronous label-propagation communities (Raghavan, Albert &
    * Kumara 2007), made deterministic: every vertex starts labeled
    * with its own id; each synchronous round every vertex adopts the
    * most frequent label among its neighbors PLUS its own current
    * label (the self-vote damps oscillation), ties to the SMALLEST
    * label. Emits (doc_id, community, csz) after `rounds` updates.
    * Per round: one label join on the edge key, one (v, label)
    * count, one argmax — all key-partitioned; every round ends in an
    * eager localCheckpoint (the kcore lineage lesson). Unlike
    * min-label CC, LPA respects DENSITY: two cliques joined by one
    * bridge edge keep distinct communities where CC merges them. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("d1"), col("d2"))
    val sym = e.select(col("d1").as("v"), col("d2").as("n"))
      .unionByName(e.select(col("d2").as("v"), col("d1").as("n")))
    var lab = sym.select(col("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    for (_ <- 1 to rounds) {
      val nbrVotes = sym
        .join(lab.select(col("v").as("n"), col("lbl")), Seq("n"))
        .select(col("v"), col("lbl"))
      val votes = nbrVotes.unionByName(lab)
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
      lab = votes
        .groupBy(col("v"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("lbl"))
        .localCheckpoint(true)
    }
    val sz = lab.groupBy(col("lbl")).agg(count(lit(1)).as("csz"))
    lab.join(sz, Seq("lbl"))
      .select(col("v").as("doc_id"), col("lbl").as("community"),
        col("csz"))
      .orderBy(col("doc_id"))
  }

  def twinClasses(edges: DataFrame): DataFrame = {
    val e = edges.select(col("d1"), col("d2"))
    val sym = e.select(col("d1").as("v"), col("d2").as("n"))
      .unionByName(e.select(col("d2").as("v"), col("d1").as("n")))
    // closed neighborhood: the self row makes adjacent twins (who
    // see each other but not themselves) fingerprint-equal.
    val closed = sym.unionByName(
      sym.select(col("v")).distinct().select(col("v"), col("v").as("n")))
    val fp = closed
      .withColumn("m", pmod(col("n").cast("long"), lit(FpMod)))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("csz"),
        sum(col("m")).as("s1"),
        sum(expr(s"m * m % $FpMod")).as("s2"),
        sum(expr(s"m * m % $FpMod * m % $FpMod")).as("s3"))
    val cls = fp.groupBy(col("csz"), col("s1"), col("s2"), col("s3"))
      .agg(min(col("v")).as("gid"), count(lit(1)).as("k"))
    fp.join(cls, Seq("csz", "s1", "s2", "s3"))
      .select(col("v"), col("gid"), col("k"))
  }

  /** Count of twin-class structure violations in the ACTUAL edge set:
    * classes of size k whose intra-class edge count ≠ C(k,2) (not a
    * clique), plus adjacent class pairs whose cross-edge count ≠
    * k₁·k₂ (not complete-bipartite). 0 ⇔ the contraction identity
    * holds exactly. One tagged pass over the edges. */
  def contractionViolations(edges: DataFrame, vmap: DataFrame): Long = {
    val tagged = edges
      .join(vmap.select(col("v").as("d1"), col("gid").as("g1"),
        col("k").as("k1")), Seq("d1"))
      .join(vmap.select(col("v").as("d2"), col("gid").as("g2"),
        col("k").as("k2")), Seq("d2"))
    val classes = vmap.select(col("gid"), col("k")).distinct()
    val intraCnt = tagged.where(col("g1") === col("g2"))
      .groupBy(col("g1").as("gid")).agg(count(lit(1)).as("cnt"))
    // classes with k>1 and NO intra edges are also violations — start
    // from the class list, not the observed-edge groups
    val intraViol = classes.where(col("k") > 1)
      .join(intraCnt, Seq("gid"), "left")
      .where(coalesce(col("cnt"), lit(0L)) =!= expr("k * (k - 1) div 2"))
    val interViol = tagged.where(col("g1") =!= col("g2"))
      .select(least(col("g1"), col("g2")).as("ga"),
        greatest(col("g1"), col("g2")).as("gb"),
        when(col("g1") < col("g2"), col("k1")).otherwise(col("k2")).as("ka"),
        when(col("g1") < col("g2"), col("k2")).otherwise(col("k1")).as("kb"))
      .groupBy(col("ga"), col("gb"), col("ka"), col("kb"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") =!= col("ka") * col("kb"))
    intraViol.count() + interViol.count()
  }

  /** Quotient edge list (d1, d2), d1 < d2, one row per adjacent
    * supernode pair. */
  def quotientEdges(edges: DataFrame, vmap: DataFrame): DataFrame =
    edges
      .join(vmap.select(col("v").as("d1"), col("gid").as("g1")), Seq("d1"))
      .join(vmap.select(col("v").as("d2"), col("gid").as("g2")), Seq("d2"))
      .where(col("g1") =!= col("g2"))
      .select(least(col("g1"), col("g2")).as("d1"),
        greatest(col("g1"), col("g2")).as("d2"))
      .distinct()

  /** Per-SUPERNODE triangle aggregates (gid, na, nb, tq) — the
    * expensive half of the contracted count (the quotient wedge
    * enumeration), one output row per supernode, so callers cache it
    * per session and the per-run work shrinks to [[perDocTriangles]]'
    * join + arithmetic. `gate(tag, df)` wraps each small build side
    * (oriented quotient list, class-size map) in a conf-gated
    * broadcast keyed by tag.
    *
    *   na(g) = Σ_{h∈N(g)} k_h      nb(g) = Σ_{h∈N(g)} C(k_h, 2)
    *   tq(g) = Σ_{quot tri (g,h₁,h₂)} k_h₁·k_h₂
    */
  def quotientTriangleAggs(vmap: DataFrame, qedges: DataFrame,
      gate: (String, DataFrame) => DataFrame): DataFrame = {
    val sizes = vmap.select(col("gid"), col("k")).distinct()
    val fwd = orientEdges(qedges)
    val wedge = fwd.select(col("u").as("a"), col("w").as("b"))
      .join(gate("fwd", fwd.select(col("u").as("b"), col("w").as("c"))),
        Seq("b"))
    val tri = wedge
      .join(gate("fwd", fwd.select(col("u").as("a"), col("w").as("c"))),
        Seq("a", "c"))
    val triK = tri
      .join(gate("sz", sizes.select(col("gid").as("a"), col("k").as("ka"))),
        Seq("a"))
      .join(gate("sz", sizes.select(col("gid").as("b"), col("k").as("kb"))),
        Seq("b"))
      .join(gate("sz", sizes.select(col("gid").as("c"), col("k").as("kc"))),
        Seq("c"))
    val quotTri = triK.select(explode(array(
        struct(col("a").as("gid"), (col("kb") * col("kc")).as("tw")),
        struct(col("b").as("gid"), (col("ka") * col("kc")).as("tw")),
        struct(col("c").as("gid"), (col("ka") * col("kb")).as("tw"))))
        .as("x"))
      .select(col("x.gid").as("gid"), col("x.tw").as("tw"))
      .groupBy(col("gid")).agg(sum(col("tw")).as("tq"))
    val symQ = qedges.select(col("d1").as("g"), col("d2").as("h"))
      .unionByName(qedges.select(col("d2").as("g"), col("d1").as("h")))
    val nbr = symQ
      .join(gate("sz", sizes.select(col("gid").as("h"), col("k").as("kh"))),
        Seq("h"))
      .groupBy(col("g").as("gid"))
      .agg(sum(col("kh")).as("na"),
        sum(expr("kh * (kh - 1) div 2")).as("nb"))
    nbr.join(quotTri, Seq("gid"), "outer")
      .select(col("gid"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("tq"), lit(0L)).as("tq"))
  }

  /** Per-document triangle counts from the supernode aggregates —
    * exact under the [[contractionViolations]]-checked structure. For
    * a member v of class g (size k) with quotient neighbors N(g):
    *
    *   n_tri(v) = C(k−1, 2)                      // both others in g
    *            + (k−1) · Σ_{h∈N(g)} k_h          // one in g, one out
    *            + Σ_{h∈N(g)} C(k_h, 2)            // two in one h
    *            + Σ_{(h₁,h₂) tri with g} k_h₁·k_h₂ // two different h
    */
  def perDocTriangles(vmap: DataFrame, aggs: DataFrame): DataFrame =
    vmap.join(aggs, Seq("gid"), "left")
      .select(col("v").as("doc_id"),
        (expr("(k - 1) * (k - 2) div 2")
          + (col("k") - 1) * coalesce(col("na"), lit(0L))
          + coalesce(col("nb"), lit(0L))
          + coalesce(col("tq"), lit(0L))).as("n_triangles"))
      .where(col("n_triangles") > 0)

  /** Contracted-path triangle counts in one call (tests; production
    * call sites cache [[quotientTriangleAggs]] per session). */
  def triangleCountsContracted(vmap: DataFrame, qedges: DataFrame,
      gate: (String, DataFrame) => DataFrame): DataFrame =
    perDocTriangles(vmap, quotientTriangleAggs(vmap, qedges, gate))

  /** SQL twin of [[triangleCounts]] as chained CTEs over
    * `edges(d1, d2)`; emits `tripart(doc_id, n_triangles)`. */
  val triangleCountsSql: String =
    """tdeg AS (
      |  SELECT v, count(*) AS dg FROM (
      |    SELECT d1 AS v FROM edges UNION ALL SELECT d2 AS v FROM edges)
      |  GROUP BY 1),
      |fwd AS (
      |  SELECT CASE WHEN g1.dg <= g2.dg THEN e.d1 ELSE e.d2 END AS u,
      |         CASE WHEN g1.dg <= g2.dg THEN e.d2 ELSE e.d1 END AS w
      |  FROM edges e
      |  JOIN tdeg g1 ON g1.v = e.d1
      |  JOIN tdeg g2 ON g2.v = e.d2),
      |tri AS (
      |  SELECT w1.u AS a, w1.w AS b, w2.w AS c
      |  FROM fwd w1
      |  JOIN fwd w2 ON w2.u = w1.w
      |  JOIN fwd w3 ON w3.u = w1.u AND w3.w = w2.w),
      |tripart AS (
      |  SELECT doc_id, count(*) AS n_triangles FROM (
      |    SELECT a AS doc_id FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY 1)""".stripMargin

  /** The chained-CTE SQL replay of [[pageRank]]: one CTE per round
    * over `sym(src, dst)` + `deg(src, deg)` + `nodes(doc_id)` CTEs the
    * caller provides. Emits `pr$rounds(doc_id, pr)`. */
  def pageRankSql(rounds: Int = Rounds): String = {
    val r0 = s"pr0 AS (SELECT doc_id, CAST($Scale AS BIGINT) AS pr FROM nodes)"
    val steps = (1 to rounds).map { i =>
      s"""pr$i AS (
         |  SELECT n.doc_id,
         |         CAST($Base + COALESCE(s.acc, 0) * $DampNum // $DampDen
         |           AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS doc_id, sum(p.pr // d.deg) AS acc
         |    FROM sym e
         |    JOIN pr${i - 1} p ON p.doc_id = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY 1) s ON s.doc_id = n.doc_id)""".stripMargin
    }
    (r0 +: steps).mkString(",\n")
  }
}
