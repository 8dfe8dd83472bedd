package graft

import org.apache.spark.sql.functions._
import graft.ext.{AnnIndex, VectorSearch}
import graft.io.Sources

/** Persistence roundtrip for the ANN index artifacts: an index
  * written to disk and reloaded must serve byte-identical answers to
  * the session-built stack — for the composed IVF→PQ path
  * (q_ann_ivf_pq's shape) AND for incremental append against the
  * frozen quantizer (q_ann_incremental's shape). */
class AnnIndexSpec extends SparkSpec {

  private def embAll = Sources.table(spark, sf001, "embeddings")
  private def emb = embAll.select(col("vec_id"), col("embedding"))
  private def labelCells(src: org.apache.spark.sql.DataFrame) =
    VectorSearch.labelCentroids(src)
      .select(col("label").cast("long").as("cell_id"), col("centroid"))
  private def queries = emb.where(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  test("saved index serves the identical IVF-PQ answers to the built one") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-rt").toString
    val cells = labelCells(embAll)
    AnnIndex.save(emb, cells, dir)
    val ix = AnnIndex.load(spark, dir)

    // session-built serving chain — exactly q_ann_ivf_pq's stages
    val shortlist = VectorSearch.ivfTopK(emb, cells, queries,
        "qid", "qvec", 10, 2).select(col("qid"), col("vec_id"))
    val pqCent = VectorSearch.pqTrain(emb)
    val built = VectorSearch.pqAdcRerank(shortlist, queries
        .select(col("qid").as("vec_id"), col("qvec").as("embedding")),
      pqCent, VectorSearch.pqEncode(emb, pqCent), "qid", 3)

    val served = AnnIndex.ivfPqTopK(ix, queries, "qid", "qvec",
      k = 3, nProbe = 2, shortlistK = 10)
    assert(key(served.select(col("qid"), col("vec_id"), col("adist"),
        col("rn"))) ===
      key(built.select(col("qid"), col("vec_id"), col("adist"),
        col("rn"))))
    assert(served.count() > 0)
  }

  test("append serves q_ann_incremental's answers without retraining") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-inc").toString
    val base = embAll.where(col("vec_id") % 10 =!= 9)
    val delta = emb.where(col("vec_id") % 10 === 9)
    // quantizer frozen on the BASE slice — q_ann_incremental's contract
    val cells = labelCells(base)
    AnnIndex.save(base.select(col("vec_id"), col("embedding")), cells, dir)
    AnnIndex.append(delta, dir)
    val ix = AnnIndex.load(spark, dir)

    val served = VectorSearch.ivfTopKFromAssigned(ix.codes, ix.cellsB,
      queries, "qid", "qvec", k = 3, nProbe = 2)

    // in-session q_ann_incremental: union of per-slice assignments
    val cellsB = broadcast(cells.select(col("cell_id"), col("centroid"),
      VectorSearch.fixedNormSq(col("centroid")).as("cnrm")))
    val assigned = VectorSearch.assignCells(
        base.select(col("vec_id"), col("embedding")), cellsB)
      .unionByName(VectorSearch.assignCells(delta, cellsB))
    val built = VectorSearch.ivfTopKFromAssigned(assigned, cellsB,
      queries, "qid", "qvec", k = 3, nProbe = 2)

    def k3(df: org.apache.spark.sql.DataFrame) = df
      .select(col("qid"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k3(served) === k3(built))
    assert(served.count() > 0)
    // the appended inverted lists really contain the delta rows
    assert(ix.codes.join(delta.select(col("vec_id")), Seq("vec_id"))
      .count() === delta.count())
    // and the PQ code table covers base + delta
    assert(ix.pqCodes.select(col("vec_id")).distinct().count() ===
      emb.count())
  }

  test("SQ quantizer params roundtrip: dequantization from loaded stats") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-sq").toString
    AnnIndex.save(emb, labelCells(embAll), dir)
    val ix = AnnIndex.load(spark, dir)
    val fromLoaded = VectorSearch.sqDequantizedWith(emb, ix.sqStats)
      .select(col("vec_id"), col("dqn")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val rebuilt = VectorSearch.sqDequantized(emb)
      .select(col("vec_id"), col("dqn")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(fromLoaded === rebuilt)
  }

  test("graph serve from the loaded index equals the session-built one") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-graph").toString
    AnnIndex.save(emb, labelCells(embAll), dir)
    val ix = AnnIndex.load(spark, dir)
    val served = AnnIndex.graphTopK(ix, queries, "qid", "qvec", k = 3)
    val built = VectorSearch.graphTopK(
      VectorSearch.knnGraph(emb), emb, queries, "qid", "qvec", k = 3)
    def k3(df: org.apache.spark.sql.DataFrame) = df
      .select(col("qid"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k3(served) === k3(built))
    assert(served.count() > 0)
  }

  test("appendGraph links late vectors into the saved graph: the " +
    "beam finds a delta vector as its own nearest neighbor") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-ginc").toString
    val base = emb.where(col("vec_id") % 10 =!= 9)
    val delta = emb.where(col("vec_id") % 10 === 9)
    AnnIndex.save(base, labelCells(embAll.where(col("vec_id") % 10 =!= 9)),
      dir)
    AnnIndex.append(delta, dir)
    AnnIndex.appendGraph(delta, dir)
    val ix = AnnIndex.load(spark, dir)
    // query WITH the delta vectors themselves: self is the true
    // top-1 (cos 1.0); reaching it proves the appended back-links
    // made the late vectors beam-visible. Differential: WITHOUT the
    // graph append the delta vertices have no in-edges, so a beam
    // can only hit one through the 4 global entry points — the
    // appended links must beat that floor, and clear the flat
    // serve's ~0.4 traversal recall scaled down (≥ nq/4).
    val dq = delta.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"))
    def selfHits(graph: org.apache.spark.sql.DataFrame): Long =
      VectorSearch.graphTopK(graph,
          ix.codes.select(col("vec_id"), col("embedding")),
          dq, "qid", "qvec", k = 3)
        .where(col("qid") === col("vec_id") && col("rn") === 1L).count()
    val without = selfHits(spark.read.parquet(s"$dir/knn_graph")
      .join(delta.select(col("vec_id").as("v")), Seq("v"), "left_anti")
      .join(delta.select(col("vec_id").as("n")), Seq("n"), "left_anti")
      .select(col("v"), col("n")))
    val withHits = selfHits(ix.knnGraph)
    val nq = dq.count()
    assert(withHits > without,
      s"append must make deltas beam-visible: $withHits vs $without")
    assert(withHits >= nq / 4,
      s"only $withHits of $nq delta queries found themselves")
    // appended volume is bounded by the delta cut: ≤ 2·K·|delta|
    // total delta-incident rows (K out-edges each, mirrored once)
    val deltaRows = ix.knnGraph
      .join(delta.select(col("vec_id").as("v")), Seq("v"), "left_semi")
      .count()
    assert(deltaRows <= 2L * VectorSearch.GraphK * nq,
      s"appended $deltaRows rows for $nq delta vectors")
    // and no duplicate edges: a delta–delta candidate pair reaches
    // `out` in both orientations, which the pre-write distinct must
    // collapse before the reverse union doubles it
    val g = ix.knnGraph.select(col("v"), col("n"))
    assert(g.count() === g.distinct().count(),
      "stored knn_graph carries duplicate edges")
  }

  test("hnsw serve from the loaded index equals the session-built one") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-hnsw").toString
    AnnIndex.save(emb, labelCells(embAll), dir)
    val ix = AnnIndex.load(spark, dir)
    val served = AnnIndex.hnswTopK(ix, queries, "qid", "qvec", k = 3)
    val built = VectorSearch.hnswTopK(
      VectorSearch.knnGraph(emb), VectorSearch.knnGraphL1(emb),
      emb, queries, "qid", "qvec", k = 3)
    def k3(df: org.apache.spark.sql.DataFrame) = df
      .select(col("qid"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k3(served) === k3(built))
    assert(served.count() > 0)
  }

  test("geometry mismatch fails fast on load") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-bad").toString
    AnnIndex.save(emb, labelCells(embAll), dir)
    Seq("format_version" -> AnnIndex.FormatVersion.toString,
        "pq_subspaces" -> "8", "pq_subdim" -> "8", "pq_codes" -> "8")
      .toDF("key", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.load(spark, dir)
    }
    assert(e.getMessage.contains("PQ geometry"))
  }
}
