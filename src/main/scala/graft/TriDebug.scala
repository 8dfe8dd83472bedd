package graft
import org.apache.spark.sql.SparkSession
object TriDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tuning.defaults(
      SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PIECE $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions.col
    import graft.ext.Dedup
    val docsDf = graft.io.Sources.table(spark, sfDir, "documents")
    val shingleHashes = graft.core.Cache.getOrPersist(
      spark, "shingle_hashes", sfDir)(
      Dedup.shingleHashes(Dedup.shingles(docsDf)))
    val bandMins = graft.core.Cache.getOrPersist(
      spark, "minhash_bandmins", sfDir)(
      Dedup.minhashBandMinsFromHashes(shingleHashes, 0, Dedup.Bands))
    val edges = time("candidates")(
      graft.core.Cache.getOrPersist(spark, "minhash_cand", sfDir)(
        Dedup.minhashCandidates(bandMins))
        .select(col("d1"), col("d2")))
    time("edges_count")(println("m = " + edges.count()))
    val vmap = time("twinClasses_build")(
      graft.core.Cache.getOrSnapshot(spark, "tri_twins", sfDir)(
        graft.ext.GraphRank.twinClasses(edges)))
    time("vmap_count")(println("v = " + vmap.count()))
    time("guard")(println("violations = " +
      graft.ext.GraphRank.contractionViolations(edges, vmap)))
    val qedges = time("quotientEdges")(
      graft.core.Cache.getOrPersist(spark, "tri_qedges", sfDir)(
        graft.ext.GraphRank.quotientEdges(edges, vmap)))
    time("qedges_count")(println("mq = " + qedges.count()))
    val aggs = time("quotAggs")(
      graft.core.Cache.getOrSnapshot(spark, "tri_quot_aggs", sfDir)(
        graft.ext.GraphRank.quotientTriangleAggs(vmap, qedges,
          (tag, f) => graft.core.Broadcasts.gatedMemo(f,
            "spark.graft.graph.broadcastMax", s"tri_q_$tag:$sfDir"))))
    time("aggs_count")(println("na = " + aggs.count()))
    time("aggs_count2")(aggs.count())
    println("aggs storage: " + aggs.storageLevel)
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      val nm = Option(i.name).getOrElse("").replace("\n", " ").take(60)
      println(s"RDDINFO ${i.id} cached=${i.numCachedPartitions}/" +
        s"${i.numPartitions} mem=${i.memSize} disk=${i.diskSize} '$nm'")
    }
    val pd = graft.ext.GraphRank.perDocTriangles(vmap, aggs)
    pd.explain("formatted")
    time("perdoc_a")(pd.count())
    time("perdoc_b")(pd.count())
    val q = SparkEntry.queries("q_graph_triangles")
    time("full_run1")(q(spark, sfDir).count())
    time("full_run2")(q(spark, sfDir).count())
    spark.stop()
  }
}
