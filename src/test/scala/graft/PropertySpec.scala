package graft

import org.apache.spark.sql.functions._
import graft.core.{Similarity => S}

/** Property-based checks of the metric formulas (SURVEY.md §5.2),
  * over fixed-seed random co-rating vectors. Properties are evaluated
  * through the actual Column expressions, so they exercise the code
  * that runs in the engine, not a scala reimplementation.
  * (Deliberately not using a property-testing framework: the offline
  * dependency set has no scalatest↔scalacheck bridge; a seeded
  * generator gives the same coverage reproducibly.) */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def vecPair(): (Seq[Double], Seq[Double]) = {
    val n = 2 + rnd.nextInt(11)
    (Seq.fill(n)((1 + rnd.nextInt(50)).toDouble),
      Seq.fill(n)((1 + rnd.nextInt(50)).toDouble))
  }
  private val cases: Seq[(Seq[Double], Seq[Double])] =
    Seq.fill(25)(vecPair())

  /** Evaluate (corr, cos, reg, norm) through the Column formulas from
    * explicit co-rating vectors — batched into one DataFrame so the
    * whole property suite costs a handful of Spark jobs. */
  private def evalAll(ps: Seq[(Seq[Double], Seq[Double])])
      : Seq[(Double, Double, Double, Double)] = {
    import spark.implicits._
    val rows = ps.zipWithIndex.map { case ((xs, ys), i) =>
      val n = xs.size.toDouble
      (i, n, xs.sum, ys.sum, xs.map(v => v * v).sum,
        ys.map(v => v * v).sum, xs.zip(ys).map { case (a, b) => a * b }.sum)
    }
    rows.toDF("i", "nd", "sxd", "syd", "sxxd", "syyd", "sxyd")
      .select(col("i"),
        S.correlation(col("nd"), col("sxyd"), col("sxd"), col("syd"),
          col("sxxd"), col("syyd")).as("corr"),
        S.cosine(col("sxyd"), col("sxxd"), col("syyd")).as("cos"),
        S.regularizedCorrelation(col("nd"), col("sxyd"), col("sxd"),
          col("syd"), col("sxxd"), col("syyd")).as("reg"),
        S.normalizedCorrelation(col("nd"), col("sxyd"), col("sxd"),
          col("syd"), col("sxxd"), col("syyd")).as("norm"))
      .orderBy(col("i")).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
  }

  test("corr and cosine are symmetric under x<->y") {
    val fwd = evalAll(cases)
    val rev = evalAll(cases.map(_.swap))
    fwd.zip(rev).foreach { case ((c1, co1, _, _), (c2, co2, _, _)) =>
      assert(math.abs(c1 - c2) < 1e-12 && math.abs(co1 - co2) < 1e-12)
    }
  }

  test("corr in [-1,1]; cosine in [0,1] for positive ratings") {
    evalAll(cases).foreach { case (c, co, _, _) =>
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(co >= 0.0 && co <= 1.0 + 1e-9)
    }
  }

  test("cosine is scale-invariant: cos(ax, by) = cos(x, y) for a,b>0") {
    val scaled = cases.map { case (xs, ys) => (xs.map(_ * 3), ys.map(_ * 4)) }
    evalAll(cases).zip(evalAll(scaled)).foreach {
      case ((_, co1, _, _), (_, co2, _, _)) =>
        assert(math.abs(co1 - co2) < 1e-9)
    }
  }

  test("pearson is translation-invariant: corr(x+a, y+b) = corr(x, y)") {
    val shifted = cases.map { case (xs, ys) => (xs.map(_ + 7), ys.map(_ + 3)) }
    evalAll(cases).zip(evalAll(shifted)).foreach {
      case ((c1, _, _, _), (c2, _, _, _)) =>
        assert(math.abs(c1 - c2) < 1e-6)
    }
  }

  test("normcorr = (corr+1)/2; regcorr = w*corr with w = n/(n+10)") {
    cases.zip(evalAll(cases)).foreach { case ((xs, _), (c, _, reg, norm)) =>
      assert(math.abs(norm - (c + 1.0) / 2.0) < 1e-12)
      val w = xs.size / (xs.size + S.PriorCount)
      assert(math.abs(reg - w * c) < 1e-12)
      assert(math.abs(reg) <= math.abs(c) + 1e-12)
    }
  }

  test("our pearson matches Spark's built-in corr (modulo 0.0-vs-NULL)") {
    import spark.implicits._
    val ours = evalAll(cases)
    cases.zip(ours).foreach { case ((xs, ys), (c, _, _, _)) =>
      val builtin = xs.zip(ys).toDF("x", "y")
        .select(corr(col("x"), col("y"))).collect()(0)
      if (builtin.isNullAt(0)) assert(c === 0.0) // our sentinel convention
      else assert(math.abs(builtin.getDouble(0) - c) < 1e-9)
    }
  }

  test("pairMomentsDec is exact at magnitudes where LONG moments overflow") {
    import spark.implicits._
    import graft.core.Moments
    // rating_i ~3e14: a single rating_i² product is ~9e28 ≫ 2^63, so
    // the LONG variant cannot even form one term; the DECIMAL(38,0)
    // variant must match driver-side BigInt arithmetic exactly
    val raw = Seq(
      ("u1", "A", 300000000000000L), ("u1", "B", 299999999999999L),
      ("u2", "A", 123456789012345L), ("u2", "B", 222222222222222L),
      ("u3", "A", 987654321098765L), ("u3", "B", 111111111111111L))
    val df = raw.toDF("user_id", "item_id", "rating_i")
    val row = Moments.pairMomentsDec(df).collect()(0)
    val byUser = raw.groupBy(_._1).map { case (u, ts) =>
      u -> ts.map(t => t._2 -> t._3).toMap }
    val users = byUser.keys.toSeq.sorted
    val xs = users.map(u => BigInt(byUser(u)("A")))
    val ys = users.map(u => BigInt(byUser(u)("B")))
    def bd(b: BigInt) = new java.math.BigDecimal(b.bigInteger)
    assert(row.getAs[Long]("n") === 3L)
    assert(row.getAs[java.math.BigDecimal]("sx").compareTo(bd(xs.sum)) === 0)
    assert(row.getAs[java.math.BigDecimal]("sxx")
      .compareTo(bd(xs.map(x => x * x).sum)) === 0)
    assert(row.getAs[java.math.BigDecimal]("syy")
      .compareTo(bd(ys.map(y => y * y).sum)) === 0)
    assert(row.getAs[java.math.BigDecimal]("sxy")
      .compareTo(bd(xs.zip(ys).map { case (x, y) => x * y }.sum)) === 0)
    // and at ordinary magnitudes the two variants agree exactly
    val long_ = Moments.pairMoments(toyRatings).orderBy("item_x", "item_y")
      .select(col("item_x"), col("item_y"), col("n"),
        col("sxx").cast("string"), col("sxy").cast("string")).collect()
    val dec_ = Moments.pairMomentsDec(toyRatings).orderBy("item_x", "item_y")
      .select(col("item_x"), col("item_y"), col("n"),
        col("sxx").cast("string"), col("sxy").cast("string")).collect()
    assert(long_.map(_.toString).toSeq === dec_.map(_.toString).toSeq)
  }

  test("bandJoin equals the naive theta join on seeded random event sets") {
    import spark.implicits._
    import graft.core.TemporalJoin
    // clustered timestamps so many pairs straddle bucket boundaries
    (0 until 3).foreach { trial =>
      val r = new scala.util.Random(1000 + trial)
      val W = 1 + r.nextInt(200)
      val rows = (0 until 250).map { i =>
        (s"k${r.nextInt(4)}", i.toLong,
          (r.nextInt(40) * W / 10 + r.nextInt(2 * W)).toLong)
      }.toDF("k", "id", "ts")
      val banded = TemporalJoin.bandJoin(rows, rows, Seq("k"), "ts", "ts", W)
        .select(col("k"), col("a_id"), col("b_id"))
      val a = rows.select(col("k"), col("id").as("a_id"), col("ts").as("a_ts"))
      val b = rows.select(col("k").as("k2"), col("id").as("b_id"),
        col("ts").as("b_ts"))
      val naive = a.join(b, col("k") === col("k2") &&
          col("b_ts") >= col("a_ts") && col("b_ts") - col("a_ts") <= W)
        .select(col("k"), col("a_id"), col("b_id"))
      assert(banded.count() === naive.count(), s"trial $trial W=$W")
      assert(banded.exceptAll(naive).isEmpty &&
        naive.exceptAll(banded).isEmpty, s"trial $trial W=$W")
    }
  }

  test("scalar quantization: half-step error bound and partition invariance") {
    import spark.implicits._
    import graft.ext.VectorSearch
    for (trial <- 0 until 5) {
      val r = new scala.util.Random(7000 + trial)
      val dims = 2 + r.nextInt(4)
      val n = 3 + r.nextInt(5)
      val rows = (1 to n).map(i =>
        (i.toLong, Array.fill(dims)((r.nextDouble() * 4 - 2).toFloat)))
      val emb = rows.toDF("vec_id", "embedding")
      val q = VectorSearch.scalarQuantize(emb)
        .collect().map(x => x.getAs[Long]("vec_id") -> x).toMap
      // per-dim half-step bound: |v - deq| <= (mx-mn)/510 (+1 fx unit
      // of rounding slack per dim), summed over dims
      val ranges = (0 until dims).map(d =>
        rows.map(_._2(d).toDouble).max - rows.map(_._2(d).toDouble).min)
      val bound = ranges.map(rg => (rg / 510.0 * 1e9).toLong + 1L).sum
      for ((_, row) <- q) {
        assert(row.getAs[Long]("n_dims") === dims.toLong)
        assert(row.getAs[Long]("code_min") >= 0L &&
          row.getAs[Long]("code_max") <= 255L)
        assert(row.getAs[Long]("err_fx") <= bound,
          s"trial $trial err=${row.getAs[Long]("err_fx")} bound=$bound")
      }
      // partitioning must not change a single cell: min/max are exact,
      // per-element codes are pure functions, and error sums are
      // integer fixed-point
      val q1 = VectorSearch.scalarQuantize(emb.repartition(7))
        .collect().map(x => x.getAs[Long]("vec_id") -> x.toSeq).toMap
      assert(q.view.mapValues(_.toSeq).toMap === q1, s"trial $trial")
    }
  }

  test("semDedup agrees with brute force and is partition-invariant") {
    import spark.implicits._
    import graft.ext.VectorSearch
    for (trial <- 0 until 3) {
      val r = new scala.util.Random(9100 + trial)
      val dims = 4
      val n = 6 + r.nextInt(6)
      // values on a 1/64 grid keep cosines exactly representable
      val rows = (0 until n).map(i =>
        (i.toLong, Array.fill(dims)((r.nextInt(129) - 64) / 64.0f)))
      val emb = rows.toDF("vec_id", "embedding")
      val cells = Seq(
        (0L, Array(1.0, 0.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0, 0.0)))
        .toDF("cell_id", "centroid")
      val tau = 0.5
      val out = VectorSearch.semDedup(emb, cells, tau, cap = 1000)
        .collect().map(x => x.getAs[Long]("vec_id") -> x.toSeq).toMap
      // brute-force twin on the driver: same assignment rule (r4
      // cosine argmax, min-cell tie), same keep-first policy
      def cos(a: Array[Double], b: Array[Double]): Double = {
        def fx(x: Double) = math.floor(x * 1e12 + 0.5)
        val dot = a.zip(b).map { case (x, y) => fx(x * y) }.sum / 1e12
        val na = a.map(x => fx(x * x)).sum / 1e12
        val nb = b.map(x => fx(x * x)).sum / 1e12
        val d = math.sqrt(na) * math.sqrt(nb)
        val c = if (d == 0.0) 0.0 else dot / d
        math.floor(c * 10000.0 + 0.5) / 10000.0
      }
      val cellVecs = Map(0L -> Array(1.0, 0.0, 0.0, 0.0),
        1L -> Array(0.0, 1.0, 0.0, 0.0))
      val assign = rows.map { case (id, v) =>
        val vd = v.map(_.toDouble)
        id -> cellVecs.keys.toSeq.sorted
          .maxBy(c => (cos(vd, cellVecs(c)), -c))
      }.toMap
      for ((id, v) <- rows) {
        val mates = rows.filter { case (j, _) =>
          j < id && assign(j) == assign(id) }
        val cosines = mates.map { case (_, w) =>
          cos(v.map(_.toDouble), w.map(_.toDouble)) }
        val nPrior = cosines.count(_ >= tau).toLong
        val row = out(id)
        assert(row(2) === nPrior, s"trial $trial vec $id n_prior")
        assert(row(4) === (if (nPrior > 0) 1L else 0L),
          s"trial $trial vec $id is_dup")
        if (cosines.nonEmpty)
          assert(row(3) === cosines.max, s"trial $trial vec $id max")
      }
      // partitioning must not move a verdict
      val out2 = VectorSearch.semDedup(emb.repartition(5), cells, tau,
        cap = 1000).collect().map(x => x.getAs[Long]("vec_id") -> x.toSeq)
        .toMap
      assert(out === out2, s"trial $trial")
    }
  }

  test("pack efficiency: packed never exceeds naive, both cover tokens") {
    // the q_pack_efficiency arithmetic as invariants over the real
    // corpus: per source, n_tokens <= packed_padded <= naive_padded,
    // both multiples of the bin, and waste fractions in [0, 1)
    val out = graft.SparkEntry.queries("q_pack_efficiency")(spark, sf001)
      .collect()
    assert(out.nonEmpty)
    val b = graft.ext.Packing.BinCapacity
    out.foreach { r =>
      val (tok, naive, packed) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("naive_padded"), r.getAs[Long]("packed_padded"))
      assert(tok <= packed && packed <= naive)
      assert(naive % b == 0 && packed % b == 0)
      assert(r.getAs[Double]("naive_waste") >= 0.0 &&
        r.getAs[Double]("naive_waste") < 1.0)
      assert(r.getAs[Double]("packed_waste") >= 0.0 &&
        r.getAs[Double]("packed_waste") <= r.getAs[Double]("naive_waste"))
    }
  }

  test("triangleCounts equals brute-force enumeration on random graphs") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val n = 5 + r.nextInt(8)
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if r.nextDouble() < 0.45
      } yield (a.toLong, b.toLong)).toList
      val es = edges.toSet
      val expect = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        c <- (b + 1) until n.toLong
        if es((a, b)) && es((b, c)) && es((a, c))
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else graft.ext.GraphRank.triangleCounts(edges.toDF("d1", "d2"))
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === expect, s"trial $trial, n=$n, edges=$expect")
    }
  }

  test("Intervals.mergePerKey matches a brute-force sweep on random " +
      "interval sets") {
    import spark.implicits._
    val r = new scala.util.Random(20260814)
    for (trial <- 1 to 12) {
      // random intervals over a few keys, heavy tie/overlap density
      val rows = (0 until (10 + r.nextInt(40))).map { i =>
        val key = (r.nextInt(3) + 1).toLong
        val st = r.nextInt(40).toLong
        (key, st, st + 1 + r.nextInt(10), i.toLong)
      }
      // reference: per-key sorted sweep merging st <= runningMax
      val expect = rows.groupBy(_._1).view.mapValues { rs =>
        val sorted = rs.sortBy(x => (x._2, x._4))
        val islands = sorted.foldLeft(List.empty[(Long, Long)]) {
          case ((s0, e0) :: tail, (_, st, en, _)) if st <= e0 =>
            (s0, math.max(e0, en)) :: tail
          case (acc, (_, st, en, _)) => (st, en) :: acc
        }.reverse
        (islands.size.toLong,
          islands.map { case (a, b) => b - a }.sum,
          islands.map { case (a, b) => b - a }.max)
      }.toMap
      val got = graft.core.Intervals.coveragePerKey(
          graft.core.Intervals.mergePerKey(
            rows.toDF("user_id", "st", "en", "tie"),
            "user_id", "st", "en", "tie"), "user_id")
        .collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
          x.getLong(3)))).toMap
      assert(got === expect, s"trial $trial: $rows")
    }
  }

  test("skyline equals brute-force dominance on seeded random point " +
    "sets (duplicates and ties included)") {
    import spark.implicits._
    val r = new scala.util.Random(1009)
    for (trial <- 1 to 8) {
      // small domains FORCE duplicate sizes, co-located points, and
      // single-axis ties — the corners a frontier implementation gets
      // wrong first
      val pts = Seq.tabulate(40 + r.nextInt(40))(i =>
        (i.toLong, (1 + r.nextInt(6)).toLong, (10 + r.nextInt(8)).toLong))
      val expect = pts.filter { case (_, s, c) =>
        !pts.exists { case (_, s2, c2) =>
          s2 <= s && c2 <= c && (s2 < s || c2 < c) }
      }.map(_._1).toSet
      val got = rel.RelQueries.skyline2d(
          pts.toDF("p_partkey", "p_size", "cents"))
        .collect().map(_.getLong(0)).toSet
      assert(got === expect, s"trial $trial: pts=$pts")
    }
  }
}
