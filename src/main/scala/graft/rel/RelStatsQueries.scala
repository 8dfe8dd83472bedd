package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, PortableHash}
import graft.io.Sources

/** Statistics / experimentation / privacy queries: A/B lift, robust
  * slopes, inequality and independence measures, k-anonymity /
  * l-diversity, the DP release family, and sampling utilities.
  *
  * Registration-only sibling of [[RelQueries]] (round-13 split along
  * family seams; no behavior change — SparkEntry unions the maps).
  * Helpers shared with the core file stay on RelQueries as
  * `private[rel]`.
  */
object RelStatsQueries {
  import Oracle._

  private[rel] def t(s: SparkSession, d: String, n: String) = Sources.table(s, d, n)


  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact-integer OLS trend: per event type, the least-squares
    // slope/intercept of daily counts over the day index. Every OLS
    // moment (n, Σx, Σy, Σxy, Σxx) is an INTEGER sum over the daily
    // table — exact, order-independent, partial/final-aggregable —
    // and only the final ratio touches doubles (same IEEE division
    // both engines). Two aggs: data → daily counts (report-sized),
    // days → moments. The regression aggregate every metrics
    // dashboard runs, expressed scale-shaped.
    // Experiment read-out: deterministic A/B assignment (spread-hash
    // parity of the user key — the same gate discipline as
    // q_split_assign, so arms are stable under re-runs and new data
    // never reassigns a user), purchase-conversion per arm from exact
    // counts, and the two-proportion z statistic spelled once in IEEE
    // doubles. One distinct-user aggregation + one 2-row reduce; at
    // 100 TB the per-user conversion flag is a partial/final max —
    // nothing here is more than two shuffles.
    "q_abtest_lift" -> ((s, d) => {
      val users = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .withColumn("arm",
          (PortableHash.spread(
            PortableHash.h(col("user_id").cast("string"))) % 2L)
            .as("arm"))
      // r17 (§2.4 dedup the repeated subtree): the per-arm counts used
      // to come from TWO filters of the same `arms` aggregate cross-
      // joined — the whole events scan+user agg ran twice in the plan
      // (ReuseExchange does not fire across the differing filters).
      // One conditional aggregation pivots both arms in a single pass:
      // 2 scans → 1, BroadcastNestedLoopJoin gone. The where-guard
      // reproduces the crossJoin's empty-if-either-arm-empty edge
      // exactly, so results are row-identical on ANY input.
      val row = users.agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0L, col("converted")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1L, col("converted")).otherwise(0L))
          .as("conv_b"))
        .where(col("n_a") > 0 && col("n_b") > 0)
      val rateA = col("conv_a").cast("double") / col("n_a")
      val rateB = col("conv_b").cast("double") / col("n_b")
      val p = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b"))
      val den = sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      row.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        Det.r4(rateA).as("rate_a"), Det.r4(rateB).as("rate_b"),
        Det.r4(rateB - rateA).as("lift"),
        Det.r4(when(den === 0.0, lit(0.0))
          .otherwise((rateB - rateA) / den)).as("z_stat"))
    }),


    // Theil–Sen robust slope — the median-of-pairwise-slopes
    // estimator next to q_trend_slope's OLS: one wild outlier day
    // moves OLS arbitrarily, Theil–Sen not at all (breakdown 29%).
    // Pairs are quadratic in DAYS PER TYPE — a bounded time axis,
    // never the corpus — so the within-type pair window is small by
    // construction at any data scale. Lower median picked by rank
    // over the (slope, day_i, day_j) total order: a deterministic
    // ELEMENT, so the emitted double is portable without averaging
    // discipline.
    "q_theilsen_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y"))
      val a = daily.select(col("event_type"), col("day").as("di"),
        col("y").as("yi"))
      val b = daily.select(col("event_type"), col("day").as("dj"),
        col("y").as("yj"))
      val pairs = a.join(b, Seq("event_type"))
        .where(col("di") < col("dj"))
        .select(col("event_type"), col("di"), col("dj"),
          ((col("yj") - col("yi")).cast("double") /
            (col("dj") - col("di")).cast("double")).as("slope"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("slope"), col("di"), col("dj"))
      pairs
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_pairs", count(lit(1))
          .over(Window.partitionBy(col("event_type"))))
        .where(col("rn") === expr("(n_pairs + 1) div 2"))
        .select(col("event_type"), col("n_pairs"),
          Det.r4(col("slope")).as("ts_slope"))
        .orderBy(col("event_type"))
    }),


    "q_trend_slope" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y"))
      val d0 = daily.groupBy(col("event_type"))
        .agg(min(col("day")).as("d0"))
      val xy = daily.join(d0, Seq("event_type"))
        .select(col("event_type"), (col("day") - col("d0")).as("x"),
          col("y"))
      val m = xy.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
      val den = (col("n_days") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      m.select(col("event_type"), col("n_days"),
          Det.r4((col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") / den).as("slope"),
          Det.r4((col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("double") / den).as("intercept"))
        .orderBy(col("event_type"))
    }),


    // Gini coefficient of per-user spend — the inequality statistic,
    // computed with the SCALE-CORRECT ranking: the global value order
    // comes from a distributed sort + zipWithIndex (the id-dictionary
    // discipline), never a row_number window over an empty partition
    // (which would single-thread every user through one task). Rank
    // products sum in DECIMAL(38,0) so the rank-weighted total is
    // exact at any population size; only the closed-form ratio
    // touches doubles.
    "q_gini_value" -> ((s, d) => {
      import s.implicits._
      val totals = t(s, d, "events").groupBy(col("user_id"))
        .agg(sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
          .as("v"))
      val ranked = totals
        .select(col("user_id"), col("v"))
        .rdd.map(r => (r.getLong(0), r.getLong(1)))
        .sortBy { case (u, v) => (v, u) }
        .zipWithIndex()
        .map { case ((u, v), i) => (u, v, i + 1L) }
        .toDF("user_id", "v", "rk")
      ranked.agg(count(lit(1)).as("n_users"),
          sum(col("v")).as("total_c"),
          sum(col("rk").cast("decimal(38,0)") *
            col("v").cast("decimal(38,0)")).as("rv"))
        .select(col("n_users"), col("total_c").cast("long").as("total_c"),
          Det.r4(lit(2.0) * col("rv").cast("double") /
            (col("n_users").cast("double") * col("total_c").cast("double"))
            - (col("n_users") + lit(1)).cast("double") /
              col("n_users").cast("double")).as("gini"))
    }),


    // Deterministic negative sampling (recommender training pairs):
    // K hash probes per user into the DENSE ITEM DICTIONARY — the
    // O(users·K) shape — never a users×items cross join (the 1e15
    // trap at production scale). Probe k draws item index
    // spread(h(user:k)) mod |dict|; collisions with true
    // interactions drop via anti-join (bounded per user). The
    // dictionary is entity-sized and broadcast under the standing
    // gate; its cardinality is a memoized scalar (one count per
    // session, not per declaration).
    "q_negative_sampling" -> ((s, d) => {
      import graft.core.{Broadcasts, PortableHash}
      // the session-cached bucketed ratings (SimQueries shares it):
      // the lineitem⋈orders view must not rebuild per execution; the
      // distinct interaction set is itself read three times per run
      // (probe users, dictionary input, anti-join side) → persist
      val inter = graft.core.Cache.getOrPersist(s, "neg_inter", d)(
        SimQueries.ratings(s, d)
          .select(col("user_id"), col("item_id")).distinct())
      // the dictionary build is a distinct+sort+zipWithIndex job —
      // a per-(session, dir) artifact, not per-execution work
      val dict = graft.core.Cache.getOrPersist(s, "neg_dict", d)(
        graft.ext.Recommender.dictionary(inter, "item_id"))
      val nItems = Broadcasts.countOnce(dict, s"neg_dict:$d")
      val probes = inter.select(col("user_id")).distinct()
        .select(col("user_id"),
          explode(sequence(lit(0L), lit(2L))).as("k"))
      val cand = probes.withColumn("idx",
          (PortableHash.spread(PortableHash.h(concat(
            col("user_id").cast("string"), lit(":"),
            col("k").cast("string")))) % lit(nItems)).cast("int"))
        .join(Broadcasts.gatedMemo(dict, "spark.graft.dict.broadcastMax",
          s"neg_dict_frame:$d"), Seq("idx"))
      cand.join(inter, Seq("user_id", "item_id"), "left_anti")
        .select(col("user_id"), col("k"), col("item_id"))
        .orderBy(col("user_id"), col("k"))
    }),


    // Market-basket association rules over order baskets: pairwise
    // support, confidence and lift for parts bought together. The
    // pair explosion is the reference's C(n,2) self-join shape
    // (SURVEY §2.1 R4) applied to baskets — bounded by basket size,
    // never corpus²: the equi key (l_orderkey) carries the shuffle
    // and the < predicate halves the fan-out. Item supports join
    // back by part key; the order total rides a broadcast scalar.
    // Confidence and lift are emitted as exact ×10000 integer
    // fixed-point (c·N·10⁴ div c_a·c_b) — no doubles cross the
    // oracle boundary. At extreme counts the lift numerator wants
    // DECIMAL(38,0); at any plausible basket cardinality LONG holds.
    "q_assoc_rules" -> ((s, d) => {
      val all = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      // Basket cap — the reference's MAX_NUM_RATERS discipline
      // (SURVEY §2.1 R3) applied to baskets: a degenerate 10k-item
      // cart contributes C(10k,2) ≈ 5·10⁷ pairs and no signal; cap
      // 50 is a no-op on this data (max basket ≈ 7) and the guard a
      // production run needs. Not silent: capped baskets leave
      // n_orders too, so support stays honest over KEPT baskets.
      val okBaskets = all.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("bsz")).where(col("bsz") <= 50)
        .select(col("l_orderkey"))
      // memoized: items feeds FOUR consumers (both self-join sides,
      // the item supports, the order total) — uncached, each replays
      // the distinct's shuffle
      val items = graft.core.Cache.getOrPersist(s, "basket_items", d)(
        all.join(okBaskets, Seq("l_orderkey")))
      val totals = broadcast(
        items.agg(countDistinct(col("l_orderkey")).as("n_orders")))
      val ca = items.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("c_item"))
      items.as("a").join(items.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"),
          col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 2)
        .join(ca.select(col("l_partkey").as("p1"),
          col("c_item").as("c_a")), Seq("p1"))
        .join(ca.select(col("l_partkey").as("p2"),
          col("c_item").as("c_b")), Seq("p2"))
        .crossJoin(totals)
        .select(col("p1"), col("p2"), col("c_ab"), col("c_a"),
          col("c_b"), col("n_orders"),
          expr("c_ab * 10000 div c_a").as("conf_x10000"),
          expr("(c_ab * n_orders * 10000) div (c_a * c_b)")
            .as("lift_x10000"))
        .orderBy(col("c_ab").desc, col("p1"), col("p2"))
    }),


    // RFM segmentation over orders: recency / frequency / monetary
    // per customer, scored into quartiles AGAINST BROADCAST VALUE
    // THRESHOLDS from the distributed order-statistic path
    // (Quantiles.valueAtFraction — the q_quality_cut discipline),
    // never a global ntile window (an empty-partition ranking window
    // single-threads the whole customer table; thresholds keep every
    // stage parallel and make scores a per-row comparison). Quartile
    // fractions 0.25/0.5/0.75 are exact binary, so ⌊f·n⌋ is integer-
    // replayable on the oracle side. Monetary snaps to integer cents
    // before summing (order-independent).
    "q_rfm_segments" -> ((s, d) => {
      val per = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        // o_orderdate is TIMESTAMP_NTZ in parquet; cast through
        // session-UTC timestamp for unix_millis
        .agg(max(expr("unix_millis(cast(o_orderdate as timestamp))"))
          .as("last_ms"),
          count(lit(1)).as("freq"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("mon_c"))
      val gmax = per.agg(max(col("last_ms")).as("gmax"))
      val m = per.crossJoin(broadcast(gmax))
        .withColumn("recency_days", expr("(gmax - last_ms) div 86400000"))
      // One distributed sort per COLUMN (all three quartile ranks
      // extracted from it), not one per (column, fraction) — 3 cold
      // sort jobs instead of 9, identical rank values.
      def thr(c: String) = graft.core.Quantiles.valuesAtFractionsMemo(
        m, c, Seq(0.25, 0.5, 0.75), s"rfm:$c:$d")
      def bucket(c: String) = thr(c).map(t =>
        when(col(c).cast("double") >= lit(t), 1L).otherwise(0L))
        .reduce(_ + _)
      m.select(col("o_custkey"), col("recency_days"), col("freq"),
          col("mon_c"),
          (lit(4L) - bucket("recency_days")).as("r_score"),
          (lit(1L) + bucket("freq")).as("f_score"),
          (lit(1L) + bucket("mon_c")).as("m_score"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"), sum(col("mon_c")).as("mon_c_sum"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    }),


    // Chi-square independence test, event_type × day-of-week bucket —
    // the contingency read-out a feature-drift monitor runs per batch.
    // One groupBy over events produces the 35-cell table; every later
    // frame is O(cells). Cross-engine determinism: observed counts and
    // margins are exact BIGINTs, each expected value r·c/n is ONE IEEE
    // division of exact integers, each cell term a fixed IEEE op
    // sequence, and the cell terms cross the sum through Det.fsum4's
    // fixed-point path so summation order cannot matter. Cramér's V
    // derives from the already-deterministic χ² scalar.
    "q_chisq_independence" -> ((s, d) => {
      val obs = t(s, d, "events")
        .select(col("event_type").as("et"),
          expr("(unix_millis(ts) div 86400000) % 7").as("dow"))
        .groupBy(col("et"), col("dow")).agg(count(lit(1)).as("o"))
      val rt = obs.groupBy(col("et")).agg(sum(col("o")).as("r"))
      val ct = obs.groupBy(col("dow")).agg(sum(col("o")).as("c"))
      val tot = obs.agg(sum(col("o")).as("n"))
      val e = col("r") * col("c") / col("n")
      obs.join(rt, Seq("et")).join(ct, Seq("dow"))
        .crossJoin(broadcast(tot))
        .select(col("et"), col("dow"), col("o"), col("r"), col("c"),
          col("n"), ((col("o") - e) * (col("o") - e) / e).as("term"))
        .agg(count(lit(1)).as("n_cells"),
          countDistinct(col("et")).as("net"),
          countDistinct(col("dow")).as("ndow"),
          Det.fsum4(col("term")).as("chi2"), max(col("n")).as("n"))
        .select(col("n_cells"),
          ((col("net") - 1) * (col("ndow") - 1)).as("dof"),
          col("chi2"),
          Det.r4(sqrt(col("chi2") /
            (col("n") * least(col("net") - 1, col("ndow") - 1))))
            .as("cramers_v"))
    }),


    // k-anonymity release gate (k = 8): group the table by its
    // quasi-identifier projection (market segment × nation — the
    // columns an adversary can link externally) and flag every group
    // smaller than k for suppression before publication, with the
    // per-group size and the released/suppressed row totals the
    // release audit records. One partial/final aggregate over the QI
    // keys — group count is bounded by the QI domain (≤125 here),
    // so the gate costs one scan at any table size; the compliance
    // complement of q_delete_propagation (erasure handles the past,
    // the k-gate handles what may be published next).
    "q_k_anonymity" -> ((s, d) => {
      val g = t(s, d, "customer")
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
        .withColumn("released", when(col("n") >= 8, 1L).otherwise(0L))
      g.select(col("c_mktsegment"), col("c_nationkey"), col("n"),
          col("released"),
          (col("n") * col("released")).as("released_rows"),
          (col("n") * (lit(1L) - col("released"))).as("suppressed_rows"))
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    }),


    // l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    // companion: a quasi-identifier group can be k-large yet leak if
    // every member shares one sensitive value. Sensitive attribute =
    // the account-balance band (floor(acctbal/2000), IEEE floor on
    // both engines); a group releases only when it carries ≥3
    // distinct bands. Same one-pass partial/final agg shape as
    // q_k_anonymity — count + distinct-count per group, no second
    // scan.
    "q_l_diversity" -> ((s, d) => {
      val band = floor(col("c_acctbal").cast("double") / lit(2000.0))
        .cast("long")
      t(s, d, "customer")
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          countDistinct(band).as("n_bands"))
        .withColumn("l_diverse",
          when(col("n_bands") >= 3, 1L).otherwise(0L))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n"),
          col("n_bands"), col("l_diverse"),
          (col("n") * col("l_diverse")).as("released_rows"),
          (col("n") * (lit(1L) - col("l_diverse")))
            .as("suppressed_rows"))
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    }),


    // Differentially-private count release — the third leg of the
    // privacy family (suppression = q_k_anonymity, diversity =
    // q_l_diversity, perturbation = this): per-(segment, nation)
    // customer counts released through the two-sided geometric /
    // discrete-Laplace mechanism (Ghosh, Roughgarden & Sundararajan
    // 2009 — the utility-optimal ε-DP mechanism for sensitivity-1
    // counts). ε = ln 2 is chosen so the inverse-CDF is EXACT integer
    // arithmetic: with α = e^(−ε) = 1/2 the noise magnitude is the
    // geometric(1/2) tail ⌊log2(2^20/u)⌋ = (20·2^20 − log2Fx(u)) div
    // 2^20 over the integer-log2 table. The sampler is SEEDED by the
    // portable hash of the group key so every cell is deterministic
    // and oracle-replayable (the q_weighted_sample discipline — a
    // production release draws u from a CSPRNG; the sensitivity-1
    // count, inverse-CDF ladder and post-processing are the deployed
    // shape unchanged). Negative releases are kept, not clamped:
    // unbiasedness matters more than cosmetics when downstream sums
    // the cells. One partial/final agg + scalar arithmetic — scan
    // speed at any corpus size.
    "q_dp_counts" -> ((s, d) => {
      val S = graft.ext.LmScore.LogScale // 2^20
      val key = concat_ws("|",
        col("c_mktsegment"), col("c_nationkey").cast("string"))
      t(s, d, "customer")
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
        .withColumn("u", PortableHash.spread(
          PortableHash.h(concat(key, lit("|dp1")))) + lit(1L))
        .withColumn("sgn", when(PortableHash.spread(
            PortableHash.h(concat(key, lit("|dp2")))) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)))
        .withColumn("lgu", graft.ext.LmScore.log2FxCol(col("u")))
        .withColumn("mag", expr(s"(${20 * S} - lgu) div $S"))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n"),
          (col("sgn") * col("mag")).as("noise"),
          (col("n") + col("sgn") * col("mag")).as("released"),
          lit(0.6931).as("eps"))
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    }),


    // DP SUM release — the bounded-contribution half of the DP pair
    // (q_dp_counts is sensitivity-1 counting; real releases are sums
    // whose sensitivity must be ENGINEERED by clamping): per-segment
    // account-balance totals in integer cents, each customer's
    // contribution clamped to C = 5,000.00 (the clamp IS the
    // sensitivity bound — without it one whale makes the release
    // useless or non-private), then discrete-Laplace noise at scale
    // C: the same seeded geometric(1/2) ladder as q_dp_counts
    // multiplied by the sensitivity (noise ∝ C/ε with ε = ln 2 per
    // clamp unit). Emits clamped exact sum, the clamp-loss audit
    // column (how much the bound cut — the utility dial a release
    // tunes), noise and the released total. One aggregate + scalar
    // ladder, scan speed at any size.
    "q_dp_sum" -> ((s, d) => {
      val S = graft.ext.LmScore.LogScale
      val clampC = 500000L // cents
      val cents = expr("CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 " +
        "+ 0.5) AS BIGINT)")
      val key = concat_ws("|", col("c_mktsegment"))
      t(s, d, "customer")
        .select(col("c_mktsegment"),
          least(greatest(cents, lit(0L)), lit(clampC)).as("clamped"),
          cents.as("raw"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("clamped")).as("sum_clamped"),
          sum(col("raw") - col("clamped")).as("clamp_loss"))
        .withColumn("u", PortableHash.spread(
          PortableHash.h(concat(key, lit("|dps1")))) + lit(1L))
        .withColumn("sgn", when(PortableHash.spread(
            PortableHash.h(concat(key, lit("|dps2")))) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)))
        .withColumn("lgu", graft.ext.LmScore.log2FxCol(col("u")))
        .withColumn("mag", expr(s"(${20 * S} - lgu) div $S"))
        .select(col("c_mktsegment"), col("n"), col("sum_clamped"),
          col("clamp_loss"),
          (col("sgn") * col("mag") * lit(clampC)).as("noise"),
          (col("sum_clamped") + col("sgn") * col("mag") * lit(clampC))
            .as("released"),
          lit(0.6931).as("eps_per_unit"))
        .orderBy(col("c_mktsegment"))
    }),


    // DP TOP-K SELECTION — the third mechanism of the DP family
    // (perturbed counts, clamped sums, and now SELECTION): release
    // WHICH k groups are largest without releasing any true count
    // (report-noisy-max generalized to one-shot top-k: every
    // candidate's count gets an independent draw from the same
    // seeded geometric(1/2) ladder as q_dp_counts, the top-3 by
    // noisy count are published with their NOISY counts only — the
    // true n never leaves the aggregate). Candidates are disjoint
    // row partitions (each customer in one segment), so parallel
    // composition prices the whole selection at one ε = ln 2. Same
    // deterministic, oracle-replayable sampler discipline.
    "q_dp_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val S = graft.ext.LmScore.LogScale
      val key = concat_ws("|", col("c_mktsegment"))
      val noisy = t(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .withColumn("u", PortableHash.spread(
          PortableHash.h(concat(key, lit("|dpt1")))) + lit(1L))
        .withColumn("sgn", when(PortableHash.spread(
            PortableHash.h(concat(key, lit("|dpt2")))) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)))
        .withColumn("lgu", graft.ext.LmScore.log2FxCol(col("u")))
        .withColumn("mag", expr(s"(${20 * S} - lgu) div $S"))
        .withColumn("noisy_count",
          col("n") + col("sgn") * col("mag"))
      val w = Window.orderBy(col("noisy_count").desc,
        col("c_mktsegment"))
      noisy.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("c_mktsegment"), col("noisy_count"), col("rn"),
          lit(0.6931).as("eps"))
        .orderBy(col("rn"))
    }),


    // Privacy-budget LEDGER (the release discipline over the two DP
    // mechanisms): one row per release against the customer table,
    // carrying the cell count (measured from data, not asserted), the
    // engineered sensitivity, the per-release ε and the RUNNING
    // sequential-composition total. The composition facts it encodes:
    // WITHIN a release the group-by cells partition the rows, so
    // parallel composition prices the whole release at one ε = ln 2;
    // ACROSS releases the same rows are re-queried, so basic
    // sequential composition adds — the ledger's cum_eps_fx is the
    // number a data-protection officer signs off before the next
    // release ships. ε rides 10⁻⁴ fixed point (6931 = ln 2) so the
    // running sum is exact integer arithmetic. Two scalar
    // distinct-count aggregates + a 2-row window — free at any size.
    "q_dp_ledger" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cust = t(s, d, "customer")
      val r1 = cust.agg(countDistinct(col("c_mktsegment"),
          col("c_nationkey")).cast("long").as("n_cells"))
        .select(lit("dp_counts").as("release_id"),
          lit("customer").as("table_name"),
          lit("discrete_laplace").as("mechanism"),
          lit("parallel_within").as("cell_composition"),
          col("n_cells"), lit(1L).as("sensitivity"),
          lit(6931L).as("eps_fx"))
      val r2 = cust.agg(countDistinct(col("c_mktsegment"))
          .cast("long").as("n_cells"))
        .select(lit("dp_sum").as("release_id"),
          lit("customer").as("table_name"),
          lit("discrete_laplace").as("mechanism"),
          lit("parallel_within").as("cell_composition"),
          col("n_cells"), lit(500000L).as("sensitivity"),
          lit(6931L).as("eps_fx"))
      val r3 = cust.agg(countDistinct(col("c_mktsegment"))
          .cast("long").as("n_cells"))
        .select(lit("dp_topk").as("release_id"),
          lit("customer").as("table_name"),
          lit("noisy_topk").as("mechanism"),
          lit("parallel_within").as("cell_composition"),
          col("n_cells"), lit(1L).as("sensitivity"),
          lit(6931L).as("eps_fx"))
      val w = Window.orderBy(col("release_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      r1.unionByName(r2).unionByName(r3)
        .withColumn("cum_eps_fx", sum(col("eps_fx")).over(w))
        .withColumn("eps", Det.r4(col("eps_fx").cast("double") / 1e4))
        .withColumn("cum_eps",
          Det.r4(col("cum_eps_fx").cast("double") / 1e4))
        .orderBy(col("release_id"))
    }),


    // Right-to-erasure audit: cascade a customer delete list through
    // the star (customers → their orders → those orders' lineitems)
    // and report per-table before/deleted/after plus the
    // ORPHANS-AFTER count that proves referential closure — the
    // compliance artifact a deletion job must emit. Pure key
    // semi/anti joins: the delete list is broadcast-sized, fact
    // tables are touched once each, and nothing rescans to audit
    // (the orphan checks reuse the same deleted-key sets). At 100 TB
    // the delete list stays a broadcast and each cascade level is one
    // semi-join pass.
    "q_delete_propagation" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val delC = cust.where(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"))
      val delO = ord.join(broadcast(delC),
        col("o_custkey") === col("c_custkey"), "left_semi")
      val delOKeys = delO.select(col("o_orderkey"))
      val keptO = ord.join(broadcast(delC),
        col("o_custkey") === col("c_custkey"), "left_anti")
      val keptLi = li.join(delOKeys,
        li("l_orderkey") === delOKeys("o_orderkey"), "left_anti")
      def stats(name: String, before: DataFrame, deleted: DataFrame,
                orphans: DataFrame) =
        before.agg(count(lit(1)).as("n_before"))
          .crossJoin(deleted.agg(count(lit(1)).as("n_deleted")))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans_after")))
          .select(lit(name).as("table_name"), col("n_before"),
            col("n_deleted"),
            (col("n_before") - col("n_deleted")).as("n_after"),
            col("n_orphans_after"))
      val none = cust.limit(0)
      stats("customer", cust, delC, none)
        .unionByName(stats("orders", ord, delO,
          keptO.join(broadcast(delC),
            col("o_custkey") === col("c_custkey"), "left_semi")))
        .unionByName(stats("lineitem", li,
          li.join(delOKeys, li("l_orderkey") === delOKeys("o_orderkey"),
            "left_semi"),
          keptLi.join(delOKeys,
            keptLi("l_orderkey") === delOKeys("o_orderkey"), "left_semi")))
        .orderBy(col("table_name"))
    }),


    // Spearman rank correlation per return flag — the robust
    // (monotone-invariant) complement of q_column_corr's Pearson
    // matrix. Ties get average ranks kept EXACT as doubled integers
    // (2·rank + tie_count − 1: first+last of the tie run), so the
    // whole moment ledger is integer until one final scalar formula;
    // correlation is shift/scale-invariant, so doubling changes
    // nothing. Cross products ride DECIMAL(38,0) (n·Σxy overflows a
    // long at sf0.1's group sizes); one IEEE sqrt/divide r4'd at the
    // boundary. Two rank-window shuffles, one agg — no per-group
    // quantile probes, no double accumulations.
    "q_spearman_corr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, d, "lineitem").select(col("l_returnflag").as("g"),
        col("l_quantity").as("va"), col("l_extendedprice").as("vb"))
      def r2x(v: String) =
        lit(2L) * rank().over(Window.partitionBy(col("g")).orderBy(col(v))) +
          count(lit(1)).over(Window.partitionBy(col("g"), col(v))) - lit(1L)
      val ranked = li.select(col("g"), r2x("va").as("ra"), r2x("vb").as("rb"))
      val m = ranked.groupBy(col("g")).agg(count(lit(1)).as("n"),
        sum(col("ra")).as("sa"), sum(col("rb")).as("sb"),
        sum(col("ra") * col("ra")).as("saa"),
        sum(col("rb") * col("rb")).as("sbb"),
        sum(col("ra") * col("rb")).as("sab"))
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      m.select(col("g"), col("n"), Det.r4(
          (d38(col("n")) * d38(col("sab")) - d38(col("sa")) * d38(col("sb")))
            .cast("double") /
          sqrt((d38(col("n")) * d38(col("saa")) -
                d38(col("sa")) * d38(col("sa"))).cast("double") *
               (d38(col("n")) * d38(col("sbb")) -
                d38(col("sb")) * d38(col("sb"))).cast("double")))
          .as("spearman"))
        .orderBy(col("g"))
    }),


    // Equi-depth (quantile) binning of order totals: 8 near-equal-
    // population bins from the 7 exact octile cut points (k/8 is
    // exact binary, so index = (n·k) div 8 replays identically — the
    // q_quantile_drift discipline), cuts BROADCAST as value
    // thresholds so bucketing is a per-row comparison and every stage
    // stays parallel (never a global ntile window). Per-bin
    // depth/min/max/sum read-out in exact cents — the feature-binning
    // artifact an ML pipeline freezes next to the model.
    "q_equidepth_bins" -> ((s, d) => {
      val oc = t(s, d, "orders")
        .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .as("c"))
      // All 7 octile cut points from ONE distributed sort (batched
      // rank extraction), not 7 separate sort jobs.
      val cuts = graft.core.Quantiles
        .valuesAtFractionsMemo(oc, "c", (1 to 7).map(_ / 8.0), s"eqd:$d")
        .map(_.toLong)
      val bin = cuts.map(cut =>
        when(col("c") >= lit(cut), 1L).otherwise(0L)).reduce(_ + _)
      oc.select(col("c"), bin.as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_rows"), min(col("c")).as("min_c"),
          max(col("c")).as("max_c"), sum(col("c")).as("sum_c"))
        .orderBy(col("bin"))
    }),


    // Trimmed mean per event_type (drop the bottom/top decile by exact
    // rank, average the middle 80%) — the robust location estimate
    // that survives the value column's outlier tail. Ranks come from
    // ONE per-group window over the unique (value_c, event_id) tie
    // order, so the kept set is identical in both engines; values snap
    // to integer cents before any sum (order-independent), and the
    // mean is a single IEEE division r4'd at the boundary. One shuffle
    // (the window), one agg — no per-group quantile probes.
    "q_trimmed_mean" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value_c"), col("event_id"))
      val wn = Window.partitionBy(col("event_type"))
      val ev = t(s, d, "events")
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("value_c"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
      ev.where(col("rn") > expr("n div 10") &&
          col("rn") <= col("n") - expr("n div 10"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          Det.r4(sum(col("value_c")).cast("double") /
            (count(lit(1)) * lit(100.0))).as("trimmed_mean"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q_abtest_lift" -> {
      val gate = graft.core.PortableHash.spreadSql(
        graft.core.PortableHash.hSql("CAST(user_id AS VARCHAR)"))
      val rateA = "CAST(conv_a AS DOUBLE) / n_a"
      val rateB = "CAST(conv_b AS DOUBLE) / n_b"
      val p = "CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)"
      val den = s"sqrt(($p) * (1.0 - ($p)) * (1.0 / n_a + 1.0 / n_b))"
      s"""WITH users AS (
         |  SELECT user_id,
         |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS converted
         |  FROM events GROUP BY 1),
         |armed AS (SELECT *, ($gate) % 2 AS arm FROM users),
         |arms AS (
         |  SELECT arm, count(*) AS n,
         |         CAST(sum(converted) AS BIGINT) AS conv
         |  FROM armed GROUP BY 1),
         |r AS (
         |  SELECT a.n AS n_a, a.conv AS conv_a,
         |         b.n AS n_b, b.conv AS conv_b
         |  FROM (SELECT * FROM arms WHERE arm = 0) a
         |  CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b)
         |SELECT n_a, conv_a, n_b, conv_b,
         |       ${r4(rateA)} AS rate_a,
         |       ${r4(rateB)} AS rate_b,
         |       ${r4(s"($rateB) - ($rateA)")} AS lift,
         |       ${r4(s"CASE WHEN $den = 0.0 THEN 0.0 " +
              s"ELSE (($rateB) - ($rateA)) / ($den) END")} AS z_stat
         |FROM r""".stripMargin
    },


    "q_theilsen_slope" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type, a.day AS di, b.day AS dj,
        |         CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
        |           AS slope
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND a.day < b.day),
        |ranked AS (
        |  SELECT event_type, slope,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY slope, di, dj) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n_pairs
        |  FROM pairs)
        |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
        |       floor(slope*10000 + 0.5)/10000.0 AS ts_slope
        |FROM ranked WHERE rn = (n_pairs + 1) // 2
        |ORDER BY event_type""".stripMargin,


    "q_trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |d0 AS (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1),
        |xy AS (
        |  SELECT daily.event_type, daily.day - d0.d0 AS x, y
        |  FROM daily JOIN d0 USING (event_type)),
        |m AS (
        |  SELECT event_type, count(*) AS n_days,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x*y) AS BIGINT) AS sxy,
        |         CAST(sum(x*x) AS BIGINT) AS sxx
        |  FROM xy GROUP BY 1)
        |SELECT event_type, n_days,
        |       floor((CAST(n_days*sxy - sx*sy AS DOUBLE)
        |              / CAST(n_days*sxx - sx*sx AS DOUBLE))*10000
        |             + 0.5)/10000.0 AS slope,
        |       floor((CAST(sy*sxx - sx*sxy AS DOUBLE)
        |              / CAST(n_days*sxx - sx*sx AS DOUBLE))*10000
        |             + 0.5)/10000.0 AS intercept
        |FROM m ORDER BY event_type""".stripMargin,


    "q_gini_value" ->
      """WITH totals AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(floor(value*100.0 + 0.5) AS BIGINT))
        |              AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |ranked AS (
        |  SELECT v, row_number() OVER (ORDER BY v, user_id) AS rk
        |  FROM totals)
        |SELECT count(*) AS n_users, CAST(sum(v) AS BIGINT) AS total_c,
        |       floor(((2.0 * CAST(sum(CAST(rk AS HUGEINT) * v) AS DOUBLE))
        |              / (CAST(count(*) AS DOUBLE)
        |                 * CAST(sum(v) AS DOUBLE))
        |              - CAST(count(*) + 1 AS DOUBLE)
        |                / CAST(count(*) AS DOUBLE))*10000 + 0.5)/10000.0
        |         AS gini
        |FROM ranked""".stripMargin,


    "q_negative_sampling" -> {
      import graft.core.PortableHash
      val probe = PortableHash.spreadSql(PortableHash.hSql(
        "CAST(user_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)"))
      s"""WITH ${graft.io.Sources.ratingsSql},
         |inter AS (SELECT DISTINCT user_id, item_id FROM ratings),
         |dict AS (
         |  SELECT item_id,
         |         CAST(row_number() OVER (ORDER BY item_id) - 1
         |              AS INTEGER) AS idx
         |  FROM (SELECT DISTINCT item_id FROM inter)),
         |nd AS (SELECT count(*) AS n FROM dict),
         |probes AS (
         |  SELECT user_id, k
         |  FROM (SELECT DISTINCT user_id FROM inter),
         |       unnest([0, 1, 2]) AS t(k)),
         |cand AS (
         |  SELECT p.user_id, CAST(p.k AS BIGINT) AS k, d.item_id
         |  FROM probes p
         |  JOIN dict d
         |    ON d.idx = CAST(($probe) % (SELECT n FROM nd) AS INTEGER))
         |SELECT c.user_id, c.k, c.item_id
         |FROM cand c
         |LEFT JOIN inter i
         |  ON i.user_id = c.user_id AND i.item_id = c.item_id
         |WHERE i.item_id IS NULL
         |ORDER BY c.user_id, c.k""".stripMargin
    },


    // Association rules: the same basket self-join with DuckDB's //
    // integer division twinning Spark's div.
    "q_assoc_rules" ->
      """WITH allitems AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |okb AS (
        |  SELECT l_orderkey FROM allitems
        |  GROUP BY 1 HAVING count(*) <= 50),
        |items AS (
        |  SELECT a.l_orderkey, a.l_partkey
        |  FROM allitems a JOIN okb ON a.l_orderkey = okb.l_orderkey),
        |tot AS (
        |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
        |ca AS (
        |  SELECT l_partkey, count(*) AS c_item FROM items GROUP BY 1),
        |pr AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS c_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pr.p1, pr.p2, pr.c_ab,
        |       ca1.c_item AS c_a, ca2.c_item AS c_b, tot.n_orders,
        |       pr.c_ab * 10000 // ca1.c_item AS conf_x10000,
        |       (pr.c_ab * tot.n_orders * 10000)
        |         // (ca1.c_item * ca2.c_item) AS lift_x10000
        |FROM pr, tot
        |JOIN ca ca1 ON pr.p1 = ca1.l_partkey
        |JOIN ca ca2 ON pr.p2 = ca2.l_partkey
        |ORDER BY pr.c_ab DESC, pr.p1, pr.p2""".stripMargin,


    // Quartile thresholds replayed as order statistics: the value at
    // 0-based rank min(⌊f·n⌋, n−1) — 0.25/0.5/0.75 are exact binary,
    // so ⌊f·n⌋ = (n·k)//4 in integer arithmetic on both engines.
    "q_rfm_segments" -> {
      def thrCte(src: String, ranked: String, out: String) =
        s"""$ranked AS (
           |  SELECT $src AS v,
           |         row_number() OVER (ORDER BY $src) - 1 AS rk FROM m),
           |$out AS (SELECT
           |  ${(1 to 3).map(k =>
              s"max(CASE WHEN rk = least((SELECT (n*$k)//4 FROM n), " +
                s"(SELECT n-1 FROM n)) THEN v END) AS t$k")
              .mkString(",\n  ")}
           |  FROM $ranked)""".stripMargin
      def bucket(c: String, t: String) =
        s"((CASE WHEN $c >= $t.t1 THEN 1 ELSE 0 END) + " +
          s"(CASE WHEN $c >= $t.t2 THEN 1 ELSE 0 END) + " +
          s"(CASE WHEN $c >= $t.t3 THEN 1 ELSE 0 END))"
      s"""WITH per AS (
         |  SELECT o_custkey, max(epoch_ms(o_orderdate)) AS last_ms,
         |         count(*) AS freq,
         |         CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
         |              AS BIGINT) AS mon_c
         |  FROM orders GROUP BY 1),
         |g AS (SELECT max(last_ms) AS gmax FROM per),
         |m AS (SELECT p.*, (g.gmax - p.last_ms) // 86400000 AS recency_days
         |      FROM per p, g),
         |n AS (SELECT count(*) AS n FROM m),
         |${thrCte("recency_days", "rr", "tr")},
         |${thrCte("freq", "rf", "tf")},
         |${thrCte("mon_c", "rm", "tm")},
         |scored AS (
         |  SELECT m.mon_c,
         |         CAST(4 - ${bucket("recency_days", "tr")} AS BIGINT)
         |           AS r_score,
         |         CAST(1 + ${bucket("freq", "tf")} AS BIGINT) AS f_score,
         |         CAST(1 + ${bucket("mon_c", "tm")} AS BIGINT) AS m_score
         |  FROM m, tr, tf, tm)
         |SELECT r_score, f_score, m_score, count(*) AS n_customers,
         |       CAST(sum(mon_c) AS BIGINT) AS mon_c_sum
         |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },


    // Margins cast to BIGINT (DuckDB sum -> HUGEINT); each expected
    // value and cell term then replays the engine's exact IEEE ops,
    // and the fsum4 twin makes the 35-term sum order-independent.
    "q_chisq_independence" -> {
      val term = "(o - r*c/n)*(o - r*c/n)/(r*c/n)"
      s"""WITH obs AS (
         |  SELECT event_type AS et, (epoch_ms(ts) // 86400000) % 7 AS dow,
         |         count(*) AS o
         |  FROM events GROUP BY 1, 2),
         |rt AS (SELECT et, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
         |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
         |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
         |cells AS (
         |  SELECT o, r, c, n, $term AS term
         |  FROM obs JOIN rt USING (et) JOIN ct USING (dow), nn),
         |agg AS (
         |  SELECT count(*) AS n_cells,
         |         (SELECT count(DISTINCT et) FROM obs) AS net,
         |         (SELECT count(DISTINCT dow) FROM obs) AS ndow,
         |         ${Oracle.fsum4("term")} AS chi2,
         |         max(n) AS n
         |  FROM cells)
         |SELECT n_cells, CAST((net - 1) * (ndow - 1) AS BIGINT) AS dof, chi2,
         |       ${Oracle.r4("sqrt(chi2 / (n * least(net - 1, ndow - 1)))")}
         |         AS cramers_v
         |FROM agg""".stripMargin
    },


    // k-anonymity: the QI rollup and the k-threshold replayed
    // directly.
    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |f AS (
        |  SELECT c_mktsegment, c_nationkey, n,
        |         CASE WHEN n >= 8 THEN CAST(1 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS released
        |  FROM g)
        |SELECT c_mktsegment, c_nationkey, n, released,
        |       n * released AS released_rows,
        |       n * (1 - released) AS suppressed_rows
        |FROM f ORDER BY c_mktsegment, c_nationkey""".stripMargin,


    // l-diversity: the distinct-band count per quasi-identifier
    // group; the band is the same IEEE floor both engines compute.
    "q_l_diversity" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS n,
        |         CAST(count(DISTINCT CAST(floor(
        |           CAST(c_acctbal AS DOUBLE) / 2000.0) AS BIGINT))
        |           AS BIGINT) AS n_bands
        |  FROM customer GROUP BY 1, 2),
        |f AS (
        |  SELECT c_mktsegment, c_nationkey, n, n_bands,
        |         CASE WHEN n_bands >= 3 THEN CAST(1 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS l_diverse
        |  FROM g)
        |SELECT c_mktsegment, c_nationkey, n, n_bands, l_diverse,
        |       n * l_diverse AS released_rows,
        |       n * (1 - l_diverse) AS suppressed_rows
        |FROM f ORDER BY c_mktsegment, c_nationkey""".stripMargin,


    // DP release replayed: the same seeded-hash inverse-CDF ladder
    // in integer arithmetic (u from the spread hash, magnitude off
    // the shared log2 table, sign off a second hash) — a drifting
    // noise formula moves a cell.
    "q_dp_counts" -> {
      val S = graft.ext.LmScore.LogScale
      val k1 = "(c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR)" +
        " || '|dp1')"
      val k2 = "(c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR)" +
        " || '|dp2')"
      s"""WITH g AS (
         |  SELECT c_mktsegment, c_nationkey,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM customer GROUP BY 1, 2),
         |x AS (
         |  SELECT c_mktsegment, c_nationkey, n,
         |         ${PortableHash.spreadSql(PortableHash.hSql(k1))} + 1
         |           AS u,
         |         CASE WHEN (${PortableHash.spreadSql(
                    PortableHash.hSql(k2))}) % 2 = 0
         |              THEN CAST(1 AS BIGINT)
         |              ELSE CAST(-1 AS BIGINT) END AS sgn
         |  FROM g),
         |z AS (
         |  SELECT c_mktsegment, c_nationkey, n, sgn,
         |         (${20 * S} - ${graft.ext.LmScore.log2FxSql("u")})
         |           // $S AS mag
         |  FROM x)
         |SELECT c_mktsegment, c_nationkey, n,
         |       CAST(sgn * mag AS BIGINT) AS noise,
         |       CAST(n + sgn * mag AS BIGINT) AS released,
         |       CAST(0.6931 AS DOUBLE) AS eps
         |FROM z ORDER BY c_mktsegment, c_nationkey""".stripMargin
    },


    // DP sum replayed: the same cents snap, [0, C] clamp, seeded
    // ladder and C-scaled noise.
    "q_dp_sum" -> {
      val S = graft.ext.LmScore.LogScale
      val c = 500000L
      val cents = "CAST(floor(CAST(c_acctbal AS DOUBLE) * 100 + 0.5)" +
        " AS BIGINT)"
      val k1 = "(c_mktsegment || '|dps1')"
      val k2 = "(c_mktsegment || '|dps2')"
      s"""WITH rows0 AS (
         |  SELECT c_mktsegment,
         |         least(greatest($cents, 0), $c) AS clamped,
         |         $cents AS raw
         |  FROM customer),
         |g AS (
         |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(clamped) AS BIGINT) AS sum_clamped,
         |         CAST(sum(raw - clamped) AS BIGINT) AS clamp_loss
         |  FROM rows0 GROUP BY 1),
         |x AS (
         |  SELECT g.*,
         |         ${PortableHash.spreadSql(PortableHash.hSql(k1))} + 1
         |           AS u,
         |         CASE WHEN (${PortableHash.spreadSql(
                    PortableHash.hSql(k2))}) % 2 = 0
         |              THEN CAST(1 AS BIGINT)
         |              ELSE CAST(-1 AS BIGINT) END AS sgn
         |  FROM g),
         |z AS (
         |  SELECT x.*,
         |         (${20 * S} - ${graft.ext.LmScore.log2FxSql("u")})
         |           // $S AS mag
         |  FROM x)
         |SELECT c_mktsegment, n, sum_clamped, clamp_loss,
         |       CAST(sgn * mag * $c AS BIGINT) AS noise,
         |       CAST(sum_clamped + sgn * mag * $c AS BIGINT)
         |         AS released,
         |       CAST(0.6931 AS DOUBLE) AS eps_per_unit
         |FROM z ORDER BY c_mktsegment""".stripMargin
    },


    // Noisy top-k replayed: same seeded ladder per candidate, rank by
    // (noisy DESC, segment), top-3 published with noisy counts only.
    "q_dp_topk" -> {
      val S = graft.ext.LmScore.LogScale
      val k1 = "(c_mktsegment || '|dpt1')"
      val k2 = "(c_mktsegment || '|dpt2')"
      s"""WITH g AS (
         |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
         |  FROM customer GROUP BY 1),
         |x AS (
         |  SELECT c_mktsegment, n,
         |         ${PortableHash.spreadSql(PortableHash.hSql(k1))} + 1
         |           AS u,
         |         CASE WHEN (${PortableHash.spreadSql(
                    PortableHash.hSql(k2))}) % 2 = 0
         |              THEN CAST(1 AS BIGINT)
         |              ELSE CAST(-1 AS BIGINT) END AS sgn
         |  FROM g),
         |z AS (
         |  SELECT c_mktsegment,
         |         CAST(n + sgn * ((${20 * S} -
         |           ${graft.ext.LmScore.log2FxSql("u")}) // $S)
         |           AS BIGINT) AS noisy_count
         |  FROM x),
         |rk AS (
         |  SELECT c_mktsegment, noisy_count,
         |         CAST(row_number() OVER (ORDER BY noisy_count DESC,
         |           c_mktsegment) AS BIGINT) AS rn
         |  FROM z)
         |SELECT c_mktsegment, noisy_count, rn,
         |       CAST(0.6931 AS DOUBLE) AS eps
         |FROM rk WHERE rn <= 3 ORDER BY rn""".stripMargin
    },


    // Ledger replayed: measured cell counts, fixed sensitivities and
    // ε units, running sequential-composition sum over release order.
    "q_dp_ledger" ->
      s"""WITH rel AS (
        |  SELECT 'dp_counts' AS release_id, 'customer' AS table_name,
        |         'discrete_laplace' AS mechanism,
        |         'parallel_within' AS cell_composition,
        |         (SELECT CAST(count(*) AS BIGINT) FROM (
        |            SELECT DISTINCT c_mktsegment, c_nationkey
        |            FROM customer)) AS n_cells,
        |         CAST(1 AS BIGINT) AS sensitivity,
        |         CAST(6931 AS BIGINT) AS eps_fx
        |  UNION ALL
        |  SELECT 'dp_sum', 'customer', 'discrete_laplace',
        |         'parallel_within',
        |         (SELECT CAST(count(DISTINCT c_mktsegment) AS BIGINT)
        |          FROM customer),
        |         CAST(500000 AS BIGINT), CAST(6931 AS BIGINT)
        |  UNION ALL
        |  SELECT 'dp_topk', 'customer', 'noisy_topk',
        |         'parallel_within',
        |         (SELECT CAST(count(DISTINCT c_mktsegment) AS BIGINT)
        |          FROM customer),
        |         CAST(1 AS BIGINT), CAST(6931 AS BIGINT)),
        |cum AS (
        |  SELECT *, CAST(sum(eps_fx) OVER (ORDER BY release_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_eps_fx
        |  FROM rel)
        |SELECT release_id, table_name, mechanism, cell_composition,
        |       n_cells, sensitivity, eps_fx, cum_eps_fx,
        |       ${r4("CAST(eps_fx AS DOUBLE) / 1e4")} AS eps,
        |       ${r4("CAST(cum_eps_fx AS DOUBLE) / 1e4")} AS cum_eps
        |FROM cum ORDER BY release_id""".stripMargin,


    // The cascade replayed as plain counts; orphans-after are 0 by
    // construction on both sides — the audit's point is that the
    // ENGINE must prove it, not assume it.
    "q_delete_propagation" ->
      """WITH delc AS (SELECT c_custkey FROM customer
        |              WHERE c_custkey % 50 = 0),
        |delo AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT c_custkey FROM delc))
        |SELECT 'customer' AS table_name,
        |       (SELECT count(*) FROM customer) AS n_before,
        |       (SELECT count(*) FROM delc) AS n_deleted,
        |       (SELECT count(*) FROM customer)
        |         - (SELECT count(*) FROM delc) AS n_after,
        |       CAST(0 AS BIGINT) AS n_orphans_after
        |UNION ALL
        |SELECT 'lineitem',
        |       (SELECT count(*) FROM lineitem),
        |       (SELECT count(*) FROM lineitem
        |        WHERE l_orderkey IN (SELECT o_orderkey FROM delo)),
        |       (SELECT count(*) FROM lineitem)
        |         - (SELECT count(*) FROM lineitem
        |            WHERE l_orderkey IN (SELECT o_orderkey FROM delo)),
        |       (SELECT count(*) FROM lineitem
        |        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM delo)
        |          AND l_orderkey IN (SELECT o_orderkey FROM delo))
        |UNION ALL
        |SELECT 'orders',
        |       (SELECT count(*) FROM orders),
        |       (SELECT count(*) FROM delo),
        |       (SELECT count(*) FROM orders)
        |         - (SELECT count(*) FROM delo),
        |       (SELECT count(*) FROM orders
        |        WHERE o_custkey NOT IN (SELECT c_custkey FROM delc)
        |          AND o_custkey IN (SELECT c_custkey FROM delc))
        |ORDER BY table_name""".stripMargin,


    // Doubled average ranks are exact integers; HUGEINT is DuckDB's
    // DECIMAL(38,0) stand-in for the cross products; the final
    // formula is the same fixed IEEE op sequence.
    "q_spearman_corr" ->
      """WITH li AS (
        |  SELECT l_returnflag AS g, l_quantity AS va, l_extendedprice AS vb
        |  FROM lineitem),
        |r AS (
        |  SELECT g,
        |         2*rank() OVER (PARTITION BY g ORDER BY va)
        |           + count(*) OVER (PARTITION BY g, va) - 1 AS ra,
        |         2*rank() OVER (PARTITION BY g ORDER BY vb)
        |           + count(*) OVER (PARTITION BY g, vb) - 1 AS rb
        |  FROM li),
        |m AS (
        |  SELECT g, count(*) AS n,
        |         CAST(sum(ra) AS HUGEINT) AS sa,
        |         CAST(sum(rb) AS HUGEINT) AS sb,
        |         CAST(sum(ra*ra) AS HUGEINT) AS saa,
        |         CAST(sum(rb*rb) AS HUGEINT) AS sbb,
        |         CAST(sum(ra*rb) AS HUGEINT) AS sab
        |  FROM r GROUP BY 1)
        |SELECT g, n,
        |       floor((CAST(n*sab - sa*sb AS DOUBLE) /
        |              sqrt(CAST(n*saa - sa*sa AS DOUBLE)
        |                   * CAST(n*sbb - sb*sb AS DOUBLE)))*10000 + 0.5)
        |         /10000.0 AS spearman
        |FROM m ORDER BY g""".stripMargin,


    // Octile cut points by exact rank ((n·k) div 8 into the sorted
    // cents), then the same >=-threshold bucketing.
    "q_equidepth_bins" ->
      """WITH oc AS (
        |  SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |nn AS (SELECT count(*) AS n FROM oc),
        |ranked AS (
        |  SELECT c, row_number() OVER (ORDER BY c) - 1 AS idx FROM oc),
        |cuts AS (
        |  SELECT k, (SELECT c FROM ranked, nn WHERE idx = (n*k) // 8) AS cut
        |  FROM (SELECT unnest(generate_series(1, 7)) AS k)),
        |b AS (
        |  SELECT c, (SELECT count(*) FROM cuts WHERE c >= cut) AS bin
        |  FROM oc)
        |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_rows,
        |       min(c) AS min_c, max(c) AS max_c,
        |       CAST(sum(c) AS BIGINT) AS sum_c
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,


    "q_trimmed_mean" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |         CAST(floor(value*100 + 0.5) AS BIGINT) AS value_c
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, value_c,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value_c, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev)
        |SELECT event_type, count(*) AS n_kept,
        |       floor((CAST(sum(value_c) AS DOUBLE) / (count(*) * 100.0))
        |             *10000 + 0.5)/10000.0 AS trimmed_mean
        |FROM ranked
        |WHERE rn > n // 10 AND rn <= n - n // 10
        |GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
