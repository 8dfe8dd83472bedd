package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, PortableHash}
import graft.io.Sources

/** Relational breadth queries (SURVEY.md §2.3): scans, aggregations,
  * joins, windows, sorts, set ops, scalar function families. These are
  * capabilities Catalyst gives for free once declared; the engine's job
  * is to declare them so pushdown/pruning/codegen all fire.
  */
object RelQueries {
  import Oracle._

  private[rel] def t(s: SparkSession, d: String, n: String) = Sources.table(s, d, n)

  /** q_map_funcs body, factored out so the spec can feed it a SPARSE
    * status distribution: the fixtures happen to carry all three
    * statuses under every priority, which would mask an element_at
    * that throws on a missing key (see the query's comment). */
  private[graft] def mapFuncs(orders: DataFrame): DataFrame = {
    val counts = orders
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("o_orderpriority"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("o_orderstatus"), col("cnt"))))).as("m"))
      .select(col("o_orderpriority"),
        size(col("m")).cast("long").as("n_statuses"),
        concat_ws(",", map_keys(col("m"))).as("statuses"),
        coalesce(try_element_at(col("m"), lit("F")), lit(0L)).as("n_f"),
        coalesce(try_element_at(col("m"), lit("O")), lit(0L)).as("n_o"),
        coalesce(try_element_at(col("m"), lit("P")), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))
  }

  /** 2-D skyline core (q_skyline body), factored out so the spec can
    * plant adversarial point sets: co-located duplicates (neither
    * strictly dominates → both survive), same-size cheaper points,
    * and same-price smaller-size points. Input columns
    * (p_partkey, p_size, cents); minimizes both axes. */
  private[graft] def skyline2d(p: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySize = p.groupBy(col("p_size"))
      .agg(min(col("cents")).as("min_cents"))
    val w = Window.orderBy(col("p_size"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = bySize
      .withColumn("m1", min(col("min_cents")).over(w))
      .where(col("m1").isNull || col("m1") > col("min_cents"))
      .select(col("p_size"), col("min_cents").as("cents"))
    p.join(broadcast(sky), Seq("p_size", "cents"))
      .select(col("p_partkey"), col("p_size"), col("cents"))
      .orderBy(col("p_size"), col("p_partkey"))
  }
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Scan + filter + project: predicate and column pruning reach parquet.
    // ORDER BY totalized over ALL output columns (r16): the synthetic
    // lineitem duplicates (l_orderkey, l_linenumber) heavily (~20% of
    // rows), so the old 2-key sort left tie order to input file order —
    // identical on both engines only while the scan read ONE file in
    // ONE split. Any layout or scheduling change breaks that silently;
    // the full-column sort is deterministic by content.
    "q_scan_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))),


    // TPC-H-Q1-style pricing summary: hash agg with partial/final split.
    "q_agg_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          Det.fsum2(col("l_extendedprice")).as("sum_base_price"),
          Det.fsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"),
          Det.r4(col("sum_qty") / col("count_order")).as("avg_qty"),
          Det.r4(col("sum_base_price") / col("count_order")).as("avg_price"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),


    // Grouping sets: rollup over customer ⋈ nation.
    "q_agg_rollup" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          Det.fsum2(col("c_acctbal")).as("sum_acctbal"))
        .select(coalesce(col("n_name"), lit("(all)")).as("nation"),
          coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          col("n_customers"), col("sum_acctbal"))
        .orderBy(col("nation"), col("segment"))
    }),


    // Exact distinct aggregation.
    "q_distinct_users" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("o_custkey")).as("n_users"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),


    // Star join through broadcast dims: revenue by region.
    "q_join_broadcast_dims" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      val r = t(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(Det.fsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"))
    }),


    // Semi/anti joins: customers with and without orders.
    "q_join_semi_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
      val withO = c.join(o, Seq("c_custkey"), "left_semi")
        .select(lit("with_orders").as("kind"), col("c_custkey"))
      val noO = c.join(o, Seq("c_custkey"), "left_anti")
        .select(lit("without_orders").as("kind"), col("c_custkey"))
      withO.unionAll(noO).orderBy(col("kind"), col("c_custkey"))
    }),


    // Full outer join: daily click vs purchase activity per user —
    // at the (user, day) grain both one-sided populations are real
    // (~40% of rows each at sf0.01). USING-column join coalesces the
    // keys; the side indicator + zero-filled counts exercise the
    // null semantics outer joins exist for. Both inputs collapse to
    // per-(user, day) partials BEFORE the join, so the shuffled
    // volume is the aggregate, not the event stream; full outer
    // cannot broadcast by definition — a shuffle join on the join
    // keys is the correct 100 TB plan.
    "q_join_outer" -> ((s, d) => {
      val ev = t(s, d, "events")
      def per(typ: String, cnt: String) =
        ev.where(col("event_type") === typ)
          .groupBy(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as(cnt))
      per("click", "n_clicks")
        .join(per("purchase", "n_buys"), Seq("user_id", "day"), "full_outer")
        .select(col("user_id"), col("day"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_buys"), lit(0L)).as("n_buys"),
          when(col("n_clicks").isNull, lit("purchase_only"))
            .when(col("n_buys").isNull, lit("click_only"))
            .otherwise(lit("both")).as("side"))
        .orderBy(col("user_id"), col("day"))
    }),


    // Ranking windows: rank / dense_rank / ntile within nation.
    "q_rank_dense_ntile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("c_nationkey"), col("rnk"), col("c_custkey"))
    }),


    // Analytic frame: running total per customer. The summand is
    // snapped to exact cents so the prefix sums are order-independent
    // integers — engines may associate window sums differently.
    "q_window_running" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).over(w)
            / lit(100.0)).as("running_total"))
        .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
    }),


    // Analytic window functions: lag/lead/first/last/nth. Nullable
    // analytic results are coalesced — Spark sorts NULLS FIRST,
    // DuckDB NULLS LAST, so nulls must never reach the output.
    "q_window_analytics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"),
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)).as("prev_price"),
          coalesce(lead(col("o_totalprice"), 1).over(w), lit(0.0)).as("next_price"),
          first_value(col("o_totalprice")).over(wRun).as("first_price"),
          last_value(col("o_totalprice")).over(wAll).as("last_price"),
          coalesce(nth_value(col("o_totalprice"), 2).over(wAll), lit(0.0))
            .as("second_price"))
        .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
    }),


    // RANGE frame: 30-day moving revenue per customer over portable
    // epoch-day integers (exact-cents summands).
    "q_window_range" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-30, Window.currentRow)
      t(s, d, "orders")
        // o_orderdate is TIMESTAMP_NTZ in parquet; cast through
        // session-UTC timestamp so epoch math matches DuckDB's naive
        // epoch_ms
        .withColumn("day",
          expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
        .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("day"),
          (sum(col("cents")).over(w) / lit(100.0)).as("moving_30d"))
        .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
    }),


    // TPC-H Q5 shape (local supplier volume): the 6-way star join
    // with the correlated twist — supplier and customer must share a
    // nation — that forces a real join-order decision. Plan the star
    // the way a 100 TB run must: region/nation/supplier/customer ride
    // explicit broadcast()s (the only corpus-sized exchange is
    // lineitem⋈orders on orderkey), the region filter prunes BEFORE
    // the broadcast, and revenue is summed in exact cents (floor of
    // the IEEE product — identical bits on both engines, vs a
    // double-sum whose order neither engine pins).
    "q_local_supplier_volume" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
        .withColumn("day",
          expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
        .where(col("day") >= Q5StartDay && col("day") < Q5StartDay + 365)
        .select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val su = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n = t(s, d, "nation")
      val r = t(s, d, "region").where(col("r_name") === "ASIA")
      val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(100.0) + lit(0.5)).cast("long")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey")
          && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents).as("revenue_cents"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),


    // Point-in-time-correct training-set assembly — the leakage-safe
    // feature/label join every supervised pipeline over event data
    // needs: features aggregate ONLY orders strictly before the
    // cutoff day (one partial/final agg over the past slice), the
    // label is existence of an order in the [cutoff, cutoff+90d)
    // horizon (a distinct key set), and the two meet in one
    // key-partitioned left join — no row can leak across the cutoff
    // because the slices are disjoint BY PLAN, not by discipline.
    // Money stays exact cents; dates ride the portable epoch-day
    // integer (the q_window_range idiom).
    "q_pit_training_set" -> ((s, d) => {
      val o = t(s, d, "orders")
        .withColumn("day",
          expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
        .withColumn("cents",
          floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      val past = o.where(col("day") < PitCutDay)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders_past"),
          sum(col("cents")).as("cents_past"),
          max(col("day")).as("last_day"))
        .withColumn("recency_days", lit(PitCutDay) - col("last_day"))
      val fut = o
        .where(col("day") >= PitCutDay &&
          col("day") < PitCutDay + PitHorizonDays)
        .select(col("o_custkey")).distinct()
        .withColumn("lbl", lit(1L))
      past.join(fut, Seq("o_custkey"), "left")
        .select(col("o_custkey").as("custkey"), col("n_orders_past"),
          col("cents_past"), col("recency_days"),
          coalesce(col("lbl"), lit(0L)).as("label"))
        .orderBy(col("custkey"))
    }),


    // Column-correlation profile: the 4×4 numeric Pearson matrix over
    // lineitem (quantity, price, discount, tax) in ONE scan — the
    // feature-redundancy / optimizer-stats read-out. All 15 moment
    // sums (4 sums, 4 squares, 6 cross products, 1 count) ride a
    // single partial/final aggregate over exact fixed-point integers
    // accumulated in DECIMAL(38,0) (cents² × 10⁸ rows passes 2^63 —
    // the pairMomentsDec envelope), cast to DOUBLE only inside the
    // final 6-row correlation projection of the one aggregate row.
    "q_column_corr" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        floor(col("l_quantity") + 0.5).cast("long").as("cq"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cp"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("cd"),
        floor(col("l_tax") * 100 + 0.5).cast("long").as("ct"))
      val cs = Seq("cq", "cp", "cd", "ct")
      def d19(c: String) = col(c).cast("decimal(19,0)")
      val pairs = for { i <- cs.indices; j <- i + 1 until cs.length }
        yield (cs(i), cs(j))
      val aggs = count(lit(1)).cast("double").as("n") +:
        (cs.map(c => sum(d19(c)).cast("double").as(s"s_$c")) ++
          cs.map(c => sum(d19(c) * d19(c)).cast("double").as(s"ss_$c")) ++
          pairs.map { case (a, b) =>
            sum(d19(a) * d19(b)).cast("double").as(s"sp_${a}_$b") })
      val m = li.agg(aggs.head, aggs.tail: _*)
      pairs.map { case (a, b) =>
        m.select(lit(s"${a}_$b").as("pair"),
          col("n").as("nd"), col(s"sp_${a}_$b").as("sxyd"),
          col(s"s_$a").as("sxd"), col(s"s_$b").as("syd"),
          col(s"ss_$a").as("sxxd"), col(s"ss_$b").as("syyd"))
      }.reduce(_ unionByName _)
        .select(col("pair"), Det.r4(graft.core.Similarity.correlation(
          col("nd"), col("sxyd"), col("sxd"), col("syd"),
          col("sxxd"), col("syyd"))).as("corr"))
        .orderBy(col("pair"))
    }),


    // CUBE grouping sets with grouping() indicators.
    "q_agg_cube" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Det.fsum2(col("o_totalprice")).as("sum_price"),
          grouping(col("c_mktsegment")).cast("long").as("g_seg"),
          grouping(col("o_orderpriority")).cast("long").as("g_pri"))
        .select(coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n_orders"), col("sum_price"), col("g_seg"), col("g_pri"))
        .orderBy(col("segment"), col("priority"))
    }),


    // Arbitrary GROUPING SETS — the shape rollup/cube can't express:
    // a detail set over (segment, priority), an INDEPENDENT marginal
    // over order status, and a grand total, in one pass. Spark plans
    // this as one Expand over the scan (each input row fans to one
    // row per set, each pre-aggregated map-side), so the grouped
    // breadth costs ~|sets|× the single-grouping agg, never |sets|
    // scans — the property that makes multi-marginal dataset cards
    // viable at 100 TB. grouping() flags disambiguate a grouped-out
    // NULL from data NULL, same contract as q_agg_cube.
    "q_grouping_sets" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupingSets(
          Seq(Seq(col("c_mktsegment"), col("o_orderpriority")),
            Seq(col("o_orderstatus")),
            Seq.empty[org.apache.spark.sql.Column]),
          col("c_mktsegment"), col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          Det.fsum2(col("o_totalprice")).as("sum_price"),
          grouping(col("c_mktsegment")).cast("long").as("g_seg"),
          grouping(col("o_orderpriority")).cast("long").as("g_pri"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"))
        .select(coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          col("n_orders"), col("sum_price"),
          col("g_seg"), col("g_pri"), col("g_status"))
        .orderBy(col("segment"), col("priority"), col("status"))
    }),


    // Exact interpolated percentiles (same p·(n−1) linear rule as
    // DuckDB's quantile_cont; integral inputs → identical doubles).
    "q_percentiles" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          Det.r4(percentile(col("l_quantity"), lit(0.5))).as("median_qty"),
          Det.r4(percentile(col("l_quantity"), lit(0.9))).as("p90_qty"),
          Det.r4(percentile(col("l_quantity"), lit(0.99))).as("p99_qty"))
        .orderBy(col("l_returnflag"))),


    // The percentile path that actually survives 100 TB: a GK sketch
    // (approx_percentile, accuracy 100 => rank error <= 0.01) instead
    // of the exact sort-based percentile. Sketch VALUES are partition-
    // order dependent, so the oracle-checkable surface is the GK
    // GUARANTEE, not the value: each approximation must land between
    // the exact quantiles at p +/- 0.02 (2x the error bound). Any
    // accuracy regression, merge bug, or broken guarantee flips a
    // flag; the oracle states the flags as constants.
    "q_approx_percentile_bounds" -> ((s, d) => {
      val v = t(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("v"))
      val ps = Seq(0.5, 0.9, 0.99)
      val lo = ps.map(p => math.max(0.0, p - 0.02))
      val hi = ps.map(p => math.min(1.0, p + 0.02))
      // The exact envelope comes from the distributed-sort quantile
      // path (core.Quantiles), NOT the exact `percentile` aggregate:
      // l_extendedprice is 97% distinct, so the aggregate's final
      // value->count map merge rebuilds the whole column on one
      // reducer thread — the one part of this query that would NOT
      // survive 100 TB. The sort path keeps every stage parallel; the
      // envelope constants are memoized per (session, dir) like every
      // other data-property scalar.
      val ex = graft.core.Quantiles.exactQuantilesMemo(
        v, "v", lo ++ hi, s"pctl_env:$d")
      val agg = v.agg(
        expr(s"approx_percentile(v, array(${ps.mkString("D,")}D), 100)")
          .as("ap"))
      val rows = ps.indices.map(i =>
        s"CAST(${ps(i)} AS DOUBLE), ap[$i] BETWEEN ${ex(i)}D AND ${ex(i + ps.size)}D")
      agg.select(expr(
          s"stack(${ps.size}, ${rows.mkString(", ")})")
          .as(Seq("p", "within_bounds")))
        .orderBy(col("p"))
    }),


    // Count-distinct at 100 TB is HyperLogLog++, not an exact
    // distinct shuffle. HLL register maxima are order-free, so the
    // approximation is DETERMINISTIC for a given dataset — but not
    // replayable in another engine, so (like the GK sketch above) the
    // checkable surface is the accuracy envelope. Unlike GK's
    // worst-case rank bound, the HLL envelope is probabilistic: 20%
    // = 4x the rsd=0.05 standard error (miss odds ~1e-4 per column on
    // fresh data; on THIS dataset the flag is deterministic and
    // observed error is ~2%). A broken sketch or merge is off by far
    // more than 20%.
    // Data-quality column profile (the Deequ-style validation shape a
    // pipeline runs before training): per column, non-null / null /
    // distinct counts + min/max rendered as strings — ALL columns in
    // ONE scan (a single aggregate computes every metric; stack
    // unpivots afterwards), not a scan per column.
    "q_profile_columns" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority")
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nul_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c")))
      val stackArgs = cols.map(c =>
        s"'$c', nn_$c, nul_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
      t(s, d, "orders").agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.size}, $stackArgs)")
          .as(Seq("col_name", "n_notnull", "n_null", "n_distinct",
            "min_val", "max_val")))
        .orderBy(col("col_name"))
    }),


    // The third sketch of the family (GK percentiles, HLL NDV, and
    // now Count-Min frequency): heavy-hitter counts at 100 TB come
    // from a CMS, not an exact groupBy over every key. CMS is a
    // LINEAR sketch (counters add; merge order cannot matter), so for
    // a fixed seed the estimate is deterministic — but engine-internal,
    // so like its siblings the checkable surface is the guarantee:
    // NEVER an underestimate (hard invariant of min-over-rows), and
    // over by at most eps*N (w.h.p.; deterministic on this data). The
    // sketch itself is a ~KB scalar fetched to the driver — exactly
    // what a production serving layer does with it.
    "q_approx_freq_bounds" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val eps = 0.001
      val probes = Seq(1L, 2L, 3L)
      // r17 (§1.2 don't compute things twice): the sketch, the exact
      // probe counts and the row total used to be THREE driver actions
      // — three full lineitem scans per invocation. One fused
      // aggregation computes all of them in a single pass; the probe
      // counts come from conditional sums (identical to the old
      // filtered groupBy, including the implicit 0 for absent keys).
      val aggs =
        expr(s"count_min_sketch(l_suppkey, ${eps}d, 0.99d, 42)").as("cms") +:
        count(lit(1)).as("n") +:
        probes.map(k =>
          sum(when(col("l_suppkey") === k, 1L).otherwise(0L)).as(s"c$k"))
      val row = li.agg(aggs.head, aggs.tail: _*).head()
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("cms")))
      val exact = probes.map(k => k -> row.getAs[Long](s"c$k")).toMap
      val n = row.getAs[Long]("n")
      val slack = math.ceil(eps * n).toLong
      val rows = probes.map { k =>
        val est = cms.estimateCount(k)
        val ex = exact.getOrElse(k, 0L)
        (k, est >= ex && est <= ex + slack)
      }
      import s.implicits._
      rows.toDF("probe_key", "within_bounds").orderBy(col("probe_key"))
    }),


    "q_approx_ndv_bounds" -> ((s, d) => {
      def check(tbl: String, c: String) =
        t(s, d, tbl).agg(
            approx_count_distinct(col(c), 0.05).as("a"),
            countDistinct(col(c)).as("x"))
          .select(lit(c).as("col_name"),
            (abs(col("a") - col("x")).cast("double") /
              col("x").cast("double") <= 0.20).as("within_bounds"))
      check("lineitem", "l_partkey")
        .unionByName(check("lineitem", "l_suppkey"))
        .unionByName(check("orders", "o_custkey"))
        .orderBy(col("col_name"))
    }),


    // HLL set algebra: |clickers ∩ purchasers| estimated by
    // inclusion–exclusion over three HLL(0.05) sketches (|A|+|B|−|A∪B|
    // — the audience-overlap question sketch stores answer without
    // ever materializing either set), priced against the exact
    // intersection from ONE per-user flag pass. Exact counts are
    // value-checked cells; the estimate itself is reported only
    // through its error bound (sketch internals are engine-specific,
    // the q_approx_* discipline). I–E compounds three sketch errors
    // whose magnitude scales with the SET sizes, not the
    // intersection: each rsd-0.05 sketch is off by ~0.05 of ITS
    // cardinality, so the compounded absolute error is O(0.15·|U|)
    // regardless of how small A∩B is — a purely relative band would
    // flip false nondeterministically on a corpus where the overlap
    // is a sliver of the union. The band is therefore
    // max(0.3·n_both, 0.15·eu): relative 0.3 when the intersection
    // is big enough to price relatively, the union-scaled absolute
    // floor when it isn't.
    "q_hll_intersect" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("event_type").isin("click", "purchase"))
      val isC = col("event_type") === "click"
      val isP = col("event_type") === "purchase"
      val exact = ev.groupBy(col("user_id"))
        .agg(max(isC.cast("long")).as("c"), max(isP.cast("long")).as("p"))
        .agg(sum(col("c")).as("n_click"), sum(col("p")).as("n_buy"),
          sum(col("c") * col("p")).as("n_both"))
      val est = ev.agg(
        approx_count_distinct(when(isC, col("user_id")), 0.05).as("ea"),
        approx_count_distinct(when(isP, col("user_id")), 0.05).as("eb"),
        approx_count_distinct(col("user_id"), 0.05).as("eu"))
      exact.crossJoin(est)
        .select(col("n_click"), col("n_buy"), col("n_both"),
          // n_both = 0 ⇒ the relative term vanishes and only the
          // union-scaled absolute floor applies (which also keeps
          // the oracle's literal `true` satisfiable on a disjoint
          // corpus: an I–E estimate within 15% of the union of 0
          // overlap is the sketch working as specified)
          (abs(col("ea") + col("eb") - col("eu") - col("n_both"))
            .cast("double") <=
            greatest(col("n_both").cast("double") * 0.3,
              col("eu").cast("double") * 0.15))
            .as("within_bounds"))
    }),


    // Adversarial-skew aggregation: l_returnflag has only 3 values,
    // so every row funnels into 3 reduce groups — the shape where a
    // hot key degrades the map-side hash table. The salted two-phase
    // count (groupBy(key, salt) partial -> groupBy(key) final,
    // core.Skew) bounds any single reducer at rows/salts and is
    // semantically identical to the plain count, which IS the oracle.
    "q_salted_hot_keys" -> ((s, d) =>
      graft.core.Skew.saltedCount(t(s, d, "lineitem"), "l_returnflag", 16)
        .orderBy(col("l_returnflag"))),


    // Join-side skew mitigation: the fact side gets a per-row salt,
    // the dim side is replicated once per salt value (core.Skew
    // saltedJoin — for the hot build keys AQE's skew split cannot
    // always reach). Semantically the plain join, which is the oracle.
    "q_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_suppkey"))
      val sup = t(s, d, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.core.Skew.saltedJoin(li, sup, "l_suppkey", 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("s_nationkey"))
    }),


    // Skyline / Pareto frontier (minimize p_size AND price): the
    // points no other point dominates (≤ on both axes, < on one).
    // The 2-D skyline collapses BEFORE any global operation: a
    // partial/final groupBy reduces the corpus to one (size,
    // min-price) row per distinct size — O(|size domain|), ~50 rows
    // at any fact volume — then the classic sort-scan (running strict
    // -predecessor min via a 1-PRECEDING window) marks the frontier
    // over that tiny frame, and a broadcast join back recovers every
    // part sitting ON a frontier point (ties are co-skyline: neither
    // strictly dominates). At 100 TB the only data-sized work is the
    // first aggregate; the window's single-partition frame holds the
    // size domain, never the data.
    "q_skyline" -> ((s, d) =>
      skyline2d(t(s, d, "part").select(col("p_partkey"),
        col("p_size").cast("long").as("p_size"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long")
          .as("cents")))),


    // Global sort + limit with key tiebreak.
    "q_sort_limit" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)),


    // Set operations over two customer-key sets.
    "q_set_ops" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val a = o.where(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey")).distinct()
      val b = c.where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")).distinct()
      a.union(b).distinct().select(lit("union").as("op"), col("custkey"))
        .unionAll(a.intersect(b).select(lit("intersect").as("op"), col("custkey")))
        .unionAll(a.except(b).select(lit("except").as("op"), col("custkey")))
        .orderBy(col("op"), col("custkey"))
    }),


    // String function family over part.
    "q_string_funcs" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          lower(col("p_name")).as("name_lower"),
          length(col("p_name")).cast("long").as("name_len"),
          split(col("p_type"), " ").getItem(0).as("type_head"),
          regexp_replace(col("p_brand"), "#", "").as("brand_clean"),
          concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))),


    // Date functions: orders per month (emitted as strings — timestamp
    // physical encodings differ across engines, strings are parity-safe).
    "q_date_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM-dd").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          Det.fsum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("month"))),


    // Math function family; per-row IEEE ops are engine-identical.
    // ORDER BY totalized over all output columns (r16) — same
    // duplicate-(orderkey, linenumber) tie hazard as
    // q_scan_filter_project above.
    "q_math_funcs" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          Det.r4(sqrt(col("l_extendedprice"))).as("sqrt_price"),
          Det.r4((lit(1.0) + col("l_discount")) * (lit(1.0) + col("l_discount"))
            * (lit(1.0) + col("l_discount"))).as("disc_cubed"),
          Det.r4(abs(col("l_tax") - col("l_discount"))).as("abs_diff"),
          Det.r4(log(col("l_quantity"))).as("ln_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("sqrt_price"),
          col("disc_cubed"), col("abs_diff"), col("ln_qty"))),


    // JSON extraction + grouped stats over events.props.
    "q_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .select(col("event_type"), col("n"), col("sum_k"), col("min_k"),
          col("max_k"),
          Det.r4(col("sum_k").cast("double") / col("n")).as("avg_k"))
        .orderBy(col("event_type"))),


    // Array functions: collect_list → sort_array → size/element_at,
    // plus an exact aggregate over the exploded list (roundtrip).
    "q_array_funcs" -> ((s, d) =>
      Sources.ratings(s, d)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("item_id"))).as("items"),
          sum(col("item_id")).as("sum_items"))
        .select(col("user_id"),
          size(col("items")).cast("long").as("n_items"),
          element_at(col("items"), 1).as("first_item"),
          element_at(col("items"), -1).as("last_item"),
          col("sum_items"))
        .orderBy(col("user_id"))),


    // Pivot: order counts + exact-cents revenue per priority, statuses
    // as columns. Values are pinned explicitly — pivot without a value
    // list scans once just to discover columns (a full extra pass at
    // 100 TB) and makes the output schema data-dependent.
    "q_pivot_status" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"),
          Det.fsum2(col("o_totalprice")).as("rev"))
        .orderBy(col("o_orderpriority"))),


    // Backward as-of join (TemporalJoin.asof): each purchase event
    // picks up the user's most recent click at or before it — one
    // window pass over the unioned sides, no per-row probe.
    // FORWARD as-of: for each purchase, the NEXT click at-or-after —
    // the other half of the as-of pair (same one-window plan, scan
    // direction flipped; see TemporalJoin.asofForward).
    "q_asof_forward" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_ms"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_ms").as("click_ms"))
      graft.core.TemporalJoin.asofForward(purchases, clicks, "user_id",
          leftTs = "ts_ms", rightTs = "click_ms",
          payload = Seq("click_id", "click_ms"), tieBreak = "click_id")
        .select(col("event_id"), col("user_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"),
          coalesce(col("click_ms") - col("ts_ms"), lit(-1L)).as("gap_ms"))
        .orderBy(col("event_id"))
    }),


    "q_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_ms"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_ms").as("click_ms"))
      graft.core.TemporalJoin.asof(purchases, clicks, "user_id",
          leftTs = "ts_ms", rightTs = "click_ms",
          payload = Seq("click_id", "click_ms"), tieBreak = "click_id")
        .select(col("event_id"), col("user_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"),
          coalesce(col("ts_ms") - col("click_ms"), lit(-1L)).as("gap_ms"))
        .orderBy(col("event_id"))
    }),


    // Banded range join (TemporalJoin.bandJoin): same-type event pairs
    // within 10 minutes, canonically ordered, aggregated per type.
    // The band predicate runs as an equi-join on (type, time bucket) —
    // hash-partitionable — never as a nested-loop theta join.
    "q_range_join" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"))
      val pairs = graft.core.TemporalJoin
        .bandJoin(ev, ev, Seq("event_type"), "ts_ms", "ts_ms", 600000L)
        .where(col("b_ts_ms") > col("a_ts_ms") ||
          (col("b_ts_ms") === col("a_ts_ms") &&
            col("b_event_id") > col("a_event_id")))
      pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("b_ts_ms") - col("a_ts_ms")).as("sum_gap_ms"),
          max(col("b_ts_ms") - col("a_ts_ms")).as("max_gap_ms"))
        .orderBy(col("event_type"))
    }),


    // Unpivot (wide→long melt): the four lineitem measures into
    // (metric, value) rows, then a per-metric profile. Spark's
    // `unpivot` lowers to an Expand node — ONE scan emits all four
    // long-form rows per input row, and the partial aggregation folds
    // them map-side, so the whole melt+profile is a single pass with
    // one 4-row-group exchange (same shape as q_profile_columns'
    // stack). No shuffle scales with input width.
    "q_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"),
          Det.fsum4(col("value")).as("total"),
          Det.r4(min(col("value"))).as("min_v"),
          Det.r4(max(col("value"))).as("max_v"))
        .orderBy(col("metric"))),


    // MapType + the map function family (the one scalar-function
    // family the inventory lacked): per-priority status→count maps
    // built with map_from_entries over a SORTED entry array (the sort
    // pins key order, making size/keys/lookups deterministic), read
    // back via map_keys / try_element_at (element_at under Spark 4's
    // default ANSI mode THROWS on a missing key, so a priority group
    // lacking a status would crash instead of coalescing to 0; the
    // try_ variant yields NULL, matching DuckDB). The collect_list is
    // bounded by the status domain (3 values) — entries per group are
    // enum-sized, never row-scaled.
    "q_map_funcs" -> ((s, d) => mapFuncs(t(s, d, "orders"))),


    // Distribution window functions: percent_rank + cume_dist over
    // acctbal within nation ((rank−1)/(n−1) and rank/n are exact
    // rational→IEEE divisions, identical on both engines), plus the
    // quartile check that cume_dist is monotone with ntile.
    "q_percent_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          Det.r4(percent_rank().over(w)).as("pct_rank"),
          Det.r4(cume_dist().over(w)).as("cume"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),


    // Partition-pruned scan over a hive-partitioned layout: events
    // re-written `partitionBy(event_type)` once per sf dir
    // (PartitionFixtures), then read back with a partition-key filter.
    // The filter never reads non-matching partitions — it binds as
    // `PartitionFilters` on the scan (directory-level pruning;
    // ApiSpec asserts 2 of 5 partitions selected). The oracle states
    // the same aggregate against the ORIGINAL events table, so the
    // whole write→layout→prune→read round trip is value-checked.
    "q_partition_prune" -> ((s, d) => {
      val path = graft.io.PartitionFixtures.writeEventsByType(s, d)
      s.read.parquet(path)
        .where(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          Det.fsum2(col("value")).as("sum_value"))
        .orderBy(col("event_type"), col("day"))
    }),


    // DYNAMIC partition pruning — the optimizer feature the static
    // q_partition_prune can't exercise: the partition set comes from
    // DATA (top-2 event types by count), so no scan-time literal
    // filter exists; Spark must inject the broadcast dim's values
    // into the partitioned scan as a runtime partition filter
    // (`dynamicpruning` subquery — plan-asserted in ApiSpec). At
    // 100 TB this is the difference between scanning 2 partitions
    // and scanning all of them whenever the filter is a join.
    "q_partition_prune_dynamic" -> ((s, d) => {
      val path = graft.io.PartitionFixtures.writeEventsByType(s, d)
      val part = s.read.parquet(path)
      // the dim carries a SELECTIVE data filter (user 7's observed
      // event types) — DPP's planner rule requires one on the build
      // side before it will inject the runtime partition subquery
      val dim = Sources.events(s, d)
        .where(col("user_id") === 7L)
        .select(col("event_type")).distinct()
      part.join(broadcast(dim), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Det.fsum2(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),


    // Blocked fuzzy (edit-distance) self-join — the entity-resolution
    // shape: dedupe the NAME DICTIONARY first (distinct names ≪ rows,
    // with per-name multiplicities), block on the head noun so
    // candidate pairs never cross blocks, score survivors with
    // levenshtein ≤ 3, then report row-pair multiplicities from the
    // dictionary counts. At 100 TB the all-pairs name comparison is
    // the killer; dictionary-first + blocking keeps the quadratic
    // term at (distinct names per block)², independent of row count,
    // and the edit-distance UDF-free (codegen'd built-in) on the
    // dictionary only — never on the fact table.
    "q_fuzzy_join" -> ((s, d) => {
      val names = t(s, d, "part")
        .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
        .withColumn("noun", split(col("p_name"), " ").getItem(1))
      val a = names.select(col("noun"), col("p_name").as("name_a"),
        col("n_parts").as("n_a"))
      val b = names.select(col("noun"), col("p_name").as("name_b"),
        col("n_parts").as("n_b"))
      a.join(b, Seq("noun"))
        .where(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .where(col("dist") <= 3)
        .select(col("noun"), col("name_a"), col("name_b"),
          col("dist").cast("long").as("dist"),
          (col("n_a") * col("n_b")).as("pair_count"))
        .orderBy(col("noun"), col("name_a"), col("name_b"))
    }),


    // Partition-skew diagnostics: replay the engine's hash
    // partitioning of lineitem on l_orderkey into 32 shuffle buckets
    // (the portable spread hash stands in for Murmur3 so the oracle
    // can replay bucket assignment) and report per-bucket row counts
    // plus each bucket's share — the numbers a capacity plan reads
    // before picking spark.sql.shuffle.partitions / salting a key.
    // One partial/final agg: the diagnostic never shuffles the data
    // it diagnoses, only 32 counter rows; the share window runs over
    // those 32 rows, not the data.
    "q_skew_diagnose" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.core.PortableHash
      val bucket = PortableHash.spread(
        PortableHash.h(col("l_orderkey").cast("string"))) % lit(32L)
      t(s, d, "lineitem")
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("pct", Det.r4(col("n_rows") * lit(100.0) /
          sum(col("n_rows")).over(Window.partitionBy())))
        .orderBy(col("bucket"))
    }),


    // Data-quality constraint suite (the Deequ / Great Expectations
    // shape): each declared constraint — range, primary-key
    // uniqueness, referential integrity, pattern, positivity,
    // derived-column consistency — evaluates as ONE aggregation (or
    // one anti-join count) and the report is their union: fixed rows,
    // one pass per table scan, nothing data-sized crosses the driver.
    // The fixture suite deliberately mixes passing checks with a
    // failing one (the lineitem PK has real duplicates), so the
    // report shape carries both verdicts.
    "q_dq_report" -> ((s, d) => {
      def row(name: String, checked: org.apache.spark.sql.Column,
              viol: org.apache.spark.sql.Column, df: DataFrame) =
        df.agg(checked.cast("long").as("n_checked"),
            viol.cast("long").as("n_violations"))
          .select(lit(name).as("check_name"), col("n_checked"),
            col("n_violations"),
            (col("n_violations") === 0L).cast("long").as("passed"))
      val li = t(s, d, "lineitem")
      // RI as a null-marked left join: one aggregation yields both
      // the checked total and the orphan count (never a driver-side
      // count action in plan construction)
      val ri = t(s, d, "orders").select(col("o_custkey"))
        .join(t(s, d, "customer").select(col("c_custkey").as("o_custkey"))
          .distinct().withColumn("__known", lit(1)),
          Seq("o_custkey"), "left")
      row("customer.name_pattern", count(lit(1)),
          sum(when(col("c_name").startsWith("Customer#"), 0L)
            .otherwise(1L)), t(s, d, "customer"))
        .unionByName(row("documents.n_chars_consistent", count(lit(1)),
          sum(when(col("n_chars") === length(col("text")).cast("long"), 0L)
            .otherwise(1L)), t(s, d, "documents")))
        .unionByName(row("events.value_positive", count(lit(1)),
          sum(when(col("value") > 0.0, 0L).otherwise(1L)),
          t(s, d, "events")))
        .unionByName(row("lineitem.pk_unique", count(lit(1)),
          count(lit(1)) - countDistinct(col("l_orderkey"),
            col("l_linenumber")), li))
        .unionByName(row("lineitem.quantity_in_1_50", count(lit(1)),
          sum(when(col("l_quantity").between(1.0, 50.0), 0L)
            .otherwise(1L)), li))
        .unionByName(row("orders.custkey_in_customer", count(lit(1)),
          sum(when(col("__known").isNull, 1L).otherwise(0L)), ri))
        .orderBy(col("check_name"))
    }),


    // Z-order (Morton) layout statistics — the multi-dimensional
    // file-skipping key: interleave the low 8 bits of two dimensions
    // (customer bucket × order day) and report per-z-range row
    // counts and min/max spans on BOTH dimensions. Sorting a write
    // by zval gives every file a tight min/max envelope on each
    // dimension simultaneously — the layout that makes two-column
    // predicates prune files. The interleave is pure shift/mask
    // arithmetic (identical text on both engines); stats are one
    // partial/final agg over 32 report buckets.
    "q_zorder_stats" -> ((s, d) => {
      val zExpr = (0 until 8).map(i =>
        s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      t(s, d, "orders")
        .selectExpr("o_custkey",
          "CAST(o_custkey % 256 AS BIGINT) AS xb",
          "CAST((unix_millis(cast(o_orderdate as timestamp)) " +
            "div 86400000) % 256 AS BIGINT) AS yb")
        .selectExpr("o_custkey", "xb", "yb", s"($zExpr) AS zval")
        .groupBy(expr("zval div 2048").as("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("n_custkeys"),
          (max(col("xb")) - min(col("xb"))).as("x_span"),
          (max(col("yb")) - min(col("yb"))).as("y_span"))
        .orderBy(col("z_bucket"))
    }),


    // TPC-H-Q3-shaped shipping priority: segment-filtered customers ⋈
    // date-filtered orders ⋈ date-filtered lineitem, revenue per
    // order, top-10. The filters sit ON THE SCANS (predicate pushdown
    // reaches parquet on all three tables), the dimension join keys
    // are pruned columns only, and the top-10 runs as
    // TakeOrderedAndProject over the aggregated frame — never a
    // global sort of order revenues.
    "q_ship_priority" -> ((s, d) => {
      val cut = "1998-06-01 00:00:00"
      val c = t(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = t(s, d, "orders")
        .where(expr(s"o_orderdate < TIMESTAMP_NTZ '$cut'"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val l = t(s, d, "lineitem")
        .where(expr(s"l_shipdate > TIMESTAMP_NTZ '$cut'"))
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(Det.fsum4(col("rev")).as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
  )


  /** q_pit_training_set cutoff: epoch day 9282 = 1995-06-01; label
    * horizon 90 days. Mid-corpus so both past and future slices are
    * dense at every sf. */
  private val PitCutDay = 9282L
  private val PitHorizonDays = 90L

  /** q_local_supplier_volume order-date window start: epoch day 9131
    * = 1995-01-01 (the fixture's first order date), one year wide. */
  private val Q5StartDay = 9131L

  /** The merged click-island chain (ev → flagged → numbered →
    * islands), shared by q_interval_coverage and
    * q_interval_overlap_join — one SQL constant so the two can never
    * disagree on what an island is. */

  val oracles: Map[String, String] = Map(
    "q_column_corr" -> {
      val cs = Seq("cq", "cp", "cd", "ct")
      val pairs = for { i <- cs.indices; j <- i + 1 until cs.length }
        yield (cs(i), cs(j))
      val sums = (cs.map(c => s"CAST(sum($c) AS DOUBLE) AS s_$c") ++
        cs.map(c => s"CAST(sum($c*$c) AS DOUBLE) AS ss_$c") ++
        pairs.map { case (a, b) =>
          s"CAST(sum($a*$b) AS DOUBLE) AS sp_${a}_$b" }).mkString(",\n       ")
      val arms = pairs.map { case (a, b) =>
        s"SELECT '${a}_$b' AS pair, n AS nd, sp_${a}_$b AS sxyd, " +
          s"s_$a AS sxd, s_$b AS syd, ss_$a AS sxxd, ss_$b AS syyd FROM m"
      }.mkString("\n  UNION ALL ")
      val corrSql = graft.core.Similarity.Sql.corr(
        "nd", "sxyd", "sxd", "syd", "sxxd", "syyd")
      s"""WITH src AS (
         |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS cq,
         |         CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cp,
         |         CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS cd,
         |         CAST(floor(l_tax*100 + 0.5) AS BIGINT) AS ct
         |  FROM lineitem),
         |m AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |       $sums
         |  FROM src),
         |u AS (
         |  $arms)
         |SELECT pair, ${r4(corrSql)} AS corr
         |FROM u ORDER BY pair""".stripMargin
    },


    "q_local_supplier_volume" ->
      s"""SELECT n_name,
         |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
         |                           * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         |         AS revenue_cents,
         |       count(*) AS n_lineitems
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |             AND s_nationkey = c_nationkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND epoch_ms(o_orderdate) // 86400000 >= $Q5StartDay
         |  AND epoch_ms(o_orderdate) // 86400000 < ${Q5StartDay + 365}
         |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,


    "q_pit_training_set" ->
      s"""WITH o AS (
         |  SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day,
         |         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |past AS (
         |  SELECT o_custkey, count(*) AS n_orders_past,
         |         CAST(sum(cents) AS BIGINT) AS cents_past,
         |         CAST($PitCutDay - max(day) AS BIGINT) AS recency_days
         |  FROM o WHERE day < $PitCutDay GROUP BY 1),
         |fut AS (SELECT DISTINCT o_custkey FROM o
         |        WHERE day >= $PitCutDay
         |          AND day < ${PitCutDay + PitHorizonDays})
         |SELECT p.o_custkey AS custkey, p.n_orders_past, p.cents_past,
         |       p.recency_days,
         |       CAST(CASE WHEN f.o_custkey IS NULL THEN 0 ELSE 1 END
         |            AS BIGINT) AS label
         |FROM past p LEFT JOIN fut f ON f.o_custkey = p.o_custkey
         |ORDER BY custkey""".stripMargin,


    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""
        .stripMargin,


    "q_agg_pricing_summary" ->
      s"""WITH g AS (
         |  SELECT l_returnflag, l_linestatus,
         |         sum(l_quantity) AS sum_qty,
         |         ${fsum2("l_extendedprice")} AS sum_base_price,
         |         ${fsum4("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |         count(*) AS count_order
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
         |       sum_disc_price,
         |       ${r4("sum_qty / count_order")} AS avg_qty,
         |       ${r4("sum_base_price / count_order")} AS avg_price,
         |       count_order
         |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,


    "q_agg_rollup" ->
      s"""SELECT coalesce(n_name, '(all)') AS nation,
         |       coalesce(c_mktsegment, '(all)') AS segment,
         |       count(*) AS n_customers,
         |       ${fsum2("c_acctbal")} AS sum_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP (n_name, c_mktsegment)
         |ORDER BY nation, segment""".stripMargin,


    "q_distinct_users" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_users,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,


    "q_join_broadcast_dims" ->
      s"""SELECT r_name,
         |       ${fsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |       count(*) AS n_lines
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY 1 ORDER BY r_name""".stripMargin,


    "q_join_semi_anti" ->
      """SELECT 'with_orders' AS kind, c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS kind, c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY kind, c_custkey""".stripMargin,


    "q_join_outer" ->
      """WITH c AS (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |         count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |         count(*) AS n_buys
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
        |       COALESCE(c.day, p.day) AS day,
        |       COALESCE(n_clicks, 0) AS n_clicks,
        |       COALESCE(n_buys, 0) AS n_buys,
        |       CASE WHEN c.user_id IS NULL THEN 'purchase_only'
        |            WHEN p.user_id IS NULL THEN 'click_only'
        |            ELSE 'both' END AS side
        |FROM c FULL OUTER JOIN p
        |  ON c.user_id = p.user_id AND c.day = p.day
        |ORDER BY user_id, day""".stripMargin,


    "q_rank_dense_ntile" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |       rank() OVER w AS rnk,
        |       dense_rank() OVER w AS drnk,
        |       ntile(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,


    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) / 100.0 AS running_total
        |FROM orders
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,


    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       o_totalprice,
        |       coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price,
        |       coalesce(lead(o_totalprice, 1) OVER w, 0.0) AS next_price,
        |       first_value(o_totalprice) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS first_price,
        |       last_value(o_totalprice) OVER wf AS last_price,
        |       coalesce(nth_value(o_totalprice, 2) OVER wf, 0.0)
        |         AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey),
        |       wf AS (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING
        |              AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,


    "q_window_range" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         epoch_ms(o_orderdate) // 86400000 AS day,
        |         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day,
        |       CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
        |                             RANGE BETWEEN 30 PRECEDING
        |                             AND CURRENT ROW) AS DOUBLE) / 100.0
        |         AS moving_30d
        |FROM o
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,


    "q_agg_cube" ->
      s"""SELECT coalesce(c_mktsegment, '(all)') AS segment,
         |       coalesce(o_orderpriority, '(all)') AS priority,
         |       count(*) AS n_orders,
         |       ${fsum2("o_totalprice")} AS sum_price,
         |       CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
         |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY CUBE (c_mktsegment, o_orderpriority)
         |ORDER BY segment, priority""".stripMargin,


    "q_grouping_sets" ->
      s"""SELECT coalesce(c_mktsegment, '(all)') AS segment,
         |       coalesce(o_orderpriority, '(all)') AS priority,
         |       coalesce(o_orderstatus, '(all)') AS status,
         |       count(*) AS n_orders,
         |       ${fsum2("o_totalprice")} AS sum_price,
         |       CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
         |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
         |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority),
         |                        (o_orderstatus), ())
         |ORDER BY segment, priority, status""".stripMargin,


    "q_percentiles" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |       ${r4("quantile_cont(l_quantity, 0.5)")} AS median_qty,
         |       ${r4("quantile_cont(l_quantity, 0.9)")} AS p90_qty,
         |       ${r4("quantile_cont(l_quantity, 0.99)")} AS p99_qty
         |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,


    // Derived-property oracle (like q_als_recommend): the GK sketch's
    // values are partition-order dependent, its rank-error GUARANTEE
    // is not — the query emits the bound checks, the oracle states
    // them as constants.
    "q_approx_percentile_bounds" ->
      """SELECT CAST(p AS DOUBLE) AS p, within_bounds
        |FROM (VALUES (0.5, true), (0.9, true), (0.99, true))
        |  t(p, within_bounds)
        |ORDER BY p""".stripMargin,


    "q_profile_columns" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name,
           |       count($c) AS n_notnull,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_null,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_val,
           |       CAST(max($c) AS VARCHAR) AS max_val
           |FROM orders""".stripMargin
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },


    // Derived-property oracle (CMS values are engine-internal; the
    // never-underestimate + eps*N envelope is the checkable surface).
    "q_approx_freq_bounds" ->
      """SELECT CAST(probe_key AS BIGINT) AS probe_key, within_bounds
        |FROM (VALUES (1, true), (2, true), (3, true))
        |  t(probe_key, within_bounds)
        |ORDER BY probe_key""".stripMargin,


    // Derived-property oracle; see the query's comment.
    "q_approx_ndv_bounds" ->
      """SELECT col_name, within_bounds
        |FROM (VALUES ('l_partkey', true), ('l_suppkey', true),
        |             ('o_custkey', true))
        |  t(col_name, within_bounds)
        |ORDER BY col_name""".stripMargin,


    // Exact overlap counts replayed; the I–E estimate is asserted
    // only through its bound (sketch values are engine-internal).
    "q_hll_intersect" ->
      """WITH g AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |           AS c,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS p
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1)
        |SELECT CAST(sum(c) AS BIGINT) AS n_click,
        |       CAST(sum(p) AS BIGINT) AS n_buy,
        |       CAST(sum(c * p) AS BIGINT) AS n_both,
        |       true AS within_bounds
        |FROM g""".stripMargin,


    // The salted two-phase count is semantically the plain count.
    "q_salted_hot_keys" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,


    // The salted join is semantically the plain join.
    "q_salted_join" ->
      """SELECT s_nationkey, count(*) AS cnt
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY s_nationkey""".stripMargin,


    // Skyline: dominance replayed via the same collapse + strict-
    // predecessor window; a frontier (size, price) point admits every
    // part that sits exactly on it.
    "q_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |         CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM part),
        |bysize AS (
        |  SELECT p_size, min(cents) AS min_cents FROM p GROUP BY 1),
        |sky AS (
        |  SELECT p_size, min_cents FROM (
        |    SELECT p_size, min_cents,
        |           min(min_cents) OVER (ORDER BY p_size
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |             AS m1
        |    FROM bysize)
        |  WHERE m1 IS NULL OR m1 > min_cents)
        |SELECT p.p_partkey, p.p_size, p.cents
        |FROM p JOIN sky
        |  ON p.p_size = sky.p_size AND p.cents = sky.min_cents
        |ORDER BY p.p_size, p.p_partkey""".stripMargin,


    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,


    "q_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |           WHERE o_totalprice > 150000),
        |b AS (SELECT DISTINCT c_custkey AS custkey FROM customer
        |      WHERE c_mktsegment = 'BUILDING')
        |SELECT 'union' AS op, custkey
        |  FROM (SELECT custkey FROM a UNION SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, custkey
        |  FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, custkey
        |  FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
        |ORDER BY op, custkey""".stripMargin,


    "q_string_funcs" ->
      """SELECT p_partkey,
        |       lower(p_name) AS name_lower,
        |       length(p_name) AS name_len,
        |       split_part(p_type, ' ', 1) AS type_head,
        |       regexp_replace(p_brand, '#', '') AS brand_clean,
        |       concat_ws(':', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,


    "q_date_funcs" ->
      s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         |       count(*) AS n_orders,
         |       ${fsum2("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,


    "q_math_funcs" ->
      s"""SELECT l_orderkey, l_linenumber,
         |       ${r4("sqrt(l_extendedprice)")} AS sqrt_price,
         |       ${r4("(1.0 + l_discount)*(1.0 + l_discount)*(1.0 + l_discount)")} AS disc_cubed,
         |       ${r4("abs(l_tax - l_discount)")} AS abs_diff,
         |       ${r4("ln(l_quantity)")} AS ln_qty
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber, sqrt_price, disc_cubed,
         |         abs_diff, ln_qty""".stripMargin,


    "q_json_extract" ->
      s"""WITH e AS (
         |  SELECT event_type,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |  FROM events)
         |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
         |       min(k) AS min_k, max(k) AS max_k,
         |       ${r4("CAST(sum(k) AS DOUBLE) / count(*)")} AS avg_k
         |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin,


    "q_array_funcs" ->
      s"""WITH ${Sources.ratingsSql},
         |g AS (
         |  SELECT user_id, list_sort(list(item_id)) AS items,
         |         CAST(sum(item_id) AS BIGINT) AS sum_items
         |  FROM ratings GROUP BY 1)
         |SELECT user_id, len(items) AS n_items,
         |       items[1] AS first_item, items[-1] AS last_item, sum_items
         |FROM g ORDER BY user_id""".stripMargin,


    "q_pivot_status" -> {
      def cell(st: String) =
        s"""count(*) FILTER (o_orderstatus = '$st') AS "${st}_n",
           |${fsum2(s"CASE WHEN o_orderstatus = '$st' THEN o_totalprice END")}
           |  AS "${st}_rev"""".stripMargin
      s"""SELECT o_orderpriority,
         |${Seq("F", "O", "P").map(cell).mkString(",\n")}
         |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
    },


    // Same union+window formulation as the engine (ANSI; DuckDB's
    // native ASOF JOIN would leave right-timestamp ties unspecified).
    // Same union+window spelling, ts DESCENDING — the forward scan.
    "q_asof_forward" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |u AS (
        |  SELECT user_id, ts_ms, 1 AS side, event_id,
        |         NULL::BIGINT AS click_id, NULL::BIGINT AS click_ms
        |  FROM ev WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts_ms, 0 AS side, event_id,
        |         event_id AS click_id, ts_ms AS click_ms
        |  FROM ev WHERE event_type = 'click'),
        |filled AS (
        |  SELECT user_id, ts_ms, side, event_id,
        |         last_value(click_id IGNORE NULLS) OVER w AS click_id,
        |         last_value(click_ms IGNORE NULLS) OVER w AS click_ms
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts_ms DESC, side, click_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |       coalesce(click_id, -1) AS click_id,
        |       coalesce(click_ms - ts_ms, -1) AS gap_ms
        |FROM filled WHERE side = 1
        |ORDER BY event_id""".stripMargin,


    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |u AS (
        |  SELECT user_id, ts_ms, 1 AS side, event_id,
        |         NULL::BIGINT AS click_id, NULL::BIGINT AS click_ms
        |  FROM ev WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts_ms, 0 AS side, event_id,
        |         event_id AS click_id, ts_ms AS click_ms
        |  FROM ev WHERE event_type = 'click'),
        |filled AS (
        |  SELECT user_id, ts_ms, side, event_id,
        |         last_value(click_id IGNORE NULLS) OVER w AS click_id,
        |         last_value(click_ms IGNORE NULLS) OVER w AS click_ms
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, side, click_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |       coalesce(click_id, -1) AS click_id,
        |       coalesce(ts_ms - click_ms, -1) AS gap_ms
        |FROM filled WHERE side = 1
        |ORDER BY event_id""".stripMargin,


    "q_range_join" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, epoch_ms(ts) AS ts_ms FROM events)
        |SELECT a.event_type, count(*) AS n_pairs,
        |       CAST(sum(b.ts_ms - a.ts_ms) AS BIGINT) AS sum_gap_ms,
        |       max(b.ts_ms - a.ts_ms) AS max_gap_ms
        |FROM ev a JOIN ev b
        |  ON a.event_type = b.event_type
        | AND (b.ts_ms > a.ts_ms OR
        |      (b.ts_ms = a.ts_ms AND b.event_id > a.event_id))
        | AND b.ts_ms - a.ts_ms <= 600000
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Unpivot: UNION ALL melt (the engine-neutral spelling of
    // Spark's Expand lowering).
    "q_unpivot" ->
      s"""WITH m AS (
         |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
         |  UNION ALL
         |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
         |  UNION ALL
         |  SELECT 'l_discount', l_discount FROM lineitem
         |  UNION ALL
         |  SELECT 'l_tax', l_tax FROM lineitem)
         |SELECT metric, count(*) AS n,
         |       ${fsum4("value")} AS total,
         |       ${r4("min(value)")} AS min_v,
         |       ${r4("max(value)")} AS max_v
         |FROM m GROUP BY 1 ORDER BY metric""".stripMargin,


    // Map family: the long-form spelling of the same per-priority
    // status map (sorted keys join = the pinned map_keys order).
    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority,
        |       count(*) AS n_statuses,
        |       string_agg(o_orderstatus, ',' ORDER BY o_orderstatus)
        |         AS statuses,
        |       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN cnt END),
        |                     0) AS BIGINT) AS n_f,
        |       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN cnt END),
        |                     0) AS BIGINT) AS n_o,
        |       CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN cnt END),
        |                     0) AS BIGINT) AS n_p
        |FROM c GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,


    // Distribution windows: identical rational spellings.
    "q_percent_rank" ->
      s"""SELECT c_nationkey, c_custkey,
         |       ${r4("percent_rank() OVER w")} AS pct_rank,
         |       ${r4("cume_dist() OVER w")} AS cume,
         |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
         |FROM customer
         |WINDOW w AS (PARTITION BY c_nationkey
         |             ORDER BY c_acctbal, c_custkey)
         |ORDER BY c_nationkey, c_custkey""".stripMargin,


    // Partition prune: the oracle recomputes from the ORIGINAL events
    // table — equality proves the partitioned write+pruned read round
    // trip dropped and duplicated nothing.
    "q_partition_prune" ->
      s"""SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |       count(*) AS n_events,
         |       ${fsum2("value")} AS sum_value
         |FROM events WHERE event_type IN ('click', 'purchase')
         |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,


    // Recomputed from the ORIGINAL table — the partitioned round trip
    // plus the dynamic prune must be value-invisible.
    "q_partition_prune_dynamic" ->
      s"""WITH dim AS (
         |  SELECT DISTINCT event_type FROM events WHERE user_id = 7)
         |SELECT e.event_type, count(*) AS n_events,
         |       ${fsum2("e.value")} AS sum_value
         |FROM events e JOIN dim USING (event_type)
         |GROUP BY 1 ORDER BY event_type""".stripMargin,


    // Same dictionary-first blocked fuzzy join; DuckDB's levenshtein
    // is the same classic unit-cost edit distance as Spark's.
    "q_fuzzy_join" ->
      """WITH names AS (
        |  SELECT p_name, count(*) AS n_parts,
        |         split_part(p_name, ' ', 2) AS noun
        |  FROM part GROUP BY 1, 3)
        |SELECT a.noun, a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |       CAST(a.n_parts * b.n_parts AS BIGINT) AS pair_count
        |FROM names a JOIN names b
        |  ON a.noun = b.noun AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY a.noun, name_a, name_b""".stripMargin,


    "q_skew_diagnose" -> {
      import graft.core.PortableHash
      val bucket = s"(${PortableHash.spreadSql(
        PortableHash.hSql("CAST(l_orderkey AS VARCHAR)"))} % 32)"
      s"""WITH b AS (
         |  SELECT $bucket AS bucket, count(*) AS n_rows
         |  FROM lineitem GROUP BY 1)
         |SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows,
         |       ${r4("n_rows * 100.0 / sum(n_rows) OVER ()")} AS pct
         |FROM b ORDER BY bucket""".stripMargin
    },


    "q_dq_report" ->
      """WITH raw AS (
        |  SELECT 'customer.name_pattern' AS check_name,
        |         count(*) AS n_checked,
        |         CAST(sum(CASE WHEN c_name LIKE 'Customer#%' THEN 0
        |                       ELSE 1 END) AS BIGINT) AS n_violations
        |  FROM customer
        |  UNION ALL
        |  SELECT 'documents.n_chars_consistent', count(*),
        |         CAST(sum(CASE WHEN n_chars = length(text) THEN 0
        |                       ELSE 1 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'events.value_positive', count(*),
        |         CAST(sum(CASE WHEN value > 0.0 THEN 0 ELSE 1 END)
        |              AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'lineitem.pk_unique', count(*),
        |         count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.quantity_in_1_50', count(*),
        |         CAST(sum(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0
        |                       THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders.custkey_in_customer', count(*),
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON c.c_custkey = o.o_custkey)
        |SELECT check_name, n_checked, n_violations,
        |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END
        |            AS BIGINT) AS passed
        |FROM raw ORDER BY check_name""".stripMargin,


    "q_zorder_stats" -> {
      val zExpr = (0 until 8).map(i =>
        s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH b AS (
         |  SELECT o_custkey,
         |         CAST(o_custkey % 256 AS BIGINT) AS xb,
         |         CAST((epoch_ms(o_orderdate) // 86400000) % 256
         |              AS BIGINT) AS yb
         |  FROM orders),
         |z AS (SELECT o_custkey, xb, yb, ($zExpr) AS zval FROM b)
         |SELECT zval // 2048 AS z_bucket, count(*) AS n_rows,
         |       count(DISTINCT o_custkey) AS n_custkeys,
         |       max(xb) - min(xb) AS x_span,
         |       max(yb) - min(yb) AS y_span
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin
    },


    "q_ship_priority" ->
      s"""SELECT l_orderkey,
         |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         |       o_orderpriority,
         |       ${fsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
  )
}
