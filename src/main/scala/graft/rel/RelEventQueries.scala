package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, PortableHash}
import graft.io.Sources

/** Event / behavioral / time-series relational queries: sessionization,
  * funnels, attribution, CDC/SCD, rolling windows, trend & sketch
  * rollups over the `events` table.
  *
  * Registration-only sibling of [[RelQueries]] (round-13 split along
  * family seams; no behavior change — SparkEntry unions the maps).
  * Helpers shared with the core file stay on RelQueries as
  * `private[rel]`.
  */
object RelEventQueries {
  import Oracle._

  private[rel] def t(s: SparkSession, d: String, n: String) = Sources.table(s, d, n)


  private val islandsCtes: String =
    """ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS st,
      |         epoch_ms(ts) + 300000 AS en
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, st, en,
      |         CASE WHEN max(en) OVER wprev IS NULL
      |                OR st > max(en) OVER wprev
      |              THEN 1 ELSE 0 END AS new_island
      |  FROM ev
      |  WINDOW wprev AS (PARTITION BY user_id ORDER BY st, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING
      |                   AND 1 PRECEDING)),
      |numbered AS (
      |  SELECT user_id, st, en,
      |         sum(new_island) OVER (PARTITION BY user_id
      |                               ORDER BY st, event_id
      |                               ROWS BETWEEN UNBOUNDED PRECEDING
      |                               AND CURRENT ROW) AS island_id
      |  FROM flagged),
      |islands AS (
      |  SELECT user_id, island_id,
      |         min(st) AS i_st, max(en) AS i_en
      |  FROM numbered GROUP BY 1, 2)""".stripMargin

  private val cdcLatestSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
      |  FROM events),
      |r AS (
      |  SELECT *,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts_ms DESC, event_id DESC)
      |           AS rn,
      |         count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM ev)
      |SELECT user_id, event_id, event_type, ts_ms, n_events
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling event-time windows (batch): 1-hour buckets per type.
    "q_tumbling_window_counts" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.fsum4(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))),


    // Sessionization (batch analog): 30-min inactivity gap via
    // lag + cumulative sum — the deterministic, oracle-checkable twin
    // of the streaming session_window variant.
    "q_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      val flagged = ev.withColumn("new_session",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > 1800000L
          || lag(col("ts_ms"), 1).over(byUser).isNull, 1L).otherwise(0L))
      flagged
        .withColumn("session_id", sum(col("new_session")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          ((max(col("ts_ms")) - min(col("ts_ms"))) / lit(1000.0))
            .as("duration_sec"))
        .orderBy(col("user_id"), col("session_id"))
    }),


    // Gap-fill + forward fill (time-series resample): per-customer
    // daily order revenue with missing days materialized and the last
    // observed value carried forward. The day axis comes from
    // `sequence()` over each key's OWN [min, max] span (generated from
    // one aggregated row per key, so the fanout is computed
    // distributively and never shuffles); the fill is
    // `last(_, ignoreNulls)` over a running ROWS frame. At 100 TB the
    // (key, day) left join co-partitions both sides on the same keys
    // and the fill window rides the join's partitioning — no extra
    // exchange beyond the one the join needs.
    "q_gapfill" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val perDay = t(s, d, "orders")
        .where(col("o_custkey") % 100 === 1)
        .withColumn("day",
          expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
        .groupBy(col("o_custkey"), col("day"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      val days = perDay.groupBy(col("o_custkey"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("o_custkey"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(perDay, Seq("o_custkey", "day"), "left")
        .select(col("o_custkey"), col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          last(col("cents"), ignoreNulls = true).over(w).as("filled_cents"),
          when(col("n_orders").isNull, 1L).otherwise(0L).as("is_gap"))
        .orderBy(col("o_custkey"), col("day"))
    }),


    // CDC/upsert compaction: the latest version per key (SCD1 — what
    // a changelog materializes to). max_by over the (ts, id) total
    // order runs as a partial/final aggregate — one shuffle of one
    // row per key, never a window sort over the full history; ties
    // are impossible because event_id is unique within the order key.
    "q_cdc_latest" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      ev.groupBy(col("user_id"))
        .agg(max_by(struct(col("event_id"), col("event_type"), col("ts_ms")),
            struct(col("ts_ms"), col("event_id"))).as("last"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("last.event_id").as("event_id"),
          col("last.event_type").as("event_type"),
          col("last.ts_ms").as("ts_ms"), col("n_events"))
        .orderBy(col("user_id"))
    }),


    // The streaming CDC materialization executed in batch mode — the
    // same StreamOps.latestVersions mapGroupsWithState code path a live
    // changelog consumer runs incrementally (StreamingSpec asserts
    // stream == batch on this construction). Scored against the SAME
    // oracle as q_cdc_latest: per-key O(1) state replaying the (ts, id)
    // total order must materialize exactly what the batch max_by does.
    "q_cdc_stream_latest" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      implicit val enc =
        org.apache.spark.sql.Encoders.product[graft.streaming.StreamOps.EvV]
      graft.streaming.StreamOps.latestVersions(
          ev.as[graft.streaming.StreamOps.EvV])
        .toDF().orderBy(col("user_id"))
    }),


    // Slowly-changing-dimension Type-2 build from the same changelog:
    // collapse no-op updates (consecutive equal states under the
    // (ts, event_id) total order), then stamp each surviving change
    // with [valid_from, valid_to) and an is_current flag — the
    // dimension-versioning table every warehouse keeps next to its
    // CDC feed. Both windows share ONE partitioning (user_id), so the
    // whole build is a single exchange followed by two sort-free
    // window passes over the same partitions; at 100 TB it scales as
    // one shuffle of the changelog, and the %20 key gate stands in
    // for the per-entity routing a production feed would partition by.
    // valid_to of the open version is the classic 9999-12-31 sentinel
    // (epoch-micros) rather than NULL so the column stays a plain
    // BIGINT on both engines.
    "q_scd2_build" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .where(col("user_id") % 20 === 3)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val changes = ev
        .withColumn("prev_state", lag(col("event_type"), 1).over(w))
        .where(col("prev_state").isNull ||
          col("prev_state") =!= col("event_type"))
      changes
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to",
          coalesce(lead(col("ts_us"), 1).over(w),
            lit(253402300799000000L)))
        .select(col("user_id"), col("version"),
          col("event_type").as("state"),
          col("ts_us").as("valid_from"), col("valid_to"),
          when(col("valid_to") === 253402300799000000L, 1L)
            .otherwise(0L).as("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),


    // The streaming SCD2 maintenance executed in batch mode — the
    // same StreamOps.scd2Versions flatMapGroupsWithState path a live
    // CDC consumer runs incrementally (StreamingSpec asserts
    // stream == batch). Scored against the batch build's CLOSED rows
    // (is_current = 0): O(1) open-version state replaying the
    // (ts, event_id) total order must close exactly the versions the
    // batch lag/lead windows do.
    "q_stream_scd2" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("user_id") % 20 === 3)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      implicit val enc =
        org.apache.spark.sql.Encoders.product[graft.streaming.StreamOps.EvS]
      graft.streaming.StreamOps.scd2Versions(
          ev.as[graft.streaming.StreamOps.EvS])
        .toDF().orderBy(col("user_id"), col("version"))
    }),


    // Ordered funnel analysis (view → click → purchase): each stage's
    // entry event is the EARLIEST qualifying event strictly after the
    // previous stage's (total (ts, event_id) order — ties can't
    // wobble the funnel). Spark-first shape: per-stage argmin via
    // struct-min aggregation (partial/final, map-side combined) plus
    // a user-keyed join per stage — never a per-user sort window, so
    // at 100 TB each stage is one key-partitioned agg over only that
    // stage's events (the event_type filter prunes first).
    "q_events_funnel" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      def after(t0: org.apache.spark.sql.Column,
                id0: org.apache.spark.sql.Column) =
        col("ts_us") > t0 || (col("ts_us") === t0 && col("event_id") > id0)
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts_us"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.ts_us").as("view_us"),
          col("m.event_id").as("view_id"))
      val c = ev.where(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .where(after(col("view_us"), col("view_id")))
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts_us"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.ts_us").as("click_us"),
          col("m.event_id").as("click_id"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .where(after(col("click_us"), col("click_id")))
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts_us"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.ts_us").as("purchase_us"))
      ev.select(col("user_id")).distinct()
        .join(v.select(col("user_id"), col("view_us")), Seq("user_id"), "left")
        .join(c.select(col("user_id"), col("click_us")), Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("view_us"), lit(-1L)).as("view_us"),
          coalesce(col("click_us"), lit(-1L)).as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"),
          when(col("purchase_us").isNotNull, 3L)
            .when(col("click_us").isNotNull, 2L)
            .when(col("view_us").isNotNull, 1L)
            .otherwise(0L).as("funnel_stage"))
        .orderBy(col("user_id"))
    }),


    // Equi-width histogram (the profiling primitive q_profile_columns
    // doesn't cover): global [min, max] from one scalar aggregate
    // broadcast back, bins as floor((v−lo)·k/(hi−lo)) capped at k−1.
    // Every step is a correctly-rounded IEEE op on both engines, so
    // bin edges are bit-identical; two scans total and the second
    // groups straight into 20 rows.
    "q_histogram" -> ((s, d) => {
      val o = t(s, d, "orders")
      val mm = o.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(mm))
        // hi == lo (constant column) divides by zero, and the engines
        // disagree on where the row lands (Spark floor(NaN)→0, DuckDB
        // NULL→least skips→19) — pin the degenerate case to bin 0 on
        // BOTH sides
        .withColumn("bin",
          when(col("hi") === col("lo"), 0L)
            .otherwise(least(floor((col("o_totalprice") - col("lo"))
              * lit(20.0) / (col("hi") - col("lo"))), lit(19.0))
              .cast("long")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          Det.fsum2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("bin"))
    }),


    // Z-score anomaly gate: per-type mean/std from exact fixed-point
    // sums (1e-6 units; v and v² snapped per row, so the moments are
    // order-independent — overflow envelope: |v|≤500 here keeps v²
    // terms < 2.5e11, Long-safe to ~3.7e7 rows per type at this
    // scale; past that the moments move to DECIMAL like the
    // pairMomentsDec twin), outliers = |v−mean| > 3σ. The stats
    // frame is per-type-sized → broadcast back; two scans, no window.
    "q_anomaly_zscore" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_type"), col("value"))
      val stats = ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          (sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
            .cast("double") / lit(1e6)).as("sx"),
          (sum(floor(col("value") * col("value") * lit(1e6) + lit(0.5))
            .cast("long")).cast("double") / lit(1e6)).as("sxx"))
        .withColumn("mean", col("sx") / col("n"))
        // the two moments snap INDEPENDENTLY, so sxx/n − mean² can go
        // a hair negative on degenerate data (all values equal at
        // sub-1e-6 magnitude) — and the engines disagree on
        // sqrt(negative) (Spark NaN, DuckDB hard error). Clamp at 0
        // on BOTH sides.
        .withColumn("variance",
          greatest(col("sxx") / col("n") - col("mean") * col("mean"),
            lit(0.0)))
      ev.join(broadcast(stats), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Det.r4(min(col("mean"))).as("mean_value"),
          Det.r4(sqrt(min(col("variance")))).as("std_value"),
          sum(when(abs(col("value") - col("mean"))
              > lit(3.0) * sqrt(col("variance")), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    }),


    // Gaps-and-islands interval merge: each event claims a 5-minute
    // activity interval [ts, ts+5min); overlapping intervals per user
    // coalesce into islands, reported as per-user coverage (island
    // count, total covered ms, longest island). The merge is the
    // classic cumulative-max formulation — one window pass partitioned
    // by user — so at 100 TB it is a single hash-partitioned sort per
    // user key, never a self-join over intervals (the O(n²) trap) and
    // never a driver-side sweep. Total (st, event_id) order makes
    // island boundaries tie-stable.
    "q_interval_coverage" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("st"))
        .withColumn("en", col("st") + lit(300000L))
      graft.core.Intervals.coveragePerKey(
          graft.core.Intervals.mergePerKey(
            ev, "user_id", "st", "en", "event_id"), "user_id")
        .orderBy(col("user_id"))
    }),


    // INTERVAL-OVERLAP join (two interval SETS, not point-in-interval
    // like q_interval_join): per-user click islands × weekly promo
    // windows. The scale shape is the day-bucket join — each interval
    // explodes to its covered buckets, pairs meet on the bucket key,
    // and the `bucket == max(start buckets)` guard emits each
    // overlapping pair EXACTLY once (no distinct shuffle) — versus
    // the oracle's naive theta join, which is quadratic and only
    // DuckDB-affordable at test scale. Explode factor is bounded by
    // interval length / bucket width, so the plan stays linear in
    // covered time.
    "q_interval_overlap_join" -> ((s, d) => {
      val B = 86400000L // 1-day buckets
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("st"))
        .withColumn("en", col("st") + lit(300000L))
      val islands = graft.core.Intervals.mergePerKey(
        ev, "user_id", "st", "en", "event_id")
      val base = ev.agg(
        expr(s"(min(st) div $B) * $B").as("b0"))
      val promos = s.range(0, 10).select(col("id").as("promo_id"))
        .crossJoin(broadcast(base))
        .select(col("promo_id"),
          (col("b0") + col("promo_id") * lit(604800000L)).as("p_st"))
        .withColumn("p_en", col("p_st") + lit(172800000L))
      val aB = islands.withColumn("bucket",
        explode(sequence(expr(s"i_st div $B"), expr(s"i_en div $B"))))
      val pB = promos.withColumn("bucket",
        explode(sequence(expr(s"p_st div $B"), expr(s"p_en div $B"))))
      aB.join(pB, Seq("bucket"))
        .where(col("i_st") <= col("p_en") && col("p_st") <= col("i_en"))
        .where(col("bucket") ===
          greatest(expr(s"i_st div $B"), expr(s"p_st div $B")))
        .select(col("user_id"), col("island_id"), col("promo_id"),
          greatest(col("i_st"), col("p_st")).as("ov_st"),
          least(col("i_en"), col("p_en")).as("ov_en"))
        .withColumn("overlap_ms", col("ov_en") - col("ov_st"))
        .orderBy(col("user_id"), col("island_id"), col("promo_id"))
    }),


    // Point-in-interval (containment) join: is each purchase inside
    // one of the user's CLICK-activity islands (merged ±5-min click
    // intervals via core.Intervals)? Islands are disjoint by
    // construction (a new island opens only strictly past the
    // running max end), so each point matches at most one interval
    // and the left join is row-preserving. The join is user-keyed —
    // the equi key bounds the fan-out and carries the shuffle; the
    // range predicate rides along as the join filter (for unkeyed
    // interval joins, bucket the intervals like TemporalJoin.bandJoin
    // — same discipline, interval replicated per covered bucket).
    "q_interval_join" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_millis(col("ts")).as("tms"))
      val islands = graft.core.Intervals.mergePerKey(
        ev.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("tms").as("st"))
          .withColumn("en", col("st") + lit(300000L)),
        "user_id", "st", "en", "event_id")
      val purchases = ev.where(col("event_type") === "purchase")
      purchases.as("p").join(islands.as("i"),
          col("p.user_id") === col("i.user_id") &&
            col("p.tms") >= col("i.i_st") &&
            col("p.tms") <= col("i.i_en"), "left")
        .select(col("p.event_id"), col("p.user_id"),
          coalesce(col("i.i_st"), lit(-1L)).as("session_start"),
          col("i.i_st").isNotNull.cast("long").as("in_click_session"))
        .orderBy(col("p.event_id"))
    }),


    // Top session paths (sequence mining, first cut): sessionize as
    // in q_sessionize, render each session's event-type sequence as
    // a path string via a SORTED collect (struct sort on the (ts, id)
    // total order makes the collect order-independent), count path
    // frequencies, top-10. The per-session collect is bounded by
    // session length — state the size contract: paths are capped by
    // the session, never the user history.
    "q_session_paths" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val sessions = ev
        .withColumn("new_session",
          when(col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > 1800000L
            || lag(col("ts_ms"), 1).over(byUser).isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      val paths = sessions.groupBy(col("user_id"), col("session_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts_ms"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),


    // Event-type transition matrix (first-order Markov counts): per
    // user, each consecutive event pair over the (ts, event_id) total
    // order contributes one (from → to) transition; per-from
    // probabilities from a broadcast totals join (the from-state
    // vocabulary is enum-sized — never a window over the data). One
    // per-user lead window + two partial/final aggs at any scale.
    "q_event_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tms"), col("event_id"))
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("tms"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type"))
      val counts = pairs.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("from_type"))
        .agg(sum(col("n")).as("tot"))
      counts.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          Det.r4(col("n").cast("double") / col("tot").cast("double"))
            .as("p"))
        .orderBy(col("from_type"), col("to_type"))
    }),


    // Linear marketing attribution: each purchase splits its value
    // equally across the user's clicks in the prior 7 days. The
    // touch join runs through TemporalJoin.bandJoin — an equi-join on
    // (user, 7-day bucket), hash-partitionable, never a theta join —
    // and credit division is integer cents (`div`), so the split
    // replays exactly. Purchases with no touch keep credit 0.
    "q_attribution_linear" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("tms"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
          .as("value_c"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("tms"), col("value_c"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("tms"))
      val touches = graft.core.TemporalJoin
        .bandJoin(clicks, purchases, Seq("user_id"), "tms", "tms",
          604800000L)
        .groupBy(col("b_event_id").as("event_id"))
        .agg(count(lit(1)).as("n_touches"))
      purchases.join(touches, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("value_c"),
          coalesce(col("n_touches"), lit(0L)).as("n_touches"),
          when(col("n_touches").isNull, 0L)
            .otherwise(expr("value_c div n_touches")).as("credit_c"))
        .orderBy(col("event_id"))
    }),


    // First-touch attribution — q_attribution_linear's argmin
    // sibling: the EARLIEST click in the purchase's prior-7-day
    // window gets full credit (struct-min aggregation over the same
    // banded touch join — partial/final, map-side combined, never a
    // per-purchase sort window).
    "q_attribution_first_touch" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("tms"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
          .as("value_c"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("tms"), col("value_c"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("tms"))
      val firsts = graft.core.TemporalJoin
        .bandJoin(clicks, purchases, Seq("user_id"), "tms", "tms",
          604800000L)
        .groupBy(col("b_event_id").as("event_id"))
        .agg(min(struct(col("a_tms"), col("a_click_id"))).as("m"))
        .select(col("event_id"), col("m.a_tms").as("click_ms"),
          col("m.a_click_id").as("click_id"))
      purchases.join(firsts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("value_c"),
          coalesce(col("click_id"), lit(-1L)).as("first_click_id"),
          coalesce(col("tms") - col("click_ms"), lit(-1L)).as("gap_ms"))
        .orderBy(col("event_id"))
    }),


    // The stream-stream banded inner join run in BATCH mode — the
    // SAME StreamOps.touchJoinStream code path StreamingSpec drives
    // with two live MemoryStreams (the watermark nodes it attaches
    // are eliminated by Catalyst's EliminateEventTimeWatermark rule
    // in batch execution, so one declaration serves both modes).
    // Registering the batch twin makes the operator oracle-attested:
    // every (click, purchase-within-1h) pair with both ids + millis.
    // In streaming the band predicate is what BOUNDS join state
    // (Spark derives each side's retention from it); in batch it is
    // a user-keyed equi-join with a range residual — hash-
    // partitionable on user_id, never a theta join, so the same
    // declaration scales on both engines' physical strategies. The
    // join compares full µs-precision timestamps; only the emitted
    // columns truncate to ms.
    "q_touch_attribution" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      graft.streaming.StreamOps.touchJoinStream(clicks, purchases)
        .orderBy(col("click_id"), col("purchase_id"))
    }),


    // The LEFT-OUTER twin's batch surface — the "abandoned click"
    // feed (clicks that never see a purchase inside the band). In
    // streaming this is the deferred null-side emission StreamingSpec
    // proves (a non-match can only be declared after the watermark
    // passes the band's far edge); in batch the same declaration
    // reduces to a user-keyed left join filtered to the null side —
    // i.e. a band ANTI join, which is what the oracle spells.
    "q_touch_abandoned" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      graft.streaming.StreamOps.touchJoinLeftOuter(clicks, purchases)
        .where(col("purchase_id").isNull)
        .select(col("user_id"), col("click_id"), col("cts_ms"))
        .orderBy(col("click_id"))
    }),


    // The FULL-OUTER twin's batch surface — the complete
    // reconciliation feed (matched pairs + abandoned clicks + orphan
    // purchases), closing the stream-stream join matrix. The
    // streaming declaration defers BOTH null sides until the
    // respective watermark passes; in batch it reduces to a banded
    // full join. Nullable ids/millis are emitted as -1 sentinels so
    // the row order and the hash are engine-portable (event ids are
    // non-negative).
    "q_touch_full_outer" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      graft.streaming.StreamOps.touchJoinFullOuter(clicks, purchases)
        .select(col("user_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
          coalesce(col("cts_ms"), lit(-1L)).as("cts_ms"),
          coalesce(col("pts_ms"), lit(-1L)).as("pts_ms"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),


    // Closed sessions via flatMapGroupsWithState — the zero-or-many-
    // outputs stateful shape (mapGroupsWithState can't express it):
    // per-user state buffers the open run, every gap-delimited run
    // except the last is emitted as a closed session. Executed in
    // batch and scored against the window-formulated oracle MINUS
    // each user's final (still-open) session — exactly what the
    // operator guarantees a live stream will have emitted so far.
    "q_stream_closed_sessions" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
      implicit val enc = org.apache.spark.sql.Encoders
        .product[graft.streaming.StreamOps.Ev2]
      graft.streaming.StreamOps.closedSessions(
          ev.as[graft.streaming.StreamOps.Ev2])
        .toDF().orderBy(col("user_id"), col("start_ms"))
    }),


    // Hopping (sliding) event-time windows — the third window shape
    // beside tumbling (q_tumbling_window_counts) and session
    // (q_session_window): 1-hour windows every 30 minutes, so each
    // event lands in exactly width/slide = 2 windows. Spark's `window`
    // with a slide does the fan-out inside the grouping expression
    // (Expand, in place, zero extra shuffle); the oracle replays it as
    // an explicit 2-offset unnest. Same partial/final agg shape as
    // tumbling at any scale.
    "q_sliding_window_counts" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Det.fsum4(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))),


    // Watermark-sizing audit: how out-of-order is the stream, keyed
    // the way the stateful operators key it (per user)? Lateness of
    // an event = how far the user's already-ingested maximum event
    // time (arrival order = event_id, the ingest sequence) is ahead
    // of this event's time. The per-type rollup is what picks a
    // `withWatermark` delay: n beyond 10 min = rows a 10-min
    // watermark would drop. One per-user-partitioned running-max
    // window — never a global sort — then a partial/final agg.
    "q_late_events" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"), unix_millis(col("ts")).as("tms"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("late_ms",
          greatest(coalesce(max(col("tms")).over(w) - col("tms"), lit(0L)),
            lit(0L)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late_ms") > 600000L, 1L).otherwise(0L))
            .as("n_late_10m"),
          max(col("late_ms")).as("max_late_ms"),
          sum(col("late_ms")).as("sum_late_ms"))
        .orderBy(col("event_type"))
    }),


    // Cohort retention: users bucketed by first-activity week, cells
    // count distinct users active at each week offset — the
    // engagement matrix every growth dashboard reads. Shape at
    // 100 TB: first-week is a per-user partial/final min (history
    // never windows), the join is user-keyed, and the distinct runs
    // on (cohort, offset, user) — already near the output size.
    "q_user_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 604800000").as("wk"))
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      ev.join(first, Seq("user_id"))
        .select(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("week_offset"), col("user_id"))
        .distinct()
        .groupBy(col("cohort_wk"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    }),


    // Clamped running balance (credit ledger): purchases SPEND value,
    // every other event EARNS it, and the balance floors at zero —
    // b_i = max(0, b_{i−1} + δ_i), a NON-LINEAR recurrence no window
    // frame can express (running sums distribute; the clamp does
    // not). The engine path is the typed per-key fold — groupByKey →
    // mapGroups over the (ts, event_id)-sorted history — which is
    // exactly one user_id shuffle and O(user history) memory per
    // group; the oracle replays the recurrence as a recursive CTE
    // stepping rank-by-rank. Emits the audit row a ledger close
    // needs: final balance plus how often the floor bound (declined
    // spend) was hit.
    "q_clamped_balance" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events").select(
        col("user_id").as("_1"), col("event_id").as("_2"),
        unix_micros(col("ts")).as("_3"),
        when(col("event_type") === "purchase",
          -floor(col("value") * 100 + 0.5).cast("long"))
          .otherwise(floor(col("value") * 100 + 0.5).cast("long"))
          .as("_4"))
        .as[(Long, Long, Long, Long)]
      ev.groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val evs = it.toArray.sortBy(e => (e._3, e._2))
          var b = 0L; var clamps = 0L
          evs.foreach { e =>
            val nb = b + e._4
            if (nb < 0L) { clamps += 1L; b = 0L } else b = nb
          }
          (uid, evs.length.toLong, b, clamps)
        }
        .toDF("user_id", "n_events", "final_balance_c", "n_clamped")
        .orderBy(col("user_id"))
    }),


    // Volume concentration (the 80/20 read-out): how much of total
    // event volume the top-decile users carry — the skew number a
    // capacity plan and an abuse review both start from. The decile
    // cut is a BROADCAST VALUE THRESHOLD from the distributed
    // order-statistic path (the RFM/equidepth discipline — never a
    // global rank window over all users), so the whole query is two
    // partial/final aggregates and one scalar: users at or above the
    // 0.9-fraction element count as top-decile (value ties land
    // together, deterministically). Share is ×10⁴ integer fixed
    // point.
    "q_user_concentration" -> ((s, d) => {
      val totals = t(s, d, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
      val t90 = graft.core.Quantiles.valueAtFractionMemo(
        totals, "n", 0.9, s"conc_t90:$d").toLong
      totals.agg(
          count(lit(1)).as("users"),
          sum(col("n")).as("events"),
          sum(when(col("n") >= t90, 1L).otherwise(0L)).as("users_top"),
          sum(when(col("n") >= t90, col("n")).otherwise(0L))
            .as("events_top"))
        .select(col("users"), col("events"), col("users_top"),
          col("events_top"), lit(t90).as("t90"),
          expr("events_top * 10000 div events").as("share_x10000"))
    }),


    // Time-weighted average (TWAP): each event's value holds until
    // the user's next event, so the mean is duration-weighted —
    // Σ value·Δt / Σ Δt — the read-out a plain avg() gets wrong
    // whenever sampling is irregular (a price that sat at 490 for a
    // week outweighs fifty one-second ticks at 0.01). One lead()
    // window per user (single user_id exchange); value in cents and
    // Δt in micros keep the weighted sum an exact BIGINT (max
    // 5·10⁴ cents × ~10¹² µs per interval ≪ 2⁶³); the division is
    // the only floating step, r4-snapped. The (ts, event_id) total
    // order pins tie durations to zero deterministically.
    "q_time_weighted_avg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events").select(col("user_id"),
        col("event_id"), unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_c"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      ev.withColumn("dt", lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .where(col("dt").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("value_c") * col("dt")).as("sum_vdt"),
          sum(col("dt")).as("sum_dt"))
        .select(col("user_id"), col("n_intervals"), col("sum_vdt"),
          col("sum_dt"),
          Det.r4(col("sum_vdt").cast("double") /
            col("sum_dt").cast("double") / 100.0).as("twa"))
        .orderBy(col("user_id"))
    }),


    // Cohort REVENUE (LTV matrix): the monetary complement of
    // q_user_retention — customers cohorted by first-order month,
    // revenue accumulated per (cohort, month-age) cell. Same scale
    // shape: cohort assignment is a per-customer partial/final min,
    // the join back is customer-keyed (co-partitioned, no broadcast
    // needed at 100 TB), and the cell rollup is one partial/final
    // agg near output size. Month axis is the integer year·12+month−1
    // index (the q_sql_recursive axis) so every column stays BIGINT.
    "q_cohort_revenue" -> ((s, d) => {
      val om = t(s, d, "orders").select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("k"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val c0 = om.groupBy(col("o_custkey")).agg(min(col("k")).as("k0"))
      om.join(c0, Seq("o_custkey"))
        .groupBy(col("k0").as("cohort_k"), (col("k") - col("k0")).as("age"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          sum(col("cents")).as("cents"))
        .orderBy(col("cohort_k"), col("age"))
    }),


    // Time-in-state accounting from a changelog (the SCD2 read-out):
    // each event opens a state version valid until the user's next
    // event (lead over the (ts, event_id) total order; the open
    // version closes at the user's last observation, contributing 0).
    // Per user: version count + milliseconds spent in each event-type
    // state, statuses pinned as columns (no discovery pass). One
    // per-user window + one agg — the warehouse-dimension build that
    // never joins history to itself.
    "q_state_durations" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tms"), col("event_id"))
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
          col("event_type"), unix_millis(col("ts")).as("tms"))
        .withColumn("dur_ms",
          coalesce(lead(col("tms"), 1).over(w) - col("tms"), lit(0L)))
      def inState(st: String) =
        sum(when(col("event_type") === st, col("dur_ms")).otherwise(0L))
          .as(s"${st}_ms")
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_versions"), inState("click"),
          inState("view"), inState("purchase"), inState("signup"),
          inState("error"))
        .orderBy(col("user_id"))
    }),


    // Running per-user totals via mapGroupsWithState — the
    // arbitrary-state streaming surface (q_cdc_stream_latest's
    // sibling, accumulate-forever instead of latest-wins) executed in
    // batch and scored against the plain groupBy oracle. Values snap
    // to integer cents BEFORE the stateful fold: batch
    // mapGroupsWithState hands each group's rows in shuffle order, so
    // only a commutative integer state is bit-stable (the Double
    // variant stays a spec-level demo). State is O(1) per key.
    "q_stream_user_totals" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
          .as("value_c"))
      implicit val enc = org.apache.spark.sql.Encoders
        .product[graft.streaming.StreamOps.EvFx]
      graft.streaming.StreamOps.runningUserTotalsFx(
          ev.as[graft.streaming.StreamOps.EvFx])
        .toDF().orderBy(col("user_id"))
    }),


    // Rolling 7-day distinct users per day — the trailing-window
    // COUNT(DISTINCT) that no window frame can express (distinct is
    // not decomposable over frames). The scalable shape: dedupe to
    // (user, day) FIRST (the only pass that touches raw events; at
    // 100 TB this collapses billions of rows to |users|·|days|), then
    // a BOUNDED fan-out — each pair contributes to exactly the 7
    // target days [d, d+6] via explode(sequence(...)) — and a
    // partial-agg'd countDistinct per target day. Fan-out is 7×
    // regardless of scale; contrast a days×events range join, which
    // rescans the corpus per day. The left_semi against observed days
    // keeps the day axis data-derived (no trailing phantom days).
    "q_rolling_distinct" -> ((s, d) => {
      val ud = t(s, d, "events")
        .select(expr("unix_millis(ts) div 86400000").as("d0"),
          col("user_id"))
        .distinct()
      val days = ud.select(col("d0").as("day")).distinct()
      ud.select(col("user_id"),
          explode(sequence(col("d0"), col("d0") + lit(6L))).as("day"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("users_7d"))
        .orderBy(col("day"))
    }),


    // The same rolling-distinct read-out via MERGEABLE HLL sketches —
    // the shape that survives when even (user, day) is too wide to
    // re-aggregate per window: one sketch per day built in a single
    // pass over events (partial-agg'd like any sum), then the 7-day
    // union merges the ~KB sketches, never the raw rows. A day's
    // sketch is built ONCE and reused by all 7 windows it feeds — the
    // pre-aggregated-sketch pattern (Datasketches HLL; Heule et al.
    // HLL++): any window, any grouping rollup, from the same partials.
    // Estimates are engine-internal, so the checkable surface is the
    // acceptance read-out vs the exact twin (lgK=12 → ~1.6% rel.
    // error; 5% gate), per day — the q_ann_recall discipline: serving
    // path and measurement in one plan, sharing the day axis.
    "q_rolling_hll" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(expr("unix_millis(ts) div 86400000").as("d0"),
          col("user_id"))
      val perDay = ev.groupBy(col("d0"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val days = perDay.select(col("d0").as("day"))
      val approx = perDay
        .select(explode(sequence(col("d0"), col("d0") + lit(6L)))
          .as("day"), col("sk"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
      val exact = ev.distinct()
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d0") + lit(6L))).as("day"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("x"))
      approx.join(exact, Seq("day"))
        .select(col("day"),
          (abs(col("a") - col("x")).cast("double") /
            col("x").cast("double") <= lit(0.05)).as("within_bounds"))
        .orderBy(col("day"))
    }),


    // Misra–Gries heavy hitters (core.HeavyHitters): the bounded-
    // memory frequent-items pass for long-tail key spaces where the
    // exact groupBy is the expensive thing (here that groupBy IS the
    // acceptance measurement, like q_ann_recall's exact side — the
    // product at 100 TB is the ≤ k·P-row summary). Key space is a
    // head/tail mixture carved from events: rows of users ≡ 0 (mod 4)
    // keep their event_type (5 hot keys, ~500 rows each), the rest
    // key by user id (~110 tail keys, ~70 rows each) — tail evictions
    // are real at k=49. The mergeable-summaries guarantee (Agarwal et
    // al.): after the partition merge tree, true − n/(k+1) ≤ est ≤
    // true, so every key above n/(k+1) = n div 50 is present and
    // in-envelope; the oracle replays the exact heavy set and expects
    // all-true — presence AND both bounds, per key.
    "q_heavy_hitters" -> ((s, d) => {
      val keyed = t(s, d, "events")
        .select(when(col("user_id") % 4 === 0, col("event_type"))
          .otherwise(concat(lit("u"), col("user_id"))).as("k"))
      val mg = graft.core.HeavyHitters.summarize(keyed, "k", 49)
      val total = keyed.agg(count(lit(1)).as("n"))
      keyed.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .where(col("cnt") > expr("n div 50"))
        .join(mg, Seq("k"), "left")
        .select(col("k").as("probe_key"),
          (col("est").isNotNull && col("est") <= col("cnt") &&
            col("cnt") - col("est") <= expr("n div 50"))
            .as("within_bounds"))
        .orderBy(col("probe_key"))
    }),


    // EWMA trend per event type — the exponentially-weighted daily
    // read-out a monitoring pipeline smooths with. Half-life = 1 day
    // (α = 1/2) makes every weight an exact power of two, so the
    // whole ledger is INTEGER: daily cents × 2^(13−lag) summed over
    // the bounded 14-day fan-out (the q_rolling_distinct shape), one
    // IEEE division at the end. No recursion, no running state, no
    // double accumulation — any engine, any partitioning, same bits.
    // Weights renormalize over the days actually present (both
    // engines derive the same denominator from the same rows).
    "q_ewma_trend" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("vc")).as("v"))
      val days = daily.select(col("day").as("wday")).distinct()
      daily.select(col("event_type"), col("day"), col("v"),
          explode(sequence(col("day"), col("day") + lit(13L))).as("wday"))
        .join(days, Seq("wday"), "left_semi")
        .withColumn("w",
          expr("shiftleft(1L, cast(13 - (wday - day) as int))"))
        .groupBy(col("event_type"), col("wday"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("v") * col("w")).as("num"), sum(col("w")).as("den"))
        .select(col("event_type"), col("wday").as("day"), col("n_days"),
          Det.r4(col("num").cast("double") / col("den").cast("double") /
            lit(100.0)).as("ewma"))
        .orderBy(col("event_type"), col("day"))
    }),


    // Trending items: heavy hitters per TRAILING 7-day window from
    // per-day Misra–Gries partials — the sliding-window composition
    // of q_heavy_hitters and q_rolling_distinct's fan-out. Each day's
    // k-counter partials are built ONCE (grouped kernel, state ≤
    // days×k per partition) and every window merges them by exact
    // summation; per-day MG errors ADD to exactly the window envelope
    // (Σ n_day/(k+1) = n_w/(k+1) — the mergeable-summaries bound
    // again), so every key above n_w div 50 in a window is present
    // and in-envelope with k=49. The raw-row exact side here is the
    // acceptance measurement; the product at 100 TB is the per-day
    // partial table any window can replay without touching rows.
    "q_trending_items" -> ((s, d) => {
      val keyed = t(s, d, "events")
        .select(expr("unix_millis(ts) div 86400000").as("day"),
          when(col("user_id") % 4 === 0, col("event_type"))
            .otherwise(concat(lit("u"), col("user_id"))).as("k"))
      val days = keyed.select(col("day")).distinct()
        .select(col("day").as("wday"))
      def fan(df: DataFrame) = df
        .select(col("*"), explode(sequence(col("day"), col("day") + lit(6L)))
          .as("wday"))
        .join(days, Seq("wday"), "left_semi")
      val mgWin = fan(graft.core.HeavyHitters
          .summarizeByGroup(keyed, "day", "k", 49))
        .groupBy(col("wday"), col("k")).agg(sum(col("est")).as("est"))
      val exactWin = fan(keyed.groupBy(col("day"), col("k"))
          .agg(count(lit(1)).as("c")))
        .groupBy(col("wday"), col("k")).agg(sum(col("c")).as("cnt"))
      val nWin = fan(keyed.groupBy(col("day")).agg(count(lit(1)).as("nd")))
        .groupBy(col("wday")).agg(sum(col("nd")).as("n"))
      exactWin.join(nWin, Seq("wday"))
        .where(col("cnt") > expr("n div 50"))
        .join(mgWin, Seq("wday", "k"), "left")
        .select(col("wday").as("day"), col("k").as("probe_key"),
          (col("est").isNotNull && col("est") <= col("cnt") &&
            col("cnt") - col("est") <= expr("n div 50"))
            .as("within_bounds"))
        .orderBy(col("day"), col("probe_key"))
    }),


    // Sketch-partial REUSE across rollup levels: per-(type, day) HLL
    // partials built in ONE pass over events, then unioned two ways —
    // per type (across days) and globally — without rescanning rows.
    // This is the property that makes sketch columns a storage format
    // at 100 TB (store partials at the finest grain; answer every
    // coarser distinct-rollup by merging ~KB sketches), and it is
    // exactly what exact countDistinct CANNOT do: distinct counts are
    // not decomposable, so each exact rollup level is its own shuffle
    // of raw keys. Acceptance read-out per level vs the exact twin
    // (the q_rolling_hll discipline); '_all' is the grand-total row.
    "q_hll_rollup" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      val parts = ev.groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val byType = parts.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
      val global = parts
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
        .select(lit("_all").as("event_type"), col("a"))
      val exactT = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("x"))
      val exactG = ev.agg(countDistinct(col("user_id")).as("x"))
        .select(lit("_all").as("event_type"), col("x"))
      byType.unionByName(global)
        .join(exactT.unionByName(exactG), Seq("event_type"))
        .select(col("event_type").as("level_key"),
          (abs(col("a") - col("x")).cast("double") /
            col("x").cast("double") <= lit(0.05)).as("within_bounds"))
        .orderBy(col("level_key"))
    }),
  )

  val oracles: Map[String, String] = Map(

    "q_tumbling_window_counts" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         |         AS window_start,
         |       event_type, count(*) AS n,
         |       ${fsum4("value")} AS sum_value
         |FROM events GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,


    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_ms,
        |         CASE WHEN ts_ms - lag(ts_ms) OVER w > 1800000
        |                OR lag(ts_ms) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, ts_ms,
        |         sum(new_session) OVER (PARTITION BY user_id
        |                                ORDER BY ts_ms, event_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING
        |                                AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       count(*) AS n_events,
        |       CAST(max(ts_ms) - min(ts_ms) AS DOUBLE) / 1000.0
        |         AS duration_sec
        |FROM sessions GROUP BY 1, 2
        |ORDER BY user_id, session_id""".stripMargin,


    // Gap-fill: same per-key generate_series axis + IGNORE NULLS
    // forward fill. cents stays integral end-to-end (sum of
    // half-up-floored cents; BIGINT cast because DuckDB promotes
    // sum(BIGINT) to HUGEINT).
    "q_gapfill" ->
      """WITH o AS (
        |  SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day,
        |         count(*) AS n_orders,
        |         CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey % 100 = 1 GROUP BY 1, 2),
        |s AS (SELECT o_custkey, min(day) AS d0, max(day) AS d1
        |      FROM o GROUP BY 1),
        |days AS (SELECT o_custkey,
        |                unnest(generate_series(d0, d1)) AS day FROM s),
        |j AS (SELECT days.o_custkey, days.day, o.n_orders, o.cents
        |      FROM days LEFT JOIN o ON o.o_custkey = days.o_custkey
        |                           AND o.day = days.day)
        |SELECT o_custkey, day,
        |       coalesce(n_orders, 0) AS n_orders,
        |       last_value(cents IGNORE NULLS)
        |         OVER (PARTITION BY o_custkey ORDER BY day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS filled_cents,
        |       CASE WHEN n_orders IS NULL THEN CAST(1 AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS is_gap
        |FROM j ORDER BY o_custkey, day""".stripMargin,


    // CDC latest: row_number replay of the max_by total order. The
    // streaming materialization (q_cdc_stream_latest) must land on the
    // identical table, so both keys share one oracle.
    "q_cdc_latest" -> cdcLatestSql,

    "q_cdc_stream_latest" -> cdcLatestSql,


    // SCD2: the oracle replays the same two-window construction; the
    // second window re-ranks over the CHANGE rows only (both engines
    // evaluate the window after the no-op filter), and the open
    // version's valid_to is the 9999-12-31T23:59:59Z epoch-micros
    // sentinel so every column stays BIGINT.
    "q_scd2_build" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events WHERE user_id % 20 = 3),
        |chg AS (
        |  SELECT * FROM (
        |    SELECT user_id, event_id, event_type, ts_us,
        |           lag(event_type) OVER (PARTITION BY user_id
        |                                 ORDER BY ts_us, event_id)
        |             AS prev_state
        |    FROM ev)
        |  WHERE prev_state IS NULL OR prev_state <> event_type)
        |SELECT user_id,
        |       CAST(row_number() OVER w AS BIGINT) AS version,
        |       event_type AS state,
        |       ts_us AS valid_from,
        |       coalesce(lead(ts_us) OVER w,
        |                CAST(253402300799000000 AS BIGINT)) AS valid_to,
        |       CASE WHEN lead(ts_us) OVER w IS NULL
        |            THEN CAST(1 AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version""".stripMargin,


    // Streaming SCD2: exactly the batch build's closed rows — the
    // lead() window defines valid_to, and rows whose lead is NULL
    // (the open version) stay in operator state, not in the stream.
    "q_stream_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events WHERE user_id % 20 = 3),
        |chg AS (
        |  SELECT * FROM (
        |    SELECT user_id, event_id, event_type, ts_us,
        |           lag(event_type) OVER (PARTITION BY user_id
        |                                 ORDER BY ts_us, event_id)
        |             AS prev_state
        |    FROM ev)
        |  WHERE prev_state IS NULL OR prev_state <> event_type),
        |ver AS (
        |  SELECT user_id,
        |         CAST(row_number() OVER w AS BIGINT) AS version,
        |         event_type AS state,
        |         ts_us AS valid_from,
        |         lead(ts_us) OVER w AS valid_to
        |  FROM chg
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, version, state, valid_from, valid_to
        |FROM ver WHERE valid_to IS NOT NULL
        |ORDER BY user_id, version""".stripMargin,


    // The oracle spells each stage argmin as a ranked window — the
    // spelling the engine must NOT use at scale (see the query's
    // struct-min shape); values agree because both respect the same
    // (ts_us, event_id) total order.
    "q_events_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |v AS (
        |  SELECT user_id, ts_us AS view_us, event_id AS view_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |                                 ORDER BY ts_us, event_id) AS rn
        |    FROM ev WHERE event_type = 'view') WHERE rn = 1),
        |c AS (
        |  SELECT user_id, ts_us AS click_us, event_id AS click_id FROM (
        |    SELECT e.user_id, e.ts_us, e.event_id,
        |           row_number() OVER (PARTITION BY e.user_id
        |                              ORDER BY e.ts_us, e.event_id) AS rn
        |    FROM ev e JOIN v ON v.user_id = e.user_id
        |    WHERE e.event_type = 'click'
        |      AND (e.ts_us > v.view_us
        |           OR (e.ts_us = v.view_us AND e.event_id > v.view_id)))
        |  WHERE rn = 1),
        |p AS (
        |  SELECT user_id, ts_us AS purchase_us FROM (
        |    SELECT e.user_id, e.ts_us,
        |           row_number() OVER (PARTITION BY e.user_id
        |                              ORDER BY e.ts_us, e.event_id) AS rn
        |    FROM ev e JOIN c ON c.user_id = e.user_id
        |    WHERE e.event_type = 'purchase'
        |      AND (e.ts_us > c.click_us
        |           OR (e.ts_us = c.click_us AND e.event_id > c.click_id)))
        |  WHERE rn = 1),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id,
        |       COALESCE(v.view_us, -1) AS view_us,
        |       COALESCE(c.click_us, -1) AS click_us,
        |       COALESCE(p.purchase_us, -1) AS purchase_us,
        |       CAST(CASE WHEN p.purchase_us IS NOT NULL THEN 3
        |                 WHEN c.click_us IS NOT NULL THEN 2
        |                 WHEN v.view_us IS NOT NULL THEN 1
        |                 ELSE 0 END AS BIGINT) AS funnel_stage
        |FROM u
        |LEFT JOIN v ON v.user_id = u.user_id
        |LEFT JOIN c ON c.user_id = u.user_id
        |LEFT JOIN p ON p.user_id = u.user_id
        |ORDER BY u.user_id""".stripMargin,


    // Histogram: identical IEEE bin arithmetic.
    "q_histogram" ->
      s"""WITH mm AS (
         |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
         |  FROM orders)
         |SELECT CAST(CASE WHEN hi = lo THEN 0
         |                 ELSE least(floor((o_totalprice - lo) * 20.0
         |                            / (hi - lo)), 19.0)
         |            END AS BIGINT) AS bin,
         |       count(*) AS n,
         |       ${fsum2("o_totalprice")} AS sum_price
         |FROM orders CROSS JOIN mm
         |GROUP BY 1 ORDER BY bin""".stripMargin,


    // Z-score: the same fixed-point moments, mean/variance spelled in
    // the same association order, 3σ gate on identical doubles.
    "q_anomaly_zscore" ->
      s"""WITH ev AS (SELECT event_type, value FROM events),
         |st AS (
         |  SELECT event_type, count(*) AS n,
         |         CAST(sum(CAST(floor(value*1000000.0 + 0.5) AS BIGINT))
         |              AS DOUBLE)/1000000.0 AS sx,
         |         CAST(sum(CAST(floor(value*value*1000000.0 + 0.5)
         |              AS BIGINT)) AS DOUBLE)/1000000.0 AS sxx
         |  FROM ev GROUP BY 1),
         |st2 AS (SELECT *, sx/n AS mean FROM st),
         |stats AS (SELECT *, greatest(sxx/n - mean*mean, 0.0) AS variance
         |          FROM st2)
         |SELECT e.event_type, count(*) AS n_events,
         |       ${r4("min(mean)")} AS mean_value,
         |       ${r4("sqrt(min(variance))")} AS std_value,
         |       CAST(sum(CASE WHEN abs(e.value - mean) > 3.0*sqrt(variance)
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM ev e JOIN stats USING (event_type)
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same cumulative-max island formulation (ANSI windows).
    "q_interval_coverage" ->
      s"""WITH $islandsCtes
        |SELECT user_id, count(*) AS n_islands,
        |       CAST(sum(i_en - i_st) AS BIGINT) AS covered_ms,
        |       CAST(max(i_en - i_st) AS BIGINT) AS max_island_ms
        |FROM islands GROUP BY 1 ORDER BY user_id""".stripMargin,


    // The deliberately NAIVE theta-join spelling — what the engine's
    // bucket-join must equal.
    "q_interval_overlap_join" ->
      s"""WITH $islandsCtes,
        |base AS (SELECT (min(st) // 86400000) * 86400000 AS b0 FROM ev),
        |pw AS (
        |  SELECT promo_id, b0 + promo_id*604800000 AS p_st,
        |         b0 + promo_id*604800000 + 172800000 AS p_en
        |  FROM (SELECT unnest(range(0, 10)) AS promo_id) CROSS JOIN base)
        |SELECT i.user_id, CAST(i.island_id AS BIGINT) AS island_id,
        |       p.promo_id,
        |       greatest(i.i_st, p.p_st) AS ov_st,
        |       least(i.i_en, p.p_en) AS ov_en,
        |       CAST(least(i.i_en, p.p_en) - greatest(i.i_st, p.p_st)
        |            AS BIGINT) AS overlap_ms
        |FROM islands i JOIN pw p
        |  ON i.i_st <= p.p_en AND p.p_st <= i.i_en
        |ORDER BY user_id, island_id, promo_id""".stripMargin,


    "q_interval_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, tms AS st, tms + 300000 AS en
        |  FROM ev WHERE event_type = 'click'),
        |flagged AS (
        |  SELECT user_id, event_id, st, en,
        |         CASE WHEN max(en) OVER w IS NULL OR st > max(en) OVER w
        |              THEN 1 ELSE 0 END AS new_island
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY st, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND 1 PRECEDING)),
        |numbered AS (
        |  SELECT user_id, st, en,
        |         sum(new_island) OVER (PARTITION BY user_id
        |                               ORDER BY st, event_id
        |                               ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND CURRENT ROW) AS island_id
        |  FROM flagged),
        |islands AS (
        |  SELECT user_id, min(st) AS i_st, max(en) AS i_en
        |  FROM numbered GROUP BY user_id, island_id),
        |p AS (SELECT user_id, event_id, tms FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |       coalesce(i.i_st, -1) AS session_start,
        |       CAST(CASE WHEN i.i_st IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |         AS in_click_session
        |FROM p LEFT JOIN islands i
        |  ON i.user_id = p.user_id
        | AND p.tms >= i.i_st AND p.tms <= i.i_en
        |ORDER BY p.event_id""".stripMargin,


    // Same boundary as q_sessionize (> 30 min opens a session);
    // string_agg with an explicit ORDER BY mirrors the engine's
    // sorted-struct collect.
    "q_session_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, event_type, ts_ms,
        |         CASE WHEN ts_ms - lag(ts_ms) OVER w > 1800000
        |                OR lag(ts_ms) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |sessions AS (
        |  SELECT user_id, event_type, ts_ms, event_id,
        |         sum(new_session) OVER (PARTITION BY user_id
        |                                ORDER BY ts_ms, event_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING
        |                                AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |paths AS (
        |  SELECT user_id, session_id,
        |         string_agg(event_type, '>' ORDER BY ts_ms, event_id)
        |           AS path
        |  FROM sessions GROUP BY 1, 2)
        |SELECT path, count(*) AS n
        |FROM paths GROUP BY 1
        |ORDER BY n DESC, path LIMIT 10""".stripMargin,


    "q_event_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY tms, event_id) AS to_type
        |  FROM ev),
        |counts AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |totals AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
        |  FROM counts GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |       floor((CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))*10000
        |             + 0.5)/10000.0 AS p
        |FROM counts c JOIN totals t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,


    "q_attribution_linear" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS tms,
        |         CAST(floor(value*100.0 + 0.5) AS BIGINT) AS value_c
        |  FROM events),
        |p AS (SELECT user_id, event_id, tms, value_c FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, tms FROM ev WHERE event_type = 'click'),
        |tch AS (
        |  SELECT p.event_id, count(*) AS n
        |  FROM p JOIN c ON c.user_id = p.user_id
        |   AND c.tms <= p.tms AND p.tms - c.tms <= 604800000
        |  GROUP BY 1)
        |SELECT p.event_id, p.user_id, p.value_c,
        |       coalesce(t.n, 0) AS n_touches,
        |       CASE WHEN t.n IS NULL THEN 0
        |            ELSE p.value_c // t.n END AS credit_c
        |FROM p LEFT JOIN tch t ON t.event_id = p.event_id
        |ORDER BY p.event_id""".stripMargin,


    "q_attribution_first_touch" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS tms,
        |         CAST(floor(value*100.0 + 0.5) AS BIGINT) AS value_c
        |  FROM events),
        |p AS (SELECT user_id, event_id, tms, value_c FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id, tms FROM ev
        |      WHERE event_type = 'click'),
        |ft AS (
        |  SELECT p.event_id, c.tms AS click_ms, c.click_id,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY c.tms, c.click_id) AS rn
        |  FROM p JOIN c ON c.user_id = p.user_id
        |   AND c.tms <= p.tms AND p.tms - c.tms <= 604800000)
        |SELECT p.event_id, p.user_id, p.value_c,
        |       coalesce(f.click_id, -1) AS first_click_id,
        |       coalesce(p.tms - f.click_ms, -1) AS gap_ms
        |FROM p LEFT JOIN (SELECT * FROM ft WHERE rn = 1) f
        |  ON f.event_id = p.event_id
        |ORDER BY p.event_id""".stripMargin,


    // Touch join: the band replayed at full µs precision (events
    // carry sub-ms timestamps; the engine compares TIMESTAMPs, so
    // the oracle must band on epoch_us, not the emitted ms).
    "q_touch_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, tus AS ctus
        |      FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, tus AS ptus
        |      FROM ev WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, p.purchase_id,
        |       c.ctus // 1000 AS cts_ms, p.ptus // 1000 AS pts_ms
        |FROM c JOIN p ON p.user_id = c.user_id
        |  AND p.ptus >= c.ctus AND p.ptus <= c.ctus + 3600000000
        |ORDER BY c.click_id, p.purchase_id""".stripMargin,


    // Abandoned clicks: the null side as a µs-banded anti join.
    "q_touch_abandoned" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, tus AS ctus
        |      FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, tus AS ptus
        |      FROM ev WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.ctus // 1000 AS cts_ms
        |FROM c WHERE NOT EXISTS (
        |  SELECT 1 FROM p WHERE p.user_id = c.user_id
        |    AND p.ptus >= c.ctus AND p.ptus <= c.ctus + 3600000000)
        |ORDER BY c.click_id""".stripMargin,


    // Full-outer touch join: the banded FULL JOIN with -1 sentinels
    // on both null sides (ids are non-negative), so row order and
    // cell hashes are engine-portable without a null-ordering
    // convention.
    "q_touch_full_outer" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, tus AS ctus
        |      FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, event_id AS purchase_id,
        |             tus AS ptus
        |      FROM ev WHERE event_type = 'purchase')
        |SELECT COALESCE(c.user_id, p.p_user) AS user_id,
        |       COALESCE(c.click_id, -1) AS click_id,
        |       COALESCE(p.purchase_id, -1) AS purchase_id,
        |       COALESCE(c.ctus // 1000, -1) AS cts_ms,
        |       COALESCE(p.ptus // 1000, -1) AS pts_ms
        |FROM c FULL JOIN p ON p.p_user = c.user_id
        |  AND p.ptus >= c.ctus AND p.ptus <= c.ctus + 3600000000
        |ORDER BY 2, 3""".stripMargin,


    // closedSessions continues a run while gap < 30 min, so a NEW
    // session opens at gap >= 30 min (note: q_sessionize's boundary
    // is strictly >); each user's last session is open, not emitted.
    "q_stream_closed_sessions" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |flagged AS (
        |  SELECT user_id, ts_ms,
        |         CASE WHEN lag(ts_ms) OVER w IS NULL
        |                OR ts_ms - lag(ts_ms) OVER w >= 1800000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
        |sessions AS (
        |  SELECT user_id, ts_ms,
        |         sum(new_session) OVER (PARTITION BY user_id
        |                                ORDER BY ts_ms
        |                                ROWS BETWEEN UNBOUNDED PRECEDING
        |                                AND CURRENT ROW) AS sid
        |  FROM flagged),
        |agg AS (
        |  SELECT user_id, sid, min(ts_ms) AS start_ms,
        |         max(ts_ms) AS end_ms, count(*) AS n_events
        |  FROM sessions GROUP BY 1, 2),
        |last AS (SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY 1)
        |SELECT a.user_id, a.start_ms, a.end_ms, a.n_events
        |FROM agg a JOIN last l
        |  ON l.user_id = a.user_id AND a.sid != l.last_sid
        |ORDER BY a.user_id, a.start_ms""".stripMargin,


    // Explicit 2-offset replay of the hop fan-out: an event's covering
    // window starts are (⌊t/hop⌋−k)·hop for k ∈ {0,1} (width = 2·hop).
    "q_sliding_window_counts" ->
      s"""WITH ev AS (
         |  SELECT epoch_ms(ts) AS tms, event_type, value FROM events),
         |w AS (
         |  SELECT ((tms // 1800000) - off) * 1800000 AS ws,
         |         event_type, value
         |  FROM ev, unnest([0, 1]) AS t(off))
         |SELECT strftime(make_timestamp(ws * 1000),
         |                '%Y-%m-%d %H:%M:%S') AS window_start,
         |       event_type, count(*) AS n,
         |       ${fsum4("value")} AS sum_value
         |FROM w GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,


    "q_late_events" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
        |  FROM events),
        |late AS (
        |  SELECT event_type,
        |         greatest(coalesce(max(tms) OVER w - tms, 0), 0) AS late_ms
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CASE WHEN late_ms > 600000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_late_10m,
        |       CAST(max(late_ms) AS BIGINT) AS max_late_ms,
        |       CAST(sum(late_ms) AS BIGINT) AS sum_late_ms
        |FROM late GROUP BY 1 ORDER BY 1""".stripMargin,


    // Clamped balance: the recurrence replayed rank-by-rank as a
    // recursive CTE (the clamp forbids any closed-form window).
    "q_clamped_balance" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN event_type = 'purchase'
        |              THEN -CAST(floor(value*100 + 0.5) AS BIGINT)
        |              ELSE CAST(floor(value*100 + 0.5) AS BIGINT)
        |         END AS delta
        |  FROM events),
        |ord AS (
        |  SELECT user_id, delta,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts_us, event_id) AS rn
        |  FROM ev),
        |bal AS (
        |  SELECT user_id, rn,
        |         greatest(CAST(0 AS BIGINT), delta) AS b,
        |         CASE WHEN delta < 0 THEN CAST(1 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS nclamp
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn,
        |         greatest(CAST(0 AS BIGINT), bal.b + o.delta),
        |         bal.nclamp + CASE WHEN bal.b + o.delta < 0
        |                           THEN CAST(1 AS BIGINT)
        |                           ELSE CAST(0 AS BIGINT) END
        |  FROM bal JOIN ord o
        |    ON o.user_id = bal.user_id AND o.rn = bal.rn + 1),
        |fin AS (
        |  SELECT user_id, max(rn) AS n_events FROM bal GROUP BY 1)
        |SELECT b.user_id, f.n_events, b.b AS final_balance_c,
        |       b.nclamp AS n_clamped
        |FROM bal b JOIN fin f
        |  ON b.user_id = f.user_id AND b.rn = f.n_events
        |ORDER BY b.user_id""".stripMargin,


    // Concentration: the 0.9-fraction element replayed by the same
    // 0-based ⌊f·n⌋ rank formula (clamped), then plain conditional
    // sums.
    "q_user_concentration" ->
      """WITH t AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |u AS (
        |  SELECT CAST(count(*) AS BIGINT) AS users,
        |         CAST(sum(n) AS BIGINT) AS events FROM t),
        |ranked AS (
        |  SELECT n, row_number() OVER (ORDER BY n) AS rn FROM t),
        |thr AS (
        |  SELECT n AS t90 FROM ranked, u
        |  WHERE rn - 1 = least(CAST(floor(0.9 * users) AS BIGINT),
        |                       users - 1))
        |SELECT u.users, u.events,
        |       (SELECT CAST(sum(CASE WHEN n >= t90 THEN 1 ELSE 0 END)
        |                    AS BIGINT) FROM t, thr) AS users_top,
        |       (SELECT CAST(sum(CASE WHEN n >= t90 THEN n ELSE 0 END)
        |                    AS BIGINT) FROM t, thr) AS events_top,
        |       thr.t90,
        |       (SELECT CAST(sum(CASE WHEN n >= t90 THEN n ELSE 0 END)
        |                    AS BIGINT) FROM t, thr) * 10000 // u.events
        |         AS share_x10000
        |FROM u, thr""".stripMargin,


    // TWAP: the same lead() construction; cents × micros stays exact
    // BIGINT, one r4 division at the end.
    "q_time_weighted_avg" ->
      s"""WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(floor(value*100 + 0.5) AS BIGINT) AS value_c
        |  FROM events),
        |d AS (
        |  SELECT user_id, value_c,
        |         lead(ts_us) OVER (PARTITION BY user_id
        |                           ORDER BY ts_us, event_id) - ts_us
        |           AS dt
        |  FROM ev),
        |g AS (
        |  SELECT user_id, count(*) AS n_intervals,
        |         CAST(sum(value_c * dt) AS BIGINT) AS sum_vdt,
        |         CAST(sum(dt) AS BIGINT) AS sum_dt
        |  FROM d WHERE dt IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_intervals, sum_vdt, sum_dt,
        |       ${r4("CAST(sum_vdt AS DOUBLE) / CAST(sum_dt AS DOUBLE) / 100.0")}
        |         AS twa
        |FROM g ORDER BY user_id""".stripMargin,


    // LTV matrix: cohort month = per-customer min month index; cells
    // roll up orders joined back to their cohort.
    "q_cohort_revenue" ->
      """WITH om AS (
        |  SELECT o_custkey,
        |         CAST(year(o_orderdate)*12 + month(o_orderdate) - 1
        |              AS BIGINT) AS k,
        |         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |c0 AS (SELECT o_custkey, min(k) AS k0 FROM om GROUP BY 1)
        |SELECT c0.k0 AS cohort_k, om.k - c0.k0 AS age,
        |       CAST(count(DISTINCT om.o_custkey) AS BIGINT)
        |         AS n_customers,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(om.cents) AS BIGINT) AS cents
        |FROM om JOIN c0 ON om.o_custkey = c0.o_custkey
        |GROUP BY 1, 2 ORDER BY cohort_k, age""".stripMargin,


    "q_user_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk
        |  FROM events),
        |first AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1)
        |SELECT f.cohort_wk, e.wk - f.cohort_wk AS week_offset,
        |       count(*) AS n_users
        |FROM ev e JOIN first f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin,


    "q_state_durations" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
        |  FROM events),
        |led AS (
        |  SELECT user_id, event_type,
        |         coalesce(lead(tms) OVER (PARTITION BY user_id
        |                                  ORDER BY tms, event_id) - tms,
        |                  0) AS dur_ms
        |  FROM ev)
        |SELECT user_id, count(*) AS n_versions,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN dur_ms
        |                     ELSE 0 END) AS BIGINT) AS click_ms,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN dur_ms
        |                     ELSE 0 END) AS BIGINT) AS view_ms,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN dur_ms
        |                     ELSE 0 END) AS BIGINT) AS purchase_ms,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN dur_ms
        |                     ELSE 0 END) AS BIGINT) AS signup_ms,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN dur_ms
        |                     ELSE 0 END) AS BIGINT) AS error_ms
        |FROM led GROUP BY 1 ORDER BY user_id""".stripMargin,


    // The stateful running-totals materialization must land exactly on
    // the batch aggregate (integer cents are order-independent).
    "q_stream_user_totals" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(floor(value*100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,


    // Trailing-window distinct: the oracle may afford the days×pairs
    // range join the engine avoids (sf0.01 is small); both sides dedupe
    // to (user, day) first so the distinct semantics line up exactly.
    "q_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS d0,
        |                   user_id
        |            FROM events),
        |days AS (SELECT DISTINCT d0 AS day FROM ud)
        |SELECT days.day AS day, count(DISTINCT ud.user_id) AS users_7d
        |FROM days JOIN ud ON ud.d0 BETWEEN days.day - 6 AND days.day
        |GROUP BY 1 ORDER BY day""".stripMargin,


    // Derived-property oracle (sketch estimates are engine-internal);
    // the day axis is data-derived, so the acceptance read-out must
    // cover every observed day with an in-envelope estimate.
    "q_rolling_hll" ->
      """SELECT DISTINCT epoch_ms(ts) // 86400000 AS day,
        |       true AS within_bounds
        |FROM events ORDER BY day""".stripMargin,


    // Data-derived property oracle: the exact heavy set (cnt > n//50)
    // replayed in SQL, each key expected present and in-envelope.
    "q_heavy_hitters" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN user_id % 4 = 0 THEN event_type
        |              ELSE 'u' || CAST(user_id AS VARCHAR) END AS k
        |  FROM events),
        |c AS (SELECT k, count(*) AS cnt FROM keyed GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM keyed)
        |SELECT k AS probe_key, true AS within_bounds
        |FROM c, n WHERE cnt > n // 50 ORDER BY probe_key""".stripMargin,


    // Integer dyadic weights replay exactly; one IEEE division + r4.
    "q_ewma_trend" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day AS wday FROM daily),
        |fan AS (
        |  SELECT d.event_type, d.v, w.wday,
        |         1 << (13 - (w.wday - d.day)) AS w
        |  FROM daily d JOIN days w
        |    ON w.wday BETWEEN d.day AND d.day + 13)
        |SELECT event_type, wday AS day, count(*) AS n_days,
        |       floor((CAST(sum(v*w) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
        |              / 100.0)*10000 + 0.5)/10000.0 AS ewma
        |FROM fan GROUP BY 1, 2
        |ORDER BY event_type, day""".stripMargin,


    // Data-derived property oracle: the exact heavy set of every
    // trailing 7-day window, each key expected present + in-envelope.
    "q_trending_items" ->
      """WITH keyed AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day,
        |         CASE WHEN user_id % 4 = 0 THEN event_type
        |              ELSE 'u' || CAST(user_id AS VARCHAR) END AS k
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM keyed),
        |ed AS (SELECT day, k, count(*) AS c FROM keyed GROUP BY 1, 2),
        |win AS (
        |  SELECT d.day AS wday, ed.k, CAST(sum(ed.c) AS BIGINT) AS cnt
        |  FROM days d JOIN ed ON ed.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1, 2),
        |nw AS (
        |  SELECT d.day AS wday, CAST(sum(ed.c) AS BIGINT) AS n
        |  FROM days d JOIN ed ON ed.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1)
        |SELECT wday AS day, k AS probe_key, true AS within_bounds
        |FROM win JOIN nw USING (wday)
        |WHERE cnt > n // 50
        |ORDER BY day, probe_key""".stripMargin,


    // Derived-property oracle (sketch estimates engine-internal): one
    // in-envelope row per rollup level, levels data-derived.
    "q_hll_rollup" ->
      """SELECT level_key, true AS within_bounds FROM (
        |  SELECT DISTINCT event_type AS level_key FROM events
        |  UNION ALL SELECT '_all')
        |ORDER BY level_key""".stripMargin,
  )
}
