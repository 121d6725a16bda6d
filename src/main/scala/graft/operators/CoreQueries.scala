package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Core relational/OLAP queries (SURVEY.md §2, q01–q10).
  *
  * Scale notes (100 TB): every query keeps filters/projections as
  * plain Column expressions so Catalyst pushes them into the parquet
  * scan; dimension tables (region/nation/customer/supplier) are
  * explicitly `broadcast()`; top-k uses orderBy+limit which Spark
  * executes as TakeOrderedAndProject (no full sort/single-partition
  * collapse); window functions partition by high-cardinality keys so
  * no single-partition window appears.
  */
object CoreQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** MONEY SUMS are computed in DECIMAL, not double (the q05 sf1.0
    * lesson, applied to every large-group money aggregate): a double
    * sum over ~10⁵+ rows per group is summation-order dependent, and
    * Spark's and DuckDB's orders diverge in the 4th decimal once
    * totals reach ~10¹⁰ (q02 flipped a round-4 digit at sf1.0).
    * Prices/discounts/balances carry ≤ 2-4 decimal digits, so the
    * double → DECIMAL(…,4) cast is EXACT on both engines (no
    * shortest-repr-vs-binary rounding ambiguity), the decimal
    * product/sum is exact and order-free, and the single final
    * double cast of the same exact value is identical both sides. */
  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def dec5(c: Column): Column = c.cast("decimal(5,4)")

  /** TPC-H Q1-style pricing summary. Map-side partial aggregation +
    * one shuffle on a tiny (flag,status) key space. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double"), 4).as("sum_base_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(1) - dec5(col("l_discount"))))
          .cast("double"), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Multi-way star join; all dims broadcast — lineitem never shuffles
    * for the join, only for the final small-key aggregation. */
  def q02RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = customer(spark, dir).select("c_custkey", "c_nationkey")
    val nat = nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = region(spark, dir).select("r_regionkey", "r_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec5(col("l_discount"))))
          .cast("double"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Join + agg + top-k: executed as TakeOrderedAndProject, so only k
    * rows cross the final exchange regardless of data size. */
  def q03TopOrders(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
      .join(orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** Window rank over orders per customer; partition key o_custkey is
    * high-cardinality so the window parallelizes across executors. */
  def q04WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy("o_custkey", "rk")
  }

  /** LEFT SEMI join: orders having at least one high-value item.
    * Semi-join short-circuits — no fact-side duplication. */
  def q05SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = lineitem(spark, dir)
      .filter(col("l_extendedprice") > 90000)
      .select("l_orderkey")
    orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      // Sum in DECIMAL, not double: a double sum over ~10⁵ rows per
      // group is summation-order dependent and diverged from the
      // oracle in the 4th decimal at sf1.0 (both engines sum doubles
      // in their own order — the disagreement GROWS with scale).
      // Casting each price to DECIMAL(18,4) first makes the sum
      // exact and order-free on both sides; the final double is
      // exact too (totals ≪ 2^53/10^4).
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 4)
          .as("total"))
      .orderBy("o_orderpriority")
  }

  /** Selective filter + global agg; predicate and 3-column projection
    * both reach the parquet scan (PushedFilters/ReadSchema). */
  def q06SelectiveFilter(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(dec(col("l_extendedprice")) * dec5(col("l_discount")))
          .cast("double"), 4).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** ROLLUP over (region, nation): Spark expands grouping sets with
    * a single shuffle; dims broadcast. */
  def q07Rollup(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir).select("c_custkey", "c_nationkey", "c_acctbal")
    val nat = nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = region(spark, dir).select("r_regionkey", "r_name")
    cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(dec(col("c_acctbal"))).cast("double"), 4).as("acct_total"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Tumbling 1-hour windows via date_trunc — batch mirror of the
    * Structured Streaming st01 query (same expression works under
    * readStream + watermark). */
  def q08EventsTumbling(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .orderBy("hour", "event_type")

  /** q18: SLIDING (hopping) window agg — 1h windows every 15min, the
    * smoothing/alerting view q08's tumbling hours cannot give (a
    * spike straddling an hour boundary halves in both tumbling
    * cells; the hop sees it whole). Uses Spark's native `window()`
    * slide form: each event replicates into length/slide = 4 cells
    * map-side (a constant fan-out, not a join), then the same
    * map-side-combining agg as q08 — the batch mirror of st01's
    * streaming shape. Oracle unnests the 4 hop offsets per event
    * with epoch-microsecond arithmetic, so window starts are
    * integer-exact in both engines. */
  def q18EventsSliding(spark: SparkSession, dir: String): DataFrame =
    slidingCells(events(spark, dir)).orderBy("win_start", "event_type")

  /** The q18 hop-cell aggregation on an arbitrary events relation —
    * SHARED KERNEL with st14's streaming form (the funnelStageRows
    * convention: one expression tree, so batch/stream parity cannot
    * drift). Works unchanged under readStream + watermark. */
  def slidingCells(e: DataFrame): DataFrame =
    e.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sessionization: 30-min-gap sessions via lag window; partitioned
    * by user_id (high-cardinality at scale). Batch mirror of st02
    * (flatMapGroupsWithState). */
  def q09EventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        lag("ts", 1).over(byUser).as("prev_ts"))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_trunc("second", min("ts")).as("session_start"))
      .orderBy("user_id", "session_id")
  }

  /** Semi-structured extraction: JSON prop pulled with the codegen'd
    * get_json_object — no UDF in the hot path. */
  def q10EventsJson(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(round(avg("k"), 4).as("avg_k"), max("k").as("max_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** q14: GROUPING SETS — the grouping-set shape ROLLUP cannot
    * express (two independent single-column slices plus the grand
    * total, WITHOUT the combined (status, priority) cell), plus the
    * `grouping()` indicator that disambiguates a grouped-out NULL
    * from a data NULL. Like q07, Spark expands the sets in a single
    * Expand + one shuffle on a tiny key space — no per-set rescan of
    * the fact table, which is the property that matters when the
    * fact table is 100 TB. */
  def q14GroupingSets(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("total_price"))
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** q16: CONVERSION FUNNEL — users reaching each ordered stage
    * view → click → purchase, where each stage must happen strictly
    * AFTER the user's first event of the previous stage (the product
    * analytics primitive behind every "where do users drop off"
    * dashboard).
    *
    * Scale shape: each stage is one map-side-combining min-agg on
    * the HIGH-cardinality user_id key, and each stage join is
    * user_id-keyed against the already-REDUCED previous stage (one
    * row per surviving user, never event × event) — three
    * co-partitioned shuffles on the same key, so the exchanges
    * reuse; the final stage tally is a 3-row agg. Nothing funnels
    * through a low-cardinality key until the last 3-row step. */
  def q16EventFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelStageRows(Tables.events(spark, dir).select("user_id", "event_type", "ts"))
      .groupBy("stage").agg(count(lit(1)).as("users"))
      .orderBy("stage")

  /** The per-user stage-reach relation q16 aggregates — one row per
    * (user, stage reached) with the reach timestamp. SHARED KERNEL
    * with st12's streaming funnel parity spec (the drift-proofing
    * convention: stream and batch compare against the same rows). */
  def funnelStageRows(e: DataFrame): DataFrame = {
    def stage(typ: String, prev: DataFrame, prevT: String, outT: String) =
      e.filter(col("event_type") === typ)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevT))
        .groupBy("user_id").agg(min("ts").as(outT))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = stage("click", v, "t_view", "t_click")
    val p = stage("purchase", c, "t_click", "t_purchase")
    v.select(col("user_id"), lit("1_view").as("stage"), col("t_view").as("ts"))
      .unionAll(c.select(col("user_id"), lit("2_click").as("stage"), col("t_click").as("ts")))
      .unionAll(p.select(col("user_id"), lit("3_purchase").as("stage"), col("t_purchase").as("ts")))
  }

  /** q24 deadline: every funnel stage must land within this many
    * hours of the user's FIRST view. */
  val FunnelDeadlineHours = 48

  /** q24: TIME-BOUNDED CONVERSION FUNNEL (ClickHouse's windowFunnel
    * semantics beside q16's open-ended one): stages still chain
    * strictly-after via first-qualifying-event mins, but every stage
    * must also land within [[FunnelDeadlineHours]] of the user's
    * first view — "converted eventually" (q16) vs "converted while
    * the campaign window was open" (q24) are different product
    * questions with different answers on the same events. Same scale
    * shape as q16: every stage reduces to one row per user BEFORE
    * its join; the deadline is one more residual predicate on the
    * already-keyed join — no new shuffle. */
  def q24WindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val dl = expr(s"INTERVAL $FunnelDeadlineHours HOURS")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("t_view") && col("ts") <= col("t_view") + dl)
      .groupBy("user_id").agg(min("ts").as("t_click"), min("t_view").as("t_view"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("t_click") && col("ts") <= col("t_view") + dl)
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.select(col("user_id"), lit("1_view").as("stage"))
      .unionAll(c.select(col("user_id"), lit("2_click").as("stage")))
      .unionAll(p.select(col("user_id"), lit("3_purchase").as("stage")))
      .groupBy("stage").agg(count(lit(1)).as("users"))
      .orderBy("stage")
  }

  /** q17: COHORT RETENTION — users bucketed by the week of their
    * FIRST event (the cohort), each cohort's distinct active users
    * counted per week offset since then (the retention matrix every
    * growth dashboard draws; week 0 = cohort size).
    *
    * Scale shape: the first-event min is a map-side-combining agg on
    * the high-cardinality user_id; per-user-week activity dedups on
    * (user, week) BEFORE anything joins (one row per user-week, not
    * per event); the cohort join hits the reduced one-row-per-user
    * side; the matrix agg groups a (user, cohort, offset)-distinct
    * relation down to the tiny (cohort × offset) grid. Week
    * arithmetic stays on date_trunc boundaries so the offset
    * division is exact in both engines. */
  def q17CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohort = e.groupBy("user_id").agg(min("week").as("cohort_week"))
    e.distinct()
      .join(cohort, "user_id")
      .select(col("cohort_week").cast("date").as("cohort_week"),
        (datediff(col("week").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("int").as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** q19 dials: trailing window length (buckets), minimum history
    * before a z-score is emitted, and the |z| anomaly threshold. */
  val AnomalyWindow = 24
  val AnomalyMinHist = 12
  val AnomalyZ = 3.0

  /** q19: ROLLING-WINDOW ANOMALY DETECTION — per (event_type, hour)
    * event counts scored against the trailing [[AnomalyWindow]]
    * observed buckets' mean/stddev (the window EXCLUDES the current
    * row, so a spike cannot suppress its own z-score), flagging
    * |z| ≥ [[AnomalyZ]]. The ops-dashboard primitive behind every
    * "error rate just tripled" alert — the batch mirror of what a
    * monitoring stream computes continuously.
    *
    * Scale shape: the REDUCE-BEFORE-WINDOW rule — raw events reduce
    * to the (type × hour) grid with one map-side-combining agg, and
    * only the GRID (O(types·hours), bounded by calendar time, not
    * corpus size) enters the window. partitionBy(event_type) is safe
    * here precisely because the windowed relation is that grid: a
    * type's partition holds one row per hour, never per event (the
    * t16 low-cardinality-funnel caveat applies to windows over RAW
    * rows, not over a time-bounded grid).
    *
    * Float parity: the rolling aggregates are INTEGER sums (Σn, Σn²,
    * count) — exact under any summation order, unlike windowed
    * avg/stddev whose segment-tree accumulation order differs across
    * engines — and the float math (mean, unbiased variance via
    * Σn² − c·mean², sqrt, z) is the same IEEE op sequence on both
    * sides. A flat history (variance 0, clamped at 0 against FP
    * drift) yields a NULL z: no variability means no z-score, not an
    * infinite one. Buckets are OBSERVED hours — an hour with zero
    * events is absent from the grid, so the window spans the last 24
    * active buckets (a gap-filled calendar variant would add a
    * sequence() expand; same plan shape). */
  def q19RollingAnomaly(spark: SparkSession, dir: String): DataFrame =
    rollingAnomaly(events(spark, dir)).orderBy("event_type", "hour")

  /** The q19 grid + rolling-score kernel on an arbitrary events
    * relation — SHARED semantics contract with st15's streaming form
    * (the parity spec asserts the stream's closed-bucket rows equal
    * these, bit for bit including the rounding). */
  def rollingAnomaly(e: DataFrame): DataFrame = {
    val grid = e
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-AnomalyWindow, -1)
    val c = count(lit(1)).over(w)
    val mean = sum(col("n")).over(w).cast("double") / c
    val varr = (sum(col("n") * col("n")).over(w).cast("double") - c * mean * mean) /
      (c - 1)
    val std = sqrt(greatest(varr, lit(0.0)))
    grid
      .withColumn("hist_n", c)
      .withColumn("mean24", mean)
      .withColumn("std24", std)
      .filter(col("hist_n") >= AnomalyMinHist)
      .withColumn("z", when(col("std24") > 0,
        round((col("n") - col("mean24")) / col("std24"), 4)))
      .select(col("event_type"), col("hour"), col("n"), col("hist_n"),
        round(col("mean24"), 4).as("mean24"),
        round(col("std24"), 4).as("std24"),
        col("z"),
        (abs(coalesce(col("z"), lit(0.0))) >= AnomalyZ).cast("int").as("is_anomaly"))
  }

  val queries: Map[String, Q] = Map(
    "q24_window_funnel" -> (q24WindowFunnel _),
    "q19_rolling_anomaly" -> (q19RollingAnomaly _),
    "q17_cohort_retention" -> (q17CohortRetention _),
    "q16_event_funnel" -> (q16EventFunnel _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q14_grouping_sets" -> (q14GroupingSets _),
    "q02_region_revenue" -> (q02RegionRevenue _),
    "q03_top_orders" -> (q03TopOrders _),
    "q04_window_rank" -> (q04WindowRank _),
    "q05_semi_join" -> (q05SemiJoin _),
    "q06_selective_filter" -> (q06SelectiveFilter _),
    "q07_rollup" -> (q07Rollup _),
    "q08_events_tumbling" -> (q08EventsTumbling _),
    "q18_events_sliding" -> (q18EventsSliding _),
    "q09_events_sessionize" -> (q09EventsSessionize _),
    "q10_events_json" -> (q10EventsJson _))

  val oracles: Map[String, String] = Map(
    // q19: same grid, same ROWS frame (24 PRECEDING .. 1 PRECEDING),
    // same integer rolling sums — DuckDB's windowed sum() returns
    // HUGEINT, so both sums cast before the (identical-order) float
    // math; variance clamps at 0 and a flat history yields NULL z on
    // both engines.
    "q19_rolling_anomaly" ->
      s"""WITH grid AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |win AS (
         |  SELECT event_type, hour, n,
         |    count(*) OVER w AS hist_n,
         |    CAST(sum(n) OVER w AS BIGINT) AS s1,
         |    CAST(sum(n * n) OVER w AS BIGINT) AS s2
         |  FROM grid
         |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
         |               ROWS BETWEEN $AnomalyWindow PRECEDING AND 1 PRECEDING)),
         |st AS (
         |  SELECT event_type, hour, n, hist_n,
         |    CAST(s1 AS DOUBLE) / hist_n AS mean,
         |    sqrt(greatest(
         |      (CAST(s2 AS DOUBLE) - hist_n * (CAST(s1 AS DOUBLE) / hist_n)
         |         * (CAST(s1 AS DOUBLE) / hist_n)) / (hist_n - 1),
         |      0.0)) AS std
         |  FROM win WHERE hist_n >= $AnomalyMinHist),
         |z AS (
         |  SELECT event_type, hour, n, hist_n,
         |    round(mean, 4) AS mean24, round(std, 4) AS std24,
         |    CASE WHEN std > 0 THEN round((n - mean) / std, 4) END AS z
         |  FROM st)
         |SELECT event_type, hour, n, hist_n, mean24, std24, z,
         |  CAST(abs(coalesce(z, 0.0)) >= $AnomalyZ AS INT) AS is_anomaly
         |FROM z
         |ORDER BY event_type, hour""".stripMargin,
    // q17: same week-truncated min/distinct chain; date_trunc('week')
    // is Monday-based in both engines and offsets divide exactly on
    // week boundaries, so the compare is integer-exact.
    "q17_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1)
        |SELECT c.cohort_week, CAST((uw.week - c.cohort_week) / 7 AS INT) AS week_offset,
        |       count(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN cohort c ON uw.user_id = c.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // q16: the same strictly-after min-chaining; counts only, so the
    // compare is integer-exact.
    "q24_window_funnel" ->
      s"""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
         |           WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(e.ts) AS t_click, min(v.t_view) AS t_view
         |      FROM events e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.ts > v.t_view
         |        AND e.ts <= v.t_view + INTERVAL $FunnelDeadlineHours HOURS
         |      GROUP BY 1),
         |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
         |      JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
         |        AND e.ts <= c.t_view + INTERVAL $FunnelDeadlineHours HOURS
         |      GROUP BY 1)
         |SELECT '1_view' AS stage, count(*) AS users FROM v
         |UNION ALL SELECT '2_click', count(*) FROM c
         |UNION ALL SELECT '3_purchase', count(*) FROM p
         |ORDER BY stage""".stripMargin,
    "q16_event_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT '1_view' AS stage, count(*) AS users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,
    "q14_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 4) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |    * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_region_revenue" ->
      """SELECT r_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |    * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q03_top_orders" ->
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q04_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
        |FROM orders
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem WHERE l_extendedprice > 90000)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q06_selective_filter" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |    * CAST(l_discount AS DECIMAL(5,4))) AS DOUBLE), 4) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q07_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS acct_total
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q08_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,
    // q18: every event lands in exactly length/slide = 4 hop cells
    // (start = floor-to-slide minus i slides); epoch-us arithmetic,
    // naive-timestamp reconstruction — no timezone in play.
    "q18_events_sliding" ->
      """SELECT TIMESTAMP '1970-01-01 00:00:00'
        |    + to_microseconds((epoch_us(ts) // 900000000 - i) * 900000000)
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events CROSS JOIN unnest(range(0, 4)) AS t(i)
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin,
    "q09_events_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |      OR ts > prev_ts + INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  date_trunc('second', min(ts)) AS session_start
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q10_events_json" ->
      """SELECT event_type,
        |  round(avg(CAST(props->>'$.k' AS INT)), 4) AS avg_k,
        |  max(CAST(props->>'$.k' AS INT)) AS max_k,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
}
