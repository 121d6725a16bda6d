package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product/path analytics + data-profiling primitives (SURVEY.md §2,
  * q20–q22). These widen the OLAP surface past the reference's query
  * set into what a training-data/ops team runs daily over an event
  * lake and a 100 TB table catalog.
  *
  * Scale notes:
  *  - q20 windows partition by user_id (high-cardinality → the lead()
  *    parallelizes); everything after the first aggregation lives on
  *    the tiny (from_type, to_type) key space.
  *  - q21 computes its bucket key map-side (one scan, one shuffle on
  *    ~B buckets); the cumulative window runs over B rows, not data.
  *  - q22 unpivots with ONE Expand (stack) feeding one shuffle — a
  *    per-column UNION of scans would read the 100 TB table C times.
  */
object AnalyticsQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** q20: Markov transition matrix over per-user event paths — the
    * "what do users do next" primitive behind path/flow diagrams.
    *
    * Per user, events ordered by (ts, event_id); each adjacent pair
    * (A→B) is one transition. Output: counts + row-normalized
    * probability per source state. The lead() window partitions on
    * user_id (high-cardinality — no single-partition window); the
    * transition tally is a map-side-combining count on a key space of
    * |event_type|² (~25), and the per-source normalization window
    * runs over those ≤25 aggregated rows only. */
  def q20PathTransitions(spark: SparkSession, dir: String): DataFrame = {
    val pairs = transitionRows(events(spark, dir))
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy("from_type")
    pairs
      .withColumn("p", round(col("n").cast("double") / sum("n").over(byFrom), 6))
      .orderBy("from_type", "to_type")
  }

  /** THE per-user adjacent-transition kernel q20 aggregates and st16
    * mirrors on a stream (one row per transition: user, from, to, and
    * the arrival ts of the destination event). Adjacency is by
    * (ts, event_id) — the same tie-break the streaming state applies
    * within a micro-batch, so batch/stream parity is by construction. */
  private[graft] def transitionRows(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .withColumn("to_ts", lead("ts", 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("to_type"), col("to_ts"))
  }

  /** q21: fixed-width histogram of lineitem.l_extendedprice — the
    * numeric-distribution profile (bucket counts, per-bucket mean,
    * share, cumulative count). Bucket id is integer floor(price/W)
    * computed map-side; the only shuffle is the ~11-bucket agg, and
    * the share/cumulative windows run over those B rows. */
  val HistWidth = 10000.0
  def q21ValueHistogram(spark: SparkSession, dir: String): DataFrame = {
    // mean via EXACT integer cents (per-value round to a near-integer,
    // then a BIGINT sum + ONE final double division): avg(double) is
    // summation-order-dependent — hash-green until a partition-order
    // change flips the 4th decimal (the q19 doctrine; ADVICE r9).
    val b = lineitem(spark, dir)
      .select(floor(col("l_extendedprice") / HistWidth).cast("long").as("bucket"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .withColumn("mean_price",
        round(col("sum_cents") / (col("n") * lit(100.0)), 4))
    val all = Window.partitionBy()
    val cum = Window.partitionBy().orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("share", round(col("n").cast("double") / sum("n").over(all), 6))
      .withColumn("cum_n", sum("n").over(cum))
      .select("bucket", "n", "mean_price", "share", "cum_n")
      .orderBy("bucket")
  }

  /** q22: one-pass per-column data profile of orders (row count, null
    * count, exact distinct count) — the data-quality sweep run before
    * any pipeline trusts a new 100 TB drop. The unpivot is ONE
    * `stack` Expand over a single scan (a per-column UNION would
    * rescan the table C times); casts to string are injective per
    * column, so distinct-of-cast == distinct-of-value. Exact distinct
    * is the oracle anchor; at 100 TB swap `countDistinct` for
    * `approx_count_distinct` (same plan shape minus the distinct
    * expand) or the HllSketch partial-merge path. */
  def q22DataProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    orders(spark, dir)
      .select(expr(s"stack(${cols.length}, $stackArgs) AS (col_name, val)"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("val"))).as("n_null"),
        countDistinct(col("val")).as("n_distinct"))
      .orderBy("col_name")
  }

  /** q23: SESSION-SCOPED path transitions — q20 restricted to
    * within-session adjacency (q09's 30-minute-gap rule): correct
    * path analysis must not bridge a Tuesday logout to a Friday
    * login as a "transition", which q20's whole-history adjacency
    * does by design (q20 answers lifecycle ordering; q23 answers
    * in-session flow). Same two windows as q09 (lag-gap →
    * cumulative-sum session id) plus q20's lead — all three
    * partition on high-cardinality user_id; the tally and the
    * normalization stay on the tiny type² key space. */
  def q23SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lag("ts", 1).over(byUser).as("prev_ts"))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(cum))
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
    val pairs = sess
      .withColumn("to_type", lead("event_type", 1).over(bySession))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy("from_type")
    pairs
      .withColumn("p", round(col("n").cast("double") / sum("n").over(byFrom), 6))
      .orderBy("from_type", "to_type")
  }

  /** q22b (*rows-only*; AnalyticsSpec pins ≤ 2% relative error vs
    * q22): the 100 TB form of the profile — `approx_count_distinct`
    * (HLL++, rsd 0.01) replaces the exact distinct, removing the
    * (col, val)-keyed dedup shuffle entirely: partials merge as
    * fixed-size sketches, so the whole profile is ONE map-side
    * -combining pass regardless of column cardinality. */
  def q22bDataProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    orders(spark, dir)
      .select(expr(s"stack(${cols.length}, $stackArgs) AS (col_name, val)"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("val"))).as("n_null"),
        approx_count_distinct(col("val"), 0.01).as("n_distinct_approx"))
      .orderBy("col_name")
  }

  val queries: Map[String, Q] = Map(
    "q20_path_transitions" -> (q20PathTransitions _),
    "q21_value_histogram" -> (q21ValueHistogram _),
    "q22_data_profile" -> (q22DataProfile _),
    "q22b_data_profile_approx" -> (q22bDataProfileApprox _),
    "q23_session_paths" -> (q23SessionPaths _))

  val oracles: Map[String, String] = Map(
    "q20_path_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM pairs ORDER BY from_type, to_type""".stripMargin,
    "q23_session_paths" ->
      """WITH s AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |sess AS (
        |  SELECT *, sum(CASE WHEN prev_ts IS NULL
        |      OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |seq AS (
        |  SELECT event_type, lead(event_type) OVER (
        |    PARTITION BY user_id, session_id ORDER BY ts, event_id) AS to_type
        |  FROM sess),
        |pairs AS (
        |  SELECT event_type AS from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM pairs ORDER BY from_type, to_type""".stripMargin,
    "q21_value_histogram" ->
      s"""WITH b AS (
         |  SELECT CAST(floor(l_extendedprice / $HistWidth) AS BIGINT) AS bucket,
         |    count(*) AS n,
         |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents
         |  FROM lineitem GROUP BY 1)
         |SELECT bucket, n, round(sum_cents / (n * 100.0), 4) AS mean_price,
         |  round(n * 1.0 / sum(n) OVER (), 6) AS share,
         |  CAST(sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
         |FROM b ORDER BY bucket""".stripMargin,
    "q22_data_profile" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        .map(c => s"""SELECT '$c' AS col_name, count(*) AS n_rows,
                     |  count(*) - count($c) AS n_null,
                     |  count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"))
}
