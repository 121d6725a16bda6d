package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.store.ZOrder

/** The layout operator's effect is measurable, not aspirational: the
  * same box predicate over the same rows must read FEWER rows out of
  * the parquet scan (row-group min/max pruning) when the table is
  * z-ordered than when it is written in arrival order. */
class ZOrderSpec extends SparkSpec {

  /** Rows the scan emitted = rows in row groups that survived
    * pushed min/max pruning (record-level filtering is off by
    * default, so the post-scan Filter does the rest). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }.sum
  }

  test("z-order layout prunes row groups on a 2-D box; arrival order does not") {
    val ev = graft.sources.Tables.events(spark, sf001)
      .select("event_id", "user_id", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    ZOrder.writeZOrdered(ev, Seq("user_id", "value"), s"$tmp/z", numFiles = 32)
    ev.withColumn("__o", col("event_id"))
      .repartitionByRange(32, col("__o")).sortWithinPartitions("__o").drop("__o")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/linear")

    // a ~4% box in the middle of both dimensions, bounds from data
    val q = ev.stat.approxQuantile(Array("user_id", "value"),
      Array(0.4, 0.6), 0.001)
    // long bounds for the bigint column: a double literal would wrap
    // user_id in a cast and block its pushdown entirely
    val (uLo, uHi) = (q(0)(0).toLong, q(0)(1).toLong)
    val (vLo, vHi) = (q(1)(0), q(1)(1))
    def box(df: DataFrame) = df.filter(
      col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi))

    // correctness first: the layout must not change the answer
    def keys(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val expected = keys(box(ev))
    assert(expected.nonEmpty, "empty box — bad quantile bounds")
    assert(keys(box(spark.read.parquet(s"$tmp/z"))) == expected)
    assert(keys(box(spark.read.parquet(s"$tmp/linear"))) == expected)

    // the filters actually reach the scan on both layouts
    val zPlan = box(spark.read.parquet(s"$tmp/z")).queryExecution.executedPlan.toString
    assert(zPlan.contains("PushedFilters") && zPlan.contains("GreaterThanOrEqual(user_id"),
      s"box filter not pushed:\n$zPlan")

    // the point: z-ordered row groups prune, arrival-ordered don't
    val zRows = scanRows(box(spark.read.parquet(s"$tmp/z")))
    val lRows = scanRows(box(spark.read.parquet(s"$tmp/linear")))
    val total = ev.count()
    info(s"scan rows: z-ordered $zRows vs linear $lRows (table $total, box ${expected.size})")
    assert(zRows * 2 <= lRows,
      s"z-order pruned nothing: $zRows vs $lRows of $total")
    assert(lRows == total,
      s"arrival-order unexpectedly pruned ($lRows of $total) — test premise broken")
  }

  test("dynamic partition pruning: a dim filter prunes fact PARTITIONS at runtime, answers identical") {
    // The layout lever beyond z-order: a fact table PARTITIONED BY a
    // join column lets Catalyst inject dynamicpruningexpression into
    // the scan's PartitionFilters — at 100 TB a selective dim filter
    // then skips whole partition DIRECTORIES at runtime, no manual
    // predicate needed. (DPP plans against file-scan dims; a
    // LocalRelation dim is folded before the rule sees it — which is
    // why this test writes the dim to parquet.)
    val tmp = java.nio.file.Files.createTempDirectory("dpp_spec").toString
    graft.sources.Tables.events(spark, sf0001)
      .write.partitionBy("event_type").parquet(s"$tmp/ev")
    import spark.implicits._
    Seq(("view", 1), ("click", 0), ("purchase", 0), ("error", 0), ("signup", 0))
      .toDF("etype", "keep").write.parquet(s"$tmp/dim")
    val saved = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try {
      // test-scale tables carry no useful stats; the fallback ratio
      // heuristic decides instead
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val fact = spark.read.parquet(s"$tmp/ev")
      val dim = spark.read.parquet(s"$tmp/dim")
      val j = fact.join(dim.filter(col("keep") === 1),
          col("event_type") === col("etype"))
        .select("event_id", "event_type", "value")
      val got = j.collect().map(_.toSeq).toSet
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"DPP must reach the fact scan's PartitionFilters:\n${plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")}")
      // pruning is pure scheduling: identical rows to the plain filter
      val expect = graft.sources.Tables.events(spark, sf0001)
        .filter(col("event_type") === "view")
        .select("event_id", "event_type", "value")
        .collect().map(_.toSeq).toSet
      assert(got == expect && got.nonEmpty)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
      case None => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }

  test("events layout: zOrderEvents is a drop-in sf dir and a (ts, type) box prunes") {
    val ev = graft.sources.Tables.events(spark, sf001)
    val tmp = java.nio.file.Files.createTempDirectory("graft-zevents").toString

    ZOrder.zOrderEvents(spark, sf001, s"$tmp/zdir", numFiles = 32)
    ev.withColumn("__o", col("event_id"))
      .repartitionByRange(32, col("__o")).sortWithinPartitions("__o").drop("__o")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/linear/events.parquet")

    // drop-in: a whole-table query is layout-transparent (identical
    // rows, schema untouched — the z dims were transient)
    val zEv = graft.sources.Tables.events(spark, s"$tmp/zdir")
    assert(zEv.schema == ev.schema, "z-ordered layout must persist the original schema")
    assert(graft.operators.CoreQueries.q08EventsTumbling(spark, s"$tmp/zdir")
      .collect().toSeq ==
      graft.operators.CoreQueries.q08EventsTumbling(spark, sf001).collect().toSeq,
      "q08 must return identical results on the z-ordered layout")

    // the operational slice: one event type over a ~10% time window
    val q = ev.select(unix_micros(col("ts").cast("timestamp")).as("us"))
      .stat.approxQuantile("us", Array(0.45, 0.55), 0.001)
    def box(dir: String) = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click" &&
        unix_micros(col("ts").cast("timestamp")).between(q(0).toLong, q(1).toLong))
      .select("event_id")
    val expected = box(sf001).collect().map(_.getLong(0)).sorted.toSeq
    assert(expected.nonEmpty)
    assert(box(s"$tmp/zdir").collect().map(_.getLong(0)).sorted.toSeq == expected)

    // NOTE the us-range predicate wraps ts in a cast, so only the
    // event_type equality is PUSHABLE — prune evidence must come
    // from raw-ts bounds instead, as NTZ literals (LocalDateTime),
    // so BOTH predicates push to the scan.
    def ntz(us: Long) = java.time.LocalDateTime.ofEpochSecond(
      us / 1000000L, ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    def tsBox(dir: String) = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click" &&
        col("ts") >= lit(ntz(q(0).toLong)) && col("ts") <= lit(ntz(q(1).toLong)))
      .select("event_id")
    val zRows = scanRows(tsBox(s"$tmp/zdir"))
    val lRows = scanRows(tsBox(s"$tmp/linear"))
    info(s"events (ts, type) box scan rows: z-ordered $zRows vs linear $lRows")
    assert(zRows * 2 <= lRows,
      s"events z-layout pruned nothing: $zRows vs $lRows")
  }
}
