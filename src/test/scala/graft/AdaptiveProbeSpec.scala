package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.VectorIndex

/** Adaptive-nProbe IVF serving (VERDICT r11 #3): probe the nearest
  * cells, then ONLY the cells whose per-cell cosine bound could still
  * tie or beat the pooled k-th. The contract under test is strict —
  * the adaptive result must EQUAL the all-cells probe row for row
  * (the bound is sound, not heuristic), while scanning measurably
  * fewer cells on a corpus with real cluster structure. */
class AdaptiveProbeSpec extends SparkSpec {

  /** Eight DIRECTIONALLY separated clusters (cluster c points along
    * axis c with small off-axis jitter) — the premise regime
    * (production embedding spaces) where nearby cells hold all the
    * cosine neighbours and far cells' bounds exclude them. Clusters
    * that differ only in MAGNITUDE along a shared ray would all look
    * alike to cosine and the bound could prune nothing. */
  private def clustered(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % 8
      (i.toLong,
        Array.tabulate(8)(j =>
          (if (j == c) 4.0 else 0.0) + 0.3 * math.sin(i * 2.3 + j * 1.1)))
    }.toDF("vec_id", "v")
  }

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("adaptive probe returns EXACTLY the all-cells result while scanning fewer cells") {
    val tmp = Files.createTempDirectory("adaptive").toString
    val e = clustered(400).cache()
    try {
      VectorIndex.buildIvf(spark, e, tmp, nCells = 8)
      VectorIndex.buildCellBounds(spark, tmp)
      val nCells = VectorIndex.loadIvfCentroids(spark, tmp).length
      var totalProbed = 0
      var totalCells = 0
      (0 until 12).foreach { qi =>
        val qv = e.filter(col("vec_id") === qi.toLong)
          .select("v").head().getSeq[Double](0).toArray
        val full = rows(VectorIndex.annIvf(spark, tmp, qv, 10, nCells,
          Some(qi.toLong)))
        val ad = VectorIndex.annIvfAdaptive(spark, tmp, qv, 10,
          initialProbe = 2, excludeVecId = Some(qi.toLong))
        assert(rows(ad.result) == full,
          s"adaptive rows diverged from the full probe for query $qi")
        totalProbed += ad.probedCells.size
        totalCells += ad.nCells
      }
      info(s"adaptive probed $totalProbed / $totalCells cells across 12 queries")
      assert(totalProbed < totalCells,
        "adaptive probe never skipped a cell on the clustered corpus")
      // the win should be substantial where the premise holds
      assert(totalProbed.toDouble / totalCells <= 0.75,
        s"adaptive probe scanned ${totalProbed.toDouble / totalCells} of cells")
      // and the scan stays partition-pruned: the probe set reaches
      // the parquet reader as a PartitionFilters clause, not a row
      // filter over a full scan
      val qv0 = e.filter(col("vec_id") === 0L)
        .select("v").head().getSeq[Double](0).toArray
      val plan = VectorIndex.annIvfAdaptive(spark, tmp, qv0, 10,
        initialProbe = 2, excludeVecId = Some(0L))
        .result.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PartitionFilters: [cluster"),
        "adaptive probe scan lost partition pruning")
    } finally e.unpersist()
  }

  test("underfilled first batch falls back to probing every remaining cell (k > pool)") {
    val tmp = Files.createTempDirectory("adaptive-small").toString
    val e = clustered(40).cache()
    try {
      VectorIndex.buildIvf(spark, e, tmp, nCells = 8)
      VectorIndex.buildCellBounds(spark, tmp)
      val qv = e.filter(col("vec_id") === 0L)
        .select("v").head().getSeq[Double](0).toArray
      // k = 39 > any single batch: the pool cannot fill from the
      // initial probe, so every cell must be scanned and the result
      // equals the full probe trivially.
      val nCells = VectorIndex.loadIvfCentroids(spark, tmp).length
      val full = rows(VectorIndex.annIvf(spark, tmp, qv, 39, nCells, Some(0L)))
      val ad = VectorIndex.annIvfAdaptive(spark, tmp, qv, 39,
        initialProbe = 1, excludeVecId = Some(0L))
      assert(rows(ad.result) == full)
      assert(ad.probedCells.size == ad.nCells,
        "an underfilled pool must probe everything")
    } finally e.unpersist()
  }

  test("append invalidates the bounds; adaptive refuses until rebuilt; tombstones respected") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("adaptive-stale").toString
    val e = clustered(400).cache()
    try {
      VectorIndex.buildIvf(spark, e, tmp, nCells = 8)
      VectorIndex.buildCellBounds(spark, tmp)
      val qv = e.filter(col("vec_id") === 3L)
        .select("v").head().getSeq[Double](0).toArray
      // tombstoned ids never serve through the adaptive path either
      VectorIndex.tombstone(spark, tmp, Seq(11L).toDF("vec_id"))
      val got = VectorIndex.annIvfAdaptive(spark, tmp, qv, 10,
        initialProbe = 2, excludeVecId = Some(3L))
        .result.collect().map(_.getLong(0)).toSet
      assert(!got.contains(11L), "adaptive probe leaked a tombstoned id")
      // an append can exceed a cell's recorded radius — the bounds
      // must be invalidated, and adaptive must fail fast, not serve
      // silently-unsound pruning
      val extra = Seq((1000L, Array.tabulate(8)(_ => 2.0)))
        .toDF("vec_id", "v")
      VectorIndex.appendIvf(spark, tmp, extra)
      assert(!new java.io.File(s"$tmp/ivf_cellbounds").exists(),
        "appendIvf must invalidate the cell bounds")
      intercept[IllegalStateException] {
        VectorIndex.annIvfAdaptive(spark, tmp, qv, 10, initialProbe = 2)
      }
      // rebuild the bounds over old + appended rows: sound again
      VectorIndex.buildCellBounds(spark, tmp)
      val nCells = VectorIndex.loadIvfCentroids(spark, tmp).length
      val full = rows(VectorIndex.annIvf(spark, tmp, qv, 10, nCells, Some(3L)))
      val ad = VectorIndex.annIvfAdaptive(spark, tmp, qv, 10,
        initialProbe = 2, excludeVecId = Some(3L))
      assert(rows(ad.result) == full, "post-append rebuild lost exactness")
    } finally e.unpersist()
  }

  test("rebuilding the index clears stale cell bounds") {
    val tmp = Files.createTempDirectory("adaptive-rebuild").toString
    val e = clustered(200).cache()
    try {
      VectorIndex.buildIvf(spark, e, tmp, nCells = 8)
      VectorIndex.buildCellBounds(spark, tmp)
      assert(new java.io.File(s"$tmp/ivf_cellbounds").exists())
      VectorIndex.buildIvf(spark, e, tmp, nCells = 4)
      assert(!new java.io.File(s"$tmp/ivf_cellbounds").exists(),
        "rebuild must clear bounds computed over the previous cell layout")
    } finally e.unpersist()
  }
}
