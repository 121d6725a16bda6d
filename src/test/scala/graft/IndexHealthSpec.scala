package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.VectorIndex

/** VectorIndex.indexHealth (VERDICT r11 #6): one read unifying the
  * three serving-hygiene dials — quantization drift (rebuild),
  * cell imbalance (rebuild), tombstone debt (compact) — with each
  * planted condition tripping exactly its own line. */
class IndexHealthSpec extends SparkSpec {

  private def cloud(ids: Range, offset: Double, amp: Double = 0.3): DataFrame = {
    import spark.implicits._
    ids.map { id =>
      val center = id % 4
      (id.toLong, Array.tabulate(8)(j =>
        center.toDouble + amp * math.sin(id * 2.3 + j * 1.1) + offset))
    }.toDF("vec_id", "v")
  }

  test("fresh build is healthy on every dial") {
    val tmp = Files.createTempDirectory("health-fresh").toString
    val e = cloud(0 until 200, 0.0).cache()
    try {
      VectorIndex.buildIvf(spark, e, tmp, nCells = 4)
      VectorIndex.buildIvfPq(spark, e, tmp, nCells = 4)
      val h = VectorIndex.indexHealth(spark, tmp)
      assert(h.driftRatio.isEmpty, "no appends -> no drift evidence")
      assert(h.imbalance.isDefined && !h.imbalanceRebuild,
        s"balanced build tripped imbalance: ${h.imbalance}")
      assert(h.tombstoneDebt.isEmpty, "no tombstones -> no debt")
      assert(h.healthy && !h.needsRebuild && !h.needsCompact)
    } finally e.unpersist()
  }

  test("drifted appends trip ONLY the drift line") {
    val tmp = Files.createTempDirectory("health-drift").toString
    val e = cloud(0 until 200, 0.0).cache()
    val drifted = cloud(200 until 400, 8.0, amp = 1.2).cache()
    try {
      VectorIndex.buildIvfPq(spark, e, tmp, nCells = 4)
      VectorIndex.appendIvfPq(spark, tmp, drifted)
      val h = VectorIndex.indexHealth(spark, tmp)
      assert(h.driftRebuild, s"drift ratio ${h.driftRatio} should trip")
      assert(h.needsRebuild && !h.needsCompact && !h.healthy)
    } finally { e.unpersist(); drifted.unpersist() }
  }

  test("appends piled into one region trip ONLY the imbalance line") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("health-imb").toString
    val e = cloud(0 until 200, 0.0).cache()
    try {
      // 8 cells so the hot cell can exceed 4x the mean (with k=4 the
      // max/mean ratio is asymptotically capped AT 4)
      VectorIndex.buildIvf(spark, e, tmp, nCells = 8)
      // 800 arrivals all at center 0 (in-distribution VALUES, so no
      // drift table exists for plain IVF anyway): one cell takes
      // everything -> max/mean blows past the threshold
      val pile = (1000 until 1800).map { id =>
        (id.toLong, Array.tabulate(8)(j =>
          0.0 + 0.3 * math.sin(id * 2.3 + j * 1.1)))
      }.toDF("vec_id", "v")
      VectorIndex.appendIvf(spark, tmp, pile)
      val h = VectorIndex.indexHealth(spark, tmp)
      assert(h.imbalanceRebuild, s"imbalance ${h.imbalance} should trip")
      assert(h.needsRebuild && !h.needsCompact)
      assert(h.driftRatio.isEmpty, "plain IVF has no drift baseline")
    } finally e.unpersist()
  }

  test("tombstone debt past 10% trips ONLY the compact line; compaction restores health") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("health-debt").toString
    val e = cloud(0 until 200, 0.0).cache()
    try {
      VectorIndex.buildIvf(spark, e, tmp, nCells = 4)
      VectorIndex.tombstone(spark, tmp, (0L until 40L).toDF("vec_id"))
      val h = VectorIndex.indexHealth(spark, tmp)
      // 40 tombstones / 160 live rows = 0.25 debt
      assert(h.needsCompact, s"debt ${h.tombstoneDebt} should trip")
      assert(!h.needsRebuild, "deletes alone must not demand a rebuild")
      val removed = VectorIndex.compactTombstones(spark, tmp)
      assert(removed("ivf_vectors") == 40L)
      val h2 = VectorIndex.indexHealth(spark, tmp)
      assert(h2.healthy, s"post-compaction health: $h2")
    } finally e.unpersist()
  }
}
