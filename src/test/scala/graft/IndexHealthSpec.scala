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

  test("rebuild-with-split (buildIvf cellCap) clears the append-pile imbalance; cap enforced; all-probe stays brute-exact") {
    import spark.implicits._
    // VERDICT r14 #3's remediation lever, end to end: imbalance
    // arrives the way it does in production — appends piling into a
    // FROZEN model's hot cell (the proven trip above) — and the
    // remediation is a rebuild whose cellCap BOUNDS the hot cell's
    // member count by splitting at build. The flat layout is cap-
    // agnostic, so probing every cell is still exactly brute force.
    val tmp = Files.createTempDirectory("health-split").toString
    val e = cloud(0 until 200, 0.0).cache()
    try {
      VectorIndex.buildIvf(spark, e, tmp, nCells = 8)
      val pile = (1000 until 1800).map { id =>
        (id.toLong, Array.tabulate(8)(j =>
          0.0 + 0.05 * math.sin(id * 2.3 + j * 1.1)))
      }.toDF("vec_id", "v")
      VectorIndex.appendIvf(spark, tmp, pile)
      val before = VectorIndex.indexHealth(spark, tmp)
      assert(before.imbalanceRebuild,
        s"append pile must trip the imbalance dial, got ${before.imbalance}")
      // the remediation: rebuild over the LIVE corpus with the cap
      val combined = e.unionAll(pile).cache()
      try {
        VectorIndex.buildIvf(spark, combined, tmp, nCells = 8, cellCap = 200)
        val after = VectorIndex.indexHealth(spark, tmp)
        info(s"imbalance before=${before.imbalance} after=${after.imbalance}")
        assert(!after.imbalanceRebuild,
          s"capped rebuild must clear the dial, got ${after.imbalance}")
        // the cap actually binds: no cell above it, and the tight
        // 800-member pile had to split into extra cells
        val sizes = spark.read.parquet(s"$tmp/ivf_vectors")
          .groupBy("cluster").count().collect().map(_.getLong(1))
        assert(sizes.max <= 200, s"cap violated: max cell ${sizes.max}")
        val nCellsAfter = spark.read.parquet(s"$tmp/ivf_centroids")
          .select("c").distinct().count().toInt
        assert(nCellsAfter > 8, "the pile must actually have split")
        // all-probe == brute force, independent of the split layout
        val qv = combined.filter(col("vec_id") === 0).head.getSeq[Double](1).toArray
        val served = VectorIndex.annIvf(spark, tmp, qv,
            k = 10, nProbe = nCellsAfter, excludeVecId = Some(0L))
          .collect().map(_.getLong(0))
        val brute = graft.operators.VectorQueries.bruteTopK(spark,
            combined.withColumn("label", lit(0)), Array((0L, qv)), 10)
          .orderBy("rk").collect().map(_.getLong(1))
        assert(served.sameElements(brute),
          "all-probe serving over the split layout must equal brute force")
      } finally combined.unpersist()
    } finally e.unpersist()
  }
}
