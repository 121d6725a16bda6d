package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.toDouble
import graft.operators.AnnPanel
import graft.store.VectorIndex

/** VectorIndex.recommendRung (VERDICT r13 #4): the §8k routing tables
  * as an executable API. Driven on the planted CLUSTERED corpus (the
  * regime the coded rungs' premise holds in) and the near-random
  * sf0.01 stress corpus, plus the panel machinery's bias contract.
  */
class RungPlannerSpec extends SparkSpec {

  import spark.implicits._

  private def clustered(n: Int = 600, dim: Int = 8) =
    (0 until n).map { i =>
      val c = i % dim
      (i.toLong, Array.tabulate(dim)(j =>
        (if (j == c) 4.0 else 0.0) + 0.3 * math.sin(i * 2.3 + j * 1.1)))
    }.toDF("vec_id", "v")

  test("panel is hash-spread and independent of the model-seeding order") {
    val e = clustered()
    val panel = AnnPanel.panelQueries(spark, e)
    assert(panel.length == AnnPanel.PanelSize)
    assert(panel.map(_._1).distinct.length == panel.length)
    // the seeding order is smallest xxhash64(vec_id) — the panel must
    // NOT be that set (the v07 seed-query-bias trap): overlap should
    // be at the chance rate, not total
    val seeds = e.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(AnnPanel.PanelSize).collect().map(_.getLong(0)).toSet
    val overlap = panel.map(_._1).count(seeds.contains)
    info(s"panel/seed overlap = $overlap of ${panel.length}")
    assert(overlap < panel.length / 2,
      s"panel overlaps the seed set in $overlap of ${panel.length} queries — seed-biased")
    // deterministic: same corpus, same panel
    assert(AnnPanel.panelQueries(spark, e).map(_._1).toSeq ==
      panel.map(_._1).toSeq)
  }

  test("brute truth: one-pass panel truth equals a per-query exact recompute") {
    val e = clustered(200)
    val panel = AnnPanel.panelQueries(spark, e, 4)
    val truth = AnnPanel.bruteTruth(spark, e, panel, 3)
    val rows = e.as[(Long, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) { d += a(j)*b(j); na += a(j)*a(j); nb += b(j)*b(j); j += 1 }
      d / math.sqrt(na * nb)
    }
    panel.foreach { case (qid, qv) =>
      val exact = rows.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, BigDecimal(cos(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
      assert(truth(qid) == exact, s"truth mismatch for panel query $qid")
    }
  }

  test("recommendRung: clustered corpus — cheapest rung meeting the floor wins; reports are consistent") {
    val e = clustered()
    val (pick, rows) = VectorIndex.recommendRung(spark, e,
      memoryBudgetBytes = 1L << 30, recallFloor = 0.9, sampleN = 600)
    assert(rows.nonEmpty && rows == rows.sortBy(p => (p.bytesPerVec, p.rung)),
      "rows must come back cheapest-first")
    val brute = rows.find(_.rung.contains("brute")).get
    assert(brute.meanRecall == 1.0 && brute.minRecall == 1.0)
    rows.foreach { p =>
      assert(p.residentBytes == p.bytesPerVec.toLong * 600, s"resident bytes wrong for ${p.rung}")
      assert(p.fitsBudget, s"${p.rung} must fit a 1 GiB budget at n=600")
      assert(p.minRecall <= p.meanRecall + 1e-12)
    }
    rows.foreach(p => info(f"${p.rung}%-12s ${p.bytesPerVec}%4d B/vec mean ${p.meanRecall}%.2f min ${p.minRecall}%.2f"))
    assert(pick.isDefined, "a 1 GiB budget and 0.9 floor must be satisfiable here")
    val p = pick.get
    assert(p.meanRecall >= 0.9 && p.fitsBudget)
    // no cheaper rung may also meet the floor — p IS the recommendation
    assert(!rows.exists(r => r.bytesPerVec < p.bytesPerVec &&
      r.fitsBudget && r.meanRecall >= 0.9),
      s"${p.rung} recommended but a cheaper rung meets the floor")
  }

  test("recommendRung: constraints bind — impossible floor and tiny budget both return None; floor 0 returns the cheapest") {
    val e = clustered(300)
    // a floor above 1.0 is rejected as a contract violation
    intercept[IllegalArgumentException] {
      VectorIndex.recommendRung(spark, e, 1L << 30, recallFloor = 1.5, sampleN = 300)
    }
    // budget below even BQ's 16 B/vec: nothing fits
    val (noneBudget, rowsB) = VectorIndex.recommendRung(spark, e,
      memoryBudgetBytes = 10L, recallFloor = 0.0, sampleN = 300)
    assert(noneBudget.isEmpty, "10 bytes must fit nothing")
    assert(rowsB.forall(!_.fitsBudget))
    // floor 0, huge budget: the cheapest rung by resident bytes wins
    val (cheap, rows) = VectorIndex.recommendRung(spark, e,
      memoryBudgetBytes = 1L << 30, recallFloor = 0.0, sampleN = 300)
    assert(cheap.isDefined)
    assert(cheap.get.bytesPerVec == rows.map(_.bytesPerVec).min,
      "floor 0 must recommend the cheapest rung")
  }

  test("recommendRung: minRecallFloor binds — a rung passing on mean is rejected on its worst panel query") {
    import graft.functions.VectorFunctions.toDouble
    // stress corpus, deterministic panel: BQ reads mean 0.88 / min
    // 0.60 — with recallFloor 0.85 alone the cheap BQ wins; a
    // minRecallFloor of 0.9 must reject it (worst-case query classes
    // are the reason the panel exists) and push the pick to a rung
    // whose MIN also clears.
    val e = graft.sources.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (pick, rows) = VectorIndex.recommendRung(spark, e,
      memoryBudgetBytes = 1L << 30, recallFloor = 0.85, sampleN = 500,
      minRecallFloor = 0.9)
    assert(pick.isDefined, "SQ8/brute must satisfy both floors")
    val p = pick.get
    assert(p.meanRecall >= 0.85 && p.minRecall >= 0.9)
    // some cheaper rung passed the mean floor but failed the min gate
    // (otherwise this test isn't exercising the gate)
    assert(rows.exists(r => r.bytesPerVec < p.bytesPerVec &&
      r.fitsBudget && r.meanRecall >= 0.85 && r.minRecall < 0.9),
      s"expected a mean-passing/min-failing cheaper rung; got ${rows}")
  }

  test("recommendRung(dir): plans from the persisted IVF family, writes rung_plan beside it, round-trips; code-only dirs refuse") {
    // VERDICT r14 #8 — serving decisions happen where artifacts
    // already exist; the planner's evidence ships with the index.
    val e = clustered()
    val dir = java.nio.file.Files.createTempDirectory("rungplan").toString
    VectorIndex.buildIvf(spark, e, dir)
    val (pick, rows) = VectorIndex.recommendRung(spark, dir,
      memoryBudgetBytes = 1L << 30, recallFloor = 0.9, sampleN = 600,
      panelN = AnnPanel.PanelSize, k = 10, minRecallFloor = 0.0)
    assert(pick.isDefined, "the clustered corpus satisfies 0.9 at 1 GiB")
    // the DataFrame form on the same vectors must agree (the dir form
    // IS that planner over the read-back corpus)
    val (pick2, rows2) = VectorIndex.recommendRung(spark, e,
      memoryBudgetBytes = 1L << 30, recallFloor = 0.9, sampleN = 600)
    assert(pick.map(_.rung) == pick2.map(_.rung), "dir and DataFrame forms must agree")
    assert(rows.map(r => (r.rung, r.bytesPerVec, r.residentBytes)) ==
      rows2.map(r => (r.rung, r.bytesPerVec, r.residentBytes)))
    // round-trip: the persisted artifact carries every row and flags
    // exactly the picked rung
    val persisted = VectorIndex.loadRungPlan(spark, dir).collect()
    assert(persisted.length == rows.length)
    val flagged = persisted.filter(_.getAs[Boolean]("recommended"))
      .map(_.getAs[String]("rung")).toSeq
    assert(flagged == Seq(pick.get.rung),
      s"rung_plan must flag exactly the pick, got $flagged")
    persisted.foreach { r =>
      val row = rows.find(_.rung == r.getAs[String]("rung")).get
      assert(r.getAs[Long]("resident_bytes") == row.residentBytes)
      assert(math.abs(r.getAs[Double]("mean_recall") - row.meanRecall) < 1e-12)
    }
    // a code-only dir has no vectors to measure recall on — refuse,
    // naming the DataFrame form
    val codeOnly = java.nio.file.Files.createTempDirectory("rungplan-sq").toString
    VectorIndex.buildSq(spark, e, codeOnly)
    val ex = intercept[IllegalStateException] {
      VectorIndex.recommendRung(spark, codeOnly, 1L << 30, 0.9)
    }
    assert(ex.getMessage.contains("ivf_vectors"),
      s"refusal must name the missing layout, got: ${ex.getMessage}")
  }

  test("recommendBatchRung: a batch workload routes v08 → the IVF-cell family by corpus size (VERDICT r15 #7)") {
    // 1600 vectors in 8 directional clusters; queries UNBOUNDED
    // (nQueries past the broadcast ceiling disqualifies brute)
    val e = (0 until 1600).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(8)(j =>
        (if (j == c) 4.0 else 0.0) + 0.3 * math.sin(i * 2.3 + j * 1.1)))
    }.toSeq.toDF("vec_id", "v")
    // SMALL corpus (1600): v08 is inside its occupancy bound and its
    // candidate volume (= n at these dials) undercuts the cell rungs'
    // probe×target — the near-random-friendly tool wins the decade
    val (small, smallRows) = VectorIndex.recommendBatchRung(spark, e,
      nQueries = VectorIndex.BruteBatchMaxQueries + 1, k = 3,
      recallFloor = 0.9)
    smallRows.foreach(p => info(
      f"small  ${p.rung}%-36s feasible=${p.feasible} cand/q=${p.candidatesPerQuery}%7d mean ${p.meanRecall}%.2f"))
    assert(small.exists(_.rung.contains("v08")),
      s"small corpus should route v08, got ${small.map(_.rung)}")
    // LARGE corpus (same sample, knownN = 200k — the measured v08
    // failure decade): v08 is infeasible, brute is disqualified by
    // the unbounded query batch, and the IVF-cell family (persisted
    // form first — no refit) is what remains
    val (large, largeRows) = VectorIndex.recommendBatchRung(spark, e,
      nQueries = VectorIndex.BruteBatchMaxQueries + 1, k = 3,
      recallFloor = 0.9, knownN = 200000L)
    largeRows.foreach(p => info(
      f"large  ${p.rung}%-36s feasible=${p.feasible} cand/q=${p.candidatesPerQuery}%7d mean ${p.meanRecall}%.2f"))
    assert(!largeRows.find(_.rung.contains("v08")).get.feasible,
      "v08 must be infeasible at 200k")
    assert(large.exists(p => p.rung.contains("annIvfBatch") || p.rung.contains("v15")),
      s"large corpus should route the IVF-cell family, got ${large.map(_.rung)}")
    // BOTH measured regimes of the kernel-identical IVF pair (r17,
    // VERDICT r16 #1 — the old pin here enshrined the persisted form
    // winning EVERY tie, the exact shape ProfBatch measured it losing
    // 2× at: 88.8 vs 40.3 s fixed dial on the 597k corpus-sized
    // batch). A CORPUS-SIZED batch probes ~every cell — the partition
    // filter prunes nothing and the persisted disk re-scan loses to
    // the in-entry cached corpus, so the pick must route in-entry:
    assert(large.get.rung.contains("v15"),
      "a corpus-sized batch (expected probed-cell coverage ~1) must " +
      s"route the in-entry form — ProfBatch's 2× measurement — got ${large.get.rung}")
    // ... while a SELECTIVE batch (20 queries over an 800-cell model:
    // coverage ≈ 0.18) keeps the pruned persisted read and its
    // amortized build (ProfBatch: 14.9 vs 33.2 s at the 1k batch):
    val (selective, _) = VectorIndex.recommendBatchRung(spark, e,
      nQueries = 20, k = 3, recallFloor = 0.9, knownN = 200000L)
    assert(selective.get.rung.contains("annIvfBatch"),
      s"a selective batch must route the persisted no-refit form, got ${selective.get.rung}")
    assert(!selective.get.paysFit,
      "selective-batch pick should avoid a per-call fit")
    // the fail-fasts cite the planner (the discoverability contract)
    val big = (0 until 41000).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.sin(i * 2.3 + j)), i % 4))
      .toSeq.toDF("vec_id", "v", "label")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.VectorQueries.knnBatchAnn(spark, big, k = 3)
    }
    assert(ex.getMessage.contains("recommendBatchRung"),
      "v08's regime fail-fast must cite the batch planner")
  }

  test("recommendRung: stress corpus (sf0.01) — brute stays exact, SQ8 meets a 0.95 floor the 8-byte rungs may not") {
    val e = graft.sources.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (pick, rows) = VectorIndex.recommendRung(spark, e,
      memoryBudgetBytes = 1L << 30, recallFloor = 0.95, sampleN = 500)
    rows.foreach(p => info(f"${p.rung}%-12s ${p.bytesPerVec}%4d B/vec mean ${p.meanRecall}%.2f min ${p.minRecall}%.2f"))
    assert(pick.isDefined, "SQ8 (or cheaper) should meet 0.95 on the stress corpus")
    val sq = rows.find(_.rung.contains("SQ8")).get
    assert(sq.meanRecall >= 0.95,
      s"SQ8 mean ${sq.meanRecall} below the floor its routing guidance promises")
    assert(pick.get.meanRecall >= 0.95)
  }
}
