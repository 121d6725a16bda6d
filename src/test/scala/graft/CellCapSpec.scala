package graft

import org.apache.spark.sql.functions._

import graft.operators.{ExtendedQueries, KMeans}

/** Cell-size cap at build (VERDICT r14 #3 — the clustered hot-cell
  * wall): KMeans.splitOversized must bound every cell's member count
  * by the cap on a planted hot-cluster corpus, keep the assignment a
  * partition, register split cells under their parent's coarse group
  * (so the coarse-first probe reaches them), and return corpora whose
  * cells already fit UNTOUCHED — the pinned small-SF bands depend on
  * that no-op guarantee. */
class CellCapSpec extends SparkSpec {
  import spark.implicits._

  /** 1200 vectors: a 1000-member dense directional cluster (the
    * planted hot cell) + 200 spread over four other axes. Jitter
    * differentiates members so Lloyd's can split the hot mass. */
  private def hotCorpus = (0 until 1200).map { i =>
    val axis = if (i < 1000) 0 else 2 + (i % 4)
    (i.toLong, Array.tabulate(8)(j =>
      (if (j == axis) 4.0 else 0.0) + 0.4 * math.sin(i * 2.3 + j * 1.1)))
  }.toDF("vec_id", "v")

  test("splitOversized: a planted hot cell splits under the cap; assignment stays a partition") {
    val e = hotCorpus.cache()
    try {
      val model = KMeans.fitCells(spark, e, nCells = 8, iters = 2,
        twoLevelCells = 64, cellCap = 150, cellTarget = 75)
      val assign = model.assign.collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(assign.length == 1200, "every vector must stay assigned")
      assert(assign.map(_._1).distinct.length == 1200,
        "assignment must stay a partition (no vector assigned twice)")
      assert(assign.forall { case (_, c) => c >= 0 && c < model.centroids.length },
        "every assigned cell id must have a centroid")
      assert(model.centroids.length > 8,
        s"the 1000-member hot cell must have split (got ${model.centroids.length} cells)")
      val maxCell = assign.groupBy(_._2).values.map(_.length).max
      info(s"cells ${model.centroids.length}, max members $maxCell (cap 150)")
      assert(maxCell <= 150, s"max cell $maxCell exceeds the 150 cap")
    } finally e.unpersist()
  }

  test("splitOversized: corpora under the cap come back untouched (the no-op guarantee)") {
    val e = hotCorpus.cache()
    try {
      val base = KMeans.fit(spark, e, k = 8, iters = 2, trackInertia = false)
      val capped = KMeans.fitCells(spark, e, nCells = 8, iters = 2,
        twoLevelCells = 64, cellCap = 2000, cellTarget = 250)
      assert(capped.centroids.length == 8, "no split may happen under the cap")
      assert(capped.coarse == null && capped.children == null)
      val a = base._1.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      val b = capped.assign.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(a.sameElements(b), "under-cap model must be byte-identical to the plain fit")
    } finally e.unpersist()
  }

  test("splitOversized: two-level split cells register under the parent's group; probe reaches them") {
    val e = hotCorpus.cache()
    try {
      val model = KMeans.fitCells(spark, e, nCells = 8, iters = 2,
        twoLevelCells = 4, cellCap = 150, cellTarget = 75)
      assert(model.coarse != null && model.children != null, "two-level routing expected")
      // the children index stays a partition of the flat id space
      val flatIds = model.children.flatten
      assert(flatIds.sorted.sameElements(Array.range(0, model.centroids.length)),
        "every flat cell id must sit in exactly one coarse group")
      val assign = model.assign.collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(assign.length == 1200 && assign.map(_._1).distinct.length == 1200)
      val maxCell = assign.groupBy(_._2).values.map(_.length).max
      info(s"two-level: ${model.centroids.length} cells in ${model.coarse.length} groups, max members $maxCell")
      assert(maxCell <= 150, s"max cell $maxCell exceeds the 150 cap")
      // the shared probe kernel must reach split cells through the
      // explicit children index — every query gets nProbe valid cells
      val probes = KMeans.probeCells(spark,
          e.limit(50).select(col("vec_id"), col("v")),
          model.centroids, model.coarse, nProbe = 4, coarseProbe = 2,
          children = model.children)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(probes.groupBy(_._1).forall(_._2.length == 4), "every query probes nProbe cells")
      assert(probes.forall { case (_, c) => c >= 0 && c < model.centroids.length })
      // and a split (appended) cell is actually probed by someone —
      // the hot cluster's queries must land in its split children
      assert(probes.exists(_._2 >= 8),
        "no query probed any split cell — the children index is dead weight")
    } finally e.unpersist()
  }

  test("splitOversized: deterministic across runs") {
    val e = hotCorpus.cache()
    try {
      def run() = KMeans.fitCells(spark, e, nCells = 8, iters = 2,
        twoLevelCells = 64, cellCap = 150, cellTarget = 75)
        .assign.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(run().sameElements(run()), "split assignment must be deterministic")
    } finally e.unpersist()
  }

  test("splitOversized: a > cap exact-duplicate mass appends no memberless clones (r16, ADVICE r15 #1)") {
    // 800 EXACT duplicates (unsplittable: identical seeds → identical
    // child centroids → the strict-< tie keeps every member in the
    // first child) + 400 jittered vectors on other axes. The old code
    // appended memberless clone centroids of the duplicate point for
    // SplitMaxRounds rounds; now the memberless children prune and
    // the cell freezes after round one.
    val e = ((0 until 800).map(i =>
        (i.toLong, Array.tabulate(8)(j => if (j == 0) 4.0 else 0.0))) ++
      (800 until 1200).map(i =>
        (i.toLong, Array.tabulate(8)(j =>
          (if (j == 2 + i % 4) 4.0 else 0.0) + 0.4 * math.sin(i * 2.3 + j * 1.1)))))
      .toDF("vec_id", "v").cache()
    try {
      val model = KMeans.fitCells(spark, e, nCells = 4, iters = 2,
        twoLevelCells = 64, cellCap = 150, cellTarget = 75)
      val assign = model.assign.collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(assign.length == 1200 && assign.map(_._1).distinct.length == 1200,
        "assignment must stay a partition")
      val counts = assign.groupBy(_._2).map { case (c, xs) => c -> xs.length }
      // every APPENDED centroid must hold members — memberless clones
      // would tie with the real cell in probeCells' ranking and fill
      // probe slots with cells whose partitions scan nothing
      val appended = model.centroids.indices.filter(_ >= 4)
      assert(appended.forall(c => counts.getOrElse(c, 0) > 0),
        s"memberless appended centroids: ${appended.filterNot(c => counts.getOrElse(c, 0) > 0)}")
      // the duplicate mass itself stays over cap (best-effort bound) —
      // but as ONE honest cell, not cap + clones
      val dupCell = assign.find(_._1 == 0L).get._2
      assert(counts(dupCell) >= 800, "the duplicate mass must stay together")
      // and the splittable jittered cells still split under the cap
      assert(counts.filter(_._1 != dupCell).values.forall(_ <= 150),
        "separable cells must still respect the cap")
      // determinism holds through the freeze path
      val again = KMeans.fitCells(spark, e, nCells = 4, iters = 2,
        twoLevelCells = 64, cellCap = 150, cellTarget = 75)
        .assign.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(again.sameElements(assign.sortBy(_._1)))
    } finally e.unpersist()
  }

  test("e01c: forced cell cap keeps clustered-corpus accuracy (the capped fit serves)") {
    // the ScaleSwapSpec clustered corpus, scaled so the cap binds:
    // 1200 vectors in 6 clusters of 200, cap 250 < several cell sizes
    // only when k-means merges clusters — either way the capped model
    // must classify as well as the uncapped one.
    val planted = (0 until 1200).map { i =>
      val c = i % 6
      (i.toLong,
        Array.tabulate(16)(j => 3.0 * c + 0.3 * math.sin(i * 2.3 + j * 1.1)),
        c)
    }.toDF("vec_id", "v", "label")
    val got = ExtendedQueries.knnClassifyCellBlocked(spark, planted,
        cellCap = 250)
      .select("vec_id", "true_label", "pred_label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.length == 1200, "every vector must get a prediction")
    val acc = got.count { case (_, t, p) => t == p }.toDouble / got.length
    info(s"e01c capped-fit clustered accuracy = $acc")
    assert(acc >= 0.95, s"capped-fit accuracy $acc < 0.95")
  }
}
