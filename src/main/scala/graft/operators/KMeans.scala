package graft.operators

import graft.plans.Pins.Pinned

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Distributed Lloyd's k-means over an embedding column (SURVEY.md §2
  * e02) — the clustering step of a training-data curation pipeline
  * (stratified sampling, dedup-by-cluster, diversity balancing).
  *
  * Scale design: the MODEL (k×dim centroids) lives on the driver and
  * is broadcast into the assignment expression as literals — the
  * data-side work per iteration is one narrow map (argmin over k
  * codegen'd dot products; |v|² drops out of the argmin) plus one
  * aggregation keyed by (cluster, dim) with map-side partial
  * aggregation. The corpus is never collected; per-iteration driver
  * traffic is k×dim doubles.
  */
object KMeans {

  /** Returns (assignments (vec_id, cluster), centroids, inertia per
    * iteration). Deterministic: init = HASH-SPREAD seeding (r10,
    * VERDICT r9 #4) — the k vectors with the smallest
    * xxhash64(vec_id), i.e. a deterministic uniform sample over the
    * corpus independent of storage order. First-k-by-vec_id seeding
    * is a trap on real corpora, which arrive SORTED (by source, by
    * crawl date, by z-order): the first k rows then land in one
    * region of embedding space, Lloyd's starts with k co-located
    * centroids, and most clusters begin empty (SkewCorpusSpec pins
    * the planted case where spread seeding strictly beats first-k
    * inertia). One TakeOrdered top-k — never a full sort.
    * trackInertia=false skips the per-iteration inertia action
    * (halves the Spark jobs — assignment+centroid-update only); the
    * convergence trace is a diagnostics concern, not a fit one.
    * spreadSeed=false keeps the legacy first-k init (the quality
    * comparison's baseline; not a serving mode). */
  /** Above this k the fit's per-iteration assignment routes through
    * a BROADCAST-MODEL typed map (nearestIndex) instead of the
    * literal argmin expression: the expression path recompiles its
    * k×dim literals through janino EVERY iteration (no cache — new
    * centroid literals each time) and its compile + eval cost is the
    * measured wall, not the FLOPs — AnnLadder at 200k: flat fit
    * 138.7 s at 64 cells / 571.8 s at 256, where the typed-map form
    * of the same arithmetic runs the 2M corpus at 90 centroids in
    * under a minute. The two paths share the argmin semantics and
    * the first-index tie rule (assignExpr's array_min struct ties to
    * the lowest i; nearestIndex keeps the first strict minimum) —
    * float-rounding of |v−c|² vs c²−2v·c can differ at the last ulp,
    * which is a TRAINING-trajectory detail (the frozen-model serving
    * rule is nearestIndex everywhere); below the threshold the
    * literal path runs byte-identically to every prior round.
    * Was 64 through r15 (the historical-trajectory pin); the r15
    * ADVICE re-based it to 32 so the hot k=64 fits (e01c's flat-
    * routing maximum, the ladder's 64-cell sweep point — the
    * measured 138.7 s/200k janino wall) take the fast path. The
    * shipped sf-scale entries fit k ≤ 8 cells (untouched); the
    * 33–64 band's trajectories shift by ulp-level rounding only. */
  val FitExprMaxK = 32

  def fit(spark: SparkSession, emb: DataFrame, k: Int, iters: Int,
      trackInertia: Boolean = true, spreadSeed: Boolean = true)
      : (DataFrame, Array[Array[Double]], Seq[Double]) = {
    val e = emb.select(col("vec_id"), col("v")).cache()
    val seedOrder =
      if (spreadSeed) Seq(xxhash64(col("vec_id")), col("vec_id"))
      else Seq(col("vec_id"))
    var centroids: Array[Array[Double]] = e.orderBy(seedOrder: _*).limit(k)
      .collect().map(_.getSeq[Double](1).toArray) // k rows only
    val inertias = scala.collection.mutable.ListBuffer.empty[Double]

    def assignExpr(cs: Array[Array[Double]]) = {
      // argmin_i |v - c_i|² == argmin_i (|c_i|² - 2 v·c_i)
      val scored = cs.zipWithIndex.map { case (c, i) =>
        val cCol = array(c.map(lit): _*)
        val c2 = c.map(x => x * x).sum
        struct((lit(c2) - dotNative(col("v"), cCol) * 2).as("d"), lit(i).as("i"))
      }
      array_min(array(scored: _*)).getField("i")
    }

    def assign(cs: Array[Array[Double]]): DataFrame =
      // <= so k == FitExprMaxK keeps the HISTORICAL literal path (the
      // scaladoc's "above this k" reading): the typed map's |v−c|²
      // and the expression's c²−2v·c can differ at the last ulp,
      // which would silently move a pinned training trajectory
      // between rounds — the boundary is k=32 since the r15 rebase
      // (33–64 trajectories DELIBERATELY moved to the typed-map path
      // then; every k ≤ 32 trajectory is pinned to the literal path).
      if (k <= FitExprMaxK) e.withColumn("cluster", assignExpr(cs))
      else {
        import spark.implicits._
        val bc = spark.sparkContext.broadcast(cs)
        e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
          .map { case (id, v) => (id, v, nearestIndex(v, bc.value)) }
          .toDF("vec_id", "v", "cluster")
      }

    for (_ <- 0 until iters) {
      val assigned = assign(centroids)
      // new centroid = elementwise mean; (cluster, dim) keyed agg
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect() // k × dim rows only
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.indices.map { i =>
        byCluster.get(i) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3)).toArray
          case None => centroids(i) // empty cluster keeps its centroid
        }
      }.toArray
      if (trackInertia) {
        val distToOwn = centroids.indices.foldLeft(lit(0.0)) { (acc, i) =>
          val cCol = array(centroids(i).map(lit): _*)
          val c2 = centroids(i).map(x => x * x).sum
          when(col("cluster") === i,
            dotNative(col("v"), col("v")) - dotNative(col("v"), cCol) * 2 + c2)
            .otherwise(acc)
        }
        inertias += assigned.select(sum(distToOwn)).head().getDouble(0)
      }
    }
    val finalAssign = assign(centroids)
      .select("vec_id", "cluster")
    (finalAssign, centroids, inertias.toSeq)
  }

  /** TWO-LEVEL (hierarchical) coarse quantizer — the standard
    * scale form of the IVF cell assignment (the residue item e01c's
    * scaladoc named): a flat k-means at nCells costs every vector
    * nCells distance evaluations PER ITERATION, which at 10⁹ vectors
    * × 10⁶ cells is 10¹⁵ distances; splitting the codebook into
    * k1 ≈ √nCells coarse centroids with k2 = ⌈nCells/k1⌉ children
    * EACH costs k1 + k2 per vector instead (~500× fewer at those
    * dials) at a modest quantization-error premium (each vector only
    * sees its own coarse group's children).
    *
    * Spark shape: level 1 is the existing [[fit]] (hash-spread
    * seeds, broadcast-model argmin, (cluster, dim)-keyed partial
    * agg); level 2 runs ALL k1 child fits simultaneously as one
    * keyed pass per iteration — the child model is a broadcast
    * Map(coarse → children) consulted by a narrow typed map (the
    * silhouette convention: per-partition imperative math over a
    * driver-broadcast model is the right tool once the model is too
    * wide for literal expressions), and the centroid update is one
    * (coarse, sub, dim)-keyed agg collecting ≤ k1·k2·dim rows.
    * Child seeds are per-group hash-spread (smallest xxhash64 within
    * the group — one window over the coarse key, never a sort of the
    * corpus).
    *
    * Returns (assignments (vec_id, cluster) with FLAT cell ids
    * coarse·k2 + sub, flat centroids indexed by that id, coarse
    * centroids). The flat id space is k1·k2 ≥ nCells; groups with
    * fewer vectors than k2 pad unused slots with their group's first
    * seed. At INIT a padded duplicate is never argmin-assigned
    * (strict `<` keeps the first); after the first centroid UPDATE
    * the real cell moves to its member mean while the pad keeps the
    * stale seed position, so a later iteration may legitimately
    * assign members to the pad — it then just becomes another real
    * cell. Either way every cell's centroid is positioned and the
    * assignment stays a partition; truly-empty cells cost a probe
    * slot at most (their partition scans nothing). Downstream
    * consumers (buildIvf layout, nearestCells probe, silhouette) are
    * agnostic: the flat (assignments, centroids) pair is drop-in. */
  /** Nearest centroid by squared L2; the FIRST index wins an exact
    * tie. This is THE frozen-model assignment rule — fitTwoLevel's
    * child pass and VectorIndex.appendIvf share this kernel so the
    * tie-break (which the padded-duplicate design depends on) cannot
    * drift between paths. */
  private[graft] def nearestIndex(v: Array[Double],
      cs: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue; var i = 0
    while (i < cs.length) {
      val c = cs(i)
      var d = 0.0; var j = 0
      while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
      if (d < bd) { bd = d; best = i }
      i += 1
    }
    best
  }

  /** Squared L2 distance — the one metric kernel [[nearestIndex]],
    * [[probeCells]] and v15's bounded re-probe share. */
  private[graft] def sqDist(v: Array[Double], c: Array[Double]): Double = {
    var d = 0.0; var j = 0
    while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
    d
  }

  /** The uniform contiguous group→children index fitTwoLevel's flat
    * id space implies (group g owns cells g·k2 until (g+1)·k2) —
    * what every caller probed with before cell splitting made the
    * layout explicit. `null` coarse (flat model) has no groups. */
  private[graft] def uniformChildren(nFlat: Int,
      coarse: Array[Array[Double]]): Array[Array[Int]] =
    if (coarse == null) null
    else {
      val k2 = nFlat / coarse.length
      Array.tabulate(coarse.length)(g =>
        Array.range(g * k2, math.min((g + 1) * k2, nFlat)))
    }

  /** The candidate cells a query may probe — THE one definition the
    * probe ([[probeCells]]) and v15's bounded re-probe both use, so
    * "which cells were reachable" can never drift between round one
    * and the re-probe round. Flat model (coarse == null): every
    * cell. Two-level: the `coarseProbe` nearest groups' children per
    * the EXPLICIT children index (uniform before any split; split
    * cells stay listed under their parent's group). */
  private[graft] def candidateCells(v: Array[Double],
      cs: Array[Array[Double]], coarse: Array[Array[Double]],
      children: Array[Array[Int]], coarseProbe: Int): Array[Int] =
    candidateCellsExtended(v, cs, coarse, children, coarseProbe, _ => false)

  /** [[candidateCells]] plus ADMITTED STRADDLE GROUPS (r16, VERDICT
    * r15 #2 — the cross-coarse-group scope hole): beyond the
    * `coarseProbe` nearest groups, up to `maxAdmitted` further groups
    * `groupAdmit` accepts are included too — nearest (by coarse
    * distance, the probe order's continuation) first. The adaptive
    * top-up passes a per-group cosine upper bound (q̂·ĝ + R̂g, the
    * cell bound one level up) ≥ θk, so a query whose true neighbour
    * sits in the 5th-nearest coarse group becomes REACHABLE exactly
    * when that group could still beat the pooled k-th. The CAP is the
    * cost bound: derived group bounds are LOOSE on spread-out groups
    * (R̂g covers the whole group's directional spread — measured at
    * clustered-2M: uncapped admission let ~every group in and the
    * re-probe flatMap sqDist-ranked all 8000 cells per query, v15
    * 42 → 122 s), so admission is budget-shaped like the re-probe
    * itself: the common case pays k1 bound evaluations + ranking
    * (coarseProbe + maxAdmitted)·k2 cells, never the full flat space.
    * ONE definition with the fixed-scope rule so the two cannot
    * drift. */
  private[graft] def candidateCellsExtended(v: Array[Double],
      cs: Array[Array[Double]], coarse: Array[Array[Double]],
      children: Array[Array[Int]], coarseProbe: Int,
      groupAdmit: Int => Boolean, maxAdmitted: Int = Int.MaxValue): Array[Int] =
    if (coarse == null) Array.range(0, cs.length)
    else {
      val gds = new Array[(Double, Int)](coarse.length)
      var g = 0
      while (g < coarse.length) { gds(g) = (sqDist(v, coarse(g)), g); g += 1 }
      val ranked = gds.sortBy(_._1)
      (ranked.take(coarseProbe) ++
        ranked.drop(coarseProbe).filter { case (_, grp) => groupAdmit(grp) }
          .take(maxAdmitted))
        .flatMap { case (_, grp) => children(grp) }
    }

  /** Coarse-first probe-cell selection — THE shared probe kernel for
    * every cell-blocked batch path (e01c's knnClassifyCellBlocked and
    * v15's knnBatchIvf call this; the [[nearestIndex]] convention:
    * one definition so the two-level probe rule cannot drift between
    * paths). For each query row (id, v): with `coarse == null` every
    * centroid is ranked (the flat small-corpus path, byte-identical
    * to the pre-two-level rounds); otherwise only the `coarseProbe`
    * nearest coarse groups' children (per the explicit `children`
    * index — see [[CellModel]]) are ranked — k1 + coarseProbe·k2
    * ≈ (1+coarseProbe)·√nCells distances per query instead of nCells.
    * Emits the `nProbe` nearest cells as narrow (qid, cluster) rows
    * against the broadcast model (the assignResiduals convention).
    *
    * `children` is REQUIRED alongside a two-level model (pass
    * [[CellModel.children]], or [[uniformChildren]] for a fresh
    * un-split fitTwoLevel layout): silently synthesizing the uniform
    * index here was the r15 ADVICE footgun — on a post-split model
    * (centroids grown past k1·k2) the synthesized k2 = nFlat/k1
    * regroups appended split-cell ids into the WRONG coarse groups.
    * A flat model (coarse == null) takes children == null. */
  private[graft] def probeCells(spark: SparkSession, queries: DataFrame,
      centroids: Array[Array[Double]], coarse: Array[Array[Double]],
      nProbe: Int, coarseProbe: Int,
      children: Array[Array[Int]]): DataFrame = {
    import spark.implicits._
    require(coarse == null || children != null,
      "probeCells: a two-level model needs its explicit children index " +
      "(CellModel.children, or KMeans.uniformChildren for an un-split " +
      "fitTwoLevel layout) — synthesizing it here mis-groups split cells")
    val bc = spark.sparkContext.broadcast(centroids)
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val bcChildren = spark.sparkContext.broadcast(children)
    queries.as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val cs = bc.value
        val cand = candidateCells(v, cs, bcCoarse.value, bcChildren.value,
          coarseProbe)
        val ds = new Array[(Double, Int)](cand.length)
        var i = 0
        while (i < cand.length) {
          ds(i) = (sqDist(v, cs(cand(i))), cand(i)); i += 1
        }
        ds.sortBy(_._1).take(nProbe).map { case (_, cell) => (id, cell) }
      }
      .toDF("qid", "cluster")
  }

  def fitTwoLevel(spark: SparkSession, emb: DataFrame, nCells: Int,
      iters: Int, branch: Int = 0)
      : (DataFrame, Array[Array[Double]], Array[Array[Double]]) = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    require(nCells >= 4, s"fitTwoLevel wants nCells >= 4, got $nCells (use fit)")
    val k1 = if (branch > 0) branch
      else math.max(2, math.ceil(math.sqrt(nCells.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(nCells.toDouble / k1).toInt)
    val e = emb.select(col("vec_id"), col("v")).cache()
    try {
      val (coarseAssign, coarse, _) =
        fit(spark, e, k1, iters, trackInertia = false)
      // a corpus smaller than k1 seeds fewer coarse centroids than
      // requested — every structure below sizes to what EXISTS
      val k1e = coarse.length
      val withCoarse = e.join(coarseAssign, "vec_id")
        .select(col("vec_id"), col("v"), col("cluster").as("coarse"))
        .as[(Long, Array[Double], Int)]
        .cache()
      try {
        // per-group hash-spread seeds: k2 smallest xxhash64 per coarse
        val seeds = withCoarse.toDF("vec_id", "v", "coarse")
          .withColumn("rk", row_number().over(
            Window.partitionBy("coarse")
              .orderBy(xxhash64(col("vec_id")), col("vec_id"))))
          .filter(col("rk") <= k2)
          .select(col("coarse"), (col("rk") - 1).cast("int").as("sub"), col("v"))
          .as[(Int, Int, Array[Double])].collect() // ≤ k1·k2 rows
        val byGroup = seeds.groupBy(_._1)
        var children: Array[Array[Array[Double]]] = Array.tabulate(k1e) { g =>
          byGroup.get(g) match {
            case Some(rows) =>
              val got = rows.sortBy(_._2).map(_._3)
              got ++ Array.fill(k2 - got.length)(got.head) // pad: empty-but-positioned
            case None => Array.fill(k2)(coarse(g)) // empty coarse group
          }
        }
        def assignSub(cs: Array[Array[Array[Double]]]) = {
          val bc = spark.sparkContext.broadcast(cs)
          withCoarse.map { case (id, v, g) =>
            (id, g, KMeans.nearestIndex(v, bc.value(g)), v)
          }
        }
        for (_ <- 0 until iters) {
          val sums = assignSub(children).toDF("vec_id", "coarse", "sub", "v")
            .select(col("coarse"), col("sub"), posexplode(col("v")).as(Seq("dim", "x")))
            .groupBy("coarse", "sub", "dim")
            .agg(sum("x").as("sx"), count(lit(1)).as("n"))
            .collect() // ≤ k1·k2·dim rows only
          val byCell = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
          children = Array.tabulate(k1e) { g =>
            Array.tabulate(k2) { s =>
              byCell.get((g, s)) match {
                case Some(rows) =>
                  rows.sortBy(_.getInt(2)).map(r => r.getDouble(3) / r.getLong(4))
                case None => children(g)(s) // empty cell keeps its centroid
              }
            }
          }
        }
        val finalChildren = children
        val assign = assignSub(finalChildren)
          .map { case (id, g, s, _) => (id, g * k2 + s) }
          .toDF("vec_id", "cluster")
        // materialize before the caches release (drop-in contract:
        // fit() returns a plan over its own cached input; here the
        // upstream caches are scoped, so pin the small result)
        val pinned = assign.pinned
        val flat = Array.tabulate(k1e * k2)(i => finalChildren(i / k2)(i % k2))
        (pinned, flat, coarse)
      } finally withCoarse.unpersist()
    } finally e.unpersist()
  }

  /** A fitted cell model for the cell-blocked batch kernels (e01c /
    * v15): flat assignment + centroids, the optional coarse level
    * (null = flat probe), and the EXPLICIT group→children index
    * (null when coarse is null) that [[probeCells]] and the v15
    * re-probe route through — uniform g·k2 blocks straight out of
    * [[fitTwoLevel]], extended in place by [[splitOversized]] when a
    * hot cell splits (children stay under their parent's group, so
    * the coarse-first probe reaches them without re-fitting level 1). */
  private[graft] final case class CellModel(assign: DataFrame,
      centroids: Array[Array[Double]], coarse: Array[Array[Double]],
      children: Array[Array[Int]],
      // the PRE-split uniform block size (flat cells per coarse group
      // straight out of fitTwoLevel) — what persisted metadata must
      // record as k2: splits APPEND flat ids, so deriving k2 as
      // centroids.length / k1 after a split mis-groups every cell
      // (r16 ADVICE). 0 when there is no coarse level.
      baseK2: Int = 0)

  /** Hot cells split into ceil(members/target) children, but never
    * more: a degenerate fit that dumped the corpus into one cell
    * must not demand a million-child sub-fit in one round (the next
    * round splits the still-hot children recursively). */
  val SplitMaxChildren = 256

  /** Split rounds before [[splitOversized]] stops chasing stragglers:
    * each round splits at target granularity, so 3 rounds bound the
    * residual at cap·(cap/target)⁻ᵏ — in practice one round clears
    * real corpora and round 2 the Lloyd's-collapse stragglers. */
  val SplitMaxRounds = 3

  /** THE routed fit for the cell-blocked batch entries — flat below
    * `twoLevelCells` (byte-identical to every prior round), two-level
    * above (the r13 scale routing), then [[splitOversized]] caps
    * member counts at `cellCap`. Callers probe via [[probeCells]]
    * with the model's children index. */
  private[graft] def fitCells(spark: SparkSession, emb: DataFrame,
      nCells: Int, iters: Int, twoLevelCells: Int,
      cellCap: Int, cellTarget: Int): CellModel = {
    val base =
      if (nCells >= twoLevelCells) {
        val (a, flat, c) = fitTwoLevel(spark, emb, nCells, iters)
        CellModel(a, flat, c, uniformChildren(flat.length, c),
          baseK2 = flat.length / c.length)
      } else {
        val (a, cs, _) = fit(spark, emb, nCells, iters, trackInertia = false)
        CellModel(a, cs, null, null)
      }
    if (cellCap <= 0) base
    else splitOversized(spark, emb, base, cellCap, cellTarget, iters)
  }

  /** CELL-SIZE CAP (VERDICT r14 #3 — the clustered hot-cell wall):
    * nCells ∝ n makes cells AVERAGE `target` members, but on real
    * (clustered) corpora k-means concentrates mass — a cell that
    * captures several dense clusters holds thousands of members, and
    * since probe frequency rises with the same density, hot cells
    * are probed MOST exactly where scans are LONGEST (the measured
    * 2.4× clustered-vs-stress premium at 2M: 688 vs 284 s). This
    * post-pass bounds probe cost by the CAP, not by the hottest
    * cluster's density: any cell above `cap` members splits into
    * ceil(members/target) children via one keyed Lloyd's pass over
    * ALL hot cells simultaneously (fitTwoLevel's level-2 machinery:
    * per-cell hash-spread seeds, broadcast child model, typed-map
    * argmin, (cell, sub, dim)-keyed centroid agg — never a
    * per-cell driver loop), recursively up to [[SplitMaxRounds]].
    * Child 0 reuses the parent's flat id (its centroid moves);
    * children 1.. append new flat ids REGISTERED UNDER THE PARENT'S
    * COARSE GROUP, so the coarse-first probe reaches split cells
    * without touching level 1. Corpora whose cells all fit under
    * `cap` (every sf-scale test corpus) return the input model
    * UNTOUCHED — plans, trajectories and pinned bands stay
    * byte-identical below the decade scales. */
  private[graft] def splitOversized(spark: SparkSession, emb: DataFrame,
      model: CellModel, cap: Int, target: Int, iters: Int,
      maxRounds: Int = SplitMaxRounds): CellModel = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    require(cap >= target, s"splitOversized wants cap >= target, got $cap < $target")
    var cur = model
    var round = 0
    var stable = false
    // NO-PROGRESS cells (r15 ADVICE): a hot cell whose largest child
    // kept EVERY member (e.g. > cap exact duplicates — identical
    // seeds → identical child centroids → the strict-< tie sends all
    // members to the first child) cannot be shrunk by re-splitting;
    // freeze it so later rounds don't burn their budget re-proving it.
    var frozen = Set.empty[Int]
    while (round < maxRounds && !stable) {
      val hot = cur.assign.groupBy("cluster")
        .agg(count(lit(1)).as("n")).filter(col("n") > cap)
        .as[(Int, Long)].collect().sortBy(_._1) // ≤ nCells rows
        .filterNot { case (c, _) => frozen(c) }
      if (hot.isEmpty) stable = true
      else {
        val kSub: Map[Int, Int] = hot.map { case (c, n) =>
          c -> math.min(SplitMaxChildren,
            math.max(2, math.ceil(n.toDouble / target).toInt))
        }.toMap
        val hotIds = hot.map(_._1)
        val members = emb.select(col("vec_id"), col("v"))
          .join(cur.assign.filter(col("cluster").isin(hotIds: _*)), "vec_id")
          .select(col("vec_id"), col("v"), col("cluster"))
          .as[(Long, Array[Double], Int)].cache()
        try {
          // per-hot-cell hash-spread seeds (the fitTwoLevel child
          // convention): one window over the hot slice, never a sort
          val maxK = kSub.values.max
          val seeds = members.toDF("vec_id", "v", "cluster")
            .withColumn("rk", row_number().over(
              Window.partitionBy("cluster")
                .orderBy(xxhash64(col("vec_id")), col("vec_id"))))
            .filter(col("rk") <= maxK)
            .select(col("cluster"), (col("rk") - 1).cast("int").as("sub"), col("v"))
            .as[(Int, Int, Array[Double])].collect() // ≤ hot·maxK rows
            .filter { case (c, s, _) => s < kSub(c) }
          val seedsByCell = seeds.groupBy(_._1)
          var children: Map[Int, Array[Array[Double]]] = kSub.map {
            case (c, ks) =>
              // a hot cell has > cap ≥ target members, so ks real
              // seeds always exist — the pad arm is only the guard
              val got = seedsByCell.getOrElse(c, Array.empty).sortBy(_._2).map(_._3)
              c -> (got ++ Array.fill(ks - got.length)(cur.centroids(c)))
          }
          def assignSub(cs: Map[Int, Array[Array[Double]]]) = {
            val bc = spark.sparkContext.broadcast(cs)
            members.map { case (id, v, c) =>
              (id, c, nearestIndex(v, bc.value(c)), v)
            }
          }
          for (_ <- 0 until iters) {
            val sums = assignSub(children).toDF("vec_id", "cell", "sub", "v")
              .select(col("cell"), col("sub"), posexplode(col("v")).as(Seq("dim", "x")))
              .groupBy("cell", "sub", "dim")
              .agg(sum("x").as("sx"), count(lit(1)).as("n"))
              .collect() // ≤ Σ kSub · dim rows only
            val byCS = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
            children = children.map { case (c, cs0) =>
              c -> Array.tabulate(cs0.length) { s =>
                byCS.get((c, s)) match {
                  case Some(rows) =>
                    rows.sortBy(_.getInt(2)).map(r => r.getDouble(3) / r.getLong(4))
                  case None => cs0(s) // empty child keeps its seed
                }
              }
            }
          }
          // FINAL sub-assignment, materialized ONCE (it feeds both the
          // child-count pass and the flat-id mapping — the
          // twice-consumed-subtree convention): narrow (id, cell, sub)
          // rows, pinned executor-side.
          val subAssign = {
            val bcModel = spark.sparkContext.broadcast(children)
            members.map { case (id, v, c) =>
              (id, c, nearestIndex(v, bcModel.value(c)))
            }.toDF("vec_id", "cell", "sub").pinned
          }
          // member counts per child: MEMBERLESS children are pruned
          // BEFORE any flat id is allocated (r15 ADVICE — un-pruned
          // clone centroids of a duplicate-heavy cell would silently
          // break the cap accounting AND tie with the real cell in
          // probeCells' sqDist ranking, filling probe slots with
          // cells whose partitions scan nothing while genuinely-near
          // cells wait outside the nProbe budget).
          val childCounts = subAssign.groupBy("cell", "sub").count()
            .as[(Int, Int, Long)].collect() // ≤ Σ kSub rows
          val liveSubs: Map[Int, Array[Int]] = childCounts.groupBy(_._1)
            .map { case (c, rows) => c -> rows.map(_._2).sorted }
          val maxChild: Map[Int, Long] = childCounts.groupBy(_._1)
            .map { case (c, rows) => c -> rows.map(_._3).max }
          val prevN = hot.toMap
          frozen ++= hotIds.filter(c => maxChild.getOrElse(c, 0L) >= prevN(c))
          // flat-id allocation: the FIRST live sub reuses the parent
          // slot, later live subs append (deterministic: parents in id
          // order, subs in index order)
          var nextId = cur.centroids.length
          val newIds: Map[Int, Map[Int, Int]] = hotIds.map { c =>
            c -> liveSubs(c).zipWithIndex.map { case (s, i) =>
              s -> (if (i == 0) c else { val id = nextId; nextId += 1; id })
            }.toMap
          }.toMap
          val newCentroids = new Array[Array[Double]](nextId)
          cur.centroids.copyToArray(newCentroids)
          hotIds.foreach { c =>
            newIds(c).foreach { case (s, id) => newCentroids(id) = children(c)(s) }
          }
          val newChildren =
            if (cur.children == null) null
            else {
              val groupOf = cur.children.zipWithIndex.flatMap {
                case (cs, g) => cs.map(_ -> g)
              }.toMap
              val grown = cur.children.map(
                scala.collection.mutable.ArrayBuffer.from(_))
              hotIds.foreach { c =>
                newIds(c).values.filter(_ != c).toArray.sorted
                  .foreach(grown(groupOf(c)) += _)
              }
              grown.map(_.toArray)
            }
          val bcIds = spark.sparkContext.broadcast(newIds)
          val reassigned = subAssign.as[(Long, Int, Int)]
            .map { case (id, c, s) => (id, bcIds.value(c)(s)) }
            .toDF("vec_id", "cluster")
          // pin each round's assignment so rounds don't stack lazy
          // union/typed-map lineage over the scoped caches (the
          // fitTwoLevel convention)
          val newAssign = cur.assign
            .filter(!col("cluster").isin(hotIds: _*))
            .unionAll(reassigned)
            .pinned
          cur = CellModel(newAssign, newCentroids, cur.coarse, newChildren,
            cur.baseK2)
        } finally members.unpersist()
      }
      round += 1
    }
    // Surface the residual (maintenance-path only — a clean split
    // never pays this action): the cap is BEST-EFFORT, bounded by
    // SplitMaxRounds and Lloyd's separability, so operators leaning
    // on the indexHealth rebuild-with-split lever must know when the
    // dial stayed tripped.
    if (!stable || frozen.nonEmpty) {
      val resid = cur.assign.groupBy("cluster")
        .agg(count(lit(1)).as("n")).filter(col("n") > cap)
        .as[(Int, Long)].collect()
      if (resid.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"splitOversized: ${resid.length} cell(s) still above cap=$cap " +
          s"after $round round(s) (max members ${resid.map(_._2).max}; " +
          s"${frozen.size} frozen as unsplittable, e.g. exact-duplicate " +
          "mass) — probe cost in those cells is bounded by their size, " +
          "not the cap")
    }
    cur
  }

  /** e02 query entry (*rows-only*; KMeansSpec asserts convergence). */
  def e02Kmeans(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (assign, _, _) = fit(spark, e, k = 8, iters = 5, trackInertia = false)
    assign.orderBy("vec_id")
  }

  /** Simplified (centroid-based) SILHOUETTE per cluster — the
    * clustering-quality diagnostic that says whether e02's k was
    * sane before e03/d15 build curation decisions on the clusters:
    * s(x) = (b − a) / max(a, b) with a = |x − c_own| and b = min
    * over OTHER centroids |x − c_k| (the O(n·k) centroid form MLlib's
    * ClusteringEvaluator also uses — the classic O(n²) pairwise form
    * is the exact anchor this approximates, intractable at 100 TB by
    * design, not implementation). One narrow map over broadcast
    * centroids + one k-keyed agg; nothing corpus-sized collected. */
  def silhouette(spark: SparkSession, assigned: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    require(centroids.length >= 2, "silhouette needs k >= 2")
    val bc = spark.sparkContext.broadcast(centroids)
    assigned.select(col("vec_id"), col("cluster").cast("int"), col("v"))
      .as[(Long, Int, Array[Double])]
      .map { case (_, own, v) =>
        val cs = bc.value
        var a = 0.0; var b = Double.MaxValue
        var i = 0
        while (i < cs.length) {
          val c = cs(i)
          var d = 0.0; var j = 0
          while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
          val dist = math.sqrt(d)
          if (i == own) a = dist else if (dist < b) b = dist
          i += 1
        }
        val s = if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
        (own, s)
      }
      .toDF("cluster", "s")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), round(avg("s"), 6).as("mean_s"))
      .orderBy("cluster")
  }

  /** e04 entry (*rows-only*; KMeansSpec: planted separated clusters
    * score near 1, exact two-point case, overlap scores lower). */
  def e04Silhouette(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (assign, centroids, _) = fit(spark, e, k = 8, iters = 5, trackInertia = false)
    silhouette(spark, assign.join(e, "vec_id"), centroids)
  }

  val SampleClusters = 8
  val ClusterQuota = 40

  /** e03: CLUSTER-BALANCED diversity sampling — the SemDeDup-family
    * curation step: cluster the embedding space, then keep a
    * deterministic per-cluster QUOTA (not a per-cluster rate — a
    * uniform rate per cluster is just a global uniform sample).
    * Dense regions downsample hard, sparse regions keep everything
    * ≤ quota, so every region of embedding space stays represented
    * regardless of corpus skew.
    *
    * Selection within a cluster orders by the md5 nibble-hash of the
    * id (t10's engine-reproducible coin) and takes the first `quota`
    * — a per-cluster window whose state is bounded by the quota
    * after the rank filter; the shuffle is keyed by cluster (k
    * partitions of work, each independent). *rows-only*: k-means is
    * not SQL-expressible; KMeansSpec pins quota/determinism/balance. */
  def e03ClusterSample(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (assign, _, _) = fit(spark, e, k = SampleClusters, iters = 3, trackInertia = false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster")
      .orderBy(col("coin"), col("vec_id"))
    assign
      .withColumn("coin", md5(col("vec_id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ClusterQuota)
      .select("vec_id", "cluster")
      .orderBy("vec_id")
  }
}
