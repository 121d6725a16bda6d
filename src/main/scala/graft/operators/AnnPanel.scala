package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QUERY-PANEL recall measurement for the ANN ladder (VERDICT r13
  * #2): every §8k routing decision previously rested on recall@10 of
  * a SINGLE query (query 0, 0.1 granularity, n=1) — the repo's own
  * documented seed-query-bias trap (v07's "0.9 recall" was an
  * artifact of the query being k-means seed 0). This is the shared
  * core behind the AnnLadder harness and the
  * VectorIndex.recommendRung capacity-planner API: a ≥16-query
  * hash-spread panel, exact truth in ONE corpus pass, and per-rung
  * MEAN and MIN recall@k.
  *
  * Panel-selection bias note (the trap, avoided by construction):
  * model seeding across the engine is "smallest xxhash64(vec_id)"
  * (KMeans.fit, Pq.train) — so a panel drawn from the SAME ordering
  * would consist of exactly the k-means/codebook seed vectors, each
  * sitting at its own cell's center, and recall would read
  * optimistically for every cell-pruned rung. The panel therefore
  * orders by a SALTED stream, xxhash64("panel", vec_id): still
  * deterministic and storage-order-free, but independent of the
  * seeding order (overlap with the seed set is the 16/n chance
  * rate).
  *
  * Each rung is BUILT ONCE over the cached corpus and queried once
  * per panel member through the same shared kernels the entries use
  * (adcTopK/sqTopK/bqTopK/adcCellTopK and the annLsh/IVF probe
  * shapes), so the panel measures serving behavior, not a parallel
  * reimplementation.
  */
object AnnPanel {

  val PanelSize = 16

  /** One rung's panel result. `bytes` is the resident candidate-pass
    * table per vector (the ladder's capacity lever); `perQuery` the
    * raw recalls for anyone re-deriving the summary. */
  final case class RungRecall(name: String, bytes: String,
      bytesPerVec: Int, mean: Double, min: Double, perQuery: Seq[Double])

  /** The hash-spread, seeding-independent query panel: (vec_id, v)
    * of the `panelN` smallest xxhash64("panel", vec_id). */
  def panelQueries(spark: SparkSession, e: DataFrame,
      panelN: Int = PanelSize): Array[(Long, Array[Double])] = {
    import spark.implicits._
    e.select(col("vec_id"), col("v"))
      .orderBy(xxhash64(lit("panel"), col("vec_id")), col("vec_id"))
      .limit(panelN)
      .as[(Long, Array[Double])].collect()
  }

  /** Exact top-k per panel query in ONE streaming corpus pass
    * (VectorQueries.bruteTopK — per-partition bounded buffers, no
    * all-pairs join). */
  def bruteTruth(spark: SparkSession, e: DataFrame,
      panel: Array[(Long, Array[Double])], k: Int): Map[Long, Set[Long]] =
    VectorQueries.bruteTopK(spark, e.withColumn("label", lit(0)), panel, k)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def summarize(name: String, bytes: String, bytesPerVec: Int,
      truth: Map[Long, Set[Long]],
      got: Map[Long, Seq[Long]]): RungRecall = {
    val per = truth.toSeq.sortBy(_._1).map { case (q, t) =>
      t.intersect(got.getOrElse(q, Seq.empty).toSet).size.toDouble / t.size
    }
    RungRecall(name, bytes, bytesPerVec, per.sum / per.size, per.min, per)
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  /** Measure the full ladder on a panel — each rung built once,
    * queried per panel member. `rerank` overrides the coded rungs'
    * pool-floor multiplier (the pool-sweep dial); `includeScan`
    * controls the brute/LSH/IVF full-vector rungs (recommendRung
    * skips LSH — it is a one-shot operator with no persisted
    * artifact to recommend). */
  def measureRungs(spark: SparkSession, e: DataFrame,
      panel: Array[(Long, Array[Double])], truth: Map[Long, Set[Long]],
      k: Int, dim: Int, n: Long,
      only: Set[String] = Set.empty,
      rerankPq: Int = Pq.Rerank, rerankSq: Int = Sq.Rerank,
      rerankBq: Int = Bq.Rerank, rerankAdc: Int = Pq.Rerank): Seq[RungRecall] = {
    require(panel.nonEmpty && truth.nonEmpty,
      s"measureRungs needs a non-empty panel with truth (panel=${panel.length}, " +
      s"truth=${truth.size}) — a 1-vector corpus has no non-self neighbours")
    def want(tag: String) = only.isEmpty || only(tag)
    val fullBytes = 8 * dim + 8
    val out = scala.collection.mutable.ListBuffer.empty[RungRecall]

    // LADDER_SKIP (comma list of rung tags, e.g. "lsh"): an EXPLICIT
    // skip dial for rungs whose measurement cost stops being
    // informative at a decade — at 2M the fixed-dial LSH candidate
    // pass dedups ~1M candidates PER PANEL QUERY (n·tables/2^bits is
    // a scale-invariant ~50% of the corpus on near-random data:
    // near-brute recall at near-brute cost, the regime v08's guard
    // refuses for the batch form). Never silent: the skip is an env
    // the runner sets, this line says what was dropped and why, and
    // the table's absent row shows it.
    val envSkip = sys.env.get("LADDER_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // the v05 guard (VERDICT r14 #7) now REFUSES the regime the
    // ladder used to need LADDER_SKIP for — report the refusal as
    // the rung's result instead of dying mid-ladder
    val lshRefused =
      n / (1L << VectorQueries.LshBits) > VectorQueries.V05MaxBucketOccupancy
    if (want("lsh") && lshRefused)
      System.err.println(s"[panel] LSH rung refused by the v05 occupancy " +
        s"guard at n=$n (occupancy ${n / (1L << VectorQueries.LshBits)} > " +
        s"${VectorQueries.V05MaxBucketOccupancy}) — the rung fails fast " +
        "naming v07/v13; the scale rungs are IVF/v15")
    if (want("lsh") && !lshRefused && envSkip("lsh"))
      System.err.println(s"[panel] LSH rung skipped by LADDER_SKIP at n=$n: " +
        s"~${n * VectorQueries.LshTables / (1L << VectorQueries.LshBits)} candidates/query " +
        "— near-brute cost on this corpus; the scale rungs are IVF/v15")
    if (want("lsh") && !lshRefused && !envSkip("lsh"))
      out += summarize("v05 LSH", s"${8 * dim} on candidate sliver", fullBytes,
        truth, panel.map { case (qid, _) =>
          qid -> ids(VectorQueries.annLsh(e, qid, k))
        }.toMap)

    // IVF: ONE fit, per-query probe + partition-filtered cosine scan
    // (the v07/annIvf shape with the model shared across the panel).
    if (want("ivf")) locally {
      val (assigned, centroids, _) = KMeans.fit(spark, e,
        VectorQueries.IvfCells, 2, trackInertia = false)
      // cached: 16 panel queries would otherwise each re-run the
      // assignment map + corpus join (the r14 review finding; the
      // coded rungs already cache their enc the same way)
      val withCell = e.join(assigned, "vec_id").cache()
      try {
      val got = panel.map { case (qid, qv) =>
        val cells = centroids.zipWithIndex.map { case (c, i) =>
          var d = 0.0; var j = 0
          while (j < c.length) { val t = qv(j) - c(j); d += t * t; j += 1 }
          (d, i)
        }.sortBy(_._1).take(VectorQueries.IvfProbe).map(_._2)
        val qCol = array(qv.toIndexedSeq.map(lit): _*)
        qid -> ids(withCell
          .filter(col("cluster").isin(cells.toIndexedSeq: _*))
          .filter(col("vec_id") =!= qid)
          .select(col("vec_id"),
            graft.functions.VectorFunctions.cosineNative6(col("v"), qCol).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(k))
      }.toMap
      out += summarize(
        s"v07 IVF", s"${8 * dim} in probed cells", fullBytes, truth, got)
      } finally withCell.unpersist()
    }

    // PQ: one train+encode, per-query ADC through the shared kernel.
    if (want("pq")) locally {
      val cb = Pq.train(spark, e)
      val enc = Pq.encode(spark, e, cb).cache()
      try {
        enc.count()
        val got = panel.map { case (qid, _) =>
          qid -> ids(Pq.adcTopK(spark, enc, cb, e, qid, k, rerankPq, Some(n)))
        }.toMap
        out += summarize("v09 PQ", s"${Pq.M} codes + 8 norm", Pq.M + 8, truth, got)
      } finally enc.unpersist()
    }

    // IVFADC: one coarse fit + residual train/encode, per-query
    // cell-probed ADC through the shared kernel.
    if (want("adc")) locally {
      val (_, centroids, _) =
        KMeans.fit(spark, e, IvfPq.Cells, 2, trackInertia = false)
      val res = IvfPq.assignResiduals(spark, e, centroids).cache()
      try {
        val cb = Pq.train(spark, res)
        val enc = IvfPq.encodeResiduals(spark, res, cb).cache()
        try {
          enc.count()
          val got = panel.map { case (qid, qv) =>
            qid -> ids(IvfPq.adcCellTopK(spark, enc, cb, centroids, e, qv,
              Some(qid), k, IvfPq.Probe, rerankAdc))
          }.toMap
          out += summarize("v10 IVFADC",
            s"${Pq.M} codes + 8 norm, probed cells", Pq.M + 8, truth, got)
        } finally enc.unpersist()
      } finally res.unpersist()
    }

    // SQ8: one train+encode, per-query byte-weighted scoring.
    if (want("sq")) locally {
      val (mins, maxs) = Sq.train(spark, e)
      val enc = Sq.encode(spark, e, mins, maxs).cache()
      try {
        enc.count()
        val got = panel.map { case (qid, _) =>
          qid -> ids(Sq.sqTopK(spark, enc, mins, maxs, e, qid, k, rerankSq, Some(n)))
        }.toMap
        out += summarize("v13 SQ8", s"$dim codes + 8 norm", dim + 8, truth, got)
      } finally enc.unpersist()
    }

    // BQ: one train+encode, per-query xor+popcount pool.
    if (want("bq")) locally {
      val means = Bq.train(spark, e)
      val enc = Bq.encode(spark, e, means).cache()
      try {
        enc.count()
        val got = panel.map { case (qid, _) =>
          qid -> ids(Bq.bqTopK(spark, enc, means, e, qid, k, rerankBq, Some(n)))
        }.toMap
        out += summarize("v14 BQ", "8 sig + 8 norm", 16, truth, got)
      } finally enc.unpersist()
    }

    out.toSeq
  }
}
