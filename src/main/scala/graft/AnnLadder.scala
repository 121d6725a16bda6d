package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.toDouble
import graft.operators.{Bq, IvfPq, Pq, Sq, VectorQueries}

/** The ANN LADDER in one measured table — recall@10 vs the per-vector
  * bytes the candidate pass streams, for every strategy the engine
  * ships, on the same corpus and query (the lshSweep convention:
  * measured numbers, not asserted ones; SURVEY quotes the output).
  *
  * "cand bytes/vec" is what the SCORING pass reads per corpus vector
  * before the exact re-rank: the memory-bandwidth lever that decides
  * which rung a 100 TB deployment can keep resident.
  *
  * Usage: runMain graft.AnnLadder [sfDir]
  */
object AnnLadder {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      // TypedImperativeAggregate (TopKAgg/sketches) keys per partition
      // before sort-based fallback: the 128-row default externally sorts
      // every large pool stage (the measured 2M-decade spill)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v")).cache()
    val n = e.count()
    val dim = e.select(size(col("v"))).head().getInt(0)
    val brute = VectorQueries.v01KnnFacts(spark, dir)
      .collect().map(_.getLong(0)).toSet

    def recall(ids: Seq[Long]): Double =
      brute.intersect(ids.toSet).size.toDouble / brute.size

    // (name, per-vector bytes the candidate pass streams, top-10 ids)
    val rungs: Seq[(String, String, Seq[Long])] = Seq(
      ("v01 brute", s"${8 * dim} (full f64)",
        brute.toSeq),
      ("v05 LSH", s"${8 * dim} on candidate sliver",
        VectorQueries.v05AnnLsh(spark, dir).collect().map(_.getLong(0)).toSeq),
      ("v07 IVF", s"${8 * dim} in probed cells",
        VectorQueries.v07AnnIvf(spark, dir).collect().map(_.getLong(0)).toSeq),
      ("v09 PQ", s"${Pq.M} codes + 8 norm",
        Pq.v09AnnPq(spark, dir).collect().map(_.getLong(0)).toSeq),
      ("v10 IVFADC", s"${Pq.M} codes + 8 norm, probed cells",
        IvfPq.v10AnnIvfPq(spark, dir).collect().map(_.getLong(0)).toSeq),
      ("v13 SQ8", s"$dim codes + 8 norm",
        Sq.v13AnnSq(spark, dir).collect().map(_.getLong(0)).toSeq),
      ("v14 BQ", "8 sig + 8 norm",
        Bq.v14AnnBinary(spark, dir).collect().map(_.getLong(0)).toSeq))

    println(f"[ladder] corpus n=$n dim=$dim query=0 k=10")
    println(f"[ladder] ${"strategy"}%-12s ${"cand bytes/vec"}%-34s recall@10")
    rungs.foreach { case (name, bytes, ids) =>
      println(f"[ladder] $name%-12s $bytes%-34s ${recall(ids)}%.2f")
    }

    // POOL SWEEP (LADDER_POOLSWEEP=1): the rerank-pool/recall curve
    // for the three code rungs most exposed to rank noise — the
    // measured basis for Pq.PoolDensity (the shipped dial) and for
    // the capacity-planner trade the scaladocs document: pool is the
    // recall lever, the exact re-rank pays pool×dim per query.
    if (sys.env.get("LADDER_POOLSWEEP").contains("1")) {
      println(f"[ladder] pool sweep (rerank floor multiplier -> effective pool = max(r*k, n/${Pq.PoolDensity}))")
      for (r <- Seq(8, 32, 128, 512)) {
        val pool = Pq.scaledPool(n, 10, r)
        val pq = recall(Pq.annPq(spark, e, 0L, 10, rerank = r)
          .collect().map(_.getLong(0)).toSeq)
        val adc = recall(IvfPq.annIvfPq(spark, e, 0L, 10, rerank = r)
          .collect().map(_.getLong(0)).toSeq)
        val bq = recall(Bq.annBq(spark, e, 0L, 10, rerank = r)
          .collect().map(_.getLong(0)).toSeq)
        println(f"[ladder] pool sweep: rerank=$r%-4d pool=$pool%-7d PQ $pq%.2f  IVFADC $adc%.2f  BQ $bq%.2f")
      }
    }

    // FILTERED (hybrid) serving forms (r11): the same top-10 under a
    // candidate predicate (vec_id % 3 == 0 standing in for the
    // entity semi-join), through the three shapes a deployment
    // chooses between — brute filtered scan, IVF-filtered probe,
    // IVFADC-filtered code probe. Measured vs the exact filtered
    // ranking; all-probe rows are printed as equality, default-probe
    // as recall.
    import graft.store.VectorIndex
    import graft.functions.VectorFunctions.cosineNative6
    val qv = e.filter(col("vec_id") === 0).select("v").head().getSeq[Double](0).toArray
    val qCol = array(qv.toIndexedSeq.map(lit): _*)
    val cand = e.select("vec_id").filter(col("vec_id") % 3 === 0 && col("vec_id") =!= 0)
    val nCand = cand.count().toInt
    val bruteF = e.join(cand, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), cosineNative6(col("v"), qCol).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    def recallF(ids: Seq[Long]): Double =
      bruteF.toSet.intersect(ids.toSet).size.toDouble / bruteF.size
    val ivfDir = java.nio.file.Files.createTempDirectory("ladder_ivf").toString
    VectorIndex.buildIvf(spark, e, ivfDir)
    val adcDir = java.nio.file.Files.createTempDirectory("ladder_adc").toString
    VectorIndex.buildIvfPq(spark, e, adcDir)
    val filteredRungs: Seq[(String, String, Seq[Long])] = Seq(
      ("scan", s"${8 * dim} every vector (the v03/v04 shape)", bruteF),
      ("IVF all-probe", s"${8 * dim} in probed cells & filter",
        VectorIndex.annIvfFiltered(spark, ivfDir, qv, 10,
          VectorQueries.IvfCells, cand).collect().map(_.getLong(0)).toSeq),
      ("IVF probe=4", s"${8 * dim} in 4/16 cells & filter",
        VectorIndex.annIvfFiltered(spark, ivfDir, qv, 10,
          VectorQueries.IvfProbe, cand).collect().map(_.getLong(0)).toSeq),
      ("ADC all-probe", s"${Pq.M} codes + 8 norm & filter, covering pool",
        VectorIndex.annIvfPqFiltered(spark, adcDir, e, qv, 10,
          IvfPq.Cells, cand, rerank = nCand).collect().map(_.getLong(0)).toSeq),
      ("ADC probe=4", s"${Pq.M} codes + 8 norm in 4/16 cells & filter",
        VectorIndex.annIvfPqFiltered(spark, adcDir, e, qv, 10,
          IvfPq.Probe, cand).collect().map(_.getLong(0)).toSeq))
    println(f"[ladder] filtered query: |candidates|=$nCand of $n")
    filteredRungs.foreach { case (name, bytes, ids) =>
      val eq = if (ids == bruteF) " (== exact)" else ""
      println(f"[ladder] $name%-14s $bytes%-44s ${recallF(ids)}%.2f$eq")
    }

    // TWO-LEVEL coarse quantizer (r12): the flat build's scale wall
    // is the n × nCells assignment; fitTwoLevel pays k1 + k2 ≈
    // 2√nCells per vector. Build wall-clock measured at growing
    // nCells on the same corpus, with the quantization-error premium
    // (two-level inertia / flat inertia) beside it — the trade a
    // 10⁹-vector deployment is buying.
    {
      import graft.operators.KMeans
      import spark.implicits._
      def inertiaOf(assigned: org.apache.spark.sql.DataFrame,
          cs: Array[Array[Double]]): Double = {
        val bc = spark.sparkContext.broadcast(cs)
        e.join(assigned, "vec_id").select(col("cluster").cast("int"), col("v"))
          .as[(Int, Array[Double])]
          .map { case (cell, v) =>
            val c = bc.value(cell)
            var d = 0.0; var j = 0
            while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
            d
          }.reduce(_ + _)
      }
      println(f"[ladder] two-level build: ${"nCells"}%-7s ${"flat s"}%-8s ${"two s"}%-8s ${"dist/vec flat"}%-14s ${"dist/vec two"}%-13s inertia ratio")
      // the 1024-cell point only makes sense on corpora big enough to
      // populate the cells (and the flat side is the expensive one).
      // LADDER_SWEEP=two skips the flat fits (the 2M decade: a flat
      // 256-cell fit was already 572 s at 200k — measuring it once
      // more a decade up would be hours spent re-proving the known
      // wall); LADDER_SWEEP=none skips the sweep entirely.
      val sweepMode = sys.env.getOrElse("LADDER_SWEEP", "full")
      val cellsSweep =
        if (sweepMode == "none") Seq.empty[Int]
        else if (n >= 10000) Seq(64, 256, 1024)
        else Seq(64, 256)
      for (nCells <- cellsSweep) {
        val (tFlat, flatInertia) =
          if (sweepMode == "two") (Double.NaN, Double.NaN)
          else {
            val t0 = System.nanoTime()
            val (fa, fc, _) = KMeans.fit(spark, e, nCells, 2, trackInertia = false)
            fa.count()
            ((System.nanoTime() - t0) / 1e9, inertiaOf(fa, fc))
          }
        val t1 = System.nanoTime()
        val (ta, tc, _) = KMeans.fitTwoLevel(spark, e, nCells, 2)
        val tTwo = (System.nanoTime() - t1) / 1e9 // checkpointed: materialized
        val k1 = math.max(2, math.ceil(math.sqrt(nCells.toDouble)).toInt)
        val k2 = math.max(1, math.ceil(nCells.toDouble / k1).toInt)
        val ratio = inertiaOf(ta, tc) / flatInertia
        println(f"[ladder] two-level build: $nCells%-7d $tFlat%-8.1f $tTwo%-8.1f ${nCells}%-14d ${k1 + k2}%-13d $ratio%.3f")
      }
    }
    spark.stop()
  }
}
