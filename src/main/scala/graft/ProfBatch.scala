package graft
// A/B harness for the PERSISTED batch k-NN rung (VERDICT r15 #1, the
// ProfCap convention — not library surface): builds the IVF artifact
// once (timed), then times VectorIndex.annIvfBatch against the
// in-entry v15 (which refits per call), so the no-refit saving is
// MEASURED per decade instead of argued. Also reports pair agreement
// between the two forms (they share one kernel; the model differs
// only if the build dials do). Usage:
//   runMain graft.ProfBatch <corpusDir> [k] [reprobeMax] [idxDir]
// An existing idxDir is REUSED (the serving premise: build once,
// query many) — delete it to re-measure the build.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.VectorQueries
import graft.store.VectorIndex

object ProfBatch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[profbatch] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_vec2m")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    val reprobe = args.lift(2).map(_.toInt).getOrElse(VectorQueries.V15ReprobeMax)
    val idxDir = args.lift(3).getOrElse(dir.stripSuffix("/") + "_ivfidx")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
    val n = e.count()
    val nCells = math.max(8, (n / VectorQueries.V15CellTarget).toInt)
    System.err.println(s"[profbatch] n=$n nCells=$nCells reprobe=$reprobe idx=$idxDir")
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$idxDir/ivf_vectors"))) {
      t("build (buildIvf + buildCellBounds, v15 dials incl. two-level routing)") {
        VectorIndex.buildIvf(spark,
          e.withColumn("nv", normNative(col("v")))
            .repartition(spark.sparkContext.defaultParallelism),
          idxDir, nCells = nCells, iters = 2,
          cellCap = VectorQueries.V15CellCap,
          twoLevelCells = VectorQueries.V15TwoLevelCells)
        VectorIndex.buildCellBounds(spark, idxDir)
      }
    } else System.err.println(s"[profbatch] reusing existing index at $idxDir")
    val queries = e.filter(col("label") === 0).select("vec_id", "v")
    val persisted = t(s"annIvfBatch (persisted, no refit, FULL batch)") {
      val r = VectorIndex.annIvfBatch(spark, idxDir, queries, k,
        reprobeMax = reprobe).select("query_id", "vec_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      System.err.println(s"[profbatch]   rows=${r.size}"); r
    }
    val inMem = t(s"knnBatchIvf (in-entry refit, FULL batch)") {
      val r = VectorQueries.knnBatchIvf(spark, e, k, reprobeMax = reprobe)
        .select("query_id", "vec_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      System.err.println(s"[profbatch]   rows=${r.size}"); r
    }
    val agree = persisted.intersect(inMem).size.toDouble / math.max(1, inMem.size)
    System.err.println(f"[profbatch] pair agreement persisted vs in-entry: $agree%.4f")
    // the SERVING case: a selective batch (1k queries) — the persisted
    // form pays a pruned scan, the in-entry form still pays the fit
    val sel = queries.limit(1000).localCheckpoint(true)
    t(s"annIvfBatch (persisted, SELECTIVE 1k batch)") {
      val n1 = VectorIndex.annIvfBatch(spark, idxDir, sel, k,
        reprobeMax = reprobe).count()
      System.err.println(s"[profbatch]   rows=$n1")
    }
    t(s"knnBatchIvf (in-entry refit, 1k of the label-0 queries)") {
      // in-entry has no query-subset dial — mark all but the 1k as
      // corpus-only, the label contract
      val selIds = sel.select("vec_id").collect().map(_.getLong(0)).toSet
      val bc = spark.sparkContext.broadcast(selIds)
      import spark.implicits._
      val relabeled = e.as[(Long, Array[Double], Int)]
        .map { case (id, v, l) => (id, v, if (bc.value(id)) 0 else 1) }
        .toDF("vec_id", "v", "label")
      val n2 = VectorQueries.knnBatchIvf(spark, relabeled, k,
        reprobeMax = reprobe).count()
      System.err.println(s"[profbatch]   rows=$n2")
    }
    // COMPRESSED rung (r17): annIvfPqBatch over the buildIvfPq
    // artifact — the same regime table one rung down the ladder. The
    // scan streams M ints + one norm per corpus vector instead of the
    // float vectors, so the per-probe BYTES drop ~10× while pool
    // membership goes approximate (recall reported vs the float
    // persisted form; exactness stays confined to the re-rank pool).
    val adcDir = idxDir.stripSuffix("/") + "_adc"
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$adcDir/ivfpq_codes"))) {
      t("build (buildIvfPq, two-level-routed coarse fit)") {
        VectorIndex.buildIvfPq(spark, e.select(col("vec_id"), col("v")),
          adcDir, nCells = nCells,
          twoLevelCells = VectorQueries.V15TwoLevelCells)
      }
    } else System.err.println(s"[profbatch] reusing existing ADC index at $adcDir")
    val adcFull = t("annIvfPqBatch (persisted CODES, FULL batch)") {
      val r = VectorIndex.annIvfPqBatch(spark, adcDir, e, queries, k)
        .select("query_id", "vec_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      System.err.println(s"[profbatch]   rows=${r.size}"); r
    }
    val adcRecall = adcFull.intersect(persisted).size.toDouble /
      math.max(1, persisted.size)
    System.err.println(f"[profbatch] ADC pair recall vs float persisted: $adcRecall%.4f")
    t(s"annIvfPqBatch (persisted CODES, SELECTIVE 1k batch)") {
      val n3 = VectorIndex.annIvfPqBatch(spark, adcDir, e, sel, k).count()
      System.err.println(s"[profbatch]   rows=$n3")
    }
    spark.stop()
  }
}
