package graft
// Temporary phase decomposition of e01c (r18): times the model fits,
// the pool stage and the rerank/vote tail separately (warm second
// pass) so the job-latency budget is attributable.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfE01c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions._
    import graft.operators.{Bq, ExtendedQueries, KMeans}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profe01c] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      val e = graft.plans.Par.ensureParallelism(
          graft.sources.Tables.embeddings(spark, dir)
            .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
            .withColumn("nv", normNative(col("v"))))
        .cache()
      val n = time("e count (cache fill)") { e.count() }
      val nCells = math.max(8, (n / ExtendedQueries.E01cCellTarget).toInt)
      val model = time("fitCells") {
        KMeans.fitCells(spark, e.select(col("vec_id"), col("v")), nCells, 2,
          ExtendedQueries.E01cTwoLevelCells, ExtendedQueries.E01cCellCap,
          ExtendedQueries.E01cCellTarget)
      }
      val means = time("Bq.train") { Bq.train(spark, e) }
      val assigned = model.assign
      val encLazy = Bq.encode(spark, e, means).join(assigned, "vec_id")
      val probes = KMeans.probeCells(spark,
        e.select(col("vec_id"), col("v")), model.centroids, model.coarse,
        ExtendedQueries.E01cProbe, ExtendedQueries.E01cCoarseProbe,
        model.children)
      val poolParts = graft.operators.VectorQueries.poolAggPartitions(
        spark, n, graft.operators.VectorQueries.E01cPoolQidsPerPartition)
      val pairs = probes
        .join(encLazy.select(col("vec_id").as("qid"), col("sig").as("qsig")), "qid")
        .join(encLazy.select(col("cluster"), col("vec_id"), col("sig")), "cluster")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          bit_count(col("sig").bitwiseXOR(col("qsig"))).cast("double").as("ham"))
      val pool = pairs
        .repartition(poolParts, col("qid"))
        .groupBy("qid")
        .agg(org.apache.spark.sql.graft.TopKAgg.topK(-col("ham"), col("vec_id"),
          ExtendedQueries.E01bPool).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.vec_id").as("vec_id"))
      time("pairs+pool (noop)") {
        pool.write.format("noop").mode("overwrite").save()
      }
      time("FULL e01c entry") {
        graft.SparkEntry.queries("e01c_knn_classify_ivfbq")(spark, dir).count()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
