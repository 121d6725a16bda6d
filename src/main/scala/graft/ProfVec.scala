package graft
// Temporary phase-timing harness for the vector-decade measurements
// (not library surface): breaks v15/e01c's wall-clock into fit /
// probe / score / pool phases so a super-linear decade is adjudicated
// from MEASURED phases, not guesses. Usage: runMain graft.ProfVec <dir>
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{KMeans, VectorQueries}

object ProfVec {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[profvec] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_vec200k")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
      .withColumn("nv", normNative(col("v")))
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    val n = t("corpus count+cache")(e.count())
    val nCells = math.max(8, (n / VectorQueries.V15CellTarget).toInt)
    System.err.println(s"[profvec] n=$n nCells=$nCells")
    val (assigned, centroids, coarse) = t("fitTwoLevel") {
      val r = KMeans.fitTwoLevel(spark, e.select(col("vec_id"), col("v")), nCells, 2)
      r._1.count(); r
    }
    val probes = t("probeCells (coarse-first, label-0 queries)") {
      val p = KMeans.probeCells(spark,
        e.filter(col("label") === 0).select(col("vec_id"), col("v")),
        centroids, coarse, VectorQueries.V15Probe,
        graft.operators.ExtendedQueries.E01cCoarseProbe,
        // fresh fitTwoLevel layout — the uniform index IS its children
        KMeans.uniformChildren(centroids.length, coarse))
        .withColumnRenamed("qid", "query_id")
        .localCheckpoint(true)
      p.count(); p
    }
    val corpusCells = e.select(col("vec_id"), col("v"), col("nv"))
      .join(assigned, "vec_id")
    val scored = probes
      .join(e.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nv").as("nq")), "query_id")
      .join(corpusCells, "cluster")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        cosinePreRaw(col("v"), col("qv"), col("nv"), col("nq")).as("rawcos"),
        col("vec_id"))
    val nPairs = t("scored pair stream (joins + exact cosine)")(scored.count())
    System.err.println(s"[profvec] pairs=$nPairs")
    val poolParts = VectorQueries.poolAggPartitions(
      spark, probes.select("query_id").distinct().count(),
      VectorQueries.V15PoolQidsPerPartition)
    t("pool agg (repartition + TopKAgg + explode)") {
      scored.repartition(poolParts, col("query_id"))
        .groupBy("query_id")
        .agg(org.apache.spark.sql.graft.TopKAgg.topK(col("rawcos"), col("vec_id"), 11).as("top"))
        .select(col("query_id"), explode(col("top")).as("t"))
        .count()
    }
    spark.stop()
  }
}
