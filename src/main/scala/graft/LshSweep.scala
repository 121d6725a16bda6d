package graft
// Diagnostic harness (not library surface): prints the LSH dial sweep
// table for EXPLAIN_r{N}.md — candidate volume vs recall per
// (tables, bits), so a user can tune d06/e01b-style cell blocking on
// a corpus sample before the full job.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{DedupQueries, VectorQueries}

object LshSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_LSH_T",
      DedupQueries.CosineThreshold.toString).toDouble
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // TypedImperativeAggregate (TopKAgg/sketches) keys per partition
      // before sort-based fallback: the 128-row default externally sorts
      // every large pool stage (the measured 2M-decade spill)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val n = e.count()
    val possible = n * (n - 1) / 2
    val grid = Seq((4, 4), (8, 4), (16, 4), (32, 4),
      (4, 8), (8, 8), (4, 12), (8, 12), (2, 16), (4, 16))
    println(s"LSH sweep: $dir n=$n pairs=$possible threshold=$threshold")
    println("| tables | bits | candidates | cand % of pairs | pairs found | recall |")
    println("|---|---|---|---|---|---|")
    VectorQueries.lshSweep(spark, e, threshold, grid).foreach {
      case (t, b, cand, found, recall) =>
        println(f"| $t | $b | $cand | ${100.0 * cand / possible}%.2f%% | $found | $recall%.3f |")
    }
    spark.stop()
  }
}
