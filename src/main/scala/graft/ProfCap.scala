package graft
// Throwaway-style A/B harness for the cell-size cap (VERDICT r14 #3,
// the ProfVec convention — not library surface): times e01c's
// knnClassifyCellBlocked and v15's knnBatchIvf on a corpus dir at a
// given cellCap, so the split pass's cost is MEASURED per regime
// instead of argued. Usage: runMain graft.ProfCap <dir> <cellCap>
// [e01c|v15|both] [reprobeMax]
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{ExtendedQueries, VectorQueries}

object ProfCap {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[profcap] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_vec2m")
    val cap = args.lift(1).map(_.toInt).getOrElse(ExtendedQueries.E01cCellCap)
    val which = args.lift(2).getOrElse("both")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
    if (which == "e01c" || which == "both")
      t(s"e01c cellCap=$cap") {
        ExtendedQueries.knnClassifyCellBlocked(spark, e, cellCap = cap).count()
      }
    val reprobe = args.lift(3).map(_.toInt).getOrElse(VectorQueries.V15ReprobeMax)
    if (which == "v15" || which == "both")
      t(s"v15 cellCap=$cap reprobe=$reprobe") {
        VectorQueries.knnBatchIvf(spark, e, k = 3, reprobeMax = reprobe,
          cellCap = cap).count()
      }
    spark.stop()
  }
}
