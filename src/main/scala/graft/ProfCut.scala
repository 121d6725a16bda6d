package graft
// A/B harness for the coded cut's SIZE-ROUTED attach (VERDICT r15 #4,
// the ProfCap convention — not library surface): times e01c's
// knnClassifyCellBlocked with the broadcast arm (default threshold)
// vs the co-partitioned shuffle arm (threshold forced to 1 byte), so
// the arm that exists to survive > 2 GiB code tables has a measured
// wall at a real decade instead of a row-equality spec at sf0.01.
// Usage: runMain graft.ProfCut <dir> [broadcast|shuffle|both] [cellCap]
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.ExtendedQueries

object ProfCut {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[profcut] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_vec2m")
    val which = args.lift(1).getOrElse("both")
    val cap = args.lift(2).map(_.toInt).getOrElse(ExtendedQueries.E01cCellCap)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
    if (which == "broadcast" || which == "both")
      t(s"e01c broadcast arm (default threshold), cellCap=$cap") {
        val n = ExtendedQueries.knnClassifyCellBlocked(spark, e,
          cellCap = cap).count()
        System.err.println(s"[profcut]   rows=$n")
      }
    if (which == "shuffle" || which == "both")
      t(s"e01c shuffle arm (threshold forced to 1), cellCap=$cap") {
        val n = ExtendedQueries.knnClassifyCellBlocked(spark, e,
          cellCap = cap, sqCutBroadcastMax = 1L).count()
        System.err.println(s"[profcut]   rows=$n")
      }
    spark.stop()
  }
}
