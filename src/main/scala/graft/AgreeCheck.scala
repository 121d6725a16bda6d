package graft
// Temporary measurement harness (the ProfVec convention, not library
// surface): prediction agreement between e01c's shipped scalar-coded
// rerank cut and the full-pool exact rerank baseline at a given
// corpus decade — the number VERDICT r13 #1 asked the pool lever to
// carry. Usage: runMain graft.AgreeCheck <dir>
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.ExtendedQueries

object AgreeCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_vec200k")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
    // second arg "shuffle" times the coded cut's co-partitioned
    // id-join route (broadcastMaxBytes = 0 — the r15 route's
    // crossover measurement); default times the broadcast route.
    val bcMax = if (args.lift(1).contains("shuffle")) 0L
                else ExtendedQueries.SqCutBroadcastMaxBytes
    def preds(sqCut: Boolean) = {
      val t0 = System.nanoTime()
      val p = ExtendedQueries.knnClassifyCellBlocked(spark, e,
          sqRerank = sqCut, sqCutMin = 0L, sqCutBroadcastMax = bcMax)
        .select(col("vec_id"), col("pred_label"))
      val out = p.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      System.err.println(f"[agree] sqCut=$sqCut bcMax=$bcMax: ${out.size} predictions in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      out
    }
    val cut = preds(sqCut = true)
    val full = preds(sqCut = false)
    require(cut.keySet == full.keySet, "coverage differs between the two forms")
    val agree = full.count { case (id, p) => cut(id) == p }.toDouble / full.size
    println(f"[agree] dir=$dir n=${full.size} cut-vs-full agreement = $agree%.4f")
    spark.stop()
  }
}
