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
    spark.stop()
  }
}
