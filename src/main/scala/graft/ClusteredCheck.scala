package graft
// Measurement harness for the CLUSTERED decade (VERDICT r13 #7, the
// ProfVec convention — not library surface): v15 pair recall and
// e01c prediction agreement against PANEL-EXACT ground truth on a
// GenClustered corpus, where the cell-pruning premise (neighbour
// concentration) actually holds. Exact truth at 2M is feasible
// per-PANEL (bruteTopK is one streaming corpus pass for the whole
// panel), never all-pairs. Usage: runMain graft.ClusteredCheck <dir>
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{ExtendedQueries, VectorQueries}

object ClusteredCheck {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[clustered] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_clustered2m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))

    // ---- v15: pair recall on a 64-query label-0 panel (exact truth
    // in one corpus pass; the batch entry answers ALL label-0 queries
    // — the panel samples its output, salted + seeding-independent)
    val qPanel = e.filter(col("label") === 0)
      .select(col("vec_id"), col("v"))
      .orderBy(xxhash64(lit("panel"), col("vec_id")), col("vec_id"))
      .limit(64).as[(Long, Array[Double])].collect()
    val truth3 = t("v15 panel truth (bruteTopK k=3)") {
      VectorQueries.bruteTopK(spark, e, qPanel, 3)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    }
    val v15 = t("v15 knnBatchIvf (all label-0 queries)") {
      VectorQueries.v15KnnBatchIvf(spark, dir)
    }
    val qids = qPanel.map(_._1).toSet
    val v15Panel = v15.filter(col("query_id").isin(qids.toSeq: _*))
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val v15Recalls = truth3.toSeq.map { case (q, t3) =>
      t3.intersect(v15Panel.getOrElse(q, Set.empty)).size.toDouble / t3.size
    }
    println(f"[clustered] v15 pair recall over ${truth3.size} panel queries: " +
      f"mean ${v15Recalls.sum / v15Recalls.size}%.3f min ${v15Recalls.min}%.2f")

    // ---- e01c: prediction agreement with the EXACT kNN vote on a
    // 256-query panel (exact top-5 + the e01 vote rule recomputed
    // driver-side from bruteTopK's labeled rows)
    val ePanel = e.select(col("vec_id"), col("v"))
      .orderBy(xxhash64(lit("epanel"), col("vec_id")), col("vec_id"))
      .limit(256).as[(Long, Array[Double])].collect()
    val truth5 = t("e01c panel truth (bruteTopK k=5)") {
      VectorQueries.bruteTopK(spark, e, ePanel, 5)
        .select("qid", "vec_id", "label").collect()
        .groupBy(_.getLong(0))
    }
    val exactVote: Map[Long, Int] = truth5.map { case (q, rows) =>
      val votes = rows.groupBy(_.getInt(2)).map { case (l, rs) => (l, rs.length) }
      q -> votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
    }
    val e01c = t("e01c knnClassifyCellBlocked (all queries)") {
      ExtendedQueries.e01cKnnClassifyIvfBq(spark, dir)
    }
    val got = e01c.filter(col("vec_id").isin(ePanel.map(_._1).toSeq: _*))
      .select("vec_id", "pred_label", "true_label").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    val agree = exactVote.count { case (q, p) => got.get(q).exists(_._1 == p) }
      .toDouble / exactVote.size
    val acc = got.values.count { case (p, tl) => p == tl }.toDouble / got.size
    println(f"[clustered] e01c vs exact-vote agreement over ${exactVote.size} panel queries: $agree%.3f" +
      f"  (true-label accuracy on panel: $acc%.3f)")
    spark.stop()
  }
}
