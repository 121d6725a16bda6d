package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.KMeans
import graft.sources.{Loaders, Tables}

class KMeansSpec extends SparkSpec {

  test("kmeans inertia is non-increasing and assignment is deterministic") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val (assign, centroids, inertias) = KMeans.fit(spark, e, k = 8, iters = 5)
    assert(centroids.length == 8)
    assert(inertias.size == 5)
    inertias.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-6, s"inertia rose: $a -> $b") }
    val counts = assign.groupBy("cluster").count().collect()
    assert(counts.length <= 8 && counts.map(_.getLong(1)).sum == 500)
    val again = KMeans.e02Kmeans(spark, sf0001).collect().toSeq
    assert(again == KMeans.e02Kmeans(spark, sf0001).collect().toSeq)
  }

  test("e03 cluster-balanced sample: per-cluster quota, deterministic, skew-resistant") {
    import org.apache.spark.sql.functions._
    val sample = KMeans.e03ClusterSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val all = KMeans.e02Kmeans(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // Same 8-cluster geometry base (e03 refits with 3 iters, so only
    // structural properties are compared, not assignments).
    val perCluster = sample.groupBy(_._2).view.mapValues(_.length).toMap
    // QUOTA: no cluster exceeds it; clusters smaller than the quota
    // keep everything (balanced, not a uniform rate).
    assert(perCluster.values.forall(_ <= KMeans.ClusterQuota),
      s"quota exceeded: $perCluster")
    val sizes = KMeans.e03ClusterSample(spark, sf0001) // determinism
    assert(sizes.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq == sample.toSeq)
    // A 500-vector corpus over 8 clusters with quota 40 keeps at most
    // 320 — dense clusters MUST have been downsampled.
    assert(sample.length <= KMeans.SampleClusters * KMeans.ClusterQuota)
    assert(sample.length < all.length, "sampling kept everything")
    // Every sampled id exists in the corpus.
    assert(sample.map(_._1).toSet.subsetOf(all.map(_._1).toSet))
  }

  test("e04 silhouette: exact on a planted 2-cluster case, near 1 when separated, lower when merged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Two tight planted clusters far apart: centroids (0,0)/(10,0),
    // each point at distance 1 from its own centroid and ~sqrt(82)
    // ... use exact coordinates so s is hand-derivable.
    val pts = Seq(
      (0L, Array(1.0, 0.0), 0), (1L, Array(-1.0, 0.0), 0),
      (2L, Array(11.0, 0.0), 1), (3L, Array(9.0, 0.0), 1))
    val df = pts.map { case (id, v, c) => (id, v, c) }.toDF("vec_id", "v", "cluster")
    val centroids = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    val rows = KMeans.silhouette(spark, df, centroids).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // cluster 0: point 0 has a=1, b=9 -> s=8/9; point 1 a=1, b=11 -> 10/11
    val want0 = math.rint((8.0 / 9 + 10.0 / 11) / 2 * 1e6) / 1e6
    assert(rows(0) == ((2L, want0)), s"${rows(0)} vs $want0")
    assert(rows(1)._1 == 2L && rows(1)._2 == want0, "symmetric layout scores equal")

    // Separated beats merged: the same points against one far and
    // one ON-TOP centroid pair must score lower than the true split.
    val bad = Array(Array(0.0, 0.0), Array(0.5, 0.0))
    val badAssign = df.withColumn("cluster",
      when(col("vec_id") < 2, 0).otherwise(1))
    val badMean = KMeans.silhouette(spark, badAssign, bad).collect()
      .map(_.getDouble(2)).sum / 2
    assert(badMean < want0, s"merged centroids must score lower: $badMean")

    // The corpus entry returns one row per cluster with valid range.
    val e04 = KMeans.e04Silhouette(spark, sf0001).collect()
    assert(e04.length == 8 && e04.forall(r =>
      r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }

  test("e05 centroid classify: perfect on separated planted labels; smaller label wins exact ties") {
    import spark.implicits._
    // three separated label clusters: members are small perturbations
    // around orthogonal-ish anchors, so each vector's own label
    // centroid is its nearest by construction
    val anchors = Map(0 -> Array(10.0, 0.0, 0.0), 1 -> Array(0.0, 10.0, 0.0),
      2 -> Array(0.0, 0.0, 10.0))
    val planted = (0L until 60L).map { id =>
      val lbl = (id % 3).toInt
      val a = anchors(lbl)
      (id, a.zipWithIndex.map { case (x, j) => x + math.sin(id * 1.3 + j) * 0.4 }, lbl)
    }.toDF("vec_id", "v", "label")
    val out = graft.operators.ExtendedQueries.centroidClassify(spark, planted)
      .collect()
    assert(out.length == 60)
    assert(out.forall(r => r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")),
      "separated clusters must classify perfectly")
    // tie-break: a corpus where labels 1 and 2 have IDENTICAL
    // centroids (same two mirrored members) — every vector's cosine
    // ties exactly, and the SMALLER label must win
    val tied = Seq(
      (0L, Array(1.0, 1.0), 1), (1L, Array(3.0, 3.0), 1),
      (2L, Array(1.0, 1.0), 2), (3L, Array(3.0, 3.0), 2))
      .toDF("vec_id", "v", "label")
    val tiedOut = graft.operators.ExtendedQueries.centroidClassify(spark, tied).collect()
    assert(tiedOut.forall(_.getAs[Int]("pred_label") == 1),
      "exact cosine tie must resolve to the smaller label")
  }

  test("loadText reads a directory of files into the documents schema") {
    val tmp = java.nio.file.Files.createTempDirectory("docs")
    java.nio.file.Files.writeString(tmp.resolve("a.txt"), "hello spark world")
    java.nio.file.Files.writeString(tmp.resolve("b.txt"), "second document text here")
    val df = Loaders.loadText(spark, s"$tmp/*.txt")
    assert(df.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 2)
    assert(rows.exists(_.getAs[String]("text").contains("hello spark")))
    assert(rows.forall(r => r.getAs[Long]("n_chars") == r.getAs[String]("text").length))
  }
}
