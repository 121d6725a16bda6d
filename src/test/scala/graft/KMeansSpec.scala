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
