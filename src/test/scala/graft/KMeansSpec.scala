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
