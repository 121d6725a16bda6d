package graft
// Temporary stage decomposition of d14_containment (r18): counts the
// banded candidate set and times pairing vs the exact-count re-join,
// so the dominant stage is visible without the UI.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfD14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupQueries
    import graft.operators.TextQueries
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profd14] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      time(s"full d14 run $i") {
        DedupQueries.d14Containment(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache(); System.gc()
    }
    val d = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val g = TextQueries.wordGramRows(d, DedupQueries.ContainGram,
      Seq(col("doc_id"))).distinct().cache()
    time("gram rows (cache fill)") { println("  g rows: " + g.count()) }
    val banded = g.join(
      g.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2L, DedupQueries.ContainDfCap)).select("gram"),
      "gram")
    time("banded rows") { println("  banded: " + banded.count()) }
    val cand = banded.select(col("gram"), col("doc_id").as("a"))
      .join(banded.select(col("gram"), col("doc_id").as("b")), "gram")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    time("candidate pairs") { println("  cand: " + cand.count()) }
    val attach1 = cand.join(g.select(col("doc_id").as("a"), col("gram")), "a")
    time("attach a rows") { println("  cand x ga: " + attach1.count()) }
    val shared = attach1
      .join(g.select(col("doc_id").as("b"), col("gram")), Seq("b", "gram"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
    time("exact shared counts") { println("  shared pairs: " + shared.count()) }
    spark.stop()
  }
}
