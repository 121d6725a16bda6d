package graft
// Temporary profiling harness (not part of the library surface).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t("warmup q01")(SparkEntry.queries("q01_pricing_summary")(spark, dir).count())
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
      .withColumn("nv", normNative(col("v")))
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    t("cache e")(e.count())
    val q = e.select(col("vec_id").as("qid"), col("v").as("qv"), col("nv").as("nq"))
    val scored = e.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"),
        cosinePreRaw(col("v"), col("qv"), col("nv"), col("nq")).as("rawcos"), col("vec_id"))
    t("scored count")(scored.count())
    val agg = scored.groupBy("qid")
      .agg(org.apache.spark.sql.graft.TopKAgg.topK(col("rawcos"), col("vec_id"), 13).as("top"))
    t("agg count")(agg.count())
    val neighbours = agg.select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), round(col("t.cos"), 6).as("cos"), col("t.vec_id").as("vec_id"))
    t("neighbours count")(neighbours.count())
    t("full e01")(graft.operators.ExtendedQueries.e01KnnClassify(spark, dir).count())
    t("full e01 again")(graft.operators.ExtendedQueries.e01KnnClassify(spark, dir).count())
    spark.stop()
  }
}
