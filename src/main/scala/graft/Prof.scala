package graft
// Temporary profiling harness (not part of the library surface).
import org.apache.spark.sql.SparkSession

object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupQueries._
    t("warmup q01")(SparkEntry.queries("q01_pricing_summary")(spark, dir).count())
    val n = t("d04 cold")(d04NgramJaccard(spark, dir).count())
    System.err.println(s"[prof] d04 rows: $n")
    spark.catalog.clearCache(); System.gc()
    t("d04 cold2")(d04NgramJaccard(spark, dir).count())
    spark.stop()
  }
}
