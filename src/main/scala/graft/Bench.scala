package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional subset, e.g. SPARK_GRAFT_ONLY=d04_ngram_jaccard,d05_embed_neardup
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed JVM/codegen warmup so the first timed query isn't
    // charged for JIT + whole-stage-codegen compilation. The heavy
    // typed-map kernels (gram hashing, minhash, pair verification,
    // top-k aggregation) warm against the TINY sf0.001 dir — JIT of
    // the same code paths, none of the measured data precomputed.
    // Heavy typed-map kernels warm ONLY against the tiny sf0.001 dir
    // — warming them on the measured dataset would pre-load OS page /
    // parquet footer caches that clearCache() cannot drop and skew
    // the cold methodology. Hosts without sf0.001 get JIT warmup from
    // q01 alone (logged).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    def canon(p: String): String =
      try new java.io.File(p).getCanonicalPath catch { case _: Throwable => p }
    val heavy =
      if (canon(warmDir) == canon(sfDir)) {
        // Warming the MEASURED dir would pre-load OS page / parquet
        // footer caches for the exact measured queries — precisely the
        // skew the cold methodology is meant to avoid. JIT warmup then
        // comes from q01 alone.
        System.err.println(s"[bench] warmup dir == measured dir ($sfDir) — skipping typed-kernel warmup")
        Seq.empty
      } else if (new java.io.File(warmDir).isDirectory)
        Seq(warmDir -> "d04_ngram_jaccard", warmDir -> "d02_minhash_lsh",
          warmDir -> "d06_embed_neardup_ann", warmDir -> "e01_knn_classify",
          warmDir -> "d07_dedup_clusters")
      else {
        System.err.println(s"[bench] $warmDir absent — skipping typed-kernel warmup")
        Seq.empty
      }
    (Seq(sfDir -> "q01_pricing_summary") ++ heavy).foreach { case (d, q) =>
      try {
        SparkEntry.queries(q)(spark, d).count()
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $q failed: ${e.getMessage}")
      }
    }
    System.gc()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Isolate queries: clearCache() drops per-query cached plans, but
      // broadcast blocks (BroadcastExchange results) are only released
      // by the ContextCleaner once the referencing plan is GC'd — an
      // explicit GC lets the cleaner reclaim them between queries, so
      // later queries aren't taxed by accumulated broadcast/GC pressure.
      spark.catalog.clearCache()
      System.gc()
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
