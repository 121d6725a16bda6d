package graft
// Temporary stage-level profiling for the heavy dedup queries (not
// library surface): times each sub-plan of d04 with a count() action
// so the dominant stage is visible without the UI.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfStages {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // TypedImperativeAggregate (TopKAgg/sketches) keys per partition
      // before sort-based fallback: the 128-row default externally sorts
      // every large pool stage (the measured 2M-decade spill)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.DedupQueries._
    import graft.sources.Tables
    import org.apache.spark.sql.expressions.Window

    val tt = CharJaccardThreshold
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, tx) => (id, charGramHashes(tx)) }
      .toDF("doc_id", "grams")
      .select(col("doc_id"), size(col("grams")).as("sz"), col("grams"))
      .cache()
    t("gram hashing + cache")(g.count())
    val inv = g.select(col("doc_id"), col("sz"), explode(col("grams")).as("gram"))
    t("inverted index rows")(System.err.println("  inv=" + inv.count()))
    val df = inv.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    t("gram df groupBy")(System.err.println("  distinct grams=" + df.count()))
    t("df>1 grams")(System.err.println("  multi-doc grams=" + df.filter(col("gram_df") > 1).count()))
    val prefix = inv.join(df, "gram")
      .filter(col("gram_df") > 1)
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy("gram_df", "gram")))
      .filter(col("rk") <= floor(col("sz") * (1 - tt)) + 1)
      .select("doc_id", "sz", "gram", "rk").cache()
    t("prefix build (join df + window)")(System.err.println("  prefix rows=" + prefix.count()))
    val candidates = prefix.as("l").join(prefix.as("r"),
        col("l.gram") === col("r.gram") && col("l.doc_id") < col("r.doc_id") &&
          col("l.sz") >= col("r.sz") * tt && col("r.sz") >= col("l.sz") * tt &&
          (least(col("l.sz") - col("l.rk"), col("r.sz") - col("r.rk")) + 1) >=
            ceil((col("l.sz") + col("r.sz")) * (tt / (1 + tt))))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
    t("candidate pairs RAW (no distinct)")(
      System.err.println("  raw candidates=" + candidates.count()))
    val candD = candidates.distinct().cache()
    t("candidate distinct")(
      System.err.println("  candidates=" + candD.count()))
    val verified = candD
      .join(g.select(col("doc_id").as("doc_a"), col("grams").as("ga"), col("sz").as("sza")), "doc_a")
      .join(g.select(col("doc_id").as("doc_b"), col("grams").as("gb"), col("sz").as("szb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("ga"), col("sza"), col("gb"), col("szb"))
      .as[(Long, Long, Array[Long], Int, Array[Long], Int)]
      .map { case (a, b, ga, sza, gb, szb) =>
        val inter = sortedIntersectionSize(ga, gb)
        (a, b, inter.toDouble / (sza + szb - inter))
      }
      .toDF("doc_a", "doc_b", "jraw")
      .filter(round(col("jraw"), 4) >= tt)
    t("verification (re-attach + merge)")(System.err.println("  pairs=" + verified.count()))
    t("END-TO-END d04 (uncached)")(
      d04NgramJaccard(spark, dir).count())
    spark.stop()
  }
}
// (d06 staging lives in a second main to keep runs independent)
object ProfStagesD06 {
  import ProfStages.t
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{DedupQueries, VectorQueries}
    import graft.operators.DedupQueries._
    import graft.functions.VectorFunctions._
    import graft.sources.Tables
    val planes = VectorQueries.lshPlanes(AnnTables * AnnBits, 64, seed = 77L)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nv", normNative(col("v")))
      .cache()
    t("embed + norm + cache")(e.count())
    val cells = e.select(col("vec_id"),
      explode(VectorQueries.cellStructs(planes, AnnTables, AnnBits)(col("v"))).as("cell"))
    t("cells")(System.err.println("  cells=" + cells.count()))
    val cand = cells.as("l").join(cells.as("r"),
        col("l.cell") === col("r.cell") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
    t("candidate rows (cell self-join)")(System.err.println("  cand=" + cand.count()))
    val scored = cand
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nv").as("na")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nv").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosinePreRaw(col("va"), col("vb"), col("na"), col("nb")).as("rawcos"))
      .filter(col("rawcos") >= CosineThreshold - 1e-6)
    t("re-attach + cosine + filter")(System.err.println("  passed=" + scored.count()))
    t("END-TO-END d06")(DedupQueries.d06EmbedNeardupAnn(spark, dir).count())
    spark.stop()
  }
}
object ProfStagesD07 {
  import ProfStages.t
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupQueries
    val pairs = t("d02 pairs count")(DedupQueries.d02Pairs(spark, dir).select("doc_a", "doc_b"))
    t("d02 pairs action")(System.err.println("  pairs=" + pairs.count()))
    val cc = t("connectedComponents (eager loop)")(DedupQueries.connectedComponents(pairs))
    t("final d07 count")(System.err.println("  rows=" +
      DedupQueries.d07DedupClusters(spark, dir).count()))
    spark.stop()
  }
}
object ProfStagesCC {
  import ProfStages.t
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 250 chains of 2 + one chain of 8 — mimics the sf0.1 pair graph
    val edges = ((0 until 250).map(i => (i * 10L, i * 10L + 1L)) ++
      (0 until 7).map(i => (9000L + i, 9001L + i))).toDF("u", "v")
    t("cc #1")(graft.operators.DedupQueries.connectedComponents(edges).count())
    t("cc #2")(graft.operators.DedupQueries.connectedComponents(edges).count())
    t("cc #3")(graft.operators.DedupQueries.connectedComponents(edges).count())
    spark.stop()
  }
}
