package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of d04_ngram_jaccard (r17 optimization round):
  * times the gram pass, prefix build, candidate join and verify
  * separately with the noop sink, prints candidate/pair counts. */
object ProfD04 {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profd04] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // full query, 3 repeats
    (1 to 3).foreach { i =>
      time(s"full d04 run $i") {
        DedupQueries.d04NgramJaccard(spark, dir).write
          .format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache(); System.gc()
    }
    // stage decomposition (mirrors d04NgramJaccard's internals)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val t = DedupQueries.CharJaccardThreshold
    val g = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, tx) => (id, DedupQueries.charGramHashes(tx)) }
      .toDF("doc_id", "grams")
      .select(col("doc_id"), size(col("grams")).as("sz"), col("grams"))
      .cache()
    time("gram pass (cache fill)") { g.count() }
    val inv = g.select(col("doc_id"), col("sz"), explode(col("grams")).as("gram"))
    val df = inv.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    time("inverted index + df") { df.write.format("noop").mode("overwrite").save() }
    val wDoc = Window.partitionBy("doc_id")
    val prefix = inv.join(df, "gram")
      .filter(col("gram_df") > 1)
      .withColumn("rk", row_number().over(
        wDoc.orderBy("gram_df", "gram")))
      .withColumn("fsz", count(lit(1)).over(wDoc))
      .filter(col("rk") <= floor(col("sz") * (1 - t)) + 1)
      .select("doc_id", "sz", "fsz", "gram", "rk")
    time("prefix rows") { println("  prefix rows: " + prefix.count()) }
    time("fsz stats") {
      prefix.agg(min(col("fsz") / col("sz")), avg(col("fsz") / col("sz")),
        max(col("fsz") / col("sz"))).show(false) }
    val matches = prefix.as("l").join(prefix.as("r"),
        col("l.gram") === col("r.gram") && col("l.doc_id") < col("r.doc_id") &&
          col("l.sz") >= col("r.sz") * t && col("r.sz") >= col("l.sz") * t &&
          (least(col("l.sz") - col("l.rk"), col("r.sz") - col("r.rk")) + 1) >=
            ceil((col("l.sz") + col("r.sz")) * (t / (1 + t))))
    val candidatesOld = matches
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    time("candidate pairs (old distinct)") {
      println("  candidates(old): " + candidatesOld.count()) }
    val tEff = t - 1e-4
    val candidates = matches
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.sz").as("sza"), col("r.sz").as("szb"),
        col("l.fsz").as("fsza"), col("r.fsz").as("fszb"),
        col("l.rk").as("rka"), col("r.rk").as("rkb"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("cnt"), max("sza").as("sza"), max("szb").as("szb"),
        max("fsza").as("fsza"), max("fszb").as("fszb"),
        max("rka").as("rka"), max("rkb").as("rkb"))
      .filter((col("cnt") + least(col("fsza") - col("rka"), col("fszb") - col("rkb"))) >=
        ceil((col("sza") + col("szb")) * (tEff / (1 + tEff))))
      .select("doc_a", "doc_b")
    time("candidate pairs (r18 fsz ubound prune)") {
      println("  candidates(new): " + candidates.count()) }
    val attached = candidates
      .join(g.select(col("doc_id").as("doc_a"), col("grams").as("ga"), col("sz").as("sza")), "doc_a")
      .join(g.select(col("doc_id").as("doc_b"), col("grams").as("gb"), col("sz").as("szb")), "doc_b")
    time("verify (attach + merge)") {
      attached
        .select(col("doc_a"), col("doc_b"), col("ga"), col("sza"), col("gb"), col("szb"))
        .as[(Long, Long, Array[Long], Int, Array[Long], Int)]
        .map { case (a, b, ga, sza, gb, szb) => (a, b, sza, szb) }
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
