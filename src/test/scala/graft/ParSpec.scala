package graft

import org.apache.spark.sql.functions._

import graft.plans.Par

/** Par.ensureParallelism contract (r18, VERDICT r17 #1): the
  * repartition fires ONLY for under-parallelized scan inputs; an
  * input that is already wide — or whose plan carries its own
  * exchanges — is returned untouched (same reference, so provably no
  * exchange is added to a many-split scan at scale). */
class ParSpec extends SparkSpec {

  test("single-split scan input is repartitioned to defaultParallelism") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val out = Par.ensureParallelism(docs)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // rows unchanged — redistribution only
    assert(out.count() == docs.count())
  }

  test("input at or above defaultParallelism is returned untouched (no exchange added)") {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    // a local relation spread wide via the RDD API: scan-shaped plan
    // (no Exchange), partition count >= defaultParallelism
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 1000).map(i =>
        org.apache.spark.sql.Row(i.toLong)), p + 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    assert(wide.rdd.getNumPartitions >= p)
    val out = Par.ensureParallelism(wide)
    assert(out eq wide, "expected the SAME reference — no plan change")
  }

  test("exchange-bearing input is left alone (upstream shuffle already parallelizes)") {
    import spark.implicits._
    val shuffled = (0 until 100).map(i => (i.toLong, i % 7))
      .toDF("id", "k").groupBy("k").agg(count(lit(1)).as("n"))
    val out = Par.ensureParallelism(shuffled)
    assert(out eq shuffled, "expected the SAME reference for an AQE-wrapped plan")
  }
}
