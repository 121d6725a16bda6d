package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.ShardWriter

/** The sharded training-data writer (VERDICT r11 #4): deterministic
  * global shuffle + fixed-token-budget shard files + exact per-shard
  * manifest. The t28 oracle pins the assignment cross-engine; these
  * specs pin the WRITER contracts the oracle can't see — budget
  * discipline, write/read-back round trip, re-run determinism. */
class ShardWriterSpec extends SparkSpec {

  private val Budget = 500L

  private def docs: DataFrame = {
    import spark.implicits._
    // variable-length docs over three sources; token counts vary so
    // shard boundaries land mid-stream, not on doc edges
    (0 until 300).map { i =>
      val words = 3 + (i * 7) % 40
      (i.toLong, s"src${i % 3}",
        (0 until words).map(w => s"w${(i * 31 + w) % 97}x").mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("every shard starts budget-aligned and holds less than budget + maxDocTokens tokens") {
    val a = ShardWriter.assignShards(spark, docs, Budget).cache()
    try {
      val perShard = a.groupBy("shard")
        .agg(sum("n_tokens").as("toks"), count(lit(1)).as("docs"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(perShard.length > 3, "dial too coarse: single shard tells nothing")
      val maxDoc = a.agg(max("n_tokens")).head().getLong(0)
      perShard.foreach { case (s, t) =>
        assert(t < Budget + maxDoc,
          s"shard $s holds $t tokens >= budget + maxDocTokens") }
      // every shard except the last must REACH the budget (a doc that
      // straddles the boundary closes the shard): cumulative starts
      // are exactly floor-aligned, so shard i+1 existing implies
      // shard i crossed its budget line
      val cumEnds = perShard.map(_._2).scanLeft(0L)(_ + _).drop(1)
      perShard.dropRight(1).zip(cumEnds).foreach { case ((s, _), end) =>
        assert(end >= (s + 1) * Budget,
          s"shard $s closed at $end before reaching its budget line") }
      // no doc is split: total assigned tokens == total input tokens
      val totalIn = ShardWriter.assignShards(spark, docs, Long.MaxValue)
        .agg(sum("n_tokens")).head().getLong(0)
      assert(perShard.map(_._2).sum == totalIn)
    } finally a.unpersist()
  }

  test("manifest counts are exact against the written data; layout reads back as one DataFrame") {
    val out = Files.createTempDirectory("shards").toString
    val manifest = ShardWriter.writeShards(spark, docs, out, Budget)
    val back = ShardWriter.readShards(spark, out)
    // round-trip schema contract: the partition-inferred int comes
    // back as the long every other surface (assignment, manifest)
    // carries for the shard key
    assert(back.schema("shard").dataType ==
      org.apache.spark.sql.types.LongType,
      "readShards must surface the shard key as long")
    // read-back equals the assignment row for row
    val a = ShardWriter.assignShards(spark, docs, Budget)
    val wantRows = a.select("doc_id", "source", "n_tokens", "shard")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val gotRows = back.select("doc_id", "source", "n_tokens", "shard")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.get(3).toString.toLong)).toSet
    assert(gotRows == wantRows, "read-back diverged from the assignment")
    // manifest counts == counts recomputed from the written files
    val fromData = back.groupBy("shard", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .collect().map(r => (r.get(0).toString.toLong, r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val fromManifest = manifest.collect().map(r => (r.getLong(0),
      r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(fromManifest == fromData, "manifest disagrees with the written data")
    // the shard directories ARE the layout
    assert(new java.io.File(s"$out/data").listFiles()
      .count(_.getName.startsWith("shard=")) > 3)
  }

  test("re-running the writer reproduces the identical assignment and manifest") {
    val out1 = Files.createTempDirectory("shards-a").toString
    val out2 = Files.createTempDirectory("shards-b").toString
    def canon(df: DataFrame) = df.collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val m1 = canon(ShardWriter.writeShards(spark, docs, out1, Budget))
    val m2 = canon(ShardWriter.writeShards(spark, docs, out2, Budget))
    assert(m1 == m2, "manifest not deterministic across runs")
    val d1 = canon(ShardWriter.readShards(spark, out1)
      .select("doc_id", "source", "n_tokens", "shard"))
    val d2 = canon(ShardWriter.readShards(spark, out2)
      .select("doc_id", "source", "n_tokens", "shard"))
    assert(d1 == d2, "shard assignment not deterministic across runs")
  }

  test("assignment is invariant to input partitioning (the two-pass prefix contract)") {
    def canon(df: DataFrame) = df.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val base = canon(ShardWriter.assignShards(spark, docs, Budget))
    val repart = canon(ShardWriter.assignShards(spark,
      docs.repartition(7, col("source")), Budget))
    val one = canon(ShardWriter.assignShards(spark, docs.coalesce(1), Budget))
    assert(repart == base, "assignment changed under repartitioning")
    assert(one == base, "assignment changed under coalesce(1)")
  }
}
