package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.DedupQueries

/** Persisted SKETCH artifacts — the d12 story made operational: the
  * history corpus is visited ONCE per version to build its span-hash
  * Bloom filter (a distributed aggregate; per-partition sketches
  * merge), the bits persist next to the HippoDb components, and
  * every later ingest batch / streaming micro-batch (st08) loads the
  * artifact instead of re-scanning 100 TB of history. The exact-
  * verify hash table persists alongside as parquet (the join side
  * that kills bloom false positives — narrow, one long per distinct
  * span).
  *
  * Sizing: ~1.2 GB of bits per 10⁹ distinct spans at 1% fpp; a
  * history past one broadcast's worth wants a partitioned bloom
  * (bits per hash-range shard) or a higher fpp — the verify join
  * keeps the output exact either way. */
object SketchIndex {

  /** Build + persist the span bloom AND the exact-verify hash table
    * under `dir` (span_bloom bits + span_hashes parquet). Returns
    * the number of span rows the sketch absorbed. */
  def buildSpanBloom(spark: SparkSession, docs: DataFrame, dir: String,
      fpp: Double = 0.01): Long = {
    val w = DedupQueries.spanHashRows(docs)
    val hashes = w.select("whash").distinct()
    hashes.write.mode(SaveMode.Overwrite).parquet(s"$dir/span_hashes")
    val persisted = spark.read.parquet(s"$dir/span_hashes")
    val n = math.max(1L, persisted.count())
    val bloom = persisted.stat.bloomFilter("whash", expectedNumItems = n, fpp)
    val p = new org.apache.hadoop.fs.Path(s"$dir/span_bloom")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try bloom.writeTo(out) finally out.close()
    n
  }

  def loadSpanBloom(spark: SparkSession, dir: String): BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/span_bloom")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  def loadSpanHashes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/span_hashes")

  /** d12 against the PERSISTED artifact: check a batch of documents
    * for spans the indexed history already contains — no history
    * scan, just the broadcast bits + the sliver-sized verify join.
    * Output contract identical to d12BloomSpanIncremental (shared
    * bloomSpanCheck stage). */
  def checkBatch(spark: SparkSession, dir: String, batchDocs: DataFrame): DataFrame =
    DedupQueries.bloomSpanCheck(
      DedupQueries.spanHashRows(batchDocs),
      loadSpanHashes(spark, dir),
      loadSpanBloom(spark, dir))
}
