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
    * under `dir/span_index/` (span_bloom bits + span_hashes parquet).
    * The two artifacts are CO-DEPENDENT — a bloom over a different
    * corpus version than the hash table breaks the no-false-negative
    * contract silently — so they commit ATOMICALLY: both are written
    * into a tmp directory, read back (the bloom must answer for a
    * sample of the persisted hashes), and the whole directory swaps
    * live via backup-rename (the HippoDb.verifiedSwap recipe; every
    * crash point leaves a consistent pair at live or backup).
    * Returns the number of distinct hashes indexed. */
  def buildSpanBloom(spark: SparkSession, docs: DataFrame, dir: String,
      fpp: Double = 0.01): Long = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val live = s"$dir/span_index"
    val tmp = s"$dir/span_index_tmp"
    val bak = s"$dir/span_index_bak"
    val fs = p(live).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p(tmp)) && !fs.delete(p(tmp), true))
      throw new java.io.IOException(s"buildSpanBloom: could not clear stale tmp $tmp")
    val w = DedupQueries.spanHashRows(docs)
    w.select("whash").distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/span_hashes")
    val persisted = spark.read.parquet(s"$tmp/span_hashes")
    val n = persisted.count()
    // Zero indexed hashes is a legal (empty/all-short) corpus: build
    // a valid empty sketch directly — df.stat.bloomFilter over zero
    // rows yields a null-buffer bloom that NPEs on read.
    val bloom =
      if (n == 0) BloomFilter.create(1, fpp)
      else persisted.stat.bloomFilter("whash", expectedNumItems = n, fpp)
    val out = fs.create(p(s"$tmp/span_bloom"), true)
    try bloom.writeTo(out) finally out.close()
    // Read-back verify: the tmp pair must be self-consistent before
    // it may replace the live artifact.
    val back = {
      val in = fs.open(p(s"$tmp/span_bloom"))
      try BloomFilter.readFrom(in) finally in.close()
    }
    val sample = persisted.limit(100).collect().map(_.getLong(0))
    if (!sample.forall(back.mightContainLong))
      throw new java.io.IOException(
        s"buildSpanBloom: read-back bloom at $tmp misses indexed hashes — live artifact untouched")
    if (fs.exists(p(bak)) && !fs.delete(p(bak), true))
      throw new java.io.IOException(s"buildSpanBloom: could not clear stale backup $bak")
    if (fs.exists(p(live)) && !fs.rename(p(live), p(bak)))
      throw new java.io.IOException(s"buildSpanBloom: rename $live -> $bak failed (live untouched)")
    if (!fs.rename(p(tmp), p(live))) {
      val restored = !fs.exists(p(bak)) || fs.rename(p(bak), p(live))
      throw new java.io.IOException(
        if (restored) s"buildSpanBloom: rename $tmp -> $live failed (live restored)"
        else s"buildSpanBloom: rename $tmp -> $live failed AND restore failed — live is at $bak")
    }
    if (fs.exists(p(bak)) && !fs.delete(p(bak), true))
      throw new java.io.IOException(s"buildSpanBloom: swap succeeded but backup $bak not deleted")
    n
  }

  def loadSpanBloom(spark: SparkSession, dir: String): BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/span_index/span_bloom")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  def loadSpanHashes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/span_index/span_hashes")

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
