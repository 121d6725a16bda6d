package graft.store

import graft.plans.Pins.Pinned

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
    atomicDirSwap(fs, p(live), p(tmp), p(bak), "buildSpanBloom")
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

  /** d13's history artifact made operational — the "cell table
    * persists per corpus version" claim as code: the banded MinHash
    * cell table + per-doc shingle sets of the HISTORY corpus, built
    * once under `dir/cell_index/`, so a later ingest batch
    * (checkBatchNeardup) hashes only ITSELF and pays a sliver-sized
    * cell join + exact verify against the persisted tables instead
    * of re-hashing 100 TB of history per batch. The two tables are
    * CO-DEPENDENT (the cells band exactly the signatures whose
    * shingle sets the verify step re-reads), so they commit
    * atomically via the same backup-rename swap as the span index,
    * with a read-back check that the pair covers the SAME doc set.
    * Returns the number of indexed (shingle-bearing) documents. */
  def buildCellIndex(spark: SparkSession, docs: DataFrame, dir: String): Long = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val live = s"$dir/cell_index"
    val tmp = s"$dir/cell_index_tmp"
    val bak = s"$dir/cell_index_bak"
    val fs = p(live).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p(tmp)) && !fs.delete(p(tmp), true))
      throw new java.io.IOException(s"buildCellIndex: could not clear stale tmp $tmp")
    // Hash ONCE: the signature pass (the dominant cost) persists to
    // a scratch dir, and both artifacts derive from the PARQUET —
    // no caches to leak, no second hashing pass (cells and shingles
    // written from cached-but-unmaterialized frames would each
    // rematerialize the signature map).
    DedupQueries.minhashSigs(docs).write.mode(SaveMode.Overwrite).parquet(s"$tmp/_sigs")
    val sigs = spark.read.parquet(s"$tmp/_sigs")
    DedupQueries.bandCells(sigs).write.mode(SaveMode.Overwrite).parquet(s"$tmp/cells")
    sigs.select("doc_id", "shingles").write.mode(SaveMode.Overwrite).parquet(s"$tmp/shingles")
    if (!fs.delete(p(s"$tmp/_sigs"), true))
      throw new java.io.IOException(s"buildCellIndex: could not remove scratch $tmp/_sigs")
    val cDocs = spark.read.parquet(s"$tmp/cells").select("doc_id").distinct()
    val sDocs = spark.read.parquet(s"$tmp/shingles").select("doc_id").distinct()
    val n = sDocs.count()
    if (cDocs.count() != n || cDocs.except(sDocs).count() != 0)
      throw new java.io.IOException(
        s"buildCellIndex: persisted cells/shingles at $tmp disagree on their doc set — live artifact untouched")
    atomicDirSwap(fs, p(live), p(tmp), p(bak), "buildCellIndex")
    n
  }

  /** d13 against the PERSISTED index: candidates = the batch's own
    * cells ⋈ the history cell table on the narrow cell key (never
    * batch × history), exact-J verify over the union of the batch's
    * in-memory shingle sets and the persisted history sets (doc ids
    * are globally unique), then the same bounded per-batch-doc
    * rollup. Output contract identical to d13IncrementalNeardup. */
  def checkBatchNeardup(spark: SparkSession, dir: String, batchDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // The batch signatures feed BOTH the candidate join and the
    // verify step — cache for the duration of this call only and
    // return the (batch-bounded) result MATERIALIZED, so repeated
    // per-micro-batch calls leak nothing (the v09 cache lesson).
    val bSigs = DedupQueries.minhashSigs(batchDocs).cache()
    try {
      val candidates = DedupQueries.bandCells(bSigs)
        .select(col("doc_id").as("batch_doc"), col("cell"))
        .join(spark.read.parquet(s"$dir/cell_index/cells")
          .select(col("doc_id").as("hist_doc"), col("cell")), "cell")
        .select("batch_doc", "hist_doc").distinct()
      // Two-sided verify: batch ids resolve from the in-memory batch
      // shingles, history ids from the persisted table — the history
      // parquet is probed once, and a re-ingested doc_id present in
      // both worlds cannot double-count.
      DedupQueries.verifyJaccard2(candidates,
          bSigs.select("doc_id", "shingles"),
          spark.read.parquet(s"$dir/cell_index/shingles"),
          "batch_doc", "hist_doc")
        .groupBy("batch_doc")
        .agg(count(lit(1)).as("n_hist_dups"), max("j").as("best_j"))
        .orderBy("batch_doc")
        .pinned
    } finally bSigs.unpersist()
  }

  /** Build + persist the m05 PERCEPTUAL-HASH index under
    * `dir/phash_index/`: `cells` (doc_id, band_idx, bval — the
    * blocking keys) + `sigs` (doc_id, bands — the exact-verify
    * side). Same co-dependency story as the minhash cell index
    * (cells must band exactly the signatures verify re-reads), so
    * the same hash-once scratch write, read-back doc-set check and
    * atomic swap. Returns the number of indexed documents. */
  def buildPhashIndex(spark: SparkSession, docs: DataFrame, dir: String): Long = {
    import org.apache.spark.sql.functions._
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val live = s"$dir/phash_index"
    val tmp = s"$dir/phash_index_tmp"
    val bak = s"$dir/phash_index_bak"
    val fs = p(live).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p(tmp)) && !fs.delete(p(tmp), true))
      throw new java.io.IOException(s"buildPhashIndex: could not clear stale tmp $tmp")
    phashSigs(spark, docs).write.mode(SaveMode.Overwrite).parquet(s"$tmp/sigs")
    val sigs = spark.read.parquet(s"$tmp/sigs")
    sigs.select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "bval")))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/cells")
    val cDocs = spark.read.parquet(s"$tmp/cells").select("doc_id").distinct()
    val sDocs = spark.read.parquet(s"$tmp/sigs").select("doc_id").distinct()
    val n = sDocs.count()
    if (cDocs.count() != n || cDocs.except(sDocs).count() != 0)
      throw new java.io.IOException(
        s"buildPhashIndex: persisted cells/sigs at $tmp disagree on their doc set — live artifact untouched")
    atomicDirSwap(fs, p(live), p(tmp), p(bak), "buildPhashIndex")
    n
  }

  private def phashSigs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, graft.operators.MultimodalQueries.phashBands(t))
      })
      .toDF("doc_id", "bands")
  }

  /** Which NEW media documents perceptually near-duplicate the
    * indexed history: batch bands ⋈ history cells on the narrow
    * (band_idx, bval) key (pigeonhole-lossless at the Hamming
    * threshold, never batch × history), exact 64-bit Hamming verify
    * against the persisted signatures, bounded per-batch-doc rollup
    * (n_hist_dups, best_hamming). The d13 contract for media. */
  def checkBatchPhash(spark: SparkSession, dir: String, batchDocs: DataFrame,
      maxHamming: Int = graft.operators.MultimodalQueries.PhashMaxHamming): DataFrame = {
    import org.apache.spark.sql.functions._
    val bSigs = phashSigs(spark, batchDocs).cache()
    try {
      val candidates = bSigs
        .select(col("doc_id").as("batch_doc"),
          posexplode(col("bands")).as(Seq("band_idx", "bval")))
        .join(spark.read.parquet(s"$dir/phash_index/cells")
          .select(col("doc_id").as("hist_doc"), col("band_idx"), col("bval")),
          Seq("band_idx", "bval"))
        .select("batch_doc", "hist_doc").distinct()
      candidates
        .join(bSigs.select(col("doc_id").as("batch_doc"), col("bands").as("ba")), "batch_doc")
        .join(spark.read.parquet(s"$dir/phash_index/sigs")
          .select(col("doc_id").as("hist_doc"), col("bands").as("bb")), "hist_doc")
        .withColumn("hamming",
          expr("aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)"))
        .filter(col("hamming") <= maxHamming)
        .groupBy("batch_doc")
        .agg(count(lit(1)).as("n_hist_dups"), min("hamming").as("best_hamming"))
        .orderBy("batch_doc")
        .pinned // batch-bounded rows; release bSigs safely
    } finally bSigs.unpersist()
  }

  /** Deletion propagation for the DOC-KEYED sketch artifacts
    * (HippoDb.deleteDocuments' takedown cascade reaches here): a
    * deleted document left in cell_index/phash_index produces GHOST
    * MATCHES — later ingest batches flag "duplicates of" content
    * that was taken down. Both tables of each artifact rewrite
    * FILTERED through the same atomic dir swap as their builders
    * (the pair stays co-dependent: one id set filters both), with
    * the builders' doc-set read-back check. Returns removed doc
    * counts per artifact present.
    *
    * span_index is deliberately NOT here: span_hashes carries
    * distinct 64-bit hashes with no doc key (a hash shared with a
    * surviving doc must stay), and Bloom bits cannot unlearn — its
    * takedown path is the per-version REBUILD it already has
    * (buildSpanBloom over the surviving corpus). */
  def deleteDocs(spark: SparkSession, dir: String, docIds: Seq[Long]): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    require(docIds.nonEmpty, "deleteDocs: empty docIds")
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val artifacts = Seq(
      "cell_index" -> Seq("cells", "shingles"),
      "phash_index" -> Seq("cells", "sigs"))
    artifacts.flatMap { case (name, tables) =>
      val live = s"$dir/$name"
      if (!fs.exists(p(live))) None
      else {
        val tmp = s"${live}_tmp"
        val bak = s"${live}_bak"
        if (fs.exists(p(tmp)) && !fs.delete(p(tmp), true))
          throw new java.io.IOException(s"deleteDocs: could not clear stale tmp $tmp")
        val before = spark.read.parquet(s"$live/${tables.head}")
          .select("doc_id").distinct()
        val removed = before.filter(col("doc_id").isin(docIds: _*)).count()
        if (removed == 0) { Some(name -> 0L) }
        else {
          tables.foreach { t =>
            spark.read.parquet(s"$live/$t")
              .filter(!col("doc_id").isin(docIds: _*))
              .write.mode(SaveMode.Overwrite).parquet(s"$tmp/$t")
          }
          val aDocs = spark.read.parquet(s"$tmp/${tables.head}").select("doc_id").distinct()
          val bDocs = spark.read.parquet(s"$tmp/${tables(1)}").select("doc_id").distinct()
          if (aDocs.count() != bDocs.count() || aDocs.except(bDocs).count() != 0)
            throw new java.io.IOException(
              s"deleteDocs: filtered $name tables at $tmp disagree on their doc set — live artifact untouched")
          if (aDocs.filter(col("doc_id").isin(docIds: _*)).count() != 0)
            throw new java.io.IOException(
              s"deleteDocs: filtered $name at $tmp still holds deleted ids — live artifact untouched")
          atomicDirSwap(fs, p(live), p(tmp), p(bak), s"deleteDocs($name)")
          Some(name -> removed)
        }
      }
    }.toMap
  }

  /** Atomic live/backup directory swap shared by the index builders
    * (the HippoDb.verifiedSwap recipe at directory granularity):
    * `tmp` must already hold the complete, verified artifact; every
    * crash point leaves a consistent artifact at live or backup. */
  private def atomicDirSwap(fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      bak: org.apache.hadoop.fs.Path, what: String): Unit = {
    if (fs.exists(bak) && !fs.delete(bak, true))
      throw new java.io.IOException(s"$what: could not clear stale backup $bak")
    if (fs.exists(live) && !fs.rename(live, bak))
      throw new java.io.IOException(s"$what: rename $live -> $bak failed (live untouched)")
    if (!fs.rename(tmp, live)) {
      val restored = !fs.exists(bak) || fs.rename(bak, live)
      throw new java.io.IOException(
        if (restored) s"$what: rename $tmp -> $live failed (live restored)"
        else s"$what: rename $tmp -> $live failed AND restore failed — live is at $bak")
    }
    if (fs.exists(bak) && !fs.delete(bak, true))
      throw new java.io.IOException(s"$what: swap succeeded but backup $bak not deleted")
  }
}
