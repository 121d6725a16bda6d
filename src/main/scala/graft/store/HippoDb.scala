package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Embedder
import graft.plans.HippoGraph

/** Parquet-backed hybrid graph+vector store — the Spark re-expression
  * of the reference's EntityStore persistence (storage.py:339-382
  * _load/save, which use entities.json/facts.json + two Chroma dirs).
  *
  * Layout under `dir/`:
  *   facts/      facts(fact_id, doc_id, chunk_idx, fact_text, start, end
  *               [, context, confidence])
  *   edges/      (fact_id, entity)            — partitioned-by-entity ready
  *   entities/   (entity[, description])
  *   fact_emb/   (fact_id, embedding array<float>)  — the vector side
  *   sources/    (fact_id, doc_id, name, description, url, date,
  *               start, end) — full storage.py:32-59 Source fields
  *               plus doc provenance (optional); doc_id is the span's
  *               ORIGINATING document, which deleteDocuments needs to
  *               erase spans that dedup accumulated onto surviving
  *               facts from other documents
  *   parameters.json                              — config echo
  *
  * At 100 TB: every component is parquet (splittable, column-pruned);
  * edges are written bucket-friendly sorted by entity; embeddings are
  * a flat array<float> column (vectorized read, no UDT).
  */
final case class HippoDb(
    facts: DataFrame, edges: DataFrame, entities: DataFrame, factEmb: DataFrame,
    sources: Option[DataFrame] = None) {

  def save(dir: String, params: Map[String, String] = Map.empty): Unit = {
    facts.write.mode(SaveMode.Overwrite).parquet(s"$dir/facts")
    edges.sortWithinPartitions("entity").write.mode(SaveMode.Overwrite).parquet(s"$dir/edges")
    entities.write.mode(SaveMode.Overwrite).parquet(s"$dir/entities")
    factEmb.write.mode(SaveMode.Overwrite).parquet(s"$dir/fact_emb")
    sources.foreach(_.write.mode(SaveMode.Overwrite).parquet(s"$dir/sources"))
    val json = (params + ("format" -> "graft-hippo-v1"))
      .map { case (k, v) => s"${HippoDb.jsonQuote(k)}: ${HippoDb.jsonQuote(v)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/parameters.json"), json)
  }

  /** Integrity check à la storage.py:136 — graph and vector sides
    * must agree; returns (nFacts, nEmbedded, nMissing). */
  def integrity: (Long, Long, Long) = {
    val nF = facts.count()
    val nE = factEmb.count()
    val missing = facts.join(factEmb, Seq("fact_id"), "left_anti").count()
    (nF, nE, missing)
  }

  /** Bucketed edges: writes the adjacency as a BUCKETED table
    * (bucketBy entity, sorted within buckets), so every downstream
    * aggregation or join KEYED ON entity — neighbour expansion,
    * degree counts, entity-probe semi-joins — reads pre-shuffled
    * data and plans with NO Exchange. This is the 100 TB layout for
    * the graph side: the one big shuffle happens once at write time
    * instead of once per query. */
  def saveEdgesBucketed(table: String, nBuckets: Int = 8): Unit =
    edges.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "entity").sortBy("entity")
      .saveAsTable(table)

  /** The RECONCILING action of storage.py:152-169 _restore_integrity:
    * drop vector-side rows whose fact is gone from the graph side (the
    * reference deletes Chroma ids absent from the entities/facts
    * lists). A semi-join, so at scale the big embedding table streams
    * against the fact-id set — no driver collection. */
  def restoreIntegrity: HippoDb =
    copy(factEmb = factEmb.join(facts.select("fact_id"), Seq("fact_id"), "left_semi"))
}

object HippoDb {

  /** JSON string escape (backslash, quote, all control chars < 0x20)
    * — shared with Verify's oracle dump; raw interpolation would emit
    * invalid JSON for quotes/newlines in params. */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Batch annotation build: corpus → graph + vector sides in one
    * declarative pass (the distributed analog of annotator.py:221
    * annotate()'s per-document loop). The embedder runs partition-
    * wise over fact text — map-side, no shuffle. */
  def build(spark: SparkSession, dir: String, embedder: Embedder): HippoDb = {
    import spark.implicits._
    val facts = HippoGraph.facts(spark, dir).cache()
    val edges = HippoGraph.edges(spark, dir)
    val entities = edges.select("entity").distinct()
    val factEmb = facts.select(col("fact_id"), col("fact_text"))
      .as[(Long, String)]
      .mapPartitions { it => it.map { case (id, t) => (id, embedder.embed(t)) } }
      .toDF("fact_id", "embedding")
    HippoDb(facts, edges, entities, factEmb)
  }

  /** Append a delta (e.g. one micro-batch of annotated documents) to
    * an existing store directory — the incremental-ingest half of the
    * reference's per-document annotate loop. Parquet append keeps
    * each component splittable; fact ids must be globally unique
    * (they derive from doc ids, so unique doc ids suffice). */
  def append(db: HippoDb, dir: String): Unit = {
    db.facts.write.mode(SaveMode.Append).parquet(s"$dir/facts")
    db.edges.write.mode(SaveMode.Append).parquet(s"$dir/edges")
    db.entities.write.mode(SaveMode.Append).parquet(s"$dir/entities")
    db.factEmb.write.mode(SaveMode.Append).parquet(s"$dir/fact_emb")
    db.sources.foreach(_.write.mode(SaveMode.Append).parquet(s"$dir/sources"))
  }

  /** Compact the entity dim of a parquet-backed store in place:
    * streaming/incremental ingest (append / st03 annotateStream)
    * accumulates one entity row PER BATCH the entity appears in —
    * harmless for readers that distinct(), but the dim grows with
    * batch count, not cardinality. One keyed agg dedupes it (keeping
    * the max description per entity, so a non-empty description
    * beats the annotator's empty default); the result replaces the
    * directory via a BACKUP-RENAME swap — verify the tmp write reads
    * back, rename live → backup, rename tmp → live, delete backup —
    * so every intermediate state (including a crash between any two
    * steps) still leaves a readable entities dim at either the live
    * or the backup path (the same recipe works on HDFS; object
    * stores want a two-phase commit). Returns the compacted entity
    * count. */
  def compactEntities(spark: SparkSession, dir: String): Long = {
    val path = s"$dir/entities"
    val cur = spark.read.parquet(path)
    val compact =
      if (cur.columns.contains("description"))
        cur.groupBy("entity").agg(max("description").as("description"))
      else cur.distinct()
    verifiedSwap(spark, path, compact, !cur.isEmpty)
  }

  /** Small-FILES compaction of any parquet directory — the table-
    * maintenance pass every long-lived dataset needs at 100 TB:
    * streaming/incremental ingest (append / st03) accumulates one
    * small file per micro-batch per partition, and scan cost becomes
    * dominated by file opens + footer reads once files shrink far
    * below the ~128 MB split size. Rewrites the directory into
    * ceil(bytes / targetBytes) files via a round-robin repartition —
    * compaction is LAYOUT, not clustering (key co-location is
    * saveEdgesBucketed's job) — using the same crash-safe
    * backup-rename swap as compactEntities. Returns (filesBefore,
    * filesAfter). */
  def compactFiles(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val before = dataFiles()
    val nOut = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetBytes).toInt)
    // Already at (or under) the target layout: rewriting would be
    // pure write amplification — a no-op keeps repeated maintenance
    // passes (and every-N-batch streaming cadences) from rewriting
    // a table that is already compact.
    if (before.length <= nOut) return (before.length, before.length)
    val cur = spark.read.parquet(path)
    verifiedSwap(spark, path, cur.repartition(nOut), !cur.isEmpty)
    (before.length, dataFiles().length)
  }

  /** Write `replacement` over the live directory at `path` via the
    * crash-safe recipe: tmp-write → read-back VERIFY (an unreadable
    * tmp throws; a readable-but-EMPTY tmp for a non-empty input is
    * the zero-task-commit data-loss mode and throws too) → rename
    * live → backup → rename tmp → live → delete backup. Every
    * intermediate state, including a crash between any two steps,
    * leaves a readable copy at either the live or the backup path
    * (works as-is on HDFS; object stores want a two-phase commit).
    *
    * `expected` tightens the guard from "non-empty" to an EXACT
    * read-back row count — the deletion cascade knows how many rows
    * must remain (including zero: deleting every doc legitimately
    * empties a component, which the hadRows guard alone would refuse).
    * `partitionCols` preserves a partitioned layout (the IVF/IVFADC
    * artifacts' inverted-list directories) across the rewrite — a
    * flat rewrite would silently demote the probe's partition filter
    * to a row filter. Returns the verified row count. */
  private[store] def verifiedSwap(spark: SparkSession, path: String,
      replacement: DataFrame, hadRows: Boolean,
      expected: Option[Long] = None,
      partitionCols: Seq[String] = Nil): Long = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val tmp = s"${path}_compact_tmp"
    val bak = s"${path}_compact_bak"
    // repartition ON the partition columns first (the
    // writeClusterPartitioned convention): a bare partitionBy makes
    // every task emit a file per value it holds — tasks × values
    // small files at rewrite time
    val toWrite =
      if (partitionCols.nonEmpty)
        replacement.repartition(partitionCols.map(col): _*)
      else replacement
    val w = toWrite.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp)
    val fs = p(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = spark.read.parquet(tmp).count()
    expected match {
      case Some(e) =>
        if (n != e)
          throw new java.io.IOException(
            s"verifiedSwap: output at $tmp has $n rows, expected $e — live dir untouched")
      case None =>
        if (hadRows && n == 0)
          throw new java.io.IOException(
            s"verifiedSwap: compacted output at $tmp is empty for a non-empty input — live dir untouched")
    }
    // Hadoop FS ops signal failure via their RETURN VALUE — every
    // step below checks it and fails loudly, never half-swapped.
    if (fs.exists(p(bak)) && !fs.delete(p(bak), true))
      throw new java.io.IOException(
        s"verifiedSwap: could not clear stale backup $bak")
    if (!fs.rename(p(path), p(bak)))
      throw new java.io.IOException(
        s"verifiedSwap: rename $path -> $bak failed (live dir untouched)")
    if (!fs.rename(p(tmp), p(path))) {
      // Restore the live dir so this failure mode also leaves the
      // store readable; the compacted data stays at tmp for retry.
      // The restore's OWN return value is checked too — reporting
      // "restored" when the rename failed would send an operator
      // away from a store with NO live dir.
      val restored = fs.rename(p(bak), p(path))
      throw new java.io.IOException(
        if (restored)
          s"verifiedSwap: rename $tmp -> $path failed (live dir restored from $bak)"
        else
          s"verifiedSwap: rename $tmp -> $path failed AND restore failed — live dir is at $bak, compacted data at $tmp")
    }
    if (!fs.delete(p(bak), true))
      throw new java.io.IOException(
        s"verifiedSwap: swap succeeded but stale backup $bak was not deleted")
    n
  }

  /** What [[deleteDocuments]] removed, component by component — the
    * audit record a takedown run files. */
  final case class DeleteReport(
      docsRequested: Long, factsDeleted: Long, edgesDeleted: Long,
      sourcesDeleted: Long, embeddingsDeleted: Long,
      entitiesPruned: Long, tombstonesAppended: Long)

  /** TAKEDOWN / deletion-propagation cascade (GDPR erasure, DMCA,
    * contaminated-source pulls) over the PERSISTED store: remove the
    * given documents and everything derived from them —
    * doc → facts → edges → sources → embeddings — then prune
    * entities left with no edge (the storage.py:152-181
    * _restore_integrity + _prune_lone_entities pair, applied to the
    * parquet layout instead of in-memory lists). Every component
    * rewrites through the crash-safe [[verifiedSwap]] with an EXACT
    * expected-count guard (live-or-backup readable at every step;
    * an emptied component is legal — deleting the last doc must not
    * wedge the cascade).
    *
    * `indexDirs`: persisted vector-index artifacts (VectorIndex
    * layouts) that serve these fact embeddings as vec_ids. The
    * cascade cannot rewrite multi-GB index artifacts synchronously,
    * so each named dir gets the victim fact ids APPENDED as
    * TOMBSTONES — every VectorIndex serving path anti-joins the
    * (broadcast-small) tombstone set until the next
    * `VectorIndex.compactTombstones` rewrite reclaims the bytes.
    *
    * The victim fact-id set is staged to `dir/_delete_victims_tmp`
    * and read back, so later cascade steps replay from a durable
    * snapshot (not a cache that could silently re-plan against the
    * already-swapped facts dir). The scratch dir is removed ONLY on
    * the success path: after a mid-cascade crash the facts swap may
    * already have landed, so a fresh run would compute an EMPTY
    * victim set and orphan the victims' edges/sources/embeddings
    * forever — the durable snapshot is the one record that can
    * finish the job. Recover with [[resumeDeleteDocuments]], which
    * replays every remaining step from the snapshot (each step is
    * idempotent: it counts what is actually still present before
    * swapping). `docIds` is a driver
    * Seq: a takedown batch is a bounded legal/ops artifact (the
    * 100 TB shape is a small broadcast literal list, not a join).
    *
    * Span-level erasure: sources rows delete by fact_id (the fact is
    * gone) OR by doc_id (the span's originating document is a
    * victim) — so a span that annotateDedupedWithSources accumulated
    * from a deleted duplicate onto a SURVIVING fact is erased with
    * its document. LEGACY stores whose sources predate the doc_id
    * column fall back to the fact_id-only cascade; their accumulated
    * spans outlive their document until a re-annotation (documented,
    * not silently wrong).
    */
  def deleteDocuments(spark: SparkSession, dir: String, docIds: Seq[Long],
      indexDirs: Seq[String] = Nil, sketchDirs: Seq[String] = Nil): DeleteReport = {
    require(docIds.nonEmpty, "deleteDocuments: empty docIds")
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = s"$dir/_delete_victims_tmp"
    if (fs.exists(p(scratch)))
      throw new IllegalStateException(
        s"deleteDocuments: a victim snapshot already exists at $scratch — " +
        "a prior takedown crashed mid-cascade; finish it with " +
        "resumeDeleteDocuments before starting a new one")
    // The snapshot stores the takedown's ENTIRE identity: victim fact
    // ids (the fact-keyed cascade), the doc ids (the doc-keyed steps),
    // AND the index/sketch dirs the call named — so a resume replays
    // exactly the crashed takedown instead of trusting a caller to
    // re-type the right ids, and a crash AFTER the facts swap but
    // BEFORE index tombstoning cannot lose the dirs and leave a
    // persisted index silently serving the deleted facts' vectors.
    // The snapshot is written to a STAGING path and renamed into
    // place: the rename is the commit point, so a crash mid-write
    // leaves no half-snapshot that resume could misread (facts are
    // untouched at that point — just re-run deleteDocuments, which
    // clears the stale staging dir itself).
    import spark.implicits._
    val staging = s"$scratch.staging"
    if (fs.exists(p(staging))) fs.delete(p(staging), true)
    val localRows: Seq[(Option[Long], Option[String], Option[String])] =
      docIds.distinct.map(d => (Some(d), None, None)) ++
        indexDirs.map(d => (None, Some(d), None)) ++
        sketchDirs.map(d => (None, None, Some(d)))
    spark.read.parquet(s"$dir/facts")
      .filter(col("doc_id").isin(docIds: _*))
      .select(col("fact_id"), lit(null).cast("long").as("victim_doc"),
        lit(null).cast("string").as("index_dir"),
        lit(null).cast("string").as("sketch_dir"))
      .unionByName(localRows.toDF("victim_doc", "index_dir", "sketch_dir")
        .select(lit(null).cast("long").as("fact_id"), col("victim_doc"),
          col("index_dir"), col("sketch_dir")))
      .write.mode(SaveMode.Overwrite).parquet(staging)
    if (!fs.rename(p(staging), p(scratch)))
      throw new java.io.IOException(
        s"deleteDocuments: could not commit the victim snapshot " +
        s"($staging -> $scratch)")
    val report = runDeleteCascade(spark, dir, docIds, indexDirs, sketchDirs)
    // Success path ONLY: a crash above leaves the snapshot for
    // resumeDeleteDocuments (and forensics).
    if (!fs.delete(p(scratch), true))
      throw new java.io.IOException(
        s"deleteDocuments: cascade committed but $scratch was not cleared")
    report
  }

  /** RESUME a takedown that crashed mid-cascade: replays every
    * remaining step from the durable snapshot [[deleteDocuments]]
    * left at `dir/_delete_victims_tmp`. The snapshot is
    * SELF-DESCRIBING — it carries the victim fact ids, the doc ids,
    * AND the index/sketch dirs of the crashed run, so resume cannot
    * be pointed at the wrong takedown (a mistyped doc list would
    * half-apply a different erasure and then clear the one record
    * able to finish the real one) and cannot silently SKIP the index
    * tombstoning half (a crash after the facts swap used to leave a
    * resume-with-defaults 'succeeding' while the persisted vector
    * index kept serving the deleted facts — the r12 ADVICE finding).
    * `indexDirs`/`sketchDirs` exist only for pre-r13 snapshots that
    * did not record them; against a recording snapshot they must be
    * EMPTY or EQUAL to what was recorded — any disagreement fails
    * fast before a row moves. Every step is idempotent against
    * partial application, except index tombstones which are
    * at-least-once (duplicate tombstone ids are harmless: the serving
    * anti-join and compaction both key on id membership). The
    * returned report counts what THIS run removed — components
    * already swapped before the crash report zero. */
  def resumeDeleteDocuments(spark: SparkSession, dir: String,
      indexDirs: Seq[String] = Nil, sketchDirs: Seq[String] = Nil): DeleteReport = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = s"$dir/_delete_victims_tmp"
    if (!fs.exists(p(scratch)))
      throw new IllegalStateException(
        s"resumeDeleteDocuments: no victim snapshot at $scratch — " +
        "nothing to resume (the prior takedown committed, or never staged)")
    val snap = spark.read.parquet(scratch)
    val docIds = snap.filter(col("victim_doc").isNotNull)
      .select("victim_doc").collect().map(_.getLong(0)).toSeq
    require(docIds.nonEmpty,
      s"resumeDeleteDocuments: snapshot at $scratch carries no doc ids — " +
      "it predates the self-describing format; finish the takedown manually")
    val (ixDirs, skDirs) =
      if (snap.columns.contains("index_dir")) {
        val recIx = snap.filter(col("index_dir").isNotNull)
          .select("index_dir").collect().map(_.getString(0)).toSeq
        val recSk = snap.filter(col("sketch_dir").isNotNull)
          .select("sketch_dir").collect().map(_.getString(0)).toSeq
        require(indexDirs.isEmpty || indexDirs.toSet == recIx.toSet,
          s"resumeDeleteDocuments: caller-supplied indexDirs $indexDirs " +
          s"disagree with the snapshot's recorded $recIx — resuming would " +
          "tombstone the wrong artifacts; pass Nil to use the recording")
        require(sketchDirs.isEmpty || sketchDirs.toSet == recSk.toSet,
          s"resumeDeleteDocuments: caller-supplied sketchDirs $sketchDirs " +
          s"disagree with the snapshot's recorded $recSk")
        (recIx, recSk)
      } else (indexDirs, sketchDirs) // pre-r13 snapshot: trust the caller
    val report = runDeleteCascade(spark, dir, docIds, ixDirs, skDirs)
    if (!fs.delete(p(scratch), true))
      throw new java.io.IOException(
        s"resumeDeleteDocuments: cascade committed but $scratch was not cleared")
    report
  }

  /** The cascade body shared by [[deleteDocuments]] and
    * [[resumeDeleteDocuments]] — reads the victim set from the
    * durable snapshot and makes EVERY step idempotent by counting
    * what is actually still present before swapping (a resumed run
    * must not fail verifiedSwap's exact-count guard on a component
    * the crashed run already swapped). */
  private def runDeleteCascade(spark: SparkSession, dir: String,
      docIds: Seq[Long], indexDirs: Seq[String],
      sketchDirs: Seq[String]): DeleteReport = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = s"$dir/_delete_victims_tmp"
    val victims = spark.read.parquet(scratch)
      .filter(col("fact_id").isNotNull).select("fact_id")
    locally {
      // facts: drop the victim docs' rows. The victim count still
      // PRESENT is measured live (resume-safe: zero after the
      // crashed run's facts swap landed).
      val facts = spark.read.parquet(s"$dir/facts")
      val totalF = facts.count()
      val presentF = facts.filter(col("doc_id").isin(docIds: _*)).count()
      if (presentF > 0)
        verifiedSwap(spark, s"$dir/facts",
          spark.read.parquet(s"$dir/facts")
            .filter(!col("doc_id").isin(docIds: _*)),
          hadRows = totalF > 0, expected = Some(totalF - presentF))
      // fact_id-keyed components: anti-join the victim set. Each step
      // fresh-reads its live dir AFTER any earlier swap, so no plan
      // ever executes against a renamed-away directory.
      def cascade(path: String): Long =
        if (!fs.exists(p(path))) 0L
        else {
          val cur = spark.read.parquet(path)
          val total = cur.count()
          val del = cur.join(victims, Seq("fact_id"), "left_semi").count()
          if (del > 0)
            verifiedSwap(spark, path,
              spark.read.parquet(path).join(victims, Seq("fact_id"), "left_anti"),
              hadRows = total > 0, expected = Some(total - del))
          del
        }
      val nEdges = cascade(s"$dir/edges")
      // sources: victim rows are those whose FACT died OR whose span
      // ORIGINATED in a victim doc (doc provenance; legacy schemas
      // without doc_id keep the fact-keyed half only).
      val nSources = {
        val path = s"$dir/sources"
        if (!fs.exists(p(path))) 0L
        else {
          def keepOf(df: DataFrame) = {
            val byFact = df.join(victims, Seq("fact_id"), "left_anti")
            // null-safe: legacy rows appended before the schema gained
            // doc_id read back as NULL — `!isin` alone is NULL for
            // them (dropped), which would silently erase every
            // legacy span on ANY takedown. Unknown provenance keeps
            // the row (the documented legacy-fallback behavior).
            if (df.columns.contains("doc_id"))
              byFact.filter(col("doc_id").isNull || !col("doc_id").isin(docIds: _*))
            else byFact
          }
          val cur = spark.read.parquet(path)
          val total = cur.count()
          val keptN = keepOf(cur).count()
          if (keptN != total)
            verifiedSwap(spark, path, keepOf(spark.read.parquet(path)),
              hadRows = total > 0, expected = Some(keptN))
          total - keptN
        }
      }
      val nEmb = cascade(s"$dir/fact_emb")
      // entities: prune those left with no edge (_prune_lone_entities).
      val ents = spark.read.parquet(s"$dir/entities")
      val totalE = ents.count()
      val keptE = ents.join(
        spark.read.parquet(s"$dir/edges").select("entity").distinct(),
        Seq("entity"), "left_semi")
      val keptN = keptE.count()
      if (keptN != totalE)
        verifiedSwap(spark, s"$dir/entities", keptE,
          hadRows = totalE > 0, expected = Some(keptN))
      // persisted index artifacts: append serving tombstones.
      val nTombs = indexDirs.map { ix =>
        VectorIndex.tombstone(spark, ix, victims.select(col("fact_id").as("vec_id")))
      }.sum
      // doc-keyed sketch artifacts: rewrite without the victim DOCS
      // (ghost-match removal; span_index rebuilds per version — see
      // SketchIndex.deleteDocs).
      sketchDirs.foreach(sd => SketchIndex.deleteDocs(spark, sd, docIds))
      DeleteReport(docIds.distinct.size.toLong, presentF, nEdges, nSources,
        nEmb, totalE - keptN, nTombs)
    }
  }

  /** What [[migrateSourcesProvenance]] did: rows whose doc_id was
    * derived from lineage vs rows left null (underivable). */
  final case class MigrateReport(migrated: Long, underivable: Long)

  /** ONE-SHOT provenance backfill for LEGACY sources (VERDICT r11
    * #7): rows appended before the schema gained doc_id read back as
    * NULL, so their spans outlive their document until re-annotation
    * (the documented fallback). This derives doc_id where the fact's
    * surviving lineage DETERMINES it, and flags the rest:
    *
    * a null-provenance row is the fact's own SELF-SPAN — and so
    * belongs to the fact's own doc — iff it matches the fact's own
    * (start, end) AND it is the ONLY row of that fact matching that
    * span. Accumulated duplicate spans (annotateDedupedWithSources)
    * can coincidentally share the survivor's span (an exact duplicate
    * doc yields identical chunk offsets), which is exactly the
    * ambiguous case: two matching rows mean at most one is the
    * self-span and lineage cannot say which, so BOTH stay null
    * (underivable, counted in the report) rather than guessing a
    * provenance that a takedown would then erase wrongly. The rewrite
    * goes through the crash-safe verifiedSwap with an exact row-count
    * guard; a legacy table WITHOUT the doc_id column gains it (nulls)
    * as part of the same swap. Idempotent: a second run migrates 0. */
  def migrateSourcesProvenance(spark: SparkSession, dir: String): MigrateReport = {
    val path = s"$dir/sources"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      return MigrateReport(0L, 0L)
    val cur0 = spark.read.parquet(path)
    val cur =
      if (cur0.columns.contains("doc_id")) cur0
      else cur0.withColumn("doc_id", lit(null).cast("long"))
    val total = cur.count()
    val nullBefore = cur.filter(col("doc_id").isNull).count()
    if (nullBefore == 0) return MigrateReport(0L, 0L)
    val factsMeta = spark.read.parquet(s"$dir/facts")
      .select(col("fact_id"), col("doc_id").as("own_doc"),
        col("start").as("fstart"), col("end").as("fend"))
    def derive(df: DataFrame): DataFrame = {
      val marked = df.join(factsMeta, Seq("fact_id"), "left_outer")
        .withColumn("is_self",
          col("fstart").isNotNull &&
            col("start") === col("fstart") && col("end") === col("fend"))
      val selfCounts = marked.groupBy("fact_id")
        .agg(sum(col("is_self").cast("long")).as("n_self"))
      val outCols = (Seq("fact_id", "doc_id") ++
        df.columns.filterNot(c => c == "fact_id" || c == "doc_id")).map(col)
      marked.join(selfCounts, Seq("fact_id"))
        .withColumn("doc_id",
          when(col("doc_id").isNotNull, col("doc_id"))
            .when(col("is_self") && col("n_self") === 1, col("own_doc"))
            .otherwise(lit(null).cast("long")))
        .select(outCols: _*)
    }
    verifiedSwap(spark, path, derive(cur),
      hadRows = total > 0, expected = Some(total))
    val after = spark.read.parquet(path)
    val nullAfter = after.filter(col("doc_id").isNull).count()
    MigrateReport(nullBefore - nullAfter, nullAfter)
  }

  def load(spark: SparkSession, dir: String): HippoDb = {
    // Hadoop FS, not java.nio: the store dir may live on any
    // Spark-reachable filesystem (hdfs://, s3a://, ...) where a local
    // Files.exists is always false and would silently drop sources.
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/sources")
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    HippoDb(
      facts = spark.read.parquet(s"$dir/facts"),
      edges = spark.read.parquet(s"$dir/edges"),
      entities = spark.read.parquet(s"$dir/entities"),
      factEmb = spark.read.parquet(s"$dir/fact_emb"),
      sources =
        if (fs.exists(srcPath)) Some(spark.read.parquet(s"$dir/sources"))
        else None)
  }
}
