package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SHARDED TRAINING-DATA WRITER (VERDICT r11 #4) — the last mile
  * after curation/mixing/packing: what a 100 TB pipeline actually
  * emits to the trainer. Takes curated documents, applies a
  * DETERMINISTIC GLOBAL SHUFFLE (order by the md5-of-doc_id hex key —
  * the t10/t20/t26 cross-engine coin, so the shuffle order itself is
  * oracle-checkable, unlike a seeded RNG), then cuts the stream into
  * FIXED-TOKEN-BUDGET shards: a document goes whole into the shard
  * where its running token offset starts (documents are never split
  * across shard files — the split-into-sequences step is t11's job
  * INSIDE a shard), so every shard holds < budget + maxDocTokens
  * tokens and exactly budget-aligned offsets.
  *
  * Scale shape: the running token offset is the t11/t16 TWO-PASS
  * distributed prefix sum — range-repartition by the shuffle key,
  * pass 1 reduces each partition to ONE subtotal (O(partitions) longs
  * to the driver), pass 2 streams each partition once with its
  * broadcast offset. No global single-partition window anywhere; the
  * shard write is partitionBy(shard) — one pass, file layout = shard
  * layout. Both passes share one RDD object so the range bounds are
  * sampled once (the t16 invariant), and the ASSIGNMENT is
  * partitioning-invariant by construction: byte-identical manifests
  * on every re-run.
  *
  * Layout under `outDir/`:
  *   data/shard=N/ part files (doc_id, source, n_tokens, text)
  *   manifest/                (shard, source, n_docs, n_tokens) —
  *                            the per-shard source-mixture echo (t26)
  *                            every trainer manifest wants
  * Token counting is the t11 BPE-ish convention: ceil(len(word)/4)
  * summed over whitespace words.
  */
object ShardWriter {

  /** Entry dial: tokens per shard. Production shards are hundreds of
    * MB; the dial only changes HOW MANY shards exist, never the
    * assignment rule, so the small test value exercises multi-shard
    * layouts at every SF. */
  val ShardTokenBudget = 16384L

  private val tokenCountExpr =
    "CAST(aggregate(transform(split(text, ' '), w -> (length(w) + 3) DIV 4), 0L, (acc, x) -> acc + x) AS BIGINT)"

  /** The deterministic shard ASSIGNMENT — pure compute, no write:
    * (doc_id, source, n_tokens, text, shard). `docs` must carry
    * (doc_id, source, text). */
  def assignShards(spark: SparkSession, docs: DataFrame,
      tokenBudget: Long = ShardTokenBudget): DataFrame = {
    import spark.implicits._
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val keyed = docs
      .select(col("doc_id"), col("source"), col("text"),
        expr(tokenCountExpr).as("n_tokens"),
        md5(col("doc_id").cast("string")).as("k"))
      .repartitionByRange(col("k"), col("doc_id"))
      .sortWithinPartitions("k", "doc_id")
      .select(col("doc_id"), col("source"), col("text"), col("n_tokens"))
      .as[(Long, String, String, Long)]
    // Both passes share ONE RDD object: the range-partitioner bounds
    // are sampled once, so pass-2 rows sit exactly where pass 1
    // counted them (the t11/t16 invariant).
    val rdd = keyed.rdd
    val subtotals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(s += _._4); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _)
    val bcOff = spark.sparkContext.broadcast(offsets)
    rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = bcOff.value(i)
      it.map { case (id, src, text, nt) =>
        val shard = cum / tokenBudget
        cum += nt
        (id, src, nt, text, shard)
      }
    }.toDF("doc_id", "source", "n_tokens", "text", "shard")
  }

  /** The per-shard manifest over an assignment: one row per
    * (shard, source) with exact doc and token counts — the
    * source-mixture echo a trainer-side loader audits before a run. */
  def manifestOf(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("shard", "source")

  /** Assign + WRITE: data partitioned by shard (the file layout IS
    * the shard layout — a trainer reads shard N as one directory) +
    * the manifest beside it. Returns the manifest. */
  def writeShards(spark: SparkSession, docs: DataFrame, outDir: String,
      tokenBudget: Long = ShardTokenBudget): DataFrame = {
    val assigned = assignShards(spark, docs, tokenBudget)
    assigned.write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(s"$outDir/data")
    // Manifest from the WRITTEN files, not the lazy assignment plan:
    // re-evaluating `assigned` would run the global range shuffle +
    // prefix passes a second time (the corpus is too big to cache at
    // the target scale), and counting what actually landed doubles as
    // a write verification. The shard partition column reads back
    // inferred — cast it to the assignment's long.
    val m = manifestOf(spark.read.parquet(s"$outDir/data")
      .withColumn("shard", col("shard").cast("long")))
    m.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest").orderBy("shard", "source")
  }

  /** The whole shard layout back as ONE DataFrame (the shard id is
    * the partition column) — round-trip contract for downstream
    * consumers that want the corpus, not the files. The partition
    * column infers as int; cast it back to the long every other
    * surface of the API (assignShards, the manifest) carries, so the
    * round-trip schema matches what was written. */
  def readShards(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/data")
      .withColumn("shard", col("shard").cast("long"))

  /** t28 query entry: the shard MANIFEST over the t26
    * temperature-flattened mixture of the documents table — the
    * composed "mix then shard" last mile, oracle-checkable end to end
    * because both the mixture coin and the shuffle key are the md5
    * hex convention. */
  def t28ShardManifest(spark: SparkSession, dir: String): DataFrame =
    manifestOf(assignShards(spark,
      graft.operators.TextQueries.t26SourceMixture(spark, dir)
        .join(Tables.documents(spark, dir).select("doc_id", "text"), "doc_id")))

  /** t28 oracle: the same mixture membership (t26's SQL), the same
    * md5-hex global order, the running token offset as a window
    * prefix sum (fine in DuckDB at oracle scale; the Spark side uses
    * the two-pass form for the 100 TB shape), the same
    * floor(offset/budget) shard rule. */
  def t28OracleSql: String =
    s"""WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
       |m AS (SELECT max(n_s) AS mx FROM c),
       |f AS (SELECT source,
       |  LEAST(1.0, ${graft.operators.TextQueries.MixKeepMax} * sqrt(CAST(mx AS DOUBLE) / n_s)) AS f
       |  FROM c, m),
       |kept AS (
       |  SELECT d.doc_id, d.source, d.text
       |  FROM documents d JOIN f ON d.source = f.source
       |  WHERE ${graft.operators.TextQueries.md5UniformSql} < f.f),
       |base AS (
       |  SELECT doc_id, source,
       |    CAST(list_sum(list_transform(string_split(text, ' '),
       |      w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR)) AS k
       |  FROM kept),
       |cum AS (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM base)
       |SELECT CAST((cum - n_tokens) // $ShardTokenBudget AS BIGINT) AS shard,
       |  source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM cum GROUP BY 1, 2
       |ORDER BY shard, source""".stripMargin
}
