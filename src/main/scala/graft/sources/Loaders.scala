package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document loaders — the reference's loaders.py surface, Spark-first.
  *
  *  - loadText ~ loaders.py:14 load_text (one Document per file; here
  *    a whole directory of files in one distributed read)
  *  - loadJsonl / loadCsv: the bulk-corpus formats a training-data
  *    pipeline actually ingests
  *  - loadWikipediaDump / loadWikipedia ~ loaders.py:6-11
  *    load_wikipedia, offline: the container has zero egress, so the
  *    network fetch is replaced by a LOCAL dump extract (the JSONL
  *    format wikiextractor and the HF wikipedia dumps emit — one
  *    {"id","url","title","text"} object per line, fetched out of
  *    band); the query→first-matching-page semantics are preserved.
  *
  * All loaders emit the canonical documents schema
  * (doc_id, text, lang, source, n_chars); doc_id derives from a hash
  * of the source path + offset so ids are stable without any global
  * ordering dependency (zipWithIndex would force a single pass).
  */
object Loaders {

  /** Whole-text-files read: one document per file. */
  def loadText(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(
        abs(xxhash64(input_file_name())).as("doc_id"),
        col("value").as("text"),
        lit("und").as("lang"),
        input_file_name().as("source"),
        length(col("value")).cast("long").as("n_chars"))

  /** JSONL corpus with at least a `text` field. */
  def loadJsonl(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.json(pathGlob)
      .select(
        abs(xxhash64(input_file_name(), col("text"))).as("doc_id"),
        col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        input_file_name().as("source"),
        length(col("text")).cast("long").as("n_chars"))

  /** The reference caps page content at 1e6 chars
    * (loaders.py:9 doc_content_chars_max). */
  val WikipediaMaxChars = 1000000

  /** Offline Wikipedia dump extract: one page per JSONL object with
    * at least (title, text); id/url/lang optional (wikiextractor
    * emits id+url, HF dumps emit url). Emits the canonical documents
    * schema PLUS the page title; doc_id hashes (title, text) so ids
    * are stable across re-reads and partitionings with no global
    * ordering dependency. Distributed read — a full dump is ~100 GB
    * of JSONL and splits across executors like any corpus. */
  def loadWikipediaDump(spark: SparkSession, pathGlob: String): DataFrame = {
    val raw = spark.read.json(pathGlob)
    val withLang =
      if (raw.columns.contains("lang")) raw.col("lang") else lit(null)
    val withUrl =
      if (raw.columns.contains("url")) raw.col("url") else lit(null)
    raw.select(
      abs(xxhash64(col("title"), col("text"))).as("doc_id"),
      substring(col("text"), 1, WikipediaMaxChars).as("text"),
      coalesce(withLang, lit("und")).as("lang"),
      coalesce(withUrl, concat(lit("wikipedia:"), col("title"))).as("source"),
      least(length(col("text")), lit(WikipediaMaxChars)).cast("long").as("n_chars"),
      col("title"))
  }

  /** load_wikipedia(query) (loaders.py:6-11): the FIRST page matching
    * the query — here a case-insensitive title match against the
    * local dump instead of the Wikipedia search API. Title-prefix
    * matches rank before substring matches (the search API's
    * best-match-first analog); ties break on title for determinism.
    * Returns a 0/1-row DataFrame (the reference returns None when
    * nothing matches). */
  def loadWikipedia(spark: SparkSession, query: String, dumpGlob: String): DataFrame = {
    // Locale.ROOT: Spark's lower() is locale-independent; the JVM
    // default locale (e.g. tr-TR dotless i) would break the match.
    val q = query.toLowerCase(java.util.Locale.ROOT)
    loadWikipediaDump(spark, dumpGlob)
      .filter(lower(col("title")).contains(q))
      .withColumn("is_prefix", lower(col("title")).startsWith(q).cast("int"))
      .orderBy(col("is_prefix").desc, col("title"))
      .limit(1)
      .drop("is_prefix")
  }

  /** CSV corpus with a `text` column. */
  def loadCsv(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("header", "true").csv(pathGlob)
      .select(
        abs(xxhash64(input_file_name(), col("text"))).as("doc_id"),
        col("text"),
        lit("und").as("lang"),
        input_file_name().as("source"),
        length(col("text")).cast("long").as("n_chars"))
}
