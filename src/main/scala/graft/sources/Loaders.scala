package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document loaders — the reference's loaders.py surface, Spark-first.
  *
  *  - loadText ~ loaders.py:14 load_text (one Document per file; here
  *    a whole directory of files in one distributed read)
  *  - loadJsonl / loadCsv: the bulk-corpus formats a training-data
  *    pipeline actually ingests
  *  - load_wikipedia has no offline equivalent (zero-egress container)
  *    — callers fetch dumps out of band and point loadText at them.
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
