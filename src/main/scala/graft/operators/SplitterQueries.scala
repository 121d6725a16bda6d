package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Splitter query entries (SURVEY.md §2 s01–s03). */
object SplitterQueries {

  val NaiveSize = 80
  val ParaDelim = " spark " // stand-in for '\n\n' (corpus has no newlines)
  val RecSize = 120

  def s01Naive(spark: SparkSession, dir: String): DataFrame =
    Splitters.naive(Tables.documents(spark, dir), NaiveSize)
      .orderBy("doc_id", "chunk_idx")

  def s02Paragraph(spark: SparkSession, dir: String): DataFrame =
    Splitters.paragraph(Tables.documents(spark, dir), ParaDelim)
      .orderBy("doc_id", "chunk_idx")

  /** rows-only: recursive semantics verified by SplitterSpec invariants. */
  def s03Recursive(spark: SparkSession, dir: String): DataFrame =
    Splitters.recursiveDf(spark, Tables.documents(spark, dir), RecSize)
      .orderBy("doc_id", "chunk_idx")

  /** rows-only: semantic boundaries depend on the injected embedder;
    * SplitterSpec asserts the position invariants. */
  def s04Semantic(spark: SparkSession, dir: String): DataFrame =
    Splitters.semanticDf(spark, Tables.documents(spark, dir),
      new graft.functions.HashEmbedder(32))
      .orderBy("doc_id", "chunk_idx")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "s01_split_naive" -> (s01Naive _),
    "s02_split_paragraph" -> (s02Paragraph _),
    "s03_split_recursive" -> (s03Recursive _),
    "s04_split_semantic" -> (s04Semantic _))

  val oracles: Map[String, String] = Map(
    "s01_split_naive" ->
      s"""SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         |  substr(text, CAST(i AS INT) * $NaiveSize + 1, $NaiveSize) AS chunk,
         |  CAST(i * $NaiveSize AS INT) AS start,
         |  CAST(least(i * $NaiveSize + $NaiveSize, length(text)) AS INT) AS "end"
         |FROM documents
         |CROSS JOIN unnest(range(0, CAST(ceil(length(text) / $NaiveSize.0) AS BIGINT))) AS t(i)
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "s02_split_paragraph" ->
      s"""WITH pieces AS (
         |  SELECT doc_id,
         |    generate_subscripts(parts, 1) - 1 AS chunk_idx,
         |    unnest(parts) AS chunk
         |  FROM (SELECT doc_id, string_split(text, '$ParaDelim') AS parts
         |        FROM documents)),
         |pos AS (
         |  SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk,
         |    CAST(coalesce(sum(length(chunk) + ${ParaDelim.length}) OVER (
         |      PARTITION BY doc_id ORDER BY chunk_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
         |  FROM pieces)
         |SELECT doc_id, chunk_idx, chunk, start,
         |  start + length(chunk) AS "end"
         |FROM pos ORDER BY doc_id, chunk_idx""".stripMargin)
}
