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

  /** s05 dials: W tokens per window, stride S (overlap W − S). */
  val WindowTokens = 16
  val WindowStride = 12

  /** s05: SLIDING TOKEN-WINDOW splitter — fixed W-token windows every
    * S tokens (the RAG-chunking workhorse: overlap keeps a sentence
    * that straddles a boundary whole in at least one chunk, which the
    * non-overlapping s01–s03 forms cannot guarantee). One codegen'd
    * projection (split → per-window slice via HOFs) + one explode —
    * no shuffle except the presentation sort; window COUNT is
    * 1 + ceil(max(T − W, 0) / S) so every token lands in ≥ 1 window
    * and the tail never emits an empty chunk. */
  def s05TokenWindow(spark: SparkSession, dir: String): DataFrame = {
    val (w, s) = (WindowTokens, WindowStride)
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_toks"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(ceil(greatest(size(toks) - $w, 0) / CAST($s AS DOUBLE)) AS INT)),
             |  i -> concat_ws(' ', slice(toks, i * $s + 1, $w)))""".stripMargin))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        (col("chunk_idx") * s).cast("long").as("start_tok"),
        least(col("chunk_idx") * s + w, col("n_toks")).cast("long").as("end_tok"))
      .orderBy("doc_id", "chunk_idx")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "s01_split_naive" -> (s01Naive _),
    "s02_split_paragraph" -> (s02Paragraph _),
    "s03_split_recursive" -> (s03Recursive _),
    "s04_split_semantic" -> (s04Semantic _),
    "s05_split_token_window" -> (s05TokenWindow _))

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
         |FROM pos ORDER BY doc_id, chunk_idx""".stripMargin,
    "s05_split_token_window" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |    len(string_split(text, ' ')) AS n_toks
         |  FROM documents),
         |win AS (
         |  SELECT doc_id, toks, n_toks, CAST(i AS INT) AS chunk_idx
         |  FROM d CROSS JOIN unnest(range(0,
         |    1 + CAST(ceil(greatest(n_toks - $WindowTokens, 0)
         |      / CAST($WindowStride AS DOUBLE)) AS BIGINT))) AS t(i))
         |SELECT doc_id, chunk_idx,
         |  array_to_string(toks[chunk_idx * $WindowStride + 1 :
         |    chunk_idx * $WindowStride + $WindowTokens], ' ') AS chunk,
         |  CAST(chunk_idx * $WindowStride AS BIGINT) AS start_tok,
         |  CAST(least(chunk_idx * $WindowStride + $WindowTokens, n_toks) AS BIGINT) AS end_tok
         |FROM win ORDER BY doc_id, chunk_idx""".stripMargin)
}
