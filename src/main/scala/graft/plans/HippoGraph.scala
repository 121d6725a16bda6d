package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Batch graph construction: the Spark-first re-expression of the
  * reference's EntityStore graph side (reference storage.py:74-302).
  *
  * The reference mutates an in-memory dict/list one fact at a time;
  * here the whole graph is DECLARED as three DataFrames derived from
  * the corpus in one pass:
  *
  *   facts(fact_id, doc_id, chunk_idx, fact_text, start, end)
  *   edges(fact_id, entity)            — fact↔entity adjacency
  *   entities(entity)                  — derived dim (tiny → broadcast)
  *
  * Deterministic stand-ins for the reference's LLM steps (annotator.py
  * :185 _fact_extractor / :148 _extract_entities): a "fact" is a
  * fixed-size 100-char chunk (same semantics as the naive splitter,
  * splitters.py:46) and an "entity" is a word of length >= minEntityLen
  * appearing in the fact. Both are pure column expressions, so at
  * 100 TB this is a narrow map-side transform — no shuffle at all;
  * fact_id = doc_id*100 + chunk_idx avoids any zipWithIndex/global-
  * ordering dependency and keeps the id ARITHMETIC (h05 derives
  * doc counts from it, and the DuckDB oracle can reproduce it). The
  * scheme is collision-free only for docs < MaxDocChars chars, so
  * oversized docs are EXCLUDED by contract (enforced below, same
  * predicate on the oracle side). Production ingest with unbounded
  * docs is graft.api.Graft.annotate, which uses
  * xxhash64(doc_id, chunk_idx) ids instead.
  */
object HippoGraph {
  val ChunkSize = 100
  val MinEntityLen = 5
  /** Above this, fact_id = doc_id*100 + chunk_idx would collide. */
  val MaxDocChars = 10000

  /** Sentence-grained "facts": fixed 100-char chunks with positions. */
  def facts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .filter(col("n_chars") < MaxDocChars)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), (ceil(col("n_chars") / ChunkSize.toDouble) - 1).cast("int"))))
      .select(
        (col("doc_id") * 100 + col("chunk_idx")).as("fact_id"),
        col("doc_id"), col("chunk_idx"),
        expr(s"substring(text, chunk_idx * $ChunkSize + 1, $ChunkSize)").as("fact_text"),
        (col("chunk_idx") * ChunkSize).as("start"),
        least(col("chunk_idx") * ChunkSize + ChunkSize, col("n_chars")).as("end"))

  /** fact↔entity adjacency: one row per (fact, distinct long word). */
  def edges(spark: SparkSession, dir: String): DataFrame =
    facts(spark, dir)
      .select(col("fact_id"), explode(split(col("fact_text"), " ")).as("entity"))
      .filter(length(col("entity")) >= MinEntityLen)
      .distinct()

  /** Entity dim: every distinct word of length >= 4 in the corpus
    * (superset of linked entities, so pruning h06 is non-trivial). */
  def entityDim(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("entity"))
      .filter(length(col("entity")) >= 4)
      .distinct()

  /** Oracle SQL building blocks (DuckDB) matching the above exactly. */
  val factsSql: String =
    s"""SELECT doc_id * 100 + i AS fact_id, doc_id, i AS chunk_idx,
       |  substr(text, CAST(i AS INT) * $ChunkSize + 1, $ChunkSize) AS fact_text,
       |  i * $ChunkSize AS start,
       |  least(i * $ChunkSize + $ChunkSize, n_chars) AS "end"
       |FROM documents
       |CROSS JOIN unnest(range(0, CAST(ceil(n_chars / $ChunkSize.0) AS BIGINT))) AS t(i)
       |WHERE n_chars < $MaxDocChars""".stripMargin

  val edgesSql: String =
    s"""SELECT DISTINCT fact_id, entity FROM (
       |  SELECT fact_id, unnest(string_split(fact_text, ' ')) AS entity
       |  FROM ($factsSql))
       |WHERE length(entity) >= $MinEntityLen""".stripMargin

  val entityDimSql: String =
    """SELECT DISTINCT entity FROM (
      |  SELECT unnest(string_split(text, ' ')) AS entity FROM documents)
      |WHERE length(entity) >= 4""".stripMargin
}
