package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Published-rule document quality + corpus-novelty signals
  * (SURVEY.md §2, t21–t22) — the filters a web-scale pretraining
  * pipeline runs between raw crawl and the dedup stages.
  *
  * t21 re-expresses the Gopher rule family (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", §A1.1) as ONE codegen'd
  * projection — no UDF, no shuffle: every signal is a higher-order
  * function over the split arrays, so the whole filter runs at scan
  * speed on each executor. t22 is the first-occurrence novelty
  * profile (share of a doc's shingles never seen in any earlier doc)
  * — the freshness/contamination curve used to audit incremental
  * crawl drops; its only shuffles are gram-keyed with map-side
  * combine.
  */
object QualityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Gopher's stopword-presence set (the doc must contain ≥ 2). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** t21 pass-band dials (word-count band tuned to the synthetic
    * corpus's 20–90-word docs; the published 50–100k band would
    * reject everything here — the RULES are Gopher's, the numbers
    * are corpus dials by design). */
  val MinWords = 30L
  val MaxWords = 70L
  /** ≥ 1, not Gopher's ≥ 2: the synthetic vocabulary carries only
    * 'the' from the stop set — the dial keeps the rule informative
    * (it still rejects the 108 stopword-free docs). */
  val MinStopHits = 1L

  /** t21: Gopher-style quality signals per document. All eight
    * signals in one projection over a pruned 2-column scan:
    * word stats, alphabetic-word ratio, stopword-presence count,
    * symbol ('#'/'...') ratio, bullet-start and ellipsis-end line
    * ratios, and the conjunctive pass flag. */
  def t21GopherQuality(spark: SparkSession, dir: String): DataFrame =
    withGopherCols(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select("doc_id", "n_words", "mean_wlen", "alpha_ratio", "stop_hits",
        "symbol_ratio", "bullet_ratio", "ellipsis_ratio", "pass")
      .orderBy("doc_id")

  /** THE Gopher signal computation over ANY frame with a `text`
    * column — one codegen'd projection shared by the t21 entry, p02's
    * pass rate, and st18's streaming report (one formula, one oracle
    * mirror; a rule edit reaches every consumer). */
  private[graft] def withGopherCols(df: DataFrame): DataFrame =
    df
      .withColumn("w", expr("filter(split(text, '\\\\s+'), x -> length(x) > 0)"))
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("mean_wlen", round(
        expr("aggregate(w, 0L, (a, x) -> a + length(x))").cast("double") /
          nullif(col("n_words"), lit(0L)), 4))
      .withColumn("alpha_ratio", round(
        expr("size(filter(w, x -> x rlike '[A-Za-z]'))").cast("double") /
          nullif(col("n_words"), lit(0L)), 4))
      .withColumn("stop_hits", expr(
        s"size(filter(array(${GopherStops.map(s => s"'$s'").mkString(",")}), " +
          "s -> array_contains(transform(w, x -> lower(x)), s)))").cast("long"))
      .withColumn("symbol_ratio", round(
        ((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
          (length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
          .cast("double") / nullif(col("n_words"), lit(0L)), 4))
      .withColumn("bullet_ratio", round(
        expr("size(filter(lines, l -> startswith(ltrim(l), '-') OR " +
          "startswith(ltrim(l), '*') OR startswith(ltrim(l), '•')))").cast("double") /
          size(col("lines")), 4))
      .withColumn("ellipsis_ratio", round(
        expr("size(filter(lines, l -> endswith(rtrim(l), '...') OR " +
          "endswith(rtrim(l), '…')))").cast("double") / size(col("lines")), 4))
      .withColumn("pass",
        col("n_words").between(MinWords, MaxWords) &&
          col("mean_wlen").between(3.0, 10.0) &&
          col("alpha_ratio") >= 0.8 && col("stop_hits") >= MinStopHits &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 && col("ellipsis_ratio") <= 0.3)
      .drop("w", "lines")

  /** t22: word-3-gram novelty per doc — the share of a doc's distinct
    * shingles whose FIRST corpus occurrence (min doc_id) is this doc.
    * Duplicated/boilerplate docs score near 0, fresh content near 1.
    * Per-doc gram dedup happens before the gram-keyed min-agg (both
    * map-side combining); the re-attach is a gram-keyed equi-join —
    * nothing all-pairs, nothing broadcast-O(corpus). */
  /** THE word-3-gram explode t22/t23/st17 share (one formula, one
    * oracle mirror), with caller-chosen passthrough columns — the
    * wordGramRows convention; streaming callers keep (ts, doc_id)
    * and dedup via collect_set instead of the stateful distinct. */
  private[graft] def gramRowsKeyed(docs: DataFrame,
      keep: Seq[org.apache.spark.sql.Column]): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .select(keep :+ explode(expr(
        """CASE WHEN size(w) < 3 THEN array()
          |ELSE transform(sequence(1, size(w) - 2),
          |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
          |END""".stripMargin)).as("gram"): _*)

  /** The distinct (doc_id, gram) form t22/t23 aggregate. */
  private[graft] def gramRows(docs: DataFrame): DataFrame =
    gramRowsKeyed(docs, Seq(col("doc_id"))).distinct()

  def t22GramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = gramRows(Tables.documents(spark, dir))
    val first = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
    grams.join(first, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel").cast("double") / col("n_grams"), 4))
      .orderBy("doc_id")
  }

  /** t23: INCREMENTAL novelty — t22's question for the [history
    * corpus, new ingest batch] split (the d13 convention: history =
    * doc_id%10≠0, batch = doc_id%10=0): what share of each NEW doc's
    * grams has the corpus never seen. The per-batch freshness gate an
    * ingest pipeline runs before accepting a crawl drop (mean
    * novelty collapsing ⇒ the new feed repackages the corpus). The
    * history side reduces to DISTINCT grams before the anti-join —
    * at 100 TB that gram set is a persisted artifact built once per
    * corpus version (the SketchIndex precedent), so each batch pays
    * its own grams + one gram-keyed anti-join sliver, never a
    * history rescan per doc. */
  def t23IncrementalNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val hist = gramRows(docs.filter(col("doc_id") % 10 =!= 0))
      .select("gram").distinct()
    val batch = gramRows(docs.filter(col("doc_id") % 10 === 0))
    val fresh = batch.join(hist, Seq("gram"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
    batch.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(fresh, Seq("doc_id"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("novelty", round(col("n_new").cast("double") / col("n_grams"), 4))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "t21_gopher_quality" -> (t21GopherQuality _),
    "t22_gram_novelty" -> (t22GramNovelty _),
    "t23_incremental_novelty" -> (t23IncrementalNovelty _))

  val oracles: Map[String, String] = Map(
    "t21_gopher_quality" -> {
      val stops = GopherStops.map(s => s"'$s'").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0) AS w,
         |    string_split(text, chr(10)) AS lines
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS n_words,
         |    round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
         |      / nullif(len(w), 0), 4) AS mean_wlen,
         |    round(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
         |      / nullif(len(w), 0), 4) AS alpha_ratio,
         |    CAST(len(list_filter([$stops],
         |      s -> list_contains(list_transform(w, x -> lower(x)), s))) AS BIGINT) AS stop_hits,
         |    round(CAST((length(text) - length(replace(text, '#', ''))) +
         |      (length(text) - length(replace(text, '...', ''))) // 3 AS DOUBLE)
         |      / nullif(len(w), 0), 4) AS symbol_ratio,
         |    round(CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-')
         |      OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS DOUBLE)
         |      / len(lines), 4) AS bullet_ratio,
         |    round(CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
         |      OR ends_with(rtrim(l), '…'))) AS DOUBLE)
         |      / len(lines), 4) AS ellipsis_ratio
         |  FROM base)
         |SELECT *,
         |  (n_words BETWEEN $MinWords AND $MaxWords AND mean_wlen BETWEEN 3.0 AND 10.0
         |   AND alpha_ratio >= 0.8 AND stop_hits >= $MinStopHits AND symbol_ratio <= 0.1
         |   AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3) AS pass
         |FROM sig ORDER BY doc_id""".stripMargin
    },
    "t23_incremental_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
        |  WHERE len(w) >= 3),
        |hist AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 != 0),
        |batch AS (SELECT doc_id, gram FROM grams WHERE doc_id % 10 = 0)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN gram NOT IN (SELECT gram FROM hist)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  round(sum(CASE WHEN gram NOT IN (SELECT gram FROM hist)
        |    THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS novelty
        |FROM batch GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t22_gram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
        |  WHERE len(w) >= 3),
        |first AS (
        |  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) * 1.0
        |    / count(*), 4) AS novelty
        |FROM grams g JOIN first f USING (gram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)
}
