package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** p01: the END-TO-END curation pipeline — the composition every
  * training-data run actually executes, as ONE declarative plan:
  *
  *   normalize (t14) → quality band (t06) → exact dedup keep-first
  *   (d01) → eval-set decontamination (t09) → stratified sample (t10)
  *
  * Each stage calls its standalone operator's SHARED builder
  * (graft_nfc/collapseWs, withQualityCols/qualityBand,
  * wordGramRows/ContamGram, samplePredicate/sampleCaseSql), so an
  * edit to a stage's rule reaches the pipeline and the standalone
  * operator together — there is no second copy to drift. The whole
  * chain is one Catalyst plan: Spark fuses the narrow stages
  * (normalize map, quality predicate, sample predicate) into the
  * same scan-side stage, the dedup rank window shuffles once on the
  * text digest, and the decontamination gram join leaves the (small)
  * eval side to AQE's runtime broadcast.
  *
  * Scale notes: the dedup window keys on md5(text) — a production
  * corpus shuffles a 16-byte digest, never megabyte documents, and
  * both engines agree on the hex digest so the oracle restates it
  * verbatim. The eval slice is filtered from the RAW scan before its
  * normalize pass (the predicate pushes into the reader; running the
  * filter above the opaque NFC map would re-normalize the whole
  * corpus a second time just to keep its 1%). Nothing is all-pairs,
  * nothing is collected; the wide exchanges are the digest-keyed
  * window and the gram join's hash shuffle — both narrow keys.
  * Output: surviving docs with their quality metrics (the table a
  * tokenizer consumes next).
  */
object PipelineQueries {

  /** Stage 1 — t14's normalize keeping `lang` for the sample stage
    * (the native graft_nfc expression + the shared whitespace
    * collapse — one codegen'd projection, no object pipeline). */
  private def normStage(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      TextQueries.collapseWs(
        org.apache.spark.sql.graft.NfcNormalize.nfcCol(col("text"))).as("text"))

  /** The STATELESS curation subset (stages 1, 2, 5) as one per-row
    * pass — normalize, quality band, stratified sample are each pure
    * row functions, so this runs at scan speed with no shuffle and
    * works unchanged under read and readStream (st09 is exactly this
    * applied to a stream). The stateful stages — dedup (3) and
    * decontamination (4) — key on content, not on doc_id/lang, and
    * none of the three predicates here depends on which OTHER rows
    * survive, so an ingest can run this first and leave 3-4 to the
    * stateful streaming operators (st04/st06/st08) downstream. */
  def curateStateless(docs: DataFrame): DataFrame =
    TextQueries.withQualityCols(normStage(docs))
      .filter(TextQueries.qualityBand)
      .filter(TextQueries.samplePredicate)
      .select("doc_id", "lang", "n_tokens", "stop_ratio", "quality")

  def p01CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    // Stages 1+2 — normalize, then the t06 quality band on the
    // NORMALIZED text (shared scoring rule + shared predicate).
    val scored = TextQueries.withQualityCols(normStage(docs))
      .filter(TextQueries.qualityBand)

    // Stage 3 — exact dedup, keep-first (d01 rule on the normalized
    // text): one rank window keyed by the 16-byte digest. Runs
    // BEFORE the eval-slice exclusion on purpose: a training doc
    // that exactly duplicates an eval doc must not train.
    val deduped = scored
      .withColumn("rk",
        row_number().over(Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rk") === 1)

    // Stage 4 — decontamination (t09 rule): survivors sharing ANY
    // word-gram with the eval slice drop; the eval slice itself
    // (doc_id % 100 == 0) never trains. Eval grams come from the
    // normalized corpus PRE-quality-filter — a benchmark document is
    // contaminating whether or not it would survive curation.
    val train = deduped.filter(col("doc_id") % 100 =!= 0)
    val evalGrams = TextQueries.wordGramRows(
        normStage(docs.filter(col("doc_id") % 100 === 0)),
        TextQueries.ContamGram, Seq.empty)
      .select("gram").distinct()
    val contaminated = TextQueries.wordGramRows(
        train, TextQueries.ContamGram, Seq(col("doc_id")))
      .join(evalGrams, "gram")
      .select("doc_id").distinct()
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")

    // Stage 5 — deterministic stratified sample (t10's shared predicate).
    clean
      .filter(TextQueries.samplePredicate)
      .select("doc_id", "lang", "n_tokens", "stop_ratio", "quality")
      .orderBy("doc_id")
  }

  /** p02: the CORPUS REPORT CARD — the one-row governance summary a
    * data team reads before (and after) running p01: size and
    * diversity (docs/langs/sources), exact-duplication rate (d01's
    * digest rule: docs beyond the first per md5), mean token count,
    * Gopher pass rate (t21's conjunctive flag), and mean
    * first-occurrence novelty (t22) — each number computed by the
    * standalone operator's SHARED kernel, composed as three 1-row
    * aggregates cross-joined (each a broadcast of one row; the d16
    * lazy-total convention). The whole card is one action over
    * plans Catalyst can share scans across. */
  def p02CorpusReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("dup_docs"),
      round(avg(size(split(col("text"), " "))), 4).as("mean_tokens"))
    val pass = QualityQueries.t21GopherQuality(spark, dir)
      .agg(round(avg(when(col("pass"), 1.0).otherwise(0.0)), 4).as("pass_rate"))
    val nov = QualityQueries.t22GramNovelty(spark, dir)
      .agg(round(avg(col("novelty")), 4).as("mean_novelty"))
    // the TOKEN BUDGET (r11): total BPE tokens under the frozen
    // table via the SHARED t25 kernel — the number a training run
    // is actually sized by, read off the same card
    val bpe = graft.operators.Bpe.encode(docs, graft.operators.Bpe.T25Merges)
      .agg(coalesce(sum(col("n_bpe")), lit(0L)).as("n_bpe_tokens"))
    base.crossJoin(pass).crossJoin(nov).crossJoin(bpe)
      .withColumn("dup_rate",
        round(col("dup_docs").cast("double") / col("n_docs"), 4))
  }

  /** The two deterministic corpus versions p03's entry diffs (so the
    * DuckDB oracle can restate the split): OLD = an earlier crawl
    * missing the doc_id%7 stratum, NEW = the current crawl missing
    * the doc_id%5 stratum — overlapping, with docs exclusive to EACH
    * side, so both the added and the removed legs are non-trivial. */
  private def oldVersion(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 7 =!= 0)
  private def newVersion(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 5 =!= 0)

  /** p03: the CORPUS DIFF — version-over-version governance
    * (VERDICT r10 #7): two corpus versions in, ONE report row out —
    * the review a data team does before promoting a new crawl:
    * volume/diversity deltas (docs, langs, sources), added/removed
    * doc counts, exact-dup-rate movement (d01's md5 rule via the p02
    * formula), mean first-occurrence NOVELTY of the added docs
    * against the old version's gram set (t23's incremental kernel —
    * collapsing novelty ⇒ the new crawl repackages the old one), and
    * the cross-version distinct-5-gram JACCARD (d16's overlap rule —
    * how much raw text the versions actually share). Every number
    * reuses the standalone operator's shared kernel; the card
    * composes as 1-row aggregates cross-joined (the p02 convention —
    * each side a benign single-row broadcast). Hash-green oracle
    * (the full CTE restatement below mirrors t23's gram CTE and
    * d16's gramSql rule). */
  def p03CorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    corpusDiff(spark, oldVersion(docs), newVersion(docs))
  }

  /** The general two-version form — real pipelines diff two
    * materialized corpus snapshots, not slices of one table; both
    * inputs need (doc_id, text, lang, source). */
  def corpusDiff(spark: SparkSession, old: DataFrame, nw: DataFrame): DataFrame = {
    val added = nw.join(old.select("doc_id"), Seq("doc_id"), "left_anti")
    def base(df: DataFrame, sfx: String) = df.agg(
      count(lit(1)).as(s"n_docs_$sfx"),
      countDistinct(col("lang")).as(s"n_langs_$sfx"),
      countDistinct(col("source")).as(s"n_sources_$sfx"),
      round((count(lit(1)) - countDistinct(md5(col("text"))))
        .cast("double") / count(lit(1)), 4).as(s"dup_rate_$sfx"))
    val deltas = added.agg(count(lit(1)).as("n_added"))
      .crossJoin(old.join(nw.select("doc_id"), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_removed")))
    // novelty of the ADDED docs vs the old version — t23's kernel
    // (shared gramRows tokenization, per-doc round-then-avg)
    val oldGrams = QualityQueries.gramRows(old).select("gram").distinct()
    val addedGrams = QualityQueries.gramRows(added)
    val fresh = addedGrams.join(oldGrams, Seq("gram"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
    val nov = addedGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(fresh, Seq("doc_id"), "left")
      .withColumn("novelty", round(
        coalesce(col("n_new"), lit(0L)).cast("double") / col("n_grams"), 4))
      .agg(round(avg(col("novelty")), 4).as("mean_novelty_added"))
    // cross-version overlap — d16's distinct-5-gram Jaccard with
    // |union| by inclusion-exclusion (the union never materializes)
    val a5 = TextQueries.wordGramRows(old.select(col("text")),
      DedupQueries.SourceGram, Seq.empty).select("gram").distinct()
    val b5 = TextQueries.wordGramRows(nw.select(col("text")),
      DedupQueries.SourceGram, Seq.empty).select("gram").distinct()
    val jac = a5.agg(count(lit(1)).as("na"))
      .crossJoin(b5.agg(count(lit(1)).as("nb")))
      .crossJoin(a5.join(b5, "gram").agg(count(lit(1)).as("n_shared")))
      .select(round(col("n_shared") /
        (col("na") + col("nb") - col("n_shared")), 6).as("gram_jaccard"))
    base(old, "old").crossJoin(base(nw, "new"))
      .crossJoin(deltas).crossJoin(nov).crossJoin(jac)
      .withColumn("dup_rate_delta",
        round(col("dup_rate_new") - col("dup_rate_old"), 4))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "p01_curation_pipeline" -> (p01CurationPipeline _),
    "p02_corpus_report" -> (p02CorpusReport _),
    "p03_corpus_diff" -> (p03CorpusDiff _))

  val oracles: Map[String, String] = {
    val g = TextQueries.ContamGram
    val stops = TextQueries.inList(TextQueries.stopwords)
    val g5 = DedupQueries.SourceGram
    Map(
      // p03: the same version split, t23's gram CTE for the added-doc
      // novelty, d16's gramSql rule for the cross-version Jaccard;
      // sums CAST to BIGINT (DuckDB HUGEINT trap), rates/means follow
      // the p02 round conventions exactly.
      "p03_corpus_diff" ->
        s"""WITH old AS (SELECT * FROM documents WHERE doc_id % 7 != 0),
           |nw AS (SELECT * FROM documents WHERE doc_id % 5 != 0),
           |b_old AS (
           |  SELECT count(*) AS n_docs_old, count(DISTINCT lang) AS n_langs_old,
           |    count(DISTINCT source) AS n_sources_old,
           |    round((count(*) - count(DISTINCT md5(text))) * 1.0 / count(*), 4) AS dup_rate_old
           |  FROM old),
           |b_new AS (
           |  SELECT count(*) AS n_docs_new, count(DISTINCT lang) AS n_langs_new,
           |    count(DISTINCT source) AS n_sources_new,
           |    round((count(*) - count(DISTINCT md5(text))) * 1.0 / count(*), 4) AS dup_rate_new
           |  FROM nw),
           |delta AS (
           |  SELECT CAST((SELECT count(*) FROM nw WHERE doc_id NOT IN (SELECT doc_id FROM old)) AS BIGINT) AS n_added,
           |    CAST((SELECT count(*) FROM old WHERE doc_id NOT IN (SELECT doc_id FROM nw)) AS BIGINT) AS n_removed),
           |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |grams AS (
           |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
           |  FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
           |  WHERE len(w) >= 3),
           |hist AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 7 != 0),
           |addg AS (SELECT doc_id, gram FROM grams
           |  WHERE doc_id % 7 = 0 AND doc_id % 5 != 0),
           |novdoc AS (
           |  SELECT doc_id, round(sum(CASE WHEN gram NOT IN (SELECT gram FROM hist)
           |    THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS novelty
           |  FROM addg GROUP BY doc_id),
           |nov AS (SELECT round(avg(novelty), 4) AS mean_novelty_added FROM novdoc),
           |a5 AS (SELECT DISTINCT gram FROM (
           |  ${TextQueries.gramSql(g5, "old", "")})),
           |b5 AS (SELECT DISTINCT gram FROM (
           |  ${TextQueries.gramSql(g5, "nw", "")})),
           |jac AS (
           |  SELECT round((SELECT count(*) FROM a5 JOIN b5 USING (gram)) * 1.0 /
           |    ((SELECT count(*) FROM a5) + (SELECT count(*) FROM b5)
           |      - (SELECT count(*) FROM a5 JOIN b5 USING (gram))), 6) AS gram_jaccard)
           |SELECT n_docs_old, n_langs_old, n_sources_old, dup_rate_old,
           |  n_docs_new, n_langs_new, n_sources_new, dup_rate_new,
           |  n_added, n_removed, mean_novelty_added, gram_jaccard,
           |  round(dup_rate_new - dup_rate_old, 4) AS dup_rate_delta
           |FROM b_old, b_new, delta, nov, jac""".stripMargin,
      // p02: base aggregates + the t21/t22 oracles wrapped as 1-row
      // sub-aggregates — the SAME SQL mirrors the standalone
      // operators use, so the card cannot drift from its parts.
      "p02_corpus_report" ->
        s"""WITH base AS (
           |  SELECT count(*) AS n_docs,
           |    count(DISTINCT lang) AS n_langs,
           |    count(DISTINCT source) AS n_sources,
           |    count(*) - count(DISTINCT md5(text)) AS dup_docs,
           |    round(avg(len(string_split(text, ' '))), 4) AS mean_tokens
           |  FROM documents),
           |pr AS (
           |  SELECT round(avg(CASE WHEN pass THEN 1.0 ELSE 0.0 END), 4) AS pass_rate
           |  FROM (${QualityQueries.oracles("t21_gopher_quality")})),
           |nv AS (
           |  SELECT round(avg(novelty), 4) AS mean_novelty
           |  FROM (${QualityQueries.oracles("t22_gram_novelty")})),
           |bpe AS (
           |  SELECT COALESCE(CAST(sum(n_bpe) AS BIGINT), 0) AS n_bpe_tokens
           |  FROM (${graft.operators.Bpe.t25OracleSql}))
           |SELECT n_docs, n_langs, n_sources, dup_docs, mean_tokens,
           |  pass_rate, mean_novelty, n_bpe_tokens,
           |  round(dup_docs * 1.0 / n_docs, 4) AS dup_rate
           |FROM base, pr, nv, bpe""".stripMargin,
      "p01_curation_pipeline" ->
        s"""WITH norm AS (
           |  SELECT doc_id, lang,
           |    ${TextQueries.NormTextSql} AS text
           |  FROM documents),
           |scored AS (
           |  SELECT doc_id, lang, text,
           |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stops))) AS INT) AS n_stop
           |  FROM norm),
           |q AS (
           |  SELECT doc_id, lang, text, n_tokens,
           |    round(n_stop / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
           |    round(least(n_tokens / 100.0, 1.0) * (1.0 - n_stop / CAST(n_tokens AS DOUBLE)), 4) AS quality
           |  FROM scored),
           |filt AS (
           |  SELECT * FROM q
           |  WHERE n_tokens BETWEEN ${TextQueries.MinTokens} AND ${TextQueries.MaxTokens}
           |    AND stop_ratio <= ${TextQueries.MaxStopRatio}
           |    AND quality >= ${TextQueries.MinQuality}),
           |dedup AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
           |    FROM filt) WHERE rk = 1),
           |train AS (SELECT * FROM dedup WHERE doc_id % 100 != 0),
           |ev AS (
           |  SELECT DISTINCT gram FROM (
           |  ${TextQueries.gramSql(g, "norm WHERE doc_id % 100 = 0", "")})),
           |bad AS (
           |  SELECT DISTINCT t.doc_id FROM (
           |  ${TextQueries.gramSql(g, "train", "doc_id")}) t
           |  JOIN ev USING (gram))
           |SELECT doc_id, lang, n_tokens, stop_ratio, quality
           |FROM train
           |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
           |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < CASE lang ${TextQueries.sampleCaseSql} ELSE '1' END
           |ORDER BY doc_id""".stripMargin)
  }
}
