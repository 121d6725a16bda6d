package graft.operators

import graft.plans.Pins.Pinned

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for the LLM-data pipeline (SURVEY.md §2
  * t01–t05): language id, quality scoring, token counting, document
  * fingerprinting, bullet parsing (helpers.py:18 parse_bullet_points).
  *
  * Everything is a narrow per-row column expression (whole-stage
  * codegen, zero shuffle except final presentation ordering) — at
  * 100 TB these run at scan speed.
  */
object TextQueries {

  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("data", "batch", "hash"),
    "es" -> Seq("part", "sort", "merge"),
    "zh" -> Seq("row", "join", "scan"))

  private[graft] val stopwords = Seq("the", "a", "of", "to", "and")

  private[operators] def countIn(words: Seq[String]) = {
    val set = typedLit(words)
    (c: org.apache.spark.sql.Column) =>
      size(filter(split(c, " "), w => array_contains(set, w)))
  }

  /** t01: stopword-profile language scorer. Deterministic argmax with
    * fixed precedence (en > de > es > zh on ties). */
  def t01LangId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val scored = d.select(col("doc_id"), col("lang").as("tagged_lang"),
      countIn(langProfiles("en"))(col("text")).as("s_en"),
      countIn(langProfiles("de"))(col("text")).as("s_de"),
      countIn(langProfiles("es"))(col("text")).as("s_es"),
      countIn(langProfiles("zh"))(col("text")).as("s_zh"))
    scored.withColumn("pred_lang",
        when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_zh")), "en")
          .when(col("s_de") >= greatest(col("s_es"), col("s_zh")), "de")
          .when(col("s_es") >= col("s_zh"), "es")
          .otherwise("zh"))
      .orderBy("doc_id")
  }

  /** The ONE quality-scoring rule t02/t06/p01 share (adds n_tokens,
    * n_stop, stop_ratio, quality to any frame with a `text` column —
    * a formula edit here reaches all three operators AND forces the
    * oracle updates in one place). */
  private[operators] def withQualityCols(df: DataFrame): DataFrame =
    df.withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("n_stop", countIn(stopwords)(col("text")))
      .withColumn("stop_ratio", round(col("n_stop") / col("n_tokens"), 4))
      .withColumn("quality",
        round(least(col("n_tokens") / lit(100.0), lit(1.0)) *
          (lit(1.0) - col("n_stop") / col("n_tokens")), 4))

  /** The ONE survival predicate t06/p01 share. */
  private[operators] def qualityBand: org.apache.spark.sql.Column =
    col("n_tokens").between(MinTokens, MaxTokens) &&
      col("stop_ratio") <= MaxStopRatio &&
      col("quality") >= MinQuality

  /** t02: quality score from length/token/stopword ratios. */
  def t02QualityScore(spark: SparkSession, dir: String): DataFrame =
    withQualityCols(Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars"), col("text")))
      .drop("text")
      .orderBy("doc_id")

  /** t03: whitespace + BPE-ish token counts (integer arithmetic only,
    * so both engines agree exactly: a word of length L yields
    * ceil(L/4) sub-tokens). */
  def t03TokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        expr("CAST(aggregate(transform(split(text, ' '), w -> (length(w) + 3) DIV 4), 0L, (acc, x) -> acc + x) AS BIGINT)")
          .as("bpe_tokens"))
      .orderBy("doc_id")

  /** t04: document fingerprinting — polynomial rolling hash
    * (base 131 mod 1e9+7) of the full text plus 8-gram shingle hash
    * stats (distinct count / min / max), the building block of
    * winnowing-style near-dup detection. */
  def t04Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id",
        // full-document rolling hash
        "aggregate(transform(split(text, ''), c -> ascii(c)), 0L, (acc, c) -> (acc * 131 + c) % 1000000007) AS fp",
        // 8-gram shingle hashes
        """aggregate(
          |  transform(sequence(0, greatest(length(text) - 8, 0)),
          |    i -> aggregate(transform(split(substring(text, i + 1, 8), ''), c -> ascii(c)),
          |                   0L, (acc, c) -> (acc * 131 + c) % 1000000007)),
          |  named_struct('n', cast(0 as long), 'mn', cast(9999999999 as long), 'mx', cast(-1 as long)),
          |  (s, h) -> named_struct('n', s.n + 1, 'mn', least(s.mn, h), 'mx', greatest(s.mx, h)),
          |  s -> s) AS g""".stripMargin)
      .selectExpr("doc_id", "fp", "g.n AS n_grams", "g.mn AS min_gram", "g.mx AS max_gram")
      .orderBy("doc_id")

  /** t05: parse_bullet_points as a Spark op — documents rendered as
    * bullet lists, then parsed back (helpers.py:18). */
  def t05ParseBullets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bullet_text",
        concat(lit("Here are facts:\n- "),
          regexp_replace(col("text"), " ", "\n- ")))
      .select(col("doc_id"),
        expr("regexp_extract_all(bullet_text, '- ([a-z]+)', 1)").as("items"))
      .select(col("doc_id"), size(col("items")).as("n_items"),
        element_at(col("items"), 1).as("first_item"),
        element_at(col("items"), -1).as("last_item"))
      .orderBy("doc_id")

  /** t06: the end-to-end corpus FILTER a training-data pipeline runs
    * before tokenization — length window + stopword-ratio band +
    * quality floor in ONE narrow pass (filters compose into a single
    * codegen'd predicate; at 100 TB this is a scan-speed pre-filter
    * whose predicate pushes into the reader where possible). Emits
    * the surviving docs with their scores. */
  val MinTokens = 20
  val MaxTokens = 10000
  val MaxStopRatio = 0.4
  val MinQuality = 0.5

  def t06QualityFilter(spark: SparkSession, dir: String): DataFrame =
    withQualityCols(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .filter(qualityBand)
      .select("doc_id", "n_tokens", "stop_ratio", "quality")
      .orderBy("doc_id")

  /** t07: corpus-wide token frequencies, top 20 — the vocabulary /
    * stopword-discovery primitive of a data pipeline. One explode +
    * one hash-groupBy with map-side partial aggregation, then
    * TakeOrderedAndProject for the top-k: only per-partition partial
    * counts shuffle, and only 20 rows reach the driver. Ties order
    * deterministically by (count desc, token) on both engines. The
    * sub-linear-memory alternative for heavy-hitters-only at 100 TB
    * is the Misra-Gries FreqSketch aggregator (spec-tested). */
  def t07TopTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** t07's Misra-Gries counter budget (the sketch-HALF dial — the
    * ≤ n/k error-bound spec in AggregatorSpec runs at this k). */
  val T07bSketchK = 50

  /** t07b's two-pass CANDIDATE budget: pass-1 Misra-Gries counters.
    * Memory is O(budget) regardless of vocabulary (the point at
    * 100 TB, where the vocab itself doesn't fit a hash aggregate);
    * the undercount bound D = (n − Σ sketch)/budget shrinks as the
    * budget grows, so a bigger budget widens the distributions whose
    * top-20 VERIFIES exact. 4096 counters ≈ 100 KB — three orders of
    * magnitude under one executor's aggregation hash map. */
  val T07bCandidateK = 4096

  /** t07b: VERIFIED-EXACT top tokens at BOUNDED memory — the r12
    * verdict's two-pass upgrade of the plain Misra-Gries entry,
    * which went honestly lossy at sf1.0 (vocab 292 > k=50).
    * See [[twoPassTopTokens]] for the machinery and the proof
    * obligation; this entry shares t07's DuckDB oracle at EVERY SF
    * because the verification either certifies exactness or the
    * operator falls back to the exact aggregation. The raw
    * sketch-half (FreqSketch at [[T07bSketchK]], ≤ n/k undercount)
    * keeps its own AggregatorSpec pins. */
  def t07bTopTokensSketch(spark: SparkSession, dir: String): DataFrame =
    twoPassTopTokens(spark,
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= ""),
      k = 20, budget = T07bCandidateK)

  /** TWO-PASS VERIFIED-EXACT top-k over a token relation (VERDICT
    * r12 #6): pass 1 runs the Misra-Gries sketch at `budget`
    * counters (the shuffle carries O(budget) entries, never the
    * vocabulary); pass 2 exact-counts ONLY the sketch's candidates —
    * `≤ budget+1` groups: the candidate tokens plus one catch-all
    * NULL bucket whose count completes the total stream length n
    * without a separate pass. The mergeable-summaries bound
    * (Agarwal et al. 2013: MG merges preserve undercount ≤
    * (n − Σ sketch counts)/budget) makes the result PROVABLE: every
    * token absent from the candidate set has true count ≤ D, so when
    * the k-th candidate's EXACT count strictly exceeds D (or D = 0,
    * i.e. the sketch never evicted) the candidate top-k is the true
    * top-k — ties included, since an absent token cannot even reach
    * the k-th count. The certificate is COMPUTED per run, never
    * assumed. A distribution too flat for the budget (near-uniform
    * streams admit no sublinear exact top-k — information-theoretic,
    * not an implementation limit) falls back to the exact full
    * aggregation instead of serving a lossy answer. Pass 2 pins its
    * one execution via localCheckpoint: the certificate reads the
    * collected ≤ budget+1 counts (bounded by the dial) and the
    * returned plan re-reads the same executor blocks. */
  private[graft] def twoPassTopTokens(spark: SparkSession, toks: DataFrame,
      k: Int, budget: Int): DataFrame = {
    import spark.implicits._
    val cands: Seq[(String, Long)] = toks.select(col("token")).as[String]
      .select(new graft.functions.FreqSketch(budget).toColumn.name("top"))
      .head()
    val candSet = cands.map(_._1)
    val sketchSum = cands.map(_._2).sum
    val exact = toks
      .groupBy(when(col("token").isin(candSet: _*), col("token")).as("token"))
      .agg(count(lit(1)).as("n"))
      .pinned
    val rows = exact.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getString(0)), r.getLong(1)))
    val n = rows.map(_._2).sum
    val d = if (budget > 0) (n - sketchSum) / budget else 0L
    val exactCands = rows.collect { case (Some(t), c) => (t, c) }
      .sortBy { case (t, c) => (-c, t) }
    val verified = d == 0L || (exactCands.length >= k && exactCands(k - 1)._2 > d)
    if (verified)
      exact.filter(col("token").isNotNull)
        .orderBy(col("n").desc, col("token"))
        .limit(k)
    else
      // documented degrade, still EXACT: the certificate failed, so
      // the answer comes from the full aggregation (unbounded vocab
      // memory — the price of exactness on a flat distribution)
      toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(k)
  }

  /** t08: within-document REPETITION signals — the Gopher-style
    * quality filters (Rae et al. 2021 §A1.1: duplicate-token and
    * top-n-gram fractions; this corpus has no newlines, so the
    * line/paragraph variants of the same rule family are moot).
    * Token stats are a narrow per-row pass; top-n-gram counts are
    * explode → (doc_id, gram) hash-groupBy with map-side partial
    * aggregation → per-doc max — everything keyed by doc, linear at
    * 100 TB (per-doc HOF counting would be O(len²) per document and
    * blow up on long docs; the explode keeps it O(len)). */
  /** Shared n-word-gram explode: (keep..., gram) rows over the
    * whitespace-tokenized `text` column — the ONE tokenization/gram
    * rule t08, t09 and st06 (stream form) must agree on; a drift
    * here is a silent batch/stream parity break. */
  def wordGramRows(df: DataFrame, n: Int,
      keep: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withColumn("toks", filter(split(col("text"), " "), w => w =!= ""))
      .filter(size(col("toks")) >= n)
      .select(keep :+ explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> array_join(slice(toks, i, $n), ' '))")).as("gram"): _*)

  def t08Repetition(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val base = d
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("ts"))
      .select(col("doc_id"),
        size(col("ts")).as("n_tokens"),
        size(array_distinct(col("ts"))).as("n_distinct"))
    def topGram(n: Int): DataFrame = wordGramRows(d, n, Seq(col("doc_id")))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as(s"top${n}_n"))
    base
      .join(topGram(2), Seq("doc_id"), "left")
      .join(topGram(3), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        // n_tokens guard: ANSI mode (Spark 4 default) makes 0/0
        // THROW, and an empty doc legitimately has 0 tokens —
        // define its duplicate fraction as 0 (nothing duplicated).
        when(col("n_tokens") > 0,
          round(lit(1.0) - col("n_distinct") / col("n_tokens"), 4))
          .otherwise(0.0).as("dup_word_frac"),
        coalesce(col("top2_n"), lit(0L)).as("top2_n"),
        when(col("n_tokens") >= 2,
          round(col("top2_n") / (col("n_tokens") - 1), 4)).otherwise(0.0).as("top2_frac"),
        coalesce(col("top3_n"), lit(0L)).as("top3_n"),
        when(col("n_tokens") >= 3,
          round(col("top3_n") / (col("n_tokens") - 2), 4)).otherwise(0.0).as("top3_frac"))
      .orderBy("doc_id")
  }

  /** t09: eval-set DECONTAMINATION — the n-gram overlap check every
    * training pipeline runs against its benchmark suite (GPT-3 §C /
    * PaLM-style 5-gram collision test). The "eval set" here is the
    * deterministic doc_id % 100 == 0 slice standing in for a
    * benchmark table; a training doc is flagged with the number of
    * distinct 5-word-grams it shares with ANY eval doc and how many
    * eval docs it hits. Both sides reduce to narrow (doc, gram)
    * rows; the join key is the gram string and the eval side is
    * tiny relative to the corpus, so AQE broadcasts it at runtime
    * (no hint — the d02 precedent). Nothing is all-pairs: cost is
    * linear in corpus grams.
    *
    * Gram size is calibrated to the corpus: real pipelines use 8-13
    * word grams on natural text; this synthetic ~40-word vocabulary
    * makes exact 5-gram collisions vanishingly rare (0 hits at
    * sf0.01), so 3 keeps the operator's output non-trivial (148/495
    * docs flagged) while staying selective (2-grams flag 99%). */
  val ContamGram = 3

  def t09Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminate(
      docs.filter(col("doc_id") % 100 =!= 0),
      docs.filter(col("doc_id") % 100 === 0),
      ContamGram)
  }

  /** t09 against a USER-SUPPLIED eval table — the general form: real
    * pipelines bring their own benchmark suite as a DataFrame, not a
    * corpus slice (the entry above keeps the doc_id%100 slice so the
    * DuckDB oracle can restate it). Both inputs need (doc_id, text);
    * output = every training doc sharing ≥ 1 word-`gram` with any
    * eval doc, with the shared-gram and eval-doc counts. Same plan
    * shape as the entry: narrow (doc, gram) rows both sides, the
    * gram-keyed join leaves the (small) eval side to AQE's runtime
    * broadcast — linear in corpus grams. */
  def decontaminate(train: DataFrame, evalDocs: DataFrame,
      gram: Int = ContamGram): DataFrame = {
    val grams = wordGramRows(train, gram, Seq(col("doc_id")))
    val evalGrams = wordGramRows(evalDocs, gram, Seq(col("doc_id")))
      .select(col("doc_id").as("eval_doc"), col("gram")).distinct()
    grams
      .join(evalGrams, "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("eval_doc")).as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** t10: deterministic STRATIFIED downsampling — the data-mixing
    * step that reweights a corpus by stratum (language here; domain
    * in production). Membership is a pure function of the row:
    * md5(doc_id) rendered as hex, first nibble compared against the
    * stratum's threshold — so the sample is reproducible across
    * engines, clusters and reruns, needs NO stored random state, and
    * is a scan-speed codegen'd predicate (no shuffle; at 100 TB this
    * composes with t06 into the same single pass). Rates: nibble <
    * threshold out of 16. */
  val SampleThresholds: Map[String, String] =
    Map("en" -> "c", "de" -> "8", "es" -> "6", "zh" -> "4", "fr" -> "2")

  /** The ONE sampling rule t10/p01 share (threshold fold, the bucket
    * coin, the assembled predicate, and the oracle CASE expression —
    * all alongside so none can drift independently). */
  private[operators] def sampleThresholdCol: org.apache.spark.sql.Column =
    SampleThresholds.foldLeft(lit("1")) { case (acc, (l, t)) =>
      when(col("lang") === l, lit(t)).otherwise(acc)
    }

  private[operators] def sampleBucketCol: org.apache.spark.sql.Column =
    substring(md5(col("doc_id").cast("string")), 1, 1)

  private[operators] def samplePredicate: org.apache.spark.sql.Column =
    sampleBucketCol < sampleThresholdCol

  private[operators] def sampleCaseSql: String =
    SampleThresholds.toSeq.sorted
      .map { case (l, t) => s"WHEN '$l' THEN '$t'" }.mkString(" ")

  def t10StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", sampleBucketCol)
      // filter on the COLUMN so the md5 coin evaluates once per row
      // (the raw predicate references only doc_id/lang and would be
      // pushed below the projection, hashing every row twice)
      .filter(col("bucket") < sampleThresholdCol)
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")

  /** t13: per-language CORPUS REPORT — the data-card summary every
    * curation pipeline publishes (counts, size and token-length
    * distribution per stratum). One map-side pass for the per-doc
    * columns, one (lang)-keyed agg; the exact median uses the same
    * TypedImperativeAggregate percentile q13 anchors (groups =
    * languages, so the per-group buffer is bounded by the stratum's
    * doc count — the q13b sketch swap applies verbatim if strata
    * grow unbounded). */
  def t13LangReport(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        round(expr("percentile(n_tokens, 0.5)"), 4).as("median_tokens"))
      .orderBy("lang")

  /** t12: UNIGRAM LOG-PROBABILITY scoring — the perplexity-filter
    * family of quality scores (CCNet/RedPajama filter on LM
    * perplexity; the unigram LM is its degenerate-but-distributable
    * core, trained on the corpus itself). Per doc: mean ln p(token)
    * under the corpus unigram distribution — low scores = rare-token
    * soup (boilerplate, garbled text), high = stopword soup; real
    * pipelines band-pass it like t06's stop_ratio.
    *
    * Shape at 100 TB: vocab = one map-side-combining token groupBy;
    * the corpus total rides along as a LAZY 1-row broadcast (no
    * eager count action); scoring joins tokens to vocab KEYED BY
    * TOKEN (a production vocab is millions of rows — never assume it
    * broadcasts; AQE may still choose to at runtime) and reduces per
    * doc with map-side partials. Everything is linear, nothing is
    * collected. */
  def t12UnigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), w => w =!= "")).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = vocab.groupBy().agg(sum("cnt").as("total"))
    toks.join(vocab, "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("cnt") / col("total"))), 4).as("logprob"))
      .orderBy("doc_id")
  }

  /** t17: TF-IDF KEYWORD EXTRACTION — the classic per-document
    * salient-term signal (Salton & Buckley 1988): score(t, d) =
    * tf(t,d) · ln(N / df(t)), top 3 terms per document. What a
    * curation pipeline uses for topic tagging, cluster naming and
    * domain-mix reporting — the inverse of t07's corpus-global view
    * (t07 finds what's common everywhere; t17 finds what makes each
    * document DIFFERENT from everywhere).
    *
    * Shape at 100 TB: tf is one map-side-combining groupBy over the
    * token explosion; df derives from the already-reduced tf relation
    * (never a second corpus pass); N is a lazy 1-row broadcast (the
    * t12 convention); scoring joins KEYED BY TERM (a web-scale vocab
    * is billions of terms — never assumed broadcast); the top-3 is a
    * row_number window partitioned by doc_id — high-cardinality key,
    * and the rank<=3 filter lets Spark run it as WindowGroupLimit so
    * map-side tasks emit at most 3 rows per doc. Scores are ROUNDED
    * BEFORE ranking (the t16 lesson: both engines must order
    * identical doubles), ties by term. */
  def t17Tfidf(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), w => w =!= "")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir)
      .groupBy().agg(count(lit(1)).cast("double").as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("doc_id", "term", "rnk", "tfidf")
      .orderBy("doc_id", "rnk")
  }

  /** t15: BIGRAM LOG-PROBABILITY scoring — one step up the
    * perplexity-filter ladder from t12's unigram LM (CCNet filters
    * on a 5-gram KenLM; the bigram conditional P(w₂|w₁) =
    * c(w₁w₂)/c(w₁·) is the smallest model that sees word ORDER, so
    * shuffled-token soup scores low here while passing t12). Trained
    * on the corpus itself like t12, so every scored bigram has
    * count ≥ 1 and no smoothing mass is needed; per doc the score is
    * mean ln P over its bigrams. Sub-2-token docs have no bigrams
    * and are absent (the t12 empty-doc convention).
    *
    * Shape at 100 TB: bigrams explode via the SHARED wordGramRows
    * kernel (one tokenization rule with t08/t09/st06); the bigram
    * vocab is one map-side-combining groupBy; the prefix totals
    * c(w₁·) derive from the (already reduced) vocab, not from the
    * corpus; scoring joins KEYED BY GRAM (a production bigram vocab
    * is billions of rows — never assume broadcast) and reduces per
    * doc map-side. Linear, nothing collected. */
  /** The bigram LM trained on `docs`: (gram, ln P(w₂|w₁)) — t15's
    * model stage, shared with the streaming scorer (st10) so batch
    * and ingest-time scoring use ONE estimation rule. Two map-side-
    * combining aggs; the prefix totals reduce the already-small
    * vocab, never the corpus. */
  private[graft] def bigramModel(docs: DataFrame): DataFrame = {
    val vocab = wordGramRows(docs, 2, Seq.empty)
      .groupBy("gram").agg(count(lit(1)).as("cb"))
      .withColumn("w1", split(col("gram"), " ").getItem(0))
    val prefix = vocab.groupBy("w1").agg(sum("cb").as("cw"))
    vocab.join(prefix, "w1")
      .select(col("gram"), log(col("cb") / col("cw")).as("lp"))
  }

  def t15BigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    // one parquet split at test SF — parallelize the two tokenize
    // passes (scoring + model); the identical repartition exchange is
    // planned once via ReuseExchange. Conditional (Par): a many-split
    // scan at scale skips the exchange outright.
    val docs = graft.plans.Par.ensureParallelism(Tables.documents(spark, dir))
    wordGramRows(docs, 2, Seq(col("doc_id")))
      .join(bigramModel(docs), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("logprob"))
      .orderBy("doc_id")
  }

  /** SQL-ntile bucket for 0-based rank r of n rows into k buckets:
    * first n%k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋ — the exact
    * ntile() rule both engines implement. */
  private def ntileOf(r: Long, n: Long, k: Int): Int = {
    val base = n / k; val rem = n % k
    val b =
      if (base == 0) r + 1
      else if (r < rem * (base + 1)) r / (base + 1) + 1
      else rem + (r - rem * (base + 1)) / base + 1
    b.toInt
  }

  /** t16: PERPLEXITY BUCKETING — CCNet's head/middle/tail split
    * (Wenzek et al. 2020 §4.3): within each language, rank documents
    * by LM score and cut into terciles; curation then keeps "head"
    * (most in-distribution), samples "middle", drops or down-weights
    * "tail". The score is the shared t15 bigram-LM kernel
    * (bigramModel — one estimation rule with t15/st10), ROUNDED to
    * the oracle precision BEFORE ranking so both engines order
    * identical doubles (t15's green hash gate is what licenses
    * this); ties break by doc_id. Sub-2-token docs have no bigrams
    * and are absent, the t12/t15 convention.
    *
    * The scale-defining choice: exact per-lang ntile WITHOUT
    * `Window.partitionBy(lang)` — that window funnels each
    * language's whole corpus through ONE task (the q13 buffer
    * lesson; a real corpus is 40% one language). Instead the t11
    * two-pass prefix machinery, generalized per-group:
    * range-repartition by the rank key (lang, -logprob, doc_id),
    * pass 1 reduces each partition to per-lang counts (O(partitions
    * × langs) driver traffic), pass 2 streams each partition once
    * with broadcast rank offsets and emits the position-exact ntile
    * bucket. Per-row work is O(1), no per-lang funnel, and the
    * result is partitioning-invariant because range partitions are
    * ordered and disjoint. */
  def t16PplBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one parquet split at test SF — parallelize the tokenize passes
    // (the t15 note; conditional, skipped at scale)
    val docs = graft.plans.Par.ensureParallelism(Tables.documents(spark, dir))
    val rows = wordGramRows(docs, 2, Seq(col("doc_id")))
      .join(bigramModel(docs), "gram")
      .groupBy("doc_id")
      .agg(round(avg(col("lp")), 4).as("logprob"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("logprob"))
      .repartitionByRange(col("lang"), col("logprob").desc, col("doc_id"))
      .sortWithinPartitions(col("lang"), col("logprob").desc, col("doc_id"))
      .as[(Long, String, Double)]
    // Both passes share ONE RDD object: the range-partitioner bounds
    // are sampled once, so pass-2 rows sit exactly where pass 1
    // counted them (the t11 invariant).
    val rdd = rows.rdd
    val partCounts = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (_, lang, _) => m.update(lang, m.getOrElse(lang, 0L) + 1L) }
      Iterator((i, m.toMap))
    }.collect().sortBy(_._1).map(_._2)
    val running = scala.collection.mutable.Map.empty[String, Long]
    val offsets = partCounts.map { m =>
      val snap = running.toMap
      m.foreach { case (l, c) => running.update(l, running.getOrElse(l, 0L) + c) }
      snap
    }
    val totals = running.toMap
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTot = spark.sparkContext.broadcast(totals)
    rdd.mapPartitionsWithIndex { (i, it) =>
      val off = bcOff.value(i)
      var curLang: String = null
      var r = 0L
      it.map { case (id, lang, lp) =>
        if (lang != curLang) { curLang = lang; r = off.getOrElse(lang, 0L) }
        val b = ntileOf(r, bcTot.value(lang), 3)
        r += 1
        (id, lang, lp, b)
      }
    }.toDF("doc_id", "lang", "logprob", "b")
      .withColumn("bucket",
        when(col("b") === 1, "head").when(col("b") === 2, "middle")
          .otherwise("tail"))
      .select("doc_id", "lang", "logprob", "bucket")
      .orderBy("doc_id")
  }

  /** t11: SEQUENCE PACKING — the concat-and-chunk step that turns a
    * tokenized corpus into fixed-length training sequences (GPT-style
    * packing: documents concatenated in doc_id order, sliced every
    * `SeqBudget` tokens; a doc straddling a slice boundary spans
    * multiple sequences). Emits each doc's first/last sequence id and
    * span count.
    *
    * The global running token total is a distributed TWO-PASS prefix
    * sum — NOT a single-partition window (a global `Window.orderBy`
    * funnels 100 TB through one task): range-repartition by doc_id,
    * pass 1 reduces each partition to one subtotal (only
    * O(partitions) longs reach the driver), pass 2 streams each
    * partition once more adding its broadcast offset. Per-row work is
    * O(1); the result is partitioning-invariant because range
    * partitions are ordered and disjoint. */
  val SeqBudget = 2048L

  def t11PackSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("CAST(aggregate(transform(split(text, ' '), w -> (length(w) + 3) DIV 4), 0L, (acc, x) -> acc + x) AS BIGINT)")
          .as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
    // NOT cached: each pass scans the (narrow, cheap) token
    // projection once — at 100 TB caching the corpus between the two
    // passes is not an option, and an RDD cache survives
    // spark.catalog.clearCache() (it would leak across Bench's
    // between-run isolation). Both passes share ONE RDD object, so
    // the range-partitioner bounds are computed once and identical.
    val rdd = toks.rdd
    val partSums = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.map(_._2).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val s = SeqBudget
    rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets.value(i)
      it.map { case (id, t) =>
        cum += t
        // floorDiv, not `/`: the oracle's `//` floors, and Scala `/`
        // truncates toward zero — they differ exactly on the
        // zero-token-doc edge ((cum-1) with cum == 0). Positive
        // token counts are unaffected.
        (id, t, Math.floorDiv(cum - t, s), Math.floorDiv(cum - 1, s))
      }
    }.toDF("doc_id", "n_tokens", "first_seq", "last_seq")
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .orderBy("doc_id")
  }

  /** t14: UNICODE NORMALIZATION — the canonicalization pass curation
    * pipelines run BEFORE any hashing/dedup/fingerprint step:
    * decomposed "e + COMBINING ACUTE" and precomposed "é" must hash
    * identically or every hash-keyed operator (d01/d02/d08/t04)
    * silently treats equal texts as distinct. NFC (UAX #15) +
    * whitespace-run collapse + trim + code-point recount.
    *
    * NFC has no Spark builtin, so it runs as the NATIVE graft_nfc
    * expression (NfcNormalize — java.text.Normalizer implements the
    * same UAX #15 tables DuckDB's nfc_normalize does, so the engines
    * agree exactly) with an isNormalized fast path that returns the
    * input UTF8String unchanged for already-NFC text. The whole
    * operator is one codegen'd projection over a pruned scan, zero
    * shuffle — linear at 100 TB. */
  def t14Normalize(spark: SparkSession, dir: String): DataFrame =
    normalize(Tables.documents(spark, dir))

  /** Whitespace-run collapse shared by t14/p01 and their oracles — an
    * EXPLICIT ASCII class, not `\s`: Java's `\s` matches U+000B
    * (vertical tab) while RE2's (DuckDB's engine) does not, so `\s`
    * on both sides silently diverges on real scraped text and the
    * cross-engine hash gate — and worse, cross-engine dedup keys —
    * break on the first document carrying a VT. */
  private[operators] val WsRun = "[ \\t\\n\\x0B\\f\\r]+"
  private[operators] val NormTextSql =
    """trim(regexp_replace(nfc_normalize(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"""
  private[operators] def collapseWs(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(c, WsRun, " "))

  /** General form over any (doc_id, text) frame. NFC runs as the
    * native graft_nfc expression (NfcNormalize), so the whole
    * normalize is ONE codegen'd projection over the scan — no
    * object pipeline, no stage split. */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        collapseWs(org.apache.spark.sql.graft.NfcNormalize.nfcCol(col("text")))
          .as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
      .orderBy("doc_id")

  /** t18 ranks fitted: the Zipf regression uses the top-R tokens per
    * language (the law holds in the head; the tail is lexicon noise). */
  val ZipfTopRanks = 50

  /** t18: ZIPF FIT per language — regress ln(freq) on ln(rank) over
    * each language's top-[[ZipfTopRanks]] tokens: slope ≈ −1 is
    * healthy natural text (Zipf 1949), a flat slope flags synthetic /
    * shuffled / template corpora and a cliff flags boilerplate
    * floods. The corpus-health dashboard number next to t13's volume
    * report and t16's perplexity terciles.
    *
    * Scale shape: token frequencies are one map-side-combining
    * explode+groupBy (the t07 kernel, keyed per lang); the per-lang
    * top-R is a row_number window whose rank<=R filter runs as
    * WindowGroupLimit — map-side tasks emit at most R rows per lang
    * BEFORE the shuffle, so the low-cardinality lang key never
    * funnels a language's full vocabulary through one task (the t17
    * pattern; a real corpus is ~40% one language). The regression
    * reduces ≤ R rows per lang with regr_slope/regr_r2 — builtin
    * declarative aggs, map-side combined, no collect. */
  def t18ZipfFit(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("lang"),
        explode(filter(split(col("text"), " "), w => w =!= "")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("token"))
    tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ZipfTopRanks)
      .groupBy("lang")
      .agg(count(lit(1)).cast("int").as("n_top"),
        round(regr_slope(log(col("cnt")), log(col("rk"))), 4).as("zipf_slope"),
        round(regr_r2(log(col("cnt")), log(col("rk"))), 4).as("zipf_r2"))
      .orderBy("lang")
  }

  /** t19: TOKEN-DISTRIBUTION ENTROPY per document — Shannon entropy
    * of the doc's unigram distribution, H = ln(T) − (Σ c·ln c)/T,
    * plus the [0,1]-normalized form H/ln(D) (D = distinct tokens).
    * The lexical-diversity quality signal that catches what t08's
    * top-gram fractions don't: a doc cycling through a 3-word
    * template scores high on distinctness ratios while its entropy
    * stays pinned near ln(3) — low entropy flags templated/spammy
    * text, maximal entropy (norm ≈ 1) flags uniform token soup, and
    * natural prose sits in between. A standard corpus-filter feature
    * beside perplexity (t15) in data-quality stacks.
    *
    * Scale shape: one explode → (doc_id, token) map-side-combining
    * count, one doc-keyed reduction of ≤ D rows per doc — linear,
    * no joins wider than the per-doc token table, same as t08. Float
    * parity: H computed as ln(T) − (Σ c·ln c)/T in the SAME op
    * order both engines (integer counts, one double sum inside the
    * bounded per-doc group — the h10 convention); single-token docs
    * (D ≤ 1) pin H = 0.0 exactly rather than risk a ±1-ulp −0.0
    * crossing the round-6 boundary. Token-less docs keep a row with
    * zeros via the left join (the t08 empty-doc convention). */
  def t19TokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val cnt = d
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), w => w =!= "")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val stats = cnt.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("c") * log(col("c"))).as("sclc"))
    val hRaw = log(col("n_tokens")) - col("sclc") / col("n_tokens")
    d.select("doc_id").join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(col("n_distinct") > 1, round(hRaw, 6)).otherwise(0.0).as("entropy"),
        when(col("n_distinct") > 1, round(hRaw / log(col("n_distinct")), 6))
          .otherwise(0.0).as("norm_entropy"))
      .orderBy("doc_id")
  }

  /** A deterministic 32-bit uniform in (0,1) from md5(doc_id): the
    * first 8 hex nibbles fold into an exact integer via ascii
    * arithmetic (no hex-parse builtin, no libm — both engines execute
    * the identical integer fold), then ONE division. The weighted
    * extension of t10's md5-nibble coin; `md5UniformSql` is its
    * one-rule SQL mirror. */
  private[operators] def md5UniformCol: org.apache.spark.sql.Column = {
    val hx = md5(col("doc_id").cast("string"))
    def nibVal(i: Int) = {
      val c = substring(hx, i, 1)
      ascii(c) - when(c <= "9", 48).otherwise(87)
    }
    val h = (2 to 8).foldLeft(nibVal(1).cast("long"))((acc, i) => acc * 16 + nibVal(i))
    (h.cast("double") + 0.5) / 4294967296.0
  }

  private[graft] def md5UniformSql: String = {
    def nib(i: Int) =
      s"(ascii(substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - CASE WHEN " +
        s"substr(md5(CAST(doc_id AS VARCHAR)), $i, 1) <= '9' THEN 48 ELSE 87 END)"
    val h = (2 to 8).foldLeft(s"CAST(${nib(1)} AS BIGINT)")(
      (acc, i) => s"($acc * 16 + ${nib(i)})")
    s"((CAST($h AS DOUBLE) + 0.5) / 4294967296.0)"
  }

  val WeightedSampleK = 50

  /** t26 dial: the keep fraction of the LARGEST source (the anchor
    * of the temperature-flattened mix). LITERAL (the v12 rule). */
  val MixKeepMax = 0.5

  /** t26: TEMPERATURE-FLATTENED SOURCE MIXTURE — the data-mixing
    * primitive of LLM corpus assembly (GPT-3/LLaMA style: sample
    * sources at n_s^α, α < 1, so the crawl whale stops drowning the
    * small curated sources): per-source keep fraction
    * f_s = min(1, MixKeepMax·sqrt(n_max/n_s)), which makes the
    * expected kept count ∝ sqrt(n_s) — exactly the α = 0.5
    * temperature shape — anchored at keeping [[MixKeepMax]] of the
    * largest source. Membership is the t10/t20 md5 coin
    * (u(doc_id) < f_s): deterministic, engine-reproducible, no
    * stored state.
    *
    * Float-parity design: α is FIXED at 0.5 because sqrt is
    * correctly rounded in IEEE (identical in both engines) where
    * pow's libm rounding is not (the t20 lesson), and the anchor is
    * max(n_s) — an exact integer — rather than a Σ n_s^α
    * normalizer, so NO cross-source float summation exists anywhere
    * (a float Σ would be summation-order-dependent and could flip a
    * boundary doc). f_s is one division + one sqrt + one multiply:
    * bit-identical cross-engine, so the kept SET is exact and the
    * output carries no floats at all.
    *
    * Scale shape: one source-keyed count agg (tiny), the per-source
    * fractions broadcast back, and membership is a scan-speed
    * codegen'd predicate — no shuffle of the corpus. */
  def t26SourceMixture(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val c = d.groupBy("source").agg(count(lit(1)).as("n_s"))
    val m = c.agg(max("n_s").as("mx"))
    val f = c.crossJoin(broadcast(m))
      .withColumn("f", least(lit(1.0),
        lit(MixKeepMax) * sqrt(col("mx").cast("double") / col("n_s"))))
      .select("source", "f")
    d.join(broadcast(f), "source")
      .filter(md5UniformCol < col("f"))
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** t20: WEIGHTED sampling without replacement — top-[[WeightedSampleK]]
    * documents by the Efraimidis-Spirakis key u^(1/w) (A-ES,
    * Efraimidis & Spirakis 2006), weight w = n_chars: each document's
    * inclusion probability is proportional to its SIZE, the "sample
    * tokens, not documents" correction every corpus-mixing recipe
    * needs (a uniform doc sample over-represents short documents by
    * orders of magnitude). Ranked in the ln form ln(u)/w — the same
    * ordering, no pow() (whose libm rounding differs across
    * platforms).
    *
    * Scale shape: u is the scan-speed md5 fold (shared rule with
    * t10's stratified coin — reproducible across engines, clusters
    * and reruns with NO stored random state), the weight is a stored
    * column, and the top-k is TakeOrderedAndProject over a pruned
    * 3-column scan: no shuffle, no sort of the corpus, k rows to the
    * driver. Composable with t10 (stratify, then weight within
    * stratum). Zero-length docs carry zero weight and are excluded
    * (1/w undefined), mirrored in the oracle. */
  def t20WeightedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (log(md5UniformCol) / col("n_chars")).as("raw"))
      .orderBy(col("raw").desc, col("doc_id"))
      .limit(WeightedSampleK)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        // + 0.0 normalizes the SIGN OF ZERO: a raw of -3e-15 rounds
        // to 0.0 here (BigDecimal drops the sign) but to -0.0 in
        // DuckDB — stringified "-0.0" != "0.0" broke the sf1.0
        // compare; IEEE -0.0 + 0.0 = +0.0 on both engines.
        (round(col("raw"), 9) + lit(0.0)).as("es_key"))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "t20_weighted_sample" -> (t20WeightedSample _),
    "t26_source_mixture" -> (t26SourceMixture _),
    "t19_token_entropy" -> (t19TokenEntropy _),
    "t18_zipf_fit" -> (t18ZipfFit _),
    "t14_normalize" -> (t14Normalize _),
    "t01_lang_id" -> (t01LangId _),
    "t02_quality_score" -> (t02QualityScore _),
    "t03_token_count" -> (t03TokenCount _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_parse_bullets" -> (t05ParseBullets _),
    "t06_quality_filter" -> (t06QualityFilter _),
    "t07_top_tokens" -> (t07TopTokens _),
    "t07b_top_tokens_sketch" -> (t07bTopTokensSketch _),
    "t08_repetition" -> (t08Repetition _),
    "t09_decontaminate" -> (t09Decontaminate _),
    "t10_stratified_sample" -> (t10StratifiedSample _),
    "t11_pack_sequences" -> (t11PackSequences _),
    "t12_unigram_logprob" -> (t12UnigramLogprob _),
    "t15_bigram_logprob" -> (t15BigramLogprob _),
    "t16_ppl_buckets" -> (t16PplBuckets _),
    "t17_tfidf" -> (t17Tfidf _),
    "t13_lang_report" -> (t13LangReport _))

  private[operators] def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
  private[operators] def sqlCount(wsList: String) =
    s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($wsList))) AS INT)"

  /** The ONE SQL restatement of wordGramRows (tokenize + n-word-gram
    * explode), shared by every gram-shaped oracle (t08/t09/t15 here,
    * p01 in PipelineQueries) — wordGramRows declares tokenization
    * "the ONE rule"; its SQL mirror must be one rule too. `src` is
    * any relation (optionally with a WHERE clause) carrying a `text`
    * column; `keep` is an optional projected column. */
  private[operators] def gramSql(n: Int, src: String, keep: String): String = {
    val k = if (keep.isEmpty) "" else s"$keep, "
    s"""SELECT ${k}unnest(list_transform(range(1, len(ts) - ${n - 2}),
       |    i -> array_to_string(list_slice(ts, CAST(i AS INT), CAST(i AS INT) + ${n - 1}), ' '))) AS gram
       |  FROM (SELECT ${k}list_filter(string_split(text, ' '), w -> w != '') AS ts
       |        FROM $src)
       |  WHERE len(ts) >= $n""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // t20: the identical integer md5 fold (md5UniformSql), the same
    // ln(u)/w ranking with doc_id ties, round-9 on emit only.
    "t20_weighted_sample" ->
      s"""SELECT doc_id, lang, n_chars,
         |  round(ln($md5UniformSql) / n_chars, 9) + 0.0 AS es_key
         |FROM documents WHERE n_chars > 0
         |ORDER BY ln($md5UniformSql) / n_chars DESC, doc_id
         |LIMIT $WeightedSampleK""".stripMargin,
    // t26: the same md5 coin against the sqrt-flattened per-source
    // fraction — sqrt is correctly rounded (identical both engines),
    // the anchor is the exact integer max(n_s), no float summation
    "t26_source_mixture" ->
      s"""WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
         |m AS (SELECT max(n_s) AS mx FROM c),
         |f AS (SELECT source,
         |  LEAST(1.0, $MixKeepMax * sqrt(CAST(mx AS DOUBLE) / n_s)) AS f
         |  FROM c, m)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN f ON d.source = f.source
         |WHERE $md5UniformSql < f.f
         |ORDER BY doc_id""".stripMargin,
    // t19: same tokenization (the t07 kernel), same H = ln(T) −
    // (Σ c·ln c)/T op order, same D ≤ 1 and token-less pins;
    // DuckDB's sum over BIGINT is HUGEINT → cast.
    "t19_token_entropy" ->
      """WITH cnt AS (
        |  SELECT doc_id, token, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE token != '' GROUP BY 1, 2),
        |stats AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct,
        |    sum(c * ln(c)) AS sclc
        |  FROM cnt GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(s.n_tokens, 0) AS n_tokens,
        |  coalesce(s.n_distinct, 0) AS n_distinct,
        |  CASE WHEN s.n_distinct > 1
        |    THEN round(ln(s.n_tokens) - s.sclc / s.n_tokens, 6)
        |    ELSE 0.0 END AS entropy,
        |  CASE WHEN s.n_distinct > 1
        |    THEN round((ln(s.n_tokens) - s.sclc / s.n_tokens) / ln(s.n_distinct), 6)
        |    ELSE 0.0 END AS norm_entropy
        |FROM documents d LEFT JOIN stats s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // t18: same top-R-per-lang rank (count desc, token ties), same
    // regr_slope/regr_r2 regression of ln(cnt) on ln(rank).
    "t18_zipf_fit" ->
      s"""WITH tf AS (
         |  SELECT lang, token, count(*) AS cnt
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
         |  WHERE token != '' GROUP BY 1, 2),
         |r AS (SELECT lang, cnt,
         |        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk
         |      FROM tf)
         |SELECT lang, CAST(count(*) AS INT) AS n_top,
         |  round(regr_slope(ln(cnt), ln(rk)), 4) AS zipf_slope,
         |  round(regr_r2(ln(cnt), ln(rk)), 4) AS zipf_r2
         |FROM r WHERE rk <= $ZipfTopRanks
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "t14_normalize" ->
      s"""SELECT doc_id,
         |  $NormTextSql AS norm_text,
         |  CAST(length($NormTextSql) AS BIGINT) AS n_chars_norm
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t01_lang_id" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang AS tagged_lang,
         |    ${sqlCount(inList(langProfiles("en")))} AS s_en,
         |    ${sqlCount(inList(langProfiles("de")))} AS s_de,
         |    ${sqlCount(inList(langProfiles("es")))} AS s_es,
         |    ${sqlCount(inList(langProfiles("zh")))} AS s_zh
         |  FROM documents)
         |SELECT doc_id, tagged_lang, s_en, s_de, s_es, s_zh,
         |  CASE WHEN s_en >= greatest(s_de, s_es, s_zh) THEN 'en'
         |       WHEN s_de >= greatest(s_es, s_zh) THEN 'de'
         |       WHEN s_es >= s_zh THEN 'es'
         |       ELSE 'zh' END AS pred_lang
         |FROM scored ORDER BY doc_id""".stripMargin,
    "t02_quality_score" ->
      s"""WITH base AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         |    ${sqlCount(inList(stopwords))} AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens, n_stop,
         |  round(n_stop / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
         |  round(least(n_tokens / 100.0, 1.0) *
         |    (1.0 - n_stop / CAST(n_tokens AS DOUBLE)), 4) AS quality
         |FROM base ORDER BY doc_id""".stripMargin,
    "t03_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    w -> (length(w) + 3) // 4)) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t04_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |      (acc, c) -> (acc * 131 + c) % 1000000007) AS fp,
        |    list_transform(range(0, greatest(length(text) - 8, 0) + 1),
        |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substr(text, CAST(i AS INT) + 1, 8), ''),
        |          c -> CAST(unicode(c) AS BIGINT))),
        |        (acc, c) -> (acc * 131 + c) % 1000000007)) AS grams
        |  FROM documents)
        |SELECT doc_id, fp, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(list_min(grams) AS BIGINT) AS min_gram,
        |  CAST(list_max(grams) AS BIGINT) AS max_gram
        |FROM g ORDER BY doc_id""".stripMargin,
    "t06_quality_filter" ->
      s"""WITH base AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         |    ${sqlCount(inList(stopwords))} AS n_stop
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, n_tokens,
         |    round(n_stop / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
         |    round(least(n_tokens / 100.0, 1.0) *
         |      (1.0 - n_stop / CAST(n_tokens AS DOUBLE)), 4) AS quality
         |  FROM base)
         |SELECT doc_id, n_tokens, stop_ratio, quality FROM scored
         |WHERE n_tokens BETWEEN $MinTokens AND $MaxTokens
         |  AND stop_ratio <= $MaxStopRatio AND quality >= $MinQuality
         |ORDER BY doc_id""".stripMargin,
    "t05_parse_bullets" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    regexp_extract_all('Here are facts:' || chr(10) || '- ' ||
        |      replace(text, ' ', chr(10) || '- '), '- ([a-z]+)', 1) AS items
        |  FROM documents)
        |SELECT doc_id, CAST(len(items) AS INT) AS n_items,
        |  items[1] AS first_item, items[-1] AS last_item
        |FROM b ORDER BY doc_id""".stripMargin,
    "t07_top_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token != ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    // t07b: the two-pass certificate makes the entry exact at EVERY
    // SF (sf1.0 included — the r12 lossy regime is cleared), so it
    // shares t07's oracle outright; the raw-sketch error bound is
    // spec-pinned separately
    "t07b_top_tokens_sketch" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token != ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "t08_repetition" ->
      s"""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ts
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(ts) AS INT) AS n_tokens,
        |         CAST(len(list_distinct(ts)) AS INT) AS n_distinct
        |  FROM toks),
        |g2 AS (
        |  ${gramSql(2, "documents", "doc_id")}),
        |g3 AS (
        |  ${gramSql(3, "documents", "doc_id")}),
        |t2 AS (SELECT doc_id, max(c) AS top2_n FROM (
        |  SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        |t3 AS (SELECT doc_id, max(c) AS top3_n FROM (
        |  SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1)
        |SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |  CASE WHEN b.n_tokens > 0
        |       THEN round(1.0 - b.n_distinct / CAST(b.n_tokens AS DOUBLE), 4)
        |       ELSE 0.0 END AS dup_word_frac,
        |  CAST(coalesce(t2.top2_n, 0) AS BIGINT) AS top2_n,
        |  CASE WHEN b.n_tokens >= 2
        |       THEN round(t2.top2_n / CAST(b.n_tokens - 1 AS DOUBLE), 4)
        |       ELSE 0.0 END AS top2_frac,
        |  CAST(coalesce(t3.top3_n, 0) AS BIGINT) AS top3_n,
        |  CASE WHEN b.n_tokens >= 3
        |       THEN round(t3.top3_n / CAST(b.n_tokens - 2 AS DOUBLE), 4)
        |       ELSE 0.0 END AS top3_frac
        |FROM base b LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t09_decontaminate" ->
      s"""WITH grams AS (
         |  ${gramSql(ContamGram, "documents", "doc_id")}),
         |ev AS (SELECT DISTINCT doc_id AS eval_doc, gram FROM grams WHERE doc_id % 100 = 0)
         |SELECT g.doc_id,
         |  CAST(count(DISTINCT g.gram) AS BIGINT) AS n_shared_grams,
         |  CAST(count(DISTINCT ev.eval_doc) AS BIGINT) AS n_eval_docs
         |FROM grams g JOIN ev ON g.gram = ev.gram
         |WHERE g.doc_id % 100 != 0
         |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "t10_stratified_sample" ->
      s"""SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
         |FROM documents
         |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
         |  CASE lang $sampleCaseSql ELSE '1' END
         |ORDER BY doc_id""".stripMargin,
    "t11_pack_sequences" ->
      s"""WITH base AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(string_split(text, ' '),
         |    w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens, CAST(sum(n_tokens) OVER (
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM base)
         |SELECT doc_id, n_tokens,
         |  CAST((cum - n_tokens) // $SeqBudget AS BIGINT) AS first_seq,
         |  CAST((cum - 1) // $SeqBudget AS BIGINT) AS last_seq,
         |  CAST((cum - 1) // $SeqBudget - (cum - n_tokens) // $SeqBudget + 1 AS BIGINT) AS n_seqs
         |FROM c ORDER BY doc_id""".stripMargin,
    "t15_bigram_logprob" ->
      s"""WITH big AS (
        |  ${gramSql(2, "documents", "doc_id")}),
        |vocab AS (
        |  SELECT gram, count(*) AS cb, string_split(gram, ' ')[1] AS w1
        |  FROM big GROUP BY 1),
        |prefix AS (SELECT w1, sum(cb) AS cw FROM vocab GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(cb / CAST(cw AS DOUBLE))), 4) AS logprob
        |FROM big JOIN vocab USING (gram) JOIN prefix USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // t16: ntile over the ROUND-4 t15 score — both engines rank the
    // same rounded doubles (t15's hash gate licenses the rounding),
    // ties broken by doc_id; ntile's first-buckets-larger rule is
    // what ntileOf mirrors.
    "t16_ppl_buckets" ->
      s"""WITH big AS (
        |  ${gramSql(2, "documents", "doc_id")}),
        |vocab AS (
        |  SELECT gram, count(*) AS cb, string_split(gram, ' ')[1] AS w1
        |  FROM big GROUP BY 1),
        |prefix AS (SELECT w1, sum(cb) AS cw FROM vocab GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, round(avg(ln(cb / CAST(cw AS DOUBLE))), 4) AS logprob
        |  FROM big JOIN vocab USING (gram) JOIN prefix USING (w1)
        |  GROUP BY doc_id)
        |SELECT doc_id, lang, logprob,
        |  CASE ntile(3) OVER (PARTITION BY lang ORDER BY logprob DESC, doc_id)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM scored JOIN documents USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // t17: scores rounded BEFORE ranking (the t16 rule), ties by
    // term; df from the reduced tf relation, exactly as the Spark
    // side derives it.
    "t17_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w != '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |s AS (SELECT doc_id, term,
        |        round(tf * ln(n.n / df.df), 4) AS tfidf
        |      FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tfidf, CAST(row_number() OVER (
        |        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rnk
        |      FROM s)
        |SELECT doc_id, term, rnk, tfidf FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "t12_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w != '')) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM vocab)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(avg(ln(cnt / CAST(total AS DOUBLE))), 4) AS logprob
        |FROM toks JOIN vocab USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t13_lang_report" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  round(quantile_cont(n_tokens, 0.5), 4) AS median_tokens
        |FROM (SELECT lang, n_chars,
        |        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin)
}
