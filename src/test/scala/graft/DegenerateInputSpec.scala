package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, KMeans, TextQueries}

/** Degenerate-corpus hardening for the round-7 operators: empty
  * documents, single tokens, and texts shorter than every gram/
  * window size must flow through without exceptions and with sane
  * values — the driver corpus never exercises these (min 12 tokens
  * per doc), so they are planted here. */
class DegenerateInputSpec extends SparkSpec {

  /** A planted documents dir: empty doc, 1-token doc, sub-gram doc,
    * and one normal doc (id 0 doubles as the t09 eval slice). */
  private lazy val dir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("degen").toString
    Seq(
      (0L, "", "en", "src0", 0L),
      (1L, "one", "en", "src1", 3L),
      (2L, "tiny pair", "de", "src2", 9L),
      (3L, "alpha beta gamma delta epsilon zeta eta theta " * 4, "es", "src3", 188L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("t08 repetition: empty and 1-token docs produce guarded rows") {
    val rows = TextQueries.t08Repetition(spark, dir).collect()
    assert(rows.length == 4)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getInt(1) == 0, "empty doc must count 0 tokens")
    // fracs for n_tokens < 2/3 are the guarded 0.0, never a crash
    assert(byId(1L).getDouble(5) == 0.0 && byId(1L).getDouble(7) == 0.0)
    assert(byId(3L).getInt(1) == 32)
  }

  test("t15 bigram scoring: sub-2-token docs absent; word ORDER moves the score") {
    val rows = TextQueries.t15BigramLogprob(spark, dir).collect()
    // empty (0) and 1-token (1) docs have no bigrams -> absent
    assert(rows.map(_.getLong(0)).toSet == Set(2L, 3L))
    // doc 3 cycles one 8-word phrase 4x: corpus-wide every first
    // word determines its successor, so every P(w2|w1)=1 and the mean
    // ln P is exactly 0 — maximal order-predictability, the signal
    // t12's bag-of-words scoring cannot see
    val d3 = rows.find(_.getLong(0) == 3L).get
    assert(d3.getLong(1) == 31L) // 32 tokens -> 31 bigrams
    assert(d3.getDouble(2) == 0.0, s"fully predictive doc scored ${d3.getDouble(2)}")
  }

  test("t09/d10/t12: sub-gram docs drop out instead of failing") {
    // doc 0 is the eval slice and is EMPTY — no grams, no matches.
    assert(TextQueries.t09Decontaminate(spark, dir).collect().isEmpty)
    // no 24-cp shared runs in this corpus
    assert(DedupQueries.d10WinnowPairs(spark, dir).collect().isEmpty)
    // d11 apply: sub-window docs emit no cuts; everything passes
    // through verbatim (empty doc included)
    val applied = DedupQueries.d11SpanDedupApply(spark, dir).collect()
    assert(applied.length == 4 && applied.forall(_.getLong(2) == 0L))
    // d12 incremental: no shared 64-cp windows -> no flagged docs
    assert(DedupQueries.d12BloomSpanIncremental(spark, dir).collect().isEmpty)
    // the empty doc contributes no tokens → absent from t12
    val lp = TextQueries.t12UnigramLogprob(spark, dir).collect()
    assert(lp.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("d12: an all-sub-window HISTORY slice must not crash the bloom build") {
    import spark.implicits._
    // history (doc_id%10 != 0) entirely shorter than the 64-cp
    // window; only the batch doc is long. BloomFilter.create throws
    // on 0 expected items — the entry guards the empty-history case.
    val tmp = java.nio.file.Files.createTempDirectory("degen12").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta " * 4, "en", "s", 188L),
      (1L, "short", "en", "s", 5L),
      (2L, "also short", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    assert(DedupQueries.d12BloomSpanIncremental(spark, tmp).collect().isEmpty)
  }

  test("d02/d13: sub-3-word docs (no shingles) neither crash nor flood the bands") {
    import spark.implicits._
    // Empty shingle sets used to (a) share the all-MinhashPrime
    // signature — every short-doc pair a guaranteed 16-band
    // candidate — and (b) throw DIVIDE_BY_ZERO in the exact-J verify
    // under Spark 4 ANSI. Both slices carry short docs so the d13
    // cross-slice path is exercised too.
    val tmp = java.nio.file.Files.createTempDirectory("degen0213").toString
    Seq(
      (10L, "ok", "en", "s", 2L),        // batch slice, sub-shingle
      (11L, "hi", "en", "s", 2L),        // history slice, sub-shingle
      (20L, "tiny pair", "en", "s", 9L), // batch, still sub-shingle
      (21L, "alpha beta gamma delta epsilon zeta eta theta " * 4, "en", "s", 188L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    assert(DedupQueries.d02MinhashLsh(spark, tmp).collect().isEmpty)
    assert(DedupQueries.d13IncrementalNeardup(spark, tmp).collect().isEmpty)
  }

  test("t16 buckets: singleton langs are head; distributed ntile is partitioning-invariant") {
    // degenerate corpus: each scoreable doc is alone in its lang →
    // n=1 per lang, ntile puts it in bucket 1 (head); sub-2-token
    // docs are absent (the t15 convention)
    val degen = TextQueries.t16PplBuckets(spark, dir).collect()
    assert(degen.map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(degen.forall(_.getString(3) == "head"))
    // the two-pass rank must not depend on how the range shuffle
    // splits: same rows under a different partition count
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = TextQueries.t16PplBuckets(spark, sf0001).collect().map(_.toSeq).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", 7)
      val b = TextQueries.t16PplBuckets(spark, sf0001).collect().map(_.toSeq).toSeq
      assert(a == b, "t16 result varies with shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    // tercile balance: per lang, bucket sizes differ by at most 1
    val sizes = a.groupBy(r => (r(1), r(3))).view.mapValues(_.size).toMap
    a.map(_(1)).distinct.foreach { lang =>
      val s = Seq("head", "middle", "tail").map(b => sizes.getOrElse((lang, b), 0))
      assert(s.max - s.min <= 1, s"unbalanced terciles for $lang: $s")
    }
  }

  test("t11 packing: zero-token docs occupy no sequence and shift nothing") {
    val rows = TextQueries.t11PackSequences(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 0 is empty: 0 tokens, floorDiv gives last_seq = -1 →
    // n_seqs 0 (Scala `/` would truncate to 0 and claim 1 sequence,
    // diverging from the oracle's floor `//`).
    assert(rows(0L) == ((0L, 0L, -1L, 0L)), s"empty doc row: ${rows(0L)}")
    // every non-empty doc spans >= 1 sequence; n_seqs never negative
    assert(rows.values.forall(_._4 >= 0))
    assert(rows(1L)._4 >= 1 && rows(3L)._4 >= 1)
  }

  test("q16/q17: an events corpus with no views neither crashes nor invents stages") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("degen_ev").toString
    // only clicks and purchases — the funnel's first stage never opens
    Seq((1L, 7L, 1000000L, "click"), (2L, 7L, 2000000L, "purchase"))
      .toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    assert(graft.operators.CoreQueries.q16EventFunnel(spark, tmp).count() == 0,
      "no view stage -> an EMPTY funnel, not phantom later stages")
    // retention still works: one user, one week, week-0 cell only
    val ret = graft.operators.CoreQueries.q17CohortRetention(spark, tmp).collect()
    assert(ret.length == 1 && ret.head.getInt(1) == 0 && ret.head.getLong(2) == 1L)
  }

  test("h14/h15: a corpus with no co-occurring entities is empty, not a crash") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("degen_solo").toString
    // one >=5-char entity per doc (facts never share entities)
    Seq((0L, "alpha1 is a", "en", "s", 11L), (1L, "bravo2 is b", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    assert(graft.operators.GraphQueries.h14EntityJaccard(spark, tmp).count() == 0)
    assert(graft.operators.GraphQueries.h15EntityPmi(spark, tmp).count() == 0)
  }

  test("t18: a single-token language fits no slope (null), not a crash") {
    val rows = TextQueries.t18ZipfFit(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // lang "en" holds docs 0 ("") and 1 ("one"): vocabulary = {one}
    // -> one point, undefined regression -> guarded null
    val en = rows("en")
    assert(en.getInt(1) == 1 && en.isNullAt(2), s"1-point fit must be null: $en")
    // the healthy lang still fits: doc 3 repeats 8 tokens uniformly,
    // so the fit exists (near-flat) and r2 is well-defined
    assert(rows.contains("es") && !rows("es").isNullAt(2))
  }

  test("t10 sampling ignores text entirely (works on the degenerate corpus)") {
    val s = TextQueries.t10StratifiedSample(spark, dir).collect()
    assert(s.forall(r => r.getString(2) < "d")) // below every threshold char used
  }

  test("d14/t19/t20 degenerate: sub-gram docs pair nothing, zero weights never sample") {
    // no doc reaches the 5-token gram size except doc 3, and a pair
    // needs TWO docs sharing a gram -> empty, not a crash
    assert(DedupQueries.d14Containment(spark, dir).count() == 0)
    // t19 keeps a zero row for the empty doc (left-join contract)
    val ent = TextQueries.t19TokenEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ent(0L) == 0L && ent.size == 4)
    // t20 excludes the zero-length doc (zero weight has no A-ES key)
    // and emits every weighted doc when k exceeds the corpus
    val sampled = TextQueries.t20WeightedSample(spark, dir).collect().map(_.getLong(0)).toSet
    assert(sampled == Set(1L, 2L, 3L), sampled.toString)
  }

  test("t21/t22/t23/s05/m06/d17: the r10b text ops survive the degenerate corpus") {
    import graft.operators.{MultimodalQueries, QualityQueries, SplitterQueries}
    // t21: all four docs keep a row; the empty doc's ratios are NULL,
    // its pass false (Kleene), the 1-token doc computes cleanly
    val q = QualityQueries.t21GopherQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q.size == 4)
    assert(q(0L).getLong(1) == 0L && !q(0L).getBoolean(8))
    assert(q(1L).getLong(1) == 1L && q(1L).getDouble(2) == 3.0)
    // t22: sub-3-token docs have no grams -> absent, not zero-division
    val nov = QualityQueries.t22GramNovelty(spark, dir).collect().map(_.getLong(0)).toSet
    assert(nov == Set(3L), nov.toString)
    // t23: batch slice = doc 0 (empty) -> no gram rows at all
    assert(QualityQueries.t23IncrementalNovelty(spark, dir).count() == 0)
    // s05: empty doc still yields ONE window ([""], 1 token); every
    // doc appears, no empty chunk list
    val sp = SplitterQueries.s05TokenWindow(spark, dir).collect()
    assert(sp.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    assert(sp.count(_.getLong(0) == 0L) == 1)
    // m06: only doc 3 reaches FrameSize; it has a single frame ->
    // no boundary rows anywhere, not a window crash
    assert(MultimodalQueries.m06SceneCuts(spark, dir).count() == 0)
    // d17: no >= 0.8 pair in this corpus -> empty report
    assert(DedupQueries.d17NearestDup(spark, dir).count() == 0)
  }

  test("t24/t25 degenerate: empty corpus trains zero merges; wordless docs absent from encode") {
    import graft.operators.Bpe
    import spark.implicits._
    // the mixed degenerate corpus still trains (words exist) and
    // encode covers exactly the docs with >= 1 word
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val merges = Bpe.train(spark, docs, nMerges = 5)
    assert(merges.nonEmpty && merges.size <= 5)
    val enc = Bpe.t25BpeEncode(spark, dir).collect()
    assert(enc.map(_.getLong(0)).toSet == Set(1L, 2L, 3L),
      "the wordless doc must be absent (the oracle's WHERE w <> '' mirror)")
    enc.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    // an empty-text-only corpus: no words anywhere -> zero merges,
    // zero encode rows, no crash in either direction
    val etmp = java.nio.file.Files.createTempDirectory("degenBpe").toString
    Seq((0L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$etmp/documents.parquet")
    assert(Bpe.train(spark,
      spark.read.parquet(s"$etmp/documents.parquet"), nMerges = 5).isEmpty)
    assert(Bpe.t25BpeEncode(spark, etmp).count() == 0)
  }

  test("q20/q23: an empty events table yields empty transitions, not a crash") {
    import spark.implicits._
    import graft.operators.AnalyticsQueries
    val tmp = java.nio.file.Files.createTempDirectory("degenEv").toString
    Seq.empty[(Long, Long, Long, String)]
      .toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    assert(AnalyticsQueries.q20PathTransitions(spark, tmp).count() == 0)
    assert(AnalyticsQueries.q23SessionPaths(spark, tmp).count() == 0)
  }

  test("e05: empty corpus yields the contract schema, not an array() analysis error; one label predicts itself") {
    import spark.implicits._
    import graft.operators.ExtendedQueries
    val empty = Seq.empty[(Long, Array[Double], Int)].toDF("vec_id", "v", "label")
    val out = ExtendedQueries.centroidClassify(spark, empty)
    assert(out.columns.toSeq == Seq("vec_id", "true_label", "pred_label", "score"))
    assert(out.count() == 0)
    val one = Seq((0L, Array(1.0, 0.0), 7), (1L, Array(0.0, 1.0), 7))
      .toDF("vec_id", "v", "label")
    val preds = ExtendedQueries.centroidClassify(spark, one).collect()
    assert(preds.length == 2 && preds.forall(_.getAs[Int]("pred_label") == 7))
  }
}
