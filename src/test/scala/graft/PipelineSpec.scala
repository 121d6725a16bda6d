package graft

import org.apache.spark.sql.functions._

import graft.operators.{PipelineQueries, TextQueries}

/** p01 end-to-end curation pipeline — a planted corpus where every
  * stage has exactly one designated victim, so each absence proves
  * ITS stage did the dropping (every victim is chosen to PASS the
  * later stages, especially the md5-nibble sample, which would
  * otherwise mask the earlier drop).
  *
  * md5 first nibbles (lang=en threshold 'c'): pass = 4('a'), 6('1'),
  * 7('8'), 9('4'), 14('a'); fail = 1('c'), 2('c'), 5('e').
  */
class PipelineSpec extends SparkSpec {

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // 60 unique tokens + café precomposed → quality 0.6, stop_ratio 0
  private val T1 = "café " + words("wfour", 59)

  private lazy val dir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pipeline").toString
    Seq(
      // IN: canonical of the dup pair (nibble 'a' passes sampling)
      (4L, T1, "en", "p", T1.length.toLong),
      // OUT by DEDUP: same text after NFC+whitespace normalization
      // (decomposed e + COMBINING ACUTE, doubled spaces); nibble 'a'
      // would pass sampling, so only stage 3 can explain its absence
      (14L, "cafe\u0301  " + words("wfour", 59), "en", "p", 0L),
      // IN: clean unique doc (nibble '1')
      (6L, words("wsix", 60), "en", "p", 0L),
      // OUT by QUALITY: 10 tokens < MinTokens (nibble '8' passes)
      (7L, words("wseven", 10), "en", "p", 0L),
      // OUT by DECONTAMINATION: carries the eval doc's gram (nibble '4' passes)
      (9L, words("wnine", 57) + " zebra quark nebula", "en", "p", 0L),
      // eval slice (doc_id % 100 == 0): never trains, contaminates 9
      (100L, "zebra quark nebula benchmark item", "en", "p", 0L),
      // OUT by SAMPLING alone: clean doc whose nibble 'e' fails
      (5L, words("wfive", 60), "en", "p", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("p01: each stage drops exactly its designated victim") {
    val out = PipelineQueries.p01CurationPipeline(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(4L, 6L))
    // the survivors carry t06's metrics computed on normalized text
    out.foreach { r =>
      assert(r.getInt(2) == 60) // n_tokens
      assert(r.getDouble(4) == 0.6) // quality
    }
  }

  test("p01: survivors are a subset of every standalone stage's survivors") {
    // Precondition of the comparisons below: the sf0.01 corpus must
    // be normalization-stable (t06/t09 below run on RAW text, the
    // pipeline on normalized). If a regenerated corpus ever carries
    // doubled whitespace or non-NFC accents, fail HERE with a
    // diagnosable message, not in the subset asserts.
    val changed = TextQueries.normalize(
        graft.sources.Tables.documents(spark, sf001))
      .join(graft.sources.Tables.documents(spark, sf001), "doc_id")
      .filter(col("norm_text") =!= col("text")).count()
    assert(changed == 0, s"sf0.01 corpus not normalization-stable ($changed docs)")
    val p = PipelineQueries.p01CurationPipeline(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(p.nonEmpty, "pipeline produced an empty corpus at sf0.01")
    // t06 quality filter (raw text == normalized on this ASCII corpus)
    val q = TextQueries.t06QualityFilter(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // t10 sample predicate
    val s = TextQueries.t10StratifiedSample(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // t09's flagged docs must be absent
    val contaminated = TextQueries.t09Decontaminate(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(p.subsetOf(q), "pipeline kept a doc t06 rejects")
    assert(p.subsetOf(s), "pipeline kept a doc t10 samples out")
    assert(p.intersect(contaminated).isEmpty, "pipeline kept a contaminated doc")
    assert(!p.exists(_ % 100 == 0), "pipeline kept an eval-slice doc")
  }

  test("p02: the report card's numbers are exact on a planted corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("p02").toString
    // 4 docs, one EXACT duplicate pair → dup_docs 1, dup_rate 0.25;
    // langs {en, de}, sources {a, b}; token counts 4/4/3/5 → mean 4.
    Seq(
      (0L, "the alpha beta gamma", "en", "a"),
      (1L, "the alpha beta gamma", "en", "a"),
      (2L, "delta epsilon zeta", "de", "b"),
      (3L, "one two three four five", "en", "b"))
      .map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val r = PipelineQueries.p02CorpusReport(spark, tmp).collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_docs") == 4L && m("n_langs") == 2L && m("n_sources") == 2L)
    assert(m("dup_docs") == 1L && m("dup_rate") == 0.25)
    assert(m("mean_tokens") == 4.0)
    // novelty: doc0 2/2, doc1 0/2, doc2 1/1, doc3 3/3 → mean 0.75
    assert(m("mean_novelty") == 0.75, m.toString)
    // pass_rate: every doc fails the 30-word band → 0.0
    assert(m("pass_rate") == 0.0)
    // token budget: independent java.lang.String recompute of the
    // t25 fold (String.replace is the same left-to-right non-overlap
    // rule) over the planted texts
    def bpeCount(text: String): Long = text.split(" ").filter(_.nonEmpty).map { w =>
      var s = w.toCharArray.mkString(" ", " ", " ")
      graft.operators.Bpe.T25Merges.foreach { case (l, r) =>
        s = s.replace(s" $l $r ", s" $l$r ")
      }
      s.trim.split(" ").length.toLong
    }.sum
    val expectedBpe = Seq("the alpha beta gamma", "the alpha beta gamma",
      "delta epsilon zeta", "one two three four five").map(bpeCount).sum
    assert(m("n_bpe_tokens") == expectedBpe, s"${m("n_bpe_tokens")} vs $expectedBpe")
  }

  test("p03: every diff number is exact on a planted two-version corpus") {
    import spark.implicits._
    // OLD: one exact-dup pair (docs 1/2) + one 5-word doc; NEW drops
    // the dup copy (removed), keeps 1 and 3, adds a part-overlapping
    // doc (4: one of three grams novel) and a fully fresh doc (5).
    val old = Seq(
      (1L, "alpha beta gamma delta", "en", "s1"),
      (2L, "alpha beta gamma delta", "en", "s1"),
      (3L, "epsilon zeta eta theta iota", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val nw = Seq(
      (1L, "alpha beta gamma delta", "en", "s1"),
      (3L, "epsilon zeta eta theta iota", "de", "s2"),
      (4L, "alpha beta gamma delta iota", "en", "s3"),
      (5L, "kappa lambda mu nu", "fr", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.PipelineQueries.corpusDiff(spark, old, nw).head()
    def g(n: String): Any = r.getAs[Any](n)
    assert(g("n_docs_old") == 3L && g("n_docs_new") == 4L)
    assert(g("n_added") == 2L && g("n_removed") == 1L)
    assert(g("n_langs_old") == 2L && g("n_langs_new") == 3L)
    assert(g("n_sources_old") == 2L && g("n_sources_new") == 3L)
    assert(g("dup_rate_old") == 0.3333 && g("dup_rate_new") == 0.0)
    assert(g("dup_rate_delta") == -0.3333)
    // doc 4: grams {abg, bgd, gdi} — only "gamma delta iota" unseen
    // in old → 0.3333; doc 5: both grams fresh → 1.0; mean 0.6667
    assert(g("mean_novelty_added") == 0.6667, g("mean_novelty_added").toString)
    // 5-grams: old {ezeti}, new {ezeti, abgdi} → J = 1/2
    assert(g("gram_jaccard") == 0.5, g("gram_jaccard").toString)
  }

  test("p03 entry: the corpus slice form is the general form applied to the split") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val viaGeneral = graft.operators.PipelineQueries.corpusDiff(spark,
        docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 5 =!= 0))
      .collect().map(_.toSeq).toSeq
    val entry = graft.operators.PipelineQueries
      .p03CorpusDiff(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(viaGeneral == entry)
  }
}
