package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphQueries, TextQueries}

/** Planted-corpus property specs for the round-8 trio that landed with
  * oracle entries but no ScalaTest coverage: h14 fact-Jaccard entity
  * similarity and t18 Zipf fit. (q15's planted-burst spec lives in
  * SkewCorpusSpec with the other skew guards.)
  *
  * Each corpus is CONSTRUCTED so the expected output is derivable by
  * hand — similar/dissimilar entity pairs straddling both h14 dials,
  * and a Zipfian vs a near-uniform token distribution whose fitted
  * slopes must separate.
  */
class CorpusStatsSpec extends SparkSpec {

  // ---------------------------------------------------------------- h14

  /** Entity corpus: one genuinely similar pair (5 shared facts of 6
    * each, J = 5/7), one pair under the MinSharedFacts dial (1 shared
    * fact), one pair under the MinJaccard floor (2 shared facts but
    * degree 12 each, J = 2/22). Docs stay under one ChunkSize so each
    * is a single fact; "pad" is below MinEntityLen(5) and never
    * becomes an entity. */
  private lazy val dirH: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("h14corpus").toString
    val texts =
      Seq.fill(5)("simaa simbb pad") ++ Seq("simaa pad", "simbb pad") ++
        Seq("disaa disbb pad") ++ Seq.fill(3)("disaa pad") ++ Seq.fill(3)("disbb pad") ++
        Seq.fill(2)("lowaa lowbb pad") ++ Seq.fill(10)("lowaa pad") ++ Seq.fill(10)("lowbb pad")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("h14: emits exactly the genuinely-similar pair, with exact Jaccard") {
    val rows = GraphQueries.h14EntityJaccard(spark, dirH).collect()
    assert(rows.length == 1, s"both dial-failing pairs must be excluded: ${rows.mkString("; ")}")
    val r = rows.head
    assert(r.getString(0) == "simaa" && r.getString(1) == "simbb")
    assert(r.getLong(2) == 5L, s"n_shared: $r")
    // J = shared / (da + db - shared) = 5 / (6 + 6 - 5), rounded to 6
    assert(r.getDouble(3) == math.rint(5.0 / 7.0 * 1e6) / 1e6, s"jaccard: $r")
  }

  test("h14: the MinSharedFacts dial excludes 1-fact co-occurrence noise") {
    // Rerun the kernel without the dial filters to show both planted
    // negative pairs DO co-occur (the spec would be vacuous if the
    // corpus never generated them as candidates).
    import graft.plans.HippoGraph
    val e = HippoGraph.edges(spark, dirH)
    val cand = e.select(col("fact_id"), col("entity").as("a"))
      .join(e.select(col("fact_id"), col("entity").as("b")), "fact_id")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cand(("disaa", "disbb")) == 1L, "the noise pair co-occurs exactly once")
    assert(cand(("lowaa", "lowbb")) == 2L, "the low-J pair clears MinSharedFacts")
    assert(cand.keySet == Set(("simaa", "simbb"), ("disaa", "disbb"), ("lowaa", "lowbb")))
  }

  // ---------------------------------------------------------------- h15

  test("h15: PMI separates above-chance from below-chance co-occurrence exactly") {
    val rows = GraphQueries.h15EntityPmi(spark, dirH).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // N = 36 single-fact docs. simaa/simbb: 5 shared, deg 6 each →
    // PMI = ln(5·36/36) = ln 5. lowaa/lowbb: 2 shared, deg 12 each →
    // ln(2·36/144) = ln 0.5 — BELOW chance, which Jaccard-floored h14
    // drops but PMI must surface as a negative association.
    assert(rows.keySet == Set(("simaa", "simbb"), ("lowaa", "lowbb")),
      s"MinSharedFacts still gates candidates: ${rows.keySet}")
    val (nSim, pmiSim) = rows(("simaa", "simbb"))
    assert(nSim == 5L && pmiSim == math.rint(math.log(5.0) * 1e6) / 1e6, s"$pmiSim")
    val (nLow, pmiLow) = rows(("lowaa", "lowbb"))
    assert(nLow == 2L && pmiLow == math.rint(math.log(0.5) * 1e6) / 1e6, s"$pmiLow")
  }

  // ---------------------------------------------------------------- q16

  /** Funnel corpus: five users with known stage progressions —
    * including the strictly-after trap (u4 clicks BEFORE their first
    * view, which must not count as funnel progress). */
  private lazy val dirF: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q16funnel").toString
    val events = Seq(
      (1L, 1L, 1000000L, "view"), (2L, 1L, 2000000L, "click"), (3L, 1L, 3000000L, "purchase"),
      (4L, 2L, 1000000L, "view"), (5L, 2L, 2000000L, "click"),
      (6L, 3L, 1000000L, "view"),
      (7L, 4L, 1000000L, "click"), (8L, 4L, 2000000L, "view"), (9L, 4L, 3000000L, "purchase"),
      (10L, 5L, 1000000L, "click"), (11L, 5L, 2000000L, "purchase"))
    events.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q16: funnel counts users per stage with strictly-after semantics") {
    val rows = graft.operators.CoreQueries.q16EventFunnel(spark, dirF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1..u4 view; u1,u2 click after first view (u4's click precedes
    // their view); only u1 completes. u4's purchase does not count —
    // there is no qualifying click before it. u5 never views.
    assert(rows == Map("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L), rows.toString)
  }

  // ---------------------------------------------------------------- h16

  test("h16: disjoint islands keep distinct components; singletons self-label") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("h16isl").toString
    // island red{a,b,c} chained over two facts, island blu{x,y} in
    // one fact, solozz alone ("pad" is sub-MinEntityLen filler)
    val texts = Seq("redaa redbb pad", "redbb redcc pad",
      "bluxx bluyy pad", "solozz pad")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = GraphQueries.h16Components(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map(
      "redaa" -> "redaa", "redbb" -> "redaa", "redcc" -> "redaa",
      "bluxx" -> "bluxx", "bluyy" -> "bluxx",
      "solozz" -> "solozz"), rows.toString)
  }

  // ---------------------------------------------------------------- d16

  test("d16: the source-overlap matrix is exact on a planted repackaged source") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d16src").toString
    // srcB repackages srcA's 7-token passage (3 shared 5-grams) and
    // adds one 6-token doc of its own (2 grams); srcC is disjoint.
    val a = "one two three four five six seven"
    val docs = Seq(
      (0L, a, "en", "srcA", a.length.toLong),
      (1L, a, "en", "srcB", a.length.toLong),
      (2L, "eight nine ten eleven twelve thirteen", "en", "srcB", 37L),
      (3L, "alpha beta gamma delta epsilon zeta", "en", "srcC", 35L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = graft.operators.DedupQueries.d16SourceOverlap(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // only the repackaging pair appears: 3 shared of |A|=3, |B|=5
    assert(rows.keySet == Set(("srcA", "srcB")), rows.toString)
    assert(rows(("srcA", "srcB")) == ((3L, 0.6)), rows.toString)
  }

  // ---------------------------------------------------------------- q17

  test("q17: the retention matrix is exact on a planted two-cohort corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q17cohort").toString
    def at(day: String) = s"$day 12:00:00"
    // Mondays: W0 = 2026-01-05, W1 = -12, W3 = -26. u1,u2 cohort W0
    // (u1 returns in W1); u3 cohorts in W1 and returns in W3. Two
    // same-week events for u1 must not double-count.
    val events = Seq(
      (1L, 1L, at("2026-01-05"), "view"), (2L, 1L, at("2026-01-07"), "click"),
      (3L, 1L, at("2026-01-13"), "view"),
      (4L, 2L, at("2026-01-06"), "view"),
      (5L, 3L, at("2026-01-14"), "view"), (6L, 3L, at("2026-01-27"), "view"))
    events.toDF("event_id", "user_id", "s", "event_type")
      .select(col("event_id"), col("user_id"),
        col("s").cast("timestamp").as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    val rows = graft.operators.CoreQueries.q17CohortRetention(spark, tmp).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows == Map(
      ("2026-01-05", 0) -> 2L, ("2026-01-05", 1) -> 1L,
      ("2026-01-12", 0) -> 1L, ("2026-01-12", 2) -> 1L), rows.toString)
  }

  // ---------------------------------------------------------------- t18

  /** Token corpus: lang "zz" draws 50 tokens with cnt(r) = ⌊600/r⌋ —
    * an exact-by-construction Zipf head — and lang "uu" draws 60
    * near-uniform tokens (one extra occurrence on the first, so the
    * regression's y-variance is nonzero). Token text is spread over
    * 10 docs per language; t18's per-lang frequency agg is split-
    * invariant. */
  private lazy val dirT: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t18corpus").toString
    val r = new scala.util.Random(7)
    def spread(lang: String, tokens: Seq[String]): Seq[(String, String)] = {
      val shuffled = r.shuffle(tokens)
      val per = math.max(1, shuffled.length / 10)
      shuffled.grouped(per).map(g => (lang, g.mkString(" "))).toSeq
    }
    val zipf = (1 to 50).flatMap(rank => Seq.fill(600 / rank)(f"zipf$rank%03d"))
    val unif = (0 until 60).flatMap(i => Seq.fill(if (i == 0) 21 else 20)(f"unif$i%03d"))
    val docs = spread("zz", zipf) ++ spread("uu", unif)
    docs.zipWithIndex
      .map { case ((lang, t), i) => (i.toLong, t, lang, "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("t18: Zipfian corpus fits slope ≈ −1 with high r², uniform corpus fits flat") {
    val rows = TextQueries.t18ZipfFit(spark, dirT).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set("zz", "uu"))
    val (nZ, slopeZ, r2Z) = rows("zz")
    assert(nZ == 50, s"full top-R head: $nZ")
    assert(slopeZ > -1.15 && slopeZ < -0.85, s"Zipf slope must sit near −1: $slopeZ")
    assert(r2Z > 0.95, s"the planted power law must fit tightly: $r2Z")
    val (nU, slopeU, r2U) = rows("uu")
    assert(nU == 50, "top-R caps the 60-token uniform vocabulary")
    assert(math.abs(slopeU) < 0.05, s"uniform corpus must fit flat: $slopeU")
    assert(slopeZ < slopeU - 0.5, "the fit separates natural-shaped from synthetic corpora")
    assert(r2U >= 0.0 && r2U <= 1.0, s"r2 well-defined on near-constant y: $r2U")
  }
}
