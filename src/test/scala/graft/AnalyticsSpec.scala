package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnalyticsQueries, QualityQueries}

/** Planted exact-value specs for the analytics/profiling wave (q20
  * path transitions, q21 histogram, q22 data profile) and the
  * quality/novelty wave (t21 Gopher rules, t22 gram novelty). Every
  * corpus is constructed so the expected output is derivable by hand.
  */
class AnalyticsSpec extends SparkSpec {

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def round4(x: Double): Double = math.rint(x * 1e4) / 1e4

  // ---------------------------------------------------------------- q20

  /** Four users: a linear path, a repeated-state path, a singleton
    * (no transitions), and a same-timestamp tie that must break on
    * event_id. */
  private lazy val dirE: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("analyticsE").toString
    val ev: Seq[(Long, Long, Long, String)] = Seq(
      // user 1: view → click → purchase
      (1L, 1L, 1000000L, "view"), (2L, 1L, 2000000L, "click"), (3L, 1L, 3000000L, "purchase"),
      // user 2: view → view → click
      (4L, 2L, 1000000L, "view"), (5L, 2L, 2000000L, "view"), (6L, 2L, 3000000L, "click"),
      // user 3: singleton
      (7L, 3L, 1000000L, "view"),
      // user 4: tie on ts — event_id order makes it signup → error
      (8L, 4L, 5000000L, "signup"), (9L, 4L, 5000000L, "error"))
    ev.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q20: transition counts and row-normalized probabilities are exact") {
    val rows = AnalyticsQueries.q20PathTransitions(spark, dirE).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows == Map(
      ("view", "click") -> ((2L, round6(2.0 / 3.0))),
      ("view", "view") -> ((1L, round6(1.0 / 3.0))),
      ("click", "purchase") -> ((1L, 1.0)),
      ("signup", "error") -> ((1L, 1.0))), s"got $rows")
  }

  test("q20: a singleton user contributes no transition") {
    val fromView = AnalyticsQueries.q20PathTransitions(spark, dirE)
      .agg(sum("n")).collect().head.getLong(0)
    // 9 events − 4 path-ends (users 1,2,4) − 1 singleton = 5? No:
    // transitions = Σ_users max(n_events − 1, 0) = 2 + 2 + 0 + 1.
    assert(fromView == 5L)
  }

  // ---------------------------------------------------------------- q21

  private lazy val dirL: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("analyticsL").toString
    Seq(500.0, 9999.99, 10000.0, 25000.0, 25001.0)
      .toDF("l_extendedprice").write.parquet(s"$tmp/lineitem.parquet")
    tmp
  }

  test("q21: bucket boundaries, means, shares and cumulative counts are exact") {
    val rows = AnalyticsQueries.q21ValueHistogram(spark, dirL).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L), "10000.0 must open bucket 1")
    val m = rows.toMap
    assert(m(0L) == ((2L, round4((500.0 + 9999.99) / 2), 0.4, 2L)))
    assert(m(1L) == ((1L, 10000.0, 0.2, 3L)))
    assert(m(2L) == ((2L, round4((25000.0 + 25001.0) / 2), 0.4, 5L)))
  }

  // ---------------------------------------------------------------- q22

  private lazy val dirO: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("analyticsO").toString
    val rows = Seq(
      (1L, Some(10L), "O", Some(100.0), Some("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, Some(10L), "F", Some(100.0), Some("2024-01-02 00:00:00"), "1-URGENT"),
      (3L, None, "O", None, None, "2-HIGH"),
      (4L, Some(20L), "O", Some(300.0), Some("2024-01-01 00:00:00"), "2-HIGH"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_date_s", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_date_s").cast("timestamp_ntz").as("o_orderdate"),
        col("o_orderpriority"))
      .write.parquet(s"$tmp/orders.parquet")
    tmp
  }

  test("q22: null and exact-distinct counts per column, one row per column") {
    val m = AnalyticsQueries.q22DataProfile(spark, dirO).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m == Map(
      "o_orderkey" -> ((4L, 0L, 4L)),
      "o_custkey" -> ((4L, 1L, 2L)),
      "o_orderstatus" -> ((4L, 0L, 2L)),
      "o_totalprice" -> ((4L, 1L, 2L)),
      "o_orderdate" -> ((4L, 1L, 2L)),
      "o_orderpriority" -> ((4L, 0L, 2L))), s"got $m")
  }

  test("q23: transitions do NOT bridge a 30-minute session gap (q20 does, by design)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q23").toString
    def us(min: Long) = min * 60L * 1000000L
    // u1: view@0 → click@10min (same session), purchase@50min opens a
    // NEW session (40min gap — the click→purchase bridge must vanish),
    // error@51min continues it (purchase→error survives).
    val ev = Seq(
      (1L, 1L, us(0), "view"), (2L, 1L, us(10), "click"),
      (3L, 1L, us(50), "purchase"), (4L, 1L, us(51), "error"))
    ev.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    val q23 = AnalyticsQueries.q23SessionPaths(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(q23 == Set(("view", "click"), ("purchase", "error")),
      s"the 40-minute gap must not produce click→purchase: $q23")
    val q20 = AnalyticsQueries.q20PathTransitions(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(q20.contains(("click", "purchase")),
      "q20's whole-history adjacency keeps the lifecycle bridge")
  }

  test("q22b: approx profile ≤2% relative distinct error vs exact, same null/row counts") {
    val exact = AnalyticsQueries.q22DataProfile(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val approx = AnalyticsQueries.q22bDataProfileApprox(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, (n, nn, dApprox)) =>
      val (en, enn, dExact) = exact(c)
      assert(n == en && nn == enn, s"$c: row/null counts must stay exact")
      val rel = math.abs(dApprox - dExact).toDouble / math.max(dExact, 1L)
      assert(rel <= 0.02, s"$c: approx distinct $dApprox vs exact $dExact (rel $rel)")
    }
  }

  // ---------------------------------------------------------------- t21

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Each doc trips exactly one Gopher rule (or none). */
  private lazy val dirQ: String = {
    val tmp = java.nio.file.Files.createTempDirectory("gopherQ").toString
    val good = (1 to 34).map(i => s"word$i").mkString("the ", " ", "") // 35 words, has 'the'
    val hashy = (1 to 31).map(i => s"word$i").mkString("the ", " ", " ## ##") // 34 words, 4 '#'
    val bullets = "- the alpha beta\n- gamma delta epsilon\n" +
      (1 to 30).map(i => s"word$i").mkString(" ") // 3 lines, 2 bullets, 38 words
    val numeric = ((1 to 20).map(_.toString) ++ (1 to 15).map(i => s"word$i"))
      .mkString("the ", " ", "") // 36 words, only 16 alphabetic
    val short = "the tiny doc here" // 4 words < MinWords
    docsDf(Seq(good, hashy, bullets, numeric, short))
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("t21: each planted doc trips exactly its own Gopher rule") {
    val rows = QualityQueries.t21GopherQuality(spark, dirQ).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0 passes everything
    assert(rows(0L).getBoolean(8), s"good doc must pass: ${rows(0L)}")
    assert(rows(0L).getLong(1) == 35L && rows(0L).getLong(4) == 1L)
    // doc 1: symbol_ratio 4/34 > 0.1 → fail, everything else in band
    assert(!rows(1L).getBoolean(8))
    assert(rows(1L).getDouble(5) == round4(4.0 / 34.0), s"${rows(1L)}")
    // doc 2: bullet_ratio 2/3 (≤0.9 → NOT a failure); it passes
    assert(rows(2L).getDouble(6) == round4(2.0 / 3.0), s"${rows(2L)}")
    assert(rows(2L).getBoolean(8), s"${rows(2L)}")
    // doc 3: alpha_ratio 16/36 < 0.8 → fail
    assert(rows(3L).getDouble(3) == round4(16.0 / 36.0))
    assert(!rows(3L).getBoolean(8))
    // doc 4: 4 words < MinWords → fail, stop_hits still found
    assert(rows(4L).getLong(1) == 4L && !rows(4L).getBoolean(8))
  }

  test("t21: empty text yields zero words, null means, pass=false (not null)") {
    val tmp = java.nio.file.Files.createTempDirectory("gopherEmpty").toString
    docsDf(Seq("")).write.parquet(s"$tmp/documents.parquet")
    val r = QualityQueries.t21GopherQuality(spark, tmp).collect().head
    assert(r.getLong(1) == 0L)
    assert(r.isNullAt(2) && r.isNullAt(3), "ratios over zero words must be NULL")
    assert(!r.isNullAt(8) && !r.getBoolean(8),
      "Kleene false && null must land on false, not null")
  }

  // ---------------------------------------------------------------- t22

  test("t22: novelty is 1 for the first doc, 0 for its duplicate, exact for overlap") {
    val tmp = java.nio.file.Files.createTempDirectory("noveltyT").toString
    docsDf(Seq(
      "a b c d",       // grams: "a b c", "b c d" — both first here
      "a b c d",       // exact dup → 0 novel
      "a b c x y z",   // grams: "a b c"(old), "b c x", "c x y", "x y z" → 3/4
      "a b"))          // < 3 words → no grams → absent
      .write.parquet(s"$tmp/documents.parquet")
    val rows = QualityQueries.t22GramNovelty(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows == Map(
      0L -> ((2L, 2L, 1.0)),
      1L -> ((2L, 0L, 0.0)),
      2L -> ((4L, 3L, 0.75))), s"got $rows")
  }

  test("t22: within-doc repeated grams count once (distinct before the min-agg)") {
    val tmp = java.nio.file.Files.createTempDirectory("noveltyR").toString
    // "p q r p q r p q r" has 7 gram positions but only 3 distinct grams
    docsDf(Seq("p q r p q r p q r")).write.parquet(s"$tmp/documents.parquet")
    val r = QualityQueries.t22GramNovelty(spark, tmp).collect().head
    assert(r.getLong(1) == 3L && r.getDouble(3) == 1.0, s"$r")
  }
}
