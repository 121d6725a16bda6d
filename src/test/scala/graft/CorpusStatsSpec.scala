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

  // ---------------------------------------------------------------- h17

  /** Adamic-Adar corpus: a 2-star (hubpp→leftt/rightt: one predicted
    * pair, weight 1/ln 2), a 3-star (midpp: three pairs at 1/ln 3,
    * gone when the hub-cap dial drops below 3), a triangle (every
    * pair ADJACENT — wedges exist but the anti-join must eat them),
    * and an 8-star (wekpp: pair weight 1/ln 8 ≈ 0.481 — under the
    * 0.5 score floor). */
  private lazy val dirAa: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("h17corpus").toString
    val wk = Seq("wkaaa", "wkbbb", "wkccc", "wkddd", "wkeee", "wkfff", "wkggg", "wkhhh")
    val texts =
      Seq("hubpp leftt pad", "hubpp rightt pad",
        "midpp aaone pad", "midpp aatwo pad", "midpp aathree pad",
        "adjaa adjbb pad", "adjaa adjcc pad", "adjbb adjcc pad") ++
        wk.map(w => s"wekpp $w pad")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("h17: predicts exactly the non-adjacent wedge pairs above the floor, exact scores") {
    val rows = GraphQueries.h17AdamicAdar(spark, dirAa).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    def w(deg: Int) = math.rint(1.0 / math.log(deg.toDouble) * 1e6) / 1e6
    // triangle pairs are adjacent (excluded despite their wedges);
    // wekpp's 28 pairs sit under the 0.5 floor at 1/ln 8.
    assert(rows.keySet == Set(("leftt", "rightt"),
      ("aaone", "aathree"), ("aaone", "aatwo"), ("aathree", "aatwo")), rows.keySet.toString)
    assert(rows(("leftt", "rightt")) == ((1L, w(2))), rows.toString)
    assert(rows(("aaone", "aatwo")) == ((1L, w(3))), rows.toString)
  }

  test("h17: the hub-cap dial removes wedges pivoting on entities above it") {
    import graft.plans.HippoGraph
    val rows = GraphQueries.adamicAdarPairs(HippoGraph.edges(spark, dirAa), hubCap = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("leftt", "rightt")),
      s"deg-3 midpp must stop pivoting under cap 2: $rows")
  }

  // ---------------------------------------------------------------- t19

  test("t19: entropy is exact on planted uniform/constant/skewed/empty docs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t19corpus").toString
    val docs = Seq(
      (0L, "aa bb cc dd"),  // uniform: H = ln 4, norm = 1
      (1L, "xx xx xx xx"),  // single token: pinned 0, 0
      (2L, ""),             // token-less: zeros via the left join
      (3L, "yy yy zz zz"),  // two evens: H = ln 2, norm = 1
      (4L, "pp pp pp qq"))  // skewed: H = ln 4 − (3 ln 3)/4, norm < 1
    docs.map { case (i, t) => (i, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextQueries.t19TokenEntropy(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(rows(0L) == ((4L, 4L, r6(math.log(4)), 1.0)), rows(0L).toString)
    assert(rows(1L) == ((4L, 1L, 0.0, 0.0)), rows(1L).toString)
    assert(rows(2L) == ((0L, 0L, 0.0, 0.0)), rows(2L).toString)
    val h3 = math.log(4) - (2 * math.log(2) + 2 * math.log(2)) / 4
    assert(rows(3L) == ((4L, 2L, r6(h3), r6(h3 / math.log(2)))), rows(3L).toString)
    val h4 = math.log(4) - 3 * math.log(3) / 4
    assert(rows(4L)._3 == r6(h4) && rows(4L)._4 < 1.0, rows(4L).toString)
    // the quality signal orders: templated < skewed < uniform
    assert(rows(1L)._3 < rows(4L)._3 && rows(4L)._3 < rows(0L)._3)
  }

  // ---------------------------------------------------------------- q19

  /** Anomaly corpus: type "tickk" alternates 8/12 events per hour for
    * 30 hours (nonzero history variance) then spikes to 30 in hour
    * 30; type "flatt" holds a constant 10 — a flat history has NO
    * z-score (std 0 → NULL), not an infinite one. */
  test("q19: the planted spike is the only anomaly; flat history yields NULL z") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q19anom").toString
    val base = 1700000000000000L // epoch micros
    def hours(typ: String, counts: Seq[Int]): Seq[(String, Long)] =
      counts.zipWithIndex.flatMap { case (n, h) =>
        (0 until n).map(i => (typ, base + h * 3600000000L + i * 1000000L))
      }
    val tick = hours("tickk", (0 until 30).map(h => if (h % 2 == 0) 12 else 8) :+ 30)
    val flat = hours("flatt", Seq.fill(31)(10))
    (tick ++ flat).zipWithIndex
      .map { case ((typ, us), i) => (i.toLong, i.toLong % 7, us, typ, 1.0, "{}") }
      .toDF("event_id", "user_id", "us", "event_type", "value", "props")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"),
        col("value"), col("props"))
      .write.parquet(s"$tmp/events.parquet")
    val rows = graft.operators.CoreQueries.q19RollingAnomaly(spark, tmp).collect()
    val byType = rows.groupBy(_.getString(0))
    // warm-up: nothing emits before AnomalyMinHist buckets of history
    assert(rows.forall(_.getLong(3) >= graft.operators.CoreQueries.AnomalyMinHist))
    assert(byType("tickk").length == 31 - graft.operators.CoreQueries.AnomalyMinHist)
    val anomalies = rows.filter(_.getInt(7) == 1)
    assert(anomalies.length == 1, s"only the spike flags: ${anomalies.mkString("; ")}")
    val spike = anomalies.head
    assert(spike.getString(0) == "tickk" && spike.getLong(2) == 30L)
    assert(spike.getDouble(6) > 9.0, s"spike z: $spike") // (30−10)/2.043 ≈ 9.8
    // flat history: std 0 → z NULL on every emitted flatt row
    assert(byType("flatt").forall(r => r.isNullAt(6) && r.getInt(7) == 0))
    // steady rows score |z| ≈ 1 — far under the threshold
    assert(byType("tickk").filter(_.getLong(2) < 30L).forall(r => math.abs(r.getDouble(6)) < 1.2))
  }

  // ---------------------------------------------------------------- v12

  /** MMR corpus: the query axis e0; a1 = e0+e1 and its near-copy a2;
    * b = e0+e2 equally relevant but diverse (sim to a1 = 0.5); d = e3
    * irrelevant; f = −e0 anti-relevant. Plain top-2 is {a1, a2}; MMR
    * must pick the diverse b second, the near-copy third. */
  test("v12: MMR picks the diverse candidate over the near-duplicate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("v12mmr").toString
    def vec(parts: (Int, Float)*): Array[Float] = {
      val v = Array.fill(64)(0.0f); parts.foreach { case (i, x) => v(i) = x }; v
    }
    val vecs = Seq(
      (0L, vec(0 -> 1.0f), 0),            // query
      (1L, vec(0 -> 1.0f, 1 -> 1.0f), 1), // a1
      (2L, vec(0 -> 1.0f, 1 -> 1.001f), 1), // a2: sim(a1,a2) ≈ 0.99997
      (3L, vec(0 -> 1.0f, 2 -> 1.0f), 1), // b: rel ties a1, id breaks to a1
      (4L, vec(3 -> 1.0f), 1),            // d: orthogonal, rel 0
      (5L, vec(0 -> -1.0f), 1))           // f: anti-relevant
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    val rows = graft.operators.VectorQueries.v12Mmr(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((1, 1L), (2, 3L), (3, 2L), (4, 4L), (5, 5L)),
      s"greedy order: ${rows.mkString("; ")}")
    // rank-2 diversity beat: b's margin score must exceed what the
    // near-copy a2 scored when it was finally picked
    assert(rows(1)._3 > rows(2)._3, rows.mkString("; "))
    // a near-perfect duplicate at λ=0.7 scores ≈ 0.7·rel − 0.3·1
    assert(math.abs(rows(2)._3 - (0.7 * 0.706764 - 0.3 * 0.999965)) < 1e-3)
  }

  // ---------------------------------------------------------------- t20

  test("t20: size-weighted sampling is exact vs an independent A-ES reimplementation") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t20wsamp").toString
    // 100 short docs (w=10), one whale (w=10⁹, its ln(u)/w ≈ −1e−8
    // beats every short doc's ≈ −0.1 key), one zero-length doc
    // (excluded: zero weight has no A-ES key)
    val docs = (0L until 100L).map(i => (i, "short", "en", "planted", 10L)) ++
      Seq((100L, "whale", "en", "planted", 1000000000L),
        (101L, "", "en", "planted", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextQueries.t20WeightedSample(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.length == TextQueries.WeightedSampleK)
    // independent reimplementation of the key: java MessageDigest md5
    // → first 8 nibbles folded → (h+0.5)/2³² → ln(u)/w, HALF_UP round
    def esKey(docId: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = hex.foldLeft(0L)((acc, c) => acc * 16 +
        (if (c <= '9') c - '0' else c - 'a' + 10))
      val u = (h.toDouble + 0.5) / 4294967296.0
      BigDecimal(math.log(u) / w).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = ((0L until 100L).map(i => (i, esKey(i, 10L))) :+
      ((100L, esKey(100L, 1000000000L))))
      .sortBy { case (id, k) => (-k, id) }.take(TextQueries.WeightedSampleK)
    assert(rows.toSeq == expected.toSeq,
      s"first diff: ${rows.zip(expected).find(p => p._1 != p._2)}")
    // the whale's size dominates: it must rank first
    assert(rows.head._1 == 100L, rows.take(3).mkString("; "))
    // the zero-weight doc never appears
    assert(!rows.exists(_._1 == 101L))
  }

  // ---------------------------------------------------------------- t26

  test("t26: temperature mixing keeps small sources whole, halves the whale, matches the independent coin exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t26mix").toString
    // planted skew: a 400-doc crawl whale + 16-doc and 4-doc curated
    // sources. f = min(1, 0.5·sqrt(400/n_s)): whale 0.5, n=16 →
    // 0.5·5 = 1, n=4 → 1 — the flattening in one corpus.
    val docs = (0L until 400L).map(i => (i, s"w$i", "en", "crawl")) ++
      (400L until 416L).map(i => (i, s"c$i", "en", "curated")) ++
      (416L until 420L).map(i => (i, s"b$i", "en", "books"))
    docs.map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val kept = TextQueries.t26SourceMixture(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // small sources keep EVERY doc (f == 1)
    assert(bySrc.getOrElse("curated", 0) == 16 && bySrc.getOrElse("books", 0) == 4, bySrc.toString)
    // the whale's kept SET is exactly {u(doc_id) < 0.5} — independent
    // MessageDigest recompute of the coin
    def u(docId: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = hex.foldLeft(0L)((acc, c) => acc * 16 +
        (if (c <= '9') c - '0' else c - 'a' + 10))
      (h.toDouble + 0.5) / 4294967296.0
    }
    val expectWhale = (0L until 400L).filter(u(_) < 0.5).toSet
    val gotWhale = kept.filter(_._2 == "crawl").map(_._1).toSet
    assert(gotWhale == expectWhale,
      s"whale membership drifted: ${gotWhale.size} vs ${expectWhale.size}")
    // flattening is real: the whale's share of the MIX is well under
    // its 95% share of the corpus
    val whaleShare = gotWhale.size.toDouble / kept.length
    assert(whaleShare < 0.95 && whaleShare > 0.5, whaleShare.toString)
  }

  // ---------------------------------------------------------------- d14

  test("d14: containment flags the quoted-inside pair Jaccard misses; the df band caps boilerplate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d14cont").toString
    val a = "alpha beta gamma delta epsilon zeta eta theta" // 4 five-grams
    val b = a + " " + (1 to 12).map(i => f"extra$i%02d").mkString(" ") // contains all of A
    val c = "gamma delta epsilon zeta eta theta iota kappa" // shares 2 of A's grams
    val boiler = "common token run repeated everywhere" // ONE gram, df = 67
    val docs = Seq((0L, a), (1L, b), (2L, c)) ++
      (10L until 77L).map(i => (i, boiler))
    docs.map { case (i, t) => (i, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = graft.operators.DedupQueries.d14Containment(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // only the quoted-whole pair clears τ: C(A,B) = 4/min(4,16) = 1.0
    // (its Jaccard is 4/16 = 0.25 — d02/d04's resemblance threshold
    // never fires); the 0.5-containment overlap pair is a candidate
    // but floors out; the 67-doc boilerplate sits outside the df band
    assert(rows == Map((0L, 1L) -> ((4L, 1.0))), rows.toString)
    // dial proof: widening the band makes the boilerplate pairs (an
    // exact-dup clique — d01's job, not d14's) explode back in
    val wide = graft.operators.DedupQueries.containmentPairs(
      spark.read.parquet(s"$tmp/documents.parquet").select("doc_id", "text"),
      dfCap = 100L).count()
    assert(wide == 67L * 66 / 2 + 1, s"uncapped pairing: $wide")
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

  test("q24: the 48-hour deadline cuts stages q16 would count") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q24funnel").toString
    def us(h: Long) = h * 3600L * 1000000L
    // u1: click at 47h (in), purchase at 49h (PAST the deadline
    // anchored at first view — must not count though it is
    // strictly-after the click). u2: full funnel inside 2h. u3:
    // click at 49h — past deadline, stalls at view.
    val events = Seq(
      (1L, 1L, us(0), "view"), (2L, 1L, us(47), "click"), (3L, 1L, us(49), "purchase"),
      (4L, 2L, us(0), "view"), (5L, 2L, us(1), "click"), (6L, 2L, us(2), "purchase"),
      (7L, 3L, us(0), "view"), (8L, 3L, us(49), "click"))
    events.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))
      .write.parquet(s"$tmp/events.parquet")
    val q24 = graft.operators.CoreQueries.q24WindowFunnel(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q24 == Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L), q24.toString)
    // q16 on the same events counts them all — the two answers differ
    // exactly by the deadline.
    val q16 = graft.operators.CoreQueries.q16EventFunnel(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q16 == Map("1_view" -> 3L, "2_click" -> 3L, "3_purchase" -> 2L), q16.toString)
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

  // ---------------------------------------------------------------- h19

  test("h19: rank decays with distance from the seeds; unreachable entities get NO row") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("h19ppr").toString
    // window—nearaa—fartwo chain hanging off the 'window' seed; the
    // lonely—otherx island never touches a seed. 'spark' (the other
    // ProbeUnion seed) is absent from the corpus: it must keep
    // exactly its teleport mass.
    val texts = Seq("window nearaa pad", "nearaa fartwo pad", "lonely otherx pad")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = GraphQueries.h19PersonalizedRank(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set("window", "nearaa", "fartwo", "spark"),
      s"the island must be absent, the edgeless seed present: ${rows.keySet}")
    // With 3 synchronous rounds mass OSCILLATES along a path (the
    // h10 convention keeps the round count fixed, not converged), so
    // the guaranteed shape is: the 1-hop neighbour beats the 2-hop
    // node, the seed never drops below its own teleport mass.
    assert(rows("nearaa") > rows("fartwo"),
      s"1-hop must outrank 2-hop: $rows")
    assert(rows("window") >= 0.075 && rows("fartwo") > 0, rows.toString)
    // an edgeless seed holds exactly (1−d)/|S| = 0.15/2
    assert(rows("spark") == 0.075, s"${rows("spark")}")
  }

  // ---------------------------------------------------------------- h18

  test("h18: a constructed two-point degree histogram fits slope −2, r² = 1 exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("h18corpus").toString
    // 8 entities of fact-degree 1 (one single-fact doc each) and 2 of
    // degree 2 (two docs each): n(1)=8, n(2)=2 → the two-point ln/ln
    // fit is EXACT: slope = ln(2/8)/ln 2 = −2, r² = 1. "pad" stays
    // under MinEntityLen and never becomes an entity.
    val texts = (1 to 8).map(i => s"only${i}xx pad") ++
      Seq("twiceaa pad", "twiceaa pad", "twicebb pad", "twicebb pad")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val r = GraphQueries.h18DegreePowerlaw(spark, tmp).collect().head
    assert(r.getInt(0) == 2 && r.getLong(1) == 10L && r.getLong(2) == 2L, s"$r")
    assert(r.getDouble(3) == -2.0, s"slope: $r")
    assert(r.getDouble(4) == 1.0, s"r2: $r")
  }
}
