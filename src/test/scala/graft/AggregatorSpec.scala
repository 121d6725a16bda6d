package graft

import org.apache.spark.sql.functions._

import graft.functions.HllSketch
import graft.operators.VectorQueries
import graft.sources.Tables

class AggregatorSpec extends SparkSpec {

  test("v06 typed top-k aggregation equals the window formulation") {
    import spark.implicits._
    val agg = VectorQueries.v06KnnAgg(spark, sf0001)
      .select("query_id", "vec_id", "cos", "rk")
    // independent window-based reference
    val e = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v", "label")
    val q = e.filter(col("label") === 1)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val win = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.VectorFunctions.cosineNative6(col("v"), col("qv")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("query_id", "vec_id", "cos", "rk")
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
    assert(agg.count() > 0)
  }

  test("TopKAgg drops exact (score,id) duplicates — LSH multi-table collisions need no pre-dedup") {
    import spark.implicits._
    // every entry duplicated 3x (the multi-table collision shape):
    // the distinct top-3 must come out, not 3 copies of the best
    val rows = Seq.tabulate(30)(i => (1L, (i % 10).toDouble, (i % 10).toLong))
    val top = new graft.functions.TopKAggregator(3).toColumn
    val viaState = {
      val st = new org.apache.spark.sql.graft.TopKState(3)
      rows.foreach { case (_, s, id) => st.add(s, id) }
      (0 until st.n).map(i => (st.scores(i), st.ids(i)))
    }
    assert(viaState == Seq((9.0, 9L), (8.0, 8L), (7.0, 7L)))
    // and through the full aggregate path (partials + merge)
    val out = rows.toDF("qid", "cos", "vec_id")
      .repartition(4)
      .groupBy("qid")
      .agg(org.apache.spark.sql.graft.TopKAgg.topK(col("cos"), col("vec_id"), 3).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.cos"), col("t.vec_id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((9.0, 9L), (8.0, 8L), (7.0, 7L)))
    // ties on score with DIFFERENT ids are kept (not duplicates)
    val st2 = new org.apache.spark.sql.graft.TopKState(3)
    Seq((5.0, 1L), (5.0, 2L), (5.0, 1L), (5.0, 3L)).foreach { case (s, id) => st2.add(s, id) }
    assert((0 until st2.n).map(i => (st2.scores(i), st2.ids(i))) ==
      Seq((5.0, 1L), (5.0, 2L), (5.0, 3L)))
  }

  test("HLL sketch estimates distinct counts within expected error") {
    import spark.implicits._
    val users = Tables.events(spark, sf001).select(col("user_id")).as[Long]
    val exact = users.distinct().count()
    val est = users.select(new HllSketch(12).toColumn.name("est")).head()
    val err = math.abs(est - exact).toDouble / exact
    info(s"HLL: est=$est exact=$exact err=${(err * 100).round}%")
    assert(err < 0.05, s"HLL error $err too high (est=$est, exact=$exact)")
  }

  test("HLL sketch stays accurate far above the small-range regime") {
    import spark.implicits._
    // 200k distinct longs >> m*ln(m) ~ 34k at p=12: this cardinality is
    // served by the raw harmonic-mean estimate, not the linear-counting
    // small-range branch — a degenerate rank computation (constant rank)
    // collapses here even when small inputs look fine.
    val n = 200000L
    val est = spark.range(n).as[Long].select(new HllSketch(12).toColumn.name("est")).head()
    val err = math.abs(est - n).toDouble / n
    info(s"HLL large: est=$est exact=$n err=${(err * 100).round}%")
    assert(err < 0.05, s"HLL error $err too high at large cardinality (est=$est)")
  }

  test("graft_hll is callable from plain SQL after SqlFunctions.register") {
    graft.functions.SqlFunctions.register(spark)
    val est = spark.sql("SELECT graft_hll(id) AS e FROM range(10000)")
      .head().getLong(0)
    assert(math.abs(est - 10000).toDouble / 10000 < 0.05, s"est=$est")
  }

  test("graft_dot is callable from plain SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_nfc is callable from plain SQL and folds decomposed accents") {
    // 'e' + U+0301 COMBINING ACUTE must normalize to precomposed é
    val r = spark.sql("SELECT graft_nfc('Cafe\u0301') AS t").head().getString(0)
    assert(r == "Caf\u00e9" && r.length == 4)
    // null-safe + already-NFC identity
    assert(spark.sql("SELECT graft_nfc(CAST(NULL AS STRING))").head().isNullAt(0))
    assert(spark.sql("SELECT graft_nfc('plain ascii')").head().getString(0) == "plain ascii")
  }

  test("Misra-Gries FreqSketch keeps every item above n/k at any parallelism") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 50
    val tokens = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .as[String]
    val n = tokens.count()
    val exact = tokens.groupByKey(identity).count().collect().toMap
    val mustKeep = exact.filter { case (_, c) => c > n / k }.keySet
    assert(mustKeep.nonEmpty, "corpus has no heavy hitters at n/k — weak test data")
    for (parts <- Seq(1, 13)) { // MG output depends on partitioning; the GUARANTEE must not
      val sketch = tokens.repartition(parts)
        .select(new graft.functions.FreqSketch(k).toColumn)
        .head().toMap
      assert(sketch.size <= k - 1, s"sketch exceeded k-1 counters: ${sketch.size}")
      val missing = mustKeep -- sketch.keySet
      assert(missing.isEmpty, s"items above n/k missing at parts=$parts: $missing")
      // reported counts are lower bounds within n/k of the truth
      sketch.foreach { case (i, c) =>
        assert(c <= exact(i), s"over-estimate for $i")
        assert(exact(i) - c <= n / k, s"error beyond n/k for $i")
      }
    }
  }

  test("t07b sketch top-k == exact t07 when vocab < k; LOSSY regime keeps the hitters and the bound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // exactness half: 31-word corpus vocab < k=50 -> MG never evicts,
    // the entry must reproduce t07 row-for-row (the oracle-share claim)
    val sk = graft.operators.TextQueries.t07bTopTokensSketch(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = graft.operators.TextQueries.t07TopTokens(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sk == exact, s"vocab<k must be exact: $sk vs $exact")
    // lossy half: 200 distinct light tokens + 3 planted heavy hitters,
    // k=16 counters — eviction happens, hitters survive, bound holds
    val k = 16
    val heavy = Seq.fill(300)("aaa") ++ Seq.fill(250)("bbb") ++ Seq.fill(200)("ccc")
    val light = (0 until 200).flatMap(i => Seq.fill(2)(f"w$i%03d"))
    val toks = spark.createDataset(new scala.util.Random(7).shuffle(heavy ++ light))
      .repartition(7)
    val n = heavy.size + light.size
    val sketch = toks.select(new graft.functions.FreqSketch(k).toColumn).head().toMap
    assert(sketch.size <= k - 1)
    Seq("aaa" -> 300L, "bbb" -> 250L, "ccc" -> 200L).foreach { case (t, c) =>
      assert(sketch.contains(t), s"heavy hitter $t evicted")
      assert(sketch(t) <= c && c - sketch(t) <= n / k,
        s"$t count ${sketch(t)} outside the n/k bound of $c")
    }
  }

  test("FreqSketch pass-1 plan partial-aggregates map-side (the sketch exchange carries O(k), never the token stream)") {
    // The t07b entry's returned plan is the pass-2 checkpoint scan,
    // so the Explain audit no longer sees the sketch half — this pin
    // replaces the old partial_freqsketch needle: the scale premise
    // (per-partition MG buffers, O(k) entries over the exchange)
    // must stay visible in the aggregation plan itself.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .as[String]
    val plan = toks
      .select(new graft.functions.FreqSketch(50).toColumn.name("top"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("partial_freqsketch"),
      "the MG sketch must partial-aggregate map-side")
    assert(plan.contains("ObjectHashAggregate"),
      "the typed aggregator must run as ObjectHashAggregate")
  }

  test("twoPassTopTokens: certified-exact on a skewed stream (budget < vocab, D > 0); exact fallback on a flat one") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def exactTopK(toks: org.apache.spark.sql.DataFrame, k: Int) =
      rows(toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(k))
    // Skewed: 3 heavy hitters over 200 light tokens, budget 16 —
    // the sketch EVICTS (vocab 203 > 15 counters), D > 0, yet the
    // k-th candidate's exact count clears the bound: the certificate
    // must pass and the rows must equal the brute top-k.
    val skewed = (Seq.fill(300)("aaa") ++ Seq.fill(250)("bbb") ++
      Seq.fill(200)("ccc") ++ (0 until 200).flatMap(i => Seq.fill(2)(f"w$i%03d")))
    val skewedDf = spark.createDataset(
      new scala.util.Random(11).shuffle(skewed)).toDF("token").repartition(7)
    val got = graft.operators.TextQueries.twoPassTopTokens(
      spark, skewedDf, k = 3, budget = 16)
    assert(rows(got) == exactTopK(skewedDf, 3),
      "certified two-pass diverged from the exact top-k")
    assert(plan(got).contains("Scan ExistingRDD"),
      "the certified path must serve from the bounded pass-2 blocks")
    // Flat: 200 tokens x 5 each — no sublinear exact top-k exists;
    // the certificate must FAIL and the fallback must still be exact
    // (never a lossy answer).
    val flatDf = spark.createDataset(
      new scala.util.Random(13).shuffle(
        (0 until 200).flatMap(i => Seq.fill(5)(f"w$i%03d")): Seq[String]))
      .toDF("token").repartition(7)
    val gotFlat = graft.operators.TextQueries.twoPassTopTokens(
      spark, flatDf, k = 3, budget = 16)
    assert(rows(gotFlat) == exactTopK(flatDf, 3),
      "fallback must still return the exact top-k")
    assert(!plan(gotFlat).contains("Scan ExistingRDD"),
      "a failed certificate must fall back to the full aggregation")
  }
}
