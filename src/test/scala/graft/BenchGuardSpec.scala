package graft

import org.scalatest.funsuite.AnyFunSuite

/** Trend-guard parsing: the previous round's bench numbers must load
  * from either a raw bench line or the driver's wrapper JSON — and
  * the r6 driver wrapper TRUNCATES the head of the embedded line
  * (its "tail" starts mid-value, before "unit"), so the parser may
  * not require the {"metric" prefix. */
class BenchGuardSpec extends AnyFunSuite {

  private def tmp(content: String): java.io.File = {
    val f = java.io.File.createTempFile("bench", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, content)
    f
  }

  private val line =
    """{"metric":"total","value":31.5,"unit":"sec","queries":{"q01":0.2,"d04":2.8},"sf":"/root/testdata/sf0.1","repeats":3,"prev":null,"regressions":{}}"""

  test("raw bench line parses") {
    val got = Bench.parseBenchFile(tmp(line), "/root/testdata/sf0.1")
    assert(got.map(_._2) == Some(Map("q01" -> 0.2, "d04" -> 2.8)))
  }

  test("driver wrapper with full tail parses") {
    val wrapper = s"""{"n":6,"rc":0,"tail":${jsonStr(line + "\n[success]")}}"""
    val got = Bench.parseBenchFile(tmp(wrapper), "/root/testdata/sf0.1")
    assert(got.map(_._2) == Some(Map("q01" -> 0.2, "d04" -> 2.8)))
  }

  test("driver wrapper with TRUNCATED tail parses (the r6 artifact shape)") {
    // Head of the line cut mid-value, as in BENCH_r06.json.
    val cut = line.substring(line.indexOf("31.5"))
    val wrapper = s"""{"n":6,"rc":0,"tail":${jsonStr(cut + "\n[success] Total time")}}"""
    val got = Bench.parseBenchFile(tmp(wrapper), "/root/testdata/sf0.1")
    assert(got.map(_._2) == Some(Map("q01" -> 0.2, "d04" -> 2.8)))
  }

  test("driver wrapper truncated PAST the queries needle parses (the r7 artifact shape)") {
    // BENCH_r07's tail starts mid-value INSIDE the queries object —
    // no "queries": left to anchor on; the scan fallback recovers the
    // surviving per-query pairs (names all carry underscores) and
    // must not swallow scalar fields or regression ratios.
    val fullLine =
      """{"metric":"total","value":34.4,"unit":"sec","queries":{"q01_pricing_summary":0.25,"d04_ngram_jaccard":2.8,"v09_ann_pq":0.5},"sf":"/root/testdata/sf0.1","repeats":3,"prev":"BENCH_r06.json","regressions":{"d05_embed_neardup":2.2}}"""
    val cut = fullLine.substring(fullLine.indexOf("""0.25,"d04"""))
    val wrapper = s"""{"n":7,"rc":0,"cpus":32,"sf":0.1,"tail":${jsonStr(cut + "\n[success] Total time: 195 s")},"parsed":null}"""
    val got = Bench.parseBenchFile(tmp(wrapper), "/root/testdata/sf0.1")
    assert(got.map(_._2) ==
      Some(Map("d04_ngram_jaccard" -> 2.8, "v09_ann_pq" -> 0.5)),
      s"got $got")
  }

  test("the real BENCH_r07.json artifact recovers its surviving entries") {
    val f = new java.io.File("BENCH_r07.json")
    assume(f.isFile, "repo-root BENCH_r07.json not present")
    val got = Bench.parseBenchFile(f, "/root/testdata/sf0.1")
    assert(got.nonEmpty, "r7 artifact must no longer degrade to None")
    val qs = got.get._2
    assert(qs.size > 50, s"expected most of the 67 entries, got ${qs.size}")
    assert(qs.contains("v09_ann_pq") && qs.contains("t04_fingerprint"))
    assert(!qs.contains("value") && !qs.contains("repeats"))
  }

  test("sf mismatch and malformed files degrade to None") {
    assert(Bench.parseBenchFile(tmp(line), "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parseBenchFile(tmp("not json at all"), "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parseBenchFile(
      tmp("""{"n":6,"tail":"no bench line here"}"""), "/root/testdata/sf0.1").isEmpty)
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""

  // ---------------------------------------- co-tenancy detector

  test("uniformly elevated ratios (the r11 driver-window shape) read as co-tenant") {
    // 20 queries all ~1.33x slower with small jitter — the measured
    // r11 signature (uniform spread across unrelated trivial queries)
    val ratios = (0 until 20).map(i =>
      s"q${i}_x" -> (1.33 + 0.03 * math.sin(i.toDouble))).toMap
    val r = Bench.detectNoise(ratios, Set.empty)
    assert(r.verdict == "co-tenant", s"got ${r.verdict}")
    assert(math.abs(r.medianRatio - 1.33) < 0.05)
    assert(r.rerunTargets.size == 5, "co-tenant verdict cross-checks the top 5")
  }

  test("one isolated 3x spike over flat ratios reads as regression-suspect, not co-tenant") {
    val ratios = (0 until 20).map(i =>
      s"q${i}_x" -> (1.0 + 0.02 * math.cos(i.toDouble))).toMap + ("d04_x" -> 3.0)
    val r = Bench.detectNoise(ratios, Set("d04_x"))
    assert(r.verdict == "regression-suspect", s"got ${r.verdict}")
    assert(r.rerunTargets == Seq("d04_x"),
      "only the flagged query re-runs isolated on a quiet machine")
  }

  test("flat ratios with no flags read quiet; empty ratios read no-prev") {
    val flat = (0 until 20).map(i => s"q${i}_x" -> 1.01).toMap
    assert(Bench.detectNoise(flat, Set.empty).verdict == "quiet")
    assert(Bench.detectNoise(Map.empty, Set.empty).verdict == "no-prev")
  }

  test("uniform elevation over too few common queries does NOT read co-tenant") {
    // 4 queries can be uniformly slow by coincidence (shared kernel
    // regression); the verdict needs breadth
    val ratios = (0 until 4).map(i => s"q${i}_x" -> 1.4).toMap
    val r = Bench.detectNoise(ratios, Set.empty)
    assert(r.verdict != "co-tenant", s"got ${r.verdict}")
  }

  test("elevated-but-DISPERSE ratios (some 1x, some 4x) do not read co-tenant") {
    // a genuine mixed regression must not be absolved wholesale
    val ratios = (0 until 20).map(i =>
      s"q${i}_x" -> (if (i % 2 == 0) 1.0 else 4.0)).toMap
    val r = Bench.detectNoise(ratios, Set("q1_x"))
    assert(r.verdict == "regression-suspect", s"got ${r.verdict}")
  }

  // ---------------------------------------- known-trade annotations

  test("known trades split from unexplained drift; a blown budget stays a regression (VERDICT r15 #8)") {
    val trades = Map(
      "v15_knn_batch_ivf" -> (1.8, "small-model exhaustive arm buys exactness"),
      "d09_dedup_apply" -> (1.3, "survivor anti-join widened"))
    val raw = Map(
      "v15_knn_batch_ivf" -> 1.64, // within its 1.8x budget → trade
      "d09_dedup_apply" -> 2.4,    // blows its 1.3x budget → regression
      "h02_entity_neighbours" -> 2.1) // unannotated → regression
    val (unexplained, annotated) = Bench.classifyRegressions(raw, trades)
    assert(annotated == Map("v15_knn_batch_ivf" -> 1.64))
    assert(unexplained.keySet ==
      Set("d09_dedup_apply", "h02_entity_neighbours"))
    // no annotations (this round's shipped state): everything flagged
    // stays unexplained
    val (u2, a2) = Bench.classifyRegressions(raw, Map.empty)
    assert(a2.isEmpty && u2 == raw)
  }

  test("SPARK_GRAFT_TRADES env form parses name:budget:reason entries; malformed entries refuse (r17, VERDICT r16 #6)") {
    val parsed = Bench.parseTradesEnv(
      "q06_selective_filter:4.0:synthetic one-round annotation; " +
      "v15_knn_batch_ivf:1.8:exactness trade: with a colon in the reason")
    assert(parsed == Map(
      "q06_selective_filter" -> (4.0, "synthetic one-round annotation"),
      "v15_knn_batch_ivf" ->
        (1.8, "exactness trade: with a colon in the reason")))
    val ex = intercept[IllegalArgumentException] {
      Bench.parseTradesEnv("justaname")
    }
    assert(ex.getMessage.contains("name:budget:reason"))
  }
}
