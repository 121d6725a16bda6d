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
}
