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

  test("sf mismatch and malformed files degrade to None") {
    assert(Bench.parseBenchFile(tmp(line), "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parseBenchFile(tmp("not json at all"), "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parseBenchFile(
      tmp("""{"n":6,"tail":"no bench line here"}"""), "/root/testdata/sf0.1").isEmpty)
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
}
