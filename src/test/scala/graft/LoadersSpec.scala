package graft

import java.nio.file.Files

import graft.sources.Loaders

/** Offline Wikipedia-dump loader (reference loaders.py:6-11
  * load_wikipedia) on a planted 3-page mini-dump. */
class LoadersSpec extends SparkSpec {

  private lazy val dump: String = {
    val dir = Files.createTempDirectory("graft-wiki").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-000.jsonl")
    val pages = Seq(
      """{"id": "1", "url": "https://en.wikipedia.org/wiki/Apache_Spark", "title": "Apache Spark", "text": "Apache Spark is a distributed engine. It runs on clusters."}""",
      """{"id": "2", "url": "https://en.wikipedia.org/wiki/Spark_plug", "title": "Spark plug", "text": "A spark plug ignites fuel."}""",
      """{"id": "3", "url": "https://en.wikipedia.org/wiki/Hippocampus", "title": "Hippocampus", "text": "The hippocampus forms memories."}""")
    Files.write(f.toPath, pages.mkString("\n").getBytes("UTF-8"))
    f.getAbsolutePath
  }

  test("gzip corpora load transparently (real dumps ship as .jsonl.gz / .txt.gz)") {
    import java.util.zip.GZIPOutputStream
    val dir = Files.createTempDirectory("graft-gz").toFile
    dir.deleteOnExit() // only effective once the files below register too
    def gz(name: String, content: String): Unit = {
      val f = new java.io.File(dir, name)
      f.deleteOnExit()
      val out = new GZIPOutputStream(new java.io.FileOutputStream(f))
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    gz("a.jsonl.gz",
      """{"text": "compressed jsonl row one", "lang": "en"}
        |{"text": "compressed jsonl row two"}""".stripMargin)
    gz("b.txt.gz", "a whole compressed document")
    val jsonl = Loaders.loadJsonl(spark, s"$dir/*.jsonl.gz")
    assert(jsonl.count() == 2)
    assert(jsonl.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    val txt = Loaders.loadText(spark, s"$dir/*.txt.gz").collect()
    assert(txt.length == 1 && txt.head.getString(1) == "a whole compressed document")
  }

  test("loadWikipediaDump: 3 pages, canonical documents schema + title") {
    val df = Loaders.loadWikipediaDump(spark, dump)
    assert(df.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars", "title"))
    val rows = df.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") >= 0L)
      assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length.toLong)
      assert(r.getAs[String]("lang") == "und") // dump has no lang field
      assert(r.getAs[String]("source").startsWith("https://"))
    }
  }

  test("loadWikipediaDump: doc ids are stable across re-reads") {
    val a = Loaders.loadWikipediaDump(spark, dump)
      .select("title", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Loaders.loadWikipediaDump(spark, dump)
      .select("title", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size == 3, "ids must be distinct")
  }

  test("loadWikipedia: first matching page, prefix match ranks before substring") {
    // "spark" matches both pages; "Spark plug" is a PREFIX match and
    // must win over the substring match in "Apache Spark".
    val hit = Loaders.loadWikipedia(spark, "spark", dump).collect()
    assert(hit.length == 1)
    assert(hit(0).getAs[String]("title") == "Spark plug")
    // unique-match and no-match behavior (reference returns None)
    val hippo = Loaders.loadWikipedia(spark, "hippo", dump).collect()
    assert(hippo.length == 1 && hippo(0).getAs[String]("title") == "Hippocampus")
    assert(Loaders.loadWikipedia(spark, "nonexistent", dump).isEmpty)
  }

  test("loadWikipediaDump feeds Graft.annotate (documents-schema compatible)") {
    val api = new graft.api.Graft(spark)
    val db = api.annotate(Loaders.loadWikipediaDump(spark, dump))
    assert(db.facts.count() > 0)
    assert(db.edges.count() > 0)
    val (nF, nE, missing) = db.integrity
    assert(nF == nE && missing == 0L)
  }
}
