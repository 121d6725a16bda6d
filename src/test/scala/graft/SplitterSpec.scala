package graft

import graft.operators.Splitters
import graft.sources.Tables

/** Invariants from the reference's test_splitters.py: first chunk
  * starts at 0, last chunk ends at len(text), positions slice the
  * original text exactly, chunks respect the size bound. */
class SplitterSpec extends SparkSpec {

  test("recursiveSplit invariants on multi-separator text") {
    val text = "Alpha beta gamma.\n\nSecond paragraph here. Third sentence, with clause; done now really " +
      "and then some more words to push past the chunk limit for recursion depth testing"
    val chunks = Splitters.recursiveSplit(text, 40)
    assert(chunks.nonEmpty)
    assert(chunks.head._2 == 0)
    assert(chunks.last._3 == text.length)
    chunks.foreach { case (c, s, e) =>
      assert(text.substring(s, e) == c, s"chunk text mismatch at $s..$e")
      assert(e - s <= 40 || !c.contains(" "), s"oversized breakable chunk: '$c'")
    }
    // positions strictly increase
    assert(chunks.map(_._2) == chunks.map(_._2).sorted)
  }

  test("recursiveSplit falls back to char split on unbreakable runs") {
    val text = "x" * 95
    val chunks = Splitters.recursiveSplit(text, 40)
    assert(chunks.map(_._1.length) == List(40, 40, 15))
    assert(chunks.last._3 == 95)
  }

  test("semanticSplit covers the text with in-order chunks") {
    val emb = new graft.functions.HashEmbedder(32)
    val text = ("alpha beta gamma delta " * 12).trim
    val chunks = Splitters.semanticSplit(text, emb, windowWords = 8)
    assert(chunks.nonEmpty)
    assert(chunks.head._2 == 0 && chunks.last._3 == text.length)
    chunks.foreach { case (c, s, e) => assert(text.substring(s, e) == c) }
    // deterministic
    assert(chunks == Splitters.semanticSplit(text, emb, windowWords = 8))
  }

  test("recursiveDf covers every document end-to-end") {
    val docs = Tables.documents(spark, sf0001)
    val out = Splitters.recursiveDf(spark, docs, 120).cache()
    import org.apache.spark.sql.functions._
    val perDoc = out.groupBy("doc_id")
      .agg(min("start").as("mn"), max("end").as("mx"), max(length(col("chunk"))).as("maxlen"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
    assert(perDoc.filter(col("mn") =!= 0).count() == 0)
    assert(perDoc.filter(col("mx") =!= col("len")).count() == 0)
    assert(perDoc.filter(col("maxlen") > 120).count() == 0)
    assert(out.count() > docs.count())
  }

  test("naive splitter: empty docs yield ONE empty chunk, never phantom indices") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, ""), (2L, "abcdefgh"), (3L, "abc")).toDF("doc_id", "text")
    val rows = Splitters.naive(docs, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3), r.getInt(4)))
    assert(rows.filter(_._1 == 1L).toSeq == Seq((1L, 0, "", 0, 0)),
      s"empty doc: ${rows.filter(_._1 == 1L).toSeq}")
    assert(rows.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq == Seq("abcde", "fgh"))
    assert(rows.forall(r => r._2 >= 0 && r._4 >= 0), "phantom negative index/start")
  }
}
