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

  test("s05 token windows: exact planted windows; coverage and overlap invariants on the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.SplitterQueries
    // Planted: 20 tokens, W=16, S=12 → two windows [0,16) and [12,20)
    val tmp = java.nio.file.Files.createTempDirectory("s05").toString
    val t20 = (1 to 20).map(i => s"t$i").mkString(" ")
    val t10 = (1 to 10).map(i => s"t$i").mkString(" ")
    Seq((0L, t20, "en", "p", t20.length.toLong), (1L, t10, "en", "p", t10.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = SplitterQueries.s05TokenWindow(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.filter(_._1 == 0L).toSeq == Seq(
      (0L, 0, (1 to 16).map(i => s"t$i").mkString(" "), 0L, 16L),
      (0L, 1, (13 to 20).map(i => s"t$i").mkString(" "), 12L, 20L)),
      s"${rows.filter(_._1 == 0L).toSeq}")
    // T <= W → exactly one window spanning the whole doc
    assert(rows.filter(_._1 == 1L).toSeq == Seq((1L, 0, t10, 0L, 10L)))

    // Corpus invariants: windows tile with stride S (start = idx·S),
    // consecutive windows overlap by W − S tokens, last window ends
    // at n_toks — so every token is covered.
    val out = SplitterQueries.s05TokenWindow(spark, sf0001).cache()
    val s = SplitterQueries.WindowStride
    assert(out.filter(col("start_tok") =!= col("chunk_idx") * s).count() == 0)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks"))
    val last = out.groupBy("doc_id").agg(max("end_tok").as("mx"))
    assert(last.join(docs, "doc_id").filter(col("mx") =!= col("n_toks")).count() == 0,
      "last window must end at n_toks")
    assert(out.filter(col("end_tok") <= col("start_tok")).count() == 0,
      "no empty windows")
    out.unpersist()
  }
}
