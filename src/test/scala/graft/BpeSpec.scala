package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** t24/t25 trained-BPE contracts: the exact hand-derived merge
  * sequence (including the tie-break and the early stop), encode
  * under a planted table, unicode safety, and the self-consistency
  * pin that freezes T25Merges to the trainer's own sf0.001 output. */
class BpeSpec extends SparkSpec {

  private def docsOf(texts: String*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("train reproduces the hand-derived merge sequence, tie-break and early stop") {
    // Corpus: "aaab" ×3, "aab" ×2. Hand derivation (counts weight by
    // word freq; ALL adjacent pairs count, overlaps included; merges
    // apply left-to-right non-overlapping):
    //  r1: (a,a)=2·3+1·2=8, (a,b)=3+2=5            → merge (a,a)
    //      aaab→[aa,a,b], aab→[aa,b]
    //  r2: (aa,a)=3, (a,b)=3, (aa,b)=2 — TIE at 3;
    //      (l,r) asc picks ("a","b") over ("aa","a") → merge (a,b)
    //      aaab→[aa,ab], aab unchanged
    //  r3: (aa,ab)=3, (aa,b)=2                      → merge (aa,ab)
    //  r4: only aab's (aa,b)=2 left                 → merge (aa,b)
    //  r5: no adjacent pair anywhere → EARLY STOP (4 < 10 requested)
    val merges = Bpe.train(spark, docsOf("aaab aaab aaab aab aab"), nMerges = 10)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("aa", "b")),
      merges.toString)
  }

  test("driver-side and distributed train routes produce the identical merge sequence") {
    // driverVocabMax = 0 forces the distributed rounds on the same
    // corpora the driver route handles (r17 size routing) — the two
    // loops must agree merge-for-merge, including the tie-break and
    // the early stop. Unicode words exercise the UTF-8-byte tie-break
    // order the driver route replicates from UTF8String.
    // The lrlr-shaped words (aaaa, abab, banana) pin the boundary-
    // space semantics: replace(" l r ", " lr ") consumes the shared
    // space, so back-to-back occurrences merge only once
    // (" a a a a " -> [aa, a, a]) — the driver walk must skip the
    // symbol after each merge, not greedily re-match at it.
    val corpora = Seq(
      docsOf("aaab aaab aaab aab aab"),
      docsOf("low lower lowest low low newer newest wider wide"),
      docsOf("😀😀b 😀b ab ab zz zz"),
      docsOf("aaaa aaaa aa"),
      docsOf("abab abab ab"),
      docsOf("banana banana an an"),
      docsOf("😀😀😀😀 😀😀"))
    corpora.foreach { docs =>
      val dist = Bpe.train(spark, docs, nMerges = 10, driverVocabMax = 0)
      val drv = Bpe.train(spark, docs, nMerges = 10)
      assert(drv == dist, s"driver $drv vs distributed $dist")
    }
  }

  test("encode under the planted table: full-word merges, partial merges, untouched words") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("aa", "b"))
    // aaab→1 token, aab→1, ab→1, ba→2 (no merge matches " b a "),
    // aaa→[aa,a]=2 (merge 1 is non-overlapping left-to-right)
    val rows = Bpe.encode(docsOf("aaab aab ab ba aaa"), merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, 5L, 1L + 1 + 1 + 2 + 2)), rows.mkString)
  }

  test("T25Merges IS t24's output on sf0.001 (the frozen table cannot drift from the trainer)") {
    val trained = Bpe.t24BpeTrain(spark, sf0001)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(trained == Bpe.T25Merges,
      s"re-freeze T25Merges: trainer now produces $trained")
  }

  test("merge-table artifact: save -> load round-trips and encodes identically to in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_artifact").toString
    val trained = Bpe.train(spark, docsOf("aaab aaab aaab aab aab"), nMerges = 10)
    Bpe.save(spark, trained, dir)
    val loaded = Bpe.load(spark, dir)
    assert(loaded == trained, s"round trip: $loaded vs $trained")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/bpe.json")).contains("graft-bpe-v1"))
    val docs = docsOf("aaab aab ab ba aaa")
    val viaLoaded = Bpe.encode(docs, loaded).collect().map(_.toSeq).toSeq
    val viaTrained = Bpe.encode(docs, trained).collect().map(_.toSeq).toSeq
    assert(viaLoaded == viaTrained)
  }

  test("t25 output is positive, word-bounded, and ASCII-stable; astral words neither crash nor tear") {
    val rows = Bpe.t25BpeEncode(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nb) = (r.getLong(1), r.getLong(2))
      // each word yields between 1 (fully merged) and |word| tokens
      assert(nb >= nw, s"doc ${r.getLong(0)}: n_bpe $nb < n_words $nw")
    }
    // unicode: an astral-plane word splits into code points and the
    // merge replace never fires mid-surrogate (split('') is
    // code-point based — the m06 parity pin)
    val uni = Bpe.encode(docsOf("😀😀b a"), Seq(("😀", "😀"), ("a", "b")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // 😀😀b → [😀😀, b] = 2 tokens; a → 1
    assert(uni.toSeq == Seq((2L, 3L)), uni.mkString)
  }
}
