package graft

import graft.operators.TextQueries

/** t09's general form: decontamination against a USER-SUPPLIED eval
  * DataFrame (real pipelines bring their own benchmark table; the
  * t09 entry's doc_id%100 slice exists for the DuckDB oracle). */
class DecontaminateSpec extends SparkSpec {

  test("external eval set flags exactly the docs sharing word grams") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zeta eta theta iota"),
      (3L, "alpha beta gamma unrelatedword"))
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "nothing shared here at all"))
      .toDF("doc_id", "text")
    val got = TextQueries.decontaminate(train, evalSet, gram = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 shares "alpha beta gamma" and "beta gamma delta" with
    // eval 10; doc 3 shares one gram; doc 2 is clean and absent.
    assert(got == Seq((1L, 2L, 1L), (3L, 1L, 1L)), got.toString)
  }

  test("the oracle entry is the same operator applied to the corpus slice") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val viaGeneral = TextQueries.decontaminate(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0))
      .collect().map(_.toSeq).toSeq
    val entry = TextQueries.t09Decontaminate(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(viaGeneral == entry)
  }

  // ------------------------------------------- t27: semantic form

  /** A deterministic, mutually DECORRELATED 64-dim vector per seed
    * (an integer hash per coordinate — same-frequency sinusoids per
    * seed would correlate at ~0.94 and defeat the planted contrast). */
  private def vec(seed: Long): Array[Double] =
    Array.tabulate(64) { j =>
      val h = seed * 6364136223846793005L + j * 1442695040888963407L + 1234567L
      val m = ((h >>> 16) ^ h) * 0x45d9f3b3335b369L
      ((m >>> 20) % 2000L).toDouble / 1000.0 - 1.0
    }

  test("t27 catches a planted paraphrase (disjoint 3-grams, high cosine) that t09 misses") {
    import spark.implicits._
    import graft.operators.DedupQueries
    // Texts: doc 1 PARAPHRASES eval doc 10 — same meaning, ZERO
    // shared word 3-grams (every surface word differs).
    val train = Seq(
      (1L, "the quick brown fox jumped over the lazy dog today"),
      (2L, "completely unrelated musings about spark physical plans"),
      (3L, "the quick brown fox jumped over the lazy dog today")) // verbatim dup of itself only
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (10L, "a fast auburn vulpine leapt above one indolent canine yesterday"),
      (11L, "benchmark question concerning differential geometry basics"))
      .toDF("doc_id", "text")
    // t09's verbatim screen: NO train doc shares a 3-gram with eval
    val verbatim = TextQueries.decontaminate(train, evalSet, gram = 3).collect()
    assert(verbatim.isEmpty, s"t09 should miss the paraphrase, got ${verbatim.toSeq}")

    // Embeddings: the paraphrase pair is near-identical in vector
    // space; everything else is far apart (planted directions).
    val e10 = vec(10)
    val e1 = e10.map(_ * 0.99 + 0.001) // cos ≈ 1 to eval 10
    val trainEmb = Seq(
      (1L, e1), (2L, vec(2)), (3L, vec(3))).toDF("vec_id", "v")
    val evalEmb = Seq((10L, e10), (11L, vec(11))).toDF("vec_id", "v")
    val sem = DedupQueries.semanticDecontaminate(spark, trainEmb, evalEmb, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(sem.map(_._1) == Seq(1L), s"only the paraphrase should flag: $sem")
    assert(sem.head._2 == 1L && sem.head._3 > 0.99, sem.toString)

    // blocked == exact on the planted corpus: brute-force cross
    // cosine at the same threshold flags the same (doc, count, best)
    val exact = {
      import graft.functions.VectorFunctions._
      import org.apache.spark.sql.functions._
      val t = trainEmb.withColumn("nt", normNative(col("v")))
      val ev = evalEmb.withColumn("ne", normNative(col("v")))
        .select(col("vec_id").as("eval_id"), col("v").as("ve"), col("ne"))
      t.crossJoin(ev)
        .select(col("vec_id"), col("eval_id"),
          round(cosinePreRaw(col("v"), col("ve"), col("nt"), col("ne")), 6).as("cos"))
        .filter(col("cos") >= 0.9)
        .groupBy("vec_id")
        .agg(countDistinct(col("eval_id")).as("n"), max(col("cos")).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    assert(sem == exact, s"blocked $sem != exact $exact")
  }

  test("t27 entry: the corpus slice form is the general form applied to the split") {
    import org.apache.spark.sql.functions.col
    import graft.operators.DedupQueries
    import graft.functions.VectorFunctions.toDouble
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val viaGeneral = DedupQueries.semanticDecontaminate(spark,
        e.filter(col("vec_id") % 10 =!= 0), e.filter(col("vec_id") % 10 === 0))
      .collect().map(_.toSeq).toSeq
    val entry = DedupQueries.t27SemanticDecontaminate(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(viaGeneral == entry && entry.nonEmpty)
  }
}
