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
}
