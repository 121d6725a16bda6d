package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Binary Quantization ANN (SURVEY.md §2 v14) — the most aggressive
  * point on the compression ladder (BQ 1 bit/dim → SQ8 8 → PQ ~0.5
  * byte/subvector → IVFADC), the scheme modern vector stores ship as
  * "binary quantization": each dimension contributes ONE bit (sign
  * versus the per-dimension corpus MEAN — mean-centering, not raw
  * sign, so skewed dimensions still split ~50/50), a 64-dim vector
  * becomes a single 64-bit long, and candidate scoring is ONE xor +
  * popcount per corpus vector. 64× smaller than float32 at recall
  * recovered by a wider exact re-rank pool — the right lever when
  * the code table must live in RAM at 100 TB corpus scale.
  *
  * Scale shape: train = one dim-keyed avg (model = dim doubles);
  * encode = one narrow map to (vec_id, sig: long, norm); score =
  * codegen'd `bit_count(sig ^ querySig)` over the longs — the whole
  * candidate pass is ONE xor+popcount column expression, no typed
  * object pipeline at all — then the SHARED exact re-rank tail
  * (Pq.exactRerank) on the rerank×k pool.
  */
object Bq {

  val Rerank = 16 // 1 bit/dim needs a wider pool than SQ8's 4×
  // Measured routing (SURVEY §8k): at 200k near-random/dim-64 the
  // shipped density holds BQ at recall@10 0.60 (a 2.5% pool buys
  // 1.00); SQ8 holds 1.00 untuned at 72 B — see Pq.RoutingNote.

  /** Per-dimension mean — the centering model (dim doubles). */
  def train(spark: SparkSession, e: DataFrame): Array[Double] = {
    val rows = e.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg("x").as("m"))
      .collect() // dim rows only
    val m = new Array[Double](rows.length)
    rows.foreach(r => m(r.getInt(0)) = r.getDouble(1))
    m
  }

  /** Encode: (vec_id, sig = sign bits vs the mean, norm). Dims past
    * 64 would need a long array; the contract is dim ≤ 64 (the test
    * corpus is 64-dim — a production variant packs ceil(dim/64)
    * longs with the same xor+popcount sum). */
  def encode(spark: SparkSession, e: DataFrame, means: Array[Double]): DataFrame = {
    import spark.implicits._
    require(means.length <= 64, s"dim ${means.length} > 64: pack multiple longs")
    val bc = spark.sparkContext.broadcast(means)
    e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .map { case (id, v) =>
        val m = bc.value
        require(v.length == m.length, s"vector dim ${v.length} != index dim ${m.length}")
        var sig = 0L; var n2 = 0.0
        var j = 0
        while (j < v.length) {
          n2 += v(j) * v(j)
          if (v(j) >= m(j)) sig |= (1L << j)
          j += 1
        }
        (id, sig, math.sqrt(n2))
      }
      .toDF("vec_id", "sig", "norm")
  }

  /** Hamming candidate pool + exact re-rank. The pool pass is a pure
    * codegen'd column expression (xor + bit_count) — no typed map. */
  def bqTopK(spark: SparkSession, enc: DataFrame, means: Array[Double],
      emb: DataFrame, queryVecId: Long, k: Int, rerank: Int = Rerank,
      streamN: Option[Long] = None): DataFrame = {
    val qv = emb.filter(col("vec_id") === queryVecId)
      .select("v").head().getSeq[Double](0).toArray
    var qSig = 0L
    var j = 0
    while (j < qv.length) { if (qv(j) >= means(j)) qSig |= (1L << j); j += 1 }
    // density-scaled pool (Pq.scaledPool): 1-bit codes are the rung
    // most exposed to rank noise at scale; the floor keeps the
    // small-corpus behavior identical. streamN folds the count out
    // of the per-query path (the adcTopK convention).
    val poolN = Pq.scaledPool(streamN.getOrElse(enc.count()), k, rerank)
    val pool = enc
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        bitwise_not_count_guard(col("sig"), qSig).as("hamming"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(poolN)
    Pq.exactRerank(pool, emb, qv, k)
  }

  /** `bit_count(sig XOR lit)` — split out so the expression is one
    * named place (and greppable in the plan audit). */
  private def bitwise_not_count_guard(sig: org.apache.spark.sql.Column,
      qSig: Long): org.apache.spark.sql.Column =
    bit_count(sig.bitwiseXOR(lit(qSig)))

  /** One-shot BQ ANN (train + encode inline; the k-row result
    * materializes driver-side — the annPq cache-release contract). */
  def annBq(spark: SparkSession, e: DataFrame, queryVecId: Long, k: Int,
      rerank: Int = Rerank): DataFrame = {
    val cached = e.select(col("vec_id"), col("v")).cache()
    try {
      // corpus count = pool streamN (encode is 1:1): the signature
      // stream is consumed exactly once by the scoring pass — no
      // cache, no count job (the annPq convention)
      val n = cached.count()
      val means = train(spark, cached)
      val enc = encode(spark, cached, means)
      val res = bqTopK(spark, enc, means, cached, queryVecId, k, rerank, Some(n))
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(res.collect(): _*)),
        res.schema)
    } finally cached.unpersist()
  }

  /** v14 entry (*rows-only*; VectorSpec: full-pool == brute exactly,
    * recall floor at the default pool, signature balance). */
  def v14AnnBinary(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    annBq(spark, e, queryVecId = 0, k = 10)
  }
}
