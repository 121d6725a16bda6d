package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Scalar Quantization ANN (SURVEY.md §2 v13) — the SIMPLE memory
  * compression point between full vectors and PQ codes (the scheme
  * FAISS ships as SQ8, and the uint8 path every production vector
  * store offers): each DIMENSION is affinely mapped to one byte
  * against per-dimension [min, max] trained from the corpus, so a
  * 64-dim double vector (512 B) becomes 64 bytes — 8× smaller — with
  * far lower distortion than PQ's 4 bits/dim (a byte resolves 256
  * steps per dimension; PQ resolves 16 centroids per 8-dim subspace).
  * Where PQ buys 64× compression at recall ~0.8, SQ8 buys 8× at
  * recall ≈ 1.0 — the right first lever when memory, not compute, is
  * the constraint.
  *
  * Scale shape:
  *  - TRAIN: per-dimension min/max = ONE map-side-combining agg over
  *    posexploded dims (dim-keyed, 64 keys); the model is 2×dim
  *    doubles on the driver.
  *  - ENCODE: one narrow typed map → (vec_id, codes: 64 tinyints,
  *    norm); no shuffle.
  *  - SCORE: the affine structure folds into the query —
  *    q·v̂ = Σ_d q_d·(min_d + code_d·step_d) = offset + Σ_d w_d·code_d
  *    with offset = q·min and w_d = q_d·step_d precomputed ONCE on
  *    the driver, so the corpus pass is O(dim) byte-weighted adds
  *    over the code table (never touches the embeddings), top
  *    rerank×k by approximate cosine, then the SHARED exact re-rank
  *    tail (Pq.exactRerank) — quantization error only steers pool
  *    membership, never final ordering.
  */
object Sq {

  val Rerank = 4 // candidate pool = Rerank × k (SQ needs less slack than PQ)

  /** Per-dimension [min, max] over the corpus: (mins, maxs), each of
    * length dim. One dim-keyed agg; nothing corpus-sized collected. */
  def train(spark: SparkSession, e: DataFrame): (Array[Double], Array[Double]) = {
    val rows = e.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
      .collect() // dim rows only
    val dim = rows.length
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r =>
      mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2)
    }
    (mins, maxs)
  }

  /** Encode: (vec_id, codes: array<int> in [0,255] of length dim,
    * norm = |v|). Values clamp into the trained range (an APPEND
    * path encoding new arrivals against a frozen model must not
    * overflow the byte). A constant dimension (max == min) encodes 0
    * and decodes to its min — exact. */
  def encode(spark: SparkSession, e: DataFrame,
      mins: Array[Double], maxs: Array[Double]): DataFrame = {
    import spark.implicits._
    val bcMn = spark.sparkContext.broadcast(mins)
    val bcMx = spark.sparkContext.broadcast(maxs)
    e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .map { case (id, v) =>
        val mn = bcMn.value; val mx = bcMx.value
        require(v.length == mn.length,
          s"vector dim ${v.length} != index dim ${mn.length}")
        var n2 = 0.0
        val codes = new Array[Int](v.length)
        var j = 0
        while (j < v.length) {
          n2 += v(j) * v(j)
          val range = mx(j) - mn(j)
          codes(j) =
            if (range <= 0) 0
            else math.max(0, math.min(255,
              math.round((v(j) - mn(j)) / range * 255.0).toInt))
          j += 1
        }
        (id, codes, math.sqrt(n2))
      }
      .toDF("vec_id", "codes", "norm")
  }

  /** Byte-weighted scoring + exact re-rank over an already-encoded
    * code table — the query half, shared so a persisted-codes path
    * cannot drift from the one-shot form. */
  def sqTopK(spark: SparkSession, enc: DataFrame,
      mins: Array[Double], maxs: Array[Double], emb: DataFrame,
      queryVecId: Long, k: Int, rerank: Int = Rerank): DataFrame = {
    import spark.implicits._
    val qv = emb.filter(col("vec_id") === queryVecId)
      .select("v").head().getSeq[Double](0).toArray
    var qn2 = 0.0; qv.foreach(x => qn2 += x * x)
    val qn = math.sqrt(qn2)
    require(qn > 0, s"zero-norm query vector $queryVecId — cosine undefined")
    // Fold the affine decode into the query ONCE: offset = q·min,
    // w_d = q_d · (max_d − min_d)/255 — the corpus pass is then pure
    // byte-weighted adds.
    var offset = 0.0
    val w = new Array[Double](qv.length)
    var j = 0
    while (j < qv.length) {
      offset += qv(j) * mins(j)
      w(j) = qv(j) * (maxs(j) - mins(j)) / 255.0
      j += 1
    }
    val bcW = spark.sparkContext.broadcast(w)
    val off = offset
    // density-scaled pool (Pq.scaledPool): fixed dials collapse a
    // decade up; the floor keeps the small-corpus behavior identical
    val poolN = Pq.scaledPool(enc.count(), k, rerank)
    val pool = enc.select(col("vec_id"), col("codes"), col("norm"))
      .as[(Long, Array[Int], Double)]
      .filter(_._1 != queryVecId)
      .map { case (id, codes, n) =>
        var dot = off; var d = 0
        while (d < codes.length) { dot += bcW.value(d) * codes(d); d += 1 }
        // zero-norm corpus vectors rank LAST (the v09 guard)
        (id, if (n > 0) dot / (qn * n) else Double.NegativeInfinity)
      }
      .toDF("vec_id", "approx_cos")
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(poolN)
    Pq.exactRerank(pool, emb, qv, k)
  }

  /** One-shot SQ8 ANN: train + encode inline, score, re-rank. The
    * bounded k-row result is materialized driver-side (the annPq
    * cache-release contract). */
  def annSq(spark: SparkSession, e: DataFrame, queryVecId: Long, k: Int,
      rerank: Int = Rerank): DataFrame = {
    val cached = e.select(col("vec_id"), col("v")).cache()
    try {
      val (mins, maxs) = train(spark, cached)
      // cached codes: scaledPool's stream count must not re-encode
      val enc = encode(spark, cached, mins, maxs).cache()
      val res = try sqTopK(spark, enc, mins, maxs, cached, queryVecId, k, rerank)
        finally enc.unpersist()
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(res.collect(): _*)),
        res.schema)
    } finally cached.unpersist()
  }

  /** v13 entry (*rows-only*; VectorSpec: full-pool == brute exactly,
    * default pool recall, codes bounded [0,255], constant-dim
    * round-trip). Same output shape as v05/v07/v09/v10. */
  def v13AnnSq(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    annSq(spark, e, queryVecId = 0, k = 10)
  }
}
