package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product Quantization ANN (SURVEY.md §2 v09) — the MEMORY
  * compression scale path next to LSH (v05) and IVF (v07), after
  * Jégou et al. 2011 ("Product Quantization for Nearest Neighbor
  * Search"): vectors split into M subvectors, each quantized against
  * its own K-centroid codebook, so a 64-dim float vector (512 B as
  * doubles, 256 B as floats) becomes M=8 codes of log2(16)=4 bits —
  * 8 int codes here, 4 PACKED bytes of information. At 100 TB the
  * point is that the SCORING pass streams the code table (M bytes +
  * one norm per vector), not the embeddings: queries score
  * asymmetrically (ADC) via an M×K lookup table computed once per
  * query on the driver, O(M) adds per corpus vector instead of
  * O(dim) multiplies over 64× more bytes.
  *
  * Scale shape:
  *  - TRAIN: one distributed Lloyd's pass over ALL subspaces at once
  *    — assignment is a tight typed flatMap emitting (s, c, u),
  *    update one (s, c, dim)-keyed agg with map-side partials; the
  *    model (M×K×subDim doubles, 8 KB) lives on the driver, the
  *    corpus is never collected (KMeans.fit precedent, keyed by
  *    subspace so M codebooks train in ONE job per iteration, not M).
  *  - ENCODE: one narrow typed map → (vec_id, codes, norm); no
  *    shuffle. The stored norm is what makes COSINE ranking work on
  *    inner-product ADC (|v| is lost in quantization).
  *  - SCORE: narrow map over codes with the broadcast table, top
  *    rerank×k by approximate cosine via TakeOrderedAndProject, then
  *    EXACT re-rank of that tiny pool (equi-join back to the
  *    embeddings on vec_id) — the standard ADC + exact-rerank
  *    pipeline; approximation error only affects which candidates
  *    reach the pool, not their final ordering.
  */
object Pq {

  val M = 8        // subspaces
  val K = 16       // centroids per subspace (4-bit codes)
  val Rerank = 8   // rerank pool FLOOR = Rerank × k (see scaledPool)

  /** Density-scaled exact-rerank pool (VERDICT r12 #3): a FIXED
    * rerank×k pool is regime-bound in corpus size — code
    * approximation rank-noise puts true neighbours anywhere in a
    * band of the approximate ranking whose width grows with the
    * number of candidates ranked, so a pool that was 4% of a 2k
    * corpus is 0.04% of 200k and recall collapses (measured at the
    * old fixed dials: PQ 0.00, IVFADC 0.40, BQ 0.20 recall@10 at
    * 200k, while SQ8's 8-bit codes held 1.00). The pool therefore
    * GROWS with the ranked stream: max(rerank·k, streamN /
    * [[PoolDensity]]) — the V15CellTarget convention applied to the
    * rerank stage (a fixed FRACTION per decade instead of a fixed
    * count). The exact re-rank stays bounded (pool = streamN/256 ≪
    * streamN), and below the crossover (streamN ≤ rerank·k·256 —
    * the whole ≤20k decade at the defaults) the floor makes
    * behavior byte-identical to the historical dial, so every
    * small-SF anchor and oracle entry is unchanged. For IVFADC the
    * stream is the PROBED sliver, not the corpus — the pool tracks
    * what the ADC pass actually ranks. */
  val PoolDensity = 256
  def scaledPool(streamN: Long, k: Int, rerank: Int): Int =
    math.max(rerank.toLong * k, streamN / PoolDensity).toInt

  /** MEASURED ROUTING (the 200k/2M ladder + pool sweep, SURVEY §8k):
    * on a near-random corpus at dim=64 the 8-byte code rungs are
    * information-limited — at 200k the shipped density holds PQ at
    * recall@10 0.20 (pool 5120 ≈ 2.5% of corpus buys 0.70) while
    * **SQ8 holds 1.00 at every measured decade at 72 B/vec with no
    * tuning**: when the corpus regime is unknown, route to
    * Sq/VectorIndex.annSq and spend PQ/BQ's 16 B only where the
    * corpus (or a budgeted pool from the sweep curve) cooperates. */
  val RoutingNote = "SQ8 is the fixed-dial rung that holds every measured decade"

  private[operators] def argmin(cb: Array[Array[Double]], v: Array[Double], off: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val cc = cb(c)
      var d = 0.0; var j = 0
      while (j < cc.length) { val t = v(off + j) - cc(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train the M per-subspace codebooks: codebooks(s)(c) is centroid
    * c of subspace s. Deterministic init: HASH-SPREAD seeding (r10,
    * the KMeans.fit rationale — smallest xxhash64(vec_id) rows are a
    * deterministic uniform sample regardless of storage order;
    * first-k seeds on a source-sorted corpus co-locate and degrade
    * codebook coverage); empty clusters keep their centroid. `e`
    * SHOULD be cached by the caller (annPq does) — train itself
    * never persists so a cached caller dataframe is not held twice.
    * spreadSeed=false keeps the legacy first-k init (quality
    * comparison baseline only). */
  def train(spark: SparkSession, e: DataFrame, m: Int = M, k: Int = K,
      iters: Int = 3, spreadSeed: Boolean = true): Array[Array[Array[Double]]] = {
    import spark.implicits._
    val rows = e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
    val dim = rows.head()._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    var cb: Array[Array[Array[Double]]] = {
      val seedOrder =
        if (spreadSeed) Seq(xxhash64(col("vec_id")), col("vec_id"))
        else Seq(col("vec_id"))
      val seed = rows.orderBy(seedOrder: _*).limit(k).collect().map(_._2)
      require(seed.length >= k,
        s"PQ train needs at least k=$k vectors to seed codebooks, got ${seed.length}")
      Array.tabulate(m, k)((s, c) => seed(c).slice(s * sub, (s + 1) * sub))
    }
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cb)
      val sums = rows
        .flatMap { case (_, v) =>
          (0 until bc.value.length).iterator.map { s =>
            val sl = v.length / bc.value.length
            (s, argmin(bc.value(s), v, s * sl), v.slice(s * sl, (s + 1) * sl))
          }
        }
        .toDF("s", "c", "u")
        .select(col("s"), col("c"), posexplode(col("u")).as(Seq("dim", "x")))
        .groupBy("s", "c", "dim")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect() // m × k × subDim rows only
      val byKey = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      cb = Array.tabulate(m, k) { (s, c) =>
        byKey.get((s, c)) match {
          case Some(rs) => rs.sortBy(_.getInt(2)).map(r => r.getDouble(3) / r.getLong(4))
          case None => cb(s)(c)
        }
      }
    }
    cb
  }

  /** Encode: (vec_id, codes: array<int> of length M, norm). One
    * narrow typed map — the 100 TB artifact this writes is M codes +
    * one double per vector (the ONLY thing the scoring pass reads). */
  def encode(spark: SparkSession, e: DataFrame,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val m = cb.length
    e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .map { case (id, v) =>
        val sl = v.length / m
        val codes = Array.tabulate(m)(s => argmin(bc.value(s), v, s * sl))
        var n2 = 0.0; var j = 0
        while (j < v.length) { n2 += v(j) * v(j); j += 1 }
        (id, codes, math.sqrt(n2))
      }
      .toDF("vec_id", "codes", "norm")
  }

  /** ADC scoring + exact re-rank over an ALREADY-ENCODED code table —
    * the query half shared by the in-memory annPq and the persisted
    * index (graft.store.VectorIndex.annPq), so the two paths cannot
    * drift. `emb` (vec_id, v) is touched only for the query vector
    * and the exact re-rank of the bounded rerank×k pool (point
    * lookups by vec_id — at 100 TB the scan that streams is `enc`,
    * M bytes + one double per vector). */
  def adcTopK(spark: SparkSession, enc: DataFrame,
      cb: Array[Array[Array[Double]]], emb: DataFrame,
      queryVecId: Long, k: Int, rerank: Int = Rerank,
      streamN: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val m = cb.length
    val qv = emb.filter(col("vec_id") === queryVecId)
      .select("v").head().getSeq[Double](0).toArray
    val sub = qv.length / m
    // Driver-side M×K inner-product table (8 KB) — ONE per query.
    val tab = Array.tabulate(m, cb(0).length) { (s, c) =>
      var d = 0.0; var j = 0
      while (j < sub) { d += qv(s * sub + j) * cb(s)(c)(j); j += 1 }
      d
    }
    var qn2 = 0.0; qv.foreach(x => qn2 += x * x)
    val qn = math.sqrt(qn2)
    require(qn > 0, s"zero-norm query vector $queryVecId — cosine undefined")
    val bcTab = spark.sparkContext.broadcast(tab)
    // Density-scaled pool. `streamN` folds the count OUT of the
    // per-query path (VERDICT r13 #5 — the count job was a measured
    // 1.88× on v13's one-shot): persisted paths pass the build-time n
    // from the artifact metadata (a tombstoned stream is only ever
    // SMALLER, so the metadata pool over-covers — conservative);
    // one-shot paths pass the corpus count they already hold. The
    // explicit count stays as the no-information fallback.
    val poolN = scaledPool(streamN.getOrElse(enc.count()), k, rerank)
    val pool = enc.select(col("vec_id"), col("codes"), col("norm"))
      .as[(Long, Array[Int], Double)]
      .filter(_._1 != queryVecId)
      .map { case (id, codes, n) =>
        var s = 0; var dot = 0.0
        while (s < codes.length) { dot += bcTab.value(s)(codes(s)); s += 1 }
        // Zero-norm corpus vectors rank LAST (cosine undefined), not
        // first: an unguarded /0 yields ±Infinity/NaN, which a
        // descending sort floats to the TOP of the pool.
        (id, if (n > 0) dot / (qn * n) else Double.NegativeInfinity)
      }
      .toDF("vec_id", "approx_cos")
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(poolN)
    exactRerank(pool, emb, qv, k)
  }

  /** The exact re-rank tail shared by every ADC pipeline (flat PQ
    * here, IVFADC in [[IvfPq]]): equi-join the bounded pool back to
    * the embeddings by vec_id and order by TRUE cosine. The query
    * vector is already on the driver (qv) — rebuilt as a literal
    * column instead of re-filtering `emb`, which on the persisted
    * serving path would cost a SECOND full embeddings scan per query
    * just to re-fetch one row. */
  private[operators] def exactRerank(pool: DataFrame, emb: DataFrame,
      qv: Array[Double], k: Int): DataFrame = {
    val qCol = array(qv.toIndexedSeq.map(lit): _*)
    pool.join(emb.select(col("vec_id"), col("v")), "vec_id")
      .select(col("vec_id"), cosineNative6(col("v"), qCol).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** ADC top-k with train+encode inline: approximate cosine =
    * Σ_s table(s)(code_s) / (|q|·|v|) over the code stream, exact
    * re-rank of the top rerank×k pool. Convenient for one-shot use;
    * repeated queries should BUILD the index once
    * (VectorIndex.buildPq) and query the persisted codes instead of
    * re-training per call. The bounded result is materialized
    * (localCheckpoint) so the corpus cache can be dropped before
    * returning — a lazily-dependent return would pin the embeddings
    * in executor memory until clearCache (ADVICE r7). */
  def annPq(spark: SparkSession, e: DataFrame, queryVecId: Long, k: Int,
      m: Int = M, nCent: Int = K, rerank: Int = Rerank): DataFrame = {
    val cached = e.select(col("vec_id"), col("v")).cache()
    try {
      // corpus count doubles as the pool-sizing streamN (encode is
      // 1:1), so the code stream is consumed exactly ONCE by the
      // scoring pass — no codes cache, no extra count job (the r13
      // ADVICE unpersist-before-collect hole closes with the cache)
      val n = cached.count()
      val cb = train(spark, cached, m, nCent)
      val enc = encode(spark, cached, cb)
      val res = adcTopK(spark, enc, cb, cached, queryVecId, k, rerank, Some(n))
      // Materialize the k rows ON THE DRIVER (not localCheckpoint:
      // its executor-stored blocks have no lineage, so an executor
      // loss after return would permanently break the DataFrame) —
      // k rows is human-scale, and the rebuilt frame survives any
      // cluster event while letting the corpus cache drop now.
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(res.collect(): _*)),
        res.schema)
    } finally cached.unpersist()
  }

  /** v09 entry (*rows-only*; VectorSpec: full-pool == brute exactly,
    * default-pool recall vs brute, code width == M). Same output
    * shape as v05/v07. */
  def v09AnnPq(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    annPq(spark, e, queryVecId = 0, k = 10)
  }
}
