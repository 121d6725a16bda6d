package graft
// Clustered-corpus generator for the premise-dependent scale
// measurements (VERDICT r13 #7): GenScale's permuted-replica decades
// measure the NEAR-RANDOM stress regime, but e01c/v15/SemDeDup's
// production premise is neighbour CONCENTRATION — previously spec'd
// only at sf0.01 plants. This writes that regime at any size: nC
// directional clusters over hash-chosen axis pairs (with C(dim,2) ≈
// nC pairs some clusters share a pair — separation is "subgroup ≫
// axis-sharing ≫ cross-axis", not nC orthogonal directions), each
// with ~20-member subgroups (the true-neighbour unit); label =
// cluster % 64 so label-0 rows (the v02/v08/v15 query convention)
// exist in every 64th cluster, independent of the axis geometry.
// Deterministic, no RNG state: every value is a pure function of
// (vec_id, dim index, cluster, subgroup).
//
// Usage: runMain graft.GenClustered [outDir] [n] [dim] [nClusters]
import org.apache.spark.sql.{SaveMode, SparkSession}

object GenClustered {
  /** Members per subgroup — the neighbourhood granularity. */
  val SubSize = 20L

  /** Member of cluster c, subgroup s: 4.0 on THREE cluster-hash-
    * chosen axes (coarse separation) + 0.5·sin SUBGROUP jitter shared
    * by the subgroup's ~[[SubSize]] members (the neighbourhood) +
    * 0.05·sin individual noise. The hierarchy is the honest model of
    * the production premise: a query's TRUE top-k are its subgroup
    * mates (cosine gap solid at every level), and that concentration
    * is what cell pruning exploits. A FLAT cluster (jitter purely
    * per-id) plants the opposite: within a cluster every member is
    * equidistant-random, top-k identity is driven by noise no
    * sub-cluster structure can index, and pair recall degrades to
    * probedCells/clusterCells even though LABEL concentration (and
    * thus classify agreement) stays perfect — both regimes were
    * measured at 2M, see SURVEY §8l.
    *
    * Two r14 lessons live in the axis choice: (1) mix the HIGH
    * multiplier bits before the mod — `(c·odd) % 64` keeps only c's
    * low 6 bits, collapsing 2000 clusters onto 64 axis sets that
    * coincided with label = c % 64 and silently propped accuracy up;
    * (2) THREE axes, not two — C(64,2) = 2016 ≈ nC made axis-set
    * collisions the norm, and two colliding clusters are
    * near-duplicate directions with DIFFERENT labels (exact kNN
    * itself measured 0.598 true-label accuracy on that geometry).
    * C(64,3) ≈ 42k makes collisions rare, so "label = cluster" is a
    * real property of the corpus, not of a lucky hash. */
  def vecOf(id: Long, c: Long, sub: Long, dim: Int): Array[Double] = {
    val h1 = c * 2654435761L
    val h2 = c * 40503L + 7
    val h3 = c * 1099511628211L + 31
    val a1 = (((h1 ^ (h1 >>> 17)) % dim + dim) % dim).toInt
    val a2raw = (((h2 ^ (h2 >>> 13)) % dim + dim) % dim).toInt
    val a2 = if (a2raw == a1) (a1 + 1) % dim else a2raw
    val a3raw = (((h3 ^ (h3 >>> 19)) % dim + dim) % dim).toInt
    val a3 =
      if (a3raw != a1 && a3raw != a2) a3raw
      else if ((a3raw + 1) % dim != a1 && (a3raw + 1) % dim != a2) (a3raw + 1) % dim
      else (a3raw + 2) % dim
    Array.tabulate(dim) { j =>
      (if (j == a1 || j == a2 || j == a3) 4.0 else 0.0) +
        0.5 * math.sin((c * 977L + sub) * 1.7 + j * 0.9) +
        0.05 * math.sin(id * 2.3 + j * 1.1)
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/testdata_clustered2m")
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val nC = args.lift(3).map(_.toLong).getOrElse(2000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    // interleaved membership (id % nC) so the corpus is NOT sorted by
    // cluster — storage order must not encode the geometry (the
    // hash-spread-seeding lesson: sorted corpora hide seeding bugs)
    spark.range(0, n, 1, 32)
      .map { id =>
        val c = id % nC
        val sub = (id / nC) / SubSize
        (id, vecOf(id, c, sub, dim).map(_.toFloat), (c % 64).toInt)
      }
      .toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$out/embeddings.parquet")
    println(s"[genclustered] wrote $n vectors, dim=$dim, $nC clusters -> $out")
    spark.stop()
  }
}
