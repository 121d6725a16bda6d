package graft
// Temporary profiling / cross-validation harness (not library surface).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // TypedImperativeAggregate (TopKAgg/sketches) keys per partition
      // before sort-based fallback: the 128-row default externally sorts
      // every large pool stage (the measured 2M-decade spill)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.DedupQueries._
    import graft.sources.Tables

    // Cross-validation at sf0.1 (all-pairs DuckDB oracle intractable):
    // 1) every d04-reported pair recomputes to the exact claimed J
    //    via an INDEPENDENT per-pair kernel evaluation;
    // 2) word-MinHash (d02) and char-PPJoin (d04) independently agree
    //    on the near-dup pair set.
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toMap // one-off validation harness only
    val d04Pairs = d04NgramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    var bad = 0
    d04Pairs.foreach { case (a, b, j) =>
      val ga = charGramHashes(texts(a)); val gb = charGramHashes(texts(b))
      val inter = sortedIntersectionSize(ga, gb)
      val exact = inter.toDouble / (ga.length + gb.length - inter)
      if (math.abs(BigDecimal(exact).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble - j) > 1e-9) bad += 1
    }
    println(s"[xval] d04 pairs=${d04Pairs.length} mismatched=$bad")
    val d02Pairs = d02MinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d04Set = d04Pairs.map(p => (p._1, p._2)).toSet
    println(s"[xval] d02=${d02Pairs.size} d04=${d04Set.size} " +
      s"symmetric_diff=${(d02Pairs diff d04Set).size + (d04Set diff d02Pairs).size}")
    // 3) d07's distributed components == a driver-side union-find over
    //    the same (tiny, collected) pair set.
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    d02Pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = d02Pairs.flatMap(p => Seq(p._1, p._2))
      .map(v => v -> find(v)).toMap
    val got = d07DedupClusters(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val diff = expect.count { case (v, c) => got.get(v) != Some(c) } +
      (got.keySet -- expect.keySet).size
    println(s"[xval] d07 docs=${got.size} clusters=${got.values.toSet.size} " +
      s"mismatched_vs_unionfind=$diff")
    spark.stop()
  }
}
